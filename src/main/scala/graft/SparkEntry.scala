package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.model.{MergeConf, Op}
import graft.model.MetadataEvent.{AddPushSource, FetchConf, PrepConf, SetPollingSource, SqlStep}
import graft.operators.{Changelog, Corpus, Dedup, MergeStrategy, Profile, Similarity, Temporal, Writer}
import graft.query.QueryService
import graft.transform.TransformService
import graft.functions.Text

/**
 * Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * Every entry in [[queries]] exercises one operator from SURVEY.md §2 (or a
 * beyond-reference LLM-pipeline operator) against the driver's TPC-H-ish
 * parquet tables; [[oracleSql]] carries the DuckDB-equivalent ANSI SQL.
 *
 * Hash-compare discipline: aggregates are computed in DECIMAL (exact, order-
 * independent) and cast to an identical decimal type on both sides; outputs
 * carry only deterministic columns and a total ORDER BY.
 */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` physical encoding has varied across testdata
    * generations (TIMESTAMP(NANOS) → read as BIGINT under the legacy
    * nanosAsLong flag; TIMESTAMP(MICROS, ntz) → read as TIMESTAMP_NTZ), so
    * this helper keys on the OBSERVED Spark type — never on a remembered
    * encoding — and normalizes to TimestampType (µs, UTC instants):
    *   - LongType: nanos-as-long → floor-divide to micros. The legacy flag is
    *     re-asserted first because the scan only yields LongType when it is
    *     set at planning time; setting it is idempotent and our own mains
    *     (Verify/Bench) already carry it.
    *   - TimestampNTZType: wall values are UTC by fixture contract; the
    *     session timezone is re-pinned to UTC first (same driver-owned-
    *     session discipline as the legacy flag above) so the cast is an
    *     exact reinterpretation of the same micros value even when the
    *     caller's session was built with another zone.
    *   - TimestampType: already instant-typed, pass through. */
  private[graft] def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Events table recast as an RFC-015 changelog ledger (offset, op, pk, value). */
  /** Build (once per dir) the maintained per-score stats table from the
    * auc-style per-user scores, in three entity-partitioned generations
    * plus a replayed tick — shared by score_stats_append /
    * auc_from_stats / decile_lift_from_stats. */
  private def scoreStatsTable(s: SparkSession, dir: String): Unit = {
    Fixtures.cached(s"score_stats|$dir") {
      val perUser = events(s, dir)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(coalesce(floor(col("value") * 1000000.0).cast("long"), lit(0L)))
          .as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("label"))
      def batch(r: Int) = perUser.filter(col("user_id") % 3 === r)
      graft.operators.ScoreStats.materialize(
        batch(0), col("score"), col("label"), "graft_scorestats", batchId = 0L)
      graft.operators.ScoreStats.append(
        batch(1), col("score"), col("label"), "graft_scorestats", batchId = 1L)
      graft.operators.ScoreStats.append(
        batch(2), col("score"), col("label"), "graft_scorestats", batchId = 2L)
      graft.operators.ScoreStats.append( // replay: no-op on the __gen guard
        batch(2), col("score"), col("label"), "graft_scorestats", batchId = 2L)
      java.lang.Boolean.TRUE
    }
    ()
  }

  /** Per-user-DAY scores with a same-day purchase label — the grouped
    * eval-family fixture frame (auc_by_day / ks_by_day and their
    * maintained-stats twins all derive from this one shape). */
  private def perUserDayScores(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        col("user_id"))
      .agg(sum(coalesce(floor(col("value") * 1000000.0).cast("long"), lit(0L)))
        .as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("label"))

  /** Build (once per dir) the KEYED maintained per-(day, score) stats
    * table from the per-user-day scores, in three entity-partitioned
    * generations plus a replayed tick — shared by auc_by_day_from_stats /
    * ks_by_day_from_stats. */
  private def scoreStatsKeyedTable(s: SparkSession, dir: String): Unit = {
    Fixtures.cached(s"score_stats_keyed|$dir") {
      val perUserDay = perUserDayScores(s, dir)
      def batch(r: Int) = perUserDay.filter(col("user_id") % 3 === r)
      graft.operators.ScoreStats.materializeKeyed(
        batch(0), col("day"), col("score"), col("label"),
        "graft_scorestats_byday", batchId = 0L)
      graft.operators.ScoreStats.appendKeyed(
        batch(1), col("day"), col("score"), col("label"),
        "graft_scorestats_byday", batchId = 1L)
      graft.operators.ScoreStats.appendKeyed(
        batch(2), col("day"), col("score"), col("label"),
        "graft_scorestats_byday", batchId = 2L)
      graft.operators.ScoreStats.appendKeyed( // replay: no-op on the guard
        batch(2), col("day"), col("score"), col("label"),
        "graft_scorestats_byday", batchId = 2L)
      java.lang.Boolean.TRUE
    }
    ()
  }

  /** Shared drift binning (once per dir): both parity splits' score
    * masses on the reference-decile bins — the one expensive pass behind
    * BOTH drift metrics (tvd_from_stats / psi_from_stats project from
    * it). Checkpointed: the cuts pipeline triple-consumes the reference
    * frame and two entries re-read the result. */
  private def driftBinnedFixture(s: SparkSession, dir: String): DataFrame =
    Fixtures.cached(s"drift_binned|$dir") {
      val perUser = events(s, dir)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(coalesce(floor(col("value") * 1000000.0).cast("long"), lit(0L)))
          .as("score"))
        .withColumn("y", lit(0L))
        .localCheckpoint() // feeds both parity splits — one events scan
      def st(r: Int) = graft.operators.ScoreStats.fromScored(
        perUser.filter(col("user_id") % 2 === r), col("score"), col("y"))
      graft.operators.ScoreStats.driftBinnedCounts(st(0), st(1))
        .localCheckpoint()
    }

  /** Cached score-grain stats frames (one per labeling, per dir) — the
    * entries deriving several metrics from the SAME scored population
    * share one `fromScored` pass instead of re-scanning events each
    * (the drift-pair fixture doctrine; frames are score-cardinality-
    * sized, so the checkpoint is tiny). */
  private def ksLabeledStats(s: SparkSession, dir: String): DataFrame =
    Fixtures.cached(s"ks_labeled_stats|$dir") {
      val perUser = events(s, dir)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(coalesce(floor(col("value") * 1000000.0).cast("long"), lit(0L)))
          .as("score"),
          when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 4L,
            1L).otherwise(0L).as("label"))
      graft.operators.ScoreStats.fromScored(perUser, col("score"), col("label"))
        .localCheckpoint()
    }

  /** Purchase-share (scale-invariant) labeling twin of [[ksLabeledStats]]
    * — shared by pr_points / average_precision. */
  private def shareLabeledStats(s: SparkSession, dir: String): DataFrame =
    Fixtures.cached(s"share_labeled_stats|$dir") {
      val perUser = events(s, dir)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(coalesce(floor(col("value") * 1000000.0).cast("long"), lit(0L)))
          .as("score"),
          when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) * 5L
            >= count(lit(1)), 1L).otherwise(0L).as("label"))
      graft.operators.ScoreStats.fromScored(perUser, col("score"), col("label"))
        .localCheckpoint()
    }

  /** Click-or-purchase-share micro-PROBABILITY scores — shared by the
    * calibration-error pair (ece / brier). */
  private def probLabeledStats(s: SparkSession, dir: String): DataFrame =
    Fixtures.cached(s"prob_labeled_stats|$dir") {
      val perUser = events(s, dir)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg((sum(when(col("event_type").isin("click", "purchase"), 1L)
          .otherwise(0L)) * 1000000L).as("__na"),
          count(lit(1)).as("__n"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("label"))
        .select(expr("__na DIV __n").as("score"), col("label"))
      graft.operators.ScoreStats.fromScored(perUser, col("score"), col("label"))
        .localCheckpoint()
    }

  private def eventsLedger(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id").as("offset"),
      pmod(col("event_id"), lit(4)).cast("int").as("op"),
      col("user_id"),
      col("value")
    )

  /** Customer table recast as a three-tick SCD changelog: every customer
    * appends at 2024-01-01; the %3 keys get a -C/+C correction pair
    * (acctbal doubled) at 2024-02-01; the %7 keys retract at 2024-03-01.
    * Offsets are custkey·10 + tick so per-key order is total. Shared by
    * scd2_build / scd2_pit. */
  private def scd2Ledger(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    def tick(df: DataFrame, bal: Column, off: Int, op: Int, et: String) =
      df.select(
        col("c_custkey"), bal.as("c_acctbal"),
        (col("c_custkey") * 10 + off).as("offset"),
        lit(op).as("op"),
        to_timestamp(lit(et)).as("event_time"))
    tick(cust, col("c_acctbal"), 0, Op.Append, "2024-01-01 00:00:00")
      .unionByName(tick(cust.filter(col("c_custkey") % 3 === 0),
        col("c_acctbal"), 1, Op.CorrectFrom, "2024-02-01 00:00:00"))
      .unionByName(tick(cust.filter(col("c_custkey") % 3 === 0),
        col("c_acctbal") * 2, 2, Op.CorrectTo, "2024-02-01 00:00:00"))
      .unionByName(tick(cust.filter(col("c_custkey") % 7 === 0),
        lit(0.0), 3, Op.Retract, "2024-03-01 00:00:00"))
  }

  /** Shared fixture: the orders table ingested as three append slices with
    * distinct commit times (used by dataset_multislice / dataset_tail /
    * compaction). Built once per (entry, dir) via [[Fixtures.cached]]. */
  private def buildOrdersDataset(s: SparkSession, dir: String): java.nio.file.Path = {
    val base = t(s, dir, "orders").select(
      col("o_orderdate").as("event_time"),
      col("o_orderkey"),
      col("o_custkey"),
      col("o_totalprice")
    )
    val root = java.nio.file.Files.createTempDirectory("graft-orders-ds-")
    val ds = Dataset.create(s, root, "orders_ds")
    val times = Seq("2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z", "2024-01-03T00:00:00Z")
    for (g <- 0 until 3)
      IngestWriter.writeBatch(
        ds,
        base.filter(col("o_orderkey") % 3 === g),
        MergeStrategy.Append(),
        java.time.Instant.parse(times(g)).toEpochMilli
      )
    root
  }

  /** Recursive local-dir copy (gives mutating entries like compaction a
    * private working copy of a cached fixture). */
  private def copyDir(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    Files.walk(from).forEach { (p: Path) =>
      val dest = to.resolve(from.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(dest)
      else {
        Files.createDirectories(dest.getParent)
        Files.copy(p, dest)
      }
    }
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_local_supplier_volume")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- batch SQL surface (SURVEY §2.3: scan, filter, agg, join, window)
    "q1_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)"))
          ).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    "q3_shipping_priority" -> { (s, dir) =>
      // Filter orders through the BUILDING customers FIRST (AQE broadcasts
      // the customer side while it fits — no static hint, it grows with
      // scale), then join lineitem against the shrunken orders with a
      // shuffled-hash hint: the orders side builds a hash table and the
      // 10x-larger lineitem side streams, where sort-merge would sort BOTH
      // fact tables just to aggregate afterwards. (A lineitem pre-agg by
      // l_orderkey measures SLOWER at sf10 — one hash group per order is
      // most of the fact table, so it saves nothing.)
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01 00:00:00")))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)"))
          ).cast("double").as("revenue")
        )
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    // ---- q3 over CO-BUCKETED fact tables: both facts written bucketBy the
    // join key once, so the lineitem ⋈ orders join is storage-partitioned —
    // zero Exchange on either fact side (PlanSpec pins the no-shuffle plan
    // with broadcasts disabled). At 100 TB this layout replaces the
    // per-query fact shuffle with a one-time write. Same oracle as q3.
    "q3_bucketed" -> { (s, dir) =>
      val (lTab, oTab) = ensureBucketedFacts(s, dir)
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = s.table(oTab)
        .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      s.table(lTab)
        .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01 00:00:00")))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)"))
          ).cast("double").as("revenue")
        )
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- q5 over the same co-bucketed facts. The fact join carries a
    // second equi-key (customer nation == supplier nation) on top of the
    // bucket column, so co-partitioning needs the subset rule
    // (requireAllClusterKeysForCoPartition=false — a SessionDefaults knob;
    // re-asserted here for driver-owned sessions, same discipline as the
    // events helper): both scans are hash-partitioned on the CORRESPONDING
    // orderkey position and the planner accepts that instead of
    // re-shuffling on the full key set. Dims broadcast explicitly; the one
    // remaining fact-path shuffle is the |nations|-row final aggregation.
    "q5_bucketed" -> { (s, dir) =>
      s.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      val (lTab, oTab) = ensureBucketedFacts(s, dir)
      val asia = broadcast(
        t(s, dir, "nation")
          .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name")))
      val suppAsia = broadcast(
        t(s, dir, "supplier")
          .join(asia, col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("n_name")))
      val custAsia = broadcast(
        t(s, dir, "customer")
          .join(asia.select(col("n_nationkey")), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_nationkey")))
      val ordAsia = s.table(oTab)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(custAsia, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      s.table(lTab)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        .join(suppAsia, col("l_suppkey") === col("s_suppkey"))
        .join(
          ordAsia.hint("merge"),
          col("l_orderkey") === col("o_orderkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)"))
          ).cast("double").as("revenue")
        )
        .orderBy(col("revenue").desc, col("n_name"))
    },

    "q5_local_supplier_volume" -> { (s, dir) =>
      // Catalyst does not reorder joins without CBO stats, so the declared
      // order IS the plan: push the region filter into supplier and customer
      // through the constant-size dims broadcast FIRST. The fact pipeline
      // then carries only ASIA rows — lineitem joins a shrunken supplier
      // side (AQE broadcasts it while it fits; no static hint, it grows
      // with scale) instead of shuffling full-width three times before the
      // filter applies (measured 4x at sf10). Same shape the reference's
      // DataFusion optimizer reaches via its own filter pushdown.
      val asia = broadcast(
        t(s, dir, "nation")
          .join(t(s, dir, "region").filter(col("r_name") === "ASIA"), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
      )
      val suppAsia = t(s, dir, "supplier")
        .join(asia, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val custAsia = t(s, dir, "customer")
        .join(asia.select(col("n_nationkey")), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"))
      val ordAsia = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(custAsia, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        .join(suppAsia, col("l_suppkey") === col("s_suppkey"))
        // shuffled-hash, not sort-merge: the build side is hashed per
        // partition (partition-size-bounded) and neither fact side is
        // sorted; AQE still upgrades to broadcast when the pruned orders
        // side fits.
        .join(
          ordAsia.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey") && col("c_nationkey") === col("s_nationkey")
        )
        .groupBy(col("n_name"))
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)"))
          ).cast("double").as("revenue")
        )
        .orderBy(col("revenue").desc, col("n_name"))
    },
    "q6_forecast_revenue" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24
        )
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") * col("l_discount").cast("decimal(18,2)"))
            .cast("double").as("revenue")
        )
    },
    "q_top_orders_per_customer" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rnk", row_number().over(w).cast("bigint"))
        .filter(col("rnk") <= 3)
        .orderBy(col("o_custkey"), col("rnk"))
    },
    "q_rollup_order_stats" -> { (s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total")
        )
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },
    // ---- q7 shape (volume shipping between two nations by year): both
    // nation-filtered dims broadcast; the only fact-sized work is one
    // lineitem scan and one shuffled-hash join against the nation-pruned
    // orders.
    "q7_volume_shipping" -> { (s, dir) =>
      val (na, nb) = ("NATION_1", "NATION_2")
      val nations = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val supp = broadcast(t(s, dir, "supplier")
        .join(nations, col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin(na, nb))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      val cust = broadcast(t(s, dir, "customer")
        .join(nations, col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin(na, nb))
        .select(col("c_custkey"), col("n_name").as("cust_nation")))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"),
          year(col("l_shipdate")).as("l_year"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .filter(
          (col("supp_nation") === na && col("cust_nation") === nb) ||
          (col("supp_nation") === nb && col("cust_nation") === na))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)"))
          ).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    // ---- q8 shape (market share by year): NATION_3 suppliers' share of
    // the ECONOMY-part volume sold to ASIA customers — two exact decimal
    // sums per year, the share from the two exact doubles.
    "q8_market_share" -> { (s, dir) =>
      val nations = t(s, dir, "nation").select(
        col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val asiaCust = broadcast(t(s, dir, "customer")
        .join(nations
          .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey")))
      val supp = broadcast(t(s, dir, "supplier")
        .join(nations, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      val econParts = broadcast(t(s, dir, "part")
        .filter(col("p_type") === "ECONOMY").select(col("p_partkey")))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_year"))
      val vol =
        col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(econParts, col("l_partkey") === col("p_partkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_year"))
        .agg(
          coalesce(sum(when(col("supp_nation") === "NATION_3", vol)).cast("double"), lit(0.0))
            .as("nation_volume"),
          sum(vol).cast("double").as("total_volume"))
        .select(col("o_year"), col("nation_volume"), col("total_volume"),
          (col("nation_volume") / col("total_volume")).as("mkt_share"))
        .orderBy(col("o_year"))
    },
    // ---- q2 shape (min-cost supplier per part): the argmin-per-group
    // decorrelation — the correlated "cost = (SELECT min ...)" subquery
    // becomes one (part, supplier) aggregate plus a per-part rank-1
    // window; dimension filter broadcasts into the fact scan first. This
    // schema has no partsupp, so the part↔supplier catalog is DERIVED
    // from lineitem with unit cost = extendedprice ∕ quantity (IEEE
    // double division — bit-identical on any engine).
    "q2_min_cost_supplier" -> { (s, dir) =>
      val parts = broadcast(t(s, dir, "part")
        .filter(col("p_size").between(1, 15) && col("p_type") === "ECONOMY")
        .select(col("p_partkey")))
      val unit = t(s, dir, "lineitem")
        .filter(col("l_quantity") > 0)
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("__uc"))
        .join(parts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("__uc")).as("min_cost"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("min_cost"), col("l_suppkey"))
      unit
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .join(broadcast(t(s, dir, "supplier")
          .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
          col("s_name"), col("nation"), col("min_cost"))
        .orderBy(col("p_partkey"))
        .limit(100)
    },
    // ---- q9 shape (product-type profit by nation and year): three
    // dimension broadcasts narrow the fact scan (part name filter first —
    // it is the selective one), then ONE orderkey shuffle join brings in
    // the year, and the rollup runs at (nation, year) grain. This schema
    // has no partsupp, so supply cost is surrogate-keyed as
    // 0.4·p_retailprice·l_quantity — all DECIMAL arithmetic (0.4 is exact
    // at scale 1), summed exactly and cast to double once.
    "q9_profit" -> { (s, dir) =>
      val redParts = broadcast(t(s, dir, "part")
        .filter(col("p_name").like("%red%"))
        .select(col("p_partkey"), col("p_retailprice")))
      val supp = broadcast(t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation")))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      val amount =
        col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)")) -
          col("p_retailprice").cast("decimal(18,2)") *
            col("l_quantity").cast("decimal(18,2)") *
            expr("CAST(0.4 AS DECIMAL(2,1))")
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .join(redParts, col("l_partkey") === col("p_partkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), col("o_year"))
        .agg(sum(amount).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    // ---- PIVOT: yearly revenue per nation spread across year columns —
    // Spark's groupBy().pivot() with an EXPLICIT value list, which keeps
    // the plan a single pass (no values-discovery pre-query) and the
    // aggregation one conditional hash agg; exact DECIMAL sums cast to
    // double once.
    "pivot_yearly_revenue" -> { (s, dir) =>
      pivotedRevenue(s, dir).orderBy(col("nation"))
    },
    // ---- the same pivot on the BIGINT cent grid, through Spark's real
    // groupBy().pivot() operator (explicit value list). The round-13
    // A/B showed pivot's ImperativeAggregate lowering (`pivotfirst`) is
    // only erratic on the DECIMAL path; on long input it is stable —
    // so this entry keeps the genuine pivot operator while the decimal
    // headline entry uses the codegen'd case-when spelling. floor()
    // matches the oracle exactly (double→long casts round differently
    // across engines); cent totals at 100 TB stay far under 2^63.
    "pivot_yearly_revenue_micro" -> { (s, dir) =>
      val cust = broadcast(t(s, dir, "customer")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("nation")))
      t(s, dir, "orders")
        .select(col("o_custkey"), year(col("o_orderdate")).as("o_year"),
          floor(col("o_totalprice") * 100).cast("long").as("__cents"))
        .filter(col("o_year").between(1996, 1999))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("nation"))
        .pivot("o_year", Seq(1996, 1997, 1998, 1999))
        .agg(sum(col("__cents")))
        .select(col("nation"),
          (col("1996") / 100.0).as("y1996"), (col("1997") / 100.0).as("y1997"),
          (col("1998") / 100.0).as("y1998"), (col("1999") / 100.0).as("y1999"))
        .orderBy(col("nation"))
    },
    // ---- UNPIVOT: melt the pivoted frame back to (nation, year, revenue)
    // — pivot∘unpivot round-trips to the plain (nation, year) rollup
    // (minus combos that never existed), which is exactly what the oracle
    // computes directly.
    "unpivot_yearly_revenue" -> { (s, dir) =>
      pivotedRevenue(s, dir)
        .unpivot(
          Array(col("nation")),
          Array(col("y1996"), col("y1997"), col("y1998"), col("y1999")),
          "yr", "revenue")
        .filter(col("revenue").isNotNull)
        .withColumn("o_year", substring(col("yr"), 2, 4).cast("long"))
        .select(col("nation"), col("o_year"), col("revenue"))
        .orderBy(col("nation"), col("o_year"))
    },
    // ---- q10 shape (returned-item reporting): aggregate the fact side to
    // CUSTOMER GRAIN before any dimension join — the post-agg frame is
    // customers-sized, so the customer join broadcasts the aggregate (AQE)
    // instead of shuffling lineitem against the customer table.
    "q10_returned_items" -> { (s, dir) =>
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .select(col("o_orderkey"), col("o_custkey"))
      val rev = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)"))
          ).cast("double").as("revenue"))
      rev
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    // ---- q14 shape (promo revenue share): one month of lineitem against
    // the part dim (AQE broadcasts part while it fits); both sums are exact
    // decimals, the percentage derives from the two exact doubles through
    // one fixed expression tree.
    "q14_promo_revenue" -> { (s, dir) =>
      val disc =
        col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-09-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1996-10-01 00:00:00")))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        .join(t(s, dir, "part").select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          coalesce(sum(when(col("p_type") === "PROMO", disc)).cast("double"), lit(0.0))
            .as("promo_revenue"),
          sum(disc).cast("double").as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          (col("promo_revenue") * lit(100.0) / col("total_revenue")).as("promo_pct"))
    },
    // ---- q15 shape (top supplier by quarter revenue): the per-supplier
    // aggregate is suppliers-sized; its scalar max broadcasts back against
    // it, and the supplier dim joins the (tiny) winners only.
    "q15_top_supplier" -> { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .groupBy(col("l_suppkey"))
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)"))
          ).cast("double").as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("__mr"))
      rev
        .join(broadcast(mx), col("total_revenue") === col("__mr"))
        .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    // ---- q18 shape (large-volume orders): the quantity rollup shrinks to
    // a handful of qualifying orders, which AQE then BROADCASTS against
    // orders and customer — the classic "aggregate first, join the
    // survivors" inversion that keeps both dimension joins shuffle-free.
    "q18_large_volume" -> { (s, dir) =>
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("__sq"))
        .filter(col("__sq") > 300)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("__sq").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    // ---- q19 shape (OR-of-conjuncts discounted revenue): the join stays a
    // single equi-join on partkey; the three (brand, size, quantity) branch
    // predicates apply as a post-join filter — Catalyst pushes the
    // branch-local conjuncts to each scan where it can.
    "q19_discounted_revenue" -> { (s, dir) =>
      val branch =
        (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#19" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#25" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 40))
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand"), col("p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(branch)
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)"))
          ).cast("double").as("revenue"))
    },
    // ---- q4 shape (EXISTS decorrelation): the correlated EXISTS becomes
    // a LEFT-SEMI join on the correlation key — orders sees each matching
    // lineitem ONCE regardless of multiplicity, and the probe side carries
    // only the slim (orderkey) projection. No commitdate/receiptdate in
    // this schema, so "late" is surrogate-keyed by returnflag = 'R'.
    "q4_order_priority" -> { (s, dir) =>
      val flagged = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .join(flagged, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    // ---- q12 shape (shipping-mode priority routing): ONE equi-join on
    // orderkey between the date-restricted fact slice and orders, then a
    // conditional aggregation (CASE inside sum) — the "pivot a dimension
    // attribute into measure columns" family. Both sides carry slim
    // projections, and the priority predicate is evaluated BEFORE the
    // shuffle so the orders side moves one boolean per row instead of a
    // priority string. The join is pinned `shuffle_hash`: both sides are
    // fact-sized so neither broadcasts, and the sort-merge default pays
    // two large sorts that the hash join skips entirely (round-15 sf10
    // A/B: SMJ 8.0 s → shuffle-hash 1.4 s, DuckDB 1.05 s on the same
    // parquet; per-partition build side is |orders|/P rows — bounded by
    // raising P with scale, same contract as q9's pin). This schema has
    // no l_shipmode/receiptdate, so the mode axis is surrogate-keyed by
    // l_linestatus (same 2-value group-by shape).
    "q12_priority_routing" -> { (s, dir) =>
      val hi = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .select(col("l_orderkey"), col("l_linestatus"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), hi.as("__hi"))
          .hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("__hi"), lit(1L)).otherwise(lit(0L))).as("high_line_count"),
          sum(when(col("__hi"), lit(0L)).otherwise(lit(1L))).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },
    // ---- q12 over the q3/q5 CO-BUCKETED facts (r17, the q12 paired-window
    // adjudication's plan lever): the orderkey equi-join — the plan's ONLY
    // fact-sized exchange — becomes storage-partitioned, so the only
    // remaining shuffle is the 2-group final aggregation. Same oracle as
    // q12_priority_routing; PlanSpec pins the no-fact-shuffle layout.
    "q12_bucketed" -> { (s, dir) =>
      val (lTab, oTab) = ensureBucketedFacts(s, dir)
      val hi = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      s.table(lTab)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .select(col("l_orderkey"), col("l_linestatus"))
        .join(s.table(oTab).select(col("o_orderkey"), hi.as("__hi")).hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("__hi"), lit(1L)).otherwise(lit(0L))).as("high_line_count"),
          sum(when(col("__hi"), lit(0L)).otherwise(lit(1L))).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },
    // ---- q17 shape (correlated scalar-aggregate decorrelation): the
    // per-part avg subquery becomes ONE partkey-grained aggregate joined
    // back to the restricted fact rows. The brand filter broadcasts to the
    // fact scan FIRST, so the aggregate runs over the brand's rows only,
    // never all of lineitem. The 0.2·avg comparison cross-multiplies
    // (5·qty·n < Σqty, exact decimals) so no engine-specific division
    // rounding can leak into the predicate.
    "q17_small_quantity" -> { (s, dir) =>
      val parts = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#4" && col("p_size").between(1, 10))
        .select(col("p_partkey"))
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      val perPart = li.groupBy(col("l_partkey").as("__pk"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).as("__sq"),
          count(lit(1)).as("__n"))
      li.join(perPart, col("l_partkey") === col("__pk"))
        .filter(col("l_quantity").cast("decimal(18,2)") * lit(5) * col("__n") < col("__sq"))
        .agg((coalesce(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"),
          lit(0.0)) / lit(7.0)).as("avg_yearly"))
    },
    // ---- q21 shape (EXISTS + NOT EXISTS on the same fact): both
    // subqueries decorrelate to orderkey-equi joins with a suppkey
    // inequality RESIDUAL — a left-semi ("some OTHER supplier also
    // shipped") then a left-anti ("no OTHER supplier was flagged") over
    // slim (orderkey, suppkey) projections; never a nested loop.
    "q21_waiting_supplier" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val flagged = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val l1 = flagged
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
      l1
        .join(li.select(col("l_orderkey").as("__ok2"), col("l_suppkey").as("__sk2")),
          col("l_orderkey") === col("__ok2") && col("l_suppkey") =!= col("__sk2"),
          "left_semi")
        .join(flagged.select(col("l_orderkey").as("__ok3"), col("l_suppkey").as("__sk3")),
          col("l_orderkey") === col("__ok3") && col("l_suppkey") =!= col("__sk3"),
          "left_anti")
        .join(broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    // ---- q22 shape (NOT EXISTS + global scalar subquery): the scalar
    // "avg positive balance" is one broadcast row; the NOT EXISTS on
    // orders is a LEFT-ANTI join on custkey whose date predicate pushes
    // to the orders scan (every customer here HAS orders, so "idle" means
    // no RECENT orders). The avg comparison cross-multiplies (bal·n >
    // Σbal, exact decimals) — same division-free predicate discipline as
    // q17. Segments stand in for the schema's missing phone prefixes.
    "q22_idle_customers" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY", "FURNITURE"))
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val stats = cust.filter(col("c_acctbal") > 0)
        .agg(
          sum(col("c_acctbal").cast("decimal(18,2)")).as("__sb"),
          count(lit(1)).as("__nb"))
      cust
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1999-01-01 00:00:00")))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(stats))
        .filter(col("c_acctbal").cast("decimal(18,2)") * col("__nb") > col("__sb"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("totacctbal"))
        .orderBy(col("c_mktsegment"))
    },
    // ---- q11 shape (group aggregate vs a global-scalar HAVING): brand
    // value concentration — per-brand decimal sums kept only when they
    // exceed 4% of the grand total. The scalar derives FROM the per-brand
    // aggregate (no second fact scan) and broadcasts back; the predicate
    // cross-multiplies (v·25 > total) so it stays exact decimals.
    "q11_value_concentration" -> { (s, dir) =>
      val perBrand = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_extendedprice"))
        .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("__v"))
      val total = perBrand.agg(sum(col("__v")).as("__t"))
      perBrand
        .crossJoin(broadcast(total))
        .filter(col("__v") * lit(25) > col("__t"))
        .select(col("p_brand"), col("__v").cast("double").as("brand_value"))
        .orderBy(col("brand_value").desc, col("p_brand"))
    },
    // ---- q13 shape (outer-join count distribution): LEFT OUTER with the
    // right side pre-filtered (≡ an AND in the ON clause — the filter
    // pushes to the orders scan), then the double aggregate: per-customer
    // order counts, then the histogram of those counts. count(o_orderkey)
    // counts only matched rows — zero-order customers land in bucket 0.
    "q13_order_distribution" -> { (s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"))
        .join(
          t(s, dir, "orders")
            .filter(col("o_orderpriority") =!= "1-URGENT")
            .select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    // ---- q16 shape (NOT IN → anti + count-distinct): the supplier
    // blocklist subquery decorrelates to a LEFT-ANTI join (keys non-null,
    // so NOT IN ≡ anti); the distinct-supplier count per (brand, size)
    // runs as the two-phase distinct aggregate over the slim join output.
    "q16_supplier_counts" -> { (s, dir) =>
      val bad = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(
          t(s, dir, "part")
            .filter(col("p_brand") =!= "Brand#4" &&
              col("p_size").isin(1, 5, 9, 13, 17, 21))
            .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_size"))
        .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    },
    // ---- q20 shape (IN → semi against an aggregated subquery): the
    // volume-threshold aggregate shrinks lineitem to qualifying suppliers
    // (12 of 100 at this predicate), which then SEMI-join the supplier
    // dim — aggregate first, join the survivors.
    "q20_volume_suppliers" -> { (s, dir) =>
      val qual = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"), col("l_shipdate"))
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .join(broadcast(
          t(s, dir, "part").filter(col("p_name").startsWith("red"))
            .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("__sq"))
        .filter(col("__sq") > 400)
        .select(col("l_suppkey"))
      t(s, dir, "supplier")
        .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    },
    // ---- salted equi-join: the hot-key spreading plan — big side salts
    // deterministically, small side replicates salt-ways, semantics stay
    // EXACTLY the plain join (shares a plain-join oracle). SkewSpec pins
    // that the shuffle really carries (key, salt).
    "salted_join" -> { (s, dir) =>
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.Skew.saltedEquiJoin(
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"), col("l_discount")),
        ord, Seq("l_orderkey"), salt = 8, saltBy = col("l_linenumber"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)"))
          ).cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
    },
    // ---- market-basket association: orders are baskets, brands are
    // items; exact support counts, confidence/lift on the 1e-6 integer
    // grid. The self-join fans out per-basket (bounded by order width),
    // never per-corpus.
    "basket_lift" -> { (s, dir) =>
      val baskets = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
      graft.operators.Analytics.coOccurrence(baskets, "l_orderkey", "p_brand", minSupport = 2)
        .orderBy(col("item_a"), col("item_b"))
    },
    // ---- the basket state as MAINTAINED TABLES: pair/item counts are
    // additive over disjoint baskets, so half the orders materialize and
    // the other half folds in O(batch) — stats from the tables share the
    // from-scratch oracle. Basket ids are the idempotence guard.
    "basket_lift_append" -> { (s, dir) =>
      Fixtures.cached(s"basket_tables|$dir") {
        val baskets = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
          .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
        graft.operators.Analytics.materializeBasketTables(
          baskets.filter(col("l_orderkey") % 2 === 0), "l_orderkey", "p_brand", "graft_basket")
        graft.operators.Analytics.appendToBasketTables(
          baskets.filter(col("l_orderkey") % 2 === 1), "l_orderkey", "p_brand", "graft_basket")
        java.lang.Boolean.TRUE
      }
      graft.operators.Analytics.basketStats(s, "graft_basket", minSupport = 2)
        .orderBy(col("item_a"), col("item_b"))
    },
    // ---- dyadic EWMA of daily value totals: the whole recurrence is
    // integer (micros + right-shift), so the smoothed level replicates
    // bit-for-bit through DuckDB's list_reduce.
    "ewma_daily" -> { (s, dir) =>
      graft.operators.Analytics.ewmaDaily(events(s, dir), "event_type", "ts", "value", k = 2)
        .orderBy(col("event_type"))
    },
    // ---- strictly-ordered funnel (view -> click -> purchase): one
    // filtered aggregate pass per step, each shuffling (user, ts) pairs of
    // ONE event type — no per-user event lists, no skew-prone per-user
    // window sort.
    "funnel" -> { (s, dir) =>
      graft.operators.Analytics.funnel(
        events(s, dir), "user_id", "event_type", "ts",
        steps = Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))
    },
    // ---- per-step funnel conversion counts (monotone by construction).
    "funnel_counts" -> { (s, dir) =>
      graft.operators.Analytics.funnelCounts(
        events(s, dir), "user_id", "event_type", "ts",
        steps = Seq("view", "click", "purchase"))
        .orderBy(col("step"))
    },
    // ---- time-to-convert distribution: funnel lags through the mergeable
    // histogram sketch (1-day bins over minutes).
    "funnel_lag_quantiles" -> { (s, dir) =>
      val f = graft.operators.Analytics.funnel(
        events(s, dir), "user_id", "event_type", "ts",
        steps = Seq("view", "click", "purchase"))
        .select(expr("(unix_micros(t3) - unix_micros(t1)) DIV 60000000")
          .cast("double").as("lag_min"))
      graft.operators.Sketches.histQuantiles(
        graft.operators.Sketches.histSketch(f, "lag_min", binWidth = 1440.0),
        binWidth = 1440.0, ps = Seq(0.5, 0.9, 0.99))
        .orderBy(col("p"))
    },
    // ---- gap-based sessionization: one slim (user, ts, id, value) shuffle,
    // per-user ordered cut — sessions can't pre-aggregate per partition, so
    // the per-entity window IS the declarative spelling.
    "sessionize" -> { (s, dir) =>
      graft.operators.Analytics.sessionize(
        events(s, dir), "user_id", "ts", "event_id", "value", gapMinutes = 30)
        .orderBy(col("user_id"), col("session_id"))
    },
    // ---- the streaming twin of sessionize: flatMapGroupsWithState with
    // O(1) per-entity state and event-time-timeout finalization, driven
    // through ts-ordered micro-batches; sentinels close the tail. Shares
    // the batch oracle — stream ≡ batch on ordered replays.
    "sessionize_stream" -> { (s, dir) =>
      val outPath = Fixtures.cached(s"sessionize_stream|$dir") {
        // De-collected (r18): the three ts-third epochs + two 1-row
        // sentinels feed as one parquet file per micro-batch (EpochFeed)
        // and the appended output lands in a parquet sink — no event- or
        // session-grain rows touch the driver.
        import s.implicits._
        val ev = events(s, dir).select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val qs = ev.agg(
          expr("percentile(unix_micros(ts), 0.3333)").as("q1"),
          expr("percentile(unix_micros(ts), 0.6667)").as("q2")).head()
        val (b1, b2) = (qs.getDouble(0), qs.getDouble(1))
        val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
        // two sentinels: the first advances the watermark past every open
        // session's end + gap; the second's batch fires their timeouts
        def sentinel(i: Int, days: Long) =
          Seq((-1L - i, new java.sql.Timestamp(maxTs.getTime + days * 86400000L),
            -1L, 0.0)).toDF("user_id", "ts", "event_id", "value")
        val out = graft.streaming.StreamingOps.sessionizeStream(
          graft.streaming.EpochFeed.feed(s, Seq(
            ev.filter(expr(s"unix_micros(ts) <= $b1")),
            ev.filter(expr(s"unix_micros(ts) > $b1 AND unix_micros(ts) <= $b2")),
            ev.filter(expr(s"unix_micros(ts) > $b2")),
            sentinel(0, 30L), sentinel(1, 60L))),
          "user_id", "ts", "event_id", "value", gapMinutes = 30)
        graft.streaming.EpochFeed.runToParquet(out)
      }
      s.read.parquet(outPath).filter(col("user_id") >= 0L)
        .orderBy(col("user_id"), col("session_id"))
    },
    // ---- top session-opening paths: first 3 event types per session
    // (same strict-gap cut as sessionize), counted across sessions; the
    // per-session collect is depth-capped.
    "session_paths" -> { (s, dir) =>
      graft.operators.Analytics.sessionPaths(
        events(s, dir), "user_id", "ts", "event_id", "event_type",
        gapMinutes = 30, depth = 3, topK = 25)
    },
    // ---- time-weighted average value per type: step-function hold until
    // the next event, whole-second durations, one lead() frontier — all
    // integer arithmetic.
    "twap_by_type" -> { (s, dir) =>
      graft.operators.Analytics.twap(events(s, dir), "event_type", "ts", "event_id", "value")
        .orderBy(col("event_type"))
    },
    // ---- Holt linear smoothing: level + trend + 7-day forecast per type,
    // the two-state dyadic recurrence replicated through DuckDB's
    // struct-typed list_reduce.
    "holt_daily" -> { (s, dir) =>
      graft.operators.Analytics.holtDaily(
        events(s, dir), "event_type", "ts", "value", k = 2, j = 1, forecastDays = 7)
        .orderBy(col("event_type"))
    },
    // ---- one-sided CUSUM drift gate: per-type cumulative positive
    // deviation from the type's OWN mean daily total, threshold = 10% of
    // the mean — pure integer three-state fold.
    "cusum_daily" -> { (s, dir) =>
      graft.operators.Analytics.cusumDaily(
        events(s, dir), "event_type", "ts", "value", thresholdPctOfMu = 10)
        .orderBy(col("event_type"))
    },
    // ---- key-skew profile: the diagnostic that gates the salted join —
    // top customer keys of orders with share and uniform-multiple.
    "skew_profile" -> { (s, dir) =>
      graft.operators.Skew.profileKeys(t(s, dir, "orders"), "o_custkey", topK = 10)
        .orderBy(col("n").desc, col("key"))
    },
    // ---- Gini concentration of event value per type: exact rank form,
    // one floor division at the end — the inequality partner to
    // category_entropy's diversity view.
    "gini_by_type" -> { (s, dir) =>
      graft.operators.Analytics.giniByKey(
        events(s, dir), "event_type", "value", "event_id")
        .orderBy(col("event_type"))
    },
    // ---- Benford first-digit screen over order totals: digit from the
    // BIGINT's string form (log10 boundaries are ulp-fragile), expected
    // frequencies spliced as exact constants — one 9-group aggregate.
    "benford_digits" -> { (s, dir) =>
      graft.operators.Profile.benfordDigits(t(s, dir, "orders"), "o_totalprice")
        .orderBy(col("digit"))
    },
    // ---- per-source language entropy: ln-grid summands floored before
    // the cross-category sum — "is this source a monoculture".
    "category_entropy" -> { (s, dir) =>
      graft.operators.Profile.categoryEntropy(
        t(s, dir, "documents"), "source", "lang")
        .orderBy(col("source"))
    },
    // ---- robust stats: winsorized + trimmed micro sums clamped at the
    // exact 5%/95% rank values — division-free (longs all the way), so
    // negative readings are exact too.
    "robust_stats" -> { (s, dir) =>
      graft.operators.Analytics.robustStats(
        events(s, dir), "event_type", "value", "event_id", trimPct = 5)
        .orderBy(col("event_type"))
    },
    // ---- RFM segmentation over purchases: exact integer quintile scores
    // from the rank_normalize bucket rule; the user-grain aggregate is the
    // only event-sized shuffle.
    "rfm_segments" -> { (s, dir) =>
      graft.operators.Analytics.rfmSegments(
        events(s, dir), "user_id", "ts", "value", ("event_type", "purchase"))
        .orderBy(col("user_id"))
    },
    // ---- decile lift (gains chart): users ranked by total event value
    // as the "score", label = made a purchase; exact population deciles
    // via the range-partitioned global rank, integer lift vs base rate.
    "decile_lift" -> { (s, dir) =>
      val perUser = events(s, dir)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(coalesce(floor(col("value") * 1000000.0).cast("long"), lit(0L)))
          .as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("label"))
      graft.operators.Analytics.decileLift(
        perUser, "user_id", col("score"), col("label"))
        .orderBy(col("decile"))
    },
    // ---- exact ROC AUC (Mann–Whitney with midrank ties, pure integer
    // on the doubled-rank grid): does total event value predict who
    // purchases — the companion metric to decile_lift's gains table.
    "auc_score" -> { (s, dir) =>
      val perUser = events(s, dir)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(coalesce(floor(col("value") * 1000000.0).cast("long"), lit(0L)))
          .as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("label"))
      graft.operators.Analytics.aucScore(
        perUser, "user_id", col("score"), col("label"))
    },
    // ---- score-distribution drift (TVD over reference-decile value
    // bins, the log-free PSI sibling): even-user scores as reference,
    // odd-user scores as current — both binned by the SAME value
    // cutoffs, so identical distributions read exactly zero.
    "score_drift_tvd" -> { (s, dir) =>
      val perUser = events(s, dir)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(coalesce(floor(col("value") * 1000000.0).cast("long"), lit(0L)))
          .as("score"))
      graft.operators.Analytics.scoreDriftTvd(
        perUser.filter(col("user_id") % 2 === 0),
        perUser.filter(col("user_id") % 2 === 1),
        "user_id", col("score"))
        .orderBy(col("bin"))
    },
    // ---- two-sample KS separation of the same score: max CDF gap
    // between purchasers and non-purchasers with the peak score — the
    // credit-scoring KS, completing the lift/AUC/KS evaluation family.
    "ks_score" -> { (s, dir) =>
      // label = frequent purchaser (≥4): nearly every user purchases at
      // least once, so the ≥1 label would leave no negative class
      val perUser = events(s, dir)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(coalesce(floor(col("value") * 1000000.0).cast("long"), lit(0L)))
          .as("score"),
          when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 4L,
            1L).otherwise(0L).as("label"))
      graft.operators.Analytics.ksScore(
        perUser, "user_id", col("score"), col("label"))
    },
    // ---- maintained score-distribution stats: the per-score class
    // counts ALL FOUR eval metrics consume, kept as a single-commit
    // append-only fact table (batches partition the entity set; replay
    // no-ops on the __gen guard). Three generations + a replay fold to
    // the from-scratch per-score counts.
    "score_stats_append" -> { (s, dir) =>
      scoreStatsTable(s, dir)
      graft.operators.ScoreStats.read(s, "graft_scorestats")
        .select(col("__s").as("score_micro"), col("n").as("n_entities"),
          col("pos").as("n_positive"))
        .orderBy(col("score_micro"))
    },
    // ---- AUC re-derived from the MAINTAINED stats table: the midrank
    // arithmetic runs on score-cardinality rows (lifting the 2n²·10⁶
    // integer bound from entities to distinct scores) and must equal the
    // from-scratch entity-grain aucScore bit for bit.
    "auc_from_stats" -> { (s, dir) =>
      scoreStatsTable(s, dir)
      graft.operators.ScoreStats.aucFromStats(
        graft.operators.ScoreStats.read(s, "graft_scorestats"))
    },
    // ---- decile lift from the stats table: stats cannot see entity
    // ids, so the intra-score tie rule is POSITIVES-FIRST (score DESC,
    // label DESC) — deterministic, stats-derivable, and recomputed from
    // raw by the oracle under the same rule.
    "decile_lift_from_stats" -> { (s, dir) =>
      scoreStatsTable(s, dir)
      graft.operators.ScoreStats.decileLiftFromStats(
        graft.operators.ScoreStats.read(s, "graft_scorestats"))
        .orderBy(col("decile"))
    },
    // ---- KS from score-grain stats (the ks_score labeling, ≥4
    // purchases): same cumulative-CDF integer spelling, score-grain in.
    "ks_from_stats" -> { (s, dir) =>
      graft.operators.ScoreStats.ksFromStats(ksLabeledStats(s, dir))
    },
    // ---- TVD drift from two score-grain stats frames: the reference's
    // decile cutoffs are order statistics, fully determined by
    // cumulative counts — shares score_drift_tvd's oracle. The binned
    // masses come from the SHARED driftBinnedCounts pass (cuts depend
    // only on the reference frame — computed once, consumed by both
    // drift metrics; the round-15 cost fix for the pair).
    "tvd_from_stats" -> { (s, dir) =>
      graft.operators.ScoreStats.tvdFromBinned(driftBinnedFixture(s, dir))
        .orderBy(col("bin"))
    },
    // ---- PSI on the same reference-decile bins (the log-based
    // industry-standard drift metric beside TVD): zero bins floored to
    // one count, the (p_cur−p_ref)·ln(p_cur∕p_ref) term evaluated in one
    // fixed double tree floored to micros; projects the SAME shared
    // binned-counts frame as tvd_from_stats.
    "psi_from_stats" -> { (s, dir) =>
      graft.operators.ScoreStats.psiFromBinned(driftBinnedFixture(s, dir))
        .orderBy(col("bin"))
    },
    // ---- per-day KS separation (grouped): where does daily value
    // separate frequent purchasers from the rest, day by day; per-key
    // cumulative windows, one-class days absent.
    "ks_by_day" -> { (s, dir) =>
      graft.operators.Analytics.ksScoreByKey(
        perUserDayScores(s, dir), "day", "user_id", col("score"), col("label"))
        .orderBy(col("day"))
    },
    // ---- per-day KS derived from the KEYED MAINTAINED stats table
    // (three entity-partitioned generations + a replay): per-key
    // cumulative CDFs over (day, score)-grain counts — the incremental
    // twin of ks_by_day, same oracle.
    "ks_by_day_from_stats" -> { (s, dir) =>
      scoreStatsKeyedTable(s, dir)
      graft.operators.ScoreStats.ksByKeyFromStats(
        graft.operators.ScoreStats.readKeyed(s, "graft_scorestats_byday"), "day")
        .orderBy(col("day"))
    },
    // ---- ROC curve points (one per distinct score threshold): the full
    // confusion + TPR/FPR/precision behind the AUC number — the
    // threshold-picking table; cumulative class counts range-partitioned.
    "roc_points" -> { (s, dir) =>
      graft.operators.ScoreStats.rocFromStats(ksLabeledStats(s, dir))
        .orderBy(col("threshold_micro"))
    },
    // ---- per-day AUC trend (grouped Mann–Whitney): does daily user
    // value predict a same-day purchase, day by day — the slice-wise
    // read a single global AUC hides; ranks per-key windowed, never a
    // global sort; one-class days absent.
    "auc_by_day" -> { (s, dir) =>
      graft.operators.Analytics.aucScoreByKey(
        perUserDayScores(s, dir), "day", "user_id", col("score"), col("label"))
        .orderBy(col("day"))
    },
    // ---- per-day AUC derived from the KEYED MAINTAINED stats table: the
    // grouped Mann–Whitney midranks come straight from per-key cumulative
    // counts (2·cum − n + 1 per score group), so the daily model-quality
    // trend reads incrementally instead of rescanning raw scored events —
    // the round-15 unification of the eval family; same oracle as
    // auc_by_day.
    "auc_by_day_from_stats" -> { (s, dir) =>
      scoreStatsKeyedTable(s, dir)
      graft.operators.ScoreStats.aucByKeyFromStats(
        graft.operators.ScoreStats.readKeyed(s, "graft_scorestats_byday"), "day")
        .orderBy(col("day"))
    },
    // ---- calibration (reliability) table from the MAINTAINED stats:
    // equal-width score bins with population, positives, mean score and
    // observed positive rate — the "do higher scores convert more"
    // diagnostic next to AUC/KS, integer throughout.
    "calibration_from_stats" -> { (s, dir) =>
      scoreStatsTable(s, dir)
      graft.operators.ScoreStats.calibrationFromStats(
        graft.operators.ScoreStats.read(s, "graft_scorestats"), nBins = 10)
        .orderBy(col("bin"))
    },
    // ---- catalog statistics maintenance (the CBO feed): ANALYZE a
    // materialized table, then surface the optimizer-visible statistics
    // AS DATA — row count plus each analyzed column's exact min/max/
    // null-count (the HLL-approximate NDV stays a planner detail). The
    // oracle recomputes the same aggregates from raw.
    "table_stats" -> { (s, dir) =>
      Fixtures.cached(s"table_stats|$dir") {
        graft.operators.Bucketing.materializePlain(
          t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice")),
          "graft_stats_orders")
        graft.operators.TableStats.collectStats(
          s, "graft_stats_orders", Seq("o_orderkey", "o_custkey"))
        java.lang.Boolean.TRUE
      }
      graft.operators.TableStats.readStats(s, "graft_stats_orders")
        .orderBy(col("entity"), col("stat"))
    },
    // ---- score-stats COMPACTION: three append generations folded to one
    // (HWM __gen preserved, staged swap) must read identically to the
    // from-scratch recount — the generation fold the maintained table
    // needs at production tick counts; shares score_stats_append's
    // oracle.
    "score_stats_compact" -> { (s, dir) =>
      Fixtures.cached(s"score_stats_compact|$dir") {
        val perUser = events(s, dir)
          .filter(col("user_id").isNotNull)
          .groupBy(col("user_id"))
          .agg(sum(coalesce(floor(col("value") * 1000000.0).cast("long"), lit(0L)))
            .as("score"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("label"))
        def batch(r: Int) = perUser.filter(col("user_id") % 3 === r)
        graft.operators.ScoreStats.materialize(
          batch(0), col("score"), col("label"), "graft_scorestats_cmp", batchId = 0L)
        graft.operators.ScoreStats.append(
          batch(1), col("score"), col("label"), "graft_scorestats_cmp", batchId = 1L)
        graft.operators.ScoreStats.append(
          batch(2), col("score"), col("label"), "graft_scorestats_cmp", batchId = 2L)
        graft.operators.ScoreStats.compactScoreStats(s, "graft_scorestats_cmp")
        graft.operators.ScoreStats.append( // old tick replayed POST-compact:
          batch(2), col("score"), col("label"), "graft_scorestats_cmp", batchId = 2L)
        java.lang.Boolean.TRUE // no-op — the fold preserved the __gen guard
      }
      graft.operators.ScoreStats.read(s, "graft_scorestats_cmp")
        .select(col("__s").as("score_micro"), col("n").as("n_entities"),
          col("pos").as("n_positive"))
        .orderBy(col("score_micro"))
    },
    // ---- precision-recall curve points (one per distinct threshold):
    // the class-imbalance-honest read beside roc_points — same confusion
    // arithmetic, recall axis instead of FPR.
    "pr_points" -> { (s, dir) =>
      graft.operators.ScoreStats.prFromStats(shareLabeledStats(s, dir))
        .orderBy(col("threshold_micro"))
    },
    // ---- average precision (step-wise area under the PR curve): each
    // threshold's recall increment is its own positives, so the scalar
    // needs NO ordered pass beyond the shared prefix sums — integer on
    // the micro grid end to end.
    "average_precision" -> { (s, dir) =>
      graft.operators.ScoreStats.averagePrecisionFromStats(shareLabeledStats(s, dir))
    },
    // ---- Expected Calibration Error: population-weighted mean |observed
    // positive rate − mean score| over the calibration bins. The score
    // here is a genuine micro-probability (each user's click-or-purchase
    // share of their events), so the scalar is a real calibration read.
    "ece_from_stats" -> { (s, dir) =>
      graft.operators.ScoreStats.eceFromStats(probLabeledStats(s, dir), nBins = 10)
    },
    // ---- STREAMING twin of score_stats_append: scored-entity stream →
    // foreachBatch → score-grain generations, __gen-guarded (counts are
    // additive, so the guard — not idempotence — makes replays no-ops).
    // Two epochs + a replayed tick fold to the from-scratch per-score
    // counts; shares score_stats_append's oracle.
    "score_stats_stream" -> { (s, dir) =>
      Fixtures.cached(s"score_stats_stream|$dir") {
        // De-collected (r18): the two entity-half epochs feed the wrapper
        // as one parquet file each (EpochFeed, one micro-batch per epoch in
        // order) instead of driver-collected tuples; the crash-replay tick
        // calls the foreachBatch body with the executor-resident half.
        val perUser = events(s, dir)
          .filter(col("user_id").isNotNull)
          .groupBy(col("user_id"))
          .agg(sum(coalesce(floor(col("value") * 1000000.0).cast("long"), lit(0L)))
            .as("score"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("label"))
        def half(r: Int) = perUser.filter(col("user_id") % 2 === r)
        s.sql("DROP TABLE IF EXISTS graft_scorestats_stream")
        val q = graft.operators.ScoreStats.scoreStatsStream(
          graft.streaming.EpochFeed.feed(s, Seq(half(0), half(1))),
          "graft_scorestats_stream", col("score"), col("label")).start()
        try q.processAllAvailable() finally q.stop()
        // crash-replay of epoch 1: the __gen guard makes it a no-op
        graft.operators.ScoreStats.append(
          half(1),
          col("score"), col("label"), "graft_scorestats_stream", batchId = 1L)
        java.lang.Boolean.TRUE
      }
      graft.operators.ScoreStats.read(s, "graft_scorestats_stream")
        .select(col("__s").as("score_micro"), col("n").as("n_entities"),
          col("pos").as("n_positive"))
        .orderBy(col("score_micro"))
    },
    // ---- KEYED streaming twin: per-user-DAY scored stream →
    // foreachBatch → (day, score)-grain generations, __gen-guarded; two
    // epochs + a replayed tick fold to the from-scratch keyed recount.
    "score_stats_keyed_stream" -> { (s, dir) =>
      Fixtures.cached(s"score_stats_keyed_stream|$dir") {
        // De-collected (r18): epoch-file feed, replay via the batch body —
        // same shape as score_stats_stream above.
        val perUserDay = perUserDayScores(s, dir)
        def half(r: Int) = perUserDay.filter(col("user_id") % 2 === r)
        s.sql("DROP TABLE IF EXISTS graft_scorestats_keyed_stream")
        val q = graft.operators.ScoreStats.scoreStatsKeyedStream(
          graft.streaming.EpochFeed.feed(s, Seq(half(0), half(1))),
          "graft_scorestats_keyed_stream",
          col("day"), col("score"), col("label")).start()
        try q.processAllAvailable() finally q.stop()
        // crash-replay of epoch 1: the __gen guard makes it a no-op
        graft.operators.ScoreStats.appendKeyed(
          half(1),
          col("day"), col("score"), col("label"),
          "graft_scorestats_keyed_stream", batchId = 1L)
        java.lang.Boolean.TRUE
      }
      graft.operators.ScoreStats.readKeyed(s, "graft_scorestats_keyed_stream")
        .select(col("__k").as("day"), col("__s").as("score_micro"),
          col("n").as("n_entities"), col("pos").as("n_positive"))
        .orderBy(col("day"), col("score_micro"))
    },
    // ---- per-day decile lift (gains chart per day) from the KEYED
    // maintained stats: deciles split each day's own entity count under
    // the positives-first tie rule — "is the model's top decile still
    // 3x baseline today"; zero-positive days absent.
    "decile_lift_by_day_from_stats" -> { (s, dir) =>
      scoreStatsKeyedTable(s, dir)
      graft.operators.ScoreStats.decileLiftByKeyFromStats(
        graft.operators.ScoreStats.readKeyed(s, "graft_scorestats_byday"), "day")
        .orderBy(col("day"), col("decile"))
    },
    // ---- per-day score-drift TREND from the KEYED maintained stats:
    // every day's score mix binned by the PREVIOUS day's exact decile
    // cutoffs, integer TVD gap per bin — "did today's scores move vs
    // yesterday", read incrementally from the (day, score) fact table.
    "drift_by_day_from_stats" -> { (s, dir) =>
      scoreStatsKeyedTable(s, dir)
      graft.operators.ScoreStats.driftByAdjacentKeyFromStats(
        graft.operators.ScoreStats.readKeyed(s, "graft_scorestats_byday"), "day")
        .orderBy(col("day"), col("bin"))
    },
    // ---- STREAMING drift monitor: scored stream → foreachBatch → keyed
    // stats fold + each day's drift row emitted as the day CLOSES (a
    // later day arrives) — the monitoring loop a training pipeline runs.
    // Three day-ordered epochs + a replayed tick; the final (still-open)
    // day is absent. Exactly-once: __gen-guarded fold, day-level
    // anti-join + one insertInto per emission.
    "drift_stream" -> { (s, dir) =>
      Fixtures.cached(s"drift_stream|$dir") {
        // De-collected (r17): the monitor is fed day-ranged SLICES of the
        // executor-resident frame through the same foreachBatch body the
        // streaming wrapper runs (batchIds 0/1/2, exactly what MemoryStream
        // epochs produced) — the old feed collected every user-grain row to
        // the driver, a shape that dies at a larger sf. Only the ~30-value
        // day AXIS is collected, to pick the epoch cuts. The writeStream
        // wrapper itself stays covered by ScoreStatsSpec's MemoryStream test.
        // persist (not localCheckpoint): the blocks must be released after
        // the ticks, and unpersist() only reaches CacheManager-registered
        // frames — a localCheckpoint's blocks would outlive the fixture.
        val scored = perUserDayScores(s, dir).persist()
        val days = scored.select(col("day")).distinct().orderBy(col("day"))
          .collect().map(_.getString(0)).toSeq
        val (c1, c2) = (days(days.length / 3), days(2 * days.length / 3))
        s.sql("DROP TABLE IF EXISTS graft_driftmon_stats")
        s.sql("DROP TABLE IF EXISTS graft_driftmon")
        val tick = graft.operators.ScoreStats.applyDriftMonitorBatch(
          "graft_driftmon_stats", "graft_driftmon",
          col("day"), col("score"), col("label"), outKeyCol = "day") _
        tick(scored.filter(col("day") < c1), 0L)
        tick(scored.filter(col("day") >= c1 && col("day") < c2), 1L)
        tick(scored.filter(col("day") >= c2), 2L)
        // crash-replay of the last epoch: the fold no-ops on the __gen
        // guard and the emission anti-joins to nothing
        tick(scored.filter(col("day") >= c2), 2L)
        // the checkpointed blocks are only needed while the ticks run —
        // don't hold executor storage for the rest of the process (ADVICE r17)
        scored.unpersist()
        java.lang.Boolean.TRUE
      }
      s.table("graft_driftmon").orderBy(col("day"), col("bin"))
    },
    // ---- GROUPED drift trend: per-(event_type, day) score drift vs the
    // type's OWN previous day — the segment-sliced monitoring read. The
    // maintained key is struct(event_type, day); adjacency windows
    // partition by type, so the group axis scales without any counted
    // machinery or broadcast.
    "drift_by_type_day" -> { (s, dir) =>
      Fixtures.cached(s"drift_by_type_day|$dir") {
        val ptd = events(s, dir)
          .filter(col("user_id").isNotNull && col("ts").isNotNull &&
            col("event_type").isNotNull)
          .groupBy(col("event_type"),
            date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
            col("user_id"))
          .agg(sum(coalesce(floor(col("value") * 1000000.0).cast("long"), lit(0L)))
            .as("score"))
        graft.operators.ScoreStats.materializeKeyed(
          ptd, struct(col("event_type"), col("day")), col("score"), lit(0L),
          "graft_scorestats_bytypeday", batchId = 0L)
        java.lang.Boolean.TRUE
      }
      graft.operators.ScoreStats.driftByAdjacentKeyGroupedFromStats(
        graft.operators.ScoreStats.readKeyed(s, "graft_scorestats_bytypeday"),
        "event_type", "day", "event_type", "day")
        .orderBy(col("event_type"), col("day"), col("bin"))
    },
    // ---- STREAMING grouped drift monitor: per-(type, day) drift rows
    // emitted as each day closes WITHIN ITS TYPE (per-group closure —
    // one segment's stream may run ahead of another's); each type's
    // final open day is absent. Same exactly-once contract as
    // drift_stream, at (group, day) grain.
    "drift_stream_by_type" -> { (s, dir) =>
      Fixtures.cached(s"drift_stream_by_type|$dir") {
        // De-collected (r17), same shape as drift_stream: day-ranged slices
        // of the executor-resident frame drive the foreachBatch body
        // directly; only the day axis reaches the driver.
        val scored = events(s, dir)
          .filter(col("user_id").isNotNull && col("ts").isNotNull &&
            col("event_type").isNotNull)
          .groupBy(col("event_type"),
            date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
            col("user_id"))
          .agg(sum(coalesce(floor(col("value") * 1000000.0).cast("long"), lit(0L)))
            .as("score"))
          .withColumn("label", lit(0L))
          // persist, not localCheckpoint — see drift_stream above
          .persist()
        val days = scored.select(col("day")).distinct().orderBy(col("day"))
          .collect().map(_.getString(0)).toSeq
        val (c1, c2) = (days(days.length / 3), days(2 * days.length / 3))
        s.sql("DROP TABLE IF EXISTS graft_gdriftmon_stats")
        s.sql("DROP TABLE IF EXISTS graft_gdriftmon")
        val tick = graft.operators.ScoreStats.applyGroupedDriftMonitorBatch(
          "graft_gdriftmon_stats", "graft_gdriftmon",
          struct(col("event_type"), col("day")), col("score"), col("label"),
          "event_type", "day",
          outGroupCol = "event_type", outKeyCol = "day") _
        tick(scored.filter(col("day") < c1), 0L)
        tick(scored.filter(col("day") >= c1 && col("day") < c2), 1L)
        tick(scored.filter(col("day") >= c2), 2L)
        // crash-replay of the last epoch: guarded fold, anti-joined emit
        tick(scored.filter(col("day") >= c2), 2L)
        // release the checkpointed blocks once the ticks are done (ADVICE r17)
        scored.unpersist()
        java.lang.Boolean.TRUE
      }
      s.table("graft_gdriftmon")
        .orderBy(col("event_type"), col("day"), col("bin"))
    },
    // ---- CATEGORICAL drift (mix shift of the event-type distribution,
    // first half-year vs second): per-category shares with TVD gaps and
    // PSI terms — the nominal-column sibling of the score-drift pair.
    "categorical_drift" -> { (s, dir) =>
      val ev = events(s, dir).filter(col("ts").isNotNull)
      graft.operators.Analytics.categoricalDrift(
        ev.filter(month(col("ts")) <= 6),
        ev.filter(month(col("ts")) > 6),
        "event_type")
        .orderBy(col("category"))
    },
    // ---- Brier score (strictly-proper MSE of the probability forecast)
    // on the same click-or-purchase-share micro-probability as ECE —
    // exact on the micro² grid, DECIMAL(38,0) internally (n·s² overflows
    // a long at >9.2M entities per score group).
    "brier_from_stats" -> { (s, dir) =>
      graft.operators.ScoreStats.brierFromStats(probLabeledStats(s, dir))
    },
    // ---- exact quantile mapping: view-event values re-expressed on the
    // purchase-value distribution by rank (⌈r·n_b∕n_a⌉-th order
    // statistic) — cross-corpus score calibration, integer throughout.
    "quantile_map" -> { (s, dir) =>
      val ev = events(s, dir)
      graft.operators.Analytics.quantileMap(
        ev.filter(col("event_type") === "view"), "event_id",
        floor(col("value") * 1000000.0),
        ev.filter(col("event_type") === "purchase"),
        floor(col("value") * 1000000.0))
        .withColumnRenamed("value", "value_micro")
        .withColumnRenamed("mapped", "mapped_micro")
        .orderBy(col("event_id"))
    },
    // ---- exact lower weighted median: cent-grid extended price per
    // return flag, weighted by quantity — 2·cum ≥ tot integer spelling,
    // tie runs share a value so intra-tie order cannot matter.
    "weighted_median" -> { (s, dir) =>
      graft.operators.Analytics.weightedMedian(
        t(s, dir, "lineitem"), "l_returnflag",
        floor(col("l_extendedprice") * 100), col("l_quantity"))
        .withColumnRenamed("weighted_median", "median_cents")
        .orderBy(col("l_returnflag"))
    },
    // ---- exact mode (ties to smallest): most common order quantity per
    // return flag — two keyed aggregates, argmax via max(struct).
    "mode_per_key" -> { (s, dir) =>
      graft.operators.Analytics.modePerKey(
        t(s, dir, "lineitem"), "l_returnflag", col("l_quantity"))
        .orderBy(col("l_returnflag"))
    },
    // ---- per-key autocorrelation at calendar lags 1 and 7: exact
    // integer sums over true day-arithmetic lag pairs (gaps contribute
    // nothing), final Pearson one fixed double tree floored to micro —
    // "does last Monday predict this Monday".
    "acf_daily" -> { (s, dir) =>
      graft.operators.Analytics.acfDaily(
        events(s, dir), "event_type", "ts", "value", Seq(1, 7),
        scaleDiv = 1000L) // milli grid: micro daily totals overflow sum(x*y)
        .orderBy(col("event_type"), col("lag"))
    },
    // ---- day-of-week seasonal profile: ratio-to-mean decomposition on
    // the 1e-6 grid from the SHARED materialized daily rollup (both
    // seasonality entries derive from one events scan — see
    // seasonalDaily); the profile is keys·7 rows.
    "seasonality_dow" -> { (s, dir) =>
      graft.operators.Analytics.seasonalDowProfileFromDaily(
        seasonalDaily(s, dir), "event_type")
        .orderBy(col("event_type"), col("dow"))
    },
    // ---- seasonal outliers: each day's total scored against ITS OWN
    // day-of-week mean — "a quiet Sunday is normal, a quiet Tuesday is an
    // incident" — top-3 deviants per type, from the same daily rollup.
    "seasonal_outliers" -> { (s, dir) =>
      graft.operators.Analytics.seasonalOutliersFromDaily(
        seasonalDaily(s, dir), "event_type", topK = 3)
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .orderBy(col("event_type"), col("day"))
    },
    // ---- 2-D skyline (pareto frontier, Börzsönyi et al. ICDE 2001):
    // per-brand parts minimizing (size, retailprice). One keyed agg to
    // per-size minima + a per-group EXCLUSIVE prefix-min — never the
    // block-nested-loops dominance join.
    "skyline_parts" -> { (s, dir) =>
      graft.operators.Skyline.skyline2d(
        t(s, dir, "part"), "p_size", "p_retailprice", Seq("p_brand"))
        .select(col("p_brand"), col("p_partkey"),
          col("p_size").cast("long").as("p_size"), col("p_retailprice"))
        .orderBy(col("p_brand"), col("p_size"), col("p_partkey"))
    },
    // ---- global frontier of (order day, total price) — "the cheapest
    // order seen by each date" staircase. Ungrouped + Comparable
    // coordinates, so skyline2d routes through the TWO-PHASE shape: one
    // map-only per-partition staircase pass prunes the base, then the
    // exact algorithm (adaptive prefix-min + frontier semi-join) runs
    // over survivors only — one base scan total (round-16 sf10 A/B:
    // 2.67 s → 0.83 s; see BASELINE.md).
    "skyline_orders" -> { (s, dir) =>
      graft.operators.Skyline.skyline2d(
        t(s, dir, "orders")
          .select(col("o_orderkey"),
            datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
              .cast("long").as("oday"),
            col("o_totalprice")),
        "oday", "o_totalprice")
        .orderBy(col("oday"), col("o_orderkey"))
    },
    // ---- maintained frontier: skyline(A∪B) = skyline(skyline(A)∪B), so
    // each tick folds only (frontier + batch); replay is the identity
    // (guard-free, the HLL/Bloom idempotence class). Three generations +
    // a replay share the from-scratch skyline_orders oracle.
    "skyline_append" -> { (s, dir) =>
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
            .cast("long").as("oday"),
          col("o_totalprice"))
      Fixtures.cached(s"skyline_append|$dir") {
        graft.operators.Skyline.materializeSkyline(
          base.filter(col("o_orderkey") % 3 === 0), "oday", "o_totalprice",
          "graft_skyline")
        graft.operators.Skyline.appendToSkyline(
          base.filter(col("o_orderkey") % 3 === 1), "oday", "o_totalprice",
          "graft_skyline")
        graft.operators.Skyline.appendToSkyline(
          base.filter(col("o_orderkey") % 3 === 2), "oday", "o_totalprice",
          "graft_skyline")
        graft.operators.Skyline.appendToSkyline( // replay: identity
          base.filter(col("o_orderkey") % 3 === 2), "oday", "o_totalprice",
          "graft_skyline")
        java.lang.Boolean.TRUE
      }
      s.table("graft_skyline").orderBy(col("oday"), col("o_orderkey"))
    },
    // ---- weekly retention cohorts: distinct (user, week) is the only
    // entity-keyed shuffle; the cohort matrix is a plain count, never a
    // count(distinct).
    "retention_cohorts" -> { (s, dir) =>
      graft.operators.Analytics.retention(events(s, dir), "user_id", "ts")
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    // ---- daily resample + LOCF gap-fill: the daily pre-agg is the only
    // event-sized shuffle; the calendar explode and LOCF window run over
    // day-sized frames.
    "gap_fill_daily" -> { (s, dir) =>
      graft.operators.Analytics.gapFillDaily(events(s, dir), "user_id", "ts", "value")
        .orderBy(col("user_id"), col("day"))
    },
    // ---- trailing-window anomaly detection: one slim shuffle, ROWS-bounded
    // frame (O(lookback) state per row), integer-grid exact z-scores.
    "anomaly_events" -> { (s, dir) =>
      graft.operators.Analytics.anomalies(events(s, dir), "user_id", "ts",
        "event_id", "value", lookback = 20, minN = 8, threshold = 2.0)
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    // ---- composed per-user analytics board: sessionize + anomalies +
    // attribution fan out from ONE checkpointed slim projection (the
    // corpus_pipeline pattern) — the events parquet is read once.
    "analytics_pipeline" -> { (s, dir) =>
      val ev = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
        .localCheckpoint()
      val nsess = graft.operators.Analytics
        .sessionize(ev, "user_id", "ts", "event_id", "value", gapMinutes = 30)
        .groupBy(col("user_id")).agg(max(col("session_id")).as("n_sessions"))
      val base = ev.groupBy(col("user_id")).agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      val nanom = graft.operators.Analytics
        .anomalies(ev, "user_id", "ts", "event_id", "value", 20, 8, 2.0)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_anomalies"))
      val nattr = graft.operators.Analytics
        .lastTouchAttribution(ev, "user_id", "ts", "event_id", "event_type",
          "purchase", Seq("view", "click"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_attributed"))
      base
        .join(nsess, Seq("user_id"))
        .join(nanom, Seq("user_id"), "left")
        .join(nattr, Seq("user_id"), "left")
        .select(col("user_id"), col("n_sessions"), col("n_events"), col("total_value"),
          coalesce(col("n_anomalies"), lit(0L)).as("n_anomalies"),
          coalesce(col("n_attributed"), lit(0L)).as("n_attributed"))
        .orderBy(col("user_id"))
    },
    // ---- the streaming twin of anomaly_events: immediate per-event
    // verdicts from O(lookback) keyed state — the alerting path. Shares
    // the batch oracle on ordered replays.
    "anomaly_events_stream" -> { (s, dir) =>
      val outPath = Fixtures.cached(s"anomaly_stream|$dir") {
        // De-collected (r18): epoch-file feed + parquet sink — no event-
        // grain rows touch the driver. No sentinels: verdicts are
        // immediate, nothing awaits a watermark.
        val ev = events(s, dir).select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val qs = ev.agg(
          expr("percentile(unix_micros(ts), 0.3333)").as("q1"),
          expr("percentile(unix_micros(ts), 0.6667)").as("q2")).head()
        val (b1, b2) = (qs.getDouble(0), qs.getDouble(1))
        val out = graft.streaming.StreamingOps.anomalyStream(
          graft.streaming.EpochFeed.feed(s, Seq(
            ev.filter(expr(s"unix_micros(ts) <= $b1")),
            ev.filter(expr(s"unix_micros(ts) > $b1 AND unix_micros(ts) <= $b2")),
            ev.filter(expr(s"unix_micros(ts) > $b2")))),
          "user_id", "ts", "event_id", "value", lookback = 20, minN = 8, threshold = 2.0)
        graft.streaming.EpochFeed.runToParquet(out)
      }
      s.read.parquet(outPath)
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    // ---- the streaming twin of funnel: a per-entity step machine in the
    // keyed state store (one counter + <= steps timestamps); completions
    // emit the moment the last step lands — no watermark wait, no
    // sentinels. Shares the batch funnel oracle on ordered replays.
    "funnel_stream" -> { (s, dir) =>
      val outPath = Fixtures.cached(s"funnel_stream|$dir") {
        // De-collected (r18): epoch-file feed + parquet sink. No
        // sentinels: completions are immediate, nothing awaits a watermark.
        val ev = events(s, dir).select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        val qs = ev.agg(
          expr("percentile(unix_micros(ts), 0.3333)").as("q1"),
          expr("percentile(unix_micros(ts), 0.6667)").as("q2")).head()
        val (b1, b2) = (qs.getDouble(0), qs.getDouble(1))
        val out = graft.streaming.StreamingOps.funnelStream(
          graft.streaming.EpochFeed.feed(s, Seq(
            ev.filter(expr(s"unix_micros(ts) <= $b1")),
            ev.filter(expr(s"unix_micros(ts) > $b1 AND unix_micros(ts) <= $b2")),
            ev.filter(expr(s"unix_micros(ts) > $b2")))),
          "user_id", "event_type", "ts", "event_id",
          steps = Seq("view", "click", "purchase"))
        graft.streaming.EpochFeed.runToParquet(out)
      }
      s.read.parquet(outPath)
        .orderBy(col("user_id"))
    },
    // ---- CONTINUOUS last-touch attribution: O(1) per-entity state (the
    // cheapest streaming twin — one touch type + timestamp), conversions
    // emit on arrival, and three ordered micro-batches reproduce the
    // batch attribution_last_touch oracle exactly. No sentinels needed:
    // nothing awaits a watermark.
    "attribution_stream" -> { (s, dir) =>
      val outPath = Fixtures.cached(s"attribution_stream|$dir") {
        // De-collected (r18): epoch-file feed + parquet sink. No
        // sentinels: attributions are immediate, nothing awaits a
        // watermark.
        val ev = events(s, dir).select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        val qs = ev.agg(
          expr("percentile(unix_micros(ts), 0.3333)").as("q1"),
          expr("percentile(unix_micros(ts), 0.6667)").as("q2")).head()
        val (b1, b2) = (qs.getDouble(0), qs.getDouble(1))
        val out = graft.streaming.StreamingOps.attributionStream(
          graft.streaming.EpochFeed.feed(s, Seq(
            ev.filter(expr(s"unix_micros(ts) <= $b1")),
            ev.filter(expr(s"unix_micros(ts) > $b1 AND unix_micros(ts) <= $b2")),
            ev.filter(expr(s"unix_micros(ts) > $b2")))),
          "user_id", "ts", "event_id", "event_type",
          conversionType = "purchase", touchTypes = Seq("view", "click"))
        graft.streaming.EpochFeed.runToParquet(out)
      }
      s.read.parquet(outPath)
        .orderBy(col("user_id"), col("conversion_ts"), col("event_id"))
    },
    // ---- streaming exactly-once dedup: an at-least-once replay (every
    // event_id % 10 == 0 row of batch 1 arrives AGAIN inside batch 1 and
    // a third time in batch 2) flows through dedupStream — watermarked
    // dropDuplicatesWithinWatermark, O(keys-in-horizon) state — and the
    // sink holds each event exactly once, so the per-type rollup matches
    // the duplicate-free batch oracle. The horizon (365 days) exceeds the
    // replay gap, which is the operator's contract: dedup is exact within
    // the delivery-replay window, state evicts beyond it.
    "dedup_exact_stream" -> { (s, dir) =>
      val outPath = Fixtures.cached(s"dedup_exact_stream|$dir") {
        // De-collected (r18): epoch-file feed + parquet sink; the
        // at-least-once duplicates are unioned into their epoch frames
        // exactly as before. No sentinels: dropDuplicates emits first
        // arrivals immediately.
        val ev = events(s, dir).select(
          col("event_id"), col("ts"), col("event_type"),
          coalesce(floor(col("value") * 1000000.0).cast("long"), lit(0L)).as("vmicro"))
        val qs = ev.agg(
          expr("percentile(unix_micros(ts), 0.3333)").as("q1"),
          expr("percentile(unix_micros(ts), 0.6667)").as("q2")).head()
        val (b1, b2) = (qs.getDouble(0), qs.getDouble(1))
        val dupes = ev.filter(col("event_id") % 10 === 0 &&
          expr(s"unix_micros(ts) <= $b1"))
        val out = graft.streaming.StreamingOps.dedupStream(
          graft.streaming.EpochFeed.feed(s, Seq(
            ev.filter(expr(s"unix_micros(ts) <= $b1")).unionByName(dupes),
            ev.filter(expr(s"unix_micros(ts) > $b1 AND unix_micros(ts) <= $b2"))
              .unionByName(dupes),
            ev.filter(expr(s"unix_micros(ts) > $b2")))),
          "ts", "365 days", col("event_id"))
        graft.streaming.EpochFeed.runToParquet(out)
      }
      s.read.parquet(outPath)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("vmicro")).as("sum_value_micro"))
        .orderBy(col("event_type"))
    },
    // ---- STREAMING rollup maintenance: stream → foreachBatch → merged
    // aggregate table, the streaming twin of the batch Rollup.refresh.
    // Batch 0 is REPLAYED explicitly after the run (the failure-recovery
    // path Structured Streaming actually takes) — the batch-id guard
    // no-ops it, so the table still matches the duplicate-free oracle:
    // exactly-once maintenance, oracle-checked.
    "rollup_stream" -> { (s, dir) =>
      val cached = Fixtures.cached(s"rollup_stream|$dir") {
        // De-collected (r18): epoch-file feed; the replay below was already
        // DataFrame-driven.
        val ev = events(s, dir).select(col("event_type"), col("ts"),
          coalesce(col("value"), lit(0.0)).as("value"))
        val qs = ev.agg(
          expr("percentile(unix_micros(ts), 0.3333)").as("q1"),
          expr("percentile(unix_micros(ts), 0.6667)").as("q2")).head()
        val (b1, b2) = (qs.getDouble(0), qs.getDouble(1))
        val slices = Seq(
          ev.filter(expr(s"unix_micros(ts) <= $b1")),
          ev.filter(expr(s"unix_micros(ts) > $b1 AND unix_micros(ts) <= $b2")),
          ev.filter(expr(s"unix_micros(ts) > $b2")))
        val table = "graft_rollup_stream"
        s.sql(s"DROP TABLE IF EXISTS `$table`")
        val q = graft.streaming.StreamingOps.rollupStream(
          graft.streaming.EpochFeed.feed(s, slices),
          dims = Seq("event_type"), sumCols = Seq("value"), table = table)
          .start()
        try q.processAllAvailable() finally q.stop()
        // failure-recovery replay of batch 0: the guard must no-op it
        graft.streaming.StreamingOps.applyRollupBatch(
          table, Seq("event_type"), Seq("value"))(
          slices.head.drop("ts"), 0L)
        java.lang.Boolean.TRUE
      }
      require(cached.booleanValue())
      graft.streaming.StreamingOps.readStreamRollup(
        s, "graft_rollup_stream", Seq("value"))
        .orderBy(col("event_type"))
    },
    // ---- KMV distinct sketch: daily-active-user cardinality per event
    // type from O(k) state per key — the stat a 100 TB loop maintains
    // incrementally instead of count(distinct)-ing the corpus.
    "kmv_distinct" -> { (s, dir) =>
      val withKey = events(s, dir).select(
        col("event_type"),
        concat(col("user_id").cast("string"), lit(":"),
          date_format(col("ts"), "yyyy-MM-dd")).as("ud"))
      graft.operators.Sketches.kmvStats(
        graft.operators.Sketches.kmvSketch(withKey, Seq("event_type"), "ud", k = 128),
        Seq("event_type"), k = 128)
        .orderBy(col("event_type"))
    },
    // ---- the same estimates via the MERGE path: sketch two disjoint
    // halves, merge, estimate. KMV merge is exact, so this shares
    // kmv_distinct's oracle — the oracle-checked proof that per-slice
    // sketches roll up losslessly.
    "kmv_distinct_merge" -> { (s, dir) =>
      val ev = events(s, dir).select(
        col("event_id"), col("event_type"),
        concat(col("user_id").cast("string"), lit(":"),
          date_format(col("ts"), "yyyy-MM-dd")).as("ud"))
      val a = graft.operators.Sketches.kmvSketch(
        ev.filter(col("event_id") % 2 === 0), Seq("event_type"), "ud", k = 128)
      val b = graft.operators.Sketches.kmvSketch(
        ev.filter(col("event_id") % 2 =!= 0), Seq("event_type"), "ud", k = 128)
      graft.operators.Sketches.kmvStats(
        graft.operators.Sketches.kmvMerge(a, b, Seq("event_type"), k = 128),
        Seq("event_type"), k = 128)
        .orderBy(col("event_type"))
    },
    // ---- the sketch as MAINTAINED STATE: build a managed KMV table from
    // one half, fold the other half in with an O(batch)+O(keys·k) append,
    // read estimates from the table. Shares the from-scratch oracle — the
    // stored sketch must be indistinguishable from one over full history.
    "kmv_distinct_append" -> { (s, dir) =>
      Fixtures.cached(s"kmv_table|$dir") {
        val ev = events(s, dir).select(
          col("event_id"), col("event_type"),
          concat(col("user_id").cast("string"), lit(":"),
            date_format(col("ts"), "yyyy-MM-dd")).as("ud"))
        graft.operators.Sketches.materializeKmvTable(
          ev.filter(col("event_id") % 2 === 0), Seq("event_type"), "ud", 128, "graft_kmv_dau")
        graft.operators.Sketches.appendToKmvTable(
          ev.filter(col("event_id") % 2 =!= 0), Seq("event_type"), "ud", 128, "graft_kmv_dau")
        java.lang.Boolean.TRUE
      }
      graft.operators.Sketches.kmvStats(s.table("graft_kmv_dau"), Seq("event_type"), 128)
        .orderBy(col("event_type"))
    },
    // ---- KMV set similarity BETWEEN keys: per event-type pair, the
    // union's k-min sketch (merge-exact) and the both-sides membership
    // count — Jaccard / overlap estimates from O(k) state per key, the
    // data never re-scanned. Deterministic (the hash IS the sample), so
    // the oracle replicates every number.
    "kmv_jaccard" -> { (s, dir) =>
      val withKey = events(s, dir).select(
        col("event_type"),
        concat(col("user_id").cast("string"), lit(":"),
          date_format(col("ts"), "yyyy-MM-dd")).as("ud"))
      graft.operators.Sketches.kmvJaccard(
        graft.operators.Sketches.kmvSketch(withKey, Seq("event_type"), "ud", k = 128),
        "event_type", k = 128)
        .orderBy(col("key_a"), col("key_b"))
    },
    // ---- HLL pairwise overlap via inclusion-exclusion: the union sketch
    // is the lossless register max, so |A∩B| ≈ est(A)+est(B)−est(A∪B) —
    // the fixed-size sibling of kmv_jaccard ("how much do these segments'
    // user bases overlap" from O(m) state per key).
    "hll_overlap" -> { (s, dir) =>
      graft.operators.Sketches.hllOverlap(
        graft.operators.Sketches.hllSketch(events(s, dir), Seq("event_type"), "user_id"),
        "event_type")
        .orderBy(col("key_a"), col("key_b"))
    },
    // ---- deterministic rank/quantile sketch: a hash-subsample at level
    // L (keep iff h % 2^L == 0 — a pure map-side FILTER, no shuffle of
    // data rows) plus the exact count; quantile φ reads the first sample
    // whose estimated rank i·2^L reaches ⌊φ·n⌋. The quantile tool when no
    // a-priori binWidth exists for hist_quantiles.
    "rank_sketch_quantiles" -> { (s, dir) =>
      graft.operators.Sketches.rankSketchQuantiles(
        graft.operators.Sketches.rankSketch(events(s, dir), "value", "event_id", level = 4),
        Seq(250000L, 500000L, 750000L, 900000L))
        .orderBy(col("phi_micro"))
    },
    // ---- the keyed variant: per-event-type quantiles from the same
    // hash subsample, with the rank window PARTITIONED by key — the
    // no-binWidth sibling of hist_quantiles_by_key.
    "rank_sketch_by_key" -> { (s, dir) =>
      graft.operators.Sketches.rankSketchQuantilesByKey(
        graft.operators.Sketches.rankSketchByKey(
          events(s, dir), "event_type", "value", "event_id", level = 3),
        Seq(500000L, 900000L))
        .orderBy(col("key"), col("phi_micro"))
    },
    // ---- the same estimates via the MERGE path, from sketches built at
    // DIFFERENT levels (3 and 4): the coarser side re-filters to the max
    // level, so the merge is EXACTLY a fresh level-4 sketch over the
    // union — shares rank_sketch_quantiles' from-scratch oracle.
    "rank_sketch_merge" -> { (s, dir) =>
      val ev = events(s, dir)
      val a = graft.operators.Sketches.rankSketch(
        ev.filter(col("event_id") % 2 === 0), "value", "event_id", level = 3)
      val b = graft.operators.Sketches.rankSketch(
        ev.filter(col("event_id") % 2 =!= 0), "value", "event_id", level = 4)
      graft.operators.Sketches.rankSketchQuantiles(
        graft.operators.Sketches.rankSketchMerge(a, b),
        Seq(250000L, 500000L, 750000L, 900000L))
        .orderBy(col("phi_micro"))
    },
    // ---- the sketch as MAINTAINED STATE: one half materializes, the
    // other folds in with a single-insertInto append (batch-id guard in
    // the same commit — the basket-fact discipline), and a retried append
    // of the same batch id is exercised IN-ENTRY as a no-op. Shares the
    // from-scratch oracle.
    "rank_sketch_append" -> { (s, dir) =>
      Fixtures.cached(s"rank_sketch_table|$dir") {
        val ev = events(s, dir)
        graft.operators.Sketches.materializeRankSketchTable(
          ev.filter(col("event_id") % 2 === 0), "value", "event_id", 4, "graft_rank_sketch")
        graft.operators.Sketches.appendToRankSketchTable(
          ev.filter(col("event_id") % 2 =!= 0), "value", "event_id",
          "graft_rank_sketch", batchId = "odd-half")
        graft.operators.Sketches.appendToRankSketchTable(
          ev.filter(col("event_id") % 2 =!= 0), "value", "event_id",
          "graft_rank_sketch", batchId = "odd-half") // retried append: guard no-op
        java.lang.Boolean.TRUE
      }
      graft.operators.Sketches.rankSketchQuantiles(
        s.table("graft_rank_sketch"), Seq(250000L, 500000L, 750000L, 900000L))
        .orderBy(col("phi_micro"))
    },
    // ---- compaction of the maintained sketch: after N appends the table
    // holds N 'n' rows and N guard rows; the fold sums the counts into
    // one row, keeps samples and guards, and swaps — quantiles identical
    // before/after, and a post-compaction replay of an old batch id still
    // no-ops (the guards survive). Shares the from-scratch oracle.
    "rank_sketch_compact" -> { (s, dir) =>
      Fixtures.cached(s"rank_sketch_compact|$dir") {
        val ev = events(s, dir)
        graft.operators.Sketches.materializeRankSketchTable(
          ev.filter(col("event_id") % 3 === 0), "value", "event_id", 4, "graft_rank_cpt")
        graft.operators.Sketches.appendToRankSketchTable(
          ev.filter(col("event_id") % 3 === 1), "value", "event_id",
          "graft_rank_cpt", batchId = "third-1")
        graft.operators.Sketches.appendToRankSketchTable(
          ev.filter(col("event_id") % 3 === 2), "value", "event_id",
          "graft_rank_cpt", batchId = "third-2")
        graft.operators.Sketches.compactRankSketchTable(s, "graft_rank_cpt")
        graft.operators.Sketches.appendToRankSketchTable( // replay post-compact: no-op
          ev.filter(col("event_id") % 3 === 2), "value", "event_id",
          "graft_rank_cpt", batchId = "third-2")
        java.lang.Boolean.TRUE
      }
      graft.operators.Sketches.rankSketchQuantiles(
        s.table("graft_rank_cpt"), Seq(250000L, 500000L, 750000L, 900000L))
        .orderBy(col("phi_micro"))
    },
    // ---- HyperLogLog distinct sketch: distinct parts per return flag
    // from O(m)=4096 registers per key — the fixed-size cardinality
    // sibling of KMV (whose state grows with k). The shuffle is keys·m-
    // bounded regardless of input size. At sf0.01 the linear-counting
    // branch fires; at sf0.1 cardinality crosses m and the raw estimator
    // takes over — the oracle recomputes registers AND estimator.
    "hll_distinct" -> { (s, dir) =>
      graft.operators.Sketches.hllStats(
        graft.operators.Sketches.hllSketch(
          t(s, dir, "lineitem"), Seq("l_returnflag"), "l_partkey"),
        Seq("l_returnflag"))
        .orderBy(col("l_returnflag"))
    },
    // ---- AMS/CMS join-size estimate: |orders ⋈ lineitem| on orderkey
    // from two O(depth·width) sketches — min over depth rows of the
    // counter dot product, always ≥ the true size. The cardinality
    // primitive a planner consults before picking a join strategy,
    // without touching either table at estimation time.
    "cms_join_size" -> { (s, dir) =>
      // lineitem's l_orderkey repeats ~4x at every SF, so its sketch
      // pre-aggregates by key (hash per distinct key — measured 2.4->1.3 s
      // at sf0.1, cells bit-identical); o_orderkey is unique, so the
      // orders side keeps the map-side row-hash path.
      val sk = (tn: String, c: String, pre: Boolean) =>
        graft.operators.Sketches.cmsSketch(
          t(s, dir, tn).select(col(c).cast("string").as("k")), "k",
          depth = 4, width = 1024, preAggregate = pre)
      graft.operators.Sketches.cmsJoinSize(
        sk("orders", "o_orderkey", false), sk("lineitem", "l_orderkey", true))
    },
    // ---- trailing-7-day distinct users per event type: the rolling
    // window nobody can afford exactly at scale — per-day register
    // sketches built once, window = register-max of the ≤7 daily
    // sketches (lossless union), events never rescanned per window.
    "rolling_distinct_hll" -> { (s, dir) =>
      graft.operators.Sketches.rollingDistinctHll(
        events(s, dir).select(col("event_type"), col("ts"),
          col("user_id").cast("string").as("u")),
        "event_type", "ts", "u", windowDays = 7)
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .orderBy(col("event_type"), col("day"))
    },
    // ---- the same estimates via the MERGE path: register-wise max is
    // lossless, so two disjoint halves merged share the from-scratch
    // oracle — per-slice HLLs roll up without rescanning history.
    "hll_distinct_merge" -> { (s, dir) =>
      val ev = events(s, dir).select(
        col("event_id"), col("event_type"),
        concat(col("user_id").cast("string"), lit(":"),
          date_format(col("ts"), "yyyy-MM-dd")).as("ud"))
      val a = graft.operators.Sketches.hllSketch(
        ev.filter(col("event_id") % 2 === 0), Seq("event_type"), "ud")
      val b = graft.operators.Sketches.hllSketch(
        ev.filter(col("event_id") % 2 =!= 0), Seq("event_type"), "ud")
      graft.operators.Sketches.hllStats(
        graft.operators.Sketches.hllMerge(a, b, Seq("event_type")), Seq("event_type"))
        .orderBy(col("event_type"))
    },
    // ---- the sketch as MAINTAINED STATE: managed register table built
    // from one half, the other half folded in with an O(batch)+O(keys·m)
    // append. Shares the from-scratch oracle.
    "hll_distinct_append" -> { (s, dir) =>
      Fixtures.cached(s"hll_table|$dir") {
        val ev = events(s, dir).select(
          col("event_id"), col("event_type"),
          concat(col("user_id").cast("string"), lit(":"),
            date_format(col("ts"), "yyyy-MM-dd")).as("ud"))
        graft.operators.Sketches.materializeHllTable(
          ev.filter(col("event_id") % 2 === 0), Seq("event_type"), "ud", "graft_hll_dau")
        graft.operators.Sketches.appendToHllTable(
          ev.filter(col("event_id") % 2 =!= 0), Seq("event_type"), "ud", "graft_hll_dau")
        java.lang.Boolean.TRUE
      }
      graft.operators.Sketches.hllStats(s.table("graft_hll_dau"), Seq("event_type"))
        .orderBy(col("event_type"))
    },
    // ---- streaming HLL twin: two micro-batch epochs append register
    // GENERATIONS with no guard at all — register max-merge is
    // idempotent, so the replayed epoch's duplicate rows are value-
    // invisible (the Bloom guard-free doctrine); a compaction folds the
    // generations and the stats still share the from-scratch oracle.
    "hll_distinct_stream" -> { (s, dir) =>
      Fixtures.cached(s"hll_stream|$dir") {
        // De-collected (r18): epoch-file feed, replay via the batch body.
        val ev = events(s, dir).select(col("event_type"),
          concat(col("user_id").cast("string"), lit(":"),
            date_format(col("ts"), "yyyy-MM-dd")).as("ud"),
          col("event_id"))
        def half(r: Int) = ev.filter(col("event_id") % 2 === r)
          .select(col("event_type"), col("ud"))
        s.sql("DROP TABLE IF EXISTS graft_hll_stream")
        val q = graft.operators.Sketches.hllDistinctStream(
          graft.streaming.EpochFeed.feed(s, Seq(half(0), half(1))),
          "graft_hll_stream", Seq("event_type"), "ud").start()
        try q.processAllAvailable() finally q.stop()
        // replayed epoch 1 + a fold: both value-invisible to the stats
        graft.operators.Sketches.applyHllBatch(
          "graft_hll_stream", Seq("event_type"), "ud")(
          half(1), 1L)
        graft.operators.Sketches.compactHllTable(s, "graft_hll_stream")
        java.lang.Boolean.TRUE
      }
      graft.operators.Sketches.hllStats(
        graft.operators.Sketches.readHllTable(s, "graft_hll_stream"),
        Seq("event_type"))
        .orderBy(col("event_type"))
    },
    // ---- Bloom membership filter: per-event-type user filter packed
    // into ≤265 62-bit words per key — the SET-MEMBERSHIP member of the
    // mergeable-sketch family (KMV=cardinality, hist=distribution,
    // CMS=frequency, HLL=fixed-size cardinality, rank=quantiles). The
    // only shuffle is the (key, word) groupBy; output is keys·words-
    // bounded regardless of input size.
    "bloom_filter" -> { (s, dir) =>
      graft.operators.Sketches.bloomSketch(events(s, dir), Seq("event_type"), "user_id")
        .orderBy(col("event_type"), col("word"))
    },
    // ---- the same filter via the MERGE path: bitwise-or per word is
    // lossless, so per-slice filters roll up to exactly the from-scratch
    // filter (shared oracle).
    "bloom_merge" -> { (s, dir) =>
      val ev = events(s, dir)
      graft.operators.Sketches.bloomMerge(
        graft.operators.Sketches.bloomSketch(
          ev.filter(col("event_id") % 2 === 0), Seq("event_type"), "user_id"),
        graft.operators.Sketches.bloomSketch(
          ev.filter(col("event_id") % 2 =!= 0), Seq("event_type"), "user_id"),
        Seq("event_type"))
        .orderBy(col("event_type"), col("word"))
    },
    // ---- the filter as MAINTAINED STATE: managed word table built from
    // one half, the other half OR-folded in — and appended AGAIN to
    // exercise that OR-idempotence makes re-ingest a no-op with no batch
    // guard at all. Shares the from-scratch oracle.
    "bloom_append" -> { (s, dir) =>
      Fixtures.cached(s"bloom_table|$dir") {
        val ev = events(s, dir)
        graft.operators.Sketches.materializeBloomTable(
          ev.filter(col("event_id") % 2 === 0), Seq("event_type"), "user_id", "graft_bloom_users")
        graft.operators.Sketches.appendToBloomTable(
          ev.filter(col("event_id") % 2 =!= 0), Seq("event_type"), "user_id", "graft_bloom_users")
        graft.operators.Sketches.appendToBloomTable(
          ev.filter(col("event_id") % 2 =!= 0), Seq("event_type"), "user_id", "graft_bloom_users")
        java.lang.Boolean.TRUE
      }
      s.table("graft_bloom_users").orderBy(col("event_type"), col("word"))
    },
    // ---- membership probe against the filter: 25 present-domain user
    // ids and 25 impossible ones per event type; the probe explodes to k
    // positions, broadcast-joins the keys·words sketch, and bool-ands
    // back — the raw events are never rescanned. No false negatives;
    // false positives at the designed ~0.5% rate, and DETERMINISTIC, so
    // the oracle recomputes the exact same verdict.
    "bloom_probe" -> { (s, dir) =>
      val sketch = graft.operators.Sketches.bloomSketch(
        events(s, dir), Seq("event_type"), "user_id")
      val keys = events(s, dir).filter(col("user_id").isNotNull)
        .select(col("event_type")).distinct()
      val probes = keys.crossJoin(
        s.range(1, 26).select(col("id").cast("string").as("probe_user"))
          .unionByName(s.range(1, 26).select(
            concat(lit("-"), col("id").cast("string")).as("probe_user"))))
      graft.operators.Sketches.bloomProbe(sketch, Seq("event_type"), probes, "probe_user")
        .orderBy(col("event_type"), col("probe_user"))
    },
    // ---- mergeable equi-width histogram + quantile estimates: one
    // map-side-combinable bucket groupBy instead of the total sort behind
    // exact quantiles; window runs over BUCKETS, not rows.
    "hist_quantiles" -> { (s, dir) =>
      graft.operators.Sketches.histQuantiles(
        graft.operators.Sketches.histSketch(events(s, dir), "value", binWidth = 8.0),
        binWidth = 8.0, ps = Seq(0.5, 0.9, 0.99))
        .orderBy(col("p"))
    },
    // ---- grouped percentiles from the keyed histogram sketch: one
    // (key, bucket) groupBy; the cum window partitions by key over
    // bucket-sized frames.
    "hist_quantiles_by_key" -> { (s, dir) =>
      graft.operators.Sketches.histQuantiles(
        graft.operators.Sketches.histSketch(
          events(s, dir), "value", binWidth = 8.0, keyCols = Seq("event_type")),
        binWidth = 8.0, ps = Seq(0.5, 0.9, 0.99), keyCols = Seq("event_type"))
        .orderBy(col("event_type"), col("p"))
    },
    // ---- last-touch attribution: running ignore-nulls carry of the most
    // recent touch — O(1) per-row state, no events self-join.
    "attribution_last_touch" -> { (s, dir) =>
      graft.operators.Analytics.lastTouchAttribution(
        events(s, dir), "user_id", "ts", "event_id", "event_type",
        conversionType = "purchase", touchTypes = Seq("view", "click"))
        .orderBy(col("user_id"), col("conversion_ts"), col("event_id"))
    },
    // ---- weekly cohort LTV curves: first-event week cohorts, per-age
    // active counts + exact-decimal week/cumulative value totals — the
    // (cohort, age) aggregate is dimension-sized and the cumulative
    // window runs over calendar-bounded week series.
    "cohort_ltv" -> { (s, dir) =>
      graft.operators.Analytics.cohortLtv(events(s, dir), "user_id", "ts", "value")
        .orderBy(col("cohort_week"), col("age_weeks"))
    },
    // ---- histogram table maintained across two ticks; quantiles read
    // from the stored counts match the from-scratch oracle.
    "hist_quantiles_append" -> { (s, dir) =>
      Fixtures.cached(s"hist_table|$dir") {
        val ev = events(s, dir)
        graft.operators.Sketches.materializeHistTable(
          ev.filter(col("event_id") % 2 === 0), "value", 8.0, "graft_hist_value")
        graft.operators.Sketches.appendToHistTable(
          ev.filter(col("event_id") % 2 =!= 0), "value", 8.0, "graft_hist_value")
        java.lang.Boolean.TRUE
      }
      graft.operators.Sketches.histQuantiles(
        s.table("graft_hist_value"), binWidth = 8.0, ps = Seq(0.5, 0.9, 0.99))
        .orderBy(col("p"))
    },
    // ---- count-min frequency estimates: token counts recovered from a
    // 4×1024 counter matrix, probed at the exact top-20 terms — estimate
    // ≥ exact always (CMS guarantee), both integers, both oracle-pinned.
    "cms_heavy_hitters" -> { (s, dir) =>
      val toks = t(s, dir, "documents")
        .select(explode(graft.functions.Text.tokens(col("text"))).as("term"))
      val cms = graft.operators.Sketches.cmsSketch(toks, "term", depth = 4, width = 1024)
      val exactTop = toks.groupBy(col("term")).agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("term")).limit(20)
      graft.operators.Sketches.cmsEstimate(cms, exactTop, "term", depth = 4, width = 1024)
        .join(exactTop, Seq("term"))
        .select(col("term"), col("exact_n"), col("cms_est"))
        .orderBy(col("exact_n").desc, col("term"))
    },
    // ---- TF-IDF top-3 keywords per document on the 1e-6 ln grid.
    "tfidf_keywords" -> { (s, dir) =>
      graft.operators.Corpus.tfidfKeywords(t(s, dir, "documents"), "doc_id", "text", topK = 3)
        .orderBy(col("doc_id"), col("rnk"))
    },
    // ---- rolling 7-day active users: exact sliding distinct via the
    // contribution expansion — the only event-sized shuffle is the
    // (user, day) distinct; no sliding-window state anywhere.
    "active_users_rolling" -> { (s, dir) =>
      graft.operators.Analytics.rollingActiveUsers(events(s, dir), "user_id", "ts", windowDays = 7)
        .orderBy(col("day"))
    },
    // ---- DAU/MAU stickiness: the 28-day rolling actives with the ratio
    // on the micro grid.
    "stickiness_daily" -> { (s, dir) =>
      graft.operators.Analytics.rollingActiveUsers(events(s, dir), "user_id", "ts", windowDays = 28)
        .withColumn("stickiness_micro", expr("(dau * 1000000L) DIV rolling_active"))
        .orderBy(col("day"))
    },
    // ---- grid-bucketed radius self-join over hash-derived planar
    // coordinates: 9-cell candidate neighborhoods, exact BIGINT distance.
    "geo_radius_join" -> { (s, dir) =>
      val pts = t(s, dir, "customer").select(
        col("c_custkey").as("id"),
        (graft.functions.Text.portableHash31(
          concat(lit("gx:"), col("c_custkey").cast("string"))) % 1000000L).as("x"),
        (graft.functions.Text.portableHash31(
          concat(lit("gy:"), col("c_custkey").cast("string"))) % 1000000L).as("y"))
      graft.operators.Geo.radiusJoin(pts, "id", "x", "y", radius = 20000L)
        .orderBy(col("id1"), col("id2"))
    },
    // ---- hybrid retrieval: BM25 top-50 + brute cosine top-50 fused by
    // reciprocal rank — rank-only combination, exact integer RRF scores.
    "hybrid_search_rrf" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val lex = graft.operators.Corpus
        .bm25Search(t(s, dir, "documents"), "doc_id", "text",
          terms = Seq("customer", "spark", "merge"), topK = 50)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score_micro").desc, col("id"))).cast("long"))
        .select(col("id"), col("rank"))
      val emb = t(s, dir, "embeddings")
      val sem = graft.operators.Similarity
        .bruteForceTopK(
          emb.filter(col("vec_id") === 0).select(col("vec_id").as("qid"), col("embedding").as("qvec")),
          emb.select(col("vec_id").as("cid"), col("embedding").as("cvec")),
          "qid", "qvec", "cid", "cvec", k = 50)
        .select(col("cid").as("id"), col("rnk").cast("long").as("rank"))
      graft.operators.Similarity
        .rrfFuse(Seq(lex, sem), "id", "rank", k = 60, topK = 20)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("rrf_micro").desc, col("doc_id"))
    },
    // ---- degree-oriented triangle counting over the customer proximity
    // graph: every triangle found exactly once, wedge work bounded by
    // out-degree² (hub-skew-proof), exact micro clustering coefficients.
    "graph_triangles" -> { (s, dir) =>
      val pts = t(s, dir, "customer").select(
        col("c_custkey").as("id"),
        (graft.functions.Text.portableHash31(
          concat(lit("gx:"), col("c_custkey").cast("string"))) % 1000000L).as("x"),
        (graft.functions.Text.portableHash31(
          concat(lit("gy:"), col("c_custkey").cast("string"))) % 1000000L).as("y"))
      val edges = graft.operators.Geo.radiusJoin(pts, "id", "x", "y", radius = 20000L)
      graft.operators.Graph.triangleCounts(edges, "id1", "id2")
        .orderBy(col("triangles").desc, col("node"))
        .limit(100)
    },
    // ---- k-core decomposition over the same proximity graph: iterative
    // degree peel to fixpoint (driver loop moves only counts); the oracle
    // unrolls more peel rounds than the fixture needs — past the fixpoint
    // they are no-ops, so fixpoint ≡ unrolled.
    "graph_kcore" -> { (s, dir) =>
      val pts = t(s, dir, "customer").select(
        col("c_custkey").as("id"),
        (graft.functions.Text.portableHash31(
          concat(lit("gx:"), col("c_custkey").cast("string"))) % 1000000L).as("x"),
        (graft.functions.Text.portableHash31(
          concat(lit("gy:"), col("c_custkey").cast("string"))) % 1000000L).as("y"))
      val edges = graft.operators.Geo.radiusJoin(pts, "id", "x", "y", radius = 20000L)
      graft.operators.Graph.kCore(edges, "id1", "id2", k = 3)
        .orderBy(col("node"))
    },
    // ---- connected components over a sparse proximity graph (every 10th
    // customer, so components stay small at EVERY SF and the oracle's
    // transitive closure stays bounded): min-label propagation to
    // fixpoint, one shuffle per round, O(diameter) rounds.
    "graph_components" -> { (s, dir) =>
      val pts = t(s, dir, "customer")
        .filter(col("c_custkey") % 10 === 0)
        .select(
          col("c_custkey").as("id"),
          (graft.functions.Text.portableHash31(
            concat(lit("gx:"), col("c_custkey").cast("string"))) % 1000000L).as("x"),
          (graft.functions.Text.portableHash31(
            concat(lit("gy:"), col("c_custkey").cast("string"))) % 1000000L).as("y"))
      val edges = graft.operators.Geo.radiusJoin(pts, "id", "x", "y", radius = 20000L)
        .select(col("id1").as("id_a"), col("id2").as("id_b"))
      graft.operators.Dedup.connectedComponents(edges).orderBy(col("id"))
    },
    // ---- synchronous label propagation communities over the same
    // proximity graph, 2 rounds (fixed-round synchronous = the
    // deterministic spelling; async LPA is visit-order-dependent). Per
    // round: one edges⨝labels join + an argmax-per-node AGGREGATE
    // (max(struct(cnt, −label))), never a window.
    "graph_label_prop" -> { (s, dir) =>
      val pts = t(s, dir, "customer")
        .filter(col("c_custkey") % 10 === 0)
        .select(
          col("c_custkey").as("id"),
          (graft.functions.Text.portableHash31(
            concat(lit("gx:"), col("c_custkey").cast("string"))) % 1000000L).as("x"),
          (graft.functions.Text.portableHash31(
            concat(lit("gy:"), col("c_custkey").cast("string"))) % 1000000L).as("y"))
      val edges = graft.operators.Geo.radiusJoin(pts, "id", "x", "y", radius = 20000L)
        .select(col("id1").as("id_a"), col("id2").as("id_b"))
      graft.operators.Graph.labelPropagation(edges, "id_a", "id_b", rounds = 2)
        .orderBy(col("id"))
    },
    // ---- hop-bounded weighted shortest paths over the proximity graph:
    // min total squared-distance cost from the %100 seeds using ≤3 edges
    // (the same semantic hop cap as graph_bfs, so cycles need no
    // convergence argument). Frontier Bellman–Ford: only nodes improved
    // last round re-relax.
    "graph_shortest_paths" -> { (s, dir) =>
      val pts = t(s, dir, "customer")
        .filter(col("c_custkey") % 10 === 0)
        .select(
          col("c_custkey").as("id"),
          (graft.functions.Text.portableHash31(
            concat(lit("gx:"), col("c_custkey").cast("string"))) % 1000000L).as("x"),
          (graft.functions.Text.portableHash31(
            concat(lit("gy:"), col("c_custkey").cast("string"))) % 1000000L).as("y"))
      val edges = graft.operators.Geo.radiusJoin(pts, "id", "x", "y", radius = 20000L)
      graft.operators.Graph.shortestPaths(
        edges, "id1", "id2", "dist2",
        pts.filter(col("id") % 100 === 0).select(col("id")), "id", maxHops = 3)
        .orderBy(col("node"))
    },
    // ---- multi-source BFS over the same sparse proximity graph: hop
    // distance from the %100 seed customers, capped at 6 hops (a SEMANTIC
    // bound — the frontier loop early-exits when a layer is empty, so the
    // oracle's exactly-6 unrolled expansion matches by construction).
    "graph_bfs" -> { (s, dir) =>
      val pts = t(s, dir, "customer")
        .filter(col("c_custkey") % 10 === 0)
        .select(
          col("c_custkey").as("id"),
          (graft.functions.Text.portableHash31(
            concat(lit("gx:"), col("c_custkey").cast("string"))) % 1000000L).as("x"),
          (graft.functions.Text.portableHash31(
            concat(lit("gy:"), col("c_custkey").cast("string"))) % 1000000L).as("y"))
      val edges = graft.operators.Geo.radiusJoin(pts, "id", "x", "y", radius = 20000L)
      graft.operators.Graph.bfsDistances(
        edges, "id1", "id2",
        pts.filter(col("id") % 100 === 0), "id", maxHops = 6)
        .orderBy(col("node"))
    },
    // ---- nearest neighbor within radius over the same proximity graph:
    // cell-bounded candidates, one min(struct) argmin per point —
    // no per-point sort, no points² scan.
    "geo_nearest" -> { (s, dir) =>
      val pts = t(s, dir, "customer").select(
        col("c_custkey").as("id"),
        (graft.functions.Text.portableHash31(
          concat(lit("gx:"), col("c_custkey").cast("string"))) % 1000000L).as("x"),
        (graft.functions.Text.portableHash31(
          concat(lit("gy:"), col("c_custkey").cast("string"))) % 1000000L).as("y"))
      graft.operators.Geo.nearestNeighbor(pts, "id", "x", "y", radius = 20000L)
        .orderBy(col("id"))
    },
    // ---- rank normalization: within-type percentile + exact equi-depth
    // quartile per event — one slim (type, id, value) shuffle, pure
    // integer rank arithmetic.
    "rank_normalize" -> { (s, dir) =>
      graft.operators.Analytics.rankNormalize(
        events(s, dir), "event_type", "value", "event_id", nBuckets = 4)
        .orderBy(col("event_type"), col("event_id"))
    },
    // ---- PMI collocation pairs over vocab-restricted doc presence: the
    // self-join volume is capped by the vocabulary, never corpus².
    "pmi_pairs" -> { (s, dir) =>
      graft.operators.Corpus.pmiCooccurrence(
        t(s, dir, "documents"), "doc_id", "text", vocab = 100, minCount = 5L, topK = 50)
        .orderBy(col("pmi_micro").desc, col("t1"), col("t2"))
    },
    // ---- per-type volume trend: OLS slope of daily micro totals.
    "trend_slopes" -> { (s, dir) =>
      graft.operators.Analytics.trendSlopes(events(s, dir), "event_type", "ts", "value")
        .orderBy(col("event_type"))
    },
    // ---- A/B z-test: hash-split variants, purchase conversion, pooled
    // SE on the micro grid.
    "ab_test_events" -> { (s, dir) =>
      // conversion = any BIG purchase (value > 480): rare enough that both
      // variants have non-degenerate rates at every SF (everyone makes
      // SOME purchase, which would zero the pooled SE)
      val perUser = events(s, dir).groupBy(col("user_id")).agg(
        max(when(col("event_type") === "purchase" && col("value") > 480.0, 1L)
          .otherwise(0L)).as("converted"))
        .withColumn("variant",
          when(col("user_id") % 2 === 0, lit("a")).otherwise(lit("b")))
      graft.operators.Analytics.abTestZ(perUser, "variant", "converted", "a", "b")
    },
    // ---- two-sample KS distribution test: pure integer arithmetic.
    "ks_test_events" -> { (s, dir) =>
      graft.operators.Analytics.ksTest(
        events(s, dir), "value", "event_type", groupA = "view", groupB = "purchase")
    },
    // ---- chi-square independence gate: event mix vs day of week.
    "chi_square_events" -> { (s, dir) =>
      graft.operators.Analytics.chiSquareIndependence(
        events(s, dir).withColumn("dow", dayofweek(col("ts"))), "event_type", "dow")
    },
    // ---- Markov next-state probabilities on the micro grid.
    "markov_transitions" -> { (s, dir) =>
      graft.operators.Graph.transitionProbabilities(
        graft.operators.Graph.transitionEdges(
          events(s, dir), "user_id", "event_type", "ts", "event_id"),
        "src", "dst", "w")
        .orderBy(col("src"), col("dst"))
    },
    // ---- half-life-decayed popularity: exact integer decay weights.
    "popularity_decay" -> { (s, dir) =>
      graft.operators.Analytics.decayedPopularity(
        events(s, dir), "event_type", "ts", halfLifeDays = 30)
        .orderBy(col("event_type"))
    },
    // ---- weighted PageRank over the event-type transition graph: the
    // event-sized work is one window + pair count; three exact integer
    // nano-rank iterations then run over the edge list alone.
    "pagerank_transitions" -> { (s, dir) =>
      val edges = graft.operators.Graph.transitionEdges(
        events(s, dir), "user_id", "event_type", "ts", "event_id")
      graft.operators.Graph.pageRank(edges, "src", "dst", "w", iterations = 3)
        .orderBy(col("node"))
    },
    // ---- HITS hubs & authorities over the same transition graph, 2
    // synchronous rounds on the 1e-6 grid with the overflow-safe
    // pre-divided L1 normalization — "which states feed journeys (hubs)
    // vs terminate them (authorities)".
    "graph_hits" -> { (s, dir) =>
      val edges = graft.operators.Graph.transitionEdges(
        events(s, dir), "user_id", "event_type", "ts", "event_id")
      graft.operators.Graph.hits(edges, "src", "dst", "w", rounds = 2)
        .orderBy(col("node"))
    },
    // ---- personalized PageRank from the 'view' vantage point: teleport
    // mass pinned to the seed, same integer nano recurrence — "what does
    // a journey that starts at view end up near".
    "graph_ppr" -> { (s, dir) =>
      import s.implicits._
      val edges = graft.operators.Graph.transitionEdges(
        events(s, dir), "user_id", "event_type", "ts", "event_id")
      graft.operators.Graph.personalizedPageRank(
        edges, "src", "dst", "w",
        Seq("view").toDF("seed"), "seed", iterations = 3)
        .orderBy(col("node"))
    },

    "q_events_daily" -> { (s, dir) =>
      // Group on the truncated TIMESTAMP and render the day string after the
      // aggregation: formatting happens once per result row (150), not once
      // per input row (10M at sf10), and the hash-agg key is an 8-byte long
      // instead of a string.
      events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("total")
        )
        .select(
          date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("n"), col("total"))
        .orderBy(col("day"), col("event_type"))
    },
    "q_events_json" -> { (s, dir) =>
      events(s, dir)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("k_sum"), count(col("k")).as("k_cnt"))
        .orderBy(col("event_type"))
    },

    // ---- ODF ledger operators (SURVEY §2.2/§2.3)
    "cdc_project" -> { (s, dir) =>
      Changelog.project(eventsLedger(s, dir), Seq("user_id")).orderBy(col("offset"))
    },
    "tail" -> { (s, dir) =>
      Changelog.tail(eventsLedger(s, dir), 100)
    },
    // ---- SCD type-2 build from a three-tick changelog (initial load,
    // a correction wave over the %3 keys, a retraction wave over the %7
    // keys): one lead() window per key turns the ledger into validity
    // intervals; retractions close intervals without emitting rows and
    // -C halves are skipped.
    "scd2_build" -> { (s, dir) =>
      Changelog.scd2(scd2Ledger(s, dir), Seq("c_custkey"))
        .orderBy(col("c_custkey"), col("valid_from"))
    },
    // ---- INCREMENTAL SCD2 maintenance: the three-tick ledger ingested
    // batch-by-batch into the single-commit fact table — tick 2 replayed
    // to exercise the __gen guard (crash-after-commit regime) — then the
    // generation fold read back. Each tick touches only its keys' open
    // versions (close + reopen) in ONE insertInto; shares the
    // from-scratch scd2_build oracle.
    "scd2_append" -> { (s, dir) =>
      Fixtures.cached(s"scd2_append|$dir") {
        val led = scd2Ledger(s, dir)
        def tick(d: String) =
          led.filter(col("event_time") === to_timestamp(lit(s"$d 00:00:00")))
        Changelog.materializeScd2(
          tick("2024-01-01"), Seq("c_custkey"), "graft_scd2_cust", batchId = 0L)
        Changelog.appendToScd2(
          tick("2024-02-01"), Seq("c_custkey"), "graft_scd2_cust", batchId = 1L)
        Changelog.appendToScd2( // replayed tick: guard no-op
          tick("2024-02-01"), Seq("c_custkey"), "graft_scd2_cust", batchId = 1L)
        Changelog.appendToScd2(
          tick("2024-03-01"), Seq("c_custkey"), "graft_scd2_cust", batchId = 2L)
        java.lang.Boolean.TRUE
      }
      Changelog.readScd2Table(s, "graft_scd2_cust", Seq("c_custkey"))
        .orderBy(col("c_custkey"), col("valid_from"))
    },
    // ---- STREAMING SCD2 twin: the same three-tick changelog replayed as
    // micro-batches through O(1)-per-key version state — closed intervals
    // emit the moment their successor arrives; the current versions flush
    // via event-time timeout (two far-future sentinels). Shares the batch
    // scd2_build oracle.
    "scd2_stream" -> { (s, dir) =>
      val outPath = Fixtures.cached(s"scd2_stream|$dir") {
        // De-collected (r18): the three ledger ticks + two 1-row sentinels
        // feed as one parquet file per micro-batch; output lands in a
        // parquet sink.
        import s.implicits._
        val led = scd2Ledger(s, dir)
        def tick(d: String) = led.filter(
          col("event_time") === to_timestamp(lit(s"$d 00:00:00")))
        // sentinels: first advances the watermark past every open
        // version's horizon; the second's batch fires the timeouts
        def sentinel(i: Int, d: String) =
          Seq((-1L - i, 0.0, -1L - i, Op.Append,
            java.sql.Timestamp.valueOf(s"$d 00:00:00")))
            .toDF("c_custkey", "c_acctbal", "offset", "op", "event_time")
        val out = graft.streaming.StreamingOps.scd2Stream(
          graft.streaming.EpochFeed.feed(s, Seq(
            tick("2024-01-01"), tick("2024-02-01"), tick("2024-03-01"),
            sentinel(0, "2024-08-01"), sentinel(1, "2024-11-01"))),
          "c_custkey", "c_acctbal", "offset", "op", "event_time",
          // the horizon must exceed the ledger's longest change gap (the
          // 01-01 → 03-01 retract wave = 60 days), or a version flushes
          // as current before its own retraction arrives — the documented
          // replay-window contract
          horizonMinutes = 90L * 24 * 60)
        graft.streaming.EpochFeed.runToParquet(out)
      }
      s.read.parquet(outPath).filter(col("c_custkey") >= 0L)
        .orderBy(col("c_custkey"), col("valid_from"))
    },
    // ---- point-in-time probe against the SCD2 dimension: three probe
    // dates per %5 customer pick up the version valid AT each date — a
    // key-equi hash join with the interval residual; probes after a
    // retraction resolve to null (left join), matching the warehouse
    // "as the dimension stood then" contract.
    "scd2_pit" -> { (s, dir) =>
      val dim = Changelog.scd2(scd2Ledger(s, dir), Seq("c_custkey"))
      val probes = t(s, dir, "customer")
        .filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey"),
          explode(array(
            to_timestamp(lit("2024-01-15 00:00:00")),
            to_timestamp(lit("2024-02-15 00:00:00")),
            to_timestamp(lit("2024-03-15 00:00:00")))).as("probe_ts"))
      Changelog.pointInTimeJoin(probes, dim, Seq("c_custkey"), "probe_ts")
        .select(col("c_custkey"), col("probe_ts"), col("c_acctbal"), col("valid_from"))
        .orderBy(col("c_custkey"), col("probe_ts"))
    },
    "merge_ledger" -> { (s, dir) =>
      val orders = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val prev = orders.filter(col("o_orderkey") % 3 =!= 0)
      val incoming = orders.filter(col("o_orderkey") % 2 === 0)
      MergeStrategy
        .Ledger(Seq("o_orderkey"))
        .merge(Some(prev), incoming)
        .orderBy(col("o_orderkey"))
    },
    "merge_snapshot" -> { (s, dir) =>
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val prevLedger = cust
        .filter(col("c_custkey") % 5 =!= 0)
        .withColumn("offset", col("c_custkey"))
        .withColumn("op", lit(Op.Append))
      val snapshot = cust
        .filter(col("c_custkey") % 7 =!= 0)
        .withColumn(
          "c_acctbal",
          when(col("c_custkey") % 3 === 0, col("c_acctbal") * 2).otherwise(col("c_acctbal"))
        )
      MergeStrategy
        .Snapshot(Seq("c_custkey"))
        .merge(Some(prevLedger), snapshot)
        .orderBy(col("c_custkey"), col("op"))
    },
    "offsets_assign" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      Writer.assignOffsets(li, Seq(col("l_orderkey").asc, col("l_linenumber").asc))
    },

    // ---- incrementally-maintained equi-join view (insert-only IVM,
    // Blakeley et al. 1986): the denormalized orders⋈lineitem fact a
    // pipeline keeps instead of re-joining per query. Three insert
    // generations split on DIFFERENT residues per side (so both
    // ΔA⋈B and A⋈ΔB cross terms fire), one batch-stamped commit per
    // tick, tick 2 replayed — must equal the from-scratch join.
    "join_view_append" -> { (s, dir) =>
      import graft.operators.JoinView
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"),
          col("o_totalprice"))
      def ap(r: Int) = li.filter(col("l_partkey") % 3 === r)
      def bp(r: Int) = ord.filter(col("l_orderkey") % 3 === r)
      Fixtures.cached(s"join_view|$dir") {
        JoinView.materializeJoinView(ap(0), bp(0), Seq("l_orderkey"),
          "graft_join_view")
        JoinView.appendToJoinView("graft_join_view", ap(0), bp(0),
          ap(1), bp(1), Seq("l_orderkey"), "t1")
        val a01 = ap(0).unionByName(ap(1))
        val b01 = bp(0).unionByName(bp(1))
        JoinView.appendToJoinView("graft_join_view", a01, b01,
          ap(2), bp(2), Seq("l_orderkey"), "t2")
        JoinView.appendToJoinView("graft_join_view", a01, b01, // replay: no-op
          ap(2), bp(2), Seq("l_orderkey"), "t2")
        java.lang.Boolean.TRUE
      }
      JoinView.readJoinView(s, "graft_join_view")
        .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("o_custkey"))
    },

    // ---- incremental materialized rollup over a snapshot-CDC dataset:
    // two ingest ticks (tick 2 adds the %3==0 keys AND rewrites the
    // priority of %7==0 keys, so the changelog carries +A, -C and +C);
    // the rollup advances from the file-pruned NEW slices only, with
    // op-weighted exact-decimal partials — and must equal a fresh GROUP BY
    // over the FINAL STATE, which is what the oracle recomputes.
    "rollup_incremental" -> { (s, dir) =>
      import graft.operators.Rollup
      Fixtures.cached(s"rollup_incremental|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-rollup-")
        val ds = Dataset.create(s, work.resolve("orders"), "orders_cdc")
        val base = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        def tick(batch: DataFrame, iso: String): Unit =
          IngestWriter.writeBatch(ds, batch, MergeStrategy.Snapshot(Seq("o_orderkey")),
            java.time.Instant.parse(iso).toEpochMilli)
        tick(base.filter(col("o_orderkey") % 3 =!= 0), "2024-01-01T00:00:00Z")
        Rollup.refresh(Dataset.open(s, work.resolve("orders")), "graft_rollup",
          dims = Seq("o_orderpriority"), sumCols = Seq("o_totalprice"))
        tick(
          base.withColumn("o_orderpriority",
            when(col("o_orderkey") % 7 === 0, lit("X-URGENT")).otherwise(col("o_orderpriority"))),
          "2024-01-02T00:00:00Z")
        Rollup.refresh(Dataset.open(s, work.resolve("orders")), "graft_rollup",
          dims = Seq("o_orderpriority"), sumCols = Seq("o_totalprice"))
        work
      }
      Rollup.read(s, "graft_rollup", Seq("o_totalprice"))
        .orderBy(col("o_orderpriority"))
    },
    // ---- the rollup's OTHER dashboard column: per-cell distinct users
    // via HLL registers maintained INSIDE the same table (bucket/r rows
    // ride through the same atomic offset swap — no second table, no torn
    // pair). Register max-merge is idempotent AND lossless, so after
    // three ledger ticks / three refresh generations the estimates must
    // hash-match a fresh per-cell recomputation, which is what the
    // oracle does alongside the count/sum GROUP BY.
    "rollup_distinct_incremental" -> { (s, dir) =>
      import graft.operators.Rollup
      Fixtures.cached(s"rollup_distinct|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-rolluphll-")
        val ds = Dataset.create(s, work.resolve("events"), "events_ledger")
        val base = events(s, dir)
          .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
        def tick(batch: DataFrame, iso: String): Unit =
          IngestWriter.writeBatch(ds, batch, MergeStrategy.Ledger(Seq("event_id")),
            java.time.Instant.parse(iso).toEpochMilli)
        def refresh(): Unit =
          Rollup.refresh(Dataset.open(s, work.resolve("events")), "graft_rollup_hll",
            dims = Seq("event_type"), sumCols = Seq("value"),
            distinctCol = Some("user_id"))
        tick(base.filter(col("event_id") % 3 === 0), "2024-01-01T00:00:00Z")
        refresh()
        tick(base.filter(col("event_id") % 3 === 1), "2024-01-02T00:00:00Z")
        refresh()
        tick(base.filter(col("event_id") % 3 === 2), "2024-01-03T00:00:00Z")
        refresh()
        work
      }
      Rollup.read(s, "graft_rollup_hll", Seq("value"))
        .join(Rollup.readDistinct(s, "graft_rollup_hll", Seq("event_type")),
          Seq("event_type"))
        .orderBy(col("event_type"))
    },

    // ---- LLM-pipeline operators (BASELINE.json north star)
    "dedup_exact" -> { (s, dir) =>
      Dedup
        .exact(t(s, dir, "documents"), "doc_id", "text")
        .select(col("canonical_id"), col("dup_count"))
        .orderBy(col("canonical_id"))
    },
    // ---- EXACT-threshold all-pairs similarity join (prefix filtering):
    // every word-set Jaccard ≥ 0.7 pair — complete by the prefix theorem,
    // verified by exact intersection; the no-miss complement to the
    // probabilistic LSH screens. Restricted to the %5 corpus so the
    // oracle's brute-force all-pairs stays bounded at every SF.
    "dedup_allpairs_exact" -> { (s, dir) =>
      Dedup.allPairsJaccard(
        t(s, dir, "documents").filter(col("doc_id") % 5 === 0),
        "doc_id", "text", minSimMicro = 700000L)
        .orderBy(col("id_a"), col("id_b"))
    },
    // ---- EXACT edit-distance threshold self-join (PassJoin pigeonhole):
    // every customer-name pair within 2 edits, candidates from chunk
    // equi-joins against a bounded ±τ substring grid (never a length-
    // quadratic scan), verified with exact levenshtein. The brute-force
    // O(n²) join lives in the ORACLE, where brute force belongs.
    "dedup_ed_join" -> { (s, dir) =>
      Dedup.edThresholdJoin(
        t(s, dir, "customer").filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name", tau = 2)
        .withColumnRenamed("id_a", "cust_a").withColumnRenamed("id_b", "cust_b")
        .orderBy(col("cust_a"), col("cust_b"))
    },
    // ---- sorted-neighborhood (merge/purge) dedup: sort by normalized
    // text, verify in-window pairs with exact Levenshtein — the EDIT-
    // similarity complement to the MinHash token-set family; candidates
    // are rows·(w−1), never all-pairs.
    "dedup_sorted_neighborhood" -> { (s, dir) =>
      Dedup.sortedNeighborhood(t(s, dir, "documents"), "doc_id", "text",
        windowSize = 4, maxDist = 60)
        .orderBy(col("id_a"), col("id_b"))
    },
    "text_stats" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          Text.tokenCount(col("text")).cast("bigint").as("n_tokens"),
          length(col("text")).cast("bigint").as("n_len")
        )
        .orderBy(col("doc_id"))
    },
    "ann_bruteforce" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity
        .bruteForceTopK(q, c, "qid", "qvec", "cid", "cvec", 5)
        .select(col("qid"), col("rnk").cast("bigint").as("rnk"), col("cid"))
        .orderBy(col("qid"), col("rnk"))
    },
    // Hash-checked via the portable md5-derived hash family (see Text.scala):
    // the DuckDB oracle replicates the full shingle→signature→band pipeline.
    // est_jaccard = k/64.0 is exact in IEEE double on both engines.
    "dedup_minhash" -> { (s, dir) =>
      Dedup
        .minHashLsh(t(s, dir, "documents"), "doc_id", "text", minSim = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },
    // ---- incremental near-dup: 4/5 of the corpus is banded ONCE into a
    // bucketed LSH index (corpus-side cap applies there), then the held-out
    // 1/5 probes it as a "new batch" — no corpus re-hash, no corpus
    // shuffle. The oracle recomputes the same split with the portable md5
    // signature pipeline.
    "dedup_minhash_incremental" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      Dedup.materializeMinhashIndex(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
        table = "graft_minhash_idx", numBuckets = 8)
      Dedup
        .minHashLshAgainstIndex(
          docs.filter(col("doc_id") % 5 === 0), "doc_id", "text",
          table = "graft_minhash_idx", minSim = 0.5)
        .orderBy(col("id_new"), col("id_corpus"))
    },
    // ---- cross-corpus NEAR-dedup: drop training docs near-duplicating
    // any benchmark doc (MinHash est. Jaccard >= 0.5) — the near-dup tier
    // of decontamination; a paraphrase slips the exact-n-gram check but
    // not this one. Split on doc_id % 7: refs are the %7==0 slice.
    "dedup_against" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      Dedup.dedupAgainst(
        docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", minSim = 0.5)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },

    // ---- index MAINTENANCE: probe → append → re-probe. Generation 0
    // probes an index of doc_id%5∈{1,2,3}; the %5=4 batch is then APPENDED
    // in place (insertInto through the bucket spec — no rebuild, O(batch)
    // bytes moved) and generation 1 re-probes. The oracle recomputes both
    // generations, replicating the append's capacity-fill cap semantics.
    "dedup_minhash_append" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      Dedup.materializeMinhashIndex(
        docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 4), "doc_id", "text",
        table = "graft_minhash_apx", numBuckets = 8)
      val probe = docs.filter(col("doc_id") % 5 === 0)
      val gen0 = Dedup
        .minHashLshAgainstIndex(probe, "doc_id", "text",
          table = "graft_minhash_apx", minSim = 0.5)
        .withColumn("gen", lit(0L))
      Dedup.appendToMinhashIndex(
        docs.filter(col("doc_id") % 5 === 4), "doc_id", "text",
        table = "graft_minhash_apx")
      val gen1 = Dedup
        .minHashLshAgainstIndex(probe, "doc_id", "text",
          table = "graft_minhash_apx", minSim = 0.5)
        .withColumn("gen", lit(1L))
      gen0.unionByName(gen1).orderBy(col("gen"), col("id_new"), col("id_corpus"))
    },
    // maxHamming=3 → 4 pigeonhole chunks of 16 bits: a 65k-value chunk-key
    // space. (maxHamming=8 would mean 7-bit chunks = 128 distinct keys —
    // on a clustered corpus the bucket self-join degenerates quadratically.)
    "dedup_simhash" -> { (s, dir) =>
      Dedup
        .simHashDups(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- remaining merge strategies (SURVEY §2.2)
    "merge_append" -> { (s, dir) =>
      val inc = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .filter(col("o_orderkey") % 10 === 0)
      MergeStrategy.Append().merge(None, inc).orderBy(col("o_orderkey"))
    },
    "merge_changelog_stream" -> { (s, dir) =>
      MergeStrategy
        .ChangelogStream(Seq("user_id"))
        .merge(None, eventsLedger(s, dir))
        .orderBy(col("offset"))
    },
    "merge_upsert" -> { (s, dir) =>
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val prevLedger = cust
        .filter(col("c_custkey") % 4 =!= 0)
        .withColumn("offset", col("c_custkey"))
        .withColumn("op", lit(Op.Append))
      val incoming = cust
        .filter(col("c_custkey") % 3 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100)
        .withColumn(
          "op",
          when(col("c_custkey") % 9 === 0, lit(Op.Retract)).otherwise(lit(Op.Append))
        )
      MergeStrategy
        .UpsertStream(Seq("c_custkey"), arrivalOrderColumn = Some("c_custkey"))
        .merge(Some(prevLedger), incoming)
        .orderBy(col("c_custkey"), col("op"))
    },
    // ---- STREAMING UpsertStream ingestion twin: the same base/incoming
    // pair replayed as micro-batches through foreachBatch into a
    // maintained offset-stamped changelog ledger, epoch 1 replayed to
    // exercise the batch-id guard (exactly-once replay collapse). The
    // epoch-1 delta rows equal the batch merge's output, so the entry
    // shares merge_upsert's from-scratch CDC oracle.
    "merge_upsert_stream" -> { (s, dir) =>
      Fixtures.cached(s"merge_upsert_stream|$dir") {
        // De-collected (r18): epoch-file feed; the replay below was already
        // DataFrame-driven.
        val cust = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val base = cust.filter(col("c_custkey") % 4 =!= 0)
          .withColumn("op", lit(Op.Append))
        val incoming = cust.filter(col("c_custkey") % 3 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 100)
          .withColumn("op",
            when(col("c_custkey") % 9 === 0, lit(Op.Retract)).otherwise(lit(Op.Append)))
        val table = "graft_upsert_ledger"
        s.sql(s"DROP TABLE IF EXISTS `$table`")
        val q = graft.streaming.StreamingOps.upsertStream(
          graft.streaming.EpochFeed.feed(s, Seq(base, incoming)),
          primaryKey = Seq("c_custkey"), arrivalOrderColumn = "c_custkey",
          table = table).start()
        try q.processAllAvailable() finally q.stop()
        // failure-recovery replay of epoch 1: the guard must no-op it
        graft.streaming.StreamingOps.applyUpsertBatch(
          table, Seq("c_custkey"), "c_custkey")(incoming, 1L)
        java.lang.Boolean.TRUE
      }
      s.table("graft_upsert_ledger").filter(col("__batch") === 1L)
        .select(col("op"), col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"), col("op"))
    },
    // ---- streaming join-view twin: a tagged union stream of both
    // sources' inserts maintains (view, a, b) tables via foreachBatch —
    // per-tick insert-only IVM delta against the PRE-batch states
    // (__batch < id filters), three independently-guarded appends, epoch
    // 1 replayed through the raw tick. Must equal the from-scratch join.
    "join_view_stream" -> { (s, dir) =>
      Fixtures.cached(s"join_view_stream|$dir") {
        // De-collected (r18): the tagged-union epochs are built as frames
        // (null-padded to the union layout) and fed as one parquet file
        // each; the replay tick reuses epoch 1's frame.
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
            col("l_extendedprice"))
        val ord = t(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"),
            col("o_totalprice"))
        def aSlice(r: Int) = li.filter(col("l_partkey") % 3 === r)
          .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
            col("l_extendedprice"),
            lit(null).cast("bigint").as("o_custkey"),
            lit(null).cast("double").as("o_totalprice"),
            lit("a").as("__side"))
        def bSlice(r: Int) = ord.filter(col("l_orderkey") % 3 === r)
          .select(col("l_orderkey"),
            lit(null).cast("bigint").as("l_partkey"),
            lit(null).cast("double").as("l_quantity"),
            lit(null).cast("double").as("l_extendedprice"),
            col("o_custkey"), col("o_totalprice"),
            lit("b").as("__side"))
        val epoch0 = aSlice(0).unionByName(bSlice(0))
          .unionByName(aSlice(1)).unionByName(bSlice(1))
        val epoch1 = aSlice(2).unionByName(bSlice(2))
        Seq("graft_jvs_view", "graft_jvs_a", "graft_jvs_b")
          .foreach(tb => s.sql(s"DROP TABLE IF EXISTS `$tb`"))
        val q = graft.streaming.StreamingOps.joinViewStream(
          graft.streaming.EpochFeed.feed(s, Seq(epoch0, epoch1)),
          "graft_jvs_view", "graft_jvs_a", "graft_jvs_b",
          keys = Seq("l_orderkey"),
          aCols = Seq("l_partkey", "l_quantity", "l_extendedprice"),
          bCols = Seq("o_custkey", "o_totalprice")).start()
        try q.processAllAvailable() finally q.stop()
        // failure-recovery replay of epoch 1: all three guards no-op it
        graft.streaming.StreamingOps.applyJoinViewBatch(
          "graft_jvs_view", "graft_jvs_a", "graft_jvs_b",
          Seq("l_orderkey"),
          Seq("l_partkey", "l_quantity", "l_extendedprice"),
          Seq("o_custkey", "o_totalprice"))(epoch1, 1L)
        java.lang.Boolean.TRUE
      }
      s.table("graft_jvs_view").drop("__batch")
        .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("o_custkey"))
    },
    "writer_stamp" -> { (s, dir) =>
      val inc = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate").as("event_time"))
        .filter(col("o_orderkey") % 100 === 0)
      val sysTime = java.sql.Timestamp.from(java.time.Instant.parse("2020-06-01T00:00:00Z"))
      Writer
        .normalizeTimestamps(Writer.stampSystemColumns(inc, sysTime))
        .orderBy(col("o_orderkey"))
    },

    // ---- dataset + metadata chain (SURVEY §1, §2.1): ingest the orders
    // table into a real on-disk dataset (three append slices, each with its
    // own commit time), then re-open it schema-first through the chain.
    "dataset_multislice" -> { (s, dir) =>
      val root = Fixtures.cached(s"dataset_multislice|$dir")(buildOrdersDataset(s, dir))
      Dataset.open(s, root).toDF().orderBy(col("offset"))
    },
    // The reference's cross-engine conformance fixture: cities CSV →
    // snapshot merge over two ingest rounds (update + implicit retraction),
    // committed through the full chain path (test_engine_transform.rs:395-648).
    "ingest_city_csv" -> { (s, dir) =>
      val work = Fixtures.cached(s"ingest_city_csv|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-city-")
        val r1 = work.resolve("r1.csv")
        val r2 = work.resolve("r2.csv")
        java.nio.file.Files.writeString(
          r1,
          "city,population\nvancouver,675000\nseattle,733000\nkyiv,2884000\n"
        )
        java.nio.file.Files.writeString(
          r2,
          "city,population\nvancouver,675000\nseattle,750000\nodessa,1015000\n"
        )
        val ds = Dataset.create(s, work.resolve("ds"), "cities")
        ds.chain.append(
          SetPollingSource(
            readFormat = "csv",
            schemaDdl = Some("city STRING, population INT"),
            merge = MergeConf("snapshot", primaryKey = Seq("city"))
          ),
          0L
        )
        IngestWriter.ingestFile(ds, r1.toString, java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli)
        IngestWriter.ingestFile(ds, r2.toString, java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli)
        // third identical round must be a no-op (up-to-date)
        IngestWriter.ingestFile(ds, r2.toString, java.time.Instant.parse("2024-03-01T00:00:00Z").toEpochMilli)
        work
      }
      Dataset.open(s, work.resolve("ds")).toDF().orderBy(col("offset"))
    },

    // ---- geo readers (SURVEY §2.1): GeoJSON FeatureCollection ingested
    // through the registry + append merge; geometry survives as a JSON
    // string column (readers/geojson.rs:85-91).
    "ingest_geojson" -> { (s, dir) =>
      val work = Fixtures.cached(s"ingest_geojson|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-geo-")
        java.nio.file.Files.writeString(
          work.resolve("cities.geojson"),
          """{"type":"FeatureCollection","features":[
            |{"type":"Feature","properties":{"name":"vancouver","pop":675000},"geometry":{"type":"Point","coordinates":[-123.1,49.3]}},
            |{"type":"Feature","properties":{"name":"seattle","pop":733000},"geometry":{"type":"Point","coordinates":[-122.3,47.6]}}]}""".stripMargin
        )
        val ds = Dataset.create(s, work.resolve("ds"), "geo")
        ds.chain.append(
          SetPollingSource(readFormat = "geojson", merge = MergeConf("append")),
          0L
        )
        IngestWriter.ingestFile(
          ds,
          work.resolve("cities.geojson").toString,
          java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
        )
        work
      }
      Dataset.open(s, work.resolve("ds")).toDF()
        .select(col("offset"), col("op"), col("name"), col("pop"), col("geometry"))
        .orderBy(col("offset"))
    },

    // ---- derivative transforms (SURVEY §2.4): the city scenario extended
    // with its `population * 10` derivative, executed incrementally over two
    // ingest rounds + an up-to-date no-op (test_engine_transform.rs:651-712,
    // transform_elaboration_service_impl.rs:46-112).
    "transform_incremental" -> { (s, dir) =>
      val work = Fixtures.cached(s"transform_incremental|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-deriv-")
        val r1 = work.resolve("r1.csv")
        val r2 = work.resolve("r2.csv")
        java.nio.file.Files.writeString(
          r1,
          "city,population\nvancouver,675000\nseattle,733000\nkyiv,2884000\n"
        )
        java.nio.file.Files.writeString(
          r2,
          "city,population\nvancouver,675000\nseattle,750000\nodessa,1015000\n"
        )
        val root = Dataset.create(s, work.resolve("cities"), "cities")
        root.chain.append(
          SetPollingSource(
            readFormat = "csv",
            schemaDdl = Some("city STRING, population INT"),
            merge = MergeConf("snapshot", primaryKey = Seq("city"))
          ),
          0L
        )
        val deriv = Dataset.create(s, work.resolve("cities_x10"), "cities_x10", kind = "derivative")
        TransformService.setTransform(
          deriv,
          inputs = Seq("cities"),
          steps = Seq(
            SqlStep(None, "SELECT op, event_time, city, population * 10 AS population FROM cities")
          ),
          systemTime = 0L
        )
        def t(iso: String) = java.time.Instant.parse(iso).toEpochMilli
        val resolve = (_: String) => Dataset.open(s, work.resolve("cities"))
        IngestWriter.ingestFile(root, r1.toString, t("2024-01-01T00:00:00Z"))
        TransformService.executeTransform(deriv, resolve, t("2024-01-05T00:00:00Z"))
        IngestWriter.ingestFile(root, r2.toString, t("2024-02-01T00:00:00Z"))
        TransformService.executeTransform(deriv, resolve, t("2024-02-05T00:00:00Z"))
        // no new input -> UpToDate, no block
        assert(
          TransformService.executeTransform(deriv, resolve, t("2024-03-05T00:00:00Z")) ==
            TransformService.UpToDate
        )
        work
      }
      Dataset.open(s, work.resolve("cities_x10")).toDF().orderBy(col("offset"))
    },

    // ---- stateful streaming transform (SURVEY §2.4; the reference's
    // checkpointed-engine story, engine_io_strategy.rs:93-176): hourly
    // windowed aggregation over the events table declared with
    // engine="spark-streaming", executed as FOUR incremental pulls over
    // ts-ordered input slices. Window state persists across runs in the
    // recorded checkpoint artifact (a window spanning two slices counts
    // events from both); append mode emits each finalized window exactly
    // once; the far-future sentinel slice closes the last real window (its
    // own window never closes, so it is absent from the output).
    "transform_stateful_stream" -> { (s, dir) =>
      val work = Fixtures.cached(s"transform_stateful_stream|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-ststream-")
        val ev = events(s, dir)
          .select(col("ts").as("event_time"), col("event_id"), col("value"))
        // ts-ordered tercile slices (exact percentiles on epoch micros; ties
        // stay in one slice, so no slice ever carries data older than a
        // previous slice's max — nothing is ever late under a 0s watermark)
        val qs = ev.agg(
          expr("percentile(unix_micros(event_time), 0.3333)").as("q1"),
          expr("percentile(unix_micros(event_time), 0.6667)").as("q2")).head()
        val (b1, b2) = (qs.getDouble(0), qs.getDouble(1))
        val maxTs = ev.agg(max(col("event_time"))).head().getTimestamp(0)
        val src = Dataset.create(s, work.resolve("src"), "evsrc")
        val out = Dataset.create(s, work.resolve("out"), "evagg", kind = "derivative")
        TransformService.setTransform(
          out, inputs = Seq("evsrc"),
          steps = Seq(SqlStep(None,
            """SELECT window.start AS window_start, count(*) AS n,
              |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
              |FROM evsrc GROUP BY window(event_time, '1 hour')""".stripMargin)),
          systemTime = 0L,
          engine = Some("spark-streaming"))
        val resolve = (_: String) => Dataset.open(s, work.resolve("src"))
        val slices = Seq(
          ev.filter(expr(s"unix_micros(event_time) <= $b1")),
          ev.filter(expr(s"unix_micros(event_time) > $b1 AND unix_micros(event_time) <= $b2")),
          ev.filter(expr(s"unix_micros(event_time) > $b2")),
          // sentinel: +30 days, closes every real window, never emits itself
          s.range(1).select(
            lit(new java.sql.Timestamp(maxTs.getTime + 30L * 86400 * 1000)).as("event_time"),
            lit(-1L).as("event_id"), lit(0.0).as("value"))
        )
        slices.zipWithIndex.foreach { case (slice, i) =>
          IngestWriter.writeBatch(src, slice, MergeStrategy.Append(), 1000L * (i + 1))
          val r = TransformService.executeTransform(
            Dataset.open(s, work.resolve("out")), resolve, 1000L * (i + 1) + 500)
          require(r.isInstanceOf[TransformService.Updated], s"run ${i + 1}: $r")
        }
        work
      }
      Dataset.open(s, work.resolve("out")).toDF()
        .select(col("window_start"), col("n"), col("total"))
        .orderBy(col("window_start"))
    },

    // ---- query service (SURVEY §2.3): SQL-string entry, table-ref
    // extraction, temp-view registration, as-of pinning to the post-round-1
    // head (query_service_impl.rs:59-130, 585-602, 741-808).
    "query_service_sql" -> { (s, dir) =>
      val (work, headAfterRound1) = Fixtures.cached(s"query_service_sql|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-qs-")
        val r1 = work.resolve("r1.csv")
        val r2 = work.resolve("r2.csv")
        java.nio.file.Files.writeString(
          r1,
          "city,population\nvancouver,675000\nseattle,733000\nkyiv,2884000\n"
        )
        java.nio.file.Files.writeString(
          r2,
          "city,population\nvancouver,675000\nseattle,750000\nodessa,1015000\n"
        )
        val ds = Dataset.create(s, work.resolve("cities"), "cities")
        ds.chain.append(
          SetPollingSource(
            readFormat = "csv",
            schemaDdl = Some("city STRING, population INT"),
            merge = MergeConf("snapshot", primaryKey = Seq("city"))
          ),
          0L
        )
        IngestWriter.ingestFile(ds, r1.toString, java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli)
        val h1 = ds.chain.head.get._2
        IngestWriter.ingestFile(ds, r2.toString, java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli)
        (work, h1)
      }
      val qs = new QueryService(s, Map("cities" -> Dataset.open(s, work.resolve("cities"))))
      // pinned to the round-1 head: seattle still 733000, odessa absent
      qs.sql(
        "SELECT city, population FROM cities WHERE population > 700000 ORDER BY city",
        asOf = Map("cities" -> headAfterRound1)
      )
    },

    // ---- DSv2 catalog (kamu_catalog.rs / kamu_table.rs:161-295): datasets
    // visible to plain `spark.sql` as `<cat>.default.<name>`, with
    // `VERSION AS OF '<block-hash>'` time travel = as-of pinning. Two
    // commits; read both the head and the round-1 pin through the catalog.
    "catalog_sql" -> { (s, dir) =>
      val (ws, headAfter1) = Fixtures.cached(s"catalog_sql|$dir") {
        val ws = java.nio.file.Files.createTempDirectory("graft-cat-")
        val nation = t(s, dir, "nation").select(
          col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))
        val ds = Dataset.create(s, ws.resolve("nation_ds"), "nation_ds")
        IngestWriter.writeBatch(ds, nation.filter(col("n_nationkey") < 12),
          MergeStrategy.Append(), java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli)
        val h1 = ds.chain.head.get._2
        IngestWriter.writeBatch(ds, nation.filter(col("n_nationkey") >= 12),
          MergeStrategy.Append(), java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli)
        (ws, h1)
      }
      // catalog name is derived from the workspace so re-registration across
      // sf dirs never aliases a cached catalog instance to a stale root
      val cat = s"graftcat_${Integer.toHexString(ws.toString.hashCode)}"
      graft.query.GraftCatalog.register(s, cat, ws.toUri.toString)
      s.sql(
        s"""SELECT 'head' AS snap, n_nationkey, n_name FROM $cat.default.nation_ds
           |UNION ALL
           |SELECT 'pinned' AS snap, n_nationkey, n_name
           |FROM $cat.default.nation_ds VERSION AS OF '$headAfter1'""".stripMargin
      ).orderBy(col("snap"), col("n_nationkey"))
    },

    // ---- maintenance (SURVEY §2.5): compaction must re-slice without
    // changing a single row — same oracle as the uncompacted dataset.
    "compaction" -> { (s, dir) =>
      // fixture = the 3-slice dataset; the compaction itself (and its clean
      // re-verify) is the operator under test and stays timed
      val root = Fixtures.cached(s"compaction|$dir")(buildOrdersDataset(s, dir))
      val work = java.nio.file.Files.createTempDirectory("graft-compact-q-").resolve("ds")
      copyDir(root, work)
      val compacted =
        graft.maintenance.Maintenance.compact(Dataset.open(s, work), maxRecords = 1000000L)
      require(compacted.chain.slices().size == 1, "compaction should merge to one slice")
      require(
        graft.maintenance.Maintenance.verify(compacted).isEmpty,
        "compacted dataset must verify clean"
      )
      compacted.toDF().orderBy(col("offset"))
    },
    // ---- text analysis: n-gram-profile language id (heuristic replicated
    // in the oracle via struct-max over (hits, lang) pairs).
    "text_lang" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), Text.languageId(col("text")).as("lang"))
        .orderBy(col("doc_id"))
    },

    // ---- temporal as-of join (SURVEY §2.4, §7.4.5): each even event joined
    // with the latest %7 event of the same user at or before its timestamp.
    // ---- gaps-and-islands: per-user purchase windows coalesced into
    // maximal activity spans (overlap/touch merges, gaps split) — the
    // running-max island rewrite, one key shuffle.
    "interval_coalesce" -> { (s, dir) =>
      graft.operators.Analytics.coalesceIntervals(
        events(s, dir).filter(col("event_type") === "purchase")
          .select(col("user_id"),
            unix_millis(col("ts")).as("ws"),
            (unix_millis(col("ts")) + (col("event_id") % 5 + 1) * 600000L).as("we")),
        "user_id", "ws", "we")
        .orderBy(col("user_id"), col("span_start"))
    },
    // ---- longest consecutive-day streak per user (ties to the earliest
    // start): day − row_number anchors, one aggregate per run.
    "activity_streaks" -> { (s, dir) =>
      graft.operators.Analytics.longestStreaks(events(s, dir), "user_id", "ts")
        .withColumn("streak_start", date_format(col("streak_start"), "yyyy-MM-dd"))
        .orderBy(col("user_id"))
    },
    // ---- binned interval-overlap join: per-user purchase windows that
    // intersect error windows (1-5 min, deterministic from event_id).
    // The naive lone-inequality spelling plans broadcast-nested-loop;
    // the binning rewrite is a plain (user, cell) hash join with a
    // residual, each pair emitted once in its canonical first-overlap
    // cell — no distinct pass.
    "interval_overlap_join" -> { (s, dir) =>
      def win(typ: String, idc: String, sc: String, ec: String) =
        events(s, dir).filter(col("event_type") === typ)
          .select(col("user_id"), col("event_id").as(idc),
            unix_millis(col("ts")).as(sc),
            (unix_millis(col("ts")) + (col("event_id") % 5 + 1) * 600000L).as(ec))
      graft.operators.Temporal.overlapJoin(
        win("purchase", "p_id", "p_start", "p_end"),
        "p_start", "p_end",
        win("error", "e_id", "e_start", "e_end"),
        "e_start", "e_end",
        keys = Seq("user_id"), binWidth = 1800000L)
        .select(col("user_id"), col("p_id"), col("e_id"))
        .orderBy(col("user_id"), col("p_id"), col("e_id"))
    },
    "asof_join" -> { (s, dir) =>
      val ev = events(s, dir)
      val left = ev
        .filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"), col("ts"))
      val right = Temporal.latestPerKeyTime(
        ev.filter(col("event_id") % 7 === 0)
          .select(col("user_id"), col("ts").as("rts"), col("value")),
        Seq("user_id"),
        "rts",
        tiebreak = col("value")
      )
      Temporal
        .asOfJoin(left, right, Seq("user_id"), "ts", "rts")
        .select(left("event_id"), left("user_id"), col("value").as("rate"))
        .orderBy(col("event_id"))
    },

    // ---- text analysis (beyond-reference LLM-pipeline surface): quality
    // scoring and BPE-ish token counting, both pure codegen'd built-ins.
    "text_quality" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), Text.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    },
    "text_bpe" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), Text.approxBpeTokenCount(col("text")).cast("bigint").as("n_bpe"))
        .orderBy(col("doc_id"))
    },
    // Exact n-gram Jaccard verification over a deterministic candidate-pair
    // set (adjacent doc ids) — the post-LSH verify stage in isolation.
    "ngram_jaccard" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val pairs = docs
        .select(col("doc_id").as("id_a"))
        .filter(col("id_a") % 10 === 0)
        .join(docs.select(col("doc_id").as("id_b")), col("id_b") === col("id_a") + 1)
      Dedup.ngramJaccard(pairs, docs, "doc_id", "text", 3).orderBy(col("id_a"))
    },

    // ---- character-level verify tier: exact Levenshtein over the same
    // candidate shape (bounded pairs, 1000-char prefix cap), sim kept at a
    // low floor so the entry emits rows. Integer distance in both engines.
    "edit_distance_verify" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val pairs = docs
        .select(col("doc_id").as("id_a"))
        .filter(col("id_a") % 10 === 0)
        .join(docs.select(col("doc_id").as("id_b")), col("id_b") === col("id_a") + 1)
      Dedup.editDistanceVerify(pairs, docs, "doc_id", "text", minSim = 0.2)
        .orderBy(col("id_a"))
    },

    // ---- streaming window shapes run in batch mode (SURVEY §2.4 #44/#45):
    // the same StreamingOps expressions the streaming specs drive, here
    // executed as batch queries so the window semantics get a hard oracle.
    "window_tumbling" -> { (s, dir) =>
      graft.streaming.StreamingOps
        .tumblingWindowAgg(
          events(s, dir), "ts", "1 hour", watermarkDelay = "",
          keys = Seq(col("event_type")),
          aggs = Seq(
            count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("total")
          )
        )
        .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("total"))
        .orderBy(col("wstart"), col("event_type"))
    },
    "window_sliding" -> { (s, dir) =>
      graft.streaming.StreamingOps
        .slidingWindowAgg(
          events(s, dir), "ts", "1 hour", "30 minutes", watermarkDelay = "",
          keys = Seq(col("event_type")),
          aggs = Seq(count(lit(1)).as("n"))
        )
        .select(col("window.start").as("wstart"), col("event_type"), col("n"))
        .orderBy(col("wstart"), col("event_type"))
    },
    "window_session" -> { (s, dir) =>
      graft.streaming.StreamingOps
        .sessionWindowAgg(
          events(s, dir), "ts", "5 minutes", watermarkDelay = "",
          keys = Seq(col("user_id")),
          aggs = Seq(count(lit(1)).as("n"))
        )
        .select(
          col("user_id"),
          col("session_window.start").as("sstart"),
          col("session_window.end").as("send"),
          col("n")
        )
        .orderBy(col("user_id"), col("sstart"))
    },

    // ---- REST/GraphQL pagination (SURVEY §2.3 #41) over a total order.
    "pagination" -> { (s, dir) =>
      val qs = new QueryService(s, Map.empty)
      qs.page(
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey")),
        skip = 100,
        limit = 50
      )
    },

    // ---- nullability assertion + schema marking (SURVEY §2.2 #29, §2.6
    // #57): raise_error-based runtime assert, then non-null schema rewrite.
    // A pass-through on non-null data; the raising path is spec-tested.
    "nullability_assert" -> { (s, dir) =>
      val df = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val asserted = graft.operators.Nullability.assertNotNull(df, Seq("o_orderkey", "o_custkey"))
      graft.operators.Nullability
        .markNotNull(asserted, Seq("o_orderkey", "o_custkey"))
        .orderBy(col("o_orderkey"))
    },

    // ---- LSH ANN + embedding near-dup (BASELINE.json north star), on
    // quantized vectors + integer planes so bucket assignment and cosine are
    // exact integer arithmetic — hash-checkable against the SQL oracle (the
    // float-plane production path in Similarity/Dedup is spec-tested).
    "ann_lsh" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val planes = Similarity.intPlanes(numPlanes = 6, dim = 64, seed = 42L)
      val emb = t(s, dir, "embeddings")
      val q = emb
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), Similarity.quantize(col("embedding")).as("qv"))
      val c = emb.select(col("vec_id").as("cid"), Similarity.quantize(col("embedding")).as("cv"))
      // squared norms precomputed per side — per-vector work stays linear
      val qb = broadcast(
        q.withColumn("bucket", Similarity.intPlaneBucket(col("qv"), planes))
          .withColumn("qn2", Similarity.intDot(col("qv"), col("qv")))
      )
      val cb = c
        .withColumn("bucket", Similarity.intPlaneBucket(col("cv"), planes))
        .withColumn("cn2", Similarity.intDot(col("cv"), col("cv")))
      val nn = sqrt(col("qn2").cast("double")) * sqrt(col("cn2").cast("double"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
      cb.join(qb, Seq("bucket"))
        .filter(col("qid") =!= col("cid"))
        .withColumn(
          "cos",
          when(nn > 0, Similarity.intDotFixed(col("qv"), col("cv"), 64).cast("double") / nn)
            .otherwise(lit(0.0))
        )
        .withColumn("rnk", row_number().over(w).cast("bigint"))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("cid"))
        .orderBy(col("qid"), col("rnk"))
    },
    // ---- multi-probe LSH ANN (Lv et al. 2007): each query also probes its
    // Hamming-1 neighbor buckets, recovering single-table recall; corpus
    // side unchanged (one bucket per vector, equi-join on bucket). Same
    // quantized-exact discipline as ann_lsh.
    "ann_lsh_multiprobe" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val planes = Similarity.intPlanes(numPlanes = 6, dim = 64, seed = 42L)
      val emb = t(s, dir, "embeddings")
      val q = emb
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), Similarity.quantize(col("embedding")).as("qv"))
      val c = emb.select(col("vec_id").as("cid"), Similarity.quantize(col("embedding")).as("cv"))
      val baseB = Similarity.intPlaneBucket(col("qv"), planes)
      val probes = array((baseB +: (0 until 6).map(i => baseB.bitwiseXOR(lit(1 << i)))): _*)
      val qb = broadcast(
        q.withColumn("bucket", explode(probes))
          .withColumn("qn2", Similarity.intDot(col("qv"), col("qv"))))
      val cb = c
        .withColumn("bucket", Similarity.intPlaneBucket(col("cv"), planes))
        .withColumn("cn2", Similarity.intDot(col("cv"), col("cv")))
      val nn = sqrt(col("qn2").cast("double")) * sqrt(col("cn2").cast("double"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
      cb.join(qb, Seq("bucket"))
        .filter(col("qid") =!= col("cid"))
        .withColumn(
          "cos",
          when(nn > 0, Similarity.intDotFixed(col("qv"), col("cv"), 64).cast("double") / nn)
            .otherwise(lit(0.0)))
        .withColumn("rnk", row_number().over(w).cast("bigint"))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("cid"))
        .orderBy(col("qid"), col("rnk"))
    },

    // ---- multi-TABLE LSH ANN: 3 independent 6-plane tables, candidates =
    // union of per-table bucket matches — the recall lever single-table LSH
    // lacks (recall ~1-(1-r)^L vs r). Corpus side is one row per
    // (table, vector), equi-joined on (table, bucket); SimilaritySpec pins
    // recall >= single-table on the sf0.1 fixture.
    "ann_lsh_multitable" -> { (s, dir) =>
      val tables = (0 until 3).map(t =>
        Similarity.intPlanes(numPlanes = 6, dim = 64, seed = 42L + t))
      val emb = t(s, dir, "embeddings")
      val q = emb
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), Similarity.quantize(col("embedding")).as("qv"))
      val c = emb.select(col("vec_id").as("cid"), Similarity.quantize(col("embedding")).as("cv"))
      Similarity
        .lshTopKMultiTable(q, c, "qid", "qv", "cid", "cv", k = 5, planeTables = tables)
        .select(col("qid"), col("rnk").cast("bigint").as("rnk"), col("cid"))
        .orderBy(col("qid"), col("rnk"))
    },

    // ---- the at-scale multi-table layout: one row per (table, vector)
    // bucketed by (t, bucket), probed with zero corpus shuffle. Same
    // candidates, same oracle as the ad-hoc multi-table entry.
    "ann_lsh_multitable_bucketed" -> { (s, dir) =>
      val tables = (0 until 3).map(t =>
        Similarity.intPlanes(numPlanes = 6, dim = 64, seed = 42L + t))
      val emb = t(s, dir, "embeddings")
      val q = emb
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), Similarity.quantize(col("embedding")).as("qv"))
      val c = emb.select(col("vec_id").as("cid"), Similarity.quantize(col("embedding")).as("cv"))
      Similarity.materializeLshCorpusMultiTable(c, "cid", "cv", tables,
        numBuckets = 8, table = "graft_lsh_mt")
      Similarity
        .lshTopKMultiTableFromTable(s, "graft_lsh_mt", q, "qid", "qv", k = 5,
          planeTables = tables)
        .select(col("qid"), col("rnk").cast("bigint").as("rnk"), col("cid"))
        .orderBy(col("qid"), col("rnk"))
    },

    // ---- IVF ANN (beyond-reference): deterministic k-means training +
    // cell-probed search. nprobe = k probes every cell, which makes the
    // pipeline EXACTLY brute force — so the exhaustive oracle checks the
    // whole train→assign→probe→rank machinery; recall at nprobe < k is
    // spec-tested (SimilaritySpec).
    // ---- product quantization, trained AND searched under the oracle: m=4
    // subspace codebooks from the same deterministic integer k-means as IVF
    // (the DuckDB oracle retrains them — two unrolled Lloyd iterations —
    // instead of receiving literals), corpus stored as 4 codes/vector, ADC
    // ranking with per-QUERY lookup tables. The one ANN entry whose
    // training is cross-engine-verified, not just its search.
    "ann_pq" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val c = emb.select(col("vec_id").as("cid"), Similarity.quantize(col("embedding")).as("cv"))
      val q = emb
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), Similarity.quantize(col("embedding")).as("qv"))
      // codebooks train once per (dir, JVM) — the deployment shape (train
      // once, encode/search forever); the oracle still retrains its own
      val books = Fixtures.cached(s"ann_pq_books|$dir") {
        Similarity.pqTrain(c, "cid", "cv", dim = 64, m = 4, k = 16, iters = 2)
      }
      Similarity
        .pqTopK(q, c, "qid", "qv", "cid", "cv", k = 5, books, dim = 64)
        .orderBy(col("qid"), col("rnk"))
    },

    // ---- IVF-PQ: the composed at-scale layout — bucketed coarse cells
    // (pruned no-shuffle probes) over PQ-coded rows (m ints per vector).
    // nprobe = k makes the cell restriction vanish, so the result must
    // equal plain PQ's ADC ranking — the same codebook-retraining oracle
    // checks the whole composition.
    "ann_ivfpq" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val c = emb.select(col("vec_id").as("cid"), Similarity.quantize(col("embedding")).as("cv"))
      val q = emb
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), Similarity.quantize(col("embedding")).as("qv"))
      // train + table materialization are the fixture; the probe is the op
      val (cents, books) = Fixtures.cached(s"ann_ivfpq_fixture|$dir") {
        val ce = Similarity.ivfTrain(c, "cid", "cv", k = 4, iters = 1)
        val bk = Similarity.pqTrain(c, "cid", "cv", dim = 64, m = 4, k = 16, iters = 2)
        Similarity.materializeIvfPqCorpus(c, "cid", "cv", ce, bk,
          dim = 64, numBuckets = 4, table = "graft_ann_ivfpq")
        (ce, bk)
      }
      Similarity
        .ivfPqTopKFromTable(s, "graft_ann_ivfpq", q, "qid", "qv",
          k = 5, cents, books, dim = 64, nprobe = 4)
        .orderBy(col("qid"), col("rnk"))
    },

    // ---- IVF-PQ APPEND: the table built from only vec_id >= 100, the
    // rest appended in place (frozen centroids + codebooks, O(batch)
    // bucket-spec insert) — probing the appended table must equal the
    // fresh full build, so the same retraining oracle covers it.
    "ann_ivfpq_append" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val c = emb.select(col("vec_id").as("cid"), Similarity.quantize(col("embedding")).as("cv"))
      val q = emb
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), Similarity.quantize(col("embedding")).as("qv"))
      val (cents, books) = Fixtures.cached(s"ann_ivfpq_append_fixture|$dir") {
        val ce = Similarity.ivfTrain(c, "cid", "cv", k = 4, iters = 1)
        val bk = Similarity.pqTrain(c, "cid", "cv", dim = 64, m = 4, k = 16, iters = 2)
        Similarity.materializeIvfPqCorpus(c.filter(col("cid") >= 100), "cid", "cv",
          ce, bk, dim = 64, numBuckets = 4, table = "graft_ann_ivfpq_app")
        Similarity.appendToIvfPqCorpus(c.filter(col("cid") < 100), "cid", "cv",
          ce, bk, dim = 64, table = "graft_ann_ivfpq_app")
        (ce, bk)
      }
      Similarity
        .ivfPqTopKFromTable(s, "graft_ann_ivfpq_app", q, "qid", "qv",
          k = 5, cents, books, dim = 64, nprobe = 4)
        .orderBy(col("qid"), col("rnk"))
    },

    "ann_ivf" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val c = emb.select(col("vec_id").as("cid"), Similarity.quantize(col("embedding")).as("cv"))
      val q = emb
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), Similarity.quantize(col("embedding")).as("qv"))
      // k/iters kept small: with nprobe = k the RESULT is training-invariant
      // (exhaustive), so the entry buys correctness coverage, not recall —
      // recall quality at nprobe < k is SimilaritySpec's job.
      val cents = Similarity.ivfTrain(c, "cid", "cv", k = 4, iters = 1)
      Similarity
        .ivfTopK(q, c, "qid", "qv", "cid", "cv", k = 5, dim = 64, cents, nprobe = 4)
        .select(col("qid"), col("rnk"), col("cid"))
        .orderBy(col("qid"), col("rnk"))
    },

    // ---- bucketed-corpus IVF: cells assigned ONCE at materialization
    // (bucketBy(cell) table), probes read the pruned bucketed scan with no
    // corpus shuffle and no per-query cell re-assignment — the at-scale
    // shape ivfTopK's doc promises. Same exhaustive oracle as ann_ivf
    // (nprobe = k), PlanSpec pins the no-corpus-Exchange plan.
    "ann_ivf_bucketed" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val c = emb.select(col("vec_id").as("cid"), Similarity.quantize(col("embedding")).as("cv"))
      val q = emb
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), Similarity.quantize(col("embedding")).as("qv"))
      val cents = Similarity.ivfTrain(c, "cid", "cv", k = 4, iters = 1)
      Similarity.materializeIvfCorpus(c, "cid", "cv", cents, numBuckets = 8,
        table = "graft_ivf_corpus")
      Similarity
        .ivfTopKFromTable(s, "graft_ivf_corpus", q, "qid", "qv", k = 5, cents, nprobe = 4)
        .select(col("qid"), col("rnk"), col("cid"))
        .orderBy(col("qid"), col("rnk"))
    },

    // ---- IVF index MAINTENANCE: half the corpus materialized, half
    // APPENDED in place (new vectors land in their nearest existing cell,
    // FAISS IndexIVF.add-style) — row set identical to a fresh build, so
    // the exhaustive oracle applies unchanged.
    "ann_ivf_append" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val c = emb.select(col("vec_id").as("cid"), Similarity.quantize(col("embedding")).as("cv"))
      val q = emb
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), Similarity.quantize(col("embedding")).as("qv"))
      val cents = Similarity.ivfTrain(c, "cid", "cv", k = 4, iters = 1)
      Similarity.materializeIvfCorpus(c.filter(col("cid") % 2 === 0), "cid", "cv", cents,
        numBuckets = 8, table = "graft_ivf_app")
      Similarity.appendToIvfCorpus(c.filter(col("cid") % 2 === 1), "cid", "cv", cents,
        table = "graft_ivf_app")
      Similarity
        .ivfTopKFromTable(s, "graft_ivf_app", q, "qid", "qv", k = 5, cents, nprobe = 4)
        .select(col("qid"), col("rnk"), col("cid"))
        .orderBy(col("qid"), col("rnk"))
    },

    // ---- SQ8 compressed ANN: per-dim [min,max] trained on the corpus,
    // byte codes (packed binary on the Spark side, plain integer lists in
    // the oracle — identical values by construction), exact integer dots.
    "ann_sq8" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val (mins, maxs) = Similarity.sq8Train(emb, "embedding", dim = 64)
      val c = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity
        .sq8TopK(q, c, "qid", "qv", "cid", "cv", k = 5, mins, maxs)
        .select(col("qid"), col("rnk"), col("cid"))
        .orderBy(col("qid"), col("rnk"))
    },

    // ---- SQ8 codes inside the bucketed LSH corpus — compression × layout:
    // 8× smaller rows, zero corpus shuffle per probe, bucket-pruned
    // candidates scored by the codegen'd byte dot. Buckets from the
    // quantized vectors (ann_lsh's planes), codes from ann_sq8's per-dim
    // ranges; the oracle composes both constructions.
    "ann_sq8_bucketed" -> { (s, dir) =>
      val planes = Similarity.intPlanes(numPlanes = 6, dim = 64, seed = 42L)
      val emb = t(s, dir, "embeddings")
      val (mins, maxs) = Similarity.sq8Train(emb, "embedding", dim = 64)
      Similarity.materializeLshCorpusSq8(
        emb.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
        planes, mins, maxs, numBuckets = 8, table = "graft_sq8_corpus")
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity
        .sq8TopKFromTable(s, "graft_sq8_corpus", q, "qid", "qv", k = 5,
          planes, mins, maxs)
        .select(col("qid"), col("rnk"), col("cid"))
        .orderBy(col("qid"), col("rnk"))
    },

    "embed_neardup" -> { (s, dir) =>
      val planes = Similarity.intPlanes(numPlanes = 4, dim = 64, seed = 7L)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Similarity.quantize(col("embedding")).as("v"))
      // ad-hoc (no materialized table) path: capped buckets, id-only bucket
      // shuffle, vectors joined back onto surviving pairs only
      Dedup.embeddingDupsQuantized(e, "id", "v", planes, dim = 64, minCos = 0.3)
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- bucketed-corpus variant of embed_neardup: same planes, same
    // threshold, but the corpus is materialized as a bucketBy table and the
    // self-join runs storage-partitioned (zero shuffle — PlanSpec pins the
    // plan; this entry pins the VALUES against the same oracle).
    "embed_neardup_bucketed" -> { (s, dir) =>
      val planes = Similarity.intPlanes(numPlanes = 4, dim = 64, seed = 7L)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Similarity.quantize(col("embedding")).as("v"))
      Similarity.materializeLshCorpus(e, "id", "v", planes, numBuckets = 8,
        table = "graft_embed_corpus")
      graft.operators.Dedup
        .embeddingDupsFromTable(s, "graft_embed_corpus", dim = 64, minCos = 0.3)
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- index MAINTENANCE for the embedding corpus: materialize HALF
    // the vectors, APPEND the other half in place (insertInto through the
    // bucket spec — O(batch) bytes, no corpus rewrite), then pair over the
    // table. The appended table holds the same ROWS as a fresh full
    // materialization, so the full-corpus oracle applies unchanged.
    "embed_neardup_append" -> { (s, dir) =>
      val planes = Similarity.intPlanes(numPlanes = 4, dim = 64, seed = 7L)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Similarity.quantize(col("embedding")).as("v"))
      Similarity.materializeLshCorpus(e.filter(col("id") % 2 === 0), "id", "v", planes,
        numBuckets = 8, table = "graft_embed_app")
      Similarity.appendToLshCorpus(e.filter(col("id") % 2 === 1), "id", "v", planes,
        table = "graft_embed_app")
      graft.operators.Dedup
        .embeddingDupsFromTable(s, "graft_embed_app", dim = 64, minCos = 0.3)
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- SemDeDup semantic dedup (beyond-reference): k-means cells, drop
    // any doc with an earlier >=minCos cell-mate, keep the rest. Seed
    // centroids (iters = 0) are the first k vectors by id — exactly
    // replicable in the oracle, so the oracle pins cell ASSIGNMENT plus the
    // keep rule; trained-centroid behavior (a containment/refinement
    // property, not a fixed answer) is DedupSpec's job.
    "semantic_dedup" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Similarity.quantize(col("embedding")).as("v"))
      val cents = Similarity.ivfTrain(e, "id", "v", k = 8, iters = 0)
      Dedup.semanticDedupQuantized(e, "id", "v", cents, dim = 64, minCos = 0.3)
        .orderBy(col("id"))
    },

    // ---- perceptual AUDIO near-dup: real WAV decode → 64-bit loudness-
    // envelope hash → the SAME banded-Hamming machinery as images. Each
    // fixture window is a constant-amplitude square wave, so every envelope
    // bit is a hand-set amplitude comparison and the pairs are closed-form:
    // strictly-rising (-1) vs one-flattened-step at hamming 1; constant (0)
    // vs one-spike (bit 39) at hamming 1; across groups >= 62.
    "audio_neardup" -> { (s, dir) =>
      import graft.operators.MediaCodec.squareWav
      import s.implicits._
      val df = Seq(
        (1L, squareWav(w => 100 + w * 50)),
        (2L, squareWav(w => if (w == 33) 100 + 32 * 50 else 100 + w * 50)),
        (3L, squareWav(_ => 500)),
        (4L, squareWav(w => if (w == 40) 5000 else 500))
      ).toDF("id", "content").repartition(2)
      val hashed = graft.operators.Multimodal.audioEnvelopeHashes(df, "id", "content")
      Dedup.dhashDups(hashed, "id", "env_hash", maxHamming = 3, bands = 4)
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- export sinks + readers round-trip (SURVEY §2.1 #18): dataset →
    // csv + ndjson files → read back through the ingest readers.
    "export_roundtrip" -> { (s, dir) =>
      val work = Fixtures.cached(s"export_roundtrip|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-export-")
        val df = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        graft.operators.Export.toCsv(df, work.resolve("csv").toString, coalesce = Some(1))
        graft.operators.Export.toNdjson(df, work.resolve("nd").toString, coalesce = Some(1))
        work
      }
      val ddl = Some("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
      val csvBack = graft.ingest.Readers.csv(s, work.resolve("csv").toString, ddl)
      val ndBack = graft.ingest.Readers.ndjson(s, work.resolve("nd").toString, ddl)
      csvBack
        .withColumn("src", lit("csv"))
        .unionByName(ndBack.withColumn("src", lit("ndjson")))
        .orderBy(col("src"), col("n_nationkey"))
    },

    // ---- record-limit pruning + tail service (SURVEY §2.1 #2, §2.3 #35):
    // chain-level slice pruning happens before the scan (only the last slice
    // is read), then the tail operator.
    "dataset_tail" -> { (s, dir) =>
      val root = Fixtures.cached(s"dataset_tail|$dir")(buildOrdersDataset(s, dir))
      Dataset.open(s, root).tail(50)
    },

    // ---- changelog-projection *service* (SURVEY §2.3 #36): current state of
    // a dataset with the primary key discovered from the chain's merge conf.
    "changelog_state" -> { (s, dir) =>
      val work = Fixtures.cached(s"changelog_state|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-state-")
        java.nio.file.Files.writeString(
          work.resolve("r1.csv"),
          "city,population\nvancouver,675000\nseattle,733000\nkyiv,2884000\n"
        )
        java.nio.file.Files.writeString(
          work.resolve("r2.csv"),
          "city,population\nvancouver,675000\nseattle,750000\nodessa,1015000\n"
        )
        val ds = Dataset.create(s, work.resolve("ds"), "cities")
        ds.chain.append(
          SetPollingSource(
            readFormat = "csv",
            schemaDdl = Some("city STRING, population INT"),
            merge = MergeConf("snapshot", primaryKey = Seq("city"))
          ),
          0L
        )
        IngestWriter.ingestFile(ds, work.resolve("r1.csv").toString,
          java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli)
        IngestWriter.ingestFile(ds, work.resolve("r2.csv").toString,
          java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli)
        work
      }
      val qs = new QueryService(s, Map("cities" -> Dataset.open(s, work.resolve("ds"))))
      qs.state("cities").orderBy(col("offset"))
    },

    // ---- raw-query preprocess during ingest (SURVEY §2.4 #51): SQL step
    // over temp view `input` between read and merge
    // (engine_datafusion_inproc.rs:74-112).
    "ingest_preprocess" -> { (s, dir) =>
      val work = Fixtures.cached(s"ingest_preprocess|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-prep-")
        java.nio.file.Files.writeString(
          work.resolve("r1.csv"),
          "city,population\nvancouver,675000\nseattle,733000\nkyiv,2884000\n"
        )
        val ds = Dataset.create(s, work.resolve("ds"), "cities")
        ds.chain.append(
          SetPollingSource(
            readFormat = "csv",
            schemaDdl = Some("city STRING, population INT"),
            preprocessSql = Some("SELECT city, population, population * 2 AS pop2 FROM input"),
            merge = MergeConf("snapshot", primaryKey = Seq("city"))
          ),
          0L
        )
        IngestWriter.ingestFile(ds, work.resolve("r1.csv").toString,
          java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli)
        work
      }
      Dataset.open(s, work.resolve("ds")).toDF().orderBy(col("offset"))
    },

    // ---- NDJSON reader through the registry + full ingest path (SURVEY
    // §2.1 #5).
    "ingest_ndjson" -> { (s, dir) =>
      val work = Fixtures.cached(s"ingest_ndjson|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-ndjson-")
        java.nio.file.Files.writeString(
          work.resolve("cities.ndjson"),
          """{"city":"vancouver","population":675000}
            |{"city":"seattle","population":733000}
            |""".stripMargin
        )
        val ds = Dataset.create(s, work.resolve("ds"), "cities")
        ds.chain.append(
          SetPollingSource(
            readFormat = "ndjson",
            schemaDdl = Some("city STRING, population INT"),
            merge = MergeConf("snapshot", primaryKey = Seq("city"))
          ),
          0L
        )
        IngestWriter.ingestFile(ds, work.resolve("cities.ndjson").toString,
          java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli)
        work
      }
      Dataset.open(s, work.resolve("ds")).toDF().orderBy(col("offset"))
    },

    // ---- single-document JSON reader with sub-path selection (SURVEY §2.1
    // #4, readers/json.rs).
    "ingest_json" -> { (s, dir) =>
      val work = Fixtures.cached(s"ingest_json|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-json-")
        java.nio.file.Files.writeString(
          work.resolve("doc.json"),
          """{"data":{"cities":[
            |{"city":"kyiv","population":2884000},
            |{"city":"lviv","population":721000}]}}""".stripMargin
        )
        work
      }
      graft.ingest.Readers
        .json(s, work.resolve("doc.json").toString,
          subPath = Some("data.cities"),
          schemaDdl = Some("city STRING, population INT"))
        .orderBy(col("city"))
    },

    // ---- ESRI shapefile reader (SURVEY §2.1 #7): .shp + .dbf → attribute
    // columns + GeoJSON geometry string, via the registry.
    "ingest_shapefile" -> { (s, dir) =>
      val shp = Fixtures.cached(s"ingest_shapefile|$dir") {
        writeShapefileFixture(java.nio.file.Files.createTempDirectory("graft-shp-q-"))
      }
      graft.ingest.Readers
        .forFormat("shapefile")(s, shp.toString)
        .select(col("NAME"), col("POP"), col("geometry"))
        .orderBy(col("NAME"))
    },

    // ---- dedup clustering: connected components over a deterministic
    // pair chain (id -> id+1 except every 7th) — components are blocks of 7
    // consecutive ids, so the expected labeling is closed-form.
    "dedup_clusters" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val pairs = docs
        .select(col("doc_id").as("id_a"))
        .filter(col("id_a") % 7 =!= 6)
        .join(docs.select(col("doc_id").as("id_b")), col("id_b") === col("id_a") + 1)
      Dedup.connectedComponents(pairs).orderBy(col("id"))
    },
    // ---- INCREMENTAL cluster maintenance: the last O(corpus) step of the
    // ingest tick becomes O(batch). Initial index + cluster table over
    // doc_id%5∈{1,2,3}; two ticks (%5=4, then %5=0) each append the batch to
    // the MinHash index, probe it (pairs cover batch-vs-corpus AND
    // batch-internal dups), and fold ONLY those pairs into the persistent
    // cluster table via quotient-graph min-label propagation seeded with the
    // stored roots. The final resolved table must equal a fresh full CC over
    // the union's pair set — the oracle recomputes exactly that with a
    // recursive CTE (bucket caps never bite at this SF, so append-ordered
    // index fill ≡ fresh banding).
    "dedup_clusters_incremental" -> { (s, dir) =>
      // the three-generation index/cluster build is the FIXTURE here (its
      // per-tick cost is timed by dedup_minhash_append and the endurance
      // table); what this entry checks is the RESOLVED cluster table after
      // incremental maintenance — build once per (entry, dir) per JVM.
      Fixtures.cached(s"dedup_clusters_incremental|$dir") {
        val docs = t(s, dir, "documents")
        val init = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 4)
        Dedup.materializeMinhashIndex(init, "doc_id", "text",
          table = "graft_minhash_ccl", numBuckets = 8)
        Dedup.materializeClusters(
          Dedup.minHashLsh(init, "doc_id", "text", minSim = 0.5),
          table = "graft_minhash_ccl", numBuckets = 8)
        for (m <- Seq(4, 0)) {
          val batch = docs.filter(col("doc_id") % 5 === m)
          Dedup.appendToMinhashIndex(batch, "doc_id", "text", table = "graft_minhash_ccl")
          val pairs = Dedup
            .minHashLshAgainstIndex(batch, "doc_id", "text",
              table = "graft_minhash_ccl", minSim = 0.5)
            .select(col("id_new").as("id_a"), col("id_corpus").as("id_b"))
          Dedup.appendToClusters(pairs, table = "graft_minhash_ccl")
        }
        java.lang.Boolean.TRUE
      }
      Dedup.readClusters(s, "graft_minhash_ccl").orderBy(col("id"))
    },

    // ---- keep-BEST fuzzy dedup: near-dup clusters from MinHash pairs,
    // winner per cluster = max n_chars (ties to smallest id), docs in no
    // pair survive. The quality-aware variant of dedup_minhash's keep-first.
    "dedup_keep_best" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minHashLsh(docs, "doc_id", "text", minSim = 0.5)
        .select(col("id_a"), col("id_b"))
      Dedup.keepBestPerCluster(
        docs.select(col("doc_id"), col("n_chars")),
        idCol = "doc_id", scoreCol = "n_chars", pairs = pairs)
        .orderBy(col("doc_id"))
    },

    // ---- corpus quality filtering: the select stage of a training-data
    // pipeline — quality score + language id + token-count window composed
    // into one predicate.
    "corpus_filter" -> { (s, dir) =>
      // spread the single-file corpus before the per-row scoring work (at
      // real scale the corpus arrives already partitioned; see
      // Dedup.ensureParallelism)
      Dedup.ensureParallelism(t(s, dir, "documents"))
        .select(
          col("doc_id"),
          Text.qualityScore(col("text")).as("quality"),
          Text.languageId(col("text")).as("lang"),
          Text.tokenCount(col("text")).cast("bigint").as("n_tokens")
        )
        .filter(col("quality") >= 0.5 && col("lang") === "en" && col("n_tokens").between(5, 1000))
        .select(col("doc_id"), col("quality"), col("n_tokens"))
        .orderBy(col("doc_id"))
    },

    // ---- corpus composition: deterministic per-source sampling (the
    // domain-reweighting step of a pretraining mix). Row fate is a pure
    // function of (source, doc_id) via the portable md5 hash — map-only,
    // reproducible under any re-partitioning.
    "corpus_sample" -> { (s, dir) =>
      Corpus.sampleBySource(
        t(s, dir, "documents"),
        idCol = "doc_id", sourceCol = "source",
        rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
        defaultRate = 0.1)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },

    // ---- temperature (α = 0.5) mixture sampling, XLM-R-style: rates from
    // integer micro-weights floor(sqrt(n_s)·1e6) so the normalizer is an
    // order-free integer sum and every rate is one exact double division —
    // DuckDB recomputes rates AND selection bit-identically.
    "temperature_sample" -> { (s, dir) =>
      Corpus.temperatureSample(
        t(s, dir, "documents"),
        idCol = "doc_id", sourceCol = "source", budgetDocs = 200L)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },

    // ---- budgeted sampling: sample each source DOWN TO a token budget
    // (rate = min(1, budget/total) from one small aggregate, broadcast back;
    // the sample itself is the same deterministic hash — map-side).
    "corpus_budget_sample" -> { (s, dir) =>
      Corpus.sampleToBudget(
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            Text.tokenCount(col("text")).cast("bigint").as("n_tokens")),
        idCol = "doc_id", sourceCol = "source", tokenCol = "n_tokens",
        budgets = Map("src3" -> 5000L, "src4" -> 100L))
        .select(col("doc_id"), col("source"), col("n_tokens"))
        .orderBy(col("doc_id"))
    },

    // ---- deterministic training order + per-source upsampling: wiki-style
    // sources replicated k epochs, then the whole mix shuffled by the
    // portable (salt,id) hash — reproducible on any cluster shape.
    "corpus_mix" -> { (s, dir) =>
      val up = Corpus.upsample(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        sourceCol = "source", epochs = Map("src0" -> 3, "src1" -> 2))
      Corpus.shuffleOrder(up.withColumn("id2",
          concat(col("doc_id").cast("string"), lit("e"), col("epoch").cast("string"))),
          idCol = "id2", salt = 7L)
        .select(col("doc_id"), col("source"), col("epoch").cast("bigint").as("epoch"))
        .limit(120)
    },

    // ---- Z-order clustering key: per-column shift-scaled codes (exact
    // integer arithmetic, min/max from one bounded aggregate) interleaved
    // by a static shift/mask expression — writing range-partitioned by this
    // key gives parquet min/max pruning on BOTH columns at once.
    "zorder_layout" -> { (s, dir) =>
      graft.operators.Bucketing.withZorderKey(
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey")),
        cols = Seq("l_orderkey", "l_partkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("zkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- token-distribution drift (src0 vs the rest): add-one-smoothed
    // KL both ways over the top-200 combined vocabulary, every ln and
    // every per-token contribution floored onto integer grids so the
    // corpus KL is an order-free integer sum — a reproducible drift GATE.
    "corpus_drift" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      Corpus.tokenDrift(
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"),
        "text", vocab = 200)
    },

    // ---- Unicode-script profile: exact per-script letter counts by
    // regex deletion + dominant-script label (CCNet routes by script
    // before any LM sees the text). Map-only.
    "text_scripts" -> { (s, dir) =>
      import s.implicits._
      val synth = Seq(
        (100001L, "Привет мир это тест кириллицы"),
        (100002L, "这是一个中文测试文档"),
        (100003L, "هذا اختبار عربي"),
        (100004L, "mixed Привет hello 世界"),
        (100005L, "1234 ... !!!")
      ).toDF("doc_id", "text")
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .unionByName(synth)
        .select(col("doc_id"), Text.scriptProfile(col("text")).as("sp"))
        .select(col("doc_id"),
          col("sp.latin").as("latin"), col("sp.cyrillic").as("cyrillic"),
          col("sp.han").as("han"), col("sp.arabic").as("arabic"),
          col("sp.letters").as("letters"), col("sp.script").as("script"))
        .orderBy(col("doc_id"))
    },

    // ---- BM25 keyword retrieval: idf and every per-term summand floored
    // onto the 1e-6 grid so the document score is an order-free integer
    // sum; one corpus-stats aggregate, then map-only scoring with
    // let-bound token arrays, distributed TakeOrdered top-k.
    "bm25_search" -> { (s, dir) =>
      Corpus.bm25Search(t(s, dir, "documents"), "doc_id", "text",
        terms = Seq("customer", "spark", "merge"), topK = 15)
        .withColumnRenamed("id", "doc_id")
    },

    // ---- the STANDING-SEARCH path: bucketed (term, id, tf) posting table
    // + one-row stats table; query scans carry term IN (...) so bucket and
    // page pruning fire before any row moves. Must equal the scan path
    // bit-for-bit — the entry shares bm25_search's oracle.
    "bm25_search_indexed" -> { (s, dir) =>
      Fixtures.cached(s"bm25_index|$dir") {
        Corpus.materializeBm25Index(t(s, dir, "documents"), "doc_id", "text",
          table = "graft_bm25_idx", numBuckets = 8)
        java.lang.Boolean.TRUE
      }
      Corpus.bm25SearchFromIndex(s, "graft_bm25_idx",
        terms = Seq("customer", "spark", "merge"), topK = 15)
        .withColumnRenamed("id", "doc_id")
    },

    // ---- search-index APPEND: index built from half the corpus, the rest
    // appended O(batch) through the bucket spec (stats advance with the
    // batch) — queries over the appended index must equal the scan path
    // over the full corpus, so it shares bm25_search's oracle.
    "bm25_search_appended" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      Fixtures.cached(s"bm25_index_app|$dir") {
        Corpus.materializeBm25Index(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", table = "graft_bm25_app", numBuckets = 8)
        Corpus.appendToBm25Index(docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", table = "graft_bm25_app")
        java.lang.Boolean.TRUE
      }
      Corpus.bm25SearchFromIndex(s, "graft_bm25_app",
        terms = Seq("customer", "spark", "merge"), topK = 15)
        .withColumnRenamed("id", "doc_id")
    },

    // ---- exact PHRASE search over a positional posting index: term i's
    // positions shift by −i, so an occurrence is one (id, start) key
    // shared by every term — a chain of hash equi-joins over term-pruned
    // posting lists; the corpus text is never rescanned at query time.
    "phrase_search" -> { (s, dir) =>
      Fixtures.cached(s"phrase_index|$dir") {
        Corpus.materializePhraseIndex(t(s, dir, "documents"), "doc_id", "text",
          table = "graft_phrase_idx", numBuckets = 8)
        java.lang.Boolean.TRUE
      }
      Corpus.phraseSearch(s, "graft_phrase_idx",
        phrase = Seq("spark", "merge"), topK = 20)
        .withColumnRenamed("id", "doc_id")
    },
    // ---- positional-index APPEND: half the corpus indexed, the rest
    // inserted O(batch) through the bucket spec, the SAME batch inserted
    // again (anti-join no-op) — queries over the appended index equal the
    // fresh index over the full corpus, so it shares phrase_search's
    // oracle.
    "phrase_search_appended" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      Fixtures.cached(s"phrase_index_app|$dir") {
        Corpus.materializePhraseIndex(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", table = "graft_phrase_app", numBuckets = 8)
        Corpus.appendToPhraseIndex(docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", table = "graft_phrase_app")
        Corpus.appendToPhraseIndex(docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", table = "graft_phrase_app") // retried batch: no-op
        java.lang.Boolean.TRUE
      }
      Corpus.phraseSearch(s, "graft_phrase_app",
        phrase = Seq("spark", "merge"), topK = 20)
        .withColumnRenamed("id", "doc_id")
    },
    // ---- postings compaction: three insertInto generations folded back
    // into one file-per-bucket layout by the generic catalog-spec-
    // preserving rewrite — queries identical before/after (shares the
    // fresh-index oracle), and the bucketed-join layout survives.
    "phrase_search_compacted" -> { (s, dir) =>
      val docs = Dedup.ensureParallelism(t(s, dir, "documents"))
      Fixtures.cached(s"phrase_index_cpt|$dir") {
        Corpus.materializePhraseIndex(docs.filter(col("doc_id") % 3 === 0),
          "doc_id", "text", table = "graft_phrase_cpt", numBuckets = 8)
        Corpus.appendToPhraseIndex(docs.filter(col("doc_id") % 3 === 1),
          "doc_id", "text", table = "graft_phrase_cpt")
        Corpus.appendToPhraseIndex(docs.filter(col("doc_id") % 3 === 2),
          "doc_id", "text", table = "graft_phrase_cpt")
        graft.operators.Bucketing.compactTable(s, "graft_phrase_cpt")
        java.lang.Boolean.TRUE
      }
      Corpus.phraseSearch(s, "graft_phrase_cpt",
        phrase = Seq("spark", "merge"), topK = 20)
        .withColumnRenamed("id", "doc_id")
    },
    // ---- same fold for the BM25 postings + a stats rewrite from the
    // compacted postings; scores stay the scan-path scores.
    "bm25_search_compacted" -> { (s, dir) =>
      val docs = Dedup.ensureParallelism(t(s, dir, "documents"))
      Fixtures.cached(s"bm25_index_cpt|$dir") {
        Corpus.materializeBm25Index(docs.filter(col("doc_id") % 3 === 0),
          "doc_id", "text", table = "graft_bm25_cpt", numBuckets = 8)
        Corpus.appendToBm25Index(docs.filter(col("doc_id") % 3 === 1),
          "doc_id", "text", table = "graft_bm25_cpt")
        Corpus.appendToBm25Index(docs.filter(col("doc_id") % 3 === 2),
          "doc_id", "text", table = "graft_bm25_cpt")
        graft.operators.Bucketing.compactTable(s, "graft_bm25_cpt")
        java.lang.Boolean.TRUE
      }
      Corpus.bm25SearchFromIndex(s, "graft_bm25_cpt",
        terms = Seq("customer", "spark", "merge"), topK = 15)
        .withColumnRenamed("id", "doc_id")
    },

    // ---- generic top-k per key via the two-level rank (hot keys cannot
    // serialize one task — stage 1 bounds every (key, partition) bucket
    // to k before the per-key rank sees it).
    "topk_per_key" -> { (s, dir) =>
      Corpus.topKPerKey(
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice")),
        keyCols = Seq("o_orderpriority"),
        ordering = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3)
        .orderBy(col("o_orderpriority"), col("rnk"))
    },

    // ---- EXACTLY-n-per-stratum sampling: salted two-stage hash rank (a
    // global top-n row is always within its salt bucket's top-n, so the
    // stages compose exactly); the full rows never shuffle — the ≤ n·|strata|
    // survivors semi-join back broadcast-sized.
    "stratified_sample" -> { (s, dir) =>
      Corpus.stratifiedSample(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        idCol = "doc_id", stratumCol = "source", n = 15)
        .orderBy(col("doc_id"))
    },

    // ---- deterministic shard cut: exact 0-based rank in (hash, id) order,
    // shard = floor(pos·S/N) — the contiguous-equal-shards layout a
    // trainer's data loader reads; range-partitioned total sort +
    // zipWithIndex, nothing single-partition.
    "corpus_shards" -> { (s, dir) =>
      Corpus.shuffleShards(
        t(s, dir, "documents"), idCol = "doc_id", numShards = 7, salt = 3L)
        .orderBy(col("position"))
    },

    // ---- data-quality expectations (the Deequ/dbt-test gate an ingest
    // runs before committing): all row-local rules in ONE aggregate pass;
    // unique = one key-count aggregate; FK = one anti-join. Two synthetic
    // bad rows make every rule's violation count non-trivial.
    "expectations" -> { (s, dir) =>
      import s.implicits._
      import graft.operators.Expectations
      import graft.operators.Expectations._
      val synth = Seq(
        (-1L, Option.empty[Long], "Z", -5.0),
        (-1L, Option(-12345L), "Z", -5.0)
      ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val src = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
        .unionByName(synth)
      Expectations.run(src, Seq(
        notNull("o_custkey"),
        inRange("o_totalprice", 0.0, 1000000.0),
        inSet("o_orderstatus", Seq("F", "O", "P")),
        Unique("unique:o_orderkey", Seq("o_orderkey")),
        ForeignKey("fk:o_custkey", "o_custkey", t(s, dir, "customer"), "c_custkey")))
        .orderBy(col("rule"))
    },

    // ---- EXACT quantiles: value at 0-based sorted index floor(p·(n−1)) —
    // one range-partitioned total sort + zipWithIndex, deterministic and
    // engine-exact where approx_percentile is neither.
    "profile_quantiles" -> { (s, dir) =>
      Profile.quantiles(t(s, dir, "lineitem"), "l_quantity",
        Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0))
        .orderBy(col("p"))
    },

    // ---- incrementally-maintained CUBE: every grouping set of
    // (priority, status) advanced per tick by the same op-weighted
    // partials; oracle recomputes the full CUBE over the final state
    // (grouping_id bit conventions agree: leftmost dim = MSB, 1 = rolled
    // up).
    "rollup_cube_incremental" -> { (s, dir) =>
      import graft.operators.Rollup
      Fixtures.cached(s"rollup_cube_incremental|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-rollupcube-")
        val ds = Dataset.create(s, work.resolve("orders"), "orders_cdc")
        val base = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"), col("o_totalprice"))
        def tick(batch: DataFrame, iso: String): Unit =
          IngestWriter.writeBatch(ds, batch, MergeStrategy.Snapshot(Seq("o_orderkey")),
            java.time.Instant.parse(iso).toEpochMilli)
        tick(base.filter(col("o_orderkey") % 3 =!= 0), "2024-01-01T00:00:00Z")
        Rollup.refresh(Dataset.open(s, work.resolve("orders")), "graft_rollup_cube",
          dims = Seq("o_orderpriority", "o_orderstatus"), sumCols = Seq("o_totalprice"),
          cube = true)
        tick(
          base.withColumn("o_orderpriority",
            when(col("o_orderkey") % 7 === 0, lit("X-URGENT")).otherwise(col("o_orderpriority"))),
          "2024-01-02T00:00:00Z")
        Rollup.refresh(Dataset.open(s, work.resolve("orders")), "graft_rollup_cube",
          dims = Seq("o_orderpriority", "o_orderstatus"), sumCols = Seq("o_totalprice"),
          cube = true)
        work
      }
      Rollup.read(s, "graft_rollup_cube", Seq("o_totalprice"))
        .withColumn("gid", col("gid").cast("long"))
        .orderBy(col("gid"), col("o_orderpriority"), col("o_orderstatus"))
    },

    // ---- one-pass per-column profile: count / non-null / EXACT distinct /
    // min / max for five columns through a single Expand aggregate job;
    // min/max rendered as strings for a uniform schema.
    "profile_table" -> { (s, dir) =>
      Profile.profile(
        t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
          "o_orderdate"))
        .orderBy(col("col_name"))
    },

    // ---- document chunking: sliding 40-token windows with 8-token overlap
    // (stride 32) — context-window-sized training samples, map-only.
    "chunk_docs" -> { (s, dir) =>
      Corpus.chunkDocs(t(s, dir, "documents"), idCol = "doc_id", textCol = "text",
        chunkTokens = 40, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // ---- benchmark decontamination: drop documents sharing a word 8-gram
    // with the probe texts (docs 0-2 act as the "benchmark"); probe n-grams
    // broadcast into a semi-join, contaminated ids anti-join back.
    "decontaminate" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      Corpus.decontaminate(
        docs, idCol = "doc_id", textCol = "text",
        probes = docs.filter(col("doc_id") < 3), probeTextCol = "text", n = 8)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },

    // ---- graded contamination: per-document fraction of 8-gram positions
    // hitting the benchmark set (docs 0-2 stand in as the benchmark, so
    // they score 1.0 and overlapping docs score their true overlap).
    "contamination_score" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      Corpus.contaminationScore(
        docs, idCol = "doc_id", textCol = "text",
        probes = docs.filter(col("doc_id") < 3), probeTextCol = "text", n = 8)
        .orderBy(col("doc_id"))
    },

    // ---- token-budget shard packing: shard = exclusive-prefix-sum(tokens)
    // div budget, computed as a two-level distributed prefix sum (per-range
    // partials + broadcast offsets + per-range windows) — the oracle spells
    // it as the plain global window.
    "pack_shards" -> { (s, dir) =>
      Corpus.packShards(
        t(s, dir, "documents")
          .select(col("doc_id"),
            Text.tokenCount(col("text")).cast("bigint").as("n_tokens")),
        idCol = "doc_id", tokenCol = "n_tokens", budget = 2000L, numBuckets = 16)
        .select(col("doc_id"), col("n_tokens"), col("shard"))
        .orderBy(col("doc_id"))
    },

    // ---- Gopher-style repetition quality stats: fraction of normalized
    // chars in the top word-2-gram / in duplicated word-3-grams — one
    // native-kernel pass per row (RepetitionStatsExpr; the explode-based
    // spelling is the executable spec in CorpusSpec).
    "rep_ratios" -> { (s, dir) =>
      Dedup.ensureParallelism(t(s, dir, "documents"))
        .select(col("doc_id"), Corpus.repetitionStats(col("text")).as("r"))
        .select(col("doc_id"), col("r.top2").as("top2"), col("r.dup3").as("dup3"))
        .orderBy(col("doc_id"))
    },

    // ---- PII scrubbing: deterministic synthetic PII is injected in BOTH
    // engines (the corpus itself is clean words), then masked by the same
    // ordered regex passes — email, then phone, then IPv4.
    "pii_scrub" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          Corpus.scrubPii(concat(
            lit("contact u"), col("doc_id").cast("string"), lit("@ex.com or +1 555-000"),
            col("doc_id").cast("string"), lit(" at 10.0.0."),
            (col("doc_id") % 256).cast("string"), lit(" "), col("text"))).as("scrubbed"))
        .orderBy(col("doc_id"))
    },

    // ---- deterministic train/val/test split: (salt, id)-hash against
    // cumulative weight boundaries; the oracle embeds the EXACT double
    // boundaries (full decimal expansion) so both engines compare the same
    // bits.
    "corpus_split" -> { (s, dir) =>
      Corpus.splitCorpus(t(s, dir, "documents").select(col("doc_id")), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = 7L)
        .orderBy(col("doc_id"))
    },

    // ---- corpus-wide top-K n-grams (the BPE-trainer pair-count step at
    // n=2): map-side-combined counts, distributed TakeOrdered top-K,
    // deterministic tie-break on the gram.
    "top_ngrams" -> { (s, dir) =>
      Corpus.topNgrams(t(s, dir, "documents"), "text", n = 2, k = 50)
    },
    // ---- interpolated Kneser–Ney bigram LM (D = 0.75 on the exact 1e-6
    // grid): the classical smoothed n-gram estimate, one corpus-sized
    // (w1,w2) shuffle, everything else derived from the vocabulary-
    // bounded bigram-type table. Top 100 by probability.
    "kn_bigram_lm" -> { (s, dir) =>
      Corpus.kneserNeyBigrams(t(s, dir, "documents"), "text")
        .orderBy(col("p_micro").desc, col("w1"), col("w2"))
        .limit(100)
    },

    // ---- domain filtering: deterministic synthetic URLs (doc_id mod 7
    // picks the host in BOTH engines); suffix-blocklist drops hosts under
    // spam.example / ads.net, and the unparseable-host row drops too.
    "domain_filter" -> { (s, dir) =>
      val hosts = array(
        lit("ads.spam.example"), lit("en.wikipedia.org"), lit("blog.example.net"),
        lit("spam.example"), lit("example.edu"), lit("tracker.ads.net"), lit(""))
      val url = concat(lit("https://"),
        element_at(hosts, (col("doc_id") % 7).cast("int") + 1),
        lit("/page/"), col("doc_id").cast("string"))
      val docs = t(s, dir, "documents").select(col("doc_id"), url.as("url"))
      Corpus.filterByDomain(docs, "doc_id", "url", Seq("spam.example", "ads.net"))
        .orderBy(col("doc_id"))
    },

    // ---- URL canonicalization + URL-level dedup (the cheapest crawl
    // dedup tier): messy synthetic URLs (case, www., default ports,
    // tracking params, fragments) collapse onto canonical keys; keep =
    // lowest doc_id per key. Map-only canonicalization, (key,id) shuffle.
    "url_canonicalize" -> { (s, dir) =>
      val hostVariants = array(
        lit("HTTP://Example.COM:80"), lit("https://www.Example.com:443"),
        lit("https://news.example.org"), lit("http://example.com"))
      val url = concat(
        element_at(hostVariants, (col("doc_id") % 4).cast("int") + 1),
        lit("/Article/"), (col("doc_id") % 50).cast("string"),
        lit("?utm_source=x&id="), (col("doc_id") % 25).cast("string"),
        lit("&utm_campaign=y#frag"))
      val docs = t(s, dir, "documents").select(col("doc_id"), url.as("url"))
      val kept = Corpus.dedupByUrl(docs, "doc_id", "url").select(col("doc_id"), lit(1L).as("kept"))
      docs
        .withColumn("url_canon", Corpus.canonicalizeUrl(col("url")))
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("url_canon"), coalesce(col("kept"), lit(0L)).as("kept"))
        .orderBy(col("doc_id"))
    },

    // ---- hashed linear quality classifier: deterministic dyadic weights
    // (k/1024 — sums are exact in double, so summation order and engine
    // cannot change the logit), same portable md5 token hash both sides.
    "quality_classifier" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("score", Corpus.scoreHashedLinear(col("text"), qcWeights))
        .select(col("doc_id"), col("score"), (col("score") > 0).as("keep"))
        .orderBy(col("doc_id"))
    },

    // ---- bigram stupid-backoff LM perplexity (CCNet quality filter):
    // model trained on the documents table itself, scored back over it.
    // Per-token ln p floored onto a 1e-6 integer grid before summation, so
    // the aggregate is order-independent and hash-comparable.
    "lm_perplexity" -> { (s, dir) =>
      val docs = Dedup.ensureParallelism(t(s, dir, "documents"))
      val lm = Corpus.trainNgramLm(docs, "text")
      Corpus.scoreNgramLm(docs, "doc_id", "text", lm)
        .orderBy(col("doc_id"))
    },

    // ---- line-level content filter (RefinedWeb-style): lines survive with
    // >= 3 words of which >= 50% carry a letter — short crumbs, number
    // rows, and symbol rows drop, prose passes. Map-only HOF.
    "filter_lines" -> { (s, dir) =>
      import s.implicits._
      val synth = Seq(
        (100001L, "Home\nthe widget survey covers every " +
          "model we ship today\n42 1942 17\n*** *** ***\nprices include the tax"),
        (100002L, "$ % #\n99")
      ).toDF("doc_id", "text")
      Corpus.filterLines(
        t(s, dir, "documents").select(col("doc_id"), col("text")).unionByName(synth),
        "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // ---- within-doc repeated-line removal (in-page headers/footers): each
    // doc keeps the first occurrence of every >=6-char line, map-only HOF
    // prefix scan; short lines always pass (legitimate repeats).
    "dedup_lines_doc" -> { (s, dir) =>
      import s.implicits._
      val synth = Seq(
        (100001L, "SITE HEADER\nreal content one.\nSITE HEADER\nmore content.\nSITE HEADER"),
        (100002L, "a\nx longer line here\na\nx longer line here\na"),
        (100003L, "unique one\nunique two")
      ).toDF("doc_id", "text")
      Corpus.dedupLinesInDoc(
        t(s, dir, "documents").select(col("doc_id"), col("text")).unionByName(synth),
        "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // ---- sentence-window chunking (the RAG variant of chunk_docs):
    // greedy [^.!?]+[.!?]* sentence scan (no lookbehind — Java regex and
    // RE2 agree), 3-sentence windows with 1 shared sentence.
    "chunk_sentences" -> { (s, dir) =>
      Corpus.chunkSentences(t(s, dir, "documents"), "doc_id", "text",
        maxSentences = 3, overlap = 1)
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // ---- Gopher rule-based quality filter (Rae et al. 2021 A1.1): per-rule
    // measurements + verdicts + the conjunction, all exact counting and one
    // final double division per ratio — replicated term by term in DuckDB.
    "gopher_rules" -> { (s, dir) =>
      Corpus.gopherRules(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // ---- the round-9 cleaning/filter stack composed END TO END, one
    // oracle: strip HTML → normalize → in-doc line dedup → RefinedWeb
    // line filter → Gopher rules (stopword threshold 1 — the fixture
    // lexicon carries only 'the') → bigram-LM trained ON THE SURVIVORS →
    // drop the worst-perplexity third. Stage interplay is the point: the
    // line filter rewrites the text the rules measure, the LM sees only
    // post-filter text, and the rank cut sees only LM-scored survivors.
    "corpus_pipeline_v2" -> { (s, dir) =>
      import s.implicits._
      import graft.functions.Normalize
      val synth = Seq(
        (100001L, "NAV MENU\n<p>the pipeline cleans the markup and the repeated " +
          "navigation lines before the quality rules measure the words</p>\nNAV MENU\n" +
          "after the cleaning stage the remaining text must still carry enough words " +
          "for the gopher length rule to accept the document as real content for the " +
          "training corpus we build here today\nNAV MENU"),
        (100002L, "### ### ### ###")
      ).toDF("doc_id", "text")
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text")).unionByName(synth)
      // lineage cuts: the clean/dedup HOF chain and the filtered survivor
      // set each feed MANY downstream consumers (rules scan, LM train's two
      // aggregations, scoring joins, the rank sort, the final join) —
      // without the cuts every consumer re-runs the whole text pipeline
      // (measured 12.8 s -> ~3 s at sf0.1)
      val cleaned = Corpus.filterLines(
        Corpus.dedupLinesInDoc(
          docs.withColumn("text", Normalize.cleanText(Normalize.stripHtml(col("text")))),
          "doc_id", "text"),
        "doc_id", "text").localCheckpoint()
      val keep = Corpus.gopherRules(cleaned, "doc_id", "text", minStopwordHits = 1)
        .filter(col("pass")).select("doc_id")
      val survivors = cleaned.join(keep, "doc_id").localCheckpoint()
      val lm = Corpus.trainNgramLm(survivors, "text")
      Corpus.pplBuckets(survivors, "doc_id", "text", lm, numBuckets = 3)
        .filter(col("bucket") < 2)
        .join(survivors, "doc_id")
        .select(col("doc_id"), col("bucket"), col("text"))
        .orderBy(col("doc_id"))
    },

    // ---- the FULL INGEST TICK, end to end — what a 100 TB pipeline
    // actually runs per poll: clean/filter the new batch (RefinedWeb line
    // filter → Gopher rules → language id), probe it against the standing
    // MinHash index, drop near-dups of the committed corpus, append the
    // survivors to the index IN PLACE, and commit them as a ledger slice.
    // Two ticks on top of an initial corpus; every stage touches O(batch)
    // data — the corpus participates only through its bucketed index scans
    // and the ledger's bloom-pruned key anti-join. The oracle recomputes
    // both generations' survivors from scratch (filters, pairs, and the
    // earlier-generations-only dedup rule) plus the ledger offsets.
    "corpus_ingest_tick" -> { (s, dir) =>
      val root = Fixtures.cached(s"corpus_ingest_tick|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-ctick-")
        val docs = t(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
        // the cleaning battery: line filter REWRITES text, Gopher + lang
        // gate on the rewritten text. Checkpointed — each cleaned batch
        // feeds the commit, the index append, and the probe.
        def cleaned(d: DataFrame): DataFrame = {
          val lf = Corpus.filterLines(d, "doc_id", "text")
          val keep = Corpus.gopherRules(lf, "doc_id", "text", minStopwordHits = 1)
            .filter(col("pass")).select("doc_id")
          lf.join(keep, "doc_id")
            .filter(graft.functions.Text.languageId(col("text")) === "en")
            .localCheckpoint()
        }
        val ds = Dataset.create(s, work.resolve("corpus"), "corpus")
        def commit(batch: DataFrame, iso: String): Unit =
          IngestWriter.writeBatch(ds,
            batch.select(col("doc_id"), col("source"), col("text")),
            MergeStrategy.Ledger(Seq("doc_id")),
            java.time.Instant.parse(iso).toEpochMilli)
        val s0 = cleaned(docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 4))
        commit(s0, "2024-01-01T00:00:00Z")
        Dedup.materializeMinhashIndex(s0, "doc_id", "text",
          table = "graft_tick_idx", numBuckets = 8)
        for ((m, iso) <- Seq((4, "2024-01-02T00:00:00Z"), (0, "2024-01-03T00:00:00Z"))) {
          val batch = cleaned(docs.filter(col("doc_id") % 5 === m))
          val dupIds = Dedup.minHashLshAgainstIndex(batch, "doc_id", "text",
            table = "graft_tick_idx", minSim = 0.5)
            .select(col("id_new").as("doc_id")).distinct()
          val survivors = batch.join(dupIds, Seq("doc_id"), "left_anti").localCheckpoint()
          Dedup.appendToMinhashIndex(survivors, "doc_id", "text", table = "graft_tick_idx")
          commit(survivors, iso)
        }
        work
      }
      Dataset.open(s, root.resolve("corpus")).toDF()
        .select(col("offset"), col("doc_id"), col("source"))
        .orderBy(col("offset"))
    },

    // ---- distributed Naive Bayes quality classifier: trained on the
    // corpus itself (positive class = src0 documents), scored over every
    // document — training is pure token counting plus a final ln floor
    // onto the 1e-6 grid, so model and scores are engine-exact.
    "nb_classifier" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .withColumn("lbl", col("source") === "src0")
      val model = Corpus.trainNaiveBayes(docs, "text", "lbl")
      val out = Corpus.scoreNaiveBayes(docs, "doc_id", "text", model)
        .orderBy(col("doc_id"))
        .localCheckpoint()
      model.unpersist()
      out
    },

    // ---- CCNet-style perplexity bucketing (Wenzek et al. 2020): LM-score
    // every document, cut the corpus into head/middle/tail thirds by EXACT
    // perplexity rank — distributed total sort + zipWithIndex, never a
    // single-partition ntile window. Exactness is what lets the oracle
    // replicate the cut with row_number arithmetic.
    "ppl_buckets" -> { (s, dir) =>
      val docs = Dedup.ensureParallelism(t(s, dir, "documents"))
      val lm = Corpus.trainNgramLm(docs, "text")
      Corpus.pplBuckets(docs, "doc_id", "text", lm, numBuckets = 3)
        .select(col("doc_id"), col("logppl"), col("bucket"))
        .orderBy(col("doc_id"))
    },

    // ---- Unicode text cleaning: NFC (native codegen'd Normalizer
    // expression) + control/tab -> space + space-run collapse + trim,
    // newlines preserved. Synthetic rows exercise decomposed accents and
    // C0/DEL bytes the lorem corpus lacks; DuckDB replicates with
    // nfc_normalize + the same regex pipeline.
    // ---- HTML -> text (regex tier): script/style subtrees and comments
    // dropped wholesale, tags to spaces, the six dominant entities decoded
    // in one pass (&amp; last), then the cleanText whitespace discipline.
    "strip_html" -> { (s, dir) =>
      import s.implicits._
      val pages = Seq(
        (1L, "<html><head><title>T</title><style>p{color:red}</style></head>" +
          "<body><h1>Hello &amp; welcome</h1><!-- note -->" +
          "<p>1 &lt; 2, &quot;x&quot;&nbsp;&#39;y&#39;</p>" +
          "<script>var x = '<p>not text</p>';</script><p>end</p></body></html>"),
        (2L, "no markup at all"),
        (3L, "a &amp;lt; b") // double-escaped decodes exactly once
      ).toDF("doc_id", "html")
      pages
        .select(col("doc_id"),
          graft.functions.Normalize
            .cleanText(graft.functions.Normalize.stripHtml(col("html"))).as("text"))
        .orderBy(col("doc_id"))
    },

    "text_normalize" -> { (s, dir) =>
      import s.implicits._
      val synth = Seq(
        (100001L, "cafe" + "\u0301" + "  du   monde"), // decomposed accent -> NFC-composed
        (100002L, "a\tb" + "\u0001" + "c" + "\u007f" + "d"), // tab + C0 + DEL -> spaces
        (100003L, "  keep\nnewlines   intact  ")
      ).toDF("doc_id", "text")
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .unionByName(synth)
        .select(col("doc_id"),
          graft.functions.Normalize.cleanText(col("text")).as("clean"))
        .orderBy(col("doc_id"))
    },

    // ---- GPT-style sequence packing: the corpus token stream in doc order
    // cut into fixed 512-token training sequences (docs cross boundaries).
    // Output rejoins each sequence as text so the hash compare is exact.
    "pack_sequences" -> { (s, dir) =>
      val docs = Dedup.ensureParallelism(t(s, dir, "documents"))
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      Corpus.packSequences(docs, "doc_id", "toks", seqLen = 512)
        .select(col("seq_id"), col("n_tokens"), array_join(col("token_ids"), " ").as("seq_text"))
        .orderBy(col("seq_id"))
    },

    // ---- document-boundary positions per packed sequence (what a
    // trainer's attention-mask reset consumes): within-seq offsets where a
    // new doc begins; continuation-only sequences have none.
    "pack_sequence_bounds" -> { (s, dir) =>
      val docs = Dedup.ensureParallelism(t(s, dir, "documents"))
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      Corpus.packSequences(docs, "doc_id", "toks", seqLen = 512)
        .select(col("seq_id"), col("n_tokens"),
          concat_ws(",", transform(col("doc_starts"), x => x.cast("string"))).as("doc_starts"))
        .orderBy(col("seq_id"))
    },

    // ---- exact substring-span dedup (Lee et al. 2022 spelling): 20-token
    // windows at stride 10; corpus-duplicated windows keep their first
    // (doc, start) occurrence and are cut everywhere else. Spark matches by
    // xxhash64 of the window, the oracle by the window string itself.
    "dedup_spans" -> { (s, dir) =>
      val docs = Dedup.ensureParallelism(t(s, dir, "documents"))
      Corpus.dedupSpans(docs, "doc_id", "text", windowTokens = 20, stride = 10)
        .select(col("doc_id"), col("text"), col("removed_tokens"))
        .orderBy(col("doc_id"))
    },

    // ---- DSIR importance scoring: hashed unigram+bigram bag models of a
    // target slice (src0) vs the whole corpus; per-bucket micro-scaled log
    // ratios (exact integers) summed per doc. The oracle recomputes the
    // entire featurize→count→weight→score pipeline.
    "dsir_score" -> { (s, dir) =>
      val docs = Dedup.ensureParallelism(t(s, dir, "documents"))
      val model =
        Corpus.trainDsir(docs.filter(col("source") === "src0"), docs, "text", buckets = 1024)
      Corpus.scoreDsir(docs, "doc_id", "text", model)
        .orderBy(col("doc_id"))
    },

    // ---- BPE train + apply: the oracle checks the tokenizer's LOSSLESS
    // round-trip (pieces rejoined == the normalized word sequence — true
    // for every merge table only if encode applies merges consistently);
    // exact piece-level semantics (merge order, tie-breaks, multi-
    // occurrence merging) are CorpusSpec's hand-verified cases.
    "bpe_roundtrip" -> { (s, dir) =>
      val docs = Dedup.ensureParallelism(t(s, dir, "documents"))
      val model = Corpus.trainBpe(docs, "text", numMerges = 100)
      Corpus.applyBpe(docs, "doc_id", "text", model)
        .select(
          col("doc_id"),
          trim(regexp_replace(concat_ws("", col("pieces")), "</w>", " ")).as("text_rt"))
        .orderBy(col("doc_id"))
    },

    // ---- corpus-wide line dedup (CCNet/RefinedWeb boilerplate removal):
    // the fixture text has no newlines, so segment boundaries are
    // synthesized identically in both engines (every ' the ' becomes a
    // separator — sequential non-overlapping replacement in both). Segments
    // of >=6 chars shared by >=2 documents are removed everywhere; the
    // Spark side hashes segments (xxhash64) and probes the collected sorted
    // set map-only, the oracle works on the literal segment strings — the
    // rewritten text must agree exactly.
    "dedup_lines" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), regexp_replace(col("text"), " the ", "\n").as("text"))
      Corpus.dedupLines(docs, "doc_id", "text", sep = "\n", minDocs = 2, minLineChars = 6)
        .select(col("doc_id"), col("text"), col("removed_lines"))
        .orderBy(col("doc_id"))
    },

    // ---- the full pretraining-corpus pipeline as ONE oracle-checked unit:
    // quality/language/length filter → repetition filter (native kernel) →
    // exact dedup keep-first → per-source token-budget sampling → shard
    // packing. Every stage is the library operator a real curation job
    // would call; the oracle recomputes all five stages in DuckDB.
    "corpus_pipeline" -> { (s, dir) =>
      val docs = Dedup.ensureParallelism(t(s, dir, "documents"))
      val stats = docs.select(
        col("doc_id"), col("source"), col("text"),
        Text.qualityScore(col("text")).as("quality"),
        Text.languageId(col("text")).as("lang"),
        Text.tokenCount(col("text")).cast("bigint").as("n_tokens"),
        Corpus.repetitionStats(col("text")).as("r"))
      val filtered = stats.filter(
        col("quality") >= 0.5 && col("lang") === "en" &&
          col("n_tokens").between(5, 1000) &&
          col("r.top2") <= 0.1 && col("r.dup3") <= 0.1)
      val deduped = Dedup.exactKeepFirst(filtered, "doc_id", "text")
      val sampled = Corpus.sampleToBudget(deduped, "doc_id", "source", "n_tokens",
        budgets = Map("src5" -> 400L, "src6" -> 400L))
      Corpus.packShards(
        sampled.select(col("doc_id"), col("source"), col("n_tokens")),
        idCol = "doc_id", tokenCol = "n_tokens", budget = 1000L, numBuckets = 16)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("shard"))
        .orderBy(col("doc_id"))
    },

    // ---- exact dedup, keep-first form: one surviving row per distinct
    // normalized content (fingerprint partition ≡ normalized-text partition
    // in the oracle — same groups barring a 64-bit hash collision).
    "dedup_keep_first" -> { (s, dir) =>
      Dedup
        .exactKeepFirst(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },

    // ---- end-to-end fuzzy dedup: LSH candidates → exact n-gram Jaccard
    // verify → connected components → keep one canonical doc per cluster.
    // The full pipeline a training-data curation job runs, as one entry.
    "dedup_pipeline" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minHashLsh(docs, "doc_id", "text", minSim = 0.5)
      val verified = Dedup
        .ngramJaccard(pairs.select(col("id_a"), col("id_b")), docs, "doc_id", "text", 3)
        .filter(col("jaccard") >= 0.4)
        .select(col("id_a"), col("id_b"))
      Dedup
        .keepCanonical(docs, "doc_id", verified)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },

    // ---- multimodal plumbing (beyond-reference): binary media columns with
    // size / synthetic-frame-count / sample-estimate — codegen'd expressions
    // over payloads that have no JVM decoder (text-as-bytes here).
    "multimodal_meta" -> { (s, dir) =>
      val m = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
      m.select(
        col("doc_id"),
        graft.operators.Multimodal.mediaSize(col("content")).as("nbytes"),
        size(graft.operators.Multimodal.frameSlices(col("content"), 4, 16))
          .cast("bigint").as("n_frames"),
        graft.operators.Multimodal.audioSampleEstimate(col("content")).as("est_samples")
      ).orderBy(col("doc_id"))
    },

    // ---- REAL multimodal decode (javax.imageio + javax.sound): generated
    // PNGs with analytically-known dHash (horizontal ramp → every left<right
    // comparison true → hash -1; constant/vertical ramp → 0) and WAV-PCM
    // with analytically-known duration and RMS (square wave at 1/4 full
    // scale → rms_q 250). The oracle is that closed-form ground truth —
    // independent of the decoder implementation.
    "multimodal_decode" -> { (s, dir) =>
      import graft.operators.MediaCodec
      def ramp(w: Int, h: Int, vertical: Boolean): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        for (y <- 0 until h; x <- 0 until w) {
          val v = if (vertical) y * 255 / (h - 1) else x * 255 / (w - 1)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        MediaCodec.pngBytes(img)
      }
      def flat(w: Int, h: Int): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, 0x808080)
        MediaCodec.pngBytes(img)
      }
      val square = MediaCodec.wavBytes(
        Array.tabulate[Short](4000)(i => if (i % 2 == 0) 8192 else -8192), 8000)
      val silence = MediaCodec.wavBytes(Array.fill[Short](2000)(0), 8000)
      val rows = Seq(
        (1L, "image/png", ramp(32, 16, vertical = false)),
        (2L, "image/png", flat(8, 8)),
        (3L, "image/png", ramp(16, 32, vertical = true)),
        (4L, "audio/wav", square),
        (5L, "audio/wav", silence),
        // minimal valid MP4 box skeleton: dimensions/duration/track count
        // are the construction parameters, closed-form like the rest
        (6L, "video/mp4", MediaCodec.mp4Bytes(640, 360, durationMs = 2500))
      )
      import s.implicits._
      val df = rows.toDF("id", "kind", "content").repartition(2)
      graft.operators.Multimodal
        .decodeMediaMeta(df, "id", "kind", "content")
        .orderBy(col("id"))
    },

    // ---- REAL video frame sampling: full MP4 sample tables (stts/stsz/
    // stsc/stco/stss) built by the fixture, frames selected per interval
    // at the CONTAINER level (seek-to-previous, tail-inclusive), payloads
    // sliced from mdat. ASCII frame payloads make the output closed-form.
    "video_frame_sample" -> { (s, dir) =>
      import s.implicits._
      import graft.operators.{MediaCodec, Multimodal}
      def frames(vid: Long, n: Int): Seq[Array[Byte]] =
        (0 until n).map(i => s"frame-$i-of-$vid".getBytes("UTF-8"))
      val vids = Seq(
        // 10 frames at 4 fps, keyframe every 3rd
        (6L, MediaCodec.mp4BytesWithSamples(
          640, 360, frames(6L, 10), frameDurMs = 250, syncEvery = 3)),
        // 5 frames at 2.5 fps, all keyframes
        (7L, MediaCodec.mp4BytesWithSamples(
          320, 240, frames(7L, 5), frameDurMs = 400))
      ).toDF("vid", "content").repartition(2)
      def sampled(keyOnly: Boolean, mode: String) = Multimodal
        .sampleVideoFrames(vids, "vid", "content", everyMs = 1000, keyframesOnly = keyOnly)
        .select(
          lit(mode).as("mode"),
          col("id").as("vid"),
          col("frame_idx").cast("bigint").as("frame_idx"),
          col("pts_ms"),
          col("keyframe"),
          col("frame").cast("string").as("payload"))
      sampled(keyOnly = false, "all")
        .unionByName(sampled(keyOnly = true, "key"))
        .orderBy(col("mode"), col("vid"), col("frame_idx"))
    },

    // ---- REAL audio segmentation: PCM WAVs cut into fixed training
    // windows (sample-exact slices re-encoded as standalone WAVs), then
    // RE-DECODED through the metadata decoder — frames, duration, and rms
    // of every segment are closed-form from the constant-amplitude
    // fixtures, and the re-decode proves each segment is a valid WAV.
    "audio_segments" -> { (s, dir) =>
      import s.implicits._
      import graft.operators.{MediaCodec, Multimodal}
      val a1 = MediaCodec.wavBytes(
        Array.tabulate[Short](8000)(i => if (i < 4000) 8192 else 0), 8000)
      val a2 = MediaCodec.wavBytes(Array.fill[Short](2400)(16384), 8000)
      val wavs = Seq((1L, a1), (2L, a2)).toDF("aid", "content").repartition(2)
      val segs = Multimodal
        .sliceAudioSegments(wavs, "aid", "content", everyMs = 250, segmentMs = 250)
        .select((col("id") * 100 + col("seg_idx")).as("id"),
          lit("audio/wav").as("kind"), col("wav").as("content"),
          col("start_ms"), col("frames"))
      val meta = Multimodal.decodeMediaMeta(
        segs.select("id", "kind", "content"), "id", "kind", "content")
        .select(col("id"), col("duration_ms"), col("rms_q"))
      segs.select(col("id").as("sid"), col("start_ms"), col("frames"))
        .join(meta, col("sid") === col("id"))
        .select(col("sid"), col("start_ms"), col("frames"),
          col("duration_ms"), col("rms_q"))
        .orderBy(col("sid"))
    },

    // ---- perceptual image near-dup: REAL decode → dHash → pigeonhole
    // Hamming bands. 9x8 PNGs make every grayGrid cell exactly one pixel,
    // so each dhash bit is a hand-set comparison and the near-dup pairs are
    // closed-form: flat (0) vs one-bright-pixel (1) at hamming 1; full ramp
    // (-1) vs one-flattened-step ramp at hamming 1; across groups >= 60.
    "image_neardup" -> { (s, dir) =>
      import graft.operators.MediaCodec
      def px(vals: Array[Array[Int]]): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(
          9, 8, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        for (y <- 0 until 8; x <- 0 until 9) {
          val v = vals(y)(x); img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        MediaCodec.pngBytes(img)
      }
      val flat = Array.fill(8, 9)(100)
      val flatOne = { val a = Array.fill(8, 9)(100); a(0)(1) = 200; a }
      val ramp = Array.tabulate(8, 9)((_, x) => x * 25)
      val rampOne = { val a = Array.tabulate(8, 9)((_, x) => x * 25); a(7)(5) = a(7)(4); a }
      import s.implicits._
      val df = Seq((1L, px(flat)), (2L, px(flatOne)), (3L, px(ramp)), (4L, px(rampOne)))
        .toDF("id", "content")
        .withColumn("kind", lit("image/png"))
        .repartition(2)
      val meta = graft.operators.Multimodal.decodeMediaMeta(df, "id", "kind", "content")
      Dedup.dhashDups(meta.select(col("id"), col("dhash")), "id", "dhash",
          maxHamming = 3, bands = 4)
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- stream-stream interval join (SURVEY §2.4 #46), run in batch mode
    // over the same expressions (EliminateEventTimeWatermark drops the
    // watermark nodes on batch inputs): lineitems shipped within 30 days of
    // their order's date.
    "interval_join" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey"), col("o_orderdate"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      graft.streaming.StreamingOps
        .intervalJoin(
          o, l,
          leftWatermark = ("o_orderdate", "1 day"),
          rightWatermark = ("l_shipdate", "1 day"),
          keys = Seq(("o_orderkey", "l_orderkey")),
          range = col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS")
        )
        .select(col("o_orderkey"), col("l_linenumber"), col("l_shipdate"))
        .orderBy(col("o_orderkey"), col("l_linenumber"))
    },

    // ---- windowed agg over a joined stream (SURVEY §2.4 #47): tumbling
    // 1-day windows over the interval join's output.
    "window_join_agg" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_orderdate"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"), col("l_quantity"))
      val joined = graft.streaming.StreamingOps.intervalJoin(
        o, l,
        leftWatermark = ("o_orderdate", "1 day"),
        rightWatermark = ("l_shipdate", "1 day"),
        keys = Seq(("o_orderkey", "l_orderkey")),
        range = col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS")
      )
      graft.streaming.StreamingOps
        .tumblingWindowAgg(
          joined, "l_shipdate", "1 day", watermarkDelay = "",
          keys = Seq(),
          aggs = Seq(
            count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("qty"))
        )
        .select(col("window.start").as("wstart"), col("n"), col("qty"))
        .orderBy(col("wstart"))
    },

    // ---- streaming top-N with retractions (SURVEY §2.4 #49): two
    // micro-batches of a leaderboard (top-5 users by max event value), the
    // second CDC-diffed against the first's ledger.
    "topn_retractions" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir).select(col("user_id"), col("value"), col("event_id"))
      def state(df: DataFrame): DataFrame =
        df.groupBy("user_id").agg(max(col("value")).as("score"))
      val order = Seq(col("score").desc, col("user_id").asc)
      val d1 = graft.streaming.StreamingOps
        .topNRetractions(None, state(ev.filter(col("event_id") % 2 === 0)), 5, order, Seq("user_id"))
      val ledger1 = d1.withColumn(
        "offset",
        row_number().over(Window.orderBy(col("user_id"), col("op"))).cast("long") - 1)
      val n1 = ledger1.count()
      val d2 = graft.streaming.StreamingOps
        .topNRetractions(Some(ledger1), state(ev), 5, order, Seq("user_id"))
      val ledger2 = d2.withColumn(
        "offset",
        row_number().over(Window.orderBy(col("user_id"), col("op"))).cast("long") + lit(n1 - 1))
      ledger1.select("offset", "op", "user_id", "score", "place")
        .unionByName(ledger2.select("offset", "op", "user_id", "score", "place"))
        .orderBy(col("offset"))
    },

    // ---- watermark propagation (SURVEY §2.4 #50): a two-input derivative's
    // committed watermark is min(inputs' watermarks), clamped monotone.
    "watermark_prop" -> { (s, dir) =>
      import s.implicits._
      val (wm1, wm2) = Fixtures.cached(s"watermark_prop|$dir") {
        def ts(iso: String) = new java.sql.Timestamp(java.time.Instant.parse(iso).toEpochMilli)
        val work = java.nio.file.Files.createTempDirectory("graft-wmprop-")
        val a = Dataset.create(s, work.resolve("a"), "a")
        val b = Dataset.create(s, work.resolve("b"), "b")
        IngestWriter.writeBatch(a, Seq((ts("2024-01-10T00:00:00Z"), 1L)).toDF("event_time", "v"),
          MergeStrategy.Append(), systemTime = 1000L)
        IngestWriter.writeBatch(b, Seq((ts("2024-01-07T00:00:00Z"), 2L)).toDF("event_time", "v"),
          MergeStrategy.Append(), systemTime = 1000L)
        val deriv = Dataset.create(s, work.resolve("d"), "d", kind = "derivative")
        TransformService.setTransform(deriv, Seq("a", "b"),
          Seq(SqlStep(None,
            "SELECT op, event_time, v FROM a UNION ALL SELECT op, event_time, v FROM b")), 0L)
        val resolve = (n: String) => Dataset.open(s, work.resolve(n))
        TransformService.executeTransform(deriv, resolve, systemTime = 2000L)
        val w1 = deriv.chain.watermark().get
        IngestWriter.writeBatch(b, Seq((ts("2024-01-15T00:00:00Z"), 3L)).toDF("event_time", "v"),
          MergeStrategy.Append(), systemTime = 3000L)
        TransformService.executeTransform(deriv, resolve, systemTime = 4000L)
        (w1, deriv.chain.watermark().get)
      }
      Seq(("run1", new java.sql.Timestamp(wm1)), ("run2", new java.sql.Timestamp(wm2)))
        .toDF("run", "watermark").orderBy("run")
    },

    // ---- verification (SURVEY §2.5 #53) as a tamper matrix: a clean
    // dataset verifies empty; each kind of corruption yields exactly the
    // named issue class.
    "verification_tamper" -> { (s, dir) =>
      import s.implicits._
      import scala.jdk.CollectionConverters._
      import graft.maintenance.Maintenance
      def build(): Dataset = {
        val root = java.nio.file.Files.createTempDirectory("graft-vtam-")
        val ds = Dataset.create(s, root, "vt")
        IngestWriter.writeBatch(ds, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
          MergeStrategy.Append(), 1000L)
        IngestWriter.writeBatch(ds, Seq((3L, "c")).toDF("id", "v"),
          MergeStrategy.Append(), 2000L)
        ds
      }
      def kinds(is: Seq[Maintenance.Issue]): String =
        is.map(_.getClass.getSimpleName).distinct.sorted.mkString(",")

      // build + tamper are fixture work (cached); the four verify scans —
      // the operator under test — stay in the timed region
      val (cleanRoot, flippedRoot, editedRoot, missingRoot) =
        Fixtures.cached(s"verification_tamper|$dir") {
          // chain paths are Hadoop-FS; the fixtures are local, so tamper
          // through java.nio via the URI
          def local(p: org.apache.hadoop.fs.Path) = java.nio.file.Paths.get(p.toUri)

          val clean = build()

          val flipped = build()
          val sliceFile = local(flipped.chain.dataFile(flipped.chain.slices().head.physicalHash))
          val bytes = java.nio.file.Files.readAllBytes(sliceFile)
          bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0xFF).toByte
          java.nio.file.Files.write(sliceFile, bytes)

          val edited = build()
          val bf = local(edited.chain.blockFiles().last)
          java.nio.file.Files.writeString(bf, java.nio.file.Files.readString(bf) + " ")

          val missing = build()
          java.nio.file.Files.delete(
            local(missing.chain.dataFile(missing.chain.slices().head.physicalHash)))

          (clean.chain.root.toString, flipped.chain.root.toString,
            edited.chain.root.toString, missing.chain.root.toString)
        }

      val r0 = Maintenance.verify(Dataset.open(s, cleanRoot))
      val r1 = Maintenance.verify(Dataset.open(s, flippedRoot))
      val r2 = Maintenance.verify(Dataset.open(s, editedRoot))
      val r3 = Maintenance.verify(Dataset.open(s, missingRoot))

      Seq(
        ("block_edit", r2.size.toLong, kinds(r2)),
        ("clean", r0.size.toLong, kinds(r0)),
        ("missing_data", r3.size.toLong, kinds(r3)),
        ("slice_flip", r1.size.toLong, kinds(r1))
      ).toDF("tamper_case", "n_issues", "kind").orderBy("tamper_case")
    },

    // ---- response encoders (SURVEY §2.1 #19): a page encoded as JSON-AoS
    // and CSV strings, parsed back — both must round-trip exactly.
    "response_encoders" -> { (s, dir) =>
      import s.implicits._
      val page = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .limit(5)
      val ddl = "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
      val jsonStr = graft.operators.Export.jsonAoS(page)
      val csvStr = graft.operators.Export.csvString(page)
      val fromJson = s.read.schema(ddl).json(Seq(jsonStr).toDS())
      val fromCsv = s.read.option("header", "true").schema(ddl)
        .csv(csvStr.linesIterator.toSeq.toDS())
      fromJson.withColumn("enc", lit("json"))
        .unionByName(fromCsv.withColumn("enc", lit("csv")))
        .orderBy(col("enc"), col("o_orderkey"))
    },

    // ---- reset (SURVEY §2.5 #55): rewind to the head after batch 2; the
    // third batch's rows and blocks are gone.
    // ---- lineage / provenance (provenance_service.rs:17, kamu inspect
    // lineage): a diamond-ish graph — two roots, a mid derivative, a leaf
    // reading both the mid and a root — queried as an edge list with depths.
    "lineage" -> { (s, dir) =>
      val work = Fixtures.cached(s"lineage|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-lineage-")
        Dataset.create(s, work.resolve("cities"), "cities")
        Dataset.create(s, work.resolve("weather"), "weather")
        val x10 = Dataset.create(s, work.resolve("cities_x10"), "cities_x10", kind = "derivative")
        TransformService.setTransform(x10, inputs = Seq("cities"),
          steps = Seq(SqlStep(None, "SELECT * FROM cities")), systemTime = 0L)
        val combo = Dataset.create(s, work.resolve("combo"), "combo", kind = "derivative")
        TransformService.setTransform(combo, inputs = Seq("cities_x10", "weather"),
          steps = Seq(SqlStep(None, "SELECT * FROM cities_x10")), systemTime = 0L)
        work
      }
      val byName = Seq("cities", "weather", "cities_x10", "combo")
        .map(n => n -> Dataset.open(s, work.resolve(n))).toMap
      graft.transform.Lineage.toDF(s, byName("combo"), byName(_))
    },

    // ---- workspace metadata search (kamu search, adapter/graphql/src/
    // queries/search.rs): substring hits over names/descriptions/schemas/
    // licenses of a fixed two-dataset workspace.
    "workspace_search" -> { (s, dir) =>
      import s.implicits._
      val work = Fixtures.cached(s"workspace_search|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-wsearch-")
        val cities = Dataset.create(s, work.resolve("cities"), "cities")
        cities.chain.append(graft.model.MetadataEvent.SetInfo(
          "Population of world cities, updated monthly"), 1L)
        cities.chain.append(graft.model.MetadataEvent.SetDataSchema(
          "city STRING, population INT"), 2L)
        val trades = Dataset.create(s, work.resolve("trades"), "trades", kind = "derivative")
        trades.chain.append(graft.model.MetadataEvent.SetLicense("ODC-BY", None), 1L)
        work
      }
      val datasets = Seq("cities", "trades")
        .map(n => n -> Dataset.open(s, work.resolve(n))).toMap
      graft.query.Search.search(datasets, "population")
        .map(h => (h.dataset, h.field, h.snippet))
        .toDF("dataset", "field", "snippet")
        .orderBy("dataset", "field")
    },

    // ---- webhook RFC 9421 signing (webhook_signer_impl.rs:125-184): the
    // full header construction for a fixed payload/secret/timestamp —
    // independently recomputed in the oracle via DuckDB VALUES (goldens from
    // python hmac/hashlib).
    "webhook_signing" -> { (s, dir) =>
      import s.implicits._
      val payload = graft.adapter.Webhooks
        .refUpdatedPayload("cities", "abc123", Some("def456")).getBytes("UTF-8")
      val (sig, sigInput, digest) = graft.adapter.Webhooks.rfc9421Headers(
        "oracle-secret", 1700000000000L, payload,
        java.net.URI.create("http://node.example:8080/hook"))
      Seq((new String(payload, "UTF-8"), digest, sig, sigInput))
        .toDF("payload", "content_digest", "signature", "signature_input")
    },

    // ---- flow-lite cron schedules (flow-system schedules subset): exact
    // next-fire instants for representative expressions, UTC.
    "flow_schedule" -> { (s, dir) =>
      import s.implicits._
      import graft.flow.FlowService
      def t(iso: String) = java.time.Instant.parse(iso).toEpochMilli
      def nxt(expr: String, after: String): java.sql.Timestamp =
        new java.sql.Timestamp(FlowService.Cron(expr).nextAfter(t(after)))
      Seq(
        ("0 9 * * *", "2024-01-01T08:59:00Z", nxt("0 9 * * *", "2024-01-01T08:59:00Z")),
        ("0 9 * * *", "2024-01-01T09:00:00Z", nxt("0 9 * * *", "2024-01-01T09:00:00Z")),
        ("30 6 * * 1", "2024-01-01T06:30:00Z", nxt("30 6 * * 1", "2024-01-01T06:30:00Z")),
        ("*/20 * * * *", "2024-01-01T00:59:00Z", nxt("*/20 * * * *", "2024-01-01T00:59:00Z")),
        ("0 0,12 1-15 * *", "2024-01-15T12:00:00Z", nxt("0 0,12 1-15 * *", "2024-01-15T12:00:00Z"))
      ).toDF("expr", "after", "next_fire").orderBy("expr", "after")
    },

    // ---- reactive/batching rules (batching_rule.rs + reactive_rule.rs):
    // a buffer:3:1h derivative trigger driven through five executor ticks —
    // upstream commits accumulate, the rule fires at min-records, retracts
    // when up to date, and fires a lone record once the batching deadline
    // passes. The emitted rows are the tick-by-tick decision log.
    "flow_reactive" -> { (s, dir) =>
      import s.implicits._
      import graft.flow.FlowService
      def t(iso: String) = java.time.Instant.parse(iso).toEpochMilli
      val root = java.nio.file.Files.createTempDirectory("graft-flowreactive-")
      val cities = graft.dataset.Dataset.create(s, root.resolve("cities"), "cities")
      cities.chain.append(
        graft.model.MetadataEvent.SetPollingSource(
          readFormat = "csv", schemaDdl = Some("city STRING, pop INT"),
          merge = graft.model.MergeConf("ledger", primaryKey = Seq("city")),
          fetch = Some(graft.model.MetadataEvent.FetchConf(kind = "filesGlob",
            glob = Some(root.resolve("c-*.csv").toString),
            eventTimeRegex = Some("c-(\\d{4}-\\d{2}-\\d{2})\\.csv")))), 0L)
      val big = graft.dataset.Dataset.create(
        s, root.resolve("cities_big"), "cities_big", kind = "derivative")
      graft.transform.TransformService.setTransform(big, Seq("cities"),
        Seq(graft.model.MetadataEvent.SqlStep(None,
          "SELECT op, event_time, city, pop * 2 AS pop FROM cities")), 0L)
      val reg = new FlowService.Registry(
        new org.apache.hadoop.fs.Path(root.toUri), s.sparkContext.hadoopConfiguration)
      reg.setReactiveRule("cities_big", FlowService.parseReactiveRule("buffer:3:1h"))
      val resolve = (n: String) => graft.dataset.Dataset.open(s, root.resolve(n))
      def ingest(day: String, row: String, at: Long): Unit = {
        java.nio.file.Files.writeString(root.resolve(s"c-$day.csv"), s"city,pop\n$row\n")
        require(graft.ingest.IngestWriter.pollOnce(resolve("cities"), at).isDefined)
      }
      val t0 = t("2024-03-01T00:00:00Z")
      ingest("2024-03-01", "nola,364000", t0)
      val ticks = Seq(
        t0 + 60000L -> { () => ingest("2024-03-02", "kyiv,2884000", t0 + 600000L) },
        t0 + 660000L -> { () => ingest("2024-03-03", "lima,9752000", t0 + 1200000L) },
        t0 + 1260000L -> { () => () },
        t0 + 1320000L -> { () => ingest("2024-03-04", "oslo,709000", t0 + 7200000L) },
        t0 + 7260000L -> { () => () },
        t0 + 7200000L + 3600000L -> { () => () }
      )
      val log = ticks.map { case (at, after) =>
        val Seq(("cities_big", status)) = FlowService.runDue(s, reg, resolve, at): @unchecked
        after()
        (new java.sql.Timestamp(at), status.render)
      }
      val downstream = resolve("cities_big").chain.lastOffset().getOrElse(-1L)
      log.toDF("tick", "decision")
        .withColumn("downstream_last_offset", lit(downstream))
        .orderBy("tick")
    },

    // ---- HTTP sync (simple_transfer_protocol.rs over the REST sync
    // endpoints): serve the 3-batch orders dataset from a node, pull it over
    // http into a fresh workspace — chain hash-identical, history matches
    // the same oracle as the FS sync_roundtrip.
    "http_sync_roundtrip" -> { (s, dir) =>
      val pulledRoot = Fixtures.cached(s"http_sync_roundtrip|$dir") {
        val srcRoot = Fixtures.cached(s"http_sync_src|$dir")(buildOrdersDataset(s, dir))
        val src = Dataset.open(s, srcRoot)
        val served = Map(src.name -> src)
        val srv = new graft.adapter.RestServer(
          new QueryService(s, served), served).start()
        try {
          val work = java.nio.file.Files.createTempDirectory("graft-hsync-rt-")
          val local = new org.apache.hadoop.fs.Path(work.resolve("orders_ds").toUri)
          val conf = s.sparkContext.hadoopConfiguration
          graft.sync.HttpSync.pull(
            s"http://127.0.0.1:${srv.boundPort}", src.name, local, conf) match {
            case u: graft.sync.SyncService.Updated =>
              require(u.dataFilesCopied == 3, s"expected 3 slices over http: $u")
            case other => throw new IllegalStateException(s"http pull: $other")
          }
          val pulled = graft.chain.MetadataChain.open(local, conf)
          require(pulled.blockHashes() == src.chain.blockHashes(),
            "pulled chain must be hash-identical to the served one")
          require(graft.sync.HttpSync.status(
            s"http://127.0.0.1:${srv.boundPort}", src.name, local, conf)
            == graft.sync.SyncService.Equal)
          local.toString
        } finally srv.stop()
      }
      Dataset.open(s, pulledRoot).toDF().orderBy(col("offset"))
    },

    // ---- HTTP push (the write half of the simple transfer protocol,
    // simple_transfer_protocol.rs:251-352): push a local dataset INTO a
    // served node (create + stage + negotiated delta + fast-forward head
    // commit), then read it back FROM the node's workspace — chain
    // hash-identical, same oracle as the pull direction.
    "http_push_roundtrip" -> { (s, dir) =>
      val nodeRoot = Fixtures.cached(s"http_push_roundtrip|$dir") {
        val srcRoot = Fixtures.cached(s"http_sync_src|$dir")(buildOrdersDataset(s, dir))
        val src = Dataset.open(s, srcRoot)
        val nodeWs = java.nio.file.Files.createTempDirectory("graft-hpush-node-")
        val qs = new QueryService(s, Map.empty)
        val srv = new graft.adapter.RestServer(
          qs, Map.empty, workspaceRoot = Some(nodeWs.toString)).start()
        try {
          val conf = s.sparkContext.hadoopConfiguration
          val base = s"http://127.0.0.1:${srv.boundPort}"
          graft.sync.HttpSync.push(base, src.name, src.chain.root, conf) match {
            case u: graft.sync.SyncService.Updated =>
              require(u.dataFilesCopied == 3, s"expected 3 slices pushed over http: $u")
            case other => throw new IllegalStateException(s"http push: $other")
          }
          // a second push negotiates to nothing
          require(graft.sync.HttpSync.push(base, src.name, src.chain.root, conf)
            == graft.sync.SyncService.UpToDate, "re-push must be UpToDate")
          val node = graft.chain.MetadataChain.open(
            new org.apache.hadoop.fs.Path(nodeWs.resolve(src.name).toUri), conf)
          require(node.blockHashes() == src.chain.blockHashes(),
            "pushed chain must be hash-identical to the local one")
          nodeWs.resolve(src.name).toString
        } finally srv.stop()
      }
      Dataset.open(s, nodeRoot).toDF().orderBy(col("offset"))
    },

    // ---- smart transfer protocol (smart_protocol/axum_server_push_protocol
    // .rs:182-577, axum_server_pull_protocol.rs:108-348, messages.rs): the
    // WebSocket-negotiated node-to-node sync. Push the fixture dataset into
    // an empty node over WS (CAS + metadata tar.gz batch + HttpUpload
    // strategies + validated commit), then pull it back into a fresh
    // workspace over WS (transfer plan + batch + HttpDownload strategies).
    // The pulled chain is hash-identical; same oracle as the simple-protocol
    // round trips.
    "smart_sync_roundtrip" -> { (s, dir) =>
      val pulledRoot = Fixtures.cached(s"smart_sync_roundtrip|$dir") {
        val srcRoot = Fixtures.cached(s"http_sync_src|$dir")(buildOrdersDataset(s, dir))
        val src = Dataset.open(s, srcRoot)
        val nodeWs = java.nio.file.Files.createTempDirectory("graft-smart-node-")
        val rest = new graft.adapter.RestServer(
          new QueryService(s, Map.empty), Map.empty,
          workspaceRoot = Some(nodeWs.toString)).start()
        val smart = new graft.sync.SmartTransferServer(rest).start()
        try {
          val conf = s.sparkContext.hadoopConfiguration
          val base = s"ws://127.0.0.1:${smart.boundPort}"
          graft.sync.SmartSync.push(base, src.name, src.chain.root, conf) match {
            case u: graft.sync.SyncService.Updated =>
              require(u.dataFilesCopied == 3, s"expected 3 slices pushed over ws: $u")
            case other => throw new IllegalStateException(s"smart push: $other")
          }
          require(graft.sync.SmartSync.push(base, src.name, src.chain.root, conf)
            == graft.sync.SyncService.UpToDate, "re-push must be UpToDate")
          val work = java.nio.file.Files.createTempDirectory("graft-smart-rt-")
          val local = new org.apache.hadoop.fs.Path(work.resolve("orders_ds").toUri)
          graft.sync.SmartSync.pull(base, src.name, local, conf) match {
            case u: graft.sync.SyncService.Updated =>
              require(u.dataFilesCopied == 3, s"expected 3 slices pulled over ws: $u")
            case other => throw new IllegalStateException(s"smart pull: $other")
          }
          require(graft.sync.SmartSync.status(base, src.name, local, conf)
            == graft.sync.SyncService.Equal, "post-pull status must be Equal")
          val pulled = graft.chain.MetadataChain.open(local, conf)
          require(pulled.blockHashes() == src.chain.blockHashes(),
            "pulled chain must be hash-identical to the pushed one")
          local.toString
        } finally { smart.stop(); rest.stop() }
      }
      Dataset.open(s, pulledRoot).toDF().orderBy(col("offset"))
    },

    // ---- dataset sync (sync_service.rs:25, simple_transfer_protocol.rs):
    // push two commits to a "remote" repo dir, commit a third locally, push
    // again (the delta must be exactly 1 block + 1 data file), then pull
    // into a fresh workspace — the pulled chain is hash-identical and its
    // full history matches the oracle.
    "sync_roundtrip" -> { (s, dir) =>
      val pulledRoot = Fixtures.cached(s"sync_roundtrip|$dir") {
        import graft.sync.SyncService
        val base = t(s, dir, "orders").select(
          col("o_orderdate").as("event_time"),
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val work = java.nio.file.Files.createTempDirectory("graft-sync-rt-")
        val ds = Dataset.create(s, work.resolve("src"), "orders_ds")
        val conf = s.sparkContext.hadoopConfiguration
        val remote = new org.apache.hadoop.fs.Path(
          work.resolve("remote").resolve("orders_ds").toUri)
        val times = Seq("2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z", "2024-01-03T00:00:00Z")
        def commit(g: Int): Unit = IngestWriter.writeBatch(
          ds, base.filter(col("o_orderkey") % 3 === g), MergeStrategy.Append(),
          java.time.Instant.parse(times(g)).toEpochMilli)
        commit(0); commit(1)
        SyncService.sync(ds.chain.root, remote, conf) match {
          case u: SyncService.Updated => require(u.dataFilesCopied == 2, s"full push: $u")
          case other                  => throw new IllegalStateException(s"push 1: $other")
        }
        commit(2)
        SyncService.sync(ds.chain.root, remote, conf, verify = true) match {
          case u: SyncService.Updated =>
            require(u.numBlocks == 1 && u.dataFilesCopied == 1,
              s"incremental push must move only the delta: $u")
          case other => throw new IllegalStateException(s"push 2: $other")
        }
        val dstRoot = new org.apache.hadoop.fs.Path(
          work.resolve("ws2").resolve("orders_ds").toUri)
        SyncService.sync(remote, dstRoot, conf, verify = true)
        val pulled = graft.chain.MetadataChain.open(dstRoot, conf)
        require(pulled.blockHashes() == ds.chain.blockHashes(),
          "pulled chain must be hash-identical to the source")
        require(SyncService.compare(ds.chain, pulled) == SyncService.Equal)
        dstRoot.toString
      }
      Dataset.open(s, pulledRoot).toDF().orderBy(col("offset"))
    },

    "reset" -> { (s, dir) =>
      val root = Fixtures.cached(s"reset|$dir") {
        val base = t(s, dir, "orders").select(
          col("o_orderdate").as("event_time"),
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val root = java.nio.file.Files.createTempDirectory("graft-reset-")
        val ds = Dataset.create(s, root, "orders_reset")
        val times = Seq("2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z", "2024-01-03T00:00:00Z")
        var headAfter2: String = null
        for (g <- 0 until 3) {
          IngestWriter.writeBatch(ds, base.filter(col("o_orderkey") % 3 === g),
            MergeStrategy.Append(), java.time.Instant.parse(times(g)).toEpochMilli)
          if (g == 1) headAfter2 = ds.chain.head.get._2
        }
        ds.chain.reset(headAfter2)
        root
      }
      Dataset.open(s, root).toDF().orderBy(col("offset"))
    },

    // ---- push ingest over REST (SURVEY §2.5 #56): two POSTs through a named
    // AddPushSource with ledger merge; the duplicate key is dropped.
    "push_ingest_rest" -> { (s, dir) =>
      val work = Fixtures.cached(s"push_ingest_rest|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-pushrest-")
        val ds = Dataset.create(s, work.resolve("ds"), "pushed")
        ds.chain.append(
          AddPushSource("api", readFormat = "ndjson", schemaDdl = Some("id BIGINT, v STRING"),
            merge = MergeConf("ledger", primaryKey = Seq("id"))), 0L)
        val qs = new QueryService(s, Map("pushed" -> ds))
        val srv = new graft.adapter.RestServer(qs, Map("pushed" -> ds)).start()
        try {
          val client = java.net.http.HttpClient.newHttpClient()
          def post(body: String): Unit = {
            val req = java.net.http.HttpRequest
              .newBuilder(java.net.URI.create(
                s"http://127.0.0.1:${srv.boundPort}/datasets/pushed/ingest?source=api"))
              .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
            val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
            require(resp.statusCode() == 200, s"push ingest failed: ${resp.body()}")
          }
          post("{\"id\":1,\"v\":\"a\"}\n{\"id\":2,\"v\":\"b\"}\n")
          post("{\"id\":2,\"v\":\"dup\"}\n{\"id\":3,\"v\":\"c\"}\n")
        } finally srv.stop()
        work
      }
      Dataset.open(s, work.resolve("ds")).toDF()
        .select("offset", "op", "id", "v").orderBy(col("offset"))
    },

    // ---- prep: decompress (SURVEY §2.1 #15): gzip'd CSV through the
    // polling-source prep pipeline.
    "ingest_decompress" -> { (s, dir) =>
      val work = Fixtures.cached(s"ingest_decompress|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-gz-")
        val gz = work.resolve("cities.csv.gz")
        val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(gz))
        out.write("city,population\nvancouver,675000\nseattle,733000\n".getBytes("UTF-8"))
        out.close()
        val ds = Dataset.create(s, work.resolve("ds"), "gzcities")
        ds.chain.append(
          SetPollingSource(readFormat = "csv", schemaDdl = Some("city STRING, population INT"),
            merge = MergeConf("append"),
            prep = Some(Seq(PrepConf("decompress", format = Some("gzip"))))), 0L)
        IngestWriter.ingestFile(ds, gz.toString,
          java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli)
        work
      }
      Dataset.open(s, work.resolve("ds")).toDF().orderBy(col("offset"))
    },

    // ---- prep: pipe (SURVEY §2.1 #16): payload piped through `tr` before
    // the reader sees it.
    "ingest_pipe" -> { (s, dir) =>
      val work = Fixtures.cached(s"ingest_pipe|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-pipe-")
        val src = work.resolve("cities.csv")
        java.nio.file.Files.writeString(src, "city,population\nvancouver,675000\nseattle,733000\n")
        val ds = Dataset.create(s, work.resolve("ds"), "pipecities")
        ds.chain.append(
          SetPollingSource(readFormat = "csv", schemaDdl = Some("city STRING, population INT"),
            merge = MergeConf("append"),
            prep = Some(Seq(PrepConf("pipe", command = Some(Seq("tr", "a-z", "A-Z")))))), 0L)
        IngestWriter.ingestFile(ds, src.toString,
          java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli)
        work
      }
      Dataset.open(s, work.resolve("ds")).toDF().orderBy(col("offset"))
    },

    // ---- recursive pull (pull_command.rs, pull_request_planner_impl.rs):
    // a depth-2 dependency chain — polling root -> x10 transform -> +5
    // transform — driven ONLY by TransformService.pullRecursive on the leaf:
    // each pull polls the root and runs both transforms in dependency order;
    // the third pull is a full-graph no-op.
    "pull_recursive" -> { (s, dir) =>
      val work = Fixtures.cached(s"pull_recursive|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-pull-")
        java.nio.file.Files.writeString(
          work.resolve("cities-2024-01-01.csv"),
          "city,population\nvancouver,675000\nseattle,733000\nkyiv,2884000\n")
        val root = Dataset.create(s, work.resolve("cities"), "cities")
        root.chain.append(
          SetPollingSource(readFormat = "csv",
            schemaDdl = Some("city STRING, population INT"),
            merge = MergeConf("snapshot", primaryKey = Seq("city")),
            fetch = Some(FetchConf(kind = "filesGlob",
              glob = Some(work.resolve("cities-*.csv").toString),
              eventTimeRegex = Some("cities-(\\d{4}-\\d{2}-\\d{2})\\.csv")))), 0L)
        val x10 = Dataset.create(s, work.resolve("cities_x10"), "cities_x10", kind = "derivative")
        TransformService.setTransform(x10, inputs = Seq("cities"),
          steps = Seq(SqlStep(None,
            "SELECT op, event_time, city, population * 10 AS population FROM cities")),
          systemTime = 0L)
        val p5 = Dataset.create(s, work.resolve("cities_p5"), "cities_p5", kind = "derivative")
        TransformService.setTransform(p5, inputs = Seq("cities_x10"),
          steps = Seq(SqlStep(None,
            "SELECT op, event_time, city, population + 5 AS population FROM cities_x10")),
          systemTime = 0L)

        def t(iso: String) = java.time.Instant.parse(iso).toEpochMilli
        val byName = Map(
          "cities" -> work.resolve("cities"),
          "cities_x10" -> work.resolve("cities_x10"),
          "cities_p5" -> work.resolve("cities_p5"))
        val resolve = (n: String) => Dataset.open(s, byName(n))
        def pull(iso: String) =
          TransformService.pullRecursive(Dataset.open(s, byName("cities_p5")), resolve, t(iso))

        val r1 = pull("2024-01-05T00:00:00Z")
        require(r1.map(_._1) == Seq("cities", "cities_x10", "cities_p5"),
          s"pull order must be dependency order: $r1")
        java.nio.file.Files.writeString(
          work.resolve("cities-2024-02-01.csv"),
          "city,population\nvancouver,675000\nseattle,750000\nodessa,1015000\n")
        pull("2024-02-05T00:00:00Z")
        val r3 = pull("2024-03-05T00:00:00Z")
        require(r3.forall {
          case (_, TransformService.RootUpToDate)                         => true
          case (_, TransformService.Derived(TransformService.UpToDate))   => true
          case _                                                          => false
        }, s"third pull must be a full-graph no-op: $r3")
        work
      }
      Dataset.open(s, work.resolve("cities_p5")).toDF().orderBy(col("offset"))
    },

    // ---- fetch: filesGlob with event-time-from-path (SURVEY §2.1 #11):
    // two polls; the second sees only the new file, the third is a no-op.
    "fetch_glob" -> { (s, dir) =>
      val work = Fixtures.cached(s"fetch_glob|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-glob-")
        java.nio.file.Files.writeString(work.resolve("data-2024-01-01.csv"), "id,v\n1,a\n")
        java.nio.file.Files.writeString(work.resolve("data-2024-01-02.csv"), "id,v\n2,b\n")
        val ds = Dataset.create(s, work.resolve("ds"), "globds")
        ds.chain.append(
          SetPollingSource(readFormat = "csv", schemaDdl = Some("id BIGINT, v STRING"),
            merge = MergeConf("ledger", primaryKey = Seq("id")),
            fetch = Some(FetchConf(kind = "filesGlob",
              glob = Some(work.resolve("data-*.csv").toString),
              eventTimeRegex = Some("data-(\\d{4}-\\d{2}-\\d{2})\\.csv")))), 0L)
        IngestWriter.pollOnce(ds, java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli)
        java.nio.file.Files.writeString(work.resolve("data-2024-01-03.csv"), "id,v\n3,c\n")
        IngestWriter.pollOnce(ds, java.time.Instant.parse("2024-02-02T00:00:00Z").toEpochMilli)
        require(
          IngestWriter.pollOnce(ds,
            java.time.Instant.parse("2024-02-03T00:00:00Z").toEpochMilli).isEmpty,
          "a poll with no new files must commit nothing")
        work
      }
      Dataset.open(s, work.resolve("ds")).toDF().orderBy(col("offset"))
    },

    // ---- fetch: url with mtime/size caching state (SURVEY §2.1 #10): an
    // unchanged source short-circuits to up-to-date; a changed one re-polls.
    "fetch_url" -> { (s, dir) =>
      val work = Fixtures.cached(s"fetch_url|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-furl-")
        val src = work.resolve("feed.csv")
        java.nio.file.Files.writeString(src, "id,v\n1,a\n2,b\n")
        java.nio.file.Files.setLastModifiedTime(src,
          java.nio.file.attribute.FileTime.fromMillis(1000000L))
        val ds = Dataset.create(s, work.resolve("ds"), "urlds")
        ds.chain.append(
          SetPollingSource(readFormat = "csv", schemaDdl = Some("id BIGINT, v STRING"),
            merge = MergeConf("ledger", primaryKey = Seq("id")),
            fetch = Some(FetchConf(kind = "url", url = Some(src.toString)))), 0L)
        require(IngestWriter.pollOnce(ds,
          java.time.Instant.parse("2024-03-01T00:00:00Z").toEpochMilli).isDefined)
        require(IngestWriter.pollOnce(ds,
          java.time.Instant.parse("2024-03-02T00:00:00Z").toEpochMilli).isEmpty,
          "unchanged mtime+size must short-circuit")
        java.nio.file.Files.writeString(src, "id,v\n1,a\n2,b\n3,c\n")
        java.nio.file.Files.setLastModifiedTime(src,
          java.nio.file.attribute.FileTime.fromMillis(2000000L))
        require(IngestWriter.pollOnce(ds,
          java.time.Instant.parse("2024-03-03T00:00:00Z").toEpochMilli).isDefined)
        work
      }
      Dataset.open(s, work.resolve("ds")).toDF().orderBy(col("offset"))
    },

    // ---- fetch: Container (SURVEY §2.1 #12): exec a deterministic
    // subprocess, consume its stdout as the fetched payload, ledger-merge
    // across two polls (second poll re-emits old rows + one new; the
    // left-anti merge keeps only the new one).
    "fetch_container" -> { (s, dir) =>
      val work = Fixtures.cached(s"fetch_container|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-fcont-")
        val feed = work.resolve("feed.ndjson")
        java.nio.file.Files.writeString(feed, "{\"id\":1,\"v\":\"a\"}\n{\"id\":2,\"v\":\"b\"}\n")
        val ds = Dataset.create(s, work.resolve("ds"), "contds")
        ds.chain.append(
          SetPollingSource(readFormat = "ndjson", schemaDdl = Some("id BIGINT, v STRING"),
            merge = MergeConf("ledger", primaryKey = Seq("id")),
            fetch = Some(FetchConf(kind = "container",
              command = Some(Seq("sh", "-c", s"cat '$feed'"))))), 0L)
        require(IngestWriter.pollOnce(ds,
          java.time.Instant.parse("2024-03-01T00:00:00Z").toEpochMilli).isDefined)
        java.nio.file.Files.writeString(feed,
          "{\"id\":1,\"v\":\"a\"}\n{\"id\":2,\"v\":\"b\"}\n{\"id\":3,\"v\":\"c\"}\n")
        require(IngestWriter.pollOnce(ds,
          java.time.Instant.parse("2024-03-03T00:00:00Z").toEpochMilli).isDefined)
        work
      }
      Dataset.open(s, work.resolve("ds")).toDF().orderBy(col("offset"))
    },

    // ---- to_table resolution (SURVEY §2.3 #37).
    "to_table" -> { (s, dir) =>
      val work = Fixtures.cached(s"to_table|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-tt-")
        java.nio.file.Files.writeString(work.resolve("r1.csv"),
          "city,population\nvancouver,675000\nseattle,733000\nkyiv,2884000\n")
        val ds = Dataset.create(s, work.resolve("ds"), "cities")
        ds.chain.append(
          SetPollingSource(readFormat = "csv", schemaDdl = Some("city STRING, population INT"),
            merge = MergeConf("snapshot", primaryKey = Seq("city"))), 0L)
        IngestWriter.ingestFile(ds, work.resolve("r1.csv").toString,
          java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli)
        work
      }
      val qs = new QueryService(s, Map("cities" -> Dataset.open(s, work.resolve("ds"))))
      qs.toTable("cities").select("city", "population").orderBy("city")
    },

    // ---- schema introspection (SURVEY §2.3 #40): DDL and JSON forms agree;
    // output is the ordered column list.
    "schema_introspect" -> { (s, dir) =>
      import s.implicits._
      val work = Fixtures.cached(s"schema_introspect|$dir") {
        val work = java.nio.file.Files.createTempDirectory("graft-si-")
        java.nio.file.Files.writeString(work.resolve("r1.csv"),
          "city,population\nvancouver,675000\n")
        val ds = Dataset.create(s, work.resolve("ds"), "cities")
        ds.chain.append(
          SetPollingSource(readFormat = "csv", schemaDdl = Some("city STRING, population INT"),
            merge = MergeConf("snapshot", primaryKey = Seq("city"))), 0L)
        IngestWriter.ingestFile(ds, work.resolve("r1.csv").toString,
          java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli)
        work
      }
      val qs = new QueryService(s, Map("cities" -> Dataset.open(s, work.resolve("ds"))))
      val st = org.apache.spark.sql.types.StructType.fromDDL(qs.schemaDdl("cities").get)
      require(
        org.apache.spark.sql.types.DataType.fromJson(qs.schemaJson("cities").get) ==
          org.apache.spark.sql.types.StructType(st.map(_.copy(nullable = true))) ||
          org.apache.spark.sql.types.DataType.fromJson(qs.schemaJson("cities").get) == st,
        "JSON schema form must agree with the DDL form")
      st.fields.zipWithIndex.toSeq
        .map { case (f, i) => (i, f.name, f.dataType.simpleString) }
        .toDF("ordinal", "col_name", "col_type").orderBy("ordinal")
    },

    // ---- fetch: MQTT (SURVEY §2.1 #13): in-process broker, QoS 1 drain,
    // NDJSON batch read back.
    "mqtt_ingest" -> { (s, dir) =>
      val fetchedPath = Fixtures.cached(s"mqtt_ingest|$dir") {
        import graft.ingest.Mqtt
        val msgs = Seq("t" -> "{\"id\":1,\"v\":\"a\"}", "t" -> "{\"id\":2,\"v\":\"b\"}")
        val server = new java.net.ServerSocket(0)
        val th = new Thread(() => {
          val sock = server.accept()
          try {
            val in = new java.io.DataInputStream(
              new java.io.BufferedInputStream(sock.getInputStream))
            val o = new java.io.DataOutputStream(sock.getOutputStream)
            Mqtt.readPacket(in) // CONNECT
            o.write(Mqtt.connackPacket); o.flush()
            Mqtt.readPacket(in) // SUBSCRIBE
            o.write(Mqtt.subackPacket(1, 1)); o.flush()
            msgs.zipWithIndex.foreach { case ((topic, payload), i) =>
              o.write(Mqtt.publishPacketQos1(topic, payload.getBytes("UTF-8"), 100 + i))
            }
            o.flush()
            (1 to msgs.size).foreach(_ => Mqtt.readPacket(in)) // PUBACKs
          } finally sock.close()
        })
        th.setDaemon(true)
        th.start()
        val fetched =
          try graft.ingest.Fetch.mqtt("127.0.0.1", server.getLocalPort, Seq("t"),
            idleTimeoutMs = 2000).get
          finally server.close()
        fetched.path.toString
      }
      graft.ingest.Readers.ndjson(s, fetchedPath, Some("id BIGINT, v STRING"))
        .orderBy("id")
    },

    // ---- fetch: EthereumLogs (SURVEY §2.1 #14): block-range drain with
    // resume state over a deterministic fake transport.
    "eth_logs" -> { (s, dir) =>
      val (p1, p2) = Fixtures.cached(s"eth_logs|$dir") {
        import graft.ingest.EthLogs
        val rpc = new EthLogs.EthRpc {
          override def blockNumber(): Long = 120L
          override def getLogs(from: Long, to: Long, f: EthLogs.LogFilter): Seq[EthLogs.EthLog] =
            (from to to).filter(_ % 10 == 0).map(b =>
              EthLogs.EthLog(b, s"0xtx$b", b % 4, "0xcontract", Seq("0xtopic0"), s"0xdata$b"))
        }
        val filter = EthLogs.LogFilter(fromBlock = Some(0))
        val f1 = EthLogs.fetch(rpc, filter, None, batchBlocks = 50, maxBatches = 1).get
        val f2 = EthLogs.fetch(rpc, filter, f1.sourceState, batchBlocks = 50, maxBatches = 2).get
        require(EthLogs.fetch(rpc, filter, f2.sourceState, 50, 2).isEmpty,
          "a drain past the head must be up-to-date")
        (f1.path.toString, f2.path.toString)
      }
      val ddl = "blockNumber BIGINT, transactionHash STRING, logIndex BIGINT, data STRING"
      graft.ingest.Readers.ndjson(s, p1, Some(ddl))
        .unionByName(graft.ingest.Readers.ndjson(s, p2, Some(ddl)))
        .orderBy(col("blockNumber"))
    }
  )

  // ------------------------------------------------------------- oracle SQL

  /** A tiny 2-record ESRI shapefile (Point + Polygon) with its .dbf sidecar,
    * built byte-by-byte from the public spec — the same fixture the
    * ShapefileSpec uses, here feeding a CORRECTNESS entry. */
  private def writeShapefileFixture(dir: java.nio.file.Path): java.nio.file.Path = {
    import java.nio.{ByteBuffer, ByteOrder}
    val point = {
      val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(0, 1); b.putDouble(4, 30.5); b.putDouble(12, 50.25); b.array()
    }
    val polygon = {
      val n = 4
      val b = ByteBuffer.allocate(44 + 4 + 16 * n).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(0, 5); b.putInt(36, 1); b.putInt(40, n); b.putInt(44, 0)
      val pts = Seq((0.0, 0.0), (4.0, 0.0), (0.0, 3.0), (0.0, 0.0))
      pts.zipWithIndex.foreach { case ((x, y), i) =>
        b.putDouble(48 + i * 16, x); b.putDouble(48 + i * 16 + 8, y)
      }
      b.array()
    }
    val records = Seq(point, polygon)
    val totalWords = (100 + records.map(8 + _.length).sum) / 2
    val out = ByteBuffer.allocate(totalWords * 2)
    out.order(ByteOrder.BIG_ENDIAN); out.putInt(0, 9994); out.putInt(24, totalWords)
    out.order(ByteOrder.LITTLE_ENDIAN); out.putInt(28, 1000); out.putInt(32, 1)
    var pos = 100
    records.zipWithIndex.foreach { case (rec, i) =>
      out.order(ByteOrder.BIG_ENDIAN)
      out.putInt(pos, i + 1); out.putInt(pos + 4, rec.length / 2)
      var j = 0
      while (j < rec.length) { out.put(pos + 8 + j, rec(j)); j += 1 }
      pos += 8 + rec.length
    }
    val shp = dir.resolve("cities.shp")
    java.nio.file.Files.write(shp, out.array())
    // .dbf sidecar: NAME C(10), POP N(8)
    val headerSize = 32 + 2 * 32 + 1
    val recordSize = 1 + 10 + 8
    val total = headerSize + 2 * recordSize + 1
    val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0, 0x03.toByte); b.putInt(4, 2)
    b.putShort(8, headerSize.toShort); b.putShort(10, recordSize.toShort)
    def field(off: Int, name: String, typ: Char, len: Int): Unit = {
      name.getBytes.zipWithIndex.foreach { case (c, i) => b.put(off + i, c) }
      b.put(off + 11, typ.toByte); b.put(off + 16, len.toByte)
    }
    field(32, "NAME", 'C', 10); field(64, "POP", 'N', 8)
    b.put(96, 0x0d.toByte)
    def record(off: Int, name: String, pop: String): Unit = {
      b.put(off, ' '.toByte)
      name.padTo(10, ' ').getBytes.zipWithIndex.foreach { case (c, i) => b.put(off + 1 + i, c) }
      pop.reverse.padTo(8, ' ').reverse.getBytes.zipWithIndex.foreach { case (c, i) =>
        b.put(off + 11 + i, c)
      }
    }
    record(headerSize, "kyiv", "2884000")
    record(headerSize + recordSize, "triangle", "7")
    b.put(total - 1, 0x1a.toByte)
    java.nio.file.Files.write(dir.resolve("cities.dbf"), b.array())
    shp
  }

  /** Shared CTE body replicating Dedup.minHashLsh in DuckDB SQL — used by
    * the dedup_minhash oracle and composed further by dedup_pipeline. */
  /** Deterministic dyadic classifier weights (k/1024, k in [-2048, 2048]):
    * exact in double, so per-token sums are order- and engine-independent.
    * The SQL literal prints all 10 fractional digits — 2^-10 is exact
    * there too. */
  private val qcWeights: Seq[Double] =
    (0 until 64).map(i => (((i + 1) * 2654435761L) % 4097L - 2048L) / 1024.0)
  private val qcWeightsSql: String =
    qcWeights.map(w => f"$w%.10f").mkString("[", ", ", "]")

  /** corpus_split oracle: the cumulative boundaries are embedded as the
    * EXACT decimal expansion of the Scala-side doubles (BigDecimal of the
    * bits), so DuckDB parses bit-identical boundary values and the
    * comparison `u < bound` agrees everywhere. */
  private val corpusSplitOracle: String = {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0) { case (a, (_, w)) => a + w / total }.tail
    def d(x: Double) = new java.math.BigDecimal(x).toPlainString
    s"""SELECT doc_id,
       |  CASE WHEN u < ${d(bounds(0))} THEN 'train'
       |       WHEN u < ${d(bounds(1))} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id,
       |  (('0x' || substring(md5('split:7:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       |    % 2147483647) / 2147483647.0 AS u
       |  FROM documents) ORDER BY doc_id""".stripMargin
  }

  private val minhashOracleCtes: String =
    """tok AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |    ELSE [array_to_string(toks[i+1:i+3], ' ') for i in range(len(toks) - 2)] END AS shingles
      |  FROM tok),
      |hv AS (
      |  SELECT doc_id, ('0x' || substring(md5(s), 1, 8))::BIGINT % 2147483647 AS h
      |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
      |sig0 AS (
      |  SELECT doc_id, i,
      |         min(((2654435761 * (i+1) % 2147483647) * h + 40503 * (i+13) % 2147483647) % 2147483647) AS mh
      |  FROM hv CROSS JOIN (SELECT unnest(range(64)) AS i) seeds
      |  GROUP BY doc_id, i),
      |sig AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM sig0 GROUP BY doc_id),
      |banded AS (
      |  SELECT doc_id, b AS band, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey
      |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bands
      |  QUALIFY row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) <= 1000),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      |est AS (
      |  SELECT id_a, id_b,
      |    list_sum([CASE WHEN sa.sig[i+1] = sb.sig[i+1] THEN 1 ELSE 0 END for i in range(64)]) / 64.0 AS est_jaccard
      |  FROM pairs JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b)""".stripMargin

  /** DuckDB list-of-lists literal for an integer plane matrix — the oracle
    * SQL bakes in the exact planes the Spark plan uses, so both engines run
    * the identical (exact-integer) LSH arithmetic. */
  private def planesLit(planes: Seq[Array[Long]]): String =
    planes.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  /** Union-of-3-tables candidates + exact quantized cosine — shared by
    * the ad-hoc and bucketed-layout multi-table entries. */
  private val annLshMultitableOracle: String = {
      val tbl = (0 until 3).map(t => planesLit(
        graft.operators.Similarity.intPlanes(numPlanes = 6, dim = 64, seed = 42L + t)))
        .mkString("[", ",", "]")
      s"""WITH p AS (SELECT $tbl AS tbl),
         |q AS (SELECT vec_id AS qid, list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x*1000) AS BIGINT)) AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS cid, list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x*1000) AS BIGINT)) AS cv
         |      FROM embeddings),
         |qb AS (SELECT qid, t,
         |  list_sum([CASE WHEN list_dot_product(CAST(qv AS DOUBLE[]), CAST(tbl[t+1][i+1] AS DOUBLE[])) > 0 THEN 1<<i ELSE 0 END for i in range(6)]) AS bucket
         |  FROM q CROSS JOIN p CROSS JOIN (SELECT unnest(range(3)) AS t) ts),
         |cb AS (SELECT cid, t,
         |  list_sum([CASE WHEN list_dot_product(CAST(cv AS DOUBLE[]), CAST(tbl[t+1][i+1] AS DOUBLE[])) > 0 THEN 1<<i ELSE 0 END for i in range(6)]) AS bucket
         |  FROM c CROSS JOIN p CROSS JOIN (SELECT unnest(range(3)) AS t) ts),
         |cand AS (
         |  SELECT DISTINCT qid, cid FROM qb JOIN cb USING (t, bucket) WHERE qid <> cid),
         |scored AS (
         |  SELECT qid, cid,
         |    CASE WHEN sqrt(CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS DOUBLE))
         |            * sqrt(CAST(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)) > 0
         |         THEN CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)
         |            / (sqrt(CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS DOUBLE))
         |             * sqrt(CAST(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)))
         |         ELSE 0.0 END AS cos
         |  FROM cand JOIN q USING (qid) JOIN c USING (cid))
         |SELECT qid, rnk, cid FROM (
         |  SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
         |  FROM scored) WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin
  }

  /** Exhaustive quantized-cosine top-5 — the ground truth for both IVF
    * entries (nprobe = k makes the probe set the full corpus). */
  private val annIvfOracle: String =
    """WITH q AS (SELECT vec_id AS qid, list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x*1000) AS BIGINT)) AS qv
      |      FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS cid, list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x*1000) AS BIGINT)) AS cv
      |      FROM embeddings),
      |scored AS (
      |  SELECT qid, cid,
      |    CASE WHEN sqrt(CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS DOUBLE))
      |            * sqrt(CAST(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)) > 0
      |         THEN CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)
      |            / (sqrt(CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS DOUBLE))
      |             * sqrt(CAST(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)))
      |         ELSE 0.0 END AS cos
      |  FROM q CROSS JOIN c WHERE qid <> cid)
      |SELECT qid, rnk, cid FROM (
      |  SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
      |  FROM scored) WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  /** Unrolled-CTE replica of [[graft.operators.Graph.pageRank]]'s three
    * integer nano-rank iterations (same floor divisions, same damping
    * 85//100); intermediate sums CAST back to BIGINT so DuckDB's
    * HUGEINT sum never changes the arithmetic. */
  private val pagerankOracle: String = {
    def iter(prev: String, c: String, r: String) =
      s"""$c AS (SELECT e.dst,
         |  CAST(sum(CAST(floor(CAST(p.r AS DOUBLE) * CAST(e.w AS DOUBLE)
         |                      / CAST(ow.ow AS DOUBLE)) AS BIGINT)) AS BIGINT) AS cs
         |  FROM edges e JOIN ow ON ow.src = e.src JOIN $prev p ON p.node = e.src
         |  GROUP BY e.dst),
         |$r AS (SELECT nodes.node,
         |  CAST((150000000 // nn.n) + ((COALESCE($c.cs, 0) * 85) // 100) AS BIGINT) AS r
         |  FROM nodes CROSS JOIN nn LEFT JOIN $c ON $c.dst = nodes.node)"""
    s"""WITH seq AS (SELECT user_id, event_type, ts, event_id,
       |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |edges AS (SELECT prev AS src, event_type AS dst, count(*) AS w
       |          FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |ow AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
       |r0 AS (SELECT node, CAST(1000000000 // nn.n AS BIGINT) AS r
       |       FROM nodes CROSS JOIN nn),
       |${iter("r0", "c1", "r1")},
       |${iter("r1", "c2", "r2")},
       |${iter("r2", "c3", "r3")}
       |SELECT node, r AS rank_nano FROM r3 ORDER BY node""".stripMargin
  }

  /** Personalized PageRank oracle: the pagerank unrolled CTEs with the
    * teleport base restricted to the seed set (s = seeds present in the
    * graph; here the single seed 'view'). */
  private val pprOracle: String = {
    def iter(prev: String, c: String, r: String) =
      s"""$c AS (SELECT e.dst,
         |  CAST(sum(CAST(floor(CAST(p.r AS DOUBLE) * CAST(e.w AS DOUBLE)
         |                      / CAST(ow.ow AS DOUBLE)) AS BIGINT)) AS BIGINT) AS cs
         |  FROM edges e JOIN ow ON ow.src = e.src JOIN $prev p ON p.node = e.src
         |  GROUP BY e.dst),
         |$r AS (SELECT nodes.node,
         |  CAST((CASE WHEN nodes.node = 'view' THEN 150000000 ELSE 0 END)
         |       + ((COALESCE($c.cs, 0) * 85) // 100) AS BIGINT) AS r
         |  FROM nodes LEFT JOIN $c ON $c.dst = nodes.node)"""
    s"""WITH seq AS (SELECT user_id, event_type, ts, event_id,
       |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |edges AS (SELECT prev AS src, event_type AS dst, count(*) AS w
       |          FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |ow AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
       |r0 AS (SELECT node,
       |  CAST(CASE WHEN node = 'view' THEN 1000000000 ELSE 0 END AS BIGINT) AS r
       |  FROM nodes),
       |${iter("r0", "c1", "r1")},
       |${iter("r1", "c2", "r2")},
       |${iter("r2", "c3", "r3")}
       |SELECT node, r AS rank_nano FROM r3 ORDER BY node""".stripMargin
  }

  /** Shared by anomaly_events and anomaly_events_stream: the streaming
    * twin's immediate verdicts are pinned identical to the batch sweep's
    * trailing-window z-scores on ordered replays. */
  private val anomalyOracle: String =
    """WITH w AS (SELECT user_id, ts, event_id, value,
      |                  CAST(floor(value * 1000000.0) AS BIGINT) AS vm
      |           FROM events),
      |t AS (SELECT user_id, ts, event_id, value, vm,
      |             count(vm)    OVER win AS n,
      |             sum(vm)      OVER win AS s1,
      |             sum(vm * vm) OVER win AS s2
      |      FROM w
      |      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
      |m AS (SELECT user_id, ts, event_id, value, vm, n,
      |             CAST(s1 AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE) AS mean,
      |             CAST(s2 AS DOUBLE) / 1000000000000.0 / CAST(n AS DOUBLE) AS ex2
      |      FROM t WHERE n >= 8),
      |v AS (SELECT user_id, ts, event_id, value, vm, n, mean,
      |             (ex2 - mean * mean) * CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0) AS varr
      |      FROM m),
      |z AS (SELECT user_id, ts, event_id, value,
      |             CAST(floor((CAST(vm AS DOUBLE) / 1000000.0 - mean) / sqrt(varr)
      |                        * 1000000.0) AS BIGINT) AS z_micro
      |      FROM v WHERE varr > 0.0)
      |SELECT user_id, ts, event_id, value, z_micro FROM z
      |WHERE abs(z_micro) > 2000000
      |ORDER BY user_id, ts, event_id""".stripMargin

  /** Shared by sessionize and sessionize_stream: the streaming twin's
    * finalized sessions are pinned identical to the batch lag/cut/
    * running-sum construction on ordered replays. */
  private val sessionizeOracle: String =
    """WITH g AS (SELECT user_id, ts, event_id, value,
      |                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |           FROM events),
      |f AS (SELECT user_id, ts, event_id, value,
      |             CASE WHEN prev IS NULL
      |                    OR epoch_us(ts) - epoch_us(prev) > 1800000000
      |                  THEN 1 ELSE 0 END AS cut
      |      FROM g),
      |s AS (SELECT user_id, ts, value,
      |             CAST(sum(cut) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |      FROM f)
      |SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Histogram quantiles: exact integer bucket counts, ceil(p·total) rank
    * rule, lower-edge estimate. Shared by the fresh-sketch and
    * maintained-table entries — additive counts make them identical. */
  private val histOracle: String =
    """WITH hist AS (SELECT CAST(floor(value / 8.0) AS BIGINT) AS bucket, count(*) AS n
      |              FROM events WHERE value IS NOT NULL GROUP BY 1),
      |c AS (SELECT bucket, n,
      |             sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum,
      |             sum(n) OVER () AS total
      |      FROM hist),
      |ps AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p)
      |SELECT ps.p AS p, min(c.bucket) AS bucket,
      |       CAST(min(c.bucket) AS DOUBLE) * 8.0 AS q_est
      |FROM ps JOIN c ON c.cum >= CAST(ceil(ps.p * CAST(c.total AS DOUBLE)) AS BIGINT)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared by kmv_distinct and kmv_distinct_merge: KMV merge is exact, so
    * both paths must reproduce this from-scratch recomputation. Same
    * portable 60-bit hash (15 hex chars of md5, positive in signed-64). */
  private val kmvOracle: String =
    """WITH h AS (SELECT DISTINCT event_type,
      |  ('0x' || substring(md5('kmv:' || CAST(user_id AS VARCHAR) || ':'
      |                         || strftime(ts, '%Y-%m-%d')), 1, 15))::BIGINT AS h
      |           FROM events),
      |r AS (SELECT event_type, h,
      |             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      |      FROM h)
      |SELECT event_type, count(*) AS n_kept, max(h) AS kth_hash,
      |       CASE WHEN count(*) < 128 THEN CAST(count(*) AS DOUBLE)
      |            ELSE 127.0 * 1152921504606846976.0 / CAST(max(h) AS DOUBLE)
      |       END AS distinct_est
      |FROM r WHERE rn <= 128
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Shared by the three rank_sketch_* entries: the hash-subsample filter
    * (h % 2^4 == 0) is order-free and merge re-filters to the max level,
    * so build, merge-of-mixed-levels, and maintained-table paths all
    * reproduce this from-scratch level-4 recomputation exactly. */
  private val rankSketchOracle: String =
    """WITH f AS (SELECT value, CAST(event_id AS VARCHAR) AS tie FROM events
      |           WHERE value IS NOT NULL AND event_id IS NOT NULL),
      |tot AS (SELECT count(*) AS nt FROM f),
      |samp AS (SELECT value, tie,
      |           row_number() OVER (ORDER BY value, tie) AS i
      |         FROM f
      |         WHERE ('0x' || substring(md5('rk:' || tie), 1, 15))::BIGINT % 16 = 0),
      |phis AS (SELECT CAST(unnest([250000, 500000, 750000, 900000]) AS BIGINT) AS phi_micro)
      |SELECT phi_micro, CAST(nt AS BIGINT) AS n_total,
      |       count(*) AS sample_size,
      |       coalesce(
      |         min(CASE WHEN i * 16 >= greatest(1, (phi_micro * nt) // 1000000)
      |                  THEN value END),
      |         max(value)) AS q_est
      |FROM phis CROSS JOIN tot CROSS JOIN samp
      |GROUP BY phi_micro, nt ORDER BY phi_micro""".stripMargin

  /** HLL register + estimator recomputation over a (key, value-expr)
    * source — same portable hash, same two-branch estimator on the 1e-6
    * grid. Sums cast back to BIGINT (DuckDB widens SUM to HUGEINT). */
  private def hllOracle(from: String, keyCol: String, valueSql: String): String = {
    val num = graft.operators.Sketches.HllEstNumerator.toString
    s"""WITH hx AS (SELECT $keyCol AS k,
       |  ('0x' || substring(md5('hll:' || $valueSql), 1, 15))::BIGINT AS h
       |  FROM $from WHERE $valueSql IS NOT NULL),
       |reg AS (SELECT k, h >> 48 AS bucket,
       |  max(CASE WHEN (h & ((1::BIGINT << 48) - 1)) = 0 THEN 49
       |      ELSE 49 - len(bin(h & ((1::BIGINT << 48) - 1))) END) AS r
       |  FROM hx GROUP BY k, h >> 48),
       |a AS (SELECT k, count(*) AS n_buckets,
       |        CAST(SUM(1::BIGINT << (49 - r)) AS BIGINT) AS ss
       |      FROM reg GROUP BY k),
       |e AS (SELECT k, n_buckets, CAST(4096 - n_buckets AS BIGINT) AS n_zero,
       |        CAST(ss + (4096 - n_buckets) * (1::BIGINT << 49) AS BIGINT) AS s
       |      FROM a)
       |SELECT k AS $keyCol, n_buckets, n_zero,
       |  CAST(floor(CASE WHEN CAST($num AS DOUBLE) / CAST(s AS DOUBLE) <= 10240.0 AND n_zero > 0
       |       THEN 4096.0 * ln(4096.0 / CAST(n_zero AS DOUBLE))
       |       ELSE CAST($num AS DOUBLE) / CAST(s AS DOUBLE) END * 1000000.0) AS BIGINT)
       |    AS distinct_est_micro
       |FROM e ORDER BY 1""".stripMargin
  }

  /** Shared by the three hll_distinct_* events entries (merge and append
    * are lossless, so all paths reproduce this from-scratch run). */
  private val hllEventsOracle: String = hllOracle(
    "events", "event_type",
    "CAST(user_id AS VARCHAR) || ':' || strftime(ts, '%Y-%m-%d')")

  /** Shared by phrase_search / phrase_search_appended: the same
    * tokenization as the bm25 oracle, positions via a lateral range over
    * each token list (DuckDB lists are 1-based; the index stores 0-based
    * positions, hence i−1), adjacency as a positional self-join. */
  private val phraseOracle: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
      |  FROM documents),
      |pos AS (SELECT doc_id, s.p - 1 AS p, s.t AS term
      |        FROM (SELECT doc_id,
      |                unnest(list_transform(toks, (x, i) -> {'t': x, 'p': i})) AS s
      |              FROM tok)),
      |m AS (SELECT a.doc_id, a.p FROM pos a
      |      JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1 AND b.term = 'merge'
      |      WHERE a.term = 'spark')
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
      |FROM m GROUP BY 1 ORDER BY n_matches DESC, doc_id LIMIT 20""".stripMargin

  /** Shared by seasonality_dow / seasonal_outliers: the (key, day)
    * micro-grid daily rollup, materialized ONCE per sf dir as a managed
    * table so both entries derive from a single events scan — the
    * maintained-rollup shape a real pipeline would keep (the scan
    * dominates both operators at scale; the rollup is day-grain). */
  private def seasonalDaily(s: SparkSession, dir: String): DataFrame = {
    Fixtures.cached(s"seasonal_daily|$dir") {
      graft.operators.Bucketing.materializePlain(
        graft.operators.Analytics.dailyMicroTotals(
          events(s, dir), "event_type", "ts", "value"),
        "graft_seasonal_daily")
      java.lang.Boolean.TRUE
    }
    s.table("graft_seasonal_daily")
  }

  /** Shared by pivot_yearly_revenue / unpivot_yearly_revenue: order
    * revenue per (nation, 1996–1999) pivoted to one column per year.
    *
    * Spelled as CONDITIONAL AGGREGATION (`sum(CASE WHEN year=y)`), not
    * `groupBy().pivot()`: Spark lowers pivot to a two-level plan whose
    * outer `pivotfirst` is an ImperativeAggregate — no whole-stage
    * codegen — and on the decimal path that plan measured 1.7–22 s at
    * sf10 across windows (erratic under heap pressure) vs a stable
    * 1.3 s for this codegen'd case-when form, same results (round-13
    * same-JVM A/B; see BASELINE.md). The case-when form IS what pivot
    * means with an explicit value list; exact decimal sums are kept. */
  private def pivotedRevenue(s: SparkSession, dir: String): DataFrame = {
    val cust = broadcast(t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("nation")))
    val cells = Seq(1996, 1997, 1998, 1999).map(y =>
      sum(when(col("o_year") === y, col("__tp"))).cast("double").as(s"y$y"))
    t(s, dir, "orders")
      .select(col("o_custkey"), year(col("o_orderdate")).as("o_year"),
        col("o_totalprice").cast("decimal(18,2)").as("__tp"))
      .filter(col("o_year").between(1996, 1999))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("nation"))
      .agg(cells.head, cells.tail: _*)
  }

  /** Shared SCD2 CTEs: the scd2Ledger ticks (minus the -C halves, which
    * the operator drops pre-window) and the lead() interval build. */
  private val scd2OracleCtes: String =
    """led AS (
      |  SELECT c_custkey, c_acctbal, c_custkey * 10 AS off, 0 AS op,
      |         TIMESTAMP '2024-01-01' AS et FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal * 2, c_custkey * 10 + 2, 3,
      |         TIMESTAMP '2024-02-01' FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey, 0.0, c_custkey * 10 + 3, 1,
      |         TIMESTAMP '2024-03-01' FROM customer WHERE c_custkey % 7 = 0),
      |w AS (SELECT *, lead(et) OVER (PARTITION BY c_custkey ORDER BY off) AS valid_to
      |      FROM led),
      |dim AS (SELECT c_custkey, c_acctbal, et AS valid_from, valid_to,
      |               CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
      |                 AS is_current
      |        FROM w WHERE op <> 1)""".stripMargin

  /** Bloom word recomputation over events(event_type, user_id): the
    * double-hashed k=4 positions packed into 62-bit words (bit 63 would
    * overflow DuckDB's checked `<<`). Shared by bloom_filter and — since
    * bitwise-or merge is lossless and idempotent — bloom_merge and
    * bloom_append. */
  private val bloomWordsSql: String =
    """hx AS (SELECT event_type,
      |  ('0x' || substring(md5('bf1:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h1,
      |  ('0x' || substring(md5('bf2:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT | 1 AS h2
      |  FROM events WHERE user_id IS NOT NULL),
      |pos AS (SELECT event_type, (h1 + i * h2) % 16384 AS p
      |        FROM hx, range(4) r(i)),
      |sk AS (SELECT event_type, p // 62 AS word,
      |         bit_or(1::BIGINT << CAST(p % 62 AS INTEGER)) AS bits
      |       FROM pos GROUP BY 1, 2)""".stripMargin
  private val bloomEventsOracle: String =
    s"""WITH $bloomWordsSql
       |SELECT event_type, word, bits FROM sk ORDER BY event_type, word""".stripMargin

  /** Shared by attribution_last_touch and attribution_stream: the
    * streaming twin's O(1) per-entity touch state reproduces the batch
    * carried-forward window on ordered replays. */
  private val attributionOracle: String =
    """WITH w AS (SELECT user_id, ts, event_id, event_type,
      |  last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END
      |             IGNORE NULLS) OVER win AS touch_type,
      |  last_value(CASE WHEN event_type IN ('view', 'click') THEN ts END
      |             IGNORE NULLS) OVER win AS touch_ts
      |           FROM events
      |           WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT user_id, ts AS conversion_ts, event_id, touch_type, touch_ts,
      |       epoch_us(ts) - epoch_us(touch_ts) AS lag_us
      |FROM w WHERE event_type = 'purchase' AND touch_type IS NOT NULL
      |ORDER BY user_id, conversion_ts, event_id""".stripMargin

  /** Shared by basket_lift and basket_lift_append: pair/item counts are
    * additive over disjoint baskets, so the maintained tables reproduce
    * this from-scratch recomputation. */
  private val basketOracle: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS b, p_brand AS i
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |tot AS (SELECT count(DISTINCT b) AS n FROM items),
      |ic AS (SELECT i, count(*) AS c FROM items GROUP BY i),
      |p AS (SELECT l.i AS item_a, r.i AS item_b, count(*) AS pair_count
      |      FROM items l JOIN items r ON l.b = r.b AND l.i < r.i
      |      GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT item_a, item_b, pair_count, ca.c AS count_a, cb.c AS count_b,
      |  CAST((pair_count * 1000000) // ca.c AS BIGINT) AS conf_ab_micro,
      |  CAST((pair_count * 1000000 * tot.n) // (ca.c * cb.c) AS BIGINT) AS lift_micro
      |FROM p JOIN ic ca ON ca.i = item_a JOIN ic cb ON cb.i = item_b CROSS JOIN tot
      |ORDER BY item_a, item_b""".stripMargin

  /** Shared by funnel and funnel_stream: the stream's per-entity step
    * machine reproduces the batch min-after-previous chain exactly. */
  private val funnelOracle: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, s1.t1, min(e.ts) AS t2
      |       FROM events e JOIN s1 ON s1.user_id = e.user_id
      |       WHERE e.event_type = 'click' AND e.ts > s1.t1
      |       GROUP BY e.user_id, s1.t1),
      |s3 AS (SELECT e.user_id, s2.t1, s2.t2, min(e.ts) AS t3
      |       FROM events e JOIN s2 ON s2.user_id = e.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |       GROUP BY e.user_id, s2.t1, s2.t2)
      |SELECT user_id, t1, t2, t3 FROM s3 ORDER BY user_id""".stripMargin

  /** k-core peel unrolled: each round keeps nodes of degree ≥ k and
    * restricts edges to them; rounds past the fixpoint are no-ops, so the
    * unrolled form equals the Spark side's run-to-fixpoint loop. */
  private val kcoreOracle: String = {
    val k = 3
    val rounds = 10
    val base =
      """WITH pts AS (SELECT c_custkey AS id,
        |  (('0x' || substring(md5('gx:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS x,
        |  (('0x' || substring(md5('gy:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS y
        |             FROM customer),
        |e0 AS MATERIALIZED (SELECT a.id AS a, b.id AS b FROM pts a JOIN pts b ON a.id < b.id
        |      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 400000000)""".stripMargin
    // every CTE is referenced more than once downstream — MATERIALIZED
    // stops DuckDB inlining each round into the next (exponential blowup)
    val steps = (1 to rounds).map { i =>
      s"""n$i AS MATERIALIZED (SELECT node FROM (SELECT a AS node FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1})
         |       GROUP BY node HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (SELECT a, b FROM e${i - 1}
         |       WHERE a IN (SELECT node FROM n$i) AND b IN (SELECT node FROM n$i))""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$steps
       |SELECT node, count(*) AS degree FROM (
       |  SELECT a AS node FROM e$rounds UNION ALL SELECT b FROM e$rounds)
       |GROUP BY node HAVING count(*) >= $k ORDER BY node""".stripMargin
  }

  private val bm25Oracle: String =
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM tok),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS total,
        |        CAST(sum(CASE WHEN list_contains(toks, 'customer') THEN 1 ELSE 0 END) AS BIGINT) AS dfc,
        |        CAST(sum(CASE WHEN list_contains(toks, 'merge') THEN 1 ELSE 0 END) AS BIGINT) AS dfm,
        |        CAST(sum(CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS dfs
        |      FROM d),
        |i AS (SELECT n, total,
        |        CAST(floor(ln(1.0 + (n - dfc + 0.5) / (dfc + 0.5)) * 1000000.0) AS BIGINT) AS idfc,
        |        CAST(floor(ln(1.0 + (n - dfm + 0.5) / (dfm + 0.5)) * 1000000.0) AS BIGINT) AS idfm,
        |        CAST(floor(ln(1.0 + (n - dfs + 0.5) / (dfs + 0.5)) * 1000000.0) AS BIGINT) AS idfs
        |      FROM g),
        |tf AS (SELECT doc_id, dl,
        |         CAST(len(list_filter(toks, x -> x = 'customer')) AS DOUBLE) AS tfc,
        |         CAST(len(list_filter(toks, x -> x = 'merge')) AS DOUBLE) AS tfm,
        |         CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) AS tfs
        |       FROM d),
        |sc AS (
        |  SELECT doc_id,
        |    CAST(floor(idfc * tfc * (1.2 + 1.0) / (tfc + 1.2 * (0.25 + 0.75 * dl * n / total))) AS BIGINT)
        |  + CAST(floor(idfm * tfm * (1.2 + 1.0) / (tfm + 1.2 * (0.25 + 0.75 * dl * n / total))) AS BIGINT)
        |  + CAST(floor(idfs * tfs * (1.2 + 1.0) / (tfs + 1.2 * (0.25 + 0.75 * dl * n / total))) AS BIGINT)
        |      AS score_micro
        |  FROM tf CROSS JOIN i)
        |SELECT doc_id, score_micro FROM sc WHERE score_micro > 0
        |ORDER BY score_micro DESC, doc_id LIMIT 15""".stripMargin

  /** ann_pq oracle: RETRAINS the per-subspace codebooks in SQL — the same
    * deterministic integer Lloyd's as `Similarity.ivfTrain` (16-lowest-id
    * init, floor(sum/n) updates, empty cells carry forward, assignment
    * ties to the lowest centroid), two iterations unrolled — then encodes
    * the corpus and ranks queries by exact-integer ADC distance. */
  private val annPqOracle: String = {
    // one Lloyd iteration: assign (a) -> per-dim update (u) -> next books
    def iter(prev: String, a: String, u: String, next: String) =
      s"""$a AS (
         |  SELECT vec_id, s, j FROM (
         |    SELECT t.vec_id, t.s, c.j,
         |      row_number() OVER (PARTITION BY t.vec_id, t.s
         |        ORDER BY list_sum(list_transform(range(16), i -> (t.sv[i+1] - c.sv[i+1]) * (t.sv[i+1] - c.sv[i+1]))), c.j) AS r
         |    FROM sub t JOIN $prev c ON c.s = t.s) WHERE r = 1),
         |$u AS (
         |  SELECT a.s, a.j, ii.i,
         |    CAST(floor(CAST(sum(t.sv[ii.i+1]) AS DOUBLE) / count(*)) AS BIGINT) AS val
         |  FROM $a a JOIN sub t ON t.vec_id = a.vec_id AND t.s = a.s
         |  CROSS JOIN (SELECT unnest(range(16)) AS i) ii
         |  GROUP BY a.s, a.j, ii.i),
         |$next AS (
         |  SELECT c.s, c.j, coalesce(u.sv, c.sv) AS sv
         |  FROM $prev c LEFT JOIN (SELECT s, j, list(val ORDER BY i) AS sv FROM $u GROUP BY s, j) u
         |    ON u.s = c.s AND u.j = c.j)"""
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x*1000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |sub AS (
       |  SELECT vec_id, ss.s, qv[ss.s*16+1 : ss.s*16+16] AS sv
       |  FROM v CROSS JOIN (SELECT unnest(range(4)) AS s) ss),
       |init AS (SELECT vec_id, rnk - 1 AS j FROM (
       |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rnk FROM v) WHERE rnk <= 16),
       |c0 AS (SELECT t.s, i.j, t.sv FROM init i JOIN sub t ON t.vec_id = i.vec_id),
       |${iter("c0", "a1", "u1", "c1")},
       |${iter("c1", "a2", "u2", "c2")},
       |codes AS (
       |  SELECT vec_id, s, j AS code FROM (
       |    SELECT t.vec_id, t.s, c.j,
       |      row_number() OVER (PARTITION BY t.vec_id, t.s
       |        ORDER BY list_sum(list_transform(range(16), i -> (t.sv[i+1] - c.sv[i+1]) * (t.sv[i+1] - c.sv[i+1]))), c.j) AS r
       |    FROM sub t JOIN c2 c ON c.s = t.s) WHERE r = 1),
       |q AS (SELECT vec_id AS qid, s, sv AS qsv FROM sub WHERE vec_id < 10),
       |adc AS (
       |  SELECT q.qid, cd.vec_id AS cid,
       |    sum(list_sum(list_transform(range(16), i -> (q.qsv[i+1] - c.sv[i+1]) * (q.qsv[i+1] - c.sv[i+1])))) AS dist
       |  FROM q
       |  JOIN codes cd ON cd.s = q.s AND cd.vec_id <> q.qid
       |  JOIN c2 c ON c.s = q.s AND c.j = cd.code
       |  GROUP BY q.qid, cd.vec_id)
       |SELECT qid, rnk, cid FROM (
       |  SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, cid) AS BIGINT) AS rnk
       |  FROM adc) WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin
  }

  /** Dir-scoped bucketed-fact table names for the q3/q5 bucketed entries
    * (shared with the PlanSpec cleanup). */
  /** Bucket count of the q3/q5 fact tables — folded into the table tag so a
    * layout change invalidates stale tables from older checkouts instead of
    * silently benchmarking the old layout. */
  private[graft] val FactBuckets = 32

  private[graft] def q3BucketedTables(dir: String): (String, String) = {
    val tag = f"${dir.hashCode & 0x7fffffff}%08x_b$FactBuckets"
    (s"graft_q3b_lineitem_$tag", s"graft_q3b_orders_$tag")
  }

  /** Materialize the co-bucketed fact tables once per (dir, catalog) —
    * dir-scoped names + a catalog existence check, NOT a process-wide memo:
    * a dropped table (test cleanup) or a second data dir re-materializes
    * instead of reading stale or missing tables. Shared by q3_bucketed,
    * q5_bucketed and q12_bucketed, so the projection carries all three
    * queries' columns. */
  private def ensureBucketedFacts(s: SparkSession, dir: String): (String, String) = {
    val (lTab, oTab) = q3BucketedTables(dir)
    // presence AND schema: a table materialized by an older projection
    // (e.g. pre-l_linestatus) must re-materialize, not fail analysis forever
    def ok(tab: String, needed: String): Boolean =
      s.catalog.tableExists(tab) && s.table(tab).columns.contains(needed)
    if (!ok(lTab, "l_linestatus") || !ok(oTab, "o_custkey")) {
      graft.operators.Bucketing.materializeBucketed(
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"),
            col("l_discount"), col("l_shipdate"), col("l_linestatus")),
        lTab, "l_orderkey", FactBuckets, Seq("l_orderkey"))
      graft.operators.Bucketing.materializeBucketed(
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority")),
        oTab, "o_orderkey", FactBuckets, Seq("o_orderkey"))
    }
    (lTab, oTab)
  }

  /** Shared by q3_shipping_priority and q3_bucketed (same values, the
    * bucketed entry differs only in storage layout / join strategy). */
  private val q3Oracle: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Shared by q12_priority_routing and q12_bucketed (same values, the
    * bucketed entry differs only in storage layout / join strategy).
    * Conditional counts are exact integers — no float risk. */
  private val q12Oracle: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Shared by q5_local_supplier_volume and q5_bucketed (same values, the
    * bucketed entry differs only in storage layout / join strategy). */
  private val q5Oracle: String =
    """SELECT n_name,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Shared by embed_neardup and embed_neardup_bucketed: identical planes
    * and threshold, so the bucketed table execution must hash-match the
    * same SQL. */
  private val embedNeardupOracle: String = {
    val pls = planesLit(graft.operators.Similarity.intPlanes(numPlanes = 4, dim = 64, seed = 7L))
    s"""WITH p AS (SELECT $pls AS pls),
       |e AS (SELECT vec_id AS id, list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x*1000) AS BIGINT)) AS v
       |      FROM embeddings),
       |wb AS (SELECT id, v, list_sum([CASE WHEN list_dot_product(CAST(v AS DOUBLE[]), CAST(pls[i+1] AS DOUBLE[])) > 0 THEN 1<<i ELSE 0 END for i in range(4)]) AS bucket
       |       FROM e CROSS JOIN p),
       |pairs AS (
       |  SELECT a.id AS id_a, b.id AS id_b, a.v AS va, b.v AS vb
       |  FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.id < b.id),
       |scored AS (
       |  SELECT id_a, id_b,
       |    CASE WHEN sqrt(CAST(list_dot_product(CAST(va AS DOUBLE[]), CAST(va AS DOUBLE[])) AS DOUBLE))
       |            * sqrt(CAST(list_dot_product(CAST(vb AS DOUBLE[]), CAST(vb AS DOUBLE[])) AS DOUBLE)) > 0
       |         THEN CAST(list_dot_product(CAST(va AS DOUBLE[]), CAST(vb AS DOUBLE[])) AS DOUBLE)
       |            / (sqrt(CAST(list_dot_product(CAST(va AS DOUBLE[]), CAST(va AS DOUBLE[])) AS DOUBLE))
       |             * sqrt(CAST(list_dot_product(CAST(vb AS DOUBLE[]), CAST(vb AS DOUBLE[])) AS DOUBLE)))
       |         ELSE 0.0 END AS cos
       |  FROM pairs)
       |SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.3 ORDER BY id_a, id_b""".stripMargin
  }

  // Grouped-eval oracles, shared verbatim by the raw grouped operators
  // (auc_by_day / ks_by_day) and their keyed maintained-stats twins — the
  // stats derivation must equal the raw recomputation bit for bit.
  // Grouped AUC: identical per-day midranks and integer U arithmetic.
  private val aucByDaySql: String =
    """WITH u AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id,
      |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
      |      AS score,
      |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS label
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
      |r AS (SELECT day, score, label,
      |    row_number() OVER (PARTITION BY day ORDER BY score, user_id) AS rk FROM u),
      |g AS (SELECT day, score, CAST(min(rk) AS BIGINT) AS minr,
      |        CAST(max(rk) AS BIGINT) AS maxr,
      |        CAST(sum(label) AS BIGINT) AS pos
      |      FROM r GROUP BY 1, 2),
      |t AS (SELECT day, CAST(sum(pos * (minr + maxr)) AS BIGINT) AS s2,
      |        CAST(sum(pos) AS BIGINT) AS n_pos,
      |        CAST(sum(maxr - minr + 1 - pos) AS BIGINT) AS n_neg
      |      FROM g GROUP BY 1)
      |SELECT day, n_pos, n_neg,
      |  ((s2 - n_pos * (n_pos + 1)) * 1000000) // (2 * n_pos * n_neg) AS auc_micro
      |FROM t WHERE n_pos > 0 AND n_neg > 0 ORDER BY day""".stripMargin

  // Grouped KS: identical per-day cumulative class counts, one DIV per
  // class, argmax gap with ties to the smallest score.
  private val ksByDaySql: String =
    """WITH u AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id,
      |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
      |      AS score,
      |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS label
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
      |g AS (SELECT day, score, CAST(sum(label) AS BIGINT) AS p,
      |        CAST(sum(1 - label) AS BIGINT) AS q FROM u GROUP BY 1, 2),
      |c AS (SELECT day, score,
      |    CAST(sum(p) OVER (PARTITION BY day ORDER BY score
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp,
      |    CAST(sum(q) OVER (PARTITION BY day ORDER BY score
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cq,
      |    CAST(sum(p) OVER (PARTITION BY day) AS BIGINT) AS np,
      |    CAST(sum(q) OVER (PARTITION BY day) AS BIGINT) AS nn
      |  FROM g),
      |k AS (SELECT day, score, np, nn,
      |        abs(cp * 1000000 // np - cq * 1000000 // nn) AS gap
      |      FROM c WHERE np > 0 AND nn > 0),
      |r AS (SELECT day, score, np, nn, gap,
      |    row_number() OVER (PARTITION BY day ORDER BY gap DESC, score) AS rn
      |  FROM k)
      |SELECT day, np AS n_pos, nn AS n_neg, gap AS ks_micro, score AS at_score
      |FROM r WHERE rn = 1 ORDER BY day""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // The keyed maintained-stats twins must equal the raw grouped
    // recomputations bit for bit — they share the grouped oracles.
    "auc_by_day_from_stats" -> aucByDaySql,
    "ks_by_day_from_stats" -> ksByDaySql,
    // Catalog statistics as data: exact aggregates recomputed from raw.
    "table_stats" ->
      """SELECT 'table' AS entity, 'row_count' AS stat,
        |    CAST(count(*) AS VARCHAR) AS value FROM orders
        |UNION ALL SELECT 'o_custkey', 'max',
        |    CAST(max(o_custkey) AS VARCHAR) FROM orders
        |UNION ALL SELECT 'o_custkey', 'min',
        |    CAST(min(o_custkey) AS VARCHAR) FROM orders
        |UNION ALL SELECT 'o_custkey', 'null_count',
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS VARCHAR)
        |  FROM orders
        |UNION ALL SELECT 'o_orderkey', 'max',
        |    CAST(max(o_orderkey) AS VARCHAR) FROM orders
        |UNION ALL SELECT 'o_orderkey', 'min',
        |    CAST(min(o_orderkey) AS VARCHAR) FROM orders
        |UNION ALL SELECT 'o_orderkey', 'null_count',
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS VARCHAR)
        |  FROM orders
        |ORDER BY entity, stat""".stripMargin,
    // Keyed streaming twin: the folded (day, score) generations equal
    // the from-scratch keyed recount.
    "score_stats_keyed_stream" ->
      """WITH u AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS label
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2)
        |SELECT day, score AS score_micro, CAST(count(*) AS BIGINT) AS n_entities,
        |  CAST(sum(label) AS BIGINT) AS n_positive
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Grouped decile lift: per-day recomputation under the same
    // positives-first tie rule and integer lift arithmetic.
    "decile_lift_by_day_from_stats" ->
      """WITH u AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS label
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT day, score, label,
        |    row_number() OVER (PARTITION BY day ORDER BY score DESC, label DESC,
        |      user_id) AS rk FROM u),
        |n AS (SELECT day, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(label) AS BIGINT) AS pos FROM u GROUP BY 1),
        |d AS (SELECT r.day, ((rk - 1) * 10) // n.n + 1 AS decile, label
        |      FROM r JOIN n ON r.day = n.day WHERE n.pos > 0)
        |SELECT d.day, CAST(decile AS BIGINT) AS decile,
        |  CAST(count(*) AS BIGINT) AS n_entities,
        |  CAST(sum(label) AS BIGINT) AS n_positive,
        |  (CAST(sum(label) AS BIGINT) * n.n * 1000000)
        |    // (CAST(count(*) AS BIGINT) * n.pos) AS lift_micro
        |FROM d JOIN n ON d.day = n.day
        |GROUP BY d.day, decile, n.n, n.pos ORDER BY 1, 2""".stripMargin,
    // Compaction preserves content exactly: the folded table reads as
    // the same from-scratch per-score recount as score_stats_append.
    "score_stats_compact" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
        |SELECT score AS score_micro, CAST(count(*) AS BIGINT) AS n_entities,
        |  CAST(sum(label) AS BIGINT) AS n_positive
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    // PR points: same per-threshold confusion as roc_points, recall axis.
    "pr_points" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5 >= count(*)
        |         THEN 1::BIGINT ELSE 0::BIGINT END AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |g AS (SELECT score, CAST(sum(label) AS BIGINT) AS p,
        |        CAST(sum(1 - label) AS BIGINT) AS q FROM u GROUP BY 1),
        |c AS (SELECT score, p, q,
        |    CAST(sum(p) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp,
        |    CAST(sum(q) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cq
        |  FROM g),
        |t AS (SELECT CAST(sum(label) AS BIGINT) AS np,
        |        CAST(sum(1 - label) AS BIGINT) AS nn FROM u),
        |k AS (SELECT c.score AS threshold_micro,
        |        np - cp + p AS tp, nn - cq + q AS fp FROM c CROSS JOIN t
        |      WHERE np > 0 AND nn > 0)
        |SELECT threshold_micro, tp, fp,
        |  (tp * 1000000) // t.np AS recall_micro,
        |  CASE WHEN tp + fp > 0 THEN (tp * 1000000) // (tp + fp) ELSE 0 END
        |    AS precision_micro
        |FROM k CROSS JOIN t ORDER BY threshold_micro""".stripMargin,
    // Average precision: step-wise AP — each threshold's recall increment
    // is its own positives, precision already floored to micros.
    "average_precision" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5 >= count(*)
        |         THEN 1::BIGINT ELSE 0::BIGINT END AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |g AS (SELECT score, CAST(sum(label) AS BIGINT) AS p,
        |        CAST(sum(1 - label) AS BIGINT) AS q FROM u GROUP BY 1),
        |c AS (SELECT score, p, q,
        |    CAST(sum(p) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp,
        |    CAST(sum(q) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cq
        |  FROM g),
        |t AS (SELECT CAST(sum(label) AS BIGINT) AS np,
        |        CAST(sum(1 - label) AS BIGINT) AS nn FROM u),
        |k AS (SELECT p, np - cp + p AS tp, nn - cq + q AS fp
        |      FROM c CROSS JOIN t WHERE np > 0),
        |pr AS (SELECT p,
        |    CASE WHEN tp + fp > 0 THEN (tp * 1000000) // (tp + fp) ELSE 0 END AS prec
        |  FROM k)
        |SELECT t.np AS n_pos, t.nn AS n_neg,
        |  (SELECT CAST(sum(p * prec) AS BIGINT) FROM pr) // t.np AS ap_micro
        |FROM t WHERE t.np > 0""".stripMargin,
    // Per-day drift trend: each day binned by the previous day's exact
    // decile cutoffs (rank rule on the ref day), integer TVD gaps.
    "drift_by_day_from_stats" ->
      """WITH u AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT day, score,
        |    row_number() OVER (PARTITION BY day ORDER BY score, user_id) AS rk FROM u),
        |n AS (SELECT day, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1),
        |cuts AS (SELECT DISTINCT day, cut FROM (
        |    SELECT r.day, ((rk - 1) * 10) // n.n + 1 AS d, max(score) AS cut
        |    FROM r JOIN n ON r.day = n.day GROUP BY r.day, d, n.n) WHERE d <= 9),
        |days AS (SELECT day, lag(day) OVER (ORDER BY day) AS refday
        |         FROM (SELECT DISTINCT day FROM u)),
        |bc AS (SELECT d.day, u.user_id,
        |    CAST(1 + (SELECT count(*) FROM cuts
        |      WHERE cuts.day = d.refday AND u.score > cuts.cut) AS BIGINT) AS bin
        |  FROM days d JOIN u ON u.day = d.day WHERE d.refday IS NOT NULL),
        |br AS (SELECT d.day, u.user_id,
        |    CAST(1 + (SELECT count(*) FROM cuts
        |      WHERE cuts.day = d.refday AND u.score > cuts.cut) AS BIGINT) AS bin
        |  FROM days d JOIN u ON u.day = d.refday WHERE d.refday IS NOT NULL),
        |ra AS (SELECT day, bin, CAST(count(*) AS BIGINT) AS n_ref FROM br GROUP BY 1, 2),
        |ca AS (SELECT day, bin, CAST(count(*) AS BIGINT) AS n_cur FROM bc GROUP BY 1, 2),
        |nr AS (SELECT d.day, CAST(count(*) AS BIGINT) AS n FROM days d
        |       JOIN u ON u.day = d.refday GROUP BY 1),
        |nc AS (SELECT d.day, CAST(count(*) AS BIGINT) AS n FROM days d
        |       JOIN u ON u.day = d.day WHERE d.refday IS NOT NULL GROUP BY 1)
        |SELECT COALESCE(ra.day, ca.day) AS day,
        |  COALESCE(ra.bin, ca.bin) AS bin,
        |  COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur,
        |  abs(COALESCE(n_ref, 0) * 1000000 // nr.n
        |    - COALESCE(n_cur, 0) * 1000000 // nc.n) AS gap_micro,
        |  CAST(floor((CAST(greatest(COALESCE(n_cur, 0), 1) AS DOUBLE) / nc.n
        |        - CAST(greatest(COALESCE(n_ref, 0), 1) AS DOUBLE) / nr.n)
        |      * ln((CAST(greatest(COALESCE(n_cur, 0), 1) AS DOUBLE) / nc.n)
        |        / (CAST(greatest(COALESCE(n_ref, 0), 1) AS DOUBLE) / nr.n))
        |      * 1000000.0) AS BIGINT) AS psi_micro
        |FROM ra FULL OUTER JOIN ca ON ra.day = ca.day AND ra.bin = ca.bin
        |JOIN nr ON nr.day = COALESCE(ra.day, ca.day)
        |JOIN nc ON nc.day = COALESCE(ra.day, ca.day)
        |ORDER BY 1, 2""".stripMargin,
    // Grouped drift trend: the per-day drift recomputation run
    // independently within each event_type (adjacency, cuts, bins and
    // totals all partitioned by type).
    "drift_by_type_day" ->
      """WITH u AS (SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |    user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL GROUP BY 1, 2, 3),
        |r AS (SELECT event_type, day, score,
        |    row_number() OVER (PARTITION BY event_type, day
        |      ORDER BY score, user_id) AS rk FROM u),
        |n AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n
        |      FROM u GROUP BY 1, 2),
        |cuts AS (SELECT DISTINCT event_type, day, cut FROM (
        |    SELECT r.event_type, r.day, ((rk - 1) * 10) // n.n + 1 AS d,
        |      max(score) AS cut
        |    FROM r JOIN n ON r.event_type = n.event_type AND r.day = n.day
        |    GROUP BY r.event_type, r.day, d, n.n) WHERE d <= 9),
        |days AS (SELECT event_type, day,
        |    lag(day) OVER (PARTITION BY event_type ORDER BY day) AS refday
        |  FROM (SELECT DISTINCT event_type, day FROM u)),
        |bc AS (SELECT d.event_type, d.day, u.user_id,
        |    CAST(1 + (SELECT count(*) FROM cuts
        |      WHERE cuts.event_type = d.event_type AND cuts.day = d.refday
        |        AND u.score > cuts.cut) AS BIGINT) AS bin
        |  FROM days d JOIN u ON u.event_type = d.event_type AND u.day = d.day
        |  WHERE d.refday IS NOT NULL),
        |br AS (SELECT d.event_type, d.day, u.user_id,
        |    CAST(1 + (SELECT count(*) FROM cuts
        |      WHERE cuts.event_type = d.event_type AND cuts.day = d.refday
        |        AND u.score > cuts.cut) AS BIGINT) AS bin
        |  FROM days d JOIN u ON u.event_type = d.event_type AND u.day = d.refday
        |  WHERE d.refday IS NOT NULL),
        |ra AS (SELECT event_type, day, bin, CAST(count(*) AS BIGINT) AS n_ref
        |       FROM br GROUP BY 1, 2, 3),
        |ca AS (SELECT event_type, day, bin, CAST(count(*) AS BIGINT) AS n_cur
        |       FROM bc GROUP BY 1, 2, 3),
        |nr AS (SELECT d.event_type, d.day, CAST(count(*) AS BIGINT) AS n FROM days d
        |       JOIN u ON u.event_type = d.event_type AND u.day = d.refday
        |       GROUP BY 1, 2),
        |nc AS (SELECT d.event_type, d.day, CAST(count(*) AS BIGINT) AS n FROM days d
        |       JOIN u ON u.event_type = d.event_type AND u.day = d.day
        |       WHERE d.refday IS NOT NULL GROUP BY 1, 2)
        |SELECT COALESCE(ra.event_type, ca.event_type) AS event_type,
        |  COALESCE(ra.day, ca.day) AS day,
        |  COALESCE(ra.bin, ca.bin) AS bin,
        |  COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur,
        |  abs(COALESCE(n_ref, 0) * 1000000 // nr.n
        |    - COALESCE(n_cur, 0) * 1000000 // nc.n) AS gap_micro,
        |  CAST(floor((CAST(greatest(COALESCE(n_cur, 0), 1) AS DOUBLE) / nc.n
        |        - CAST(greatest(COALESCE(n_ref, 0), 1) AS DOUBLE) / nr.n)
        |      * ln((CAST(greatest(COALESCE(n_cur, 0), 1) AS DOUBLE) / nc.n)
        |        / (CAST(greatest(COALESCE(n_ref, 0), 1) AS DOUBLE) / nr.n))
        |      * 1000000.0) AS BIGINT) AS psi_micro
        |FROM ra FULL OUTER JOIN ca ON ra.event_type = ca.event_type
        |  AND ra.day = ca.day AND ra.bin = ca.bin
        |JOIN nr ON nr.event_type = COALESCE(ra.event_type, ca.event_type)
        |  AND nr.day = COALESCE(ra.day, ca.day)
        |JOIN nc ON nc.event_type = COALESCE(ra.event_type, ca.event_type)
        |  AND nc.day = COALESCE(ra.day, ca.day)
        |ORDER BY 1, 2, 3""".stripMargin,
    // Streaming grouped monitor: the grouped drift trend minus each
    // type's OWN final day (still open within that type when the stream
    // stopped — never emitted).
    "drift_stream_by_type" ->
      """WITH u AS (SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |    user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL GROUP BY 1, 2, 3),
        |r AS (SELECT event_type, day, score,
        |    row_number() OVER (PARTITION BY event_type, day
        |      ORDER BY score, user_id) AS rk FROM u),
        |n AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n
        |      FROM u GROUP BY 1, 2),
        |cuts AS (SELECT DISTINCT event_type, day, cut FROM (
        |    SELECT r.event_type, r.day, ((rk - 1) * 10) // n.n + 1 AS d,
        |      max(score) AS cut
        |    FROM r JOIN n ON r.event_type = n.event_type AND r.day = n.day
        |    GROUP BY r.event_type, r.day, d, n.n) WHERE d <= 9),
        |days AS (SELECT event_type, day,
        |    lag(day) OVER (PARTITION BY event_type ORDER BY day) AS refday
        |  FROM (SELECT DISTINCT event_type, day FROM u)),
        |mx AS (SELECT event_type, max(day) AS md FROM u GROUP BY 1),
        |bc AS (SELECT d.event_type, d.day, u.user_id,
        |    CAST(1 + (SELECT count(*) FROM cuts
        |      WHERE cuts.event_type = d.event_type AND cuts.day = d.refday
        |        AND u.score > cuts.cut) AS BIGINT) AS bin
        |  FROM days d JOIN u ON u.event_type = d.event_type AND u.day = d.day
        |  WHERE d.refday IS NOT NULL),
        |br AS (SELECT d.event_type, d.day, u.user_id,
        |    CAST(1 + (SELECT count(*) FROM cuts
        |      WHERE cuts.event_type = d.event_type AND cuts.day = d.refday
        |        AND u.score > cuts.cut) AS BIGINT) AS bin
        |  FROM days d JOIN u ON u.event_type = d.event_type AND u.day = d.refday
        |  WHERE d.refday IS NOT NULL),
        |ra AS (SELECT event_type, day, bin, CAST(count(*) AS BIGINT) AS n_ref
        |       FROM br GROUP BY 1, 2, 3),
        |ca AS (SELECT event_type, day, bin, CAST(count(*) AS BIGINT) AS n_cur
        |       FROM bc GROUP BY 1, 2, 3),
        |nr AS (SELECT d.event_type, d.day, CAST(count(*) AS BIGINT) AS n FROM days d
        |       JOIN u ON u.event_type = d.event_type AND u.day = d.refday
        |       GROUP BY 1, 2),
        |nc AS (SELECT d.event_type, d.day, CAST(count(*) AS BIGINT) AS n FROM days d
        |       JOIN u ON u.event_type = d.event_type AND u.day = d.day
        |       WHERE d.refday IS NOT NULL GROUP BY 1, 2)
        |SELECT COALESCE(ra.event_type, ca.event_type) AS event_type,
        |  COALESCE(ra.day, ca.day) AS day,
        |  COALESCE(ra.bin, ca.bin) AS bin,
        |  COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur,
        |  abs(COALESCE(n_ref, 0) * 1000000 // nr.n
        |    - COALESCE(n_cur, 0) * 1000000 // nc.n) AS gap_micro,
        |  CAST(floor((CAST(greatest(COALESCE(n_cur, 0), 1) AS DOUBLE) / nc.n
        |        - CAST(greatest(COALESCE(n_ref, 0), 1) AS DOUBLE) / nr.n)
        |      * ln((CAST(greatest(COALESCE(n_cur, 0), 1) AS DOUBLE) / nc.n)
        |        / (CAST(greatest(COALESCE(n_ref, 0), 1) AS DOUBLE) / nr.n))
        |      * 1000000.0) AS BIGINT) AS psi_micro
        |FROM ra FULL OUTER JOIN ca ON ra.event_type = ca.event_type
        |  AND ra.day = ca.day AND ra.bin = ca.bin
        |JOIN nr ON nr.event_type = COALESCE(ra.event_type, ca.event_type)
        |  AND nr.day = COALESCE(ra.day, ca.day)
        |JOIN nc ON nc.event_type = COALESCE(ra.event_type, ca.event_type)
        |  AND nc.day = COALESCE(ra.day, ca.day)
        |JOIN mx ON mx.event_type = COALESCE(ra.event_type, ca.event_type)
        |WHERE COALESCE(ra.day, ca.day) < mx.md
        |ORDER BY 1, 2, 3""".stripMargin,
    // Streaming drift monitor: the from-scratch drift trend minus the
    // final day (still open when the stream stopped — never emitted).
    "drift_stream" ->
      """WITH u AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT day, score,
        |    row_number() OVER (PARTITION BY day ORDER BY score, user_id) AS rk FROM u),
        |n AS (SELECT day, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1),
        |cuts AS (SELECT DISTINCT day, cut FROM (
        |    SELECT r.day, ((rk - 1) * 10) // n.n + 1 AS d, max(score) AS cut
        |    FROM r JOIN n ON r.day = n.day GROUP BY r.day, d, n.n) WHERE d <= 9),
        |days AS (SELECT day, lag(day) OVER (ORDER BY day) AS refday
        |         FROM (SELECT DISTINCT day FROM u)),
        |bc AS (SELECT d.day, u.user_id,
        |    CAST(1 + (SELECT count(*) FROM cuts
        |      WHERE cuts.day = d.refday AND u.score > cuts.cut) AS BIGINT) AS bin
        |  FROM days d JOIN u ON u.day = d.day WHERE d.refday IS NOT NULL),
        |br AS (SELECT d.day, u.user_id,
        |    CAST(1 + (SELECT count(*) FROM cuts
        |      WHERE cuts.day = d.refday AND u.score > cuts.cut) AS BIGINT) AS bin
        |  FROM days d JOIN u ON u.day = d.refday WHERE d.refday IS NOT NULL),
        |ra AS (SELECT day, bin, CAST(count(*) AS BIGINT) AS n_ref FROM br GROUP BY 1, 2),
        |ca AS (SELECT day, bin, CAST(count(*) AS BIGINT) AS n_cur FROM bc GROUP BY 1, 2),
        |nr AS (SELECT d.day, CAST(count(*) AS BIGINT) AS n FROM days d
        |       JOIN u ON u.day = d.refday GROUP BY 1),
        |nc AS (SELECT d.day, CAST(count(*) AS BIGINT) AS n FROM days d
        |       JOIN u ON u.day = d.day WHERE d.refday IS NOT NULL GROUP BY 1)
        |SELECT COALESCE(ra.day, ca.day) AS day,
        |  COALESCE(ra.bin, ca.bin) AS bin,
        |  COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur,
        |  abs(COALESCE(n_ref, 0) * 1000000 // nr.n
        |    - COALESCE(n_cur, 0) * 1000000 // nc.n) AS gap_micro,
        |  CAST(floor((CAST(greatest(COALESCE(n_cur, 0), 1) AS DOUBLE) / nc.n
        |        - CAST(greatest(COALESCE(n_ref, 0), 1) AS DOUBLE) / nr.n)
        |      * ln((CAST(greatest(COALESCE(n_cur, 0), 1) AS DOUBLE) / nc.n)
        |        / (CAST(greatest(COALESCE(n_ref, 0), 1) AS DOUBLE) / nr.n))
        |      * 1000000.0) AS BIGINT) AS psi_micro
        |FROM ra FULL OUTER JOIN ca ON ra.day = ca.day AND ra.bin = ca.bin
        |JOIN nr ON nr.day = COALESCE(ra.day, ca.day)
        |JOIN nc ON nc.day = COALESCE(ra.day, ca.day)
        |WHERE COALESCE(ra.day, ca.day) < (SELECT max(day) FROM u)
        |ORDER BY 1, 2""".stripMargin,
    // Categorical drift: per-category shares, TVD gaps, zero-floored PSI
    // terms — DuckDB's ln/floor reproduce the micro values.
    "categorical_drift" ->
      """WITH r AS (SELECT event_type AS category, CAST(count(*) AS BIGINT) AS n_ref
        |      FROM events WHERE ts IS NOT NULL
        |        AND month(CAST(ts AS DATE)) <= 6 AND event_type IS NOT NULL
        |      GROUP BY 1),
        |c AS (SELECT event_type AS category, CAST(count(*) AS BIGINT) AS n_cur
        |      FROM events WHERE ts IS NOT NULL
        |        AND month(CAST(ts AS DATE)) > 6 AND event_type IS NOT NULL
        |      GROUP BY 1),
        |nr AS (SELECT CAST(sum(n_ref) AS BIGINT) AS n FROM r),
        |nc AS (SELECT CAST(sum(n_cur) AS BIGINT) AS n FROM c),
        |j AS (SELECT COALESCE(r.category, c.category) AS category,
        |        COALESCE(r.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur
        |      FROM r FULL OUTER JOIN c ON r.category = c.category)
        |SELECT category, n_ref, n_cur,
        |  abs(n_ref * 1000000 // nr.n - n_cur * 1000000 // nc.n) AS gap_micro,
        |  CAST(floor((CAST(greatest(n_cur, 1) AS DOUBLE) / nc.n
        |        - CAST(greatest(n_ref, 1) AS DOUBLE) / nr.n)
        |      * ln((CAST(greatest(n_cur, 1) AS DOUBLE) / nc.n)
        |        / (CAST(greatest(n_ref, 1) AS DOUBLE) / nr.n))
        |      * 1000000.0) AS BIGINT) AS psi_micro
        |FROM j CROSS JOIN nr CROSS JOIN nc
        |WHERE nr.n > 0 AND nc.n > 0
        |ORDER BY category""".stripMargin,
    // Brier: exact micro^2-grid MSE; DuckDB sums into HUGEINT, the Spark
    // side into DECIMAL(38,0) — same integer quotient.
    "brier_from_stats" ->
      """WITH u AS (SELECT user_id,
        |    (CAST(sum(CASE WHEN event_type IN ('click', 'purchase')
        |        THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |      // CAST(count(*) AS BIGINT) AS score,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_entities,
        |  CAST(sum(score * score - 2 * 1000000 * score * label
        |      + CAST(1000000000000 AS BIGINT) * label)
        |    // CAST(count(*) AS BIGINT) AS BIGINT) AS brier_micro2
        |FROM u""".stripMargin,
    // ECE: weighted mean |pos_rate − mean_score| over the calibration
    // bins of the click-or-purchase-share micro-probability.
    "ece_from_stats" ->
      """WITH u AS (SELECT user_id,
        |    (CAST(sum(CASE WHEN event_type IN ('click', 'purchase')
        |        THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |      // CAST(count(*) AS BIGINT) AS score,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |mm AS (SELECT min(score) AS lo, max(score) AS hi FROM u),
        |b AS (SELECT ((score - lo) * 10) // (hi - lo + 1) + 1 AS bin, score, label
        |      FROM u CROSS JOIN mm),
        |cal AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(score) AS BIGINT) // CAST(count(*) AS BIGINT) AS ms,
        |        (CAST(sum(label) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
        |          AS prr
        |      FROM b GROUP BY 1)
        |SELECT CAST(sum(n) AS BIGINT) AS n_entities,
        |  CAST(sum(n * abs(prr - ms)) AS BIGINT) // CAST(sum(n) AS BIGINT)
        |    AS ece_micro
        |FROM cal""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" -> q3Oracle,
    // Same values, co-bucketed storage-partitioned execution.
    "q3_bucketed" -> q3Oracle,
    "q5_local_supplier_volume" -> q5Oracle,
    // Same values, co-bucketed storage-partitioned execution.
    "q5_bucketed" -> q5Oracle,
    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q_rollup_order_stats" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS INT) AS l_year,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """WITH v AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol,
        |    n2.n_name AS supp_nation
        |  FROM lineitem, part, supplier, orders, customer, nation n1, region, nation n2
        |  WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey AND l_orderkey = o_orderkey
        |    AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
        |    AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |    AND s_nationkey = n2.n_nationkey AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
        |s AS (
        |  SELECT o_year,
        |    COALESCE(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol END) AS DOUBLE), 0.0) AS nation_volume,
        |    CAST(SUM(vol) AS DOUBLE) AS total_volume
        |  FROM v GROUP BY o_year)
        |SELECT o_year, nation_volume, total_volume, nation_volume / total_volume AS mkt_share
        |FROM s ORDER BY o_year""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND c_nationkey = n_nationkey
        |  AND l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q14_promo_revenue" ->
      """WITH s AS (
        |  SELECT
        |    COALESCE(CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE), 0.0) AS promo_revenue,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem, part
        |  WHERE l_partkey = p_partkey
        |    AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00')
        |SELECT promo_revenue, total_revenue, promo_revenue * 100.0 / total_revenue AS promo_pct FROM s""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q18_large_volume" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, CAST(sq AS DOUBLE) AS sum_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_discounted_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey AND (
        |     (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |  OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
        |  OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40))""".stripMargin,
    // q4: the EXISTS is genuinely correlated — DuckDB decorrelates it the
    // same way the entry does by hand (semi join on the correlation key).
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // q2: argmin per part via the same rank-1 window; unit cost is IEEE
    // double division on both engines.
    "q2_min_cost_supplier" ->
      """WITH u AS (SELECT l_partkey, l_suppkey,
        |             min(l_extendedprice / l_quantity) AS min_cost
        |           FROM lineitem JOIN part ON l_partkey = p_partkey
        |           WHERE p_size BETWEEN 1 AND 15 AND p_type = 'ECONOMY'
        |             AND l_quantity > 0
        |           GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_partkey
        |                                   ORDER BY min_cost, l_suppkey) AS rn
        |      FROM u)
        |SELECT l_partkey AS p_partkey, s_suppkey, s_name, n_name AS nation, min_cost
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |       JOIN nation ON s_nationkey = n_nationkey
        |WHERE rn = 1 ORDER BY p_partkey LIMIT 100""".stripMargin,
    // q9: surrogate supply cost 0.4·retailprice·qty, all DECIMAL (0.4 is
    // exact at scale 1), one double cast after the exact sum.
    "q9_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |           - CAST(p_retailprice AS DECIMAL(18,2))
        |             * CAST(l_quantity AS DECIMAL(18,2))
        |             * 0.4::DECIMAL(2,1)) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    // pivot: one conditional hash aggregate; empty (nation, year) cells
    // stay NULL on both engines (sum over the empty set).
    "pivot_yearly_revenue" ->
      """WITH b AS (SELECT n_name AS nation, year(o_orderdate) AS y,
        |                  CAST(o_totalprice AS DECIMAL(18,2)) AS tp
        |           FROM orders
        |             JOIN customer ON o_custkey = c_custkey
        |             JOIN nation ON c_nationkey = n_nationkey
        |           WHERE year(o_orderdate) BETWEEN 1996 AND 1999)
        |SELECT nation,
        |  CAST(sum(CASE WHEN y = 1996 THEN tp END) AS DOUBLE) AS y1996,
        |  CAST(sum(CASE WHEN y = 1997 THEN tp END) AS DOUBLE) AS y1997,
        |  CAST(sum(CASE WHEN y = 1998 THEN tp END) AS DOUBLE) AS y1998,
        |  CAST(sum(CASE WHEN y = 1999 THEN tp END) AS DOUBLE) AS y1999
        |FROM b GROUP BY nation ORDER BY nation""".stripMargin,
    // micro pivot: identical floor-to-cents spelling on both engines —
    // integer sums, so any engine reproduces the cells bit-for-bit.
    "pivot_yearly_revenue_micro" ->
      """WITH b AS (SELECT n_name AS nation, year(o_orderdate) AS y,
        |                  CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders
        |             JOIN customer ON o_custkey = c_custkey
        |             JOIN nation ON c_nationkey = n_nationkey
        |           WHERE year(o_orderdate) BETWEEN 1996 AND 1999)
        |SELECT nation,
        |  sum(CASE WHEN y = 1996 THEN cents END) / 100.0 AS y1996,
        |  sum(CASE WHEN y = 1997 THEN cents END) / 100.0 AS y1997,
        |  sum(CASE WHEN y = 1998 THEN cents END) / 100.0 AS y1998,
        |  sum(CASE WHEN y = 1999 THEN cents END) / 100.0 AS y1999
        |FROM b GROUP BY nation ORDER BY nation""".stripMargin,
    // unpivot: pivot∘unpivot round-trips to the plain rollup.
    "unpivot_yearly_revenue" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |WHERE year(o_orderdate) BETWEEN 1996 AND 1999
        |GROUP BY 1, 2 ORDER BY nation, o_year""".stripMargin,
    // q12: conditional counts are exact integers — no float risk.
    "q12_priority_routing" -> q12Oracle,
    // Same values as q12 — the bucketed entry differs only in storage
    // layout / join strategy (the q3/q5 discipline).
    "q12_bucketed" -> q12Oracle,
    // q17: correlated scalar avg, cross-multiplied (5*qty*n < sum) so both
    // engines compare exact decimals instead of divided averages.
    "q17_small_quantity" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 10),
        |pp AS (SELECT l_partkey AS pk,
        |              sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
        |              count(*) AS n
        |       FROM li GROUP BY 1)
        |SELECT CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE) / 7.0
        |         AS avg_yearly
        |FROM li JOIN pp ON l_partkey = pk
        |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * n < sq""".stripMargin,
    "q21_waiting_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM orders
        |              WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    // q22: bal·n > Σbal replaces bal > avg(bal) — division-free, exact.
    "q22_idle_customers" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |  WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'FURNITURE')),
        |st AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sb, count(*) AS nb
        |       FROM cust WHERE c_acctbal > 0)
        |SELECT c_mktsegment, count(*) AS numcust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM cust CROSS JOIN st
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * nb > sb
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q11_value_concentration" ->
      """WITH b AS (SELECT p_brand, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
        |           FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
        |t AS (SELECT sum(v) AS t FROM b)
        |SELECT p_brand, CAST(v AS DOUBLE) AS brand_value FROM b CROSS JOIN t
        |WHERE v * 25 > t ORDER BY brand_value DESC, p_brand""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // q16: NOT IN over non-null keys ≡ anti join.
    "q16_supplier_counts" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#4' AND p_size IN (1, 5, 9, 13, 17, 21)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,
    "q20_volume_suppliers" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_suppkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 400)
        |ORDER BY s_name""".stripMargin,
    // Salting is pure execution strategy: the oracle is the PLAIN join.
    "salted_join" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "basket_lift" -> basketOracle,
    // Additive pair/item counts over disjoint basket halves ≡ one pass.
    "basket_lift_append" -> basketOracle,
    "ewma_daily" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT) AS y
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |seq AS (SELECT event_type, list(y ORDER BY day) AS ys FROM daily GROUP BY 1)
        |SELECT event_type, CAST(len(ys) AS BIGINT) AS n_days,
        |  list_reduce(ys, (acc, y) -> (y + 3 * acc) >> 2) AS ewma_micro
        |FROM seq ORDER BY event_type""".stripMargin,
    // Holt: same daily micro totals; the two-state recurrence unrolls via
    // a recursive CTE over the day index (NOT list_reduce: DuckDB 1.0's
    // struct-accumulator reduce corrupts cross-field reads — a field
    // reading a.l after the lambda's l field wrote it sees the NEW value).
    "holt_daily" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT) AS y
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |idx AS (SELECT event_type, y,
        |          row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
        |          count(*) OVER (PARTITION BY event_type) AS n
        |        FROM daily),
        |rec(event_type, i, l, t) AS (
        |  SELECT event_type, i, y, 0::BIGINT FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT d.event_type, d.i,
        |    (d.y + 3 * (r.l + r.t)) >> 2,
        |    ((((d.y + 3 * (r.l + r.t)) >> 2) - r.l) + r.t) >> 1
        |  FROM rec r JOIN idx d ON d.event_type = r.event_type AND d.i = r.i + 1)
        |SELECT r.event_type, CAST(mx.n AS BIGINT) AS n_days,
        |  r.l AS level_micro, r.t AS trend_micro,
        |  r.l + 7 * r.t AS forecast_micro
        |FROM rec r JOIN (SELECT event_type, max(i) AS mi, max(n) AS n
        |                 FROM idx GROUP BY 1) mx
        |  ON mx.event_type = r.event_type AND r.i = mx.mi
        |ORDER BY r.event_type""".stripMargin,
    // Funnel: same per-step min-after-previous construction.
    "funnel" -> funnelOracle,
    // The streaming step machine advances on the first next-step event
    // strictly after the previous step — the same greedy-earliest chain.
    "funnel_stream" -> funnelOracle,
    // Funnel counts: the same step CTEs, counted per prefix.
    "funnel_counts" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, s1.t1, min(e.ts) AS t2
        |       FROM events e JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1
        |       GROUP BY e.user_id, s1.t1),
        |s3 AS (SELECT e.user_id, s2.t1, s2.t2, min(e.ts) AS t3
        |       FROM events e JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |       GROUP BY e.user_id, s2.t1, s2.t2)
        |SELECT 1 AS step, 'view' AS event_type, (SELECT count(*) FROM s1) AS n_entities
        |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
        |ORDER BY step""".stripMargin,
    // Funnel lag distribution: the same step CTEs feeding the histogram
    // quantile rule over integer minutes, 1-day bins.
    "funnel_lag_quantiles" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, s1.t1, min(e.ts) AS t2
        |       FROM events e JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1
        |       GROUP BY e.user_id, s1.t1),
        |s3 AS (SELECT e.user_id, s2.t1, s2.t2, min(e.ts) AS t3
        |       FROM events e JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |       GROUP BY e.user_id, s2.t1, s2.t2),
        |lagm AS (SELECT (epoch_us(t3) - epoch_us(t1)) // 60000000 AS lag_min FROM s3),
        |hist AS (SELECT CAST(floor(CAST(lag_min AS DOUBLE) / 1440.0) AS BIGINT) AS bucket,
        |                count(*) AS n
        |         FROM lagm GROUP BY 1),
        |c AS (SELECT bucket, n,
        |             sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum,
        |             sum(n) OVER () AS total
        |      FROM hist),
        |ps AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p)
        |SELECT ps.p AS p, min(c.bucket) AS bucket,
        |       CAST(min(c.bucket) AS DOUBLE) * 1440.0 AS q_est
        |FROM ps JOIN c ON c.cum >= CAST(ceil(ps.p * CAST(c.total AS DOUBLE)) AS BIGINT)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Sessionize: identical lag/cut/running-sum construction; event_id
    // breaks ts ties so the cut is deterministic on both engines. The
    // streaming twin shares it: stream ≡ batch on ordered replays.
    "sessionize" -> sessionizeOracle,
    "sessionize_stream" -> sessionizeOracle,
    // Retention: cohort = week of first event; (user, week) is distinct so
    // count(*) counts entities.
    "retention_cohorts" ->
      """WITH weeks AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
        |coh AS (SELECT user_id, min(w) AS cohort_w FROM weeks GROUP BY user_id)
        |SELECT strftime(coh.cohort_w, '%Y-%m-%d') AS cohort_week,
        |       date_diff('day', coh.cohort_w, weeks.w) // 7 AS week_offset,
        |       count(*) AS n_entities
        |FROM weeks JOIN coh ON weeks.user_id = coh.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Session paths: same gap cut, per-session ordered string_agg of the
    // first 3 types, total-ordered top 25.
    "session_paths" ->
      """WITH g AS (SELECT user_id, ts, event_id, event_type,
        |                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |           FROM events),
        |f AS (SELECT user_id, ts, event_id, event_type,
        |             CASE WHEN prev IS NULL
        |                    OR epoch_us(ts) - epoch_us(prev) > 1800000000
        |                  THEN 1 ELSE 0 END AS cut
        |      FROM g),
        |sb AS (SELECT user_id, ts, event_id, event_type,
        |              sum(cut) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS sid
        |       FROM f),
        |rn AS (SELECT user_id, sid, event_type,
        |              row_number() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
        |       FROM sb),
        |paths AS (SELECT string_agg(event_type, ' > ' ORDER BY rn) AS path
        |          FROM rn WHERE rn <= 3 GROUP BY user_id, sid)
        |SELECT path, count(*) AS n_sessions FROM paths
        |GROUP BY path ORDER BY n_sessions DESC, path LIMIT 25""".stripMargin,
    // TWAP: same lead() frontier, whole-second durations, floor division.
    "twap_by_type" ->
      """WITH b AS (SELECT event_type, ts, event_id,
        |                  CAST(floor(value * 1000000.0) AS BIGINT) AS vm,
        |                  lead(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        |           FROM events WHERE ts IS NOT NULL AND value >= 0),
        |d AS (SELECT event_type, vm,
        |             (epoch_us(nxt) - epoch_us(ts)) // 1000000 AS dur_s
        |      FROM b WHERE nxt IS NOT NULL)
        |SELECT event_type, count(*) + 1 AS n_events,
        |       CAST(sum(dur_s) AS BIGINT) AS span_s,
        |       CAST(CAST(sum(vm * dur_s) AS BIGINT) // CAST(sum(dur_s) AS BIGINT) AS BIGINT) AS twap_micro
        |FROM d GROUP BY event_type HAVING CAST(sum(dur_s) AS BIGINT) > 0
        |ORDER BY event_type""".stripMargin,
    // CUSUM: same daily micro totals, the three-state recurrence unrolled
    // via a recursive CTE (same list_reduce-bug avoidance as holt_daily).
    "cusum_daily" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT) AS y
        |  FROM events WHERE ts IS NOT NULL AND value >= 0 GROUP BY 1, 2),
        |mu AS (SELECT event_type,
        |         CAST(sum(y) AS BIGINT) // count(*) AS mu,
        |         count(*) AS n
        |       FROM daily GROUP BY 1),
        |idx AS (SELECT d.event_type, d.y, m.mu, (m.mu * 10) // 100 AS thresh, m.n,
        |          row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS i
        |        FROM daily d JOIN mu m USING (event_type)),
        |rec(event_type, i, s, mx, al) AS (
        |  SELECT event_type, i,
        |    greatest(0, y - mu), greatest(0, y - mu),
        |    CASE WHEN greatest(0, y - mu) > thresh THEN 1::BIGINT ELSE 0::BIGINT END
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT d.event_type, d.i,
        |    greatest(0, r.s + d.y - d.mu),
        |    greatest(r.mx, greatest(0, r.s + d.y - d.mu)),
        |    r.al + CASE WHEN greatest(0, r.s + d.y - d.mu) > d.thresh
        |                THEN 1::BIGINT ELSE 0::BIGINT END
        |  FROM rec r JOIN idx d ON d.event_type = r.event_type AND d.i = r.i + 1)
        |SELECT r.event_type, CAST(mx2.n AS BIGINT) AS n_days, mx2.mu AS mu_micro,
        |  r.s AS final_s, r.mx AS max_s, r.al AS n_alarms
        |FROM rec r JOIN (SELECT event_type, max(i) AS mi, max(n) AS n, max(mu) AS mu
        |                 FROM idx GROUP BY 1) mx2
        |  ON mx2.event_type = r.event_type AND r.i = mx2.mi
        |ORDER BY r.event_type""".stripMargin,
    // Gini: numerator 2·Σix − (n+1)·Σx is non-negative for ascending
    // ranks (rearrangement inequality), so DIV and // agree; the
    // denominator pre-divides onto the grid (num·1e6 would overflow).
    "gini_by_type" ->
      """WITH r AS (SELECT event_type,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS v,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS BIGINT) AS i
        |  FROM events WHERE value IS NOT NULL AND value >= 0)
        |SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(v) AS BIGINT) AS sum_micro,
        |  CASE WHEN sum(v) > 0
        |       THEN CAST((2 * sum(i * v) - (count(*) + 1) * sum(v))
        |                 // greatest((count(*) * sum(v)) // 1000000, 1) AS BIGINT)
        |       ELSE 0::BIGINT END AS gini_micro
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    // Skew profile: share floors first, then × distinct (same operand
    // order as the operator — the floor does not distribute).
    "skew_profile" ->
      """WITH c AS (SELECT CAST(o_custkey AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS n
        |           FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_distinct
        |      FROM c)
        |SELECT key, n, n_distinct,
        |  (n * 1000000) // total AS share_micro,
        |  ((n * 1000000) // total) * n_distinct AS skew_x_micro
        |FROM c CROSS JOIN t ORDER BY n DESC, key LIMIT 10""".stripMargin,
    // Benford: digit via string head of the BIGINT; the nine expected
    // constants are spliced from the same Scala computation the operator
    // uses, so both sides carry identical literals.
    "benford_digits" -> {
      val cases = (1 to 9).map(d =>
        s"WHEN $d THEN ${math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong}")
        .mkString(" ")
      s"""WITH c AS (
         |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
         |              AS BIGINT) AS digit,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice >= 1
         |  GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
         |SELECT digit, n,
         |  (n * 1000000) // total AS observed_micro,
         |  CAST(CASE digit $cases ELSE 0 END AS BIGINT) AS benford_micro,
         |  (n * 1000000) // total - CAST(CASE digit $cases ELSE 0 END AS BIGINT)
         |    AS dev_micro
         |FROM c CROSS JOIN t ORDER BY digit""".stripMargin
    },
    // Entropy: identical per-category ln-grid summands, identical fold.
    "category_entropy" ->
      """WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |           FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |             CAST(count(*) AS BIGINT) AS n_cats
        |      FROM c GROUP BY 1)
        |SELECT c.source, max(n) AS n_rows, max(n_cats) AS n_cats,
        |  CAST(sum(CAST(floor((ln(CAST(n AS DOUBLE)) - ln(CAST(c AS DOUBLE)))
        |                       * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
        |                       * 1000000.0) AS BIGINT)) AS BIGINT)
        |    AS entropy_micro_nats
        |FROM c JOIN t USING (source)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Robust stats: same ceil-rank bounds, same clamp; sums only.
    "robust_stats" ->
      """WITH r AS (SELECT event_type,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL),
        |rr AS (SELECT *, (n * 5 + 99) // 100 AS lor, n + 1 - (n * 5 + 99) // 100 AS hir
        |       FROM r),
        |b AS (SELECT event_type,
        |        max(CASE WHEN rk = lor THEN v END) AS lo,
        |        max(CASE WHEN rk = hir THEN v END) AS hi
        |      FROM rr GROUP BY 1)
        |SELECT rr.event_type,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(v) AS BIGINT) AS sum_micro,
        |  CAST(sum(greatest(lo, least(hi, v))) AS BIGINT) AS winsor_sum_micro,
        |  CAST(sum(CASE WHEN rk BETWEEN lor AND hir THEN 1 ELSE 0 END) AS BIGINT)
        |    AS trimmed_n,
        |  CAST(coalesce(sum(CASE WHEN rk BETWEEN lor AND hir THEN v END), 0) AS BIGINT)
        |    AS trimmed_sum_micro
        |FROM rr JOIN b USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // RFM: same entity aggregate, same row_number quintile rule; every
    // operand non-negative so // and DIV agree.
    "rfm_segments" ->
      """WITH base AS (
        |  SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
        |         CAST(count(*) AS BIGINT) AS frequency,
        |         CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0))
        |              AS BIGINT) AS monetary_micro
        |  FROM events
        |  WHERE event_type = 'purchase' AND ts IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY 1),
        |g AS (SELECT max(last_day) AS maxd, count(*) AS n FROM base),
        |r AS (SELECT base.*, g.n,
        |        CAST(datediff('day', last_day, g.maxd) AS BIGINT) AS recency_days,
        |        row_number() OVER (ORDER BY datediff('day', last_day, g.maxd) DESC,
        |                           user_id) AS rr,
        |        row_number() OVER (ORDER BY frequency, user_id) AS fr,
        |        row_number() OVER (ORDER BY monetary_micro, user_id) AS mr
        |      FROM base, g)
        |SELECT user_id, recency_days, frequency, monetary_micro,
        |  CAST((rr - 1) * 5 // n + 1 AS BIGINT) AS r_score,
        |  CAST((fr - 1) * 5 // n + 1 AS BIGINT) AS f_score,
        |  CAST((mr - 1) * 5 // n + 1 AS BIGINT) AS m_score,
        |  CAST(((rr - 1) * 5 // n + 1) * 100 + ((fr - 1) * 5 // n + 1) * 10
        |       + ((mr - 1) * 5 // n + 1) AS BIGINT) AS rfm
        |FROM r ORDER BY user_id""".stripMargin,
    // Seasonality: same daily micro totals, dow = epoch-days mod 7,
    // integer floor divisions throughout (values filtered non-negative).
    // Drift: identical decile-cutoff derivation (rank rule, max per
    // decile, DISTINCT values), identical binning and share arithmetic.
    "score_drift_tvd" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |ref AS (SELECT user_id, score FROM u WHERE user_id % 2 = 0),
        |cur AS (SELECT user_id, score FROM u WHERE user_id % 2 = 1),
        |r AS (SELECT score, row_number() OVER (ORDER BY score, user_id) AS rk FROM ref),
        |nref AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ref),
        |ncur AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cur),
        |cuts AS (SELECT DISTINCT cut FROM (
        |    SELECT ((rk - 1) * 10) // nref.n + 1 AS d, max(score) AS cut
        |    FROM r CROSS JOIN nref GROUP BY 1, nref.n) WHERE d <= 9),
        |rb AS (SELECT u2.user_id,
        |    CAST(1 + (SELECT count(*) FROM cuts WHERE u2.score > cuts.cut) AS BIGINT)
        |      AS bin FROM ref u2),
        |cb AS (SELECT u3.user_id,
        |    CAST(1 + (SELECT count(*) FROM cuts WHERE u3.score > cuts.cut) AS BIGINT)
        |      AS bin FROM cur u3),
        |ra AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_ref FROM rb GROUP BY 1),
        |ca AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_cur FROM cb GROUP BY 1)
        |SELECT COALESCE(ra.bin, ca.bin) AS bin,
        |  COALESCE(ra.n_ref, 0) AS n_ref, COALESCE(ca.n_cur, 0) AS n_cur,
        |  abs(COALESCE(ra.n_ref, 0) * 1000000 // nref.n
        |    - COALESCE(ca.n_cur, 0) * 1000000 // ncur.n) AS gap_micro
        |FROM ra FULL OUTER JOIN ca ON ra.bin = ca.bin
        |  CROSS JOIN nref CROSS JOIN ncur
        |WHERE nref.n > 0 AND ncur.n > 0
        |ORDER BY bin""".stripMargin,
    // KS: cumulative class counts over the union score axis, one DIV
    // per class, argmax gap with ties to the smallest score.
    "ks_score" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 4
        |         THEN 1::BIGINT ELSE 0::BIGINT END AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |g AS (SELECT score, CAST(sum(label) AS BIGINT) AS p,
        |        CAST(sum(1 - label) AS BIGINT) AS q FROM u GROUP BY 1),
        |c AS (SELECT score,
        |    CAST(sum(p) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp,
        |    CAST(sum(q) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn
        |  FROM g),
        |t AS (SELECT CAST(sum(label) AS BIGINT) AS np,
        |        CAST(sum(1 - label) AS BIGINT) AS nn FROM u),
        |k AS (SELECT c.score, abs(cp * 1000000 // np - cn * 1000000 // nn) AS gap
        |      FROM c CROSS JOIN t),
        |r AS (SELECT score, gap,
        |    row_number() OVER (ORDER BY gap DESC, score) AS rn FROM k)
        |SELECT t.np AS n_pos, t.nn AS n_neg, r.gap AS ks_micro, r.score AS at_score
        |FROM r CROSS JOIN t WHERE r.rn = 1 AND t.np > 0 AND t.nn > 0""".stripMargin,
    // AUC: identical per-score-group midranks (min+max row ranks — any
    // intra-tie order gives the same pair) and integer U arithmetic.
    "auc_score" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |r AS (SELECT score, label,
        |    row_number() OVER (ORDER BY score, user_id) AS rk FROM u),
        |g AS (SELECT score, CAST(min(rk) AS BIGINT) AS minr,
        |        CAST(max(rk) AS BIGINT) AS maxr,
        |        CAST(sum(label) AS BIGINT) AS pos
        |      FROM r GROUP BY 1),
        |t AS (SELECT CAST(sum(pos * (minr + maxr)) AS BIGINT) AS s2,
        |        CAST(sum(pos) AS BIGINT) AS n_pos,
        |        CAST(sum(maxr - minr + 1 - pos) AS BIGINT) AS n_neg
        |      FROM g)
        |SELECT n_pos, n_neg,
        |  ((s2 - n_pos * (n_pos + 1)) * 1000000) // (2 * n_pos * n_neg) AS auc_micro
        |FROM t WHERE n_pos > 0 AND n_neg > 0""".stripMargin,
    // Decile lift: identical (score DESC, id) ranks, identical bucket
    // rule and integer lift arithmetic.
    "decile_lift" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |r AS (SELECT user_id, score, label,
        |    row_number() OVER (ORDER BY score DESC, user_id) AS rk FROM u),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(label) AS BIGINT) AS pos FROM u),
        |d AS (SELECT ((rk - 1) * 10) // n.n + 1 AS decile, label
        |      FROM r CROSS JOIN n)
        |SELECT CAST(decile AS BIGINT) AS decile,
        |  CAST(count(*) AS BIGINT) AS n_entities,
        |  CAST(sum(label) AS BIGINT) AS n_positive,
        |  (CAST(sum(label) AS BIGINT) * n.n * 1000000)
        |    // (CAST(count(*) AS BIGINT) * n.pos) AS lift_micro
        |FROM d CROSS JOIN n
        |WHERE n.pos > 0
        |GROUP BY decile, n.n, n.pos ORDER BY decile""".stripMargin,
    // Quantile map: same row_number ranks (identical (value, id) source
    // tiebreak; target tie order is value-irrelevant) and identical
    // ceil-index arithmetic.
    "quantile_map" ->
      """WITH a AS (SELECT event_id AS id, CAST(floor(value * 1000000.0) AS BIGINT) AS v
        |           FROM events WHERE event_type = 'view' AND value IS NOT NULL),
        |b AS (SELECT CAST(floor(value * 1000000.0) AS BIGINT) AS v
        |      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |ar AS (SELECT id, v, row_number() OVER (ORDER BY v, id) AS r FROM a),
        |br AS (SELECT v, row_number() OVER (ORDER BY v) AS rb FROM b),
        |n AS (SELECT (SELECT count(*) FROM a) AS na, (SELECT count(*) FROM b) AS nb)
        |SELECT ar.id AS event_id, ar.v AS value_micro, br.v AS mapped_micro
        |FROM ar CROSS JOIN n
        |  JOIN br ON br.rb = (ar.r * n.nb + n.na - 1) // n.na
        |WHERE n.nb > 0
        |ORDER BY event_id""".stripMargin,
    // Maintained score stats: the folded table must equal a from-scratch
    // per-score recount of the same entities.
    // Grouped KS: identical per-day cumulative class counts, one DIV per
    // class, argmax gap with ties to the smallest score.
    "ks_by_day" -> ksByDaySql,
    "auc_by_day" -> aucByDaySql,
    // ROC points: identical cumulative class counts and floored rates.
    "roc_points" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 4
        |         THEN 1::BIGINT ELSE 0::BIGINT END AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |g AS (SELECT score, CAST(sum(label) AS BIGINT) AS p,
        |        CAST(sum(1 - label) AS BIGINT) AS q FROM u GROUP BY 1),
        |c AS (SELECT score, p, q,
        |    CAST(sum(p) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp,
        |    CAST(sum(q) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cq
        |  FROM g),
        |t AS (SELECT CAST(sum(label) AS BIGINT) AS np,
        |        CAST(sum(1 - label) AS BIGINT) AS nn FROM u),
        |k AS (SELECT c.score AS threshold_micro,
        |        np - cp + p AS tp, nn - cq + q AS fp FROM c CROSS JOIN t
        |      WHERE np > 0 AND nn > 0)
        |SELECT threshold_micro, tp, fp, t.np - tp AS fn, t.nn - fp AS tn,
        |  (tp * 1000000) // t.np AS tpr_micro,
        |  (fp * 1000000) // t.nn AS fpr_micro,
        |  CASE WHEN tp + fp > 0 THEN (tp * 1000000) // (tp + fp) ELSE 0 END
        |    AS precision_micro
        |FROM k CROSS JOIN t ORDER BY threshold_micro""".stripMargin,
    // PSI: same bins as score_drift_tvd, same zero-floor and fixed
    // double tree (DuckDB's ln and floor reproduce the micro values).
    "psi_from_stats" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |ref AS (SELECT user_id, score FROM u WHERE user_id % 2 = 0),
        |cur AS (SELECT user_id, score FROM u WHERE user_id % 2 = 1),
        |r AS (SELECT score, row_number() OVER (ORDER BY score, user_id) AS rk FROM ref),
        |nref AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ref),
        |ncur AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cur),
        |cuts AS (SELECT DISTINCT cut FROM (
        |    SELECT ((rk - 1) * 10) // nref.n + 1 AS d, max(score) AS cut
        |    FROM r CROSS JOIN nref GROUP BY 1, nref.n) WHERE d <= 9),
        |rb AS (SELECT u2.user_id,
        |    CAST(1 + (SELECT count(*) FROM cuts WHERE u2.score > cuts.cut) AS BIGINT)
        |      AS bin FROM ref u2),
        |cb AS (SELECT u3.user_id,
        |    CAST(1 + (SELECT count(*) FROM cuts WHERE u3.score > cuts.cut) AS BIGINT)
        |      AS bin FROM cur u3),
        |ra AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_ref FROM rb GROUP BY 1),
        |ca AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_cur FROM cb GROUP BY 1),
        |j AS (SELECT COALESCE(ra.bin, ca.bin) AS bin,
        |        COALESCE(ra.n_ref, 0) AS n_ref, COALESCE(ca.n_cur, 0) AS n_cur,
        |        CAST(greatest(COALESCE(ra.n_ref, 0), 1) AS DOUBLE) / nref.n AS pr,
        |        CAST(greatest(COALESCE(ca.n_cur, 0), 1) AS DOUBLE) / ncur.n AS pc
        |      FROM ra FULL OUTER JOIN ca ON ra.bin = ca.bin
        |        CROSS JOIN nref CROSS JOIN ncur
        |      WHERE nref.n > 0 AND ncur.n > 0)
        |SELECT bin, n_ref, n_cur,
        |  CAST(floor((pc - pr) * ln(pc / pr) * 1000000.0) AS BIGINT) AS psi_micro
        |FROM j ORDER BY bin""".stripMargin,
    // Calibration: identical integer bin rule, means/rates floored.
    "calibration_from_stats" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |mm AS (SELECT min(score) AS lo, max(score) AS hi FROM u),
        |b AS (SELECT ((score - lo) * 10) // (hi - lo + 1) + 1 AS bin, score, label
        |      FROM u CROSS JOIN mm)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_entities,
        |  CAST(sum(label) AS BIGINT) AS n_positive,
        |  CAST(sum(score) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_score_micro,
        |  (CAST(sum(label) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
        |    AS pos_rate_micro
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    // Streaming twin shares the identical from-scratch recount.
    "score_stats_stream" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
        |SELECT score AS score_micro, CAST(count(*) AS BIGINT) AS n_entities,
        |  CAST(sum(label) AS BIGINT) AS n_positive
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "score_stats_append" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
        |SELECT score AS score_micro, CAST(count(*) AS BIGINT) AS n_entities,
        |  CAST(sum(label) AS BIGINT) AS n_positive
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    // AUC from stats: must equal the entity-grain recomputation exactly
    // (midranks are invariant to intra-tie order).
    "auc_from_stats" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |r AS (SELECT score, label,
        |    row_number() OVER (ORDER BY score, user_id) AS rk FROM u),
        |g AS (SELECT score, CAST(min(rk) AS BIGINT) AS minr,
        |        CAST(max(rk) AS BIGINT) AS maxr,
        |        CAST(sum(label) AS BIGINT) AS pos
        |      FROM r GROUP BY 1),
        |t AS (SELECT CAST(sum(pos * (minr + maxr)) AS BIGINT) AS s2,
        |        CAST(sum(pos) AS BIGINT) AS n_pos,
        |        CAST(sum(maxr - minr + 1 - pos) AS BIGINT) AS n_neg
        |      FROM g)
        |SELECT n_pos, n_neg,
        |  ((s2 - n_pos * (n_pos + 1)) * 1000000) // (2 * n_pos * n_neg) AS auc_micro
        |FROM t WHERE n_pos > 0 AND n_neg > 0""".stripMargin,
    // Decile lift from stats: entity recomputation under the SAME
    // stats-derivable tie rule (score DESC, positives first).
    "decile_lift_from_stats" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |r AS (SELECT user_id, score, label,
        |    row_number() OVER (ORDER BY score DESC, label DESC, user_id) AS rk FROM u),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(label) AS BIGINT) AS pos FROM u),
        |d AS (SELECT ((rk - 1) * 10) // n.n + 1 AS decile, label
        |      FROM r CROSS JOIN n)
        |SELECT CAST(decile AS BIGINT) AS decile,
        |  CAST(count(*) AS BIGINT) AS n_entities,
        |  CAST(sum(label) AS BIGINT) AS n_positive,
        |  (CAST(sum(label) AS BIGINT) * n.n * 1000000)
        |    // (CAST(count(*) AS BIGINT) * n.pos) AS lift_micro
        |FROM d CROSS JOIN n
        |WHERE n.pos > 0
        |GROUP BY decile, n.n, n.pos ORDER BY decile""".stripMargin,
    // KS from stats: identical recomputation to ks_score (cumulative
    // class counts are score-grain already).
    "ks_from_stats" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 4
        |         THEN 1::BIGINT ELSE 0::BIGINT END AS label
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |g AS (SELECT score, CAST(sum(label) AS BIGINT) AS p,
        |        CAST(sum(1 - label) AS BIGINT) AS q FROM u GROUP BY 1),
        |c AS (SELECT score,
        |    CAST(sum(p) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp,
        |    CAST(sum(q) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn
        |  FROM g),
        |t AS (SELECT CAST(sum(label) AS BIGINT) AS np,
        |        CAST(sum(1 - label) AS BIGINT) AS nn FROM u),
        |k AS (SELECT c.score, abs(cp * 1000000 // np - cn * 1000000 // nn) AS gap
        |      FROM c CROSS JOIN t),
        |r AS (SELECT score, gap,
        |    row_number() OVER (ORDER BY gap DESC, score) AS rn FROM k)
        |SELECT t.np AS n_pos, t.nn AS n_neg, r.gap AS ks_micro, r.score AS at_score
        |FROM r CROSS JOIN t WHERE r.rn = 1 AND t.np > 0 AND t.nn > 0""".stripMargin,
    // TVD from stats: the cutoffs are order statistics of the reference
    // scores — identical to score_drift_tvd's recomputation.
    "tvd_from_stats" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |      AS score
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |ref AS (SELECT user_id, score FROM u WHERE user_id % 2 = 0),
        |cur AS (SELECT user_id, score FROM u WHERE user_id % 2 = 1),
        |r AS (SELECT score, row_number() OVER (ORDER BY score, user_id) AS rk FROM ref),
        |nref AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ref),
        |ncur AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cur),
        |cuts AS (SELECT DISTINCT cut FROM (
        |    SELECT ((rk - 1) * 10) // nref.n + 1 AS d, max(score) AS cut
        |    FROM r CROSS JOIN nref GROUP BY 1, nref.n) WHERE d <= 9),
        |rb AS (SELECT u2.user_id,
        |    CAST(1 + (SELECT count(*) FROM cuts WHERE u2.score > cuts.cut) AS BIGINT)
        |      AS bin FROM ref u2),
        |cb AS (SELECT u3.user_id,
        |    CAST(1 + (SELECT count(*) FROM cuts WHERE u3.score > cuts.cut) AS BIGINT)
        |      AS bin FROM cur u3),
        |ra AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_ref FROM rb GROUP BY 1),
        |ca AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_cur FROM cb GROUP BY 1)
        |SELECT COALESCE(ra.bin, ca.bin) AS bin,
        |  COALESCE(ra.n_ref, 0) AS n_ref, COALESCE(ca.n_cur, 0) AS n_cur,
        |  abs(COALESCE(ra.n_ref, 0) * 1000000 // nref.n
        |    - COALESCE(ca.n_cur, 0) * 1000000 // ncur.n) AS gap_micro
        |FROM ra FULL OUTER JOIN ca ON ra.bin = ca.bin
        |  CROSS JOIN nref CROSS JOIN ncur
        |WHERE nref.n > 0 AND ncur.n > 0
        |ORDER BY bin""".stripMargin,
    // Weighted median: same cumulative-crossing spelling; min over the
    // crossing rows makes intra-tie window order irrelevant.
    "weighted_median" ->
      """WITH b AS (SELECT l_returnflag AS k,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
        |    CAST(l_quantity AS BIGINT) AS w FROM lineitem
        |    WHERE l_quantity > 0),
        |c AS (SELECT k, v, w,
        |    sum(w) OVER (PARTITION BY k ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(w) OVER (PARTITION BY k) AS tot FROM b)
        |SELECT k AS l_returnflag, CAST(min(v) AS BIGINT) AS median_cents
        |FROM c WHERE cum * 2 >= tot GROUP BY 1 ORDER BY 1""".stripMargin,
    // Mode: definitional (count DESC, value ASC) row_number argmax.
    "mode_per_key" ->
      """WITH c AS (SELECT l_returnflag AS k, CAST(l_quantity AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT k, v, n,
        |    row_number() OVER (PARTITION BY k ORDER BY n DESC, v) AS rn FROM c)
        |SELECT k AS l_returnflag, v AS mode_value, n AS mode_count
        |FROM r WHERE rn = 1 ORDER BY 1""".stripMargin,
    // ACF: identical integer sums and the identical double expression
    // tree (N·Σxy − ΣxΣy over sqrt of the two deviation products) —
    // IEEE arithmetic is deterministic, so floor lands identically.
    "acf_daily" ->
      """WITH daily AS (
        |  SELECT event_type AS k, CAST(ts AS DATE) AS day,
        |         CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT) // 1000 AS y
        |  FROM events WHERE ts IS NOT NULL AND value >= 0 GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.k, l.lag, a.y AS x, b.y AS y2
        |  FROM daily a
        |    CROSS JOIN (SELECT unnest([1, 7]) AS lag) l
        |    JOIN daily b ON b.k = a.k AND b.day = a.day + l.lag),
        |s AS (SELECT k, lag, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y2) AS BIGINT) AS sy,
        |        CAST(sum(x * y2) AS BIGINT) AS sxy,
        |        CAST(sum(x * x) AS BIGINT) AS sxx,
        |        CAST(sum(y2 * y2) AS BIGINT) AS syy
        |      FROM pairs GROUP BY 1, 2)
        |SELECT k AS event_type, lag, n AS n_pairs,
        |  CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    * 1000000.0) AS BIGINT) AS acf_micro
        |FROM s
        |WHERE n >= 2
        |  AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
        |  AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
        |ORDER BY 1, 2""".stripMargin,
    "seasonality_dow" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT) AS y
        |  FROM events WHERE ts IS NOT NULL AND value >= 0 GROUP BY 1, 2),
        |dw AS (SELECT event_type, day, y,
        |         CAST(datediff('day', DATE '1970-01-01', day) % 7 AS BIGINT) AS dow
        |       FROM daily),
        |om AS (SELECT event_type, CAST(sum(y) AS BIGINT) // count(*) AS omean
        |       FROM dw GROUP BY 1),
        |pr AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(y) AS BIGINT) // count(*) AS mean_micro
        |       FROM dw GROUP BY 1, 2)
        |SELECT pr.event_type, pr.dow, pr.n_days, pr.mean_micro,
        |  CASE WHEN om.omean > 0 THEN (pr.mean_micro * 1000000) // om.omean
        |       ELSE 0::BIGINT END AS factor_micro
        |FROM pr JOIN om USING (event_type) ORDER BY 1, 2""".stripMargin,
    "seasonal_outliers" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT) AS y
        |  FROM events WHERE ts IS NOT NULL AND value >= 0 GROUP BY 1, 2),
        |dw AS (SELECT event_type, day, y,
        |         CAST(datediff('day', DATE '1970-01-01', day) % 7 AS BIGINT) AS dow
        |       FROM daily),
        |pr AS (SELECT event_type, dow,
        |         CAST(sum(y) AS BIGINT) // count(*) AS expected_micro
        |       FROM dw GROUP BY 1, 2),
        |sc AS (SELECT dw.event_type, dw.day, dw.dow, dw.y AS daily_micro,
        |         pr.expected_micro,
        |         CASE WHEN pr.expected_micro > 0
        |              THEN (dw.y * 1000000) // pr.expected_micro
        |              ELSE 0::BIGINT END AS ratio_micro
        |       FROM dw JOIN pr USING (event_type, dow)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY abs(ratio_micro - 1000000) DESC, day) AS rn FROM sc)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, dow, daily_micro,
        |       expected_micro, ratio_micro
        |FROM r WHERE rn <= 3 ORDER BY event_type, day""".stripMargin,
    // Skyline: from-scratch NOT-EXISTS dominance, applied over the
    // per-x minima (the frontier-membership lemma — only a size's
    // cheapest rows can survive — keeps the quadratic check on the
    // bounded distinct-x frame). Comparisons only, no float arithmetic.
    "skyline_parts" ->
      """WITH g AS (SELECT p_brand, p_size, min(p_retailprice) AS gy
        |           FROM part GROUP BY 1, 2),
        |sky AS (SELECT * FROM g p WHERE NOT EXISTS (
        |  SELECT 1 FROM g q WHERE q.p_brand = p.p_brand
        |    AND q.p_size <= p.p_size AND q.gy <= p.gy
        |    AND (q.p_size < p.p_size OR q.gy < p.gy)))
        |SELECT p.p_brand, p.p_partkey, CAST(p.p_size AS BIGINT) AS p_size,
        |       p.p_retailprice
        |FROM part p JOIN sky s ON p.p_brand = s.p_brand
        |  AND p.p_size = s.p_size AND p.p_retailprice = s.gy
        |ORDER BY 1, 3, 2""".stripMargin,
    "skyline_append" -> // maintained frontier ≡ from-scratch skyline
      """WITH b AS (SELECT o_orderkey,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS oday,
        |    o_totalprice FROM orders),
        |g AS (SELECT oday, min(o_totalprice) AS gy FROM b GROUP BY 1),
        |sky AS (SELECT * FROM g p WHERE NOT EXISTS (
        |  SELECT 1 FROM g q WHERE q.oday <= p.oday AND q.gy <= p.gy
        |    AND (q.oday < p.oday OR q.gy < p.gy)))
        |SELECT b.o_orderkey, b.oday, b.o_totalprice
        |FROM b JOIN sky s ON b.oday = s.oday AND b.o_totalprice = s.gy
        |ORDER BY b.oday, b.o_orderkey""".stripMargin,
    "skyline_orders" ->
      """WITH b AS (SELECT o_orderkey,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS oday,
        |    o_totalprice FROM orders),
        |g AS (SELECT oday, min(o_totalprice) AS gy FROM b GROUP BY 1),
        |sky AS (SELECT * FROM g p WHERE NOT EXISTS (
        |  SELECT 1 FROM g q WHERE q.oday <= p.oday AND q.gy <= p.gy
        |    AND (q.oday < p.oday OR q.gy < p.gy)))
        |SELECT b.o_orderkey, b.oday, b.o_totalprice
        |FROM b JOIN sky s ON b.oday = s.oday AND b.o_totalprice = s.gy
        |ORDER BY b.oday, b.o_orderkey""".stripMargin,
    // Gap-fill: generate_series calendar per user, LOCF via IGNORE NULLS.
    "gap_fill_daily" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n,
        |                      sum(CAST(value AS DECIMAL(18,6))) AS v
        |               FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1),
        |cal AS (SELECT user_id,
        |               CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
        |                                           INTERVAL 1 DAY)) AS DATE) AS day
        |        FROM span),
        |j AS (SELECT cal.user_id, cal.day, daily.n, daily.v
        |      FROM cal LEFT JOIN daily ON cal.user_id = daily.user_id AND cal.day = daily.day)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        |       coalesce(n, 0) AS n_events,
        |       CAST(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |              ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS value_filled
        |FROM j ORDER BY user_id, day""".stripMargin,
    // Anomalies: identical integer-micro quantization, trailing frame, and
    // double-expression tree (left-assoc division chains) both sides.
    // The streaming twin shares it: verdicts are final on arrival.
    "anomaly_events" -> anomalyOracle,
    "anomaly_events_stream" -> anomalyOracle,
    // Composition: the three per-user boards re-derived from scratch and
    // joined — sessions via the same cut/running-sum, anomalies via the
    // same z chain, attribution via the same ignore-nulls carry.
    "analytics_pipeline" ->
      """WITH g AS (SELECT user_id, ts, event_id, value,
        |                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |           FROM events),
        |f AS (SELECT user_id, ts, event_id,
        |             CASE WHEN prev IS NULL
        |                    OR epoch_us(ts) - epoch_us(prev) > 1800000000
        |                  THEN 1 ELSE 0 END AS cut
        |      FROM g),
        |sb AS (SELECT user_id,
        |              CAST(sum(cut) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |       FROM f),
        |nsess AS (SELECT user_id, max(session_id) AS n_sessions FROM sb GROUP BY 1),
        |base AS (SELECT user_id, count(*) AS n_events,
        |                CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |         FROM events GROUP BY 1),
        |w AS (SELECT user_id, ts, event_id, value,
        |             CAST(floor(value * 1000000.0) AS BIGINT) AS vm
        |      FROM events),
        |t AS (SELECT user_id, vm,
        |             count(vm)    OVER win AS n,
        |             sum(vm)      OVER win AS s1,
        |             sum(vm * vm) OVER win AS s2
        |      FROM w
        |      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |m AS (SELECT user_id, vm, n,
        |             CAST(s1 AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE) AS mean,
        |             CAST(s2 AS DOUBLE) / 1000000000000.0 / CAST(n AS DOUBLE) AS ex2
        |      FROM t WHERE n >= 8),
        |v AS (SELECT user_id, vm, n, mean,
        |             (ex2 - mean * mean) * CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0) AS varr
        |      FROM m),
        |z AS (SELECT user_id,
        |             CAST(floor((CAST(vm AS DOUBLE) / 1000000.0 - mean) / sqrt(varr)
        |                        * 1000000.0) AS BIGINT) AS z_micro
        |      FROM v WHERE varr > 0.0),
        |nanom AS (SELECT user_id, count(*) AS n_anomalies FROM z
        |          WHERE abs(z_micro) > 2000000 GROUP BY 1),
        |att AS (SELECT user_id, event_type,
        |  last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END
        |             IGNORE NULLS) OVER win2 AS touch_type
        |        FROM events
        |        WINDOW win2 AS (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |nattr AS (SELECT user_id, count(*) AS n_attributed FROM att
        |          WHERE event_type = 'purchase' AND touch_type IS NOT NULL GROUP BY 1)
        |SELECT b.user_id, nsess.n_sessions, b.n_events, b.total_value,
        |       CAST(COALESCE(nanom.n_anomalies, 0) AS BIGINT) AS n_anomalies,
        |       CAST(COALESCE(nattr.n_attributed, 0) AS BIGINT) AS n_attributed
        |FROM base b JOIN nsess USING (user_id)
        |LEFT JOIN nanom USING (user_id) LEFT JOIN nattr USING (user_id)
        |ORDER BY user_id""".stripMargin,
    // Rolling actives: same (user, day) distinct + 7-day contribution
    // expansion; inner join restricts to observed days.
    "active_users_rolling" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        |contrib AS (SELECT DISTINCT user_id,
        |  CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
        |                              CAST(day AS TIMESTAMP) + INTERVAL 6 DAY,
        |                              INTERVAL 1 DAY)) AS DATE) AS day
        |            FROM ud),
        |roll AS (SELECT c.day, count(*) AS rolling_active FROM contrib c
        |         JOIN (SELECT DISTINCT day FROM ud) obs USING (day) GROUP BY 1)
        |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, roll.rolling_active
        |FROM dau JOIN roll USING (day) ORDER BY 1""".stripMargin,
    "stickiness_daily" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        |contrib AS (SELECT DISTINCT user_id,
        |  CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
        |                              CAST(day AS TIMESTAMP) + INTERVAL 27 DAY,
        |                              INTERVAL 1 DAY)) AS DATE) AS day
        |            FROM ud),
        |roll AS (SELECT c.day, count(*) AS rolling_active FROM contrib c
        |         JOIN (SELECT DISTINCT day FROM ud) obs USING (day) GROUP BY 1)
        |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, roll.rolling_active,
        |       CAST((dau.dau * 1000000) // roll.rolling_active AS BIGINT) AS stickiness_micro
        |FROM dau JOIN roll USING (day) ORDER BY 1""".stripMargin,
    // Geo radius join: brute-force replica (the fixture point count makes
    // all-pairs tractable in the oracle; the engine's grid join must find
    // exactly the same pairs). Same portable hash coordinates.
    "geo_radius_join" ->
      """WITH pts AS (SELECT c_custkey AS id,
        |  (('0x' || substring(md5('gx:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS x,
        |  (('0x' || substring(md5('gy:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS y
        |             FROM customer)
        |SELECT a.id AS id1, b.id AS id2,
        |       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
        |FROM pts a JOIN pts b ON a.id < b.id
        |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 400000000
        |ORDER BY id1, id2""".stripMargin,
    // Hybrid RRF: the bm25Oracle scoring CTEs at LIMIT 50 + the
    // ann_bruteforce cosine ranking for query vec 0, fused by
    // 1e6 // (60 + rank).
    "hybrid_search_rrf" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM tok),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS total,
        |        CAST(sum(CASE WHEN list_contains(toks, 'customer') THEN 1 ELSE 0 END) AS BIGINT) AS dfc,
        |        CAST(sum(CASE WHEN list_contains(toks, 'merge') THEN 1 ELSE 0 END) AS BIGINT) AS dfm,
        |        CAST(sum(CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS dfs
        |      FROM d),
        |i AS (SELECT n, total,
        |        CAST(floor(ln(1.0 + (n - dfc + 0.5) / (dfc + 0.5)) * 1000000.0) AS BIGINT) AS idfc,
        |        CAST(floor(ln(1.0 + (n - dfm + 0.5) / (dfm + 0.5)) * 1000000.0) AS BIGINT) AS idfm,
        |        CAST(floor(ln(1.0 + (n - dfs + 0.5) / (dfs + 0.5)) * 1000000.0) AS BIGINT) AS idfs
        |      FROM g),
        |tf AS (SELECT doc_id, dl,
        |         CAST(len(list_filter(toks, x -> x = 'customer')) AS DOUBLE) AS tfc,
        |         CAST(len(list_filter(toks, x -> x = 'merge')) AS DOUBLE) AS tfm,
        |         CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) AS tfs
        |       FROM d),
        |sc AS (
        |  SELECT doc_id,
        |    CAST(floor(idfc * tfc * (1.2 + 1.0) / (tfc + 1.2 * (0.25 + 0.75 * dl * n / total))) AS BIGINT)
        |  + CAST(floor(idfm * tfm * (1.2 + 1.0) / (tfm + 1.2 * (0.25 + 0.75 * dl * n / total))) AS BIGINT)
        |  + CAST(floor(idfs * tfs * (1.2 + 1.0) / (tfs + 1.2 * (0.25 + 0.75 * dl * n / total))) AS BIGINT)
        |      AS score_micro
        |  FROM tf CROSS JOIN i),
        |lex AS (SELECT doc_id, rank FROM (
        |          SELECT doc_id, row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rank
        |          FROM sc WHERE score_micro > 0) WHERE rank <= 50),
        |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0),
        |sem0 AS (SELECT vec_id AS cid, list_cosine_similarity(qvec, CAST(embedding AS DOUBLE[])) AS cos
        |         FROM embeddings CROSS JOIN qv WHERE vec_id <> 0),
        |sem AS (SELECT cid AS doc_id, rank FROM (
        |          SELECT cid, row_number() OVER (ORDER BY cos DESC, cid) AS rank
        |          FROM sem0) WHERE rank <= 50),
        |u AS (SELECT doc_id, 1000000 // (60 + rank) AS s FROM lex
        |      UNION ALL SELECT doc_id, 1000000 // (60 + rank) AS s FROM sem)
        |SELECT doc_id, CAST(sum(s) AS BIGINT) AS rrf_micro, count(*) AS n_lists
        |FROM u GROUP BY 1 ORDER BY rrf_micro DESC, doc_id LIMIT 20""".stripMargin,
    // Triangles: brute 3-way self-join replica (a<b<c each counted once),
    // same integer micro clustering rule.
    "graph_triangles" ->
      """WITH pts AS (SELECT c_custkey AS id,
        |  (('0x' || substring(md5('gx:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS x,
        |  (('0x' || substring(md5('gy:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS y
        |             FROM customer),
        |e AS (SELECT a.id AS a, b.id AS b FROM pts a JOIN pts b ON a.id < b.id
        |      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 400000000),
        |deg AS (SELECT node, count(*) AS degree FROM (
        |          SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |        GROUP BY 1),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1 JOIN e e2 ON e2.a = e1.b
        |                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pern AS (SELECT node, count(*) AS triangles FROM (
        |           SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
        |           UNION ALL SELECT z FROM tri)
        |         GROUP BY 1)
        |SELECT d.node, d.degree, CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles,
        |       CASE WHEN d.degree >= 2
        |            THEN (CAST(COALESCE(p.triangles, 0) AS BIGINT) * 2000000)
        |                   // (d.degree * (d.degree - 1))
        |            ELSE CAST(0 AS BIGINT) END AS clustering_micro
        |FROM deg d LEFT JOIN pern p USING (node)
        |ORDER BY triangles DESC, node LIMIT 100""".stripMargin,
    // k-core: the same proximity edges, 10 unrolled peel rounds (fixture
    // fixpoint is ≤ 6 at sf0.01; extra rounds are no-ops).
    "graph_kcore" -> kcoreOracle,
    // Components: recursive-CTE transitive closure over the same sparse
    // proximity edges; comp = min reachable id.
    "graph_components" ->
      """WITH RECURSIVE pts AS (SELECT c_custkey AS id,
        |  (('0x' || substring(md5('gx:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS x,
        |  (('0x' || substring(md5('gy:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS y
        |             FROM customer WHERE c_custkey % 10 = 0),
        |e AS (SELECT a.id AS id_a, b.id AS id_b FROM pts a JOIN pts b ON a.id < b.id
        |      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 400000000),
        |edge AS (SELECT id_a AS a, id_b AS b FROM e UNION SELECT id_b, id_a FROM e),
        |reach(a, b) AS (
        |  SELECT a, b FROM edge
        |  UNION
        |  SELECT r.a, x.b FROM reach r JOIN edge x ON r.b = x.a)
        |SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a ORDER BY id""".stripMargin,
    // Weighted SSSP: recursive walk carrying (cost, hops), hop-capped at
    // 3; dist = min cost per reached node. Parallel arcs pre-minned like
    // the operator so the walk stays bounded.
    "graph_shortest_paths" ->
      """WITH RECURSIVE pts AS (SELECT c_custkey AS id,
        |  (('0x' || substring(md5('gx:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS x,
        |  (('0x' || substring(md5('gy:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS y
        |             FROM customer WHERE c_custkey % 10 = 0),
        |e AS (SELECT a.id AS id1, b.id AS id2,
        |        (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS w
        |      FROM pts a JOIN pts b ON a.id < b.id
        |      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 400000000),
        |edge AS (SELECT id1 AS a, id2 AS b, min(w) AS w FROM (
        |           SELECT id1, id2, w FROM e UNION ALL SELECT id2, id1, w FROM e)
        |         GROUP BY 1, 2),
        |walk(node, d, h) AS (
        |  SELECT id, CAST(0 AS BIGINT), 0 FROM pts WHERE id % 100 = 0
        |  UNION
        |  SELECT x.b, w.d + x.w, w.h + 1 FROM walk w JOIN edge x ON w.node = x.a
        |  WHERE w.h < 3)
        |SELECT node, CAST(min(d) AS BIGINT) AS dist FROM walk
        |GROUP BY node ORDER BY node""".stripMargin,
    // LPA: two synchronous rounds as chained CTEs; argmax per node by
    // (count DESC, label ASC) row_number — the definitional spelling.
    "graph_label_prop" ->
      """WITH pts AS (SELECT c_custkey AS id,
        |  (('0x' || substring(md5('gx:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS x,
        |  (('0x' || substring(md5('gy:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS y
        |             FROM customer WHERE c_custkey % 10 = 0),
        |e AS (SELECT a.id AS id_a, b.id AS id_b FROM pts a JOIN pts b ON a.id < b.id
        |      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 400000000),
        |edge AS (SELECT id_a AS a, id_b AS b FROM e UNION SELECT id_b, id_a FROM e),
        |l0 AS (SELECT DISTINCT a AS node, a AS label FROM edge),
        |r1 AS (SELECT e.a AS node, l.label, count(*) AS c
        |       FROM edge e JOIN l0 l ON e.b = l.node GROUP BY 1, 2),
        |l1 AS (SELECT node, label FROM (SELECT node, label,
        |         row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
        |       FROM r1) WHERE rn = 1),
        |r2 AS (SELECT e.a AS node, l.label, count(*) AS c
        |       FROM edge e JOIN l1 l ON e.b = l.node GROUP BY 1, 2),
        |l2 AS (SELECT node, label FROM (SELECT node, label,
        |         row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
        |       FROM r2) WHERE rn = 1)
        |SELECT node AS id, label FROM l2 ORDER BY id""".stripMargin,
    // BFS: recursive CTE bounded at 6 hops (UNION dedupes, the depth
    // guard terminates it); dist = min hop per reached node.
    "graph_bfs" ->
      """WITH RECURSIVE pts AS (SELECT c_custkey AS id,
        |  (('0x' || substring(md5('gx:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS x,
        |  (('0x' || substring(md5('gy:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS y
        |             FROM customer WHERE c_custkey % 10 = 0),
        |e AS (SELECT a.id AS id1, b.id AS id2 FROM pts a JOIN pts b ON a.id < b.id
        |      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 400000000),
        |edge AS (SELECT id1 AS a, id2 AS b FROM e UNION SELECT id2, id1 FROM e),
        |walk(node, d) AS (
        |  SELECT id, 0 FROM pts WHERE id % 100 = 0
        |  UNION
        |  SELECT x.b, w.d + 1 FROM walk w JOIN edge x ON w.node = x.a WHERE w.d < 6)
        |SELECT node, CAST(min(d) AS BIGINT) AS dist
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,
    // Nearest neighbor: same radius pairs symmetrized, argmin by
    // (dist2, nn) via row_number.
    "geo_nearest" ->
      """WITH pts AS (SELECT c_custkey AS id,
        |  (('0x' || substring(md5('gx:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS x,
        |  (('0x' || substring(md5('gy:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |     % 2147483647) % 1000000 AS y
        |             FROM customer),
        |e AS (SELECT a.id AS id1, b.id AS id2,
        |        (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
        |      FROM pts a JOIN pts b ON a.id < b.id
        |      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 400000000),
        |sym AS (SELECT id1 AS id, id2 AS nn, dist2 FROM e
        |        UNION ALL SELECT id2, id1, dist2 FROM e),
        |r AS (SELECT id, nn, dist2,
        |             row_number() OVER (PARTITION BY id ORDER BY dist2, nn) AS rn
        |      FROM sym)
        |SELECT id, nn AS nn_id, dist2 FROM r WHERE rn = 1 ORDER BY id""".stripMargin,
    // Rank normalization: same row_number ranks, same integer floor rules.
    "rank_normalize" ->
      """WITH r AS (SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rank,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, event_id, value,
        |  CAST(CASE WHEN n > 1 THEN ((rank - 1) * 1000000) // (n - 1) ELSE 0 END AS BIGINT) AS pct_micro,
        |  CAST(((rank - 1) * 4) // n AS BIGINT) AS bucket
        |FROM r ORDER BY event_type, event_id""".stripMargin,
    // PMI: same tokenization, deterministic vocab cut, BIGINT products,
    // 1e-6 ln grid, total-ordered top-K.
    "pmi_pairs" ->
      """WITH pres AS (SELECT DISTINCT doc_id,
        |  unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS term
        |              FROM documents),
        |n AS (SELECT count(*) AS n FROM documents),
        |ct AS (SELECT term, count(*) AS c FROM pres GROUP BY 1),
        |voc AS (SELECT term, c FROM ct ORDER BY c DESC, term LIMIT 100),
        |r AS (SELECT p.doc_id, p.term, v.c FROM pres p JOIN voc v USING (term)),
        |pairs AS (SELECT a.term AS t1, b.term AS t2, a.c AS c1, b.c AS c2,
        |                 count(*) AS n_ab
        |          FROM r a JOIN r b ON a.doc_id = b.doc_id AND a.term < b.term
        |          GROUP BY 1, 2, 3, 4),
        |sc AS (SELECT t1, t2, n_ab,
        |  CAST(floor(ln(CAST(n.n * n_ab AS DOUBLE) / CAST(c1 * c2 AS DOUBLE))
        |             * 1000000.0) AS BIGINT) AS pmi_micro
        |       FROM pairs CROSS JOIN n WHERE n_ab >= 5)
        |SELECT t1, t2, n_ab, pmi_micro FROM sc
        |ORDER BY pmi_micro DESC, t1, t2 LIMIT 50""".stripMargin,
    // Trend: same integer OLS sums, same fixed double tree for the slope.
    "trend_slopes" ->
      """WITH mn AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        |daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                 sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS y
        |          FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |s AS (SELECT event_type,
        |             count(*) AS n,
        |             CAST(sum(date_diff('day', mn.d0, day)) AS BIGINT) AS sx,
        |             CAST(sum(y) AS BIGINT) AS sy,
        |             CAST(sum(date_diff('day', mn.d0, day) * y) AS BIGINT) AS sxy,
        |             CAST(sum(date_diff('day', mn.d0, day) * date_diff('day', mn.d0, day)) AS BIGINT) AS sxx
        |      FROM daily CROSS JOIN mn GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |       CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT)
        |         AS slope_micro_per_day
        |FROM s
        |WHERE n >= 2 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0
        |ORDER BY event_type""".stripMargin,
    // A/B: same split, same conversion flag, same pooled-SE double tree.
    "ab_test_events" ->
      """WITH u AS (SELECT user_id,
        |                  max(CASE WHEN event_type = 'purchase' AND value > 480.0
        |                           THEN 1 ELSE 0 END) AS conv,
        |                  CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS variant
        |           FROM events GROUP BY user_id),
        |a AS (SELECT CAST(sum(CASE WHEN variant = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |             CAST(sum(CASE WHEN variant = 'a' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        |             CAST(sum(CASE WHEN variant = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |             CAST(sum(CASE WHEN variant = 'b' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        |      FROM u)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  CAST(floor((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |              - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)) * 1000000.0) AS BIGINT)
        |    AS lift_micro,
        |  CAST(floor((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |              - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |                    * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |             * 1000000.0) AS BIGINT) AS z_micro
        |FROM a""".stripMargin,
    // KS: identical integer construction, same floor-division report.
    "ks_test_events" ->
      """WITH s AS (SELECT CAST(floor(value * 1000000.0) AS BIGINT) AS vm,
        |                  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ia,
        |                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
        |           FROM events
        |           WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
        |c AS (SELECT vm, CAST(sum(ia) AS BIGINT) AS c1, CAST(sum(ib) AS BIGINT) AS c2
        |      FROM s GROUP BY 1),
        |k AS (SELECT sum(c1) OVER (ORDER BY vm ROWS UNBOUNDED PRECEDING) AS cum1,
        |             sum(c2) OVER (ORDER BY vm ROWS UNBOUNDED PRECEDING) AS cum2,
        |             sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
        |      FROM c),
        |m AS (SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
        |             CAST(max(abs(n2 * cum1 - n1 * cum2)) AS BIGINT) AS d_num
        |      FROM k)
        |SELECT n1, n2, d_num,
        |       CAST((d_num * 1000000) // (n1 * n2) AS BIGINT) AS d_micro
        |FROM m""".stripMargin,
    // Chi-square: full grid incl. zero cells, per-cell 1e-6 floor before
    // the order-free sum. DuckDB dayofweek is 0-based (Sunday=0); +1
    // aligns it with Spark's 1-based convention.
    "chi_square_events" ->
      """WITH o AS (SELECT event_type, dayofweek(ts) + 1 AS dow, count(*) AS o
        |           FROM events GROUP BY 1, 2),
        |ra AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS ra FROM o GROUP BY 1),
        |cb AS (SELECT dow, CAST(sum(o) AS BIGINT) AS cb FROM o GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS t FROM o),
        |grid AS (SELECT ra.event_type, cb.dow, ra.ra, cb.cb,
        |                COALESCE(o.o, 0) AS o
        |         FROM ra CROSS JOIN cb
        |         LEFT JOIN o ON o.event_type = ra.event_type AND o.dow = cb.dow),
        |terms AS (SELECT CAST(floor((CAST(o AS DOUBLE)
        |                              - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(tot.t AS DOUBLE))
        |                            * (CAST(o AS DOUBLE)
        |                              - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(tot.t AS DOUBLE))
        |                            / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(tot.t AS DOUBLE))
        |                            * 1000000.0) AS BIGINT) AS term
        |          FROM grid CROSS JOIN tot)
        |SELECT tot.t AS n,
        |       CAST(((SELECT count(*) FROM ra) - 1) * ((SELECT count(*) FROM cb) - 1) AS BIGINT) AS dof,
        |       CAST(sum(term) AS BIGINT) AS chi2_micro
        |FROM terms CROSS JOIN tot GROUP BY tot.t""".stripMargin,
    "markov_transitions" ->
      """WITH seq AS (SELECT user_id, event_type, ts, event_id,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |edges AS (SELECT prev AS src, event_type AS dst, count(*) AS w
        |          FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
        |ow AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1)
        |SELECT e.src, e.dst, e.w, CAST((e.w * 1000000) // ow.ow AS BIGINT) AS p_micro
        |FROM edges e JOIN ow ON ow.src = e.src
        |ORDER BY e.src, e.dst""".stripMargin,
    "popularity_decay" ->
      """WITH mx AS (SELECT max(CAST(ts AS DATE)) AS md FROM events),
        |w AS (SELECT event_type,
        |             1000000 // (CAST(1 AS BIGINT) << LEAST(
        |               date_diff('day', CAST(ts AS DATE), mx.md) // 30, 40)) AS wm
        |      FROM events CROSS JOIN mx WHERE ts IS NOT NULL)
        |SELECT event_type, count(*) AS n_events,
        |       CAST(sum(wm) AS BIGINT) AS decayed_micro
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,
    "pagerank_transitions" -> pagerankOracle,
    // HITS: two unrolled rounds; L1-normalization divides by the
    // pre-divided total (s // greatest(t // 1e6, 1)) exactly as the
    // operator does, so every integer matches bit-for-bit.
    "graph_hits" ->
      """WITH seq AS (SELECT user_id, event_type, ts, event_id,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |edges AS (SELECT prev AS src, event_type AS dst, CAST(count(*) AS BIGINT) AS w
        |          FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |a1r AS (SELECT dst AS node, CAST(sum(1000000 * w) AS BIGINT) AS s
        |        FROM edges GROUP BY 1),
        |a1 AS (SELECT node, s // greatest((SELECT sum(s) FROM a1r) // 1000000, 1) AS v FROM a1r),
        |h1r AS (SELECT e.src AS node, CAST(sum(a.v * e.w) AS BIGINT) AS s
        |        FROM edges e JOIN a1 a ON a.node = e.dst GROUP BY 1),
        |h1 AS (SELECT node, s // greatest((SELECT sum(s) FROM h1r) // 1000000, 1) AS v FROM h1r),
        |a2r AS (SELECT e.dst AS node, CAST(sum(h.v * e.w) AS BIGINT) AS s
        |        FROM edges e JOIN h1 h ON h.node = e.src GROUP BY 1),
        |a2 AS (SELECT node, s // greatest((SELECT sum(s) FROM a2r) // 1000000, 1) AS v FROM a2r),
        |h2r AS (SELECT e.src AS node, CAST(sum(a.v * e.w) AS BIGINT) AS s
        |        FROM edges e JOIN a2 a ON a.node = e.dst GROUP BY 1),
        |h2 AS (SELECT node, s // greatest((SELECT sum(s) FROM h2r) // 1000000, 1) AS v FROM h2r)
        |SELECT n.node, CAST(coalesce(h2.v, 0) AS BIGINT) AS hub_micro,
        |       CAST(coalesce(a2.v, 0) AS BIGINT) AS auth_micro
        |FROM nodes n LEFT JOIN h2 ON h2.node = n.node LEFT JOIN a2 ON a2.node = n.node
        |ORDER BY n.node""".stripMargin,
    "graph_ppr" -> pprOracle,
    "kmv_distinct" -> kmvOracle,
    "kmv_distinct_merge" -> kmvOracle, // exact merge ≡ fresh sketch
    "kmv_distinct_append" -> kmvOracle, // stored+appended table ≡ fresh sketch
    // KMV pairwise similarity: same per-key 128-min sketches, union top-k
    // with membership flags, same (k-1)/h_k union estimator.
    "kmv_jaccard" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |  ('0x' || substring(md5('kmv:' || CAST(user_id AS VARCHAR) || ':'
        |                         || strftime(ts, '%Y-%m-%d')), 1, 15))::BIGINT AS h
        |           FROM events),
        |r AS (SELECT event_type, h,
        |             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |      FROM h),
        |sk AS (SELECT event_type, h FROM r WHERE rn <= 128),
        |keys AS (SELECT DISTINCT event_type FROM sk),
        |p AS (SELECT a.event_type AS key_a, b.event_type AS key_b
        |      FROM keys a JOIN keys b ON a.event_type < b.event_type),
        |u AS (SELECT p.key_a, p.key_b, s.h,
        |        max(CASE WHEN s.event_type = p.key_a THEN 1 ELSE 0 END) AS ina,
        |        max(CASE WHEN s.event_type = p.key_b THEN 1 ELSE 0 END) AS inb
        |      FROM p JOIN sk s ON s.event_type IN (p.key_a, p.key_b)
        |      GROUP BY 1, 2, 3),
        |t AS (SELECT key_a, key_b, h, ina, inb,
        |             row_number() OVER (PARTITION BY key_a, key_b ORDER BY h) AS rn
        |      FROM u),
        |g AS (SELECT key_a, key_b, count(*) AS n_kept, max(h) AS kth,
        |             CAST(sum(ina * inb) AS BIGINT) AS n_common
        |      FROM t WHERE rn <= 128 GROUP BY 1, 2)
        |SELECT key_a, key_b, n_kept, n_common,
        |  CAST((n_common * 1000000) // n_kept AS BIGINT) AS jaccard_micro,
        |  CASE WHEN n_kept < 128 THEN CAST(n_kept AS DOUBLE)
        |       ELSE 127.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE) END AS union_est,
        |  (CASE WHEN n_kept < 128 THEN CAST(n_kept AS DOUBLE)
        |        ELSE 127.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE) END)
        |    * (CAST(n_common AS DOUBLE) / CAST(n_kept AS DOUBLE)) AS inter_est
        |FROM g ORDER BY key_a, key_b""".stripMargin,
    // Cohort LTV: first-event-week cohorts, decimal week/cumulative sums.
    "cohort_ltv" ->
      """WITH f AS (SELECT user_id, min(ts) AS fts FROM events
        |           WHERE ts IS NOT NULL GROUP BY 1),
        |w AS (SELECT e.user_id,
        |        CAST(date_trunc('week', f.fts) AS DATE) AS cohort_week,
        |        CAST(date_diff('day', CAST(date_trunc('week', f.fts) AS DATE),
        |                       CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT)
        |          AS age_weeks,
        |        CAST(e.value AS DECIMAL(18,6)) AS v
        |      FROM events e JOIN f USING (user_id) WHERE e.ts IS NOT NULL),
        |a AS (SELECT cohort_week, age_weeks, count(DISTINCT user_id) AS n_active,
        |             sum(v) AS wv
        |      FROM w GROUP BY 1, 2)
        |SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, age_weeks, n_active,
        |  CAST(wv AS DOUBLE) AS week_value,
        |  CAST(sum(wv) OVER (PARTITION BY cohort_week ORDER BY age_weeks
        |                     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_value
        |FROM a ORDER BY cohort_week, age_weeks""".stripMargin,
    // HLL inclusion-exclusion overlap: per-key registers, per-key and
    // union estimates all from the same recomputation the hll oracles use.
    "hll_overlap" -> {
      val num = graft.operators.Sketches.HllEstNumerator.toString
      def estSql(src: String, keyCols: String): String =
        s"""SELECT $keyCols,
           |  CAST(floor(CASE WHEN CAST($num AS DOUBLE) / CAST(s AS DOUBLE) <= 10240.0
           |                   AND n_zero > 0
           |       THEN 4096.0 * ln(4096.0 / CAST(n_zero AS DOUBLE))
           |       ELSE CAST($num AS DOUBLE) / CAST(s AS DOUBLE) END * 1000000.0) AS BIGINT)
           |    AS e
           |FROM (SELECT $keyCols, CAST(4096 - count(*) AS BIGINT) AS n_zero,
           |        CAST(CAST(SUM(1::BIGINT << (49 - r)) AS BIGINT)
           |             + (4096 - count(*)) * (1::BIGINT << 49) AS BIGINT) AS s
           |      FROM $src GROUP BY $keyCols)""".stripMargin
      s"""WITH hx AS (SELECT event_type AS k,
         |  ('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |reg AS (SELECT k, h >> 48 AS bucket,
         |  max(CASE WHEN (h & ((1::BIGINT << 48) - 1)) = 0 THEN 49
         |      ELSE 49 - len(bin(h & ((1::BIGINT << 48) - 1))) END) AS r
         |  FROM hx GROUP BY k, h >> 48),
         |est AS (${estSql("reg", "k")}),
         |keys AS (SELECT DISTINCT k FROM reg),
         |p AS (SELECT a.k AS key_a, b.k AS key_b FROM keys a JOIN keys b ON a.k < b.k),
         |ureg AS (SELECT p.key_a, p.key_b, reg.bucket, max(reg.r) AS r
         |         FROM p JOIN reg ON reg.k IN (p.key_a, p.key_b) GROUP BY 1, 2, 3),
         |uest AS (${estSql("ureg", "key_a, key_b")})
         |SELECT key_a, key_b, uest.e AS union_est_micro,
         |  CAST(greatest(0, ea.e + eb.e - uest.e) AS BIGINT) AS inter_est_micro,
         |  CASE WHEN uest.e > 0
         |       THEN CAST((greatest(0, ea.e + eb.e - uest.e) * 1000000) // uest.e AS BIGINT)
         |       ELSE 0::BIGINT END AS jaccard_micro
         |FROM uest JOIN est ea ON ea.k = key_a JOIN est eb ON eb.k = key_b
         |ORDER BY key_a, key_b""".stripMargin
    },
    "rank_sketch_quantiles" -> rankSketchOracle,
    "rank_sketch_merge" -> rankSketchOracle, // re-filter merge ≡ fresh sketch
    "rank_sketch_append" -> rankSketchOracle, // maintained table ≡ fresh sketch
    "rank_sketch_compact" -> rankSketchOracle, // folded table ≡ fresh sketch
    "rank_sketch_by_key" ->
      """WITH f AS (SELECT event_type AS key, value, CAST(event_id AS VARCHAR) AS tie
        |           FROM events
        |           WHERE event_type IS NOT NULL AND value IS NOT NULL
        |             AND event_id IS NOT NULL),
        |tot AS (SELECT key, count(*) AS nt FROM f GROUP BY 1),
        |samp AS (SELECT key, value, tie,
        |           row_number() OVER (PARTITION BY key ORDER BY value, tie) AS i
        |         FROM f
        |         WHERE ('0x' || substring(md5('rk:' || tie), 1, 15))::BIGINT % 8 = 0),
        |phis AS (SELECT CAST(unnest([500000, 900000]) AS BIGINT) AS phi_micro)
        |SELECT key, phi_micro, CAST(nt AS BIGINT) AS n_total,
        |       count(*) AS sample_size,
        |       coalesce(
        |         min(CASE WHEN i * 8 >= greatest(1, (phi_micro * nt) // 1000000)
        |                  THEN value END),
        |         max(value)) AS q_est
        |FROM phis CROSS JOIN samp JOIN tot USING (key)
        |GROUP BY key, phi_micro, nt ORDER BY key, phi_micro""".stripMargin,
    "hll_distinct" ->
      hllOracle("lineitem", "l_returnflag", "CAST(l_partkey AS VARCHAR)"),
    // CMS join size: identical per-side sketches, min of row dot
    // products — pure integer algebra on O(depth·width) frames.
    "cms_join_size" ->
      """WITH rows_ AS (SELECT unnest(range(4)) AS r),
        |ca AS (SELECT r.r,
        |    (('0x' || substring(md5('cms:' || CAST(r.r AS VARCHAR) || ':'
        |        || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
        |      % 2147483647) % 1024 AS c, count(*) AS n
        |  FROM orders CROSS JOIN rows_ r GROUP BY 1, 2),
        |cb AS (SELECT r.r,
        |    (('0x' || substring(md5('cms:' || CAST(r.r AS VARCHAR) || ':'
        |        || CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT
        |      % 2147483647) % 1024 AS c, count(*) AS n
        |  FROM lineitem CROSS JOIN rows_ r GROUP BY 1, 2),
        |dot AS (SELECT ca.r, CAST(sum(ca.n * cb.n) AS BIGINT) AS d
        |        FROM ca JOIN cb ON ca.r = cb.r AND ca.c = cb.c GROUP BY 1)
        |SELECT CAST(min(d) AS BIGINT) AS join_size_est FROM dot""".stripMargin,
    // Rolling distinct: same register construction, re-derived per
    // (key, active day) over the trailing 7-day window.
    "rolling_distinct_hll" -> {
      val num = graft.operators.Sketches.HllEstNumerator.toString
      s"""WITH hx AS (SELECT event_type AS k, CAST(ts AS DATE) AS day,
         |  ('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |days AS (SELECT DISTINCT k, day FROM hx),
         |reg AS (SELECT d.k, d.day, hx.h >> 48 AS bucket,
         |  max(CASE WHEN (hx.h & ((1::BIGINT << 48) - 1)) = 0 THEN 49
         |      ELSE 49 - len(bin(hx.h & ((1::BIGINT << 48) - 1))) END) AS r
         |  FROM days d JOIN hx ON hx.k = d.k
         |    AND hx.day BETWEEN d.day - 6 AND d.day
         |  GROUP BY 1, 2, 3),
         |a AS (SELECT k, day, count(*) AS n_buckets,
         |        CAST(SUM(1::BIGINT << (49 - r)) AS BIGINT) AS ss
         |      FROM reg GROUP BY 1, 2),
         |e AS (SELECT k, day, n_buckets, CAST(4096 - n_buckets AS BIGINT) AS n_zero,
         |        CAST(ss + (4096 - n_buckets) * (1::BIGINT << 49) AS BIGINT) AS s
         |      FROM a)
         |SELECT k AS event_type, strftime(day, '%Y-%m-%d') AS day, n_buckets, n_zero,
         |  CAST(floor(CASE WHEN CAST($num AS DOUBLE) / CAST(s AS DOUBLE) <= 10240.0 AND n_zero > 0
         |       THEN 4096.0 * ln(4096.0 / CAST(n_zero AS DOUBLE))
         |       ELSE CAST($num AS DOUBLE) / CAST(s AS DOUBLE) END * 1000000.0) AS BIGINT)
         |    AS distinct_est_micro
         |FROM e ORDER BY 1, 2""".stripMargin
    },
    "hll_distinct_merge" -> hllEventsOracle, // register-max merge ≡ fresh sketch
    "hll_distinct_append" -> hllEventsOracle, // stored+appended table ≡ fresh sketch
    "hll_distinct_stream" -> hllEventsOracle, // guard-free epochs + replay + fold ≡ fresh sketch
    // streaming rollup twin: micro-batch merges (plus a guarded replay)
    // equal one exact-decimal GROUP BY over everything.
    "rollup_stream" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(coalesce(value, 0.0) AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // streaming dedup twin: the replayed duplicates collapse to exactly
    // the original events, so the rollup is computable straight from the
    // batch table — no duplicate modeling needed.
    "dedup_exact_stream" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(coalesce(CAST(floor(value * 1000000.0) AS BIGINT), 0)) AS BIGINT)
        |    AS sum_value_micro
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "bloom_filter" -> bloomEventsOracle,
    "bloom_merge" -> bloomEventsOracle, // bitwise-or merge ≡ fresh filter
    "bloom_append" -> bloomEventsOracle, // stored+appended (twice) table ≡ fresh filter
    // probe: recompute each candidate's k positions and AND the bit tests
    // against the recomputed filter — deterministic false positives and
    // all, so the verdict column matches exactly.
    "bloom_probe" ->
      s"""WITH $bloomWordsSql,
         |keys AS (SELECT DISTINCT event_type FROM events WHERE user_id IS NOT NULL),
         |pv AS (SELECT CAST(i AS VARCHAR) AS probe_user FROM range(1, 26) r(i)
         |       UNION ALL
         |       SELECT '-' || CAST(i AS VARCHAR) FROM range(1, 26) r(i)),
         |ph AS (SELECT event_type, probe_user,
         |  ('0x' || substring(md5('bf1:' || probe_user), 1, 15))::BIGINT AS h1,
         |  ('0x' || substring(md5('bf2:' || probe_user), 1, 15))::BIGINT | 1 AS h2
         |  FROM keys, pv),
         |pp AS (SELECT event_type, probe_user, (h1 + i * h2) % 16384 AS p
         |       FROM ph, range(4) r(i))
         |SELECT pp.event_type, pp.probe_user,
         |  CAST(min(CASE WHEN sk.bits IS NOT NULL
         |                 AND ((sk.bits >> CAST(pp.p % 62 AS INTEGER)) & 1) = 1
         |            THEN 1 ELSE 0 END) AS BIGINT) AS maybe_present
         |FROM pp LEFT JOIN sk
         |  ON sk.event_type = pp.event_type AND sk.word = pp.p // 62
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "hist_quantiles" -> histOracle,
    "hist_quantiles_append" -> histOracle, // maintained counts ≡ fresh counts
    "hist_quantiles_by_key" ->
      """WITH hist AS (SELECT event_type, CAST(floor(value / 8.0) AS BIGINT) AS bucket,
        |                     count(*) AS n
        |              FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT event_type, bucket, n,
        |             sum(n) OVER (PARTITION BY event_type ORDER BY bucket
        |                          ROWS UNBOUNDED PRECEDING) AS cum,
        |             sum(n) OVER (PARTITION BY event_type) AS total
        |      FROM hist),
        |ps AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p)
        |SELECT c.event_type, ps.p AS p, min(c.bucket) AS bucket,
        |       CAST(min(c.bucket) AS DOUBLE) * 8.0 AS q_est
        |FROM ps JOIN c ON c.cum >= CAST(ceil(ps.p * CAST(c.total AS DOUBLE)) AS BIGINT)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "attribution_last_touch" -> attributionOracle,
    // The stream's O(1) last-touch state replays the batch carried-forward
    // window exactly on ordered input.
    "attribution_stream" -> attributionOracle,
    // CMS: same portable hash family, same 4×1024 matrix, min-over-rows.
    "cms_heavy_hitters" ->
      """WITH tok AS (SELECT
        |  unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS term
        |             FROM documents),
        |exact AS (SELECT term, count(*) AS exact_n FROM tok GROUP BY 1
        |          ORDER BY exact_n DESC, term LIMIT 20),
        |rows_ AS (SELECT unnest(range(4)) AS r),
        |cells AS (SELECT (('0x' || substring(md5('cms:' || CAST(r AS VARCHAR) || ':' || term), 1, 8))::BIGINT
        |                    % 2147483647) % 1024 AS c, r
        |          FROM tok CROSS JOIN rows_),
        |cms AS (SELECT r, c, count(*) AS n FROM cells GROUP BY 1, 2),
        |probe AS (SELECT e.term, e.exact_n, rows_.r,
        |  (('0x' || substring(md5('cms:' || CAST(rows_.r AS VARCHAR) || ':' || e.term), 1, 8))::BIGINT
        |     % 2147483647) % 1024 AS c
        |          FROM exact e CROSS JOIN rows_)
        |SELECT p.term, p.exact_n, min(COALESCE(cms.n, 0)) AS cms_est
        |FROM probe p LEFT JOIN cms ON cms.r = p.r AND cms.c = p.c
        |GROUP BY 1, 2 ORDER BY exact_n DESC, term""".stripMargin,
    // TF-IDF: same tokenization replica as every text entry, idf on the
    // 1e-6 ln grid, BIGINT tf·idf product, per-doc rank with term ties.
    "tfidf_keywords" ->
      """WITH tok AS (SELECT doc_id,
        |  unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS term
        |             FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (SELECT tf.doc_id, tf.term,
        |              tf.tf * CAST(floor(ln(CAST(n.n AS DOUBLE) / CAST(dfc.df AS DOUBLE))
        |                                 * 1000000.0) AS BIGINT) AS score_micro
        |       FROM tf JOIN dfc USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, score_micro,
        |             row_number() OVER (PARTITION BY doc_id
        |                                ORDER BY score_micro DESC, term) AS rnk
        |      FROM sc WHERE score_micro > 0)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, score_micro
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "q_events_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, CAST(SUM(k) AS BIGINT) AS k_sum, COUNT(k) AS k_cnt FROM (
        |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "cdc_project" ->
      """SELECT "offset", op, user_id, value FROM (
        |  SELECT event_id AS "offset", CAST(event_id % 4 AS INT) AS op, user_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rnk
        |  FROM events) WHERE rnk = 1 AND op <> 1 AND op <> 2 ORDER BY "offset"""".stripMargin,
    "tail" ->
      """SELECT * FROM (
        |  SELECT event_id AS "offset", CAST(event_id % 4 AS INT) AS op, user_id, value
        |  FROM events ORDER BY event_id DESC LIMIT 100) ORDER BY "offset"""".stripMargin,
    "merge_ledger" ->
      """SELECT CAST(0 AS INT) AS op, o_orderkey, o_custkey, o_totalprice FROM orders n
        |WHERE o_orderkey % 2 = 0 AND NOT EXISTS (
        |  SELECT 1 FROM orders p WHERE p.o_orderkey % 3 <> 0 AND p.o_orderkey = n.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "merge_snapshot" ->
      """WITH old AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 5 <> 0),
        |new AS (
        |  SELECT c_custkey, c_name,
        |         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal * 2 ELSE c_acctbal END AS c_acctbal
        |  FROM customer WHERE c_custkey % 7 <> 0),
        |cdc AS (
        |  SELECT old.c_custkey AS ok, old.c_name AS onm, old.c_acctbal AS ob,
        |         new.c_custkey AS nk, new.c_name AS nnm, new.c_acctbal AS nb
        |  FROM old FULL OUTER JOIN new ON old.c_custkey = new.c_custkey
        |  WHERE (old.c_name IS DISTINCT FROM new.c_name)
        |     OR (old.c_acctbal IS DISTINCT FROM new.c_acctbal))
        |SELECT * FROM (
        |  SELECT CASE WHEN ok IS NULL THEN CAST(0 AS INT) WHEN nk IS NULL THEN CAST(1 AS INT) ELSE CAST(3 AS INT) END AS op,
        |         CASE WHEN nk IS NULL THEN ok ELSE nk END AS c_custkey,
        |         CASE WHEN nk IS NULL THEN onm ELSE nnm END AS c_name,
        |         CASE WHEN nk IS NULL THEN ob ELSE nb END AS c_acctbal
        |  FROM cdc
        |  UNION ALL
        |  SELECT CAST(2 AS INT) AS op, ok, onm, ob FROM cdc WHERE ok IS NOT NULL AND nk IS NOT NULL)
        |ORDER BY c_custkey, op""".stripMargin,
    // SCD2: rebuild the same three-tick ledger (the -C halves are simply
    // not generated — the operator filters them before the lead window,
    // so the version sequences are identical), then one lead() per key.
    "scd2_build" ->
      s"""WITH $scd2OracleCtes
         |SELECT c_custkey, c_acctbal, valid_from, valid_to, is_current
         |FROM dim ORDER BY c_custkey, valid_from""".stripMargin,
    // maintained fact table folded back ≡ the from-scratch build: each
    // append is one guarded insertInto touching only batch keys.
    "scd2_append" ->
      s"""WITH $scd2OracleCtes
         |SELECT c_custkey, c_acctbal, valid_from, valid_to, is_current
         |FROM dim ORDER BY c_custkey, valid_from""".stripMargin,
    // streaming twin: closed intervals final on successor arrival,
    // current versions sentinel-flushed — ≡ the batch lead() build.
    "scd2_stream" ->
      s"""WITH $scd2OracleCtes
         |SELECT c_custkey, c_acctbal, valid_from, valid_to, is_current
         |FROM dim ORDER BY c_custkey, valid_from""".stripMargin,
    "scd2_pit" ->
      s"""WITH $scd2OracleCtes,
         |probes AS (SELECT c_custkey, pt AS probe_ts
         |           FROM customer, (VALUES (TIMESTAMP '2024-01-15'),
         |                                  (TIMESTAMP '2024-02-15'),
         |                                  (TIMESTAMP '2024-03-15')) v(pt)
         |           WHERE c_custkey % 5 = 0)
         |SELECT p.c_custkey, p.probe_ts, d.c_acctbal, d.valid_from
         |FROM probes p LEFT JOIN dim d
         |  ON d.c_custkey = p.c_custkey AND d.valid_from <= p.probe_ts
         | AND (d.valid_to IS NULL OR p.probe_ts < d.valid_to)
         |ORDER BY 1, 2""".stripMargin,
    "offsets_assign" ->
      """SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS "offset",
        |       l_orderkey, l_linenumber, l_quantity
        |FROM lineitem ORDER BY "offset"""".stripMargin,
    "dedup_exact" ->
      """SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS dup_count FROM documents
        |GROUP BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |ORDER BY canonical_id""".stripMargin,
    // All-pairs exact join: the oracle is algorithm-INDEPENDENT — a
    // brute-force quadratic join over the restricted corpus. If the
    // prefix filter ever dropped a true pair, this catches it.
    // Edit-distance join: the definitional brute-force quadratic with
    // DuckDB's own levenshtein — exactly what the pigeonhole must equal.
    "dedup_ed_join" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS t
        |           FROM customer WHERE c_custkey % 7 = 0)
        |SELECT a.id AS cust_a, b.id AS cust_b,
        |       CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
        |FROM c a JOIN c b ON a.id < b.id
        |WHERE levenshtein(a.t, b.t) <= 2
        |ORDER BY 1, 2""".stripMargin,
    "dedup_allpairs_exact" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |                  t -> len(t) > 0)) AS ts
        |  FROM documents WHERE doc_id % 5 = 0),
        |dd AS (SELECT doc_id, ts, len(ts) AS n FROM d WHERE len(ts) > 0),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |        CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS i,
        |        a.n + b.n AS nn
        |      FROM dd a JOIN dd b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, (i * 1000000) // (nn - i) AS jaccard_micro
        |FROM p WHERE (i * 1000000) // (nn - i) >= 700000
        |ORDER BY id_a, id_b""".stripMargin,
    // Sorted neighborhood: same normalization, same rank window, DuckDB's
    // levenshtein is the same classic edit distance.
    "dedup_sorted_neighborhood" ->
      """WITH r AS (SELECT doc_id AS id,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t,
        |    row_number() OVER (ORDER BY lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
        |                       doc_id) AS rn
        |  FROM documents),
        |p AS (SELECT a.id AS ida, b.id AS idb, levenshtein(a.t, b.t) AS dist
        |      FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3)
        |SELECT least(ida, idb) AS id_a, greatest(ida, idb) AS id_b, CAST(dist AS INT) AS dist
        |FROM p WHERE dist <= 60 ORDER BY id_a, id_b""".stripMargin,
    "text_stats" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
        |  CAST(len(text) AS BIGINT) AS n_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings),
        |scored AS (
        |  SELECT qid, cid, list_cosine_similarity(qvec, cvec) AS cos FROM q, c WHERE qid <> cid)
        |SELECT qid, rnk, cid FROM (
        |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        |  FROM scored) WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // Replicates Dedup.minHashLsh exactly: portable hash family
    // h_i(s) = ((2654435761*(i+1) mod p) * (hex32(md5(s)) mod p) + 40503*(i+13) mod p) mod p,
    // p = 2^31-1; 64 hashes, 16 bands of 4, bucket cap 1000, est_jaccard >= 0.5.
    "dedup_minhash" ->
      s"""WITH $minhashOracleCtes
         |SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,
    // Incremental variant: corpus (doc_id%5<>0) banded with the index-side
    // cap, new batch (doc_id%5=0) uncapped, pairs across the split only.
    "dedup_minhash_incremental" ->
      s"""WITH $minhashOracleCtes,
         |banded_c AS (
         |  SELECT doc_id, b AS band, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bands
         |  WHERE doc_id % 5 <> 0
         |  QUALIFY row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) <= 1000),
         |banded_n AS (
         |  SELECT doc_id, b AS band, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bands
         |  WHERE doc_id % 5 = 0),
         |pairs_i AS (
         |  SELECT DISTINCT n.doc_id AS id_new, c.doc_id AS id_corpus
         |  FROM banded_n n JOIN banded_c c
         |    ON n.band = c.band AND n.bkey = c.bkey AND n.doc_id <> c.doc_id),
         |est_i AS (
         |  SELECT id_new, id_corpus,
         |    list_sum([CASE WHEN sa.sig[i+1] = sb.sig[i+1] THEN 1 ELSE 0 END for i in range(64)]) / 64.0 AS est_jaccard
         |  FROM pairs_i JOIN sig sa ON sa.doc_id = id_new JOIN sig sb ON sb.doc_id = id_corpus)
         |SELECT id_new, id_corpus, est_jaccard FROM est_i
         |WHERE est_jaccard >= 0.5 ORDER BY id_new, id_corpus""".stripMargin,
    // Cross-split near-dup hits (ref side capped like the operator), then
    // the anti-join back to the surviving training docs.
    "dedup_against" ->
      s"""WITH $minhashOracleCtes,
         |bd AS (
         |  SELECT doc_id, b AS band, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bands
         |  WHERE doc_id % 7 <> 0),
         |br AS (
         |  SELECT doc_id, b AS band, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bands
         |  WHERE doc_id % 7 = 0
         |  QUALIFY row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) <= 1000),
         |cand AS (
         |  SELECT DISTINCT d.doc_id AS did, r.doc_id AS rid
         |  FROM bd d JOIN br r ON d.band = r.band AND d.bkey = r.bkey),
         |hit AS (
         |  SELECT DISTINCT did FROM cand
         |  JOIN sig sa ON sa.doc_id = did JOIN sig sb ON sb.doc_id = rid
         |  WHERE list_sum([CASE WHEN sa.sig[i+1] = sb.sig[i+1] THEN 1 ELSE 0 END for i in range(64)]) / 64.0 >= 0.5)
         |SELECT doc_id, source FROM documents
         |WHERE doc_id % 7 <> 0 AND doc_id NOT IN (SELECT did FROM hit)
         |ORDER BY doc_id""".stripMargin,
    // Probe → append → re-probe: gen 0 = index of doc_id%5∈{1,2,3}; gen 1
    // adds the %5=4 batch with APPEND cap semantics (existing rows keep
    // their seats; the batch fills each bucket's remaining capacity in
    // doc_id order) — exactly what appendToMinhashIndex admits.
    "dedup_minhash_append" ->
      s"""WITH $minhashOracleCtes,
         |banded_c0 AS (
         |  SELECT doc_id, b AS band, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bands
         |  WHERE doc_id % 5 IN (1, 2, 3)
         |  QUALIFY row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) <= 1000),
         |banded_a AS (
         |  SELECT doc_id, b AS band, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bands
         |  WHERE doc_id % 5 = 4),
         |cnt0 AS (SELECT band, bkey, count(*) AS n0 FROM banded_c0 GROUP BY band, bkey),
         |banded_c1 AS (
         |  SELECT doc_id, band, bkey FROM banded_c0
         |  UNION ALL
         |  SELECT doc_id, band, bkey FROM (
         |    SELECT a.doc_id, a.band, a.bkey,
         |           row_number() OVER (PARTITION BY a.band, a.bkey ORDER BY a.doc_id) AS rn,
         |           coalesce(c.n0, 0) AS n0
         |    FROM banded_a a LEFT JOIN cnt0 c ON a.band = c.band AND a.bkey = c.bkey)
         |  WHERE rn + n0 <= 1000),
         |banded_p AS (
         |  SELECT doc_id, b AS band, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bands
         |  WHERE doc_id % 5 = 0),
         |pairs_g AS (
         |  SELECT CAST(0 AS BIGINT) AS gen, DISTINCT_pairs.* FROM (
         |    SELECT DISTINCT p.doc_id AS id_new, c.doc_id AS id_corpus
         |    FROM banded_p p JOIN banded_c0 c
         |      ON p.band = c.band AND p.bkey = c.bkey AND p.doc_id <> c.doc_id) DISTINCT_pairs
         |  UNION ALL
         |  SELECT CAST(1 AS BIGINT) AS gen, DISTINCT_pairs.* FROM (
         |    SELECT DISTINCT p.doc_id AS id_new, c.doc_id AS id_corpus
         |    FROM banded_p p JOIN banded_c1 c
         |      ON p.band = c.band AND p.bkey = c.bkey AND p.doc_id <> c.doc_id) DISTINCT_pairs),
         |est_g AS (
         |  SELECT gen, id_new, id_corpus,
         |    list_sum([CASE WHEN sa.sig[i+1] = sb.sig[i+1] THEN 1 ELSE 0 END for i in range(64)]) / 64.0 AS est_jaccard
         |  FROM pairs_g JOIN sig sa ON sa.doc_id = id_new JOIN sig sb ON sb.doc_id = id_corpus)
         |SELECT id_new, id_corpus, est_jaccard, gen FROM est_g
         |WHERE est_jaccard >= 0.5 ORDER BY gen, id_new, id_corpus""".stripMargin,
    // Replicates Dedup.simHashDups: 64-char bit-string simhash from
    // md5-derived token bits, 4-chunk (16-bit) pigeonhole candidates,
    // hamming <= 3.
    "dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS t
        |  FROM documents),
        |tbits AS (
        |  SELECT doc_id, lpad(bin(('0x' || substring(md5(t), 1, 16))::UBIGINT), 64, '0') AS bits FROM tok),
        |votes AS (
        |  SELECT doc_id, j,
        |         sum(CASE WHEN substring(bits, j+1, 1) = '1' THEN 1 ELSE -1 END) AS v
        |  FROM tbits CROSS JOIN (SELECT unnest(range(64)) AS j) js
        |  GROUP BY doc_id, j),
        |sim0 AS (
        |  SELECT doc_id, string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS sh
        |  FROM votes GROUP BY doc_id),
        |sim AS (
        |  SELECT d.doc_id AS id, coalesce(s.sh, repeat('0', 64)) AS sh
        |  FROM documents d LEFT JOIN sim0 s ON d.doc_id = s.doc_id),
        |chunked AS (
        |  SELECT id, c AS chunk, substring(sh, 1 + c*16, 16) AS ckey
        |  FROM sim CROSS JOIN (SELECT unnest(range(4)) AS c) cs
        |  QUALIFY row_number() OVER (PARTITION BY c, substring(sh, 1 + c*16, 16) ORDER BY id) <= 256),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM chunked a JOIN chunked b ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.id < b.id),
        |ham AS (
        |  SELECT id_a, id_b,
        |    CAST(list_sum([CASE WHEN substring(sa.sh, i+1, 1) = substring(sb.sh, i+1, 1) THEN 0 ELSE 1 END for i in range(64)]) AS BIGINT) AS hamming
        |  FROM pairs JOIN sim sa ON sa.id = id_a JOIN sim sb ON sb.id = id_b)
        |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,
    "merge_append" ->
      """SELECT CAST(0 AS INT) AS op, o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""".stripMargin,
    "merge_changelog_stream" ->
      """SELECT CAST(event_id % 4 AS INT) AS op, event_id AS "offset", user_id, value
        |FROM events ORDER BY "offset"""".stripMargin,
    "merge_upsert" ->
      """WITH old AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 4 <> 0),
        |inc AS (
        |  SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal,
        |         CASE WHEN c_custkey % 9 = 0 THEN 1 ELSE 0 END AS iop
        |  FROM customer WHERE c_custkey % 3 = 0),
        |j AS (
        |  SELECT inc.iop, inc.c_custkey AS nk, inc.c_name AS nnm, inc.c_acctbal AS nb,
        |         old.c_custkey AS ok, old.c_name AS onm, old.c_acctbal AS ob
        |  FROM inc LEFT JOIN old ON inc.c_custkey = old.c_custkey),
        |keep AS (
        |  SELECT * FROM j WHERE (iop = 1 AND ok IS NOT NULL)
        |    OR (iop <> 1 AND ((onm IS DISTINCT FROM nnm) OR (ob IS DISTINCT FROM nb))))
        |SELECT * FROM (
        |  SELECT CAST(1 AS INT) AS op, ok AS c_custkey, onm AS c_name, ob AS c_acctbal FROM keep WHERE iop = 1
        |  UNION ALL
        |  SELECT CAST(0 AS INT) AS op, nk, nnm, nb FROM keep WHERE iop <> 1 AND ok IS NULL
        |  UNION ALL
        |  SELECT CAST(2 AS INT) AS op, ok, onm, ob FROM keep WHERE iop <> 1 AND ok IS NOT NULL
        |  UNION ALL
        |  SELECT CAST(3 AS INT) AS op, nk, nnm, nb FROM keep WHERE iop <> 1 AND ok IS NOT NULL)
        |ORDER BY c_custkey, op""".stripMargin,
    // the streaming twin's epoch-1 delta ≡ the batch merge's output: the
    // epoch-0 ledger projects to exactly the batch entry's prior state,
    // and the replayed epoch collapses on the __batch guard.
    "merge_upsert_stream" ->
      """WITH old AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 4 <> 0),
        |inc AS (
        |  SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal,
        |         CASE WHEN c_custkey % 9 = 0 THEN 1 ELSE 0 END AS iop
        |  FROM customer WHERE c_custkey % 3 = 0),
        |j AS (
        |  SELECT inc.iop, inc.c_custkey AS nk, inc.c_name AS nnm, inc.c_acctbal AS nb,
        |         old.c_custkey AS ok, old.c_name AS onm, old.c_acctbal AS ob
        |  FROM inc LEFT JOIN old ON inc.c_custkey = old.c_custkey),
        |keep AS (
        |  SELECT * FROM j WHERE (iop = 1 AND ok IS NOT NULL)
        |    OR (iop <> 1 AND ((onm IS DISTINCT FROM nnm) OR (ob IS DISTINCT FROM nb))))
        |SELECT * FROM (
        |  SELECT CAST(1 AS INT) AS op, ok AS c_custkey, onm AS c_name, ob AS c_acctbal FROM keep WHERE iop = 1
        |  UNION ALL
        |  SELECT CAST(0 AS INT) AS op, nk, nnm, nb FROM keep WHERE iop <> 1 AND ok IS NULL
        |  UNION ALL
        |  SELECT CAST(2 AS INT) AS op, ok, onm, ob FROM keep WHERE iop <> 1 AND ok IS NOT NULL
        |  UNION ALL
        |  SELECT CAST(3 AS INT) AS op, nk, nnm, nb FROM keep WHERE iop <> 1 AND ok IS NOT NULL)
        |ORDER BY c_custkey, op""".stripMargin,
    "writer_stamp" ->
      """SELECT o_orderkey, o_orderdate AS event_time,
        |       TIMESTAMP '2020-06-01 00:00:00' AS system_time
        |FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin,
    "dataset_multislice" ->
      """WITH base AS (
        |  SELECT o_orderkey % 3 AS g, o_orderdate AS event_time, o_orderkey, o_custkey, o_totalprice
        |  FROM orders)
        |SELECT row_number() OVER (ORDER BY g, event_time, o_orderkey) - 1 AS "offset",
        |       CAST(0 AS INT) AS op,
        |       CASE g WHEN 0 THEN TIMESTAMP '2024-01-01 00:00:00'
        |              WHEN 1 THEN TIMESTAMP '2024-01-02 00:00:00'
        |              ELSE TIMESTAMP '2024-01-03 00:00:00' END AS system_time,
        |       event_time, o_orderkey, o_custkey, o_totalprice
        |FROM base ORDER BY "offset"""".stripMargin,
    "ingest_city_csv" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'kyiv', 2884000),
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'seattle', 733000),
        |  (CAST(2 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'vancouver', 675000),
        |  (CAST(3 AS BIGINT), CAST(1 AS INT), TIMESTAMP '2024-02-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 'kyiv', 2884000),
        |  (CAST(4 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-02-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 'odessa', 1015000),
        |  (CAST(5 AS BIGINT), CAST(2 AS INT), TIMESTAMP '2024-02-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 'seattle', 733000),
        |  (CAST(6 AS BIGINT), CAST(3 AS INT), TIMESTAMP '2024-02-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 'seattle', 750000)
        |) AS t("offset", op, system_time, event_time, city, population)
        |ORDER BY "offset"""".stripMargin,
    "ingest_geojson" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS INT), 'seattle', 733000, '{"coordinates":[-122.3,47.6],"type":"Point"}'),
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), 'vancouver', 675000, '{"coordinates":[-123.1,49.3],"type":"Point"}')
        |) AS t("offset", op, name, pop, geometry) ORDER BY "offset"""".stripMargin,
    // Stateful streaming windowed agg: after the sentinel run every real
    // hourly window has been finalized exactly once, so the emitted set
    // equals the batch hourly aggregation over the whole events table (the
    // sentinel's own window never closes and is absent on both sides).
    "transform_stateful_stream" ->
      """SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "transform_incremental" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'kyiv', 28840000),
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'seattle', 7330000),
        |  (CAST(2 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'vancouver', 6750000),
        |  (CAST(3 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-02-05 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 'odessa', 10150000),
        |  (CAST(4 AS BIGINT), CAST(1 AS INT), TIMESTAMP '2024-02-05 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 'kyiv', 28840000),
        |  (CAST(5 AS BIGINT), CAST(2 AS INT), TIMESTAMP '2024-02-05 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 'seattle', 7330000),
        |  (CAST(6 AS BIGINT), CAST(3 AS INT), TIMESTAMP '2024-02-05 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 'seattle', 7500000)
        |) AS t("offset", op, system_time, event_time, city, population)
        |ORDER BY "offset"""".stripMargin,
    "pull_recursive" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'kyiv', 28840005),
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'seattle', 7330005),
        |  (CAST(2 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'vancouver', 6750005),
        |  (CAST(3 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-02-05 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 'odessa', 10150005),
        |  (CAST(4 AS BIGINT), CAST(1 AS INT), TIMESTAMP '2024-02-05 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 'kyiv', 28840005),
        |  (CAST(5 AS BIGINT), CAST(2 AS INT), TIMESTAMP '2024-02-05 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 'seattle', 7330005),
        |  (CAST(6 AS BIGINT), CAST(3 AS INT), TIMESTAMP '2024-02-05 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 'seattle', 7500005)
        |) AS t("offset", op, system_time, event_time, city, population)
        |ORDER BY "offset"""".stripMargin,
    "query_service_sql" ->
      """SELECT * FROM (VALUES ('kyiv', 2884000), ('seattle', 733000)) AS t(city, population)
        |ORDER BY city""".stripMargin,
    // Head sees both commits (all nations); the VERSION AS OF pin sees only
    // commit 1 (n_nationkey < 12).
    "catalog_sql" ->
      """SELECT * FROM (
        |  SELECT 'head' AS snap, CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation
        |  UNION ALL
        |  SELECT 'pinned' AS snap, CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
        |  FROM nation WHERE n_nationkey < 12
        |) ORDER BY snap, n_nationkey""".stripMargin,
    // Compaction preserves every row exactly — same oracle as the
    // uncompacted multi-slice dataset.
    "compaction" ->
      """WITH base AS (
        |  SELECT o_orderkey % 3 AS g, o_orderdate AS event_time, o_orderkey, o_custkey, o_totalprice
        |  FROM orders)
        |SELECT row_number() OVER (ORDER BY g, event_time, o_orderkey) - 1 AS "offset",
        |       CAST(0 AS INT) AS op,
        |       CASE g WHEN 0 THEN TIMESTAMP '2024-01-01 00:00:00'
        |              WHEN 1 THEN TIMESTAMP '2024-01-02 00:00:00'
        |              ELSE TIMESTAMP '2024-01-03 00:00:00' END AS system_time,
        |       event_time, o_orderkey, o_custkey, o_totalprice
        |FROM base ORDER BY "offset"""".stripMargin,
    "text_lang" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, list_max([
        |    {'hits': len(list_filter(toks, t -> list_contains(['the','and','of','to','is','that','with','for'], t))), 'lang': 'en'},
        |    {'hits': len(list_filter(toks, t -> list_contains(['der','die','und','das','ist','nicht','ein','mit'], t))), 'lang': 'de'},
        |    {'hits': len(list_filter(toks, t -> list_contains(['le','la','les','est','une','dans','pour','que'], t))), 'lang': 'fr'},
        |    {'hits': len(list_filter(toks, t -> list_contains(['el','los','es','una','por','como','pero','más'], t))), 'lang': 'es'},
        |    {'hits': len(list_filter(toks, t -> list_contains(['的','是','了','在','我','有','和','不'], t))), 'lang': 'zh'}
        |  ]) AS best FROM tok)
        |SELECT doc_id, CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END AS lang
        |FROM scored ORDER BY doc_id""".stripMargin,
    // Interval coalesce: identical running-max island spelling.
    "interval_coalesce" ->
      """WITH b AS (SELECT user_id, epoch_ms(ts) AS s,
        |    epoch_ms(ts) + (event_id % 5 + 1) * 600000 AS e
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT user_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM b),
        |f AS (SELECT user_id, s, e,
        |    CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nw FROM m),
        |i AS (SELECT user_id, s, e,
        |    sum(nw) OVER (PARTITION BY user_id ORDER BY s, e
        |                  ROWS UNBOUNDED PRECEDING) AS island FROM f)
        |SELECT user_id, CAST(min(s) AS BIGINT) AS span_start,
        |  CAST(max(e) AS BIGINT) AS span_end, CAST(count(*) AS BIGINT) AS n_merged
        |FROM i GROUP BY user_id, island ORDER BY user_id, span_start""".stripMargin,
    // Streaks: day − row_number anchor, argmax (len DESC, start ASC).
    "activity_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |           FROM events WHERE ts IS NOT NULL),
        |a AS (SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT)
        |      AS anchor FROM d),
        |runs AS (SELECT user_id, CAST(count(*) AS BIGINT) AS len,
        |    min(day) AS start FROM a GROUP BY user_id, anchor),
        |r AS (SELECT user_id, len, start,
        |    row_number() OVER (PARTITION BY user_id ORDER BY len DESC, start) AS rn
        |  FROM runs)
        |SELECT user_id, len AS streak_days,
        |  strftime(start, '%Y-%m-%d') AS streak_start
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // Overlap join: the definitional inequality join (DuckDB plans its
    // own IEJoin for it) — max(starts) < min(ends), half-open.
    "interval_overlap_join" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, epoch_ms(ts) AS ps,
        |             epoch_ms(ts) + (event_id % 5 + 1) * 600000 AS pe
        |           FROM events WHERE event_type = 'purchase'),
        |e AS (SELECT user_id, event_id AS e_id, epoch_ms(ts) AS es,
        |        epoch_ms(ts) + (event_id % 5 + 1) * 600000 AS ee
        |      FROM events WHERE event_type = 'error')
        |SELECT p.user_id, p.p_id, e.e_id
        |FROM p JOIN e ON p.user_id = e.user_id
        |  AND greatest(p.ps, e.es) < least(p.pe, e.ee)
        |ORDER BY 1, 2, 3""".stripMargin,
    "asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_id % 2 = 0),
        |r0 AS (SELECT user_id, ts AS rts, value FROM events WHERE event_id % 7 = 0),
        |r AS (SELECT * FROM r0 QUALIFY row_number() OVER (PARTITION BY user_id, rts ORDER BY value DESC) = 1)
        |SELECT l.event_id, l.user_id, r.value AS rate
        |FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.rts
        |ORDER BY event_id""".stripMargin,
    // Replicates Text.qualityScore term by term, same double-op order.
    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS ntok,
        |    CAST(len(text) AS DOUBLE) AS nchars,
        |    CAST(len(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE) AS alpha,
        |    CAST(len(list_filter(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0),
        |      x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this'], x))) AS DOUBLE) AS stophits
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    least(ntok / 50.0, 1.0) AS lenscore,
        |    CASE WHEN (CASE WHEN ntok > 0 THEN nchars / ntok ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.3 END AS wls,
        |    CASE WHEN nchars > 0 THEN alpha / nchars ELSE 0.0 END AS ar,
        |    least((CASE WHEN ntok > 0 THEN stophits / ntok ELSE 0.0 END) * 5.0, 1.0) AS ss
        |  FROM t)
        |SELECT doc_id, round(lenscore * 0.3 + wls * 0.2 + ar * 0.3 + ss * 0.2, 6) AS quality
        |FROM s ORDER BY doc_id""".stripMargin,
    // approxBpeTokenCount ≡ word-char runs + isolated non-word non-space
    // chars (the lookaround split isolates every non-word char; trim drops
    // space pieces only).
    "text_bpe" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9'']+'))
        |     + len(regexp_extract_all(text, '[^A-Za-z0-9'' ]')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ngram_jaccard" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |    ELSE [array_to_string(toks[i+1:i+3], ' ') for i in range(len(toks) - 2)] END) AS sh
        |  FROM tok),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 10 = 0)
        |SELECT id_a, id_b,
        |  CASE WHEN len(list_distinct(list_cat(sa.sh, sb.sh))) > 0
        |       THEN CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        |          / CAST(len(list_distinct(list_cat(sa.sh, sb.sh))) AS DOUBLE)
        |       ELSE 0.0 END AS jaccard
        |FROM pairs JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |ORDER BY id_a""".stripMargin,
    // Levenshtein is exact-integer in both engines; same prefix cap, same
    // 1 - dist/maxlen arithmetic.
    "edit_distance_verify" ->
      """WITH t AS (SELECT doc_id, substring(coalesce(text, ''), 1, 1000) AS t FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 10 = 0),
        |sc AS (
        |  SELECT id_a, id_b,
        |    CAST(levenshtein(ta.t, tb.t) AS BIGINT) AS dist,
        |    CAST(greatest(len(ta.t), len(tb.t)) AS BIGINT) AS mx
        |  FROM pairs JOIN t ta ON ta.doc_id = id_a JOIN t tb ON tb.doc_id = id_b)
        |SELECT id_a, id_b, dist,
        |  CASE WHEN mx = 0 THEN 1.0 ELSE 1.0 - CAST(dist AS DOUBLE) / CAST(mx AS DOUBLE) END AS sim
        |FROM sc
        |WHERE (CASE WHEN mx = 0 THEN 1.0 ELSE 1.0 - CAST(dist AS DOUBLE) / CAST(mx AS DOUBLE) END) >= 0.2
        |ORDER BY id_a""".stripMargin,
    "window_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "window_sliding" ->
      """SELECT wstart, event_type, COUNT(*) AS n FROM (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - i * INTERVAL '30 minutes' AS wstart, event_type
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Gaps-and-islands sessionization; break at gap >= 5 min (Spark session
    // windows are end-exclusive: end = last event + gap).
    "window_session" ->
      """WITH m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '5 minutes' THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS sstart, max(ts) + INTERVAL '5 minutes' AS send, COUNT(*) AS n
        |FROM g GROUP BY user_id, sid ORDER BY user_id, sstart""".stripMargin,
    "pagination" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin,
    "nullability_assert" ->
      """SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey""".stripMargin,
    "ann_lsh" -> {
      val pls = planesLit(graft.operators.Similarity.intPlanes(numPlanes = 6, dim = 64, seed = 42L))
      s"""WITH p AS (SELECT $pls AS pls),
         |q AS (SELECT vec_id AS qid, list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x*1000) AS BIGINT)) AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS cid, list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x*1000) AS BIGINT)) AS cv
         |      FROM embeddings),
         |qb AS (SELECT qid, qv, list_sum([CASE WHEN list_dot_product(CAST(qv AS DOUBLE[]), CAST(pls[i+1] AS DOUBLE[])) > 0 THEN 1<<i ELSE 0 END for i in range(6)]) AS bucket
         |       FROM q CROSS JOIN p),
         |cb AS (SELECT cid, cv, list_sum([CASE WHEN list_dot_product(CAST(cv AS DOUBLE[]), CAST(pls[i+1] AS DOUBLE[])) > 0 THEN 1<<i ELSE 0 END for i in range(6)]) AS bucket
         |       FROM c CROSS JOIN p),
         |scored AS (
         |  SELECT qid, cid,
         |    CASE WHEN sqrt(CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS DOUBLE))
         |            * sqrt(CAST(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)) > 0
         |         THEN CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)
         |            / (sqrt(CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS DOUBLE))
         |             * sqrt(CAST(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)))
         |         ELSE 0.0 END AS cos
         |  FROM qb JOIN cb USING (bucket) WHERE qid <> cid)
         |SELECT qid, rnk, cid FROM (
         |  SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
         |  FROM scored) WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin
    },
    // Multi-probe replication: same buckets, candidates = pairs whose
    // buckets are within Hamming distance 1 (the query's own bucket plus
    // its single-bit flips).
    "ann_lsh_multiprobe" -> {
      val pls = planesLit(graft.operators.Similarity.intPlanes(numPlanes = 6, dim = 64, seed = 42L))
      s"""WITH p AS (SELECT $pls AS pls),
         |q AS (SELECT vec_id AS qid, list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x*1000) AS BIGINT)) AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS cid, list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x*1000) AS BIGINT)) AS cv
         |      FROM embeddings),
         |qb AS (SELECT qid, qv, list_sum([CASE WHEN list_dot_product(CAST(qv AS DOUBLE[]), CAST(pls[i+1] AS DOUBLE[])) > 0 THEN 1<<i ELSE 0 END for i in range(6)]) AS bucket
         |       FROM q CROSS JOIN p),
         |cb AS (SELECT cid, cv, list_sum([CASE WHEN list_dot_product(CAST(cv AS DOUBLE[]), CAST(pls[i+1] AS DOUBLE[])) > 0 THEN 1<<i ELSE 0 END for i in range(6)]) AS bucket
         |       FROM c CROSS JOIN p),
         |scored AS (
         |  SELECT qid, cid,
         |    CASE WHEN sqrt(CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS DOUBLE))
         |            * sqrt(CAST(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)) > 0
         |         THEN CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)
         |            / (sqrt(CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS DOUBLE))
         |             * sqrt(CAST(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)))
         |         ELSE 0.0 END AS cos
         |  FROM qb JOIN cb ON bit_count(xor(CAST(qb.bucket AS BIGINT), CAST(cb.bucket AS BIGINT))) <= 1
         |  WHERE qid <> cid)
         |SELECT qid, rnk, cid FROM (
         |  SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
         |  FROM scored) WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin
    },
    // Exhaustive oracle: with nprobe = k the IVF search space is the full
    // corpus, so exact quantized-cosine top-5 is the ground truth. The
    // bucketed-table variant runs the identical pipeline off the
    // materialized layout — same answer, same oracle.
    "ann_pq" -> annPqOracle,
    "ann_ivfpq" -> annPqOracle, // nprobe = k ⇒ cell pruning vanishes ⇒ ≡ PQ
    "ann_ivfpq_append" -> annPqOracle, // appended table ≡ fresh build ≡ PQ
    "ann_ivf" -> annIvfOracle,
    "ann_ivf_bucketed" -> annIvfOracle,
    "ann_ivf_append" -> annIvfOracle,
    // Union-of-tables replication: bucket per (table, planes[t]); a
    // candidate is any pair sharing a bucket in ANY of the 3 tables. The
    // bucketed-layout variant computes the identical candidates off the
    // stored (t, bucket) rows — same oracle.
    "ann_lsh_multitable_bucketed" -> annLshMultitableOracle,
    "ann_lsh_multitable" -> annLshMultitableOracle,
    "ann_sq8" ->
      """WITH c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ex AS (SELECT vec_id, unnest(v) AS val, unnest(range(1, len(v) + 1)) AS pos FROM c0),
        |st AS (SELECT pos, min(val) AS mn, max(val) AS mx FROM ex GROUP BY pos),
        |enc AS (
        |  SELECT vec_id, list(CASE WHEN mx = mn THEN 0
        |      ELSE least(255, greatest(0, CAST(floor((val - mn) * 255.0 / (mx - mn) + 0.5) AS BIGINT))) END
        |      ORDER BY pos) AS cv
        |  FROM ex JOIN st USING (pos) GROUP BY vec_id),
        |q AS (SELECT vec_id AS qid, cv AS qv FROM enc WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cid, cv FROM enc),
        |scored AS (
        |  SELECT qid, cid,
        |    CASE WHEN sqrt(CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS DOUBLE))
        |            * sqrt(CAST(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)) > 0
        |         THEN CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)
        |            / (sqrt(CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS DOUBLE))
        |             * sqrt(CAST(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)))
        |         ELSE 0.0 END AS cos
        |  FROM q CROSS JOIN c WHERE qid <> cid)
        |SELECT qid, rnk, cid FROM (
        |  SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
        |  FROM scored) WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // LSH-bucket candidates (ann_lsh's plane construction on the quantized
    // vectors) scored by SQ8-code cosine (ann_sq8's encoding) — the two
    // exact-integer constructions composed.
    "ann_sq8_bucketed" -> {
      val pls = planesLit(graft.operators.Similarity.intPlanes(numPlanes = 6, dim = 64, seed = 42L))
      s"""WITH c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |p AS (SELECT $pls AS pls),
         |iq AS (SELECT vec_id, list_transform(v, x -> CAST(round(x*1000) AS BIGINT)) AS qv FROM c0),
         |bk AS (SELECT vec_id,
         |  list_sum([CASE WHEN list_dot_product(CAST(qv AS DOUBLE[]), CAST(pls[i+1] AS DOUBLE[])) > 0 THEN 1<<i ELSE 0 END for i in range(6)]) AS bucket
         |  FROM iq CROSS JOIN p),
         |ex AS (SELECT vec_id, unnest(v) AS val, unnest(range(1, len(v) + 1)) AS pos FROM c0),
         |st AS (SELECT pos, min(val) AS mn, max(val) AS mx FROM ex GROUP BY pos),
         |enc AS (
         |  SELECT vec_id, list(CASE WHEN mx = mn THEN 0
         |      ELSE least(255, greatest(0, CAST(floor((val - mn) * 255.0 / (mx - mn) + 0.5) AS BIGINT))) END
         |      ORDER BY pos) AS cv
         |  FROM ex JOIN st USING (pos) GROUP BY vec_id),
         |rows0 AS (SELECT e.vec_id, e.cv, b.bucket FROM enc e JOIN bk b ON b.vec_id = e.vec_id),
         |q AS (SELECT vec_id AS qid, cv AS qv, bucket FROM rows0 WHERE vec_id < 10),
         |c AS (SELECT vec_id AS cid, cv, bucket FROM rows0),
         |scored AS (
         |  SELECT qid, cid,
         |    CASE WHEN sqrt(CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS DOUBLE))
         |            * sqrt(CAST(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)) > 0
         |         THEN CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)
         |            / (sqrt(CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS DOUBLE))
         |             * sqrt(CAST(list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])) AS DOUBLE)))
         |         ELSE 0.0 END AS cos
         |  FROM q JOIN c USING (bucket) WHERE qid <> cid)
         |SELECT qid, rnk, cid FROM (
         |  SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
         |  FROM scored) WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin
    },
    "embed_neardup" -> embedNeardupOracle,
    // Same values, bucketed execution — the oracle is identical by design.
    "embed_neardup_bucketed" -> embedNeardupOracle,
    // Append builds the same row set as a fresh full materialization, so
    // pairing over the appended table matches the full-corpus oracle.
    "embed_neardup_append" -> embedNeardupOracle,
    // Full SemDeDup replication: seed centroids = first 8 quantized vectors,
    // nearest-cell assignment by exact integer squared L2 (ties to the
    // lowest cell id), per-cell cap, within-cell pairwise quantized cosine,
    // drop ids with an earlier >=0.3 cell-mate.
    "semantic_dedup" ->
      """WITH v AS (SELECT vec_id AS id, list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x*1000) AS BIGINT)) AS v
        |           FROM embeddings),
        |cents AS (SELECT CAST(id AS INTEGER) AS ci, v AS cv FROM v WHERE id < 8),
        |asg AS (
        |  SELECT id, v, ci AS cell,
        |         CAST(list_dot_product(CAST(v AS DOUBLE[]), CAST(v AS DOUBLE[])) AS DOUBLE) AS n2
        |  FROM v CROSS JOIN cents
        |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY
        |      list_dot_product(CAST(v AS DOUBLE[]), CAST(v AS DOUBLE[]))
        |      - 2 * list_dot_product(CAST(v AS DOUBLE[]), CAST(cv AS DOUBLE[]))
        |      + list_dot_product(CAST(cv AS DOUBLE[]), CAST(cv AS DOUBLE[])), ci) = 1),
        |capped AS (SELECT id, cell FROM asg
        |           QUALIFY row_number() OVER (PARTITION BY cell ORDER BY id) <= 1000),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b FROM capped a JOIN capped b USING (cell)
        |  WHERE a.id < b.id),
        |scored AS (
        |  SELECT id_a, id_b,
        |    CASE WHEN sqrt(va.n2) * sqrt(vb.n2) > 0
        |         THEN CAST(list_dot_product(CAST(va.v AS DOUBLE[]), CAST(vb.v AS DOUBLE[])) AS DOUBLE)
        |            / (sqrt(va.n2) * sqrt(vb.n2))
        |         ELSE 0.0 END AS cos
        |  FROM pairs JOIN asg va ON va.id = id_a JOIN asg vb ON vb.id = id_b),
        |dropped AS (SELECT DISTINCT id_b AS id FROM scored WHERE cos >= 0.3)
        |SELECT id, cell FROM asg WHERE id NOT IN (SELECT id FROM dropped)
        |ORDER BY id""".stripMargin,
    "export_roundtrip" ->
      """SELECT * FROM (
        |  SELECT n_nationkey, n_name, n_regionkey, 'csv' AS src FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, n_name, n_regionkey, 'ndjson' AS src FROM nation)
        |ORDER BY src, n_nationkey""".stripMargin,
    "dataset_tail" ->
      """WITH base AS (
        |  SELECT o_orderkey % 3 AS g, o_orderdate AS event_time, o_orderkey, o_custkey, o_totalprice
        |  FROM orders),
        |led AS (
        |  SELECT row_number() OVER (ORDER BY g, event_time, o_orderkey) - 1 AS "offset",
        |         CAST(0 AS INT) AS op,
        |         CASE g WHEN 0 THEN TIMESTAMP '2024-01-01 00:00:00'
        |                WHEN 1 THEN TIMESTAMP '2024-01-02 00:00:00'
        |                ELSE TIMESTAMP '2024-01-03 00:00:00' END AS system_time,
        |         event_time, o_orderkey, o_custkey, o_totalprice
        |  FROM base)
        |SELECT * FROM (SELECT * FROM led ORDER BY "offset" DESC LIMIT 50) ORDER BY "offset"""".stripMargin,
    "changelog_state" ->
      """SELECT * FROM (VALUES
        |  (CAST(2 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'vancouver', 675000),
        |  (CAST(4 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-02-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 'odessa', 1015000),
        |  (CAST(6 AS BIGINT), CAST(3 AS INT), TIMESTAMP '2024-02-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 'seattle', 750000)
        |) AS t("offset", op, system_time, event_time, city, population)
        |ORDER BY "offset"""".stripMargin,
    "ingest_preprocess" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'kyiv', 2884000, 5768000),
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'seattle', 733000, 1466000),
        |  (CAST(2 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'vancouver', 675000, 1350000)
        |) AS t("offset", op, system_time, event_time, city, population, pop2)
        |ORDER BY "offset"""".stripMargin,
    "ingest_ndjson" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'seattle', 733000),
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'vancouver', 675000)
        |) AS t("offset", op, system_time, event_time, city, population)
        |ORDER BY "offset"""".stripMargin,
    "ingest_json" ->
      """SELECT * FROM (VALUES
        |  ('kyiv', 2884000), ('lviv', 721000)
        |) AS t(city, population) ORDER BY city""".stripMargin,
    "ingest_shapefile" ->
      """SELECT * FROM (VALUES
        |  ('kyiv', CAST(2884000 AS BIGINT), '{"type":"Point","coordinates":[30.5,50.25]}'),
        |  ('triangle', CAST(7 AS BIGINT), '{"type":"Polygon","coordinates":[[[0,0],[4,0],[0,3],[0,0]]]}')
        |) AS t(NAME, POP, geometry) ORDER BY NAME""".stripMargin,
    "dedup_clusters" ->
      """SELECT doc_id AS id, doc_id - (doc_id % 7) AS comp
        |FROM documents ORDER BY id""".stripMargin,
    // Fresh full connected components over the union's MinHash pair set
    // (recursive-CTE transitive closure; comp = min reachable id) — the
    // incremental path must land on exactly this table.
    "dedup_clusters_incremental" ->
      s"""WITH RECURSIVE $minhashOracleCtes,
         |e AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
         |edge AS (SELECT id_a AS a, id_b AS b FROM e UNION SELECT id_b, id_a FROM e),
         |reach(a, b) AS (
         |  SELECT a, b FROM edge
         |  UNION
         |  SELECT r.a, x.b FROM reach r JOIN edge x ON r.b = x.a)
         |SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a ORDER BY id""".stripMargin,
    // Keep-best: fresh CC over the same MinHash pair set, winner per
    // component by (n_chars DESC, id ASC), survivors = docs minus losers.
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $minhashOracleCtes,
         |e AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
         |edge AS (SELECT id_a AS a, id_b AS b FROM e UNION SELECT id_b, id_a FROM e),
         |reach(a, b) AS (
         |  SELECT a, b FROM edge
         |  UNION
         |  SELECT r.a, x.b FROM reach r JOIN edge x ON r.b = x.a),
         |cc AS (SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a),
         |w AS (
         |  SELECT id FROM (
         |    SELECT cc.id,
         |      row_number() OVER (PARTITION BY comp ORDER BY d.n_chars DESC, cc.id ASC) AS r
         |    FROM cc JOIN documents d ON d.doc_id = cc.id) WHERE r = 1),
         |losers AS (SELECT id FROM cc WHERE id NOT IN (SELECT id FROM w))
         |SELECT doc_id, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM losers)
         |ORDER BY doc_id""".stripMargin,
    // Deterministic sampling: same md5-derived unit hash, same rate CASE.
    "corpus_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE (('0x' || substring(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        % 2147483647) / 2147483647.0
        |      < CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
        |                    WHEN 'src2' THEN 0.25 ELSE 0.1 END
        |ORDER BY doc_id""".stripMargin,
    // Temperature sampling: integer micro-weights -> exact rate division ->
    // same selection hash as corpus_sample.
    "temperature_sample" ->
      """WITH n AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |w AS (SELECT source, n, CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS w FROM n),
        |z AS (SELECT sum(w) AS z FROM w),
        |r AS (SELECT source, least(1.0, CAST(200 * w AS DOUBLE) / (CAST(z AS DOUBLE) * n)) AS rate
        |      FROM w CROSS JOIN z)
        |SELECT d.doc_id, d.source FROM documents d JOIN r ON r.source = d.source
        |WHERE (('0x' || substring(md5(d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        % 2147483647) / 2147483647.0 < r.rate
        |ORDER BY d.doc_id""".stripMargin,
    // Budgeted sampling: same hash, rate from the same per-source totals.
    "corpus_budget_sample" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents),
        |tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total FROM d
        |        WHERE source IN ('src3', 'src4') GROUP BY source),
        |r AS (SELECT source,
        |        least(1.0, CASE source WHEN 'src3' THEN 5000 WHEN 'src4' THEN 100 END / total) AS rate
        |      FROM tot)
        |SELECT d.doc_id, d.source, d.n_tokens
        |FROM d LEFT JOIN r ON d.source = r.source
        |WHERE r.rate IS NULL
        |   OR (('0x' || substring(md5(d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        % 2147483647) / 2147483647.0 < r.rate
        |ORDER BY d.doc_id""".stripMargin,
    // Mix construction: same epoch replication, same (salt,id) hash order.
    "corpus_mix" ->
      """WITH up AS (
        |  SELECT doc_id, source,
        |         unnest(range(CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 2 ELSE 1 END)) AS epoch
        |  FROM documents),
        |k AS (SELECT doc_id, source, epoch,
        |        CAST(doc_id AS VARCHAR) || 'e' || CAST(epoch AS VARCHAR) AS id2 FROM up)
        |SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch FROM k
        |ORDER BY (('0x' || substring(md5('7:' || id2), 1, 8))::BIGINT % 2147483647) ASC, id2 ASC
        |LIMIT 120""".stripMargin,
    // Z-order: shift widths from binary bit length (len(bin(span)) ==
    // 64 - numberOfLeadingZeros(span)), then the same shift/mask interleave.
    "zorder_layout" ->
      """WITH g AS (SELECT CAST(min(l_orderkey) AS BIGINT) AS minx, CAST(max(l_orderkey) AS BIGINT) AS maxx,
        |                  CAST(min(l_partkey) AS BIGINT) AS miny, CAST(max(l_partkey) AS BIGINT) AS maxy
        |           FROM lineitem),
        |s AS (SELECT minx, miny,
        |        greatest(0, CASE WHEN maxx = minx THEN 0 ELSE len(bin(maxx - minx)) END - 16) AS sx,
        |        greatest(0, CASE WHEN maxy = miny THEN 0 ELSE len(bin(maxy - miny)) END - 16) AS sy
        |      FROM g),
        |c AS (SELECT l_orderkey, l_linenumber,
        |        (l_orderkey - minx) >> sx AS cx,
        |        (l_partkey - miny) >> sy AS cy
        |      FROM lineitem CROSS JOIN s)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(list_sum([(((cx >> i) & 1) << (2*i)) + (((cy >> i) & 1) << (2*i + 1)) for i in range(16)]) AS BIGINT) AS zkey
        |FROM c ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // URL canonicalization: same regex chain (DuckDB needs the 'g' flag —
    // its regexp_replace is first-match by default where Spark's is
    // global — and \1 backreferences where Spark uses $1).
    "url_canonicalize" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    ['HTTP://Example.COM:80', 'https://www.Example.com:443',
        |     'https://news.example.org', 'http://example.com'][CAST(doc_id % 4 AS INT) + 1]
        |    || '/Article/' || CAST(doc_id % 50 AS VARCHAR)
        |    || '?utm_source=x&id=' || CAST(doc_id % 25 AS VARCHAR)
        |    || '&utm_campaign=y#frag' AS url
        |  FROM documents),
        |cn AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              lower(regexp_extract(regexp_replace(url, '#.*$', ''), '^([^:/?#]+://[^/?#]*)', 1))
        |                || regexp_extract(regexp_replace(url, '#.*$', ''), '^[^:/?#]+://[^/?#]*(.*)$', 1),
        |              '://www\.', '://'),
        |            '^(http://[^/:?#]+):80([/?#]|$)', '\1\2'),
        |          '^(https://[^/:?#]+):443([/?#]|$)', '\1\2'),
        |        '([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*', '\1', 'g'),
        |      '([?&])&+', '\1', 'g'), '[?&]+$', '') AS url_canon
        |  FROM d)
        |SELECT doc_id, url_canon,
        |  CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY url_canon) THEN 1 ELSE 0 END
        |    ::BIGINT AS kept
        |FROM cn ORDER BY doc_id""".stripMargin,
    // Drift: same vocabulary rule, same ln grid, same per-token integer
    // floor; BIGINT·BIGINT products stay exact (< 2^53) so the double
    // division and floor agree bit-for-bit.
    "corpus_drift" ->
      """WITH ta AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS tok
        |  FROM documents WHERE source = 'src0'),
        |tb AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS tok
        |  FROM documents WHERE source <> 'src0'),
        |ca AS (SELECT tok, count(*) AS c FROM ta GROUP BY tok),
        |cb AS (SELECT tok, count(*) AS c FROM tb GROUP BY tok),
        |comb AS (SELECT tok, sum(c) AS ct FROM (SELECT * FROM ca UNION ALL SELECT * FROM cb) GROUP BY tok),
        |top AS (SELECT tok FROM comb ORDER BY ct DESC, tok LIMIT 200),
        |j AS (SELECT t.tok, coalesce(a.c, 0) AS ca, coalesce(b.c, 0) AS cb
        |      FROM top t LEFT JOIN ca a USING (tok) LEFT JOIN cb b USING (tok)),
        |g AS (SELECT count(*) AS v, CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM j),
        |s AS (SELECT
        |  CAST(floor((ca + 1) * (CAST(floor(ln((ca + 1.0) / (na + v)) * 1000000.0) AS BIGINT)
        |                       - CAST(floor(ln((cb + 1.0) / (nb + v)) * 1000000.0) AS BIGINT))
        |             / (na + v)) AS BIGINT) AS tab,
        |  CAST(floor((cb + 1) * (CAST(floor(ln((cb + 1.0) / (nb + v)) * 1000000.0) AS BIGINT)
        |                       - CAST(floor(ln((ca + 1.0) / (na + v)) * 1000000.0) AS BIGINT))
        |             / (nb + v)) AS BIGINT) AS tba
        |  FROM j CROSS JOIN g),
        |f AS (SELECT CAST(sum(tab) AS BIGINT) AS sab, CAST(sum(tba) AS BIGINT) AS sba FROM s)
        |SELECT g.na AS n_a, g.nb AS n_b,
        |  CAST(f.sab AS DOUBLE) / 1000000.0 AS kl_ab,
        |  CAST(f.sba AS DOUBLE) / 1000000.0 AS kl_ba
        |FROM f CROSS JOIN g""".stripMargin,
    // Script profile: count-by-deletion with RE2's \p{Latin} (= Java's
    // \p{IsLatin}); dominant pick replicates the priority tie-break.
    "text_scripts" ->
      """WITH src AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (CAST(100001 AS BIGINT), 'Привет мир это тест кириллицы'),
        |    (CAST(100002 AS BIGINT), '这是一个中文测试文档'),
        |    (CAST(100003 AS BIGINT), 'هذا اختبار عربي'),
        |    (CAST(100004 AS BIGINT), 'mixed Привет hello 世界'),
        |    (CAST(100005 AS BIGINT), '1234 ... !!!')
        |  ) AS v(doc_id, text)),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(t) - len(regexp_replace(t, '[\p{Latin}]', '', 'g')) AS BIGINT) AS latin,
        |    CAST(len(t) - len(regexp_replace(t, '[\p{Cyrillic}]', '', 'g')) AS BIGINT) AS cyrillic,
        |    CAST(len(t) - len(regexp_replace(t, '[\p{Han}]', '', 'g')) AS BIGINT) AS han,
        |    CAST(len(t) - len(regexp_replace(t, '[\p{Arabic}]', '', 'g')) AS BIGINT) AS arabic,
        |    CAST(len(t) - len(regexp_replace(t, '[\p{L}]', '', 'g')) AS BIGINT) AS letters
        |  FROM (SELECT doc_id, coalesce(text, '') AS t FROM src))
        |SELECT doc_id, latin, cyrillic, han, arabic, letters,
        |  CASE WHEN greatest(latin, cyrillic, han, arabic) = 0 THEN 'und'
        |       WHEN latin >= cyrillic AND latin >= han AND latin >= arabic THEN 'latin'
        |       WHEN cyrillic >= han AND cyrillic >= arabic THEN 'cyrillic'
        |       WHEN han >= arabic THEN 'han'
        |       ELSE 'arabic' END AS script
        |FROM c ORDER BY doc_id""".stripMargin,
    // BM25: identical stats, idf grid, summand grid, and float-expression
    // association term by term ((idf·tf)·(1.2+1.0) / (tf + 1.2·(0.25 +
    // ((0.75·dl)·n)/total))); score = exact integer sum. The indexed
    // entry shares it — posting-path ≡ scan-path is the property.
    "bm25_search" -> bm25Oracle,
    "phrase_search" -> phraseOracle,
    "phrase_search_appended" -> phraseOracle, // appended index ≡ fresh index
    "phrase_search_compacted" -> phraseOracle, // compacted index ≡ fresh index
    "bm25_search_indexed" -> bm25Oracle,
    "bm25_search_appended" -> bm25Oracle, // appended index ≡ scan path
    "bm25_search_compacted" -> bm25Oracle, // compacted index ≡ scan path
    // Expectations: each rule is one UNION ALL branch with identical
    // violation semantics (unique surplus = total − distinct).
    "expectations" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (CAST(-1 AS BIGINT), CAST(NULL AS BIGINT), 'Z', -5.0),
        |    (CAST(-1 AS BIGINT), CAST(-12345 AS BIGINT), 'Z', -5.0)
        |  ) AS v(o_orderkey, o_custkey, o_orderstatus, o_totalprice))
        |SELECT rule, violations, violations = 0 AS pass FROM (
        |  SELECT 'not_null:o_custkey' AS rule,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
        |  FROM src
        |  UNION ALL
        |  SELECT 'range:o_totalprice',
        |    CAST(sum(CASE WHEN coalesce(o_totalprice >= 0.0 AND o_totalprice <= 1000000.0, false)
        |                  THEN 0 ELSE 1 END) AS BIGINT)
        |  FROM src
        |  UNION ALL
        |  SELECT 'in_set:o_orderstatus',
        |    CAST(sum(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 0 ELSE 1 END) AS BIGINT)
        |  FROM src
        |  UNION ALL
        |  SELECT 'unique:o_orderkey',
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |  FROM src
        |  UNION ALL
        |  SELECT 'fk:o_custkey',
        |    CAST((SELECT count(*) FROM src
        |          WHERE o_custkey IS NOT NULL
        |            AND o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
        |) ORDER BY rule""".stripMargin,
    // Exact quantile selection: same index arithmetic.
    "profile_quantiles" ->
      """WITH s AS (SELECT l_quantity AS value,
        |             row_number() OVER (ORDER BY l_quantity) - 1 AS r FROM lineitem),
        |n AS (SELECT count(*) AS n FROM s),
        |q AS (SELECT unnest([0.0, 0.25, 0.5, 0.9, 0.99, 1.0]) AS p)
        |SELECT p, value
        |FROM q CROSS JOIN n JOIN s ON s.r = CAST(floor(p * (n - 1)) AS BIGINT)
        |ORDER BY p""".stripMargin,
    // Maintained CUBE ≡ fresh CUBE over the final state; NULLS FIRST
    // matches Spark's ASC default.
    "rollup_cube_incremental" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_o_totalprice
        |FROM (SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'X-URGENT' ELSE o_orderpriority END
        |        AS o_orderpriority, o_orderstatus, o_totalprice
        |      FROM orders)
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    // Maintained join view ≡ the from-scratch join of the final sources
    // (delta joins are exact set algebra, no arithmetic at all).
    "join_view_append" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice,
        |       o_custkey, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin,
    // Streaming twin: same maintained view, same from-scratch oracle.
    "join_view_stream" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice,
        |       o_custkey, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin,
    // Incrementally-maintained rollup ≡ fresh GROUP BY over the final
    // state (op-weighted decimal partials are order-free, so the
    // maintained value is bit-equal, not just approximately right).
    "rollup_incremental" ->
      """SELECT o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_o_totalprice
        |FROM (SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'X-URGENT' ELSE o_orderpriority END
        |        AS o_orderpriority, o_totalprice
        |      FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Maintained count/sum + per-cell HLL registers ≡ one fresh pass:
    // counts/sums from GROUP BY, distinct estimates from the same
    // register recomputation the hll_distinct_* oracles use.
    "rollup_distinct_incremental" -> {
      val num = graft.operators.Sketches.HllEstNumerator.toString
      s"""WITH agg AS (SELECT event_type, count(*) AS n_rows,
         |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         |  FROM events GROUP BY 1),
         |hx AS (SELECT event_type AS k,
         |  ('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |reg AS (SELECT k, h >> 48 AS bucket,
         |  max(CASE WHEN (h & ((1::BIGINT << 48) - 1)) = 0 THEN 49
         |      ELSE 49 - len(bin(h & ((1::BIGINT << 48) - 1))) END) AS r
         |  FROM hx GROUP BY k, h >> 48),
         |a AS (SELECT k, count(*) AS n_buckets,
         |        CAST(SUM(1::BIGINT << (49 - r)) AS BIGINT) AS ss
         |      FROM reg GROUP BY k),
         |e AS (SELECT k, n_buckets, CAST(4096 - n_buckets AS BIGINT) AS n_zero,
         |        CAST(ss + (4096 - n_buckets) * (1::BIGINT << 49) AS BIGINT) AS s
         |      FROM a)
         |SELECT event_type, n_rows, sum_value, n_buckets, n_zero,
         |  CAST(floor(CASE WHEN CAST($num AS DOUBLE) / CAST(s AS DOUBLE) <= 10240.0 AND n_zero > 0
         |       THEN 4096.0 * ln(4096.0 / CAST(n_zero AS DOUBLE))
         |       ELSE CAST($num AS DOUBLE) / CAST(s AS DOUBLE) END * 1000000.0) AS BIGINT)
         |    AS distinct_est_micro
         |FROM agg JOIN e ON e.k = agg.event_type ORDER BY event_type""".stripMargin
    },
    // Two-level per-key rank composes to the plain window rank.
    "topk_per_key" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice, rnk FROM (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin,
    // Exactly-n-per-stratum: the two-stage salted rank composes to the
    // plain global per-stratum rank, which is what the oracle computes.
    "stratified_sample" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      ('0x' || substring(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2147483647,
        |      doc_id) AS r
        |  FROM documents WHERE source IS NOT NULL)
        |WHERE r <= 15 ORDER BY doc_id""".stripMargin,
    // Shard cut: exact rank in (hash, id) order, integer shard arithmetic.
    "corpus_shards" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5('3:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM documents),
        |n AS (SELECT count(*) AS n FROM h),
        |p AS (SELECT doc_id,
        |        CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS position FROM h)
        |SELECT doc_id, position, CAST(position * 7 // n AS BIGINT) AS shard
        |FROM p CROSS JOIN n ORDER BY position""".stripMargin,
    // Per-column profile: one UNION ALL branch per profiled column.
    "profile_table" ->
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_orderdate")
        .map(c =>
          s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_nonnull,
             |  count(DISTINCT $c) AS n_distinct,
             |  CAST(min($c) AS VARCHAR) AS min_value, CAST(max($c) AS VARCHAR) AS max_value
             |FROM orders""".stripMargin)
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name"),
    // Chunking: same window starts, same inclusive 1-based token slices.
    "chunk_docs" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN [] ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM d),
        |c AS (SELECT doc_id, toks, n,
        |        CASE WHEN n = 0 THEN 0
        |             ELSE greatest(1, CAST(ceil((n - 40) * 1.0 / 32) AS BIGINT) + 1) END AS nchunks
        |      FROM n)
        |SELECT doc_id, i AS chunk_id,
        |       array_to_string(toks[i*32+1:i*32+40], ' ') AS chunk,
        |       CAST(least(40, n - i*32) AS BIGINT) AS n_chunk_tokens
        |FROM (SELECT doc_id, toks, n, unnest(range(nchunks)) AS i FROM c)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // Decontamination: shared-8-gram docs vs the probe set (docs 0-2).
    "decontaminate" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |pg AS (
        |  SELECT DISTINCT unnest([array_to_string(toks[i+1:i+8], ' ') for i in range(len(toks) - 7)]) AS g
        |  FROM tok WHERE doc_id < 3 AND len(toks) >= 8),
        |dg AS (
        |  SELECT doc_id, unnest([array_to_string(toks[i+1:i+8], ' ') for i in range(len(toks) - 7)]) AS g
        |  FROM tok WHERE len(toks) >= 8),
        |bad AS (SELECT DISTINCT dg.doc_id FROM dg JOIN pg USING (g))
        |SELECT d.doc_id, d.source FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY d.doc_id""".stripMargin,
    // Graded variant: gram positions hitting the distinct benchmark grams,
    // over total gram positions. Docs with < 8 tokens have no grams and no
    // row, same as the Spark side.
    "contamination_score" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |pg AS (
        |  SELECT DISTINCT unnest([array_to_string(toks[i+1:i+8], ' ') for i in range(len(toks) - 7)]) AS g
        |  FROM tok WHERE doc_id < 3 AND len(toks) >= 8),
        |dg AS (
        |  SELECT doc_id, unnest([array_to_string(toks[i+1:i+8], ' ') for i in range(len(toks) - 7)]) AS g
        |  FROM tok WHERE len(toks) >= 8),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM dg GROUP BY doc_id),
        |hit AS (SELECT dg.doc_id, CAST(count(*) AS BIGINT) AS contaminated_grams
        |        FROM dg JOIN pg USING (g) GROUP BY dg.doc_id)
        |SELECT t.doc_id, t.n_grams,
        |  coalesce(h.contaminated_grams, 0) AS contaminated_grams,
        |  CAST(coalesce(h.contaminated_grams, 0) AS DOUBLE) / t.n_grams AS contamination
        |FROM tot t LEFT JOIN hit h ON h.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // Full pipeline: the five stages recomputed in DuckDB, in the same
    // order — filter (quality/lang/length/repetition), keep-first dedup on
    // normalized text, budgeted sampling, prefix-sum shard packing.
    "corpus_pipeline" ->
      """WITH t AS (
        |  SELECT doc_id, source, text,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS ntok,
        |    CAST(len(text) AS DOUBLE) AS nchars,
        |    CAST(len(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE) AS alpha,
        |    CAST(len(list_filter(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0),
        |      x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this'], x))) AS DOUBLE) AS stophits,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |den AS (SELECT doc_id, toks, len(array_to_string(toks, ' ')) AS denom FROM t),
        |bg AS (
        |  SELECT doc_id, denom, unnest([toks[i+1] || ' ' || toks[i+2] for i in range(len(toks) - 1)]) AS g
        |  FROM den WHERE len(toks) >= 2),
        |bgtop AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) * len(g) / denom AS top2
        |  FROM bg GROUP BY doc_id, denom, g
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g ASC) = 1),
        |tg AS (
        |  SELECT doc_id, denom,
        |         unnest([toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] for i in range(len(toks) - 2)]) AS g
        |  FROM den WHERE len(toks) >= 3),
        |tgc AS (SELECT doc_id, denom, g, count(*) AS c FROM tg GROUP BY doc_id, denom, g),
        |tgdup AS (
        |  SELECT doc_id, CAST(sum(c * len(g)) AS BIGINT) / denom AS dup3
        |  FROM tgc WHERE c >= 2 GROUP BY doc_id, denom),
        |s AS (
        |  SELECT doc_id, source, text, CAST(ntok AS BIGINT) AS n_tokens,
        |    round(least(ntok / 50.0, 1.0) * 0.3
        |      + (CASE WHEN (CASE WHEN ntok > 0 THEN nchars / ntok ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.3 END) * 0.2
        |      + (CASE WHEN nchars > 0 THEN alpha / nchars ELSE 0.0 END) * 0.3
        |      + least((CASE WHEN ntok > 0 THEN stophits / ntok ELSE 0.0 END) * 5.0, 1.0) * 0.2, 6) AS quality,
        |    list_max([
        |      {'hits': len(list_filter(toks, x -> list_contains(['the','and','of','to','is','that','with','for'], x))), 'lang': 'en'},
        |      {'hits': len(list_filter(toks, x -> list_contains(['der','die','und','das','ist','nicht','ein','mit'], x))), 'lang': 'de'},
        |      {'hits': len(list_filter(toks, x -> list_contains(['le','la','les','est','une','dans','pour','que'], x))), 'lang': 'fr'},
        |      {'hits': len(list_filter(toks, x -> list_contains(['el','los','es','una','por','como','pero','más'], x))), 'lang': 'es'},
        |      {'hits': len(list_filter(toks, x -> list_contains(['的','是','了','在','我','有','和','不'], x))), 'lang': 'zh'}
        |    ]) AS best
        |  FROM t),
        |f AS (
        |  SELECT s.doc_id, s.source, s.text, s.n_tokens
        |  FROM s LEFT JOIN bgtop ON s.doc_id = bgtop.doc_id
        |         LEFT JOIN tgdup ON s.doc_id = tgdup.doc_id
        |  WHERE s.quality >= 0.5
        |    AND (CASE WHEN s.best.hits > 0 THEN s.best.lang ELSE 'und' END) = 'en'
        |    AND s.n_tokens BETWEEN 5 AND 1000
        |    AND coalesce(bgtop.top2, 0.0) <= 0.1 AND coalesce(tgdup.dup3, 0.0) <= 0.1),
        |dd AS (
        |  SELECT doc_id, source, n_tokens FROM (
        |    SELECT f.*, row_number() OVER (
        |      PARTITION BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
        |      ORDER BY doc_id) AS rn
        |    FROM f) WHERE rn = 1),
        |tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total FROM dd
        |        WHERE source IN ('src5', 'src6') GROUP BY source),
        |r AS (SELECT source,
        |        least(1.0, CASE source WHEN 'src5' THEN 400 WHEN 'src6' THEN 400 END / total) AS rate
        |      FROM tot),
        |sam AS (
        |  SELECT dd.doc_id, dd.source, dd.n_tokens
        |  FROM dd LEFT JOIN r ON dd.source = r.source
        |  WHERE r.rate IS NULL
        |     OR (('0x' || substring(md5(dd.source || ':' || CAST(dd.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |          % 2147483647) / 2147483647.0 < r.rate)
        |SELECT doc_id, source, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 1000 AS BIGINT) AS shard
        |FROM sam ORDER BY doc_id""".stripMargin,
    // Shard packing: the oracle is the naive global window; the engine's
    // two-level prefix sum must agree because addition is associative.
    "pack_shards" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2000 AS BIGINT) AS shard
        |FROM d ORDER BY doc_id""".stripMargin,
    // Repetition ratios: grouped n-gram counts, top-1 bigram coverage and
    // duplicated-trigram coverage over the re-joined-token denominator.
    "rep_ratios" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |den AS (SELECT doc_id, toks, len(array_to_string(toks, ' ')) AS denom FROM tok),
        |bg AS (
        |  SELECT doc_id, denom, unnest([toks[i+1] || ' ' || toks[i+2] for i in range(len(toks) - 1)]) AS g
        |  FROM den WHERE len(toks) >= 2),
        |bgtop AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) * len(g) / denom AS top2
        |  FROM bg GROUP BY doc_id, denom, g
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g ASC) = 1),
        |tg AS (
        |  SELECT doc_id, denom,
        |         unnest([toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] for i in range(len(toks) - 2)]) AS g
        |  FROM den WHERE len(toks) >= 3),
        |tgc AS (SELECT doc_id, denom, g, count(*) AS c FROM tg GROUP BY doc_id, denom, g),
        |tgdup AS (
        |  SELECT doc_id, CAST(sum(c * len(g)) AS BIGINT) / denom AS dup3
        |  FROM tgc WHERE c >= 2 GROUP BY doc_id, denom)
        |SELECT d.doc_id,
        |       coalesce(bgtop.top2, 0.0) AS top2,
        |       coalesce(tgdup.dup3, 0.0) AS dup3
        |FROM den d
        |LEFT JOIN bgtop ON d.doc_id = bgtop.doc_id
        |LEFT JOIN tgdup ON d.doc_id = tgdup.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // PII scrub: inject the same synthetic PII, mask with the same ordered
    // regexes ('g' = replace all, Spark's default).
    "pii_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        'contact u' || CAST(doc_id AS VARCHAR) || '@ex.com or +1 555-000' ||
        |        CAST(doc_id AS VARCHAR) || ' at 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) || ' ' || text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g'),
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "corpus_split" -> corpusSplitOracle,
    "top_ngrams" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i+1:i+2], ' ') for i in range(len(toks) - 1)] END AS grams
        |  FROM tok),
        |c AS (SELECT unnest(grams) AS gram FROM g)
        |SELECT gram, CAST(count(*) AS BIGINT) AS gram_count FROM c
        |GROUP BY gram ORDER BY gram_count DESC, gram LIMIT 50""".stripMargin,
    // Interpolated KN from scratch: same whitespace tokens as top_ngrams,
    // all divisions integer // on micro-scaled numerators.
    "kn_bigram_lm" ->
      """WITH tok AS (
        |  SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |g AS (SELECT [array_to_string(toks[i+1:i+2], ' ') for i in range(len(toks) - 1)] AS grams
        |      FROM tok WHERE len(toks) >= 2),
        |bg AS (SELECT string_split(unnest(grams), ' ') AS p FROM g),
        |c12 AS (SELECT p[1] AS w1, p[2] AS w2, CAST(count(*) AS BIGINT) AS c12
        |        FROM bg GROUP BY 1, 2),
        |l AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS n1f
        |      FROM c12 GROUP BY 1),
        |ct AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM c12 GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM c12)
        |SELECT w1, w2, c12,
        |  greatest(c12 * 1000000 - 750000, 0) // c1
        |  + (((750000 * n1f) // c1) * ((n1b * 1000000) // tot)) // 1000000 AS p_micro
        |FROM c12 JOIN l USING (w1) JOIN ct USING (w2) CROSS JOIN tot
        |ORDER BY p_micro DESC, w1, w2 LIMIT 100""".stripMargin,
    // Independent derivation: with hosts picked by doc_id mod 7, exactly
    // the wikipedia/blog/edu rows survive (blocked suffixes and the
    // unparseable empty host drop).
    "domain_filter" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    'https://' || (['ads.spam.example','en.wikipedia.org','blog.example.net',
        |                    'spam.example','example.edu','tracker.ads.net',''])[CAST(doc_id % 7 AS INT) + 1]
        |      || '/page/' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents)
        |SELECT doc_id, url FROM d WHERE doc_id % 7 IN (1, 2, 4) ORDER BY doc_id""".stripMargin,
    "quality_classifier" ->
      s"""WITH tok AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS toks
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, coalesce(list_sum(list_transform(toks,
         |    t -> ($qcWeightsSql)[(('0x' || substring(md5(t), 1, 8))::BIGINT % 2147483647) % 64 + 1])), 0.0) AS score
         |  FROM tok)
         |SELECT doc_id, score, score > 0 AS keep FROM s ORDER BY doc_id""".stripMargin,
    // Full LM replication: same tokenization, counts, stupid backoff
    // (alpha = 0.4), add-one unigram smoothing, and the 1e-6 floor-grid
    // per-token log-probs summed as exact integers.
    "lm_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |ex0 AS (
        |  SELECT doc_id, toks, unnest(toks) AS tok, unnest(range(1, len(toks) + 1)) AS i FROM tok),
        |ex AS (
        |  SELECT doc_id, tok, CASE WHEN i = 1 THEN NULL ELSE toks[i - 1] END AS prev FROM ex0),
        |uni AS (SELECT tok, count(*) AS c1 FROM ex GROUP BY tok),
        |bi AS (SELECT prev, tok, count(*) AS c2 FROM ex WHERE prev IS NOT NULL GROUP BY prev, tok),
        |tot AS (SELECT count(*) AS n, count(DISTINCT tok) AS v FROM ex),
        |sc AS (
        |  SELECT e.doc_id,
        |    CAST(floor(ln(
        |      CASE WHEN b.c2 IS NOT NULL THEN CAST(b.c2 AS DOUBLE) / cp.c1
        |           WHEN e.prev IS NOT NULL THEN 0.4 * (CAST(coalesce(u.c1, 0) + 1 AS DOUBLE) / (t.n + t.v))
        |           ELSE CAST(coalesce(u.c1, 0) + 1 AS DOUBLE) / (t.n + t.v) END) * 1000000.0) AS BIGINT) AS lp
        |  FROM ex e CROSS JOIN tot t
        |  LEFT JOIN uni u ON u.tok = e.tok
        |  LEFT JOIN uni cp ON cp.tok = e.prev
        |  LEFT JOIN bi b ON b.prev = e.prev AND b.tok = e.tok)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(lp) * -1 AS DOUBLE) / 1000000.0 / count(*) AS logppl
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Same per-line token arithmetic in DuckDB lambdas.
    "filter_lines" ->
      """WITH src AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (CAST(100001 AS BIGINT), 'Home' || chr(10) || 'the widget survey covers every model we ship today' || chr(10) || '42 1942 17' || chr(10) || '*** *** ***' || chr(10) || 'prices include the tax'),
        |    (CAST(100002 AS BIGINT), '$ % #' || chr(10) || '99')
        |  ) AS v(doc_id, text))
        |SELECT doc_id,
        |  coalesce(array_to_string(list_filter(string_split(coalesce(text, ''), chr(10)), l ->
        |    len(list_filter(regexp_split_to_array(lower(trim(l)), '\s+'), t -> len(t) > 0)) >= 3
        |    AND (CASE WHEN len(list_filter(regexp_split_to_array(lower(trim(l)), '\s+'), t -> len(t) > 0)) > 0
        |          THEN CAST(coalesce(list_sum(list_transform(
        |                 list_filter(regexp_split_to_array(lower(trim(l)), '\s+'), t -> len(t) > 0),
        |                 t -> CASE WHEN regexp_matches(t, '[a-z]') THEN 1 ELSE 0 END)), 0) AS DOUBLE)
        |             / len(list_filter(regexp_split_to_array(lower(trim(l)), '\s+'), t -> len(t) > 0))
        |          ELSE 0.0 END) >= 0.5),
        |    chr(10)), '') AS text
        |FROM src ORDER BY doc_id""".stripMargin,
    // Same keep-first prefix scan with DuckDB's 1-based indexed lambda.
    "dedup_lines_doc" ->
      """WITH src AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (CAST(100001 AS BIGINT), 'SITE HEADER' || chr(10) || 'real content one.' || chr(10) || 'SITE HEADER' || chr(10) || 'more content.' || chr(10) || 'SITE HEADER'),
        |    (CAST(100002 AS BIGINT), 'a' || chr(10) || 'x longer line here' || chr(10) || 'a' || chr(10) || 'x longer line here' || chr(10) || 'a'),
        |    (CAST(100003 AS BIGINT), 'unique one' || chr(10) || 'unique two')
        |  ) AS v(doc_id, text)),
        |l AS (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS lines FROM src)
        |SELECT doc_id,
        |  array_to_string(list_filter(lines,
        |    (x, i) -> len(x) < 6 OR coalesce(list_position(lines[1:i-1], x), 0) = 0),
        |    chr(10)) AS text
        |FROM l ORDER BY doc_id""".stripMargin,
    // Same sentence scan, same window arithmetic (1-based inclusive list
    // slices in DuckDB == slice(start, length) in Spark).
    "chunk_sentences" ->
      """WITH sent AS (
        |  SELECT doc_id, list_filter(list_transform(
        |    regexp_extract_all(coalesce(text, ''), '[^.!?]+[.!?]*'),
        |    s -> trim(s)), s -> len(s) > 0) AS sents
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, sents, len(sents) AS n,
        |    CASE WHEN len(sents) = 0 THEN 0
        |         ELSE greatest(1, CAST(ceil((len(sents) - 3) / 2.0) AS BIGINT) + 1) END AS n_chunks
        |  FROM sent),
        |e AS (SELECT doc_id, unnest(range(n_chunks)) AS chunk_id, sents, n FROM w WHERE n_chunks > 0)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  array_to_string(sents[chunk_id*2 + 1 : chunk_id*2 + 3], ' ') AS chunk,
        |  CAST(least(3, n - chunk_id*2) AS BIGINT) AS n_sentences
        |FROM e ORDER BY doc_id, chunk_id""".stripMargin,
    // Term-by-term Gopher replication: same tokenization, same counting,
    // same single double-division per ratio, same thresholds.
    "gopher_rules" ->
      """WITH tok AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(toks, t -> len(t))), 0) AS BIGINT) AS sum_len,
        |    CAST(len(text) - len(replace(text, '#', '')) AS BIGINT)
        |      + CAST((len(text) - len(replace(text, '...', ''))) / 3 AS BIGINT) AS symbols,
        |    string_split(text, chr(10)) AS lines,
        |    CAST(coalesce(list_sum(list_transform(toks,
        |      t -> CASE WHEN regexp_matches(t, '[a-z]') THEN 1 ELSE 0 END)), 0) AS BIGINT) AS alpha_words,
        |    CAST(CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END AS BIGINT) AS stopword_hits
        |  FROM tok),
        |m2 AS (
        |  SELECT doc_id, n_words,
        |    CASE WHEN n_words > 0 THEN CAST(sum_len AS DOUBLE) / n_words ELSE 0.0 END AS mean_word_len,
        |    CASE WHEN n_words > 0 THEN CAST(symbols AS DOUBLE) / n_words ELSE 0.0 END AS symbol_ratio,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(coalesce(list_sum(list_transform(lines,
        |      l -> CASE WHEN ltrim(l) LIKE '- %' OR ltrim(l) LIKE '* %' OR ltrim(l) LIKE chr(8226) || '%' THEN 1 ELSE 0 END)), 0) AS BIGINT) AS bullet_lines,
        |    CAST(coalesce(list_sum(list_transform(lines,
        |      l -> CASE WHEN rtrim(l) LIKE '%...' THEN 1 ELSE 0 END)), 0) AS BIGINT) AS ellipsis_lines,
        |    CASE WHEN n_words > 0 THEN CAST(alpha_words AS DOUBLE) / n_words ELSE 0.0 END AS alpha_frac,
        |    stopword_hits
        |  FROM m),
        |m3 AS (
        |  SELECT doc_id, n_words, mean_word_len, symbol_ratio,
        |    CASE WHEN n_lines > 0 THEN CAST(bullet_lines AS DOUBLE) / n_lines ELSE 0.0 END AS bullet_frac,
        |    CASE WHEN n_lines > 0 THEN CAST(ellipsis_lines AS DOUBLE) / n_lines ELSE 0.0 END AS ellipsis_frac,
        |    alpha_frac, stopword_hits
        |  FROM m2)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
        |  ellipsis_frac, alpha_frac, stopword_hits,
        |  (n_words >= 50 AND n_words <= 100000
        |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |    AND symbol_ratio <= 0.1
        |    AND bullet_frac <= 0.1 AND ellipsis_frac <= 0.3
        |    AND alpha_frac >= 0.8 AND stopword_hits >= 2) AS pass
        |FROM m3 ORDER BY doc_id""".stripMargin,
    // Full-tick recomputation: RefinedWeb line filter rewrites text; Gopher
    // (stopword threshold 1) + language id gate the rewrite; MinHash pairs
    // over the SURVIVORS' cleaned text; a later-generation doc drops iff it
    // pairs (est >= 0.5) with a COMMITTED doc of an earlier generation
    // (gen-1 drops don't shield gen-2 — they never reached the index);
    // ledger offsets = row_number over (commit order, doc_id). Bucket caps
    // are omitted: they never bite at these SFs (max occupancy 6 << 1000).
    "corpus_ingest_tick" ->
      """WITH lf AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 5 IN (1,2,3) THEN 0 WHEN doc_id % 5 = 4 THEN 1 ELSE 2 END AS gen,
        |    coalesce(array_to_string(list_filter(string_split(coalesce(text, ''), chr(10)), l ->
        |      len(list_filter(regexp_split_to_array(lower(trim(l)), '\s+'), t -> len(t) > 0)) >= 3
        |      AND (CASE WHEN len(list_filter(regexp_split_to_array(lower(trim(l)), '\s+'), t -> len(t) > 0)) > 0
        |            THEN CAST(coalesce(list_sum(list_transform(
        |                   list_filter(regexp_split_to_array(lower(trim(l)), '\s+'), t -> len(t) > 0),
        |                   t -> CASE WHEN regexp_matches(t, '[a-z]') THEN 1 ELSE 0 END)), 0) AS DOUBLE)
        |               / len(list_filter(regexp_split_to_array(lower(trim(l)), '\s+'), t -> len(t) > 0))
        |            ELSE 0.0 END) >= 0.5),
        |      chr(10)), '') AS text
        |  FROM documents),
        |tokg AS (
        |  SELECT doc_id, source, gen, text,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM lf),
        |mg AS (
        |  SELECT doc_id, source, gen, text, toks,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(toks, t -> len(t))), 0) AS BIGINT) AS sum_len,
        |    CAST(len(text) - len(replace(text, '#', '')) AS BIGINT)
        |      + CAST((len(text) - len(replace(text, '...', ''))) / 3 AS BIGINT) AS symbols,
        |    string_split(text, chr(10)) AS lines,
        |    CAST(coalesce(list_sum(list_transform(toks,
        |      t -> CASE WHEN regexp_matches(t, '[a-z]') THEN 1 ELSE 0 END)), 0) AS BIGINT) AS alpha_words,
        |    CAST(CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END AS BIGINT) AS stopword_hits,
        |    (list_max([
        |      {'hits': len(list_filter(toks, t -> list_contains(['the','and','of','to','is','that','with','for'], t))), 'lang': 'en'},
        |      {'hits': len(list_filter(toks, t -> list_contains(['der','die','und','das','ist','nicht','ein','mit'], t))), 'lang': 'de'},
        |      {'hits': len(list_filter(toks, t -> list_contains(['le','la','les','est','une','dans','pour','que'], t))), 'lang': 'fr'},
        |      {'hits': len(list_filter(toks, t -> list_contains(['el','los','es','una','por','como','pero','más'], t))), 'lang': 'es'},
        |      {'hits': len(list_filter(toks, t -> list_contains(['的','是','了','在','我','有','和','不'], t))), 'lang': 'zh'}
        |    ])) AS best
        |  FROM tokg),
        |surv AS (
        |  SELECT doc_id, source, gen, toks FROM mg
        |  WHERE (CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END) = 'en'
        |    AND n_words >= 50 AND n_words <= 100000
        |    AND (CASE WHEN n_words > 0 THEN CAST(sum_len AS DOUBLE) / n_words ELSE 0.0 END) BETWEEN 3.0 AND 10.0
        |    AND (CASE WHEN n_words > 0 THEN CAST(symbols AS DOUBLE) / n_words ELSE 0.0 END) <= 0.1
        |    AND (CASE WHEN len(lines) > 0 THEN CAST(coalesce(list_sum(list_transform(lines,
        |          l -> CASE WHEN ltrim(l) LIKE '- %' OR ltrim(l) LIKE '* %' OR ltrim(l) LIKE chr(8226) || '%' THEN 1 ELSE 0 END)), 0) AS DOUBLE) / len(lines) ELSE 0.0 END) <= 0.1
        |    AND (CASE WHEN len(lines) > 0 THEN CAST(coalesce(list_sum(list_transform(lines,
        |          l -> CASE WHEN rtrim(l) LIKE '%...' THEN 1 ELSE 0 END)), 0) AS DOUBLE) / len(lines) ELSE 0.0 END) <= 0.3
        |    AND (CASE WHEN n_words > 0 THEN CAST(alpha_words AS DOUBLE) / n_words ELSE 0.0 END) >= 0.8
        |    AND stopword_hits >= 1),
        |shg AS (
        |  SELECT doc_id, gen, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |    ELSE [array_to_string(toks[i+1:i+3], ' ') for i in range(len(toks) - 2)] END AS shingles
        |  FROM surv),
        |hvg AS (
        |  SELECT doc_id, gen, ('0x' || substring(md5(s), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM (SELECT doc_id, gen, unnest(shingles) AS s FROM shg)),
        |sig0g AS (
        |  SELECT doc_id, gen, i,
        |         min(((2654435761 * (i+1) % 2147483647) * h + 40503 * (i+13) % 2147483647) % 2147483647) AS mh
        |  FROM hvg CROSS JOIN (SELECT unnest(range(64)) AS i) seeds
        |  GROUP BY doc_id, gen, i),
        |sigg AS (SELECT doc_id, gen, list(mh ORDER BY i) AS sig FROM sig0g GROUP BY doc_id, gen),
        |bandedg AS (
        |  SELECT doc_id, gen, b AS band, array_to_string(sig[b*4+1:b*4+4], ',') AS bkey
        |  FROM sigg CROSS JOIN (SELECT unnest(range(16)) AS b) bands),
        |dups AS (
        |  SELECT DISTINCT a.doc_id AS id_a, a.gen AS ga, b.doc_id AS id_b, b.gen AS gb
        |  FROM bandedg a JOIN bandedg b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id <> b.doc_id
        |  WHERE a.gen > b.gen),
        |dupj AS (
        |  SELECT id_a, ga, id_b, gb,
        |    list_sum([CASE WHEN sa.sig[i+1] = sb.sig[i+1] THEN 1 ELSE 0 END for i in range(64)]) / 64.0 AS ej
        |  FROM dups JOIN sigg sa ON sa.doc_id = id_a JOIN sigg sb ON sb.doc_id = id_b),
        |hits AS (SELECT id_a, ga, id_b, gb FROM dupj WHERE ej >= 0.5),
        |k1 AS (
        |  SELECT doc_id FROM surv WHERE gen = 1
        |    AND doc_id NOT IN (SELECT id_a FROM hits WHERE ga = 1 AND gb = 0)),
        |k2 AS (
        |  SELECT doc_id FROM surv WHERE gen = 2
        |    AND doc_id NOT IN (
        |      SELECT id_a FROM hits
        |      WHERE ga = 2 AND (gb = 0 OR id_b IN (SELECT doc_id FROM k1)))),
        |fin AS (
        |  SELECT doc_id, source, gen FROM surv WHERE gen = 0
        |  UNION ALL
        |  SELECT s.doc_id, s.source, s.gen FROM surv s JOIN k1 ON s.doc_id = k1.doc_id WHERE s.gen = 1
        |  UNION ALL
        |  SELECT s.doc_id, s.source, s.gen FROM surv s JOIN k2 ON s.doc_id = k2.doc_id WHERE s.gen = 2)
        |SELECT CAST(row_number() OVER (ORDER BY gen, doc_id) - 1 AS BIGINT) AS "offset",
        |  doc_id, source
        |FROM fin ORDER BY "offset"""".stripMargin,
    // Same counts, same ln floors, same integer sums.
    "nb_classifier" ->
      """WITH tok AS (
        |  SELECT doc_id, (source = 'src0') AS lbl,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |ex AS (SELECT doc_id, lbl, unnest(toks) AS tok FROM tok),
        |cnt AS (
        |  SELECT tok,
        |    sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS cp,
        |    sum(CASE WHEN lbl THEN 0 ELSE 1 END) AS cn
        |  FROM ex GROUP BY tok),
        |tot AS (SELECT sum(cp) AS np, sum(cn) AS nn, count(*) AS v FROM cnt),
        |w AS (
        |  SELECT tok,
        |    CAST(floor(ln(CAST(cp + 1 AS DOUBLE) / (np + v)) * 1000000.0) AS BIGINT)
        |    - CAST(floor(ln(CAST(cn + 1 AS DOUBLE) / (nn + v)) * 1000000.0) AS BIGINT) AS w
        |  FROM cnt CROSS JOIN tot),
        |oov AS (
        |  SELECT CAST(floor(ln(CAST(1 AS DOUBLE) / (np + v)) * 1000000.0) AS BIGINT)
        |       - CAST(floor(ln(CAST(1 AS DOUBLE) / (nn + v)) * 1000000.0) AS BIGINT) AS ow
        |  FROM tot),
        |dc AS (
        |  SELECT sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS dp,
        |         sum(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) AS dn
        |  FROM documents),
        |bias AS (
        |  SELECT CAST(floor(ln(CAST(dp AS DOUBLE)) * 1000000.0) AS BIGINT)
        |       - CAST(floor(ln(CAST(dn AS DOUBLE)) * 1000000.0) AS BIGINT) AS b
        |  FROM dc),
        |sc AS (
        |  SELECT e.doc_id, sum(coalesce(w.w, o.ow)) AS s
        |  FROM ex e LEFT JOIN w ON w.tok = e.tok CROSS JOIN oov o
        |  GROUP BY e.doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(sc.s, 0) + b.b AS DOUBLE) / 1000000.0 AS score,
        |  (CAST(coalesce(sc.s, 0) + b.b AS DOUBLE) / 1000000.0) > 0.0 AS pred
        |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id CROSS JOIN bias b
        |ORDER BY d.doc_id""".stripMargin,
    // Every stage recomputed in sequence: the strip/clean chain, the
    // in-doc keep-first line scan, the Gopher terms (stopword threshold 1),
    // the survivor-trained LM, and the rank cut.
    "corpus_pipeline_v2" ->
      """WITH src AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (CAST(100001 AS BIGINT), 'NAV MENU' || chr(10) || '<p>the pipeline cleans the markup and the repeated navigation lines before the quality rules measure the words</p>' || chr(10) || 'NAV MENU' || chr(10) || 'after the cleaning stage the remaining text must still carry enough words for the gopher length rule to accept the document as real content for the training corpus we build here today' || chr(10) || 'NAV MENU'),
        |    (CAST(100002 AS BIGINT), '### ### ### ###')
        |  ) AS v(doc_id, text)),
        |cln0 AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(nfc_normalize(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(regexp_replace(regexp_replace(text,
        |          '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
        |          '(?s)<!--.*?-->', ' ', 'g'),
        |          '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |        '&nbsp;', ' '), '&amp;', '&')),
        |      '[\x00-\x09\x0B-\x1F\x7F]', ' ', 'g'), ' +', ' ', 'g')) AS text
        |  FROM src),
        |lns AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM cln0),
        |cln AS (
        |  SELECT doc_id,
        |    array_to_string(list_filter(lines,
        |      (x, i) -> len(x) < 6 OR coalesce(list_position(lines[1:i-1], x), 0) = 0),
        |      chr(10)) AS text
        |  FROM lns),
        |clf AS (
        |  SELECT doc_id,
        |    coalesce(array_to_string(list_filter(string_split(coalesce(text, ''), chr(10)), l ->
        |      len(list_filter(regexp_split_to_array(lower(trim(l)), '\s+'), t -> len(t) > 0)) >= 3
        |      AND (CASE WHEN len(list_filter(regexp_split_to_array(lower(trim(l)), '\s+'), t -> len(t) > 0)) > 0
        |            THEN CAST(coalesce(list_sum(list_transform(
        |                   list_filter(regexp_split_to_array(lower(trim(l)), '\s+'), t -> len(t) > 0),
        |                   t -> CASE WHEN regexp_matches(t, '[a-z]') THEN 1 ELSE 0 END)), 0) AS DOUBLE)
        |               / len(list_filter(regexp_split_to_array(lower(trim(l)), '\s+'), t -> len(t) > 0))
        |            ELSE 0.0 END) >= 0.5),
        |      chr(10)), '') AS text
        |  FROM cln),
        |tokg AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM clf),
        |mg AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(toks, t -> len(t))), 0) AS BIGINT) AS sum_len,
        |    CAST(len(text) - len(replace(text, '#', '')) AS BIGINT)
        |      + CAST((len(text) - len(replace(text, '...', ''))) / 3 AS BIGINT) AS symbols,
        |    string_split(text, chr(10)) AS lines,
        |    CAST(coalesce(list_sum(list_transform(toks,
        |      t -> CASE WHEN regexp_matches(t, '[a-z]') THEN 1 ELSE 0 END)), 0) AS BIGINT) AS alpha_words,
        |    CAST(CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END AS BIGINT) AS stopword_hits
        |  FROM tokg),
        |keep AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, n_words,
        |      CASE WHEN n_words > 0 THEN CAST(sum_len AS DOUBLE) / n_words ELSE 0.0 END AS mean_word_len,
        |      CASE WHEN n_words > 0 THEN CAST(symbols AS DOUBLE) / n_words ELSE 0.0 END AS symbol_ratio,
        |      CASE WHEN len(lines) > 0 THEN CAST(coalesce(list_sum(list_transform(lines,
        |        l -> CASE WHEN ltrim(l) LIKE '- %' OR ltrim(l) LIKE '* %' OR ltrim(l) LIKE chr(8226) || '%' THEN 1 ELSE 0 END)), 0) AS DOUBLE) / len(lines) ELSE 0.0 END AS bullet_frac,
        |      CASE WHEN len(lines) > 0 THEN CAST(coalesce(list_sum(list_transform(lines,
        |        l -> CASE WHEN rtrim(l) LIKE '%...' THEN 1 ELSE 0 END)), 0) AS DOUBLE) / len(lines) ELSE 0.0 END AS ellipsis_frac,
        |      CASE WHEN n_words > 0 THEN CAST(alpha_words AS DOUBLE) / n_words ELSE 0.0 END AS alpha_frac,
        |      stopword_hits
        |    FROM mg)
        |  WHERE n_words >= 50 AND n_words <= 100000
        |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |    AND symbol_ratio <= 0.1 AND bullet_frac <= 0.1 AND ellipsis_frac <= 0.3
        |    AND alpha_frac >= 0.8 AND stopword_hits >= 1),
        |surv AS (SELECT c.doc_id, c.text FROM clf c JOIN keep k ON k.doc_id = c.doc_id),
        |tok AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM surv),
        |ex0 AS (
        |  SELECT doc_id, toks, unnest(toks) AS tok, unnest(range(1, len(toks) + 1)) AS i FROM tok),
        |ex AS (
        |  SELECT doc_id, tok, CASE WHEN i = 1 THEN NULL ELSE toks[i - 1] END AS prev FROM ex0),
        |uni AS (SELECT tok, count(*) AS c1 FROM ex GROUP BY tok),
        |bi AS (SELECT prev, tok, count(*) AS c2 FROM ex WHERE prev IS NOT NULL GROUP BY prev, tok),
        |tot AS (SELECT count(*) AS n, count(DISTINCT tok) AS v FROM ex),
        |sc AS (
        |  SELECT e.doc_id,
        |    CAST(floor(ln(
        |      CASE WHEN b.c2 IS NOT NULL THEN CAST(b.c2 AS DOUBLE) / cp.c1
        |           WHEN e.prev IS NOT NULL THEN 0.4 * (CAST(coalesce(u.c1, 0) + 1 AS DOUBLE) / (t.n + t.v))
        |           ELSE CAST(coalesce(u.c1, 0) + 1 AS DOUBLE) / (t.n + t.v) END) * 1000000.0) AS BIGINT) AS lp
        |  FROM ex e CROSS JOIN tot t
        |  LEFT JOIN uni u ON u.tok = e.tok
        |  LEFT JOIN uni cp ON cp.tok = e.prev
        |  LEFT JOIN bi b ON b.prev = e.prev AND b.tok = e.tok),
        |agg AS (
        |  SELECT doc_id, CAST(sum(lp) * -1 AS DOUBLE) / 1000000.0 / count(*) AS logppl
        |  FROM sc GROUP BY doc_id),
        |nn AS (SELECT count(*) AS n FROM agg),
        |bkt AS (
        |  SELECT doc_id, (row_number() OVER (ORDER BY logppl, doc_id) - 1) * 3 // n AS bucket
        |  FROM agg CROSS JOIN nn)
        |SELECT b.doc_id, b.bucket, s.text
        |FROM bkt b JOIN surv s ON s.doc_id = b.doc_id
        |WHERE b.bucket < 2 ORDER BY b.doc_id""".stripMargin,
    // Same LM pipeline, then the exact 3-way rank cut:
    // bucket = floor(0-based-rank * 3 / n) over (logppl, doc_id) order.
    "ppl_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |ex0 AS (
        |  SELECT doc_id, toks, unnest(toks) AS tok, unnest(range(1, len(toks) + 1)) AS i FROM tok),
        |ex AS (
        |  SELECT doc_id, tok, CASE WHEN i = 1 THEN NULL ELSE toks[i - 1] END AS prev FROM ex0),
        |uni AS (SELECT tok, count(*) AS c1 FROM ex GROUP BY tok),
        |bi AS (SELECT prev, tok, count(*) AS c2 FROM ex WHERE prev IS NOT NULL GROUP BY prev, tok),
        |tot AS (SELECT count(*) AS n, count(DISTINCT tok) AS v FROM ex),
        |sc AS (
        |  SELECT e.doc_id,
        |    CAST(floor(ln(
        |      CASE WHEN b.c2 IS NOT NULL THEN CAST(b.c2 AS DOUBLE) / cp.c1
        |           WHEN e.prev IS NOT NULL THEN 0.4 * (CAST(coalesce(u.c1, 0) + 1 AS DOUBLE) / (t.n + t.v))
        |           ELSE CAST(coalesce(u.c1, 0) + 1 AS DOUBLE) / (t.n + t.v) END) * 1000000.0) AS BIGINT) AS lp
        |  FROM ex e CROSS JOIN tot t
        |  LEFT JOIN uni u ON u.tok = e.tok
        |  LEFT JOIN uni cp ON cp.tok = e.prev
        |  LEFT JOIN bi b ON b.prev = e.prev AND b.tok = e.tok),
        |agg AS (
        |  SELECT doc_id, CAST(sum(lp) * -1 AS DOUBLE) / 1000000.0 / count(*) AS logppl
        |  FROM sc GROUP BY doc_id),
        |nn AS (SELECT count(*) AS n FROM agg)
        |SELECT doc_id, logppl,
        |  (row_number() OVER (ORDER BY logppl, doc_id) - 1) * 3 // n AS bucket
        |FROM agg CROSS JOIN nn ORDER BY doc_id""".stripMargin,
    // nfc_normalize + the identical regex pipeline (RE2 and Java agree on
    // literal \xNN character-class ranges); newline survives, runs of
    // spaces collapse, trim last.
    // Identical regex + replace chain in DuckDB (RE2 and Java agree on
    // these patterns, incl. inline (?is) flags and lazy quantifiers).
    "strip_html" ->
      """WITH src AS (SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), '<html><head><title>T</title><style>p{color:red}</style></head><body><h1>Hello &amp; welcome</h1><!-- note --><p>1 &lt; 2, &quot;x&quot;&nbsp;&#39;y&#39;</p><script>var x = ''<p>not text</p>'';</script><p>end</p></body></html>'),
        |  (CAST(2 AS BIGINT), 'no markup at all'),
        |  (CAST(3 AS BIGINT), 'a &amp;lt; b')
        |) AS v(doc_id, html))
        |SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(nfc_normalize(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(regexp_replace(regexp_replace(html,
        |        '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
        |        '(?s)<!--.*?-->', ' ', 'g'),
        |        '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |      '&nbsp;', ' '), '&amp;', '&')),
        |    '[\x00-\x09\x0B-\x1F\x7F]', ' ', 'g'), ' +', ' ', 'g')) AS text
        |FROM src ORDER BY doc_id""".stripMargin,
    "text_normalize" ->
      """WITH src AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (CAST(100001 AS BIGINT), 'cafe' || chr(769) || '  du   monde'),
        |    (CAST(100002 AS BIGINT), 'a' || chr(9) || 'b' || chr(1) || 'c' || chr(127) || 'd'),
        |    (CAST(100003 AS BIGINT), '  keep' || chr(10) || 'newlines   intact  ')
        |  ) AS v(doc_id, text))
        |SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |    '[\x00-\x09\x0B-\x1F\x7F]', ' ', 'g'), ' +', ' ', 'g')) AS clean
        |FROM src ORDER BY doc_id""".stripMargin,
    // Token-level replication: global offset by (doc, position), sequence =
    // offset div 512, tokens rejoined in offset order.
    "pack_sequences" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |ex AS (SELECT doc_id, unnest(toks) AS tok, unnest(range(1, len(toks) + 1)) AS i FROM tok),
        |g AS (SELECT tok, row_number() OVER (ORDER BY doc_id, i) - 1 AS off FROM ex)
        |SELECT off // 512 AS seq_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       string_agg(tok, ' ' ORDER BY off) AS seq_text
        |FROM g GROUP BY seq_id ORDER BY seq_id""".stripMargin,
    // Boundary replication: each doc's first token's global offset -> its
    // sequence and within-seq position.
    "pack_sequence_bounds" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |ex AS (SELECT doc_id, unnest(toks) AS tok, unnest(range(1, len(toks) + 1)) AS i FROM tok),
        |g AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id, i) - 1 AS off FROM ex),
        |seqs AS (SELECT off // 512 AS seq_id, CAST(count(*) AS BIGINT) AS n_tokens FROM g GROUP BY seq_id),
        |starts AS (SELECT doc_id, min(off) AS off0 FROM g GROUP BY doc_id),
        |bounds AS (
        |  SELECT off0 // 512 AS seq_id,
        |         string_agg(CAST(off0 % 512 AS VARCHAR), ',' ORDER BY off0) AS doc_starts
        |  FROM starts GROUP BY seq_id)
        |SELECT s.seq_id, s.n_tokens, coalesce(b.doc_starts, '') AS doc_starts
        |FROM seqs s LEFT JOIN bounds b ON b.seq_id = s.seq_id
        |ORDER BY s.seq_id""".stripMargin,
    // Span-dedup replication on the window STRINGS (no hash needed in SQL):
    // same windows, same keep-first rule, same token-level rebuild.
    "dedup_spans" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |wins AS (
        |  SELECT doc_id, u.s * 10 AS start,
        |         array_to_string(toks[u.s * 10 + 1 : u.s * 10 + 20], ' ') AS wkey
        |  FROM tok, unnest(range(CASE WHEN len(toks) >= 20 THEN (len(toks) - 20) // 10 + 1 ELSE 0 END)) AS u(s)),
        |w2 AS (
        |  SELECT doc_id, start,
        |         row_number() OVER (PARTITION BY wkey ORDER BY doc_id, start) AS rn,
        |         count(*) OVER (PARTITION BY wkey) AS cnt
        |  FROM wins),
        |sp AS (SELECT doc_id, list(start) AS starts FROM w2 WHERE cnt >= 2 AND rn >= 2 GROUP BY doc_id),
        |rb AS (
        |  SELECT t.doc_id, toks,
        |    CASE WHEN sp.starts IS NULL THEN toks
        |         ELSE [toks[i + 1] for i in range(len(toks))
        |               if len(list_filter(sp.starts, s -> i >= s AND i < s + 20)) = 0] END AS kept
        |  FROM tok t LEFT JOIN sp USING (doc_id))
        |SELECT doc_id, coalesce(array_to_string(kept, ' '), '') AS text,
        |       CAST(len(toks) - len(kept) AS BIGINT) AS removed_tokens
        |FROM rb ORDER BY doc_id""".stripMargin,
    // Full DSIR replication: same portable hash buckets, add-one smoothed
    // count models, 1e-6 floor-grid log ratios, exact integer micro-sums.
    "dsir_score" ->
      """WITH tok AS (
        |  SELECT doc_id, source, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |ex0 AS (SELECT doc_id, source, toks, unnest(toks) AS tok, unnest(range(1, len(toks) + 1)) AS i FROM tok),
        |ex AS (SELECT doc_id, source, tok, CASE WHEN i = 1 THEN NULL ELSE toks[i - 1] END AS prev FROM ex0),
        |feats AS (
        |  SELECT doc_id, source, CAST((('0x' || substring(md5(tok), 1, 8))::BIGINT % 2147483647) % 1024 AS INT) AS b FROM ex
        |  UNION ALL
        |  SELECT doc_id, source, CAST((('0x' || substring(md5(prev || ' ' || tok), 1, 8))::BIGINT % 2147483647) % 1024 AS INT) AS b
        |  FROM ex WHERE prev IS NOT NULL),
        |tc AS (SELECT b, count(*) AS c FROM feats WHERE source = 'src0' GROUP BY b),
        |rc AS (SELECT b, count(*) AS c FROM feats GROUP BY b),
        |tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM tc) AS nt, (SELECT sum(c) FROM rc) AS nr),
        |w AS (
        |  SELECT rc.b,
        |    CAST(floor(1000000.0 * (ln((coalesce(tc.c, 0) + 1.0) / (t.nt + 1024.0))
        |                          - ln((rc.c + 1.0) / (t.nr + 1024.0)))) AS BIGINT) AS wm
        |  FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot t),
        |sc AS (
        |  SELECT doc_id, CAST(sum(wm) AS DOUBLE) / 1000000.0 AS score
        |  FROM feats JOIN w USING (b) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(sc.score, 0.0) AS score
        |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // The normalized word sequence the BPE pieces must rejoin to.
    "bpe_roundtrip" ->
      """SELECT doc_id,
        |  array_to_string(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |                              t -> len(t) > 0), ' ') AS text_rt
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_lines" ->
      """WITH docs AS (
        |  SELECT doc_id, replace(text, ' the ', chr(10)) AS text FROM documents),
        |sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs),
        |lines AS (
        |  SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos, unnest(ls) AS line FROM sp),
        |dup AS (
        |  SELECT line FROM (SELECT DISTINCT doc_id, line FROM lines WHERE length(line) >= 6)
        |  GROUP BY line HAVING count(*) >= 2),
        |kept AS (
        |  SELECT doc_id, pos, line FROM lines
        |  WHERE length(line) < 6 OR line NOT IN (SELECT line FROM dup)),
        |agg AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
        |         count(*) AS kept_n
        |  FROM kept GROUP BY doc_id),
        |base AS (SELECT doc_id, len(string_split(text, chr(10))) AS total_n FROM docs)
        |SELECT b.doc_id, coalesce(a.text, '') AS text,
        |       CAST(b.total_n - coalesce(a.kept_n, 0) AS BIGINT) AS removed_lines
        |FROM base b LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,
    "corpus_filter" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS ntok,
        |    CAST(len(text) AS DOUBLE) AS nchars,
        |    CAST(len(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE) AS alpha,
        |    CAST(len(list_filter(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0),
        |      x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this'], x))) AS DOUBLE) AS stophits,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CAST(ntok AS BIGINT) AS n_tokens,
        |    round(least(ntok / 50.0, 1.0) * 0.3
        |      + (CASE WHEN (CASE WHEN ntok > 0 THEN nchars / ntok ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.3 END) * 0.2
        |      + (CASE WHEN nchars > 0 THEN alpha / nchars ELSE 0.0 END) * 0.3
        |      + least((CASE WHEN ntok > 0 THEN stophits / ntok ELSE 0.0 END) * 5.0, 1.0) * 0.2, 6) AS quality,
        |    list_max([
        |      {'hits': len(list_filter(toks, t -> list_contains(['the','and','of','to','is','that','with','for'], t))), 'lang': 'en'},
        |      {'hits': len(list_filter(toks, t -> list_contains(['der','die','und','das','ist','nicht','ein','mit'], t))), 'lang': 'de'},
        |      {'hits': len(list_filter(toks, t -> list_contains(['le','la','les','est','une','dans','pour','que'], t))), 'lang': 'fr'},
        |      {'hits': len(list_filter(toks, t -> list_contains(['el','los','es','una','por','como','pero','más'], t))), 'lang': 'es'},
        |      {'hits': len(list_filter(toks, t -> list_contains(['的','是','了','在','我','有','和','不'], t))), 'lang': 'zh'}
        |    ]) AS best
        |  FROM t)
        |SELECT doc_id, quality, n_tokens FROM s
        |WHERE quality >= 0.5 AND (CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END) = 'en'
        |  AND n_tokens BETWEEN 5 AND 1000
        |ORDER BY doc_id""".stripMargin,
    "dedup_keep_first" ->
      """SELECT doc_id FROM (
        |  SELECT doc_id, row_number() OVER (
        |    PARTITION BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
        |    ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // Full pipeline oracle: minhash CTEs → est >= 0.5 pairs → jaccard >= 0.4
    // verify → transitive closure (recursive CTE) → min-label components →
    // docs that are canonical or untouched.
    "dedup_pipeline" ->
      s"""WITH RECURSIVE $minhashOracleCtes,
         |mp AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
         |shd AS (SELECT doc_id, list_distinct(shingles) AS dsh FROM sh),
         |ver AS (
         |  SELECT id_a, id_b FROM mp
         |  JOIN shd sa ON sa.doc_id = id_a JOIN shd sb ON sb.doc_id = id_b
         |  WHERE CASE WHEN len(list_distinct(list_cat(sa.dsh, sb.dsh))) > 0
         |             THEN CAST(len(list_intersect(sa.dsh, sb.dsh)) AS DOUBLE)
         |                / CAST(len(list_distinct(list_cat(sa.dsh, sb.dsh))) AS DOUBLE)
         |             ELSE 0.0 END >= 0.4),
         |edges AS (SELECT id_a AS s, id_b AS d FROM ver UNION SELECT id_b, id_a FROM ver),
         |reach(id, r) AS (
         |  SELECT s, s FROM edges
         |  UNION
         |  SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.id),
         |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM comp WHERE comp <> id)
         |ORDER BY doc_id""".stripMargin,
    "multimodal_meta" ->
      """WITH m AS (SELECT doc_id, octet_length(encode(text)) AS nbytes FROM documents)
        |SELECT doc_id, CAST(nbytes AS BIGINT) AS nbytes,
        |  CAST(len(list_filter([1 + i*greatest(nbytes//4, 1) for i in range(4)], s -> s <= nbytes)) AS BIGINT) AS n_frames,
        |  CAST(nbytes * 4 AS BIGINT) AS est_samples
        |FROM m ORDER BY doc_id""".stripMargin,
    // Closed-form expected decode results (see the entry's comment): the
    // fixtures are constructed so width/height/channels/dhash/duration/rms
    // are analytically known, not computed by the decoder under test.
    "multimodal_decode" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'image/png', 32, 16, 3, CAST(-1 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        |  (CAST(2 AS BIGINT), 'image/png', 8, 8, 1, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        |  (CAST(3 AS BIGINT), 'image/png', 16, 32, 3, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        |  (CAST(4 AS BIGINT), 'audio/wav', NULL, NULL, 1, CAST(NULL AS BIGINT), CAST(500 AS BIGINT), CAST(250 AS BIGINT)),
        |  (CAST(5 AS BIGINT), 'audio/wav', NULL, NULL, 1, CAST(NULL AS BIGINT), CAST(250 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(6 AS BIGINT), 'video/mp4', 640, 360, 1, CAST(NULL AS BIGINT), CAST(2500 AS BIGINT), CAST(NULL AS BIGINT))
        |) AS t(id, media_type, width, height, channels, dhash, duration_ms, rms_q)
        |ORDER BY id""".stripMargin,
    // Closed-form pairs (see the entry's fixture construction).
    "audio_neardup" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(2 AS BIGINT), 1),
        |  (CAST(3 AS BIGINT), CAST(4 AS BIGINT), 1)
        |) AS t(id_a, id_b, hamming) ORDER BY id_a, id_b""".stripMargin,
    // Closed-form pairs (see the entry's fixture construction).
    "image_neardup" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(2 AS BIGINT), 1),
        |  (CAST(3 AS BIGINT), CAST(4 AS BIGINT), 1)
        |) AS t(id_a, id_b, hamming) ORDER BY id_a, id_b""".stripMargin,
    // Closed-form: audio 1 = 1 s @8 kHz (first half amp 8192, second half
    // silence) → 4 × 250 ms segments with rms 250,250,0,0; audio 2 =
    // 300 ms @16384 → one full segment + a 400-frame (50 ms) tail, rms 500.
    "audio_segments" ->
      """SELECT * FROM (VALUES
        |  (CAST(100 AS BIGINT), CAST(0 AS BIGINT), CAST(2000 AS BIGINT), CAST(250 AS BIGINT), CAST(250 AS BIGINT)),
        |  (CAST(101 AS BIGINT), CAST(250 AS BIGINT), CAST(2000 AS BIGINT), CAST(250 AS BIGINT), CAST(250 AS BIGINT)),
        |  (CAST(102 AS BIGINT), CAST(500 AS BIGINT), CAST(2000 AS BIGINT), CAST(250 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(103 AS BIGINT), CAST(750 AS BIGINT), CAST(2000 AS BIGINT), CAST(250 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(200 AS BIGINT), CAST(0 AS BIGINT), CAST(2000 AS BIGINT), CAST(250 AS BIGINT), CAST(500 AS BIGINT)),
        |  (CAST(201 AS BIGINT), CAST(250 AS BIGINT), CAST(400 AS BIGINT), CAST(50 AS BIGINT), CAST(500 AS BIGINT))
        |) AS t(sid, start_ms, frames, duration_ms, rms_q) ORDER BY sid""".stripMargin,
    // Closed-form: video 6 = 10 frames @250ms (sync every 3rd), video 7 =
    // 5 frames @400ms (all sync); targets 0,1000,2000(,3000) pick the last
    // frame at-or-before each (tail-inclusive), keyframesOnly restricts to
    // sync samples. Payloads are the fixture's ASCII frame bytes.
    "video_frame_sample" ->
      """SELECT * FROM (VALUES
        |  ('all', CAST(6 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), true,  'frame-0-of-6'),
        |  ('all', CAST(6 AS BIGINT), CAST(4 AS BIGINT), CAST(1000 AS BIGINT), false, 'frame-4-of-6'),
        |  ('all', CAST(6 AS BIGINT), CAST(8 AS BIGINT), CAST(2000 AS BIGINT), false, 'frame-8-of-6'),
        |  ('all', CAST(6 AS BIGINT), CAST(9 AS BIGINT), CAST(2250 AS BIGINT), true,  'frame-9-of-6'),
        |  ('all', CAST(7 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), true,  'frame-0-of-7'),
        |  ('all', CAST(7 AS BIGINT), CAST(2 AS BIGINT), CAST(800 AS BIGINT), true,  'frame-2-of-7'),
        |  ('all', CAST(7 AS BIGINT), CAST(4 AS BIGINT), CAST(1600 AS BIGINT), true,  'frame-4-of-7'),
        |  ('key', CAST(6 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), true,  'frame-0-of-6'),
        |  ('key', CAST(6 AS BIGINT), CAST(3 AS BIGINT), CAST(750 AS BIGINT), true,  'frame-3-of-6'),
        |  ('key', CAST(6 AS BIGINT), CAST(6 AS BIGINT), CAST(1500 AS BIGINT), true,  'frame-6-of-6'),
        |  ('key', CAST(6 AS BIGINT), CAST(9 AS BIGINT), CAST(2250 AS BIGINT), true,  'frame-9-of-6'),
        |  ('key', CAST(7 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), true,  'frame-0-of-7'),
        |  ('key', CAST(7 AS BIGINT), CAST(2 AS BIGINT), CAST(800 AS BIGINT), true,  'frame-2-of-7'),
        |  ('key', CAST(7 AS BIGINT), CAST(4 AS BIGINT), CAST(1600 AS BIGINT), true,  'frame-4-of-7')
        |) AS t(mode, vid, frame_idx, pts_ms, keyframe, payload)
        |ORDER BY mode, vid, frame_idx""".stripMargin,
    "interval_join" ->
      """SELECT o.o_orderkey, l.l_linenumber, l.l_shipdate
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        | AND l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
        |WHERE o.o_orderkey % 50 = 0
        |ORDER BY o.o_orderkey, l.l_linenumber""".stripMargin,
    "window_join_agg" ->
      """SELECT time_bucket(INTERVAL '1 day', l.l_shipdate) AS wstart, COUNT(*) AS n,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        | AND l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
        |WHERE o.o_orderkey % 10 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Replicates the two-micro-batch leaderboard: top-5 after batch 1 (all
    // appends), then the snapshot CDC diff against the full-data top-5
    // (+A new entrant, -R dropped, -C/+C for score or place changes).
    "topn_retractions" ->
      """WITH s1 AS (SELECT user_id, max(value) AS score FROM events
        |            WHERE event_id % 2 = 0 GROUP BY user_id),
        |t1 AS (SELECT user_id, score,
        |         CAST(row_number() OVER (ORDER BY score DESC, user_id) AS INT) AS place
        |       FROM s1 QUALIFY place <= 5),
        |s2 AS (SELECT user_id, max(value) AS score FROM events GROUP BY user_id),
        |t2 AS (SELECT user_id, score,
        |         CAST(row_number() OVER (ORDER BY score DESC, user_id) AS INT) AS place
        |       FROM s2 QUALIFY place <= 5),
        |d AS (SELECT t1.user_id AS ok, t1.score AS os, t1.place AS opl,
        |             t2.user_id AS nk, t2.score AS ns, t2.place AS npl
        |      FROM t1 FULL OUTER JOIN t2 ON t1.user_id = t2.user_id
        |      WHERE t1.score IS DISTINCT FROM t2.score
        |         OR t1.place IS DISTINCT FROM t2.place),
        |ev2 AS (
        |  SELECT 0 AS op, nk AS user_id, ns AS score, npl AS place FROM d WHERE ok IS NULL
        |  UNION ALL SELECT 1, ok, os, opl FROM d WHERE nk IS NULL
        |  UNION ALL SELECT 2, ok, os, opl FROM d WHERE ok IS NOT NULL AND nk IS NOT NULL
        |  UNION ALL SELECT 3, nk, ns, npl FROM d WHERE ok IS NOT NULL AND nk IS NOT NULL),
        |led AS (
        |  SELECT 1 AS batch, 0 AS op, user_id, score, place FROM t1
        |  UNION ALL SELECT 2, op, user_id, score, place FROM ev2)
        |SELECT CAST(row_number() OVER (ORDER BY batch, user_id, op) - 1 AS BIGINT) AS "offset",
        |       CAST(op AS INT) AS op, user_id, score, place
        |FROM led ORDER BY "offset"""".stripMargin,
    "watermark_prop" ->
      """SELECT * FROM (VALUES
        |  ('run1', TIMESTAMP '2024-01-07 00:00:00'),
        |  ('run2', TIMESTAMP '2024-01-10 00:00:00')
        |) AS t(run, watermark) ORDER BY run""".stripMargin,
    "verification_tamper" ->
      """SELECT * FROM (VALUES
        |  ('block_edit', CAST(1 AS BIGINT), 'ChainIssue'),
        |  ('clean', CAST(0 AS BIGINT), ''),
        |  ('missing_data', CAST(1 AS BIGINT), 'SliceIssue'),
        |  ('slice_flip', CAST(1 AS BIGINT), 'SliceIssue')
        |) AS t(tamper_case, n_issues, kind) ORDER BY tamper_case""".stripMargin,
    "response_encoders" ->
      """WITH page AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  ORDER BY o_orderkey LIMIT 5)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, enc
        |FROM page CROSS JOIN (VALUES ('csv'), ('json')) e(enc)
        |ORDER BY enc, o_orderkey""".stripMargin,
    // Reset drops batch 3 (g = 2): same shape as dataset_multislice minus it.
    "workspace_search" ->
      """SELECT * FROM (VALUES
        |  ('cities', 'description', 'Population of world cities, updated monthly'),
        |  ('cities', 'schema', 'population INT')
        |) AS t(dataset, field, snippet) ORDER BY dataset, field""".stripMargin,
    // Goldens recomputed independently with python hmac/hashlib over the
    // documented RFC 9421 construction.
    "webhook_signing" ->
      """SELECT * FROM (VALUES (
        |  '{"version":2,"dataset_id":"cities","block_ref":"head","new_hash":"abc123","old_hash":"def456"}',
        |  'sha-256=:87rqYdsHOEcIO1VKfVugjLCOt45be3OLzBG4O0XGxqE=:',
        |  'sig1=:QPLLTKVkd5gkSZSTDfeF2hTU8AcsmPqWRAJ6voA5cFM=:',
        |  'sig1=("@method" "@path" "@authority" "x-webhook-timestamp" "content-digest"); keyid="default"; alg="hmac-sha256"; created=1700000000'
        |)) AS t(payload, content_digest, signature, signature_input)""".stripMargin,
    "flow_schedule" ->
      """SELECT * FROM (VALUES
        |  ('*/20 * * * *', '2024-01-01T00:59:00Z', TIMESTAMP '2024-01-01 01:00:00'),
        |  ('0 0,12 1-15 * *', '2024-01-15T12:00:00Z', TIMESTAMP '2024-02-01 00:00:00'),
        |  ('0 9 * * *', '2024-01-01T08:59:00Z', TIMESTAMP '2024-01-01 09:00:00'),
        |  ('0 9 * * *', '2024-01-01T09:00:00Z', TIMESTAMP '2024-01-02 09:00:00'),
        |  ('30 6 * * 1', '2024-01-01T06:30:00Z', TIMESTAMP '2024-01-08 06:30:00')
        |) AS t(expr, "after", next_fire) ORDER BY expr, "after"""".stripMargin,
    // The expected tick-by-tick decision log of the buffer:3:1h scenario:
    // 1 then 2 records buffer (deadline anchored at the FIRST unconsumed
    // commit), the 3rd fires, up-to-date retracts, and a lone late record
    // fires on the deadline.
    "flow_reactive" ->
      """SELECT * FROM (VALUES
        |  (TIMESTAMP '2024-03-01 00:01:00', 'batching 1/3 records until 2024-03-01T01:00:00Z', CAST(3 AS BIGINT)),
        |  (TIMESTAMP '2024-03-01 00:11:00', 'batching 2/3 records until 2024-03-01T01:00:00Z', CAST(3 AS BIGINT)),
        |  (TIMESTAMP '2024-03-01 00:21:00', 'pulled', CAST(3 AS BIGINT)),
        |  (TIMESTAMP '2024-03-01 00:22:00', 'not due', CAST(3 AS BIGINT)),
        |  (TIMESTAMP '2024-03-01 02:01:00', 'batching 1/3 records until 2024-03-01T03:00:00Z', CAST(3 AS BIGINT)),
        |  (TIMESTAMP '2024-03-01 03:00:00', 'pulled', CAST(3 AS BIGINT))
        |) AS t(tick, decision, downstream_last_offset) ORDER BY tick""".stripMargin,
    // HTTP pull preserves history byte-for-byte, same oracle as the FS path.
    "http_sync_roundtrip" ->
      """WITH base AS (
        |  SELECT o_orderkey % 3 AS g, o_orderdate AS event_time, o_orderkey, o_custkey, o_totalprice
        |  FROM orders)
        |SELECT row_number() OVER (ORDER BY g, event_time, o_orderkey) - 1 AS "offset",
        |       CAST(0 AS INT) AS op,
        |       CASE g WHEN 0 THEN TIMESTAMP '2024-01-01 00:00:00'
        |              WHEN 1 THEN TIMESTAMP '2024-01-02 00:00:00'
        |              ELSE TIMESTAMP '2024-01-03 00:00:00' END AS system_time,
        |       event_time, o_orderkey, o_custkey, o_totalprice
        |FROM base ORDER BY "offset"""".stripMargin,
    // The smart (WS) protocol round-trips the identical history, same oracle.
    "smart_sync_roundtrip" ->
      """WITH base AS (
        |  SELECT o_orderkey % 3 AS g, o_orderdate AS event_time, o_orderkey, o_custkey, o_totalprice
        |  FROM orders)
        |SELECT row_number() OVER (ORDER BY g, event_time, o_orderkey) - 1 AS "offset",
        |       CAST(0 AS INT) AS op,
        |       CASE g WHEN 0 THEN TIMESTAMP '2024-01-01 00:00:00'
        |              WHEN 1 THEN TIMESTAMP '2024-01-02 00:00:00'
        |              ELSE TIMESTAMP '2024-01-03 00:00:00' END AS system_time,
        |       event_time, o_orderkey, o_custkey, o_totalprice
        |FROM base ORDER BY "offset"""".stripMargin,
    // HTTP push lands the identical history on the node, same oracle again.
    "http_push_roundtrip" ->
      """WITH base AS (
        |  SELECT o_orderkey % 3 AS g, o_orderdate AS event_time, o_orderkey, o_custkey, o_totalprice
        |  FROM orders)
        |SELECT row_number() OVER (ORDER BY g, event_time, o_orderkey) - 1 AS "offset",
        |       CAST(0 AS INT) AS op,
        |       CASE g WHEN 0 THEN TIMESTAMP '2024-01-01 00:00:00'
        |              WHEN 1 THEN TIMESTAMP '2024-01-02 00:00:00'
        |              ELSE TIMESTAMP '2024-01-03 00:00:00' END AS system_time,
        |       event_time, o_orderkey, o_custkey, o_totalprice
        |FROM base ORDER BY "offset"""".stripMargin,
    // Lineage graph shape (edges + depths) is fully deterministic.
    "lineage" ->
      """SELECT * FROM (VALUES
        |  ('cities', 'root', 0, CAST(NULL AS VARCHAR)),
        |  ('weather', 'root', 0, CAST(NULL AS VARCHAR)),
        |  ('cities_x10', 'derivative', 1, 'cities'),
        |  ('combo', 'derivative', 2, 'cities_x10'),
        |  ('combo', 'derivative', 2, 'weather')
        |) AS t(dataset, kind, depth, input)
        |ORDER BY depth, dataset, input""".stripMargin,
    // Sync preserves history byte-for-byte — the pulled dataset's full
    // history equals the 3-batch source (same oracle as the multislice scan).
    "sync_roundtrip" ->
      """WITH base AS (
        |  SELECT o_orderkey % 3 AS g, o_orderdate AS event_time, o_orderkey, o_custkey, o_totalprice
        |  FROM orders)
        |SELECT row_number() OVER (ORDER BY g, event_time, o_orderkey) - 1 AS "offset",
        |       CAST(0 AS INT) AS op,
        |       CASE g WHEN 0 THEN TIMESTAMP '2024-01-01 00:00:00'
        |              WHEN 1 THEN TIMESTAMP '2024-01-02 00:00:00'
        |              ELSE TIMESTAMP '2024-01-03 00:00:00' END AS system_time,
        |       event_time, o_orderkey, o_custkey, o_totalprice
        |FROM base ORDER BY "offset"""".stripMargin,
    "reset" ->
      """WITH base AS (
        |  SELECT o_orderkey % 3 AS g, o_orderdate AS event_time, o_orderkey, o_custkey, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 < 2)
        |SELECT row_number() OVER (ORDER BY g, event_time, o_orderkey) - 1 AS "offset",
        |       CAST(0 AS INT) AS op,
        |       CASE g WHEN 0 THEN TIMESTAMP '2024-01-01 00:00:00'
        |              ELSE TIMESTAMP '2024-01-02 00:00:00' END AS system_time,
        |       event_time, o_orderkey, o_custkey, o_totalprice
        |FROM base ORDER BY "offset"""".stripMargin,
    "push_ingest_rest" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS INT), CAST(1 AS BIGINT), 'a'),
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), CAST(2 AS BIGINT), 'b'),
        |  (CAST(2 AS BIGINT), CAST(0 AS INT), CAST(3 AS BIGINT), 'c')
        |) AS t("offset", op, id, v) ORDER BY "offset"""".stripMargin,
    "ingest_decompress" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'seattle', 733000),
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'vancouver', 675000)
        |) AS t("offset", op, system_time, event_time, city, population)
        |ORDER BY "offset"""".stripMargin,
    "ingest_pipe" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'SEATTLE', 733000),
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00', 'VANCOUVER', 675000)
        |) AS t("offset", op, system_time, event_time, city, population)
        |ORDER BY "offset"""".stripMargin,
    "fetch_glob" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-02-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00', CAST(1 AS BIGINT), 'a'),
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-02-01 00:00:00', TIMESTAMP '2024-01-02 00:00:00', CAST(2 AS BIGINT), 'b'),
        |  (CAST(2 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-02-02 00:00:00', TIMESTAMP '2024-01-03 00:00:00', CAST(3 AS BIGINT), 'c')
        |) AS t("offset", op, system_time, event_time, id, v)
        |ORDER BY "offset"""".stripMargin,
    "fetch_url" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-03-01 00:00:00', TIMESTAMP '2024-03-01 00:00:00', CAST(1 AS BIGINT), 'a'),
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-03-01 00:00:00', TIMESTAMP '2024-03-01 00:00:00', CAST(2 AS BIGINT), 'b'),
        |  (CAST(2 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-03-03 00:00:00', TIMESTAMP '2024-03-03 00:00:00', CAST(3 AS BIGINT), 'c')
        |) AS t("offset", op, system_time, event_time, id, v)
        |ORDER BY "offset"""".stripMargin,
    "to_table" ->
      """SELECT * FROM (VALUES
        |  ('kyiv', 2884000), ('seattle', 733000), ('vancouver', 675000)
        |) AS t(city, population) ORDER BY city""".stripMargin,
    // Same drain shape as fetch_url: poll 1 lands ids 1-2, poll 2 re-emits
    // them plus id 3 and the ledger left-anti keeps only id 3.
    "fetch_container" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-03-01 00:00:00', TIMESTAMP '2024-03-01 00:00:00', CAST(1 AS BIGINT), 'a'),
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-03-01 00:00:00', TIMESTAMP '2024-03-01 00:00:00', CAST(2 AS BIGINT), 'b'),
        |  (CAST(2 AS BIGINT), CAST(0 AS INT), TIMESTAMP '2024-03-03 00:00:00', TIMESTAMP '2024-03-03 00:00:00', CAST(3 AS BIGINT), 'c')
        |) AS t("offset", op, system_time, event_time, id, v)
        |ORDER BY "offset"""".stripMargin,
    "schema_introspect" ->
      """SELECT * FROM (VALUES
        |  (0, 'offset', 'bigint'),
        |  (1, 'op', 'int'),
        |  (2, 'system_time', 'timestamp'),
        |  (3, 'event_time', 'timestamp'),
        |  (4, 'city', 'string'),
        |  (5, 'population', 'int')
        |) AS t(ordinal, col_name, col_type) ORDER BY ordinal""".stripMargin,
    "mqtt_ingest" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'a'), (CAST(2 AS BIGINT), 'b')
        |) AS t(id, v) ORDER BY id""".stripMargin,
    "eth_logs" ->
      """SELECT CAST(b AS BIGINT) AS "blockNumber", '0xtx' || b AS "transactionHash",
        |       CAST(b % 4 AS BIGINT) AS "logIndex", '0xdata' || b AS data
        |FROM (SELECT unnest(range(0, 121, 10)) AS b)
        |ORDER BY "blockNumber"""".stripMargin
  )
}
