package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Changelog, MergeStrategy}

/**
 * The reference's three Criterion micro-benchmark shapes at 1M rows
 * (src/infra/ingest-datafusion/benches/{cdc_project,snapshot,ledger}.rs),
 * regenerated deterministically (hash-based, no RNG state) so the exact same
 * parquet feeds both Spark (here) and DuckDB (tools/criterion_duckdb.py).
 *
 * Prints one JSON line with cold and warm timings; writes the generated
 * tables to /tmp/graft-criterion for the DuckDB side.
 *
 * Row count defaults to the reference's 1M and is overridable via the first
 * program arg (e.g. `runMain graft.CriterionBench 10000000`) — the 10M run is
 * where Spark's fixed per-job scheduling floor amortizes and the ratio vs a
 * single-process engine reflects actual operator cost. Key spaces scale with
 * n so the update/insert/delete mix keeps the 1M shape.
 */
object CriterionBench {

  private def h(seed: Int) = xxhash64(col("id"), lit(seed))

  def main(args: Array[String]): Unit = {
    val spark = SessionDefaults.tuned(SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Shuffle/spill scratch on tmpfs — the local-mode analog of pointing a
      // cluster's spark.local.dir at fast NVMe. /tmp here is spinning ext4.
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = "/tmp/graft-criterion"

    // --- cdc_project: n-row CDC ledger, 2-col PK, random op mix
    // (cdc_project.rs:18-136)
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    // `reuse` as the second arg skips regeneration of tables that already
    // exist (generation dominates the wall clock at 100M; the tables are
    // deterministic for a given n, so a re-measurement against existing data
    // is the same benchmark).
    val reuse = args.length > 1 && args(1) == "reuse"
    generate(spark, out, n, skipExisting = reuse)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val rows = f; ((System.nanoTime() - t0) / 1e9, rows)
    }

    def cdcProject(): Long =
      Changelog.project(spark.read.parquet(s"$out/cdc_ledger"), Seq("pk1", "pk2")).count()
    def snapMerge(): Long =
      MergeStrategy
        .Snapshot(Seq("pk1", "pk2"))
        .merge(Some(spark.read.parquet(s"$out/snap_prev")), spark.read.parquet(s"$out/snap_new"))
        .count()
    def ledgerMerge(): Long =
      MergeStrategy
        .Ledger(Seq("pk"))
        .merge(Some(spark.read.parquet(s"$out/ledger_prev")), spark.read.parquet(s"$out/ledger_new"))
        .count()
    def ledgerMergeSmall(prune: Boolean): Long =
      MergeStrategy
        .Ledger(Seq("pk"), bloomPrune = prune)
        .merge(
          Some(spark.read.parquet(s"$out/ledger_prev")),
          spark.read.parquet(s"$out/ledger_new_small"))
        .count()

    val all = Seq(
      ("cdc_project", () => cdcProject()),
      ("snapshot_merge", () => snapMerge()),
      ("ledger_merge", () => ledgerMerge()),
      ("ledger_merge_small", () => ledgerMergeSmall(prune = true)),
      ("ledger_merge_small_noprune", () => ledgerMergeSmall(prune = false))
    )
    // optional third arg: comma-separated shape subset
    val shapes =
      if (args.length > 2) { val s = args(2).split(",").toSet; all.filter(p => s(p._1)) }
      else all
    val results = shapes.map { case (name, f) =>
      val (cold, rows) = time(f())
      val warm = (1 to 3).map(_ => time(f())._1).min
      (name, cold, warm, rows)
    }
    val json = results
      .map { case (n2, c, w, r) => s""""$n2":{"cold":$c,"warm":$w,"rows":$r}""" }
      .mkString(s"""{"n":$n,""", ",", "}")
    println(s"""CRITERION $json""")
    spark.stop()
  }

  private def generate(
      spark: SparkSession, out: String, n: Long, skipExisting: Boolean = false): Unit = {
    // Reuse is only valid against tables generated for the SAME n — a
    // marker file records it, so `100000000 reuse` over leftover 1M tables
    // regenerates instead of silently mislabeling the results.
    val marker = java.nio.file.Paths.get(out, "n.txt")
    val sameN = java.nio.file.Files.exists(marker) &&
      java.nio.file.Files.readString(marker).trim == n.toString
    def need(table: String): Boolean =
      !(skipExisting && sameN) || !new java.io.File(s"$out/$table").isDirectory
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    // The marker is deleted BEFORE any table is overwritten and rewritten
    // only after generation completes: a crash mid-generation leaves no
    // marker at all, so a later `<old-n> reuse` run can never see a stale
    // sameN=true over a mix of old-n and new-n tables.
    val willWrite = !(skipExisting && sameN) ||
      Seq("cdc_ledger", "snap_prev", "snap_new", "ledger_prev", "ledger_new", "ledger_new_small")
        .exists(t => !new java.io.File(s"$out/$t").isDirectory)
    if (willWrite) java.nio.file.Files.deleteIfExists(marker)

    if (need("cdc_ledger")) spark.range(n).select(
      col("id").as("offset"),
      pmod(h(1), lit(4)).cast("int").as("op"),
      pmod(h(2), lit(n / 10)).as("pk1"),
      pmod(h(3), lit(100)).as("pk2"),
      pmod(h(4), lit(1000)).as("cmp1"),
      pmod(h(5), lit(1000)).as("cmp2"),
      h(6).as("aux1"),
      h(7).as("aux2")
    ).write.mode("overwrite").parquet(s"$out/cdc_ledger")

    // --- snapshot: 1M-row prior state vs a new full snapshot with ~10%
    // changed, ~5% deleted, ~5% inserted (snapshot.rs:196-218)
    lazy val state = spark.range(n).select(
      pmod(h(2), lit(2 * n)).as("pk1"),
      pmod(h(3), lit(100)).as("pk2"),
      pmod(h(4), lit(1000)).as("cmp1"),
      pmod(h(5), lit(1000)).as("cmp2")
    ).dropDuplicates("pk1", "pk2")
    if (need("snap_prev")) state
      // Offsets here only need to be UNIQUE (each key appears once, so the
      // per-key max_by/row_number in both engines is offset-independent) —
      // monotonically_increasing_id keeps generation fully parallel where a
      // global row_number window would funnel everything through one task.
      .withColumn("offset", monotonically_increasing_id())
      .withColumn("op", lit(0))
      .select("offset", "op", "pk1", "pk2", "cmp1", "cmp2")
      .write.mode("overwrite").parquet(s"$out/snap_prev")
    if (need("snap_new")) state
      .filter(pmod(xxhash64(col("pk1"), col("pk2"), lit(10)), lit(20)) =!= 0) // ~5% deleted
      .withColumn(
        "cmp1",
        when(pmod(xxhash64(col("pk1"), col("pk2"), lit(11)), lit(10)) === 0, col("cmp1") + 1)
          .otherwise(col("cmp1")) // ~10% changed
      )
      .unionByName(
        spark.range(n, n + n / 20).select( // ~5% new keys (outside pk range)
          (pmod(h(2), lit(2 * n)) + 2 * n).as("pk1"),
          pmod(h(3), lit(100)).as("pk2"),
          pmod(h(4), lit(1000)).as("cmp1"),
          pmod(h(5), lit(1000)).as("cmp2")
        )
      )
      .write.mode("overwrite").parquet(s"$out/snap_new")

    // --- ledger: 1M prior + 500k incoming, half already seen
    // (ledger.rs:179-191)
    if (need("ledger_prev")) spark.range(n)
      .select(pmod(h(8), lit(10 * n)).as("pk"), h(9).as("v"))
      .dropDuplicates("pk")
      .write.mode("overwrite").parquet(s"$out/ledger_prev")
    if (need("ledger_new")) spark.range(n - n / 4, n + n / 4)
      .select(pmod(h(8), lit(10 * n)).as("pk"), h(9).as("v"))
      .dropDuplicates("pk")
      .write.mode("overwrite").parquet(s"$out/ledger_new")

    // --- ledger small-batch: same prior, incoming shrunk to n/100 (half
    // seen). This is the shape real ingest has at scale — one batch vs the
    // whole history — and the one the bloom pre-prune is built for; the
    // reference bench's incoming=n/2 shape (above) is where the prune gates
    // itself OFF.
    if (need("ledger_new_small")) spark.range(n - n / 200, n + n / 200)
      .select(pmod(h(8), lit(10 * n)).as("pk"), h(9).as("v"))
      .dropDuplicates("pk")
      .write.mode("overwrite").parquet(s"$out/ledger_new_small")

    // Written last: a crash above leaves no (or a stale) marker, so the next
    // run regenerates rather than reusing a half-written table set.
    java.nio.file.Files.writeString(marker, n.toString)
  }
}
