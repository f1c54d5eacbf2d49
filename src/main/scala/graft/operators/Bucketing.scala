package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Co-located table materialization — the 100 TB join-layout tool. A table
 * written `bucketBy(join key)` gives every subsequent join on that key a
 * storage-partitioned plan: both bucketed sides satisfy the join's
 * clustering requirement straight off the scan, so the fact-to-fact join
 * runs with ZERO Exchange — the layout is paid once at write time instead
 * of one shuffle per query. This is the pattern behind the bucketed LSH
 * corpus ([[Similarity.materializeLshCorpus]]) and the bucketed classic-SQL
 * fact tables (`q3_bucketed`); the reference reaches the same effect via
 * its own partitioned parquet layouts.
 */
object Bucketing {

  /**
   * Write `df` as a managed parquet table bucketed (and optionally sorted)
   * by `bucketCol`. Drops any prior catalog entry AND its warehouse
   * location first: a fresh in-memory catalog does not know about tables a
   * previous session materialized, but their managed locations persist —
   * saveAsTable would fail with LOCATION_ALREADY_EXISTS.
   */
  def materializeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil
  ): Unit =
    materializeBucketedBy(df, table, Seq(bucketCol), numBuckets, sortCols)

  /** Composite-key variant: `bucketBy(numBuckets, cols...)` — the layout
    * for joins on a multi-part key (e.g. the multi-table LSH corpus's
    * (table, bucket)). */
  def materializeBucketedBy(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil
  ): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    require(bucketCols.nonEmpty, "need at least one bucket column")
    // Unqualified names only: the stale-location cleanup below computes the
    // managed path as wh/<name>, which is wrong for db-qualified tables
    // (db.tbl lives at wh/db.db/tbl), and the backticked DROP would quote
    // the whole qualified name as one identifier.
    require(!table.contains("."),
      s"materializeBucketed takes an unqualified table name, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  // -------------------------------------------------------------- Z-order

  /**
   * Morton (Z-order) interleave key over k integral columns — the
   * multi-dimensional clustering layout (the OPTIMIZE ZORDER of
   * Delta/Iceberg): rows written range-partitioned and sorted by this key
   * give parquet min/max pruning leverage on EVERY participating column at
   * once, where a plain sort helps only its leading column. Each column is
   * scaled to `bits` bits by a pure RIGHT SHIFT of (v − min) — no division,
   * so the code is exact integer arithmetic end to end and any engine
   * reproduces it bit-identically (the shift width is the column's bit
   * length minus `bits`, from one bounded min/max aggregate). The
   * interleave itself is a static shift/mask expression — whole-stage
   * codegen, map-only.
   */
  def zorderKey(
      cols: Seq[Column],
      mins: Seq[Long],
      maxs: Seq[Long],
      bits: Int = 16
  ): Column = {
    val k = cols.size
    require(k >= 1 && k * bits <= 63, "need 1..k columns with k*bits <= 63")
    require(mins.size == k && maxs.size == k, "one (min,max) per column")
    val codes = cols.zipWithIndex.map { case (c, j) =>
      val span = maxs(j) - mins(j)
      val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(span)
      val s = math.max(0, bitLen - bits)
      shiftright(c.cast("long") - lit(mins(j)), s)
    }
    (for (i <- 0 until bits; j <- 0 until k)
      yield shiftleft(shiftright(codes(j), i).bitwiseAND(lit(1L)), i * k + j))
      .reduce(_ + _)
  }

  /** Attach the Z-order key of `cols` as `keyCol` — min/max come from one
    * bounded aggregate over the input. The read side of [[zorderWrite]];
    * exposed separately so the key is oracle-checkable. */
  def withZorderKey(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 16,
      keyCol: String = "zkey"
  ): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    require(!(0 until cols.size * 2).exists(row.isNullAt),
      "zorder columns must be non-null (or the table empty-checked upstream)")
    val mins = cols.indices.map(j => row.getLong(2 * j))
    val maxs = cols.indices.map(j => row.getLong(2 * j + 1))
    df.withColumn(keyCol, zorderKey(cols.map(col), mins, maxs, bits))
  }

  /**
   * Materialize `df` Z-ordered on `cols`: key → repartitionByRange(`files`)
   * → sortWithinPartitions → plain parquet table. Each output file then
   * covers a compact hyper-box of the column space, so a filter on ANY of
   * the z-ordered columns prunes most files from its parquet min/max stats
   * alone — the scan-side complement of [[materializeBucketed]]'s
   * join-side layout.
   */
  def zorderWrite(
      df: DataFrame,
      table: String,
      cols: Seq[String],
      files: Int,
      bits: Int = 16
  ): Unit = {
    require(files > 0, "files must be positive")
    val keyed = withZorderKey(df, cols, bits, keyCol = "__zkey")
    materializePlain(
      keyed.repartitionByRange(files, col("__zkey"))
        .sortWithinPartitions(col("__zkey"))
        .drop("__zkey"),
      table)
  }

  /**
   * Generic fold for the maintained-table families: rewrite a managed
   * table in place, consolidating the per-append file generations that
   * `insertInto` ticks accumulate (BM25/phrase postings, MinHash bands,
   * LSH/IVF/PQ corpora, changelog ledgers). Content is untouched — reads
   * before and after are identical — but N-appends' worth of small files
   * become one generation, restoring scan efficiency and (for bucketed
   * tables) one file per bucket. The bucket/sort spec is read from the
   * catalog and preserved, so storage-partitioned join plans survive
   * compaction.
   *
   * Swap discipline: the folded copy stages into `{table}_compact_tmp`
   * (streamed executor-side — the table is never collected or
   * checkpointed, so the fold works at any table size), then DROP +
   * RENAME. A crash between the DROP and the RENAME is recovered on the
   * next call (the interrupted swap completes first), the same recovery
   * contract as the streaming rollup's swap.
   */
  def compactTable(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    require(!table.contains("."),
      s"compactTable takes an unqualified table name, got '$table'")
    val tmp = s"${table}_compact_tmp"
    // complete an interrupted swap from a prior crash before anything else
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(tmp))
      renameInto(spark, tmp, table)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val stats = priorStats(spark, table)
    val df = spark.table(table)
    meta.bucketSpec match {
      case Some(bs) =>
        // Route each whole bucket to one writer task so the fold leaves
        // exactly one file per bucket. NOT repartition(n, bucketCols):
        // the bucketed scan advertises hashpartitioning(bucketCols, n),
        // EnsureRequirements elides that shuffle as redundant, and then
        // DisableUnnecessaryBucketedScan (seeing no exchange above the
        // scan) degrades the read to plain file-packed splits — net
        // effect: NO shuffle, mixed buckets per task, tasks×buckets
        // files. Shuffling on pmod(hash(bucketCols), n) — the bucket id
        // itself — is a different expression, so the exchange survives;
        // each bucket id maps to one task and the bucketed write opens
        // one file per bucket id it receives.
        val bucketId = pmod(
          hash(bs.bucketColumnNames.map(col): _*), lit(bs.numBuckets))
        materializeBucketedBy(
          df.repartition(bs.numBuckets, bucketId),
          tmp, bs.bucketColumnNames, bs.numBuckets, bs.sortColumnNames)
      case None =>
        materializePlain(df, tmp)
    }
    markPendingStats(spark, tmp, stats)
    spark.sql(s"DROP TABLE `$table`")
    renameInto(spark, tmp, table)
  }

  /** The statistics footprint of `table` before a rewrite: Some(analyzed
    * column names) when the table carries catalog statistics (possibly
    * zero columns = table-level stats only), None when it has none or
    * does not exist. DROP + RENAME discards the analyzed table's stats,
    * so every swap/compact below re-collects what was there — otherwise
    * the CBO feed silently vanishes on the first maintenance event.
    * TimestampNTZ columns are excluded from the refresh list (the repo
    * never stores NTZ column stats — Spark 4.1 CBO join-reorder
    * MatchErrors on them; see [[TableStats.collectStats]]). */
  private def priorStats(
      spark: org.apache.spark.sql.SparkSession,
      table: String
  ): Option[Seq[String]] =
    if (!spark.catalog.tableExists(table)) None
    else {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      meta.stats.map { st =>
        val ntz = meta.schema.fields
          .filter(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
          .map(_.name).toSet
        st.colStats.keys.filterNot(ntz).toSeq.sorted
      }
    }

  /** Carry the pre-rewrite statistics footprint ON the staged copy as a
    * `graft.stats.pending` table property, so the refresh survives a
    * driver crash anywhere in the swap window: the property travels with
    * the RENAME, [[renameInto]] completes it after every rename
    * (including [[recoverSwap]]'s crash-recovery rename), and
    * [[recoverSwap]] also completes a refresh the crash interrupted
    * AFTER the rename. One ANALYZE scan, only for tables that opted into
    * stats to begin with (the maintenance-cadence doctrine from
    * [[TableStats]]). */
  private val statsPendingKey = "graft.stats.pending"

  /** The footprint is stored as a JSON string array — column names may
    * legally contain commas (or any character), so a comma-joined list
    * would corrupt the refresh into ANALYZEing nonexistent columns. */
  private def encodeStatsFootprint(cols: Seq[String]): String =
    cols.map(c =>
      "\"" + c.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")

  private def decodeStatsFootprint(spec: String): Seq[String] =
    if (spec.startsWith("[")) {
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(spec) match {
        case JArray(vs) => vs.collect { case JString(s) => s }
        case _          => Nil
      }
    } else // legacy comma-joined marker from a pre-upgrade crash window
      spec.split(",").toSeq.map(_.trim).filter(_.nonEmpty)

  private def markPendingStats(
      spark: org.apache.spark.sql.SparkSession,
      stagedTable: String,
      prior: Option[Seq[String]]
  ): Unit =
    prior.foreach { cols =>
      val json = encodeStatsFootprint(cols).replace("'", "''")
      spark.sql(s"ALTER TABLE `$stagedTable` SET TBLPROPERTIES " +
        s"('$statsPendingKey' = '$json')")
    }

  /** Complete a pending statistics refresh on `table` (no-op without the
    * marker property): ANALYZE the recorded footprint, then clear the
    * marker — in that order, so a crash mid-refresh retries next time.
    * The footprint is validated against the LIVE schema first: a rewrite
    * may have dropped, renamed, or retyped (to TimestampNTZ) a
    * previously-analyzed column, and ANALYZEing a stale name would throw
    * on every later [[recoverSwap]] — bricking the table until a manual
    * UNSET. Dropped columns degrade to table-level stats instead. */
  private def completePendingStats(
      spark: org.apache.spark.sql.SparkSession,
      table: String
  ): Unit = {
    val props = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).properties
    props.get(statsPendingKey).foreach { spec =>
      val live = spark.table(table).schema.fields
      val survivors = decodeStatsFootprint(spec).filter(c =>
        live.exists(f => f.name.equalsIgnoreCase(c) &&
          f.dataType != org.apache.spark.sql.types.TimestampNTZType))
      TableStats.collectStats(spark, table, survivors)
      spark.sql(s"ALTER TABLE `$table` UNSET TBLPROPERTIES ('$statsPendingKey')")
    }
  }

  /** RENAME `from` onto the (dropped) managed location of `to`, clearing
    * any stale warehouse directory first — rename moves the managed
    * location, which must not already exist. */
  private def renameInto(
      spark: org.apache.spark.sql.SparkSession,
      from: String,
      to: String
  ): Unit = {
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(wh, to.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    spark.sql(s"ALTER TABLE `$from` RENAME TO `$to`")
    completePendingStats(spark, to)
  }

  /**
   * Crash-safe in-place rewrite of a managed table from a frame DERIVED
   * FROM that same table (the maintained-table fold shape: skyline
   * frontiers, SCD2 generation folds, HLL register maxes, rank-sketch
   * folds, basket fact sums). [[materializePlain]] alone is NOT safe
   * here: DROP-then-save leaves a window where the only copy of the
   * accumulated state is the in-flight write — a driver crash loses the
   * table. This stages the new content into `{table}_swap_tmp` FIRST
   * (while the source table still exists, so the plan reads it
   * normally — no checkpoint needed), then DROP + RENAME. A crash
   * before the DROP leaves the old table (stale tmp is overwritten next
   * time); a crash between DROP and RENAME is completed by
   * [[recoverSwap]] on the next maintenance call — the same recovery
   * contract as [[compactTable]] and the streaming rollup swap.
   */
  def swapInPlain(df: DataFrame, table: String): Unit = {
    require(!table.contains("."),
      s"swapInPlain takes an unqualified table name, got '$table'")
    val spark = df.sparkSession
    val tmp = s"${table}_swap_tmp"
    val stats = priorStats(spark, table)
    materializePlain(df, tmp)
    markPendingStats(spark, tmp, stats)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    renameInto(spark, tmp, table)
  }

  /** Bucketed sibling of [[swapInPlain]] — same staged DROP + RENAME
    * discipline, same `_swap_tmp` naming (so [[recoverSwap]] completes an
    * interrupted swap of either kind), but the staged copy is written
    * `bucketBy` so storage-partitioned join plans survive the rewrite
    * (the cluster-index fold re-buckets on id). RENAME carries the
    * bucket spec with the table metadata. */
  def swapInBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil
  ): Unit = {
    require(!table.contains("."),
      s"swapInBucketed takes an unqualified table name, got '$table'")
    val spark = df.sparkSession
    val tmp = s"${table}_swap_tmp"
    val stats = priorStats(spark, table)
    materializeBucketedBy(df, tmp, bucketCols, numBuckets, sortCols)
    markPendingStats(spark, tmp, stats)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    renameInto(spark, tmp, table)
  }

  /** Complete an interrupted [[swapInPlain]] (crash between its DROP and
    * RENAME): call before reading a swap-maintained table. No-op when the
    * table is healthy. */
  def recoverSwap(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    val tmp = s"${table}_swap_tmp"
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(tmp))
      renameInto(spark, tmp, table) // completes the pending stats refresh too
    else if (spark.catalog.tableExists(table))
      completePendingStats(spark, table) // crash landed between rename + refresh
  }

  /** Unbucketed sibling of [[materializeBucketed]] — same drop + stale-
    * location cleanup — for the small side tables an index keeps beside its
    * bucketed corpus (cell statistics, root remaps). */
  def materializePlain(df: DataFrame, table: String): Unit = {
    require(!table.contains("."),
      s"materializePlain takes an unqualified table name, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").saveAsTable(table)
  }
}
