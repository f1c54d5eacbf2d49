package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dataset.Dataset
import graft.model.Op

/**
 * Incremental materialized rollup — OLAP materialized-view maintenance
 * over a dataset's changelog: a persistent aggregate table advanced
 * O(new slices + |rollup|) per refresh, never rescanning history. The
 * reference's derivative datasets give the same capability through a full
 * streaming engine run per (prev, new] elaboration
 * (src/infra/core/src/services/transform/transform_elaboration_service_impl.rs,
 * transform_executor_impl.rs); this is the direct operator form for the
 * dashboard-aggregate case (the dominant OLAP read pattern), using the
 * same offset-interval input slicing without the engine round-trip.
 *
 * Aggregates are MERGEABLE partials: an op-weighted row count plus one
 * op-weighted exact decimal sum per requested column. Weights make
 * retractions exact — `+A`/`+C` contribute +1·value, `-R`/`-C` contribute
 * −1·value — so after any upsert/correction stream the rollup equals the
 * same GROUP BY over the CURRENT STATE (the changelog-aware property the
 * reference documents even its containerized engines lack for streaming;
 * the weighted-partial construction sidesteps it entirely). Decimal sums
 * are order-free, so the maintained value is bit-equal to a fresh
 * recompute — which is exactly what the oracle checks.
 *
 * Scale shape per refresh: one FILE-PRUNED scan of the new slices only
 * (`Dataset.changesSince` — the transform-input pruning mechanism), one
 * aggregate whose shuffle carries dim-cardinality rows, and one merge
 * with the |rollup|-sized table. The corpus is never rescanned; |rollup|
 * is dimension-cardinality-sized — orders of magnitude below the data.
 * Groups whose weighted count returns to zero vanish from [[read]]
 * (fully-retracted keys leave no visible residue; their zero rows stay
 * in storage as offset carriers, bounded by ever-seen cardinality).
 */
object Rollup {

  private def weight(vocabOpCol: String) =
    when(col(vocabOpCol).isin(Op.Append, Op.CorrectTo), lit(1L)).otherwise(lit(-1L))

  private def sumCol(c: String) = s"sum_$c"

  /** The consumed high-water offset rides INSIDE the rollup table (a
    * constant `__last_offset` column — |rollup| rows, so the duplication
    * is dim-cardinality-sized), and the refresh lands through a staged
    * temp table + rename. A separate state table would reintroduce the
    * classic torn-write double-count: crash between "table updated" and
    * "offset updated" and the next refresh re-applies the same delta.
    * With the offset embedded, table and offset move in ONE swap — a
    * crashed refresh leaves either the old (offset, table) pair or the
    * new one, and a retry is a no-op or a clean redo. */
  private val OffsetCol = "__last_offset"

  /** Stored offset of the rollup, or None when uninitialized. */
  def lastOffset(spark: SparkSession, table: String): Option[Long] =
    if (!spark.catalog.tableExists(table)) None
    else spark.table(table).select(col(OffsetCol)).limit(1).collect()
      .headOption.map(_.getLong(0)).filter(_ >= 0L)

  /** Advance (or initialize) the rollup of `ds` grouped by `dims` with
    * count + exact decimal sums of `sumCols`. Reads only offsets past the
    * stored high-water mark; a no-op when the dataset has not moved.
    * With `cube = true` the table maintains EVERY grouping set of `dims`
    * (the full CUBE plus a `gid` grouping-id column) — weighted partials
    * merge per grouping set exactly like the plain path, so the
    * maintained cube equals a fresh CUBE over the current state.
    *
    * With `distinctCol = Some(c)` the table ALSO maintains per-cell HLL
    * registers of `c` ("distinct users per cell" — the other dashboard
    * column): register rows (dims, bucket, r) ride INSIDE the same table
    * (bucket/r null on aggregate rows, n_rows/sums null on register rows)
    * so they move through the SAME atomic swap as the offset — no second
    * table, no torn pair. Registers merge by max, which is idempotent as
    * well as associative, so the head-bounded delta composes for free and
    * [[readDistinct]] equals a fresh per-cell [[Sketches.hllStats]] over
    * everything ever appended. HLL cannot retract: the distinct column
    * counts EVER-OBSERVED values (retraction ops still max in, never
    * subtract) — right for append/ledger datasets, documented drift for
    * correction streams. */
  def refresh(
      ds: Dataset,
      table: String,
      dims: Seq[String],
      sumCols: Seq[String],
      cube: Boolean = false,
      distinctCol: Option[String] = None
  ): Unit = {
    require(dims.nonEmpty, "need at least one dimension")
    require(distinctCol.isEmpty || !cube,
      "distinct registers are supported on plain rollups (per-grouping-set " +
        "registers would multiply state 2^dims-fold; cube the stats reader instead)")
    val spark = ds.spark
    val vocab = ds.vocabulary
    val prev: Option[Long] = lastOffset(spark, table)
    val head = ds.chain.lastOffset()
    if (head == prev || head.isEmpty) return // nothing new
    val w = weight(vocab.operationTypeColumn)
    val aggs =
      sum(w).as("n_rows") +:
        sumCols.map(c =>
          sum(w * col(c).cast("decimal(18,6)")).cast("decimal(38,6)").as(sumCol(c)))
    val keyCols = (if (cube) Seq(col("gid")) else Nil) ++ dims.map(col)
    // upper-bound at the head observed above: rows a concurrent writer
    // appends before the lazy delta executes must NOT be aggregated under
    // this refresh's recorded offset, or the next refresh re-applies them
    val newRows = ds.changesSince(prev, upTo = head)
    val delta =
      if (cube)
        newRows.cube(dims.map(col): _*)
          .agg(grouping_id().as("gid"), aggs: _*)
      else
        newRows.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val merged =
      if (prev.isEmpty) delta
      else {
        val mAggs =
          sum(col("n_rows")).as("n_rows") +:
            sumCols.map(c => sum(col(sumCol(c))).cast("decimal(38,6)").as(sumCol(c)))
        val existing0 = spark.table(table).drop(OffsetCol)
        val existing =
          if (distinctCol.isDefined)
            existing0.filter(col("bucket").isNull).drop("bucket", "r")
          else existing0
        existing.unionByName(delta.select(existing.columns.map(col).toSeq: _*))
          .groupBy(keyCols: _*)
          .agg(mAggs.head, mAggs.tail: _*)
      }
    // per-cell HLL registers: delta sketch over the new slices, register-
    // wise max with the stored rows (max is idempotent — a redone refresh
    // after a crash merges to the same registers)
    val regMerged: Option[DataFrame] = distinctCol.map { c =>
      val d = Sketches.hllSketch(newRows, dims, c)
      if (prev.isEmpty) d
      else
        spark.table(table).filter(col("bucket").isNotNull)
          .select((dims.map(col) :+ col("bucket") :+ col("r")): _*)
          .unionByName(d)
          .groupBy((dims.map(col) :+ col("bucket")): _*)
          .agg(max(col("r")).as("r"))
    }
    // zero-count groups are RETAINED in storage (they, like every row,
    // carry the new offset; the set is bounded by ever-seen dim
    // cardinality) and filtered at read time. The swap stages to a temp
    // table and renames (the retrainIvfCorpus pattern): a crash leaves
    // either the old (table+offset) or the new one, never a torn pair —
    // and the localCheckpoint cuts lineage, since `merged` READS the
    // table it replaces.
    val aggOut = merged
      .select((dims.map(col) ++ (if (cube) Seq(col("gid")) else Nil) :+ col("n_rows")) ++
        sumCols.map(c => col(sumCol(c))) :+ lit(head.get).as(OffsetCol): _*)
    val out = (regMerged match {
      case None => aggOut
      case Some(regs) =>
        aggOut.unionByName(
          regs.select((dims.map(col) :+ col("bucket") :+ col("r") :+
            lit(head.get).as(OffsetCol)): _*),
          allowMissingColumns = true)
    }).localCheckpoint()
    val tmp = s"${table}_refresh_tmp"
    Bucketing.materializePlain(out, tmp)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a fresh in-memory catalog does not know about a table a PREVIOUS
    // session materialized, but its managed location persists — the
    // rename would fail with LOCATION_ALREADY_EXISTS (same cleanup
    // materializePlain performs before its own write)
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
  }

  /** The live rollup rows (zero-count offset-carrier rows hidden, the
    * embedded offset dropped, register rows excluded by the same n_rows
    * filter — theirs is null) with sums rendered as doubles (exact for
    * magnitudes below 2^53 micro-units; the stored form stays decimal). */
  def read(spark: SparkSession, table: String, sumCols: Seq[String]): DataFrame = {
    val t0 = spark.table(table).filter(col("n_rows") =!= 0L).drop(OffsetCol)
    val t = if (t0.columns.contains("bucket")) t0.drop("bucket", "r") else t0
    val keep = t.columns.filterNot(c => sumCols.map(sumCol).contains(c)).map(col).toSeq
    t.select(keep ++ sumCols.map(c => col(sumCol(c)).cast("double").as(sumCol(c))): _*)
  }

  /** Per-cell distinct-count estimates from a rollup maintained with
    * `distinctCol`: [[Sketches.hllStats]] over the table's register rows —
    * identical to a fresh per-cell sketch of everything ever appended
    * (register max-merge is lossless). */
  def readDistinct(spark: SparkSession, table: String, dims: Seq[String]): DataFrame =
    Sketches.hllStats(
      spark.table(table).filter(col("bucket").isNotNull)
        .select((dims.map(col) :+ col("bucket") :+ col("r")): _*),
      dims)
}
