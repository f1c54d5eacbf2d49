package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Range-partitioned global-order primitives — the cluster spellings of
 * the unpartitioned `Window.orderBy(...)` shapes (rank, prefix min/max,
 * prefix sums). All share one discipline: `repartitionByRange` on the
 * order key, a per-partition window, then a bounded ≤P-row cross-partition
 * fold (P = `spark.sql.shuffle.partitions` — bounded by CONFIG, not data)
 * broadcast back. The exact global result, but the sort runs on every
 * core and no task ever holds more than its range slice — no
 * single-partition Exchange anywhere in the plan (PlanSpec-pinned).
 *
 * The ranged frame is `localCheckpoint()`ed in every primitive because
 * range boundaries come from SAMPLING: the fold job and the window job
 * must see the same row→partition assignment.
 *
 * Grown out of `Dedup.withGlobalRank` / `Skyline.prefixMinGlobal` once
 * Analytics' model-eval family started importing them across modules.
 */
object Ranks {

  /**
   * Dense 1-based global rank over `sortCols` WITHOUT a single-partition
   * window — the cluster spelling of `row_number().over(Window.orderBy(…))`:
   * range-partition on the sort key, rank within each partition, then add
   * per-partition cumulative offsets (one bounded ≤P-row driver aggregate,
   * the zipWithIndex shape).
   *
   * CONTRACT: `sortCols` must be a TOTAL order over the frame (append a
   * unique id as the last key when the leading keys can tie) — with ties,
   * `row_number` breaks them by arbitrary in-partition order and the rank
   * assignment is nondeterministic across runs.
   */
  private[graft] def withGlobalRank(
      df: DataFrame,
      sortCols: Seq[Column],
      rankCol: String
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(p, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged
      .groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) => val o = (pid, acc); acc += n; o }
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    ranged
      .withColumn("__lrn",
        row_number().over(
          Window.partitionBy(col("__pid")).orderBy(sortCols: _*)).cast("long"))
      .join(offDf, Seq("__pid"))
      .withColumn(rankCol, col("__lrn") + col("__off"))
      .drop("__pid", "__lrn", "__off")
  }

  /**
   * Exclusive running minimum of `vCol` in `orderCol` order: per-partition
   * exclusive window plus the exclusive cumulative minimum of all
   * preceding partitions' minima (a ≤P-row frame whose one ordered window
   * is a documented bounded shape; staying a DataFrame keeps vCol's exact
   * type — no driver round-trip through double for long/decimal minima).
   */
  private[graft] def prefixMinGlobal(
      df: DataFrame,
      orderCol: Column,
      vCol: String,
      outCol: String
  ): DataFrame = {
    val spark = df.sparkSession
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(p, orderCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val wp = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offDf = broadcast(
      ranged.groupBy(col("__pid")).agg(min(col(vCol)).as("__m"))
        .withColumn("__pmin", min(col("__m")).over(wp))
        .drop("__m"))
    val w = Window.partitionBy(col("__pid")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("__lm", min(col(vCol)).over(w))
      .join(offDf, Seq("__pid"))
      // least() ignores nulls: null __lm (partition head) / null __pmin
      // (first partition) fall through; null+null = no predecessor
      .withColumn(outCol, least(col("__lm"), col("__pmin")))
      .drop("__pid", "__lm", "__pmin")
  }

  /** INCLUSIVE running maximum sibling of [[prefixMinGlobal]] (null
    * values pass through `max`'s null-skipping, so gaps inherit the
    * running value). */
  private[graft] def prefixMaxInclusiveGlobal(
      df: DataFrame,
      orderCol: Column,
      vCol: String,
      outCol: String
  ): DataFrame = {
    val spark = df.sparkSession
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(p, orderCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val wp = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offDf = broadcast(
      ranged.groupBy(col("__pid")).agg(max(col(vCol)).as("__m"))
        .withColumn("__pmax", max(col("__m")).over(wp))
        .drop("__m"))
    val w = Window.partitionBy(col("__pid")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("__lm", max(col(vCol)).over(w))
      .join(offDf, Seq("__pid"))
      .withColumn(outCol, greatest(col("__lm"), col("__pmax")))
      .drop("__pid", "__lm", "__pmax")
  }

  /**
   * INCLUSIVE running sums of several columns at once in `orderCol`
   * order — the cumulative-distribution workhorse (KS CDFs, score-stats
   * derivations): per-partition inclusive sum windows plus each
   * partition's exclusive cumulative predecessor totals, folded in by
   * addition. Null cells count as 0 (`sum` skips nulls; a partition of
   * all-null cells contributes 0, not null — `coalesce` on the fold).
   * One range shuffle regardless of how many columns ride along.
   *
   * CONTRACT: `orderCol` values must be DISTINCT (one row per value — the
   * grain every current caller aggregates to first). With duplicate
   * values the per-partition row-frame window splits tie rows in
   * arbitrary order, so each tie row's inclusive sum — and hence the
   * result — is nondeterministic across runs. Aggregate to `orderCol`
   * grain before calling.
   */
  private[graft] def prefixSumsInclusiveGlobal(
      df: DataFrame,
      orderCol: Column,
      vCols: Seq[String],
      outCols: Seq[String]
  ): DataFrame = {
    require(vCols.nonEmpty && vCols.size == outCols.size,
      "need one output column per input column")
    val spark = df.sparkSession
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(p, orderCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val wp = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val aggExprs = vCols.map(c => sum(col(c)).as(s"__t_$c"))
    val totals = ranged.groupBy(col("__pid"))
      .agg(aggExprs.head, aggExprs.tail: _*)
    val offDf = broadcast(
      vCols.foldLeft(totals) { (d, c) =>
        d.withColumn(s"__o_$c", coalesce(sum(col(s"__t_$c")).over(wp), lit(0L)))
      }.select(col("__pid") +: vCols.map(c => col(s"__o_$c")): _*))
    val w = Window.partitionBy(col("__pid")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val summed = vCols.zip(outCols).foldLeft(ranged) { case (d, (c, o)) =>
      d.withColumn(o, coalesce(sum(col(c)).over(w), lit(0L)))
    }
    vCols.zip(outCols).foldLeft(summed.join(offDf, Seq("__pid"))) {
      case (d, (c, o)) => d.withColumn(o, col(o) + col(s"__o_$c"))
    }.drop("__pid" +: vCols.map(c => s"__o_$c"): _*)
  }
}
