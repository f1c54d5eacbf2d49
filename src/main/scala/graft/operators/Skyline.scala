package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact 2-D skyline (pareto frontier) — the classic OLAP operator
 * (Börzsönyi, Kossmann & Stocker, ICDE 2001) Spark has no builtin for.
 * Both dimensions are MINIMIZED: a row survives iff no other row is ≤ in
 * both coordinates and strictly < in at least one (ties on BOTH
 * coordinates survive together — neither dominates).
 *
 * Spark-first shape, not block-nested-loops: only the per-x minimum of y
 * can be on the frontier, so the frontier test reduces to (1) one keyed
 * aggregate to the per-x minima — the only input-sized shuffle — and
 * (2) an EXCLUSIVE prefix-min of those minima in x order: a row is
 * dominated by a smaller x iff that prefix-min is ≤ its y. The distinct-x
 * frame the prefix runs over is bounded by the x cardinality, not the
 * input; grouped skylines window per group, and the ungrouped global
 * prefix uses the range-partition + per-partition-window + cumulative
 * offset spelling (the zipWithIndex shape — no single-partition window,
 * same discipline as Dedup.withGlobalRank).
 */
object Skyline {

  /**
   * Rows of `df` on the (xCol, yCol)-minimizing pareto frontier, with all
   * original columns, optionally per group. Null coordinates are treated
   * as incomparable and dropped.
   */
  def skyline2d(
      df: DataFrame,
      xCol: String,
      yCol: String,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val gcols = groupCols.map(col)
    // (1) only the min-y row(s) per x can survive: one keyed shuffle
    val perX = base
      .groupBy((gcols :+ col(xCol)): _*)
      .agg(min(col(yCol)).as("__gy"))
    // (2) exclusive prefix-min over x ascending — ≤ means dominated
    // (strictly smaller x, y no larger)
    val withPm =
      if (groupCols.nonEmpty) {
        val w = Window.partitionBy(gcols: _*).orderBy(col(xCol))
          .rowsBetween(Window.unboundedPreceding, -1)
        perX.withColumn("__pm", min(col("__gy")).over(w))
      } else prefixMinGlobal(perX, col(xCol), "__gy", "__pm")
    // fresh column names on the frontier side — it descends from `base`,
    // and Spark's ambiguous-self-join detection rejects shared lineage
    val frontier = withPm
      .filter(col("__pm").isNull || col("__pm") > col("__gy"))
      .select(
        (groupCols.zipWithIndex.map { case (g, i) => col(g).as(s"__sk_g$i") } :+
          col(xCol).as("__sk_x") :+ col("__gy").as("__sk_y")): _*)
    // join frontier keys back: keeps every tie on (x, min-y), drops the
    // same-x rows with larger y (dominated within their x)
    base.join(
      frontier,
      base(xCol) === frontier("__sk_x") &&
        base(yCol) === frontier("__sk_y") &&
        groupCols.zipWithIndex.map { case (g, i) => base(g) === frontier(s"__sk_g$i") }
          .foldLeft(lit(true))(_ && _),
      "leftsemi")
  }

  /** Materialize the frontier of `df` as managed table `table` — seed
    * state for [[appendToSkyline]]. */
  def materializeSkyline(
      df: DataFrame,
      xCol: String,
      yCol: String,
      table: String,
      groupCols: Seq[String] = Nil
  ): Unit =
    Bucketing.materializePlain(skyline2d(df, xCol, yCol, groupCols), table)

  /**
   * Fold an insert batch into a maintained frontier:
   * `skyline(A ∪ B) = skyline(skyline(A) ∪ B)` — a frontier point of the
   * union is undominated within A alone, so it already lives in the
   * stored frontier — which makes each tick O(frontier + batch), never a
   * rescan of history. GUARD-FREE crash safety: once a batch is
   * absorbed, re-folding it is the identity (`skyline(S ∪ B) = S`), so
   * replays need no batch ledger — the same idempotence class as the
   * HLL/Bloom appends. Rows must carry an identity column (any unique
   * key): the union dedupes by FULL ROW, so a replayed row (identical
   * including its id) collapses while genuine coordinate twins (distinct
   * ids, both legitimately on the frontier) survive. The frontier is
   * rewritten via the standing swap (staircase-sized, not data-sized).
   */
  def appendToSkyline(
      batch: DataFrame,
      xCol: String,
      yCol: String,
      table: String,
      groupCols: Seq[String] = Nil
  ): Unit = {
    val spark = batch.sparkSession
    val stored = spark.table(table)
    val merged = skyline2d(
      stored.unionByName(batch.select(stored.columns.map(col).toSeq: _*))
        .distinct(),
      xCol, yCol, groupCols)
      .localCheckpoint() // materialize BEFORE the swap drops the table it reads
    Bucketing.materializePlain(merged, table)
  }

  /** INCLUSIVE running maximum sibling of [[prefixMinGlobal]] — same
    * range-partition + per-partition-window + broadcast cross-partition
    * fold, with max and current-row-inclusive frames (null values pass
    * through `max`'s null-skipping, so gaps inherit the running value). */
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
   * Exclusive running minimum of `vCol` in `orderCol` order with NO
   * single-partition window: range-partition on the order key, window
   * within each partition, then fold in the exclusive cumulative minimum
   * of all preceding partitions (a bounded ≤P-row driver aggregate,
   * broadcast back). The ranged frame is localCheckpoint()ed because
   * range boundaries come from sampling — the per-partition-min job and
   * the window job must see the same row→partition assignment.
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
    // exclusive cumulative min of the per-partition minima: a ≤P-row
    // frame (P = shuffle partitions — bounded by CONFIG, not data), so
    // its one ordered window is a documented bounded shape; staying a
    // DataFrame keeps vCol's exact type (no driver round-trip through
    // double for long/decimal minima)
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
}
