package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal (as-of) join: enrich each left row with the most recent right row
 * per key whose time is <= the left row's time — the reference's
 * `FOR SYSTEM_TIME AS OF` temporal-table join
 * (examples/currency_conversion/my.trading.transactions.cad.yaml:15-29,
 * TemporalTable DTO dtos_generated.rs:1485).
 *
 * Spark-first shape (SURVEY §7.4.5): turn the right side into validity
 * windows — valid_from = its own time, valid_to = the next time for the same
 * key (`lead` window) — then a key-equi join with the range predicate as a
 * join filter. Catalyst plans this as a hash/sort-merge join on the keys with
 * a residual filter, NOT a cartesian product; per-key timeline history rides
 * along one shuffle each side. DuckDB's native `ASOF JOIN` is the ready-made
 * oracle.
 */
object Temporal {

  /**
   * @param right must be unique per (keys, rightTime) — dedupe upstream
   *              (e.g. [[latestPerKeyTime]]) or the match is ambiguous.
   */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      joinType: String = "inner"
  ): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType), s"unsupported join type $joinType")
    val w = Window.partitionBy(keys.map(right(_)): _*).orderBy(right(rightTime).asc)
    val windowed = right
      .withColumn("__valid_to", lead(right(rightTime), 1).over(w))
    val cond = keys
      .map(k => left(k) === windowed(k))
      .reduce(_ && _) &&
      left(leftTime) >= windowed(rightTime) &&
      (windowed("__valid_to").isNull || left(leftTime) < windowed("__valid_to"))
    left
      .join(windowed, cond, joinType)
      .drop("__valid_to")
  }

  /**
   * Batch interval-overlap join — pairs of [start, end) intervals that
   * intersect (`max(starts) < min(ends)`, half-open), optionally under
   * equi-keys. Spark has no range-join strategy, and the naive spelling
   * (a lone inequality condition) plans as a broadcast-nested-loop — a
   * cartesian at scale. This is the standard BINNING rewrite instead:
   * each interval explodes to the `binWidth`-sized grid cells it covers,
   * candidates equi-join on (keys, cell) — a plain hash join — and a
   * residual filter keeps true overlaps. A pair sharing many cells is
   * emitted ONCE by construction: only in the canonical cell containing
   * `max(starts)` (the first cell both cover), so no distinct pass over
   * the matches is needed.
   *
   * `binWidth` trades fan-out for candidate precision: cells per row =
   * ⌈len/binWidth⌉ + 1, so pick it near the typical interval length — an
   * interval longer than `maxCellsPerRow` bins fails FAST (a mis-sized
   * binWidth would otherwise explode quietly into a row-amplification
   * storm). Times are plain longs (epoch millis/micros — caller's grid).
   * Both inputs' non-key columns survive under their own names, so they
   * must be DISJOINT across the two sides (checked up front — a silent
   * duplicate column name would fail only on the next select-by-name).
   */
  def overlapJoin(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      keys: Seq[String] = Nil,
      binWidth: Long = 1000L,
      maxCellsPerRow: Long = 4096L
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxCellsPerRow > 0, "maxCellsPerRow must be positive")
    val clash = (left.columns.toSet & right.columns.toSet) -- keys.toSet
    require(clash.isEmpty,
      s"overlapJoin: non-key columns must be disjoint across sides " +
        s"(both outputs keep their own names); rename these on one side " +
        s"first: ${clash.toSeq.sorted.mkString(", ")}")
    // the guard lives INSIDE the sequence's upper bound, not a dropped
    // side column (column pruning would silently eliminate it there)
    def binned(df: DataFrame, s: String, e: String) = {
      val lo = floor(col(s) / binWidth)
      val hi = floor((col(e) - 1) / binWidth)
      val msg = concat(
        lit(s"overlapJoin: an interval spans more than $maxCellsPerRow " +
          s"bins at binWidth=$binWidth (interval ["), col(s), lit(", "),
        col(e), lit(")) - raise binWidth or maxCellsPerRow"))
      val guardedHi = when(hi - lo + 1L > maxCellsPerRow,
        raise_error(msg).cast("long")).otherwise(hi)
      df.filter(col(s).isNotNull && col(e).isNotNull && col(s) < col(e))
        .withColumn("__cell", explode(sequence(lo, guardedHi)))
    }
    // SHUFFLE_HASH on both sides: the binning explode sits between the
    // scan and the join, and Generate has no cardinality model, so the
    // static planner systematically UNDERestimates the binned side and
    // picks a broadcast whose hash relation is fan-out times bigger than
    // estimated — a single-threaded build that dwarfs the distributed
    // join (measured 3.4 s broadcast vs 0.9 s shuffle-hash on 2M+2M
    // intervals). A caller with a provably tiny side can still pass
    // `broadcast(side)` — the broadcast hint outranks the shuffle hint
    // in join selection.
    val lb = binned(left, lStart, lEnd).hint("shuffle_hash")
    val rb = binned(right, rStart, rEnd)
      .withColumnRenamed("__cell", "__rcell")
      .hint("shuffle_hash")
    val cond = keys.map(k => lb(k) === rb(k))
      .foldLeft(lb("__cell") === rb("__rcell"))(_ && _) &&
      greatest(lb(lStart), rb(rStart)) < least(lb(lEnd), rb(rEnd)) &&
      // canonical-cell dedup: emit only where the overlap begins
      lb("__cell") === floor(greatest(lb(lStart), rb(rStart)) / binWidth)
    val joined = lb.join(rb, cond).drop(lb("__cell")).drop(rb("__rcell"))
    keys.foldLeft(joined)((d, k) => d.drop(rb(k)))
  }

  /** Dedupe a timeline to one row per (keys, time): highest `tiebreak` wins. */
  def latestPerKeyTime(
      df: DataFrame,
      keys: Seq[String],
      time: String,
      tiebreak: Column
  ): DataFrame = {
    val w = Window.partitionBy((keys :+ time).map(col): _*).orderBy(tiebreak.desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
