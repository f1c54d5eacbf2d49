package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{DatasetVocabulary, Op}

/**
 * Changelog (RFC-015 ledger) → current-state projection.
 *
 * Semantics mirror the reference's `project` operator
 * (src/odf/data-utils/src/data/changelog.rs:62-97): for each primary key keep
 * only the latest record by `offset`, and drop it if that record is a
 * retraction (`-R`) or the "from" half of a correction (`-C`).
 *
 * Spark-first shape: a single window aggregation
 * `row_number() over (partition by pk order by offset desc)`. At scale this is
 * one hash-partitioned shuffle on the PK — no driver materialization, skew
 * handled by AQE. The filter on `op` is applied after rank so the *latest*
 * record decides liveness (a retracted entity stays retracted even though older
 * +A rows exist).
 */
object Changelog {

  /** Project a changelog DataFrame to the current state of each entity.
    *
    * Implemented as one hash aggregate of per-column `max_by(c, offset)`
    * rather than a `row_number` window or a single `max_by(struct(*),
    * offset)`: the window plan is exchange + full sort + window over every
    * ledger row, and the struct-valued `max_by` carries a STRUCT aggregation
    * buffer — which Spark cannot hold in the primitive-only
    * `HashAggregateExec`, so the plan degrades to `ObjectHashAggregate`,
    * which falls back to sort-based aggregation after
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default
    * 128!) distinct keys — effectively a per-partition sort of the whole
    * ledger. Per-column `max_by` keeps every aggregation buffer slot
    * primitive, so the plan is a fully codegen'd vectorized hash aggregate
    * with real map-side partial aggregation: the shuffle carries at most one
    * row per key per input partition instead of the history. Measured 3.0 s
    * → sub-second on the 10M-row criterion shape. Offsets are unique by
    * construction, so every `max_by` picks the same (latest) row and the
    * projection is deterministic; null values in non-key columns survive
    * (max_by keeps the value at the extremum ordering, null or not).
    */
  def project(
      df: DataFrame,
      primaryKey: Seq[String],
      vocab: DatasetVocabulary = DatasetVocabulary.Default
  ): DataFrame = {
    require(primaryKey.nonEmpty, "changelog projection requires a primary key")
    val cols = df.columns.toSeq
    val others = cols.filterNot(primaryKey.contains)
    val aggs = others.map(c => max_by(col(c), col(vocab.offsetColumn)).as(c))
    df.groupBy(primaryKey.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(cols.map(col): _*) // restore original column order
      .filter(
        col(vocab.operationTypeColumn) =!= Op.Retract &&
          col(vocab.operationTypeColumn) =!= Op.CorrectFrom
      )
  }

  /**
   * Changelog → SCD type-2 dimension (Kimball's slowly-changing-dimension
   * pattern): every version-opening row (+A append, +C correction) becomes
   * a dimension row with a validity interval `[valid_from, valid_to)` in
   * EVENT time — `valid_from` is the row's own event time, `valid_to` the
   * event time of the next opening-or-retracting row for the same key
   * (null = still current). Retractions (-R) close the prior version's
   * interval without emitting a row; correction-from halves (-C) are
   * skipped entirely (they restate the version being replaced). The
   * projection of the OPEN rows equals [[project]]'s current state.
   *
   * Spark-first shape: one `lead(event_time)` window over pk-partitioned,
   * offset-ordered rows — a single hash shuffle on the key, no self-join
   * against history. Output keeps every non-system column plus
   * `valid_from`, `valid_to`, `is_current` (1/0).
   */
  def scd2(
      df: DataFrame,
      primaryKey: Seq[String],
      vocab: DatasetVocabulary = DatasetVocabulary.Default
  ): DataFrame = {
    require(primaryKey.nonEmpty, "scd2 requires a primary key")
    val w = Window
      .partitionBy(primaryKey.map(col): _*)
      .orderBy(col(vocab.offsetColumn))
    val keep = df.columns.toSeq.filterNot(Set(
      vocab.offsetColumn, vocab.operationTypeColumn,
      vocab.systemTimeColumn, vocab.eventTimeColumn).contains)
    df.filter(col(vocab.operationTypeColumn) =!= Op.CorrectFrom)
      .withColumn("valid_to", lead(col(vocab.eventTimeColumn), 1).over(w))
      .filter(col(vocab.operationTypeColumn) =!= Op.Retract)
      .select(keep.map(col) ++ Seq(
        col(vocab.eventTimeColumn).as("valid_from"),
        col("valid_to"),
        when(col("valid_to").isNull, lit(1L)).otherwise(lit(0L)).as("is_current")): _*)
  }

  /**
   * Point-in-time join: each fact row picks up the [[scd2]] dimension
   * version that was valid AT the fact's own timestamp — key-equi join
   * plus the interval residual `valid_from <= ts < valid_to` (left join:
   * facts dated before the first version or after a retraction keep null
   * dimension columns). Because versions partition time per key, every
   * fact matches at most one row, so the join never fans out.
   *
   * Scale shape: a hash equi-join on the key with the interval check as a
   * post-probe residual — never a nested loop; the dimension side is
   * versions-sized and usually broadcastable.
   */
  def pointInTimeJoin(
      facts: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      factTsCol: String
  ): DataFrame = {
    val renamed = keys.foldLeft(dim)((d, k) => d.withColumnRenamed(k, s"__dim_$k"))
    val keyEq = keys
      .map(k => facts(k) === renamed(s"__dim_$k"))
      .reduce(_ && _)
    val inWindow = renamed("valid_from") <= facts(factTsCol) &&
      (renamed("valid_to").isNull || facts(factTsCol) < renamed("valid_to"))
    facts
      .join(renamed, keyEq && inWindow, "left")
      .drop(keys.map(k => s"__dim_$k"): _*)
  }

  /**
   * `tail`: the last `n` records of a ledger by offset, returned in ascending
   * order (reference: query_service_impl.rs:446-497). The descending
   * sort+limit is a TakeOrderedAndProject physical op — no full sort at scale.
   */
  def tail(
      df: DataFrame,
      n: Int,
      vocab: DatasetVocabulary = DatasetVocabulary.Default
  ): DataFrame =
    df.orderBy(col(vocab.offsetColumn).desc)
      .limit(n)
      .orderBy(col(vocab.offsetColumn).asc)
}
