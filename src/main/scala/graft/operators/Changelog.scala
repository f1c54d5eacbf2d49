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
    * Implemented as a `max_by(struct(*), offset)` hash aggregate rather than
    * a `row_number` window: the window plan is exchange + full sort + window
    * over every ledger row, while the aggregate plan does a map-side partial
    * `max_by` first — the shuffle then carries at most one row per key per
    * input partition instead of the entire ledger, and no sort happens at
    * all. For a CDC ledger with many updates per key this is the difference
    * between shuffling the history and shuffling the state. Offsets are
    * unique by construction, so `max_by` is deterministic.
    */
  def project(
      df: DataFrame,
      primaryKey: Seq[String],
      vocab: DatasetVocabulary = DatasetVocabulary.Default
  ): DataFrame = {
    require(primaryKey.nonEmpty, "changelog projection requires a primary key")
    val cols = df.columns.toSeq
    df.groupBy(primaryKey.map(col): _*)
      .agg(max_by(struct(cols.map(col): _*), col(vocab.offsetColumn)).as("__r"))
      .select(col("__r.*"))
      .filter(
        col(vocab.operationTypeColumn) =!= Op.Retract &&
          col(vocab.operationTypeColumn) =!= Op.CorrectFrom
      )
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
