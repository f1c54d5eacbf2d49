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

  /** Project a changelog DataFrame to the current state of each entity. */
  def project(
      df: DataFrame,
      primaryKey: Seq[String],
      vocab: DatasetVocabulary = DatasetVocabulary.Default
  ): DataFrame = {
    require(primaryKey.nonEmpty, "changelog projection requires a primary key")
    val w = Window
      .partitionBy(primaryKey.map(col): _*)
      .orderBy(col(vocab.offsetColumn).desc)
    df.withColumn("__rank", row_number().over(w))
      .filter(
        col("__rank") === 1 &&
          col(vocab.operationTypeColumn) =!= Op.Retract &&
          col(vocab.operationTypeColumn) =!= Op.CorrectFrom
      )
      .drop("__rank")
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
