package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental maintenance of an equi-join view — the denormalized fact
 * table a real pipeline keeps instead of re-joining sources per query
 * (classic insert-only IVM: Blakeley, Larson & Tompa, SIGMOD 1986).
 *
 * For insert-only sources, the view delta for a batch (ΔA, ΔB) is
 * exactly `ΔA ⋈ (B ∪ ΔB)  ∪  A ⋈ ΔB` — O(Δ)-probe-sided joins, never a
 * re-join of history. Each tick lands in ONE `insertInto` with every row
 * stamped `__batch`, so idempotency needs no separate guard rows: a
 * replayed batch id is detected from the stamp and collapses to a no-op.
 * A crash before the insert commits nothing; after it, everything — the
 * same exactly-once contract as the basket/rollup fact tables.
 *
 * Scale shape: the two delta joins shuffle on the join keys only, and
 * the big-side probes (`B ∪ ΔB`, `A`) are the caller's frames — pass
 * bucketed tables and the joins run storage-partitioned; pass plain
 * frames and AQE broadcasts the (typically tiny) delta sides. Sources
 * must be insert-only for this delta formula; updates/deletes belong to
 * the changelog/SCD2 family.
 */
object JoinView {

  /** Materialize `a ⋈ b` (equi-join on `keys`, inner) as managed table
    * `table`, every row stamped with the founding batch id. */
  def materializeJoinView(
      a: DataFrame,
      b: DataFrame,
      keys: Seq[String],
      table: String,
      batchId: String = "init"
  ): Unit =
    Bucketing.materializePlain(
      a.join(b, keys).withColumn("__batch", lit(batchId)), table)

  /**
   * Fold one insert batch into the view: ONE idempotent commit of
   * `ΔA ⋈ (bPrev ∪ ΔB) ∪ aPrev ⋈ ΔB`, stamped `batchId`. `aPrev`/`bPrev`
   * are the sources' PRE-batch states (the caller's maintained tables);
   * a batch id already present in the view makes the call a no-op, so
   * crash/retry cannot double-append.
   */
  def appendToJoinView(
      table: String,
      aPrev: DataFrame,
      bPrev: DataFrame,
      deltaA: DataFrame,
      deltaB: DataFrame,
      keys: Seq[String],
      batchId: String
  ): Unit = {
    val spark = aPrev.sparkSession
    val replayed = !spark.table(table)
      .filter(col("__batch") === batchId)
      .isEmpty
    if (!replayed) {
      val delta = deltaA.join(bPrev.unionByName(deltaB), keys)
        .unionByName(aPrev.join(deltaB, keys))
        .withColumn("__batch", lit(batchId))
      delta
        .select(spark.table(table).columns.map(col).toSeq: _*)
        .write.insertInto(table)
    }
  }

  /** The view without its provenance stamp. */
  def readJoinView(spark: SparkSession, table: String): DataFrame =
    spark.table(table).drop("__batch")
}
