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
  ): DataFrame =
    scd2Versions(df, primaryKey, vocab).drop("__vid")

  /** [[scd2]] plus a `__vid` version-identity column (the opening row's
    * offset — unique even when two versions of a key share `valid_from`).
    * The identity is what lets the maintained table re-state a version
    * (close it) as an APPEND instead of an update. */
  private def scd2Versions(
      df: DataFrame,
      primaryKey: Seq[String],
      vocab: DatasetVocabulary
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
        when(col("valid_to").isNull, lit(1L)).otherwise(lit(0L)).as("is_current"),
        col(vocab.offsetColumn).as("__vid")): _*)
  }

  /**
   * Materialize an [[scd2]] dimension as a MAINTAINED table
   * `{table}_scd2`: the single-commit append-only fact-table doctrine
   * (the basket/sketch/postings pattern) applied to version intervals.
   * Each stored row is one GENERATION of one version, identified by
   * `(primaryKey…, __vid)` — closing a version later re-inserts the same
   * identity with `valid_to` set and a higher `__gen`, so maintenance
   * never updates in place and [[appendToScd2]] is ONE atomic
   * `insertInto`. [[readScd2Table]] folds generations back to the
   * dimension; [[compactScd2]] rewrites the folded form when many
   * generations have accumulated.
   */
  def materializeScd2(
      df: DataFrame,
      primaryKey: Seq[String],
      table: String,
      batchId: Long = 0L,
      vocab: DatasetVocabulary = DatasetVocabulary.Default
  ): Unit =
    Bucketing.materializePlain(
      scd2Versions(df, primaryKey, vocab).withColumn("__gen", lit(batchId)),
      s"${table}_scd2")

  /** Fold the `{table}_scd2` generations to the dimension [[scd2]] would
    * build from scratch: per version identity, every column takes its
    * latest-generation value (`max_by(c, __gen)` — primitive aggregation
    * buffers, one hash shuffle on the identity). */
  def readScd2Table(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      primaryKey: Seq[String]
  ): DataFrame =
    foldScd2(spark.table(s"${table}_scd2"), primaryKey).drop("__vid", "__gen")

  /** Latest generation of every version in a raw `{table}_scd2` frame;
    * keeps `__vid`, drops nothing else. */
  private def foldScd2(stored: DataFrame, primaryKey: Seq[String]): DataFrame = {
    val grp = primaryKey :+ "__vid"
    val others = stored.columns.toSeq.filterNot(c => grp.contains(c) || c == "__gen")
    val aggs = others.map(c => max_by(col(c), col("__gen")).as(c)) :+
      max(col("__gen")).as("__gen")
    stored.groupBy(grp.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(stored.columns.map(col).toSeq: _*) // restore stored column order
  }

  /**
   * Fold a new changelog batch into a [[materializeScd2]] table with ONE
   * idempotent commit, O(batch) compute: only the batch's keys are
   * touched — their open versions are pulled (a key-semi-joined,
   * column-slim scan of the fact table), re-stated as a pseudo-ledger
   * (`+A` at the version's own opening offset, which per-key precedes
   * every batch offset), and re-run through the [[scd2]] window together
   * with the batch rows. The resulting delta — closed re-statements of
   * previously-open versions plus the batch's new versions — lands in a
   * single `insertInto` stamped `__gen = batchId`.
   *
   * Exactly-once: the tick is guarded by the stored high-water `__gen`
   * (`batchId <= max(__gen)` is a no-op), and because the whole delta is
   * one commit, a crash either landed the entire batch (retry no-ops via
   * the guard) or none of it (retry is the first real ingest) — the same
   * two-regime contract as the basket fact table. Batches must carry each
   * key's changelog rows in per-key ascending offsets later than any
   * already-ingested offsets for that key (any real ledger slice does) —
   * ASSERTED per tick with one O(batch) count, because a violation would
   * otherwise corrupt validity intervals silently.
   */
  def appendToScd2(
      batch: DataFrame,
      primaryKey: Seq[String],
      table: String,
      batchId: Long,
      vocab: DatasetVocabulary = DatasetVocabulary.Default
  ): Unit = {
    val spark = batch.sparkSession
    val tname = s"${table}_scd2"
    Bucketing.recoverSwap(spark, tname) // complete an interrupted compactScd2
    val stored = spark.table(tname)
    val hwm = stored.agg(max(col("__gen"))).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
      .getOrElse(-1L)
    if (batchId <= hwm) return // replayed tick: already committed
    val keys = batch.select(primaryKey.map(col): _*).distinct()
    // ONE key-semi-joined scan of the fact table feeds both the contract
    // check and the pseudo-ledger (checkpointed — the table is rewritten
    // by compaction between ticks, and three derivations read the slice).
    val slice = stored.join(keys, primaryKey, "left_semi").localCheckpoint()
    val open = foldScd2(slice, primaryKey)
      .filter(col("is_current") === 1L)
    // Ordering contract (cheap, O(batch)): per key, every batch row must
    // carry (a) an offset above max(__vid) over ALL stored versions —
    // not just the open one: a stale row for a fully-closed key has no
    // open version to sort against — and (b) an event time at or after
    // the key's stored validity high-water (max of coalesce(valid_to,
    // valid_from) across generations: the open version's valid_from, or
    // a closed/retracted version's valid_to). Without (b), a late row
    // for a retracted key at a fresh offset would open a version whose
    // valid_from predates the closed version's valid_to — overlapping
    // intervals, silently.
    val hw = slice
      .groupBy(primaryKey.map(col): _*)
      .agg(max(col("__vid")).as("__maxvid"),
        max(coalesce(col("valid_to"), col("valid_from"))).as("__maxvt"))
    val violations = batch
      .join(hw, primaryKey)
      .filter(col(vocab.offsetColumn) <= col("__maxvid") ||
        col(vocab.eventTimeColumn) < col("__maxvt"))
      .count()
    require(violations == 0L,
      s"appendToScd2($table, batch $batchId): $violations batch row(s) carry " +
        s"an offset <= their key's stored high-water version offset " +
        s"(max __vid over ALL versions) or an event time before the key's " +
        s"stored validity high-water — batches must bring each key's " +
        s"changelog rows strictly after anything already ingested for " +
        s"that key, in both offset and event time")
    val keep = stored.columns.toSeq
      .filterNot(Set("valid_from", "valid_to", "is_current", "__vid", "__gen").contains)
    val pseudo = open.select(keep.map(col) ++ Seq(
      col("__vid").as(vocab.offsetColumn),
      lit(Op.Append).as(vocab.operationTypeColumn),
      col("valid_from").as(vocab.eventTimeColumn)): _*)
    val mini = pseudo.unionByName(batch.select(pseudo.columns.map(col).toSeq: _*))
    scd2Versions(mini, primaryKey, vocab)
      .withColumn("__gen", lit(batchId))
      .select(stored.columns.map(col).toSeq: _*)
      .write.insertInto(tname)
  }

  /** Rewrite `{table}_scd2` with generations folded — read-side
    * maintenance after many appends; [[readScd2Table]] is identical
    * before and after. Rides the staged [[Bucketing.swapInPlain]]: a
    * crash at any point leaves either the old or the folded table.
    * Single-writer contract (shared with [[appendToScd2]]'s `max(__gen)`
    * guard): maintenance calls must not interleave — the append reads
    * the table the compactor swaps, so run compaction from the same
    * serialized maintenance loop as the ticks, never concurrently. */
  def compactScd2(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      primaryKey: Seq[String]
  ): Unit = {
    Bucketing.recoverSwap(spark, s"${table}_scd2")
    Bucketing.swapInPlain(
      foldScd2(spark.table(s"${table}_scd2"), primaryKey),
      s"${table}_scd2")
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
