package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{DatasetVocabulary, Op}

/**
 * Ingest merge strategies: how a newly-read batch of records is reconciled
 * against the data already in a dataset, producing RFC-015 changelog rows.
 *
 * Semantics mirror the reference's `MergeStrategy` implementations
 * (src/infra/ingest-datafusion/src/merge_strategies/{append,ledger,snapshot,
 * upsert_stream,changelog_stream}.rs) but the shapes are Spark-native:
 *
 *  - The CDC diff emits correction pairs (-C/+C) via a single-pass
 *    `array(...)` + `explode` instead of the reference's UNION ALL of two
 *    projections over the same join (a known double-execution wart,
 *    snapshot.rs:302-304). One shuffle, one pass, fully codegen'd.
 *  - Joins are plain equi-joins on the primary key, so Catalyst is free to
 *    pick broadcast vs sort-merge, and AQE handles skew at scale.
 *
 * Output schema of every strategy: `op` column first, then the data columns
 * (system columns are stamped later by the writer).
 */
sealed trait MergeStrategy {
  def vocab: DatasetVocabulary

  /** Reconcile `prev` (full prior ledger, if any) with the new batch. */
  def merge(prev: Option[DataFrame], incoming: DataFrame): DataFrame

  /**
   * Sort order used for offset assignment. Must be a TOTAL order over the
   * merged output: offsets are assigned by a distributed sort + zipWithIndex
   * (Writer.assignOffsets), and any tie would make offsets depend on
   * partitioning/task-retry order. The reference sidesteps this by pinning
   * `target_partitions = 1` (engine_config_embedded.rs:57); at scale we pin
   * the order instead.
   */
  def sortOrder(df: DataFrame): Seq[Column]
}

object MergeStrategy {

  /** Pass-through: every incoming record is an append (append.rs:31-53).
    * Sort order: event_time first (if present), then every remaining column —
    * a deterministic total order (up to full-row duplicates, which are
    * interchangeable) replacing the reference's "input order", which is not
    * stable under multi-partition reads. */
  final case class Append(vocab: DatasetVocabulary = DatasetVocabulary.Default)
      extends MergeStrategy {
    override def merge(prev: Option[DataFrame], incoming: DataFrame): DataFrame =
      withOpFirst(incoming.withColumn(vocab.operationTypeColumn, lit(Op.Append)), vocab)
    override def sortOrder(df: DataFrame): Seq[Column] = totalOrder(df, vocab)
  }

  /**
   * Ledger: append-only event log keyed by PK; drop incoming records whose key
   * was already seen in any prior slice (ledger.rs:37-80 — a LeftAnti join).
   */
  final case class Ledger(
      primaryKey: Seq[String],
      vocab: DatasetVocabulary = DatasetVocabulary.Default,
      // bloom pre-prune of the prior key set: only prior keys that MIGHT
      // collide with the incoming batch are carried into the anti join.
      // Kicks in when the prior key scan is too big to broadcast anyway AND
      // the history dwarfs the batch — pruning costs one extra pass over the
      // incoming side plus a per-prior-row filter probe, which only pays off
      // when it removes most of the prior keys (measured: 3x SLOWER at
      // incoming = prev/2, the criterion bench shape).
      bloomPrune: Boolean = true,
      bloomPruneMinPrevBytes: Long = 32L << 20,
      bloomPruneMinPrevToIncomingRatio: Double = 8.0
  ) extends MergeStrategy {
    require(primaryKey.nonEmpty, "ledger merge requires a primary key")

    override def merge(prev: Option[DataFrame], incoming: DataFrame): DataFrame = {
      val unseen = prev match {
        // Anti join probes the prior key set. The probe side reads ONLY the
        // key columns (column pruning reaches the scan); the shuffle_hash
        // hint keeps the plan a shuffled hash join — sort-merge would sort
        // BOTH sides, and for an anti join the sort buys nothing (the build
        // side is a hash set of keys). Catalyst still upgrades to broadcast
        // when the (pruned) prior key set is small enough.
        case Some(p) =>
          val pKeys = p.select(primaryKey.map(col): _*)
          incoming.join(pruneProbeSide(pKeys, incoming).hint("shuffle_hash"),
            primaryKey, "left_anti")
        case None =>
          // Validate PK columns exist even on the first batch.
          incoming.select(primaryKey.map(col): _*)
          incoming
      }
      withOpFirst(unseen.withColumn(vocab.operationTypeColumn, lit(Op.Append)), vocab)
    }

    /**
     * At scale the prior ledger dwarfs the incoming batch (100 TB history vs
     * one ingest round), and shuffling every prior key to anti-join a small
     * batch is the dominant cost. Build a bloom filter over the INCOMING key
     * hashes (one pass over the small side) and filter the prior key scan
     * with Spark's native `BloomFilterMightContain` BEFORE the exchange:
     * prior keys that cannot match any incoming key never shuffle. False
     * positives only admit extra candidates — the anti join on the real key
     * columns stays exact. Ledger keys are unique by construction, so the
     * surviving candidate set is bounded by the incoming key count (+fpp)
     * and AQE typically finishes with a broadcast anti join — the reference
     * shape ledger.rs:37-80 with the probe cost made proportional to the
     * batch, not the history.
     */
    private def pruneProbeSide(pKeys: DataFrame, incoming: DataFrame): DataFrame = {
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
      val prevBytes = pKeys.queryExecution.optimizedPlan.stats.sizeInBytes
      // Compare KEY projections on both sides — pKeys is already key-only,
      // and a wide incoming schema would otherwise inflate its bytes ~row
      // width / key width and suppress the prune in exactly the
      // history-dwarfs-batch shape it targets.
      val incKeyBytes = incoming.select(primaryKey.map(col): _*)
        .queryExecution.optimizedPlan.stats.sizeInBytes
      // Both gates are plan-stats driven: an absolute floor (below it the
      // anti join broadcasts anyway) and a relative one (pruning a history
      // comparable in size to the batch removes too little to repay the
      // bloom-build pass + per-row probe).
      if (!bloomPrune || prevBytes < BigInt(bloomPruneMinPrevBytes) ||
        BigDecimal(prevBytes) < BigDecimal(incKeyBytes) * bloomPruneMinPrevToIncomingRatio)
        return pKeys
      val keyHash = xxhash64(primaryKey.map(col): _*)
      // one codegen'd aggregate pass over the incoming batch builds the
      // filter (Spark's native BloomFilterAggregate — the same kernel the
      // runtime-filter optimization uses); item estimate from the key-only
      // plan stats (≈ rows for a bigint key), overshooting only costs bits
      val estItems = (incKeyBytes / 8).max(BigInt(1L << 20)).min(BigInt(1L << 27)).toLong
      val numBits = (estItems * 8).min(1L << 29)
      val bytes = incoming
        .select(columnOf(new BloomFilterAggregate(
          expressionOf(keyHash), Literal(estItems), Literal(numBits)
        ).toAggregateExpression()).as("bf"))
        .head()
        .getAs[Array[Byte]](0)
      if (bytes == null) return pKeys // empty incoming: nothing can match
      pKeys.where(columnOf(BloomFilterMightContain(
        Literal(bytes, org.apache.spark.sql.types.BinaryType),
        expressionOf(keyHash))))
    }

    override def sortOrder(df: DataFrame): Seq[Column] = {
      // Reference sorts by event_time alone (ledger.rs:78); we append the PK
      // as a tiebreaker so equal-timestamp rows get stable offsets.
      val et =
        if (df.columns.contains(vocab.eventTimeColumn)) Seq(col(vocab.eventTimeColumn).asc)
        else Nil
      et ++ primaryKey.map(col(_).asc)
    }
  }

  /**
   * Snapshot: the incoming batch is a full snapshot of current state; diff it
   * against the projected prior state and emit +A / -R / -C,+C changelog rows
   * (snapshot.rs:221-323). First batch short-circuits to all-appends
   * (snapshot.rs:332-356).
   *
   * The change predicate treats the event-time column specially: a null
   * event time in the new snapshot is not, by itself, a change
   * (snapshot.rs:129-138).
   */
  final case class Snapshot(
      primaryKey: Seq[String],
      compareColumns: Option[Seq[String]] = None,
      vocab: DatasetVocabulary = DatasetVocabulary.Default
  ) extends MergeStrategy {
    require(primaryKey.nonEmpty, "snapshot merge requires a primary key")

    override def merge(prev: Option[DataFrame], incoming: DataFrame): DataFrame =
      mergeState(prev.map(Changelog.project(_, primaryKey, vocab)), incoming)

    /** Merge against an ALREADY-PROJECTED prior state (all ledger columns) —
      * the O(state) path used when a state cache is available, instead of
      * reprojecting the O(history) ledger (IngestWriter.writeBatch). */
    def mergeState(priorState: Option[DataFrame], incoming: DataFrame): DataFrame =
      priorState match {
        case None =>
          withOpFirst(incoming.withColumn(vocab.operationTypeColumn, lit(Op.Append)), vocab)
        case Some(state) =>
          val dataCols = incoming.columns.toSeq
          val oldState = MergeStrategy.alignToIncoming(state, incoming, dataCols)
          CdcDiff.diff(
            old = oldState,
            incoming = incoming,
            primaryKey = primaryKey,
            compareColumns = compareColumns,
            vocab = vocab,
            incomingOps = false
          )
      }

    override def sortOrder(df: DataFrame): Seq[Column] =
      primaryKey.map(col(_).asc) :+ col(vocab.operationTypeColumn).asc
  }

  /**
   * Upsert stream: incoming rows are upserts (+A) or retractions (-R) keyed by
   * PK; reclassify them against the latest prior state into proper changelog
   * events, deduplicating intermediate in-batch updates per key
   * (upsert_stream.rs:350-444).
   */
  /**
   * @param arrivalOrderColumn column that defines in-batch arrival order
   *        (event_time, a kafka offset, an ingest sequence number, …).
   *        Required to make the "last update per key wins" dedupe
   *        deterministic — monotonically_increasing_id would depend on
   *        partitioning and lineage recomputation. Falls back to the
   *        vocabulary's event-time column when None.
   * @param dropArrivalColumn when the arrival column is transport-level
   *        bookkeeping (not part of the data), set true to consume it during
   *        dedupe and keep it out of the changelog output.
   */
  final case class UpsertStream(
      primaryKey: Seq[String],
      arrivalOrderColumn: Option[String] = None,
      dropArrivalColumn: Boolean = false,
      vocab: DatasetVocabulary = DatasetVocabulary.Default
  ) extends MergeStrategy {
    require(primaryKey.nonEmpty, "upsert merge requires a primary key")

    override def merge(prev: Option[DataFrame], incoming: DataFrame): DataFrame =
      mergeState(prev.map(Changelog.project(_, primaryKey, vocab)), incoming)

    /** Merge against an already-projected prior state — see
      * [[Snapshot.mergeState]]. */
    def mergeState(priorState: Option[DataFrame], incoming: DataFrame): DataFrame = {
      val opCol = vocab.operationTypeColumn
      require(
        incoming.columns.contains(opCol),
        s"upsert stream input must carry an '$opCol' column"
      )
      // In-batch dedupe: keep only the last row per key (regardless of op), by
      // arrival order (upsert_stream.rs:84-114).
      val arrivalName = arrivalOrderColumn.getOrElse {
        require(
          incoming.columns.contains(vocab.eventTimeColumn),
          "upsert stream needs an explicit arrivalOrderColumn (or an " +
            s"'${vocab.eventTimeColumn}' column) to disambiguate in-batch updates deterministically"
        )
        vocab.eventTimeColumn
      }
      require(
        incoming.columns.contains(arrivalName),
        s"arrival order column '$arrivalName' not found in the incoming batch"
      )
      val lastPerKey = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(primaryKey.map(col): _*).orderBy(col(arrivalName).desc)
        val deduped = incoming
          .withColumn("__rank", row_number().over(w))
          .filter(col("__rank") === 1)
          .drop("__rank")
        if (dropArrivalColumn) deduped.drop(arrivalName) else deduped
      }
      mergeDeduped(priorState, lastPerKey)
    }

    private def mergeDeduped(
        priorState: Option[DataFrame],
        lastPerKey: DataFrame
    ): DataFrame = {
      val opCol = vocab.operationTypeColumn
      val oldState = priorState.map { state =>
        val dataCols = lastPerKey.columns.filterNot(_ == opCol).toSeq
        MergeStrategy.alignToIncoming(state, lastPerKey, dataCols)
      }

      oldState match {
        case None =>
          // First batch: drop retractions of nothing; everything else appends.
          withOpFirst(
            lastPerKey.filter(col(opCol) =!= Op.Retract).withColumn(opCol, lit(Op.Append)),
            vocab
          )
        case Some(old) =>
          CdcDiff.diff(
            old = old,
            incoming = lastPerKey,
            primaryKey = primaryKey,
            compareColumns = None,
            vocab = vocab,
            incomingOps = true
          )
      }
    }

    override def sortOrder(df: DataFrame): Seq[Column] =
      primaryKey.map(col(_).asc) :+ col(vocab.operationTypeColumn).asc
  }

  /**
   * Changelog stream: the input is already in RFC-015 changelog form; validate
   * the op + PK columns exist and pass through (changelog_stream.rs:54-70).
   */
  final case class ChangelogStream(
      primaryKey: Seq[String],
      vocab: DatasetVocabulary = DatasetVocabulary.Default
  ) extends MergeStrategy {
    override def merge(prev: Option[DataFrame], incoming: DataFrame): DataFrame = {
      val required = vocab.operationTypeColumn +: primaryKey
      val missing = required.filterNot(incoming.columns.contains)
      require(missing.isEmpty, s"changelog stream input missing columns: ${missing.mkString(", ")}")
      withOpFirst(incoming, vocab)
    }
    override def sortOrder(df: DataFrame): Seq[Column] = {
      val et =
        if (df.columns.contains(vocab.eventTimeColumn)) Seq(col(vocab.eventTimeColumn).asc)
        else Nil
      et ++ primaryKey.map(col(_).asc) :+ col(vocab.operationTypeColumn).asc
    }
  }

  /** Project the prior state onto the incoming batch's data columns,
    * null-filling (with the incoming type) any column the state predates —
    * so an additive schema evolution flows through the CDC diff as
    * old-null-vs-new-value corrections instead of failing analysis. */
  private[operators] def alignToIncoming(
      state: DataFrame,
      incoming: DataFrame,
      dataCols: Seq[String]
  ): DataFrame = {
    val present = state.columns.toSet
    state.select(dataCols.map { c =>
      if (present.contains(c)) col(c)
      else lit(null).cast(incoming.schema(c).dataType).as(c)
    }: _*)
  }

  private[operators] def withOpFirst(df: DataFrame, vocab: DatasetVocabulary): DataFrame = {
    val op = vocab.operationTypeColumn
    val rest = df.columns.filterNot(_ == op)
    df.select((op +: rest.toSeq).map(col): _*)
  }

  /** event_time first if present, then every column in schema order — the
    * deterministic total order used when no primary key exists. */
  def totalOrder(df: DataFrame, vocab: DatasetVocabulary): Seq[Column] = {
    val et = vocab.eventTimeColumn
    val rest = df.columns.filterNot(_ == et).toSeq
    (if (df.columns.contains(et)) Seq(et) else Nil) ++ rest
  }.map(col(_).asc)
}

/**
 * Shared CDC diff between an old state and a new batch, emitting changelog
 * rows. Correction pairs are produced in one pass with array+explode rather
 * than a UNION ALL over a re-executed join.
 */
private[operators] object CdcDiff {

  /**
   * @param incomingOps when true the incoming batch carries an `op` column
   *                    restricted to +A / -R (upsert semantics: join is LEFT,
   *                    explicit retractions honored); when false the incoming
   *                    batch is a bare snapshot (join is FULL OUTER, deletions
   *                    inferred from absence).
   */
  def diff(
      old: DataFrame,
      incoming: DataFrame,
      primaryKey: Seq[String],
      compareColumns: Option[Seq[String]],
      vocab: DatasetVocabulary,
      incomingOps: Boolean
  ): DataFrame = {
    val opCol = vocab.operationTypeColumn
    val dataCols: Seq[String] = (if (incomingOps) incoming.columns.filterNot(_ == opCol)
                                 else incoming.columns).toSeq

    val o = old.alias("old")
    val n = incoming.alias("new")
    def oc(c: String): Column = col(s"old.$c")
    def nc(c: String): Column = col(s"new.$c")

    val joinCond = primaryKey.map(k => oc(k) === nc(k)).reduce(_ && _)
    val joined =
      if (incomingOps) n.join(o, joinCond, "left_outer")
      else o.join(n, joinCond, "full_outer")

    val cmpCols = compareColumns.getOrElse(dataCols.filterNot(primaryKey.contains))
    val changed = cmpCols
      .map { c =>
        val distinct = !(oc(c) <=> nc(c))
        // A null event time in `new` is not, by itself, a change.
        if (c == vocab.eventTimeColumn) nc(c).isNotNull && distinct else distinct
      }
      .reduceOption(_ || _)
      .getOrElse(lit(false))

    val oldExists = oc(primaryKey.head).isNotNull
    val newExists = nc(primaryKey.head).isNotNull

    val keep =
      if (incomingOps)
        (nc(opCol) === Op.Retract && oldExists) || (nc(opCol) =!= Op.Retract && changed)
      else changed

    def evt(op: Column, side: String => Column): Column =
      struct(op.as(opCol) +: dataCols.map(c => side(c).as(c)): _*)

    val retractEvt = evt(lit(Op.Retract), oc) // retraction carries old values
    val appendEvt = evt(lit(Op.Append), nc)
    val correctionPair = array(evt(lit(Op.CorrectFrom), oc), evt(lit(Op.CorrectTo), nc))

    val events =
      if (incomingOps)
        when(nc(opCol) === Op.Retract, array(retractEvt))
          .when(!oldExists, array(appendEvt))
          .otherwise(correctionPair)
      else
        when(!oldExists, array(appendEvt))
          .when(!newExists, array(retractEvt))
          .otherwise(correctionPair)

    joined
      .filter(keep)
      .select(explode(events).as("__evt"))
      .select((opCol +: dataCols).map(c => col(s"__evt.$c").as(c)): _*)
  }
}
