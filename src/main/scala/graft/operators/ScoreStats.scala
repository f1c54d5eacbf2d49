package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Maintained score-distribution statistics — the incremental substrate
 * for the model-evaluation family (decile lift, ROC AUC, KS separation,
 * TVD drift). A real pipeline scores continuously; recomputing each
 * metric from raw events scans history every time. All four metrics
 * consume ONE shape — per-score class counts `(__s, n, pos)` — so that
 * shape is maintained as a single-commit append-only fact table (the
 * daily-rollup doctrine): each batch of NEWLY-scored entities appends
 * its score-grain delta stamped `__gen = batchId`, the `max(__gen)`
 * guard makes replays no-ops, and reads fold generations with one sum.
 *
 * Deriving the metrics from score-grain counts also LIFTS the AUC's
 * documented 2n²·10⁶ < 2^63 integer bound from entity count to SCORE
 * CARDINALITY — the rank arithmetic runs on distinct scores, not rows.
 *
 * Contract: batches must partition the ENTITY set (an entity scored in
 * two batches would double-count — rescoring is a rebuild, not an
 * append), and per-score counts are additive across batches by
 * construction.
 */
object ScoreStats {

  /** Score-grain class counts of a scored frame: one row per distinct
    * score with `n` entities and `pos` positives. */
  def fromScored(
      scored: DataFrame,
      scoreCol: Column,
      labelCol: Column
  ): DataFrame =
    scored
      .select(scoreCol.cast("long").as("__s"), labelCol.cast("long").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isin(0L, 1L))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))

  /** Seed the maintained table from the first batch. */
  def materialize(
      scored: DataFrame,
      scoreCol: Column,
      labelCol: Column,
      table: String,
      batchId: Long = 0L
  ): Unit =
    Bucketing.materializePlain(
      fromScored(scored, scoreCol, labelCol).withColumn("__gen", lit(batchId)),
      table)

  /** Fold a batch of newly-scored entities in: ONE idempotent
    * score-grain `insertInto` guarded by the stored high-water `__gen`
    * (replayed ticks no-op) — the same two-regime crash contract as the
    * basket fact table. */
  def append(
      batch: DataFrame,
      scoreCol: Column,
      labelCol: Column,
      table: String,
      batchId: Long
  ): Unit = {
    val spark = batch.sparkSession
    Bucketing.recoverSwap(spark, table) // complete an interrupted compact
    val stored = spark.table(table)
    val hwm = stored.agg(max(col("__gen"))).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
      .getOrElse(-1L)
    if (batchId <= hwm) return
    fromScored(batch, scoreCol, labelCol)
      .withColumn("__gen", lit(batchId))
      .select(stored.columns.map(col).toSeq: _*)
      .write.insertInto(table)
  }

  /** One foreachBatch tick of STREAMING score-stats maintenance: first
    * epoch seeds the table, later epochs ride [[append]]'s `__gen`
    * guard — counts are additive (NOT idempotent), so the guard is what
    * makes crash-replayed epochs no-ops, the same two-regime contract
    * as the upsert/rollup streams. */
  def applyScoreStatsBatch(
      table: String,
      scoreCol: Column,
      labelCol: Column
  )(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (!spark.catalog.tableExists(table))
      materialize(batch, scoreCol, labelCol, table, batchId)
    else append(batch, scoreCol, labelCol, table, batchId)
  }

  /** Streaming maintenance: `scored-entity stream → foreachBatch →
    * score-grain generations`; read with [[read]], metrics ride the
    * `*FromStats` derivations. Micro-batches must partition the entity
    * set (each entity scored exactly once across the stream). */
  def scoreStatsStream(
      stream: DataFrame,
      table: String,
      scoreCol: Column,
      labelCol: Column
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch(applyScoreStatsBatch(table, scoreCol, labelCol) _)

  /** The folded `(__s, n, pos)` stats — generations summed per score. */
  def read(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame = {
    Bucketing.recoverSwap(spark, table) // complete an interrupted compact
    spark.table(table)
      .groupBy(col("__s"))
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))
  }

  /** Rewrite the maintained table with generations folded — one row per
    * score, stamped with the stored high-water `__gen` so the append
    * guard survives compaction; [[read]] is identical before and after.
    * Read-side maintenance after many ticks (each append adds one
    * score-grain delta forever). Rides the staged [[Bucketing.swapInPlain]]
    * (crash leaves the old or the folded table; [[read]]/[[append]] call
    * `recoverSwap` first). Same single-writer contract as every other
    * maintained-table compactor: never run concurrently with ticks. */
  def compactScoreStats(
      spark: org.apache.spark.sql.SparkSession,
      table: String
  ): Unit = {
    Bucketing.recoverSwap(spark, table)
    val t = spark.table(table)
    val hwm = broadcast(t.agg(max(col("__gen")).as("__gen"))) // global HWM
    val folded = t
      .groupBy(col("__s"))
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))
      .crossJoin(hwm)
      .select(t.columns.map(col).toSeq: _*)
    Bucketing.swapInPlain(folded, table)
  }

  /** Normalize any stats-shaped frame to strict score grain with long
    * counts — the defensive head of every `*FromStats` derivation. The
    * derivations' rank/CDF arithmetic is only valid with ONE row per
    * score; a caller passing per-generation rows (`spark.table(t)`
    * instead of [[read]]) would otherwise get silently wrong midranks.
    * On already-score-grain input this is one cheap hash aggregate. */
  private def normalized(stats: DataFrame): DataFrame =
    stats
      .groupBy(col("__s"))
      .agg(sum(col("n").cast("long")).as("n"),
        sum(col("pos").cast("long")).as("pos"))

  // ------------------------------------------------------------- keyed

  /** (key, score)-grain class counts — the grouped sibling of
    * [[fromScored]]: one row per (key, distinct score) with `n` entities
    * and `pos` positives. The key is a model-eval slice axis (day,
    * segment, cohort). */
  def fromScoredKeyed(
      scored: DataFrame,
      keyCol: Column,
      scoreCol: Column,
      labelCol: Column
  ): DataFrame =
    scored
      .select(keyCol.as("__k"), scoreCol.cast("long").as("__s"),
        labelCol.cast("long").as("__y"))
      .filter(col("__k").isNotNull && col("__s").isNotNull &&
        col("__y").isin(0L, 1L))
      .groupBy(col("__k"), col("__s"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))

  /** Seed the KEYED maintained table from the first batch — same
    * append-only generation layout as [[materialize]] with a `__k` slice
    * column, so the grouped eval metrics (per-day AUC/KS) read
    * incrementally instead of rescanning raw scored events. */
  def materializeKeyed(
      scored: DataFrame,
      keyCol: Column,
      scoreCol: Column,
      labelCol: Column,
      table: String,
      batchId: Long = 0L
  ): Unit =
    Bucketing.materializePlain(
      fromScoredKeyed(scored, keyCol, scoreCol, labelCol)
        .withColumn("__gen", lit(batchId)),
      table)

  /** Keyed sibling of [[append]]: ONE idempotent (key, score)-grain
    * `insertInto` guarded by the stored high-water `__gen`. Batches must
    * partition the (key, entity) set — an entity may appear under several
    * keys (it is scored once per day), but each (key, entity) pair must
    * land in exactly one batch. */
  def appendKeyed(
      batch: DataFrame,
      keyCol: Column,
      scoreCol: Column,
      labelCol: Column,
      table: String,
      batchId: Long
  ): Unit = {
    val spark = batch.sparkSession
    Bucketing.recoverSwap(spark, table) // complete an interrupted compact
    val stored = spark.table(table)
    val hwm = stored.agg(max(col("__gen"))).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
      .getOrElse(-1L)
    if (batchId <= hwm) return
    fromScoredKeyed(batch, keyCol, scoreCol, labelCol)
      .withColumn("__gen", lit(batchId))
      .select(stored.columns.map(col).toSeq: _*)
      .write.insertInto(table)
  }

  /** The folded `(__k, __s, n, pos)` keyed stats — generations summed
    * per (key, score). */
  def readKeyed(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame = {
    Bucketing.recoverSwap(spark, table)
    spark.table(table)
      .groupBy(col("__k"), col("__s"))
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))
  }

  /** Keyed sibling of [[compactScoreStats]]: fold generations to one
    * (key, score) row each, HWM `__gen` preserved, staged swap. */
  def compactScoreStatsKeyed(
      spark: org.apache.spark.sql.SparkSession,
      table: String
  ): Unit = {
    Bucketing.recoverSwap(spark, table)
    val t = spark.table(table)
    val hwm = broadcast(t.agg(max(col("__gen")).as("__gen")))
    val folded = t
      .groupBy(col("__k"), col("__s"))
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))
      .crossJoin(hwm)
      .select(t.columns.map(col).toSeq: _*)
    Bucketing.swapInPlain(folded, table)
  }

  /** One foreachBatch tick of KEYED streaming score-stats maintenance —
    * the keyed twin of [[applyScoreStatsBatch]]: first epoch seeds,
    * later epochs ride the `__gen` guard (counts are additive, so the
    * guard is what makes crash-replayed epochs no-ops). */
  def applyScoreStatsKeyedBatch(
      table: String,
      keyCol: Column,
      scoreCol: Column,
      labelCol: Column
  )(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (!spark.catalog.tableExists(table))
      materializeKeyed(batch, keyCol, scoreCol, labelCol, table, batchId)
    else appendKeyed(batch, keyCol, scoreCol, labelCol, table, batchId)
  }

  /** Streaming maintenance of the KEYED stats table: `scored-entity
    * stream → foreachBatch → (key, score)-grain generations`; read with
    * [[readKeyed]], grouped metrics ride the `*ByKeyFromStats`
    * derivations. Micro-batches must partition the (key, entity) set. */
  def scoreStatsKeyedStream(
      stream: DataFrame,
      table: String,
      keyCol: Column,
      scoreCol: Column,
      labelCol: Column
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch(applyScoreStatsKeyedBatch(table, keyCol, scoreCol, labelCol) _)

  /** Keyed defensive normalization — (key, score) grain, long counts. */
  private def normalizedKeyed(stats: DataFrame): DataFrame =
    stats
      .groupBy(col("__k"), col("__s"))
      .agg(sum(col("n").cast("long")).as("n"),
        sum(col("pos").cast("long")).as("pos"))

  /**
   * GROUPED exact ROC AUC from keyed score-grain stats — value-identical
   * per key to [[graft.operators.Analytics.aucScoreByKey]] on the
   * underlying entities (midranks are invariant to intra-tie order, so
   * the stats-side 2·cum − n + 1 spelling reproduces minr + maxr
   * exactly). One-class keys are absent.
   *
   * Scale shape: the cumulative window PARTITIONS BY KEY (keys spread
   * the shuffle — no global sort, none of [[Ranks]]' machinery needed),
   * then one keyed aggregate on (key, score)-cardinality rows. The
   * 2·n_k²·10⁶ < 2^63 integer bound applies per key to that key's
   * ENTITY count (the cumulative counts are entity counts, same as
   * [[graft.operators.Analytics.aucScoreByKey]]) — n_k under ~2.1
   * billion entities per key.
   */
  def aucByKeyFromStats(stats: DataFrame, keyCol: String): DataFrame = {
    val s = normalizedKeyed(stats)
    val w = Window.partitionBy(col("__k")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.withColumn("__cn", sum(col("n")).over(w))
      .groupBy(col("__k"))
      .agg(
        sum(col("pos") * (col("__cn") * 2L - col("n") + 1L)).as("__s2"),
        sum(col("pos")).as("n_pos"),
        sum(col("n") - col("pos")).as("n_neg"))
      .filter(col("n_pos") > 0L && col("n_neg") > 0L)
      .select(col("__k").as(keyCol), col("n_pos"), col("n_neg"),
        expr("((__s2 - n_pos * (n_pos + 1L)) * 1000000L) DIV (2L * n_pos * n_neg)")
          .as("auc_micro"))
  }

  /**
   * GROUPED decile lift (gains chart per key) from keyed score-grain
   * stats — [[decileLiftFromStats]] within each key: deciles split that
   * key's own entity count, the intra-score tie rule is POSITIVES-FIRST
   * (stats-derivable), straddling score groups contribute
   * min(pos, room) positives to the earlier decile, and the lift
   * arithmetic is the same integer spelling. Zero-positive keys are
   * absent (lift undefined).
   *
   * Scale shape: one per-key cumulative window on (key, score)-grain
   * rows, a broadcast 10-row decile frame (×10 fan-out on score-grain
   * rows, nothing entity-sized), one keyed aggregate.
   */
  def decileLiftByKeyFromStats(stats: DataFrame, keyCol: String): DataFrame = {
    val spark = stats.sparkSession
    val s = normalizedKeyed(stats)
    val w = Window.partitionBy(col("__k")).orderBy(-col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("__k"))
    val deciles = broadcast(spark.range(1, 11).select(col("id").as("decile")))
    s.withColumn("__cn", sum(col("n")).over(w))
      .withColumn("__n", sum(col("n")).over(tot))
      .withColumn("__pos", sum(col("pos")).over(tot))
      .filter(col("__pos") > 0L)
      .crossJoin(deciles)
      .withColumn("__lo", expr("((decile - 1L) * __n + 9L) DIV 10L + 1L"))
      .withColumn("__hi", expr("(decile * __n + 9L) DIV 10L"))
      .withColumn("__ge", col("__cn") - col("n") + 1L)
      .withColumn("__ne",
        greatest(lit(0L),
          least(col("__cn"), col("__hi")) - greatest(col("__ge"), col("__lo")) + 1L))
      .withColumn("__np",
        greatest(lit(0L),
          least(col("__ge") + col("pos") - 1L, col("__hi")) -
            greatest(col("__ge"), col("__lo")) + 1L))
      .groupBy(col("__k"), col("decile"))
      .agg(sum(col("__ne")).as("n_entities"), sum(col("__np")).as("n_positive"),
        first(col("__n")).as("__n"), first(col("__pos")).as("__p"))
      .filter(col("n_entities") > 0L)
      .withColumn("lift_micro",
        expr("(n_positive * __n * 1000000L) DIV (n_entities * __p)"))
      .select(col("__k").as(keyCol), col("decile"), col("n_entities"),
        col("n_positive"), col("lift_micro"))
  }

  /**
   * Per-key score-drift TREND from keyed score-grain stats: for every
   * key (day) with a predecessor on the key axis, both days' score
   * masses binned by the PREDECESSOR's exact decile value cutoffs, with
   * the integer TVD gap per bin — "did today's score mix move vs
   * yesterday", the continuous-monitoring read the one-shot
   * [[tvdFromStats]] answers for a single pair. Value-identical per
   * pair to `tvdFromStats(stats of k−1, stats of k)` (spec-pinned),
   * plus the zero-floored PSI term per bin (the [[psiFromStats]]
   * spelling — one fixed double tree floored to micros). Output:
   * `(key, bin, n_ref, n_cur, gap_micro, psi_micro)`; the first key on
   * the axis has no predecessor and is absent.
   *
   * Scale shape: per-key cumulative windows on (key, score)-grain rows,
   * cuts are ≤9 rows per key (broadcast), binning joins are
   * score-grain × ≤9. The adjacent-pair map rides the DISTINCT key
   * axis: counted, and a small axis (a calendar of days, a segment
   * list — ≤max(4096, 64·P)) takes one plain lag window while a large
   * one routes through the range-partitioned [[Ranks.withGlobalRank]]
   * and a rank self-join — the same adaptive discipline as the skyline
   * prefix (no data-sized single-partition stage either way).
   */
  def driftByAdjacentKeyFromStats(stats: DataFrame, keyCol: String): DataFrame = {
    val s = normalizedKeyed(stats).drop("pos").localCheckpoint()
    val cum = Window.partitionBy(col("__k")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("__k"))
    // per-key reference-decile cuts (≤9 distinct values per key): each
    // score group covers deciles __dlo..__dhi of its key's population
    val cuts = broadcast(
      s.withColumn("__cn", sum(col("n")).over(cum))
        .withColumn("__nk", sum(col("n")).over(tot))
        .withColumn("__dlo", expr("((__cn - n) * 10L) DIV __nk + 1L"))
        .withColumn("__dhi", expr("((__cn - 1L) * 10L) DIV __nk + 1L"))
        .withColumn("__d", explode(sequence(col("__dlo"), col("__dhi"))))
        .filter(col("__d") <= 9L)
        .groupBy(col("__k"), col("__d")).agg(max(col("__s")).as("__cut"))
        .select(col("__k").as("__kc"), col("__cut")).distinct())
    // adjacent (predecessor, key) pairs over the counted distinct axis
    // (adjacentPairs broadcasts the small-axis regime itself)
    val pairs = adjacentPairs(s.select(col("__k")).distinct())
    val totals = s.groupBy(col("__k")).agg(sum(col("n")).as("__nk"))
    // bin a side's masses by the REFERENCE key's cuts; label rows by the
    // CURRENT key so the pair join point stays (key, bin)
    def binned(side: DataFrame, out: String) = side
      .join(cuts, side("__kref") === cuts("__kc") && side("__s") > cuts("__cut"),
        "left")
      .groupBy(side("__k"), side("__kref"), side("__s"))
      .agg(first(side("n")).as("__m"), (count(col("__cut")) + 1L).as("bin"))
      .groupBy(col("__k"), col("bin")).agg(sum(col("__m")).as(out))
    val curSide = s.join(pairs, Seq("__k"))
    val refSide = s.withColumnRenamed("__k", "__kref")
      .join(pairs, Seq("__kref"))
    binned(refSide, "n_ref")
      .join(binned(curSide, "n_cur"), Seq("__k", "bin"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .join(pairs, Seq("__k"))
      .join(broadcast(totals.select(col("__k").as("__kref"), col("__nk").as("__nr"))),
        Seq("__kref"))
      .join(broadcast(totals.select(col("__k"), col("__nk").as("__nc"))),
        Seq("__k"))
      .filter(col("__nr") > 0L && col("__nc") > 0L)
      .withColumn("__pr",
        greatest(col("n_ref"), lit(1L)).cast("double") / col("__nr").cast("double"))
      .withColumn("__pc",
        greatest(col("n_cur"), lit(1L)).cast("double") / col("__nc").cast("double"))
      .select(col("__k").as(keyCol), col("bin"), col("n_ref"), col("n_cur"),
        expr("abs(n_ref * 1000000L DIV __nr - n_cur * 1000000L DIV __nc)")
          .as("gap_micro"),
        floor((col("__pc") - col("__pr")) * log(col("__pc") / col("__pr")) *
          lit(1000000.0)).cast("long").as("psi_micro"))
  }

  /** (predecessor, key) adjacency over a distinct key axis — counted:
    * a small axis (≤ max(4096, 64·P), or ≤ `plainAxisLimit` when set
    * for tests) takes one plain lag window and broadcasts; a large one
    * rides [[Ranks.withGlobalRank]] + a rank self-join, un-broadcast
    * (at that scale the downstream joins shuffle on the key anyway). */
  private[graft] def adjacentPairs(
      distinctKeys: DataFrame,
      plainAxisLimit: Long = -1L
  ): DataFrame = {
    val spark = distinctKeys.sparkSession
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val limit = if (plainAxisLimit >= 0L) plainAxisLimit
      else math.max(4096L, 64L * p)
    val keys = distinctKeys.localCheckpoint()
    if (keys.count() <= limit)
      broadcast(
        keys.withColumn("__kref", lag(col("__k"), 1).over(Window.orderBy(col("__k"))))
          .filter(col("__kref").isNotNull))
    else {
      val ranked = Ranks.withGlobalRank(keys, Seq(col("__k")), "__r")
        .localCheckpoint() // self-joined below; rank once
      ranked
        .join(ranked.select(col("__k").as("__kref"), (col("__r") + 1L).as("__r")),
          Seq("__r"))
        .select(col("__k"), col("__kref"))
    }
  }

  /** GROUPED two-sample KS from keyed score-grain stats — value-identical
    * per key to [[graft.operators.Analytics.ksScoreByKey]]: per-key
    * cumulative class CDFs, one DIV per class, argmax gap with ties to
    * the smallest score; one-class keys absent. Same per-key-window
    * scale shape as [[aucByKeyFromStats]]. */
  def ksByKeyFromStats(stats: DataFrame, keyCol: String): DataFrame = {
    val s = normalizedKeyed(stats)
      .withColumn("__neg", col("n") - col("pos"))
    val cum = Window.partitionBy(col("__k")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("__k"))
    s.withColumn("__cp", sum(col("pos")).over(cum))
      .withColumn("__cq", sum(col("__neg")).over(cum))
      .withColumn("__np", sum(col("pos")).over(tot))
      .withColumn("__nn", sum(col("__neg")).over(tot))
      .filter(col("__np") > 0L && col("__nn") > 0L)
      .withColumn("__gap",
        abs(expr("__cp * 1000000L DIV __np") - expr("__cq * 1000000L DIV __nn")))
      .groupBy(col("__k"))
      .agg(max(struct(col("__gap"), (-col("__s")).as("__ns"))).as("__m"),
        first(col("__np")).as("n_pos"), first(col("__nn")).as("n_neg"))
      .select(col("__k").as(keyCol), col("n_pos"), col("n_neg"),
        col("__m.__gap").as("ks_micro"), (-col("__m.__ns")).as("at_score"))
  }

  /**
   * Exact ROC AUC from score-grain stats — value-identical to
   * [[Analytics.aucScore]] on the underlying entities: a score group
   * occupies ranks (C+1 … C+n] (C = exclusive cumulative count in score
   * order), so its doubled midrank is 2·cum − n + 1, and the
   * Mann–Whitney arithmetic proceeds on score-cardinality rows.
   */
  def aucFromStats(stats: DataFrame): DataFrame =
    Ranks.prefixSumsInclusiveGlobal(
      normalized(stats),
      col("__s"), Seq("n"), Seq("__cn"))
      .agg(
        sum(col("pos") * (col("__cn") * 2L - col("n") + 1L)).as("__s2"),
        sum(col("pos")).as("n_pos"),
        sum(col("n") - col("pos")).as("n_neg"))
      .filter(col("n_pos") > 0L && col("n_neg") > 0L)
      .select(col("n_pos"), col("n_neg"),
        expr("((__s2 - n_pos * (n_pos + 1L)) * 1000000L) DIV (2L * n_pos * n_neg)")
          .as("auc_micro"))

  /** Two-sample KS separation from score-grain stats — value-identical
    * to [[Analytics.ksScore]]: both class CDFs are cumulative sums over
    * the score axis, one DIV per class, argmax gap with ties to the
    * smallest score. */
  def ksFromStats(stats: DataFrame): DataFrame = {
    val s = normalized(stats)
      .withColumn("__neg", col("n") - col("pos"))
    val tot = broadcast(s.agg(
      sum(col("pos")).as("__np"), sum(col("__neg")).as("__nn")))
    Ranks.prefixSumsInclusiveGlobal(
      s, col("__s"), Seq("pos", "__neg"), Seq("__cp", "__cq"))
      .crossJoin(tot)
      .filter(col("__np") > 0L && col("__nn") > 0L)
      .withColumn("__gap",
        abs(expr("__cp * 1000000L DIV __np") - expr("__cq * 1000000L DIV __nn")))
      .agg(max(struct(col("__gap"), (-col("__s")).as("__ns"))).as("__m"),
        first(col("__np")).as("n_pos"), first(col("__nn")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        col("__m.__gap").as("ks_micro"), (-col("__m.__ns")).as("at_score"))
      .filter(col("n_pos").isNotNull)
  }

  /**
   * Decile lift (gains chart) from score-grain stats. Stats cannot see
   * entity ids, so the intra-score tie rule is POSITIVES-FIRST (rank by
   * score DESC, then label DESC) — deterministic and stats-derivable; a
   * straddling score group contributes min(pos, room) positives to the
   * earlier decile. Same bucket rule and integer lift arithmetic as
   * [[Analytics.decileLift]] (`((r−1)·10) DIV n + 1`,
   * `lift = pos_d·n·10⁶ DIV (n_d·pos)`).
   */
  def decileLiftFromStats(stats: DataFrame): DataFrame = {
    val spark = stats.sparkSession
    val s = normalized(stats)
    val tot = broadcast(s.agg(sum(col("n")).as("__n"), sum(col("pos")).as("__pos")))
    val deciles = broadcast(spark.range(1, 11).select(col("id").as("decile")))
    Ranks.prefixSumsInclusiveGlobal(
      s.withColumn("__negs", -col("__s")), col("__negs"), Seq("n"), Seq("__cn"))
      .crossJoin(tot)
      .filter(col("__pos") > 0L)
      .crossJoin(deciles)
      // decile d covers ranks (⌈(d−1)·n∕10⌉, ⌈d·n∕10⌉]; this group covers
      // (C, __cn] with its positives first
      .withColumn("__lo", expr("((decile - 1L) * __n + 9L) DIV 10L + 1L"))
      .withColumn("__hi", expr("(decile * __n + 9L) DIV 10L"))
      .withColumn("__ge", col("__cn") - col("n") + 1L)
      .withColumn("__ne",
        greatest(lit(0L),
          least(col("__cn"), col("__hi")) - greatest(col("__ge"), col("__lo")) + 1L))
      .withColumn("__np",
        greatest(lit(0L),
          least(col("__ge") + col("pos") - 1L, col("__hi")) -
            greatest(col("__ge"), col("__lo")) + 1L))
      .groupBy(col("decile"))
      .agg(sum(col("__ne")).as("n_entities"), sum(col("__np")).as("n_positive"),
        first(col("__n")).as("__n"), first(col("__pos")).as("__pos"))
      .filter(col("n_entities") > 0L)
      .withColumn("lift_micro",
        expr("(n_positive * __n * 1000000L) DIV (n_entities * __pos)"))
      .select(col("decile"), col("n_entities"), col("n_positive"), col("lift_micro"))
  }

  /**
   * ROC curve points from score-grain stats: one row per distinct score
   * threshold ("predict positive iff score ≥ t"), with the full
   * confusion at that threshold and TPR/FPR/precision/recall floored
   * onto the micro grid — the curve behind [[aucFromStats]]'s single
   * number, and the threshold-picking table a deployment actually
   * needs. `tp(t=s) = n_pos − pos≤s + pos_at_s` falls straight out of
   * the inclusive cumulative class counts.
   *
   * Scale shape: one range-partitioned prefix pass over the
   * score-cardinality frame; nothing entity-sized anywhere.
   */
  def rocFromStats(stats: DataFrame): DataFrame = {
    val s = normalized(stats)
      .withColumn("__neg", col("n") - col("pos"))
    val tot = broadcast(s.agg(
      sum(col("pos")).as("__np"), sum(col("__neg")).as("__nn")))
    Ranks.prefixSumsInclusiveGlobal(
      s, col("__s"), Seq("pos", "__neg"), Seq("__cp", "__cq"))
      .crossJoin(tot)
      .filter(col("__np") > 0L && col("__nn") > 0L)
      .withColumn("tp", col("__np") - col("__cp") + col("pos"))
      .withColumn("fp", col("__nn") - col("__cq") + col("__neg"))
      .select(col("__s").as("threshold_micro"), col("tp"), col("fp"),
        (col("__np") - col("tp")).as("fn"), (col("__nn") - col("fp")).as("tn"),
        expr("(tp * 1000000L) DIV __np").as("tpr_micro"),
        expr("(fp * 1000000L) DIV __nn").as("fpr_micro"),
        expr("CASE WHEN tp + fp > 0 THEN (tp * 1000000L) DIV (tp + fp) ELSE 0L END")
          .as("precision_micro"))
  }

  /**
   * Precision-recall curve points from score-grain stats — the
   * class-imbalance-honest sibling of [[rocFromStats]] (same thresholds,
   * same confusion arithmetic; recall IS the TPR column, re-labeled for
   * the PR reading). One row per distinct score threshold.
   */
  def prFromStats(stats: DataFrame): DataFrame =
    rocFromStats(stats).select(
      col("threshold_micro"), col("tp"), col("fp"),
      col("tpr_micro").as("recall_micro"), col("precision_micro"))

  /**
   * Average precision (area under the PR curve, step-wise) from
   * score-grain stats: AP = Σ_t ΔR_t · P_t over thresholds in DESCENDING
   * score order. The recall increment at threshold s is exactly that
   * score's own positives over n_pos, so NO ordered window is needed —
   * `ap_micro = (Σ_s pos_s · precision_micro_s) DIV n_pos` with each
   * threshold's precision already floored onto the micro grid (the
   * definitional integer spelling; any engine reproduces it).
   */
  def averagePrecisionFromStats(stats: DataFrame): DataFrame = {
    val s = normalized(stats).withColumn("__neg", col("n") - col("pos"))
    val tot = broadcast(s.agg(
      sum(col("pos")).as("__np"), sum(col("__neg")).as("__nn")))
    Ranks.prefixSumsInclusiveGlobal(
      s, col("__s"), Seq("pos", "__neg"), Seq("__cp", "__cq"))
      .crossJoin(tot)
      // tp/fp at threshold __s, and this threshold's recall increment is
      // its own `pos` — zero-pos thresholds contribute nothing, exactly
      // the step-wise AP definition
      .withColumn("tp", col("__np") - col("__cp") + col("pos"))
      .withColumn("fp", col("__nn") - col("__cq") + col("__neg"))
      .withColumn("__prec",
        expr("CASE WHEN tp + fp > 0 THEN (tp * 1000000L) DIV (tp + fp) ELSE 0L END"))
      .agg(sum(col("pos") * col("__prec")).as("__num"),
        first(col("__np")).as("n_pos"), first(col("__nn")).as("n_neg"))
      // post-agg guard: zero-positive (or empty) input yields ZERO rows,
      // matching the definitional oracle — never a single all-null row
      .filter(col("n_pos").isNotNull && col("n_pos") > 0L)
      .select(col("n_pos"), col("n_neg"),
        expr("__num DIV n_pos").as("ap_micro"))
  }

  /**
   * Calibration (reliability) table from score-grain stats: the score
   * range splits into `nBins` equal-width bins and each bin reports its
   * population, positives, mean score and observed positive rate — "do
   * higher scores actually convert more", the diagnostic read next to
   * AUC/KS. All integer: `bin = (s − min)·nBins DIV (max − min + 1) + 1`,
   * means and rates floor onto the micro grid. Empty bins are absent
   * (no rows to report).
   *
   * Scale shape: one bounded min/max aggregate + one score-grain
   * aggregate — nothing wider than the stats frame itself.
   */
  def calibrationFromStats(stats: DataFrame, nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "nBins must be positive")
    val s = normalized(stats)
    val mm = broadcast(s.agg(min(col("__s")).as("__lo"), max(col("__s")).as("__hi")))
    s.crossJoin(mm)
      .withColumn("bin",
        expr(s"((__s - __lo) * ${nBins}L) DIV (__hi - __lo + 1L) + 1L"))
      .groupBy(col("bin"))
      .agg(sum(col("n")).as("n_entities"), sum(col("pos")).as("n_positive"),
        sum(col("n") * col("__s")).as("__ws"))
      .select(col("bin"), col("n_entities"), col("n_positive"),
        expr("__ws DIV n_entities").as("mean_score_micro"),
        expr("(n_positive * 1000000L) DIV n_entities").as("pos_rate_micro"))
  }

  /**
   * Expected Calibration Error from score-grain stats — the scalar
   * summary of [[calibrationFromStats]]'s table: the population-weighted
   * mean absolute gap between each bin's observed positive rate and its
   * mean score, `ece = Σ_b n_b·|pos_rate_b − mean_score_b| ∕ N`. All
   * integer on the micro grid (per-bin rates/means are already floored
   * by the calibration table; the final weighted mean takes one more
   * DIV). Meaningful when scores are micro-PROBABILITIES (0..10⁶) —
   * callers feeding raw unbounded scores get a number, not a
   * calibration read.
   */
  def eceFromStats(stats: DataFrame, nBins: Int = 10): DataFrame =
    calibrationFromStats(stats, nBins)
      .agg(sum(col("n_entities")).as("n_entities"),
        sum(col("n_entities") *
          abs(col("pos_rate_micro") - col("mean_score_micro"))).as("__num"))
      // empty input yields ZERO rows, never one all-null row
      .filter(col("n_entities").isNotNull && col("n_entities") > 0L)
      .select(col("n_entities"),
        expr("__num DIV n_entities").as("ece_micro"))

  /**
   * Brier score (mean squared error of the probability forecast) from
   * score-grain stats — the strictly-proper scoring rule beside
   * [[eceFromStats]]'s binned diagnostic: for micro-probability scores,
   * `brier = mean((s∕10⁶ − y)²)`, reported EXACTLY on the micro² grid as
   * `brier_micro2 = Σ_s (n_s·s² − 2·10⁶·s·pos_s + 10¹²·pos_s) DIV N`
   * (0 = perfect, 10¹² = always wrong with certainty). Each term is
   * evaluated in DECIMAL(38,0) — n·s² alone overflows a long once a
   * score group holds >9.2M entities, and the engine-exactness doctrine
   * wants the same integer everywhere (DuckDB sums into HUGEINT).
   *
   * Scale shape: one aggregate over the score-grain frame.
   */
  def brierFromStats(stats: DataFrame): DataFrame = {
    val s = col("__s").cast("decimal(38,0)")
    val term = col("n").cast("decimal(38,0)") * s * s -
      col("pos").cast("decimal(38,0)") * s * lit(2000000L) +
      col("pos").cast("decimal(38,0)") * lit(1000000000000L)
    normalized(stats)
      .agg(sum(col("n")).as("n_entities"), sum(term).as("__num"))
      .filter(col("n_entities") > 0L)
      .select(col("n_entities"),
        expr("CAST(__num DIV n_entities AS BIGINT)").as("brier_micro2"))
  }

  /**
   * TVD score drift from two score-grain stats frames (`pos` ignored) —
   * value-identical to [[Analytics.scoreDriftTvd]]: the reference's
   * decile value cutoffs depend only on score ORDER STATISTICS (the
   * score at each decile's last rank), which cumulative counts supply;
   * bins count strictly-greater cutoffs + 1 and both frames' masses
   * land on the same bins.
   */
  def tvdFromStats(refStats: DataFrame, curStats: DataFrame): DataFrame =
    tvdFromBinned(driftBinnedCounts(refStats, curStats))

  /** TVD projection over a precomputed [[driftBinnedCounts]] frame —
    * lets one binning pass feed both drift metrics. */
  def tvdFromBinned(binned: DataFrame): DataFrame =
    binned
      .select(col("bin"), col("n_ref"), col("n_cur"),
        expr("abs(n_ref * 1000000L DIV __nr - n_cur * 1000000L DIV __nc)")
          .as("gap_micro"))

  /**
   * Population Stability Index from two score-grain stats frames — the
   * log-based industry-standard sibling of [[tvdFromStats]], over the
   * SAME reference-decile value bins: per bin,
   * `psi = (p_cur − p_ref)·ln(p_cur ∕ p_ref)` with zero counts floored
   * to 1 (the standard zero-bin guard; a bin one side never saw would
   * otherwise divide by zero). Proportions and the log ride ONE fixed
   * double expression tree floored onto the 1e-6 grid per bin — the
   * engine-exactness doctrine ([[Analytics.abTestZ]]'s class): any
   * engine evaluating the same tree reproduces the micro values. Rule
   * of thumb: Σpsi < 0.1 stable, > 0.25 shifted.
   */
  def psiFromStats(refStats: DataFrame, curStats: DataFrame): DataFrame =
    psiFromBinned(driftBinnedCounts(refStats, curStats))

  /** PSI projection over a precomputed [[driftBinnedCounts]] frame. */
  def psiFromBinned(binned: DataFrame): DataFrame =
    binned
      .withColumn("__pr",
        greatest(col("n_ref"), lit(1L)).cast("double") / col("__nr").cast("double"))
      .withColumn("__pc",
        greatest(col("n_cur"), lit(1L)).cast("double") / col("__nc").cast("double"))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        floor((col("__pc") - col("__pr")) * log(col("__pc") / col("__pr")) *
          lit(1000000.0)).cast("long").as("psi_micro"))

  /** Shared binning for the drift pair: both frames' masses on the
    * reference-decile value bins, with totals — `(bin, n_ref, n_cur,
    * __nr, __nc)`. The reference frame feeds cutoffs + binning + totals
    * (three consumers), so both frames checkpoint once. Public so a
    * caller evaluating BOTH drift metrics (the normal monitoring read)
    * pays the cuts pipeline once: compute this, then
    * [[tvdFromBinned]] + [[psiFromBinned]] are cheap projections. */
  def driftBinnedCounts(
      refStats: DataFrame,
      curStats: DataFrame
  ): DataFrame = {
    val r = normalized(refStats).drop("pos").localCheckpoint()
    val c = normalized(curStats).drop("pos").localCheckpoint()
    val totR = broadcast(r.agg(sum(col("n")).as("__nr")))
    val totC = broadcast(c.agg(sum(col("n")).as("__nc")))
    val cuts = broadcast(
      Ranks.prefixSumsInclusiveGlobal(r, col("__s"), Seq("n"), Seq("__cn"))
        .crossJoin(totR)
        .withColumn("__dlo", expr("((__cn - n) * 10L) DIV __nr + 1L"))
        .withColumn("__dhi", expr("((__cn - 1L) * 10L) DIV __nr + 1L"))
        .withColumn("__d", explode(sequence(col("__dlo"), col("__dhi"))))
        .filter(col("__d") <= 9L)
        .groupBy(col("__d")).agg(max(col("__s")).as("__cut"))
        .select(col("__cut")).distinct())
    def binned(st: DataFrame, out: String) = st
      .join(cuts, st("__s") > cuts("__cut"), "left")
      .groupBy(st("__s"))
      .agg(first(st("n")).as("__m"), (count(col("__cut")) + 1L).as("bin"))
      .groupBy(col("bin")).agg(sum(col("__m")).as(out))
    binned(r, "n_ref")
      .join(binned(c, "n_cur"), Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(totR).crossJoin(totC)
      .filter(col("__nr") > 0L && col("__nc") > 0L)
  }
}
