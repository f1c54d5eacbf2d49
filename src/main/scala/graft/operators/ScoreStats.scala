package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  def read(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.table(table)
      .groupBy(col("__s"))
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))

  /**
   * Exact ROC AUC from score-grain stats — value-identical to
   * [[Analytics.aucScore]] on the underlying entities: a score group
   * occupies ranks (C+1 … C+n] (C = exclusive cumulative count in score
   * order), so its doubled midrank is 2·cum − n + 1, and the
   * Mann–Whitney arithmetic proceeds on score-cardinality rows.
   */
  def aucFromStats(stats: DataFrame): DataFrame =
    Ranks.prefixSumsInclusiveGlobal(
      stats.select(col("__s"), col("n").cast("long").as("n"),
        col("pos").cast("long").as("pos")),
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
    val s = stats.select(col("__s"), col("n").cast("long").as("n"),
      col("pos").cast("long").as("pos"))
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
    val s = stats.select(col("__s"), col("n").cast("long").as("n"),
      col("pos").cast("long").as("pos"))
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
    val s = stats.select(col("__s"), col("n").cast("long").as("n"),
      col("pos").cast("long").as("pos"))
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
    val s = stats.select(col("__s"), col("n").cast("long").as("n"),
      col("pos").cast("long").as("pos"))
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
   * TVD score drift from two score-grain stats frames (`pos` ignored) —
   * value-identical to [[Analytics.scoreDriftTvd]]: the reference's
   * decile value cutoffs depend only on score ORDER STATISTICS (the
   * score at each decile's last rank), which cumulative counts supply;
   * bins count strictly-greater cutoffs + 1 and both frames' masses
   * land on the same bins.
   */
  def tvdFromStats(refStats: DataFrame, curStats: DataFrame): DataFrame =
    binnedDriftCounts(refStats, curStats)
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
    binnedDriftCounts(refStats, curStats)
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
    * (three consumers), so both frames checkpoint once. */
  private def binnedDriftCounts(
      refStats: DataFrame,
      curStats: DataFrame
  ): DataFrame = {
    val r = refStats.select(col("__s"), col("n").cast("long").as("n"))
      .localCheckpoint()
    val c = curStats.select(col("__s"), col("n").cast("long").as("n"))
      .localCheckpoint()
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
