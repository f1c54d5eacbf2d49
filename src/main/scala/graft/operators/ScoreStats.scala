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
 *
 * The GLOBAL table is the KEYED table with no slice column: every
 * maintained-table verb below is ONE implementation parameterized by
 * the optional `__k` key (a model-eval slice axis — day, segment,
 * cohort), and the public global/keyed entry points are thin wrappers.
 * One crash contract, one spec surface — not two copies in lockstep.
 */
object ScoreStats {

  // ------------------------------------------------------ unified core

  /** The table grain: `(__s)` global, `(__k, __s)` keyed. */
  private def grain(keyed: Boolean): Seq[Column] =
    if (keyed) Seq(col("__k"), col("__s")) else Seq(col("__s"))

  /** Score-grain (optionally key-sliced) class counts of a scored frame:
    * one row per [key ×] distinct score with `n` entities and `pos`
    * positives. */
  private def fromScoredBy(
      scored: DataFrame,
      key: Option[Column],
      scoreCol: Column,
      labelCol: Column
  ): DataFrame =
    scored
      .select(key.map(_.as("__k")).toSeq ++ Seq(
        scoreCol.cast("long").as("__s"), labelCol.cast("long").as("__y")): _*)
      .filter(key.map(_ => col("__k").isNotNull).getOrElse(lit(true)) &&
        col("__s").isNotNull && col("__y").isin(0L, 1L))
      .groupBy(grain(key.nonEmpty): _*)
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))

  private def materializeBy(
      scored: DataFrame,
      key: Option[Column],
      scoreCol: Column,
      labelCol: Column,
      table: String,
      batchId: Long
  ): Unit =
    Bucketing.materializePlain(
      fromScoredBy(scored, key, scoreCol, labelCol)
        .withColumn("__gen", lit(batchId)),
      table)

  /** Fold a batch of newly-scored entities in: ONE idempotent
    * grain-level `insertInto` guarded by the stored high-water `__gen`
    * (replayed ticks no-op) — the same two-regime crash contract as the
    * basket fact table. */
  private def appendBy(
      batch: DataFrame,
      key: Option[Column],
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
    fromScoredBy(batch, key, scoreCol, labelCol)
      .withColumn("__gen", lit(batchId))
      .select(stored.columns.map(col).toSeq: _*)
      .write.insertInto(table)
  }

  /** The folded stats — generations summed per grain row. */
  private def readBy(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      keyed: Boolean
  ): DataFrame = {
    Bucketing.recoverSwap(spark, table) // complete an interrupted compact
    spark.table(table)
      .groupBy(grain(keyed): _*)
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))
  }

  /** Rewrite the maintained table with generations folded — one row per
    * grain, stamped with the stored high-water `__gen` so the append
    * guard survives compaction; reads are identical before and after.
    * Read-side maintenance after many ticks (each append adds one
    * grain-level delta forever). Rides the staged [[Bucketing.swapInPlain]]
    * (crash leaves the old or the folded table; read/append call
    * `recoverSwap` first). Same single-writer contract as every other
    * maintained-table compactor: never run concurrently with ticks. */
  private def compactBy(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      keyed: Boolean
  ): Unit = {
    Bucketing.recoverSwap(spark, table)
    val t = spark.table(table)
    val hwm = broadcast(t.agg(max(col("__gen")).as("__gen"))) // global HWM
    val folded = t
      .groupBy(grain(keyed): _*)
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))
      .crossJoin(hwm)
      .select(t.columns.map(col).toSeq: _*)
    Bucketing.swapInPlain(folded, table)
  }

  /** One foreachBatch tick of streaming maintenance: first epoch seeds
    * the table, later epochs ride [[appendBy]]'s `__gen` guard — counts
    * are additive (NOT idempotent), so the guard is what makes
    * crash-replayed epochs no-ops, the same two-regime contract as the
    * upsert/rollup streams. */
  private def applyBatchBy(
      table: String,
      key: Option[Column],
      scoreCol: Column,
      labelCol: Column
  )(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (!spark.catalog.tableExists(table))
      materializeBy(batch, key, scoreCol, labelCol, table, batchId)
    else appendBy(batch, key, scoreCol, labelCol, table, batchId)
  }

  /** Normalize any stats-shaped frame to strict grain with long counts —
    * the defensive head of every `*FromStats` derivation. The
    * derivations' rank/CDF arithmetic is only valid with ONE row per
    * grain; a caller passing per-generation rows (`spark.table(t)`
    * instead of the read entry point) would otherwise get silently wrong
    * midranks. `posOptional` is set ONLY by the drift metrics (they need
    * masses, not labels): there a `pos`-less `(__s, n)` frame gets a
    * zero `pos` injected; everywhere else a missing `pos` stays a LOUD
    * analysis error — injecting zeros into AUC/KS/ROC would return
    * silently empty/NULL metrics instead. On already-grain input this is
    * one cheap hash aggregate. */
  private def normalizedBy(
      stats: DataFrame,
      keyed: Boolean,
      posOptional: Boolean = false
  ): DataFrame = {
    val s = if (posOptional && !stats.columns.contains("pos"))
      stats.withColumn("pos", lit(0L))
    else stats
    s.groupBy(grain(keyed): _*)
      .agg(sum(col("n").cast("long")).as("n"),
        sum(col("pos").cast("long")).as("pos"))
  }

  // ------------------------------------------- global/keyed entry points
  // Thin wrappers over the unified core above; contracts live on the
  // `*By` docs. Keyed batch contract: batches partition the (key, entity)
  // set — an entity may appear under several keys (scored once per day),
  // but each (key, entity) pair lands in exactly one batch.

  /** Score-grain class counts: one row per distinct score. */
  def fromScored(scored: DataFrame, scoreCol: Column, labelCol: Column): DataFrame =
    fromScoredBy(scored, None, scoreCol, labelCol)

  /** (key, score)-grain sibling of [[fromScored]]. */
  def fromScoredKeyed(scored: DataFrame, keyCol: Column, scoreCol: Column,
      labelCol: Column): DataFrame =
    fromScoredBy(scored, Some(keyCol), scoreCol, labelCol)

  /** Seed the maintained global table from the first batch. */
  def materialize(scored: DataFrame, scoreCol: Column, labelCol: Column,
      table: String, batchId: Long = 0L): Unit =
    materializeBy(scored, None, scoreCol, labelCol, table, batchId)

  /** Seed the KEYED maintained table — [[materialize]] with a `__k`
    * slice column, so grouped eval metrics (per-day AUC/KS) read
    * incrementally instead of rescanning raw scored events. */
  def materializeKeyed(scored: DataFrame, keyCol: Column, scoreCol: Column,
      labelCol: Column, table: String, batchId: Long = 0L): Unit =
    materializeBy(scored, Some(keyCol), scoreCol, labelCol, table, batchId)

  /** Fold a batch into the global table — [[appendBy]]'s `__gen` contract. */
  def append(batch: DataFrame, scoreCol: Column, labelCol: Column,
      table: String, batchId: Long): Unit =
    appendBy(batch, None, scoreCol, labelCol, table, batchId)

  /** Keyed sibling of [[append]] — same `__gen` guard on (key, score) grain. */
  def appendKeyed(batch: DataFrame, keyCol: Column, scoreCol: Column,
      labelCol: Column, table: String, batchId: Long): Unit =
    appendBy(batch, Some(keyCol), scoreCol, labelCol, table, batchId)

  /** One foreachBatch tick of STREAMING maintenance — [[applyBatchBy]]. */
  def applyScoreStatsBatch(table: String, scoreCol: Column, labelCol: Column)(
      batch: DataFrame, batchId: Long): Unit =
    applyBatchBy(table, None, scoreCol, labelCol)(batch, batchId)

  /** Keyed twin of [[applyScoreStatsBatch]]. */
  def applyScoreStatsKeyedBatch(table: String, keyCol: Column, scoreCol: Column,
      labelCol: Column)(batch: DataFrame, batchId: Long): Unit =
    applyBatchBy(table, Some(keyCol), scoreCol, labelCol)(batch, batchId)

  /** Streaming maintenance: `scored-entity stream → foreachBatch →
    * score-grain generations`; read with [[read]]. Micro-batches must
    * partition the entity set. */
  def scoreStatsStream(stream: DataFrame, table: String, scoreCol: Column,
      labelCol: Column
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch(applyScoreStatsBatch(table, scoreCol, labelCol) _)

  /** Keyed twin of [[scoreStatsStream]]; read with [[readKeyed]]. */
  def scoreStatsKeyedStream(stream: DataFrame, table: String, keyCol: Column,
      scoreCol: Column, labelCol: Column
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch(applyScoreStatsKeyedBatch(table, keyCol, scoreCol, labelCol) _)

  /** The folded `(__s, n, pos)` stats — generations summed per score. */
  def read(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    readBy(spark, table, keyed = false)

  /** The folded `(__k, __s, n, pos)` keyed stats. */
  def readKeyed(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    readBy(spark, table, keyed = true)

  /** Fold the global table's generations in place — [[compactBy]]. */
  def compactScoreStats(spark: org.apache.spark.sql.SparkSession, table: String): Unit =
    compactBy(spark, table, keyed = false)

  /** Keyed sibling of [[compactScoreStats]]. */
  def compactScoreStatsKeyed(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = compactBy(spark, table, keyed = true)

  // ------------------------------------------------------ keyed metrics

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
   * million entities per key.
   */
  def aucByKeyFromStats(stats: DataFrame, keyCol: String): DataFrame = {
    val s = normalizedBy(stats, keyed = true)
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
    val s = normalizedBy(stats, keyed = true)
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
   * cuts are ≤9 rows per key, totals one row per key. The DISTINCT key
   * axis is COUNTED ONCE and every axis-sized frame rides the same
   * adaptive regime: a small axis (a calendar of days, a segment list —
   * ≤max(4096, 64·P), or ≤`plainAxisLimit` when set for tests) takes
   * one plain lag window and broadcasts the cuts/totals/pair frames; a
   * large one (high-cardinality segments/cohorts) routes the adjacency
   * through the range-partitioned [[Ranks.withGlobalRank]] + a rank
   * self-join and joins cuts/totals SHUFFLED on the key (the pair join
   * shuffles on the key anyway) — no data-sized single-partition stage
   * and no driver-side collect proportional to the key axis in either
   * regime.
   */
  def driftByAdjacentKeyFromStats(
      stats: DataFrame,
      keyCol: String,
      plainAxisLimit: Long = -1L
  ): DataFrame = {
    val s = normalizedBy(stats, keyed = true, posOptional = true)
      .drop("pos").localCheckpoint()
    // ONE counted decision for every axis-sized frame in this plan
    val keys = s.select(col("__k")).distinct().localCheckpoint()
    val small = axisIsSmall(keys, plainAxisLimit)
    driftTrendCore(s, Nil, adjacentPairsOf(keys, small),
      axisSized => if (small) broadcast(axisSized) else axisSized,
      Seq(col("__k").as(keyCol)))
  }

  /**
   * Shared drift-trend assembly — ONE copy of the drift math (decile
   * cuts, reference-binned masses, integer TVD gap, zero-floored PSI
   * term) for the ungrouped and grouped trends, parameterized by the
   * partition columns. `s` carries `(gcols…, __k, __s, n)` and must be
   * checkpointed (it feeds cuts, totals and both pair sides); `pairs`
   * carries `(gcols…, __k, __kref)` adjacency; `gate` broadcasts
   * axis-sized frames when the caller's axis is counted-small (identity
   * when the axis scales — the downstream joins shuffle on the key
   * anyway).
   */
  private def driftTrendCore(
      s: DataFrame,
      gcols: Seq[String],
      pairs: DataFrame,
      gate: DataFrame => DataFrame,
      outHead: Seq[Column]
  ): DataFrame = {
    val part = gcols.map(col) :+ col("__k")
    val cum = Window.partitionBy(part: _*).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(part: _*)
    // per-key reference-decile cuts (≤9 distinct values per key): each
    // score group covers deciles __dlo..__dhi of its key's population
    val cuts = gate(
      s.withColumn("__cn", sum(col("n")).over(cum))
        .withColumn("__nk", sum(col("n")).over(tot))
        .withColumn("__dlo", expr("((__cn - n) * 10L) DIV __nk + 1L"))
        .withColumn("__dhi", expr("((__cn - 1L) * 10L) DIV __nk + 1L"))
        .withColumn("__d", explode(sequence(col("__dlo"), col("__dhi"))))
        .filter(col("__d") <= 9L)
        .groupBy((part :+ col("__d")): _*).agg(max(col("__s")).as("__cut"))
        .select((gcols.map(g => col(g).as(s"${g}c")) :+
          col("__k").as("__kc") :+ col("__cut")): _*)
        .distinct())
    val totals = s.groupBy(part: _*).agg(sum(col("n")).as("__nk"))
    // bin a side's masses by the REFERENCE key's cuts; label rows by the
    // CURRENT key so the pair join point stays (key, bin)
    def binned(side: DataFrame, out: String) = side
      .join(cuts,
        gcols.map(g => side(g) === cuts(s"${g}c"))
          .foldLeft(side("__kref") === cuts("__kc") && side("__s") > cuts("__cut"))(
            _ && _),
        "left")
      .groupBy((gcols.map(side(_)) :+ side("__k") :+ side("__kref") :+
        side("__s")): _*)
      .agg(first(side("n")).as("__m"), (count(col("__cut")) + 1L).as("bin"))
      .groupBy((part :+ col("bin")): _*).agg(sum(col("__m")).as(out))
    val curSide = s.join(pairs, gcols :+ "__k")
    val refSide = s.withColumnRenamed("__k", "__kref")
      .join(pairs, gcols :+ "__kref")
    binned(refSide, "n_ref")
      .join(binned(curSide, "n_cur"), gcols ++ Seq("__k", "bin"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .join(pairs, gcols :+ "__k")
      .join(gate(totals.select((gcols.map(col) :+ col("__k").as("__kref") :+
        col("__nk").as("__nr")): _*)), gcols :+ "__kref")
      .join(gate(totals.select((gcols.map(col) :+ col("__k") :+
        col("__nk").as("__nc")): _*)), gcols :+ "__k")
      .filter(col("__nr") > 0L && col("__nc") > 0L)
      .withColumn("__pr",
        greatest(col("n_ref"), lit(1L)).cast("double") / col("__nr").cast("double"))
      .withColumn("__pc",
        greatest(col("n_cur"), lit(1L)).cast("double") / col("__nc").cast("double"))
      .select((outHead ++ Seq(col("bin"), col("n_ref"), col("n_cur"),
        expr("abs(n_ref * 1000000L DIV __nr - n_cur * 1000000L DIV __nc)")
          .as("gap_micro"),
        floor((col("__pc") - col("__pr")) * log(col("__pc") / col("__pr")) *
          lit(1000000.0)).cast("long").as("psi_micro"))): _*)
  }

  /**
   * GROUPED drift trend — [[driftByAdjacentKeyFromStats]] within each
   * group: the maintained key is a STRUCT `(group, day)` (built with
   * `struct(groupCol, dayCol)` at [[materializeKeyed]] time), and every
   * group's day axis gets its own adjacent-pair drift rows (per-segment
   * per-day monitoring: "did FR's score mix move vs yesterday",
   * independently per segment). Value-identical per group to the
   * ungrouped trend on that group's slice (spec-pinned). Output:
   * `(group, day, bin, n_ref, n_cur, gap_micro, psi_micro)`; each
   * group's first day is absent.
   *
   * Scale shape — the COMPLEMENT of the ungrouped function's regime:
   * there the single key axis scales, so adjacency is counted and
   * adaptive; here the per-group day axis is calendar-sized while the
   * GROUP axis scales, so every window partitions by group (groups
   * spread the shuffle) and every axis-sized frame joins SHUFFLED on
   * its (group, day) key — nothing is broadcast or driver-sized no
   * matter how many groups exist.
   *
   * `groupField`/`dayField` name the struct fields of `__k` (the
   * defaults match `struct(col("g").as("group"), col("d").as("day"))`
   * spelled without aliases, i.e. the source column names).
   */
  def driftByAdjacentKeyGroupedFromStats(
      stats: DataFrame,
      groupField: String,
      dayField: String,
      outGroupCol: String = "group",
      outKeyCol: String = "day",
      plainAxisLimit: Long = -1L
  ): DataFrame = {
    val s = normalizedBy(stats, keyed = true, posOptional = true)
      .select(col(s"__k.$groupField").as("__g"), col(s"__k.$dayField").as("__k"),
        col("__s"), col("n"))
      .localCheckpoint()
    // per-group adjacency: one lag window over the distinct (group, day)
    // axis, PARTITIONED BY GROUP — groups spread, days are a calendar.
    // The axis rides the same counted broadcast gate as the ungrouped
    // trend: a small (group × day) product broadcasts the axis-sized
    // frames (cuts/totals/pairs — several shuffle stages saved on the
    // common monitoring read); a large one joins everything shuffled on
    // its (group, day) key, nothing driver-sized either way.
    val axis = s.select(col("__g"), col("__k")).distinct().localCheckpoint()
    val small = axisIsSmall(axis, plainAxisLimit)
    val gate: DataFrame => DataFrame =
      axisSized => if (small) broadcast(axisSized) else axisSized
    val pairs = gate(axis
      .withColumn("__kref",
        lag(col("__k"), 1).over(Window.partitionBy(col("__g")).orderBy(col("__k"))))
      .filter(col("__kref").isNotNull))
    driftTrendCore(s, Seq("__g"), pairs, gate,
      Seq(col("__g").as(outGroupCol), col("__k").as(outKeyCol)))
  }

  /**
   * GROUPED drift-monitoring tick — [[applyDriftMonitorBatch]] with
   * per-group closure: the maintained key is `struct(group, day)`, and a
   * (group, day) closes when a LATER day arrives in ITS OWN group (one
   * group's stream can run ahead of another's). Emits each newly-closed
   * (group, day)'s drift rows vs that group's previous day, appended to
   * `driftTable` — same exactly-once contract (the `__gen`-guarded fold,
   * a (group, day)-level anti-join, one `insertInto`; a crash between
   * fold and emission self-heals next tick).
   *
   * Scale shape per tick: the distinct (group, day) axis (never the
   * stats history) is materialized; closure and adjacency are ONE lag/
   * lead window partitioned by group — no driver-side collect at all,
   * no matter how many groups exist — and the drift arithmetic runs over
   * the newly-closed keys' (plus predecessors') score-grain rows only.
   */
  def applyGroupedDriftMonitorBatch(
      statsTable: String,
      driftTable: String,
      keyCol: Column,
      scoreCol: Column,
      labelCol: Column,
      groupField: String,
      dayField: String,
      outGroupCol: String = "group",
      outKeyCol: String = "day"
  )(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    applyBatchBy(statsTable, Some(keyCol), scoreCol, labelCol)(batch, batchId)
    val axis = readBy(spark, statsTable, keyed = true)
      .select(col(s"__k.$groupField").as("__g"), col(s"__k.$dayField").as("__k"))
      .distinct().localCheckpoint()
    // closed (a later day exists in the group) AND has a predecessor
    val w = Window.partitionBy(col("__g")).orderBy(col("__k"))
    val closed = axis
      .withColumn("__kref", lag(col("__k"), 1).over(w))
      .withColumn("__next", lead(col("__k"), 1).over(w))
      .filter(col("__kref").isNotNull && col("__next").isNotNull)
      .select(col("__g"), col("__k"), col("__kref"))
    val emitted =
      if (spark.catalog.tableExists(driftTable))
        spark.table(driftTable)
          .select(col(outGroupCol).as("__g"), col(outKeyCol).as("__k")).distinct()
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], axis.schema)
    val candidates = closed.join(emitted, Seq("__g", "__k"), "left_anti")
      .localCheckpoint()
    if (candidates.isEmpty) return
    val involved = candidates.select(col("__g"), col("__k"))
      .union(candidates.select(col("__g"), col("__kref").as("__k"))).distinct()
    val stats = readBy(spark, statsTable, keyed = true)
    val rows = driftByAdjacentKeyGroupedFromStats(
      stats.join(involved,
        stats(s"__k.$groupField") === involved("__g") &&
          stats(s"__k.$dayField") === involved("__k"),
        "leftsemi"),
      groupField, dayField, outGroupCol, outKeyCol)
      .join(candidates.select(col("__g").as(outGroupCol), col("__k").as(outKeyCol)),
        Seq(outGroupCol, outKeyCol), "leftsemi")
    if (!spark.catalog.tableExists(driftTable))
      Bucketing.materializePlain(rows, driftTable)
    else
      rows.select(spark.table(driftTable).columns.map(col).toSeq: _*)
        .write.insertInto(driftTable)
  }

  /** Streaming twin of the GROUPED monitor — see
    * [[applyGroupedDriftMonitorBatch]] for the per-group closure and
    * exactly-once contracts. */
  def groupedDriftMonitorStream(
      stream: DataFrame,
      statsTable: String,
      driftTable: String,
      keyCol: Column,
      scoreCol: Column,
      labelCol: Column,
      groupField: String,
      dayField: String,
      outGroupCol: String = "group",
      outKeyCol: String = "day"
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch(applyGroupedDriftMonitorBatch(
        statsTable, driftTable, keyCol, scoreCol, labelCol,
        groupField, dayField, outGroupCol, outKeyCol) _)

  /** Is this (checkpointed) distinct key axis small enough to broadcast
    * and lag-window in one partition? ≤ max(4096, 64·P), or
    * ≤ `plainAxisLimit` when set for tests. ONE count; callers share the
    * decision across every axis-sized frame in their plan. */
  private def axisIsSmall(keys: DataFrame, plainAxisLimit: Long): Boolean = {
    val p = keys.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val limit = if (plainAxisLimit >= 0L) plainAxisLimit
      else math.max(4096L, 64L * p)
    keys.count() <= limit
  }

  /** (predecessor, key) adjacency over a distinct key axis — counted:
    * a small axis takes one plain lag window and broadcasts; a large one
    * rides [[Ranks.withGlobalRank]] + a rank self-join, un-broadcast
    * (at that scale the downstream joins shuffle on the key anyway). */
  private[graft] def adjacentPairs(
      distinctKeys: DataFrame,
      plainAxisLimit: Long = -1L
  ): DataFrame = {
    val keys = distinctKeys.localCheckpoint()
    adjacentPairsOf(keys, axisIsSmall(keys, plainAxisLimit))
  }

  /** The two adjacency spellings behind [[adjacentPairs]], with the
    * small/large decision made by the caller (so one counted decision
    * can govern several frames). `keys` must be checkpointed. */
  private def adjacentPairsOf(keys: DataFrame, small: Boolean): DataFrame =
    if (small)
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

  /**
   * One foreachBatch tick of the DRIFT-MONITORING loop — the read side a
   * training pipeline actually runs on a scored stream: fold the
   * micro-batch into the KEYED stats table (the `__gen` crash contract),
   * then emit the per-key drift rows (vs each key's predecessor —
   * [[driftByAdjacentKeyFromStats]]'s exact arithmetic) for every key
   * that is now CLOSED and not yet emitted, appended to `driftTable`.
   * A key is closed once a strictly later key has arrived (the
   * event-time-ordered arrival assumption every watermark rests on);
   * the latest key stays open — its mix can still move.
   *
   * Exactly-once: the stats fold rides the `__gen` guard; the emission
   * is key-level anti-joined against the rows already in `driftTable`
   * and lands in ONE `insertInto` — a replayed tick re-emits nothing,
   * and a crash between fold and emission self-heals on the next tick
   * (the closed-unemitted scan finds the gap).
   *
   * Scale shape per tick: one batch-sized fold, the adjacency on the
   * counted key axis, and drift arithmetic over the NEWLY-CLOSED keys'
   * (plus their predecessors') score-grain rows only — never the whole
   * history (only the DISTINCT KEY AXIS is materialized per tick; the
   * stats history itself is read once, restricted to the involved keys,
   * and nothing is materialized at all on a no-candidate tick).
   * Restricting the axis preserves each candidate's true predecessor:
   * the predecessor is in the restricted set by construction and
   * nothing can sort between them.
   */
  def applyDriftMonitorBatch(
      statsTable: String,
      driftTable: String,
      keyCol: Column,
      scoreCol: Column,
      labelCol: Column,
      outKeyCol: String = "key"
  )(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    applyBatchBy(statsTable, Some(keyCol), scoreCol, labelCol)(batch, batchId)
    val keys = readBy(spark, statsTable, keyed = true)
      .select(col("__k")).distinct().localCheckpoint()
    val open = keys.agg(max(col("__k"))).collect()(0) // the still-open key
    if (open.isNullAt(0)) return
    val emitted =
      if (spark.catalog.tableExists(driftTable))
        spark.table(driftTable).select(col(outKeyCol).as("__k")).distinct()
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], keys.schema)
    // (key, predecessor) pairs for keys that are closed and unemitted
    val candidates = adjacentPairsOf(keys, axisIsSmall(keys, -1L))
      .filter(col("__k") < lit(open.get(0)))
      .join(emitted, Seq("__k"), "left_anti")
      .localCheckpoint()
    if (candidates.isEmpty) return
    val involved = candidates.select(col("__k"))
      .union(candidates.select(col("__kref").as("__k"))).distinct()
    val rows = driftByAdjacentKeyFromStats(
      readBy(spark, statsTable, keyed = true)
        .join(involved, Seq("__k"), "leftsemi"), outKeyCol)
      .join(candidates.select(col("__k").as(outKeyCol)), Seq(outKeyCol), "leftsemi")
    if (!spark.catalog.tableExists(driftTable))
      Bucketing.materializePlain(rows, driftTable)
    else
      rows.select(spark.table(driftTable).columns.map(col).toSeq: _*)
        .write.insertInto(driftTable)
  }

  /** Streaming drift monitoring: `scored stream → foreachBatch → keyed
    * stats fold + newly-closed-key drift rows` — the continuous twin of
    * [[driftByAdjacentKeyFromStats]]; see [[applyDriftMonitorBatch]] for
    * the closure and exactly-once contracts. */
  def driftMonitorStream(
      stream: DataFrame,
      statsTable: String,
      driftTable: String,
      keyCol: Column,
      scoreCol: Column,
      labelCol: Column,
      outKeyCol: String = "key"
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch(applyDriftMonitorBatch(
        statsTable, driftTable, keyCol, scoreCol, labelCol, outKeyCol) _)

  /** GROUPED two-sample KS from keyed score-grain stats — value-identical
    * per key to [[graft.operators.Analytics.ksScoreByKey]]: per-key
    * cumulative class CDFs, one DIV per class, argmax gap with ties to
    * the smallest score; one-class keys absent. Same per-key-window
    * scale shape as [[aucByKeyFromStats]]. */
  def ksByKeyFromStats(stats: DataFrame, keyCol: String): DataFrame = {
    val s = normalizedBy(stats, keyed = true)
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

  // ----------------------------------------------------- global metrics

  /**
   * Exact ROC AUC from score-grain stats — value-identical to
   * [[Analytics.aucScore]] on the underlying entities: a score group
   * occupies ranks (C+1 … C+n] (C = exclusive cumulative count in score
   * order), so its doubled midrank is 2·cum − n + 1, and the
   * Mann–Whitney arithmetic proceeds on score-cardinality rows.
   */
  def aucFromStats(stats: DataFrame): DataFrame =
    Ranks.prefixSumsInclusiveGlobal(
      normalizedBy(stats, keyed = false),
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
    val s = normalizedBy(stats, keyed = false)
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
    val s = normalizedBy(stats, keyed = false)
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
    val s = normalizedBy(stats, keyed = false)
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
    val s = normalizedBy(stats, keyed = false)
      .withColumn("__neg", col("n") - col("pos"))
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
    val s = normalizedBy(stats, keyed = false)
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
    normalizedBy(stats, keyed = false)
      .agg(sum(col("n")).as("n_entities"), sum(term).as("__num"))
      .filter(col("n_entities") > 0L)
      .select(col("n_entities"),
        expr("CAST(__num DIV n_entities AS BIGINT)").as("brier_micro2"))
  }

  /**
   * TVD score drift from two score-grain stats frames (`pos` optional
   * and ignored — a masses-only `(__s, n)` frame is accepted) —
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
    val r = normalizedBy(refStats, keyed = false, posOptional = true)
      .drop("pos").localCheckpoint()
    val c = normalizedBy(curStats, keyed = false, posOptional = true)
      .drop("pos").localCheckpoint()
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
