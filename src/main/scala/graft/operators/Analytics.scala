package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-analytics shapes over the events stream — the product-analytics
 * queries an OLAP engine serves from the same changelog the windows/
 * sessions operators consume ([[graft.streaming.StreamingOps]] covers the
 * windowed aggregates; these are the ordered-sequence shapes).
 */
object Analytics {

  /**
   * Funnel analysis: per entity, the timestamp of each ordered step —
   * step i = the entity's FIRST event of type `steps(i)` STRICTLY AFTER
   * its step i−1 timestamp (the standard strictly-ordered funnel; equal
   * timestamps do not advance the funnel). Returns one row per entity
   * that completes ALL steps, with columns t1..tn.
   *
   * Scale shape: one filtered aggregate pass per step — each shuffles
   * (entity, ts) pairs of ONE event type, never the event payload — and
   * a per-entity join against the (entities-sized) frontier. No per-user
   * event lists are collected and no window sorts a whole user through
   * one task; cost is steps × (filtered scan + slim shuffle). This is
   * the declarative spelling a 100 TB event table needs — funnel depth
   * multiplies scans, not memory.
   */
  def funnel(
      events: DataFrame,
      entityCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    var acc = funnelHead(events, entityCol, typeCol, tsCol, steps.head)
    for ((s, i) <- steps.tail.zipWithIndex)
      acc = funnelExtend(events, entityCol, typeCol, tsCol, acc, s, i)
    acc
  }

  /** Step-1 frontier: each entity's first event of the head type. */
  private def funnelHead(
      events: DataFrame, entityCol: String, typeCol: String, tsCol: String,
      headType: String): DataFrame =
    events
      .filter(col(typeCol) === headType)
      .groupBy(col(entityCol))
      .agg(min(col(tsCol)).as("t1"))

  /** Extend a step-(i+1) frontier by step type `s` (0-based `i` over
    * `steps.tail`): first event of type `s` strictly after t(i+1). */
  private def funnelExtend(
      events: DataFrame, entityCol: String, typeCol: String, tsCol: String,
      acc: DataFrame, s: String, i: Int): DataFrame = {
    val prev = s"t${i + 1}"
    val cur = s"t${i + 2}"
    val carried = (1 to i + 1).map(j => s"t$j")
    events
      .filter(col(typeCol) === s)
      .select(col(entityCol), col(tsCol))
      .join(acc, Seq(entityCol))
      .filter(col(tsCol) > col(prev))
      .groupBy((entityCol +: carried).map(col): _*)
      .agg(min(col(tsCol)).as(cur))
  }

  /** Per-step conversion counts of the same funnel: how many entities
    * reach step 1, 2, …, n. ONE accumulation: each step's frontier is
    * materialized (localCheckpoint — entity-sized, slim), counted, and
    * extended in place, so the events table is scanned once per step —
    * not once per (step × prefix). */
  def funnelCounts(
      events: DataFrame,
      entityCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val spark = events.sparkSession
    import spark.implicits._
    var acc = funnelHead(events, entityCol, typeCol, tsCol, steps.head).localCheckpoint()
    val counts = scala.collection.mutable.ArrayBuffer((1, steps.head, acc.count()))
    for ((s, i) <- steps.tail.zipWithIndex) {
      acc = funnelExtend(events, entityCol, typeCol, tsCol, acc, s, i).localCheckpoint()
      counts += ((i + 2, s, acc.count()))
    }
    counts.toSeq.toDF("step", "event_type", "n_entities")
  }

  /**
   * Gap-based batch sessionization: a new session starts when an entity's
   * inter-event gap exceeds `gapMinutes` (strictly). Returns one row per
   * session: `(entity, session_id, session_start, session_end, n_events,
   * total_value)` with `session_id` the 1-based per-entity session index.
   *
   * `tieCol` totally orders equal timestamps within an entity so the lag
   * frontier (and therefore the session cut) is deterministic.
   *
   * Scale shape: ONE shuffle of the slim `(entity, ts, tie, value)`
   * projection; each entity's events sort within one task — the right
   * trade when per-entity event counts are bounded (human-scale streams).
   * An adversarially hot entity would route through the two-level pattern
   * of [[graft.operators.Corpus.topKPerKey]]; sessions, unlike top-k, cannot be
   * pre-aggregated per partition without a gap-aware merge, so the
   * per-entity window IS the declarative spelling.
   */
  def sessionize(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      gapMinutes: Int
  ): DataFrame = {
    val order = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val prev = lag(col(tsCol), 1).over(order)
    val cut = when(
      prev.isNull || unix_micros(col(tsCol)) - unix_micros(prev) > gapUs, 1L).otherwise(0L)
    events
      .select(col(entityCol), col(tsCol), col(tieCol), col(valueCol))
      .withColumn("session_id", sum(cut).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(entityCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("total_value"))
  }

  /**
   * Weekly retention cohorts: each entity's cohort is the Monday-truncated
   * week of its FIRST event; `n_entities` counts how many of that cohort
   * were active (≥1 event) `week_offset` weeks later. Output:
   * `(cohort_week: 'yyyy-MM-dd' string, week_offset: int, n_entities)`.
   *
   * Scale shape: distinct over the slim `(entity, week)` projection (the
   * only entity-keyed shuffle — the cohort min reuses its partitioning),
   * then a count over `(cohort, offset)` pairs in which each entity
   * appears at most once per week — so a plain `count(*)`, never a
   * `count(distinct)`, carries the cohort matrix.
   */
  def retention(
      events: DataFrame,
      entityCol: String,
      tsCol: String
  ): DataFrame = {
    val weeks = events
      .select(col(entityCol), to_date(date_trunc("week", col(tsCol))).as("w"))
      .distinct()
    val cohort = weeks.groupBy(col(entityCol)).agg(min(col("w")).as("cohort_w"))
    weeks
      .join(cohort, entityCol)
      .groupBy(
        col("cohort_w"),
        (datediff(col("w"), col("cohort_w")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_entities"))
      .select(
        date_format(col("cohort_w"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_entities"))
  }

  /**
   * Per-entity trailing-window anomaly detection: flags events whose value
   * deviates from the entity's own recent history by more than `threshold`
   * standard deviations. The window is the `lookback` events STRICTLY
   * BEFORE the current one (the event under test never contaminates its
   * own baseline), and entities with fewer than `minN` prior events emit
   * nothing (no baseline, no verdict). Returns the flagged rows with
   * `z_micro` = floor(z·1e6).
   *
   * Exactness: values quantize to integer micros (floor(v·1e6)) BEFORE
   * the window sums, so the trailing Σx and Σx² are order-free integer
   * sums (Σx² fits signed-64 for |v| ≲ 600 over 20-event windows; widen
   * the quantization grid for larger magnitudes); mean /
   * variance / z then derive from those integers through one fixed
   * double-expression tree that any engine reproduces bit-for-bit, and
   * the 1e-6 floor grid absorbs sub-ulp conversion drift.
   *
   * Scale shape: ONE shuffle of the slim (entity, ts, tie, value)
   * projection; the trailing frame is ROWS-bounded so per-row state is
   * O(lookback), never O(history).
   */
  def anomalies(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      lookback: Int,
      minN: Int,
      threshold: Double
  ): DataFrame = {
    require(lookback >= minN && minN >= 2 && threshold > 0,
      "need lookback >= minN >= 2 and a positive threshold")
    val trail = Window
      .partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback.toLong, -1L)
    val vm = floor(col(valueCol) * lit(1000000.0)).cast("long")
    val base = events
      .select(col(entityCol), col(tsCol), col(tieCol), col(valueCol), vm.as("__vm"))
      .withColumn("__n", count(col("__vm")).over(trail))
      .withColumn("__s1", sum(col("__vm")).over(trail))
      .withColumn("__s2", sum(col("__vm") * col("__vm")).over(trail))
    val nd = col("__n").cast("double")
    val mean = col("__s1").cast("double") / lit(1000000.0) / nd
    val ex2 = col("__s2").cast("double") / lit(1000000000000.0) / nd
    val varr = (ex2 - mean * mean) * nd / (nd - lit(1.0))
    val z = (col("__vm").cast("double") / lit(1000000.0) - mean) / sqrt(varr)
    base
      .withColumn("__var", varr)
      .withColumn("z_micro", floor(z * lit(1000000.0)).cast("long"))
      .filter(col("__n") >= minN && col("__var") > 0.0 &&
        abs(col("z_micro")) > (threshold * 1e6).toLong)
      .select(col(entityCol), col(tsCol), col(tieCol), col(valueCol), col("z_micro"))
  }

  /**
   * Rolling active-entity counts: for every observed day, the number of
   * distinct entities active that day (DAU) and within the trailing
   * `windowDays` days (WAU/MAU by parameter) — EXACT sliding distinct
   * counts without any sliding-window state: each (entity, day) presence
   * CONTRIBUTES to the `windowDays` days it keeps the entity active for,
   * and the rolling count is then a plain per-day count of distinct
   * contributions. Output: `(day 'yyyy-MM-dd', dau, rolling_active)` over
   * days that have at least one event.
   *
   * Scale shape: one distinct over the slim (entity, day) projection (the
   * only event-sized shuffle), then a ≤ windowDays× expansion of that
   * DAY-GRAINED frame and two plain counts — the classic trick that turns
   * "count distinct over every trailing window" (quadratic re-scan or a
   * giant state store) into linear work.
   */
  def rollingActiveUsers(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      windowDays: Int
  ): DataFrame = {
    require(windowDays >= 1, "windowDays must be at least 1")
    val ud = events
      .select(col(entityCol).as("__e"), to_date(col(tsCol)).as("day"))
      .distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val contrib = ud
      .select(col("__e"),
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1),
          expr("INTERVAL 1 DAY"))).as("day"))
      .distinct()
    val rolling = contrib.groupBy(col("day")).agg(count(lit(1)).as("rolling_active"))
    dau
      .join(rolling, Seq("day")) // inner: report only observed days
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("rolling_active"))
  }

  /**
   * Half-life-decayed popularity: per key, an exact recency-weighted
   * count where an event's weight HALVES every `halfLifeDays` relative to
   * the corpus's newest day — the "trending now" stat, with the decay on
   * an exact integer grid: weight = 10⁶ ∕ 2^floor(age∕halfLife) (floor
   * division, shift capped at `maxShift` so ancient events weigh 0), so
   * `decayed_micro` is an order-free integer sum any engine reproduces.
   * Output: `(key, n_events, decayed_micro)`.
   *
   * Scale shape: one scalar max-date aggregate, then a single map-side-
   * combinable groupBy over the slim (key, weight) projection.
   */
  def decayedPopularity(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      halfLifeDays: Int,
      maxShift: Int = 40
  ): DataFrame = {
    require(halfLifeDays >= 1 && maxShift >= 1 && maxShift <= 62,
      "need halfLifeDays >= 1 and maxShift in [1, 62]")
    val mdRow = events.agg(max(to_date(col(tsCol)))).head() // one scalar
    // no origin (empty input / all-null ts): empty result, same schema —
    // splicing a null into DATE'...' would fail to parse
    if (mdRow.isNullAt(0))
      return events.limit(0).groupBy(col(keyCol))
        .agg(count(lit(1)).as("n_events"), sum(lit(1L)).as("decayed_micro"))
    val md = mdRow.getDate(0)
    val wm = expr(
      s"1000000L DIV shiftleft(1L, least(datediff(DATE'$md', to_date(`$tsCol`))" +
        s" DIV $halfLifeDays, $maxShift))")
    events
      .filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(wm).as("decayed_micro"))
  }

  /**
   * Per-key linear trend: the OLS slope of each key's DAILY value totals
   * against the day index — "is this stream's volume drifting, and how
   * fast" as a number instead of a chart. Returns `(key, n_days,
   * slope_micro_per_day)`; keys with fewer than 2 observed days (or zero
   * x-variance) are dropped.
   *
   * Exactness: daily totals quantize to integer micros, the five OLS
   * sums (n, Σx, Σy, Σxy, Σx²) are order-free integer aggregates, and the
   * slope derives from them through one fixed double-expression tree —
   * floor(·) onto the micro grid makes the result engine-exact.
   *
   * Scale shape: one (key, day) pre-aggregate is the only event-sized
   * shuffle; the OLS sums run over day-grained rows.
   */
  def trendSlopes(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val d0Row = events.agg(min(to_date(col(tsCol)))).head() // one scalar origin
    // no origin (empty input / all-null ts): empty result, same schema
    if (d0Row.isNullAt(0))
      return events.limit(0).groupBy(col(keyCol))
        .agg(count(lit(1)).as("n_days"), sum(lit(1L)).as("slope_micro_per_day"))
    val d0 = d0Row.getDate(0)
    val daily = events
      .filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .agg(sum(floor(col(valueCol) * lit(1000000.0)).cast("long")).as("__y"))
      .withColumn("__x", datediff(col("__day"), lit(d0)).cast("long"))
    val s = daily.groupBy(col(keyCol)).agg(
      count(lit(1)).as("__n"),
      sum(col("__x")).as("__sx"),
      sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"))
    val nd = col("__n").cast("double")
    val num = nd * col("__sxy").cast("double") - col("__sx").cast("double") * col("__sy").cast("double")
    val den = nd * col("__sxx").cast("double") - col("__sx").cast("double") * col("__sx").cast("double")
    s.withColumn("__den", den)
      .filter(col("__n") >= 2 && col("__den") =!= 0.0)
      .select(col(keyCol), col("__n").as("n_days"),
        floor(num / col("__den")).cast("long").as("slope_micro_per_day"))
  }

  /**
   * Pearson chi-square test of independence between two categorical
   * columns (full contingency grid, zero cells included): "does event mix
   * depend on the day of week" answered with a test statistic instead of
   * eyeballing. Returns ONE row `(n, dof, chi2_micro)`.
   *
   * Exactness: observed counts are integers; each cell's
   * (o−e)²∕e term (e = row·col∕N in double, fixed expression tree) floors
   * onto the 1e-6 grid BEFORE the cross-cell sum, so the statistic is an
   * order-free integer sum — engine-exact, and therefore usable as a
   * reproducible drift GATE, not just a report.
   *
   * Scale shape: one (a, b) count is the only data-sized aggregate; the
   * grid is |a|·|b| cells (categories, not rows).
   */
  def chiSquareIndependence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val o = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("__o"))
    val ra = o.groupBy(col(aCol)).agg(sum(col("__o")).as("__ra"))
    val cb = o.groupBy(col(bCol)).agg(sum(col("__o")).as("__cb"))
    val tot = o.agg(sum(col("__o")).as("__t"))
    val grid = ra.select(col(aCol)).crossJoin(cb.select(col(bCol)))
      .join(o, Seq(aCol, bCol), "left")
      .select(col(aCol), col(bCol), coalesce(col("__o"), lit(0L)).as("__o"))
      .join(ra, Seq(aCol)).join(cb, Seq(bCol)).crossJoin(tot)
    val e = col("__ra").cast("double") * col("__cb").cast("double") / col("__t").cast("double")
    val od = col("__o").cast("double")
    val term = floor((od - e) * (od - e) / e * lit(1000000.0)).cast("long")
    grid
      .select(term.as("__term"), col("__t"))
      .groupBy(col("__t"))
      .agg(sum(col("__term")).as("chi2_micro"))
      .crossJoin(ra.agg(count(lit(1)).as("__na")))
      .crossJoin(cb.agg(count(lit(1)).as("__nb")))
      .select(col("__t").as("n"),
        ((col("__na") - 1L) * (col("__nb") - 1L)).as("dof"),
        col("chi2_micro"))
  }

  /**
   * Two-sample Kolmogorov–Smirnov statistic: the max CDF gap between two
   * groups' value distributions — "did the value distribution shift"
   * with NO floating point anywhere: values quantize to integer micros,
   * and D's numerator max|n₂·cum₁ − n₁·cum₂| is pure integer arithmetic
   * (D itself = d_num ∕ (n₁·n₂); `d_micro` reports it on the micro grid
   * via floor division). Returns ONE row `(n1, n2, d_num, d_micro)`.
   *
   * Scale shape: one (micro-value) count aggregate is the data-sized
   * step; the cumulative pass over the DISTINCT-value axis runs through
   * the range-partitioned [[Ranks.prefixSumsInclusiveGlobal]] — for
   * continuous-valued data distinct micros ≈ n, so the axis is NOT
   * bounded and must never ride a single-partition window (the same
   * machinery its sibling [[ksScore]] uses).
   */
  def ksTest(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      groupA: String,
      groupB: String
  ): DataFrame = {
    require(groupA != groupB, "need two distinct groups")
    val s = df
      .filter(col(groupCol).isin(groupA, groupB) && col(valueCol).isNotNull)
      .select(
        floor(col(valueCol) * lit(1000000.0)).cast("long").as("__vm"),
        when(col(groupCol) === groupA, 1L).otherwise(0L).as("__ia"),
        when(col(groupCol) === groupB, 1L).otherwise(0L).as("__ib"))
    val counts = s.groupBy(col("__vm"))
      .agg(sum(col("__ia")).as("__c1"), sum(col("__ib")).as("__c2"))
    val tot = broadcast(counts.agg(
      sum(col("__c1")).as("__n1"), sum(col("__c2")).as("__n2")))
    Ranks.prefixSumsInclusiveGlobal(
      counts, col("__vm"), Seq("__c1", "__c2"), Seq("__cum1", "__cum2"))
      .crossJoin(tot)
      .groupBy(col("__n1"), col("__n2"))
      .agg(max(abs(col("__n2") * col("__cum1") - col("__n1") * col("__cum2"))).as("d_num"))
      .select(col("__n1").as("n1"), col("__n2").as("n2"), col("d_num"),
        expr("(d_num * 1000000L) DIV (__n1 * __n2)").as("d_micro"))
  }

  /**
   * Two-proportion z-test for an A/B experiment: input is one row per
   * entity with its variant and a 0/1 conversion flag; output is ONE row
   * `(n_a, conv_a, n_b, conv_b, lift_micro, z_micro)` — the pooled-SE
   * z statistic on the 1e-6 floor grid (conversion counts are exact
   * integers; the z derives through one fixed double-expression tree).
   *
   * Scale shape: one groupBy over two variant keys — nothing beyond the
   * per-entity input ever aggregates.
   */
  def abTestZ(
      perEntity: DataFrame,
      variantCol: String,
      convertedCol: String,
      variantA: String,
      variantB: String
  ): DataFrame = {
    require(variantA != variantB, "need two distinct variants")
    val agg = perEntity
      .filter(col(variantCol).isin(variantA, variantB))
      .agg(
        sum(when(col(variantCol) === variantA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(variantCol) === variantA, col(convertedCol).cast("long"))
          .otherwise(0L)).as("conv_a"),
        sum(when(col(variantCol) === variantB, 1L).otherwise(0L)).as("n_b"),
        sum(when(col(variantCol) === variantB, col(convertedCol).cast("long"))
          .otherwise(0L)).as("conv_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = col("conv_a").cast("double") / na
    val pb = col("conv_b").cast("double") / nb
    val pool = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pool * (lit(1.0) - pool) * (lit(1.0) / na + lit(1.0) / nb))
    agg.select(
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      floor((pa - pb) * lit(1000000.0)).cast("long").as("lift_micro"),
      // degenerate experiments (everyone or no one converts) have SE = 0:
      // z is undefined, not infinite — report NULL instead of erroring
      // under ANSI division
      when(se > lit(0.0), floor((pa - pb) / se * lit(1000000.0)).cast("long"))
        .otherwise(lit(null).cast("long")).as("z_micro"))
  }

  /**
   * Last-touch attribution: for every CONVERSION event, the most recent
   * STRICTLY PRECEDING touch event (any of `touchTypes`) by the same
   * entity — the credit-assignment query behind marketing/referral
   * analytics. Conversions with no prior touch are dropped. Returns
   * `(entity, conversion_ts, tie, touch_type, touch_ts, lag_us)` with
   * `lag_us` the exact microsecond gap.
   *
   * Scale shape: ONE shuffle of the slim (entity, ts, tie, type)
   * projection; the carried-forward touch is a running `last(_, ignore
   * nulls)` over a ROWS frame ending at 1 PRECEDING — O(1) state per row,
   * no self-join of the events table.
   */
  def lastTouchAttribution(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      conversionType: String,
      touchTypes: Seq[String]
  ): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      "need touch types disjoint from the conversion type")
    val w = Window
      .partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val isTouch = col(typeCol).isin(touchTypes.map(_.asInstanceOf[Any]): _*)
    events
      .select(col(entityCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("touch_type",
        last(when(isTouch, col(typeCol)), ignoreNulls = true).over(w))
      .withColumn("touch_ts",
        last(when(isTouch, col(tsCol)), ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType && col("touch_type").isNotNull)
      .select(
        col(entityCol),
        col(tsCol).as("conversion_ts"),
        col(tieCol),
        col("touch_type"),
        col("touch_ts"),
        (unix_micros(col(tsCol)) - unix_micros(col("touch_ts"))).as("lag_us"))
  }

  /**
   * Top session paths: the first `depth` event types of each session
   * (same strict-gap session cut as [[sessionize]]), joined " > ", counted
   * across all sessions — "how do users start a session" as a ranked
   * path table. Returns `(path, n_sessions)`, top `topK` by count
   * (total-ordered: count desc, then path).
   *
   * Scale shape: ONE shuffle of the slim (entity, ts, tie, type)
   * projection (shared with sessionize — per-entity windows); the
   * per-session collect is capped at `depth` elements, and the path count
   * is a map-side-combinable groupBy over path strings.
   */
  def sessionPaths(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      gapMinutes: Int,
      depth: Int,
      topK: Int
  ): DataFrame = {
    require(depth >= 1 && topK >= 1, "need depth >= 1 and topK >= 1")
    val order = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val prev = lag(col(tsCol), 1).over(order)
    val cut = when(
      prev.isNull || unix_micros(col(tsCol)) - unix_micros(prev) > gapUs, 1L).otherwise(0L)
    val sess = events
      .select(col(entityCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("__sid", sum(cut).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val inSess = Window.partitionBy(col(entityCol), col("__sid"))
      .orderBy(col(tsCol), col(tieCol))
    sess
      .withColumn("__rn", row_number().over(inSess))
      .filter(col("__rn") <= depth)
      .groupBy(col(entityCol), col("__sid"))
      .agg(sort_array(collect_list(struct(col("__rn"), col(typeCol)))).as("__steps"))
      .select(array_join(
        transform(col("__steps"), s => s.getField(typeCol)), " > ").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topK)
  }

  /**
   * Weekly cohort value curves (LTV): cohort = the entity's first-event
   * week (Monday-truncated, ISO on both engines); age = whole weeks from
   * the cohort week to the event's week. Output per (cohort_week,
   * age_weeks): active entities, the week's value total, and the
   * cohort's CUMULATIVE value through that age — the "revenue per cohort
   * over time" dashboard table. Week totals are exact decimal sums
   * (order-free); the cumulative column stays decimal through the window
   * and both render as doubles, so any engine reproduces them
   * bit-for-bit.
   *
   * Scale shape: one entity-keyed aggregate for first events, a join
   * back on the SAME key (one shuffle partitioning serves both), then a
   * (cohort, age)-grained aggregate — dimension-sized — and a cumulative
   * window over each cohort's week series (calendar-bounded, never
   * event-sized).
   */
  def cohortLtv(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val firsts = events.filter(col(tsCol).isNotNull)
      .groupBy(col(entityCol)).agg(min(col(tsCol)).as("__f"))
    val weekly = events.filter(col(tsCol).isNotNull)
      .join(firsts, Seq(entityCol))
      .select(
        col(entityCol),
        to_date(date_trunc("week", col("__f"))).as("cohort_week"),
        to_date(date_trunc("week", col(tsCol))).as("__ew"),
        col(valueCol).cast("decimal(18,6)").as("__v"))
      .withColumn("age_weeks",
        (datediff(col("__ew"), col("cohort_week")) / lit(7)).cast("long"))
      .groupBy(col("cohort_week"), col("age_weeks"))
      .agg(
        count_distinct(col(entityCol)).as("n_active"),
        sum(col("__v")).cast("decimal(38,6)").as("__wv"))
    weekly
      .withColumn("__cum",
        sum(col("__wv")).over(
          Window.partitionBy(col("cohort_week")).orderBy(col("age_weeks"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(
        // rendered as a string so every engine prints the week identically
        date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("age_weeks"), col("n_active"),
        col("__wv").cast("double").as("week_value"),
        col("__cum").cast("double").as("cum_value"))
  }

  /**
   * Time-weighted average value per key (TWAP): step-function
   * interpolation — each event's value holds until the key's NEXT event;
   * the average weighs values by exact whole-second hold durations over
   * [first_ts, last_ts]. Keys with < 2 events (or an all-sub-second span)
   * are dropped. Output: `(key, n_events, span_s, twap_micro)` — all
   * integers (values on the micro grid, durations floor-divided to
   * seconds, one final floor division), engine-exact. Requires
   * NON-NEGATIVE values (enforced: negative-value events are excluded up
   * front) — the final `DIV` truncates toward zero while a floor-division
   * engine would floor, so a negative weighted sum would diverge by one
   * grid unit between engines.
   *
   * Scale shape: ONE shuffle of the slim (key, ts, tie, value)
   * projection; the lead() frontier is O(1) per row; the weighted sums
   * are a map-side-combinable groupBy. Bound: Σ(v_micro·dur_s) must stay
   * under 2^63 — ~10¹² value-seconds of micro mass; quantize coarser for
   * larger spans.
   */
  def twap(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String
  ): DataFrame = {
    val order = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull && col(valueCol) >= 0)
      .select(col(keyCol), col(tsCol), col(tieCol),
        floor(col(valueCol) * lit(1000000.0)).cast("long").as("__vm"))
      .withColumn("__next", lead(col(tsCol), 1).over(order))
      .filter(col("__next").isNotNull) // the last event holds nothing
      .withColumn("__dur_s",
        expr(s"(unix_micros(__next) - unix_micros(`$tsCol`)) DIV 1000000L"))
      .groupBy(col(keyCol))
      .agg(
        (count(lit(1)) + lit(1L)).as("n_events"), // +1: the dropped last event
        sum(col("__dur_s")).as("span_s"),
        sum(col("__vm") * col("__dur_s")).as("__wsum"))
      .filter(col("span_s") > 0L)
      .select(col(keyCol), col("n_events"), col("span_s"),
        expr("__wsum DIV span_s").as("twap_micro"))
  }

  /**
   * Market-basket co-occurrence (support / confidence / lift): item pairs
   * that appear together in at least `minSupport` baskets, with exact
   * integer counts and confidence/lift on the 1e-6 floor-division grid —
   * the association-rule primitive behind "frequently bought together" /
   * co-view analytics.
   *
   * Exactness: all counts are integers; `conf_ab_micro` = 10⁶·c_ab ∕ c_a
   * and `lift_micro` = 10⁶·n·c_ab ∕ (c_a·c_b) use integer floor division
   * (engine-exact; products stay in signed-64 for n·c_ab < 9.2e12 —
   * beyond that, drop to the double path).
   *
   * Scale shape: one distinct over the slim (basket, item) projection,
   * then a basket-keyed self-join whose fan-out is bounded by per-basket
   * item counts (baskets are human-scale — orders, sessions), never by
   * corpus size; the pair aggregate shuffles (item, item) pairs; item
   * totals join at item-cardinality; the scalar basket count broadcasts.
   */
  def coOccurrence(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long
  ): DataFrame = {
    require(minSupport >= 1, "minSupport must be at least 1")
    val items = basketItems(df, basketCol, itemCol)
    val totals = items.agg(count_distinct(col("__b")).as("__n"))
    val itemCounts = items.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val pairs = basketPairs(items).filter(col("pair_count") >= minSupport)
    pairs
      .join(itemCounts.select(col("__i").as("item_a"), col("__c").as("__ca")), Seq("item_a"))
      .join(itemCounts.select(col("__i").as("item_b"), col("__c").as("__cb")), Seq("item_b"))
      .crossJoin(broadcast(totals))
      .select(
        col("item_a"), col("item_b"), col("pair_count"),
        col("__ca").as("count_a"), col("__cb").as("count_b"),
        expr("(pair_count * 1000000L) DIV __ca").as("conf_ab_micro"),
        expr("(pair_count * 1000000L * __n) DIV (__ca * __cb)").as("lift_micro"))
  }

  /** The distinct (basket, item) projection [[coOccurrence]] and the
    * basket-table maintenance share. */
  private def basketItems(df: DataFrame, basketCol: String, itemCol: String): DataFrame =
    df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).cast("string").as("__i"))
      .distinct()

  /** Pair counts of a (b, i) frame — the additive core of the basket
    * tables: per-basket self-join, (item, item)-keyed aggregate. */
  private def basketPairs(items: DataFrame): DataFrame =
    items.as("l")
      .join(items.as("r"), col("l.__b") === col("r.__b") && col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("item_a"), col("r.__i").as("item_b"))
      .agg(count(lit(1)).as("pair_count"))

  /** One batch's delta rows for the [[materializeBasketTables]] fact
    * table: the batch's aggregated pair counts (kind='pair'), item counts
    * (kind='item'), and basket-id guard rows (kind='basket', basket cast
    * to string in `a`) — all in ONE frame so an append is ONE commit. */
  private def basketFactRows(items: DataFrame): DataFrame =
    basketPairs(items)
      .select(lit("pair").as("kind"), col("item_a").as("a"), col("item_b").as("b"),
        col("pair_count").as("n"))
      .unionByName(items.groupBy(col("__i")).agg(count(lit(1)).as("n"))
        .select(lit("item").as("kind"), col("__i").as("a"),
          lit(null).cast("string").as("b"), col("n")))
      .unionByName(items.select(col("__b").cast("string")).distinct()
        .select(lit("basket").as("kind"), col("__b").as("a"),
          lit(null).cast("string").as("b"), lit(1L).as("n")))

  /**
   * Materialize the maintained market-basket state as ONE appendable fact
   * table `{table}_facts` (kind, a, b, n): kind='pair' rows carry
   * per-batch pair-count deltas, kind='item' rows per-batch item-count
   * deltas, and kind='basket' rows the seen basket ids (the idempotence
   * guard). Keeping all three record kinds in a single table is what makes
   * [[appendToBasketTables]] a SINGLE atomic commit — there is no ordering
   * of table swaps for a crash to land between (the defect class of a
   * pairs → items → guard sequence: a crash after the count merges but
   * before the guard insert lets a retry double-count the batch), and a
   * reader can never see pair and item counts from different generations.
   *
   * [[appendToBasketTables]] folds new WHOLE baskets in O(batch);
   * [[basketStats]] derives support/confidence/lift identical to a fresh
   * [[coOccurrence]] over the full history (counts are additive over
   * disjoint baskets — the append entry shares the from-scratch oracle);
   * [[compactBasketTables]] folds accumulated delta generations into one.
   */
  def materializeBasketTables(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      table: String
  ): Unit = {
    val items = basketItems(df, basketCol, itemCol).localCheckpoint()
    Bucketing.materializePlain(basketFactRows(items), s"${table}_facts")
  }

  /** Fold new baskets into [[materializeBasketTables]] state with ONE
    * idempotent commit: already-seen basket ids anti-join away against the
    * table's kind='basket' rows (a column-pruned scan), and the batch's
    * pair deltas, item deltas, and guard rows land in a single insertInto.
    * A crash before the insert commits nothing; after it, everything — a
    * retry either re-appends the whole batch (pre-crash) or anti-joins it
    * entirely away (post-crash). Per-tick cost: O(batch) compute + one
    * append — history is never re-paired. Baskets must arrive WHOLE (all
    * items in one batch); a split basket would miss its cross-batch pairs,
    * same contract as any transactional rollup. */
  def appendToBasketTables(
      batch: DataFrame,
      basketCol: String,
      itemCol: String,
      table: String
  ): Unit = {
    val spark = batch.sparkSession
    val known = spark.table(s"${table}_facts")
      .filter(col("kind") === "basket").select(col("a").as("__bs"))
    val items = basketItems(batch, basketCol, itemCol)
      .withColumn("__bs", col("__b").cast("string"))
      .join(known, Seq("__bs"), "left_anti")
      .drop("__bs")
      .localCheckpoint()
    basketFactRows(items)
      .select(spark.table(s"${table}_facts").columns.map(col).toSeq: _*)
      .write.insertInto(s"${table}_facts")
  }

  /** Rewrite the fact table with its delta generations folded (pair/item
    * rows summed per key, guard rows deduped) — read-side maintenance when
    * many appends have accumulated; stats are identical before and after.
    * Rides the staged [[Bucketing.swapInPlain]]: a crash at any point
    * leaves either the old or the folded table, never neither. */
  def compactBasketTables(
      spark: org.apache.spark.sql.SparkSession,
      table: String
  ): Unit = {
    Bucketing.recoverSwap(spark, s"${table}_facts")
    val folded = spark.table(s"${table}_facts")
      .groupBy(col("kind"), col("a"), col("b"))
      .agg(sum(col("n")).as("n"))
      .select(col("kind"), col("a"), col("b"),
        when(col("kind") === "basket", lit(1L)).otherwise(col("n")).as("n"))
    Bucketing.swapInPlain(folded, s"${table}_facts")
  }

  /** Support/confidence/lift from the maintained basket fact table — the
    * same output (and integer grid) as a fresh [[coOccurrence]] over
    * everything the table has absorbed. Reads ONE localCheckpointed
    * snapshot of the single table, so the pair counts, item counts, and
    * basket total always come from the same generation even under a
    * concurrent append. */
  def basketStats(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      minSupport: Long
  ): DataFrame = {
    require(minSupport >= 1, "minSupport must be at least 1")
    val facts = spark.table(s"${table}_facts").localCheckpoint()
    val totals = facts.filter(col("kind") === "basket").agg(count(lit(1)).as("__n"))
    val itemCounts = facts.filter(col("kind") === "item")
      .groupBy(col("a").as("item")).agg(sum(col("n")).as("c"))
    facts.filter(col("kind") === "pair")
      .groupBy(col("a").as("item_a"), col("b").as("item_b"))
      .agg(sum(col("n")).as("pair_count"))
      .filter(col("pair_count") >= minSupport)
      .join(itemCounts.select(col("item").as("item_a"), col("c").as("__ca")), Seq("item_a"))
      .join(itemCounts.select(col("item").as("item_b"), col("c").as("__cb")), Seq("item_b"))
      .crossJoin(broadcast(totals))
      .select(
        col("item_a"), col("item_b"), col("pair_count"),
        col("__ca").as("count_a"), col("__cb").as("count_b"),
        expr("(pair_count * 1000000L) DIV __ca").as("conf_ab_micro"),
        expr("(pair_count * 1000000L * __n) DIV (__ca * __cb)").as("lift_micro"))
  }

  /**
   * Per-key EWMA of DAILY value totals with a dyadic smoothing factor
   * α = 1∕2^k: e₀ = y₀, e_t = (y_t + (2^k−1)·e_{t−1}) >> k over the key's
   * observed days in order — the "current level" stat behind smoothed
   * dashboards and drift baselines, with the whole recurrence in integer
   * arithmetic (values quantize to micros; the arithmetic right-shift IS
   * the floor division by 2^k, for negative levels too), so any engine
   * reproduces it bit-for-bit. The fold seeds from the first element via
   * element_at/slice (no sentinel), so negative daily totals fold
   * correctly rather than silently re-seeding mid-series.
   * Output: `(key, n_days, ewma_micro)`.
   *
   * Scale shape: the (key, day) pre-aggregate is the only event-sized
   * shuffle; the fold runs over each key's DAY-GRAINED series (bounded by
   * calendar length, not data size) inside one codegen'd HOF.
   */
  def ewmaDaily(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1 && k <= 20, "k (alpha = 1/2^k) must lie in [1, 20]")
    val mul = (1L << k) - 1L
    events
      .filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .agg(sum(floor(col(valueCol) * lit(1000000.0)).cast("long")).as("__y"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("__day"), col("__y")))).as("__seq"))
      .select(col(keyCol),
        transform(col("__seq"), s => s.getField("__y")).as("__ys"))
      .select(
        col(keyCol),
        size(col("__ys")).cast("long").as("n_days"),
        aggregate(
          slice(col("__ys"), lit(2), size(col("__ys")) - 1),
          element_at(col("__ys"), 1), // the first day seeds the level
          (acc, y) => shiftright(y + lit(mul) * acc, k)
        ).as("ewma_micro"))
  }

  /**
   * Rank normalization per key — the ML-feature-prep transform that maps
   * each value to its within-key percentile rank on the 1e-6 grid
   * (min → 0, max → 10⁶; single-row keys → 0) plus an exact equi-depth
   * bucket id in [0, nBuckets): `((rank−1)·nBuckets) DIV n`. All integer
   * arithmetic over row_number ranks, so any engine reproduces it;
   * `tieCol` totally orders equal values.
   *
   * Scale shape: ONE shuffle of the slim (key, tie, value) projection;
   * each key sorts within one task (bounded per-key cardinality — the
   * sessionize trade); the count rides the same partitioning.
   */
  def rankNormalize(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      tieCol: String,
      nBuckets: Int = 4
  ): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be at least 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(valueCol), col(tieCol))
    df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(tieCol), col(valueCol))
      .withColumn("__rank", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .select(col(keyCol), col(tieCol), col(valueCol),
        when(col("__n") > 1L, expr("((__rank - 1) * 1000000L) DIV (__n - 1)"))
          .otherwise(lit(0L)).as("pct_micro"),
        expr(s"((__rank - 1) * ${nBuckets}L) DIV __n").as("bucket"))
  }

  /**
   * Per-key robust statistics (Tukey's winsorized/trimmed estimators):
   * exact rank-based p% clamping — lo = the value at rank ⌈p·n∕100⌉, hi =
   * the value at rank n+1−⌈p·n∕100⌉ (row_number over (value, tie), so
   * ties are totally ordered) — returning division-free micro-grid SUMS:
   * `(key, n_rows, sum_micro, winsor_sum_micro, trimmed_n,
   * trimmed_sum_micro)`. Sums of longs are order-free and exact for
   * negative values too (no DIV-vs-floor hazard); consumers divide at
   * display time. The outlier-robust summary a telemetry pipeline wants
   * when a single 10⁹ reading would drag the plain mean.
   *
   * Scale shape: ONE shuffle of the slim (key, tie, value) projection;
   * ranks and the clamp bounds ride the same per-key partitioning
   * (bounded per-key cardinality — the [[rankNormalize]] trade), and the
   * final aggregate is map-side combinable.
   */
  def robustStats(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      tieCol: String,
      trimPct: Int
  ): DataFrame = {
    require(trimPct >= 1 && trimPct <= 25, "trimPct must lie in [1, 25]")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(valueCol), col(tieCol))
    val ranked = df
      .filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(tieCol), col(valueCol),
        floor(col(valueCol) * lit(1000000.0)).cast("long").as("__v"))
      .withColumn("__rank", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .withColumn("__lor", expr(s"(__n * ${trimPct}L + 99L) DIV 100L"))
      .withColumn("__hir", expr("__n + 1 - __lor"))
    val bounds = ranked.groupBy(col(keyCol)).agg(
      max(when(col("__rank") === col("__lor"), col("__v"))).as("__lo"),
      max(when(col("__rank") === col("__hir"), col("__v"))).as("__hi"))
    ranked
      .join(bounds, Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("__v")).as("sum_micro"),
        sum(greatest(col("__lo"), least(col("__hi"), col("__v"))))
          .as("winsor_sum_micro"),
        sum(when(col("__rank").between(col("__lor"), col("__hir")), lit(1L))
          .otherwise(lit(0L))).as("trimmed_n"),
        coalesce(sum(when(col("__rank").between(col("__lor"), col("__hir")),
          col("__v"))), lit(0L)).as("trimmed_sum_micro"))
  }

  /**
   * Per-key Gini coefficient (Gini 1912) of a non-negative value column —
   * the inequality/concentration stat ("does 1% of users drive 90% of
   * revenue") that pairs with [[Profile.categoryEntropy]]'s diversity
   * view. Exact rank form: G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) ∕ (n·Σx) over
   * ascending ranks i (ties totally ordered by `tieCol`) — every term an
   * exact BIGINT product on the micro grid, one floor division at the
   * end: `gini_micro = num DIV max(den DIV 10⁶, 1)` — the DENOMINATOR
   * pre-divides onto the grid, so no operand ever multiplies by 10⁶ (a
   * num·10⁶ spelling overflows 2^63 as soon as n·Σx_micro passes 9.2e12).
   * Negative values are excluded (Gini is undefined there); keys with
   * Σx = 0 report 0.
   *
   * Scale shape: one shuffle of the slim (key, tie, value) projection;
   * ranks ride the per-key partitioning; the fold is map-side
   * combinable. Operand bound: n·Σx_micro below 2^63.
   */
  def giniByKey(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      tieCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(valueCol), col(tieCol))
    df.filter(col(valueCol).isNotNull && col(valueCol) >= 0)
      .select(col(keyCol), col(tieCol), col(valueCol),
        floor(col(valueCol) * lit(1000000.0)).cast("long").as("__v"))
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("__v")).as("sum_micro"),
        sum(col("__i") * col("__v")).as("__ix"))
      .withColumn("gini_micro",
        when(col("sum_micro") > 0L,
          expr("""(2L * __ix - (n_rows + 1L) * sum_micro)
                 DIV greatest((n_rows * sum_micro) DIV 1000000L, 1L)"""))
          .otherwise(lit(0L)))
      .select(col(keyCol), col("n_rows"), col("sum_micro"), col("gini_micro"))
  }

  /**
   * Holt linear (double-exponential) smoothing of DAILY value totals with
   * dyadic factors α = 1∕2^k (level) and β = 1∕2^j (trend):
   * l₀ = y₀, t₀ = 0, then per observed day
   * l = (y + (2^k−1)·(l′+t′)) >> k and t = ((l−l′) + (2^j−1)·t′) >> j —
   * the trend-aware sibling of [[ewmaDaily]], giving level, trend, and an
   * h-day linear forecast per key, with the whole two-state recurrence in
   * integer arithmetic (arithmetic right-shift IS floor division by 2^n
   * for negative trends on both engines). Requires non-negative values.
   * Output: `(key, n_days, level_micro, trend_micro, forecast_micro)`.
   *
   * Scale shape: identical to [[ewmaDaily]] — one (key, day) pre-aggregate,
   * then a codegen'd struct fold over day-grained series.
   */
  def holtDaily(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      k: Int,
      j: Int,
      forecastDays: Int
  ): DataFrame = {
    require(k >= 1 && k <= 20 && j >= 1 && j <= 20 && forecastDays >= 0,
      "need k, j in [1, 20] (alpha = 1/2^k, beta = 1/2^j) and forecastDays >= 0")
    val mulK = (1L << k) - 1L
    val mulJ = (1L << j) - 1L
    val seq = events
      .filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .agg(sum(floor(col(valueCol) * lit(1000000.0)).cast("long")).as("__y"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("__day"), col("__y")))).as("__seq"))
      .select(col(keyCol), transform(col("__seq"), s => s.getField("__y")).as("__ys"))
    seq
      .select(
        col(keyCol),
        size(col("__ys")).cast("long").as("n_days"),
        aggregate(
          slice(col("__ys"), lit(2), size(col("__ys")) - 1),
          struct(element_at(col("__ys"), 1).as("l"), lit(0L).as("t")),
          (acc, y) => {
            val l = shiftright(y + lit(mulK) * (acc.getField("l") + acc.getField("t")), k)
            struct(
              l.as("l"),
              shiftright((l - acc.getField("l")) + lit(mulJ) * acc.getField("t"), j).as("t"))
          }
        ).as("__h"))
      .select(col(keyCol), col("n_days"),
        col("__h.l").as("level_micro"),
        col("__h.t").as("trend_micro"),
        (col("__h.l") + lit(forecastDays.toLong) * col("__h.t")).as("forecast_micro"))
  }

  /**
   * One-sided CUSUM drift detection over DAILY value totals (Page 1954):
   * per key, S₀ = 0 and S = max(0, S′ + y − μ − slack) over the observed
   * days in order, with μ the key's own mean daily total (integer floor)
   * and the alarm threshold a percentage of μ — "has this stream's volume
   * drifted UP from its own baseline, when, and how hard", as integers an
   * engine can replay. Requires NON-NEGATIVE values (enforced:
   * negative-value events are excluded up front) — μ = Σy ∕ n uses `DIV`,
   * which truncates toward zero, while a floor-division engine floors, so
   * a negative daily-total sum would put the two engines one grid unit
   * apart. Output: `(key, n_days, mu_micro, final_s, max_s,
   * n_alarms)` where `n_alarms` counts days with S > threshold.
   *
   * Scale shape: identical to [[ewmaDaily]]/[[holtDaily]] — one (key,
   * day) pre-aggregate, then a codegen'd three-state struct fold over
   * day-grained series.
   */
  def cusumDaily(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      thresholdPctOfMu: Int,
      slackMicro: Long = 0L
  ): DataFrame = {
    require(thresholdPctOfMu >= 1 && slackMicro >= 0L,
      "need thresholdPctOfMu >= 1 and slackMicro >= 0")
    val agg0 = events
      .filter(col(tsCol).isNotNull && col(valueCol) >= 0)
      .groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .agg(sum(floor(col(valueCol) * lit(1000000.0)).cast("long")).as("__y"))
      .groupBy(col(keyCol))
      .agg(
        sort_array(collect_list(struct(col("__day"), col("__y")))).as("__seq"),
        sum(col("__y")).as("__sy"),
        count(lit(1)).as("__n"))
      .withColumn("__mu", expr("__sy DIV __n"))
      .withColumn("__thresh", expr(s"(__mu * ${thresholdPctOfMu}L) DIV 100L"))
    agg0
      .select(
        col(keyCol),
        col("__n").as("n_days"),
        col("__mu").as("mu_micro"),
        aggregate(
          transform(col("__seq"), s => s.getField("__y")),
          struct(lit(0L).as("s"), lit(0L).as("mx"), lit(0L).as("al")),
          (acc, y) => {
            val s = greatest(lit(0L),
              acc.getField("s") + y - col("__mu") - lit(slackMicro))
            struct(
              s.as("s"),
              greatest(acc.getField("mx"), s).as("mx"),
              (acc.getField("al") +
                when(s > col("__thresh"), lit(1L)).otherwise(lit(0L))).as("al"))
          }
        ).as("__c"))
      .select(col(keyCol), col("n_days"), col("mu_micro"),
        col("__c.s").as("final_s"), col("__c.mx").as("max_s"), col("__c.al").as("n_alarms"))
  }

  /**
   * Day-of-week seasonal profile (ratio-to-mean decomposition, the static
   * sibling of the classical multiplicative X-11 step): per (key, dow),
   * the mean daily micro total and its ratio to the key's overall daily
   * mean on the 1e-6 grid — "Mondays run at 1.3× baseline". Requires
   * NON-NEGATIVE values (enforced by filter, like [[twap]]) so integer
   * `DIV` truncation coincides with the oracle's floor division; dow is
   * `epoch-days mod 7` (0 = Thursday) — engine-neutral, unlike the
   * 1-vs-0-based `dayofweek()` builtins. Keys whose total is zero get
   * factor 0. Daily totals must stay below 2^63∕10⁶ ≈ 9.2e12 micro so the
   * grid multiply cannot overflow.
   *
   * Scale shape: the (key, day) pre-aggregate is the only event-sized
   * shuffle (map-side combined); the profile and overall mean are
   * key·7-sized aggregates joined back at dimension grain.
   */
  def seasonalDowProfile(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame =
    seasonalDowProfileFromDaily(
      dailyMicroTotals(events, keyCol, tsCol, valueCol), keyCol)

  /** [[seasonalDowProfile]] over an already-built [[dailyMicroTotals]]
    * frame (columns `keyCol, day, __y, dow`) — the shared-scan form. */
  def seasonalDowProfileFromDaily(
      daily: DataFrame,
      keyCol: String
  ): DataFrame =
    // ONE scan of the daily frame: the overall mean is the dow groups'
    // own totals re-folded — Σ__t DIV Σn_days over a key-partitioned
    // window on the ≤7 rows per key — so the second daily aggregate and
    // the key-grain join it fed are gone (daily is day-grain but still
    // keys×calendar-sized at 100 TB; scanning it once matters).
    daily
      .groupBy(col(keyCol), col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("__y")).as("__t"))
      .withColumn("mean_micro", expr("__t DIV n_days"))
      .withColumn("__omean",
        expr(s"sum(__t) OVER (PARTITION BY `$keyCol`) DIV " +
          s"sum(n_days) OVER (PARTITION BY `$keyCol`)"))
      .withColumn("factor_micro",
        when(col("__omean") > 0L, expr("(mean_micro * 1000000L) DIV __omean"))
          .otherwise(lit(0L)))
      .select(col(keyCol), col("dow"), col("n_days"),
        col("mean_micro"), col("factor_micro"))

  /**
   * Seasonal outliers: each (key, day) total scored against its own
   * day-of-week mean — `ratio_micro = daily·10⁶ DIV dow_mean` — and the
   * `topK` most deviant days per key returned (|ratio − 10⁶| descending,
   * day ascending on ties). Separating "it's Sunday" from "something
   * broke": a 0.2× Sunday is normal, a 0.2× Tuesday pages someone.
   * Same non-negative-value contract as [[seasonalDowProfile]].
   *
   * Scale shape: daily totals join the key·7 profile (broadcastable);
   * the top-k window runs over day-sized rows per key, never events.
   */
  def seasonalOutliers(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      topK: Int
  ): DataFrame =
    seasonalOutliersFromDaily(
      dailyMicroTotals(events, keyCol, tsCol, valueCol), keyCol, topK)

  /** [[seasonalOutliers]] over an already-built [[dailyMicroTotals]]
    * frame — the shared-scan form. */
  def seasonalOutliersFromDaily(
      daily: DataFrame,
      keyCol: String,
      topK: Int
  ): DataFrame = {
    require(topK >= 1, "topK must be at least 1")
    val prof = daily.groupBy(col(keyCol), col("dow"))
      .agg(count(lit(1)).as("__nd"), sum(col("__y")).as("__t"))
      .select(col(keyCol), col("dow"), expr("__t DIV __nd").as("expected_micro"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(abs(col("ratio_micro") - lit(1000000L)).desc, col("day"))
    daily
      .join(prof, Seq(keyCol, "dow"))
      .withColumn("ratio_micro",
        when(col("expected_micro") > 0L,
          expr("(__y * 1000000L) DIV expected_micro")).otherwise(lit(0L)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topK)
      .select(col(keyCol), col("day"), col("dow"), col("__y").as("daily_micro"),
        col("expected_micro"), col("ratio_micro"))
  }

  /**
   * RFM segmentation (Hughes 1994's recency/frequency/monetary scoring):
   * per entity over `targetType` events — days since last activity
   * (relative to the stream's own max day), event count, and micro-grid
   * value sum — each scored into exact quintiles 1–5 by the
   * [[rankNormalize]] bucket rule `((rank−1)·5) DIV n + 1` (rank ordered
   * worst→best, ties broken by entity id), plus the composite
   * `rfm = r·100 + f·10 + m`. All integer arithmetic, so any engine
   * reproduces the scores bit-for-bit.
   *
   * Scale shape: the entity-grain aggregate is the only event-sized
   * shuffle; the three quintile ranks then run over ENTITY-sized rows
   * through the range-partitioned [[Ranks.withGlobalRank]] — exact
   * population quintiles need a total order, but never a single-task
   * sort: each pass range-partitions on its own score dimension and
   * folds bounded per-partition offsets. At truly extreme entity
   * cardinality the sketch path ([[Sketches.rankSketchQuantiles]]
   * cutoffs broadcast back) trades exactness for one pass.
   */
  def rfmSegments(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      valueCol: String,
      targetType: (String, String)
  ): DataFrame = {
    val (typeCol, typeVal) = targetType
    val base = events
      .filter(col(typeCol) === typeVal && col(tsCol).isNotNull &&
        col(entityCol).isNotNull)
      .groupBy(col(entityCol))
      .agg(
        max(to_date(col(tsCol))).as("__last"),
        count(lit(1)).as("frequency"),
        sum(coalesce(floor(col(valueCol) * lit(1000000.0)).cast("long"), lit(0L)))
          .as("monetary_micro"))
    val maxDay = base.agg(
      max(col("__last")).as("__maxd"), count(lit(1)).as("__n"))
    def score(orderBy: Seq[Column], name: String)(df: DataFrame): DataFrame =
      Ranks.withGlobalRank(df, orderBy, "__rk")
        .withColumn(name, expr("((__rk - 1) * 5) DIV __n + 1"))
        .drop("__rk")
    val scored = base
      .join(broadcast(maxDay))
      .withColumn("recency_days", datediff(col("__maxd"), col("__last")).cast("long"))
      .transform(score(Seq(col("recency_days").desc, col(entityCol)), "r_score"))
      .transform(score(Seq(col("frequency").asc, col(entityCol)), "f_score"))
      .transform(score(Seq(col("monetary_micro").asc, col(entityCol)), "m_score"))
    scored.select(
      col(entityCol), col("recency_days"), col("frequency"), col("monetary_micro"),
      col("r_score"), col("f_score"), col("m_score"),
      (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm"))
  }

  /** Shared (key, day, dow) micro-total pre-aggregate for the seasonal
    * operators: non-negative values only (floor/truncate parity), dow =
    * epoch-days mod 7. */
  /**
   * Decile lift table (gains chart) — the standard scoring-model
   * evaluation: entities ranked by score DESCENDING, cut into exact
   * population deciles by the `((rank−1)·10) DIV n + 1` bucket rule
   * (ties broken by entity id), and each decile's positive rate compared
   * to the base rate: `lift_micro = (pos_d·n·10⁶) DIV (n_d·pos_total)`.
   * All integer, so any engine reproduces the table bit-for-bit.
   *
   * Scale shape: the entity aggregate is the only input-sized shuffle;
   * the ranking runs through the range-partitioned
   * [[Ranks.withGlobalRank]] (no single-partition sort), and the decile
   * aggregate is 10 rows joined with a broadcast totals row.
   */
  def decileLift(
      scored: DataFrame,
      idCol: String,
      scoreCol: Column,
      labelCol: Column
  ): DataFrame = {
    val base = scored.select(col(idCol).as("__id"),
      scoreCol.cast("long").as("__s"),
      labelCol.cast("long").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isin(0L, 1L))
    val ranked = Ranks.withGlobalRank(
      base, Seq(col("__s").desc, col("__id")), "__r")
    val tot = broadcast(base.agg(
      count(lit(1)).as("__n"), sum(col("__y")).as("__pos")))
    ranked
      .crossJoin(tot)
      .withColumn("decile", expr("((__r - 1L) * 10L) DIV __n + 1L"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_entities"), sum(col("__y")).as("n_positive"),
        first(col("__n")).as("__n"), first(col("__pos")).as("__pos"))
      .filter(col("__pos") > 0L)
      .withColumn("lift_micro",
        expr("(n_positive * __n * 1000000L) DIV (n_entities * __pos)"))
      .select(col("decile"), col("n_entities"), col("n_positive"),
        col("lift_micro"))
  }

  /**
   * CATEGORICAL distribution drift — the nominal-column sibling of
   * [[scoreDriftTvd]]/PSI for monitoring mix shift (device, country,
   * event type, label source): each category's share in the reference
   * vs the current sample, with the TVD gap (integer, 1e-6 grid, one
   * DIV per side) and the PSI term (zero counts floored to 1 — the
   * standard guard for categories one side never saw; the
   * `(p_cur−p_ref)·ln(p_cur∕p_ref)` term rides ONE fixed double tree
   * floored to micros, the engine-exactness doctrine). Σgap∕2 is the
   * TVD; Σpsi is the PSI. Null categories are dropped (they are a data
   * -quality read, not a distribution mass).
   *
   * Scale shape: two category-grain aggregates, one full-outer join on
   * category-cardinality rows, two broadcast totals — nothing row-sized
   * past the first aggregate.
   */
  def categoricalDrift(
      reference: DataFrame,
      current: DataFrame,
      catCol: String
  ): DataFrame = {
    def masses(df: DataFrame, out: String) = df
      .select(col(catCol).cast("string").as("category"))
      .filter(col("category").isNotNull)
      .groupBy(col("category"))
      .agg(count(lit(1)).as(out))
    val r = masses(reference, "n_ref").localCheckpoint() // feeds join + total
    val c = masses(current, "n_cur").localCheckpoint()
    val totR = broadcast(r.agg(sum(col("n_ref")).as("__nr")))
    val totC = broadcast(c.agg(sum(col("n_cur")).as("__nc")))
    r.join(c, Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(totR).crossJoin(totC)
      .filter(col("__nr") > 0L && col("__nc") > 0L)
      .withColumn("gap_micro",
        expr("abs(n_ref * 1000000L DIV __nr - n_cur * 1000000L DIV __nc)"))
      .withColumn("__pr",
        greatest(col("n_ref"), lit(1L)).cast("double") / col("__nr").cast("double"))
      .withColumn("__pc",
        greatest(col("n_cur"), lit(1L)).cast("double") / col("__nc").cast("double"))
      .select(col("category"), col("n_ref"), col("n_cur"), col("gap_micro"),
        floor((col("__pc") - col("__pr")) * log(col("__pc") / col("__pr")) *
          lit(1000000.0)).cast("long").as("psi_micro"))
  }

  /**
   * Score-distribution drift over reference-decile bins, measured by
   * per-bin share gaps (their half-sum is the total-variation distance —
   * the bounded, log-free sibling of PSI). Bin edges are the REFERENCE's
   * exact decile cutoffs (rank rule `((r−1)·10) DIV n + 1`, cutoff = max
   * score of deciles 1–9, from the range-partitioned rank), and BOTH
   * samples are then binned by those VALUE cutoffs — identical samples
   * land identically even under heavy ties, so zero drift reads exactly
   * zero. All integer: shares on the 1e-6 grid, one DIV per side.
   *
   * Scale shape: one rank pass over the reference; binning is a
   * broadcast join against ≤9 cutoff rows; output is ≤10 bins.
   */
  def scoreDriftTvd(
      reference: DataFrame,
      current: DataFrame,
      idCol: String,
      scoreCol: Column
  ): DataFrame = {
    def prep(df: DataFrame) = df
      .select(col(idCol).as("__id"), scoreCol.cast("long").as("__s"))
      .filter(col("__s").isNotNull)
    val ref = prep(reference).localCheckpoint() // ranked AND re-binned
    val cur = prep(current)
    // DISTINCT cutoff values: tie-heavy references can repeat a cutoff
    // across deciles, and a duplicated boundary must not double-count in
    // the bin assignment — bins are value intervals, possibly fewer
    // than 10 under ties
    val cuts = broadcast(
      Ranks.withGlobalRank(ref, Seq(col("__s"), col("__id")), "__r")
        .crossJoin(broadcast(ref.agg(count(lit(1)).as("__n"))))
        .withColumn("__d", expr("((__r - 1L) * 10L) DIV __n + 1L"))
        .filter(col("__d") <= 9L)
        .groupBy(col("__d")).agg(max(col("__s")).as("__cut"))
        .select(col("__cut")).distinct())
    def binned(df: DataFrame, out: String) = df
      .join(cuts, df("__s") > cuts("__cut"), "left")
      .groupBy(col("__id")).agg((count(col("__cut")) + 1L).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(out))
    binned(ref, "n_ref")
      .join(binned(cur, "n_cur"), Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(broadcast(ref.agg(count(lit(1)).as("__nr"))))
      .crossJoin(broadcast(cur.agg(count(lit(1)).as("__nc"))))
      .filter(col("__nr") > 0L && col("__nc") > 0L)
      .select(col("bin"), col("n_ref"), col("n_cur"),
        expr("abs(n_ref * 1000000L DIV __nr - n_cur * 1000000L DIV __nc)")
          .as("gap_micro"))
  }

  /**
   * Two-sample Kolmogorov–Smirnov separation of a score — the
   * credit-scoring "KS statistic": the maximum gap between the positive
   * and negative score CDFs, with the score where it peaks (ties to the
   * smallest score). Exact integers: within-class cumulative counts are
   * per-score maxima of within-class row ranks (from the
   * range-partitioned [[Ranks.withGlobalRank]]), gap-filled across the
   * union score axis by the inclusive range-partitioned prefix-max —
   * no single-partition stage anywhere — and each CDF lands on the 1e-6
   * grid by one `DIV` per class.
   */
  def ksScore(
      scored: DataFrame,
      idCol: String,
      scoreCol: Column,
      labelCol: Column
  ): DataFrame = {
    val base = scored.select(col(idCol).as("__id"),
      scoreCol.cast("long").as("__s"), labelCol.cast("long").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isin(0L, 1L))
      .localCheckpoint() // feeds both class rank passes and the score axis
    def classCum(flag: Long, out: String): DataFrame =
      Ranks.withGlobalRank(
        base.filter(col("__y") === flag).select(col("__s"), col("__id")),
        Seq(col("__s"), col("__id")), "__r")
        .groupBy(col("__s")).agg(max(col("__r")).as(out))
    val axis = base.select(col("__s")).distinct()
      .join(classCum(1L, "__cp"), Seq("__s"), "left")
      .join(classCum(0L, "__cn"), Seq("__s"), "left")
    val filled = Ranks.prefixMaxInclusiveGlobal(
      Ranks.prefixMaxInclusiveGlobal(axis, col("__s"), "__cp", "__fp"),
      col("__s"), "__cn", "__fn")
    val tot = broadcast(base.agg(
      sum(col("__y")).as("__np"),
      sum(lit(1L) - col("__y")).as("__nn")))
    filled.crossJoin(tot)
      .filter(col("__np") > 0L && col("__nn") > 0L)
      .withColumn("__gap",
        abs(expr("coalesce(__fp, 0L) * 1000000L DIV __np") -
          expr("coalesce(__fn, 0L) * 1000000L DIV __nn")))
      .agg(max(struct(col("__gap"), (-col("__s")).as("__ns"))).as("__m"),
        first(col("__np")).as("n_pos"), first(col("__nn")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        col("__m.__gap").as("ks_micro"), (-col("__m.__ns")).as("at_score"))
      // a one-class input empties the pre-agg frame, and an ungrouped
      // aggregate still emits one all-null row — drop it so the
      // degenerate case is EMPTY, matching the definitional result
      .filter(col("n_pos").isNotNull)
  }

  /**
   * Exact ROC AUC via the Mann–Whitney U statistic with midrank tie
   * correction, fully integer on the doubled-rank grid: rank all rows by
   * score ascending (row ranks from the range-partitioned
   * [[Ranks.withGlobalRank]]; ties take the midrank, computed per score
   * group as `min_rank + max_rank` — already the ×2 midrank, and
   * invariant to intra-tie order), then
   * `auc_micro = (2·Σranks⁺ − n⁺(n⁺+1)) · 10⁶ DIV (2·n⁺·n⁻)` — the
   * probability a random positive outranks a random negative. Bound:
   * 2n²·10⁶ must stay under 2^63 (n ≲ 2·10⁶ entities; sample or
   * pre-aggregate beyond).
   *
   * Scale shape: one row-rank pass + a score-grain aggregate + one-row
   * totals; nothing wider than the score cardinality after the rank.
   */
  def aucScore(
      scored: DataFrame,
      idCol: String,
      scoreCol: Column,
      labelCol: Column
  ): DataFrame = {
    val base = scored.select(col(idCol).as("__id"),
      scoreCol.cast("long").as("__s"), labelCol.cast("long").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isin(0L, 1L))
    val ranked = Ranks.withGlobalRank(base, Seq(col("__s"), col("__id")), "__r")
    val perScore = ranked.groupBy(col("__s"))
      .agg(min(col("__r")).as("__minr"), max(col("__r")).as("__maxr"),
        sum(col("__y")).as("__pos"))
    perScore
      .agg(
        sum(col("__pos") * (col("__minr") + col("__maxr"))).as("__s2"),
        sum(col("__pos")).as("n_pos"),
        sum(col("__maxr") - col("__minr") + 1L - col("__pos")).as("n_neg"))
      .filter(col("n_pos") > 0L && col("n_neg") > 0L)
      .select(col("n_pos"), col("n_neg"),
        expr("((__s2 - n_pos * (n_pos + 1L)) * 1000000L) DIV (2L * n_pos * n_neg)")
          .as("auc_micro"))
  }

  /**
   * GROUPED exact ROC AUC — [[aucScore]] per key (per day, per segment,
   * per cohort): "where does the model actually discriminate", the
   * slice-wise read a global AUC hides. Same Mann–Whitney midrank
   * arithmetic on the doubled-rank grid, identical per key to running
   * [[aucScore]] on that key's slice (spec-pinned); one-class keys are
   * absent from the output (their AUC is undefined).
   *
   * Scale shape: ranks come from a PER-KEY window (keys partition the
   * shuffle — no global sort anywhere), then score-grain and key-grain
   * aggregates. The integer bound applies per key: 2·n_k²·10⁶ < 2^63.
   */
  def aucScoreByKey(
      scored: DataFrame,
      keyCol: String,
      idCol: String,
      scoreCol: Column,
      labelCol: Column
  ): DataFrame = {
    val base = scored.select(col(keyCol).as("__k"), col(idCol).as("__id"),
      scoreCol.cast("long").as("__s"), labelCol.cast("long").as("__y"))
      .filter(col("__k").isNotNull && col("__s").isNotNull && col("__y").isin(0L, 1L))
    val w = Window.partitionBy(col("__k")).orderBy(col("__s"), col("__id"))
    base
      .withColumn("__r", row_number().over(w).cast("long"))
      .groupBy(col("__k"), col("__s"))
      .agg(min(col("__r")).as("__minr"), max(col("__r")).as("__maxr"),
        sum(col("__y")).as("__pos"))
      .groupBy(col("__k"))
      .agg(
        sum(col("__pos") * (col("__minr") + col("__maxr"))).as("__s2"),
        sum(col("__pos")).as("n_pos"),
        sum(col("__maxr") - col("__minr") + 1L - col("__pos")).as("n_neg"))
      .filter(col("n_pos") > 0L && col("n_neg") > 0L)
      .select(col("__k").as(keyCol), col("n_pos"), col("n_neg"),
        expr("((__s2 - n_pos * (n_pos + 1L)) * 1000000L) DIV (2L * n_pos * n_neg)")
          .as("auc_micro"))
  }

  /**
   * GROUPED two-sample KS separation — [[ksScore]] per key: the max CDF
   * gap between the positive and negative score distributions within
   * each segment, with the score where it peaks (ties to the smallest
   * score). Per key identical to running [[ksScore]] on that key's
   * slice (spec-pinned); one-class keys are absent.
   *
   * Scale shape: one keyed aggregate to (key, score) grain, per-key
   * cumulative windows (keys partition the shuffle — no global sort),
   * one argmax aggregate per key.
   */
  def ksScoreByKey(
      scored: DataFrame,
      keyCol: String,
      idCol: String,
      scoreCol: Column,
      labelCol: Column
  ): DataFrame = {
    val base = scored.select(col(keyCol).as("__k"), col(idCol).as("__id"),
      scoreCol.cast("long").as("__s"), labelCol.cast("long").as("__y"))
      .filter(col("__k").isNotNull && col("__s").isNotNull && col("__y").isin(0L, 1L))
    val grained = base.groupBy(col("__k"), col("__s"))
      .agg(sum(col("__y")).as("__p"), sum(lit(1L) - col("__y")).as("__q"))
    val cum = Window.partitionBy(col("__k")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("__k"))
    grained
      .withColumn("__cp", sum(col("__p")).over(cum))
      .withColumn("__cq", sum(col("__q")).over(cum))
      .withColumn("__np", sum(col("__p")).over(tot))
      .withColumn("__nn", sum(col("__q")).over(tot))
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
   * Coalesce overlapping-or-touching `[start, end)` intervals per key
   * into maximal spans — the classic gaps-and-islands rewrite: a row
   * starts a new island iff its start exceeds the running maximum of all
   * PRECEDING ends (an exclusive window, so ties and containment are
   * handled), islands are numbered by a running sum of those flags, and
   * one aggregate per island yields the span. Touching intervals
   * ([1,3) + [3,5)) merge — half-open adjacency has no gap.
   *
   * Scale shape: one key shuffle; both windows are per-key sized.
   */
  def coalesceIntervals(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String
  ): DataFrame = {
    val base = df.select(col(keyCol), col(startCol).cast("long").as("__s"),
      col(endCol).cast("long").as("__e"))
      .filter(col("__s").isNotNull && col("__e").isNotNull && col("__s") < col("__e"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__s"), col("__e"))
    val prevMax = w.rowsBetween(Window.unboundedPreceding, -1)
    val upToHere = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("__pm", max(col("__e")).over(prevMax))
      .withColumn("__new",
        when(col("__pm").isNull || col("__s") > col("__pm"), 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(upToHere))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col("__s")).as("span_start"), max(col("__e")).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }

  /**
   * Longest consecutive-day activity streak per entity — the
   * gaps-and-islands trick on the calendar: over an entity's DISTINCT
   * active days in order, `day − row_number` is constant exactly within
   * a consecutive run, so one aggregate per (entity, anchor) yields the
   * streaks and an argmax (longest, ties to the EARLIEST start) picks
   * the answer. Integer/date arithmetic only.
   *
   * Scale shape: the distinct-day aggregate is the only event-sized
   * shuffle; windows and aggregates run on (entity, day) grain.
   */
  def longestStreaks(
      events: DataFrame,
      entityCol: String,
      tsCol: String
  ): DataFrame = {
    val days = events.filter(col(tsCol).isNotNull)
      .select(col(entityCol), to_date(col(tsCol)).as("__day"))
      .distinct()
    val w = Window.partitionBy(col(entityCol)).orderBy(col("__day"))
    days
      .withColumn("__anchor",
        date_sub(col("__day"), row_number().over(w)))
      .groupBy(col(entityCol), col("__anchor"))
      .agg(count(lit(1)).as("__len"), min(col("__day")).as("__start"))
      .groupBy(col(entityCol))
      .agg(max(struct(col("__len"),
        (-datediff(col("__start"), lit("1970-01-01"))).as("__negd"))).as("__m"))
      .select(col(entityCol), col("__m.__len").as("streak_days"),
        date_add(lit("1970-01-01"), (-col("__m.__negd")).cast("int"))
          .as("streak_start"))
  }

  /**
   * Exact quantile mapping (distribution calibration): re-express each
   * source value on the TARGET distribution's scale by rank — source
   * rank r of n_a maps to the target's ⌈r·n_b∕n_a⌉-th order statistic.
   * The quantile-normalization step of cross-corpus score calibration
   * ("this corpus's 90th-percentile quality = that corpus's 0.82"),
   * exact and integer throughout: ranks come from the range-partitioned
   * [[Ranks.withGlobalRank]] (source ranks totally ordered by (value,
   * id) — documented tiebreak; target tie ranks are arbitrary but the
   * value AT a rank is the multiset order statistic, deterministic
   * regardless), and the index arithmetic is `(r·n_b + n_a − 1) DIV n_a`.
   *
   * Scale shape: two range-partitioned rank passes + one equi-join on
   * the computed index; counts join in as broadcast single rows.
   */
  def quantileMap(
      source: DataFrame,
      idCol: String,
      valueCol: Column,
      target: DataFrame,
      targetValueCol: Column
  ): DataFrame = {
    val a = source.select(col(idCol).as("__id"), valueCol.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val b = target.select(targetValueCol.cast("long").as("__bv"))
      .filter(col("__bv").isNotNull)
    val aRanked = Ranks.withGlobalRank(a, Seq(col("__v"), col("__id")), "__r")
    val bRanked = Ranks.withGlobalRank(b, Seq(col("__bv")), "__rb")
    aRanked
      .crossJoin(broadcast(a.agg(count(lit(1)).as("__na"))))
      .crossJoin(broadcast(b.agg(count(lit(1)).as("__nb"))))
      .filter(col("__nb") > 0L)
      .withColumn("__q", expr("(__r * __nb + __na - 1L) DIV __na"))
      .join(bRanked.select(col("__rb").as("__q"), col("__bv")), Seq("__q"))
      .select(col("__id").as(idCol), col("__v").as("value"),
        col("__bv").as("mapped"))
  }

  /**
   * Exact lower weighted median per key: the smallest value whose
   * cumulative weight reaches half the key's total (`2·cum ≥ tot`, the
   * integer spelling that needs no halving division). Equal values may
   * order arbitrarily within their tie run, but the run shares one
   * value, so the reported median is deterministic anyway.
   *
   * Scale shape: one key shuffle; the cumulative window is per-key
   * sized. For keys whose row count itself is extreme, the
   * [[Sketches.rankSketchQuantiles]] family is the sketch path — this is
   * the exact tier.
   */
  def weightedMedian(
      df: DataFrame,
      keyCol: String,
      valueCol: Column,
      weightCol: Column
  ): DataFrame = {
    val base = df.select(col(keyCol), valueCol.cast("long").as("__v"),
      weightCol.cast("long").as("__w"))
      .filter(col("__v").isNotNull && col("__w") > 0L)
    val wc = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col(keyCol))
    base
      .withColumn("__cum", sum(col("__w")).over(wc))
      .withColumn("__tot", sum(col("__w")).over(wt))
      .filter(col("__cum") * 2L >= col("__tot"))
      .groupBy(col(keyCol))
      .agg(min(col("__v")).as("weighted_median"))
  }

  /**
   * Exact mode per key — most frequent value, ties to the SMALLEST value
   * (deterministic): two keyed aggregates, the argmax via
   * `max(struct(count, −value))`, never a window. Values must be
   * non-negative longs (the negation trick's documented domain).
   */
  def modePerKey(
      df: DataFrame,
      keyCol: String,
      valueCol: Column
  ): DataFrame =
    df.select(col(keyCol), valueCol.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__v") >= 0L)
      .groupBy(col(keyCol), col("__v"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(keyCol))
      .agg(max(struct(col("__n"), (-col("__v")).as("__nv"))).as("__m"))
      .select(col(keyCol), (-col("__m.__nv")).as("mode_value"),
        col("__m.__n").as("mode_count"))

  /**
   * Per-key autocorrelation of the daily series at calendar lags —
   * "does Monday predict next Monday" quantified. For each `lag` ℓ, the
   * Pearson correlation over the (x_d, x_{d+ℓ}) pairs that BOTH exist
   * (true calendar lag via a day-arithmetic self-join, not a row-offset
   * `lag()` window, which silently shifts across gaps). Sums are exact
   * integers (same overflow lever as [[trendSlopes]]: Σx², N·Σxy must
   * stay under 2^63 — pre-scale the value grid down for astronomically
   * large daily totals); the final correlation is ONE fixed double
   * expression tree (incl. the IEEE-exact sqrt) floored onto the 1e-6
   * grid, the [[Sketches.hllStats]]/[[trendSlopes]] engine-exactness
   * doctrine.
   *
   * Scale shape: the events scan collapses to the (key, day) rollup
   * once; each lag is a per-key-sized equi-join on (key, day+ℓ) plus a
   * key-grain aggregate — lags multiply day-grain work, never
   * event-grain.
   */
  def acfDaily(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      lags: Seq[Int],
      scaleDiv: Long = 1L
  ): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), "lags must be positive")
    require(scaleDiv >= 1L, "scaleDiv must be positive")
    // the overflow lever made concrete: ANSI mode turns a too-fine grid
    // into a LOUD error (sum of x*y products passes 2^63), and scaleDiv
    // coarsens the grid (micro -> milli at 1000) until products fit;
    // correlation is scale-invariant up to the integer truncation
    val daily = dailyMicroTotals(events, keyCol, tsCol, valueCol)
      .select(col(keyCol), col("day"),
        expr(s"__y DIV ${scaleDiv}L").as("__y"))
      .localCheckpoint() // feeds both sides of every lag join
    val lagged = lags.map { l =>
      daily
        .join(daily.select(col(keyCol),
          date_sub(col("day"), l).as("day"), col("__y").as("__y2")),
          Seq(keyCol, "day"))
        .withColumn("lag", lit(l.toLong))
    }.reduce(_ unionByName _)
    val s = lagged.groupBy(col(keyCol), col("lag")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("__y")).as("__sx"), sum(col("__y2")).as("__sy"),
      sum(col("__y") * col("__y2")).as("__sxy"),
      sum(col("__y") * col("__y")).as("__sxx"),
      sum(col("__y2") * col("__y2")).as("__syy"))
    val nd = col("n_pairs").cast("double")
    val num = nd * col("__sxy").cast("double") -
      col("__sx").cast("double") * col("__sy").cast("double")
    val denx = nd * col("__sxx").cast("double") -
      col("__sx").cast("double") * col("__sx").cast("double")
    val deny = nd * col("__syy").cast("double") -
      col("__sy").cast("double") * col("__sy").cast("double")
    // guard on the deviation PRODUCTS, not the sqrt: a constant series
    // has exact-zero deviation whose double rounding can land ±ε, and
    // sqrt(−ε) = NaN behaves differently across engines
    s.withColumn("__dx", denx).withColumn("__dy", deny)
      .filter(col("n_pairs") >= 2 && col("__dx") > 0.0 && col("__dy") > 0.0)
      .select(col(keyCol), col("lag"), col("n_pairs"),
        floor(num / sqrt(col("__dx") * col("__dy")) * lit(1000000.0))
          .cast("long").as("acf_micro"))
  }

  /**
   * The `(key, day)` micro-grid pre-aggregate both seasonality operators
   * derive from: daily value totals on the 1e-6 grid plus the engine-
   * neutral epoch-day-mod-7 dow. Public so a pipeline can materialize it
   * ONCE (a maintained daily rollup) and feed both
   * [[seasonalDowProfileFromDaily]] and [[seasonalOutliersFromDaily]] —
   * at 100 TB the events scan dominates both operators, and the two
   * `FromDaily` forms share it instead of paying it twice. Output is
   * day-grain (keys × days rows), so the materialized form is tiny
   * relative to its input and cheap to maintain incrementally.
   */
  def dailyMicroTotals(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame =
    events
      .filter(col(tsCol).isNotNull && col(valueCol) >= 0)
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(floor(col(valueCol) * lit(1000000.0)).cast("long")).as("__y"))
      .withColumn("dow",
        pmod(datediff(col("day"), to_date(lit("1970-01-01"))), lit(7)).cast("long"))

  /**
   * Daily resample with gap-fill: aggregates `(entity, day)` event counts
   * and value sums, expands each entity's span to EVERY calendar day via
   * `sequence(min_day, max_day)`, and fills missing days with `n_events=0`
   * and the last observed daily total carried forward (LOCF).
   *
   * Scale shape: the daily pre-aggregate is the only event-sized shuffle;
   * the calendar explode emits |span| rows per entity (days, not events),
   * and the LOCF window partitions by entity over that day-sized frame.
   * The first day of every span has data by construction, so LOCF never
   * leaves a null behind.
   */
  def gapFillDaily(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val daily = events
      .groupBy(col(entityCol), to_date(col(tsCol)).as("day"))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,6)")).as("v"))
    val cal = daily
      .groupBy(col(entityCol))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col(entityCol),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY"))).as("day"))
    val locf = Window.partitionBy(col(entityCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal
      .join(daily, Seq(entityCol, "day"), "left")
      .select(
        col(entityCol),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true).over(locf).cast("double").as("value_filled"))
  }
}
