package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions

import graft.SparkSpec

/** Funnel semantics: strictly-after ordering, non-advancing equal
  * timestamps, out-of-order steps, and monotone per-step counts. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("funnel: strictly-ordered steps; equal ts does not advance; order matters") {
    val events = Seq(
      // u1 completes A -> B -> C in order
      (1L, "A", ts(0)), (1L, "B", ts(5)), (1L, "C", ts(9)),
      // u2 has B BEFORE A, and no B after -> stops at A
      (2L, "B", ts(0)), (2L, "A", ts(5)),
      // u3: B at the SAME ts as A -> strict > means not advanced; later B ok
      (3L, "A", ts(2)), (3L, "B", ts(2)), (3L, "B", ts(7)), (3L, "C", ts(8)),
      // u4: A and B but C before B -> stops at B
      (4L, "A", ts(1)), (4L, "C", ts(2)), (4L, "B", ts(3)),
      // u5: never starts
      (5L, "B", ts(1)), (5L, "C", ts(2))
    ).toDF("user_id", "event_type", "ts")

    val full = Analytics.funnel(events, "user_id", "event_type", "ts", Seq("A", "B", "C"))
      .collect().map(r => r.getLong(0) -> ((r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3))))
      .toMap
    assert(full.keySet === Set(1L, 3L))
    assert(full(1L) === ((ts(0), ts(5), ts(9))))
    // u3's B must be the 10:07 one (10:02 is not strictly after A at 10:02)
    assert(full(3L) === ((ts(2), ts(7), ts(8))))

    val counts = Analytics.funnelCounts(events, "user_id", "event_type", "ts", Seq("A", "B", "C"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(counts === Map(1 -> 4L, 2 -> 3L, 3 -> 2L)) // monotone: A=4, A->B=3, A->B->C=2
  }

  test("sessionize: strict gap cut, tie-broken ordering, per-session aggregates") {
    // gap = 10 minutes; u1 has two sessions (cut between 10:09 and 10:25);
    // an EXACTLY-10-minute gap (10:25 -> 10:35) does NOT cut (strict >).
    val events = Seq(
      (1L, 10L, ts(0), 1.0), (1L, 11L, ts(9), 2.0),
      (1L, 12L, ts(25), 4.0), (1L, 13L, ts(35), 8.0),
      (2L, 20L, ts(5), 1.5)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.sessionize(events, "user_id", "ts", "event_id", "value", gapMinutes = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getTimestamp(2), r.getTimestamp(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out.keySet === Set((1L, 1L), (1L, 2L), (2L, 1L)))
    assert(out((1L, 1L)) === ((ts(0), ts(9), 2L, 3.0)))
    assert(out((1L, 2L)) === ((ts(25), ts(35), 2L, 12.0)))
    assert(out((2L, 1L)) === ((ts(5), ts(5), 1L, 1.5)))
  }

  test("retention: cohort week from first event, offsets count active entities") {
    def t2(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // Weeks (Mondays): 2024-01-01, 01-08, 01-15.
    val events = Seq(
      (1L, t2(2, 9)), (1L, t2(10, 9)), (1L, t2(16, 9)), // cohort w0, active w1+w2
      (2L, t2(3, 9)), (2L, t2(17, 9)),                  // cohort w0, active w2 (skips w1)
      (3L, t2(9, 9))                                    // cohort w1 only
    ).toDF("user_id", "ts")
    val out = Analytics.retention(events, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 1) -> 1L, ("2024-01-01", 2) -> 2L,
      ("2024-01-08", 0) -> 1L))
  }

  test("anomalies: spike flagged against trailing baseline; minN suppresses; baseline excludes self") {
    // u1: 10 stable values ~10.0 then a spike of 100 -> flagged, positive z.
    // The spike itself is NOT in its own baseline (frame ends at 1 PRECEDING).
    // u2: only 3 events (below minN=8) -> nothing flagged even with a spike.
    val u1 = (0 until 10).map(i => (1L, 100L + i, ts(i), 10.0 + (i % 3) * 0.5)) :+
      ((1L, 110L, ts(10), 100.0))
    val u2 = Seq((2L, 200L, ts(0), 1.0), (2L, 201L, ts(1), 1.1), (2L, 202L, ts(2), 99.0))
    val events = (u1 ++ u2).toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.anomalies(events, "user_id", "ts", "event_id", "value",
      lookback = 20, minN = 8, threshold = 2.0).collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L))
    val spike = out.filter(_.getLong(2) == 110L)
    assert(spike.length === 1 && spike(0).getLong(4) > 2000000L)
    // the stable rows of u1 must NOT be flagged
    assert(out.length === 1)
  }

  test("lastTouchAttribution: most recent prior touch wins; touchless conversions drop; strict precedence") {
    val events = Seq(
      (1L, 10L, ts(0), "view"), (1L, 11L, ts(2), "click"),
      (1L, 12L, ts(5), "purchase"),                       // -> click @2
      (1L, 13L, ts(6), "purchase"),                       // still click @2 (purchases aren't touches)
      (2L, 20L, ts(0), "purchase"),                       // no prior touch -> dropped
      (3L, 30L, ts(3), "purchase"), (3L, 31L, ts(1), "view") // view AFTER? no: ts(1) < ts(3) -> view @1
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.lastTouchAttribution(events, "user_id", "ts", "event_id",
      "event_type", "purchase", Seq("view", "click"))
      .collect().map(r => r.getLong(2) -> ((r.getString(3), r.getTimestamp(4), r.getLong(5)))).toMap
    assert(out.keySet === Set(12L, 13L, 30L))
    assert(out(12L) === (("click", ts(2), 3L * 60 * 1000000L)))
    assert(out(13L) === (("click", ts(2), 4L * 60 * 1000000L)))
    assert(out(30L) === (("view", ts(1), 2L * 60 * 1000000L)))
  }

  test("rollingActiveUsers: exact sliding distinct; window drop-off; observed days only") {
    def d(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 09:00:00")
    val events = Seq(
      (1L, d(1)), (1L, d(1)), // dup same day counts once
      (2L, d(1)),
      (1L, d(3)),
      (3L, d(9))              // day 1's users fell out of the 7-day window by day 9
    ).toDF("user_id", "ts")
    val out = Analytics.rollingActiveUsers(events, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      "2024-01-01" -> ((2L, 2L)),
      "2024-01-03" -> ((1L, 2L)),  // u1 active today, u2 carried from day 1
      "2024-01-09" -> ((1L, 2L)))) // u3 today + u1 carried from day 3; day-1 users expired
  }

  test("decayedPopularity: halving grid, age buckets, ancient events weigh zero") {
    def d(s: String) = Timestamp.valueOf(s + " 12:00:00")
    val events = Seq(
      ("x", d("2024-06-01")), // newest day: age 0 -> 1000000
      ("x", d("2024-05-02")), // age 30 -> k=1 -> 500000
      ("x", d("2024-04-17")), // age 45 -> k=1 -> 500000
      ("x", d("2024-03-03")), // age 90 -> k=3 -> 125000
      ("y", d("2014-06-01"))  // age ~3653 -> k capped at 40 -> weight 0
    ).toDF("event_type", "ts")
    val out = Analytics.decayedPopularity(events, "event_type", "ts", halfLifeDays = 30)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map("x" -> ((4L, 2125000L)), "y" -> ((1L, 0L))))
  }

  test("trendSlopes: exact OLS micro slopes; single-day keys drop") {
    def d(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val events = Seq(
      ("a", d(1), 1.0), ("a", d(2), 2.0), ("a", d(3), 3.0), // slope +1.0/day
      ("b", d(1), 9.0),                                     // one day -> dropped
      ("c", d(1), 5.0), ("c", d(3), 1.0)                    // slope -2.0/day
    ).toDF("event_type", "ts", "value")
    val out = Analytics.trendSlopes(events, "event_type", "ts", "value")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map("a" -> ((3L, 1000000L)), "c" -> ((2L, -2000000L))))
  }

  test("decayedPopularity / trendSlopes: empty or all-null-ts input yields empty result, not a parse error") {
    val empty = Seq.empty[(String, Timestamp)].toDF("event_type", "ts")
    val dp = Analytics.decayedPopularity(empty, "event_type", "ts", halfLifeDays = 30)
    assert(dp.columns.toSeq === Seq("event_type", "n_events", "decayed_micro"))
    assert(dp.count() === 0L)
    val allNull = Seq(("x", null.asInstanceOf[Timestamp], 1.0)).toDF("event_type", "ts", "value")
    assert(Analytics.decayedPopularity(allNull, "event_type", "ts", 30).count() === 0L)
    val ts = Analytics.trendSlopes(allNull, "event_type", "ts", "value")
    assert(ts.columns.toSeq === Seq("event_type", "n_days", "slope_micro_per_day"))
    assert(ts.count() === 0L)
  }

  test("funnelCounts: per-step counts match per-prefix funnel recomputation") {
    def d(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val events = Seq(
      (1L, "view", d(1)), (1L, "cart", d(2)), (1L, "purchase", d(3)),
      (2L, "view", d(1)), (2L, "cart", d(2)),
      (3L, "view", d(1)),
      (4L, "cart", d(1)), (4L, "view", d(2)), (4L, "purchase", d(3)) // cart BEFORE view: stops at 1
    ).toDF("user_id", "event_type", "ts")
    val steps = Seq("view", "cart", "purchase")
    val got = Analytics.funnelCounts(events, "user_id", "event_type", "ts", steps)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got === Seq((1, "view", 4L), (2, "cart", 2L), (3, "purchase", 1L)))
    // agrees with the (slower) per-prefix recomputation
    steps.indices.foreach { i =>
      val n = Analytics.funnel(events, "user_id", "event_type", "ts", steps.take(i + 1)).count()
      assert(got(i)._3 === n)
    }
  }

  test("coOccurrence: exact support/confidence/lift; minSupport gates pairs; dup items collapse") {
    val baskets = Seq(
      (1L, "A"), (1L, "B"), (1L, "A"), // dup A in b1 counts once
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"),
      (4L, "B")
    ).toDF("basket", "item")
    // n=4, c_A=3, c_B=3, c_C=1; (A,B)=2, (A,C)=1
    val all = Analytics.coOccurrence(baskets, "basket", "item", minSupport = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(all(("A", "B")) === ((2L, 3L, 3L, 666666L, 888888L)))
    assert(all(("A", "C")) === ((1L, 3L, 1L, 333333L, 1333333L)))
    val gated = Analytics.coOccurrence(baskets, "basket", "item", minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(gated.toSeq === Seq(("A", "B")))
  }

  test("rankNormalize: percentile grid endpoints, equi-depth buckets, tie order, single-row key") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0), ("a", 4L, 20.0), // tie on 20.0
      ("b", 9L, 5.0) // single row -> pct 0, bucket 0
    ).toDF("event_type", "event_id", "value")
    val out = Analytics.rankNormalize(df, "event_type", "value", "event_id", nBuckets = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4)))).toMap
    // key a order: (10,id1) r1, (20,id2) r2, (20,id4) r3, (30,id3) r4; n=4
    assert(out(("a", 1L)) === ((0L, 0L)))
    assert(out(("a", 2L)) === ((333333L, 0L)))
    assert(out(("a", 4L)) === ((666666L, 1L)))
    assert(out(("a", 3L)) === ((1000000L, 1L)))
    assert(out(("b", 9L)) === ((0L, 0L)))
  }

  test("holtDaily: hand-unrolled two-state recurrence; single-day key has zero trend") {
    def d(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val events = Seq(
      ("a", d(1), 4.0), ("a", d(2), 2.0), ("a", d(3), 1.0),
      ("b", d(5), 7.0)
    ).toDF("event_type", "ts", "value")
    // k=2, j=1 over micros [4e6, 2e6, 1e6]:
    //   l1=(2e6+3*4e6)>>2=3.5e6, t1=(3.5e6-4e6)>>1=-250000
    //   l2=(1e6+3*(3.25e6))>>2=2687500, t2=((2687500-3.5e6)-250000)>>1=-531250
    val out = Analytics.holtDaily(events, "event_type", "ts", "value", k = 2, j = 1, forecastDays = 7)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      "a" -> ((3L, 2687500L, -531250L, 2687500L - 7L * 531250L)),
      "b" -> ((1L, 7000000L, 0L, 7000000L))))
  }

  test("cusumDaily: hand-unrolled drift accumulation, reset at zero, alarm counting") {
    def d(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // daily micros: [1e6, 1e6, 4e6, 4e6]; mu = 2.5e6; thresh = 10% = 250000
    //   s1 = max(0, 1e6-2.5e6) = 0            (no alarm)
    //   s2 = 0                                 (no alarm)
    //   s3 = max(0, 0+4e6-2.5e6) = 1.5e6       (alarm)
    //   s4 = max(0, 1.5e6+1.5e6) = 3e6         (alarm)
    val events = Seq(
      ("a", d(1), 1.0), ("a", d(2), 1.0), ("a", d(3), 4.0), ("a", d(4), 4.0)
    ).toDF("event_type", "ts", "value")
    val out = Analytics.cusumDaily(events, "event_type", "ts", "value", thresholdPctOfMu = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out === Map("a" -> ((4L, 2500000L, 3000000L, 3000000L, 2L))))
  }

  test("basket tables: append of disjoint baskets equals fresh; re-ingest is a no-op") {
    val h1 = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "C")).toDF("basket", "item")
    val h2 = Seq((3L, "A"), (3L, "B"), (4L, "B"), (4L, "C")).toDF("basket", "item")
    try {
      Analytics.materializeBasketTables(h1, "basket", "item", "spec_basket")
      Analytics.appendToBasketTables(h2, "basket", "item", "spec_basket")
      def stats = Analytics.basketStats(spark, "spec_basket", minSupport = 1)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
      val fresh = Analytics.coOccurrence(h1.unionByName(h2), "basket", "item", minSupport = 1)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
      assert(stats === fresh)
      assert(stats(("A", "B")) === ((2L, 3L, 3L, 666666L, 888888L))) // pair count MERGED across halves
      // re-ingesting already-seen baskets changes nothing
      Analytics.appendToBasketTables(h2, "basket", "item", "spec_basket")
      assert(stats === fresh)
      // the state surface is ONE table — there is no multi-table commit
      // ordering for a crash to land between
      assert(spark.catalog.tableExists("spec_basket_facts"))
      assert(!spark.catalog.tableExists("spec_basket_pairs"))
      assert(!spark.catalog.tableExists("spec_basket_items"))
      assert(!spark.catalog.tableExists("spec_basket_baskets"))
      // compaction folds the delta generations without changing stats
      Analytics.compactBasketTables(spark, "spec_basket")
      assert(stats === fresh)
      assert(spark.table("spec_basket_facts").count() ===
        fresh.size + 3 /* items A,B,C */ + 4 /* basket guards */)
    } finally {
      spark.sql("DROP TABLE IF EXISTS spec_basket_facts")
    }
  }

  test("basket append: crash/retry at ANY point never double-counts") {
    // The fix for the pairs -> items -> guard three-commit sequence: the
    // append is ONE insertInto, so a "crash" either committed the whole
    // batch or none of it. Simulate both retry regimes and check stats
    // against a fresh coOccurrence each time.
    val h1 = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "C")).toDF("basket", "item")
    val h2 = Seq((3L, "A"), (3L, "B"), (4L, "B"), (4L, "C")).toDF("basket", "item")
    def statsOf(table: String) = Analytics.basketStats(spark, table, minSupport = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    def freshOf(df: org.apache.spark.sql.DataFrame) =
      Analytics.coOccurrence(df, "basket", "item", minSupport = 1)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    try {
      Analytics.materializeBasketTables(h1, "basket", "item", "spec_bcrash")
      // regime 1: crash BEFORE the commit (nothing landed) -> retry ingests
      // the batch once. Equivalent to simply... not having called append;
      // the retry is the first real ingest.
      Analytics.appendToBasketTables(h2, "basket", "item", "spec_bcrash")
      assert(statsOf("spec_bcrash") === freshOf(h1.unionByName(h2)))
      // regime 2: crash AFTER the commit but before the caller saw the ack
      // -> the retry re-runs the SAME append; the guard rows (committed in
      // the same insert as the counts) anti-join the whole batch away.
      Analytics.appendToBasketTables(h2, "basket", "item", "spec_bcrash")
      Analytics.appendToBasketTables(h2, "basket", "item", "spec_bcrash")
      assert(statsOf("spec_bcrash") === freshOf(h1.unionByName(h2)))
      // and a retry BATCH overlapping seen baskets folds in only the new ones
      val h3 = Seq((4L, "B"), (4L, "C"), (5L, "A"), (5L, "C")).toDF("basket", "item")
      Analytics.appendToBasketTables(h3, "basket", "item", "spec_bcrash")
      assert(statsOf("spec_bcrash") === freshOf(h1.unionByName(h2).unionByName(h3)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS spec_bcrash_facts")
    }
  }

  test("cohortLtv: first-week cohorts, whole-week ages, cumulative value per cohort") {
    def ts(s: String) = Timestamp.valueOf(s)
    // u1 first event Tue Jan 2 (cohort = week of Mon Jan 1), active again
    // two weeks later; u2 starts in week 2
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00"), 10.0),
      (1L, ts("2024-01-03 10:00:00"), 5.0),  // same cohort week, age 0
      (1L, ts("2024-01-16 10:00:00"), 2.5),  // age 2
      (2L, ts("2024-01-09 10:00:00"), 7.0)   // cohort = week of Jan 8, age 0
    ).toDF("user_id", "ts", "value")
    val out = Analytics.cohortLtv(events, "user_id", "ts", "value")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out === Map(
      ("2024-01-01", 0L) -> ((1L, 15.0, 15.0)),
      ("2024-01-01", 2L) -> ((1L, 2.5, 17.5)),
      ("2024-01-08", 0L) -> ((1L, 7.0, 7.0))))
  }

  test("ewmaDaily: dyadic fold over observed days; same-day events sum first") {
    def d(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val events = Seq(
      ("a", d(1, 1), 3.0), ("a", d(1, 2), 1.0), // day 1 total 4.0
      ("a", d(2, 1), 2.0),
      ("a", d(3, 1), 1.0),
      ("b", d(5, 1), 7.0)                       // single day: level = y0
    ).toDF("event_type", "ts", "value")
    // k=1: e = [4.0, (2+4)/2=3.0, (1+3)/2=2.0] micros
    val out = Analytics.ewmaDaily(events, "event_type", "ts", "value", k = 1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map("a" -> ((3L, 2000000L)), "b" -> ((1L, 7000000L))))
    // deterministic across partitionings
    val rep = Analytics.ewmaDaily(events.repartition(5), "event_type", "ts", "value", k = 1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep === out)
  }

  test("sessionPaths: gap cut, depth cap, count ranking with path tiebreak") {
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val events = Seq(
      // u1 session 1: view > click > purchase > error (depth 3 keeps first 3)
      (1L, ts(10, 0), 1L, "view"), (1L, ts(10, 1), 2L, "click"),
      (1L, ts(10, 2), 3L, "purchase"), (1L, ts(10, 3), 4L, "error"),
      // u1 session 2 (gap > 30m): view > click
      (1L, ts(12, 0), 5L, "view"), (1L, ts(12, 5), 6L, "click"),
      // u2 one session: view > click
      (2L, ts(10, 0), 7L, "view"), (2L, ts(10, 10), 8L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.sessionPaths(events, "user_id", "ts", "event_id", "event_type",
      gapMinutes = 30, depth = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("view > click", 2L), ("view > click > purchase", 1L)))
  }

  test("twap: step-function hold, whole-second durations, sub-2-event keys drop") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // key a: 10.0 held 10s, 20.0 held 30s -> (10e6*10 + 20e6*30)/40 = 17.5e6
      ("a", ts("2024-01-01 10:00:00"), 1L, 10.0),
      ("a", ts("2024-01-01 10:00:10"), 2L, 20.0),
      ("a", ts("2024-01-01 10:00:40"), 3L, 99.0), // last event holds nothing
      ("b", ts("2024-01-01 10:00:00"), 4L, 5.0)   // single event: dropped
    ).toDF("event_type", "ts", "event_id", "value")
    val got = Analytics.twap(events, "event_type", "ts", "event_id", "value")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map("a" -> ((3L, 40L, 17500000L))))
  }

  test("chiSquareIndependence: zero on perfect independence, zero cells counted, hand value") {
    val indep = Seq(
      ("A", 1), ("A", 1), ("A", 2), ("A", 2),
      ("B", 1), ("B", 1), ("B", 1), ("B", 2), ("B", 2), ("B", 2)
    ).toDF("a", "b")
    val r0 = Analytics.chiSquareIndependence(indep, "a", "b").collect()(0)
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2)) === ((10L, 1L, 0L)))
    // perfectly dependent 2x2 with two ZERO cells: e = 2 everywhere,
    // chi2 = 4 * (2)^2/2 = 8 -> 8000000 micro, dof = 1
    val dep = Seq.fill(4)(("A", 1)) ++ Seq.fill(4)(("B", 2))
    val r1 = Analytics.chiSquareIndependence(dep.toDF("a", "b"), "a", "b").collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) === ((8L, 1L, 8000000L)))
  }

  test("ksTest: identical samples give D=0; disjoint ranges give D=1; hand-computed gap") {
    def rows(g: String, vs: Double*) = vs.map(v => (g, v))
    val same = (rows("a", 1.0, 2.0, 3.0) ++ rows("b", 1.0, 2.0, 3.0)).toDF("g", "v")
    val r0 = Analytics.ksTest(same, "v", "g", "a", "b").collect()(0)
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2), r0.getLong(3)) === ((3L, 3L, 0L, 0L)))
    val disjoint = (rows("a", 1.0, 2.0) ++ rows("b", 5.0, 6.0)).toDF("g", "v")
    val r1 = Analytics.ksTest(disjoint, "v", "g", "a", "b").collect()(0)
    assert(r1.getLong(2) === 4L && r1.getLong(3) === 1000000L) // D = 1
    // a: {1,2,3,4}, b: {3,4,5,6}: max gap at value 2: F_a=2/4, F_b=0 -> D=1/2
    val mid = (rows("a", 1.0, 2.0, 3.0, 4.0) ++ rows("b", 3.0, 4.0, 5.0, 6.0)).toDF("g", "v")
    val r2 = Analytics.ksTest(mid, "v", "g", "a", "b").collect()(0)
    assert(r2.getLong(2) === 8L && r2.getLong(3) === 500000L)
  }

  test("abTestZ: exact counts, hand-verifiable lift and pooled-SE z") {
    val perUser = ((1 to 10).map(i => ("a", if (i <= 4) 1L else 0L)) ++
      (1 to 10).map(i => ("b", if (i <= 2) 1L else 0L))).toDF("variant", "converted")
    val r = Analytics.abTestZ(perUser, "variant", "converted", "a", "b").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((10L, 4L, 10L, 2L)))
    assert(r.getLong(4) === 200000L) // lift 0.4 - 0.2
    val pool = 6.0 / 20.0
    val se = math.sqrt(pool * (1.0 - pool) * (1.0 / 10.0 + 1.0 / 10.0))
    assert(r.getLong(5) === math.floor((0.4 - 0.2) / se * 1e6).toLong)
    // degenerate: everyone converts -> SE = 0 -> z is NULL, never an error
    val degen = Seq(("a", 1L), ("a", 1L), ("b", 1L)).toDF("variant", "converted")
    val rd = Analytics.abTestZ(degen, "variant", "converted", "a", "b").collect()(0)
    assert(rd.isNullAt(5) && rd.getLong(4) === 0L)
  }

  test("gapFillDaily: calendar expansion, zero counts, LOCF values") {
    def d(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val events = Seq(
      (1L, d(1, 9), 1.0), (1L, d(1, 10), 2.0), // day 1: n=2 v=3.0
      (1L, d(4, 9), 5.0),                      // days 2-3 missing -> n=0, v carries 3.0
      (2L, d(2, 9), 7.0)                       // single-day span
    ).toDF("user_id", "ts", "value")
    val out = Analytics.gapFillDaily(events, "user_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out === Map(
      (1L, "2024-01-01") -> ((2L, 3.0)),
      (1L, "2024-01-02") -> ((0L, 3.0)),
      (1L, "2024-01-03") -> ((0L, 3.0)),
      (1L, "2024-01-04") -> ((1L, 5.0)),
      (2L, "2024-01-02") -> ((1L, 7.0))))
  }

  test("giniByKey: perfect equality 0, extreme concentration near 1, hand value") {
    val eq = (1 to 10).map(i => ("k", i.toLong, 5.0)).toDF("k", "id", "v")
    assert(Analytics.giniByKey(eq, "k", "v", "id").collect()(0).getLong(3) === 0L)
    // one holder of everything among n=10: G = (n-1)/n = 0.9
    val conc = (("k", 0L, 100.0) +: (1 to 9).map(i => ("k", i.toLong, 0.0)))
      .toDF("k", "id", "v")
    val g = Analytics.giniByKey(conc, "k", "v", "id").collect()(0).getLong(3)
    assert(math.abs(g - 900000L) <= 10L, s"gini=$g")
    // hand case: values 1,2,3 -> G = (2*(1+4+9) - 4*6)/(3*6) = 4/18
    val h = Analytics.giniByKey(
      Seq(("k", 1L, 1.0), ("k", 2L, 2.0), ("k", 3L, 3.0)).toDF("k", "id", "v"),
      "k", "v", "id").collect()(0).getLong(3)
    assert(math.abs(h - 222222L) <= 10L, s"gini=$h")
  }

  test("robustStats: hand-checked winsorized and trimmed sums at the ceil-rank bounds") {
    // 8 values; trimPct=25 -> lor=ceil(2)=2, hir=7: clamp to [1, 6].
    val df = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 100.0).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "id", "v")
    val r = Analytics.robustStats(df, "k", "v", "id", trimPct = 25).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((8L, 121000000L, 28000000L, 6L, 21000000L)))
    // negative values stay exact (no division anywhere)
    val neg = Seq(-10.0, -5.0, 0.0, 5.0).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "id", "v")
    val rn = Analytics.robustStats(neg, "k", "v", "id", trimPct = 25).collect()(0)
    // lor=1, hir=4: no clamp, no trim
    assert((rn.getLong(2), rn.getLong(3), rn.getLong(5)) ===
      ((-10000000L, -10000000L, -10000000L)))
  }

  test("rfmSegments: monotone users land on the quintile diagonal; off-type events ignored") {
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // user u makes u purchases of value 10 on day u: recency, frequency and
    // monetary orderings all coincide -> scores are the 1..5 diagonal.
    val events = (1 to 5).flatMap(u => (1 to u).map(i =>
      (u.toLong, ts(u), "purchase", 10.0))) :+
      ((1L, ts(30), "view", 999.0)) // wrong type: must not affect anything
    val out = Analytics.rfmSegments(
      events.toDF("user_id", "ts", "event_type", "value"),
      "user_id", "ts", "value", ("event_type", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(7)))).toMap
    assert(out === Map(
      1L -> ((4L, 1L, 10000000L, 111L)),
      2L -> ((3L, 2L, 20000000L, 222L)),
      3L -> ((2L, 3L, 30000000L, 333L)),
      4L -> ((1L, 4L, 40000000L, 444L)),
      5L -> ((0L, 5L, 50000000L, 555L))))
  }

  test("seasonalDowProfile/seasonalOutliers: hand-checked dow means, factors, deviants") {
    // 2024-01-01 is a Monday = epoch-day 19723, dow = 19723 % 7 = 4.
    // Key "a": two Mondays (10, 20) and two Tuesdays (2, 4) of daily value.
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val events = Seq(
      ("a", ts(1), 10.0), ("a", ts(8), 20.0), // Mondays, dow 4
      ("a", ts(2), 2.0), ("a", ts(9), 4.0), // Tuesdays, dow 5
      ("a", ts(3), -99.0) // negative: excluded by the non-negative contract
    ).toDF("k", "ts", "value")
    val prof = Analytics.seasonalDowProfile(events, "k", "ts", "value")
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // overall mean = 36e6/4 = 9e6; Monday mean 15e6 -> factor 1.666e6; Tuesday 3e6 -> 0.333e6
    assert(prof === Map(
      4L -> ((2L, 15000000L, 1666666L)),
      5L -> ((2L, 3000000L, 333333L))))
    val out = Analytics.seasonalOutliers(events, "k", "ts", "value", topK = 2)
      .collect().map(r => r.getDate(1).toString -> r.getLong(5)).toMap
    // ratios: Mondays 10/15=0.666, 20/15=1.333; Tuesdays 2/3=0.666, 4/3=1.333
    // deviations tie at 333334/333333 boundaries: 0.666 ratios = 666666 (dev
    // 333334) beat 1.333 ratios = 1333333 (dev 333333); day breaks the tie.
    assert(out === Map("2024-01-01" -> 666666L, "2024-01-02" -> 666666L))
  }
  test("acfDaily: matches brute-force Pearson over calendar-lag pairs; periodic series near 1") {
    val base = java.sql.Date.valueOf("2024-01-01").getTime
    def ts(d: Int) = new java.sql.Timestamp(base + d * 86400000L + 7200000L)
    // key "p": period-2 series 10,0,10,0,... -> acf(2) = +1, acf(1) = -1
    val rows = (0 until 30).map(d => ("p", ts(d), if (d % 2 == 0) 10.0 else 0.0)) ++
      // key "r": pseudo-random with a GAP (days 40-49 missing)
      ((0 until 40) ++ (50 until 70)).map(d => ("r", ts(d), ((d * 37) % 11).toDouble))
    val df = rows.toDF("k", "ts", "v")
    val got = graft.operators.Analytics.acfDaily(df, "k", "ts", "v", Seq(1, 2))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("p", 2L))._2 === 1000000L)
    assert(got(("p", 1L))._2 === -1000000L)
    // brute-force reference on the gap series: pairs only where BOTH days exist
    def brute(vals: Map[Int, Long], l: Int): (Long, Long) = {
      val pairs = vals.keys.toSeq.sorted.flatMap(d => vals.get(d + l).map(y => (vals(d), y)))
      val n = pairs.size.toDouble
      val (sx, sy) = (pairs.map(_._1).sum.toDouble, pairs.map(_._2).sum.toDouble)
      val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
      val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
      val syy = pairs.map(p => p._2 * p._2).sum.toDouble
      val den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      (pairs.size.toLong, math.floor((n * sxy - sx * sy) / den * 1000000.0).toLong)
    }
    val rVals = (((0 until 40) ++ (50 until 70)).map(d => d -> ((d * 37) % 11) * 1000000L)).toMap
    for (l <- Seq(1, 2)) {
      // gap days contribute no pairs: day 39 has no day 40 partner
      assert(got(("r", l.toLong)) === brute(rVals, l), s"lag $l")
    }
  }
  test("weightedMedian / modePerKey: exact against brute force with ties") {
    val rnd = new scala.util.Random(53)
    val rows = (1 to 500).map(_ =>
      (s"k${rnd.nextInt(3)}", rnd.nextInt(40).toLong, rnd.nextInt(9).toLong + 1))
    val df = rows.toDF("k", "v", "w")
    val gotMed = graft.operators.Analytics.weightedMedian(df, "k", functions.col("v"), functions.col("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotMode = graft.operators.Analytics.modePerKey(df, "k", functions.col("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val sorted = rs.map(r => (r._2, r._3)).sortBy(_._1)
      val tot = sorted.map(_._2).sum
      var cum = 0L
      val med = sorted.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
      assert(gotMed(k) === med, s"median k=$k")
      val mode = rs.groupBy(_._2).map { case (v, xs) => (v, xs.size.toLong) }
        .toSeq.minBy { case (v, n) => (-n, v) }
      assert(gotMode(k) === mode, s"mode k=$k")
    }
  }
  test("quantileMap: maps source ranks onto target order statistics exactly") {
    val src = Seq((1L, 5L), (2L, 1L), (3L, 9L), (4L, 5L)).toDF("id", "v")
    val tgt = Seq(100L, 200L, 300L, 400L, 500L, 600L, 700L, 800L).toDF("tv")
    val got = graft.operators.Analytics.quantileMap(
      src, "id", functions.col("v"), tgt, functions.col("tv"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // ranks by (v, id): 2->1, 1->2, 4->3, 3->4; q = ceil(r*8/4) = 2,4,6,8
    assert(got === Map(
      2L -> ((1L, 200L)), 1L -> ((5L, 400L)), 4L -> ((5L, 600L)), 3L -> ((9L, 800L))))
    // mapping onto itself is the identity for distinct values
    val self = graft.operators.Analytics.quantileMap(
      src, "id", functions.col("v"), src, functions.col("v"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // ties (5,5) map within the tie run: every mapped value equals a source value
    assert(self.forall { case (v, m) => Seq(1L, 5L, 9L).contains(m) })
    assert(self.count { case (v, m) => v == m } >= 2)
  }
  test("coalesceIntervals / longestStreaks: brute-forced gaps-and-islands") {
    // intervals: overlapping, touching, contained, disjoint
    val iv = Seq(("a", 1L, 5L), ("a", 4L, 8L), ("a", 8L, 10L), ("a", 2L, 3L),
      ("a", 20L, 25L), ("b", 1L, 2L), ("b", 3L, 4L)).toDF("k", "s", "e")
    val spans = graft.operators.Analytics.coalesceIntervals(iv, "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(spans === Set(("a", 1L, 10L, 4L), ("a", 20L, 25L, 1L),
      ("b", 1L, 2L, 1L), ("b", 3L, 4L, 1L))) // [1,2) and [3,4) have a gap
    val base = java.sql.Date.valueOf("2024-05-01").getTime
    def ts(d: Int) = new java.sql.Timestamp(base + d * 86400000L + 60000L)
    // u1: runs of 3 (days 0-2) and 5 (days 10-14); u2: two runs of 2 — tie
    // breaks to the EARLIEST (days 0-1 over days 5-6); duplicate events ok
    val ev = (Seq(0, 1, 2, 10, 11, 12, 13, 14, 11).map(d => (1L, ts(d))) ++
      Seq(0, 1, 5, 6).map(d => (2L, ts(d)))).toDF("u", "ts")
    val got = graft.operators.Analytics.longestStreaks(ev, "u", "ts")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDate(2).toString))).toMap
    assert(got === Map(1L -> ((5L, "2024-05-11")), 2L -> ((2L, "2024-05-01"))))
  }
  test("decileLift: exact buckets and integer lift on a hand case") {
    // 20 entities, scores 100..81 descending by id; positives: the top 4
    // and two in the bottom half -> top decile lift = (2*20*1e6)/(2*6)
    val rows = (1 to 20).map(i =>
      (i.toLong, (101 - i).toLong, if (i <= 4 || i == 15 || i == 18) 1L else 0L))
    val got = graft.operators.Analytics.decileLift(
      rows.toDF("id", "s", "y"), "id", functions.col("s"), functions.col("y"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // deciles of 2: d1 = ids 1,2 (both pos), d2 = ids 3,4 (both pos)
    assert(got(1L) === ((2L, 2L, (2L * 20L * 1000000L) / (2L * 6L))))
    assert(got(2L) === ((2L, 2L, (2L * 20L * 1000000L) / (2L * 6L))))
    assert(got(3L) === ((2L, 0L, 0L)))
    assert(got(8L) === ((2L, 1L, (1L * 20L * 1000000L) / (2L * 6L)))) // id 15
    val sums = got.values.map(_._2).sum
    assert(sums === 6L && got.size === 10)
  }
  test("aucScore: matches brute-force pairwise AUC with tie half-credit") {
    def brute(rows: Seq[(Long, Long)]): Double = {
      val pos = rows.filter(_._2 == 1L).map(_._1)
      val neg = rows.filter(_._2 == 0L).map(_._1)
      val cmp = for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0
      cmp.sum / (pos.size * neg.size)
    }
    val rnd = new scala.util.Random(71)
    for (trial <- 1 to 3) {
      val rows = (1 to 300).map(i =>
        (i.toLong, rnd.nextInt(20).toLong, // heavy ties
          if (rnd.nextInt(100) < 20 + (i % 20) * 3) 1L else 0L))
      val got = graft.operators.Analytics.aucScore(
        rows.toDF("id", "s", "y"), "id", functions.col("s"), functions.col("y"))
        .collect().head
      val scored = rows.map(r => (r._2, r._3))
      val expect = math.floor(brute(scored) * 1000000.0).toLong
      // +-1 micro: brute goes through a double; the operator is pure integer
      assert(math.abs(got.getLong(2) - expect) <= 1L, s"trial $trial: ${got.getLong(2)} vs $expect")
      assert(got.getLong(0) === scored.count(_._2 == 1L).toLong)
      assert(got.getLong(1) === scored.count(_._2 == 0L).toLong)
    }
    // perfect separation = exactly 1e6; reversed = 0
    val perfect = Seq((1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 1L), (4L, 4L, 1L))
    assert(graft.operators.Analytics.aucScore(
      perfect.toDF("id", "s", "y"), "id", functions.col("s"), functions.col("y"))
      .collect().head.getLong(2) === 1000000L)
  }
  test("ksScore: matches brute-force two-sample KS with argmax tie to smallest score") {
    def brute(rows: Seq[(Long, Long)]): (Long, Long) = {
      val np = rows.count(_._2 == 1L).toLong
      val nn = rows.count(_._2 == 0L).toLong
      val scores = rows.map(_._1).distinct.sorted
      val cands = scores.map { s =>
        val cp = rows.count(r => r._2 == 1L && r._1 <= s).toLong
        val cn = rows.count(r => r._2 == 0L && r._1 <= s).toLong
        (math.abs(cp * 1000000L / np - cn * 1000000L / nn), s)
      }
      cands.maxBy { case (g, sc) => (g, -sc) }
    }
    val rnd = new scala.util.Random(83)
    for (trial <- 1 to 3) {
      val rows = (1 to 400).map(i =>
        (i.toLong, rnd.nextInt(25).toLong,
          if (rnd.nextInt(100) < 15 + (i % 25) * 3) 1L else 0L))
      val got = graft.operators.Analytics.ksScore(
        rows.toDF("id", "s", "y"), "id", functions.col("s"), functions.col("y"))
        .collect().head
      val (eg, es) = brute(rows.map(r => (r._2, r._3)))
      assert((got.getLong(2), got.getLong(3)) === ((eg, es)), s"trial $trial")
    }
  }
  test("scoreDriftTvd: zero on identical samples, brute-forced on shifted ones") {
    val rnd = new scala.util.Random(97)
    val ref = (1 to 400).map(i => (i.toLong, rnd.nextInt(30).toLong))
    val same = graft.operators.Analytics.scoreDriftTvd(
      ref.toDF("id", "s"), ref.map(r => (r._1 + 10000L, r._2)).toDF("id", "s"),
      "id", functions.col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(same.forall(_._2 === 0L), same.mkString(","))
    // shifted sample vs brute force over the same cutoff rule
    val cur = (1 to 350).map(i => (i.toLong, rnd.nextInt(30).toLong + 5))
    val got = graft.operators.Analytics.scoreDriftTvd(
      ref.toDF("id", "s"), cur.toDF("id", "s"), "id", functions.col("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val sorted = ref.sortBy(r => (r._2, r._1))
    val n = ref.size
    val cutsByD = sorted.zipWithIndex
      .map { case ((_, sc), i) => ((i.toLong * 10L) / n + 1L, sc) }
      .filter(_._1 <= 9L).groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).max }
    val cuts = cutsByD.values.toSeq.distinct.sorted
    def bin(sc: Long) = cuts.count(c => sc > c).toLong + 1L
    val rb = ref.groupBy(r => bin(r._2)).map { case (b, xs) => b -> xs.size.toLong }
    val cb = cur.groupBy(r => bin(r._2)).map { case (b, xs) => b -> xs.size.toLong }
    (rb.keySet ++ cb.keySet).foreach { b =>
      val (nr, nc) = (rb.getOrElse(b, 0L), cb.getOrElse(b, 0L))
      val gap = math.abs(nr * 1000000L / n - nc * 1000000L / cur.size)
      assert(got(b) === ((nr, nc, gap)), s"bin $b")
    }
    // tie-heavy reference (3 distinct scores): duplicated decile cutoffs
    // collapse to distinct value intervals, still zero on identical data
    val ties = (1 to 300).map(i => (i.toLong, (i % 3).toLong))
    val tied = graft.operators.Analytics.scoreDriftTvd(
      ties.toDF("id", "s"), ties.map(t => (t._1 + 9000L, t._2)).toDF("id", "s"),
      "id", functions.col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(tied.length === 3 && tied.forall(_._2 === 0L), tied.mkString(","))
  }

  test("categoricalDrift: brute-forced shares/gaps/psi terms; zero on identical mixes; one-sided categories") {
    import spark.implicits._
    val ref = (1 to 300).map(i => Seq("a", "a", "a", "b", "b", "c")(i % 6))
    val cur = (1 to 200).map(i => Seq("a", "b", "b", "b", "d")(i % 5))
    val got = graft.operators.Analytics.categoricalDrift(
      ref.toDF("cat"), cur.toDF("cat"), "cat")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (nr, nc) = (ref.size.toLong, cur.size.toLong)
    val rm = ref.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val cm = cur.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    (rm.keySet ++ cm.keySet).foreach { k =>
      val (a, b) = (rm.getOrElse(k, 0L), cm.getOrElse(k, 0L))
      val gap = math.abs(a * 1000000L / nr - b * 1000000L / nc)
      val pr = math.max(a, 1L).toDouble / nr
      val pc = math.max(b, 1L).toDouble / nc
      val psi = math.floor((pc - pr) * math.log(pc / pr) * 1000000.0).toLong
      assert(got(k) === ((a, b, gap, psi)), k)
    }
    // category "c" absent from cur and "d" absent from ref both PRESENT
    assert(got.contains("c") && got.contains("d"))
    assert(got("c")._2 === 0L && got("d")._1 === 0L)
    // identical mixes: every gap and psi term exactly zero
    val same = graft.operators.Analytics.categoricalDrift(
      ref.toDF("cat"), ref.toDF("cat"), "cat").collect()
    assert(same.nonEmpty && same.forall(r => r.getLong(3) === 0L && r.getLong(4) === 0L))
    // nulls are dropped, not a category
    val withNull = (ref.map(Option(_)) :+ (None: Option[String])).toDF("cat")
    assert(graft.operators.Analytics.categoricalDrift(withNull, withNull, "cat")
      .filter(functions.col("category").isNull).count() === 0L)
  }
}
