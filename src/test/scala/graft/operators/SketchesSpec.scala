package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV distinct sketch: exact-below-k, lossless merge, estimator accuracy.
  * Histogram sketch: additive merge, ceil-rank quantile rule, binWidth
  * error bound vs the exact sorted quantile. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmvSketch: below k the sketch is the full hash set and the estimate is exact") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    val st = Sketches.kmvStats(Sketches.kmvSketch(df, Seq("k"), "v", k = 16), Seq("k"), 16)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(st("a") === ((2L, 2.0))) // duplicates collapse
    assert(st("b") === ((1L, 1.0)))
  }

  test("kmvMerge: merged sketch of overlapping halves equals the fresh sketch of the union") {
    val all = (1L to 3000L).map(v => ("g", v)).toDF("k", "v")
    val a = Sketches.kmvSketch((1L to 2000L).map(v => ("g", v)).toDF("k", "v"), Seq("k"), "v", 128)
    val b = Sketches.kmvSketch((1500L to 3000L).map(v => ("g", v)).toDF("k", "v"), Seq("k"), "v", 128)
    val merged = Sketches.kmvMerge(a, b, Seq("k"), 128).collect()(0).getSeq[Long](1)
    val fresh = Sketches.kmvSketch(all, Seq("k"), "v", 128).collect()(0).getSeq[Long](1)
    assert(merged === fresh) // the KMV merge property, element-exact
  }

  test("kmvStats: estimator lands near the true cardinality") {
    val df = (1L to 5000L).map(v => ("g", v)).toDF("k", "v")
    val est = Sketches.kmvStats(Sketches.kmvSketch(df, Seq("k"), "v", 128), Seq("k"), 128)
      .collect()(0).getDouble(3)
    assert(est > 3500.0 && est < 6500.0, s"estimate $est too far from 5000")
  }

  test("histSketch/histMerge: counts add; quantile rule hits the ceil-rank bucket edge") {
    // 10 values in [0,4): quantile est = lower bucket edge at binWidth 1.
    val df = Seq(0.1, 0.2, 0.9, 1.1, 1.5, 2.0, 2.2, 3.3, 3.4, 3.9).toDF("v")
    val hist = Sketches.histSketch(df, "v", 1.0)
    val q = Sketches.histQuantiles(hist, 1.0, Seq(0.3, 0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    // ceil(0.3*10)=3 -> 3rd value (0.9) lives in bucket 0; ceil(5)=5 -> 1.5 in bucket 1
    assert(q === Map(0.3 -> 0.0, 0.5 -> 1.0, 1.0 -> 3.0))
    val fresh = hist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h1 = Sketches.histSketch(Seq(0.1, 0.2, 0.9, 1.1).toDF("v"), "v", 1.0)
    val h2 = Sketches.histSketch(Seq(1.5, 2.0, 2.2, 3.3, 3.4, 3.9).toDF("v"), "v", 1.0)
    val m2 = Sketches.histMerge(h1, h2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m2 === fresh)
  }

  test("appendToKmvTable / appendToHistTable: maintained state equals a fresh sketch of the union") {
    val h1 = (1L to 900L).map(v => ("g", v)).toDF("k", "v")
    val h2 = (600L to 1500L).map(v => ("g", v)).toDF("k", "v")
    Sketches.materializeKmvTable(h1, Seq("k"), "v", 64, "sk_spec_kmv")
    Sketches.appendToKmvTable(h2, Seq("k"), "v", 64, "sk_spec_kmv")
    val stored = spark.table("sk_spec_kmv").collect()(0).getSeq[Long](1)
    val fresh = Sketches.kmvSketch(h1.unionByName(h2), Seq("k"), "v", 64)
      .collect()(0).getSeq[Long](1)
    assert(stored === fresh)

    val v1 = Seq(0.5, 1.5, 2.5).toDF("v")
    val v2 = Seq(1.7, 3.1).toDF("v")
    Sketches.materializeHistTable(v1, "v", 1.0, "sk_spec_hist")
    Sketches.appendToHistTable(v2, "v", 1.0, "sk_spec_hist")
    val counts = spark.table("sk_spec_hist")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(0L -> 1L, 1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("hllSketch: registers bounded by m; merge of overlapping halves equals fresh; estimate near truth") {
    val all = (1L to 20000L).map(v => ("g", v)).toDF("k", "v")
    val sk = Sketches.hllSketch(all, Seq("k"), "v")
    assert(sk.count() <= 4096L)
    assert(sk.agg(min(col("r"))).head().getInt(0) >= 1)
    val a = Sketches.hllSketch((1L to 12000L).map(v => ("g", v)).toDF("k", "v"), Seq("k"), "v")
    val b = Sketches.hllSketch((8000L to 20000L).map(v => ("g", v)).toDF("k", "v"), Seq("k"), "v")
    def regs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(regs(Sketches.hllMerge(a, b, Seq("k"))) === regs(sk)) // register-max merge, exact
    // raw-branch estimate within ~5% of 20000 (1.04/sqrt(4096) ~ 1.6% se)
    val est = Sketches.hllStats(sk, Seq("k")).head().getLong(3) / 1e6
    assert(est > 19000 && est < 21000, s"estimate $est too far from 20000")
    // linear-counting branch: small cardinality is near-exact
    val small = Sketches.hllStats(
      Sketches.hllSketch((1L to 100L).map(v => ("g", v)).toDF("k", "v"), Seq("k"), "v"), Seq("k"))
      .head().getLong(3) / 1e6
    assert(small > 95 && small < 105, s"LC estimate $small too far from 100")
  }

  test("appendToHllTable: maintained register table equals a fresh sketch of the union") {
    val h1 = (1L to 900L).map(v => ("g", v)).toDF("k", "v")
    val h2 = (600L to 1500L).map(v => ("g", v)).toDF("k", "v")
    Sketches.materializeHllTable(h1, Seq("k"), "v", "sk_spec_hll")
    Sketches.appendToHllTable(h2, Seq("k"), "v", "sk_spec_hll")
    val stored = spark.table("sk_spec_hll")
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    val fresh = Sketches.hllSketch(h1.unionByName(h2), Seq("k"), "v")
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(stored === fresh)
  }

  test("histQuantiles keyed: per-key cumulative ranks never leak across keys") {
    val df = Seq(("a", 0.5), ("a", 1.5), ("a", 2.5), ("a", 3.5),
                 ("b", 10.5), ("b", 11.5)).toDF("k", "v")
    val q = Sketches.histQuantiles(
      Sketches.histSketch(df, "v", 1.0, Seq("k")), 1.0, Seq(0.5, 1.0), Seq("k"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    assert(q === Map(
      ("a", 0.5) -> 1.0, ("a", 1.0) -> 3.0, // ceil(2)=2nd of a -> bucket 1
      ("b", 0.5) -> 10.0, ("b", 1.0) -> 11.0))
  }

  test("cmsSketch: estimates dominate exact counts; merge of halves equals fresh") {
    val vals = (1 to 500).flatMap(i => Seq.fill(i % 7 + 1)(s"v$i"))
    val df = vals.toDF("t")
    val cms = Sketches.cmsSketch(df, "t", depth = 4, width = 64)
    val exact = vals.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val probes = exact.keys.toSeq.toDF("t")
    val est = Sketches.cmsEstimate(cms, probes, "t", 4, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS under-estimated $k: ${est(k)} < $n")
    }
    // with width 64 and 500 keys there must be collisions -> some strict over
    assert(exact.exists { case (k, n) => est(k) > n })
    val half = vals.size / 2
    val m = Sketches.cmsMerge(
      Sketches.cmsSketch(vals.take(half).toDF("t"), "t", 4, 64),
      Sketches.cmsSketch(vals.drop(half).toDF("t"), "t", 4, 64))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fresh = cms.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m === fresh)
    // r18: the pre-aggregated spelling (hash per distinct value, weighted
    // count) must produce bit-identical cells — nulls dropped either way
    val withNulls = (vals.map(Option(_)) ++ Seq(None, None)).toDF("t")
    val pre = Sketches.cmsSketch(withNulls, "t", 4, 64, preAggregate = true)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pre === fresh)
  }

  test("kmvJaccard: below-k pairs are EXACT Jaccard; keys pair each way once") {
    // 3 keys; a/b overlap 10 of 30 distinct values, c is disjoint. All
    // sets are below k, so the union sketch is the full union and the
    // estimates are exact.
    val rows =
      (1 to 20).map(i => ("a", s"v$i")) ++
        (11 to 30).map(i => ("b", s"v$i")) ++
        (1 to 5).map(i => ("c", s"w$i"))
    val sk = Sketches.kmvSketch(rows.toDF("k", "v"), Seq("k"), "v", k = 128)
    val out = Sketches.kmvJaccard(sk, "k", k = 128)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    val (nKept, nCommon, jac, union, inter) = out(("a", "b"))
    assert(nKept === 30L && nCommon === 10L)
    assert(jac === 10L * 1000000L / 30L)
    assert(union === 30.0 && inter === 30.0 * (10.0 / 30.0))
    assert(out(("a", "c"))._2 === 0L && out(("a", "c"))._3 === 0L)
  }

  test("hllOverlap: inclusion-exclusion lands near true overlap; disjoint pairs near zero") {
    // a/b overlap 200 of 600 distinct values; c is disjoint from both.
    // All cardinalities sit deep in the linear-counting branch, so the
    // estimates are near-exact and the assertions can be tight.
    val rows =
      (1 to 400).map(i => ("a", s"v$i")) ++
        (201 to 600).map(i => ("b", s"v$i")) ++
        (1 to 300).map(i => ("c", s"w$i"))
    val sk = Sketches.hllSketch(rows.toDF("k", "v"), Seq("k"), "v")
    val out = Sketches.hllOverlap(sk, "k")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    val (union, inter, jac) = out(("a", "b"))
    assert(math.abs(union - 600L * 1000000L) <= 15L * 1000000L, s"union=$union")
    assert(math.abs(inter - 200L * 1000000L) <= 15L * 1000000L, s"inter=$inter")
    assert(math.abs(jac - 333333L) <= 30000L, s"jaccard=$jac")
    // disjoint pair: intersection estimate clamps near zero
    assert(out(("a", "c"))._2 <= 15L * 1000000L)
  }

  test("compactRankSketchTable: one 'n' row after fold, guards survive, quantiles unchanged") {
    try {
      val mk = (r: Range) => r.map(i => (i.toDouble, i.toLong)).toDF("v", "id")
      Sketches.materializeRankSketchTable(mk(0 until 400), "v", "id", 2, "spec_rank_cpt")
      Sketches.appendToRankSketchTable(mk(400 until 800), "v", "id", "spec_rank_cpt", "b1")
      Sketches.appendToRankSketchTable(mk(800 until 1200), "v", "id", "spec_rank_cpt", "b2")
      val phis = Seq(250000L, 500000L, 900000L)
      def q() = Sketches.rankSketchQuantiles(spark.table("spec_rank_cpt"), phis)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val before = q()
      assert(spark.table("spec_rank_cpt").filter(col("kind") === "n").count() === 3L)
      Sketches.compactRankSketchTable(spark, "spec_rank_cpt")
      assert(q() === before)
      assert(spark.table("spec_rank_cpt").filter(col("kind") === "n").count() === 1L)
      assert(spark.table("spec_rank_cpt").filter(col("kind") === "b").count() === 2L)
      // post-compaction replay of an already-ingested batch id still no-ops
      val rows = spark.table("spec_rank_cpt").count()
      Sketches.appendToRankSketchTable(mk(800 until 1200), "v", "id", "spec_rank_cpt", "b2")
      assert(spark.table("spec_rank_cpt").count() === rows && q() === before)
      // and equals a from-scratch sketch of the full history
      val fresh = Sketches.rankSketchQuantiles(
        Sketches.rankSketch(mk(0 until 1200), "v", "id", 2), phis)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(before === fresh)
    } finally spark.sql("DROP TABLE IF EXISTS spec_rank_cpt")
  }

  test("bloomSketch/bloomProbe: no false negatives; absent probes mostly definite-absent") {
    val members = (1 to 500).map(i => ("g", s"m$i"))
    val sk = Sketches.bloomSketch(members.toDF("k", "v"), Seq("k"), "v")
    // every inserted value must probe maybe_present = 1 (no false negatives)
    val present = Sketches.bloomProbe(
      sk, Seq("k"), (1 to 500).map(i => ("g", s"m$i")).toDF("k", "v"), "v")
      .agg(min(col("maybe_present")), sum(col("maybe_present"))).collect()(0)
    assert(present.getLong(0) === 1L)
    // 500 members in 16384 bits at k=4: FP rate ~0.5%; 1000 absent probes
    // should be overwhelmingly definite-absent.
    val fp = Sketches.bloomProbe(
      sk, Seq("k"), (1 to 1000).map(i => ("g", s"absent$i")).toDF("k", "v"), "v")
      .agg(sum(col("maybe_present"))).collect()(0).getLong(0)
    assert(fp <= 30L, s"false-positive count $fp out of 1000 is above the designed rate")
  }

  test("bloomMerge / appendToBloomTable: OR merge is lossless and re-append is a no-op") {
    val h1 = (1 to 300).map(i => ("g", s"m$i")).toDF("k", "v")
    val h2 = (200 to 600).map(i => ("g", s"m$i")).toDF("k", "v")
    def words(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fresh = words(Sketches.bloomSketch(h1.unionByName(h2), Seq("k"), "v"))
    val merged = words(Sketches.bloomMerge(
      Sketches.bloomSketch(h1, Seq("k"), "v"),
      Sketches.bloomSketch(h2, Seq("k"), "v"), Seq("k")))
    assert(merged === fresh)
    Sketches.materializeBloomTable(h1, Seq("k"), "v", "sk_spec_bloom")
    Sketches.appendToBloomTable(h2, Seq("k"), "v", "sk_spec_bloom")
    assert(words(spark.table("sk_spec_bloom")) === fresh)
    Sketches.appendToBloomTable(h2, Seq("k"), "v", "sk_spec_bloom") // crash-retry replay
    assert(words(spark.table("sk_spec_bloom")) === fresh) // idempotent by algebra
  }

  test("rankSketch: quantile estimates within the sampling rank-error bound of exact") {
    // 8000 rows, unique ties, values a fixed permutation of 1..8000. At
    // level L=4 the expected rank error at φ is O(√(2^L·φn)) ≈ 360 rows;
    // assert a 3σ-ish bound of 0.15·n. The sketch is DETERMINISTIC (hash
    // subsample), so this is a stable regression pin, not a flaky
    // statistical test.
    val n = 8000
    val rows = (1 to n).map(i => ((i * 4973 % n + 1).toDouble, i.toLong))
    val df = rows.toDF("v", "id")
    val phis = Seq(250000L, 500000L, 750000L, 900000L)
    val out = Sketches.rankSketchQuantiles(
      Sketches.rankSketch(df, "v", "id", level = 4), phis)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val sorted = rows.map(_._1).sorted
    for (phi <- phis) {
      val est = out(phi)
      val exactRank = phi * n / 1000000L
      val estRank = sorted.count(_ <= est)
      assert(math.abs(estRank - exactRank) <= 0.15 * n,
        s"phi=$phi est=$est rank=$estRank exact_rank=$exactRank")
    }
  }

  test("rankSketchMerge: mixed-level merge equals the fresh sketch at the max level") {
    val rows = (1 to 3000).map(i => ((i * 911 % 500).toDouble, i.toLong))
    val df = rows.toDF("v", "id")
    val a = Sketches.rankSketch(df.filter(col("id") % 2 === 0), "v", "id", level = 2)
    val b = Sketches.rankSketch(df.filter(col("id") % 2 =!= 0), "v", "id", level = 5)
    def norm(s: org.apache.spark.sql.DataFrame) =
      s.collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2))))
        .groupBy(identity).view.mapValues(_.length).toMap
    // sample + count rows of the merge == fresh level-5 sketch (counts are
    // split across two 'n' rows vs one, so compare samples and count SUMS)
    val m = Sketches.rankSketchMerge(a, b)
    val fresh = Sketches.rankSketch(df, "v", "id", level = 5)
    assert(norm(m.filter(col("kind") === "s")) === norm(fresh.filter(col("kind") === "s")))
    def total(s: org.apache.spark.sql.DataFrame) = s.filter(col("kind") === "n")
      .agg(sum("n")).collect()(0).getLong(0)
    assert(total(m) === total(fresh))
    assert(total(m) === 3000L)
    // and the estimates agree
    val qm = Sketches.rankSketchQuantiles(m, Seq(500000L)).collect()(0).getDouble(3)
    val qf = Sketches.rankSketchQuantiles(fresh, Seq(500000L)).collect()(0).getDouble(3)
    assert(qm === qf)
  }

  test("appendToRankSketchTable: single-commit append, idempotent on batch id") {
    val rows = (1 to 2000).map(i => ((i * 733 % 999).toDouble, i.toLong))
    val df = rows.toDF("v", "id")
    try {
      Sketches.materializeRankSketchTable(
        df.filter(col("id") <= 1000), "v", "id", 3, "spec_rank_sketch")
      Sketches.appendToRankSketchTable(
        df.filter(col("id") > 1000), "v", "id", "spec_rank_sketch", "batch-2")
      def q = Sketches.rankSketchQuantiles(
        spark.table("spec_rank_sketch"), Seq(250000L, 750000L))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
      val fresh = Sketches.rankSketchQuantiles(
        Sketches.rankSketch(df, "v", "id", 3), Seq(250000L, 750000L))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
      assert(q === fresh)
      // a retried append of the same batch id is a no-op (guard row
      // committed atomically with the batch's samples and count)
      Sketches.appendToRankSketchTable(
        df.filter(col("id") > 1000), "v", "id", "spec_rank_sketch", "batch-2")
      assert(q === fresh)
      assert(q(250000L)._1 === 2000L) // exact count, not doubled
    } finally {
      spark.sql("DROP TABLE IF EXISTS spec_rank_sketch")
    }
  }

  test("histQuantiles: estimate within binWidth of the exact quantile") {
    val vals = (1 to 997).map(i => (i * 37 % 1000).toDouble / 3.0)
    val df = vals.toDF("v")
    val w = 5.0
    val q = Sketches.histQuantiles(Sketches.histSketch(df, "v", w), w, Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    val sorted = vals.sorted
    for (p <- Seq(0.5, 0.9)) {
      val exact = sorted(math.ceil(p * vals.size).toInt - 1)
      assert(q(p) <= exact && exact < q(p) + w,
        s"p=$p est=${q(p)} exact=$exact not within one bin")
    }
  }
  test("rollingDistinctHll: every window equals a fresh sketch over that window's events") {
    val rnd = new scala.util.Random(31)
    val base = java.sql.Date.valueOf("2024-03-01")
    val rows = (1 to 800).map { i =>
      val d = rnd.nextInt(20)
      (if (i % 2 == 0) "a" else "b",
        new java.sql.Timestamp(base.getTime + d * 86400000L + 3600000L),
        s"u${rnd.nextInt(120)}")
    }
    val df = rows.toDF("k", "ts", "u")
    val w = 7
    val got = Sketches.rollingDistinctHll(df, "k", "ts", "u", w)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // reference: fresh sketch per (key, active day) over [day-w+1, day]
    val activeDays = rows.map(r => (r._1, new java.sql.Date(r._2.getTime - 3600000L).toString)).distinct
    activeDays.foreach { case (k, dayStr) =>
      val dayMs = java.sql.Date.valueOf(dayStr).getTime
      val sub = rows.filter(r => r._1 == k &&
        r._2.getTime >= dayMs - (w - 1) * 86400000L && r._2.getTime < dayMs + 86400000L)
      val fresh = Sketches.hllStats(
        Sketches.hllSketch(sub.toDF("k", "ts", "u"), Seq("k"), "u"), Seq("k"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
      assert(got((k, dayStr)) === fresh, s"window ($k, $dayStr)")
    }
  }
  test("applyHllBatch: replayed epochs and compaction are value-invisible to the stats") {
    try {
      val mk = (r: Range) => r.map(i => ("k", s"v${i % 90}")).toDF("k", "v")
      val tick = Sketches.applyHllBatch("spec_hll_str", Seq("k"), "v") _
      tick(mk(0 until 300), 0L)
      tick(mk(300 until 600), 1L)
      def stats() = Sketches.hllStats(
        Sketches.readHllTable(spark, "spec_hll_str"), Seq("k"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
      val before = stats()
      val rows = spark.table("spec_hll_str").count()
      tick(mk(300 until 600), 1L) // replay: adds a generation, changes no value
      assert(spark.table("spec_hll_str").count() > rows)
      assert(stats() === before)
      Sketches.compactHllTable(spark, "spec_hll_str") // fold generations
      assert(spark.table("spec_hll_str").count() < rows)
      assert(stats() === before)
      // equals a fresh sketch of everything appended
      val fresh = Sketches.hllStats(
        Sketches.hllSketch(mk(0 until 600), Seq("k"), "v"), Seq("k"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
      assert(before === fresh)
    } finally spark.sql("DROP TABLE IF EXISTS spec_hll_str")
  }
  test("cmsJoinSize: overestimates never undershoot; wide sketch is exact") {
    val rnd = new scala.util.Random(61)
    val aVals = (1 to 400).map(_ => rnd.nextInt(50).toLong)
    val bVals = (1 to 300).map(_ => rnd.nextInt(50).toLong)
    val trueSize = {
      val bc = bVals.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      aVals.map(v => bc.getOrElse(v, 0L)).sum
    }
    def est(width: Int): Long = Sketches.cmsJoinSize(
      Sketches.cmsSketch(aVals.toDF("v"), "v", depth = 4, width = width),
      Sketches.cmsSketch(bVals.toDF("v"), "v", depth = 4, width = width))
      .collect().head.getLong(0)
    assert(est(16) >= trueSize)        // narrow: collisions only ADD
    assert(est(4096) === trueSize)     // wide: 50 keys, no collisions
  }
  test("cmsJoinSize: disjoint key sets estimate 0, not NULL — zero dot rows count in the min") {
    // wide sketches, fully disjoint domains: every depth row's dot
    // product is 0, so the inner-join spelling would return one NULL row
    val a = Sketches.cmsSketch((1 to 5).map(_.toLong).toDF("v"), "v", depth = 4, width = 4096)
    val b = Sketches.cmsSketch((1001 to 1005).map(_.toLong).toDF("v"), "v", depth = 4, width = 4096)
    val est = Sketches.cmsJoinSize(a, b).collect()
    assert(est.length === 1 && !est.head.isNullAt(0) && est.head.getLong(0) === 0L)
  }
}
