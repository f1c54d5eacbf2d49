package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(String, Long, Double)]): Set[(String, Long, Double)] =
    rows.filter { p =>
      !rows.exists(q =>
        q._1 == p._1 && q._2 <= p._2 && q._3 <= p._3 &&
          (q._2 < p._2 || q._3 < p._3))
    }.toSet

  test("skyline2d grouped matches brute-force dominance, keeps exact ties") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(20).toLong, rnd.nextInt(30).toDouble)
    } ++ Seq(("g0", 5L, 5.0), ("g0", 5L, 5.0)) // exact duplicate pair
    val df = rows.toDF("g", "x", "y")
    val out = Skyline.skyline2d(df, "x", "y", Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expect = brute(rows)
    assert(out.toSet === expect)
    // duplicates both survive if on the frontier
    if (expect.contains(("g0", 5L, 5.0)))
      assert(out.count(_ == (("g0", 5L, 5.0))) === 2)
  }

  test("skyline2d ungrouped uses the range-partitioned prefix (no global row window over data)") {
    val rnd = new scala.util.Random(11)
    // > max(4096, 64*P) distinct x so the adaptive branch takes the
    // range-partitioned path (the bounded-window branch is covered below)
    val rows = (1 to 6000).map { i =>
      ("all", i.toLong, rnd.nextInt(500).toDouble)
    }
    val df = rows.toDF("g", "x", "y").drop("g")
    val out = Skyline.skyline2d(df, "x", "y")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val expect = brute(rows).map(t => (t._2, t._3))
    assert(out === expect)
    // frontier is a staircase: strictly decreasing y over increasing x
    val sorted = out.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((x1, y1), (x2, y2)) => assert(x1 < x2 && y1 > y2)
      case _                       =>
    }
  }

  test("skyline2d ungrouped: small measured x-axis takes the bounded-window path, same frontier") {
    // 50 distinct x < 64*P(=4): the adaptive branch uses the plain
    // bounded window over the checkpointed per-x minima — values must be
    // identical to the brute force either way
    val rnd = new scala.util.Random(19)
    val rows = (1 to 2000).map { i =>
      ("all", rnd.nextInt(50).toLong, rnd.nextInt(400).toDouble)
    }
    val out = Skyline.skyline2d(rows.toDF("g", "x", "y").drop("g"), "x", "y")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out === brute(rows).map(t => (t._2, t._3)))
  }

  test("skyline2dTwoPhase: exact vs brute force and vs skyline2d — ties, duplicates, nulls, skewed partitions") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 3000).map { i =>
      ("all", rnd.nextInt(300).toLong, rnd.nextInt(300).toDouble)
    } ++ Seq(("all", 1L, 1.0), ("all", 1L, 1.0)) // duplicate frontier pair
    val df = rows.toDF("g", "x", "y").drop("g")
      .withColumn("id", monotonically_increasing_id())
      .repartition(7) // survivors must merge across many partitions
    val twoPhase = Skyline.skyline2dTwoPhase(df, "x", "y")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(twoPhase === brute(rows).map(t => (t._2, t._3)))
    val onePhase = Skyline.skyline2d(df, "x", "y")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(twoPhase === onePhase)
    // duplicates on the frontier both survive phase 1's row buffering
    val dupCount = Skyline.skyline2dTwoPhase(df, "x", "y")
      .filter(col("x") === 1L && col("y") === 1.0).count()
    assert(dupCount === 2L)
    // null coordinates are dropped, as in skyline2d
    val withNulls = df.union(
      Seq((null.asInstanceOf[java.lang.Long], 0.0, 9999L))
        .toDF("x", "y", "id").select(col("x").cast("long"), col("y"), col("id")))
    assert(Skyline.skyline2dTwoPhase(withNulls, "x", "y")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet === twoPhase)
    // anti-correlated worst case: every row is on the frontier
    val anti = (1 to 500).map(i => (i.toLong, (500 - i).toDouble))
      .toDF("x", "y").repartition(5)
    assert(Skyline.skyline2dTwoPhase(anti, "x", "y").count() === 500L)
    // non-Comparable coordinates fail fast at plan time, not mid-task
    val bin = Seq((Array[Byte](1), 1.0)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Skyline.skyline2dTwoPhase(bin, "x", "y")
    }
  }

  test("skyline2d resolves coordinate names case-insensitively (routing must not throw pre-path)") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map(i => (rnd.nextInt(40).toLong, rnd.nextInt(40).toDouble))
    val df = rows.toDF("xVal", "yVal")
    // case-mismatched names resolved fine via col() on the exact path
    // before r16; the two-phase routing's exact StructType lookup threw.
    // Both spellings must agree (and neither may throw).
    val got = Skyline.skyline2d(df, "XVAL", "yval")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val want = Skyline.skyline2d(df, "xVal", "yVal")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === want)
  }

  test("localFrontier ordering matches SQL: -0.0/0.0 ties survive, supplementary-char strings, NaN largest") {
    // -0.0 and 0.0 are a SQL tie on x: with equal y BOTH rows are on the
    // frontier; a Double.compareTo staircase (-0.0 < 0.0) would drop one
    val zeros = Seq((-0.0d, 5.0, 1L), (0.0d, 5.0, 2L), (1.0d, 4.0, 3L))
      .toDF("x", "y", "id").repartition(1) // one partition: staircase sees both
    val zGot = Skyline.skyline2dTwoPhase(zeros, "x", "y")
      .collect().map(_.getLong(2)).toSet
    val zWant = Skyline.skyline2d(zeros.repartition(3), "x", "y") // exact path
      .collect().map(_.getLong(2)).toSet
    assert(zGot === zWant && zGot === Set(1L, 2L, 3L))
    // U+10000 (supplementary, 2 UTF-16 code units) vs U+FFFF: UTF-8 byte
    // order says U+FFFF < U+10000; Java code-unit order says the reverse.
    // With the smaller-in-SQL string carrying the larger y, a code-unit
    // staircase would evict the true frontier row.
    val s1 = new String(Character.toChars(0x10000)) // U+10000
    val s2 = "\uFFFF"                               // U+FFFF
    val strs = Seq((s2, 9.0, 1L), (s1, 5.0, 2L)).toDF("x", "y", "id")
      .repartition(1)
    val sGot = Skyline.skyline2dTwoPhase(strs, "x", "y")
      .collect().map(_.getLong(2)).toSet
    val sWant = Skyline.skyline2d(strs.repartition(2), "x", "y")
      .collect().map(_.getLong(2)).toSet
    assert(sGot === sWant && sGot === Set(1L, 2L))
    // NaN is largest and self-equal on both orderings — a NaN-x row is
    // dominated by any finite x with y no larger
    val nans = Seq((Double.NaN, 1.0, 1L), (1.0, 1.0, 2L)).toDF("x", "y", "id")
      .repartition(1)
    assert(Skyline.skyline2dTwoPhase(nans, "x", "y")
      .collect().map(_.getLong(2)).toSet === Set(2L))
  }

  test("prefixMinGlobal equals the single-window spelling") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 2000).map(i => (i.toLong * 7, rnd.nextInt(1000).toLong))
    val df = rows.toDF("o", "v")
    val got = Skyline.prefixMinGlobal(df, col("o"), "v", "pm")
      .collect().map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    val sorted = rows.sortBy(_._1)
    var acc = Option.empty[Long]
    sorted.foreach { case (o, v) =>
      assert(got(o) === acc, s"at o=$o")
      acc = Some(acc.fold(v)(math.min(_, v)))
    }
  }
  test("appendToSkyline: incremental folds equal from-scratch; replay is the identity") {
    try {
      val rnd = new scala.util.Random(19)
      val all = (1 to 900).map(i =>
        (i.toLong, rnd.nextInt(300).toLong, rnd.nextInt(300).toDouble))
      def third(r: Int) = all.filter(_._1 % 3 == r).toDF("id", "x", "y")
      Skyline.materializeSkyline(third(0), "x", "y", "spec_sky")
      Skyline.appendToSkyline(third(1), "x", "y", "spec_sky")
      Skyline.appendToSkyline(third(2), "x", "y", "spec_sky")
      def rows() = spark.table("spec_sky").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      val got = rows()
      // guard-free replay: absorbing the same batch again is the identity
      // (MULTISET identity — a replayed frontier row must not duplicate)
      Skyline.appendToSkyline(third(2), "x", "y", "spec_sky")
      assert(rows() === got)
      val scratch = Skyline.skyline2d(all.toDF("id", "x", "y"), "x", "y")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(got === scratch)
      // coordinate twins with distinct ids both stay on the frontier
      Skyline.appendToSkyline(
        Seq((9001L, -1L, -1.0), (9002L, -1L, -1.0)).toDF("id", "x", "y"),
        "x", "y", "spec_sky")
      val twins = rows().filter(r => r._2 == -1L)
      assert(twins.map(_._1).toSet === Set(9001L, 9002L))
    } finally spark.sql("DROP TABLE IF EXISTS spec_sky")
  }
}
