package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def bruteOverlap(
      ls: Seq[(String, Long, Long, Long)],
      rs: Seq[(String, Long, Long, Long)],
      keyed: Boolean
  ): Set[(Long, Long)] =
    (for {
      l <- ls; r <- rs
      if !keyed || l._1 == r._1
      if math.max(l._3, r._3) < math.min(l._4, r._4)
    } yield (l._2, r._2)).toSet

  test("overlapJoin: matches brute-force pairs exactly once, keyed and keyless") {
    val rnd = new scala.util.Random(13)
    def mk(n: Int, idBase: Long) = (1 to n).map { i =>
      val s = rnd.nextInt(10000).toLong
      (s"k${rnd.nextInt(4)}", idBase + i, s, s + 1 + rnd.nextInt(300))
    }
    val ls = mk(250, 1000L)
    val rs = mk(250, 9000L)
    val ldf = ls.toDF("k", "lid", "ls", "le")
    val rdf = rs.toDF("k", "rid", "rs", "re")
    for ((keys, keyed) <- Seq((Seq("k"), true), (Seq.empty[String], false));
         bin <- Seq(64L, 100L, 1024L, 20000L)) {
      // keyless: 'k' is a plain payload column on both sides — the
      // disjoint-name contract requires renaming one of them
      val (lin, rin) =
        if (keyed) (ldf, rdf)
        else (ldf.withColumnRenamed("k", "lk"), rdf.withColumnRenamed("k", "rk"))
      val out = Temporal.overlapJoin(lin, "ls", "le", rin, "rs", "re", keys, bin)
        .select(col("lid"), col("rid"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val expect = bruteOverlap(ls, rs, keyed)
      assert(out.toSet === expect, s"keyed=$keyed bin=$bin")
      assert(out.length === out.toSet.size, s"dup pairs at keyed=$keyed bin=$bin")
    }
  }

  test("overlapJoin: half-open semantics — touching intervals do not match") {
    val l = Seq(("a", 1L, 0L, 10L)).toDF("k", "lid", "ls", "le")
    val r = Seq(("a", 2L, 10L, 20L), ("a", 3L, 9L, 12L)).toDF("k", "rid", "rs", "re")
    val out = Temporal.overlapJoin(l, "ls", "le", r, "rs", "re", Seq("k"), 8L)
      .select(col("rid")).collect().map(_.getLong(0)).toSet
    assert(out === Set(3L))
  }

  test("overlapJoin: clashing non-key names rejected up front; bin fan-out guard raises") {
    val l = Seq(("a", 1L, 0L, 10L)).toDF("k", "id", "ls", "le")
    val r = Seq(("a", 2L, 5L, 15L)).toDF("k", "id", "rs", "re")
    // both sides carry 'id' — a silent duplicate would only fail on the
    // NEXT select-by-name; it must fail here instead
    val ex = intercept[IllegalArgumentException] {
      Temporal.overlapJoin(l, "ls", "le", r, "rs", "re", Seq("k"), 8L)
    }
    assert(ex.getMessage.contains("id"))
    // an interval vastly longer than binWidth must fail FAST, not explode
    // into a row-amplification storm
    val wide = Seq(("a", 1L, 0L, 10000000L)).toDF("k", "lid", "ls", "le")
    val rr = Seq(("a", 2L, 5L, 15L)).toDF("k", "rid", "rs", "re")
    val ex2 = intercept[Exception] {
      Temporal.overlapJoin(wide, "ls", "le", rr, "rs", "re", Seq("k"),
        binWidth = 8L, maxCellsPerRow = 1000L).count()
    }
    assert(ex2.getMessage != null)
  }
}
