package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  test("appendToJoinView: two ticks equal the from-scratch join; replay is a no-op") {
    try {
      val a = (1 to 300).map(i => (i.toLong % 50, i.toLong)).toDF("k", "av")
      val b = (1 to 120).map(i => (i.toLong % 50, s"b$i")).toDF("k", "bv")
      def part(df: org.apache.spark.sql.DataFrame, c: String, r: Int) =
        df.filter(col(c) % 3 === r)
      // found with residue 0, append residues 1 then 2 (both sides)
      JoinView.materializeJoinView(
        part(a, "av", 0), part(b, "k", 0), Seq("k"), "spec_jv")
      JoinView.appendToJoinView("spec_jv",
        part(a, "av", 0), part(b, "k", 0),
        part(a, "av", 1), part(b, "k", 1), Seq("k"), "t1")
      JoinView.appendToJoinView("spec_jv",
        part(a, "av", 0).unionByName(part(a, "av", 1)),
        part(b, "k", 0).unionByName(part(b, "k", 1)),
        part(a, "av", 2), part(b, "k", 2), Seq("k"), "t2")
      val rows = spark.table("spec_jv").count()
      // replay of t2 collapses
      JoinView.appendToJoinView("spec_jv",
        part(a, "av", 0).unionByName(part(a, "av", 1)),
        part(b, "k", 0).unionByName(part(b, "k", 1)),
        part(a, "av", 2), part(b, "k", 2), Seq("k"), "t2")
      assert(spark.table("spec_jv").count() === rows)
      val got = JoinView.readJoinView(spark, "spec_jv")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sorted.toSeq
      val expect = a.join(b, Seq("k"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sorted.toSeq
      assert(got === expect)
    } finally spark.sql("DROP TABLE IF EXISTS spec_jv")
  }

  test("appendToJoinView: empty deltas append nothing") {
    try {
      val a = Seq((1L, 10L)).toDF("k", "av")
      val b = Seq((1L, "x")).toDF("k", "bv")
      JoinView.materializeJoinView(a, b, Seq("k"), "spec_jv2")
      JoinView.appendToJoinView("spec_jv2", a, b,
        a.limit(0), b.limit(0), Seq("k"), "t1")
      assert(spark.table("spec_jv2").count() === 1L)
    } finally spark.sql("DROP TABLE IF EXISTS spec_jv2")
  }
}
