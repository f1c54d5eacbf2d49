package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Expectations._

/** Data-quality expectations: per-rule exact violation counts, null
  * semantics (a null predicate is a violation), and the single-pass plan
  * shape for row-local rules. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("each rule family counts exactly its violations; clean data passes") {
    val df = Seq(
      (1L, Option(10L), "A", 5.0),
      (2L, Option(20L), "B", -1.0), // range violation
      (3L, Option.empty[Long], "A", 2.0), // null custref -> not_null + FK skips it
      (3L, Option(99L), "C", 3.0), // dup key + bad status + orphan ref
      (4L, Option(10L), "A", 0.0)
    ).toDF("k", "ref", "status", "v")
    val refTable = Seq(10L, 20L).toDF("rk")
    val out = Expectations.run(df, Seq(
      notNull("ref"),
      inRange("v", 0.0, 100.0),
      inSet("status", Seq("A", "B")),
      Unique("unique:k", Seq("k")),
      ForeignKey("fk:ref", "ref", refTable, "rk")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out("not_null:ref") === ((1L, false)))
    assert(out("range:v") === ((1L, false)))
    assert(out("in_set:status") === ((1L, false)))
    assert(out("unique:k") === ((1L, false)))
    assert(out("fk:ref") === ((1L, false)))

    val clean = Expectations.run(
      df.filter(col("k") === 1L),
      Seq(notNull("ref"), inRange("v", 0.0, 100.0), Unique("u", Seq("k"))))
      .collect()
    assert(clean.forall(_.getBoolean(2)))
    assert(clean.forall(_.getLong(1) === 0L))
  }

  test("row-local rules fold into one aggregate over one scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // count the scans in the aggregate's plan: all Check rules must share one
    val checks = Seq(notNull("doc_id"), inRange("n_chars", 0, 1e9),
      matches("source", "^src"), inSet("lang", Seq("en", "de", "fr", "es", "zh")))
    val aggs = checks.map(c =>
      sum(when(coalesce(c.asInstanceOf[Check].predicate, lit(false)), 0L).otherwise(1L)).as(c.name))
    val plan = docs.agg(aggs.head, aggs.tail: _*).queryExecution.executedPlan.toString
    assert(plan.split("FileScan|BatchScan").length - 1 === 1, plan)
    // and the API result agrees with direct SQL counts
    val out = Expectations.run(docs, checks)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("not_null:doc_id") === 0L)
    assert(out("matches:source") === 0L)
  }
}
