package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Physical-plan regression guards: the scale properties BASELINE.md claims
 * are asserted here, so a refactor that silently degrades a plan (e.g. an
 * aggregate falling out of the primitive-buffer hash aggregate into the
 * sort-based fallback) fails the suite instead of only showing up as a
 * benchmark regression three rounds later.
 */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("changelog projection is a primitive-buffer HashAggregate (never Object/Sort fallback)") {
    val ledger = spark.range(1000).select(
      col("id").as("offset"),
      (col("id") % 4).cast("int").as("op"),
      (col("id") % 100).as("pk"),
      col("id").as("v1"),
      (col("id") * 2).as("v2")
    )
    val plan = formatted(Changelog.project(ledger, Seq("pk")))
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate"), "struct-valued agg buffer crept back in")
    assert(!plan.contains("SortAggregate"), "projection degraded to sort-based aggregation")
  }

  test("ledger merge: probe side reads ONLY the key column; join is hash, not sort-merge") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-")
    spark.range(1000).select(col("id").as("pk"), col("id").as("a"), col("id").as("b"))
      .write.parquet(dir.resolve("prev").toString)
    val prev = spark.read.parquet(dir.resolve("prev").toString)
    val incoming = spark.range(500, 1500).select(col("id").as("pk"), col("id").as("v"))
    val plan = formatted(MergeStrategy.Ledger(Seq("pk")).merge(Some(prev), incoming))
    // column pruning reaches the parquet scan of the prior ledger
    assert(plan.contains("ReadSchema: struct<pk:bigint>"), plan)
    assert(plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), "anti join fell back to sorting both sides")
  }

  test("filters and projections push down into parquet scans") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan2-")
    spark.range(1000).select(
      col("id").as("k"), (col("id") % 7).as("f"), col("id").as("x"), col("id").as("unused")
    ).write.parquet(dir.resolve("t").toString)
    val t = spark.read.parquet(dir.resolve("t").toString)
    val plan = formatted(t.filter(col("f") === 3).select("k", "x"))
    assert(plan.contains("PushedFilters: [IsNotNull(f), EqualTo(f,3)]"), plan)
    assert(plan.contains("ReadSchema: struct<k:bigint,f:bigint,x:bigint>"), plan)
    assert(!plan.contains("unused"), "projection pruning failed to drop the unused column")
  }

  test("asof join and snapshot diff broadcast/hash where expected") {
    val trades = spark.range(100).select(col("id"), lit("cad").as("cur"),
      (col("id") * 1000).cast("timestamp").as("tt"))
    val rates = Seq(("cad", new java.sql.Timestamp(0L), 1.3)).toDF("cur", "rt", "rate")
    val plan = formatted(Temporal.asOfJoin(trades, rates, Seq("cur"), "tt", "rt"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
