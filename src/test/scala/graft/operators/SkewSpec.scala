package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted equi-join: plain-join semantics, (key, salt) shuffle, hot-key
  * spreading, outer-join rejection. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin: equals the plain join; shuffle carries the salt; outer joins rejected") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val plain = rollup(li.join(ord, Seq("l_orderkey")))
    val salted = rollup(
      Skew.saltedEquiJoin(li, ord, Seq("l_orderkey"), salt = 8, saltBy = col("l_linenumber")))
    assert(salted === plain)

    // with broadcasts and AQE off, the join exchange partitions on (key, salt)
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val shuffles = Skew
        .saltedEquiJoin(li, ord, Seq("l_orderkey"), salt = 8, saltBy = col("l_linenumber"))
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
      assert(shuffles.nonEmpty &&
        shuffles.forall(_.outputPartitioning.toString.contains("__salt")),
        shuffles.map(_.outputPartitioning).mkString(", "))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }

    // a single hot key really spreads across multiple salt sub-keys
    val hot = (1 to 1000).map(i => (1L, i)).toDF("k", "tie")
    val dim = Seq((1L, "x")).toDF("k", "v")
    val joined = Skew.saltedEquiJoin(hot, dim, Seq("k"), salt = 8, saltBy = col("tie"))
    assert(joined.count() === 1000L) // every row matched exactly once
    val nSubKeys = hot.select(pmod(hash(col("tie")), lit(8)).as("s")).distinct().count()
    assert(nSubKeys >= 4, s"hot key occupies only $nSubKeys sub-keys")

    val ex = intercept[IllegalArgumentException] {
      Skew.saltedEquiJoin(li, ord, Seq("l_orderkey"), 8, col("l_linenumber"), "left_outer")
    }
    assert(ex.getMessage.contains("inner/left-semi"))
  }

  test("profileKeys: hot key surfaces with exact share and uniform-multiple") {
    // 4 distinct keys over 10 rows: "hot" has 7.
    val df = (Seq.fill(7)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val top = Skew.profileKeys(df, "k", topK = 2).collect()
    assert(top(0).getString(0) === "hot")
    assert(top(0).getLong(1) === 7L)
    assert(top(0).getLong(2) === 4L)
    assert(top(0).getLong(3) === 700000L) // 7/10 share
    assert(top(0).getLong(4) === 2800000L) // 2.8x uniform
    assert(top(1).getString(0) === "a") // boundary tie broken by key string
  }
}
