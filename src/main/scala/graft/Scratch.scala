package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    docs.count()
    for (r <- 1 to 2) {
      time(s"r$r q-only")(docs.select(Text.qualityScore(col("text")).as("q")).agg(sum("q")).head())
      time(s"r$r l-only")(docs.select(Text.languageId(col("text")).as("l")).agg(count("l")).head())
      time(s"r$r t-only")(docs.select(Text.tokenCount(col("text")).as("t")).agg(sum("t")).head())
      time(s"r$r combined")(docs.select(col("doc_id"),
        Text.qualityScore(col("text")).as("q"),
        Text.languageId(col("text")).as("l"),
        Text.tokenCount(col("text")).cast("bigint").as("t"))
        .filter(col("q") >= 0.5 && col("l") === "en" && col("t").between(5, 1000)).count())
      time(s"r$r staged")(docs.select(col("doc_id"), col("text"), Text.qualityScore(col("text")).as("q"))
        .filter(col("q") >= 0.5)
        .select(col("doc_id"), col("text"), col("q"), Text.languageId(col("text")).as("l"))
        .filter(col("l") === "en")
        .select(col("doc_id"), col("q"), Text.tokenCount(col("text")).cast("bigint").as("t"))
        .filter(col("t").between(5, 1000)).count())
    }
    spark.stop()
  }
}
