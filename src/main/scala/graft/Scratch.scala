package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/repo/localdata/sf1d/documents.parquet")
    import graft.functions.Text
    docs.count()
    val t0 = System.nanoTime()
    val sh0 = docs.select(col("doc_id").as("__jid"),
      array_distinct(Text.wordShingles(col("text"), 3)).as("__sh"))
    val sh = sh0.localCheckpoint()
    println(f"SCRATCH ckpt ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    println("SCRATCH rows " + sh.count() + f" ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
