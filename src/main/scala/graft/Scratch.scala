package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SessionDefaults.tuned(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/repo/localdata/sf10"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def skyline() = graft.operators.Skyline.skyline2d(
      spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
            .cast("long").as("oday"),
          col("o_totalprice")),
      "oday", "o_totalprice").count()
    def overlap() = {
      val ev = spark.read.parquet(s"$dir/events.parquet")
      def win(typ: String, idc: String, sc: String, ec: String) =
        ev.filter(col("event_type") === typ)
          .select(col("user_id"), col("event_id").as(idc),
            unix_millis(col("ts").cast("timestamp")).as(sc),
            (unix_millis(col("ts").cast("timestamp")) + (col("event_id") % 5 + 1) * 600000L).as(ec))
      graft.operators.Temporal.overlapJoin(
        win("purchase", "p_id", "p_start", "p_end"), "p_start", "p_end",
        win("error", "e_id", "e_start", "e_end"), "e_start", "e_end",
        keys = Seq("user_id"), binWidth = 1800000L).count()
    }
    val ev = spark.read.parquet(s"$dir/events.parquet")
    def win(typ: String, idc: String, sc: String, ec: String) =
      ev.filter(col("event_type") === typ)
        .select(col("user_id"), col("event_id").as(idc),
          unix_millis(col("ts").cast("timestamp")).as(sc),
          (unix_millis(col("ts").cast("timestamp")) + (col("event_id") % 5 + 1) * 600000L).as(ec))
    val ov = graft.operators.Temporal.overlapJoin(
      win("purchase", "p_id", "p_start", "p_end"), "p_start", "p_end",
      win("error", "e_id", "e_start", "e_end"), "e_start", "e_end",
      keys = Seq("user_id"), binWidth = 1800000L)
    val ovHint = graft.operators.Temporal.overlapJoin(
      win("purchase", "p_id", "p_start", "p_end"), "p_start", "p_end",
      win("error", "e_id", "e_start", "e_end").hint("shuffle_hash"), "e_start", "e_end",
      keys = Seq("user_id"), binWidth = 1800000L)
    ov.count() // warm
    for (i <- 1 to 3) time(s"op$i") { println("n=" + ov.count()) }
    println("SCRATCH join " + ov.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join")).mkString(" | ").take(300))
    for (i <- 1 to 2) time(s"skyline$i") { println("n=" + skyline()) }
    spark.stop()
  }
}
