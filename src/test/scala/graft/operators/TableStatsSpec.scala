package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TableStatsSpec extends SparkSpec {
  import spark.implicits._

  test("collectStats + readStats: exact row count, min/max, null counts as data") {
    try {
      val df = Seq[(Long, java.lang.Long)](
        (1L, 10L), (2L, null), (3L, 30L), (4L, 5L), (5L, null)
      ).toDF("k", "v")
      Bucketing.materializePlain(df, "spec_tablestats")
      assert(TableStats.rowCount(spark, "spec_tablestats").isEmpty)

      TableStats.collectStats(spark, "spec_tablestats", Seq("k", "v"))
      assert(TableStats.rowCount(spark, "spec_tablestats") === Some(BigInt(5)))

      val got = TableStats.readStats(spark, "spec_tablestats")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
      assert(got(("table", "row_count")) === "5")
      assert(got(("k", "min")) === "1" && got(("k", "max")) === "5")
      assert(got(("k", "null_count")) === "0")
      assert(got(("v", "min")) === "5" && got(("v", "max")) === "30")
      assert(got(("v", "null_count")) === "2")
    } finally spark.sql("DROP TABLE IF EXISTS spec_tablestats")
  }

  test("collectStats rejects TimestampNTZ columns (Spark 4.1 CBO MatchError guard)") {
    try {
      val df = Seq((1L, "2024-01-01 00:00:00")).toDF("k", "ts")
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
      Bucketing.materializePlain(df, "spec_tablestats_ntz")
      val e = intercept[IllegalArgumentException] {
        TableStats.collectStats(spark, "spec_tablestats_ntz", Seq("k", "ts"))
      }
      assert(e.getMessage.contains("TimestampNTZ"))
      // case-INsensitive: ANALYZE resolves "TS" to the ntz column, so the
      // guard must too
      val e2 = intercept[IllegalArgumentException] {
        TableStats.collectStats(spark, "spec_tablestats_ntz", Seq("TS"))
      }
      assert(e2.getMessage.contains("TimestampNTZ"))
      // table-level + non-NTZ column stats still collect fine
      TableStats.collectStats(spark, "spec_tablestats_ntz", Seq("k"))
      assert(TableStats.rowCount(spark, "spec_tablestats_ntz") === Some(BigInt(1)))
    } finally spark.sql("DROP TABLE IF EXISTS spec_tablestats_ntz")
  }

  test("statistics survive maintenance rewrites: swapInPlain, swapInBucketed, compactTable") {
    try {
      val df = (1 to 40).map(i => (i.toLong, (i * 7L) % 13)).toDF("k", "v")
      // swapInPlain: analyzed table keeps (refreshed) stats after the fold
      Bucketing.materializePlain(df, "spec_ts_swap")
      TableStats.collectStats(spark, "spec_ts_swap", Seq("k"))
      Bucketing.swapInPlain(
        spark.table("spec_ts_swap").filter(col("k") <= 30), "spec_ts_swap")
      assert(TableStats.rowCount(spark, "spec_ts_swap") === Some(BigInt(30)))
      val cols = TableStats.readStats(spark, "spec_ts_swap")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
      assert(cols(("k", "max")) === "30") // column stats refreshed, not stale
      // a never-analyzed table stays stats-free (no surprise ANALYZE cost)
      Bucketing.materializePlain(df, "spec_ts_noswap")
      Bucketing.swapInPlain(spark.table("spec_ts_noswap"), "spec_ts_noswap")
      assert(TableStats.rowCount(spark, "spec_ts_noswap").isEmpty)
      // swapInBucketed + compactTable: same survival contract
      Bucketing.materializeBucketed(df, "spec_ts_bkt", "k", 4)
      TableStats.collectStats(spark, "spec_ts_bkt", Seq("v"))
      Bucketing.swapInBucketed(
        spark.table("spec_ts_bkt"), "spec_ts_bkt", Seq("k"), 4)
      assert(TableStats.rowCount(spark, "spec_ts_bkt") === Some(BigInt(40)))
      Bucketing.compactTable(spark, "spec_ts_bkt")
      assert(TableStats.rowCount(spark, "spec_ts_bkt") === Some(BigInt(40)))
      assert(TableStats.readStats(spark, "spec_ts_bkt")
        .collect().exists(r => r.getString(0) == "v" && r.getString(1) == "max"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS spec_ts_swap")
      spark.sql("DROP TABLE IF EXISTS spec_ts_noswap")
      spark.sql("DROP TABLE IF EXISTS spec_ts_bkt")
    }
  }

  test("statistics survive a crash INSIDE the swap window (pending marker completes on recovery)") {
    try {
      val df = (1 to 20).map(i => (i.toLong, i * 3L)).toDF("k", "v")
      // crash between the swap's DROP and RENAME: only the staged copy
      // (carrying the pending-stats marker) exists; recoverSwap must both
      // complete the rename AND restore the statistics footprint
      Bucketing.materializePlain(df, "spec_ts_crash")
      TableStats.collectStats(spark, "spec_ts_crash", Seq("k"))
      // stage a copy the way swapInPlain would, then simulate the crash
      // by dropping the original before any rename happened
      Bucketing.materializePlain(spark.table("spec_ts_crash"), "spec_ts_stage")
      spark.sql("ALTER TABLE `spec_ts_stage` SET TBLPROPERTIES ('graft.stats.pending' = 'k')")
      spark.sql("DROP TABLE `spec_ts_crash`")
      spark.sql("ALTER TABLE `spec_ts_stage` RENAME TO `spec_ts_crash_swap_tmp`")
      Bucketing.recoverSwap(spark, "spec_ts_crash")
      assert(TableStats.rowCount(spark, "spec_ts_crash") === Some(BigInt(20)))
      assert(TableStats.readStats(spark, "spec_ts_crash")
        .collect().exists(r => r.getString(0) == "k" && r.getString(1) == "max"))
      // crash between RENAME and the refresh: marker still on the live
      // table; the next recoverSwap (every read path calls it) completes
      spark.sql("ALTER TABLE `spec_ts_crash` SET TBLPROPERTIES ('graft.stats.pending' = '')")
      spark.sessionState.catalog.alterTableStats(
        org.apache.spark.sql.catalyst.TableIdentifier("spec_ts_crash"), None)
      assert(TableStats.rowCount(spark, "spec_ts_crash").isEmpty)
      Bucketing.recoverSwap(spark, "spec_ts_crash")
      assert(TableStats.rowCount(spark, "spec_ts_crash") === Some(BigInt(20)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS spec_ts_crash")
      spark.sql("DROP TABLE IF EXISTS spec_ts_stage")
      spark.sql("DROP TABLE IF EXISTS spec_ts_crash_swap_tmp")
    }
  }

  test("schema-changing rewrite degrades to table-level stats (no sticky pending-refresh failure)") {
    try {
      val df = (1 to 12).map(i => (i.toLong, i * 2L, s"s$i")).toDF("k", "dropped", "renamed")
      Bucketing.materializePlain(df, "spec_ts_drift")
      TableStats.collectStats(spark, "spec_ts_drift", Seq("k", "dropped", "renamed"))
      // the rewrite drops one analyzed column and renames another: the
      // recorded footprint must be intersected with the LIVE schema, not
      // ANALYZEd verbatim (which would throw on every later recoverSwap,
      // bricking the table until a manual UNSET TBLPROPERTIES)
      Bucketing.swapInPlain(
        spark.table("spec_ts_drift").drop("dropped")
          .withColumnRenamed("renamed", "renamed2"), "spec_ts_drift")
      assert(TableStats.rowCount(spark, "spec_ts_drift") === Some(BigInt(12)))
      val stats = TableStats.readStats(spark, "spec_ts_drift").collect()
      assert(stats.exists(r => r.getString(0) == "k" && r.getString(1) == "max"))
      assert(!stats.exists(r => r.getString(0) == "dropped"))
      // marker cleared — the refresh completed rather than throwing
      assert(!spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("spec_ts_drift"))
        .properties.contains("graft.stats.pending"))
      Bucketing.recoverSwap(spark, "spec_ts_drift") // must stay a no-op
    } finally spark.sql("DROP TABLE IF EXISTS spec_ts_drift")
  }

  test("pending-stats footprint survives a comma in a column name (JSON-encoded marker)") {
    try {
      val df = (1 to 9).map(i => (i.toLong, i * 5L)).toDF("k", "a,b")
      Bucketing.materializePlain(df, "spec_ts_comma")
      TableStats.collectStats(spark, "spec_ts_comma", Seq("k", "a,b"))
      Bucketing.swapInPlain(spark.table("spec_ts_comma"), "spec_ts_comma")
      val stats = TableStats.readStats(spark, "spec_ts_comma").collect()
      assert(stats.exists(r => r.getString(0) == "a,b" && r.getString(1) == "max"))
      assert(stats.exists(r => r.getString(0) == "k" && r.getString(1) == "max"))
    } finally spark.sql("DROP TABLE IF EXISTS spec_ts_comma")
  }

  test("readStats without collectStats fails loudly") {
    try {
      Bucketing.materializePlain(Seq(1L).toDF("x"), "spec_tablestats_none")
      intercept[IllegalStateException] {
        TableStats.readStats(spark, "spec_tablestats_none")
      }
    } finally spark.sql("DROP TABLE IF EXISTS spec_tablestats_none")
  }
}
