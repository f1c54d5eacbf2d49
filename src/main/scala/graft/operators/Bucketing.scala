package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Co-located table materialization — the 100 TB join-layout tool. A table
 * written `bucketBy(join key)` gives every subsequent join on that key a
 * storage-partitioned plan: both bucketed sides satisfy the join's
 * clustering requirement straight off the scan, so the fact-to-fact join
 * runs with ZERO Exchange — the layout is paid once at write time instead
 * of one shuffle per query. This is the pattern behind the bucketed LSH
 * corpus ([[Similarity.materializeLshCorpus]]) and the bucketed classic-SQL
 * fact tables (`q3_bucketed`); the reference reaches the same effect via
 * its own partitioned parquet layouts.
 */
object Bucketing {

  /**
   * Write `df` as a managed parquet table bucketed (and optionally sorted)
   * by `bucketCol`. Drops any prior catalog entry AND its warehouse
   * location first: a fresh in-memory catalog does not know about tables a
   * previous session materialized, but their managed locations persist —
   * saveAsTable would fail with LOCATION_ALREADY_EXISTS.
   */
  def materializeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil
  ): Unit =
    materializeBucketedBy(df, table, Seq(bucketCol), numBuckets, sortCols)

  /** Composite-key variant: `bucketBy(numBuckets, cols...)` — the layout
    * for joins on a multi-part key (e.g. the multi-table LSH corpus's
    * (table, bucket)). */
  def materializeBucketedBy(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil
  ): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    require(bucketCols.nonEmpty, "need at least one bucket column")
    // Unqualified names only: the stale-location cleanup below computes the
    // managed path as wh/<name>, which is wrong for db-qualified tables
    // (db.tbl lives at wh/db.db/tbl), and the backticked DROP would quote
    // the whole qualified name as one identifier.
    require(!table.contains("."),
      s"materializeBucketed takes an unqualified table name, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Unbucketed sibling of [[materializeBucketed]] — same drop + stale-
    * location cleanup — for the small side tables an index keeps beside its
    * bucketed corpus (cell statistics, root remaps). */
  def materializePlain(df: DataFrame, table: String): Unit = {
    require(!table.contains("."),
      s"materializePlain takes an unqualified table name, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").saveAsTable(table)
  }
}
