package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: interleave correctness against hand-computed Morton
  * codes, shift-scaling of wide domains, and the locality property that
  * makes the layout prune — every range chunk of the key covers a compact
  * box in ALL dimensions, where a plain sort bounds only its leading
  * column. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey: hand-computed Morton codes on a 4x4 grid") {
    val grid = for (x <- 0L until 4L; y <- 0L until 4L) yield (x, y)
    val out = grid.toDF("x", "y")
      .withColumn("z", Bucketing.zorderKey(
        Seq(col("x"), col("y")), mins = Seq(0L, 0L), maxs = Seq(3L, 3L), bits = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // Morton: bit i of x lands at 2i, bit i of y at 2i+1
    assert(out((0L, 0L)) === 0L)
    assert(out((1L, 0L)) === 1L)
    assert(out((0L, 1L)) === 2L)
    assert(out((1L, 1L)) === 3L)
    assert(out((2L, 0L)) === 4L)
    assert(out((0L, 2L)) === 8L)
    assert(out((3L, 3L)) === 15L)
  }

  test("zorderKey: wide domains shift-scale into the bit budget; offsets removed") {
    // span 2^20-1 with bits=16 -> shift 4; min offset subtracted first
    val df = Seq((1000000L, 7L), (1000000L + (1L << 20) - 1, 7L))
      .toDF("x", "y")
    val z = df.withColumn("z", Bucketing.zorderKey(
      Seq(col("x"), col("y")), mins = Seq(1000000L, 7L),
      maxs = Seq(1000000L + (1L << 20) - 1, 7L), bits = 16))
      .orderBy("x").select("z").as[Long].collect()
    assert(z(0) === 0L) // min maps to code 0
    // max maps to code 65535 interleaved into even bit positions
    assert(z(1) === (0 until 16).map(i => 1L << (2 * i)).sum)
  }

  test("z-order locality: every key-range chunk bounds BOTH dimensions; a plain sort does not") {
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val keyed = Bucketing.withZorderKey(grid, Seq("x", "y"), bits = 6)
    // cut the key space into 16 equal rank chunks (what repartitionByRange
    // approximates) and measure each chunk's bounding box
    val chunked = keyed.withColumn("chunk", floor(col("zkey") / lit(256)))
    val spreads = chunked.groupBy("chunk")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(spreads.length === 16)
    // a 256-cell z-curve run sits in a small box (16x16 quadrants, at most
    // two adjacent) — far below the 63 a plain x-sort leaves on y
    assert(spreads.forall(r => r.getLong(1) <= 31 && r.getLong(2) <= 31),
      spreads.mkString(", "))
    // partitioning invariance of the key itself
    val a = keyed.orderBy("x", "y").select("zkey").as[Long].collect()
    val b = Bucketing.withZorderKey(grid.repartition(13), Seq("x", "y"), bits = 6)
      .orderBy("x", "y").select("zkey").as[Long].collect()
    assert(a.sameElements(b))
  }

  test("compactTable: folds insertInto generations, preserves bucket spec and content") {
    try {
      val base = spark.range(100).select(
        (col("id") % 10).as("k"), col("id").as("v"))
      Bucketing.materializeBucketed(base, "graft_cpt_spec", "k", 4, sortCols = Seq("k"))
      // three append generations
      for (g <- 1 to 3)
        spark.range(100L * g, 100L * g + 50)
          .select((col("id") % 10).as("k"), col("id").as("v"))
          .write.insertInto("graft_cpt_spec")
      val before = spark.table("graft_cpt_spec").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val filesBefore = spark.table("graft_cpt_spec").inputFiles.length
      Bucketing.compactTable(spark, "graft_cpt_spec")
      val after = spark.table("graft_cpt_spec").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after === before)
      val filesAfter = spark.table("graft_cpt_spec").inputFiles.length
      assert(filesAfter < filesBefore && filesAfter <= 4,
        s"$filesBefore -> $filesAfter")
      // bucket spec survived the swap
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("graft_cpt_spec"))
      assert(meta.bucketSpec.exists(bs =>
        bs.numBuckets === 4 && bs.bucketColumnNames === Seq("k")))
      // a self-join on the bucket key still runs storage-partitioned
      val t1 = spark.table("graft_cpt_spec")
      val plan = t1.groupBy("k").count()
        .join(t1.groupBy("k").agg(sum("v")), Seq("k"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(k"), plan)
      // crash recovery: emulate a torn swap (main dropped, tmp staged)
      val rows = spark.table("graft_cpt_spec")
      Bucketing.materializePlain(rows.localCheckpoint(), "graft_cpt_spec_compact_tmp")
      spark.sql("DROP TABLE graft_cpt_spec")
      Bucketing.compactTable(spark, "graft_cpt_spec") // completes swap, then folds
      assert(spark.table("graft_cpt_spec").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet === before)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_cpt_spec")
      spark.sql("DROP TABLE IF EXISTS graft_cpt_spec_compact_tmp")
    }
  }

  test("swapInPlain: staged rewrite survives a crash at every window") {
    try {
      (1L to 10L).toDF("v").write.saveAsTable("graft_swap_spec")
      // normal rewrite derived from the table itself (the maintained-fold
      // shape): no checkpoint anywhere, content swaps atomically
      Bucketing.swapInPlain(
        spark.table("graft_swap_spec").filter(col("v") <= 5L), "graft_swap_spec")
      assert(spark.table("graft_swap_spec").count() === 5L)
      assert(!spark.catalog.tableExists("graft_swap_spec_swap_tmp"))

      // crash window 1: stage written, DROP+RENAME never ran — the old
      // table stays authoritative and the stale tmp is ignored/overwritten
      (100L to 102L).toDF("v").write.saveAsTable("graft_swap_spec_swap_tmp")
      Bucketing.recoverSwap(spark, "graft_swap_spec")
      assert(spark.table("graft_swap_spec").count() === 5L)

      // crash window 2: DROP ran, RENAME did not — recovery completes the
      // swap, promoting the staged content
      spark.sql("DROP TABLE graft_swap_spec")
      Bucketing.recoverSwap(spark, "graft_swap_spec")
      assert(spark.table("graft_swap_spec").collect().map(_.getLong(0)).toSet
        === Set(100L, 101L, 102L))
      // and the next swapInPlain works from the recovered table
      Bucketing.swapInPlain(
        spark.table("graft_swap_spec").filter(col("v") > 100L), "graft_swap_spec")
      assert(spark.table("graft_swap_spec").count() === 2L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_swap_spec")
      spark.sql("DROP TABLE IF EXISTS graft_swap_spec_swap_tmp")
    }
  }

  test("zorderWrite round-trips the rows through a range-partitioned table") {
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    Bucketing.zorderWrite(grid, "graft_zorder_spec", Seq("x", "y"), files = 4, bits = 5)
    val back = spark.table("graft_zorder_spec")
    assert(back.count() === 1024)
    assert(back.columns.toSeq === Seq("x", "y"))
    assert(back.agg(sum("x"), sum("y")).as[(Long, Long)].head() ===
      ((31L * 32 / 2 * 32, 31L * 32 / 2 * 32)))
    spark.sql("DROP TABLE graft_zorder_spec")
  }
}
