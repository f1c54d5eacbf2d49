package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dataset.Dataset
import graft.ingest.IngestWriter

/** Incremental rollup maintenance: op-weighted partials equal a fresh
  * GROUP BY over the current state through appends, corrections, and full
  * retractions; refreshes read only the new slices. */
class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def tick(ds: Dataset, rows: Seq[(Long, String, Double)], iso: String): Unit =
    IngestWriter.writeBatch(
      ds,
      rows.toDF("k", "grp", "v"),
      MergeStrategy.Snapshot(Seq("k")),
      java.time.Instant.parse(iso).toEpochMilli)

  test("rollup tracks state through +A / -C+C / -R; zero groups vanish; no-op when unmoved") {
    val work = java.nio.file.Files.createTempDirectory("graft-rollupspec-")
    val ds = Dataset.create(spark, work.resolve("d"), "d")
    val table = "rollup_spec_t"
    try {
      tick(ds, Seq((1L, "a", 10.5), (2L, "a", 1.25), (3L, "b", 7.0)), "2024-01-01T00:00:00Z")
      Rollup.refresh(Dataset.open(spark, work.resolve("d")), table, Seq("grp"), Seq("v"))
      def state(): Map[String, (Long, Double)] =
        Rollup.read(spark, table, Seq("v")).collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(state() === Map("a" -> ((2L, 11.75)), "b" -> ((1L, 7.0))))

      // tick 2: correct k=2's value AND group; drop k=3 entirely (snapshot
      // retraction); add k=4
      tick(ds, Seq((1L, "a", 10.5), (2L, "b", 2.0), (4L, "c", 3.5)), "2024-01-02T00:00:00Z")
      val ds2 = Dataset.open(spark, work.resolve("d"))
      // the refresh input is file-pruned to the NEW slice only
      val prevOff = Rollup.lastOffset(spark, table).get
      val newFiles = ds2.changesSince(Some(prevOff)).inputFiles.length
      val allFiles = ds2.toDF().inputFiles.length
      assert(newFiles < allFiles, s"$newFiles vs $allFiles")
      Rollup.refresh(ds2, table, Seq("grp"), Seq("v"))
      // group b: -R(3,b,7.0) from the drop... k=3 was in b; k=2 moved a->b
      assert(state() === Map("a" -> ((1L, 10.5)), "b" -> ((1L, 2.0)), "c" -> ((1L, 3.5))))

      // tick 3: retract everything in group c -> the group vanishes
      tick(ds, Seq((1L, "a", 10.5), (2L, "b", 2.0)), "2024-01-03T00:00:00Z")
      Rollup.refresh(Dataset.open(spark, work.resolve("d")), table, Seq("grp"), Seq("v"))
      assert(state() === Map("a" -> ((1L, 10.5)), "b" -> ((1L, 2.0))))
      assert(!state().contains("c"))

      // unmoved dataset: refresh is a no-op (state offset unchanged)
      val before = Rollup.lastOffset(spark, table).get
      Rollup.refresh(Dataset.open(spark, work.resolve("d")), table, Seq("grp"), Seq("v"))
      assert(Rollup.lastOffset(spark, table).get === before)
      // fully-retracted group c: invisible to read(), retained in storage
      // as an offset carrier
      assert(spark.table(table).filter(col("grp") === "c").count() === 1)

      // maintained rollup == fresh GROUP BY over the projected state
      val fresh = Changelog.project(
          Dataset.open(spark, work.resolve("d")).toDF(), Seq("k"))
        .groupBy("grp").agg(count(lit(1)), sum(col("v").cast("decimal(18,6)")).cast("double"))
        .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(state() === fresh)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_state")
    }
  }

  test("distinctCol registers: N generations equal a fresh per-cell sketch; reads stay clean") {
    val work = java.nio.file.Files.createTempDirectory("graft-rollupspec3-")
    val ds = Dataset.create(spark, work.resolve("d"), "d")
    val table = "rollup_spec_hll"
    // ledger-style appends (no retractions: HLL counts ever-seen values)
    def app(rows: Seq[(Long, String, Double)], iso: String): Unit =
      IngestWriter.writeBatch(ds, rows.toDF("k", "grp", "v"),
        MergeStrategy.Ledger(Seq("k")),
        java.time.Instant.parse(iso).toEpochMilli)
    try {
      val all = (1L to 300L).map(k => (k, if (k % 3 == 0) "a" else "b", k.toDouble))
      app(all.take(100), "2024-01-01T00:00:00Z")
      Rollup.refresh(Dataset.open(spark, work.resolve("d")), table,
        Seq("grp"), Seq("v"), distinctCol = Some("k"))
      app(all.slice(100, 200), "2024-01-02T00:00:00Z")
      Rollup.refresh(Dataset.open(spark, work.resolve("d")), table,
        Seq("grp"), Seq("v"), distinctCol = Some("k"))
      app(all.drop(200), "2024-01-03T00:00:00Z")
      Rollup.refresh(Dataset.open(spark, work.resolve("d")), table,
        Seq("grp"), Seq("v"), distinctCol = Some("k"))
      def m(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val maintained = m(Rollup.readDistinct(spark, table, Seq("grp")))
      val fresh = m(Sketches.hllStats(
        Sketches.hllSketch(all.toDF("k", "grp", "v"), Seq("grp"), "k"), Seq("grp")))
      assert(maintained === fresh) // register max-merge is lossless across generations
      // the aggregate read is untouched by the cohabiting register rows
      val agg = Rollup.read(spark, table, Seq("v")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(agg === Map("a" -> ((100L, all.filter(_._2 == "a").map(_._3).sum)),
        "b" -> ((200L, all.filter(_._2 == "b").map(_._3).sum))))
      assert(!agg.keySet.contains(null)) // no register-row leakage
      // distinct registers reject the cube path loudly
      intercept[IllegalArgumentException] {
        Rollup.refresh(Dataset.open(spark, work.resolve("d")), table,
          Seq("grp"), Seq("v"), cube = true, distinctCol = Some("k"))
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("changesSince upper bound excludes rows appended after the head read") {
    val work = java.nio.file.Files.createTempDirectory("graft-rollupspec2-")
    val ds = Dataset.create(spark, work.resolve("d"), "d")
    tick(ds, Seq((1L, "a", 1.0), (2L, "a", 2.0)), "2024-01-01T00:00:00Z")
    val head = ds.chain.lastOffset() // a refresh observes THIS head...
    // ...and a concurrent writer lands another slice before the (lazy)
    // delta executes
    tick(ds, Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 9.0)), "2024-01-02T00:00:00Z")
    val ds2 = Dataset.open(spark, work.resolve("d"))
    val bounded = ds2.changesSince(None, upTo = head)
    assert(bounded.agg(max(col(ds2.vocabulary.offsetColumn))).head().getLong(0) === head.get)
    // the bounded read also FILE-prunes the late slice, not just filters it
    assert(bounded.inputFiles.length < ds2.changesSince(None).inputFiles.length)
  }
}
