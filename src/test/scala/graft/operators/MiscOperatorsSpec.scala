package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class MiscOperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- nullability

  test("assertNotNull passes clean data and fails on nulls with the column name") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(Nullability.assertNotNull(clean, Seq("id", "v")).count() === 2)

    val dirty = Seq((1L, Some("a")), (2L, None)).toDF("id", "v")
    val ex = intercept[Exception] {
      Nullability.assertNotNull(dirty, Seq("v")).collect()
    }
    assert(ex.getMessage.contains("column 'v'"))
  }

  test("markNotNull flips the static nullable flag") {
    val df = Seq((1L, Some("a"))).toDF("id", "v")
    assert(df.schema("v").nullable)
    val coerced = Nullability.markNotNull(df, Seq("v"))
    assert(!coerced.schema("v").nullable)
    assert(coerced.collect().toSeq === df.collect().toSeq)
  }

  test("assertArrayElementsNotNull rejects null elements") {
    val bad = Seq(Seq[Option[Int]](Some(1), None)).toDF("a")
    val ex = intercept[Exception] {
      bad.select(Nullability.assertArrayElementsNotNull(col("a"), "a")).collect()
    }
    assert(ex.getMessage.contains("null element"))
    val ok = Seq(Seq(1, 2, 3)).toDF("a")
    assert(
      ok.select(Nullability.assertArrayElementsNotNull(col("a"), "a").as("a"))
        .head().getSeq[Int](0) === Seq(1, 2, 3)
    )
  }

  // ---------------------------------------------------------------- scd2

  test("scd2: corrections open new versions, retractions close without emitting, -C skipped") {
    import java.sql.Timestamp
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    // key 1: A@jan, -C/+C@feb, -R@mar; key 2: A@jan only; key 3: A@jan, -R@feb
    val led = Seq(
      (1L, 10.0, 10L, 0, ts("2024-01-01")),
      (1L, 10.0, 11L, 2, ts("2024-02-01")),
      (1L, 20.0, 12L, 3, ts("2024-02-01")),
      (1L, 0.0, 13L, 1, ts("2024-03-01")),
      (2L, 5.0, 20L, 0, ts("2024-01-01")),
      (3L, 7.0, 30L, 0, ts("2024-01-01")),
      (3L, 0.0, 31L, 1, ts("2024-02-01"))
    ).toDF("k", "bal", "offset", "op", "event_time")
    val out = Changelog.scd2(led, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4))).toSet
    assert(out === Set(
      (1L, 10.0, ts("2024-01-01"), Some(ts("2024-02-01")), 0L),
      (1L, 20.0, ts("2024-02-01"), Some(ts("2024-03-01")), 0L),
      (2L, 5.0, ts("2024-01-01"), None, 1L),
      (3L, 7.0, ts("2024-01-01"), Some(ts("2024-02-01")), 0L)))
  }

  test("scd2 open rows project to exactly Changelog.project's current state") {
    import java.sql.Timestamp
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val led = Seq(
      (1L, 10.0, 10L, 0, ts("2024-01-01")),
      (1L, 20.0, 12L, 3, ts("2024-02-01")),
      (2L, 5.0, 20L, 0, ts("2024-01-01")),
      (3L, 7.0, 30L, 0, ts("2024-01-01")),
      (3L, 0.0, 31L, 1, ts("2024-02-01"))
    ).toDF("k", "bal", "offset", "op", "event_time")
    val current = Changelog.scd2(led, Seq("k"))
      .filter(col("is_current") === 1L)
      .select(col("k"), col("bal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val projected = Changelog.project(led, Seq("k"))
      .select(col("k"), col("bal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(current === projected)
    assert(current === Map(1L -> 20.0, 2L -> 5.0))
  }

  test("scd2 maintenance: appends fold batch-by-batch to the from-scratch build; crash/retry safe") {
    import java.sql.Timestamp
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    // the three-tick ledger from the scd2 spec, split into per-tick batches
    val b0 = Seq(
      (1L, 10.0, 10L, 0, ts("2024-01-01")),
      (2L, 5.0, 20L, 0, ts("2024-01-01")),
      (3L, 7.0, 30L, 0, ts("2024-01-01"))
    ).toDF("k", "bal", "offset", "op", "event_time")
    val b1 = Seq(
      (1L, 10.0, 11L, 2, ts("2024-02-01")),
      (1L, 20.0, 12L, 3, ts("2024-02-01")),
      (3L, 0.0, 31L, 1, ts("2024-02-01")),
      (4L, 9.0, 40L, 0, ts("2024-02-01")) // brand-new key mid-stream
    ).toDF("k", "bal", "offset", "op", "event_time")
    val b2 = Seq(
      (1L, 0.0, 13L, 1, ts("2024-03-01"))
    ).toDF("k", "bal", "offset", "op", "event_time")
    def dim(table: String) = Changelog.readScd2Table(spark, table, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4))).toSet
    def fresh(dfs: org.apache.spark.sql.DataFrame*) = Changelog
      .scd2(dfs.reduce(_ unionByName _), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4))).toSet
    try {
      Changelog.materializeScd2(b0, Seq("k"), "spec_scd2m", batchId = 0L)
      assert(dim("spec_scd2m") === fresh(b0))
      Changelog.appendToScd2(b1, Seq("k"), "spec_scd2m", batchId = 1L)
      assert(dim("spec_scd2m") === fresh(b0, b1))
      // regime 2 crash: the commit landed but the ack was lost — the
      // replayed tick no-ops on the __gen guard instead of double-closing
      Changelog.appendToScd2(b1, Seq("k"), "spec_scd2m", batchId = 1L)
      assert(dim("spec_scd2m") === fresh(b0, b1))
      Changelog.appendToScd2(b2, Seq("k"), "spec_scd2m", batchId = 2L)
      val full = fresh(b0, b1, b2)
      assert(dim("spec_scd2m") === full)
      // pointInTimeJoin over the MAINTAINED dimension ≡ over the fresh one
      val facts = Seq((1L, ts("2024-01-15")), (1L, ts("2024-02-15")),
        (3L, ts("2024-02-15")), (4L, ts("2024-03-15"))).toDF("k", "fts")
      def pit(d: org.apache.spark.sql.DataFrame) = Changelog
        .pointInTimeJoin(facts, d, Seq("k"), "fts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
      assert(
        pit(Changelog.readScd2Table(spark, "spec_scd2m", Seq("k"))) ===
        pit(Changelog.scd2(b0.unionByName(b1).unionByName(b2), Seq("k"))))
      // compaction folds generations; the read is identical
      Changelog.compactScd2(spark, "spec_scd2m", Seq("k"))
      assert(dim("spec_scd2m") === full)
      assert(spark.table("spec_scd2m_scd2")
        .groupBy(col("k"), col("__vid")).count()
        .filter(col("count") > 1).count() === 0L)
      // ordering-contract violation: a batch row at an offset <= its
      // key's stored high-water version offset would silently corrupt
      // validity intervals — it must fail LOUDLY instead
      val stale = Seq((4L, 99.0, 5L, 0, ts("2024-04-01")))
        .toDF("k", "bal", "offset", "op", "event_time")
      val ex = intercept[IllegalArgumentException] {
        Changelog.appendToScd2(stale, Seq("k"), "spec_scd2m", batchId = 3L)
      }
      assert(ex.getMessage.contains("offset"))
      assert(dim("spec_scd2m") === full) // nothing committed by the failed tick
      // RETRACTED-key bypass (round-15 review find): key 1 is fully
      // closed (retracted at offset 13, event 2024-03-01); a stale row at
      // a FRESH offset but an event time inside the closed interval has
      // no open version to sort against — the all-versions __vid check
      // passes — yet it would open a version overlapping the closed one.
      // The validity high-water (event-time) check must catch it.
      val resurrect = Seq((1L, 77.0, 14L, 0, ts("2024-02-15")))
        .toDF("k", "bal", "offset", "op", "event_time")
      val ex2 = intercept[IllegalArgumentException] {
        Changelog.appendToScd2(resurrect, Seq("k"), "spec_scd2m", batchId = 3L)
      }
      assert(ex2.getMessage.contains("event time"))
      assert(dim("spec_scd2m") === full)
      // the same key CAN legitimately reappear at an event time at/after
      // the closed version's valid_to
      val legit = Seq((1L, 42.0, 14L, 0, ts("2024-04-01")))
        .toDF("k", "bal", "offset", "op", "event_time")
      Changelog.appendToScd2(legit, Seq("k"), "spec_scd2m", batchId = 3L)
      assert(dim("spec_scd2m") === fresh(b0, b1, b2, legit))
    } finally {
      spark.sql("DROP TABLE IF EXISTS spec_scd2m_scd2")
    }
  }

  test("pointInTimeJoin: facts resolve to the version valid at their ts; outside windows null") {
    import java.sql.Timestamp
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val led = Seq(
      (1L, 10.0, 10L, 0, ts("2024-01-01")),
      (1L, 20.0, 12L, 3, ts("2024-02-01")),
      (1L, 0.0, 13L, 1, ts("2024-03-01"))
    ).toDF("k", "bal", "offset", "op", "event_time")
    val dim = Changelog.scd2(led, Seq("k"))
    val facts = Seq(
      (1L, ts("2023-12-15")), // before first version -> null
      (1L, ts("2024-01-15")), // v1
      (1L, ts("2024-02-01")), // boundary: v2 opens AT its valid_from
      (1L, ts("2024-03-15")), // after retraction -> null
      (9L, ts("2024-01-15")) // unknown key -> null
    ).toDF("k", "fts")
    val out = Changelog.pointInTimeJoin(facts, dim, Seq("k"), "fts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out === Map(
      (1L, ts("2023-12-15")) -> None,
      (1L, ts("2024-01-15")) -> Some(10.0),
      (1L, ts("2024-02-01")) -> Some(20.0),
      (1L, ts("2024-03-15")) -> None,
      (9L, ts("2024-01-15")) -> None))
  }

  // -------------------------------------------------------------- export

  private val exportDf = Seq((1L, "x,\"y\"", 1.5), (2L, null, 2.0)).toDF("id", "s", "d")

  test("response encoders: JsonAoS / JsonAoA / JsonSoA / CSV") {
    assert(Export.jsonAoS(exportDf.orderBy("id")) ===
      """[{"id":1,"s":"x,\"y\"","d":1.5},{"id":2,"d":2.0}]""")
    assert(Export.jsonAoA(exportDf.orderBy("id")) ===
      """[[1,"x,\"y\"",1.5],[2,null,2.0]]""")
    assert(Export.jsonSoA(exportDf.orderBy("id")) ===
      """{"id":[1,2],"s":["x,\"y\"",null],"d":[1.5,2.0]}""")
    val csv = Export.csvString(exportDf.orderBy("id"))
    // null cell -> EMPTY field, not the string "null"
    assert(csv.linesIterator.toSeq === Seq("id,s,d", "1,\"x,\"\"y\"\"\",1.5", "2,,2.0"))
  }

  test("export sinks round-trip through files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-export-")
    Export.toParquet(exportDf, dir.resolve("p").toString, coalesce = Some(1))
    assert(spark.read.parquet(dir.resolve("p").toString).count() === 2)
    Export.toNdjson(exportDf, dir.resolve("j").toString, coalesce = Some(1))
    assert(spark.read.json(dir.resolve("j").toString).count() === 2)
    Export.toCsv(exportDf, dir.resolve("c").toString, coalesce = Some(1))
    assert(spark.read.option("header", "true").csv(dir.resolve("c").toString).count() === 2)
  }

  // ---------------------------------------------------------- multimodal

  test("multimodal: metadata struct, fingerprint, synthetic features are deterministic") {
    val imgs = Seq(
      (1L, "fake-image-bytes-aaaa".getBytes, "image/png", 64, 48),
      (2L, "fake-image-bytes-bbbb".getBytes, "image/png", 32, 32)
    ).toDF("id", "content", "mt", "w", "h")
      .withColumn(
        "meta",
        Multimodal.withMediaMeta(col("mt"), col("w"), col("h"), lit(0L))
      )

    val feats = imgs
      .select(col("id"), Multimodal.syntheticContentFeatures(col("content"), 8).as("f"),
        Multimodal.mediaFingerprint(col("content")).as("fp"),
        Multimodal.mediaSize(col("content")).as("sz"))
    val rows = feats.orderBy("id").collect()
    assert(rows.forall(_.getSeq[Double](1).size == 8))
    assert(rows.forall(_.getSeq[Double](1).forall(v => v >= -1.0 && v <= 1.0)))
    assert(rows(0).getLong(2) !== rows(1).getLong(2)) // distinct content -> distinct fp
    assert(rows(0).getLong(3) === "fake-image-bytes-aaaa".length.toLong)
    // deterministic across evaluations
    assert(feats.orderBy("id").collect().toSeq === rows.toSeq)
  }

  test("multimodal: frame sampling yields bounded binary slices; partition harness works") {
    val vids = Seq((1L, Array.fill[Byte](1000)(7))).toDF("id", "content")
    val frames = vids
      .select(Multimodal.frameSlices(col("content"), n = 4, frameBytes = 16).as("fr"))
      .head()
      .getSeq[Array[Byte]](0)
    assert(frames.size === 4 && frames.forall(_.length <= 16))

    val out = Multimodal.processMediaPartitions(
      vids,
      "content",
      StructType(Seq(StructField("id", LongType), StructField("n", IntegerType)))
    )(rows => rows.map(r => Row(r.getLong(0), r.getAs[Array[Byte]](1).length)))
    assert(out.head() === Row(1L, 1000))
  }
}
