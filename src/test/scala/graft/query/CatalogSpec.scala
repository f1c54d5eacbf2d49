package graft.query

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.operators.MergeStrategy

/** DSv2 `graft` catalog: datasets visible to plain `spark.sql` with as-of
  * time travel and chain-level file pruning (kamu_catalog.rs/kamu_table.rs). */
class CatalogSpec extends SparkSpec {

  private lazy val ws = {
    val root = Files.createTempDirectory("graft-catalog-ws-")
    import spark.implicits._
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "score")
      .withColumn("event_time", to_timestamp(lit("2024-01-01 00:00:00")))
    val ds = Dataset.create(spark, root.resolve("people"), "people")
    val strat = MergeStrategy.Append()
    IngestWriter.writeBatch(ds, df.filter(col("id") <= 2), strat, 1000L)
    val headAfter1 = ds.chain.head.get._2
    IngestWriter.writeBatch(ds, df.filter(col("id") === 3), strat, 2000L)
    GraftCatalog.register(spark, "graft", root.toUri.toString)
    (root, headAfter1)
  }

  test("catalog table read matches Dataset.toDF") {
    val (root, _) = ws
    val viaCatalog = spark.sql("SELECT id, name, score FROM graft.default.people ORDER BY id")
    val direct = Dataset.open(spark, root.resolve("people")).toDF()
      .select("id", "name", "score").orderBy("id")
    assertSameRows(viaCatalog, direct, ordered = true)
    assert(viaCatalog.count() === 3)
  }

  test("VERSION AS OF pins to a mid-chain head and prunes slice files") {
    val (root, headAfter1) = ws
    val pinned = spark.sql(
      s"SELECT id FROM graft.default.people VERSION AS OF '$headAfter1' ORDER BY id")
    assert(pinned.as[Long](spark.implicits.newLongEncoder).collect().toSeq === Seq(1L, 2L))
    // chain-level pruning: the pinned scan must plan over ONLY the first slice file
    assert(scanFileCount(pinned) === 1)
    assert(scanFileCount(spark.table("graft.default.people")) === 2)
  }

  /** Files the DSv2 parquet scan was planned over (v2 relations don't
    * surface `DataFrame.inputFiles`). */
  private def scanFileCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan
      .collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.scan
      }
      .collectFirst { case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
        f.fileIndex.inputFiles.length
      }
      .getOrElse(fail("no FileScan in plan"))

  test("DataFrameReader versionAsOf option routes to the same pin") {
    val (_, headAfter1) = ws
    val pinned = spark.read.option("versionAsOf", headAfter1).table("graft.default.people")
    assert(pinned.count() === 2)
  }

  test("SHOW TABLES lists datasets; unknown table/namespace rejected") {
    ws
    val tables = spark.sql("SHOW TABLES IN graft.default").select("tableName")
      .collect().map(_.getString(0)).toSeq
    assert(tables === Seq("people"))
    intercept[Exception](spark.sql("SELECT * FROM graft.default.nope").collect())
    intercept[Exception](spark.table("graft.other.people").collect())
  }

  test("predicate pushdown reaches the parquet scan through the catalog") {
    ws
    val plan = spark.sql("SELECT id FROM graft.default.people WHERE id = 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"))
  }

  test("QueryService.viaCatalog routes pinned reads through the catalog") {
    val (root, headAfter1) = ws
    val qs = QueryService.viaCatalog(spark, "graft", root.toUri.toString)
    assert(qs.knownDatasets === Seq("people"))
    val head = qs.sql("SELECT count(*) AS n FROM people")
    assert(head.collect().head.getLong(0) === 3)
    val pinned = qs.sql("SELECT count(*) AS n FROM people",
      asOf = Map("people" -> headAfter1))
    assert(pinned.collect().head.getLong(0) === 2)
  }

  test("catalog is read-only") {
    ws
    intercept[Exception](spark.sql("DROP TABLE graft.default.people"))
    intercept[Exception](
      spark.sql("CREATE TABLE graft.default.t2 (x INT) USING parquet"))
  }
}
