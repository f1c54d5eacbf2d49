package graft.query

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Temporal

class QuerySpec extends SparkSpec {
  import spark.implicits._

  test("extractTableRefs finds refs through joins and CTEs, excluding CTE aliases") {
    val qs = new QueryService(spark, Map.empty)
    val refs = qs.extractTableRefs(
      """WITH top AS (SELECT * FROM orders WHERE o_totalprice > 10)
        |SELECT * FROM top t JOIN customer c ON t.o_custkey = c.c_custkey
        |UNION ALL SELECT * FROM archive.orders2""".stripMargin
    )
    assert(refs.toSet === Set("orders", "customer", "archive.orders2"))
  }

  test("toTable resolves refs, schema introspection serves DDL + JSON, page bounds results") {
    import graft.dataset.Dataset
    import graft.ingest.IngestWriter
    import graft.operators.MergeStrategy
    val work = java.nio.file.Files.createTempDirectory("graft-qsvc-")
    val ds = Dataset.create(spark, work.resolve("nums"), "nums")
    IngestWriter.writeBatch(
      ds,
      spark.range(10).select(col("id"), (col("id") * 2).as("v")),
      MergeStrategy.Append(),
      systemTime = 1000L
    )
    val qs = new QueryService(spark, Map("nums" -> Dataset.open(spark, work.resolve("nums"))))

    assert(qs.toTable("nums").count() === 10)
    intercept[IllegalArgumentException](qs.toTable("nope"))

    val ddl = qs.schemaDdl("nums")
    assert(ddl.isDefined && ddl.get.contains("offset") && ddl.get.contains("v"))
    val json = qs.schemaJson("nums").get
    assert(json.contains("\"name\":\"v\"") && json.contains("struct"))

    val pageRows = qs.page(qs.toTable("nums").orderBy("offset"), skip = 3, limit = 4)
      .select("offset").as[Long].collect().toSeq
    assert(pageRows === Seq(3L, 4L, 5L, 6L))
    // default limit caps at 100
    assert(qs.page(qs.toTable("nums").orderBy("offset")).count() === 10)
    assert(qs.knownDatasets === Seq("nums"))
  }

  test("as-of pinning applies to refs used only inside a CTE") {
    import graft.dataset.Dataset
    import graft.ingest.IngestWriter
    import graft.operators.MergeStrategy
    val work = java.nio.file.Files.createTempDirectory("graft-ctepin-")
    val ds = Dataset.create(spark, work.resolve("m"), "m")
    IngestWriter.writeBatch(ds, Seq((1L, "a")).toDF("id", "v"), MergeStrategy.Append(), 1000L)
    val head1 = ds.chain.head.get._2
    IngestWriter.writeBatch(ds, Seq((2L, "b")).toDF("id", "v"), MergeStrategy.Append(), 2000L)

    val qs = new QueryService(spark, Map("m" -> Dataset.open(spark, work.resolve("m"))))
    val sql = "WITH c AS (SELECT * FROM m) SELECT count(*) AS n FROM c"
    // head: both rows
    assert(qs.sql(sql).head().getLong(0) === 2L)
    // pinned to round 1 — the CTE body's ref is pinned too
    val (pinned, state) = qs.sqlWithState(sql, asOf = Map("m" -> head1))
    assert(pinned.head().getLong(0) === 1L)
    assert(state.inputs === Map("m" -> head1))
  }

  test("asOfJoin picks the latest right row at or before each left time") {
    def t(s: String) = Timestamp.from(Instant.parse(s))
    val rates = Seq(
      ("cad", t("2024-01-01T00:00:00Z"), 1.30),
      ("cad", t("2024-01-03T00:00:00Z"), 1.35),
      ("eur", t("2024-01-02T00:00:00Z"), 0.90)
    ).toDF("cur", "rt", "rate")
    val trades = Seq(
      (1L, "cad", t("2024-01-02T12:00:00Z")), // between the two cad rates -> 1.30
      (2L, "cad", t("2024-01-03T00:00:00Z")), // exactly at the second -> 1.35
      (3L, "eur", t("2024-01-01T00:00:00Z")), // before any eur rate -> no match
      (4L, "eur", t("2024-01-05T00:00:00Z")) // after -> 0.90
    ).toDF("id", "cur", "tt")

    val inner = Temporal
      .asOfJoin(trades, rates, Seq("cur"), "tt", "rt")
      .select(trades("id"), col("rate"))
      .as[(Long, Double)]
      .collect()
      .toMap
    assert(inner === Map(1L -> 1.30, 2L -> 1.35, 4L -> 0.90))

    // left join keeps unmatched rows with null rate
    val left = Temporal
      .asOfJoin(trades, rates, Seq("cur"), "tt", "rt", joinType = "left")
      .select(trades("id"), col("rate"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)))
      .toMap
    assert(left(3L).isEmpty && left.size === 4)
  }

  test("query proofs: signed, reproducible against pinned state, tamper-evident") {
    import graft.dataset.Dataset
    import graft.ingest.IngestWriter
    import graft.operators.MergeStrategy
    val work = java.nio.file.Files.createTempDirectory("graft-proof-")
    val ds = Dataset.create(spark, work.resolve("nums"), "nums")
    IngestWriter.writeBatch(ds,
      spark.range(10).select(col("id"), (col("id") * 2).as("v")),
      MergeStrategy.Append(), systemTime = 1000L)
    val qs = new QueryService(spark, Map("nums" -> Dataset.open(spark, work.resolve("nums"))))
    val key = QueryProof.generateKeyPair()
    val stmt = "SELECT id, v FROM nums WHERE id < 5"

    val (df, proof) = qs.sqlProved(stmt, nodeKey = Some(key))
    assert(df.count() === 5)
    assert(proof.signatureValid)
    assert(proof.inputs.keySet === Set("nums"))

    // reproduction against the pinned block hash succeeds
    assert(qs.reproduce(stmt, proof))

    // ...even after NEW data lands (the pin isolates the proof from growth)
    IngestWriter.writeBatch(ds,
      spark.range(10, 20).select(col("id"), (col("id") * 2).as("v")),
      MergeStrategy.Append(), systemTime = 2000L)
    val qs2 = new QueryService(spark, Map("nums" -> Dataset.open(spark, work.resolve("nums"))))
    assert(qs2.reproduce(stmt, proof))
    // while a fresh un-pinned run sees the new head (different pin)
    val (_, proof2) = qs2.sqlProved(stmt)
    assert(proof2.inputs("nums") !== proof.inputs("nums"))

    // tampering with any field breaks the signature
    assert(!proof.copy(resultHash = "0" * 16).signatureValid)
    assert(!proof.copy(inputs = Map("nums" -> "deadbeef")).signatureValid)
    // a different statement fails reproduction outright
    assert(!qs2.reproduce("SELECT id, v FROM nums", proof))
    // a lying result hash fails reproduction
    assert(!qs2.reproduce(stmt, proof.copy(resultHash = "0-0")))
  }
}
