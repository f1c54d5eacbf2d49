package graft.adapter

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.SparkSpec
import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.model.MergeConf
import graft.model.MetadataEvent.SetPollingSource
import graft.query.QueryService

class GraphQLSpec extends SparkSpec {

  private def mkCityDataset(): Dataset = {
    val work = Files.createTempDirectory("graft-gql-")
    val ds = Dataset.create(spark, work.resolve("cities"), "cities")
    ds.chain.append(
      SetPollingSource(
        readFormat = "csv",
        schemaDdl = Some("city STRING, population INT"),
        merge = MergeConf("snapshot", primaryKey = Seq("city"))
      ),
      0L
    )
    val csv = work.resolve("r1.csv")
    Files.writeString(csv, "city,population\nvancouver,675000\nseattle,733000\n")
    IngestWriter.ingestFile(ds, csv.toString, 1000L)
    ds
  }

  test("parser: selection sets, arguments, strings with escapes") {
    val fields = GraphQL.parse(
      """query Q { dataset(name: "citi\"es") { tail(limit: 5) query(sql: "SELECT 1") } }""")
    assert(fields.map(_.name) === List("dataset"))
    assert(fields.head.args === Map("name" -> "citi\"es"))
    assert(fields.head.subs.map(_.name) === List("tail", "query"))
    assert(fields.head.subs.head.args === Map("limit" -> "5"))
    intercept[IllegalArgumentException](GraphQL.parse("{ unclosed"))
    intercept[IllegalArgumentException](GraphQL.parse("{ x(bad) }"))
  }

  test("executor: datasets listing, dataset fields, tail/query/state, errors") {
    val ds = mkCityDataset()
    val qs = new QueryService(spark, Map("cities" -> ds))
    val dss = Map("cities" -> ds)

    val listing = GraphQL.execute(qs, dss, "{ datasets { name kind head } }")
    assert(listing.contains(""""name":"cities""""))
    assert(listing.contains(""""kind":"root""""))
    assert(ds.chain.head.exists(h => listing.contains(h._2)))

    val data = GraphQL.execute(qs, dss,
      """{ dataset(name: "cities") {
        |    schema
        |    tail(limit: 1)
        |    query(sql: "SELECT city FROM cities WHERE population > 700000 AND op = 0", limit: 5)
        |} }""".stripMargin)
    assert(data.contains(""""schema":"offset BIGINT"""))
    assert(data.contains(""""tail":[{"offset":1"""))
    assert(data.contains(""""query":[{"city":"seattle"}]"""))

    // state = changelog projection via the recorded primary key
    val state = GraphQL.execute(qs, dss, """{ dataset(name: "cities") { state } }""")
    assert(state.contains(""""city":"seattle"""") && state.contains(""""city":"vancouver""""))

    // errors use the standard envelope
    assert(GraphQL.execute(qs, dss, "{ nope }").contains(""""errors":[{"message":"unknown root field"""))
    assert(GraphQL.execute(qs, dss, """{ dataset(name: "nope") { name } }""")
      .contains("unknown dataset"))

    // lineage field: a root dataset is its own single node
    val lin = GraphQL.execute(qs, dss, """{ dataset(name: "cities") { lineage } }""")
    assert(lin.contains(""""lineage":[{"name":"cities","kind":"root","depth":0"""), lin)
    assert(lin.contains(""""inputs":[]"""), lin)
  }

  test("REST /graphql endpoint round-trips") {
    val ds = mkCityDataset()
    val qs = new QueryService(spark, Map("cities" -> ds))
    val server = new RestServer(qs, Map("cities" -> ds)).start()
    val client = HttpClient.newHttpClient()
    try {
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.boundPort}/graphql"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"query":"{ dataset(name: \"cities\") { tail(limit: 1) } }"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200)
      assert(resp.body().startsWith("""{"data":{"dataset":{"tail":["""))
    } finally server.stop()
  }
}
