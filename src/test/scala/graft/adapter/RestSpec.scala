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

class RestSpec extends SparkSpec {

  private def mkCityDataset(): Dataset = {
    val work = Files.createTempDirectory("graft-rest-")
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

  test("REST adapter: query, tail, push ingest, errors") {
    val ds = mkCityDataset()
    val qs = new QueryService(spark, Map("cities" -> ds))
    val server = new RestServer(qs, Map("cities" -> ds)).start()
    val base = s"http://127.0.0.1:${server.boundPort}"
    val client = HttpClient.newHttpClient()
    def post(path: String, body: String): HttpResponse[String] =
      client.send(
        HttpRequest.newBuilder(URI.create(base + path))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString()
      )
    def get(path: String): HttpResponse[String] =
      client.send(
        HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
        HttpResponse.BodyHandlers.ofString()
      )

    try {
      // dataset listing
      assert(get("/datasets").body() === """["cities"]""")

      // SQL over the pinned dataset
      val q = post("/query", """{"query":"SELECT city, population FROM cities WHERE op = 0 ORDER BY city","limit":10}""")
      assert(q.statusCode() === 200)
      assert(q.body().contains(""""city":"seattle""""))
      assert(q.body().contains(""""state":{"cities":""")) // pinned block hash present

      // tail
      val t = get("/datasets/cities/tail?n=1")
      assert(t.statusCode() === 200 && t.body().contains(""""offset":1"""))

      // push ingest: a new snapshot — seattle grows, vancouver retracted
      val p = post("/datasets/cities/ingest?format=csv", "city,population\nseattle,750000\n")
      assert(p.statusCode() === 200 && p.body().contains(""""committed":true"""))
      assert(ds.toDF().count() === 5) // 2 appends + retract + correction pair

      // identical push -> up to date
      val p2 = post("/datasets/cities/ingest?format=csv", "city,population\nseattle,750000\n")
      assert(p2.body().contains(""""upToDate":true"""))

      // bad SQL -> 400 with an error payload
      val bad = post("/query", """{"query":"SELECT FROM"}""")
      assert(bad.statusCode() === 400 && bad.body().contains("error"))

      // unknown dataset ingest -> 404
      assert(post("/datasets/nope/ingest", "x").statusCode() === 404)

      // declared push source: ?source= routes through AddPushSource config
      ds.chain.append(
        graft.model.MetadataEvent.AddPushSource(
          "api",
          readFormat = "ndjson",
          schemaDdl = Some("city STRING, population INT"),
          merge = MergeConf("snapshot", primaryKey = Seq("city"))
        ),
        5000L
      )
      val p3 = post(
        "/datasets/cities/ingest?source=api",
        """{"city":"seattle","population":750000}
          |{"city":"kyiv","population":2884000}
          |""".stripMargin
      )
      assert(p3.statusCode() === 200 && p3.body().contains(""""committed":true"""))
      // kyiv appended; seattle unchanged (snapshot merge vs current state)
      val afterPush = ds.toDF().filter("op = 0 AND city = 'kyiv'").count()
      assert(afterPush === 1)
      // unknown source name -> error payload
      val p4 = post("/datasets/cities/ingest?source=nope", "{}")
      assert(p4.statusCode() === 400 && p4.body().contains("no enabled push source"))
    } finally server.stop()
  }
}
