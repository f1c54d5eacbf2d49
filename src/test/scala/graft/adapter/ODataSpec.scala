package graft.adapter

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkSpec
import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.model.MergeConf
import graft.model.MetadataEvent.SetPollingSource
import graft.query.QueryService

class ODataSpec extends SparkSpec {

  private def mkCityDataset(): Dataset = {
    val work = Files.createTempDirectory("graft-odata-")
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
    Files.writeString(csv, "city,population\nvancouver,675000\nseattle,733000\nkyiv,2884000\n")
    IngestWriter.ingestFile(ds, csv.toString, 1000L)
    ds
  }

  test("$filter translation: comparison subset, validated columns, null handling") {
    val cols = Set("city", "population", "op")
    assert(OData.filterToSql("population gt 700000", cols) === "population > 700000")
    assert(OData.filterToSql("city eq 'kyiv' and population ge 10", cols)
      === "city = 'kyiv' AND population >= 10")
    assert(OData.filterToSql("city ne null or op eq 0", cols)
      === "city IS NOT NULL OR op = 0")
    intercept[IllegalArgumentException](OData.filterToSql("nope eq 1", cols))
    intercept[IllegalArgumentException](OData.filterToSql("population gt 1; DROP TABLE x", cols))
    intercept[IllegalArgumentException](OData.filterToSql("population gt (1)", cols))
  }

  test("OData endpoints: service doc, $metadata, entity-set query options") {
    val ds = mkCityDataset()
    val qs = new QueryService(spark, Map("cities" -> ds))
    val server = new RestServer(qs, Map("cities" -> ds)).start()
    val base = s"http://127.0.0.1:${server.boundPort}"
    val client = HttpClient.newHttpClient()
    def get(path: String): HttpResponse[String] =
      client.send(
        HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
    def enc(s: String) = URLEncoder.encode(s, UTF_8)
    try {
      // service document lists the entity set
      val doc = get("/odata").body()
      assert(doc.contains(""""name":"cities"""") && doc.contains(""""kind":"EntitySet""""))

      // $metadata: EDMX with typed properties
      val md = get("/odata/$metadata")
      assert(md.headers().firstValue("Content-Type").get() === "application/xml")
      assert(md.body().contains("""<EntityType Name="cities">"""))
      assert(md.body().contains("""<Property Name="city" Type="Edm.String""""))
      assert(md.body().contains("""<Property Name="population" Type="Edm.Int32""""))
      assert(md.body().contains("""<Property Name="offset" Type="Edm.Int64""""))
      assert(md.body().contains("""<EntitySet Name="cities" EntityType="graft.cities"/>"""))

      // filtered + ordered + projected + topped query
      val q = get(s"/odata/cities?$$filter=${enc("population gt 700000 and op eq 0")}" +
        s"&$$select=city,population&$$orderby=${enc("population desc")}&$$top=1")
      assert(q.statusCode() === 200)
      assert(q.body().contains(""""@odata.context""""))
      assert(q.body().contains(""""city":"kyiv""""))
      assert(!q.body().contains("seattle"))

      // $skip pages past the first row
      val q2 = get(s"/odata/cities?$$filter=${enc("op eq 0")}" +
        s"&$$select=city&$$orderby=city&$$skip=1&$$top=1")
      assert(q2.body().contains("seattle") && !q2.body().contains("kyiv"))

      // bad column -> 400 with error payload
      val bad = get(s"/odata/cities?$$filter=${enc("nope eq 1")}")
      assert(bad.statusCode() === 400 && bad.body().contains("unknown column"))
      // unknown entity set -> 404
      assert(get("/odata/nope").statusCode() === 404)
    } finally server.stop()
  }
}
