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

  test("REST adapter: Arrow IPC result surface and schema formats") {
    import graft.operators.ArrowCodec
    val ds = mkCityDataset()
    val qs = new QueryService(spark, Map("cities" -> ds))
    val server = new RestServer(qs, Map("cities" -> ds)).start()
    val base = s"http://127.0.0.1:${server.boundPort}"
    val client = HttpClient.newHttpClient()
    try {
      // query result as Arrow IPC bytes, parsed back by the codec
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(base + "/query"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"query":"SELECT city, population FROM cities WHERE op = 0 ORDER BY city","format":"arrow"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofByteArray()
      )
      assert(resp.statusCode() === 200)
      assert(resp.headers().firstValue("Content-Type").get()
        === "application/vnd.apache.arrow.stream")
      assert(resp.headers().firstValue("X-Graft-State").get().startsWith("cities="))
      val back = ArrowCodec.fromArrowIpc(spark, resp.body())
      val rows = back.orderBy("city").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(rows === Seq(("seattle", 733000), ("vancouver", 675000)))

      // schema formats
      def get(path: String): String =
        client.send(
          HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
          HttpResponse.BodyHandlers.ofString()).body()
      assert(get("/datasets/cities/schema").contains(""""format":"ddl""""))
      assert(get("/datasets/cities/schema?format=json").contains(""""type":"struct""""))
      val pq = get("/datasets/cities/schema?format=parquet")
      assert(pq.contains("message") && pq.contains("city"))
      val ar = get("/datasets/cities/schema?format=arrow")
      assert(ar.contains(""""format":"arrow"""") && ar.contains("population"))
      assert(get("/datasets/cities/schema?format=nope").contains("unknown schema format"))
    } finally server.stop()
  }

  test("REST adapter: signed query proof attached on request") {
    import graft.query.QueryProof
    val ds = mkCityDataset()
    val qs = new QueryService(spark, Map("cities" -> ds))
    val key = QueryProof.generateKeyPair()
    val server = new RestServer(qs, Map("cities" -> ds), nodeKey = Some(key)).start()
    val client = HttpClient.newHttpClient()
    try {
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.boundPort}/query"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"query":"SELECT city FROM cities ORDER BY city","proof":true}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200)
      val body = resp.body()
      assert(body.contains(""""proof":{"""))
      assert(body.contains(""""signature":"""))
      // extract + verify: pins from state, digest/hash/sig from proof
      def field(k: String): String =
        s""""$k":"([^"]+)"""".r.findFirstMatchIn(body).get.group(1)
      val pin = """"cities":"([0-9a-f]+)"""".r.findFirstMatchIn(body).get.group(1)
      val proof = QueryProof(
        queryDigest = field("queryDigest"),
        inputs = Map("cities" -> pin),
        resultHash = field("resultHash"),
        signature = Some(field("signature")),
        publicKey = Some(field("publicKey")))
      assert(proof.signatureValid)
      assert(qs.reproduce("SELECT city FROM cities ORDER BY city", proof))
    } finally server.stop()
  }

  test("Arrow codec: all scalar types and nulls round-trip exactly") {
    import graft.operators.ArrowCodec
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("ts", TimestampType),
      StructField("dt", DateType)))
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2024-05-06T07:08:09.123456Z"))
    val rows = Seq(
      Row(true, 1, 2L, 1.5f, 2.5, "x", Array[Byte](1, 2), ts, java.sql.Date.valueOf("2024-05-06")),
      Row(null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val bytes = ArrowCodec.toArrowIpc(df)
    val back = ArrowCodec.fromArrowIpc(spark, bytes).orderBy(org.apache.spark.sql.functions.col("i").asc_nulls_last)
    val got = back.collect()
    assert(got.length === 2)
    assert(got(0).getBoolean(0) === true && got(0).getInt(1) === 1 && got(0).getLong(2) === 2L)
    assert(got(0).getAs[Array[Byte]](6).toSeq === Seq[Byte](1, 2))
    assert(got(0).getAs[java.sql.Timestamp](7) === ts) // microsecond precision preserved
    assert(got(0).getAs[java.sql.Date](8).toString === "2024-05-06")
    assert((0 until 9).forall(got(1).isNullAt))
  }
}
