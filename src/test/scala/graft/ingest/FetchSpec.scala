package graft.ingest

import java.nio.file.Files
import java.util.zip.{GZIPOutputStream, ZipEntry, ZipOutputStream}

import graft.SparkSpec
import graft.dataset.Dataset
import graft.model.{MergeConf, MetadataEvent}
import graft.model.MetadataEvent.{FetchConf, PrepConf, SetPollingSource}

class FetchSpec extends SparkSpec {
  import spark.implicits._

  test("fetch url(file://): mtime+size source state short-circuits unchanged files") {
    val f = Files.createTempFile("graft-url-", ".csv")
    Files.writeString(f, "a,b\n1,2\n")
    val first = Fetch.url(f.toString, None)
    assert(first.isDefined && first.get.sourceState.isDefined)
    // unchanged -> None
    assert(Fetch.url(f.toString, first.get.sourceState).isEmpty)
    // modified -> fetched again with a new state
    Files.writeString(f, "a,b\n1,2\n3,4\n")
    val again = Fetch.url(f.toString, first.get.sourceState)
    assert(again.isDefined && again.get.sourceState != first.get.sourceState)
  }

  test("filesGlob: ordered by name, incremental via last-file state, event time from path") {
    val dir = Files.createTempDirectory("graft-glob-")
    Files.writeString(dir.resolve("data-2024-01-02.csv"), "x\n2\n")
    Files.writeString(dir.resolve("data-2024-01-01.csv"), "x\n1\n")
    Files.writeString(dir.resolve("other.txt"), "nope")
    val (files, state) = Fetch.filesGlob(
      dir.resolve("data-*.csv").toString,
      None,
      eventTimeRegex = Some("data-(\\d{4}-\\d{2}-\\d{2})\\.csv")
    )
    assert(files.map(_.path.getFileName.toString) ===
      Seq("data-2024-01-01.csv", "data-2024-01-02.csv"))
    assert(files.map(_.eventTimeFromPath) === Seq(Some("2024-01-01"), Some("2024-01-02")))
    // nothing new -> empty, state sticks
    val (none, state2) = Fetch.filesGlob(dir.resolve("data-*.csv").toString, state)
    assert(none.isEmpty && state2 === state)
    // a newer file arrives -> only it is returned
    Files.writeString(dir.resolve("data-2024-01-03.csv"), "x\n3\n")
    val (fresh, _) = Fetch.filesGlob(dir.resolve("data-*.csv").toString, state)
    assert(fresh.map(_.path.getFileName.toString) === Seq("data-2024-01-03.csv"))
  }

  test("container fetch captures stdout; failure surfaces the exit code") {
    val fetched = Fetch.container(Seq("sh", "-c", "printf 'a,b\\n1,2\\n'"))
    assert(Files.readString(fetched.path) === "a,b\n1,2\n")
    val ex = intercept[IllegalArgumentException](Fetch.container(Seq("sh", "-c", "exit 3")))
    assert(ex.getMessage.contains("exited 3"))
  }

  test("prep: gzip and zip decompress, pipe through a command") {
    val payload = "city,population\nvancouver,675000\n"
    val gz = Files.createTempFile("graft-", ".csv.gz")
    val go = new GZIPOutputStream(Files.newOutputStream(gz))
    go.write(payload.getBytes); go.close()
    assert(Files.readString(Fetch.decompress(gz, "gzip")) === payload)

    val zip = Files.createTempFile("graft-", ".zip")
    val zo = new ZipOutputStream(Files.newOutputStream(zip))
    zo.putNextEntry(new ZipEntry("skip.txt")); zo.write("no".getBytes); zo.closeEntry()
    zo.putNextEntry(new ZipEntry("data.csv")); zo.write(payload.getBytes); zo.closeEntry()
    zo.close()
    assert(Files.readString(Fetch.decompress(zip, "zip", Some("data.csv"))) === payload)

    val plain = Files.createTempFile("graft-", ".txt")
    Files.writeString(plain, "hello world\n")
    assert(Files.readString(Fetch.pipe(plain, Seq("tr", "a-z", "A-Z"))) === "HELLO WORLD\n")
  }

  test("pollOnce: url fetch + gzip prep + merge, then up-to-date on the second poll") {
    val work = Files.createTempDirectory("graft-poll-")
    val gz = work.resolve("cities.csv.gz")
    val go = new GZIPOutputStream(Files.newOutputStream(gz))
    go.write("city,population\nvancouver,675000\nseattle,733000\n".getBytes); go.close()

    val ds = Dataset.create(spark, work.resolve("ds"), "cities")
    ds.chain.append(
      SetPollingSource(
        readFormat = "csv",
        schemaDdl = Some("city STRING, population INT"),
        merge = MergeConf("snapshot", primaryKey = Seq("city")),
        fetch = Some(FetchConf("url", url = Some(gz.toString))),
        prep = Some(Seq(PrepConf("decompress", format = Some("gzip"))))
      ),
      0L
    )
    val e1 = IngestWriter.pollOnce(ds, 1000L)
    assert(e1.isDefined && e1.get.numRecords === 2 && e1.get.sourceState.isDefined)
    // second poll: file unchanged -> no fetch, no commit
    assert(IngestWriter.pollOnce(ds, 2000L).isEmpty)
    assert(ds.toDF().count() === 2)
  }

  test("geojson + ndgeojson readers flatten properties and stringify geometry") {
    val dir = Files.createTempDirectory("graft-geo-")
    val fc = dir.resolve("fc.geojson")
    Files.writeString(
      fc,
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"name":"a","pop":1},"geometry":{"type":"Point","coordinates":[1.0,2.0]}},
        |{"type":"Feature","properties":{"name":"b","pop":2},"geometry":{"type":"Point","coordinates":[3.0,4.0]}}]}""".stripMargin
    )
    val got = Readers.geojson(spark, fc.toString).orderBy("name")
    assert(got.columns.toSeq === Seq("name", "pop", "geometry"))
    val rows = got.collect()
    assert(rows.map(_.getAs[String]("name")).toSeq === Seq("a", "b"))
    assert(rows.head.getAs[String]("geometry").contains(""""coordinates":[1.0,2.0]"""))

    val nd = dir.resolve("f.ndgeojson")
    Files.writeString(
      nd,
      """{"type":"Feature","properties":{"name":"c","pop":3},"geometry":{"type":"Point","coordinates":[5.0,6.0]}}""" + "\n"
    )
    val got2 = Readers.ndgeojson(spark, nd.toString)
    assert(got2.columns.toSeq === Seq("name", "pop", "geometry"))
    assert(got2.head().getAs[String]("name") === "c")
  }
}
