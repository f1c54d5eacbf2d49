package graft.adapter

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.operators.MergeStrategy

/** End-to-end JDBC: a real HiveServer2 wire connection (the bundled Hive
  * JDBC driver) querying datasets through the DSv2 catalog, including
  * VERSION AS OF time travel — the BI-tool access path. */
class JdbcServerSpec extends SparkSpec {
  import spark.implicits._

  test("JDBC client reads datasets through the graft catalog, incl. VERSION AS OF") {
    val root = Files.createTempDirectory("graft-jdbc-ws-")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
      .withColumn("event_time", to_timestamp(lit("2024-01-01 00:00:00")))
    val ds = Dataset.create(spark, root.resolve("people"), "people")
    IngestWriter.writeBatch(ds, df.filter(col("id") <= 2), MergeStrategy.Append(), 1000L)
    val headAfter1 = ds.chain.head.get._2
    IngestWriter.writeBatch(ds, df.filter(col("id") === 3), MergeStrategy.Append(), 2000L)

    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    val stopServer = JdbcServer.start(spark, root.toUri.toString, port, catalogName = "graftjdbc")
    try {
      // the server binds asynchronously; retry the connect briefly
      val conn = Iterator.range(0, 60).map { i =>
        try Some(DriverManager.getConnection(s"jdbc:hive2://localhost:$port/", "", ""))
        catch { case _: Exception => Thread.sleep(500); None }
      }.collectFirst { case Some(c) => c }
        .getOrElse(fail(s"thrift server never came up on $port"))
      try {
        val st = conn.createStatement()
        val rs = st.executeQuery(
          "SELECT id, name FROM graftjdbc.default.people ORDER BY id")
        val rows = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getString(2))).toList
        assert(rows === List((1L, "a"), (2L, "b"), (3L, "c")))

        val rsPinned = st.executeQuery(
          s"SELECT count(*) FROM graftjdbc.default.people VERSION AS OF '$headAfter1'")
        assert(rsPinned.next() && rsPinned.getLong(1) === 2L)
      } finally conn.close()
    } finally stopServer()
  }
}
