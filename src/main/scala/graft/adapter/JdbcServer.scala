package graft.adapter

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2

/**
 * JDBC/ODBC surface over a graft workspace: Spark's HiveServer2-protocol
 * Thrift server started against a session with the workspace's datasets
 * registered as a DSv2 catalog, so any stock JDBC client (beeline, a BI
 * tool with the Hive driver) can run
 * `SELECT … FROM <catalog>.default.<dataset>` — including `VERSION AS OF`
 * time travel — over the wire.
 *
 * This is the role the reference fills with its FlightSQL adapter
 * (src/adapter/flight-sql/src/service.rs:871 — DataFusion behind Arrow
 * Flight SQL for JDBC clients); Arrow Flight jars cannot be fetched in this
 * environment, but Spark ships the HiveServer2 stack natively, which is the
 * Spark-idiomatic wire protocol for exactly this use.
 */
object JdbcServer {

  /**
   * Registers `workspaceRoot` as DSv2 catalog `catalogName` on the session
   * and starts the Thrift server on `port`. Returns a stop handle (the
   * server class itself is `private[hive]`, so it cannot appear in our
   * signature); callers own calling it.
   */
  def start(
      spark: SparkSession,
      workspaceRoot: String,
      port: Int,
      catalogName: String = "graft"
  ): () => Unit = {
    graft.query.GraftCatalog.register(spark, catalogName, workspaceRoot)
    // The Thrift server opens every JDBC connection as an ISOLATED
    // newSession(), which merges SQLConf defaults from the SparkContext
    // conf — not from the parent session's runtime conf. Register the
    // catalog there too, or connections resolve against spark_catalog only.
    import org.apache.spark.sql.graftshim.setContextConf
    setContextConf(spark.sparkContext,
      s"spark.sql.catalog.$catalogName", classOf[graft.query.GraftCatalog].getName)
    setContextConf(spark.sparkContext, s"spark.sql.catalog.$catalogName.root", workspaceRoot)
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    spark.sqlContext.setConf("hive.server2.thrift.bind.host", "localhost")
    val server = HiveThriftServer2.startWithContext(spark.sqlContext)
    () => server.stop()
  }
}
