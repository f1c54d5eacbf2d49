package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.maintenance.Maintenance
import graft.model.MetadataEvent.AddData

/** SHA3-256 record digest: golden vector (independently computed from the
  * documented encoding, in Python), layout independence, sensitivity, and
  * the chain integration (stamp on commit + verify). */
class RecordDigestSpec extends SparkSpec {
  import spark.implicits._

  private def df2 = Seq((1L, Some("a")), (2L, None: Option[String])).toDF("id", "v")

  test("golden vector: digest matches an independent implementation of the spec") {
    // hashlib.sha3_256 over the scaladoc'd encoding for rows (1,'a'), (2,null)
    assert(df2.coalesce(1).digestedInOrder ===
      "345dfed6ca81c703cf69e616a48d531d18553cdf35998887cd64b45b608b4989")
  }

  private implicit class Ops(df: org.apache.spark.sql.DataFrame) {
    def digestedInOrder: String = RecordDigest.digest(df.orderBy("id"))
  }

  test("layout-independent: same rows through different file layouts hash equal") {
    val one = Files.createTempDirectory("rd-one-").resolve("p").toString
    val many = Files.createTempDirectory("rd-many-").resolve("p").toString
    df2.coalesce(1).write.parquet(one)
    df2.repartition(3).write.parquet(many)
    assert(spark.read.parquet(one).digestedInOrder ===
      spark.read.parquet(many).digestedInOrder)
    assert(spark.read.parquet(one).digestedInOrder === df2.digestedInOrder)
  }

  test("sensitive to values, nulls, field order, and schema names") {
    val base = df2.digestedInOrder
    assert(Seq((1L, Some("b")), (2L, None: Option[String])).toDF("id", "v")
      .digestedInOrder !== base)
    assert(Seq((1L, None: Option[String]), (2L, Some("a"))).toDF("id", "v")
      .digestedInOrder !== base)
    assert(df2.select(col("v"), col("id")).digestedInOrder !== base)
    assert(df2.withColumnRenamed("v", "w").digestedInOrder !== base)
  }

  test("covers nested, decimal, timestamp, binary, map values") {
    val rich = Seq(
      (1L, Seq(1, 2), Map("k" -> 1.5), BigDecimal("12.34"),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Array[Byte](1, 2))
    ).toDF("id", "arr", "m", "dec", "ts", "bin")
    val d = RecordDigest.digest(rich)
    assert(d.length === 64 && d === RecordDigest.digest(rich))
  }

  test("chain integration: stamped when enabled, checked by verify") {
    spark.conf.set(RecordDigest.ConfKey, "true")
    try {
      val root = Files.createTempDirectory("rd-chain-")
      val ds = Dataset.create(spark, root, "rd")
      IngestWriter.writeBatch(ds, df2, graft.operators.MergeStrategy.Append(), 1000L)
      val add = ds.chain.slices().head
      assert(add.logicalHashSha3.isDefined)
      assert(Maintenance.verify(ds).isEmpty)

      // a forged sha3 on the block must be caught by verify
      val forged = add.copy(logicalHashSha3 = Some("0" * 64))
      // rewrite the chain head block with the forged event via reset+append
      val ds2root = Files.createTempDirectory("rd-chain2-")
      val ds2 = Dataset.create(spark, ds2root, "rd2")
      IngestWriter.writeBatch(ds2, df2, graft.operators.MergeStrategy.Append(), 1000L)
      val chain = ds2.chain
      chain.reset(chain.blocksWithHashes().dropRight(1).last._2)
      chain.append(forged, 2000L)
      val issues = Maintenance.verify(Dataset.open(spark, ds2root))
      assert(issues.exists(_.toString.contains("sha3")))
    } finally spark.conf.unset(RecordDigest.ConfKey)
  }
}
