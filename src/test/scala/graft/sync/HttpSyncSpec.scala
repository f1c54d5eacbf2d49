package graft.sync

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.adapter.RestServer
import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.model.MetadataEvent.{CheckpointRef, ExecuteTransform, TransformInputState}
import graft.operators.MergeStrategy
import graft.query.QueryService
import graft.sync.SyncService._

/** Pull a dataset from a SERVED node over HTTP: full + incremental pulls,
  * status, hash verification of transferred objects, checkpoint transfer,
  * CLI `pull --from <url>`. */
class HttpSyncSpec extends SparkSpec {
  import spark.implicits._

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def mkDataset(name: String): Dataset = {
    val root = Files.createTempDirectory(s"graft-hsync-$name-")
    val ds = Dataset.create(spark, root, name)
    IngestWriter.writeBatch(ds, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      MergeStrategy.Ledger(Seq("id")), 1000L)
    ds
  }

  private def withServed[T](ds: Dataset)(f: String => T): T = {
    val m = Map(ds.name -> ds)
    val srv = new RestServer(new QueryService(spark, m), m).start()
    try f(s"http://127.0.0.1:${srv.boundPort}")
    finally srv.stop()
  }

  test("pull from a served node: full, then incremental; status tracks") {
    val src = mkDataset("served1")
    withServed(src) { base =>
      val local = new Path(Files.createTempDirectory("graft-hsync-l1-").resolve("ds").toUri)

      val r1 = HttpSync.pull(base, "served1", local, hconf).asInstanceOf[Updated]
      assert(r1.numBlocks === 3 && r1.dataFilesCopied === 1) // Seed+schema+AddData
      val pulled = Dataset.open(spark, local.toString)
      assertSameRows(pulled.toDF(), src.toDF())
      assert(pulled.chain.blockHashes() === src.chain.blockHashes())
      assert(HttpSync.status(base, "served1", local, hconf) === Equal)
      assert(HttpSync.pull(base, "served1", local, hconf) === UpToDate)

      // remote advances -> local behind; incremental pull moves the delta
      IngestWriter.writeBatch(src, Seq((3L, "c")).toDF("id", "v"),
        MergeStrategy.Ledger(Seq("id")), 2000L)
      assert(HttpSync.status(base, "served1", local, hconf) === Behind(1))
      val r2 = HttpSync.pull(base, "served1", local, hconf).asInstanceOf[Updated]
      assert(r2.numBlocks === 1 && r2.dataFilesCopied === 1)
      assert(Dataset.open(spark, local.toString).toDF().count() === 3)

      // local advances -> ahead; pull refuses without force
      val localDs = Dataset.open(spark, local.toString)
      IngestWriter.writeBatch(localDs, Seq((9L, "z")).toDF("id", "v"),
        MergeStrategy.Ledger(Seq("id")), 3000L)
      assert(HttpSync.status(base, "served1", local, hconf).isInstanceOf[Ahead])
      val e = intercept[SyncException](HttpSync.pull(base, "served1", local, hconf))
      assert(e.status === Behind(1)) // from the remote's perspective in pull
      // force rewinds local onto the remote chain
      val forced = HttpSync.pull(base, "served1", local, hconf, force = true).asInstanceOf[Updated]
      assert(forced.newHead === src.chain.head.get._2)
    }
  }

  test("transferred objects are verified against their content address") {
    val src = mkDataset("served2")
    // tamper the served slice bytes: the pull must refuse the slice
    val phys = src.chain.slices().head.physicalHash
    val sliceLocal = java.nio.file.Paths.get(src.chain.dataFile(phys).toUri)
    Files.write(sliceLocal, Files.readAllBytes(sliceLocal) ++ Array[Byte](7))
    withServed(src) { base =>
      val local = new Path(Files.createTempDirectory("graft-hsync-l2-").resolve("ds").toUri)
      val e = intercept[IllegalArgumentException](HttpSync.pull(base, "served2", local, hconf))
      assert(e.getMessage.contains("fails its content address"), e.getMessage)
      // and the head never moved: the partial local state is not a dataset
      assert(!graft.chain.MetadataChain.exists(local, hconf))
    }
  }

  test("checkpoint directories referenced by ExecuteTransform blocks transfer too") {
    val src = mkDataset("served3")
    val ckDir = new Path(src.chain.checkpointsDir, "ck1")
    src.chain.fs.mkdirs(new Path(ckDir, "state"))
    val out = src.chain.fs.create(new Path(new Path(ckDir, "state"), "1.delta"), true)
    out.write("engine-state".getBytes("UTF-8")); out.close()
    src.chain.append(ExecuteTransform(
      Seq(TransformInputState("up", None, Some(0L))), None,
      Some(CheckpointRef("ck1", "unused", 12L))), 4000L)

    withServed(src) { base =>
      val local = new Path(Files.createTempDirectory("graft-hsync-l3-").resolve("ds").toUri)
      HttpSync.pull(base, "served3", local, hconf)
      val pulled = graft.chain.MetadataChain.open(local, hconf)
      val f = new Path(new Path(new Path(pulled.checkpointsDir, "ck1"), "state"), "1.delta")
      assert(pulled.fs.exists(f))
      val in = pulled.fs.open(f)
      assert(new String(try in.readAllBytes() finally in.close(), "UTF-8") === "engine-state")
    }
  }

  test("CLI pull --from an http remote and status against it") {
    import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
    val src = mkDataset("served4")
    withServed(src) { base =>
      val ws2 = Files.createTempDirectory("graft-hsync-cliws-")
      def cli(args: String*): (Int, String) = {
        val bos = new ByteArrayOutputStream()
        val code = graft.Cli.run(spark, args.toSeq,
          new BufferedReader(new StringReader("")), new PrintStream(bos, true, "UTF-8"))
        (code, bos.toString("UTF-8"))
      }
      val (c1, out1) = cli("--workspace", ws2.toString, "pull", "served4", "--from", base)
      assert(c1 === 0 && out1.startsWith("synced 3 block(s)"), out1)
      val (c2, out2) = cli("--workspace", ws2.toString, "tail", "served4", "5")
      assert(c2 === 0 && out2.contains("a") && out2.contains("b"), out2)
      // alias registry works for http urls too
      assert(cli("--workspace", ws2.toString, "repo", "add", "node", base)._1 === 0)
      val (c3, st) = cli("--workspace", ws2.toString, "status", "served4", "node")
      assert(c3 === 0 && st.trim === "equal", st)
    }
  }
}
