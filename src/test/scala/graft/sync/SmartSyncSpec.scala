package graft.sync

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.json4s._

import graft.SparkSpec
import graft.adapter.RestServer
import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.model.MetadataEvent.{CheckpointRef, ExecuteTransform, TransformInputState}
import graft.operators.MergeStrategy
import graft.query.QueryService
import graft.sync.SyncService._

/** Smart Transfer Protocol: WebSocket pull/push negotiation + HTTP object
  * transfer (reference smart_protocol/). Covers the full pull, incremental
  * pull, UpToDate, divergence refusal, push-create, push CAS re-plan off
  * InvalidHead, SkipUpload resume, checkpoint bundles, content-address
  * verification, and the message codec (including serde's array-of-ints
  * payload shape). */
class SmartSyncSpec extends SparkSpec {
  import spark.implicits._

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def mkDataset(name: String): Dataset = {
    val root = Files.createTempDirectory(s"graft-smart-$name-")
    val ds = Dataset.create(spark, root, name)
    IngestWriter.writeBatch(ds, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      MergeStrategy.Ledger(Seq("id")), 1000L)
    ds
  }

  /** REST (object transfer) + smart (WS negotiation) servers co-running. */
  private def withSmartNode[T](
      initial: Map[String, Dataset],
      workspace: Option[java.nio.file.Path] = None
  )(f: (String, RestServer) => T): T = {
    val rest = new RestServer(new QueryService(spark, initial), initial,
      workspaceRoot = workspace.map(_.toString)).start()
    val smart = new SmartTransferServer(rest).start()
    try f(s"ws://127.0.0.1:${smart.boundPort}", rest)
    finally { smart.stop(); rest.stop() }
  }

  test("smart pull: full, incremental, up-to-date, diverged refusal") {
    val src = mkDataset("sp1")
    withSmartNode(Map(src.name -> src)) { (ws, _) =>
      val local = new Path(Files.createTempDirectory("graft-smart-l1-").resolve("ds").toUri)

      val r1 = SmartSync.pull(ws, "sp1", local, hconf).asInstanceOf[Updated]
      assert(r1.numBlocks === 3 && r1.dataFilesCopied === 1)
      val pulled = Dataset.open(spark, local.toString)
      assertSameRows(pulled.toDF(), src.toDF())
      assert(pulled.chain.blockHashes() === src.chain.blockHashes())
      assert(SmartSync.pull(ws, "sp1", local, hconf) === UpToDate)

      // remote advances; the second pull moves only the delta
      IngestWriter.writeBatch(src, Seq((3L, "c")).toDF("id", "v"),
        MergeStrategy.Ledger(Seq("id")), 2000L)
      val r2 = SmartSync.pull(ws, "sp1", local, hconf).asInstanceOf[Updated]
      assert(r2.numBlocks === 1 && r2.dataFilesCopied === 1)
      assert(Dataset.open(spark, local.toString).toDF().count() === 3)

      // local advances beyond the server: its head is unknown there ->
      // the server answers InvalidInterval and the client refuses
      val localDs = Dataset.open(spark, local.toString)
      IngestWriter.writeBatch(localDs, Seq((9L, "z")).toDF("id", "v"),
        MergeStrategy.Ledger(Seq("id")), 3000L)
      val e = intercept[SyncException](SmartSync.pull(ws, "sp1", local, hconf))
      assert(e.getMessage.contains("ahead of or diverged"), e.getMessage)
    }
  }

  test("smart pull transfers checkpoint bundles and verifies slice addresses") {
    val src = mkDataset("sp2")
    val ckDir = new Path(src.chain.checkpointsDir, "ck1")
    src.chain.fs.mkdirs(new Path(ckDir, "state"))
    val o = src.chain.fs.create(new Path(new Path(ckDir, "state"), "1.delta"), true)
    o.write("engine-state".getBytes("UTF-8")); o.close()
    src.chain.append(ExecuteTransform(
      Seq(TransformInputState("up", None, Some(0L))), None,
      Some(CheckpointRef("ck1", "unused", 12L))), 4000L)

    withSmartNode(Map(src.name -> src)) { (ws, _) =>
      val local = new Path(Files.createTempDirectory("graft-smart-l2-").resolve("ds").toUri)
      SmartSync.pull(ws, "sp2", local, hconf)
      val pulled = graft.chain.MetadataChain.open(local, hconf)
      val f = new Path(new Path(new Path(pulled.checkpointsDir, "ck1"), "state"), "1.delta")
      val in = pulled.fs.open(f)
      assert(new String(try in.readAllBytes() finally in.close(), "UTF-8") === "engine-state")
    }

    // tampered slice: the downloaded object must fail its content address
    val phys = src.chain.slices().head.physicalHash
    val sliceLocal = java.nio.file.Paths.get(src.chain.dataFile(phys).toUri)
    Files.write(sliceLocal, Files.readAllBytes(sliceLocal) ++ Array[Byte](7))
    withSmartNode(Map(src.name -> src)) { (ws, _) =>
      val local = new Path(Files.createTempDirectory("graft-smart-l3-").resolve("ds").toUri)
      val e = intercept[Exception](SmartSync.pull(ws, "sp2", local, hconf))
      assert(e.getMessage.contains("fails its content address")
        || Option(e.getCause).exists(_.getMessage.contains("fails its content address")),
        s"${e.getMessage} / ${e.getCause}")
      assert(!graft.chain.MetadataChain.exists(local, hconf))
    }
  }

  test("smart push: create on first push, CAS re-plan on second, up-to-date, force") {
    val src = mkDataset("sp3")
    val ws0 = Files.createTempDirectory("graft-smart-node-")
    withSmartNode(Map.empty, workspace = Some(ws0)) { (ws, rest) =>
      // 1. push into an empty node: dataset is created and served afterwards
      val r1 = SmartSync.push(ws, "sp3", src.chain.root, hconf).asInstanceOf[Updated]
      assert(r1.numBlocks === 3 && r1.dataFilesCopied === 1)
      assert(rest.syncReadChain("sp3").map(_.blockHashes()) === Some(src.chain.blockHashes()))

      // 2. unchanged: the CAS probe discovers the server head and stops
      assert(SmartSync.push(ws, "sp3", src.chain.root, hconf) === UpToDate)

      // 3. local advances: the None-guess gets InvalidHead, the client
      //    re-plans against the actual head and ships only the delta
      IngestWriter.writeBatch(src, Seq((3L, "c")).toDF("id", "v"),
        MergeStrategy.Ledger(Seq("id")), 2000L)
      val r2 = SmartSync.push(ws, "sp3", src.chain.root, hconf).asInstanceOf[Updated]
      assert(r2.numBlocks === 1 && r2.dataFilesCopied === 1)
      assert(rest.syncReadChain("sp3").map(_.blockHashes()) === Some(src.chain.blockHashes()))

      // 4. served side advances independently -> histories diverge; refuse
      //    without force, force replays local history over the served head
      val servedDs = Dataset.open(spark, ws0.resolve("sp3").toString)
      IngestWriter.writeBatch(servedDs, Seq((7L, "q")).toDF("id", "v"),
        MergeStrategy.Ledger(Seq("id")), 2500L)
      IngestWriter.writeBatch(src, Seq((8L, "r")).toDF("id", "v"),
        MergeStrategy.Ledger(Seq("id")), 2600L)
      val e = intercept[SyncException](
        SmartSync.push(ws, "sp3", src.chain.root, hconf))
      assert(e.getMessage.contains("diverged"), e.getMessage)
      val forced = SmartSync.push(ws, "sp3", src.chain.root, hconf, force = true)
        .asInstanceOf[Updated]
      assert(forced.newHead === src.chain.head.get._2)
      assert(rest.syncReadChain("sp3").flatMap(_.head).map(_._2)
        === src.chain.head.map(_._2))
    }
  }

  test("smart push skips already-staged objects (SkipUpload resume)") {
    val src = mkDataset("sp4")
    val ws0 = Files.createTempDirectory("graft-smart-node4-")
    withSmartNode(Map.empty, workspace = Some(ws0)) { (ws, rest) =>
      // pre-stage the slice server-side as a crashed previous push would
      val chain = graft.chain.MetadataChain.create(
        new Path(ws0.resolve("sp4").toUri), hconf)
      val phys = src.chain.slices().head.physicalHash
      val sin = src.chain.fs.open(src.chain.dataFile(phys))
      try chain.writeObjectAtomicFrom(chain.dataFile(phys), sin, Some(phys))
      finally sin.close()

      val r = SmartSync.push(ws, "sp4", src.chain.root, hconf).asInstanceOf[Updated]
      assert(r.numBlocks === 3)
      assert(r.dataFilesCopied === 0, s"staged slice must be SkipUpload: $r")
      assert(rest.syncReadChain("sp4").map(_.blockHashes()) === Some(src.chain.blockHashes()))
    }
  }

  test("smart push transfers checkpoint bundles") {
    val src = mkDataset("sp5")
    val ckDir = new Path(src.chain.checkpointsDir, "ckp")
    src.chain.fs.mkdirs(ckDir)
    val o = src.chain.fs.create(new Path(ckDir, "s.bin"), true)
    o.write("push-state".getBytes("UTF-8")); o.close()
    src.chain.append(ExecuteTransform(
      Seq(TransformInputState("up", None, Some(0L))), None,
      Some(CheckpointRef("ckp", "unused", 10L))), 4000L)

    val ws0 = Files.createTempDirectory("graft-smart-node5-")
    withSmartNode(Map.empty, workspace = Some(ws0)) { (ws, rest) =>
      SmartSync.push(ws, "sp5", src.chain.root, hconf)
      val served = rest.syncReadChain("sp5").get
      val f = new Path(new Path(served.checkpointsDir, "ckp"), "s.bin")
      val in = served.fs.open(f)
      assert(new String(try in.readAllBytes() finally in.close(), "UTF-8") === "push-state")
    }
  }

  test("object transfer paging: batch size 1 still round-trips (is_truncated loop)") {
    val src = mkDataset("sp7")
    IngestWriter.writeBatch(src, Seq((3L, "c")).toDF("id", "v"),
      MergeStrategy.Ledger(Seq("id")), 2000L) // second slice -> 2 data objects
    val ws0 = Files.createTempDirectory("graft-smart-node7-")
    withSmartNode(Map.empty, workspace = Some(ws0)) { (ws, rest) =>
      val r = SmartSync.push(ws, "sp7", src.chain.root, hconf, objectBatchSize = 1)
        .asInstanceOf[Updated]
      assert(r.dataFilesCopied === 2, r.toString)
      assert(rest.syncReadChain("sp7").map(_.blockHashes()) === Some(src.chain.blockHashes()))
      val local = new Path(Files.createTempDirectory("graft-smart-l7-").resolve("ds").toUri)
      val p = SmartSync.pull(ws, "sp7", local, hconf, objectBatchSize = 1)
        .asInstanceOf[Updated]
      assert(p.dataFilesCopied === 2, p.toString)
      assert(graft.chain.MetadataChain.open(local, hconf).blockHashes()
        === src.chain.blockHashes())
    }
  }

  test("smart sync carries multi-tenant account/dataset refs end-to-end") {
    val src = mkDataset("sp6")
    val ws0 = Files.createTempDirectory("graft-smart-node6-")
    withSmartNode(Map.empty, workspace = Some(ws0)) { (ws, rest) =>
      // the WS route name spans path segments: /datasets/alice/data/protocol/…
      val r = SmartSync.push(ws, "alice/data", src.chain.root, hconf)
        .asInstanceOf[Updated]
      assert(r.numBlocks === 3)
      assert(rest.syncReadChain("alice/data").map(_.blockHashes())
        === Some(src.chain.blockHashes()))
      val local = new Path(Files.createTempDirectory("graft-smart-l6-").resolve("ds").toUri)
      val p = SmartSync.pull(ws, "alice/data", local, hconf).asInstanceOf[Updated]
      assert(p.numBlocks === 3 && p.dataFilesCopied === 1)
      assert(graft.chain.MetadataChain.open(local, hconf).blockHashes()
        === src.chain.blockHashes())
    }
  }

  test("message codec round-trips, including serde's array-of-ints payload") {
    import SmartProtocol._
    val plan = TransferPlan(3, 2, 100, 1234, 56789)
    assert(parsePlan(parse(compact(renderPlan(plan)))) === plan)

    val batch = BlocksBatch(Seq(
      "000000-aa.json" -> "hello".getBytes("UTF-8"),
      "000001-bb.json" -> Array.fill(70000)(7.toByte))) // >64 KiB: 16-bit+ frames
    val back = parseBlocksBatch(parse(compact(renderBlocksBatch(batch))))
    assert(back.blocks.map(_._1) === batch.blocks.map(_._1))
    assert(back.blocks.map(_._2.toSeq) === batch.blocks.map(_._2.toSeq))

    // serde Vec<u8> shape: payload as a JSON array of numbers
    val rendered = renderBlocksBatch(batch) match {
      case JObject(fields) => JObject(fields.map {
        case ("payload", JString(b64)) =>
          "payload" -> JArray(java.util.Base64.getDecoder.decode(b64)
            .toList.map(b => JInt(BigInt(b))))
        case other => other
      })
      case other => fail(s"unexpected $other")
    }
    val back2 = parseBlocksBatch(rendered)
    assert(back2.blocks.map(_._2.toSeq) === batch.blocks.map(_._2.toSeq))

    // result wrapping + error surfacing
    assert(expectOk(ok(JObject("x" -> JInt(1))), "t") === JObject("x" -> JInt(1)))
    val ex = intercept[SmartProtocolException](
      expectOk(err("InvalidHead", JObject("actual_head" -> JNull)), "Push(InitialRequest)"))
    assert(ex.getMessage.contains("InvalidHead"))

    // ws handshake accept key: RFC 6455 §1.3 worked example
    assert(Ws.acceptKey("dGhlIHNhbXBsZSBub25jZQ==") === "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }
}
