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

  test("pull resume re-fetches referenced data even when the block file is already staged") {
    val src = mkDataset("served7")
    withServed(src) { base =>
      val local = new Path(Files.createTempDirectory("graft-hsync-l7-").resolve("ds").toUri)
      // simulate a crashed pull that died between block write and data fetch:
      // the AddData block file is staged locally, its slice is NOT
      val localChain = graft.chain.MetadataChain.create(local, hconf)
      val (headSeq, headHash) = src.chain.head.get
      val blockName = f"$headSeq%06d-$headHash.json"
      val in = src.chain.fs.open(new Path(src.chain.blocksDir, blockName))
      val blockBytes = try in.readAllBytes() finally in.close()
      localChain.writeObjectAtomic(new Path(localChain.blocksDir, blockName), blockBytes)
      // the resumed pull must notice the missing slice despite the staged block
      val r = HttpSync.pull(base, "served7", local, hconf).asInstanceOf[Updated]
      assert(r.dataFilesCopied === 1, r.toString)
      val pulled = Dataset.open(spark, local.toString)
      assertSameRows(pulled.toDF(), src.toDF())
    }
  }

  test("pull refuses a gapped remote chain: listing must be contiguous and prev-linked") {
    // a COMPLIANT server cannot serve a gap (its own head-walk throws), so
    // model the malicious/buggy one: a raw HTTP server listing src's blocks
    // MINUS the middle — every listed block still passes its content
    // address, so only the chain-linkage validation can refuse the pull
    val src = mkDataset("servedgap")
    IngestWriter.writeBatch(src, Seq((3L, "c")).toDF("id", "v"),
      MergeStrategy.Ledger(Seq("id")), 2000L) // >= 3 blocks on the chain now
    val names = src.chain.blockFiles().map(_.getName).sorted
    assert(names.size >= 3)
    val gapped = names.patch(1, Nil, 1) // drop the middle block
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/datasets/servedgap/sync/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val segs = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).drop(3)
      val body: Array[Byte] = segs.toList match {
        case "blocks" :: Nil =>
          gapped.map(n => "\"" + n + "\"").mkString("[", ",", "]").getBytes("UTF-8")
        case "blocks" :: n :: Nil =>
          val in = src.chain.fs.open(new Path(src.chain.blocksDir, n))
          try in.readAllBytes() finally in.close()
        case _ => Array.emptyByteArray
      }
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body); ex.close()
    })
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val local = new Path(Files.createTempDirectory("graft-hsync-gap-").resolve("ds").toUri)
      val e = intercept[IllegalArgumentException](
        HttpSync.pull(base, "servedgap", local, hconf))
      assert(e.getMessage.contains("contiguous chain"), e.getMessage)
      assert(!graft.chain.MetadataChain.exists(local, hconf))
    } finally srv.stop(0)
  }

  test("pull refuses a malicious remote: traversal block names and checkpoint paths") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    // a real, internally-consistent source chain with a checkpoint...
    val src = mkDataset("evilsrc")
    val ckDir = new Path(src.chain.checkpointsDir, "cke")
    src.chain.fs.mkdirs(ckDir)
    val o = src.chain.fs.create(new Path(ckDir, "1.delta"), true)
    o.write("s".getBytes("UTF-8")); o.close()
    src.chain.append(ExecuteTransform(
      Seq(TransformInputState("up", None, Some(0L))), None,
      Some(CheckpointRef("cke", "unused", 1L))), 4000L)
    // ...served by a node that lies in exactly one place per scenario
    def serveNode[T](tamperListing: Boolean)(f: String => T): T = {
      val srv = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      def reply(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
        ex.sendResponseHeaders(code, body.length)
        ex.getResponseBody.write(body); ex.close()
      }
      srv.createContext("/datasets/evil/sync/", (ex: HttpExchange) => {
        val segs = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).drop(3)
        val body: Array[Byte] = segs.toList match {
          case "blocks" :: Nil =>
            val names = src.chain.blocksWithHashes()
              .map { case (b, h) => f"${b.sequenceNumber}%06d-$h.json" }
            val listed = if (tamperListing) names :+ ("../" + names.last) else names
            listed.map(n => "\"" + n + "\"").mkString("[", ",", "]").getBytes("UTF-8")
          case "blocks" :: name :: Nil =>
            val i = src.chain.fs.open(new Path(src.chain.blocksDir, name))
            try i.readAllBytes() finally i.close()
          case "data" :: ph :: Nil =>
            val i = src.chain.fs.open(src.chain.dataFile(ph))
            try i.readAllBytes() finally i.close()
          case "checkpoints" :: "cke" :: Nil =>
            // the lie: a traversal path in the checkpoint file listing
            """["../../../pwn-ckpt"]""".getBytes("UTF-8")
          case "checkpoints" :: "cke" :: "file" :: Nil =>
            "owned".getBytes("UTF-8")
          case other => s"unexpected $other".getBytes("UTF-8")
        }
        reply(ex, 200, body)
      })
      srv.start()
      try f(s"http://127.0.0.1:${srv.getAddress.getPort}")
      finally srv.stop(0)
    }
    // scenario 1: a block listing entry that climbs out of blocksDir
    serveNode(tamperListing = true) { base =>
      val local = new Path(Files.createTempDirectory("graft-hsync-evil1-").resolve("ds").toUri)
      val e = intercept[IllegalArgumentException](HttpSync.pull(base, "evil", local, hconf))
      assert(e.getMessage.contains("not a valid block name"), e.getMessage)
    }
    // scenario 2: a checkpoint listing whose paths climb out of the dataset
    serveNode(tamperListing = false) { base =>
      val tmp = Files.createTempDirectory("graft-hsync-evil2-")
      val local = new Path(tmp.resolve("ds").toUri)
      val e = intercept[IllegalArgumentException](HttpSync.pull(base, "evil", local, hconf))
      assert(e.getMessage.contains("not a safe relative path"), e.getMessage)
      assert(!Files.exists(tmp.resolve("pwn-ckpt")) &&
        !Files.exists(tmp.getParent.resolve("pwn-ckpt")))
      // and no head was committed over the refused pull
      assert(!graft.chain.MetadataChain.exists(local, hconf) ||
        graft.chain.MetadataChain.open(local, hconf).head.isEmpty)
    }
  }

  // ------------------------------------------------------------------ push

  /** A served node that accepts pushes: empty (or given) initial datasets
    * over a workspace root new chains land under. */
  private def withPushNode[T](initial: Map[String, Dataset] = Map.empty)(
      f: (String, java.nio.file.Path, scala.collection.mutable.Buffer[(String, String)]) => T): T = {
    val ws = Files.createTempDirectory("graft-hsync-node-")
    val moves = scala.collection.mutable.Buffer.empty[(String, String)]
    val srv = new RestServer(new QueryService(spark, initial), initial,
      workspaceRoot = Some(ws.toString),
      onHeadMove = (n, h) => moves += ((n, h))).start()
    try f(s"http://127.0.0.1:${srv.boundPort}", ws, moves)
    finally srv.stop()
  }

  private def httpGet(url: String): (Int, String) = {
    val c = java.net.http.HttpClient.newHttpClient()
    val r = c.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def httpSend(method: String, url: String, body: Array[Byte]): (Int, String) = {
    val c = java.net.http.HttpClient.newHttpClient()
    val r = c.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .method(method, java.net.http.HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("push to a served node: create, full, incremental, up-to-date; node serves it") {
    val src = mkDataset("pushed1")
    withPushNode() { (base, ws, moves) =>
      val r1 = HttpSync.push(base, "pushed1", src.chain.root, hconf).asInstanceOf[Updated]
      assert(r1.numBlocks === 3 && r1.dataFilesCopied === 1)
      // the node registered it: list + tail + SQL all see the pushed dataset
      assert(httpGet(s"$base/datasets")._2.contains("pushed1"))
      val (tc, tb) = httpGet(s"$base/datasets/pushed1/tail?n=5")
      assert(tc === 200 && tb.contains("\"a\"") && tb.contains("\"b\""), tb)
      assert(moves.toList === List(("pushed1", src.chain.head.get._2)))
      // chain on the node is hash-identical
      val nodeChain = graft.chain.MetadataChain.open(
        new Path(ws.resolve("pushed1").toUri), hconf)
      assert(nodeChain.blockHashes() === src.chain.blockHashes())

      assert(HttpSync.push(base, "pushed1", src.chain.root, hconf) === UpToDate)

      // local advances -> incremental push is exactly the delta
      IngestWriter.writeBatch(src, Seq((3L, "c")).toDF("id", "v"),
        MergeStrategy.Ledger(Seq("id")), 2000L)
      val r2 = HttpSync.push(base, "pushed1", src.chain.root, hconf).asInstanceOf[Updated]
      assert(r2.numBlocks === 1 && r2.dataFilesCopied === 1)
      assert(httpGet(s"$base/datasets/pushed1/tail?n=5")._2.contains("\"c\""))
      assert(moves.size === 2)
    }
  }

  test("push refuses non-fast-forward without force; force overwrites the served head") {
    val src = mkDataset("pushed2")
    withPushNode() { (base, _, _) =>
      HttpSync.push(base, "pushed2", src.chain.root, hconf)
      val headBefore = src.chain.head.get
      // diverge locally: rewind one block, append something else
      val prevHash = src.chain.blockHashes().dropRight(1).last
      src.chain.reset(prevHash)
      IngestWriter.writeBatch(src, Seq((7L, "x")).toDF("id", "v"),
        MergeStrategy.Ledger(Seq("id")), 3000L)
      val e = intercept[SyncException](HttpSync.push(base, "pushed2", src.chain.root, hconf))
      assert(e.status.isInstanceOf[Diverged], e.status)
      // forced push wins; the node now serves the new branch
      val forced = HttpSync.push(base, "pushed2", src.chain.root, hconf, force = true)
        .asInstanceOf[Updated]
      assert(forced.newHead === src.chain.head.get._2)
      assert(forced.newHead !== headBefore._2)
      assert(HttpSync.status(base, "pushed2", src.chain.root, hconf) === Equal)
    }
  }

  test("server re-hashes pushed objects and refuses a head over unstaged slices") {
    val src = mkDataset("pushed3")
    withPushNode() { (base, _, _) =>
      val b = s"$base/datasets/pushed3"
      assert(httpSend("POST", s"$b/sync/create", Array.emptyByteArray)._1 === 200)
      // a slice whose bytes don't match the address it claims -> 400
      val (dc, db) = httpSend("PUT", s"$b/sync/data/${"0" * 64}", "junk".getBytes("UTF-8"))
      assert(dc === 400 && db.contains("hashes to"), db)
      // stage ONLY the blocks (not the slice), then try to commit the head
      val blocks = src.chain.blockFiles()
      blocks.foreach { p =>
        val in = src.chain.fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        assert(httpSend("PUT", s"$b/sync/blocks/${p.getName}", bytes)._1 === 200)
      }
      val (hseq, hhash) = src.chain.head.get
      val (hc, hb) = httpSend("POST", s"$b/sync/head",
        s"""{"seq":$hseq,"hash":"$hhash"}""".getBytes("UTF-8"))
      assert(hc === 400 && hb.contains("unstaged"), hb)
      // a block renamed to a wrong address -> 400
      val in = src.chain.fs.open(blocks.head)
      val seedBytes = try in.readAllBytes() finally in.close()
      val (bc, bb) = httpSend("PUT", s"$b/sync/blocks/000000-${"f" * 64}.json", seedBytes)
      assert(bc === 400 && bb.contains("hashes to"), bb)
      // stage the slice properly and the commit goes through
      val ph = src.chain.slices().head.physicalHash
      val din = src.chain.fs.open(src.chain.dataFile(ph))
      val sliceBytes = try din.readAllBytes() finally din.close()
      assert(httpSend("PUT", s"$b/sync/data/$ph", sliceBytes)._1 === 200)
      assert(httpSend("POST", s"$b/sync/head",
        s"""{"seq":$hseq,"hash":"$hhash"}""".getBytes("UTF-8"))._1 === 200)
      assert(httpGet(s"$b/tail?n=5")._1 === 200)
    }
  }

  test("push transfers checkpoint directories referenced by ExecuteTransform blocks") {
    val src = mkDataset("pushed9")
    val ckDir = new Path(src.chain.checkpointsDir, "ck9")
    src.chain.fs.mkdirs(new Path(ckDir, "state"))
    val o = src.chain.fs.create(new Path(new Path(ckDir, "state"), "1.delta"), true)
    o.write("engine-state-9".getBytes("UTF-8")); o.close()
    src.chain.append(ExecuteTransform(
      Seq(TransformInputState("up", None, Some(0L))), None,
      Some(CheckpointRef("ck9", "unused", 14L))), 4000L)

    withPushNode() { (base, ws, _) =>
      HttpSync.push(base, "pushed9", src.chain.root, hconf)
      val node = graft.chain.MetadataChain.open(
        new Path(ws.resolve("pushed9").toUri), hconf)
      val f = new Path(new Path(new Path(node.checkpointsDir, "ck9"), "state"), "1.delta")
      assert(node.fs.exists(f))
      val in = node.fs.open(f)
      assert(new String(try in.readAllBytes() finally in.close(), "UTF-8") === "engine-state-9")
      assert(node.blockHashes() === src.chain.blockHashes())
    }
  }

  test("an interrupted initial push resumes: negotiation skips staged objects") {
    val src = mkDataset("pushed8") // Seed + schema + AddData, one slice
    withPushNode() { (base, _, _) =>
      val b = s"$base/datasets/pushed8"
      // simulate a crashed first push: dataset created, the slice and one
      // block staged, head never committed — the node does not list it yet
      assert(httpSend("POST", s"$b/sync/create", Array.emptyByteArray)._1 === 200)
      val ph = src.chain.slices().head.physicalHash
      val din = src.chain.fs.open(src.chain.dataFile(ph))
      val sliceBytes = try din.readAllBytes() finally din.close()
      assert(httpSend("PUT", s"$b/sync/data/$ph", sliceBytes)._1 === 200)
      val firstBlock = src.chain.blockFiles().head
      val bin = src.chain.fs.open(firstBlock)
      val blockBytes = try bin.readAllBytes() finally bin.close()
      assert(httpSend("PUT", s"$b/sync/blocks/${firstBlock.getName}", blockBytes)._1 === 200)
      // the resumed push completes the dataset WITHOUT re-sending the slice
      val r = HttpSync.push(base, "pushed8", src.chain.root, hconf).asInstanceOf[Updated]
      assert(r.numBlocks === 3 && r.dataFilesCopied === 0, r.toString)
      assert(HttpSync.status(base, "pushed8", src.chain.root, hconf) === Equal)
      assert(httpGet(s"$b/tail?n=5")._1 === 200)
    }
  }

  test("head commit is compare-and-swap: a stale 'prev' is rejected with 409") {
    val src = mkDataset("pushed7")
    withPushNode() { (base, _, _) =>
      HttpSync.push(base, "pushed7", src.chain.root, hconf)
      val h1 = src.chain.head.get._2
      IngestWriter.writeBatch(src, Seq((3L, "c")).toDF("id", "v"),
        MergeStrategy.Ledger(Seq("id")), 2000L)
      HttpSync.push(base, "pushed7", src.chain.root, hconf)
      val (seq2, h2) = src.chain.head.get
      // a pusher whose plan was based on h1 must NOT be able to move the
      // head now that it is h2 — even to a value whose chain is complete
      val (c1, b1) = httpSend("POST", s"$base/datasets/pushed7/sync/head",
        s"""{"seq":$seq2,"hash":"$h2","prev":"$h1"}""".getBytes("UTF-8"))
      assert(c1 === 409 && b1.contains("moved"), s"$c1 $b1")
      // based on the CURRENT head it goes through (idempotent re-commit)
      assert(httpSend("POST", s"$base/datasets/pushed7/sync/head",
        s"""{"seq":$seq2,"hash":"$h2","prev":"$h2"}""".getBytes("UTF-8"))._1 === 200)
      // omitting prev (older client) falls back to the fast-forward check
      assert(httpSend("POST", s"$base/datasets/pushed7/sync/head",
        s"""{"seq":$seq2,"hash":"$h2"}""".getBytes("UTF-8"))._1 === 200)
    }
  }

  test("a node without a workspace root refuses new datasets but accepts known ones") {
    val src = mkDataset("pushed4")
    // no workspaceRoot: push of an UNKNOWN dataset fails at create
    withServed(src) { base =>
      val other = mkDataset("pushed5")
      val e = intercept[IllegalArgumentException](
        HttpSync.push(base, "pushed5", other.chain.root, hconf))
      assert(e.getMessage.contains("403"), e.getMessage)
      // but a push into the ALREADY-SERVED dataset is accepted
      val local = new Path(Files.createTempDirectory("graft-hsync-p4-").resolve("ds").toUri)
      HttpSync.pull(base, "pushed4", local, hconf)
      val localDs = Dataset.open(spark, local.toString)
      IngestWriter.writeBatch(localDs, Seq((3L, "c")).toDF("id", "v"),
        MergeStrategy.Ledger(Seq("id")), 2000L)
      val r = HttpSync.push(base, "pushed4", local, hconf).asInstanceOf[Updated]
      assert(r.numBlocks === 1)
      assert(src.chain.head.get._2 === localDs.chain.head.get._2)
    }
  }

  test("checkpoint sync endpoints refuse path traversal and absolute paths") {
    val src = mkDataset("served5")
    val probe = Files.createTempDirectory("graft-hsync-probe-")
    withServed(src) { base =>
      val b = s"$base/datasets/served5/sync/checkpoints"
      val body = "pwn".getBytes("UTF-8")
      // single-encoded ../ — decoded once by URI, must be rejected
      assert(httpSend("PUT", s"$b/ck/file?path=%2e%2e%2fpwn1", body)._1 === 400)
      // absolute path — Hadoop Path(parent, absolute) would discard parent
      val abs = java.net.URLEncoder.encode(probe.resolve("pwn2").toString, "UTF-8")
      assert(httpSend("PUT", s"$b/ck/file?path=$abs", body)._1 === 400)
      // scheme-qualified child is absolute to Hadoop Path too
      assert(httpSend("PUT", s"$b/ck/file?path=file:%2f%2ftmp%2fpwn3", body)._1 === 400)
      // ckpt path segment itself cannot climb (…/checkpoints/%2e%2e/file)
      assert(httpSend("PUT", s"$b/%2e%2e/file?path=x", body)._1 === 400)
      // double-encoded ../ decodes ONCE to literal "%2e%2e" — it must NOT be
      // decoded a second time into a working traversal; whatever the server
      // does with it, nothing may land outside the checkpoints dir
      httpSend("PUT", s"$b/ck/file?path=%252e%252e%252fpwn4", body)
      val outside = new Path(src.chain.checkpointsDir.getParent, "pwn4")
      assert(!src.chain.fs.exists(outside))
      assert(!src.chain.fs.exists(new Path(src.chain.root.getParent, "pwn4")))
      // reads are gated identically: no absolute or climbing reads
      assert(httpGet(s"$b/ck/file?path=%2e%2e%2f%2e%2e%2fhead")._1 === 400)
      assert(httpGet(s"$b/ck/file?path=%2fetc%2fhostname")._1 === 400)
      assert(httpGet(s"$b/%2e%2e%2f")._1 !== 200)
      // and the legitimate round-trip still works
      assert(httpSend("PUT", s"$b/ck/file?path=state%2f1.delta", body)._1 === 200)
      val (gc, gb) = httpGet(s"$b/ck/file?path=state%2f1.delta")
      assert(gc === 200 && gb === "pwn", s"$gc $gb")
    }
  }

  test("CLI push to an http remote via alias") {
    val ws = Files.createTempDirectory("graft-hsync-cliws6-")
    val src = Dataset.create(spark, ws.resolve("pushed6"), "pushed6")
    IngestWriter.writeBatch(src, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      MergeStrategy.Ledger(Seq("id")), 1000L)
    withPushNode() { (base, _, _) =>
      import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
      def cli(args: String*): (Int, String) = {
        val bos = new ByteArrayOutputStream()
        val code = graft.Cli.run(spark, args.toSeq,
          new BufferedReader(new StringReader("")), new PrintStream(bos, true, "UTF-8"))
        (code, bos.toString("UTF-8"))
      }
      assert(cli("--workspace", ws.toString, "repo", "add", "node", base)._1 === 0)
      val (c, out) = cli("--workspace", ws.toString, "push", "pushed6", "node")
      assert(c === 0 && out.startsWith("synced 3 block(s)"), out)
      val (c2, st) = cli("--workspace", ws.toString, "status", "pushed6", "node")
      assert(c2 === 0 && st.trim === "equal", st)
    }
  }

  test("multi-tenant refs: push/pull/serve an account/dataset over HTTP") {
    val src = mkDataset("mt_cities")
    withPushNode() { (base, ws, moves) =>
      // push under an account prefix: the node parks it at <ws>/alice/mt_cities
      val r1 = HttpSync.push(base, "alice/mt_cities", src.chain.root, hconf).asInstanceOf[Updated]
      assert(r1.numBlocks === 3 && r1.dataFilesCopied === 1)
      assert(moves.toList === List(("alice/mt_cities", src.chain.head.get._2)))
      val nodeChain = graft.chain.MetadataChain.open(
        new Path(ws.resolve("alice").resolve("mt_cities").toUri), hconf)
      assert(nodeChain.blockHashes() === src.chain.blockHashes())
      // the account-qualified read routes serve it
      val (tc, tb) = httpGet(s"$base/datasets/alice/mt_cities/tail?n=5")
      assert(tc === 200 && tb.contains("\"a\""), tb)
      assert(HttpSync.push(base, "alice/mt_cities", src.chain.root, hconf) === UpToDate)
      // and a fresh workspace pulls it back through the same ref
      val local = new Path(Files.createTempDirectory("graft-hsync-mt-").resolve("c").toUri)
      val r2 = HttpSync.pull(base, "alice/mt_cities", local, hconf).asInstanceOf[Updated]
      assert(r2.numBlocks === 3)
      assertSameRows(Dataset.open(spark, local.toString).toDF(), src.toDF())
      // a traversal-shaped name is rejected by the create route
      val (bc, bb) = httpSend("POST", s"$base/datasets/bad%2F..%2Fescape/sync/create",
        Array.emptyByteArray)
      assert(bc === 400 || bc === 404, s"$bc $bb")
    }
  }

  test("CLI: push/pull through a repo/account/dataset ref (FS remote)") {
    import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
    val ws = Files.createTempDirectory("graft-mtref-ws-")
    val repo = Files.createTempDirectory("graft-mtref-repo-")
    val src = Dataset.create(spark, ws.resolve("cities"), "cities")
    IngestWriter.writeBatch(src, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      MergeStrategy.Ledger(Seq("id")), 1000L)
    def cli(args: String*): (Int, String) = {
      val bos = new ByteArrayOutputStream()
      val code = graft.Cli.run(spark, args.toSeq,
        new BufferedReader(new StringReader("")), new PrintStream(bos, true, "UTF-8"))
      (code, bos.toString("UTF-8"))
    }
    assert(cli("--workspace", ws.toString, "repo", "add", "hub", repo.toString)._1 === 0)
    // push to hub/alice/cities -> lands at <repo>/alice/cities
    val (c1, out1) = cli("--workspace", ws.toString, "push", "cities", "hub/alice/cities")
    assert(c1 === 0 && out1.startsWith("synced 3 block(s)"), out1)
    val remoteChain = graft.chain.MetadataChain.open(
      new Path(repo.resolve("alice").resolve("cities").toUri), hconf)
    assert(remoteChain.blockHashes() === src.chain.blockHashes())
    // status through the same ref
    val (c2, st) = cli("--workspace", ws.toString, "status", "cities", "hub/alice/cities")
    assert(c2 === 0 && st.trim === "equal", st)
    // a second workspace pulls through the multi-tenant ref
    val ws2 = Files.createTempDirectory("graft-mtref-ws2-")
    assert(cli("--workspace", ws2.toString, "repo", "add", "hub", repo.toString)._1 === 0)
    val (c3, out3) = cli("--workspace", ws2.toString,
      "pull", "cities", "--from", "hub/alice/cities")
    assert(c3 === 0 && out3.startsWith("synced 3 block(s)"), out3)
    assertSameRows(
      Dataset.open(spark, ws2.resolve("cities").toString).toDF(), src.toDF())
  }

  test("resolveRef: grammar, unknown repo, traversal rejection") {
    val ws = Files.createTempDirectory("graft-resolveref-")
    val reg = new RemoteRegistry(new Path(ws.toUri), hconf)
    reg.add("hub", "/repos/hub")
    assert(reg.resolveRef("hub", "cities") === ("/repos/hub", "cities"))
    assert(reg.resolveRef("hub/towns", "cities") === ("/repos/hub", "towns"))
    assert(reg.resolveRef("hub/alice/towns", "cities") === ("/repos/hub", "alice/towns"))
    assert(reg.resolveRef("file:///direct/url", "cities") === ("file:///direct/url", "cities"))
    intercept[IllegalArgumentException](reg.resolveRef("nope/alice/towns", "cities"))
    intercept[IllegalArgumentException](reg.resolveRef("hub/../towns", "cities"))
    intercept[IllegalArgumentException](reg.resolveRef("hub/a/b/c", "cities"))
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
