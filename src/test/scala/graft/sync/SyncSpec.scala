package graft.sync

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.chain.{MetadataChain, MockFileSystem}
import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.operators.MergeStrategy
import graft.sync.SyncService._

/** Push/pull a dataset between two FS locations: fast-forward transfer,
  * incremental second push, divergence detection, force overwrite, resume
  * after a simulated partial transfer, and a cross-scheme (file→mock) push —
  * the behaviors of sync_service_impl.rs + simple_transfer_protocol.rs. */
class SyncSpec extends SparkSpec {
  import spark.implicits._

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def mkDataset(name: String): Dataset = {
    val root = Files.createTempDirectory(s"graft-sync-$name-")
    val ds = Dataset.create(spark, root, name)
    IngestWriter.writeBatch(ds, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      MergeStrategy.Ledger(Seq("id")), 1000L)
    IngestWriter.writeBatch(ds, Seq((3L, "c")).toDF("id", "v"),
      MergeStrategy.Ledger(Seq("id")), 2000L)
    ds
  }

  private def tmpRoot(tag: String): Path =
    new Path(Files.createTempDirectory(s"graft-sync-$tag-").resolve("ds").toUri)

  test("push to empty destination copies everything; second push is incremental") {
    val src = mkDataset("p1")
    val dst = tmpRoot("p1dst")

    val r1 = sync(src.chain.root, dst, hconf)
    val u1 = r1.asInstanceOf[Updated]
    assert(u1.numBlocks === 4) // Seed + SetDataSchema + 2 AddData
    assert(u1.dataFilesCopied === 2)
    assert(u1.oldHead.isEmpty)

    // pulled copy reads identically
    val pulled = Dataset.open(spark, dst.toString)
    assert(pulled.name === src.name)
    assertSameRows(pulled.toDF(), src.toDF())
    assert(pulled.chain.blockHashes() === src.chain.blockHashes())

    // no-op when equal
    assert(sync(src.chain.root, dst, hconf) === UpToDate)

    // one more commit → only the delta moves
    IngestWriter.writeBatch(src, Seq((4L, "d")).toDF("id", "v"),
      MergeStrategy.Ledger(Seq("id")), 3000L)
    val u2 = sync(src.chain.root, dst, hconf).asInstanceOf[Updated]
    assert(u2.numBlocks === 1 && u2.dataFilesCopied === 1)
    assert(u2.oldHead === Some(u1.newHead))
    assert(Dataset.open(spark, dst.toString).toDF().count() === 4)
  }

  test("destination ahead → Behind; diverged chains refuse without force, overwrite with force") {
    val src = mkDataset("d1")
    val dst = tmpRoot("d1dst")
    sync(src.chain.root, dst, hconf)

    // advance DST only → src is behind
    val dstDs = Dataset.open(spark, dst.toString)
    IngestWriter.writeBatch(dstDs, Seq((9L, "z")).toDF("id", "v"),
      MergeStrategy.Ledger(Seq("id")), 5000L)
    val behind = intercept[SyncException](sync(src.chain.root, dst, hconf))
    assert(behind.status === Behind(1))

    // advance SRC differently → diverged
    IngestWriter.writeBatch(src, Seq((7L, "x")).toDF("id", "v"),
      MergeStrategy.Ledger(Seq("id")), 6000L)
    val div = intercept[SyncException](sync(src.chain.root, dst, hconf))
    assert(div.status === Diverged(1, 1))
    assert(compare(src.chain, MetadataChain.open(dst, hconf)) === Diverged(1, 1))

    // force makes dst mirror src
    val forced = sync(src.chain.root, dst, hconf, force = true).asInstanceOf[Updated]
    assert(forced.newHead === src.chain.head.get._2)
    assertSameRows(Dataset.open(spark, dst.toString).toDF(), src.toDF())
  }

  test("resume: a partial transfer (objects present, head not moved) completes cleanly") {
    val src = mkDataset("r1")
    val dst = tmpRoot("r1dst")

    // simulate a crashed first sync: blocks+data landed, head never moved
    val staged = MetadataChain.create(dst, hconf)
    val firstBlock = src.chain.blockFiles().head
    val in = src.chain.fs.open(firstBlock)
    val bytes = try in.readAllBytes() finally in.close()
    val out = staged.fs.create(new Path(staged.blocksDir, firstBlock.getName), true)
    try out.write(bytes) finally out.close()
    assert(staged.head.isEmpty)

    val r = sync(src.chain.root, dst, hconf, verify = true).asInstanceOf[Updated]
    assert(r.numBlocks === 4)          // all blocks counted in the plan...
    assert(r.dataFilesCopied === 2)    // ...data copied; pre-staged block skipped by length
    assert(Dataset.open(spark, dst.toString).chain.blockHashes() === src.chain.blockHashes())
  }

  test("concurrent transfer: a multi-slice dataset syncs on a pool with identical hashes") {
    val root = Files.createTempDirectory("graft-sync-par-")
    val src = Dataset.create(spark, root, "par")
    (1 to 12).foreach { i =>
      IngestWriter.writeBatch(src, Seq((i.toLong, s"v$i")).toDF("id", "v"),
        MergeStrategy.Ledger(Seq("id")), i * 1000L)
    }
    val dst = tmpRoot("pardst")
    // verify=true re-hashes every slice and block at the destination inside
    // the concurrently-running copy tasks — any corruption under parallelism
    // fails here, not just at the final chain compare
    val r = sync(src.chain.root, dst, hconf, verify = true, parallelism = 8)
      .asInstanceOf[Updated]
    assert(r.dataFilesCopied === 12)
    val pulled = Dataset.open(spark, dst.toString)
    assert(pulled.chain.blockHashes() === src.chain.blockHashes())
    assertSameRows(pulled.toDF(), src.toDF())
    // byte-level: each content-addressed slice re-hashes to its name
    pulled.chain.blockHashes()
    val dstChain = pulled.chain
    dstChain.slices().foreach { s =>
      val got = MetadataChain.sha256HexOf(dstChain.fs, dstChain.dataFile(s.physicalHash))
      assert(got === s.physicalHash)
    }
  }

  test("inParallel: results keep input order; a task failure propagates its own cause") {
    val out = SyncService.inParallel(4, (1 to 20).map(i => () => i * 2))
    assert(out === (2 to 40 by 2))
    val boom = intercept[IllegalStateException] {
      SyncService.inParallel(4, Seq(
        () => 1,
        () => throw new IllegalStateException("task failed"),
        () => 3))
    }
    assert(boom.getMessage === "task failed")
  }

  test("cross-scheme push (file:// → mock://) and pull back into a fresh workspace") {
    MockFileSystem.register(hconf)
    val src = mkDataset("x1")
    val remoteLocal = Files.createTempDirectory("graft-sync-remote-")
    val remote = new Path(s"mock://${remoteLocal.toAbsolutePath}/repo/${src.name}")

    val up = sync(src.chain.root, remote, hconf, verify = true).asInstanceOf[Updated]
    assert(up.numBlocks === 4)

    val ws2 = Files.createTempDirectory("graft-sync-ws2-")
    val localRoot = new Path(ws2.resolve(src.name).toUri)
    sync(remote, localRoot, hconf, verify = true)
    val pulled = Dataset.open(spark, localRoot.toString)
    assertSameRows(pulled.toDF(), src.toDF())
    assert(pulled.chain.blockHashes() === src.chain.blockHashes())
    assert(compare(pulled.chain, src.chain) === Equal)
  }
}
