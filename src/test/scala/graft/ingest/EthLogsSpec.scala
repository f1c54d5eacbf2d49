package graft.ingest

import graft.SparkSpec
import graft.ingest.EthLogs._

class EthLogsSpec extends SparkSpec {

  /** Fake transport: 25 blocks, one Transfer-ish log every 3rd block;
    * records the ranges and filters it was asked for. */
  private class FakeRpc(latest: Long) extends EthRpc {
    val calls = collection.mutable.ArrayBuffer.empty[(Long, Long, LogFilter)]
    override def blockNumber(): Long = latest
    override def getLogs(fromBlock: Long, toBlock: Long, filter: LogFilter): Seq[EthLog] = {
      calls += ((fromBlock, toBlock, filter))
      (fromBlock to toBlock).filter(_ % 3 == 0).map { b =>
        EthLog(b, f"0xtx$b%02d", 0, filter.address.getOrElse("0xdead"),
          filter.topics, data = s"0x$b")
      }
    }
  }

  test("drain batches block ranges, resumes from source state, stops at maxBatches") {
    val rpc = new FakeRpc(latest = 24)
    val filter = LogFilter(address = Some("0xabc"), topics = Seq("0xtopic0"))

    // first poll: 10-block batches, max 2 → covers blocks 0..19
    val f1 = EthLogs.fetch(rpc, filter, prevState = None, batchBlocks = 10, maxBatches = 2).get
    assert(rpc.calls.map(c => (c._1, c._2)).toSeq === Seq((0L, 9L), (10L, 19L)))
    assert(rpc.calls.forall(_._3 == filter)) // filter passed through verbatim
    assert(f1.sourceState === Some("ethBlock=19"))

    // the payload is an NDJSON batch the ordinary reader ingests
    val df = Readers.ndjson(spark, f1.path.toString,
      Some("blockNumber BIGINT, transactionHash STRING, logIndex BIGINT, address STRING, data STRING"))
    assert(df.count() === 7) // blocks 0,3,6,9,12,15,18
    assert(df.selectExpr("max(blockNumber)").head().getLong(0) === 18L)

    // second poll resumes after block 19 and covers the tail
    rpc.calls.clear()
    val f2 = EthLogs.fetch(rpc, filter, f1.sourceState, batchBlocks = 10, maxBatches = 2).get
    assert(rpc.calls.map(c => (c._1, c._2)).toSeq === Seq((20L, 24L)))
    assert(f2.sourceState === Some("ethBlock=24"))

    // nothing new -> None
    assert(EthLogs.fetch(rpc, filter, f2.sourceState, batchBlocks = 10).isEmpty)
  }

  test("explicit block window bounds the drain") {
    val rpc = new FakeRpc(latest = 1000)
    val f = EthLogs.fetch(rpc,
      LogFilter(fromBlock = Some(100), toBlock = Some(119)), batchBlocks = 10).get
    assert(rpc.calls.map(c => (c._1, c._2)).toSeq === Seq((100L, 109L), (110L, 119L)))
    assert(f.sourceState === Some("ethBlock=119"))
  }
}
