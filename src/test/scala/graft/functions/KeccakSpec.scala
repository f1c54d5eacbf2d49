package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Keccak-256 against published vectors (original Keccak padding, NOT NIST
  * SHA3) and the eth_event_selector SQL surface. */
class KeccakSpec extends SparkSpec {
  import spark.implicits._

  test("keccak256 matches published vectors") {
    def k(s: String) = Keccak.hex(Keccak.hash256(s.getBytes("UTF-8")))
    assert(k("") === "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(k("abc") === "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert(k("The quick brown fox jumps over the lazy dog") ===
      "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15")
    // NOT the NIST SHA3-256 of "" (a7ffc6f8…) — padding domain differs
    assert(k("") !== "a7ffc6f8bf1ed76651c14756a061d662f580ff4de43b49fa82d80a4b80f8434a")
  }

  test("eth_event_selector produces the canonical topic0 values") {
    assert(Keccak.eventSelector("Transfer(address,address,uint256)") ===
      "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
    assert(Keccak.eventSelector("Approval(address,address,uint256)") ===
      "0x8c5be1e5ebec7d5bd14f71427d1e84f3dd0314c0f7b2291e5b200ac8c7c3b925")
  }

  test("multi-block absorb runs and changes with every block") {
    // no public long-input vector available offline; pin structure instead:
    // distinct inputs across the 136-byte rate boundary yield distinct,
    // stable, 32-byte digests (the short-input vectors above pin the
    // permutation and padding math)
    val hs = Seq(134, 135, 136, 137, 300).map(n => Keccak.hex(Keccak.hash256(Array.fill(n)('a'.toByte))))
    assert(hs.toSet.size === hs.size)
    assert(hs.forall(_.length === 64))
    assert(hs === Seq(134, 135, 136, 137, 300).map(n => Keccak.hex(Keccak.hash256(Array.fill(n)('a'.toByte)))))
  }

  test("SQL functions registered: keccak256 + eth_event_selector, codegen ≡ interpreted") {
    graft.GraftExtensions.functions.foreach { case (id, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val df = Seq("Transfer(address,address,uint256)").toDF("sig")
    df.createOrReplaceTempView("sigs")
    val viaSql = spark.sql(
      "SELECT eth_event_selector(sig) AS sel, keccak256(sig) AS h FROM sigs").head()
    assert(viaSql.getString(0) ===
      "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
    assert(viaSql.getString(1) === viaSql.getString(0).stripPrefix("0x"))
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(Keccak.ethEventSelector(col("sig"))).head().getString(0)
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("NO_CODEGEN") === run("CODEGEN_ONLY"))
    // binary input accepted too
    val binSel = Seq(Array[Byte]()).toDF("b")
      .select(Keccak.keccak256(col("b"))).head().getString(0)
    assert(binSel === "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
  }
}
