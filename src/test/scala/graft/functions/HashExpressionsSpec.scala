package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.SparkSpec
import graft.operators.Dedup

class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("minhash signature: length, determinism, identity, sensitivity") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content with no shared words at all")
    ).toDF("id", "text")
    val sigs = docs
      .select(
        col("id"),
        HashExpressions.minhashSignatureFast(Text.wordShingles(col("text"), 3), 32).as("sig")
      )
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    assert(sigs.values.forall(_.size == 32))
    assert(sigs(1L) === sigs(2L)) // identical text -> identical signature
    assert(sigs(1L) !== sigs(3L))
    val overlap = sigs(1L).zip(sigs(3L)).count { case (x, y) => x == y }
    assert(overlap <= 3) // disjoint shingle sets share ~0 minima
  }

  test("interpreted eval and codegen produce identical results") {
    val df = Seq((1L, Seq("a", "b", "c")), (2L, Seq.empty[String])).toDF("id", "arr")
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(
        col("id"),
        HashExpressions.minhashSignatureFast(col("arr"), 8).as("mh"),
        HashExpressions.simhash64Fast(col("arr")).as("sh")
      ).collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("NO_CODEGEN") === run("CODEGEN_ONLY"))
    // empty array: deterministic sentinel minima, zero-vote simhash
    val empty = run("CODEGEN_ONLY").find(_._1 == 2L).get
    assert(empty._2.forall(_ == Long.MaxValue) && empty._3 === 0L)
  }

  test("longDot: value-identical to the HOF formulation, null/empty/length-mismatch safe") {
    val df = Seq(
      (1L, Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](4L, 5L, 6L)),      // 32
      (2L, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](4L, 5L, 6L)),    // null elem -> 0
      (3L, Seq.empty[java.lang.Long], Seq[java.lang.Long](1L)),                    // empty
      (4L, Seq[java.lang.Long](2L, 3L), Seq[java.lang.Long](10L, 10L, 99L))        // min-length
    ).toDF("id", "a", "b")
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(col("id"), HashExpressions.longDot(col("a"), col("b")).as("d"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val got = run("CODEGEN_ONLY")
    assert(got === Map(1L -> 32L, 2L -> 22L, 3L -> 0L, 4L -> 50L))
    assert(run("NO_CODEGEN") === got)
    // matches the portable aggregate/zip_with spelling on equal-length,
    // non-null vectors (zip_with null-PADS mismatched lengths; longDot sums
    // over the min length — operators always pass fixed-dim vectors)
    val hof = df.filter(col("id") === 1L).select(col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), _ + _).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hof === Map(1L -> got(1L)))
  }

  test("fast LSH paths recover the planted near-dup like the portable paths") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val docs = Seq(
      (1L, base),
      (2L, base + "lambda"), // near-dup of 1
      (3L, "unrelated words entirely disjoint from everything else here now")
    ).toDF("id", "text")
    val mh = Dedup.minHashLshFast(docs, "id", "text", minSim = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mh.contains((1L, 2L)) && !mh.exists(p => p._1 == 3L || p._2 == 3L))

    // SimHash: derive the ground-truth hamming distances from the expression
    // itself, then assert the pigeonhole operator returns EXACTLY the pairs
    // within the threshold (hash-statistics-proof, unlike a fixed cutoff).
    val shVals = docs
      .select(col("id"), HashExpressions.simhash64Fast(Text.tokens(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(shVals(a) ^ shVals(b))
    val d12 = dist(1L, 2L)
    assert(d12 < dist(1L, 3L) && d12 < dist(2L, 3L)) // near-dup is nearest
    val ids = shVals.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b && dist(a, b) <= d12
    } yield (a, b)).toSet
    val sh = Dedup.simHashDupsFast(docs, "id", "text", maxHamming = d12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sh === expected && sh.contains((1L, 2L)))
  }

  test("SQL surface via GraftExtensions function builders") {
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val row = spark
      .sql("SELECT minhash_signature(array('a','b'), 8) AS mh, simhash64(array('a','b')) AS sh")
      .head()
    assert(row.getSeq[Long](0).size === 8)
    // matches the Column API exactly
    val viaApi = spark.range(1)
      .select(
        HashExpressions.minhashSignatureFast(array(lit("a"), lit("b")), 8).as("mh"),
        HashExpressions.simhash64Fast(array(lit("a"), lit("b"))).as("sh")
      ).head()
    assert(row.getSeq[Long](0) === viaApi.getSeq[Long](0))
    assert(row.getLong(1) === viaApi.getLong(1))
  }

  test("longSetContains: binary-searched membership, codegen ≡ interpreted") {
    val set = Array(-40L, -1L, 0L, 7L, 7000000000L).sorted
    val df = Seq(-41L, -40L, -1L, 0L, 1L, 7L, 8L, 7000000000L, Long.MaxValue).toDF("v")
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(col("v"), SetExpressions.longSetContains(col("v"), set).as("in"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val got = run("CODEGEN_ONLY")
    assert(got === Map(-41L -> false, -40L -> true, -1L -> true, 0L -> true,
      1L -> false, 7L -> true, 8L -> false, 7000000000L -> true, Long.MaxValue -> false))
    assert(run("NO_CODEGEN") === got)
    // unsorted / duplicated sets are refused (callers sort-distinct)
    val bad = intercept[Exception] {
      df.select(SetExpressions.longSetContains(col("v"), Array(3L, 2L))).collect()
    }
    assert(bad.getMessage.contains("ascending"))
  }

  test("packBytes/byteDot: unsigned semantics, clamping, codegen ≡ interpreted") {
    val df = Seq(
      (1L, Seq(0L, 128L, 255L), Seq(1L, 1L, 1L)),      // high bytes stay unsigned
      (2L, Seq(-5L, 300L, 7L), Seq(255L, 255L, 0L)),    // clamped to 0 / 255
      (3L, Seq.empty[Long], Seq(9L))                    // length-mismatch-safe
    ).toDF("id", "a", "b")
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(col("id"),
        ByteCodes.byteDot(ByteCodes.packBytes(col("a")), ByteCodes.packBytes(col("b"))).as("d"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val got = run("CODEGEN_ONLY")
    assert(got === Map(1L -> (0L + 128L + 255L), 2L -> (0L * 255L + 255L * 255L), 3L -> 0L))
    assert(run("NO_CODEGEN") === got)
  }
}
