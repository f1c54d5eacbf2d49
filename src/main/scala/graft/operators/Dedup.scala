package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/**
 * Deduplication operators for large-scale corpus curation: exact,
 * MinHash+LSH, SimHash, and n-gram Jaccard. Everything is built from
 * codegen'd built-ins; the only shuffles are the groupBy on the dedup key
 * (exact) or the band/bucket key (LSH) — both hash-partitioned and
 * AQE-skew-safe, so the shapes hold at 100 TB.
 */
object Dedup {

  /**
   * Exact dedup on a normalized-text fingerprint: one hash-groupBy shuffle.
   * Returns one row per distinct content with the canonical (min) id and the
   * number of copies.
   */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), Text.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))

  /** Keep only the canonical copy of each distinct content. */
  def exactKeepFirst(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(Text.fingerprint(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /**
   * MinHash signature: k independent minimums of seeded xxhash64 over the
   * document's shingle set. One projection, no shuffle.
   */
  def minHashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingles, s => xxhash64(s, lit(i))))
    }: _*)

  /**
   * MinHash + LSH candidate pairs: band the signature (bands × rowsPerBand =
   * k), hash each band, shuffle on (band, bandHash), and pair up documents
   * that collide in at least one band. Estimated Jaccard = fraction of
   * matching minhashes; pairs below `minSim` are dropped.
   *
   * Scale shape: |docs| × bands rows shuffled once; bucket-local self-join.
   * Giant buckets (degenerate content) are capped at `maxBucket` docs to keep
   * the quadratic pair-up bounded — at 100 TB a pathological bucket would
   * otherwise dominate the stage.
   */
  def minHashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      minSim: Double = 0.6,
      maxBucket: Int = 1000
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    val r = numHashes / bands
    val sigs = df
      .select(
        col(idCol).as("id"),
        minHashSignature(Text.wordShingles(col(textCol), shingleLen), numHashes).as("sig")
      )
    val banded = sigs
      .select(
        col("id"),
        col("sig"),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => xxhash64(concat_ws(",", slice(col("sig"), b * r + 1, lit(r))), b)
          )
        ).as(Seq("band", "bucket"))
      )
    val capped = banded
      .withColumn(
        "__rn",
        row_number().over(Window.partitionBy(col("band"), col("bucket")).orderBy(col("id")))
      )
      .filter(col("__rn") <= maxBucket)
      .drop("__rn")

    val a = capped.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn(
        "est_jaccard",
        aggregate(
          zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0),
          (acc, v) => acc + v
        ).cast("double") / numHashes
      )
      .filter(col("est_jaccard") >= minSim)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /**
   * 64-bit SimHash over whitespace tokens: per-token xxhash64, signed
   * bit-vote per bit position, sign → bit. Pure expression pipeline.
   */
  def simHash(text: Column): Column = {
    val votes = aggregate(
      Text.tokens(text),
      array_repeat(lit(0), 64),
      (acc, t) =>
        zip_with(
          acc,
          transform(
            sequence(lit(0), lit(63)),
            j => when(call_function("shiftright", xxhash64(t), j).bitwiseAND(1) === 1, 1)
              .otherwise(-1)
          ),
          (a, v) => a + v
        )
    )
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, j) =>
        when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L),
      (acc, bit) => acc.bitwiseOR(bit)
    )
  }

  /**
   * SimHash near-dup pairs: documents whose 64-bit simhashes differ in at
   * most `maxHamming` bits. Candidate generation by the pigeonhole principle:
   * split the hash into `maxHamming + 1` chunks — any pair within the
   * distance budget must agree on at least one chunk — and shuffle on
   * (chunkIdx, chunkValue). Exact Hamming verify via bit_count(xor).
   */
  def simHashDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val hashed = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sh"))
    val chunked = hashed.select(
      col("id"),
      col("sh"),
      posexplode(
        transform(
          sequence(lit(0), lit(chunks - 1)),
          c => call_function("shiftrightunsigned", col("sh"), c * bitsPer)
            .bitwiseAND(if (bitsPer >= 64) lit(-1L) else lit((1L << bitsPer) - 1))
        )
      ).as(Seq("chunk", "ckey"))
    )
    val a = chunked.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Exact n-gram Jaccard similarity for candidate pairs, verified by set
   * intersection over word shingles. Use after LSH candidate generation; as a
   * standalone all-pairs operator it is quadratic and only for small inputs.
   */
  def ngramJaccard(
      pairs: DataFrame, // (id_a, id_b)
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3
  ): DataFrame = {
    val sh = docs.select(
      col(idCol).as("__jid"),
      array_distinct(Text.wordShingles(col(textCol), shingleLen)).as("__sh")
    )
    pairs
      .join(sh.withColumnRenamed("__jid", "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("__jid", "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", when(col("uni") > 0, col("inter") / col("uni")).otherwise(0.0))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * Embedding near-dup pairs: cosine similarity above `minCos`, candidates
   * from sign-LSH buckets (see [[Similarity.hyperplaneBucket]]).
   */
  def embeddingDups(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCos: Double = 0.95,
      numPlanes: Int = 12
  ): DataFrame = {
    val withBucket = df.select(
      col(idCol).as("id"),
      col(vecCol).as("vec"),
      Similarity.hyperplaneBucket(col(vecCol), numPlanes).as("bucket")
    )
    val a = withBucket.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = withBucket.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
