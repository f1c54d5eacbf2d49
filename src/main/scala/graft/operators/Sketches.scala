package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Mergeable summary sketches — the O(state)-per-key statistics a 100 TB
 * ingest loop maintains INCREMENTALLY instead of recomputing per tick
 * (the stats sibling of the MinHash/LSH/IVF/postings index-append trio).
 *
 * Both sketches here are deterministic and engine-portable, so their
 * estimates are pinned by the same DuckDB hash-compare oracle as every
 * exact operator: KMV uses the portable md5-derived hash family
 * (functions/Text.scala), the histogram uses exact integer bucket counts.
 *
 * Reference provenance: kamu exposes no sketching surface — these serve
 * the dataset-statistics use case its `tail`/SQL layer answers by full
 * scan (reference `src/infra/core/src/services/query`); the KMV estimator
 * is Bar-Yossef et al. 2002 ("Counting distinct elements in a data
 * stream"), the k-minimum-values form per Beyer et al. 2007.
 */
object Sketches {

  /** 2^60 as a double (exact): the size of the 15-hex-char hash space. */
  private val HashSpace: Double = 1152921504606846976.0

  /** Portable 60-bit hash: first 15 hex chars of md5, parsed base-16.
    * DuckDB replica: `('0x' || substring(md5('kmv:' || v), 1, 15))::BIGINT`.
    * 15 chars (not 16) keeps the value positive in signed-64 on both
    * engines, so ascending order agrees without unsigned casts. */
  private def kmvHash(v: Column): Column =
    conv(substring(md5(concat(lit("kmv:"), v.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /**
   * KMV (k-minimum-values) distinct-count sketch: per key, the k SMALLEST
   * distinct hashes of the value, as a sorted array. O(k) state per key,
   * exactly mergeable ([[kmvMerge]]): the k smallest of a union of k-min
   * sets IS the k-min set of the union — so per-slice sketches roll up to
   * the corpus sketch without ever rescanning history.
   *
   * Scale shape: ONE distinct over the slim (key, hash) projection, then
   * the skew-proof two-level top-k ([[Corpus.topKPerKey]]) — no per-key
   * state ever exceeds k, and the full rows never move.
   */
  def kmvSketch(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      k: Int
  ): DataFrame = {
    require(keyCols.nonEmpty && k > 0, "need keys and k > 0")
    val slim = df
      .filter(col(valueCol).isNotNull)
      .select((keyCols.map(col) :+ kmvHash(col(valueCol)).as("__h")): _*)
      .distinct()
    Corpus
      .topKPerKey(slim, keyCols, Seq(col("__h").asc), k)
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(col("__h"))).as("hashes"))
  }

  /** Merge two KMV sketches (same keys, same k): union the hash sets and
    * re-take the k smallest per key. Exact — merged ≡ a fresh sketch over
    * the concatenated inputs (KMV's defining property; spec-pinned and
    * oracle-pinned via the `kmv_distinct_merge` entry). Keys present in
    * only one side pass through untouched. */
  def kmvMerge(
      a: DataFrame,
      b: DataFrame,
      keyCols: Seq[String],
      k: Int
  ): DataFrame = {
    def ex(s: DataFrame) =
      s.select((keyCols.map(col) :+ explode(col("hashes")).as("__h")): _*)
    val u = ex(a).unionByName(ex(b)).distinct()
    Corpus
      .topKPerKey(u, keyCols, Seq(col("__h").asc), k)
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(col("__h"))).as("hashes"))
  }

  /**
   * Distinct-count estimate from a [[kmvSketch]]: if the sketch holds
   * fewer than k hashes the count is EXACT (= sketch size); otherwise the
   * KMV estimator (k-1) · 2^60 / h_k, with h_k the k-th smallest hash.
   * All arithmetic is exact-in-double ((k-1)·2^60 has ≤ 11 significant
   * bits; h_k < 2^53 never holds but long→double is correctly rounded on
   * both engines, and the final division is a single IEEE op), so the
   * estimate replicates bit-for-bit in the oracle.
   */
  def kmvStats(sketch: DataFrame, keyCols: Seq[String], k: Int): DataFrame = {
    require(k > 1, "k must exceed 1 for the (k-1)/h_k estimator")
    sketch.select(
      (keyCols.map(col) :+
        size(col("hashes")).cast("long").as("n_kept") :+
        element_at(col("hashes"), -1).as("kth_hash")): _*)
      .withColumn(
        "distinct_est",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * HashSpace) / col("kth_hash").cast("double")))
  }

  /**
   * Pairwise set similarity BETWEEN a [[kmvSketch]]'s keys (Beyer et al.
   * 2007 §4): for each unordered key pair, take the k smallest hashes of
   * the UNION of the two sketches (= the union's own KMV sketch — the
   * merge-exactness property again) and count how many of them appear in
   * BOTH sides; `jaccard_micro = 10⁶·n_common ∕ n_kept` is the classical
   * k-min estimate of |A∩B|∕|A∪B|, `union_est` the union's cardinality
   * via the same (k−1)∕h_k rule as [[kmvStats]], and `inter_est` their
   * product — "how much do these two segments' user bases overlap" from
   * O(k) state per key, no re-scan of the data. Deterministic end to end
   * (the hash IS the sample), so the DuckDB oracle replicates it exactly.
   *
   * Scale shape: the expansion is |pairs|·k rows (pairs = key², keys are
   * dimension-sized — segments, types, cohorts); per-pair top-k rides the
   * same skew-proof two-level cut as the sketch build. The data itself is
   * never touched.
   */
  def kmvJaccard(sketch: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 1, "k must exceed 1 for the (k-1)/h_k estimator")
    val ex = sketch.select(col(keyCol).as("__k"), explode(col("hashes")).as("__h"))
    val keys = sketch.select(col(keyCol).as("__k")).distinct()
    val pairs = keys.select(col("__k").as("key_a"))
      .join(keys.select(col("__k").as("key_b")), col("key_a") < col("key_b"))
    // membership-tagged union of the two sides, one hash-equi join each
    val sideA = pairs.join(ex, col("key_a") === col("__k"))
      .select(col("key_a"), col("key_b"), col("__h"), lit(1L).as("__a"), lit(0L).as("__b"))
    val sideB = pairs.join(ex, col("key_b") === col("__k"))
      .select(col("key_a"), col("key_b"), col("__h"), lit(0L).as("__a"), lit(1L).as("__b"))
    val u = sideA.unionByName(sideB)
      .groupBy(col("key_a"), col("key_b"), col("__h"))
      .agg(max(col("__a")).as("__a"), max(col("__b")).as("__b"))
    Corpus.topKPerKey(u, Seq("key_a", "key_b"), Seq(col("__h").asc), k)
      .groupBy(col("key_a"), col("key_b"))
      .agg(
        count(lit(1)).as("n_kept"),
        max(col("__h")).as("__kth"),
        sum(col("__a") * col("__b")).as("n_common"))
      .withColumn("jaccard_micro", expr("(n_common * 1000000L) DIV n_kept"))
      .withColumn("union_est",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * HashSpace) / col("__kth").cast("double")))
      .withColumn("inter_est",
        col("union_est") * (col("n_common").cast("double") / col("n_kept").cast("double")))
      .drop("__kth")
  }

  /** Materialize a [[kmvSketch]] as a managed table — the stats member of
    * the O(batch) maintenance family (MinHash bands, LSH/IVF/PQ cells,
    * BM25 postings, now cardinality sketches). */
  def materializeKmvTable(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      k: Int,
      table: String
  ): Unit =
    Bucketing.materializePlain(kmvSketch(df, keyCols, valueCol, k), table)

  /** Fold a new batch into a stored KMV table: sketch the BATCH, merge
    * with the stored sketch, swap. Per-tick cost is O(batch) + O(keys·k)
    * — the prior raw data is never re-touched, yet [[kmvStats]] over the
    * table equals a fresh sketch of the full history (KMV merge is exact;
    * the `kmv_distinct_append` entry shares the from-scratch oracle). */
  def appendToKmvTable(
      batch: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      k: Int,
      table: String
  ): Unit = {
    val spark = batch.sparkSession
    val merged = kmvMerge(
      spark.table(table), kmvSketch(batch, keyCols, valueCol, k), keyCols, k)
      .localCheckpoint() // materialize BEFORE the swap drops the table it reads
    Bucketing.materializePlain(merged, table)
  }

  /** Materialize a [[histSketch]] as a managed table. */
  def materializeHistTable(
      df: DataFrame,
      valueCol: String,
      binWidth: Double,
      table: String,
      keyCols: Seq[String] = Nil
  ): Unit =
    Bucketing.materializePlain(histSketch(df, valueCol, binWidth, keyCols), table)

  /** Fold a new batch into a stored histogram table: bucket counts add,
    * so the tick costs O(batch) + O(buckets) and quantile estimates over
    * the table equal a fresh sketch of the full history. */
  def appendToHistTable(
      batch: DataFrame,
      valueCol: String,
      binWidth: Double,
      table: String,
      keyCols: Seq[String] = Nil
  ): Unit = {
    val spark = batch.sparkSession
    val merged = histMerge(
      spark.table(table), histSketch(batch, valueCol, binWidth, keyCols), keyCols)
      .localCheckpoint()
    Bucketing.materializePlain(merged, table)
  }

  /**
   * Equi-width histogram sketch: exact counts per `floor(value/binWidth)`
   * bucket. One map-side-combinable groupBy over bucket ids — O(buckets)
   * state, trivially mergeable (counts add, [[histMerge]]), and therefore
   * maintainable per ingest slice: the 100 TB alternative to the total
   * sort behind [[Profile.quantiles]] when a ±binWidth answer suffices.
   */
  def histSketch(
      df: DataFrame,
      valueCol: String,
      binWidth: Double,
      keyCols: Seq[String] = Nil
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    df.filter(col(valueCol).isNotNull)
      .groupBy((keyCols.map(col) :+
        floor(col(valueCol) / binWidth).cast("long").as("bucket")): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Add two histogram sketches (same binWidth, same keys): counts sum. */
  def histMerge(a: DataFrame, b: DataFrame, keyCols: Seq[String] = Nil): DataFrame =
    a.unionByName(b)
      .groupBy((keyCols.map(col) :+ col("bucket")): _*)
      .agg(sum(col("n")).as("n"))

  // ------------------------------------------------------------- HyperLogLog

  /** HLL precision: p = 12 → m = 4096 registers, ~1.6% standard error —
    * fixed so sketches are always mergeable (register-wise max only works
    * across sketches of the SAME p). */
  val HllP: Int = 12
  private val HllM: Int = 1 << HllP
  private val HllWBits: Int = 60 - HllP // hash bits left after the bucket index
  private val HllMaxRank: Int = HllWBits + 1
  /** α·m²·2^(wBits+1): the raw-estimate numerator, one exact double
    * constant spliced verbatim into the oracle (Double round-trips
    * through its shortest decimal form on both engines). */
  val HllEstNumerator: Double =
    0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM * math.pow(2.0, HllMaxRank)

  /**
   * HyperLogLog register sketch (Flajolet et al. 2007): per key, the max
   * leading-zero rank per register bucket over the portable 60-bit md5
   * hash — O(m) state per key, register-wise-max mergeable, and fully
   * deterministic, so the estimate is pinned by the same DuckDB
   * recomputation oracle as every exact operator. Only OCCUPIED registers
   * are stored (empty ones are implicit — [[hllStats]] adds them back);
   * stored ranks are ≥ 1 by construction.
   *
   * Scale shape: one map-side-combinable groupBy over (key, bucket) —
   * at most m = 4096 rows per key survive the partial aggregate, so the
   * shuffle is keys·m-bounded regardless of input size.
   */
  def hllSketch(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String
  ): DataFrame = {
    val h = conv(substring(md5(concat(lit("hll:"), col(valueCol).cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val bucket = shiftright(h, HllWBits).cast("int")
    val w = h.bitwiseAND(lit((1L << HllWBits) - 1L))
    // rank = leading zeros of the wBits-wide suffix + 1; bin() drops
    // leading zeros on both engines, so msb position = length(bin(w))
    val rank = when(w === 0L, lit(HllMaxRank))
      .otherwise(lit(HllMaxRank) - length(bin(w)))
      .cast("int")
    df.filter(col(valueCol).isNotNull)
      .select((keyCols.map(col) :+ bucket.as("bucket") :+ rank.as("r")): _*)
      .groupBy((keyCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("r")).as("r"))
  }

  /** Merge HLL sketches (same p, same keys): register-wise max. Lossless —
    * merged ≡ a fresh sketch over the concatenated inputs (max of maxes),
    * so per-slice sketches roll up without rescanning history. */
  def hllMerge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keyCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("r")).as("r"))

  /**
   * Distinct-count estimate from a [[hllSketch]]: the classic two-branch
   * estimator — raw = α·m²∕Σ2^(−r) over all m registers (empty registers
   * contribute 2^0), switched to linear counting m·ln(m∕V) when raw ≤
   * 2.5·m and V (empty registers) > 0. The register sum is EXACT integer
   * arithmetic (each 2^(−r) scaled by 2^maxRank stays a long; m·2^maxRank
   * < 2^62), and the final double derivation is one fixed expression tree
   * floored onto the 1e-6 grid — engine-exact, same doctrine as the
   * BM25/perplexity ln grids. Output: key cols + (n_buckets, n_zero,
   * distinct_est_micro).
   */
  def hllStats(sketch: DataFrame, keyCols: Seq[String]): DataFrame = {
    val agg = sketch
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(1L, $HllMaxRank - r)")).as("__ss"))
      .withColumn("n_zero", lit(HllM.toLong) - col("n_buckets"))
      .withColumn("__s", col("__ss") + col("n_zero") * lit(1L << HllMaxRank))
    val raw = lit(HllEstNumerator) / col("__s").cast("double")
    val est = when(raw <= lit(2.5 * HllM) && col("n_zero") > 0L,
      lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("n_zero").cast("double")))
      .otherwise(raw)
    agg.select((keyCols.map(col) :+ col("n_buckets") :+ col("n_zero") :+
      floor(est * lit(1000000.0)).cast("long").as("distinct_est_micro")): _*)
  }

  /**
   * Pairwise set overlap BETWEEN a [[hllSketch]]'s keys via
   * inclusion-exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), with the
   * union sketch the register-wise max (lossless merge — est(A∪B) is
   * EXACTLY the sketch of the concatenated inputs). The fixed-size
   * sibling of [[kmvJaccard]]: O(m) state per key regardless of
   * cardinality, at the cost of inclusion-exclusion's compounded error
   * (the intersection clamps at 0). All three estimates reuse the
   * [[hllStats]] 1e-6-grid estimator, so the oracle replicates them from
   * the same register recomputation. Output: `(key_a, key_b,
   * union_est_micro, inter_est_micro, jaccard_micro)` with
   * `jaccard_micro = 10⁶·inter ∕ union` in integer floor division.
   *
   * Scale shape: the pair expansion is |pairs|·m register rows (keys are
   * dimension-sized); the data is never re-touched.
   */
  def hllOverlap(sketch: DataFrame, keyCol: String): DataFrame = {
    val per = hllStats(sketch, Seq(keyCol))
      .select(col(keyCol).as("__k"), col("distinct_est_micro").as("__e"))
    val keys = sketch.select(col(keyCol).as("__k")).distinct()
    val pairs = keys.select(col("__k").as("key_a"))
      .join(keys.select(col("__k").as("key_b")), col("key_a") < col("key_b"))
    val unioned = pairs
      .join(sketch.select(col(keyCol).as("key_a"), col("bucket"), col("r")), Seq("key_a"))
      .unionByName(pairs
        .join(sketch.select(col(keyCol).as("key_b"), col("bucket"), col("r")), Seq("key_b"))
        .select(col("key_a"), col("key_b"), col("bucket"), col("r")))
      .groupBy(col("key_a"), col("key_b"), col("bucket"))
      .agg(max(col("r")).as("r"))
    val uEst = hllStats(unioned, Seq("key_a", "key_b"))
      .select(col("key_a"), col("key_b"), col("distinct_est_micro").as("union_est_micro"))
    uEst
      .join(per.select(col("__k").as("key_a"), col("__e").as("__ea")), Seq("key_a"))
      .join(per.select(col("__k").as("key_b"), col("__e").as("__eb")), Seq("key_b"))
      .withColumn("inter_est_micro",
        greatest(lit(0L), col("__ea") + col("__eb") - col("union_est_micro")))
      .withColumn("jaccard_micro",
        when(col("union_est_micro") > 0L,
          expr("(inter_est_micro * 1000000L) DIV union_est_micro")).otherwise(lit(0L)))
      .select(col("key_a"), col("key_b"), col("union_est_micro"),
        col("inter_est_micro"), col("jaccard_micro"))
  }

  /** Materialize a [[hllSketch]] as a managed table. */
  /**
   * Rolling-window distinct counts from per-day HLL sketches — "distinct
   * users over the trailing `windowDays` days, per key, for every day
   * the key was active". The exact form needs the full value set per
   * window (unmergeable); register sketches make the rollup additive:
   * each (key, day) sketch is built ONCE, then contributes to the ≤
   * `windowDays` target days it falls inside via a register-wise max —
   * the union of daily sketches IS the window sketch (lossless merge).
   *
   * Scale shape: one event-sized shuffle for the daily registers; the
   * roll explodes REGISTERS (keys·days·≤4096 rows) by the window width
   * and re-maxes — dimension-bounded, the events are never rescanned per
   * window. Target days are the key's active days (semi-join).
   */
  def rollingDistinctHll(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      windowDays: Int
  ): DataFrame = {
    require(windowDays >= 1, "windowDays must be at least 1")
    val withDay = events.filter(col(tsCol).isNotNull)
      .withColumn("__day", to_date(col(tsCol)))
    val daily = hllSketch(withDay, Seq(keyCol, "__day"), valueCol)
      .localCheckpoint() // feeds the roll and the active-day set
    val present = daily.select(col(keyCol), col("__day").as("day")).distinct()
    val rolled = daily
      .withColumn("__o", explode(sequence(lit(0), lit(windowDays - 1))))
      .withColumn("day", date_add(col("__day"), col("__o")))
      .groupBy(col(keyCol), col("day"), col("bucket"))
      .agg(max(col("r")).as("r"))
      .join(present, Seq(keyCol, "day"), "left_semi")
    hllStats(rolled, Seq(keyCol, "day"))
  }

  def materializeHllTable(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      table: String
  ): Unit =
    Bucketing.materializePlain(hllSketch(df, keyCols, valueCol), table)

  /** Fold a new batch into a stored HLL table: sketch the BATCH, register-
    * max with the stored sketch, swap. O(batch) + O(keys·m) per tick, and
    * [[hllStats]] over the table equals a fresh sketch of the full history
    * (the `hll_distinct_append` entry shares the from-scratch oracle). */
  def appendToHllTable(
      batch: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      table: String
  ): Unit = {
    val spark = batch.sparkSession
    val merged = hllMerge(
      spark.table(table), hllSketch(batch, keyCols, valueCol), keyCols)
      .localCheckpoint() // materialize BEFORE the swap drops the table it reads
    Bucketing.materializePlain(merged, table)
  }

  /**
   * One foreachBatch tick of STREAMING HLL maintenance: append the
   * BATCH's register rows — no swap, no batch-id guard. Register
   * max-merge is idempotent, so a replayed epoch's duplicate rows are
   * value-invisible at read time (the same guard-free crash-safety the
   * Bloom OR-merge append enjoys); state grows by one O(batch-keys·m)
   * generation per tick and folds back with [[compactHllTable]].
   */
  def applyHllBatch(
      table: String,
      keyCols: Seq[String],
      valueCol: String
  )(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val rows = hllSketch(batch, keyCols, valueCol)
    if (!spark.catalog.tableExists(table))
      Bucketing.materializePlain(rows, table)
    else rows.select(spark.table(table).columns.map(col).toSeq: _*)
      .write.insertInto(table)
  }

  /** Streaming distinct-count maintenance: `stream → foreachBatch →
    * per-generation register rows`; read with [[readHllTable]]. */
  def hllDistinctStream(
      stream: DataFrame,
      table: String,
      keyCols: Seq[String],
      valueCol: String
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch(applyHllBatch(table, keyCols, valueCol) _)

  /** The stored generations re-maxed to one register set — feed to
    * [[hllStats]]; equals a fresh sketch of everything ever appended. */
  def readHllTable(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame = {
    val t = spark.table(table)
    val keys = t.columns.filterNot(c => c == "bucket" || c == "r")
    t.groupBy((keys.map(col) :+ col("bucket")).toSeq: _*).agg(max(col("r")).as("r"))
  }

  /** Fold the accumulated per-tick generations back to one (register-max
    * rewrite, value-identical reads before and after; crash-safe via the
    * staged [[Bucketing.swapInPlain]]). */
  def compactHllTable(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    Bucketing.recoverSwap(spark, table)
    Bucketing.swapInPlain(readHllTable(spark, table), table)
  }

  // ------------------------------------------------------------- Bloom filter

  /** Bloom filter size in bits (m). 16384 bits ≈ 0.5% false-positive rate
    * at 1.5k members with [[BloomK]] = 4 — and the packed-word state is
    * ≤ ⌈m∕62⌉ = 265 rows per key no matter the cardinality. */
  val BloomBits: Long = 16384L
  /** Number of hash functions (k), realized by double hashing. */
  val BloomK: Int = 4
  /** Bits packed per word. 62, not 64: DuckDB's `<<` overflow-checks at
    * bit 63, so keeping indices in [0, 62) makes every word value a
    * positive BIGINT both engines agree on. */
  private val BloomWordBits: Int = 62

  private def bloomHash(prefix: String, v: Column): Column =
    conv(substring(md5(concat(lit(prefix), v.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /**
   * Bloom filter sketch (Bloom 1970): per key, a fixed [[BloomBits]]-bit
   * membership filter over `valueCol`, stored as packed 62-bit words
   * `(keys..., word, bits)` — only occupied words; empty words are
   * implicit zero. The k = [[BloomK]] probe positions come from double
   * hashing (Kirsch & Mitzenmacher 2006): `pos_i = (h1 + i·h2) mod m`
   * with h2 forced ODD (`h2 | 1`) — m is a power of two, so an odd step
   * is coprime to m and the k probe positions are always distinct; an
   * even (or zero) h2 would collapse some values to fewer than k
   * positions and silently inflate their false-positive exposure —
   * over the portable 60-bit md5 hash family, so the filter is fully
   * deterministic and the DuckDB oracle recomputes it bit-for-bit.
   *
   * Scale shape: the k-way position fan-out is map-side (a `transform`
   * over two precomputed hash columns — no re-evaluation inside the
   * lambda), and the only shuffle is the map-side-combinable
   * (key, word) groupBy whose output is ≤ keys·⌈m∕62⌉ rows. `bit_or`
   * merge ([[bloomMerge]]) is lossless AND idempotent, so per-slice
   * filters roll up — and re-appending a batch is a no-op by algebra,
   * making the maintained table crash-safe without a batch-id guard.
   */
  def bloomSketch(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String
  ): DataFrame = {
    val keys = keyCols.map(col)
    df.filter(col(valueCol).isNotNull)
      .select((keys :+
        bloomHash("bf1:", col(valueCol)).as("__h1") :+
        bloomHash("bf2:", col(valueCol)).bitwiseOR(1L).as("__h2")): _*)
      .select((keys :+ explode(expr(
        s"transform(sequence(0, ${BloomK - 1}), i -> (__h1 + i * __h2) % ${BloomBits}L)"))
        .as("__pos")): _*)
      .groupBy((keys :+ expr(s"__pos DIV $BloomWordBits").as("word")): _*)
      .agg(expr(s"bit_or(shiftleft(1L, CAST(__pos % $BloomWordBits AS INT)))").as("bits"))
  }

  /** OR two Bloom sketches (same m/k, same keys): bitwise-or per word is
    * the exact union filter — lossless and idempotent. */
  def bloomMerge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keyCols.map(col) :+ col("word")): _*)
      .agg(expr("bit_or(bits)").as("bits"))

  /**
   * Membership probe: for each `(keys..., probe value)` row, 1 iff all k
   * probe positions are set in that key's filter ("maybe present" — no
   * false negatives; false positives at the designed rate), else 0
   * ("definitely absent"). The probe side explodes to k rows, joins the
   * O(keys·words) sketch (broadcastable at any data scale), and
   * `bool_and`s back — never touches the original data.
   */
  def bloomProbe(
      sketch: DataFrame,
      keyCols: Seq[String],
      probes: DataFrame,
      probeCol: String
  ): DataFrame = {
    val keys = keyCols.map(col)
    val pcol = col(probeCol)
    probes
      .select((keys :+ pcol :+
        bloomHash("bf1:", pcol).as("__h1") :+
        bloomHash("bf2:", pcol).bitwiseOR(1L).as("__h2")): _*)
      .select((keys :+ pcol :+ explode(expr(
        s"transform(sequence(0, ${BloomK - 1}), i -> (__h1 + i * __h2) % ${BloomBits}L)"))
        .as("__pos")): _*)
      .withColumn("__word", expr(s"__pos DIV $BloomWordBits"))
      .join(broadcast(sketch.withColumnRenamed("word", "__word")),
        keyCols :+ "__word", "left")
      .withColumn("__hit",
        col("bits").isNotNull &&
          expr(s"(shiftright(bits, CAST(__pos % $BloomWordBits AS INT)) & 1L) = 1L"))
      .groupBy((keys :+ pcol): _*)
      .agg(min(when(col("__hit"), lit(1L)).otherwise(lit(0L))).as("maybe_present"))
  }

  /** Materialize a [[bloomSketch]] as a managed table. */
  def materializeBloomTable(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      table: String
  ): Unit =
    Bucketing.materializePlain(bloomSketch(df, keyCols, valueCol), table)

  /** Fold a new batch into a stored Bloom table: sketch the BATCH, OR
    * with the stored words, swap. O(batch) + O(keys·words) per tick;
    * because OR is idempotent, a retried append of the same batch leaves
    * the table unchanged — crash-safe with no guard state. */
  def appendToBloomTable(
      batch: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      table: String
  ): Unit = {
    val spark = batch.sparkSession
    val merged = bloomMerge(
      spark.table(table), bloomSketch(batch, keyCols, valueCol), keyCols)
      .localCheckpoint() // materialize BEFORE the swap drops the table it reads
    Bucketing.materializePlain(merged, table)
  }

  /**
   * Count-min sketch (Cormode & Muthukrishnan 2005): a depth×width
   * integer counter matrix over the portable hash family — frequency
   * estimates for ANY value from O(depth·width) state, the third member
   * of the mergeable-sketch trio (KMV = cardinality, histogram =
   * distribution, CMS = frequency). Counters add, so per-slice sketches
   * merge/append exactly like [[histMerge]]. Returns (r, c, n) rows —
   * only occupied cells, the zero cells are implicit.
   *
   * `preAggregate = true` (r18, guide §2.3) counts rows per DISTINCT value
   * first and hashes each distinct value once instead of every row: the
   * depth md5 hashes per row are the whole cost of the sketch, so on a
   * column with duplication (l_orderkey repeats ~4x) this is a measured
   * 2.4 -> 1.3 s at sf0.1 with bit-identical cells (the per-cell count is
   * the sum of its values' counts either way). The trade: a (value, count)
   * aggregate SHUFFLE replaces map-side-only hashing — on near-unique
   * columns that shuffle buys nothing and costs ~20% (orders measured
   * 0.72 -> 0.90 s), so callers opt in where the key provably repeats.
   */
  def cmsSketch(
      df: DataFrame,
      valueCol: String,
      depth: Int,
      width: Int,
      preAggregate: Boolean = false
  ): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1 and width >= 2")
    def cellsOf(v: Column) = (0 until depth).map { r =>
      graft.functions.Text.portableHash31(
        concat(lit(s"cms:$r:"), v.cast("string"))) % width
    }
    val in = df.filter(col(valueCol).isNotNull)
    if (preAggregate) {
      in.groupBy(col(valueCol).as("__v")).agg(count(lit(1)).as("__cnt"))
        .select(col("__cnt"), posexplode(array(cellsOf(col("__v")): _*)).as(Seq("r", "c")))
        .groupBy(col("r").cast("int").as("r"), col("c"))
        .agg(sum(col("__cnt")).as("n"))
    } else {
      in.select(posexplode(array(cellsOf(col(valueCol)): _*)).as(Seq("r", "c")))
        .groupBy(col("r").cast("int").as("r"), col("c"))
        .agg(count(lit(1)).as("n"))
    }
  }

  /** Add two CMS sketches (same depth/width): counters sum. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("r"), col("c")).agg(sum(col("n")).as("n"))

  /**
   * Equi-join SIZE estimate from two [[cmsSketch]]es over the join key
   * (Cormode & Muthukrishnan 2005, the AMS inner-product estimator):
   * |A ⋈ B| = Σ_k f_A(k)·f_B(k) is estimated by the MINIMUM over depth
   * rows of the row-wise counter dot product — always an OVERestimate of
   * the true size (collisions only add), within εN_A·N_B with
   * probability 1−δ. The cardinality-estimation primitive a planner
   * consults before choosing a join strategy, computed without touching
   * either table: the dot product runs on two O(depth·width) frames.
   * Exact integer arithmetic — counter products must stay under 2^63
   * (n_A·n_B per cell; coarsen width if both sides are astronomically
   * skewed onto one cell).
   */
  def cmsJoinSize(a: DataFrame, b: DataFrame): DataFrame = {
    val dots = a
      .join(b.select(col("r"), col("c"), col("n").as("__nb")), Seq("r", "c"))
      .groupBy(col("r"))
      .agg(sum(col("n") * col("__nb")).as("__dot"))
    // A depth row with NO common occupied cells has dot product 0 — it
    // must participate in the min as 0, not vanish from the inner join:
    // fully disjoint sketches estimate 0, and a partially disjoint pair
    // must not skip its tightest (zero) row. The depth axis is the union
    // of both sketches' occupied rows (every value hashes into every
    // depth row, so any non-empty sketch covers the full axis).
    a.select(col("r")).union(b.select(col("r"))).distinct()
      .join(dots, Seq("r"), "left")
      .agg(min(coalesce(col("__dot"), lit(0L))).as("join_size_est"))
  }

  /**
   * Point-frequency estimates from a [[cmsSketch]]: for each probe value,
   * min over the depth rows of its counter — the classic CMS guarantee
   * (estimate ≥ true count always; ≤ true + εN with probability 1−δ for
   * width = e/ε, depth = ln(1/δ)). Exact integer arithmetic throughout,
   * so estimates replicate bit-for-bit. Probes join the sketch on (r, c):
   * a |probes|·depth-row build side against the O(depth·width) sketch —
   * nothing corpus-sized moves at query time.
   */
  def cmsEstimate(
      sketch: DataFrame,
      probes: DataFrame,
      valueCol: String,
      depth: Int,
      width: Int
  ): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1 and width >= 2")
    val cells = (0 until depth).map { r =>
      graft.functions.Text.portableHash31(
        concat(lit(s"cms:$r:"), col(valueCol).cast("string"))) % width
    }
    probes
      .select(col(valueCol), posexplode(array(cells: _*)).as(Seq("r", "c")))
      .select(col(valueCol), col("r").cast("int").as("r"), col("c"))
      .join(sketch, Seq("r", "c"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
  }

  /**
   * Quantile estimates from a [[histSketch]]: for each p, the LOWER EDGE
   * of the first bucket whose cumulative count reaches ceil(p·total) —
   * a deterministic integer rule (no interpolation), within binWidth of
   * the exact quantile by construction (spec-pinned vs
   * [[Profile.quantiles]]).
   *
   * Scale shape: the cumulative sum windows over BUCKETS (already
   * aggregated, O(value-range/binWidth) rows — hundreds, not billions),
   * so the single-partition window is a deliberate, bounded choice.
   */
  def histQuantiles(
      hist: DataFrame,
      binWidth: Double,
      ps: Seq[Double],
      keyCols: Seq[String] = Nil
  ): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      "quantiles must lie in (0, 1]")
    val spark = hist.sparkSession
    import spark.implicits._
    val part =
      if (keyCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(keyCols.map(col): _*)
    val cum = hist
      .withColumn("cum", sum(col("n")).over(
        part.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n")).over(
        part.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    ps.toDF("p")
      .crossJoin(cum)
      .filter(col("cum") >= ceil(col("p") * col("total").cast("double")).cast("long"))
      .groupBy((keyCols.map(col) :+ col("p")): _*)
      .agg(min(col("bucket")).as("bucket"))
      .withColumn("q_est", col("bucket").cast("double") * lit(binWidth))
  }

  // ------------------------------------------------------- rank sketch

  /** Portable 60-bit hash for the rank sketch's row identity.
    * DuckDB replica: `('0x' || substring(md5('rk:' || tie), 1, 15))::BIGINT`. */
  private def rkHash(tie: Column): Column =
    conv(substring(md5(concat(lit("rk:"), tie.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /**
   * Deterministic mergeable RANK/QUANTILE sketch — the quantile tool when
   * the value range is unknown a priori (the gap [[histQuantiles]] leaves:
   * it needs a binWidth chosen up front). The sketch is a hash-subsample
   * at a fixed `level` L: a row survives iff its identity hash h satisfies
   * `h % 2^L == 0` (≡ L trailing zero bits — pure integer arithmetic, so
   * any engine reproduces the sample EXACTLY; no RNG, no order
   * dependence), alongside the exact row count. Estimated rank of the
   * i-th smallest sample value is i·2^L; expected rank error at quantile
   * φ is O(√(2^L·φn)) (binomial sampling), so L trades state for ε like
   * any rank sketch — but unlike GK/KLL the compaction is a pure FILTER,
   * which is what makes merge exact and the DuckDB oracle a from-scratch
   * replica (the sampling idea is classical — Vitter 1985 reservoirs,
   * mergeable-summaries Agarwal et al. 2012 §3 random sampling — with the
   * random bits replaced by a portable hash).
   *
   * Sketch layout (one frame, the single-commit fact-table discipline):
   * kind='s' sample rows (value, tie), kind='n' exact-count rows (n
   * additive), kind='l' the level, kind='b' append batch-id guards.
   *
   * Scale shape: the sketch pass is a map-only filter + one count
   * aggregate — no shuffle of data rows at all; sample size n∕2^L is the
   * user's lever (pick L so the sample is executor-sized at the target
   * corpus).
   */
  def rankSketch(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      level: Int
  ): DataFrame = {
    require(level >= 0 && level <= 40, "level must lie in [0, 40]")
    val f = df.filter(col(valueCol).isNotNull && col(tieCol).isNotNull)
    val samples = f
      .filter(rkHash(col(tieCol)) % lit(1L << level) === 0L)
      .select(lit("s").as("kind"), col(valueCol).cast("double").as("value"),
        col(tieCol).cast("string").as("tie"), lit(1L).as("n"))
    val cnt = f.agg(count(lit(1)).as("n"))
      .select(lit("n").as("kind"), lit(null).cast("double").as("value"),
        lit(null).cast("string").as("tie"), col("n"))
    val lvl = samples.sparkSession.range(1)
      .select(lit("l").as("kind"), lit(null).cast("double").as("value"),
        lit(null).cast("string").as("tie"), lit(level.toLong).as("n"))
    samples.unionByName(cnt).unionByName(lvl)
  }

  /** The stored level of a rank sketch — a bounded single-row aggregate
    * (sketches hold one 'l' row per build/merge; max is the contract). */
  private def rankSketchLevel(sketch: DataFrame): Int =
    sketch.filter(col("kind") === "l").agg(max(col("n"))).collect()(0).getLong(0).toInt

  /** Merge two rank sketches, possibly built at DIFFERENT levels: the
    * target level is the max of the two, and the coarser side's samples
    * RE-FILTER by recomputing the identity hash (h % 2^Lmax == 0 selects
    * an exact subset of h % 2^Lmin == 0), so the merged sketch is
    * IDENTICAL to a fresh level-Lmax sketch over the concatenated inputs
    * — the KMV-style exactness that lets merge/append entries share the
    * from-scratch oracle. Counts add; guard rows pass through. */
  def rankSketchMerge(a: DataFrame, b: DataFrame): DataFrame = {
    val lvl = math.max(rankSketchLevel(a), rankSketchLevel(b))
    val u = a.unionByName(b)
    val kept = u
      .filter(col("kind") =!= "l")
      .filter(col("kind") =!= "s" || rkHash(col("tie")) % lit(1L << lvl) === 0L)
    val lrow = u.sparkSession.range(1)
      .select(lit("l").as("kind"), lit(null).cast("double").as("value"),
        lit(null).cast("string").as("tie"), lit(lvl.toLong).as("n"))
    kept.unionByName(lrow)
  }

  /**
   * Quantile estimates from a [[rankSketch]]: for each φ (on the 1e-6
   * integer grid), the smallest sample value whose estimated rank i·2^L
   * reaches target max(1, ⌊φ·n⌋), falling back to the sample max when the
   * sample's rank mass runs short — every step integer, so the oracle
   * replicates it exactly. Output: `(phi_micro, n_total, sample_size,
   * q_est)`.
   *
   * Scale shape: one sample-sized sort window (the row_number) — bounded
   * by n∕2^L, the user's lever — then a φ-broadcast aggregate.
   */
  def rankSketchQuantiles(sketch: DataFrame, phisMicro: Seq[Long]): DataFrame = {
    require(phisMicro.nonEmpty && phisMicro.forall(p => p > 0L && p <= 1000000L),
      "quantile targets must lie in (0, 1] on the micro grid")
    val spark = sketch.sparkSession
    import spark.implicits._
    val lvl = rankSketchLevel(sketch)
    val total = sketch.filter(col("kind") === "n")
      .agg(coalesce(sum(col("n")), lit(0L)).as("__nt"))
    val samp = sketch.filter(col("kind") === "s")
      .withColumn("__i",
        row_number().over(Window.orderBy(col("value"), col("tie"))).cast("long"))
    phisMicro.toDF("phi_micro")
      .crossJoin(broadcast(total))
      .crossJoin(samp)
      .withColumn("__tgt", greatest(lit(1L), expr("(phi_micro * __nt) DIV 1000000L")))
      .groupBy(col("phi_micro"), col("__nt"))
      .agg(
        count(lit(1)).as("sample_size"),
        coalesce(
          min(when(col("__i") * lit(1L << lvl) >= col("__tgt"), col("value"))),
          max(col("value"))).as("q_est"))
      .select(col("phi_micro"), col("__nt").as("n_total"),
        col("sample_size"), col("q_est"))
  }

  /**
   * Keyed variant of [[rankSketch]] — per-key quantiles with the same
   * deterministic hash-subsample (one shared level; the filter is still
   * map-only). Layout mirrors the global sketch plus a `key` column:
   * kind='s' rows (key, value, tie), kind='n' per-key exact counts,
   * kind='l' the level. The hist_quantiles_by_key sibling for when no
   * binWidth is known a priori.
   */
  def rankSketchByKey(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      tieCol: String,
      level: Int
  ): DataFrame = {
    require(level >= 0 && level <= 40, "level must lie in [0, 40]")
    val f = df.filter(
      col(keyCol).isNotNull && col(valueCol).isNotNull && col(tieCol).isNotNull)
    val samples = f
      .filter(rkHash(col(tieCol)) % lit(1L << level) === 0L)
      .select(lit("s").as("kind"), col(keyCol).cast("string").as("key"),
        col(valueCol).cast("double").as("value"),
        col(tieCol).cast("string").as("tie"), lit(1L).as("n"))
    val cnt = f.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .select(lit("n").as("kind"), col(keyCol).cast("string").as("key"),
        lit(null).cast("double").as("value"), lit(null).cast("string").as("tie"),
        col("n"))
    val lvl = samples.sparkSession.range(1)
      .select(lit("l").as("kind"), lit(null).cast("string").as("key"),
        lit(null).cast("double").as("value"), lit(null).cast("string").as("tie"),
        lit(level.toLong).as("n"))
    samples.unionByName(cnt).unionByName(lvl)
  }

  /** Per-key quantile estimates from a [[rankSketchByKey]] sketch — the
    * same integer rank rule as [[rankSketchQuantiles]], with the
    * row_number window PARTITIONED BY KEY (per-key sample series, never a
    * single global partition). Output: `(key, phi_micro, n_total,
    * sample_size, q_est)`. */
  def rankSketchQuantilesByKey(sketch: DataFrame, phisMicro: Seq[Long]): DataFrame = {
    require(phisMicro.nonEmpty && phisMicro.forall(p => p > 0L && p <= 1000000L),
      "quantile targets must lie in (0, 1] on the micro grid")
    val spark = sketch.sparkSession
    import spark.implicits._
    val lvl = rankSketchLevel(sketch)
    val totals = sketch.filter(col("kind") === "n")
      .groupBy(col("key")).agg(coalesce(sum(col("n")), lit(0L)).as("__nt"))
    val samp = sketch.filter(col("kind") === "s")
      .withColumn("__i",
        row_number().over(
          Window.partitionBy(col("key")).orderBy(col("value"), col("tie"))).cast("long"))
    phisMicro.toDF("phi_micro")
      .crossJoin(samp)
      .join(totals, Seq("key"))
      .withColumn("__tgt", greatest(lit(1L), expr("(phi_micro * __nt) DIV 1000000L")))
      .groupBy(col("key"), col("phi_micro"), col("__nt"))
      .agg(
        count(lit(1)).as("sample_size"),
        coalesce(
          min(when(col("__i") * lit(1L << lvl) >= col("__tgt"), col("value"))),
          max(col("value"))).as("q_est"))
      .select(col("key"), col("phi_micro"), col("__nt").as("n_total"),
        col("sample_size"), col("q_est"))
  }

  /** Materialize a [[rankSketch]] as a managed table — the quantile
    * member of the O(batch) maintenance family. */
  def materializeRankSketchTable(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      level: Int,
      table: String
  ): Unit =
    Bucketing.materializePlain(rankSketch(df, valueCol, tieCol, level), table)

  /** Fold a new batch into a stored rank-sketch table with ONE idempotent
    * commit: the batch sketches at the table's stored level, and its
    * sample rows, exact-count row, and a kind='b' batch-id guard row land
    * in a single insertInto — a crash either committed the whole batch or
    * none of it, and a retried `batchId` short-circuits on the guard (the
    * same single-commit discipline as the basket fact table). Per-tick
    * cost: one map-only filter over the batch + one append; history is
    * never re-read. [[rankSketchQuantiles]] over the table equals a fresh
    * sketch of the full history (the filter is order-free). */
  def appendToRankSketchTable(
      batch: DataFrame,
      valueCol: String,
      tieCol: String,
      table: String,
      batchId: String
  ): Unit = {
    val spark = batch.sparkSession
    val seen = spark.table(table)
      .filter(col("kind") === "b" && col("tie") === batchId)
      .limit(1).count() // bounded: 0 or 1 guard rows per batch id
    if (seen > 0) return
    val lvl = rankSketchLevel(spark.table(table))
    val guard = spark.range(1)
      .select(lit("b").as("kind"), lit(null).cast("double").as("value"),
        lit(batchId).as("tie"), lit(1L).as("n"))
    rankSketch(batch, valueCol, tieCol, lvl)
      .filter(col("kind") =!= "l") // the table already carries its level row
      .unionByName(guard)
      .select(spark.table(table).columns.map(col).toSeq: _*)
      .write.insertInto(table)
  }

  /** Fold an [[appendToRankSketchTable]]-maintained table's accumulated
    * per-batch rows: the per-batch exact-count ('n') rows sum into ONE,
    * the level row stays single, samples pass through, and the 'b' guard
    * rows are KEPT (replay detection of already-ingested batch ids must
    * survive compaction). [[rankSketchQuantiles]] is identical before and
    * after — it sums 'n' rows anyway — and the rewrite rides the staged
    * [[Bucketing.swapInPlain]] on sketch-sized (sample + guards) state. */
  def compactRankSketchTable(
      spark: org.apache.spark.sql.SparkSession,
      table: String
  ): Unit = {
    Bucketing.recoverSwap(spark, table)
    val t = spark.table(table)
    val lvl = rankSketchLevel(t)
    val folded = t.filter(col("kind") === "s" || col("kind") === "b")
      .unionByName(t.filter(col("kind") === "n")
        .agg(coalesce(sum(col("n")), lit(0L)).as("n"))
        .select(lit("n").as("kind"), lit(null).cast("double").as("value"),
          lit(null).cast("string").as("tie"), col("n")))
      .unionByName(spark.range(1)
        .select(lit("l").as("kind"), lit(null).cast("double").as("value"),
          lit(null).cast("string").as("tie"), lit(lvl.toLong).as("n")))
      .select(t.columns.map(col).toSeq: _*)
    Bucketing.swapInPlain(folded, table)
  }
}
