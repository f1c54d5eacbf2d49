package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, RepetitionStatsExpr, Text}

/**
 * Training-corpus composition operators: deterministic per-source sampling
 * (domain reweighting), token-budget shard packing, Gopher-style repetition
 * quality stats, and PII scrubbing. These sit beside the dedup/similarity
 * family as the remaining steps a 100 TB pretraining-data pipeline runs
 * between "raw documents" and "training shards".
 *
 * Scale posture, per operator:
 *  - sampling and scrubbing are map-only (codegen'd md5 / regex) — no
 *    shuffle, no state;
 *  - repetition stats are one native-kernel pass per row (map-only); the
 *    explode-based Column spelling exists as an executable spec;
 *  - shard packing needs a GLOBAL running sum, which is the textbook
 *    two-level distributed prefix sum here: per-range partial sums (one
 *    small aggregate), broadcast of the per-range offsets, then a window
 *    partitioned BY RANGE — never a single-partition global window, which
 *    is the naive spelling that serializes the whole corpus through one
 *    task at scale.
 */
object Corpus {

  // ------------------------------------------------------------- sampling

  /**
   * Deterministic per-source sampling — the domain-reweighting step of a
   * pretraining mix (e.g. "keep 100% of wiki, 10% of common-crawl").
   * Each row's fate is a pure function of (source, id): the portable 31-bit
   * md5 hash of `source:id` mapped to [0,1) and compared to that source's
   * rate. Re-running on any subset of the corpus, in any partitioning,
   * keeps exactly the same rows — the property that matters when the corpus
   * is re-sharded between runs. Map-only; the hash is codegen'd.
   */
  def sampleBySource(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0
  ): DataFrame = {
    val unit = Text.portableHash31(
      concat(col(sourceCol), lit(":"), col(idCol).cast("string"))) / lit(Hashing.P31.toDouble)
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (source, r)) => when(col(sourceCol) === source, lit(r)).otherwise(acc)
    }
    df.filter(unit < rate)
  }

  /**
   * Temperature-based mixture sampling (the multilingual α-sampling rule of
   * XLM-R, Conneau et al. 2020 §3.1, and mT5): source s is sampled with
   * probability ∝ n_s^α, flattening the head sources (α < 1) so low-resource
   * sources keep representation. Rates target `budgetDocs` expected kept
   * documents overall: rate_s = min(1, budgetDocs · w_s / (Z · n_s)) with
   * w_s = floor(n_s^α · 1e6) as INTEGER micro-weights and Z = Σ w_s — the
   * integer quantization makes Z an order-free exact sum, so the one double
   * division per source is bit-identical on any engine (α = 0.5 keeps even
   * the weights deterministic: IEEE sqrt is correctly rounded, where general
   * pow is ~1 ulp — the α to use when cross-engine checking matters).
   * Selection applies the rates through [[sampleBySource]]'s deterministic
   * (source, id) hash: one |sources|-row aggregate on the driver, then a
   * map-only filter — no corpus shuffle. Rows with a NULL source are
   * dropped (no source, no sampling weight — scrub or default the column
   * upstream if they should participate).
   */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      budgetDocs: Long,
      alpha: Double = 0.5
  ): DataFrame = {
    require(budgetDocs > 0 && alpha > 0, "budgetDocs and alpha must be positive")
    // NULL sources are dropped per the contract above — filter BEFORE the
    // aggregate so a null never becomes a Map key (sampleBySource sorts its
    // rate keys; a null String key would NPE there).
    val counts = df
      .filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val micro = counts.map { case (s, n) =>
      val w = if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
      s -> math.floor(w * 1e6).toLong
    }
    val z = micro.values.sum
    val rates = counts.map { case (s, n) =>
      // numerator in Double: budgetDocs * micro(s) as a Long multiply
      // silently overflows for large corpora (budget ~1e9 × micro ~1e11)
      s -> math.min(1.0, budgetDocs.toDouble * micro(s).toDouble / (z.toDouble * n))
    }
    sampleBySource(df, idCol, sourceCol, rates, defaultRate = 0.0)
  }

  /**
   * Sample each source DOWN TO a token budget — "mix to N tokens per
   * domain", the budgeted form of [[sampleBySource]]: per-source rate =
   * min(1, budget / total_tokens(source)), applied through the same
   * deterministic (source, id) hash. Sources without a budget pass through.
   *
   * The rates come from one small per-source aggregate broadcast back as a
   * join (never a window partitioned by source — that shuffles the whole
   * corpus and serializes each source through one task's sort at scale);
   * the sample itself stays map-side.
   */
  def sampleToBudget(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      tokenCol: String,
      budgets: Map[String, Long]
  ): DataFrame = {
    if (budgets.isEmpty) return df
    // The rate subtree re-evaluates this input once per downstream action;
    // cut the lineage so an expensive upstream (filters, dedup shuffles) is
    // computed exactly once (same discipline as Dedup's localCheckpoint
    // lineage cuts — the input here is a slim projection, not raw text).
    val input = df.localCheckpoint()
    val totals = input
      .filter(col(sourceCol).isin(budgets.keys.toSeq: _*))
      .groupBy(col(sourceCol).as("_src"))
      .agg(sum(col(tokenCol)).cast("long").as("_total"))
    val spark = df.sparkSession
    import spark.implicits._
    val budgetDf = budgets.toSeq.toDF("_src", "_budget")
    val rates = totals.join(budgetDf, "_src")
      .select(col("_src"), least(lit(1.0), col("_budget") / col("_total")).as("_rate"))
    val unit = Text.portableHash31(
      concat(col(sourceCol), lit(":"), col(idCol).cast("string"))) / lit(Hashing.P31.toDouble)
    input.join(broadcast(rates), input(sourceCol) === col("_src"), "left")
      .filter(col("_rate").isNull || unit < col("_rate"))
      .drop("_src", "_rate")
  }

  /**
   * Deterministic corpus shuffle: a reproducible pseudo-random training
   * order from the portable hash of (salt, id) — reshuffling between epochs
   * is `salt = epoch`. The order is a total one (hash, then id to break the
   * rare collision), computed the same on any cluster shape; the only
   * movement is the one range-partitioned sort any global ordering costs.
   */
  def shuffleOrder(df: DataFrame, idCol: String, salt: Long = 0L): DataFrame =
    df.orderBy(
      Text.portableHash31(concat(lit(salt.toString), lit(":"), col(idCol).cast("string"))).asc,
      col(idCol).asc)

  /**
   * Source upsampling — the "epochs per source" half of a training mix
   * (e.g. wiki ×3, books ×2, web ×1): each row is replicated its source's
   * epoch count with an `epoch` column (0-based) distinguishing the copies.
   * Map-side explode of a literal sequence; sources without an entry keep
   * one copy. Pair with [[shuffleOrder]]`(salt = epoch)` downstream so
   * copies of a document land apart in the training order.
   */
  def upsample(
      df: DataFrame,
      sourceCol: String,
      epochs: Map[String, Int],
      defaultEpochs: Int = 1
  ): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(_ >= 1), "epoch counts must be >= 1")
    val n = epochs.toSeq.sortBy(_._1).foldLeft(lit(defaultEpochs)) {
      case (acc, (source, k)) => when(col(sourceCol) === source, lit(k)).otherwise(acc)
    }
    df.withColumn("epoch", explode(sequence(lit(0), n - 1)))
  }

  /**
   * EXACTLY-n-per-stratum deterministic sampling — the reservoir-sample
   * shape of [[sampleBySource]] (that one keeps a RATE, this one keeps a
   * COUNT): within each stratum, keep the `n` rows with the smallest
   * portable hash of `stratum:id` — a uniform n-subset under the hash's
   * mixing, identical across reruns, partitionings, and engines. Rows with
   * a NULL stratum are dropped (no stratum, no quota).
   *
   * Scale shape: the rank runs on a slim (stratum, id, hash) projection in
   * two stages — a salted pre-rank over (stratum, hash mod 64) diffuses a
   * hot stratum across 64 reducers and keeps ≤ 64·n candidates per stratum
   * (any global top-n row is necessarily in its salt bucket's top-n), then
   * the final per-stratum rank sorts only those bounded candidate sets.
   * The full rows never move: survivors semi-join back on id, and the
   * keeper side is ≤ n·|strata| rows — broadcast-sized by construction.
   */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      n: Int,
      salts: Int = 64
  ): DataFrame = {
    require(n > 0 && salts > 0, "n and salts must be positive")
    val slim = df
      .filter(col(stratumCol).isNotNull)
      .select(
        col(stratumCol).as("__s"),
        col(idCol).as("__id"),
        Text.portableHash31(
          concat(col(stratumCol), lit(":"), col(idCol).cast("string"))).as("__h"))
    val pre = slim
      .withColumn("__r1", row_number().over(
        Window.partitionBy(col("__s"), pmod(col("__h"), lit(salts.toLong)))
          .orderBy(col("__h"), col("__id"))))
      .filter(col("__r1") <= n)
    val keep = pre
      .withColumn("__r2", row_number().over(
        Window.partitionBy(col("__s")).orderBy(col("__h"), col("__id"))))
      .filter(col("__r2") <= n)
      .select(col("__id").as(idCol))
    df.join(broadcast(keep), Seq(idCol), "left_semi")
  }

  /**
   * Generic top-k rows PER KEY by an arbitrary ordering — the "3 best
   * documents per domain / latest N events per device" shape, built so a
   * HOT KEY cannot serialize the job: a plain window partitioned by key
   * sorts every row of the biggest key in one task, which is the classic
   * 100 TB skew killer. Stage 1 ranks within (key, salt) — the hot key's
   * rows spread with their INPUT partitions and each (key, partition)
   * bucket keeps only k — and stage 2 ranks the ≤ partitions·k survivors
   * per key (the [[Similarity]] twoLevelTopK construction, exposed
   * generically). Any row in a key's global top-k is necessarily in its
   * bucket's top-k — true for ANY row-to-bucket assignment, so the
   * buckets don't even need to be content-deterministic; the RESULT is
   * deterministic as long as the caller's ordering is a total order
   * (pass a tiebreak like the id as the last ordering column, or equal
   * rows make rank arbitrary). Returns the surviving full rows with a
   * `rnk` column (1-based).
   */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      ordering: Seq[Column],
      k: Int
  ): DataFrame = {
    require(keyCols.nonEmpty && ordering.nonEmpty && k > 0,
      "need keys, an ordering, and k > 0")
    val pre = df
      .withColumn("__part", spark_partition_id())
      .withColumn("__r1", row_number().over(
        Window.partitionBy((keyCols.map(col) :+ col("__part")): _*).orderBy(ordering: _*)))
      .filter(col("__r1") <= k)
      .drop("__r1", "__part")
    pre
      .withColumn("rnk", row_number().over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)).cast("long"))
      .filter(col("rnk") <= k)
  }

  /**
   * Deterministic global shuffle INTO SHARDS: [[shuffleOrder]]'s
   * reproducible permutation plus an exact position, cut into `numShards`
   * near-equal contiguous shards — the layout a trainer's data loader
   * actually consumes (shard s = one contiguous file set, every rank reads
   * its own shards, no coordination). position = exact 0-based rank in
   * (hash, id) order; shard = floor(position · S / N) — the same exact
   * integer cut as [[rankBuckets]], never a sampled-boundary partitioner
   * that drifts between runs. Returns the slim (id, position, shard)
   * assignment; join it back or feed it to a partitioned writer.
   *
   * Scale shape: one range-partitioned total sort of a (hash, id)
   * projection + zipWithIndex (the offset-assignment machinery). The
   * documents themselves don't move until the caller writes shards.
   */
  def shuffleShards(
      df: DataFrame,
      idCol: String,
      numShards: Int,
      salt: Long = 0L
  ): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val spark = df.sparkSession
    val slim = df.select(
      col(idCol),
      Text.portableHash31(
        concat(lit(salt.toString), lit(":"), col(idCol).cast("string"))).as("__h"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      slim.schema.fields.head,
      org.apache.spark.sql.types.StructField(
        "position", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "shard", org.apache.spark.sql.types.LongType, nullable = false)))
    val n = slim.count()
    if (n == 0L) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val ranked = slim
      .orderBy(col("__h").asc, col(idCol).asc)
      .rdd.zipWithIndex()
      .map { case (row, pos) =>
        org.apache.spark.sql.Row(row.get(0), pos, pos * numShards / n)
      }
    spark.createDataFrame(ranked, schema)
  }

  // ------------------------------------------------------------- chunking

  /**
   * Split documents into sliding token windows — the step that turns raw
   * documents into context-window-sized training samples. Chunks are
   * `chunkTokens` whitespace tokens with `overlap` tokens shared between
   * consecutive chunks (stride = chunkTokens − overlap); the final chunk
   * takes whatever remains, and a document shorter than one chunk yields
   * itself. Output: (id, chunk_id, chunk, n_chunk_tokens), zero rows for
   * empty documents.
   *
   * Map-only: the window starts are a per-row `transform` over a sequence,
   * exploded — no shuffle, no state, and each output row carries only its
   * own slice of the text. The token array is LET-BOUND through a
   * single-element `transform` wrapper (the [[Text.wordShingles]] pattern):
   * referencing the `split` expression tree directly inside the per-chunk
   * lambda would re-tokenize the document once per chunk — O(chunks×tokens)
   * per doc in interpreted HOF eval; bound as a lambda variable it is
   * computed once.
   */
  def chunkDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlap: Int = 0
  ): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens, "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    val toksExpr = when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val chunks = flatten(transform(
      array(toksExpr),
      toks => {
        val n = size(toks)
        // ceil((n - chunk) / stride) + 1 window starts, at least one for any
        // non-empty doc — the final start covers the tail without losing tokens
        val nChunks = when(n === 0, lit(0L)).otherwise(
          greatest(lit(1L), ceil((n - chunkTokens) / lit(stride.toDouble)) + 1L))
        when(n === 0, array().cast("array<struct<chunk:string,n:int>>"))
          .otherwise(transform(
            sequence(lit(0L), nChunks - 1L),
            i => struct(
              concat_ws(" ", slice(toks, (i * stride + 1L).cast("int"), lit(chunkTokens))).as("chunk"),
              least(lit(chunkTokens), n - (i * stride).cast("int")).as("n"))))
      }))
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "c")))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        col("c.chunk").as("chunk"),
        col("c.n").cast("long").as("n_chunk_tokens"))
  }

  /**
   * SENTENCE-window chunking — the RAG/retrieval-corpus variant of
   * [[chunkDocs]]: text splits into sentences (a greedy
   * `[^.!?]+[.!?]*` scan, terminators kept with their sentence — no
   * lookbehind, so the same regex runs identically on Java regex and RE2),
   * then windows of `maxSentences` with `overlap` sentences shared between
   * consecutive chunks. Map-only; the tail window always lands, so every
   * sentence appears in at least one chunk.
   */
  def chunkSentences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxSentences: Int,
      overlap: Int = 0
  ): DataFrame = {
    require(maxSentences > 0, "maxSentences must be positive")
    require(overlap >= 0 && overlap < maxSentences, "overlap must be in [0, maxSentences)")
    val stride = maxSentences - overlap
    val sentsExpr = filter(
      transform(
        regexp_extract_all(coalesce(col(textCol), lit("")), lit("[^.!?]+[.!?]*"), lit(0)),
        s => trim(s)),
      s => length(s) > 0)
    val chunks = flatten(transform(
      array(sentsExpr),
      sents => {
        val n = size(sents)
        val nChunks = when(n === 0, lit(0L)).otherwise(
          greatest(lit(1L), ceil((n - maxSentences) / lit(stride.toDouble)) + 1L))
        when(n === 0, array().cast("array<struct<chunk:string,n:int>>"))
          .otherwise(transform(
            sequence(lit(0L), nChunks - 1L),
            i => struct(
              concat_ws(" ",
                slice(sents, (i * stride + 1L).cast("int"), lit(maxSentences))).as("chunk"),
              least(lit(maxSentences), n - (i * stride).cast("int")).as("n"))))
      }))
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "c")))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        col("c.chunk").as("chunk"),
        col("c.n").cast("long").as("n_sentences"))
  }

  // ------------------------------------------------- decontamination

  /**
   * Benchmark decontamination: drop every document sharing at least one
   * word `n`-gram with the probe corpus (eval/benchmark texts) — the
   * standard guard against test-set leakage into training data. The probe
   * side is small by nature (benchmarks, not corpora): its distinct
   * n-grams broadcast into a semi-join against the exploded document
   * n-grams, then contaminated ids anti-join back. At 100 TB the document
   * side streams through the broadcast probe table — no corpus shuffle;
   * the only exploded columns shipped are (id, gram) pairs that survive
   * the broadcast-hash probe.
   *
   * The broadcast is STATS-GATED, not unconditional (the discipline of
   * [[MergeStrategy]]'s `pruneProbeSide`): a caller handing a corpus-sized
   * "probe" set must get a plan downgrade, never a driver OOM. The gate
   * estimates the exploded-gram footprint from the probe text's optimized
   * plan stats (each word starts one n-gram, so the distinct grams are
   * ≤ n× the text bytes); over `broadcastMaxBytes` the semi-join falls
   * back to a gram-keyed shuffled-hash join — still id+gram shuffles only,
   * never document payloads.
   */
  def decontaminate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      probes: DataFrame,
      probeTextCol: String,
      n: Int = 8,
      broadcastMaxBytes: Long = 256L << 20
  ): DataFrame = {
    val probeGrams = probes
      .select(explode(Text.wordShingles(col(probeTextCol), n)).as("_g"))
      .filter(size(split(col("_g"), " ")) === n) // short probes yield no n-gram
      .distinct()
    val probeTextBytes =
      probes.select(col(probeTextCol)).queryExecution.optimizedPlan.stats.sizeInBytes
    val probeSide =
      if (probeTextBytes * n <= BigInt(broadcastMaxBytes)) broadcast(probeGrams)
      else probeGrams.hint("shuffle_hash")
    val contaminated = docs
      .select(col(idCol), explode(Text.wordShingles(col(textCol), n)).as("_g"))
      .join(probeSide, "_g")
      .select(col(idCol))
      .distinct()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }

  /**
   * GRADED contamination: instead of [[decontaminate]]'s boolean drop, the
   * fraction of each document's word n-grams (counted as positions, not
   * distinct grams) that appear in the benchmark probe set — the number a
   * pipeline thresholds or audits ("89% of this doc is benchmark text" vs
   * "one stray 8-gram"). Same probe-side stats gate and same scale shape:
   * the corpus streams through the broadcast probe table; only (id, gram)
   * pairs that HIT ship to the count, and documents never shuffle.
   */
  def contaminationScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      probes: DataFrame,
      probeTextCol: String,
      n: Int = 8,
      broadcastMaxBytes: Long = 256L << 20
  ): DataFrame = {
    val probeGrams = probes
      .select(explode(Text.wordShingles(col(probeTextCol), n)).as("_g"))
      .filter(size(split(col("_g"), " ")) === n)
      .distinct()
    val probeTextBytes =
      probes.select(col(probeTextCol)).queryExecution.optimizedPlan.stats.sizeInBytes
    val probeSide =
      if (probeTextBytes * n <= BigInt(broadcastMaxBytes)) broadcast(probeGrams)
      else probeGrams.hint("shuffle_hash")
    val grams = docs
      .select(col(idCol), explode(Text.wordShingles(col(textCol), n)).as("_g"))
      .filter(size(split(col("_g"), " ")) === n) // short docs have no n-gram
    val hits = grams
      .join(probeSide, "_g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("contaminated_grams"))
    // per-doc gram totals are pure arithmetic on the token count — computed
    // map-side, so the only (id, gram) rows that ever shuffle are the HITS
    // surviving the probe join, not the corpus-sized gram stream
    docs
      .select(
        col(idCol),
        greatest(lit(0L),
          (size(Text.tokens(col(textCol))) - (n - 1)).cast("long")).as("n_grams"))
      .filter(col("n_grams") > 0)
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_grams"),
        coalesce(col("contaminated_grams"), lit(0L)).as("contaminated_grams"),
        (coalesce(col("contaminated_grams"), lit(0L)).cast("double") / col("n_grams"))
          .as("contamination"))
  }

  // ------------------------------------------------------------- packing

  /**
   * Token-budget shard packing: assign each document (in `idCol` order) to
   * a training shard such that each shard holds ~`budget` tokens —
   * `shard = exclusive-prefix-sum(tokens) div budget`. Documents never
   * split; a shard overshoots by at most one document.
   *
   * The prefix sum is two-level: ids are cut into `numBuckets` ranges,
   * per-range token sums are aggregated (a `numBuckets`-row result), their
   * exclusive running totals are broadcast-joined back, and the within-range
   * window runs partitioned by range — each range's window is an independent
   * task, so the only serial state is the numBuckets-row offset table.
   * DuckDB's oracle spelling is the plain global window; results agree
   * because addition is associative.
   */
  def packShards(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      numBuckets: Int = 256
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    // Three passes follow (id bounds, per-range sums, the packed output);
    // cut the lineage so each pass scans the materialized slim input, not a
    // re-execution of whatever pipeline produced it.
    val input = df.localCheckpoint()
    withGlobalPrefix(input, idCol, tokenCol, numBuckets) match {
      case None => input.withColumn("shard", lit(0L))
      case Some(p) =>
        p.withColumn("shard", expr(s"_prefix div ${budget}")).drop("_prefix")
    }
  }

  /** Exclusive global running sum of `weightCol` in ascending `idCol`
    * order — the two-level distributed prefix sum shared by
    * [[packShards]]/[[packSequences]]: per-range partial sums (one small
    * aggregate, numBuckets rows to the driver), the running offsets
    * broadcast back, then a window partitioned BY RANGE — never a
    * single-partition global window. Adds `_prefix`; callers pass a slim,
    * localCheckpointed input. None when the input is empty. */
  private def withGlobalPrefix(
      input: DataFrame,
      idCol: String,
      weightCol: String,
      numBuckets: Int
  ): Option[DataFrame] = {
    val bounds = input.agg(
      min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).head()
    if (bounds.isNullAt(0)) return None
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo) / numBuckets + 1)
    val bucket = ((col(idCol).cast("long") - lo) / width).cast("long")

    val withBucket = input.withColumn("_pack_bucket", bucket)
    // small aggregate: one row per populated range
    val perBucket = withBucket
      .groupBy(col("_pack_bucket"))
      .agg(sum(col(weightCol)).cast("long").as("_bucket_tokens"))
      .orderBy(col("_pack_bucket"))
      .collect()
    // exclusive running offset per range (numBuckets entries, driver-side)
    var acc = 0L
    val offsets = perBucket.map { r =>
      val o = (r.getLong(0), acc)
      acc += r.getLong(1)
      o
    }
    val spark = input.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("_pack_bucket", "_bucket_offset")

    val win = Window
      .partitionBy(col("_pack_bucket"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    Some(withBucket
      .join(broadcast(offsetDf), "_pack_bucket")
      .withColumn("_prefix",
        col("_bucket_offset") + coalesce(sum(col(weightCol)).over(win), lit(0L)))
      .drop("_pack_bucket", "_bucket_offset"))
  }

  /**
   * GPT-style sequence packing: concatenate every document's tokens in
   * ascending `idCol` order into one global stream and cut it into
   * fixed-`seqLen` training sequences — documents cross sequence boundaries
   * (the canonical pretraining input pipeline; boundary/EOS handling is the
   * loader's attention-mask concern). Returns (seq_id, n_tokens,
   * token_ids): every sequence carries exactly seqLen tokens except the
   * final remainder.
   *
   * Scale shape: the global token offset is the same two-level prefix sum
   * as [[packShards]]; each document then SLICES its own token array into
   * the at most ceil(n/seqLen)+1 sequences it overlaps — no token-level
   * explode — and one hash shuffle on seq_id reassembles the pieces with an
   * array_sort by global position. Shuffled rows = O(docs +
   * totalTokens/seqLen), each carrying only its slice.
   */
  def packSequences(
      df: DataFrame,
      idCol: String,
      idsCol: String,
      seqLen: Int,
      numBuckets: Int = 256
  ): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val input = df
      .select(col(idCol), col(idsCol).as("_ps_ids"), size(col(idsCol)).cast("long").as("_ps_n"))
      .localCheckpoint()
    withGlobalPrefix(input, idCol, "_ps_n", numBuckets) match {
      case None =>
        input.select(
          lit(0L).as("seq_id"), lit(0L).as("n_tokens"), col("_ps_ids").as("token_ids"),
          array().cast("array<bigint>").as("doc_starts"))
          .limit(0)
      case Some(p) =>
        val L = seqLen.toLong
        val pieces = p
          .filter(col("_ps_n") > 0)
          .select(
            col("_prefix"), col("_ps_ids"), col("_ps_n"),
            explode(sequence(
              expr(s"_prefix div $L"),
              expr(s"(_prefix + _ps_n - 1) div $L"))).as("seq_id"))
          .withColumn("_from", greatest(lit(0L), col("seq_id") * L - col("_prefix")))
          .withColumn("_until", least(col("_ps_n"), (col("seq_id") + 1) * L - col("_prefix")))
          .select(
            col("seq_id"),
            col("_from"),
            (col("_prefix") + col("_from")).as("_gpos"),
            expr("slice(_ps_ids, cast(_from + 1 as int), cast(_until - _from as int))").as("_piece"))
        // doc_starts: within-sequence offsets where a NEW document begins
        // (_from == 0 means this piece is its document's head) — the
        // boundary positions a trainer's attention-mask reset consumes.
        // A sequence that only CONTINUES a long document has none.
        pieces
          .groupBy(col("seq_id"))
          .agg(
            flatten(transform(
              array_sort(collect_list(struct(col("_gpos"), col("_piece")))),
              x => x.getField("_piece"))).as("token_ids"),
            sort_array(collect_list(
              when(col("_from") === 0L, col("_gpos") - col("seq_id") * L))).as("doc_starts"))
          .withColumn("n_tokens", size(col("token_ids")).cast("long"))
          .select(col("seq_id"), col("n_tokens"), col("token_ids"), col("doc_starts"))
    }
  }

  // ----------------------------------------------------------- repetition

  /** Native one-pass repetition stats: struct<top2:double, dup3:double> —
    * see [[graft.functions.RepetitionStatsExpr]]. */
  def repetitionStats(text: Column): Column = RepetitionStatsExpr.stats(text)

  /**
   * Explode-based Column spelling of [[repetitionStats]] — the executable
   * spec the kernel is bit-equality-tested against (CorpusSpec), shaped
   * exactly like the DuckDB oracle: n-grams → grouped counts → top-1 /
   * duplicated-coverage per document. Shuffles on (id, gram); correct at
   * any scale but one pass of the native kernel beats three shuffles, so
   * library callers get the kernel.
   */
  private[graft] def repetitionStatsExploded(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Text.tokens(col(textCol))
    val denom = length(concat_ws(" ", toks))
    val base = df.select(
      col(idCol), toks.as("_toks"), denom.cast("long").as("_denom"))

    def grams(n: Int) = base.select(
      col(idCol), col("_denom"),
      explode(Text.wordShingles(concat_ws(" ", col("_toks")), n)).as("_g"),
      size(col("_toks")).as("_n"))
      .filter(col("_n") >= n)

    val top2 = grams(2)
      .groupBy(col(idCol), col("_denom"), col("_g")).count()
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("count").desc, col("_g").asc)))
      .filter(col("_rk") === 1)
      .select(col(idCol),
        (col("count") * length(col("_g")) / col("_denom")).as("top2"))

    val dup3 = grams(3)
      .groupBy(col(idCol), col("_denom"), col("_g")).count()
      .filter(col("count") >= 2)
      .groupBy(col(idCol), col("_denom"))
      .agg(sum(col("count") * length(col("_g"))).as("_covered"))
      .select(col(idCol), (col("_covered") / col("_denom")).as("dup3"))

    df.select(col(idCol))
      .join(top2, Seq(idCol), "left")
      .join(dup3, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("top2"), lit(0.0)).as("top2"),
        coalesce(col("dup3"), lit(0.0)).as("dup3"))
  }

  // ------------------------------------------------------------ scrubbing

  /** Conservative cross-engine regexes (Java and RE2 agree on these). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /**
   * PII scrubbing: mask emails, then phone-number-shaped digit runs, then
   * IPv4 addresses with typed placeholders. Order matters (an email's
   * domain must not be re-matched as a host, a masked phone must not leave
   * digit fragments), and both engines apply the same order. Map-only,
   * codegen'd `regexp_replace` — the 100 TB shape is "three regex passes
   * over each partition", nothing more.
   */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  // -------------------------------------------------------------- splitting

  /**
   * Deterministic train/validation/test splitting — the final assignment
   * step before shards are written: each row lands in exactly one named
   * split with probability proportional to its weight, decided purely by
   * the portable (salt, id) hash mapped to [0, 1) against the cumulative
   * weight boundaries. Re-running on any subset, any partitioning, or any
   * engine reproduces the same assignment (same property as
   * [[sampleBySource]]); changing `salt` draws a fresh split. Map-only —
   * adds one codegen'd md5 and a nested CASE per row.
   */
  def splitCorpus(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: Long = 0L,
      splitCol: String = "split"
  ): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "splits must have positive weights")
    require(splits.map(_._1).distinct.length == splits.length, "split names must be unique")
    val total = splits.map(_._2).sum
    val unit = Text.portableHash31(
      concat(lit(s"split:$salt:"), col(idCol).cast("string"))) / lit(Hashing.P31.toDouble)
    // cumulative upper boundaries; the last split takes the remainder so
    // floating error can never leave a row unassigned
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val assigned = splits.init.zip(bounds.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), els) => when(unit < hi, lit(name)).otherwise(els)
    }
    df.withColumn(splitCol, assigned)
  }

  // --------------------------------------------------------- n-gram counts

  /**
   * Corpus-wide top-K word n-grams by document frequency or raw count — the
   * counting step a tokenizer trainer (BPE merge selection ranks adjacent
   * pair counts; n = 2) and a corpus profiler both run. Shuffle carries
   * (gram, partial count) after map-side combine; the final top-K is
   * Spark's distributed TakeOrdered (each partition offers its K best) —
   * no global sort materializes. Ties break on the gram string so the
   * result is deterministic and oracle-checkable.
   */
  def topNgrams(
      docs: DataFrame,
      textCol: String,
      n: Int,
      k: Int,
      perDocument: Boolean = false
  ): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be positive")
    val grams = docs.select(explode(Text.wordShingles(col(textCol), n)).as("gram"))
    val base =
      if (perDocument)
        docs.select(explode(array_distinct(Text.wordShingles(col(textCol), n))).as("gram"))
      else grams
    base.groupBy(col("gram"))
      .agg(count(lit(1)).as("gram_count"))
      .orderBy(col("gram_count").desc, col("gram"))
      .limit(k)
  }

  /**
   * Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
   * Chen & Goodman 1999's interpolated form) — the classical smoothed
   * n-gram LM estimate, on the exact 1e-6 integer grid so any engine
   * reproduces it bit-for-bit:
   *
   *   P(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
   *            + [D·N1+(w1·)/c(w1·)] · [N1+(·w2)/N1+(··)]
   *
   * with every division integer `DIV` on micro-scaled numerators and the
   * discount `D` given in micro units (750000 = the standard 0.75).
   * Tokens are the whitespace tokenization every corpus operator shares.
   *
   * Scale shape: ONE corpus-sized shuffle (the (w1,w2) bigram count);
   * everything else — continuation counts, left totals, the distinct-
   * type total — derives from the bigram-TYPE table, which is
   * vocabulary²-bounded and in practice far smaller than the corpus. The
   * type total joins in as a broadcast single row, never a driver value.
   */
  def kneserNeyBigrams(
      docs: DataFrame,
      textCol: String,
      discountMicro: Long = 750000L
  ): DataFrame = {
    require(discountMicro >= 0L && discountMicro <= 1000000L,
      "discountMicro must be within [0, 1e6] (D in [0, 1])")
    val c12 = docs
      .select(explode(Text.wordShingles(col(textCol), 2)).as("g"))
      .select(split(col("g"), " ").as("p"))
      .filter(size(col("p")) === 2) // sub-bigram docs emit a 1-token gram
      .select(col("p").getItem(0).as("w1"), col("p").getItem(1).as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint() // feeds four derivations; count it once
    val left = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1f"))
    val cont = c12.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val total = c12.agg(count(lit(1)).as("tot"))
    c12.join(left, Seq("w1")).join(cont, Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("__d", lit(discountMicro))
      .select(col("w1"), col("w2"), col("c12"),
        (expr("greatest(c12 * 1000000L - __d, 0L) DIV c1") +
          expr("((__d * n1f) DIV c1) * ((n1b * 1000000L) DIV tot) DIV 1000000L"))
          .as("p_micro"))
  }

  /**
   * URL canonicalization — the key-normalization step of URL-level crawl
   * dedup (the cheapest dedup tier: dedup on canonical URL BEFORE any
   * content hash touches the bytes): lowercase scheme+host (path case is
   * semantic and kept), drop `www.`, drop default ports (:80 http /
   * :443 https), strip fragments and tracking params (`utm_*`, `fbclid`,
   * `gclid`), collapse the dangling `?`/`&` separators that removal
   * leaves. Pure regex pipeline without lookarounds — map-only,
   * reproducible in any regex engine. Non-absolute URLs (no `scheme://`)
   * canonicalize to the empty string; filter or pass them through
   * upstream.
   */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(coalesce(url, lit("")), "#.*$", "")
    val hostLower = concat(
      lower(regexp_extract(noFrag, "^([^:/?#]+://[^/?#]*)", 1)),
      regexp_extract(noFrag, "^[^:/?#]+://[^/?#]*(.*)$", 1))
    val noWww = regexp_replace(hostLower, "://www\\.", "://")
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(http://[^/:?#]+):80([/?#]|$)", "$1$2"),
      "^(https://[^/:?#]+):443([/?#]|$)", "$1$2")
    // anchor tracking params to their ?/& separator (an unanchored match
    // would eat substrings of longer names, e.g. `myfbclid`), keep the
    // separator, then collapse the separator runs the removal leaves
    val noTrack = regexp_replace(noPort, "([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*", "$1")
    regexp_replace(regexp_replace(noTrack, "([?&])&+", "$1"), "[?&]+$", "")
  }

  /** URL-level dedup: keep the lowest-id row per canonical URL. The
    * groupBy shuffles (canonical, id) pairs only; survivors semi-join
    * back, so full rows never move. */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val keep = df
      .select(canonicalizeUrl(col(urlCol)).as("__cu"), col(idCol))
      .groupBy(col("__cu"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ------------------------------------------------------------ BM25 search

  /**
   * BM25 keyword retrieval over the corpus (Robertson & Zaragoza 2009; the
   * Lucene `k1/b` formulation with the always-positive `ln(1 + (N-df+0.5)/
   * (df+0.5))` idf): score every document against a bag of query terms,
   * return the top-K. The retrieval primitive behind "find training docs
   * about X" curation queries and contamination triage.
   *
   * Exactness: idf is floored onto the 1e-6 integer grid per term (computed
   * from one |terms|-column aggregate), and each per-term summand —
   * idf_micro · tf·(k1+1) / (tf + k1·(1−b+b·dl·N/Σdl)) — is floored onto
   * the same grid BEFORE the cross-term sum, so the final score is an
   * order-free integer sum of longs that any engine reproduces bit-exactly.
   *
   * Scale shape: one pass computes (N, Σdl, df_t...) as a single aggregate
   * row; scoring is then MAP-ONLY over the token arrays (per-term `filter`
   * counts — a scan, not an inverted index: right for one-off curation
   * queries over parquet; a standing search service would materialize the
   * posting lists instead). Top-K is Spark's distributed TakeOrdered.
   */
  def bm25Search(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      topK: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(terms.nonEmpty && topK > 0, "need query terms and topK > 0")
    val qs = terms.map(_.toLowerCase).distinct.sorted
    val toks = docs.select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
    val statAggs =
      Seq(count(lit(1)).as("__n"), sum(size(col("toks"))).cast("long").as("__total")) ++
        qs.map(t => sum(when(array_contains(col("toks"), t), 1L).otherwise(0L)))
    val stat = toks.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    val n = stat.getLong(0)
    val total = stat.getLong(1)
    require(n > 0 && total > 0, "corpus is empty")
    val idfMicro = qs.zipWithIndex.map { case (t, i) =>
      val dfT = stat.getLong(2 + i).toDouble
      t -> math.floor(math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5)) * 1e6).toLong
    }.toMap
    // Both the token array and each term's tf are LET-BOUND through
    // single-element `transform` wrappers (the chunkDocs pattern): the
    // document is tokenized ONCE per row and each tf array scan runs once
    // even though tf appears in numerator and denominator — referencing
    // the raw expression trees instead would re-evaluate them per use in
    // interpreted HOF eval.
    val score = transform(
      array(Text.tokens(col(textCol))),
      ts => {
        val dlTerm = lit(b) * size(ts).cast("double") * lit(n.toDouble) / lit(total.toDouble)
        qs.map { t =>
          transform(
            array(size(filter(ts, x => x === lit(t))).cast("double")),
            tf =>
              floor(lit(idfMicro(t).toDouble) * tf * lit(k1 + 1.0) /
                (tf + lit(k1) * (lit(1.0 - b) + dlTerm))).cast("long")
          ).getItem(0)
        }.reduce(_ + _)
      }
    ).getItem(0)
    docs
      .select(col(idCol).as("id"), score.as("score_micro"))
      .filter(col("score_micro") > 0L)
      .orderBy(col("score_micro").desc, col("id"))
      .limit(topK)
  }

  /**
   * Materialize the standing-search layout for [[bm25Search]]: a posting
   * table (term, id, tf) bucketed AND sorted by term, plus a stats table
   * (one row: N, total token count). Query scans carry a pushed
   * `term IN (...)` filter, and the term-sorted parquet layout turns it
   * into row-group/page pruning — the index reads postings of the QUERY
   * terms instead of re-tokenizing the corpus per query (what the
   * scan-path [[bm25Search]] does; right for one-off curation queries,
   * wrong for a query workload). The bucket spec additionally gives any
   * posting-to-posting join (phrase/AND intersection on id would bucket
   * by id instead) its shuffle-free layout lever.
   */
  def materializeBm25Index(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      table: String,
      numBuckets: Int = 64
  ): Unit = {
    val toks = docs.select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
    Bucketing.materializeBucketed(
      postingRows(toks), table, "term", numBuckets, sortCols = Seq("term"))
    rewriteBm25Stats(docs.sparkSession, table)
  }

  /** Posting rows for a (id, toks) frame. Zero-token docs get a sentinel
    * row (term = "", dl = 0, tf = 0): real tokens are never empty, query
    * scans filter `term IN (query terms)` so sentinels prune away, and
    * the row makes the posting table a COMPLETE record of ingested ids —
    * so stats can be derived from it and re-ingested empty docs anti-join
    * away like any other id. */
  private def postingRows(toks: DataFrame): DataFrame = {
    val real = toks
      .select(col("id"), size(col("toks")).cast("long").as("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val empty = toks
      .filter(coalesce(size(col("toks")), lit(0)) <= 0)
      .select(lit("").as("term"), col("id"), lit(0L).as("dl"), lit(0L).as("tf"))
    real.unionByName(empty)
  }

  /** Stats derived FROM the posting table (count of ids + sum of one dl
    * per id — a column-pruned, index-sized aggregate of ids and longs):
    * build and append share this, so a crash between a posting insert and
    * the stats rewrite leaves stats stale only until the next append
    * re-derives them from postings that already contain the orphaned
    * batch. An accumulated `prev + batch` design would lose that batch's
    * counts forever (the re-run anti-joins its ids away). */
  private def rewriteBm25Stats(spark: SparkSession, table: String): Unit = {
    val perDoc = spark.table(table).groupBy(col("id")).agg(max(col("dl")).as("dl"))
    Bucketing.materializePlain(
      perDoc.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).cast("long").as("total_tokens")),
      s"${table}_stats")
  }

  /** Append new documents into a [[materializeBm25Index]] posting table in
    * place — the search-index member of the O(batch) maintenance trio
    * (MinHash bands, LSH/IVF/PQ cells, now postings): new docs tokenize
    * map-only, their (term, id, dl, tf) rows insert through the bucket
    * spec, and the stats table advances by the batch's counts. Idempotent
    * on re-ingested ids (anti-join against the posting table's id set —
    * a column-pruned scan of the id column, no shuffle of the index).
    * BM25 scores naturally drift from exactness as N/avgdl move; that is
    * inherent to incremental BM25 (Lucene behaves the same between
    * merges) — but because [[bm25SearchFromIndex]] reads BOTH stats and
    * postings at query time, scores over the appended index are exactly
    * the scan-path scores over the grown corpus. */
  def appendToBm25Index(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      table: String
  ): Unit = {
    val spark = docs.sparkSession
    val known = spark.table(table).select(col("id")).distinct()
    val toks = docs
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .join(known, Seq("id"), "left_anti")
    postingRows(toks)
      .select(spark.table(table).columns.map(col).toSeq: _*)
      .write.insertInto(table)
    rewriteBm25Stats(spark, table)
  }

  /** BM25 top-k against a [[materializeBm25Index]] table: per-term df from
    * the pruned posting scan, the same 1e-6-grid idf/summand arithmetic as
    * [[bm25Search]] — the two paths return IDENTICAL rows (spec-pinned;
    * the entry shares the scan path's oracle). Scale shape: every scan in
    * the plan carries `term IN (query terms)`; candidate rows = postings
    * of the query terms only; the final sum groups (id, score) pairs. */
  def bm25SearchFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      terms: Seq[String],
      topK: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(terms.nonEmpty && topK > 0, "need query terms and topK > 0")
    val qs = terms.map(_.toLowerCase).distinct.sorted
    val stat = spark.table(s"${table}_stats").collect()(0)
    val n = stat.getLong(0)
    val total = stat.getLong(1)
    require(n > 0 && total > 0, "index is empty")
    val postings = spark.table(table)
      .filter(col("term").isin(qs.map(_.asInstanceOf[Any]): _*))
    val dfs = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("__df")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val idfMicro = qs.map { t =>
      val dfT = dfs.getOrElse(t, 0L).toDouble
      t -> math.floor(math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5)) * 1e6).toLong
    }.toMap
    val idfArr = qs.map(t => t -> idfMicro(t))
    val idfCol = idfArr.tail.foldLeft(
      when(col("term") === idfArr.head._1, lit(idfArr.head._2.toDouble))) {
      case (acc, (t, v)) => acc.when(col("term") === t, lit(v.toDouble))
    }.otherwise(lit(0.0))
    val tf = col("tf").cast("double")
    val summand = floor(
      idfCol * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl").cast("double") * lit(n.toDouble) / lit(total.toDouble)))
    ).cast("long")
    postings
      .select(col("id"), summand.as("__s"))
      .groupBy(col("id"))
      .agg(sum(col("__s")).as("score_micro"))
      .filter(col("score_micro") > 0L)
      .orderBy(col("score_micro").desc, col("id"))
      .limit(topK)
  }

  // ---------------------------------------------------------- phrase search

  /**
   * Positional posting index for phrase queries: `(term, id, pos)` rows,
   * bucketed AND sorted by term like the BM25 index — a query's
   * `term IN (...)` filter prunes to the phrase's own posting lists. The
   * positional sibling of [[materializeBm25Index]] (whose tf postings
   * cannot answer adjacency).
   */
  def materializePhraseIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      table: String,
      numBuckets: Int = 64
  ): Unit =
    Bucketing.materializeBucketed(
      positionalRows(docs, idCol, textCol), table, "term", numBuckets,
      sortCols = Seq("term"))

  private def positionalRows(docs: DataFrame, idCol: String, textCol: String) =
    docs
      .select(col(idCol).as("id"),
        posexplode(Text.tokens(col(textCol))).as(Seq("pos", "term")))
      .select(col("term"), col("id"), col("pos").cast("long").as("pos"))

  /** Append new documents into a [[materializePhraseIndex]] table in
    * place: tokenize map-only, insert through the bucket spec. Idempotent
    * on re-ingested ids (anti-join against the index's id column — a
    * column-pruned scan, no shuffle of the index). */
  def appendToPhraseIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      table: String
  ): Unit = {
    val spark = docs.sparkSession
    val known = spark.table(table).select(col("id")).distinct()
    positionalRows(docs, idCol, textCol)
      .join(known, Seq("id"), "left_anti")
      .select(spark.table(table).columns.map(col).toSeq: _*)
      .write.insertInto(table)
  }

  /**
   * Exact phrase search against a [[materializePhraseIndex]] table: docs
   * containing the words of `phrase` CONSECUTIVELY, ranked by occurrence
   * count (ties by id). Each phrase term contributes one term-pruned
   * posting scan; term i's positions shift by −i so a phrase occurrence
   * is a (id, start) key shared by ALL terms — the match is a chain of
   * hash equi-joins over posting-list-sized inputs, never a scan of the
   * corpus text. Repeated words in the phrase work (the join is against
   * the same pruned relation at a different shift).
   */
  def phraseSearch(
      spark: SparkSession,
      table: String,
      phrase: Seq[String],
      topK: Int = 10
  ): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two terms")
    require(topK > 0, "topK must be positive")
    val qs = phrase.map(_.toLowerCase)
    def shifted(t: String, i: Int) = spark.table(table)
      .filter(col("term") === t)
      .select(col("id"), (col("pos") - i).as("start"))
    qs.zipWithIndex
      .map { case (t, i) => shifted(t, i) }
      .reduce((a, b) => a.join(b, Seq("id", "start")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col("n_matches").desc, col("id"))
      .limit(topK)
  }

  /**
   * TF-IDF keyword extraction: the top-`topK` most characteristic terms
   * of every document — the per-doc tagging pass behind corpus browsing,
   * domain labeling, and cluster naming. Score = tf · floor(ln(N/df)·1e6)
   * (integer micro-nats; terms present in every doc score 0 and drop),
   * ties broken by term string so each doc's keyword list is total-ordered.
   *
   * Exactness: idf floors onto the 1e-6 ln grid and tf·idf_micro is a
   * BIGINT product (< 2^53), so scores and ranks replicate bit-for-bit.
   *
   * Scale shape: tokenize map-only → one (id, term) groupBy for tf → one
   * term-keyed aggregate for df → a term-keyed join (vocab-sized build
   * side) → the skew-proof two-level [[topKPerKey]]. Nothing document-
   * sized crosses the wire twice, and no per-doc state exceeds topK.
   */
  def tfidfKeywords(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int
  ): DataFrame = {
    require(topK > 0, "topK must be positive")
    val n = docs.count() // one scalar: corpus size for the idf numerator
    val posting = docs
      .select(col(idCol).as("id"), explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = posting.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val scored = posting
      .join(dfT, Seq("term"))
      .withColumn("idf_micro",
        floor(log(lit(n.toDouble) / col("__df").cast("double")) * lit(1000000.0))
          .cast("long"))
      .withColumn("score_micro", col("tf") * col("idf_micro"))
      .filter(col("score_micro") > 0L)
    topKPerKey(scored, Seq("id"), Seq(col("score_micro").desc, col("term").asc), topK)
      .select(col("id").as(idCol), col("rnk"), col("term"), col("score_micro"))
  }

  /**
   * PMI co-occurrence pairs (Church & Hanks 1990): the top-`topK`
   * most-associated term pairs over document-level presence — the corpus
   * statistic behind collocation discovery, taxonomy seeding, and "what
   * co-travels with X" curation triage. PMI = ln(n·c_ab ∕ (c_a·c_b)) over
   * counts restricted to the `vocab` most-frequent terms (ties by term
   * string, so the vocabulary is deterministic); pairs with fewer than
   * `minCount` co-occurrences drop (sparse-count PMI is noise — the
   * standard cut).
   *
   * Exactness: counts are exact integers, c_a·c_b and n·c_ab are BIGINT
   * products (< 2^53), PMI floors onto the 1e-6 ln grid, and the top-K cut
   * is totally ordered by (pmi, t1, t2) — bit-reproducible anywhere.
   *
   * Scale shape: presence is one distinct over (id, term); the vocabulary
   * is a V-row TakeOrdered broadcast back over presence; candidate pairs
   * come from a doc-keyed self-join whose volume is Σ_d m_d² with m_d ≤ V
   * (never corpus² — the vocab restriction IS the cap), then one
   * map-side-combinable pair count and a distributed TakeOrdered.
   */
  def pmiCooccurrence(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Int = 100,
      minCount: Long = 5L,
      topK: Int = 50
  ): DataFrame = {
    require(vocab > 1 && topK > 0 && minCount >= 1, "need vocab > 1, topK > 0, minCount >= 1")
    val n = docs.count() // one scalar: corpus size for the PMI numerator
    val presence = docs
      .select(col(idCol).as("id"), explode(Text.tokens(col(textCol))).as("term"))
      .distinct()
    val voc = presence
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term").asc)
      .limit(vocab)
    val restricted = presence.join(broadcast(voc), Seq("term"))
    val a = restricted.select(col("id"), col("term").as("t1"), col("c").as("__c1"))
    val b = restricted.select(col("id"), col("term").as("t2"), col("c").as("__c2"))
    a.join(b, a("id") === b("id") && col("t1") < col("t2"))
      .groupBy(col("t1"), col("t2"), col("__c1"), col("__c2"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
      .withColumn("pmi_micro",
        floor(log((lit(n) * col("n_ab")).cast("double") /
          (col("__c1") * col("__c2")).cast("double")) * lit(1000000.0)).cast("long"))
      .orderBy(col("pmi_micro").desc, col("t1"), col("t2"))
      .limit(topK)
      .select(col("t1"), col("t2"), col("n_ab"), col("pmi_micro"))
  }

  // ------------------------------------------------------------ drift

  /**
   * Token-distribution drift between two corpora (today's crawl vs
   * yesterday's, one source vs the mix) — the monitoring stat a pipeline
   * alerts on before a shifted batch poisons the training mix. Computes
   * symmetric KL components over add-one-smoothed unigram distributions
   * restricted to the top-`vocab` tokens of the COMBINED corpus (ties by
   * token string, so the vocabulary is deterministic; out-of-vocab mass
   * is ignored, as drift monitors conventionally do).
   *
   * Exactness: per-token ln(p) is floored onto the 1e-6 grid, each
   * token's KL contribution is floored to an integer micro-nat via
   * floor((c+1)·(lnp−lnq)/(n+V)), and the corpus KL is the order-free
   * integer SUM of those — bit-equal on any engine, which is what lets a
   * drift THRESHOLD be a reproducible gate instead of a vibe.
   *
   * Scale shape: two token-count aggregates (map-side combined), one
   * TakeOrdered vocabulary, one V-row join; nothing corpus-sized moves.
   * Returns one row: (n_a, n_b, kl_ab, kl_ba) with KL in nats.
   */
  def tokenDrift(
      docsA: DataFrame,
      docsB: DataFrame,
      textCol: String,
      vocab: Int = 500
  ): DataFrame = {
    require(vocab > 0, "vocab must be positive")
    val spark = docsA.sparkSession
    def counts(df: DataFrame): DataFrame = df
      .select(explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))
    val ca = counts(docsA).localCheckpoint()
    val cb = counts(docsB).localCheckpoint()
    val top = ca.select(col("tok"), col("c"))
      .unionByName(cb)
      .groupBy(col("tok"))
      .agg(sum(col("c")).as("ct"))
      .orderBy(col("ct").desc, col("tok"))
      .limit(vocab)
      .select(col("tok"))
    val joined = top
      .join(ca.withColumnRenamed("c", "ca"), Seq("tok"), "left")
      .join(cb.withColumnRenamed("c", "cb"), Seq("tok"), "left")
      .select(col("tok"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .localCheckpoint()
    val v = joined.count() // may be < vocab on tiny corpora
    val Seq(na, nb) = Seq("ca", "cb").map(c =>
      joined.agg(sum(col(c))).collect()(0).getLong(0))
    def lnMicro(c: Column, n: Long): Column =
      floor(log((c + 1L).cast("double") / lit((n + v).toDouble)) * 1e6).cast("long")
    val lnA = lnMicro(col("ca"), na)
    val lnB = lnMicro(col("cb"), nb)
    def term(c: Column, lnP: Column, lnQ: Column, n: Long): Column =
      floor((c + 1L).cast("double") * (lnP - lnQ).cast("double") / lit((n + v).toDouble))
        .cast("long")
    val row = joined.agg(
      sum(term(col("ca"), lnA, lnB, na)).as("ab"),
      sum(term(col("cb"), lnB, lnA, nb)).as("ba")).collect()(0)
    import spark.implicits._
    Seq((na, nb, row.getLong(0) / 1e6, row.getLong(1) / 1e6))
      .toDF("n_a", "n_b", "kl_ab", "kl_ba")
  }

  // ------------------------------------------------------------ URL filter

  /**
   * Domain filtering — the URL-level curation stage (block spam/adult/SEO
   * domains, keep the rest): extract the host from a URL column and drop
   * rows whose host OR any parent domain is blocklisted (`ads.example.com`
   * is blocked by `example.com`). Each host explodes into its dot-suffixes
   * (~2-5 labels), which EQUI-join the broadcast blocklist — never a
   * nested-loop scan of the list per row — and the matching ids anti-join
   * back. Rows with no parseable host are DROPPED (conservative:
   * unparseable provenance is not keepable provenance).
   */
  def filterByDomain(
      docs: DataFrame,
      idCol: String,
      urlCol: String,
      blockedDomains: Seq[String]
  ): DataFrame = {
    require(blockedDomains.nonEmpty, "empty blocklist: nothing to filter")
    val spark = docs.sparkSession
    import spark.implicits._
    // schemes are case-insensitive (RFC 3986 §3.1): lower the URL BEFORE
    // extraction so HTTPS:// parses like https:// instead of dropping the row
    def host(c: Column) = regexp_extract(lower(c), "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    // every dot-suffix of the host: ads.ex.com -> [ads.ex.com, ex.com, com]
    def suffixes(h: Column) = {
      val labels = split(h, "\\.")
      transform(sequence(lit(0), size(labels) - 1),
        i => array_join(slice(labels, i + 1, size(labels)), "."))
    }
    val blocked = blockedDomains.map(_.toLowerCase).distinct.toDF("_fbd_sfx")
    val bad = docs
      .select(col(idCol).as("_fbd_id"), explode(suffixes(host(col(urlCol)))).as("_fbd_sfx"))
      .join(broadcast(blocked), Seq("_fbd_sfx"))
      .select(col("_fbd_id"))
      .distinct()
    docs
      .filter(length(host(col(urlCol))) > 0)
      .join(bad, col(idCol) === col("_fbd_id"), "left_anti")
  }

  // ----------------------------------------------------- quality classifier

  /**
   * Model-based quality scoring with the hashing trick — the linear
   * text-classifier stage (fastText-style) a large curation pipeline runs
   * after the heuristic filters: each token hashes to one of `dim = |weights|`
   * buckets via the cross-engine portable 31-bit hash, and the document's
   * score is the raw logit `bias + Σ weights[h(token) mod dim]` (token
   * multiplicity counts, as in a bag-of-words model). Returns the LOGIT, not
   * a probability: monotone links (sigmoid) and keep-thresholds compose on
   * top, and the logit itself is exactly representable — and therefore
   * oracle-checkable and summation-order-independent — whenever the weights
   * are dyadic rationals (k/2^n), which trained weights can always be
   * rounded to.
   *
   * Map-only: the model ships once inside the expression tree (a constant-
   * folded literal array), every token does one md5 + one array index — no
   * shuffle, no UDF, no state. At 100 TB this is a single streaming pass.
   */
  def scoreHashedLinear(text: Column, weights: Seq[Double], bias: Double = 0.0): Column = {
    require(weights.nonEmpty, "weights must be non-empty")
    val dim = weights.length
    val warr = array(weights.map(lit): _*)
    aggregate(
      Text.tokens(text),
      lit(bias),
      (acc, t) => acc + element_at(warr, (Text.portableHash31(t) % dim).cast("int") + 1))
  }

  /**
   * A multinomial Naive Bayes text classifier held as DATA: per-token
   * log-likelihood-ratio micro-weights (tok, w) as a DataFrame — a model
   * trained on a corpus of any size stays distributed. `biasMicro` is the
   * class log-prior ratio; `oovMicro` the smoothing-only weight every
   * unseen token scores (both 1e-6-grid integers, the only driver-side
   * scalars). */
  final case class NbModel(tokenWeights: DataFrame, biasMicro: Long, oovMicro: Long) {
    def unpersist(): Unit = tokenWeights.unpersist(blocking = false)
  }

  /**
   * Train a multinomial Naive Bayes quality classifier — the counts-based
   * model every web-pipeline "looks like Wikipedia?" filter starts from
   * (the CCNet/fastText lineage), and the one whose TRAINING is fully
   * distributed AND exactly reproducible: everything is token counting
   * until a final `floor(ln(count ratio)·1e6)` per token, so the model —
   * and every score, an integer sum of grid weights — is engine-exact
   * (same ln-grid discipline as [[trainNgramLm]] scoring).
   *
   *   w(tok)  = ⌊ln((c⁺+1)/(n⁺+v))·1e6⌋ − ⌊ln((c⁻+1)/(n⁻+v))·1e6⌋
   *   bias    = ⌊ln(d⁺)·1e6⌋ − ⌊ln(d⁻)·1e6⌋  (class doc counts)
   *   score   = bias + Σ_tokens w(tok) (OOV tokens score the c=0 weight)
   *
   * Training is ONE aggregation over (label, token) counts; scoring is one
   * model-side join against the exploded token stream — the corpus text
   * never shuffles, only (id, tok) pairs do. Both classes must be present.
   */
  def trainNaiveBayes(
      docs: DataFrame,
      textCol: String,
      labelCol: String // boolean: true = positive class
  ): NbModel = {
    import org.apache.spark.storage.StorageLevel
    val toks = docs.select(col(labelCol).as("_lbl"),
      explode(Text.tokens(col(textCol))).as("tok"))
    val counts = toks
      .groupBy(col("tok"))
      .agg(
        sum(when(col("_lbl"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("_lbl"), 0L).otherwise(1L)).as("cn"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = counts.agg(
      sum("cp").cast("long"), sum("cn").cast("long"), count(lit(1))).head()
    val np: Long = tot.getLong(0)
    val nn: Long = tot.getLong(1)
    val v: Long = tot.getLong(2)
    require(np > 0 && nn > 0, "both classes need at least one training token")
    def grid(c: Column, n: Long): Column =
      floor(log((c + 1).cast("double") / lit((n + v).toDouble)) * 1e6).cast("long")
    val weights = counts
      .select(col("tok"), (grid(col("cp"), np) - grid(col("cn"), nn)).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    weights.count()
    counts.unpersist(blocking = false)
    val dCounts = docs.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)),
      sum(when(col(labelCol), 0L).otherwise(1L))).head()
    val (dp, dn) = (dCounts.getLong(0), dCounts.getLong(1))
    def gridS(c: Long, n: Long): Long =
      math.floor(math.log((c + 1).toDouble / (n + v).toDouble) * 1e6).toLong
    NbModel(
      tokenWeights = weights,
      biasMicro = math.floor(math.log(dp.toDouble) * 1e6).toLong -
        math.floor(math.log(dn.toDouble) * 1e6).toLong,
      oovMicro = gridS(0, np) - gridS(0, nn))
  }

  /** Score a corpus with a [[trainNaiveBayes]] model: (id, score, pred) —
    * `score` is the exact grid sum / 1e6 (positive ⇒ positive class). One
    * explode + one model-side join; only (id, tok) pairs shuffle. */
  def scoreNaiveBayes(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: NbModel
  ): DataFrame = {
    val ex = docs.select(col(idCol), explode(Text.tokens(col(textCol))).as("tok"))
    ex.join(model.tokenWeights, Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("w"), lit(model.oovMicro))).as("_sum"))
      .join(docs.select(col(idCol)), Seq(idCol), "right")
      .select(
        col(idCol),
        ((coalesce(col("_sum"), lit(0L)) + model.biasMicro).cast("double") / 1e6).as("score"))
      .withColumn("pred", col("score") > 0.0)
  }

  // ----------------------------------------------------- n-gram LM scoring

  /** A bigram stupid-backoff language model held as DATA, not driver state:
    * `unigrams` (tok, c1) and `bigrams` (prev, tok, c2) are DataFrames, so a
    * model trained on a reference corpus of any size stays distributed —
    * nothing model-sized ever reaches the driver. `n` = total training
    * tokens, `v` = vocabulary size (the only driver-side scalars). */
  final case class NgramLm(unigrams: DataFrame, bigrams: DataFrame, n: Long, v: Long) {
    /** Drop the cached model tables (training persists them for scoring) —
      * long-lived sessions that train many models must call this or
      * `catalog.clearCache()` between them, or the block manager grows by
      * two model tables per training run. */
    def release(): Unit = {
      unigrams.unpersist(blocking = false)
      bigrams.unpersist(blocking = false)
    }
  }

  /** Let-bound (tok, prev) stream of a document's tokens — map-only; the
    * token array is bound ONCE through the single-element `transform`
    * binder (the chunkDocs lesson: a plain `val` alias of the tokenizer
    * expression re-evaluates it per reference). `prev` is null at position
    * 0; `element_at` is 1-based, so index i reads ts[i-1]. */
  private def tokenPairs(text: Column): Column =
    flatten(transform(array(Text.tokens(text)), ts =>
      transform(ts, (t, i) =>
        struct(
          t.as("tok"),
          when(i === 0, lit(null).cast("string"))
            .otherwise(element_at(ts, i)).as("prev")))))

  /**
   * Train a bigram stupid-backoff LM (Brants et al. 2007, "Large Language
   * Models in Machine Translation") on a reference corpus — the CCNet
   * (Wenzek et al. 2020) recipe of perplexity-based quality filtering, with
   * the n-gram counts kept as DataFrames instead of a driver-resident KenLM
   * binary. Two count aggregations, hash-partitioned on token keys; the
   * token stream is persisted only for the duration of training so the
   * corpus is tokenized once, and the model tables stay cached for scoring.
   */
  def trainNgramLm(docs: DataFrame, textCol: String): NgramLm = {
    import org.apache.spark.storage.StorageLevel
    val ex = docs
      .select(explode(tokenPairs(col(textCol))).as("p"))
      .select(col("p.tok").as("tok"), col("p.prev").as("prev"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val uni = ex.groupBy("tok").agg(count(lit(1)).as("c1"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bi = ex.filter(col("prev").isNotNull)
      .groupBy("prev", "tok").agg(count(lit(1)).as("c2"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val totals = uni.agg(sum(col("c1")).as("n"), count(lit(1)).as("v")).head()
    bi.count() // force materialization before the token stream is released
    ex.unpersist(blocking = false)
    NgramLm(uni, bi, totals.getLong(0), totals.getLong(1))
  }

  /**
   * Score documents by mean negative log-probability per token under the
   * LM: p(t|prev) = c2(prev,t)/c1(prev) when the bigram was seen, else
   * alpha * p1(t); p1(t) = (c1(t)+1)/(N+V) (add-one smoothing covers OOV
   * tokens when the model was trained on a different corpus). Returns one
   * row per document with >= 1 token: (id, n_tokens, logppl) where logppl
   * is -mean ln p — lower = more fluent under the reference corpus; CCNet
   * keeps the low-perplexity head/middle of this distribution.
   *
   * Exactness discipline: each token's ln p is FLOORED onto a 1e-6 grid and
   * summed as an exact integer, so the aggregate is order-independent and
   * engine-portable — a raw double sum would depend on Spark's partial-
   * aggregation order and could never hash-match the oracle. Every other
   * step (count ratios, the final divisions) is IEEE-exact. The model joins
   * are plain hash joins on token keys; AQE broadcasts the model sides when
   * runtime sizes allow, and at 100 TB they degrade gracefully to shuffled
   * joins — the model never has to fit anywhere in particular.
   *
   * The prev-token count c1(prev) is only consumed when the bigram WAS seen
   * (the backoff path never divides by it), so it rides the bigram table
   * via a MODEL-side join — the exploded corpus stream pays two join
   * shuffles, not three.
   */
  def scoreNgramLm(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lm: NgramLm,
      alpha: Double = 0.4
  ): DataFrame = {
    val ex = docs
      .select(col(idCol), explode(tokenPairs(col(textCol))).as("p"))
      .select(col(idCol), col("p.tok").as("tok"), col("p.prev").as("prev"))
    val biWithPrev = lm.bigrams
      .join(lm.unigrams.select(col("tok").as("prev"), col("c1").as("cprev")), Seq("prev"))
    val joined = ex
      .join(lm.unigrams.select(col("tok"), col("c1").as("ctok")), Seq("tok"), "left")
      .join(biWithPrev, Seq("prev", "tok"), "left")
    val p1 = (coalesce(col("ctok"), lit(0L)) + 1).cast("double") / lit((lm.n + lm.v).toDouble)
    val p = when(col("c2").isNotNull, col("c2").cast("double") / col("cprev"))
      .when(col("prev").isNotNull, lit(alpha) * p1)
      .otherwise(p1)
    // Residual cross-engine risk: the 1e-6 floor grid assumes ln() agrees
    // between the JVM's Math.log and the oracle engine's libm. Both are only
    // ~1-ulp accurate, so a log value landing within an ulp of a grid
    // boundary can floor differently across engines — astronomically rare on
    // real counts, but a lone hash-mismatch here should be adjudicated as
    // host-libm noise (re-check the per-row lp deltas), not an operator bug.
    joined
      .withColumn("lp", floor(log(p) * lit(1000000.0)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        ((sum(col("lp")) * lit(-1L)).cast("double") / lit(1000000.0) / count(lit(1)))
          .as("logppl"))
  }

  /**
   * Gopher rule-based quality filter (Rae et al. 2021, "Scaling Language
   * Models: Methods, Analysis & Insights from Training Gopher", A1.1) —
   * the canonical named document filter every web-scale corpus pipeline
   * runs before model-based scoring. Emits each rule's measurement and
   * verdict plus the conjunction, so a pipeline can both filter and audit
   * WHY a document fell:
   *   - word count within [minWords, maxWords];
   *   - mean word length within [minMeanWordLen, maxMeanWordLen];
   *   - symbol-to-word ratio (`#` or `...`) ≤ maxSymbolRatio;
   *   - ≤ maxBulletFrac of lines start with a bullet,
   *     ≤ maxEllipsisFrac end with an ellipsis;
   *   - ≥ minAlphaFrac of words contain a letter;
   *   - at least minStopwordHits of the 8 Gopher stop words appear.
   * Map-only (one pass, all Catalyst built-ins, no shuffle); every
   * measurement is exact integer arithmetic plus one final double
   * division, so the whole frame is DuckDB-hash-checkable.
   */
  def gopherRules(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.1,
      maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8,
      minStopwordHits: Int = 2
  ): DataFrame = {
    // null text behaves like empty text throughout (the no-evidence case)
    val toks = coalesce(Text.tokens(col(textCol)), array().cast("array<string>"))
    val nWords = size(toks).cast("long")
    val sumLen = coalesce(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)), lit(0L))
    val meanLen = when(nWords > 0, sumLen.cast("double") / nWords).otherwise(lit(0.0))
    def occurrences(needle: String): Column =
      ((length(col(textCol)) -
        length(replace(col(textCol), lit(needle), lit("")))) / needle.length).cast("long")
    val symbols = coalesce(occurrences("#") + occurrences("..."), lit(0L))
    val symbolRatio = when(nWords > 0, symbols.cast("double") / nWords).otherwise(lit(0.0))
    val lines = split(coalesce(col(textCol), lit("")), "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = coalesce(aggregate(
      lines, lit(0L),
      (acc, l) => acc + when(
        ltrim(l).startsWith("- ") || ltrim(l).startsWith("* ") ||
          ltrim(l).startsWith("•"), 1L).otherwise(0L)), lit(0L))
    val ellipsisLines = coalesce(aggregate(
      lines, lit(0L),
      (acc, l) => acc + when(rtrim(l).endsWith("..."), 1L).otherwise(0L)), lit(0L))
    val bulletFrac = when(nLines > 0, bulletLines.cast("double") / nLines).otherwise(lit(0.0))
    val ellipsisFrac =
      when(nLines > 0, ellipsisLines.cast("double") / nLines).otherwise(lit(0.0))
    val alphaWords = coalesce(aggregate(
      toks, lit(0L), (acc, t) => acc + when(t.rlike("[a-z]"), 1L).otherwise(0L)), lit(0L))
    val alphaFrac = when(nWords > 0, alphaWords.cast("double") / nWords).otherwise(lit(0.0))
    val stopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopwordHits = stopwords
      .map(w => when(array_contains(toks, w), 1L).otherwise(0L))
      .reduce(_ + _)
    docs.select(
      col(idCol),
      nWords.as("n_words"),
      meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"),
      alphaFrac.as("alpha_frac"),
      stopwordHits.as("stopword_hits"),
      (nWords >= minWords && nWords <= maxWords &&
        meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen &&
        symbolRatio <= maxSymbolRatio &&
        bulletFrac <= maxBulletFrac && ellipsisFrac <= maxEllipsisFrac &&
        alphaFrac >= minAlphaFrac &&
        stopwordHits >= minStopwordHits).as("pass"))
  }

  /**
   * EXACT rank-based bucketing: rows sorted by (`scoreCol`, `idCol`) split
   * into `numBuckets` near-equal groups — bucket = floor(rank·buckets/n),
   * rank 0-based. This is the distributed spelling of `ntile` WITHOUT the
   * single-partition window `ntile` forces: the sort is a range-partitioned
   * total sort and ranks come from `zipWithIndex` (one extra count pass,
   * deterministic given the deterministic sort — the same machinery as
   * offset assignment). Exact at any scale, unlike sampled-percentile
   * thresholds — and exactness is what makes it oracle-checkable.
   */
  def rankBuckets(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      numBuckets: Int
  ): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    val spark = df.sparkSession
    val n = df.count()
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+
        org.apache.spark.sql.types.StructField(
          "bucket", org.apache.spark.sql.types.LongType, nullable = false))
    if (n == 0L) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val ranked = df
      .orderBy(col(scoreCol), col(idCol))
      .rdd.zipWithIndex()
      .map { case (row, idx) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx * numBuckets / n)
      }
    spark.createDataFrame(ranked, schema)
  }

  /**
   * CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
   * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
   * score every document with the n-gram LM ([[scoreNgramLm]]) and cut the
   * corpus into head/middle/tail (or `numBuckets`) groups by perplexity
   * rank — bucket 0 = lowest perplexity = most in-domain. The grouping is
   * exact rank splitting ([[rankBuckets]]), not sampled thresholds.
   */
  def pplBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lm: NgramLm,
      numBuckets: Int = 3
  ): DataFrame =
    rankBuckets(scoreNgramLm(docs, idCol, textCol, lm), idCol, "logppl", numBuckets)

  // ----------------------------------------------------- span (chunk) dedup

  /**
   * Exact substring-span dedup (the practical spelling of Lee et al. 2022,
   * "Deduplicating Training Data Makes Language Models Better"): a token
   * window of `windowTokens` that occurs MORE THAN ONCE corpus-wide keeps
   * its first occurrence (lowest (doc, start)) and is CUT from every other
   * one. Where the paper builds a corpus-wide suffix array, this hashes
   * fixed-length windows at `stride` — stride = windowTokens (disjoint
   * chunks, the RETRO-style variant) costs one window per W tokens;
   * stride 1 detects every shared W-token span at W× the rows. Matching is
   * case- and whitespace-token-sensitive; the rewrite is token-level, so
   * inter-token whitespace is normalized to single spaces in the output.
   *
   * Scale shape: the only shuffle carries (hash, doc, start) triples —
   * never text; flag ranking is one window over the hash partition;
   * the rewrite is a map-side array filter against each doc's own flagged
   * starts (corpus text never shuffles — spans join back id-grouped,
   * boilerplate-sized).
   */
  def dedupSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50,
      stride: Int = 50
  ): DataFrame = {
    require(windowTokens >= 1 && stride >= 1, "windowTokens and stride must be positive")
    // case-preserving whitespace tokens: exact-substring matching is
    // case-sensitive (unlike the lowercased Text.tokens used for dedup keys)
    def toksOf(c: Column) = filter(split(trim(c), "\\s+"), t => length(t) > 0)
    val winCol = flatten(transform(array(toksOf(col(textCol))), ts => {
      val n = size(ts)
      // Column `/` is fractional; the cast truncates — exact floor-div here
      // because the guarded branch has n >= windowTokens (non-negative)
      val nWin = ((n - windowTokens) / stride).cast("int") + 1
      // sequence(0, -1) would count DOWN; guard the short-doc case explicitly
      when(n >= windowTokens,
        transform(sequence(lit(0), nWin - 1), w => {
          val start = w * stride
          struct(
            start.as("start"),
            xxhash64(concat_ws(" ", slice(ts, start + 1, lit(windowTokens)))).as("h"))
        })
      ).otherwise(array().cast("array<struct<start:int,h:bigint>>"))
    }))
    val wins = docs
      .select(col(idCol).as("_ds_id"), explode(winCol).as("w"))
      .select(col("_ds_id"), col("w.start").as("_start"), col("w.h").as("_h"))
    // _rn >= 2 already implies the hash occurs at least twice — no separate
    // count window needed; rank 1 is the kept first occurrence
    val flagged = wins
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_h")).orderBy(col("_ds_id"), col("_start"))))
      .filter(col("_rn") >= 2)
    val spans = flagged.groupBy(col("_ds_id")).agg(collect_list(col("_start")).as("_starts"))
    docs
      .join(spans, col(idCol) === col("_ds_id"), "left")
      .withColumn("_toks", toksOf(col(textCol)))
      .withColumn("_kept",
        when(col("_starts").isNull, col("_toks"))
          .otherwise(filter(col("_toks"), (t, i) =>
            !exists(col("_starts"), s => i >= s && i < s + windowTokens))))
      .withColumn("removed_tokens",
        (size(col("_toks")) - size(col("_kept"))).cast("long"))
      .withColumn(textCol, array_join(col("_kept"), " "))
      .drop("_ds_id", "_starts", "_toks", "_kept")
  }

  // ------------------------------------------------- DSIR importance weights

  /** A trained DSIR model: per-bucket micro-scaled log importance ratios
    * (floor(1e6 * (ln p_target[b] - ln p_raw[b]))) — exact integers, so
    * document scores sum order-independently. Driver footprint is exactly
    * `buckets` longs regardless of corpus size. */
  final case class DsirModel(weights: Array[Long]) {
    def buckets: Int = weights.length
  }

  /** Hashed n-gram feature stream (DSIR's featurization): one bucket per
    * unigram plus one per bigram (`prev + " " + tok` — tokens are
    * whitespace-split so the space separator is unambiguous), via the
    * cross-engine portable 31-bit hash. Map-only, let-bound token array. */
  private def hashedNgramBuckets(text: Column, buckets: Int): Column =
    flatten(transform(tokenPairs(text), p => {
      def b(c: Column) = (Text.portableHash31(c) % buckets).cast("int")
      val tok = p.getField("tok")
      val prev = p.getField("prev")
      when(prev.isNotNull, array(b(tok), b(concat(prev, lit(" "), tok))))
        .otherwise(array(b(tok)))
    }))

  /**
   * Train DSIR importance weights (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): fit hashed-n-gram bag
   * models of a TARGET corpus (what you want more of — e.g. wiki-like text)
   * and the RAW corpus, take per-bucket log ratios. Two count aggregations;
   * only `buckets`-sized count vectors reach the driver. Add-one smoothing
   * keeps every bucket finite; ratios are floored onto the 1e-6 grid so
   * every downstream sum is exact.
   */
  def trainDsir(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      buckets: Int = 1024
  ): DsirModel = {
    def counts(df: DataFrame): Array[Long] = {
      val rows = df
        .select(explode(hashedNgramBuckets(col(textCol), buckets)).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
        .collect()
      val arr = Array.fill(buckets)(0L)
      rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
      arr
    }
    val (tc, rc) = (counts(target), counts(raw))
    val (nt, nr) = (tc.sum, rc.sum)
    val w = Array.tabulate(buckets) { b =>
      math.floor(1000000.0 * (
        math.log((tc(b) + 1.0) / (nt + buckets.toDouble)) -
          math.log((rc(b) + 1.0) / (nr + buckets.toDouble)))).toLong
    }
    DsirModel(w)
  }

  /**
   * Score documents by summed hashed-n-gram importance weight: high = looks
   * like the target distribution. `score` is the exact micro-sum / 1e6; the
   * micro-sum itself is an integer aggregate of the model's integer
   * weights, so partial-aggregation order cannot change it. Map-only: the
   * weight table rides the plan as ONE array literal (a single codegen
   * reference object, not `buckets` expression nodes).
   */
  def scoreDsir(docs: DataFrame, idCol: String, textCol: String, model: DsirModel): DataFrame = {
    val warr = lit(model.weights)
    docs.select(
      col(idCol),
      // coalesce: NULL text propagates a null aggregate — it must score 0.0
      // exactly like empty text (the documented no-evidence case)
      (coalesce(
        aggregate(
          hashedNgramBuckets(col(textCol), model.buckets),
          lit(0L),
          (acc, b) => acc + element_at(warr, b + 1)),
        lit(0L)
      ).cast("double") / lit(1000000.0)).as("score"))
  }

  /**
   * Gumbel-top-k importance RESAMPLING (the selection step of DSIR):
   * sample k documents without replacement with probability proportional
   * to exp(score) by ranking on score + Gumbel noise. The noise is the
   * DETERMINISTIC hash-Gumbel -ln(-ln(u)), u = (portable_hash31(salt:id)
   * + 1) / 2^31 — reproducible under any partitioning, and floored onto
   * the same 1e-6 grid so the ranking key is an exact integer with an id
   * tie-break. Distributed TakeOrdered; nothing corpus-sized converges.
   */
  def resampleDsir(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: DsirModel,
      k: Int,
      salt: Long = 0L
  ): DataFrame = {
    val warr = lit(model.weights)
    // coalesce: null text carries zero evidence, same as empty (scoreDsir)
    val micro = coalesce(
      aggregate(
        hashedNgramBuckets(col(textCol), model.buckets),
        lit(0L),
        (acc, b) => acc + element_at(warr, b + 1)),
      lit(0L))
    val u = (Text.portableHash31(concat_ws(":", lit(salt), col(idCol))) + 1)
      .cast("double") / lit(2147483648.0)
    val gumbelMicro = floor(-log(-log(u)) * lit(1000000.0))
    docs
      .withColumn("key", micro + gumbelMicro)
      .orderBy(col("key").desc, col(idCol))
      .limit(k)
      .drop("key")
  }

  // ----------------------------------------------------------- BPE training

  /** A trained byte-pair-encoding merge table; rank = merge priority
    * (earlier learned = applied first). `alphabet` is the base symbol set
    * observed at training (characters + the `</w>` terminal), so the
    * id vocabulary below is a pure function of the MODEL — stable across
    * corpora, re-shardings, and engines. */
  final case class BpeModel(merges: Seq[(String, String)], alphabet: Seq[String]) {
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap

    /** piece → id: sorted base alphabet first, then merge products in rank
      * order (the standard trainer layout). Deterministic given the model.
      * `distinct` is semantics, not hygiene: two different merges can build
      * the SAME piece string (("ab","c") and ("a","bc") both yield "abc"),
      * and one piece must mean one id. */
    lazy val vocab: Map[String, Int] =
      (alphabet.sorted ++ merges.map { case (a, b) => a + b })
        .distinct.zipWithIndex.toMap
  }

  /**
   * Train a BPE subword vocabulary (Sennrich et al. 2016, "Neural Machine
   * Translation of Rare Words with Subword Units") the way production
   * tokenizer trainers do: from a WORD-FREQUENCY table, not the raw corpus.
   * The corpus pass is one distributed word count; only the top `maxWords`
   * (count desc, word asc) reach the driver, which runs the classic merge
   * loop on the frequency dict — `numMerges` iterations over at most
   * `maxWords` entries, independent of corpus size. The dropped long tail
   * is words too rare to influence any merge decision; raise `maxWords` if
   * the corpus vocabulary is genuinely that flat.
   *
   * Determinism: the winning pair each round is (max count, then
   * lexicographically smallest pair) — re-training on the same counts
   * always yields the same merges. Words are lowercased whitespace tokens
   * ([[Text.tokens]]) spelled as characters plus a terminal `</w>` symbol.
   * The terminal is reserved: a corpus whose TOKENS contain the literal
   * substring `</w>` would alias it (the classic-BPE caveat — production
   * tokenizers byte-escape it away); pre-scrub such corpora before
   * training, as the round-trip rebuild maps every `</w>` to a word break.
   *
   * The merge loop maintains pair counts INCREMENTALLY (the optimization
   * every production trainer ships): merging (a,b) touches only the words
   * that contain (a,b) — their old adjacencies are debited, their rewritten
   * ones credited, and a tree-ordered active set yields each round's argmax
   * in O(log #pairs). A 32k-merge train is seconds of driver time instead
   * of hours (the naive rescan is O(rounds × vocab × word length)). A
   * per-round distributed aggregation would be the WRONG shape here: the
   * histogram is ≤ maxWords rows by construction — already the product of
   * the one distributed corpus pass — and 32k rounds × the job-scheduling
   * floor is hours of overhead for work a single core finishes in
   * microseconds per round. CorpusSpec pins this loop byte-identical to
   * the naive reference rescan.
   */
  def trainBpe(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 50000
  ): BpeModel = {
    val words = docs
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val vocab: Array[(Vector[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toVector :+ "</w>", c) }
    val alphabet = (words.flatMap(_._1.map(_.toString)).distinct :+ "</w>").toSeq
    BpeModel(mergeLoop(vocab, numMerges), alphabet)
  }

  /** The incremental merge loop over a (symbols, count) word histogram. */
  private def mergeLoop(
      vocab: Array[(Vector[String], Long)],
      numMerges: Int
  ): Vector[(String, String)] = {
    import scala.collection.mutable
    val counts = mutable.HashMap.empty[(String, String), Long]
    val pairToWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    // active mirrors counts as (count, a, b) snapshots so the round argmax
    // — max count, then lexicographically smallest — is first() in a
    // TreeSet; every count change swaps the snapshot (2 × log n)
    val active = new java.util.TreeSet[(Long, String, String)](
      Ordering.by((t: (Long, String, String)) => (-t._1, t._2, t._3)))
    def credit(p: (String, String), delta: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) active.remove((old, p._1, p._2))
      val now = old + delta
      if (now != 0L) { counts(p) = now; active.add((now, p._1, p._2)) }
      else counts.remove(p)
    }
    def forPairs(syms: Vector[String])(f: ((String, String)) => Unit): Unit = {
      var i = 0
      while (i < syms.size - 1) { f((syms(i), syms(i + 1))); i += 1 }
    }
    vocab.zipWithIndex.foreach { case ((syms, c), wi) =>
      forPairs(syms) { p =>
        credit(p, c)
        pairToWords.getOrElseUpdate(p, mutable.HashSet.empty) += wi
      }
    }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    while (round < numMerges && !active.isEmpty) {
      val top = active.first()
      val best = (top._2, top._3)
      merges += best
      // only words containing the winning pair change; each swaps its old
      // adjacency contributions for its rewritten ones
      pairToWords.remove(best).foreach(_.toArray.foreach { wi =>
        val (syms, c) = vocab(wi)
        forPairs(syms) { p =>
          credit(p, -c)
          if (p != best) pairToWords.get(p).foreach { s =>
            s -= wi; if (s.isEmpty) pairToWords.remove(p)
          }
        }
        val rewritten = mergePair(syms, best)
        vocab(wi) = (rewritten, c)
        forPairs(rewritten) { p =>
          credit(p, c)
          pairToWords.getOrElseUpdate(p, mutable.HashSet.empty) += wi
        }
      })
      round += 1
    }
    merges.result()
  }

  /** One left-to-right non-overlapping merge of `pair` in a symbol seq. */
  private def mergePair(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.size) {
      if (i < syms.size - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (pair._1 + pair._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Greedy BPE encode of one word: repeatedly merge the lowest-rank pair
    * present (all its occurrences) until no ranked pair remains — the
    * standard inference rule, inverse-consistent with training order. */
  private[operators] def encodeWord(
      w: String,
      ranks: Map[(String, String), Int]
  ): Vector[String] = {
    var syms = w.map(_.toString).toVector :+ "</w>"
    var done = syms.size < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < syms.size - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else {
        syms = mergePair(syms, best)
        done = syms.size < 2
      }
    }
    syms
  }

  /**
   * Apply a trained BPE model: (id, pieces) with one `Array[String]` of
   * subword pieces per document (word-terminal pieces carry the `</w>`
   * marker, so the token stream is losslessly invertible to the normalized
   * word sequence). Tokenization stays in Catalyst ([[Text.tokens]]); only
   * the per-word merge loop — data-dependent iteration, inexpressible in
   * built-ins — runs in `mapPartitions`, map-only with the rank table
   * broadcast once. One streaming pass at any scale.
   */
  def applyBpe(docs: DataFrame, idCol: String, textCol: String, model: BpeModel): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
    val ranks = docs.sparkSession.sparkContext.broadcast(model.ranks)
    // id stays whatever type the caller has (UUID strings are common corpus
    // keys) — the row encoder carries the observed field through unchanged
    val in = docs.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
    val outSchema = StructType(Seq(
      in.schema.head,
      StructField("pieces", ArrayType(StringType, containsNull = false))))
    in.mapPartitions { it =>
      val r = ranks.value
      it.map { row =>
        // null text tokenizes to null (split of a null column) — treat as
        // empty like every explode-based operator does, don't NPE the job
        val toks = Option(row.getSeq[String](1)).getOrElse(Seq.empty)
        org.apache.spark.sql.Row(row.get(0), toks.flatMap(w => encodeWord(w, r)))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /**
   * Tokenize to INTEGER ids — the (id, token_ids) frame a training pipeline
   * chunks ([[chunkDocs]]) and packs ([[packShards]]): [[applyBpe]] pieces
   * mapped through the model vocabulary as ONE map literal (codegen'd
   * lookup, no join). Pieces outside the vocabulary — characters never seen
   * at training — encode as `unkId` (-1 by default), the usual UNK slot.
   */
  def encodeBpeIds(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: BpeModel,
      unkId: Int = -1
  ): DataFrame = {
    val vmap = typedlit(model.vocab)
    applyBpe(docs, idCol, textCol, model)
      .withColumn("token_ids",
        transform(col("pieces"), p => coalesce(element_at(vmap, p), lit(unkId))))
      .drop("pieces")
  }

  // ------------------------------------------------------------ line dedup

  /**
   * Corpus-wide line (paragraph) dedup — the CCNet/RefinedWeb boilerplate
   * stage: a line that occurs in at least `minDocs` DISTINCT documents is
   * removed from every document that carries it (navbars, cookie banners,
   * license footers). Lines shorter than `minLineChars` never count and are
   * never removed (they are structure, not boilerplate). Each document's
   * surviving lines are rejoined with `sep` in original order; the returned
   * frame is the input with `textCol` rewritten plus a `removed_lines`
   * count.
   *
   * Scale shape, two paths behind one semantics:
   *  - detection is one aggregation whose shuffle carries 8-byte line
   *    hashes only (`array_distinct` inside each document makes plain
   *    `count(*)` a distinct-document count — no (id, line) distinct
   *    shuffle, no text bytes);
   *  - the duplicated-hash set is tiny next to the corpus (it IS the
   *    boilerplate), so the default path collects it (capped at
   *    `collectMaxLines`), ships it once as a codegen reference object, and
   *    rewrites every document MAP-ONLY via binary-searched membership
   *    ([[graft.functions.SetExpressions.longSetContains]]) — the corpus
   *    text never shuffles;
   *  - past the cap, the fallback is explode -> hash anti-join -> regroup:
   *    one text shuffle, still never a driver-side set.
   *
   * `sep` is a literal separator (quoted before it reaches the regex-based
   * `split`), matching DuckDB's plain-string `string_split` in the oracle.
   */
  /**
   * WITHIN-document repeated-line removal — the in-doc rewrite sibling of
   * the corpus-wide [[dedupLines]]: each document keeps only the FIRST
   * occurrence of every line (repeated in-page headers/footers/nav blocks),
   * other lines pass through in order. One `aggregate` left-fold over the
   * line array — map-only, no shuffle, no state. The fold receives the line
   * array ONCE as its input (array HOFs are interpreted; a lambda that
   * reached back to the outer `split` tree would re-split the whole
   * document per line — the let-binding discipline of [[chunkDocs]]), and
   * each line is checked against the lines KEPT so far, not a slice of all
   * preceding lines — O(lines × distinct-kept) instead of O(lines²) plus
   * O(lines × textlen). Lines shorter than `minLineChars` are never dropped
   * (blank separators and one-word lines repeat legitimately), and can
   * never shadow a long line: equal strings have equal length.
   */
  /**
   * Line-level content filter (the RefinedWeb/trafilatura-style rule that
   * complements [[dedupLinesInDoc]]): a line survives when it carries at
   * least `minWords` whitespace tokens AND at least `minAlphaFrac` of them
   * contain a letter — nav crumbs, counters, and symbol rows drop while
   * prose lines pass. Map-only HOF arithmetic; documents whose every line
   * drops become empty strings (compose with a later length filter).
   */
  def filterLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n",
      minWords: Int = 3,
      minAlphaFrac: Double = 0.5
  ): DataFrame = {
    require(minWords >= 0 && minAlphaFrac >= 0.0 && minAlphaFrac <= 1.0,
      "minWords >= 0, minAlphaFrac in [0,1]")
    val lines = split(coalesce(col(textCol), lit("")),
      java.util.regex.Pattern.quote(sep))
    val kept = filter(lines, l => {
      val toks = filter(split(lower(trim(l)), "\\s+"), t => length(t) > 0)
      val n = size(toks)
      val alpha = coalesce(
        aggregate(toks, lit(0L), (acc, t) => acc + when(t.rlike("[a-z]"), 1L).otherwise(0L)),
        lit(0L))
      n >= minWords &&
        when(n > 0, alpha.cast("double") / n).otherwise(lit(0.0)) >= minAlphaFrac
    })
    docs.withColumn(textCol, concat_ws(sep, kept))
  }

  def dedupLinesInDoc(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n",
      minLineChars: Int = 6
  ): DataFrame = {
    val lines = split(coalesce(col(textCol), lit("")),
      java.util.regex.Pattern.quote(sep))
    // running-seen fold: drop a line iff it is long enough to be eligible
    // AND already present among the kept lines (its first occurrence — an
    // equal string is equally long, so it was kept, never minLineChars-
    // skipped). `lines` is the aggregate's input, evaluated exactly once.
    val kept = aggregate(
      lines,
      array().cast("array<string>"),
      (acc, l) =>
        when(length(l) >= minLineChars && array_contains(acc, l), acc)
          .otherwise(concat(acc, array(l))))
    docs.withColumn(textCol, concat_ws(sep, kept))
  }

  def dedupLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n",
      minDocs: Int = 2,
      minLineChars: Int = 6,
      collectMaxLines: Long = 4L << 20
  ): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would remove every eligible line")
    val sepRe = java.util.regex.Pattern.quote(sep)
    def lineArr(c: Column) = split(c, sepRe, -1)

    val dupHashes = docs
      .select(explode(array_distinct(
        filter(lineArr(col(textCol)), l => length(l) >= minLineChars))).as("_l"))
      .select(xxhash64(col("_l")).as("_h"))
      .groupBy(col("_h")).count()
      .filter(col("count") >= minDocs)
      .select(col("_h"))
      // materialize the detection aggregation ONCE: count(), the sorted-set
      // collect, and the fallback join all read these 8-byte rows — without
      // this the full-corpus explode+groupBy would execute twice
      .localCheckpoint()

    val nDup = dupHashes.count() // small: one row per duplicated line
    if (nDup == 0L) return docs.withColumn("removed_lines", lit(0L))

    if (nDup <= collectMaxLines) {
      // map-only rewrite: probe the sorted set in place, no corpus shuffle
      val set = dupHashes.orderBy(col("_h")).collect().map(_.getLong(0))
      docs
        .withColumn("_lines", lineArr(col(textCol)))
        .withColumn("_kept", filter(col("_lines"), l =>
          length(l) < minLineChars ||
            !graft.functions.SetExpressions.longSetContains(xxhash64(l), set)))
        .withColumn("removed_lines",
          (size(col("_lines")) - size(col("_kept"))).cast("long"))
        .withColumn(textCol, array_join(col("_kept"), sep))
        .drop("_lines", "_kept")
    } else {
      // distributed rewrite: one text shuffle (the regroup), hash-only join
      val ex = docs.select(
        col(idCol).as("_ddl_id"),
        posexplode(lineArr(col(textCol))).as(Seq("_pos", "_l")))
      val kept = ex.join(
        dupHashes.hint("shuffle_hash"),
        xxhash64(col("_l")) === col("_h") && length(col("_l")) >= minLineChars,
        "left_anti")
      val rebuilt = kept
        .groupBy(col("_ddl_id"))
        .agg(
          array_join(
            transform(
              array_sort(collect_list(struct(col("_pos"), col("_l")))),
              x => x("_l")),
            sep).as("_newtext"),
          count(lit(1)).as("_kept_n"))
      docs
        .join(rebuilt, col(idCol) === col("_ddl_id"), "left")
        .withColumn("removed_lines",
          (size(lineArr(col(textCol))) - coalesce(col("_kept_n"), lit(0L))).cast("long"))
        .withColumn(textCol, coalesce(col("_newtext"), lit("")))
        .drop("_ddl_id", "_newtext", "_kept_n")
    }
  }
}
