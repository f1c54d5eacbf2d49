package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis functions for large-scale corpus processing: tokenization,
 * quality scoring, language id, fingerprinting. All are composed from
 * codegen'd Spark built-ins (`org.apache.spark.sql.functions`) — no Scala
 * UDFs in the hot path, so they stay inside whole-stage codegen and scale
 * linearly with the corpus.
 */
object Text {

  /** Whitespace token count. Empty/blank text counts 0 tokens. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Tokens, lowercased, whitespace-split. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /**
   * A BPE-ish subword proxy count: word-chars runs, digits, and punctuation
   * each count as separate tokens — a cheap deterministic stand-in for a real
   * tokenizer's token count (within ~15% of BPE counts on English text).
   */
  def approxBpeTokenCount(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9'])|(?<=[^A-Za-z0-9'])"), t => length(trim(t)) > 0))

  /** Character n-gram shingles of normalized text (for MinHash etc.).
    *
    * The normalized string is LET-BOUND through a single-element `transform`
    * wrapper: a plain `val` alias is an expression TREE, and referencing it
    * inside the per-shingle lambda re-evaluates the whole normalization per
    * position — O(len²) per doc in interpreted HOF eval. Bound as a lambda
    * variable it is computed once (same fix as [[wordShingles]], where the
    * quadratic re-tokenization measured 91 s vs 2 s on a 50k-doc corpus). */
  def charShingles(text: Column, n: Int): Column =
    flatten(transform(
      array(regexp_replace(lower(trim(text)), "\\s+", " ")),
      t =>
        when(length(t) <= n, array(t))
          .otherwise(transform(sequence(lit(1), length(t) - n + 1), i => t.substr(i, lit(n))))
    ))

  /** Word n-gram shingles joined with a space. Token array let-bound once —
    * see [[charShingles]] for why the wrapper matters. */
  def wordShingles(text: Column, n: Int): Column =
    flatten(transform(
      array(tokens(text)),
      toks =>
        when(size(toks) < n, array(concat_ws(" ", toks)))
          .otherwise(
            transform(
              sequence(lit(0), size(toks) - n),
              i => concat_ws(" ", slice(toks, i + 1, lit(n)))
            )
          )
    ))

  /**
   * Heuristic quality score in [0,1] from cheap signals, in the spirit of the
   * C4/Gopher text-quality filters: penalize very short docs, extreme mean
   * word length, high non-alpha ratio, and low stopword presence.
   */
  def qualityScore(text: Column): Column =
    TextStatsExpr.stats(text).getField("quality")

  /** The Column-algebra spelling of [[qualityScore]] — executable
    * specification for the native kernel (`TextSpec` asserts equality over
    * a real corpus). */
  private[graft] def qualityScoreHof(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChars = length(text).cast("double")
    val meanWordLen = when(nTok > 0, nChars / nTok).otherwise(lit(0.0))
    val alphaChars = length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double")
    val alphaRatio = when(nChars > 0, alphaChars / nChars).otherwise(lit(0.0))
    val stopHits = size(
      filter(tokens(text), t => t.isin(StopWords.map(lit): _*))
    ).cast("double")
    val stopRatio = when(nTok > 0, stopHits / nTok).otherwise(lit(0.0))

    val lenScore = least(nTok / 50.0, lit(1.0))
    val wordLenScore =
      when(meanWordLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.3))
    val stopScore = least(stopRatio * 5.0, lit(1.0))
    round(lenScore * 0.3 + wordLenScore * 0.2 + alphaRatio * 0.3 + stopScore * 0.2, 6)
  }

  private[functions] val StopWords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this"
  )

  /**
   * N-gram-profile language id heuristic: score text against tiny per-language
   * marker-word profiles; return the best-scoring language code or 'und'.
   * Deterministic, no external models; resolves ties by profile order.
   */
  def languageId(text: Column): Column =
    TextStatsExpr.stats(text).getField("lang")

  /** Column-algebra spelling of [[languageId]] — executable specification
    * for the native kernel. */
  private[graft] def languageIdHof(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangProfiles.map { case (lang, markers) =>
      struct(
        size(filter(toks, t => t.isin(markers.map(lit): _*))).as("hits"),
        lit(lang).as("lang")
      )
    }
    val best = array_max(array(scores: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  // Marker words chosen to be disjoint across profiles; array_max on
  // (hits, lang) structs breaks hit-ties by lang code descending.
  private[functions] val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "les", "est", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "los", "es", "una", "por", "como", "pero", "más"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不")
  )

  /**
   * Unicode-script profile — the signal a multilingual pipeline routes on
   * BEFORE any language model sees the text (CCNet splits its crawl by
   * script first; mixed-script text is its own spam signature). Returns a
   * struct of exact per-script LETTER counts (latin, cyrillic, han,
   * arabic, letters) plus the dominant script label ('und' when no
   * letters; ties break latin > cyrillic > han > arabic by the struct-max
   * construction). Counts are count-by-deletion over Unicode script
   * classes — map-only, and exact integers any regex engine with script
   * properties reproduces (RE2 spells the class \p{Latin} where Java
   * wants \p{IsLatin}; same sets).
   */
  def scriptProfile(text: Column): Column = {
    val t = coalesce(text, lit(""))
    def cnt(javaClass: String): Column =
      (length(t) - length(regexp_replace(t, s"[\\p{$javaClass}]", ""))).cast("long")
    val latin = cnt("IsLatin")
    val cyr = cnt("IsCyrillic")
    val han = cnt("IsHan")
    val arab = cnt("IsArabic")
    val letters = cnt("L")
    // max over (count, priority, label): ties go to the HIGHER priority
    val best = array_max(array(
      struct(latin.as("n"), lit(4).as("p"), lit("latin").as("s")),
      struct(cyr.as("n"), lit(3).as("p"), lit("cyrillic").as("s")),
      struct(han.as("n"), lit(2).as("p"), lit("han").as("s")),
      struct(arab.as("n"), lit(1).as("p"), lit("arabic").as("s"))))
    struct(
      latin.as("latin"), cyr.as("cyrillic"), han.as("han"), arab.as("arabic"),
      letters.as("letters"),
      when(best.getField("n") > 0, best.getField("s")).otherwise(lit("und")).as("script"))
  }

  /**
   * 64-bit rolling document fingerprint: xxhash64 of the normalized
   * (lowercased, whitespace-collapsed, then trimmed) text — exact-dup
   * detection key. Collapse happens BEFORE trim so that non-space leading
   * whitespace (tab, newline) is first collapsed to a space that trim can
   * then remove — `trim` only strips ' ' in both Spark and DuckDB, so the
   * reverse order fingerprints '\tabc' differently from 'abc'.
   */
  def fingerprint(text: Column): Column =
    xxhash64(trim(regexp_replace(lower(text), "\\s+", " ")))

  /**
   * Cross-engine portable 31-bit string hash: the first 8 hex chars of md5,
   * parsed as an integer, mod 2^31-1. Expressible identically in DuckDB as
   * `('0x' || substring(md5(s),1,8))::BIGINT % 2147483647`, which is what
   * makes MinHash signatures oracle-checkable (xxhash64 has no DuckDB
   * equivalent). md5 is codegen'd (commons-codec) — slower than xxhash64 but
   * still one digest per value, fully distributed.
   */
  def portableHash31(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long") % Hashing.P31

  /**
   * Cross-engine portable 64-bit hash rendered as a 64-char '0'/'1' bit
   * string: first 16 hex chars of md5 → binary, left-padded. DuckDB:
   * `lpad(bin(('0x' || substring(md5(s),1,16))::UBIGINT), 64, '0')`.
   * Bit strings sidestep signed-64 overflow differences between engines
   * (DuckDB errors on `1::BIGINT << 63`).
   */
  def portableHashBits(s: Column): Column =
    lpad(conv(substring(md5(s), 1, 16), 16, 2), 64, "0")
}

/** Constants for the portable (Spark ≡ DuckDB) hash family. */
object Hashing {
  /** 2^31 - 1 (prime). Keeps a*h+b within signed-64 range in both engines. */
  val P31: Long = 2147483647L
  /** Knuth multiplicative constant for deriving the i-th hash function. */
  val MulA: Long = 2654435761L
  /** Additive mixing constant for deriving the i-th hash function. */
  val MulB: Long = 40503L
}
