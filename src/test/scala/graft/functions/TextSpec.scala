package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): T =
    Seq(input).toDF("t").select(c.as("r")).head().getAs[T]("r")

  test("tokenCount handles blanks and runs of whitespace") {
    assert(one[Int](Text.tokenCount(col("t")), "") === 0)
    assert(one[Int](Text.tokenCount(col("t")), "   ") === 0)
    assert(one[Int](Text.tokenCount(col("t")), "one") === 1)
    assert(one[Int](Text.tokenCount(col("t")), "  a\t b\n c ") === 3)
  }

  test("fingerprint normalizes case, inner whitespace, and non-space edges") {
    def fp(s: String): Long = one[Long](Text.fingerprint(col("t")), s)
    assert(fp("Hello  World") === fp("hello world"))
    // tab-prefixed text must equal the plain text (collapse happens before trim)
    assert(fp("\thello world") === fp("hello world"))
    assert(fp("hello world\n") === fp("hello world"))
    assert(fp("hello world") !== fp("hello worlds"))
  }

  test("wordShingles: n-grams with short-text fallback") {
    def sh(s: String, n: Int): Seq[String] =
      Seq(s).toDF("t").select(Text.wordShingles(col("t"), n).as("r")).head().getSeq[String](0)
    assert(sh("a b c d", 3) === Seq("a b c", "b c d"))
    assert(sh("a b", 3) === Seq("a b"))
    assert(sh("", 3) === Seq(""))
  }

  test("charShingles slides over normalized text") {
    def sh(s: String, n: Int): Seq[String] =
      Seq(s).toDF("t").select(Text.charShingles(col("t"), n).as("r")).head().getSeq[String](0)
    assert(sh("abcd", 3) === Seq("abc", "bcd"))
    assert(sh("ab", 3) === Seq("ab"))
  }

  test("languageId picks the dominant profile; und for gibberish") {
    def lid(s: String): String = one[String](Text.languageId(col("t")), s)
    assert(lid("the cat and the dog went to the market") === "en")
    assert(lid("der hund und die katze ist nicht da") === "de")
    assert(lid("xyzzy qwerty plugh") === "und")
  }

  test("qualityScore is in [0,1] and orders text plausibly") {
    def q(s: String): Double = one[Double](Text.qualityScore(col("t")), s)
    val good = q(
      "The quick brown fox jumps over the lazy dog and then runs across the wide field " +
        "to find some food for its hungry family in the early morning light."
    )
    val bad = q("@@@ ### $$$ %%% ^^^ &&&")
    assert(good >= 0.0 && good <= 1.0 && bad >= 0.0 && bad <= 1.0)
    assert(good > bad)
  }

  test("native text_stats kernel is bit-identical to the Column spellings on a real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cmp = docs.select(
      col("doc_id"),
      Text.qualityScore(col("text")).as("qn"),
      Text.qualityScoreHof(col("text")).as("qh"),
      Text.languageId(col("text")).as("ln"),
      Text.languageIdHof(col("text")).as("lh")
    ).collect()
    assert(cmp.length > 100)
    cmp.foreach { r =>
      assert(r.getDouble(1) === r.getDouble(2), s"quality mismatch doc ${r.getLong(0)}")
      assert(r.getString(3) === r.getString(4), s"lang mismatch doc ${r.getLong(0)}")
    }
    // synthetic edges: empty, whitespace-only, tabs/newlines (trim is
    // 0x20-only), unicode text, marker ties
    val edge = Seq("", "   ", "\t\n the and of ", "der die und das ist",
      "的 是 了", "zzz qqq", "le la мир café Straße").toDF("text")
    val e = edge.select(
      Text.qualityScore(col("text")).as("qn"), Text.qualityScoreHof(col("text")).as("qh"),
      Text.languageId(col("text")).as("ln"), Text.languageIdHof(col("text")).as("lh"),
      Text.tokenCount(col("text")).as("t")).collect()
    e.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1), r.toString)
      assert(r.getString(2) === r.getString(3), r.toString)
    }
  }

  test("approxBpeTokenCount splits words, digits and punctuation") {
    assert(one[Int](Text.approxBpeTokenCount(col("t")), "hello world") === 2)
    assert(one[Int](Text.approxBpeTokenCount(col("t")), "hello, world!") === 4)
  }

  test("Normalize.nfc composes; cleanText strips controls, collapses, keeps newlines") {
    import graft.functions.Normalize
    // decomposed e + combining acute -> composed é (U+00E9)
    assert(one[String](Normalize.nfc(col("t")), "cafe" + "\u0301") === "caf" + "\u00e9")
    // already-NFC input takes the no-alloc fast path and round-trips
    assert(one[String](Normalize.nfc(col("t")), "plain ascii") === "plain ascii")
    assert(one[String](Normalize.cleanText(col("t")), "a\tb" + "\u0001" + "c" + "\u007f" + "d") === "a b c d")
    assert(one[String](Normalize.cleanText(col("t")), "  keep\nlines   x  ") === "keep\nlines x")
    // null-safe
    val r = spark.sql("SELECT CAST(NULL AS STRING) AS t")
      .select(Normalize.cleanText(col("t"))).head()
    assert(r.isNullAt(0))
  }

  test("stripHtml: subtrees dropped, tags to spaces, entities decoded once") {
    import graft.functions.Normalize
    def strip(s: String): String =
      one[String](Normalize.cleanText(Normalize.stripHtml(col("t"))), s)
    assert(strip("<p>a</p><p>b</p>") === "a b")
    assert(strip("x<script>ignore<p>this</p></script>y") === "x y")
    assert(strip("x<style a=b>p{}</style>y<!-- c -->z") === "x y z")
    // script spanning lines, case-insensitive tag
    assert(strip("a<SCRIPT>\nmulti\nline\n</SCRIPT>b") === "a b")
    assert(strip("1 &lt; 2 &amp;&amp; 3 &gt; 2, &quot;q&quot; &#39;s&#39;") ===
      """1 < 2 && 3 > 2, "q" 's'""")
    // double-escaped decodes exactly once, never recursively
    assert(strip("a &amp;lt; b") === "a &lt; b")
    assert(strip("plain text unchanged") === "plain text unchanged")
  }
}
