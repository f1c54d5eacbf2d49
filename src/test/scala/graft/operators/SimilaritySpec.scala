package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (10L, Array(1.0f, 0.0f, 0.0f)),
    (11L, Array(0.9f, 0.1f, 0.0f)),
    (12L, Array(0.0f, 1.0f, 0.0f)),
    (13L, Array(0.0f, 0.9f, 0.1f)),
    (14L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("cid", "cvec")

  private val queries = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f))
  ).toDF("qid", "qvec")

  test("bruteForceTopK ranks by cosine with deterministic tie-break") {
    val got = Similarity
      .bruteForceTopK(queries, corpus, "qid", "qvec", "cid", "cvec", k = 2)
      .select("qid", "rnk", "cid")
      .as[(Long, Int, Long)]
      .collect()
      .toSet
    assert(got === Set((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 12L), (2L, 2, 13L)))
  }

  test("cosine handles zero vectors") {
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(z.select(Similarity.cosine(col("a"), col("b")).as("c")).head().getDouble(0) === 0.0)
  }

  test("lshTopK recalls the nearest neighbor for aligned vectors") {
    val got = Similarity
      .lshTopK(queries, corpus, "qid", "qvec", "cid", "cvec", k = 1, dim = 3, numPlanes = 2)
      .select("qid", "cid")
      .as[(Long, Long)]
      .collect()
      .toMap
    // LSH is approximate: assert only that whatever is returned per query has
    // cosine >= the bucketed competitors, i.e. the top hit when present is 10/12.
    got.get(1L).foreach(c => assert(c === 10L))
    got.get(2L).foreach(c => assert(c === 12L))
  }

  test("hyperplaneBucket raises on dimension mismatch instead of silently bucketing") {
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "vec")
    val ex = intercept[Exception] {
      bad.select(Similarity.hyperplaneBucket(col("vec"), 4, dim = 64)).collect()
    }
    assert(ex.getMessage.contains("expected embedding dim 64"))
  }
}
