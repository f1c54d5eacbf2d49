package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation join: the classic SALTED equi-join for hot keys that
 * overwhelm a single shuffle partition. AQE's skew-join split handles
 * post-shuffle skew when it can (and remains the first resort), but it
 * cannot split a build side that must co-locate, and it never helps a
 * deliberately pre-partitioned layout — salting moves the fix into the
 * plan itself: the big side spreads each key across `salt` sub-keys, the
 * small side replicates `salt`-ways, and the join key becomes
 * (key, salt) — a hot key now occupies `salt` partitions instead of one.
 *
 * Semantics are EXACTLY the plain equi-join (the salted_join entry shares
 * a plain-join oracle): every big-side row meets every matching small-side
 * row exactly once, because the small side carries ALL salt values and the
 * big side exactly one.
 *
 * Scale shape: big side shuffles once on (key, salt) — same bytes as the
 * plain join, `salt`× the parallelism on hot keys; small side expands
 * `salt`× (choose salt so |small|·salt stays dimension-sized). Works for
 * inner and left-semi joins; outer joins on the small side would see
 * `salt` copies of unmatched rows and are rejected.
 */
object Skew {

  /**
   * Salted equi-join of `big` against `small` on equally-named `keys`.
   * `saltBy` picks the big-side spreading column — any column whose values
   * vary WITHIN a hot key (a line number, an id, the value itself);
   * deterministic (murmur3), so plans replay identically.
   */
  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salt: Int,
      saltBy: Column,
      joinType: String = "inner"
  ): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    require(salt >= 2, "salt must be at least 2 (1 is the plain join)")
    require(Seq("inner", "left_semi", "leftsemi").contains(joinType.toLowerCase),
      s"salting only preserves inner/left-semi semantics, got $joinType")
    // withColumn would silently OVERWRITE a caller's __salt column (and the
    // final drop would then remove it from the output)
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    val bigS = big.withColumn("__salt", pmod(hash(saltBy), lit(salt)))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salt).map(lit(_)): _*)))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }

  /**
   * Key-skew profile — the diagnostic that decides whether a join needs
   * [[saltedEquiJoin]] at all (the sf10 honesty check showed salting a
   * UNIFORM key costs ~4×): the `topK` heaviest values of `keyCol` with
   * `share_micro` (the key's row share) and `skew_x_micro` (that share ×
   * distinct-key count — 10⁶ means perfectly uniform, 100·10⁶ means this
   * key carries 100× its uniform share; AQE's skew threshold thinks in
   * exactly these multiples). All integer floor divisions; ties at the
   * top-K boundary break by the key's string form.
   *
   * Scale shape: one map-side-combinable key aggregate, one count-distinct
   * over it (key-sized), and a distributed TakeOrdered for the top-K.
   */
  def profileKeys(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK >= 1, "topK must be at least 1")
    val counts = df
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum(col("n")).as("__total"), count(lit(1)).as("n_distinct"))
    counts
      .join(broadcast(totals))
      .select(col("key"), col("n"), col("n_distinct"),
        expr("(n * 1000000L) DIV __total").as("share_micro"),
        // share FIRST, then × distinct: keeps every operand under 2^63
        // even at billions of keys (n·distinct·10⁶ would overflow there)
        (expr("(n * 1000000L) DIV __total") * col("n_distinct")).as("skew_x_micro"))
      .orderBy(col("n").desc, col("key"))
      .limit(topK)
  }
}
