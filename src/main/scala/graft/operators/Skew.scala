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
}
