package graft

import org.apache.spark.sql.SparkSession

/**
 * Join-size thresholds shared by every graft session (CLI, Verify, Bench,
 * CriterionBench) so the engine's plan posture is uniform.
 *
 * Two thresholds, two kinds of evidence:
 *
 *  - `autoBroadcastJoinThreshold` (static, 64m): base-relation estimates
 *    are file sizes — real numbers. A dimension under 64 MB on disk hashes
 *    comfortably inside a multi-GB executor, and a table that grows past
 *    the threshold at higher scale factors degrades gracefully back to a
 *    shuffle join. Join OUTPUTS are not affected: without CBO, Catalyst
 *    estimates them multiplicatively (far over any threshold), so the
 *    static setting can never broadcast a mis-estimated intermediate.
 *
 *  - `adaptive.autoBroadcastJoinThreshold` (runtime, 256m): join outputs
 *    get trustworthy sizes only once their stage materializes; AQE then
 *    converts shuffle joins to broadcast using EXACT shuffle statistics.
 *    256 MB of compressed shuffle output (~1-2 GB hashed) is sized for
 *    multi-GB executors; the payoff is removing the fact-table shuffle
 *    entirely — e.g. TPC-H q3 at sf10: the pruned orders⋈customer side
 *    (~3M rows) broadcasts, and the 60M-row lineitem never shuffles.
 *    Measured same-JVM at sf10: q3 39s -> 8.1s, q5 13.4s -> 3.7s.
 *
 * At 100 TB both sides of the fact joins blow past both thresholds and
 * every plan falls back to the shuffled-hash shapes the queries pin with
 * hints — these settings only ever REMOVE work when runtime evidence says
 * a side fits.
 *
 * `requireAllClusterKeysForCoPartition=false` is the third knob: a join
 * whose sides are ALREADY hash-partitioned on a common subset of
 * corresponding join keys (co-bucketed fact tables joined on the bucket
 * column plus a secondary key — q5_bucketed) is accepted as co-partitioned
 * instead of re-shuffling on the full key set. It never introduces a
 * shuffle; it only skips one when the storage layout already paid for it.
 */
object SessionDefaults {
  val joinTuning: Seq[(String, String)] = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "64m",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "256m",
    "spark.sql.requireAllClusterKeysForCoPartition" -> "false"
  )

  /** Apply the shared tuning to a session builder. */
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    joinTuning.foldLeft(b) { case (acc, (k, v)) => acc.config(k, v) }
}
