package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Funnel semantics: strictly-after ordering, non-advancing equal
  * timestamps, out-of-order steps, and monotone per-step counts. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("funnel: strictly-ordered steps; equal ts does not advance; order matters") {
    val events = Seq(
      // u1 completes A -> B -> C in order
      (1L, "A", ts(0)), (1L, "B", ts(5)), (1L, "C", ts(9)),
      // u2 has B BEFORE A, and no B after -> stops at A
      (2L, "B", ts(0)), (2L, "A", ts(5)),
      // u3: B at the SAME ts as A -> strict > means not advanced; later B ok
      (3L, "A", ts(2)), (3L, "B", ts(2)), (3L, "B", ts(7)), (3L, "C", ts(8)),
      // u4: A and B but C before B -> stops at B
      (4L, "A", ts(1)), (4L, "C", ts(2)), (4L, "B", ts(3)),
      // u5: never starts
      (5L, "B", ts(1)), (5L, "C", ts(2))
    ).toDF("user_id", "event_type", "ts")

    val full = Analytics.funnel(events, "user_id", "event_type", "ts", Seq("A", "B", "C"))
      .collect().map(r => r.getLong(0) -> ((r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3))))
      .toMap
    assert(full.keySet === Set(1L, 3L))
    assert(full(1L) === ((ts(0), ts(5), ts(9))))
    // u3's B must be the 10:07 one (10:02 is not strictly after A at 10:02)
    assert(full(3L) === ((ts(2), ts(7), ts(8))))

    val counts = Analytics.funnelCounts(events, "user_id", "event_type", "ts", Seq("A", "B", "C"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(counts === Map(1 -> 4L, 2 -> 3L, 3 -> 2L)) // monotone: A=4, A->B=3, A->B->C=2
  }
}
