package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** PageRank: integer nano-rank arithmetic on hand-computed graphs
  * (uniform-cycle fixed point, sink absorption), and transition-edge
  * extraction ordering. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: uniform cycle is an exact integer fixed point") {
    // a -> b -> c -> a, unit weights: r = 10^9/3 = 333333333 is stable
    // (50000000 + (333333333*85)//100 = 333333333 exactly).
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L)).toDF("src", "dst", "w")
    val out = Graph.pageRank(edges, "src", "dst", "w", iterations = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 333333333L, "b" -> 333333333L, "c" -> 333333333L))
  }

  test("pageRank: source/sink pair matches the hand-unrolled integer recurrence") {
    val edges = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val r1 = Graph.pageRank(edges, "src", "dst", "w", iterations = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n=2: r0 = 500000000; base = 75000000
    assert(r1 === Map("a" -> 75000000L, "b" -> (75000000L + 500000000L * 85L / 100L)))
    val r2 = Graph.pageRank(edges, "src", "dst", "w", iterations = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r2 === Map("a" -> 75000000L, "b" -> (75000000L + 75000000L * 85L / 100L)))
  }

  test("pageRank: weights split a node's rank proportionally (floor per edge)") {
    // a -> b (3), a -> c (1): contributions floor(r*3/4), floor(r*1/4)
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L)).toDF("src", "dst", "w")
    val out = Graph.pageRank(edges, "src", "dst", "w", iterations = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r0 = 1000000000L / 3
    val base = 150000000L / 3
    assert(out("b") === base + math.floor(r0.toDouble * 3.0 / 4.0).toLong * 85L / 100L)
    assert(out("c") === base + math.floor(r0.toDouble * 1.0 / 4.0).toLong * 85L / 100L)
    assert(out("a") === base)
  }

  test("transitionProbabilities: exact micro-grid floor division per source") {
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 2L)).toDF("src", "dst", "w")
    val out = Graph.transitionProbabilities(edges, "src", "dst", "w")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(out === Map(
      ("a", "b") -> 750000L, ("a", "c") -> 250000L, ("b", "a") -> 1000000L))
  }

  test("triangleCounts: K4-minus-an-edge by hand; duplicate/reversed edges canonicalize") {
    // K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4}
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (2L, 1L), (3L, 1L) // reversed duplicates must collapse
    ).toDF("id1", "id2")
    val out = Graph.triangleCounts(edges, "id1", "id2")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      1L -> ((3L, 2L, 666666L)), // 2·2·1e6 / (3·2), floored
      2L -> ((3L, 2L, 666666L)),
      3L -> ((2L, 1L, 1000000L)),
      4L -> ((2L, 1L, 1000000L))))
    // full K4: every node in 3 triangles, clustering exactly 1
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("id1", "id2")
    val full = Graph.triangleCounts(k4, "id1", "id2")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(full === Map(
      1L -> ((3L, 1000000L)), 2L -> ((3L, 1000000L)),
      3L -> ((3L, 1000000L)), 4L -> ((3L, 1000000L))))
  }

  test("kCore: cascading peel to fixpoint; within-core degrees; empty core; k=1 drops isolates only") {
    // triangle {1,2,3} + a tail 3-4-5: peeling k=2 removes 5, THEN 4
    // (cascade), leaving the triangle with within-core degree 2 each
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("id1", "id2")
    val core2 = Graph.kCore(edges, "id1", "id2", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // no 3-core in this graph
    assert(Graph.kCore(edges, "id1", "id2", k = 3).count() === 0L)
    // k=1 keeps every non-isolated node; reversed duplicates canonicalize
    val dup = Seq((1L, 2L), (2L, 1L)).toDF("id1", "id2")
    val core1 = Graph.kCore(dup, "id1", "id2", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core1 === Map(1L -> 1L, 2L -> 1L))
  }

  test("personalizedPageRank: teleport pinned to seeds; hand-unrolled two-node chain") {
    // a -> b (weight 1). Seed {a}: r0 = (1e9, 0).
    // round 1: a gets base 15e7; b gets floor(1e9*1)*85/100 = 85e7.
    // round 2: a = 15e7; b = (15e7 * 85) DIV 100 = 1275e5.
    val edges = Seq(("a", "b", 1L)).toDF("s", "d", "w")
    val out = Graph.personalizedPageRank(edges, "s", "d", "w",
      Seq("a").toDF("seed"), "seed", iterations = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 150000000L, "b" -> 127500000L))
    // a seed absent from the graph is ignored; all-absent seeds throw
    val out2 = Graph.personalizedPageRank(edges, "s", "d", "w",
      Seq("a", "zz").toDF("seed"), "seed", iterations = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out2("a") === 150000000L)
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, "s", "d", "w",
        Seq("zz").toDF("seed"), "seed", iterations = 1)
    }
  }

  test("bfsDistances: layered min-hops, multi-source min, hop cap, isolated seed at 0") {
    // path 1-2-3-4-5, disconnected pair 10-11; edges in mixed orientation
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L), (10L, 11L)).toDF("s", "d")
    def run(seeds: Seq[Long], hops: Int) =
      Graph.bfsDistances(edges, "s", "d", seeds.toDF("id"), "id", hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // single source, cap 3: node 5 (dist 4) and the 10-11 island unreached
    assert(run(Seq(1L), 3) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // multi-source: distances are the min over seeds
    assert(run(Seq(1L, 5L), 3) ===
      Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
    // a seed with no incident edges still reports dist 0
    assert(run(Seq(20L), 2) === Map(20L -> 0L))
    // maxHops 0: seeds only
    assert(run(Seq(1L), 0) === Map(1L -> 0L))
  }

  test("transitionEdges: per-entity consecutive pairs, tie-broken, cross-entity isolated") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      (1L, 10L, ts(0), "A"), (1L, 11L, ts(1), "B"), (1L, 12L, ts(2), "A"),
      (1L, 13L, ts(2), "C"), // same ts as event 12: order by event_id -> A->C
      (2L, 20L, ts(0), "A"), (2L, 21L, ts(5), "B")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Graph.transitionEdges(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("A", "B") -> 2L, // u1 and u2
      ("B", "A") -> 1L,
      ("A", "C") -> 1L)) // the tie resolved by event_id
  }
  test("labelPropagation: matches a brute-force synchronous reference; cliques collapse") {
    // brute-force synchronous LPA
    def brute(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
      val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        .filter(p => p._1 != p._2).distinct
      val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
      for (_ <- 1 to rounds) {
        lab = adj.map { case (n, nbrs) =>
          val freq = nbrs.groupBy(lab).map { case (l, xs) => (l, xs.size) }
          n -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
      lab
    }
    val rnd = new scala.util.Random(5)
    val edges = (1 to 300).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2).distinct
    for (rounds <- Seq(1, 2, 3)) {
      val got = Graph.labelPropagation(
        edges.toDF("s", "d"), "s", "d", rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === brute(edges, rounds), s"rounds=$rounds")
    }
    // two disjoint triangles: everyone adopts the clique minimum by round 2
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (12L, 10L))
    val out = Graph.labelPropagation(tri.toDF("s", "d"), "s", "d", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(out(1L), out(2L), out(3L)).size === 1)
    assert(Set(out(10L), out(11L), out(12L)).size === 1)
    assert(out(1L) != out(10L))
  }
  test("shortestPaths: matches brute-force hop-bounded Bellman-Ford") {
    def brute(edges: Seq[(Long, Long, Long)], seeds: Set[Long], k: Int): Map[Long, Long] = {
      val sym = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
        .filter(e => e._1 != e._2)
      var dist: Map[Long, Long] = seeds.map(_ -> 0L).toMap
      for (_ <- 1 to k) {
        val offers = sym.flatMap { case (a, b, w) => dist.get(a).map(d => b -> (d + w)) }
        val best = offers.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).min }
        dist = (dist.keySet ++ best.keySet).map { n =>
          n -> math.min(dist.getOrElse(n, Long.MaxValue), best.getOrElse(n, Long.MaxValue))
        }.toMap
      }
      dist
    }
    val rnd = new scala.util.Random(17)
    val edges = (1 to 400).map(_ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong, rnd.nextInt(50).toLong + 1))
      .filter(e => e._1 != e._2)
    val seeds = Set(0L, 7L, 40L)
    for (k <- Seq(0, 1, 3)) {
      val got = Graph.shortestPaths(
        edges.toDF("s", "d", "w"), "s", "d", "w",
        seeds.toSeq.toDF("id"), "id", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === brute(edges, seeds, k), s"k=$k")
    }
  }
  test("hits: matches brute-force integer recurrence; star topology ranks hub center first") {
    def brute(edges: Seq[(Long, Long, Long)], rounds: Int): Map[Long, (Long, Long)] = {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      def l1(m: Map[Long, Long]): Map[Long, Long] = {
        val t = m.values.sum
        m.map { case (k, v) => k -> v / math.max(t / 1000000L, 1L) }
      }
      var hub: Map[Long, Long] = nodes.map(_ -> 1000000L).toMap
      var auth: Map[Long, Long] = nodes.map(_ -> 0L).toMap
      for (_ <- 1 to rounds) {
        auth = l1(edges.groupBy(_._2).map { case (d, es) =>
          d -> es.map(e => hub(e._1) * e._3).sum })
        hub = l1(edges.groupBy(_._1).map { case (sn, es) =>
          sn -> es.map(e => auth.getOrElse(e._2, 0L) * e._3).sum })
      }
      nodes.map(n => n -> ((hub.getOrElse(n, 0L), auth.getOrElse(n, 0L)))).toMap
    }
    val rnd = new scala.util.Random(41)
    val edges = (1 to 200).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong, rnd.nextInt(9).toLong + 1))
      .filter(e => e._1 != e._2).distinct
    for (rounds <- Seq(1, 2)) {
      val got = Graph.hits(edges.toDF("s", "d", "w"), "s", "d", "w", rounds)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got === brute(edges, rounds), s"rounds=$rounds")
    }
    // star: 0 -> 1..5; node 0 is the hub, spokes are authorities
    val star = (1L to 5L).map(i => (0L, i, 1L))
    val out = Graph.hits(star.toDF("s", "d", "w"), "s", "d", "w", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L)._1 > 0L && out(0L)._2 === 0L)
    (1L to 5L).foreach(i => assert(out(i)._1 === 0L && out(i)._2 > 0L))
  }
}
