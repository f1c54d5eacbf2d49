package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Iterative graph analytics over edge-list DataFrames — the link-structure
 * sibling of [[Dedup.dedupClusters]]'s connected components. Fixed
 * iteration counts and integer nano-rank arithmetic keep every step an
 * order-free integer aggregate, so ranks replicate bit-for-bit on any
 * engine (pinned by the `pagerank_transitions` oracle, which unrolls the
 * same iterations as SQL CTEs).
 *
 * Reference provenance: kamu has no graph surface; PageRank is Page et
 * al. 1999, here in the damped weighted form without dangling-mass
 * redistribution (mass leaks through sinks — the common simplification,
 * cf. Spark GraphX's default `staticPageRank` behavior).
 */
object Graph {

  /**
   * Weighted PageRank, `iterations` fixed rounds, damping d = 85/100.
   * Ranks live on an integer NANO grid: r₀ = 10⁹ ∕ n (floor), and each
   * round r' = (0.15·10⁹) ∕ n + (Σ_in floor(r_src·w ∕ outw_src)) · 85 ∕ 100
   * with every division a FLOOR division — so each round is exact integer
   * arithmetic over exact-in-double products (r·w < 2^53 up to ~9e15
   * rank-weight; widen to per-edge DECIMAL if edge weights ever exceed
   * that). Returns (node, rank_nano) for every node that appears in any
   * edge.
   *
   * Scale shape: out-weights and contributions are edge-keyed aggregates
   * (map-side combined); each round is one src-keyed join + one dst-keyed
   * groupBy over the EDGE list — the rank table (node-sized, usually ≪
   * edges) is the build side, and lineage is cut per round
   * (localCheckpoint) so the plan never grows with the iteration count.
   */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iterations: Int
  ): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = edges.select(
      col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(weightCol).cast("long").as("__w"))
      .localCheckpoint() // edges feed every round; cut the upstream lineage once
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count() // one scalar: node count for the uniform terms
    require(n > 0, "graph has no nodes")
    val outw = e.groupBy(col("__src")).agg(sum(col("__w")).as("__ow"))
    val base = 150000000L / n // floor((1-d)·1e9 / n), exact integer
    var ranks = nodes.withColumn("rank_nano", lit(1000000000L / n))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(outw, Seq("__src"))
        .join(ranks.withColumnRenamed("node", "__src"), Seq("__src"))
        .select(col("__dst"),
          floor(col("rank_nano").cast("double") * col("__w").cast("double") /
            col("__ow").cast("double")).cast("long").as("__c"))
        .groupBy(col("__dst"))
        .agg(sum(col("__c")).as("__cs"))
      ranks = nodes
        .join(contrib.withColumnRenamed("__dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(coalesce(__cs, 0L) * 85L) DIV 100L")).as("rank_nano"))
        .localCheckpoint()
    }
    ranks
  }

  /**
   * Personalized PageRank (PPR): [[pageRank]] with the teleport mass
   * restricted to `seeds` — "importance FROM this vantage point", the
   * recommendation/expansion primitive ("what does a user who starts at
   * 'view' end up near"). Same integer nano grid and floor divisions:
   * r₀ = 10⁹ ∕ s on each of the s seeds (0 elsewhere), and per round
   * r' = [seed]·(0.15·10⁹ ∕ s) + (Σ_in floor(r·w ∕ ow))·85 ∕ 100 — every
   * step exact, so the unrolled-CTE oracle reproduces it bit-for-bit.
   * Seeds absent from the graph are ignored (they could receive no mass).
   *
   * Scale shape: identical to [[pageRank]] — the seed set joins in as a
   * node-sized flag; rounds shuffle the edge list once each.
   */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      seeds: DataFrame,
      seedCol: String,
      iterations: Int
  ): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = edges.select(
      col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(weightCol).cast("long").as("__w"))
      .localCheckpoint()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst")))
      .distinct()
    val seedSet = seeds.select(col(seedCol).as("node")).distinct()
      .join(nodes, Seq("node"), "left_semi")
      .localCheckpoint()
    val s = seedSet.count()
    require(s > 0, "no seed appears in the graph")
    val flagged = nodes
      .join(seedSet.withColumn("__is", lit(1)), Seq("node"), "left")
      .localCheckpoint()
    val outw = e.groupBy(col("__src")).agg(sum(col("__w")).as("__ow"))
    val seedBase = 150000000L / s
    var ranks = flagged.select(col("node"),
      when(col("__is") === 1, lit(1000000000L / s)).otherwise(lit(0L)).as("rank_nano"))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(outw, Seq("__src"))
        .join(ranks.withColumnRenamed("node", "__src"), Seq("__src"))
        .select(col("__dst"),
          floor(col("rank_nano").cast("double") * col("__w").cast("double") /
            col("__ow").cast("double")).cast("long").as("__c"))
        .groupBy(col("__dst"))
        .agg(sum(col("__c")).as("__cs"))
      ranks = flagged
        .join(contrib.withColumnRenamed("__dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (when(col("__is") === 1, lit(seedBase)).otherwise(lit(0L)) +
            expr("(coalesce(__cs, 0L) * 85L) DIV 100L")).as("rank_nano"))
        .localCheckpoint()
    }
    ranks
  }

  /** Markov next-state probabilities from a weighted edge list:
    * p(dst|src) on the integer micro grid (w·10⁶ ∕ out-weight, floor
    * division — exact on any engine). One src-keyed aggregate + one
    * src-keyed join; pairs with [[transitionEdges]] to turn an event
    * stream into a transition MODEL. */
  def transitionProbabilities(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String
  ): DataFrame = {
    val outw = edges
      .groupBy(col(srcCol))
      .agg(sum(col(weightCol).cast("long")).as("__ow"))
    edges
      .join(outw, Seq(srcCol))
      .select(col(srcCol), col(dstCol), col(weightCol).cast("long").as("w"),
        expr(s"(CAST(`$weightCol` AS BIGINT) * 1000000L) DIV __ow").as("p_micro"))
  }

  /**
   * Per-node triangle counts + local clustering coefficient over an
   * UNDIRECTED edge list (rows (a, b), a ≠ b, any orientation/dupes —
   * canonicalized internally): the community-structure primitive behind
   * "how clique-ish is this node's neighborhood". Returns
   * `(node, degree, triangles, clustering_micro)` with clustering =
   * 2·tri·10⁶ ∕ (deg·(deg−1)) on the integer micro grid (floor division;
   * 0 for degree < 2).
   *
   * Algorithm: degree orientation (Schank & Wagner 2005's "forward") —
   * each edge points from its lower-(degree, id) endpoint to the higher,
   * so every triangle is found EXACTLY ONCE as an out-wedge closed by an
   * oriented edge, and per-node wedge work is out-degree², bounded by
   * O(√m) per node regardless of hub skew — the property that makes this
   * survive power-law graphs at 100 TB, where the naive wedge join
   * explodes on hubs.
   *
   * Scale shape: degrees are one aggregate; the wedge self-join and the
   * closing semi-join are edge-keyed hash joins over slim (long, long)
   * pairs; per-node counts come from one explode + groupBy.
   */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint() // feeds degrees, orientation, and the closing probe
    val deg = canon.select(col("a").as("node"))
      .unionByName(canon.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    // orient: lower (degree, id) -> higher (degree, id)
    val withDeg = canon
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("degree", "da"), Seq("a"))
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("degree", "db"), Seq("b"))
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint() // feeds both sides of the wedge self-join
    val wedges = oriented.as("x")
      .join(oriented.as("y"), col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.u").as("apex"), col("x.v").as("p"), col("y.v").as("q"))
    // close against the ID-canonical edge set: p < q by construction, so the
    // probe is a conjunctive equi-join (hash-joinable — an OR over the
    // oriented directions would fall back to a nested loop)
    val closed = wedges.join(
      canon, col("p") === col("a") && col("q") === col("b"), "left_semi")
    val perNode = closed
      .select(explode(array(col("apex"), col("p"), col("q"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    deg
      .join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          expr("(coalesce(triangles, 0L) * 2000000L) DIV (degree * (degree - 1L))"))
          .otherwise(lit(0L)).as("clustering_micro"))
  }

  /**
   * k-core for a fixed k (Seidman 1983): iteratively peel nodes of degree
   * < k until fixpoint — the densest-substructure gate behind community
   * detection and spam-cluster triage. Returns the surviving nodes with
   * their WITHIN-CORE degree (all ≥ k at fixpoint). Deterministic: the
   * peel removes ALL under-k nodes each round, so iteration order cannot
   * change the result (the k-core is unique).
   *
   * Scale shape: per round, one degree aggregate over slim (long, long)
   * edges plus two left-semi prunes — each round's state localCheckpoints
   * so lineage stays flat; rounds are bounded by `maxIter` (peeling depth
   * in practice is far below it — geometric/social graphs converge in a
   * handful of rounds; the entry's oracle unrolls TEN rounds, a bound that
   * must stay at or above the fixture's actual peel depth — the extra
   * rounds are no-ops past the fixpoint, and a maxIter exit before
   * fixpoint throws rather than silently returning a k-core superset).
   * The driver-side loop only moves edge COUNTS, never edges.
   */
  def kCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      maxIter: Int = 30
  ): DataFrame = {
    require(k >= 1 && maxIter >= 1, "need k >= 1 and maxIter >= 1")
    def degrees(e: DataFrame) = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    var canon = edges
      .select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    var n = canon.count()
    var iter = 0
    var done = n == 0L
    while (!done && iter < maxIter) {
      val keep = degrees(canon).filter(col("degree") >= k).select(col("node"))
      val pruned = canon
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint()
      val m = pruned.count()
      done = m == n || m == 0L
      canon = pruned
      n = m
      iter += 1
    }
    // A maxIter exit would return a SUPERSET of the true k-core (the final
    // degree filter would run over a partially peeled edge set) — fail loud
    // rather than silently over-report.
    require(done,
      s"kCore did not reach fixpoint within maxIter=$maxIter peel rounds " +
        s"($n edges still shrinking) — raise maxIter")
    degrees(canon).filter(col("degree") >= k)
  }

  /**
   * Multi-source BFS hop distances over an UNDIRECTED edge list: for
   * every node reachable from `seeds` in at most `maxHops` hops, the
   * minimum hop count — the reachability primitive behind "blast radius
   * of these compromised accounts" / "friends-of-friends candidate
   * pools". `maxHops` is a SEMANTIC bound (distances beyond it are out of
   * scope by contract), so unlike [[kCore]] there is no silent-truncation
   * hazard: the frontier loop early-exits once empty, and extra rounds
   * are no-ops — an oracle unrolling exactly `maxHops` rounds matches.
   * Returns `(node, dist)` including the seeds at dist 0. Deterministic:
   * each round labels the ENTIRE next frontier, so visit order cannot
   * change a distance (BFS layers are unique).
   *
   * Scale shape: per round, one frontier⨝edges hash join (the frontier is
   * node-sized and SHRINKS as layers saturate) plus one anti-join against
   * the visited set — both on slim (long, long) pairs; visited and
   * frontier localCheckpoint per round so lineage stays flat, and the
   * driver loop moves only row COUNTS.
   */
  def bfsDistances(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxHops: Int
  ): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .unionByName(edges.select(
        col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      // clean AFTER symmetrizing so the reversed half cannot re-admit
      // self-loops or null endpoints (null =!= null is null, not true)
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .localCheckpoint() // edges feed every round; cut upstream lineage once
    var frontier = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .localCheckpoint()
    var visited = frontier.withColumn("dist", lit(0L))
    var hop = 0
    var frontierRows = frontier.count()
    while (frontierRows > 0L && hop < maxHops) {
      hop += 1
      val next = sym
        .join(frontier.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .select(col("b").as("node"))
        .distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .localCheckpoint()
      visited = visited
        .unionByName(next.withColumn("dist", lit(hop.toLong)))
        .localCheckpoint()
      frontier = next
      frontierRows = next.count()
    }
    visited
  }

  /**
   * HITS hubs & authorities (Kleinberg, JACM 1999), fixed synchronous
   * rounds on the exact 1e-6 grid: per round, authority ← Σ over
   * in-edges of hub·w, then hub ← Σ over out-edges of the NORMALIZED
   * authority·w, each side L1-normalized so scores sum to ~10⁶.
   * Normalization divides by the PRE-DIVIDED denominator —
   * `s DIV greatest(total DIV 10⁶, 1)` — because `s·10⁶` would overflow
   * 2^63 once Σ hub·w passes 9.2e12 (the same overflow-safe spelling as
   * the per-key Gini); every step is integer, so an unrolled-CTE oracle
   * reproduces it bit-for-bit. Weighted, directed; fixed `rounds` is the
   * deterministic spelling (convergence tests belong to the caller).
   *
   * Scale shape: per round two edge-keyed joins + two keyed sums; the
   * L1 totals join in as broadcast single rows, never driver values.
   */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      rounds: Int
  ): DataFrame = {
    require(rounds >= 1, "need at least one round")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(weightCol).cast("long").as("__w"))
      .filter(col("__w") > 0L)
      .localCheckpoint()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst"))).distinct().localCheckpoint()
    def l1(df: DataFrame, raw: String, out: String): DataFrame = {
      val tot = df.agg(sum(col(raw)).as("__t"))
      df.crossJoin(broadcast(tot))
        .select(col("node"),
          expr(s"$raw DIV greatest(__t DIV 1000000L, 1L)").as(out))
    }
    var hubs = nodes.withColumn("hub_micro", lit(1000000L))
    var auths = nodes.withColumn("auth_micro", lit(0L))
    for (_ <- 1 to rounds) {
      auths = l1(
        e.join(hubs.select(col("node").as("__src"), col("hub_micro")), Seq("__src"))
          .groupBy(col("__dst").as("node"))
          .agg(sum(col("hub_micro") * col("__w")).as("__a")),
        "__a", "auth_micro").localCheckpoint()
      hubs = l1(
        e.join(auths.select(col("node").as("__dst"), col("auth_micro")), Seq("__dst"))
          .groupBy(col("__src").as("node"))
          .agg(sum(col("auth_micro") * col("__w")).as("__h")),
        "__h", "hub_micro").localCheckpoint()
    }
    nodes
      .join(hubs, Seq("node"), "left")
      .join(auths, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub_micro"), lit(0L)).as("hub_micro"),
        coalesce(col("auth_micro"), lit(0L)).as("auth_micro"))
  }

  /**
   * Hop-bounded weighted shortest paths (Bellman–Ford relaxation rounds
   * with a frontier): `dist(v)` = minimum total weight over paths from
   * any seed using AT MOST `maxHops` edges — a SEMANTIC bound, like
   * [[bfsDistances]]' hop cap, so the result is well-defined even on
   * graphs with cycles and needs no convergence proof. Weights must be
   * non-negative longs (put fractional costs on the micro grid). Edges
   * are symmetrized like [[bfsDistances]]; pass each arc once for an
   * undirected graph.
   *
   * Scale shape: per round, one frontier⨝edges hash join (the frontier
   * is only the nodes IMPROVED last round — the standard Bellman–Ford
   * frontier argument keeps ≤k-edge optimality) + one min-per-node
   * aggregate + one join against current distances; all on slim
   * (long, long) rows, localCheckpoint per round, counts only on the
   * driver. Rounds are data-independent (exactly `maxHops` or until a
   * round improves nothing).
   */
  def shortestPaths(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxHops: Int
  ): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"),
        col(weightCol).cast("long").as("w"))
      .unionByName(edges.select(col(dstCol).cast("long").as("a"),
        col(srcCol).cast("long").as("b"), col(weightCol).cast("long").as("w")))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b") && col("w") >= 0L)
      .groupBy(col("a"), col("b")).agg(min(col("w")).as("w")) // parallel arcs: keep cheapest
      .localCheckpoint()
    var dist = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = dist
    var hop = 0
    var frontierRows = frontier.count()
    while (frontierRows > 0L && hop < maxHops) {
      hop += 1
      val cand = sym
        .join(frontier.select(col("node").as("a"), col("dist")), Seq("a"))
        .groupBy(col("b").as("node"))
        .agg(min(col("dist") + col("w")).as("__cand"))
      val improved = cand
        .join(dist, Seq("node"), "left")
        .filter(col("dist").isNull || col("__cand") < col("dist"))
        .select(col("node"), col("__cand").as("dist"))
        .localCheckpoint()
      dist = dist
        .join(improved.select(col("node")), Seq("node"), "left_anti")
        .unionByName(improved)
        .localCheckpoint()
      frontier = improved
      frontierRows = improved.count()
    }
    dist
  }

  /**
   * Synchronous label propagation communities (Raghavan, Albert & Kumara
   * 2007): seed every node with its own id, then for `rounds` rounds
   * every node adopts the most frequent label among its neighbors —
   * ties broken by the SMALLEST label, and all nodes update together
   * from the previous round's labels, so the result is deterministic
   * (asynchronous LPA is order-dependent; the synchronous fixed-round
   * form is the reproducible spelling, and `rounds` bounds the known
   * 2-cycle oscillation of synchronous updates on bipartite-ish
   * structures).
   *
   * Returns `(id, label)` for every node with at least one edge.
   *
   * Scale shape: per round, one edges⨝labels hash join on slim
   * (long, long) pairs + one (node, label)-keyed count (map-side
   * combined) + one argmax-per-node aggregate via `max(struct(cnt,
   * −label))` — a single-pass agg, not a window. Labels localCheckpoint
   * per round so lineage stays flat; nothing but the round counter lives
   * on the driver.
   */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      rounds: Int
  ): DataFrame = {
    require(rounds >= 1, "rounds must be at least 1")
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .unionByName(edges.select(
        col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      labels = sym
        .join(labels.select(col("node").as("b"), col("label")), Seq("b"))
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("__c"))
        // argmax by (count desc, label asc): max over (count, −label) —
        // labels are node ids ≥ 0, so the negation cannot overflow
        .groupBy(col("a").as("node"))
        .agg(max(struct(col("__c"), (-col("label")).as("__nl"))).as("__m"))
        .select(col("node"), (-col("__m.__nl")).as("label"))
        .localCheckpoint()
    }
    labels.select(col("node").as("id"), col("label"))
  }

  /**
   * Transition edge list from an event stream: one weighted edge per
   * observed consecutive (prev state → state) pair within an entity,
   * ordered by (ts, tie). The event-sized work is ONE slim per-entity
   * window + a map-side-combinable pair count; the result is
   * O(states²) — the graph [[pageRank]] then iterates on without ever
   * re-touching the events.
   */
  def transitionEdges(
      events: DataFrame,
      entityCol: String,
      stateCol: String,
      tsCol: String,
      tieCol: String
  ): DataFrame = {
    val order = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(entityCol), col(stateCol), col(tsCol), col(tieCol))
      .withColumn("__prev", lag(col(stateCol), 1).over(order))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("src"), col(stateCol).as("dst"))
      .agg(count(lit(1)).as("w"))
  }
}
