package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact 2-D skyline (pareto frontier) — the classic OLAP operator
 * (Börzsönyi, Kossmann & Stocker, ICDE 2001) Spark has no builtin for.
 * Both dimensions are MINIMIZED: a row survives iff no other row is ≤ in
 * both coordinates and strictly < in at least one (ties on BOTH
 * coordinates survive together — neither dominates).
 *
 * Spark-first shape, not block-nested-loops: only the per-x minimum of y
 * can be on the frontier, so the frontier test reduces to (1) one keyed
 * aggregate to the per-x minima — the only input-sized shuffle — and
 * (2) an EXCLUSIVE prefix-min of those minima in x order: a row is
 * dominated by a smaller x iff that prefix-min is ≤ its y. The distinct-x
 * frame the prefix runs over is bounded by the x cardinality, not the
 * input; grouped skylines window per group, and the ungrouped global
 * prefix uses the range-partition + per-partition-window + cumulative
 * offset spelling (the zipWithIndex shape — no single-partition window,
 * same discipline as Dedup.withGlobalRank).
 */
object Skyline {

  /**
   * Rows of `df` on the (xCol, yCol)-minimizing pareto frontier, with all
   * original columns, optionally per group. Null coordinates are treated
   * as incomparable and dropped.
   *
   * UNGROUPED inputs with plainly-Comparable coordinate types first pass
   * through [[localFrontier]] (the two-phase shape — round-16 sf10 A/B:
   * 2.67 s → 0.83 s on 15M orders): the per-partition staircase prunes
   * the base in ONE map-only scan, and the exact algorithm below then
   * runs over survivor-sized data, so its frontier semi-join never
   * re-reads the full input. GROUPED inputs stay on the exact path: the
   * same A/B ran NEGATIVE there (sf10 parts ×25 brands: exact 0.65 s vs
   * two-phase 1.43 s) — per-group staircases pay the external-row
   * conversion on every input row but prune little when each group's
   * x-axis is small, while the exact path's codegen'd partial aggregate
   * already collapses the input before any shuffle.
   */
  def skyline2d(
      df: DataFrame,
      xCol: String,
      yCol: String,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    // resolve the coordinate fields with the session resolver (default
    // case-INsensitive, like col() does), not an exact StructType lookup —
    // a case-mismatched name must route, not throw before either path;
    // localFrontier gets the CANONICAL names (it looks fields up exactly)
    def fieldOf(name: String) =
      df.schema.fields.find(f =>
        df.sparkSession.sessionState.analyzer.resolver(f.name, name))
    (fieldOf(xCol), fieldOf(yCol)) match {
      case (Some(xf), Some(yf))
          if groupCols.isEmpty && comparableType(xf.dataType) &&
            comparableType(yf.dataType) =>
        skylineExact(
          localFrontier(df, xf.name, yf.name, Nil), xf.name, yf.name, Nil)
      case _ => skylineExact(df, xCol, yCol, groupCols)
    }
  }

  /** Can [[localFrontier]] order this type's EXTERNAL (Row) values
    * exactly as Spark SQL does? True for every orderable atomic type
    * (numbers, decimal, string, boolean, date/timestamp/ntz) — see
    * [[sqlOrdering]] for the two cases needing more than plain
    * `Comparable` — while binary (byte[]) is atomic but not Comparable,
    * so the local staircase cannot prune it and the exact path runs
    * alone. */
  private def comparableType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case BinaryType => false // byte[] is not Comparable
      case _: NumericType | StringType | BooleanType | DateType |
          TimestampType | TimestampNTZType => true
      case _ => false
    }
  }

  /** A comparator over a column's external values whose order MATCHES
    * SPARK SQL's — plain `Comparable.compareTo` is not enough twice:
    * floats/doubles must treat -0.0 and 0.0 as EQUAL (SQL normalizes
    * them; `Double.compareTo` orders -0.0 < 0.0, which would let the
    * staircase drop a row the exact algorithm keeps as a tie — NaN is
    * largest and self-equal on both sides already), and strings must
    * compare in UTF-8 BYTE order (Java's UTF-16 code-unit order
    * disagrees on supplementary characters). */
  private def sqlOrdering(
      dt: org.apache.spark.sql.types.DataType): (Any, Any) => Int = {
    import org.apache.spark.sql.types._
    dt match {
      case DoubleType =>
        (a, b) => {
          def n(v: Any) = { val d = v.asInstanceOf[Double]; if (d == 0.0d) 0.0d else d }
          java.lang.Double.compare(n(a), n(b))
        }
      case FloatType =>
        (a, b) => {
          def n(v: Any) = { val f = v.asInstanceOf[Float]; if (f == 0.0f) 0.0f else f }
          java.lang.Float.compare(n(a), n(b))
        }
      case StringType =>
        (a, b) =>
          org.apache.spark.unsafe.types.UTF8String.fromString(a.asInstanceOf[String])
            .compareTo(
              org.apache.spark.unsafe.types.UTF8String.fromString(b.asInstanceOf[String]))
      case _ => (a, b) => a.asInstanceOf[Comparable[Any]].compareTo(b)
    }
  }

  /** The exact frontier algorithm (any input, optional groups);
    * `private[graft]` as the A/B seam for the two-phase routing. */
  private[graft] def skylineExact(
      df: DataFrame,
      xCol: String,
      yCol: String,
      groupCols: Seq[String]
  ): DataFrame = {
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val gcols = groupCols.map(col)
    // (1) only the min-y row(s) per x can survive: one keyed shuffle
    val perX = base
      .groupBy((gcols :+ col(xCol)): _*)
      .agg(min(col(yCol)).as("__gy"))
    // (2) exclusive prefix-min over x ascending — ≤ means dominated
    // (strictly smaller x, y no larger)
    var frontierBounded = false
    val withPm =
      if (groupCols.nonEmpty) {
        val w = Window.partitionBy(gcols: _*).orderBy(col(xCol))
          .rowsBetween(Window.unboundedPreceding, -1)
        perX.withColumn("__pm", min(col("__gy")).over(w))
      } else {
        // Adaptive by MEASURED x-cardinality: the aggregate collapses the
        // input to one row per distinct x, and checkpointing it lets one
        // cheap count choose the prefix spelling. A calendar/SKU-sized
        // axis (≤ 64·P rows) takes the plain bounded window — the
        // range-partition machinery costs 3 extra jobs (range sample,
        // offsets fold, broadcast join) that dwarf a few-thousand-row
        // sort (sf10 orders: 2406 distinct days). A
        // genuinely data-sized axis rides [[Ranks.prefixMinGlobal]]
        // exactly as before.
        val ckpt = perX.localCheckpoint()
        val p = ckpt.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        if (ckpt.count() <= math.max(4096L, 64L * p)) {
          frontierBounded = true
          val w = Window.orderBy(col(xCol))
            .rowsBetween(Window.unboundedPreceding, -1)
          ckpt.withColumn("__pm", min(col("__gy")).over(w))
        } else prefixMinGlobal(ckpt, col(xCol), "__gy", "__pm")
      }
    // fresh column names on the frontier side — it descends from `base`,
    // and Spark's ambiguous-self-join detection rejects shared lineage
    val frontier = withPm
      .filter(col("__pm").isNull || col("__pm") > col("__gy"))
      .select(
        (groupCols.zipWithIndex.map { case (g, i) => col(g).as(s"__sk_g$i") } :+
          col(xCol).as("__sk_x") :+ col("__gy").as("__sk_y")): _*)
    // join frontier keys back: keeps every tie on (x, min-y), drops the
    // same-x rows with larger y (dominated within their x). When the
    // x-axis was MEASURED bounded, broadcast explicitly: the frontier
    // descends from a checkpoint (no stats), and without the hint the
    // planner intermittently sort-merges the full input against a few
    // hundred frontier rows — the 12 s spike in the sf10 probe.
    base.join(
      if (frontierBounded) broadcast(frontier) else frontier,
      base(xCol) === frontier("__sk_x") &&
        base(yCol) === frontier("__sk_y") &&
        groupCols.zipWithIndex.map { case (g, i) => base(g) === frontier(s"__sk_g$i") }
          .foldLeft(lit(true))(_ && _),
      "leftsemi")
  }

  /**
   * Explicit two-phase entry point: [[localFrontier]] then the exact
   * algorithm — what ungrouped [[skyline2d]] does automatically for
   * Comparable coordinate types; exposed for callers that want the
   * two-phase plan unconditionally (and for the equivalence specs).
   */
  def skyline2dTwoPhase(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    require(comparableType(df.schema(xCol).dataType) &&
      comparableType(df.schema(yCol).dataType),
      s"skyline2dTwoPhase needs plainly-Comparable coordinate types, got " +
        s"(${df.schema(xCol).dataType}, ${df.schema(yCol).dataType}) — " +
        s"use skyline2d, whose exact path handles any orderable type")
    skylineExact(localFrontier(df, xCol, yCol, Nil), xCol, yCol, Nil)
  }

  /**
   * Phase 1 of the two-phase skyline: stream each partition ONCE through
   * an in-memory staircase (the classic 2-D frontier structure: x-sorted
   * TreeMap with y strictly decreasing, O(log F) per row) and emit only
   * that partition's local frontier — a row undominated globally is
   * undominated within its partition, so the union of local frontiers
   * contains the exact answer. ONE map-only base scan, rows out, no
   * input-sized shuffle at all — downstream is survivor-sized.
   *
   * A slim-projection variant (staircase only (x, y), emit surviving
   * pairs, semi-join the originals back) was A/B'd in round 17 to cut
   * the per-row external-Row conversion, and lost at EVERY width — even
   * a 9-column frame ran rows 1.69 s vs slim 3.92 s at sf10 (narrow:
   * 1.12 s vs 4.21 s): the second scan + join dominates whatever the
   * conversion saves. Negative recorded in BASELINE.md; this single-pass
   * spelling is unconditional.
   *
   * Ties on both coordinates survive together (the staircase buffers
   * every row of a frontier (x, y) point). Null coordinates are dropped,
   * matching [[skyline2d]].
   *
   * Memory: the staircase holds one partition's frontier CANDIDATES —
   * expected O(√n) for independent dimensions, worst-case the whole
   * partition for perfectly anti-correlated data (every row on the
   * frontier — no algorithm emits less than its output). Partition
   * sizes are already executor-memory-bounded by
   * `spark.sql.files.maxPartitionBytes`.
   */
  private[graft] def localFrontier(
      df: DataFrame,
      xCol: String,
      yCol: String,
      groupCols: Seq[String]
  ): DataFrame = {
    require(groupCols.isEmpty,
      "localFrontier is ungrouped-only — the grouped two-phase A/B ran " +
        "negative (see skyline2d's doc); grouped skylines take the exact path")
    val xi = df.schema.fieldIndex(xCol)
    val yi = df.schema.fieldIndex(yCol)
    val cmpX = sqlOrdering(df.schema(xCol).dataType)
    val cmpY = sqlOrdering(df.schema(yCol).dataType)
    df.mapPartitions { it =>
      val stairs = new java.util.TreeMap[Any, (Any, scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row])](
        new java.util.Comparator[Any] { def compare(a: Any, b: Any): Int = cmpX(a, b) })
      it.foreach { row =>
        if (!row.isNullAt(xi) && !row.isNullAt(yi)) {
          val x = row.get(xi); val y = row.get(yi)
          // best candidate dominator is the floor point (greatest x' ≤ x):
          // the staircase's y decreases in x, so smaller x' have larger y'
          val fl = stairs.floorEntry(x)
          val dominated = fl != null && {
            val cy = cmpY(fl.getValue._1, y)
            if (cmpX(fl.getKey, x) < 0) cy <= 0 else cy < 0
          }
          if (!dominated) {
            val cur = stairs.get(x)
            if (cur != null && cmpY(cur._1, y) == 0) cur._2 += row // (x,y) tie
            else stairs.put(x,
              (y, scala.collection.mutable.ArrayBuffer(row))) // new/lower y
            // evict now-dominated points: strictly larger x with y' ≥ y
            var hi = stairs.higherEntry(x)
            while (hi != null && cmpY(hi.getValue._1, y) >= 0) {
              stairs.remove(hi.getKey)
              hi = stairs.higherEntry(x)
            }
          }
        }
      }
      scala.jdk.CollectionConverters.CollectionHasAsScala(stairs.values)
        .asScala.iterator.flatMap(_._2)
    }(org.apache.spark.sql.Encoders.row(df.schema))
  }

  /** Materialize the frontier of `df` as managed table `table` — seed
    * state for [[appendToSkyline]]. */
  def materializeSkyline(
      df: DataFrame,
      xCol: String,
      yCol: String,
      table: String,
      groupCols: Seq[String] = Nil
  ): Unit =
    Bucketing.materializePlain(skyline2d(df, xCol, yCol, groupCols), table)

  /**
   * Fold an insert batch into a maintained frontier:
   * `skyline(A ∪ B) = skyline(skyline(A) ∪ B)` — a frontier point of the
   * union is undominated within A alone, so it already lives in the
   * stored frontier — which makes each tick O(frontier + batch), never a
   * rescan of history. GUARD-FREE replay safety: once a batch is
   * absorbed, re-folding it is the identity (`skyline(S ∪ B) = S`), so
   * replays need no batch ledger — the same idempotence class as the
   * HLL/Bloom appends. Rows must carry an identity column (any unique
   * key): the union dedupes by FULL ROW, so a replayed row (identical
   * including its id) collapses while genuine coordinate twins (distinct
   * ids, both legitimately on the frontier) survive. The frontier
   * rewrite rides [[Bucketing.swapInPlain]] (staircase-sized, staged
   * into `_swap_tmp` then swapped), so a driver crash at ANY point
   * leaves either the old or the new frontier — never neither.
   */
  def appendToSkyline(
      batch: DataFrame,
      xCol: String,
      yCol: String,
      table: String,
      groupCols: Seq[String] = Nil
  ): Unit = {
    val spark = batch.sparkSession
    Bucketing.recoverSwap(spark, table)
    val stored = spark.table(table)
    val merged = skyline2d(
      stored.unionByName(batch.select(stored.columns.map(col).toSeq: _*))
        .distinct(),
      xCol, yCol, groupCols)
    Bucketing.swapInPlain(merged, table)
  }

  /** Moved to the shared [[Ranks.prefixMaxInclusiveGlobal]]; alias kept
    * for the historic call sites and specs. */
  private[graft] def prefixMaxInclusiveGlobal(
      df: DataFrame,
      orderCol: Column,
      vCol: String,
      outCol: String
  ): DataFrame = Ranks.prefixMaxInclusiveGlobal(df, orderCol, vCol, outCol)

  /** Moved to the shared [[Ranks.prefixMinGlobal]]; alias kept for the
    * historic call sites and specs. */
  private[graft] def prefixMinGlobal(
      df: DataFrame,
      orderCol: Column,
      vCol: String,
      outCol: String
  ): DataFrame = Ranks.prefixMinGlobal(df, orderCol, vCol, outCol)
}
