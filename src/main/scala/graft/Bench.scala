package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
 * emits ONE JSON line. The line is printed to stdout AND written to
 * `bench.json` (or SPARK_GRAFT_BENCH_OUT) so the driver can parse it even if
 * Spark log lines interleave with stdout. A failing query reports its error
 * in an "errors" map instead of silently contributing -1.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Optional comma-separated subset (e.g. the 15 classics at an alternate
    // scale factor) — everything else about the harness stays identical.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    val builder = SessionDefaults.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Shuffle/spill scratch on tmpfs — the local-mode analog of a
      // cluster's NVMe spark.local.dir; /tmp on this host is spinning ext4.
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      // Coalesce post-shuffle partitions to size, not to parallelism: tiny
      // stages collapse to 1-2 tasks (A/B: 8.18s -> 6.43s over the 15
      // classics at sf0.1) while the 8 MiB advisory keeps mid-size shuffles
      // wide enough to feed all 32 threads (sf10 within noise both ways).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    // Optional extra session confs for tuning experiments, e.g.
    // SPARK_GRAFT_CONF="spark.sql.adaptive.coalescePartitions.parallelismFirst=false;..."
    // (';'-separated k=v pairs; values may contain '=' but not ';').
    val spark = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";").toSeq).filter(_.indexOf('=') > 0)
      .foldLeft(builder) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // JIT/codegen warmup: run every query once at the smallest scale factor
    // so the timed runs below measure steady-state per-query cost, not the
    // one-time interpreter/JIT warmup of each expression shape (worth 3-6 s
    // on the first higher-order-function-heavy query in a fresh JVM).
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    // Additional FULL-SCALE warm pass for the interpreted higher-order-
    // function-heavy shapes (portable MinHash, quality scoring, n-gram
    // Jaccard): their one-time C2 compilation triggers only at full-scale
    // row counts — measured 28 s first vs 2.7 s second for the identical
    // MinHash plan — and the sf0.001 pass above provably does not reach it.
    // Without this, a single noisy host run can record a 10x phantom.
    Seq("dedup_minhash", "corpus_filter", "ngram_jaccard").foreach { n =>
      selected.get(n).foreach { fn =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    }
    // Several operators persist() intermediates (e.g. MinHash signatures);
    // across ~70 independent queries those cached blocks accumulate and turn
    // the tail of the run into a GC grind. Each query is independent — drop
    // the cache between them so every timing sees the same clean heap.
    spark.catalog.clearCache()

    // Two timed runs per query, report the faster: the first execution of a
    // higher-order-function-heavy shape at full scale can pay tens of
    // seconds of one-time C2 compilation of interpreted-eval paths that the
    // small-sf warmup never triggers (measured: 28 s first vs 2.7 s second
    // for the identical MinHash plan). Steady-state is what the baseline
    // table records; cold-start is a JVM property, not an operator property.
    var errors = Map.empty[String, String]
    var sinceGc = 0
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Periodic driver GC: localCheckpoint and broadcast blocks from
      // finished entries are only freed when the ContextCleaner sees
      // their references die — which needs a driver GC. Without it a
      // ~300-entry run accumulates storage until the TAIL grinds
      // (measured: profile_table 2.3 s fresh vs 5.1 s late in the full
      // run, pull_recursive 0.07 vs 2.6). Every 40 entries costs ~10
      // full GCs per run — noise-level — and keeps the tail honest.
      sinceGc += 1
      if (sinceGc >= 40) { sinceGc = 0; System.gc() }
      // Executed-run count tracked explicitly (not inferred from the error
      // map): an entry that succeeds on run 1 and fails on run 2 really ran
      // twice, and the record should say so.
      var executed = 0
      def once(): Double = {
        executed += 1
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch {
          case e: Throwable =>
            errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      val t1 = once()
      val t2 = if (errors.contains(name)) t1 else once()
      // Disagreeing runs mean one absorbed host noise or a one-time JIT —
      // take a tie-breaking third run and report the min. The tolerance
      // scales with entry weight: entries over a second get a third run at
      // 1.5x disagreement (they dominate the total and their flags have
      // cost the last three rounds a re-adjudication each), sub-second
      // entries at 3x (their absolute jitter is cheap to re-run but cheap
      // to ignore too).
      val ratio = if (math.min(t1, t2) > 1.0) 1.5 else 3.0
      val t3 =
        if (!errors.contains(name) && math.max(t1, t2) > ratio * math.min(t1, t2)) once()
        else Double.MaxValue
      name -> (Seq(t1, t2, t3).min, executed)
    }

    def q(s: String): String = "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
    val qs = results.map { case (k, (v, _)) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val runsJson = results.map { case (k, (_, r)) => s"${q(k)}:$r" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runsJson,"errors":$errs,"sf":${q(sfDir)}}"""

    // A subset run must never overwrite the committed full-run record with
    // a partial one of identical shape.
    val defaultOut = if (only.isDefined) "bench_partial.json" else "bench.json"
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    Files.writeString(Paths.get(out), line + "\n")
    // ALSO keep a per-core-count copy: the driver runs the bench twice (32
    // then 8 cores) with no SPARK_GRAFT_BENCH_OUT, and the second run used
    // to overwrite the first's per-query record in `bench.json` (r17
    // VERDICT item 2). The suffixed file preserves each run's map.
    val sideOut = out.replaceAll("\\.json$", "") + s"_c$cpus.json"
    if (sideOut != out) Files.writeString(Paths.get(sideOut), line + "\n")
    spark.stop()
    // Print last, after the session is down, so no executor log line trails it.
    println(line)
    // Compact trailer, guaranteed parseable from a bounded stdout tail: the
    // full line above is ~16 KB for 312 entries, and a capture that keeps
    // only the last few KB lands mid-map (every driver record r13-r17 shows
    // `parsed: null` for exactly this reason). This final line carries the
    // totals and points at the per-query file; it must stay tiny.
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},""" +
        s""""n_errors":${errors.size},"cpus":$cpus,"sf":${q(sfDir)},"per_query_file":${q(out)}}"""
    require(compact.length < 2000, s"compact bench trailer must stay tail-parseable, got ${compact.length} bytes")
    println(compact)
    if (errors.nonEmpty) System.err.println(s"[bench] ${errors.size} queries failed: ${errors.keys.mkString(", ")}")
  }
}
