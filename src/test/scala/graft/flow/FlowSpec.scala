package graft.flow

import java.nio.file.Files

import graft.SparkSpec
import graft.dataset.Dataset
import graft.flow.FlowService._
import graft.ingest.IngestWriter
import graft.model.MergeConf
import graft.model.MetadataEvent.{FetchConf, SetPollingSource, SqlStep}
import graft.transform.TransformService

/** Flow-lite schedules: cron/interval parsing, due logic, and the
  * run-due-now executor pulling exactly the due datasets (fake clock). */
class FlowSpec extends SparkSpec {

  private def t(iso: String): Long = java.time.Instant.parse(iso).toEpochMilli

  test("interval schedules: parse, render, due") {
    val s = parseSchedule("every 15m")
    assert(s === Every(900000L) && s.render === "every 15m")
    assert(parseSchedule("every 2h") === Every(7200000L))
    assert(parseSchedule("every 1d").render === "every 1d")
    assert(due(s, None, t("2024-01-01T00:00:00Z"))) // never ran -> due
    assert(!due(s, Some(t("2024-01-01T00:00:00Z")), t("2024-01-01T00:14:59Z")))
    assert(due(s, Some(t("2024-01-01T00:00:00Z")), t("2024-01-01T00:15:00Z")))
    intercept[IllegalArgumentException](parseSchedule("every fortnight"))
  }

  test("cron schedules: nextAfter on minutes, hours, dow, steps, lists") {
    val daily9 = Cron("0 9 * * *")
    assert(daily9.nextAfter(t("2024-01-01T08:59:00Z")) === t("2024-01-01T09:00:00Z"))
    assert(daily9.nextAfter(t("2024-01-01T09:00:00Z")) === t("2024-01-02T09:00:00Z"))
    // Mondays at 06:30 (2024-01-01 is a Monday)
    val mon = Cron("30 6 * * 1")
    assert(mon.nextAfter(t("2024-01-01T06:30:00Z")) === t("2024-01-08T06:30:00Z"))
    // every 20 minutes via step
    val step = Cron("*/20 * * * *")
    assert(step.nextAfter(t("2024-01-01T00:00:00Z")) === t("2024-01-01T00:20:00Z"))
    assert(step.nextAfter(t("2024-01-01T00:20:00Z")) === t("2024-01-01T00:40:00Z"))
    assert(step.nextAfter(t("2024-01-01T00:59:00Z")) === t("2024-01-01T01:00:00Z"))
    // lists and ranges
    val lst = Cron("0 0,12 1-15 * *")
    assert(lst.nextAfter(t("2024-01-15T12:00:00Z")) === t("2024-02-01T00:00:00Z"))
    intercept[IllegalArgumentException](parseSchedule("61 * * * *"))
    intercept[IllegalArgumentException](parseSchedule("* * *"))
  }

  test("run-due-now executor pulls only due datasets and cascades dependencies") {
    val root = Files.createTempDirectory("graft-flow-")
    java.nio.file.Files.writeString(root.resolve("c-2024-01-01.csv"), "city,pop\nnola,364000\n")
    val cities = Dataset.create(spark, root.resolve("cities"), "cities")
    cities.chain.append(
      SetPollingSource(readFormat = "csv", schemaDdl = Some("city STRING, pop INT"),
        merge = MergeConf("ledger", primaryKey = Seq("city")),
        fetch = Some(FetchConf(kind = "filesGlob",
          glob = Some(root.resolve("c-*.csv").toString),
          eventTimeRegex = Some("c-(\\d{4}-\\d{2}-\\d{2})\\.csv")))), 0L)
    val big = Dataset.create(spark, root.resolve("cities_big"), "cities_big", kind = "derivative")
    TransformService.setTransform(big, Seq("cities"),
      Seq(SqlStep(None, "SELECT op, event_time, city, pop * 2 AS pop FROM cities")), 0L)

    val reg = new Registry(
      new org.apache.hadoop.fs.Path(root.toUri), spark.sparkContext.hadoopConfiguration)
    reg.set("cities_big", parseSchedule("every 1h"))
    val byName = Map("cities" -> root.resolve("cities"), "cities_big" -> root.resolve("cities_big"))
    val resolve = (n: String) => Dataset.open(spark, byName(n))

    // tick 1: never ran -> due; the derivative's pull cascades to the root
    val r1 = runDue(spark, reg, resolve, t("2024-01-02T00:00:00Z"))
    assert(r1 === Seq("cities_big" -> Pulled))
    assert(Dataset.open(spark, byName("cities")).chain.lastOffset() === Some(0L))
    assert(Dataset.open(spark, byName("cities_big")).chain.lastOffset() === Some(0L))

    // tick 2 within the hour: not due, nothing pulled
    java.nio.file.Files.writeString(root.resolve("c-2024-01-02.csv"), "city,pop\nkyiv,2884000\n")
    val r2 = runDue(spark, reg, resolve, t("2024-01-02T00:30:00Z"))
    assert(r2 === Seq("cities_big" -> NotDue))
    assert(Dataset.open(spark, byName("cities")).chain.lastOffset() === Some(0L))

    // tick 3 past the hour: due again, new file flows through both datasets
    val r3 = runDue(spark, reg, resolve, t("2024-01-02T01:00:00Z"))
    assert(r3 === Seq("cities_big" -> Pulled))
    assert(Dataset.open(spark, byName("cities")).chain.lastOffset() === Some(1L))
    assert(Dataset.open(spark, byName("cities_big")).chain.lastOffset() === Some(1L))

    // unschedule -> executor sees nothing
    reg.remove("cities_big")
    assert(runDue(spark, reg, resolve, t("2024-01-03T00:00:00Z")) === Nil)
  }

  test("retry policy: backoff families and exhaustion (reference retry_policy.rs)") {
    val at = t("2024-01-01T00:00:00Z")
    val fixed = RetryPolicy(4, 10000L, Backoff.Fixed)
    assert((1 to 4).map(fixed.nextAttemptAt(_, at)) === (1 to 4).map(_ => Some(at + 10000L)))
    assert(fixed.nextAttemptAt(5, at) === None)

    val linear = RetryPolicy(4, 10000L, Backoff.Linear)
    assert((1 to 4).flatMap(linear.nextAttemptAt(_, at)) ===
      Seq(at + 10000L, at + 20000L, at + 30000L, at + 40000L))

    val expo = RetryPolicy(4, 10000L, Backoff.Exponential)
    assert((1 to 4).flatMap(expo.nextAttemptAt(_, at)) ===
      Seq(at + 10000L, at + 20000L, at + 40000L, at + 80000L))

    // jitter: bounded by [base, base + minDelay) and deterministic per (seed, attempt)
    val jit = RetryPolicy(4, 10000L, Backoff.ExponentialWithJitter)
    for (n <- 1 to 4) {
      val base = 10000L << (n - 1)
      val Some(v) = jit.nextAttemptAt(n, at, "ds"): @unchecked
      assert(v >= at + base && v < at + base + 10000L)
      assert(jit.nextAttemptAt(n, at, "ds") === Some(v))
    }
    assert(jit.nextAttemptAt(5, at) === None)

    assert(parseRetryPolicy("3:30s:exponential") ===
      RetryPolicy(3, 30000L, Backoff.Exponential))
    assert(parseRetryPolicy("2:500ms:fixed") === RetryPolicy(2, 500L, Backoff.Fixed))
    intercept[IllegalArgumentException](parseRetryPolicy("3:30s:quadratic"))
    intercept[IllegalArgumentException](parseRetryPolicy("nope"))
  }

  test("executor: failed pull schedules backoff retries, then succeeds") {
    val root = Files.createTempDirectory("graft-flow-retry-")
    java.nio.file.Files.writeString(root.resolve("c-2024-01-01.csv"), "city,pop\nnola,364000\n")
    val cities = Dataset.create(spark, root.resolve("cities"), "cities")
    cities.chain.append(
      SetPollingSource(readFormat = "csv", schemaDdl = Some("city STRING, pop INT"),
        merge = MergeConf("ledger", primaryKey = Seq("city")),
        fetch = Some(FetchConf(kind = "filesGlob",
          glob = Some(root.resolve("c-*.csv").toString),
          eventTimeRegex = Some("c-(\\d{4}-\\d{2}-\\d{2})\\.csv")))), 0L)

    val reg = new Registry(
      new org.apache.hadoop.fs.Path(root.toUri), spark.sparkContext.hadoopConfiguration)
    reg.set("cities", parseSchedule("every 1h"))
    reg.setRetryPolicy("cities", RetryPolicy(2, 10000L, Backoff.Fixed))
    var broken = true
    val resolve = (n: String) => {
      if (broken) throw new RuntimeException("boom")
      Dataset.open(spark, root.resolve(n))
    }

    // first attempt fails -> retry 1 scheduled 10s out; the tick itself survives
    val t0 = t("2024-01-02T00:00:00Z")
    assert(runDue(spark, reg, resolve, t0) ===
      Seq("cities" -> RetryScheduled(1, t0 + 10000L, "boom")))
    // before the retry instant: not due
    assert(runDue(spark, reg, resolve, t0 + 5000L) === Seq("cities" -> NotDue))
    // at the retry instant, still broken -> retry 2 scheduled
    assert(runDue(spark, reg, resolve, t0 + 10000L) ===
      Seq("cities" -> RetryScheduled(2, t0 + 20000L, "boom")))
    // fixed -> retry 2 pulls and clears the failure state
    broken = false
    assert(runDue(spark, reg, resolve, t0 + 20000L) === Seq("cities" -> Pulled))
    assert(Dataset.open(spark, root.resolve("cities")).chain.lastOffset() === Some(0L))
    // back on the regular schedule
    assert(runDue(spark, reg, resolve, t0 + 21000L) === Seq("cities" -> NotDue))
  }

  test("executor: exhausted retries surface Failed and hand back to the schedule") {
    val root = Files.createTempDirectory("graft-flow-exhaust-")
    val cities = Dataset.create(spark, root.resolve("cities"), "cities")
    cities.chain.append(
      SetPollingSource(readFormat = "csv", schemaDdl = Some("city STRING, pop INT"),
        merge = MergeConf("append"),
        fetch = Some(FetchConf(kind = "filesGlob",
          glob = Some(root.resolve("c-*.csv").toString)))), 0L)
    val reg = new Registry(
      new org.apache.hadoop.fs.Path(root.toUri), spark.sparkContext.hadoopConfiguration)
    reg.set("cities", parseSchedule("every 1h"))
    reg.setRetryPolicy("cities", RetryPolicy(1, 10000L, Backoff.Fixed))
    val resolve = (_: String) => throw new RuntimeException("down")

    val t0 = t("2024-01-02T00:00:00Z")
    assert(runDue(spark, reg, resolve, t0) ===
      Seq("cities" -> RetryScheduled(1, t0 + 10000L, "down")))
    // retry 1 fails; policy allows only 1 retry -> Failed, surfaced not thrown
    assert(runDue(spark, reg, resolve, t0 + 10000L) ===
      Seq("cities" -> Failed(2, "down")))
    // failure recorded as a run: schedule governs the next trigger
    assert(runDue(spark, reg, resolve, t0 + 20000L) === Seq("cities" -> NotDue))
    // a fresh schedule-due attempt starts the retry ladder from 1 again
    val t1 = t0 + 10000L + 3600000L
    assert(runDue(spark, reg, resolve, t1) ===
      Seq("cities" -> RetryScheduled(1, t1 + 10000L, "down")))

    // without a policy, a failure surfaces immediately (no retry, no throw)
    reg.removeRetryPolicy("cities")
    reg.remove("cities"); reg.set("cities", parseSchedule("every 1h"))
    assert(runDue(spark, reg, resolve, t1 + 7200000L) ===
      Seq("cities" -> Failed(1, "down")))
  }

  test("reactive rules: parse, render, validation (reference batching_rule.rs/reactive_rule.rs)") {
    assert(parseReactiveRule("immediate") ===
      ReactiveRule(BatchingRule.Immediate, BreakingChangeRule.NoAction))
    assert(parseReactiveRule("immediate:recover").forBreakingChange ===
      BreakingChangeRule.Recover)
    val b = parseReactiveRule("buffer:1000:15m")
    assert(b === ReactiveRule(BatchingRule.Buffering(1000L, 900000L)))
    assert(b.render === "buffer:1000:15m")
    assert(parseReactiveRule("buffer:5:2h:recover").render === "buffer:5:2h:recover")
    // validation bounds mirror batching_rule.rs:35-55 (incl. the 24h cap)
    intercept[IllegalArgumentException](parseReactiveRule("buffer:0:15m"))
    intercept[IllegalArgumentException](parseReactiveRule("buffer:5:0s"))
    intercept[IllegalArgumentException](parseReactiveRule("buffer:5:25h"))
    intercept[IllegalArgumentException](parseReactiveRule("sometimes"))
    assert(parseReactiveRule("buffer:1:24h") ===
      ReactiveRule(BatchingRule.Buffering(1L, 86400000L)))
  }

  /** Root `cities` (filesGlob CSV ledger) + derivative `cities_big`. */
  private def reactiveFixture(): (java.nio.file.Path, Registry, String => graft.dataset.Dataset) = {
    val root = Files.createTempDirectory("graft-flow-reactive-")
    val cities = Dataset.create(spark, root.resolve("cities"), "cities")
    cities.chain.append(
      SetPollingSource(readFormat = "csv", schemaDdl = Some("city STRING, pop INT"),
        merge = MergeConf("ledger", primaryKey = Seq("city")),
        fetch = Some(FetchConf(kind = "filesGlob",
          glob = Some(root.resolve("c-*.csv").toString),
          eventTimeRegex = Some("c-(\\d{4}-\\d{2}-\\d{2})\\.csv")))), 0L)
    val big = Dataset.create(spark, root.resolve("cities_big"), "cities_big", kind = "derivative")
    TransformService.setTransform(big, Seq("cities"),
      Seq(SqlStep(None, "SELECT op, event_time, city, pop * 2 AS pop FROM cities")), 0L)
    val reg = new Registry(
      new org.apache.hadoop.fs.Path(root.toUri), spark.sparkContext.hadoopConfiguration)
    (root, reg, (n: String) => Dataset.open(spark, root.resolve(n)))
  }

  test("reactive buffering: fires at min-records, anchors the deadline at the first commit") {
    val (root, reg, resolve) = reactiveFixture()
    reg.setReactiveRule("cities_big", parseReactiveRule("buffer:3:1h"))

    // nothing upstream yet: idle, not batching
    val t0 = t("2024-03-01T00:00:00Z")
    assert(runDue(spark, reg, resolve, t0) === Seq("cities_big" -> NotDue))

    // upstream's own flow ingests 1 record -> under the threshold: batching,
    // deadline anchored at THIS first unconsumed commit's system time
    java.nio.file.Files.writeString(root.resolve("c-2024-03-01.csv"), "city,pop\nnola,364000\n")
    assert(IngestWriter.pollOnce(resolve("cities"), t0).isDefined)
    assert(runDue(spark, reg, resolve, t0 + 60000L) ===
      Seq("cities_big" -> Batching(1L, 3L, t0 + 3600000L)))
    assert(resolve("cities_big").chain.lastOffset() === None) // no pull yet

    // a second record 10m later: still batching, deadline UNMOVED (it
    // anchors at the earliest unconsumed block, not the latest)
    java.nio.file.Files.writeString(root.resolve("c-2024-03-02.csv"), "city,pop\nkyiv,2884000\n")
    assert(IngestWriter.pollOnce(resolve("cities"), t0 + 600000L).isDefined)
    assert(runDue(spark, reg, resolve, t0 + 660000L) ===
      Seq("cities_big" -> Batching(2L, 3L, t0 + 3600000L)))

    // third record crosses min-records -> fires; transform consumes all 3.
    // A new upstream FILE that its own flow has NOT ingested yet must stay
    // un-ingested: reactive fires run transforms only (pollRoots = false).
    java.nio.file.Files.writeString(root.resolve("c-2024-03-03.csv"), "city,pop\nlima,9752000\n")
    assert(IngestWriter.pollOnce(resolve("cities"), t0 + 1200000L).isDefined)
    java.nio.file.Files.writeString(root.resolve("c-2024-03-04.csv"), "city,pop\noslo,709000\n")
    assert(runDue(spark, reg, resolve, t0 + 1260000L) === Seq("cities_big" -> Pulled))
    assert(resolve("cities_big").chain.lastOffset() === Some(2L))
    assert(resolve("cities").chain.lastOffset() === Some(2L), "reactive fire must not poll roots")

    // retract on up-to-date: everything consumed -> idle again
    assert(runDue(spark, reg, resolve, t0 + 1320000L) === Seq("cities_big" -> NotDue))

    // the max-batching-interval path: one record under the threshold fires
    // anyway once the deadline passes
    val t1 = t0 + 7200000L
    assert(IngestWriter.pollOnce(resolve("cities"), t1).isDefined) // the oslo file
    assert(runDue(spark, reg, resolve, t1 + 60000L) ===
      Seq("cities_big" -> Batching(1L, 3L, t1 + 3600000L)))
    assert(runDue(spark, reg, resolve, t1 + 3600000L) === Seq("cities_big" -> Pulled))
    assert(resolve("cities_big").chain.lastOffset() === Some(3L))
  }

  test("reactive immediate fires on any upstream move; breaking changes route per rule") {
    val (root, reg, resolve) = reactiveFixture()
    reg.setReactiveRule("cities_big", parseReactiveRule("immediate"))

    val t0 = t("2024-03-01T00:00:00Z")
    java.nio.file.Files.writeString(root.resolve("c-2024-03-01.csv"), "city,pop\nnola,364000\n")
    assert(IngestWriter.pollOnce(resolve("cities"), t0).isDefined)
    assert(runDue(spark, reg, resolve, t0 + 1000L) === Seq("cities_big" -> Pulled))
    assert(resolve("cities_big").chain.lastOffset() === Some(0L))
    assert(runDue(spark, reg, resolve, t0 + 2000L) === Seq("cities_big" -> NotDue))

    // ingest one more batch, then REWIND the upstream head: consumed > head
    java.nio.file.Files.writeString(root.resolve("c-2024-03-02.csv"), "city,pop\nkyiv,2884000\n")
    assert(IngestWriter.pollOnce(resolve("cities"), t0 + 3000L).isDefined)
    assert(runDue(spark, reg, resolve, t0 + 4000L) === Seq("cities_big" -> Pulled))
    val cities = resolve("cities")
    val beforeKyiv = cities.chain.blocksWithHashes()
      .takeWhile(!_._1.event.isInstanceOf[graft.model.MetadataEvent.AddData])
      .last._2
    val afterFirstAdd = cities.chain.blocksWithHashes()
      .find(_._1.event.isInstanceOf[graft.model.MetadataEvent.AddData]).get._2
    cities.chain.reset(afterFirstAdd) // head back to offset 0; derivative consumed 1

    // NoAction (default): the breaking change is ignored
    assert(runDue(spark, reg, resolve, t0 + 5000L) === Seq("cities_big" -> NotDue))
    // Recover: fires immediately
    reg.setReactiveRule("cities_big", parseReactiveRule("immediate:recover"))
    assert(runDue(spark, reg, resolve, t0 + 6000L) === Seq("cities_big" -> Pulled))
    assert(beforeKyiv.nonEmpty) // fixture sanity
  }

  test("pause suspends every trigger kind without losing config; resume restores") {
    val (root, reg, resolve) = reactiveFixture()
    reg.set("cities_big", parseSchedule("every 1h"))
    reg.setReactiveRule("cities_big", parseReactiveRule("immediate"))

    val t0 = t("2024-03-01T00:00:00Z")
    java.nio.file.Files.writeString(root.resolve("c-2024-03-01.csv"), "city,pop\nnola,364000\n")
    assert(IngestWriter.pollOnce(resolve("cities"), t0).isDefined)

    // paused: both the due schedule AND the pending reactive fire are held
    reg.pause("cities_big")
    assert(runDue(spark, reg, resolve, t0 + 1000L) === Seq("cities_big" -> Paused))
    assert(resolve("cities_big").chain.lastOffset() === None)
    // resume: the held work executes on the next tick, config intact
    reg.resume("cities_big")
    assert(runDue(spark, reg, resolve, t0 + 2000L) === Seq("cities_big" -> Pulled))
    assert(resolve("cities_big").chain.lastOffset() === Some(0L))
    // remove() also clears pause state
    reg.pause("cities_big")
    reg.remove("cities_big")
    assert(reg.paused() === Set.empty[String])
  }

  test("reactive rules compose with retry policies; schedule and rule may coexist") {
    val (root, reg, resolve0) = reactiveFixture()
    reg.setReactiveRule("cities_big", parseReactiveRule("immediate"))
    reg.setRetryPolicy("cities_big", RetryPolicy(2, 10000L, Backoff.Fixed))

    val t0 = t("2024-03-01T00:00:00Z")
    java.nio.file.Files.writeString(root.resolve("c-2024-03-01.csv"), "city,pop\nnola,364000\n")
    assert(IngestWriter.pollOnce(resolve0("cities"), t0).isDefined)

    // the reactive fire FAILS -> same backoff ladder as scheduled pulls
    var broken = true
    val resolve = (n: String) => { if (broken) throw new RuntimeException("boom"); resolve0(n) }
    assert(runDue(spark, reg, resolve, t0 + 1000L) ===
      Seq("cities_big" -> RetryScheduled(1, t0 + 11000L, "boom")))
    assert(runDue(spark, reg, resolve, t0 + 2000L) === Seq("cities_big" -> NotDue))
    broken = false
    assert(runDue(spark, reg, resolve, t0 + 11000L) === Seq("cities_big" -> Pulled))
    assert(resolve0("cities_big").chain.lastOffset() === Some(0L))

    // a schedule on the SAME dataset still fires on the clock (union of
    // triggers), even with nothing new upstream — and re-polls roots
    reg.set("cities_big", parseSchedule("every 1h"))
    java.nio.file.Files.writeString(root.resolve("c-2024-03-02.csv"), "city,pop\nkyiv,2884000\n")
    assert(runDue(spark, reg, resolve, t0 + 3700000L) === Seq("cities_big" -> Pulled))
    assert(resolve0("cities").chain.lastOffset() === Some(1L), "scheduled fire polls roots")
    assert(resolve0("cities_big").chain.lastOffset() === Some(1L))

    // removing the rule detaches the event trigger; the schedule remains
    reg.removeReactiveRule("cities_big")
    java.nio.file.Files.writeString(root.resolve("c-2024-03-03.csv"), "city,pop\nlima,9752000\n")
    assert(IngestWriter.pollOnce(resolve0("cities"), t0 + 3710000L).isDefined)
    assert(runDue(spark, reg, resolve, t0 + 3720000L) === Seq("cities_big" -> NotDue))
  }
}
