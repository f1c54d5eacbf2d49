package graft.flow

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.json4s.DefaultFormats
import org.json4s.jackson.Serialization

import org.apache.spark.sql.SparkSession

import graft.dataset.Dataset
import graft.model.MetadataEvent
import graft.transform.TransformService

/**
 * Flow system: scheduled AND event-driven dataset updates — the schedules,
 * retry-policy, and reactive/batching subset of the reference's flow system
 * (src/domain/flow-system/: `Schedule::TimeDelta` / `Schedule::Cron`; retry
 * semantics after src/domain/flow-system/domain/src/entities/shared/
 * retry_policy.rs:16-67; reactive/batching semantics after batching_rule.rs
 * and reactive_rule.rs). A dataset gets a schedule (`every <duration>` or a
 * 5-field cron expression, UTC), and/or a [[ReactiveRule]] that fires off
 * upstream head movement (gated by min-records / max-batching-interval),
 * and optionally a [[RetryPolicy]]; the run-due-now executor pulls exactly
 * the datasets whose trigger (or pending retry) has come due — each through
 * [[TransformService.pullRecursive]], so a due derivative also refreshes
 * its upstream chain, like a flow trigger cascading. A failed pull never
 * aborts the tick: with a policy it schedules a backoff retry, without one
 * (or once attempts are exhausted) it surfaces as a Failed status and hands
 * control back to the regular triggers.
 *
 * State lives in workspace-level JSON files under `.graft/` (schedules,
 * reactive rules, last-run times, retry state) — the moral equivalent of
 * the reference's flow-system DB tables, deliberately OUTSIDE the metadata
 * chain: a trigger is operational config of this workspace, not part of the
 * dataset's verifiable history (the reference keeps flow configs in its
 * database for the same reason). Reactive ACCUMULATION, by contrast, is
 * derived from the chains at tick time and never stored.
 *
 * Everything takes explicit `now` millis — fake-clock testable, no wall
 * clock anywhere.
 */
object FlowService {

  // ------------------------------------------------------------- schedules

  sealed trait Schedule { def render: String }
  /** `every 15m` / `every 2h` / `every 90s` / `every 1d` */
  final case class Every(intervalMs: Long) extends Schedule {
    def render: String = s"every ${Every.human(intervalMs)}"
  }
  object Every {
    private[flow] def human(ms: Long): String =
      if (ms % 86400000L == 0) s"${ms / 86400000L}d"
      else if (ms % 3600000L == 0) s"${ms / 3600000L}h"
      else if (ms % 60000L == 0) s"${ms / 60000L}m"
      else s"${ms / 1000L}s"
  }
  /** 5-field cron (min hour dom mon dow), UTC; `*`, lists, ranges, steps.
    * Note one deliberate simplification vs vixie-cron: when BOTH day-of-month
    * and day-of-week are restricted, they are ANDed (Quartz-style), not ORed
    * — the conjunction is the intuitive reading and the schedules subset
    * here doesn't aim for crontab drop-in compatibility. */
  final case class Cron(expr: String) extends Schedule {
    private val fields = Cron.parse(expr)
    def render: String = expr
    /** First due instant strictly after `afterMs`, minute granularity. */
    def nextAfter(afterMs: Long): Long = {
      var t = java.time.Instant.ofEpochMilli(afterMs)
        .atZone(java.time.ZoneOffset.UTC)
        .truncatedTo(java.time.temporal.ChronoUnit.MINUTES)
        .plusMinutes(1)
      val limit = t.plusYears(5)
      while (t.isBefore(limit) && !Cron.matches(fields, t)) t = t.plusMinutes(1)
      require(t.isBefore(limit), s"cron '$expr' never fires")
      t.toInstant.toEpochMilli
    }
  }
  object Cron {
    /** (minutes, hours, days-of-month, months, days-of-week 0-6 Sun=0) */
    private[flow] def parse(expr: String): Array[Set[Int]] = {
      val parts = expr.trim.split("\\s+")
      require(parts.length == 5, s"cron needs 5 fields, got '$expr'")
      val ranges = Seq((0, 59), (0, 23), (1, 31), (1, 12), (0, 6))
      parts.zip(ranges).map { case (p, (lo, hi)) =>
        p.split(",").flatMap { term =>
          val (body, step) = term.split("/") match {
            case Array(b)    => (b, 1)
            case Array(b, s) => (b, s.toInt)
            case _           => throw new IllegalArgumentException(s"bad cron term '$term'")
          }
          val (from, to) = body match {
            case "*" => (lo, hi)
            case r if r.contains("-") =>
              val Array(a, b) = r.split("-"); (a.toInt, b.toInt)
            case n => val v = n.toInt; (v, if (step == 1) v else hi)
          }
          require(from >= lo && to <= hi, s"cron value out of range in '$term'")
          (from to to by step)
        }.toSet
      }.toArray
    }
    private[flow] def matches(f: Array[Set[Int]], t: java.time.ZonedDateTime): Boolean =
      f(0)(t.getMinute) && f(1)(t.getHour) && f(2)(t.getDayOfMonth) &&
        f(3)(t.getMonthValue) && f(4)(t.getDayOfWeek.getValue % 7)
  }

  /** `every <n><s|m|h|d>` or a 5-field cron expression. */
  def parseSchedule(s: String): Schedule = {
    val trimmed = s.trim
    if (trimmed.startsWith("every ")) {
      val d = trimmed.stripPrefix("every ").trim
      val m = "^(\\d+)\\s*(s|m|h|d)$".r
      d match {
        case m(n, "s") => Every(n.toLong * 1000L)
        case m(n, "m") => Every(n.toLong * 60000L)
        case m(n, "h") => Every(n.toLong * 3600000L)
        case m(n, "d") => Every(n.toLong * 86400000L)
        case other     => throw new IllegalArgumentException(s"bad interval '$other'")
      }
    } else Cron(trimmed)
  }

  /** Is a dataset due at `now`, given when it last ran (None = never)? */
  def due(schedule: Schedule, lastRun: Option[Long], now: Long): Boolean = lastRun match {
    case None       => true // first run fires immediately, like a new flow trigger
    case Some(last) => schedule match {
      case Every(iv) => now >= last + iv
      case c: Cron   => now >= c.nextAfter(last)
    }
  }

  // -------------------------------------------------------- reactive rules

  /** When should a derivative react to NEW upstream data — after the
    * reference's `BatchingRule` (src/domain/flow-system/domain/src/entities/
    * shared/batching_rule.rs:18-25): fire on any change, or buffer until
    * enough records accumulated / long enough waited. */
  sealed trait BatchingRule { def render: String }
  object BatchingRule {
    case object Immediate extends BatchingRule { def render = "immediate" }
    /** Buffer upstream changes until `minRecords` accumulated across inputs
      * OR `maxIntervalMs` elapsed since the FIRST unconsumed upstream commit
      * (batching_rule.rs:328-341: deadline = primary activation time + max
      * interval). Validation mirrors batching_rule.rs:35-55. */
    final case class Buffering(minRecords: Long, maxIntervalMs: Long) extends BatchingRule {
      require(minRecords > 0, "minRecords to await must be positive")
      require(maxIntervalMs > 0, "max batching interval must be positive")
      require(maxIntervalMs <= 24L * 3600000L, "max batching interval must not exceed 24 hours")
      def render: String = s"buffer:$minRecords:${Every.human(maxIntervalMs)}"
    }
  }

  /** Reaction to a BREAKING upstream change (head rewritten — reset or
    * history rewrite), after reactive_rule.rs `BreakingChangeRule`: ignore
    * it, or re-pull immediately to recover the derivative. */
  sealed trait BreakingChangeRule { def render: String }
  object BreakingChangeRule {
    case object NoAction extends BreakingChangeRule { def render = "no-action" }
    case object Recover extends BreakingChangeRule { def render = "recover" }
  }

  /** A derivative's event-driven trigger, after reactive_rule.rs:17-20:
    * fires off UPSTREAM DATASET EVENTS (head movement observed at tick
    * time), not a clock. */
  final case class ReactiveRule(
      forNewData: BatchingRule,
      forBreakingChange: BreakingChangeRule = BreakingChangeRule.NoAction
  ) {
    def render: String = forBreakingChange match {
      case BreakingChangeRule.NoAction => forNewData.render
      case BreakingChangeRule.Recover  => s"${forNewData.render}:recover"
    }
  }

  /** `immediate` | `buffer:<minRecords>:<interval>` with optional
    * `:recover` suffix, e.g. `buffer:1000:15m:recover`. */
  def parseReactiveRule(s: String): ReactiveRule = {
    val parts = s.trim.split(":").toList
    val (body, breaking) =
      if (parts.lastOption.contains("recover"))
        (parts.init, BreakingChangeRule.Recover: BreakingChangeRule)
      else (parts, BreakingChangeRule.NoAction: BreakingChangeRule)
    val m = "^(\\d+)\\s*(ms|s|m|h)$".r
    val rule = body match {
      case List("immediate") => BatchingRule.Immediate
      case List("buffer", n, iv) =>
        val ivMs = iv.trim match {
          case m(v, "ms") => v.toLong
          case m(v, "s")  => v.toLong * 1000L
          case m(v, "m")  => v.toLong * 60000L
          case m(v, "h")  => v.toLong * 3600000L
          case other      => throw new IllegalArgumentException(s"bad batching interval '$other'")
        }
        BatchingRule.Buffering(n.trim.toLong, ivMs)
      case _ => throw new IllegalArgumentException(
        s"reactive rule is 'immediate' or 'buffer:<minRecords>:<interval>' (+':recover'), got '$s'")
    }
    ReactiveRule(rule, breaking)
  }

  /** Outcome of evaluating a reactive rule against the current chains. */
  sealed trait ReactiveDecision
  /** Enough new upstream data (or the batching deadline passed): pull now. */
  final case class FireNewData(accumulatedRecords: Long) extends ReactiveDecision
  /** An upstream head regressed (reset / history rewrite) and the rule says
    * Recover: pull now to re-derive. */
  case object FireBreaking extends ReactiveDecision
  /** New data exists but the batching condition is not yet met. */
  final case class Buffering(accumulatedRecords: Long, minRecords: Long, deadlineAt: Long)
      extends ReactiveDecision
  /** Nothing unconsumed upstream (or a breaking change with NoAction). */
  case object Idle extends ReactiveDecision

  /**
   * Evaluate a reactive rule for `output` at `now` — the pull-based
   * re-expression of flow_scheduling_service_impl.rs:295-341: where the
   * reference accumulates pushed activation causes in its flow DB, here the
   * accumulation is DERIVED from the chains at tick time, so it can never
   * drift from what a pull would actually consume:
   *   - consumed offset per input = the output's last ExecuteTransform
   *     input state (exactly what the next incremental run slices from);
   *   - accumulated records   = Σ over inputs (head − consumed) — offsets
   *     are dense, so the difference IS the record count;
   *   - the batching deadline anchors at the SYSTEM TIME OF THE EARLIEST
   *     UNCONSUMED upstream block (the primary activation cause's time);
   *   - an upstream head BELOW the consumed offset is a breaking change
   *     (reset / rewritten history) routed via `forBreakingChange`.
   * Roots (no SetTransform) are never reactive — they have no inputs.
   */
  def evaluateReactive(
      output: Dataset,
      resolve: String => Dataset,
      rule: ReactiveRule,
      now: Long
  ): ReactiveDecision = {
    val decl = output.chain.transform().getOrElse(return Idle)
    val lastRun = output.chain.lastExecuteTransform()
    var accumulated = 0L
    var firstNewAt = Long.MaxValue
    var breaking = false
    decl.inputs.foreach { name =>
      val in = resolve(name)
      val consumed = lastRun
        .flatMap(_.inputs.find(_.datasetName == name))
        .flatMap(_.newOffset)
        .getOrElse(-1L)
      val head = in.chain.lastOffset().getOrElse(-1L)
      if (head < consumed) breaking = true
      else if (head > consumed) {
        accumulated += head - consumed
        // earliest unconsumed data block's commit time (walk is O(blocks),
        // and chains are metadata — thousands of blocks, not data-sized)
        val at = in.chain.blocks().iterator
          .filter { b =>
            val slice = b.event match {
              case a: MetadataEvent.AddData          => Some(a)
              case e: MetadataEvent.ExecuteTransform => e.newData
              case _                                 => None
            }
            slice.exists(_.offsetEnd > consumed)
          }
          .map(_.systemTime)
          .nextOption()
          .getOrElse(now)
        firstNewAt = math.min(firstNewAt, at)
      }
    }
    if (breaking) rule.forBreakingChange match {
      case BreakingChangeRule.Recover  => FireBreaking
      case BreakingChangeRule.NoAction => Idle
    }
    else if (accumulated == 0L) Idle
    else rule.forNewData match {
      case BatchingRule.Immediate => FireNewData(accumulated)
      case BatchingRule.Buffering(minRecords, maxIntervalMs) =>
        val deadline = firstNewAt + maxIntervalMs
        if (accumulated >= minRecords || now >= deadline) FireNewData(accumulated)
        else Buffering(accumulated, minRecords, deadline)
    }
  }

  // ---------------------------------------------------------- retry policy

  /** Backoff family, after retry_policy.rs:22-28. `ExponentialWithJitter`
    * replaces the reference's `rand` draw with a deterministic hash of
    * (seed, attempt) — same load-spreading effect across datasets, but
    * fake-clock reproducible (this module has no entropy source anywhere). */
  sealed abstract class Backoff(val name: String)
  object Backoff {
    case object Fixed extends Backoff("fixed")
    case object Linear extends Backoff("linear")
    case object Exponential extends Backoff("exponential")
    case object ExponentialWithJitter extends Backoff("exponential-jitter")
    val All: Seq[Backoff] = Seq(Fixed, Linear, Exponential, ExponentialWithJitter)
    def parse(s: String): Backoff = All.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(
        s"unknown backoff '$s' (one of ${All.map(_.name).mkString(", ")})"))
  }

  /** Per-dataset retry config, after retry_policy.rs:16-20. `maxAttempts`
    * counts retries (the first attempt is not a retry). */
  final case class RetryPolicy(maxAttempts: Int, minDelayMs: Long, backoff: Backoff) {
    require(maxAttempts >= 0, "maxAttempts must be >= 0")
    require(minDelayMs > 0, "minDelayMs must be > 0")
    def render: String = s"$maxAttempts:${minDelayMs}ms:${backoff.name}"

    /** Instant of retry number `attempt` (1-based) given when the previous
      * attempt failed, or None once retries are exhausted — the shape of
      * retry_policy.rs:42-67. `jitterSeed` (typically the dataset name)
      * makes the jitter deterministic per (dataset, attempt). */
    def nextAttemptAt(attempt: Int, lastAttemptAt: Long, jitterSeed: String = ""): Option[Long] = {
      require(attempt > 0, "the first attempt is not a retry")
      if (attempt > maxAttempts) None
      else {
        val delay = backoff match {
          case Backoff.Fixed       => minDelayMs
          case Backoff.Linear      => minDelayMs * attempt
          case Backoff.Exponential => minDelayMs << (attempt - 1)
          case Backoff.ExponentialWithJitter =>
            val jitter = math.floorMod(
              scala.util.hashing.MurmurHash3.stringHash(s"$jitterSeed#$attempt").toLong,
              minDelayMs)
            (minDelayMs << (attempt - 1)) + jitter
        }
        Some(lastAttemptAt + delay)
      }
    }
  }

  /** `<maxAttempts>:<delay><s|m|h|ms>:<backoff>`, e.g. `3:30s:exponential`. */
  def parseRetryPolicy(s: String): RetryPolicy = s.trim.split(":") match {
    case Array(max, delay, backoff) =>
      val m = "^(\\d+)\\s*(ms|s|m|h)$".r
      val delayMs = delay.trim match {
        case m(n, "ms") => n.toLong
        case m(n, "s")  => n.toLong * 1000L
        case m(n, "m")  => n.toLong * 60000L
        case m(n, "h")  => n.toLong * 3600000L
        case other      => throw new IllegalArgumentException(s"bad retry delay '$other'")
      }
      RetryPolicy(max.trim.toInt, delayMs, Backoff.parse(backoff.trim))
    case _ => throw new IllegalArgumentException(
      s"retry policy is <maxAttempts>:<delay>:<backoff>, got '$s'")
  }

  /** Failure bookkeeping between ticks: how many attempts have failed and
    * when the latest one failed. */
  final case class AttemptState(failedAttempts: Int, lastAttemptAt: Long) {
    private[flow] def render: String = s"$failedAttempts:$lastAttemptAt"
  }
  private[flow] def parseAttemptState(s: String): AttemptState = s.split(":") match {
    case Array(n, at) => AttemptState(n.toInt, at.toLong)
    case _            => throw new IllegalArgumentException(s"bad attempt state '$s'")
  }

  /** Outcome of one dataset in one executor tick. */
  sealed trait RunStatus { def render: String }
  case object Pulled extends RunStatus { def render = "pulled" }
  case object NotDue extends RunStatus { def render = "not due" }
  /** Trigger paused (reference `pause_flow_trigger`): config kept, skipped. */
  case object Paused extends RunStatus { def render = "paused" }
  /** Reactive rule saw new upstream data but is still buffering it. */
  final case class Batching(accumulated: Long, minRecords: Long, deadlineAt: Long)
      extends RunStatus {
    def render =
      s"batching $accumulated/$minRecords records until ${java.time.Instant.ofEpochMilli(deadlineAt)}"
  }
  /** The pull failed and retry number `attempt` is scheduled at `nextAt`. */
  final case class RetryScheduled(attempt: Int, nextAt: Long, error: String) extends RunStatus {
    def render = s"failed (retry $attempt at ${java.time.Instant.ofEpochMilli(nextAt)}): $error"
  }
  /** The pull failed with no retries left (or none configured); the regular
    * schedule governs the next trigger. */
  final case class Failed(attempts: Int, error: String) extends RunStatus {
    def render = s"failed after $attempts attempt(s): $error"
  }

  // ----------------------------------------------------- workspace registry

  /** Schedules + last-run state for one workspace (JSON under `.graft/`). */
  final class Registry(workspace: Path, conf: Configuration) {
    private implicit val formats: DefaultFormats.type = DefaultFormats
    private val dir = new Path(workspace, ".graft")
    private val fs = dir.getFileSystem(conf)

    private def readMap(name: String): Map[String, String] = {
      val f = new Path(dir, name)
      if (!fs.exists(f)) Map.empty
      else {
        val in = fs.open(f)
        val s = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
        Serialization.read[Map[String, String]](s)
      }
    }
    private def writeMap(name: String, m: Map[String, String]): Unit =
      graft.FsAtomic.write(fs, new Path(dir, name),
        Serialization.write(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))

    def schedules(): Map[String, Schedule] =
      readMap("flows.json").view.mapValues(parseSchedule).toMap
    def set(dataset: String, schedule: Schedule): Unit =
      writeMap("flows.json", readMap("flows.json") + (dataset -> schedule.render))
    def remove(dataset: String): Unit = {
      writeMap("flows.json", readMap("flows.json") - dataset)
      writeMap("flow_state.json", readMap("flow_state.json") - dataset)
      writeMap("flow_retry.json", readMap("flow_retry.json") - dataset)
      writeMap("flow_attempts.json", readMap("flow_attempts.json") - dataset)
      writeMap("flow_reactive.json", readMap("flow_reactive.json") - dataset)
      writeMap("flow_paused.json", readMap("flow_paused.json") - dataset)
    }

    def reactiveRules(): Map[String, ReactiveRule] =
      readMap("flow_reactive.json").view.mapValues(parseReactiveRule).toMap
    def setReactiveRule(dataset: String, rule: ReactiveRule): Unit =
      writeMap("flow_reactive.json", readMap("flow_reactive.json") + (dataset -> rule.render))
    def removeReactiveRule(dataset: String): Unit =
      writeMap("flow_reactive.json", readMap("flow_reactive.json") - dataset)

    /** Paused triggers (the reference's `pause_flow_trigger`): the dataset
      * keeps its schedule/rule/retry config but the executor skips it. */
    def paused(): Set[String] = readMap("flow_paused.json").keySet
    def pause(dataset: String): Unit =
      writeMap("flow_paused.json", readMap("flow_paused.json") + (dataset -> "paused"))
    def resume(dataset: String): Unit =
      writeMap("flow_paused.json", readMap("flow_paused.json") - dataset)
    def lastRuns(): Map[String, Long] =
      readMap("flow_state.json").view.mapValues(_.toLong).toMap
    def recordRun(dataset: String, now: Long): Unit =
      writeMap("flow_state.json", readMap("flow_state.json") + (dataset -> now.toString))

    def retryPolicies(): Map[String, RetryPolicy] =
      readMap("flow_retry.json").view.mapValues(parseRetryPolicy).toMap
    def setRetryPolicy(dataset: String, policy: RetryPolicy): Unit =
      writeMap("flow_retry.json", readMap("flow_retry.json") + (dataset -> policy.render))
    def removeRetryPolicy(dataset: String): Unit =
      writeMap("flow_retry.json", readMap("flow_retry.json") - dataset)

    def attemptStates(): Map[String, AttemptState] =
      readMap("flow_attempts.json").view.mapValues(parseAttemptState).toMap
    def recordFailure(dataset: String, state: AttemptState): Unit =
      writeMap("flow_attempts.json", readMap("flow_attempts.json") + (dataset -> state.render))
    def clearFailure(dataset: String): Unit =
      writeMap("flow_attempts.json", readMap("flow_attempts.json") - dataset)
  }

  // ------------------------------------------------------------- executor

  /** One executor tick: pull every scheduled OR reactively-due dataset at
    * `now` (dependency-recursively) and record the outcome, skip the rest.
    * A dataset in a failed-retrying state is due at its policy's
    * next-attempt instant instead of its schedule's/rule's. Schedule fires
    * poll roots recursively (clock-driven refresh of the whole chain);
    * reactive fires run transforms only (`pollRoots = false`) — the
    * upstream data they react to has already been ingested by ITS OWN flow,
    * exactly like the reference's input-flow-success triggers. Failures
    * never propagate out of the tick — one broken dataset must not starve
    * the others (the reference runs each flow as an isolated task for the
    * same reason). Returns (dataset, status) in name order. */
  def runDue(
      spark: SparkSession,
      registry: Registry,
      resolve: String => Dataset,
      now: Long
  ): Seq[(String, RunStatus)] = {
    val last = registry.lastRuns()
    val policies = registry.retryPolicies()
    val attempts = registry.attemptStates()
    val schedules = registry.schedules()
    val reactives = registry.reactiveRules()
    val pausedSet = registry.paused()
    (schedules.keySet ++ reactives.keySet).toSeq.sorted.map { name =>
      val schedule = schedules.get(name)
      val retrying = attempts.get(name)
      def scheduleDue: Boolean = schedule.exists(s => due(s, last.get(name), now))
      val status: RunStatus = if (pausedSet.contains(name)) Paused else try {
        // retry gating first: a failed dataset waits for its retry instant,
        // not its schedule's or rule's. If the policy was removed (or
        // shrunk) mid-state, fall back to the regular triggers rather than
        // leaving the dataset stuck.
        val retryGate: Option[Boolean] = retrying.map { st =>
          policies.get(name)
            .flatMap(_.nextAttemptAt(st.failedAttempts, st.lastAttemptAt, name))
            .map(at => now >= at)
            .getOrElse(scheduleDue || reactives.get(name).exists(r =>
              evaluateReactive(resolve(name), resolve, r, now) match {
                case FireNewData(_) | FireBreaking => true
                case _                             => false
              }))
        }
        def pull(pollRoots: Boolean): RunStatus = {
          TransformService.pullRecursive(resolve(name), resolve, now, pollRoots = pollRoots)
          registry.clearFailure(name)
          registry.recordRun(name, now)
          Pulled
        }
        retryGate match {
          case Some(true)  => pull(pollRoots = schedule.isDefined)
          case Some(false) => NotDue
          case None if scheduleDue => pull(pollRoots = true)
          case None =>
            reactives.get(name) match {
              case None => NotDue
              case Some(rule) =>
                evaluateReactive(resolve(name), resolve, rule, now) match {
                  case FireNewData(_) | FireBreaking   => pull(pollRoots = false)
                  case Buffering(acc, minRecords, ddl) => Batching(acc, minRecords, ddl)
                  case Idle                            => NotDue
                }
            }
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          val err = Option(e.getMessage).getOrElse(e.getClass.getName)
          val failed = retrying.map(_.failedAttempts).getOrElse(0) + 1
          policies.get(name).flatMap(_.nextAttemptAt(failed, now, name)) match {
            case Some(at) =>
              registry.recordFailure(name, AttemptState(failed, now))
              RetryScheduled(failed, at, err)
            case None =>
              // exhausted (or no policy): back to the regular triggers
              registry.clearFailure(name)
              registry.recordRun(name, now)
              Failed(failed, err)
          }
      }
      name -> status
    }
  }
}
