package graft.flow

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.json4s.DefaultFormats
import org.json4s.jackson.Serialization

import org.apache.spark.sql.SparkSession

import graft.dataset.Dataset
import graft.transform.TransformService

/**
 * Flow-lite: scheduled dataset updates — the schedules subset of the
 * reference's flow system (src/domain/flow-system/: `Schedule::TimeDelta` /
 * `Schedule::Cron`, flow triggers driving ingest+transform runs; batching
 * conditions and retry policies intentionally out of scope). A dataset gets
 * a schedule (`every <duration>` or a 5-field cron expression, UTC); the
 * run-due-now executor pulls exactly the datasets whose schedule has come
 * due — each through [[TransformService.pullRecursive]], so a due derivative
 * also refreshes its upstream chain, like a flow trigger cascading.
 *
 * State lives in two workspace-level JSON files under `.graft/` (schedules +
 * last-run times) — the moral equivalent of the reference's flow-system DB
 * tables, deliberately OUTSIDE the metadata chain: a schedule is operational
 * config of this workspace, not part of the dataset's verifiable history
 * (the reference keeps flow configs in its database for the same reason).
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
    private def writeMap(name: String, m: Map[String, String]): Unit = {
      fs.mkdirs(dir)
      val out = fs.create(new Path(dir, name), true)
      try out.write(Serialization.write(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }

    def schedules(): Map[String, Schedule] =
      readMap("flows.json").view.mapValues(parseSchedule).toMap
    def set(dataset: String, schedule: Schedule): Unit =
      writeMap("flows.json", readMap("flows.json") + (dataset -> schedule.render))
    def remove(dataset: String): Unit = {
      writeMap("flows.json", readMap("flows.json") - dataset)
      writeMap("flow_state.json", readMap("flow_state.json") - dataset)
    }
    def lastRuns(): Map[String, Long] =
      readMap("flow_state.json").view.mapValues(_.toLong).toMap
    def recordRun(dataset: String, now: Long): Unit =
      writeMap("flow_state.json", readMap("flow_state.json") + (dataset -> now.toString))
  }

  // ------------------------------------------------------------- executor

  /** One executor tick: pull every scheduled dataset that is due at `now`
    * (dependency-recursively), record its run, skip the rest. Returns
    * (dataset, ran?) per scheduled dataset in name order. */
  def runDue(
      spark: SparkSession,
      registry: Registry,
      resolve: String => Dataset,
      now: Long
  ): Seq[(String, Boolean)] = {
    val last = registry.lastRuns()
    registry.schedules().toSeq.sortBy(_._1).map { case (name, schedule) =>
      val isDue = due(schedule, last.get(name), now)
      if (isDue) {
        TransformService.pullRecursive(resolve(name), resolve, now)
        registry.recordRun(name, now)
      }
      name -> isDue
    }
  }
}
