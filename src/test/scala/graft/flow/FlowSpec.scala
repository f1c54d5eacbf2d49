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
    assert(r1 === Seq("cities_big" -> true))
    assert(Dataset.open(spark, byName("cities")).chain.lastOffset() === Some(0L))
    assert(Dataset.open(spark, byName("cities_big")).chain.lastOffset() === Some(0L))

    // tick 2 within the hour: not due, nothing pulled
    java.nio.file.Files.writeString(root.resolve("c-2024-01-02.csv"), "city,pop\nkyiv,2884000\n")
    val r2 = runDue(spark, reg, resolve, t("2024-01-02T00:30:00Z"))
    assert(r2 === Seq("cities_big" -> false))
    assert(Dataset.open(spark, byName("cities")).chain.lastOffset() === Some(0L))

    // tick 3 past the hour: due again, new file flows through both datasets
    val r3 = runDue(spark, reg, resolve, t("2024-01-02T01:00:00Z"))
    assert(r3 === Seq("cities_big" -> true))
    assert(Dataset.open(spark, byName("cities")).chain.lastOffset() === Some(1L))
    assert(Dataset.open(spark, byName("cities_big")).chain.lastOffset() === Some(1L))

    // unschedule -> executor sees nothing
    reg.remove("cities_big")
    assert(runDue(spark, reg, resolve, t("2024-01-03T00:00:00Z")) === Nil)
  }
}
