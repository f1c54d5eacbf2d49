package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{DatasetVocabulary, Op}

/**
 * Golden-table ports of the reference's merge-strategy tests
 * (src/infra/ingest-datafusion/tests/tests/test_merge_strategy_{append,
 * ledger,snapshot,changelog_stream,upsert_stream}.rs): the city/population
 * fixtures with `year` as the event-time column.
 */
class MergeStrategySpec extends SparkSpec {

  test("snapshot merge: additive schema evolution diffs as old-null corrections") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val prevLedger = Seq((0L, graft.model.Op.Append, "a", 1))
      .toDF("offset", "op", "k", "v")
    // the new snapshot carries a column the prior state predates
    val incoming = Seq(("a", 1, "x"), ("b", 2, "y")).toDF("k", "v", "extra")
    val out = MergeStrategy.Snapshot(Seq("k"))
      .merge(Some(prevLedger), incoming)
      .select("op", "k", "v", "extra")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), Option(r.getString(3))))
      .toSet
    assert(out === Set(
      (graft.model.Op.Append, "b", 2, Some("y")),          // new key
      (graft.model.Op.CorrectFrom, "a", 1, None),          // old state: extra was null
      (graft.model.Op.CorrectTo, "a", 1, Some("x"))        // corrected to carry it
    ))
  }
  import spark.implicits._

  private val vocab = DatasetVocabulary(eventTimeColumn = "year")

  private val A = Op.Append
  private val R = Op.Retract
  private val CF = Op.CorrectFrom
  private val CT = Op.CorrectTo

  /** (year, city, population) snapshot-style input. */
  private def input(rows: (Int, String, Long)*): DataFrame =
    rows.toDF("year", "city", "population")

  /** (op, year, city, population) changelog rows. */
  private def output(rows: (Int, Int, String, Long)*): DataFrame =
    rows.toDF("op", "year", "city", "population")

  /** (offset, op, year, city, population) prior ledger. */
  private def ledger(rows: (Int, Int, String, Long)*): DataFrame =
    rows.zipWithIndex
      .map { case ((op, y, c, p), i) => (i.toLong, op, y, c, p) }
      .toDF("offset", "op", "year", "city", "population")

  private def sortedBy(strat: MergeStrategy, df: DataFrame): DataFrame =
    if (strat.sortOrder(df).nonEmpty) df.orderBy(strat.sortOrder(df): _*) else df

  // ------------------------------------------------------------------ append

  test("append: merge to empty stamps +A") {
    val strat = MergeStrategy.Append(vocab)
    val in = input((2020, "vancouver", 1L), (2021, "seattle", 2L), (2022, "kyiv", 3L))
    assertSameRows(
      strat.merge(None, in),
      output((A, 2020, "vancouver", 1L), (A, 2021, "seattle", 2L), (A, 2022, "kyiv", 3L))
    )
  }

  test("append: prior data is ignored, everything appends") {
    val strat = MergeStrategy.Append(vocab)
    val in = input((2023, "vancouver", 1L), (2024, "odessa", 4L))
    assertSameRows(
      strat.merge(Some(ledger((A, 2020, "vancouver", 1L))), in),
      output((A, 2023, "vancouver", 1L), (A, 2024, "odessa", 4L))
    )
  }

  // ------------------------------------------------------------------ ledger

  private val ledgerStrat = MergeStrategy.Ledger(Seq("year", "city"), vocab)

  private def prevOutput(rows: (Int, Int, String, Long)*): Option[DataFrame] =
    if (rows.isEmpty) None else Some(output(rows: _*))

  test("ledger: merge to empty") {
    val in = input((2020, "vancouver", 1L), (2020, "seattle", 2L), (2020, "kyiv", 3L))
    assertSameRows(
      ledgerStrat.merge(None, in),
      output((A, 2020, "vancouver", 1L), (A, 2020, "seattle", 2L), (A, 2020, "kyiv", 3L))
    )
  }

  test("ledger: unseen key appends") {
    val prev = prevOutput((A, 2020, "vancouver", 1L), (A, 2020, "seattle", 2L), (A, 2020, "kyiv", 3L))
    assertSameRows(
      ledgerStrat.merge(prev, input((2020, "odessa", 4L))),
      output((A, 2020, "odessa", 4L))
    )
  }

  test("ledger: seen keys are dropped regardless of input order") {
    val prev = prevOutput((A, 2020, "vancouver", 1L), (A, 2020, "seattle", 2L), (A, 2020, "kyiv", 3L))
    for (in <- Seq(
        input((2020, "seattle", 2L), (2020, "kyiv", 3L)),
        input((2020, "kyiv", 3L), (2020, "seattle", 2L)),
        input((2020, "seattle", 2L))
      ))
      assert(ledgerStrat.merge(prev, in).count() === 0L)
  }

  test("ledger: respects the declared pk columns") {
    val prev = Some(input((2020, "vancouver", 1L), (2020, "seattle", 2L)))
    // PK (year): 2020 seen -> dropped
    assert(
      MergeStrategy.Ledger(Seq("year"), vocab).merge(prev, input((2020, "kiev", 3L))).count() === 0L
    )
    // PK (year, city): (2020, seattle) seen -> dropped
    assert(
      MergeStrategy.Ledger(Seq("year", "city"), vocab)
        .merge(prev, input((2020, "seattle", 3L)))
        .count() === 0L
    )
    // PK (year, city, population): (2020, seattle, 3) unseen -> appends
    assertSameRows(
      MergeStrategy
        .Ledger(Seq("year", "city", "population"), vocab)
        .merge(prev, input((2020, "seattle", 3L))),
      output((A, 2020, "seattle", 3L))
    )
    // PK (year, city), new year -> appends
    assertSameRows(
      MergeStrategy.Ledger(Seq("year", "city"), vocab).merge(prev, input((2021, "seattle", 3L))),
      output((A, 2021, "seattle", 3L))
    )
  }

  // -------------------------------------------------- snapshot: projection

  private def project(rows: (Int, Int, String, Long)*): DataFrame =
    Changelog
      .project(ledger(rows: _*), Seq("city"), vocab)
      .select(col("op"), col("year"), col("city"), col("population"))

  test("snapshot project: empty") {
    assert(project().count() === 0L)
  }

  test("snapshot project: appends stay") {
    assertSameRows(
      project((A, 2020, "vancouver", 1L), (A, 2020, "seattle", 2L)),
      output((A, 2020, "vancouver", 1L), (A, 2020, "seattle", 2L))
    )
  }

  test("snapshot project: retracted entity disappears") {
    assert(project((A, 2020, "vancouver", 1L), (R, 2020, "vancouver", 0L)).count() === 0L)
  }

  test("snapshot project: correction keeps latest value") {
    assertSameRows(
      project((A, 2020, "vancouver", 1L), (CF, 2020, "vancouver", 1L), (CT, 2020, "vancouver", 2L)),
      output((CT, 2020, "vancouver", 2L))
    )
  }

  test("snapshot project: mixed history") {
    assertSameRows(
      project(
        (A, 2020, "vancouver", 1L),
        (A, 2020, "seattle", 2L),
        (CF, 2020, "vancouver", 1L),
        (CT, 2020, "vancouver", 3L),
        (A, 2020, "kyiv", 4L),
        (R, 2020, "seattle", 0L),
        (CF, 2020, "kyiv", 4L),
        (CT, 2020, "kyiv", 1L)
      ),
      output((CT, 2020, "vancouver", 3L), (CT, 2020, "kyiv", 1L))
    )
  }

  // ------------------------------------------------------ snapshot: merge

  private val snapStrat = MergeStrategy.Snapshot(Seq("city"), vocab = vocab)

  /** Expected rows carry a nullable year (None when the event-time of an
    * emitted row comes from the new snapshot, which has no year column). */
  private def outputOptYear(rows: (Int, Option[Int], String, Long)*): DataFrame =
    rows.toDF("op", "year", "city", "population")

  private def inputNoYear(rows: (String, Long)*): DataFrame =
    rows.toDF("city", "population")

  test("snapshot merge: first batch short-circuits to appends") {
    val got = snapStrat.merge(None, inputNoYear(("vancouver", 1L), ("seattle", 2L)))
    assertSameRows(
      got,
      Seq((A, "vancouver", 1L), (A, "seattle", 2L)).toDF("op", "city", "population")
    )
  }

  test("snapshot merge: identical snapshot emits nothing (any order)") {
    val prev = ledger((A, 2020, "vancouver", 1L), (A, 2020, "seattle", 2L))
    for (in <- Seq(
        inputNoYear(("vancouver", 1L), ("seattle", 2L)),
        inputNoYear(("seattle", 2L), ("vancouver", 1L))
      ))
      assert(snapStrat.merge(Some(prev), in).count() === 0L)
  }

  test("snapshot merge: mix of changes") {
    val prev = ledger((A, 2020, "vancouver", 1L), (A, 2020, "seattle", 2L), (A, 2020, "kyiv", 3L))
    val in = inputNoYear(("seattle", 2L), ("kyiv", 4L), ("odessa", 5L))
    val got = snapStrat.merge(Some(prev), in)
    // year is dropped from comparison because the new snapshot lacks it: the
    // projected old state is restricted to the new batch's columns.
    assertSameRows(
      sortedBy(snapStrat, got),
      Seq(
        (CF, "kyiv", 3L),
        (CT, "kyiv", 4L),
        (A, "odessa", 5L),
        (R, "vancouver", 1L)
      ).toDF("op", "city", "population"),
      ordered = true
    )
  }

  test("snapshot merge: input carrying event time — null new time is not a change") {
    val prev = ledger((A, 2020, "vancouver", 1L), (A, 2020, "seattle", 2L), (A, 2020, "kyiv", 3L))
    val in = outputOptYear(
      (A, Some(2020), "seattle", 2L),
      (A, Some(2021), "kyiv", 3L),
      (A, Some(2021), "odessa", 5L)
    ).drop("op")
    val got = snapStrat.merge(Some(prev), in)
    assertSameRows(
      sortedBy(snapStrat, got),
      outputOptYear(
        (CF, Some(2020), "kyiv", 3L),
        (CT, Some(2021), "kyiv", 3L),
        (A, Some(2021), "odessa", 5L),
        (R, Some(2020), "vancouver", 1L)
      ),
      ordered = true
    )
  }

  // ------------------------------------------------------- changelog stream

  test("changelog stream: passes changelog through as-is") {
    val strat = MergeStrategy.ChangelogStream(Seq("city"), vocab)
    val in = output(
      (A, 2020, "odessa", 4L),
      (CF, 2020, "vancouver", 1L),
      (CT, 2020, "vancouver", 2L)
    )
    assertSameRows(strat.merge(Some(ledger((A, 2020, "vancouver", 1L))), in), in)
  }

  test("changelog stream: missing op column is rejected") {
    val strat = MergeStrategy.ChangelogStream(Seq("city"), vocab)
    assertThrows[IllegalArgumentException] {
      strat.merge(None, input((2020, "vancouver", 1L)))
    }
  }

  // ----------------------------------------------------------- upsert stream

  private val upsertStrat =
    MergeStrategy.UpsertStream(
      Seq("year", "city"),
      arrivalOrderColumn = Some("seq"),
      dropArrivalColumn = true,
      vocab = vocab
    )

  /** (op, year, city, population) with arrival order = tuple position. */
  private def upsertIn(rows: (Int, Int, String, Long)*): DataFrame =
    rows.zipWithIndex
      .map { case ((op, y, c, p), i) => (op, y, c, p, i.toLong) }
      .toDF("op", "year", "city", "population", "seq")

  test("upsert: first batch passes through as appends") {
    val got = upsertStrat.merge(
      None,
      upsertIn((A, 2020, "vancouver", 1L), (A, 2020, "seattle", 2L), (A, 2020, "kyiv", 3L))
    )
    assertSameRows(
      sortedBy(upsertStrat, got),
      output((A, 2020, "kyiv", 3L), (A, 2020, "seattle", 2L), (A, 2020, "vancouver", 1L)),
      ordered = true
    )
  }

  test("upsert: first batch dedupes in-batch updates, drops retractions of nothing") {
    val got = upsertStrat.merge(
      None,
      upsertIn(
        (A, 2020, "vancouver", 1L),
        (A, 2020, "vancouver", 2L),
        (CT, 2020, "vancouver", 3L),
        (A, 2020, "seattle", 2L),
        (A, 2020, "kyiv", 3L),
        (R, 2020, "seattle", 2L)
      )
    )
    assertSameRows(
      sortedBy(upsertStrat, got),
      output((A, 2020, "kyiv", 3L), (A, 2020, "vancouver", 3L)),
      ordered = true
    )
  }

  test("upsert: unseen key appends; noop upserts vanish") {
    val prev =
      ledger((A, 2020, "vancouver", 1L), (A, 2020, "seattle", 2L), (A, 2020, "kyiv", 3L))
    assertSameRows(
      sortedBy(upsertStrat, upsertStrat.merge(Some(prev), upsertIn((A, 2020, "odessa", 4L)))),
      output((A, 2020, "odessa", 4L)),
      ordered = true
    )
    for (in <- Seq(
        upsertIn((A, 2020, "seattle", 2L), (A, 2020, "kyiv", 3L)),
        upsertIn((A, 2020, "kyiv", 3L), (A, 2020, "seattle", 2L))
      ))
      assert(upsertStrat.merge(Some(prev), in).count() === 0L)
  }

  test("upsert: updates become correction pairs (separate and same batch)") {
    val prev =
      ledger((A, 2020, "vancouver", 1L), (A, 2020, "seattle", 2L), (A, 2020, "kyiv", 3L))
    assertSameRows(
      sortedBy(
        upsertStrat,
        upsertStrat.merge(
          Some(prev),
          upsertIn((A, 2020, "vancouver", 2L), (CT, 2020, "kyiv", 4L))
        )
      ),
      output(
        (CF, 2020, "kyiv", 3L),
        (CT, 2020, "kyiv", 4L),
        (CF, 2020, "vancouver", 1L),
        (CT, 2020, "vancouver", 2L)
      ),
      ordered = true
    )
    assertSameRows(
      sortedBy(
        upsertStrat,
        upsertStrat.merge(
          Some(prev),
          upsertIn((A, 2020, "vancouver", 2L), (A, 2020, "vancouver", 3L))
        )
      ),
      output((CF, 2020, "vancouver", 1L), (CT, 2020, "vancouver", 3L)),
      ordered = true
    )
  }

  test("upsert: deletes carry old values (separate and same batch)") {
    val prev =
      ledger((A, 2020, "vancouver", 1L), (A, 2020, "seattle", 2L), (A, 2020, "kyiv", 3L))
    assertSameRows(
      sortedBy(upsertStrat, upsertStrat.merge(Some(prev), upsertIn((R, 2020, "seattle", 0L)))),
      output((R, 2020, "seattle", 2L)),
      ordered = true
    )
    assertSameRows(
      sortedBy(
        upsertStrat,
        upsertStrat.merge(
          Some(prev),
          upsertIn((CT, 2020, "seattle", 3L), (R, 2020, "seattle", 0L))
        )
      ),
      output((R, 2020, "seattle", 2L)),
      ordered = true
    )
  }
}
