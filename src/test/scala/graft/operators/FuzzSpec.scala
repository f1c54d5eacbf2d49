package graft.operators

import java.nio.file.Files

import scala.jdk.CollectionConverters._
import scala.sys.process._
import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec

/**
 * Differential fuzz harness: seeded random merge / changelog / tail /
 * skyline scenarios, each executed BOTH by the library and by DuckDB
 * (independently-spelled SQL over the same parquet inputs), results
 * compared row-for-row. This is the class of check fixed golden entries
 * can't provide — the r16 staircase-comparator bug (Java natural order
 * vs Spark SQL order on -0.0/0.0 and supplementary characters) is
 * exactly the kind of corner a seeded sweep over type-corner palettes
 * hits mechanically.
 *
 * Scenario corners baked into the generators: null primary keys, null
 * values, duplicate keys, empty batches/ledgers, NaN / -0.0 / 0.0
 * doubles, empty / supplementary-character / comma-bearing strings,
 * retractions of absent keys, all-null-value rows (the "no change ⇒ no
 * append" snapshot rule), and first-batch upsert paths.
 *
 * DuckDB runs through one python3 subprocess over all seeds (the same
 * interpreter the driver's oracle uses); the spec cancels (not fails)
 * when python3/duckdb is unavailable. Results round-trip through
 * parquet so both sides are compared in ONE type system (Spark's).
 *
 * The harness's first sweep (round 17) found one real divergence — in
 * the ORACLE's first spelling, instructively: a null-pk incoming
 * snapshot row has `newExists = false` (NULL fails `pk IS NOT NULL`),
 * so independent UNION ALL branches fired BOTH the append and the
 * retract emission, while the library's `when`-chain gives the
 * `!oldExists ⇒ append` case priority. The oracle now mirrors the
 * priority with mutually-exclusive predicates; the library's semantics
 * (a keyless row is "new", never a deletion witness) were confirmed
 * against the reference's snapshot strategy.
 */
class FuzzSpec extends SparkSpec {

  private val seeds = (1 to 24).toList

  private val ledgerSchema = StructType(Seq(
    StructField("offset", LongType), StructField("op", IntegerType),
    StructField("event_time", LongType), StructField("pk", LongType),
    StructField("v", DoubleType), StructField("s", StringType)))

  private val dataSchema = StructType(Seq(
    StructField("pk", LongType), StructField("v", DoubleType),
    StructField("s", StringType), StructField("event_time", LongType)))

  private val upsertSchema = StructType(Seq(
    StructField("op", IntegerType), StructField("arr", LongType),
    StructField("pk", LongType), StructField("v", DoubleType),
    StructField("s", StringType), StructField("event_time", LongType)))

  private val pointsSchema = StructType(Seq(
    StructField("x", LongType), StructField("y", DoubleType),
    StructField("id", LongType)))

  // ---- type-corner palettes -------------------------------------------
  private def genPk(r: Random): Any =
    if (r.nextInt(10) == 0) null else r.nextInt(10).toLong
  private def genV(r: Random): Any = r.nextInt(12) match {
    case 0 => null
    case 1 => Double.NaN
    case 2 => 0.0d
    case 3 => -0.0d
    case n => (n - 7).toDouble / 2
  }
  private def genS(r: Random): Any = r.nextInt(10) match {
    case 0 => null
    case 1 => ""
    case 2 => "é"                            // é
    case 3 => new String(Character.toChars(0x10000)) // supplementary
    case 4 => "x,y"
    case n => ("abc" + (n % 3))
  }
  private def genEt(r: Random): Any =
    if (r.nextInt(6) == 0) null else (r.nextInt(5) * 1000L)

  private def mkDF(schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  private def tailN(seed: Int): Int = 1 + seed % 7
  private def upsertFirst(seed: Int): Boolean = seed % 3 == 0

  private lazy val duckdbOk: Boolean =
    try Seq("python3", "-c", "import duckdb").! == 0
    catch { case _: Exception => false }

  /** Generates every seed's inputs, writes them as parquet, runs the
    * DuckDB side once over all of them. Evaluated lazily by the first
    * test; later tests reuse the same artifacts. */
  private lazy val base: String = {
    val dir = Files.createTempDirectory("graft_fuzz").toFile
    dir.deleteOnExit()
    val b = dir.getAbsolutePath
    for (seed <- seeds) {
      val r = new Random(seed * 7919L)
      def write(df: DataFrame, name: String): Unit =
        df.coalesce(1).write.mode("overwrite").parquet(s"$b/seed_$seed/$name")

      val nLedger = if (seed % 5 == 0) 0 else 5 + r.nextInt(35)
      write(mkDF(ledgerSchema, (0 until nLedger).map(i =>
        Row(i.toLong, r.nextInt(4), genEt(r), genPk(r), genV(r), genS(r)))),
        "ledger")

      write(mkDF(dataSchema, (0 until r.nextInt(15)).map(_ =>
        Row(genPk(r), genV(r), genS(r), genEt(r)))), "prevl")
      val nInc = if (seed % 4 == 0) 0 else r.nextInt(15)
      write(mkDF(dataSchema, (0 until nInc).map(_ =>
        Row(genPk(r), genV(r), genS(r), genEt(r)))), "inc_ledger")

      // snapshot state: unique non-null pks; incoming snapshot: unique
      // pks plus a couple of null-pk rows
      write(mkDF(dataSchema, r.shuffle((0L to 9L).toList).take(r.nextInt(8)).map(k =>
        Row(k, genV(r), genS(r), genEt(r)))), "state")
      val snapPks = r.shuffle((0L to 11L).toList).take(r.nextInt(9)).map(k => k: Any) ++
        Seq.fill(r.nextInt(3))(null: Any)
      write(mkDF(dataSchema, snapPks.map(k =>
        Row(k, genV(r), genS(r), genEt(r)))), "inc_snap")

      val nUp = if (seed % 6 == 0) 0 else r.nextInt(20)
      val arrs = r.shuffle((0 until nUp).map(_.toLong).toList)
      write(mkDF(upsertSchema, (0 until nUp).map(i =>
        Row(r.nextInt(2), arrs(i), genPk(r), genV(r), genS(r), genEt(r)))),
        "inc_upsert")

      write(mkDF(pointsSchema, (0 until r.nextInt(50)).map(i =>
        Row(if (r.nextInt(8) == 0) null else r.nextInt(12).toLong,
          genV(r), i.toLong))), "points")
    }
    val plan = seeds.map(sd =>
      s"""{"seed":$sd,"tailN":${tailN(sd)},"upsertFirst":${upsertFirst(sd)}}""")
      .mkString("""{"seeds":[""", ",", "]}")
    Files.write(new java.io.File(dir, "plan.json").toPath, plan.getBytes("UTF-8"))
    val rc = (Seq("python3", "-c", oracleScript, b) #> new java.io.File(dir, "oracle.log")).!
    assert(rc == 0, s"DuckDB fuzz oracle failed — see $b/oracle.log")
    b
  }

  /** The independently-spelled DuckDB side. Every query re-derives the
    * documented operator semantics from scratch (row_number picks, NOT
    * EXISTS anti-joins, IS DISTINCT FROM change predicates, UNION ALL
    * changelog emission) — no shared code with the library. */
  private val oracleScript: String =
    """
import duckdb, json, os, sys
base = sys.argv[1]
plan = json.load(open(os.path.join(base, "plan.json")))
for sc in plan["seeds"]:
    d = os.path.join(base, "seed_%d" % sc["seed"])
    con = duckdb.connect()
    for t in ["ledger", "prevl", "inc_ledger", "inc_snap", "state", "inc_upsert", "points"]:
        con.execute("CREATE VIEW %s AS SELECT * FROM parquet_scan('%s/%s/*.parquet')" % (t, d, t))
    q = {}
    q["proj"] = (
        'SELECT "offset", op, event_time, pk, v, s FROM '
        '(SELECT *, row_number() OVER (PARTITION BY pk ORDER BY "offset" DESC) rn FROM ledger) '
        'WHERE rn = 1 AND op NOT IN (1, 2)')
    q["ledger_merge"] = (
        'SELECT 0 AS op, pk, v, s, event_time FROM inc_ledger i '
        'WHERE NOT EXISTS (SELECT 1 FROM prevl p WHERE p.pk = i.pk)')
    q["snap_merge"] = (
        'WITH j AS (SELECT o.pk opk, o.v ov, o.s os, o.event_time oet, '
        ' n.pk npk, n.v nv, n.s ns, n.event_time net, '
        ' (o.pk IS NOT NULL) oldex, (n.pk IS NOT NULL) newex, '
        ' ((o.v IS DISTINCT FROM n.v) OR (o.s IS DISTINCT FROM n.s) '
        '  OR (n.event_time IS NOT NULL AND o.event_time IS DISTINCT FROM n.event_time)) chg '
        ' FROM state o FULL OUTER JOIN inc_snap n ON o.pk = n.pk) '
        'SELECT 0 AS op, npk AS pk, nv AS v, ns AS s, net AS event_time FROM j WHERE chg AND NOT oldex '
        'UNION ALL SELECT 1, opk, ov, os, oet FROM j WHERE chg AND oldex AND NOT newex '
        'UNION ALL SELECT 2, opk, ov, os, oet FROM j WHERE chg AND oldex AND newex '
        'UNION ALL SELECT 3, npk, nv, ns, net FROM j WHERE chg AND oldex AND newex')
    last = ('SELECT op, pk, v, s, event_time FROM '
            '(SELECT *, row_number() OVER (PARTITION BY pk ORDER BY arr DESC) rn FROM inc_upsert) '
            'WHERE rn = 1')
    if sc["upsertFirst"]:
        q["upsert_merge"] = ('WITH last AS (%s) '
            'SELECT 0 AS op, pk, v, s, event_time FROM last WHERE op <> 1' % last)
    else:
        q["upsert_merge"] = ('WITH last AS (%s), '
            'j AS (SELECT o.pk opk, o.v ov, o.s os, o.event_time oet, '
            ' n.op nop, n.pk npk, n.v nv, n.s ns, n.event_time net, '
            ' (o.pk IS NOT NULL) oldex, '
            ' ((o.v IS DISTINCT FROM n.v) OR (o.s IS DISTINCT FROM n.s) '
            '  OR (n.event_time IS NOT NULL AND o.event_time IS DISTINCT FROM n.event_time)) chg '
            ' FROM last n LEFT JOIN state o ON o.pk = n.pk) '
            'SELECT 1 AS op, opk AS pk, ov AS v, os AS s, oet AS event_time FROM j WHERE nop = 1 AND oldex '
            'UNION ALL SELECT 0, npk, nv, ns, net FROM j WHERE nop <> 1 AND chg AND NOT oldex '
            'UNION ALL SELECT 2, opk, ov, os, oet FROM j WHERE nop <> 1 AND chg AND oldex '
            'UNION ALL SELECT 3, npk, nv, ns, net FROM j WHERE nop <> 1 AND chg AND oldex' % last)
    q["tail"] = ('SELECT * FROM (SELECT * FROM ledger ORDER BY "offset" DESC LIMIT %d) '
                 'ORDER BY "offset" ASC' % sc["tailN"])
    q["skyline"] = (
        'SELECT x, y, id FROM points p WHERE p.x IS NOT NULL AND p.y IS NOT NULL '
        'AND NOT EXISTS (SELECT 1 FROM points q WHERE q.x IS NOT NULL AND q.y IS NOT NULL '
        ' AND q.x <= p.x AND q.y <= p.y AND (q.x < p.x OR q.y < p.y))')
    for name, sql in q.items():
        con.execute("COPY (%s) TO '%s/out_%s.parquet' (FORMAT PARQUET)" % (sql, d, name))
    con.close()
print("FUZZ_ORACLE_OK")
"""

  private def rd(seed: Int, name: String): DataFrame =
    spark.read.parquet(s"$base/seed_$seed/$name")

  private def checkAll(name: String, ordered: Boolean = false)(
      actualOf: Int => DataFrame): Unit = {
    assume(duckdbOk, "python3+duckdb unavailable — differential fuzz skipped")
    for (seed <- seeds) {
      val actual = actualOf(seed)
      val expect = spark.read.parquet(s"$base/seed_$seed/out_$name.parquet")
        .select(actual.columns.map(col).toSeq: _*)
      withClue(s"[$name seed=$seed] ") {
        assertSameRows(actual, expect, ordered)
      }
    }
  }

  test("fuzz: changelog projection equals DuckDB latest-row-per-key (24 seeds)") {
    checkAll("proj") { seed => Changelog.project(rd(seed, "ledger"), Seq("pk")) }
  }

  test("fuzz: ledger merge equals DuckDB NOT EXISTS anti-join (24 seeds)") {
    checkAll("ledger_merge") { seed =>
      MergeStrategy.Ledger(Seq("pk"))
        .merge(Some(rd(seed, "prevl")), rd(seed, "inc_ledger"))
    }
  }

  test("fuzz: snapshot CDC diff equals DuckDB full-outer changelog emission (24 seeds)") {
    checkAll("snap_merge") { seed =>
      MergeStrategy.Snapshot(Seq("pk"))
        .mergeState(Some(rd(seed, "state")), rd(seed, "inc_snap"))
    }
  }

  test("fuzz: upsert-stream merge equals DuckDB last-per-key + left-join emission (24 seeds)") {
    checkAll("upsert_merge") { seed =>
      MergeStrategy.UpsertStream(Seq("pk"), Some("arr"), dropArrivalColumn = true)
        .mergeState(
          if (upsertFirst(seed)) None else Some(rd(seed, "state")),
          rd(seed, "inc_upsert"))
    }
  }

  test("fuzz: tail equals DuckDB ORDER BY offset DESC LIMIT n, ascending (24 seeds)") {
    checkAll("tail", ordered = true) { seed =>
      Changelog.tail(rd(seed, "ledger"), tailN(seed))
    }
  }

  test("fuzz: skyline2d equals DuckDB NOT EXISTS dominance (24 seeds)") {
    checkAll("skyline") { seed => Skyline.skyline2d(rd(seed, "points"), "x", "y") }
  }
}
