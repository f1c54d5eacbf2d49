package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality expectations — the gate a production ingest runs between
 * "rows arrived" and "rows committed" (the role Deequ/GreatExpectations/
 * dbt-tests play): declarative rules evaluated in as few passes as the
 * rule mix allows, each yielding an exact VIOLATION COUNT. A pipeline
 * then fails the tick, quarantines the batch, or records the counts as
 * lineage metadata (the reference records per-slice offset/watermark
 * stats on commit via its ingest executors —
 * src/infra/core/src/services/ingest/polling_ingest_service_impl.rs,
 * push_ingest_executor_impl.rs; this is the content-rule complement
 * those structural stats don't cover).
 *
 * Scale shape: all row-local rules (not-null, range, set-membership,
 * regex) fold into ONE aggregate pass over the batch — a single scan, one
 * row out. `unique` adds one (cols → count) aggregate whose shuffle
 * carries key cardinality; `foreignKey` adds one left-anti join against
 * the (deduplicated) key side, broadcast when small. Nothing collects
 * beyond the per-rule counts.
 */
object Expectations {

  sealed trait Rule { def name: String }
  /** expr must hold for every row; violations = rows where it is null/false. */
  final case class Check(name: String, predicate: Column) extends Rule
  /** `cols` combination appears at most once; violations = surplus rows. */
  final case class Unique(name: String, cols: Seq[String]) extends Rule
  /** every non-null `col` value exists in `ref`'s `refCol`; violations =
    * orphan rows. */
  final case class ForeignKey(name: String, col: String, ref: DataFrame, refCol: String)
      extends Rule

  def notNull(c: String): Rule = Check(s"not_null:$c", col(c).isNotNull)
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Check(s"range:$c", col(c).isNotNull && col(c) >= lo && col(c) <= hi)
  def inSet(c: String, values: Seq[Any]): Rule =
    Check(s"in_set:$c", col(c).isin(values: _*))
  def matches(c: String, regex: String): Rule =
    Check(s"matches:$c", col(c).rlike(regex))

  /** Evaluate every rule; returns (rule, violations, pass) — one row per
    * rule, rules in declaration order is NOT guaranteed (sort by name for
    * stable output). */
  def run(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val spark = df.sparkSession
    import spark.implicits._
    val checks = rules.collect { case c: Check => c }
    val rowLocal: Seq[(String, Long)] =
      if (checks.isEmpty) Nil
      else {
        val aggs = checks.map(c =>
          sum(when(coalesce(c.predicate, lit(false)), 0L).otherwise(1L)).as(c.name))
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        checks.zipWithIndex.map { case (c, i) =>
          c.name -> (if (row.isNullAt(i)) 0L else row.getLong(i))
        }
      }
    val uniques = rules.collect { case u: Unique => u }.map { u =>
      val surplus = df.groupBy(u.cols.map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum(col("__n") - 1L), lit(0L)))
        .collect()(0).getLong(0)
      u.name -> surplus
    }
    val fks = rules.collect { case f: ForeignKey => f }.map { f =>
      val orphans = df
        .filter(col(f.col).isNotNull)
        .join(
          f.ref.select(col(f.refCol).as(f.col)).distinct(),
          Seq(f.col), "left_anti")
        .count()
      f.name -> orphans
    }
    (rowLocal ++ uniques ++ fks)
      .map { case (n, v) => (n, v, v == 0L) }
      .toDF("rule", "violations", "pass")
  }
}
