package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * Catalog-statistics maintenance — the CBO feed. The bucketed/maintained
 * tables this library materializes are long-lived query inputs; running
 * `ANALYZE TABLE` after (re)materialization gives Catalyst's cost-based
 * optimizer (`spark.sql.cbo.enabled`) row counts and per-column NDV /
 * min / max / null-count, which is what join-reorder and broadcast
 * decisions need to reproduce manually-hinted plans unhinted. The
 * reference reaches the same effect through its engines' own table
 * statistics (DataFusion collects parquet row-group stats at scan time);
 * Spark's catalog stats are the planner-visible equivalent for managed
 * tables.
 *
 * Cost model: ANALYZE is one aggregate scan per call (row count; plus
 * one multi-column aggregate for column stats) — schedule it with the
 * same maintenance cadence as compaction, never per query.
 */
object TableStats {

  /** Collect table-level (row count, size) and optional per-column
    * statistics into the catalog. Column stats use Spark's native
    * ANALYZE (exact min/max/null-count, HLL-approximate NDV).
    *
    * TimestampNTZ columns are REJECTED: Spark 4.1's
    * `CostBasedJoinReorder` MatchErrors on `TimestampNTZType` column
    * stats (stats-estimation misses the NTZ case), so analyzing such a
    * column makes every later CBO-enabled query over the table crash —
    * observed directly in the round-15 sf10 A/B. Fail at collect time
    * with a clear message instead. */
  def collectStats(
      spark: SparkSession,
      table: String,
      columns: Seq[String] = Nil
  ): Unit = {
    require(!table.contains("."),
      s"collectStats takes an unqualified table name, got '$table'")
    if (columns.nonEmpty) {
      val schema = spark.table(table).schema
      // case-INsensitive match: ANALYZE resolves columns with the session
      // resolver (default case-insensitive), so a case-mismatched name
      // would slip past an exact-match guard and still store NTZ stats
      val ntz = columns.filter(c =>
        schema.fields.exists(f => f.name.equalsIgnoreCase(c) &&
          f.dataType == org.apache.spark.sql.types.TimestampNTZType))
      require(ntz.isEmpty,
        s"collectStats($table): TimestampNTZ columns ${ntz.mkString(", ")} " +
          s"cannot carry column statistics — Spark 4.1 CBO join-reorder " +
          s"MatchErrors on TimestampNTZType stats; collect table-level " +
          s"stats only, or cast to TIMESTAMP at materialization")
    }
    spark.sql(s"ANALYZE TABLE `$table` COMPUTE STATISTICS")
    if (columns.nonEmpty) {
      val cols = columns.map(c => s"`$c`").mkString(", ")
      spark.sql(s"ANALYZE TABLE `$table` COMPUTE STATISTICS FOR COLUMNS $cols")
    }
  }

  /** The optimizer-visible statistics of a table, AS DATA: one
    * `(entity, stat, value)` row per collected statistic — the row count
    * plus each analyzed column's EXACT stats (min, max, null count).
    * The HLL-approximate NDV is deliberately absent: it is not
    * engine-reproducible, so it stays a planner detail. Values are
    * stringified through Spark's own external representation (numeric
    * stats print as plain integers). */
  def readStats(spark: SparkSession, table: String): DataFrame = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table))
    val st = meta.stats.getOrElse(
      throw new IllegalStateException(
        s"no statistics on `$table` — run collectStats first"))
    val tableRows: Seq[Row] =
      st.rowCount.map(rc => Row("table", "row_count", rc.toString)).toSeq
    val colRows: Seq[Row] = st.colStats.toSeq
      .sortBy(_._1)
      .flatMap { case (name, cs) =>
        cs.min.map(v => Row(name, "min", v)).toSeq ++
          cs.max.map(v => Row(name, "max", v)).toSeq ++
          cs.nullCount.map(v => Row(name, "null_count", v.toString)).toSeq
      }
    spark.createDataFrame(
      spark.sparkContext.parallelize(tableRows ++ colRows, 1),
      StructType(Seq(
        StructField("entity", StringType, nullable = false),
        StructField("stat", StringType, nullable = false),
        StructField("value", StringType, nullable = false))))
  }

  /** Planner-visible row count (None until [[collectStats]] ran) —
    * the cheap probe PlanSpec/BASELINE A/Bs use. */
  def rowCount(spark: SparkSession, table: String): Option[BigInt] =
    spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table))
      .stats.flatMap(_.rowCount)
}
