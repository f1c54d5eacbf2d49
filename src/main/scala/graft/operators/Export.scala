package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Export sinks + response encoders.
 *
 * Export: dataset → parquet / csv / ndjson files
 * (src/domain/core/src/services/export_service.rs:33-41). Distributed
 * writers — one file per partition; pass `coalesce` for a bounded file count.
 *
 * Response encoders: small paginated query results → JSON/CSV strings for
 * API surfaces (src/adapter/http/src/data/query_types.rs:361-430). These
 * collect — they are for request/response payloads bounded by pagination
 * (default limit 100), never for bulk data movement.
 */
object Export {

  def toParquet(df: DataFrame, path: String, coalesce: Option[Int] = None): Unit =
    shaped(df, coalesce).write.mode("overwrite").parquet(path)

  def toCsv(df: DataFrame, path: String, coalesce: Option[Int] = None,
      options: Map[String, String] = Map("header" -> "true")): Unit =
    shaped(df, coalesce).write.mode("overwrite").options(options).csv(path)

  def toNdjson(df: DataFrame, path: String, coalesce: Option[Int] = None): Unit =
    shaped(df, coalesce).write.mode("overwrite").json(path)

  /**
   * Training-shard sink: one `shard=N/` directory per value of `shardCol`
   * (the output of [[Corpus.packShards]]), each holding a single ndjson
   * (or parquet) file — the layout a training loader streams shard by
   * shard. The repartition ON the shard column routes each shard through
   * one task, so a shard is one file, not `spark.sql.shuffle.partitions`
   * fragments; distinct shards still write in parallel across tasks.
   */
  def toShardedNdjson(df: DataFrame, shardCol: String, path: String): Unit =
    df.repartition(org.apache.spark.sql.functions.col(shardCol))
      .write.mode("overwrite").partitionBy(shardCol).json(path)

  /** Parquet form of [[toShardedNdjson]] (same layout, columnar files). */
  def toShardedParquet(df: DataFrame, shardCol: String, path: String): Unit =
    df.repartition(org.apache.spark.sql.functions.col(shardCol))
      .write.mode("overwrite").partitionBy(shardCol).parquet(path)

  private def shaped(df: DataFrame, n: Option[Int]): DataFrame =
    n.map(df.coalesce).getOrElse(df)

  // ---------------------------------------------------------- encoders

  /** JSON array-of-structs: `[{"a":1,"b":"x"}, …]` — built Spark-side with
    * to_json (codegen'd), only the final strings are collected. */
  def jsonAoS(df: DataFrame): String =
    df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("j"))
      .collect()
      .map(_.getString(0))
      .mkString("[", ",", "]")

  /** JSON array-of-arrays: `[[1,"x"], …]` (positional). */
  def jsonAoA(df: DataFrame): String =
    df.collect().map(encodeRowAoA).mkString("[", ",", "]")

  /** JSON struct-of-arrays: `{"a":[1,…],"b":["x",…]}` (columnar). */
  def jsonSoA(df: DataFrame): String = {
    val rows = df.collect()
    df.columns.zipWithIndex
      .map { case (c, i) =>
        s""""${escape(c)}":${rows.map(r => encodeValue(r.get(i))).mkString("[", ",", "]")}"""
      }
      .mkString("{", ",", "}")
  }

  /** CSV encoding with a header row. A null cell encodes as an EMPTY field
    * (like the reference's CSV writer, odf/data-utils/src/data/format/csv.rs)
    * so it stays distinguishable from the literal string "null". */
  def csvString(df: DataFrame): String = {
    val header = df.columns.map(csvCell).mkString(",")
    val body = df.collect().map(r =>
      r.toSeq.map {
        case null => ""
        case v    => csvCell(String.valueOf(v))
      }.mkString(","))
    (header +: body).mkString("\n")
  }

  private def encodeRowAoA(row: Row): String =
    row.toSeq.map(encodeValue).mkString("[", ",", "]")

  private def encodeValue(v: Any): String = v match {
    case null                                        => "null"
    case b: Boolean                                  => b.toString
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double                                   => d.toString
    case f: Float                                    => f.toString
    case d: java.math.BigDecimal                     => d.toPlainString
    case s: Seq[_]                                   => s.map(encodeValue).mkString("[", ",", "]")
    case r: Row                                      => encodeRowAoA(r)
    case other                                       => s""""${escape(String.valueOf(other))}""""
  }

  private def escape(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }

  private def csvCell(s: String): String =
    if (s.contains(",") || s.contains("\"") || s.contains("\n"))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
