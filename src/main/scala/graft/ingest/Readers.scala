package graft.ingest

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Ingest readers: external file formats → DataFrame, schema-first when a DDL
 * is supplied (inference only at the reader edge, like the reference —
 * src/infra/ingest-datafusion/src/readers/{csv,ndjson,json,parquet}.rs).
 *
 * Options map 1:1 onto Spark's reader options, which already cover the
 * reference's ReadCsv DTO surface (separator/quote/escape/header/nulls/
 * dateFormat/timestampFormat — dtos_generated.rs:3031).
 */
object Readers {

  /** A reader turns a path into a DataFrame. */
  type Reader = (SparkSession, String) => DataFrame

  private def base(
      spark: SparkSession,
      schemaDdl: Option[String],
      options: Map[String, String]
  ): DataFrameReader = {
    val r = spark.read.options(options)
    schemaDdl.map(d => r.schema(StructType.fromDDL(d))).getOrElse(r)
  }

  /** CSV (readers/csv.rs:71-145). Defaults: header=true, inferSchema only
    * when no DDL given. */
  def csv(
      spark: SparkSession,
      path: String,
      schemaDdl: Option[String] = None,
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    val defaults = Map("header" -> "true") ++
      (if (schemaDdl.isEmpty) Map("inferSchema" -> "true") else Map.empty)
    base(spark, schemaDdl, defaults ++ options).csv(path)
  }

  /** NDJSON — newline-delimited JSON (readers/ndjson.rs:71-108). */
  def ndjson(
      spark: SparkSession,
      path: String,
      schemaDdl: Option[String] = None,
      options: Map[String, String] = Map.empty
  ): DataFrame =
    base(spark, schemaDdl, options).json(path)

  /** Single-document JSON with an optional sub-path pointing at the array of
    * records (readers/json.rs — reference converts doc → NDJSON; we read
    * multiLine and explode the selected array). */
  def json(
      spark: SparkSession,
      path: String,
      subPath: Option[String] = None,
      schemaDdl: Option[String] = None,
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    val doc = spark.read.options(options).option("multiLine", "true").json(path)
    val arr = subPath match {
      case None => doc
      case Some(p) =>
        // select the nested array column and explode it into rows
        doc.select(explode(col(p)).as("__rec")).select(col("__rec.*"))
    }
    schemaDdl match {
      case None => arr
      case Some(ddl) =>
        val schema = StructType.fromDDL(ddl)
        arr.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    }
  }

  /** GeoJSON FeatureCollection (readers/geojson.rs:85-91): one row per
    * feature — `properties` flattened to columns plus the `geometry` object
    * re-serialized as a compact JSON string column. */
  def geojson(
      spark: SparkSession,
      path: String,
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    val doc = spark.read.options(options).option("multiLine", "true").json(path)
    doc
      .select(explode(col("features")).as("__f"))
      .select(col("__f.properties.*"), to_json(col("__f.geometry")).as("geometry"))
  }

  /** Newline-delimited GeoJSON — one Feature per line (readers/ndgeojson.rs:86-92). */
  def ndgeojson(
      spark: SparkSession,
      path: String,
      options: Map[String, String] = Map.empty
  ): DataFrame =
    spark.read
      .options(options)
      .json(path)
      .select(col("properties.*"), to_json(col("geometry")).as("geometry"))

  /** Parquet ingest (readers/parquet.rs:68-88). */
  def parquet(
      spark: SparkSession,
      path: String,
      schemaDdl: Option[String] = None
  ): DataFrame =
    schemaDdl match {
      case None      => spark.read.parquet(path)
      case Some(ddl) => spark.read.schema(StructType.fromDDL(ddl)).parquet(path)
    }

  /**
   * Format registry: name / media type / extension → reader
   * (data_format_registry_impl.rs:27-147).
   */
  def forFormat(
      format: String,
      schemaDdl: Option[String] = None,
      options: Map[String, String] = Map.empty,
      subPath: Option[String] = None
  ): Reader =
    normalize(format) match {
      case "csv"       => (s, p) => csv(s, p, schemaDdl, options)
      case "ndjson"    => (s, p) => ndjson(s, p, schemaDdl, options)
      case "json"      => (s, p) => json(s, p, subPath, schemaDdl, options)
      case "parquet"   => (s, p) => parquet(s, p, schemaDdl)
      case "geojson"   => (s, p) => geojson(s, p, options)
      case "ndgeojson" => (s, p) => ndgeojson(s, p, options)
      case "shapefile" => (s, p) => Shapefile.read(s, p)
      case other       => throw new IllegalArgumentException(s"unsupported ingest format: $other")
    }

  private def normalize(format: String): String = format.toLowerCase match {
    case "csv" | "text/csv"                                   => "csv"
    case "ndjson" | "jsonl" | "application/x-ndjson"          => "ndjson"
    case "json" | "application/json"                          => "json"
    case "parquet" | "application/vnd.apache.parquet" | "pqt" => "parquet"
    case "geojson" | "application/geo+json"                   => "geojson"
    case "ndgeojson" | "application/x-ndgeojson"              => "ndgeojson"
    case "shapefile" | "shp" | "x-gis/x-shapefile"            => "shapefile"
    case other                                                => other
  }

  /** Registry lookup by file extension (fallback when no format declared). */
  def forPath(path: String): Reader = {
    val ext = path.substring(path.lastIndexOf('.') + 1)
    forFormat(ext match {
      case "gz" =>
        val stem = path.stripSuffix(".gz")
        stem.substring(stem.lastIndexOf('.') + 1) // Spark reads .gz transparently
      case e => e
    })
  }
}
