package graft.query

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.chain.MetadataChain
import graft.dataset.Dataset

/**
 * A Spark DSv2 `TableCatalog` exposing graft datasets to ANY consumer of the
 * SparkSession — plain `spark.sql`, JDBC gateways, BI tools — without the
 * per-query temp-view registration that [[QueryService]] does.
 *
 * The reference ships the same capability as a DataFusion catalog
 * (src/infra/core/src/services/query/kamu_catalog.rs, kamu_schema.rs,
 * kamu_table.rs:161-295): lazy schema-from-chain tables whose file lists are
 * pruned at the metadata level before the scan is planned. Here each table
 * delegates its scan to Spark's built-in parquet `FileTable` over exactly the
 * chain-selected slice files, so Catalyst/Parquet pushdown, column pruning
 * and vectorized reading apply unchanged.
 *
 * Usage:
 * {{{
 *   GraftCatalog.register(spark, "graft", "/path/to/workspace")
 *   spark.sql("SELECT * FROM graft.default.my_ds")
 *   // reproducible as-of read, pinned to a metadata block hash:
 *   spark.sql("SELECT * FROM graft.default.my_ds VERSION AS OF '<block-hash>'")
 * }}}
 *
 * The workspace layout is one dataset root per subdirectory of `root` (the
 * single `default` namespace, like the reference's single `kamu` schema).
 * The catalog is read-only: datasets are written through the metadata chain
 * (IngestWriter/TransformService), never through SQL DML.
 */
final class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var rootUri: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    rootUri = options.get("root")
    require(rootUri != null, s"catalog '$name' requires option spark.sql.catalog.$name.root")
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active
  private def hconf: Configuration = spark.sparkContext.hadoopConfiguration
  private def rootPath: HPath = new HPath(rootUri)

  private def datasetRoot(ident: Identifier): HPath = {
    require(
      ident.namespace().sameElements(Array("default")),
      s"unknown namespace ${ident.namespace().mkString(".")} (only 'default' exists)"
    )
    new HPath(rootPath, ident.name())
  }

  // ---- namespaces (single 'default', mirroring KamuCatalog's single schema)

  override def listNamespaces(): Array[Array[String]] = Array(Array("default"))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespace.sameElements(Array("default"))) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.sameElements(Array("default"))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String], metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  // ---- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    val fs = rootPath.getFileSystem(hconf)
    if (!fs.exists(rootPath)) return Array.empty
    fs.listStatus(rootPath)
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => MetadataChain.exists(p, hconf))
      .map(p => Identifier.of(Array("default"), p.getName))
      .sortBy(_.name())
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().sameElements(Array("default")) &&
      MetadataChain.exists(datasetRoot(ident), hconf)

  override def loadTable(ident: Identifier): Table = loadTable(ident, asOf = None)

  /** `VERSION AS OF '<block-hash>'` / `.option("versionAsOf", hash)` →
    * as-of pinning, the catalog form of QueryService's reproducible reads. */
  override def loadTable(ident: Identifier, version: String): Table =
    loadTable(ident, asOf = Some(version))

  private def loadTable(ident: Identifier, asOf: Option[String]): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val ds = Dataset.open(spark, datasetRoot(ident).toString)
    asOf.foreach { h =>
      require(
        ds.chain.blockHashes().contains(h),
        s"dataset ${ident.name()} has no block $h"
      )
    }
    new GraftTable(s"$catalogName.default.${ident.name()}", ds, asOf)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only; use Dataset.create/IngestWriter")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
}

object GraftCatalog {

  /** Register a graft catalog on a running session. Catalog resolution is
    * lazy, so setting the conf keys at runtime is sufficient — the same
    * pattern Delta/Iceberg use in tests. */
  def register(spark: SparkSession, catalogName: String, rootUri: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$catalogName", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catalogName.root", rootUri)
  }
}

/**
 * One dataset as a DSv2 table (kamu_table.rs:161-295). Schema comes from the
 * chain (SetDataSchema — never inference), the file list is the chain's
 * slice selection for the pinned head, and the scan itself is Spark's own
 * parquet `FileTable` over those files — so `EXPLAIN` shows a plain
 * parquet `BatchScan` with PushedFilters/ReadSchema, and an as-of read
 * plans over only the slice files at or before the pinned block.
 */
final class GraftTable(
    tableName: String,
    ds: Dataset,
    asOf: Option[String]
) extends Table with SupportsRead {

  private val slicePaths: Seq[String] = ds.chain.slicePaths(ds.chain.slices(asOf))

  private val declaredSchema: StructType =
    ds.chain.schemaDdl(asOf).map(StructType.fromDDL).getOrElse(new StructType())

  override def name(): String = tableName

  override def schema(): StructType = declaredSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def properties(): util.Map[String, String] =
    (Map("provider" -> "graft", "kind" -> ds.kind) ++
      ds.chain.head.map { case (_, h) => "head" -> h } ++
      asOf.map("as-of" -> _)).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    ParquetTable(
      tableName,
      SparkSession.active,
      options,
      slicePaths,
      Some(declaredSchema),
      classOf[ParquetFileFormat]
    ).newScanBuilder(options)
}
