package graft.dataset

import org.apache.spark.sql.SparkSession
import org.json4s.jackson.Serialization

import graft.chain.MetadataChain
import graft.model.MetadataEvent

/**
 * Manifest-driven dataset creation — the reference's `DatasetSnapshot`
 * ("a projection of the dataset metadata at a single point in time …
 * typically used for defining new datasets", dtos_generated.rs:2138) behind
 * `kamu add` (add_command.rs). A manifest is JSON of the same shape:
 *
 * {{{
 * { "name": "cities",
 *   "kind": "root",
 *   "metadata": [
 *     { "kind": "SetPollingSource", "readFormat": "csv", ... },
 *     { "kind": "SetInfo", ... } ] }
 * }}}
 *
 * Event objects use the exact serialization the chain itself writes (the
 * `kind`-discriminated ADT in [[MetadataChain.formats]]), so anything a
 * block file can hold, a manifest can declare. (The reference accepts YAML;
 * zero-egress pins this build to the JSON encoding of the same schema.)
 */
final case class DatasetSnapshot(
    name: String,
    kind: String = "root",
    metadata: Seq[MetadataEvent] = Nil
)

object DatasetSnapshot {

  def parse(json: String): DatasetSnapshot =
    Serialization.read[DatasetSnapshot](json)(MetadataChain.formats, manifest[DatasetSnapshot])

  /** Create the dataset at `workspaceRoot/<name>` and populate its chain
    * with the manifest's events (Seed first, like the reference's add). */
  def add(
      spark: SparkSession,
      workspaceRoot: String,
      snapshot: DatasetSnapshot,
      systemTime: Long
  ): Dataset = {
    val root = new org.apache.hadoop.fs.Path(workspaceRoot, snapshot.name)
    val ds = Dataset.createAt(spark, root.toString, snapshot.name, snapshot.kind, systemTime)
    snapshot.metadata.foreach(ev => ds.chain.append(ev, systemTime))
    ds
  }

  private def manifest[T](implicit m: scala.reflect.Manifest[T]) = m
}
