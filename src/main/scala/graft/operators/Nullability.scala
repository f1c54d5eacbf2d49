package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Nullability coercion and runtime assertions — the reference marks join
 * outputs non-null after merges and asserts at runtime via an
 * `assert_not_null` UDF (src/odf/data-utils/src/data/dataframe_ext.rs:199-286,
 * data/udf.rs:23-108). Spark-first: `raise_error` expressions (codegen'd, no
 * Scala UDF) for the runtime check; a schema rewrite for the static flags.
 */
object Nullability {

  /** Runtime assertion: any null in `cols` fails the job with a message
    * naming the column (udf.rs:23-39, but as a codegen'd expression). */
  def assertNotNull(df: DataFrame, cols: Seq[String]): DataFrame = {
    val projected = df.columns.map { c =>
      if (cols.contains(c))
        when(
          col(c).isNull,
          raise_error(lit(s"assert_not_null failed: column '$c' contains a null"))
            .cast(df.schema(c).dataType)
        ).otherwise(col(c)).as(c)
      else col(c)
    }
    df.select(projected.toSeq: _*)
  }

  /** Element-level assertion for array columns
    * (assert_list_elements_not_null, udf.rs:41-108): returns the array with
    * each element checked; a null element fails the job. */
  def assertArrayElementsNotNull(arr: Column, colName: String): Column =
    transform(
      arr,
      e =>
        when(
          e.isNull,
          raise_error(
            lit(s"assert_list_elements_not_null failed: column '$colName' has a null element")
          )
        ).otherwise(e)
    )

  /** Rewrite the static nullable flags to match `target` (names/types must
    * already match). Lazy — the RDD conversion defers to execution; rows are
    * NOT validated here, pair with [[assertNotNull]] when the data could
    * violate the target. */
  def coerceNullability(df: DataFrame, target: StructType): DataFrame = {
    require(
      df.schema.fields.map(f => (f.name, f.dataType)).sameElements(
        target.fields.map(f => (f.name, f.dataType))
      ),
      s"schema mismatch: ${df.schema.simpleString} vs ${target.simpleString}"
    )
    df.sparkSession.createDataFrame(df.rdd, target)
  }

  /** Mark the given columns non-null in the schema (+ runtime assert). */
  def markNotNull(df: DataFrame, cols: Seq[String]): DataFrame = {
    val checked = assertNotNull(df, cols)
    val target = StructType(df.schema.fields.map { f =>
      if (cols.contains(f.name)) f.copy(nullable = false) else f
    })
    coerceNullability(checked, target)
  }
}
