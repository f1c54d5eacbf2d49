package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge to Spark's `private[sql]` Column↔Expression converters —
 * the standard mechanism extension libraries use to expose native Catalyst
 * expressions through the public Column API (Spark 4 hides the classic
 * `Column(expr)` constructor behind `classic.ExpressionUtils`).
 */
package object graftshim {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Mutate the live SparkContext conf (`private[spark]`; `getConf` only
    * returns a copy). Needed when a setting must be visible to SESSIONS
    * CREATED LATER — e.g. the isolated per-connection sessions the Thrift
    * server opens merge their SQLConf defaults from here, not from the
    * parent session's runtime conf. */
  def setContextConf(sc: org.apache.spark.SparkContext, key: String, value: String): Unit =
    sc.conf.set(key, value)
}
