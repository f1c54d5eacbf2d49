package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/**
 * Byte-code kernels for scalar-quantized (SQ8) vectors: a dim-d embedding
 * stored as d UNSIGNED bytes (one per dimension) instead of d longs — 8x
 * less memory/shuffle than the long-quantized form, which is the difference
 * between an in-memory and a spilled ANN corpus at 100 TB. Distances stay
 * exact integer arithmetic over the codes, so operators built on these
 * remain DuckDB-oracle-checkable (the oracle computes the same codes as
 * plain integer lists).
 */
object ByteCodes {

  /** Column API: pack an array<long> of values in [0, 255] into a binary
    * column (one byte per element). Values outside the range are clamped —
    * encoders clamp anyway; this keeps the kernel total. */
  def packBytes(codes: Column): Column =
    columnOf(PackBytesExpr(expressionOf(codes)))

  /** Column API: exact dot product of two packed byte-code vectors as
    * UNSIGNED bytes — `binary x binary -> long`, one tight loop, codegen'd. */
  def byteDot(a: Column, b: Column): Column =
    columnOf(ByteDotExpr(expressionOf(a), expressionOf(b)))
}

case class PackBytesExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<long>, got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_bytes"

  override def nullSafeEval(input: Any): Any =
    PackBytesExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.PackBytesExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PackBytesExpr =
    copy(child = newChild)
}

object PackBytesExpr {
  def compute(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = if (a.isNullAt(i)) 0L else a.getLong(i)
      out(i) = math.min(255L, math.max(0L, v)).toByte
      i += 1
    }
    out
  }
}

case class ByteDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary columns, got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    ByteDotExpr.compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.ByteDotExpr.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteDotExpr =
    copy(left = newLeft, right = newRight)
}

object ByteDotExpr {
  def compute(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += (a(i) & 0xffL) * (b(i) & 0xffL)
      i += 1
    }
    acc
  }
}
