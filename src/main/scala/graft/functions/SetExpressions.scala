package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/**
 * Native membership test of a long column against a LITERAL sorted set,
 * shipped once as a codegen reference object (never as a per-row array
 * literal): `long -> boolean` via binary search — ~22 compares at 4M
 * entries, inside whole-stage codegen.
 *
 * Exists for the map-only path of corpus-wide line dedup
 * ([[graft.operators.Corpus.dedupLines]]): the duplicated-line hash set is
 * tiny next to the corpus, so each executor probes it in place and the
 * corpus text never shuffles. `array_contains(lit(...), x)` would be a
 * linear scan per row AND re-ship the array through the expression tree;
 * a join would force explode + regroup of the full text.
 */
object SetExpressions {

  /** Column API: `value IN sortedSet` for a long column. `sortedSet` MUST be
    * ascending and distinct (callers sort; enforced here). */
  def longSetContains(value: Column, sortedSet: Array[Long]): Column =
    columnOf(LongSortedSetContainsExpr(expressionOf(value), sortedSet.toSeq))
}

case class LongSortedSetContainsExpr(child: Expression, sorted: Seq[Long])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires long, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "long_set_contains"
  private lazy val arr: Array[Long] = {
    val a = sorted.toArray
    var i = 1
    while (i < a.length) {
      require(a(i - 1) < a(i), s"$prettyName set must be ascending and distinct")
      i += 1
    }
    a
  }

  override def nullSafeEval(input: Any): Any =
    java.util.Arrays.binarySearch(arr, input.asInstanceOf[Long]) >= 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedSet", arr, "long[]")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = java.util.Arrays.binarySearch($ref, $c) >= 0;")
  }

  override protected def withNewChildInternal(newChild: Expression): LongSortedSetContainsExpr =
    copy(child = newChild)
}
