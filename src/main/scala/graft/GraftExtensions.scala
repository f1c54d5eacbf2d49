package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{MinHashSignatureExpr, SimHash64Expr}

/**
 * Session extensions exposing graft's native Catalyst expressions to SQL:
 *
 * {{{
 *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
 *   // or: --conf spark.sql.extensions=graft.GraftExtensions
 *   spark.sql("SELECT minhash_signature(shingles, 64) FROM docs")
 * }}}
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other               => throw new IllegalArgumentException(s"$what must be a literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case other               => throw new IllegalArgumentException(s"$what must be a literal, got $other")
  }

  /** (identifier, info, builder) triples — also usable directly against a
    * session's FunctionRegistry. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "minhash_signature"),
      (args: Seq[Expression]) =>
        args match {
          case Seq(arr)          => MinHashSignatureExpr(arr, 64, 42L)
          case Seq(arr, k)       => MinHashSignatureExpr(arr, intArg(k, "numHashes"), 42L)
          case Seq(arr, k, seed) =>
            MinHashSignatureExpr(arr, intArg(k, "numHashes"), longArg(seed, "seed"))
          case other =>
            throw new IllegalArgumentException(
              s"minhash_signature(arr[, numHashes[, seed]]) got ${other.size} args")
        }
    ),
    (
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) =>
        args match {
          case Seq(arr)       => SimHash64Expr(arr, 42L)
          case Seq(arr, seed) => SimHash64Expr(arr, longArg(seed, "seed"))
          case other =>
            throw new IllegalArgumentException(s"simhash64(arr[, seed]) got ${other.size} args")
        }
    ),
    (
      new FunctionIdentifier("keccak256"),
      new ExpressionInfo(classOf[graft.functions.Keccak256Expr].getName, "keccak256"),
      (args: Seq[Expression]) =>
        args match {
          case Seq(v) => graft.functions.Keccak256Expr(v, prefixed = false)
          case other =>
            throw new IllegalArgumentException(s"keccak256(value) got ${other.size} args")
        }
    ),
    (
      new FunctionIdentifier("eth_event_selector"),
      new ExpressionInfo(classOf[graft.functions.Keccak256Expr].getName, "eth_event_selector"),
      (args: Seq[Expression]) =>
        args match {
          case Seq(v) => graft.functions.Keccak256Expr(v, prefixed = true)
          case other =>
            throw new IllegalArgumentException(s"eth_event_selector(signature) got ${other.size} args")
        }
    )
  )
}
