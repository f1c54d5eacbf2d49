package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Keccak-256 (the ORIGINAL Keccak padding 0x01, as used by Ethereum — NOT
 * NIST SHA3-256, whose domain byte is 0x06; the JDK ships only the NIST
 * variant, hence this from-spec implementation of Keccak-f[1600] with
 * rate 1088). Backs the `eth_event_selector` SQL function — the role of the
 * reference's datafusion-ethers UDF (SURVEY §2.6;
 * src/infra/core/src/services/ingest/fetch_service/evm.rs:148): an event
 * signature string hashes to the log's `topics[0]` selector, e.g.
 * `Transfer(address,address,uint256)` →
 * `0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef`.
 */
object Keccak {
  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL, 0x8000000080008000L,
    0x000000000000808bL, 0x0000000080000001L, 0x8000000080008081L, 0x8000000000008009L,
    0x000000000000008aL, 0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L, 0x8000000000008003L,
    0x8000000000008002L, 0x8000000000000080L, 0x000000000000800aL, 0x800000008000000aL,
    0x8000000080008081L, 0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // rho rotation offsets r[x][y], lane i = x + 5y (FIPS 202, §3.2.2;
  // flat form 0,1,62,28,27, 36,44,6,55,20, 3,10,43,25,39, 41,45,15,21,8,
  // 18,2,61,56,14 — verified by the test vectors)
  private val ROT: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18),   // x = 0, y = 0..4
    Array(1, 44, 10, 45, 2),   // x = 1
    Array(62, 6, 43, 15, 61),  // x = 2
    Array(28, 55, 25, 21, 56), // x = 3
    Array(27, 20, 39, 8, 14))  // x = 4

  private def keccakF(s: Array[Long]): Unit = {
    var round = 0
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    val b = new Array[Long](25)
    while (round < 24) {
      var x = 0
      while (x < 5) {
        c(x) = s(x) ^ s(x + 5) ^ s(x + 10) ^ s(x + 15) ^ s(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        x += 1
      }
      var i = 0
      while (i < 25) { s(i) ^= d(i % 5); i += 1 }
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) = java.lang.Long.rotateLeft(s(x + 5 * y), ROT(x)(y))
          y += 1
        }
        x += 1
      }
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          s(x + 5 * y) = b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      s(0) ^= RC(round)
      round += 1
    }
  }

  /** Keccak-256 digest (32 bytes) of `msg`. Rate = 136 bytes; pad 0x01…0x80. */
  def hash256(msg: Array[Byte]): Array[Byte] = {
    val rate = 136
    val state = new Array[Long](25)
    val padded = {
      val padLen = rate - (msg.length % rate)
      val out = java.util.Arrays.copyOf(msg, msg.length + padLen)
      out(msg.length) = 0x01.toByte
      out(out.length - 1) = (out(out.length - 1) | 0x80).toByte
      out
    }
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < rate / 8) {
        var lane = 0L
        var bte = 0
        while (bte < 8) {
          lane |= (padded(off + i * 8 + bte) & 0xffL) << (8 * bte)
          bte += 1
        }
        state(i) ^= lane
        i += 1
      }
      keccakF(state)
      off += rate
    }
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      var bte = 0
      while (bte < 8) {
        out(i * 8 + bte) = ((state(i) >>> (8 * bte)) & 0xff).toByte
        bte += 1
      }
      i += 1
    }
    out
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb.append(HexDigits((bytes(i) >> 4) & 0xf)).append(HexDigits(bytes(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  /** `topics[0]` selector of an event signature: 0x-prefixed keccak256. */
  def eventSelector(signature: String): String =
    "0x" + hex(hash256(signature.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** Column API: lowercase hex keccak256 of a string/binary column. */
  def keccak256(c: Column): Column = columnOf(Keccak256Expr(expressionOf(c), prefixed = false))

  /** Column API: 0x-prefixed selector form (matches eth log `topics[0]`). */
  def ethEventSelector(c: Column): Column =
    columnOf(Keccak256Expr(expressionOf(c), prefixed = true))
}

case class Keccak256Expr(child: Expression, prefixed: Boolean) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string or binary, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = if (prefixed) "eth_event_selector" else "keccak256"

  override def nullSafeEval(input: Any): Any =
    Keccak256Expr.compute(input, prefixed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.Keccak256Expr.compute($c, $prefixed);")

  override protected def withNewChildInternal(newChild: Expression): Keccak256Expr =
    copy(child = newChild)
}

object Keccak256Expr {
  def compute(input: Any, prefixed: Boolean): UTF8String = {
    val bytes = input match {
      case s: UTF8String  => s.getBytes
      case b: Array[Byte] => b
      case other => throw new IllegalArgumentException(s"keccak256: unsupported input $other")
    }
    val h = Keccak.hex(Keccak.hash256(bytes))
    UTF8String.fromString(if (prefixed) "0x" + h else h)
  }
}
