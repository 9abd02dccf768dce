package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels for the text-hashing expressions; static so whole-stage
  * codegen calls them directly.
  */
object TextHashImpl {
  /** 64-bit SimHash of a token array: per token one xxhash64 (Spark's own
    * XXH64 kernel over the UTF8 bytes, seed 42), +1/-1 vote per bit, sign
    * of each vote column becomes the output bit. Single pass, no allocation
    * beyond the 64-slot vote array.
    */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private final val Mod = (1L << 61) - 1
  private final val Base = 1000003L

  /** a*b mod (2^61-1) for a,b < 2^61-1 via 128-bit fold:
    * x = hi*2^64 + lo, 2^61 = 1 (mod M) => x = (hi<<3 | lo>>>61) + (lo&M).
    */
  private def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = ((hi << 3) | (lo >>> 61)) + (lo & Mod)
    if (r >= Mod) r -= Mod
    r
  }

  /** Polynomial rolling hash of the UTF-8 bytes, mod 2^61-1 — the document
    * fingerprint primitive (content-defined chunking / shingle hashing use
    * the same kernel with the rolling-update identity).
    */
  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = mulmod(h, Base) + (bytes(i) & 0xffL) + 1L
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }
}

/** SimHash over a token array: `array<string> -> bigint`. Native Catalyst
  * expression (vs a UDF) so token arrays stream through codegen without
  * Row boxing. See [[graft.operators.Dedup.simhashPairs]] for the LSH use.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    TextHashImpl.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Polynomial rolling-hash fingerprint: `string -> bigint` (mod 2^61-1). */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    TextHashImpl.rollingHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.rollingHash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
