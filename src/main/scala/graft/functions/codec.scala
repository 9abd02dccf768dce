package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** JVM gzip codec used by both the interpreted and the generated code paths.
  *
  * Re-expresses the reference's decompress step (`/root/reference/shipper.js:123`,
  * `Zlib.gunzipSync(payload).toString('utf8')`) as a distributed scalar primitive.
  * Kept as a plain static-forwarding object so whole-stage codegen can call it
  * directly (`graft.functions.GzipCodec.gunzip(bytes)`).
  */
object GzipCodec {
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 8192)
    val out = new ByteArrayOutputStream(math.max(64, bytes.length * 4))
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.max(64, bytes.length / 2))
    val gz = new GZIPOutputStream(out, 8192)
    gz.write(bytes)
    gz.close()
    out.toByteArray
  }
}

/** Catalyst-native gunzip: `binary -> binary`.
  *
  * A custom `UnaryExpression` (not a Scala UDF) so the decode stays inside
  * whole-stage codegen: no Row boxing, null-safe short-circuit for free, and
  * the expression participates in Catalyst rules (e.g. constant folding when
  * the input is a literal).
  */
case class Gunzip(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = BinaryType
  // declared input type => SQL callers get the standard string->binary
  // implicit cast instead of a runtime ClassCastException
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gunzip"

  override def nullSafeEval(input: Any): Any =
    GzipCodec.gunzip(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipCodec.gunzip($c)")

  override protected def withNewChildInternal(newChild: Expression): Gunzip =
    copy(child = newChild)
}

/** Catalyst-native gzip (the encode side — used to build CloudWatch-shaped
  * envelopes for fixtures and round-trip tests): `binary -> binary`.
  */
case class Gzip(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = BinaryType
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gzip"

  override def nullSafeEval(input: Any): Any =
    GzipCodec.gzip(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipCodec.gzip($c)")

  override protected def withNewChildInternal(newChild: Expression): Gzip =
    copy(child = newChild)
}

/** Column-level API for the graft-native expressions. */
object gcolumns {
  /** Decompress a gzip-compressed binary column. */
  def gunzip(c: Column): Column = Bridge.column(Gunzip(Bridge.expression(c)))

  /** Gzip-compress a binary column. */
  def gzip(c: Column): Column = Bridge.column(Gzip(Bridge.expression(c)))

  /** 64-bit SimHash of a token array column. */
  def simhash64(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))

  /** Polynomial rolling-hash fingerprint of a string column (mod 2^61-1). */
  def rolling_hash(c: Column): Column = Bridge.column(RollingHash(Bridge.expression(c)))

  /** Distinct k-word shingles of a string column (codegen'd). */
  def word_shingles(c: Column, k: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(c), k))

  /** Sequential (oracle-parity) dot product of two double-array columns. */
  def dotp(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Z-order (Morton) value of two int columns' low 16 bits. */
  def zorder2(x: Column, y: Column): Column =
    Bridge.column(ZOrder2(Bridge.expression(x), Bridge.expression(y)))
}
