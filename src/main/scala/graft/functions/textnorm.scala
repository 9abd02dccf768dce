package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC kernel; static so whole-stage codegen calls it directly.
  *
  * The common crawl-corpus case is pure ASCII, for which NFC is the
  * identity — `Normalizer.isNormalized` is a cheap scan that skips the
  * String round-trip (and any allocation) on that fast path, so the
  * expression costs ~a byte scan per row until it actually has work to do.
  */
object TextNormImpl {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Catalyst-native Unicode NFC normalization: `string -> string`.
  *
  * Spark has no composition-normalization builtin, and a crawl-scale
  * curation pipeline normalizes EVERY document before hashing/dedup (NFD
  * "e + combining accent" and NFC "é" must dedup as equals). A custom
  * `UnaryExpression` keeps the kernel inside whole-stage codegen — no Row
  * boxing, free null short-circuit — where a Scala UDF would break the
  * codegen span for the whole projection.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    TextNormImpl.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormImpl.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextNorm {
  /** Column wrapper: Unicode NFC normalization. */
  def nfcNormalize(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
}
