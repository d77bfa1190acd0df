package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — Spark has
  * no built-in for it, yet it is the first step of every serious text
  * pipeline: without canonical composition, "café" spelled with U+00E9
  * and with e + U+0301 are different strings to dedup, fingerprinting
  * and tokenization alike (same visible text, different hashes — the
  * classic silent near-dup leak). DuckDB's nfc_normalize makes the
  * operator oracle-checkable.
  */
case class NormalizeNFC(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeNFC.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNFC.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeNFC {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: already-NFC text (the overwhelming majority of a real
    // corpus) skips the allocation entirely
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
