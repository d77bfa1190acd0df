package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over Unicode code points, mod 2^31:
  * h := (h*31 + codePoint) mod 2^31, h0 = 0.
  *
  * The engine's document-fingerprint primitive (SURVEY.md §2.4 "text
  * analysis"). Deliberately definable in ANSI-ish SQL (DuckDB:
  * list_reduce over unicode(char)) so fingerprint queries remain
  * oracle-checkable. Native Catalyst expression with codegen — stays
  * inside whole-stage codegen, unlike a Scala UDF which would box every
  * row.
  */
case class RollingHash31(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash31"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash31.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash31.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash31 {
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) & 0x7fffffffL
      i += Character.charCount(cp)
    }
    h
  }
}

/** FNV-1a 32-bit over UTF-8 bytes, masked to 31 bits — bit-exact parity
  * with the reference's shuffle partitioner `ihash`
  * (/root/reference/mr/worker.go:29-33). Not needed for correctness (any
  * partitioner groups keys correctly — SURVEY.md §2.3); kept as the
  * codegen'd `Expression` surface demo and for golden partition tests.
  */
case class Fnv1a32(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a32"

  override protected def nullSafeEval(input: Any): Any =
    Fnv1a32.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Fnv1a32.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fnv1a32 {
  def hash(bytes: Array[Byte]): Long = {
    var h = 2166136261L
    var i = 0
    while (i < bytes.length) {
      h = h ^ (bytes(i) & 0xffL)
      h = (h * 16777619L) & 0xffffffffL
      i += 1
    }
    h & 0x7fffffffL
  }
}
