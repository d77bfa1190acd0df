package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{StructField, StructType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-token shingles as a GENERATOR — the native UDTF surface:
  * one input row yields N output rows directly, with no intermediate
  * array value. `explode(shingle_array(toks, n))` materializes every
  * doc's full shingle set as a GenericArrayData, copies it through the
  * projection, then explodes it; this Generator streams each shingle
  * straight into the child consumer, which matters when a long document
  * yields thousands of shingles (the array is pure allocation overhead).
  *
  * Output rows and ORDER are identical to `explode(shingle_array(...))`
  * — distinct, first-occurrence order — which the spec pins, so either
  * form can back the dedup operators.
  *
  * Round-19 (optimization): real `doGenCode` instead of CodegenFallback
  * — GenerateExec supports whole-stage codegen for arbitrary
  * IterableOnce generators (`codeGenIterableOnce`), but only when the
  * generator itself is not a fallback; the fallback forced the whole
  * scan→generate→consume pipeline out of codegen with a per-row
  * InternalRow materialization at the boundary (the MinHashSigs
  * round-18 finding, applied to the generator family). Same rows, same
  * order: the generated code calls the same [[rowsOf]] the interpreted
  * path uses.
  */
case class ShingleRows(child: Expression, n: Int)
    extends UnaryExpression with Generator with RowsGen {
  require(n >= 1)
  override def prettyName: String = "shingle_rows"

  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType, nullable = false)))

  /** Shared by the interpreted eval and the generated code. */
  override def rowsOf(v: ArrayData): IterableOnce[InternalRow] = {
    if (v == null) return Nil
    val arr = v
    val len = arr.numElements()
    if (len < n) return Nil
    val toks = new Array[String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val seen = new java.util.LinkedHashSet[String](len * 2)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i <= len - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[InternalRow](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) {
      out(i) = InternalRow(UTF8String.fromString(it.next())); i += 1
    }
    out
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    rowsOf(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    RowsGen.genCode(ctx, ev, child, this, "shingleRows")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
