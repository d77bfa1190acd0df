package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData

/** Shared codegen surface for the engine's array-input row generators
  * (shingles, BPE pieces, WordPiece pieces) — round-19.
  *
  * Why: the generators were CodegenFallback, and GenerateExec only
  * participates in whole-stage codegen when `generator.supportCodegen`
  * (= not a fallback). The fallback therefore forced every
  * scan→generate→consume pipeline out of codegen, materializing an
  * InternalRow per input row at the boundary — the same cost the
  * round-18 MinHashSigs conversion removed from the scalar side.
  * GenerateExec's `codeGenIterableOnce` path inlines any generator
  * whose generated value is a `scala.collection.IterableOnce<InternalRow>`;
  * [[RowsGen.genCode]] emits exactly that, calling the SAME [[rowsOf]]
  * the interpreted eval uses, so rows and order are identical by
  * construction.
  */
trait RowsGen {
  /** Null-tolerant row stream of one input array (Nil for null). */
  def rowsOf(v: ArrayData): IterableOnce[InternalRow]
}

object RowsGen {
  /** doGenCode body for a unary Generator with [[RowsGen]]: evaluate the
    * child array, hand it to `rowsOf` through a plan reference.
    */
  def genCode(ctx: CodegenContext, ev: ExprCode, child: Expression,
      gen: RowsGen, tag: String): ExprCode = {
    val ref = ctx.addReferenceObj(tag, gen, classOf[RowsGen].getName)
    val childGen = child.genCode(ctx)
    val rows = ctx.freshName(tag + "Out")
    val block =
      code"""
        |${childGen.code}
        |scala.collection.IterableOnce<InternalRow> $rows =
        |  $ref.rowsOf(${childGen.isNull} ? null : ${childGen.value});
      """.stripMargin
    ev.copy(code = block, isNull = FalseLiteral,
      value = JavaCode.variable(rows, classOf[IterableOnce[_]]))
  }
}
