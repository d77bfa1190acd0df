package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct contiguous n-token shingles of a token array, in one pass.
  *
  * Replaces the `transform(sequence(...), i -> array_join(slice(...)))`
  * higher-order-function composition: Spark evaluates lambda HOFs in
  * interpreted mode, which measured ~300µs/doc at sf0.1 — this single
  * eval is ~10× faster and is the hot inner loop of every shingle-based
  * dedup operator.
  *
  * Round-19 (optimization): proper `doGenCode` instead of
  * CodegenFallback — the fallback forced the enclosing projection out
  * of whole-stage codegen (per-row InternalRow materialization around
  * the call, the MinHashSigs round-18 finding); the generated code now
  * calls the same static [[ShingleArray.compute]] inline.
  */
case class ShingleArray(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"

  override protected def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleArray.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleArray {
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) new GenericArrayData(Array.empty[Any])
    else {
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
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      i = 0
      while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
      new GenericArrayData(out)
    }
  }
}
