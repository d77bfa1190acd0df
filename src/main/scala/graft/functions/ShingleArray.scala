package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct contiguous n-token shingles of a token array, in one pass.
  *
  * Replaces the `transform(sequence(...), i -> array_join(slice(...)))`
  * higher-order-function composition: Spark evaluates lambda HOFs in
  * interpreted mode, which measured ~300µs/doc at sf0.1 — this single
  * eval is ~10× faster and is the hot inner loop of every shingle-based
  * dedup operator. (CodegenFallback: the loop body lives in one JVM
  * method, so codegen would only save the call boundary.)
  */
case class ShingleArray(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
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

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
