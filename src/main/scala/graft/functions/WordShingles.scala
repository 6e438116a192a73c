package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-shingling over a token array — the dedup
  * family's per-row hot path, replacing the interpreted HOF chain
  *
  * {{{
  *   when(size(toks) >= k,
  *     array_distinct(transform(sequence(1, size(toks) - (k-1)),
  *       i => concat_ws(" ", element_at(toks, i), ..., element_at(toks, i+k-1)))))
  *     .otherwise(array())
  * }}}
  *
  * value-for-value: one UTF8String concat per window position (the
  * same null-skipping `concatWs` the HOF used), distinct preserving
  * FIRST OCCURRENCE order (array_distinct's order), empty array for
  * short or NULL inputs (the `when` guard's `otherwise` branch — note
  * `size(null) >= k` is null, so the HOF form also fell through to
  * the empty array, never to null). The HOF tree evaluated
  * interpreted with boxed lambdas and allocated the index sequence,
  * k element_at probes and a distinct pass per row; this is one
  * primitive loop inside whole-stage codegen (the SetOps/ShingleHash
  * precedent, r14 — guide §1.2 per-task work). */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_shingles"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WordShingles.empty()
    else WordShingles.compute(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val kLit = k.toString
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${c.isNull}
        ? graft.functions.WordShingles.empty()
        : graft.functions.WordShingles.compute(${c.value}, $kLit);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  private val EmptyArray = new GenericArrayData(Array.empty[Any])
  /** Called from generated code. */
  def empty(): ArrayData = EmptyArray

  private val Space = UTF8String.fromString(" ")

  /** Called from generated code: k-word shingles, concatWs-joined
    * (null elements skipped, like the HOF's concat_ws), first-
    * occurrence-distinct. */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return EmptyArray
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def shingles(toks: Column, k: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(toks), k))
}
