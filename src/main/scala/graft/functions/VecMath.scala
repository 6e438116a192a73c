package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns —
  * the scalar hot path of every vector operator (cosine scoring in
  * the ANN family and embedding dedup).
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) → x·y), 0.0, (acc,x) → acc + x)`
  * — a strict ascending-index left fold, the exact evaluation order of
  * the DuckDB oracle's `list_reduce` — but where that HOF tree is
  * interpreted per element with boxed lambdas and allocates the zipped
  * array per pair, this compiles to one primitive loop inside
  * whole-stage codegen. Measured ~10-100× on per-pair scoring (same
  * lesson as [[ShingleHash]]; SURVEY.md §4).
  *
  * Norms are `VecDot(v, v)` — no separate expression needed.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Nullable even over non-null inputs: mismatched vector lengths
  // yield NULL (matching the oracle's list_transform NULL propagation
  // when one list is shorter) instead of silently folding the prefix —
  // bad data surfaces as null, not as a wrong score.
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) null else VecDot.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VecDot.compute($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {

  /** Strict ascending-index fold; called from generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Column wrapper. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
