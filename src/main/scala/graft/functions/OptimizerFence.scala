package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity on the child VALUE, declared non-deterministic so the
  * optimizer will not duplicate it — the optimization guide §4.4
  * pattern (`udf.asNondeterministic()`), made available to built-in
  * expressions.
  *
  * Why it exists (r14, the Debezium adapter): a projected
  * `from_json(value).as("e")` whose fields feed a filter and a dozen
  * output columns gets torn apart by the optimizer — filter pushdown
  * substitutes the alias into the predicate, and the per-field JSON
  * schema pruning (OptimizeCsvJsonExprs) then rewrites every
  * `e.field` into its OWN pruned `from_json` — 15 copies in the
  * committed plan, each re-tokenizing the JSON string (and, where the
  * envelope is synthesized inline, re-running the `to_json` child
  * too). Fencing the parse keeps it ONE expression in ONE projection;
  * consumers read struct fields from the materialized column.
  *
  * The trade-off is the guide's own caveat: the fence also blocks
  * legitimate reorderings (e.g. pushing OTHER filters past it), so it
  * belongs on expressions whose single evaluation is worth more than
  * any pushdown — a whole-row parse is the canonical case. Values are
  * unchanged and deterministic in fact (the child is deterministic);
  * only the optimizer's license to clone is revoked, so task retries
  * recompute identical results. */
case class OptimizerFence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "optimizer_fence"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = childGen.code, isNull = childGen.isNull, value = childGen.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OptimizerFence =
    copy(child = newChild)
}

object OptimizerFence {
  /** Column wrapper: evaluate `c` exactly once per row wherever it is
    * projected; the optimizer may not clone or push through it. */
  def once(c: Column): Column =
    GraftColumnBridge.column(OptimizerFence(GraftColumnBridge.expression(c)))
}
