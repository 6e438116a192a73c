package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst set/array counters over `array<long>` columns —
  * the per-candidate-pair hot path of the MinHash estimator-quality
  * operator ([[graft.pipeline.Dedup.minhashAccuracy]]).
  *
  * The Catalyst built-ins for the same math are interpreted per row:
  * `size(filter(zip_with(a, b, _ === _), identity))` allocates the
  * zipped array and evaluates boxed lambdas per element, and
  * `array_intersect` builds a hash set per call. At ~75k candidate
  * pairs × ~300-element shingle sets that interpreted overhead is the
  * entire query cost (measured ~7 s of an sf0.1 noop-write, vs <1 s
  * when the scored columns are pruned). These compile into
  * whole-stage codegen as primitive loops — same design as [[VecDot]]
  * and [[ShingleHash]] (SURVEY.md §4).
  */
object SetOps {

  /** Column wrapper: positions where both arrays hold the same long. */
  def eqCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      LongArrayEqCount(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column wrapper: |a ∩ b| for SORTED DISTINCT long arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      SortedSetIntersectCount(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column wrapper: |a ∩ b| for SORTED DISTINCT string arrays —
    * the [[graft.pipeline.EntityResolution]] token-set hot path. */
  def sortedStrIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      SortedStrSetIntersectCount(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Count of positions i where `a[i] == b[i]` — the MinHash
  * agreement count. Equal-length inputs expected (fixed-width
  * signatures); a length mismatch yields NULL, not a prefix count —
  * bad data surfaces as null (the [[VecDot]] convention). Elements
  * must be non-null (minhash aggregates never produce null slots). */
case class LongArrayEqCount(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "long_array_eq_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) null
    else LongArrayEqCount.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.LongArrayEqCount.compute($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayEqCount =
    copy(left = newLeft, right = newRight)
}

object LongArrayEqCount {
  /** Called from generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var c = 0L
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }
}

/** |a ∩ b| by a single merge walk — REQUIRES both inputs sorted
  * ascending with distinct non-null elements (i.e. `sort_array` of a
  * `collect_set` / `array_distinct` result). O(|a| + |b|) with no
  * per-row allocation, where `array_intersect` builds a hash set per
  * call. Values are identical to `size(array_intersect(a, b))` under
  * the set precondition. */
case class SortedSetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_set_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedSetIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedSetIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedSetIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedSetIntersectCount {
  /** Called from generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** |a ∩ b| by a single merge walk over SORTED DISTINCT `array<string>`
  * inputs (non-null elements) — the string twin of
  * [[SortedSetIntersectCount]], compared with `UTF8String.compareTo`,
  * i.e. the same binary ordering `array_sort` establishes. Values are
  * identical to `size(array_intersect(a, b))` under the precondition;
  * unlike array_intersect there is no per-row hash-set build, which is
  * the entire scoring cost of the entity-resolution candidate pass
  * (one call per candidate pair). */
case class SortedStrSetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_str_set_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedStrSetIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedStrSetIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedStrSetIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedStrSetIntersectCount {
  /** Called from generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = try {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  } catch {
    // precondition: sorted, distinct, NO null elements (the callers
    // feed array_sort(array_distinct(...)) of non-null tokens). A
    // violation previously surfaced as a bare NPE deep inside codegen
    // (r13 ADVICE) — name the contract instead. The guard lives in a
    // catch, NOT as per-element checks: this loop runs once per
    // candidate PAIR (millions in the er family), and the happy path
    // must stay two loads + one compare per step.
    case _: NullPointerException => throw new IllegalArgumentException(
      "sorted_str_set_intersect_count: null array element — inputs must be sorted, distinct, null-free")
  }
}
