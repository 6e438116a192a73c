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

/** Nearest-centroid assignment against a FIXED centroid matrix, as one
  * codegen'd scalar: `struct(cell int, cos double)` of the
  * max-cosine centroid (ties → lowest cell index, NaN ordered largest
  * like Spark's struct max).
  *
  * This replaces the broadcast-K-expansion + aggregate assignment
  * shape: a join against K centroids materializes K (v, cv) array
  * pairs per input row before the partial max collapses them — all
  * allocation, no information. Here the matrix rides along as a
  * reference object (the codegen analogue of a broadcast: K ≤ 4096 ×
  * dim doubles of metadata) and each row is ONE primitive loop nest
  * inside whole-stage codegen — the assignment stage becomes map-only
  * with zero expansion. Same cosine arithmetic as the join form:
  * ascending-index dots, `dot / (√n2 · √cn2)`.
  *
  * The matrix is driver-collected metadata, bounded like any
  * broadcast side; data vectors never leave the executors. */
case class VecNearestCell(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  // null input OR a vector whose length mismatches the centroid dim
  // (the VecDot convention: bad-length data surfaces as NULL, never
  // as a silently truncated dot)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_nearest_cell"

  @transient private lazy val cn2: Array[Double] = centroids.map { c =>
    var acc = 0.0d; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    acc
  }

  /** Called from generated code (and interpreted eval). Returns null
    * (not a plausible-looking cell) when the vector's length differs
    * from the centroid dimension — matching [[VecDot]]'s
    * null-on-length-mismatch convention, so bad-length data surfaces
    * the same way the exact refine would surface it. */
  def computeRow(v: ArrayData): InternalRow = {
    val n = v.numElements()
    if (centroids.length > 0 && n != centroids(0).length) return null
    var n2 = 0.0d
    var i = 0
    while (i < n) { val x = v.getDouble(i); n2 += x * x; i += 1 }
    val sn = math.sqrt(n2)
    var best = -1
    var bestCos = 0.0d
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      var acc = 0.0d
      var j = 0
      while (j < n) { acc += v.getDouble(j) * cv(j); j += 1 }
      val cos = acc / (sn * math.sqrt(cn2(c)))
      // Double.compare: NaN largest, like Spark's struct-max ordering;
      // strict > keeps the first (lowest) cell on ties
      if (best < 0 || java.lang.Double.compare(cos, bestCos) > 0) {
        best = c; bestCos = cos
      }
      c += 1
    }
    InternalRow(best, bestCos)
  }

  override protected def nullSafeEval(v: Any): Any =
    computeRow(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCell", this, classOf[VecNearestCell].getName)
    val r = ctx.freshName("nearestRow")
    nullSafeCodeGen(ctx, ev, a => s"""
      org.apache.spark.sql.catalyst.InternalRow $r =
        (org.apache.spark.sql.catalyst.InternalRow) $ref.computeRow($a);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): VecNearestCell =
    copy(child = newChild)
}

object VecNearestCell {
  /** Column wrapper: nearest of `centroids` by cosine for each row of
    * vector column `v`. */
  def nearest(v: Column, centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      VecNearestCell(GraftColumnBridge.expression(v), centroids))
}
