package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct polynomial hashes of the char
  * k-grams of a string, in one primitive JVM pass.
  *
  * Semantically identical to
  * `array_distinct(transform(sequence(...), i → aggregate(slice(
  * charCodes(s), i, k), 0, (acc,c) → (acc·B + c) mod M)))` (see
  * [[Hashes.shingleHashesFromCodes]]) — same values bit-for-bit — but
  * where the HOF tree is interpreted per element with boxed lambdas,
  * this compiles to a static call inside whole-stage codegen:
  * no per-element virtual dispatch, no intermediate code-point array,
  * no per-window slice allocation.
  *
  * This is the (b) tier of the custom-operator ladder (compose < native
  * Expression < custom plan): the built-ins CAN express the semantics
  * but can't execute them efficiently, so only the scalar expression is
  * custom — everything around it stays declarative and optimizable.
  */
case class ShingleHash(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hash"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {
  import Hashes.{B, M}

  /** One-pass primitive implementation; called from generated code. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val codes = s.toString.codePoints().toArray
    val n = codes.length
    val nWindows = math.max(n - k + 1, 1)
    val seen = new java.util.HashSet[java.lang.Long](nWindows * 2)
    val out = new Array[Long](nWindows)
    var outLen = 0
    var i = 0
    while (i < nWindows) {
      var acc = 0L
      var j = i
      val end = math.min(i + k, n) // windows past the end fold what exists
      while (j < end) { acc = (acc * B + codes(j)) % M; j += 1 }
      if (seen.add(acc)) { out(outLen) = acc; outLen = 1 + outLen }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }

  /** Column wrapper. */
  def shingleHashes(c: Column, k: Int): Column =
    GraftColumnBridge.column(ShingleHash(GraftColumnBridge.expression(c), k))
}
