package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-unigram Shannon entropy of a string, in bits, as ONE
  * codegen'd scalar — the text-diversity signal of quality filtering
  * (gibberish and keyboard-mash docs sit at the distribution's tails;
  * MassiveText-family pipelines cut on it alongside the Gopher rules).
  *
  * H = log2(n) − (Σ_ch c_ch·log2 c_ch)/n over code-point counts — the
  * count-based decomposition, so every log argument is a SMALL
  * INTEGER (≤ doc length). That is the bit-stability contract with
  * the DuckDB oracle: both engines take ln of the same integers
  * (empirically bit-identical across Java's Math.log and libm for
  * every integer a document can reach) and fold the per-character
  * terms in ascending code-point order, so the resulting doubles
  * match exactly. A p·log2 p formulation would take logs of arbitrary
  * rationals instead, where cross-engine last-ulp agreement has no
  * such anchor.
  *
  * Why an Expression and not explode+groupBy: per-char explode
  * re-shuffles the corpus at its CHARACTER grain (the 100 TB corpus
  * becomes a ~100 TB exchange); this is a map-only scan that fuses
  * into whole-stage codegen like [[VecDot]].
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(s: Any): Any =
    CharEntropy.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {

  private val Ln2 = math.log(2.0)

  /** Ascending code-point fold; called from generated code. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    val counts = new java.util.TreeMap[Integer, Integer]()
    var idx = 0
    var n = 0L
    while (idx < str.length) {
      val cp = str.codePointAt(idx)
      counts.merge(cp, 1, (a, b) => a + b)
      idx += Character.charCount(cp)
      n += 1
    }
    if (n == 0L) return 0.0
    var acc = 0.0d
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      acc += c * (math.log(c) / Ln2)
    }
    math.log(n.toDouble) / Ln2 - acc / n
  }

  /** Column wrapper. */
  def of(text: Column): Column =
    GraftColumnBridge.column(CharEntropy(GraftColumnBridge.expression(text)))
}
