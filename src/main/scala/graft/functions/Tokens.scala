package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer — the engine's ONE tokenization rule
  * (`filter(split(lower(text), " "), t -> length(t) > 0)`), fused
  * into a single codegen'd pass. The HOF form paid, per row: a regex
  * split materializing every segment INCLUDING the empties, then an
  * interpreted ArrayFilter (higher-order functions are
  * CodegenFallback) invoking a boxed lambda per segment. This is one
  * `toLowerCase` (the same UTF8String op the Lower expression calls)
  * plus one byte scan emitting zero-copy slices of the lowered
  * buffer.
  *
  * Value-for-value with the HOF chain: the split pattern is the
  * literal single space (no regex semantics to preserve beyond the
  * byte 0x20, which can never occur inside a multi-byte UTF-8
  * sequence), consecutive/leading/trailing spaces yield empties the
  * filter dropped (here: never emitted), the empty string yields an
  * empty array, NULL propagates. Tabs/newlines are NOT separators —
  * exactly like the original. Pinned by TokensSpec. Every text
  * operator's scan stage shares this rule (guide §1.2 per-task work,
  * r14). */
case class Tokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"

  override protected def nullSafeEval(v: Any): Any =
    Tokens.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Tokens.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
}

object Tokens {

  /** Called from generated code: lowercase once, split on the space
    * byte, emit non-empty zero-copy slices. */
  def compute(text: UTF8String): ArrayData = {
    val lowered = text.toLowerCase
    val n = lowered.numBytes
    val base = lowered.getBaseObject
    val off = lowered.getBaseOffset
    val out = new java.util.ArrayList[Any]()
    var start = 0
    var i = 0
    while (i < n) {
      if (lowered.getByte(i) == 0x20) {
        if (i > start) out.add(UTF8String.fromAddress(base, off + start, i - start))
        start = i + 1
      }
      i += 1
    }
    if (n > start) out.add(UTF8String.fromAddress(base, off + start, n - start))
    new GenericArrayData(out.toArray)
  }

  /** Column wrapper: whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    GraftColumnBridge.column(Tokens(GraftColumnBridge.expression(text)))
}
