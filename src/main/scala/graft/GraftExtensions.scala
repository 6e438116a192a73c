package graft

import graft.functions.ShingleHash
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions with the SQL function registry, so
  * `spark.sql("SELECT shingle_hash(text, 5) ...")` plans the codegen'd
  * expression directly, and injects the
  * [[graft.plans.RangeJoinRewrite]] optimizer rule (interval joins →
  * bucket-expansion equi-joins; off until
  * `spark.graft.rangeJoin.bucketWidth` is set).
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — the standard extension
  * mechanism, so a pure-SQL user (or a JDBC/Thrift client at cluster
  * scale) gets the same operators as the Scala API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.shingleHashDescriptor)
    ext.injectFunction(GraftExtensions.vecDotDescriptor)
    ext.injectFunction(GraftExtensions.charEntropyDescriptor)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}

object GraftExtensions {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val shingleHashDescriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("shingle_hash"),
    new ExpressionInfo(classOf[ShingleHash].getName, "shingle_hash"),
    (children: Seq[Expression]) => children match {
      case Seq(text, k) => ShingleHash(text, intLit(k, "shingle size"))
      case _ => throw new IllegalArgumentException(
        "shingle_hash(text, k) takes exactly 2 arguments")
    })

  val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[graft.functions.VecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => graft.functions.VecDot(a, b)
      case _ => throw new IllegalArgumentException(
        "vec_dot(a, b) takes exactly 2 arguments")
    })

  val charEntropyDescriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("char_entropy"),
    new ExpressionInfo(classOf[graft.functions.CharEntropy].getName, "char_entropy"),
    (children: Seq[Expression]) => children match {
      case Seq(text) => graft.functions.CharEntropy(text)
      case _ => throw new IllegalArgumentException(
        "char_entropy(text) takes exactly 1 argument")
    })
}
