package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Equivalence pin for the r14 native tokenizer: [[Tokens]] must
  * reproduce `filter(split(lower(text), " "), len > 0)` exactly —
  * multi-space runs, leading/trailing spaces, case folding incl.
  * non-ASCII, tabs/newlines NOT split, empty and NULL inputs. */
class TokensSpec extends SparkSpec {

  test("native ≡ filter(split(lower(text), ' '), len > 0)") {
    import spark.implicits._
    val texts = Seq(
      Some("Hello World"),
      Some("  leading and  double  spaces "),
      Some("UPPER MiXeD lower"),
      Some("tabs\tand\nnewlines stay attached"),
      Some("Ünïcode ÉTÉ Straße ΔΟΚΙΜΗ"),
      Some("single"),
      Some("   "),
      Some(""),
      None)
      .toDF("text")
    val both = texts.select(
      filter(split(lower(col("text")), " "), t => length(t) > 0).as("hof"),
      Tokens.tokens(col("text")).as("native"))
      .collect()
    both.foreach { r =>
      val hof = if (r.isNullAt(0)) null else r.getSeq[String](0)
      val nat = if (r.isNullAt(1)) null else r.getSeq[String](1)
      assert(hof == nat, s"$hof vs $nat")
    }
  }
}
