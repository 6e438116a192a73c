package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Equivalence pin for the r14 native shingler: [[WordShingles]] must
  * reproduce the HOF chain it replaced — element values, first-
  * occurrence distinct ORDER, the short-doc empty array, the
  * NULL-input empty array, and concat_ws null-element skipping. */
class WordShinglesSpec extends SparkSpec {

  private val k = 3

  private def hofShingles(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(o => element_at(toks, i + o)): _*))))
      .otherwise(array().cast("array<string>"))

  test("native ≡ HOF chain, including order, repeats, short and null inputs") {
    import spark.implicits._
    val docs = Seq(
      Some(Seq("a", "b", "c", "d", "a", "b", "c", "d")), // repeated shingles
      Some(Seq("x", "y", "z")),                          // exactly k tokens
      Some(Seq("x", "y")),                               // short → empty
      Some(Seq.empty[String]),                           // empty → empty
      None,                                              // null → empty (the when-null path)
      Some((1 to 50).map(i => s"w${i % 7}")))            // heavy repetition
      .toDF("toks")
    val both = docs.select(
      hofShingles(col("toks")).as("hof"),
      WordShingles.shingles(col("toks"), k).as("native"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
  }
}
