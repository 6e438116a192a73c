package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Spec for the native [[ShingleHash]] expression: must be
  * value-identical to the declarative HOF pipeline it replaces. */
class ShingleHashSpec extends SparkSpec {

  import Hashes._

  private def hof(c: org.apache.spark.sql.Column, k: Int) =
    shingleHashesFromCodes(charCodes(c), k)

  test("native == HOF on edge cases") {
    import spark.implicits._
    val texts = Seq("", "a", "ab", "abcd", "abcde", "abcdef",
      "hello world hello world", "aaaaaaaaaa", "x y z w v u t")
    for (k <- Seq(1, 2, 5, 8)) {
      val rows = texts.toDF("t")
        .select(ShingleHash.shingleHashes(col("t"), k).as("native"), hof(col("t"), k).as("hof"))
        .collect()
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"k=$k"))
    }
  }

  test("native == HOF on the documents corpus") {
    val rows = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(ShingleHash.shingleHashes(lower(col("text")), 5).as("native"),
        hof(lower(col("text")), 5).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("participates in whole-stage codegen") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Tables.documents(spark, "/root/testdata/sf0.001")
        .select(ShingleHash.shingleHashes(col("text"), 3).as("h"))
        .queryExecution.executedPlan.toString
      // the projection holding the expression must carry the codegen star
      assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
