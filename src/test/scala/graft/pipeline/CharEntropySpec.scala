package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CharEntropy expression contract: exact closed-form values on
  * degenerate/uniform strings, agreement with an independent local
  * recompute, and the map-only plan shape (the whole point of the
  * expression — no per-character explode/exchange). */
class CharEntropySpec extends SparkSpec {

  private def h(s: String): Double =
    graft.functions.CharEntropy.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))

  test("closed-form values") {
    assert(h("") == 0.0)
    assert(h("aaaa") == 0.0)
    assert(math.abs(h("ab") - 1.0) < 1e-12)
    assert(math.abs(h("abab") - 1.0) < 1e-12)
    assert(math.abs(h("abcd") - 2.0) < 1e-12)
    assert(math.abs(h("abcdefgh") - 3.0) < 1e-12)
    // 3 a's + 1 b: H = 2 - (3·log2 3)/4
    assert(math.abs(h("aaab") - (2.0 - 3.0 * (math.log(3) / math.log(2)) / 4.0)) < 1e-12)
  }

  test("expression matches an independent recompute over real docs") {
    import spark.implicits._
    val got = TextAnalysis.charEntropy(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      val counts = text.groupBy(identity).view.mapValues(_.length).toMap
      val n = text.length.toDouble
      val acc = counts.toSeq.sortBy(_._1).map { case (_, c) =>
        c * (math.log(c.toDouble) / math.log(2.0)) }.sum
      val expected = BigDecimal(math.log(n) / math.log(2.0) - acc / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (nCp, nDist, ent) = got(id)
      assert(nCp == text.length.toLong)
      assert(nDist == counts.size.toLong)
      // fold order differs from the expression's only in grouping; the
      // rounded value must still agree to the last printed digit
      assert(math.abs(ent - expected) <= 1e-6, s"doc $id: $ent vs $expected")
    }
  }

  test("plan is map-only before the presentation sort") {
    val pre = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        round(graft.functions.CharEntropy.of(col("text")), 6).as("char_entropy"))
    val plan = pre.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Generate"), plan) // no explode anywhere
  }
}
