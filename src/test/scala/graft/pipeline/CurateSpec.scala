package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The curation funnel's structural guarantees: a funnel only ever
  * narrows, every stage is accounted for (no silent drops BETWEEN
  * operators), and the budget stage lands within its contract. */
class CurateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("funnel: monotone, fully accounted, budget within the half-token contract") {
    val rows = Curate.corpusCurate(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).toSeq ==
      Seq("ingest", "langid", "gopher", "dedup", "quality", "budget"))
    // stage 1 is exactly the corpus — nothing dropped before the funnel
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rows.head._3 == nDocs && rows.head._4 > 0)
    // docs and tokens never increase through the funnel
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"funnel widened: $a -> $b")
    }
    // the budget stage keeps at most half the quality survivors'
    // tokens and is non-degenerate on the driver corpus
    val quality = rows(4); val budget = rows(5)
    assert(budget._4 * 2 <= quality._4, s"budget overshot: $budget vs $quality")
    assert(budget._3 > 0, "budget stage emptied the corpus")
  }
}
