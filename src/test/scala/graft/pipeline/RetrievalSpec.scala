package graft.pipeline

import graft.SparkSpec

/** retrieval_rrf invariants the oracle hash can't articulate: the
  * fused score is EXACTLY the advertised rank arithmetic (recomputable
  * from the output's own rank columns), both systems contribute, and
  * the output is a well-formed per-anchor ranking. */
class RetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("fused score ≡ 1/(K+lex) + 1/(K+dense) recomputed from the output ranks") {
    val rows = Retrieval.retrievalRrf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    def term(rank: Int): BigDecimal =
      if (rank == 0) BigDecimal(0)
      else BigDecimal(1.0 / (Retrieval.RrfK + rank))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    rows.foreach { case (q, _, d, lexR, denseR, score) =>
      assert(q != d, "self-retrieval")
      val expected = (term(lexR) + term(denseR)).toDouble
      assert(math.abs(score - expected) < 1e-12, s"($q,$d): $score vs $expected")
    }
    // ranks are contiguous from 1 per anchor and respect score order
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rs.length), s"anchor $q ranks")
      assert(sorted.map(_._6).toSeq == sorted.map(_._6).sortBy(-_).toSeq,
        s"anchor $q scores not descending")
    }
    // hybrid means HYBRID: somewhere in the result, each system
    // surfaces a doc the other's top-D missed, and some doc carries
    // both ranks (otherwise the fusion degenerated to one system)
    assert(rows.exists(r => r._4 > 0 && r._5 == 0), "no lexical-only doc")
    assert(rows.exists(r => r._5 > 0 && r._4 == 0), "no dense-only doc")
    assert(rows.exists(r => r._4 > 0 && r._5 > 0), "no doc in both systems")
  }
}
