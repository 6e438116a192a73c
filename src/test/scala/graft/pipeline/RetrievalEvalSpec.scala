package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** retrieval_eval (r11 directive #5): the metric arithmetic the
  * oracle hash already pins is here tied to MEANING —
  *
  *  1. on a CONSTRUCTED complementarity corpus (each system alone
  *     finds exactly one of two relevant docs, fillers never
  *     double-dip) fusion provably beats both single systems:
  *     nDCG@10 goes 0.613 → 1.0 — the property RRF exists for,
  *     detected by the eval operator end to end;
  *  2. on the driver corpus the metrics are internally consistent
  *     (dcg ≤ idcg, mrr ⇔ hits, 30 = anchors × 3 systems rows).
  *
  * On the DRIVER corpus fused lands BETWEEN the systems (lex mean
  * nDCG .114, fused .087, dense .093 at sf0.01): relevance labels
  * are embedding-cluster-derived, so the lexical ranking is only
  * weakly aligned with them and fusion averages the two signals —
  * the eval measuring that honestly is exactly its job; asserting
  * fused ≥ max there would be asserting a falsehood about the data,
  * not a property of the operator. */
class RetrievalEvalSpec extends SparkSpec {

  private def mkDocs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }
  private def mkEmb(rows: Seq[(Long, Seq[Float], Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("constructed complementarity corpus: fused nDCG@10 beats BOTH single systems") {
    // anchor doc 0 (the only id < RrfNumQueries). Relevant = label 7:
    // A (11) shares the anchor's tokens but is embedding-orthogonal;
    // B (12) shares no token but is the dense nearest neighbor.
    // 5 lexical fillers share one weak token ("alpha"), tiny cosine;
    // 25 dense fillers have mid cosine and disjoint junk tokens — so
    // the lex fillers fall OUTSIDE dense's depth-20 list and nothing
    // double-dips above A or B in the fusion.
    val docs = Seq(
      0L -> "alpha beta gamma",
      11L -> "alpha beta gamma delta",
      12L -> "zeta eta theta") ++
      (1 to 5).map(i => (20L + i) -> s"alpha junk$i junk$i junk$i") ++
      (1 to 25).map(i => (40L + i) -> s"filler$i filler$i noise$i")
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f), 7),
      (11L, Seq(0f, 1f, 0f), 7),                     // cos 0 with anchor
      (12L, Seq(0.95f, 0.1f, 0f), 7)) ++             // cos ≈ .994
      (1 to 5).map(i => (20L + i, Seq(0.1f, 0f, 3f + i), 0)) ++   // cos ≈ .01-.03
      (1 to 25).map(i => (40L + i, Seq(1f, 1f + 0.1f * i, 0f), 0)) // cos .41-.71, distinct
    val got = Retrieval.evalOn(mkDocs(docs), mkEmb(emb)).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap
    val g = Retrieval.DcgGainsE9
    val idcg2 = g(0) + g(1)
    // single systems: one relevant each at rank 1 of its own list
    assert(got("lex") == ((1L, 2L, 1000000000L, g(0), idcg2)), got("lex"))
    assert(got("dense") == ((1L, 2L, 1000000000L, g(0), idcg2)), got("dense"))
    // fusion: BOTH relevants at fused ranks 1-2 → perfect nDCG
    assert(got("fused") == ((2L, 2L, 1000000000L, idcg2, idcg2)), got("fused"))
    def ndcg(s: String): Double = got(s)._4.toDouble / got(s)._5
    assert(ndcg("fused") == 1.0)
    assert(ndcg("fused") > math.max(ndcg("lex"), ndcg("dense")) + 0.3,
      s"fusion did not dominate: ${ndcg("lex")} / ${ndcg("dense")} / ${ndcg("fused")}")
  }

  test("driver corpus: metric internal consistency across all anchors and systems") {
    val rows = Retrieval.retrievalEval(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length == Retrieval.RrfNumQueries * 4, rows.length) // lex/dense/fused/prf
    rows.foreach { case (q, sys, hits, totRel, mrr, dcg, idcg) =>
      assert(hits >= 0 && hits <= Retrieval.EvalK, s"($q,$sys) hits $hits")
      assert(hits <= totRel, s"($q,$sys) hits > total_relevant")
      assert(dcg <= idcg, s"($q,$sys) dcg $dcg > idcg $idcg")
      // mrr and dcg agree on whether anything relevant surfaced, and
      // first_rel ∈ [1,10] bounds mrr into [1e8, 1e9]
      assert((mrr == 0) == (hits == 0), s"($q,$sys) mrr/hits disagree")
      assert((dcg == 0) == (hits == 0), s"($q,$sys) dcg/hits disagree")
      if (mrr > 0) assert(mrr >= 100000000L && mrr <= 1000000000L)
      // idcg is the exact literal prefix at min(10, total_relevant)
      val k = math.min(Retrieval.EvalK.toLong, totRel).toInt
      assert(idcg == (if (k == 0) 0L else Retrieval.IdcgPrefixE9(k - 1)))
    }
  }

  test("index editions: metrics are IDENTICAL across from_text, added(+replay) and compacted") {
    // r12 directive #7: incremental ingestion must not move a single
    // evaluation number — write(base) → add(tail) → replayed add
    // (the distinct-collapse load path) → compact (the no-distinct
    // load path) all score exactly like the from-text recompute.
    val rows = Retrieval.retrievalEvalEditions(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
    val byEdition = rows.groupBy(_._1).map { case (ed, rs) => ed -> rs.map(_._2).toSet }
    assert(byEdition.keySet == Set("from_text", "added", "compacted"))
    val expected = byEdition("from_text")
    assert(expected.size == Retrieval.RrfNumQueries * 4,
      s"expected one row per (anchor, system): ${expected.size}")
    assert(byEdition("added") == expected,
      "uncompacted index edition diverged from the from-text metrics")
    assert(byEdition("compacted") == expected,
      "compacted index edition diverged from the from-text metrics")
  }
}
