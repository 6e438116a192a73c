package graft.pipeline

import graft.SparkSpec

/** corpus_topk_tokens_approx trades the exact countDistinct expand for
  * a mergeable HLL++ sketch; its contract is a relative-error bound on
  * the document frequency, with the top-k row set and occurrence
  * counts staying exact. Measured against the exact operator at
  * sf0.1. */
class TopkTokensApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.1"

  test("row set and occurrence counts exact; df within the HLL error bound") {
    val exact = Corpus.topkTokens(spark, dir).collect()
      .map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_docs"))).toMap
    val approx = Corpus.topkTokensApprox(spark, dir).collect()
      .map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_docs_approx"))).toMap

    // identical token set and exact occurrence counts — only df is
    // estimated, so the ranking (by occurrences) cannot drift
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (t, (occ, _)) => assert(occ == exact(t)._1, t) }

    // every df estimate within a few rsd of truth (HLL++ error
    // concentrates at ~1 rsd; 4x is a stable CI bound)
    approx.foreach { case (t, (_, est)) =>
      val truth = exact(t)._2.toDouble
      val relErr = math.abs(est - truth) / truth
      assert(relErr <= 4 * Corpus.ApproxDfRsd,
        s"token '$t': approx df $est vs exact ${exact(t)._2} (rel err $relErr)")
    }
  }
}
