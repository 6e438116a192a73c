package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** retrieval_prf contract (SURVEY §2c #33w): pseudo-relevance
  * feedback must solve the VOCABULARY-MISMATCH case that defines it —
  * a doc sharing zero terms with the original query but sharing
  * vocabulary with the first-pass winners is invisible to pass one
  * and retrieved by the expanded query. Also pins the expansion
  * budget and that original terms keep priority via the 2:1 weights. */
class RetrievalPrfSpec extends SparkSpec {

  // anchor 0 queries {alpha, beta}; docs 1-3 are first-pass winners
  // carrying the expansion term "gamma"; doc 50 is gamma-only — the
  // vocabulary-mismatch target pass one cannot see
  private def corpus(): DataFrame = {
    import spark.implicits._
    (Seq(
      (0L, "alpha beta"),
      (1L, "alpha beta gamma gamma"),
      (2L, "alpha beta gamma"),
      (3L, "alpha beta gamma gamma gamma"),
      (50L, "gamma gamma gamma gamma")
    ) ++ (4L to 9L).map(i => (i, "delta epsilon"))).toDF("doc_id", "text")
  }

  test("expansion retrieves the vocabulary-mismatch doc pass one cannot see") {
    val d = corpus()
    // pass one: anchor 0's ranking never contains doc 50
    val passOne = Retrieval.lexSystem(d).lex
      .filter(col("query_id") === 0L).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(passOne.nonEmpty && !passOne.contains(50L),
      s"pass one should miss the gamma-only doc: $passOne")
    // the expanded query finds it
    val prf = Retrieval.prfOn(d)
      .filter(col("query_id") === 0L)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toMap // doc_id -> n_terms_hit
    assert(prf.contains(50L),
      s"PRF should retrieve the gamma-only doc: ${prf.keySet}")
    // …and it matched on expansion terms alone
    assert(prf(50L) == 1L)
  }

  test("original terms keep priority: a full original match outranks expansion-only") {
    val d = corpus()
    val ranks = Retrieval.prfOn(d)
      .filter(col("query_id") === 0L)
      .collect().map(r => (r.getLong(2), r.getInt(1))).toMap // doc_id -> rank
    // docs 1-3 match both original terms (weight 2 each) + gamma;
    // doc 50 matches only the single-weight expansion term
    Seq(1L, 2L, 3L).foreach { id =>
      assert(ranks(id) < ranks(50L), s"doc $id should outrank the expansion-only doc: $ranks")
    }
  }

  test("expansion stays inside the term budget") {
    // every anchor's matched-term count is bounded by original + expansion
    val maxHit = Retrieval.prfOn(corpus())
      .agg(max(col("n_terms_hit"))).collect()(0).getLong(0)
    assert(maxHit <= Retrieval.RrfMaxQueryTerms + Retrieval.PrfExpansionTerms)
  }
}
