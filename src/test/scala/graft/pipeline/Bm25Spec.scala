package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** text_bm25 contract (SURVEY §2c #33t): the distributed exact-
  * rational BM25 matches an independent local recompute of the same
  * formula — per (query, doc) Σ_t idf·tfnorm with k1 = 1.2, b = 0.75,
  * rational idf (2(N−df)+1)/(2df+1), ranks on the exact scale-9
  * decimal sum — and the classical BM25 behaviors hold: doc-length
  * normalization penalizes padding, and matching more query terms
  * beats matching one term harder. */
class Bm25Spec extends SparkSpec {

  private def frame(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
  }

  /** Local reference implementation over whitespace tokens. */
  private def localBm25(docs: Seq[(Long, String)])
      : Map[Int, Seq[(Long, BigDecimal)]] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val n = docs.size.toLong
    val tt = toks.values.map(_.size.toLong).sum
    val df = toks.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    TextAnalysis.Bm25Queries.map { case (qid, q) =>
      val scored = toks.toSeq.flatMap { case (id, ts) =>
        val dl = ts.size.toLong
        val s = q.split(" ").toSeq.flatMap { term =>
          val tf = ts.count(_ == term).toLong
          if (tf == 0L) None
          else {
            val num = (2L * (n - df(term)) + 1L) * 22L * tf * tt
            val den = (2L * df(term) + 1L) * (10L * tf * tt + 3L * tt + 9L * dl * n)
            Some(BigDecimal(num.toDouble / den.toDouble)
              .setScale(9, BigDecimal.RoundingMode.HALF_UP))
          }
        }
        if (s.isEmpty) None else Some(id -> s.sum)
      }
      qid -> scored.sortBy { case (id, s) => (-s, id) }.take(TextAnalysis.Bm25TopK)
    }.toMap
  }

  test("distributed BM25 ≡ local recompute on a corpus exercising tf, df, dl spread") {
    val docs = Seq(
      1L -> "spark window agg spark spark",               // high tf, short
      2L -> "spark window agg and a lot of other padding tokens here to stretch the doc length out considerably more and more",
      3L -> "window agg",                                  // 2 of 3 terms, tiny
      4L -> "hash join merge hash join merge",
      5L -> "hash alone",
      6L -> "fast table scan stream batch data slow query filter sort", // everything once
      7L -> "the quick brown fox",                         // no query terms
      8L -> "spark spark spark spark spark spark spark spark") // one term, huge tf
    val expected = localBm25(docs)
    val got = TextAnalysis.bm25On(frame(docs))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(_._2).map(x => (x._3, x._4)).toSeq }
    expected.foreach { case (qid, exp) =>
      val g = got.getOrElse(qid, Seq.empty)
      assert(g.map(_._1) == exp.map(_._1), s"query $qid ranking: got $g expected $exp")
      g.map(_._2).zip(exp.map(_._2)).foreach { case (a, b) =>
        assert(math.abs(a - b.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6,
          s"query $qid score: $a vs $b")
      }
    }
    // doc 7 (no query terms) never appears
    assert(!got.values.flatten.exists(_._1 == 7L))
  }

  test("BM25 behaviors: length normalization and term coverage") {
    val docs = Seq(
      1L -> "spark window agg",
      2L -> "spark window agg lot of other padding tokens here to stretch the doc length out considerably",
      3L -> "spark spark spark spark spark spark spark spark spark spark",
      4L -> "noise noise noise noise")
    val byQuery = TextAnalysis.bm25On(frame(docs))
      .filter(col("query_id") === 1) // "spark window agg"
      .collect()
      .map(r => r.getLong(2) -> (r.getLong(3), r.getDouble(4))).toMap
    // same tf for all three terms, shorter doc wins (dl normalization)
    assert(byQuery(1L)._2 > byQuery(2L)._2)
    // three distinct terms beat one hammered term (tf saturation)
    assert(byQuery(1L)._1 == 3L && byQuery(3L)._1 == 1L)
    assert(byQuery(1L)._2 > byQuery(3L)._2)
  }
}
