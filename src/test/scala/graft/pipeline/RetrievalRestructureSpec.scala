package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r14 optimization-round equivalence pins for the lexical-core
  * restructure: the shapes changed (full-outer fuse → union + max
  * aggregation; dl/N/T → one docStats chain; full-df join → bounded
  * dfq semi-join), so these tests hold the VALUES to the old
  * derivations on data that exercises the edges the bench corpus may
  * not (disjoint fusion keys, a token-less document). */
class RetrievalRestructureSpec extends SparkSpec {

  test("bm25Stats ≡ the dl / countDistinct / sum(tf) derivations, incl. a token-less doc") {
    import spark.implicits._
    // tf sufficient statistic with doc 3 token-LESS: (3, NULL, 0) —
    // the tfRelation convention whose whole purpose is keeping N
    // derivable (doc 3 must count in n_docs, add 0 to t_toks, and
    // never surface in a probe join)
    val tf = Seq(
      (1L, "a", 2L), (1L, "b", 1L),
      (2L, "a", 1L),
      (3L, null.asInstanceOf[String], 0L)).toDF("doc_id", "token", "tf")
    val (docStats, nt) = TextAnalysis.bm25Stats(tf)
    val ntRow = nt.head()
    assert(ntRow.getLong(0) == 3L, "n_docs must count the token-less doc")
    assert(ntRow.getLong(1) == 4L, "t_toks = sum of all tf")
    // old derivations, verbatim
    val oldN = tf.agg(countDistinct(col("doc_id"))).head().getLong(0)
    val oldT = tf.agg(sum(col("tf"))).head().getLong(0)
    assert(ntRow.getLong(0) == oldN && ntRow.getLong(1) == oldT)
    val ds = docStats.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oldDl = tf.filter(col("token").isNotNull)
      .groupBy(col("doc_id")).agg(sum(col("tf"))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // token-ful docs: identical dl; the token-less doc's extra
    // (3, 0) row is invisible to the probe's inner join
    oldDl.foreach { case (d, v) => assert(ds(d) == v, s"dl($d)") }
    assert(ds(3L) == 0L)
  }

  test("union+max fusion ≡ full-outer join on rank-unique relations with disjoint keys") {
    import spark.implicits._
    // lex and dense tops with all three key classes: both-systems
    // (q=1,d=10), lex-only (1,11), dense-only (1,12), plus a second
    // anchor entirely dense-only
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "lex_rank")
    val dense = Seq((1L, 10L, 2), (1L, 12L, 1), (2L, 13L, 1))
      .toDF("query_id", "doc_id", "dense_rank")
    val viaJoin = lex.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lr"),
        coalesce(col("dense_rank"), lit(0)).as("dr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val viaUnion = lex.select(col("query_id"), col("doc_id"), col("lex_rank"),
        lit(null).cast("int").as("dense_rank"))
      .unionByName(dense.select(col("query_id"), col("doc_id"),
        lit(null).cast("int").as("lex_rank"), col("dense_rank")))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("lex_rank")).as("lex_rank"), max(col("dense_rank")).as("dense_rank"))
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lr"),
        coalesce(col("dense_rank"), lit(0)).as("dr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(viaUnion == viaJoin)
    assert(viaJoin.size == 4)
  }

  test("bounded dfq semi-join attaches the same df values the full-df join did") {
    import spark.implicits._
    val tf = Seq((1L, "a", 2L), (2L, "a", 1L), (2L, "b", 3L), (3L, "c", 1L))
      .toDF("doc_id", "token", "tf")
    val dfRel = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val q = Seq((7L, "a"), (7L, "b"), (8L, "a")).toDF("query_id", "token")
    val viaFull = tf.join(broadcast(q), Seq("token")).join(dfRel, Seq("token"))
      .select(col("query_id"), col("doc_id"), col("df"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val dfq = dfRel.join(broadcast(q.select(col("token"))), Seq("token"), "left_semi")
    val viaDfq = tf.join(broadcast(q), Seq("token")).join(broadcast(dfq), Seq("token"))
      .select(col("query_id"), col("doc_id"), col("df"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(viaDfq == viaFull)
    // and the semi join deduplicates: df rows never multiply by the
    // number of queries sharing a token
    assert(dfq.count() == dfq.select(col("token")).distinct().count())
  }
}
