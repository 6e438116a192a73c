package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** emb_triplets + ann_filtered_topk invariants beyond the oracle hash:
  * triplet composition (positives same-label above the floor,
  * negatives EXACTLY the emb_hard_negatives set, margins recomputable,
  * P×K shape), and the filtered search's predicate actually reaching
  * the parquet scan. */
class TripletsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("triplets: sides well-typed, negatives ≡ emb_hard_negatives, margin exact, P×K per anchor") {
    val rows = Similarity.embTriplets(spark, dir).collect()
    assert(rows.nonEmpty)
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (q, al, posId, negId) =
        (r.getLong(0), r.getInt(1), r.getLong(4), r.getLong(5))
      assert(emb(q) == al, "anchor_label is the anchor's own label")
      assert(emb(posId) == al, "positive shares the anchor's label")
      assert(emb(negId) != al, "negative must not share the anchor's label")
      val (posCos, negCos, margin) = (r.getDouble(6), r.getDouble(7), r.getDouble(8))
      assert(posCos >= Similarity.TripletTauPos)
      assert(negCos >= Similarity.HardNegTauLow && negCos < Similarity.HardNegTauHigh)
      assert(math.abs(margin - BigDecimal(posCos - negCos)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // the negative side is EXACTLY the hard-negative operator's output
    val negs = rows.map(r => (r.getLong(0), r.getInt(3), r.getLong(5))).toSet
    val hn = Similarity.embHardNegatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(negs == hn, "triplet negatives drifted from emb_hard_negatives")
    // per anchor: pos_rank × neg_rank is a full grid (P positives
    // exist at this data; K may truncate with the band, grid must
    // still be the cross of the sides that DO exist)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ps = rs.map(_.getInt(2)).distinct.sorted.toSeq
      val ns = rs.map(_.getInt(3)).distinct.sorted.toSeq
      assert(rs.length == ps.length * ns.length, s"anchor $q not a grid")
      assert(ps == (1 to ps.length) && ns == (1 to ns.length))
    }
  }

  test("filtered search: every neighbor carries the filter label, predicate pushed to the scan") {
    val d = Similarity.annFilteredTopK(spark, dir)
    val rows = d.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(3) == Similarity.FilterLabel))
    val scans = d.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scans.exists(s =>
      s.contains("PushedFilters") && s.contains("EqualTo(label,")),
      s"label predicate not pushed:\n${scans.mkString("\n")}")
  }
}
