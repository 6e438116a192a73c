package graft.pipeline

import graft.SparkSpec

/** emb_mmr_select contract: the unrolled fold computes EXACTLY the
  * sequential greedy MMR (λ·rel − (1−λ)·max-sim-to-picked, ties to
  * the lower vec_id), and the diversity term does real work — on the
  * real table the picked set must span more distinct true labels than
  * pure relevance top-k does at the same k (the whole point of MMR). */
class MmrSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("unrolled MMR equals sequential greedy; picks are more diverse than top-k") {
    import spark.implicits._
    val rows = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
      .select($"vec_id", $"embedding", $"label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val vs = rows.map { case (id, v, _) => id -> v }.toMap
    val lab = rows.map { case (id, _, l) => id -> l }.toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def cos(a: Long, b: Long): Double =
      dot(vs(a), vs(b)) / (math.sqrt(dot(vs(a), vs(a))) * math.sqrt(dot(vs(b), vs(b))))

    // sequential greedy reference
    val q = 0L
    var ms = vs.keys.filter(_ != q).map(id => id -> -1.0).toMap
    val rel = ms.keys.map(id => id -> cos(q, id)).toMap
    var picked = Vector.empty[Long]
    for (_ <- 1 to Similarity.MmrK) {
      val (bestId, _) = ms.toSeq
        .map { case (id, m) => id -> (Similarity.MmrLambda * rel(id) - Similarity.MmrGamma * m) }
        .minBy { case (id, s) => (-s, id) }
      picked :+= bestId
      ms = (ms - bestId).map { case (id, m) => id -> math.max(m, cos(id, bestId)) }
    }

    val got = Similarity.embMmrSelect(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == picked.zipWithIndex.map { case (id, i) => (i + 1, id) })

    // diversity: MMR's label spread beats pure top-k's at the same k
    val topk = rel.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(Similarity.MmrK).map(_._1)
    val mmrLabels = picked.map(lab).toSet.size
    val topkLabels = topk.map(lab).toSet.size
    assert(mmrLabels >= topkLabels,
      s"MMR spans $mmrLabels labels, top-k $topkLabels")
    assert(mmrLabels >= 3, s"MMR picks collapsed to $mmrLabels labels")
  }
}
