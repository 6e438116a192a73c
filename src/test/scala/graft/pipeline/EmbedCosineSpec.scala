package graft.pipeline

import graft.SparkSpec

/** embedCosine's triangle-inequality cell pruning must be invisible:
  * the result is contractually EXACT all-pairs at τ, while the plan
  * must never broadcast the full embedding table into a nested-loop
  * join (the round-3 scale flag this layout replaces). */
class EmbedCosineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("cell-pruned result equals brute-force all-pairs") {
    val got = Dedup.embedCosine(spark, dir).collect()
      .map(r => ((r.getAs[Long]("vec_id_1"), r.getAs[Long]("vec_id_2")),
        r.getAs[Double]("cos_sim"))).toMap

    // reference implementation: local all-pairs with the same strict
    // ascending-index fold and HALF_UP rounding
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val expected = (for {
      (id1, v1) <- vecs; (id2, v2) <- vecs if id1 < id2
      cos = BigDecimal(dot(v1, v2) / (math.sqrt(dot(v1, v1)) * math.sqrt(dot(v2, v2))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if cos >= Dedup.CosineThreshold
    } yield (id1, id2) -> cos).toMap

    assert(got == expected)
    assert(expected.nonEmpty, "corpus should contain at least one qualifying pair")
  }

  test("plan never nested-loops or broadcasts the full embedding table") {
    val plan = Dedup.embedCosine(spark, dir).queryExecution.executedPlan.toString
    // The only tolerable nested-loop joins are the conditionless K-row
    // centroid crosses; the old shape carried the `vec_id < vec_id`
    // pair condition on a full-table BroadcastNestedLoopJoin.
    plan.split('\n').filter(_.contains("BroadcastNestedLoopJoin")).foreach { line =>
      assert(!line.contains("<"), s"pair inequality rides a nested loop: $line")
    }
    assert(!plan.contains("CartesianProduct"))
  }
}
