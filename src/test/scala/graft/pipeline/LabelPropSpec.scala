package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** emb_label_prop contract: on a clustered corpus whose true label IS
  * the cluster, cosine-weighted seed-majority voting over the bucketed
  * kNN graph must (a) match an independent sequential recompute of the
  * same vote exactly, and (b) recover the cluster label for nearly
  * every vector that has any seed neighbor (the graph keeps clusters
  * intact, so wrong-cluster votes are rare). */
class LabelPropSpec extends SparkSpec {

  private val Dim = Similarity.Dim
  private val G = 10
  private val N = 300

  private def lcg(i: Int): Double =
    ((1103515245L * i + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5

  private def corpus(): Seq[(Long, Int, Array[Double])] = {
    val centers = (0 until G).map { g =>
      val raw = Array.tabulate(Dim)(d => lcg(g * Dim + d))
      val norm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => 5.0 * x / norm)
    }
    (0 until N).map { i =>
      val g = i % G
      val v = Array.tabulate(Dim)(d => centers(g)(d) + 0.1 * lcg(50000 + i * Dim + d))
      (i.toLong, g, v)
    }
  }

  private def frames(rows: Seq[(Long, Int, Array[Double])]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val labels = rows.map { case (id, g, _) => (id, g) }.toDF("vec_id", "label")
    val prepared = rows.map { case (id, _, v) => (id, v.toSeq) }.toDF("vec_id", "v")
      .withColumn("n2", graft.functions.VecDot.dot(col("v"), col("v")))
    (labels, prepared)
  }

  test("propagation matches a sequential recompute and recovers cluster labels") {
    val rows = corpus()
    val (labels, prepared) = frames(rows)
    val got = Similarity.labelPropFrom(labels, prepared)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(4)))).toMap

    // sequential recompute: same buckets, same top-k, same decimal vote
    val vs = rows.map { case (id, _, v) => id -> v }.toMap
    val lab = rows.map { case (id, g, _) => id -> g }.toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def bucket(v: Array[Double]): Long =
      (0 until Similarity.NumPlanes).map { p =>
        val w = (0 until Dim).map(d => v(d) * Similarity.planeWeight(p, d)).sum
        if (w >= 0) 1L << p else 0L
      }.sum
    def cos(a: Long, b: Long): Double = {
      val d = dot(vs(a), vs(b)) / (math.sqrt(dot(vs(a), vs(a))) * math.sqrt(dot(vs(b), vs(b))))
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val buckets = vs.keys.groupBy(id => bucket(vs(id)))
    val expected = (for {
      id <- vs.keys.toSeq.sorted if id >= Similarity.SeedCount
      cands = buckets(bucket(vs(id))).filter(_ != id).toSeq
      top = cands.map(c => (c, cos(id, c))).sortBy { case (c, s) => (-s, c) }
        .take(Similarity.KnnK)
      seedVotes = top.filter(_._1 < Similarity.SeedCount)
      if seedVotes.nonEmpty
    } yield {
      val byLabel = seedVotes.groupBy(t => lab(t._1)).view
        .mapValues(ts => (ts.map(t => BigDecimal(t._2)).sum, ts.size)).toMap
      val (bestLabel, (w, _)) = byLabel.toSeq.minBy { case (l, (w, _)) => (-w, l) }
      id -> ((bestLabel, seedVotes.size.toLong, bestLabel == lab(id)))
    }).toMap

    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (pl, nsn, agrees)) =>
      val (epl, ensn, eagrees) = expected(id)
      assert(pl == epl && nsn == ensn && agrees == eagrees, s"vec $id: got ($pl,$nsn,$agrees) want ($epl,$ensn,$eagrees)")
    }

    // clustered data: predictions overwhelmingly correct
    val acc = got.values.count(_._3).toDouble / got.size
    assert(got.size > 50, s"too few predictions (${got.size}) to judge")
    assert(acc >= 0.9, s"accuracy $acc below 0.9 on clustered data")
  }

  test("kNN pagerank conserves mass and stays positive") {
    val rows = Similarity.embKnnPagerank(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (v, d, r) =>
      assert(d >= 1L, s"node $v degree $d")
      assert(r > 0.0, s"node $v rank $r")
    }
    // symmetric graph, no dangling mass: total rank stays ~1 through
    // the damped iterations (drift only from per-iteration rounding)
    val total = rows.map(_._3).sum
    assert(math.abs(total - 1.0) < 0.01, s"total rank $total")
    // centrality does real work: ranks are not uniform
    assert(rows.map(_._3).distinct.length > 10, "pagerank collapsed to uniform")
  }
}
