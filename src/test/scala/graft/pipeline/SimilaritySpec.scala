package graft.pipeline

import graft.SparkSpec

/** IVF-PQ encoding-policy contract: RESIDUAL quantization (quantize
  * x − centroid(cell(x))) must beat raw-vector quantization at the
  * same bit budget in the regime it targets — a clustered corpus
  * whose between-cluster variance dwarfs the within-cluster detail.
  * There the coarse quantizer absorbs the cluster offsets, so
  * residual codes spend all 16 bits on the within-cluster structure
  * that actually ranks neighbors, while raw codes are forced to spend
  * them separating clusters (Jégou et al., TPAMI 2011, §IV).
  *
  * The corpus is built so the effect is structural, not luck: 16
  * well-separated cluster centers (amplitude ≫ 1), members offset
  * along ONE shared direction by an id-scrambled magnitude t (the
  * scrambling matters — a t correlated with vec_id would let the
  * deterministic vec_id tie-break fake a good ranking). Ground truth
  * per query (= a cluster center) is its smallest-t members, so a
  * searcher only scores if its codes resolve t. */
class SimilaritySpec extends SparkSpec {

  private val Dim = Similarity.Dim
  private val G = 16      // clusters = NumCentroids: centers are the coarse cells
  private val N = 500

  /** Fixed LCG in [-0.5, 0.5) — same generator family as the LSH
    * planes, so the corpus is bit-identical across runs/engines. */
  private def lcg(i: Int): Double =
    ((1103515245L * i + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5

  private def corpus(): Seq[(Long, Seq[Float])] = {
    val centers = (0 until G).map { g =>
      val raw = Array.tabulate(Dim)(d => lcg(g * Dim + d))
      val norm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => 5.0 * x / norm) // amplitude 5: clusters dominate
    }
    val u0 = Array.tabulate(Dim)(d => lcg(9999 * 64 + d))
    val un = math.sqrt(u0.map(x => x * x).sum)
    val u = u0.map(_ / un)
    (0 until N).map { i =>
      val v =
        if (i < G) centers(i)
        else {
          val g = i % G
          val t = 0.05 + 0.35 * (lcg(7777 + i) + 0.5) // id-scrambled magnitude
          Array.tabulate(Dim)(d => centers(g)(d) + t * u(d))
        }
      (i.toLong, v.map(_.toFloat).toSeq)
    }
  }

  test("residual IVF-PQ beats raw-vector PQ at equal bits on clustered data") {
    import spark.implicits._
    val rows = corpus()
    val emb = rows.toDF("vec_id", "embedding")

    // exact cosine top-k ground truth, locally (float-widened like vecs())
    val vs = rows.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val gt: Map[Long, Set[Long]] = (0L until Similarity.NumQueries.toLong).map { q =>
      val qv = vs(q)
      val top = vs.keys.filter(_ != q).toSeq
        .map(i => (i, dot(qv, vs(i)) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(vs(i), vs(i))))))
        .sortBy { case (i, c) => (-c, i) }
        .take(Similarity.TopK).map(_._1).toSet
      q -> top
    }.toMap

    def recall(residual: Boolean): Double = {
      val got = Similarity.annIvfPqOn(emb, residual)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      gt.map { case (q, t) => got.getOrElse(q, Set.empty).intersect(t).size }.sum.toDouble /
        (Similarity.NumQueries * Similarity.TopK)
    }

    val res = recall(residual = true)
    val raw = recall(residual = false)
    // numpy reference on this corpus: residual ≈ 0.76, raw ≈ 0.20 —
    // margins leave room for float-vs-double corpus rounding
    assert(res >= raw + 0.2,
      s"residual encoding should clearly beat raw at equal bits: res=$res raw=$raw")
    assert(res >= 0.5, s"residual recall degenerate: $res")
  }

  test("ann_recall reports ivf_pq recall alongside lsh/ivf") {
    val dir = "/root/testdata/sf0.001"
    val out = Similarity.annRecall(spark, dir)
    val cols = out.columns.toSet
    assert(Set("recall_lsh", "recall_ivf", "recall_ivfpq").subsetOf(cols), cols.toString)
    val rows = out.collect()
    assert(rows.length == Similarity.NumQueries)
    rows.foreach { r =>
      val v = r.getAs[Double]("recall_ivfpq")
      assert(v >= 0.0 && v <= 1.0, s"recall_ivfpq out of range: $v")
    }
  }

  private val dir = "/root/testdata/sf0.001"

  test("emb_knn_graph: ranked bucket-local neighbor lists with a symmetric mutual flag") {
    val out = Similarity.embKnnGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getBoolean(4)))
    assert(out.nonEmpty)
    // per-vector: ranks are 1..k contiguous, neighbors distinct, no self-edges
    out.groupBy(_._1).foreach { case (v, es) =>
      assert(es.map(_._4).sorted.toSeq == (1 to es.length), s"ranks not contiguous for $v")
      assert(es.map(_._2).distinct.length == es.length)
      assert(es.forall(_._2 != v))
      // ranks order by descending cosine
      assert(es.sortBy(_._4).map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
    // mutual is exactly "the reverse edge exists"
    val edgeSet = out.map(e => (e._1, e._2)).toSet
    out.foreach { e =>
      assert(e._5 == edgeSet.contains((e._2, e._1)), s"mutual flag wrong on $e")
    }
    assert(out.exists(_._5), "no mutual edges at all — graph degenerate")
  }

  test("emb_knn_components: mutual edges never cross components; labels are member minima") {
    val graph = Similarity.embKnnGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    val comp = Similarity.embKnnComponents(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val label = comp.map(c => c._1 -> c._2).toMap
    // exactly the vectors with a mutual edge are labeled
    assert(label.keySet == graph.filter(_._3).map(_._1).toSet)
    // every mutual edge stays inside one component
    graph.filter(_._3).foreach { case (a, b, _) =>
      assert(label(a) == label(b), s"mutual edge ($a,$b) crosses components")
    }
    // the label is the component's minimum member, held by its canonical
    comp.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid)
      assert(members.filter(_._3).map(_._1).toSeq == Seq(cid))
    }
  }

  test("probe sweep: recall is monotone in probes and agrees with ann_recall at NumProbes") {
    val dir = "/root/testdata/sf0.001"
    val rows = Similarity.annProbeSweep(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Similarity.ProbeSweep)
    // adding probes can only add candidates: recall never decreases
    rows.map(_._4).toSeq.sliding(2).foreach { case Seq(a, b) => assert(b >= a, s"$b < $a") }
    assert(rows.forall(_._4 > 0.0))
    // the sweep's NumProbes row reproduces ann_recall's IVF hit count
    assert(Similarity.ProbeSweep.contains(Similarity.NumProbes))
    val sweepAtDefault = rows.find(_._1 == Similarity.NumProbes).get._3
    val ivfHits = Similarity.annRecall(spark, dir).collect()
      .map(_.getAs[Long]("n_ivf_hits")).sum
    assert(sweepAtDefault == ivfHits, s"$sweepAtDefault vs $ivfHits")
  }
}
