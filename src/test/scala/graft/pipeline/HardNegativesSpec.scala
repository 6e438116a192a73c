package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** emb_hard_negatives contract (SURVEY §2c #30k): the cell-pruned
  * band mining returns EXACTLY the brute-force result — band edges
  * inclusive-low / exclusive-high on the 6-dp rounded cosine,
  * same-label candidates excluded, top-k by (cos desc, id) — while
  * actually discarding (query, cell) probes on clustered data. */
class HardNegativesSpec extends SparkSpec {

  private val Dim = Similarity.Dim
  private val G = 16
  private val N = 400

  private def lcg(i: Int): Double =
    ((1103515245L * i + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5

  // same clustered corpus as RangeSearchSpec, plus a label that CUTS
  // ACROSS clusters (i % 3), so every anchor has same-label candidates
  // inside its band to exclude
  private def corpus(): Seq[(Long, Int, Array[Double])] = {
    val centers = (0 until G).map { g =>
      val raw = Array.tabulate(Dim)(d => lcg(g * Dim + d))
      val norm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => 5.0 * x / norm)
    }
    (0 until N).map { i =>
      val g = i % G
      val v = Array.tabulate(Dim)(d => centers(g)(d) + 0.05 * lcg(100000 + i * Dim + d))
      (i.toLong, i % 3, v)
    }
  }

  private def frame(rows: Seq[(Long, Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, l, v) => (id, l, v.toSeq) }.toDF("vec_id", "label", "v")
      .withColumn("n2", graft.functions.VecDot.dot(col("v"), col("v")))
  }

  test("pruned hard-negative mining ≡ brute force band top-k, labels excluded, probes pruned") {
    val rows = corpus()
    val all = frame(rows).localCheckpoint()

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byId = rows.map(r => r._1 -> r).toMap
    val expected = (0L until Similarity.NumQueries.toLong).flatMap { q =>
      val (_, ql, qv) = byId(q)
      rows.iterator
        .filter { case (c, cl, _) => c != q && cl != ql }
        .map { case (c, _, cv) =>
          (c, BigDecimal(cos(qv, cv)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .filter { case (_, s) =>
          s >= Similarity.HardNegTauLow && s < Similarity.HardNegTauHigh }
        .toSeq.sortBy { case (c, s) => (-s, c) }
        .take(Similarity.HardNegK)
        .zipWithIndex
        .map { case ((c, s), i) => (q, i + 1, c, s) }
    }.toSet

    val got = Similarity.hardNegativesFrom(all)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(5))).toSet
    assert(got == expected, s"pruned=${got.size} brute=${expected.size}")
    assert(expected.nonEmpty, "band yields no hard negatives — test corpus is degenerate")

    // labels: every row pairs an anchor with a DIFFERENT-label neighbor
    val labels = Similarity.hardNegativesFrom(all)
      .collect().map(r => (r.getInt(3), r.getInt(4)))
    assert(labels.forall { case (a, n) => a != n })

    // the triangle bound must discard a real fraction of the probe
    // space (the low edge τ=0.15 is looser than range search's 0.25,
    // so demand a third rather than half)
    val (probes, _) = Similarity.rangeProbes(all, Similarity.HardNegTauLow)
    val nProbes = probes.count()
    val full = Similarity.NumQueries.toLong * Similarity.NumCentroids
    assert(nProbes <= full * 2 / 3, s"bound kept $nProbes of $full probes — not pruning")
  }

  test("band edges: a same-label twin and an out-of-band near-duplicate never surface") {
    import spark.implicits._
    // anchor 0 along e1; c10 = same direction (cos 1.0, diff label) —
    // above the high edge, excluded; c11 = just above the high edge
    // (cos 0.40, excluded — the edge itself is float-ambiguous, so the
    // probe sits clearly outside); c12 = inside the band, SAME label
    // (excluded); c13 = inside the band, diff label (the one survivor);
    // c14 = below the low edge (excluded)
    def unit(theta: Double): Seq[Double] =
      Seq(math.cos(theta), math.sin(theta)) ++ Seq.fill(Dim - 2)(0.0)
    val hi = math.acos(Similarity.HardNegTauHigh + 0.05)
    val mid = math.acos((Similarity.HardNegTauLow + Similarity.HardNegTauHigh) / 2)
    val lo = math.acos(Similarity.HardNegTauLow - 0.1)
    val rows = Seq(
      (0L, 0, unit(0.0)),
      (10L, 1, unit(0.0)),
      (11L, 1, unit(hi)),
      (12L, 0, unit(mid)),
      (13L, 1, unit(mid)),
      (14L, 1, unit(lo)))
    val all = rows.toDF("vec_id", "label", "v")
      .withColumn("n2", graft.functions.VecDot.dot(col("v"), col("v")))
    val got = Similarity.hardNegativesFrom(all)
      .filter(col("query_id") === 0L)
      .collect().map(r => (r.getLong(2), r.getDouble(5)))
    assert(got.map(_._1).toSeq == Seq(13L), got.mkString(","))
    assert(got.forall { case (_, s) =>
      s >= Similarity.HardNegTauLow && s < Similarity.HardNegTauHigh })
  }
}
