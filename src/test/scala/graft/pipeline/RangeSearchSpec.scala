package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ann_range_search contract: the IVF-cell triangle-bound pruning is
  * LOSSLESS — the pruned search returns exactly the brute-force
  * radius result — while actually discarding (query, cell) probes on
  * clustered data (otherwise the "pruning" is a cross join wearing a
  * hat). Clusters are well-separated LCG centers with small member
  * jitter, so cell radii are tight and most query-to-far-cell probes
  * fail the bound by construction. */
class RangeSearchSpec extends SparkSpec {

  private val Dim = Similarity.Dim
  private val G = 16
  private val N = 400

  private def lcg(i: Int): Double =
    ((1103515245L * i + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5

  private def corpus(): Seq[(Long, Array[Double])] = {
    val centers = (0 until G).map { g =>
      val raw = Array.tabulate(Dim)(d => lcg(g * Dim + d))
      val norm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => 5.0 * x / norm)
    }
    (0 until N).map { i =>
      val g = i % G
      val v = Array.tabulate(Dim)(d => centers(g)(d) + 0.05 * lcg(100000 + i * Dim + d))
      (i.toLong, v)
    }
  }

  private def frame(rows: Seq[(Long, Array[Double])]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "v")
      .withColumn("n2", graft.functions.VecDot.dot(col("v"), col("v")))
  }

  test("pruned range search ≡ brute force, and the bound prunes probes") {
    val rows = corpus()
    val all = frame(rows).localCheckpoint()

    // brute-force radius result, computed locally
    val vs = rows.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      acc / (na * nb)
    }
    val expected = (for {
      q <- 0L until Similarity.NumQueries.toLong
      (c, cv) <- vs if c != q
      s = BigDecimal(cos(vs(q), cv)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if s >= Similarity.RangeTau
    } yield (q, c, s)).toSet

    val got = Similarity.rangeFrom(all)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected, s"pruned=${got.size} brute=${expected.size}")
    assert(expected.nonEmpty, "threshold yields no matches — test corpus is degenerate")

    // the bound must discard a real fraction of the Q×K probe space on
    // clustered data (LCG centers are not perfectly decorrelated, so
    // some cross-cluster angles sit near the τ horizon — demand at
    // least half the probe space pruned, which a cross join never is)
    val (probes, _) = Similarity.rangeProbes(all)
    val nProbes = probes.count()
    val full = Similarity.NumQueries.toLong * Similarity.NumCentroids
    assert(nProbes <= full / 2, s"bound kept $nProbes of $full probes — not pruning")
  }
}
