package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** corpus_semdedup contract: the keep verdict must be exactly the
  * keep-first rule under brute-force within-cluster cosine — every
  * drop is witnessed by a real earlier neighbor, every keep by the
  * absence of one — and the first vector of every cluster survives
  * by construction. */
class SemdedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("verdicts ≡ brute-force within-cluster keep-first; cluster minima always survive") {
    val verdicts = Dedup.semdedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
    assert(verdicts.nonEmpty)
    assert(verdicts.forall(!_._3), "no oversize clusters at test scale")
    // local brute force over the SAME assignments and vectors
    val a2 = Corpus.kmeansAssignments(spark, dir)._2.collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Double]]("v").toArray,
        r.getAs[Double]("n2"), r.getAs[Int]("cluster_id")))
    val byCluster = a2.groupBy(_._4)
    def cos(a: (Long, Array[Double], Double, Int), b: (Long, Array[Double], Double, Int)) = {
      val d = a._2.zip(b._2).map { case (x, y) => x * y }.sum
      BigDecimal(d / (math.sqrt(a._3) * math.sqrt(b._3)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = a2.map { v =>
      val earlier = byCluster(v._4).filter(_._1 < v._1)
        .map(u => cos(u, v)).filter(_ >= Dedup.CosineThreshold)
      v._1 -> (if (earlier.isEmpty) None else Some(earlier.max))
    }.toMap
    verdicts.foreach { case (id, _, _, sim, kept) =>
      assert(sim == expected(id), s"vec $id: $sim vs ${expected(id)}")
      assert(kept == expected(id).isEmpty, s"vec $id verdict")
    }
    // some drops happen on the driver corpus, and the first vector of
    // every cluster is structurally kept
    assert(verdicts.exists(!_._5) && verdicts.exists(_._5))
    val minPerCluster = verdicts.groupBy(_._2).map { case (_, vs) => vs.map(_._1).min }.toSet
    assert(verdicts.filter(v => minPerCluster(v._1)).forall(_._5),
      "a cluster's lowest vec_id has no earlier mate and must be kept")
  }
}
