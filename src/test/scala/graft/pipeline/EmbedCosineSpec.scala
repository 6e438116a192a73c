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

  test("clustered corpus: adaptive cells bound the candidate volume") {
    // 8 well-separated direction clusters × 50 near-copies each: the
    // qualifying pairs are exactly the within-cluster ones. With
    // K ≈ √400 = 20 spread centroids the triangle bound must discard
    // (almost) every cross-cluster cell pair, so the candidate count
    // stays a small multiple of the matching count — the adaptive
    // policy this guards replaced a fixed K=16 with first-16-vec_id
    // centroids, whose cells went unboundedly populous on clustered
    // data.
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(7)
    // cluster axes: standard basis directions — pairwise orthogonal,
    // so cross-cluster cosine ≈ 0 < τ and within-cluster cosine ≈ 1
    val rows = for {
      c <- 0 until 8; i <- 0 until 50
    } yield {
      val base = Array.tabulate(dim)(d => if (d == c) 1.0f else 0.0f)
      val v = base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      (c.toLong * 50 + i, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")

    val (assigned, cellPairs) = Dedup.embedCosineCells(emb)
    val candidates = Dedup.candidatePairs(assigned, cellPairs).count()
    val matching = Dedup.embedCosineOn(emb).count()

    // every within-cluster pair qualifies (cos ≈ 1 ≫ τ)
    assert(matching == 8L * (50L * 49 / 2), s"matching=$matching")
    assert(candidates <= 4 * matching,
      s"pruning ineffective on clustered data: candidates=$candidates matching=$matching")

    // per-cell population must stay ≈ n/K, not collapse into one cell
    val maxCell = assigned.groupBy("cell").count()
      .agg(org.apache.spark.sql.functions.max("count")).as[Long].head()
    val n = 400L; val k = math.ceil(math.sqrt(n.toDouble)).toLong
    assert(maxCell <= 4 * (n / k + 1), s"hot cell: $maxCell rows (n/K=${n / k})")
  }

  test("clustered corpus result equals brute force") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(11)
    val rows = for (c <- 0 until 4; i <- 0 until 25) yield {
      val base = Array.tabulate(dim)(d => if (d == c * 2) 1.0f else 0.0f)
      (c.toLong * 25 + i, base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val got = Dedup.embedCosineOn(emb).collect()
      .map(r => ((r.getAs[Long]("vec_id_1"), r.getAs[Long]("vec_id_2")),
        r.getAs[Double]("cos_sim"))).toMap
    val vecs = rows.map { case (id, v) => (id, v.map(_.toDouble).toArray) }
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
    assert(expected.nonEmpty)
  }

  test("embedCellGroups (SemDeDup) matches a local reference: buckets, groups, election") {
    val got = Dedup.embedCellGroups(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cell"), r.getAs[Long]("group_id"),
          r.getAs[Double]("centroid_cos"), r.getAs[Boolean]("is_kept")))).toMap

    val vecs = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def bucket(v: Array[Double]): Long =
      (0 until Similarity.NumPlanes).map { p =>
        val w = (0 until Similarity.Dim)
          .map(d => v(d) * Similarity.planeWeight(p, d)).sum
        if (w >= 0) 1L << p else 0L
      }.sum
    val cells = vecs.map { case (id, v) => id -> bucket(v) }.toMap
    // within-cell edges at τ, union-find to min-label groups
    val edges = for {
      (id1, v1) <- vecs; (id2, v2) <- vecs
      if id1 < id2 && cells(id1) == cells(id2) &&
        round6(dot(v1, v2) / (math.sqrt(dot(v1, v1)) * math.sqrt(dot(v2, v2)))) >=
          Dedup.CosineThreshold
    } yield (id1, id2)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b2) =>
      val (ra, rb) = (find(a), find(b2))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val grouped = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val groupOf = grouped.map(id => id -> find(id)).toMap
    // per-cell DECIMAL-exact mean centroid over ALL cell members
    val byCell = vecs.groupBy { case (id, _) => cells(id) }
    val centroid = byCell.map { case (c, ms) =>
      val cv = Array.tabulate(Similarity.Dim) { d =>
        val s = ms.map { case (_, v) =>
          BigDecimal(v(d)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        round6(s.toDouble / ms.length)
      }
      c -> cv
    }
    val expected = grouped.map { id =>
      val v = vecs.find(_._1 == id).get._2
      val cv = centroid(cells(id))
      val ccos = round6(dot(v, cv) / (math.sqrt(dot(v, v)) * math.sqrt(dot(cv, cv))))
      id -> (cells(id), groupOf(id), ccos)
    }.toMap
    val keeperOf = expected.groupBy(_._2._2).map { case (g, ms) =>
      g -> ms.toSeq.map { case (id, (_, _, ccos)) => (ccos, id) }.min._2
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (c, g, ccos)) =>
      assert(got(id) == ((c, g, ccos, keeperOf(g) == id)), s"vec $id")
    }
    // non-degenerate: at least one multi-member group, exactly one
    // keeper per group
    assert(expected.nonEmpty)
    got.groupBy(_._2._2).foreach { case (g, ms) =>
      assert(ms.count(_._2._4) == 1, s"group $g keeper count")
      assert(ms.size >= 2, s"group $g is a singleton")
    }
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
