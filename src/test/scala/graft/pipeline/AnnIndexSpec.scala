package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted ANN index must be a drop-in replacement for the
  * in-query [[Similarity.annIvfPq]] pipeline: identical neighbors,
  * distances and ranks after a parquet round-trip — and search must
  * run off the stored `(cell, m, code)` metadata, never the
  * candidates' float vectors. */
class AnnIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("stored-index search equals the in-query IVF-PQ pipeline") {
    val emb = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
    val path = java.nio.file.Files.createTempDirectory("graft_ann_idx").toString
    AnnIndex.write(emb, path)
    val idx = AnnIndex.load(spark, path)
    val got = AnnIndex
      .search(emb.filter(col("vec_id") < Similarity.NumQueries), idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val expected = Similarity.annIvfPq(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty && expected.map(_._1).distinct.size == Similarity.NumQueries)
  }

  test("the stored index holds codes, not vectors; search reads no embedding column") {
    val emb = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
    val path = java.nio.file.Files.createTempDirectory("graft_ann_idx2").toString
    AnnIndex.write(emb, path)
    val idx = AnnIndex.load(spark, path)
    // per-vector state is (vec_id, cell, m, code) — PqSubspaces rows
    // per vector of scalar metadata, no float payload
    assert(idx.codes.columns.toSeq == Seq("vec_id", "cell", "m", "code"))
    val n = emb.count()
    assert(idx.codes.count() == n * Similarity.PqSubspaces)
    // codes/ is partitioned by cell: the probe join must plan a
    // dynamic-partition-pruning filter on the stored scan, so a
    // search reads only its probed cells' files
    val searchPlan = AnnIndex
      .search(emb.filter(col("vec_id") < Similarity.NumQueries), idx)
      .queryExecution.executedPlan.toString
    assert(searchPlan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the codes scan:\n$searchPlan")
    // metadata relations are K-bounded
    assert(idx.centroids.count() == Similarity.NumCentroids)
    assert(idx.codebook.count() == Similarity.PqSubspaces * Similarity.PqCodes)
    // the search plan scans the index relations and the QUERY frame
    // only: every parquet scan in the plan belongs to the index root
    val queries = emb.filter(col("vec_id") < Similarity.NumQueries).localCheckpoint()
    val plan = AnnIndex.search(queries, idx).queryExecution.optimizedPlan
    val scans = plan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.nonEmpty)
    scans.foreach { r =>
      val roots = r.relation
        .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
        .location.rootPaths.mkString(",")
      assert(roots.contains(path), s"search scans a non-index relation: $roots")
    }
  }

  test("manifest records the build geometry and gates load") {
    val emb = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
    val path = java.nio.file.Files.createTempDirectory("graft_ann_idx3").toString
    AnnIndex.write(emb, path)
    val m = AnnIndex.manifest(spark, path).head()
    assert(m.getAs[Long]("n_vectors") == emb.count())
    assert(m.getAs[Int]("dim") == Similarity.Dim)
    assert(m.getAs[Int]("num_centroids") == Similarity.NumCentroids)
    assert(m.getAs[Int]("pq_m") == Similarity.PqSubspaces)
    assert(m.getAs[Int]("pq_k") == Similarity.PqCodes)
    assert(m.getAs[Boolean]("residual"))
    // a geometry-incompatible manifest must refuse to load
    import spark.implicits._
    Seq((1L, 32, Similarity.NumCentroids, Similarity.PqSubspaces, Similarity.PqCodes, true))
      .toDF("n_vectors", "dim", "num_centroids", "pq_m", "pq_k", "residual")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
    intercept[IllegalArgumentException](AnnIndex.load(spark, path))
  }

  test("AnnIndexTool CLI: build-then-search across invocations reproduces the in-query results") {
    val idxPath = java.nio.file.Files.createTempDirectory("graft_ann_cli_idx").toString
    val outPath = java.nio.file.Files.createTempDirectory("graft_ann_cli_out").toString
    val emb = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
    assert(graft.AnnIndexTool.build(spark, dir, idxPath) == emb.count())
    val n = graft.AnnIndexTool.search(spark, dir, idxPath, outPath, Similarity.TopK)
    assert(n == Similarity.NumQueries.toLong * Similarity.TopK)
    // the written neighbor table is the in-query pipeline's result
    val got = spark.read.parquet(s"$outPath/neighbors")
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("approx_dist2"), r.getAs[Int]("rank"))).toSeq
    val expected = Similarity.annIvfPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == expected)
  }

  test("add appends codes under the standing geometry without retraining") {
    val emb = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
    val path = java.nio.file.Files.createTempDirectory("graft_ann_add_spec").toString
    val base = emb.filter(col("vec_id") < AnnIndex.AddSplit)
    val tail = emb.filter(col("vec_id") >= AnnIndex.AddSplit)
    AnnIndex.write(base, path)
    val before = AnnIndex.load(spark, path)
    val cbBefore = before.codebook.collect().toSet
    val centBefore = before.centroids.collect().toSet
    AnnIndex.add(tail, path)
    val after = AnnIndex.load(spark, path)
    // no retraining: the metadata relations are byte-identical
    assert(after.codebook.collect().toSet == cbBefore)
    assert(after.centroids.collect().toSet == centBefore)
    // bookkeeping: PqSubspaces rows per vector, manifest re-committed
    assert(after.codes.count() == emb.count() * Similarity.PqSubspaces)
    assert(AnnIndex.manifest(spark, path).head().getAs[Long]("n_vectors") == emb.count())
    // the parquet round-trip reproduces the live-frame insert path:
    // train on the base, encode everything under it, search — same
    // neighbors, distances and ranks
    val queries = emb.filter(col("vec_id") < Similarity.NumQueries)
    val got = AnnIndex.search(queries, after).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val trained = AnnIndex.build(base)
    val live = Similarity.ivfPqSearch(
      queries.select(col("vec_id").as("query_id"),
          transform(col("embedding"), x => x.cast("double")).as("qv"))
        .withColumn("qn2", graft.functions.VecDot.dot(col("qv"), col("qv"))),
      trained.centroids, trained.codebook,
      Similarity.ivfPqEncode(
        emb.select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
          .withColumn("n2", graft.functions.VecDot.dot(col("v"), col("v"))),
        trained.centroids, trained.codebook, residual = true),
      residual = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == live)
    // the appended half actually participates in search results
    assert(got.exists(_._2 >= AnnIndex.AddSplit))
  }

  test("AnnIndexTool CLI: build-prefix/add-tail/search equals the ann_index_add entry") {
    val idxPath = java.nio.file.Files.createTempDirectory("graft_ann_cli_add").toString
    val outPath = java.nio.file.Files.createTempDirectory("graft_ann_cli_add_out").toString
    val emb = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
    assert(graft.AnnIndexTool.build(spark, dir, idxPath, AnnIndex.AddSplit) ==
      emb.filter(col("vec_id") < AnnIndex.AddSplit).count())
    assert(graft.AnnIndexTool.add(spark, dir, idxPath, AnnIndex.AddSplit) == emb.count())
    graft.AnnIndexTool.search(spark, dir, idxPath, outPath, Similarity.TopK)
    val got = spark.read.parquet(s"$outPath/neighbors")
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("approx_dist2"), r.getAs[Int]("rank"))).toSeq
    val expected = AnnIndex.annIndexAdd(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == expected)
  }

  test("search probes numProbes cells and respects topK") {
    val emb = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
    val idx = AnnIndex.build(emb)
    val out = AnnIndex.search(
      emb.filter(col("vec_id") < 3), idx, topK = 2, numProbes = 1)
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 1L, 2L))
    assert(rows.groupBy(_.getLong(0)).values.forall(_.length <= 2))
    assert(rows.forall(_.getInt(3) <= 2))
  }

  test("compact repairs a replayed add and collapses cell files") {
    val emb = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
    val path = java.nio.file.Files.createTempDirectory("graft_ann_compact").toString
    val base = emb.filter(col("vec_id") < AnnIndex.AddSplit)
    val tail = emb.filter(col("vec_id") >= AnnIndex.AddSplit)
    AnnIndex.write(base, path)
    AnnIndex.add(tail, path)
    val queries = emb.filter(col("vec_id") < Similarity.NumQueries)
    val cleanSearch = AnnIndex.search(queries, AnnIndex.load(spark, path)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq

    // replayed add: exact duplicate code rows — search now double-sums
    // the duplicated vectors' ADC distances, so results are corrupt
    AnnIndex.add(tail, path)
    val n = emb.count()
    val dupCodes = AnnIndex.load(spark, path).codes
    assert(dupCodes.count() == (n + tail.count()) * Similarity.PqSubspaces)
    val corrupt = AnnIndex.search(queries, AnnIndex.load(spark, path)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(corrupt != cleanSearch, "duplicate rows should corrupt ADC sums")

    val stats = AnnIndex.compact(spark, path)
    assert(stats.rowsBefore == (n + tail.count()) * Similarity.PqSubspaces)
    assert(stats.rowsAfter == n * Similarity.PqSubspaces)
    assert(stats.nVectors == n)
    assert(stats.filesAfter < stats.filesBefore)
    // one file per occupied cell
    val occupied = AnnIndex.load(spark, path).codes.select("cell").distinct().count()
    assert(stats.filesAfter == occupied, s"${stats.filesAfter} files for $occupied cells")
    // manifest re-committed with the deduped count
    assert(AnnIndex.manifest(spark, path).head().getAs[Long]("n_vectors") == n)
    // and search is exactly the pre-replay result again
    val repaired = AnnIndex.search(queries, AnnIndex.load(spark, path)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(repaired == cleanSearch)
  }

  test("remove tombstones ids out of candidacy; compact makes the delete physical") {
    val emb = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
    val path = java.nio.file.Files.createTempDirectory("graft_ann_rm").toString
    AnnIndex.write(emb, path)
    val queries = emb.filter(col("vec_id") < Similarity.NumQueries)
    def neighbors() = AnnIndex.search(queries, AnnIndex.load(spark, path)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val before = neighbors()
    // delete every neighbor the first query currently sees
    val victimIds = before.filter(_._1 == before.head._1).map(_._2).toSet
    import spark.implicits._
    AnnIndex.remove(victimIds.toSeq.toDF("vec_id"), path)
    AnnIndex.remove(victimIds.toSeq.toDF("vec_id"), path) // replayed: a set
    val after = neighbors()
    assert(after != before)
    assert(!after.exists(r => victimIds.contains(r._2)),
      "tombstoned ids must leave candidacy for every query")
    // compact: rows physically dropped, tombstone list cleared,
    // search unchanged
    val n = emb.count()
    val stats = AnnIndex.compact(spark, path)
    assert(stats.rowsAfter == (n - victimIds.size) * Similarity.PqSubspaces)
    assert(stats.nVectors == n - victimIds.size)
    assert(AnnIndex.load(spark, path).tombstones.isEmpty,
      "compact must clear the tombstone list")
    assert(neighbors() == after)
  }

  test("compact refuses conflicting codes for one (vec_id, m)") {
    import spark.implicits._
    val emb = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
    val path = java.nio.file.Files.createTempDirectory("graft_ann_conflict").toString
    AnnIndex.write(emb, path)
    // simulate a drifted re-add: same vec_id, different code value
    val existing = AnnIndex.load(spark, path).codes
    val drifted = existing.limit(Similarity.PqSubspaces)
      .withColumn("code", (col("code") + 1) % Similarity.PqCodes)
    drifted.write.partitionBy("cell").mode("append").parquet(s"$path/codes")
    val e = intercept[IllegalArgumentException](AnnIndex.compact(spark, path))
    assert(e.getMessage.contains("rebuild"))
  }

  // ------------------------------------------------------------ reindex

  /** Base corpus (doubles) plus a DRIFTED cohort: a pure translation
    * of the base — far from the build-time coarse geometry, so under
    * the OLD centroids the whole cohort crams into whichever cells
    * face the drift direction (the state
    * [[Similarity.annCellOccupancy]] exists to flag), while its
    * INTERNAL geometry is intact, so retrained centroids can spread
    * it back over many cells. */
  private def driftedCorpus(): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val emb = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val drifted = emb.select((col("vec_id") + lit(100000L)).as("vec_id"),
      transform(col("embedding"), x => x + lit(3.0)).as("embedding"))
    (emb, drifted)
  }

  test("reindex rebalances a drifted index; stored search equals the live recompute") {
    import graft.functions.VecDot.dot
    val (base, drifted) = driftedCorpus()
    val full = base.unionByName(drifted)
    val path = java.nio.file.Files.createTempDirectory("graft_ann_reindex").toString
    AnnIndex.write(base, path)
    AnnIndex.add(drifted, path) // encoded under the stale geometry: cells crowd
    val stats = AnnIndex.reindex(full, path)
    assert(stats.nVectors == full.count())
    // occupancy spread SHRINKS: the retrained centroids spread the
    // drifted cohort over its own cells instead of cramming it into
    // the base geometry's nearest one or two
    assert(stats.maxOverMeanAfter < stats.maxOverMeanBefore,
      s"reindex did not rebalance: $stats")
    // the reindexed STORED search must equal the live recompute with
    // the same math (retrain + encode + IVF-PQ search, no parquet
    // round-trip) — the swap discipline preserved the arithmetic
    val idx = AnnIndex.load(spark, path)
    val queries = base.filter(col("vec_id") < Similarity.NumQueries)
    val got = AnnIndex.search(queries, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val live = full
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n2", dot(col("v"), col("v")))
    val cent2 = AnnIndex.retrainCentroids(live, 2)
    val codes2 = Similarity.ivfPqEncode(live, cent2, idx.codebook, residual = true)
    val q = queries
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
      .withColumn("qn2", dot(col("qv"), col("qv")))
    val expected = Similarity.ivfPqSearch(q, cent2, idx.codebook, codes2, residual = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == expected && got.nonEmpty)
    assert(got.map(_._1).distinct.size == Similarity.NumQueries)
  }

  test("reindex makes tombstoned deletes physical and clears the list") {
    val (base, _) = driftedCorpus()
    val path = java.nio.file.Files.createTempDirectory("graft_ann_reindex_tb").toString
    AnnIndex.write(base, path)
    import spark.implicits._
    val victims = base.filter(col("vec_id") % 11 === 5).select(col("vec_id"))
    val victimIds = victims.collect().map(_.getLong(0)).toSet
    AnnIndex.remove(victims, path)
    val stats = AnnIndex.reindex(base, path)
    assert(stats.nVectors == base.count() - victimIds.size)
    val idx = AnnIndex.load(spark, path)
    assert(idx.tombstones.isEmpty, "reindex must clear the tombstone list")
    assert(idx.codes.filter(col("vec_id").isin(victimIds.toSeq: _*)).count() == 0,
      "tombstoned vectors must leave the reindexed relation physically")
    val results = AnnIndex.search(base.filter(col("vec_id") < Similarity.NumQueries), idx)
      .collect().map(_.getLong(1)).toSet
    assert((results & victimIds).isEmpty)
  }

  test("crash mid-reindex leaves a load-refused (and reindex-refused) index") {
    val (base, _) = driftedCorpus()
    val path = java.nio.file.Files.createTempDirectory("graft_ann_reindex_crash").toString
    AnnIndex.write(base, path)
    // simulate the crash window: staging landed, manifest already
    // deleted, swap not finished
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(s"$path/centroids").write.parquet(s"$path/centroids_reindex")
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$path/manifest"), true))
    intercept[Exception](AnnIndex.load(spark, path))
    intercept[Exception](AnnIndex.reindex(base, path)) // loads first: refused too
  }
}
