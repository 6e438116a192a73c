package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY.md §2c #29-30).
  *
  * All variants score through the native codegen'd
  * [[graft.functions.VecDot]] expression. (An earlier `zip_with` +
  * left-fold `aggregate` formulation was abandoned: Catalyst higher-
  * order functions run INTERPRETED per element — brute force cost
  * ~20 s at sf0.1 vs 0.6 s with VecDot; see SURVEY §4 and the VecMath
  * scaladoc.) The
  * brute-force form is the exact baseline/oracle; the LSH-bucketed form
  * is the 100 TB path: candidates meet only inside a
  * random-hyperplane bucket, so the join is a hash shuffle on the
  * bucket id instead of a cross product. Hyperplanes are derived from
  * a fixed LCG so Spark and the DuckDB oracle build bit-identical
  * planes with no stored model.
  */
object Similarity {

  val TopK = 5
  val NumQueries = 10   // vec_id < NumQueries are the query vectors
  val NumPlanes = 4     // 2^4 = 16 LSH buckets
  val Dim = 64

  /** Deterministic LCG weight for (plane, dim) in [-0.5, 0.5). */
  def planeWeight(p: Int, d: Int): Double =
    ((1103515245L * (p * Dim + d) + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n2", graft.functions.VecDot.dot(col("v"), col("v")))

  /** Native codegen'd fold (graft.functions.VecDot) — per-pair scoring
    * is the hot path; an interpreted zip_with+aggregate here cost ~20 s
    * at sf0.1 (SURVEY §4 lesson). Same left-fold order as the oracle's
    * list_reduce, bit-identical values. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VecDot.dot(a, b)

  private def cosine(dotCol: Column, n2a: Column, n2b: Column): Column =
    round(dotCol / (sqrt(n2a) * sqrt(n2b)), 6)

  // ------------------------------------------------------------ #29 brute force

  /** Exact top-k cosine neighbors for each query vector. Cross join of
    * a tiny broadcast query side against the full table — one scan, a
    * per-partition top-k via window on the query id. */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame =
    bruteForceFrom(vecs(spark, dir))

  private def bruteForceFrom(all: DataFrame): DataFrame = {
    val q = all.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    all.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(dot(col("qv"), col("v")), col("qn2"), col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val cosSql: String =
    """round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i])), (acc, x) -> acc + x)
      |    / (sqrt(q.n2) * sqrt(c.n2)), 6)""".stripMargin

  private val vecsCteSql: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |vecs AS (
      |  SELECT vec_id, v,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(v, x -> x * x)), (acc, x) -> acc + x) AS n2
      |  FROM e)""".stripMargin

  val annBruteForceSql: String =
    s"""$vecsCteSql,
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $cosSql AS cos_sim
       |  FROM vecs q JOIN vecs c ON q.vec_id < $NumQueries AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  // ------------------------------------------------------------ #30 LSH-bucketed

  /** Random-hyperplane bucket id: bit p set iff w_p · v >= 0. A pure
    * per-row projection (NumPlanes × Dim multiply-adds). */
  private[pipeline] def bucketCol(v: Column): Column =
    (0 until NumPlanes).map { p =>
      val dotW = (0 until Dim).map(d => element_at(v, d + 1) * planeWeight(p, d)).reduce(_ + _)
      when(dotW >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  private[pipeline] def bucketSql(v: String): String =
    (0 until NumPlanes).map { p =>
      val dotW = (0 until Dim).map(d => s"($v)[${d + 1}] * ${planeWeight(p, d)}").mkString(" + ")
      s"(CASE WHEN $dotW >= 0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  /** LSH-bucketed ANN: queries only meet candidates in their own
    * hyperplane bucket — the equi-join shuffles on `bucket`, so work
    * scales with bucket occupancy (n/2^planes), not n². At 100 TB:
    * more planes + multi-probe, same plan shape. */
  def annLshBucketed(spark: SparkSession, dir: String): DataFrame =
    lshFrom(vecs(spark, dir))

  private def lshFrom(prepared: DataFrame): DataFrame = {
    val all = prepared.withColumn("bucket", bucketCol(col("v")))
    val q = all.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n2").as("qn2"),
        col("bucket"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    all.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(dot(col("qv"), col("v")), col("qn2"), col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim"),
        col("rank"), col("bucket"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ------------------------------------------------------------ #30b IVF

  val NumCentroids = 16
  val NumProbes = 4

  /** IVF (inverted-file) ANN: assign every vector to its nearest
    * coarse centroid (the "cell"), then search a query only in its
    * NumProbes nearest cells. Centroids here are the first
    * NumCentroids vectors — a deterministic stand-in for a trained
    * k-means codebook (training is a separate offline job at scale;
    * the SEARCH plan is identical either way).
    *
    * Scale shape: centroids broadcast (tiny), assignment is one
    * map-side scoring pass whose per-vector top-1 is an AGGREGATE
    * (the broadcast expansion collapses before the exchange, so it
    * carries n rows, not n·K — the window formulation this replaces
    * shuffled the full expansion), the probe-side top-NumProbes
    * window runs only over the query SAMPLE's K-expansion (tiny by
    * construction), and the probe join shuffles on `cell` — work
    * scales with n/K per probed cell, the standard IVF layout for
    * billion-vector search. */
  /** Shared coarse assignment → (cells, probes). The data side's
    * nearest-cell pick is a map-side-combining aggregate over the
    * broadcast K-expansion — partial max collapses each vec_id's K
    * rows inside its input partition, so the exchange carries n rows.
    * The top-[[NumProbes]] window exists only on the query side, whose
    * expansion is [[NumQueries]]·K rows by construction. Tie-breaks
    * (highest cosine, then lowest cid) match the oracle's
    * ROW_NUMBER ordering exactly: max(struct(c_cos, −cid)). */
  private def ivfAssign(all: DataFrame, cent: DataFrame): (DataFrame, DataFrame) = {
    val scored = all.join(broadcast(cent), lit(true))
      .withColumn("c_cos", cosine(dot(col("v"), col("cv")), col("n2"), col("cn2")))
    val cells = scored
      .groupBy(col("vec_id"))
      .agg(first(col("v")).as("v"), first(col("n2")).as("n2"),
        max(struct(col("c_cos"), (-col("cid")).as("ncid"))).as("best"))
      .select(col("vec_id"), col("v"), col("n2"), (-col("best.ncid")).as("cell"))
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("c_cos").desc, col("cid"))
    val probes = scored.filter(col("vec_id") < NumQueries)
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") <= NumProbes)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n2").as("qn2"),
        col("cid").as("cell"))
    (cells, probes)
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame =
    ivfFrom(vecs(spark, dir))

  private def ivfFrom(all: DataFrame): DataFrame = {
    val cent = all.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("n2").as("cn2"))
    val (cells, probes) = ivfAssign(all, cent)
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    cells.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(dot(col("qv"), col("v")), col("qn2"), col("n2")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim"),
        col("rank"), col("cell"))
      .orderBy(col("query_id"), col("rank"))
  }

  val PqSubspaces = 4 // M: subvectors per vector (64 dims → 4 × 16)
  val PqSubDim = 16
  val PqCodes = 16    // K: codebook entries per subspace → 4-bit codes

  /** Product quantization — the memory side of a billion-vector ANN
    * index (IVF-PQ): each vector is encoded as [[PqSubspaces]] 4-bit
    * codes (here packed into one int), compressing 64 float dims to
    * 16 bits at the cost of the reported reconstruction error.
    * Codebooks are the first [[PqCodes]] vectors' subslices — the same
    * deterministic seeding as [[annIvf]]/emb_kmeans (a trained run
    * would Lloyd-iterate per subspace exactly like emb_kmeans does
    * globally; the encode path below is identical either way).
    *
    * Scale: the codebook (M·K·subdim doubles) broadcasts; encoding is
    * one map-side scoring pass + a per-(vector, subspace) argmin
    * window over M·K scored rows — O(n·M·K) work, no shuffle wider
    * than the vector id. Distances via ‖x‖²−2x·c+‖c‖² with the native
    * [[graft.functions.VecDot]] fold; the per-subspace errors sum
    * through DECIMAL so the total is order-independent (the doc'd
    * bit-stability rule for double aggregation). */
  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val subs = vecs(spark, dir)
      .select(col("vec_id"), col("v"),
        explode_outer(sequence(lit(0), lit(PqSubspaces - 1))).as("m"))
      .select(col("vec_id"), col("m"),
        slice(col("v"), col("m") * PqSubDim + 1, lit(PqSubDim)).as("sub"))
      .withColumn("sn2", dot(col("sub"), col("sub")))
      // feeds both the codebook filter and the probe join — one pass
      .localCheckpoint()
    val cb = subs.filter(col("vec_id") < PqCodes)
      .select(col("m"), col("vec_id").cast("int").as("code"),
        col("sub").as("csub"), col("sn2").as("cn2"))
    // per-(vector, subspace) argmin as a map-side-combining aggregate:
    // the broadcast K-expansion collapses inside its input partition,
    // so the exchange carries n·M rows, not n·M·K (the row_number
    // window this replaces shuffled the full expansion); min(struct) ≡
    // ROW_NUMBER ordered by (dist2, code)
    subs.join(broadcast(cb), Seq("m"))
      .withColumn("dist2", col("sn2") - lit(2.0) * dot(col("sub"), col("csub")) + col("cn2"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("dist2"), col("code"))).as("best"))
      .groupBy(col("vec_id"))
      .agg(sum(col("best.code").cast("long") * pow(lit(16.0), col("m")).cast("long")).as("pq_code"),
        round(sum(col("best.dist2").cast("decimal(27,12)")).cast("double"), 6).as("recon_err"))
      .orderBy(col("vec_id"))
  }

  val annPqSql: String = {
    val dotSql = (a: String, b: String) =>
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])), (acc, x) -> acc + x)""".stripMargin
    s"""$vecsCteSql,
       |subs AS (
       |  SELECT vec_id, m.m AS m,
       |    list_slice(v, m.m * $PqSubDim + 1, m.m * $PqSubDim + $PqSubDim) AS sub
       |  FROM vecs, LATERAL (SELECT unnest(generate_series(0, ${PqSubspaces - 1})) AS m) m),
       |subs2 AS (
       |  SELECT vec_id, m, sub, ${dotSql("sub", "sub")} AS sn2 FROM subs),
       |cb AS (
       |  SELECT m, CAST(vec_id AS INT) AS code, sub AS csub, sn2 AS cn2
       |  FROM subs2 WHERE vec_id < $PqCodes),
       |scored AS (
       |  SELECT s.vec_id, s.m, c.code,
       |    s.sn2 - 2.0 * ${dotSql("s.sub", "c.csub")} + c.cn2 AS dist2
       |  FROM subs2 s JOIN cb c ON s.m = c.m),
       |chosen AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist2, code) AS rn
       |    FROM scored)
       |  WHERE rn = 1)
       |SELECT vec_id,
       |  CAST(SUM(CAST(code AS BIGINT) * CAST(pow(16, m) AS BIGINT)) AS BIGINT) AS pq_code,
       |  round(CAST(SUM(CAST(dist2 AS DECIMAL(27,12))) AS DOUBLE), 6) AS recon_err
       |FROM chosen GROUP BY 1 ORDER BY vec_id""".stripMargin
  }

  val annIvfSql: String = {
    val cCos =
      """round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(generate_series(1, len(a.v)), i -> a.v[i] * c.cv[i])), (acc, x) -> acc + x)
        |    / (sqrt(a.n2) * sqrt(c.cn2)), 6)""".stripMargin
    s"""$vecsCteSql,
       |cent AS (
       |  SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM vecs WHERE vec_id < $NumCentroids),
       |assigned AS (
       |  SELECT a.vec_id, a.v, a.n2, c.cid,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY $cCos DESC, c.cid) AS INT) AS crn
       |  FROM vecs a CROSS JOIN cent c),
       |cells AS (
       |  SELECT vec_id, v, n2, cid AS cell FROM assigned WHERE crn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, v AS qv, n2 AS qn2, cid AS cell
       |  FROM assigned WHERE vec_id < $NumQueries AND crn <= $NumProbes),
       |scored AS (
       |  SELECT p.query_id, c.vec_id AS neighbor_id, p.cell AS cell,
       |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        list_transform(generate_series(1, len(p.qv)), i -> p.qv[i] * c.v[i])), (acc, x) -> acc + x)
       |      / (sqrt(p.qn2) * sqrt(c.n2)), 6) AS cos_sim
       |  FROM cells c JOIN probes p ON c.cell = p.cell
       |  WHERE c.vec_id <> p.query_id),
       |ranked AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank, cell
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin
  }

  // ------------------------------------------------------------ #30j cell occupancy

  /** IVF INDEX-HEALTH report — per-cell occupancy of the coarse
    * quantizer (the same deterministic centroids/assignment as
    * [[annIvf]] and the persisted [[AnnIndex]]): vector count, corpus
    * share, and the ratio to the perfectly-balanced mean. A skewed
    * quantizer is the IVF failure mode probe sweeps can't see — one
    * overfull cell makes every probe that touches it pay n/K × skew,
    * and it's the re-train trigger (centroids no longer fit the
    * distribution). EVERY cell is emitted including empties (the
    * q_histogram rule: a silent hole reads as "balanced"; an EMPTY
    * cell is wasted codebook capacity and the complementary symptom).
    *
    * Scale: the assignment is the map-side-combining broadcast-argmax
    * aggregate (n-row exchange, [[ivfAssign]]'s shape), the report is
    * a K-key aggregate joined to the K-row cell dim — nothing after
    * the assignment is data-sized. */
  def annCellOccupancy(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir)
    val cent = all.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("n2").as("cn2"))
    val (cells, _) = ivfAssign(all, cent)
    val occ = cells.groupBy(col("cell")).agg(count(lit(1)).as("n_vectors"))
    val dim = { import spark.implicits._
      (0L until NumCentroids.toLong).toDF("cell") }
    val total = occ.agg(sum(col("n_vectors")).as("n_total"))
    dim.join(broadcast(occ), Seq("cell"), "left")
      .crossJoin(broadcast(total))
      .select(col("cell"),
        coalesce(col("n_vectors"), lit(0L)).as("n_vectors"),
        round(coalesce(col("n_vectors"), lit(0L)).cast("double") /
          col("n_total").cast("double"), 6).as("share"),
        round(coalesce(col("n_vectors"), lit(0L)).cast("double") /
          (col("n_total").cast("double") / lit(NumCentroids.toDouble)), 6)
          .as("ratio_to_mean"))
      .orderBy(col("cell"))
  }

  val annCellOccupancySql: String = {
    val cCos =
      """round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(generate_series(1, len(a.v)), i -> a.v[i] * c.cv[i])), (acc, x) -> acc + x)
        |    / (sqrt(a.n2) * sqrt(c.cn2)), 6)""".stripMargin
    s"""$vecsCteSql,
       |cent AS (
       |  SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM vecs WHERE vec_id < $NumCentroids),
       |assigned AS (
       |  SELECT a.vec_id, c.cid,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY $cCos DESC, c.cid) AS INT) AS crn
       |  FROM vecs a CROSS JOIN cent c),
       |occ AS (
       |  SELECT cid AS cell, COUNT(*) AS n_vectors FROM assigned WHERE crn = 1 GROUP BY 1),
       |tot AS (SELECT SUM(n_vectors) AS n_total FROM occ),
       |dim AS (SELECT unnest(generate_series(0, ${NumCentroids - 1})) AS cell)
       |SELECT CAST(dim.cell AS BIGINT) AS cell,
       |  CAST(COALESCE(occ.n_vectors, 0) AS BIGINT) AS n_vectors,
       |  round(CAST(COALESCE(occ.n_vectors, 0) AS DOUBLE) / CAST(tot.n_total AS DOUBLE), 6) AS share,
       |  round(CAST(COALESCE(occ.n_vectors, 0) AS DOUBLE)
       |    / (CAST(tot.n_total AS DOUBLE) / $NumCentroids.0), 6) AS ratio_to_mean
       |FROM dim LEFT JOIN occ ON dim.cell = occ.cell CROSS JOIN tot
       |ORDER BY dim.cell""".stripMargin
  }

  val annLshBucketedSql: String =
    s"""$vecsCteSql,
       |bucketed AS (
       |  SELECT vec_id, v, n2, ${bucketSql("v")} AS bucket FROM vecs),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket AS bucket, $cosSql AS cos_sim
       |  FROM bucketed q JOIN bucketed c ON q.bucket = c.bucket
       |  WHERE q.vec_id < $NumQueries AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank, bucket
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  /** IVF-PQ search — the two halves composed the way a billion-vector
    * index actually runs (#30b's coarse cells + #30d's codes), with
    * RESIDUAL encoding: PQ quantizes (x − centroid(cell(x))), not the
    * raw vector. Residuals concentrate near the origin once the coarse
    * quantizer has absorbed the between-cell variance, so the same
    * 16 bits of code spend their resolution on the within-cell detail
    * that actually separates candidates — the standard IVFADC layout
    * (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011, §IV).
    *
    * A query probes its [[NumProbes]] nearest cells; every candidate
    * in them is scored by ASYMMETRIC distance (ADC): the exact QUERY
    * residual against that cell's centroid, per subspace, vs the
    * candidate's 4-bit codebook entry — Σ_m ‖(q−c)_m −
    * codebook[m][code_m(x)]‖². The candidate's floats are never
    * touched at search time; that is the whole point of PQ (the index
    * holds 16 bits per vector, not 256 bytes). Because the query
    * residual depends on the probed cell, the ADC table is keyed
    * (query, cell, m, code) — still queries × probes × M × K rows of
    * broadcastable metadata.
    *
    * Scale: codebooks, the probe list and the ADC table broadcast;
    * candidates shuffle once on the cell key and once on vec_id for
    * the code lookup — both AQE-splittable equi-joins, work n/K per
    * probed cell, no floats moved for candidates. The per-candidate
    * sum over the M=4 subspace terms goes through DECIMAL, so it is
    * order-independent and hash-comparable (the doc'd bit-stability
    * rule). */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame =
    annIvfPqOn(Tables.spread(Tables.embeddings(spark, dir)), residual = true)

  /** [[annIvfPq]] over any `(vec_id, embedding)`-shaped frame, with
    * the encoding policy explicit — `residual=false` quantizes raw
    * vectors at the SAME bit budget (same M, K, seeds, training),
    * exhausting over the same probed candidates: that is "plain PQ at
    * equal bits" on this index, kept so the recall spec can prove
    * residual ≥ raw. */
  private[pipeline] def annIvfPqOn(emb: DataFrame, residual: Boolean): DataFrame =
    ivfPqFrom(emb
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n2", graft.functions.VecDot.dot(col("v"), col("v"))), residual)

  /** TRAINING half of the IVF-PQ pipeline, factored out so the
    * standing-index path ([[AnnIndex]]) can persist its outputs and
    * search WITHOUT retraining: coarse centroids `(cid, cv, cn2)`,
    * the trained residual codebook `(m, code, csub, cn2s)`, and the
    * per-vector index rows `(vec_id, cell, m, code)` — [[PqSubspaces]]
    * rows per vector, the 16-bit-per-vector state an IVFADC index
    * actually stores. Candidate floats appear ONLY here (build time);
    * [[ivfPqSearch]] never reads them. */
  /** Per-(vector, subspace) nearest-codebook-entry argmin as a
    * map-side-combining aggregate — the broadcast expansion collapses
    * before any exchange, so the shuffle carries n·M rows, not n·M·K
    * (the window formulation this replaces shuffled the expansion).
    * Shared by the Lloyd E-step, the final encode pass, and
    * [[ivfPqEncode]]'s no-retrain insert path. */
  private def nearestCode(in: DataFrame, book: DataFrame): DataFrame =
    in.join(broadcast(book), Seq("m"))
      .withColumn("dist2",
        col("sn2") - lit(2.0) * dot(col("sub"), col("csub")) + col("cn2s"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("dist2"), col("code"))).as("best"),
        first(col("sub")).as("sub"), first(col("cell")).as("cell"))
      .select(col("vec_id"), col("cell"), col("m"), col("best.code").as("code"), col("sub"))

  /** Residual (or raw) subvector expansion for a cell-assigned frame
    * `(vec_id, v, cell)` — the shared front half of training's encode
    * pass and [[ivfPqEncode]]. */
  private def subspacesOf(cells: DataFrame, cent: DataFrame, residual: Boolean): DataFrame = {
    val centV = cent.select(col("cid").as("cell"), col("cv"))
    val resCells =
      if (residual) cells.join(broadcast(centV), Seq("cell"))
        .select(col("vec_id"), col("cell"),
          zip_with(col("v"), col("cv"), (a, b) => a - b).as("rv"))
      else cells.select(col("vec_id"), col("cell"), col("v").as("rv"))
    resCells
      .select(col("vec_id"), col("cell"), col("rv"),
        explode_outer(sequence(lit(0), lit(PqSubspaces - 1))).as("m"))
      .select(col("vec_id"), col("cell"), col("m"),
        slice(col("rv"), col("m") * PqSubDim + 1, lit(PqSubDim)).as("sub"))
      .withColumn("sn2", dot(col("sub"), col("sub")))
  }

  /** ENCODE-ONLY pass against STORED index structures — the online
    * insert path: assign each new vector to its nearest stored coarse
    * cell, quantize its (residual) subvectors against the stored
    * codebook, emit `(vec_id, cell, m, code)` rows. No retraining —
    * the standard IVF insert (codebooks retrain on the offline
    * cadence; until then new vectors are encoded under the standing
    * geometry, exactly what [[AnnIndex.add]] appends). Map-side work
    * only: centroids and codebook are K-row broadcast metadata, the
    * single exchange carries n·M rows. */
  private[pipeline] def ivfPqEncode(all: DataFrame, cent: DataFrame, cb: DataFrame,
      residual: Boolean): DataFrame = {
    val (cellsFull, _) = ivfAssign(all, cent)
    val cells = cellsFull.select(col("vec_id"), col("v"), col("cell"))
    nearestCode(subspacesOf(cells, cent, residual), cb)
      .select(col("vec_id"), col("cell"), col("m"), col("code"))
  }

  private[pipeline] def ivfPqTrain(all: DataFrame, residual: Boolean)
      : (DataFrame, DataFrame, DataFrame) = {
    // NOT localCheckpointed (r13 optimization round): materializing
    // the 16-row relation would be cheap, but the checkpoint turns it
    // into an opaque LogicalRDD that PlanGuardSpec can no longer prove
    // bounded when it is broadcast — the guard outweighs the saved
    // re-scan (which ReuseExchange already dedups at the shuffle).
    val cent = all.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("n2").as("cn2"))
    // same aggregate-not-window assignment as annIvf (n-row exchange);
    // the probe side of ivfAssign is lazy and unused here — queries
    // are assigned at SEARCH time against the (stored) centroids
    val (cellsFull, _) = ivfAssign(all, cent)
    val cells = cellsFull.select(col("vec_id"), col("v"), col("cell"))
    // residual per DATA vector: x − centroid(cell(x)) (raw mode: x)
    val subs = subspacesOf(cells, cent, residual)
      .localCheckpoint() // feeds codebook training AND the encode pass
    // TRAINED codebook: seeds = K NON-CENTROID subvectors, then ONE
    // Lloyd iteration per subspace (emb_kmeans's recipe: DECIMAL-exact
    // means at (m, code, dim) grain, re-arrayed). Seeds must exclude
    // the coarse centroids: a centroid's residual is the ZERO vector
    // (it is its own nearest cell), so `vec_id < PqCodes` seeds would
    // hand residual training 16 copies of zero and the codebook
    // collapses to one effective code (measured: recall 0.14 vs 0.36).
    // A sampled-row codebook also wastes entries wherever the first
    // rows happened to land; the M-step spreads them over the actual
    // (residual) distribution — what makes residual encoding pay off.
    val cb0 = subs
      .filter(col("vec_id") >= NumCentroids && col("vec_id") < NumCentroids + PqCodes)
      .select(col("m"), (col("vec_id") - NumCentroids).cast("int").as("code"),
        col("sub").as("csub"), col("sn2").as("cn2s"))
    val cb = nearestCode(subs, cb0)
      .select(col("m"), col("code"), posexplode(col("sub")).as(Seq("pos", "x")))
      .groupBy(col("m"), col("code"), col("pos"))
      .agg(round(sum(col("x").cast("decimal(27,12)")).cast("double") / count(lit(1)), 6)
        .as("cm"))
      .groupBy(col("m"), col("code"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cm")))),
        s => s.getField("cm")).as("csub"))
      .withColumn("cn2s", dot(col("csub"), col("csub")))
    val codes = nearestCode(subs, cb)
      .select(col("vec_id"), col("cell"), col("m"), col("code"))
    (cent, cb, codes)
  }

  /** SEARCH half of the IVF-PQ pipeline — probes the index structures
    * [[ivfPqTrain]] emits (live frames or parquet-loaded, same plan)
    * and NEVER touches a candidate's floats: only the query vectors
    * arrive as floats; candidates exist as `(cell, m, code)` metadata.
    * Query probe assignment, the per-cell query residual, and the ADC
    * table are the documented [[annIvfPq]] arithmetic, bit-identical. */
  private[pipeline] def ivfPqSearch(queries: DataFrame, cent: DataFrame, cb: DataFrame,
      codes: DataFrame, residual: Boolean, topK: Int = TopK,
      numProbes: Int = NumProbes): DataFrame = {
    val centV = cent.select(col("cid").as("cell"), col("cv"))
    // probe list: the query side of ivfAssign's window — queries are a
    // sample by construction, so the K-expansion is tiny
    val wAssign = Window.partitionBy(col("query_id")).orderBy(col("c_cos").desc, col("cid"))
    val probes = queries.join(broadcast(cent), lit(true))
      .withColumn("c_cos", cosine(dot(col("qv"), col("cv")), col("qn2"), col("cn2")))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") <= numProbes)
      .select(col("query_id"), col("qv"), col("cid").as("cell"))
    // query residual PER PROBED CELL: (q − centroid(cell)) — raw mode
    // reuses q for every cell, but keeps the (query, cell) grain so
    // both modes share one ADC join shape
    val qres =
      if (residual) probes.join(broadcast(centV), Seq("cell"))
        .select(col("query_id"), col("cell"),
          zip_with(col("qv"), col("cv"), (a, b) => a - b).as("rq"))
      else probes.select(col("query_id"), col("cell"), col("qv").as("rq"))
    val qdist = qres
      .select(col("query_id"), col("cell"), col("rq"),
        explode_outer(sequence(lit(0), lit(PqSubspaces - 1))).as("m"))
      .select(col("query_id"), col("cell"), col("m"),
        slice(col("rq"), col("m") * PqSubDim + 1, lit(PqSubDim)).as("qsub"))
      .withColumn("qn2s", dot(col("qsub"), col("qsub")))
      .join(broadcast(cb), Seq("m"))
      .select(col("query_id"), col("cell"), col("m"), col("code"),
        (col("qn2s") - lit(2.0) * dot(col("qsub"), col("csub")) + col("cn2s")).as("qd"))
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("approx_dist2"), col("vec_id"))
    codes
      .join(broadcast(probes.select(col("query_id"), col("cell"))), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(qdist), Seq("query_id", "cell", "m", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(round(sum(col("qd").cast("decimal(27,12)")).cast("double"), 6).as("approx_dist2"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("approx_dist2"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  private def ivfPqFrom(all: DataFrame, residual: Boolean): DataFrame = {
    val (cent, cb, codes) = ivfPqTrain(all, residual)
    val queries = all.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n2").as("qn2"))
    ivfPqSearch(queries, cent, cb, codes, residual)
  }

  val annIvfPqSql: String = ivfPqSqlTrainedBelow(None)

  /** [[annIvfPqSql]] with the codebook's Lloyd training restricted to
    * `vec_id < trainLimit` while everything else (coarse assignment,
    * the encode pass, probing, ADC) still covers the full table —
    * i.e. the ground truth for "index BUILT on the first `trainLimit`
    * vectors, the rest [[AnnIndex.add]]ed without retraining, then
    * searched": stale-codebook encoding of the appended vectors is
    * exactly what the online-insert contract promises. `None` = train
    * on everything (the plain [[annIvfPq]] pipeline). */
  private[pipeline] def ivfPqSqlTrainedBelow(trainLimit: Option[Int],
      candExclude: String = ""): String = {
    val trainWhere = trainLimit.map(k => s" WHERE s.vec_id < $k").getOrElse("")
    val dotSql = (a: String, b: String) =>
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])), (acc, x) -> acc + x)""".stripMargin
    val cCos =
      """round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(generate_series(1, len(a.v)), i -> a.v[i] * c.cv[i])), (acc, x) -> acc + x)
        |    / (sqrt(a.n2) * sqrt(c.cn2)), 6)""".stripMargin
    s"""$vecsCteSql,
       |cent AS (
       |  SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM vecs WHERE vec_id < $NumCentroids),
       |assigned AS (
       |  SELECT a.vec_id, a.v, c.cid,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY $cCos DESC, c.cid) AS INT) AS crn
       |  FROM vecs a CROSS JOIN cent c),
       |cells AS (SELECT vec_id, v, cid AS cell FROM assigned WHERE crn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, v AS qv, cid AS cell
       |  FROM assigned WHERE vec_id < $NumQueries AND crn <= $NumProbes),
       |rescells AS (
       |  SELECT c.vec_id, c.cell,
       |    list_transform(generate_series(1, len(c.v)), i -> c.v[i] - t.cv[i]) AS rv
       |  FROM cells c JOIN cent t ON c.cell = t.cid),
       |subs AS (
       |  SELECT vec_id, m.m AS m,
       |    list_slice(rv, m.m * $PqSubDim + 1, m.m * $PqSubDim + $PqSubDim) AS sub
       |  FROM rescells, LATERAL (SELECT unnest(generate_series(0, ${PqSubspaces - 1})) AS m) m),
       |subs2 AS (
       |  SELECT vec_id, m, sub, ${dotSql("sub", "sub")} AS sn2 FROM subs),
       |cb0 AS (
       |  SELECT m, CAST(vec_id - $NumCentroids AS INT) AS code, sub AS csub, sn2 AS cn2s
       |  FROM subs2 WHERE vec_id >= $NumCentroids AND vec_id < ${NumCentroids + PqCodes}),
       |assign0 AS (
       |  SELECT m, code, sub FROM (
       |    SELECT s.vec_id, s.m, c.code, s.sub,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
       |        ORDER BY s.sn2 - 2.0 * ${dotSql("s.sub", "c.csub")} + c.cn2s, c.code) AS rn
       |    FROM subs2 s JOIN cb0 c ON s.m = c.m$trainWhere)
       |  WHERE rn = 1),
       |cbdims AS (
       |  SELECT m, code, i.i AS pos,
       |    round(CAST(SUM(CAST(sub[i.i] AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 6) AS cm
       |  FROM assign0, LATERAL (SELECT unnest(generate_series(1, len(sub))) AS i) i
       |  GROUP BY m, code, i.i),
       |cb AS (
       |  SELECT m, code, csub, ${dotSql("csub", "csub")} AS cn2s FROM (
       |    SELECT m, code, list(cm ORDER BY pos) AS csub FROM cbdims GROUP BY m, code)),
       |scored AS (
       |  SELECT s.vec_id, s.m, c.code,
       |    s.sn2 - 2.0 * ${dotSql("s.sub", "c.csub")} + c.cn2s AS dist2
       |  FROM subs2 s JOIN cb c ON s.m = c.m),
       |chosen AS (
       |  SELECT vec_id, m, code FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist2, code) AS rn
       |    FROM scored)
       |  WHERE rn = 1),
       |qres AS (
       |  SELECT p.query_id, p.cell,
       |    list_transform(generate_series(1, len(p.qv)), i -> p.qv[i] - t.cv[i]) AS rq
       |  FROM probes p JOIN cent t ON p.cell = t.cid),
       |qsubs AS (
       |  SELECT query_id, cell, m.m AS m,
       |    list_slice(rq, m.m * $PqSubDim + 1, m.m * $PqSubDim + $PqSubDim) AS qsub
       |  FROM qres, LATERAL (SELECT unnest(generate_series(0, ${PqSubspaces - 1})) AS m) m),
       |qsubs2 AS (
       |  SELECT query_id, cell, m, qsub, ${dotSql("qsub", "qsub")} AS qn2s FROM qsubs),
       |qdist AS (
       |  SELECT s.query_id, s.cell, s.m, c.code,
       |    s.qn2s - 2.0 * ${dotSql("s.qsub", "c.csub")} + c.cn2s AS qd
       |  FROM qsubs2 s JOIN cb c ON s.m = c.m),
       |cand AS (
       |  SELECT p.query_id, p.cell, c.vec_id
       |  FROM cells c JOIN probes p ON c.cell = p.cell
       |  WHERE c.vec_id <> p.query_id$candExclude),
       |adc AS (
       |  SELECT cand.query_id, cand.vec_id,
       |    round(CAST(SUM(CAST(q.qd AS DECIMAL(27,12))) AS DOUBLE), 6) AS approx_dist2
       |  FROM cand
       |  JOIN chosen ch ON cand.vec_id = ch.vec_id
       |  JOIN qdist q ON q.query_id = cand.query_id AND q.cell = cand.cell
       |    AND q.m = ch.m AND q.code = ch.code
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_dist2, vec_id) AS INT) AS rank
       |  FROM adc)
       |SELECT query_id, vec_id AS neighbor_id, approx_dist2, rank
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin
  }

  // ------------------------------------------------------------ #30c recall

  /** ANN quality evaluation: recall@k of the LSH and IVF indexes
    * against the exact brute-force ground truth — the measurement loop
    * that tunes planes/probes before an index ships. Per query: how
    * many of the true top-k each index surfaced.
    *
    * Scale: the ground-truth side is queries×k rows (tiny by
    * construction — recall is always evaluated on a query SAMPLE, not
    * the corpus); joins are on (query_id, neighbor_id); each index
    * pipeline keeps its own documented scale shape. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    // the four index pipelines share ONE prepared (v, n2) frame — the
    // evaluation job reads the corpus once, not once per index
    // (localCheckpoint: four downstream consumers)
    val all = vecs(spark, dir).localCheckpoint()
    val bf = bruteForceFrom(all).select(col("query_id"), col("neighbor_id"))
    val lsh = lshFrom(all)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("lsh_hit"))
    val ivf = ivfFrom(all)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("ivf_hit"))
    val ivfpq = ivfPqFrom(all, residual = true)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("ivfpq_hit"))
    bf.join(lsh, Seq("query_id", "neighbor_id"), "left")
      .join(ivf, Seq("query_id", "neighbor_id"), "left")
      .join(ivfpq, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("lsh_hit"), lit(0L))).as("n_lsh_hits"),
        sum(coalesce(col("ivf_hit"), lit(0L))).as("n_ivf_hits"),
        sum(coalesce(col("ivfpq_hit"), lit(0L))).as("n_ivfpq_hits"))
      .withColumn("recall_lsh",
        round(col("n_lsh_hits").cast("double") / col("n_exact"), 6))
      .withColumn("recall_ivf",
        round(col("n_ivf_hits").cast("double") / col("n_exact"), 6))
      .withColumn("recall_ivfpq",
        round(col("n_ivfpq_hits").cast("double") / col("n_exact"), 6))
      .orderBy(col("query_id"))
  }

  val annRecallSql: String =
    s"""WITH bf AS ($annBruteForceSql),
       |lshq AS ($annLshBucketedSql),
       |ivfq AS ($annIvfSql),
       |ivfpqq AS ($annIvfPqSql)
       |SELECT bf.query_id, COUNT(*) AS n_exact,
       |  CAST(SUM(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_lsh_hits,
       |  CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_ivf_hits,
       |  CAST(SUM(CASE WHEN pq.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_ivfpq_hits,
       |  round(CAST(SUM(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS recall_lsh,
       |  round(CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS recall_ivf,
       |  round(CAST(SUM(CASE WHEN pq.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS recall_ivfpq
       |FROM bf
       |LEFT JOIN lshq l ON bf.query_id = l.query_id AND bf.neighbor_id = l.neighbor_id
       |LEFT JOIN ivfq i ON bf.query_id = i.query_id AND bf.neighbor_id = i.neighbor_id
       |LEFT JOIN ivfpqq pq ON bf.query_id = pq.query_id AND bf.neighbor_id = pq.neighbor_id
       |GROUP BY bf.query_id
       |ORDER BY bf.query_id""".stripMargin

  // ------------------------------------------------------------ #28x kNN graph

  /** Neighbors per vector in the kNN graph. */
  val KnnK = 5

  /** Top-[[KnnK]] edge list per vector, candidates restricted to the
    * vector's own hyperplane bucket ([[bucketCol]]) — the ALL-vectors
    * generalization of [[annLshBucketed]]'s query-sample search. The
    * self equi-join on `bucket` shuffles BOTH sides on the bucket key
    * (no broadcast — both sides are the corpus), so work is
    * Σ occupancy² per bucket, n²/2^planes in expectation, and the
    * rank window partitions on vec_id over bucket-sized candidate
    * lists. At 100 TB: more planes + multi-probe, same two-exchange
    * shape. localCheckpoint: both graph consumers (the mutual flag
    * and the components fixpoint) probe the edge relation twice. */
  private def knnEdges(prepared: DataFrame): DataFrame = {
    val b = prepared.withColumn("bucket", bucketCol(col("v")))
    val nb = b.select(col("vec_id").as("neighbor_id"), col("v").as("nv"),
      col("n2").as("nn2"), col("bucket"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    b.select(col("vec_id"), col("v"), col("n2"), col("bucket"))
      .join(nb, Seq("bucket"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", cosine(dot(col("v"), col("nv")), col("n2"), col("nn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= KnnK)
      .select(col("vec_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
      .localCheckpoint()
  }

  /** SEMANTIC NEIGHBORHOOD GRAPH over the whole embedding table —
    * every vector's [[KnnK]] nearest bucketed neighbors plus a
    * `mutual` flag (the neighbor lists each other back): the standard
    * substrate for semantic clustering, label propagation, and
    * graph-based dedup. Mutuality is a self-join of the (n·k)-row
    * edge list on the reversed key — edge-relation-sized work,
    * independent of corpus width. */
  def embKnnGraph(spark: SparkSession, dir: String): DataFrame = {
    val edges = knnEdges(vecs(spark, dir))
    val rev = edges.select(col("neighbor_id").as("vec_id"),
      col("vec_id").as("neighbor_id"), lit(1).as("rev_hit"))
    edges.join(rev, Seq("vec_id", "neighbor_id"), "left")
      .select(col("vec_id"), col("neighbor_id"), col("cos_sim"), col("rank"),
        col("rev_hit").isNotNull.as("mutual"))
      .orderBy(col("vec_id"), col("rank"))
  }

  val embKnnGraphSql: String =
    s"""$vecsCteSql,
       |b AS (SELECT vec_id, v, n2, ${bucketSql("v")} AS bucket FROM vecs),
       |scored AS (
       |  SELECT q.vec_id, c.vec_id AS neighbor_id, $cosSql AS cos_sim
       |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM scored),
       |edges AS (SELECT vec_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= $KnnK)
       |SELECT e1.vec_id, e1.neighbor_id, e1.cos_sim, e1.rank,
       |  (e2.vec_id IS NOT NULL) AS mutual
       |FROM edges e1
       |LEFT JOIN edges e2 ON e1.neighbor_id = e2.vec_id AND e1.vec_id = e2.neighbor_id
       |ORDER BY e1.vec_id, e1.rank""".stripMargin

  /** SEMANTIC COMPONENTS: connected components over the MUTUAL kNN
    * edges — mutual-kNN clustering, the conservative graph-clustering
    * variant (one-directional edges chain unrelated neighborhoods
    * through hub vectors; mutual edges don't). Reuses the dedup
    * min-label/pointer-jump fixpoint ([[Dedup.componentsFromPairs]])
    * over the (≤ n·k/2)-row mutual pair relation — iterations touch
    * the edge relation only, never the vectors. */
  def embKnnComponents(spark: SparkSession, dir: String): DataFrame = {
    val edges = knnEdges(vecs(spark, dir))
    val mutual = edges.as("e1")
      .join(edges.select(col("neighbor_id").as("a2"), col("vec_id").as("b2")).as("e2"),
        col("e1.vec_id") === col("a2") && col("e1.neighbor_id") === col("b2"))
      .filter(col("e1.vec_id") < col("e1.neighbor_id"))
      .select(col("e1.vec_id").as("doc_id_1"), col("e1.neighbor_id").as("doc_id_2"))
    Dedup.componentsFromPairs(mutual)
      .select(col("doc_id").as("vec_id"), col("cluster_id").as("component_id"),
        col("is_canonical"))
      .orderBy(col("vec_id"))
  }

  val embKnnComponentsSql: String =
    s"""WITH RECURSIVE e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |vecs AS (
       |  SELECT vec_id, v,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(v, x -> x * x)), (acc, x) -> acc + x) AS n2
       |  FROM e),
       |b AS (SELECT vec_id, v, n2, ${bucketSql("v")} AS bucket FROM vecs),
       |scored AS (
       |  SELECT q.vec_id, c.vec_id AS neighbor_id, $cosSql AS cos_sim
       |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM scored),
       |edges AS (SELECT vec_id, neighbor_id FROM ranked WHERE rank <= $KnnK),
       |mut AS (
       |  SELECT e1.vec_id AS a, e1.neighbor_id AS b
       |  FROM edges e1 JOIN edges e2 ON e1.neighbor_id = e2.vec_id AND e1.vec_id = e2.neighbor_id),
       |verts AS (SELECT DISTINCT a AS doc FROM mut),
       |reach AS (
       |  SELECT doc, doc AS r FROM verts
       |  UNION
       |  SELECT m.b AS doc, reach.r FROM reach JOIN mut m ON m.a = reach.doc)
       |SELECT doc AS vec_id, MIN(r) AS component_id, (doc = MIN(r)) AS is_canonical
       |FROM reach GROUP BY doc ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------------ #28z3 label propagation

  /** Vectors with vec_id below this are the LABELED seed set. */
  val SeedCount = 100

  /** Semi-supervised LABEL PROPAGATION over the kNN graph — the
    * standard scale-up move when labels are scarce (annotate a seed
    * set, spread by semantic neighborhood): every unlabeled vector
    * takes the cosine-weighted majority label of the SEED vectors
    * among its [[KnnK]] bucketed neighbors ([[knnEdges]] — same graph
    * as emb_knn_graph). Vote weights sum through DECIMAL so the
    * majority is order-independent and hash-exact; ties break to the
    * lower label. Emits the prediction, its support (neighbor count +
    * weight), and agreement with the held-out true label — the
    * accuracy-evaluation twin (ann_recall / emb_cluster_purity
    * family).
    *
    * Scale: the vote is one groupBy over the (≤ n·k)-row edge⋈seed
    * join; the seed relation is label metadata (id, label), never
    * vectors — propagation cost is edge-relation-sized, independent
    * of corpus width. Multi-round propagation = re-run with the
    * previous round's predictions as seeds (same plan). */
  def embLabelProp(spark: SparkSession, dir: String): DataFrame = {
    val labels = Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("label").cast("int").as("label"))
    labelPropFrom(labels, vecs(spark, dir))
  }

  /** Frame-level core: `labels` = (vec_id, label int), `prepared` =
    * (vec_id, v, n2). */
  private[pipeline] def labelPropFrom(labels: DataFrame, prepared: DataFrame): DataFrame = {
    val edges = knnEdges(prepared)
    val seeds = labels.filter(col("vec_id") < SeedCount)
      .select(col("vec_id").as("neighbor_id"), col("label").as("seed_label"))
    val votes = edges.filter(col("vec_id") >= SeedCount)
      .join(seeds, Seq("neighbor_id"))
      .groupBy(col("vec_id"), col("seed_label"))
      .agg(count(lit(1)).as("n_votes"),
        sum(col("cos_sim").cast("decimal(27,12)")).as("w"))
    votes.groupBy(col("vec_id"))
      .agg(max(struct(col("w"), (-col("seed_label")).as("nl"))).as("best"),
        sum(col("n_votes")).as("n_seed_neighbors"))
      .join(labels, Seq("vec_id"))
      .select(col("vec_id"),
        (-col("best.nl")).cast("int").as("predicted_label"),
        col("n_seed_neighbors"),
        round(col("best.w").cast("double"), 6).as("vote_weight"),
        ((-col("best.nl")) === col("label")).as("agrees_truth"))
      .orderBy(col("vec_id"))
  }

  val embLabelPropSql: String =
    s"""$vecsCteSql,
       |b AS (SELECT vec_id, v, n2, ${bucketSql("v")} AS bucket FROM vecs),
       |scored AS (
       |  SELECT q.vec_id, c.vec_id AS neighbor_id, $cosSql AS cos_sim
       |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM scored),
       |edges AS (SELECT vec_id, neighbor_id, cos_sim FROM ranked WHERE rank <= $KnnK),
       |labels AS (SELECT vec_id, CAST(label AS INT) AS label FROM embeddings),
       |votes AS (
       |  SELECT e.vec_id, l.label AS seed_label, COUNT(*) AS n_votes,
       |    SUM(CAST(e.cos_sim AS DECIMAL(27,12))) AS w
       |  FROM edges e JOIN labels l ON e.neighbor_id = l.vec_id AND l.vec_id < $SeedCount
       |  WHERE e.vec_id >= $SeedCount GROUP BY 1, 2),
       |best AS (
       |  SELECT vec_id, seed_label, w,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY w DESC, seed_label) AS rn,
       |    SUM(n_votes) OVER (PARTITION BY vec_id) AS n_seed_neighbors
       |  FROM votes)
       |SELECT b.vec_id, CAST(b.seed_label AS INT) AS predicted_label,
       |  CAST(b.n_seed_neighbors AS BIGINT) AS n_seed_neighbors,
       |  round(CAST(b.w AS DOUBLE), 6) AS vote_weight,
       |  (b.seed_label = l2.label) AS agrees_truth
       |FROM best b JOIN labels l2 USING (vec_id)
       |WHERE b.rn = 1 ORDER BY b.vec_id""".stripMargin

  // ------------------------------------------------------------ #30i probe sweep

  /** Probe counts [[annProbeSweep]] evaluates (≤ the max rank kept). */
  val ProbeSweep = Seq(1, 2, 4)

  /** IVF PROBE-COUNT TUNING CURVE — recall@k vs numProbes (the
    * band_sweep/quantize_sweep pattern applied to the IVF search
    * knob): candidates are generated ONCE with each probed cell's
    * rank (crn ≤ max sweep), then every sweep setting re-ranks the
    * SAME candidate relation filtered to crn ≤ p — one corpus scan,
    * one candidate join, |sweep| re-rankings of an already-tiny
    * frame. Answers "how many probes does this corpus need for the
    * recall target" before fixing NumProbes in production. */
  def annProbeSweep(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir).localCheckpoint() // feeds cells, probes, ground truth
    val cent = all.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("n2").as("cn2"))
    val scored = all.join(broadcast(cent), lit(true))
      .withColumn("c_cos", cosine(dot(col("v"), col("cv")), col("n2"), col("cn2")))
    val cells = scored
      .groupBy(col("vec_id"))
      .agg(first(col("v")).as("v"), first(col("n2")).as("n2"),
        max(struct(col("c_cos"), (-col("cid")).as("ncid"))).as("best"))
      .select(col("vec_id"), col("v"), col("n2"), (-col("best.ncid")).as("cell"))
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("c_cos").desc, col("cid"))
    val maxP = ProbeSweep.max
    val probes = scored.filter(col("vec_id") < NumQueries)
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") <= maxP)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n2").as("qn2"),
        col("cid").as("cell"), col("crn"))
    val cand = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(dot(col("qv"), col("v")), col("qn2"), col("n2")))
      .select(col("query_id"), col("vec_id"), col("crn"), col("cos_sim"))
    val pdim = { import spark.implicits._; ProbeSweep.toDF("probes") }
    val wR = Window.partitionBy(col("probes"), col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val hits = cand.crossJoin(broadcast(pdim))
      .filter(col("crn") <= col("probes"))
      .withColumn("rank", row_number().over(wR))
      .filter(col("rank") <= TopK)
      .select(col("probes"), col("query_id"), col("vec_id").as("neighbor_id"),
        lit(1L).as("hit"))
    val bf = bruteForceFrom(all).select(col("query_id"), col("neighbor_id"))
    // hits is ≤ |sweep|·Q·k rows of evaluation metadata — broadcast
    bf.crossJoin(broadcast(pdim))
      .join(broadcast(hits), Seq("probes", "query_id", "neighbor_id"), "left")
      .groupBy(col("probes"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall", round(col("n_hits").cast("double") / col("n_exact"), 6))
      .orderBy(col("probes"))
  }

  val annProbeSweepSql: String = {
    val dotAC =
      """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(generate_series(1, len(a.v)), i -> a.v[i] * c.cv[i])), (acc, x) -> acc + x)""".stripMargin
    val dotQV =
      """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(generate_series(1, len(p.qv)), i -> p.qv[i] * c.v[i])), (acc, x) -> acc + x)""".stripMargin
    val pvals = ProbeSweep.map(p => s"($p)").mkString(", ")
    s"""$vecsCteSql,
       |cent AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM vecs WHERE vec_id < $NumCentroids),
       |cscored AS (
       |  SELECT a.vec_id, a.v, a.n2, c.cid,
       |    round($dotAC / (sqrt(a.n2) * sqrt(c.cn2)), 6) AS c_cos
       |  FROM vecs a CROSS JOIN cent c),
       |cellr AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, cid) AS rn
       |  FROM cscored),
       |cells AS (SELECT vec_id, v, n2, cid AS cell FROM cellr WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, v AS qv, n2 AS qn2, cid AS cell, rn AS crn
       |  FROM cellr WHERE vec_id < $NumQueries AND rn <= ${ProbeSweep.max}),
       |cand AS (
       |  SELECT p.query_id, c.vec_id, p.crn,
       |    round($dotQV / (sqrt(p.qn2) * sqrt(c.n2)), 6) AS cos_sim
       |  FROM cells c JOIN probes p ON c.cell = p.cell AND c.vec_id <> p.query_id),
       |pr(probes) AS (VALUES $pvals),
       |rankedp AS (
       |  SELECT pr.probes, cand.query_id, cand.vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY pr.probes, cand.query_id
       |      ORDER BY cand.cos_sim DESC, cand.vec_id) AS rank
       |  FROM cand CROSS JOIN pr WHERE cand.crn <= pr.probes),
       |hits AS (SELECT probes, query_id, vec_id AS neighbor_id FROM rankedp WHERE rank <= $TopK),
       |bf AS ($annBruteForceSql)
       |SELECT pr.probes, COUNT(*) AS n_exact,
       |  CAST(SUM(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |  round(CAST(SUM(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS recall
       |FROM bf CROSS JOIN pr
       |LEFT JOIN hits h ON h.probes = pr.probes AND h.query_id = bf.query_id
       |  AND h.neighbor_id = bf.neighbor_id
       |GROUP BY pr.probes ORDER BY pr.probes""".stripMargin
  }

  // ------------------------------------------------------------ #28y2 kNN PageRank

  val PageRankDamping = 0.85
  val PageRankBase = 0.15
  val PageRankIters = 2

  /** PAGERANK over the mutual-kNN graph — semantic CENTRALITY: which
    * documents sit at the core of their neighborhood structure vs the
    * periphery (the prototypicality signal for curriculum ordering
    * and coreset picks; SemDeDup keeps cluster cores for the same
    * reason). [[PageRankIters]] unrolled power-iteration rounds over
    * the DIRECTED view of the mutual edge relation (symmetric, so
    * every node has in-degree ≥ 1 — no dangling mass correction
    * needed): r' = 0.15/n + 0.85·Σ r_u/deg_u. Per-target
    * contributions sum through DECIMAL(38,18) (order-independent);
    * ranks re-round to 12 dp each iteration so both engines compose
    * identical doubles; damping constants are literals.
    *
    * Scale: each iteration is one edge-relation join + one
    * target-keyed aggregate — edge-sized work (≤ n·k rows), never
    * vector-width; the standard distributed-PageRank plan. */
  def embKnnPagerank(spark: SparkSession, dir: String): DataFrame = {
    val edges = knnEdges(vecs(spark, dir))
    // directed view of the mutual relation: both orientations
    val mut = edges.as("e1")
      .join(edges.select(col("neighbor_id").as("a2"), col("vec_id").as("b2")).as("e2"),
        col("e1.vec_id") === col("a2") && col("e1.neighbor_id") === col("b2"))
      .select(col("e1.vec_id").as("src"), col("e1.neighbor_id").as("dst"))
      .localCheckpoint()
    val deg = mut.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = mut.select(col("src").as("v")).distinct()
    val nn = nodes.agg(count(lit(1)).as("n"))
    var r = nodes.crossJoin(broadcast(nn))
      .select(col("v"), col("n"), round(lit(1.0) / col("n"), 12).as("r"))
      .localCheckpoint()
    for (_ <- 1 to PageRankIters) {
      r = mut.join(r.select(col("v").as("src"), col("r")), Seq("src"))
        .join(deg, Seq("src"))
        .groupBy(col("dst"))
        .agg(sum((col("r") / col("deg")).cast("decimal(38,18)")).as("s"))
        .crossJoin(broadcast(nn))
        .select(col("dst").as("v"), col("n"),
          round(lit(PageRankBase) / col("n") +
            lit(PageRankDamping) * col("s").cast("double"), 12).as("r"))
        .localCheckpoint()
    }
    r.join(deg.select(col("src").as("v"), col("deg")), Seq("v"))
      .select(col("v").as("vec_id"), col("deg").as("degree"),
        round(col("r"), 6).as("pagerank"))
      .orderBy(col("vec_id"))
  }

  val embKnnPagerankSql: String = {
    val iters = (1 to PageRankIters).map { i =>
      s""",
         |c$i AS (
         |  SELECT m.dst AS v, SUM(CAST(r${i - 1}.r / deg.deg AS DECIMAL(38,18))) AS s
         |  FROM mut m JOIN r${i - 1} ON m.src = r${i - 1}.v JOIN deg ON m.src = deg.src
         |  GROUP BY 1),
         |r$i AS (
         |  SELECT c$i.v, round(CAST($PageRankBase AS DOUBLE) / nn.n
         |    + CAST($PageRankDamping AS DOUBLE) * CAST(s AS DOUBLE), 12) AS r
         |  FROM c$i CROSS JOIN nn)""".stripMargin
    }.mkString("")
    s"""$vecsCteSql,
       |b AS (SELECT vec_id, v, n2, ${bucketSql("v")} AS bucket FROM vecs),
       |scored AS (
       |  SELECT q.vec_id, c.vec_id AS neighbor_id, $cosSql AS cos_sim
       |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM scored),
       |edges AS (SELECT vec_id, neighbor_id FROM ranked WHERE rank <= $KnnK),
       |mut AS (
       |  SELECT e1.vec_id AS src, e1.neighbor_id AS dst
       |  FROM edges e1 JOIN edges e2 ON e1.neighbor_id = e2.vec_id AND e1.vec_id = e2.neighbor_id),
       |deg AS (SELECT src, COUNT(*) AS deg FROM mut GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS v FROM mut),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |r0 AS (
       |  SELECT v, round(CAST(1.0 AS DOUBLE) / nn.n, 12) AS r
       |  FROM nodes CROSS JOIN nn)$iters
       |SELECT r$PageRankIters.v AS vec_id, CAST(deg.deg AS BIGINT) AS degree,
       |  round(r$PageRankIters.r, 6) AS pagerank
       |FROM r$PageRankIters JOIN deg ON r$PageRankIters.v = deg.src
       |ORDER BY vec_id""".stripMargin
  }

  // ------------------------------------------------------------ #28z4 MMR selection

  val MmrK = 6
  /** Relevance weight λ; diversity weight is 1−λ, spelled 0.3 in both
    * engines as a LITERAL (never computed as 1−0.7, whose IEEE value
    * is 0.30000000000000004 — a silent cross-engine skew if one side
    * computes and the other writes the literal). */
  val MmrLambda = 0.7
  val MmrGamma = 0.3

  /** MAXIMAL MARGINAL RELEVANCE selection (Carbonell & Goldstein 1998)
    * — the retrieval-diversity primitive: greedily pick [[MmrK]] docs
    * maximizing λ·sim(q,d) − (1−λ)·max_{s∈picked} sim(d,s), so each
    * pick trades query relevance against redundancy with what's
    * already picked (pure top-k returns k near-copies of the best hit
    * on a deduplicated-corpus query; MMR is the standard fix for RAG
    * context packing and eval-set selection). Query = vec 0;
    * deterministic greedy, so it oracle-checks exactly
    * (the [[graft.pipeline.Corpus.embSeedFarthest]] unroll pattern:
    * [[MmrK]] rounds of broadcast-1-row fold + TakeOrdered top-1).
    *
    * State per candidate is (rel, ms): relevance to the query and the
    * running max similarity to picked docs — both folded map-only
    * against the broadcast pick; the corpus never shuffles (each
    * round is one TakeOrdered reduction + one map). ms starts at −1
    * (cosine's floor), making round 1 pure relevance; picked docs
    * leave the candidate frame. */
  def embMmrSelect(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir).localCheckpoint() // re-read per unrolled round
    val q = all.filter(col("vec_id") === 0)
    var st = all.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q.select(col("v").as("qv"), col("n2").as("qn2"))))
      .select(col("vec_id"), col("v"), col("n2"),
        (dot(col("v"), col("qv")) / (sqrt(col("n2")) * sqrt(col("qn2")))).as("rel"))
      .withColumn("ms", lit(-1.0d))
      .localCheckpoint()
    val picks = Seq.newBuilder[DataFrame]
    for (k <- 1 to MmrK) {
      val scored = st.withColumn("score",
        lit(MmrLambda) * col("rel") - lit(MmrGamma) * col("ms"))
      val pick = scored.orderBy(col("score").desc, col("vec_id")).limit(1).localCheckpoint()
      picks += pick.select(lit(k).as("pick_idx"), col("vec_id"),
        round(col("rel"), 6).as("relevance"), round(col("score"), 6).as("mmr_score"))
      if (k < MmrK)
        st = st.crossJoin(broadcast(pick.select(col("vec_id").as("s_vid"),
            col("v").as("sv"), col("n2").as("sn2"))))
          .filter(col("vec_id") =!= col("s_vid"))
          .select(col("vec_id"), col("v"), col("n2"), col("rel"),
            greatest(col("ms"),
              dot(col("v"), col("sv")) / (sqrt(col("n2")) * sqrt(col("sn2")))).as("ms"))
          .localCheckpoint()
    }
    picks.result().reduce(_ unionByName _).orderBy(col("pick_idx"))
  }

  val embMmrSelectSql: String = {
    def cosRaw(a: String, b: String, an2: String, bn2: String): String =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(generate_series(1, len($a)), i -> ($a)[i] * ($b)[i])), (acc, x) -> acc + x)
         |    / (sqrt($an2) * sqrt($bn2))""".stripMargin
    val rounds = (2 to MmrK).map { k =>
      s""",
         |st$k AS (
         |  SELECT a.vec_id, a.v, a.n2, a.rel,
         |    greatest(a.ms, ${cosRaw("a.v", "s.v", "a.n2", "s.n2")}) AS ms
         |  FROM st${k - 1} a CROSS JOIN p${k - 1} s WHERE a.vec_id <> s.vec_id),
         |p$k AS (
         |  SELECT *, CAST($MmrLambda AS DOUBLE) * rel - CAST($MmrGamma AS DOUBLE) * ms AS score
         |  FROM st$k ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString("")
    val selects = (1 to MmrK)
      .map(k => s"SELECT $k AS pick_idx, vec_id, round(rel, 6) AS relevance, round(score, 6) AS mmr_score FROM p$k")
      .mkString("\nUNION ALL ")
    s"""$vecsCteSql,
       |st1 AS (
       |  SELECT a.vec_id, a.v, a.n2,
       |    ${cosRaw("a.v", "q.v", "a.n2", "q.n2")} AS rel,
       |    CAST(-1.0 AS DOUBLE) AS ms
       |  FROM vecs a CROSS JOIN (SELECT v, n2 FROM vecs WHERE vec_id = 0) q
       |  WHERE a.vec_id <> 0),
       |p1 AS (
       |  SELECT *, CAST($MmrLambda AS DOUBLE) * rel - CAST($MmrGamma AS DOUBLE) * ms AS score
       |  FROM st1 ORDER BY score DESC, vec_id LIMIT 1)$rounds
       |SELECT * FROM (
       |$selects)
       |ORDER BY pick_idx""".stripMargin
  }

  // ------------------------------------------------------------ #30h range search

  /** Cosine radius for range search: return EVERY neighbor with
    * cos ≥ RangeTau, not a fixed top-k. */
  val RangeTau = 0.25

  /** Range (radius) search: all corpus vectors within cosine ≥
    * [[RangeTau]] of each query vector — the retrieval op behind
    * "fetch every sufficiently-similar document", where top-k is the
    * wrong contract because result cardinality is data-dependent.
    *
    * EXACT results through approximate infrastructure: vectors live in
    * IVF cells (same deterministic coarse centroids as [[annIvf]]),
    * each cell publishes its angular radius (max geodesic distance of
    * a member to the centroid), and a (query, cell) probe pair is kept
    * only when the spherical triangle inequality says the cell COULD
    * hold a match: angle(q,c) − radius(c) ≤ acos(τ). Every surviving
    * candidate is exactly re-scored, so pruning is lossless for any
    * centroid placement — the same bound family as
    * `dedup_embed_cosine`'s cell pairs (Dedup.scala), applied
    * query-side.
    *
    * Scale shape: assignment is the map-side-combining argmax over the
    * broadcast K-expansion (exchange carries n rows); radii are one
    * K-row aggregate; the probe relation is ≤ Q·K rows (broadcast);
    * the candidate join shuffles on `cell` so per-query work scales
    * with the occupancy of geometrically-reachable cells, not n. At
    * 100 TB: trained centroids with larger K (cells shrink, radii
    * tighten, pruning sharpens) — identical plan. */
  def annRangeSearch(spark: SparkSession, dir: String): DataFrame =
    rangeFrom(vecs(spark, dir))

  private[pipeline] def rangeFrom(all: DataFrame): DataFrame = {
    val (probes, assigned) = rangeProbes(all)
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(dot(col("qv"), col("v")), col("qn2"), col("n2")))
      .filter(col("cos_sim") >= RangeTau)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim"))
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  /** (surviving (query, cell) probes, cell-assigned corpus). Exposed
    * so RangeSearchSpec can assert the bound actually prunes. `tau` is
    * the LOW cosine edge the pruning must stay lossless for
    * ([[RangeTau]] for range search, [[HardNegTauLow]] for hard-
    * negative mining). When the input carries a `label` column it is
    * threaded through — onto the corpus side as `label`, onto the
    * probe side as `anchor_label` — so label-aware consumers never
    * re-scan the source for it. */
  private[pipeline] def rangeProbes(all: DataFrame, tau: Double = RangeTau)
      : (DataFrame, DataFrame) = {
    val hasLabel = all.columns.contains("label")
    def labelled(c: Seq[Column], l: Seq[Column]): Seq[Column] =
      if (hasLabel) c ++ l else c
    def angle(cos: Column): Column = acos(least(greatest(cos, lit(-1.0)), lit(1.0)))
    val cent = all.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("n2").as("cn2"))
    // unrounded cosine: the bound is geometric, presentation rounding
    // happens only on the final re-score
    val scored = all.join(broadcast(cent), lit(true))
      .withColumn("c_cos", dot(col("v"), col("cv")) / (sqrt(col("n2")) * sqrt(col("cn2"))))
    val assigned = scored
      .groupBy(col("vec_id"))
      .agg(first(col("v")).as("v"),
        labelled(Seq(first(col("n2")).as("n2"),
          max(struct(col("c_cos"), (-col("cid")).as("ncid"))).as("best")),
          Seq(first(col("label")).as("label"))): _*)
      .select(labelled(Seq(col("vec_id"), col("v"), col("n2"),
        (-col("best.ncid")).as("cell"), angle(col("best.c_cos")).as("theta")),
        Seq(col("label"))): _*)
    val radii = assigned.groupBy(col("cell")).agg(max(col("theta")).as("radius"))
    // The kept-pair predicate compares the 6-dp HALF_UP-rounded cosine
    // to τ, which admits TRUE cosines down to τ − 5e-7 — so the
    // geometric bound must be taken at the low edge of the rounding
    // band, not at τ itself, or a boundary pair in a tight cell could
    // be pruned here while the re-score (and the oracle) keeps it.
    val thetaTau = math.acos(tau - 5e-7)
    val probes = scored.filter(col("vec_id") < NumQueries)
      .select(labelled(Seq(col("vec_id").as("query_id"), col("v").as("qv"),
        col("n2").as("qn2"), col("cid").as("cell"), angle(col("c_cos")).as("qtheta")),
        Seq(col("label").as("anchor_label"))): _*)
      // radii is K-bounded cell metadata (≤ NumCentroids rows) — the
      // sanctioned broadcast class; unhinted this planned an SMJ with
      // two sort exchanges on a K-row side
      .join(broadcast(radii), Seq("cell"))
      .filter(col("qtheta") - col("radius") <= lit(thetaTau) + lit(1e-9))
      .select(labelled(Seq(col("query_id"), col("qv"), col("qn2"), col("cell")),
        Seq(col("anchor_label"))): _*)
    (probes, assigned.select(labelled(Seq(col("vec_id"), col("v"), col("n2"),
      col("cell")), Seq(col("label"))): _*))
  }

  val annRangeSearchSql: String =
    s"""$vecsCteSql,
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $cosSql AS cos_sim
       |  FROM vecs q JOIN vecs c ON q.vec_id < $NumQueries AND c.vec_id <> q.vec_id)
       |SELECT query_id, neighbor_id, cos_sim
       |FROM scored WHERE cos_sim >= $RangeTau
       |ORDER BY query_id, neighbor_id""".stripMargin

  // ------------------------------------------------------------ #30k hard-negative mining

  /** Similarity band for hard negatives: near (≥ low) but NOT a
    * near-duplicate (< high). Contrastive-training convention: too
    * similar risks false negatives (the "duplicate zone"), too far is
    * uninformative. */
  val HardNegTauLow = 0.15
  val HardNegTauHigh = 0.35

  /** Hard negatives per anchor. */
  val HardNegK = 5

  /** Hard-negative mining for retrieval/embedding training — per
    * anchor vector, the top-[[HardNegK]] DIFFERENT-label neighbors
    * inside the similarity band [[HardNegTauLow]] ≤ cos <
    * [[HardNegTauHigh]]: near enough to be informative, not so near
    * they're probable unlabeled positives, never sharing the anchor's
    * label (those are positives by definition). The standard
    * contrastive-training feed (e.g. DPR / SimCSE hard-negative
    * construction).
    *
    * EXACT results through the IVF-cell triangle bound
    * ([[rangeProbes]], the ann_range_search machinery with the bound
    * taken at the BAND'S LOW EDGE): a (query, cell) probe survives
    * only if the cell could geometrically hold cos ≥ τ_low, every
    * surviving candidate is exactly re-scored, and the high edge +
    * label exclusion are exact post-filters — pruning stays lossless
    * for any centroid placement. Labels ride the cell-assignment
    * exchange (no second scan of the source).
    *
    * Scale shape: identical to range search — one n-row assignment
    * exchange, K-row radii broadcast, candidate join shuffled on
    * `cell` (per-anchor work = occupancy of geometrically-reachable
    * cells, never n), plus a query-keyed top-k window bounded by the
    * anchor count. */
  def embHardNegatives(spark: SparkSession, dir: String): DataFrame =
    hardNegativesFrom(
      Tables.spread(Tables.embeddings(spark, dir))
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("n2", graft.functions.VecDot.dot(col("v"), col("v"))))

  private[pipeline] def hardNegativesFrom(all: DataFrame): DataFrame = {
    val (probes, assigned) = rangeProbes(all, HardNegTauLow)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .filter(col("label") =!= col("anchor_label"))
      .withColumn("cos_sim", cosine(dot(col("qv"), col("v")), col("qn2"), col("n2")))
      .filter(col("cos_sim") >= HardNegTauLow && col("cos_sim") < HardNegTauHigh)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= HardNegK)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("anchor_label"), col("label").as("neighbor_label"), col("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ------------------------------------------------------------ #30l triplet construction

  /** Positive-side floor: a positive must be at least non-adversarial
    * (cos ≥ 0 — same label AND same hemisphere). */
  val TripletTauPos = 0.0
  /** Positives per anchor (each pairs with every hard negative). */
  val TripletP = 2

  /** TRAINING-TRIPLET construction — the (anchor, positive, hard
    * negative) feed contrastive losses consume: per anchor, the
    * top-[[TripletP]] SAME-label neighbors with cos ≥
    * [[TripletTauPos]] crossed with the anchor's [[embHardNegatives]]
    * set (different label, [[HardNegTauLow]] ≤ cos <
    * [[HardNegTauHigh]]), with the per-triplet margin
    * pos_cos − neg_cos the loss would see.
    *
    * ONE candidate pass feeds both sides: [[rangeProbes]] runs at the
    * LOOSER floor (τ_pos = 0) so its lossless bound covers the
    * negative band too (any cos ≥ τ_low ≥ τ_pos survives a τ_pos
    * prune), the scored candidate relation is localCheckpointed, and
    * positives/negatives are filters over it — the assignment
    * exchange and the cell join run once, not twice. The final
    * positives × negatives join is per-anchor P×K rows. */
  def embTriplets(spark: SparkSession, dir: String): DataFrame =
    tripletsFrom(
      Tables.spread(Tables.embeddings(spark, dir))
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("n2", graft.functions.VecDot.dot(col("v"), col("v"))))

  private[pipeline] def tripletsFrom(all: DataFrame): DataFrame = {
    val (probes, assigned) = rangeProbes(all, TripletTauPos)
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(dot(col("qv"), col("v")), col("qn2"), col("n2")))
      .select(col("query_id"), col("anchor_label"), col("vec_id"), col("label"),
        col("cos_sim"))
      .localCheckpoint()
    val wp = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    val pos = cand
      .filter(col("label") === col("anchor_label") && col("cos_sim") >= TripletTauPos)
      .withColumn("pos_rank", row_number().over(wp))
      .filter(col("pos_rank") <= TripletP)
      .select(col("query_id"), col("anchor_label"), col("pos_rank"),
        col("vec_id").as("pos_id"), col("cos_sim").as("pos_cos"))
    val neg = cand
      .filter(col("label") =!= col("anchor_label"))
      .filter(col("cos_sim") >= HardNegTauLow && col("cos_sim") < HardNegTauHigh)
      .withColumn("neg_rank", row_number().over(wp))
      .filter(col("neg_rank") <= HardNegK)
      .select(col("query_id"), col("neg_rank"), col("vec_id").as("neg_id"),
        col("cos_sim").as("neg_cos"))
    pos.join(neg, Seq("query_id"))
      .select(col("query_id"), col("anchor_label"), col("pos_rank"), col("neg_rank"),
        col("pos_id"), col("neg_id"), col("pos_cos"), col("neg_cos"),
        round(col("pos_cos") - col("neg_cos"), 6).as("margin"))
      .orderBy(col("query_id"), col("pos_rank"), col("neg_rank"))
  }

  val embTripletsSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |vecs AS (
       |  SELECT vec_id, label, v,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(v, x -> x * x)), (acc, x) -> acc + x) AS n2
       |  FROM e),
       |scored AS (
       |  SELECT q.vec_id AS query_id, q.label AS anchor_label,
       |    c.vec_id AS vid, c.label AS clabel, $cosSql AS cos_sim
       |  FROM vecs q JOIN vecs c ON q.vec_id < $NumQueries AND c.vec_id <> q.vec_id),
       |pos AS (
       |  SELECT query_id, anchor_label, vid AS pos_id, cos_sim AS pos_cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, vid) AS INT) AS pos_rank
       |  FROM scored WHERE clabel = anchor_label AND cos_sim >= $TripletTauPos),
       |neg AS (
       |  SELECT query_id, vid AS neg_id, cos_sim AS neg_cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, vid) AS INT) AS neg_rank
       |  FROM scored WHERE clabel <> anchor_label
       |    AND cos_sim >= $HardNegTauLow AND cos_sim < $HardNegTauHigh)
       |SELECT p.query_id, p.anchor_label, p.pos_rank, n.neg_rank,
       |  p.pos_id, n.neg_id, p.pos_cos, n.neg_cos,
       |  round(p.pos_cos - n.neg_cos, 6) AS margin
       |FROM pos p JOIN neg n ON p.query_id = n.query_id
       |WHERE p.pos_rank <= $TripletP AND n.neg_rank <= $HardNegK
       |ORDER BY p.query_id, p.pos_rank, n.neg_rank""".stripMargin

  // ------------------------------------------------------------ #30m filtered vector search

  /** The metadata predicate of the filtered search: neighbors must
    * carry this label. */
  val FilterLabel = 1

  /** FILTERED vector search — top-k under a metadata predicate
    * (label = [[FilterLabel]]), the filtered-vector-search contract
    * every production vector store ships (RAG with tenant/language/
    * source filters). Exact filter-then-search: the predicate reaches
    * the PARQUET SCAN (PushedFilters, spec-asserted), the surviving
    * corpus is exactly scored against the broadcast anchors, top-k
    * per anchor. This is the right plan whenever the filter is
    * selective — the scan prunes BEFORE any vector math; when the
    * filter is broad, the IVF variants compose the same way (the
    * predicate rides the cell-candidate relation, cells over-probed
    * to cover post-filter attrition). */
  def annFilteredTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.spread(Tables.embeddings(spark, dir))
    val prep = (d: DataFrame) => d
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n2", graft.functions.VecDot.dot(col("v"), col("v")))
    val q = prep(e).filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n2").as("qn2"))
    // predicate FIRST — it prunes at the scan, before any vector math
    val c = prep(e.filter(col("label") === FilterLabel))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(dot(col("qv"), col("v")), col("qn2"), col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("label"), col("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val annFilteredTopKSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |vecs AS (
       |  SELECT vec_id, label, v,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(v, x -> x * x)), (acc, x) -> acc + x) AS n2
       |  FROM e),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label, $cosSql AS cos_sim
       |  FROM vecs q JOIN vecs c
       |    ON q.vec_id < $NumQueries AND c.vec_id <> q.vec_id AND c.label = $FilterLabel),
       |ranked AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank FROM scored)
       |SELECT query_id, rank, neighbor_id, label, cos_sim
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  val embHardNegativesSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |vecs AS (
       |  SELECT vec_id, label, v,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(v, x -> x * x)), (acc, x) -> acc + x) AS n2
       |  FROM e),
       |scored AS (
       |  SELECT q.vec_id AS query_id, q.label AS anchor_label,
       |    c.vec_id AS neighbor_id, c.label AS neighbor_label, $cosSql AS cos_sim
       |  FROM vecs q JOIN vecs c
       |    ON q.vec_id < $NumQueries AND c.vec_id <> q.vec_id AND c.label <> q.label),
       |ranked AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM scored WHERE cos_sim >= $HardNegTauLow AND cos_sim < $HardNegTauHigh)
       |SELECT query_id, rank, neighbor_id, anchor_label, neighbor_label, cos_sim
       |FROM ranked WHERE rank <= $HardNegK
       |ORDER BY query_id, rank""".stripMargin
}
