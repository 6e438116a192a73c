package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY.md §2c #29-30).
  *
  * Both variants share one scoring expression (cosine via
  * `zip_with` + left-fold `aggregate` — codegen'd, no UDF). The
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
      .withColumn("n2", aggregate(col("v"), lit(0.0d), (acc, x) => acc + x * x))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  private def cosine(dotCol: Column, n2a: Column, n2b: Column): Column =
    round(dotCol / (sqrt(n2a) * sqrt(n2b)), 6)

  // ------------------------------------------------------------ #29 brute force

  /** Exact top-k cosine neighbors for each query vector. Cross join of
    * a tiny broadcast query side against the full table — one scan, a
    * per-partition top-k via window on the query id. */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir)
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
  private def bucketCol(v: Column): Column =
    (0 until NumPlanes).map { p =>
      val dotW = (0 until Dim).map(d => element_at(v, d + 1) * planeWeight(p, d)).reduce(_ + _)
      when(dotW >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def bucketSql(v: String): String =
    (0 until NumPlanes).map { p =>
      val dotW = (0 until Dim).map(d => s"($v)[${d + 1}] * ${planeWeight(p, d)}").mkString(" + ")
      s"(CASE WHEN $dotW >= 0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  /** LSH-bucketed ANN: queries only meet candidates in their own
    * hyperplane bucket — the equi-join shuffles on `bucket`, so work
    * scales with bucket occupancy (n/2^planes), not n². At 100 TB:
    * more planes + multi-probe, same plan shape. */
  def annLshBucketed(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir).withColumn("bucket", bucketCol(col("v")))
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
}
