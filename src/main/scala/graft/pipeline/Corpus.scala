package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-level operations a training-data pipeline runs besides
  * dedup/quality: deterministic split sampling, vocabulary statistics,
  * and per-class embedding centroids.
  *
  * Scale posture: sampling is a map-only projection + 3-group
  * aggregation; token stats are one explode + one token-keyed shuffle
  * with map-side combine; centroids are one (label, dim)-keyed shuffle
  * — all shapes that scale linearly with executors.
  */
object Corpus {

  // LCG mixing constants (same family as Similarity.planeWeight) —
  // explicit arithmetic so DuckDB reproduces the assignment bit-for-bit
  val SampleA = 1103515245L
  val SampleC = 12345L
  val TrainPct = 80
  val ValPct = 10 // test = remainder

  /** Deterministic train/val/test assignment — hash-bucket sampling on
    * the stable doc_id (NOT random: re-runs, backfills and incremental
    * appends must land every doc in the same split). The high bits of
    * an LCG mix decide the bucket; at 100 TB the same expression
    * shards any corpus with zero coordination. */
  def sample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = expr(s"((doc_id * $SampleA + $SampleC) div 65536) % 100")
    Tables.documents(spark, dir)
      .withColumn("split",
        when(bucket < TrainPct, "train")
          .when(bucket < TrainPct + ValPct, "val")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy(col("split"))
  }

  val sampleSql: String =
    s"""SELECT
       |  CASE WHEN ((doc_id * $SampleA + $SampleC) // 65536) % 100 < $TrainPct THEN 'train'
       |       WHEN ((doc_id * $SampleA + $SampleC) // 65536) % 100 < ${TrainPct + ValPct} THEN 'val'
       |       ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |  MIN(doc_id) AS min_doc_id,
       |  MAX(doc_id) AS max_doc_id
       |FROM documents
       |GROUP BY split ORDER BY split""".stripMargin

  /** Provenance monitoring: per (source, lang) corpus composition —
    * the mix dashboards a training-data pipeline watches per ingest.
    * One shuffle on a tiny key space; DECIMAL-exact char average. */
  def sourceStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        // exact integer sum, then one IEEE divide — identical in DuckDB
        // (decimal AVG scale rules differ between engines)
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 6).as("avg_chars"),
        min(col("doc_id")).as("min_doc_id"))
      .orderBy(col("source"), col("lang"))

  val sourceStatsSql: String =
    """SELECT source, lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
      |  MIN(doc_id) AS min_doc_id
      |FROM documents
      |GROUP BY source, lang
      |ORDER BY source, lang""".stripMargin

  val TopTokens = 25

  /** Corpus vocabulary statistics: the TopTokens most frequent tokens
    * with occurrence and document frequencies. One explode + one
    * token-keyed shuffle; occurrence counts combine map-side. Document
    * frequency is exact countDistinct here (the oracle requires it);
    * at 100 TB swap in approx_count_distinct — same plan shape minus
    * the distinct expand. */
  def topkTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), " "), t => length(t) > 0)).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(TopTokens)

  val topkTokensSql: String =
    s"""SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
       |FROM (
       |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) AS token
       |  FROM documents)
       |GROUP BY token
       |ORDER BY n_occurrences DESC, token
       |LIMIT $TopTokens""".stripMargin

  /** Per-label embedding centroids at (label, dimension) grain — the
    * M-step of distributed k-means / class-prototype computation.
    * posexplode fans each vector to its dimensions; one shuffle on
    * (label, dim); the DECIMAL sum makes the mean bit-stable under any
    * partitioning (double sums are not associative). */
  def embCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("label"), (col("pos") + 1).cast("int").as("dim"),
        col("x").cast("double").cast("decimal(27,12)").as("xd"))
      .groupBy(col("label"), col("dim"))
      .agg(round(sum(col("xd")).cast("double") / count(lit(1)), 6).as("centroid"),
        count(lit(1)).as("n_vecs"))
      .orderBy(col("label"), col("dim"))

  val embCentroidsSql: String =
    """SELECT label, CAST(i.i AS INT) AS dim,
      |  round(CAST(SUM(CAST(CAST(embedding[i.i] AS DOUBLE) AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 6) AS centroid,
      |  COUNT(*) AS n_vecs
      |FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) i
      |GROUP BY label, dim
      |ORDER BY label, dim""".stripMargin
}
