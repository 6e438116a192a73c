package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** THE CURATION FUNNEL — the end-to-end pipeline a training-data run
  * actually executes, as ONE oracle-gated entry: every stage is an
  * already-gated operator of this library, sequenced the way
  * production pipelines sequence them (the RefinedWeb/Gopher order:
  * identify language → rule battery → exact dedup → model-free
  * quality → token budget), with a LOUD per-stage funnel report —
  * docs and tokens surviving each stage — so nothing is silently
  * dropped between operators (the corpus_web_funnel posture applied
  * to the whole document pipeline).
  *
  * Stages over `documents`:
  *  1. `ingest`   — the raw corpus.
  *  2. `langid`   — keep docs the marker heuristic can identify
  *                  (predicted ≠ 'und'): unidentifiable text is noise
  *                  at training time.
  *  3. `gopher`   — the MassiveText battery at [[GopherMinRules]] of
  *                  7 rules (one notch below strict: the synthetic
  *                  corpus is short-doc, and a battery is TUNED to
  *                  its corpus — the strict verdict stays available
  *                  as text_gopher_rules).
  *  4. `dedup`    — exact normalized dedup, keep-first by doc_id
  *                  (AMONG the stage-3 survivors — dedup after the
  *                  cheap filters so the shuffle carries less).
  *  5. `quality`  — [[TextAnalysis.quality]] score ≥ [[QualityMin]].
  *  6. `budget`   — the token budget: survivors in doc_id order
  *                  while cumulative tokens stay within HALF the
  *                  surviving total (the corpus_select_budget
  *                  distributed prefix-sum, so no unpartitioned
  *                  window ever runs over doc-grain data).
  *
  * Scale: the verdict columns are three map-only passes joined at
  * doc grain; stages 2-5 are filters over one localCheckpointed
  * frame; the only shuffles are the dedup digest aggregate and the
  * budget range-repartition. The funnel output is 6 rows. */
object Curate {

  /** Minimum [[TextAnalysis.quality]] score to survive stage 5. */
  val QualityMin = 0.6
  /** Gopher rules (of 7) a doc must pass to survive stage 3. */
  val GopherMinRules = 6

  /** Budget stage keeps survivors while 2·cum_tokens ≤ total. */
  def corpusCurate(spark: SparkSession, dir: String): DataFrame = {
    val canon = regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")
    val li = TextAnalysis.langId(spark, dir).select(col("doc_id"), col("predicted_lang"))
    val g = TextAnalysis.gopherRules(spark, dir)
      .select(col("doc_id"), col("n_rules_passed"))
    val q = TextAnalysis.quality(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val base = TextAnalysis.docs(spark, dir)
      .select(col("doc_id"), md5(trim(canon)).as("digest"))
      .join(li, Seq("doc_id")).join(g, Seq("doc_id")).join(q, Seq("doc_id"))
      .localCheckpoint() // one verdict frame feeds every stage count
    val s2 = base.filter(col("predicted_lang") =!= "und")
    val s3 = s2.filter(col("n_rules_passed") >= GopherMinRules)
    val wDigest = Window.partitionBy(col("digest"))
    val s4 = s3.withColumn("keep", min(col("doc_id")).over(wDigest))
      .filter(col("doc_id") === col("keep"))
    val s5 = s4.filter(col("quality_score") >= QualityMin)
    // distributed prefix sum (the corpus_select_budget shape): range
    // partitions carry the global doc_id order, per-partition offsets
    // are a partition-count-grain window, in-partition cumsum is local
    val parts = spark.sessionState.conf.numShufflePartitions
    val ranged = s5.repartitionByRange(parts, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val total = ranged.agg(coalesce(sum(col("n_tokens")), lit(0L)).as("total"))
    val wOff = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("pid")).agg(sum(col("n_tokens")).as("part_tokens"))
      .withColumn("part_offset", coalesce(sum(col("part_tokens")).over(wOff), lit(0L)))
      .select(col("pid"), col("part_offset"))
    val wIn = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s6 = ranged.join(broadcast(offsets), Seq("pid"))
      .withColumn("cum_tokens", col("part_offset") + sum(col("n_tokens")).over(wIn))
      .join(broadcast(total), lit(true))
      .filter(col("cum_tokens") * 2 <= col("total"))
    val stages = Seq(
      "ingest" -> base, "langid" -> s2, "gopher" -> s3,
      "dedup" -> s4, "quality" -> s5, "budget" -> s6)
    stages.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("docs_out"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("tokens_out"))
        .select(lit(i + 1).as("stage_no"), lit(name).as("stage"),
          col("docs_out"), col("tokens_out"))
    }.reduce(_ unionByName _).orderBy(col("stage_no"))
  }

  val corpusCurateSql: String =
    s"""WITH li AS (
       |  SELECT doc_id, predicted_lang FROM (${TextAnalysis.langIdSql}) x),
       |g AS (
       |  SELECT doc_id, n_rules_passed FROM (${TextAnalysis.gopherRulesSql}) x),
       |q AS (
       |  SELECT doc_id, n_tokens, quality_score FROM (${TextAnalysis.qualitySql}) x),
       |base AS (
       |  SELECT d.doc_id, li.predicted_lang, g.n_rules_passed, q.n_tokens, q.quality_score,
       |    md5(trim(regexp_replace(regexp_replace(lower(d.text), '[^a-z0-9 ]', ' ', 'g'),
       |      ' +', ' ', 'g'))) AS digest
       |  FROM documents d
       |  JOIN li USING (doc_id) JOIN g USING (doc_id) JOIN q USING (doc_id)),
       |s2 AS (SELECT * FROM base WHERE predicted_lang <> 'und'),
       |s3 AS (SELECT * FROM s2 WHERE n_rules_passed >= $GopherMinRules),
       |s4 AS (
       |  SELECT * FROM (
       |    SELECT *, MIN(doc_id) OVER (PARTITION BY digest) AS keep FROM s3)
       |  WHERE doc_id = keep),
       |s5 AS (SELECT * FROM s4 WHERE quality_score >= $QualityMin),
       |s6 AS (
       |  SELECT * FROM (
       |    SELECT *,
       |      CAST(SUM(n_tokens) OVER (ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
       |      CAST(SUM(n_tokens) OVER () AS BIGINT) AS total
       |    FROM s5)
       |  WHERE cum_tokens * 2 <= total)
       |SELECT * FROM (
       |  SELECT 1 AS stage_no, 'ingest' AS stage, COUNT(*) AS docs_out,
       |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS tokens_out FROM base
       |  UNION ALL
       |  SELECT 2, 'langid', COUNT(*), CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s2
       |  UNION ALL
       |  SELECT 3, 'gopher', COUNT(*), CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s3
       |  UNION ALL
       |  SELECT 4, 'dedup', COUNT(*), CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s4
       |  UNION ALL
       |  SELECT 5, 'quality', COUNT(*), CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s5
       |  UNION ALL
       |  SELECT 6, 'budget', COUNT(*), CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s6
       |) ORDER BY stage_no""".stripMargin
}
