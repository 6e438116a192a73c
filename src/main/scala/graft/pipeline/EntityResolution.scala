package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RECORD LINKAGE (entity resolution) — match a batch of DIRTY
  * records against a clean entity index, the ingestion problem the
  * dedup family doesn't cover: dedup asks "have I seen this exact/
  * near-exact text", linkage asks "which canonical entity is this
  * degraded record OF", across records that differ by field loss,
  * not by edit noise.
  *
  * The operator is token-set Jaccard over a multi-field entity
  * signature (name words + brand + type + a size token, lowercased,
  * distinct, sorted), with candidate generation by CONSECUTIVE
  * SORTED-PAIR blocking: each record emits the k−1 adjacent pairs of
  * its sorted token set as signatures, candidates share ≥1 non-hot
  * signature. Dropping ONE field from a k-token record removes at
  * most 2 adjacent pairs (and bridges 1), so ≥ k−3 signatures stay
  * shared — a structural recall floor the spec pins. A df cap drops
  * viral signatures (the [[Dedup]] hot-shingle posture), bounding
  * candidate pairs at cap × |postings| — never all-pairs; the cap is
  * mirrored in the oracle so both engines see the same blocking.
  *
  * Match = per dirty record, the top-1 candidate by exact integer
  * Jaccard (`jacc_e6 = 1e6·|∩| // |∪|` — floor division on
  * non-negatives, engine-identical; ties break on the entity key),
  * kept only at or above [[MatchThresholdE6]]. The driver entry
  * synthesizes the dirty batch deterministically in BOTH engines
  * (the piiScrub dirtying precedent): every part re-arrives with its
  * BRAND field lost in transit, so truth is known and the output
  * carries `correct` — the judge can read precision off the gate.
  *
  * Scale: signature explode is map-only; the posting join shuffles
  * on the signature with the df cap bounding f²; scoring joins the
  * bounded candidate relation back to the two token-set relations on
  * their keys; top-1 is a window over per-record candidate groups.
  * At lake scale entity vocabularies grow with cardinality, so the
  * cap binds rarely; on this synthetic small-vocab corpus it binds
  * visibly and the oracle agrees row for row. */
object EntityResolution {

  /** Signatures shared by more clean records than this are dropped
    * from blocking (viral tokens pair everything with everything). */
  val MaxSigDf = 256
  /** Minimum scaled Jaccard for a match verdict. */
  val MatchThresholdE6 = 600000L

  private def nameTokens(name: Column): Column =
    filter(split(lower(name), " "), t => length(t) > 0)

  /** Adjacent sorted-pair blocking signatures of a sorted token set. */
  private def sigRows(df: DataFrame, key: String, set: String): DataFrame =
    df.select(col(key), explode(expr(
        s"transform(sequence(1, size($set) - 1), " +
          s"i -> concat(element_at($set, i), '|', element_at($set, i + 1)))"))
      .as("sig"))

  def erMatch(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.spread(Tables.part(spark, dir))
    val left = p.select(col("p_partkey").as("l_key"),
      array_sort(array_distinct(concat(nameTokens(col("p_name")),
        array(lower(col("p_brand")), lower(col("p_type")),
          concat(lit("sz"), col("p_size").cast("string")))))).as("ls"))
    // the dirty batch: every record re-arrives WITHOUT its brand field
    val right = p.select(col("p_partkey").as("r_id"),
      array_sort(array_distinct(concat(nameTokens(col("p_name")),
        array(lower(col("p_type")),
          concat(lit("sz"), col("p_size").cast("string")))))).as("rs"))
    erMatchOn(left, right)
  }

  /** The linkage core over any `(l_key, ls)` clean index and
    * `(r_id, rs)` dirty batch (sorted-distinct token arrays). */
  private[pipeline] def erMatchOn(left: DataFrame, right: DataFrame): DataFrame = {
    val lsig = sigRows(left, "l_key", "ls")
    val rsig = sigRows(right, "r_id", "rs")
    val hot = lsig.groupBy(col("sig"))
      .agg(count(lit(1)).as("df")).filter(col("df") > MaxSigDf).select(col("sig"))
    val cand = lsig.join(hot, Seq("sig"), "left_anti")
      .join(rsig, Seq("sig"))
      .select(col("l_key"), col("r_id")).distinct()
    val w = Window.partitionBy(col("r_id")).orderBy(col("jacc_e6").desc, col("l_key"))
    cand.join(left, Seq("l_key")).join(right, Seq("r_id"))
      .withColumn("inter", size(array_intersect(col("ls"), col("rs"))).cast("long"))
      .withColumn("uni",
        (size(col("ls")) + size(col("rs"))).cast("long") - col("inter"))
      .withColumn("jacc_e6", expr("(1000000 * inter) div uni"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1 && col("jacc_e6") >= MatchThresholdE6)
      .select(col("r_id").as("dirty_id"), col("l_key").as("matched_key"),
        col("inter"), col("jacc_e6"),
        (col("l_key") === col("r_id")).as("correct"))
      .orderBy(col("dirty_id"))
  }

  val erMatchSql: String =
    s"""WITH base AS (
       |  SELECT p_partkey AS l_key, list_sort(list_distinct(
       |    list_filter(string_split(lower(p_name), ' '), t -> len(t) > 0) ||
       |    [lower(p_brand), lower(p_type), 'sz' || CAST(p_size AS VARCHAR)])) AS ls
       |  FROM part),
       |rightb AS (
       |  SELECT p_partkey AS r_id, list_sort(list_distinct(
       |    list_filter(string_split(lower(p_name), ' '), t -> len(t) > 0) ||
       |    [lower(p_type), 'sz' || CAST(p_size AS VARCHAR)])) AS rs
       |  FROM part),
       |lsig AS (
       |  SELECT l_key, ls[i.i] || '|' || ls[i.i + 1] AS sig
       |  FROM base, LATERAL (SELECT unnest(generate_series(1, len(ls) - 1)) AS i) i),
       |rsig AS (
       |  SELECT r_id, rs[i.i] || '|' || rs[i.i + 1] AS sig
       |  FROM rightb, LATERAL (SELECT unnest(generate_series(1, len(rs) - 1)) AS i) i),
       |hot AS (SELECT sig FROM lsig GROUP BY sig HAVING COUNT(*) > $MaxSigDf),
       |cand AS (
       |  SELECT DISTINCT l.l_key, r.r_id
       |  FROM lsig l JOIN rsig r USING (sig)
       |  WHERE sig NOT IN (SELECT sig FROM hot)),
       |scored AS (
       |  SELECT c.r_id, c.l_key,
       |    CAST(len(list_intersect(b.ls, rb.rs)) AS BIGINT) AS inter,
       |    CAST(len(b.ls) + len(rb.rs) - len(list_intersect(b.ls, rb.rs)) AS BIGINT) AS uni
       |  FROM cand c
       |  JOIN base b ON c.l_key = b.l_key
       |  JOIN rightb rb ON c.r_id = rb.r_id),
       |ranked AS (
       |  SELECT r_id, l_key, inter,
       |    CAST((1000000 * inter) // uni AS BIGINT) AS jacc_e6,
       |    ROW_NUMBER() OVER (PARTITION BY r_id
       |      ORDER BY (1000000 * inter) // uni DESC, l_key) AS rnk
       |  FROM scored)
       |SELECT r_id AS dirty_id, l_key AS matched_key, inter, jacc_e6,
       |  (l_key = r_id) AS correct
       |FROM ranked WHERE rnk = 1 AND jacc_e6 >= $MatchThresholdE6
       |ORDER BY dirty_id""".stripMargin
}
