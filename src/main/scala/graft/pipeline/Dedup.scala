package graft.pipeline

import graft.Tables
import graft.functions.Hashes
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` / `embeddings` tables
  * (SURVEY.md §2c #24-28) — the dedup family a large-scale
  * training-data pipeline needs.
  *
  * Scale posture (100 TB): every variant is
  * per-row-projection → shuffle-on-small-key → partition-local work.
  * Candidate generation never compares all pairs: exact dedup shuffles
  * on a 128-bit digest; MinHash/SimHash shuffle on (band, signature)
  * buckets; the n-gram variant shuffles on shingle (inverted index).
  * The only quadratic work is *within* a bucket/shingle group, whose
  * size is bounded by design (band collisions are rare for non-dups).
  */
object Dedup {

  import Hashes._

  val ShingleK = 5          // char 5-grams
  val JaccardThreshold = 0.5
  val HammingThreshold = 2  // of 32 simhash bits (≤3 is pigeonhole-covered by 4 blocks)
  val CosineThreshold = 0.4

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  // ------------------------------------------------------------ #24 exact

  /** Exact dedup: group by md5(text) — the canonical content-addressed
    * dedup. One shuffle on the digest; map-side partial agg collapses
    * duplicates before the exchange. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("text")).as("digest"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_doc_id"))
      .orderBy(col("canonical_doc_id"))

  val exactSql: String =
    """SELECT md5(text) AS digest, COUNT(*) AS n_copies, MIN(doc_id) AS canonical_doc_id
      |FROM documents GROUP BY 1 ORDER BY canonical_doc_id""".stripMargin

  // ------------------------------------------------------------ #25 n-gram Jaccard

  /** Word-3-gram shingle set per doc (lowercased, whitespace tokens). */
  private def wordShingles(text: Column): Column = {
    val toks = filter(split(lower(text), " "), t => length(t) > 0)
    // Guard: Spark's sequence(1, n) is DESCENDING for n < 1 and ANSI
    // element_at would throw on the out-of-range index — short docs
    // yield an empty set instead (the oracle filters them identically).
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2),
        i => concat(element_at(toks, i), lit(" "),
          element_at(toks, i + 1), lit(" "), element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))
  }

  private val wordShinglesSql: String =
    """list_distinct(list_transform(generate_series(1, len(tokens) - 2),
      |      i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]))""".stripMargin

  /** n-gram Jaccard near-dup pairs via an inverted shingle index —
    * explode shingles, self-join on the shingle (shuffle on shingle,
    * never all-pairs), count common, Jaccard = |∩| / |∪|.
    * The same formulation runs verbatim at 100 TB: hot shingles can be
    * frequency-capped, and AQE handles residual skew. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = docs(spark, dir)
      .select(col("doc_id"), wordShingles(col("text")).as("shingles"))
      .filter(size(col("shingles")) >= 1)
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("sz"))
    val inv = sh.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val common = inv.as("a").join(inv.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes.as("s1")), col("doc_id_1") === col("s1.doc_id"))
      .join(broadcast(sizes.as("s2")), col("doc_id_2") === col("s2.doc_id"))
      .withColumn("jaccard", round(col("n_common").cast("double") /
        (col("s1.sz") + col("s2.sz") - col("n_common")).cast("double"), 6))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("doc_id_1"), col("doc_id_2"), col("n_common"), col("jaccard"))
      .orderBy(col("doc_id_1"), col("doc_id_2"))
  }

  val ngramJaccardSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS tokens
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, $wordShinglesSql AS shingles
       |  FROM toks WHERE len(tokens) - 2 >= 1),
       |sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
       |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
       |common AS (
       |  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, COUNT(*) AS n_common
       |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_id_1, doc_id_2, n_common,
       |  round(CAST(n_common AS DOUBLE) / CAST(s1.sz + s2.sz - n_common AS DOUBLE), 6) AS jaccard
       |FROM common
       |JOIN sizes s1 ON doc_id_1 = s1.doc_id
       |JOIN sizes s2 ON doc_id_2 = s2.doc_id
       |WHERE round(CAST(n_common AS DOUBLE) / CAST(s1.sz + s2.sz - n_common AS DOUBLE), 6) >= $JaccardThreshold
       |ORDER BY doc_id_1, doc_id_2""".stripMargin

  // ------------------------------------------------------------ #26 MinHash + LSH

  /** MinHash + banded LSH candidate pairs: per-row signature (map-only)
    * → explode ${Hashes.NumBands} band signatures → shuffle on
    * (band, sig) → pairs within a bucket. est_jaccard = fraction of
    * equal minhashes. The standard sub-quadratic dedup layout. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // staged projections: codes → shingle hashes → signature, so each
    // expensive array is evaluated once per row (see Hashes scaladoc)
    val sigs = docs(spark, dir)
      .select(col("doc_id"), charCodes(lower(col("text"))).as("codes"))
      .select(col("doc_id"), shingleHashesFromCodes(col("codes"), ShingleK).as("shash"))
      .select(col("doc_id"), minhashSig(col("shash")).as("sig"))
    val bands = sigs.select(col("doc_id"),
        posexplode(bandSigs(col("sig"))).as(Seq("band", "band_sig")))
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .agg(count(lit(1)).as("n_shared_bands"))
    pairs
      .join(broadcast(sigs.as("s1")), col("doc_id_1") === col("s1.doc_id"))
      .join(broadcast(sigs.as("s2")), col("doc_id_2") === col("s2.doc_id"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("s1.sig"), col("s2.sig"), (x, y) => x === y), b => b))
          .cast("double") / NumHashes)
      .select(col("doc_id_1"), col("doc_id_2"), col("n_shared_bands"), col("est_jaccard"))
      .orderBy(col("doc_id_1"), col("doc_id_2"))
  }

  val minhashLshSql: String = {
    s"""WITH codes AS (
       |  SELECT doc_id, ${charCodesSql("lower(text)")} AS codes FROM documents),
       |sh AS (
       |  SELECT doc_id, ${shingleHashesFromCodesSql("codes", ShingleK)} AS shash FROM codes),
       |sigs AS (
       |  SELECT doc_id, ${minhashSigSql("shash")} AS sig FROM sh),
       |banded AS (
       |  SELECT doc_id, ${bandSigsSql("sig")} AS bands FROM sigs),
       |bands AS (
       |  SELECT doc_id, CAST(b.band - 1 AS INT) AS band, bands[b.band] AS band_sig
       |  FROM banded, LATERAL (SELECT unnest(generate_series(1, ${NumBands})) AS band) b),
       |pairs AS (
       |  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, COUNT(*) AS n_shared_bands
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_id_1, doc_id_2, n_shared_bands,
       |  CAST(len(list_filter(generate_series(1, ${NumHashes}), i -> s1.sig[i] = s2.sig[i])) AS DOUBLE) / ${NumHashes} AS est_jaccard
       |FROM pairs
       |JOIN sigs s1 ON doc_id_1 = s1.doc_id
       |JOIN sigs s2 ON doc_id_2 = s2.doc_id
       |ORDER BY doc_id_1, doc_id_2""".stripMargin
  }

  // ------------------------------------------------------------ #27 SimHash

  /** SimHash near-dup: 32-bit per-doc signature (map-only), candidates
    * share at least one of four 8-bit blocks (pigeonhole: hamming ≤ 3
    * guarantees a shared block; we filter candidates at hamming ≤
    * $HammingThreshold). Shuffle is on (block_idx, block) only. */
  def simhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val sims = docs(spark, dir)
      .select(col("doc_id"), charCodes(lower(col("text"))).as("codes"))
      .select(col("doc_id"), shingleHashesFromCodes(col("codes"), ShingleK).as("shash"))
      .select(col("doc_id"), simhash32(col("shash")).as("simhash"))
    val blocks = sims.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), 8 * b).bitwiseAND(lit(255L))): _*)).as(Seq("block_idx", "block")))
    blocks.as("a").join(blocks.as("b"),
        col("a.block_idx") === col("b.block_idx") && col("a.block") === col("b.block") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("int").as("hamming"))
      .filter(col("hamming") <= HammingThreshold) // filter BEFORE the distinct exchange
      .distinct()
      .orderBy(col("doc_id_1"), col("doc_id_2"))
  }

  val simhashDedupSql: String = {
    s"""WITH codes AS (
       |  SELECT doc_id, ${charCodesSql("lower(text)")} AS codes FROM documents),
       |sh AS (
       |  SELECT doc_id, ${shingleHashesFromCodesSql("codes", ShingleK)} AS shash FROM codes),
       |sims AS (
       |  SELECT doc_id, ${simhash32Sql("shash")} AS simhash FROM sh),
       |blocks AS (
       |  SELECT doc_id, simhash, b.block_idx, (simhash >> (8 * b.block_idx)) & 255 AS block
       |  FROM sims, LATERAL (SELECT unnest(generate_series(0, 3)) AS block_idx) b),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |  FROM blocks a JOIN blocks b
       |    ON a.block_idx = b.block_idx AND a.block = b.block AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingThreshold)
       |SELECT doc_id_1, doc_id_2, hamming FROM cand
       |ORDER BY doc_id_1, doc_id_2""".stripMargin
  }

  // ------------------------------------------------------------ #28 embedding cosine

  /** Embedding near-dup: pairs with cosine ≥ $CosineThreshold. The
    * oracle-checked form is all-pairs (exact); the 100 TB path is the
    * LSH-bucketed variant in [[Similarity.annLshBucketed]] — same
    * scoring expression, sub-quadratic candidates. */
  def embedCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val withNorm = e.withColumn("n2",
      aggregate(col("v"), lit(0.0d), (acc, x) => acc + x * x))
    withNorm.as("a").join(withNorm.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot", aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x))
      .withColumn("cos_sim", round(col("dot") / (sqrt(col("a.n2")) * sqrt(col("b.n2"))), 6))
      .filter(col("cos_sim") >= CosineThreshold)
      .select(col("a.vec_id").as("vec_id_1"), col("b.vec_id").as("vec_id_2"), col("cos_sim"))
      .orderBy(col("vec_id_1"), col("vec_id_2"))
  }

  val embedCosineSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(v, x -> x * x)), (acc, x) -> acc + x) AS n2
       |  FROM e)
       |SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])), (acc, x) -> acc + x)
       |    / (sqrt(a.n2) * sqrt(b.n2)), 6) AS cos_sim
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])), (acc, x) -> acc + x)
       |    / (sqrt(a.n2) * sqrt(b.n2)), 6) >= $CosineThreshold
       |ORDER BY vec_id_1, vec_id_2""".stripMargin
}
