package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted STANDING BM25 index — the retrieval twin of
  * [[DedupIndex]]'s contract.
  *
  * [[TextAnalysis.bm25]] proves the scoring semantics but recomputes
  * df/dl/N/T from raw text on every run — at 100 TB that re-reads the
  * lake per query batch. This index persists the SUFFICIENT STATISTIC
  * instead: the `(doc_id, token, tf)` relation
  * ([[TextAnalysis.tfRelation]]), from which every corpus stat BM25
  * needs derives without touching text again — df (count per token),
  * dl (sum per doc), N (distinct docs — token-less docs keep a NULL
  * row so N survives), T (total tf). Scoring a query batch is then
  * token-grain metadata work: the stored relation is typically 1-2
  * orders of magnitude smaller than the corpus text it summarizes.
  *
  * The index is ONE parquet relation, appended per admitted batch
  * ([[add]] — the standing relation is never rewritten), so batch N+1
  * scores against batch N's stats with no rebuild. A replayed append
  * duplicates whole rows; [[load]] collapses them with `distinct()`
  * (identical rows by construction — same doc, same text, same tf),
  * so at-least-once ingestion cannot double-count df/dl. [[compact]]
  * removes the duplicates physically (and the small-files swamp) on
  * the maintenance cadence; conflicting rows for one (doc_id, token)
  * — a re-ingested MUTATED doc — are not repairable by dedup and fail
  * compaction loudly, the [[DedupIndex.compact]] discipline.
  *
  * Scale shape: [[search]] runs [[TextAnalysis.bm25FromTf]] — the
  * SAME plan the from-text operator runs, minus the text scan and the
  * tokenize/explode exchange. At lake scale, lay the relation out
  * bucketed by token so the df aggregate and the query-term probe
  * co-locate, and partition by ingest batch so [[compact]] can run
  * per-partition. */
object Bm25Index {

  /** Build and persist the index for a corpus — run ONCE; afterwards
    * only [[add]] appends. */
  def write(corpus: DataFrame, path: String): Unit =
    TextAnalysis.tfRelation(corpus).write.mode("overwrite").parquet(path)

  /** Append a new batch's term frequencies to the standing index.
    * Append-only, one parquet commit per batch; a replayed append
    * duplicates rows that [[load]] collapses. */
  def add(batch: DataFrame, path: String): Unit =
    TextAnalysis.tfRelation(batch).write.mode("append").parquet(path)

  /** Load the standing tf relation. `distinct()` makes a replayed
    * [[add]] harmless — one (doc_id, token)-keyed exchange of
    * token-grain metadata, the price of at-least-once ingestion
    * (post-[[compact]] it deduplicates nothing but still exchanges;
    * skip-after-compact is a caller policy, not index semantics). */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).distinct()

  /** Score the standing corpus against the fixed query workload —
    * [[TextAnalysis.bm25FromTf]] over the stored statistic, so the
    * output is row-for-row what [[TextAnalysis.bm25]] computes from
    * the equivalent corpus text. */
  def search(spark: SparkSession, path: String): DataFrame =
    TextAnalysis.bm25FromTf(load(spark, path))

  /** Compaction: drop replay duplicates, rewrite into `numFiles`
    * files, fail loudly on true conflicts (same (doc_id, token),
    * different tf — a mutated re-ingest needs a rebuild, compaction
    * cannot pick a side). Same checked-swap discipline as
    * [[DedupIndex.compact]]. */
  def compact(spark: SparkSession, path: String, numFiles: Int = 1): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val idxPath = new org.apache.hadoop.fs.Path(path)
    val deduped = spark.read.parquet(path).distinct().localCheckpoint()
    val conflicts = deduped.groupBy(col("doc_id"), col("token"))
      .count().filter(col("count") > 1).limit(1).count()
    require(conflicts == 0L,
      s"conflicting tf rows for the same (doc_id, token) at $path — " +
        "rebuild the index, compaction cannot pick a side")
    deduped.repartition(numFiles).write.mode("overwrite").parquet(s"${path}_compact")
    require(fs.delete(idxPath, true),
      s"compact: failed to delete $idxPath — aborting swap, ${path}_compact holds the rewrite")
    require(fs.rename(new org.apache.hadoop.fs.Path(s"${path}_compact"), idxPath),
      s"compact: failed to rename ${path}_compact into place — the index is missing, re-run compact or rebuild")
  }

  /** Docs below this id form the base index in [[bm25IndexSearch]];
    * the rest arrive via [[add]] — both halves non-empty at every
    * test scale. */
  val AddSplit = 40L

  /** Driver-visible entry (SURVEY §2c): build the index on doc_id <
    * [[AddSplit]], [[add]] the rest as a second batch, REPLAY that
    * append (at-least-once ingestion), then [[search]] — the full
    * incremental round-trip including the duplicate-collapse path.
    * The oracle is [[TextAnalysis.bm25Sql]] UNCHANGED: the stored
    * incremental path must reproduce the batch from-text result
    * row for row. */
  def bm25IndexSearch(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.docs(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft_bm25_index").toString
    write(d.filter(col("doc_id") < AddSplit), path)
    add(d.filter(col("doc_id") >= AddSplit), path)
    add(d.filter(col("doc_id") >= AddSplit), path) // replayed append
    search(spark, path)
  }
}
