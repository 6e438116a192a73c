package graft.pipeline

import graft.functions.Hashes._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted STANDING dedup index — the operational half of
  * [[Dedup.incremental]]'s contract.
  *
  * `incremental` proves the admission semantics (exact + near verdicts
  * against a standing corpus), but recomputes the corpus's digest set
  * and minhash signatures from raw text on every run — at 100 TB that
  * re-reads the lake per ingest batch. This index persists exactly the
  * per-doc state admission needs, so a batch is admitted by reading
  * KB-per-doc metadata instead of the corpus text:
  *
  * The index is ONE `(doc_id, digest, sig)` parquet relation — md5
  * content digest (exact dedup) and 16-hash minhash signature (near
  * dedup) side by side. One relation, not two, on purpose: a write or
  * append is a SINGLE parquet commit, so a crash can never leave a doc
  * exact-dedupable but invisible to near-dedup (the failure mode a
  * digests/sigs split invites — half-appended state silently skews
  * near_corpus verdicts). Probes that need only one half read it via
  * parquet column pruning, so the merge costs no extra IO. Band keys
  * are derived per probe with [[bandSigs]] — a map-only transform, so
  * persisting them would only duplicate the sig column ×4.
  *
  * Admission writes BACK the admitted docs' rows ([[update]] appends —
  * no rewrite of the standing relation), so the index grows with the
  * corpus and batch N+1 sees batch N's survivors. The relation is
  * plain parquet: at lake scale, lay it out bucketed/sorted by digest
  * (and keep file-level digest min/max stats tight) so a probing join
  * prunes row groups instead of re-scanning the whole index per batch.
  */
object DedupIndex {

  /** The standing index, loaded: content digests + minhash sigs. */
  final case class Standing(digests: DataFrame, sigs: DataFrame)

  /** Per-doc index rows for any `(doc_id, text)` frame:
    * (doc_id, digest, sig). One pass: digest is a map-side md5; the
    * signature is the explode + 16-aggregate minhash layout
    * [[Dedup.minhashLsh]] uses (map-side partial combine, one shuffle
    * on doc_id). */
  def signatures(d: DataFrame): DataFrame =
    d.select(col("doc_id"), md5(col("text")).as("digest"),
        graft.functions.ShingleHash.shingleHashes(lower(col("text")), Dedup.ShingleK)
          .as("shash"))
      .select(col("doc_id"), col("digest"), explode_outer(col("shash")).as("h"))
      .groupBy(col("doc_id"))
      .agg(first(col("digest")).as("digest"),
        (0 until NumHashes).map(j =>
          min((col("h") * minhashA(j) + minhashB(j)) % M).as(s"m$j")): _*)
      .select(col("doc_id"), col("digest"),
        array((0 until NumHashes).map(j => col(s"m$j")): _*).as("sig"))

  /** Build and persist the index for a corpus — run ONCE; afterwards
    * only [[update]] appends. One parquet commit: digest and sig land
    * together or not at all. */
  def write(corpus: DataFrame, path: String): Unit =
    signatures(corpus).write.mode("overwrite").parquet(path)

  /** Load the standing index. Both views read the SAME relation —
    * column pruning keeps a digest-only probe from touching sigs. */
  def load(spark: SparkSession, path: String): Standing = {
    val idx = spark.read.parquet(path)
    Standing(idx.select(col("doc_id"), col("digest")), idx.select(col("doc_id"), col("sig")))
  }

  /** Append the ADMITTED docs of a batch to the standing index (call
    * with the batch filtered to `keep` verdicts). Append-only, one
    * commit: the standing relation is never rewritten, and a replayed
    * append duplicates whole rows (harmless — [[admit]] distincts). */
  def update(admitted: DataFrame, path: String): Unit =
    signatures(admitted).write.mode("append").parquet(path)

  /** Compaction report: row/file counts around the rewrite. */
  final case class CompactStats(rowsBefore: Long, rowsAfter: Long,
      filesBefore: Long, filesAfter: Long)

  /** COMPACT the standing relation — the maintenance pass for a long
    * [[update]] cadence: every append lands new files (small-files
    * swamp) and a REPLAYED append duplicates whole rows. Duplicates
    * are semantically harmless here ([[admit]] distincts), but they
    * inflate every probe's scan and band join, so compaction drops
    * exact duplicates and rewrites the relation into `numFiles`
    * files. Conflicting state for one doc_id (same id, different
    * digest/sig — a re-ingested mutated doc) is NOT repairable by
    * dedup: compact fails loudly; the fix is a rebuild.
    *
    * Swap discipline: the rewrite lands beside the index first, then
    * the old relation is deleted and the new one renamed in. A crash
    * mid-swap leaves a missing index that [[load]] fails on loudly —
    * recoverable from the corpus, never silently wrong. */
  def compact(spark: SparkSession, path: String, numFiles: Int = 1): CompactStats = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def countFiles(p: org.apache.hadoop.fs.Path): Long = {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    val idxPath = new org.apache.hadoop.fs.Path(path)
    val filesBefore = countFiles(idxPath)
    val idx = spark.read.parquet(path)
    val rowsBefore = idx.count()
    val deduped = idx.distinct().localCheckpoint()
    val conflicts = deduped.groupBy(col("doc_id"))
      .count().filter(col("count") > 1).limit(1).count()
    require(conflicts == 0L,
      s"conflicting index rows for the same doc_id at $path — rebuild the index, compaction cannot pick a side")
    val rowsAfter = deduped.count()
    deduped.repartition(numFiles).write.mode("overwrite").parquet(s"${path}_compact")
    // Checked swap: an unchecked rename returning false (object-store
    // FS, leftover destination) would leave the compacted relation
    // stranded beside a deleted index — fail loudly instead, so the
    // missing-index state is discovered here and not at the next probe.
    require(fs.delete(idxPath, true),
      s"compact: failed to delete $idxPath — aborting swap, ${path}_compact holds the rewrite")
    require(fs.rename(new org.apache.hadoop.fs.Path(s"${path}_compact"), idxPath),
      s"compact: rename failed: ${path}_compact -> $idxPath — index missing, rename the rewrite in manually or rebuild")
    CompactStats(rowsBefore, rowsAfter, filesBefore, countFiles(idxPath))
  }

  /** Admit a `(doc_id, text)` batch against the standing index —
    * verdict per doc, SAME schema and precedence as
    * [[Dedup.incremental]] (exact_corpus > exact_batch > near_corpus >
    * near_batch > kept), but the corpus side is index metadata only:
    * the corpus TEXT is never read.
    *
    * Scale: batch signatures are one pass over the (small) batch; the
    * corpus digest probe is a digest-keyed left join; near candidates
    * meet only in (band, band_sig) buckets against the standing sigs
    * relation (AQE-splittable equi-join, never all-pairs), and
    * est_jaccard refines candidates from the STORED signatures. */
  def admit(batch: DataFrame, index: Standing): DataFrame = {
    val b = signatures(batch).localCheckpoint()
    val exCorpus = index.digests.select(col("digest")).distinct()
      .withColumn("m_exact_corpus", lit(true))
    val firsts = b.groupBy(col("digest")).agg(min(col("doc_id")).as("first_id"))
    val bBands = b.select(col("doc_id"), col("sig"),
      posexplode(bandSigs(col("sig"))).as(Seq("band", "band_sig")))
    val cBands = index.sigs.select(col("doc_id"), col("sig"),
      posexplode(bandSigs(col("sig"))).as(Seq("band", "band_sig")))
    def estJ(s1: org.apache.spark.sql.Column, s2: org.apache.spark.sql.Column) =
      graft.functions.SetOps.eqCount(s1, s2).cast("double") / NumHashes
    // batch → standing corpus: any confirmed partner flags the doc
    val nearC = bBands.as("a").join(cBands.as("c"),
        col("a.band") === col("c.band") && col("a.band_sig") === col("c.band_sig"))
      .filter(estJ(col("a.sig"), col("c.sig")) >= Dedup.LshClusterThreshold)
      .select(col("a.doc_id").as("i")).distinct()
      .withColumn("near_corpus", lit(true))
    // batch → EARLIER batch doc (incremental's ordered-arrival rule:
    // only a lower-id partner makes the later doc the duplicate)
    val nearB = bBands.as("a").join(bBands.as("b"),
        col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") > col("b.doc_id"))
      .filter(estJ(col("a.sig"), col("b.sig")) >= Dedup.LshClusterThreshold)
      .select(col("a.doc_id").as("i")).distinct()
      .withColumn("near_batch", lit(true))
    b.join(exCorpus, Seq("digest"), "left")
      .join(firsts, Seq("digest"))
      .join(nearC, col("doc_id") === nearC("i"), "left").drop(nearC("i"))
      .join(nearB, col("doc_id") === nearB("i"), "left").drop(nearB("i"))
      .withColumn("reason",
        when(coalesce(col("m_exact_corpus"), lit(false)), "exact_corpus")
          .when(col("doc_id") > col("first_id"), "exact_batch")
          .when(coalesce(col("near_corpus"), lit(false)), "near_corpus")
          .when(coalesce(col("near_batch"), lit(false)), "near_batch")
          .otherwise("kept"))
      .select(col("doc_id"), col("reason"), (col("reason") === "kept").as("keep"))
      .orderBy(col("doc_id"))
  }

  /** BENCH-ONLY probe surface (round-8 verdict: end-to-end index
    * entries are dominated by build/commit noise): admit the
    * [[Dedup.IncrementalMod]] batch slice of `documents` against a
    * PRE-BUILT standing index at `path` — load + probe alone in the
    * timed span, the steady-state per-batch admission latency. The
    * spec-gated build/update/compact paths stay the correctness
    * surface. */
  def probePrebuilt(spark: org.apache.spark.sql.SparkSession, dir: String,
      path: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    admit(d.filter(col("doc_id") % Dedup.IncrementalMod === 0), load(spark, path))
  }

  /** The standing-corpus slice [[probePrebuilt]] expects the index at
    * `path` to hold (everything outside the incremental batch). */
  def benchCorpus(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") % Dedup.IncrementalMod =!= 0)
}
