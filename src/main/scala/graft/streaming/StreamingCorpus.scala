package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the corpus-ingest operators — the dedup and
  * decontamination passes a live ingestion pipeline runs BEFORE
  * documents land in the training corpus (the batch versions in
  * [[graft.pipeline.Dedup]] are the backfill path over the same
  * semantics).
  *
  * Scale: exact dedup keys its state by content digest and lets the
  * watermark evict it — state is O(unique digests inside the
  * confidence window), not O(corpus history). Decontamination is a
  * stream-static join: the benchmark shingle index is eval-suite-sized
  * and broadcast to every micro-batch; the stream side never shuffles
  * wider than its own micro-batch.
  */
object StreamingCorpus {

  /** One incoming document on the ingest stream. */
  final case class IncomingDoc(docId: Long, text: String, timeUs: Long)

  /** Streaming exact dedup: emit only the FIRST document carrying each
    * content digest; later copies inside the watermark are dropped by
    * keyed state, and the watermark bounds that state exactly like the
    * reference's confidence window bounds the consumer's reorder
    * buffer. (Duplicates farther apart than the watermark are the
    * batch backfill's job — same digest key, so the decisions
    * compose.) */
  def dedupExact(docs: Dataset[IncomingDoc], confidenceMs: Long): DataFrame =
    docs
      .withColumn("event_time", timestamp_micros(col("timeUs")))
      .withWatermark("event_time", s"$confidenceMs milliseconds")
      .withColumn("digest", md5(col("text")))
      .dropDuplicatesWithinWatermark("digest")
      .select(col("docId").as("doc_id"), col("digest"), col("timeUs").as("time_us"))

  /** One incoming fetch on a crawl frontier stream. */
  final case class IncomingUrl(docId: Long, url: String, timeUs: Long)

  /** STREAMING URL-FRONTIER ADMISSION — the live twin of
    * dedup_url_canonical ([[graft.pipeline.Urls.urlCanonicalDedup]]):
    * only the FIRST fetch of each CANONICAL URL passes; later
    * decorated variants (scheme/host case, `www.`, default ports,
    * trailing slashes, utm_* params) inside the watermark are dropped
    * by canonical-keyed state. At crawl scale this runs on the
    * frontier BEFORE fetching, so a duplicate costs a state lookup
    * instead of a page download. State is O(canonical URLs inside the
    * confidence window) — the watermark evicts it, and re-crawls
    * farther apart than the window are the batch backfill's job (the
    * same division of labor [[dedupExact]] documents). The
    * canonicalization itself is the batch operator's codegen'd
    * expression — one rule set, two runtimes. */
  def admitUrls(urls: Dataset[IncomingUrl], confidenceMs: Long): DataFrame =
    urls
      .withColumn("event_time", timestamp_micros(col("timeUs")))
      .withWatermark("event_time", s"$confidenceMs milliseconds")
      .withColumn("canonical_url", graft.pipeline.Urls.canonicalizeUrl(col("url")))
      .dropDuplicatesWithinWatermark("canonical_url")
      .select(col("docId").as("doc_id"), col("canonical_url"),
        col("timeUs").as("time_us"))

  /** [[admitIncremental]]'s per-doc verdict. */
  final case class AdmitVerdict(doc_id: Long, time_us: Long, reason: String, keep: Boolean)

  /** Streaming incremental admission — the live twin of
    * [[graft.pipeline.DedupIndex.admit]]: verdict each arriving doc
    * against the PERSISTED standing index without ever reading corpus
    * text, with the same precedence (exact_corpus > exact_batch >
    * near_corpus > kept).
    *
    *  - **exact_corpus / near_corpus** are per-micro-batch
    *    stream-static probes of the standing relations: a digest left
    *    join, and a (band, band_sig) equi-join of the doc's four band
    *    keys against the index's banded signatures with the stored-sig
    *    est_jaccard refine — both stateless, and both UNHINTED: the
    *    standing index grows O(corpus docs), so forcing a broadcast
    *    would ship a TB-scale relation to every executor at lake
    *    scale. AQE/stats pick broadcast when the index is actually
    *    small and a shuffled hash join once it isn't; laying the
    *    persisted index out bucketed/sorted by digest and band key
    *    (see [[graft.pipeline.DedupIndex]]) lets the static side prune
    *    row groups instead of re-scanning per micro-batch.
    *  - **exact_batch** is the stream's own history: digest-keyed
    *    state, evicted at the watermark like [[dedupExact]]'s — a
    *    doc whose digest was seen earlier in the stream (any verdict,
    *    matching the batch `firsts` rule) is the duplicate. State is
    *    O(digests inside the confidence window), never corpus history.
    *  - Verdicts emit per doc in (timeUs, docId) order within a
    *    digest group, append-mode — delivery is at-least-once under
    *    replay exactly like the CDC consumer's micro-batch retry.
    *
    * Within-WINDOW near-dup pairs between two STREAM docs are out of
    * scope by design — the batch backfill over the same signatures
    * owns that decision (same division of labor [[dedupExact]]
    * documents for far-apart exact duplicates); such docs verdict as
    * `kept` here and the backfill reconciles. */
  def admitIncremental(docs: Dataset[IncomingDoc],
      index: graft.pipeline.DedupIndex.Standing, confidenceMs: Long): Dataset[AdmitVerdict] = {
    import graft.functions.Hashes._
    import graft.pipeline.Dedup
    val spark = docs.sparkSession
    import spark.implicits._
    val exCorpus = index.digests.select(col("digest")).distinct()
      .withColumn("m_exact", lit(true))
    val statBands = index.sigs.select(col("sig").as("csig"),
      posexplode(bandSigs(col("sig"))).as(Seq("band", "band_sig")))
    val probed = docs
      .withColumn("event_time", timestamp_micros(col("timeUs")))
      .withWatermark("event_time", s"$confidenceMs milliseconds")
      .withColumn("digest", md5(col("text")))
      .withColumn("sig", minhashSig(
        graft.functions.ShingleHash.shingleHashes(lower(col("text")), Dedup.ShingleK)))
      .join(exCorpus, Seq("digest"), "left")
      .select(col("docId"), col("timeUs"), col("event_time"), col("digest"), col("sig"),
        coalesce(col("m_exact"), lit(false)).as("exactCorpus"),
        posexplode_outer(bandSigs(col("sig"))).as(Seq("band", "band_sig")))
      .join(statBands, Seq("band", "band_sig"), "left")
      .withColumn("nearHit", coalesce(
        graft.functions.SetOps.eqCount(col("sig"), col("csig")).cast("double")
          / lit(NumHashes) >= Dedup.LshClusterThreshold, lit(false)))
      .select(col("docId"), col("timeUs"), col("digest"), col("exactCorpus"),
        col("nearHit"), col("event_time"))
    // the watermark-tagged event_time column must ride INTO the
    // stateful operator (a derived column loses the watermark tag and
    // EventTimeTimeout refuses to plan)
    probed
      .select(col("docId"), col("timeUs"), col("digest"), col("exactCorpus"),
        col("nearHit"), col("event_time"))
      .as[(Long, Long, String, Boolean, Boolean, java.sql.Timestamp)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Boolean, AdmitVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // collapse the band/candidate fan-out back to docs, then
            // verdict in arrival order (the ordered-delivery rule)
            val docsInGroup = rows.toSeq
              .groupBy(r => (r._1, r._2))
              .map { case ((docId, timeUs), rs) =>
                (docId, timeUs, rs.head._4, rs.exists(_._5), rs.map(_._6.getTime).max)
              }
              .toSeq.sortBy(t => (t._2, t._1))
            var seen = state.exists && state.get
            val out = docsInGroup.map { case (docId, timeUs, exact, near, _) =>
              val reason =
                if (exact) "exact_corpus"
                else if (seen) "exact_batch"
                else if (near) "near_corpus"
                else "kept"
              seen = true // any earlier same-digest doc makes the next one exact_batch
              AdmitVerdict(docId, timeUs, reason, reason == "kept")
            }
            state.update(true)
            // evict at watermark + confidence; clamp above the current
            // watermark so a late-arriving group can't set a past
            // timeout (which Spark rejects)
            state.setTimeoutTimestamp(math.max(
              docsInGroup.map(_._5).max + confidenceMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Streaming admission that also GROWS the standing index — the
    * operational closure of [[admitIncremental]]: each micro-batch is
    * verdicted against the PERSISTED index at `indexPath` and its
    * survivors are appended back ([[graft.pipeline.DedupIndex.update]])
    * before the next batch runs, so batch N+1 near-hits batch N's
    * survivors through parquet, with no state store at all.
    *
    * Semantics per micro-batch are exactly
    * [[graft.pipeline.DedupIndex.admit]]'s (exact_corpus > exact_batch
    * > near_corpus > near_batch > kept, lowest doc_id is the batch
    * original); across batches the index IS the memory. That differs
    * from [[admitIncremental]] in two declared ways: the within-batch
    * order rule is doc_id (the batch rule), not arrival time, and a
    * cross-batch exact copy of a NON-survivor re-verdicts by the same
    * rule that dropped the original (its digest/sig never entered the
    * index), so keep/drop decisions stay consistent even though the
    * reason label can differ.
    *
    * Delivery is at-least-once: a replayed micro-batch re-appends its
    * survivors, which duplicates whole index rows — harmless, because
    * every [[graft.pipeline.DedupIndex.admit]] probe distincts its
    * corpus side. The index is re-listed fresh each batch (a new read,
    * not a cached FileIndex), so appends are visible immediately.
    *
    * `sink` receives each batch's verdict frame (materialized — safe
    * to collect or write) and the micro-batch id. */
  def admitMaintained(docs: Dataset[IncomingDoc], indexPath: String,
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[IncomingDoc], batchId: Long) =>
        val b = batch.select(col("docId").as("doc_id"), col("text"))
        val idx = graft.pipeline.DedupIndex.load(batch.sparkSession, indexPath)
        // verdicts must be pinned BEFORE the append: a lazy verdict
        // frame re-read after update would see the batch's own rows
        // as standing corpus and flag everything exact_corpus
        val verdicts = graft.pipeline.DedupIndex.admit(b, idx).localCheckpoint()
        sink(verdicts, batchId)
        graft.pipeline.DedupIndex.update(
          b.join(verdicts.filter(col("keep")), Seq("doc_id"), "left_semi"), indexPath)
      }
      .start()

  /** One incoming embedding on the ingest stream. */
  final case class IncomingVec(vecId: Long, embedding: Seq[Double], timeUs: Long)

  /** [[admitVectors]]' per-vector verdict: `minDist2` is the smallest
    * ADC distance to any standing candidate in the probed cells (null
    * when the probed cells are empty). */
  final case class VecVerdict(vec_id: Long, time_us: Long,
      min_dist2: Option[Double], keep: Boolean)

  /** Live SEMANTIC admission — the streaming twin of
    * [[graft.pipeline.Dedup.embedCellGroups]]'s SemDeDup decision,
    * probing the PERSISTED ANN index ([[graft.pipeline.AnnIndex]]) the
    * way [[admitIncremental]] probes the dedup index: an arriving
    * embedding is dropped when some standing vector in its probed
    * cells sits within `maxDist2` by ASYMMETRIC (ADC) distance — the
    * arriving vector's exact per-cell residual against the stored
    * 4-bit codes; standing floats are never read (they do not exist
    * in the index).
    *
    * Everything is per-row and stateless on the stream side:
    *  - probe assignment is a map-side top-[[graft.pipeline.Similarity.NumProbes]]
    *    over the K collected centroids (sort of a K-element literal
    *    array — K-row metadata, the codegen-broadcast posture
    *    VecNearestCell documents);
    *  - the per-(vector, cell) ADC table is 64 literal-codebook dot
    *    products computed map-side into an array column — code
    *    lookups are element_at, no join against the codebook;
    *  - candidates arrive through ONE unhinted stream-static
    *    equi-join on the cell key against the pivoted codes relation
    *    (the standing index grows O(corpus) — AQE owns the strategy,
    *    the 17s rule); per-vector collapse is a no-state
    *    flatMapGroupsWithState (all of a vector's candidate rows are
    *    born in its own micro-batch).
    *
    * Verdicts match a batch probe of the same index at the same
    * threshold (spec-checked against [[graft.pipeline.AnnIndex.search]]). */
  def admitVectors(vecs: Dataset[IncomingVec],
      index: graft.pipeline.AnnIndex.Stored, maxDist2: Double): Dataset[VecVerdict] = {
    import graft.pipeline.Similarity.{NumProbes, PqSubDim, PqSubspaces}
    val spark = vecs.sparkSession
    import spark.implicits._
    // K-row / M·K-row metadata, collected once at stream setup (the
    // sanctioned metadata-collect: bounded by index geometry, never
    // by the corpus)
    val cents: Array[(Long, Array[Double], Double)] = index.centroids.collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[Seq[Double]]("cv").toArray,
        r.getAs[Double]("cn2"))).sortBy(_._1)
    // an index with no centroids has nothing to probe — fail loudly at
    // setup rather than silently swallowing every arriving vector
    require(cents.nonEmpty, "admitVectors: the ANN index has no centroids")
    val book: Map[(Int, Int), (Array[Double], Double)] = index.codebook.collect()
      .map(r => (r.getAs[Int]("m"), r.getAs[Int]("code")) ->
        ((r.getAs[Seq[Double]]("csub").toArray, r.getAs[Double]("cn2s")))).toMap
    // standing side, pivoted to one row per vector: (cell, id, 4 codes)
    val candWide = index.codes.groupBy(col("vec_id").as("cand_id"), col("cell"))
      .pivot(col("m"), 0 until PqSubspaces)
      .agg(first(col("code")))
      .select(Seq(col("cand_id"), col("cell")) ++
        (0 until PqSubspaces).map(m => col(s"$m").as(s"c$m")): _*)
    // ---- map-side probe assignment + per-cell ADC tables ----------
    val v = vecs
      .withColumn("v", col("embedding"))
      .withColumn("n2", graft.functions.VecDot.dot(col("v"), col("v")))
    // same rounded-cosine probe rule as the batch ivfPqSearch window
    // (round 6, cos desc, cid asc) so both paths probe the same cells
    val scoredCells = array(cents.map { case (cid, cv, cn2) =>
      struct((-round(graft.functions.VecDot.dot(col("v"), typedLit(cv)) /
        (sqrt(col("n2")) * math.sqrt(cn2)), 6)).as("negCos"), lit(cid).as("cell"))
    }: _*)
    val probes = v
      .withColumn("probe",
        explode(slice(array_sort(scoredCells), 1, math.min(NumProbes, cents.length))))
      .select(col("vecId"), col("timeUs"), col("v"), col("probe.cell").as("cell"))
    // residual per probed cell, then the 4×16 ADC table as literals
    val rv = cents.foldLeft(lit(null).cast("array<double>")) { case (acc, (cid, cv, _)) =>
      when(col("cell") === cid, zip_with(col("v"), typedLit(cv), (a, b) => a - b))
        .otherwise(acc)
    }
    val withQd = probes.withColumn("rv", rv)
      .select(Seq(col("vecId"), col("timeUs"), col("cell")) ++
        (0 until PqSubspaces).map { m =>
          slice(col("rv"), m * PqSubDim + 1, PqSubDim).as(s"r$m")
        }: _*)
      .select(col("vecId"), col("timeUs"), col("cell"),
        array((0 until PqSubspaces).map { m =>
          val rsub = col(s"r$m")
          val rn2 = graft.functions.VecDot.dot(rsub, rsub)
          array((0 until graft.pipeline.Similarity.PqCodes).map { code =>
            val (csub, cn2s) = book((m, code))
            rn2 - lit(2.0) * graft.functions.VecDot.dot(rsub, typedLit(csub)) + lit(cn2s)
          }: _*)
        }: _*).as("qd"))
    // ---- one unhinted stream-static equi-join on the cell key -----
    val scored = withQd.join(candWide, Seq("cell"), "left")
      // DECIMAL-exact subspace sum rounded to 6 — the batch ADC
      // formula bit-for-bit (doc'd bit-stability rule)
      .withColumn("dist2", round(
        (0 until PqSubspaces).map(m =>
          element_at(element_at(col("qd"), m + 1), col(s"c$m").cast("int") + 1)
            .cast("decimal(27,12)"))
          .reduce(_ + _).cast("double"), 6))
      .select(col("vecId"), col("timeUs"), col("dist2"))
    // ---- per-vector collapse, no stored state ---------------------
    scored.as[(Long, Long, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, VecVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (vecId, rows, _) =>
          val rs = rows.toSeq
          val timeUs = rs.head._2
          val dists = rs.flatMap(_._3)
          val min = if (dists.isEmpty) None else Some(dists.min)
          Iterator.single(VecVerdict(vecId, timeUs, min,
            keep = min.forall(_ > maxDist2)))
      }
  }

  /** Streaming decontamination: flag incoming documents sharing any
    * word-n-gram with a STATIC benchmark relation (doc_id, text) —
    * the stream-static inner-join analogue of
    * [[graft.pipeline.Dedup.decontaminate]]. Emits each contaminated
    * doc once (left_semi against the benchmark index, then
    * watermark-evicted per-doc dedup state — a doc's shingle rows all
    * live in its own micro-batch, so the state only papers over the
    * explode fan-out, never history). */
  def decontaminate(docs: Dataset[IncomingDoc], benchmark: DataFrame,
      shingleWords: Int, confidenceMs: Long): DataFrame = {
    def shingles(df: DataFrame): DataFrame = {
      val toks = graft.functions.Tokens.tokens(col("text"))
      df.withColumn("toks", toks)
        .filter(size(col("toks")) >= shingleWords)
        .withColumn("shingle",
          explode(array_distinct(transform(
            sequence(lit(1), size(col("toks")) - (shingleWords - 1)),
            i => concat_ws(" ", (0 until shingleWords)
              .map(o => element_at(col("toks"), i + o)): _*)))))
        .drop("toks", "text")
    }
    val benchIndex = shingles(benchmark.select(col("doc_id"), col("text")))
      .select(col("shingle")).distinct()
    shingles(docs
        .withColumn("event_time", timestamp_micros(col("timeUs")))
        .withWatermark("event_time", s"$confidenceMs milliseconds")
        .select(col("docId").as("doc_id"), col("text"), col("event_time")))
      .join(benchIndex, Seq("shingle"), "left_semi")
      .dropDuplicatesWithinWatermark("doc_id")
      .select(col("doc_id"))
  }

  /** The per-HIT variant of [[decontaminate]] — the alerting feed: one
    * row per (arriving doc, benchmark doc, shared
    * word-[[graft.pipeline.Dedup.ShingleWords]]-gram), emitted the
    * moment the doc lands, with the colliding benchmark doc and
    * shingle named (what an operator pages on; [[decontaminate]]'s
    * once-per-doc flag is the corpus-hygiene decision). STATELESS —
    * no watermark or state store: the benchmark index (`bench_id`,
    * `text`) broadcasts and every micro-batch is one codegen'd scan +
    * broadcast-hash probe. */
  def contaminationHits(docs: DataFrame, benchmark: DataFrame): DataFrame = {
    import graft.pipeline.Dedup
    def shingled(df: DataFrame, idCol: String): DataFrame =
      df.withColumn("toks", graft.functions.Tokens.tokens(col("text")))
        .filter(size(col("toks")) >= Dedup.ShingleWords)
        .select(col(idCol), explode_outer(Dedup.wordShingles(col("toks"))).as("shingle"))
        .filter(col("shingle").isNotNull)
    shingled(docs, "doc_id")
      .join(broadcast(shingled(benchmark, "bench_id")), Seq("shingle"))
      .select(col("doc_id"), col("bench_id"), col("shingle"))
  }

  /** CONTINUOUS TRENDING TOKENS — the streaming analogue of
    * [[graft.pipeline.Corpus.topkTokens]]: per-(event-time window,
    * token) counts over the arriving corpus, finalized in append mode
    * once the watermark passes the window end. Ranking is NOT done in
    * the stream: top-k across keys is a cross-key operation the state
    * store can't express per key, and the finalized count relation is
    * (windows × vocab) — tiny next to the corpus — so the standard
    * layout finalizes counts in the stream and ranks each closed
    * window with [[trendingTopK]] (a batch step over metadata, e.g. in
    * the sink's foreachBatch).
    *
    * Scale: the only shuffle keys on (window, token) — same
    * token-grain exchange as the batch wordcount; watermark eviction
    * bounds state to windows-in-flight × vocab. */
  def trendingTokens(docs: Dataset[IncomingDoc],
      windowMs: Long, confidenceMs: Long): DataFrame =
    docs.toDF()
      .withColumn("event_time", timestamp_micros(col("timeUs")))
      .withWatermark("event_time", s"$confidenceMs milliseconds")
      .select(col("event_time"),
        explode_outer(graft.functions.Tokens.tokens(col("text"))).as("token"))
      .filter(col("token").isNotNull)
      .groupBy(window(col("event_time"), s"$windowMs milliseconds"), col("token"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("token"), col("n"))

  /** Rank a finalized [[trendingTokens]] relation: top-k tokens per
    * closed window (ties → lexicographic). The window function runs
    * over per-window COUNT rows (vocab-sized, already reduced), the
    * sanctioned above-a-reducer shape. */
  def trendingTopK(finalized: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start")).orderBy(col("n").desc, col("token"))
    finalized.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("window_start"), col("rank"))
  }

  /** STREAMING MODEL-SCORED ADMISSION — the live twin of
    * [[graft.pipeline.Classifier.score]]: every arriving document is
    * scored against a PERSISTED classifier model
    * ([[graft.pipeline.Classifier.writeModel]] /
    * [[graft.pipeline.Classifier.loadModel]] — trained once on the
    * reference snapshot, never recomputed on the hot path) and only
    * docs at or above the keep threshold are admitted. The model is
    * [[graft.pipeline.Classifier.ModelSize]]-bounded and ships INSIDE
    * the plan as a map literal ([[graft.pipeline.Classifier.scoreExpr]]),
    * so admission is a pure per-row projection + filter: no join, no
    * shuffle, NO STATE — the one streaming operator here that needs
    * neither watermark nor state store, because a quality verdict
    * depends only on the document itself. Arithmetic is bit-equal to
    * the batch scorer, so batch backfill and live ingest admit the
    * same documents. */
  def admitScored(docs: Dataset[IncomingDoc],
      model: Seq[(String, java.math.BigDecimal)], threshold: Double): DataFrame =
    docs.toDF()
      .withColumn("score",
        graft.pipeline.Classifier.scoreExpr(model, col("text")))
      .filter(col("score") >= threshold)
      .select(col("docId").as("doc_id"), col("score"),
        col("timeUs").as("time_us"))
}
