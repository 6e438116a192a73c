package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

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
      val toks = filter(split(lower(col("text")), " "), t => length(t) > 0)
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
      df.withColumn("toks", filter(split(lower(col("text")), " "), t => length(t) > 0))
        .filter(size(col("toks")) >= Dedup.ShingleWords)
        .select(col(idCol), explode_outer(Dedup.wordShingles(col("toks"))).as("shingle"))
        .filter(col("shingle").isNotNull)
    shingled(docs, "doc_id")
      .join(broadcast(shingled(benchmark, "bench_id")), Seq("shingle"))
      .select(col("doc_id"), col("bench_id"), col("shingle"))
  }
}
