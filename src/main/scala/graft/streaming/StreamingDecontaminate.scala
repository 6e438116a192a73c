package graft.streaming

import graft.pipeline.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING twin of [[graft.pipeline.Dedup.decontaminate]] — the
  * ingest-time contamination tripwire: documents arriving on a LIVE
  * stream are checked against a STATIC benchmark suite by the same
  * word-[[graft.pipeline.Dedup.ShingleWords]]-gram overlap rule, and
  * every collision is emitted as a hit event (doc, benchmark doc,
  * shared shingle) the moment the doc lands — the alerting feed a
  * production intake runs, with the full batch operator still doing
  * the per-doc rollup offline.
  *
  * Built as a stream-static inner join: the benchmark side is an eval
  * suite (tiny by construction), so its exploded shingle index
  * broadcasts and the stream side stays a map-side probe —
  * STATELESS (no watermark, no state store), every micro-batch is one
  * codegen'd scan + broadcast-hash probe, exactly the batch
  * operator's 100 TB layout applied per batch.
  */
object StreamingDecontaminate {

  private def shingled(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("toks", filter(split(lower(col("text")), " "), t => length(t) > 0))
      .filter(size(col("toks")) >= Dedup.ShingleWords)
      .select(col(idCol), explode_outer(Dedup.wordShingles(col("toks"))).as("shingle"))
      .filter(col("shingle").isNotNull)

  /** Contamination hits of streaming `docs` (`doc_id`, `text`)
    * against static `benchmark` (`bench_id`, `text`): one row per
    * (arriving doc, benchmark doc, shared shingle). */
  def hits(docs: DataFrame, benchmark: DataFrame): DataFrame = {
    val index = shingled(benchmark, "bench_id")
    shingled(docs, "doc_id")
      .join(broadcast(index), Seq("shingle"))
      .select(col("doc_id"), col("bench_id"), col("shingle"))
  }
}
