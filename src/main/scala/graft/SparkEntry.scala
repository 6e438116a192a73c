package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.Queries
import graft.cdc.CdcOps
import graft.pipeline.{Dedup, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_log_adapter" -> CdcOps.logAdapter,
    "cdc_operation_decode" -> CdcOps.operationDecode,
    "cdc_stream_ordering" -> CdcOps.streamOrdering,
    "cdc_window_scan" -> CdcOps.windowScan,
    "cdc_generation_assign" -> CdcOps.generationAssign,
    "cdc_vnode_group" -> CdcOps.vnodeGroup,
    "cdc_replicate_lww" -> CdcOps.replicateLww,
    "cdc_partition_delete" -> CdcOps.partitionDelete,
    "cdc_range_delete" -> CdcOps.rangeDelete,
    "cdc_preimage_check" -> CdcOps.preimageCheck,
    "cdc_collection_apply" -> CdcOps.collectionApply,
    "cdc_postimage_apply" -> CdcOps.postimageApply,
    "cdc_checkpoint" -> CdcOps.checkpoint,
    "cdc_ttl_trim" -> CdcOps.ttlTrim,
    "cdc_batch_group" -> CdcOps.batchGroup,
    "cdc_replicate_full" -> CdcOps.replicateFull,
    "cdc_replicate_ttl" -> CdcOps.replicateTtl,
    "cdc_generation_progress" -> CdcOps.generationProgress,
    "q1_agg" -> Queries.q1Agg,
    "q_join_broadcast" -> Queries.qJoinBroadcast,
    "q_topk" -> Queries.qTopK,
    "q_window_funcs" -> Queries.qWindowFuncs,
    "q_sessionize" -> Queries.qSessionize,
    "q_event_pivot" -> Queries.qEventPivot,
    "q_json_extract" -> Queries.qJsonExtract,
    "q_rollup" -> Queries.qRollup,
    "q_median" -> Queries.qMedian,
    "q_anti_join" -> Queries.qAntiJoin,
    "q_asof_join" -> Queries.qAsofJoin,
    "dedup_exact" -> Dedup.exact,
    "dedup_exact_normalized" -> Dedup.exactNormalized,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccard,
    "dedup_clusters" -> Dedup.clusters,
    "dedup_minhash_lsh" -> Dedup.minhashLsh,
    "dedup_simhash" -> Dedup.simhashDedup,
    "dedup_embed_cosine" -> Dedup.embedCosine,
    "ann_bruteforce_topk" -> Similarity.annBruteForce,
    "ann_lsh_bucketed" -> Similarity.annLshBucketed,
    "ann_ivf" -> Similarity.annIvf,
    "text_langid" -> TextAnalysis.langId,
    "text_quality" -> TextAnalysis.quality,
    "text_tokencount" -> TextAnalysis.tokenCount,
    "text_length_histogram" -> TextAnalysis.lengthHistogram,
    "text_fingerprint" -> TextAnalysis.fingerprint)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "cdc_log_adapter" -> CdcOps.logAdapterSql,
    "cdc_operation_decode" -> CdcOps.operationDecodeSql,
    "cdc_stream_ordering" -> CdcOps.streamOrderingSql,
    "cdc_window_scan" -> CdcOps.windowScanSql,
    "cdc_generation_assign" -> CdcOps.generationAssignSql,
    "cdc_vnode_group" -> CdcOps.vnodeGroupSql,
    "cdc_replicate_lww" -> CdcOps.replicateLwwSql,
    "cdc_partition_delete" -> CdcOps.partitionDeleteSql,
    "cdc_range_delete" -> CdcOps.rangeDeleteSql,
    "cdc_preimage_check" -> CdcOps.preimageCheckSql,
    "cdc_collection_apply" -> CdcOps.collectionApplySql,
    "cdc_postimage_apply" -> CdcOps.postimageApplySql,
    "cdc_checkpoint" -> CdcOps.checkpointSql,
    "cdc_ttl_trim" -> CdcOps.ttlTrimSql,
    "cdc_batch_group" -> CdcOps.batchGroupSql,
    "cdc_replicate_full" -> CdcOps.replicateFullSql,
    "cdc_replicate_ttl" -> CdcOps.replicateTtlSql,
    "cdc_generation_progress" -> CdcOps.generationProgressSql,
    "q1_agg" -> Queries.q1AggSql,
    "q_join_broadcast" -> Queries.qJoinBroadcastSql,
    "q_topk" -> Queries.qTopKSql,
    "q_window_funcs" -> Queries.qWindowFuncsSql,
    "q_sessionize" -> Queries.qSessionizeSql,
    "q_event_pivot" -> Queries.qEventPivotSql,
    "q_json_extract" -> Queries.qJsonExtractSql,
    "q_rollup" -> Queries.qRollupSql,
    "q_median" -> Queries.qMedianSql,
    "q_anti_join" -> Queries.qAntiJoinSql,
    "q_asof_join" -> Queries.qAsofJoinSql,
    "dedup_exact" -> Dedup.exactSql,
    "dedup_exact_normalized" -> Dedup.exactNormalizedSql,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "dedup_clusters" -> Dedup.clustersSql,
    "dedup_minhash_lsh" -> Dedup.minhashLshSql,
    "dedup_simhash" -> Dedup.simhashDedupSql,
    "dedup_embed_cosine" -> Dedup.embedCosineSql,
    "ann_bruteforce_topk" -> Similarity.annBruteForceSql,
    "ann_lsh_bucketed" -> Similarity.annLshBucketedSql,
    "ann_ivf" -> Similarity.annIvfSql,
    "text_langid" -> TextAnalysis.langIdSql,
    "text_quality" -> TextAnalysis.qualitySql,
    "text_tokencount" -> TextAnalysis.tokenCountSql,
    "text_length_histogram" -> TextAnalysis.lengthHistogramSql,
    "text_fingerprint" -> TextAnalysis.fingerprintSql)
}
