package graft

import org.apache.spark.sql.functions._

/** End-to-end corpus-build CLI smoke — the pipeline-family analogue of
  * ReplicateSpec: the composed dedup → decontaminate → quality → pack
  * run must write consistent non-empty outputs. */
class CorpusPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pipeline writes a packed corpus and a consistent retention report") {
    val out = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    val (nKept, n) = CorpusPipeline.run(spark, dir, out)
    assert(n > 0 && nKept > 0 && nKept <= n)

    val report = spark.read.parquet(s"$out/retention_report")
    val packed = spark.read.parquet(s"$out/corpus_packed")

    // every document got exactly one verdict
    assert(report.count() == n)
    assert(report.select(col("doc_id")).distinct().count() == n)

    // the packed corpus is exactly the kept docs (packing preserves them)
    val keptIds = report.filter(col("keep")).select(col("doc_id"))
    assert(packed.select(col("doc_id")).distinct().count() == keptIds.count())
    assert(packed.join(keptIds, Seq("doc_id"), "left_anti").isEmpty)

    // dropped docs carry a reason, kept docs are marked kept
    assert(report.filter(!col("keep") && col("reason") === "kept").isEmpty)
    val reasons = report.select(col("reason")).distinct().collect().map(_.getString(0)).toSet
    assert(reasons.contains("kept"))
  }
}
