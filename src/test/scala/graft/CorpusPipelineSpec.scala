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

  test("drop-reason precedence follows the documented stage order, not string sort") {
    import spark.implicits._
    // doc 1 fails heuristic quality AND the classifier — the report must
    // attribute the earlier stage (quality_*), even though
    // 'classifier_low_score' < 'quality_short' lexicographically
    val unioned = Seq(
      (1L, "quality_short"), (1L, "classifier_low_score"),
      (2L, "benchmark_overlap"), (2L, "quality_repetitive"),
      (2L, "classifier_low_score"),
      (3L, "classifier_low_score"),
      (4L, "quality_short"), (4L, "quality_repetitive")
    ).toDF("doc_id", "drop_reason")
    val got = CorpusPipeline.resolveDropReason(unioned)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "quality_short")
    assert(got(2L) == "benchmark_overlap")
    assert(got(3L) == "classifier_low_score")
    // ties inside one stage stay deterministic (lexicographic within stage)
    assert(got(4L) == "quality_repetitive")
  }
}
