package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted standing index must be a drop-in replacement for
  * [[Dedup.incremental]]'s recompute-everything admission: same
  * verdicts, but the corpus side is read from the stored
  * digest/signature relations — the corpus TEXT never participates. */
class DedupIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("admission from the stored index equals full recompute") {
    val docs = graft.Tables.documents(spark, dir)
    val m = Dedup.IncrementalMod
    val corpus = docs.filter(col("doc_id") % m =!= 0).select("doc_id", "text")
    val batch = docs.filter(col("doc_id") % m === 0).select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_dedup_index").toString

    DedupIndex.write(corpus, path)
    val idx = DedupIndex.load(spark, path)
    // the admitted frame is built from `batch` + index relations only —
    // the corpus text frame is not an input to admit()
    val got = DedupIndex.admit(batch, idx).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("reason"), r.getAs[Boolean]("keep")))
      .toSeq
    val expected = Dedup.incremental(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("reason"), r.getAs[Boolean]("keep")))
      .toSeq
    assert(got == expected)
    assert(expected.map(_._2).distinct.size > 1,
      s"degenerate fixture: all verdicts identical (${expected.map(_._2).distinct})")
  }

  test("update appends survivors; the next batch sees them as standing corpus") {
    import spark.implicits._
    val base = Seq.fill(5)("the quick brown fox jumps over the lazy dog").mkString(" ")
    val other = Seq.fill(5)("pack my box with five dozen liquor jugs today").mkString(" ")
    val path = java.nio.file.Files.createTempDirectory("graft_dedup_index2").toString

    DedupIndex.write(Seq((1L, base)).toDF("doc_id", "text"), path)

    // batch 1: one fresh doc, one exact dup of the corpus
    val batch1 = Seq((10L, other), (11L, base)).toDF("doc_id", "text")
    val v1 = DedupIndex.admit(batch1, DedupIndex.load(spark, path))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
    assert(v1 == Map(10L -> "kept", 11L -> "exact_corpus"))

    DedupIndex.update(batch1.filter(col("doc_id") === 10L), path)

    // batch 2 probes ONLY the stored index: doc 20 duplicates batch 1's
    // survivor exactly, doc 21 near-duplicates it, doc 22 is fresh
    val batch2 = Seq(
      (20L, other),
      (21L, other + " extra"),
      (22L, Seq.fill(5)("sphinx of black quartz judge my vow forever").mkString(" ")))
      .toDF("doc_id", "text")
    val v2 = DedupIndex.admit(batch2, DedupIndex.load(spark, path))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
    assert(v2 == Map(20L -> "exact_corpus", 21L -> "near_corpus", 22L -> "kept"))
  }

  test("compact drops replayed-append duplicates, keeps verdicts, collapses files") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0).select("doc_id", "text")
    val tail = docs.filter(col("doc_id") % 5 === 0).select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_dedup_compact").toString + "/idx"
    DedupIndex.write(corpus, path)
    DedupIndex.update(tail, path)
    val batch = Seq((900001L, "a fresh probe document about nothing at all")).toDF("doc_id", "text")
    val before = DedupIndex.admit(batch, DedupIndex.load(spark, path))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val nUnique = corpus.count() + tail.count()

    DedupIndex.update(tail, path) // replayed append: exact duplicate rows
    assert(spark.read.parquet(path).count() == nUnique + tail.count())

    val stats = DedupIndex.compact(spark, path)
    assert(stats.rowsBefore == nUnique + tail.count())
    assert(stats.rowsAfter == nUnique)
    assert(stats.filesAfter == 1L)
    assert(stats.filesAfter < stats.filesBefore)
    assert(spark.read.parquet(path).count() == nUnique)
    val after = DedupIndex.admit(batch, DedupIndex.load(spark, path))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == before)
  }

  test("compact refuses conflicting rows for one doc_id") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_dedup_conflict").toString + "/idx"
    DedupIndex.write(Seq((1L, "original text of document one here")).toDF("doc_id", "text"), path)
    // re-ingested mutated doc: same id, different digest/sig
    DedupIndex.update(Seq((1L, "mutated text of document one here")).toDF("doc_id", "text"), path)
    val e = intercept[IllegalArgumentException](DedupIndex.compact(spark, path))
    assert(e.getMessage.contains("rebuild"))
  }
}
