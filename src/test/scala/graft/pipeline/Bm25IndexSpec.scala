package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bm25Index contract (SURVEY §2c): the stored sufficient statistic
  * must make incremental scoring IDENTICAL to the from-text batch
  * operator — write(base) + add(batch) + search ≡ bm25On(base ∪
  * batch), row for row, including after a replayed append; N must
  * count token-less docs (the NULL-row design); compact drops replay
  * duplicates without changing results and fails loudly on a mutated
  * re-ingest. */
class Bm25IndexSpec extends SparkSpec {

  // vocabulary drawn from the fixed Bm25Queries workload so scores hit
  private def corpus(): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "spark window agg spark"),
      (2L, "hash join merge table"),
      (3L, "fast table scan filter"),
      (4L, "stream batch data window"),
      (5L, "slow query filter sort"),
      (6L, "spark table window data"),
      (7L, "")                        // token-less: counts toward N only
    ).toDF("doc_id", "text")
  }

  private def rows(d: DataFrame): Seq[Seq[Any]] =
    d.collect().map(_.toSeq.toIndexedSeq).toIndexedSeq

  test("write + add (+ replayed add) + search ≡ the from-text batch operator") {
    val d = corpus()
    val want = rows(TextAnalysis.bm25On(d))
    assert(want.nonEmpty)
    val path = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Bm25Index.write(d.filter(col("doc_id") < 4), path)
    Bm25Index.add(d.filter(col("doc_id") >= 4), path)
    assert(rows(Bm25Index.search(spark, path)) == want)
    // at-least-once ingestion: replaying the append changes nothing
    Bm25Index.add(d.filter(col("doc_id") >= 4), path)
    assert(rows(Bm25Index.search(spark, path)) == want)
  }

  test("N counts token-less docs: dropping the empty doc moves scores") {
    val d = corpus()
    val withEmpty = rows(TextAnalysis.bm25On(d))
    val withoutEmpty = rows(TextAnalysis.bm25On(d.filter(col("doc_id") =!= 7L)))
    assert(withEmpty != withoutEmpty,
      "corpus doc count N must include token-less docs — idf/tf-norm should move")
  }

  test("compact drops replay duplicates, keeps results, rejects mutated re-ingest") {
    val d = corpus()
    val path = java.nio.file.Files.createTempDirectory("bm25idx_c").toString
    Bm25Index.write(d, path)
    Bm25Index.add(d.filter(col("doc_id") >= 4), path) // duplicate rows
    val before = rows(Bm25Index.search(spark, path))
    val rawBefore = spark.read.parquet(path).count()
    Bm25Index.compact(spark, path)
    assert(spark.read.parquet(path).count() < rawBefore)
    assert(rows(Bm25Index.search(spark, path)) == before)
    // a mutated re-ingest (same doc, different text → different tf)
    import spark.implicits._
    Bm25Index.add(Seq((1L, "spark spark spark")).toDF("doc_id", "text"), path)
    val ex = intercept[IllegalArgumentException](Bm25Index.compact(spark, path))
    assert(ex.getMessage.contains("rebuild"))
  }
}
