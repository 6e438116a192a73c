package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bm25Index contract (SURVEY §2c): the stored sufficient statistic
  * must make incremental scoring IDENTICAL to the from-text batch
  * operator — write(base) + add(batch) + search ≡ bm25On(base ∪
  * batch), row for row, including after a replayed append; N must
  * count token-less docs (the NULL-row design); compact drops replay
  * duplicates without changing results, flips the manifest so load
  * plans NO dedup exchange, parks the old edition through the swap,
  * and fails loudly on EVERY mutated re-ingest class (tf change,
  * token removal, emptied doc, same-length swap — the dl witness). */
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

  private def mutated(text: String) = {
    import spark.implicits._
    Seq((2L, text)).toDF("doc_id", "text")
  }

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

  test("compact drops replay duplicates, keeps results, and load skips the distinct") {
    val d = corpus()
    val path = java.nio.file.Files.createTempDirectory("bm25idx_c").toString
    Bm25Index.write(d, path)
    Bm25Index.add(d.filter(col("doc_id") >= 4), path) // duplicate rows
    // un-compacted load plans the dedup aggregate
    assert(loadAggregates(path) > 0, "pre-compact load must plan a distinct")
    val before = rows(Bm25Index.search(spark, path))
    val rawBefore = spark.read.parquet(s"$path/tf").count()
    Bm25Index.compact(spark, path)
    assert(spark.read.parquet(s"$path/tf").count() < rawBefore)
    assert(rows(Bm25Index.search(spark, path)) == before)
    // post-compact: the manifest says duplicate-free — NO dedup
    // exchange in the loaded relation's plan (the r12 verdict item)
    val m = Bm25Index.manifest(spark, path).head()
    assert(m.getAs[Boolean]("compacted"))
    assert(loadAggregates(path) == 0,
      "post-compact load must not plan a distinct exchange")
    // ... and the parked old edition is gone, swap complete
    assert(!new java.io.File(s"$path/tf_old").exists())
  }

  private def loadAggregates(path: String): Int =
    Bm25Index.load(spark, path).queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      case d: org.apache.spark.sql.catalyst.plans.logical.Deduplicate => d
    }.size

  test("compacted manifest + foreign append is refused, never double-counted") {
    val d = corpus()
    val path = java.nio.file.Files.createTempDirectory("bm25idx_f").toString
    Bm25Index.write(d, path)
    // rows landing OUTSIDE add() leave the compacted flag stale
    spark.read.parquet(s"$path/tf").limit(2)
      .write.mode("append").parquet(s"$path/tf")
    val ex = intercept[IllegalArgumentException](Bm25Index.load(spark, path))
    assert(ex.getMessage.contains("outside add()"))
  }

  test("a manifest-less index (mid-swap crash state) is refused") {
    val d = corpus()
    val path = java.nio.file.Files.createTempDirectory("bm25idx_m").toString
    Bm25Index.write(d, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/manifest"), true)
    intercept[Exception](Bm25Index.search(spark, path))
  }

  test("compact rejects every mutated re-ingest class via the dl witness") {
    val d = corpus() // doc 2 = "hash join merge table": all tf 1, dl 4
    def freshIndex(): String = {
      val path = java.nio.file.Files.createTempDirectory("bm25idx_w").toString
      Bm25Index.write(d, path)
      path
    }
    def expectReject(text: String, clue: String): Unit = {
      val path = freshIndex()
      Bm25Index.add(mutated(text), path)
      val ex = intercept[IllegalArgumentException](Bm25Index.compact(spark, path))
      assert(ex.getMessage.contains("rebuild"), clue)
    }
    // tf change on a shared token (the pre-r13 detectable class)
    expectReject("hash hash join merge table", "tf-change must be rejected")
    // pure token REMOVAL: shared tokens keep tf=1, only dl moves —
    // invisible without the witness column (the r12 ADVICE class)
    expectReject("hash join merge", "token-removal must be rejected")
    // emptied doc: no shared token at all, old rows vs fresh NULL row
    expectReject("", "emptied-doc re-ingest must be rejected")
    // same-length disjoint SWAP: dl unchanged, no shared token —
    // caught only by the per-doc sum(tf) = dl invariant
    expectReject("slow query scan stream", "same-length swap must be rejected")
    // and the idempotent case still merges silently: byte-identical
    val path = freshIndex()
    val before = rows(Bm25Index.search(spark, path))
    Bm25Index.add(mutated("hash join merge table"), path)
    Bm25Index.compact(spark, path)
    assert(rows(Bm25Index.search(spark, path)) == before)
  }
}
