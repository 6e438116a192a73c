package graft

/** Replicator CLI smoke — the reference's `--mode delta|preimage|
  * postimage` switch (scylla-cdc-replicator Main.java:111, Mode enum
  * :128-145) must route to the matching materialization and write
  * non-empty per-mode outputs. */
class ReplicateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("mode parser accepts the reference spellings and rejects junk") {
    assert(Replicate.parseMode(Seq.empty) == "delta")
    assert(Replicate.parseMode(Seq("--mode", "delta")) == "delta")
    assert(Replicate.parseMode(Seq("-m", "PRE_IMAGE")) == "preimage")
    assert(Replicate.parseMode(Seq("--mode", "preimage")) == "preimage")
    assert(Replicate.parseMode(Seq("--mode", "post_image")) == "postimage")
    intercept[IllegalStateException](Replicate.parseMode(Seq("--mode", "sideways")))
    intercept[IllegalArgumentException](Replicate.parseMode(Seq("--bogus", "delta")))
  }

  test("each mode writes its own non-empty outputs") {
    val out = java.nio.file.Files.createTempDirectory("replicate").toString
    val expected = Map(
      "delta" -> Seq(s"$out/destination_table", s"$out/destination_collections"),
      "preimage" -> Seq(s"$out/preimage_report"),
      "postimage" -> Seq(s"$out/postimage_table"))
    expected.foreach { case (mode, paths) =>
      assert(Replicate.run(spark, dir, out, mode) == paths)
      paths.foreach { p =>
        assert(spark.read.parquet(p).count() > 0, s"$mode wrote an empty $p")
      }
    }
  }

  test("written outputs equal the operators' frames, row for row") {
    // CONTENT equality, not counts: every mode's parquet must be
    // exactly the frame of the operator the mode routes to, computed
    // independently on the same log — the replicator adds plumbing,
    // never rows. (Multisets via grouped counts: the outputs carry no
    // uniqueness contract, and dropping to Set would mask duplicate or
    // lost rows with the same value.)
    def multiset(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.collect().groupBy(_.toSeq.map(v => if (v == null) "∅" else v.toString)
        .mkString("|")).view.mapValues(_.length.toLong).toMap
    def assertSameFrame(written: String, expected: org.apache.spark.sql.DataFrame,
        what: String): Unit = {
      val w = spark.read.parquet(written)
      assert(w.columns.toSeq == expected.columns.toSeq,
        s"$what schema drift: ${w.columns.toSeq} vs ${expected.columns.toSeq}")
      assert(multiset(w) == multiset(expected), s"$what content differs from its operator")
    }

    val out = java.nio.file.Files.createTempDirectory("replicate_content").toString
    val events = Tables.events(spark, dir)
    val log = cdc.CdcLogAdapter.fromEvents(events)

    Replicate.run(spark, dir, out, "delta")
    assertSameFrame(s"$out/destination_table",
      cdc.CdcOps.replicateFullFromLog(log), "delta destination")
    assertSameFrame(s"$out/destination_collections",
      cdc.CdcOps.collectionApplyFromLog(cdc.CdcLogAdapter.fromEventsWithCollections(events)),
      "delta collections")

    Replicate.run(spark, dir, out, "preimage")
    assertSameFrame(s"$out/preimage_report",
      cdc.CdcOps.preimageCheckFromLog(log), "preimage report")

    Replicate.run(spark, dir, out, "postimage")
    assertSameFrame(s"$out/postimage_table",
      cdc.CdcOps.postimageApplyFromLog(log), "postimage table")

    // and the delta destination is the LWW state wherever a row
    // survived: replicateFull interprets deletes on top of the same
    // last-writer-wins register semantics replicateLww proves
    val lww = cdc.CdcOps.replicateLwwFromLog(log)
    val full = spark.read.parquet(s"$out/destination_table")
    val joined = full.as("f").join(lww.as("l"),
      org.apache.spark.sql.functions.col("f.user_id") ===
        org.apache.spark.sql.functions.col("l.user_id"))
    assert(joined.count() > 0)
  }
}
