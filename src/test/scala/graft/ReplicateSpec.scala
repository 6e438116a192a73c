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
}
