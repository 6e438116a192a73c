package graft.pipeline

import graft.SparkSpec

/** mm_frame_dedup contract: per-sampled-frame aHash (sampling
  * respected, identical frames hash identically), bucketed pair
  * generation ≡ brute force at hamming ≤ 3, cross-video duplicate
  * frames found at hamming 0, same_video flag correct, undecodable
  * payloads contribute nothing. */
class FrameDedupSpec extends SparkSpec {

  private def clip(id: Long, w: Int, h: Int, shifts: Seq[Int]): Multimodal.VideoRow =
    Multimodal.VideoRow(id,
      MediaCodecs.encodeY4m(w, h,
        shifts.map(s => (x: Int, y: Int) => (x * 16 + y * 8 + s) % 256)),
      "y4m")

  test("frame hashes: sampling, identity, undecodable drop") {
    // 7 frames sampled every 3 → frames 0, 3, 6
    val fh = MediaCodecs.y4mFrameHashes(
      clip(1L, 16, 16, Seq(0, 10, 20, 30, 40, 50, 60)).payload, Multimodal.SampleEvery)
    assert(fh.isDefined)
    assert(fh.get.map(_._1) == Seq(0, 3, 6))
    // identical luma planes hash identically regardless of position
    val a = MediaCodecs.y4mFrameHashes(clip(1L, 16, 16, Seq(0, 99)).payload, 1).get
    val b = MediaCodecs.y4mFrameHashes(clip(2L, 16, 16, Seq(42, 0)).payload, 1).get
    assert(a.head._2 == b(1)._2, "same frame content must hash equal")
    assert(MediaCodecs.y4mFrameHashes("not a video".getBytes, 3).isEmpty)
  }

  test("bucketed pairs = brute force; cross-video dup found; same_video flag") {
    import spark.implicits._
    // videos 1 and 2 share frame content (shift 0) at different
    // positions; video 3 is unrelated structure; video 4 undecodable
    val vids = Seq(
      clip(1L, 16, 16, Seq(0, 80, 160)),
      clip(2L, 16, 16, Seq(0, 200, 120)),
      clip(3L, 16, 16, Seq(7, 91, 173)),
      Multimodal.VideoRow(4L, "mp4 garbage payload".getBytes, "mp4"))
    val ds = spark.createDataset(vids)

    val hashes = vids.flatMap { v =>
      MediaCodecs.y4mFrameHashes(v.payload, Multimodal.SampleEvery)
        .getOrElse(Seq.empty).map { case (f, h) => ((v.doc_id, f), h) }
    }.toMap
    val keys = hashes.keys.toSeq.sorted
    val expected = (for {
      a <- keys; b <- keys
      if a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if d <= Multimodal.ImageHammingMax
    } yield (a._1, a._2, b._1, b._2, d)).toSet

    val got = Multimodal.frameDedup(spark, ds).collect()
      .map(r => (r.getAs[Long]("doc_id_1"), r.getAs[Int]("frame_1"),
        r.getAs[Long]("doc_id_2"), r.getAs[Int]("frame_2"),
        r.getAs[Int]("hamming"))).toSet
    assert(got == expected, s"bucketed $got != brute force $expected")
    // videos 1 and 2 open with identical frame content → exact
    // cross-video duplicate at the sampled frame 0
    assert(got.contains((1L, 0, 2L, 0, 0)), "cross-video dup frame missed")

    val flags = Multimodal.frameDedup(spark, ds).collect()
      .map(r => ((r.getAs[Long]("doc_id_1"), r.getAs[Long]("doc_id_2")),
        r.getAs[Boolean]("same_video"))).toMap
    flags.foreach { case ((d1, d2), f) => assert(f == (d1 == d2)) }
    // undecodable video contributes no frames
    assert(!got.exists(p => p._1 == 4L || p._3 == 4L))
  }

  test("pipeline: runs over the corpus, threshold respected, mp4 docs silent") {
    val out = Multimodal.frameDedupPipeline(spark, "/root/testdata/sf0.001").collect()
    assert(out.forall(_.getAs[Int]("hamming") <= Multimodal.ImageHammingMax))
    // doc_id % 3 == 2 videos are the undecodable branch
    assert(out.forall(r => r.getAs[Long]("doc_id_1") % 3 != 2 &&
      r.getAs[Long]("doc_id_2") % 3 != 2))
  }
}
