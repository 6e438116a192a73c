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

  test("1000 identical frames: hot hash capped, output bounded, cap reported") {
    import spark.implicits._
    // one clip of 1000 IDENTICAL frames (a static scene / black-frame
    // stand-in): 334 sampled frames share one hash, so uncapped
    // pairing would emit C(334,2) = 55,611 intra-clip pairs — the f²
    // blow-up the df-cap exists to stop. Two small clips sharing a
    // DISTINCT frame (df = 2) must still pair.
    val vids = Seq(
      clip(1L, 16, 16, Seq.fill(1000)(5)),
      clip(100L, 16, 16, Seq(33)),
      clip(101L, 16, 16, Seq(33)))
    val ds = spark.createDataset(vids)

    val hotHash = MediaCodecs.y4mFrameHashes(vids.head.payload, Multimodal.SampleEvery)
      .get.head._2
    val out = Multimodal.frameDedup(spark, ds).collect()
    // every pair involving the hot hash is dropped: nothing from doc 1
    assert(!out.exists(r => r.getAs[Long]("doc_id_1") == 1L ||
      r.getAs[Long]("doc_id_2") == 1L),
      s"hot-hash frames leaked ${out.length} pairs")
    // the non-hot duplicate survives the cap
    assert(out.map(r => (r.getAs[Long]("doc_id_1"), r.getAs[Long]("doc_id_2"),
      r.getAs[Int]("hamming"))).toSet == Set((100L, 101L, 0)))
    // and the drop is LOUD: the capped hash is reported with its df
    val (_, hot) = Multimodal.capHotHashes(
      Multimodal.frameHashes(spark, ds).toDF(), "fhash")
    val report = hot.collect().map(r => (r.getAs[Long]("fhash"), r.getAs[Long]("df")))
    assert(report.toSeq == Seq((hotHash, 334L)), s"cap report wrong: ${report.toSeq}")
  }

  test("per-video rollup ties to the capped pair set; intra-video dups excluded") {
    import spark.implicits._
    // video 1: 7 frames, sampled 0/3/6; video 2's single frame matches
    // video 1's frame 0 exactly; video 3 unrelated; video 4 undecodable
    val vids = Seq(
      clip(1L, 16, 16, Seq(0, 1, 2, 80, 4, 5, 160)),
      clip(2L, 16, 16, Seq(0)),
      // structurally unrelated pattern (the image tests' far-away case)
      Multimodal.VideoRow(3L, MediaCodecs.encodeY4m(16, 16,
        Seq.fill(4)((x: Int, y: Int) => ((x ^ y) * 37) % 256)), "y4m"),
      Multimodal.VideoRow(4L, "mp4 garbage".getBytes, "mp4"))
    val ds = spark.createDataset(vids)

    // brute-force expectation: sampled counts PRE-cap, dup frames from
    // the CROSS-video pairs of the capped hash set at hamming <= 3
    val fh = vids.flatMap { v =>
      MediaCodecs.y4mFrameHashes(v.payload, Multimodal.SampleEvery)
        .getOrElse(Seq.empty).map { case (f, h) => ((v.doc_id, f), h) }
    }
    val hot = fh.groupBy(_._2).collect { case (h, g) if g.size > Multimodal.MaxHashDf => h }.toSet
    val kept = fh.filterNot(p => hot(p._2)).toMap
    val keys = kept.keys.toSeq.sorted
    val dupFrames = (for {
      a <- keys; b <- keys
      if a._1 != b._1 && java.lang.Long.bitCount(kept(a) ^ kept(b)) <= Multimodal.ImageHammingMax
      k <- Seq(a, b)
    } yield k).toSet
    val expected = fh.groupBy(_._1._1).map { case (doc, frames) =>
      val dups = frames.count(p => dupFrames(p._1))
      doc -> (frames.size.toLong, dups.toLong,
        BigDecimal(dups.toDouble / frames.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }

    val got = Multimodal.frameRollup(spark, ds).collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("sampled_frames"),
        r.getAs[Long]("dup_frames"), r.getAs[Double]("dup_fraction")))).toMap
    assert(got == expected, s"rollup $got != brute force $expected")
    // the known shape: video 2 is fully duplicated, video 3 not at all
    assert(got(2L) == ((1L, 1L, 1.0)))
    assert(got(3L)._2 == 0L && got(3L)._3 == 0.0)
    // intra-video exclusion: video 1 has 3 sampled frames but only its
    // frame 0 (matched by video 2) counts as duplicated
    assert(got(1L) == ((3L, 1L, 0.333333)))
    assert(!got.contains(4L))
  }

  test("rollup flags cap-suppressed videos: static re-uploads show capped_frames, not novelty") {
    import spark.implicits._
    // two re-uploads of a fully static clip: every sampled frame (30
    // per clip) carries ONE hash with corpus df = 60 > MaxHashDf, so
    // the pair stage emits nothing — dup_fraction is 0 BY CONSTRUCTION
    // and only capped_frames tells the truth. A third, ordinary clip
    // must show zero capped frames.
    val static = Seq.fill(90)(7)
    val vids = Seq(
      clip(1L, 16, 16, static), clip(2L, 16, 16, static),
      // structurally unrelated pattern so its aHash cannot collide
      // with the gradient family (gradient aHashes are shift-invariant
      // until pixels wrap)
      Multimodal.VideoRow(3L, MediaCodecs.encodeY4m(16, 16,
        Seq.fill(3)((x: Int, y: Int) => ((x ^ y) * 37) % 256)), "y4m"))
    val got = Multimodal.frameRollup(spark, spark.createDataset(vids)).collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("sampled_frames"),
        r.getAs[Long]("dup_frames"), r.getAs[Long]("capped_frames"),
        r.getAs[Double]("dup_fraction")))).toMap
    assert(got(1L) == ((30L, 0L, 30L, 0.0)), s"got $got")
    assert(got(2L) == ((30L, 0L, 30L, 0.0)))
    // the ordinary clip: no capped hashes — a 0 dup_fraction here IS novelty
    assert(got(3L)._3 == 0L)
    // and the cross-video pair output itself stayed bounded (the
    // df-cap's point: 60 shared-hash frames would otherwise emit
    // ~900 cross pairs)
    assert(Multimodal.frameDedupFromHashes(
      Multimodal.frameHashes(spark, spark.createDataset(vids)).toDF())
      .filter(!org.apache.spark.sql.functions.col("same_video")).count() == 0L)
  }

  test("pipeline: runs over the corpus, threshold respected, mp4 docs silent") {
    val out = Multimodal.frameDedupPipeline(spark, "/root/testdata/sf0.001").collect()
    assert(out.forall(_.getAs[Int]("hamming") <= Multimodal.ImageHammingMax))
    // doc_id % 3 == 2 videos are the undecodable branch
    assert(out.forall(r => r.getAs[Long]("doc_id_1") % 3 != 2 &&
      r.getAs[Long]("doc_id_2") % 3 != 2))
  }
}
