package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spec for [[Multimodal]] — SURVEY.md §2c #35: binary column +
  * metadata plumbing with a stubbed decode. */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("attachBinary produces binary payload + typed metadata") {
    val media = Multimodal.attachBinary(graft.Tables.documents(spark, dir))
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("width").dataType.typeName == "integer")
    assert(schema("format").dataType.typeName == "string")
    val row = media.filter(col("doc_id") === 3).head()
    assert(row.getAs[String]("format") == "png") // 3 % 3 == 0
    assert(row.getAs[Int]("width") == (3 % 64) * 16 + 64)
  }

  test("real codecs: PPM/PGM round-trip through encode -> batch decode") {
    // direct codec round-trip: decoded dims and luma match the raster
    val ppm = MediaCodecs.encodePpm(4, 2, (x, y) => (10 * x, 20 * y, 30))
    val d = MediaCodecs.decode(ppm).get
    assert((d.format, d.width, d.height) == (("ppm", 4, 2)))
    val expected = (for { y <- 0 until 2; x <- 0 until 4 }
      yield 0.299 * (10 * x) + 0.587 * (20 * y) + 0.114 * 30).sum / 8 / 255.0
    assert(math.abs(d.meanLuma - expected) < 1e-12)
    val pgm = MediaCodecs.decode(MediaCodecs.encodePgm(3, 3, (x, y) => x + y)).get
    assert((pgm.format, pgm.width, pgm.height) == (("pgm", 3, 3)))
    // header comments are part of the netpbm spec
    val withComment = ("P5\n# a comment\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 100))
    assert(MediaCodecs.decode(withComment).get.width == 2)
    // foreign bytes refuse to decode
    assert(MediaCodecs.decode("not an image".getBytes).isEmpty)

    // end-to-end: netpbm payloads really decode, the codec-less branch
    // falls back with payload features
    val feats = Multimodal.pipelineReal(spark, dir).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      if (f.doc_id % 3 == 2) {
        assert(!f.decoded && f.format == "jpeg")
      } else {
        assert(f.decoded, s"doc ${f.doc_id}")
        assert(f.format == (if (f.doc_id % 3 == 0) "ppm" else "pgm"))
        // header-derived dims equal the generator's metadata
        assert(f.width == (f.doc_id % 8) * 4 + 8)
        assert(f.height == (f.doc_id % 6) * 4 + 8)
        assert(f.mean_luma > 0.0 && f.mean_luma < 1.0)
      }
    }
  }

  test("real WAV codec: PCM round-trip, chunk walking, and end-to-end audio") {
    // round-trip: a known constant signal has RMS |s|/32768
    val samples = Array.fill(1000)(16384.toShort)
    val d = MediaCodecs.decodeWav(MediaCodecs.encodeWavPcm16(44100, samples)).get
    assert((d.sampleRate, d.channels, d.bitsPerSample, d.nSamples) == ((44100, 1, 16, 1000)))
    assert(math.abs(d.rms - 0.5) < 1e-12)
    // silence
    assert(MediaCodecs.decodeWav(MediaCodecs.encodeWavPcm16(8000, Array.fill(10)(0.toShort))).get.rms == 0.0)
    // unknown chunks between fmt and data are skipped per the RIFF spec
    val wav = MediaCodecs.encodeWavPcm16(8000, Array[Short](100, -100))
    val withList = {
      val junk = "LIST".getBytes("US-ASCII") ++
        Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
      val out = new Array[Byte](wav.length + junk.length)
      System.arraycopy(wav, 0, out, 0, 36)            // RIFF..fmt chunk
      System.arraycopy(junk, 0, out, 36, junk.length) // interposed LIST
      System.arraycopy(wav, 36, out, 36 + junk.length, wav.length - 36)
      out
    }
    assert(MediaCodecs.decodeWav(withList).get.nSamples == 2)
    // foreign bytes refuse to decode
    assert(MediaCodecs.decodeWav("not audio at all".getBytes).isEmpty)
    assert(MediaCodecs.decodeWav(MediaCodecs.encodePgm(2, 2, (_, _) => 0)).isEmpty)

    // end-to-end: WAV payloads really decode, mp3 branch falls back
    val feats = Multimodal.audioPipeline(spark, dir).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      if (f.doc_id % 3 == 2) assert(!f.decoded && f.format == "mp3")
      else {
        assert(f.decoded, s"doc ${f.doc_id}")
        assert(f.sample_rate == 8000 + (f.doc_id % 4) * 4000)
        assert(f.n_samples == 400 + (f.doc_id % 10) * 40)
        assert(f.duration_ms == f.n_samples * 1000.0 / f.sample_rate)
        assert(f.rms > 0.0 && f.rms < 1.0)
      }
    }
  }

  test("real y4m codec: header parse, frame sampling, end-to-end video") {
    // 2 frames of constant luma 100 and 200 at 4x4
    val clip = MediaCodecs.encodeY4m(4, 4,
      Seq((_, _) => 100, (_, _) => 200, (_, _) => 50, (_, _) => 250))
    val d = MediaCodecs.decodeY4m(clip, sampleEvery = 3).get
    assert((d.width, d.height, d.nFrames) == ((4, 4, 4)))
    // frames 0 and 3 sampled; 1 and 2 skipped untouched
    assert(d.sampledFrames == Seq(0, 3))
    assert(math.abs(d.sampledMeanLuma.head - 100.0 / 255.0) < 1e-12)
    assert(math.abs(d.sampledMeanLuma(1) - 250.0 / 255.0) < 1e-12)
    // sampling every frame reads all of them
    assert(MediaCodecs.decodeY4m(clip, sampleEvery = 1).get.sampledFrames == Seq(0, 1, 2, 3))
    // foreign bytes / truncated clips refuse to decode
    assert(MediaCodecs.decodeY4m("not a video".getBytes, 1).isEmpty)
    assert(MediaCodecs.decodeY4m(clip.dropRight(5), 1).isEmpty)

    // end-to-end: y4m payloads decode with sampled luma, mp4 falls back
    val feats = Multimodal.videoPipeline(spark, dir).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      if (f.doc_id % 3 == 2) assert(!f.decoded && f.format == "mp4")
      else {
        assert(f.decoded, s"doc ${f.doc_id}")
        assert(f.width == (f.doc_id % 4) * 4 + 8)
        assert(f.height == (f.doc_id % 3) * 4 + 8)
        assert(f.n_frames == 4 + f.doc_id % 6)
        assert(f.n_sampled == (f.n_frames + Multimodal.SampleEvery - 1) / Multimodal.SampleEvery)
        assert(f.mean_luma > 0.0 && f.mean_luma < 1.0)
      }
    }
  }

  test("image near-dup: aHash buckets find exactly the pairs at hamming <= 3") {
    import spark.implicits._
    // a 16x16 gradient, an identical copy, a one-cell perturbation,
    // and a structurally different image
    def grad(x: Int, y: Int): Int = (x * 16 + y * 2) % 256
    def gradFlipped(x: Int, y: Int): Int =
      if (x < 2 && y < 2) 255 - grad(x, y) else grad(x, y) // one 8x8-grid cell
    val imgs = Seq(
      Multimodal.MediaRow(1L, MediaCodecs.encodePgm(16, 16, grad), 16, 16, "pgm"),
      Multimodal.MediaRow(2L, MediaCodecs.encodePgm(16, 16, grad), 16, 16, "pgm"),
      Multimodal.MediaRow(3L, MediaCodecs.encodePgm(16, 16, gradFlipped), 16, 16, "pgm"),
      Multimodal.MediaRow(4L, MediaCodecs.encodePgm(16, 16, (x, y) => ((x ^ y) * 37) % 256), 16, 16, "pgm"),
      Multimodal.MediaRow(5L, "not an image".getBytes("UTF-8"), 4, 3, "jpeg"))
    val media = imgs.toDF()

    val hashes = Multimodal.imageHashes(spark, media).collect()
      .map(h => h.doc_id -> h.ahash).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L, 4L)) // undecodable dropped
    assert(hashes(1L) == hashes(2L))

    // reference: brute-force hamming over all decodable pairs
    val expected = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if d <= Multimodal.ImageHammingMax
    } yield (a, b, d)).toSet
    assert(expected.contains((1L, 2L, 0)), "exact dup must be at hamming 0")

    val got = Multimodal.imageDedup(spark, media).collect()
      .map(r => (r.getAs[Long]("doc_id_1"), r.getAs[Long]("doc_id_2"),
        r.getAs[Int]("hamming"))).toSet
    assert(got == expected, s"bucketed pairs $got != brute force $expected")

    // end-to-end over the synthesized corpus images: runs, and every
    // reported pair respects the threshold
    val e2e = Multimodal.imageDedupPipeline(spark, dir).collect()
    assert(e2e.forall(_.getAs[Int]("hamming") <= Multimodal.ImageHammingMax))
  }

  test("hot image hash capped: flat-image flood emits zero pairs, cap is loud") {
    import spark.implicits._
    // 60 byte-identical flat images (the real-corpus hot case: solid
    // color / letterbox fills) — one shared aHash with df = 60 >
    // MaxHashDf, so uncapped pairing would emit C(60,2) = 1,770 pairs.
    // One genuine near-dup pair on a DISTINCT hash must survive.
    def grad(x: Int, y: Int): Int = (x * 16 + y * 2) % 256
    val flood = (1L to 60L).map(i =>
      Multimodal.MediaRow(i, MediaCodecs.encodePgm(16, 16, (_, _) => 7), 16, 16, "pgm"))
    val media = (flood ++ Seq(
      Multimodal.MediaRow(100L, MediaCodecs.encodePgm(16, 16, grad), 16, 16, "pgm"),
      Multimodal.MediaRow(101L, MediaCodecs.encodePgm(16, 16, grad), 16, 16, "pgm"))).toDF()

    val got = Multimodal.imageDedup(spark, media).collect()
      .map(r => (r.getAs[Long]("doc_id_1"), r.getAs[Long]("doc_id_2"),
        r.getAs[Int]("hamming"))).toSet
    assert(got == Set((100L, 101L, 0)), s"flood leaked pairs: $got")
    // the drop is reported, not silent
    val (kept, hot) = Multimodal.capHotHashes(
      Multimodal.imageHashes(spark, media).toDF(), "ahash")
    assert(hot.collect().map(_.getAs[Long]("df")).toSeq == Seq(60L))
    assert(kept.count() == 2L)
  }

  test("pHash: encoding/contrast invariant, noise-robust, bucketed pairs = brute force") {
    import spark.implicits._
    def grad(x: Int, y: Int): Int = (x * 8 + y * 4) % 200
    // same luma as PGM and as gray PPM; contrast-scaled copy; a copy
    // under salt-and-pepper noise at isolated pixels; an unrelated
    // structure; an undecodable payload
    def noisy(x: Int, y: Int): Int =
      if ((x * 31 + y * 17) % 97 == 0) math.min(255, grad(x, y) + 25) else grad(x, y)
    val imgs = Seq(
      Multimodal.MediaRow(1L, MediaCodecs.encodePgm(32, 32, grad), 32, 32, "pgm"),
      Multimodal.MediaRow(2L, MediaCodecs.encodePpm(32, 32, (x, y) => (grad(x, y), grad(x, y), grad(x, y))), 32, 32, "ppm"),
      Multimodal.MediaRow(3L, MediaCodecs.encodePgm(32, 32, (x, y) => grad(x, y) / 2), 32, 32, "pgm"),
      Multimodal.MediaRow(4L, MediaCodecs.encodePgm(32, 32, noisy), 32, 32, "pgm"),
      Multimodal.MediaRow(5L, MediaCodecs.encodePgm(32, 32, (x, y) => ((x ^ y) * 37) % 256), 32, 32, "pgm"),
      Multimodal.MediaRow(6L, "not an image".getBytes("UTF-8"), 4, 3, "jpeg"))
    val media = imgs.toDF()
    val ph = Multimodal.imagePhashes(spark, media).collect()
      .map(h => h.doc_id -> h.phash).toMap
    assert(ph.keySet == Set(1L, 2L, 3L, 4L, 5L)) // undecodable dropped
    // PGM and gray PPM of the SAME luma hash identically; BT.601 of
    // (g,g,g) is g exactly
    assert(ph(1L) == ph(2L))
    // halving contrast preserves every coefficient comparison
    assert(ph(1L) == ph(3L))
    // isolated-pixel noise stays within the near-dup threshold for
    // the low-frequency hash
    assert(java.lang.Long.bitCount(ph(1L) ^ ph(4L)) <= Multimodal.ImageHammingMax,
      s"noise moved pHash too far: ${java.lang.Long.bitCount(ph(1L) ^ ph(4L))}")
    // unrelated structure is far away
    assert(java.lang.Long.bitCount(ph(1L) ^ ph(5L)) > Multimodal.ImageHammingMax)

    // bucketed pair generation is exactly brute force at <= threshold
    val expected = (for {
      a <- ph.keys; b <- ph.keys if a < b
      d = java.lang.Long.bitCount(ph(a) ^ ph(b)) if d <= Multimodal.ImageHammingMax
    } yield (a, b, d)).toSet
    val got = Multimodal.imagePhashDedup(spark, media).collect()
      .map(r => (r.getAs[Long]("doc_id_1"), r.getAs[Long]("doc_id_2"),
        r.getAs[Int]("hamming"))).toSet
    assert(got == expected, s"bucketed pHash pairs $got != brute force $expected")

    // end-to-end over the synthesized corpus: runs and respects the threshold
    val e2e = Multimodal.imagePhashPipeline(spark, dir).collect()
    assert(e2e.nonEmpty)
    assert(e2e.forall(_.getAs[Int]("hamming") <= Multimodal.ImageHammingMax))
  }

  test("stubbed decode emits deterministic features with real batch plumbing") {
    val feats = Multimodal.pipeline(spark, dir)
    val rows = feats.collect()
    assert(rows.length == 500)
    // n_bytes equals the utf-8 length of the original text
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.take(50).foreach { f =>
      assert(f.n_bytes == docs(f.doc_id), s"doc ${f.doc_id}")
      assert(f.mean_luma >= 0.0 && f.mean_luma <= 1.0)
    }
    // determinism: same checksum on re-run
    val again = Multimodal.pipeline(spark, dir).collect()
    assert(rows.map(f => f.doc_id -> f.checksum).toMap ==
      again.map(f => f.doc_id -> f.checksum).toMap)
  }
}
