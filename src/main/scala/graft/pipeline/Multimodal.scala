package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2c #35): treat image/audio
  * payloads as opaque `binary` columns with typed metadata, and run
  * feature extraction as a partition-batched transform.
  *
  * The decode step is REAL for netpbm formats — [[MediaCodecs]]
  * parses binary PPM/PGM payloads (header + raster) and computes true
  * dimensions and mean luma. Formats needing native codecs this
  * container lacks (jpeg et al.) take the undecodable branch with
  * payload-level features only; swapping in a JNI codec there changes
  * no plan shape. Spark-side everything is real: the schema (binary +
  * metadata), the partitioning (repartition on a content key so one
  * executor batches related payloads), and the batch shape (a
  * `mapPartitions` over typed rows, the Scala analogue of
  * `mapInPandas`: one iterator in, one iterator out, no per-row
  * driver involvement).
  */
object Multimodal {

  /** A row carrying an opaque media payload + typed metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte],
      width: Int, height: Int, format: String)

  /** Extracted features: payload stats always; decoded=true adds
    * header-derived dimensions and true mean luma. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
      width: Int, height: Int, format: String, mean_luma: Double,
      decoded: Boolean)

  /** Attach a synthetic binary payload + metadata to `documents`:
    * the utf-8 bytes of `text` stand in for encoded media; metadata is
    * derived deterministically (so specs can assert on it). */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      ((col("doc_id") % 64) * 16 + 64).cast("int").as("width"),
      ((col("doc_id") % 48) * 16 + 48).cast("int").as("height"),
      when(col("doc_id") % 3 === 0, "png").when(col("doc_id") % 3 === 1, "jpeg")
        .otherwise("webp").as("format"))

  /** Attach REAL encoded images: deterministic gradient rasters as
    * binary PPM (doc_id%3==0), PGM (==1), or — the codec-less branch —
    * the raw text bytes labeled "jpeg" (==2). Small dims (≤ 36×28) so
    * a corpus row stays KB-sized; a lakehouse stores the same schema
    * with MB payloads. */
  def attachMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val w = ((id % 8) * 4 + 8).toInt
      val h = ((id % 6) * 4 + 8).toInt
      val payload = (id % 3) match {
        case 0 => MediaCodecs.encodePpm(w, h, (x, y) =>
          (((x + id) % 256).toInt, ((y + id) % 256).toInt, (x + y) % 256))
        case 1 => MediaCodecs.encodePgm(w, h, (x, y) => ((x * y + id) % 256).toInt)
        case _ => text.getBytes("UTF-8")
      }
      val format = (id % 3) match {
        case 0 => "ppm"; case 1 => "pgm"; case _ => "jpeg"
      }
      MediaRow(id, payload, w, h, format)
    }.toDF()
  }

  /** Batch decode: whole-partition iterator (codec/model init once per
    * partition, exactly like mapInPandas batches). Netpbm payloads get
    * REAL parsing — header dims + true mean luma; others fall back to
    * payload-level features (decoded=false). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real per-partition init slot (models, JNI codecs) lives here
      rows.map { r =>
        val checksum = r.payload.foldLeft(0L)((acc, b) => (acc * 131 + (b & 0xff)) % 2147483647L)
        MediaCodecs.decode(r.payload) match {
          case Some(d) =>
            MediaFeatures(r.doc_id, r.payload.length.toLong, checksum,
              d.width, d.height, d.format, d.meanLuma, decoded = true)
          case None =>
            val luma = if (r.payload.isEmpty) 0.0
              else r.payload.map(b => (b & 0xff).toDouble).sum / r.payload.length / 255.0
            MediaFeatures(r.doc_id, r.payload.length.toLong, checksum,
              r.width, r.height, r.format, luma, decoded = false)
        }
      }
    }
  }

  /** End-to-end over the stand-in payloads (kept for the stub-path
    * compatibility surface). */
  def pipeline(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    val media = attachBinary(graft.Tables.documents(spark, dir))
      .repartition(col("format"))
    decodeFeatures(spark, media)
  }

  /** End-to-end with REAL encoded images: attach → repartition by
    * content key (co-locates payloads sharing a decode context) →
    * batch-decode. */
  def pipelineReal(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    val media = attachMedia(spark, graft.Tables.documents(spark, dir))
      .repartition(col("format"))
    decodeFeatures(spark, media)
  }

  /** A row carrying an opaque audio payload + declared metadata. */
  case class AudioRow(doc_id: Long, payload: Array[Byte], format: String)

  /** Extracted audio features: payload stats always; decoded=true adds
    * container-derived sample rate / length / RMS amplitude. */
  case class AudioFeatures(doc_id: Long, n_bytes: Long, format: String,
      sample_rate: Int, n_samples: Long, duration_ms: Double, rms: Double,
      decoded: Boolean)

  /** Attach REAL encoded audio: deterministic integer triangle waves
    * as RIFF/WAV PCM-16 (doc_id%3 != 2) or — the codec-less branch —
    * raw text bytes labeled "mp3" (==2). Integer waveform generation
    * (no trig) keeps every byte reproducible across partitionings. */
  def attachAudio(spark: SparkSession, docs: DataFrame): Dataset[AudioRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      if (id % 3 == 2) AudioRow(id, text.getBytes("UTF-8"), "mp3")
      else {
        val n = (400 + (id % 10) * 40).toInt
        val period = (16 + (id % 32)).toInt
        val samples = Array.tabulate(n) { i =>
          // triangle wave in [-8192, 8192]
          val phase = i % period
          val tri = math.abs(phase * 4 - period * 2) - period
          (tri * 8192 / period).toShort
        }
        AudioRow(id, MediaCodecs.encodeWavPcm16(8000 + (id % 4).toInt * 4000, samples), "wav")
      }
    }
  }

  /** Batch audio decode — same mapPartitions shape as
    * [[decodeFeatures]]: WAV payloads get REAL RIFF parsing (rate,
    * samples, RMS); codec-bound formats fall back to payload-level
    * stats (decoded=false). */
  def audioFeatures(spark: SparkSession, audio: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    import spark.implicits._
    audio.mapPartitions { rows =>
      rows.map { r =>
        MediaCodecs.decodeWav(r.payload) match {
          case Some(d) =>
            AudioFeatures(r.doc_id, r.payload.length.toLong, "wav",
              d.sampleRate, d.nSamples.toLong,
              d.nSamples.toDouble * 1000.0 / d.sampleRate, d.rms, decoded = true)
          case None =>
            AudioFeatures(r.doc_id, r.payload.length.toLong, r.format,
              0, 0L, 0.0, 0.0, decoded = false)
        }
      }
    }
  }

  /** End-to-end audio pipeline: attach → repartition by format →
    * batch-decode. */
  def audioPipeline(spark: SparkSession, dir: String): Dataset[AudioFeatures] = {
    import spark.implicits._
    val audio = attachAudio(spark, graft.Tables.documents(spark, dir))
      .repartition(col("format")).as[AudioRow]
    audioFeatures(spark, audio)
  }

  /** A row carrying an opaque video payload + declared metadata. */
  case class VideoRow(doc_id: Long, payload: Array[Byte], format: String)

  /** Frame-sampled video features: container stats always;
    * decoded=true adds true dims, frame count and the sampled frames'
    * mean luma (only sampled frames are ever read). */
  case class VideoFeatures(doc_id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, n_frames: Int, n_sampled: Int,
      mean_luma: Double, decoded: Boolean)

  /** Every SampleEvery-th frame is fully decoded; the rest are skipped
    * by plane arithmetic. */
  val SampleEvery = 3

  /** Attach REAL encoded video: deterministic moving-gradient y4m
    * clips (doc_id%3 != 2) or raw text bytes labeled "mp4" (==2, the
    * codec-less branch). Tiny dims/frame counts keep rows KB-sized;
    * the lakehouse schema is identical with GB payloads. */
  def attachVideo(spark: SparkSession, docs: DataFrame): Dataset[VideoRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      if (id % 3 == 2) VideoRow(id, text.getBytes("UTF-8"), "mp4")
      else {
        val w = ((id % 4) * 4 + 8).toInt
        val h = ((id % 3) * 4 + 8).toInt
        val nFrames = (4 + id % 6).toInt
        val frames = (0 until nFrames).map { t => (x: Int, y: Int) =>
          ((x * 8 + y * 4 + t * 16 + id) % 256).toInt
        }
        VideoRow(id, MediaCodecs.encodeY4m(w, h, frames), "y4m")
      }
    }
  }

  /** Batch frame-sampled decode — same mapPartitions shape as the
    * image/audio paths. */
  def videoFeatures(spark: SparkSession, video: Dataset[VideoRow]): Dataset[VideoFeatures] = {
    import spark.implicits._
    video.mapPartitions { rows =>
      rows.map { r =>
        MediaCodecs.decodeY4m(r.payload, SampleEvery) match {
          case Some(d) =>
            val mean = if (d.sampledMeanLuma.isEmpty) 0.0
              else d.sampledMeanLuma.sum / d.sampledMeanLuma.length
            VideoFeatures(r.doc_id, r.payload.length.toLong, "y4m",
              d.width, d.height, d.nFrames, d.sampledFrames.length, mean,
              decoded = true)
          case None =>
            VideoFeatures(r.doc_id, r.payload.length.toLong, r.format,
              0, 0, 0, 0, 0.0, decoded = false)
        }
      }
    }
  }

  /** End-to-end video pipeline: attach → repartition by format →
    * frame-sampled batch decode. */
  def videoPipeline(spark: SparkSession, dir: String): Dataset[VideoFeatures] = {
    import spark.implicits._
    val video = attachVideo(spark, graft.Tables.documents(spark, dir))
      .repartition(col("format")).as[VideoRow]
    videoFeatures(spark, video)
  }

  // ------------------------------------------------------------ image near-dup

  /** Per-image perceptual hash (None → undecodable payload). */
  case class ImageHash(doc_id: Long, ahash: Long)

  /** Maximum hamming distance for an image near-dup pair. With the
    * four 16-bit blocks below, pigeonhole GUARANTEES any pair at
    * hamming ≤ 3 shares at least one exact block — no qualifying pair
    * can be missed (same argument as dedup_simhash's 3-block cover). */
  val ImageHammingMax = 3

  /** Hot-hash frequency cap — the [[graft.pipeline.Dedup.MaxShingleDf]]
    * precedent (ngram_jaccard drops shingles with df > 50 BEFORE
    * pairing) applied to the media hashes: a hash carried by more than
    * this many images/frames is excluded from pair generation before
    * the block self-join. On real corpora degenerate hashes are the
    * norm, not the exception — black/letterbox/static frames and flat
    * single-color images all hash IDENTICALLY, and a hash shared by f
    * rows emits f² output pairs that no join strategy can split (AQE
    * fixes the shuffle skew, not the output cardinality). Per the
    * repo's no-silent-caps rule the drop is loud: [[hashCaps]] reports
    * every capped hash with its frequency, and every pair operator
    * shares [[capHotHashes]] so the cap can never drift per-family. */
  val MaxHashDf = 50

  /** Split `hashes` into (kept, hot): rows whose FULL hash value has
    * corpus frequency > [[MaxHashDf]] go to `hot` (hash, df) and are
    * excluded from pairing. One count shuffle on the hash value + a
    * left-anti equi-join — no broadcast hint: `hot`'s cardinality is
    * data-dependent (≤ |corpus|/df in hashes, but unbounded in rows
    * joined), so AQE decides the strategy at runtime. */
  private[pipeline] def capHotHashes(hashes: DataFrame, hcol: String): (DataFrame, DataFrame) = {
    val hot = hashes.groupBy(col(hcol))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > MaxHashDf)
    (hashes.join(hot.select(col(hcol)), Seq(hcol), "left_anti"), hot)
  }

  /** aHash per decodable image — one `mapPartitions` batch pass (the
    * codec-init-once shape), undecodables dropped. */
  def imageHashes(spark: SparkSession, media: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap(r => MediaCodecs.averageHash(r.payload).map(ImageHash(r.doc_id, _)))
    }
  }

  /** Image near-dup pairs over any media frame — the multimodal twin
    * of dedup_simhash: 64-bit aHash (map-side), candidates generated
    * by exact match on any of four 16-bit hash blocks (shuffle on
    * (block_idx, block_value) only — never all-pairs), then the exact
    * hamming filter at ≤ [[ImageHammingMax]]. Pigeonhole makes the
    * block cover complete, so the output is EXACTLY all pairs at
    * hamming ≤ 3 — the bucketing changes cost, not results.
    *
    * At lakehouse scale the payload column never shuffles: hashes are
    * 8 bytes/row, the block explode is ×4 on (id, hash), and a hot
    * hash (e.g. flat single-color images) is CAPPED before pairing
    * ([[capHotHashes]], df > [[MaxHashDf]]) — exactly ngram_jaccard's
    * df-cap, so a degenerate hash shared by f images can never emit
    * its f² pairs; residual join-input skew is AQE's job. */
  def imageDedup(spark: SparkSession, media: DataFrame): DataFrame =
    hammingPairs(imageHashes(spark, media).toDF(), "ahash")

  /** The shared pigeonhole pair generator over a 64-bit hash column:
    * hot hashes capped ([[capHotHashes]]), then candidates by exact
    * match on any of four 16-bit blocks (shuffle on
    * (block_idx, block_value) only), exact hamming filter at
    * ≤ [[ImageHammingMax]] — complete by the pigeonhole cover OVER THE
    * CAPPED HASH SET (pairs touching a hash with df > [[MaxHashDf]]
    * are dropped by design and reported via [[hashCaps]]). */
  private def hammingPairs(hashes: DataFrame, hcol: String): DataFrame = {
    val (kept, _) = capHotHashes(hashes, hcol)
    val blocks = kept.select(col("doc_id"), col(hcol).as("h"),
        explode(expr("sequence(0, 3)")).as("block_idx"))
      .withColumn("block_val", expr("shiftright(h, block_idx * 16) & 65535"))
    blocks.as("a").join(blocks.as("b"),
        col("a.block_idx") === col("b.block_idx") &&
          col("a.block_val") === col("b.block_val") &&
          col("a.doc_id") < col("b.doc_id"))
      // a pair can share several blocks — dedupe before the exact filter
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"),
        col("a.h").as("h1"), col("b.h").as("h2"))
      .distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= ImageHammingMax)
      .select(col("doc_id_1"), col("doc_id_2"), col("hamming"))
      .orderBy(col("doc_id_1"), col("doc_id_2"))
  }

  /** End-to-end image near-dup over the synthesized corpus images. */
  def imageDedupPipeline(spark: SparkSession, dir: String): DataFrame =
    imageDedup(spark, attachMedia(spark, graft.Tables.documents(spark, dir)))

  case class ImagePhash(doc_id: Long, phash: Long)

  /** DCT pHash per decodable image — same batch shape as
    * [[imageHashes]]. */
  def imagePhashes(spark: SparkSession, media: DataFrame): Dataset[ImagePhash] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap(r => MediaCodecs.perceptualHash(r.payload).map(ImagePhash(r.doc_id, _)))
    }
  }

  /** Image near-dup pairs under the FREQUENCY-DOMAIN hash
    * ([[MediaCodecs.perceptualHash]]) — [[imageDedup]]'s plan with
    * pHash bits: mean-pooled 32×32 luma through a low-frequency
    * 8×8 DCT block, bits vs the block median. Same pigeonhole block
    * cover, so output is exactly all pairs at pHash-hamming ≤
    * [[ImageHammingMax]]; pHash survives local pixel noise that
    * flips aHash cells, the standard trade for the extra DCT per
    * image (still one map-side pass, 8 bytes/row shuffled). */
  def imagePhashDedup(spark: SparkSession, media: DataFrame): DataFrame =
    hammingPairs(imagePhashes(spark, media).toDF(), "phash")

  /** End-to-end pHash near-dup over the synthesized corpus images. */
  def imagePhashPipeline(spark: SparkSession, dir: String): DataFrame =
    imagePhashDedup(spark, attachMedia(spark, graft.Tables.documents(spark, dir)))

  // ------------------------------------------------------------ video frame near-dup

  case class FrameHash(doc_id: Long, frame_no: Int, fhash: Long)

  /** Per-sampled-frame aHash over a video corpus — one mapPartitions
    * decode pass ([[MediaCodecs.y4mFrameHashes]]), undecodables
    * dropped, unsampled frames never read. */
  def frameHashes(spark: SparkSession, video: Dataset[VideoRow]): Dataset[FrameHash] = {
    import spark.implicits._
    video.mapPartitions { rows =>
      rows.flatMap { r =>
        MediaCodecs.y4mFrameHashes(r.payload, SampleEvery)
          .getOrElse(Seq.empty)
          .map { case (f, h) => FrameHash(r.doc_id, f, h) }
      }
    }
  }

  /** VIDEO FRAME NEAR-DUP — duplicate frames ACROSS (and within)
    * videos at aHash-hamming ≤ [[ImageHammingMax]]: re-uploaded
    * clips, shared intros/outros, static scenes — the video corpus
    * dedup signal at frame grain (whole-file hashing misses a clip
    * embedded in a longer video; this is the multimodal analogue of
    * dedup_span_coverage's partial-copy rule). Frames are keyed
    * (doc_id, frame_no); candidates meet by exact match on any of the
    * four 16-bit hash blocks (the [[imageDedup]] pigeonhole cover —
    * complete for hamming ≤ 3, so bucketing changes cost, never
    * results), then the exact hamming refine. `same_video` flags
    * intra-clip pairs (static-scene detection) vs cross-clip
    * duplicates (the dedup signal).
    *
    * Scale: the GB-sized payload column never shuffles — decode and
    * hash are map-side, 12 bytes/frame-row shuffle on
    * (block_idx, block_val); sampling bounds the frame-row count at
    * n_frames/[[SampleEvery]], and hot hashes (black/static frames —
    * the frame hash shared by f frames that would emit f² pairs) are
    * capped at df ≤ [[MaxHashDf]] BEFORE pairing ([[capHotHashes]];
    * drops reported by [[hashCaps]]). */
  def frameDedup(spark: SparkSession, video: Dataset[VideoRow]): DataFrame =
    frameDedupFromHashes(frameHashes(video.sparkSession, video).toDF())

  /** [[frameDedup]] over an already-materialized (doc_id, frame_no,
    * fhash) frame — the reusable half that lets [[frameRollup]] decode
    * each video exactly once. */
  private[pipeline] def frameDedupFromHashes(fh: DataFrame): DataFrame = {
    val (kept, _) = capHotHashes(fh, "fhash")
    val blocks = kept.select(col("doc_id"), col("frame_no"), col("fhash").as("h"),
        explode(expr("sequence(0, 3)")).as("block_idx"))
      .withColumn("block_val", expr("shiftright(h, block_idx * 16) & 65535"))
    blocks.as("a").join(blocks.as("b"),
        col("a.block_idx") === col("b.block_idx") &&
          col("a.block_val") === col("b.block_val") &&
          (col("a.doc_id") < col("b.doc_id") ||
            (col("a.doc_id") === col("b.doc_id") &&
              col("a.frame_no") < col("b.frame_no"))))
      .select(col("a.doc_id").as("doc_id_1"), col("a.frame_no").as("frame_1"),
        col("b.doc_id").as("doc_id_2"), col("b.frame_no").as("frame_2"),
        col("a.h").as("h1"), col("b.h").as("h2"))
      .distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= ImageHammingMax)
      .select(col("doc_id_1"), col("frame_1"), col("doc_id_2"), col("frame_2"),
        col("hamming"), (col("doc_id_1") === col("doc_id_2")).as("same_video"))
      .orderBy(col("doc_id_1"), col("frame_1"), col("doc_id_2"), col("frame_2"))
  }

  /** End-to-end frame near-dup over the synthesized corpus videos. */
  def frameDedupPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    frameDedup(spark, attachVideo(spark, graft.Tables.documents(spark, dir))
      .repartition(col("format")).as[VideoRow])
  }

  // ------------------------------------------------------------ cap report + per-video rollup

  /** THE NO-SILENT-CAPS SIDECAR for the media near-dup family: every
    * hash the df-cap excluded from pairing, per family
    * (ahash = [[imageDedup]], phash = [[imagePhashDedup]],
    * fhash = [[frameDedup]]), with its corpus frequency — exactly the
    * hashes whose pairs the operators will NOT emit, so an operator
    * reading the pair relations can see what was dropped and why
    * (df > [[MaxHashDf]]). `hash_hex` instead of the raw long keeps
    * the report greppable against ops tooling. Cost: the same
    * map-side decode+hash passes as the operators plus one count
    * shuffle per family — no pairing, no payload shuffle. */
  def hashCaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
    val media = attachMedia(spark, docs)
    val video = attachVideo(spark, docs).repartition(col("format")).as[VideoRow]
    def report(hashes: DataFrame, hcol: String, family: String): DataFrame =
      capHotHashes(hashes, hcol)._2.select(
        lit(family).as("family"), lpad(hex(col(hcol)), 16, "0").as("hash_hex"),
        col("df"))
    report(imageHashes(spark, media).toDF(), "ahash", "ahash")
      .unionAll(report(imagePhashes(spark, media).toDF(), "phash", "phash"))
      .unionAll(report(frameHashes(spark, video).toDF(), "fhash", "fhash"))
      .orderBy(col("family"), col("hash_hex"))
  }

  /** PER-VIDEO duplication rollup — the CURATION-DECISION grain over
    * [[frameDedup]]'s pair relation (the dedup_span_coverage shape at
    * frame grain): per video, how many frames were sampled, how many
    * of them appear in at least one CROSS-video duplicate pair, how
    * many carried a CAPPED hash (excluded from pairing by the
    * [[MaxHashDf]] rule), and the duplicated fraction. Intra-video
    * pairs (static scenes) are excluded — they say "still camera",
    * not "duplicate content".
    *
    * READ dup_fraction TOGETHER WITH capped_frames: a video whose
    * frames all hash into capped (corpus-hot) values — a black or
    * fully static re-upload — emits NO pairs by construction, so its
    * dup_fraction is 0 while its content is maximally common. The
    * capped_frames column is the per-video face of the mm_hash_caps
    * sidecar: dup_fraction near 1 means re-upload, near 0 WITH
    * capped_frames near 0 means novel footage, and near 0 with high
    * capped_frames means "indeterminate — content too common to
    * pair", which must route to the hash-grain report, never be read
    * as novelty.
    *
    * Each video is decoded ONCE: the frame-hash relation is
    * checkpointed and feeds the pair generation, the per-video frame
    * counts AND the capped-frame counts (at lakehouse scale the hash
    * relation is a persisted artifact, exactly like dedup_keeplist's
    * digest relation). The rollup is three doc_id/hash-keyed
    * aggregates + two left joins — nothing beyond the pair stage's
    * existing shuffles. */
  def frameRollup(spark: SparkSession, video: Dataset[VideoRow]): DataFrame = {
    val fh = frameHashes(spark, video).toDF().localCheckpoint()
    val (_, hot) = capHotHashes(fh, "fhash")
    val cross = frameDedupFromHashes(fh).filter(!col("same_video"))
    val dupFrames = cross
      .select(col("doc_id_1").as("doc_id"), col("frame_1").as("frame_no"))
      .unionAll(cross.select(col("doc_id_2").as("doc_id"), col("frame_2").as("frame_no")))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dup_frames"))
    val cappedFrames = fh.join(hot.select(col("fhash")), Seq("fhash"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("capped_frames"))
    fh.groupBy(col("doc_id")).agg(count(lit(1)).as("sampled_frames"))
      .join(dupFrames, Seq("doc_id"), "left")
      .join(cappedFrames, Seq("doc_id"), "left")
      .withColumn("dup_frames", coalesce(col("dup_frames"), lit(0L)))
      .withColumn("capped_frames", coalesce(col("capped_frames"), lit(0L)))
      .withColumn("dup_fraction", round(
        col("dup_frames").cast("double") / col("sampled_frames").cast("double"), 6))
      .orderBy(col("doc_id"))
  }

  /** End-to-end per-video rollup over the synthesized corpus videos. */
  def frameRollupPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    frameRollup(spark, attachVideo(spark, graft.Tables.documents(spark, dir))
      .repartition(col("format")).as[VideoRow])
  }
}
