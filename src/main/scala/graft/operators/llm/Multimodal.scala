package graft.operators.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media record flowing through the decode pipeline. */
case class MediaRow(doc_id: Long, media: Array[Byte], format: String)

/** Extracted (stub) features for one media record. */
case class MediaFeatures(doc_id: Long, byte_len: Long, format: String,
                         width: Int, height: Int, frame_checksum: Long)

/** One sampled frame of a media blob (video frame-sampling shape). */
case class FrameRow(doc_id: Long, frame_idx: Int, ts_ms: Long,
                    frame_bytes: Array[Byte])

/** Extracted audio features for one media record (true values for
  * WAV/AIFF via the JDK decoder; deterministic stub otherwise). */
case class AudioFeatures(doc_id: Long, byte_len: Long, format: String,
                         sample_rate: Int, channels: Int, frames: Long,
                         duration_ms: Long, rms: Double)

/** Container-level video metadata for one media record: a REAL
  * ISO BMFF (MP4/MOV) box parse — brand, duration, track count,
  * presentation size — with a deterministic stub for non-container
  * bytes. Codec-free by design: only sample decode needs a codec. */
case class VideoMeta(doc_id: Long, byte_len: Long, container: String,
                     brand: String, duration_ms: Long, track_ct: Int,
                     width: Int, height: Int)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The Spark-side plumbing is real — schema, partition-preserving
  * batched `mapPartitions`, feature frame. IMAGE decode is real:
  * PNG/JPEG bytes go through the JDK's built-in `javax.imageio`
  * (offline-safe, no extra deps) and yield true pixel dimensions.
  * AUDIO decode is real for WAV/AIFF: the JDK's built-in
  * `javax.sound.sampled` parses the container and PCM frames — true
  * sample rate / channel count / frame length plus RMS amplitude over
  * the samples. VIDEO container metadata is real too: `parseMp4`
  * walks the ISO BMFF box tree (brand, duration, track count,
  * presentation size) with no codec at all. Only compressed-audio
  * (mp3/aac) and video SAMPLE decode remain STUBBED (those codecs
  * are not in the JDK and not in this container): `decodeStub`
  * derives deterministic fake features from the bytes, and mis-tagged
  * bytes no decoder accepts (the driver's text-as-binary test media)
  * fall back to the same stub path. A production deployment swaps the
  * remaining stub for a real codec without touching the pipeline
  * shape.
  */
object Multimodal {

  /** Wrap text content as a binary media column + typed metadata —
    * the ingest shape for opaque media blobs. */
  def asMediaFrame(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      when(col("doc_id") % 3 === 0, "png")
        .when(col("doc_id") % 3 === 1, "jpeg")
        .otherwise("wav").as("format"))

  /** FNV-1a checksum of the raw bytes (deterministic, codec-free). */
  private def fnv(bytes: Array[Byte]): Long =
    bytes.foldLeft(1469598103934665603L)((h, b) =>
      (h ^ (b & 0xff)) * 1099511628211L)

  /** STUB decoder: deterministic pseudo-decode of a media blob.
    * Remaining `???` boundary for audio/video (no codecs offline). */
  private[llm] def decodeStub(r: MediaRow): MediaFeatures = {
    val len = r.media.length.toLong
    // fake dimensions/checksum derived only from the bytes (deterministic)
    MediaFeatures(r.doc_id, len, r.format,
      width = (len % 640).toInt + 1, height = (len % 480).toInt + 1,
      frame_checksum = fnv(r.media))
  }

  /** Decoder: REAL image decode for PNG/JPEG/BMP/TIFF via
    * `javax.imageio` (the JDK has shipped a TIFF reader since Java 9
    * and a BMP reader since 1.5 — true pixel dimensions, no external
    * codec); audio/video — and image-tagged bytes no image reader
    * accepts — take the stub path. Total: never throws, mirroring the
    * U1 error-passthrough posture. */
  private[llm] def decode(r: MediaRow): MediaFeatures = r.format match {
    case "png" | "jpeg" | "bmp" | "tiff" =>
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.media))
        if (img == null) decodeStub(r)
        else MediaFeatures(r.doc_id, r.media.length.toLong, r.format,
          img.getWidth, img.getHeight, fnv(r.media))
      } catch { case _: Throwable => decodeStub(r) }
    case _ => decodeStub(r)
  }

  /** Deterministic stub audio features (the non-PCM / mis-tagged
    * fallback — same posture as `decodeStub`). */
  private[llm] def audioStub(r: MediaRow): AudioFeatures = {
    val len = r.media.length.toLong
    val rate = 8000 + (len % 8).toInt * 1000
    AudioFeatures(r.doc_id, len, r.format, rate,
      channels = (len % 2).toInt + 1, frames = len / 2,
      duration_ms = (len / 2) * 1000 / rate, rms = 0.0)
  }

  /** REAL audio decode for WAV/AIFF via the JDK's
    * `javax.sound.sampled` (no external codec): true sample rate,
    * channel count, frame length, duration, and RMS amplitude over
    * the 16-bit PCM samples (normalized to [0,1]; a pure sine of
    * amplitude a has RMS a/√2 — asserted in the spec). Compressed
    * formats and undecodable bytes take the stub; never throws. */
  private[llm] def decodeAudio(r: MediaRow): AudioFeatures =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.media))
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val rms =
        if (fmt.getSampleSizeInBits == 16) {
          val data = in.readAllBytes()
          val le = !fmt.isBigEndian
          var sum = 0.0; var n = 0; var i = 0
          while (i + 1 < data.length) {
            val lo = data(if (le) i else i + 1) & 0xff
            val hi = data(if (le) i + 1 else i).toInt
            val s = (hi << 8) | lo
            sum += s.toDouble * s; n += 1; i += 2
          }
          if (n == 0) 0.0 else math.sqrt(sum / n) / 32768.0
        } else 0.0
      AudioFeatures(r.doc_id, r.media.length.toLong, r.format,
        fmt.getSampleRate.toInt, fmt.getChannels, frames,
        duration_ms = if (fmt.getSampleRate > 0 && frames >= 0)
          (frames * 1000L / fmt.getSampleRate.toLong) else 0L,
        rms = rms)
    } catch { case _: Throwable => audioStub(r) }

  /** Batched audio decode — same partition-preserving shape as
    * `extractFeatures`. */
  def extractAudioFeatures(spark: SparkSession,
                           media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(decodeAudio))
  }

  /** Batched decode over partitions: the real-world shape for feeding
    * a native codec (amortized per-partition init, bounded batch
    * memory). No shuffle — partitioning is preserved. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition init would open a native codec here; imageio is
      // stateless so the real image path needs none
      it.map(decode)
    }
  }

  /** Resize: fit the decoded dimensions (true pixels for PNG/JPEG,
    * stub for audio/video) into a bounding box preserving aspect
    * ratio — metadata-only; a production resize would also transform
    * the bytes at the remaining `???` boundary. The plumbing (typed
    * narrow map, no shuffle, bounded output) is the production shape. */
  def resize(spark: SparkSession, media: DataFrame,
             maxW: Int = 224, maxH: Int = 224): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val f = decode(r)
        val scale = math.min(1.0,
          math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
        f.copy(width = math.max(1, (f.width * scale).toInt),
          height = math.max(1, (f.height * scale).toInt))
      }
    }
  }

  /** Frame sampling: emit up to `maxFrames` frames per blob at a fixed
    * byte stride (standing in for a time stride; a real demuxer slots
    * into the same flatMap). Explode-shaped — one input row fans out to
    * N — but narrow: no shuffle, output bounded by maxFrames. */
  private def strideFrames(r: MediaRow, frameBytes: Int, everyMs: Long,
                           maxFrames: Int): Seq[FrameRow] = {
    val n = math.min(maxFrames,
      math.max(1, r.media.length / math.max(1, frameBytes)))
    (0 until n).map { i =>
      val from = i * frameBytes
      val until = math.min(r.media.length, from + frameBytes)
      FrameRow(r.doc_id, i, i * everyMs,
        java.util.Arrays.copyOfRange(r.media, from, math.max(from, until)))
    }
  }

  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 256, everyMs: Long = 1000,
                   maxFrames: Int = 8): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].flatMap(r => strideFrames(r, frameBytes, everyMs, maxFrames))
  }

  /** REAL frame demux for animated GIF — the one multi-frame format
    * the JDK decodes (`javax.imageio` gif reader): true frame count,
    * each frame decoded to pixels and re-encoded as standalone PNG
    * bytes. `ts_ms` is `frame_idx × everyMs` (frame delays live in GIF
    * metadata extensions; a production demuxer would read them — the
    * sampling contract only needs monotone stamps). Bytes no gif
    * reader accepts fall back to the byte-stride stub frames; never
    * throws. */
  private[llm] def gifFrames(r: MediaRow, everyMs: Long,
                             maxFrames: Int): Seq[FrameRow] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.media))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) throw new java.io.IOException("no reader")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = math.min(reader.getNumImages(true), maxFrames)
        (0 until n).map { i =>
          val img = reader.read(i)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          FrameRow(r.doc_id, i, i * everyMs, bos.toByteArray)
        }
      } finally reader.dispose()
    } catch {
      case _: Throwable => strideFrames(r, 256, everyMs, maxFrames)
    }

  /** Frame sampling with the real demux where the JDK has one:
    * `gif`-tagged blobs go through the animated-GIF reader, everything
    * else keeps the byte-stride stub. Same narrow explode shape. */
  def sampleFramesReal(spark: SparkSession, media: DataFrame,
                       everyMs: Long = 1000,
                       maxFrames: Int = 8): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      if (r.format == "gif") gifFrames(r, everyMs, maxFrames)
      else strideFrames(r, 256, everyMs, maxFrames)
    }
  }

  /** Parsed container-level video metadata (codec-free): ISO BMFF box
    * structure is plain length-prefixed bytes, so brand, duration,
    * track count, and the tkhd presentation size are all readable
    * without any codec — only SAMPLE decode needs one. */
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  private def boxType(b: Array[Byte], o: Int): String =
    new String(b, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the ISO BMFF (MP4/MOV/3GP) box tree of `media`:
    * `ftyp` major brand, `mvhd` duration (timescale-normalized to ms,
    * version 0 and 1 layouts), `trak` count, and the first `tkhd`
    * non-zero presentation size (16.16 fixed-point). REAL container
    * parse — no codec involved; bytes that aren't BMFF (no well-formed
    * top-level boxes) fall back to the deterministic stub, same
    * never-throws posture as the other decoders. */
  private[llm] def parseMp4(r: MediaRow): VideoMeta = {
    val b = r.media
    try {
      var brand = ""
      var durationMs = 0L
      var trackCt = 0
      var w = 0
      var h = 0
      // one pass over [size][type][payload] boxes; descend into the
      // pure containers the metadata lives under
      def walk(from: Long, to: Long, depth: Int): Unit = {
        var o = from
        while (o + 8 <= to) {
          val size0 = be32(b, o.toInt)
          val t = boxType(b, o.toInt)
          val (payload, size) =
            if (size0 == 1L && o + 16 <= to) (o + 16, be64(b, o.toInt + 8))
            else if (size0 == 0L) (o + 8, to - o) // box runs to end
            else (o + 8, size0)
          if (size < 8 || o + size > to) throw new java.io.IOException("bad box")
          val end = o + size
          t match {
            case "ftyp" if payload + 4 <= end =>
              brand = boxType(b, payload.toInt - 4).trim
            case "moov" | "trak" | "mdia" if depth < 8 =>
              if (t == "trak") trackCt += 1
              walk(payload, end, depth + 1)
            case "mvhd" if payload + 4 <= end =>
              val v = b(payload.toInt) & 0xff
              if (v == 1 && payload + 32 <= end) {
                val ts = be32(b, payload.toInt + 20)
                val d = be64(b, payload.toInt + 24)
                if (ts > 0) durationMs = d * 1000L / ts
              } else if (v == 0 && payload + 20 <= end) {
                val ts = be32(b, payload.toInt + 12)
                val d = be32(b, payload.toInt + 16)
                if (ts > 0) durationMs = d * 1000L / ts
              }
            case "tkhd" if w == 0 && end - 8 >= payload =>
              // width/height are the final two 16.16 words of tkhd in
              // both versions
              val ww = (be32(b, end.toInt - 8) >> 16).toInt
              val hh = (be32(b, end.toInt - 4) >> 16).toInt
              if (ww > 0 && hh > 0) { w = ww; h = hh }
            case _ => ()
          }
          o = end
        }
        if (o != to) throw new java.io.IOException("trailing bytes")
      }
      walk(0L, b.length.toLong, 0)
      if (brand.isEmpty && trackCt == 0) throw new java.io.IOException("not bmff")
      VideoMeta(r.doc_id, b.length.toLong, "bmff", brand, durationMs,
        trackCt, w, h)
    } catch {
      case _: Throwable =>
        VideoMeta(r.doc_id, b.length.toLong, "unknown", "", 0L, 0,
          (b.length % 640) + 1, (b.length % 480) + 1)
    }
  }

  /** Batched container-metadata extraction — the video analog of
    * `extractAudioFeatures`: partition-preserving, no shuffle, real
    * BMFF parse, stub fallback for non-container bytes. */
  def extractVideoMeta(spark: SparkSession,
                       media: DataFrame): Dataset[VideoMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(parseMp4))
  }

  /** Pipeline: documents → media frame → per-format size stats.
    * The aggregate is SQL-expressible for the oracle; the mapPartitions
    * decode path is exercised by the ScalaTest suite. */
  def formatStats(documents: DataFrame): DataFrame =
    asMediaFrame(documents)
      .select(col("doc_id"), col("format"),
        octet_length(col("media")).cast("long").as("byte_len"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("media_ct"),
        sum(col("byte_len")).as("total_bytes"),
        max(col("byte_len")).as("max_bytes"))
      .orderBy("format")

  /** 64-bit average-hash (aHash) perceptual fingerprint — the public
    * perceptual-hashing recipe: sample the decoded image on an 8×8
    * grid, gray each sample, set bit i when gray(i) > the 64-sample
    * mean. Near-identical images (recompression, small edits, minor
    * resize) agree on most bits; unrelated images disagree on ~32.
    * Non-decodable bytes and audio/video take the byte-checksum stub
    * (format-prefixed so stub hashes never collide with image
    * hashes across formats by construction of fnv input). */
  private[llm] def aHash(r: MediaRow): Long = r.format match {
    case "png" | "jpeg" | "bmp" | "tiff" =>
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.media))
        if (img == null) fnv(r.format.getBytes ++ r.media)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val grays = Array.tabulate(64) { i =>
            val (gx, gy) = (i % 8, i / 8)
            val px = img.getRGB(math.min(w - 1, gx * w / 8),
              math.min(h - 1, gy * h / 8))
            ((px >> 16 & 0xff) + (px >> 8 & 0xff) + (px & 0xff)) / 3
          }
          val mean = grays.sum / 64
          grays.zipWithIndex.foldLeft(0L) { case (acc, (g, i)) =>
            if (g > mean) acc | (1L << i) else acc
          }
        }
      } catch { case _: Throwable => fnv(r.format.getBytes ++ r.media) }
    case _ => fnv(r.format.getBytes ++ r.media)
  }

  /** Per-image perceptual hashes — partition-preserving, no shuffle. */
  def imageHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(it => it.map(r => (r.doc_id, aHash(r))))
      .toDF("doc_id", "ahash")
  }

  /** Image near-duplicate pairs: band the 64-bit aHash into 4×16-bit
    * chunks, bucket-join on (band, chunk), then verify exact Hamming
    * distance — the SimHash text path's geometry. Recall: pigeonhole
    * GUARANTEES a shared chunk only for Hamming ≤ 3; for 4..maxHamming
    * a pair is missed iff its differing bits spread across ALL four
    * chunks (~9% of 4-bit pairs under uniform spread, rarer as bits
    * concentrate), the standard LSH recall trade — narrower 8-bit
    * bands would guarantee ≤7 but inflate random chunk collisions
    * 256×, going quadratic on large corpora. */
  def imageNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 8): DataFrame = {
    val hashes = imageHashes(spark, media)
    val banded = hashes.select(col("doc_id"), col("ahash"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("chunk",
        expr("(ahash >> (band * 16)) & 65535"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }
}
