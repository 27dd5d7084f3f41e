package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns plus typed metadata — the
  * standard shape for 100 TB-scale multimodal training pipelines: parquet
  * stores the bytes page-compressed, column pruning means metadata-only
  * queries never touch the blobs, and per-partition batch processing keeps
  * decode vectorized.
  *
  * IMAGE decode is REAL: `javax.imageio` ships PNG/BMP/GIF/JPEG readers
  * with the JDK, so `kind == "image"` payloads are decoded to pixels for
  * feature extraction and resized with a deterministic nearest-neighbor
  * rescale. AUDIO decode is REAL too: `javax.sound.sampled` ships
  * WAV/AIFF/AU PCM readers, so `kind == "audio"` payloads are decoded
  * to normalized mono samples for duration/RMS/zero-crossing/energy
  * features. VIDEO decode is REAL for the JPEG-frame family: the
  * container parsers here are pure JVM (AVI/MJPG via RIFF chunks,
  * MP4/ISO-BMFF with a JPEG sample entry via the box+sample tables,
  * raw concatenated-JPEG MJPEG streams via SOI scanning) and each
  * extracted frame decodes through the JDK's ImageIO JPEG reader.
  * Inter-frame codecs (H.264/H.265/VP9/AV1) have no JDK decoder, so
  * their PIXEL decode stays a deterministic byte-histogram stub — swap
  * in a codec-backed decoder (JNI or `mapInArrow` to a worker) without
  * touching the plan shape. Their CONTAINER metadata is real, though:
  * [[videoMetadata]] parses codec/resolution/frame-count/duration from
  * the ISO-BMFF box tree, with H.264 resolution read out of the
  * avcC-carried SPS by a pure-JVM Exp-Golomb bit reader — no decoding.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                            width: Int, height: Int)
  final case class Feature(media_id: Long, kind: String, n_bytes: Long,
                           checksum: String, feature: Array[Float])

  /** Wrap raw text/bytes into the canonical media schema (used by tests to
    * fabricate media from any binary-able column). */
  def asMedia(df: DataFrame, id: org.apache.spark.sql.Column,
              payload: org.apache.spark.sql.Column, kind: String): DataFrame =
    df.select(id.cast("long").as("media_id"), lit(kind).as("kind"),
      payload.cast("binary").as("bytes"),
      lit(0).as("width"), lit(0).as("height"))

  /** Metadata-only projection — reads zero blob bytes thanks to parquet
    * column pruning (verify with `.explain`: ReadSchema excludes `bytes`). */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      octet_length(col("bytes")).as("n_bytes"),
      sha2(col("bytes"), 256).as("sha256"))

  final case class VideoMetaRow(media_id: Long, n_bytes: Long,
      codec: Option[String], width: Option[Int], height: Option[Int],
      n_frames: Option[Long], duration_sec: Option[Float],
      fps: Option[Float])

  /** Typed container metadata for video payloads — codec, resolution,
    * frame count, duration, fps — WITHOUT decoding any frames, so it
    * covers the inter-frame codecs (H.264 & co) whose pixel decode is
    * stubbed: resolution comes from the avcC/SPS bit parse, timing from
    * the stts table ([[videoContainerMeta]]). Payloads that are not an
    * ISO-BMFF video (or are corrupt) keep their row with null metadata
    * — one bad record never fails the batch. Per-partition batch loop
    * like [[extractFeatures]] (a JVM byte-walk, not an expression). */
  def videoMetadata(spark: SparkSession, media: DataFrame)
      : Dataset[VideoMetaRow] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"),
        col("bytes"), lit(0).as("width"), lit(0).as("height"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = if (r.bytes == null) Array.emptyByteArray else r.bytes
          videoContainerMeta(bytes) match {
            case Some(m) => VideoMetaRow(r.media_id, bytes.length.toLong,
              Some(m.codec), Some(m.width), Some(m.height),
              Some(m.nFrames), Some(m.durationSec), Some(m.fps))
            case None => VideoMetaRow(r.media_id, bytes.length.toLong,
              None, None, None, None, None, None)
          }
        }
      }
  }

  /** Decode + feature extract as a per-partition batch loop (the Scala
    * analogue of `mapInPandas` batching). `kind == "image"` payloads go
    * through a REAL pure-JVM decode — `javax.imageio` ships PNG/BMP/GIF/
    * JPEG readers with the JDK, no external codecs — and yield
    * deterministic pixel statistics ([[imageFeatures]]); everything else
    * (and bytes no registered reader accepts) falls back to the
    * deterministic byte-histogram stub, preserving the audio/video
    * plumbing contract until those codecs exist. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      featureDim: Int = 8): Dataset[Feature] = {
    require(featureDim >= 1, s"featureDim=$featureDim")
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"),
        col("bytes"), col("width").cast("int"), col("height").cast("int"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // loop-invariant: the JVM-global ImageIO cache flag is set once
        // per partition (not per record — it is a synchronized global
        // setter), and ONE digest instance serves every row (digest()
        // resets it; getInstance does a provider lookup per call)
        javax.imageio.ImageIO.setUseCache(false)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { r =>
          // a null payload is an EMPTY payload: the file contract is
          // one bad record falls back to the stub, never an executor
          // NPE that fails the batch
          val bytes = if (r.bytes == null) Array.emptyByteArray else r.bytes
          val feat = (r.kind match {
            case "image" => decodeImage(bytes).map(imageFeatures(_, featureDim))
            case "audio" => decodeAudio(bytes)
              .map { case (rate, samples) => audioFeatures(rate, samples, featureDim) }
            case "video" => decodeVideo(bytes).map(videoFeatures(_, featureDim))
            case _ => None
          }).getOrElse(decodeStub(bytes, featureDim))
          Feature(r.media_id, r.kind, bytes.length.toLong,
            sha.digest(bytes).take(8).map("%02x".format(_)).mkString,
            feat)
        }
      }
  }

  /** Decode image bytes with whatever reader `javax.imageio` registers
    * for their magic bytes; None when no reader claims them (the caller
    * falls back to the stub). The ImageIO disk cache is disabled — a
    * per-record tmp file inside an executor task loop would be an I/O
    * hazard. */
  private[llm] def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (bytes == null || bytes.isEmpty) return None
    // (callers hoist ImageIO.setUseCache(false) to partition scope; the
    // direct-call path sets it here once more — idempotent)
    javax.imageio.ImageIO.setUseCache(false)
    // NonFatal, not just IOException: the JDK readers throw unchecked
    // exceptions (AIOOBE, IllegalArgument, NegativeArraySize) on
    // truncated/fuzzed payloads, and one bad record must fall back to
    // the stub — never fail the batch
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic pixel statistics from a decoded image:
    * `[width, height, meanR, meanG, meanB, lumaHistogram...]` with the
    * channel means in [0,1] and the remaining `dim - 5` slots a
    * normalized luma histogram (ITU-R 601 weights). Plain per-pixel
    * integer reads — bit-identical across runs and partitionings. */
  /** 8-bit ITU-R 601 luma of a packed RGB pixel — THE luma definition
    * shared by the image and video feature loops (one copy: a weight or
    * rounding change in one modality silently diverging the other is
    * the copy-paste failure this guards against). */
  @inline private def luma601(rgb: Int): Int =
    (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
      + 114 * (rgb & 0xff)) / 1000

  private[llm] def imageFeatures(img: java.awt.image.BufferedImage,
                                 dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val (w, h) = (img.getWidth, img.getHeight)
    if (dim > 0) out(0) = w.toFloat
    if (dim > 1) out(1) = h.toFloat
    val nHist = dim - 5
    val hist = new Array[Long](math.max(nHist, 1))
    var (sumR, sumG, sumB) = (0L, 0L, 0L)
    var y = 0
    // one bulk row read per scanline (identical values to per-pixel
    // getRGB, minus its per-call sample/color-model conversion overhead —
    // the decode hot loop of corpus feature extraction)
    val row = new Array[Int](math.max(w, 1))
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        sumR += r; sumG += g; sumB += b
        if (nHist > 0) hist(luma601(rgb) * nHist / 256) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    if (n > 0) {
      if (dim > 2) out(2) = sumR.toFloat / n / 255.0f
      if (dim > 3) out(3) = sumG.toFloat / n / 255.0f
      if (dim > 4) out(4) = sumB.toFloat / n / 255.0f
      var i = 0
      while (i < nHist) { out(5 + i) = hist(i).toFloat / n; i += 1 }
    }
    out
  }

  /** Decode audio bytes with whatever reader `javax.sound.sampled`
    * registers for them (WAV/AIFF/AU PCM ship with the JDK); returns the
    * sample rate and the samples mixed down to normalized mono floats in
    * [-1, 1], or None when no reader claims the bytes or the PCM layout
    * is one we do not unpack (the caller falls back to the stub). */
  private[llm] def decodeAudio(bytes: Array[Byte]): Option[(Float, Array[Float])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        import javax.sound.sampled.AudioFormat.Encoding._
        val bits = f.getSampleSizeInBits
        // validate the channel count too: a corrupt fmt chunk can claim 0
        // channels with otherwise-valid PCM fields, which would divide by
        // zero below — undecodable means stub fallback, never a crash
        val ok = (f.getEncoding == PCM_SIGNED || f.getEncoding == PCM_UNSIGNED) &&
          (bits == 8 || bits == 16) && f.getChannels > 0
        if (!ok) None
        else {
          val raw = in.readAllBytes()
          val ch = f.getChannels
          val bytesPerSample = bits / 8
          val frames = raw.length / (bytesPerSample * ch)
          val mono = new Array[Float](frames)
          var fr = 0
          while (fr < frames) {
            var acc = 0.0f
            var c = 0
            while (c < ch) {
              val off = (fr * ch + c) * bytesPerSample
              val v =
                if (bits == 8) {
                  if (f.getEncoding == PCM_SIGNED) raw(off).toInt / 128.0f
                  else ((raw(off) & 0xff) - 128) / 128.0f
                } else {
                  val (b0, b1) = if (f.isBigEndian) (raw(off), raw(off + 1))
                                 else (raw(off + 1), raw(off))
                  val s = ((b0 & 0xff) << 8) | (b1 & 0xff)
                  val signed = if (f.getEncoding == PCM_SIGNED) s.toShort.toInt
                               else s - 32768
                  signed / 32768.0f
                }
              acc += v
              c += 1
            }
            mono(fr) = acc / ch
            fr += 1
          }
          Some((f.getSampleRate, mono))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic features from decoded audio:
    * `[durationSec, sampleRate, rms, zeroCrossingRate, peak,
    * energyEnvelope...]` — the remaining `dim - 5` slots are the RMS of
    * equal-width sample windows (a coarse loudness envelope). Plain
    * sequential float math — bit-identical across runs/partitionings. */
  private[llm] def audioFeatures(sampleRate: Float, samples: Array[Float],
                                 dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = samples.length
    if (dim > 0) out(0) = if (sampleRate > 0) n / sampleRate else 0.0f
    if (dim > 1) out(1) = sampleRate
    if (n == 0) return out
    var (sumSq, crossings) = (0.0, 0L)
    var peak = 0.0f
    var i = 0
    while (i < n) {
      val s = samples(i)
      sumSq += s.toDouble * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && (samples(i - 1) >= 0) != (s >= 0)) crossings += 1
      i += 1
    }
    if (dim > 2) out(2) = math.sqrt(sumSq / n).toFloat
    if (dim > 3) out(3) = crossings.toFloat / n
    if (dim > 4) out(4) = peak
    val nEnv = dim - 5
    if (nEnv > 0) {
      var w = 0
      while (w < nEnv) {
        val lo = (w.toLong * n / nEnv).toInt
        val hi = ((w + 1).toLong * n / nEnv).toInt
        if (hi > lo) {
          var ss = 0.0
          var j = lo
          while (j < hi) { ss += samples(j).toDouble * samples(j); j += 1 }
          out(5 + w) = math.sqrt(ss / (hi - lo)).toFloat
        }
        w += 1
      }
    }
    out
  }

  // --------------------------------------------------------------- video

  /** A decoded video: total frame payloads the container declares, the
    * container frame rate (0 when the container carries none — raw MJPEG
    * streams), and the decoded sample frames — evenly strided over the
    * payloads, at most [[MaxDecodedFrames]], so feature extraction cost
    * is bounded per record regardless of clip length. */
  private[llm] final case class DecodedVideo(totalFrames: Int, fps: Float,
      frames: Seq[java.awt.image.BufferedImage])

  private[llm] val MaxDecodedFrames = 16

  /** Pure-JVM video decode for the JPEG-frame family. Containers parsed
    * natively: AVI with an MJPG stream (RIFF chunk walk), MP4/ISO-BMFF
    * whose video track carries a JPEG sample entry (box walk + the
    * stsc/stsz/stco sample tables), and raw MJPEG byte streams
    * (SOI-marker scan). Every extracted frame payload is a standalone
    * JPEG and decodes through the JDK's ImageIO reader. Inter-frame
    * codecs (H.264/H.265/VP9/AV1) have no JDK decoder — those parse to
    * zero decodable frames and return None, so the caller's stub
    * fallback fires only for genuinely unsupported codecs. */
  private[llm] def decodeVideo(bytes: Array[Byte],
                               maxFrames: Int = MaxDecodedFrames)
      : Option[DecodedVideo] =
    try {
      val parsed =
        if (bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
            fourcc(bytes, 8) == "AVI ") parseAvi(bytes)
        else if (bytes.length >= 12 && fourcc(bytes, 4) == "ftyp")
          parseMp4(bytes)
        else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
            (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff)
          parseMjpegStream(bytes)
        else None
      parsed.flatMap { case (fps, payloads) =>
        if (payloads.isEmpty) None
        else {
          val n = payloads.size
          val k = math.min(maxFrames, n)
          // even deterministic stride: frame i of k samples payload
          // floor(i * n / k) — first frame always included
          val frames = (0 until k).flatMap { i =>
            val (off, len) = payloads((i.toLong * n / k).toInt)
            // long arithmetic: a corrupt sample table with off ~ 2e9
            // would overflow off + len negative and SLIP PAST the bound
            // check, turning skip-one-bad-frame into whole-clip fallback
            if (off < 0 || len <= 0 || off.toLong + len.toLong > bytes.length) None
            else decodeImage(java.util.Arrays.copyOfRange(
              bytes, off, off + len))
          }
          if (frames.isEmpty) None
          else Some(DecodedVideo(n, fps, frames))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
  private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def beU16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def beU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def beU64(b: Array[Byte], off: Int): Long =
    (beU32(b, off) << 32) | beU32(b, off + 4)

  /** AVI (RIFF) parse: `avih` gives the frame interval, the `movi` LIST
    * holds the frame chunks (`##dc`/`##db`, possibly nested in `rec `
    * lists). Returns (fps, frame payload ranges). */
  private def parseAvi(b: Array[Byte]): Option[(Float, Vector[(Int, Int)])] = {
    var microSecPerFrame = 0L
    val payloads = Vector.newBuilder[(Int, Int)]
    def walk(start: Long, end: Long, inMovi: Boolean): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(b, off.toInt)
        val size = leU32(b, off.toInt + 4)
        val dataStart = off + 8
        val dataEnd = math.min(dataStart + size, end)
        if (id == "LIST" && size >= 4) {
          val listType = fourcc(b, dataStart.toInt)
          // only hdrl (for avih) and movi/rec (for frames) matter; other
          // lists (strl detail, odml index) are skipped wholesale
          if (listType == "hdrl" || listType == "movi" || listType == "rec ")
            walk(dataStart + 4, dataEnd, inMovi || listType == "movi" ||
              listType == "rec ")
        } else if (id == "avih" && size >= 4) {
          microSecPerFrame = leU32(b, dataStart.toInt)
        } else if (inMovi && id.length == 4 &&
            (id.endsWith("dc") || id.endsWith("db")) && size > 0 &&
            dataEnd <= b.length) {
          payloads += ((dataStart.toInt, (dataEnd - dataStart).toInt))
        }
        off = dataStart + size + (size & 1L) // chunks pad to even sizes
      }
    }
    walk(12L, math.min(8L + leU32(b, 4), b.length.toLong), inMovi = false)
    val fps = if (microSecPerFrame > 0) (1e6 / microSecPerFrame).toFloat
              else 0.0f
    Some((fps, payloads.result()))
  }

  /** MP4 (ISO-BMFF) parse: walk moov → the `vide`-handler trak → stbl;
    * accept a JPEG-family sample entry in stsd; resolve each sample's
    * byte range through stsc (samples per chunk) + stco/co64 (chunk
    * offsets) + stsz (sample sizes); fps from mdhd timescale/duration.
    * A non-JPEG codec yields None — no JDK decoder exists for it. */
  /** An ISO-BMFF box: `start` is the payload offset (past the 8- or
    * 16-byte header), `end` the box end. Shared by the MJPEG sample
    * extractor and the container-metadata probe. */
  private final case class Mp4Box(typ: String, start: Long, end: Long)

  private def mp4Boxes(b: Array[Byte], start: Long, end: Long): Vector[Mp4Box] = {
    val out = Vector.newBuilder[Mp4Box]
    var off = start
    while (off + 8 <= end) {
      val size0 = beU32(b, off.toInt)
      val typ = fourcc(b, off.toInt + 4)
      val (dataStart, boxEnd) =
        if (size0 == 1 && off + 16 <= end)
          (off + 16, math.min(off + beU64(b, off.toInt + 8), end))
        else if (size0 == 0) (off + 8, end)
        else (off + 8, math.min(off + size0, end))
      if (boxEnd <= off) return out.result() // corrupt size: stop
      out += Mp4Box(typ, dataStart, boxEnd)
      off = boxEnd
    }
    out.result()
  }

  private def mp4Child(bs: Vector[Mp4Box], typ: String): Option[Mp4Box] =
    bs.find(_.typ == typ)

  /** moov → the `vide`-handler trak → (mdia children, stbl children) —
    * the walk every video-track consumer starts from. */
  private def videoTrakTables(b: Array[Byte])
      : Option[(Vector[Mp4Box], Vector[Mp4Box])] = {
    val root = mp4Boxes(b, 0L, b.length.toLong)
    for {
      moov <- mp4Child(root, "moov")
      moovKids = mp4Boxes(b, moov.start, moov.end)
      trak <- moovKids.filter(_.typ == "trak").find { t =>
        (for {
          mdia <- mp4Child(mp4Boxes(b, t.start, t.end), "mdia")
          hdlr <- mp4Child(mp4Boxes(b, mdia.start, mdia.end), "hdlr")
        } yield fourcc(b, hdlr.start.toInt + 8) == "vide").getOrElse(false)
      }
      mdia <- mp4Child(mp4Boxes(b, trak.start, trak.end), "mdia")
      mdiaKids = mp4Boxes(b, mdia.start, mdia.end)
      minf <- mp4Child(mdiaKids, "minf")
      stbl <- mp4Child(mp4Boxes(b, minf.start, minf.end), "stbl")
    } yield (mdiaKids, mp4Boxes(b, stbl.start, stbl.end))
  }

  private def parseMp4(b: Array[Byte]): Option[(Float, Vector[(Int, Int)])] = {
    def child(bs: Vector[Mp4Box], typ: String): Option[Mp4Box] =
      mp4Child(bs, typ)
    val JpegEntries = Set("jpeg", "mjpa", "mjpb", "mjpg", "MJPG", "AVDJ")
    for {
      (mdiaKids, stblKids) <- videoTrakTables(b)
      stsd <- child(stblKids, "stsd")
      // first sample entry: 4B ver/flags + 4B count, then size+format
      if beU32(b, stsd.start.toInt + 4) >= 1 &&
        JpegEntries.contains(fourcc(b, stsd.start.toInt + 12))
      stsz <- child(stblKids, "stsz")
      stsc <- child(stblKids, "stsc")
      stco <- child(stblKids, "stco").orElse(child(stblKids, "co64"))
    } yield {
      val co64 = stco.typ == "co64"
      val fixedSize = beU32(b, stsz.start.toInt + 4)
      val nSamples = beU32(b, stsz.start.toInt + 8).toInt
      def sampleSize(i: Int): Long =
        if (fixedSize != 0) fixedSize
        else beU32(b, stsz.start.toInt + 12 + 4 * i)
      val nChunks = beU32(b, stco.start.toInt + 4).toInt
      def chunkOffset(c: Int): Long =
        if (co64) beU64(b, stco.start.toInt + 8 + 8 * c)
        else beU32(b, stco.start.toInt + 8 + 4 * c)
      val nStsc = beU32(b, stsc.start.toInt + 4).toInt
      def stscEntry(i: Int): (Long, Long) = // (first_chunk, samples_per)
        (beU32(b, stsc.start.toInt + 8 + 12 * i),
          beU32(b, stsc.start.toInt + 12 + 12 * i))
      val payloads = Vector.newBuilder[(Int, Int)]
      var sample = 0
      var entry = 0
      var chunk = 1L
      while (sample < nSamples && chunk <= nChunks) {
        while (entry + 1 < nStsc && stscEntry(entry + 1)._1 <= chunk)
          entry += 1
        val perChunk = stscEntry(entry)._2
        var off = chunkOffset(chunk.toInt - 1)
        var s = 0L
        while (s < perChunk && sample < nSamples) {
          val len = sampleSize(sample)
          payloads += ((off.toInt, len.toInt))
          off += len
          sample += 1
          s += 1
        }
        chunk += 1
      }
      val fps = (for {
        mdhd <- child(mdiaKids, "mdhd")
      } yield {
        val v = b(mdhd.start.toInt) & 0xff
        val (ts, dur) =
          if (v == 1) (beU32(b, mdhd.start.toInt + 20),
            beU64(b, mdhd.start.toInt + 24))
          else (beU32(b, mdhd.start.toInt + 12),
            beU32(b, mdhd.start.toInt + 16))
        if (dur > 0) (nSamples.toDouble * ts / dur).toFloat else 0.0f
      }).getOrElse(0.0f)
      (fps, payloads.result())
    }
  }

  /** Container-level metadata of a video payload — codec fourcc,
    * resolution, frame count, duration, frame rate — extracted WITHOUT
    * decoding a single frame, so it works for the inter-frame codecs
    * (H.264 & co) whose pixel decode stays stubbed (no JDK decoder).
    * ISO-BMFF (MP4/MOV): resolution comes from the H.264 sequence
    * parameter set inside the `avcC` configuration box, parsed with a
    * real Exp-Golomb bit reader ([[parseSpsDims]]) — the coded
    * mb-aligned size minus the declared cropping, the number every
    * serving system reports — falling back to the sample entry's
    * width/height fields for other codecs (or a malformed SPS); frame
    * count and duration come from the `stts` time-to-sample table
    * (sum of counts; sum of count×delta over the `mdhd` timescale).
    * AVI (RIFF): codec from the video stream's `strf`
    * BITMAPINFOHEADER biCompression (falling back to `strh`
    * fccHandler), resolution from the same header, frames from `strh`
    * dwLength (falling back to `avih` dwTotalFrames), fps from
    * dwRate/dwScale (falling back to 1e6/usPerFrame). */
  private[llm] final case class VideoContainerMeta(codec: String, width: Int,
      height: Int, nFrames: Long, durationSec: Float, fps: Float)

  private[llm] def videoContainerMeta(b: Array[Byte])
      : Option[VideoContainerMeta] =
    try {
      if (b == null || b.length < 12) None
      else if (fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ")
        aviContainerMeta(b)
      else if (fourcc(b, 4) != "ftyp") None
      else for {
        (mdiaKids, stblKids) <- videoTrakTables(b)
        stsd <- mp4Child(stblKids, "stsd")
        if beU32(b, stsd.start.toInt + 4) >= 1
        stts <- mp4Child(stblKids, "stts")
      } yield {
        val entry = stsd.start.toInt + 8     // first sample entry
        val codec = fourcc(b, entry + 4)
        // VisualSampleEntry fixed fields: width/height at +32/+34,
        // codec-specific child boxes (avcC, ...) from +86
        val entryEnd = math.min(entry + beU32(b, entry), stsd.end)
        val fallbackW = beU16(b, entry + 32)
        val fallbackH = beU16(b, entry + 34)
        val spsDims =
          if (codec == "avc1" || codec == "avc3")
            mp4Child(mp4Boxes(b, entry + 86L, entryEnd), "avcC")
              .flatMap(c => avcCFirstSps(b, c.start.toInt, c.end.toInt))
              .flatMap(parseSpsDims)
          else None
        val (w, h) = spsDims.getOrElse((fallbackW, fallbackH))
        // stts: (count, delta) runs; frames = Σ count, units = Σ c·δ
        val nEntries = beU32(b, stts.start.toInt + 4).toInt
        var frames = 0L
        var units = 0L
        var i = 0
        while (i < nEntries && stts.start + 8 + 8L * i + 8 <= stts.end) {
          val c = beU32(b, stts.start.toInt + 8 + 8 * i)
          frames += c
          units += c * beU32(b, stts.start.toInt + 12 + 8 * i)
          i += 1
        }
        val timescale = mp4Child(mdiaKids, "mdhd").map { mdhd =>
          if ((b(mdhd.start.toInt) & 0xff) == 1)
            beU32(b, mdhd.start.toInt + 20)
          else beU32(b, mdhd.start.toInt + 12)
        }.getOrElse(0L)
        val durationSec =
          if (timescale > 0) (units.toDouble / timescale).toFloat else 0.0f
        val fps =
          if (durationSec > 0) (frames / durationSec.toDouble).toFloat
          else 0.0f
        VideoContainerMeta(codec, w, h, frames, durationSec, fps)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** AVI (RIFF) leg of [[videoContainerMeta]]: walk hdrl for `avih`
    * and the first `strl` whose `strh` declares a `vids` stream; codec
    * = `strf` BITMAPINFOHEADER biCompression fourcc (fccHandler when
    * the header says BI_RGB/0), dims from the same header, frames from
    * `strh` dwLength, fps = dwRate/dwScale. No `movi` walk — metadata
    * never touches frame payloads. */
  private def aviContainerMeta(b: Array[Byte]): Option[VideoContainerMeta] = {
    var usPerFrame = 0L
    var avihFrames = 0L
    var codec: String = null
    var w, h = 0
    var strhFrames = 0L
    var scale, rate = 0L
    var inVideoStrl = false
    var found = false
    def walk(start: Long, end: Long): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(b, off.toInt)
        val size = leU32(b, off.toInt + 4)
        val dataStart = off + 8
        val dataEnd = math.min(dataStart + size, end)
        if (id == "LIST" && size >= 4) {
          val listType = fourcc(b, dataStart.toInt)
          if (listType == "hdrl") walk(dataStart + 4, dataEnd)
          else if (listType == "strl" && !found) {
            inVideoStrl = false
            walk(dataStart + 4, dataEnd)
          }
        } else if (id == "avih" && size >= 20) {
          usPerFrame = leU32(b, dataStart.toInt)
          avihFrames = leU32(b, dataStart.toInt + 16)
        } else if (id == "strh" && size >= 36) {
          inVideoStrl = fourcc(b, dataStart.toInt) == "vids"
          if (inVideoStrl) {
            codec = fourcc(b, dataStart.toInt + 4)   // fccHandler
            scale = leU32(b, dataStart.toInt + 20)
            rate = leU32(b, dataStart.toInt + 24)
            strhFrames = leU32(b, dataStart.toInt + 32)
          }
        } else if (id == "strf" && inVideoStrl && size >= 20) {
          w = leU32(b, dataStart.toInt + 4).toInt    // biWidth
          h = math.abs(leU32(b, dataStart.toInt + 8).toInt) // biHeight (can be negative: top-down)
          val comp = leU32(b, dataStart.toInt + 16)  // biCompression
          if (comp != 0) codec = fourcc(b, dataStart.toInt + 16)
          found = true
        }
        off = dataStart + size + (size & 1L)         // chunks pad to even
      }
    }
    walk(12L, math.min(8L + leU32(b, 4), b.length.toLong))
    if (!found && codec == null) None
    else {
      val frames = if (strhFrames > 0) strhFrames else avihFrames
      val fps =
        if (scale > 0 && rate > 0) (rate.toDouble / scale).toFloat
        else if (usPerFrame > 0) (1e6 / usPerFrame).toFloat
        else 0.0f
      val durationSec = if (fps > 0) (frames / fps.toDouble).toFloat else 0.0f
      Some(VideoContainerMeta(if (codec == null) "" else codec, w, h,
        frames, durationSec, fps))
    }
  }

  /** First SPS NAL inside an `avcC` (AVCDecoderConfigurationRecord)
    * payload: version(1) profile(1) compat(1) level(1)
    * lengthSizeMinusOne(1) numSps(1), then per SPS a 2-byte length and
    * the NAL (header byte + RBSP). */
  private def avcCFirstSps(b: Array[Byte], start: Int, end: Int)
      : Option[Array[Byte]] = {
    if (start + 8 > end) return None
    val numSps = b(start + 5) & 0x1f
    if (numSps < 1) return None
    val len = beU16(b, start + 6)
    val spsStart = start + 8
    if (len < 2 || spsStart + len > end) return None
    // drop the 1-byte NAL header (forbidden_zero/nal_ref_idc/type=7)
    Some(java.util.Arrays.copyOfRange(b, spsStart + 1, spsStart + len))
  }

  /** MSB-first bit reader over an H.264 RBSP with Exp-Golomb decode —
    * emulation-prevention bytes (00 00 03) are unescaped up front, per
    * the spec's RBSP extraction. Throws past-end; callers catch. */
  private final class RbspReader(raw: Array[Byte]) {
    private val b: Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(raw.length)
      var i = 0
      while (i < raw.length) {
        if (i + 2 < raw.length && raw(i) == 0 && raw(i + 1) == 0 &&
            raw(i + 2) == 3) {
          out.write(0); out.write(0); i += 3
        } else { out.write(raw(i)); i += 1 }
      }
      out.toByteArray
    }
    private var pos = 0
    def u1(): Int = {
      val bit = (b(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      bit
    }
    def u(n: Int): Int = { var v = 0; var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }; v }
    /** ue(v): count leading zeros, read that many more bits. */
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) {
        zeros += 1
        require(zeros <= 31, "Exp-Golomb run past 31 bits — corrupt SPS")
      }
      (1 << zeros) - 1 + u(zeros)
    }
    def se(): Int = { val k = ue(); if ((k & 1) == 1) (k + 1) / 2 else -(k / 2) }
  }

  /** Decode (width, height) from an H.264 SPS RBSP (header byte already
    * stripped): the mb-aligned coded size minus the declared frame
    * cropping, with the chroma-format-dependent crop units — the exact
    * display resolution, not the padded coded one. Pure bit arithmetic,
    * no decoding. */
  private[llm] def parseSpsDims(sps: Array[Byte]): Option[(Int, Int)] =
    try {
      val r = new RbspReader(sps)
      val profileIdc = r.u(8)
      r.u(8) // constraint flags + reserved
      r.u(8) // level_idc
      r.ue() // seq_parameter_set_id
      var chromaFormatIdc = 1 // 4:2:0 default for non-high profiles
      if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
          .contains(profileIdc)) {
        chromaFormatIdc = r.ue()
        if (chromaFormatIdc == 3) r.u1() // separate_colour_plane_flag
        r.ue(); r.ue() // bit depths
        r.u1() // qpprime_y_zero_transform_bypass
        if (r.u1() == 1) { // seq_scaling_matrix_present
          val nLists = if (chromaFormatIdc != 3) 8 else 12
          var i = 0
          while (i < nLists) {
            if (r.u1() == 1) { // scaling_list_present
              val size = if (i < 6) 16 else 64
              var lastScale = 8; var nextScale = 8; var j = 0
              while (j < size) {
                if (nextScale != 0)
                  nextScale = (lastScale + r.se() + 256) % 256
                if (nextScale != 0) lastScale = nextScale
                j += 1
              }
            }
            i += 1
          }
        }
      }
      r.ue() // log2_max_frame_num_minus4
      val pocType = r.ue()
      if (pocType == 0) r.ue()
      else if (pocType == 1) {
        r.u1(); r.se(); r.se()
        val n = r.ue()
        var i = 0
        while (i < n) { r.se(); i += 1 }
      }
      r.ue() // max_num_ref_frames
      r.u1() // gaps_in_frame_num_value_allowed
      val picWidthInMbs = r.ue() + 1
      val picHeightInMapUnits = r.ue() + 1
      val frameMbsOnly = r.u1()
      if (frameMbsOnly == 0) r.u1() // mb_adaptive_frame_field_flag
      r.u1() // direct_8x8_inference_flag
      var (cropL, cropR, cropT, cropB) = (0, 0, 0, 0)
      if (r.u1() == 1) { // frame_cropping_flag
        cropL = r.ue(); cropR = r.ue(); cropT = r.ue(); cropB = r.ue()
      }
      val (subW, subH) = chromaFormatIdc match {
        case 0 => (1, 1) // monochrome: crop units are luma samples
        case 1 => (2, 2) // 4:2:0
        case 2 => (2, 1) // 4:2:2
        case _ => (1, 1) // 4:4:4
      }
      val cropUnitX = subW
      val cropUnitY = subH * (2 - frameMbsOnly)
      val width = picWidthInMbs * 16 - (cropL + cropR) * cropUnitX
      val height =
        picHeightInMapUnits * 16 * (2 - frameMbsOnly) -
          (cropT + cropB) * cropUnitY
      if (width > 0 && height > 0) Some((width, height)) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Raw MJPEG stream parse: standalone JPEGs back to back, split by a
    * STRUCTURAL marker walk — never a bare SOI grep: an embedded JPEG
    * inside a metadata segment (an EXIF APP1 thumbnail) contains
    * FF D8 FF too, and splitting there would truncate the real frame
    * and surface the thumbnail as a bogus extra frame. Per frame:
    * length-carrying segments (APPn/DQT/DHT/SOF/...) are skipped
    * WHOLESALE (thumbnails inside never surface), entropy-coded data
    * after SOS is scanned for the next true marker (FF xx with xx
    * neither 00-stuffing nor an RST), and EOI closes the frame. Bytes
    * between frames (padding) are skipped to the next SOI; a frame
    * whose structure is corrupt or truncated is kept as one trailing
    * segment for the decoder to salvage or drop. No container, so no
    * frame rate. */
  private def parseMjpegStream(b: Array[Byte])
      : Option[(Float, Vector[(Int, Int)])] = {
    val n = b.length
    def u8(i: Int) = b(i) & 0xff
    val frames = Vector.newBuilder[(Int, Int)]
    var off = 0
    var corrupt = false
    while (!corrupt && off + 1 < n && u8(off) == 0xff && u8(off + 1) == 0xd8) {
      val start = off
      var i = off + 2
      var end = -1
      while (!corrupt && end < 0) {
        if (i + 1 >= n || u8(i) != 0xff) corrupt = true
        else u8(i + 1) match {
          case 0xff => i += 1                            // legal fill byte run
          case 0xd9 => end = i + 2                       // EOI
          case 0xd8 => corrupt = true                    // stray SOI at marker level
          case 0x01 => i += 2                            // TEM, parameterless
          case m if m >= 0xd0 && m <= 0xd7 => i += 2     // bare RST
          case 0xda =>                                   // SOS -> entropy scan
            if (i + 3 >= n) corrupt = true
            else {
              var j = i + 2 + ((u8(i + 2) << 8) | u8(i + 3))
              var found = -1
              while (found < 0 && !corrupt) {
                if (j + 1 >= n) corrupt = true
                else if (u8(j) != 0xff) j += 1
                else {
                  val m2 = u8(j + 1)
                  if (m2 == 0x00 || (m2 >= 0xd0 && m2 <= 0xd7)) j += 2
                  else found = j
                }
              }
              if (found >= 0) i = found
            }
          case _ =>                                      // length-carrying
            if (i + 3 >= n) corrupt = true
            else {
              val len = (u8(i + 2) << 8) | u8(i + 3)
              if (len < 2) corrupt = true else i += 2 + len
            }
        }
      }
      if (end >= 0) {
        frames += ((start, end - start))
        off = end
        // skip inter-frame padding to the next SOI
        while (off + 1 < n && !(u8(off) == 0xff && u8(off + 1) == 0xd8))
          off += 1
      } else frames += ((start, n - start))              // corrupt tail
    }
    val fs = frames.result()
    if (fs.isEmpty) None else Some((0.0f, fs))
  }

  /** Deterministic features from decoded video:
    * `[totalFrames, fps, width, height, meanLuma, meanFrameDiff,
    * lumaHistogram...]` — meanLuma and the `dim - 6` histogram slots
    * aggregate 8-bit ITU-R 601 luma over the sampled frames (same
    * weights as [[imageFeatures]]), meanFrameDiff is the mean absolute
    * luma delta between consecutive sampled frames (a motion proxy);
    * both normalized to [0, 1]. Plain integer pixel reads —
    * bit-identical across runs and partitionings. */
  private[llm] def videoFeatures(v: DecodedVideo, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (dim > 0) out(0) = v.totalFrames.toFloat
    if (dim > 1) out(1) = v.fps
    val first = v.frames.head
    if (dim > 2) out(2) = first.getWidth.toFloat
    if (dim > 3) out(3) = first.getHeight.toFloat
    val nHist = dim - 6
    val hist = new Array[Long](math.max(nHist, 1))
    var lumaSum = 0L
    var lumaN = 0L
    var diffSum = 0L
    var diffN = 0L
    var prev: Array[Int] = null
    v.frames.foreach { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val lumas = new Array[Int](w * h)
      val row = new Array[Int](math.max(w, 1))
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val luma = luma601(row(x))
          lumas(y * w + x) = luma
          lumaSum += luma
          if (nHist > 0) hist(luma * nHist / 256) += 1
          x += 1
        }
        y += 1
      }
      lumaN += lumas.length
      if (prev != null && prev.length == lumas.length) {
        var i = 0
        while (i < lumas.length) {
          diffSum += math.abs(lumas(i) - prev(i)); i += 1
        }
        diffN += lumas.length
      }
      prev = lumas
    }
    if (dim > 4 && lumaN > 0) out(4) = (lumaSum.toDouble / lumaN / 255.0).toFloat
    if (dim > 5 && diffN > 0) out(5) = (diffSum.toDouble / diffN / 255.0).toFloat
    if (nHist > 0 && lumaN > 0) {
      var j = 0
      while (j < nHist) {
        out(6 + j) = (hist(j).toDouble / lumaN).toFloat; j += 1
      }
    }
    out
  }

  /** STUB decoder: deterministic feature vector from byte histogram
    * moments. Replace with a real codec for production. */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    if (bytes.length > 0) out.indices.foreach(j => out(j) /= bytes.length)
    out
  }

  final case class ImageHashRow(media_id: Long, dhash: Option[Long])

  /** Perceptual 64-bit difference hash (dHash) per image payload — the
    * standard near-duplicate representation for image corpora: decode
    * (real, `javax.imageio`), deterministic nearest-neighbor rescale to
    * a 9x8 luma grid (ITU-R 601, the shared [[luma601]]), bit (x, y) =
    * luma(x+1, y) > luma(x, y). Horizontal-gradient signs are invariant
    * under uniform brightness/contrast shifts and JPEG requantization
    * noise, which is exactly what re-encoded copies of one image differ
    * by. Integer arithmetic end to end — bit-identical across JVMs and
    * partitionings. Payloads no reader decodes hash to null (one bad
    * record never fails the batch). */
  def imageDHash(spark: SparkSession, media: DataFrame)
      : Dataset[ImageHashRow] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"),
        col("bytes"), lit(0).as("width"), lit(0).as("height"))
      .as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val bytes = if (r.bytes == null) Array.emptyByteArray else r.bytes
          ImageHashRow(r.media_id, decodeImage(bytes).map { img =>
            val g = scaleImage(img, 9, 8)
            var h = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                h <<= 1
                if (luma601(g.getRGB(x + 1, y)) > luma601(g.getRGB(x, y)))
                  h |= 1L
                x += 1
              }
              y += 1
            }
            h
          })
        }
      }
  }

  /** Near-duplicate image candidate pairs at Hamming distance <=
    * `maxHamming` over [[imageDHash]] output — image-corpus dedup, the
    * visual sibling of the SimHash text pipeline. Pigeonhole block LSH:
    * the 64-bit hash splits into `maxHamming + 1` blocks, two hashes
    * within the radius must agree on at least one whole block, so
    * candidates come from equi-joins on (block index, block value) —
    * never an all-pairs product — and the exact distance check is one
    * codegen'd `bit_count(a ^ b)` per candidate. Requires
    * `maxHamming <= 7` (8+ blocks of a 64-bit hash stop pigeonholing
    * usefully and the radius stops meaning "same image").
    *
    * 100 TB shape: one narrow (media_id, dhash) table explodes to
    * `maxHamming + 1` block rows, ONE shuffle on the block key, pair
    * expansion only within equal-block buckets (the shared capped
    * [[Dedup.pairsFromMembers]] guard shape applies upstream when
    * corpora are degenerate), exact verify never touches pixels. */
  final case class AudioHashRow(media_id: Long, afp: Option[Long])

  /** 64-bit audio fingerprint from the REAL decoded waveform — a
    * chromaprint-lite over the loudness envelope: the mono signal
    * ([[decodeAudio]] — javax.sound PCM WAV, channel-averaged) splits
    * into 65 equal-width windows, each window accumulates its energy
    * (sum of squares, sequential IEEE order — deterministic across
    * partitionings), and bit i of the print is `energy(i+1) >
    * energy(i)` — the same delta-sign construction as [[imageDHash]]'s
    * luma gradients, so the print is invariant to uniform GAIN (a
    * re-mastered louder copy scales every energy by g² and no
    * comparison flips) and captures rhythm/dynamics structure.
    * Signals shorter than 65 samples (no full window grid) and
    * undecodable payloads fingerprint as null — route them by content
    * hash, the [[imageDHash]] contract. Near-dup pairing reuses the
    * SAME pigeonhole block-LSH verifier ([[imageNearDupPairs]] — it
    * never looks at what the 64 bits mean), so audio gets the
    * never-all-pairs pairing story for free. */
  def audioFingerprint(spark: SparkSession, media: DataFrame)
      : Dataset[AudioHashRow] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"),
        col("bytes"), lit(0).as("width"), lit(0).as("height"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = if (r.bytes == null) Array.emptyByteArray else r.bytes
          AudioHashRow(r.media_id, decodeAudio(bytes).flatMap {
            case (_, mono) =>
              val windows = 65
              if (mono.length < windows) None
              else {
                val e = new Array[Double](windows)
                var wi = 0
                while (wi < windows) {
                  // equal-width grid; the last window absorbs remainder
                  val lo = (mono.length.toLong * wi / windows).toInt
                  val hi =
                    if (wi == windows - 1) mono.length
                    else (mono.length.toLong * (wi + 1) / windows).toInt
                  var acc = 0.0
                  var i = lo
                  while (i < hi) { acc += mono(i).toDouble * mono(i); i += 1 }
                  e(wi) = acc
                  wi += 1
                }
                var h = 0L
                var i = 0
                while (i < 64) {
                  h <<= 1
                  if (e(i + 1) > e(i)) h |= 1L
                  i += 1
                }
                Some(h)
              }
          })
        }
      }
  }

  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7, s"maxHamming=$maxHamming")
    val nBlocks = maxHamming + 1
    val width = 64 / nBlocks
    val blocks = hashes.filter(col("dhash").isNotNull)
      .select(col("media_id"), col("dhash"),
        explode(sequence(lit(0), lit(nBlocks - 1))).as("block"))
      .withColumn("bval", {
        // top-aligned disjoint slices; the last block keeps the
        // remainder bits so all 64 participate (mask computed driver-
        // side: 1L << 64 wraps, so a full-width last block masks -1)
        val lastWidth = 64 - (nBlocks - 1) * width
        val lastMask = if (lastWidth >= 64) -1L else (1L << lastWidth) - 1
        when(col("block") < nBlocks - 1,
          expr(s"shiftrightunsigned(dhash, 64 - (block + 1) * $width)")
            .bitwiseAND(lit((1L << width) - 1)))
          .otherwise(col("dhash").bitwiseAND(lit(lastMask)))
      })
    val a = blocks.select(col("block"), col("bval"),
      col("media_id").as("id_a"), col("dhash").as("ha"))
    val b = blocks.select(col("block"), col("bval"),
      col("media_id").as("id_b"), col("dhash").as("hb"))
    a.join(b, Seq("block", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .groupBy("id_a", "id_b")        // same pair can match in >1 block
      .agg(min("hamming").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Resize as a per-partition batch transform: binary in, binary out,
    * metadata updated, the blob column only materialized inside the
    * partition iterator. `kind == "image"` payloads that decode go
    * through a REAL nearest-neighbor rescale and re-encode as PNG
    * (both ends pure-JVM `javax.imageio`/`java.awt`, deterministic);
    * everything else keeps the deterministic byte-downsample stub
    * (audio/video codecs are not in this container). */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): Dataset[MediaRow] = {
    require(targetW >= 1 && targetH >= 1, s"target ${targetW}x$targetH")
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"),
        col("bytes"), col("width").cast("int"), col("height").cast("int"))
      .as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          // null payload = empty payload, same contract as extractFeatures
          val bytes = if (r.bytes == null) Array.emptyByteArray else r.bytes
          val resized = (if (r.kind == "image") decodeImage(bytes) else None)
            .map(img => encodePng(scaleImage(img, targetW, targetH)))
            .getOrElse(resizeStub(bytes, targetW * targetH))
          MediaRow(r.media_id, r.kind, resized, targetW, targetH)
        }
      }
  }

  /** Nearest-neighbor rescale — the hint is set explicitly so the pixel
    * mapping is deterministic across JVMs (the default interpolation is
    * implementation-defined). */
  private def scaleImage(img: java.awt.image.BufferedImage,
                         w: Int, h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** STUB "resize": deterministic fixed-length downsample of the payload
    * (every ceil(n/target)-th byte). Replace with a real image scaler. */
  private def resizeStub(bytes: Array[Byte], targetLen: Int): Array[Byte] = {
    if (bytes.isEmpty || targetLen <= 0) return Array.emptyByteArray
    val n = math.min(targetLen, bytes.length)
    val step = bytes.length.toDouble / n
    Array.tabulate(n)(i => bytes((i * step).toInt))
  }

  /** Frame-sampling plan shape for video: pick every `stride`-th frame
    * index below `maxFrames` — pure metadata op until decode runs. */
  def frameSamplePlan(media: DataFrame, fps: Int, stride: Int,
                      maxFrames: Int): DataFrame = {
    // maxFrames = 0 would make sequence(0, -1) DESCEND ([0, -1] — Spark
    // defaults the step to -1 when start > stop) and claim frame 0;
    // stride = 0 is an ANSI modulo-by-zero. Fail fast on both.
    require(maxFrames >= 1, s"maxFrames=$maxFrames")
    require(stride >= 1, s"stride=$stride")
    media.select(col("media_id"),
      filter(sequence(lit(0), lit(maxFrames - 1)),
        i => i % stride === 0).as("frame_indices"),
      (octet_length(col("bytes")) / (fps.toLong max 1L)).as("approx_frame_bytes"))
  }
}
