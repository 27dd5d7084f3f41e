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
  * features. Video decode stays STUBBED with a deterministic fake
  * (no video codec ships with the JDK) behind the same batch
  * plumbing — swap `decodeStub`/`resizeStub` for a codec-backed
  * implementation (JNI or `mapInArrow` to a worker) without touching the
  * plan shape.
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
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"),
        col("bytes"), col("width").cast("int"), col("height").cast("int"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val feat = (r.kind match {
            case "image" => decodeImage(r.bytes).map(imageFeatures(_, featureDim))
            case "audio" => decodeAudio(r.bytes)
              .map { case (rate, samples) => audioFeatures(rate, samples, featureDim) }
            case _ => None
          }).getOrElse(decodeStub(r.bytes, featureDim))
          Feature(r.media_id, r.kind, r.bytes.length.toLong,
            java.security.MessageDigest.getInstance("SHA-256")
              .digest(r.bytes).take(8).map("%02x".format(_)).mkString,
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
        if (nHist > 0) {
          // 8-bit ITU-R 601 luma, bucketed over [0, 256)
          val luma = (299 * r + 587 * g + 114 * b) / 1000
          hist(luma * nHist / 256) += 1
        }
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

  /** Resize as a per-partition batch transform: binary in, binary out,
    * metadata updated, the blob column only materialized inside the
    * partition iterator. `kind == "image"` payloads that decode go
    * through a REAL nearest-neighbor rescale and re-encode as PNG
    * (both ends pure-JVM `javax.imageio`/`java.awt`, deterministic);
    * everything else keeps the deterministic byte-downsample stub
    * (audio/video codecs are not in this container). */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"),
        col("bytes"), col("width").cast("int"), col("height").cast("int"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val resized = (if (r.kind == "image") decodeImage(r.bytes) else None)
            .map(img => encodePng(scaleImage(img, targetW, targetH)))
            .getOrElse(resizeStub(r.bytes, targetW * targetH))
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
                      maxFrames: Int): DataFrame =
    media.select(col("media_id"),
      filter(sequence(lit(0), lit(maxFrames - 1)),
        i => i % stride === 0).as("frame_indices"),
      (octet_length(col("bytes")) / (fps.toLong max 1L)).as("approx_frame_bytes"))
}
