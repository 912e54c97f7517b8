package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque payload bytes + typed metadata. At 100 TB
  * the payload column dominates — keep it a single `binary` column so Parquet
  * stores it contiguously and Spark never deserializes it except inside the
  * decode stage. */
case class MediaRecord(
    media_id: Long,
    kind: String,            // "image" | "audio" | "video"
    bytes: Array[Byte],
    source: String)

/** Typed features extracted from a decoded payload. */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    n_frames: Int,
    brightness: Double)

/**
 * Multimodal-column plumbing: treat image/audio/video as opaque `binary`
 * columns; decode / feature-extract / frame-sample run as typed
 * `mapPartitions` stages (the Scala-native analogue of arrow-batched
 * `mapInPandas`) so decoder setup is amortized per JVM partition, not per
 * row, and the binary payload never round-trips through an interpreter.
 *
 * IMAGE payloads are decoded for real via `javax.imageio` (ships in the JDK:
 * PNG/BMP/GIF/JPEG readers) — width/height come from the actual bitmap
 * header and brightness is the mean RGB level over the decoded pixels.
 * AUDIO payloads are decoded for real via `javax.sound.sampled` (the JDK's
 * WAV/AIFF/AU readers) — sample rate, channel count and frame count come
 * from the actual container header, amplitude from the PCM samples.
 * VIDEO payloads are decoded for real when ImageIO can read them as
 * multi-frame streams (animated GIF — the one video-class container with a
 * JDK codec): frame count, dimensions, per-frame bitmaps and brightness
 * all come from the actual decoder. Codec-less formats (mp4/webm...) fall
 * back to the documented deterministic STUB — the remaining ffmpeg-binding
 * seam, now only for containers no JDK codec reads.
 */
object Multimodal {

  /** Number of rows a decode batch processes at once (mirrors the arrow batch
    * size knob of mapInPandas). */
  val DecodeBatchSize = 64

  /** Decode one record. Images and audio go through the real JDK codecs;
    * video tries the multi-frame ImageIO route (animated GIF — a real
    * video-class container the JDK ships a codec for) and falls back to
    * the stub only for formats no JDK codec reads (mp4/webm...). */
  private def decode(r: MediaRecord): MediaFeatures = r.kind match {
    case "image" => decodeImage(r)
    case "audio" => decodeAudio(r)
    case _       => decodeVideo(r)
  }

  /**
   * REAL video decode for containers ImageIO can read as multi-frame
   * streams — in practice animated GIF, the one video-class format with a
   * JDK codec: frame count from the actual stream (`getNumImages(true)`
   * walks every image), dimensions from frame 0, brightness as the mean
   * gray over EVERY frame's pixels. Payloads no ImageIO reader claims, or
   * that fail mid-decode, fall back to [[decodeStub]] — the documented
   * ffmpeg-binding seam, now only for codec-less formats.
   */
  private def decodeVideo(r: MediaRecord): MediaFeatures =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) decodeStub(r)
        else {
          val reader = readers.next()
          reader.setInput(iis)
          try {
            val frames = reader.getNumImages(true)
            if (frames <= 0) decodeStub(r)
            else {
              var total = 0L
              var pixels = 0L
              var w = 0
              var h = 0
              var k = 0
              while (k < frames) {
                val img = reader.read(k)
                if (k == 0) { w = img.getWidth; h = img.getHeight }
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val rgb = img.getRGB(x, y)
                    total += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
                    x += 1
                  }
                  y += 1
                }
                pixels += img.getWidth.toLong * img.getHeight
                k += 1
              }
              MediaFeatures(r.media_id, r.kind, r.bytes.length, w, h, frames,
                if (pixels == 0) 0.0 else total.toDouble / pixels)
            }
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => decodeStub(r) }

  /**
   * REAL image decode via `javax.imageio`: parses the actual payload bytes
   * (PNG/BMP/GIF/JPEG), takes width/height from the decoded bitmap, and
   * computes brightness as the mean of (R+G+B)/3 over every pixel. A payload
   * ImageIO cannot parse (corrupt bytes, unknown container) yields a
   * zero-dimension row rather than poisoning the whole 100 TB job — skippable
   * downstream with `width > 0`.
   */
  private def decodeImage(r: MediaRecord): MediaFeatures = {
    val img =
      // MemoryCacheImageInputStream: the default ImageIO.read(InputStream)
      // path spools every payload through a temp FILE on disk — pointless
      // churn for bytes already in memory. NonFatal, not just IOException:
      // the JDK plugins throw RuntimeExceptions (CMMException,
      // ArrayIndexOutOfBounds, NegativeArraySize...) on malformed payloads,
      // and one poison record must not kill the job.
      try javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(r.bytes)))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null)
      MediaFeatures(r.media_id, r.kind, r.bytes.length, 0, 0, 1, 0.0)
    else {
      val w = img.getWidth
      val h = img.getHeight
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      MediaFeatures(r.media_id, r.kind, r.bytes.length, w, h, 1,
        if (w == 0 || h == 0) 0.0 else sum.toDouble / (3.0 * w * h))
    }
  }

  /**
   * REAL audio decode via `javax.sound.sampled` (ships in the JDK: WAV, AIFF,
   * AU readers): parses the actual container header for sample rate, channel
   * count and frame count, then reads the PCM stream for the mean absolute
   * 16-bit sample amplitude. Feature mapping onto the shared schema:
   * `width` = sample rate (Hz), `height` = channels, `n_frames` = PCM frame
   * count, `brightness` = mean |sample| (0 for formats other than 16-bit
   * little-endian PCM — rate/frames still decode). Unparsable payloads yield
   * a zero-dimension row, same contract as [[decodeImage]].
   */
  private def decodeAudio(r: MediaRecord): MediaFeatures =
    riffPcm16(r.bytes) match {
      case Some((rate, channels, off, len)) =>
        // canonical fast path: pure array walk, no AudioSystem SPI dispatch
        MediaFeatures(r.media_id, r.kind, r.bytes.length,
          rate, channels, len / (2 * channels), meanAbs16(r.bytes, off, len))
      case None => decodeAudioJdk(r)
    }

  private[graft] def decodeAudioJdk(r: MediaRecord): MediaFeatures = {
    // the WHOLE decode is guarded, not just the header parse: the JDK sound
    // readers throw RuntimeExceptions (ArithmeticException on frameSize 0,
    // index errors...) on malformed BODIES too, and one poison record must
    // not kill the job — same contract as decodeImage
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.bytes))
      try {
        val fmt = ais.getFormat
        // NOT_SPECIFIED (-1) and > Int.MaxValue frame counts report as 0 —
        // "decoded but unknown length" — rather than a nonsense negative
        val fl = ais.getFrameLength
        val frames = if (fl < 0 || fl > Int.MaxValue) 0 else fl.toInt
        val amplitude =
          if (fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
              fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
            val pcm = ais.readAllBytes()
            meanAbs16(pcm, 0, pcm.length)
          } else 0.0
        MediaFeatures(r.media_id, r.kind, r.bytes.length,
          fmt.getSampleRate.toInt, fmt.getChannels, frames, amplitude)
      } finally ais.close()
    } catch {
      case scala.util.control.NonFatal(_) =>
        MediaFeatures(r.media_id, r.kind, r.bytes.length, 0, 0, 1, 0.0)
    }
  }

  /**
   * STUB DECODER for video containers NO JDK codec reads (mp4/webm... —
   * GIF-class payloads take the real [[decodeVideo]] route). Deterministic
   * fake: dimensions derive from the payload length, brightness is the mean
   * unsigned byte value. This is the remaining seam for a real ffmpeg-style
   * binding; everything around it is production-shaped.
   */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.bytes.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += r.bytes(i) & 0xff; i += 1 }
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      n_bytes = n,
      width = if (n == 0) 0 else n % 640,
      height = if (n == 0) 0 else n % 480,
      n_frames = r.kind match { case "video" => 1 + n % 30; case _ => 1 },
      brightness = if (n == 0) 0.0 else sum.toDouble / n)
  }

  /**
   * 64-bit average hash (aHash) of a decoded image — the classic perceptual
   * fingerprint: box-downsample to an 8x8 grid, bit (j*8 + i) set iff grid
   * cell (i, j)'s summed gray STRICTLY exceeds the image's overall mean
   * gray. Re-encodes of the same pixels (PNG vs BMP) hash identically and
   * near-identical pictures land within small Hamming distance, where
   * byte-level dedup sees unrelated payloads.
   *
   * Everything is exact integer arithmetic — cell gray sums are compared
   * against the global mean by cross-multiplication
   * (`cellSum * totalPixels > totalSum * cellPixels`), never a float — so
   * the hash is bit-reproducible on any engine, and the gate oracle
   * replays it in closed form over the synthetic gradient fixture. Cells
   * use integer-division bounds `[i*w/8, max(i*w/8+1, (i+1)*w/8))`, which
   * degrade to nearest-pixel sampling below 8x8 instead of dividing by
   * zero. Gray per pixel is `(r + g + b) / 3` integer-divided. Flat images
   * (every pixel equal) hash to 0 by construction — a known aHash
   * degeneracy, callers bucketing by hash should treat 0 as "no texture".
   */
  def aHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    if (w == 0 || h == 0) return 0L
    val gray = Array.ofDim[Long](h, w)
    var totalSum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val g = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        gray(y)(x) = g
        totalSum += g
        x += 1
      }
      y += 1
    }
    val totalN = w.toLong * h
    var hash = 0L
    var j = 0
    while (j < 8) {
      val y0 = j * h / 8
      val y1 = math.max(y0 + 1, (j + 1) * h / 8)
      var i = 0
      while (i < 8) {
        val x0 = i * w / 8
        val x1 = math.max(x0 + 1, (i + 1) * w / 8)
        var cellSum = 0L
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) { cellSum += gray(yy)(xx); xx += 1 }
          yy += 1
        }
        val cellN = (x1 - x0).toLong * (y1 - y0)
        if (cellSum * totalN > totalSum * cellN) hash |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    hash
  }

  /** Perceptual hashes of the image payloads: decode (same guarded ImageIO
    * path as [[extractFeatures]]) + [[aHash64]] per partition; undecodable
    * payloads are dropped (they have no pixels to fingerprint). */
  def imageAHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.flatMap { r =>
        val img =
          try javax.imageio.ImageIO.read(
            new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(r.bytes)))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) None else Some((r.media_id, aHash64(img)))
      }
    }.toDF("media_id", "ahash")
  }

  /** Near-duplicate image pairs by perceptual-hash Hamming distance —
    * [[imageAHashes]] fed through the same chunk-blocked engine the SimHash
    * text path uses ([[Dedup.hammingNearDupPairs]]): recall guaranteed to
    * Hamming 3, never an all-pairs comparison. */
  def imageNearDupPairs(media: Dataset[MediaRecord], maxHamming: Int = 3): DataFrame =
    Dedup.hammingNearDupPairs(imageAHashes(media), "media_id", "ahash", maxHamming)

  /** Perceptual hash per SAMPLED VIDEO FRAME — one row per
    * (media_id, frame_idx). Hashes are computed STRAIGHT off the container
    * decode (one reader walk per video), not via [[sampleFrames]]' BMP
    * re-encodes: routing through the payload surface would pay an extra
    * encode+decode per frame for nothing, and at 100 TB the codec boundary
    * IS the cost. Flat frames hash to 0 (the documented aHash degeneracy)
    * and are DROPPED: a featureless frame matches every other featureless
    * frame, which is noise, not evidence of shared content. */
  def videoFrameHashes(media: Dataset[MediaRecord], everyNth: Int = 10): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { r =>
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) Seq.empty
            else {
              val reader = readers.next()
              reader.setInput(iis)
              try {
                (0 until reader.getNumImages(true) by everyNth)
                  .map(f => (r.media_id, f, aHash64(reader.read(f))))
                  .filter(_._3 != 0L)
              } finally reader.dispose()
            }
          } finally if (iis != null) iis.close()
        } catch { case scala.util.control.NonFatal(_) => Seq.empty }
      }
    }.toDF("media_id", "frame_idx", "fhash")
  }

  /**
   * Content-based video near-duplication: two videos are near-dups when
   * they SHARE a frame — any sampled frame of one within `maxHamming` of
   * any sampled frame of the other (re-encodes, resolution-stable edits and
   * trims all survive the per-frame aHash). The frame-level mining rides
   * the same 4-chunk Hamming equi-join as SimHash text and image aHash —
   * never an all-pairs comparison over videos OR frames — and the video-
   * level rollup is one aggregation on the (smaller) matched-pair set.
   *
   * @return (media_id_a, media_id_b, n_frame_pairs) with a < b; higher
   *         n_frame_pairs = more shared content.
   */
  def videoNearDupPairs(
      media: Dataset[MediaRecord],
      maxHamming: Int = 3,
      everyNth: Int = 10): DataFrame = {
    val fh = videoFrameHashes(media, everyNth)
      .select(concat_ws(":", col("media_id"), col("frame_idx")).as("fid"), col("fhash"))
    Dedup.hammingNearDupPairs(fh, "fid", "fhash", maxHamming)
      .withColumn("v1", split(col("id1"), ":").getItem(0).cast("long"))
      .withColumn("v2", split(col("id2"), ":").getItem(0).cast("long"))
      .filter(col("v1") =!= col("v2"))
      .select(least(col("v1"), col("v2")).as("media_id_a"),
        greatest(col("v1"), col("v2")).as("media_id_b"))
      .groupBy("media_id_a", "media_id_b")
      .agg(count(lit(1)).as("n_frame_pairs"))
  }

  /** Synthetic gradient geometry for the aHash oracle: pixel gray =
    * `ax*x + by*y + c0` with coefficients small enough that no pixel wraps
    * past 255 (max 3*27 + 2*25 + 39 = 170 at the generator maxima w=28,
    * h=26), so the gray plane is LINEAR in
    * (x, y) and an independent engine can compute every 8x8 cell sum in
    * closed form. Images sharing (ax, by) differ only by the constant c0,
    * which shifts cell sums and the global mean equally — their aHashes
    * collide BY CONSTRUCTION (6 hash classes over the corpus), which is
    * exactly the near-dup structure the pairing operator mines. */
  def gradientAx(id: Long): Int = 1 + java.lang.Math.floorMod(id, 3L).toInt
  def gradientBy(id: Long): Int = 1 + java.lang.Math.floorMod(id, 2L).toInt
  def gradientC(id: Long): Int = java.lang.Math.floorMod(id, 40L).toInt

  /** A real decodable BMP whose gray plane is the linear gradient above —
    * same predictable-size uncompressed format as [[syntheticBmp]]. */
  def syntheticGradientBmp(id: Long): Array[Byte] = {
    val w = syntheticImageWidth(id)
    val h = syntheticImageHeight(id)
    val (ax, by, c0) = (gradientAx(id), gradientBy(id), gradientC(id))
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ax * x + by * y + c0
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  /**
   * 64-bit loudness-envelope signature of decoded 16-bit PCM audio — the
   * audio sibling of [[aHash64]]: samples split into 64 integer-bounded
   * windows, bit k set iff window k's summed |sample| STRICTLY exceeds the
   * track's overall mean level (cross-multiplied integers, no floats).
   * Re-encodes of the same samples collide; tracks with the same loudness
   * SHAPE land within small Hamming distance. Constant-level tracks hash
   * to 0 (the flat-image degeneracy, same caveat). Only the 16-bit
   * little-endian signed-PCM path yields a signature — other formats and
   * undecodable payloads return None.
   */
  def audioSignature64(bytes: Array[Byte]): Option[Long] =
    riffPcm16(bytes) match {
      case Some((_, _, off, len)) => envelope64(bytes, off, len)
      case None => audioSignature64Jdk(bytes)
    }

  /** The `javax.sound.sampled` route [[audioSignature64]] takes for
    * anything [[riffPcm16]] declines (AIFF, AU, extension-chunked or
    * malformed WAVs). Kept addressable so the fast-path parity law in
    * MultimodalSpec can compare the two on the same payloads. */
  private[graft] def audioSignature64Jdk(bytes: Array[Byte]): Option[Long] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val pcm = ais.readAllBytes()
          envelope64(pcm, 0, pcm.length)
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * Canonical RIFF/WAVE PCM16LE header walk — the fast path both audio
   * operators take before falling back to `javax.sound.sampled`: the x100
   * scale probe measured ~0.1 ms/clip on the JDK route, nearly all of it
   * AudioSystem SPI provider dispatch + stream plumbing, for containers a
   * 40-line chunk walk parses exactly. At 100 TB the codec boundary IS the
   * per-row cost, so the dominant on-disk format (plain PCM16 WAV) must not
   * pay generic-dispatch prices. Returns (sampleRate, channels, dataOffset,
   * dataByteLength) ONLY when the payload is unambiguously canonical —
   * PCM format tag 1, 16-bit, intact chunk sizes; anything else (AIFF, AU,
   * float/8-bit/extensible WAVs, truncated bodies) returns None and the
   * JDK readers decide, so the fallback NEVER changes a result, it only
   * changes who computes it (parity law in MultimodalSpec).
   */
  private[graft] def riffPcm16(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int, s: String): Boolean =
      bytes(o) == s.charAt(0).toByte && bytes(o + 1) == s.charAt(1).toByte &&
        bytes(o + 2) == s.charAt(2).toByte && bytes(o + 3) == s.charAt(3).toByte
    if (bytes.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var fmt = Option.empty[(Int, Int)] // (rate, channels), PCM16 verified
    var data = Option.empty[(Int, Int)] // (offset, length)
    var o = 12
    while (o + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val size = u32(o + 4)
      val body = o + 8
      if (size > bytes.length - body) return None // truncated/corrupt: JDK decides
      val end = body + size.toInt
      if (tag(o, "fmt ")) {
        if (size < 16) return None
        val rate = u32(body + 4)
        val channels = u16(body + 2)
        if (u16(body) != 1 || u16(body + 14) != 16 ||
            channels < 1 || rate <= 0 || rate > 10000000) return None
        fmt = Some((rate.toInt, channels))
      } else if (tag(o, "data")) {
        data = Some((body, size.toInt))
      }
      o = end + (size.toInt & 1) // chunks are word-aligned; skip pad bytes
    }
    for ((r, c) <- fmt; (off, len) <- data) yield (r, c, off, len)
  }

  /** Mean |sample| of 16-bit little-endian PCM at `bytes[off, off+len)`. */
  private def meanAbs16(bytes: Array[Byte], off: Int, len: Int): Double = {
    var sum = 0L
    var i = off
    val end = off + len
    while (i + 1 < end) {
      sum += math.abs(((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt)
      i += 2
    }
    val samples = len / 2
    if (samples == 0) 0.0 else sum.toDouble / samples
  }

  /** The 64-window loudness envelope over 16-bit LE PCM at
    * `bytes[off, off+len)` — shared by the fast path and the JDK route so
    * the two can only differ in who PARSED the container, never in the
    * signature arithmetic. */
  private def envelope64(bytes: Array[Byte], off: Int, len: Int): Option[Long] = {
    val n = len / 2
    if (n < 64) None
    else {
      val abs = new Array[Long](n)
      var total = 0L
      var i = 0
      while (i < n) {
        val v = math.abs(((bytes(off + 2 * i) & 0xff) |
          (bytes(off + 2 * i + 1) << 8)).toShort.toInt).toLong
        abs(i) = v
        total += v
        i += 1
      }
      var hash = 0L
      var k = 0
      while (k < 64) {
        val w0 = k * n / 64
        val w1 = (k + 1) * n / 64
        var sum = 0L
        var j = w0
        while (j < w1) { sum += abs(j); j += 1 }
        if (sum * n > total * (w1 - w0)) hash |= 1L << k
        k += 1
      }
      Some(hash)
    }
  }

  /** Loudness signatures of the audio payloads (None rows dropped). */
  def audioSignatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap(r => audioSignature64(r.bytes).map(sig => (r.media_id, sig)))
    }.toDF("media_id", "asig")
  }

  /** Near-duplicate audio pairs by envelope-signature Hamming distance —
    * same chunk-blocked engine as text SimHash and image aHash. */
  def audioNearDupPairs(media: Dataset[MediaRecord], maxHamming: Int = 3): DataFrame =
    Dedup.hammingNearDupPairs(audioSignatures(media), "media_id", "asig", maxHamming)

  /** Per-window amplitude of the modulated fixture WAV: window k of track
    * `id` plays a square wave at EXACTLY this level, so the decoded window
    * mean |sample| is analytic and the signature oracle needs no samples. */
  def modulatedWavAmp(id: Long, k: Int): Int =
    500 + 250 * java.lang.Math.floorMod(id + k, 8L).toInt

  /** A real decodable WAV whose loudness envelope is the 64-step modulation
    * above: window boundaries use the SAME integer bounds the signature
    * does, so generation and fingerprinting tile the samples identically. */
  def syntheticModulatedWav(id: Long): Array[Byte] = {
    val rate = syntheticWavRate(id)
    val n = syntheticWavSamples(id) // 400..999: always >= 64 samples
    val dataSize = 2 * n
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var k = 0
    while (k < 64) {
      val amp = modulatedWavAmp(id, k)
      var i = k * n / 64
      val end = (k + 1) * n / 64
      while (i < end) {
        buf.putShort((if (i % 2 == 0) amp else -amp).toShort)
        i += 1
      }
      k += 1
    }
    buf.array()
  }

  /** Decode + feature-extract, batched per partition. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        // per-batch decode: a native codec binding would be handed the whole
        // batch here; ImageIO is invoked per record within it
        batch.iterator.map(decode)
      }
    }
  }

  /** Frame sampling for video payloads. ImageIO-readable containers
    * (animated GIF) yield REAL frames: every `everyNth`-th frame is decoded
    * and re-encoded as an uncompressed BMP, so `frame_bytes` is a genuine
    * standalone bitmap the image operators compose with directly
    * (sampleFrames → [[imageAHashes]] is the video-near-dup pipeline).
    * Codec-less payloads keep the deterministic byte-range-slice stub rows.
    * Output one row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRecord], everyNth: Int = 10): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      realSampledFrames(r, everyNth).getOrElse {
        val frames = decodeStub(r).n_frames
        (0 until frames by everyNth).map { f =>
          val start = if (frames == 0) 0 else (r.bytes.length.toLong * f / frames).toInt
          val end = math.min(r.bytes.length, start + 16)
          (r.media_id, f, java.util.Arrays.copyOfRange(r.bytes, start, end))
        }
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** The real-decode arm of [[sampleFrames]]: None when no ImageIO reader
    * claims the payload (→ stub rows), Some(decoded frames) otherwise. */
  private def realSampledFrames(
      r: MediaRecord, everyNth: Int): Option[Seq[(Long, Int, Array[Byte])]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          reader.setInput(iis)
          try {
            val frames = reader.getNumImages(true)
            if (frames <= 0) None
            else Some((0 until frames by everyNth).map { f =>
              val img = reader.read(f)
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(toBgr(img), "bmp", out)
              (r.media_id, f, out.toByteArray)
            })
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** BMP's writer wants a 3-byte BGR raster; palette-indexed GIF frames
    * convert losslessly. */
  private def toBgr(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
    val bgr = new java.awt.image.BufferedImage(
      img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = bgr.createGraphics()
    try g.drawImage(img, 0, 0, null) finally g.dispose()
    bgr
  }

  /** Synthetic-image geometry, shared by the fixture generator and the DuckDB
    * oracle: every quantity is a pure function of the id so an independent
    * engine can predict what the REAL decoder will read back out of the
    * generated bitmap. */
  def syntheticImageWidth(id: Long): Int = 16 + java.lang.Math.floorMod(id, 13L).toInt
  def syntheticImageHeight(id: Long): Int = 16 + java.lang.Math.floorMod(id * 7, 11L).toInt
  def syntheticImageGray(id: Long): Int = java.lang.Math.floorMod(id * 37, 256L).toInt

  /** A real, decodable BMP payload (uncompressed 24bpp, uniform gray fill).
    * BMP because its size is analytically predictable — 54-byte header plus
    * height rows padded to 4 bytes — which keeps `n_bytes` oracle-checkable,
    * unlike a compressed PNG. */
  def syntheticBmp(id: Long): Array[Byte] = {
    val w = syntheticImageWidth(id)
    val h = syntheticImageHeight(id)
    val g = syntheticImageGray(id)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val gfx = img.createGraphics()
    try {
      gfx.setColor(new java.awt.Color(g, g, g))
      gfx.fillRect(0, 0, w, h)
    } finally gfx.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  /** Expected on-disk size of [[syntheticBmp]] — 14-byte file header +
    * 40-byte BITMAPINFOHEADER + rows padded to 4-byte boundaries. Pinned
    * against the actual writer output in MultimodalSpec. */
  def syntheticBmpSize(id: Long): Int = {
    val w = syntheticImageWidth(id)
    val h = syntheticImageHeight(id)
    54 + h * ((w * 3 + 3) / 4 * 4)
  }

  /** Synthetic-audio geometry, shared by the fixture generator and the DuckDB
    * oracle — pure functions of the id, so an independent engine can predict
    * what the REAL decoder reads back out of the generated WAV. */
  def syntheticWavRate(id: Long): Int = 8000 + java.lang.Math.floorMod(id, 5L).toInt * 2000
  def syntheticWavSamples(id: Long): Int = 400 + java.lang.Math.floorMod(id * 13, 600L).toInt
  def syntheticWavAmplitude(id: Long): Int = 1000 + java.lang.Math.floorMod(id * 31, 20000L).toInt

  /** A real, decodable WAV payload: 44-byte canonical RIFF/PCM header +
    * 16-bit little-endian mono square wave at constant amplitude A
    * (samples alternate +A/-A, so the decoded mean |sample| is EXACTLY A and
    * the file size is exactly 44 + 2*n — both oracle-checkable, the audio
    * analogue of the uncompressed-BMP trick). */
  def syntheticWav(id: Long): Array[Byte] = {
    val rate = syntheticWavRate(id)
    val n = syntheticWavSamples(id)
    val amp = syntheticWavAmplitude(id)
    val dataSize = 2 * n
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)           // PCM
      .putShort(1)           // mono
      .putInt(rate)
      .putInt(rate * 2)      // byte rate
      .putShort(2)           // block align
      .putShort(16)          // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) {
      buf.putShort((if (i % 2 == 0) amp else -amp).toShort)
      i += 1
    }
    buf.array()
  }

  /** Expected on-disk size of [[syntheticWav]]. */
  def syntheticWavSize(id: Long): Int = 44 + 2 * syntheticWavSamples(id)

  /** Synthetic-video geometry — pure functions of the id, the video leg of
    * the BMP/WAV trick: an independent engine predicts what the REAL ImageIO
    * GIF reader decodes out of the generated container. */
  def syntheticGifWidth(id: Long): Int = 10 + java.lang.Math.floorMod(id, 7L).toInt
  def syntheticGifHeight(id: Long): Int = 8 + java.lang.Math.floorMod(id * 3, 6L).toInt
  def syntheticGifFrames(id: Long): Int = 2 + java.lang.Math.floorMod(id * 5, 9L).toInt

  /** Palette index of frame k's uniform fill; the 128-entry global palette
    * maps index i to gray (2i, 2i, 2i), so the DECODED gray is exactly
    * `2 * syntheticGifIndex(id, k)`. */
  def syntheticGifIndex(id: Long, k: Int): Int =
    java.lang.Math.floorMod(id * 11 + k * 7, 128L).toInt

  /**
   * A real, decodable multi-frame GIF89a payload with an analytically
   * predictable size — the video analogue of the uncompressed-BMP /
   * canonical-WAV fixtures. GIF mandates LZW, which normally makes sizes
   * data-dependent; this writer uses the classic UNCOMPRESSED-GIF technique
   * instead: minimum code size 7 makes every code exactly one byte (width
   * m+1 = 8), and a CLEAR code re-emitted after every 126 pixel codes keeps
   * the decoder's table below 256 entries so the code width NEVER grows —
   * the stream is then `pixels + clears + end` bytes by construction, and
   * [[syntheticGifSize]] states the whole container size in closed form.
   * Frames are uniform fills of palette index [[syntheticGifIndex]] over a
   * 128-gray global palette. Any conformant GIF decoder (ImageIO's
   * included) reads it; only the ENCODER is special.
   */
  def syntheticAnimatedGif(id: Long): Array[Byte] = {
    val w = syntheticGifWidth(id)
    val h = syntheticGifHeight(id)
    encodeGif(w, h, (0 until syntheticGifFrames(id)).map { k =>
      Array.fill(w * h)(syntheticGifIndex(id, k).toByte)
    })
  }

  /**
   * The uncompressed-LZW GIF writer behind [[syntheticAnimatedGif]],
   * generalized to arbitrary per-frame index rasters (row-major, values
   * 0..127 over the 128-gray global palette: index i decodes to gray 2i).
   * Size is `13 + 384 + Σ (12 + data + subblocks) + 1` regardless of pixel
   * CONTENT — the trick removes the data-dependence LZW normally has —
   * so [[syntheticGifSize]] stays exact for any raster. Specs use this to
   * build TEXTURED multi-frame videos for the frame-fingerprint operators.
   */
  private[graft] def encodeGif(w: Int, h: Int, frameIndices: Seq[Array[Byte]]): Array[Byte] = {
    require(frameIndices.nonEmpty, "need at least one frame")
    require(frameIndices.forall(_.length == w * h), "each frame must be w*h indices")
    // an index >= 128 would collide with the CLEAR (0x80) / END (0x81)
    // codes and silently corrupt the stream — refuse loudly instead
    require(frameIndices.forall(_.forall(b => (b & 0xff) < 128)),
      "palette indices must be < 128")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xF6) // global palette, 8-bit color res, 2^(6+1)=128 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 128) { out.write(2 * i); out.write(2 * i); out.write(2 * i); i += 1 }
    frameIndices.foreach { idx =>
      out.write(0x2C) // image descriptor
      u16(0); u16(0); u16(w); u16(h)
      out.write(0) // no local palette, not interlaced
      out.write(7) // LZW minimum code size
      val clear = 0x80
      val end = 0x81
      val p = w * h
      val data = new Array[Byte](gifDataBytes(p))
      var d = 0
      data(d) = clear.toByte; d += 1
      var emitted = 0
      while (emitted < p) {
        if (emitted > 0 && emitted % 126 == 0) { data(d) = clear.toByte; d += 1 }
        data(d) = idx(emitted); d += 1
        emitted += 1
      }
      data(d) = end.toByte; d += 1
      require(d == data.length, s"gif codegen drift: $d != ${data.length}")
      var off = 0
      while (off < data.length) { // 255-byte sub-blocks
        val n = math.min(255, data.length - off)
        out.write(n)
        out.write(data, off, n)
        off += n
      }
      out.write(0) // sub-block terminator
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Code-stream bytes for one `p`-pixel frame: initial CLEAR + pixels +
    * a CLEAR per full 126-pixel run boundary + END, every code one byte. */
  private def gifDataBytes(p: Int): Int = p + (p + 125) / 126 + 1

  /**
   * Single TEXTURED 8x8-frame GIF for the video near-dup gate fixture: at
   * 8x8 every aHash cell is one pixel, so the frame's aHash is EXACTLY the
   * 64-bit pattern the raster encodes (index 100 → gray 200 for set bits,
   * 0 for clear; the mean sits strictly between whenever the pattern is
   * neither all-ones nor all-zeros). The pattern derives from id/6 via
   * splitmix64 with one bit flipped for the second member (id ≡ 5 mod 6)
   * of each consecutive video-id pair — so videos 6g+2 and 6g+5 share a
   * frame at Hamming 1 BY CONSTRUCTION and everything else is an
   * independent 64-bit draw, which gives [[videoNearDupPairs]] a
   * structure-stating DuckDB oracle.
   */
  def syntheticPatternGif(id: Long): Array[Byte] = {
    val base = mix64(java.lang.Math.floorDiv(id, 6L))
    val pattern = if (java.lang.Math.floorMod(id, 6L) == 5L) base ^ 4L else base
    encodeGif(8, 8, Seq(Array.tabulate(64)(i =>
      if ((pattern >>> i & 1L) == 1L) 100.toByte else 0.toByte)))
  }

  /** splitmix64 finalizer — the fixture's pattern source. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Expected on-disk size of [[syntheticAnimatedGif]] — 13-byte header +
    * 384-byte palette + per frame (10-byte descriptor + 1 min-code-size +
    * data + one length byte per 255-byte sub-block + terminator) + trailer.
    * Pinned against the actual writer AND the ImageIO reader in
    * MultimodalSpec. */
  def syntheticGifSize(id: Long): Int = {
    val p = syntheticGifWidth(id) * syntheticGifHeight(id)
    val db = gifDataBytes(p)
    val subBlocks = (db + 254) / 255
    13 + 384 + syntheticGifFrames(id) * (10 + 1 + db + subBlocks + 1) + 1
  }

  /** Build a MediaRecord dataset from the documents table: image rows carry a
    * REAL generated BMP (decodable by ImageIO), audio rows a REAL generated
    * WAV (decodable by javax.sound.sampled), video rows a REAL generated
    * multi-frame GIF (decodable by ImageIO's GIF reader) — so the multimodal
    * plumbing including all three real decodes is exercisable on the
    * standard testdata. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, _, source) =>
        // floorMod: Scala's % is negative for negative ids, and nothing
        // forbids them in the schema (the columnar original used pmod)
        val kind = Seq("image", "audio", "video")(java.lang.Math.floorMod(id, 3L).toInt)
        val bytes = kind match {
          case "image" => syntheticBmp(id)
          case "audio" => syntheticWav(id)
          case _       => syntheticAnimatedGif(id)
        }
        MediaRecord(id, kind, bytes, source)
      }
  }
}
