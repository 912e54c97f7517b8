package graft.operators

import graft.TestSpark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class MultimodalSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  val media = Seq(
    MediaRecord(1L, "image", Multimodal.syntheticBmp(1L), "s1"),
    MediaRecord(2L, "video", Array.tabulate[Byte](100)(_.toByte), "s1"),
    MediaRecord(3L, "audio", Array.empty[Byte], "s2")
  ).toDS()

  "extractFeatures" should "REALLY decode image payloads via javax.imageio" in {
    // a 20x30 PNG with a known non-uniform pattern, written by ImageIO here:
    // the stub would report width = n_bytes % 640, the real decoder must
    // report the bitmap header's 20x30 regardless of the compressed size
    val w = 20; val h = 30
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val level = (x * 8 + y) % 256
      img.setRGB(x, y, new java.awt.Color(level, 255 - level, level / 2).getRGB)
      sum += level + (255 - level) + level / 2
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val png = out.toByteArray

    val f = Multimodal.extractFeatures(
      Seq(MediaRecord(7L, "image", png, "t")).toDS()).head()
    f.width shouldBe w
    f.height shouldBe h
    f.n_bytes shouldBe png.length
    f.n_frames shouldBe 1
    f.brightness shouldBe sum.toDouble / (3.0 * w * h)
    // and the stub would have said something else entirely
    f.width should not be (png.length % 640)
  }

  it should "yield a zero-dimension row (not a crash) for an undecodable image payload" in {
    val f = Multimodal.extractFeatures(
      Seq(MediaRecord(8L, "image", "definitely not a bitmap".getBytes("UTF-8"), "t")).toDS()).head()
    f.width shouldBe 0
    f.height shouldBe 0
    f.brightness shouldBe 0.0
    f.n_bytes shouldBe 23
  }

  it should "decode the synthetic BMP fixture to its generated geometry" in {
    val f = Multimodal.extractFeatures(media).collect().map(m => m.media_id -> m).toMap
    f(1L).width shouldBe Multimodal.syntheticImageWidth(1L)
    f(1L).height shouldBe Multimodal.syntheticImageHeight(1L)
    // uniform gray fill: mean RGB level IS the gray level, exactly
    f(1L).brightness shouldBe Multimodal.syntheticImageGray(1L).toDouble
    f(1L).n_bytes shouldBe Multimodal.syntheticBmpSize(1L)
    // a codec-less video payload (no ImageIO magic) goes through the stub
    f(2L).n_frames shouldBe 1 + 100 % 30
    f(2L).width shouldBe 100 % 640
    // empty audio payload: unparsable -> zero-dimension row, no crash
    f(3L).n_bytes shouldBe 0
    f(3L).width shouldBe 0
    f(3L).brightness shouldBe 0.0
  }

  it should "REALLY decode audio payloads via javax.sound.sampled" in {
    // a WAV written by the JDK's own AudioSystem (stereo, 22050 Hz, 500
    // frames of constant +3000/-3000): the real decoder must report the
    // container's rate/channels/frames, not anything byte-length-derived
    val rate = 22050f; val frames = 500
    val pcm = java.nio.ByteBuffer.allocate(frames * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until frames).foreach { i =>
      val s = (if (i % 2 == 0) 3000 else -3000).toShort
      pcm.putShort(s); pcm.putShort(s) // both channels
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.array()), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val wav = out.toByteArray

    val f = Multimodal.extractFeatures(
      Seq(MediaRecord(9L, "audio", wav, "t")).toDS()).head()
    f.width shouldBe 22050    // sample rate from the header
    f.height shouldBe 2       // channels
    f.n_frames shouldBe frames
    f.brightness shouldBe 3000.0 // constant |amplitude|, exactly
    f.n_bytes shouldBe wav.length
  }

  it should "yield a zero-dimension row for an undecodable audio payload" in {
    val f = Multimodal.extractFeatures(
      Seq(MediaRecord(10L, "audio", "definitely not a riff".getBytes("UTF-8"), "t")).toDS()).head()
    f.width shouldBe 0
    f.height shouldBe 0
    f.brightness shouldBe 0.0
  }

  it should "decode the synthetic WAV fixture to its generated geometry" in {
    val id = 4L // an audio id (4 % 3 == 1)
    val f = Multimodal.extractFeatures(
      Seq(MediaRecord(id, "audio", Multimodal.syntheticWav(id), "t")).toDS()).head()
    f.width shouldBe Multimodal.syntheticWavRate(id)
    f.height shouldBe 1
    f.n_frames shouldBe Multimodal.syntheticWavSamples(id)
    f.brightness shouldBe Multimodal.syntheticWavAmplitude(id).toDouble
    f.n_bytes shouldBe Multimodal.syntheticWavSize(id)
  }

  "syntheticWavSize" should "predict the generator output and parse under AudioSystem for every fixture id" in {
    (1L until 60L by 3).foreach { id =>
      val wav = Multimodal.syntheticWav(id)
      wav.length shouldBe Multimodal.syntheticWavSize(id)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      ais.getFormat.getSampleRate shouldBe Multimodal.syntheticWavRate(id).toFloat
      ais.getFrameLength shouldBe Multimodal.syntheticWavSamples(id).toLong
      ais.close()
    }
  }

  "syntheticBmpSize" should "predict the actual BMP writer output for every fixture id" in {
    (0L until 60L by 3).foreach { id =>
      Multimodal.syntheticBmp(id).length shouldBe Multimodal.syntheticBmpSize(id)
    }
  }

  "sampleFrames" should "emit one row per sampled frame for videos only" in {
    val frames = Multimodal.sampleFrames(media, everyNth = 3).collect()
    frames.map(_.getAs[Long]("media_id")).distinct shouldBe Array(2L)
    val expected = (0 until (1 + 100 % 30) by 3).size
    frames.length shouldBe expected
    frames.foreach(r => r.getAs[Array[Byte]]("frame_bytes").length should be <= 16)
  }

  private def gradientImage(w: Int, h: Int, f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val g = f(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    img
  }
  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  "aHash64" should "be invariant across lossless re-encodes and degenerate on flat images" in {
    val img = gradientImage(32, 24, (x, y) => 2 * x + 3 * y)
    val viaBmp = Multimodal.aHash64(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(encode(img, "bmp"))))
    val viaPng = Multimodal.aHash64(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(encode(img, "png"))))
    viaBmp shouldBe viaPng // same pixels, different container
    viaBmp should not be 0L
    // flat image: no cell strictly exceeds the mean -> the documented 0 hash
    Multimodal.aHash64(gradientImage(16, 16, (_, _) => 137)) shouldBe 0L
  }

  it should "place perturbed copies near and different pictures far" in {
    val base = gradientImage(32, 32, (x, y) => 3 * x + 2 * y)
    // same picture with a tiny local perturbation: one corner cell brightened
    val nearDup = gradientImage(32, 32, (x, y) =>
      if (x < 2 && y < 2) 3 * x + 2 * y + 6 else 3 * x + 2 * y)
    // structurally different: the gradient runs the other way
    val far = gradientImage(32, 32, (x, y) => 200 - 3 * x - 2 * y)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val hBase = Multimodal.aHash64(base)
    ham(hBase, Multimodal.aHash64(nearDup)) should be <= 3
    ham(hBase, Multimodal.aHash64(far)) should be > 16
  }

  "imageNearDupPairs" should "mine exactly the planted near-identical images" in {
    def media(id: Long, img: java.awt.image.BufferedImage) =
      MediaRecord(id, "image", encode(img, "png"), "s")
    val base = gradientImage(32, 32, (x, y) => 3 * x + 2 * y)
    val tweak = gradientImage(32, 32, (x, y) =>
      if (x < 2 && y < 2) 3 * x + 2 * y + 6 else 3 * x + 2 * y)
    val far = gradientImage(32, 32, (x, y) => 200 - 3 * x - 2 * y)
    val corrupt = MediaRecord(9L, "image", Array[Byte](1, 2, 3), "s") // undecodable: dropped
    val ds = Seq(media(1L, base), media(2L, tweak), media(3L, far), corrupt).toDS()
    val pairs = Multimodal.imageNearDupPairs(ds, maxHamming = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L))
  }

  "audioSignature64" should "fingerprint the loudness envelope, degenerate on constant level" in {
    val sig = Multimodal.audioSignature64(Multimodal.syntheticModulatedWav(7L))
    sig should not be None
    sig.get should not be 0L
    // constant-amplitude square wave: every window equals the mean -> 0
    Multimodal.audioSignature64(Multimodal.syntheticWav(7L)) shouldBe Some(0L)
    // undecodable payloads yield None
    Multimodal.audioSignature64(Array[Byte](1, 2, 3)) shouldBe None
  }

  "riffPcm16 fast path" should "agree with the AudioSystem route on every canonical payload" in {
    // the fast path may only change WHO computes, never the result: compare
    // signature and features against the JDK route across the fixture ids
    (0L until 40L).foreach { id =>
      Seq(Multimodal.syntheticWav(id), Multimodal.syntheticModulatedWav(id)).foreach { wav =>
        withClue(s"id $id (${wav.length} bytes): ") {
          Multimodal.riffPcm16(wav) should not be None // fixtures ARE canonical
          Multimodal.audioSignature64(wav) shouldBe Multimodal.audioSignature64Jdk(wav)
          val rec = MediaRecord(id, "audio", wav, "t")
          val jdk = Multimodal.decodeAudioJdk(rec)
          val f = Multimodal.extractFeatures(Seq(rec).toDS()).head()
          (f.width, f.height, f.n_frames, f.brightness) shouldBe
            ((jdk.width, jdk.height, jdk.n_frames, jdk.brightness))
        }
      }
    }
  }

  it should "decline non-canonical containers and leave them to the JDK readers" in {
    // an AudioSystem-written WAV for a 2-channel stream (the spec fixture
    // above) IS canonical; make one with an unknown chunk prepended — the
    // walk must skip it and still parse
    val base = Multimodal.syntheticWav(5L)
    val extra = java.nio.ByteBuffer.allocate(base.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // rebuild: RIFF header, then a LIST chunk of 4 bytes, then the original chunks
    extra.put(base, 0, 12)
    extra.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
    extra.put(base, 12, base.length - 12)
    val withList = extra.array()
    // fix the RIFF size field (bytes 4-7): grew by 12
    val riffSize = (base.length - 8) + 12
    withList(4) = (riffSize & 0xff).toByte
    withList(5) = ((riffSize >> 8) & 0xff).toByte
    withList(6) = ((riffSize >> 16) & 0xff).toByte
    withList(7) = ((riffSize >> 24) & 0xff).toByte
    Multimodal.riffPcm16(withList).map(t => (t._1, t._2)) shouldBe
      Some((Multimodal.syntheticWavRate(5L), 1))
    Multimodal.audioSignature64(withList) shouldBe Multimodal.audioSignature64(base)

    // truncated data chunk: declared size exceeds the payload — decline
    val truncated = java.util.Arrays.copyOf(base, base.length - 10)
    Multimodal.riffPcm16(truncated) shouldBe None
    // not-a-RIFF and too-short payloads: decline
    Multimodal.riffPcm16("definitely not a riff".getBytes("UTF-8")) shouldBe None
    Multimodal.riffPcm16(Array[Byte](1, 2, 3)) shouldBe None
  }

  it should "agree with the JDK route on randomized canonical WAVs, junk chunks skipped" in {
    def buildWav(rate: Int, pcm: Array[Short], junk: Option[Array[Byte]]): Array[Byte] = {
      val dataSize = 2 * pcm.length
      val junkSize = junk.map(j => 8 + j.length + (j.length & 1)).getOrElse(0)
      val buf = java.nio.ByteBuffer.allocate(44 + junkSize + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + junkSize + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      junk.foreach { j =>
        buf.put("JUNK".getBytes("US-ASCII")).putInt(j.length).put(j)
        if ((j.length & 1) == 1) buf.put(0.toByte) // word-alignment pad byte
      }
      buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
      pcm.foreach(buf.putShort)
      buf.array()
    }
    val rnd = new scala.util.Random(31)
    (1 to 25).foreach { trial =>
      val n = 70 + rnd.nextInt(900)
      val rate = 8000 + rnd.nextInt(40000)
      val pcm = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val plain = buildWav(rate, pcm, None)
      withClue(s"trial $trial (n=$n rate=$rate): ") {
        Multimodal.riffPcm16(plain).map(t => (t._1, t._2)) shouldBe Some((rate, 1))
        // parity on the canonical form...
        Multimodal.audioSignature64(plain) shouldBe Multimodal.audioSignature64Jdk(plain)
        // ...and a JUNK chunk (odd-sized half the time, exercising the pad
        // byte) changes NOTHING: same samples, same signature
        val junk = Array.fill(5 + rnd.nextInt(9))(rnd.nextInt(256).toByte)
        Multimodal.audioSignature64(buildWav(rate, pcm, Some(junk))) shouldBe
          Multimodal.audioSignature64(plain)
      }
    }
  }

  "the round-10 parsers" should "survive random corruption and truncation (poison-record law)" in {
    // one corrupt payload must never kill a 100 TB job: every byte-flip or
    // truncation of a valid container must DEGRADE (stub row / None /
    // fewer frames), never throw out of the operator
    val rnd = new scala.util.Random(57)
    val gif = Multimodal.syntheticAnimatedGif(8L)
    val wav = Multimodal.syntheticWav(4L)
    (1 to 100).foreach { trial =>
      def corrupt(base: Array[Byte]): Array[Byte] = {
        val b = base.clone()
        (0 until 1 + rnd.nextInt(4)).foreach { _ =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        }
        if (trial % 3 == 0) java.util.Arrays.copyOf(b, 1 + rnd.nextInt(b.length)) else b
      }
      val badGif = corrupt(gif)
      val badWav = corrupt(wav)
      withClue(s"trial $trial: ") {
        noException should be thrownBy Multimodal.extractFeatures(Seq(
          MediaRecord(1L, "video", badGif, "t"),
          MediaRecord(2L, "audio", badWav, "t"),
          MediaRecord(3L, "image", badGif, "t")).toDS()).collect()
        noException should be thrownBy Multimodal.audioSignature64(badWav)
        noException should be thrownBy Multimodal.riffPcm16(badWav)
        noException should be thrownBy Multimodal.videoFrameHashes(
          Seq(MediaRecord(4L, "video", badGif, "t")).toDS(), everyNth = 1).collect()
      }
    }
  }

  "audioNearDupPairs" should "mine re-encoded envelopes, not different tracks" in {
    // track 20 duplicated under a different media_id (same bytes) vs a
    // track with a different modulation phase
    val ds = Seq(
      MediaRecord(1L, "audio", Multimodal.syntheticModulatedWav(20L), "s"),
      MediaRecord(2L, "audio", Multimodal.syntheticModulatedWav(20L), "s"),
      MediaRecord(3L, "audio", Multimodal.syntheticModulatedWav(23L), "s")
    ).toDS()
    val pairs = Multimodal.audioNearDupPairs(ds, maxHamming = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L))
  }

  "syntheticAnimatedGif" should "match the closed-form size and decode under ImageIO for every fixture id" in {
    (0L until 60L by 2).foreach { id =>
      withClue(s"id $id: ") {
        val gif = Multimodal.syntheticAnimatedGif(id)
        gif.length shouldBe Multimodal.syntheticGifSize(id)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(gif))
        val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
        reader.setInput(iis)
        try {
          // the REAL JDK GIF reader agrees with every geometry formula,
          // including the uncompressed-LZW trick's frame payloads
          reader.getNumImages(true) shouldBe Multimodal.syntheticGifFrames(id)
          val f0 = reader.read(0)
          f0.getWidth shouldBe Multimodal.syntheticGifWidth(id)
          f0.getHeight shouldBe Multimodal.syntheticGifHeight(id)
          (0 until Multimodal.syntheticGifFrames(id)).foreach { k =>
            val img = reader.read(k)
            val rgb = img.getRGB(img.getWidth - 1, img.getHeight - 1)
            (rgb & 0xff) shouldBe 2 * Multimodal.syntheticGifIndex(id, k)
          }
        } finally { reader.dispose(); iis.close() }
      }
    }
  }

  "decodeVideo" should "REALLY decode multi-frame GIF payloads via javax.imageio" in {
    val id = 8L // a video id (8 % 3 == 2)
    val f = Multimodal.extractFeatures(
      Seq(MediaRecord(id, "video", Multimodal.syntheticAnimatedGif(id), "t")).toDS()).head()
    val frames = Multimodal.syntheticGifFrames(id)
    f.width shouldBe Multimodal.syntheticGifWidth(id)
    f.height shouldBe Multimodal.syntheticGifHeight(id)
    f.n_frames shouldBe frames
    f.n_bytes shouldBe Multimodal.syntheticGifSize(id)
    // uniform fills: mean gray over all frames is the mean of the per-frame
    // decoded levels, exactly
    val want = (0 until frames).map(k => 2.0 * Multimodal.syntheticGifIndex(id, k)).sum / frames
    f.brightness shouldBe want +- 1e-9
  }

  it should "sample REAL re-encoded frames that the image operators can consume" in {
    val id = 14L
    val rec = MediaRecord(id, "video", Multimodal.syntheticAnimatedGif(id), "t")
    val frames = Multimodal.sampleFrames(Seq(rec).toDS(), everyNth = 2).collect()
    val expectIdx = 0 until Multimodal.syntheticGifFrames(id) by 2
    frames.map(_.getAs[Int]("frame_idx")).sorted shouldBe expectIdx.toArray
    frames.foreach { r =>
      val k = r.getAs[Int]("frame_idx")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("frame_bytes")))
      img should not be null // a standalone bitmap, not a byte slice
      img.getWidth shouldBe Multimodal.syntheticGifWidth(id)
      img.getHeight shouldBe Multimodal.syntheticGifHeight(id)
      (img.getRGB(0, 0) & 0xff) shouldBe 2 * Multimodal.syntheticGifIndex(id, k)
    }
  }

  "videoNearDupPairs" should "mine videos sharing a frame, not distinct content" in {
    // textured 8x8 frames through the generic GIF encoder: at 8x8 every
    // aHash cell is one pixel, so a frame built from a 64-bit pattern
    // (index 100 -> gray 200 for set bits) hashes to EXACTLY that pattern —
    // Hamming distances between frames are chosen, not hoped for
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def raster(pattern: Long): Array[Byte] =
      Array.tabulate(64)(i => if ((pattern >>> i & 1L) == 1L) 100.toByte else 0.toByte)
    val p1 = mix(1); val p2 = mix(2); val p4 = mix(4); val p5 = mix(5)
    val videos = Seq(
      MediaRecord(1L, "video", Multimodal.encodeGif(8, 8, Seq(raster(p1), raster(p2))), "s"),
      // shares frame content with video 1: p1 with ONE flipped bit
      MediaRecord(2L, "video", Multimodal.encodeGif(8, 8, Seq(raster(p1 ^ 2L), raster(p4))), "s"),
      // unrelated textures
      MediaRecord(3L, "video", Multimodal.encodeGif(8, 8, Seq(raster(p5))), "s")
    ).toDS()
    val pairs = Multimodal.videoNearDupPairs(videos, maxHamming = 3, everyNth = 1)
      .as[(Long, Long, Long)].collect()
    pairs.map(p => (p._1, p._2)).toSet shouldBe Set((1L, 2L))
    pairs.head._3 shouldBe 1L // exactly the planted shared frame
  }

  it should "drop flat frames rather than matching every featureless video" in {
    // the uniform-fill fixture videos are ALL flat: every frame aHashes to
    // 0 and is dropped, so no spurious all-pairs explosion
    val flats = Seq(
      MediaRecord(2L, "video", Multimodal.syntheticAnimatedGif(2L), "s"),
      MediaRecord(5L, "video", Multimodal.syntheticAnimatedGif(5L), "s")
    ).toDS()
    Multimodal.videoFrameHashes(flats, everyNth = 1).count() shouldBe 0L
    Multimodal.videoNearDupPairs(flats, everyNth = 1).count() shouldBe 0L
  }

  "fromDocuments" should "derive deterministic kinds and payloads, with real BMPs for images" in {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val ds = Multimodal.fromDocuments(spark, docs)
    val rows = ds.collect()
    rows.length shouldBe docs.count()
    rows.foreach { r =>
      r.kind shouldBe Seq("image", "audio", "video")((r.media_id % 3).toInt)
      r.bytes should not be empty
      if (r.kind == "image") {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
        img should not be null
        img.getWidth shouldBe Multimodal.syntheticImageWidth(r.media_id)
        img.getHeight shouldBe Multimodal.syntheticImageHeight(r.media_id)
      }
      if (r.kind == "audio") {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.bytes))
        ais.getFormat.getSampleRate shouldBe Multimodal.syntheticWavRate(r.media_id).toFloat
        ais.close()
      }
      if (r.kind == "video") {
        r.bytes.length shouldBe Multimodal.syntheticGifSize(r.media_id)
        // a real multi-frame container, not a text stand-in
        new String(r.bytes, 0, 6, "US-ASCII") shouldBe "GIF89a"
      }
    }
  }
}
