package graft

import graft.ops.MultimodalOps
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: batch decode through mapPartitions
  * with the stubbed kernel — schema, batch shape, and determinism. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val blobs = Tables(spark, sf0001, "documents")
    .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))

  test("decodeBatch yields one typed MediaMeta per blob") {
    val out = MultimodalOps.decodeBatch(spark, blobs)
    assert(out.count() == 500)
    val r = out.filter(col("doc_id") === 0).collect().head
    assert(r.n_bytes > 0 && r.width >= 64 && r.height >= 64 && r.frames >= 1)
  }

  test("stub decode is deterministic across runs and partitionings") {
    val a = MultimodalOps.decodeBatch(spark, blobs).collect().sortBy(_.doc_id)
    val b = MultimodalOps.decodeBatch(spark, blobs.repartition(7))
      .collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  test("resizeBatch fits dimensions into the max while keeping aspect") {
    val decoded = MultimodalOps.decodeBatch(spark, blobs)
    val resized = MultimodalOps.resizeBatch(decoded, maxDim = 100).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(m => m.width <= 100 && m.height <= 100))
    val orig = decoded.collect().map(m => m.doc_id -> m).toMap
    resized.foreach { m =>
      val o = orig(m.doc_id)
      if (o.width <= 100 && o.height <= 100) // small media untouched
        assert(m.width == o.width && m.height == o.height)
      else { // aspect preserved within integer truncation
        val r0 = o.width.toDouble / o.height
        val r1 = m.width.toDouble / m.height
        assert(math.abs(r0 - r1) / r0 < 0.1, s"aspect drifted: $o -> $m")
      }
    }
  }

  test("frameSample emits every step-th frame index per video") {
    val decoded = MultimodalOps.decodeBatch(spark, blobs)
    val frames = MultimodalOps.frameSample(decoded, step = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx")))
    val byDoc = frames.groupBy(_._1)
    val counts = decoded.collect().map(m => m.doc_id -> m.frames).toMap
    byDoc.foreach { case (id, fs) =>
      val expect = (0 until counts(id) by 2).toSet
      assert(fs.map(_._2).toSet == expect, s"doc $id: ${fs.toSeq} vs $expect")
    }
  }

  test("real PNG and JPEG blobs decode to actual dimensions and pixel stats") {
    // real images through the same batch path: the JDK's ImageIO decodes
    // them, so width/height are the true raster sizes (not the stub's
    // byte-length fakes) and the checksum folds the actual ARGB pixels
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (x * 31 + y * 17 + seed) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, 0x336699)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val blobs = Seq(
      (1L, png(13, 7, 0)), (2L, png(64, 33, 5)), (3L, jpeg(20, 10)),
      (4L, "not an image at all".getBytes("UTF-8"))) // → stub fallback
      .toDF("doc_id", "media")
    val out = MultimodalOps.decodeBatch(spark, blobs.repartition(3))
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).width == 13 && out(1L).height == 7)
    assert(out(2L).width == 64 && out(2L).height == 33)
    assert(out(3L).width == 20 && out(3L).height == 10)
    // checksum matches a driver-side decode of the same bytes exactly
    val local = MultimodalOps.decodeImage(1L, png(13, 7, 0)).get
    assert(out(1L).checksum == local.checksum && local.checksum != 0L)
    // PNG is lossless: two pixel-identical encodes checksum identically
    assert(MultimodalOps.decodeImage(9L, png(13, 7, 0)).get.checksum
      == local.checksum)
    // the non-image blob took the deterministic stub, not an error
    assert(out(4L) == MultimodalOps.decodeStub(4L,
      "not an image at all".getBytes("UTF-8")))
  }

  test("real WAV blobs decode to true sample rate, channels, and frame count") {
    // a synthesized PCM sine through the same batch path: the JDK's
    // sampled-sound stack parses the container, so the metadata is the
    // true audio shape and the checksum folds the actual PCM bytes
    def wav(sampleRate: Int, channels: Int, nFrames: Int, freq: Double): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
      val pcm = new Array[Byte](nFrames * channels * 2)
      for (i <- 0 until nFrames; c <- 0 until channels) {
        val s = (math.sin(2 * math.Pi * freq * i / sampleRate) * 12000).toInt
        val off = (i * channels + c) * 2
        pcm(off) = (s & 0xff).toByte
        pcm(off + 1) = ((s >> 8) & 0xff).toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nFrames),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val blobs = Seq(
      (1L, wav(8000, 1, 1600, 440.0)),
      (2L, wav(16000, 2, 800, 220.0)),
      (3L, "definitely not audio".getBytes("UTF-8"))) // → stub fallback
      .toDF("doc_id", "media")
    val out = MultimodalOps.decodeBatch(spark, blobs.repartition(2))
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).width == 8000 && out(1L).height == 1 && out(1L).frames == 1600)
    assert(out(2L).width == 16000 && out(2L).height == 2 && out(2L).frames == 800)
    // checksum matches a driver-side decode of the same bytes exactly
    val local = MultimodalOps.decodeAudio(1L, wav(8000, 1, 1600, 440.0)).get
    assert(out(1L).checksum == local.checksum && local.checksum != 0L)
    assert(out(3L) == MultimodalOps.decodeStub(3L,
      "definitely not audio".getBytes("UTF-8")))
  }

  test("real MP4 headers parse to true dimensions and duration") {
    // build a minimal but structurally honest ISO-BMFF file:
    // ftyp + moov(mvhd + trak(tkhd audio 0x0) + trak(tkhd video WxH))
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length)
      out.put(tpe.getBytes("US-ASCII")).put(payload)
      out.array()
    }
    def mvhd(timescale: Int, duration: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(100) // v0 mvhd payload size
      b.position(12); b.putInt(timescale).putInt(duration)
      box("mvhd", b.array())
    }
    def tkhd(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(84) // v0 tkhd payload size
      b.position(76); b.putInt(w << 16).putInt(h << 16) // 16.16 fixed
      box("tkhd", b.array())
    }
    def mp4(w: Int, h: Int, timescale: Int, duration: Int): Array[Byte] =
      box("ftyp", "isom".getBytes("US-ASCII") ++ new Array[Byte](12)) ++
        box("moov", mvhd(timescale, duration) ++
          box("trak", tkhd(0, 0)) ++ // audio track: no dims — must be skipped
          box("trak", tkhd(w, h)))

    val m = MultimodalOps.decodeVideo(1L, mp4(1920, 1080, 600, 9000)).get
    assert(m.width == 1920 && m.height == 1080)
    assert(m.frames == 15000, s"duration ${m.frames} ms, want 9000/600 s")
    val m2 = MultimodalOps.decodeVideo(2L, mp4(640, 480, 1000, 2500)).get
    assert(m2.width == 640 && m2.height == 480 && m2.frames == 2500)
    // non-BMFF bytes and truncated headers refuse rather than misreport
    assert(MultimodalOps.decodeVideo(3L, "not a video".getBytes).isEmpty)
    assert(MultimodalOps.decodeVideo(4L,
      mp4(1920, 1080, 600, 9000).take(24)).isEmpty)
    // zero timescale (division trap) refuses
    assert(MultimodalOps.decodeVideo(5L, mp4(64, 64, 0, 100)).isEmpty)
    // the batch path routes container bytes through the video decoder
    import spark.implicits._
    val out = MultimodalOps.decodeBatch(spark,
      Seq((9L, mp4(320, 240, 100, 450))).toDF("doc_id", "media")).collect().head
    assert(out.width == 320 && out.height == 240 && out.frames == 4500)
  }

  test("decode runs distributed (partition-level batches, no collect)") {
    val plan = MultimodalOps.decodeBatch(spark, blobs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions")
      || plan.contains("SerializeFromObject"), plan)
  }

  test("average-hash: retouched copies land within a few bits, different images far") {
    import graft.ops.MultimodalOps
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val g = f(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val base = png((x, y) => x * 8 ^ y * 5)
    // retouch: a couple of pixels changed — same picture for a human
    val tweak = png((x, y) =>
      if (x == 3 && y == 7) 255 else if (x == 20 && y == 20) 0 else x * 8 ^ y * 5)
    val other = png((x, y) => 255 - x * 4 - y * 3)
    val (hBase, hTweak, hOther) = (
      MultimodalOps.imageAHash(base).get,
      MultimodalOps.imageAHash(tweak).get,
      MultimodalOps.imageAHash(other).get)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hBase, hTweak) <= 3,
      s"retouched copy drifted ${ham(hBase, hTweak)} bits")
    assert(ham(hBase, hOther) > 10,
      s"unrelated image only ${ham(hBase, hOther)} bits away")
  }

  test("media_phash_dedup finds banded near-dup pairs with bounded hamming") {
    val rows = SparkEntry.queries("media_phash_dedup")(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("hamming") <= 3)
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
    }
  }

  test("DCT hash survives affine and tone-curve remaps; unrelated images stay far") {
    import graft.ops.MultimodalOps
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val g = f(x, y) max 0 min 255
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // smooth imagery (a real photo's local structure, not a flat
    // synthetic tile — those produce near-median AC ties that flip bits
    // under ANY perturbation, the documented failure mode)
    val pat: (Int, Int) => Int = (x, y) =>
      60 + (x * x * 2 + y * y + 3 * x * y) % 140
    val base = png(pat)
    // transcode-style retouches: contrast stretch + brightness lift
    // (affine — AC coefficients scale uniformly, the median threshold
    // cancels it) and a gamma-style monotone tone curve
    val affine = png((x, y) => pat(x, y) * 6 / 5 + 12)
    val gamma = png((x, y) => (math.sqrt(pat(x, y) / 255.0) * 255).toInt)
    val other = png((x, y) => 255 - x * 4 - y * 3)
    val dB = MultimodalOps.imageDctHash(base).get
    assert(ham(dB, MultimodalOps.imageDctHash(affine).get) <= 3,
      "DCT drifted under an affine brightness/contrast remap")
    assert(ham(dB, MultimodalOps.imageDctHash(gamma).get) <= 3,
      "DCT drifted under a monotone tone curve")
    val dO = ham(dB, MultimodalOps.imageDctHash(other).get)
    assert(dO > 10, s"unrelated image only $dO DCT bits away")
  }

  test("media_dcthash_dedup finds banded near-dup pairs with bounded hamming") {
    val rows = SparkEntry.queries("media_dcthash_dedup")(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("hamming") <= 3)
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
    }
  }

  test("audio energy hash: retouched clips land close, different clips far") {
    import graft.ops.MultimodalOps
    def wav(n: Int, amp: Int => Int): Array[Byte] = {
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val a = amp(i).toShort
        pcm(2 * i) = (a & 0xff).toByte
        pcm(2 * i + 1) = ((a >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val base = wav(6400, i => if ((i / 400) % 2 == 0) 9000 else 500)
    val tweak = wav(6400, i =>
      (if ((i / 400) % 2 == 0) 9000 else 500) + (if (i % 997 == 0) 150 else 0))
    val other = wav(6400, i => if ((i / 100) % 4 == 3) 11000 else 200)
    val (hB, hT, hO) = (
      MultimodalOps.audioEnergyHash(base).get,
      MultimodalOps.audioEnergyHash(tweak).get,
      MultimodalOps.audioEnergyHash(other).get)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hB, hT) <= 3, s"retouched clip drifted ${ham(hB, hT)} bits")
    assert(ham(hB, hO) > 10, s"unrelated clip only ${ham(hB, hO)} bits away")
    // the catalog query recovers EXACTLY the planted re-encoded copies:
    // every doc_id % 5 == 0 clip pairs with its copy, nothing else
    import graft.ops.MultimodalOps.{AudioCopyBase, AudioCopyMod}
    val pairs = SparkEntry.queries("media_audio_dedup")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Int]("hamming")))
    pairs.foreach { case (_, _, h2) => assert(h2 <= 3) }
    val expected = Tables(spark, sf0001, "documents")
      .select("doc_id").collect().map(_.getLong(0))
      .filter(_ % AudioCopyMod == 0)
      .map(id => (id, id + AudioCopyBase)).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == expected,
      s"planted-copy recovery mismatch: got ${pairs.length}, want ${expected.size}")
  }

  test("audio segmentation: planted loud/silent runs yield exact windows") {
    // hand-built clip: windows 0-9 loud, 10-19 silent, 20-39 loud,
    // 40-63 silent (64 samples per window). Integer mean energy
    // = 30·10000/64 = 4687, thr = 2343 → exactly two active segments.
    val nWin = 64
    val perWin = 64
    val pcm = new Array[Byte](nWin * perWin * 2)
    for (w <- 0 until nWin; i <- 0 until perWin) {
      val amp: Short = if (w < 10 || (w >= 20 && w < 40)) 10000 else 0
      val idx = (w * perWin + i) * 2
      pcm(idx) = (amp & 0xff).toByte
      pcm(idx + 1) = ((amp >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, (nWin * perWin).toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val es = graft.ops.MultimodalOps
      .audioWindowEnergies(out.toByteArray, nWin).get
    assert(es.length == nWin)
    (0 until nWin).foreach { w =>
      val want = if (w < 10 || (w >= 20 && w < 40)) 10000L else 0L
      assert(es(w) == want, s"window $w energy ${es(w)}")
    }
    // the relational tail over the corpus: segments are disjoint,
    // in-range, ordered, and internally consistent
    val segs = SparkEntry.queries("media_audio_segments")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("seg"),
        r.getAs[Long]("start_win"), r.getAs[Long]("end_win"),
        r.getAs[Long]("n_win")))
    assert(segs.nonEmpty)
    segs.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1 to sorted.length), s"doc $id seg ids")
      sorted.foreach { case (_, _, a, b, n) =>
        assert(a >= 0 && b < nWin && n == b - a + 1, s"doc $id segment bounds")
      }
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(y._3 > x._4 + 1,
          s"doc $id segments touch or overlap — runs were not maximal")
        case _ =>
      }
    }
  }
}
