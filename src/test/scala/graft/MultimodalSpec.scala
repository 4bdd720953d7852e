package graft

import graft.operators.Multimodal
import graft.operators.Multimodal._

/** Multimodal plumbing specs: binary payload + typed metadata schema,
  * partition-parallel decode/feature/resize/frame ops on the deterministic
  * fake raster format.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic grayscale payload: pixel (y,x) of frame f =
    * (id*31 + f*17 + y*w + x) mod 256. */
  private def payload(id: Long, w: Int, h: Int, frames: Int): Array[Byte] =
    Array.tabulate(frames * w * h)(i => ((id * 31 + i) % 256).toByte)

  /** REAL PNG bytes (pure-JDK encode) with pixel (y,x) = (id*31 + y*w+x)
    * mod 256 — the image ops decode actual images now, FakeCodec is
    * video/audio only. */
  private def pngBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raw = payload(id, w, h, 1)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, raw(y * w + x) & 0xff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def image(id: Long, w: Int, h: Int): MediaRow =
    MediaRow(id, "image", MediaMeta("png", w, h, 1, 0), pngBytes(id, w, h))

  private def video(id: Long, w: Int, h: Int, frames: Int): MediaRow =
    MediaRow(id, "video", MediaMeta("fake-gray", w, h, frames, 0),
      payload(id, w, h, frames))

  test("asTable exposes the canonical binary+metadata schema") {
    val df = Multimodal.asTable(Seq(image(1, 4, 4)).toDS())
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    // metadata predicates work without touching payload bytes
    assert(df.filter($"meta.width" === 4).count() == 1)
  }

  test("imageFeatures: histogram covers every pixel, mean is exact") {
    val ds = Seq(image(0, 16, 16)).toDS() // pixels 0..255 exactly once
    val f = Multimodal.imageFeatures(ds).head()
    assert(f.histogram.toSeq == Seq.fill(16)(16L)) // uniform 16 per bin
    assert(f.mean_byte == 255.0 / 2)
    assert(f.histogram.sum == 16 * 16)
  }

  test("resize: nearest-neighbor downsample picks the expected pixels") {
    val ds = Seq(image(0, 4, 4)).toDS() // pixel value == index
    val r = Multimodal.resize(ds, 2, 2).head()
    assert(r.width == 2 && r.height == 2)
    // sy = y*4/2 in {0,2}, sx likewise -> indices 0,2,8,10
    assert(r.pixels.map(_ & 0xff).toSeq == Seq(0, 2, 8, 10))
  }

  test("undecodable payloads are dropped by the typed image ops and " +
      "NULL — not a throw — under graft_image_stats") {
    val corrupt = MediaRow(9L, "image", MediaMeta("png", 4, 4, 1, 0),
      pngBytes(9, 4, 4).take(20))
    val ds = Seq(image(1, 4, 4), corrupt).toDS()
    assert(Multimodal.imageFeatures(ds).collect().map(_.media_id).toSeq
      == Seq(1L))
    assert(Multimodal.resize(ds, 2, 2).collect().map(_.media_id).toSeq
      == Seq(1L))
    // expression path: per-row NULL accounting, geometry from decode
    val got = Multimodal.asTable(ds)
      .select($"media_id",
        org.apache.spark.sql.functions.call_function(
          "graft_image_stats", $"payload").as("st"))
      .select($"media_id", $"st.width", $"st.pixel_count")
      .orderBy($"media_id").collect()
    assert(got(0).getInt(1) == 4 && got(0).getLong(2) == 16L)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
  }

  test("graft_image_stats decode inverts a lossless RGB encode exactly") {
    // 3-band PNG: channels from the decode, pixel_sum against the raw
    // raster computed independently here
    val w = 5; val h = 3
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var want = 0L
    for (y <- 0 until h; x <- 0 until w; b <- 0 until 3) {
      val v = (x * 41 + y * 17 + b * 89) % 256
      img.getRaster.setSample(x, y, b, v)
      want += v
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val row = Seq((1L, bos.toByteArray)).toDF("id", "payload")
      .selectExpr("graft_image_stats(payload) AS st")
      .select($"st.width", $"st.height", $"st.channels", $"st.pixel_sum",
        $"st.pixel_count").head()
    assert(row.getInt(0) == w && row.getInt(1) == h && row.getInt(2) == 3)
    assert(row.getLong(3) == want && row.getLong(4) == w.toLong * h * 3)
  }

  test("palette-indexed and RGBA PNGs expand to color components — " +
      "never palette indices or alpha-folded sums") {
    // indexed: raster holds INDICES; stats must resolve them through
    // the palette (channels = 3), not sum the index bytes
    val pal = Array.tabulate[Byte](4)(i => (i * 60 + 10).toByte)
    val cm = new java.awt.image.IndexColorModel(8, 4,
      pal, pal.map(b => (b + 5).toByte), pal.map(b => (b + 9).toByte))
    val idxImg = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    var wantIdx = 0L
    for (y <- 0 until 2; x <- 0 until 3) {
      val i = (x + y) % 4
      idxImg.getRaster.setSample(x, y, 0, i)
      wantIdx += ((pal(i) & 0xFF) + (pal(i) + 5 & 0xFF) + (pal(i) + 9 & 0xFF))
    }
    // rgba: alpha must be DROPPED, not averaged into the aggregates
    val rgbaImg = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    var wantRgb = 0L
    for (y <- 0 until 2; x <- 0 until 2) {
      val (r, g, b) = (x * 100 + 7, y * 90 + 11, x * 50 + y * 30 + 3)
      rgbaImg.setRGB(x, y, (200 << 24) | (r << 16) | (g << 8) | b)
      wantRgb += r + g + b
    }
    def png(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq((1L, png(idxImg)), (2L, png(rgbaImg)))
      .toDF("id", "payload")
      .selectExpr("id", "graft_image_stats(payload) AS st")
      .select($"id", $"st.channels", $"st.pixel_sum", $"st.pixel_count")
      .orderBy($"id").collect()
    assert(rows(0).getInt(1) == 3 && rows(0).getLong(2) == wantIdx &&
      rows(0).getLong(3) == 3L * 2 * 3)
    assert(rows(1).getInt(1) == 3 && rows(1).getLong(2) == wantRgb &&
      rows(1).getLong(3) == 2L * 2 * 3)
  }

  test("forged-geometry decompression bomb answers NULL before any " +
      "raster allocation") {
    // valid 4x4 PNG with IHDR rewritten to claim 50000x50000 (CRC
    // fixed): reader accepts the header, the declared-geometry guard
    // must reject it — a real decode would allocate 2.5G pixels
    val out = pngBytes(3, 4, 4).clone()
    def putInt(off: Int, v: Int): Unit = {
      out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
      out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
    }
    putInt(16, 50000); putInt(20, 50000)
    val crc = new java.util.zip.CRC32()
    crc.update(out, 12, 17)
    putInt(29, crc.getValue.toInt)
    assert(graft.functions.ImageUtil.stats(out) == null)
    assert(graft.functions.ImageUtil.decodeLuma(out).isEmpty)
  }

  test("graft_audio_stats decode inverts a lossless WAV encode exactly " +
      "(16-bit signed + 8-bit unsigned centering)") {
    def wav(pcm: Array[Byte], fmt: javax.sound.sampled.AudioFormat,
        frames: Long): Array[Byte] = {
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // 16-bit signed stereo: 3 frames with known samples
    val s16 = Array[Short](1000, -2000, 32767, -32768, 0, 5)
    val pcm16 = new Array[Byte](12)
    for (i <- s16.indices) {
      pcm16(2 * i) = (s16(i) & 0xFF).toByte
      pcm16(2 * i + 1) = ((s16(i) >> 8) & 0xFF).toByte
    }
    val fmt16 = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      16000f, 16, 2, 4, 16000f, false)
    val row16 = Seq((1L, wav(pcm16, fmt16, 3)))
      .toDF("id", "payload")
      .selectExpr("graft_audio_stats(payload) AS st")
      .select($"st.sample_rate", $"st.channels", $"st.frames",
        $"st.sample_sum", $"st.sample_abs_sum", $"st.sample_count")
      .head()
    assert(row16.getInt(0) == 16000 && row16.getInt(1) == 2 &&
      row16.getLong(2) == 3L)
    assert(row16.getLong(3) == s16.map(_.toLong).sum)
    assert(row16.getLong(4) == s16.map(v => math.abs(v.toLong)).sum)
    assert(row16.getLong(5) == 6L)
    // 8-bit unsigned mono: 0x80 is digital silence and must sum to 0
    val u8 = Array[Int](128, 0, 255, 200)
    val fmt8 = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val got8 = graft.functions.AudioUtil.stats(
      wav(u8.map(_.toByte), fmt8, 4))
    assert(got8 != null && got8.getLong(2) == 4L)
    assert(got8.getLong(3) == u8.map(_ - 128).sum.toLong)
    assert(got8.getLong(4) == u8.map(v => math.abs(v - 128)).sum.toLong)
    // silence-only: sum 0, abs 0
    val silent = graft.functions.AudioUtil.stats(
      wav(Array.fill[Byte](8)(0x80.toByte), fmt8, 8))
    assert(silent != null && silent.getLong(3) == 0L &&
      silent.getLong(4) == 0L)
  }

  test("hostile WAV payloads answer NULL: truncation, out-of-contract " +
      "codec tag, forged-frame bomb") {
    val pcm = Array.fill[Byte](1024)(7)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 512)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val good = bos.toByteArray
    assert(graft.functions.AudioUtil.stats(good) != null)
    // truncated DATA: header claims 512 frames, body carries half
    assert(graft.functions.AudioUtil.stats(good.take(good.length / 2)) == null)
    // truncated header
    assert(graft.functions.AudioUtil.stats(good.take(8)) == null)
    // a-law format tag: container parses, codec out of contract
    val alaw = good.clone(); alaw(20) = 6
    assert(graft.functions.AudioUtil.stats(alaw) == null)
    // forged data-chunk size claiming 2^28 frames on the tiny body
    val bomb = good.clone()
    def putLE(off: Int, v: Int): Unit = {
      bomb(off) = (v & 0xFF).toByte
      bomb(off + 1) = ((v >> 8) & 0xFF).toByte
      bomb(off + 2) = ((v >> 16) & 0xFF).toByte
      bomb(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    putLE(4, 36 + (1 << 29)); putLE(40, 1 << 29)
    assert(graft.functions.AudioUtil.stats(bomb) == null)
  }

  test("graft_video_stats demuxes an MJPEG AVI: census, geometry, and " +
      "sums match per-frame JPEG decodes; bad frames gap the census") {
    def jpeg(w: Int, h: Int, s: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w; b <- 0 until 3)
        img.getRaster.setSample(x, y, b, (x * 31 + y * 17 + b * 67 + s) % 256)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def le32(v: Long): Array[Byte] = Array((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if ((body.length & 1) == 1) Array[Byte](0)
        else Array.emptyByteArray
      id.getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body ++ pad
    }
    def avi(frames: Seq[Array[Byte]]): Array[Byte] = {
      val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
        frames.map(f => chunk("00dc", f))
          .foldLeft(Array.emptyByteArray)(_ ++ _))
      val body = "AVI ".getBytes("US-ASCII") ++ movi
      "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
    }
    val fs = Seq(jpeg(9, 7, 0), jpeg(9, 7, 50), jpeg(9, 7, 111))
    val expected = fs.map(graft.functions.ImageUtil.stats)
    val row = Seq((1L, avi(fs))).toDF("id", "payload")
      .selectExpr("graft_video_stats(payload) AS st")
      .select($"st.frames", $"st.frames_decoded", $"st.width",
        $"st.height", $"st.pixel_sum", $"st.pixel_count").head()
    assert(row.getInt(0) == 3 && row.getInt(1) == 3)
    assert(row.getInt(2) == 9 && row.getInt(3) == 7)
    assert(row.getLong(4) == expected.map(_.getLong(3)).sum)
    assert(row.getLong(5) == expected.map(_.getLong(4)).sum)
    // mid-stream corrupt frame: census gap, sums over survivors only
    val broken = avi(Seq(fs(0), fs(1).take(6), fs(2)))
    val got = graft.functions.VideoUtil.stats(broken)
    assert(got != null && got.getInt(0) == 3 && got.getInt(1) == 2)
    assert(got.getLong(4) ==
      expected(0).getLong(3) + expected(2).getLong(3))
    // hostile containers: NULL, never a throw
    assert(graft.functions.VideoUtil.stats(avi(fs).take(20)) == null)
    assert(graft.functions.VideoUtil.stats(Array[Byte](1, 2, 3)) == null)
    assert(graft.functions.VideoUtil.stats(
      "RIFF".getBytes("US-ASCII") ++ le32(4) ++
        "WAVE".getBytes("US-ASCII")) == null)
    // forged chunk size overrunning the payload
    val forged = avi(fs)
    val at = forged.indices.find(i => i + 8 <= forged.length &&
      forged(i) == '0' && forged(i + 1) == '0' &&
      forged(i + 2) == 'd' && forged(i + 3) == 'c').get
    System.arraycopy(le32(0x7FFF0000L), 0, forged, at + 4, 4)
    assert(graft.functions.VideoUtil.stats(forged) == null)
    // decodeFrames: typed path skips the bad frame, keeps its index gap
    val frames = graft.functions.VideoUtil.decodeFrames(broken).get
    assert(frames.map(_._1) == Seq(0, 2) &&
      frames.forall(f => f._2 == 9 && f._3 == 7))
  }

  test("sampleFrames keeps every k-th frame with correct bytes") {
    val ds = Seq(video(2, 2, 2, 6)).toDS()
    val frames = Multimodal.sampleFrames(ds, everyK = 2).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    val expect2 = payload(2, 2, 2, 6).slice(2 * 4, 3 * 4).toSeq
    assert(frames(1).pixels.toSeq == expect2)
  }

  test("audioWindows frames the signal with hop and exact energies") {
    // constant signal at 130 -> per-sample deviation 2 -> energy 4
    val audio = MediaRow(7L, "audio", MediaMeta("fake-pcm8", 0, 0, 0, 8000),
      Array.fill[Byte](10)(130.toByte))
    val w = Multimodal.audioWindows(Seq(audio).toDS(), windowSize = 4, hopSize = 3)
      .collect().sortBy(_.window_idx)
    assert(w.map(_.start_sample).toSeq == Seq(0, 3, 6)) // last full window at 6
    assert(w.forall(_.energy == 4.0))
  }

  test("payload dedup key groups identical binaries") {
    val rows = Seq(image(1, 4, 4), image(1, 4, 4), image(2, 4, 4))
    val df = Multimodal.asTable(rows.toDS())
      .groupBy(Multimodal.payloadKey.as("k")).count()
    val counts = df.collect().map(_.getLong(1)).sorted
    assert(counts.toSeq == Seq(1L, 2L))
  }

  test("sniffFormat: magic bytes win, truncated prefixes fall to unknown") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 1, 2)
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
    val riffOnly = "RIFF".getBytes("UTF-8") // exactly the 4-byte magic
    val pngTrunc = png.take(7)              // one byte short of the magic
    val cases: Seq[(Array[Byte], String)] = Seq(
      (png, "png"), (jpeg, "jpeg"), (riffOnly, "riff"),
      (pngTrunc, "unknown"), (Array.empty[Byte], "unknown"),
      ("plain text".getBytes("UTF-8"), "unknown"))
    for ((bytes, want) <- cases) {
      val got = Seq(Tuple1(bytes)).toDF("payload")
        .select(Multimodal.sniffFormat(org.apache.spark.sql.functions.col("payload"))).head().getString(0)
      assert(got == want, s"${bytes.length} bytes: got $got want $want")
    }
  }
}
