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
