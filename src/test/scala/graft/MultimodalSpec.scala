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

  private def image(id: Long, w: Int, h: Int): MediaRow =
    MediaRow(id, "image", MediaMeta("fake-gray", w, h, 1, 0), payload(id, w, h, 1))

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
