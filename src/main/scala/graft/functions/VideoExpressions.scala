package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** REAL video demuxing for the multimodal surface — MJPEG-in-AVI
  * (RIFF), the one mainstream video container whose frames the JDK can
  * decode without any external codec: the container walk is plain
  * RIFF chunk parsing (public spec), and every `00dc` frame payload is
  * a complete JPEG that [[ImageUtil]]'s guarded `javax.imageio` path
  * decodes. Closes the last stub slot:
  * [[graft.operators.Multimodal.FakeCodec]] survives only as the
  * raw-raster FRAMING convention for pre-decoded buffers (the same
  * role `audioWindows` keeps beside the real WAV decoder).
  *
  * Same architecture as [[ImageUtil]]/[[AudioUtil]]: static kernel +
  * thin codegen'd expression, scan-speed, NULL-never-throw.
  *
  * Decode contract:
  *
  *  - in-contract: `RIFF('AVI ')` payloads; frames are the `..dc`/
  *    `..db` chunks inside the `LIST('movi')` (frame INDEX order =
  *    chunk order; stream headers are informational);
  *  - per-frame geometry and pixel aggregates come from decoding each
  *    frame's JPEG bytes through [[ImageUtil.stats]]'s exact kernel —
  *    a frame that fails ITS decode (corrupt JPEG mid-stream) is
  *    counted in `frames` but not in `frames_decoded`, and contributes
  *    nothing to the sums (a 100 TB crawl's containers carry bad
  *    frames; one must not poison the file, and the decoded/total gap
  *    is the honest quality signal);
  *  - undecodable CONTAINERS — truncated header, a chunk whose size
  *    field overruns the payload, garbage, foreign formats, empty —
  *    return NULL, never throw;
  *  - more than [[MAX_FRAMES]] frame chunks answers NULL (the bomb
  *    guard; chunk sizes themselves are bounded by the payload, so a
  *    forged size is a corrupt container, not an allocation).
  */
object VideoUtil {

  /** Frame-chunk bomb guard (a real shard-sized clip is thousands of
    * frames; 2^20 is far past any sane packed payload). */
  val MAX_FRAMES: Long = 1L << 20

  /** Output shape of [[stats]]: container frame census + exact pixel
    * aggregates over the decodable frames. Geometry is the FIRST
    * decoded frame's (MJPEG streams are constant-geometry; a mid-stream
    * geometry change is still summed honestly — the census columns keep
    * the contract checkable). */
  val statsSchema: StructType = StructType(Seq(
    StructField("frames", IntegerType),
    StructField("frames_decoded", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("pixel_sum", LongType),
    StructField("pixel_count", LongType)))

  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL)) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Collect the (offset, size) of every frame chunk (`..dc`/`..db`)
    * inside every `LIST('movi')`, walking chunks with full bounds
    * checks. Null on any structural violation. */
  private def frameChunks(b: Array[Byte]): Array[(Int, Int)] = {
    if (b == null || b.length < 12 || fourcc(b, 0) != "RIFF" ||
      fourcc(b, 8) != "AVI ") return null
    val riffSize = le32(b, 4)
    // the RIFF size must describe the payload (8 + size, modulo the
    // spec's one pad byte) — a forged/truncated container dies here
    if (riffSize < 4 || 8 + riffSize > b.length + 1) return null
    val end = math.min(b.length.toLong, 8 + riffSize).toInt
    val out = Array.newBuilder[(Int, Int)]
    var n = 0L

    def walk(from: Int, to: Int, inMovi: Boolean): Boolean = {
      var p = from
      while (p < to) {
        if (p + 8 > to) return false // dangling partial chunk header
        val id = fourcc(b, p)
        val size = le32(b, p + 4)
        if (size < 0 || p + 8 + size > to) return false // size overrun
        val body = p + 8
        val isz = size.toInt
        if (id == "LIST") {
          if (isz < 4) return false
          val listType = fourcc(b, body)
          if (!walk(body + 4, body + isz,
            inMovi || listType == "movi")) return false
        } else if (inMovi && id.length == 4 &&
          (id.endsWith("dc") || id.endsWith("db"))) {
          n += 1
          if (n > MAX_FRAMES) return false
          out += ((body, isz))
        }
        p = body + isz + (isz & 1) // chunks are word-aligned (pad byte)
      }
      true
    }

    if (!walk(12, end, inMovi = false)) null else out.result()
  }

  /** Demux `bytes` and aggregate in one pass: (frames, frames_decoded,
    * first decoded geometry, pixel sums over decodable frames). Null
    * when the payload is not a structurally valid AVI. Public for
    * generated code. */
  def stats(bytes: Array[Byte]): InternalRow =
    try {
      val chunks = frameChunks(bytes)
      if (chunks == null) return null
      var decoded = 0
      var w = 0
      var h = 0
      var sum = 0L
      var cnt = 0L
      var i = 0
      while (i < chunks.length) {
        val (off, len) = chunks(i)
        val frame = java.util.Arrays.copyOfRange(bytes, off, off + len)
        val st = ImageUtil.stats(frame)
        if (st != null) {
          if (decoded == 0) { w = st.getInt(0); h = st.getInt(1) }
          decoded += 1
          sum += st.getLong(3)
          cnt += st.getLong(4)
        }
        i += 1
      }
      new GenericInternalRow(Array[Any](chunks.length, decoded, w, h,
        sum, cnt))
    } catch { case _: Exception => null }

  /** Demux to per-frame LUMA rasters (index, width, height, pixels) —
    * the typed shape [[graft.operators.Multimodal]]'s frame ops
    * consume; undecodable frames are skipped (their index gap is the
    * quality signal). None when the container is invalid. */
  def decodeFrames(bytes: Array[Byte]): Option[Seq[(Int, Int, Int, Array[Byte])]] = {
    val chunks = frameChunks(bytes)
    if (chunks == null) return None
    Some(chunks.iterator.zipWithIndex.flatMap { case ((off, len), i) =>
      val frame = java.util.Arrays.copyOfRange(bytes, off, off + len)
      ImageUtil.decodeLuma(frame).map { case (w, h, px) => (i, w, h, px) }
    }.toSeq)
  }
}

/** `graft_video_stats(payload)` — MJPEG-AVI frame census + exact pixel
  * aggregates of a binary video column as a struct, NULL for
  * undecodable containers ([[VideoUtil.stats]]). */
case class VideoStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = VideoUtil.statsSchema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_video_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    VideoUtil.stats(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("videoStats")
      s"""
         |InternalRow $r = graft.functions.VideoUtil.stats($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VideoStats =
    copy(child = newChild)
}
