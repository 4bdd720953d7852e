package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-shingling kernels — the per-row form of the
  * relational pipeline `posexplode(split(trim(text), ws)) → window
  * lead(n−1) → concat_ws(" ") [→ xxhash64 → distinct]` that
  * [[graft.operators.NearDup]] ran through round 12.
  *
  * Why a kernel: the relational formulation pays one exchange + sort for
  * the per-document window (`lead` needs (id, pos) ordering) and a second
  * keyed exchange for the per-document `distinct` — per CONSUMER, on a
  * row set the size of the token count. Shingling is a per-document pure
  * function, so both exchanges are structural overhead: this kernel
  * tokenizes, assembles and (for the hash form) dedupes in one pass over
  * the text bytes, inside WholeStageCodegen, and the surrounding plan
  * needs zero exchanges until the first genuinely relational step (the
  * document-frequency aggregation or the inverted-index join). At 100 TB
  * that converts the widest shuffle of every shingle pipeline — the raw
  * token rows — into no shuffle at all.
  *
  * Exactness contract (pinned by NearDupSpec's A/B fuzz): byte-identical
  * rows to the round-12 pipeline for every input, including the edge
  * shapes the relational form produces —
  *  - `trim` strips ASCII space (0x20) ONLY, matching Spark's `trim`;
  *  - the split pattern `[ \t\n\x0B\f\r]+` with Java `split(..., -1)`
  *    semantics: leading/trailing SEPARATOR runs produce EMPTY tokens
  *    (trim removes spaces, so a doc starting "\t" keeps its empty first
  *    token), and an all-space/empty doc yields the single token `""`;
  *  - documents with fewer than n tokens yield an EMPTY array (the
  *    `lead(n−1) IS NULL` filter's semantics; `explode` then drops the
  *    document exactly as the row pipeline did);
  *  - span text = tokens joined by a single 0x20 (`concat_ws(" ")`,
  *    empties included);
  *  - the hash form is `xxhash64(span)` — seed 42 over the span's UTF-8
  *    bytes, Spark's own XXH64 — deduplicated per document in
  *    first-occurrence order (downstream consumers are set-shaped, but
  *    a deterministic order keeps plans replayable);
  *  - invalid UTF-8 follows `UTF8String.toString`'s replacement-char
  *    normalization (the regex split round-tripped through String, so
  *    the row pipeline hashed NORMALIZED bytes; any text containing a
  *    byte ≥ 0x80 takes the same String round-trip here).
  */
object ShingleUtil {

  private final val Sep = {
    val s = new Array[Boolean](128)
    s(' '.toInt) = true; s('\t'.toInt) = true; s('\n'.toInt) = true
    s(0x0B) = true; s('\f'.toInt) = true; s('\r'.toInt) = true
    s
  }

  /** Text bytes with exactly the normalization the relational pipeline's
    * String round-trip applied: pure-ASCII (and any valid UTF-8) bytes
    * pass through untouched; anything with a high byte goes through
    * toString (invalid sequences → U+FFFD, as the regex split saw them). */
  private def normalizedBytes(text: UTF8String): Array[Byte] = {
    val b = text.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < b.length) { ascii = b(i) >= 0; i += 1 }
    if (ascii) b
    else text.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Token boundaries of `split(trim(text), "[ \t\n\x0B\f\r]+", -1)` as
    * (start, end) offset pairs into `b`, flattened. An empty token is a
    * pair with start == end. */
  private def tokenize(b: Array[Byte]): Array[Int] = {
    // trim: ASCII space only, both ends
    var s = 0
    var e = b.length
    while (s < e && b(s) == 0x20) s += 1
    while (e > s && b(e - 1) == 0x20) e -= 1
    if (s == e) return Array(s, s) // empty → the single token ""
    val out = new java.util.ArrayList[Integer]()
    var i = s
    var tokStart = s
    while (i < e) {
      val c = b(i)
      if (c >= 0 && c < 128 && Sep(c)) {
        out.add(tokStart); out.add(i)
        // skip the separator run
        var j = i + 1
        while (j < e && { val cj = b(j); cj >= 0 && cj < 128 && Sep(cj) }) j += 1
        tokStart = j
        i = j
      } else i += 1
    }
    out.add(tokStart); out.add(e) // final token (empty if region ends in a run)
    val arr = new Array[Int](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    arr
  }

  /** All word n-gram spans of `text`, in order, duplicates kept — the
    * kernel form of the shingleRowsAll row set (one array element per
    * row). Fewer than n tokens → empty array. */
  def shingleSpans(text: UTF8String, n: Int): ArrayData = {
    val b = normalizedBytes(text)
    val t = tokenize(b)
    val m = t.length / 2
    if (m < n) return new GenericArrayData(new Array[AnyRef](0))
    val cnt = m - n + 1
    val out = new Array[AnyRef](cnt)
    var scratch = new Array[Byte](64)
    var i = 0
    while (i < cnt) {
      var len = 0
      var k = 0
      while (k < n) {
        val ts = t(2 * (i + k)); val te = t(2 * (i + k) + 1)
        val tl = te - ts
        if (len + tl + 1 > scratch.length)
          scratch = java.util.Arrays.copyOf(scratch,
            math.max(scratch.length * 2, len + tl + 1))
        if (k > 0) { scratch(len) = 0x20; len += 1 }
        System.arraycopy(b, ts, scratch, len, tl)
        len += tl
        k += 1
      }
      out(i) = UTF8String.fromBytes(java.util.Arrays.copyOf(scratch, len))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** DISTINCT `xxhash64` (seed 42) values of all word n-gram spans of
    * `text`, first-occurrence order — the kernel form of
    * `shingleRowsAll → xxhash64(s) → distinct` per document. Fewer than
    * n tokens → empty array. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val b = normalizedBytes(text)
    val t = tokenize(b)
    val m = t.length / 2
    if (m < n) return new GenericArrayData(new Array[Long](0))
    val cnt = m - n + 1
    // open-addressed long set (0 = empty slot; the value 0 gets a flag)
    var cap = java.lang.Integer.highestOneBit(math.max(4, cnt * 2 - 1)) * 2
    var set = new Array[Long](cap)
    var hasZero = false
    val out = new Array[Long](cnt)
    var nOut = 0
    var scratch = new Array[Byte](64)
    var i = 0
    while (i < cnt) {
      var len = 0
      var k = 0
      while (k < n) {
        val ts = t(2 * (i + k)); val te = t(2 * (i + k) + 1)
        val tl = te - ts
        if (len + tl + 1 > scratch.length)
          scratch = java.util.Arrays.copyOf(scratch,
            math.max(scratch.length * 2, len + tl + 1))
        if (k > 0) { scratch(len) = 0x20; len += 1 }
        System.arraycopy(b, ts, scratch, len, tl)
        len += tl
        k += 1
      }
      val h = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      // probe
      if (h == 0L) {
        if (!hasZero) { hasZero = true; out(nOut) = 0L; nOut += 1 }
      } else {
        var idx = (java.lang.Long.hashCode(h * -7046029254386353131L)) & (cap - 1)
        var done = false
        while (!done) {
          val v = set(idx)
          if (v == h) done = true
          else if (v == 0L) { set(idx) = h; out(nOut) = h; nOut += 1; done = true }
          else idx = (idx + 1) & (cap - 1)
        }
      }
      i += 1
    }
    if (nOut == cnt) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }
}

object MinhashUtil {

  /** Per-document MinHash band hashes from the DISTINCT shingle-hash
    * array — the kernel form of [[graft.operators.NearDup.minhashBands]]'
    * seed-explode + grouped-conditional-min aggregation, bit-identical
    * to it (pinned by ShingleKernelSpec's A/B):
    *
    *  - slot min for (band b, slot r): `min over sh of
    *    xxhash64(seed, h)` with seed = b·bandRows + r, which Spark's
    *    XxHash64 evaluates as `hashLong(h, hashInt(seed, 42))` — the
    *    kernel hoists `hashInt(seed, 42)` out of the per-shingle loop
    *    (the expression recomputed it per row);
    *  - band hash: the `xxhash64(band, m0…m_{r-1})` chain
    *    `hashInt(band, 42)` then `hashLong(m_i, ·)` in slot order; a
    *    trailing band with fewer slots (numHashes not divisible by
    *    bandRows) hashes only its populated slots, exactly as the
    *    expression's null-skipping did;
    *  - an empty shingle array yields an empty band array (the row form
    *    had no rows to aggregate), so `posexplode` drops the document.
    *
    * What this removes at scale: numHashes map-side rows per shingle
    * (the explode), one hash-aggregation probe per such row, and the
    * partial-agg buffers — the banding becomes a scan-speed projection
    * of the (already in-hand) shingle array, and the first exchange of
    * the LSH pipeline moves `numBands` finished (id, band, bhash) rows
    * per document. */
  def minhashBandHashes(sh: ArrayData, numHashes: Int, bandRows: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(new Array[Long](0))
    val nb = (numHashes + bandRows - 1) / bandRows
    val out = new Array[Long](nb)
    var b = 0
    while (b < nb) {
      val slots = math.min(bandRows, numHashes - b * bandRows)
      var h = XXH64.hashInt(b, 42L)
      var r = 0
      while (r < slots) {
        val hseed = XXH64.hashInt(b * bandRows + r, 42L)
        var m = Long.MaxValue
        var i = 0
        while (i < n) {
          val v = XXH64.hashLong(sh.getLong(i), hseed)
          if (v < m) m = v
          i += 1
        }
        h = XXH64.hashLong(m, h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_minhash_bands(sh, numHashes, bandRows)` — per-document MinHash
  * band hashes over a distinct shingle-hash array, as `array<bigint>`
  * indexed by band ([[MinhashUtil.minhashBandHashes]]'s contract).
  * numHashes/bandRows must be foldable positive ints. */
case class MinhashBands(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "graft_minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, foldable int, foldable int), got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString})")
    }

  override def nullSafeEval(sh: Any, numHashes: Any, bandRows: Any): Any =
    MinhashUtil.minhashBandHashes(sh.asInstanceOf[ArrayData],
      numHashes.asInstanceOf[Int], bandRows.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, nh, br) => s"""
       |${ev.value} = graft.functions.MinhashUtil.minhashBandHashes($sh, $nh, $br);
     """.stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MinhashBands =
    copy(first = f, second = s, third = t)
}

/** `graft_shingle_spans(text, n)` — every word n-gram span of `text` as
  * `array<string>`, duplicates kept, [[ShingleUtil]]'s exactness
  * contract. `n` must be a foldable positive int. */
case class ShingleSpans(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_spans"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, IntegerType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(text: Any, nv: Any): Any =
    ShingleUtil.shingleSpans(text.asInstanceOf[UTF8String], nv.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, nv) => s"graft.functions.ShingleUtil.shingleSpans($t, $nv)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleSpans =
    copy(left = newLeft, right = newRight)
}

/** `graft_shingle_hashes(text, n)` — distinct `xxhash64` keys of every
  * word n-gram span of `text` as `array<bigint>`, [[ShingleUtil]]'s
  * exactness contract. `n` must be a foldable positive int. */
case class ShingleHashes(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, IntegerType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(text: Any, nv: Any): Any =
    ShingleUtil.shingleHashes(text.asInstanceOf[UTF8String], nv.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, nv) => s"graft.functions.ShingleUtil.shingleHashes($t, $nv)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}
