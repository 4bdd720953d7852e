package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernels for the text-hashing / LSH hot paths, shared by the
  * interpreted `eval` and the generated code of the expressions below.
  *
  * These replace the higher-order-function formulations (`aggregate` /
  * `zip_with` / `transform`), which Spark runs interpreted — O(tokens·60)
  * boxed lambda calls per document for simhash, O(len·k) for the gram
  * fingerprint, O(planes·dims) per table for LSH bucketing. Each kernel is
  * bit-identical to its HOF twin (asserted by TextOpsSpec / SimilaritySpec
  * A/B tests), so the DuckDB oracles are unchanged.
  *
  * A top-level Scala object compiles to static forwarder methods, so
  * generated Java calls these directly — one static call per row, primitive
  * loops inside, no boxing.
  */
object TextHashUtil {

  /** 60-bit value of the first 15 hex chars of md5(tok) — numerically equal
    * to `conv(substring(md5(tok), 1, 15), 16, 10)`: the top 60 bits of the
    * first 8 digest bytes read big-endian. */
  def md5Bits60(tok: UTF8String): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(tok.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** SimHash sketch over a token array (see [[graft.operators.TextHash.simhash]]
    * for the algorithm contract). A null element votes −1 on every bit —
    * exactly what the HOF fold does (`md5(null)` → null makes the
    * bit-test `when` fall through to the −1 branch), so the two
    * formulations stay bit-identical even on inputs the catalog's
    * `split` can never produce. */
  def simhash60(toks: ArrayData): java.lang.Long = {
    val n = toks.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        var b = 0
        while (b < 60) { votes(b) -= 1; b += 1 }
      } else {
        val h = md5Bits60(toks.getUTF8String(i))
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sketch = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sketch |= 1L << b; b += 1 }
    sketch
  }

  /** 128-bit SimHash sketch over a token array, as [hi, lo] longs — the
    * wide twin of [[simhash60]] for corpus-scale banding: cutting the
    * sketch into `maxHamming + 1` bands gives ≥ 32-bit bands at Hamming
    * ≤ 3, so unrelated documents collide per band with p = 2⁻³² and the
    * n²/2^bits false-candidate term of the 60-bit sketch (material at
    * n ≈ 10⁵, measured exponent 1.59 in the r9 sf1 probe) moves to
    * n ≈ 10⁹. Bit layout: md5's 16 digest bytes read big-endian as a
    * 128-bit value H (hi = bytes 0–7, lo = bytes 8–15); token votes test
    * bit b of H and the sketch keeps the sign per position, ties → 0,
    * exactly [[simhash60]]'s convention. A null element votes −1 on
    * every bit, matching the 60-bit kernel's null semantics. */
  def simhash128(toks: ArrayData): Array[Long] = {
    val n = toks.numElements()
    val votes = new Array[Int](128)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        var b = 0
        while (b < 128) { votes(b) -= 1; b += 1 }
      } else {
        val d = org.apache.commons.codec.digest.DigestUtils.md5(
          toks.getUTF8String(i).getBytes)
        var hHi = 0L
        var hLo = 0L
        var k = 0
        while (k < 8) { hHi = (hHi << 8) | (d(k) & 0xffL); k += 1 }
        while (k < 16) { hLo = (hLo << 8) | (d(k) & 0xffL); k += 1 }
        var b = 0
        while (b < 64) {
          if (((hLo >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          if (((hHi >>> b) & 1L) == 1L) votes(64 + b) += 1 else votes(64 + b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) lo |= 1L << b
      if (votes(64 + b) > 0) hi |= 1L << b
      b += 1
    }
    Array(hi, lo)
  }

  /** Unicode NFC normalization (already-normalized strings — the common
    * case — short-circuit on the isNormalized check without allocating). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  private final val Base = 131L
  private final val Mod = 1000000007L

  /** Rabin-Karp polynomial fold over the string's code points —
    * `(acc * 131 + codepoint) mod (1e9+7)`, identical to the
    * `aggregate(split(c, ''), ...)` + `ascii` formulation. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Minimum [[polyHash]] over all k-codepoint windows, computed with a
    * rolling hash — O(len) total where the HOF twin pays O(len·k). Null
    * when the string is shorter than k (array_min of an empty array). */
  def minGramHash(s: UTF8String, k: Int): java.lang.Long = {
    val str = s.toString
    val cps = str.codePoints().toArray
    if (cps.length < k) return null
    // 131^(k-1) mod M, for the leading-codepoint removal step
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = pow * Base % Mod; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + cps(i)) % Mod; i += 1 }
    var min = h
    var start = 1
    while (start <= cps.length - k) {
      val dropped = (h - cps(start - 1) * pow % Mod + Mod) % Mod
      h = (dropped * Base + cps(start + k - 1)) % Mod
      if (h < min) min = h
      start += 1
    }
    min
  }

  /** Random-hyperplane LSH bucket per table (see
    * [[graft.operators.Similarity]]): bucket(t) packs the sign bits of
    * `numPlanes` pseudo-random projections, coefficients derived from
    * `xxhash64(t, p, d)` exactly as the Column formulation derives them
    * (seed 42, int-typed inputs chained through XXH64.hashInt). A null
    * vector element makes every projection null → bit 0, matching the HOF
    * `when(proj >= 0, 1).otherwise(0)` null semantics. */
  def hyperplaneBuckets(vec: ArrayData, numPlanes: Int, numTables: Int): Array[Long] = {
    val dims = vec.numElements()
    val out = new Array[Long](numTables)
    var j = 0
    while (j < dims) {
      if (vec.isNullAt(j)) return out
      j += 1
    }
    var t = 0
    while (t < numTables) {
      val ht = XXH64.hashInt(t, 42L)
      var acc = 0L
      var p = 0
      while (p < numPlanes) {
        val hp = XXH64.hashInt(p, ht)
        var proj = 0.0
        var d = 0
        while (d < dims) {
          val m = ((XXH64.hashInt(d, hp) % 2001L) + 2001L) % 2001L
          proj += vec.getDouble(d) * (m / 1000.0 - 1.0)
          d += 1
        }
        acc = acc * 2 + (if (proj >= 0) 1L else 0L)
        p += 1
      }
      out(t) = acc
      t += 1
    }
    out
  }

  /** Jaro-Winkler similarity in [0, 1] — the fuzzy record-linkage
    * workhorse Spark has no builtin for (`levenshtein` is its only edit
    * metric). Standard Jaro (match window `max(|a|,|b|)/2 − 1`, greedy
    * left-to-right matching, half-transposition count) with the Winkler
    * common-prefix boost `j + l·0.1·(1−j)` applied when `j > 0.7`,
    * prefix capped at 4. Every division and product is evaluated in the
    * same fixed IEEE shape as DuckDB's `jaro_winkler_similarity`, so
    * oracle comparisons are BIT-exact (pinned by a 4000-pair fuzz at
    * build time and TextOpsSpec's known-value table). Operates on UTF-16
    * code units; on ASCII — every catalog use — unit choice is
    * irrelevant. Empty-vs-anything (including empty-vs-empty) is 0.0,
    * matching DuckDB's convention. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val mw = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      var j = math.max(0, i - mw)
      val hi = math.min(l2, i + mw + 1)
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    var jaro = (md / l1 + md / l2 + (m - t).toDouble / md) / 3.0
    if (jaro > 0.7) {
      val maxp = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < maxp && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro = jaro + l * 0.1 * (1.0 - jaro)
    }
    jaro
  }

  /** Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner '75):
    * insert / delete / substitute / adjacent-transpose, where a
    * transposed pair may have edits between its halves — the TRUE metric,
    * strictly ≤ the common OSA restriction (e.g. "ca"→"abc" is 2 here,
    * 3 under OSA). Matches DuckDB's `damerau_levenshtein` exactly
    * (3000-pair fuzz, 0 diffs); integer-valued, so oracle comparison has
    * no float hazard at all. Complements `levenshtein` (Spark's only
    * builtin edit metric), which charges transpositions 2.
    * O(|a|·|b|) time, O(|a|·|b|) ints — intended for short keys (names,
    * codes), gated behind blocking like every pairwise metric here. */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Int = {
    val f1 = a.toString
    val f2 = b.toString
    // Common prefix/suffix stripping (r13): blocked callers (q150 keys
    // on brand + FIRST TOKEN, and the sf1 fixture prefixes every name)
    // hand this kernel pairs sharing long identical affixes, and the DP
    // is quadratic in what remains. Safe for the unrestricted metric:
    // an optimal Lowrance-Wagner script never needs to edit an
    // identical affix — pinned empirically by ShingleKernelSpec's
    // small-alphabet fuzz against the unstripped kernel (the regime
    // where a boundary-transposition counterexample would surface) on
    // top of the existing 3000-pair DuckDB fuzz.
    var p = 0
    val maxP = math.min(f1.length, f2.length)
    while (p < maxP && f1.charAt(p) == f2.charAt(p)) p += 1
    var sfx = 0
    val maxS = maxP - p
    while (sfx < maxS &&
      f1.charAt(f1.length - 1 - sfx) == f2.charAt(f2.length - 1 - sfx)) sfx += 1
    dlCore(f1.substring(p, f1.length - sfx), f2.substring(p, f2.length - sfx))
  }

  /** The unstripped Lowrance-Wagner DP — [[damerauLevenshtein]] without
    * the affix strip, kept as the fuzz reference for the stripping
    * optimization (ShingleKernelSpec pins strip ≡ no-strip on a
    * small-alphabet fuzz where boundary-transposition counterexamples
    * would surface). */
  private[graft] def damerauLevenshteinRef(a: String, b: String): Int =
    dlCore(a, b)

  private def dlCore(s1: String, s2: String): Int = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0) return l2
    if (l2 == 0) return l1
    val inf = l1 + l2
    // flat (l1+2) x (l2+2) matrix with the Lowrance-Wagner sentinel
    // border — ONE allocation per call where 2D Array.ofDim costs l1+2
    // allocations and a double deref per cell (this + the ASCII da table
    // measured q150's 875k-pair tier 6.0 -> 4.1 s at sf0.1)
    val w = l2 + 2
    val d = new Array[Int]((l1 + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= l1) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= l2) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    // last-seen row per character: int table for ASCII (the hot case —
    // part names, codes), map fallback only when non-ASCII appears
    val daAscii = new Array[Int](128)
    var daMap: java.util.HashMap[Character, Integer] = null
    def daGet(c: Char): Int =
      if (c < 128) daAscii(c)
      else if (daMap == null) 0
      else { val v = daMap.get(c); if (v == null) 0 else v.intValue() }
    def daPut(c: Char, v: Int): Unit =
      if (c < 128) daAscii(c) = v
      else {
        if (daMap == null) daMap = new java.util.HashMap[Character, Integer]()
        daMap.put(c, v)
      }
    i = 1
    while (i <= l1) {
      var db = 0
      val c1 = s1.charAt(i - 1)
      j = 1
      while (j <= l2) {
        val c2 = s2.charAt(j - 1)
        val k = daGet(c2)
        val l = db
        val cost = if (c1 == c2) { db = j; 0 } else 1
        var m = d(i * w + j) + cost
        if (d((i + 1) * w + j) + 1 < m) m = d((i + 1) * w + j) + 1
        if (d(i * w + j + 1) + 1 < m) m = d(i * w + j + 1) + 1
        val tr = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        if (tr < m) m = tr
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      daPut(c1, i)
      i += 1
    }
    d((l1 + 1) * w + l2 + 1)
  }
}

/** `graft_simhash60(tokens)` — SimHash sketch of an array<string>. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.simhash60(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sketch")
      s"""
         |java.lang.Long $r = graft.functions.TextHashUtil.simhash60($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** `graft_simhash128(tokens)` — 128-bit SimHash sketch of an array<string>,
  * returned as `array<bigint>` [hi, lo] (see [[TextHashUtil.simhash128]]
  * for the bit layout and the banding rationale). */
case class SimHash128(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash128"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashUtil.simhash128(input.asInstanceOf[ArrayData]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
       |  graft.functions.TextHashUtil.simhash128($c));
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHash128 =
    copy(child = newChild)
}

/** `graft_polyhash(str)` — Rabin-Karp polynomial fingerprint of a string. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.polyHash(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.polyHash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** `graft_mingram_hash(str, k)` — minimum rolling hash over k-codepoint
  * windows; k must be a foldable positive int. */
case class MinGramHash(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mingram_hash"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, IntegerType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(text: Any, kv: Any): Any =
    TextHashUtil.minGramHash(text.asInstanceOf[UTF8String], kv.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, kv) => {
      val r = ctx.freshName("minGram")
      s"""
         |java.lang.Long $r = graft.functions.TextHashUtil.minGramHash($t, $kv);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinGramHash =
    copy(left = newLeft, right = newRight)
}

/** `graft_jaro_winkler(a, b)` — Jaro-Winkler similarity of two strings,
  * bit-exact with DuckDB's `jaro_winkler_similarity` (see
  * [[TextHashUtil.jaroWinkler]] for the pinned semantics). One static
  * call per row inside WholeStageCodegen. */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashUtil.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHashUtil.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** `graft_damerau_levenshtein(a, b)` — unrestricted Damerau-Levenshtein
  * edit distance, matching DuckDB's `damerau_levenshtein` (see
  * [[TextHashUtil.damerauLevenshtein]]). Integer-valued — no float
  * parity hazard. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_damerau_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashUtil.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHashUtil.damerauLevenshtein($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

/** `graft_nfc(str)` — Unicode NFC normalization (canonical decomposition
  * followed by canonical composition), the first step of a canonical
  * content key: visually-identical strings with different codepoint
  * sequences (e.g. precomposed é vs e + combining acute) normalize to one
  * form. Wraps `java.text.Normalizer`; DuckDB's `nfc_normalize` computes
  * the same Unicode-defined mapping, so oracles line up. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `graft_stopword_count(tokens, stopwords)` — how many elements of the
  * token array appear in the (foldable) stopword array. A hash-set probe
  * per token inside WholeStageCodegen; the `filter`-HOF formulation runs
  * interpreted. */
case class StopwordCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_stopword_count"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_: StringType, _), ArrayType(_: StringType, _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable array<string>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    val s = new java.util.HashSet[UTF8String](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) { s.add(arr.getUTF8String(i)); i += 1 }
    s
  }

  /** Public for generated code (called via a codegen reference object). */
  def countIn(toks: ArrayData): Int = {
    var n = 0
    var i = 0
    while (i < toks.numElements()) {
      if (!toks.isNullAt(i) && stopSet.contains(toks.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override def nullSafeEval(toks: Any, stops: Any): Any =
    countIn(toks.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordCounter", this, classOf[StopwordCount].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $ref.countIn($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StopwordCount =
    copy(left = newLeft, right = newRight)
}

/** `graft_hyperplane_buckets(vec, numPlanes, numTables)` — all LSH table
  * buckets of an array<double> vector in one pass, as array<bigint> of
  * length numTables. Plane/table counts must be foldable ints. */
case class HyperplaneBuckets(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "graft_hyperplane_buckets"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, foldable int, foldable int), got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString})")
    }

  override def nullSafeEval(vec: Any, planes: Any, tables: Any): Any =
    new GenericArrayData(TextHashUtil.hyperplaneBuckets(
      vec.asInstanceOf[ArrayData], planes.asInstanceOf[Int], tables.asInstanceOf[Int]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, planes, tables) => s"""
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
       |  graft.functions.TextHashUtil.hyperplaneBuckets($vec, $planes, $tables));
     """.stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): HyperplaneBuckets =
    copy(first = f, second = s, third = t)
}
