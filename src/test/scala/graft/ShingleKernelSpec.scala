package graft

import org.apache.spark.sql.functions._

import graft.operators.NearDup

/** A/B pin of the single-pass shingle kernel
  * ([[graft.functions.ShingleUtil]], r13) against the round-12 relational
  * formulation it replaced ([[NearDup.shingleRowsAllRelational]]) — the
  * same executable-specification convention as TextHash's `*Hof` twins.
  * The kernel must be row-identical (multiset for span rows, set for the
  * per-document distinct hashes) on every whitespace/edge shape the
  * `split(trim(text), "[ \t\n\x0B\f\r]+")` pipeline can produce.
  */
class ShingleKernelSpec extends SparkSpec {
  import spark.implicits._

  // every shape the trim+split semantics distinguish: empty, all-space
  // (trim → "" → the single empty token), tab-only (trim keeps it →
  // TWO empty tokens), leading/trailing separators surviving trim
  // (empty first/last tokens), doubled separators, every separator char,
  // unicode (multi-byte, combining, surrogate pairs), repeated spans
  private val edgeDocs: Seq[String] = Seq(
    "", " ", "  ", "\t", "\n", " \t ", "a", " a", "a ", "\ta", "a\n",
    "a b", "a  b", "a b c d e", "a\tb\ncd\fe\rf",
    "x x x x", "a b a b a b", "\t\ta b c\n\n",
    "héllo wörld ünïcode tökens hère",
    "日本語 トークン 分割 テスト 確認",
    "é combining é marks é here",
    "emoji 😀 pair 😀 test 😀 ok",
    "mixed \t ascii ünïcode \n 日本語  end ")

  private def docsDf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def randomDocs(seed: Long, nDocs: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val seps = Array(" ", "\t", "\n", "", "\f", "\r", "  ", " \t")
    val words = Array("alpha", "beta", "g", "delta9", "ε", "ζη", "x", "yy",
      "café", "naïve", "日本", "")
    (0 until nDocs).map { _ =>
      val n = rnd.nextInt(12)
      val sb = new StringBuilder
      if (rnd.nextBoolean()) sb.append(seps(rnd.nextInt(seps.length)))
      var i = 0
      while (i < n) {
        sb.append(words(rnd.nextInt(words.length)))
        if (i < n - 1 || rnd.nextBoolean())
          sb.append(seps(rnd.nextInt(seps.length)))
        i += 1
      }
      sb.toString
    }
  }

  private def assertKernelMatches(texts: Seq[String], n: Int): Unit = {
    val df = docsDf(texts)
    // span rows: multiset equality (occurrence counts matter)
    val kSpans = NearDup.shingleRowsAll(df, "doc_id", "text", n)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val rSpans = NearDup.shingleRowsAllRelational(df, "doc_id", "text", n)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(kSpans == rSpans, s"span rows diverge at n=$n")
    // distinct hash rows: set equality AND count equality (true dedup)
    val kHash = NearDup.shingleHashRows(df, "doc_id", "text", n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val rHash = NearDup.shingleRowsAllRelational(df, "doc_id", "text", n)
      .select(col("id"), xxhash64(col("s")).as("hs")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(kHash == rHash, s"hash rows diverge at n=$n")
  }

  test("kernel ≡ relational pipeline on edge-shape docs, n ∈ {1,2,3,5}") {
    for (n <- Seq(1, 2, 3, 5)) assertKernelMatches(edgeDocs, n)
  }

  test("kernel ≡ relational pipeline on 300 random whitespace-fuzz docs") {
    for ((seed, n) <- Seq((1L, 2), (2L, 3), (3L, 3)))
      assertKernelMatches(randomDocs(seed, 100), n)
  }

  test("kernel ≡ relational pipeline on the real documents fixture") {
    val docs = graft.sources.Tables.load(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
    val k = NearDup.shingleHashRows(docs, "doc_id", "text", 3)
    val r = NearDup.shingleRowsAllRelational(docs, "doc_id", "text", 3)
      .select(col("id"), xxhash64(col("s")).as("hs")).distinct()
    assert(k.count() == r.count())
    assert(k.except(r).isEmpty && r.except(k).isEmpty)
  }

  test("minhash band kernel ≡ seed-explode aggregation, incl. non-dividing bands") {
    val docs = graft.sources.Tables.load(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
    val arrs = NearDup.shingleHashArrays(docs, "doc_id", "text", 3)
    val rows = arrs.select(col("id"), explode(col("sh")).as("hs"))
    // (192,3) = the catalog's production shape; (7,3) exercises the
    // trailing band with fewer slots (seed 6 alone in band 2), whose
    // aggregation form null-skips the missing slot mins
    for ((nh, br) <- Seq((192, 3), (128, 2), (7, 3))) {
      val k = NearDup.minhashBandsFromArrays(arrs, nh, br)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      val a = NearDup.minhashBands(rows, nh, br)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      assert(k == a, s"bands diverge at numHashes=$nh bandRows=$br")
    }
  }

  test("damerau affix-strip ≡ unstripped DP on a small-alphabet fuzz") {
    // 2-3 letter alphabets maximize transposition interactions at the
    // strip boundary — the regime where an unsafe prefix/suffix trim
    // would first diverge from the true unrestricted metric
    import graft.functions.TextHashUtil
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(7L)
    val alphabets = Seq("ab", "abc")
    var checked = 0
    for (alpha <- alphabets; _ <- 1 to 30000) {
      def mk(): String = {
        val n = rnd.nextInt(9)
        (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val x = mk(); val y = mk()
      val stripped = TextHashUtil.damerauLevenshtein(
        UTF8String.fromString(x), UTF8String.fromString(y))
      val ref = TextHashUtil.damerauLevenshteinRef(x, y)
      assert(stripped == ref, s"strip divergence on ('$x','$y'): " +
        s"stripped=$stripped ref=$ref")
      checked += 1
    }
    assert(checked == 60000)
  }

  test("NULL text and short docs vanish; empty-trim doc yields one token") {
    val df = Seq((1L, null), (2L, "only two"), (3L, "   "), (4L, "a b c"))
      .toDF("doc_id", "text")
    val rows = NearDup.shingleRowsAll(df, "doc_id", "text", 3).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(4L)) // 1 null, 2 short, 3 short
    // n=1 on the all-space doc: trim → "" → single empty token → span ""
    val one = NearDup.shingleRowsAll(df, "doc_id", "text", 1)
      .filter(col("id") === 3L).collect()
    assert(one.length == 1 && one.head.getString(1) == "")
    // shingleHashArrays carries sz = |distinct shingles| per doc
    val arrs = NearDup.shingleHashArrays(df, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.isNullAt(2)))
    assert(arrs.length == 4)
  }
}
