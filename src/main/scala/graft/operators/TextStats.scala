package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: token counting,
  * quality signals, exact-dedup keys. All pure column expressions
  * (whole-stage-codegen'd, no UDFs), so they run at scan speed and
  * parallelize trivially — the properties that matter at 100 TB.
  */
object TextStats {

  /** Whitespace token count. `split` + `size` stays inside codegen. */
  def tokenCount(text: Column): Column = size(split(trim(text), "[ \\t\\n\\x0B\\f\\r]+"))

  /** Count of sentence-ending punctuation ([.!?]). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.!?]", ""))

  /** GPT-2-style pre-tokenizer pattern: contractions, space-prefixed
    * letter/digit runs, punctuation runs. Restricted to syntax RE2 and the
    * JVM regex engine interpret identically (`\p{L}`/`\p{N}`, no
    * lookaround), so the DuckDB oracle counts the same tokens. */
  val BpePattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  /** BPE-ish token count: number of pre-tokenizer matches — the standard
    * cheap proxy for LLM token budget accounting. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** [[BpePattern]] as a DuckDB string literal (apostrophe doubled). */
  val sqlBpePattern: String =
    "'''(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'"

  /** Exact-dedup key: md5 over the raw text. Stable across engines and
    * runs; groupBy on the 128-bit digest shuffles 16 bytes + id per row
    * instead of the document body. */
  def contentKey(text: Column): Column = md5(text)

  /** Canonical text form for normalized dedup (C4-style): Unicode NFC
    * (native [[graft.functions.NfcNormalize]] — precomposed and combining
    * sequences unify), casefold, trim, whitespace runs collapsed to one
    * space. Everything stays codegen'd (NFC is one static call per row
    * with an isNormalized fast path). */
  def canonicalText(text: Column): Column =
    regexp_replace(trim(lower(call_function("graft_nfc", text))), "[ \\t\\n\\x0B\\f\\r]+", " ")

  /** Dedup key over the canonical form — catches case/whitespace/Unicode
    * -form variants that byte-exact [[contentKey]] treats as distinct. */
  def canonicalKey(text: Column): Column = md5(canonicalText(text))

  /** DuckDB mirror of [[canonicalText]]. */
  def sqlCanonicalText(expr: String): String =
    s"regexp_replace(trim(lower(nfc_normalize($expr))), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')"

  /** Compact English stopword list for the stopword-ratio quality signal
    * (a C4/Gopher-style filter input: natural prose has a healthy share of
    * function words, keyword spam and boilerplate do not). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "was", "for", "on", "with", "as", "at", "by", "be", "this", "are",
    "from", "not", "but", "they", "his", "her", "she", "he", "you", "we")

  /** How many lowercase whitespace tokens are stopwords — a native
    * hash-set probe per token ([[graft.functions.StopwordCount]], inside
    * WholeStageCodegen; a `filter` HOF would run interpreted). */
  def stopwordCount(text: Column): Column =
    call_function("graft_stopword_count",
      split(trim(lower(text)), "[ \\t\\n\\x0B\\f\\r]+"),
      lit(Stopwords.toArray))

  /** Adds deterministic per-document quality-signal columns:
    * character count, token count, punctuation count, mean token length,
    * punctuation ratio, stopword ratio. Zero-length inputs make a ratio's
    * denominator 0 (empty documents are a fact of any raw corpus); each
    * ratio is NULL in that case — an explicit `when` guard, because ANSI
    * mode turns the bare division into a job-killing error, and the
    * DuckDB oracle mirrors it with NULLIF. NULL text yields NULL signals
    * (the row stays — quality scoring is total over the corpus). */
  def withQualitySignals(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    def over(num: Column, den: Column): Column =
      when(den === 0, lit(null)).otherwise(num / den)
    df.withColumn("q_chars", length(t))
      .withColumn("q_tokens", tokenCount(t))
      .withColumn("q_punct", punctCount(t))
      .withColumn("avg_token_len",
        over(length(regexp_replace(t, "[ \\t\\n\\x0B\\f\\r]+", "")).cast("double"), col("q_tokens")))
      .withColumn("punct_ratio", over(col("q_punct").cast("double"), col("q_chars")))
      .withColumn("stopword_ratio",
        over(stopwordCount(t).cast("double"), col("q_tokens")))
  }

  /** DuckDB mirror of [[stopwordCount]]. */
  def sqlStopwordCount(expr: String): String = {
    val list = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""len(list_filter(regexp_split_to_array(trim(lower($expr)), '[ \\t\\n\\x0B\\f\\r]+'),
       |  t -> t IN ($list)))""".stripMargin
  }

  /** Gopher-style repetition signals, per document:
    * `dup_token_fraction` (1 − distinct/total tokens — repeated-content
    * proxy) and `top_bigram_fraction` (occurrences of the most frequent
    * word bigram / total bigrams — a single dominating 2-gram marks
    * boilerplate). Both are exact integer ratios → deterministic doubles.
    *
    * Relational all the way (posexplode → window lead → two hash aggs), so
    * everything stays codegen'd; the shuffles carry (id, token/bigram)
    * rows and each aggregation collapses map-side. Documents with fewer
    * than two tokens have no bigrams → fraction 0. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val tok = df.select(col(idCol).as("id"),
      posexplode(split(trim(col(textCol)), "[ \\t\\n\\x0B\\f\\r]+")).as(Seq("pos", "w0")))
    val tokStats = tok.groupBy(col("id")).agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col("w0")).as("n_distinct"))
    val bigramCounts = tok
      .withColumn("w1", lead(col("w0"), 1).over(w))
      .filter(col("w1").isNotNull)
      .groupBy(col("id"), concat_ws(" ", col("w0"), col("w1")).as("bg"))
      .agg(count(lit(1)).as("c"))
    val bigramStats = bigramCounts.groupBy(col("id"))
      .agg(max(col("c")).as("top_c"), sum(col("c")).as("total_bg"))
    tokStats.join(bigramStats, Seq("id"), "left")
      .select(col("id"),
        col("n_tokens"), col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
          .as("dup_token_fraction"),
        coalesce(col("top_c").cast("double") / col("total_bg"), lit(0.0))
          .as("top_bigram_fraction"))
  }

  /** Top-k most salient terms per document by TF-IDF: `tf(d,w) · ln(N /
    * df(w))`, ties broken by term — the classic term-salience operator for
    * corpus exploration and keyword extraction.
    *
    * Scale shape: two hash aggregations over (id, token) rows (term
    * frequencies, then document frequencies from the collapsed tf table —
    * never a second corpus scan), the corpus size N joined in as a
    * broadcast scalar (no driver-side count), and a per-document window
    * for the top-k. Determinism: tf/df/N are exact integers; `ln` is the
    * one transcendental, and library implementations disagree in the last
    * ulp (measured: JVM intrinsic vs libm on ~3% of this corpus's N/df
    * ratios), so the score is snapped to 8 decimals — far above ulp noise,
    * far below any ranking-relevant difference — with ranking ties broken
    * by term on both engines. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol).as("id"),
      explode(split(trim(col(textCol)), "[ \\t\\n\\x0B\\f\\r]+")).as("term"))
    val tf = tok.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfCounts = tf.groupBy(col("term")).agg(count(lit(1)).as("df_docs"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfCounts, Seq("term"))
      .crossJoin(broadcast(n))
      // round(…, 8): the JVM's Math.log intrinsic and libm differ in the
      // last ulp for some inputs (measured: ~3% of this corpus's N/df
      // ratios), so the score is snapped to 8 decimals on both engines
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df_docs")), 8))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"), col("df_docs"),
        col("score"))
  }

  /** DuckDB mirror of [[tfidfTopTerms]] (CTE body; expose `ranked` with
    * columns id, rank, term, tf, df_docs, score). */
  def sqlTfidfCtes(idCol: String, textCol: String, k: Int = 3): String =
    s"""tok AS (
       |  SELECT $idCol AS id, unnest(regexp_split_to_array(trim($textCol), '[ \\t\\n\\x0B\\f\\r]+')) AS term
       |  FROM documents),
       |tf AS (SELECT id, term, count(*) AS tf FROM tok GROUP BY id, term),
       |dfc AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY term),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.id, tf.term, tf.tf, dfc.df_docs,
       |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfc.df_docs), 8) AS score
       |  FROM tf JOIN dfc USING (term) CROSS JOIN n),
       |ranked AS (
       |  SELECT id, CAST(row_number() OVER (PARTITION BY id ORDER BY score DESC, term) AS BIGINT) AS rank,
       |    term, tf, df_docs, score
       |  FROM scored
       |  QUALIFY rank <= $k)""".stripMargin

  /** BM25 relevance of every document against a fixed query-term set
    * (Robertson-Sparck Jones / Okapi BM25, the scoring function behind
    * quality-retrieval data curation): per (doc, term)
    * `idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))` with the standard
    * k1=1.2, b=0.75 and the +1-smoothed idf
    * `ln((N − df + 0.5)/(df + 0.5) + 1)` (always positive, so stopword
    * terms rank low instead of negative). Returns (id, n_terms, score)
    * for every document containing ≥ 1 query term.
    *
    * Cross-engine determinism: tf/df/dl/N are exact integers; the two
    * float steps (idf, per-term contribution) are snapped to 8 decimals
    * like [[tfidfTopTerms]], and the per-doc sum runs in exact decimal —
    * so scores hash-match and are partitioning-independent. Constants
    * are written as identical literals on both engines (1.2+1 is NOT
    * recomputed as a double sum — 2.2 appears verbatim) because
    * `1.0 + 1.2` lands on a round-to-even tie one ulp away from the
    * literal. Scale shape: one token explode filtered to the bounded
    * term set, a broadcast of the ≤|terms|-row df frame and the 1-row
    * corpus stats — no shuffle wider than the matching postings.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val docs = df.select(col(idCol).as("id"),
      split(trim(col(textCol)), "[ \\t\\n\\x0B\\f\\r]+").as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = docs.select(col("id"), col("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df_docs"))
    tf.join(broadcast(dfc), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf", round(log(
        (col("n_docs") - col("df_docs") + 0.5) / (col("df_docs") + 0.5)
          + 1.0), 8))
      .withColumn("contrib", round(
        col("idf") * (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25)
            + lit(0.75) * col("dl") / col("avgdl"))), 8))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(col("contrib").cast("decimal(20,8)")), 8).cast("double")
          .as("score"))
  }

  /** DuckDB mirror of [[bm25]] over `documents`. `termsList` is the SQL
    * list literal, e.g. `('dup','scan')`. Emits CTEs ending in `bm25`
    * (id, n_terms, score). */
  def sqlBm25Ctes(idCol: String, textCol: String,
      termsList: String): String =
    s"""docs AS (
       |  SELECT $idCol AS id,
       |    len(regexp_split_to_array(trim($textCol), '[ \\t\\n\\x0B\\f\\r]+')) AS dl,
       |    regexp_split_to_array(trim($textCol), '[ \\t\\n\\x0B\\f\\r]+') AS toks
       |  FROM documents),
       |bmstats AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
       |  FROM docs),
       |bmtf AS (
       |  SELECT id, dl, term, count(*) AS tf FROM (
       |    SELECT id, dl, unnest(toks) AS term FROM docs)
       |  WHERE term IN $termsList
       |  GROUP BY 1, 2, 3),
       |bmdf AS (SELECT term, count(*) AS df_docs FROM bmtf GROUP BY 1),
       |bmscored AS (
       |  SELECT t.id,
       |    round(round(ln((s.n_docs - d.df_docs + 0.5) / (d.df_docs + 0.5)
       |        + 1.0), 8)
       |      * (t.tf * 2.2) /
       |      (t.tf + 1.2 * (0.25 + 0.75 * t.dl /
       |        (CAST(s.sum_dl AS DOUBLE) / s.n_docs))), 8) AS contrib
       |  FROM bmtf t JOIN bmdf d USING (term) CROSS JOIN bmstats s),
       |bm25 AS (
       |  SELECT id, CAST(count(*) AS BIGINT) AS n_terms,
       |    CAST(round(sum(CAST(contrib AS DECIMAL(20,8))), 8) AS DOUBLE)
       |      AS score
       |  FROM bmscored GROUP BY 1)""".stripMargin

  /** Overlapping token-window chunks — the chunk-for-embedding step of a
    * retrieval/training pipeline: each document yields windows of
    * `chunkTokens` whitespace tokens every `stride` tokens (the final
    * partial window is kept iff it adds tokens beyond the previous one).
    * Output: (id, chunk_idx, start_token, n_tokens, chunk_text).
    *
    * Scale shape: sequence+posexplode generates one row per chunk (a
    * linear, executor-side expansion like [[Multimodal]]'s frame
    * sampling); `slice` + `concat_ws` re-materialize each chunk's text
    * from the token array — all codegen'd collection expressions, no
    * shuffle at all. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride <= chunkTokens, got stride=$stride chunk=$chunkTokens")
    val toks = split(trim(col(textCol)), "[ \\t\\n\\x0B\\f\\r]+")
    // chunk starts: 1, 1+stride, ... while start <= max(1, n - stride)
    // guarantees full coverage with no trailing chunk fully contained in
    // the previous one
    val n = size(toks)
    val starts = sequence(lit(1), greatest(lit(1), n - stride), lit(stride))
    // NULL text produces no chunks (without the filter, NULL's size(-1)
    // and a NULL token array leak one nonsense chunk row)
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), toks.as("__t"), n.as("__n"),
        posexplode(starts).as(Seq("chunk_idx", "start_token")))
      .select(col("id"), col("chunk_idx"), col("start_token"),
        least(lit(chunkTokens), col("__n") - col("start_token") + 1).as("n_tokens"),
        concat_ws(" ", slice(col("__t"), col("start_token"), lit(chunkTokens)))
          .as("chunk_text"))
  }

  /** Deterministic sequence packing: assign documents (in `orderCol`
    * order) to fixed-token-budget training sequences by prefix-sum
    * bucketing — `seq_id = floor(cumulative_tokens_before / budget)`, the
    * streaming-friendly packing policy (documents are never split; a
    * sequence may overflow by at most one document, the standard
    * pack-then-truncate contract). The global running sum is a
    * [[PrefixSum.runningLong]] two-pass prefix sum — bucket-parallel,
    * never a single-partition window, so the cumsum scales with the
    * corpus instead of serializing it through one executor. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    PrefixSum.runningLong(
        df.select(col(idCol), col(tokenCol).cast("long").as("n_tokens")),
        idCol, "n_tokens")
      .withColumn("seq_id",
        ((col("cum") - col("n_tokens")) / budget).cast("long"))
      .select(col(idCol), col("n_tokens"), col("seq_id"))
  }

  /** Per-document Shannon entropy (bits) of the token distribution — the
    * information-density quality signal: word-salad and boilerplate sit at
    * the distribution extremes, natural prose in between.
    *
    * Determinism: tf counts are exact integers; `H = log2(n) − Σ c·log2(c)
    * / n` is computed with each irrational term snapped to 12 decimals and
    * summed in exact DECIMAL (combine-order-independent — a raw double sum
    * would vary with partitioning), then the final value snapped to 8.
    *
    * Scale shape: posexplode → two hash aggregations over narrow (id,
    * token) rows, both with map-side partial aggregation; no window, no
    * join. */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df
      .select(col(idCol).as("id"),
        explode(split(trim(col(textCol)), "[ \\t\\n\\x0B\\f\\r]+")).as("w"))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("c"))
    tf.groupBy(col("id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(round(col("c") * log2(col("c")), 12).cast("decimal(28,12)"))
          .as("__clogc"))
      .select(col("id"), col("n_tokens"), col("n_distinct"),
        round(log2(col("n_tokens"))
          - col("__clogc").cast("double") / col("n_tokens"), 8).as("entropy"))
  }

  /** DuckDB mirror of [[tokenEntropy]] (CTE body; expose `ent` with
    * columns id, n_tokens, n_distinct, entropy). */
  def sqlTokenEntropyCtes(idCol: String, textCol: String): String =
    s"""tok AS (
       |  SELECT $idCol AS id, unnest(regexp_split_to_array(trim($textCol), '[ \\t\\n\\x0B\\f\\r]+')) AS w
       |  FROM documents),
       |tf AS (SELECT id, w, count(*) AS c FROM tok GROUP BY id, w),
       |ent AS (
       |  SELECT id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
       |    round(log2(CAST(sum(c) AS DOUBLE))
       |      - CAST(sum(CAST(round(c * log2(CAST(c AS DOUBLE)), 12) AS DECIMAL(28,12))) AS DOUBLE)
       |        / sum(c), 8) AS entropy
       |  FROM tf GROUP BY id)""".stripMargin

  /** Per-document mean token surprisal under the corpus unigram LM —
    * `(1/n_d)·Σ_tokens −log2(count(w)/N)` — the in-engine analogue of
    * CCNet's perplexity filter: documents far from the corpus
    * distribution (very low = boilerplate of frequent words, very high =
    * noise/rare-token soup) are filter candidates.
    *
    * Determinism: identical to [[tokenEntropy]] — exact integer counts,
    * per-TERM irrational log snapped at 12 dp, multiplied by the exact
    * integer per-doc count in DECIMAL (exact: (15,12)×(9,0) → (25,12)),
    * decimal accumulation, final 8 dp snap.
    *
    * Scale shape: token rows collapse to the (id, term, count) tf table
    * FIRST (same as [[tokenEntropy]]); corpus term counts derive from tf
    * (no second corpus scan) and join back onto tf — so the join and the
    * per-document aggregation move only distinct (id, term) pairs, a
    * large reduction on repetitive corpora (AQE broadcasts the
    * zipfian-head vocab when it fits). */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df
      .select(col(idCol).as("id"),
        explode(split(trim(col(textCol)), "[ \\t\\n\\x0B\\f\\r]+")).as("w"))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("c"))
    val freq = tf.groupBy(col("w")).agg(sum(col("c")).as("cw"))
    val total = freq.agg(sum(col("cw")).as("n_total"))
    tf.join(freq, Seq("w"))
      .crossJoin(broadcast(total))
      .groupBy(col("id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        max(col("n_total")).as("__nt"),
        sum(round(log2(col("cw")), 12).cast("decimal(15,12)")
          * col("c").cast("decimal(9,0)")).as("__slog"))
      .select(col("id"), col("n_tokens"),
        round(log2(col("__nt"))
          - col("__slog").cast("double") / col("n_tokens"), 8)
          .as("mean_surprisal"))
  }

  /** DuckDB mirror of [[unigramSurprisal]] (CTE body; expose `surp` with
    * columns id, n_tokens, mean_surprisal). */
  def sqlUnigramSurprisalCtes(idCol: String, textCol: String): String =
    s"""tok AS (
       |  SELECT $idCol AS id, unnest(regexp_split_to_array(trim($textCol), '[ \\t\\n\\x0B\\f\\r]+')) AS w
       |  FROM documents),
       |tf AS (SELECT id, w, count(*) AS c FROM tok GROUP BY id, w),
       |freq AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM tf GROUP BY w),
       |tot AS (SELECT CAST(sum(cw) AS BIGINT) AS n_total FROM freq),
       |surp AS (
       |  SELECT tf.id, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    round(log2(CAST(max(n_total) AS DOUBLE))
       |      - CAST(sum(CAST(round(log2(CAST(f.cw AS DOUBLE)), 12) AS DECIMAL(19,12))
       |                  * CAST(c AS DECIMAL(9,0))) AS DOUBLE)
       |        / sum(c), 8) AS mean_surprisal
       |  FROM tf JOIN freq f USING (w) CROSS JOIN tot
       |  GROUP BY tf.id)""".stripMargin

  /** Bigram collocations by pointwise mutual information — the classic
    * corpus-exploration operator for multiword expressions (Church &
    * Hanks '89): PMI = ln(c_xy · N / (c_x · c_y)) over adjacent token
    * pairs, reported for bigrams seen ≥ `minCount` times (raw PMI is
    * dominated by hapax noise otherwise), top `k` overall.
    *
    * Scale shape: tokens posexplode once; bigrams via one `lead` window
    * per document (narrow (id, pos, word) rows, same shape as
    * [[NearDup.shingleRowsAll]]); two vocabulary-keyed hash aggregations;
    * the unigram table joins back by word (zipfian-head broadcast under
    * AQE when it fits); top-k is TakeOrdered, never a global sort.
    * Determinism: the PMI ratio is exact-integer arithmetic under one
    * double division and one `ln`, snapped to 8 decimals (the tfidf
    * precedent); ordering ties break on the words. */
  def pmiCollocations(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5L, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(trim(col(textCol)), "[ \\t\\n\\x0B\\f\\r]+")).as(Seq("pos", "w1")))
    val big = toks
      .withColumn("w2", lead(col("w1"), 1).over(w))
      .filter(col("w2").isNotNull)
    val cxy = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
    val cx = toks.groupBy(col("w1")).agg(count(lit(1)).as("c"))
    val n = toks.agg(count(lit(1)).as("n_tok"))
    cxy.filter(col("c_xy") >= minCount)
      .join(cx.select(col("w1"), col("c").as("c_a")), Seq("w1"))
      .join(cx.select(col("w1").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(n))
      .withColumn("pmi", round(log(
        col("c_xy").cast("double") * col("n_tok") / (col("c_a") * col("c_b"))), 8))
      .select(col("w1"), col("w2"), col("c_xy"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** DuckDB mirror of [[pmiCollocations]]. */
  def sqlPmiCollocations(idCol: String, textCol: String,
      minCount: Long = 5L, k: Int = 100): String =
    s"""WITH toks AS (
       |  SELECT $idCol AS id, regexp_split_to_array(trim($textCol), '[ \\t\\n\\x0B\\f\\r]+') AS t
       |  FROM documents),
       |uni AS (SELECT unnest(t) AS w FROM toks),
       |cx AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
       |n AS (SELECT count(*) AS n_tok FROM uni),
       |big AS (
       |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
       |    i -> t[i] || ' ' || t[i+1])) AS b
       |  FROM toks),
       |cxy AS (
       |  SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
       |    count(*) AS c_xy
       |  FROM big GROUP BY 1, 2)
       |SELECT c.w1, c.w2, c.c_xy,
       |  round(ln(CAST(c.c_xy AS DOUBLE) * n.n_tok / (ca.c * cb.c)), 8) AS pmi
       |FROM cxy c
       |JOIN cx ca ON c.w1 = ca.w
       |JOIN cx cb ON c.w2 = cb.w
       |CROSS JOIN n
       |WHERE c.c_xy >= $minCount
       |ORDER BY pmi DESC, w1, w2
       |LIMIT $k""".stripMargin

  /** PII patterns for the redaction scrub. Restricted to syntax the JVM
    * regex engine and RE2 (DuckDB) interpret identically — character
    * classes and bounded repetition only, no lookaround, no backrefs. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\+?\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"

  /** Replace email addresses and dashed phone numbers with typed
    * placeholder tags — the standard pre-training PII scrub. Two codegen'd
    * `regexp_replace` passes, scan-speed, no shuffle; order matters
    * (emails first, so digits inside addresses are consumed before the
    * phone pass sees them). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Number of email-pattern matches in a text column. */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))

  /** Number of phone-pattern matches in a text column. */
  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0)))

  /** [[EmailPattern]] / [[PhonePattern]] as DuckDB string literals. */
  val sqlEmailPattern: String = "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'"
  val sqlPhonePattern: String = "'\\+?\\d{1,2}-\\d{3}-\\d{3}-\\d{4}'"

  /** DuckDB mirror of [[redactPii]]. */
  def sqlRedactPii(expr: String): String =
    s"""regexp_replace(regexp_replace($expr, $sqlEmailPattern, '<EMAIL>', 'g'),
       |  $sqlPhonePattern, '<PHONE>', 'g')""".stripMargin

  /** DuckDB mirror of [[repetitionSignals]] (CTE body; final SELECT is the
    * caller's, columns `id, n_tokens, n_distinct, dup_token_fraction,
    * top_bigram_fraction` from `rep`). */
  def sqlRepetitionCtes(idCol: String, textCol: String): String =
    s"""tok AS (
       |  SELECT $idCol AS id, unnest(regexp_split_to_array(trim($textCol), '[ \\t\\n\\x0B\\f\\r]+')) AS w,
       |    generate_subscripts(regexp_split_to_array(trim($textCol), '[ \\t\\n\\x0B\\f\\r]+'), 1) AS pos
       |  FROM documents),
       |tok_stats AS (
       |  SELECT id, count(*) AS n_tokens, count(DISTINCT w) AS n_distinct
       |  FROM tok GROUP BY id),
       |big AS (
       |  SELECT id, w || ' ' || lead(w) OVER (PARTITION BY id ORDER BY pos) AS bg
       |  FROM tok),
       |bigram_counts AS (
       |  SELECT id, bg, count(*) AS c FROM big WHERE bg IS NOT NULL GROUP BY id, bg),
       |bigram_stats AS (
       |  SELECT id, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS total_bg
       |  FROM bigram_counts GROUP BY id),
       |rep AS (
       |  SELECT t.id, t.n_tokens, t.n_distinct,
       |    1.0 - CAST(t.n_distinct AS DOUBLE) / t.n_tokens AS dup_token_fraction,
       |    coalesce(CAST(b.top_c AS DOUBLE) / b.total_bg, 0.0) AS top_bigram_fraction
       |  FROM tok_stats t LEFT JOIN bigram_stats b ON t.id = b.id)""".stripMargin
}
