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
  def tokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

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
      split(trim(lower(text)), "\\s+"),
      lit(Stopwords.toArray))

  /** Adds deterministic per-document quality-signal columns:
    * character count, token count, punctuation count, mean token length,
    * punctuation ratio, stopword ratio. */
  def withQualitySignals(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("q_chars", length(t))
      .withColumn("q_tokens", tokenCount(t))
      .withColumn("q_punct", punctCount(t))
      .withColumn("avg_token_len",
        (length(regexp_replace(t, "\\s+", "")).cast("double")) / col("q_tokens"))
      .withColumn("punct_ratio", col("q_punct").cast("double") / col("q_chars"))
      .withColumn("stopword_ratio",
        stopwordCount(t).cast("double") / col("q_tokens"))
  }

  /** DuckDB mirror of [[stopwordCount]]. */
  def sqlStopwordCount(expr: String): String = {
    val list = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""len(list_filter(regexp_split_to_array(trim(lower($expr)), '\\s+'),
       |  t -> t IN ($list)))""".stripMargin
  }
}
