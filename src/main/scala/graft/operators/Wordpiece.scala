package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vocabulary-driven subword tokenization for the token-budget operators
  * (q365/q366): greedy longest-match WordPiece over a fixed vocabulary,
  * run as the codegen'd [[graft.functions.WordpieceTokenize]] expression
  * (one static-kernel call per row — the `transform`/HOF formulation has
  * no codegen, and an iterative match cannot be expressed in column HOFs
  * at all).
  *
  * The vocabulary is a MODEL ARTIFACT, not data-derived: production
  * tokenizers ship a trained vocab file and every engine loading it must
  * tokenize identically. The fixture vocab below plays that role — ASCII
  * pieces (full-word starts plus `##` continuations, including every
  * single letter/digit so alphanumeric words always tokenize and `[UNK]`
  * is reserved for genuinely out-of-alphabet input), embedded both here
  * and in the DuckDB oracle's VALUES list so the two engines share one
  * artifact by construction.
  *
  * Scale shape: tokenization is a scan-speed map (no shuffle, no state);
  * the budget rollups aggregate (doc_id, count) rows. The vocab rides
  * the closure as a foldable literal — at 100 TB a real vocab (30k
  * pieces, ~300 KB) broadcasts with the task binary exactly like this.
  */
object Wordpiece {

  /** Multi-char pieces chosen to exercise real segmentation over the
    * fixture corpus (win + ##dow, cust + ##omer, qu + ##ery, …). */
  private val multi: Seq[String] = Seq(
    "the", "scan", "fast", "slow", "table", "tab", "val", "##ue", "##le",
    "win", "##dow", "cust", "##omer", "qu", "##ery", "str", "##eam",
    "gr", "##oup", "batch", "merge", "ord", "##er", "spark", "line",
    "sort", "key", "agg", "row", "part", "hash", "data", "col", "##umn",
    "join", "small", "big", "filter", "vec", "##tor")

  private val single: Seq[String] =
    ("abcdefghijklmnopqrstuvwxyz" + "0123456789").map(_.toString)

  /** The shared vocab artifact: multi-char pieces + every alphanumeric
    * single char as both word-start and continuation. */
  val vocab: Seq[String] = multi ++ single ++ single.map("##" + _)

  /** Longest piece length in codepoints (continuations measured without
    * the `##` marker) — the oracle's substring-candidate bound. */
  val maxPieceLen: Int =
    vocab.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max

  /** `(piece, is_cont)` VALUES rows for the DuckDB oracle (continuation
    * pieces stored stripped, matching the engine kernel's sets). Each
    * piece is asserted `[A-Za-z0-9#]+` HERE, not just in the expression
    * bind path: the bind check only requires ASCII, which includes the
    * single quote — a quote-bearing piece would interpolate broken (or
    * injectable) SQL into the oracle (r11 ADVICE). */
  def sqlVocabValues: String = sqlVocabValuesOf(vocab)

  /** [[sqlVocabValues]] for an arbitrary vocab (the file-loaded 30k-piece
    * artifact shares the guard). */
  def sqlVocabValuesOf(pieces: Seq[String]): String = pieces.map { p =>
    require(p.nonEmpty && p.forall(c => c.isLetterOrDigit && c < 128 ||
      c == '#'), s"vocab piece must match [A-Za-z0-9#]+ for safe SQL " +
      s"interpolation: '$p'")
    if (p.startsWith("##")) s"('${p.substring(2)}', true)"
    else s"('$p', false)"
  }.mkString(", ")

  /** WordPiece tokens of a text column (array<string>; `##`-prefixed
    * continuations, `[UNK]` for untokenizable or >100-codepoint words;
    * NULL text → NULL). The vocab rides as ONE array literal — a 30k-
    * element `array(lit, …)` would put 30k child expressions in the
    * plan tree; a single Literal is one node regardless of vocab size. */
  def tokens(text: Column): Column = tokensWith(text, vocab)

  /** [[tokens]] over an arbitrary piece list (the file-loaded artifact). */
  def tokensWith(text: Column, pieces: Seq[String]): Column =
    call_function("graft_wordpiece", text, lit(pieces.toArray))

  // ---- the production-scale vocabulary artifact (q367) ----

  /** Checked-in 30,000-piece synthetic vocab (tools/gen_vocab30k.py —
    * deterministic LCG, reproducible byte-for-byte). Loaded as a FILE,
    * not source-embedded: a real trained vocab ships exactly like this
    * (~300 KB riding the task binary / broadcast), and the DuckDB oracle
    * reads the SAME file via read_csv, so both engines share one
    * artifact with no transcription step. */
  val vocab30kPath: String =
    graft.sources.Artifacts.path("tools/artifacts/wordpiece_vocab_30k.txt")

  /** The loaded artifact, validated once: [A-Za-z0-9#]+ (the SQL-
    * interpolation guard class — also what keeps the kernel's ASCII
    * codepoint-length contract trivially true). */
  lazy val vocab30k: Seq[String] = {
    val pieces = scala.util.Using.resource(
      scala.io.Source.fromFile(vocab30kPath))(_.getLines().toList)
    require(pieces.size == 30000, s"vocab artifact: ${pieces.size} pieces")
    pieces.foreach(p => require(p.nonEmpty &&
      p.forall(c => c.isLetterOrDigit && c < 128 || c == '#'),
      s"vocab piece must match [A-Za-z0-9#]+: '$p'"))
    pieces
  }

  /** Longest stripped piece length of an arbitrary vocab (the oracle's
    * substring-candidate bound for [[vocab30k]]). */
  def maxPieceLenOf(pieces: Seq[String]): Int =
    pieces.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max

  /** Whitespace word count matching the tokenizer's word admission
    * (the explicit `[ \t\n\x0B\f\r]+` class shared with the oracle —
    * Java's and RE2's `\s` disagree on U+000B; EMPTY FRAGMENTS dropped
    * — Spark's split keeps
    * the empty fragments a leading/trailing separator run produces, so
    * a whitespace-only doc would otherwise count phantom words; the
    * hostile fixture's '   \n\t  ' doc caught exactly that). */
  def wordCount(text: Column): Column =
    size(array_remove(split(text, "[ \\t\\n\\x0B\\f\\r]+"), "")).cast("long")
}
