package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-level fuzzy matching by deletion neighborhoods (FastSS,
  * Bocek et al. '07 / SymSpell family) — record-linkage dedup for short
  * strings (names, titles, identifiers), complementing the token-set
  * similarity operators (`NearDup.jaccardPairs` works on word sets; this
  * catches single-character typos those can't see).
  *
  * Completeness is provable, not heuristic: if `ed(a,b) ≤ 1` then the
  * 1-deletion neighborhoods `N₁(a) = {a} ∪ {a minus one char}` and `N₁(b)`
  * intersect — a substitution meets at the string with the differing
  * position deleted from both; an insertion meets at the shorter string
  * itself. So joining on shared signatures then verifying with exact
  * `levenshtein ≤ 1` reproduces the all-pairs answer without the O(n²)
  * comparison.
  *
  * Scale shape: |s|+1 signatures per string (linear expansion), and the
  * self-join keys on `xxhash64(signature)` — a narrow 8-byte shuffle key,
  * never the signature text (the q72 pattern); hash collisions are
  * harmless because every candidate is verified exactly. Signature-bucket
  * sizes are bounded by how many strings share a deletion variant —
  * near-uniform for name-like data; a pathological hot signature salts
  * like any skewed join key.
  */
object FuzzyJoin {

  /** 1-deletion neighborhood of `s` as (sig_hash, is_original) rows:
    * position 0 keeps `s` itself, position i ≥ 1 deletes char i. */
  private def sigHashes(s: Column): Column = {
    val i = col("__di")
    val sig = when(i === 0, s).otherwise(
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s) - i)))
    xxhash64(sig)
  }

  /** All unordered pairs of distinct values of `strCol` within Levenshtein
    * distance 1: (a, b, dist) with a < b. Input rows may repeat values;
    * pairs are over the distinct strings. */
  def editPairs1(df: DataFrame, strCol: String): DataFrame = {
    val names = df.select(col(strCol).as("s")).distinct()
    val sigs = names
      .select(col("s"), explode(sequence(lit(0), length(col("s")))).as("__di"))
      .select(col("s"), sigHashes(col("s")).as("sig"))
      .distinct()
    val cand = sigs.as("l").join(sigs.as("r"), col("l.sig") === col("r.sig"))
      .filter(col("l.s") < col("r.s"))
      .select(col("l.s").as("a"), col("r.s").as("b"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= 1)
  }

  /** DuckDB mirror: the all-pairs oracle (length filter + exact
    * levenshtein), emitted as CTE `edit_pairs` (a, b, dist) over the
    * distinct values of `strSql` in `tbl`. The blocked plan must equal
    * this exactly — that equality is what proves the signature scheme
    * lossless on the data. */
  def sqlEditPairs1(tbl: String, strSql: String): String =
    s"""edit_names AS (SELECT DISTINCT $strSql AS s FROM $tbl),
    edit_pairs AS (
      SELECT a.s AS a, b.s AS b, levenshtein(a.s, b.s) AS dist
      FROM edit_names a JOIN edit_names b
        ON a.s < b.s AND abs(length(a.s) - length(b.s)) <= 1
      WHERE levenshtein(a.s, b.s) <= 1)"""
}
