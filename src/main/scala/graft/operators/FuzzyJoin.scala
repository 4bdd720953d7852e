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
    * pairs are over the distinct strings.
    *
    * Plan: every exchange after the initial distinct carries only 8-byte
    * hashes — signatures join on `xxhash64(sig)`, candidate pairs dedupe
    * on (name-hash, name-hash) — and the strings come back via two
    * broadcast joins against the (bounded: distinct names) lookup only
    * for candidates that reach the exact verify (the planner broadcasts
    * the lookup while it fits, and degrades to a hash join keyed on the
    * 8-byte name-hash — never on text — beyond that). A 64-bit name-hash
    * collision would alias two names (~n²/2⁶⁴ ≈ 10⁻¹¹ at 10⁶ names) —
    * the standard trade the span-mining path (q72) makes, accepted over
    * shuffling full text at corpus scale. */
  def editPairs1(df: DataFrame, strCol: String): DataFrame = {
    val names = df.select(col(strCol).as("s")).distinct()
      .withColumn("nh", xxhash64(col("s")))
    val sigs = names
      .select(col("s"), col("nh"),
        explode(sequence(lit(0), length(col("s")))).as("__di"))
      .select(col("nh"), sigHashes(col("s")).as("sig"))
      .distinct()
    val candH = sigs.as("l").join(sigs.as("r"), col("l.sig") === col("r.sig"))
      .filter(col("l.nh") < col("r.nh"))
      .select(col("l.nh").as("ha"), col("r.nh").as("hb"))
      .distinct()
    val lut = names
    candH
      .join(lut.select(col("nh").as("ha"), col("s").as("sa")), "ha")
      .join(lut.select(col("nh").as("hb"), col("s").as("sb")), "hb")
      .select(least(col("sa"), col("sb")).as("a"),
        greatest(col("sa"), col("sb")).as("b"))
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= 1)
  }

  /** DuckDB mirror: the all-pairs oracle (length filter + exact
    * levenshtein), emitted as CTE `edit_pairs` (a, b, dist) over the
    * distinct values of `strSql` in `tbl`. The blocked plan must equal
    * this exactly — that equality is what proves the signature scheme
    * lossless on the data. */
  def sqlEditPairs1(tbl: String, strSql: String): String =
    // 1-deletion-neighborhood blocking (FastSS; the engine's own
    // signature scheme) instead of the former length-banded all-pairs
    // scan, which was oracle-side quadratic (names share lengths, so
    // the ±1 length band pruned nothing — >1500 s at sf1; this form
    // runs 4.4 s). Recall is EXACT, not probabilistic: dist(a,b) ≤ 1
    // means equal (excluded), one substitution (deleting the differing
    // position from both yields a shared signature), or one
    // insert/delete (deleting the inserted char from the longer yields
    // the shorter string's identity signature) — every qualifying pair
    // shares ≥ 1 signature, and candidates are re-verified with the
    // exact levenshtein, so the output is byte-identical to the
    // brute-force scan (checked at sf0.01).
    s"""edit_names AS (SELECT DISTINCT $strSql AS s FROM $tbl),
    edit_sigs AS (
      SELECT s, s AS sig FROM edit_names
      UNION ALL
      SELECT s, substr(s, 1, i - 1) || substr(s, i + 1) AS sig
      FROM edit_names, unnest(generate_series(1, length(s))) u(i)),
    -- recall: exact (FastSS 1-deletion cover — every dist<=1 pair
    -- shares a signature; candidates re-verified with levenshtein)
    edit_cand AS (
      SELECT DISTINCT a.s AS sa, b.s AS sb
      FROM edit_sigs a JOIN edit_sigs b ON a.sig = b.sig AND a.s < b.s),
    edit_pairs AS (
      SELECT sa AS a, sb AS b, levenshtein(sa, sb) AS dist
      FROM edit_cand WHERE levenshtein(sa, sb) <= 1)"""
}
