package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD '03 — the
  * MOSS algorithm): position-robust document fingerprints with a
  * GUARANTEE that any shared substring of at least k+w-1 tokens yields at
  * least one shared fingerprint — the property MinHash (whole-document
  * similarity) and exact digests (whole-document identity) both lack,
  * and the standard tool for local/partial-overlap detection.
  *
  * Per document: word k-gram hashes in position order; every length-w
  * window of consecutive gram hashes selects its MINIMUM (ties broken to
  * the RIGHTMOST position, per the paper); the distinct selected hashes
  * are the fingerprint set, expected density 2/(w+1).
  *
  * Determinism & portability: gram hash = portable 60-bit md5 truncated
  * to its top 40 bits, packed with the BIT-INVERTED 20-bit position into
  * one BIGINT — so one integer MIN implements "min hash, rightmost
  * position" identically in both engines. No floats anywhere.
  *
  * Scale shape: posexplode (narrow) → one per-document window pass over
  * (id, pos) — the same per-partition sort every sessionization does —
  * then a distinct on the bounded fingerprint set. Documents cap at 2^20
  * tokens (loud failure beyond, not silent truncation).
  */
object Winnowing {

  private val PosBits = 20
  private val PosMask = (1L << PosBits) - 1L

  /** Distinct fingerprints per document: (id, fp, pos) where fp is the
    * 40-bit selected hash and pos the gram position it was selected at
    * (for overlap localization). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be positive, got k=$k w=$w")
    val toks = docs.select(col(idCol).as("id"),
      split(trim(col(textCol)), "[ \\t\\n\\x0B\\f\\r]+").as("t"))
    // sequence() descends for negative spans, so short docs must yield
    // an EMPTY gram array, not a descending index walk into slice()
    val grams = toks
      .select(col("id"), posexplode(expr(
        s"CASE WHEN size(t) >= $k THEN transform(sequence(0, size(t) - $k), " +
          s"i -> array_join(slice(t, i + 1, $k), ' ')) " +
          "ELSE array() END")).as(Seq("pos", "g")))
    // pack (40-bit hash, inverted 20-bit position): integer MIN == min
    // hash with rightmost-position tie-break. Positions past 2^20 would
    // corrupt the packing — fail loudly via ANSI overflow on the check.
    val h40 = shiftright(TextHash.md5Bits60(col("g")), PosBits)
    val packed = grams
      .withColumn("cmb",
        when(col("pos") <= lit(PosMask),
          shiftleft(h40, PosBits) + (lit(PosMask) - col("pos")))
          .otherwise(raise_error(lit("winnowing: document exceeds 2^20 tokens"))))
    val frame = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    val nGram = Window.partitionBy(col("id"))
    packed
      .withColumn("sel", min(col("cmb")).over(frame))
      .withColumn("m", count(lit(1)).over(nGram))
      // only FULL windows select (starts 0 .. m-w)
      .filter(col("pos") <= col("m") - w)
      .select(col("id"), shiftright(col("sel"), PosBits).as("fp"),
        (lit(PosMask) - col("sel").bitwiseAND(lit(PosMask))).as("pos"))
      .distinct()
  }

  /** Local-overlap candidate pairs from a fingerprint table: documents
    * sharing at least `minShared` distinct fingerprints — the MOSS
    * match step. Fingerprints present in more than `maxDf` documents are
    * dropped FIRST (corpus-wide boilerplate would pair everything with
    * everything — the same stop-token discipline every inverted-index
    * join needs; at 100 TB this cap is what bounds the per-posting
    * expansion). One doc-frequency pass + one fp-keyed self-join over
    * the bounded fingerprint table. */
  def overlapPairs(fp: DataFrame, minShared: Long = 2L,
      maxDf: Long = 50L): DataFrame = {
    val df = fp.groupBy(col("fp")).agg(countDistinct(col("id")).as("df"))
      .filter(col("df") <= maxDf)
    val posting = fp.select(col("id"), col("fp")).distinct()
      .join(df.select(col("fp")), "fp")
    posting.as("a").join(posting.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** DuckDB mirror of [[overlapPairs]] against `win_fp`: emits CTE
    * `win_pairs` (id_a, id_b, n_shared). */
  def sqlOverlapCtes(minShared: Long = 2L, maxDf: Long = 50L): String =
    s"""win_df AS (
      SELECT fp FROM (
        SELECT fp, count(DISTINCT id) AS df FROM win_fp GROUP BY fp)
      WHERE df <= $maxDf),
    win_post AS (
      SELECT DISTINCT id, fp FROM win_fp JOIN win_df USING (fp)),
    win_pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
      FROM win_post a JOIN win_post b
        ON a.fp = b.fp AND a.id < b.id
      GROUP BY 1, 2
      HAVING count(*) >= $minShared)"""

  /** DuckDB mirror of [[fingerprints]] over `tbl`: emits CTE `win_fp`
    * (id, fp, pos). */
  def sqlFingerprintCtes(tbl: String, idSql: String, textSql: String,
      k: Int = 3, w: Int = 4): String = s"""win_toks AS (
      SELECT $idSql AS id,
        regexp_split_to_array(trim($textSql), '[ \\t\\n\\x0B\\f\\r]+') AS t
      FROM $tbl),
    win_grams AS (
      SELECT id, i - 1 AS pos,
        array_to_string(t[i:i+${k - 1}], ' ') AS g
      FROM win_toks, unnest(generate_series(1, len(t) - ${k - 1})) AS u(i)
      WHERE len(t) >= $k),
    win_packed AS (
      SELECT id, pos,
        ((${TextHash.sqlMd5Bits60("g")} >> $PosBits) << $PosBits)
          + ($PosMask - pos) AS cmb
      FROM win_grams),
    win_sel AS (
      SELECT id, pos,
        min(cmb) OVER (PARTITION BY id ORDER BY pos
          ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS sel,
        count(*) OVER (PARTITION BY id) AS m
      FROM win_packed),
    win_fp AS (
      SELECT DISTINCT id, sel >> $PosBits AS fp,
        $PosMask - (sel & $PosMask) AS pos
      FROM win_sel WHERE pos <= m - $w)"""
}
