package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter join pruning (Bloom '70) — ship a compact
  * superset test to the fact scan instead of shuffling the fact table.
  *
  * The at-scale problem: a semi join against a dimension subset that is
  * too big to broadcast as rows still shuffles the ENTIRE fact side on the
  * join key. A Bloom filter of the dimension keys is a few KB regardless
  * of fact size; applying it at the scan prunes the overwhelming majority
  * of fact rows *before* any exchange, and the exact join that follows
  * only sees the tiny surviving fraction (false positives are removed
  * there — Bloom filters have no false negatives, so the composed plan is
  * EXACTLY the semi join, which is what the oracle checks).
  *
  * Spark's own runtime-filter machinery makes the same move with an
  * engine-private hash; this operator keeps the whole construction
  * portable (md5-derived positions, integer-only bitmap) so any engine —
  * and the DuckDB oracle — can build the identical filter and agree on
  * exactly which rows pass.
  *
  * Scale shape: fit is one word-keyed aggregation over the keys (≤ m/64
  * result rows); the fitted bitmap is bounded model metadata (like the
  * IVF centroid table) — the driver `collect()` is mBits/64 longs. The
  * probe is a pure scan-side expression: k AND-ed bit tests, no join, no
  * shuffle, codegen-friendly. Like ivfSearch, the bitmap is compiled into
  * the plan as an array literal: fine to ~2^16 bits (1024 longs); beyond
  * that, store the word table as data and probe via an equi-join on word
  * index instead.
  */
object Bloom {

  /** Portable bit positions for a key: position_i = md5_60(key # i) mod m.
    * Stringified key so numeric and string keys hash identically across
    * engines. */
  private def positions(key: Column, mBits: Int, k: Int): Seq[Column] =
    (0 until k).map { i =>
      pmod(TextHash.md5Bits60(concat(key.cast("string"), lit("#" + i))),
        lit(mBits.toLong))
    }

  /** Fit: the bitmap as mBits/64 words (index w holds bits [64w, 64w+64)).
    * One `bit_or` aggregation keyed on word index; the collect is bounded
    * by the filter size, not the key count. */
  def fit(keys: DataFrame, keyCol: String, mBits: Int, k: Int): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64, got $mBits")
    require(mBits <= (1 << 16),
      s"mBits = $mBits: literal-compiled bitmap bounded at 2^16 bits; use a word-table join beyond that")
    require(k >= 1, s"k must be >= 1, got $k")
    val pos = explode(array(positions(col(keyCol), mBits, k): _*)).as("pos")
    val words = keys.select(pos)
      .select((col("pos") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("b"))
      .groupBy(col("w")).agg(bit_or(col("b")).as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Probe predicate: true iff every one of the k positions has its bit
    * set. Guaranteed true for every fitted key (no false negatives). */
  def mightContain(key: Column, bitmap: Array[Long], mBits: Int, k: Int): Column = {
    require(bitmap.length == mBits / 64,
      s"bitmap has ${bitmap.length} words, expected ${mBits / 64}")
    val words = array(bitmap.map(lit(_)): _*)
    positions(key, mBits, k).map { p =>
      element_at(words, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (p % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** The composed exact operator: Bloom-prune `facts` on `factKey`, then
    * remove false positives with a distinct-key semi join. Result ≡ plain
    * `facts SEMI JOIN keys` — but at scale only the pruned fraction of the
    * fact table reaches the join. */
  def prunedSemiJoin(facts: DataFrame, factKey: String,
      keys: DataFrame, keyCol: String, mBits: Int = 4096, k: Int = 3): DataFrame = {
    val bitmap = fit(keys, keyCol, mBits, k)
    facts
      .filter(mightContain(col(factKey), bitmap, mBits, k))
      .join(broadcast(keys.select(col(keyCol)).distinct()),
        col(factKey) === col(keyCol), "left_semi")
  }
}
