package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content-hashing operators: SimHash sketches and rolling-hash document
  * fingerprints. Both are defined over *portable* primitives (md5, integer
  * polynomial arithmetic) rather than engine-native hash functions, so a
  * DuckDB oracle can recompute bit-identical values.
  *
  * Each operator runs as a native codegen'd expression
  * ([[graft.functions.SimHash60]] / [[graft.functions.PolyHash]] /
  * [[graft.functions.MinGramHash]] — one static-kernel call per row inside
  * WholeStageCodegen), with an interpreted higher-order-function twin
  * (`*Hof`) kept as the executable specification: the A/B equality tests in
  * TextOpsSpec pin the two formulations together, and the HOF form is what
  * the DuckDB oracle mirrors line by line.
  */
object TextHash {

  /** 60-bit integer from the first 15 hex chars of md5 — portable across
    * engines (Spark `conv`, DuckDB hex cast), and the bit budget keeps all
    * downstream shifts inside a signed 64-bit long. */
  def md5Bits60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SimHash (Charikar '02): each distinct token votes ±1 on 60 bit
    * positions according to its md5 bits; the sketch keeps the sign of each
    * position's total. Near-identical token sets differ in few bits, so
    * Hamming distance on the sketch approximates token-set overlap.
    * Ties (vote == 0) resolve to bit 0 on both engines. */
  def simhash(text: Column): Column =
    call_function("graft_simhash60", tokens(text))

  /** Interpreted HOF twin of [[simhash]]: one `aggregate` over the token
    * array building a 60-slot vote vector (`zip_with` add), then a fold of
    * votes back into a long. Same result, ~60 boxed lambda calls per token
    * — kept as the executable spec, not for hot paths. */
  def simhashHof(text: Column): Column = simhashHofTokens(tokens(text))

  /** [[simhashHof]] over an already-built token array — lets the A/B
    * parity tests feed inputs `split` can never produce (null elements). */
  private[graft] def simhashHofTokens(toks: Column): Column = {
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 60),
      (acc, tok) => {
        val h = md5Bits60(tok)
        // shiftright/shiftleft in the Scala DSL take Int amounts; the SQL
        // builtins accept expressions — call_function reaches them.
        zip_with(acc, sequence(lit(0), lit(59)),
          (v, i) => v + when(call_function("shiftright", h, i)
            .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(59)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc + b)
  }

  private def tokens(text: Column): Column =
    array_distinct(split(trim(text), "[ \\t\\n\\x0B\\f\\r]+"))

  /** 128-bit SimHash sketch as `array<bigint>` [hi, lo] — the wide twin of
    * [[simhash]] whose ≥ 32-bit bands keep banding sub-quadratic to
    * n ≈ 10⁹ documents (the 60-bit sketch's 15-bit bands turn quadratic
    * around 10⁵ — measured exponent 1.59 in the r9 sf1 probe). Same vote
    * convention as [[simhash]]; bit layout and the portability contract
    * live in [[graft.functions.TextHashUtil.simhash128]]. */
  def simhash128(text: Column): Column =
    call_function("graft_simhash128", tokens(text))

  /** Hamming distance between two simhash sketches (bit_count of XOR). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Hamming distance between two 128-bit sketches given as (hi, lo) long
    * pairs: the per-half XOR popcounts add, since the halves partition the
    * 128 bit positions. */
  def hamming128(hiA: Column, loA: Column, hiB: Column, loB: Column): Column =
    bit_count(hiA.bitwiseXOR(hiB)) + bit_count(loA.bitwiseXOR(loB))

  private val Base = 131L
  private val Mod = 1000000007L // < 2^30, so acc*131+cp stays < 2^63

  /** Polynomial rolling hash of a string: fold `acc*131 + codepoint mod
    * (1e9+7)` over the characters. The classic Rabin-Karp fingerprint,
    * reproducible in any engine with integer arithmetic. */
  def polyHash(c: Column): Column = call_function("graft_polyhash", c)

  /** Interpreted HOF twin of [[polyHash]] (per-character lambda fold). */
  def polyHashHof(c: Column): Column =
    aggregate(split(c, ""), lit(0L),
      (acc, ch) => (acc * Base + ascii(ch)) % Mod)

  /** Winnowed gram fingerprint: the minimum rolling hash over all k-char
    * windows — a 1-fingerprint winnow (Schleimer et al. '03 "winnowing"
    * with window = document). Two documents sharing any k-gram region have
    * correlated minima; equality is a strong copy signal. The native
    * kernel is O(len) via hash rolling; the HOF twin is O(len·k). */
  def minGramHash(text: Column, k: Int): Column =
    call_function("graft_mingram_hash", text, lit(k))

  /** Interpreted HOF twin of [[minGramHash]]. */
  def minGramHashHof(text: Column, k: Int): Column = {
    val starts = when(length(text) >= k, sequence(lit(1), length(text) - (k - 1)))
      .otherwise(array().cast("array<int>"))
    array_min(transform(starts, i => polyHashHof(substr(text, i, lit(k)))))
  }

  // --- DuckDB oracle mirrors ----------------------------------------------

  /** DuckDB mirror of [[md5Bits60]]. */
  def sqlMd5Bits60(expr: String): String =
    s"CAST('0x' || substring(md5($expr), 1, 15) AS BIGINT)"

  /** DuckDB mirror of [[polyHash]]. NULL-strict like the native
    * expression: without the guard, `list_prepend(0, NULL)` is `[0]` and
    * a NULL document would "hash" to 0 instead of NULL. */
  def sqlPolyHash(expr: String): String =
    s"""CASE WHEN $expr IS NULL THEN NULL
       |  ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split($expr, ''), ch -> CAST(ascii(ch) AS BIGINT))),
       |    (acc, cp) -> (acc * $Base + cp) % $Mod) END""".stripMargin

  /** DuckDB mirror of [[minGramHash]]. */
  def sqlMinGramHash(expr: String, k: Int): String =
    s"""list_min(list_transform(generate_series(1, len($expr) - ${k - 1}),
       |  i -> ${sqlPolyHash(s"substring($expr, i, $k)")}))""".stripMargin
}
