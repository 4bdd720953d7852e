package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-items (heavy hitters) at corpus scale: all tokens with share
  * ≥ 1/`phiDen` of the corpus, with EXACT counts — found without ever
  * shuffling the full token stream.
  *
  * A plain `groupBy(term).count()` shuffles every token of a 100 TB corpus
  * to count a vocabulary whose heavy tail is irrelevant. This operator is
  * the classic two-pass sketch-then-confirm instead (Misra & Gries '82;
  * merge bound per Agarwal et al. PODS '12):
  *
  *  1. CANDIDATES — one map-side pass: each partition keeps a Misra-Gries
  *     summary of `summaryK` counters (bounded memory, no shuffle). If a
  *     term has global share ≥ 1/phiDen, then in at least one partition
  *     its local share is ≥ 1/phiDen (an average argument), and MG keeps
  *     every term of local share > 1/(summaryK+1) — so with summaryK ≥
  *     phiDen the union of partition summaries is a guaranteed SUPERSET of
  *     the answer. Its size is ≤ partitions × summaryK, independent of N.
  *  2. CONFIRM — exact counts of the candidates only: a broadcast semi-
  *     join prunes the token stream to candidate rows (a vanishing
  *     fraction), then one small hash aggregation and the exact threshold
  *     `cnt · phiDen ≥ N` filter.
  *
  * The MG summaries themselves depend on partitioning and row order, but
  * any superset of the true heavy hitters confirms to the SAME final rows
  * — the output is deterministic and engine-checkable (the DuckDB oracle
  * is the plain GROUP BY / HAVING it replaces).
  */
object HeavyHitters {

  /** Per-partition Misra-Gries: `k` counters; overflow decrements all
    * (amortized O(1) per item — every decrement cancels one increment). */
  private def mgSummary(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      counters.get(t) match {
        case Some(c) => counters.update(t, c + 1)
        case None if counters.size < k => counters.update(t, 1L)
        case None =>
          val dead = mutable.ArrayBuffer.empty[String]
          counters.mapValuesInPlace { (term, c) =>
            if (c == 1L) dead += term
            c - 1
          }
          dead.foreach(counters.remove)
      }
    }
    counters.keysIterator
  }

  /** Whitespace tokens of `textCol` with share ≥ 1/phiDen, exact counts.
    * Output: (term, cnt, n_tok), ordered by cnt desc then term.
    *
    * @param summaryK counters per partition; must be ≥ phiDen for the
    *                 superset guarantee (default 2× for slack) */
  def frequentTerms(df: DataFrame, textCol: String, phiDen: Long = 1000L,
      summaryK: Int = 0): DataFrame = {
    require(phiDen > 0, s"phiDen must be positive, got $phiDen")
    val k = if (summaryK > 0) summaryK else (2L * phiDen).min(1000000L).toInt
    require(k >= phiDen, s"summaryK=$k < phiDen=$phiDen breaks the superset guarantee")
    val spark = df.sparkSession
    import spark.implicits._

    val tok = df.select(
      explode(split(trim(col(textCol)), "[ \\t\\n\\x0B\\f\\r]+")).as("term"))
    val candidates = tok.as[String]
      .mapPartitions(it => mgSummary(it, k))
      .toDF("term").distinct()
    // corpus token count without a second explode: one scan of documents
    val n = df.agg(sum(TextStats.tokenCount(col(textCol)).cast("long")).as("n_tok"))

    tok.join(broadcast(candidates), Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .filter(col("cnt") * phiDen >= col("n_tok"))
      .orderBy(col("cnt").desc, col("term"))
  }

  /** DuckDB mirror: the exact GROUP BY / HAVING the sketch short-cuts. */
  def sqlFrequentTerms(textCol: String, phiDen: Long = 1000L): String =
    s"""WITH tok AS (
       |  SELECT unnest(regexp_split_to_array(trim($textCol), '[ \\t\\n\\x0B\\f\\r]+')) AS term
       |  FROM documents),
       |n AS (SELECT count(*) AS n_tok FROM tok)
       |SELECT term, count(*) AS cnt, n_tok
       |FROM tok CROSS JOIN n
       |GROUP BY term, n_tok
       |HAVING count(*) * $phiDen >= n_tok
       |ORDER BY cnt DESC, term""".stripMargin
}
