package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift metrics — the monitoring layer that decides whether
  * today's data still looks like yesterday's before a 100 TB pipeline
  * trains on it:
  *
  *  - [[klVsCorpus]]: per-group KL divergence of the word-unigram
  *    distribution against the whole corpus — which source/language/shard
  *    is lexically drifting, in nats. KL(p‖q) with q the corpus
  *    distribution is always finite (every group term exists in the
  *    corpus), so no smoothing constant to tune.
  *  - [[psiBins]]: population stability index of a numeric feature
  *    between a reference and a current snapshot, over the reference's
  *    exact decile bins ([[Binning]] machinery) — the scorecard-world
  *    drift gate (PSI > 0.2 ⇒ investigate).
  *
  * Determinism: counts are integers; each term's `p·ln(p/q)` is a
  * fixed-shape double expression snapped to 8 decimals, and totals
  * accumulate as exact decimals — combine-order-independent, the same
  * convention as q92's PMI.
  */
object Divergence {

  /** Per-group unigram KL divergence vs the corpus: (group, n_tokens,
    * n_terms, kl_nats). One token explode feeding two keyed aggregations
    * (group-term and corpus-term); the per-term join is keyed on the
    * term. */
  def klVsCorpus(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val tok = docs.select(col(groupCol).as("g"),
      explode(split(trim(col(textCol)), "[ \\t\\n\\x0B\\f\\r]+")).as("w"))
    val src = tok.groupBy(col("g"), col("w")).agg(count(lit(1)).as("c"))
    val corpus = tok.groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val nSrc = src.groupBy(col("g")).agg(sum(col("c")).as("ns"))
    val nTot = corpus.agg(sum(col("cw")).as("nt"))
    val p = col("c").cast("double") / col("ns").cast("double")
    val q = col("cw").cast("double") / col("nt").cast("double")
    src.join(corpus, "w")
      .join(nSrc, "g")
      .crossJoin(broadcast(nTot))
      .withColumn("term", round(p * log(p / q), 8))
      .groupBy(col("g"))
      .agg(max(col("ns")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        round(sum(col("term").cast("decimal(14,8)")), 6).cast("double")
          .as("kl_nats"))
  }

  /** DuckDB mirror of [[klVsCorpus]] over `tbl`: emits CTE `kl_g`
    * (g, n_tokens, n_terms, kl_nats). */
  def sqlKlCtes(tbl: String, gSql: String, textSql: String): String = s"""
    kl_tok AS (
      SELECT $gSql AS g,
        unnest(regexp_split_to_array(trim($textSql), '[ \\t\\n\\x0B\\f\\r]+')) AS w
      FROM $tbl),
    kl_src AS (SELECT g, w, count(*) AS c FROM kl_tok GROUP BY g, w),
    kl_corp AS (SELECT w, count(*) AS cw FROM kl_tok GROUP BY w),
    kl_ns AS (SELECT g, CAST(sum(c) AS BIGINT) AS ns FROM kl_src GROUP BY g),
    kl_nt AS (SELECT CAST(sum(cw) AS BIGINT) AS nt FROM kl_corp),
    kl_g AS (
      SELECT s.g, max(n.ns) AS n_tokens, count(*) AS n_terms,
        CAST(round(sum(CAST(round(
          (CAST(s.c AS DOUBLE) / n.ns)
            * ln((CAST(s.c AS DOUBLE) / n.ns)
                 / (CAST(c2.cw AS DOUBLE) / t.nt)), 8)
          AS DECIMAL(14,8))), 6) AS DOUBLE) AS kl_nats
      FROM kl_src s
      JOIN kl_corp c2 USING (w)
      JOIN kl_ns n USING (g)
      CROSS JOIN kl_nt t
      GROUP BY s.g)"""

  /** Per-bin PSI audit of `valCol` between a reference and a current
    * frame, over the reference's exact nBins-quantile bins: (bin, n_ref,
    * n_cur, p_ref, p_cur, psi_term). Bins one side never hits yield NULL
    * psi_term (no smoothing constant to hide drift behind); Σ psi_term is
    * the PSI. Thresholds broadcast as a compiled comparison chain — the
    * value column never shuffles. */
  def psiBins(ref: DataFrame, cur: DataFrame, valCol: String,
      nBins: Int = 10): DataFrame = {
    val th = Binning.quantileThresholds(ref, valCol, nBins)
    def binned(df: DataFrame, tag: String) =
      df.select(Binning.binIndex(col(valCol), th).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(s"n_$tag"))
    val r = binned(ref, "ref")
    val c = binned(cur, "cur")
    val rTot = r.agg(sum(col("n_ref")).as("rt"))
    val cTot = c.agg(sum(col("n_cur")).as("ct"))
    val pRef = col("n_ref").cast("double") / col("rt").cast("double")
    val pCur = col("n_cur").cast("double") / col("ct").cast("double")
    r.join(c, Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(broadcast(rTot)).crossJoin(broadcast(cTot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(pRef, 8).as("p_ref"), round(pCur, 8).as("p_cur"),
        when(col("n_ref") > 0 && col("n_cur") > 0,
          round((pCur - pRef) * log(pCur / pRef), 8)).as("psi_term"))
  }

  /** DuckDB mirror of [[psiBins]]: emits CTE `psi_bins` (bin, n_ref,
    * n_cur, p_ref, p_cur, psi_term) over reference/current CTEs or
    * tables with a `v` value column. */
  def sqlPsiCtes(refSql: String, curSql: String, nBins: Int = 10): String = {
    val ps = (1 until nBins).map(i => i.toDouble / nBins)
    val binExpr = (1 until nBins)
      .map(j => s"(CASE WHEN v > q[$j] THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""psi_th AS (
      SELECT quantile_cont(v, [${ps.mkString(", ")}]) AS q
      FROM ($refSql) AS r0),
    psi_r AS (
      SELECT CAST($binExpr AS BIGINT) AS bin, count(*) AS n_ref
      FROM ($refSql) AS r1, psi_th GROUP BY 1),
    psi_c AS (
      SELECT CAST($binExpr AS BIGINT) AS bin, count(*) AS n_cur
      FROM ($curSql) AS c1, psi_th GROUP BY 1),
    psi_tot AS (
      SELECT (SELECT CAST(sum(n_ref) AS BIGINT) FROM psi_r) AS rt,
        (SELECT CAST(sum(n_cur) AS BIGINT) FROM psi_c) AS ct),
    psi_bins AS (
      SELECT coalesce(r.bin, c.bin) AS bin,
        coalesce(r.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur,
        round(CAST(coalesce(r.n_ref, 0) AS DOUBLE) / t.rt, 8) AS p_ref,
        round(CAST(coalesce(c.n_cur, 0) AS DOUBLE) / t.ct, 8) AS p_cur,
        CASE WHEN coalesce(r.n_ref, 0) > 0 AND coalesce(c.n_cur, 0) > 0 THEN
          round((CAST(coalesce(c.n_cur, 0) AS DOUBLE) / t.ct
                 - CAST(coalesce(r.n_ref, 0) AS DOUBLE) / t.rt)
            * ln((CAST(coalesce(c.n_cur, 0) AS DOUBLE) / t.ct)
                 / (CAST(coalesce(r.n_ref, 0) AS DOUBLE) / t.rt)), 8)
        END AS psi_term
      FROM psi_r r FULL OUTER JOIN psi_c c ON r.bin = c.bin
      CROSS JOIN psi_tot t)"""
  }
}
