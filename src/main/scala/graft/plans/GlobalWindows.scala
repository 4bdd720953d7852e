package graft.plans

/** The audited allowlist of catalog queries whose physical plans contain an
  * unpartitioned `WindowExec` — acceptable ONLY because each one's global
  * window runs on a frame whose size is bounded by something
  * scale-INDEPENDENT (post-aggregation months, digit groups, bucket
  * totals, calendar spines…), never by raw row count. COVERAGE.md's audit
  * table documents each site; `PlanSpec` asserts the catalog plans match
  * this set exactly, and `Bench` uses it to silence the
  * `WindowExec: No Partition Defined` warning for exactly these queries
  * (any query OUTSIDE the set that plans a global window still warns —
  * and fails PlanSpec).
  *
  * This is the physical-plan face of the same contract
  * [[ScaleGuard]] enforces at analysis time: ScaleGuard proves no global
  * window sits over raw (non-collapsed) rows; this list names the queries
  * where a global window legitimately sits over a collapsed frame.
  */
object GlobalWindows {

  /** Catalog queries that EXECUTE a bounded streaming run at build time
    * (Trigger.AvailableNow through graft.streaming.BoundedRuns). Their
    * DataFrame is the post-run BATCH result — so plan-shape audits over
    * the catalog must skip them: planning means running the stream, and
    * the result frame's global windows are the same bounded calendar-day
    * class their batch twins allowlist. The streaming plans themselves
    * are gated by StreamingSpec and by the session ScaleGuard at query
    * start. Shared by PlanSpec's audits and Bench's pre-timing audit. */
  val streamingBoundedRuns: Set[String] = Set(
    "q74_stream_upsert", "q75_stream_sessions", "q76_stream_hourly",
    "q78_stream_attribution", "q79_stream_dedup", "q80_stream_enrich",
    "q130_stream_hll", "q151_stream_cms", "q201_stream_debounce",
    "q263_stream_topk", "q274_stream_session_window",
    "q281_stream_outer_attribution", "q289_stream_scd2",
    "q327_stream_cusum", "q328_stream_msprt",
    "q363_stream_ingest_survivors", "q364_stream_minhash_ingest",
    "q369_pipeline_e2e")

  /** query name -> the bounded frame its global window runs on.
    * "PrefixSum offsets" = the nBuckets-row bucket-totals frame inside
    * graft.operators.PrefixSum — the operator that EXISTS to replace
    * data-sized global windows; its own offset window is what surfaces
    * here. */
  val allowed: Map[String, String] = Map(
    "q06_value_share"          -> "distinct values of the profiled column",
    "q41_monthly_delta"        -> "months after aggregation",
    "q57_sequence_packing"     -> "PrefixSum offsets",
    "q111_chi_square"          -> "contingency margins |A|*|B|",
    "q114_zipf_audit"          -> "top-1000 terms after limit",
    "q140_abc_classification"  -> "PrefixSum offsets",
    "q141_gini_concentration"  -> "PrefixSum offsets",
    "q143_gap_interpolation"   -> "calendar-day spine",
    "q148_benford_audit"       -> "9 first-digit groups",
    "q169_transit_concurrency" -> "calendar-day delta frame",
    "q171_changepoint"         -> "calendar-day frame",
    "q174_moving_bands"        -> "calendar-day frame",
    "q179_lorenz_deciles"      -> "10-row decile frame + PrefixSum offsets",
    "q192_compaction_planner"  -> "PrefixSum offsets",
    "q198_rank_correlation"    -> "distinct-value frames via PrefixSum",
    "q200_kaplan_meier"        -> "distinct-duration (calendar-bounded)",
    "q346_greenwood_bands"     -> "q200's distinct-duration frame",
    "q204_largest_remainder"   -> "25 nations",
    "q214_mann_whitney"        -> "distinct-value frame via PrefixSum",
    "q215_ks_test"             -> "distinct-value frame via PrefixSum",
    "q225_logrank"             -> "calendar-day frame",
    "q227_nelson_aalen"        -> "calendar-day frame",
    "q234_bh_fdr"              -> "32-test family",
    "q246_gains_table"         -> "PrefixSum offsets + 10-row decile cumsum",
    "q271_isotonic_calibration" -> "distinct-score bin frame (Isotonic)",
    "q275_neyman_allocation"   -> "5-stratum remainder rank",
    "q278_ranking_metrics"     -> "10-row top-k rank + IDCG cumsum",
    "q282_quantile_normalization" -> "PrefixSum offsets (pooled ranks)",
    "q298_rrf_fusion"          -> "rank inside top-100 TakeOrdered frames",
    "q299_cusum_changepoint"   -> "calendar-day CUSUM frame",
    "q306_lateness_grid"       -> "<=32-row chunk prefix-max frame",
    "q314_runs_test"           -> "calendar-day sign-adjacency frame",
    "q318_durbin_watson"       -> "calendar-day residual-lag frame")
}
