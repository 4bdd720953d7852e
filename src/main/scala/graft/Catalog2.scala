package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Stable._
import graft.operators._

/** Catalog part 2 of 7: queries q94..q154, in original catalog
  * order ([[Queries.all]] concatenates the parts — split from the former
  * single-file catalog purely for compile/review ergonomics; content and
  * order are unchanged).
  */
private[graft] trait Catalog2 extends CatalogBase {
  protected val entries2: Seq[(String, Q)] = Seq(

    "q94_bloom_semi_join" -> Q(
      // Bloom-pruned semi join: revenue of orders placed by nation-1
      // customers, with the fact scan pre-filtered by a 4096-bit portable
      // Bloom filter of the customer keys before the exact confirm join.
      // The oracle is the PLAIN semi join — equality proves the composed
      // operator has no false negatives (Bloom guarantee) and no false
      // positives (confirm join). At 100 TB the filter is what keeps the
      // fact table from shuffling: only Bloom survivors reach the join.
      build = (s, dir) => {
        val keys = table(s, dir, "customer")
          .filter(col("c_nationkey") === 1).select(col("c_custkey"))
        Bloom.prunedSemiJoin(table(s, dir, "orders"), "o_custkey",
            keys, "c_custkey")
          .groupBy(col("o_orderpriority").as("prio"))
          .agg(msum(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("prio"))
      },
      oracle = Some(s"""
        SELECT o_orderpriority AS prio,
          ${sqlMsum("o_totalprice")} AS revenue, count(*) AS n_orders
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey = 1)
        GROUP BY 1 ORDER BY 1""")),

    "q95_grouped_auc" -> Q(
      // Per-segment ROC-AUC (does order value predict status F?) via
      // tie-averaged Mann-Whitney ranks — sliced model evaluation with an
      // integer-exact statistic: one rank window + one hash agg per
      // group, a single double division at the end (bit-equal across
      // engines, no rounding snap).
      build = (s, dir) =>
        // evaluation contract (r9): an eval observation needs BOTH a
        // score and a label — a NULL status is an unknown outcome (not a
        // negative) and a NULL score has no rank (it would also sit at
        // opposite ends of the two engines' rank windows)
        Auc.groupedAuc(
            table(s, dir, "orders")
              .filter(col("o_totalprice").isNotNull &&
                col("o_orderstatus").isNotNull)
              .select(
                col("o_orderpriority").as("prio"),
                col("o_totalprice").as("score"),
                (col("o_orderstatus") === "F").cast("int").as("y")),
            Seq("prio"), "score", "y")
          .orderBy(col("prio")),
      oracle = Some(s"""
        WITH ${Auc.sqlAucCtes(
          "(SELECT * FROM orders WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL)",
          "o_orderpriority", "o_totalprice",
          "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END")}
        SELECT g AS prio, n, pos, auc FROM auc_g ORDER BY prio"""),
      bench = true),

    "q96_woe_binning" -> Q(
      // Decile binning + weight-of-evidence encoding of order totals vs
      // status F — the scorecard feature transform of the reference's
      // credit domain. Thresholds are exact type-7 percentiles (q19
      // parity); bin assignment is pure threshold comparisons; the WOE ln
      // is snapped to 8 decimals (PMI convention).
      build = (s, dir) =>
        Binning.woeTable(
            table(s, dir, "orders").select(
              col("o_totalprice").as("x"),
              (col("o_orderstatus") === "F").cast("int").as("y")),
            "x", "y", nBins = 10)
          .orderBy(col("bin")),
      oracle = Some(s"""
        WITH ${Binning.sqlWoeCtes("orders", "o_totalprice",
          "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END")}
        SELECT bin, n, pos, neg, woe, iv FROM woe_bins ORDER BY bin""")),

    "q97_url_battery" -> Q(
      // URL parsing surface: documents carry a synthesized (well-formed by
      // construction) URL; Spark parses with the native parse_url
      // expression, the oracle with anchored regexes — agreement pins the
      // components a pipeline dedupes and filters on (host, TLD, query
      // param). Grouped to (host, ref) rollups.
      build = (s, dir) => {
        val url = concat(lit("https://"), col("source"),
          lit(".example.com/"), col("lang"), lit("/doc/"),
          col("doc_id").cast("string"), lit("?ref=r"),
          pmod(col("doc_id"), lit(7)).cast("string"), lit("&utm=x"))
        table(s, dir, "documents")
          .withColumn("url", url)
          .withColumn("host", expr("parse_url(url, 'HOST')"))
          .withColumn("tld", element_at(split(col("host"), "\\."), -1))
          .withColumn("ref", expr("parse_url(url, 'QUERY', 'ref')"))
          .groupBy(col("host"), col("tld"), col("ref"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
          .orderBy(col("host"), col("ref"))
      },
      oracle = Some("""
        WITH u AS (
          SELECT doc_id,
            'https://' || source || '.example.com/' || lang || '/doc/'
              || CAST(doc_id AS VARCHAR) || '?ref=r'
              || CAST(doc_id % 7 AS VARCHAR) || '&utm=x' AS url
          FROM documents),
        parsed AS (
          SELECT doc_id,
            regexp_extract(url, '^https://([^/]+)', 1) AS host,
            regexp_extract(regexp_extract(url, '^https://([^/]+)', 1),
              '([^.]+)$', 1) AS tld,
            regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref
          FROM u)
        SELECT host, tld, ref, count(*) AS n_docs,
          min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM parsed
        GROUP BY host, tld, ref
        ORDER BY host, ref""")),

    "q98_edit_fuzzy_pairs" -> Q(
      // Typo-level record linkage: all customer-name pairs within
      // Levenshtein 1, found by the 1-deletion-neighborhood signature
      // join (provably complete; see FuzzyJoin) and verified exactly. The
      // oracle is the brute-force all-pairs answer — equality proves the
      // blocking lossless. Signatures shuffle as xxhash64 longs, never as
      // text.
      build = (s, dir) =>
        FuzzyJoin.editPairs1(table(s, dir, "customer"), "c_name")
          .orderBy(col("a"), col("b")),
      oracle = Some(s"""
        WITH ${FuzzyJoin.sqlEditPairs1("customer", "c_name")}
        SELECT a, b, dist FROM edit_pairs ORDER BY a, b"""),
      bench = true),

    "q99_calibration_audit" -> Q(
      // Reliability-diagram calibration audit: min-max-normalized order
      // value as a pseudo-probability of status F, binned into 10
      // confidence buckets — per-bin mean confidence vs observed rate and
      // the ECE contribution. Per-row confidence is pure deterministic
      // IEEE arithmetic; bin means go through davg's exact-decimal snap;
      // accuracies are single long-ratio divisions.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val mm = o.agg(min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"))
        val binned = o.crossJoin(broadcast(mm))
          .withColumn("conf",
            (col("o_totalprice") - col("mn")) / (col("mx") - col("mn")))
          .withColumn("bin",
            least(floor(col("conf") * 10).cast("long"), lit(9L)))
          .withColumn("y", (col("o_orderstatus") === "F").cast("long"))
        val perBin = binned.groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
            davg(col("conf")).as("conf_avg"))
        val tot = perBin.agg(sum(col("n")).as("n_total"))
        perBin.crossJoin(broadcast(tot))
          .withColumn("acc", col("pos").cast("double") / col("n"))
          .withColumn("gap", round(abs(col("acc") - col("conf_avg")), 8))
          .withColumn("ece_term", round(
            col("n").cast("double") / col("n_total") * col("gap"), 8))
          .select(col("bin"), col("n"), col("pos"), col("conf_avg"),
            col("acc"), col("gap"), col("ece_term"))
          .orderBy(col("bin"))
      },
      oracle = Some(s"""
        WITH mm AS (
          SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
        b AS (
          SELECT
            least(CAST(floor((o_totalprice - mn) / (mx - mn) * 10) AS BIGINT), 9) AS bin,
            (o_totalprice - mn) / (mx - mn) AS conf,
            CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
          FROM orders, mm),
        pb AS (
          SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos,
            ${sqlDavg("conf")} AS conf_avg
          FROM b GROUP BY bin),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM pb)
        SELECT bin, n, pos, conf_avg,
          CAST(pos AS DOUBLE) / n AS acc,
          round(abs(CAST(pos AS DOUBLE) / n - conf_avg), 8) AS gap,
          round(CAST(n AS DOUBLE) / n_total
            * round(abs(CAST(pos AS DOUBLE) / n - conf_avg), 8), 8) AS ece_term
        FROM pb, tot ORDER BY bin""")),

    "q100_grouped_ols" -> Q(
      // Per-priority linear trend of order value over time: closed-form
      // OLS on exact-decimal moments (see Trend) — regr_slope semantics
      // without float accumulation. One hash agg per group; the only
      // float ops are the final divisions, bit-equal across engines.
      build = (s, dir) =>
        Trend.groupedLinearFit(
            table(s, dir, "orders").select(
              col("o_orderpriority").as("prio"),
              datediff(col("o_orderdate").cast("date"),
                lit("1970-01-01").cast("date")).as("dayn"),
              col("o_totalprice")),
            Seq("prio"), "dayn", "o_totalprice")
          .orderBy(col("prio")),
      oracle = Some(s"""
        WITH base AS (
          SELECT o_orderpriority AS prio,
            datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dayn,
            o_totalprice
          FROM orders),
        ${Trend.sqlFitCtes("base", "prio", "dayn", "o_totalprice")}
        SELECT g AS prio, n, slope, intercept FROM ols_g ORDER BY prio""")),

    "q101_pareto_frontier" -> Q(
      // 2-D skyline per priority over daily revenue points: the days not
      // dominated by any earlier-or-equal day with higher-or-equal
      // revenue. Spark computes it with ONE sort window (running min of
      // day over the revenue-descending order — O(n log n), no pairwise
      // comparisons); the oracle is the quadratic NOT EXISTS dominance
      // definition. Day is unique within a group, so the window-skyline
      // tie handling is exact.
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("prio"),
            col("o_orderdate").cast("date").as("day"))
          .agg(msum(col("o_totalprice")).as("day_rev"))
        Skyline.frontier2d(daily, Seq("prio"), "day_rev", "day")
          .select(col("prio"), col("day"), col("day_rev"))
          .orderBy(col("prio"), col("day"))
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
            ${sqlMsum("o_totalprice")} AS day_rev
          FROM orders GROUP BY 1, 2)
        SELECT d.prio, d.day, d.day_rev
        FROM daily d
        WHERE NOT EXISTS (
          SELECT 1 FROM daily e
          WHERE e.prio = d.prio
            AND e.day_rev >= d.day_rev AND e.day <= d.day
            AND (e.day_rev > d.day_rev OR e.day < d.day))
        ORDER BY d.prio, d.day""")),

    "q102_ordered_funnel" -> Q(
      // Ordered event funnel with sequence constraints: first view, then
      // first click strictly AFTER that view, then first purchase
      // strictly after that click — per-user stage timestamps via three
      // keyed min-aggregations (each a narrow user_id shuffle), counts
      // and conversion ratios at the end. This is sequence matching, not
      // the per-event-type counting of q65's quality funnel.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        val t1 = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val t2 = ev.filter(col("event_type") === "click")
          .join(t1, "user_id").filter(col("ts") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val t3 = ev.filter(col("event_type") === "purchase")
          .join(t2, "user_id").filter(col("ts") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        t1.agg(count(lit(1)).as("n_view"))
          .crossJoin(t2.agg(count(lit(1)).as("n_click_after")))
          .crossJoin(t3.agg(count(lit(1)).as("n_purchase_after")))
          .select(col("n_view"), col("n_click_after"), col("n_purchase_after"),
            round(col("n_click_after").cast("double") / col("n_view"), 8)
              .as("view_to_click"),
            round(col("n_purchase_after").cast("double") / col("n_click_after"), 8)
              .as("click_to_purchase"))
      },
      oracle = Some("""
        WITH t1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY 1),
        t2 AS (
          SELECT e.user_id, min(e.ts) AS t2 FROM events e
          JOIN t1 ON e.user_id = t1.user_id
          WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
        t3 AS (
          SELECT e.user_id, min(e.ts) AS t3 FROM events e
          JOIN t2 ON e.user_id = t2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1)
        SELECT
          (SELECT count(*) FROM t1) AS n_view,
          (SELECT count(*) FROM t2) AS n_click_after,
          (SELECT count(*) FROM t3) AS n_purchase_after,
          round(CAST((SELECT count(*) FROM t2) AS DOUBLE)
            / (SELECT count(*) FROM t1), 8) AS view_to_click,
          round(CAST((SELECT count(*) FROM t3) AS DOUBLE)
            / (SELECT count(*) FROM t2), 8) AS click_to_purchase""")),

    "q103_dq_checks" -> Q(
      // Declarative data-quality audit over the star schema: uniqueness,
      // null, range, accepted-set, and referential-integrity checks, each
      // one aggregation, unioned into the (check_name, n_violations,
      // pass) guardrail table a pipeline gates batches on. The last two
      // checks are deliberately tight gates that FAIL on the clean
      // fixture (l_quantity caps at 50, flags span A/N/R): the r6 power
      // audit found an all-green audit proves nothing about the
      // violation-COUNTING path — these canaries make both pass=false
      // and n_violations > 0 part of the oracle-checked surface.
      build = (s, dir) => {
        val o = table(s, dir, "orders"); val c = table(s, dir, "customer")
        val l = table(s, dir, "lineitem"); val d = table(s, dir, "documents")
        DataChecks.run(Seq(
          DataChecks.unique(o, Seq("o_orderkey")),
          DataChecks.unique(c, Seq("c_custkey")),
          DataChecks.notNull(o, "o_custkey"),
          DataChecks.notNull(d, "text"),
          DataChecks.refIntegrity(o, "o_custkey", c, "c_custkey", "orders.customer"),
          DataChecks.refIntegrity(l, "l_orderkey", o, "o_orderkey", "lineitem.orders"),
          DataChecks.inRange(o, "o_totalprice", 0.0, 1e9),
          DataChecks.inRange(l, "l_discount", 0.0, 1.0),
          DataChecks.acceptedValues(o, "o_orderstatus", Seq("F", "O", "P")),
          DataChecks.inRange(l, "l_quantity", 1.0, 30.0),
          DataChecks.acceptedValues(l, "l_returnflag", Seq("N"))))
      },
      oracle = Some("""
        SELECT check_name, n_violations, n_violations = 0 AS pass FROM (
          SELECT 'unique:o_orderkey' AS check_name,
            CAST(coalesce(sum(cnt - 1), 0) AS BIGINT) AS n_violations
          FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_orderkey)
          UNION ALL
          SELECT 'unique:c_custkey',
            CAST(coalesce(sum(cnt - 1), 0) AS BIGINT)
          FROM (SELECT count(*) AS cnt FROM customer GROUP BY c_custkey)
          UNION ALL
          SELECT 'not_null:o_custkey', count(*) - count(o_custkey) FROM orders
          UNION ALL
          SELECT 'not_null:text', count(*) - count(text) FROM documents
          UNION ALL
          SELECT 'ref:orders.customer', count(*) FROM orders o
          WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
          UNION ALL
          SELECT 'ref:lineitem.orders', count(*) FROM lineitem l
          WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
          UNION ALL
          SELECT 'range:o_totalprice',
            CAST(coalesce(sum(CASE WHEN o_totalprice < 0.0
              OR o_totalprice > 1000000000.0 THEN 1 ELSE 0 END), 0) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'range:l_discount',
            CAST(coalesce(sum(CASE WHEN l_discount < 0.0
              OR l_discount > 1.0 THEN 1 ELSE 0 END), 0) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'accepted:o_orderstatus',
            CAST(coalesce(sum(CASE WHEN o_orderstatus IN ('F', 'O', 'P')
              OR o_orderstatus IS NULL THEN 0 ELSE 1 END), 0) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'range:l_quantity',
            CAST(coalesce(sum(CASE WHEN l_quantity < 1.0
              OR l_quantity > 30.0 THEN 1 ELSE 0 END), 0) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'accepted:l_returnflag',
            CAST(coalesce(sum(CASE WHEN l_returnflag IN ('N')
              OR l_returnflag IS NULL THEN 0 ELSE 1 END), 0) AS BIGINT)
          FROM lineitem
        ) ORDER BY check_name""")),

    "q104_cms_frequency" -> Q(
      // Mergeable count-min frequency sketch: per-user event counts
      // estimated from a fixed 4x1024 counter grid instead of a
      // key-space-sized exact table. Like q93, the Spark side builds TWO
      // sketches (even/odd event halves — the daily-rollup shape) and
      // merges them, while the oracle sketches the whole table directly:
      // hash-equality proves merge ≡ direct, the property that lets
      // per-day sketches roll up without re-reading raw events. All
      // arithmetic is integer over the portable salted md5 hash, so the
      // approximate operator is oracle-checked EXACTLY; the exact count
      // rides along and `overcount` exhibits the CMS ≥-truth guarantee.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        val hist = Cms.sketch(ev.filter(col("event_id") % 2 === 0), "user_id")
        val delta = Cms.sketch(ev.filter(col("event_id") % 2 =!= 0), "user_id")
        val sk = Cms.merge(hist, delta)
        val exact = ev.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_exact"))
        val probes = exact
          .orderBy(col("n_exact").desc, col("user_id")).limit(20)
        probes
          .join(Cms.lookup(sk, probes.select(col("user_id")), "user_id"),
            "user_id")
          .select(col("user_id"), col("n_exact"), col("cms_est"),
            (col("cms_est") - col("n_exact")).as("overcount"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH ${Cms.sqlSketchCtes("SELECT user_id AS key FROM events")},
        ex AS (
          SELECT user_id, count(*) AS n_exact FROM events GROUP BY 1),
        probes AS (
          SELECT user_id, n_exact FROM ex
          ORDER BY n_exact DESC, user_id LIMIT 20),
        ${Cms.sqlLookupCtes("SELECT user_id AS key FROM probes")}
        SELECT p.user_id, p.n_exact, l.cms_est,
          l.cms_est - p.n_exact AS overcount
        FROM probes p JOIN cms_lk l ON l.key = p.user_id
        ORDER BY p.user_id"""),
      bench = true),

    "q105_kmv_intersections" -> Q(
      // KMV theta-sketch set algebra: distinct-user union AND intersection
      // estimates for every event-type pair, computed from k=64-minimum
      // portable-hash sketches — never a pairwise exact-distinct pass over
      // raw events. HLL (q93) can only union; this is the sketch that
      // answers audience-overlap questions at 100 TB. The estimate
      // arithmetic is integer up to two fixed-shape divisions (snapped to
      // 4 decimals), so the oracle hash-matches exactly; the exact
      // intersection rides along as the error audit. Set element =
      // USER-DAY, not plain user: the r6 power audit found every type's
      // user set saturated at all 150 fixture users (identical sketches,
      // constant estimates — a pair mix-up would pass unnoticed);
      // user-day activity sets differ per type, so the estimates carry
      // real per-pair signal.
      build = (s, dir) => {
        // user_id IS NOT NULL: same entity contract as q93 — a NULL user
        // is no audience member (count-DISTINCT semantics), and the
        // concat_ws-vs-|| NULL asymmetry would otherwise diverge
        val ev = table(s, dir, "events")
          .filter(col("user_id").isNotNull)
          .select(col("event_type").as("g"),
            concat_ws("#", col("user_id"), col("ts").cast("date")).as("key"))
        val est = Kmv.intersectEstimates(Kmv.sketch(ev, "g", "key"), "g")
        val ex = ev.distinct()
        val exi = ex.as("a").join(ex.as("b"),
            col("a.key") === col("b.key") && col("a.g") < col("b.g"))
          .groupBy(col("a.g").as("g_a"), col("b.g").as("g_b"))
          .agg(count(lit(1)).as("n_inter_exact"))
        est.join(exi, Seq("g_a", "g_b"), "left")
          .select(col("g_a"), col("g_b"), col("n_kept"), col("theta"),
            col("rho"), coalesce(col("n_inter_exact"), lit(0L)).as("n_inter_exact"),
            col("kmv_union_est"), col("kmv_inter_est"))
          .orderBy(col("g_a"), col("g_b"))
      },
      oracle = Some(s"""
        WITH ${Kmv.sqlCtes("SELECT event_type AS g, user_id || '#' || CAST(CAST(ts AS DATE) AS VARCHAR) AS key FROM events WHERE user_id IS NOT NULL")},
        ex AS (SELECT DISTINCT event_type AS g,
          user_id || '#' || CAST(CAST(ts AS DATE) AS VARCHAR) AS key
          FROM events WHERE user_id IS NOT NULL),
        exi AS (
          SELECT a.g AS g_a, b.g AS g_b, count(*) AS n_inter_exact
          FROM ex a JOIN ex b ON a.key = b.key AND a.g < b.g
          GROUP BY 1, 2)
        SELECT e.g_a, e.g_b, e.n_kept, e.theta, e.rho,
          CAST(coalesce(x.n_inter_exact, 0) AS BIGINT) AS n_inter_exact,
          e.kmv_union_est, e.kmv_inter_est
        FROM kmv_est e LEFT JOIN exi x ON e.g_a = x.g_a AND e.g_b = x.g_b
        ORDER BY e.g_a, e.g_b""")),

    "q106_cohort_retention" -> Q(
      // Weekly cohort-retention triangle: users cohorted by first-seen
      // week, counted distinct per (cohort, weeks-since) cell. Integer
      // counts + one division per cell; Monday-truncated weeks and
      // day-diff/7 offsets are identical across engines.
      build = (s, dir) =>
        Cohorts.weeklyRetention(table(s, dir, "events"), "user_id", "ts")
          .orderBy(col("cohort_week"), col("week_offset")),
      oracle = Some(s"""
        WITH ${Cohorts.sqlCtes("SELECT user_id AS u, ts FROM events")}
        SELECT cohort_week, week_offset, n_active, cohort_size,
          retention_pct
        FROM cohort_ret
        ORDER BY cohort_week, week_offset""")),

    "q107_markov_transitions" -> Q(
      // First-order Markov transition matrix of event types per user
      // stream (ties on ts broken by event_id): behavioral modeling /
      // anomalous-journey detection. Counts exact; probabilities are one
      // division each, snapped to 8 decimals.
      build = (s, dir) =>
        Sequences.transitions(table(s, dir, "events"),
            "user_id", "ts", "event_id", "event_type")
          .orderBy(col("from_tok"), col("to_tok")),
      oracle = Some(s"""
        WITH ${Sequences.sqlTransitionsCtes(
          "SELECT user_id AS g, ts, event_id AS id, event_type AS tok FROM events")}
        SELECT from_tok, to_tok, n, n_from, p FROM seq_trans
        ORDER BY from_tok, to_tok""")),

    "q108_session_paths" -> Q(
      // Top-20 session journey paths: gap-bounded sessions (same 30-min
      // sessionizer as q18), each session's ordered event types joined
      // into a path string, heaviest paths first with a total tie-break —
      // funnel discovery without pre-declared stages.
      build = (s, dir) =>
        Sequences.topPaths(table(s, dir, "events"),
          "user_id", "ts", "event_id", "event_type",
          gapSeconds = 1800L, k = 20),
      oracle = Some("""
        WITH lagged AS (
          -- mirrors Sequences.topPaths: only typed, attributable events
          -- can contribute path steps
          SELECT user_id, event_id, ts, event_type,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events
          WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        numbered AS (
          SELECT user_id, ts, event_id, event_type,
            sum(CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM lagged),
        paths AS (
          -- agg: nonempty (lagged's WHERE keeps only non-NULL
          -- event_type rows, so every (user, session) group feeds >= 1
          -- non-NULL element — the '' vs NULL empty-agg class can't fire)
          SELECT user_id, session_seq,
            string_agg(event_type, '>' ORDER BY ts, event_id) AS path
          FROM numbered GROUP BY user_id, session_seq)
        SELECT path, count(*) AS n_sessions
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT 20""")),

    "q109_grouped_pearson" -> Q(
      // Per-nation Pearson correlation (does customer balance track order
      // value?) on exact-decimal moments — `corr` semantics rebuilt
      // combine-order-independent, same machinery as q100's OLS. Star
      // join streams the fact side; dims broadcast.
      build = (s, dir) => {
        val j = table(s, dir, "orders")
          .join(table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(table(s, dir, "nation"),
            col("c_nationkey") === col("n_nationkey"))
        Trend.groupedPearson(j, Seq("n_name"), "c_acctbal", "o_totalprice")
          .orderBy(col("n_name"))
      },
      oracle = Some(s"""
        WITH ${Trend.sqlPearsonCtes(
          "orders JOIN customer ON o_custkey = c_custkey " +
            "JOIN nation ON c_nationkey = n_nationkey",
          "n_name", "c_acctbal", "o_totalprice")}
        SELECT g AS n_name, n, r FROM corr_g ORDER BY n_name""")),

    "q110_key_skew_audit" -> Q(
      // Join-key skew pre-flight over the schema's real join keys: per-key
      // count distribution (exact type-7 p50/p99, max, hottest-key share,
      // max/avg skew ratio). This is the audit that decides salting /
      // AQE skew handling BEFORE the 100 TB shuffle runs.
      build = (s, dir) =>
        Profiling.keySkew(table(s, dir, "lineitem"), "l_orderkey",
            "lineitem.l_orderkey")
          .unionByName(Profiling.keySkew(table(s, dir, "orders"),
            "o_custkey", "orders.o_custkey"))
          .unionByName(Profiling.keySkew(table(s, dir, "events"),
            "user_id", "events.user_id"))
          .unionByName(Profiling.keySkew(table(s, dir, "documents"),
            "lang", "documents.lang"))
          .orderBy(col("audit")),
      oracle = Some(s"""
        SELECT * FROM (
          ${Profiling.sqlKeySkew("lineitem.l_orderkey", "lineitem", "l_orderkey")}
          UNION ALL
          ${Profiling.sqlKeySkew("orders.o_custkey", "orders", "o_custkey")}
          UNION ALL
          ${Profiling.sqlKeySkew("events.user_id", "events", "user_id")}
          UNION ALL
          ${Profiling.sqlKeySkew("documents.lang", "documents", "lang")}
        ) ORDER BY audit""")),

    "q111_chi_square" -> Q(
      // Chi-square independence + Cramér's V for documents lang × source
      // (is one source feeding all of one language?). Contingency cells
      // and margins are exact integers over a bounded |A|x|B| frame; the
      // chi2 total is an order-independent exact-decimal sum.
      build = (s, dir) =>
        Contingency.chiSquare(table(s, dir, "documents"), "lang", "source"),
      oracle = Some(Contingency.sqlChiSquare("documents", "lang", "source"))),

    "q112_welch_ab" -> Q(
      // Per-priority Welch two-sample test: does order value differ
      // between finished (F) and open (O/P) orders? One conditional-
      // moment aggregation pass; exact-decimal sums, fixed-shape double
      // statistic snapped to 6 decimals.
      build = (s, dir) =>
        Hypothesis.welchTwoSample(
            table(s, dir, "orders")
              .withColumn("is_f", col("o_orderstatus") === "F"),
            Seq("o_orderpriority"), "o_totalprice", "is_f")
          .orderBy(col("o_orderpriority")),
      oracle = Some(s"""
        WITH ${Hypothesis.sqlWelchCtes("orders", "o_orderpriority",
          "o_totalprice", "o_orderstatus = 'F'")}
        SELECT g AS o_orderpriority, n_a, n_b, mean_a, mean_b, welch_z
        FROM welch_g ORDER BY o_orderpriority""")),

    "q113_hash_reservoir" -> Q(
      // Exactly-5-per-language deterministic sample: rows ranked inside
      // each group by the portable hash of their unique id — the
      // reproducible per-group eyeball sample (TABLESAMPLE/rand() cannot
      // give you the same rows twice). Window top-k per group; output
      // bounded by #groups * k.
      build = (s, dir) =>
        Sampling.hashReservoir(
            table(s, dir, "documents").select(col("doc_id"), col("lang")),
            "lang", "doc_id", k = 5)
          .orderBy(col("lang"), col("doc_id")),
      oracle = Some(s"""
        SELECT doc_id, lang FROM (
          SELECT doc_id, lang, row_number() OVER (
            PARTITION BY lang
            ORDER BY ${TextHash.sqlMd5Bits60("CAST(doc_id AS VARCHAR)")},
              doc_id) AS rn
          FROM documents)
        WHERE rn <= 5
        ORDER BY lang, doc_id""")),

    "q114_zipf_audit" -> Q(
      // Corpus power-law (Zipf) audit: OLS fit of ln(frequency) on
      // ln(rank) over the top-1000 terms — natural-text corpora fit a
      // slope near -1; synthetic or template-heavy corpora don't, which
      // makes the fit a cheap corpus-health signal. Top-k cut is total
      // (count desc, term asc); the global rank window runs on the
      // BOUNDED top-k frame, never the vocabulary. ln snapped to 8
      // decimals before the exact-decimal moment accumulation (same
      // convention as q92's PMI).
      build = (s, dir) => {
        val terms = table(s, dir, "documents")
          .select(explode(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        val top = terms.orderBy(col("cnt").desc, col("w")).limit(1000)
        val ranked = top.withColumn("rank", row_number().over(
          Window.orderBy(col("cnt").desc, col("w"))))
        val xy = ranked.select(lit("corpus").as("scope"),
          log(col("rank").cast("double")).as("ln_rank"),
          log(col("cnt").cast("double")).as("ln_cnt"))
        Trend.fitContinuousXY(xy, Seq("scope"), "ln_rank", "ln_cnt")
      },
      oracle = Some(s"""
        WITH terms AS (
          SELECT w, count(*) AS cnt FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS w
            FROM documents)
          GROUP BY w),
        topk AS (
          SELECT w, cnt FROM terms ORDER BY cnt DESC, w LIMIT 1000),
        ranked AS (
          SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rank
          FROM topk),
        xy AS (
          SELECT 'corpus' AS scope,
            ln(CAST(rank AS DOUBLE)) AS ln_rank,
            ln(CAST(cnt AS DOUBLE)) AS ln_cnt
          FROM ranked),
        ${Trend.sqlFitContinuousCtes("xy", "scope", "ln_rank", "ln_cnt")}
        SELECT g AS scope, n, slope, intercept, r FROM fit_g""")),

    "q115_triangle_count" -> Q(
      // Triangle count + clustering coefficient of the part-co-purchase
      // graph (parts are adjacent if some order contains both): degree-
      // oriented wedge join, so hub parts never explode the join. The
      // oracle counts the same triangles via the canonical a<b<c 3-way
      // self-join — count equality proves the orientation enumerated
      // every triangle exactly once.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        val edges = li.as("x").join(li.as("y"),
            col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b"))
          .distinct()
        Triangles.metrics(edges)
      },
      oracle = Some(s"""
        WITH tri_edges AS (
          SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
          FROM lineitem x JOIN lineitem y
            ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        ${Triangles.sqlMetrics.trim.stripPrefix("WITH").trim}""")),

    "q116_asof_tolerance" -> Q(
      // Forward as-of join with tolerance (pandas merge_asof semantics):
      // each click attributed to the NEXT purchase by the same user
      // within 2 hours — one union+window shuffle, never a range
      // cross-product. Ties at the same purchase timestamp resolve to the
      // largest payload (max event_id), mirrored in the oracle.
      build = (s, dir) => ntzOut {
        val ev = table(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_raw_ts"),
            col("event_id").as("p_id"))
        // null-free output: NaT/NaN compare as unequal in float/datetime
        // comparators, so unmatched clicks carry sentinels on BOTH sides
        AsOfJoin.asOfTolerance(clicks, purchases, Seq("user_id"),
            "ts", "p_raw_ts", Seq("p_id"),
            toleranceSeconds = 7200L, forward = true)
          .select(col("event_id"), col("user_id"), col("ts"),
            coalesce(col("asof_ts"), lit("1970-01-01").cast("timestamp"))
              .as("p_ts"),
            coalesce(col("p_id"), lit(-1L)).as("p_id"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        WITH c AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
        p AS (
          SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
          WHERE event_type = 'purchase'),
        m AS (
          SELECT c.event_id AS cid, min(p.p_ts) AS m_ts
          FROM c JOIN p ON p.user_id = c.user_id
            AND p.p_ts >= c.ts AND p.p_ts <= c.ts + INTERVAL 2 HOUR
          GROUP BY 1),
        mp AS (
          SELECT m.cid, m.m_ts, max(p.p_id) AS p_id
          FROM m JOIN c ON c.event_id = m.cid
          JOIN p ON p.user_id = c.user_id AND p.p_ts = m.m_ts
          GROUP BY 1, 2)
        SELECT c.event_id, c.user_id, c.ts,
          coalesce(mp.m_ts, TIMESTAMP '1970-01-01') AS p_ts,
          coalesce(mp.p_id, -1) AS p_id
        FROM c LEFT JOIN mp ON mp.cid = c.event_id
        ORDER BY c.event_id""")),

    "q117_dedup_cascade" -> Q(
      // The full dedup CASCADE a training-data pipeline actually runs —
      // exact (byte hash) → canonical (NFC+casefold+whitespace) →
      // near-dup (word-3-gram Jaccard ≥ 0.6, q27's operator) — with each
      // document attributed to the FIRST stage that removed it. Each
      // stage only processes the previous stage's survivors (the cheap
      // stages shrink the corpus before the expensive one), which is the
      // ordering that matters at 100 TB. Keep-first policy (min doc_id)
      // at every stage, matching q22/q35.
      build = (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val keyed = docs.select(col("doc_id"),
          TextStats.contentKey(col("text")).as("ek"),
          TextStats.canonicalKey(col("text")).as("ck"))
        val keep1 = keyed.groupBy(col("ek"))
          .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
        val s1 = keyed.join(keep1, Seq("doc_id"), "left_semi")
        val keep2 = s1.groupBy(col("ck"))
          .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
        val s2 = docs.join(keep2, Seq("doc_id"), "left_semi")
        val nearRem = NearDup.jaccardPairs(s2, "doc_id", "text")
          .select(col("id_b").as("doc_id")).distinct()
        docs.select(col("doc_id"))
          .join(keep1.withColumn("k1", lit(1)), Seq("doc_id"), "left")
          .join(keep2.withColumn("k2", lit(1)), Seq("doc_id"), "left")
          .join(nearRem.withColumn("nr", lit(1)), Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("k1").isNull, "removed_exact")
              .when(col("k2").isNull, "removed_canonical")
              .when(col("nr").isNotNull, "removed_neardup")
              .otherwise("kept").as("reason"))
          .groupBy(col("reason")).agg(count(lit(1)).as("n_docs"))
          .orderBy(col("reason"))
      },
      oracle = Some(s"""
        WITH keyed AS (
          SELECT doc_id, md5(text) AS ek,
            md5(${TextStats.sqlCanonicalText("text")}) AS ck
          FROM documents),
        keep1 AS (SELECT min(doc_id) AS doc_id FROM keyed GROUP BY ek),
        s1 AS (SELECT k.* FROM keyed k JOIN keep1 USING (doc_id)),
        keep2 AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY ck),
        c_toks AS MATERIALIZED (
          SELECT d.doc_id, regexp_split_to_array(trim(d.text), '[ \\t\\n\\x0B\\f\\r]+') AS t
          FROM documents d JOIN keep2 USING (doc_id)),
        c_sh AS MATERIALIZED (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, len(t) - 2),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
          FROM c_toks),
        -- inverted-index pairs (recall: exact for j >= 0.6 — a
        -- qualifying pair shares >= 1 shingle; the all-pairs
        -- list_intersect scan was oracle-side quadratic, ngramPairCtes'
        -- r11 conversion)
        c_rws AS MATERIALIZED (SELECT doc_id, unnest(s) AS g FROM c_sh),
        c_szs AS MATERIALIZED (
          SELECT doc_id, count(*) AS sz FROM c_rws GROUP BY doc_id),
        c_com AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          FROM c_rws a JOIN c_rws b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        c_pairs AS (
          SELECT id_a, id_b,
            CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS j
          FROM c_com
          JOIN c_szs sa ON sa.doc_id = id_a
          JOIN c_szs sb ON sb.doc_id = id_b),
        nearrem AS (
          SELECT DISTINCT id_b AS doc_id FROM c_pairs WHERE j >= 0.6),
        verdict AS (
          SELECT d.doc_id,
            CASE WHEN k1.doc_id IS NULL THEN 'removed_exact'
                 WHEN k2.doc_id IS NULL THEN 'removed_canonical'
                 WHEN nr.doc_id IS NOT NULL THEN 'removed_neardup'
                 ELSE 'kept' END AS reason
          FROM documents d
          LEFT JOIN keep1 k1 ON d.doc_id = k1.doc_id
          LEFT JOIN keep2 k2 ON d.doc_id = k2.doc_id
          LEFT JOIN nearrem nr ON d.doc_id = nr.doc_id)
        SELECT reason, count(*) AS n_docs FROM verdict
        GROUP BY reason ORDER BY reason"""),
      bench = true),

    "q118_conversion_times" -> Q(
      // Time-to-convert distribution per hour-of-day: for each click with
      // a following purchase inside 2h (q116's tolerance as-of), the
      // exact type-7 p25/median/p75 of the conversion delay in seconds,
      // sliced by the click's hour — the latency-percentile readout of an
      // attribution pipeline. Delays are exact integer microseconds
      // until one division by 1e6.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_raw_ts"),
            col("event_id").as("p_id"))
        AsOfJoin.asOfTolerance(clicks, purchases, Seq("user_id"),
            "ts", "p_raw_ts", Seq("p_id"),
            toleranceSeconds = 7200L, forward = true)
          .filter(col("p_id").isNotNull)
          .select(hour(col("ts")).as("click_hour"),
            ((unix_micros(col("asof_ts")) - unix_micros(col("ts")))
              / lit(1000000.0)).as("delay_s"))
          .groupBy(col("click_hour"))
          .agg(count(lit(1)).as("n_conversions"),
            expr("percentile(delay_s, 0.25D)").as("p25_s"),
            expr("percentile(delay_s, 0.5D)").as("median_s"),
            expr("percentile(delay_s, 0.75D)").as("p75_s"))
          .orderBy(col("click_hour"))
      },
      oracle = Some("""
        WITH c AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
        p AS (
          SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
          WHERE event_type = 'purchase'),
        m AS (
          SELECT c.event_id AS cid, min(p.p_ts) AS m_ts
          FROM c JOIN p ON p.user_id = c.user_id
            AND p.p_ts >= c.ts AND p.p_ts <= c.ts + INTERVAL 2 HOUR
          GROUP BY 1),
        delays AS (
          SELECT hour(c.ts) AS click_hour,
            (epoch_us(m.m_ts) - epoch_us(c.ts)) / 1000000.0 AS delay_s
          FROM c JOIN m ON m.cid = c.event_id)
        SELECT click_hour, count(*) AS n_conversions,
          quantile_cont(delay_s, 0.25) AS p25_s,
          quantile_cont(delay_s, 0.5) AS median_s,
          quantile_cont(delay_s, 0.75) AS p75_s
        FROM delays GROUP BY click_hour ORDER BY click_hour""")),

    "q119_pythagorean_means" -> Q(
      // Per-source arithmetic / geometric / harmonic means of document
      // length — the mean family rate/ratio aggregation needs (GM for
      // multiplicative quality factors, HM for rates). ln and 1/x are
      // per-row doubles snapped to exact decimals (8 and 14 places) so
      // the sums are combine-order-independent; exp/division finalize,
      // snapped to 6.
      build = (s, dir) =>
        table(s, dir, "documents")
          .filter(col("n_chars") > 0)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            mavg(col("n_chars")).as("arith_mean"),
            sum(round(log(col("n_chars").cast("double")), 8)
              .cast("decimal(14,8)")).cast("decimal(24,8)").as("sln"),
            sum(round(lit(1.0) / col("n_chars").cast("double"), 14)
              .cast("decimal(16,14)")).cast("decimal(24,14)").as("sinv"))
          .select(col("source"), col("n"), col("arith_mean"),
            round(exp(col("sln").cast("double") / col("n").cast("double")), 6)
              .as("geo_mean"),
            round(col("n").cast("double") / col("sinv").cast("double"), 6)
              .as("harm_mean"))
          .orderBy(col("source")),
      oracle = Some(s"""
        SELECT source, count(*) AS n,
          ${sqlMavg("n_chars")} AS arith_mean,
          round(exp(CAST(CAST(sum(CAST(round(ln(CAST(n_chars AS DOUBLE)), 8)
              AS DECIMAL(14,8))) AS DECIMAL(24,8)) AS DOUBLE)
            / CAST(count(*) AS DOUBLE)), 6) AS geo_mean,
          round(CAST(count(*) AS DOUBLE)
            / CAST(CAST(sum(CAST(round(1.0 / CAST(n_chars AS DOUBLE), 14)
              AS DECIMAL(16,14))) AS DECIMAL(24,14)) AS DOUBLE), 6)
            AS harm_mean
        FROM documents
        WHERE n_chars > 0
        GROUP BY source
        ORDER BY source""")),

    "q120_pagerank" -> Q(
      // Integer-exact PageRank (10 rounds, damping 0.85) over the
      // symmetrized part-co-purchase graph — top-20 most central parts.
      // Rank mass is integer-scaled 10^12 with deterministic floor
      // divisions, so the approximate-by-nature iterative algorithm is
      // oracle-checked EXACTLY against a DuckDB recursive CTE running
      // the identical integer recurrence.
      build = (s, dir) => {
        // fan-out before the self-join: the pair expansion + partial
        // aggregation run on the probe side's partitioning, which is a
        // row-group-starved 1-task scan at bench SFs (Par.fanOut doc;
        // no-op at scale)
        val li = graft.operators.Par.fanOut(table(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")), "o")
        // support >= 2 denoises: pairs co-bought once are coincidence and
        // would be 99.7% of the edges at sf0.1 — the pair-count HAVING
        // does in ONE aggregation what 10 PageRank rounds would otherwise
        // pay for on a 300x larger graph
        val edges = li.as("x").join(li.as("y"),
            col("x.o") === col("y.o") && col("x.p") =!= col("y.p"))
          .groupBy(col("x.p").as("src"), col("y.p").as("dst"))
          .agg(count(lit(1)).as("c"))
          .filter(col("c") >= 2)
          .select(col("src"), col("dst"))
        PageRank.ranks(edges, iters = 10)
          .orderBy(col("pr").desc, col("node"))
          .limit(20)
          .select(col("node").as("part"), col("pr"))
      },
      oracle = Some(s"""
        WITH RECURSIVE pr_edges AS (
          SELECT src, dst FROM (
            SELECT x.l_partkey AS src, y.l_partkey AS dst, count(*) AS c
            FROM lineitem x JOIN lineitem y
              ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey
            GROUP BY 1, 2) WHERE c >= 2),
        ${PageRank.sqlRanksCtes(iters = 10)}
        SELECT node AS part, pr FROM pr_final
        ORDER BY pr DESC, node LIMIT 20"""),
      bench = true),

    "q121_kl_divergence" -> Q(
      // Per-source lexical drift: KL divergence of each source's word-
      // unigram distribution against the whole corpus (always finite —
      // the corpus is a superset, no smoothing constant). Integer counts,
      // per-term p*ln(p/q) snapped to 8 decimals, exact-decimal total.
      build = (s, dir) =>
        Divergence.klVsCorpus(table(s, dir, "documents"), "source", "text")
          .withColumnRenamed("g", "source")
          .orderBy(col("source")),
      oracle = Some(s"""
        WITH ${Divergence.sqlKlCtes("documents", "source", "text")}
        SELECT g AS source, n_tokens, n_terms, kl_nats
        FROM kl_g ORDER BY source""")),

    "q122_psi_drift" -> Q(
      // Population-stability audit of order value: early era (orders
      // before 1998) as reference deciles, late era as current — the
      // scorecard drift gate, per-bin. Reference thresholds are exact
      // type-7 deciles broadcast as a comparison chain; counts integer,
      // one fixed-shape psi term per bin.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val cut = lit("1998-01-01").cast("date")
        Divergence.psiBins(
            o.filter(col("o_orderdate") < cut),
            o.filter(col("o_orderdate") >= cut),
            "o_totalprice", nBins = 10)
          .orderBy(col("bin"))
      },
      oracle = Some(s"""
        WITH ${Divergence.sqlPsiCtes(
          "SELECT o_totalprice AS v FROM orders WHERE o_orderdate < DATE '1998-01-01'",
          "SELECT o_totalprice AS v FROM orders WHERE o_orderdate >= DATE '1998-01-01'",
          nBins = 10)}
        SELECT bin, n_ref, n_cur, p_ref, p_cur, psi_term
        FROM psi_bins ORDER BY bin""")),

    "q123_burst_detection" -> Q(
      // Burst detection: per-type events-per-hour vs the trailing-24h
      // baseline (value-based RANGE frame, current hour excluded, ≥12
      // hours of history required) — the rate-anomaly monitor. Raw
      // events collapse to hour counts FIRST; the window runs over the
      // bounded hour table. Top-50 hours by burst ratio, total
      // tie-break on the ROUNDED ratio.
      build = (s, dir) => ntzOut {
        val m = table(s, dir, "events")
          .groupBy(col("event_type").as("et"),
            date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("hrn", expr("unix_micros(hr) div 3600000000"))
        val w = Window.partitionBy(col("et")).orderBy(col("hrn"))
          .rangeBetween(-24, -1)
        m.withColumn("n_prev", count(lit(1)).over(w))
          .withColumn("avg_prev",
            round(sum(col("cnt")).over(w).cast("double")
              / col("n_prev").cast("double"), 8))
          .filter(col("n_prev") >= 12)
          .withColumn("ratio",
            round(col("cnt").cast("double") / col("avg_prev"), 8))
          .orderBy(col("ratio").desc, col("et"), col("hr"))
          .limit(50)
          .select(col("et"), col("hr"), col("cnt"), col("n_prev"),
            col("avg_prev"), col("ratio"))
      },
      oracle = Some("""
        WITH m AS (
          SELECT event_type AS et, date_trunc('hour', ts) AS hr,
            count(*) AS cnt
          FROM events GROUP BY 1, 2),
        m2 AS (
          SELECT *, epoch_us(hr) // 3600000000 AS hrn FROM m),
        wnd AS (
          SELECT et, hr, cnt,
            count(*) OVER w AS n_prev,
            round(CAST(sum(cnt) OVER w AS DOUBLE)
              / CAST(count(*) OVER w AS DOUBLE), 8) AS avg_prev
          FROM m2
          WINDOW w AS (PARTITION BY et ORDER BY hrn
            RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
        SELECT et, hr, cnt, n_prev, avg_prev,
          round(CAST(cnt AS DOUBLE) / avg_prev, 8) AS ratio
        FROM wnd WHERE n_prev >= 12
        ORDER BY ratio DESC, et, hr LIMIT 50""")),

    "q124_regex_battery" -> Q(
      // Regex scalar surface over real document text: extract (first
      // digit run, nullable normalized), count-all, replace-all (md5'd to
      // keep the row narrow), capitalized-word extract, and rlike —
      // Java-regex and RE2 agree on these ASCII classes by construction.
      build = (s, dir) =>
        table(s, dir, "documents")
          .filter(col("doc_id") % 25 === 0)
          .select(col("doc_id"),
            coalesce(nullif(regexp_extract(col("text"), "[0-9]+", 0),
              lit("")), lit("none")).as("first_num"),
            regexp_count(col("text"), lit("[0-9]+")).as("n_digit_runs"),
            md5(regexp_replace(col("text"), "[0-9]+", "#")).as("digits_masked"),
            coalesce(nullif(regexp_extract(col("text"), "[A-Z][a-z]+", 0),
              lit("")), lit("none")).as("first_cap"),
            col("text").rlike("ing ").cast("int").as("has_ing"))
          .orderBy(col("doc_id")),
      oracle = Some("""
        SELECT doc_id,
          coalesce(nullif(regexp_extract(text, '[0-9]+', 0), ''), 'none')
            AS first_num,
          CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT)
            AS n_digit_runs,
          md5(regexp_replace(text, '[0-9]+', '#', 'g')) AS digits_masked,
          coalesce(nullif(regexp_extract(text, '[A-Z][a-z]+', 0), ''), 'none')
            AS first_cap,
          CAST(regexp_matches(text, 'ing ') AS INT) AS has_ing
        FROM documents
        WHERE doc_id % 25 = 0
        ORDER BY doc_id""")),

    "q125_grouping_sets" -> Q(
      // Arbitrary GROUPING SETS — the general form rollup (q37) and cube
      // (q42) specialize: region totals, region×nation detail, and the
      // grand total in ONE pass over the star join (Spark expands sets
      // into a single Expand+Aggregate, not three scans). Dims are
      // NULL-free so coalesce placeholders are unambiguous.
      build = (s, dir) => {
        table(s, dir, "orders")
          .join(table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(table(s, dir, "nation"),
            col("c_nationkey") === col("n_nationkey"))
          .join(table(s, dir, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .createOrReplaceTempView("gs_star")
        s.sql(s"""
          SELECT coalesce(r_name, '(all)') AS region,
            coalesce(n_name, '(all)') AS nation,
            ${sqlMsum("o_totalprice")} AS revenue,
            count(*) AS n_orders
          FROM gs_star
          GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
          ORDER BY region, nation""")
      },
      oracle = Some(s"""
        SELECT coalesce(r_name, '(all)') AS region,
          coalesce(n_name, '(all)') AS nation,
          ${sqlMsum("o_totalprice")} AS revenue,
          count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
        ORDER BY region, nation""")),

    "q126_seasonality" -> Q(
      // Day-of-week seasonal index of order revenue: each dow's mean
      // daily revenue over the global mean (index 1.0 = no seasonality).
      // Daily totals first, then two bounded aggregations; the index is
      // one fixed-shape division snapped to 8 decimals.
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(msum(col("o_totalprice")).as("day_rev"))
          .withColumn("dow", dayofweek(col("day")).cast("long"))
        val byDow = daily.groupBy(col("dow"))
          .agg(count(lit(1)).as("n_days"), dsum(col("day_rev")).as("dow_rev"))
          .withColumn("dow_avg",
            round(col("dow_rev") / col("n_days").cast("double"), 6))
        val overall = daily.agg(
          (dsum(col("day_rev")) / count(lit(1)).cast("double")).as("g_avg"))
        byDow.crossJoin(broadcast(overall))
          .select(col("dow"), col("n_days"), col("dow_avg"),
            round(col("dow_avg") / col("g_avg"), 8).as("seasonal_index"))
          .orderBy(col("dow"))
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
            ${sqlMsum("o_totalprice")} AS day_rev
          FROM orders GROUP BY 1),
        by_dow AS (
          SELECT CAST(dayofweek(day) + 1 AS BIGINT) AS dow,
            count(*) AS n_days,
            round(${sqlDsum("day_rev")} / CAST(count(*) AS DOUBLE), 6)
              AS dow_avg
          FROM daily GROUP BY 1),
        overall AS (
          SELECT ${sqlDsum("day_rev")} / CAST(count(*) AS DOUBLE) AS g_avg
          FROM daily)
        SELECT dow, n_days, dow_avg,
          round(dow_avg / g_avg, 8) AS seasonal_index
        FROM by_dow CROSS JOIN overall
        ORDER BY dow""")),

    "q127_hll_cumulative" -> Q(
      // Cumulative distinct-users-to-date via HLL register rollup: daily
      // sketches merge into an exact running sketch per day WITHOUT
      // re-reading raw events — the time-travel property that justifies
      // storing sketches at all (a year of daily sketches answers any
      // as-of-date distinct question). The day×register triangular merge
      // runs over the BOUNDED sketch table (days × 256 registers), never
      // the event log; the exact cumulative count rides along as audit.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
          .select(col("ts").cast("date").as("day"),
            col("user_id").as("key"))
        val daily = Hll.sketch(ev, Seq("day"), "key")
        val days = daily.select(col("day")).distinct()
        // as-of merge: for target day D, max rho per register over all
        // source days <= D (a bounded days x regs x days triangle)
        val cum = days.as("g").join(daily.as("s"),
            col("s.day") <= col("g.day"))
          .groupBy(col("g.day").as("day"), col("s.reg").as("reg"))
          .agg(max(col("s.rho")).as("rho"))
        val est = Hll.estimate(cum, Seq("day"))
        val firstDay = ev.groupBy(col("key")).agg(min(col("day")).as("fd"))
        val exactCum = days.as("g2").join(firstDay,
            col("fd") <= col("g2.day"))
          .groupBy(col("g2.day").as("day"))
          .agg(count(lit(1)).as("n_exact_cum"))
        est.join(exactCum, "day")
          .select(col("day"), col("n_exact_cum"), col("occupied"),
            col("zeros"), col("s_scaled"), col("hll_est"))
          .orderBy(col("day"))
      },
      oracle = Some(s"""
        WITH ${Hll.sqlSketchCtes(
          "SELECT CAST(ts AS DATE) AS g, user_id AS key FROM events")},
        days AS (SELECT DISTINCT g AS day FROM hll_regs),
        cum AS (
          SELECT d.day AS g, s.reg, max(s.rho) AS rho
          FROM days d JOIN hll_regs s ON s.g <= d.day
          GROUP BY 1, 2),
        cum_agg AS (
          SELECT g, CAST(count(*) AS BIGINT) AS occupied,
            CAST(sum(${1L << 53} >> rho) AS BIGINT) AS s_occ
          FROM cum GROUP BY g),
        cum_est AS (
          SELECT g, occupied, (256 - occupied) AS zeros,
            s_occ + (256 - occupied) * ${1L << 53} AS s_scaled,
            round(CASE
              WHEN 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0
                   / CAST(s_occ + (256 - occupied) * ${1L << 53} AS DOUBLE) <= 640.0
               AND (256 - occupied) > 0
              THEN 256.0 * ln(256.0 / CAST(256 - occupied AS DOUBLE))
              ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0
                   / CAST(s_occ + (256 - occupied) * ${1L << 53} AS DOUBLE)
            END, 4) AS hll_est
          FROM cum_agg),
        fd AS (SELECT user_id, min(CAST(ts AS DATE)) AS fd FROM events GROUP BY 1),
        exact_cum AS (
          SELECT d.day, count(*) AS n_exact_cum
          FROM days d JOIN fd ON fd.fd <= d.day GROUP BY 1)
        SELECT e.g AS day, x.n_exact_cum, e.occupied, e.zeros, e.s_scaled,
          e.hll_est
        FROM cum_est e JOIN exact_cum x ON e.g = x.day
        ORDER BY day""")),

    "q128_time_weighted_avg" -> Q(
      // Duration-weighted mean of an irregular time series: each event's
      // value holds until the user's next event, so the mean weights each
      // value by its holding time (the correct average for sampled gauges
      // — a plain AVG over-counts busy periods). One lead window per
      // user; weights are exact integer microseconds, the value×weight
      // products accumulate in exact decimal, one final division.
      build = (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        table(s, dir, "events")
          .withColumn("next_us",
            lead(unix_micros(col("ts")), 1).over(w))
          .filter(col("next_us").isNotNull)
          .withColumn("w_us", col("next_us") - unix_micros(col("ts")))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("w_us")).as("span_us"),
            // value in exact CENTS so the weighted sum is a scale-0
            // integer the portable split-cast can take: the direct
            // decimal(38,2)→double cast was the q174 class (engine-
            // dependent rounding past 2^53 — flushed by lint rule 8)
            sum(col("w_us").cast("decimal(20,0)")
              * (col("value").cast("decimal(12,2)") * lit(100))
                .cast("decimal(14,0)"))
              .cast("decimal(38,0)").as("swv100"))
          .select(col("user_id"), col("n_intervals"), col("span_us"),
            round(portableDoubleSigned(col("swv100")) / 100.0
              / col("span_us").cast("double"), 8).as("tw_avg"),
            )
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH iv AS (
          SELECT user_id, value, epoch_us(ts) AS us,
            lead(epoch_us(ts)) OVER (
              PARTITION BY user_id ORDER BY ts, event_id) AS next_us
          FROM events),
        wd AS (
          SELECT user_id, (next_us - us) AS w_us, value
          FROM iv WHERE next_us IS NOT NULL)
        SELECT user_id, count(*) AS n_intervals,
          CAST(sum(w_us) AS BIGINT) AS span_us,
          round(${sqlPortableDoubleSigned(
            """CAST(sum(CAST(w_us AS DECIMAL(20,0))
              * CAST(CAST((CASE WHEN isfinite(value) THEN value END)
                  AS DECIMAL(12,2)) * 100 AS DECIMAL(14,0)))
              AS DECIMAL(38,0))""")} / 100.0
            / CAST(CAST(sum(w_us) AS BIGINT) AS DOUBLE), 8) AS tw_avg
        FROM wd GROUP BY user_id
        ORDER BY user_id""")),

    "q129_split_leakage" -> Q(
      // Train/val LEAKAGE audit: near-duplicate pairs (q27's exact
      // word-3-gram Jaccard >= 0.6 operator) that straddle the q51 hash
      // split — val documents with a near-twin in train inflate eval
      // scores exactly like benchmark contamination. Reports the pair
      // census by (split_a, split_b) plus the distinct count of
      // compromised val docs. The split is a scan-side hash; only the
      // bounded pair table shuffles.
      build = (s, dir) => {
        val docs = Sampling.hashSplit(
          table(s, dir, "documents"), "doc_id", valBuckets = 10, outOf = 100)
        val splits = docs.select(col("doc_id"), col("split"))
        val pairs = NearDup.jaccardPairs(docs, "doc_id", "text")
        val tagged = pairs
          .join(splits.select(col("doc_id").as("id_a"),
            col("split").as("split_a")), "id_a")
          .join(splits.select(col("doc_id").as("id_b"),
            col("split").as("split_b")), "id_b")
        val census = tagged
          .groupBy(col("split_a"), col("split_b"))
          .agg(count(lit(1)).as("n_pairs"))
        val leaked = tagged
          .filter(col("split_a") =!= col("split_b"))
          .select(when(col("split_a") === "val", col("id_a"))
            .otherwise(col("id_b")).as("val_doc"))
          .agg(countDistinct(col("val_doc")).as("n"))
        census
          .select(col("split_a"), col("split_b"), col("n_pairs"))
          .unionByName(leaked.select(lit("leaked").as("split_a"),
            lit("val_docs").as("split_b"), col("n").as("n_pairs")))
          .orderBy(col("split_a"), col("split_b"))
      },
      oracle = Some(s"""
        WITH $ngramPairCtes,
        np AS (SELECT id_a, id_b FROM pairs WHERE jaccard >= 0.6),
        sp AS (
          SELECT doc_id,
            CASE WHEN ${Sampling.sqlHashBucket("doc_id", 100)} < 10
                 THEN 'val' ELSE 'train' END AS split
          FROM documents),
        tagged AS (
          SELECT a.split AS split_a, b.split AS split_b, np.id_a, np.id_b
          FROM np
          JOIN sp a ON np.id_a = a.doc_id
          JOIN sp b ON np.id_b = b.doc_id)
        SELECT split_a, split_b, count(*) AS n_pairs
        FROM tagged GROUP BY 1, 2
        UNION ALL
        SELECT 'leaked', 'val_docs', count(DISTINCT
          CASE WHEN split_a = 'val' THEN id_a ELSE id_b END)
        FROM tagged WHERE split_a <> split_b
        ORDER BY split_a, split_b""")),

    "q130_stream_hll" -> Q(
      // Streaming HLL: per-day distinct-user estimates whose registers
      // were built by a Structured Streaming run (watermarked windowed
      // max — state bounded by days x 256 registers, NOT key
      // cardinality), then estimated in batch over the emitted register
      // table. The oracle sketches the raw table directly over the same
      // emission horizon (append mode emits a day once its end passes
      // the terminal watermark, so the final open day is pending — q76's
      // convention): hash-equality proves streamed register emission ≡
      // the batch sketch, closing the sketch family's streaming twin.
      build = (s, dir) => {
        val est = graft.streaming.BoundedRuns.streamedHllDaily(s, dir)
        val exact = table(s, dir, "events")
          .groupBy(col("ts").cast("date").as("day"))
          .agg(countDistinct(col("user_id")).as("n_exact"))
        est.join(exact, "day")
          .select(col("day"), col("n_exact"), col("occupied"),
            col("zeros"), col("s_scaled"), col("hll_est"))
          .orderBy(col("day"))
      },
      oracle = Some(s"""
        WITH ${Hll.sqlSketchCtes(
          """SELECT CAST(ts AS DATE) AS g, user_id AS key FROM events
             WHERE CAST(ts AS DATE) + INTERVAL '1 day'
                   <= (SELECT max(ts) - INTERVAL '2 hours' FROM events)""")},
        ex AS (
          SELECT CAST(ts AS DATE) AS g, count(DISTINCT user_id) AS n_exact
          FROM events GROUP BY 1)
        SELECT e.g AS day, x.n_exact, e.occupied, e.zeros, e.s_scaled,
          e.hll_est
        FROM hll_est e JOIN ex x ON e.g = x.g
        ORDER BY day""")),

    "q131_growth_accounting" -> Q(
      // Daily growth accounting: every active user classified as new
      // (first day), retained (active yesterday), or resurrected (a
      // comeback), plus yesterday's actives who went silent (churned) —
      // the DAU decomposition behind every growth dashboard. One distinct
      // (user, day) pass, one per-user window for first/lag/lead, two
      // bounded per-day aggregations.
      build = (s, dir) => {
        val act = table(s, dir, "events")
          .select(col("user_id").as("u"), col("ts").cast("date").as("day"))
          .distinct()
        val w = Window.partitionBy(col("u")).orderBy(col("day"))
        val cls = act
          .withColumn("first_day", min(col("day")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("prev_day", lag(col("day"), 1).over(w))
          .withColumn("next_day", lead(col("day"), 1).over(w))
        val daily = cls.groupBy(col("day"))
          .agg(count(lit(1)).as("dau"),
            sum(when(col("day") === col("first_day"), 1).otherwise(0))
              .as("n_new"),
            sum(when(col("prev_day") === date_sub(col("day"), 1), 1)
              .otherwise(0)).as("n_retained"),
            sum(when(col("day") =!= col("first_day") &&
              (col("prev_day").isNull ||
                col("prev_day") < date_sub(col("day"), 1)), 1).otherwise(0))
              .as("n_resurrected"))
        val maxDay = act.agg(max(col("day")).as("max_day"))
        val churn = cls
          .filter(col("next_day").isNull ||
            col("next_day") > date_add(col("day"), 1))
          .select(date_add(col("day"), 1).as("day"))
          .crossJoin(broadcast(maxDay))
          .filter(col("day") <= col("max_day"))
          .groupBy(col("day")).agg(count(lit(1)).as("n_churned"))
        daily.join(churn, Seq("day"), "left")
          .select(col("day"), col("dau"), col("n_new"), col("n_retained"),
            col("n_resurrected"),
            coalesce(col("n_churned"), lit(0L)).as("n_churned"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH act AS (
          SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
        cls AS (
          SELECT u, day,
            min(day) OVER (PARTITION BY u ORDER BY day
              ROWS UNBOUNDED PRECEDING) AS first_day,
            lag(day) OVER (PARTITION BY u ORDER BY day) AS prev_day,
            lead(day) OVER (PARTITION BY u ORDER BY day) AS next_day
          FROM act),
        daily AS (
          SELECT day, count(*) AS dau,
            CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
              AS n_new,
            CAST(sum(CASE WHEN prev_day = day - INTERVAL 1 DAY
              THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
            CAST(sum(CASE WHEN day <> first_day AND (prev_day IS NULL
              OR prev_day < day - INTERVAL 1 DAY) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_resurrected
          FROM cls GROUP BY day),
        churn AS (
          SELECT day + INTERVAL 1 DAY AS day, count(*) AS n_churned
          FROM cls
          WHERE (next_day IS NULL OR next_day > day + INTERVAL 1 DAY)
            AND day + INTERVAL 1 DAY <= (SELECT max(day) FROM act)
          GROUP BY 1)
        SELECT d.day, d.dau, d.n_new, d.n_retained, d.n_resurrected,
          CAST(coalesce(c.n_churned, 0) AS BIGINT) AS n_churned
        FROM daily d LEFT JOIN churn c ON CAST(c.day AS DATE) = d.day
        ORDER BY d.day""")),

    "q132_dup_cluster_sizes" -> Q(
      // Duplicate-cluster size distribution: how duplicated IS the
      // corpus — q52's connected components collapsed to a (cluster_size,
      // n_clusters, n_docs) histogram, the one-line answer to "what does
      // near-dedup save us". Cluster histogram is a two-level bounded
      // aggregation over the components output.
      build = (s, dir) => {
        val docs = table(s, dir, "documents")
        val pairs = NearDup.minhashNearDupPairs(docs, "doc_id", "text",
          n = 3, minJ = 0.6, numHashes = 192, bandRows = 3)
        Components.connectedComponents(docs, "doc_id", pairs)
          .groupBy(col("comp")).agg(count(lit(1)).as("sz"))
          .groupBy(col("sz").as("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("sz")).cast("long").as("n_docs"))
          .orderBy(col("cluster_size"))
      },
      oracle = Some(s"""
        WITH RECURSIVE $ngramPairCtes,
        sym AS MATERIALIZED (
          SELECT id_a AS src, id_b AS dst FROM pairs WHERE jaccard >= 0.6
          UNION ALL
          SELECT id_b, id_a FROM pairs WHERE jaccard >= 0.6),
        walk(id, reach) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT w.id, s.dst FROM walk w JOIN sym s ON s.src = w.reach),
        comp AS (
          SELECT id, min(reach) AS comp FROM walk GROUP BY id),
        sizes AS (
          SELECT comp, count(*) AS sz FROM comp GROUP BY comp)
        SELECT sz AS cluster_size, count(*) AS n_clusters,
          CAST(sum(sz) AS BIGINT) AS n_docs
        FROM sizes GROUP BY sz ORDER BY cluster_size""")),

    "q133_winnowing_boilerplate" -> Q(
      // Winnowing (MOSS) fingerprints: the top cross-document shared
      // fingerprints — boilerplate/partial-overlap detection with the
      // guarantee that any shared >= k+w-1-token run yields a shared
      // fingerprint (MinHash can't see local overlap, digests can't see
      // partial). Integer-packed min-with-rightmost-tie selection, no
      // floats; one per-doc window pass + a bounded fingerprint agg.
      build = (s, dir) =>
        Winnowing.fingerprints(table(s, dir, "documents"),
            "doc_id", "text", k = 3, w = 4)
          .groupBy(col("fp")).agg(countDistinct(col("id")).as("n_docs"))
          .filter(col("n_docs") >= 2)
          .orderBy(col("n_docs").desc, col("fp")).limit(20),
      oracle = Some(s"""
        WITH ${Winnowing.sqlFingerprintCtes(
          "documents", "doc_id", "text", k = 3, w = 4)}
        SELECT fp, count(DISTINCT id) AS n_docs
        FROM win_fp GROUP BY fp HAVING count(DISTINCT id) >= 2
        ORDER BY n_docs DESC, fp LIMIT 20""")),

    "q134_winnowing_pairs" -> Q(
      // MOSS match step: document pairs sharing >= 3 winnowing
      // fingerprints — LOCAL overlap detection (a copied paragraph in
      // otherwise-different documents), the case MinHash whole-doc
      // similarity structurally misses. Stop-fingerprints (doc-freq >
      // 50) are dropped before the fp-keyed self-join, the cap that
      // bounds posting expansion at scale.
      build = (s, dir) =>
        Winnowing.overlapPairs(
            Winnowing.fingerprints(table(s, dir, "documents"),
              "doc_id", "text", k = 3, w = 4),
            minShared = 3L, maxDf = 50L)
          .orderBy(col("id_a"), col("id_b")),
      oracle = Some(s"""
        WITH ${Winnowing.sqlFingerprintCtes(
          "documents", "doc_id", "text", k = 3, w = 4)},
        ${Winnowing.sqlOverlapCtes(minShared = 3L, maxDf = 50L)}
        SELECT id_a, id_b, n_shared FROM win_pairs
        ORDER BY id_a, id_b""")),

    "q135_embedding_qc" -> Q(
      // Embedding-table QC battery per label: vector counts, exact
      // duplicate vectors (distinct on the float array — bit equality),
      // NaN-poisoned vectors, zero-norm vectors (cosine would divide by
      // zero), and dimension bounds. The checks a similarity index MUST
      // run before building; all integer counts, one aggregation pass.
      build = (s, dir) =>
        table(s, dir, "embeddings")
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            countDistinct(col("embedding")).as("n_distinct"),
            sum(when(expr("exists(embedding, x -> isnan(x))"), 1)
              .otherwise(0)).cast("long").as("n_nan"),
            sum(when(expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
              "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))") === 0.0,
              1).otherwise(0)).cast("long").as("n_zero_norm"),
            min(size(col("embedding"))).as("dim_min"),
            max(size(col("embedding"))).as("dim_max"))
          .orderBy(col("label")),
      oracle = Some("""
        SELECT label, count(*) AS n_vecs,
          count(DISTINCT embedding) AS n_distinct,
          CAST(sum(CASE WHEN len(list_filter(embedding,
            x -> isnan(x))) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
          CAST(sum(CASE WHEN list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0.0
            THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
          CAST(min(len(embedding)) AS INT) AS dim_min,
          CAST(max(len(embedding)) AS INT) AS dim_max
        FROM embeddings
        GROUP BY label
        ORDER BY label""")),

    "q136_stickiness" -> Q(
      // DAU / trailing-7-day-WAU stickiness per day — the engagement
      // ratio (1/7 = everyone visits weekly once, 1.0 = daily habit).
      // Sliding distinct counts come from a bounded day-grid × activity
      // band join (each activity row lands in ≤7 day windows), never a
      // re-scan of raw events per window; one distinct pass feeds both.
      build = (s, dir) => {
        val act = table(s, dir, "events")
          .select(col("user_id").as("u"), col("ts").cast("date").as("day"))
          .distinct()
        val days = act.select(col("day")).distinct()
        val dau = act.groupBy(col("day"))
          .agg(countDistinct(col("u")).as("dau"))
        val wau = days.as("g").join(act.as("a"),
            col("a.day") <= col("g.day") &&
              col("a.day") >= date_sub(col("g.day"), 6))
          .groupBy(col("g.day").as("day"))
          .agg(countDistinct(col("a.u")).as("wau"))
        dau.join(wau, "day")
          .select(col("day"), col("dau"), col("wau"),
            round(col("dau").cast("double") / col("wau").cast("double"), 8)
              .as("stickiness"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH act AS (
          SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
        days AS (SELECT DISTINCT day FROM act),
        dau AS (SELECT day, count(DISTINCT u) AS dau FROM act GROUP BY day),
        wau AS (
          SELECT g.day, count(DISTINCT a.u) AS wau
          FROM days g JOIN act a
            ON a.day <= g.day AND a.day >= g.day - INTERVAL 6 DAY
          GROUP BY g.day)
        SELECT d.day, d.dau, w.wau,
          round(CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 8)
            AS stickiness
        FROM dau d JOIN wau w ON d.day = w.day
        ORDER BY d.day""")),

    "q137_weighted_sample" -> Q(
      // Derandomized weighted sampling without replacement (Efraimidis-
      // Spirakis A-Res keys over the portable hash): 50 documents drawn
      // proportional to length — the importance-sampling primitive for
      // mixture construction, reproducible across engines/runs/layouts.
      // Scan-side key expression + one distributed top-k; no RNG state.
      build = (s, dir) =>
        Sampling.weightedSample(
            table(s, dir, "documents").select(col("doc_id"), col("n_chars")),
            "doc_id", "n_chars", k = 50)
          .select(col("doc_id"), col("n_chars"), col("es_key"))
          .orderBy(col("es_key"), col("doc_id")),
      oracle = Some(s"""
        SELECT doc_id, n_chars,
          ${Sampling.sqlEsKey("doc_id", "n_chars")} AS es_key
        FROM documents
        WHERE n_chars > 0
        ORDER BY es_key, doc_id
        LIMIT 50""")),

    "q138_ema_smoothing" -> Q(
      // Exponentially-weighted daily revenue (half-life = 1 day) per
      // priority — trend smoothing made bit-reproducible: the decay
      // 2^-k comes from an INTEGER shift (exact double, no libm pow),
      // each term is snapped to 8 decimals, and the weighted sum
      // accumulates in exact decimal (window cap 30 days; 2^-30 ~ 1e-9
      // tail). Join shape: the 31 discrete lag offsets are EXPLODED on
      // the contributing side and the pairing is an equi-join on
      // (prio, dayn) — a self-join on prio alone (5 distinct keys) with
      // the band as a residual filter evaluates |days|^2 pairs per
      // priority through 5-way parallelism, the low-cardinality-key
      // cliff that killed this query's first formulation (r8: 3.3 ->
      // 2.0 s at sf0.01 — the residual is shuffle fixed cost — and the
      // equi-key is (prio, dayn), so parallelism scales with days, not
      // priorities).
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("prio"),
            col("o_orderdate").cast("date").as("day"))
          .agg(msum(col("o_totalprice")).as("day_rev"))
          .withColumn("dayn",
            datediff(col("day"), lit("1970-01-01").cast("date")))
        // each source day contributes to target days dayn+0 .. dayn+30
        val spread = daily
          .select(col("prio"), col("dayn"), col("day_rev").as("rev"),
            explode(sequence(lit(0), lit(30))).as("k"))
          .select(col("prio"), (col("dayn") + col("k")).as("dayn"),
            col("k"), col("rev"))
        val terms = daily.select(col("prio"), col("dayn"), col("day"))
          .join(spread, Seq("prio", "dayn"))
          .withColumn("decay",
            lit(1.0) / call_function("shiftleft", lit(1L),
              col("k").cast("int")).cast("double"))
        terms
          .groupBy(col("prio"), col("day"))
          .agg(
            round(sum(round(col("rev") * col("decay"), 8)
              .cast("decimal(24,8)")), 4).cast("double").as("ema_num"),
            round(sum(round(col("decay"), 8).cast("decimal(12,8)")), 8)
              .cast("double").as("ema_den"))
          // floor-snap, not round(·,4): the quotient is a raw double and
          // round() diverges on half-boundaries (Spark rounds the
          // shortest decimal rendering, DuckDB the binary value — 319
          // rows flipped at the r10 sf1 sweep's 10x magnitudes);
          // floor(x·1e4+0.5) is the same IEEE sequence in both engines
          .withColumn("ema",
            floor(col("ema_num") / col("ema_den") * 1e4 + 0.5) / 1e4)
          .select(col("prio"), col("day"), col("ema"))
          .orderBy(col("prio"), col("day"))
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
            ${sqlMsum("o_totalprice")} AS day_rev,
            datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS dayn
          FROM orders GROUP BY 1, 2),
        terms AS (
          SELECT a.prio, a.day, (a.dayn - b.dayn) AS k, b.day_rev AS rev,
            1.0 / CAST((CAST(1 AS BIGINT) << (a.dayn - b.dayn)) AS DOUBLE)
              AS decay
          FROM daily a JOIN daily b
            ON a.prio = b.prio AND b.dayn <= a.dayn
              AND b.dayn >= a.dayn - 30)
        SELECT prio, day,
          floor(
            CAST(round(sum(CAST(round(rev * decay, 8) AS DECIMAL(24,8))), 4)
              AS DOUBLE)
            / CAST(round(sum(CAST(round(decay, 8) AS DECIMAL(12,8))), 8)
              AS DOUBLE) * 1e4 + 0.5) / 1e4 AS ema
        FROM terms GROUP BY prio, day
        ORDER BY prio, day""")),

    "q139_theil_sen" -> Q(
      // Robust trend per priority: Theil-Sen slope (median of pairwise
      // monthly-revenue slopes — 29% breakdown vs OLS's zero) and the
      // Mann-Kendall S statistic (pure sign counts — INTEGER exact).
      // Pairs are formed over the bounded monthly table (~80 months), so
      // the quadratic is in months, never in orders; each slope is one
      // fixed-shape division snapped to 8 decimals, the median is the
      // established type-7 percentile.
      build = (s, dir) => {
        val monthly = table(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("prio"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .as("mn"))
          .agg(msum(col("o_totalprice")).as("rev"))
        val pairs = monthly.as("a").join(monthly.as("b"),
            col("a.prio") === col("b.prio") && col("a.mn") < col("b.mn"))
          .select(col("a.prio").as("prio"),
            round((col("b.rev") - col("a.rev")) /
              (col("b.mn") - col("a.mn")).cast("double"), 8).as("slope"),
            signum(col("b.rev") - col("a.rev")).cast("long").as("sgn"))
        pairs.groupBy(col("prio"))
          .agg(count(lit(1)).as("n_pairs"),
            expr("percentile(slope, 0.5D)").as("ts_slope"),
            sum(col("sgn")).as("mk_s"))
          .withColumn("ts_slope", round(col("ts_slope"), 6))
          .orderBy(col("prio"))
      },
      oracle = Some(s"""
        WITH monthly AS (
          SELECT o_orderpriority AS prio,
            year(o_orderdate) * 12 + month(o_orderdate) AS mn,
            ${sqlMsum("o_totalprice")} AS rev
          FROM orders GROUP BY 1, 2),
        pairs AS (
          SELECT a.prio,
            round((b.rev - a.rev) / CAST(b.mn - a.mn AS DOUBLE), 8) AS slope,
            CAST(sign(b.rev - a.rev) AS BIGINT) AS sgn
          FROM monthly a JOIN monthly b
            ON a.prio = b.prio AND a.mn < b.mn)
        SELECT prio, count(*) AS n_pairs,
          round(quantile_cont(slope, 0.5), 6) AS ts_slope,
          CAST(sum(sgn) AS BIGINT) AS mk_s
        FROM pairs GROUP BY prio
        ORDER BY prio""")),

    "q140_abc_classification" -> Q(
      // ABC / Pareto classification of parts by revenue: running share
      // of the exact-decimal total assigns A (first 80%), B (next 15%),
      // C (tail) — the inventory-analysis classic. Rank and running sum
      // ride one window over the bounded per-part aggregate; the share
      // is exact decimal / exact decimal, one division snapped to 8.
      build = (s, dir) => {
        val perPart = table(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("part"))
          .agg(msum(col("l_extendedprice")).as("rev"))
        val tot = perPart.agg(dsum(col("rev")).as("tot"))
        // distributed prefix sum — a global Window.orderBy here would
        // sort all parts on ONE executor; PrefixSum buckets by exact
        // quantiles and composes bucket-local windows + offsets
        PrefixSum.running(perPart, "rev", "part", "rev", descending = true)
          .withColumn("cum", round(col("cum"), 2).cast("double"))
          .crossJoin(broadcast(tot))
          .withColumn("cum_share", round(col("cum") / col("tot"), 8))
          .withColumn("abc_class",
            when(col("cum_share") <= 0.80, "A")
              .when(col("cum_share") <= 0.95, "B").otherwise("C"))
          .groupBy(col("abc_class"))
          .agg(count(lit(1)).as("n_parts"), dsum(col("rev")).as("class_rev"))
          .orderBy(col("abc_class"))
      },
      oracle = Some(s"""
        WITH per_part AS (
          SELECT l_partkey AS part, ${sqlMsum("l_extendedprice")} AS rev
          FROM lineitem GROUP BY 1),
        tot AS (SELECT ${sqlDsum("rev")} AS tot FROM per_part),
        ranked AS (
          SELECT part, rev,
            CAST(round(sum(CAST(rev AS DECIMAL(18,2))) OVER (
              ORDER BY rev DESC, part ROWS UNBOUNDED PRECEDING), 2)
              AS DOUBLE) AS cum
          FROM per_part),
        classed AS (
          SELECT part, rev,
            CASE WHEN round(cum / tot, 8) <= 0.80 THEN 'A'
                 WHEN round(cum / tot, 8) <= 0.95 THEN 'B'
                 ELSE 'C' END AS abc_class
          FROM ranked CROSS JOIN tot)
        SELECT abc_class, count(*) AS n_parts,
          ${sqlDsum("rev")} AS class_rev
        FROM classed GROUP BY abc_class
        ORDER BY abc_class""")),

    "q141_gini_concentration" -> Q(
      // Gini coefficient of customer revenue concentration (0 = equal,
      // 1 = winner-take-all) via the rank formulation G = 2·Σ(i·x_i) /
      // (n·Σx) − (n+1)/n over ascending ranks — corpus/revenue
      // concentration in ONE window + one aggregation over the bounded
      // per-customer frame. Σ(i·x_i) accumulates exactly in decimal
      // (rank is an exact integer, x snapped to 2 decimals).
      build = (s, dir) => {
        // observation contract (r9): concentration is over IDENTIFIED
        // customers' OBSERVED totals — a NULL custkey is nobody and a
        // NULL price is not revenue (a NULL rank key would also shift
        // every other rank differently across engines)
        val perCust = table(s, dir, "orders")
          .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
          .groupBy(col("o_custkey").as("cust"))
          .agg(msum(col("o_totalprice")).as("rev"))
        // distributed rank (PrefixSum.rnk), not a single-partition window
        val ranked = PrefixSum.running(perCust, "rev", "cust", "rev",
            descending = false)
          .withColumn("i", col("rnk"))
        ranked.agg(
            count(lit(1)).as("n_custs"),
            dsum(col("rev")).as("total_rev"),
            // exact CENTS (scale-0) so the rank-weighted sum goes
            // through the portable split-cast — Σ(i·x) reaches n²·max(x)
            // and the direct decimal→double cast was the q174 class
            // (lint rule 8)
            sum(col("i").cast("decimal(10,0)")
              * (col("rev").cast("decimal(18,2)") * lit(100))
                .cast("decimal(20,0)"))
              .cast("decimal(38,0)").as("weighted100"))
          .withColumn("gini", round(
            lit(2.0) * (portableDouble(col("weighted100")) / 100.0)
              / (col("n_custs").cast("double") * col("total_rev"))
              - (col("n_custs") + 1).cast("double")
                / col("n_custs").cast("double"), 8))
          .select(col("n_custs"), col("total_rev"), col("gini"))
      },
      oracle = Some(s"""
        WITH per_cust AS (
          SELECT o_custkey AS cust, ${sqlMsum("o_totalprice")} AS rev
          FROM orders
          WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
          GROUP BY 1),
        ranked AS (
          SELECT rev, row_number() OVER (ORDER BY rev, cust) AS i
          FROM per_cust)
        SELECT count(*) AS n_custs,
          ${sqlDsum("rev")} AS total_rev,
          round(2.0 * (${sqlPortableDouble(
            """CAST(sum(CAST(i AS DECIMAL(14,0))
              * CAST(CAST(rev AS DECIMAL(18,2)) * 100 AS DECIMAL(20,0)))
              AS DECIMAL(38,0))""")} / 100.0)
            / (CAST(count(*) AS DOUBLE) * ${sqlDsum("rev")})
            - CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE), 8)
            AS gini
        FROM ranked""")),

    "q142_readability" -> Q(
      // Flesch reading-ease over the English corpus slice — the classic
      // cheap readability filter for training-data curation: syllables by
      // the vowel-group heuristic, sentences by terminal-punctuation
      // runs, banded into the standard difficulty classes. All counts are
      // exact integers (ASCII regex classes, Java and RE2 agree); the
      // score is ONE fixed-shape IEEE expression per doc snapped to 6
      // decimals, then exact-decimal averaged per band. Pure scan →
      // bounded aggregation: embarrassingly parallel at any corpus size.
      build = (s, dir) => {
        val scored = table(s, dir, "documents")
          .filter(col("lang") === "en")
          .select(
            TextStats.tokenCount(col("text")).cast("long").as("w"),
            greatest(lit(1L),
              regexp_count(col("text"), lit("[.!?]+")).cast("long"))
              .as("sent"),
            regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
              .as("syl"))
          .withColumn("flesch", round(
            lit(206.835)
              - lit(1.015) * (col("w").cast("double") / col("sent").cast("double"))
              - lit(84.6) * (col("syl").cast("double") / col("w").cast("double")),
            6))
          .withColumn("band",
            when(col("flesch") >= 90, "very_easy")
              .when(col("flesch") >= 70, "easy")
              .when(col("flesch") >= 50, "medium")
              .when(col("flesch") >= 30, "hard")
              .otherwise("very_hard"))
        scored.groupBy(col("band"))
          .agg(count(lit(1)).as("n_docs"),
            round(dsum(col("flesch")) / count(lit(1)), 6).as("avg_flesch"),
            min(col("flesch")).as("min_flesch"),
            max(col("flesch")).as("max_flesch"))
          .orderBy(col("band"))
      },
      oracle = Some(s"""
        WITH scored AS (
          SELECT
            round(206.835
              - 1.015 * (CAST(w AS DOUBLE) / CAST(sent AS DOUBLE))
              - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)), 6) AS flesch
          FROM (
            SELECT
              len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS w,
              greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS sent,
              len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
            FROM documents WHERE lang = 'en')),
        banded AS (
          SELECT flesch,
            CASE WHEN flesch >= 90 THEN 'very_easy'
                 WHEN flesch >= 70 THEN 'easy'
                 WHEN flesch >= 50 THEN 'medium'
                 WHEN flesch >= 30 THEN 'hard'
                 ELSE 'very_hard' END AS band
          FROM scored)
        SELECT band, count(*) AS n_docs,
          round(${sqlDsum("flesch")} / count(*), 6) AS avg_flesch,
          min(flesch) AS min_flesch,
          max(flesch) AS max_flesch
        FROM banded
        GROUP BY band
        ORDER BY band""")),

    "q143_gap_interpolation" -> Q(
      // Time-series gap repair on the sparse URGENT-priority daily
      // revenue (about a quarter of spine days have no orders at this
      // slice): dense date spine → LOCF / NOCB carries → linear
      // interpolation between the bracketing observations, with the fill
      // method labeled per row. The carry windows are global BY DESIGN:
      // they run on the bounded per-day frame (one row per calendar day
      // after pre-aggregation, q41's precedent), never on fact rows — the
      // fact scan pre-aggregates so the shuffle carries days only.
      // Interpolation is one fixed-shape IEEE expression on exact inputs
      // (2-decimal revenue, integer day offsets) snapped to 6 decimals.
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(msum(col("o_totalprice")).as("rev"))
        val spine = daily
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(explode(sequence(col("d0"), col("d1"),
            expr("interval 1 day"))).as("day"))
        val wb = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wf = Window.orderBy(col("day"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        spine.join(daily, Seq("day"), "left")
          .withColumn("obs_day", when(col("rev").isNotNull, col("day")))
          .withColumn("prev_rev", last(col("rev"), ignoreNulls = true).over(wb))
          .withColumn("prev_day", last(col("obs_day"), ignoreNulls = true).over(wb))
          .withColumn("next_rev", first(col("rev"), ignoreNulls = true).over(wf))
          .withColumn("next_day", first(col("obs_day"), ignoreNulls = true).over(wf))
          .select(col("day"),
            col("rev").isNotNull.cast("int").as("observed"),
            when(col("rev").isNotNull, col("rev"))
              .when(col("prev_rev").isNotNull && col("next_rev").isNotNull,
                round(col("prev_rev") + (col("next_rev") - col("prev_rev"))
                  * (datediff(col("day"), col("prev_day")).cast("double")
                    / datediff(col("next_day"), col("prev_day")).cast("double")),
                  6))
              .otherwise(coalesce(col("prev_rev"), col("next_rev")))
              .as("filled"),
            when(col("rev").isNotNull, "observed")
              .when(col("prev_rev").isNotNull && col("next_rev").isNotNull,
                "interp")
              .when(col("prev_rev").isNotNull, "locf")
              .otherwise("nocb").as("method"))
          .orderBy(col("day"))
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
            ${sqlMsum("o_totalprice")} AS rev
          FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        spine AS (
          SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
            AS day
          FROM mm),
        j AS (
          SELECT s.day, d.rev FROM spine s LEFT JOIN daily d ON s.day = d.day),
        f AS (
          SELECT day, rev,
            last_value(rev IGNORE NULLS) OVER wb AS prev_rev,
            last_value(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS)
              OVER wb AS prev_day,
            first_value(rev IGNORE NULLS) OVER wf AS next_rev,
            first_value(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS)
              OVER wf AS next_day
          FROM j
          WINDOW
            wb AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            wf AS (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT day,
          CAST(rev IS NOT NULL AS INT) AS observed,
          CASE WHEN rev IS NOT NULL THEN rev
               WHEN prev_rev IS NOT NULL AND next_rev IS NOT NULL THEN
                 round(prev_rev + (next_rev - prev_rev)
                   * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                     / CAST(date_diff('day', prev_day, next_day) AS DOUBLE)), 6)
               ELSE coalesce(prev_rev, next_rev) END AS filled,
          CASE WHEN rev IS NOT NULL THEN 'observed'
               WHEN prev_rev IS NOT NULL AND next_rev IS NOT NULL THEN 'interp'
               WHEN prev_rev IS NOT NULL THEN 'locf'
               ELSE 'nocb' END AS method
        FROM f
        ORDER BY day""")),

    "q144_jaro_winkler_pairs" -> Q(
      // Entity-resolution fuzzy pairs over part names: blocking key =
      // (brand, first name token) — the classic ER pattern where the
      // blocking key comes from the entity itself, turning the quadratic
      // all-pairs into a bounded per-block equi-join — then the native
      // codegen'd graft_jaro_winkler scores candidates and >= 0.84
      // survives (exact-equal names excluded: those are q21's exact-dedup
      // business). The kernel is BIT-exact with DuckDB's
      // jaro_winkler_similarity (4000-pair fuzz-pinned), so the threshold
      // can never flip a row between engines. Scale path: candidate count
      // is sum of block^2, governed by blocking-key selectivity. The key
      // folds in a width-8 LENGTH BAND (length >> 3) as a second
      // dimension (r5 review): block populations grow linearly with data,
      // so in-block pairs grow quadratically — the band multiplies the
      // effective block count without touching the kernel. Standard ER
      // recall tradeoff: a matching pair straddling a band boundary is
      // dropped (same blocking both engines, so the oracle moves with
      // it); near-identical names almost always share a band. NOTE
      // (measured, tools/ScaleCheck r6): the band cannot defuse blocks
      // hot with IDENTICAL names (same length ⇒ same band) — the
      // pipeline answer is ordering: exact/canonical dedup (q21/q55)
      // runs BEFORE fuzzy ER, removing the identical-name mass; the
      // band bounds the length variety that remains (~11% candidate
      // trim on the replicated-name worst case, near-free).
      build = (s, dir) => {
        // fan-out on the blocking key: the scoring kernel runs on the
        // block join's probe side, which is a row-group-starved 1-task
        // scan at bench SFs (Par.fanOut doc; no-op at scale)
        val p = graft.operators.Par.fanOut(table(s, dir, "part").select(
          col("p_partkey").as("id"), col("p_name").as("name"),
          pipeKey(col("p_brand"),
            split(col("p_name"), " ").getItem(0),
            shiftright(length(col("p_name")), 3)).as("blk")), "blk")
        val a = p.select(col("blk"), col("id").as("id_a"), col("name").as("name_a"))
        val b = p.select(col("blk"), col("id").as("id_b"), col("name").as("name_b"))
        a.join(b, Seq("blk"))
          .filter(col("id_a") < col("id_b") && col("name_a") =!= col("name_b"))
          .withColumn("jw",
            call_function("graft_jaro_winkler", col("name_a"), col("name_b")))
          .filter(col("jw") >= 0.84)
          .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"), col("jw"))
          .orderBy(col("id_a"), col("id_b"))
      },
      oracle = Some("""
        WITH p AS (
          SELECT p_partkey AS id, p_name AS name,
            p_brand || '|' || regexp_extract(p_name, '^[^ ]+', 0)
              || '|' || CAST(length(p_name) // 8 AS VARCHAR) AS blk
          FROM part)
        SELECT a.id AS id_a, b.id AS id_b,
          a.name AS name_a, b.name AS name_b,
          jaro_winkler_similarity(a.name, b.name) AS jw
        FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id
        WHERE a.name <> b.name
          AND jaro_winkler_similarity(a.name, b.name) >= 0.84
        ORDER BY id_a, id_b"""),
      bench = true),

    "q145_oov_rate" -> Q(
      // Out-of-vocabulary audit per language: vocabulary = corpus top-K
      // tokens (count desc, token asc — total order), each document's OOV
      // share = tokens outside it, rolled up per lang with the share of
      // high-OOV docs (> 0.3). The curation signal that catches
      // boilerplate/code/garbled docs a frequency-based vocab won't cover.
      // K = 16 here: the shipped corpus has only 31 distinct tokens, so a
      // production-sized top-2000 cut covers everything and every rate is
      // identically 0 — zero test power (r5 finding). 16 < 31 keeps OOV
      // rates non-zero so the operator is actually exercised.
      // Scale shape: the vocab is a bounded top-k (broadcast to the token
      // stream — the join never shuffles the corpus side); the per-doc
      // rollup is one partial-aggregated groupBy. Rates are one IEEE
      // division snapped to 6 decimals, then exact-decimal averaged.
      build = (s, dir) => {
        val toks = table(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")).as("w"))
        val vocab = toks.groupBy(col("w"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("w")).limit(16)
          .select(col("w"), lit(1).as("iv"))
        val perDoc = toks.join(broadcast(vocab), Seq("w"), "left")
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_tok"),
            sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
          .withColumn("rate", round(
            col("n_oov").cast("double") / col("n_tok").cast("double"), 6))
        perDoc.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            round(dsum(col("rate")) / count(lit(1)), 6).as("avg_oov_rate"),
            sum((col("rate") > 0.3).cast("long")).as("n_high_oov"))
          .orderBy(col("lang"))
      },
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, lang,
            unnest(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS w
          FROM documents),
        vocab AS (
          SELECT w FROM (
            SELECT w, count(*) AS cnt FROM toks GROUP BY w)
          ORDER BY cnt DESC, w LIMIT 16),
        per_doc AS (
          SELECT t.doc_id, t.lang, count(*) AS n_tok,
            sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov
          FROM toks t LEFT JOIN vocab v ON t.w = v.w
          GROUP BY t.doc_id, t.lang),
        rated AS (
          SELECT lang,
            round(CAST(n_oov AS DOUBLE) / CAST(n_tok AS DOUBLE), 6) AS rate
          FROM per_doc)
        SELECT lang, count(*) AS n_docs,
          round(${sqlDsum("rate")} / count(*), 6) AS avg_oov_rate,
          CAST(sum(CASE WHEN rate > 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_oov
        FROM rated
        GROUP BY lang
        ORDER BY lang""")),

    "q146_multitouch_attribution" -> Q(
      // Linear multi-touch attribution: each purchase's value is credited
      // equally across the user's touch events (view/click/signup) in the
      // 7 days before it; purchases with no prior touch credit 'direct'.
      // The touch join is a per-user equi-join with a range predicate —
      // state bounded by one user's week, never a cross join — and the
      // per-purchase fan-out count comes from a purchase-keyed window on
      // the joined frame. Each credit is ONE fixed-shape IEEE division
      // snapped to 6 decimals; sums are exact-decimal.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"),
            col("event_id").as("pid"), col("value"))
        val touch = ev.filter(col("event_type").isin("view", "click", "signup"))
          .select(col("user_id").as("t_user"), col("ts").as("tts"),
            col("event_id").as("tid"), col("event_type").as("ttype"))
        // the range predicate lives IN the join condition: a post-join
        // filter would drop purchases whose user touched outside the
        // window instead of null-extending them to 'direct'
        val joined = purch.join(touch,
          col("user_id") === col("t_user") &&
            col("tts") < col("pts") &&
            col("tts") >= col("pts") - expr("interval 7 days"),
          "left")
        val wP = Window.partitionBy(col("pid"))
        joined
          .withColumn("n_t", count(col("tid")).over(wP))
          .withColumn("touch_type",
            when(col("n_t") === 0, "direct").otherwise(col("ttype")))
          .filter(col("n_t") === 0 || col("tid").isNotNull)
          .withColumn("credit",
            when(col("n_t") === 0, round(col("value"), 6))
              .otherwise(round(col("value") / col("n_t").cast("double"), 6)))
          .groupBy(col("touch_type"))
          .agg(count(lit(1)).as("n_credits"),
            countDistinct(col("pid")).as("n_purchases"),
            round(dsum(col("credit")), 2).as("attributed_revenue"))
          .orderBy(col("touch_type"))
      },
      oracle = Some(s"""
        WITH purch AS (
          SELECT user_id, ts AS pts, event_id AS pid, value
          FROM events WHERE event_type = 'purchase'),
        touch AS (
          SELECT user_id, ts AS tts, event_id AS tid, event_type AS ttype
          FROM events WHERE event_type IN ('view', 'click', 'signup')),
        j AS (
          SELECT p.pid, p.value, t.tid, t.ttype
          FROM purch p LEFT JOIN touch t
            ON p.user_id = t.user_id
            AND t.tts < p.pts AND t.tts >= p.pts - INTERVAL 7 DAY),
        counted AS (
          SELECT pid, value, tid, ttype,
            count(tid) OVER (PARTITION BY pid) AS n_t
          FROM j),
        credited AS (
          SELECT pid,
            CASE WHEN n_t = 0 THEN 'direct' ELSE ttype END AS touch_type,
            CASE WHEN n_t = 0 THEN round(value, 6)
                 ELSE round(value / CAST(n_t AS DOUBLE), 6) END AS credit
          FROM counted
          WHERE n_t = 0 OR tid IS NOT NULL)
        SELECT touch_type, count(*) AS n_credits,
          count(DISTINCT pid) AS n_purchases,
          round(${sqlDsum("credit")}, 2) AS attributed_revenue
        FROM credited
        GROUP BY touch_type
        ORDER BY touch_type""")),

    "q147_containment_pairs" -> Q(
      // Asymmetric shingle containment (Broder '97's "containment", vs
      // q27's symmetric "resemblance"): catches a short doc quoted inside
      // a long one, where Jaccard ~ |short|/|long| stays under every
      // dedup threshold. Shares q27's inverted index — (long-hash, id)
      // exchanges only — with both direction ratios emitted per pair.
      build = (s, dir) =>
        NearDup.containmentPairs(table(s, dir, "documents"),
            "doc_id", "text", n = 3, minC = 0.15)
          .orderBy(col("id_a"), col("id_b")),
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, len(t) - 2),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
          FROM toks),
        -- inverted-index pairs (recall: exact — every emitted-or-
        -- qualifying pair shares >= 1 shingle; the all-pairs
        -- list_intersect scan was oracle-side quadratic, r11)
        rws AS MATERIALIZED (SELECT doc_id, unnest(s) AS g FROM sh),
        szs AS MATERIALIZED (
          SELECT doc_id, count(*) AS sz FROM rws GROUP BY doc_id),
        com AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          FROM rws a JOIN rws b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT id_a, id_b, common, sa.sz AS sz_a, sb.sz AS sz_b
          FROM com
          JOIN szs sa ON sa.doc_id = id_a
          JOIN szs sb ON sb.doc_id = id_b)
        SELECT id_a, id_b, common,
          CAST(common AS DOUBLE) / sz_a AS cont_a_in_b,
          CAST(common AS DOUBLE) / sz_b AS cont_b_in_a
        FROM pairs
        WHERE greatest(CAST(common AS DOUBLE) / sz_a,
          CAST(common AS DOUBLE) / sz_b) >= 0.15
        ORDER BY id_a, id_b"""),
      bench = true),

    "q148_benford_audit" -> Q(
      // Benford's-law first-digit audit of order totals — the classic
      // fabricated-data / fraud screen: observed leading-digit shares vs
      // log10(1 + 1/d), with per-digit chi-square terms and the total
      // statistic. The first digit comes from the EXACT integer cents
      // (round(x·100) as a long, then its first decimal char) — never
      // from floating log10, whose boundary values (1000 → 2.999…) would
      // misclassify. One scan → 9-row aggregate; the chi-square total
      // rides a window over the BOUNDED 9-row frame.
      build = (s, dir) => {
        // domain contract (r9): Benford's law is a statement about
        // POSITIVE amounts — zero has no leading digit and a negative
        // sign is not a digit. Filter, don't try_cast: silently mapping
        // '-' to NULL would fold sign information into a missing-digit
        // bucket.
        val digits = table(s, dir, "orders")
          .filter(col("o_totalprice") > 0)
          .select(substring(round(col("o_totalprice") * 100)
            .cast("long").cast("string"), 1, 1).cast("int").as("d"))
          .groupBy(col("d")).agg(count(lit(1)).as("n"))
        val total = Window.partitionBy()
        digits
          .withColumn("n_total", sum(col("n")).over(total))
          .withColumn("share", round(
            col("n").cast("double") / col("n_total").cast("double"), 6))
          .withColumn("benford_p", round(
            log(10.0, lit(1.0) + lit(1.0) / col("d").cast("double")), 6))
          .withColumn("chi_term", round(
            (col("share") - col("benford_p")) * (col("share") - col("benford_p"))
              / col("benford_p") * col("n_total").cast("double"), 6))
          .withColumn("chi2_total",
            round(sum(col("chi_term").cast("decimal(18,6)")).over(total), 4)
              .cast("double"))
          .select(col("d"), col("n"), col("share"), col("benford_p"),
            col("chi_term"), col("chi2_total"))
          .orderBy(col("d"))
      },
      oracle = Some("""
        WITH digits AS (
          SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
            AS VARCHAR), 1, 1) AS INT) AS d, count(*) AS n
          FROM orders WHERE o_totalprice > 0 GROUP BY 1),
        shared AS (
          SELECT d, n,
            sum(n) OVER () AS n_total,
            round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6)
              AS share,
            round(ln(1.0 + 1.0 / CAST(d AS DOUBLE)) / ln(10.0), 6)
              AS benford_p
          FROM digits),
        terms AS (
          SELECT d, n, share, benford_p,
            round((share - benford_p) * (share - benford_p) / benford_p
              * CAST(n_total AS DOUBLE), 6) AS chi_term
          FROM shared)
        SELECT d, n, share, benford_p, chi_term,
          CAST(round(sum(CAST(chi_term AS DECIMAL(18,6))) OVER (), 4)
            AS DOUBLE) AS chi2_total
        FROM terms
        ORDER BY d""")),

    "q149_autocorrelation" -> Q(
      // Lag-1..14 autocorrelation of daily order revenue — the classic
      // time-series memory diagnostic completing the trend/seasonality/
      // burst family: r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)², pairs
      // matched on CALENDAR lag (gap days drop their pairs — documented
      // semantics, deterministic). The daily frame is bounded
      // (one row per day, q41's precedent), so the rn window and the
      // 14-way lag join are bounded work; deviation products are snapped
      // to 4 decimals and summed exactly in decimal.
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(msum(col("o_totalprice")).as("x"))
        val xb = daily.agg((dsum(col("x")) / count(lit(1))).as("xbar"))
        val dev = daily.crossJoin(broadcast(xb))
          .select(col("day"), (col("x") - col("xbar")).as("dx"))
        val ss = dev.agg(round(sum((col("dx") * col("dx"))
          .cast("decimal(24,4)")), 4).cast("double").as("ss"))
        val lags = s.range(1, 15).select(col("id").cast("int").as("k"))
        dev.alias("t").crossJoin(broadcast(lags))
          .join(dev.alias("u"),
            col("u.day") === date_add(col("t.day"), col("k")))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n_pairs"),
            round(sum((col("t.dx") * col("u.dx")).cast("decimal(24,4)")), 4)
              .cast("double").as("num"))
          .crossJoin(broadcast(ss))
          .select(col("k"), col("n_pairs"),
            round(col("num") / col("ss"), 8).as("acf"))
          .orderBy(col("k"))
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
            ${sqlMsum("o_totalprice")} AS x
          FROM orders GROUP BY 1),
        xb AS (SELECT ${sqlDsum("x")} / count(*) AS xbar FROM daily),
        dev AS (
          SELECT day, x - (SELECT xbar FROM xb) AS dx FROM daily),
        ss AS (
          SELECT CAST(round(sum(CAST(dx * dx AS DECIMAL(24,4))), 4)
            AS DOUBLE) AS ss
          FROM dev),
        lags AS (SELECT unnest(generate_series(1, 14)) AS k)
        SELECT k, count(*) AS n_pairs,
          round(CAST(round(sum(CAST(t.dx * u.dx AS DECIMAL(24,4))), 4)
            AS DOUBLE) / (SELECT ss FROM ss), 8) AS acf
        FROM dev t
        CROSS JOIN lags
        JOIN dev u ON u.day = t.day + CAST(k AS INT)
        GROUP BY k
        ORDER BY k""")),

    "q150_damerau_pairs" -> Q(
      // Transposition-aware fuzzy pairs: same (brand, first-token)
      // blocking as q144, scored by BOTH plain Levenshtein (Spark's
      // builtin) and the native unrestricted Damerau-Levenshtein —
      // `transposition_gain` = lev − dl isolates swapped-letter typos
      // ("widgte") that plain edit distance over-charges. Integer
      // metrics: zero float hazard in the oracle compare. Candidate
      // count governed by blocking-key selectivity; same width-8 length
      // band folded into the key as q144 (dl <= 4 implies |len diff| <= 4,
      // so only boundary-straddling pairs are traded for the bounded
      // block size — see q144's note).
      build = (s, dir) => {
        // fan-out on the blocking key: the scoring kernel runs on the
        // block join's probe side, which is a row-group-starved 1-task
        // scan at bench SFs (Par.fanOut doc; no-op at scale)
        val p = graft.operators.Par.fanOut(table(s, dir, "part").select(
          col("p_partkey").as("id"), col("p_name").as("name"),
          pipeKey(col("p_brand"),
            split(col("p_name"), " ").getItem(0),
            shiftright(length(col("p_name")), 3)).as("blk")), "blk")
        val a = p.select(col("blk"), col("id").as("id_a"), col("name").as("name_a"))
        val b = p.select(col("blk"), col("id").as("id_b"), col("name").as("name_b"))
        a.join(b, Seq("blk"))
          .filter(col("id_a") < col("id_b") && col("name_a") =!= col("name_b"))
          // dl >= |len(a) - len(b)| always, so this prefilter skips the
          // O(len^2) kernel on hopeless pairs without changing the result
          .filter(abs(length(col("name_a")) - length(col("name_b"))) <= 4)
          .withColumn("dl", call_function("graft_damerau_levenshtein",
            col("name_a"), col("name_b")))
          .filter(col("dl") <= 4)
          .withColumn("lev", levenshtein(col("name_a"), col("name_b")))
          .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
            col("lev"), col("dl"), (col("lev") - col("dl")).as("transposition_gain"))
          .orderBy(col("id_a"), col("id_b"))
      },
      oracle = Some("""
        WITH p AS (
          SELECT p_partkey AS id, p_name AS name,
            p_brand || '|' || regexp_extract(p_name, '^[^ ]+', 0)
              || '|' || CAST(length(p_name) // 8 AS VARCHAR) AS blk
          FROM part)
        SELECT a.id AS id_a, b.id AS id_b,
          a.name AS name_a, b.name AS name_b,
          CAST(levenshtein(a.name, b.name) AS INT) AS lev,
          CAST(damerau_levenshtein(a.name, b.name) AS INT) AS dl,
          CAST(levenshtein(a.name, b.name)
            - damerau_levenshtein(a.name, b.name) AS INT)
            AS transposition_gain
        FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id
        WHERE a.name <> b.name
          AND damerau_levenshtein(a.name, b.name) <= 4
        ORDER BY id_a, id_b"""),
      bench = true),

    "q151_stream_cms" -> Q(
      // Streaming count-min sketch: per-day counter grids built by a
      // Structured Streaming run (watermarked windowed COUNT — state
      // bounded by days × 4·1024 cells, NOT key cardinality), merged by
      // per-cell sum into one grid, then probed in batch against exact
      // counts. The emitted days come from the run itself; the oracle
      // re-derives the same horizon (day end ≤ max(ts) − 2 h, q130's
      // convention) and sketches those events DIRECTLY — hash-equality
      // proves streamed emission + mergeable rollup ≡ the batch sketch,
      // all in exact integer arithmetic.
      build = (s, dir) => {
        val cells = graft.streaming.BoundedRuns.streamedCmsDaily(s, dir)
        val sk = cells.groupBy(col("r"), col("c"))
          .agg(sum(col("cnt")).as("cnt"))
        val days = cells.select(col("day")).distinct()
        val exact = table(s, dir, "events")
          .join(broadcast(days), col("ts").cast("date") === col("day"))
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
        val probes = exact
          .orderBy(col("n_exact").desc, col("user_id")).limit(20)
        probes
          .join(Cms.lookup(sk, probes.select(col("user_id")), "user_id"),
            "user_id")
          .select(col("user_id"), col("n_exact"), col("cms_est"),
            (col("cms_est") - col("n_exact")).as("overcount"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH ${Cms.sqlSketchCtes(
          """SELECT user_id AS key FROM events
             WHERE CAST(ts AS DATE) + INTERVAL '1 day'
                   <= (SELECT max(ts) - INTERVAL '2 hours' FROM events)""")},
        ex AS (
          SELECT user_id, count(*) AS n_exact FROM events
          WHERE CAST(ts AS DATE) + INTERVAL '1 day'
                <= (SELECT max(ts) - INTERVAL '2 hours' FROM events)
          GROUP BY 1),
        probes AS (
          SELECT user_id, n_exact FROM ex
          ORDER BY n_exact DESC, user_id LIMIT 20),
        ${Cms.sqlLookupCtes("SELECT user_id AS key FROM probes")}
        SELECT p.user_id, p.n_exact, l.cms_est,
          l.cms_est - p.n_exact AS overcount
        FROM probes p JOIN cms_lk l ON l.key = p.user_id
        ORDER BY p.user_id""")),

    "q152_entity_clusters" -> Q(
      // End-to-end entity resolution: q144's blocked Jaro-Winkler edges
      // (at >= 0.88 — the r6 power audit found 0.92 yields ZERO edges on
      // the shipped fixture, making every cluster a singleton and the
      // component/survivorship stages dead code under the oracle; 0.88
      // produces ~1.6k edges and real multi-member clusters at sf0.01)
      // → connected components (q52's min-label
      // machinery) → every part labeled with its entity cluster, the
      // cluster size, and the canonical name (the minimum-id member's —
      // a deterministic survivorship rule). The ER composition a catalog
      // user would actually run: blocking bounds the pair join,
      // components cost one shuffle per round of cluster diameter, and
      // the canonical join is on the bounded component table.
      build = (s, dir) => {
        // fan-out on the blocking key — same probe-side rationale as
        // q144 (Par.fanOut; no-op at scale)
        val p = graft.operators.Par.fanOut(table(s, dir, "part").select(
          col("p_partkey").as("id"), col("p_name").as("name"),
          pipeKey(col("p_brand"),
            split(col("p_name"), " ").getItem(0)).as("blk")), "blk")
        val a = p.select(col("blk"), col("id").as("id_a"), col("name").as("name_a"))
        val b = p.select(col("blk"), col("id").as("id_b"), col("name").as("name_b"))
        val edges = a.join(b, Seq("blk"))
          .filter(col("id_a") < col("id_b") && col("name_a") =!= col("name_b"))
          .filter(call_function("graft_jaro_winkler",
            col("name_a"), col("name_b")) >= 0.88)
          .select(col("id_a"), col("id_b"))
        // entity contract (r9 hostile fixture): the vertex set is the
        // DISTINCT id set (a duplicate primary key is one entity with two
        // source rows, not two vertices), and the canonical name under a
        // duplicated canonical id is its lexicographically smallest name
        // — a deterministic survivorship rule, where a bare join against
        // the raw rows would emit one output row per duplicate
        val comp = Components.connectedComponents(
          p.select(col("id")).distinct(), "id", edges)
        val sizes = comp.groupBy(col("comp"))
          .agg(count(lit(1)).as("n_members"))
        val canon = p.groupBy(col("id").as("comp"))
          .agg(min(col("name")).as("canonical_name"))
        comp.join(sizes, "comp")
          .join(canon, "comp")
          .select(col("id"), col("comp").as("component"), col("n_members"),
            col("canonical_name"))
          .orderBy(col("id"))
      },
      oracle = Some("""
        WITH RECURSIVE p AS (
          SELECT p_partkey AS id, p_name AS name,
            p_brand || '|' || regexp_extract(p_name, '^[^ ]+', 0) AS blk
          FROM part),
        edges AS MATERIALIZED (
          SELECT a.id AS id_a, b.id AS id_b
          FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id
          WHERE a.name <> b.name
            AND jaro_winkler_similarity(a.name, b.name) >= 0.88),
        sym AS MATERIALIZED (
          SELECT id_a AS src, id_b AS dst FROM edges
          UNION ALL
          SELECT id_b, id_a FROM edges),
        walk(id, reach) AS (
          SELECT id, id FROM p
          UNION
          SELECT w.id, s.dst FROM walk w JOIN sym s ON s.src = w.reach),
        comp AS (
          SELECT id, min(reach) AS component FROM walk GROUP BY id),
        sizes AS (
          SELECT component, count(*) AS n_members FROM comp GROUP BY 1),
        canon AS (
          SELECT id, min(name) AS cname FROM p GROUP BY id)
        SELECT c.id, c.component, s.n_members, cn.cname AS canonical_name
        FROM comp c
        JOIN sizes s USING (component)
        JOIN canon cn ON cn.id = c.component
        ORDER BY c.id"""),
      bench = true),

    "q153_seasonal_anomalies" -> Q(
      // Seasonality-adjusted anomaly days: daily revenue minus its
      // day-of-week expectation (q126's seasonal profile), residuals
      // gated by the robust |resid − median| > 3·MAD rule (q90's
      // machinery) — so a high Sunday is judged against Sundays, and the
      // gate is not dragged by the outliers it hunts. All frames after
      // the first aggregation are bounded (days, dows); residuals are
      // stable-double arithmetic snapped to 6 decimals.
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(msum(col("o_totalprice")).as("day_rev"))
          .withColumn("dow", dayofweek(col("day")).cast("long"))
        val dowAvg = daily.groupBy(col("dow"))
          .agg(round(dsum(col("day_rev")) / count(lit(1)), 6).as("dow_avg"))
        val resid = daily.join(broadcast(dowAvg), "dow")
          .withColumn("resid", round(col("day_rev") - col("dow_avg"), 6))
        val med = resid.agg(expr("percentile(resid, 0.5D)").as("med"))
        val dev = resid.crossJoin(broadcast(med))
          .withColumn("adev", abs(col("resid") - col("med")))
        val mad = dev.agg(expr("percentile(adev, 0.5D)").as("mad"))
        dev.crossJoin(broadcast(mad))
          .filter(col("adev") > lit(3.0) * col("mad"))
          .select(col("day"), col("dow"), col("day_rev"), col("dow_avg"),
            col("resid"))
          .orderBy(col("day"))
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
            ${sqlMsum("o_totalprice")} AS day_rev
          FROM orders GROUP BY 1),
        dowed AS (
          SELECT day, day_rev,
            CAST(dayofweek(day) + 1 AS BIGINT) AS dow
          FROM daily),
        dow_avg AS (
          SELECT dow, round(${sqlDsum("day_rev")} / count(*), 6) AS dow_avg
          FROM dowed GROUP BY 1),
        resid AS (
          SELECT d.day, d.dow, d.day_rev, a.dow_avg,
            round(d.day_rev - a.dow_avg, 6) AS resid
          FROM dowed d JOIN dow_avg a USING (dow)),
        med AS (SELECT quantile_cont(resid, 0.5) AS med FROM resid),
        dev AS (
          SELECT r.*, abs(r.resid - m.med) AS adev
          FROM resid r CROSS JOIN med m),
        mad AS (SELECT quantile_cont(adev, 0.5) AS mad FROM dev)
        SELECT d.day, d.dow, d.day_rev, d.dow_avg, d.resid
        FROM dev d CROSS JOIN mad m
        WHERE d.adev > 3.0 * m.mad
        ORDER BY d.day""")),

    "q154_weighted_quantiles" -> Q(
      // Quantity-weighted median price per return flag — the weighted
      // statistic `percentile` can't express (there every row counts
      // equally). Distributed via per-group bucket thresholds + bounded
      // offsets (WeightedStats scaladoc): no group ever serializes
      // through one window partition; the oracle runs the DIRECT global
      // cumsum, and the two agree exactly because the crossing rule is a
      // pure function of tie-collapsed subtotals.
      build = (s, dir) =>
        WeightedStats.weightedQuantile(
            table(s, dir, "lineitem").select(col("l_returnflag").as("flag"),
              col("l_extendedprice"), col("l_quantity")),
            "flag", "l_extendedprice", "l_quantity", phi = 0.5)
          .orderBy(col("flag")),
      oracle = Some(s"""
        WITH ${WeightedStats.sqlWeightedQuantileCtes(
          """SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v,
                l_quantity AS w FROM lineitem""", 0.5)}
        SELECT g AS flag, wq, total_w, n_distinct
        FROM wq_sel
        ORDER BY flag""")),
  )
}
