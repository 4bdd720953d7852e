package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Stable._
import graft.operators._

/** Catalog part 6 of 7: queries q294..q323, in original catalog
  * order ([[Queries.all]] concatenates the parts — split from the former
  * single-file catalog purely for compile/review ergonomics; content and
  * order are unchanged).
  */
private[graft] trait Catalog6 extends CatalogBase {
  protected val entries6: Seq[(String, Q)] = Seq(

    "q294_ipw_ate" -> Q(
      // Inverse-propensity-weighted treatment effect (Hajek estimator),
      // propensity stratified on the observed covariate. Treated = an
      // urgent-priority order; covariate = the customer's market segment;
      // outcome = order value. Because the propensity is CONSTANT within
      // a segment, the Hajek ATE collapses algebraically to the
      // segment-size-weighted average of within-segment treated/control
      // means — so the whole estimator is one keyed join + one 5-group
      // aggregate of exact-decimal sums, no per-row weight column and no
      // order-dependent double sum. Output: 5 segment CATE rows + one
      // OVERALL row carrying the IPW ATE.
      build = (s, dir) => {
        val seg = table(s, dir, "orders")
          .join(table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("segment"),
            col("o_orderpriority").isin("1-URGENT", "2-HIGH")
              .cast("long").as("t"),
            dec(col("o_totalprice")).as("y"))
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n"),
            sum(col("t")).as("n_treated"),
            sum(when(col("t") === 1, col("y"))).cast("decimal(20,2)").as("syt"),
            sum(when(col("t") === 0, col("y"))).cast("decimal(20,2)").as("syc"))
          .select(col("segment"), col("n"), col("n_treated"),
            round(col("n_treated").cast("double") / col("n").cast("double"),
              8).as("propensity"),
            round(col("syt").cast("double")
              / col("n_treated").cast("double"), 6).as("mean_treated"),
            round(col("syc").cast("double")
              / (col("n") - col("n_treated")).cast("double"), 6)
              .as("mean_control"))
        val segRows = seg.withColumn("effect",
          round(col("mean_treated") - col("mean_control"), 6))
        // Hajek ATE over the bounded 5-row frame: with segment-constant
        // propensity, sum_s n_s * mean_s / sum_s n_s per arm.
        val overall = seg.agg(
          sum(col("n")).as("n"),
          sum(col("n_treated")).as("n_treated"),
          round(sum(col("n_treated")).cast("double")
            / sum(col("n")).cast("double"), 8).as("propensity"),
          round(sum(col("n").cast("decimal(10,0)")
              * col("mean_treated").cast("decimal(20,6)")).cast("double")
            / sum(col("n")).cast("double"), 6).as("mean_treated"),
          round(sum(col("n").cast("decimal(10,0)")
              * col("mean_control").cast("decimal(20,6)")).cast("double")
            / sum(col("n")).cast("double"), 6).as("mean_control"))
          .select(lit("OVERALL").as("segment"), col("n"), col("n_treated"),
            col("propensity"), col("mean_treated"), col("mean_control"),
            round(col("mean_treated") - col("mean_control"), 6).as("effect"))
        segRows.unionByName(overall).orderBy("segment")
      },
      oracle = Some("""
        WITH seg AS (
          SELECT c_mktsegment AS segment, count(*) AS n,
            CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END) AS BIGINT) AS n_treated,
            CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
              AS DECIMAL(20,2)) AS syt,
            CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
              THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
              AS DECIMAL(20,2)) AS syc
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1),
        stats AS (
          SELECT segment, n, n_treated,
            round(CAST(n_treated AS DOUBLE) / CAST(n AS DOUBLE), 8)
              AS propensity,
            round(CAST(syt AS DOUBLE) / CAST(n_treated AS DOUBLE), 6)
              AS mean_treated,
            round(CAST(syc AS DOUBLE) / CAST(n - n_treated AS DOUBLE), 6)
              AS mean_control
          FROM seg)
        SELECT segment, n, n_treated, propensity, mean_treated, mean_control,
          round(mean_treated - mean_control, 6) AS effect
        FROM stats
        UNION ALL
        SELECT 'OVERALL', CAST(sum(n) AS BIGINT),
          CAST(sum(n_treated) AS BIGINT),
          round(CAST(sum(n_treated) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 8),
          round(CAST(sum(CAST(n AS DECIMAL(10,0))
              * CAST(mean_treated AS DECIMAL(20,6))) AS DOUBLE)
            / CAST(sum(n) AS DOUBLE), 6),
          round(CAST(sum(CAST(n AS DECIMAL(10,0))
              * CAST(mean_control AS DECIMAL(20,6))) AS DOUBLE)
            / CAST(sum(n) AS DOUBLE), 6),
          round(round(CAST(sum(CAST(n AS DECIMAL(10,0))
              * CAST(mean_treated AS DECIMAL(20,6))) AS DOUBLE)
            / CAST(sum(n) AS DOUBLE), 6)
          - round(CAST(sum(CAST(n AS DECIMAL(10,0))
              * CAST(mean_control AS DECIMAL(20,6))) AS DOUBLE)
            / CAST(sum(n) AS DOUBLE), 6), 6)
        FROM stats
        ORDER BY segment""")),

    "q295_boxcox_grid" -> Q(
      // Box-Cox power-transform selection: profile log-likelihood over
      // the classic lambda grid {-1, -0.5, 0, 0.5, 1}, picked by argmax.
      // ONE scan computes all five transforms' exact moments (each
      // transform snapped at 6 decimals, its square at 4, summed in
      // exact decimal) plus the shared sum of ln y — the 1-row moment
      // frame then unrolls row-locally (ll for all five as columns,
      // greatest() for the winner, THEN explode), so there is no window
      // anywhere and no second scan. LL(l) = -n/2 * ln(sigma2_l)
      // + (l-1) * sum(ln y), population sigma2 from the exact moments.
      build = (s, dir) => {
        val lams = Seq(-1.0, -0.5, 0.0, 0.5, 1.0)
        def nm(l: Double) = (if (l < 0) "m" else "p") +
          (math.abs(l) * 10).round.toString
        val y = col("o_totalprice").cast("double")
        def t(l: Double): Column =
          if (l == 0.0) log(y)
          else (pow(y, lit(l)) - lit(1.0)) / lit(l)
        val aggs = lams.flatMap { l =>
          // Snap the transform at 6 decimals, then square in EXACT
          // decimal — round()ing a ~1e11 double square would sit at the
          // double's own representability boundary and is not portable.
          val ts = round(t(l), 6).cast("decimal(14,6)")
          Seq(
            sum(ts).cast("decimal(24,6)").as(s"st_${nm(l)}"),
            sum(ts * ts).cast("decimal(38,12)").as(s"st2_${nm(l)}"))
        } ++ Seq(
          sum(round(log(y), 8).cast("decimal(20,8)")).cast("decimal(24,8)")
            .as("slog"),
          count(lit(1)).as("n"))
        // domain contract (r9): Box-Cox is defined for POSITIVE y (ln and
        // negative powers of y <= 0 are not numbers on either engine)
        val mom = table(s, dir, "orders")
          .filter(col("o_totalprice") > 0).agg(aggs.head, aggs.tail: _*)
        def ll(l: Double): Column = {
          val nD = col("n").cast("double")
          val mean = col(s"st_${nm(l)}").cast("double") / nD
          val v = col(s"st2_${nm(l)}").cast("double") / nD - mean * mean
          round(lit(-0.5) * nD * log(v)
            + lit(l - 1.0) * col("slog").cast("double"), 4)
        }
        val wide = mom.select(
          (lams.map(l => ll(l).as(s"ll_${nm(l)}")) :+ col("n")): _*)
          .withColumn("best_ll",
            greatest(lams.map(l => col(s"ll_${nm(l)}")): _*))
        wide.select(col("n"), col("best_ll"), explode(array(
            lams.map(l => struct(lit(l).as("lambda"),
              col(s"ll_${nm(l)}").as("ll"))): _*)).as("g"))
          .select(col("g.lambda").as("lambda"), col("n"),
            col("g.ll").as("ll"),
            (col("g.ll") === col("best_ll")).cast("long").as("is_best"))
          .orderBy("lambda")
      },
      oracle = Some("""
        WITH mom AS (
          SELECT count(*) AS n,
            CAST(sum(CAST(round(ln(CAST(o_totalprice AS DOUBLE)), 8)
              AS DECIMAL(20,8))) AS DECIMAL(24,8)) AS slog,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), -1.0) - 1.0)
              / -1.0, 6) AS DECIMAL(14,6))) AS DECIMAL(24,6)) AS st_m10,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), -1.0) - 1.0)
              / -1.0, 6) AS DECIMAL(20,6)) * CAST(round((pow(CAST(o_totalprice
              AS DOUBLE), -1.0) - 1.0) / -1.0, 6) AS DECIMAL(14,6)))
              AS DECIMAL(38,12)) AS st2_m10,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), -0.5) - 1.0)
              / -0.5, 6) AS DECIMAL(14,6))) AS DECIMAL(24,6)) AS st_m05,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), -0.5) - 1.0)
              / -0.5, 6) AS DECIMAL(20,6)) * CAST(round((pow(CAST(o_totalprice
              AS DOUBLE), -0.5) - 1.0) / -0.5, 6) AS DECIMAL(14,6)))
              AS DECIMAL(38,12)) AS st2_m05,
            CAST(sum(CAST(round(ln(CAST(o_totalprice AS DOUBLE)), 6)
              AS DECIMAL(14,6))) AS DECIMAL(24,6)) AS st_p00,
            CAST(sum(CAST(round(ln(CAST(o_totalprice AS DOUBLE)), 6)
              AS DECIMAL(20,6)) * CAST(round(ln(CAST(o_totalprice AS DOUBLE)),
              6) AS DECIMAL(14,6))) AS DECIMAL(38,12)) AS st2_p00,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), 0.5) - 1.0)
              / 0.5, 6) AS DECIMAL(14,6))) AS DECIMAL(24,6)) AS st_p05,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), 0.5) - 1.0)
              / 0.5, 6) AS DECIMAL(20,6)) * CAST(round((pow(CAST(o_totalprice
              AS DOUBLE), 0.5) - 1.0) / 0.5, 6) AS DECIMAL(14,6)))
              AS DECIMAL(38,12)) AS st2_p05,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), 1.0) - 1.0)
              / 1.0, 6) AS DECIMAL(14,6))) AS DECIMAL(24,6)) AS st_p10,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), 1.0) - 1.0)
              / 1.0, 6) AS DECIMAL(20,6)) * CAST(round((pow(CAST(o_totalprice
              AS DOUBLE), 1.0) - 1.0) / 1.0, 6) AS DECIMAL(14,6)))
              AS DECIMAL(38,12)) AS st2_p10
          FROM orders WHERE o_totalprice > 0),
        wide AS (
          SELECT n,
            round(-0.5 * n * ln(CAST(st2_m10 AS DOUBLE) / n
                - (CAST(st_m10 AS DOUBLE) / n) * (CAST(st_m10 AS DOUBLE) / n))
              + (-1.0 - 1.0) * CAST(slog AS DOUBLE), 4) AS ll_m10,
            round(-0.5 * n * ln(CAST(st2_m05 AS DOUBLE) / n
                - (CAST(st_m05 AS DOUBLE) / n) * (CAST(st_m05 AS DOUBLE) / n))
              + (-0.5 - 1.0) * CAST(slog AS DOUBLE), 4) AS ll_m05,
            round(-0.5 * n * ln(CAST(st2_p00 AS DOUBLE) / n
                - (CAST(st_p00 AS DOUBLE) / n) * (CAST(st_p00 AS DOUBLE) / n))
              + (0.0 - 1.0) * CAST(slog AS DOUBLE), 4) AS ll_p00,
            round(-0.5 * n * ln(CAST(st2_p05 AS DOUBLE) / n
                - (CAST(st_p05 AS DOUBLE) / n) * (CAST(st_p05 AS DOUBLE) / n))
              + (0.5 - 1.0) * CAST(slog AS DOUBLE), 4) AS ll_p05,
            round(-0.5 * n * ln(CAST(st2_p10 AS DOUBLE) / n
                - (CAST(st_p10 AS DOUBLE) / n) * (CAST(st_p10 AS DOUBLE) / n))
              + (1.0 - 1.0) * CAST(slog AS DOUBLE), 4) AS ll_p10
          FROM mom),
        mx AS (SELECT *, greatest(ll_m10, ll_m05, ll_p00, ll_p05, ll_p10)
                 AS best_ll FROM wide)
        SELECT -1.0 AS lambda, n, ll_m10 AS ll,
          CAST(CASE WHEN ll_m10 = best_ll THEN 1 ELSE 0 END AS BIGINT) AS is_best FROM mx
        UNION ALL SELECT -0.5, n, ll_m05,
          CAST(CASE WHEN ll_m05 = best_ll THEN 1 ELSE 0 END AS BIGINT) FROM mx
        UNION ALL SELECT 0.0, n, ll_p00,
          CAST(CASE WHEN ll_p00 = best_ll THEN 1 ELSE 0 END AS BIGINT) FROM mx
        UNION ALL SELECT 0.5, n, ll_p05,
          CAST(CASE WHEN ll_p05 = best_ll THEN 1 ELSE 0 END AS BIGINT) FROM mx
        UNION ALL SELECT 1.0, n, ll_p10,
          CAST(CASE WHEN ll_p10 = best_ll THEN 1 ELSE 0 END AS BIGINT) FROM mx
        ORDER BY lambda""")),

    "q296_fk_orphan_audit" -> Q(
      // Referential-integrity audit — the dbt-test / data-contract
      // staple: every FK edge of the star schema checked in one panel
      // (child rows, orphan rows, distinct orphan keys), PLUS three
      // restricted-parent arms (active-customer, solvent-supplier,
      // pilot-cohort) that audit membership in a business-rule SUBSET of
      // the parent — the arms with real violations, so the panel proves
      // both integrity (zeros) and detection power (non-zeros). Each
      // edge is one left join + conditional aggregate; bounded dims are
      // broadcast, key-to-key edges shuffle on the join key.
      build = (s, dir) => {
        def li = table(s, dir, "lineitem")
        def ord = table(s, dir, "orders")
        def cust = table(s, dir, "customer")
        def supp = table(s, dir, "supplier")
        def nat = table(s, dir, "nation")
        def edge(name: String, child: DataFrame, ck: String,
                 parent: DataFrame, pk: String,
                 bcast: Boolean = false): DataFrame = {
          val p = parent.select(col(pk)).withColumn("__hit", lit(1))
          val joined = child.select(col(ck))
            .join(if (bcast) broadcast(p) else p,
              col(ck) === col(pk), "left")
          joined.agg(count(lit(1)).as("n_child"),
            sum((col("__hit").isNull).cast("long")).as("n_orphan"),
            countDistinct(when(col("__hit").isNull, col(ck)))
              .as("n_orphan_keys"))
            .select(lit(name).as("edge"), col("n_child"),
              col("n_orphan"), col("n_orphan_keys"))
        }
        Seq(
          edge("customer.nationkey->nation", cust, "c_nationkey", nat,
            "n_nationkey", bcast = true),
          edge("events.user_id->customer[pilot]", table(s, dir, "events"),
            "user_id", cust.filter(col("c_custkey") < 100), "c_custkey",
            bcast = true),
          edge("lineitem.orderkey->orders", li, "l_orderkey", ord,
            "o_orderkey"),
          edge("lineitem.partkey->part", li, "l_partkey",
            table(s, dir, "part"), "p_partkey"),
          edge("lineitem.suppkey->supplier", li, "l_suppkey", supp,
            "s_suppkey", bcast = true),
          edge("lineitem.suppkey->supplier[solvent]", li, "l_suppkey",
            supp.filter(col("s_acctbal") >= 0), "s_suppkey", bcast = true),
          edge("nation.regionkey->region", nat, "n_regionkey",
            table(s, dir, "region"), "r_regionkey", bcast = true),
          edge("orders.custkey->customer", ord, "o_custkey", cust,
            "c_custkey"),
          edge("orders.custkey->customer[active]", ord, "o_custkey",
            cust.filter(col("c_acctbal") >= 0), "c_custkey"),
          edge("supplier.nationkey->nation", supp, "s_nationkey", nat,
            "n_nationkey", bcast = true)
        ).reduce(_ unionByName _).orderBy("edge")
      },
      oracle = Some("""
        SELECT 'customer.nationkey->nation' AS edge, count(*) AS n_child,
          CAST(sum(CASE WHEN p.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan,
          CAST(count(DISTINCT CASE WHEN p.n_nationkey IS NULL THEN c.c_nationkey END) AS BIGINT) AS n_orphan_keys
        FROM customer c LEFT JOIN nation p ON c.c_nationkey = p.n_nationkey
        UNION ALL
        SELECT 'events.user_id->customer[pilot]', count(*),
          CAST(sum(CASE WHEN p.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(count(DISTINCT CASE WHEN p.c_custkey IS NULL THEN e.user_id END) AS BIGINT)
        FROM events e LEFT JOIN (SELECT c_custkey FROM customer WHERE c_custkey < 100) p
          ON e.user_id = p.c_custkey
        UNION ALL
        SELECT 'lineitem.orderkey->orders', count(*),
          CAST(sum(CASE WHEN p.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(count(DISTINCT CASE WHEN p.o_orderkey IS NULL THEN l.l_orderkey END) AS BIGINT)
        FROM lineitem l LEFT JOIN orders p ON l.l_orderkey = p.o_orderkey
        UNION ALL
        SELECT 'lineitem.partkey->part', count(*),
          CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(count(DISTINCT CASE WHEN p.p_partkey IS NULL THEN l.l_partkey END) AS BIGINT)
        FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        UNION ALL
        SELECT 'lineitem.suppkey->supplier', count(*),
          CAST(sum(CASE WHEN p.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(count(DISTINCT CASE WHEN p.s_suppkey IS NULL THEN l.l_suppkey END) AS BIGINT)
        FROM lineitem l LEFT JOIN supplier p ON l.l_suppkey = p.s_suppkey
        UNION ALL
        SELECT 'lineitem.suppkey->supplier[solvent]', count(*),
          CAST(sum(CASE WHEN p.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(count(DISTINCT CASE WHEN p.s_suppkey IS NULL THEN l.l_suppkey END) AS BIGINT)
        FROM lineitem l LEFT JOIN (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0) p
          ON l.l_suppkey = p.s_suppkey
        UNION ALL
        SELECT 'nation.regionkey->region', count(*),
          CAST(sum(CASE WHEN p.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(count(DISTINCT CASE WHEN p.r_regionkey IS NULL THEN n.n_regionkey END) AS BIGINT)
        FROM nation n LEFT JOIN region p ON n.n_regionkey = p.r_regionkey
        UNION ALL
        SELECT 'orders.custkey->customer', count(*),
          CAST(sum(CASE WHEN p.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(count(DISTINCT CASE WHEN p.c_custkey IS NULL THEN o.o_custkey END) AS BIGINT)
        FROM orders o LEFT JOIN customer p ON o.o_custkey = p.c_custkey
        UNION ALL
        SELECT 'orders.custkey->customer[active]', count(*),
          CAST(sum(CASE WHEN p.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(count(DISTINCT CASE WHEN p.c_custkey IS NULL THEN o.o_custkey END) AS BIGINT)
        FROM orders o LEFT JOIN (SELECT c_custkey FROM customer WHERE c_acctbal >= 0) p
          ON o.o_custkey = p.c_custkey
        UNION ALL
        SELECT 'supplier.nationkey->nation', count(*),
          CAST(sum(CASE WHEN p.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(count(DISTINCT CASE WHEN p.n_nationkey IS NULL THEN s.s_nationkey END) AS BIGINT)
        FROM supplier s LEFT JOIN nation p ON s.s_nationkey = p.n_nationkey
        ORDER BY edge""")),

    "q297_kendall_tau" -> Q(
      // Kendall tau-b rank correlation — the tie-robust complement of
      // q198's Spearman. Computed on a BOUNDED post-aggregation frame
      // (25 nations: x = exact-decimal customer balance total, y = order
      // count), where the O(n^2) pair enumeration is 300 pairs — a
      // broadcast self-join on the tiny frame, never on raw rows. All
      // pair counts are exact integers; only the final tau divides.
      build = (s, dir) => {
        // Balance counts each CUSTOMER once (not once per order), so the
        // two metrics aggregate separately and join on the nation key.
        val bal = table(s, dir, "customer").groupBy(col("c_nationkey"))
          .agg(msum(col("c_acctbal")).as("x"))
        val cnt = table(s, dir, "customer")
          .join(table(s, dir, "orders"),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_nationkey"))
          .agg(count(col("o_orderkey")).as("y"))
        val f = bal.join(cnt, "c_nationkey")
          .select(col("c_nationkey").as("k"), col("x"), col("y"))
        val a = f.select(col("k").as("k1"), col("x").as("x1"), col("y").as("y1"))
        val b = f.select(col("k").as("k2"), col("x").as("x2"), col("y").as("y2"))
        val pairs = a.join(broadcast(b), col("k1") < col("k2"))
          .select(
            ((col("x1") < col("x2") && col("y1") < col("y2")) ||
             (col("x1") > col("x2") && col("y1") > col("y2")))
              .cast("long").as("c"),
            ((col("x1") < col("x2") && col("y1") > col("y2")) ||
             (col("x1") > col("x2") && col("y1") < col("y2")))
              .cast("long").as("d"),
            (col("x1") === col("x2")).cast("long").as("tx"),
            (col("y1") === col("y2")).cast("long").as("ty"))
        val nrow = f.agg(count(lit(1)).as("n")) // bounded 1-row frame
        pairs.agg(sum(col("c")).as("concordant"),
            sum(col("d")).as("discordant"),
            sum(col("tx")).as("ties_x"), sum(col("ty")).as("ties_y"),
            count(lit(1)).as("n_pairs"))
          .crossJoin(broadcast(nrow))
          .select(col("n"), col("n_pairs"), col("concordant"),
            col("discordant"), col("ties_x"), col("ties_y"),
            round((col("concordant") - col("discordant")).cast("double")
              / sqrt((col("n_pairs") - col("ties_x")).cast("double")
                * (col("n_pairs") - col("ties_y")).cast("double")), 6)
              .as("tau_b"))
      },
      oracle = Some("""
        WITH bal AS (
          SELECT c_nationkey AS k,
            CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS x
          FROM customer GROUP BY 1),
        cnt AS (
          SELECT c_nationkey AS k, count(o_orderkey) AS y
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY 1),
        f AS (SELECT k, x, y FROM bal JOIN cnt USING (k)),
        pairs AS (
          SELECT
            CASE WHEN (a.x < b.x AND a.y < b.y)
              OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END AS c,
            CASE WHEN (a.x < b.x AND a.y > b.y)
              OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END AS d,
            CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
            CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
          FROM f a JOIN f b ON a.k < b.k)
        SELECT (SELECT count(*) FROM f) AS n,
          count(*) AS n_pairs,
          CAST(sum(c) AS BIGINT) AS concordant,
          CAST(sum(d) AS BIGINT) AS discordant,
          CAST(sum(tx) AS BIGINT) AS ties_x,
          CAST(sum(ty) AS BIGINT) AS ties_y,
          round(CAST(sum(c) - sum(d) AS DOUBLE)
            / sqrt(CAST(count(*) - sum(tx) AS DOUBLE)
              * CAST(count(*) - sum(ty) AS DOUBLE)), 6) AS tau_b
        FROM pairs""")),

    "q298_rrf_fusion" -> Q(
      // Reciprocal-rank fusion (Cormack et al.) — the standard way to
      // merge heterogeneous retrieval rankings (BM25 + dense, or here
      // length + lexical diversity) without score calibration. Each
      // ranking is TRUNCATED to its top-100 via TakeOrdered (a heap, not
      // a global sort), ranks are assigned inside the bounded 100-row
      // frames, and the fused score sums 1/(60 + rank) over the lists a
      // document appears in — exact integer ranks, so the doubles are
      // bit-identical across engines with no snapping. The scale shape
      // of candidate-list fusion: per-list top-k first, rank after.
      build = (s, dir) => {
        val k = 100
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), length(col("text")).as("len"),
            size(array_distinct(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")))
              .as("vocab"))
        def top(metric: String, rankName: String): DataFrame = {
          val t = docs.orderBy(col(metric).desc, col("doc_id")).limit(k)
          val w = Window.orderBy(col(metric).desc, col("doc_id"))
          t.withColumn(rankName, row_number().over(w))
            .select(col("doc_id"), col(rankName))
        }
        val fused = top("len", "rank_len")
          .join(top("vocab", "rank_vocab"), Seq("doc_id"), "full")
          .select(col("doc_id"), col("rank_len"), col("rank_vocab"),
            (coalesce(lit(1.0) / (lit(60.0) + col("rank_len")), lit(0.0))
              + coalesce(lit(1.0) / (lit(60.0) + col("rank_vocab")),
                lit(0.0))).as("rrf"))
        fused.orderBy(col("rrf").desc, col("doc_id")).limit(20)
          .select(col("doc_id"), col("rank_len"), col("rank_vocab"),
            round(col("rrf"), 8).as("rrf"))
          .orderBy(col("rrf").desc, col("doc_id"))
      },
      oracle = Some("""
        WITH docs AS (
          SELECT doc_id, length(text) AS len,
            len(list_distinct(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')))
              AS vocab
          FROM documents),
        rl AS (
          SELECT doc_id, rank_len FROM (
            SELECT doc_id, row_number() OVER (ORDER BY len DESC, doc_id)
              AS rank_len FROM docs)
          WHERE rank_len <= 100),
        rv AS (
          SELECT doc_id, rank_vocab FROM (
            SELECT doc_id, row_number() OVER (ORDER BY vocab DESC, doc_id)
              AS rank_vocab FROM docs)
          WHERE rank_vocab <= 100),
        fused AS (
          SELECT coalesce(rl.doc_id, rv.doc_id) AS doc_id,
            rank_len, rank_vocab,
            coalesce(1.0 / (60.0 + rank_len), 0.0)
              + coalesce(1.0 / (60.0 + rank_vocab), 0.0) AS rrf
          FROM rl FULL JOIN rv ON rl.doc_id = rv.doc_id)
        SELECT doc_id, rank_len, rank_vocab, round(rrf, 8) AS rrf
        FROM fused
        ORDER BY rrf DESC, doc_id LIMIT 20""")),

    "q299_cusum_changepoint" -> Q(
      // CUSUM changepoint detection (Page) over the daily mean of click
      // values: cumulative sum of (daily mean - grand mean), peak |S_t|
      // marks the most likely shift point. Raw rows reduce to a BOUNDED
      // day frame (~30 rows at any SF) in one exact-decimal aggregate;
      // the cumulative scan, grand mean and peak flag all live on that
      // bounded frame (keyless windows there are allowlisted in
      // PlanSpec's global-window audit — the frame is calendar-bounded,
      // not data-sized). Deviations are snapped at 6 decimals before the
      // running sum so the scan is exact.
      build = (s, dir) => {
        val daily = table(s, dir, "events")
          // finite-observation contract, mirrored by the streaming
          // twin's dailyValueMoments and both oracles
          .filter(col("event_type") === "click" && finite(col("value")))
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).as("sv"))
        val tot = daily.agg(
          sum(col("n")).as("nt"),
          sum(col("sv")).cast("decimal(24,6)").as("svt"))
        val dev = daily.crossJoin(broadcast(tot))
          .select(col("day"), col("n"),
            round(col("sv").cast("double") / col("n").cast("double"), 6)
              .as("daily_mean"),
            round(col("sv").cast("double") / col("n").cast("double")
              - col("svt").cast("double") / col("nt").cast("double"), 6)
              .cast("decimal(18,6)").as("d"))
        val wCum = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = dev.withColumn("cusum",
            sum(col("d")).over(wCum).cast("decimal(20,6)"))
          .withColumn("abs_c", abs(col("cusum")))
        val peak = cum.agg(max(col("abs_c")).as("mx"))
        cum.crossJoin(broadcast(peak))
          .select(col("day"), col("n"), col("daily_mean"),
            col("cusum").cast("double").as("cusum"),
            (col("abs_c") === col("mx")).cast("long").as("is_peak"))
          .orderBy("day")
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day, count(*) AS n,
            sum(CAST(value AS DECIMAL(18,6))) AS sv
          FROM events
          WHERE event_type = 'click' AND isfinite(value)
          GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n) AS BIGINT) AS nt,
            CAST(sum(sv) AS DECIMAL(24,6)) AS svt
          FROM daily),
        dev AS (
          SELECT day, n,
            round(CAST(sv AS DOUBLE) / n, 6) AS daily_mean,
            CAST(round(CAST(sv AS DOUBLE) / n
              - CAST(svt AS DOUBLE) / nt, 6) AS DECIMAL(18,6)) AS d
          FROM daily CROSS JOIN tot),
        cum AS (
          SELECT day, n, daily_mean,
            CAST(sum(d) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DECIMAL(20,6)) AS cusum
          FROM dev),
        peak AS (SELECT max(abs(cusum)) AS mx FROM cum)
        SELECT day, n, daily_mean, CAST(cusum AS DOUBLE) AS cusum,
          CAST(CASE WHEN abs(cusum) = mx THEN 1 ELSE 0 END AS BIGINT)
            AS is_peak
        FROM cum CROSS JOIN peak
        ORDER BY day""")),

    "q300_msprt_monitor" -> Q(
      // Always-valid A/B monitoring via the mixture SPRT (Robbins;
      // Johari et al.'s "peeking problem" fix): the two-arm mean
      // difference of view values, re-tested EVERY day on the cumulative
      // data with a normal mixture prior (tau^2 = 1) — the log mixture
      // likelihood ratio lnLambda_t is valid at every look, so the first
      // day it crosses ln(1/alpha) is a legitimate stop. Raw rows reduce
      // once to a per-day-per-arm exact-moment frame; the cumulative
      // moments, pooled variance and lnLambda are all closed-form on
      // that calendar-bounded frame (windows allowlisted in PlanSpec).
      build = (s, dir) => {
        val daily = table(s, dir, "events")
          // finite-observation contract (Stable.finite), mirrored by the
          // streaming twin's dailyArmMoments and both oracles
          .filter(col("event_type") === "view" && finite(col("value")))
          .select(to_date(col("ts")).as("day"),
            (col("user_id") % 2).cast("long").as("arm"),
            col("value").cast("decimal(18,6)").as("v"))
          .groupBy(col("day"), col("arm"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
            sum(col("v") * col("v")).cast("decimal(38,12)").as("svv"))
        val w = Window.partitionBy(col("arm")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = daily
          .withColumn("cn", sum(col("n")).over(w))
          .withColumn("cs", sum(col("sv")).over(w).cast("decimal(24,6)"))
          .withColumn("cq", sum(col("svv")).over(w).cast("decimal(38,12)"))
          .select(col("day"), col("arm"), col("cn"),
            col("cs").cast("double").as("cs"),
            col("cq").cast("double").as("cq"))
        // pivot the two arms side by side per day (equi-join on day)
        val a = cum.filter(col("arm") === 0)
          .select(col("day"), col("cn").as("na"), col("cs").as("sa"),
            col("cq").as("qa"))
        val b = cum.filter(col("arm") === 1)
          .select(col("day"), col("cn").as("nb"), col("cs").as("sb"),
            col("cq").as("qb"))
        val naD = col("na").cast("double"); val nbD = col("nb").cast("double")
        val diff = col("sa") / naD - col("sb") / nbD
        val ss = (col("qa") - col("sa") * col("sa") / naD) +
          (col("qb") - col("sb") * col("sb") / nbD)
        val s2p = ss / (naD + nbD - lit(2.0))
        val vv = s2p * (lit(1.0) / naD + lit(1.0) / nbD)
        val tau2 = lit(1.0)
        val lnLam = lit(0.5) * log(vv / (vv + tau2)) +
          diff * diff * tau2 / (lit(2.0) * vv * (vv + tau2))
        a.join(b, "day")
          .select(col("day"), col("na"), col("nb"),
            round(diff, 6).as("mean_diff"),
            round(lnLam, 6).as("ln_lambda"),
            (round(lnLam, 6) >= log(lit(20.0))).cast("long")
              .as("significant"))
          .orderBy("day")
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day, user_id % 2 AS arm,
            count(*) AS n,
            sum(CAST(value AS DECIMAL(18,6))) AS sv,
            CAST(sum(CAST(value AS DECIMAL(19,6))
              * CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS svv
          FROM events WHERE event_type = 'view' AND isfinite(value)
          GROUP BY 1, 2),
        cum AS (
          SELECT day, arm,
            sum(n) OVER (PARTITION BY arm ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
            CAST(CAST(sum(sv) OVER (PARTITION BY arm ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DECIMAL(24,6)) AS DOUBLE) AS cs,
            CAST(CAST(sum(svv) OVER (PARTITION BY arm ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DECIMAL(38,12)) AS DOUBLE) AS cq
          FROM daily),
        ab AS (
          SELECT a.day,
            CAST(a.cn AS BIGINT) AS na, CAST(b.cn AS BIGINT) AS nb,
            a.cs AS sa, a.cq AS qa, b.cs AS sb, b.cq AS qb
          FROM (SELECT * FROM cum WHERE arm = 0) a
          JOIN (SELECT * FROM cum WHERE arm = 1) b USING (day)),
        st AS (
          SELECT day, na, nb,
            sa / na - sb / nb AS diff,
            ((qa - sa * sa / na) + (qb - sb * sb / nb))
              / (na + nb - 2.0) * (1.0 / na + 1.0 / nb) AS vv
          FROM ab)
        SELECT day, na, nb, round(diff, 6) AS mean_diff,
          round(0.5 * ln(vv / (vv + 1.0))
            + diff * diff * 1.0 / (2.0 * vv * (vv + 1.0)), 6) AS ln_lambda,
          CAST(CASE WHEN round(0.5 * ln(vv / (vv + 1.0))
            + diff * diff * 1.0 / (2.0 * vv * (vv + 1.0)), 6) >= ln(20.0)
            THEN 1 ELSE 0 END AS BIGINT) AS significant
        FROM st ORDER BY day""")),

    "q301_platt_scaling" -> Q(
      // Platt scaling — the parametric rival of q271's isotonic fit:
      // sigma(a*conf + b) fit by EIGHT unrolled Newton-Raphson steps on
      // q99's bounded 10-bin reliability frame (grouped-data logistic
      // MLE: bin mean confidence as the feature, bin positives as the
      // successes). Every iteration aggregates five snapped-decimal
      // moments over the 10 rows, solves the 2x2 system row-locally,
      // and SNAPS the updated (a, b) at 8 decimals — the snap is what
      // stops cross-libm exp() ulps compounding across iterations. The
      // oracle unrolls the same eight steps as generated CTEs
      // (plattOracle below). Output: the fitted line plus the
      // calibration win (grouped log-loss before vs after).
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val mm = o.agg(min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"))
        val bins = o.crossJoin(broadcast(mm))
          .withColumn("conf",
            (col("o_totalprice") - col("mn")) / (col("mx") - col("mn")))
          .withColumn("bin",
            least(floor(col("conf") * 10).cast("long"), lit(9L)))
          .withColumn("y", (col("o_orderstatus") === "F").cast("long"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
            davg(col("conf")).as("c"))
          .localCheckpoint() // 10 rows; reused by all 8 iterations
        def d6(c: Column) = round(c, 6).cast("decimal(18,6)")
        var params: DataFrame = bins.sparkSession.range(1)
          .select(lit(0.0).as("a"), lit(0.0).as("b"))
        for (_ <- 1 to 8) {
          val j = bins.crossJoin(broadcast(params))
          val p = round(lit(1.0) /
            (lit(1.0) + exp(-(col("a") * col("c") + col("b")))), 8)
          val nD = col("n").cast("double")
          val posD = col("pos").cast("double")
          val g = j.select(col("a"), col("b"),
              d6((posD - nD * p) * col("c")).as("t_g1"),
              d6(posD - nD * p).as("t_g2"),
              d6(nD * p * (lit(1.0) - p) * col("c") * col("c")).as("t_h11"),
              d6(nD * p * (lit(1.0) - p) * col("c")).as("t_h12"),
              d6(nD * p * (lit(1.0) - p)).as("t_h22"))
            .groupBy(col("a"), col("b"))
            .agg(sum(col("t_g1")).cast("double").as("g1"),
              sum(col("t_g2")).cast("double").as("g2"),
              sum(col("t_h11")).cast("double").as("h11"),
              sum(col("t_h12")).cast("double").as("h12"),
              sum(col("t_h22")).cast("double").as("h22"))
          val det = col("h11") * col("h22") - col("h12") * col("h12")
          params = g.select(
            round(col("a") + (col("g1") * col("h22")
              - col("g2") * col("h12")) / det, 8).as("a"),
            round(col("b") + (col("g2") * col("h11")
              - col("g1") * col("h12")) / det, 8).as("b"))
        }
        val fin = bins.crossJoin(broadcast(params))
        val pf = round(lit(1.0) /
          (lit(1.0) + exp(-(col("a") * col("c") + col("b")))), 8)
        def llTerm(pr: Column) = round(-(col("pos").cast("double") * log(pr)
          + (col("n") - col("pos")).cast("double")
            * log(lit(1.0) - pr)), 4).cast("decimal(20,4)")
        fin.select(col("a"), col("b"), col("n"),
            llTerm(col("c")).as("t_before"), llTerm(pf).as("t_after"))
          .groupBy(col("a"), col("b"))
          .agg(sum(col("n")).as("n"),
            round(sum(col("t_before")).cast("double"), 4).as("ll_before"),
            round(sum(col("t_after")).cast("double"), 4).as("ll_after"))
          .select(col("n"), col("a"), col("b"),
            col("ll_before"), col("ll_after"))
      },
      oracle = Some(plattOracle)),

    "q302_expectation_suite" -> Q(
      // Declarative data-contract suite (the dbt-test / Great
      // Expectations shape): eight heterogeneous expectations over
      // orders — not-null, uniqueness, accepted-values (one passing and
      // one deliberately narrower "legacy" contract that fails),
      // numeric range, regex format, date range, freshness and minimum
      // volume — ALL evaluated in a single scan (one conditional
      // aggregate computes every violation count; count(DISTINCT) rides
      // the same agg), then unrolled row-locally into the
      // one-row-per-check panel. No second pass, no per-check scans.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val agg = o.agg(
          count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("n_key"),
          sum(col("o_orderdate").isNull.cast("long")).as("v_null_date"),
          sum((!col("o_orderstatus").isin("O", "F", "P")).cast("long"))
            .as("v_status"),
          sum((!col("o_orderstatus").isin("O", "F")).cast("long"))
            .as("v_status_legacy"),
          sum((col("o_totalprice") <= 0 || col("o_totalprice") > 500000)
            .cast("long")).as("v_price_range"),
          sum((!col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$"))
            .cast("long")).as("v_prio_format"),
          sum((col("o_orderdate") < lit("1990-01-01").cast("timestamp") ||
            col("o_orderdate") > lit("2000-12-31").cast("timestamp"))
            .cast("long")).as("v_date_range"),
          max(col("o_orderdate")).as("max_date"))
        val checks = agg.select(col("n"), explode(array(
            struct(lit("01_not_null_orderdate").as("check"),
              col("v_null_date").as("violations")),
            struct(lit("02_unique_orderkey").as("check"),
              (col("n") - col("n_key")).as("violations")),
            struct(lit("03_accepted_status").as("check"),
              col("v_status").as("violations")),
            struct(lit("04_accepted_status_legacy").as("check"),
              col("v_status_legacy").as("violations")),
            struct(lit("05_price_in_range").as("check"),
              col("v_price_range").as("violations")),
            struct(lit("06_priority_format").as("check"),
              col("v_prio_format").as("violations")),
            struct(lit("07_date_in_range").as("check"),
              col("v_date_range").as("violations")),
            struct(lit("08_fresh_and_voluminous").as("check"),
              ((col("max_date") < lit("2001-01-01").cast("timestamp"))
                .cast("long") + (col("n") < 1000).cast("long"))
                .as("violations")))).as("e"))
        checks.select(col("e.check").as("check"), col("n").as("n_checked"),
            col("e.violations").as("n_violations"),
            (col("e.violations") === 0).cast("long").as("passed"))
          .orderBy("check")
      },
      oracle = Some("""
        WITH agg AS (
          SELECT count(*) AS n,
            count(DISTINCT o_orderkey) AS n_key,
            CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS v_null_date,
            CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
              THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
            CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F')
              THEN 1 ELSE 0 END) AS BIGINT) AS v_status_legacy,
            CAST(sum(CASE WHEN o_totalprice <= 0 OR o_totalprice > 500000
              THEN 1 ELSE 0 END) AS BIGINT) AS v_price_range,
            CAST(sum(CASE WHEN NOT regexp_matches(o_orderpriority,
              '^[1-5]-[A-Z ]+$') THEN 1 ELSE 0 END) AS BIGINT)
              AS v_prio_format,
            CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
              OR o_orderdate > TIMESTAMP '2000-12-31' THEN 1 ELSE 0 END)
              AS BIGINT) AS v_date_range,
            max(o_orderdate) AS max_date
          FROM orders)
        SELECT c."check" AS "check", n AS n_checked, c.violations AS n_violations,
          CAST(CASE WHEN c.violations = 0 THEN 1 ELSE 0 END AS BIGINT)
            AS passed
        FROM agg, LATERAL (
          SELECT '01_not_null_orderdate' AS "check",
            v_null_date AS violations
          UNION ALL SELECT '02_unique_orderkey', n - n_key
          UNION ALL SELECT '03_accepted_status', v_status
          UNION ALL SELECT '04_accepted_status_legacy', v_status_legacy
          UNION ALL SELECT '05_price_in_range', v_price_range
          UNION ALL SELECT '06_priority_format', v_prio_format
          UNION ALL SELECT '07_date_in_range', v_date_range
          UNION ALL SELECT '08_fresh_and_voluminous',
            CAST(CASE WHEN max_date < TIMESTAMP '2001-01-01'
              THEN 1 ELSE 0 END AS BIGINT)
            + CAST(CASE WHEN n < 1000 THEN 1 ELSE 0 END AS BIGINT)
        ) c
        ORDER BY c."check"""")),

    "q303_fd_discovery" -> Q(
      // Functional-dependency discovery (TANE's g3 error measure): for
      // each candidate FD a -> b, the minimum fraction of rows to delete
      // for the dependency to hold exactly — computed as two hash aggs
      // (group counts on (a, b), then per-a keep the argmax-b mass), no
      // pairwise comparison anywhere. Candidates span one exact FD
      // (custkey -> segment through the join), one near-FD and two weak
      // ones, so strengths separate. This is the profiling pass schema
      // inference and key detection run at ingest.
      build = (s, dir) => {
        def g3(name: String, df: DataFrame, a: String, b: String)
            : DataFrame = {
          val ab = df.groupBy(col(a), col(b)).agg(count(lit(1)).as("cnt"))
          ab.groupBy(col(a))
            .agg(sum(col("cnt")).as("na"), max(col("cnt")).as("keep"))
            .agg(sum(col("na")).as("n"),
              sum(col("na") - col("keep")).as("n_violations"))
            .select(lit(name).as("fd"), col("n"), col("n_violations"),
              round(lit(1.0) - col("n_violations").cast("double")
                / col("n").cast("double"), 6).as("strength"),
              (col("n_violations") === 0).cast("long").as("exact"))
        }
        val oc = table(s, dir, "orders")
          .join(table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
        Seq(
          g3("custkey->mktsegment", oc, "o_custkey", "c_mktsegment"),
          g3("lineitem.orderkey->returnflag", table(s, dir, "lineitem"),
            "l_orderkey", "l_returnflag"),
          g3("nationkey->mktsegment", oc, "c_nationkey", "c_mktsegment"),
          g3("part.brand->type", table(s, dir, "part"), "p_brand", "p_type")
        ).reduce(_ unionByName _).orderBy("fd")
      },
      oracle = Some("""
        WITH oc AS (
          SELECT o_custkey, c_mktsegment, c_nationkey
          FROM orders JOIN customer ON o_custkey = c_custkey),
        f1 AS (
          SELECT o_custkey AS a, c_mktsegment AS b, count(*) AS cnt
          FROM oc GROUP BY 1, 2),
        f1a AS (SELECT a, sum(cnt) AS na, max(cnt) AS keep FROM f1 GROUP BY a),
        f2 AS (
          SELECT l_orderkey AS a, l_returnflag AS b, count(*) AS cnt
          FROM lineitem GROUP BY 1, 2),
        f2a AS (SELECT a, sum(cnt) AS na, max(cnt) AS keep FROM f2 GROUP BY a),
        f3 AS (
          SELECT c_nationkey AS a, c_mktsegment AS b, count(*) AS cnt
          FROM oc GROUP BY 1, 2),
        f3a AS (SELECT a, sum(cnt) AS na, max(cnt) AS keep FROM f3 GROUP BY a),
        f4 AS (
          SELECT p_brand AS a, p_type AS b, count(*) AS cnt
          FROM part GROUP BY 1, 2),
        f4a AS (SELECT a, sum(cnt) AS na, max(cnt) AS keep FROM f4 GROUP BY a),
        u AS (
          SELECT 'custkey->mktsegment' AS fd, CAST(sum(na) AS BIGINT) AS n,
            CAST(sum(na - keep) AS BIGINT) AS n_violations FROM f1a
          UNION ALL
          SELECT 'lineitem.orderkey->returnflag', CAST(sum(na) AS BIGINT),
            CAST(sum(na - keep) AS BIGINT) FROM f2a
          UNION ALL
          SELECT 'nationkey->mktsegment', CAST(sum(na) AS BIGINT),
            CAST(sum(na - keep) AS BIGINT) FROM f3a
          UNION ALL
          SELECT 'part.brand->type', CAST(sum(na) AS BIGINT),
            CAST(sum(na - keep) AS BIGINT) FROM f4a)
        SELECT fd, n, n_violations,
          round(1.0 - CAST(n_violations AS DOUBLE) / CAST(n AS DOUBLE), 6)
            AS strength,
          CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
            AS exact
        FROM u ORDER BY fd""")),

    "q304_key_islands" -> Q(
      // Gaps-and-islands over a key subset WITHOUT any sort: the
      // F-status order keys (a filtered export whose contiguity is being
      // audited). Total gap mass is pure aggregate arithmetic
      // (span − distinct); the ISLAND count needs adjacency — detected
      // by the k+1 self-equi-join (islands = keys whose predecessor is
      // absent), a shuffle-free-on-broadcast hash join instead of the
      // classic sort + lag() scan. The fully-dense orderkey domain makes
      // the unfiltered twin zero-gap, so the filtered arm carries the
      // statistical power.
      build = (s, dir) => {
        val keys = table(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey").as("k")).distinct()
        val pred = keys.select((col("k") + 1).as("k"))
          .withColumn("__prev", lit(1))
        val islands = keys.join(pred, Seq("k"), "left")
          .agg(count(lit(1)).as("n_distinct"),
            sum(col("__prev").isNull.cast("long")).as("n_islands"))
        val span = keys.agg(min(col("k")).as("k_min"),
          max(col("k")).as("k_max"))
        islands.crossJoin(broadcast(span))
          .select(col("n_distinct"), col("k_min"), col("k_max"),
            (col("k_max") - col("k_min") + 1 - col("n_distinct"))
              .as("n_gap_keys"),
            col("n_islands"),
            round(col("n_distinct").cast("double")
              / (col("k_max") - col("k_min") + 1).cast("double"), 6)
              .as("density"))
      },
      oracle = Some("""
        WITH keys AS (
          SELECT DISTINCT o_orderkey AS k FROM orders
          WHERE o_orderstatus = 'F'),
        isl AS (
          SELECT count(*) AS n_distinct,
            CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS n_islands
          FROM keys a LEFT JOIN (SELECT k + 1 AS k FROM keys) p
            ON a.k = p.k),
        span AS (SELECT min(k) AS k_min, max(k) AS k_max FROM keys)
        SELECT n_distinct, k_min, k_max,
          k_max - k_min + 1 - n_distinct AS n_gap_keys,
          n_islands,
          round(CAST(n_distinct AS DOUBLE)
            / CAST(k_max - k_min + 1 AS DOUBLE), 6) AS density
        FROM isl CROSS JOIN span""")),

    "q305_zonemap_skipping" -> Q(
      // Zone-map (min/max statistics) skipping simulator: how many
      // "files" a 1998-only scan could prune under two physical layouts
      // — insertion order (512-key chunks of the dense orderkey: date is
      // uncorrelated with key, so almost nothing skips) vs
      // date-partitioned (monthly chunks: everything outside the window
      // skips). The audit that justifies q86/q269's layout discipline
      // with NUMBERS: per-chunk min/max aggregate → chunk-level
      // skippability → scan amplification (rows read / rows matched).
      // Two hash aggs per layout, output 2 rows.
      build = (s, dir) => {
        val lo = lit("1998-01-01").cast("timestamp")
        val hi = lit("1998-12-31 23:59:59").cast("timestamp")
        val o = table(s, dir, "orders")
        def layout(name: String, chunk: Column): DataFrame = {
          val per = o.select(chunk.as("chunk"), col("o_orderdate").as("d"))
            .groupBy(col("chunk"))
            .agg(count(lit(1)).as("n_rows"), min(col("d")).as("mn"),
              max(col("d")).as("mx"),
              sum((col("d") >= lo && col("d") <= hi).cast("long"))
                .as("n_match"))
            .withColumn("skipped",
              (col("mx") < lo || col("mn") > hi).cast("long"))
          per.agg(count(lit(1)).as("n_chunks"),
              sum(col("skipped")).as("n_skipped"),
              sum(when(col("skipped") === 0, col("n_rows"))
                .otherwise(lit(0L))).as("n_scanned"),
              sum(col("n_match")).as("n_matched"))
            .select(lit(name).as("layout"), col("n_chunks"),
              col("n_skipped"), col("n_scanned"), col("n_matched"),
              round(col("n_skipped").cast("double")
                / col("n_chunks").cast("double"), 6).as("skip_ratio"),
              round(col("n_scanned").cast("double")
                / col("n_matched").cast("double"), 6).as("scan_amp"))
        }
        layout("1_insertion_order", floor(col("o_orderkey") / 512))
          .unionByName(layout("2_date_partitioned",
            date_trunc("month", col("o_orderdate"))
              .cast("date").cast("string")))
          .orderBy("layout")
      },
      oracle = Some("""
        WITH k AS (
          SELECT CAST(floor(o_orderkey / 512) AS VARCHAR) AS chunk,
            o_orderdate AS d FROM orders),
        m AS (
          SELECT strftime(date_trunc('month', o_orderdate),
            '%Y-%m-%d') AS chunk, o_orderdate AS d FROM orders),
        pk AS (
          SELECT chunk, count(*) AS n_rows, min(d) AS mn, max(d) AS mx,
            CAST(sum(CASE WHEN d >= TIMESTAMP '1998-01-01'
              AND d <= TIMESTAMP '1998-12-31 23:59:59'
              THEN 1 ELSE 0 END) AS BIGINT) AS n_match
          FROM k GROUP BY 1),
        pm AS (
          SELECT chunk, count(*) AS n_rows, min(d) AS mn, max(d) AS mx,
            CAST(sum(CASE WHEN d >= TIMESTAMP '1998-01-01'
              AND d <= TIMESTAMP '1998-12-31 23:59:59'
              THEN 1 ELSE 0 END) AS BIGINT) AS n_match
          FROM m GROUP BY 1),
        s AS (
          SELECT '1_insertion_order' AS layout, count(*) AS n_chunks,
            CAST(sum(CASE WHEN mx < TIMESTAMP '1998-01-01'
              OR mn > TIMESTAMP '1998-12-31 23:59:59'
              THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
            CAST(sum(CASE WHEN mx < TIMESTAMP '1998-01-01'
              OR mn > TIMESTAMP '1998-12-31 23:59:59'
              THEN 0 ELSE n_rows END) AS BIGINT) AS n_scanned,
            CAST(sum(n_match) AS BIGINT) AS n_matched
          FROM pk
          UNION ALL
          SELECT '2_date_partitioned', count(*),
            CAST(sum(CASE WHEN mx < TIMESTAMP '1998-01-01'
              OR mn > TIMESTAMP '1998-12-31 23:59:59'
              THEN 1 ELSE 0 END) AS BIGINT),
            CAST(sum(CASE WHEN mx < TIMESTAMP '1998-01-01'
              OR mn > TIMESTAMP '1998-12-31 23:59:59'
              THEN 0 ELSE n_rows END) AS BIGINT),
            CAST(sum(n_match) AS BIGINT)
          FROM pm)
        SELECT layout, n_chunks, n_skipped, n_scanned, n_matched,
          round(CAST(n_skipped AS DOUBLE) / CAST(n_chunks AS DOUBLE), 6)
            AS skip_ratio,
          round(CAST(n_scanned AS DOUBLE) / CAST(n_matched AS DOUBLE), 6)
            AS scan_amp
        FROM s ORDER BY layout""")),

    "q306_lateness_grid" -> Q(
      // Watermark-delay planning from batch history: for each candidate
      // delay (0/1/2/6/24 h), how many events would arrive LATE — event
      // time below the running max event time (over arrival order =
      // event_id) minus the delay. The running max uses the PrefixSum
      // decomposition instead of a data-sized global window: per-chunk
      // maxima (event_id div 1024) prefix-combine on the BOUNDED chunk
      // frame, then a chunk-PARTITIONED running max finishes within
      // chunks — the distributed-scan shape that survives any scale.
      // The grid is a 5-literal explode over the per-event lateness.
      build = (s, dir) => {
        // Chunk width adapts so the chunk frame stays <= 32 rows at ANY
        // scale (PrefixSum's bucket discipline): the global prefix-max
        // window below runs on that bounded frame only.
        val raw = table(s, dir, "events")
          .select(col("event_id"), unix_micros(col("ts")).as("tus"))
        val mx = raw.agg(max(col("event_id")).as("mx_id"))
        val ev = raw.crossJoin(broadcast(mx))
          .withColumn("width",
            greatest(lit(1024L), floor(col("mx_id") / 32) + 1))
          .withColumn("chunk", floor(col("event_id") / col("width")))
          .select(col("event_id"), col("tus"), col("chunk"))
        val chunkMax = ev.groupBy(col("chunk"))
          .agg(max(col("tus")).as("cmax"))
        val prior = chunkMax
          .withColumn("prev_max", max(col("cmax")).over(
            Window.orderBy(col("chunk"))
              .rowsBetween(Window.unboundedPreceding, -1)))
        val wIn = Window.partitionBy(col("chunk")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val withMax = ev.join(broadcast(prior.select(col("chunk"),
            col("prev_max"))), Seq("chunk"))
          .withColumn("run_max",
            greatest(max(col("tus")).over(wIn),
              coalesce(col("prev_max"), lit(Long.MinValue))))
        val hours = Seq(0L, 1L, 2L, 6L, 24L)
        withMax.select(col("tus"), col("run_max"), explode(array(
            hours.map(h => lit(h)): _*)).as("delay_h"))
          .withColumn("late",
            (col("tus") < col("run_max") - col("delay_h") * 3600000000L)
              .cast("long"))
          .groupBy(col("delay_h"))
          .agg(count(lit(1)).as("n"), sum(col("late")).as("n_late"))
          .select(col("delay_h"), col("n"), col("n_late"),
            round(col("n_late").cast("double") / col("n").cast("double"),
              6).as("late_rate"))
          .orderBy("delay_h")
      },
      oracle = Some("""
        WITH ev AS (
          SELECT event_id, epoch_us(ts) AS tus FROM events),
        rm AS (
          SELECT event_id, tus,
            max(tus) OVER (ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS run_max
          FROM ev),
        grid AS (SELECT unnest([0, 1, 2, 6, 24]) AS delay_h),
        l AS (
          SELECT delay_h, tus, run_max,
            CASE WHEN tus < run_max - delay_h * 3600000000
              THEN 1 ELSE 0 END AS late
          FROM rm CROSS JOIN grid)
        SELECT CAST(delay_h AS BIGINT) AS delay_h, count(*) AS n,
          CAST(sum(late) AS BIGINT) AS n_late,
          round(CAST(sum(late) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
            AS late_rate
        FROM l GROUP BY 1 ORDER BY 1""")),

    "q307_shapley_attribution" -> Q(
      // Exact Shapley-value channel attribution (Shapley 1953; the
      // game-theoretic completion of q146's heuristic multi-touch rules):
      // coalition value v(S) = # converting users whose touched-channel
      // set is contained in S, over channels {view, click, signup},
      // conversion = any purchase. ONE scan reduces users to an 8-row
      // mask frame; the 2^3 coalition lattice, both v-lookups and the
      // factorial weights are literal/broadcast arithmetic on that
      // bounded frame. Weights kept as exact sixths (w6 in {2,1,2}) so
      // phi6 is an exact integer — the double phi is one identical
      // division on both engines. At any scale the only data-sized work
      // is the per-user aggregate.
      build = (s, dir) => {
        import s.implicits._
        val peru = table(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(
            (max(when(col("event_type") === "view", 1).otherwise(0))
              + max(when(col("event_type") === "click", 2).otherwise(0))
              + max(when(col("event_type") === "signup", 4).otherwise(0)))
              .as("mask"),
            max(when(col("event_type") === "purchase", 1).otherwise(0))
              .as("conv"))
        val byMask = peru.groupBy(col("mask"))
          .agg(sum(col("conv")).as("nconv")) // <= 8 rows
        val coal = (0 to 7).toDF("cs")
        // v(S): sum of converting mass over masks contained in S
        val v = coal.join(broadcast(byMask),
            col("mask").bitwiseAND(col("cs")) === col("mask"), "left")
          .groupBy(col("cs"))
          .agg(coalesce(sum(col("nconv")), lit(0L)).as("v"))
        val ch = Seq(("click", 2), ("signup", 4), ("view", 1))
          .toDF("channel", "bit")
        val v0 = v.select(col("cs").as("s0"), col("v").as("va"))
        val v1 = v.select(col("cs").as("s1"), col("v").as("vb"))
        ch.join(broadcast(v0), col("s0").bitwiseAND(col("bit")) === 0)
          .join(broadcast(v1), col("s1") === col("s0") + col("bit"))
          .withColumn("sz", (col("s0").bitwiseAND(1)
            + shiftright(col("s0"), 1).bitwiseAND(1)
            + shiftright(col("s0"), 2).bitwiseAND(1)))
          .withColumn("w6", when(col("sz") === 1, 1).otherwise(2))
          .groupBy(col("channel"))
          .agg(sum(col("w6") * (col("vb") - col("va"))).as("phi6"))
          .select(col("channel"), col("phi6"),
            round(col("phi6").cast("double") / lit(6.0), 6).as("phi"))
          .orderBy(col("channel"))
      },
      oracle = Some("""
        WITH peru AS (
          SELECT user_id,
            max(CASE WHEN event_type='view' THEN 1 ELSE 0 END)
            + max(CASE WHEN event_type='click' THEN 2 ELSE 0 END)
            + max(CASE WHEN event_type='signup' THEN 4 ELSE 0 END) AS mask,
            max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS conv
          FROM events GROUP BY 1),
        bymask AS (SELECT mask, sum(conv) AS nconv FROM peru GROUP BY 1),
        coal AS (SELECT unnest([0,1,2,3,4,5,6,7]) AS cs),
        v AS (
          SELECT cs, CAST(coalesce(sum(b.nconv), 0) AS BIGINT) AS v
          FROM coal LEFT JOIN bymask b ON (b.mask & cs) = b.mask
          GROUP BY cs),
        ch AS (SELECT * FROM (VALUES ('view', 1), ('click', 2),
          ('signup', 4)) AS t(channel, bit)),
        marg AS (
          SELECT ch.channel,
            CASE WHEN ((v0.cs & 1) + ((v0.cs >> 1) & 1)
              + ((v0.cs >> 2) & 1)) = 1 THEN 1 ELSE 2 END AS w6,
            v1.v - v0.v AS dv
          FROM ch
          JOIN v v0 ON (v0.cs & ch.bit) = 0
          JOIN v v1 ON v1.cs = v0.cs + ch.bit)
        SELECT channel, CAST(sum(w6 * dv) AS BIGINT) AS phi6,
          round(CAST(sum(w6 * dv) AS DOUBLE) / 6.0, 6) AS phi
        FROM marg GROUP BY 1 ORDER BY 1""")),

    "q308_jackknife_se" -> Q(
      // Delete-one-GROUP jackknife standard error (Tukey; the design-
      // robust SE for clustered data, complementing q190's bootstrap and
      // q252's design effect): leave-one-nation-out means of customer
      // acctbal by moment subtraction — ONE exact-decimal scan builds the
      // 25-group moment frame; every leave-one-out mean is arithmetic on
      // that bounded frame against its broadcast total (zero re-scans —
      // the same complement-moments trick as q283/q291). Each loo mean is
      // snapped at 8 decimals, then the jackknife variance runs in exact
      // decimal on the snapped values, so the SE is combine-order- and
      // engine-independent.
      build = (s, dir) => {
        val per = table(s, dir, "customer")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_g"),
            sum(col("c_acctbal").cast("decimal(18,6)")).as("s_g"))
        val tot = per.agg(sum(col("n_g")).as("nn"),
          sum(col("s_g")).cast("decimal(24,6)").as("ss"),
          count(lit(1)).as("g"))
        per.crossJoin(broadcast(tot))
          .withColumn("loo", round((col("ss") - col("s_g"))
            .cast("double") / (col("nn") - col("n_g")), 8))
          .agg(
            max(col("g")).as("g"),
            round(max(col("ss")).cast("double") / max(col("nn")), 8)
              .as("theta"),
            min(col("loo")).as("theta_loo_min"),
            max(col("loo")).as("theta_loo_max"),
            sum(col("loo").cast("decimal(24,8)")).as("sl"),
            sum((col("loo").cast("decimal(14,8)")
              * col("loo").cast("decimal(14,8)")).cast("decimal(38,16)"))
              .as("sl2"))
          .select(col("g"), col("theta"), col("theta_loo_min"),
            col("theta_loo_max"),
            round(sqrt((col("g") - 1).cast("double") / col("g")
              * (col("sl2").cast("double")
                - col("sl").cast("double") * col("sl").cast("double")
                  / col("g"))), 8).as("se_jack"))
      },
      oracle = Some("""
        WITH per AS (
          SELECT c_nationkey, count(*) AS n_g,
            sum(CAST(c_acctbal AS DECIMAL(18,6))) AS s_g
          FROM customer GROUP BY 1),
        tot AS (
          SELECT sum(n_g) AS nn, CAST(sum(s_g) AS DECIMAL(24,6)) AS ss,
            count(*) AS g
          FROM per),
        loo AS (
          SELECT g, nn, ss,
            round(CAST(ss - s_g AS DOUBLE) / (nn - n_g), 8) AS loo
          FROM per CROSS JOIN tot)
        SELECT CAST(max(g) AS BIGINT) AS g,
          round(CAST(max(ss) AS DOUBLE) / max(nn), 8) AS theta,
          min(loo) AS theta_loo_min,
          max(loo) AS theta_loo_max,
          round(sqrt(CAST(max(g) - 1 AS DOUBLE) / max(g)
            * (CAST(sum(CAST(CAST(loo AS DECIMAL(19,8))
                * CAST(loo AS DECIMAL(19,8)) AS DECIMAL(38,16)))
                AS DOUBLE)
              - CAST(sum(CAST(loo AS DECIMAL(24,8))) AS DOUBLE)
                * CAST(sum(CAST(loo AS DECIMAL(24,8))) AS DOUBLE)
                / max(g))), 8) AS se_jack
        FROM loo""")),

    "q309_good_turing" -> Q(
      // Good-Turing frequency smoothing (Good 1953; the classical
      // unseen-mass estimator behind Katz backoff and vocabulary-size
      // auditing): corpus unigram counts r -> frequency-of-frequencies
      // N_r -> smoothed r* = (r+1) N_{r+1} / N_r. The spectrum frame is
      // bounded (distinct COUNT VALUES, not distinct terms — zipfian
      // corpora have a few hundred at any scale), and the r+1 adjacency
      // is the q304 self-equi-join trick on that bounded frame: no sort,
      // no window anywhere. p1 (unseen-mass share, N_1/N) rides on every
      // row from the broadcast total.
      build = (s, dir) => {
        val counts = table(s, dir, "documents")
          .select(explode(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("r"))
        val spectrum = counts.groupBy(col("r"))
          .agg(count(lit(1)).as("n_r"))
        val tot = spectrum.agg(
          sum(col("r") * col("n_r")).as("n_tokens"),
          coalesce(sum(when(col("r") === 1, col("n_r"))), lit(0L))
            .as("n1"))
        val next = spectrum.select((col("r") - 1).as("r"),
          col("n_r").as("n_next"))
        spectrum.join(next, Seq("r"), "left")
          .crossJoin(broadcast(tot))
          .select(col("r"), col("n_r"),
            round(when(col("n_next").isNotNull,
              (col("r") + 1).cast("double") * col("n_next")
                / col("n_r")), 6).as("r_star"),
            round(col("n1").cast("double") / col("n_tokens"), 8)
              .as("p_unseen"))
          .orderBy(col("r"))
      },
      oracle = Some("""
        WITH counts AS (
          SELECT w, count(*) AS r
          FROM (SELECT unnest(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'))
                  AS w FROM documents)
          GROUP BY 1),
        spectrum AS (SELECT r, count(*) AS n_r FROM counts GROUP BY 1),
        tot AS (
          SELECT sum(r * n_r) AS n_tokens,
            coalesce(sum(CASE WHEN r = 1 THEN n_r END), 0) AS n1
          FROM spectrum)
        SELECT s.r, s.n_r,
          round(CASE WHEN nx.n_r IS NOT NULL
            THEN CAST(s.r + 1 AS DOUBLE) * nx.n_r / s.n_r END, 6)
            AS r_star,
          round(CAST(n1 AS DOUBLE) / n_tokens, 8) AS p_unseen
        FROM spectrum s
        LEFT JOIN spectrum nx ON nx.r = s.r + 1
        CROSS JOIN tot
        ORDER BY s.r""")),

    "q310_friedman_test" -> Q(
      // Friedman rank test (Friedman 1937; the nonparametric repeated-
      // measures ANOVA, completing the battery next to q213/q214/q240):
      // blocks = order months, treatments = the 5 order priorities,
      // response = exact-decimal monthly revenue. Months missing any
      // priority are dropped (the test requires complete blocks). Ranks
      // live in a keyed window over the bounded month frame. Ties on
      // exact-decimal revenue are practically impossible (and cross-
      // engine-identical when they happen), but a tie under plain
      // rank() would silently break the closed-form moments (rank sums
      // no longer total b*k*(k+1)/2) — so ranks are tie-AVERAGED
      // (rank + (ties-1)/2, the standard midrank), which preserves the
      // rank-sum identity exactly; the statistic is the standard
      // uncorrected Friedman chi-square (the tie-correction denominator
      // is deliberately omitted — stated, and zero-impact tie-free).
      build = (s, dir) => {
        val cell = table(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("m"),
            col("o_orderpriority"))
          .agg(msum(col("o_totalprice")).as("rev"))
        val full = cell.groupBy(col("m"))
          .agg(count(lit(1)).as("k_m"))
          .filter(col("k_m") === 5)
          .select(col("m"))
        val ranked = cell.join(broadcast(full), Seq("m"))
          .withColumn("rk", rank().over(
              Window.partitionBy(col("m")).orderBy(col("rev")))
            + (count(lit(1)).over(
              Window.partitionBy(col("m"), col("rev"))) - 1) / lit(2.0))
        val sums = ranked.groupBy(col("o_orderpriority"))
          .agg(sum(col("rk")).as("r_sum"), count(lit(1)).as("b"))
        val stat = sums.agg(max(col("b")).as("b"),
            sum(col("r_sum") * col("r_sum")).as("ssq"))
          .select(col("b"), round(lit(12.0) * col("ssq")
              / (col("b") * 5 * 6) - lit(3.0) * col("b") * 6, 6)
            .as("chi2"))
        sums.crossJoin(broadcast(stat.select(col("b").as("n_blocks"),
            col("chi2"))))
          .select(col("o_orderpriority"), col("r_sum"),
            col("n_blocks"), col("chi2"))
          .orderBy(col("o_orderpriority"))
      },
      oracle = Some(s"""
        WITH cell AS (
          SELECT date_trunc('month', o_orderdate) AS m, o_orderpriority,
            ${sqlMsum("o_totalprice")} AS rev
          FROM orders GROUP BY 1, 2),
        full_m AS (
          SELECT m FROM cell GROUP BY m HAVING count(*) = 5),
        ranked AS (
          SELECT c.o_orderpriority,
            rank() OVER (PARTITION BY c.m ORDER BY c.rev)
              + (count(*) OVER (PARTITION BY c.m, c.rev) - 1) / 2.0 AS rk
          FROM cell c JOIN full_m USING (m)),
        sums AS (
          SELECT o_orderpriority, CAST(sum(rk) AS DOUBLE) AS r_sum,
            count(*) AS b
          FROM ranked GROUP BY 1),
        stat AS (
          SELECT max(b) AS n_blocks,
            round(12.0 * sum(r_sum * r_sum) / (max(b) * 5 * 6)
              - 3.0 * max(b) * 6, 6) AS chi2
          FROM sums)
        SELECT o_orderpriority, r_sum, n_blocks, chi2
        FROM sums CROSS JOIN stat
        ORDER BY o_orderpriority""")),

    "q311_bitemporal_snapshot" -> Q(
      // Point-in-time ("AS OF") snapshot reconstruction from the q85 SCD2
      // history — the time-travel read that makes a versioned dimension
      // useful: for each probe date, the dimension state is the interval
      // containing it, here rolled up to customers-per-priority. The
      // probe frame is tiny and broadcast, so the interval containment
      // join is one pass over the history (itself one shuffle on the
      // key); no per-probe rescans of the fact log. The open current row
      // uses q85's 9999-12-31 NTZ sentinel, making containment a plain
      // BETWEEN with no NULL logic.
      build = (s, dir) => {
        import s.implicits._
        val hist = Scd2.fromChangeLog(
            table(s, dir, "orders").select(
              col("o_custkey"), col("o_orderdate"),
              col("o_orderpriority"), col("o_orderkey")),
            keyCols = Seq("o_custkey"), tsCol = "o_orderdate",
            attrCols = Seq("o_orderpriority"), tieBreakCol = "o_orderkey")
          .withColumn("effective_to", coalesce(col("effective_to"),
            lit("9999-12-31 00:00:00").cast("timestamp_ntz")))
        val probes = Seq("1993-07-01", "1995-01-01", "1997-06-01")
          .toDF("as_of_s")
          .select(col("as_of_s").cast("date").as("as_of"))
        hist.join(broadcast(probes),
            col("effective_from") <= col("as_of").cast("timestamp_ntz")
              && col("as_of").cast("timestamp_ntz") < col("effective_to"))
          .groupBy(col("as_of"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("as_of"), col("o_orderpriority"))
      },
      oracle = Some("""
        WITH chg AS (
          SELECT o_custkey, o_orderdate, o_orderpriority, o_orderkey,
            lag(o_orderpriority) OVER w AS prev
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey)),
        hist AS (
          SELECT o_custkey, o_orderpriority,
            o_orderdate AS effective_from,
            coalesce(lead(o_orderdate) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey),
              TIMESTAMP '9999-12-31') AS effective_to
          FROM chg WHERE prev IS NULL OR prev <> o_orderpriority),
        probes AS (SELECT unnest([DATE '1993-07-01', DATE '1995-01-01',
          DATE '1997-06-01']) AS as_of)
        SELECT as_of, o_orderpriority, count(*) AS n_customers
        FROM hist JOIN probes
          ON effective_from <= CAST(as_of AS TIMESTAMP)
          AND CAST(as_of AS TIMESTAMP) < effective_to
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    "q312_segmented_regression" -> Q(
      // Segmented (broken-stick) regression with breakpoint selection —
      // the trend-shift quantifier that completes q171's mean-shift
      // changepoint and q139's Theil-Sen: daily 1995 revenue vs day
      // index, one OLS per side of each candidate month boundary, winner
      // = minimum total SSE. ONE scan builds the <=365-row day frame
      // with y quantized to whole REVENUE-THOUSANDS via floor (floor is
      // tie-free, and integer y keeps every moment — Sy, Sxy, Syy —
      // an exact integer under 2^53, so the decimal->double casts are
      // EXACT in both engines; a raw-dollar Syy needs 21 digits, where
      // DuckDB's two-step int128->double conversion can land one ulp
      // off Java's correctly-rounded BigDecimal). The 11-candidate grid
      // crosses against the bounded frame (<=4k rows); the double
      // slope/SSE formulas then evaluate identically in both engines.
      // Zero windows, zero sorts over raw data.
      build = (s, dir) => {
        import s.implicits._
        val day0 = lit("1995-01-01").cast("date")
        val daily = table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(dec(col("o_totalprice"))).as("s"))
          .select(datediff(col("day"), day0).as("x"),
            floor(col("s").cast("double") / lit(1000.0)).as("yd"))
        val cands = (2 to 12).map(m => f"1995-$m%02d-01").toDF("bp_s")
          .select(col("bp_s").cast("date").as("bp"),
            datediff(col("bp_s").cast("date"), day0).as("bx"))
        val m = daily.crossJoin(broadcast(cands))
          .withColumn("lft", (col("x") < col("bx")).cast("int"))
          .groupBy(col("bp"))
          .agg(
            sum(col("lft")).as("n_l"),
            sum(col("lft") * col("x")).as("sx_l"),
            sum(when(col("lft") === 1, col("yd"))).as("sy_l"),
            sum(when(col("lft") === 1, col("yd") * col("x"))).as("sxy_l"),
            sum(col("lft") * col("x") * col("x")).as("sxx_l"),
            sum(when(col("lft") === 1, col("yd") * col("yd")))
              .as("syy_l"),
            sum(lit(1) - col("lft")).as("n_r"),
            sum((lit(1) - col("lft")) * col("x")).as("sx_r"),
            sum(when(col("lft") === 0, col("yd"))).as("sy_r"),
            sum(when(col("lft") === 0, col("yd") * col("x"))).as("sxy_r"),
            sum((lit(1) - col("lft")) * col("x") * col("x")).as("sxx_r"),
            sum(when(col("lft") === 0, col("yd") * col("yd")))
              .as("syy_r"))
        def side(sfx: String): (Column, Column) = {
          val n = col(s"n_$sfx").cast("double")
          val sx = col(s"sx_$sfx").cast("double")
          val sy = col(s"sy_$sfx").cast("double")
          val sxy = col(s"sxy_$sfx").cast("double")
          val sxx = col(s"sxx_$sfx").cast("double")
          val syy = col(s"syy_$sfx").cast("double")
          val sxxc = sxx - sx * sx / n
          val sxyc = sxy - sx * sy / n
          val syyc = syy - sy * sy / n
          (sxyc / sxxc, syyc - sxyc * sxyc / sxxc)
        }
        val (slL, sseL) = side("l")
        val (slR, sseR) = side("r")
        val scored = m.select(col("bp"),
          round(slL, 6).as("slope_left"),
          round(slR, 6).as("slope_right"),
          round(sseL + sseR, 4).as("sse"))
        val best = scored.agg(min(col("sse")).as("min_sse"))
          .crossJoin(scored)
          .filter(col("sse") === col("min_sse"))
          .agg(min(col("bp")).as("best_bp"))
        scored.crossJoin(broadcast(best))
          .select(col("bp"), col("slope_left"), col("slope_right"),
            col("sse"), (col("bp") === col("best_bp")).cast("int")
              .as("is_best"))
          .orderBy(col("bp"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT date_diff('day', DATE '1995-01-01',
              CAST(o_orderdate AS DATE)) AS x,
            CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DOUBLE) / 1000.0) AS BIGINT) AS yd
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate < TIMESTAMP '1996-01-01'
          GROUP BY CAST(o_orderdate AS DATE)),
        cands AS (
          SELECT bp, date_diff('day', DATE '1995-01-01', bp) AS bx
          FROM (SELECT unnest([DATE '1995-02-01', DATE '1995-03-01',
            DATE '1995-04-01', DATE '1995-05-01', DATE '1995-06-01',
            DATE '1995-07-01', DATE '1995-08-01', DATE '1995-09-01',
            DATE '1995-10-01', DATE '1995-11-01', DATE '1995-12-01'])
            AS bp)),
        mom AS (
          SELECT bp,
            sum(CASE WHEN x < bx THEN 1 ELSE 0 END) AS n_l,
            sum(CASE WHEN x < bx THEN x ELSE 0 END) AS sx_l,
            sum(CASE WHEN x < bx THEN yd END) AS sy_l,
            sum(CASE WHEN x < bx THEN yd * x END) AS sxy_l,
            sum(CASE WHEN x < bx THEN x * x ELSE 0 END) AS sxx_l,
            sum(CASE WHEN x < bx THEN yd * yd END) AS syy_l,
            sum(CASE WHEN x >= bx THEN 1 ELSE 0 END) AS n_r,
            sum(CASE WHEN x >= bx THEN x ELSE 0 END) AS sx_r,
            sum(CASE WHEN x >= bx THEN yd END) AS sy_r,
            sum(CASE WHEN x >= bx THEN yd * x END) AS sxy_r,
            sum(CASE WHEN x >= bx THEN x * x ELSE 0 END) AS sxx_r,
            sum(CASE WHEN x >= bx THEN yd * yd END) AS syy_r
          FROM daily CROSS JOIN cands
          GROUP BY bp),
        scored AS (
          SELECT bp,
            round((CAST(sxy_l AS DOUBLE) - CAST(sx_l AS DOUBLE)
                * CAST(sy_l AS DOUBLE) / CAST(n_l AS DOUBLE))
              / (CAST(sxx_l AS DOUBLE) - CAST(sx_l AS DOUBLE)
                * CAST(sx_l AS DOUBLE) / CAST(n_l AS DOUBLE)), 6)
              AS slope_left,
            round((CAST(sxy_r AS DOUBLE) - CAST(sx_r AS DOUBLE)
                * CAST(sy_r AS DOUBLE) / CAST(n_r AS DOUBLE))
              / (CAST(sxx_r AS DOUBLE) - CAST(sx_r AS DOUBLE)
                * CAST(sx_r AS DOUBLE) / CAST(n_r AS DOUBLE)), 6)
              AS slope_right,
            round(
              ((CAST(syy_l AS DOUBLE) - CAST(sy_l AS DOUBLE)
                  * CAST(sy_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                - (CAST(sxy_l AS DOUBLE) - CAST(sx_l AS DOUBLE)
                    * CAST(sy_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                  * (CAST(sxy_l AS DOUBLE) - CAST(sx_l AS DOUBLE)
                    * CAST(sy_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                  / (CAST(sxx_l AS DOUBLE) - CAST(sx_l AS DOUBLE)
                    * CAST(sx_l AS DOUBLE) / CAST(n_l AS DOUBLE)))
              + ((CAST(syy_r AS DOUBLE) - CAST(sy_r AS DOUBLE)
                  * CAST(sy_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                - (CAST(sxy_r AS DOUBLE) - CAST(sx_r AS DOUBLE)
                    * CAST(sy_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                  * (CAST(sxy_r AS DOUBLE) - CAST(sx_r AS DOUBLE)
                    * CAST(sy_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                  / (CAST(sxx_r AS DOUBLE) - CAST(sx_r AS DOUBLE)
                    * CAST(sx_r AS DOUBLE) / CAST(n_r AS DOUBLE))), 4)
              AS sse
          FROM mom),
        best AS (
          SELECT min(bp) AS best_bp FROM scored
          WHERE sse = (SELECT min(sse) FROM scored))
        SELECT bp, slope_left, slope_right, sse,
          CAST(CASE WHEN bp = best_bp THEN 1 ELSE 0 END AS INTEGER)
            AS is_best
        FROM scored CROSS JOIN best
        ORDER BY bp""")),

    "q313_permutation_test" -> Q(
      // Monte-Carlo permutation test of the two-arm mean difference
      // (purchase values, arms by user parity), DETERMINISTIC across
      // engines and partitionings: permutation b reassigns each user by
      // the parity of md5(user:b) — a seeded hash, not an RNG, so both
      // engines generate the SAME 64 permutations (the q284/q51 hashing
      // discipline applied to inference). Shape: one scan reduces to the
      // per-user moment frame; the 64-way explode amplifies only that
      // aggregated frame, and the map-side partial agg collapses it to
      // 128 (b, side) groups before the shuffle. Exact-decimal arm sums
      // make every diff reproducible; p uses the add-one permutation
      // convention (#{|d_b| >= |d_obs|} + 1) / (B + 1).
      build = (s, dir) => {
        // finite-observation + identified-unit contract (see q293/q300)
        val peru = table(s, dir, "events")
          .filter(col("event_type") === "purchase"
            && col("user_id").isNotNull && finite(col("value")))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_u"),
            sum(col("value").cast("decimal(18,6)")).as("s_u"))
        // aggregate Column (mean difference between sides), evaluated
        // against whatever frame the enclosing agg() groups
        def diffOf(sideCol: Column): Column =
          round(
            (sum(when(sideCol === 0, col("s_u"))).cast("double")
              / sum(when(sideCol === 0, col("n_u"))))
            - (sum(when(sideCol === 1, col("s_u"))).cast("double")
              / sum(when(sideCol === 1, col("n_u")))), 8)
        val obs = peru.agg(
          diffOf((col("user_id") % 2).cast("int")).as("d_obs"))
        val perms = peru
          .select(col("user_id"), col("n_u"), col("s_u"),
            explode(sequence(lit(0), lit(63))).as("b"))
          .withColumn("side", when(substring(md5(concat(
              col("user_id").cast("string"), lit(":"),
              col("b").cast("string"))), 1, 1)
              .isin("0", "2", "4", "6", "8", "a", "c", "e"), 0)
            .otherwise(1))
          .groupBy(col("b"))
          .agg(diffOf(col("side")).as("diff"))
        val withObs = perms.crossJoin(broadcast(obs))
          .withColumn("is_extreme", // when() -> 0 on NULL diff, like the
            when(abs(col("diff")) >= abs(col("d_obs")), 1L) // oracle CASE
              .otherwise(0L))
        val p = withObs.agg(
          round((sum(col("is_extreme")) + 1).cast("double") / 65.0, 8)
            .as("p_value"))
        withObs.crossJoin(broadcast(p))
          .select(col("b"), col("diff"), col("is_extreme"),
            col("d_obs"), col("p_value"))
          .orderBy(col("b"))
      },
      oracle = Some("""
        WITH peru AS (
          SELECT user_id, count(*) AS n_u,
            sum(CAST(value AS DECIMAL(18,6))) AS s_u
          FROM events WHERE event_type = 'purchase'
            AND user_id IS NOT NULL AND isfinite(value)
          GROUP BY 1),
        obs AS (
          SELECT round(
            CAST(sum(CASE WHEN user_id % 2 = 0 THEN s_u END) AS DOUBLE)
              / sum(CASE WHEN user_id % 2 = 0 THEN n_u END)
            - CAST(sum(CASE WHEN user_id % 2 = 1 THEN s_u END) AS DOUBLE)
              / sum(CASE WHEN user_id % 2 = 1 THEN n_u END), 8) AS d_obs
          FROM peru),
        grid AS (SELECT unnest(range(0, 64)) AS b),
        sided AS (
          SELECT b, n_u, s_u,
            CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':'
              || CAST(b AS VARCHAR)), 1, 1)
              IN ('0','2','4','6','8','a','c','e') THEN 0 ELSE 1 END
              AS side
          FROM peru CROSS JOIN grid),
        perms AS (
          SELECT b, round(
            CAST(sum(CASE WHEN side = 0 THEN s_u END) AS DOUBLE)
              / sum(CASE WHEN side = 0 THEN n_u END)
            - CAST(sum(CASE WHEN side = 1 THEN s_u END) AS DOUBLE)
              / sum(CASE WHEN side = 1 THEN n_u END), 8) AS diff
          FROM sided GROUP BY b),
        ext AS (
          SELECT b, diff, d_obs,
            CASE WHEN abs(diff) >= abs(d_obs) THEN 1 ELSE 0 END
              AS is_extreme
          FROM perms CROSS JOIN obs),
        p AS (
          SELECT round(CAST(sum(is_extreme) + 1 AS DOUBLE) / 65.0, 8)
            AS p_value FROM ext)
        SELECT CAST(b AS BIGINT) AS b, diff,
          CAST(is_extreme AS BIGINT) AS is_extreme, d_obs, p_value
        FROM ext CROSS JOIN p
        ORDER BY b"""),
      bench = true),

    "q314_runs_test" -> Q(
      // Wald-Wolfowitz runs test for randomness of the daily-revenue
      // sign sequence (above/below the global mean): too FEW runs means
      // momentum, too many means oscillation — the sequence-level
      // diagnostic q149's autocorrelation approximates parametrically.
      // The above/below call compares in exact decimal (rev*n vs total,
      // the q267 trick), so no boundary row can flip between engines;
      // the adjacency lag runs on the bounded calendar-day frame
      // (PlanSpec-allowlisted); R, n0, n1 are exact integers and the
      // normal z uses one fixed double formula.
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(dec(col("o_totalprice"))).cast("decimal(14,2)")
            .as("rev"), count(lit(1)).as("n_o"))
        val tot = daily.agg(
          sum(col("rev")).cast("decimal(24,2)").as("s_all"),
          count(lit(1)).as("n_days"))
        val signed = daily.crossJoin(broadcast(tot))
          .withColumn("above",
            (col("rev") * col("n_days") > col("s_all")).cast("int"))
        val w = Window.orderBy(col("day"))
        signed
          .withColumn("chg", when(lag(col("above"), 1).over(w).isNull
            || lag(col("above"), 1).over(w) =!= col("above"), 1)
            .otherwise(0))
          .agg(max(col("n_days")).as("n_days"),
            sum(col("above")).as("n_above"),
            sum(lit(1) - col("above")).as("n_below"),
            sum(col("chg")).as("runs"))
          .select(col("n_days"), col("n_above"), col("n_below"),
            col("runs"),
            round((col("runs").cast("double")
              - (lit(2.0) * col("n_above") * col("n_below")
                / col("n_days") + 1.0))
              / sqrt(lit(2.0) * col("n_above") * col("n_below")
                * (lit(2.0) * col("n_above") * col("n_below")
                  - col("n_days"))
                / (col("n_days").cast("double") * col("n_days")
                  * (col("n_days") - 1))), 6).as("z"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
            CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DECIMAL(14,2)) AS rev
          FROM orders GROUP BY 1),
        tot AS (
          SELECT CAST(sum(rev) AS DECIMAL(24,2)) AS s_all,
            count(*) AS n_days
          FROM daily),
        signed AS (
          SELECT day,
            CASE WHEN rev * n_days > s_all THEN 1 ELSE 0 END AS above
          FROM daily CROSS JOIN tot),
        chg AS (
          SELECT above,
            CASE WHEN lag(above) OVER (ORDER BY day) IS NULL
              OR lag(above) OVER (ORDER BY day) <> above
              THEN 1 ELSE 0 END AS chg
          FROM signed),
        agg AS (
          SELECT count(*) AS n_days,
            CAST(sum(above) AS BIGINT) AS n_above,
            CAST(sum(1 - above) AS BIGINT) AS n_below,
            CAST(sum(chg) AS BIGINT) AS runs
          FROM chg)
        SELECT n_days, n_above, n_below, runs,
          round((CAST(runs AS DOUBLE)
            - (2.0 * n_above * n_below / n_days + 1.0))
            / sqrt(2.0 * n_above * n_below
              * (2.0 * n_above * n_below - n_days)
              / (CAST(n_days AS DOUBLE) * n_days * (n_days - 1))), 6)
            AS z
        FROM agg""")),

    "q315_encoding_advisor" -> Q(
      // Physical-encoding advisor (the per-column profiling pass behind
      // parquet/ORC encoding selection, quantifying q305's layout story
      // at column grain): for each orders column, exact NDV plus the
      // RUN count in insertion (orderkey) order. Runs pair each row
      // with its true SCAN predecessor via PrefixSum.withGlobalLag
      // (bucketed windows + a broadcast boundary patch — no
      // single-partition sort), and all four columns' run starts reduce
      // in ONE aggregate. The former k+1 self-equi-join was WRONG on
      // sparse keys: it counted every key GAP as a run start (caught at
      // the r10 sf1 step — 9 copy-boundary gaps, runs 999220 vs the
      // sorted-lag oracle's 999211). The advice rule is integer
      // arithmetic (dict when NDV <= 1% of rows, RLE when the mean run
      // >= 3), so the verdict can't flip on engine float quirks.
      build = (s, dir) => {
        import s.implicits._
        // key contract (r9): "insertion order" means the DENSE UNIQUE
        // key — under a duplicated key the k+1 trick (and any lag) has
        // no defined previous row, so profile one deterministic
        // representative per key (min attribute tuple, NULLS FIRST)
        val keyW = Window.partitionBy(col("o_orderkey")).orderBy(
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first,
          col("o_custkey").asc_nulls_first,
          to_date(col("o_orderdate")).asc_nulls_first)
        val o = table(s, dir, "orders")
          .withColumn("__rn", row_number().over(keyW))
          .filter(col("__rn") === 1).drop("__rn")
          .withColumn("o_odate", to_date(col("o_orderdate")))
        def runStart(c: Column, p: Column): Column =
          sum(when(p.isNull || c =!= p, 1).otherwise(0))
        val agg = PrefixSum.withGlobalLag(o, "o_orderkey",
            Seq("o_orderstatus", "o_orderpriority", "o_custkey", "o_odate"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("o_orderstatus")).as("ndv_status"),
            countDistinct(col("o_orderpriority")).as("ndv_prio"),
            countDistinct(col("o_custkey")).as("ndv_cust"),
            countDistinct(col("o_odate")).as("ndv_date"),
            runStart(col("o_orderstatus"), col("p_o_orderstatus"))
              .as("runs_status"),
            runStart(col("o_orderpriority"), col("p_o_orderpriority"))
              .as("runs_prio"),
            runStart(col("o_custkey"), col("p_o_custkey")).as("runs_cust"),
            runStart(col("o_odate"), col("p_o_odate"))
              .as("runs_date"))
        val cols = Seq(("o_custkey", "cust"), ("o_orderdate", "date"),
          ("o_orderpriority", "prio"), ("o_orderstatus", "status"))
          .toDF("column_name", "sfx")
        agg.crossJoin(cols)
          .select(col("column_name"), col("n"),
            when(col("sfx") === "status", col("ndv_status"))
              .when(col("sfx") === "prio", col("ndv_prio"))
              .when(col("sfx") === "cust", col("ndv_cust"))
              .otherwise(col("ndv_date")).as("ndv"),
            when(col("sfx") === "status", col("runs_status"))
              .when(col("sfx") === "prio", col("runs_prio"))
              .when(col("sfx") === "cust", col("runs_cust"))
              .otherwise(col("runs_date")).as("runs"))
          .select(col("column_name"), col("n"), col("ndv"), col("runs"),
            round(col("n").cast("double") / col("runs"), 4)
              .as("avg_run_len"),
            when(col("ndv") * 100 <= col("n"), "dict")
              .when(col("n") >= col("runs") * 3, "rle")
              .otherwise("plain").as("advice"))
          .orderBy(col("column_name"))
      },
      oracle = Some("""
        WITH orders1 AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY o_orderkey
              ORDER BY o_orderstatus NULLS FIRST,
                o_orderpriority NULLS FIRST, o_custkey NULLS FIRST,
                CAST(o_orderdate AS DATE) NULLS FIRST) AS rn
            FROM orders) WHERE rn = 1),
        lagged AS (
          SELECT o_orderstatus, o_orderpriority, o_custkey,
            CAST(o_orderdate AS DATE) AS o_odate,
            lag(o_orderstatus) OVER w AS p_status,
            lag(o_orderpriority) OVER w AS p_prio,
            lag(o_custkey) OVER w AS p_cust,
            lag(CAST(o_orderdate AS DATE)) OVER w AS p_date
          FROM orders1 WINDOW w AS (ORDER BY o_orderkey)),
        agg AS (
          SELECT count(*) AS n,
            count(DISTINCT o_orderstatus) AS ndv_status,
            count(DISTINCT o_orderpriority) AS ndv_prio,
            count(DISTINCT o_custkey) AS ndv_cust,
            count(DISTINCT o_odate) AS ndv_date,
            CAST(sum(CASE WHEN p_status IS NULL
              OR o_orderstatus <> p_status THEN 1 ELSE 0 END) AS BIGINT)
              AS runs_status,
            CAST(sum(CASE WHEN p_prio IS NULL
              OR o_orderpriority <> p_prio THEN 1 ELSE 0 END) AS BIGINT)
              AS runs_prio,
            CAST(sum(CASE WHEN p_cust IS NULL
              OR o_custkey <> p_cust THEN 1 ELSE 0 END) AS BIGINT)
              AS runs_cust,
            CAST(sum(CASE WHEN p_date IS NULL
              OR o_odate <> p_date THEN 1 ELSE 0 END) AS BIGINT)
              AS runs_date
          FROM lagged),
        unrolled AS (
          SELECT 'o_custkey' AS column_name, n, ndv_cust AS ndv,
            runs_cust AS runs FROM agg
          UNION ALL
          SELECT 'o_orderdate', n, ndv_date, runs_date FROM agg
          UNION ALL
          SELECT 'o_orderpriority', n, ndv_prio, runs_prio FROM agg
          UNION ALL
          SELECT 'o_orderstatus', n, ndv_status, runs_status FROM agg)
        SELECT column_name, n, ndv, runs,
          round(CAST(n AS DOUBLE) / runs, 4) AS avg_run_len,
          CASE WHEN ndv * 100 <= n THEN 'dict'
            WHEN n >= runs * 3 THEN 'rle'
            ELSE 'plain' END AS advice
        FROM unrolled
        ORDER BY column_name""")),

    "q316_ipf_raking" -> Q(
      // Survey raking / iterative proportional fitting (Deming-Stephan
      // 1940): calibrate the 5x5 segment-by-region customer cell counts
      // to uniform target margins (N/5 per row and per column) with
      // three full IPF sweeps. The cell frame is bounded (25 rows after
      // one scan), every margin sum is an exact decimal over 5 cells,
      // and the weight is SNAPPED to 8 decimals after each half-sweep —
      // the q301 Platt discipline: the snap stops cross-libm ulps from
      // compounding across iterations, and all snapped values stay
      // exactly double-representable. The oracle unrolls the same three
      // sweeps as generated CTEs.
      build = (s, dir) => {
        val cells = table(s, dir, "customer")
          .join(broadcast(table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("c_mktsegment").as("seg"), col("r_name").as("reg"))
          .agg(count(lit(1)).as("n"))
        val tot = cells.agg(sum(col("n")).as("nn"))
        var w = cells.crossJoin(broadcast(tot))
          .withColumn("w", col("n").cast("decimal(20,8)"))
        var prevCkpt: DataFrame = null
        for (_ <- 1 to 3) {
          val rowS = w.groupBy(col("seg"))
            .agg(sum(col("w")).cast("decimal(24,8)").as("sw"))
          w = w.join(broadcast(rowS), Seq("seg"))
            .withColumn("w", round(col("w").cast("double")
              * (col("nn").cast("double") / lit(5.0))
              / col("sw").cast("double"), 8).cast("decimal(20,8)"))
            .drop("sw")
          val colS = w.groupBy(col("reg"))
            .agg(sum(col("w")).cast("decimal(24,8)").as("sw"))
          w = w.join(broadcast(colS), Seq("reg"))
            .withColumn("w", round(col("w").cast("double")
              * (col("nn").cast("double") / lit(5.0))
              / col("sw").cast("double"), 8).cast("decimal(20,8)"))
            .drop("sw")
            // each half-sweep references w TWICE (margin agg + join), so
            // the lineage doubles per sweep — checkpoint the bounded
            // 25-row frame once per sweep (GraphCore's iterative-frame
            // rule) to keep plan depth linear; unpersist the stale one
            .localCheckpoint()
          if (prevCkpt != null) prevCkpt.unpersist()
          prevCkpt = w
        }
        w.select(col("seg"), col("reg"), col("n"),
            col("w").cast("double").as("w_raked"))
          .orderBy(col("seg"), col("reg"))
      },
      oracle = Some(ipfRakingOracle)),

    "q317_cochran_armitage" -> Q(
      // Cochran-Armitage trend test: does the URGENT-order share trend
      // monotonically across acctbal-quintile customer tiers? The
      // ordered-exposure rival of q111's unordered chi-square — a trend
      // the omnibus test dilutes. Tiers come from Binning's exact
      // quintile edges; the test statistic needs only the bounded
      // 5-tier (n_i, x_i) frame with integer scores s_i = tier index:
      // T = sum s_i (x_i - n_i p) and its variance are pure integer/
      // double arithmetic on that frame — one scan after the tier tag.
      build = (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders")
        // exact quintile tier by acctbal rank: ntile over a keyed-enough
        // domain would still be a global sort; instead reuse the exact
        // interpolated-quantile machinery on the snapped decimal value
        val edges = c.agg(
          expr("percentile(c_acctbal, array(0.2, 0.4, 0.6, 0.8))")
            .as("e"))
        val tiered = c.crossJoin(broadcast(edges))
          .select(col("c_custkey"),
            (when(col("c_acctbal") <= col("e").getItem(0), 1)
              .when(col("c_acctbal") <= col("e").getItem(1), 2)
              .when(col("c_acctbal") <= col("e").getItem(2), 3)
              .when(col("c_acctbal") <= col("e").getItem(3), 4)
              .otherwise(5)).as("tier"))
        val per = o.join(tiered, col("o_custkey") === col("c_custkey"))
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n_i"),
            sum(when(col("o_orderpriority") === "1-URGENT", 1)
              .otherwise(0)).as("x_i"))
        val tot = per.agg(sum(col("n_i")).as("nn"),
          sum(col("x_i")).as("xx"),
          sum(col("tier") * col("n_i")).as("sn"),
          sum(col("tier") * col("x_i")).as("sx"),
          sum(col("tier") * col("tier") * col("n_i")).as("ssn"))
        val z = tot.select(
          round((col("sx").cast("double") - col("sn").cast("double")
              * col("xx") / col("nn"))
            / sqrt((col("xx").cast("double") / col("nn"))
              * (lit(1.0) - col("xx").cast("double") / col("nn"))
              * (col("ssn").cast("double")
                - col("sn").cast("double") * col("sn") / col("nn"))),
            6).as("z_trend"))
        per.crossJoin(broadcast(z))
          .select(col("tier"), col("n_i"), col("x_i"),
            round(col("x_i").cast("double") / col("n_i"), 6)
              .as("urgent_share"),
            col("z_trend"))
          .orderBy(col("tier"))
      },
      oracle = Some("""
        WITH edges AS (
          SELECT quantile_cont(c_acctbal, [0.2, 0.4, 0.6, 0.8]) AS e
          FROM customer),
        tiered AS (
          SELECT c_custkey,
            CASE WHEN c_acctbal <= e[1] THEN 1
              WHEN c_acctbal <= e[2] THEN 2
              WHEN c_acctbal <= e[3] THEN 3
              WHEN c_acctbal <= e[4] THEN 4
              ELSE 5 END AS tier
          FROM customer CROSS JOIN edges),
        per AS (
          SELECT tier, count(*) AS n_i,
            CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1
              ELSE 0 END) AS BIGINT) AS x_i
          FROM orders JOIN tiered ON o_custkey = c_custkey
          GROUP BY tier),
        tot AS (
          SELECT CAST(sum(n_i) AS BIGINT) AS nn,
            CAST(sum(x_i) AS BIGINT) AS xx,
            CAST(sum(tier * n_i) AS BIGINT) AS sn,
            CAST(sum(tier * x_i) AS BIGINT) AS sx,
            CAST(sum(tier * tier * n_i) AS BIGINT) AS ssn
          FROM per),
        z AS (
          SELECT round((CAST(sx AS DOUBLE) - CAST(sn AS DOUBLE)
              * xx / nn)
            / sqrt((CAST(xx AS DOUBLE) / nn)
              * (1.0 - CAST(xx AS DOUBLE) / nn)
              * (CAST(ssn AS DOUBLE)
                - CAST(sn AS DOUBLE) * sn / nn)), 6) AS z_trend
          FROM tot)
        SELECT tier, n_i, x_i,
          round(CAST(x_i AS DOUBLE) / n_i, 6) AS urgent_share,
          z_trend
        FROM per CROSS JOIN z
        ORDER BY tier""")),

    "q318_durbin_watson" -> Q(
      // Durbin-Watson autocorrelation-of-residuals diagnostic for the
      // daily-revenue trend fit: the standard "is OLS lying to you"
      // check (q149 measures raw-series autocorrelation; DW measures
      // what's LEFT after the trend is removed). One scan builds the
      // bounded day frame with exact-decimal y; the OLS fit is closed-
      // form on exact moments; residuals are snapped at 6 decimals so
      // the lagged difference (on the allowlisted bounded frame) is
      // engine-identical; DW and the rho approximation are one double
      // formula each.
      build = (s, dir) => {
        val day0 = lit("1995-01-01").cast("date")
        val daily = table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(dec(col("o_totalprice"))).cast("decimal(14,2)")
            .as("yd"))
          .select(col("day"), datediff(col("day"), day0).as("x"),
            col("yd"))
        val mom = daily.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("yd")).as("sy"),
          sum(col("yd") * col("x")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        val fit = mom.select(col("n"),
          ((col("sxy").cast("double") - col("sx").cast("double")
            * col("sy").cast("double") / col("n"))
            / (col("sxx").cast("double") - col("sx").cast("double")
              * col("sx") / col("n"))).as("slope"),
          col("sx"), col("sy"), col("sxx"), col("sxy"))
          .select(col("n"), col("slope"),
            ((col("sy").cast("double") - col("slope")
              * col("sx")) / col("n")).as("icept"), col("slope")
              .as("b"))
          .select(col("n"), round(col("slope"), 6).as("slope"),
            round(col("icept"), 4).as("icept"), col("b"),
            col("icept").as("a"))
        val resid = daily.crossJoin(broadcast(fit))
          .withColumn("e", round(col("yd").cast("double")
            - col("a") - col("b") * col("x"), 6))
        val w = Window.orderBy(col("day"))
        resid
          .withColumn("de", col("e") - lag(col("e"), 1).over(w))
          .agg(max(col("n")).as("n_days"),
            max(col("slope")).as("slope"),
            max(col("icept")).as("intercept"),
            round(sum((col("de") * col("de")).cast("decimal(30,12)"))
                .cast("double")
              / sum((col("e") * col("e")).cast("decimal(30,12)"))
                .cast("double"), 6).as("dw"))
          .select(col("n_days"), col("slope"), col("intercept"),
            col("dw"), round(lit(1.0) - col("dw") / 2.0, 6).as("rho"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
            date_diff('day', DATE '1995-01-01',
              CAST(o_orderdate AS DATE)) AS x,
            CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DECIMAL(14,2)) AS yd
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate < TIMESTAMP '1996-01-01'
          GROUP BY 1, 2),
        mom AS (
          SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
            sum(yd) AS sy, sum(yd * x) AS sxy,
            CAST(sum(x * x) AS BIGINT) AS sxx
          FROM daily),
        fit0 AS (
          SELECT n,
            (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
              * CAST(sy AS DOUBLE) / n)
            / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
              AS slope, sx, sy
          FROM mom),
        fit AS (
          SELECT n, slope,
            (CAST(sy AS DOUBLE) - slope * sx) / n AS icept
          FROM fit0),
        resid AS (
          SELECT day,
            round(CAST(yd AS DOUBLE) - icept - slope * x, 6) AS e,
            n, slope, icept
          FROM daily CROSS JOIN fit),
        lagged AS (
          SELECT n, slope, icept, e,
            e - lag(e) OVER (ORDER BY day) AS de
          FROM resid)
        SELECT max(n) AS n_days,
          round(max(slope), 6) AS slope,
          round(max(icept), 4) AS intercept,
          round(CAST(sum(CAST(de * de AS DECIMAL(30,12))) AS DOUBLE)
            / CAST(sum(CAST(e * e AS DECIMAL(30,12))) AS DOUBLE), 6)
            AS dw,
          round(1.0 - round(CAST(sum(CAST(de * de AS DECIMAL(30,12)))
              AS DOUBLE)
            / CAST(sum(CAST(e * e AS DECIMAL(30,12))) AS DOUBLE), 6)
            / 2.0, 6) AS rho
        FROM lagged""")),

    "q319_cem_matching" -> Q(
      // Coarsened exact matching (Iacus-King-Porro) — the DESIGN-stage
      // causal operator that complements q294's model-stage IPW:
      // "treated" = BUILDING-segment customers, outcome = lifetime
      // order revenue, strata = region x 2000-wide acctbal band
      // (coarsening is plain integer arithmetic — fully deterministic,
      // no propensity model to disagree about). Unmatched strata (no
      // treated or no controls) are pruned exactly as CEM prescribes;
      // the ATT reweights control means to the treated stratum
      // distribution. One outcome join + one bounded strata frame;
      // per-stratum mean gaps snap to 6 decimals and fold into the ATT
      // through exact decimal x integer sums (no double accumulation).
      build = (s, dir) => {
        val spend = table(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(dec(col("o_totalprice"))).as("spent"))
        val c = table(s, dir, "customer")
          .join(broadcast(table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .join(spend, col("c_custkey") === col("o_custkey"), "left")
          .select(col("r_name"),
            floor((col("c_acctbal").cast("decimal(12,2)") + 1000)
              / 2000).cast("long").as("band"),
            (col("c_mktsegment") === "BUILDING").cast("int").as("t"),
            coalesce(col("spent"), lit(0).cast("decimal(12,2)"))
              .cast("decimal(14,2)").as("y"))
        val strata = c.groupBy(col("r_name"), col("band"))
          .agg(sum(col("t")).as("n_t"),
            sum(lit(1) - col("t")).as("n_c"),
            sum(when(col("t") === 1, col("y"))).as("sy_t"),
            sum(when(col("t") === 0, col("y"))).as("sy_c"))
          .filter(col("n_t") > 0 && col("n_c") > 0)
          .withColumn("gap", round(col("sy_t").cast("double") / col("n_t")
            - col("sy_c").cast("double") / col("n_c"), 6))
        val att = strata.agg(
          round(sum(col("gap").cast("decimal(20,6)") * col("n_t"))
              .cast("double")
            / sum(col("n_t")), 6).as("att"),
          sum(col("n_t")).as("n_matched_t"))
        strata.crossJoin(broadcast(att))
          .select(col("r_name"), col("band"), col("n_t"), col("n_c"),
            col("gap"), col("att"), col("n_matched_t"))
          .orderBy(col("r_name"), col("band"))
      },
      oracle = Some("""
        WITH spend AS (
          SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(12,2)))
            AS spent
          FROM orders GROUP BY 1),
        c AS (
          SELECT r_name,
            CAST(floor((CAST(c_acctbal AS DECIMAL(12,2)) + 1000)
              / 2000) AS BIGINT) AS band,
            CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS t,
            CAST(coalesce(spent, 0) AS DECIMAL(14,2)) AS y
          FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          LEFT JOIN spend ON c_custkey = o_custkey),
        strata AS (
          SELECT r_name, band,
            CAST(sum(t) AS BIGINT) AS n_t,
            CAST(sum(1 - t) AS BIGINT) AS n_c,
            sum(CASE WHEN t = 1 THEN y END) AS sy_t,
            sum(CASE WHEN t = 0 THEN y END) AS sy_c
          FROM c GROUP BY 1, 2
          HAVING sum(t) > 0 AND sum(1 - t) > 0),
        gapped AS (
          SELECT *, round(CAST(sy_t AS DOUBLE) / n_t
            - CAST(sy_c AS DOUBLE) / n_c, 6) AS gap
          FROM strata),
        att AS (
          SELECT round(CAST(sum(CAST(gap AS DECIMAL(20,6)) * n_t)
              AS DOUBLE) / sum(n_t), 6) AS att,
            CAST(sum(n_t) AS BIGINT) AS n_matched_t
          FROM gapped)
        SELECT r_name, band, n_t, n_c, gap, att, n_matched_t
        FROM gapped CROSS JOIN att
        ORDER BY r_name, band""")),

    "q320_brown_forsythe" -> Q(
      // Brown-Forsythe (median-centered Levene) homogeneity-of-variance
      // test across the 5 market segments — the assumption check that
      // gates q213's ANOVA: ANOVA on the absolute deviations from each
      // GROUP MEDIAN (medians via the exact type-7 interpolation both
      // engines share; deviations snapped to 6 decimals so every moment
      // is an exact decimal). Two scans (medians, then deviation
      // moments) + the bounded 5-group frame; F is one double formula
      // on exact moments, output magnitudes O(1-100) so decimal→double
      // cast ulps are invisible under the 6-decimal round.
      build = (s, dir) => {
        val c = table(s, dir, "customer")
        val med = c.groupBy(col("c_mktsegment"))
          .agg(expr("percentile(c_acctbal, 0.5)").as("med"))
        val z = c.join(broadcast(med), Seq("c_mktsegment"))
          .select(col("c_mktsegment"),
            abs(col("c_acctbal") - col("med")).cast("decimal(16,6)")
              .as("z"))
        val g = z.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_g"), sum(col("z")).as("sz"),
            sum((col("z") * col("z")).cast("decimal(38,12)")).as("szz"))
        val tot = g.agg(sum(col("n_g")).as("nn"),
          sum(col("sz")).cast("decimal(30,6)").as("szt"),
          count(lit(1)).as("k"),
          sum(col("szz").cast("decimal(38,12)")).cast("decimal(38,12)")
            .as("szzt"),
          round(sum((col("sz").cast("double") * col("sz").cast("double")
              / col("n_g")).cast("decimal(30,6)")).cast("double"), 6)
            .as("between_raw"))
        val f = tot.select(col("k"), col("nn"),
          round((col("between_raw")
              - (col("szt").cast("double") * col("szt").cast("double")
                / col("nn")))
            / (col("szzt").cast("double") - col("between_raw"))
            * (col("nn") - col("k")).cast("double") / (col("k") - 1),
            6).as("f_stat"))
        g.join(broadcast(med), Seq("c_mktsegment"))
          .crossJoin(broadcast(f))
          .select(col("c_mktsegment"), col("n_g"),
            round(col("med").cast("double"), 6).as("group_median"),
            round(col("sz").cast("double") / col("n_g"), 6)
              .as("mean_absdev"),
            col("k"), col("nn"), col("f_stat"))
          .orderBy(col("c_mktsegment"))
      },
      oracle = Some("""
        WITH med AS (
          SELECT c_mktsegment,
            quantile_cont(c_acctbal, 0.5) AS med
          FROM customer GROUP BY 1),
        z AS (
          SELECT c.c_mktsegment,
            CAST(abs(c.c_acctbal - m.med) AS DECIMAL(16,6)) AS z
          FROM customer c JOIN med m USING (c_mktsegment)),
        g AS (
          SELECT c_mktsegment, count(*) AS n_g, sum(z) AS sz,
            sum(CAST(CAST(z AS DECIMAL(19,6)) * CAST(z AS DECIMAL(19,6))
              AS DECIMAL(38,12))) AS szz
          FROM z GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n_g) AS BIGINT) AS nn,
            CAST(sum(sz) AS DECIMAL(30,6)) AS szt,
            count(*) AS k,
            CAST(sum(szz) AS DECIMAL(38,12)) AS szzt,
            round(CAST(sum(CAST(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
              / n_g AS DECIMAL(30,6))) AS DOUBLE), 6) AS between_raw
          FROM g),
        f AS (
          SELECT k, nn,
            round((between_raw
                - (CAST(szt AS DOUBLE) * CAST(szt AS DOUBLE) / nn))
              / (CAST(szzt AS DOUBLE) - between_raw)
              * CAST(nn - k AS DOUBLE) / (k - 1), 6) AS f_stat
          FROM tot)
        SELECT g.c_mktsegment, g.n_g,
          round(CAST(m.med AS DOUBLE), 6) AS group_median,
          round(CAST(g.sz AS DOUBLE) / g.n_g, 6) AS mean_absdev,
          f.k, f.nn, f.f_stat
        FROM g JOIN med m USING (c_mktsegment) CROSS JOIN f
        ORDER BY g.c_mktsegment""")),

    "q321_heaps_law" -> Q(
      // Heaps'-law vocabulary-growth audit: V(n) ≈ K n^beta, fit from
      // 10 corpus-prefix checkpoints — the curve that predicts how a
      // tokenizer vocabulary scales to the full 100 TB corpus from a
      // prefix. NO sequential scan anywhere: a term's contribution to
      // checkpoint i is decided by its FIRST occurrence (min doc_id per
      // term — one hash agg), and both cumulative token and vocabulary
      // counts are conditional sums against the broadcast 10-row
      // checkpoint grid. The log-log OLS runs on the bounded 10-row
      // frame with lns snapped to 8 decimals into exact sums (the q280
      // log discipline).
      build = (s, dir) => {
        import s.implicits._
        val toks = table(s, dir, "documents")
          .select(col("doc_id"),
            explode(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")).as("w"))
        val perDoc = toks.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("tok"))
        val firsts = toks.groupBy(col("w"))
          .agg(min(col("doc_id")).as("first_doc"))
        val nd = perDoc.agg((max(col("doc_id")) + 1).as("ndocs"))
        val grid = (1 to 10).toDF("i")
        val cuts = grid.crossJoin(broadcast(nd))
          .select(col("i"),
            (col("ndocs") * col("i") / 10).cast("long").as("k_docs"))
        val tokAt = perDoc.crossJoin(broadcast(cuts))
          .filter(col("doc_id") < col("k_docs"))
          .groupBy(col("i"), col("k_docs"))
          .agg(sum(col("tok")).as("tokens"))
        val vocAt = firsts.crossJoin(broadcast(cuts))
          .filter(col("first_doc") < col("k_docs"))
          .groupBy(col("i"))
          .agg(count(lit(1)).as("vocab"))
        val pts = tokAt.join(vocAt, Seq("i"))
          .withColumn("lx", round(log(col("tokens").cast("double")), 8))
          .withColumn("ly", round(log(col("vocab").cast("double")), 8))
        val fit = pts.agg(count(lit(1)).as("np"),
            sum(col("lx").cast("decimal(16,8)")).as("sx"),
            sum(col("ly").cast("decimal(16,8)")).as("sy"),
            sum((col("lx").cast("decimal(16,8)")
              * col("ly").cast("decimal(16,8)")).cast("decimal(30,16)"))
              .as("sxy"),
            sum((col("lx").cast("decimal(16,8)")
              * col("lx").cast("decimal(16,8)")).cast("decimal(30,16)"))
              .as("sxx"))
          .select(
            round((col("sxy").cast("double") - col("sx").cast("double")
                * col("sy").cast("double") / col("np"))
              / (col("sxx").cast("double") - col("sx").cast("double")
                * col("sx").cast("double") / col("np")), 6).as("beta"))
        pts.crossJoin(broadcast(fit))
          .select(col("i"), col("k_docs"), col("tokens"), col("vocab"),
            col("beta"))
          .orderBy(col("i"))
      },
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id,
            unnest(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS w
          FROM documents),
        per_doc AS (
          SELECT doc_id, count(*) AS tok FROM toks GROUP BY 1),
        firsts AS (
          SELECT w, min(doc_id) AS first_doc FROM toks GROUP BY 1),
        nd AS (SELECT max(doc_id) + 1 AS ndocs FROM per_doc),
        cuts AS (
          SELECT i, ndocs * i // 10 AS k_docs
          FROM (SELECT unnest(range(1, 11)) AS i) CROSS JOIN nd),
        tok_at AS (
          SELECT i, k_docs, CAST(sum(tok) AS BIGINT) AS tokens
          FROM per_doc CROSS JOIN cuts WHERE doc_id < k_docs
          GROUP BY 1, 2),
        voc_at AS (
          SELECT i, count(*) AS vocab
          FROM firsts CROSS JOIN cuts WHERE first_doc < k_docs
          GROUP BY 1),
        pts AS (
          SELECT i, k_docs, tokens, vocab,
            round(ln(CAST(tokens AS DOUBLE)), 8) AS lx,
            round(ln(CAST(vocab AS DOUBLE)), 8) AS ly
          FROM tok_at JOIN voc_at USING (i)),
        fit AS (
          SELECT round((CAST(sum(CAST(CAST(lx AS DECIMAL(19,8))
                * CAST(ly AS DECIMAL(19,8)) AS DECIMAL(38,16)))
                AS DOUBLE)
              - CAST(sum(CAST(lx AS DECIMAL(16,8))) AS DOUBLE)
                * CAST(sum(CAST(ly AS DECIMAL(16,8))) AS DOUBLE)
                / count(*))
            / (CAST(sum(CAST(CAST(lx AS DECIMAL(19,8))
                * CAST(lx AS DECIMAL(19,8)) AS DECIMAL(38,16)))
                AS DOUBLE)
              - CAST(sum(CAST(lx AS DECIMAL(16,8))) AS DOUBLE)
                * CAST(sum(CAST(lx AS DECIMAL(16,8))) AS DOUBLE)
                / count(*)), 6) AS beta
          FROM pts)
        SELECT i, k_docs, tokens, vocab, beta
        FROM pts CROSS JOIN fit
        ORDER BY i""")),

    "q322_huber_irls" -> Q(
      // Huber robust regression by IRLS (Huber 1964) on the daily-
      // revenue trend — the outlier-resistant rival of q139's Theil-Sen
      // and the OLS fits: three unrolled reweighting steps from the OLS
      // start, weights w = min(1, k/|e|) with k = 1.345·RMS. The q301
      // iteration discipline throughout: (a, b) snap to 6 decimals and
      // w to 4 AT EVERY step, so cross-libm ulps cannot compound, and
      // every weighted moment is an exact decimal sum over the bounded
      // day frame (y quantized to thousands like q312 — integer
      // moments). Each step is one pass over the <=365-row frame
      // against its broadcast predecessor fit; the oracle unrolls the
      // same three steps as generated CTEs. Output: the fit trajectory
      // (step 0 = OLS), with the surviving total weight as the
      // downweighting evidence.
      build = (s, dir) => {
        val day0 = lit("1995-01-01").cast("date")
        val daily = table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(dec(col("o_totalprice"))).as("srev"))
          .select(datediff(col("day"), day0).as("x"),
            floor(col("srev").cast("double") / lit(1000.0)).as("y"))
        def nd(c: String): Column = col(c).cast("double")
        val m0 = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        val st0 = m0
          .withColumn("b", round((nd("sxy") - nd("sx") * nd("sy")
              / col("n"))
            / (nd("sxx") - nd("sx") * nd("sx") / col("n")), 6))
          .withColumn("a", round((nd("sy") - col("b") * nd("sx"))
            / col("n"), 6))
          .withColumn("k", round(lit(1.345) * sqrt(
            ((nd("syy") - nd("sy") * nd("sy") / col("n"))
              - (nd("sxy") - nd("sx") * nd("sy") / col("n"))
                * (nd("sxy") - nd("sx") * nd("sy") / col("n"))
                / (nd("sxx") - nd("sx") * nd("sx") / col("n")))
            / col("n")), 4))
          .select(lit(0).as("step"), col("a"), col("b"), col("k"),
            round(nd("n"), 4).as("total_w"))
        var prev = st0
        var fits = Seq(st0)
        for (i <- 1 to 3) {
          val wtd = daily.crossJoin(broadcast(
              prev.select(col("a"), col("b"), col("k"))))
            .withColumn("e", col("y") - col("a") - col("b") * col("x"))
            .withColumn("w", when(abs(col("e")) <= col("k"),
                lit(1.0).cast("decimal(5,4)"))
              .otherwise(round(col("k") / abs(col("e")), 4)
                .cast("decimal(5,4)")))
          val mi = wtd.agg(
            sum(col("w")).cast("decimal(14,4)").as("sw"),
            sum(col("w") * col("x")).cast("decimal(18,4)").as("swx"),
            sum(col("w") * col("y")).cast("decimal(20,4)").as("swy"),
            sum(col("w") * col("x") * col("y")).cast("decimal(24,4)")
              .as("swxy"),
            sum(col("w") * col("x") * col("x")).cast("decimal(20,4)")
              .as("swxx"),
            max(col("k")).as("k"))
          prev = mi
            .withColumn("b", round((nd("swxy") - nd("swx") * nd("swy")
                / nd("sw"))
              / (nd("swxx") - nd("swx") * nd("swx") / nd("sw")), 6))
            .withColumn("a", round((nd("swy") - col("b") * nd("swx"))
              / nd("sw"), 6))
            .select(lit(i).as("step"), col("a"), col("b"), col("k"),
              round(nd("sw"), 4).as("total_w"))
          fits = fits :+ prev
        }
        fits.reduce(_.unionAll(_)).orderBy(col("step"))
      },
      oracle = Some(huberOracle)),

    "q323_mood_median" -> Q(
      // Mood's median test across the 5 market segments: 2xk chi-square
      // on counts above/below the GRAND median — the coarsest, most
      // outlier-proof of the location tests (q213 ANOVA assumes
      // normality, q214 Mann-Whitney is 2-sample; this is its k-sample
      // contingency cousin). The grand median interpolates in double on
      // both engines (the q320 rule); counts are exact integers and the
      // chi-square is one double formula over the bounded 5-row frame.
      // Ties AT the median go below (<=), identically on both engines.
      build = (s, dir) => {
        // observation contract (r9): the test counts OBSERVED balances
        // against the grand median — a NULL balance is neither above nor
        // below (the oracle's CASE ELSE 0 would silently call it below)
        val c = table(s, dir, "customer").filter(col("c_acctbal").isNotNull)
        val gm = c.agg(expr("percentile(c_acctbal, 0.5)").as("gmed"))
        val per = c.crossJoin(broadcast(gm))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_g"),
            sum((col("c_acctbal") > col("gmed")).cast("int"))
              .as("above"))
        val tot = per.agg(sum(col("n_g")).as("nn"),
          sum(col("above")).as("ta"))
        val chi = per.crossJoin(broadcast(tot))
          .select(((col("above").cast("double") - col("n_g")
              * col("ta").cast("double") / col("nn"))
            * (col("above").cast("double") - col("n_g")
              * col("ta").cast("double") / col("nn"))
            / (col("n_g") * col("ta").cast("double") / col("nn"))
            + ((col("n_g") - col("above")).cast("double") - col("n_g")
              * (col("nn") - col("ta")).cast("double") / col("nn"))
            * ((col("n_g") - col("above")).cast("double") - col("n_g")
              * (col("nn") - col("ta")).cast("double") / col("nn"))
            / (col("n_g") * (col("nn") - col("ta")).cast("double")
              / col("nn"))).cast("decimal(20,8)").as("cell"))
          .agg(round(sum(col("cell")).cast("double"), 6).as("chi2"))
        per.crossJoin(broadcast(chi))
          .select(col("c_mktsegment"), col("n_g"), col("above"),
            (col("n_g") - col("above")).as("below"), col("chi2"))
          .orderBy(col("c_mktsegment"))
      },
      oracle = Some("""
        WITH cobs AS (
          SELECT * FROM customer WHERE c_acctbal IS NOT NULL),
        gm AS (
          SELECT quantile_cont(c_acctbal, 0.5) AS gmed FROM cobs),
        per AS (
          SELECT c_mktsegment, count(*) AS n_g,
            CAST(sum(CASE WHEN c_acctbal > gmed THEN 1 ELSE 0 END)
              AS BIGINT) AS above
          FROM cobs CROSS JOIN gm
          GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n_g) AS BIGINT) AS nn,
            CAST(sum(above) AS BIGINT) AS ta
          FROM per),
        chi AS (
          SELECT round(CAST(sum(CAST(
            (CAST(above AS DOUBLE) - n_g * CAST(ta AS DOUBLE) / nn)
            * (CAST(above AS DOUBLE) - n_g * CAST(ta AS DOUBLE) / nn)
            / (n_g * CAST(ta AS DOUBLE) / nn)
            + (CAST(n_g - above AS DOUBLE) - n_g
              * CAST(nn - ta AS DOUBLE) / nn)
            * (CAST(n_g - above AS DOUBLE) - n_g
              * CAST(nn - ta AS DOUBLE) / nn)
            / (n_g * CAST(nn - ta AS DOUBLE) / nn)
            AS DECIMAL(20,8)))
            AS DOUBLE), 6) AS chi2
          FROM per CROSS JOIN tot)
        SELECT c_mktsegment, n_g, above, n_g - above AS below, chi2
        FROM per CROSS JOIN chi
        ORDER BY c_mktsegment""")),
  )
}
