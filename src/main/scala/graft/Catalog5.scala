package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Stable._
import graft.operators._

/** Catalog part 5 of 7: queries q247..q293, in original catalog
  * order ([[Queries.all]] concatenates the parts — split from the former
  * single-file catalog purely for compile/review ergonomics; content and
  * order are unchanged).
  */
private[graft] trait Catalog5 extends CatalogBase {
  protected val entries5: Seq[(String, Q)] = Seq(

    "q247_retention_halflife" -> Q(
      // Exponential decay fit of each cohort's retention curve:
      // ln(retention) ~ week_offset per cohort (offsets ≥ 1, the
      // offset-0 self-cell is tautologically 100%), half-life =
      // −ln 2 / slope — the single number that makes cohort curves
      // comparable (q106 shows the triangle; this says how FAST each
      // cohort decays). Exact-moment continuous fit (fitContinuousXY)
      // over the bounded triangle; cohorts with non-negative slope
      // report NULL half-life rather than a fabricated one.
      build = (s, dir) => {
        val tri = Cohorts.weeklyRetention(table(s, dir, "events"),
            "user_id", "ts")
          .filter(col("week_offset") >= 1 && col("retention_pct") > 0)
          .withColumn("lnr", log(col("retention_pct") / lit(100.0)))
        Trend.fitContinuousXY(tri, Seq("cohort_week"),
            "week_offset", "lnr")
          .withColumn("half_life_weeks",
            when(col("slope") < 0,
              round(lit(-0.6931471805599453) / col("slope"), 4)))
          .select(col("cohort_week"), col("n"), col("slope"),
            col("half_life_weeks"))
          .orderBy(col("cohort_week"))
      },
      oracle = Some(s"""
        WITH ${Cohorts.sqlCtes("SELECT user_id AS u, ts FROM events")},
        lnr_src AS (
          SELECT cohort_week AS g, week_offset AS x,
            ln(retention_pct / 100.0) AS y
          FROM cohort_ret
          WHERE week_offset >= 1 AND retention_pct > 0),
        ${Trend.sqlFitContinuousCtes("lnr_src", "g", "x", "y")}
        SELECT g AS cohort_week, n, slope,
          CASE WHEN slope < 0
            THEN round(-0.6931471805599453 / slope, 4) END
            AS half_life_weeks
        FROM fit_g ORDER BY cohort_week""")),

    "q248_seasonal_decomposition" -> Q(
      // Classical multiplicative decomposition of daily revenue:
      // centered 7-day moving-average trend (full windows only, exact
      // decimal), detrended ratios, ISO-day-of-week seasonal indices,
      // and the remainder's spread per weekday — q126 shows the DOW
      // profile; this separates trend from season and reports what
      // noise is LEFT. Ratios snapped at 8 into davg-style sums.
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(dec(col("o_totalprice"))).cast("decimal(20,2)").as("rev"))
          .withColumn("dayn", unix_date(col("day")))
        val trended = daily.as("a").join(daily.as("b"),
            col("b.dayn") >= col("a.dayn") - 3
              && col("b.dayn") <= col("a.dayn") + 3)
          .groupBy(col("a.day").as("day"), col("a.rev").as("rev"))
          .agg(count(lit(1)).as("w"),
            sum(col("b.rev")).cast("decimal(24,2)").as("srev"))
          .filter(col("w") === 7)
          .withColumn("trend",
            col("srev").cast("double") / lit(7.0))
          .withColumn("ratio",
            round(col("rev").cast("double") / col("trend"), 8))
        val dow = trended
          .withColumn("isodow", weekday(col("day")) + 1)
          .groupBy(col("isodow"))
          .agg(count(lit(1)).as("n_days"),
            (round(sum(col("ratio").cast("decimal(14,8)")), 6)
              .cast("double") / count(lit(1))).as("seasonal_index"),
            round(sum((col("ratio") * col("ratio")).cast("decimal(20,8)")), 6)
              .cast("double").as("srr"))
        dow.select(col("isodow"), col("n_days"),
            round(col("seasonal_index"), 6).as("seasonal_index"),
            // greatest(.,0): the 6-decimal snaps can push srr/n a hair
            // below mean^2 on small groups (sf0.001) — Spark sqrt(neg)
            // is a silent NaN but DuckDB ERRORS, so clamp identically
            round(sqrt(greatest(col("srr") / col("n_days").cast("double")
              - col("seasonal_index") * col("seasonal_index"),
              lit(0.0))), 6)
              .as("remainder_rms"))
          .orderBy(col("isodow"))
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
            CAST(sum(CAST(o_totalprice AS DECIMAL(19,2)))
              AS DECIMAL(20,2)) AS rev,
            date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS dayn
          FROM orders GROUP BY 1),
        trended AS (
          SELECT a.day, a.rev, count(*) AS w,
            CAST(sum(b.rev) AS DECIMAL(24,2)) AS srev
          FROM daily a JOIN daily b
            ON b.dayn >= a.dayn - 3 AND b.dayn <= a.dayn + 3
          GROUP BY 1, 2
          HAVING count(*) = 7),
        ratios AS (
          SELECT day,
            round(CAST(rev AS DOUBLE)
              / (CAST(srev AS DOUBLE) / 7.0), 8) AS ratio
          FROM trended),
        dow AS (
          SELECT isodow(day) AS isodow, count(*) AS n_days,
            CAST(round(sum(CAST(ratio AS DECIMAL(14,8))), 6) AS DOUBLE)
              / count(*) AS seasonal_index,
            CAST(round(sum(CAST(ratio * ratio AS DECIMAL(20,8))), 6)
              AS DOUBLE) AS srr
          FROM ratios GROUP BY 1)
        SELECT isodow, n_days,
          round(seasonal_index, 6) AS seasonal_index,
          round(sqrt(greatest(srr / CAST(n_days AS DOUBLE)
            - seasonal_index * seasonal_index, 0)), 6) AS remainder_rms
        FROM dow ORDER BY isodow""")),

    "q249_srm_check" -> Q(
      // Sample-ratio-mismatch guardrail: does the 50/50 hash split
      // actually LAND 50/50 on users? The pre-test every experiment
      // platform runs before reading any metric — an SRM means the
      // assignment itself is broken and every downstream number is
      // garbage. Exact counts, binomial normal z against p=0.5, A-S
      // p-value; the flag trips at the conventional p < 0.001.
      build = (s, dir) => {
        val users = table(s, dir, "events")
          .select(col("user_id")).distinct()
        val arms = Sampling.hashSplit(users, "user_id", valBuckets = 50)
        val m = arms.agg(count(lit(1)).as("n_users"),
          sum((col("split") === "val").cast("long")).as("n_a"))
        val nD = col("n_users").cast("double")
        val z = (col("n_a").cast("double") - nD / 2.0)
          ./(sqrt(nD * lit(0.25)))
        m.select(col("n_users"), col("n_a"),
            (col("n_users") - col("n_a")).as("n_b"),
            round(col("n_a").cast("double") / nD, 6).as("ratio_a"),
            round(z, 6).as("z_stat"),
            round(Hypothesis.normalTwoSidedP(round(z, 6)), 10)
              .as("p_value"))
          .withColumn("srm_detected", col("p_value") < 0.001)
      },
      oracle = Some(s"""
        WITH users AS (SELECT DISTINCT user_id FROM events),
        arms AS (
          SELECT user_id,
            ${Sampling.sqlHashBucket("user_id", 100)} < 50 AS in_a
          FROM users),
        m AS (
          SELECT count(*) AS n_users,
            CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a
          FROM arms),
        stat AS (
          SELECT n_users, n_a, n_users - n_a AS n_b,
            round(CAST(n_a AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
              AS ratio_a,
            round((CAST(n_a AS DOUBLE) - CAST(n_users AS DOUBLE) / 2.0)
              / sqrt(CAST(n_users AS DOUBLE) * 0.25), 6) AS z_stat
          FROM m)
        SELECT n_users, n_a, n_b, ratio_a, z_stat,
          round(${Hypothesis.sqlNormalTwoSidedP("z_stat")}, 10) AS p_value,
          round(${Hypothesis.sqlNormalTwoSidedP("z_stat")}, 10) < 0.001
            AS srm_detected
        FROM stat""")),

    "q250_median_of_means" -> Q(
      // Median-of-means: the heavy-tail-robust mean estimator that
      // scales — 32 deterministic hash buckets (the portable md5
      // bucketing, so bucket membership is layout-independent), exact
      // per-bucket means, type-7 median across the bounded bucket
      // frame. Printed beside the plain mean: on well-behaved data
      // they agree to ~0.5%, and the gap widening IS the heavy-tail
      // alarm. Per-bucket sums are exact decimal; one extra shuffle
      // over the plain mean, both on the bucket key.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .withColumn("bkt", Sampling.hashBucket(
            col("l_orderkey") * 10 + col("l_linenumber"), 32))
        val perBucket = li.groupBy(col("bkt"))
          .agg(count(lit(1)).as("nb"),
            sum(dec(col("l_extendedprice"))).cast("decimal(20,2)").as("sb"))
          .withColumn("bmean",
            round(col("sb").cast("double") / col("nb").cast("double"), 6))
        perBucket.agg(
          sum(col("nb")).as("n"),
          count(lit(1)).as("n_buckets"),
          round(sum(col("sb")).cast("decimal(24,2)").cast("double")
            / sum(col("nb")).cast("double"), 6).as("plain_mean"),
          expr("percentile(bmean, 0.5D)").as("median_of_means"))
      },
      oracle = Some(s"""
        WITH b AS (
          SELECT ${Sampling.sqlHashBucket(
            "l_orderkey * 10 + l_linenumber", 32)} AS bkt,
            count(*) AS nb,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(19,2)))
              AS DECIMAL(20,2)) AS sb
          FROM lineitem GROUP BY 1),
        bm AS (
          SELECT bkt, nb, sb,
            round(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS bmean
          FROM b)
        SELECT CAST(sum(nb) AS BIGINT) AS n,
          count(*) AS n_buckets,
          round(CAST(CAST(sum(sb) AS DECIMAL(24,2)) AS DOUBLE)
            / CAST(sum(nb) AS DOUBLE), 6) AS plain_mean,
          quantile_cont(bmean, 0.5) AS median_of_means
        FROM bm""")),

    "q251_not_in_trap" -> Q(
      // The NOT IN null trap, as an engine-contract battery: with a
      // single NULL in the subquery's result, `NOT IN` returns ZERO
      // rows (three-valued logic — x <> NULL is never TRUE), while
      // NOT EXISTS and the anti-join return the honest complement.
      // One row per formulation over the same probe: customers not
      // appearing in a key set that CONTAINS a NULL. The battery
      // exists so the 3-am pipeline debug session doesn't have to
      // rediscover ANSI semantics.
      build = (s, dir) => {
        val c = table(s, dir, "customer")
        c.createOrReplaceTempView("q251_cust")
        table(s, dir, "orders")
          .select(when(col("o_orderkey") % 97 === 0, lit(null))
            .otherwise(col("o_custkey")).as("k"))
          .createOrReplaceTempView("q251_keys")
        val ss = s
        import ss.implicits._
        val notIn = ss.sql("""SELECT count(*) AS n FROM q251_cust
          WHERE c_custkey NOT IN (SELECT k FROM q251_keys)""")
          .select(lit("1_not_in").as("formulation"), col("n"))
        val notExists = ss.sql("""SELECT count(*) AS n FROM q251_cust c
          WHERE NOT EXISTS (SELECT 1 FROM q251_keys p WHERE p.k = c.c_custkey)""")
          .select(lit("2_not_exists").as("formulation"), col("n"))
        val anti = c.join(
            ss.table("q251_keys"), col("c_custkey") === col("k"),
            "left_anti")
          .agg(count(lit(1)).as("n"))
          .select(lit("3_anti_join").as("formulation"), col("n"))
        notIn.unionByName(notExists).unionByName(anti)
          .orderBy(col("formulation"))
      },
      oracle = Some("""
        WITH probe AS (
          SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
            ELSE o_custkey END AS k
          FROM orders)
        SELECT '1_not_in' AS formulation,
          (SELECT count(*) FROM customer
           WHERE c_custkey NOT IN (SELECT k FROM probe)) AS n
        UNION ALL
        SELECT '2_not_exists',
          (SELECT count(*) FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM probe p
                             WHERE p.k = c.c_custkey))
        UNION ALL
        SELECT '3_anti_join',
          (SELECT count(*) FROM customer c
           LEFT JOIN (SELECT DISTINCT k FROM probe WHERE k IS NOT NULL) p
             ON c.c_custkey = p.k
           WHERE p.k IS NULL)
        ORDER BY formulation""")),

    "q252_design_effect" -> Q(
      // Stratification design effect: Var(mean) under simple random
      // sampling vs proportional-allocation stratified sampling over
      // the priority strata — how much variance stratifying actually
      // buys ON THIS DATA (the empirical follow-up to q183's Neyman
      // allocation). deff = Σ(Nh/N)·s²h / s²overall; all variances
      // from exact decimal moments, one scan.
      build = (s, dir) => {
        // observation contract (r9): an observation is a non-NULL price
        // in an IDENTIFIED stratum (NULL priority is not a stratum);
        // strata need nh >= 2 to carry a within-variance — smaller ones
        // are excluded from BOTH sides of the deff ratio so the SRS and
        // stratified estimates cover the same rows
        val o = table(s, dir, "orders")
          .filter(col("o_totalprice").isNotNull &&
            col("o_orderpriority").isNotNull)
        val strata = o.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("nh"),
            sum(dec(col("o_totalprice"))).cast("decimal(24,2)").as("sh"),
            sum(dec(col("o_totalprice")) * dec(col("o_totalprice")))
              .cast("decimal(34,4)").as("shh"))
        def varOf(n: Column, sx: Column, sxx: Column) =
          (sxx.cast("double") - sx.cast("double") * sx.cast("double")
            / n.cast("double")) / (n.cast("double") - lit(1.0))
        val withVar = strata.filter(col("nh") >= 2).withColumn("s2h",
          varOf(col("nh"), col("sh"), col("shh")))
        // the ANOVA lesson: snap the SCALE-FREE s2h via floor(x·1e4+0.5)
        // (pure IEEE, engine-portable), then everything cross-stratum is
        // exact decimal — a double→DECIMAL cast at nh·s2h magnitude
        // would hit the >2^53/1e4 divergence cliff
        val tot = withVar
          .withColumn("b_h", col("nh").cast("decimal(14,0)")
            * floor(col("s2h") * lit(1e4) + lit(0.5)).cast("decimal(20,0)"))
          .agg(
            sum(col("nh")).as("n"),
            count(lit(1)).as("n_strata"),
            sum(col("sh")).cast("decimal(28,2)").as("st"),
            sum(col("shh")).cast("decimal(38,4)").as("stt"),
            sum(col("b_h")).cast("decimal(38,0)").as("b_all"))
        val s2all = varOf(col("n"), col("st"), col("stt"))
        val varWithin = (col("b_all").cast("double") / lit(1e4))
          ./(col("n").cast("double"))
        tot.select(col("n"), col("n_strata"),
          round(s2all, 4).as("var_overall"),
          round(varWithin, 4).as("var_within_weighted"),
          round(varWithin / s2all, 8).as("design_effect"))
      },
      oracle = Some("""
        WITH strata AS (
          SELECT o_orderpriority, count(*) AS nh,
            CAST(sum(CAST(o_totalprice AS DECIMAL(19,2)))
              AS DECIMAL(24,2)) AS sh,
            CAST(sum(CAST(o_totalprice AS DECIMAL(19,2))
              * CAST(o_totalprice AS DECIMAL(19,2)))
              AS DECIMAL(34,4)) AS shh
          FROM orders
          WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL
          GROUP BY 1),
        wv AS (
          SELECT *,
            (CAST(shh AS DOUBLE) - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)
              / CAST(nh AS DOUBLE)) / (CAST(nh AS DOUBLE) - 1.0) AS s2h
          FROM strata WHERE nh >= 2),
        tot AS (
          SELECT CAST(sum(nh) AS BIGINT) AS n,
            count(*) AS n_strata,
            CAST(sum(sh) AS DECIMAL(28,2)) AS st,
            CAST(sum(shh) AS DECIMAL(38,4)) AS stt,
            CAST(sum(CAST(nh AS DECIMAL(14,0))
              * CAST(floor(s2h * 1e4 + 0.5) AS DECIMAL(20,0)))
              AS DECIMAL(38,0)) AS b_all
          FROM wv)
        SELECT n, n_strata,
          round((CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)
            * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(n AS DOUBLE) - 1.0), 4) AS var_overall,
          round(CAST(b_all AS DOUBLE) / 1e4 / CAST(n AS DOUBLE), 4)
            AS var_within_weighted,
          round((CAST(b_all AS DOUBLE) / 1e4 / CAST(n AS DOUBLE))
            / ((CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)
              * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
              / (CAST(n AS DOUBLE) - 1.0)), 8) AS design_effect
        FROM tot""")),

    "q253_topk_native" -> Q(
      // Native TypedImperativeAggregate top-k (functions/TopKAggregate
      // .scala): top-3 orders by price per priority as a HASH AGGREGATE,
      // not a window. The window form shuffles+sorts every order; the
      // aggregate's partial step caps each map task at k rows per group,
      // so the shuffle carries k·partitions·groups heap entries — the
      // difference between a skewed full sort and a normal partial agg
      // at 100 TB. Ordinates pass through VERBATIM (no arithmetic), so
      // the window oracle matches bit-for-bit; ties break toward the
      // smaller key on both sides, which is what makes the aggregate
      // partitioning-independent and therefore oracle-checkable at all.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        o.groupBy(col("o_orderpriority"))
          .agg(expr(
            "graft_topk(CAST(o_totalprice AS DOUBLE), CAST(o_orderkey AS BIGINT), 3)")
            .as("tk"))
          .select(col("o_orderpriority"), posexplode(col("tk")))
          .select(col("o_orderpriority"),
            (col("pos") + 1).cast("long").as("rnk"),
            col("col.key").as("o_orderkey"),
            col("col.ord").as("price"))
          .orderBy("o_orderpriority", "rnk")
      },
      oracle = Some("""
        WITH r AS (
          SELECT o_orderpriority, o_orderkey,
            CAST(o_totalprice AS DOUBLE) AS price,
            row_number() OVER (PARTITION BY o_orderpriority
              ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey) AS rnk
          FROM orders)
        SELECT o_orderpriority, rnk, o_orderkey, price
        FROM r WHERE rnk <= 3
        ORDER BY o_orderpriority, rnk"""),
      bench = true),

    "q254_greedy_coverage" -> Q(
      // Greedy maximum-coverage selection (operators/Coverage.scala) —
      // the submodular curation loop of training-set construction: six
      // rounds, each picking the document whose distinct word-3-gram set
      // covers the most still-uncovered shingles (ties -> smallest id).
      // Spark counts xxhash64 shingle KEYS where the oracle counts the
      // raw text spans — identical gains unless 64-bit spans collide,
      // which would fail this gate loudly (the shingleHashRows contract).
      // The oracle is the unrolled 6-round mirror with every
      // multi-referenced round CTE MATERIALIZED (the q187/q188 lesson —
      // inline expansion re-derives the round chain per reference in
      // both engines).
      build = (s, dir) => {
        val d = table(s, dir, "documents")
        val pairs = NearDup.shingleHashRows(d, "doc_id", "text", 3)
        Coverage.greedySelect(pairs, "id", "hs", 6).orderBy("round")
      },
      oracle = Some(coverageOracle),
      bench = true),

    "q255_rollup_battery" -> Q(
      // Engine-contract battery: ROLLUP with grouping() markers — the
      // subtotal lattice OLAP cubes are built from. Keys are coalesced to
      // 'ALL' AFTER aggregation (a rollup NULL is a subtotal marker, not
      // a data NULL — grouping() is what distinguishes them, which is
      // exactly what the battery checks). Money sums in exact decimal
      // (Stable.msum) so subtotal rows equal their children bit-for-bit.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
        li.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
            grouping(col("l_linestatus")).cast("long").as("g_status"),
            count(lit(1)).as("n"),
            msum(col("l_quantity")).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("status"),
            col("g_flag"), col("g_status"), col("n"), col("sum_qty"))
          .orderBy("g_flag", "g_status", "flag", "status")
      },
      oracle = Some(s"""
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
          coalesce(l_linestatus, 'ALL') AS status,
          CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
          CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
          count(*) AS n,
          ${sqlMsum("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY g_flag, g_status, flag, status""")),

    "q256_rendezvous_reshard" -> Q(
      // Rendezvous (highest-random-weight) sharding + the reshard
      // movement audit: each key's shard is argmax over shards of a
      // portable arithmetic hash, so growing 10 -> 12 shards moves ONLY
      // the keys whose new shards win — ~2/12 of the keyspace, vs ~11/12
      // under mod-N sharding (Thaler & Ravishankar '98; the property
      // consistent hashing exists for). The argmax is packed as
      // max(h*100 + shard) over a bounded in-row list — no explode, no
      // extra shuffle; both engines evaluate the identical integer
      // expression, so the assignment is exact, not approximate. The
      // per-(key, shard) weight is the mixed value SQUARED mod p: the
      // plain linear mix is monotone in the shard index for most keys
      // (slope 40503241 · 12 ≪ p, so it rarely wraps) and collapsed 64%
      // of the keyspace onto the last shard — squaring mod p breaks the
      // monotonicity while staying exact in int64 (p² < 2⁶³).
      build = (s, dir) => {
        val c = table(s, dir, "customer")
          .select(col("c_custkey").cast("long").as("k"))
        def shardOf(n: Int): Column =
          (array_max(transform(sequence(lit(0L), lit(n - 1L)),
            sh => {
              val mix = (col("k") * lit(2654435761L)
                + (sh + lit(1L)) * lit(40503241L)) % lit(1000000007L)
              (mix * mix % lit(1000000007L)) * lit(100L) + sh
            })) % lit(100L))
        c.withColumn("shard_old", shardOf(10))
          .withColumn("shard_new", shardOf(12))
          .groupBy(col("shard_old"))
          .agg(count(lit(1)).as("n_keys"),
            sum((col("shard_new") =!= col("shard_old")).cast("long"))
              .as("n_moved"))
          .orderBy("shard_old")
      },
      oracle = Some("""
        WITH a AS (
          SELECT c_custkey AS k,
            list_max(list_transform(range(0, 10), sh ->
              (((k * 2654435761 + (sh + 1) * 40503241) % 1000000007)
               * ((k * 2654435761 + (sh + 1) * 40503241) % 1000000007)
               % 1000000007) * 100 + sh)) % 100 AS shard_old,
            list_max(list_transform(range(0, 12), sh ->
              (((k * 2654435761 + (sh + 1) * 40503241) % 1000000007)
               * ((k * 2654435761 + (sh + 1) * 40503241) % 1000000007)
               % 1000000007) * 100 + sh)) % 100 AS shard_new
          FROM customer)
        SELECT shard_old, count(*) AS n_keys,
          CAST(sum(CASE WHEN shard_new <> shard_old THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved
        FROM a GROUP BY 1 ORDER BY 1""")),

    "q257_grid_nearest" -> Q(
      // Grid-blocked nearest neighbor: synthetic (x, y) positions derived
      // from keys by EXACT integer arithmetic (portable by construction),
      // 5-degree grid cells, suppliers replicated to their 3x3 cell
      // neighborhood (the bounded side takes the x9), then a cell
      // equi-join + per-customer argmin. The scale shape of every spatial
      // join: candidates come from an equi-join on cell ids, never a
      // cross product; the search radius is the cell size, so customers
      // with no supplier in the neighborhood are (correctly, and
      // deterministically) absent. d2 is the same double expression tree
      // on both engines — bit-identical, no rounding needed.
      build = (s, dir) => {
        def pos(key: Column, mx: Long, my: Long) = (
          (key * lit(mx) % lit(360000L)).cast("double") / lit(1000.0) - lit(180.0),
          (key * lit(my) % lit(180000L)).cast("double") / lit(1000.0) - lit(90.0))
        val (cx, cy) = pos(col("c_custkey").cast("long"), 7919L, 104729L)
        val cust = table(s, dir, "customer")
          .select(col("c_custkey"), cx.as("x"), cy.as("y"))
          .withColumn("gx", floor(col("x") / lit(5.0)))
          .withColumn("gy", floor(col("y") / lit(5.0)))
        val (sx, sy) = pos(col("s_suppkey").cast("long"), 7927L, 104717L)
        val supp = table(s, dir, "supplier")
          .select(col("s_suppkey"), sx.as("sx"), sy.as("sy"))
          .withColumn("sgx", floor(col("sx") / lit(5.0)))
          .withColumn("sgy", floor(col("sy") / lit(5.0)))
          .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
          .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
          .select(col("s_suppkey"), col("sx"), col("sy"),
            (col("sgx") + col("dx")).as("gx"), (col("sgy") + col("dy")).as("gy"))
        val cand = cust.join(broadcast(supp), Seq("gx", "gy"))
          .withColumn("d2",
            (col("x") - col("sx")) * (col("x") - col("sx"))
              + (col("y") - col("sy")) * (col("y") - col("sy")))
        val w = Window.partitionBy(col("c_custkey"))
          .orderBy(col("d2"), col("s_suppkey"))
        cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("c_custkey"), col("s_suppkey"), col("d2"))
          .orderBy("c_custkey")
      },
      oracle = Some("""
        WITH c AS (
          SELECT c_custkey,
            CAST(c_custkey * 7919 % 360000 AS DOUBLE) / 1000.0 - 180.0 AS x,
            CAST(c_custkey * 104729 % 180000 AS DOUBLE) / 1000.0 - 90.0 AS y
          FROM customer),
        cg AS (SELECT *, floor(x / 5.0) AS gx, floor(y / 5.0) AS gy FROM c),
        sp AS (
          SELECT s_suppkey,
            CAST(s_suppkey * 7927 % 360000 AS DOUBLE) / 1000.0 - 180.0 AS sx,
            CAST(s_suppkey * 104717 % 180000 AS DOUBLE) / 1000.0 - 90.0 AS sy
          FROM supplier),
        sg AS (
          SELECT s_suppkey, sx, sy,
            floor(sx / 5.0) + dx.d AS gx, floor(sy / 5.0) + dy.d AS gy
          FROM sp
          CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
          CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy),
        -- recall: exact by the operator's contract — nearest WITHIN the
        -- 3x3 neighbor cells (search radius = cell size, stated in the
        -- engine doc); the oracle mirrors the identical cover
        cand AS (
          SELECT c_custkey, s_suppkey,
            (x - sx) * (x - sx) + (y - sy) * (y - sy) AS d2,
            row_number() OVER (PARTITION BY c_custkey
              ORDER BY (x - sx) * (x - sx) + (y - sy) * (y - sy),
                s_suppkey) AS rn
          FROM cg JOIN sg USING (gx, gy))
        SELECT c_custkey, s_suppkey, d2 FROM cand
        WHERE rn = 1 ORDER BY c_custkey""")),

    "q258_multiset_ops" -> Q(
      // Engine-contract battery: the four bag/set operators on frames
      // WITH duplicates — INTERSECT ALL keeps min(multiplicity),
      // EXCEPT ALL subtracts multiplicities, the DISTINCT forms collapse
      // — semantics subtle enough that engines have historically
      // diverged. Six bounded counts as one row-per-op frame; the
      // operand frames are (priority, status) projections, duplicated
      // thousands of times each, so multiplicity arithmetic is actually
      // exercised.
      build = (s, dir) => {
        import s.implicits._
        val o = table(s, dir, "orders")
        val a = o.select(col("o_orderpriority"), col("o_orderstatus"))
        val b = o.filter(col("o_totalprice") > lit(200000.0))
          .select(col("o_orderpriority"), col("o_orderstatus"))
        Seq(
          ("except_all", a.exceptAll(b).count()),
          ("except_distinct", a.except(b).count()),
          ("intersect_all", a.intersectAll(b).count()),
          ("intersect_distinct", a.intersect(b).count()),
          ("union_all", a.unionAll(b).count()),
          ("union_distinct", a.union(b).distinct().count()))
          .toDF("op", "n").orderBy("op")
      },
      oracle = Some("""
        WITH a AS (SELECT o_orderpriority, o_orderstatus FROM orders),
        b AS (SELECT o_orderpriority, o_orderstatus FROM orders
              WHERE o_totalprice > 200000.0)
        SELECT 'except_all' AS op,
          (SELECT count(*) FROM (FROM a EXCEPT ALL FROM b)) AS n
        UNION ALL SELECT 'except_distinct',
          (SELECT count(*) FROM (FROM a EXCEPT FROM b))
        UNION ALL SELECT 'intersect_all',
          (SELECT count(*) FROM (FROM a INTERSECT ALL FROM b))
        UNION ALL SELECT 'intersect_distinct',
          (SELECT count(*) FROM (FROM a INTERSECT FROM b))
        UNION ALL SELECT 'union_all',
          (SELECT count(*) FROM (FROM a UNION ALL FROM b))
        UNION ALL SELECT 'union_distinct',
          (SELECT count(*) FROM (FROM a UNION FROM b))
        ORDER BY op""")),

    "q259_phrase_blocklist" -> Q(
      // Dictionary phrase matching at scale: a bounded blocklist of
      // 2-word phrases joins the corpus's word-2-gram rows on xxhash64
      // keys — one broadcast equi-join for the WHOLE dictionary, instead
      // of a contains() scan per pattern (the q205 trigram lesson,
      // multi-pattern form). Occurrences count every span (shingleRowsAll
      // — not the per-doc distinct), docs count distinct; phrases with
      // zero hits still appear (left join from the dictionary side) —
      // the shape of a PII/contamination blocklist audit.
      build = (s, dir) => {
        import s.implicits._
        val d = table(s, dir, "documents")
        val grams = NearDup.shingleRowsAll(d, "doc_id", "text", 2)
          .select(col("id"), xxhash64(col("s")).as("hs"))
        val dict = Seq("table hash", "customer join", "slow key",
          "big order", "spark window", "dup scan").toDF("phrase")
          .withColumn("hs", xxhash64(col("phrase")))
        dict.join(grams, Seq("hs"), "left")
          .groupBy(col("phrase"))
          .agg(count(col("id")).as("n_occurrences"),
            countDistinct(col("id")).as("n_docs"))
          .orderBy("phrase")
      },
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS t
          FROM documents),
        grams AS (
          SELECT doc_id, t[i] || ' ' || t[i+1] AS g
          FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)),
        dict AS (SELECT unnest(['table hash', 'customer join', 'slow key',
          'big order', 'spark window', 'dup scan']) AS phrase)
        SELECT phrase,
          count(doc_id) AS n_occurrences,
          count(DISTINCT doc_id) AS n_docs
        FROM dict LEFT JOIN grams ON g = phrase
        GROUP BY 1 ORDER BY 1""")),

    "q260_gap_fill" -> Q(
      // Calendar densification + forward fill: per-region daily revenue
      // stretched over the full global day spine (regions x days — a
      // broadcast of two bounded dimension frames), missing days filled
      // with the last observed value via last(ignoreNulls) over a
      // ROWS-unbounded window (DuckDB: last_value IGNORE NULLS). The
      // fill copies doubles VERBATIM, so exact-decimal day revenues stay
      // exact through the fill. The time-series densification every
      // forecasting pipeline runs before modeling.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val c = table(s, dir, "customer")
        val n = table(s, dir, "nation")
        val r = table(s, dir, "region")
        val daily = o.join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("o_orderdate").as("day"))
          .agg(count(lit(1)).as("n_orders"),
            msum(col("o_totalprice")).as("rev"))
        val spine = o.agg(min(col("o_orderdate")).as("d0"),
            max(col("o_orderdate")).as("d1"))
          .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val grid = r.select(col("r_name")).crossJoin(broadcast(spine))
        val w = Window.partitionBy(col("r_name")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(daily, Seq("r_name", "day"), "left")
          .select(col("r_name"), col("day"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            col("rev"))
          .withColumn("rev_filled", last(col("rev"), ignoreNulls = true).over(w))
          .withColumn("is_filled", col("rev").isNull.cast("int"))
          .drop("rev")
          .orderBy("r_name", "day")
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT r_name, o_orderdate AS day, count(*) AS n_orders,
            ${sqlMsum("o_totalprice")} AS rev
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2),
        spine AS (
          SELECT unnest(generate_series(
            (SELECT min(o_orderdate) FROM orders),
            (SELECT max(o_orderdate) FROM orders),
            INTERVAL '1 day'))::DATE AS day),
        grid AS (SELECT r_name, day FROM region CROSS JOIN spine)
        SELECT g.r_name, g.day,
          coalesce(d.n_orders, 0) AS n_orders,
          last_value(d.rev IGNORE NULLS) OVER (
            PARTITION BY g.r_name ORDER BY g.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev_filled,
          CAST(d.rev IS NULL AS INT) AS is_filled
        FROM grid g LEFT JOIN daily d
          ON g.r_name = d.r_name AND g.day = d.day
        ORDER BY g.r_name, g.day""")),

    "q261_frame_battery" -> Q(
      // Engine-contract battery: ROWS vs RANGE cumulative frames on a
      // DELIBERATELY tied ordering (order date, thousands of peers per
      // day). RANGE aggregates all peers of the current key together;
      // ROWS splits them by arbitrary intra-peer order — so the
      // per-row ROWS cumulative is nondeterministic, but its MIN/MAX
      // within each peer group are pinned (first/last possible position),
      // and the RANGE cumulative must equal the ROWS max everywhere.
      // The battery aggregates per (priority, day) AFTER windowing,
      // making the contract itself the deterministic output.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val wRows = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wRange = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("day"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        o.select(col("o_orderpriority"), col("o_orderdate").as("day"))
          .withColumn("c_rows", count(lit(1)).over(wRows))
          .withColumn("c_range", count(lit(1)).over(wRange))
          .groupBy(col("o_orderpriority"), col("day"))
          .agg(count(lit(1)).as("n"),
            min(col("c_rows")).as("rows_min"),
            max(col("c_rows")).as("rows_max"),
            min(col("c_range")).as("range_min"),
            max(col("c_range")).as("range_max"))
          .filter(col("day") < lit("1995-04-01").cast("date"))
          .orderBy("o_orderpriority", "day")
      },
      oracle = Some("""
        WITH w AS (
          SELECT o_orderpriority, o_orderdate AS day,
            count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_rows,
            count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_range
          FROM orders)
        SELECT o_orderpriority, day, count(*) AS n,
          min(c_rows) AS rows_min, max(c_rows) AS rows_max,
          min(c_range) AS range_min, max(c_range) AS range_max
        FROM w
        GROUP BY 1, 2
        HAVING day < DATE '1995-04-01'
        ORDER BY o_orderpriority, day""")),

    "q262_rank_family" -> Q(
      // Engine-contract battery: the rank family on REAL ties — revenue
      // bucket as the (coarse, deliberately tied) sort key, so
      // rank/dense_rank/percent_rank/cume_dist are functions of the key
      // alone (every peer agrees) while ntile runs over the fully
      // unique (bucket, day) ordering to pin its uneven-bucket division
      // contract. percent_rank/cume_dist are integer-ratio doubles —
      // identical formulas, bit-identical cross-engine.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val daily = o.groupBy(col("o_orderpriority"),
            col("o_orderdate").as("day"))
          .agg(msum(col("o_totalprice")).as("rev"))
          .withColumn("bucket", floor(col("rev") / lit(100000.0)))
        val wKey = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("bucket"))
        val wUnique = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("bucket"), col("day"))
        daily.select(col("o_orderpriority"), col("day"), col("bucket"),
            rank().over(wKey).cast("long").as("rnk"),
            dense_rank().over(wKey).cast("long").as("drnk"),
            percent_rank().over(wKey).as("prnk"),
            cume_dist().over(wKey).as("cdist"),
            ntile(7).over(wUnique).cast("long").as("tile"))
          .filter(col("day") < lit("1995-04-01").cast("date"))
          .orderBy("o_orderpriority", "day")
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT o_orderpriority, o_orderdate AS day,
            ${sqlMsum("o_totalprice")} AS rev
          FROM orders GROUP BY 1, 2),
        b AS (SELECT *, CAST(floor(rev / 100000.0) AS BIGINT) AS bucket
          FROM daily)
        SELECT o_orderpriority, day, bucket,
          rank() OVER wk AS rnk,
          dense_rank() OVER wk AS drnk,
          percent_rank() OVER wk AS prnk,
          cume_dist() OVER wk AS cdist,
          CAST(ntile(7) OVER wu AS BIGINT) AS tile
        FROM b
        WINDOW wk AS (PARTITION BY o_orderpriority ORDER BY bucket),
          wu AS (PARTITION BY o_orderpriority ORDER BY bucket, day)
        QUALIFY day < DATE '1995-04-01'
        ORDER BY o_orderpriority, day""")),

    "q263_stream_topk" -> Q(
      // Streaming twin of q253: the native TypedImperativeAggregate
      // running inside a watermarked streaming aggregation — the
      // serialized heap IS the state-store row, O(k) per open day. A
      // day's top-3 spend events emit once the watermark closes it
      // (final open day pending — q76's convention); the oracle windows
      // the raw table over the same horizon. Stream end-state ≡ batch,
      // extended to custom aggregate state.
      build = (s, dir) =>
        graft.streaming.BoundedRuns.streamedDailyTopK(s, dir, k = 3),
      oracle = Some("""
        WITH r AS (
          SELECT CAST(ts AS DATE) AS day, event_id, value,
            row_number() OVER (PARTITION BY CAST(ts AS DATE)
              ORDER BY value DESC, event_id) AS rnk
          FROM events
          WHERE value IS NOT NULL AND event_id IS NOT NULL
            AND CAST(ts AS DATE) + INTERVAL '1 day'
                <= (SELECT max(ts) - INTERVAL '2 hours' FROM events))
        SELECT day, rnk, event_id, value FROM r
        WHERE rnk <= 3
        ORDER BY day, rnk""")),

    "q264_json_roundtrip" -> Q(
      // JSON round-trip battery: orders serialized with to_json, parsed
      // back BOTH ways (path extraction via get_json_object, schema
      // parse via from_json), then aggregated — keys summed exactly,
      // money through the exact-decimal path. JSON float formatting is
      // NOT cross-engine portable, so the oracle never sees the JSON
      // text: it computes the same aggregates from the raw columns, and
      // equality proves the round trip lost nothing (shortest-repr
      // double serialization is exact by construction).
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val js = o.select(to_json(struct(col("o_orderkey"),
          col("o_orderpriority"), col("o_totalprice"))).as("j"))
        val parsed = js.select(
          get_json_object(col("j"), "$.o_orderkey").cast("long").as("k_path"),
          from_json(col("j"), lit(
            "o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE"))
            .as("st"))
          .select(col("k_path"), col("st.o_orderkey").as("k_schema"),
            col("st.o_orderpriority").as("prio"),
            col("st.o_totalprice").as("price"))
        parsed.groupBy(col("prio"))
          .agg(count(lit(1)).as("n"),
            sum(col("k_path")).as("sum_key_path"),
            sum(col("k_schema")).as("sum_key_schema"),
            msum(col("price")).as("sum_price"))
          .orderBy("prio")
      },
      oracle = Some(s"""
        SELECT o_orderpriority AS prio, count(*) AS n,
          CAST(sum(o_orderkey) AS BIGINT) AS sum_key_path,
          CAST(sum(o_orderkey) AS BIGINT) AS sum_key_schema,
          ${sqlMsum("o_totalprice")} AS sum_price
        FROM orders GROUP BY 1 ORDER BY 1""")),

    "q265_order_statistics" -> Q(
      // Exact order statistics WITHOUT a global sort (operators/
      // Selection.scala): bucket histogram + one in-bucket refinement
      // per rank — the selection pattern that replaces ORDER BY ...
      // OFFSET at scale (a full sort funnels 100 TB through one total
      // order; this is a hash agg + one ~n/600-row sort). Median, p90
      // and p99 ranks from integer formulas replicated verbatim in the
      // oracle, values compared bit-for-bit — exact selection, not an
      // approximation.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        Selection.orderStatistics(o, "o_totalprice", Seq(
          ("median", n => (n + 1) / 2),
          ("p90", n => (9 * n + 9) / 10),
          ("p99", n => (99 * n + 99) / 100)), 1000.0)
          .orderBy("stat")
      },
      oracle = Some("""
        WITH v AS (SELECT o_totalprice AS val FROM orders
                   WHERE o_totalprice IS NOT NULL),
        r AS (SELECT val, row_number() OVER (ORDER BY val) AS rn FROM v),
        cnt AS (SELECT count(*) AS n FROM v)
        SELECT 'median' AS stat, CAST((n + 1) // 2 AS BIGINT) AS k,
          (SELECT val FROM r WHERE rn = (SELECT (n + 1) // 2 FROM cnt))
            AS value FROM cnt
        UNION ALL
        SELECT 'p90', CAST((9 * n + 9) // 10 AS BIGINT),
          (SELECT val FROM r WHERE rn = (SELECT (9 * n + 9) // 10 FROM cnt))
          FROM cnt
        UNION ALL
        SELECT 'p99', CAST((99 * n + 99) // 100 AS BIGINT),
          (SELECT val FROM r WHERE rn = (SELECT (99 * n + 99) // 100 FROM cnt))
          FROM cnt
        ORDER BY stat"""),
      bench = true),

    "q266_array_hof_battery" -> Q(
      // Array higher-order-function battery over the embeddings table's
      // real float vectors: filter/exists/forall/aggregate/sort_array/
      // slice against DuckDB's list_* twins. Reductions use the SAME
      // left-to-right fold on both engines (Spark aggregate starts at
      // 0.0; the oracle list_reduces over 0.0 prepended) so double sums
      // are bit-identical, not just close; float→double casts are exact
      // by IEEE widening.
      build = (s, dir) => {
        val e = table(s, dir, "embeddings")
        val v = transform(col("embedding"), x => x.cast("double"))
        e.select(col("vec_id"),
            size(filter(v, x => x > lit(0.0))).as("n_pos"),
            exists(v, x => x > lit(2.0)).as("any_big"),
            forall(v, x => abs(x) < lit(10.0)).as("all_small"),
            aggregate(v, lit(0.0), (acc, x) => acc + abs(x)).as("l1"),
            element_at(sort_array(v), 1).as("vmin"),
            aggregate(slice(v, 1, 8), lit(0.0), (acc, x) => acc + x)
              .as("head8_sum"))
          .orderBy("vec_id")
      },
      oracle = Some("""
        WITH e AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings)
        SELECT vec_id,
          CAST(len(list_filter(v, x -> x > 0.0)) AS INT) AS n_pos,
          len(list_filter(v, x -> x > 2.0)) > 0 AS any_big,
          len(list_filter(v, x -> NOT abs(x) < 10.0)) = 0 AS all_small,
          list_reduce(list_prepend(0.0, list_transform(v, x -> abs(x))),
            (a, b) -> a + b) AS l1,
          list_sort(v)[1] AS vmin,
          list_reduce(list_prepend(0.0, v[1:8]), (a, b) -> a + b)
            AS head8_sum
        FROM e ORDER BY vec_id""")),

    "q267_correlated_subqueries" -> Q(
      // SQL-surface battery through the OTHER front door: spark.sql on
      // registered views, exercising the correlated-subquery rewrites
      // (EXISTS / NOT EXISTS → semi/anti join, correlated scalar
      // subquery → aggregated join) that the DataFrame catalog expresses
      // as explicit joins everywhere else. The oracle runs the
      // IDENTICAL ANSI text — parity of the decorrelation itself.
      build = (s, dir) => {
        table(s, dir, "customer").createOrReplaceTempView("customer")
        table(s, dir, "orders").createOrReplaceTempView("orders")
        table(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql(correlatedBatterySql)
      },
      oracle = Some(correlatedBatterySql)),

    "q268_date_battery" -> Q(
      // Date-function contract battery: date_trunc / last_day /
      // day-of-week / datediff parity per order month. Conventions
      // differ across engines (Spark dayofweek is 1=Sunday, DuckDB dow
      // is 0=Sunday; Spark datediff(end, start), DuckDB
      // date_diff('day', start, end)) — the battery pins the mapping
      // rather than assuming it. Ship lag uses lineitem's independent
      // ship dates (this fixture's l_shipdate is NOT ≥ o_orderdate —
      // FIXTURES lesson), so the lag histogram has both signs.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val li = table(s, dir, "lineitem")
        o.join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
            .as("month_start"))
          .agg(count(lit(1)).as("n_lines"),
            sum((col("o_orderdate") === last_day(col("o_orderdate")))
              .cast("long")).as("n_month_end"),
            sum((dayofweek(col("o_orderdate")) === lit(1)).cast("long"))
              .as("n_sunday"),
            sum(datediff(col("l_shipdate"), col("o_orderdate"))
              .cast("long")).as("ship_lag_days"),
            sum((col("l_shipdate") < col("o_orderdate")).cast("long"))
              .as("n_ship_before_order"))
          .orderBy("month_start")
      },
      oracle = Some("""
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
          count(*) AS n_lines,
          CAST(sum(CASE WHEN o_orderdate = last_day(o_orderdate)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_month_end,
          CAST(sum(CASE WHEN dayofweek(o_orderdate) = 0
            THEN 1 ELSE 0 END) AS BIGINT) AS n_sunday,
          CAST(sum(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT)
            AS ship_lag_days,
          CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ship_before_order
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1 ORDER BY 1""")),

    "q269_partition_pruning" -> Q(
      // Hive-style partitioned sink + pruned read-back: orders written
      // partitionBy(o_orderpriority), re-read with an isin filter that
      // must prune to 2 of 5 directories AT PLANNING time (PlanSpec
      // asserts the scan's PartitionFilters — the layout discipline that
      // turns a 100 TB scan into a 40 TB one before any executor runs).
      // The correctness row proves the round trip: partition values come
      // back from directory names, not data pages, and the aggregate
      // matches the direct oracle bit-for-bit.
      build = (s, dir) => {
        val out = graft.sources.Artifacts.path("target/graft/part_orders_") +
          dir.replaceAll("[^a-zA-Z0-9]", "_")
        table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority"))
          .write.mode("overwrite").partitionBy("o_orderpriority")
          .parquet(out)
        s.read.parquet(out)
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), msum(col("o_totalprice")).as("rev"))
          .orderBy("o_orderpriority")
      },
      oracle = Some(s"""
        SELECT o_orderpriority, count(*) AS n,
          ${sqlMsum("o_totalprice")} AS rev
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        GROUP BY 1 ORDER BY 1""")),

    "q270_schema_evolution" -> Q(
      // Parquet schema evolution: two generations written with different
      // schemas (v2 adds o_orderdate), read back as ONE frame with
      // mergeSchema — old-generation rows surface the new column as
      // NULL. The lake-operations contract every long-lived dataset
      // hits; the oracle recomputes the same aggregates from the raw
      // table, so equality proves the merged read lost and invented
      // nothing. sum_keys pins row identity, n_with_date pins the NULL
      // backfill boundary.
      build = (s, dir) => {
        val out = graft.sources.Artifacts.path("target/graft/evo_orders_") +
          dir.replaceAll("[^a-zA-Z0-9]", "_")
        val o = table(s, dir, "orders")
        o.filter(col("o_orderpriority") === lit("1-URGENT"))
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(out + "/v1")
        o.filter(col("o_orderpriority") === lit("2-HIGH"))
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderdate"))
          .write.mode("overwrite").parquet(out + "/v2")
        s.read.option("mergeSchema", "true")
          .parquet(out + "/v1", out + "/v2")
          .agg(count(lit(1)).as("n_rows"),
            count(col("o_orderdate")).as("n_with_date"),
            sum(col("o_orderkey")).as("sum_keys"),
            msum(col("o_totalprice")).as("rev"))
      },
      oracle = Some(s"""
        SELECT count(*) AS n_rows,
          CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_with_date,
          CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
          ${sqlMsum("o_totalprice")} AS rev
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')""")),

    "q271_isotonic_calibration" -> Q(
      // Isotonic (PAV) calibration of click-count scores against the
      // big-purchase outcome (operators/Isotonic.scala) — the monotone
      // probability curve behind calibrated ranking scores, computed via
      // the minimax closed form max_{j≤i} min_{k≥i} mean(j..k) instead
      // of sequential pooling: one raw-data hash agg to the bounded
      // distinct-score bin frame, then bounded-frame windows — which is
      // what makes a classically SEQUENTIAL algorithm both distributed
      // and oracle-checkable (the identical formula runs in SQL). The
      // fixture's raw rates are non-monotone in places, so the pooled
      // iso_rate differs from raw_rate — the operator provably does
      // work (power-audit lesson).
      build = (s, dir) => {
        val per = table(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(sum((col("event_type") === "click").cast("long"))
            .as("score"),
            max(when(col("event_type") === "purchase"
              && col("value") >= 150, 1L).otherwise(0L)).as("pos"))
        Isotonic.fitBinned(per, "score", "pos").orderBy("score")
      },
      oracle = Some(s"""
        WITH per AS (
          SELECT user_id,
            CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS score,
            max(CASE WHEN event_type = 'purchase' AND value >= 150
              THEN 1 ELSE 0 END) AS pos
          FROM events GROUP BY 1),
        ${Isotonic.sqlCtes("per")}
        SELECT * FROM iso_out ORDER BY score""")),

    "q272_ols_two_features" -> Q(
      // Per-returnflag TWO-regressor OLS (Trend.groupedOls2): line
      // revenue ~ quantity + tax, solved in closed form from the 2×2
      // normal equations on exact-decimal moments — multiple regression
      // as ONE hash aggregation (nine exact sums), no iteration, no
      // second pass; coefficients and R² are combine-order-independent
      // and hash-checkable. Quantity carries the real signal, tax is
      // near-noise — so b1 is large, b2 small and R² high-but-<1, all
      // three visibly data-driven (power audit).
      build = (s, dir) =>
        Trend.groupedOls2(table(s, dir, "lineitem"), Seq("l_returnflag"),
            "l_quantity", "l_tax", "l_extendedprice")
          .withColumnRenamed("l_returnflag", "flag")
          .orderBy("flag"),
      oracle = Some(s"""
        WITH ${Trend.sqlOls2Ctes("lineitem", "l_returnflag", "l_quantity",
          "l_tax", "l_extendedprice")}
        SELECT g AS flag, n, b0, b1, b2, r2 FROM ols2_g ORDER BY flag""")),

    "q273_session_window" -> Q(
      // Spark's NATIVE session_window in batch mode: per-user sessions
      // with a 30-minute inactivity gap, straight from the built-in
      // generator (one keyed shuffle + in-partition merge — the operator
      // form of q75's streaming sessionization; the batch twin proves
      // the same semantics against a lag/cumsum oracle). Session end is
      // last event + gap (Spark's convention; a new session starts when
      // the gap is ≥ 30 min, mirrored exactly by the oracle's >=).
      // Timestamps are NTZ-cast on output (the q85 serialization rule).
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        ev.groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_ev"), msum(col("value")).as("val_sum"))
          .select(col("user_id"),
            col("sw.start").cast("timestamp_ntz").as("s_start"),
            col("sw.end").cast("timestamp_ntz").as("s_end"),
            col("n_ev"), col("val_sum"))
          .orderBy("user_id", "s_start")
      },
      oracle = Some(s"""
        WITH e AS (
          SELECT user_id, ts, value,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS p
          FROM events),
        s AS (
          SELECT *, CASE WHEN p IS NULL
              OR ts >= p + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
          FROM e),
        g AS (
          SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS sid
          FROM s)
        SELECT user_id, min(ts) AS s_start,
          max(ts) + INTERVAL 30 MINUTE AS s_end,
          count(*) AS n_ev, ${sqlMsum("value")} AS val_sum
        FROM g GROUP BY user_id, sid
        ORDER BY user_id, s_start""")),

    "q274_stream_session_window" -> Q(
      // Streaming twin of q273: the NATIVE session_window generator
      // inside a watermarked streaming aggregation (BoundedRuns
      // .streamedSessionWindows) — merging session state with ZERO
      // custom code, next to q75's flatMapGroupsWithState formulation
      // of the same semantics. A session emits once the terminal
      // watermark (max ts − 30 min) passes its end; the oracle rebuilds
      // the same sessions with lag/cumsum and keeps exactly the closed
      // ones.
      build = (s, dir) =>
        graft.streaming.BoundedRuns.streamedSessionWindows(s, dir),
      oracle = Some(s"""
        WITH e AS (
          SELECT user_id, ts, value,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS p
          FROM events),
        s AS (
          SELECT *, CASE WHEN p IS NULL
              OR ts >= p + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
          FROM e),
        g AS (
          SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS sid
          FROM s),
        sess AS (
          SELECT user_id, min(ts) AS s_start,
            max(ts) + INTERVAL 30 MINUTE AS s_end,
            count(*) AS n_ev, ${sqlMsum("value")} AS val_sum
          FROM g GROUP BY user_id, sid),
        wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events)
        SELECT user_id, s_start, s_end, n_ev, val_sum
        FROM sess CROSS JOIN wm WHERE s_end <= w
        ORDER BY user_id, s_start""")),

    "q275_neyman_allocation" -> Q(
      // Neyman-optimal stratified sample allocation: split a 1000-unit
      // sampling budget across order priorities proportional to
      // N_h·σ_h (the allocation minimizing the stratified-mean variance
      // — Neyman 1934), with largest-remainder integer rounding so the
      // parts SUM EXACTLY to the budget (q204's machinery on a derived,
      // noisy weight). Determinism: σ_h comes from exact-decimal
      // moments and is snapped to 8 decimals BEFORE weighting, so
      // N_h·σ_h and its total are exact decimals — a double Σ over
      // strata would be combine-order-dependent. The only doubles are
      // the fixed-shape quota divisions; the remainder rank runs on the
      // bounded 5-stratum frame.
      build = (s, dir) => {
        val budget = 1000L
        val strata = table(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("stratum"))
          .agg(count(lit(1)).as("nh"),
            sum(dec(col("o_totalprice"))).cast("decimal(20,2)").as("sx"),
            sum(dec(col("o_totalprice")) * dec(col("o_totalprice")))
              .cast("decimal(38,4)").as("sxx"))
          .withColumn("sigma", round(sqrt(greatest(lit(0.0),
            (col("nh").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
              / (col("nh").cast("double") * col("nh").cast("double")))),
            8))
          .withColumn("wgt",
            (col("nh") * col("sigma").cast("decimal(18,8)"))
              .cast("decimal(28,8)"))
        val tot = strata.agg(
          sum(col("wgt")).cast("decimal(30,8)").as("tw"))
        val quota = strata.crossJoin(broadcast(tot))
          .withColumn("share", lit(budget) * col("wgt").cast("double")
            / col("tw").cast("double"))
          .withColumn("base", floor(col("share")).cast("long"))
          .withColumn("rem", col("share") - col("base"))
        val used = quota.agg(sum(col("base")).as("ub"))
        val wr = Window.orderBy(col("rem").desc, col("stratum"))
        quota.crossJoin(broadcast(used))
          .withColumn("rk", row_number().over(wr))
          .withColumn("alloc", col("base") +
            when(col("rk") <= lit(budget) - col("ub"), 1L).otherwise(0L))
          .select(col("stratum"), col("nh"), col("sigma"), col("alloc"))
          .orderBy("stratum")
      },
      oracle = Some("""
        WITH strata AS (
          SELECT o_orderpriority AS stratum, count(*) AS nh,
            CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DECIMAL(20,2)) AS sx,
            CAST(sum(CAST(o_totalprice AS DECIMAL(19,2))
              * CAST(o_totalprice AS DECIMAL(15,2)))
              AS DECIMAL(38,4)) AS sxx
          FROM orders GROUP BY 1),
        sg AS (
          SELECT *, round(sqrt(greatest(0.0,
            (CAST(nh AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            / (CAST(nh AS DOUBLE) * CAST(nh AS DOUBLE)))), 8) AS sigma
          FROM strata),
        wg AS (
          SELECT *, CAST(nh * CAST(sigma AS DECIMAL(18,8))
            AS DECIMAL(28,8)) AS wgt
          FROM sg),
        tot AS (SELECT CAST(sum(wgt) AS DECIMAL(30,8)) AS tw FROM wg),
        quota AS (
          SELECT stratum, nh, sigma,
            1000 * CAST(wgt AS DOUBLE) / CAST(tw AS DOUBLE) AS share
          FROM wg CROSS JOIN tot),
        qb AS (
          SELECT *, CAST(floor(share) AS BIGINT) AS base,
            share - floor(share) AS rem
          FROM quota),
        used AS (SELECT CAST(sum(base) AS BIGINT) AS ub FROM qb),
        rk AS (
          SELECT *, row_number() OVER (ORDER BY rem DESC, stratum) AS r
          FROM qb)
        SELECT stratum, nh, sigma,
          base + CASE WHEN r <= 1000 - ub THEN 1 ELSE 0 END AS alloc
        FROM rk CROSS JOIN used
        ORDER BY stratum""")),

    "q276_mad_outliers" -> Q(
      // Robust outlier panel: per-priority exact median and MAD (median
      // absolute deviation — the 50%-breakdown spread estimator a
      // single corrupt value cannot move, unlike σ), and the count of
      // |x − med| > 3·MAD flags. Three passes, each a hash agg with the
      // bounded per-priority stats broadcast back onto the scan — never
      // a per-group sort. Exactness: Spark `percentile` and DuckDB
      // `quantile_cont` agree on WHICH values interpolate at p=.5 but
      // not on the interpolation's expression shape (a·(1−g)+b·g vs
      // a+g·(b−a) differ in the last ulp), so both medians are snapped
      // at 4 decimals — the true value has ≤3 (midpoints of 2-decimal
      // money), making the snap pure float-noise removal; every
      // downstream expression then runs on identical doubles, so even
      // exact-boundary outlier compares agree bit-for-bit.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
          .select(col("o_orderpriority").as("pri"),
            col("o_totalprice").cast("double").as("x"))
        val med = o.groupBy(col("pri"))
          .agg(round(expr("percentile(x, 0.5)"), 4).as("med"))
        val dev = o.join(broadcast(med), "pri")
          .withColumn("d", abs(col("x") - col("med")))
        val mad = dev.groupBy(col("pri"))
          .agg(count(lit(1)).as("n"),
            round(expr("percentile(d, 0.5)"), 4).as("mad"))
        val outl = dev
          .join(broadcast(mad.select(col("pri"), col("mad"))), "pri")
          .groupBy(col("pri"))
          .agg(sum((col("d") > lit(3.0) * col("mad")).cast("long"))
            .as("n_out"))
        med.join(mad, "pri").join(outl, "pri")
          .select(col("pri"), col("n"), col("med"), col("mad"),
            col("n_out"))
          .orderBy("pri")
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_orderpriority AS pri, CAST(o_totalprice AS DOUBLE) AS x
          FROM orders),
        med AS (
          SELECT pri, round(quantile_cont(x, 0.5), 4) AS med
          FROM o GROUP BY 1),
        dev AS (
          SELECT o.pri, abs(x - med) AS d FROM o JOIN med USING (pri)),
        mad AS (
          SELECT pri, count(*) AS n,
            round(quantile_cont(d, 0.5), 4) AS mad
          FROM dev GROUP BY 1),
        outl AS (
          SELECT dev.pri, CAST(sum(CASE WHEN d > 3.0 * mad
            THEN 1 ELSE 0 END) AS BIGINT) AS n_out
          FROM dev JOIN mad USING (pri) GROUP BY 1)
        SELECT pri, n, med, mad, n_out
        FROM med JOIN mad USING (pri) JOIN outl USING (pri)
        ORDER BY pri""")),

    "q277_retraction_agg" -> Q(
      // Incremental view maintenance, the RETRACTION half (operators/
      // Incremental.retract): per-user aggregate state built over ALL
      // events, then low-value rows (value < 10 — the erasure batch)
      // retracted. Count/sum subtract exactly; min/max — NOT
      // retractable algebraically — are recomputed only for the touched
      // keys via a left-semi-pruned recount, so maintenance cost tracks
      // the erased slice. The oracle aggregates the survivors directly:
      // equality proves the incremental path is indistinguishable from
      // recomputation, including fully-erased users disappearing.
      build = (s, dir) => {
        val base = table(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("value"))
        val deletes = base.filter(col("value") < 10)
        val survivors = base.join(deletes.select(col("event_id")),
          Seq("event_id"), "left_anti")
        val state = Incremental.aggState(base, Seq("user_id"), "value")
        Incremental.retract(state, deletes, survivors,
            Seq("user_id"), "value")
          .select(col("user_id"), col("st_n").as("n_live"),
            m2(col("st_sum")).as("sum_live"), col("st_min").as("min_live"),
            col("st_max").as("max_live"))
          .orderBy("user_id")
      },
      oracle = Some(s"""
        SELECT user_id, count(value) AS n_live,
          ${sqlMsum("value")} AS sum_live,
          min(value) AS min_live, max(value) AS max_live
        FROM events WHERE NOT (value < 10)
        GROUP BY user_id ORDER BY user_id""")),

    "q278_ranking_metrics" -> Q(
      // Offline ranking-quality panel — MRR, MAP@10 and NDCG@10 of a
      // popularity recommender under a temporal split: parts ranked by
      // pre-1997 co-purchase volume, relevance = the customer's actual
      // post-1997 purchases. The evaluation suite every recsys/search
      // pipeline runs beside AUC (q95: does the score rank? this: does
      // the LIST convert?). Scale shape: the train pass is one hash agg
      // + TakeOrdered-10; the 10-row ranked list broadcasts onto the
      // per-customer test sets; per-user accumulations are partitioned
      // windows over ≤10 hit rows. Determinism: every per-hit term
      // (1/log2(r+1), i/r) is snapped to 8 decimals into exact decimal
      // BEFORE summation — a double Σ would be combine-order-dependent —
      // and the IDCG table is built by the SAME rounded-term cumsum in
      // both engines. Users with no top-10 hit score zero, not NULL.
      build = (s, dir) => {
        val split = lit("1997-01-01").cast("date")
        val ord = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            to_date(col("o_orderdate")).as("d"))
        val li = table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
        val train = li.join(ord.filter(col("d") < split),
          col("l_orderkey") === col("o_orderkey"))
        val top10 = train.groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("l_partkey")).limit(10)
          .withColumn("r", row_number().over(
            Window.orderBy(col("cnt").desc, col("l_partkey"))))
          .select(col("l_partkey"), col("r"))
        val test = li.join(ord.filter(col("d") >= split),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("cust"), col("l_partkey")).distinct()
        val mu = test.groupBy(col("cust")).agg(count(lit(1)).as("m"))
        val wU = Window.partitionBy(col("cust")).orderBy(col("r"))
        val perHit = test.join(broadcast(top10), "l_partkey")
          .withColumn("i", row_number().over(wU))
          .withColumn("ap_t", round(col("i").cast("double")
            / col("r").cast("double"), 8).cast("decimal(12,8)"))
          .withColumn("dcg_t", round(lit(1.0)
            / log2(col("r").cast("double") + 1.0), 8)
            .cast("decimal(12,8)"))
        val perUserHit = perHit.groupBy(col("cust"))
          .agg(min(col("r")).as("minr"),
            sum(col("ap_t")).cast("decimal(16,8)").as("ap_sum"),
            sum(col("dcg_t")).cast("decimal(16,8)").as("dcg_sum"))
        val idcg = s.range(1, 11).toDF("i")
          .withColumn("t", round(lit(1.0)
            / log2(col("i").cast("double") + 1.0), 8)
            .cast("decimal(12,8)"))
          .withColumn("idcg", sum(col("t")).over(Window.orderBy(col("i"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("decimal(16,8)"))
          .select(col("i"), col("idcg"))
        val perUser = mu.join(perUserHit, Seq("cust"), "left")
          .withColumn("me", least(col("m"), lit(10L)))
          .join(broadcast(idcg), col("me") === col("i"))
          .withColumn("mrr", coalesce(round(lit(1.0)
            / col("minr").cast("double"), 8), lit(0.0))
            .cast("decimal(12,8)"))
          .withColumn("ap", coalesce(round(col("ap_sum").cast("double")
            / col("me").cast("double"), 8), lit(0.0))
            .cast("decimal(12,8)"))
          .withColumn("ndcg", coalesce(round(col("dcg_sum").cast("double")
            / col("idcg").cast("double"), 8), lit(0.0))
            .cast("decimal(12,8)"))
        perUser.agg(count(lit(1)).as("n_users"),
          round(sum(col("mrr")).cast("double")
            / count(lit(1)).cast("double"), 8).as("mean_mrr"),
          round(sum(col("ap")).cast("double")
            / count(lit(1)).cast("double"), 8).as("mean_map10"),
          round(sum(col("ndcg")).cast("double")
            / count(lit(1)).cast("double"), 8).as("mean_ndcg10"))
      },
      oracle = Some("""
        WITH train AS (
          SELECT l_partkey FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'),
        top10 AS (
          SELECT l_partkey, row_number() OVER (ORDER BY cnt DESC,
            l_partkey) AS r
          FROM (SELECT l_partkey, count(*) AS cnt FROM train GROUP BY 1)
          ORDER BY cnt DESC, l_partkey LIMIT 10),
        test AS (
          SELECT DISTINCT o_custkey AS cust, l_partkey FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'),
        mu AS (SELECT cust, count(*) AS m FROM test GROUP BY 1),
        perhit AS (
          SELECT cust, r,
            row_number() OVER (PARTITION BY cust ORDER BY r) AS i
          FROM test JOIN top10 USING (l_partkey)),
        peruserhit AS (
          SELECT cust, min(r) AS minr,
            CAST(sum(CAST(round(CAST(i AS DOUBLE) / CAST(r AS DOUBLE), 8)
              AS DECIMAL(12,8))) AS DECIMAL(16,8)) AS ap_sum,
            CAST(sum(CAST(round(1.0 / log2(CAST(r AS DOUBLE) + 1.0), 8)
              AS DECIMAL(12,8))) AS DECIMAL(16,8)) AS dcg_sum
          FROM perhit GROUP BY 1),
        idcg AS (
          SELECT i, CAST(sum(t) OVER (ORDER BY i
              ROWS UNBOUNDED PRECEDING) AS DECIMAL(16,8)) AS idcg
          FROM (SELECT i, CAST(round(1.0 / log2(CAST(i AS DOUBLE) + 1.0),
              8) AS DECIMAL(12,8)) AS t
            FROM range(1, 11) t(i))),
        peruser AS (
          SELECT mu.cust, least(mu.m, 10) AS me,
            CAST(coalesce(round(1.0 / CAST(minr AS DOUBLE), 8), 0.0)
              AS DECIMAL(12,8)) AS mrr,
            CAST(coalesce(round(CAST(ap_sum AS DOUBLE)
              / CAST(least(mu.m, 10) AS DOUBLE), 8), 0.0)
              AS DECIMAL(12,8)) AS ap,
            CAST(coalesce(round(CAST(dcg_sum AS DOUBLE)
              / CAST(idcg.idcg AS DOUBLE), 8), 0.0)
              AS DECIMAL(12,8)) AS ndcg
          FROM mu LEFT JOIN peruserhit USING (cust)
          JOIN idcg ON least(mu.m, 10) = idcg.i)
        SELECT count(*) AS n_users,
          round(CAST(sum(mrr) AS DOUBLE) / count(*), 8) AS mean_mrr,
          round(CAST(sum(ap) AS DOUBLE) / count(*), 8) AS mean_map10,
          round(CAST(sum(ndcg) AS DOUBLE) / count(*), 8) AS mean_ndcg10
        FROM peruser""")),

    "q279_brier_decomposition" -> Q(
      // Murphy decomposition of forecast quality over q99's reliability
      // bins: REL (calibration error mass), RES (how much the bins
      // separate outcomes), UNC (outcome base-rate entropy) — the
      // decomposition that says WHY a Brier score is bad, next to q99's
      // ECE (how far off) — plus the direct raw-forecast Brier. All bin
      // terms are weighted into 6-snapped decimals before the bounded Σ
      // (a double Σ would be order-dependent); the raw Brier snaps each
      // identical-IEEE (conf−y)² at 10 decimals into an exact sum, so
      // the data-sized aggregation is partitioning-independent too.
      build = (s, dir) => {
        // evaluation contract (r9): calibration needs a score AND a
        // label — NULL status is an unknown outcome, not a negative
        val o = table(s, dir, "orders")
          .filter(col("o_totalprice").isNotNull &&
            col("o_orderstatus").isNotNull)
        val mm = o.agg(min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"))
        val binned = o.crossJoin(broadcast(mm))
          .withColumn("conf",
            (col("o_totalprice") - col("mn")) / (col("mx") - col("mn")))
          .withColumn("bin",
            least(floor(col("conf") * 10).cast("long"), lit(9L)))
          .withColumn("y", (col("o_orderstatus") === "F").cast("long"))
        val raw = binned.agg(
          sum(round(pow(col("conf") - col("y"), 2.0), 10)
            .cast("decimal(14,10)")).cast("decimal(24,10)").as("bsum"),
          count(lit(1)).as("nt"), sum(col("y")).as("post"))
        val perBin = binned.groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
            davg(col("conf")).as("conf_avg"))
        val terms = perBin.crossJoin(broadcast(raw))
          .withColumn("rate", col("pos").cast("double") / col("n"))
          .withColumn("obar", col("post").cast("double") / col("nt"))
          .withColumn("rel_t", round(col("n").cast("double")
            * pow(col("conf_avg") - col("rate"), 2.0), 6)
            .cast("decimal(18,6)"))
          .withColumn("res_t", round(col("n").cast("double")
            * pow(col("rate") - col("obar"), 2.0), 6)
            .cast("decimal(18,6)"))
        terms.groupBy(col("nt"), col("obar"), col("bsum"))
          .agg(sum(col("rel_t")).cast("decimal(24,6)").as("rels"),
            sum(col("res_t")).cast("decimal(24,6)").as("ress"))
          .select(
            round(col("rels").cast("double") / col("nt"), 8)
              .as("reliability"),
            round(col("ress").cast("double") / col("nt"), 8)
              .as("resolution"),
            round(col("obar") * (lit(1.0) - col("obar")), 8)
              .as("uncertainty"),
            round(col("bsum").cast("double") / col("nt"), 8)
              .as("brier_raw"))
      },
      oracle = Some(s"""
        WITH obs AS (
          SELECT * FROM orders
          WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL),
        mm AS (
          SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
          FROM obs),
        b AS (
          SELECT
            least(CAST(floor((o_totalprice - mn) / (mx - mn) * 10)
              AS BIGINT), 9) AS bin,
            (o_totalprice - mn) / (mx - mn) AS conf,
            CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
          FROM obs, mm),
        raw AS (
          SELECT CAST(sum(CAST(round(pow(conf - y, 2.0), 10)
              AS DECIMAL(14,10))) AS DECIMAL(24,10)) AS bsum,
            count(*) AS nt, CAST(sum(y) AS BIGINT) AS post
          FROM b),
        pb AS (
          SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos,
            ${sqlDavg("conf")} AS conf_avg
          FROM b GROUP BY bin),
        terms AS (
          SELECT pb.*, raw.nt, raw.bsum,
            CAST(pos AS DOUBLE) / n AS rate,
            CAST(post AS DOUBLE) / nt AS obar
          FROM pb CROSS JOIN raw),
        t2 AS (
          SELECT nt, obar, bsum,
            CAST(round(CAST(n AS DOUBLE)
              * pow(conf_avg - rate, 2.0), 6) AS DECIMAL(18,6)) AS rel_t,
            CAST(round(CAST(n AS DOUBLE)
              * pow(rate - obar, 2.0), 6) AS DECIMAL(18,6)) AS res_t
          FROM terms)
        SELECT
          round(CAST(CAST(sum(rel_t) AS DECIMAL(24,6)) AS DOUBLE)
            / nt, 8) AS reliability,
          round(CAST(CAST(sum(res_t) AS DECIMAL(24,6)) AS DOUBLE)
            / nt, 8) AS resolution,
          round(obar * (1.0 - obar), 8) AS uncertainty,
          round(CAST(bsum AS DOUBLE) / nt, 8) AS brier_raw
        FROM t2 GROUP BY nt, obar, bsum""")),

    "q280_mutual_information" -> Q(
      // Mutual information + normalized MI between order priority and
      // order status — the model-free dependence measure behind
      // categorical feature selection (chi-square q111 says IS there
      // dependence; MI says HOW MANY NATS it carries). One count pass
      // to the bounded |A|×|B| grid, margins joined back (broadcast,
      // no window); every cell/margin term is a fixed-shape expression
      // of exact integer ratios, snapped at 10 decimals into exact
      // decimal before the bounded Σ. Cells with n_ab = 0 contribute 0
      // (the measure-theoretic convention) by simply not existing in
      // the grouped frame.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
          .select(col("o_orderpriority").as("a"),
            col("o_orderstatus").as("b"))
        val cells = o.groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("nab"))
        val ma = o.groupBy(col("a")).agg(count(lit(1)).as("na"))
        val mb = o.groupBy(col("b")).agg(count(lit(1)).as("nb"))
        val tot = o.agg(count(lit(1)).as("nt"))
        val nD = col("nt").cast("double")
        val mi_t = round(col("nab").cast("double") / nD
          * log(col("nab").cast("double") * nD
            / (col("na").cast("double") * col("nb").cast("double"))), 10)
          .cast("decimal(14,10)")
        val joined = cells.join(broadcast(ma), "a")
          .join(broadcast(mb), "b").crossJoin(broadcast(tot))
        val mi = joined.agg(sum(mi_t).cast("decimal(20,10)").as("mis"))
          .select(col("mis").cast("double").as("mi"))
        def entropy(m: DataFrame, nCol: String): DataFrame =
          m.crossJoin(broadcast(tot))
            .agg(sum(round(-col(nCol).cast("double") / nD
              * log(col(nCol).cast("double") / nD), 10)
              .cast("decimal(14,10)")).cast("decimal(20,10)").as("hs"))
            .select(col("hs").cast("double").as("h"))
        val ha = entropy(ma, "na").select(col("h").as("h_a"))
        val hb = entropy(mb, "nb").select(col("h").as("h_b"))
        mi.crossJoin(ha).crossJoin(hb)
          .select(round(col("mi"), 8).as("mi_nats"),
            round(col("h_a"), 8).as("h_priority"),
            round(col("h_b"), 8).as("h_status"),
            round(col("mi") / sqrt(col("h_a") * col("h_b")), 8)
              .as("nmi"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_orderpriority AS a, o_orderstatus AS b FROM orders),
        cells AS (SELECT a, b, count(*) AS nab FROM o GROUP BY 1, 2),
        ma AS (SELECT a, count(*) AS na FROM o GROUP BY 1),
        mb AS (SELECT b, count(*) AS nb FROM o GROUP BY 1),
        tot AS (SELECT count(*) AS nt FROM o),
        mi AS (
          SELECT CAST(CAST(sum(CAST(round(
              CAST(nab AS DOUBLE) / CAST(nt AS DOUBLE)
              * ln(CAST(nab AS DOUBLE) * CAST(nt AS DOUBLE)
                / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 10)
              AS DECIMAL(14,10))) AS DECIMAL(20,10)) AS DOUBLE) AS mi
          FROM cells JOIN ma USING (a) JOIN mb USING (b)
          CROSS JOIN tot),
        ha AS (
          SELECT CAST(CAST(sum(CAST(round(
              -CAST(na AS DOUBLE) / CAST(nt AS DOUBLE)
              * ln(CAST(na AS DOUBLE) / CAST(nt AS DOUBLE)), 10)
              AS DECIMAL(14,10))) AS DECIMAL(20,10)) AS DOUBLE) AS h_a
          FROM ma CROSS JOIN tot),
        hb AS (
          SELECT CAST(CAST(sum(CAST(round(
              -CAST(nb AS DOUBLE) / CAST(nt AS DOUBLE)
              * ln(CAST(nb AS DOUBLE) / CAST(nt AS DOUBLE)), 10)
              AS DECIMAL(14,10))) AS DECIMAL(20,10)) AS DOUBLE) AS h_b
          FROM mb CROSS JOIN tot)
        SELECT round(mi, 8) AS mi_nats, round(h_a, 8) AS h_priority,
          round(h_b, 8) AS h_status,
          round(mi / sqrt(h_a * h_b), 8) AS nmi
        FROM mi CROSS JOIN ha CROSS JOIN hb""")),

    "q281_stream_outer_attribution" -> Q(
      // LEFT OUTER stream-stream interval join (q78's other half): the
      // unconverted purchases ARE the signal — each emits with NULL
      // click columns once the click-side watermark proves no on-time
      // click can still match it (state-store eviction + null
      // extension). Matched pairs emit like the inner join; unmatched
      // purchases inside the terminal watermark window stay pending.
      // The eviction boundary is the GLOBAL watermark — the MIN over
      // both inputs of (that input's max event time − delay), because
      // each filtered source tracks its own: the purchase-side max lags
      // the click-side max, so the oracle must model both (pinned
      // empirically at both SFs; a single-max watermark over- or
      // under-emits by the straggler gap). Event times are full-
      // microsecond random, so the boundary is never tied.
      build = (s, dir) => ntzOut(
        graft.streaming.BoundedRuns.emittedAttributionOuter(s, dir)),
      oracle = Some("""
        WITH p AS (
          SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id AS c_user_id, event_id AS click_id,
            ts AS click_ts
          FROM events WHERE event_type = 'click'),
        wm AS (
          SELECT least((SELECT max(purchase_ts) FROM p),
                       (SELECT max(click_ts) FROM c))
            - INTERVAL 30 MINUTE AS w),
        j AS (
          SELECT p.user_id, purchase_id, purchase_ts, click_id, click_ts
          FROM p LEFT JOIN c ON c_user_id = p.user_id
            AND click_ts <= purchase_ts
            AND click_ts >= purchase_ts - INTERVAL '1 hour')
        SELECT user_id, purchase_id, purchase_ts, click_id, click_ts
        FROM j CROSS JOIN wm
        WHERE click_id IS NOT NULL OR purchase_ts < w
        ORDER BY user_id, purchase_id, click_id""")),

    "q282_quantile_normalization" -> Q(
      // Quantile normalization (operators/QuantileNorm.scala): every
      // priority's order-value distribution forced onto the POOLED
      // type-7 curve — the batch-effect correction that makes
      // per-source feature distributions comparable before training.
      // Within-group ranks are partitioned windows; the pooled order
      // statistics come from PrefixSum (bucketed global rank, never a
      // single-partition sort); the lookup is two integer-rank joins.
      // The row proves the operator worked: pre-normalization means
      // vary by priority, post-normalization means collapse to nearly
      // (not exactly — the p-grids differ with group size) the same
      // pooled value.
      build = (s, dir) => {
        // observation contract (r9): quantile normalization maps OBSERVED
        // values — NULL prices are not observations (they would also sit
        // at opposite ends of the two engines' rank windows). Means use
        // a money-width (19,4) snap: davg's (14,8) envelope is for unit-
        // scale metrics and a full-envelope DECIMAL(12,2) price overflows
        // it on both engines.
        def wavg(c: Column): Column =
          round(sum(c.cast("decimal(19,4)")), 4).cast("double") / count(lit(1))
        val o = table(s, dir, "orders")
          .filter(col("o_totalprice").isNotNull)
          .select(col("o_orderpriority").as("pri"),
            col("o_orderkey").as("id"),
            col("o_totalprice").cast("double").as("x"))
        QuantileNorm.toPooled(o, "pri", "x", "id")
          .groupBy(col("pri"))
          .agg(count(lit(1)).as("n"), wavg(col("x")).as("mean_pre"),
            wavg(col("qn_value")).as("mean_post"))
          .orderBy("pri")
      },
      oracle = Some(s"""
        WITH o AS (
          SELECT o_orderpriority AS pri, o_orderkey AS id,
            CAST(o_totalprice AS DOUBLE) AS x
          FROM orders WHERE o_totalprice IS NOT NULL),
        g AS (
          SELECT *, row_number() OVER (PARTITION BY pri ORDER BY x, id)
              AS gr,
            count(*) OVER (PARTITION BY pri) AS gn
          FROM o),
        p AS (
          SELECT x AS pv, row_number() OVER (ORDER BY x, id) AS prnk
          FROM o),
        n AS (SELECT count(*) AS nt FROM o),
        q AS (
          SELECT pri, x, 1.0 + (nt - 1)
              * (CAST(gr AS DOUBLE) - 0.5) / CAST(gn AS DOUBLE) AS pos,
            nt
          FROM g CROSS JOIN n),
        q2 AS (
          SELECT pri, x, CAST(floor(pos) AS BIGINT) AS lo,
            least(CAST(floor(pos) AS BIGINT) + 1, nt) AS hi,
            pos - floor(pos) AS gg
          FROM q),
        j AS (
          SELECT pri, x,
            floor((plo.pv * (1.0 - gg) + gg * phi.pv) * 100.0 + 0.5)
              / 100.0 AS qn
          FROM q2
          JOIN p plo ON q2.lo = plo.prnk
          JOIN p phi ON q2.hi = phi.prnk)
        SELECT pri, count(*) AS n,
          CAST(round(sum(CAST(x AS DECIMAL(19,4))), 4) AS DOUBLE)
            / count(*) AS mean_pre,
          CAST(round(sum(CAST(qn AS DECIMAL(19,4))), 4) AS DOUBLE)
            / count(*) AS mean_post
        FROM j GROUP BY pri ORDER BY pri""")),

    "q283_oof_target_encoding" -> Q(
      // Leakage-free (out-of-fold) M-smoothed target encoding — the
      // production form of P6's simple target encode: market segment
      // encoded by mean customer revenue computed from the OTHER four
      // folds only, so a row never sees its own target (the leakage
      // that silently inflates offline metrics). The complement trick
      // makes it ONE pass: segment×fold sums (bounded 25-cell grid,
      // exact decimal), and every out-of-fold statistic is a
      // subtraction — segment-total minus own-fold — never a second
      // scan. Smoothing shrinks thin complements toward the (equally
      // out-of-fold) global mean with m = 20 virtual rows. Folds are
      // c_custkey mod 5 — portable across engines, unlike either
      // engine's hash. Customers without orders have no target and are
      // excluded (inner join), like any supervised fit.
      build = (s, dir) => {
        val m = 20.0
        val cy = table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))
          .join(table(s, dir, "orders")
            .groupBy(col("o_custkey"))
            .agg(sum(dec(col("o_totalprice"))).cast("decimal(20,2)")
              .as("yd")),
            col("c_custkey") === col("o_custkey"))
          .withColumn("fold", pmod(col("c_custkey"), lit(5)).cast("long"))
        val cells = cy.groupBy(col("seg"), col("fold"))
          .agg(count(lit(1)).as("n_sf"),
            sum(col("yd")).cast("decimal(24,2)").as("s_sf"))
        val segTot = cells.groupBy(col("seg"))
          .agg(sum(col("n_sf")).as("n_s"),
            sum(col("s_sf")).cast("decimal(26,2)").as("s_s"))
        val foldTot = cells.groupBy(col("fold"))
          .agg(sum(col("n_sf")).as("n_f"),
            sum(col("s_sf")).cast("decimal(26,2)").as("s_f"))
        val grand = cells.agg(sum(col("n_sf")).as("n_g"),
          sum(col("s_sf")).cast("decimal(28,2)").as("s_g"))
        cells.join(broadcast(segTot), "seg")
          .join(broadcast(foldTot), "fold")
          .crossJoin(broadcast(grand))
          .withColumn("mu_oof", (col("s_g") - col("s_f")).cast("double")
            / (col("n_g") - col("n_f")).cast("double"))
          .withColumn("enc", round(
            ((col("s_s") - col("s_sf")).cast("double")
              + lit(m) * col("mu_oof"))
            / ((col("n_s") - col("n_sf")).cast("double") + lit(m)), 8))
          .select(col("seg"), col("fold"), col("n_sf"), col("enc"))
          .orderBy("seg", "fold")
      },
      oracle = Some("""
        WITH cy AS (
          SELECT c_custkey, c_mktsegment AS seg, c_custkey % 5 AS fold, yd
          FROM customer
          JOIN (SELECT o_custkey,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                    AS DECIMAL(20,2)) AS yd
                FROM orders GROUP BY 1) o
            ON c_custkey = o_custkey),
        cells AS (
          SELECT seg, fold, count(*) AS n_sf,
            CAST(sum(yd) AS DECIMAL(24,2)) AS s_sf
          FROM cy GROUP BY 1, 2),
        seg_tot AS (
          SELECT seg, CAST(sum(n_sf) AS BIGINT) AS n_s,
            CAST(sum(s_sf) AS DECIMAL(26,2)) AS s_s
          FROM cells GROUP BY 1),
        fold_tot AS (
          SELECT fold, CAST(sum(n_sf) AS BIGINT) AS n_f,
            CAST(sum(s_sf) AS DECIMAL(26,2)) AS s_f
          FROM cells GROUP BY 1),
        grand AS (
          SELECT CAST(sum(n_sf) AS BIGINT) AS n_g,
            CAST(sum(s_sf) AS DECIMAL(28,2)) AS s_g
          FROM cells)
        SELECT seg, fold, n_sf,
          round((CAST(s_s - s_sf AS DOUBLE)
              + 20.0 * (CAST(s_g - s_f AS DOUBLE)
                / CAST(n_g - n_f AS DOUBLE)))
            / (CAST(n_s - n_sf AS DOUBLE) + 20.0), 8) AS enc
        FROM cells
        JOIN seg_tot USING (seg) JOIN fold_tot USING (fold)
        CROSS JOIN grand
        ORDER BY seg, fold""")),

    "q284_feature_hashing" -> Q(
      // The hashing trick (Weinberger et al. 2009): categorical features
      // mapped into a FIXED 16-bucket space by a portable md5 hash with
      // a ±1 sign bit — the encoder that needs no vocabulary, no fit
      // and no shuffle to build (sklearn FeatureHasher / Vowpal Wabbit's
      // core). Each customer contributes two features (segment,
      // nation); the row audits the bucket space itself: per bucket the
      // row count, DISTINCT feature values (the collision profile — the
      // thing you size D against) and the signed mass (sign-hashing
      // makes colliding features cancel in expectation rather than
      // pile up). Everything is exact integers on md5 bits, portable
      // across engines — the same TextHash.md5Bits60 every sketch here
      // uses.
      build = (s, dir) => {
        val cust = table(s, dir, "customer")
          .join(broadcast(table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
        val feats = cust.select(explode(array(
          concat(lit("seg="), col("c_mktsegment")),
          concat(lit("nat="), col("n_name")))).as("f"))
        feats.withColumn("h", TextHash.md5Bits60(col("f")))
          .withColumn("idx", pmod(col("h"), lit(16L)))
          .withColumn("sgn", when(pmod(expr("h div 16"), lit(2L)) === 0L,
            lit(1L)).otherwise(lit(-1L)))
          .groupBy(col("idx"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("f")).as("n_values"),
            sum(col("sgn")).as("signed_mass"))
          .orderBy("idx")
      },
      oracle = Some(s"""
        WITH feats AS (
          SELECT 'seg=' || c_mktsegment AS f
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          UNION ALL
          SELECT 'nat=' || n_name AS f
          FROM customer JOIN nation ON c_nationkey = n_nationkey),
        hashed AS (
          SELECT f, ${TextHash.sqlMd5Bits60("f")} AS h FROM feats)
        SELECT h % 16 AS idx, count(*) AS n_rows,
          count(DISTINCT f) AS n_values,
          CAST(sum(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END)
            AS BIGINT) AS signed_mass
        FROM hashed GROUP BY 1 ORDER BY 1""")),

    "q285_matryoshka_audit" -> Q(
      // Matryoshka truncation audit (Kusupati et al. 2022): how much
      // cosine structure survives keeping only the first 8/16/32 of 64
      // embedding dims — the measurement behind every "store the cheap
      // prefix, rerank with the full vector" retrieval design (and the
      // honest answer is dimension-dependent, which is the point of
      // auditing before truncating). Consecutive-id pairs give a
      // deterministic O(n) pair set (no sampling RNG); per-dim cosines
      // use the same sequential-fold dot product as every similarity
      // row (native graft_cosine ≡ DuckDB list_dot_product — the
      // proven-bit-equal q25 idiom); per-pair deltas snap to 8 decimals
      // into exact sums (davg). sign_agree counts pairs whose
      // truncated cosine keeps the full cosine's sign.
      build = (s, dir) => {
        val e = emb(s, dir)
        val a = e.select(col("vec_id").as("id_a"),
          Vectors.asDouble(col("embedding")).as("va"))
        val b = e.select(col("vec_id").as("id_b"),
          Vectors.asDouble(col("embedding")).as("vb"))
        val pairs = a.join(b, col("id_a") + 1 === col("id_b"))
        pairs
          .withColumn("d", explode(array(lit(8), lit(16), lit(32),
            lit(64))))
          // A VALID vector can still have an all-zero prefix, so the
          // truncated cosine can be 0/0 even behind the embedding gate:
          // NaN there is poison (Spark orders NaN > 0 true, IEEE/DuckDB
          // false). Undefined truncated cosine → NULL; the aggregates
          // below then skip that pair on both engines identically.
          .withColumn("cd_raw", Vectors.cosine(
            slice(col("va"), lit(1), col("d")),
            slice(col("vb"), lit(1), col("d"))))
          .withColumn("cd",
            when(isnan(col("cd_raw")), lit(null)).otherwise(col("cd_raw")))
          .withColumn("cf", Vectors.cosine(col("va"), col("vb")))
          .groupBy(col("d"))
          .agg(count(lit(1)).as("n_pairs"),
            davg(abs(col("cd") - col("cf"))).as("mean_abs_delta"),
            sum(when(col("cd").isNotNull &&
              ((col("cd") > 0) === (col("cf") > 0)), 1L).otherwise(0L))
              .as("sign_agree"))
          .orderBy("d")
      },
      oracle = Some(s"""
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings WHERE $sqlEmbValid),
        p AS (
          SELECT a.emb AS va, b.emb AS vb
          FROM v a JOIN v b ON a.vec_id + 1 = b.vec_id),
        dd AS (SELECT unnest([8, 16, 32, 64]) AS d),
        x AS (
          SELECT d, va, vb, va[1:d] AS ca, vb[1:d] AS cb
          FROM p CROSS JOIN dd),
        c AS (
          SELECT d,
            -- zero-norm prefix of a valid vector → undefined truncated
            -- cosine → NULL (mirrors the Spark side's isnan guard)
            CASE WHEN sqrt(list_dot_product(ca, ca))
                   * sqrt(list_dot_product(cb, cb)) = 0 THEN NULL
              ELSE list_dot_product(ca, cb) / (sqrt(list_dot_product(ca, ca))
                * sqrt(list_dot_product(cb, cb))) END AS cd,
            list_dot_product(va, vb) / (sqrt(list_dot_product(va, va))
              * sqrt(list_dot_product(vb, vb))) AS cf
          FROM x)
        SELECT d, count(*) AS n_pairs,
          ${sqlDavg("abs(cd - cf)")} AS mean_abs_delta,
          CAST(sum(CASE WHEN cd IS NOT NULL AND (cd > 0) = (cf > 0)
            THEN 1 ELSE 0 END) AS BIGINT) AS sign_agree
        FROM c GROUP BY d ORDER BY d""")),

    "q286_struct_array_battery" -> Q(
      // Nested struct-array engine contract: each order's lines packed
      // into a SORTED array<struct> (collect_list is partitioning-
      // ordered — sort_array on the unique linenumber key is what makes
      // the nested value deterministic, the q208 lesson one level
      // deeper), then consumed entirely through the nested API:
      // element_at + getField for head/tail access, a sequential
      // aggregate() fold over struct fields in EXACT DECIMAL for the
      // order total, exists() for a predicate probe. The oracle
      // computes the same VALUES from the flat rows via a row_number
      // mirror of the FULL lexicographic struct order (ln, q, p) —
      // l_linenumber REPEATS within orders in the shipped data, so a
      // bare arg_min-by-linenumber is nondeterministic exactly where
      // sort_array's whole-struct comparison is not; decimal folds are
      // associative, so nested-fold ≡ flat-sum exactly.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber").as("ln"),
            dec(col("l_quantity")).as("q"),
            dec(col("l_extendedprice")).as("p"))
        li.groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(
            struct(col("ln"), col("q"), col("p")))).as("lines"))
          .select(col("l_orderkey"),
            size(col("lines")).as("n_lines"),
            element_at(col("lines"), 1).getField("q").cast("double")
              .as("first_qty"),
            element_at(col("lines"), -1).getField("p").cast("double")
              .as("last_price"),
            m2(aggregate(col("lines"),
              lit(0).cast("decimal(24,4)"),
              (acc, x) => (acc + (x.getField("q") * x.getField("p"))
                .cast("decimal(24,4)")).cast("decimal(24,4)")))
              .as("order_total"),
            exists(col("lines"),
              x => x.getField("q") > lit(45).cast("decimal(12,2)"))
              .as("any_bulk"))
          .orderBy("l_orderkey")
      },
      oracle = Some("""
        WITH r AS (
          SELECT l_orderkey, l_quantity, l_extendedprice,
            row_number() OVER (PARTITION BY l_orderkey
              ORDER BY l_linenumber, l_quantity, l_extendedprice) AS rn,
            count(*) OVER (PARTITION BY l_orderkey) AS nl
          FROM lineitem)
        SELECT l_orderkey, count(*) AS n_lines,
          CAST(max(CASE WHEN rn = 1
            THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE)
            AS first_qty,
          CAST(max(CASE WHEN rn = nl
            THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE)
            AS last_price,
          CAST(round(sum(CAST(CAST(l_quantity AS DECIMAL(19,2))
              * CAST(l_extendedprice AS DECIMAL(12,2))
              AS DECIMAL(24,4))), 2) AS DOUBLE) AS order_total,
          bool_or(l_quantity > 45) AS any_bulk
        FROM r GROUP BY l_orderkey ORDER BY l_orderkey""")),

    "q287_eb_shrinkage" -> Q(
      // Empirical-Bayes shrinkage of per-nation fulfillment rates: fit a
      // Beta prior to the 25 observed rates by method of moments, then
      // shrink each nation toward it — (k+α)/(n+α+β) — so thin nations
      // move a lot and populous ones barely (the "true rate for small
      // segments" estimator; Robinson's batting-average classic). One
      // hash agg to the bounded nation frame; the prior moments are
      // 8-snapped decimal sums over 25 rows (combine-order-independent);
      // α/β and every shrunken rate are fixed-shape doubles, snapped
      // once. The audit column `moved` = |shrunk − raw| makes the
      // shrinkage visibly data-driven (power discipline).
      build = (s, dir) => {
        val nf = table(s, dir, "orders")
          .join(table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"),
            sum((col("o_orderstatus") === "F").cast("long")).as("k"))
          .withColumn("p", col("k").cast("double") / col("n").cast("double"))
        val mom = nf.agg(count(lit(1)).as("g"),
          sum(round(col("p"), 8).cast("decimal(12,8)"))
            .cast("decimal(16,8)").as("sp"),
          sum(round(col("p") * col("p"), 8).cast("decimal(12,8)"))
            .cast("decimal(16,8)").as("spp"))
        val gD = col("g").cast("double")
        val m = col("sp").cast("double") / gD
        val v = col("spp").cast("double") / gD - m * m
        val common = m * (lit(1.0) - m) / v - lit(1.0)
        nf.crossJoin(broadcast(mom))
          .withColumn("alpha", m * common)
          .withColumn("beta", (lit(1.0) - m) * common)
          .select(col("n_name"), col("n"), col("k"),
            round(col("p"), 8).as("raw_rate"),
            round((col("k").cast("double") + col("alpha"))
              / (col("n").cast("double") + col("alpha") + col("beta")), 8)
              .as("shrunk_rate"),
            round(abs((col("k").cast("double") + col("alpha"))
              / (col("n").cast("double") + col("alpha") + col("beta"))
              - col("p")), 8).as("moved"))
          .orderBy("n_name")
      },
      oracle = Some("""
        WITH nf AS (
          SELECT n_name, count(*) AS n,
            CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1),
        np AS (SELECT *, CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p
          FROM nf),
        mom AS (
          SELECT count(*) AS g,
            CAST(sum(CAST(round(p, 8) AS DECIMAL(12,8)))
              AS DECIMAL(16,8)) AS sp,
            CAST(sum(CAST(round(p * p, 8) AS DECIMAL(12,8)))
              AS DECIMAL(16,8)) AS spp
          FROM np),
        pri AS (
          SELECT g, sp, spp,
            CAST(sp AS DOUBLE) / CAST(g AS DOUBLE) AS m,
            CAST(spp AS DOUBLE) / CAST(g AS DOUBLE)
              - (CAST(sp AS DOUBLE) / CAST(g AS DOUBLE))
              * (CAST(sp AS DOUBLE) / CAST(g AS DOUBLE)) AS v
          FROM mom),
        ab AS (
          SELECT m * (m * (1.0 - m) / v - 1.0) AS alpha,
            (1.0 - m) * (m * (1.0 - m) / v - 1.0) AS beta
          FROM pri)
        SELECT n_name, n, k, round(p, 8) AS raw_rate,
          round((CAST(k AS DOUBLE) + alpha)
            / (CAST(n AS DOUBLE) + alpha + beta), 8) AS shrunk_rate,
          round(abs((CAST(k AS DOUBLE) + alpha)
            / (CAST(n AS DOUBLE) + alpha + beta) - p), 8) AS moved
        FROM np CROSS JOIN ab
        ORDER BY n_name""")),

    "q288_median_ci" -> Q(
      // Distribution-free 95% CI for the median — the two order
      // statistics at the binomial-quantile ranks n/2 ∓ 0.98·√n (normal
      // approximation, fixed-shape integer formulas replicated verbatim
      // in the oracle) — composed on q265's two-phase Selection operator:
      // three exact order statistics (lo, median, hi) with NO global
      // sort, each one bounded in-bucket refinement. The interval that
      // turns "the median is X" into "the median is X, and we are 95%
      // sure it is between L and H" without assuming any distribution
      // (order-statistic CI, Conover 1971).
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        def rlo(n: Long): Long =
          math.max(1L, (n / 2.0 - 0.98 * math.sqrt(n.toDouble)).floor.toLong)
        def rhi(n: Long): Long =
          math.min(n, (n / 2.0 + 1.0 + 0.98 * math.sqrt(n.toDouble)).ceil.toLong)
        Selection.orderStatistics(o, "o_totalprice", Seq(
          ("ci_lo", rlo), ("median", n => (n + 1) / 2), ("ci_hi", rhi)),
          1000.0)
          .orderBy("stat")
      },
      oracle = Some("""
        WITH v AS (SELECT o_totalprice AS val FROM orders
                   WHERE o_totalprice IS NOT NULL),
        r AS (SELECT val, row_number() OVER (ORDER BY val) AS rn FROM v),
        cnt AS (SELECT count(*) AS n FROM v),
        ks AS (
          SELECT
            greatest(1, CAST(floor(n / 2.0 - 0.98 * sqrt(CAST(n AS
              DOUBLE))) AS BIGINT)) AS k_lo,
            CAST((n + 1) // 2 AS BIGINT) AS k_med,
            least(n, CAST(ceil(n / 2.0 + 1.0 + 0.98 * sqrt(CAST(n AS
              DOUBLE))) AS BIGINT)) AS k_hi
          FROM cnt)
        SELECT 'ci_hi' AS stat, k_hi AS k,
          (SELECT val FROM r WHERE rn = (SELECT k_hi FROM ks)) AS value
          FROM ks
        UNION ALL
        SELECT 'ci_lo', k_lo,
          (SELECT val FROM r WHERE rn = (SELECT k_lo FROM ks)) FROM ks
        UNION ALL
        SELECT 'median', k_med,
          (SELECT val FROM r WHERE rn = (SELECT k_med FROM ks)) FROM ks
        ORDER BY stat""")),

    "q289_stream_scd2" -> Q(
      // Streaming SCD2 dimension maintenance (q85's batch operator as a
      // continuously-running stream): each user's event_type history
      // kept as ONE open row in keyed state — the state IS the live
      // dimension table — with every actual change emitting the closed
      // validity interval. Closure is data-driven (no watermark timeout
      // needed: a dimension's current version stays open forever), so
      // the emitted set over the bounded run equals the batch SCD2 rows
      // whose effective_to is non-NULL, tie-broken by the opening
      // event id exactly like the batch operator.
      build = (s, dir) => ntzOut(
        graft.streaming.BoundedRuns.emittedScd2(s, dir)),
      oracle = Some("""
        WITH chg AS (
          -- keyed-operator contract: the dimension key is user_id
          SELECT user_id, ts, event_id, event_type,
            lag(event_type) OVER (
              PARTITION BY user_id ORDER BY ts, event_id) AS prev,
            row_number() OVER (
              PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events WHERE user_id IS NOT NULL),
        -- rn = 1: a user's FIRST event always opens a version. The lag
        -- encoding alone cannot see it when the first attribute is NULL
        -- (NULL IS DISTINCT FROM NULL is false), but the keyed state
        -- operator correctly opens a NULL-attr version and closes it on
        -- the first change.
        f AS (SELECT * FROM chg
              WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        scd AS (
          SELECT user_id, event_type, ts AS effective_from,
            lead(ts) OVER (
              PARTITION BY user_id ORDER BY ts, event_id)
              AS effective_to,
            event_id AS open_id
          FROM f)
        SELECT user_id, event_type, effective_from, effective_to, open_id
        FROM scd WHERE effective_to IS NOT NULL
        ORDER BY user_id, effective_from, open_id""")),

    "q290_tail_attribution" -> Q(
      // Tail attribution: WHO lives above the global p99 — the "which
      // segment drives tail latency" panel of any SLO review. The
      // global p99 comes from Selection's two-phase exact selection
      // (q265's operator — a hash-agg histogram + one in-bucket
      // refinement, never a global sort), collected as one bounded
      // driver scalar and pushed back into a single counting pass:
      // per-priority total, tail count, and each priority's share of
      // the whole tail. Exact integers plus one fixed-shape division.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val p99 = Selection.orderStatistics(o, "o_totalprice",
            Seq(("p99", n => (99 * n + 99) / 100)), 1000.0)
          .collect()(0).getDouble(2)
        val per = o.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum((col("o_totalprice").cast("double") > lit(p99))
              .cast("long")).as("n_tail"))
        val tot = per.agg(sum(col("n_tail")).as("tt"))
        per.crossJoin(broadcast(tot))
          .select(col("o_orderpriority"), col("n"), col("n_tail"),
            round(col("n_tail").cast("double") / col("tt").cast("double"),
              8).as("tail_share"))
          .orderBy("o_orderpriority")
      },
      oracle = Some("""
        WITH v AS (SELECT o_totalprice AS val FROM orders
                   WHERE o_totalprice IS NOT NULL),
        r AS (SELECT val, row_number() OVER (ORDER BY val) AS rn FROM v),
        cnt AS (SELECT count(*) AS n FROM v),
        p99 AS (SELECT val AS p FROM r
                WHERE rn = (SELECT (99 * n + 99) // 100 FROM cnt)),
        per AS (
          SELECT o_orderpriority, count(*) AS n,
            CAST(sum(CASE WHEN CAST(o_totalprice AS DOUBLE)
              > (SELECT p FROM p99) THEN 1 ELSE 0 END) AS BIGINT)
              AS n_tail
          FROM orders GROUP BY 1),
        tot AS (SELECT CAST(sum(n_tail) AS BIGINT) AS tt FROM per)
        SELECT o_orderpriority, n, n_tail,
          round(CAST(n_tail AS DOUBLE) / CAST(tt AS DOUBLE), 8)
            AS tail_share
        FROM per CROSS JOIN tot
        ORDER BY o_orderpriority""")),

    "q291_oof_ols_stacking" -> Q(
      // Out-of-fold REGRESSION predictions (stacking's first stage,
      // leakage-free like q283's encoder): price ~ quantity fit per
      // fold ON THE COMPLEMENT ONLY, via the moment-subtraction trick —
      // five exact-decimal moments per fold (bounded 5-row frame), each
      // fold's coefficients from (total − own fold), then one residual
      // pass scoring every row with ITS fold's out-of-fold line. The
      // whole stacked-feature computation costs two scans and zero
      // model-fit iterations; rmse varies by fold (power discipline) and
      // every residual² is snapped into an exact sum before the mean.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(pmod(col("l_orderkey"), lit(5)).cast("long").as("fold"),
            dec(col("l_quantity")).as("x"), dec(col("l_extendedprice")).as("y"))
        val mom = li.groupBy(col("fold"))
          .agg(count(lit(1)).as("nf"),
            sum(col("x")).cast("decimal(20,2)").as("sx"),
            sum(col("x") * col("x")).cast("decimal(30,4)").as("sxx"),
            sum(col("y")).cast("decimal(22,2)").as("sy"),
            sum(col("x") * col("y")).cast("decimal(32,4)").as("sxy"))
        val tot = mom.agg(sum(col("nf")).as("nt"),
          sum(col("sx")).cast("decimal(22,2)").as("tx"),
          sum(col("sxx")).cast("decimal(32,4)").as("txx"),
          sum(col("sy")).cast("decimal(24,2)").as("ty"),
          sum(col("sxy")).cast("decimal(34,4)").as("txy"))
        val nc = (col("nt") - col("nf")).cast("double")
        val cx = (col("tx") - col("sx")).cast("double")
        val cxx = (col("txx") - col("sxx")).cast("double")
        val cy = (col("ty") - col("sy")).cast("double")
        val cxy = (col("txy") - col("sxy")).cast("double")
        val den = nc * cxx - cx * cx
        val coef = mom.crossJoin(broadcast(tot))
          .withColumn("slope", round((nc * cxy - cx * cy) / den, 8))
          .withColumn("icept", round((cy - col("slope") * cx) / nc, 6))
          .select(col("fold"), col("nf"), col("slope"), col("icept"))
        li.join(broadcast(coef), "fold")
          .withColumn("r2t", round(
            pow(col("y").cast("double") - col("icept")
              - col("slope") * col("x").cast("double"), 2.0), 4)
            .cast("decimal(24,4)"))
          .groupBy(col("fold"), col("nf"), col("slope"), col("icept"))
          .agg(sum(col("r2t")).cast("decimal(30,4)").as("sse"))
          .select(col("fold"), col("nf").as("n"), col("slope"),
            col("icept").as("intercept"),
            round(sqrt(col("sse").cast("double")
              / col("nf").cast("double")), 6).as("oof_rmse"))
          .orderBy("fold")
      },
      oracle = Some("""
        WITH li AS (
          SELECT l_orderkey % 5 AS fold,
            CAST(l_quantity AS DECIMAL(20,2)) AS x,
            CAST(l_extendedprice AS DECIMAL(20,2)) AS y
          FROM lineitem),
        mom AS (
          SELECT fold, count(*) AS nf,
            CAST(sum(x) AS DECIMAL(20,2)) AS sx,
            CAST(sum(x * x) AS DECIMAL(30,4)) AS sxx,
            CAST(sum(y) AS DECIMAL(22,2)) AS sy,
            CAST(sum(x * y) AS DECIMAL(32,4)) AS sxy
          FROM li GROUP BY 1),
        tot AS (
          SELECT CAST(sum(nf) AS BIGINT) AS nt,
            CAST(sum(sx) AS DECIMAL(22,2)) AS tx,
            CAST(sum(sxx) AS DECIMAL(32,4)) AS txx,
            CAST(sum(sy) AS DECIMAL(24,2)) AS ty,
            CAST(sum(sxy) AS DECIMAL(34,4)) AS txy
          FROM mom),
        coef AS (
          SELECT fold, nf,
            round((CAST(nt - nf AS DOUBLE) * CAST(txy - sxy AS DOUBLE)
                - CAST(tx - sx AS DOUBLE) * CAST(ty - sy AS DOUBLE))
              / (CAST(nt - nf AS DOUBLE) * CAST(txx - sxx AS DOUBLE)
                - CAST(tx - sx AS DOUBLE) * CAST(tx - sx AS DOUBLE)), 8)
              AS slope,
            round((CAST(ty - sy AS DOUBLE)
                - round((CAST(nt - nf AS DOUBLE)
                    * CAST(txy - sxy AS DOUBLE)
                  - CAST(tx - sx AS DOUBLE) * CAST(ty - sy AS DOUBLE))
                / (CAST(nt - nf AS DOUBLE) * CAST(txx - sxx AS DOUBLE)
                  - CAST(tx - sx AS DOUBLE) * CAST(tx - sx AS DOUBLE)), 8)
                  * CAST(tx - sx AS DOUBLE))
              / CAST(nt - nf AS DOUBLE), 6) AS icept
          FROM mom CROSS JOIN tot),
        res AS (
          SELECT li.fold, nf, slope, icept,
            CAST(round(pow(CAST(y AS DOUBLE) - icept
              - slope * CAST(x AS DOUBLE), 2.0), 4) AS DECIMAL(24,4))
              AS r2t
          FROM li JOIN coef USING (fold))
        SELECT fold, nf AS n, slope, icept AS intercept,
          round(sqrt(CAST(CAST(sum(r2t) AS DECIMAL(30,4)) AS DOUBLE)
            / CAST(nf AS DOUBLE)), 6) AS oof_rmse
        FROM res GROUP BY fold, nf, slope, icept
        ORDER BY fold""")),

    "q292_haversine_nn" -> Q(
      // Spherical nearest neighbor: q257's grid blocking lifted onto the
      // globe — deterministic (lng, lat) per key by exact integer
      // arithmetic, 5-degree cells, suppliers replicated to their 3x3
      // neighborhood (the bounded side takes the x9), cell equi-join,
      // then TRUE great-circle distance (haversine, R=6371.0088 km)
      // instead of q257's planar d2. The km distance is snapped at 3
      // decimals (meter precision) BEFORE the per-customer argmin and the
      // per-nation rollup, so cross-libm sin/cos last-ulp differences
      // can't flip a rank or an aggregate. Scale shape: candidates from
      // a cell equi-join (never all-pairs), dims broadcast, one keyed
      // window per customer, bounded 25-row output.
      build = (s, dir) => {
        def pos(key: Column, mLng: Long, mLat: Long) = (
          (key * lit(mLng) % lit(360000L)).cast("double") / lit(1000.0) - lit(180.0),
          (key * lit(mLat) % lit(180000L)).cast("double") / lit(1000.0) - lit(90.0))
        val (clng, clat) = pos(col("c_custkey").cast("long"), 12007L, 104659L)
        val cust = table(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            clng.as("lng"), clat.as("lat"))
          .withColumn("gx", floor(col("lng") / lit(5.0)))
          .withColumn("gy", floor(col("lat") / lit(5.0)))
        val (slng, slat) = pos(col("s_suppkey").cast("long"), 12011L, 104651L)
        val supp = table(s, dir, "supplier")
          .select(col("s_suppkey"), slng.as("slng"), slat.as("slat"))
          .withColumn("sgx", floor(col("slng") / lit(5.0)))
          .withColumn("sgy", floor(col("slat") / lit(5.0)))
          .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
          .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
          .select(col("s_suppkey"), col("slng"), col("slat"),
            (col("sgx") + col("dx")).as("gx"), (col("sgy") + col("dy")).as("gy"))
        val hav = {
          val dphi = radians(col("slat") - col("lat")) / lit(2.0)
          val dlmb = radians(col("slng") - col("lng")) / lit(2.0)
          val a = sin(dphi) * sin(dphi) +
            cos(radians(col("lat"))) * cos(radians(col("slat"))) *
              sin(dlmb) * sin(dlmb)
          round(lit(2.0 * 6371.0088) * asin(sqrt(a)), 3)
        }
        val cand = cust.join(broadcast(supp), Seq("gx", "gy"))
          .withColumn("d_km", hav)
        val w = Window.partitionBy(col("c_custkey"))
          .orderBy(col("d_km"), col("s_suppkey"))
        val nearest = cand.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        nearest
          .join(broadcast(table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_matched"),
            sum(col("d_km").cast("decimal(12,3)")).as("skm"),
            max(col("d_km")).as("max_km"))
          .select(col("n_name"), col("n_matched"),
            round(col("skm").cast("double") / col("n_matched").cast("double"),
              6).as("mean_km"),
            col("max_km"))
          .orderBy("n_name")
      },
      oracle = Some("""
        WITH c AS (
          SELECT c_custkey, c_nationkey,
            CAST(c_custkey * 12007 % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lng,
            CAST(c_custkey * 104659 % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat
          FROM customer),
        cg AS (SELECT *, floor(lng / 5.0) AS gx, floor(lat / 5.0) AS gy FROM c),
        sp AS (
          SELECT s_suppkey,
            CAST(s_suppkey * 12011 % 360000 AS DOUBLE) / 1000.0 - 180.0 AS slng,
            CAST(s_suppkey * 104651 % 180000 AS DOUBLE) / 1000.0 - 90.0 AS slat
          FROM supplier),
        sg AS (
          SELECT s_suppkey, slng, slat,
            floor(slng / 5.0) + dx.d AS gx, floor(slat / 5.0) + dy.d AS gy
          FROM sp
          CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
          CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy),
        -- recall: exact by the operator's contract — nearest WITHIN the
        -- 3x3 neighbor cells (q257's cover, haversine metric)
        cand AS (
          SELECT c_custkey, c_nationkey, s_suppkey,
            round(2.0 * 6371.0088 * asin(sqrt(
              sin(radians(slat - lat) / 2.0) * sin(radians(slat - lat) / 2.0)
              + cos(radians(lat)) * cos(radians(slat))
                * sin(radians(slng - lng) / 2.0)
                * sin(radians(slng - lng) / 2.0))), 3) AS d_km
          FROM cg JOIN sg USING (gx, gy)),
        nearest AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY c_custkey
              ORDER BY d_km, s_suppkey) AS rn
            FROM cand) WHERE rn = 1)
        SELECT n_name, count(*) AS n_matched,
          round(CAST(sum(CAST(d_km AS DECIMAL(12,3))) AS DOUBLE)
            / CAST(count(*) AS DOUBLE), 6) AS mean_km,
          max(d_km) AS max_km
        FROM nearest JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    "q293_diff_in_diff" -> Q(
      // Difference-in-differences: the workhorse quasi-experimental
      // estimator. Treated = even user_id, post = ts >= Jan 16 (the
      // stream's midpoint), outcome = purchase value. One scan computes
      // all four cell moments (n, exact-decimal sum, exact-decimal sum
      // of squares); the DiD point estimate is the double-difference of
      // cell means and its SE is the root of the summed variance of each
      // cell mean — all finalized from exact sums, so combine-order
      // independent. Single bounded output row.
      build = (s, dir) => {
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        // user_id IS NOT NULL: a unit with no identity has no arm (and
        // NULL % 2 would silently land in different arms across engines —
        // Spark's grouping makes a NULL cell, SQL's CASE ELSE puts it in
        // control); value IS NOT NULL via count(v): n must count observed
        // OUTCOMES, not rows, or the cell mean is computed over phantom
        // observations
        val cells = table(s, dir, "events")
          .filter(col("event_type") === "purchase"
            && col("user_id").isNotNull)
          .select((col("user_id") % 2 === 0).cast("long").as("treated"),
            (col("ts") >= cut).cast("long").as("post"),
            col("value").cast("decimal(18,6)").as("v"))
          .groupBy(col("treated"), col("post"))
          .agg(count(col("v")).as("n"), sum(col("v")).as("sv"),
            sum(col("v") * col("v")).cast("decimal(38,12)").as("svv"))
          .select(col("treated"), col("post"), col("n"),
            col("sv").cast("double").as("sv"),
            col("svv").cast("double").as("svv"))
        // 4-row frame -> one row via conditional aggregation.
        def cell(t: Int, p: Int, c: Column) =
          sum(when(col("treated") === t && col("post") === p, c))
        val one = cells.agg(
          cell(1, 0, col("n")).as("n_t_pre"), cell(1, 1, col("n")).as("n_t_post"),
          cell(0, 0, col("n")).as("n_c_pre"), cell(0, 1, col("n")).as("n_c_post"),
          cell(1, 0, col("sv")).as("s_t_pre"), cell(1, 1, col("sv")).as("s_t_post"),
          cell(0, 0, col("sv")).as("s_c_pre"), cell(0, 1, col("sv")).as("s_c_post"),
          cell(1, 0, col("svv")).as("q_t_pre"), cell(1, 1, col("svv")).as("q_t_post"),
          cell(0, 0, col("svv")).as("q_c_pre"), cell(0, 1, col("svv")).as("q_c_post"))
        def m(s: String, n: String) = col(s) / col(n).cast("double")
        def vm(q: String, s: String, n: String) = {
          val nd = col(n).cast("double")
          (col(q) - col(s) * col(s) / nd) / (nd - 1.0) / nd
        }
        one.select(
          col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
          round(m("s_t_pre", "n_t_pre"), 6).as("mean_t_pre"),
          round(m("s_t_post", "n_t_post"), 6).as("mean_t_post"),
          round(m("s_c_pre", "n_c_pre"), 6).as("mean_c_pre"),
          round(m("s_c_post", "n_c_post"), 6).as("mean_c_post"),
          round((m("s_t_post", "n_t_post") - m("s_t_pre", "n_t_pre"))
            - (m("s_c_post", "n_c_post") - m("s_c_pre", "n_c_pre")), 6)
            .as("did"),
          round(sqrt(vm("q_t_pre", "s_t_pre", "n_t_pre")
            + vm("q_t_post", "s_t_post", "n_t_post")
            + vm("q_c_pre", "s_c_pre", "n_c_pre")
            + vm("q_c_post", "s_c_post", "n_c_post")), 6).as("se"))
      },
      oracle = Some("""
        WITH fe AS (
          -- observed outcome = FINITE metric (Spark's decimal cast maps
          -- NaN/Inf to NULL, so n/sv/svv all skip corrupt rows there)
          SELECT user_id, ts,
            (CASE WHEN isfinite(value) THEN value END) AS value
          FROM events
          WHERE event_type = 'purchase' AND user_id IS NOT NULL),
        cells AS (
          SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
            CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
              THEN 1 ELSE 0 END AS post,
            count(value) AS n,
            CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
            CAST(CAST(sum(CAST(value AS DECIMAL(19,6))
              * CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,12))
              AS DOUBLE) AS svv
          FROM fe
          GROUP BY 1, 2),
        one AS (
          SELECT
            sum(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n_t_pre,
            sum(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_t_post,
            sum(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n_c_pre,
            sum(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_c_post,
            sum(CASE WHEN treated = 1 AND post = 0 THEN sv END) AS s_t_pre,
            sum(CASE WHEN treated = 1 AND post = 1 THEN sv END) AS s_t_post,
            sum(CASE WHEN treated = 0 AND post = 0 THEN sv END) AS s_c_pre,
            sum(CASE WHEN treated = 0 AND post = 1 THEN sv END) AS s_c_post,
            sum(CASE WHEN treated = 1 AND post = 0 THEN svv END) AS q_t_pre,
            sum(CASE WHEN treated = 1 AND post = 1 THEN svv END) AS q_t_post,
            sum(CASE WHEN treated = 0 AND post = 0 THEN svv END) AS q_c_pre,
            sum(CASE WHEN treated = 0 AND post = 1 THEN svv END) AS q_c_post
          FROM cells)
        SELECT
          CAST(n_t_pre AS BIGINT) AS n_t_pre,
          CAST(n_t_post AS BIGINT) AS n_t_post,
          CAST(n_c_pre AS BIGINT) AS n_c_pre,
          CAST(n_c_post AS BIGINT) AS n_c_post,
          round(s_t_pre / n_t_pre, 6) AS mean_t_pre,
          round(s_t_post / n_t_post, 6) AS mean_t_post,
          round(s_c_pre / n_c_pre, 6) AS mean_c_pre,
          round(s_c_post / n_c_post, 6) AS mean_c_post,
          round((s_t_post / n_t_post - s_t_pre / n_t_pre)
            - (s_c_post / n_c_post - s_c_pre / n_c_pre), 6) AS did,
          round(sqrt(
              (q_t_pre - s_t_pre * s_t_pre / n_t_pre) / (n_t_pre - 1.0) / n_t_pre
            + (q_t_post - s_t_post * s_t_post / n_t_post) / (n_t_post - 1.0) / n_t_post
            + (q_c_pre - s_c_pre * s_c_pre / n_c_pre) / (n_c_pre - 1.0) / n_c_pre
            + (q_c_post - s_c_post * s_c_post / n_c_post) / (n_c_post - 1.0) / n_c_post
            ), 6) AS se
        FROM one""")),
  )
}
