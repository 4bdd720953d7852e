package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Stable._
import graft.operators._

/** Catalog part 4 of 7: queries q200..q246, in original catalog
  * order ([[Queries.all]] concatenates the parts — split from the former
  * single-file catalog purely for compile/review ergonomics; content and
  * order are unchanged).
  */
private[graft] trait Catalog4 extends CatalogBase {
  protected val entries4: Seq[(String, Q)] = Seq(

    "q200_kaplan_meier" -> Q(
      // Kaplan-Meier survival of time-to-first-big-purchase (value ≥
      // 150; 67 of 150 fixture users convert, the rest are censored at
      // observation end — without censoring handling the estimate would
      // be biased toward converters). Per-day risk sets come from one
      // bounded day-level aggregation plus a cumulative window over the
      // ≤ |users| distinct-duration frame (bounded like q169's
      // calendar frame, NOT row-level); the product Π(1 − d/n) runs as
      // an exact-decimal cumulative sum of 8-snapped ln terms, exp'd
      // and snapped once — deterministic cross-engine like q181's
      // exponential decay.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        val t0 = ev.groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("d0"))
        val tp = ev.filter(col("event_type") === "purchase"
            && col("value") >= 150)
          .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("dp"))
        val end = ev.agg(max(to_date(col("ts"))).as("dend"))
        val durs = t0.join(tp, Seq("user_id"), "left")
          .crossJoin(broadcast(end))
          .select(
            when(col("dp").isNotNull, datediff(col("dp"), col("d0")))
              .otherwise(datediff(col("dend"), col("d0")))
              .cast("long").as("dur"),
            col("dp").isNotNull.cast("long").as("ev"))
        val dayAgg = durs.groupBy(col("dur"))
          .agg(sum(col("ev")).as("d"), count(lit(1)).as("cnt"))
        val wPrev = Window.orderBy(col("dur"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wCum = Window.orderBy(col("dur"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        dayAgg
          .crossJoin(broadcast(durs.agg(count(lit(1)).as("ntot"))))
          .withColumn("n_risk",
            col("ntot") - coalesce(sum(col("cnt")).over(wPrev), lit(0L)))
          .filter(col("d") > 0)
          .withColumn("lnterm", when(col("d") < col("n_risk"),
              round(log(lit(1.0)
                - col("d").cast("double") / col("n_risk")), 8))
            .otherwise(lit(-99.0)))
          .withColumn("surv", round(exp(
            sum(col("lnterm").cast("decimal(20,8)")).over(wCum)
              .cast("double")), 8))
          .select(col("dur").as("t_days"), col("n_risk"), col("d"),
            col("surv"))
          .orderBy(col("t_days"))
      },
      oracle = Some("""
        WITH t0 AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS d0
          FROM events GROUP BY 1),
        tp AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS dp
          FROM events WHERE event_type = 'purchase' AND value >= 150
          GROUP BY 1),
        endd AS (SELECT max(CAST(ts AS DATE)) AS dend FROM events),
        durs AS (
          SELECT CAST(CASE WHEN tp.dp IS NOT NULL
              THEN date_diff('day', t0.d0, tp.dp)
              ELSE date_diff('day', t0.d0, endd.dend) END AS BIGINT)
              AS dur,
            CAST(CASE WHEN tp.dp IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
              AS ev
          FROM t0 LEFT JOIN tp ON tp.user_id = t0.user_id
          CROSS JOIN endd),
        day_agg AS (
          SELECT dur, CAST(sum(ev) AS BIGINT) AS d, count(*) AS cnt
          FROM durs GROUP BY 1),
        risk AS (
          SELECT dur, d,
            (SELECT count(*) FROM durs) - coalesce(
              sum(cnt) OVER (ORDER BY dur
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS n_risk
          FROM day_agg),
        terms AS (
          SELECT dur, d, n_risk,
            CASE WHEN d < n_risk
              THEN round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 8)
              ELSE -99.0 END AS lnterm
          FROM risk WHERE d > 0)
        SELECT dur AS t_days, CAST(n_risk AS BIGINT) AS n_risk, d,
          round(exp(CAST(sum(CAST(lnterm AS DECIMAL(20,8))) OVER (
            ORDER BY dur ROWS UNBOUNDED PRECEDING) AS DOUBLE)), 8)
            AS surv
        FROM terms
        ORDER BY t_days""")),

    "q201_stream_debounce" -> Q(
      // Streaming twin of q194: the same 1 h lag-gap debounce as a
      // flatMapGroupsWithState verdict stream (one LastSeen timestamp
      // per key, event-time-timeout eviction), run bounded with
      // AvailableNow and aggregated to the SAME oracle as the batch
      // operator — stream ≡ batch, the q74-q80/q130/q151 guarantee
      // extended to custom keyed state with per-event output.
      build = (s, dir) =>
        graft.streaming.BoundedRuns.emittedDebounce(s, dir,
            gapUs = 3600000000L)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_total"),
            sum(col("kept").cast("long")).as("n_kept"),
            (count(lit(1)) - sum(col("kept").cast("long")))
              .as("n_dropped"))
          .orderBy(col("event_type")),
      oracle = Some(debounceOracle)),

    "q202_null_semantics" -> Q(
      // NULL-semantics battery — the engine-contract corners that differ
      // silently across engines: NULL as a grouping key (both engines
      // group it), count(*) vs count(col) vs count(DISTINCT col),
      // aggregate null-skipping, and the null-safe equality join
      // (Spark `<=>` ≡ DuckDB `IS NOT DISTINCT FROM`) vs plain `=`
      // against a dimension holding a NULL key. Nulls are DERIVED
      // deterministically (the fixtures ship none). Ordering is the
      // documented trap: Spark default sorts NULLS FIRST asc, DuckDB
      // NULLS LAST — the query pins asc_nulls_first/NULLS FIRST
      // explicitly, which any cross-engine catalog must do.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
          .withColumn("g", nullif(col("event_type"), lit("view")))
          .withColumn("v", when(col("value") >= 5.0, col("value")))
        val dim = s.createDataFrame(Seq(
            (Some("click"), "paid"), (Some("purchase"), "paid"),
            (Option.empty[String], "untyped")))
          .toDF("gk", "cls")
        val dimEq = dim.select(col("gk").as("g1"), col("cls").as("eq_cls"))
        val dimNs = dim.select(col("gk").as("g2"), col("cls").as("ns_cls"))
        ev.join(broadcast(dimEq), col("g") === col("g1"), "left")
          .join(broadcast(dimNs), col("g") <=> col("g2"), "left")
          .groupBy(col("g"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("v")).as("n_v"),
            countDistinct(col("v")).as("n_distinct_v"),
            msum(col("v")).as("sum_v"),
            count(col("eq_cls")).as("eq_matches"),
            count(col("ns_cls")).as("nullsafe_matches"))
          .orderBy(col("g").asc_nulls_first)
      },
      oracle = Some(s"""
        WITH ev AS (
          SELECT nullif(event_type, 'view') AS g,
            CASE WHEN value >= 5.0 THEN value END AS v
          FROM events),
        dim AS (
          SELECT * FROM (VALUES ('click', 'paid'), ('purchase', 'paid'),
            (NULL, 'untyped')) AS t(g, cls))
        SELECT ev.g, count(*) AS n_rows, count(v) AS n_v,
          count(DISTINCT v) AS n_distinct_v,
          ${sqlMsum("v")} AS sum_v,
          CAST(count(d1.cls) AS BIGINT) AS eq_matches,
          CAST(count(d2.cls) AS BIGINT) AS nullsafe_matches
        FROM ev
        LEFT JOIN dim d1 ON ev.g = d1.g
        LEFT JOIN dim d2 ON ev.g IS NOT DISTINCT FROM d2.g
        GROUP BY ev.g
        ORDER BY ev.g NULLS FIRST""")),

    "q203_unpivot_roundtrip" -> Q(
      // UNPIVOT (melt) — the wide→long inverse of q40's pivot, via
      // Spark's native Dataset.unpivot against DuckDB computing the
      // long form directly: pivot to a static (F, O, P) wide schema,
      // melt back to (pri, status, n), zero-fill the absent cells the
      // pivot materialized as NULL. Round-tripping through the wide
      // shape (rather than re-aggregating) is the point: it proves the
      // melt preserves exactly the pivot's cell grid.
      build = (s, dir) => {
        val wide = table(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("pri"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
        wide.unpivot(Array(col("pri")),
            Array(col("F"), col("O"), col("P")), "status", "n_raw")
          .select(col("pri"), col("status"),
            coalesce(col("n_raw"), lit(0L)).as("n"))
          .orderBy(col("pri"), col("status"))
      },
      oracle = Some("""
        WITH cells AS (
          SELECT pri, status, count(*) AS n FROM (
            SELECT o_orderpriority AS pri, o_orderstatus AS status
            FROM orders)
          GROUP BY 1, 2),
        grid AS (
          SELECT p.pri, s.status
          FROM (SELECT DISTINCT o_orderpriority AS pri FROM orders) p
          CROSS JOIN (SELECT unnest(['F', 'O', 'P']) AS status) s)
        SELECT g.pri, g.status,
          CAST(coalesce(c.n, 0) AS BIGINT) AS n
        FROM grid g
        -- IS NOT DISTINCT FROM: the pivot's row key groups NULLs equal
        -- (Spark groupBy semantics), so the grid re-join must be
        -- NULL-safe or a NULL-pri cell zero-fills spuriously (r9)
        LEFT JOIN cells c ON c.pri IS NOT DISTINCT FROM g.pri
          AND c.status = g.status
        ORDER BY g.pri, g.status""")),

    "q204_largest_remainder" -> Q(
      // Largest-remainder apportionment (Hamilton's method): allocate a
      // 10,000-unit budget across nations proportional to revenue so
      // the integer parts SUM EXACTLY to the total — floor the quotas,
      // hand the leftover units to the largest remainders (nation-name
      // tiebreak). The quota arithmetic runs entirely in exact integers
      // (revenue in cents, quota = B·rev div total), so the allocation
      // is bit-identical on any engine — the property that matters when
      // the allocation IS the deliverable (budget splits, seat counts,
      // sampling quotas). Bounded frame after the first aggregation.
      build = (s, dir) => {
        val budget = 10000L
        val rev = table(s, dir, "orders")
          .join(table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")).as("cents"))
        val tot = rev.agg(sum(col("cents")).as("tc"))
        val quota = rev.crossJoin(broadcast(tot))
          .withColumn("base", expr(s"($budget * cents) div tc"))
          .withColumn("rem", expr(s"$budget * cents - base * tc"))
        val used = quota.agg(sum(col("base")).as("ub"))
        val wr = Window.orderBy(col("rem").desc, col("n_name"))
        quota.crossJoin(broadcast(used))
          .withColumn("rk", row_number().over(wr))
          .withColumn("alloc",
            col("base") + when(col("rk") <= lit(budget) - col("ub"), 1L)
              .otherwise(0L))
          .select(col("n_name"), col("cents"), col("base"), col("alloc"))
          .orderBy(col("n_name"))
      },
      oracle = Some("""
        WITH rev AS (
          SELECT n_name,
            CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
              AS BIGINT)) AS BIGINT) AS cents
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1),
        tot AS (SELECT CAST(sum(cents) AS BIGINT) AS tc FROM rev),
        quota AS (
          SELECT n_name, cents,
            (10000 * cents) // tc AS base,
            10000 * cents - ((10000 * cents) // tc) * tc AS rem
          FROM rev CROSS JOIN tot),
        used AS (SELECT CAST(sum(base) AS BIGINT) AS ub FROM quota)
        SELECT n_name, cents, base,
          base + CASE WHEN row_number() OVER (
              ORDER BY rem DESC, n_name) <= 10000 - ub
            THEN 1 ELSE 0 END AS alloc
        FROM quota CROSS JOIN used
        ORDER BY n_name""")),

    "q205_trigram_search" -> Q(
      // Substring search through a character-trigram index — grep over
      // 100 TB without scanning every byte: docs reach the exact
      // `contains` verify only if their distinct-trigram set covers ALL
      // of the pattern's trigrams (the classic code-search/
      // decontamination index; candidates are found by one posting-list
      // semi-join against the bounded broadcast pattern set, and the
      // trigram filter is exact-complete — a true substring must
      // contribute every one of its trigrams). Occurrence counts via
      // length arithmetic on replace(), no regex in the hot path.
      build = (s, dir) => {
        val pattern = "slow query"
        val p3 = pattern.sliding(3).toSeq.distinct
        val docs = table(s, dir, "documents")
        val cands = docs
          .select(col("doc_id"), explode(array_distinct(expr(
            "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")))
            .as("tg"))
          .filter(col("tg").isin(p3: _*))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("tg")).as("ntg"))
          .filter(col("ntg") === p3.size)
        docs.join(cands, Seq("doc_id"), "left_semi")
          .filter(col("text").contains(pattern))
          .select(col("doc_id"),
            ((length(col("text"))
              - length(regexp_replace(col("text"), pattern, "")))
              / pattern.length).cast("long").as("n_hits"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        SELECT doc_id,
          CAST((len(text) - len(replace(text, 'slow query', '')))
            // len('slow query') AS BIGINT) AS n_hits
        FROM documents
        WHERE contains(text, 'slow query')
        ORDER BY doc_id""")),

    "q206_rolling_wau" -> Q(
      // Exact rolling 7-day active users per day — the WAU curve, with
      // the exact sliding distinct count no window function computes
      // directly: each (user, day) pair is exploded into the 7 report
      // days it supports (a ×7 map-side expansion), then ONE hash
      // aggregation per day — the scale shape; the oracle states the
      // same thing as a day-band join. Report days are the days present
      // in the data (both engines agree by construction).
      build = (s, dir) => {
        val ud = table(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val days = ud.select(col("day")).distinct()
        val wau = ud
          .withColumn("d", explode(expr(
            "sequence(day, date_add(day, 6))")))
          .join(days.withColumnRenamed("day", "d"), Seq("d"), "left_semi")
          .groupBy(col("d"))
          .agg(countDistinct(col("user_id")).as("wau7"))
        val dau = ud.groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("dau"))
        dau.join(wau, col("day") === col("d"))
          .select(col("day"), col("dau"), col("wau7"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        days AS (SELECT DISTINCT day FROM ud),
        wau AS (
          SELECT d.day, count(DISTINCT u.user_id) AS wau7
          FROM days d JOIN ud u
            ON u.day BETWEEN d.day - 6 AND d.day
          GROUP BY 1),
        dau AS (
          SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1)
        SELECT dau.day, dau.dau, wau.wau7
        FROM dau JOIN wau ON wau.day = dau.day
        ORDER BY dau.day""")),

    "q207_join_type_battery" -> Q(
      // Join-type semantics battery on frames with DUPLICATE keys and a
      // null-ish sentinel — the row-multiplication corners where engines
      // must agree and pipelines silently diverge: inner multiplies
      // (2 left × 2 right = 4), left/full preserve unmatched rows once,
      // semi/anti NEVER multiply (the existence-check contract). One
      // row per join type with its output cardinality and distinct-key
      // count, from the same two derived frames: orders' priority
      // classes joined to a dimension that duplicates one key and
      // misses others.
      build = (s, dir) => {
        val l = table(s, dir, "orders")
          .select(substring(col("o_orderpriority"), 1, 1).as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("ln"))
        val r = s.createDataFrame(Seq(
            ("1", "alpha"), ("1", "beta"), ("2", "gamma"), ("9", "omega")))
          .toDF("k", "tag")
        def row(name: String, df: DataFrame): DataFrame =
          df.agg(lit(name).as("join_type"),
            count(lit(1)).as("n_rows"),
            countDistinct(col("k")).as("n_keys"))
        row("1_inner", l.join(r, Seq("k")))
          .unionByName(row("2_left", l.join(r, Seq("k"), "left")))
          .unionByName(row("3_full", l.join(r, Seq("k"), "full")))
          .unionByName(row("4_semi", l.join(r, Seq("k"), "left_semi")))
          .unionByName(row("5_anti", l.join(r, Seq("k"), "left_anti")))
          .orderBy(col("join_type"))
      },
      oracle = Some("""
        WITH l AS (
          SELECT substring(o_orderpriority, 1, 1) AS k, count(*) AS ln
          FROM orders GROUP BY 1),
        r AS (
          SELECT * FROM (VALUES ('1', 'alpha'), ('1', 'beta'),
            ('2', 'gamma'), ('9', 'omega')) AS t(k, tag))
        SELECT '1_inner' AS join_type, count(*) AS n_rows,
          count(DISTINCT l.k) AS n_keys FROM l JOIN r USING (k)
        UNION ALL
        SELECT '2_left', count(*), count(DISTINCT l.k)
        FROM l LEFT JOIN r USING (k)
        UNION ALL
        SELECT '3_full', count(*), count(DISTINCT coalesce(l.k, r.k))
        FROM l FULL JOIN r USING (k)
        UNION ALL
        SELECT '4_semi', count(*), count(DISTINCT k) FROM l
        WHERE EXISTS (SELECT 1 FROM r WHERE r.k = l.k)
        UNION ALL
        SELECT '5_anti', count(*), count(DISTINCT k) FROM l
        WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.k = l.k)
        ORDER BY join_type""")),

    "q208_map_type_battery" -> Q(
      // MapType surface: per-user event-type→count maps built with
      // map_from_entries over a DETERMINISTICALLY ORDERED entry list
      // (sort_array first — collect order is partitioning-dependent,
      // map iteration order follows insertion), then read back via
      // element_at (missing key → NULL), map_keys cardinality, and an
      // exploded flatten that must equal the pre-map long form. The
      // oracle states the long form directly — the round-trip through
      // the map is the Spark-side property under test.
      build = (s, dir) => {
        // event_type IS NOT NULL: Spark forbids NULL map keys
        // (NULL_MAP_KEY) — the battery maps TYPED activity; the oracle
        // carries the same predicate
        val counts = table(s, dir, "events")
          .filter(col("event_type").isNotNull)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val maps = counts.groupBy(col("user_id"))
          .agg(map_from_entries(sort_array(collect_list(
            struct(col("event_type"), col("n"))))).as("m"))
        maps.select(col("user_id"),
            size(map_keys(col("m"))).cast("long").as("n_types"),
            coalesce(element_at(col("m"), "purchase"), lit(0L))
              .as("n_purchase"),
            coalesce(element_at(col("m"), "refund"), lit(0L))
              .as("n_refund"),
            aggregate(map_values(col("m")), lit(0L), (acc, x) => acc + x)
              .as("n_total"))
          .orderBy(col("user_id"))
      },
      oracle = Some("""
        SELECT user_id,
          count(DISTINCT event_type) AS n_types,
          CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
            THEN 1 END), 0) AS BIGINT) AS n_purchase,
          CAST(coalesce(sum(CASE WHEN event_type = 'refund'
            THEN 1 END), 0) AS BIGINT) AS n_refund,
          count(*) AS n_total
        FROM events
        WHERE event_type IS NOT NULL
        GROUP BY user_id
        ORDER BY user_id""")),

    "q209_wilson_intervals" -> Q(
      // Wilson score 95% intervals on weekly purchase rates — the
      // binomial CI that behaves at small n and extreme p̂ (unlike the
      // Wald interval every dashboard misuses): per ISO-week, the share
      // of active users who purchased, with
      // (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n) at z=1.96
      // written as the IDENTICAL literal formula on both engines —
      // integer n/k in, deterministic double arithmetic out, snapped
      // once at 8 decimals. Two bounded aggregations, no shuffle wider
      // than (week, user).
      build = (s, dir) => {
        val wk = table(s, dir, "events")
          .select(weekofyear(col("ts")).cast("long").as("wk"),
            col("user_id"), col("event_type"))
        val per = wk.groupBy(col("wk")).agg(
          countDistinct(col("user_id")).as("n"),
          countDistinct(when(col("event_type") === "purchase",
            col("user_id"))).as("k"))
        per
          .withColumn("p", col("k").cast("double") / col("n"))
          .withColumn("lo", round(
            (col("p") + lit(3.8416) / (col("n") * 2)
              - lit(1.96) * sqrt(col("p") * (lit(1.0) - col("p")) / col("n")
                + lit(3.8416) / (col("n") * col("n") * 4)))
              / (lit(1.0) + lit(3.8416) / col("n")), 8))
          .withColumn("hi", round(
            (col("p") + lit(3.8416) / (col("n") * 2)
              + lit(1.96) * sqrt(col("p") * (lit(1.0) - col("p")) / col("n")
                + lit(3.8416) / (col("n") * col("n") * 4)))
              / (lit(1.0) + lit(3.8416) / col("n")), 8))
          .select(col("wk"), col("n"), col("k"),
            round(col("p"), 8).as("p"), col("lo"), col("hi"))
          .orderBy(col("wk"))
      },
      oracle = Some("""
        WITH per AS (
          SELECT CAST(weekofyear(ts) AS BIGINT) AS wk,
            count(DISTINCT user_id) AS n,
            count(DISTINCT CASE WHEN event_type = 'purchase'
              THEN user_id END) AS k
          FROM events GROUP BY 1),
        p0 AS (SELECT wk, n, k, CAST(k AS DOUBLE) / n AS p FROM per)
        SELECT wk, n, k, round(p, 8) AS p,
          round((p + 3.8416 / (n * 2)
            - 1.96 * sqrt(p * (1.0 - p) / n + 3.8416 / (n * n * 4)))
            / (1.0 + 3.8416 / n), 8) AS lo,
          round((p + 3.8416 / (n * 2)
            + 1.96 * sqrt(p * (1.0 - p) / n + 3.8416 / (n * n * 4)))
            / (1.0 + 3.8416 / n), 8) AS hi
        FROM p0
        ORDER BY wk""")),

    "q210_rank_movers" -> Q(
      // Month-over-month revenue-rank movement of nations — trending
      // detection on ORDINAL position, not raw deltas (q41 does the
      // money delta; rank movement is what a "top movers" panel shows
      // because it is scale-free). Rank within month over the bounded
      // 25-nation frame, movement via lag over each nation's month
      // series — both windows bounded by dimensions, never by fact
      // rows. Emits the months where any nation moved ≥ 8 places.
      build = (s, dir) => {
        val rev = table(s, dir, "orders")
          .join(table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy((year(col("o_orderdate")) * 100
              + month(col("o_orderdate"))).as("ym"),
            col("n_name"))
          .agg(msum(col("o_totalprice")).as("rev"))
        val wRank = Window.partitionBy(col("ym"))
          .orderBy(col("rev").desc, col("n_name"))
        val wLag = Window.partitionBy(col("n_name")).orderBy(col("ym"))
        rev.withColumn("rk", row_number().over(wRank))
          .withColumn("delta", lag(col("rk"), 1).over(wLag) - col("rk"))
          .filter(abs(col("delta")) >= 8)
          .select(col("ym").cast("long").as("ym"), col("n_name"),
            col("rk").cast("long").as("rk"),
            col("delta").cast("long").as("delta"))
          .orderBy(col("ym"), col("n_name"))
      },
      oracle = Some(s"""
        WITH rev AS (
          SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
              AS BIGINT) AS ym,
            n_name, ${sqlMsum("o_totalprice")} AS rev
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        rk AS (
          SELECT ym, n_name,
            CAST(row_number() OVER (PARTITION BY ym
              ORDER BY rev DESC, n_name) AS BIGINT) AS rk
          FROM rev),
        mv AS (
          SELECT ym, n_name, rk,
            lag(rk, 1) OVER (PARTITION BY n_name ORDER BY ym) - rk
              AS delta
          FROM rk)
        SELECT ym, n_name, rk, CAST(delta AS BIGINT) AS delta
        FROM mv WHERE abs(delta) >= 8
        ORDER BY ym, n_name""")),

    "q211_group_split_leakage" -> Q(
      // Row-level vs group-level split leakage — why GroupKFold exists:
      // carving train/val by ROW hash (event_id) puts almost every
      // user's history on both sides (a model memorizing user identity
      // scores inflated); carving by GROUP hash (user_id) makes
      // straddling structurally zero. One query, both methods, same
      // 10% carve: per method, users present in both splits. The
      // group-split zero is not a fixture accident — it is the
      // operator's guarantee, shown next to the row-split's ~100%.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        def straddle(df: DataFrame, name: String): DataFrame = df
          .groupBy(col("user_id"))
          .agg(countDistinct(col("split")).as("nsp"))
          .agg(lit(name).as("method"),
            count(lit(1)).as("n_users"),
            sum((col("nsp") === 2).cast("long")).as("n_straddling"))
        straddle(Sampling.hashSplit(ev, "event_id", valBuckets = 10),
            "1_row_hash")
          .unionByName(straddle(
            Sampling.hashSplit(ev, "user_id", valBuckets = 10),
            "2_group_hash"))
          .withColumn("pct_straddling",
            round(col("n_straddling").cast("double") / col("n_users"), 8))
          .orderBy(col("method"))
      },
      oracle = Some(s"""
        WITH row_split AS (
          SELECT user_id,
            CASE WHEN ${Sampling.sqlHashBucket("event_id", 100)} < 10
              THEN 'val' ELSE 'train' END AS split
          FROM events),
        grp_split AS (
          SELECT user_id,
            CASE WHEN ${Sampling.sqlHashBucket("user_id", 100)} < 10
              THEN 'val' ELSE 'train' END AS split
          FROM events),
        r AS (
          SELECT count(*) AS n_users,
            CAST(sum(CASE WHEN nsp = 2 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_straddling
          FROM (SELECT user_id, count(DISTINCT split) AS nsp
                FROM row_split GROUP BY 1)),
        g AS (
          SELECT count(*) AS n_users,
            CAST(sum(CASE WHEN nsp = 2 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_straddling
          FROM (SELECT user_id, count(DISTINCT split) AS nsp
                FROM grp_split GROUP BY 1))
        SELECT '1_row_hash' AS method, n_users, n_straddling,
          round(CAST(n_straddling AS DOUBLE) / n_users, 8)
            AS pct_straddling
        FROM r
        UNION ALL
        SELECT '2_group_hash', n_users, n_straddling,
          round(CAST(n_straddling AS DOUBLE) / n_users, 8)
        FROM g
        ORDER BY method""")),

    "q212_seasonal_naive_mase" -> Q(
      // Forecast-evaluation floor: seasonal-naive (ŷ_d = y_{d−7})
      // daily event counts on the last-10-day holdout, scored by MASE
      // (Hyndman-Koehler '06) — |error| scaled by the TRAINING naive-1
      // MAE, the unit-free metric that makes "is this model better
      // than copying last week" answerable per series. Every forecast
      // model shipped against this engine must beat MASE ≈ 1 here.
      // Counts are exact integers; the two MAEs are integer-sum /
      // count divisions, snapped once.
      build = (s, dir) => {
        val daily = table(s, dir, "events")
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("y"))
        val bounds = daily.agg(max(col("d")).as("dmax"))
        val marked = daily.crossJoin(broadcast(bounds))
          .withColumn("is_test", datediff(col("dmax"), col("d")) < 10)
        val lagged = marked.alias("t")
          .join(daily.select(col("d").as("d7"), col("y").as("y7")),
            expr("d7 = date_sub(d, 7)"))
          .join(daily.select(col("d").as("d1"), col("y").as("y1")),
            expr("d1 = date_sub(d, 1)"))
        val test = lagged.filter(col("is_test"))
          .agg(count(lit(1)).as("n_test"),
            sum(abs(col("y") - col("y7"))).as("ae_seasonal"))
        val train = lagged.filter(!col("is_test"))
          .agg(count(lit(1)).as("n_train"),
            sum(abs(col("y") - col("y1"))).as("ae_naive1"))
        test.crossJoin(broadcast(train))
          .select(col("n_train"), col("n_test"),
            round(col("ae_seasonal").cast("double") / col("n_test"), 8)
              .as("mae_seasonal"),
            round(col("ae_naive1").cast("double") / col("n_train"), 8)
              .as("mae_naive1_train"),
            round((col("ae_seasonal").cast("double") / col("n_test"))
              / (col("ae_naive1").cast("double") / col("n_train")), 8)
              .as("mase"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS d, count(*) AS y
          FROM events GROUP BY 1),
        bounds AS (SELECT max(d) AS dmax FROM daily),
        lagged AS (
          SELECT t.d, t.y, p7.y AS y7, p1.y AS y1,
            date_diff('day', t.d, b.dmax) < 10 AS is_test
          FROM daily t
          CROSS JOIN bounds b
          JOIN daily p7 ON p7.d = t.d - 7
          JOIN daily p1 ON p1.d = t.d - 1),
        test AS (
          SELECT count(*) AS n_test,
            CAST(sum(abs(y - y7)) AS BIGINT) AS ae_seasonal
          FROM lagged WHERE is_test),
        train AS (
          SELECT count(*) AS n_train,
            CAST(sum(abs(y - y1)) AS BIGINT) AS ae_naive1
          FROM lagged WHERE NOT is_test)
        SELECT n_train, n_test,
          round(CAST(ae_seasonal AS DOUBLE) / n_test, 8) AS mae_seasonal,
          round(CAST(ae_naive1 AS DOUBLE) / n_train, 8)
            AS mae_naive1_train,
          round((CAST(ae_seasonal AS DOUBLE) / n_test)
            / (CAST(ae_naive1 AS DOUBLE) / n_train), 8) AS mase
        FROM test CROSS JOIN train""")),

    "q213_anova_f" -> Q(
      // One-way ANOVA: does mean order value differ across the five
      // order priorities? The k-sample generalization of q112's Welch
      // pair test — SS decomposition from per-level exact-decimal
      // moments in ONE hash aggregation, each level's float terms
      // snapped to DECIMAL(28,4) before the bounded k-row reduction so
      // F is combine-order-independent. eta_sq reports the effect size
      // the F statistic alone hides.
      build = (s, dir) =>
        Hypothesis.anovaOneWay(table(s, dir, "orders"),
          "o_orderpriority", "o_totalprice"),
      oracle = Some(s"""
        WITH ${Hypothesis.sqlAnovaCtes("orders", "o_orderpriority",
          "o_totalprice")}
        SELECT k_groups, n_total, ss_between, ss_within, f_stat, eta_sq
        FROM anova""")),

    "q214_mann_whitney" -> Q(
      // Mann-Whitney U on l_quantity between returned (R) and kept
      // lines — the distribution-free two-sample test for a metric
      // with ~50 distinct integer values, where midrank tie handling
      // IS the statistic: ranks come from cumulative counts over the
      // bounded distinct-value frame (PrefixSum, never a row-level
      // global window), doubled so 2·U and the Σ(t³−t) tie correction
      // stay exact integers into the final z expression.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .withColumn("is_ret", col("l_returnflag") === "R")
        Hypothesis.mannWhitney(li, "l_quantity", "is_ret")
      },
      oracle = Some(s"""
        WITH ${Hypothesis.sqlMannWhitneyCtes("lineitem", "l_quantity",
          "l_returnflag = 'R'")}
        SELECT n_a, n_b, u_stat, z_stat, r_rank_biserial FROM mw""")),

    "q215_ks_test" -> Q(
      // Two-sample Kolmogorov-Smirnov on order value, urgent vs
      // non-urgent priorities — the drift test that sees SHAPE changes
      // a mean test misses. Both empirical CDFs are cumulative counts
      // over the distinct-value frame (PrefixSum two-pass, parallel
      // across value-range buckets); the maximized gap is the exact
      // integer |ca·n_b − cb·n_a|, divided exactly once, so D is
      // bit-identical at any partitioning.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
          .withColumn("is_urgent", col("o_orderpriority") === "1-URGENT")
        Hypothesis.ksTwoSample(o, "o_totalprice", "is_urgent")
      },
      oracle = Some(s"""
        WITH ${Hypothesis.sqlKsCtes("orders", "o_totalprice",
          "o_orderpriority = '1-URGENT'")}
        SELECT n_a, n_b, d_stat, ks_stat FROM ks""")),

    "q216_interval_union" -> Q(
      // Covered-time-per-key with overlap merging — the operator where
      // naive SUM(duration) double-counts: per supplier, bulk shipments
      // (qty ≥ 48) each open a half-open activity window
      // [ship_day, ship_day + qty); gaps-and-islands (keyed running
      // max, NEVER a global window) merges the overlaps, then exact
      // integer island extents sum to covered days. n_islands vs
      // n_intervals is the overlap audit.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .filter(col("l_quantity") >= 48)
          .select(col("l_suppkey"),
            unix_date(to_date(col("l_shipdate"))).as("sd"),
            (unix_date(to_date(col("l_shipdate")))
              + col("l_quantity").cast("long")).as("ed"),
            (col("l_orderkey") * 10 + col("l_linenumber")).as("tie"))
        Intervals.unionLength(li, "l_suppkey", "sd", "ed", "tie")
          .withColumnRenamed("l_suppkey", "suppkey")
          .orderBy(col("suppkey"))
      },
      oracle = Some(s"""
        WITH iv_src AS (
          SELECT l_suppkey AS k,
            date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
              AS s,
            date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
              + CAST(l_quantity AS BIGINT) AS e,
            l_orderkey * 10 + l_linenumber AS tie
          FROM lineitem WHERE l_quantity >= 48),
        ${Intervals.sqlUnionLengthCtes("iv_src")}
        SELECT k AS suppkey, n_intervals, n_islands, covered
        FROM iv_u ORDER BY suppkey""")),

    "q217_calendarization" -> Q(
      // Revenue recognition: each bulk line's value is spread over the
      // months its [ship_day, ship_day + qty − 1] service window
      // touches, proportional to day overlap — the finance operator
      // where booking everything into the start month misstates every
      // monthly P&L. Slice weights are the only floats; each is snapped
      // to a ×10⁶ integer (floor(x·1e6+0.5), IEEE-identical in both
      // engines) so monthly sums are exact at any partitioning.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .filter(col("l_quantity") >= 48)
          .select(to_date(col("l_shipdate")).as("sd"),
            date_add(to_date(col("l_shipdate")),
              col("l_quantity").cast("int") - 1).as("ed"),
            col("l_extendedprice").as("v"))
        Intervals.calendarize(li, "sd", "ed", "v")
          .orderBy(col("month"))
      },
      oracle = Some(s"""
        WITH cal_src AS (
          SELECT CAST(l_shipdate AS DATE) AS s,
            CAST(l_shipdate AS DATE)
              + CAST(CAST(l_quantity AS INTEGER) - 1 AS INTEGER) AS e,
            l_extendedprice AS v
          FROM lineitem WHERE l_quantity >= 48),
        ${Intervals.sqlCalendarizeCtes("cal_src")}
        SELECT month, n_slices, allocated FROM cal_m ORDER BY month""")),

    "q218_mutual_information" -> Q(
      // Mutual information (plus both entropies and normalized MI)
      // between order status and priority — the feature-selection
      // companion to q111's chi-square: dependence STRENGTH in nats,
      // comparable across tables. One bounded cell aggregation; each
      // cell's p·ln(pn/(pa·pb)) snapped at 8 decimals then exact-summed
      // (q92's PMI convention).
      build = (s, dir) =>
        Contingency.mutualInformation(table(s, dir, "orders"),
          "o_orderstatus", "o_orderpriority"),
      oracle = Some(Contingency.sqlMutualInformation("orders",
        "o_orderstatus", "o_orderpriority"))),

    "q219_correlation_matrix" -> Q(
      // Pairwise Pearson matrix over the four lineitem measures in ONE
      // scan: all 14 exact-decimal moments (4 sums, 4 squares, 6 cross
      // products) accumulate in a single hash agg; the one-row moment
      // frame then explodes into 6 pair rows. The EDA collinearity
      // panel — at 100 TB reading the data once instead of once per
      // pair is the whole game.
      build = (s, dir) =>
        Trend.correlationMatrix(table(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
          .orderBy(col("col_a"), col("col_b")),
      oracle = Some(s"""
        WITH ${Trend.sqlCorrMatrixCtes("lineitem",
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))}
        SELECT col_a, col_b, n, r FROM cm ORDER BY col_a, col_b""")),

    "q220_target_encode_smoothed" -> Q(
      // Bayesian-smoothed target encoding of part brand by line
      // revenue: enc = (Σy + m·ȳ_global)/(n + m) with m = 1000 — the
      // high-cardinality categorical encoder that shrinks thin levels
      // toward the prior instead of memorizing them (the leakage-prone
      // raw mean is printed beside it; the delta IS the shrinkage).
      // Revenue aggregates exactly per brand (msum); the global mean
      // enters each level's fixed-shape double expression once.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
        val pt = table(s, dir, "part").select(col("p_partkey"), col("p_brand"))
        val perBrand = li.join(broadcast(pt),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"),
            sum(revenue(col("l_extendedprice"), col("l_discount")))
              .cast("decimal(24,4)").as("sy"))
        val global = perBrand.agg(sum(col("n")).as("ng"),
          sum(col("sy")).cast("decimal(30,4)").as("syg"))
        val gmean = col("syg").cast("double") / col("ng").cast("double")
        val m = lit(1000.0)
        perBrand.crossJoin(broadcast(global))
          .select(col("p_brand"), col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 6)
              .as("raw_mean"),
            round((col("sy").cast("double") + m * gmean)
              / (col("n").cast("double") + m), 6).as("smoothed_mean"))
          .orderBy(col("p_brand"))
      },
      oracle = Some(s"""
        WITH pb AS (
          SELECT p_brand, count(*) AS n,
            CAST(sum(${sqlRevenue("l_extendedprice", "l_discount")})
              AS DECIMAL(24,4)) AS sy
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1),
        gl AS (
          SELECT CAST(sum(n) AS BIGINT) AS ng,
            CAST(sum(sy) AS DECIMAL(30,4)) AS syg
          FROM pb)
        SELECT p_brand, n,
          round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_mean,
          round((CAST(sy AS DOUBLE)
              + 1000.0 * (CAST(syg AS DOUBLE) / CAST(ng AS DOUBLE)))
            / (CAST(n AS DOUBLE) + 1000.0), 6) AS smoothed_mean
        FROM pb CROSS JOIN gl
        ORDER BY p_brand""")),

    "q221_hits" -> Q(
      // Integer-exact HITS (3 rounds) over the bipartite
      // customer→supplier purchase graph (support ≥ 2): authoritative
      // suppliers and the hub buyers whose edges confer that
      // authority. Scores are ×10⁵ integers with floor-division
      // renormalization each half-step, so the mutually-recursive
      // iteration is oracle-checked EXACTLY against an unrolled
      // materialized CTE chain. Supplier nodes are offset by 10⁶ —
      // custkey and suppkey share an id space, and an unprefixed union
      // would alias buyer 5 with seller 5.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
        val o = table(s, dir, "orders")
        val edges = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("src"),
            (col("l_suppkey") + 1000000L).as("dst"))
          .agg(count(lit(1)).as("c"))
          .filter(col("c") >= 2)
          .select(col("src"), col("dst"))
        val r = Hits.ranks(edges, iters = 3)
        val auth = r.filter(col("node") >= 1000000L)
          .select(lit("authority").as("role"),
            (col("node") - 1000000L).as("key"), col("authority").as("score"))
        val hubs = r.filter(col("node") < 1000000L)
          .select(lit("hub").as("role"), col("node").as("key"),
            col("hub").as("score"))
          .orderBy(col("score").desc, col("key")).limit(50)
        auth.unionByName(hubs)
          .orderBy(col("role"), col("score").desc, col("key"))
      },
      oracle = Some(s"""
        WITH hits_edges AS (
          SELECT src, dst FROM (
            SELECT o_custkey AS src, l_suppkey + 1000000 AS dst,
              count(*) AS c
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1, 2)
          WHERE c >= 2),
        ${Hits.sqlRanksCtes(iters = 3)},
        auth AS (
          SELECT 'authority' AS role, node - 1000000 AS key,
            authority AS score
          FROM hits_final WHERE node >= 1000000),
        hubs AS (
          SELECT 'hub' AS role, node AS key, hub AS score
          FROM hits_final WHERE node < 1000000
          ORDER BY score DESC, key LIMIT 50)
        SELECT role, key, score FROM (
          SELECT * FROM auth UNION ALL SELECT * FROM hubs)
        ORDER BY role, score DESC, key""")),

    "q222_bigram_surprisal" -> Q(
      // Per-language mean bigram surprisal under an add-one-smoothed
      // corpus bigram model, −ln (c₁₂+1)/(c₁+V) — the language-model
      // quality signal one step up from q66's unigram surprisal:
      // formulaic text scores low, incoherent token salad high, and a
      // language whose bigrams the corpus hasn't seen floats to the
      // top of the pretraining-filter queue. Counts are exact; each
      // bigram term is snapped at 8 decimals into an exact-decimal
      // mean (davg convention).
      build = (s, dir) => {
        val toks = table(s, dir, "documents")
          .select(col("lang"), split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+").as("tk"))
        val bi = toks.filter(size(col("tk")) >= 2)
          .select(col("lang"), explode(expr(
            "transform(sequence(0, size(tk) - 2)," +
              " i -> struct(tk[i] AS w1, tk[i+1] AS w2))")).as("b"))
          .select(col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val c12 = bi.groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("c12"))
        val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        val v = toks.select(explode(col("tk")).as("w"))
          .agg(countDistinct(col("w")).as("vsz"))
        val term = -log((col("c12") + 1).cast("double")
          / (col("c1") + col("vsz")).cast("double"))
        bi.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
          .crossJoin(broadcast(v))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_bigrams"),
            (round(sum(round(term, 8).cast("decimal(14,8)")), 6)
              .cast("double") / count(lit(1))).as("mean_surprisal"))
          .orderBy(col("lang"))
      },
      oracle = Some("""
        WITH tk AS (
          SELECT lang, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS t
          FROM documents),
        bi AS (
          SELECT lang, t[i] AS w1, t[i + 1] AS w2
          FROM (SELECT lang, t, unnest(generate_series(1, len(t) - 1)) AS i
                FROM tk WHERE len(t) >= 2)),
        c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
        c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
        v AS (
          SELECT count(DISTINCT w) AS vsz
          FROM (SELECT unnest(t) AS w FROM tk))
        SELECT lang, count(*) AS n_bigrams,
          CAST(round(sum(CAST(round(
            -ln(CAST(c12.c12 + 1 AS DOUBLE)
                / CAST(c1.c1 + v.vsz AS DOUBLE)), 8)
            AS DECIMAL(14,8))), 6) AS DOUBLE) / count(*) AS mean_surprisal
        FROM bi
        JOIN c12 USING (w1, w2)
        JOIN c1 USING (w1)
        CROSS JOIN v
        GROUP BY lang
        ORDER BY lang""")),

    "q223_blocking_linkage" -> Q(
      // Record-linkage blocking audit on part names: block by consonant
      // skeleton (lowercase, vowels and spaces stripped), generate
      // candidate pairs only WITHIN blocks, verify with edit distance
      // ≤ 1 — the O(n²)→O(Σb²) pattern that makes fuzzy matching
      // feasible at all at 10⁹ records. The one-row audit reports what
      // the blocker bought (reduction ratio vs the full cross product)
      // and what the verifier kept.
      build = (s, dir) => {
        val p = table(s, dir, "part")
          .select(col("p_partkey").as("k"), col("p_name").as("nm"))
          .withColumn("blk", regexp_replace(lower(col("nm")), "[aeiou ]", ""))
        val blocks = p.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
        val stats = blocks.agg(
          sum(col("bn")).as("n_records"),
          count(lit(1)).as("n_blocks"),
          max(col("bn")).as("max_block"),
          sum(expr("bn * (bn - 1) div 2")).as("cand_pairs"))
        val verified = p.as("x").join(p.as("y"),
            col("x.blk") === col("y.blk") && col("x.k") < col("y.k"))
          .agg(coalesce(sum((levenshtein(col("x.nm"), col("y.nm")) <= 1)
            .cast("long")), lit(0L)).as("n_matches"))
        stats.crossJoin(broadcast(verified))
          .select(col("n_records"), col("n_blocks"), col("max_block"),
            col("cand_pairs"), col("n_matches"),
            expr("n_records * (n_records - 1) div 2").as("full_pairs"),
            round(lit(1.0) - col("cand_pairs").cast("double")
              / expr("n_records * (n_records - 1) div 2").cast("double"), 8)
              .as("reduction_ratio"))
      },
      oracle = Some("""
        WITH p AS (
          SELECT p_partkey AS k, p_name AS nm,
            regexp_replace(lower(p_name), '[aeiou ]', '', 'g') AS blk
          FROM part),
        blocks AS (SELECT blk, count(*) AS bn FROM p GROUP BY 1),
        stats AS (
          SELECT CAST(sum(bn) AS BIGINT) AS n_records,
            count(*) AS n_blocks, max(bn) AS max_block,
            CAST(sum(bn * (bn - 1) // 2) AS BIGINT) AS cand_pairs
          FROM blocks),
        verified AS (
          SELECT coalesce(CAST(sum(CASE WHEN
              levenshtein(x.nm, y.nm) <= 1 THEN 1 ELSE 0 END) AS BIGINT),
            0) AS n_matches
          FROM p x JOIN p y ON x.blk = y.blk AND x.k < y.k)
        SELECT n_records, n_blocks, max_block, cand_pairs, n_matches,
          n_records * (n_records - 1) // 2 AS full_pairs,
          round(1.0 - CAST(cand_pairs AS DOUBLE)
            / CAST(n_records * (n_records - 1) // 2 AS DOUBLE), 8)
            AS reduction_ratio
        FROM stats CROSS JOIN verified""")),

    "q224_holt_linear" -> Q(
      // Holt double exponential smoothing (α=0.3, β=0.2) of the daily
      // order-count series per priority — level + trend + 7-step-ahead
      // forecast, the model that beats q138's bare EMA whenever the
      // series drifts. The sequential recursion folds inside each
      // series (collect → sort → aggregate HOF, state bounded by the
      // calendar); the DuckDB oracle walks the identical observation
      // sequence with a recursive CTE — same expression shapes, same
      // IEEE doubles, exact hash match on an iterated float algorithm.
      build = (s, dir) => {
        // identified-series contract (r9): a time series needs a non-NULL
        // key — same rule as the entity-keyed stream operators (a NULL
        // key also silently vanishes from the oracle's recursive walk,
        // whose g = g join is not NULL-safe)
        val daily = table(s, dir, "orders")
          .filter(col("o_orderpriority").isNotNull)
          .groupBy(col("o_orderpriority").as("prio"),
            to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("y"))
          .withColumn("dayn", unix_date(col("day")))
        Trend.holtLinear(daily, Seq("prio"), "dayn", "y",
            alpha = 0.3, beta = 0.2, horizon = 7)
          .orderBy(col("prio"))
      },
      oracle = Some(s"""
        WITH RECURSIVE holt_src AS (
          SELECT o_orderpriority AS g,
            date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS o,
            count(*) AS y
          FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1, 2),
        ${Trend.sqlHoltCtes("holt_src", alpha = 0.3, beta = 0.2,
          horizon = 7)}
        SELECT g AS prio, n_obs, level, trend, forecast_7
        FROM holt_g ORDER BY prio""")),

    "q225_logrank" -> Q(
      // Logrank test between two HASH-RANDOMIZED user arms on
      // time-to-first-big-purchase — the A/A guardrail of survival
      // experimentation: under a null split, O−E should hover near 0
      // and |z| should not reject. Same censoring discipline as q200's
      // Kaplan-Meier (non-converters censored at observation end);
      // per-time hypergeometric E and V terms are snapped at 8
      // decimals into exact-decimal sums over the bounded
      // distinct-duration frame.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        val users = ev.groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("d0"))
        val arms = Sampling.hashSplit(users, "user_id", valBuckets = 50)
          .withColumn("in_a", col("split") === "val") // 50/50 carve
        val tp = ev.filter(col("event_type") === "purchase"
            && col("value") >= 150)
          .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("dp"))
        val end = ev.agg(max(to_date(col("ts"))).as("dend"))
        val durs = arms.join(tp, Seq("user_id"), "left")
          .crossJoin(broadcast(end))
          .select(
            when(col("dp").isNotNull, datediff(col("dp"), col("d0")))
              .otherwise(datediff(col("dend"), col("d0")))
              .cast("long").as("dur"),
            col("dp").isNotNull.cast("long").as("ev"),
            col("in_a"))
        val dayAgg = durs.groupBy(col("dur"))
          .agg(sum(col("ev")).as("d"),
            sum(when(col("in_a"), col("ev")).otherwise(0L)).as("d_a"),
            count(lit(1)).as("cnt"),
            sum(col("in_a").cast("long")).as("cnt_a"))
        val tot = durs.agg(count(lit(1)).as("ntot"),
          sum(col("in_a").cast("long")).as("ntot_a"))
        val wPrev = Window.orderBy(col("dur"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val risk = dayAgg.crossJoin(broadcast(tot))
          .withColumn("n_r",
            col("ntot") - coalesce(sum(col("cnt")).over(wPrev), lit(0L)))
          .withColumn("n_ra",
            col("ntot_a") - coalesce(sum(col("cnt_a")).over(wPrev), lit(0L)))
          .filter(col("d") > 0)
        val pA = col("n_ra").cast("double") / col("n_r").cast("double")
        val eTerm = round(col("d").cast("double") * pA, 8)
        val vTerm = when(col("n_r") > 1, round(
          col("d").cast("double") * pA * (lit(1.0) - pA)
            * (col("n_r") - col("d")).cast("double")
            / (col("n_r") - 1).cast("double"), 8)).otherwise(lit(0.0))
        val agg = risk.agg(
          max(col("ntot_a")).as("n_a"),
          (max(col("ntot")) - max(col("ntot_a"))).as("n_b"),
          sum(col("d_a")).as("events_a"),
          (sum(col("d")) - sum(col("d_a"))).as("events_b"),
          sum(eTerm.cast("decimal(20,8)")).as("e_a"),
          sum(vTerm.cast("decimal(20,8)")).as("v"))
        agg.select(col("n_a"), col("n_b"), col("events_a"), col("events_b"),
          round(col("events_a").cast("double") - col("e_a").cast("double"), 6)
            .as("o_minus_e"),
          round(col("v").cast("double"), 6).as("var_sum"),
          when(col("v") > 0, round(
            (col("events_a").cast("double") - col("e_a").cast("double"))
              / sqrt(col("v").cast("double")), 6)).as("z_stat"))
      },
      oracle = Some(s"""
        WITH users AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS d0
          FROM events GROUP BY 1),
        arms AS (
          SELECT user_id, d0,
            ${Sampling.sqlHashBucket("user_id", 100)} < 50 AS in_a
          FROM users),
        tp AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS dp
          FROM events WHERE event_type = 'purchase' AND value >= 150
          GROUP BY 1),
        endd AS (SELECT max(CAST(ts AS DATE)) AS dend FROM events),
        durs AS (
          SELECT CAST(CASE WHEN tp.dp IS NOT NULL
              THEN date_diff('day', a.d0, tp.dp)
              ELSE date_diff('day', a.d0, endd.dend) END AS BIGINT) AS dur,
            CAST(CASE WHEN tp.dp IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
              AS ev,
            a.in_a
          FROM arms a LEFT JOIN tp ON tp.user_id = a.user_id
          CROSS JOIN endd),
        day_agg AS (
          SELECT dur, CAST(sum(ev) AS BIGINT) AS d,
            CAST(sum(CASE WHEN in_a THEN ev ELSE 0 END) AS BIGINT) AS d_a,
            count(*) AS cnt,
            CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a
          FROM durs GROUP BY 1),
        tot AS (
          SELECT count(*) AS ntot,
            CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS ntot_a
          FROM durs),
        risk AS (
          SELECT dur, d, d_a, ntot, ntot_a,
            ntot - coalesce(sum(cnt) OVER (ORDER BY dur
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_r,
            ntot_a - coalesce(sum(cnt_a) OVER (ORDER BY dur
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_ra
          FROM day_agg CROSS JOIN tot),
        terms AS (
          SELECT *,
            round(CAST(d AS DOUBLE)
              * (CAST(n_ra AS DOUBLE) / CAST(n_r AS DOUBLE)), 8) AS e_t,
            CASE WHEN n_r > 1 THEN round(CAST(d AS DOUBLE)
              * (CAST(n_ra AS DOUBLE) / CAST(n_r AS DOUBLE))
              * (1.0 - CAST(n_ra AS DOUBLE) / CAST(n_r AS DOUBLE))
              * CAST(n_r - d AS DOUBLE) / CAST(n_r - 1 AS DOUBLE), 8)
              ELSE 0.0 END AS v_t
          FROM risk WHERE d > 0),
        agg AS (
          SELECT max(ntot_a) AS n_a, max(ntot) - max(ntot_a) AS n_b,
            CAST(sum(d_a) AS BIGINT) AS events_a,
            CAST(sum(d) - sum(d_a) AS BIGINT) AS events_b,
            CAST(sum(CAST(e_t AS DECIMAL(20,8))) AS DECIMAL(20,8)) AS e_a,
            CAST(sum(CAST(v_t AS DECIMAL(20,8))) AS DECIMAL(20,8)) AS v
          FROM terms)
        SELECT n_a, n_b, events_a, events_b,
          round(CAST(events_a AS DOUBLE) - CAST(e_a AS DOUBLE), 6)
            AS o_minus_e,
          round(CAST(v AS DOUBLE), 6) AS var_sum,
          CASE WHEN v > 0 THEN
            round((CAST(events_a AS DOUBLE) - CAST(e_a AS DOUBLE))
              / sqrt(CAST(v AS DOUBLE)), 6) END AS z_stat
        FROM agg""")),

    "q226_item_cosine_recs" -> Q(
      // Item-item collaborative filtering: top-3 "bought together"
      // recommendations per part by cosine over order co-occurrence,
      // c_ij/√(c_i·c_j), support ≥ 2 — the classical recommender
      // baseline, shaped for scale: the pair build is the bounded
      // co-purchase self-join q120 established, the per-item top-k is
      // a keyed window (partition = item, never global).
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val ci = li.groupBy(col("p")).agg(count(lit(1)).as("ci"))
        val pairs = li.as("x").join(li.as("y"),
            col("x.o") === col("y.o") && col("x.p") =!= col("y.p"))
          .groupBy(col("x.p").as("i"), col("y.p").as("j"))
          .agg(count(lit(1)).as("cij"))
          .filter(col("cij") >= 2)
        val scored = pairs
          .join(ci.select(col("p").as("i"), col("ci").as("c_i")), "i")
          .join(ci.select(col("p").as("j"), col("ci").as("c_j")), "j")
          .withColumn("cosine", round(col("cij").cast("double")
            / sqrt(col("c_i").cast("double") * col("c_j").cast("double")), 8))
        val w = Window.partitionBy(col("i"))
          .orderBy(col("cosine").desc, col("j").asc)
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("i").as("part"), col("rk"), col("j").as("rec"),
            col("cij"), col("cosine"))
          .orderBy(col("part"), col("rk"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        ci AS (SELECT p, count(*) AS ci FROM li GROUP BY 1),
        pairs AS (
          SELECT x.p AS i, y.p AS j, count(*) AS cij
          FROM li x JOIN li y ON x.o = y.o AND x.p <> y.p
          GROUP BY 1, 2 HAVING count(*) >= 2),
        scored AS (
          SELECT i, j, cij,
            round(CAST(cij AS DOUBLE)
              / sqrt(CAST(a.ci AS DOUBLE) * CAST(b.ci AS DOUBLE)), 8)
              AS cosine
          FROM pairs
          JOIN ci a ON a.p = i
          JOIN ci b ON b.p = j),
        ranked AS (
          SELECT i, j, cij, cosine,
            row_number() OVER (PARTITION BY i
              ORDER BY cosine DESC, j) AS rk
          FROM scored)
        SELECT i AS part, rk, j AS rec, cij, cosine
        FROM ranked WHERE rk <= 3
        ORDER BY part, rk""")),

    "q227_nelson_aalen" -> Q(
      // Nelson-Aalen cumulative hazard on q200's time-to-first-big-
      // purchase frame — the second standard survival estimator, whose
      // exp(−H) (Fleming-Harrington) brackets Kaplan-Meier from above:
      // shipping BOTH is how survival discrepancies get caught. Same
      // bounded distinct-duration frame and censoring discipline as
      // q200; Σd/n and the variance Σd/n² accumulate as 8-snapped
      // exact decimals.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        val t0 = ev.groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("d0"))
        val tp = ev.filter(col("event_type") === "purchase"
            && col("value") >= 150)
          .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("dp"))
        val end = ev.agg(max(to_date(col("ts"))).as("dend"))
        val durs = t0.join(tp, Seq("user_id"), "left")
          .crossJoin(broadcast(end))
          .select(
            when(col("dp").isNotNull, datediff(col("dp"), col("d0")))
              .otherwise(datediff(col("dend"), col("d0")))
              .cast("long").as("dur"),
            col("dp").isNotNull.cast("long").as("ev"))
        val dayAgg = durs.groupBy(col("dur"))
          .agg(sum(col("ev")).as("d"), count(lit(1)).as("cnt"))
        val wPrev = Window.orderBy(col("dur"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wCum = Window.orderBy(col("dur"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val dD = col("d").cast("double")
        val nD = col("n_risk").cast("double")
        dayAgg
          .crossJoin(broadcast(durs.agg(count(lit(1)).as("ntot"))))
          .withColumn("n_risk",
            col("ntot") - coalesce(sum(col("cnt")).over(wPrev), lit(0L)))
          .filter(col("d") > 0)
          .withColumn("cumhaz", round(
            sum(round(dD / nD, 8).cast("decimal(20,8)")).over(wCum)
              .cast("double"), 8))
          .withColumn("var_haz", round(
            sum(round(dD / (nD * nD), 8).cast("decimal(20,8)")).over(wCum)
              .cast("double"), 8))
          .withColumn("na_surv", round(exp(-col("cumhaz")), 8))
          .select(col("dur").as("t_days"), col("n_risk"), col("d"),
            col("cumhaz"), col("var_haz"), col("na_surv"))
          .orderBy(col("t_days"))
      },
      oracle = Some("""
        WITH t0 AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS d0
          FROM events GROUP BY 1),
        tp AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS dp
          FROM events WHERE event_type = 'purchase' AND value >= 150
          GROUP BY 1),
        endd AS (SELECT max(CAST(ts AS DATE)) AS dend FROM events),
        durs AS (
          SELECT CAST(CASE WHEN tp.dp IS NOT NULL
              THEN date_diff('day', t0.d0, tp.dp)
              ELSE date_diff('day', t0.d0, endd.dend) END AS BIGINT) AS dur,
            CAST(CASE WHEN tp.dp IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
              AS ev
          FROM t0 LEFT JOIN tp ON tp.user_id = t0.user_id
          CROSS JOIN endd),
        day_agg AS (
          SELECT dur, CAST(sum(ev) AS BIGINT) AS d, count(*) AS cnt
          FROM durs GROUP BY 1),
        risk AS (
          SELECT dur, d,
            (SELECT count(*) FROM durs) - coalesce(
              sum(cnt) OVER (ORDER BY dur
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS n_risk
          FROM day_agg),
        hz AS (
          SELECT dur, d, n_risk,
            round(CAST(sum(CAST(round(
              CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE), 8)
              AS DECIMAL(20,8))) OVER (ORDER BY dur
                ROWS UNBOUNDED PRECEDING) AS DOUBLE), 8) AS cumhaz,
            round(CAST(sum(CAST(round(
              CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE)
                * CAST(n_risk AS DOUBLE)), 8)
              AS DECIMAL(20,8))) OVER (ORDER BY dur
                ROWS UNBOUNDED PRECEDING) AS DOUBLE), 8) AS var_haz
          FROM risk WHERE d > 0)
        SELECT dur AS t_days, CAST(n_risk AS BIGINT) AS n_risk, d,
          cumhaz, var_haz,
          round(exp(-cumhaz), 8) AS na_surv
        FROM hz ORDER BY t_days""")),

    "q229_neighbor_jaccard" -> Q(
      // Supplier-supplier similarity by customer-base overlap: Jaccard
      // of the two customer neighbor sets on the bipartite purchase
      // graph — the node-similarity primitive behind "suppliers like
      // this one" and substitution analysis. Common counts come from
      // one keyed self-join on the customer (never a cross product);
      // top-50 pairs by similarity.
      build = (s, dir) => {
        val ed = table(s, dir, "lineitem")
          .join(table(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
          .distinct()
        val deg = ed.groupBy(col("sp")).agg(count(lit(1)).as("d"))
        val common = ed.as("x").join(ed.as("y"),
            col("x.c") === col("y.c") && col("x.sp") < col("y.sp"))
          .groupBy(col("x.sp").as("s1"), col("y.sp").as("s2"))
          .agg(count(lit(1)).as("common"))
        common
          .join(deg.select(col("sp").as("s1"), col("d").as("d1")), "s1")
          .join(deg.select(col("sp").as("s2"), col("d").as("d2")), "s2")
          .withColumn("jaccard", round(col("common").cast("double")
            / (col("d1") + col("d2") - col("common")).cast("double"), 8))
          .select(col("s1"), col("s2"), col("common"), col("jaccard"))
          .orderBy(col("jaccard").desc, col("s1"), col("s2"))
          .limit(50)
      },
      oracle = Some("""
        WITH ed AS (
          SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        deg AS (SELECT sp, count(*) AS d FROM ed GROUP BY 1),
        common AS (
          SELECT x.sp AS s1, y.sp AS s2, count(*) AS common
          FROM ed x JOIN ed y ON x.c = y.c AND x.sp < y.sp
          GROUP BY 1, 2)
        SELECT s1, s2, common,
          round(CAST(common AS DOUBLE)
            / CAST(a.d + b.d - common AS DOUBLE), 8) AS jaccard
        FROM common
        JOIN deg a ON a.sp = s1
        JOIN deg b ON b.sp = s2
        ORDER BY jaccard DESC, s1, s2 LIMIT 50""")),

    "q230_rolling_regression" -> Q(
      // Rolling 30-day OLS slope of daily revenue per priority — the
      // local-trend monitor that a single whole-series fit (q100)
      // smears away. The window is a banded self-join over the BOUNDED
      // daily table (q138's convolution shape, quadratic only in the
      // 30-day band) feeding the same exact-decimal moment fit as
      // groupedLinearFit, keyed by (priority, day) — slope is NULL
      // until a window has ≥ 2 distinct days. Emitted monthly (day 1)
      // to keep the result frame reviewable.
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("prio"),
            to_date(col("o_orderdate")).as("day"))
          .agg(msum(col("o_totalprice")).as("rev"))
          .withColumn("dayn", unix_date(col("day")))
        val banded = daily.as("a").join(daily.as("b"),
            col("a.prio") === col("b.prio") &&
              col("b.dayn") <= col("a.dayn") &&
              col("b.dayn") > col("a.dayn") - 30)
          .filter(dayofmonth(col("a.day")) === 1)
          .select(col("a.prio").as("prio"), col("a.day").as("day"),
            (col("b.dayn") - col("a.dayn") + 30).as("x"),
            col("b.rev").as("y"))
        Trend.groupedLinearFit(banded, Seq("prio", "day"), "x", "y")
          .orderBy(col("prio"), col("day"))
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
            ${sqlMsum("o_totalprice")} AS rev,
            date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS dayn
          FROM orders GROUP BY 1, 2),
        banded AS (
          SELECT a.prio, a.day, b.dayn - a.dayn + 30 AS x, b.rev AS y
          FROM daily a JOIN daily b
            ON a.prio = b.prio AND b.dayn <= a.dayn
              AND b.dayn > a.dayn - 30
          WHERE date_part('day', a.day) = 1),
        ols_m AS (
          SELECT prio, day, count(*) AS n,
            CAST(sum(CAST(x AS DECIMAL(7,0))) AS DECIMAL(18,0)) AS sx,
            CAST(sum(CAST(x AS DECIMAL(7,0)) * CAST(x AS DECIMAL(7,0)))
              AS DECIMAL(25,0)) AS sxx,
            CAST(sum(CAST(y AS DECIMAL(12,2))) AS DECIMAL(16,2)) AS sy,
            CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(12,2)))
              AS DECIMAL(23,2)) AS sxy
          FROM banded
          WHERE x IS NOT NULL AND y IS NOT NULL
          GROUP BY 1, 2)
        SELECT prio, day, n,
          CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 THEN
            floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e8 + 0.5)
              / 1e8
          END AS slope,
          floor((CAST(sy AS DOUBLE)
                 - (CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                              <> 0.0 THEN
                      floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e8
                          + 0.5) / 1e8
                    END) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) * 1e6
            + 0.5) / 1e6 AS intercept
        FROM ols_m
        ORDER BY prio, day""")),

    "q228_pca_first_component" -> Q(
      // First principal component of the four lineitem measures — PCA
      // the Spark-native way: ONE scan builds the exact-decimal
      // correlation moments (q219's aggregation), then 12 power-method
      // iterations run as pure scalar doubles on the one-row frame
      // (v ← Rv/‖Rv‖, localCheckpoint per round so the expression tree
      // cannot snowball). No data-sized float reduction remains, so an
      // iterated float algorithm hash-matches the DuckDB CTE chain
      // exactly.
      build = (s, dir) =>
        Trend.pcaFirstComponent(table(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
          iters = 12)
          .orderBy(col("feature")),
      oracle = Some(s"""
        WITH ${Trend.sqlPcaCtes("lineitem",
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
          iters = 12)}
        SELECT feature, loading, eigenvalue, explained_ratio, n
        FROM pca ORDER BY feature""")),

    "q231_kmeans" -> Q(
      // Deterministic Lloyd k-means (k=4, 4 rounds) on the
      // (quantity, price/1000) plane: grid init from exact [min,max]
      // spans, broadcast k-row centroid frame per round, tie-to-
      // smallest-id assignment, exact-decimal centroid updates, and a
      // 6-snapped WCSS — the full clustering loop oracle-checked
      // bit-for-bit against an unrolled CTE chain. One scan per round
      // is the 100 TB shape; no RNG anywhere.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .withColumn("price_k", col("l_extendedprice") / lit(1000.0))
        KMeans.fit2d(li, "l_quantity", "price_k", k = 4, iters = 4)
      },
      oracle = Some(s"""
        WITH ${KMeans.sqlCtes("lineitem", "l_quantity",
          "l_extendedprice / 1000.0", k = 4, iters = 4)}
        SELECT cluster, n_points, cx, cy, wcss FROM km
        ORDER BY cluster""")),

    "q232_distinctive_terms" -> Q(
      // What words DISTINGUISH each source — informed-prior log-odds
      // with z-scores (Monroe et al. '08), the corpus-comparison
      // operator that raw frequency and even KL (q121) blur: per
      // source, top-5 terms by z of the smoothed log-odds-ratio vs the
      // REST of the corpus. Counts are exact; δ and its variance are
      // fixed-shape ln expressions snapped at 6; the top-k is a keyed
      // window per source.
      build = (s, dir) => {
        val tok = table(s, dir, "documents")
          .select(col("source").as("src"),
            explode(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")).as("w"))
        val cs = tok.groupBy(col("src"), col("w"))
          .agg(count(lit(1)).as("csw"))
        val cw = tok.groupBy(col("w")).agg(count(lit(1)).as("cw"))
        val ns = tok.groupBy(col("src")).agg(count(lit(1)).as("ns"))
        val nt = tok.agg(count(lit(1)).as("nt"))
        val a = lit(0.5)
        val cswD = col("csw").cast("double") + a
        val restD = col("cw").cast("double") - col("csw").cast("double") + a
        val nsD = col("ns").cast("double")
        val ntD = col("nt").cast("double")
        val delta = log(cswD / (nsD + a - cswD)) -
          log(restD / (ntD - nsD + a - restD))
        val varD = lit(1.0) / cswD + lit(1.0) / restD
        val scored = cs.join(cw, "w").join(ns, "src")
          .crossJoin(broadcast(nt))
          .withColumn("z", round(delta / sqrt(varD), 6))
        val w = Window.partitionBy(col("src"))
          .orderBy(col("z").desc, col("w").asc)
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("src").as("source"), col("rk"), col("w").as("term"),
            col("csw"), col("z"))
          .orderBy(col("source"), col("rk"))
      },
      oracle = Some("""
        WITH tok AS (
          SELECT source AS src,
            unnest(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS w
          FROM documents),
        cs AS (SELECT src, w, count(*) AS csw FROM tok GROUP BY 1, 2),
        cw AS (SELECT w, count(*) AS cw FROM tok GROUP BY 1),
        ns AS (SELECT src, count(*) AS ns FROM tok GROUP BY 1),
        nt AS (SELECT count(*) AS nt FROM tok),
        scored AS (
          SELECT src, w, csw,
            round((
              ln((CAST(csw AS DOUBLE) + 0.5)
                 / (CAST(ns AS DOUBLE) + 0.5 - (CAST(csw AS DOUBLE) + 0.5)))
              - ln((CAST(cw AS DOUBLE) - CAST(csw AS DOUBLE) + 0.5)
                 / (CAST(nt AS DOUBLE) - CAST(ns AS DOUBLE) + 0.5
                    - (CAST(cw AS DOUBLE) - CAST(csw AS DOUBLE) + 0.5)))
            ) / sqrt(1.0 / (CAST(csw AS DOUBLE) + 0.5)
                   + 1.0 / (CAST(cw AS DOUBLE) - CAST(csw AS DOUBLE) + 0.5)),
            6) AS z
          FROM cs JOIN cw USING (w) JOIN ns USING (src) CROSS JOIN nt),
        ranked AS (
          SELECT src, w, csw, z,
            row_number() OVER (PARTITION BY src ORDER BY z DESC, w) AS rk
          FROM scored)
        SELECT src AS source, rk, w AS term, csw, z
        FROM ranked WHERE rk <= 5
        ORDER BY source, rk""")),

    "q233_clustering_coefficient" -> Q(
      // Local clustering coefficient on the symmetrized co-purchase
      // graph (support ≥ 2): per part, 2T/(d(d−1)) — how clique-like
      // each node's neighborhood is, the per-node refinement of q115's
      // global triangle count. Triangles come from one wedge join
      // against the canonical (a<b) edge set; both T and d are exact
      // integers, the ratio is one fixed-shape division. Parts with
      // degree ≥ 5, ordered by coefficient.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        val und = li.as("x").join(li.as("y"),
            col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .groupBy(col("x.p").as("a"), col("y.p").as("b"))
          .agg(count(lit(1)).as("c"))
          .filter(col("c") >= 2)
          .select(col("a"), col("b"))
        val sym = und.unionByName(
          und.select(col("b").as("a"), col("a").as("b")))
        val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
        // wedge (n -> u, n -> v with u < v) closed by canonical edge (u, v)
        val tri = sym.as("e1").join(sym.as("e2"),
            col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
          .select(col("e1.a").as("n"), col("e1.b").as("u"),
            col("e2.b").as("v"))
          .join(und.select(col("a").as("u"), col("b").as("v")),
            Seq("u", "v"))
          .groupBy(col("n")).agg(count(lit(1)).as("t"))
        deg.join(tri, col("node") === col("n"), "left")
          .filter(col("d") >= 5)
          .select(col("node").as("part"), col("d").as("degree"),
            coalesce(col("t"), lit(0L)).as("triangles"),
            round(coalesce(col("t"), lit(0L)).cast("double") * 2.0
              / (col("d") * (col("d") - 1)).cast("double"), 8).as("local_cc"))
          .orderBy(col("local_cc").desc, col("part"))
      },
      oracle = Some("""
        WITH und AS (
          SELECT a, b FROM (
            SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS c
            FROM lineitem x JOIN lineitem y
              ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
            GROUP BY 1, 2)
          WHERE c >= 2),
        sym AS (
          SELECT a, b FROM und
          UNION ALL
          SELECT b, a FROM und),
        deg AS (SELECT a AS node, count(*) AS d FROM sym GROUP BY 1),
        tri AS (
          SELECT e1.a AS n, count(*) AS t
          FROM sym e1
          JOIN sym e2 ON e1.a = e2.a AND e1.b < e2.b
          JOIN und ON und.a = e1.b AND und.b = e2.b
          GROUP BY 1)
        SELECT node AS part, d AS degree,
          coalesce(t, 0) AS triangles,
          round(CAST(coalesce(t, 0) AS DOUBLE) * 2.0
            / CAST(d * (d - 1) AS DOUBLE), 8) AS local_cc
        FROM deg LEFT JOIN tri ON n = node
        WHERE d >= 5
        ORDER BY local_cc DESC, part""")),

    "q234_bh_fdr" -> Q(
      // Benjamini-Hochberg FDR over a HETEROGENEOUS family of 32
      // one-vs-rest Welch tests — the realistic multiple-testing
      // setting: 25 brand-price tests that are TRUE NULLS in this
      // randomized fixture (BH should spare them) mixed with
      // order-revenue-by-line-count tests whose effect is structural
      // (summed line revenue grows with line count — BH must catch
      // them; the fixture's o_totalprice is random noise, so the
      // revenue is derived from the lines themselves). Each
      // family costs ONE moment scan: rest-arm moments are exact-
      // decimal subtractions global−segment. p-values via the A-S
      // erfc approximation (Hypothesis.normalTwoSidedP, fixed-shape
      // IEEE both engines); the step-up rank walk runs on the bounded
      // 32-row frame.
      build = (s, dir) => {
        def meanE(n: Column, sx: Column) = sx.cast("double") / n.cast("double")
        def varE(n: Column, sx: Column, sxx: Column) =
          (sxx.cast("double") - sx.cast("double") * sx.cast("double")
            / n.cast("double")) / (n.cast("double") - lit(1.0))
        def oneVsRest(m: DataFrame): DataFrame = {
          val g = m.agg(sum(col("n_g")).as("nt"),
            sum(col("sx_g")).cast("decimal(24,2)").as("sxt"),
            sum(col("sxx_g")).cast("decimal(34,4)").as("sxxt"))
          val j = m.crossJoin(broadcast(g))
            .withColumn("n_r", col("nt") - col("n_g"))
            .withColumn("sx_r",
              (col("sxt") - col("sx_g")).cast("decimal(24,2)"))
            .withColumn("sxx_r",
              (col("sxxt") - col("sxx_g")).cast("decimal(34,4)"))
          val se2 = varE(col("n_g"), col("sx_g"), col("sxx_g"))
            ./(col("n_g").cast("double"))
            .+(varE(col("n_r"), col("sx_r"), col("sxx_r"))
              ./(col("n_r").cast("double")))
          val z = round((meanE(col("n_g"), col("sx_g"))
            - meanE(col("n_r"), col("sx_r"))) / sqrt(se2), 6)
          j.filter(col("n_g") > 1 && col("n_r") > 1).withColumn("z", z)
        }
        def moments(df: DataFrame, idCol: Column, v: Column): DataFrame =
          df.groupBy(idCol.as("test_id"))
            .agg(count(lit(1)).as("n_g"),
              sum(dec(v)).cast("decimal(20,2)").as("sx_g"),
              sum(dec(v) * dec(v)).cast("decimal(30,4)").as("sxx_g"))
        val li = table(s, dir, "lineitem")
        val pt = table(s, dir, "part").select(col("p_partkey"), col("p_brand"))
        val brandTests = oneVsRest(moments(
          li.join(broadcast(pt), col("l_partkey") === col("p_partkey")),
          concat(lit("brand:"), col("p_brand")), col("l_extendedprice")))
        val oc = li.groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("nl"),
            msum(col("l_extendedprice")).as("orev"))
        val lineTests = oneVsRest(moments(oc,
          concat(lit("lines:"), col("nl").cast("string")), col("orev")))
        val tested = brandTests.unionByName(lineTests)
          .withColumn("p_value",
            round(Hypothesis.normalTwoSidedP(col("z")), 10))
        val wRank = Window.orderBy(col("p_value").asc, col("test_id").asc)
        val wAll = Window.partitionBy()
        tested
          .withColumn("rk", row_number().over(wRank))
          .withColumn("m_tests", count(lit(1)).over(wAll))
          .withColumn("bh_thresh", round(col("rk").cast("double") * 0.05
            / col("m_tests").cast("double"), 10))
          .withColumn("kstar", max(when(col("p_value") <= col("bh_thresh"),
            col("rk"))).over(wAll))
          .select(col("test_id"), col("n_g").as("n"), col("z"),
            col("p_value"), col("rk"), col("bh_thresh"),
            (col("rk") <= coalesce(col("kstar"), lit(0))).as("discovered"))
          .orderBy(col("rk"))
      },
      oracle = Some {
        def welch(momCte: String) = s"""
          SELECT test_id, n_g,
            round((CAST(sx_g AS DOUBLE) / CAST(n_g AS DOUBLE)
              - CAST(sx_r AS DOUBLE) / CAST(n_r AS DOUBLE))
              / sqrt(
                ((CAST(sxx_g AS DOUBLE) - CAST(sx_g AS DOUBLE)
                  * CAST(sx_g AS DOUBLE) / CAST(n_g AS DOUBLE))
                  / (CAST(n_g AS DOUBLE) - 1.0)) / CAST(n_g AS DOUBLE)
                + ((CAST(sxx_r AS DOUBLE) - CAST(sx_r AS DOUBLE)
                  * CAST(sx_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                  / (CAST(n_r AS DOUBLE) - 1.0)) / CAST(n_r AS DOUBLE)), 6)
              AS z
          FROM (
            SELECT test_id, n_g, sx_g, sxx_g, nt - n_g AS n_r,
              CAST(sxt - sx_g AS DECIMAL(24,2)) AS sx_r,
              CAST(sxxt - sxx_g AS DECIMAL(34,4)) AS sxx_r
            FROM $momCte CROSS JOIN (
              SELECT CAST(sum(n_g) AS BIGINT) AS nt,
                CAST(sum(sx_g) AS DECIMAL(24,2)) AS sxt,
                CAST(sum(sxx_g) AS DECIMAL(34,4)) AS sxxt
              FROM $momCte))
          WHERE n_g > 1 AND n_r > 1"""
        s"""
        WITH mb AS (
          SELECT 'brand:' || p_brand AS test_id, count(*) AS n_g,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(19,2)))
              AS DECIMAL(20,2)) AS sx_g,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(19,2))
              * CAST(l_extendedprice AS DECIMAL(19,2)))
              AS DECIMAL(30,4)) AS sxx_g
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1),
        ml AS (
          SELECT 'lines:' || CAST(nl AS VARCHAR) AS test_id,
            count(*) AS n_g,
            CAST(sum(CAST(orev AS DECIMAL(19,2)))
              AS DECIMAL(20,2)) AS sx_g,
            CAST(sum(CAST(orev AS DECIMAL(19,2))
              * CAST(orev AS DECIMAL(19,2)))
              AS DECIMAL(30,4)) AS sxx_g
          FROM (
            SELECT l_orderkey, count(*) AS nl,
              ${sqlMsum("l_extendedprice")} AS orev
            FROM lineitem GROUP BY 1) lc
          GROUP BY 1),
        tested AS (${welch("mb")} UNION ALL ${welch("ml")}),
        pvals AS (
          SELECT test_id, n_g, z,
            round(${Hypothesis.sqlNormalTwoSidedP("z")}, 10) AS p_value
          FROM tested),
        ranked AS (
          SELECT test_id, n_g, z, p_value,
            row_number() OVER (ORDER BY p_value, test_id) AS rk,
            count(*) OVER () AS m_tests
          FROM pvals),
        thresh AS (
          SELECT *,
            round(CAST(rk AS DOUBLE) * 0.05 / CAST(m_tests AS DOUBLE), 10)
              AS bh_thresh
          FROM ranked),
        kstar AS (
          SELECT *, max(CASE WHEN p_value <= bh_thresh THEN rk END)
            OVER () AS ks
          FROM thresh)
        SELECT test_id, n_g AS n, z, p_value, rk, bh_thresh,
          rk <= coalesce(ks, 0) AS discovered
        FROM kstar ORDER BY rk"""
      }),

    "q235_quantile_treatment_effect" -> Q(
      // Quantile treatment effects: urgent vs non-urgent order values
      // compared at each decile, q_A(p) − q_B(p) — the effect PROFILE a
      // single mean difference (q112) flattens; distributional shifts
      // live in the tails. Both arms' exact type-7 deciles come from
      // ONE conditional aggregation (percentile over the arm-masked
      // value — NULLs skipped on both engines), exploded to one row
      // per decile.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
          .withColumn("arm", col("o_orderpriority") === "1-URGENT")
        val decs = (1 to 9).map(_ / 10.0)
        val aggs =
          decs.map(p => expr(
            s"percentile(CASE WHEN arm THEN o_totalprice END, ${p}D)")
            .as(s"qa_${(p * 10).toInt}")) ++
          decs.map(p => expr(
            s"percentile(CASE WHEN NOT arm THEN o_totalprice END, ${p}D)")
            .as(s"qb_${(p * 10).toInt}"))
        val m = o.agg(aggs.head, aggs.tail: _*)
        // snap(·,6), not the raw percentile doubles: the TRUE type-7
        // decile of 2-decimal data is an exact 1e-3 multiple, while each
        // engine's interpolation formula differs in the last ulps
        // (Spark lo+(hi-lo)·f vs DuckDB's lerp — one row flipped at the
        // r10 sf1 sweep). The 5e-7 snap margin dwarfs the ulp spread,
        // so the snapped value is the exact decile in BOTH engines.
        val rows = decs.map { p =>
          val i = (p * 10).toInt
          struct(lit(p).as("p"), snap(col(s"qa_$i"), 6).as("q_urgent"),
            snap(col(s"qb_$i"), 6).as("q_rest"),
            snap(snap(col(s"qa_$i"), 6) - snap(col(s"qb_$i"), 6), 6).as("qte"))
        }
        m.select(explode(array(rows: _*)).as("r"))
          .select(col("r.p").as("p"), col("r.q_urgent").as("q_urgent"),
            col("r.q_rest").as("q_rest"), col("r.qte").as("qte"))
          .orderBy(col("p"))
      },
      oracle = Some {
        val branches = (1 to 9).map { i =>
          val p = i / 10.0
          val qa = s"""quantile_cont(CASE WHEN o_orderpriority = '1-URGENT'
              THEN o_totalprice END, $p)"""
          val qb = s"""quantile_cont(CASE WHEN NOT (o_orderpriority = '1-URGENT')
              THEN o_totalprice END, $p)"""
          s"""SELECT CAST($p AS DOUBLE) AS p,
            ${sqlSnap(qa, 6)} AS q_urgent,
            ${sqlSnap(qb, 6)} AS q_rest,
            ${sqlSnap(s"${sqlSnap(qa, 6)} - ${sqlSnap(qb, 6)}", 6)} AS qte
          FROM orders"""
        }
        branches.mkString("", "\nUNION ALL\n", "\nORDER BY p")
      }),

    "q236_string_agg_battery" -> Q(
      // Ordered string aggregation battery — the engine-contract rows
      // for text rollups, where "works" and "deterministic" diverge
      // fastest: collect order is partitioning-dependent, so every
      // concatenation here is forced through an explicit sort
      // (sort_array / ORDER BY inside the aggregate). Per priority:
      // sorted distinct statuses, status:count pairs, top-3 order keys
      // by key — all strings built from integers and categorical
      // codes (never floats: float→string formatting is NOT an
      // engine-portable operation).
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val sc = o.groupBy(col("o_orderpriority").as("prio"),
            col("o_orderstatus").as("st"))
          .agg(count(lit(1)).as("c"))
        val statuses = sc.groupBy(col("prio"))
          .agg(
            concat_ws(",", sort_array(collect_list(col("st"))))
              .as("statuses_sorted"),
            concat_ws(",", sort_array(collect_list(
              concat(col("st"), lit(":"), col("c").cast("string")))))
              .as("status_counts"))
        val topk = o.groupBy(col("o_orderpriority").as("prio"))
          .agg(concat_ws(",", slice(reverse(sort_array(
            collect_list(col("o_orderkey")))), 1, 3).cast("array<string>"))
            .as("top3_keys"))
        statuses.join(topk, "prio").orderBy(col("prio"))
      },
      oracle = Some("""
        WITH sc AS (
          SELECT o_orderpriority AS prio, o_orderstatus AS st,
            count(*) AS c
          FROM orders GROUP BY 1, 2),
        statuses AS (
          -- coalesce to '': a group whose every status is NULL has an
          -- EMPTY list — Spark's concat_ws over an empty collect_list
          -- says '', DuckDB's string_agg over zero values says NULL
          -- (the q108 all-NULL-input class, r9 relational fixture)
          SELECT prio,
            coalesce(string_agg(st, ',' ORDER BY st), '') AS statuses_sorted,
            coalesce(string_agg(st || ':' || CAST(c AS VARCHAR), ','
              ORDER BY st || ':' || CAST(c AS VARCHAR)), '') AS status_counts
          FROM sc GROUP BY 1),
        topk AS (
          -- ORDER BY the BIGINT key, not its string form: lexicographic
          -- string order diverges from numeric once digit counts differ.
          -- agg: nonempty (k = o_orderkey is never NULL — PK, the dup-PK
          -- hostile row included — and rn <= 3 keeps >= 1 row per group)
          SELECT prio, string_agg(CAST(k AS VARCHAR), ','
            ORDER BY k DESC) AS top3_keys
          FROM (
            SELECT o_orderpriority AS prio, o_orderkey AS k,
              row_number() OVER (PARTITION BY o_orderpriority
                ORDER BY o_orderkey DESC) AS rn
            FROM orders)
          WHERE rn <= 3
          GROUP BY 1)
        SELECT prio, statuses_sorted, status_counts, top3_keys
        FROM statuses JOIN topk USING (prio)
        ORDER BY prio""")),

    "q237_absorbing_markov" -> Q(
      // P(reach 'purchase' within 8 transitions | current state), from
      // the session Markov chain (q107's transition counts) with
      // purchase absorbing — the forward-looking number a transition
      // matrix only implies: which states are 8 steps from money.
      // Session-end mass simply drops (no next event ⇒ no conversion),
      // so probabilities are conservative by construction. The value
      // iteration h ← P·h runs on the BOUNDED 5-state frame, each
      // per-state dot product's terms snapped at 8 into exact-decimal
      // sums; 8 unrolled rounds oracle-checked exactly.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        val w = Window.partitionBy(col("user_id"),
            to_date(col("ts")).as("d"))
          .orderBy(col("ts"), col("event_id"))
        val steps = ev
          .withColumn("nxt", lead(col("event_type"), 1).over(
            Window.partitionBy(col("user_id"), to_date(col("ts")))
              .orderBy(col("ts"), col("event_id"))))
          .filter(col("nxt").isNotNull)
        val trans = steps.groupBy(col("event_type").as("i"),
            col("nxt").as("j"))
          .agg(count(lit(1)).as("c"))
        val outc = trans.groupBy(col("i")).agg(sum(col("c")).as("ci"))
        val p = trans.join(outc, "i")
          .withColumn("p", col("c").cast("double") / col("ci").cast("double"))
          .select(col("i"), col("j"), col("p"))
          .localCheckpoint(true)
        val states = p.select(col("i").as("st")).distinct()
          .unionByName(p.select(col("j").as("st")).distinct()).distinct()
        var h = states.withColumn("h",
          when(col("st") === "purchase", lit(1.0)).otherwise(lit(0.0)))
        var t = 0
        while (t < 8) {
          h = states.join(
            p.join(h, col("j") === col("st"))
              .groupBy(col("i"))
              .agg(round(sum(round(col("p") * col("h"), 8)
                .cast("decimal(20,8)")), 8).cast("double").as("hs")),
            col("st") === col("i"), "left")
            .select(col("st"),
              when(col("st") === "purchase", lit(1.0))
                .otherwise(coalesce(col("hs"), lit(0.0))).as("h"))
            .localCheckpoint(true)
          t += 1
        }
        h.select(col("st").as("state"), col("h").as("p_reach_8"))
          .orderBy(col("state"))
      },
      oracle = Some {
        val rounds = (1 to 8).map { t =>
          s"""h$t AS MATERIALIZED (
          SELECT s.st,
            CASE WHEN s.st = 'purchase' THEN 1.0
              ELSE coalesce(hs.v, 0.0) END AS h
          FROM states s LEFT JOIN (
            SELECT p.i AS st,
              CAST(round(sum(CAST(round(p.p * h.h, 8)
                AS DECIMAL(20,8))), 8) AS DOUBLE) AS v
            FROM p JOIN h${t - 1} h ON p.j = h.st
            GROUP BY 1) hs ON hs.st = s.st)"""
        }.mkString(",\n        ")
        s"""
        WITH steps AS (
          SELECT event_type AS i,
            lead(event_type, 1) OVER (
              PARTITION BY user_id, CAST(ts AS DATE)
              ORDER BY ts, event_id) AS j
          FROM events),
        trans AS (
          SELECT i, j, count(*) AS c FROM steps
          WHERE j IS NOT NULL GROUP BY 1, 2),
        outc AS (SELECT i, CAST(sum(c) AS BIGINT) AS ci FROM trans GROUP BY 1),
        p AS MATERIALIZED (
          SELECT t.i, t.j, CAST(t.c AS DOUBLE) / CAST(o.ci AS DOUBLE) AS p
          FROM trans t JOIN outc o USING (i)),
        states AS MATERIALIZED (
          SELECT DISTINCT st FROM (
            SELECT i AS st FROM p UNION SELECT j FROM p)),
        h0 AS (
          SELECT st, CASE WHEN st = 'purchase' THEN 1.0 ELSE 0.0 END AS h
          FROM states),
        $rounds
        SELECT st AS state, h AS p_reach_8 FROM h8 ORDER BY state"""
      }),

    "q238_dispersion_audit" -> Q(
      // Overdispersion audit of daily event counts per type: the
      // variance-to-mean ratio (index of dispersion) with its normal
      // z — the "is this Poisson or bursty" gate that decides whether
      // a count model (or a rate alert threshold) is even valid.
      // Counts are exact; sample variance comes from exact integer
      // moments; D and z are fixed-shape doubles.
      build = (s, dir) => {
        val daily = table(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("y"))
        val m = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("y")).as("sy"),
            sum(col("y") * col("y")).as("syy"))
        val nD = col("n_days").cast("double")
        val mean = col("sy").cast("double") / nD
        val varS = (col("syy").cast("double")
          - col("sy").cast("double") * col("sy").cast("double") / nD)
          ./(nD - lit(1.0))
        val disp = varS / mean
        // sample variance (and thus D, z) is undefined for a single
        // observed day: explicit NULL instead of an ANSI 0-divide error
        // (a sparse event type with one active day is normal raw data)
        val defined = col("n_days") > 1
        m.select(col("event_type"), col("n_days"),
            round(mean, 6).as("mean_daily"),
            when(defined, round(disp, 6)).as("dispersion_index"),
            when(defined, round((disp - lit(1.0))
              * sqrt((nD - lit(1.0)) / lit(2.0)), 6))
              .as("z_overdispersion"))
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS y
          FROM events GROUP BY 1, 2),
        m AS (
          SELECT event_type, count(*) AS n_days,
            CAST(sum(y) AS BIGINT) AS sy,
            CAST(sum(y * y) AS BIGINT) AS syy
          FROM daily GROUP BY 1)
        SELECT event_type, n_days,
          round(CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
            AS mean_daily,
          CASE WHEN n_days > 1 THEN
            round(((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                * CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE))
              / (CAST(n_days AS DOUBLE) - 1.0))
              / (CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE)), 6)
          END AS dispersion_index,
          CASE WHEN n_days > 1 THEN
            round((((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                * CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE))
              / (CAST(n_days AS DOUBLE) - 1.0))
              / (CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE)) - 1.0)
              * sqrt((CAST(n_days AS DOUBLE) - 1.0) / 2.0), 6)
          END AS z_overdispersion
        FROM m ORDER BY event_type""")),

    "q239_fd_audit" -> Q(
      // Functional-dependency discovery battery (Metanome-style data
      // profiling): for each candidate det→dep, how many determinant
      // values map to MORE than one dependent value — schema
      // assumptions checked against the data instead of trusted.
      // p_partkey→p_brand must hold (key determines attribute);
      // l_orderkey→l_suppkey must fail (orders span suppliers). One
      // keyed aggregation per candidate; all counts exact.
      build = (s, dir) => {
        def fd(df: DataFrame, name: String, det: String,
            dep: String): DataFrame =
          df.groupBy(col(det))
            .agg(countDistinct(col(dep)).as("nd"))
            .agg(lit(name).as("candidate"),
              count(lit(1)).as("n_det"),
              sum((col("nd") > 1).cast("long")).as("n_violating"),
              max(col("nd")).as("max_dep"),
              (max(col("nd")) === 1).as("holds"))
        val li = table(s, dir, "lineitem")
        fd(table(s, dir, "part"), "part.p_partkey->p_brand",
            "p_partkey", "p_brand")
          .unionByName(fd(li, "lineitem.l_orderkey->l_suppkey",
            "l_orderkey", "l_suppkey"))
          .unionByName(fd(li, "lineitem.l_partkey->l_suppkey",
            "l_partkey", "l_suppkey"))
          .unionByName(fd(table(s, dir, "orders"),
            "orders.o_custkey->o_orderpriority",
            "o_custkey", "o_orderpriority"))
          .unionByName(fd(table(s, dir, "customer"),
            "customer.c_custkey->c_mktsegment",
            "c_custkey", "c_mktsegment"))
          .orderBy(col("candidate"))
      },
      oracle = Some {
        def fd(tbl: String, name: String, det: String, dep: String) =
          s"""SELECT '$name' AS candidate, count(*) AS n_det,
            CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_violating,
            max(nd) AS max_dep, max(nd) = 1 AS holds
          FROM (SELECT $det, count(DISTINCT $dep) AS nd
                FROM $tbl GROUP BY 1)"""
        Seq(
          fd("part", "part.p_partkey->p_brand", "p_partkey", "p_brand"),
          fd("lineitem", "lineitem.l_orderkey->l_suppkey",
            "l_orderkey", "l_suppkey"),
          fd("lineitem", "lineitem.l_partkey->l_suppkey",
            "l_partkey", "l_suppkey"),
          fd("orders", "orders.o_custkey->o_orderpriority",
            "o_custkey", "o_orderpriority"),
          fd("customer", "customer.c_custkey->c_mktsegment",
            "c_custkey", "c_mktsegment"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY candidate")
      }),

    "q240_paired_ttest" -> Q(
      // Paired t-test on year-over-year monthly brand revenue (1997 vs
      // 1998, same brand-month pairs): pairing removes the between-
      // brand variance a two-sample test (q112) would drown in. The
      // differences are exact decimals from msum'd cells; t and its
      // A-S p-value are fixed-shape doubles over exact moments.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
        val pt = table(s, dir, "part").select(col("p_partkey"), col("p_brand"))
        val monthly = li.join(broadcast(pt),
            col("l_partkey") === col("p_partkey"))
          .filter(year(col("l_shipdate")).isin(1997, 1998))
          .groupBy(col("p_brand"), month(col("l_shipdate")).as("mn"),
            year(col("l_shipdate")).as("yr"))
          .agg(sum(dec(col("l_extendedprice"))).cast("decimal(20,2)")
            .as("rev"))
        val pairs = monthly.filter(col("yr") === 1998).as("a")
          .join(monthly.filter(col("yr") === 1997).as("b"),
            col("a.p_brand") === col("b.p_brand")
              && col("a.mn") === col("b.mn"))
          .select((col("a.rev") - col("b.rev")).cast("decimal(20,2)").as("dv"))
        val m = pairs.agg(count(lit(1)).as("n_pairs"),
          sum(col("dv")).cast("decimal(24,2)").as("sd"),
          sum(col("dv") * col("dv")).cast("decimal(34,4)").as("sdd"))
        val nD = col("n_pairs").cast("double")
        val meanD = col("sd").cast("double") / nD
        val varD = (col("sdd").cast("double")
          - col("sd").cast("double") * col("sd").cast("double") / nD)
          ./(nD - lit(1.0))
        val tstat = meanD / sqrt(varD / nD)
        m.select(col("n_pairs"),
          round(meanD, 4).as("mean_diff"),
          when(varD > 0.0, round(tstat, 6)).as("t_stat"),
          when(varD > 0.0, round(Hypothesis.normalTwoSidedP(
            round(tstat, 6)), 10)).as("p_approx"))
      },
      oracle = Some(s"""
        WITH monthly AS (
          SELECT p_brand, date_part('month', l_shipdate) AS mn,
            date_part('year', l_shipdate) AS yr,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(19,2)))
              AS DECIMAL(20,2)) AS rev
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE date_part('year', l_shipdate) IN (1997, 1998)
          GROUP BY 1, 2, 3),
        pairs AS (
          SELECT CAST(a.rev - b.rev AS DECIMAL(20,2)) AS dv
          FROM monthly a JOIN monthly b
            ON a.p_brand = b.p_brand AND a.mn = b.mn
          WHERE a.yr = 1998 AND b.yr = 1997),
        m AS (
          SELECT count(*) AS n_pairs,
            CAST(sum(dv) AS DECIMAL(24,2)) AS sd,
            CAST(sum(dv * dv) AS DECIMAL(34,4)) AS sdd
          FROM pairs),
        stat AS (
          SELECT n_pairs,
            CAST(sd AS DOUBLE) / CAST(n_pairs AS DOUBLE) AS meand,
            (CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
              / CAST(n_pairs AS DOUBLE))
              / (CAST(n_pairs AS DOUBLE) - 1.0) AS vard
          FROM m)
        SELECT n_pairs,
          round(meand, 4) AS mean_diff,
          CASE WHEN vard > 0.0 THEN
            round(meand / sqrt(vard / CAST(n_pairs AS DOUBLE)), 6)
          END AS t_stat,
          CASE WHEN vard > 0.0 THEN
            round(${Hypothesis.sqlNormalTwoSidedP(
              "round(meand / sqrt(vard / CAST(n_pairs AS DOUBLE)), 6)")}, 10)
          END AS p_approx
        FROM stat""")),

    "q241_multiple_regression" -> Q(
      // Two-feature OLS by normal equations: revenue ~ quantity +
      // discount, solved in closed form — ONE moment scan, then
      // Cramer's rule as fixed-shape scalar doubles on the one-row
      // frame (the multivariate step up from q100's single-regressor
      // fit; same 100 TB shape as q228's PCA). The near-zero R²
      // is itself the fixture fact: line price is independent of
      // quantity here, and the regression SAYS so instead of
      // hallucinating structure.
      build = (s, dir) =>
        Trend.ols2(table(s, dir, "lineitem"),
          "l_quantity", "l_discount", "l_extendedprice"),
      oracle = Some(s"""
        WITH ${Trend.sqlOls2Ctes("lineitem", "l_quantity", "l_discount",
          "l_extendedprice")}
        SELECT n, beta0, beta1, beta2, r2 FROM ols2""")),

    "q242_kmeans_elbow" -> Q(
      // Model selection for q231: the k sweep (k = 2..6, 3 rounds
      // each) with total WCSS per k — the elbow curve that picks k.
      // WCSS is monotonically non-increasing in k on the same data;
      // each fit is the same deterministic Lloyd loop, so the whole
      // curve is oracle-exact. KMeans.elbow2d fits ALL five k
      // simultaneously — one scan per Lloyd round computes every k's
      // assignments/updates side by side, so the sweep costs 5 scans
      // total instead of 5 scan-sets (r8; per-k arithmetic is
      // column-identical to fit2d, results and oracle unchanged).
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .withColumn("price_k", col("l_extendedprice") / lit(1000.0))
        KMeans.elbow2d(li, "l_quantity", "price_k", ks = 2 to 6, iters = 3)
      },
      oracle = Some {
        val branches = (2 to 6).map { k =>
          s"""SELECT $k AS k, CAST(sum(n_points) AS BIGINT) AS n_points,
            CAST(round(sum(CAST(wcss AS DECIMAL(24,4))), 4) AS DOUBLE)
              AS total_wcss
          FROM (WITH ${KMeans.sqlCtes("lineitem", "l_quantity",
            "l_extendedprice / 1000.0", k = k, iters = 3, pfx = s"k$k")}
            SELECT n_points, wcss FROM k$k)"""
        }
        branches.mkString("", "\nUNION ALL\n", "\nORDER BY k")
      }),

    "q243_grubbs_outlier" -> Q(
      // Grubbs' extreme-deviate statistic per priority on daily
      // revenue: G = max|y−ȳ|/s plus WHICH day — the single-worst-
      // point detector that complements q90's bulk MAD gate (MAD finds
      // populations of outliers; Grubbs indicts one). Moments exact;
      // the argmax day is picked by a keyed rank window ordered by the
      // snapped deviation (ties → earliest day).
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("prio"),
            to_date(col("o_orderdate")).as("day"))
          .agg(msum(col("o_totalprice")).as("rev"))
        val m = daily.groupBy(col("prio"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("rev").cast("decimal(18,2)")).cast("decimal(24,2)")
              .as("sr"),
            sum(col("rev").cast("decimal(18,2)")
              * col("rev").cast("decimal(18,2)")).cast("decimal(34,4)")
              .as("srr"))
        val nD = col("n_days").cast("double")
        val mean = col("sr").cast("double") / nD
        // moment-domain contract (r9): a single-day group has no sample
        // sd (n-1 = 0) and a zero-spread group no G — both NULL
        val sd = when(nD > 1.0, sqrt((col("srr").cast("double")
          - col("sr").cast("double") * col("sr").cast("double") / nD)
          ./(nD - lit(1.0))))
        val dev = daily.join(m, "prio")
          .withColumn("absdev", round(abs(col("rev") - mean), 6))
        val w = Window.partitionBy(col("prio"))
          .orderBy(col("absdev").desc, col("day").asc)
        dev.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .withColumn("sd_rev0", sd)
          .select(col("prio"), col("n_days"),
            round(mean, 4).as("mean_rev"),
            round(col("sd_rev0"), 4).as("sd_rev"),
            col("day").as("worst_day"),
            when(col("sd_rev0") > 0,
              round(col("absdev") / col("sd_rev0"), 6)).as("g_stat"))
          .orderBy(col("prio"))
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
            ${sqlMsum("o_totalprice")} AS rev
          FROM orders GROUP BY 1, 2),
        m AS (
          SELECT prio, count(*) AS n_days,
            CAST(sum(CAST(rev AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS sr,
            CAST(sum(CAST(rev AS DECIMAL(19,2)) * CAST(rev AS DECIMAL(18,2)))
              AS DECIMAL(34,4)) AS srr
          FROM daily GROUP BY 1),
        dev AS (
          SELECT d.prio, d.day, m.n_days,
            CAST(sr AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean,
            CASE WHEN n_days > 1 THEN
              sqrt((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)
                * CAST(sr AS DOUBLE) / CAST(n_days AS DOUBLE))
                / (CAST(n_days AS DOUBLE) - 1.0)) END AS sd,
            round(abs(d.rev - CAST(sr AS DOUBLE)
              / CAST(n_days AS DOUBLE)), 6) AS absdev
          FROM daily d JOIN m USING (prio)),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY prio
            ORDER BY absdev DESC, day) AS rk
          FROM dev)
        SELECT prio, n_days,
          round(mean, 4) AS mean_rev,
          round(sd, 4) AS sd_rev,
          day AS worst_day,
          CASE WHEN sd > 0 THEN round(absdev / sd, 6) END AS g_stat
        FROM ranked WHERE rk = 1
        ORDER BY prio""")),

    "q244_capture_recapture" -> Q(
      // Chapman capture-recapture estimate of the active purchasing
      // population from two adjacent DAILY samples — the ecology
      // estimator answering "how many buyers exist that neither day
      // saw": N̂ = (n₁+1)(n₂+1)/(m+1) − 1 per day pair, from exact
      // distinct-user sets (one keyed self-join of the bounded
      // day-user frame; a day's purchasers are a random ~40% sample
      // here, so the overlap genuinely varies). First 10 adjacent-day
      // pairs. (An md5-text variant across sources is the obvious
      // corpus twin — this fixture has ZERO exact cross-source
      // duplicates, so days are the honest capture unit.)
      build = (s, dir) => {
        val pu = table(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        val sizes = pu.groupBy(col("d")).agg(count(lit(1)).as("n"))
        val common = pu.as("x").join(pu.as("y"),
            col("x.user_id") === col("y.user_id")
              && col("y.d") === date_add(col("x.d"), 1))
          .groupBy(col("x.d").as("d1")).agg(count(lit(1)).as("m"))
        common
          .join(sizes.select(col("d").as("d1"), col("n").as("n1")), "d1")
          .join(sizes.select(date_sub(col("d"), 1).as("d1"),
            col("n").as("n2")), "d1")
          .withColumn("n_hat", round(
            (col("n1") + 1).cast("double") * (col("n2") + 1).cast("double")
              / (col("m") + 1).cast("double") - lit(1.0), 4))
          .select(col("d1").as("day"), col("n1"), col("n2"), col("m"),
            col("n_hat"))
          .orderBy(col("day"))
          .limit(10)
      },
      oracle = Some("""
        WITH pu AS (
          SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
          FROM events WHERE event_type = 'purchase'),
        sizes AS (SELECT d, count(*) AS n FROM pu GROUP BY 1),
        common AS (
          SELECT x.d AS d1, count(*) AS m
          FROM pu x JOIN pu y
            ON x.user_id = y.user_id AND y.d = x.d + 1
          GROUP BY 1)
        SELECT c.d1 AS day, a.n AS n1, b.n AS n2, m,
          round(CAST(a.n + 1 AS DOUBLE) * CAST(b.n + 1 AS DOUBLE)
            / CAST(m + 1 AS DOUBLE) - 1.0, 4) AS n_hat
        FROM common c
        JOIN sizes a ON a.d = c.d1
        JOIN sizes b ON b.d - 1 = c.d1
        ORDER BY day LIMIT 10""")),

    "q245_mcnemar" -> Q(
      // McNemar's paired test: did per-user big-purchase behavior
      // CHANGE between the first and second half of the observation
      // window? The paired-binary sibling of q240 — only the
      // DISCORDANT users (b converted early only, c late only) carry
      // information; χ² = (b−c)²/(b+c), 1-dof p via the A-S erfc of
      // √χ². Counts exact from one two-flag aggregation per user.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        // midpoint in DAY arithmetic — a to_timestamp/epoch split would
        // drag session-timezone semantics into the oracle compare
        val mid = ev.agg(min(to_date(col("ts"))).as("d0"),
            max(to_date(col("ts"))).as("d1"))
          .select(expr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))")
            .as("dmid"))
        val per = ev.crossJoin(broadcast(mid))
          .groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "purchase"
              && col("value") >= 150
              && to_date(col("ts")) <= col("dmid"), 1L).otherwise(0L))
              .as("early"),
            max(when(col("event_type") === "purchase"
              && col("value") >= 150
              && to_date(col("ts")) > col("dmid"), 1L).otherwise(0L))
              .as("late"))
        val m = per.agg(count(lit(1)).as("n_users"),
          sum(when(col("early") === 1 && col("late") === 0, 1L)
            .otherwise(0L)).as("b"),
          sum(when(col("early") === 0 && col("late") === 1, 1L)
            .otherwise(0L)).as("c"))
        val bD = col("b").cast("double")
        val cD = col("c").cast("double")
        val chi2 = (bD - cD) * (bD - cD) / (bD + cD)
        m.select(col("n_users"), col("b"), col("c"),
          when(col("b") + col("c") > 0, round(chi2, 6)).as("chi2"),
          when(col("b") + col("c") > 0, round(
            Hypothesis.normalTwoSidedP(sqrt(round(chi2, 6))), 10))
            .as("p_approx"))
      },
      oracle = Some(s"""
        WITH mid AS (
          SELECT min(CAST(ts AS DATE))
            + CAST(date_diff('day', min(CAST(ts AS DATE)),
                max(CAST(ts AS DATE))) // 2 AS INTEGER) AS dmid
          FROM events),
        per AS (
          SELECT user_id,
            max(CASE WHEN event_type = 'purchase' AND value >= 150
              AND CAST(ts AS DATE) <= dmid THEN 1 ELSE 0 END) AS early,
            max(CASE WHEN event_type = 'purchase' AND value >= 150
              AND CAST(ts AS DATE) > dmid THEN 1 ELSE 0 END) AS late
          FROM events CROSS JOIN mid
          GROUP BY 1),
        m AS (
          SELECT count(*) AS n_users,
            CAST(sum(CASE WHEN early = 1 AND late = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
            CAST(sum(CASE WHEN early = 0 AND late = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c
          FROM per)
        SELECT n_users, b, c,
          CASE WHEN b + c > 0 THEN
            round((CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
              * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
              / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)), 6) END AS chi2,
          CASE WHEN b + c > 0 THEN
            round(${Hypothesis.sqlNormalTwoSidedP(
              """sqrt(round((CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
              * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
              / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)), 6))""")}, 10)
          END AS p_approx
        FROM m""")),

    "q246_gains_table" -> Q(
      // Cumulative-gains / lift table: score users by click volume,
      // outcome = big purchase; decile by score (deterministic ties →
      // user id) and report per-decile capture, cumulative capture and
      // lift — the business-facing evaluation panel beside q95's AUC
      // (AUC says the score RANKS; the gains table says what the top
      // 10% BUYS). Counts exact; rates fixed-shape. Deciles come from
      // the bucketed distributed rank (PrefixSum.running — the per-user
      // frame is data-sized, so `ntile(10) OVER (ORDER BY ...)` would be
      // a single-partition sort of every user at 100 TB) plus the exact
      // integer ntile formula: with n rows, the first n%10 deciles hold
      // n div 10 + 1 users, the rest n div 10 — bit-identical to both
      // engines' ntile on the same total order (score desc, user asc).
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        val per = ev.groupBy(col("user_id"))
          .agg(sum((col("event_type") === "click").cast("long"))
            .as("score"),
            max(when(col("event_type") === "purchase"
              && col("value") >= 150, 1L).otherwise(0L)).as("pos"))
        val nRow = per.agg(count(lit(1)).as("nt0"))
        val dec = PrefixSum.running(per, "score", "user_id", "score",
            descending = true)
          .crossJoin(broadcast(nRow))
          .withColumn("decile", expr("""CAST(CASE
            WHEN rnk <= (nt0 % 10) * (nt0 div 10 + 1)
            THEN (rnk - 1) div (nt0 div 10 + 1) + 1
            ELSE (nt0 % 10)
              + (rnk - 1 - (nt0 % 10) * (nt0 div 10 + 1)) div (nt0 div 10)
              + 1 END AS BIGINT)"""))
        val g = dec.groupBy(col("decile"))
          .agg(count(lit(1)).as("n_users"), sum(col("pos")).as("n_pos"))
        val tot = g.agg(sum(col("n_users")).as("nt"),
          sum(col("n_pos")).as("pt"))
        val wCum = Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        g.crossJoin(broadcast(tot))
          .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
          .select(col("decile"), col("n_users"), col("n_pos"),
            round(col("cum_pos").cast("double")
              / col("pt").cast("double"), 6).as("cum_capture"),
            round((col("n_pos").cast("double")
                / col("n_users").cast("double"))
              / (col("pt").cast("double") / col("nt").cast("double")), 6)
              .as("lift"))
          .orderBy(col("decile"))
      },
      oracle = Some("""
        WITH per AS (
          SELECT user_id,
            CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS score,
            max(CASE WHEN event_type = 'purchase' AND value >= 150
              THEN 1 ELSE 0 END) AS pos
          FROM events GROUP BY 1),
        dec AS (
          SELECT *, ntile(10) OVER (ORDER BY score DESC, user_id)
            AS decile
          FROM per),
        g AS (
          SELECT decile, count(*) AS n_users,
            CAST(sum(pos) AS BIGINT) AS n_pos
          FROM dec GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n_users) AS BIGINT) AS nt,
            CAST(sum(n_pos) AS BIGINT) AS pt
          FROM g)
        SELECT decile, n_users, n_pos,
          round(CAST(sum(n_pos) OVER (ORDER BY decile
              ROWS UNBOUNDED PRECEDING) AS DOUBLE)
            / CAST(pt AS DOUBLE), 6) AS cum_capture,
          round((CAST(n_pos AS DOUBLE) / CAST(n_users AS DOUBLE))
            / (CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE)), 6) AS lift
        FROM g CROSS JOIN tot
        ORDER BY decile""")),
  )
}
