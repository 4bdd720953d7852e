package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Stable._
import graft.operators._

/** Catalog part 1 of 7: queries q01..q93, in original catalog
  * order ([[Queries.all]] concatenates the parts — split from the former
  * single-file catalog purely for compile/review ergonomics; content and
  * order are unchanged).
  */
private[graft] trait Catalog1 extends CatalogBase {
  protected val entries1: Seq[(String, Q)] = Seq(

    // ------------------------------------------------------------------
    // A-class: aggregation / profiling (SURVEY §2.4)
    // ------------------------------------------------------------------

    "q01_pricing_summary" -> Q(
      build = (s, dir) => {
        val cutoff = lit("1998-09-02").cast("timestamp")
        // No fan-out here, deliberately (r13): A/B-measured at sf0.1
        // (min-of-7, idle box) — scan-rooted partial aggregation 1.00 s
        // vs 1.05 s with a pre-agg fan-out exchange. The decimal partial
        // agg is as cheap as the exchange's single-task shuffle write,
        // so the map-side-combine-first plan stays exchange-free (the
        // 100 TB-correct shape) — contrast q08, where the fanned stage
        // carries a join probe and measured 2x.
        table(s, dir, "lineitem")
          .filter(col("l_shipdate") <= cutoff)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            msum(col("l_quantity")).as("sum_qty"),
            msum(col("l_extendedprice")).as("sum_base_price"),
            m2(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("sum_disc_price"),
            m2(sum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax")))).as("sum_charge"),
            mavg(col("l_quantity")).as("avg_qty"),
            mavg(col("l_extendedprice")).as("avg_price"),
            mavg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      oracle = Some(s"""
        SELECT l_returnflag, l_linestatus,
          ${sqlMsum("l_quantity")} AS sum_qty,
          ${sqlMsum("l_extendedprice")} AS sum_base_price,
          ${sqlM2Sum(revSql)} AS sum_disc_price,
          ${sqlM2Sum(chargeSql)} AS sum_charge,
          ${sqlMavg("l_quantity")} AS avg_qty,
          ${sqlMavg("l_extendedprice")} AS avg_price,
          ${sqlMavg("l_discount")} AS avg_disc,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      bench = true),

    "q02_revenue_by_nation" -> Q(
      build = (s, dir) => {
        // Star join: fact side streams, dims broadcast — no fact shuffle
        // before the aggregate.
        val o = table(s, dir, "orders")
        val c = table(s, dir, "customer")
        val n = table(s, dir, "nation")
        val r = table(s, dir, "region")
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            msum(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"),
            countDistinct(col("o_custkey")).as("n_custs"))
          .orderBy(col("r_name"), col("n_name"))
      },
      oracle = Some(revenueByNationOracle),
      bench = true),

    "q03_filtered_revenue" -> Q(
      build = (s, dir) =>
        table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
                  col("l_discount").between(0.03, 0.07) &&
                  col("l_quantity") < 24)
          .agg(
            m2(sum(dec(col("l_extendedprice")) * rate(col("l_discount")))).as("promo_revenue"),
            count(lit(1)).as("n_rows")),
      oracle = Some(s"""
        SELECT
          ${sqlM2Sum("CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))")} AS promo_revenue,
          count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24"""),
      bench = true),

    "q04_null_profile" -> Q(
      build = (s, dir) => Profiling.nullCounts(table(s, dir, "lineitem")),
      oracle = Some {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate")
        val exprs = cols.map(c => s"count(*) - count($c) AS $c").mkString(", ")
        s"SELECT $exprs FROM lineitem"
      }),

    "q05_duplicate_rows" -> Q(
      build = (s, dir) => Profiling.duplicateCount(table(s, dir, "lineitem")),
      oracle = Some("""
        SELECT (SELECT count(*) FROM lineitem)
             - (SELECT count(*) FROM (SELECT DISTINCT * FROM lineitem)) AS dup_rows""")),

    "q06_value_share" -> Q(
      build = (s, dir) => Profiling.valueCounts(table(s, dir, "orders"), "o_orderpriority"),
      oracle = Some("""
        SELECT o_orderpriority, count(*) AS cnt,
          round(count(*) / sum(count(*)) OVER (), 6) AS share
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY cnt DESC, o_orderpriority""")),

    "q07_categorical_encode" -> Q(
      // Sentinel cleanup + explicit code mapping (SURVEY §2.3 P4/P5/P6):
      // pure `when`/`cast` expressions — unmapped values become NULL, like
      // pandas `.map` — no UDF.
      build = (s, dir) =>
        // try_cast: pandas-map semantics for malformed codes (an empty
        // priority string yields NULL, not an ANSI cast error) — the
        // same contract LoanTransforms.cleanDependents states
        table(s, dir, "orders")
          .withColumn("priority_num",
            substring(col("o_orderpriority"), 1, 1).try_cast("int"))
          .withColumn("status_code",
            when(col("o_orderstatus") === "F", 1)
              .when(col("o_orderstatus") === "O", 0)
              .otherwise(lit(null).cast("int")))
          .groupBy(col("priority_num"), col("status_code"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("priority_num"), col("status_code").asc_nulls_last),
      oracle = Some("""
        SELECT TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS priority_num,
          CASE WHEN o_orderstatus = 'F' THEN 1
               WHEN o_orderstatus = 'O' THEN 0
               ELSE NULL END AS status_code,
          count(*) AS cnt
        FROM orders
        GROUP BY 1, 2
        ORDER BY priority_num, status_code ASC NULLS LAST""")),

    "q08_brand_revenue" -> Q(
      build = (s, dir) => {
        // fan-out the broadcast-join PROBE side (same rationale as q01 —
        // the join probe + partial agg otherwise run on the 1-row-group
        // scan's single task; no-op at scale per Par.fanOut)
        val li = graft.operators.Par.fanOut(
          table(s, dir, "lineitem").select(col("l_partkey"),
            col("l_extendedprice"), col("l_discount"), col("l_quantity")),
          "l_partkey")
        val p = table(s, dir, "part")
        li.join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            m2(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"),
            msum(col("l_quantity")).as("total_qty"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("p_brand"))
      },
      oracle = Some(s"""
        SELECT p_brand,
          ${sqlM2Sum(revSql)} AS revenue,
          ${sqlMsum("l_quantity")} AS total_qty,
          count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand"""),
      bench = true),

    // ------------------------------------------------------------------
    // Sorts / top-k / windows (SURVEY §2.5 + engine extensions)
    // ------------------------------------------------------------------

    "q09_topk_orders" -> Q(
      // orderBy+limit compiles to TakeOrderedAndProject: per-partition
      // top-k then a k-row merge on the driver — no global sort at scale.
      build = (s, dir) =>
        table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      oracle = Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10"""),
      bench = true),

    "q10_top_order_per_customer" -> Q(
      build = (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        table(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"))
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn = 1
        ORDER BY o_custkey""")),

    "q11_running_revenue" -> Q(
      build = (s, dir) => {
        // ORDER must be total over value-bearing columns too: the generated
        // data reuses (orderkey, linenumber), and at sf0.1 one tie group
        // carries different prices — an engine-dependent cumsum otherwise
        // (caught by the sf0.1 oracle sweep, invisible at sf0.01)
        val order = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"), col("l_discount"))
        table(s, dir, "lineitem")
          .withColumn("running_rev",
            m2(sum(revenue(col("l_extendedprice"), col("l_discount")))
              .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_rev"))
          .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      },
      oracle = Some(s"""
        SELECT l_suppkey, l_orderkey, l_linenumber,
          CAST(round(sum($revSql) OVER (PARTITION BY l_suppkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_discount
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_rev
        FROM lineitem
        ORDER BY l_suppkey, l_orderkey, l_linenumber"""),
      bench = true),

    // ------------------------------------------------------------------
    // Joins beyond inner: semi / anti / set ops
    // ------------------------------------------------------------------

    "q12_semi_join" -> Q(
      build = (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("c_mktsegment"))
      },
      oracle = Some("""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    "q13_anti_join" -> Q(
      build = (s, dir) => {
        val c = table(s, dir, "customer")
        val urgent = table(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("c_mktsegment"))
      },
      oracle = Some("""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    "q14_union_distinct" -> Q(
      build = (s, dir) => {
        val c = table(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val sp = table(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.union(sp).distinct().orderBy(col("nationkey"))
      },
      oracle = Some("""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
        ORDER BY nationkey""")),

    "q15_except" -> Q(
      // Customers who ordered, minus customers who ever ordered URGENT —
      // stays non-empty at every scale factor (unlike set differences over
      // fully-covered key domains).
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        o.select(col("o_custkey").as("custkey"))
          .except(o.filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey").as("custkey")))
          .orderBy(col("custkey"))
      },
      oracle = Some("""
        SELECT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY custkey""")),

    // ------------------------------------------------------------------
    // Event log: time bucketing, JSON extraction, sessionization
    // ------------------------------------------------------------------

    "q15b_intersect" -> Q(
      // Nations having BOTH customers and suppliers — completes the set-op
      // family (union q14 / except q15 / intersect here).
      build = (s, dir) => {
        val c = table(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val sp = table(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.intersect(sp).orderBy(col("nationkey"))
      },
      oracle = Some("""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
        ORDER BY nationkey""")),

    "q16_events_hourly" -> Q(
      build = (s, dir) => ntzOut(
        table(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            msum(col("value")).as("total_value"))
          .orderBy(col("hour"), col("event_type"))),
      oracle = Some(s"""
        SELECT date_trunc('hour', ts) AS hour, event_type,
          count(*) AS n_events,
          ${sqlMsum("value")} AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY hour, event_type"""),
      bench = true),

    "q17_json_extract" -> Q(
      build = (s, dir) =>
        table(s, dir, "events")
          // try_cast: a syntactically-valid payload whose k is not an
          // integer must degrade to NULL like the malformed-JSON case
          // (ANSI cast would kill the job); get_json_object itself
          // already NULLs malformed JSON
          .withColumn("k",
            expr("try_cast(get_json_object(props, '$.k') AS INT)"))
          .groupBy(col("event_type"))
          .agg(
            count(col("k")).as("n_k"),
            sum(col("k")).as("sum_k"),
            (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
          .orderBy(col("event_type")),
      oracle = Some("""
        WITH j AS (
          -- malformed payloads extract to NULL, mirroring Spark's
          -- get_json_object (DuckDB's json_extract_string THROWS on
          -- malformed input without the json_valid guard)
          SELECT event_type,
            CASE WHEN json_valid(props)
              THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
            END AS k
          FROM events)
        SELECT event_type,
          count(k) AS n_k,
          CAST(sum(k) AS BIGINT) AS sum_k,
          CAST(sum(k) AS DOUBLE) / count(k) AS avg_k
        FROM j
        GROUP BY event_type
        ORDER BY event_type""")),

    "q18_sessionize" -> Q(
      build = (s, dir) => ntzOut {
        val sess = Sessionize.sessions(table(s, dir, "events"),
          "user_id", "ts", "event_id", gapSeconds = 1800L)
        sess.withColumn("session_seq", col("session_seq").cast("long"))
      },
      oracle = Some("""
        WITH lagged AS (
          SELECT user_id, event_id, ts,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events),
        flagged AS (
          SELECT user_id, event_id, ts,
            CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS new_sess
          FROM lagged),
        numbered AS (
          SELECT user_id, ts,
            CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
          FROM flagged)
        SELECT user_id, session_seq, count(*) AS n_events,
          min(ts) AS session_start, max(ts) AS session_end
        FROM numbered
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq"""),
      bench = true),

    // ------------------------------------------------------------------
    // Deterministic statistics (SURVEY §2.4 A7-A9 analogs)
    // ------------------------------------------------------------------

    "q19_stats_summary" -> Q(
      // Moments from exact decimal sums -> deterministic; spread via the
      // textbook identity on stable doubles -> identical IEEE ops in both
      // engines. Median/quartiles use exact percentile (both engines
      // interpolate type-7).
      build = (s, dir) => {
        val q = col("l_quantity")
        val sumQ = m2(sum(dec(q)))
        val sumSq = round(sum(rate(q) * rate(q)), 4).cast("double")
        val n = count(q)
        // moment-domain contract (r9 hostile relational sweep): a group
        // with zero observations has no mean, one observation no sample
        // std (n-1 = 0) — both are NULL, never an ANSI divide-by-zero
        table(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            n.as("n"),
            when(n > 0, sumQ / n).as("mean_qty"),
            when(n > 1,
              sqrt((sumSq - sumQ * sumQ / n) / (n - 1))).as("std_qty"),
            expr("percentile(l_quantity, 0.25D)").as("p25"),
            expr("percentile(l_quantity, 0.5D)").as("median"),
            expr("percentile(l_quantity, 0.75D)").as("p75"),
            min(q).as("min_qty"),
            max(q).as("max_qty"))
          .orderBy(col("l_returnflag"))
      },
      oracle = Some(s"""
        SELECT l_returnflag,
          count(l_quantity) AS n,
          CASE WHEN count(l_quantity) > 0
            THEN ${sqlMsum("l_quantity")} / count(l_quantity) END AS mean_qty,
          CASE WHEN count(l_quantity) > 1 THEN
          sqrt((CAST(round(sum(CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2))), 4) AS DOUBLE)
                - ${sqlMsum("l_quantity")} * ${sqlMsum("l_quantity")} / count(l_quantity))
               / (count(l_quantity) - 1)) END AS std_qty,
          quantile_cont(l_quantity, 0.25) AS p25,
          quantile_cont(l_quantity, 0.5) AS median,
          quantile_cont(l_quantity, 0.75) AS p75,
          min(l_quantity) AS min_qty,
          max(l_quantity) AS max_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    "q20_mode" -> Q(
      build = (s, dir) => Profiling.mode(table(s, dir, "orders"), "o_orderpriority"),
      oracle = Some("""
        SELECT o_orderpriority
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY count(*) DESC, o_orderpriority
        LIMIT 1""")),

    // ------------------------------------------------------------------
    // LLM-data pipeline: dedup, text analysis, similarity
    // ------------------------------------------------------------------

    "q21_exact_dedup_stats" -> Q(
      build = (s, dir) =>
        table(s, dir, "documents")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(TextStats.contentKey(col("text"))).as("n_unique"))
          .orderBy(col("source")),
      oracle = Some("""
        SELECT source, count(*) AS n_docs,
          count(DISTINCT md5(text)) AS n_unique
        FROM documents
        GROUP BY source
        ORDER BY source""")),

    "q22_exact_dedup_keep_first" -> Q(
      // Dedup policy "keep lowest id per content key": one hash aggregation
      // on the 128-bit digest; survivors stream back out. At 100 TB the
      // shuffle carries (digest, id), not document bodies.
      build = (s, dir) =>
        table(s, dir, "documents")
          .groupBy(TextStats.contentKey(col("text")).as("h"))
          .agg(min(col("doc_id")).as("keep_id"))
          .select(col("keep_id"))
          .orderBy(col("keep_id")),
      oracle = Some("""
        SELECT min(doc_id) AS keep_id
        FROM documents
        GROUP BY md5(text)
        ORDER BY keep_id""")),

    "q23_token_stats" -> Q(
      build = (s, dir) =>
        table(s, dir, "documents")
          .withColumn("tok", TextStats.tokenCount(col("text")))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("tok")).as("total_tokens"),
            (sum(col("tok")).cast("double") / count(lit(1))).as("avg_tokens"))
          .orderBy(col("lang")),
      oracle = Some("""
        SELECT lang, count(*) AS n_docs,
          CAST(sum(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'))) AS BIGINT) AS total_tokens,
          CAST(sum(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'))) AS DOUBLE) / count(*) AS avg_tokens
        FROM documents
        GROUP BY lang
        ORDER BY lang"""),
      bench = true),

    "q24_quality_signals" -> Q(
      build = (s, dir) =>
        TextStats.withQualitySignals(table(s, dir, "documents"), "text")
          .select(col("doc_id"), col("q_chars"), col("q_tokens"), col("q_punct"),
            col("avg_token_len"), col("punct_ratio"), col("stopword_ratio"))
          .orderBy(col("doc_id")),
      oracle = Some(s"""
        SELECT doc_id,
          length(text) AS q_chars,
          len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS q_tokens,
          length(regexp_replace(text, '[^.!?]', '', 'g')) AS q_punct,
          CAST(length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g')) AS DOUBLE)
            / NULLIF(len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')), 0) AS avg_token_len,
          CAST(length(regexp_replace(text, '[^.!?]', '', 'g')) AS DOUBLE)
            / NULLIF(length(text), 0) AS punct_ratio,
          CAST(${TextStats.sqlStopwordCount("text")} AS DOUBLE)
            / NULLIF(len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')), 0) AS stopword_ratio
        FROM documents
        ORDER BY doc_id""")),

    "q25_knn_bruteforce" -> Q(
      build = (s, dir) => {
        val e = emb(s, dir)
        Vectors.bruteForceKnn(e.filter(col("vec_id") < 20), e, "vec_id", "embedding", k = 3)
      },
      oracle = Some(s"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
          WHERE $sqlEmbValid),
        sims AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            list_dot_product(q.emb, c.emb)
              / (sqrt(list_dot_product(q.emb, q.emb)) * sqrt(list_dot_product(c.emb, c.emb))) AS sim
          FROM v q JOIN v c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id, sim,
            row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
          FROM sims)
        SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, sim
        FROM ranked
        WHERE rank <= 3
        ORDER BY query_id, rank"""),
      bench = true),

    "q26_label_cohesion" -> Q(
      // Within-label mean pairwise cosine: an O(n²/groups) self-join whose
      // mean is made combine-order-independent by snapping each similarity
      // to 8 exact decimals before the sum (Stable.davg).
      build = (s, dir) => {
        val e = emb(s, dir)
        val a = e.select(col("label"), col("vec_id").as("id_a"),
          Vectors.asDouble(col("embedding")).as("va"))
        val b = e.select(col("label").as("label_b"), col("vec_id").as("id_b"),
          Vectors.asDouble(col("embedding")).as("vb"))
        a.join(b, col("label") === col("label_b") && col("id_a") < col("id_b"))
          .withColumn("sim", Vectors.cosine(col("va"), col("vb")))
          .groupBy(col("label"))
          .agg(
            count(lit(1)).as("n_pairs"),
            davg(col("sim")).as("avg_sim"))
          .orderBy(col("label"))
      },
      oracle = Some(s"""
        WITH v AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
          WHERE $sqlEmbValid),
        pairs AS (
          SELECT a.label AS label,
            list_dot_product(a.emb, b.emb)
              / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS sim
          FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
        SELECT label, count(*) AS n_pairs, ${sqlDavg("sim")} AS avg_sim
        FROM pairs
        GROUP BY label
        ORDER BY label""")),

    // ------------------------------------------------------------------
    // Near-duplicate detection (shingle / MinHash-LSH / SimHash)
    // ------------------------------------------------------------------

    "q27_ngram_jaccard_pairs" -> Q(
      build = (s, dir) =>
        NearDup.jaccardPairs(table(s, dir, "documents"), "doc_id", "text",
            n = 3, minJ = 0.6)
          .orderBy(col("id_a"), col("id_b")),
      oracle = Some(ngramJaccardOracle)),

    "q28_minhash_lsh_pairs" -> Q(
      // Same verified output as q27, discovered the linear-cost way:
      // shingle -> 192-hash MinHash signature -> 64 banded buckets (r=3) ->
      // verify only bucket collisions. Shares q27's oracle: at J >= 0.6 the
      // per-pair miss probability is (1-J^3)^64 < 2e-7, i.e. exact.
      build = (s, dir) =>
        NearDup.minhashNearDupPairs(table(s, dir, "documents"), "doc_id", "text",
            n = 3, minJ = 0.6, numHashes = 192, bandRows = 3)
          .orderBy(col("id_a"), col("id_b")),
      oracle = Some(ngramJaccardOracle),
      bench = true),

    "q29_simhash" -> Q(
      build = (s, dir) =>
        table(s, dir, "documents")
          .select(col("doc_id"), TextHash.simhash(col("text")).as("simhash"))
          .orderBy(col("doc_id")),
      oracle = Some(s"""
        WITH $simhashCtes
        -- LEFT JOIN keeps NULL-text documents (their token list unnests to
        -- nothing, so sk has no row): the operator is total over the
        -- corpus and a contentless doc sketches to NULL on both engines
        SELECT d.doc_id, sk.simhash
        FROM documents d LEFT JOIN sk ON sk.doc_id = d.doc_id
        ORDER BY d.doc_id"""),
      bench = true),

    "q30_embedding_near_dup" -> Q(
      // Embedding near-dup report, top-50 pairs >= 0.4 — via the 100 TB
      // plan: LSH bucket candidates -> exact cosine verify (no cross join
      // anywhere; Vectors.cosineNearDupPairs is the O(n²) twin kept for
      // verification). At the default (planes, tables) the candidate set
      // contains every >=0.4 pair on the testdata geometry (TuneAnn sweep,
      // SimilaritySpec), so the oracle is the same exact-pairs SQL.
      build = (s, dir) =>
        Similarity.lshNearDupPairs(emb(s, dir), "vec_id",
            "embedding", minSim = 0.4)
          .orderBy(col("sim").desc, col("id_a"), col("id_b"))
          .limit(50),
      oracle = Some(s"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
          WHERE $sqlEmbValid),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            list_dot_product(a.emb, b.emb)
              / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS sim
          FROM v a JOIN v b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b, sim FROM pairs
        WHERE sim >= 0.4
        ORDER BY sim DESC, id_a, id_b
        LIMIT 50"""),
      // stress tier (r12 ask #4): the documented no-prune regime — a
      // 0.4 threshold over near-uniform random vectors has no selective
      // structure, so this row deliberately measures the dense-verify
      // floor. At sf1 it alone was 71% of the headline decade leg and
      // its variance swamped the other 48 queries' signal; it now times
      // under SPARK_GRAFT_BENCH_STRESS=only into its own pinned
      // artifact (exponent exemption unchanged).
      bench = true, stress = true),

    // ------------------------------------------------------------------
    // Text analysis: language id, fingerprints, BPE-ish token accounting
    // ------------------------------------------------------------------

    "q31_langid" -> Q(
      build = (s, dir) =>
        table(s, dir, "documents")
          .groupBy(col("lang"), LangId.predicted(col("text")).as("lang_pred"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"), col("lang_pred")),
      oracle = Some(s"""
        SELECT lang, ${LangId.sqlPredicted("text")} AS lang_pred, count(*) AS n_docs
        FROM documents
        GROUP BY 1, 2
        ORDER BY lang, lang_pred""")),

    "q32_fingerprint" -> Q(
      build = (s, dir) =>
        table(s, dir, "documents")
          .select(col("doc_id"),
            TextHash.polyHash(col("text")).as("doc_hash"),
            TextHash.minGramHash(col("text"), 8).as("min_gram_hash"))
          .orderBy(col("doc_id")),
      oracle = Some(s"""
        SELECT doc_id,
          ${TextHash.sqlPolyHash("text")} AS doc_hash,
          ${TextHash.sqlMinGramHash("text", 8)} AS min_gram_hash
        FROM documents
        ORDER BY doc_id"""),
      bench = true),

    "q33_bpe_tokens" -> Q(
      build = (s, dir) =>
        table(s, dir, "documents")
          .withColumn("bpe", TextStats.bpeTokenCount(col("text")))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("bpe")).as("total_bpe_tokens"),
            (sum(col("bpe")).cast("double") / count(lit(1))).as("avg_bpe_tokens"))
          .orderBy(col("lang")),
      oracle = Some(s"""
        SELECT lang, count(*) AS n_docs,
          CAST(sum(len(regexp_extract_all(text, ${TextStats.sqlBpePattern}, 0))) AS BIGINT) AS total_bpe_tokens,
          CAST(sum(len(regexp_extract_all(text, ${TextStats.sqlBpePattern}, 0))) AS DOUBLE) / count(*) AS avg_bpe_tokens
        FROM documents
        GROUP BY lang
        ORDER BY lang""")),

    // ------------------------------------------------------------------
    // Approximate nearest neighbor (LSH scale path). The oracle is the
    // brute-force top-k SQL (same as q25): the LSH hashing itself is not
    // SQL-expressible, but at the tuned (planes, tables) the candidate
    // buckets provably contain every true top-3 neighbor on the testdata
    // geometry (per-pair miss bound < 0.5% at the worst observed top-3
    // cosine, and the deterministic outcome is exact at sf0.001/0.01/0.1
    // — tools/TuneAnn), so ANN top-k EQUALS brute force and the exact
    // oracle applies.
    // ------------------------------------------------------------------

    "q34_ann_lsh" -> Q(
      build = (s, dir) => {
        val e = emb(s, dir)
        Similarity.annTopK(e.filter(col("vec_id") < 20), e, "vec_id",
            "embedding", k = 3)
          .orderBy(col("query_id"), col("rank"))
      },
      oracle = Some(s"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
          WHERE $sqlEmbValid),
        sims AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            list_dot_product(q.emb, c.emb)
              / (sqrt(list_dot_product(q.emb, q.emb)) * sqrt(list_dot_product(c.emb, c.emb))) AS sim
          FROM v q JOIN v c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id, sim,
            row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
          FROM sims)
        SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, sim
        FROM ranked
        WHERE rank <= 3
        ORDER BY query_id, rank"""),
      bench = true),

    "q35_near_dup_survivors" -> Q(
      // The dedup operation itself: keep the smallest doc_id of every
      // near-dup clique (LSH-discovered, exactly verified), drop the rest.
      build = (s, dir) => {
        val docs = table(s, dir, "documents")
        val pairs = NearDup.minhashNearDupPairs(docs, "doc_id", "text",
          n = 3, minJ = 0.6, numHashes = 192, bandRows = 3)
        NearDup.nearDupSurvivors(docs, pairs, "doc_id")
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(s"""
        WITH $ngramPairCtes
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT id_b FROM pairs WHERE jaccard >= 0.6)
        ORDER BY doc_id"""),
      bench = true),

    "q36_label_centroids" -> Q(
      // Per-label centroid of the embedding column, one row per (label,
      // dimension): posexplode -> stable decimal mean. The explode keeps
      // the aggregation a plain codegen'd hash agg (no array HOFs) and the
      // shuffle carries (label, pos, value) triples.
      build = (s, dir) =>
        emb(s, dir)
          .select(col("label"), posexplode(Vectors.asDouble(col("embedding")))
            .as(Seq("pos", "v")))
          .groupBy(col("label"), (col("pos") + 1).as("dim"))
          .agg(davg(col("v")).as("centroid"), count(lit(1)).as("n"))
          .orderBy(col("label"), col("dim")),
      oracle = Some(s"""
        WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
          WHERE $sqlEmbValid),
        flat AS (
          SELECT label, i AS dim, emb[i] AS val
          FROM v, unnest(generate_series(1, len(emb))) t(i))
        SELECT label, CAST(dim AS BIGINT) AS dim,
          ${sqlDavg("val")} AS centroid, count(*) AS n
        FROM flat
        GROUP BY label, dim
        ORDER BY label, dim""")),

    "q37_rollup_revenue" -> Q(
      // Hierarchical totals region -> nation -> grand total in one pass
      // (ROLLUP = partial aggregation reused across levels, no re-scan).
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val c = table(s, dir, "customer")
        val n = table(s, dir, "nation")
        val r = table(s, dir, "region")
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(
            msum(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"),
            grouping_id().as("gid"))
          .orderBy(col("gid"), col("r_name").asc_nulls_first,
            col("n_name").asc_nulls_first)
      },
      oracle = Some(s"""
        SELECT r_name, n_name,
          ${sqlMsum("o_totalprice")} AS revenue,
          count(*) AS n_orders,
          CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""),
      bench = true),

    "q38_correlated_subquery" -> Q(
      // Orders priced 1.5x above their customer's (stable-decimal) average
      // — a correlated scalar subquery, which Catalyst decorrelates into
      // an aggregate + join automatically; SQL surface + DataFrame surface
      // coexist over the same session catalog.
      build = (s, dir) => {
        table(s, dir, "orders").createOrReplaceTempView("orders_q38")
        s.sql("""
          SELECT o_orderkey, o_custkey, o_totalprice
          FROM orders_q38 o
          WHERE o_totalprice > (
            SELECT 1.5D * (CAST(round(sum(CAST(o2.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                           / count(*))
            FROM orders_q38 o2
            WHERE o2.o_custkey = o.o_custkey)
          ORDER BY o_orderkey""")
      },
      oracle = Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (
          SELECT 1.5 * (CAST(round(sum(CAST(o2.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                        / count(*))
          FROM orders o2
          WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")),

    "q39_asof_attribution" -> Q(
      // Attribution: each purchase joined to the user's latest prior (or
      // simultaneous) click — AsOfJoin's union+window formulation vs
      // DuckDB's native ASOF JOIN.
      build = (s, dir) => ntzOut {
        val ev = table(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        // pre-dedup to one click per (user_id, ts): when several clicks
        // share the as-of timestamp, AsOfJoin and DuckDB ASOF JOIN are both
        // free to pick any of them — collapsing ties to max(event_id) makes
        // the attribution well-defined on BOTH engines
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts").as("click_ts"))
          .agg(max(col("event_id")).as("click_id"))
          .select(col("user_id"), col("click_id"), col("click_ts"))
        // null-free output: NaT/NaN compare as unequal in float/datetime
        // comparators, so unmatched purchases carry sentinels on BOTH sides
        AsOfJoin.asOf(purchases, clicks, Seq("user_id"), "ts", "click_ts",
            Seq("click_id", "click_ts"))
          .select(col("event_id"), col("user_id"),
            coalesce(col("click_id"), lit(-1L)).as("click_id"),
            coalesce(col("click_ts"), lit("1970-01-01").cast("timestamp")).as("click_ts"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        WITH p AS (
          SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, max(event_id) AS click_id, ts AS click_ts
          FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        SELECT p.event_id, p.user_id,
          coalesce(c.click_id, -1) AS click_id,
          coalesce(c.click_ts, TIMESTAMP '1970-01-01') AS click_ts
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
        ORDER BY p.event_id"""),
      bench = true),

    "q40_pivot_status" -> Q(
      // Cross-tab (pandas crosstab / A5 analog): order counts by priority
      // x status. Explicit pivot values keep the schema static — required
      // for a deterministic plan (no value-discovery job at scale).
      build = (s, dir) =>
        table(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("n_f"),
            coalesce(col("O"), lit(0L)).as("n_o"),
            coalesce(col("P"), lit(0L)).as("n_p"))
          .orderBy(col("o_orderpriority")),
      oracle = Some("""
        SELECT o_orderpriority,
          count(*) FILTER (o_orderstatus = 'F') AS n_f,
          count(*) FILTER (o_orderstatus = 'O') AS n_o,
          count(*) FILTER (o_orderstatus = 'P') AS n_p
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    "q41_monthly_delta" -> Q(
      // Month-over-month revenue via lag. The window is unpartitioned by
      // design: it runs AFTER aggregation on bounded-cardinality data
      // (one row per month), where a single-partition window is correct
      // and cheap at any corpus scale. Null-free output (first month's
      // prev coalesces to 0 on both engines).
      build = (s, dir) => ntzOut {
        val monthly = table(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(msum(col("o_totalprice")).as("revenue"))
        val byMonth = Window.orderBy(col("month"))
        monthly
          .withColumn("prev_revenue", coalesce(lag(col("revenue"), 1).over(byMonth), lit(0.0)))
          .withColumn("delta", col("revenue") - col("prev_revenue"))
          .orderBy(col("month"))
      },
      oracle = Some(s"""
        WITH monthly AS (
          SELECT date_trunc('month', o_orderdate) AS month,
            ${sqlMsum("o_totalprice")} AS revenue
          FROM orders GROUP BY 1)
        SELECT month, revenue,
          coalesce(lag(revenue, 1) OVER (ORDER BY month), 0.0) AS prev_revenue,
          revenue - coalesce(lag(revenue, 1) OVER (ORDER BY month), 0.0) AS delta
        FROM monthly
        ORDER BY month""")),

    "q42_cube_counts" -> Q(
      // Full CUBE over (status, priority): all four grouping levels in one
      // pass, ordered by grouping id for a deterministic layout.
      build = (s, dir) =>
        table(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
          .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      oracle = Some("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    "q43_langid_trigrams" -> Q(
      // Char-trigram profile language id (the n-gram flavor of q31's
      // marker-word heuristic) — substring-occurrence scoring via the
      // replace-length identity, exactly reproducible cross-engine.
      build = (s, dir) =>
        table(s, dir, "documents")
          .groupBy(col("lang"), LangId.predictedByTrigrams(col("text")).as("lang_pred"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"), col("lang_pred")),
      oracle = Some(s"""
        SELECT lang, ${LangId.sqlPredictedByTrigrams("text")} AS lang_pred,
          count(*) AS n_docs
        FROM documents
        GROUP BY 1, 2
        ORDER BY lang, lang_pred""")),

    "q44_describe" -> Q(
      // pandas describe() in long form over the lineitem measures — the
      // full count/mean/std/min/25/50/75/max panel in one melt + one
      // aggregation pass regardless of column count.
      build = (s, dir) =>
        Profiling.describe(table(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
      oracle = Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val selects = cols.map { c =>
          val v = s"CAST($c AS DOUBLE)"
          s"""SELECT '$c' AS col_name, count($v) AS n,
             |  ${sqlDavg(v)} AS mean,
             |  round(sqrt(GREATEST(0.0, (${sqlDsumsq(v)} - ${sqlDsum(v)} * ${sqlDsum(v)} / count($v))
             |       / (count($v) - 1))), 4) AS std,
             |  min($v) AS min_v,
             |  quantile_cont($v, 0.25) AS p25,
             |  quantile_cont($v, 0.5) AS median,
             |  quantile_cont($v, 0.75) AS p75,
             |  max($v) AS max_v
             |FROM lineitem""".stripMargin
        }
        selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }),

    "q45_session_funnel" -> Q(
      // Conversion funnel over gap sessions: of all user sessions, how
      // many contain a purchase / an error, and the conversion rate —
      // session assignment reused from the q18 machinery, then two
      // bounded aggregations.
      build = (s, dir) => {
        val tagged = Sessionize.withSessionSeq(table(s, dir, "events"),
          "user_id", "ts", "event_id", gapSeconds = 1800L)
        tagged
          .groupBy(col("user_id"), col("session_seq"))
          .agg(
            max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"),
            max(when(col("event_type") === "error", 1).otherwise(0)).as("errored"))
          .agg(
            count(lit(1)).as("n_sessions"),
            sum(col("converted")).as("n_converted"),
            sum(col("errored")).as("n_errored"),
            (sum(col("converted")).cast("double") / count(lit(1))).as("conversion_rate"))
      },
      oracle = Some("""
        WITH lagged AS (
          SELECT user_id, event_id, ts, event_type,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events),
        flagged AS (
          SELECT user_id, event_type,
            CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS new_sess,
            ts, event_id
          FROM lagged),
        numbered AS (
          SELECT user_id, event_type,
            sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM flagged),
        per_session AS (
          SELECT user_id, session_seq,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
            max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errored
          FROM numbered
          GROUP BY user_id, session_seq)
        SELECT count(*) AS n_sessions,
          CAST(sum(converted) AS BIGINT) AS n_converted,
          CAST(sum(errored) AS BIGINT) AS n_errored,
          CAST(sum(converted) AS DOUBLE) / count(*) AS conversion_rate
        FROM per_session""")),

    "q46_binary_payloads" -> Q(
      // Multimodal binary columns, driver-checked: documents' UTF-8 bytes
      // stand in for media payloads (deterministic, so the oracle can
      // recompute them), flowing through the typed MediaRow schema
      // (media_id + kind + meta struct + binary payload) whose raster ops
      // MultimodalSpec gates. Per media kind: item count, exact payload
      // dedup on the md5 of the BYTES (the binary twin of q21's text
      // dedup), and byte-volume accounting. Scale shape: one scan, one
      // hash agg; the shuffle carries 16-byte digests + counters, never
      // payloads.
      build = (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val media = docs.select(
          col("doc_id").as("media_id"),
          when(pmod(col("doc_id"), lit(3)) === 0, "image")
            .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
            .otherwise("video").as("kind"),
          struct(lit("raw").as("format"),
            length(col("text")).cast("int").as("width"),
            lit(1).as("height"), lit(1).as("nFrames"),
            lit(0).as("sampleRateHz")).as("meta"),
          col("text").cast("binary").as("payload"))
          .as[Multimodal.MediaRow]
        Multimodal.asTable(media)
          .groupBy(col("kind"))
          .agg(
            count(lit(1)).as("n_items"),
            countDistinct(Multimodal.payloadKey).as("n_unique_payloads"),
            sum(length(col("payload"))).as("total_bytes"),
            max(length(col("payload"))).as("max_bytes"))
          .orderBy(col("kind"))
      },
      oracle = Some("""
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
          count(*) AS n_items,
          count(DISTINCT md5(text)) AS n_unique_payloads,
          CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
          max(octet_length(encode(text))) AS max_bytes
        FROM documents
        GROUP BY 1
        ORDER BY kind""")),

    "q47_simhash_pairs" -> Q(
      // SimHash near-dup pairs at Hamming <= 3 via pigeonhole banding
      // (4 x 15-bit bands): the candidate set PROVABLY contains every true
      // pair — a guarantee, not a recall probability — so the exact
      // all-pairs SQL is the oracle. The Hamming-space complement of
      // q27/q28's Jaccard dedup.
      build = (s, dir) =>
        NearDup.simhashNearDupPairs(table(s, dir, "documents"), "doc_id",
            "text", maxHamming = 3)
          .orderBy(col("id_a"), col("id_b")),
      oracle = Some(s"""
        WITH $simhashCtes
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sk a JOIN sk b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ORDER BY id_a, id_b"""),
      bench = true),

    "q48_repetition_signals" -> Q(
      // Gopher-style repetition quality filters: duplicate-token fraction
      // and most-frequent-bigram share, per document — exact integer
      // ratios, relational plan (posexplode -> lead window -> hash aggs),
      // everything codegen'd.
      build = (s, dir) =>
        TextStats.repetitionSignals(table(s, dir, "documents"), "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id")),
      oracle = Some(s"""
        WITH ${TextStats.sqlRepetitionCtes("doc_id", "text")}
        SELECT id AS doc_id, n_tokens, n_distinct,
          dup_token_fraction, top_bigram_fraction
        FROM rep
        ORDER BY doc_id""")),

    "q49_tfidf_top_terms" -> Q(
      // Term salience: top-3 TF-IDF terms per document. tf/df/N are exact
      // integers; ln agrees bit-for-bit across engines on the finite N/df
      // input set, so the scores hash-match.
      build = (s, dir) =>
        TextStats.tfidfTopTerms(table(s, dir, "documents"), "doc_id", "text", k = 3)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"), col("rank")),
      oracle = Some(s"""
        WITH ${TextStats.sqlTfidfCtes("doc_id", "text", 3)}
        SELECT id AS doc_id, rank, term, tf, df_docs, score
        FROM ranked
        ORDER BY doc_id, rank""")),

    "q50_salted_join_revenue" -> Q(
      // q02's star join with the fact⋈customer edge routed through
      // explicit salting (SkewJoin.saltedInnerJoin, factor 4): the skew
      // remedy for hot keys that AQE's sort-merge splitter can't reach.
      // Same oracle as q02 — salting must be answer-invariant.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val c = table(s, dir, "customer")
        val n = table(s, dir, "nation")
        val r = table(s, dir, "region")
        val oc = SkewJoin.saltedInnerJoin(
          o.withColumn("c_custkey", col("o_custkey")), c,
          Seq("c_custkey"), saltFactor = 4, saltCols = Seq("o_orderkey"))
        oc.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            msum(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"),
            countDistinct(col("o_custkey")).as("n_custs"))
          .orderBy(col("r_name"), col("n_name"))
      },
      oracle = Some(revenueByNationOracle)),

    "q51_hash_split" -> Q(
      // Deterministic train/val carving by content-key hash (10% val):
      // every row's split assignment is a pure function of its id —
      // reproducible across engines/runs/partitionings, unlike
      // df.sample()'s per-partition RNG. Scan-side only; no shuffle
      // before the audit aggregation.
      build = (s, dir) =>
        Sampling.hashSplit(table(s, dir, "documents"), "doc_id",
            valBuckets = 10, outOf = 100)
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("split"), col("lang")),
      oracle = Some(s"""
        SELECT CASE WHEN ${Sampling.sqlHashBucket("doc_id", 100)} < 10
                    THEN 'val' ELSE 'train' END AS split,
          lang, count(*) AS n_docs
        FROM documents
        GROUP BY 1, 2
        ORDER BY split, lang""")),

    "q52_dup_components" -> Q(
      // Exact dedup clustering: connected components over the verified
      // near-dup pair graph (iterative min-label propagation, one shuffle
      // per round, rounds = cluster diameter) vs DuckDB's recursive-CTE
      // reachability closure. Every document gets its cluster id;
      // singletons label themselves.
      build = (s, dir) => {
        val docs = table(s, dir, "documents")
        val pairs = NearDup.minhashNearDupPairs(docs, "doc_id", "text",
          n = 3, minJ = 0.6, numHashes = 192, bandRows = 3)
        Components.connectedComponents(docs, "doc_id", pairs)
          .select(col("id").as("doc_id"), col("comp").as("component"))
          .orderBy(col("doc_id"))
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
          SELECT w.id, s.dst FROM walk w JOIN sym s ON s.src = w.reach)
        SELECT id AS doc_id, min(reach) AS component
        FROM walk
        GROUP BY id
        ORDER BY doc_id"""),
      bench = true),

    "q53_price_histogram" -> Q(
      // Fixed-width histogram (pandas cut + value_counts): 20 bins over
      // [0, 500k); explicit edges keep it a single scan + tiny agg with a
      // pure bin expression.
      build = (s, dir) =>
        Profiling.histogram(table(s, dir, "orders"), "o_totalprice",
          lo = 0.0, hi = 500000.0, bins = 20),
      oracle = Some("""
        SELECT LEAST(GREATEST(CAST(floor((o_totalprice - 0.0) / 25000.0) AS BIGINT), 0), 19) AS bin,
          0.0 + LEAST(GREATEST(CAST(floor((o_totalprice - 0.0) / 25000.0) AS BIGINT), 0), 19) * 25000.0 AS bin_lo,
          count(*) AS n
        FROM orders
        GROUP BY 1, 2
        ORDER BY bin""")),

    "q54_window_suite" -> Q(
      // The remaining rank-family windows over one partitioned pass:
      // dense_rank, ntile(4), percent_rank, cume_dist per order priority —
      // each a pure function of the same (priority, price desc, key) sort,
      // so one window sort serves all four. Top-5 per group keeps output
      // bounded.
      build = (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        table(s, dir, "orders")
          .withColumn("rnk", row_number().over(w))
          .withColumn("drank", dense_rank().over(w))
          .withColumn("quartile", ntile(4).over(w))
          .withColumn("prank", percent_rank().over(w))
          .withColumn("cdist", cume_dist().over(w))
          .filter(col("rnk") <= 5)
          .select(col("o_orderpriority"), col("rnk").cast("long").as("rnk"),
            col("o_orderkey"), col("o_totalprice"),
            col("drank").cast("long").as("drank"),
            col("quartile").cast("long").as("quartile"),
            col("prank"), col("cdist"))
          .orderBy(col("o_orderpriority"), col("rnk"))
      },
      oracle = Some("""
        SELECT o_orderpriority, rnk, o_orderkey, o_totalprice, drank, quartile, prank, cdist
        FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
            CAST(row_number() OVER w AS BIGINT) AS rnk,
            CAST(dense_rank() OVER w AS BIGINT) AS drank,
            CAST(ntile(4) OVER w AS BIGINT) AS quartile,
            percent_rank() OVER w AS prank,
            cume_dist() OVER w AS cdist
          FROM orders
          WINDOW w AS (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey))
        WHERE rnk <= 5
        ORDER BY o_orderpriority, rnk""")),

    "q55_canonical_dedup" -> Q(
      // Normalized dedup audit: unique counts under the byte-exact key vs
      // the canonical key (NFC + casefold + whitespace collapse) — the
      // C4-style normalization pass that catches trivially-reformatted
      // duplicates byte hashing misses.
      build = (s, dir) =>
        table(s, dir, "documents")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(TextStats.contentKey(col("text"))).as("n_unique_raw"),
            countDistinct(TextStats.canonicalKey(col("text"))).as("n_unique_canonical"))
          .orderBy(col("source")),
      oracle = Some(s"""
        SELECT source, count(*) AS n_docs,
          count(DISTINCT md5(text)) AS n_unique_raw,
          count(DISTINCT md5(${TextStats.sqlCanonicalText("text")})) AS n_unique_canonical
        FROM documents
        GROUP BY source
        ORDER BY source""")),

    "q56_chunking" -> Q(
      // Chunk-for-embedding: 32-token windows every 8 tokens per document
      // (overlapping, final partial kept) — a pure executor-side
      // posexplode expansion, no shuffle.
      build = (s, dir) =>
        TextStats.chunkTokens(table(s, dir, "documents"), "doc_id", "text",
            chunkTokens = 32, stride = 8)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"), col("chunk_idx")),
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS t
          FROM documents WHERE text IS NOT NULL),
        starts AS (
          SELECT doc_id, t,
            unnest(generate_series(1, greatest(1, len(t) - 8), 8)) AS start_token,
            generate_subscripts(generate_series(1, greatest(1, len(t) - 8), 8), 1) - 1 AS chunk_idx
          FROM toks)
        SELECT doc_id, chunk_idx, start_token,
          least(32, len(t) - start_token + 1) AS n_tokens,
          array_to_string(t[start_token : start_token + 31], ' ') AS chunk_text
        FROM starts
        ORDER BY doc_id, chunk_idx""")),

    "q57_sequence_packing" -> Q(
      // Deterministic sequence packing: docs assigned (in id order) to
      // 2048-token training sequences by prefix-sum bucketing, plus a
      // packing-efficiency audit per sequence.
      build = (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), TextStats.tokenCount(col("text")).as("tok"))
        TextStats.packSequences(docs, "doc_id", "tok", budget = 2048L)
          .groupBy(col("seq_id"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("seq_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("seq_id"))
      },
      oracle = Some("""
        WITH tok AS (
          SELECT doc_id,
            len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS n_tokens
          FROM documents),
        packed AS (
          SELECT doc_id, n_tokens,
            CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                        - n_tokens) / 2048.0) AS BIGINT) AS seq_id
          FROM tok)
        SELECT seq_id, count(*) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
          min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM packed
        GROUP BY seq_id
        ORDER BY seq_id""")),

    "q58_token_entropy" -> Q(
      // Information-density quality signal: per-document Shannon entropy
      // of the token distribution (exact integer tf counts; irrational
      // log terms snapped to 12 dp and summed in exact decimal, so the
      // result is combine-order-independent).
      build = (s, dir) =>
        TextStats.tokenEntropy(table(s, dir, "documents"), "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id")),
      oracle = Some(s"""
        WITH ${TextStats.sqlTokenEntropyCtes("doc_id", "text")}
        SELECT id AS doc_id, n_tokens, n_distinct, entropy
        FROM ent
        ORDER BY doc_id"""),
      bench = true),

    "q59_balanced_sample" -> Q(
      // Mixture rebalancing: deterministically thin every language to the
      // smallest language's size (keep-rate = min_count/count as an exact
      // integer bucket threshold over the stable md5 row hash). The audit
      // reports per-group before/after; which rows survive is a pure
      // function of doc_id, so both engines select identical rows.
      build = (s, dir) => {
        val docs = table(s, dir, "documents")
        val before = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_before"))
        val after = Sampling.balancedSample(docs, "doc_id", "lang")
          .groupBy(col("lang")).agg(count(lit(1)).as("n_after"))
        before.join(after, Seq("lang"), "left")
          .select(col("lang"), col("n_before"),
            coalesce(col("n_after"), lit(0L)).as("n_after"))
          .orderBy(col("lang"))
      },
      oracle = Some(s"""
        WITH ${Sampling.sqlBalancedKeptCtes("doc_id", "lang")},
        after AS (SELECT lang, count(*) AS n_after FROM kept GROUP BY lang)
        SELECT c.lang, c.__cnt AS n_before, coalesce(a.n_after, 0) AS n_after
        FROM counts c LEFT JOIN after a USING (lang)
        ORDER BY c.lang""")),

    "q60_decontamination" -> Q(
      // Eval-set contamination check: corpus docs sharing any distinct
      // word 5-gram with the benchmark partition (source = 'src0').
      // Benchmark shingles broadcast; the corpus never shuffles bodies.
      build = (s, dir) => {
        val docs = table(s, dir, "documents")
        NearDup.contaminationHits(
            corpus = docs.filter(col("source") =!= "src0"),
            bench = docs.filter(col("source") === "src0"),
            "doc_id", "text", n = 5)
          .select(col("id").as("doc_id"), col("n_shared"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, source, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id, source,
            unnest(list_distinct(list_transform(generate_series(1, len(t) - 4),
              i -> array_to_string(t[i:i+4], ' ')))) AS s
          FROM toks),
        bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0')
        SELECT c.doc_id, count(*) AS n_shared
        FROM sh c JOIN bench b ON c.s = b.s
        WHERE c.source <> 'src0'
        GROUP BY c.doc_id
        ORDER BY c.doc_id"""),
      bench = true),

    "q61_pii_redaction" -> Q(
      // Pre-training PII scrub: plant deterministic synthetic PII (the
      // corpus has none), then redact emails/phones with RE2-safe
      // patterns. Both engines build the same augmented text, so the
      // match counts and the md5 of the redacted output must agree
      // byte-for-byte.
      build = (s, dir) => {
        val aug = concat(col("text"), lit(" Contact user"),
          col("doc_id").cast("string"),
          lit("@example.com or +1-202-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" now."))
        table(s, dir, "documents")
          .select(col("doc_id"),
            TextStats.emailCount(aug).cast("long").as("n_emails"),
            TextStats.phoneCount(aug).cast("long").as("n_phones"),
            md5(TextStats.redactPii(aug)).as("redacted_key"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(s"""
        WITH aug AS (
          SELECT doc_id,
            text || ' Contact user' || doc_id || '@example.com or +1-202-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now.' AS t
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t, ${TextStats.sqlEmailPattern})) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(t, ${TextStats.sqlPhonePattern})) AS BIGINT) AS n_phones,
          md5(${TextStats.sqlRedactPii("t")}) AS redacted_key
        FROM aug
        ORDER BY doc_id""")),

    "q62_grouped_quantiles" -> Q(
      // Grouped exact quantiles (pandas groupby().quantile()): per-language
      // document-length quartiles — exact type-7 interpolation on both
      // engines (parity established by q19's global quartiles).
      build = (s, dir) =>
        table(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            expr("percentile(n_chars, 0.25D)").as("p25"),
            expr("percentile(n_chars, 0.5D)").as("median"),
            expr("percentile(n_chars, 0.75D)").as("p75"))
          .orderBy(col("lang")),
      oracle = Some("""
        SELECT lang, count(*) AS n_docs,
          quantile_cont(n_chars, 0.25) AS p25,
          quantile_cont(n_chars, 0.5) AS median,
          quantile_cont(n_chars, 0.75) AS p75
        FROM documents
        GROUP BY lang
        ORDER BY lang""")),

    "q63_int8_quant" -> Q(
      // Vector-store compression audit: symmetric int8 quantization of
      // every embedding (scale = 127/max|x|, floor(+0.5) rounding — an
      // unambiguous IEEE op on both engines), reporting per-vector max
      // reconstruction error, zero-crush count, and L2 norm (decimal
      // accumulation).
      build = (s, dir) =>
        Vectors.int8QuantAudit(emb(s, dir), "vec_id", "embedding")
          .withColumnRenamed("id", "vec_id")
          .orderBy(col("vec_id")),
      oracle = Some(s"""
        WITH e AS (
          SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS v
          FROM embeddings WHERE $sqlEmbValid),
        s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
        el AS (SELECT vec_id, mx, unnest(v) AS x FROM s),
        qn AS (
          -- mx = 0 guard mirrors the Spark side: zero vectors quantize to
          -- zeros with zero error (unguarded, 0 * (127/0) = NaN here)
          SELECT vec_id, mx, x,
            CASE WHEN mx = 0 THEN 0
                 ELSE greatest(-127, least(127, CAST(floor(x * (127.0 / mx) + 0.5) AS BIGINT)))
            END AS q
          FROM el)
        SELECT vec_id,
          round(max(CASE WHEN mx = 0 THEN 0.0
                         ELSE abs(q / (127.0 / mx) - x) END), 8) AS max_abs_err,
          CAST(sum(CASE WHEN q = 0 AND x <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_crushed,
          round(sqrt(CAST(sum(CAST(round(x * x, 12) AS DECIMAL(28,12))) AS DOUBLE)), 8) AS l2_norm
        FROM qn
        GROUP BY vec_id
        ORDER BY vec_id"""),
      bench = true),

    "q64_winsorized_stats" -> Q(
      // Robust grouped statistics: per-priority order values clamped to
      // [p05, p95] (winsorization — the outlier-insensitive mean used for
      // monitoring skewed revenue). Exact type-7 percentiles per group
      // (tiny, broadcast back onto the scan), clamped values snapped at
      // 6 dp and accumulated in exact decimal so the mean is
      // combine-order-independent.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val bounds = o.groupBy(col("o_orderpriority")).agg(
          expr("percentile(o_totalprice, 0.05D)").as("p05"),
          expr("percentile(o_totalprice, 0.95D)").as("p95"))
        o.join(broadcast(bounds), Seq("o_orderpriority"))
          .withColumn("wp",
            least(greatest(col("o_totalprice"), col("p05")), col("p95")))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_orders"),
            max(col("p05")).as("p05"),
            max(col("p95")).as("p95"),
            round(sum(round(col("wp"), 6).cast("decimal(28,6)")).cast("double")
              / count(lit(1)), 6).as("winsor_mean"))
          .orderBy(col("o_orderpriority"))
      },
      oracle = Some("""
        WITH b AS (
          SELECT o_orderpriority,
            quantile_cont(o_totalprice, 0.05) AS p05,
            quantile_cont(o_totalprice, 0.95) AS p95
          FROM orders GROUP BY o_orderpriority)
        SELECT o_orderpriority, count(*) AS n_orders,
          max(p05) AS p05, max(p95) AS p95,
          round(CAST(sum(CAST(round(least(greatest(o_totalprice, p05), p95), 6)
                AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS winsor_mean
        FROM orders JOIN b USING (o_orderpriority)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    "q65_quality_funnel" -> Q(
      // The C4/Gopher-style quality-filter funnel: per source, how many
      // documents pass each gate (length ≥ 24 tokens, stopword ratio ≥
      // 0.04, dup-token fraction ≤ 0.6) and all gates together — the
      // retention audit run before committing a filter config. All gate
      // inputs are exact integer ratios, so the pass sets are identical
      // across engines.
      build = (s, dir) => {
        val docs = table(s, dir, "documents")
        val qs = TextStats.withQualitySignals(docs, "text")
          .select(col("doc_id"), col("source"), col("q_tokens"),
            col("stopword_ratio"))
        val rep = TextStats.repetitionSignals(docs, "doc_id", "text")
          .select(col("id"), col("dup_token_fraction"))
        val passLen = col("q_tokens") >= 24
        val passSw = col("stopword_ratio") >= 0.04
        val passRep = col("dup_token_fraction") <= 0.6
        qs.join(rep, qs("doc_id") === rep("id"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(passLen, 1L).otherwise(0L)).as("pass_len"),
            sum(when(passSw, 1L).otherwise(0L)).as("pass_stopword"),
            sum(when(passRep, 1L).otherwise(0L)).as("pass_repetition"),
            sum(when(passLen && passSw && passRep, 1L).otherwise(0L))
              .as("pass_all"))
          .orderBy(col("source"))
      },
      oracle = Some(s"""
        WITH ${TextStats.sqlRepetitionCtes("doc_id", "text")},
        qs AS (
          SELECT doc_id, source,
            len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS n_tokens,
            CAST(${TextStats.sqlStopwordCount("text")} AS DOUBLE)
              / len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS sw_ratio
          FROM documents)
        SELECT qs.source, count(*) AS n_docs,
          CAST(sum(CASE WHEN qs.n_tokens >= 24 THEN 1 ELSE 0 END) AS BIGINT) AS pass_len,
          CAST(sum(CASE WHEN qs.sw_ratio >= 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS pass_stopword,
          CAST(sum(CASE WHEN rep.dup_token_fraction <= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS pass_repetition,
          CAST(sum(CASE WHEN qs.n_tokens >= 24 AND qs.sw_ratio >= 0.04
                         AND rep.dup_token_fraction <= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
        FROM qs JOIN rep ON qs.doc_id = rep.id
        GROUP BY qs.source
        ORDER BY qs.source"""),
      bench = true),

    "q66_unigram_surprisal" -> Q(
      // CCNet-style perplexity filter input: per-document mean token
      // surprisal under the corpus unigram LM (decimal-accumulated like
      // q58's entropy, so the result is combine-order-independent).
      build = (s, dir) =>
        TextStats.unigramSurprisal(table(s, dir, "documents"), "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id")),
      oracle = Some(s"""
        WITH ${TextStats.sqlUnigramSurprisalCtes("doc_id", "text")}
        SELECT id AS doc_id, n_tokens, mean_surprisal
        FROM surp
        ORDER BY doc_id""")),

    "q67_date_spine_outer" -> Q(
      // FULL OUTER join over two independently-aggregated date spines
      // (order dates vs ship dates): the reconciliation shape that finds
      // activity present on one side only. NULL dates are filtered
      // identically on both engines BEFORE aggregating — a NULL group key
      // would not join, FULL OUTER would emit a NULL coalesced key, and
      // the comparator's NaT != NaT rule would flag identical results
      // (the q39 hazard); with the filter the output date is provably
      // never null. Both sides pre-aggregate before the join, so the
      // shuffle carries one row per date, not per fact row.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
          .filter(col("o_orderdate").isNotNull)
          .groupBy(col("o_orderdate").as("d"))
          .agg(count(lit(1)).as("n_orders"))
        val l = table(s, dir, "lineitem")
          .filter(col("l_shipdate").isNotNull)
          .groupBy(col("l_shipdate").as("d"))
          .agg(count(lit(1)).as("n_ships"))
        o.join(l, Seq("d"), "full_outer")
          .select(col("d"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("n_ships"), lit(0L)).as("n_ships"),
            when(col("n_orders").isNull, "ship_only")
              .when(col("n_ships").isNull, "order_only")
              .otherwise("both").as("side"))
          .orderBy(col("d"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_orderdate AS d, count(*) AS n_orders FROM orders
          WHERE o_orderdate IS NOT NULL GROUP BY 1),
        l AS (
          SELECT l_shipdate AS d, count(*) AS n_ships FROM lineitem
          WHERE l_shipdate IS NOT NULL GROUP BY 1)
        SELECT d,
          coalesce(n_orders, 0) AS n_orders,
          coalesce(n_ships, 0) AS n_ships,
          CASE WHEN n_orders IS NULL THEN 'ship_only'
               WHEN n_ships IS NULL THEN 'order_only'
               ELSE 'both' END AS side
        FROM o FULL JOIN l USING (d)
        ORDER BY d""")),

    "q68_string_battery" -> Q(
      // The string scalar surface in one deterministic pass: case
      // mapping, substring, search, padding, repetition, character
      // translation, reversal, and edit distance — every function chosen
      // for identical semantics on both engines (1-based positions,
      // 0-for-absent instr, pad-truncation).
      build = (s, dir) =>
        table(s, dir, "part")
          .filter(col("p_partkey") < 200)
          .select(col("p_partkey"),
            upper(col("p_name")).as("u"),
            substring(col("p_name"), 1, 12).as("sub"),
            translate(substring(col("p_name"), 1, 12), "aeiou", "AEIOU").as("tr"),
            instr(col("p_name"), "a").cast("long").as("pos_a"),
            lpad(col("p_type"), 28, "*").as("pad"),
            repeat(substring(col("p_brand"), 7, 2), 2).as("rep"),
            reverse(col("p_name")).as("rev"),
            levenshtein(col("p_name"), reverse(col("p_name"))).cast("long").as("lev"))
          .orderBy(col("p_partkey")),
      oracle = Some("""
        SELECT p_partkey,
          upper(p_name) AS u,
          substring(p_name, 1, 12) AS sub,
          translate(substring(p_name, 1, 12), 'aeiou', 'AEIOU') AS tr,
          CAST(instr(p_name, 'a') AS BIGINT) AS pos_a,
          lpad(p_type, 28, '*') AS pad,
          repeat(substring(p_brand, 7, 2), 2) AS rep,
          reverse(p_name) AS rev,
          CAST(levenshtein(p_name, reverse(p_name)) AS BIGINT) AS lev
        FROM part
        WHERE p_partkey < 200
        ORDER BY p_partkey""")),

    "q69_temporal_battery" -> Q(
      // The temporal scalar surface in one pass: truncation, day-of-week
      // (Spark's Sunday=1 convention == DuckDB's dayofweek+1), day diffs,
      // month arithmetic with end-of-month clamping (add_months ==
      // + INTERVAL with both engines clamping Jan 31 + 1m -> Feb 28),
      // last_day, year/quarter — aligned to DATE where return types
      // differ.
      build = (s, dir) => ntzOut(
        table(s, dir, "orders")
          .filter(col("o_orderkey") < 500)
          .select(col("o_orderkey"), col("o_orderdate"),
            date_trunc("month", col("o_orderdate")).as("mon"),
            dayofweek(col("o_orderdate")).cast("long").as("dow"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
              .cast("long").as("days_since"),
            add_months(col("o_orderdate"), 3).as("plus3m"),
            last_day(col("o_orderdate")).as("eom"),
            year(col("o_orderdate")).cast("long").as("yr"),
            quarter(col("o_orderdate")).cast("long").as("qtr"))
          .orderBy(col("o_orderkey"))),
      oracle = Some("""
        SELECT o_orderkey, o_orderdate,
          date_trunc('month', o_orderdate) AS mon,
          CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
          CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
          CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
          last_day(CAST(o_orderdate AS DATE)) AS eom,
          CAST(year(o_orderdate) AS BIGINT) AS yr,
          CAST(quarter(o_orderdate) AS BIGINT) AS qtr
        FROM orders
        WHERE o_orderkey < 500
        ORDER BY o_orderkey""")),

    "q70_array_battery" -> Q(
      // The collection scalar surface in one pass over tokenized
      // documents: size, distinct-size, sort+slice (binary collation on
      // both engines), membership, and first-position (Spark's 0-for-
      // absent aligned with coalesce(list_position, 0)). Output stays
      // scalar — concat_ws flattens the sliced array — so the comparator
      // never sees array cells.
      build = (s, dir) => {
        val toks = split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")
        table(s, dir, "documents")
          .filter(col("doc_id") < 200)
          .select(col("doc_id"),
            size(toks).cast("long").as("n"),
            size(array_distinct(toks)).cast("long").as("nd"),
            concat_ws(" ", slice(array_sort(toks), 1, 3)).as("first3"),
            array_contains(toks, "the").cast("long").as("has_the"),
            array_position(toks, "the").cast("long").as("pos_the"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS toks
          FROM documents
          WHERE doc_id < 200)
        SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n,
          CAST(len(list_distinct(toks)) AS BIGINT) AS nd,
          array_to_string(list_sort(toks)[1:3], ' ') AS first3,
          CAST(list_contains(toks, 'the') AS BIGINT) AS has_the,
          CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT) AS pos_the
        FROM t
        ORDER BY doc_id""")),

    "q71_json_battery" -> Q(
      // JSON path extraction beyond q17's flat case: scalar fields, array
      // indexing, nested objects, and array length. The JSON document is
      // BUILT from columns with string concatenation (identical bytes on
      // both engines — to_json's key order and number formatting are
      // engine-specific, so it is deliberately avoided), then pulled
      // apart with path expressions.
      build = (s, dir) => {
        val doc = concat(
          lit("{\"k\":"), col("o_orderkey").cast("string"),
          lit(",\"p\":\""), col("o_orderpriority"),
          lit("\",\"tags\":[\"t"), pmod(col("o_orderkey"), lit(3)).cast("string"),
          lit("\",\"x\"],\"nest\":{\"c\":"),
          pmod(col("o_orderkey"), lit(7)).cast("string"), lit("}}"))
        table(s, dir, "orders")
          .filter(col("o_orderkey") < 300)
          .select(col("o_orderkey"), doc.as("doc"))
          .select(col("o_orderkey"), col("doc"),
            get_json_object(col("doc"), "$.k").cast("long").as("k"),
            get_json_object(col("doc"), "$.p").as("p"),
            get_json_object(col("doc"), "$.tags[0]").as("tag0"),
            get_json_object(col("doc"), "$.nest.c").cast("long").as("c"),
            json_array_length(get_json_object(col("doc"), "$.tags"))
              .cast("long").as("n_tags"))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some("""
        -- json: synthesized — the document is built by this query from
        -- typed columns (well-formed or NULL by construction), so the
        -- json_valid guard rule does not apply (tools/oracle_lint.py)
        WITH j AS (
          SELECT o_orderkey,
            '{"k":' || o_orderkey || ',"p":"' || o_orderpriority ||
            '","tags":["t' || (o_orderkey % 3) || '","x"],"nest":{"c":' ||
            (o_orderkey % 7) || '}}' AS doc
          FROM orders WHERE o_orderkey < 300)
        SELECT o_orderkey, doc,
          CAST(json_extract_string(doc, '$.k') AS BIGINT) AS k,
          json_extract_string(doc, '$.p') AS p,
          json_extract_string(doc, '$.tags[0]') AS tag0,
          CAST(json_extract_string(doc, '$.nest.c') AS BIGINT) AS c,
          CAST(json_array_length(doc, '$.tags') AS BIGINT) AS n_tags
        FROM j
        ORDER BY o_orderkey""")),

    "q72_repeated_spans" -> Q(
      // Repeated-passage mining (the exact-substring-dedup family of Lee
      // et al. 2022): word 10-grams appearing in ≥ 2 distinct documents,
      // with occurrence counts and the bounding doc ids — the span list a
      // scrubbing pass would remove. The span text never enters a
      // shuffle: occurrences come from the non-distinct shingle stream
      // (whose window exchange carries (id, pos, word)), dedup and the
      // inverted-index aggregation key on xxhash64(span) longs, and the
      // text is resolved only for the tiny ≥2-doc surviving set by
      // re-scanning the stream against the broadcast survivor hashes (at
      // a scale where survivors outgrow a broadcast, the same resolve is
      // a long-keyed equi-join). A 64-bit collision would merge two
      // spans' counts — ~1e-9 at 10^5 distinct spans, and the exact
      // oracle fails closed if it ever happens.
      build = (s, dir) => {
        val raw = NearDup.shingleRowsAll(
          table(s, dir, "documents"), "doc_id", "text", 10)
        val agg = raw
          .select(xxhash64(col("s")).as("hs"), col("id"))
          .distinct()
          .groupBy(col("hs"))
          .agg(
            count(lit(1)).as("n_docs"),
            min(col("id")).as("first_doc"),
            max(col("id")).as("last_doc"))
          .filter(col("n_docs") >= 2)
        raw
          .select(xxhash64(col("s")).as("hs"), col("s"))
          .join(broadcast(agg), Seq("hs"))
          .select(col("s"), col("n_docs"), col("first_doc"), col("last_doc"))
          .distinct()
          .orderBy(col("s"))
      },
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t) - 9),
            i -> array_to_string(t[i:i+9], ' ')))) AS s
          FROM toks)
        SELECT s, count(*) AS n_docs,
          min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM sh
        GROUP BY s
        HAVING count(*) >= 2
        ORDER BY s"""),
      bench = true),

    "q73_ann_ivf" -> Q(
      // IVF ANN with the coarse quantizer persisted as DATA: fit KMeans
      // (nlist=16, seed 42) over the embeddings, write the centroid table
      // to parquet, then run the pure-relational search half against it —
      // nearest-cell assignment (argmin of |c|² − 2·v·c, ties to the
      // smaller cell), nprobe=4 probing, exact-cosine top-3 inside the
      // probed cells. Because the search is plain arithmetic over
      // (centroids × embeddings) and both engines read the SAME centroid
      // parquet, the DuckDB oracle reproduces the search bit-for-bit —
      // KMeans itself (not SQL-expressible) stays on the Spark side, its
      // output checked as data. Unlike q34 (exact-equality-by-tuning),
      // this row checks the IVF search SEMANTICS, approximation included.
      build = (s, dir) => {
        val e = emb(s, dir)
        // The centroid handoff dir is keyed by an integer-exact content
        // fingerprint of the corpus (count + Σ floor(|emb[1]|·1e6), both
        // engine-identical arithmetic): concurrent or interleaved runs at
        // DIFFERENT SFs write different subdirs instead of clobbering the
        // table the other run's oracle is about to read. Same-corpus
        // re-runs overwrite with byte-identical centroids (seed fixed).
        val key = e.agg(count(lit(1)),
          sum(floor(abs(element_at(col("embedding"), 1).cast("double"))
            * lit(1e6)).cast("long"))).head()
        val sub = s"n${key.getLong(0)}_k${key.getLong(1)}"
        Similarity.ivfFitCentroids(e, "embedding", nlist = 16, seed = 42L)
          .coalesce(1).write.mode("overwrite").parquet(s"$ivfCentroidPath/$sub")
        val centroids = s.read.parquet(s"$ivfCentroidPath/$sub")
        Similarity.ivfSearch(e.filter(col("vec_id") < 20), e, centroids,
            "vec_id", "embedding", k = 3, nprobe = 4)
          .orderBy(col("query_id"), col("rank"))
      },
      oracle = Some(s"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
          WHERE $sqlEmbValid),
        ckey AS (
          SELECT 'n' || count(*) || '_k' ||
            CAST(sum(CAST(floor(abs(CAST(embedding[1] AS DOUBLE)) * 1000000.0)
              AS BIGINT)) AS VARCHAR) AS sub
          FROM embeddings WHERE $sqlEmbValid),
        c AS (
          SELECT cell, centroid
          FROM read_parquet('$ivfCentroidPath/*/*.parquet', filename=true)
          WHERE filename LIKE '%/' || (SELECT sub FROM ckey) || '/%'),
        dists AS (
          SELECT v.vec_id, v.emb, c.cell,
            list_dot_product(c.centroid, c.centroid)
              - 2.0 * list_dot_product(v.emb, c.centroid) AS d
          FROM v CROSS JOIN c),
        assign AS (
          SELECT vec_id, emb, cell FROM (
            SELECT vec_id, emb, cell,
              row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM dists)
          WHERE rn = 1),
        probe AS (
          SELECT vec_id AS query_id, emb AS qemb, cell FROM (
            SELECT vec_id, emb, cell,
              row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM dists WHERE vec_id < 20)
          WHERE rn <= 4),
        sims AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
            list_dot_product(p.qemb, a.emb)
              / (sqrt(list_dot_product(p.qemb, p.qemb)) * sqrt(list_dot_product(a.emb, a.emb))) AS sim
          FROM probe p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id),
        ranked AS (
          SELECT query_id, neighbor_id, sim,
            row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
          FROM sims)
        SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, sim
        FROM ranked
        WHERE rank <= 3
        ORDER BY query_id, rank"""),
      bench = true),

    // ------------------------------------------------------------------
    // Streaming twins, bounded-run oracle rows (SURVEY §2 streaming /
    // S5's streaming face): the events table staged as files, streamed
    // with Trigger.AvailableNow, final state / emitted rows materialized.
    // ------------------------------------------------------------------

    "q74_stream_upsert" -> Q(
      // Streamed keyed upsert end-state: one file per micro-batch through
      // foreachBatch + version-guarded Derby MERGE (DerbyMergeVersioned).
      // The guard makes the end state arrival-order-independent — the
      // max-ts row per user — so the oracle is plain last-value-per-key
      // SQL, exactly the reference ETL's REPLACE INTO semantics
      // (MySQL_Data_Loading.ipynb:515-527) run as a stream.
      build = (s, dir) => graft.streaming.BoundedRuns.upsertEndState(s, dir),
      oracle = Some("""
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
        FROM (SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE user_id IS NOT NULL)
        WHERE rn = 1
        ORDER BY user_id""")),

    "q75_stream_sessions" -> Q(
      // Bounded run of the stateful streaming sessionizer
      // (flatMapGroupsWithState + event-time timeout). Emitted = sessions
      // closed by a successor event (every non-final session per user) or
      // by timeout under the terminal watermark max(ts) − 30min (strict:
      // Spark fires a timeout only when the watermark advances BEYOND
      // end + gap). Mirrors q18's batch sessionization minus the
      // still-open tails.
      build = (s, dir) => ntzOut(graft.streaming.BoundedRuns.emittedSessions(s, dir)),
      oracle = Some("""
        WITH lagged AS (
          -- keyed-operator contract: per-user session state needs the key
          SELECT user_id, event_id, ts,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events WHERE user_id IS NOT NULL),
        flagged AS (
          SELECT user_id, event_id, ts,
            CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS new_sess
          FROM lagged),
        numbered AS (
          SELECT user_id, ts,
            CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
          FROM flagged),
        sess AS (
          SELECT user_id, session_seq, count(*) AS n_events,
            min(ts) AS session_start, max(ts) AS session_end
          FROM numbered
          GROUP BY user_id, session_seq),
        wm AS (SELECT max(epoch_us(ts)) - 1800000000 AS w
               FROM events WHERE user_id IS NOT NULL)
        SELECT user_id, session_seq, n_events, session_start, session_end
        FROM sess, wm
        WHERE session_seq < (SELECT max(session_seq) FROM sess s2
                             WHERE s2.user_id = sess.user_id)
           OR epoch_us(session_end) + 1800000000 < w
        ORDER BY user_id, session_seq""")),

    "q76_stream_hourly" -> Q(
      // Bounded run of the watermarked hourly windowed aggregation in
      // append mode: a window is emitted exactly once, when the watermark
      // reaches its end — so the emitted set is every hour with
      // hour_end ≤ max(ts) − 2h, with q16's exact-decimal value sums.
      build = (s, dir) => ntzOut(graft.streaming.BoundedRuns.emittedHourly(s, dir)),
      oracle = Some(s"""
        SELECT date_trunc('hour', ts) AS hour, event_type,
          count(*) AS n_events,
          ${sqlMsum("value")} AS total_value
        FROM events
        WHERE date_trunc('hour', ts) + INTERVAL '1 hour'
              <= (SELECT max(ts) - INTERVAL '2 hours' FROM events)
        GROUP BY 1, 2
        ORDER BY hour, event_type""")),

    "q77_dup_components_altstar" -> Q(
      // The SAME clustering contract as q52, computed by the long-diameter
      // scale path: alternating large-star/small-star edge rewriting
      // (Kiveris et al. '14) instead of min-label propagation — O(log²)
      // rounds on any topology vs q52's diameter rounds. Same pair graph,
      // same recursive-CTE closure oracle; equality of the two operators
      // on random graphs is property-tested, this row pins the scale path
      // against the external oracle end-to-end.
      build = (s, dir) => {
        val docs = table(s, dir, "documents")
        val pairs = NearDup.minhashNearDupPairs(docs, "doc_id", "text",
          n = 3, minJ = 0.6, numHashes = 192, bandRows = 3)
        Components.alternatingComponents(docs, "doc_id", pairs)
          .select(col("id").as("doc_id"), col("comp").as("component"))
          .orderBy(col("doc_id"))
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
          SELECT w.id, s.dst FROM walk w JOIN sym s ON s.src = w.reach)
        SELECT id AS doc_id, min(reach) AS component
        FROM walk
        GROUP BY id
        ORDER BY doc_id""")),

    "q78_stream_attribution" -> Q(
      // Bounded run of the stream-stream interval attribution join (the
      // streaming face of q39's as-of): inner joins emit matches as both
      // sides arrive — watermark + interval predicate bound the keyed
      // STATE, not the output — so the emitted set equals the plain
      // interval join over the same events.
      build = (s, dir) => ntzOut(graft.streaming.BoundedRuns.emittedAttribution(s, dir)),
      oracle = Some("""
        SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
               c.event_id AS click_id, c.ts AS click_ts
        FROM events p
        JOIN events c ON c.user_id = p.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL '1 hour'
        ORDER BY p.user_id, purchase_id, click_id""")),

    "q79_stream_dedup" -> Q(
      // Bounded run of watermark-bounded streaming dedup
      // (dropDuplicatesWithinWatermark): the corpus staged twice, one
      // file per micro-batch — the duplicate copy is dropped via dedup
      // state (keys still in the horizon) or via the watermark's late-row
      // filter (keys already evicted), so the emitted set is the distinct
      // corpus. event_id is unique per row in the shipped data, making
      // the surviving arrivals byte-identical → deterministic.
      build = (s, dir) => ntzOut(graft.streaming.BoundedRuns.emittedDedup(s, dir)),
      oracle = Some("""
        SELECT user_id, event_id, ts, event_type, value
        FROM events
        ORDER BY event_id""")),

    "q80_stream_enrich" -> Q(
      // Bounded run of stream-static enrichment: the event stream
      // left-joined per micro-batch to the (broadcast) customer
      // dimension. Stateless — emitted set ≡ the batch left join.
      build = (s, dir) => ntzOut(graft.streaming.BoundedRuns.enrichedEvents(s, dir)),
      oracle = Some("""
        SELECT e.user_id, e.event_id, e.ts, e.event_type, e.value,
               c.c_name, c.c_mktsegment
        FROM events e
        LEFT JOIN customer c ON e.user_id = c.c_custkey
        ORDER BY e.event_id""")),

    "q81_mixture_sample" -> Q(
      // Temperature-weighted mixture rebalancing (α = ½): every language
      // thinned toward the geometric mean √(min_count·count) — the
      // LLM-pretraining mixture reweighting between q59's fully-balanced
      // α = 0 and the natural α = 1. Same audit shape as q59; which rows
      // survive is a pure function of doc_id (one correctly-rounded IEEE
      // sqrt, then integer arithmetic), so both engines select identical
      // rows.
      build = (s, dir) => {
        val docs = table(s, dir, "documents")
        val before = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_before"))
        val after = Sampling.mixtureSample(docs, "doc_id", "lang")
          .groupBy(col("lang")).agg(count(lit(1)).as("n_after"))
        before.join(after, Seq("lang"), "left")
          .select(col("lang"), col("n_before"),
            coalesce(col("n_after"), lit(0L)).as("n_after"))
          .orderBy(col("lang"))
      },
      oracle = Some(s"""
        WITH ${Sampling.sqlMixtureKeptCtes("doc_id", "lang")},
        after AS (SELECT lang, count(*) AS n_after FROM kept GROUP BY lang)
        SELECT c.lang, c.__cnt AS n_before, coalesce(a.n_after, 0) AS n_after
        FROM counts c LEFT JOIN after a USING (lang)
        ORDER BY c.lang""")),

    "q82_cluster_representatives" -> Q(
      // Quality-aware dedup: near-dup clusters (q52's components) each
      // keep their highest-token-count member (ties → smallest doc_id) —
      // "keep best", the policy real training pipelines want, vs q35/q52's
      // reproducibility-first "keep smallest id". One extra hash-agg pass
      // over the labeled members; the winner is a struct max, so no
      // window/sort and map-side partial aggregation applies.
      build = (s, dir) => {
        val docs = table(s, dir, "documents")
        val pairs = NearDup.minhashNearDupPairs(docs, "doc_id", "text",
          n = 3, minJ = 0.6, numHashes = 192, bandRows = 3)
        val comp = Components.connectedComponents(docs, "doc_id", pairs)
          .select(col("id").as("doc_id"), col("comp").as("component"))
        val scored = comp.join(
          docs.select(col("doc_id"),
            TextStats.tokenCount(col("text")).cast("long").as("tok")),
          Seq("doc_id"))
        Components.representatives(scored, "doc_id", "component", "tok")
          .select(col("component"), col("n_members"),
            col("rep_doc_id"), col("rep_tok"))
          .orderBy(col("component"))
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
        comp AS (SELECT id AS doc_id, min(reach) AS component FROM walk GROUP BY id),
        scored AS (
          SELECT c.component, c.doc_id,
            CAST(len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS tok
          FROM comp c JOIN documents d USING (doc_id)),
        best AS (
          SELECT component, doc_id AS rep_doc_id, tok AS rep_tok
          FROM scored
          QUALIFY row_number() OVER (
            PARTITION BY component ORDER BY tok DESC, doc_id ASC) = 1),
        n AS (SELECT component, count(*) AS n_members FROM scored GROUP BY component)
        SELECT n.component, n.n_members, b.rep_doc_id, b.rep_tok
        FROM n JOIN best b USING (component)
        ORDER BY n.component""")),

    "q83_snapshot_diff" -> Q(
      // Dataset-versioning diff: the per-(user, event_type) activity state
      // of the first time-quartile vs the last, classified added / removed
      // / changed / unchanged (all four classes occur at every shipped
      // SF). One full-outer shuffle join; sentinel-coalesced outputs keep
      // the comparator null-free.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        val bounds = ev.agg(min(unix_micros(col("ts"))).as("lo"),
          max(unix_micros(col("ts"))).as("hi"))
        val evb = ev.crossJoin(broadcast(bounds))
          .withColumn("us", unix_micros(col("ts")))
        def snap(pred: Column): DataFrame = evb.filter(pred)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"), max(col("event_id")).as("max_eid"))
        val a = snap(col("us") < expr("lo + (hi - lo) div 4"))
        val b = snap(col("us") >= expr("hi - (hi - lo) div 4"))
        SnapshotDiff.diff(a, b, Seq("user_id", "event_type"),
            Seq("n", "max_eid"))
          .select(col("user_id"), col("event_type"), col("change"),
            coalesce(col("old_n"), lit(-1L)).as("old_n"),
            coalesce(col("new_n"), lit(-1L)).as("new_n"),
            coalesce(col("old_max_eid"), lit(-1L)).as("old_max_eid"),
            coalesce(col("new_max_eid"), lit(-1L)).as("new_max_eid"))
          .orderBy(col("user_id"), col("event_type"))
      },
      oracle = Some("""
        WITH bnd AS (SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi FROM events),
        a AS (SELECT user_id, event_type, count(*) AS n, max(event_id) AS max_eid
              FROM events, bnd WHERE epoch_us(ts) < lo + (hi - lo) // 4
              GROUP BY 1, 2),
        b AS (SELECT user_id, event_type, count(*) AS n, max(event_id) AS max_eid
              FROM events, bnd WHERE epoch_us(ts) >= hi - (hi - lo) // 4
              GROUP BY 1, 2)
        SELECT coalesce(a.user_id, b.user_id) AS user_id,
          coalesce(a.event_type, b.event_type) AS event_type,
          CASE WHEN a.user_id IS NULL THEN 'added'
               WHEN b.user_id IS NULL THEN 'removed'
               WHEN a.n = b.n AND a.max_eid = b.max_eid THEN 'unchanged'
               ELSE 'changed' END AS change,
          coalesce(a.n, -1) AS old_n, coalesce(b.n, -1) AS new_n,
          coalesce(a.max_eid, -1) AS old_max_eid,
          coalesce(b.max_eid, -1) AS new_max_eid
        FROM a FULL JOIN b ON a.user_id = b.user_id
                          AND a.event_type = b.event_type
        ORDER BY user_id, event_type""")),

    "q84_interval_attribution" -> Q(
      // Point-in-interval range join: every purchase opens a half-open
      // 30-minute window; count the clicks (any user — deliberately
      // keyless, the pure range-join shape) landing inside it. Spark would
      // plan the raw `c.ts >= p.ts AND c.ts < p.end` condition as a
      // broadcast-nested-loop; RangeJoin turns it into a bin equi-join
      // (binSeconds = window length → ≤ 2 bins/interval). Left semantics
      // (zero-click purchases kept) composed by aggregating the inner
      // join and left-joining it back to the interval list.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("p_end"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("ts").as("c_ts"), col("value").as("c_value"))
        val hits = RangeJoin.pointInInterval(clicks, "c_ts",
            purchases, "p_ts", "p_end", binSeconds = 1800L)
          .groupBy(col("p_id"))
          .agg(count(lit(1)).as("n_clicks"),
            msum(col("c_value")).as("click_value"))
        purchases.select(col("p_id")).join(hits, Seq("p_id"), "left")
          .select(col("p_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
            col("click_value"))
          .orderBy(col("p_id"))
      },
      oracle = Some(s"""
        WITH p AS (
          SELECT event_id AS p_id, ts AS p_ts, ts + INTERVAL 30 MINUTE AS p_end
          FROM events WHERE event_type = 'purchase'),
        c AS (SELECT ts AS c_ts, value AS c_value
              FROM events WHERE event_type = 'click'),
        hits AS (
          SELECT p.p_id, count(*) AS n_clicks,
            ${sqlMsum("c.c_value")} AS click_value
          FROM p JOIN c ON c.c_ts >= p.p_ts AND c.c_ts < p.p_end
          GROUP BY p.p_id)
        SELECT p.p_id, coalesce(h.n_clicks, 0) AS n_clicks, h.click_value
        FROM p LEFT JOIN hits h USING (p_id)
        ORDER BY p.p_id"""),
      bench = true),

    "q85_scd2_history" -> Q(
      // SCD type-2 dimension build: each customer's order-priority change
      // log collapsed to validity intervals [effective_from, effective_to)
      // — one row per ACTUAL change, effective_to NULL on the current row.
      // One shuffle on the key, two window passes over the same sort
      // (exchange reused). o_orderkey is the same-day tie-break and rides
      // along in the output to keep the comparator total. The open
      // current-row end is sentinel-coalesced to 9999-12-31: a NULL
      // timestamp is NaT to the comparator and NaT ≠ NaT (same reason q67
      // filters NULL dates). The sentinel is cast to timestamp_ntz — an
      // LTZ literal would coerce the whole coalesced column to LTZ, which
      // Spark's default parquet writer emits as legacy INT96; nanosecond
      // readers overflow int64 on 9999-12-31 and wrap to 1816 (r5 q85
      // hash-fail). Verify/Bench also pin outputTimestampType=
      // TIMESTAMP_MICROS so no future LTZ-emitting query can regress this.
      build = (s, dir) =>
        Scd2.fromChangeLog(
            table(s, dir, "orders").select(
              col("o_custkey"), col("o_orderdate"),
              col("o_orderpriority"), col("o_orderkey")),
            keyCols = Seq("o_custkey"), tsCol = "o_orderdate",
            attrCols = Seq("o_orderpriority"), tieBreakCol = "o_orderkey")
          .withColumn("effective_to", coalesce(col("effective_to"),
            lit("9999-12-31 00:00:00").cast("timestamp_ntz")))
          .orderBy(col("o_custkey"), col("effective_from"), col("o_orderkey")),
      oracle = Some("""
        WITH chg AS (
          SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
            lag(o_orderpriority) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev,
            row_number() OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders),
        -- rn = 1: a key's FIRST version opens even when its attribute is
        -- NULL — lag-encoding alone misses it because NULL IS DISTINCT
        -- FROM NULL is false (the q289 class, found on the r9 hostile
        -- relational fixture; the engine's Scd2.fromChangeLog already
        -- opens first versions by row number)
        f AS (SELECT * FROM chg
              WHERE rn = 1 OR prev IS DISTINCT FROM o_orderpriority),
        scd AS (
          SELECT o_custkey, o_orderpriority,
            o_orderdate AS effective_from,
            coalesce(lead(o_orderdate) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
              TIMESTAMP '9999-12-31 00:00:00') AS effective_to,
            o_orderkey
          FROM f)
        SELECT * FROM scd
        ORDER BY o_custkey, effective_from, o_orderkey""")),

    "q86_zorder_layout" -> Q(
      // Z-order (Morton) clustering audit: lineitem keyed by the bit
      // interleave of (l_partkey, l_suppkey), rolled up per curve-aligned
      // bucket (key >> 14) with both dimensions' min/max — the bounds a
      // parquet row group written in this order would carry, i.e. the
      // pruning a scan on EITHER dimension gets from one physical sort.
      // Pure codegen'd integer arithmetic on the scan, one hash-agg.
      build = (s, dir) =>
        table(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            Layout.mortonKey(col("l_partkey"), col("l_suppkey")).as("zkey"))
          .groupBy(shiftright(col("zkey"), 14).as("zbucket"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("l_partkey")).as("min_part"),
            max(col("l_partkey")).as("max_part"),
            min(col("l_suppkey")).as("min_supp"),
            max(col("l_suppkey")).as("max_supp"))
          .orderBy(col("zbucket")),
      oracle = Some(s"""
        SELECT (${Layout.sqlMortonKey("l_partkey", "l_suppkey")} >> 14) AS zbucket,
          count(*) AS n_rows,
          min(l_partkey) AS min_part, max(l_partkey) AS max_part,
          min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
        FROM lineitem
        GROUP BY 1
        ORDER BY zbucket""")),

    "q87_heavy_hitters" -> Q(
      // Frequent tokens (share ≥ 1/1000) with exact counts via
      // Misra-Gries candidates + confirm pass — the full-vocabulary
      // shuffle a naive groupBy(term) would pay never happens; the oracle
      // IS that naive query, so the sketch's superset-then-confirm
      // equivalence is driver-checked.
      build = (s, dir) =>
        HeavyHitters.frequentTerms(table(s, dir, "documents"), "text",
          phiDen = 1000L),
      oracle = Some(HeavyHitters.sqlFrequentTerms("text", phiDen = 1000L)),
      bench = true),

    "q88_prefix_jaccard_pairs" -> Q(
      // Exact Jaccard pairs by PREFIX FILTERING — q27's answer (same
      // oracle) with an inverted index holding only each document's
      // rarest-shingle prefix, the exact-discovery path that stays linear
      // where the full inverted index goes quadratic on hot shingles.
      build = (s, dir) =>
        NearDup.prefixJaccardPairs(table(s, dir, "documents"),
            "doc_id", "text", n = 3, minJ = 0.6)
          .orderBy(col("id_a"), col("id_b")),
      oracle = Some(ngramJaccardOracle),
      bench = true),

    "q89_trailing_range_window" -> Q(
      // Trailing 7-day revenue per order priority — the RANGE-frame window
      // (value-based, gap-aware: a day with no orders still ages out of
      // the frame) the suite's ROWS/rank windows don't cover. Daily totals
      // first (hash-agg), then the range window over the small daily table
      // — never a per-row window over the raw fact table. The trailing
      // sum re-accumulates in exact decimal: 7 doubles added in frame
      // order would already be deterministic, but decimal keeps the
      // convention that NO float sum depends on order anywhere.
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("prio"),
            col("o_orderdate").cast("date").as("day"))
          .agg(msum(col("o_totalprice")).as("day_rev"))
          .withColumn("dayn",
            datediff(col("day"), lit("1970-01-01").cast("date")))
        val w = Window.partitionBy(col("prio")).orderBy(col("dayn"))
          .rangeBetween(-6, 0)
        daily
          .withColumn("rev_7d", m2(sum(dec(col("day_rev"))).over(w)))
          .withColumn("n_days_7d", count(lit(1)).over(w))
          .select(col("prio"), col("day"), col("day_rev"),
            col("rev_7d"), col("n_days_7d"))
          .orderBy(col("prio"), col("day"))
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
            ${sqlMsum("o_totalprice")} AS day_rev
          FROM orders GROUP BY 1, 2),
        d2 AS (
          SELECT *, datediff('day', DATE '1970-01-01', day) AS dayn
          FROM daily)
        SELECT prio, day, day_rev,
          CAST(round(sum(CAST(day_rev AS DECIMAL(12,2))) OVER w, 2) AS DOUBLE) AS rev_7d,
          count(*) OVER w AS n_days_7d
        FROM d2
        WINDOW w AS (PARTITION BY prio ORDER BY dayn
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY prio, day""")),

    "q90_mad_outliers" -> Q(
      // Robust outlier audit: per-priority order totals gated by
      // |x − median| > 2·MAD — the quality-filter form that is not dragged
      // by the outliers it hunts (mean±kσ has a 0% breakdown point). Two
      // grouped exact percentiles, each broadcast back onto the scan.
      // k = 2 (not the textbook 3): the r6 power audit showed 3·MAD (and
      // even 2.5) flags ZERO rows at every SF on the near-uniform
      // o_totalprice fixture — the gate column carried no test signal;
      // at 2·MAD four of five priorities flag 30-60 rows.
      build = (s, dir) =>
        Profiling.madOutliers(
            table(s, dir, "orders")
              .select(col("o_orderpriority").as("prio"),
                col("o_totalprice").as("x")),
            groupCol = "prio", valCol = "x", k = 2.0)
          .orderBy(col("prio")),
      oracle = Some("""
        WITH med AS (
          SELECT o_orderpriority AS prio,
            quantile_cont(o_totalprice, 0.5) AS med
          FROM orders GROUP BY 1),
        dev AS (
          SELECT o.o_orderpriority AS prio, m.med,
            abs(o.o_totalprice - m.med) AS adev
          FROM orders o JOIN med m ON o.o_orderpriority = m.prio),
        mad AS (
          SELECT prio, med, quantile_cont(adev, 0.5) AS mad
          FROM dev GROUP BY 1, 2)
        SELECT d.prio, count(*) AS n, m.med, m.mad,
          CAST(sum(CASE WHEN d.adev > 2.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m ON d.prio = m.prio
        GROUP BY d.prio, m.med, m.mad
        ORDER BY d.prio""")),

    "q91_incremental_state" -> Q(
      // Incremental aggregation maintenance: history state (first three
      // time-quartiles) merged with the delta batch (last quartile) must
      // equal the full recompute — which is exactly what the oracle runs.
      // The nightly-pipeline shape: aggregate the new slice only, merge
      // one-row-per-key states; exact-decimal sums make the merged total
      // independent of batch boundaries and arrival order.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        val bounds = ev.agg(min(unix_micros(col("ts"))).as("lo"),
          max(unix_micros(col("ts"))).as("hi"))
        val evb = ev.crossJoin(broadcast(bounds))
          .withColumn("us", unix_micros(col("ts")))
        val cut = expr("hi - (hi - lo) div 4")
        val hist = Incremental.aggState(
          evb.filter(col("us") < cut), Seq("user_id"), "value")
        val delta = Incremental.aggState(
          evb.filter(col("us") >= cut), Seq("user_id"), "value")
        Incremental.merge(hist, delta, Seq("user_id"))
          .select(col("user_id"), col("st_n").as("n_events"),
            m2(col("st_sum")).as("total_value"),
            col("st_min").as("min_value"), col("st_max").as("max_value"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        SELECT user_id, count(value) AS n_events,
          ${sqlMsum("value")} AS total_value,
          min(value) AS min_value, max(value) AS max_value
        FROM events
        GROUP BY user_id
        ORDER BY user_id""")),

    "q92_pmi_collocations" -> Q(
      // Top bigram collocations by PMI (Church & Hanks '89): multiword-
      // expression mining over the corpus — bigrams via one lead window
      // over narrow (id, pos, word) rows, two vocabulary-keyed hash aggs,
      // top-k as TakeOrdered. PMI snapped to 8 decimals (ln differs in the
      // last ulp across engines; ties break on the words).
      build = (s, dir) =>
        TextStats.pmiCollocations(table(s, dir, "documents"),
          "doc_id", "text", minCount = 5L, k = 100),
      oracle = Some(TextStats.sqlPmiCollocations("doc_id", "text",
        minCount = 5L, k = 100))),

    "q93_hll_distinct" -> Q(
      // Mergeable HyperLogLog distinct-users per event type — the at-scale
      // replacement for count(DISTINCT). The Spark side deliberately
      // builds TWO sketches (even/odd user halves, the daily-rollup
      // shape) and merges them; the oracle sketches the whole table
      // directly — their hash-equality proves merge ≡ direct, which is
      // the property that makes sketches roll up across days without
      // re-reading raw keys. Estimate arithmetic is exact-integer up to
      // one final division (see Hll scaladoc); the exact count rides
      // along to audit the error. The counted entity is the USER-DAY
      // (distinct active days × users): the r6 power audit found plain
      // user sets saturated at all 150 fixture users — five identical
      // register sets made the per-group machinery untestable; user-day
      // cardinalities differ per type, so each group exercises its own
      // registers.
      build = (s, dir) => {
        // user_id IS NOT NULL: the counted entity is the user-day, and a
        // NULL user is no entity — exactly what count(DISTINCT user_id)
        // semantics do. Without the filter, concat_ws would SKIP the
        // NULL (folding it onto a date-only key) while the oracle's ||
        // nulls the whole key, and the even/odd sketch split would drop
        // the rows the exact count kept.
        val base = table(s, dir, "events")
          .filter(col("user_id").isNotNull)
          .select(col("event_type").as("g"), col("user_id"),
            concat_ws("#", col("user_id"), col("ts").cast("date")).as("key"))
        val hist = Hll.sketch(base.filter(col("user_id") % 2 === 0), Seq("g"), "key")
        val delta = Hll.sketch(base.filter(col("user_id") % 2 =!= 0), Seq("g"), "key")
        val est = Hll.estimate(Hll.merge(hist, delta, Seq("g")), Seq("g"))
        val exact = base.groupBy(col("g"))
          .agg(countDistinct(col("key")).as("n_exact"))
        est.join(exact, "g")
          .select(col("g").as("event_type"), col("n_exact"), col("occupied"),
            col("zeros"), col("s_scaled"), col("hll_est"),
            round(abs(col("hll_est") - col("n_exact")) / col("n_exact")
              * lit(100.0), 2).as("err_pct"))
          .orderBy(col("event_type"))
      },
      oracle = Some(s"""
        WITH ${Hll.sqlSketchCtes("SELECT event_type AS g, user_id || '#' || CAST(CAST(ts AS DATE) AS VARCHAR) AS key FROM events WHERE user_id IS NOT NULL")},
        ex AS (
          SELECT event_type AS g,
            count(DISTINCT user_id || '#' || CAST(CAST(ts AS DATE) AS VARCHAR))
              AS n_exact
          FROM events WHERE user_id IS NOT NULL GROUP BY 1)
        SELECT e.g AS event_type, x.n_exact, e.occupied, e.zeros,
          e.s_scaled, e.hll_est,
          round(abs(e.hll_est - x.n_exact) / x.n_exact * 100.0, 2) AS err_pct
        FROM hll_est e JOIN ex x ON e.g = x.g
        ORDER BY event_type"""),
      bench = true),
  )
}
