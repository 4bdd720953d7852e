package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Stable._
import graft.operators._

/** The operator catalog: every implemented operator from SURVEY.md §2 (plus
  * the LLM-data-pipeline extensions) exposed as a runnable query over the
  * TESTDATA star schema, each paired with a DuckDB oracle in ANSI SQL.
  *
  * Conventions that make the oracle hash-compare exact:
  *  - money/metric aggregation in exact DECIMAL, finalized to double
  *    ([[graft.functions.Stable]]) — combine-order-independent;
  *  - every query has a total deterministic ORDER BY (ties broken by key);
  *  - aggregate output column names aliased identically on both sides.
  */
object Queries {

  final case class Q(
      build: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      bench: Boolean = false,
      whyNoOracle: Option[String] = None)

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(s, dir, name)

  /** Casts every top-level TIMESTAMP_LTZ output column to TIMESTAMP_NTZ.
    * Applied as the LAST step of any query that emits a raw timestamp:
    * internally `ts` is LTZ (unix_micros & friends require it), but an
    * LTZ OUTPUT column is a serialization hazard — Spark's default
    * parquet writer emits it as legacy INT96 (r5 q85: far-future values
    * wrap in nanosecond readers) and the TIMESTAMP_MICROS writer marks
    * it UTC-adjusted, which oracle-side readers surface as a tz-AWARE
    * type while the DuckDB oracle computes naive timestamps. Under the
    * engine's fixed UTC session the NTZ cast is value-identity, and the
    * written INT64 micros column reads back naive in any engine.
    * Verify.assertNoLtz enforces this convention catalog-wide. */
  private def ntzOut(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.TimestampType =>
          d.withColumn(f.name, col(f.name).cast("timestamp_ntz"))
        case _ => d
      }
    }

  // Shared SQL fragments (mirrored by the Column helpers in Stable).
  private val revSql = sqlRevenue("l_extendedprice", "l_discount")
  private val chargeSql = sqlCharge("l_extendedprice", "l_discount", "l_tax")

  /** Where q73 persists the fitted IVF centroid table — model-as-data,
    * readable by BOTH engines (the Spark search half and the DuckDB
    * oracle), which is what makes an ANN search with a *trained*
    * quantizer oracle-checkable at all. Absolute path: Verify/Bench run
    * under sbt with the repo root as CWD, but nothing should depend on
    * that. */
  private val ivfCentroidPath = "/root/repo/target/graft/ivf_centroids"

  /** Shared oracle for q02 and its salted twin q50 — by construction the
    * salted join must produce identical rows. */
  private val revenueByNationOracle: String = s"""
        SELECT r_name, n_name,
          ${sqlMsum("o_totalprice")} AS revenue,
          count(*) AS n_orders,
          count(DISTINCT o_custkey) AS n_custs
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name"""

  val all: Seq[(String, Q)] = Seq(

    // ------------------------------------------------------------------
    // A-class: aggregation / profiling (SURVEY §2.4)
    // ------------------------------------------------------------------

    "q01_pricing_summary" -> Q(
      build = (s, dir) => {
        val cutoff = lit("1998-09-02").cast("timestamp")
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
        table(s, dir, "orders")
          .withColumn("priority_num", substring(col("o_orderpriority"), 1, 1).cast("int"))
          .withColumn("status_code",
            when(col("o_orderstatus") === "F", 1)
              .when(col("o_orderstatus") === "O", 0)
              .otherwise(lit(null).cast("int")))
          .groupBy(col("priority_num"), col("status_code"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("priority_num"), col("status_code").asc_nulls_last),
      oracle = Some("""
        SELECT CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS priority_num,
          CASE WHEN o_orderstatus = 'F' THEN 1
               WHEN o_orderstatus = 'O' THEN 0
               ELSE NULL END AS status_code,
          count(*) AS cnt
        FROM orders
        GROUP BY 1, 2
        ORDER BY priority_num, status_code ASC NULLS LAST""")),

    "q08_brand_revenue" -> Q(
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
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
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy(col("event_type"))
          .agg(
            count(col("k")).as("n_k"),
            sum(col("k")).as("sum_k"),
            (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
          .orderBy(col("event_type")),
      oracle = Some("""
        SELECT event_type,
          count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_k,
          CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
          CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE)
            / count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS avg_k
        FROM events
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
        table(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            n.as("n"),
            (sumQ / n).as("mean_qty"),
            sqrt((sumSq - sumQ * sumQ / n) / (n - 1)).as("std_qty"),
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
          ${sqlMsum("l_quantity")} / count(l_quantity) AS mean_qty,
          sqrt((CAST(round(sum(CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2))), 4) AS DOUBLE)
                - ${sqlMsum("l_quantity")} * ${sqlMsum("l_quantity")} / count(l_quantity))
               / (count(l_quantity) - 1)) AS std_qty,
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
          CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
          CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE) / count(*) AS avg_tokens
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
          len(regexp_split_to_array(trim(text), '\\s+')) AS q_tokens,
          length(regexp_replace(text, '[^.!?]', '', 'g')) AS q_punct,
          CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
            / len(regexp_split_to_array(trim(text), '\\s+')) AS avg_token_len,
          CAST(length(regexp_replace(text, '[^.!?]', '', 'g')) AS DOUBLE)
            / length(text) AS punct_ratio,
          CAST(${TextStats.sqlStopwordCount("text")} AS DOUBLE)
            / len(regexp_split_to_array(trim(text), '\\s+')) AS stopword_ratio
        FROM documents
        ORDER BY doc_id""")),

    "q25_knn_bruteforce" -> Q(
      build = (s, dir) => {
        val e = table(s, dir, "embeddings")
        Vectors.bruteForceKnn(e.filter(col("vec_id") < 20), e, "vec_id", "embedding", k = 3)
      },
      oracle = Some("""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
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
        val e = table(s, dir, "embeddings")
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
        WITH v AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
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
        SELECT doc_id, simhash FROM sk
        ORDER BY doc_id"""),
      bench = true),

    "q30_embedding_near_dup" -> Q(
      // Embedding near-dup report, top-50 pairs >= 0.4 — via the 100 TB
      // plan: LSH bucket candidates -> exact cosine verify (no cross join
      // anywhere; Vectors.cosineNearDupPairs is the O(n²) twin kept for
      // verification). At the default (planes, tables) the candidate set
      // contains every >=0.4 pair on the testdata geometry (TuneAnn sweep,
      // SimilaritySpec), so the oracle is the same exact-pairs SQL.
      build = (s, dir) =>
        Similarity.lshNearDupPairs(table(s, dir, "embeddings"), "vec_id",
            "embedding", minSim = 0.4)
          .orderBy(col("sim").desc, col("id_a"), col("id_b"))
          .limit(50),
      oracle = Some("""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            list_dot_product(a.emb, b.emb)
              / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS sim
          FROM v a JOIN v b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b, sim FROM pairs
        WHERE sim >= 0.4
        ORDER BY sim DESC, id_a, id_b
        LIMIT 50"""),
      bench = true),

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
        val e = table(s, dir, "embeddings")
        Similarity.annTopK(e.filter(col("vec_id") < 20), e, "vec_id",
            "embedding", k = 3)
          .orderBy(col("query_id"), col("rank"))
      },
      oracle = Some("""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
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
        table(s, dir, "embeddings")
          .select(col("label"), posexplode(Vectors.asDouble(col("embedding")))
            .as(Seq("pos", "v")))
          .groupBy(col("label"), (col("pos") + 1).as("dim"))
          .agg(davg(col("v")).as("centroid"), count(lit(1)).as("n"))
          .orderBy(col("label"), col("dim")),
      oracle = Some(s"""
        WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
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
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
          FROM documents),
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
            len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
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
          SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS t
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
        Vectors.int8QuantAudit(table(s, dir, "embeddings"), "vec_id", "embedding")
          .withColumnRenamed("id", "vec_id")
          .orderBy(col("vec_id")),
      oracle = Some("""
        WITH e AS (
          SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS v
          FROM embeddings),
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
            len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
            CAST(${TextStats.sqlStopwordCount("text")} AS DOUBLE)
              / len(regexp_split_to_array(trim(text), '\\s+')) AS sw_ratio
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
        val toks = split(trim(col("text")), "\\s+")
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
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
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
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
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
        val e = table(s, dir, "embeddings")
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
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        ckey AS (
          SELECT 'n' || count(*) || '_k' ||
            CAST(sum(CAST(floor(abs(CAST(embedding[1] AS DOUBLE)) * 1000000.0)
              AS BIGINT)) AS VARCHAR) AS sub
          FROM embeddings),
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
              FROM events)
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
          FROM flagged),
        sess AS (
          SELECT user_id, session_seq, count(*) AS n_events,
            min(ts) AS session_start, max(ts) AS session_end
          FROM numbered
          GROUP BY user_id, session_seq),
        wm AS (SELECT max(epoch_us(ts)) - 1800000000 AS w FROM events)
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
            CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT) AS tok
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
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
          FROM orders),
        f AS (SELECT * FROM chg
              WHERE prev IS DISTINCT FROM o_orderpriority),
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
        val base = table(s, dir, "events")
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
        WITH ${Hll.sqlSketchCtes("SELECT event_type AS g, user_id || '#' || CAST(CAST(ts AS DATE) AS VARCHAR) AS key FROM events")},
        ex AS (
          SELECT event_type AS g,
            count(DISTINCT user_id || '#' || CAST(CAST(ts AS DATE) AS VARCHAR))
              AS n_exact
          FROM events GROUP BY 1)
        SELECT e.g AS event_type, x.n_exact, e.occupied, e.zeros,
          e.s_scaled, e.hll_est,
          round(abs(e.hll_est - x.n_exact) / x.n_exact * 100.0, 2) AS err_pct
        FROM hll_est e JOIN ex x ON e.g = x.g
        ORDER BY event_type"""),
      bench = true),

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
        Auc.groupedAuc(
            table(s, dir, "orders").select(
              col("o_orderpriority").as("prio"),
              col("o_totalprice").as("score"),
              (col("o_orderstatus") === "F").cast("int").as("y")),
            Seq("prio"), "score", "y")
          .orderBy(col("prio")),
      oracle = Some(s"""
        WITH ${Auc.sqlAucCtes("orders", "o_orderpriority", "o_totalprice",
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
        val ev = table(s, dir, "events")
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
        WITH ${Kmv.sqlCtes("SELECT event_type AS g, user_id || '#' || CAST(CAST(ts AS DATE) AS VARCHAR) AS key FROM events")},
        ex AS (SELECT DISTINCT event_type AS g,
          user_id || '#' || CAST(CAST(ts AS DATE) AS VARCHAR) AS key
          FROM events),
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
          SELECT user_id, event_id, ts, event_type,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events),
        numbered AS (
          SELECT user_id, ts, event_id, event_type,
            sum(CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM lagged),
        paths AS (
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
          .select(explode(split(trim(col("text")), "\\s+")).as("w"))
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
            SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
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
          SELECT d.doc_id, regexp_split_to_array(trim(d.text), '\\s+') AS t
          FROM documents d JOIN keep2 USING (doc_id)),
        c_sh AS MATERIALIZED (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, len(t) - 2),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
          FROM c_toks),
        c_pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
          FROM c_sh a JOIN c_sh b ON a.doc_id < b.doc_id
          WHERE len(a.s) > 0 AND len(b.s) > 0),
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
        val li = table(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
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
            sum(col("w_us").cast("decimal(20,0)")
              * col("value").cast("decimal(12,2)"))
              .cast("decimal(38,2)").as("swv"))
          .select(col("user_id"), col("n_intervals"), col("span_us"),
            round(col("swv").cast("double")
              / col("span_us").cast("double"), 8).as("tw_avg"),
            )
          .orderBy(col("user_id"))
      },
      oracle = Some("""
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
          round(CAST(CAST(sum(CAST(w_us AS DECIMAL(20,0))
              * CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE)
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
      // accumulates in exact decimal over a banded self-join of the
      // bounded daily table (window cap 30 days; 2^-30 ~ 1e-9 tail).
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("prio"),
            col("o_orderdate").cast("date").as("day"))
          .agg(msum(col("o_totalprice")).as("day_rev"))
          .withColumn("dayn",
            datediff(col("day"), lit("1970-01-01").cast("date")))
        val terms = daily.as("a").join(daily.as("b"),
            col("a.prio") === col("b.prio") &&
              col("b.dayn") <= col("a.dayn") &&
              col("b.dayn") >= col("a.dayn") - 30)
          .select(col("a.prio").as("prio"), col("a.day").as("day"),
            (col("a.dayn") - col("b.dayn")).as("k"),
            col("b.day_rev").as("rev"))
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
          .withColumn("ema", round(col("ema_num") / col("ema_den"), 4))
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
          round(
            CAST(round(sum(CAST(round(rev * decay, 8) AS DECIMAL(24,8))), 4)
              AS DOUBLE)
            / CAST(round(sum(CAST(round(decay, 8) AS DECIMAL(12,8))), 8)
              AS DOUBLE), 4) AS ema
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
        val perCust = table(s, dir, "orders")
          .groupBy(col("o_custkey").as("cust"))
          .agg(msum(col("o_totalprice")).as("rev"))
        // distributed rank (PrefixSum.rnk), not a single-partition window
        val ranked = PrefixSum.running(perCust, "rev", "cust", "rev",
            descending = false)
          .withColumn("i", col("rnk"))
        ranked.agg(
            count(lit(1)).as("n_custs"),
            dsum(col("rev")).as("total_rev"),
            round(sum(col("i").cast("decimal(10,0)")
              * col("rev").cast("decimal(18,2)")), 2).cast("double")
              .as("weighted"))
          .withColumn("gini", round(
            lit(2.0) * col("weighted")
              / (col("n_custs").cast("double") * col("total_rev"))
              - (col("n_custs") + 1).cast("double")
                / col("n_custs").cast("double"), 8))
          .select(col("n_custs"), col("total_rev"), col("gini"))
      },
      oracle = Some(s"""
        WITH per_cust AS (
          SELECT o_custkey AS cust, ${sqlMsum("o_totalprice")} AS rev
          FROM orders GROUP BY 1),
        ranked AS (
          SELECT rev, row_number() OVER (ORDER BY rev, cust) AS i
          FROM per_cust)
        SELECT count(*) AS n_custs,
          ${sqlDsum("rev")} AS total_rev,
          round(2.0 * CAST(round(sum(CAST(i AS DECIMAL(10,0))
              * CAST(rev AS DECIMAL(18,2))), 2) AS DOUBLE)
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
              len(regexp_split_to_array(trim(text), '\\s+')) AS w,
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
        val p = table(s, dir, "part").select(
          col("p_partkey").as("id"), col("p_name").as("name"),
          concat_ws("|", col("p_brand"),
            split(col("p_name"), " ").getItem(0),
            shiftright(length(col("p_name")), 3)).as("blk"))
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
            explode(split(trim(col("text")), "\\s+")).as("w"))
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
            unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
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
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, len(t) - 2),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
          FROM toks),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            len(list_intersect(a.s, b.s)) AS common,
            len(a.s) AS sz_a, len(b.s) AS sz_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(a.s) > 0 AND len(b.s) > 0
            AND len(list_intersect(a.s, b.s)) > 0)
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
        val digits = table(s, dir, "orders")
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
          FROM orders GROUP BY 1),
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
        val p = table(s, dir, "part").select(
          col("p_partkey").as("id"), col("p_name").as("name"),
          concat_ws("|", col("p_brand"),
            split(col("p_name"), " ").getItem(0),
            shiftright(length(col("p_name")), 3)).as("blk"))
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
        val p = table(s, dir, "part").select(
          col("p_partkey").as("id"), col("p_name").as("name"),
          concat_ws("|", col("p_brand"),
            split(col("p_name"), " ").getItem(0)).as("blk"))
        val a = p.select(col("blk"), col("id").as("id_a"), col("name").as("name_a"))
        val b = p.select(col("blk"), col("id").as("id_b"), col("name").as("name_b"))
        val edges = a.join(b, Seq("blk"))
          .filter(col("id_a") < col("id_b") && col("name_a") =!= col("name_b"))
          .filter(call_function("graft_jaro_winkler",
            col("name_a"), col("name_b")) >= 0.88)
          .select(col("id_a"), col("id_b"))
        val comp = Components.connectedComponents(
          p.select(col("id")), "id", edges)
        val sizes = comp.groupBy(col("comp"))
          .agg(count(lit(1)).as("n_members"))
        comp.join(sizes, "comp")
          .join(p.select(col("id").as("comp"), col("name").as("canonical_name")),
            "comp")
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
          SELECT component, count(*) AS n_members FROM comp GROUP BY 1)
        SELECT c.id, c.component, s.n_members, cn.name AS canonical_name
        FROM comp c
        JOIN sizes s USING (component)
        JOIN p cn ON cn.id = c.component
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

    "q155_rfm_segments" -> Q(
      // RFM segmentation — the classic customer-value grid: per active
      // customer, Recency (days since last order, lower is better),
      // Frequency (order count), Monetary (exact-decimal revenue), each
      // cut at its exact quintiles into a 1-5 score, concatenated into
      // the 111..555 segment code and rolled up. Thresholds are bounded
      // model metadata (3 × 4 doubles) compiled onto the scan —
      // Binning's convention; integer-tied F collapses bins
      // deterministically via the strict-> rule on identical doubles.
      build = (s, dir) => {
        val ref = table(s, dir, "orders")
          .agg(max(col("o_orderdate").cast("date")).as("ref"))
        val rfm = table(s, dir, "orders")
          .groupBy(col("o_custkey").as("cust"))
          .agg(max(col("o_orderdate").cast("date")).as("last_day"),
            count(lit(1)).as("f"),
            msum(col("o_totalprice")).as("m"))
          .crossJoin(broadcast(ref))
          .withColumn("r", datediff(col("ref"), col("last_day")).cast("double"))
          .withColumn("fd", col("f").cast("double"))
        val rTh = Binning.quantileThresholds(rfm, "r", 5)
        val fTh = Binning.quantileThresholds(rfm, "fd", 5)
        val mTh = Binning.quantileThresholds(rfm, "m", 5)
        val scored = rfm.select(col("cust"), col("m"),
          (lit(5) - Binning.binIndex(col("r"), rTh)).as("r_score"),
          (Binning.binIndex(col("fd"), fTh) + lit(1)).as("f_score"),
          (Binning.binIndex(col("m"), mTh) + lit(1)).as("m_score"))
        scored
          .withColumn("segment", concat(col("r_score"), col("f_score"),
            col("m_score")))
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_customers"),
            dsum(col("m")).as("total_monetary"))
          .orderBy(col("segment"))
      },
      oracle = Some(s"""
        WITH rfm AS (
          SELECT o_custkey AS cust,
            CAST(datediff('day', max(CAST(o_orderdate AS DATE)),
              (SELECT max(CAST(o_orderdate AS DATE)) FROM orders))
              AS DOUBLE) AS r,
            CAST(count(*) AS DOUBLE) AS fd,
            ${sqlMsum("o_totalprice")} AS m
          FROM orders GROUP BY 1),
        th AS (
          SELECT quantile_cont(r, [0.2, 0.4, 0.6, 0.8]) AS rq,
            quantile_cont(fd, [0.2, 0.4, 0.6, 0.8]) AS fq,
            quantile_cont(m, [0.2, 0.4, 0.6, 0.8]) AS mq
          FROM rfm),
        scored AS (
          SELECT cust, m,
            5 - ((CASE WHEN r > rq[1] THEN 1 ELSE 0 END)
               + (CASE WHEN r > rq[2] THEN 1 ELSE 0 END)
               + (CASE WHEN r > rq[3] THEN 1 ELSE 0 END)
               + (CASE WHEN r > rq[4] THEN 1 ELSE 0 END)) AS r_score,
            1 + (CASE WHEN fd > fq[1] THEN 1 ELSE 0 END)
              + (CASE WHEN fd > fq[2] THEN 1 ELSE 0 END)
              + (CASE WHEN fd > fq[3] THEN 1 ELSE 0 END)
              + (CASE WHEN fd > fq[4] THEN 1 ELSE 0 END) AS f_score,
            1 + (CASE WHEN m > mq[1] THEN 1 ELSE 0 END)
              + (CASE WHEN m > mq[2] THEN 1 ELSE 0 END)
              + (CASE WHEN m > mq[3] THEN 1 ELSE 0 END)
              + (CASE WHEN m > mq[4] THEN 1 ELSE 0 END) AS m_score
          FROM rfm, th)
        SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
            || CAST(m_score AS VARCHAR) AS segment,
          count(*) AS n_customers,
          ${sqlDsum("m")} AS total_monetary
        FROM scored
        GROUP BY 1
        ORDER BY segment""")),

    "q156_association_rules" -> Q(
      // Market-basket association rules over order line items: pair
      // support from a within-basket self-join (pairs bounded by basket
      // size squared, never a global cross), confidence and lift as
      // fixed-shape ratios of exact counts, minimum pair support 3,
      // ranked by lift. The standard co-purchase recommender audit.
      build = (s, dir) => {
        val basket = table(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val n = basket.agg(
          countDistinct(col("o")).cast("double").as("n_orders"))
        val item = basket.groupBy(col("p")).agg(count(lit(1)).as("cnt"))
        val pairs = basket.alias("a").join(basket.alias("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
          .agg(count(lit(1)).as("pair_cnt"))
          .filter(col("pair_cnt") >= 3)
        pairs
          .join(item.select(col("p").as("p1"), col("cnt").as("c1")), "p1")
          .join(item.select(col("p").as("p2"), col("cnt").as("c2")), "p2")
          .crossJoin(broadcast(n))
          .select(col("p1"), col("p2"), col("pair_cnt"), col("c1"), col("c2"),
            round(col("pair_cnt").cast("double") / col("c1").cast("double"), 8)
              .as("confidence"),
            round(col("pair_cnt").cast("double") * col("n_orders")
              / (col("c1").cast("double") * col("c2").cast("double")), 8)
              .as("lift"))
          .orderBy(col("lift").desc, col("p1"), col("p2"))
      },
      oracle = Some("""
        WITH basket AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        n AS (SELECT CAST(count(DISTINCT o) AS DOUBLE) AS n_orders FROM basket),
        item AS (SELECT p, count(*) AS cnt FROM basket GROUP BY 1),
        pairs AS (
          SELECT a.p AS p1, b.p AS p2, count(*) AS pair_cnt
          FROM basket a JOIN basket b ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2
          HAVING count(*) >= 3)
        SELECT pr.p1, pr.p2, pr.pair_cnt, i1.cnt AS c1, i2.cnt AS c2,
          round(CAST(pr.pair_cnt AS DOUBLE) / CAST(i1.cnt AS DOUBLE), 8)
            AS confidence,
          round(CAST(pr.pair_cnt AS DOUBLE) * n.n_orders
            / (CAST(i1.cnt AS DOUBLE) * CAST(i2.cnt AS DOUBLE)), 8) AS lift
        FROM pairs pr
        JOIN item i1 ON i1.p = pr.p1
        JOIN item i2 ON i2.p = pr.p2
        CROSS JOIN n
        ORDER BY lift DESC, p1, p2""")),

    "q157_delta_dedup" -> Q(
      // Incremental ingest dedup — the shape a daily pipeline actually
      // runs: the delta batch (doc_id % 10 = 0, simulating new arrivals)
      // scored against the CORPUS (the rest) via delta×corpus inverted-
      // index join only — the corpus is never self-paired. Every delta
      // doc gets an admission decision: suppressed if any corpus match at
      // Jaccard >= 0.6 (best match = max jaccard, tie -> smallest corpus
      // id), admitted otherwise.
      build = (s, dir) => {
        val docs = table(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 10 =!= 0)
        val delta = docs.filter(col("doc_id") % 10 === 0)
        val pairs = NearDup.deltaJaccardPairs(corpus, delta,
          "doc_id", "text", n = 3, minJ = 0.6)
        val best = pairs
          .groupBy(col("delta_id"))
          .agg(count(lit(1)).as("n_matches"), max(col("jaccard")).as("best_j"))
        // renamed columns on the aggregated side: pairs appears on both
        // legs of this join, so bare names would be ambiguous
        val bestId = pairs
          .join(best.select(col("delta_id").as("b_did"), col("best_j")),
            col("delta_id") === col("b_did") && col("jaccard") === col("best_j"))
          .groupBy(col("delta_id"))
          .agg(min(col("corpus_id")).as("best_corpus_id"))
        delta.select(col("doc_id").as("delta_id"))
          .join(best, Seq("delta_id"), "left")
          .join(bestId, Seq("delta_id"), "left")
          .select(col("delta_id"),
            coalesce(col("n_matches"), lit(0L)).as("n_matches"),
            col("best_corpus_id"),
            when(col("n_matches").isNull, "admitted")
              .otherwise("suppressed").as("decision"))
          .orderBy(col("delta_id"))
      },
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, len(t) - 2),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
          FROM toks),
        pairs AS (
          SELECT d.doc_id AS delta_id, c.doc_id AS corpus_id,
            CAST(len(list_intersect(d.s, c.s)) AS DOUBLE)
              / (len(d.s) + len(c.s) - len(list_intersect(d.s, c.s)))
              AS jaccard
          FROM sh d JOIN sh c
            ON d.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
          WHERE len(d.s) > 0 AND len(c.s) > 0
            AND len(list_intersect(d.s, c.s)) > 0
            AND CAST(len(list_intersect(d.s, c.s)) AS DOUBLE)
              / (len(d.s) + len(c.s) - len(list_intersect(d.s, c.s))) >= 0.6),
        best AS (
          SELECT delta_id, count(*) AS n_matches, max(jaccard) AS best_j
          FROM pairs GROUP BY 1),
        best_id AS (
          SELECT p.delta_id, min(p.corpus_id) AS best_corpus_id
          FROM pairs p JOIN best b
            ON p.delta_id = b.delta_id AND p.jaccard = b.best_j
          GROUP BY 1)
        SELECT d.doc_id AS delta_id,
          coalesce(b.n_matches, 0) AS n_matches,
          i.best_corpus_id,
          CASE WHEN b.n_matches IS NULL THEN 'admitted'
               ELSE 'suppressed' END AS decision
        FROM documents d
        LEFT JOIN best b ON b.delta_id = d.doc_id
        LEFT JOIN best_id i ON i.delta_id = d.doc_id
        WHERE d.doc_id % 10 = 0
        ORDER BY delta_id""")),

    "q158_source_dup_matrix" -> Q(
      // Cross-source duplication matrix: which sources copy which —
      // near-dup pairs (q27's exact machinery) rolled up by unordered
      // source pair with the mean Jaccard. The curation view that
      // decides which feed to drop when two overlap.
      build = (s, dir) => {
        val docs = table(s, dir, "documents")
        val pairs = NearDup.jaccardPairs(docs, "doc_id", "text",
          n = 3, minJ = 0.6)
        val meta = docs.select(col("doc_id"), col("source"))
        pairs
          .join(meta.select(col("doc_id").as("id_a"), col("source").as("src_a")), "id_a")
          .join(meta.select(col("doc_id").as("id_b"), col("source").as("src_b")), "id_b")
          .select(least(col("src_a"), col("src_b")).as("source_lo"),
            greatest(col("src_a"), col("src_b")).as("source_hi"),
            col("jaccard"))
          .groupBy(col("source_lo"), col("source_hi"))
          .agg(count(lit(1)).as("n_pairs"),
            round(davg(round(col("jaccard"), 8)), 8).as("avg_jaccard"))
          .orderBy(col("source_lo"), col("source_hi"))
      },
      oracle = Some(s"""
        WITH $ngramPairCtes,
        flagged AS (
          SELECT p.id_a, p.id_b, p.jaccard,
            least(da.source, db.source) AS source_lo,
            greatest(da.source, db.source) AS source_hi
          FROM pairs p
          JOIN documents da ON da.doc_id = p.id_a
          JOIN documents db ON db.doc_id = p.id_b
          WHERE p.jaccard >= 0.6)
        SELECT source_lo, source_hi, count(*) AS n_pairs,
          round(${sqlDavg("round(jaccard, 8)")}, 8) AS avg_jaccard
        FROM flagged
        GROUP BY 1, 2
        ORDER BY source_lo, source_hi""")),

    "q159_k_anonymity" -> Q(
      // Privacy-release audit over the event log: quasi-identifier =
      // (event_type, day-of-week, hour) — k-anonymity (smallest QI group;
      // share of events in groups under k=5) and l-diversity (distinct
      // users per group; groups under l=3 leak membership even when
      // k-anonymous). One pass to QI groups, two bounded aggregations —
      // the pre-publication check a dataset release pipeline runs next
      // to q61's PII redaction.
      build = (s, dir) => {
        val qi = table(s, dir, "events")
          .select(col("event_type"),
            dayofweek(col("ts")).cast("long").as("dow"),
            hour(col("ts")).cast("long").as("hr"),
            col("user_id"))
        val groups = qi.groupBy(col("event_type"), col("dow"), col("hr"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("l_div"))
        groups.agg(
            count(lit(1)).as("n_groups"),
            sum(col("n")).as("n_events"),
            min(col("n")).as("k_anonymity"),
            sum(when(col("n") < 5, 1L).otherwise(0L)).as("groups_lt_k5"),
            round(sum(when(col("n") < 5, col("n")).otherwise(0L))
              .cast("double") / sum(col("n")).cast("double"), 8)
              .as("pct_events_lt_k5"),
            min(col("l_div")).as("l_diversity"),
            sum(when(col("l_div") < 3, 1L).otherwise(0L)).as("groups_lt_l3"))
      },
      oracle = Some("""
        WITH groups AS (
          SELECT event_type,
            CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
            CAST(hour(ts) AS BIGINT) AS hr,
            count(*) AS n,
            count(DISTINCT user_id) AS l_div
          FROM events GROUP BY 1, 2, 3)
        SELECT count(*) AS n_groups,
          CAST(sum(n) AS BIGINT) AS n_events,
          min(n) AS k_anonymity,
          CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
            AS groups_lt_k5,
          round(CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE)
            / CAST(sum(n) AS DOUBLE), 8) AS pct_events_lt_k5,
          min(l_div) AS l_diversity,
          CAST(sum(CASE WHEN l_div < 3 THEN 1 ELSE 0 END) AS BIGINT)
            AS groups_lt_l3
        FROM groups""")),

    "q160_dp_release" -> Q(
      // Derandomized differential-privacy release: per-(lang, source) doc
      // counts with Laplace(1/ε) noise drawn by INVERSE CDF from the
      // portable 60-bit md5 hash of the group key — noise = −sign(u)·
      // ln(1−2|u|)/ε with u ∈ (−½, ½) from the hash, so the "random"
      // mechanism is reproducible, testable, and oracle-checkable
      // bit-for-bit (the engineering trick for auditing a DP pipeline;
      // production would swap the hash for a real RNG seed). ε = 1,
      // sensitivity 1. One aggregation + one fixed-shape ln per group.
      build = (s, dir) => {
        val counts = table(s, dir, "documents")
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n"))
        val h = TextHash.md5Bits60(
          concat_ws("|", col("lang"), col("source"), lit("dp")))
        counts
          .withColumn("u",
            (h.cast("double") + lit(0.5)) / lit(math.pow(2.0, 60)) - lit(0.5))
          .withColumn("noise", round(
            -signum(col("u")) * log(lit(1.0) - lit(2.0) * abs(col("u"))), 6))
          .withColumn("released",
            greatest(lit(0L), col("n") + round(col("noise")).cast("long")))
          .select(col("lang"), col("source"), col("n"), col("noise"),
            col("released"))
          .orderBy(col("lang"), col("source"))
      },
      oracle = Some(s"""
        WITH counts AS (
          SELECT lang, source, count(*) AS n
          FROM documents GROUP BY 1, 2),
        noised AS (
          SELECT lang, source, n,
            (CAST(${TextHash.sqlMd5Bits60("lang || '|' || source || '|dp'")}
              AS DOUBLE) + 0.5) / power(2.0, 60) - 0.5 AS u
          FROM counts)
        SELECT lang, source, n,
          round(-sign(u) * ln(1.0 - 2.0 * abs(u)), 6) AS noise,
          greatest(CAST(0 AS BIGINT),
            n + CAST(round(round(-sign(u) * ln(1.0 - 2.0 * abs(u)), 6))
              AS BIGINT)) AS released
        FROM noised
        ORDER BY lang, source""")),

    "q161_share_of_parent" -> Q(
      // Hierarchical share-of-parent: every nation's revenue as a share
      // of its region, every region's as a share of the world — the
      // drill-down percentage every OLAP hierarchy renders. ONE star-join
      // scan feeds a GROUPING SETS expansion; the share joins run on the
      // bounded level frames (regions, nations). Shares are one division
      // of exact-decimal-summed revenues, snapped to 8.
      build = (s, dir) => {
        table(s, dir, "orders")
          .join(table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(table(s, dir, "nation"),
            col("c_nationkey") === col("n_nationkey"))
          .join(table(s, dir, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .createOrReplaceTempView("sop_star")
        val levels = s.sql(s"""
          SELECT r_name, n_name, ${sqlMsum("o_totalprice")} AS revenue,
            grouping(r_name) AS g_r, grouping(n_name) AS g_n
          FROM sop_star
          GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())""")
        val nations = levels.filter(col("g_n") === 0)
          .select(col("r_name"), col("n_name"), col("revenue"))
        val regions = levels.filter(col("g_n") === 1 && col("g_r") === 0)
          .select(col("r_name"), col("revenue").as("region_rev"))
        val world = levels.filter(col("g_r") === 1)
          .select(col("revenue").as("world_rev"))
        val nationRows = nations.join(broadcast(regions), "r_name")
          .select(lit("nation").as("level"), col("r_name"),
            col("n_name"), col("revenue"),
            round(col("revenue") / col("region_rev"), 8).as("share_of_parent"))
        val regionRows = regions.crossJoin(broadcast(world))
          .select(lit("region").as("level"), col("r_name"),
            lit("(all)").as("n_name"), col("region_rev").as("revenue"),
            round(col("region_rev") / col("world_rev"), 8).as("share_of_parent"))
        nationRows.unionByName(regionRows)
          .orderBy(col("level"), col("r_name"), col("n_name"))
      },
      oracle = Some(s"""
        WITH star AS (
          SELECT r_name, n_name, o_totalprice
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey),
        nations AS (
          SELECT r_name, n_name, ${sqlMsum("o_totalprice")} AS revenue
          FROM star GROUP BY 1, 2),
        regions AS (
          SELECT r_name, ${sqlMsum("o_totalprice")} AS region_rev
          FROM star GROUP BY 1),
        world AS (
          SELECT ${sqlMsum("o_totalprice")} AS world_rev FROM star)
        SELECT 'nation' AS level, n.r_name, n.n_name, n.revenue,
          round(n.revenue / r.region_rev, 8) AS share_of_parent
        FROM nations n JOIN regions r USING (r_name)
        UNION ALL
        SELECT 'region', r.r_name, '(all)', r.region_rev,
          round(r.region_rev / w.world_rev, 8)
        FROM regions r CROSS JOIN world w
        ORDER BY level, r_name, n_name""")),

    "q162_format_sniffing" -> Q(
      // Magic-byte format sniffing vs declared kind — the first audit a
      // multimodal ingest runs: payloads synthesized with REAL container
      // headers (PNG / JPEG / RIFF by doc_id % 4, one slice headerless),
      // declared kind by doc_id % 3 (q46's convention — the misaligned
      // moduli produce genuine declared-vs-actual mismatches), then the
      // mismatch matrix. The sniff is a bounded prefix comparison on the
      // scan: payload bytes never shuffle, only (kind, format) counters.
      build = (s, dir) => {
        val header = when(pmod(col("doc_id"), lit(4)) === 0,
            lit(Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)))
          .when(pmod(col("doc_id"), lit(4)) === 1,
            lit(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)))
          .when(pmod(col("doc_id"), lit(4)) === 2,
            lit("RIFF").cast("binary"))
          .otherwise(lit(Array.empty[Byte]))
        table(s, dir, "documents")
          .select(col("doc_id"),
            when(pmod(col("doc_id"), lit(3)) === 0, "image")
              .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
              .otherwise("video").as("kind"),
            concat(header, col("text").cast("binary")).as("payload"))
          .select(col("kind"),
            Multimodal.sniffFormat(col("payload")).as("sniffed"),
            length(col("payload")).as("bytes"))
          .groupBy(col("kind"), col("sniffed"))
          .agg(count(lit(1)).as("n"), sum(col("bytes")).as("total_bytes"))
          .orderBy(col("kind"), col("sniffed"))
      },
      oracle = Some("""
        WITH media AS (
          SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN 'image'
                 WHEN doc_id % 3 = 1 THEN 'audio'
                 ELSE 'video' END AS kind,
            (CASE WHEN doc_id % 4 = 0
                THEN '\x89\x50\x4E\x47\x0D\x0A\x1A\x0A'::BLOB
              WHEN doc_id % 4 = 1 THEN '\xFF\xD8\xFF\xE0'::BLOB
              WHEN doc_id % 4 = 2 THEN 'RIFF'::BLOB
              ELSE ''::BLOB END) || encode(text) AS payload
          FROM documents),
        sniffed AS (
          SELECT kind,
            CASE WHEN substring(hex(payload), 1, 16) = '89504E470D0A1A0A'
                THEN 'png'
              WHEN substring(hex(payload), 1, 6) = 'FFD8FF' THEN 'jpeg'
              WHEN substring(hex(payload), 1, 8) = '52494646' THEN 'riff'
              ELSE 'unknown' END AS sniffed,
            octet_length(payload) AS bytes
          FROM media)
        SELECT kind, sniffed, count(*) AS n,
          CAST(sum(bytes) AS BIGINT) AS total_bytes
        FROM sniffed
        GROUP BY 1, 2
        ORDER BY kind, sniffed""")),

    "q163_yoy_growth" -> Q(
      // Year-over-year monthly growth — the BI twin of q41's MoM lag:
      // each month joined to the SAME month one year back (explicit
      // bounded self-join on the month key, not a 12-row window lag — a
      // calendar gap can't silently misalign it), YoY delta and growth
      // rate with first-year months reported with NULL-free sentinels.
      build = (s, dir) => {
        val monthly = table(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(msum(col("o_totalprice")).as("revenue"))
        val prev = monthly.select(
          add_months(col("month"), 12).as("month"),
          col("revenue").as("prev_year_revenue"))
        monthly.join(prev, Seq("month"), "left")
          .select(col("month").cast("date").as("month"),
            col("revenue"),
            coalesce(col("prev_year_revenue"), lit(0.0)).as("prev_year_revenue"),
            col("prev_year_revenue").isNotNull.cast("int").as("has_prev"),
            when(col("prev_year_revenue").isNull, lit(0.0))
              .otherwise(round((col("revenue") - col("prev_year_revenue"))
                / col("prev_year_revenue") * 100.0, 6))
              .as("yoy_pct"))
          .orderBy(col("month"))
      },
      oracle = Some(s"""
        WITH monthly AS (
          SELECT date_trunc('month', o_orderdate) AS month,
            ${sqlMsum("o_totalprice")} AS revenue
          FROM orders GROUP BY 1),
        joined AS (
          SELECT m.month, m.revenue, p.revenue AS prev_year_revenue
          FROM monthly m
          LEFT JOIN monthly p ON p.month + INTERVAL 12 MONTH = m.month)
        SELECT CAST(month AS DATE) AS month, revenue,
          coalesce(prev_year_revenue, 0.0) AS prev_year_revenue,
          CAST(prev_year_revenue IS NOT NULL AS INT) AS has_prev,
          CASE WHEN prev_year_revenue IS NULL THEN 0.0
            ELSE round((revenue - prev_year_revenue)
              / prev_year_revenue * 100.0, 6) END AS yoy_pct
        FROM joined
        ORDER BY month""")),

    "q164_shipping_leadtime" -> Q(
      // Order-to-ship lead time SLA per priority: exact p50/p90/p99 of
      // the integer day lag (order ⋈ its line items), plus the worst
      // case — the fulfillment dashboard every ops team runs. The join
      // shuffles on orderkey; lag is an exact integer so the percentile
      // parity is the established q19/q62 kind.
      build = (s, dir) => {
        val lag = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority").as("prio"))
          .join(table(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_shipdate")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("prio"),
            datediff(col("l_shipdate").cast("date"),
              col("o_orderdate").cast("date")).cast("double").as("lag_days"))
        lag.groupBy(col("prio"))
          .agg(count(lit(1)).as("n_lines"),
            expr("percentile(lag_days, 0.5D)").as("p50"),
            expr("percentile(lag_days, 0.9D)").as("p90"),
            expr("percentile(lag_days, 0.99D)").as("p99"),
            max(col("lag_days")).cast("long").as("worst"))
          .orderBy(col("prio"))
      },
      oracle = Some("""
        WITH lag AS (
          SELECT o.o_orderpriority AS prio,
            CAST(datediff('day', CAST(o.o_orderdate AS DATE),
              CAST(l.l_shipdate AS DATE)) AS DOUBLE) AS lag_days
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
        SELECT prio, count(*) AS n_lines,
          quantile_cont(lag_days, 0.5) AS p50,
          quantile_cont(lag_days, 0.9) AS p90,
          quantile_cont(lag_days, 0.99) AS p99,
          CAST(max(lag_days) AS BIGINT) AS worst
        FROM lag
        GROUP BY prio
        ORDER BY prio""")),

    "q165_repeat_purchase" -> Q(
      // Repeat-purchase behavior: per-customer inter-order gaps (lag
      // window per customer — partitions are per-customer order
      // histories, bounded) rolled into the repeat-rate and exact gap
      // quantiles per customer segment (order count band). The retention
      // metric behind "how often do buyers come back".
      build = (s, dir) => {
        val w = Window.partitionBy(col("cust")).orderBy(col("day"), col("okey"))
        val gaps = table(s, dir, "orders")
          .select(col("o_custkey").as("cust"),
            col("o_orderdate").cast("date").as("day"),
            col("o_orderkey").as("okey"))
          .withColumn("prev_day", lag(col("day"), 1).over(w))
          .withColumn("gap_days",
            datediff(col("day"), col("prev_day")).cast("double"))
        val perCust = gaps.groupBy(col("cust"))
          .agg(count(lit(1)).as("n_orders"))
          .withColumn("band",
            when(col("n_orders") >= 20, ">=20")
              .when(col("n_orders") >= 10, "10-19")
              .when(col("n_orders") >= 2, "2-9")
              .otherwise("1"))
        gaps.filter(col("gap_days").isNotNull)
          .join(perCust, "cust")
          .groupBy(col("band"))
          .agg(countDistinct(col("cust")).as("n_customers"),
            count(lit(1)).as("n_gaps"),
            expr("percentile(gap_days, 0.5D)").as("median_gap_days"),
            expr("percentile(gap_days, 0.9D)").as("p90_gap_days"))
          .orderBy(col("band"))
      },
      oracle = Some("""
        WITH gaps AS (
          SELECT o_custkey AS cust,
            CAST(datediff('day',
              lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
              CAST(o_orderdate AS DATE)) AS DOUBLE) AS gap_days
          FROM orders),
        per_cust AS (
          SELECT cust, count(*) AS n_orders,
            CASE WHEN count(*) >= 20 THEN '>=20'
                 WHEN count(*) >= 10 THEN '10-19'
                 WHEN count(*) >= 2 THEN '2-9'
                 ELSE '1' END AS band
          FROM gaps GROUP BY 1)
        SELECT p.band, count(DISTINCT g.cust) AS n_customers,
          count(*) AS n_gaps,
          quantile_cont(g.gap_days, 0.5) AS median_gap_days,
          quantile_cont(g.gap_days, 0.9) AS p90_gap_days
        FROM gaps g JOIN per_cust p ON g.cust = p.cust
        WHERE g.gap_days IS NOT NULL
        GROUP BY p.band
        ORDER BY p.band""")),

    "q166_supplier_hhi" -> Q(
      // Supplier concentration risk per nation: each supplier's revenue
      // share within their nation, squared and summed into the
      // Herfindahl-Hirschman index (0 = atomized, 10000 = single-source)
      // — the sourcing-risk metric procurement dashboards publish. Two
      // exact-decimal aggregations; shares snapped to 8 decimals before
      // the fixed-shape square, HHI terms snapped and decimal-summed so
      // the index is combine-order-independent.
      build = (s, dir) => {
        val rev = table(s, dir, "lineitem")
          .join(table(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .join(table(s, dir, "nation"),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("s_suppkey"))
          .agg(msum(col("l_extendedprice")).as("srev"))
        val nat = rev.groupBy(col("n_name"))
          .agg(dsum(col("srev")).as("nrev"),
            count(lit(1)).as("n_suppliers"))
        rev.join(broadcast(nat), "n_name")
          .withColumn("share", round(col("srev") / col("nrev"), 8))
          .groupBy(col("n_name"), col("nrev"), col("n_suppliers"))
          .agg(
            round(sum(round(col("share") * col("share") * lit(10000.0), 8)
              .cast("decimal(24,8)")), 4).cast("double").as("hhi"),
            max(col("share")).as("top_share"))
          .select(col("n_name"), col("n_suppliers"),
            col("nrev").as("nation_rev"), col("hhi"), col("top_share"))
          .orderBy(col("n_name"))
      },
      oracle = Some(s"""
        WITH rev AS (
          SELECT n.n_name, l.l_suppkey AS sk,
            ${sqlMsum("l.l_extendedprice")} AS srev
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          GROUP BY 1, 2),
        nat AS (
          SELECT n_name, ${sqlDsum("srev")} AS nrev,
            count(*) AS n_suppliers
          FROM rev GROUP BY 1),
        shares AS (
          SELECT r.n_name, n.nrev, n.n_suppliers,
            round(r.srev / n.nrev, 8) AS share
          FROM rev r JOIN nat n USING (n_name))
        SELECT n_name, n_suppliers, nrev AS nation_rev,
          CAST(round(sum(CAST(round(share * share * 10000.0, 8)
            AS DECIMAL(24,8))), 4) AS DOUBLE) AS hhi,
          max(share) AS top_share
        FROM shares
        GROUP BY n_name, nrev, n_suppliers
        ORDER BY n_name""")),

    "q167_error_control_chart" -> Q(
      // Statistical process control (p-chart) on the daily error rate:
      // center line = pooled error share, per-day 3σ binomial limits
      // (wider on thin days — limits use each day's own n), out-of-
      // control days flagged. The ops/DQ monitor that separates real
      // incidents from sampling noise. sqrt is IEEE correctly-rounded,
      // so the limit arithmetic is bit-identical cross-engine; every
      // input is an exact integer count.
      build = (s, dir) => {
        val daily = table(s, dir, "events")
          .groupBy(col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("n"),
            sum((col("event_type") === "error").cast("long")).as("n_err"))
        val pooled = daily.agg(
          (sum(col("n_err")).cast("double") / sum(col("n")).cast("double"))
            .as("pbar"))
        daily.crossJoin(broadcast(pooled))
          .withColumn("p", round(
            col("n_err").cast("double") / col("n").cast("double"), 8))
          .withColumn("sigma",
            sqrt(col("pbar") * (lit(1.0) - col("pbar"))
              / col("n").cast("double")))
          .withColumn("ucl", round(col("pbar") + lit(3.0) * col("sigma"), 8))
          .withColumn("lcl", round(
            greatest(lit(0.0), col("pbar") - lit(3.0) * col("sigma")), 8))
          .withColumn("out_of_control",
            (col("p") > col("ucl") || col("p") < col("lcl")).cast("int"))
          .select(col("day"), col("n"), col("n_err"), col("p"),
            round(col("pbar"), 8).as("center"), col("lcl"), col("ucl"),
            col("out_of_control"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day, count(*) AS n,
            CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_err
          FROM events GROUP BY 1),
        pooled AS (
          SELECT CAST(sum(n_err) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
            AS pbar
          FROM daily),
        charted AS (
          SELECT d.day, d.n, d.n_err,
            round(CAST(d.n_err AS DOUBLE) / CAST(d.n AS DOUBLE), 8) AS p,
            pl.pbar,
            sqrt(pl.pbar * (1.0 - pl.pbar) / CAST(d.n AS DOUBLE)) AS sigma
          FROM daily d CROSS JOIN pooled pl)
        SELECT day, n, n_err, p,
          round(pbar, 8) AS center,
          round(greatest(0.0, pbar - 3.0 * sigma), 8) AS lcl,
          round(pbar + 3.0 * sigma, 8) AS ucl,
          CAST(p > round(pbar + 3.0 * sigma, 8)
            OR p < round(greatest(0.0, pbar - 3.0 * sigma), 8) AS INT)
            AS out_of_control
        FROM charted
        ORDER BY day""")),

    "q168_cohort_ltv" -> Q(
      // Cohort lifetime-value curves: customers grouped by first-order
      // month, each cohort's cumulative revenue per customer tracked by
      // month offset — the revenue twin of q106's retention counts.
      // Offsets are exact integer month arithmetic (y·12+m on both
      // engines — no float months_between); the cumulative sum runs on
      // the BOUNDED (cohort, offset) frame under a cohort-partitioned
      // window; LTV is one division snapped to 6 decimals. Output capped
      // at offsets 0-11 for a stable year-one curve.
      build = (s, dir) => {
        val om = table(s, dir, "orders")
          .select(col("o_custkey").as("cust"),
            col("o_totalprice"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast("long").as("ym"))
        val firstm = om.groupBy(col("cust")).agg(min(col("ym")).as("cym"))
        val sizes = firstm.groupBy(col("cym"))
          .agg(count(lit(1)).as("n_custs"))
        val rev = om.join(firstm, "cust")
          .withColumn("month_offset", col("ym") - col("cym"))
          .filter(col("month_offset") <= 11)
          .groupBy(col("cym"), col("month_offset"))
          .agg(msum(col("o_totalprice")).as("mrev"))
        val w = Window.partitionBy(col("cym")).orderBy(col("month_offset"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rev.join(broadcast(sizes), "cym")
          .withColumn("cum_rev",
            round(sum(col("mrev").cast("decimal(18,2)")).over(w), 2)
              .cast("double"))
          .select(col("cym").as("cohort_ym"), col("month_offset"),
            col("n_custs"), col("mrev"), col("cum_rev"),
            round(col("cum_rev") / col("n_custs").cast("double"), 6)
              .as("ltv_per_customer"))
          .orderBy(col("cohort_ym"), col("month_offset"))
      },
      oracle = Some(s"""
        WITH om AS (
          SELECT o_custkey AS cust, o_totalprice,
            CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
              AS ym
          FROM orders),
        firstm AS (
          SELECT cust, min(ym) AS cym FROM om GROUP BY 1),
        sizes AS (
          SELECT cym, count(*) AS n_custs FROM firstm GROUP BY 1),
        rev AS (
          SELECT f.cym, o.ym - f.cym AS month_offset,
            ${sqlMsum("o.o_totalprice")} AS mrev
          FROM om o JOIN firstm f USING (cust)
          WHERE o.ym - f.cym <= 11
          GROUP BY 1, 2),
        cum AS (
          SELECT r.cym, r.month_offset, s.n_custs, r.mrev,
            CAST(round(sum(CAST(r.mrev AS DECIMAL(18,2)))
              OVER (PARTITION BY r.cym ORDER BY r.month_offset
                ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS cum_rev
          FROM rev r JOIN sizes s USING (cym))
        SELECT cym AS cohort_ym, month_offset, n_custs, mrev, cum_rev,
          round(cum_rev / CAST(n_custs AS DOUBLE), 6) AS ltv_per_customer
        FROM cum
        ORDER BY cohort_ym, month_offset""")),

    "q169_transit_concurrency" -> Q(
      // Sweep-line interval analytics: maximum number of orders
      // simultaneously IN FULFILLMENT (open from o_orderdate through
      // their last line's l_shipdate, inclusive) per month — the "how
      // many concurrent X" classic (open sessions, active loans,
      // in-flight requests) done without exploding one row per
      // interval-day. Shape: per-order interval ends come from one
      // map-side-combinable groupBy on lineitem; intervals collapse to
      // ±1 deltas per CALENDAR DAY, so the running-sum window is over
      // the bounded day frame (~2.5k rows for the 7-year span — bounded
      // by calendar, not data; the only single-partition window).
      // Concurrency changes only at delta days, so the per-month max
      // over recorded days is exact; months with no open/close events
      // carry no row (both engines agree).
      build = (s, dir) => {
        val ends = table(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(max(to_date(col("l_shipdate"))).as("endd"))
        val iv = table(s, dir, "orders")
          .select(col("o_orderkey"), to_date(col("o_orderdate")).as("startd"))
          .join(ends, col("o_orderkey") === col("l_orderkey"))
        val deltas = iv.select(col("startd").as("d"), lit(1L).as("delta"))
          .unionByName(iv.select(date_add(col("endd"), 1).as("d"),
            lit(-1L).as("delta")))
          .groupBy(col("d")).agg(sum(col("delta")).as("delta"))
        val w = Window.orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        deltas.withColumn("open", sum(col("delta")).over(w))
          .groupBy((year(col("d")) * 100 + month(col("d"))).as("ym"))
          .agg(max(col("open")).as("max_open_orders"))
          .orderBy(col("ym"))
      },
      oracle = Some("""
        WITH iv AS (
          SELECT CAST(o_orderdate AS DATE) AS startd,
            max(CAST(l_shipdate AS DATE)) AS endd
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          GROUP BY o_orderkey, o_orderdate),
        deltas AS (
          SELECT d, CAST(sum(delta) AS BIGINT) AS delta FROM (
            SELECT startd AS d, 1 AS delta FROM iv
            UNION ALL
            SELECT endd + 1, -1 FROM iv)
          GROUP BY d),
        run AS (
          SELECT d,
            sum(delta) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS open
          FROM deltas)
        SELECT CAST(year(d) * 100 + month(d) AS INT) AS ym,
          CAST(max(open) AS BIGINT) AS max_open_orders
        FROM run GROUP BY 1 ORDER BY ym"""),
      bench = true),

    "q170_autocorrelation" -> Q(
      // Lag-k autocorrelation of the daily revenue series (k = 1, 7):
      // the seasonality detector behind "is this metric weekly-periodic"
      // — lag-7 high + lag-1 low = weekly structure. The series is the
      // bounded per-day aggregate; each lag pairs the series with itself
      // via a calendar-day equi-JOIN (day = day + k — no window at all,
      // so nothing single-partition anywhere), and the correlation runs
      // on [[Trend.groupedPearson]]'s exact-decimal moment machinery,
      // grouped by lag. Missing days simply produce no pair — mirrored
      // by construction in both engines.
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(msum(col("o_totalprice")).as("rev"))
        val pairs = Seq(1, 7).map { k =>
          daily.as("a").join(daily.as("b"),
              col("a.d") === date_add(col("b.d"), k))
            .select(lit(k).as("lag_k"),
              col("a.rev").as("x"), col("b.rev").as("y"))
        }.reduce(_ unionByName _)
        Trend.groupedPearson(pairs, Seq("lag_k"), "x", "y")
          .select(col("lag_k"), col("n"), col("r"))
          .orderBy(col("lag_k"))
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
            ${sqlMsum("o_totalprice")} AS rev
          FROM orders GROUP BY 1),
        acpairs AS (
          SELECT 1 AS lag_k, a.rev AS x, b.rev AS y
          FROM daily a JOIN daily b ON a.d = b.d + 1
          UNION ALL
          SELECT 7 AS lag_k, a.rev AS x, b.rev AS y
          FROM daily a JOIN daily b ON a.d = b.d + 7),
        ${Trend.sqlPearsonCtes("acpairs", "lag_k", "x", "y")}
        SELECT g AS lag_k, n, r FROM corr_g ORDER BY lag_k""")),

    "q171_changepoint" -> Q(
      // Single mean-shift changepoint on the daily error rate (binary
      // segmentation's scoring pass, Scott-Knott/CUSUM family): for
      // every split point t, the standardized mean difference
      // sqrt(t·(n−t)/n)·|mean(rate[..t]) − mean(rate[t+1..])| from
      // PREFIX SUMS over the bounded day frame; the argmax day is where
      // the process most plausibly shifted. One raw-data pass (grouped
      // day counts), then day-frame-only windows (bounded by calendar).
      // Rates are 8-decimal-snapped, prefix sums exact decimal, the
      // statistic one fixed-shape double expression — argmax ties break
      // by earliest day in both engines.
      build = (s, dir) => {
        val daily = table(s, dir, "events")
          .groupBy(col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("n_ev"),
            sum((col("event_type") === "error").cast("long")).as("n_err"))
          .withColumn("p", round(
            col("n_err").cast("double") / col("n_ev").cast("double"), 8))
        val wCum = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val idxd = daily
          .withColumn("i", row_number().over(Window.orderBy(col("day"))))
          .withColumn("cum", sum(col("p").cast("decimal(12,8)")).over(wCum))
        val tot = daily.agg(count(lit(1)).as("n"),
          sum(col("p").cast("decimal(12,8)")).as("totp"))
        val iD = col("i").cast("double")
        val nD = col("n").cast("double")
        idxd.crossJoin(broadcast(tot))
          .filter(col("i") < col("n"))
          .withColumn("stat", round(
            sqrt(iD * (nD - iD) / nD) *
              abs(col("cum").cast("double") / iD -
                (col("totp") - col("cum")).cast("double") / (nD - iD)), 8))
          .select(col("day").as("change_day"), col("i").cast("long").as("split_i"),
            col("stat"))
          .orderBy(col("stat").desc, col("change_day")).limit(1)
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day, count(*) AS n_ev,
            sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
          FROM events GROUP BY 1),
        rated AS (
          SELECT day,
            round(CAST(n_err AS DOUBLE) / CAST(n_ev AS DOUBLE), 8) AS p
          FROM daily),
        pref AS (
          SELECT day,
            row_number() OVER (ORDER BY day) AS i,
            sum(CAST(p AS DECIMAL(12,8)))
              OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum
          FROM rated),
        tot AS (
          SELECT count(*) AS n, sum(CAST(p AS DECIMAL(12,8))) AS totp
          FROM rated)
        SELECT day AS change_day, CAST(i AS BIGINT) AS split_i,
          round(sqrt(CAST(i AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(i AS DOUBLE))
              / CAST(n AS DOUBLE)) *
            abs(CAST(cum AS DOUBLE) / CAST(i AS DOUBLE)
              - CAST(totp - cum AS DOUBLE)
                / (CAST(n AS DOUBLE) - CAST(i AS DOUBLE))), 8) AS stat
        FROM pref CROSS JOIN tot
        WHERE i < n
        ORDER BY stat DESC, change_day LIMIT 1""")),

    "q172_type_overlap" -> Q(
      // EXACT distinct-activity overlap matrix between event types — the
      // ground-truth twin of q105's KMV estimates (audience overlap,
      // co-usage of features). The set element is the USER-DAY (distinct
      // (type, user, day)): the r6 power audit showed plain user sets
      // are saturated on the shipped fixture (every user touches every
      // type → all Jaccards identically 1.0, zero test power), while
      // user-day activity sets vary (~35% pairwise overlap). One
      // distinct pass, one (user, day)-keyed self-join (each user-day
      // contributes only its own type-pair combinations — state bounded
      // by type cardinality, never a cross join), bounded pair output.
      // Jaccard is a ratio of exact integers snapped once.
      build = (s, dir) => {
        val tu = table(s, dir, "events")
          .select(col("event_type").as("t"), col("user_id").as("u"),
            col("ts").cast("date").as("day"))
          .distinct()
        val sizes = tu.groupBy(col("t")).agg(count(lit(1)).as("n"))
        tu.as("a").join(tu.as("b"),
            col("a.u") === col("b.u") && col("a.day") === col("b.day") &&
              col("a.t") < col("b.t"))
          .groupBy(col("a.t").as("t_a"), col("b.t").as("t_b"))
          .agg(count(lit(1)).as("n_both"))
          .join(broadcast(sizes.select(col("t").as("t_a"), col("n").as("n_a"))), "t_a")
          .join(broadcast(sizes.select(col("t").as("t_b"), col("n").as("n_b"))), "t_b")
          .withColumn("jaccard", round(col("n_both").cast("double") /
            (col("n_a") + col("n_b") - col("n_both")).cast("double"), 6))
          .select(col("t_a"), col("t_b"), col("n_a"), col("n_b"),
            col("n_both"), col("jaccard"))
          .orderBy(col("t_a"), col("t_b"))
      },
      oracle = Some("""
        WITH tu AS (
          SELECT DISTINCT event_type AS t, user_id AS u,
            CAST(ts AS DATE) AS day
          FROM events),
        sizes AS (SELECT t, count(*) AS n FROM tu GROUP BY 1),
        inter AS (
          SELECT a.t AS t_a, b.t AS t_b, count(*) AS n_both
          FROM tu a JOIN tu b
            ON a.u = b.u AND a.day = b.day AND a.t < b.t
          GROUP BY 1, 2)
        SELECT i.t_a, i.t_b,
          CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
          CAST(i.n_both AS BIGINT) AS n_both,
          round(CAST(i.n_both AS DOUBLE)
            / CAST(sa.n + sb.n - i.n_both AS DOUBLE), 6) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.t = i.t_a
        JOIN sizes sb ON sb.t = i.t_b
        ORDER BY t_a, t_b""")),

    "q173_centroid_matrix" -> Q(
      // Per-label embedding centroids + the inter-label cosine matrix —
      // the training-data diversity audit ("are my class clusters
      // actually separated in embedding space"). Shape: posexplode to
      // (label, dim, value) rows, one map-side-combinable groupBy to the
      // BOUNDED (labels × dims) centroid frame; everything pairwise
      // (dots, norms, the matrix) runs on that bounded frame only — the
      // raw vectors are read once. Determinism: per-dim sums snap to
      // exact decimal ([[Stable.dsum]]), centroids and cosines are
      // fixed-shape double expressions snapped to 6.
      build = (s, dir) => {
        val e = table(s, dir, "embeddings")
          .select(col("label"), posexplode(col("embedding")))
          .toDF("label", "dim", "v")
        val cent = e.groupBy(col("label"), col("dim"))
          .agg(dsum(col("v").cast("double")).as("s"),
            count(lit(1)).as("cnt"))
          .withColumn("c", round(col("s") / col("cnt").cast("double"), 6))
        val norms = cent.groupBy(col("label")).agg(dsumsq(col("c")).as("nsq"))
        cent.select(col("label").as("la"), col("dim"), col("c").as("ca"))
          .join(cent.select(col("label").as("lb"), col("dim"),
            col("c").as("cb")), "dim")
          .filter(col("la") < col("lb"))
          .groupBy(col("la"), col("lb"))
          .agg(dsum(col("ca") * col("cb")).as("dot"))
          .join(broadcast(norms.select(col("label").as("la"),
            col("nsq").as("nsq_a"))), "la")
          .join(broadcast(norms.select(col("label").as("lb"),
            col("nsq").as("nsq_b"))), "lb")
          .withColumn("cos", round(col("dot") /
            (sqrt(col("nsq_a")) * sqrt(col("nsq_b"))), 6))
          .select(col("la").as("label_a"), col("lb").as("label_b"), col("cos"))
          .orderBy(col("label_a"), col("label_b"))
      },
      oracle = Some(s"""
        WITH e AS (
          SELECT label, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
          FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) idx),
        cent AS (
          SELECT label, dim,
            round(${sqlDsum("v")} / CAST(count(*) AS DOUBLE), 6) AS c
          FROM e GROUP BY 1, 2),
        norms AS (
          SELECT label, ${sqlDsumsq("c")} AS nsq FROM cent GROUP BY 1),
        dots AS (
          SELECT a.label AS la, b.label AS lb,
            ${sqlDsum("a.c * b.c")} AS dot
          FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
          GROUP BY 1, 2)
        SELECT d.la AS label_a, d.lb AS label_b,
          round(d.dot / (sqrt(na.nsq) * sqrt(nb.nsq)), 6) AS cos
        FROM dots d
        JOIN norms na ON na.label = d.la
        JOIN norms nb ON nb.label = d.lb
        ORDER BY label_a, label_b""")),

    "q174_moving_bands" -> Q(
      // Trailing 7-observation volatility bands on daily revenue
      // (Bollinger shape, prior-window only — today never inflates its
      // own band): mean/σ from exact-decimal window sums over the
      // PRECEDING 7 days, z-score and ±2σ breach flags per day. The
      // anomaly monitor that complements q167's p-chart (proportions,
      // global center) with a local level-shift detector. Windows run on
      // the bounded day frame only (one row per calendar day); σ uses
      // the population form of the same moment sums every spread
      // statistic in this engine uses. ROWS semantics: the lookback is
      // the prior 7 OBSERVED days (calendar gaps close up — identical in
      // both engines by construction). Cross-engine exactness: the
      // moments run on INTEGER CENTS (daily revenue is an exact
      // 2-decimal sum, so ×100 is an exact integer), every sum is exact,
      // and every decimal→double cast is of a value < 2^53 — so the
      // final mean/σ/z doubles are bit-identical with NO rounding step.
      // (Both alternatives fail a hash oracle: round(·, 6) diverges on
      // half-boundaries — Spark rounds the shortest decimal rendering,
      // DuckDB the binary value — and casting a >2^53·10^scale decimal
      // to double double-rounds in DuckDB's int128 path. Both observed
      // on sf0.01 before this formulation.) At extreme per-day revenue
      // (>2^53 cents²·7 ≈ $10^10/day) the s2 cast would need widening —
      // a documented bound, not a silent wrap: sums stay exact decimal.
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(msum(col("o_totalprice")).as("rev"),
            (sum(dec(col("o_totalprice"))) * 100).cast("decimal(20,0)").as("c"))
        val wPrev = Window.orderBy(col("d")).rowsBetween(-7, -1)
        val c19 = col("c").cast("decimal(19,0)")
        val meanC = col("s1").cast("double") / 7.0
        val sigmaC = sqrt(greatest(lit(0.0),
          col("s2").cast("double") / 7.0 - meanC * meanC))
        val cD = col("c").cast("double")
        daily
          .withColumn("n7", count(col("c")).over(wPrev))
          .withColumn("s1", sum(col("c")).over(wPrev))
          .withColumn("s2", sum(c19 * c19).over(wPrev))
          .filter(col("n7") === 7)
          .withColumn("mean7", meanC / 100.0)
          .withColumn("sigma7", sigmaC / 100.0)
          .withColumn("z", when(sigmaC > 0.0, (cD - meanC) / sigmaC))
          .withColumn("breach",
            when(cD > meanC + lit(2.0) * sigmaC, 1)
              .when(cD < meanC - lit(2.0) * sigmaC, -1)
              .otherwise(0))
          .select(col("d"), col("rev"), col("mean7"), col("sigma7"),
            col("z"), col("breach"))
          .orderBy(col("d"))
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
            ${sqlMsum("o_totalprice")} AS rev,
            CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100
              AS DECIMAL(20,0)) AS c
          FROM orders GROUP BY 1),
        win AS (
          SELECT d, rev, c,
            count(c) OVER w AS n7,
            sum(c) OVER w AS s1,
            sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
              OVER w AS s2
          FROM daily
          WINDOW w AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        banded AS (
          SELECT d, rev, c,
            CAST(s1 AS DOUBLE) / 7.0 AS mean_c,
            sqrt(greatest(0.0, CAST(s2 AS DOUBLE) / 7.0
              - (CAST(s1 AS DOUBLE) / 7.0) * (CAST(s1 AS DOUBLE) / 7.0)))
              AS sigma_c
          FROM win WHERE n7 = 7)
        SELECT d, rev, mean_c / 100.0 AS mean7, sigma_c / 100.0 AS sigma7,
          CASE WHEN sigma_c > 0.0
            THEN (CAST(c AS DOUBLE) - mean_c) / sigma_c END AS z,
          CASE WHEN CAST(c AS DOUBLE) > mean_c + 2.0 * sigma_c THEN 1
               WHEN CAST(c AS DOUBLE) < mean_c - 2.0 * sigma_c THEN -1
               ELSE 0 END AS breach
        FROM banded
        ORDER BY d""")),

    "q175_cross_source_dup" -> Q(
      // Near-duplicate pair-rate matrix by SOURCE pair — "which crawls
      // duplicate each other" (and how much each duplicates itself),
      // the curation signal that decides which feed to drop or
      // dedup-first at ingest. Composes the exact n-gram Jaccard pairs
      // (q27's machinery — inverted index on hashed shingles, never
      // all-pairs) with the bounded per-source sizes; the rate
      // normalizes by reachable pairs (n·(n−1)/2 within a source,
      // n_a·n_b across). Output bounded by source-pair count.
      build = (s, dir) => {
        val docs = table(s, dir, "documents")
        val src = docs.select(col("doc_id"), col("source"))
        val sizes = src.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        NearDup.jaccardPairs(docs, "doc_id", "text")
          .join(src.select(col("doc_id").as("id_a"), col("source").as("src_a")), "id_a")
          .join(src.select(col("doc_id").as("id_b"), col("source").as("src_b")), "id_b")
          .groupBy(least(col("src_a"), col("src_b")).as("s_lo"),
            greatest(col("src_a"), col("src_b")).as("s_hi"))
          .agg(count(lit(1)).as("n_pairs"))
          .join(broadcast(sizes.select(col("source").as("s_lo"),
            col("n_docs").as("n_lo"))), "s_lo")
          .join(broadcast(sizes.select(col("source").as("s_hi"),
            col("n_docs").as("n_hi"))), "s_hi")
          .withColumn("dup_rate", round(col("n_pairs").cast("double") /
            when(col("s_lo") === col("s_hi"),
              col("n_lo").cast("double") * (col("n_lo") - 1).cast("double") / 2.0)
            .otherwise(col("n_lo").cast("double") * col("n_hi").cast("double")), 8))
          .select(col("s_lo"), col("s_hi"), col("n_pairs"), col("dup_rate"))
          .orderBy(col("s_lo"), col("s_hi"))
      },
      oracle = Some(s"""
        WITH $ngramPairCtes,
        hits AS (SELECT id_a, id_b FROM pairs WHERE jaccard >= 0.6),
        srcs AS (SELECT doc_id, source FROM documents),
        sizes AS (SELECT source, count(*) AS n_docs FROM srcs GROUP BY 1),
        tagged AS (
          SELECT least(a.source, b.source) AS s_lo,
            greatest(a.source, b.source) AS s_hi, count(*) AS n_pairs
          FROM hits h
          JOIN srcs a ON a.doc_id = h.id_a
          JOIN srcs b ON b.doc_id = h.id_b
          GROUP BY 1, 2)
        SELECT t.s_lo, t.s_hi, CAST(t.n_pairs AS BIGINT) AS n_pairs,
          round(CAST(t.n_pairs AS DOUBLE) /
            (CASE WHEN t.s_lo = t.s_hi
              THEN CAST(lo.n_docs AS DOUBLE) * CAST(lo.n_docs - 1 AS DOUBLE) / 2.0
              ELSE CAST(lo.n_docs AS DOUBLE) * CAST(hi.n_docs AS DOUBLE) END), 8)
            AS dup_rate
        FROM tagged t
        JOIN sizes lo ON lo.source = t.s_lo
        JOIN sizes hi ON hi.source = t.s_hi
        ORDER BY s_lo, s_hi""")),

    "q176_knn_label_accuracy" -> Q(
      // Leave-one-out 1-NN label agreement per class — the standard
      // "is this embedding space learnable" probe (a k-NN classifier's
      // training accuracy) and the quality gate for q73/q34's ANN
      // indexes: if exact 1-NN can't recover labels, no index will.
      // Composes q25's brute-force k-NN (query side broadcast, corpus
      // never shuffles) at k=1 with two label joins; the rank window is
      // total (sim desc, neighbor_id), so the verdict is deterministic.
      // Bounded output: one row per label.
      build = (s, dir) => {
        val e = table(s, dir, "embeddings")
        val lbl = e.select(col("vec_id"), col("label"))
        Vectors.bruteForceKnn(e, e, "vec_id", "embedding", k = 1)
          .join(lbl.select(col("vec_id").as("query_id"),
            col("label").as("q_label")), "query_id")
          .join(lbl.select(col("vec_id").as("neighbor_id"),
            col("label").as("n_label")), "neighbor_id")
          .groupBy(col("q_label").as("label"))
          .agg(count(lit(1)).as("n"),
            sum((col("q_label") === col("n_label")).cast("long")).as("n_correct"))
          .withColumn("accuracy", round(
            col("n_correct").cast("double") / col("n").cast("double"), 6))
          .orderBy(col("label"))
      },
      oracle = Some("""
        WITH v AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings),
        sims AS (
          SELECT q.vec_id AS query_id, q.label AS q_label,
            c.label AS n_label,
            list_dot_product(q.emb, c.emb)
              / (sqrt(list_dot_product(q.emb, q.emb))
                 * sqrt(list_dot_product(c.emb, c.emb))) AS sim,
            c.vec_id AS neighbor_id
          FROM v q JOIN v c ON q.vec_id <> c.vec_id),
        nn AS (
          SELECT query_id, q_label, n_label,
            row_number() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS rnk
          FROM sims)
        SELECT q_label AS label, count(*) AS n,
          CAST(sum(CASE WHEN q_label = n_label THEN 1 ELSE 0 END) AS BIGINT)
            AS n_correct,
          round(CAST(sum(CASE WHEN q_label = n_label THEN 1 ELSE 0 END)
              AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS accuracy
        FROM nn WHERE rnk = 1
        GROUP BY 1 ORDER BY label""")),

    "q177_degree_assortativity" -> Q(
      // Degree assortativity of the part-co-purchase graph (Newman '02):
      // the Pearson correlation of endpoint degrees over edges — do hubs
      // connect to hubs (assortative, r > 0) or to the periphery
      // (disassortative, r < 0)? Uses q115's edge builder (distinct
      // in-order part pairs; the order-keyed self-join is bounded per
      // order), one degree aggregation over the symmetrized edge list,
      // two bounded joins back onto edges, and [[Trend.groupedPearson]]'s
      // exact-decimal moments — each edge contributes both directions,
      // the standard undirected convention.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        val edges = li.as("x").join(li.as("y"),
            col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b"))
          .distinct()
        val sym = edges.unionByName(
          edges.select(col("b").as("a"), col("a").as("b")))
        val deg = sym.groupBy(col("a")).agg(count(lit(1)).as("d"))
        val pairs = sym
          .join(deg.select(col("a"), col("d").as("x")), "a")
          .join(deg.select(col("a").as("b"), col("d").as("y")), "b")
          .select(lit(1).as("g"), col("x"), col("y"))
        Trend.groupedPearson(pairs, Seq("g"), "x", "y")
          .select(col("n"), col("r").as("assortativity"))
      },
      oracle = Some(s"""
        WITH tri_edges AS (
          SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
          FROM lineitem x JOIN lineitem y
            ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        sym AS (
          SELECT a, b FROM tri_edges
          UNION ALL
          SELECT b, a FROM tri_edges),
        deg AS (SELECT a, count(*) AS d FROM sym GROUP BY 1),
        dpairs AS (
          SELECT 1 AS g, da.d AS x, db.d AS y
          FROM sym s JOIN deg da ON da.a = s.a JOIN deg db ON db.a = s.b),
        ${Trend.sqlPearsonCtes("dpairs", "g", "x", "y")}
        SELECT n, r AS assortativity FROM corr_g""")),

    "q178_ordered_funnel" -> Q(
      // STRICTLY ORDERED time-boxed funnel: view → first click within
      // 1 h of the first view → first purchase within 1 h of that click,
      // per user. q45's session funnel tests unordered containment; this
      // is the stage-gated form (onboarding flows, checkout funnels)
      // where each step must happen AFTER the previous one and inside
      // its window. Shape: three user-keyed min-aggregations, each a
      // map-side-combinable groupBy joined back on user — no windows, no
      // per-event state; one bounded summary row.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
        val c = ev.filter(col("event_type") === "click").as("e")
          .join(v, "user_id")
          .filter(col("e.ts") > col("v_ts") &&
            col("e.ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
          .groupBy(col("user_id")).agg(min(col("e.ts")).as("c_ts"))
        val p = ev.filter(col("event_type") === "purchase").as("e")
          .join(c, "user_id")
          .filter(col("e.ts") > col("c_ts") &&
            col("e.ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
          .groupBy(col("user_id")).agg(min(col("e.ts")).as("p_ts"))
        v.agg(count(lit(1)).as("n_view")).crossJoin(
            c.agg(count(lit(1)).as("n_click_1h")))
          .crossJoin(p.agg(count(lit(1)).as("n_purchase_1h")))
          .withColumn("click_rate", round(
            col("n_click_1h").cast("double") / col("n_view").cast("double"), 6))
          .withColumn("purchase_rate", round(
            col("n_purchase_1h").cast("double")
              / col("n_click_1h").cast("double"), 6))
      },
      oracle = Some("""
        WITH v AS (
          SELECT user_id, min(ts) AS v_ts FROM events
          WHERE event_type = 'view' GROUP BY 1),
        c AS (
          SELECT e.user_id, min(e.ts) AS c_ts
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click'
            AND e.ts > v.v_ts AND e.ts <= v.v_ts + INTERVAL 1 HOUR
          GROUP BY 1),
        p AS (
          SELECT e.user_id, min(e.ts) AS p_ts
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase'
            AND e.ts > c.c_ts AND e.ts <= c.c_ts + INTERVAL 1 HOUR
          GROUP BY 1)
        SELECT (SELECT count(*) FROM v) AS n_view,
          (SELECT count(*) FROM c) AS n_click_1h,
          (SELECT count(*) FROM p) AS n_purchase_1h,
          round(CAST((SELECT count(*) FROM c) AS DOUBLE)
            / CAST((SELECT count(*) FROM v) AS DOUBLE), 6) AS click_rate,
          round(CAST((SELECT count(*) FROM p) AS DOUBLE)
            / CAST((SELECT count(*) FROM c) AS DOUBLE), 6) AS purchase_rate""")),

    "q179_lorenz_deciles" -> Q(
      // Lorenz curve in deciles: customers ranked by revenue via the
      // bucketed distributed rank ([[PrefixSum.running]] — never a
      // single-partition window over the customer frame), cut into ten
      // equal-count bins, each with its exact-decimal revenue share and
      // cumulative share. The curve behind q141's scalar Gini — "the
      // bottom 50% of customers hold 31% of revenue". Decile assignment
      // is pure integer arithmetic on the global rank; shares are exact
      // decimal / exact decimal, snapped once; the cumulative window
      // runs over the 10-row decile frame.
      build = (s, dir) => {
        val perCust = table(s, dir, "orders")
          .groupBy(col("o_custkey").as("cust"))
          .agg(msum(col("o_totalprice")).as("rev"))
        val n = perCust.agg(count(lit(1)).as("n"))
        val ranked = PrefixSum.running(perCust, "rev", "cust", "rev",
            descending = false)
          .crossJoin(broadcast(n))
          .withColumn("decile", expr("((rnk - 1) * 10) div n"))
        val dec10 = ranked.groupBy(col("decile"))
          .agg(count(lit(1)).as("n_custs"),
            sum(col("rev").cast("decimal(18,2)")).as("drev"))
        val wCum = Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wTot = Window.partitionBy()
        dec10
          .withColumn("cum", sum(col("drev")).over(wCum))
          .withColumn("tot", sum(col("drev")).over(wTot))
          .select(col("decile"), col("n_custs"),
            m2(col("drev")).as("decile_rev"),
            round(col("drev").cast("double") / col("tot").cast("double"), 8)
              .as("rev_share"),
            round(col("cum").cast("double") / col("tot").cast("double"), 8)
              .as("cum_share"))
          .orderBy(col("decile"))
      },
      oracle = Some(s"""
        WITH per_cust AS (
          SELECT o_custkey AS cust, ${sqlMsum("o_totalprice")} AS rev
          FROM orders GROUP BY 1),
        ranked AS (
          SELECT rev,
            ((row_number() OVER (ORDER BY rev, cust) - 1) * 10)
              // (SELECT count(*) FROM per_cust) AS decile
          FROM per_cust),
        dec10 AS (
          SELECT decile, count(*) AS n_custs,
            sum(CAST(rev AS DECIMAL(18,2))) AS drev
          FROM ranked GROUP BY 1),
        cumed AS (
          SELECT decile, n_custs, drev,
            sum(drev) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cum,
            sum(drev) OVER () AS tot
          FROM dec10)
        SELECT CAST(decile AS BIGINT) AS decile, n_custs,
          CAST(round(drev, 2) AS DOUBLE) AS decile_rev,
          round(CAST(drev AS DOUBLE) / CAST(tot AS DOUBLE), 8) AS rev_share,
          round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 8) AS cum_share
        FROM cumed
        ORDER BY decile""")),

    "q180_hard_negatives" -> Q(
      // Hard-negative mining: for each anchor vector, its most-similar
      // OTHER-label vector (the contrastive-training staple), rolled up
      // per label with the mean hard-negative similarity and the most
      // frequent confusing label. High mean = the class boundary is
      // blurry; the confuser column names the class it blurs into.
      // Shape: q25's broadcast pattern (anchors broadcast, corpus side
      // never shuffles), per-anchor argmax as one struct-max aggregation
      // (no window over the n² frame), label rollup bounded. Ties break
      // to the smallest neighbor id / smallest confuser label in both
      // engines; similarities snap through davg's exact-decimal mean.
      build = (s, dir) => {
        val e = table(s, dir, "embeddings")
        val q = e.select(col("vec_id").as("anchor_id"),
          col("label").as("a_label"), Vectors.asDouble(col("embedding")).as("qv"))
        val c = e.select(col("vec_id").as("neighbor_id"),
          col("label").as("n_label"), Vectors.asDouble(col("embedding")).as("cv"))
        val hard = c.join(broadcast(q), col("a_label") =!= col("n_label"))
          .withColumn("sim", Vectors.cosine(col("qv"), col("cv")))
          .groupBy(col("anchor_id"), col("a_label"))
          .agg(max(struct(col("sim"), (-col("neighbor_id")).as("nid"),
            col("n_label"))).as("best"))
          .select(col("a_label").as("label"),
            col("best.sim").as("hard_sim"), col("best.n_label").as("confuser"))
        val conf = hard.groupBy(col("label"), col("confuser"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("label"))
          .agg(max(struct(col("cnt"), (-col("confuser")).as("nc"))).as("top"))
          .select(col("label"), (-col("top.nc")).cast("int").as("top_confuser"),
            col("top.cnt").as("n_confused"))
        hard.groupBy(col("label"))
          .agg(count(lit(1)).as("n"), davg(col("hard_sim")).as("avg_hard_sim"))
          .join(conf, "label")
          .select(col("label"), col("n"), col("avg_hard_sim"),
            col("top_confuser"), col("n_confused"))
          .orderBy(col("label"))
      },
      oracle = Some(s"""
        WITH v AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings),
        sims AS (
          SELECT q.vec_id AS anchor_id, q.label AS a_label,
            c.vec_id AS neighbor_id, c.label AS n_label,
            list_dot_product(q.emb, c.emb)
              / (sqrt(list_dot_product(q.emb, q.emb))
                 * sqrt(list_dot_product(c.emb, c.emb))) AS sim
          FROM v q JOIN v c ON q.label <> c.label),
        hard AS (
          SELECT a_label AS label, sim AS hard_sim, n_label AS confuser
          FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
              ORDER BY sim DESC, neighbor_id) AS rnk
            FROM sims) WHERE rnk = 1),
        conf AS (
          SELECT label, confuser AS top_confuser, cnt AS n_confused
          FROM (SELECT label, confuser, count(*) AS cnt,
              row_number() OVER (PARTITION BY label
                ORDER BY count(*) DESC, confuser) AS rnk
            FROM hard GROUP BY 1, 2) WHERE rnk = 1)
        SELECT h.label AS label, count(*) AS n,
          ${sqlDavg("h.hard_sim")} AS avg_hard_sim,
          any_value(c.top_confuser) AS top_confuser,
          CAST(any_value(c.n_confused) AS BIGINT) AS n_confused
        FROM hard h JOIN conf c ON c.label = h.label
        GROUP BY h.label
        ORDER BY h.label""")),

    "q181_decayed_engagement" -> Q(
      // Time-decayed engagement score per event type with a STAIRCASE
      // half-life (weight = 2^-(age_days div 7), halving per week):
      // recency-weighted totals are how feeds/rankers discount stale
      // signals, but exp(-λt) is cross-engine hazardous (libm exp is not
      // correctly rounded). Integer week-bucket exponents make every
      // weight an exact power of two: the per-(type, week) totals are
      // exact decimal (one map-side-combinable groupBy over the scan),
      // and the weighted recombination runs on that bounded frame with
      // exact-decimal accumulation — bit-stable in both engines.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        val mx = ev.agg(max(col("ts").cast("date")).as("mx"))
        val buckets = ev.crossJoin(broadcast(mx))
          .withColumn("k", expr("datediff(mx, CAST(ts AS DATE)) div 7"))
          .groupBy(col("event_type"), col("k"))
          .agg(dsum(col("value")).as("sv"), count(lit(1)).as("cnt"))
        buckets.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_weeks"),
            sum(col("cnt")).as("n_events"),
            dsum(col("sv")).as("raw_total"),
            dsum(col("sv") * pow(lit(0.5), col("k").cast("double")))
              .as("decayed_total"))
          .orderBy(col("event_type"))
      },
      oracle = Some(s"""
        WITH mx AS (SELECT max(CAST(ts AS DATE)) AS mx FROM events),
        buckets AS (
          SELECT event_type,
            date_diff('day', CAST(ts AS DATE), mx) // 7 AS k,
            ${sqlDsum("value")} AS sv, count(*) AS cnt
          FROM events CROSS JOIN mx
          GROUP BY 1, 2)
        SELECT event_type, count(*) AS n_weeks,
          CAST(sum(cnt) AS BIGINT) AS n_events,
          ${sqlDsum("sv")} AS raw_total,
          ${sqlDsum("sv * power(0.5, k)")} AS decayed_total
        FROM buckets
        GROUP BY 1
        ORDER BY event_type""")),

    "q182_rare_category_collapse" -> Q(
      // Rare-category collapse ("top-k + OTHER"): part brands ranked by
      // exact revenue, the top 5 kept, the tail folded into 'OTHER' —
      // the feature-engineering op that caps categorical cardinality
      // before encoding (and the reporting op behind every "top N plus
      // other" chart). The brand domain is bounded, so the rank runs on
      // the aggregate frame; the fact scan is aggregated ONCE and reused
      // for both the ranking and the collapsed rollup (exact decimal
      // re-accumulation makes the fold order-independent).
      build = (s, dir) => {
        val byBrand = table(s, dir, "lineitem")
          .join(table(s, dir, "part"),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(sum(dec(col("l_extendedprice"))).as("brevd"),
            count(lit(1)).as("n_items"))
        val top5 = byBrand
          .orderBy(col("brevd").desc, col("p_brand")).limit(5)
          .select(col("p_brand"), lit(1).as("keep"))
        byBrand.join(broadcast(top5), Seq("p_brand"), "left")
          .withColumn("brand_grp",
            when(col("keep").isNotNull, col("p_brand")).otherwise(lit("OTHER")))
          .groupBy(col("brand_grp"))
          .agg(count(lit(1)).as("n_brands"),
            sum(col("n_items")).as("n_items"),
            m2(sum(col("brevd"))).as("revenue"))
          .orderBy(col("revenue").desc, col("brand_grp"))
      },
      oracle = Some("""
        WITH by_brand AS (
          SELECT p_brand,
            sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS brevd,
            count(*) AS n_items
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1),
        top5 AS (
          SELECT p_brand FROM by_brand
          ORDER BY brevd DESC, p_brand LIMIT 5)
        SELECT CASE WHEN p_brand IN (SELECT p_brand FROM top5)
            THEN p_brand ELSE 'OTHER' END AS brand_grp,
          count(*) AS n_brands,
          CAST(sum(n_items) AS BIGINT) AS n_items,
          CAST(round(sum(brevd), 2) AS DOUBLE) AS revenue
        FROM by_brand
        GROUP BY 1
        ORDER BY revenue DESC, brand_grp""")),

    "q183_neyman_allocation" -> Q(
      // Neyman-optimal stratified sample design: per market segment,
      // allocate a 1000-row sample budget ∝ N_h·σ_h (big AND noisy
      // strata get more rows — the minimum-variance design for a fixed
      // budget). The survey-sampling planner a data-curation pipeline
      // runs before drawing eval samples. Moments per stratum via the
      // engine's exact-decimal sums (q44's std recipe, sample ddof=1,
      // snapped to 4); the share normalization runs on the bounded
      // 5-segment frame with exact-decimal accumulation. n_alloc uses
      // floor, not round (a floor at an integer boundary needs the
      // share to sit within one ulp of it — measure-zero; round sits on
      // representable halves).
      build = (s, dir) => {
        val seg = table(s, dir, "orders")
          .join(table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("segment"),
            col("o_totalprice").cast("double").as("v"))
        val st = seg.groupBy(col("segment"))
          .agg(count(col("v")).as("n_h"),
            dsum(col("v")).as("s1"), dsumsq(col("v")).as("s2"))
          .withColumn("std_h", round(sqrt(greatest(lit(0.0),
            (col("s2") - col("s1") * col("s1") / col("n_h"))
              / (col("n_h") - 1))), 4))
          .withColumn("w", col("n_h").cast("double") * col("std_h"))
        val tot = st.agg(dsum(col("w")).as("tw"))
        st.crossJoin(broadcast(tot))
          .withColumn("alloc_share", round(col("w") / col("tw"), 8))
          .withColumn("n_alloc",
            floor(lit(1000.0) * col("w") / col("tw")).cast("long"))
          .select(col("segment"), col("n_h"), col("std_h"),
            col("alloc_share"), col("n_alloc"))
          .orderBy(col("segment"))
      },
      oracle = Some(s"""
        WITH st AS (
          SELECT c_mktsegment AS segment,
            count(CAST(o_totalprice AS DOUBLE)) AS n_h,
            ${sqlDsum("CAST(o_totalprice AS DOUBLE)")} AS s1,
            ${sqlDsumsq("CAST(o_totalprice AS DOUBLE)")} AS s2
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1),
        sigd AS (
          SELECT segment, n_h,
            round(sqrt(greatest(0.0,
              (s2 - s1 * s1 / n_h) / (n_h - 1))), 4) AS std_h
          FROM st),
        wgt AS (
          SELECT segment, n_h, std_h,
            CAST(n_h AS DOUBLE) * std_h AS w
          FROM sigd),
        tot AS (SELECT ${sqlDsum("w")} AS tw FROM wgt)
        SELECT segment, n_h, std_h,
          round(w / tw, 8) AS alloc_share,
          CAST(floor(1000.0 * w / tw) AS BIGINT) AS n_alloc
        FROM wgt CROSS JOIN tot
        ORDER BY segment""")),

    "q184_activity_streaks" -> Q(
      // Longest consecutive-day activity streaks (gaps-and-islands by
      // the date-minus-rank trick): distinct user-days, per-USER rank
      // window (partitioned — never single-partition), `day − rank` is
      // constant exactly within a consecutive run, one groupBy collapses
      // each island. The engagement metric behind "7-day streak" badges
      // and retention cohorting. Top-20 with full deterministic
      // tie-break (len desc, user, start).
      build = (s, dir) => {
        val ud = table(s, dir, "events")
          .select(col("user_id").as("u"), col("ts").cast("date").as("d"))
          .distinct()
        val w = Window.partitionBy(col("u")).orderBy(col("d"))
        ud.withColumn("anchor", date_sub(col("d"), row_number().over(w)))
          .groupBy(col("u"), col("anchor"))
          .agg(count(lit(1)).as("streak_days"),
            min(col("d")).as("streak_start"), max(col("d")).as("streak_end"))
          .select(col("u").as("user_id"), col("streak_days"),
            col("streak_start"), col("streak_end"))
          .orderBy(col("streak_days").desc, col("user_id"),
            col("streak_start"))
          .limit(20)
      },
      oracle = Some("""
        WITH ud AS (
          SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
        g AS (
          SELECT u, d,
            d - CAST(row_number() OVER (PARTITION BY u ORDER BY d) AS INT)
              AS anchor
          FROM ud)
        SELECT u AS user_id, count(*) AS streak_days,
          min(d) AS streak_start, max(d) AS streak_end
        FROM g GROUP BY u, anchor
        ORDER BY streak_days DESC, user_id, streak_start
        LIMIT 20""")),

    "q185_dedup_threshold_sweep" -> Q(
      // Near-dup threshold operating curve: pair and doc counts at five
      // Jaccard cutoffs from ONE exact pair computation (q27's inverted
      // index at its loosest threshold, 0.5) — the tuning table that
      // answers "how much does the corpus shrink if we dedup at 0.7 vs
      // 0.8" without re-running the join per candidate threshold. The
      // sweep is a broadcast of five literals against the bounded
      // surviving-pair set; distinct-doc counts unpivot the pair ids
      // first.
      build = (s, dir) => {
        import s.implicits._
        val pairs = NearDup.jaccardPairs(
          table(s, dir, "documents"), "doc_id", "text", minJ = 0.5)
        val ths = Seq(0.5, 0.6, 0.7, 0.8, 0.9)
          .toDF("th")
        val hit = pairs.crossJoin(broadcast(ths))
          .filter(col("jaccard") >= col("th"))
        val perTh = hit.groupBy(col("th")).agg(count(lit(1)).as("n_pairs"))
        val docs = hit.select(col("th"), col("id_a").as("id"))
          .unionByName(hit.select(col("th"), col("id_b").as("id")))
          .distinct()
          .groupBy(col("th")).agg(count(lit(1)).as("n_docs_involved"))
        perTh.join(docs, Seq("th"), "left")
          .select(col("th"), col("n_pairs"),
            coalesce(col("n_docs_involved"), lit(0L)).as("n_docs_involved"))
          .orderBy(col("th"))
      },
      oracle = Some(s"""
        WITH $ngramPairCtes,
        ths AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS th),
        hit AS (
          SELECT t.th, p.id_a, p.id_b, p.jaccard
          FROM pairs p CROSS JOIN ths t
          WHERE p.jaccard >= t.th),
        per_th AS (
          SELECT th, count(*) AS n_pairs FROM hit GROUP BY 1),
        docs AS (
          SELECT th, count(*) AS n_docs_involved FROM (
            SELECT DISTINCT th, id FROM (
              SELECT th, id_a AS id FROM hit
              UNION ALL
              SELECT th, id_b FROM hit))
          GROUP BY 1)
        SELECT p.th, p.n_pairs,
          CAST(coalesce(d.n_docs_involved, 0) AS BIGINT) AS n_docs_involved
        FROM per_th p LEFT JOIN docs d USING (th)
        ORDER BY th""")),

    "q186_join_size_preflight" -> Q(
      // Pre-flight join/self-join cardinality estimation from CMS inner
      // products (AMS/Cormade-Muthukrishnan F2-style): |A ⋈ B| =
      // Σ_k f_A(k)·f_B(k), estimated as min over sketch rows of the
      // counter-grid dot product — the "will this self-join explode"
      // check (the q144/q150 ER-blocking question) answered from two
      // bounded 4×1024 grids instead of running the join. The estimate
      // can only overcount (collision cross terms add, never subtract),
      // so overcount ≥ 0 is a checked invariant; the exact pair count
      // rides along to exhibit the error. All integer arithmetic over
      // the portable salted md5 hash — oracle-checked exactly.
      build = (s, dir) => {
        def side(df: DataFrame, keyCol: String, label: String): DataFrame = {
          val sk = Cms.sketch(df, keyCol)
          val exact = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
            .agg(sum(col("n") * col("n")).as("exact_pairs"))
          exact.crossJoin(broadcast(Cms.innerProduct(sk, sk)))
            .select(lit(label).as("src"), col("exact_pairs"),
              col("cms_join_est"),
              (col("cms_join_est") - col("exact_pairs")).as("overcount"))
        }
        side(table(s, dir, "events"), "user_id", "events.user_id")
          .unionByName(side(table(s, dir, "lineitem"), "l_partkey",
            "lineitem.l_partkey"))
          .orderBy(col("src"))
      },
      oracle = Some(s"""
        WITH ${Cms.sqlSketchCtes("SELECT user_id AS key FROM events", "cms_ev")},
        ${Cms.sqlInnerProductCtes("cms_ev", "cms_ev", "est_ev")},
        ${Cms.sqlSketchCtes("SELECT l_partkey AS key FROM lineitem", "cms_li")},
        ${Cms.sqlInnerProductCtes("cms_li", "cms_li", "est_li")},
        ex_ev AS (
          SELECT CAST(sum(n * n) AS BIGINT) AS exact_pairs
          FROM (SELECT count(*) AS n FROM events GROUP BY user_id)),
        ex_li AS (
          SELECT CAST(sum(n * n) AS BIGINT) AS exact_pairs
          FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_partkey))
        SELECT 'events.user_id' AS src, exact_pairs, cms_join_est,
          cms_join_est - exact_pairs AS overcount
        FROM ex_ev CROSS JOIN est_ev
        UNION ALL
        SELECT 'lineitem.l_partkey', exact_pairs, cms_join_est,
          cms_join_est - exact_pairs
        FROM ex_li CROSS JOIN est_li
        ORDER BY src""")),

    "q187_kcore_trace" -> Q(
      // k-core decomposition of the part co-purchase graph (Seidman '83)
      // as a 6-round peel trace: alive₀ = all nodes, aliveᵢ₊₁ = nodes
      // with ≥ 80 neighbors inside aliveᵢ. The "dense cohesive subgraph"
      // extractor behind community mining and spam-cluster triage —
      // each round is one semi-join + one degree aggregation over a
      // frame that only shrinks (GraphCore scaladoc). k=80 sits at the
      // fixture's 10th degree percentile, so the trace strictly
      // decreases for 5 rounds then fixes — the equal tail rows PROVE
      // convergence inside the round budget rather than assuming it.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        val e = li.as("x").join(li.as("y"),
            col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
        val sym = e.unionByName(
          e.select(col("b").as("a"), col("a").as("b")))
        GraphCore.kCoreTrace(sym, k = 80, rounds = 6).orderBy(col("iter"))
      },
      oracle = Some(s"""
        WITH tri_edges AS MATERIALIZED (
          SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
          FROM lineitem x JOIN lineitem y
            ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        sym AS MATERIALIZED (
          SELECT a, b FROM tri_edges
          UNION ALL
          SELECT b, a FROM tri_edges),
        ${GraphCore.sqlKCoreTraceCtes("sym", k = 80, rounds = 6)}
        SELECT iter, alive_nodes, alive_edges FROM kcore_trace
        ORDER BY iter""")),

    "q188_bfs_reach" -> Q(
      // Bounded-hop reachability: minimum hop distance from one brand's
      // parts over the SUPPORT-≥2 co-purchase graph (edges kept only
      // when the pair co-occurs in ≥ 2 orders — q120's denoising; the
      // raw graph is so dense one hop reaches everything). Frontier
      // expansion joins edges against only the previous hop's nodes
      // (per-round work ∝ frontier, not graph); hop -1 counts nodes
      // unreached within 4 hops. The neighborhood-growth probe behind
      // "how local is this catalog" and seed-expansion labeling.
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        val e = li.as("x").join(li.as("y"),
            col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .groupBy(col("x.p").as("a"), col("y.p").as("b"))
          .agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2).select(col("a"), col("b"))
        val sym = e.unionByName(
          e.select(col("b").as("a"), col("a").as("b")))
        val seeds = table(s, dir, "part")
          .filter(col("p_brand") === "Brand#13")
          .select(col("p_partkey").as("a"))
          .join(sym.select(col("a")).distinct(), Seq("a"), "left_semi")
        val dist = GraphCore.bfsHops(sym, seeds, maxHops = 4)
        val reached = dist.groupBy(col("hop"))
          .agg(count(lit(1)).as("n_nodes"))
        val unreached = sym.select(col("a")).distinct()
          .join(dist.select(col("a")), Seq("a"), "left_anti")
          .agg(lit(-1).as("hop"), count(lit(1)).as("n_nodes"))
        reached.unionByName(unreached).orderBy(col("hop"))
      },
      oracle = Some(s"""
        WITH e2 AS MATERIALIZED (
          SELECT x.l_partkey AS a, y.l_partkey AS b
          FROM lineitem x JOIN lineitem y
            ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        sym AS MATERIALIZED (
          SELECT a, b FROM e2
          UNION ALL
          SELECT b, a FROM e2),
        seeds AS MATERIALIZED (
          SELECT DISTINCT s.a FROM sym s
          JOIN part p ON p.p_partkey = s.a
          WHERE p.p_brand = 'Brand#13'),
        ${GraphCore.sqlBfsHopsCtes("sym", "seeds", maxHops = 4)},
        nodes AS (SELECT DISTINCT a FROM sym)
        SELECT CAST(hop AS INT) AS hop, CAST(count(*) AS BIGINT) AS n_nodes
        FROM bfs_dist GROUP BY 1
        UNION ALL
        SELECT -1, CAST(count(*) AS BIGINT) FROM nodes
        WHERE a NOT IN (SELECT a FROM bfs_dist)
        ORDER BY hop""")),

    "q189_bm25_retrieval" -> Q(
      // Okapi BM25 retrieval over the corpus for a fixed 4-term query
      // mixing one rare term ('dup', df≈25 — high idf) with three
      // common ones — the quality-retrieval scoring a curation pipeline
      // uses to pull "documents like these" from a 100 TB corpus.
      // Top-20 via distributed orderBy+limit (top-k, never a global
      // window); determinism per TextStats.bm25's scaladoc (integer
      // tf/df/dl, 8-decimal snaps, exact-decimal term sum).
      build = (s, dir) =>
        TextStats.bm25(table(s, dir, "documents"), "doc_id", "text",
            Seq("dup", "scan", "merge", "window"))
          .orderBy(col("score").desc, col("id"))
          .limit(20)
          .select(col("id").as("doc_id"), col("n_terms"), col("score")),
      oracle = Some(s"""
        WITH ${TextStats.sqlBm25Ctes("doc_id", "text",
          "('dup','scan','merge','window')")}
        SELECT id AS doc_id, n_terms, score FROM bm25
        ORDER BY score DESC, id LIMIT 20""")),

    "q190_bootstrap_se" -> Q(
      // Poisson-bootstrap standard error of mean order value per
      // priority (Efron's bootstrap in its shuffle-free streaming form:
      // each row enters replicate b with multiplicity ~ Poisson(1),
      // derived here from the portable md5 hash of (orderkey, b) via
      // fixed inverse-CDF thresholds — fully deterministic and
      // cross-engine identical, unlike rand()). 48 replicates in ONE
      // pass (explode + two bounded aggregations, no resampled copies
      // of the data); the analytic s/√n rides along — ratio ≈ 1 is the
      // bootstrap working. Replicate means use exact-decimal sums; the
      // across-replicate spread snaps through decimal like Stable.davg.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        val reps = o.select(col("o_orderpriority").as("pri"),
            col("o_orderkey").as("ok"), col("o_totalprice").as("price"))
          .withColumn("bi", explode(sequence(lit(0), lit(47))))
          .withColumn("u", TextHash.md5Bits60(concat(
              col("ok").cast("string"), lit("|bs"),
              col("bi").cast("string"))).cast("double")
            / lit(1.152921504606846976e18))
          .withColumn("wt",
            when(col("u") < 0.36787944117144233, 0L)
              .when(col("u") < 0.7357588823428847, 1L)
              .when(col("u") < 0.9196986029286058, 2L)
              .when(col("u") < 0.9810118431238462, 3L)
              .when(col("u") < 0.9963401531726563, 4L)
              .otherwise(5L))
          .groupBy(col("pri"), col("bi"))
          .agg((round(sum(dec(col("price")) * col("wt").cast("decimal(2,0)")), 2)
            .cast("double") / sum(col("wt"))).as("m"))
        val boot = reps.groupBy(col("pri")).agg(
            round(sum(col("m").cast("decimal(24,8)")), 8).cast("double")
              .as("s1"),
            round(sum((col("m") * col("m")).cast("decimal(30,8)")), 8)
              .cast("double").as("s2"))
          .withColumn("se_boot", round(sqrt(greatest(
            (col("s2") - col("s1") * col("s1") / 48.0) / 47.0,
            lit(0.0))), 4))
        val an = o.groupBy(col("o_orderpriority").as("pri")).agg(
            count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("t1"),
            dsumsq(col("o_totalprice")).as("t2"))
          .withColumn("se_analytic", round(sqrt(
            (col("t2") - col("t1") * col("t1") / col("n"))
              / (col("n") - 1) / col("n")), 4))
        boot.join(an, Seq("pri"))
          .select(col("pri"), col("n"), col("se_boot"), col("se_analytic"),
            round(col("se_boot") / col("se_analytic"), 4).as("ratio"))
          .orderBy(col("pri"))
      },
      oracle = Some(s"""
        WITH b AS (
          SELECT o_orderpriority AS pri, o_totalprice AS price, bi,
            ${TextHash.sqlMd5Bits60(
              "CAST(o_orderkey AS VARCHAR) || '|bs' || CAST(bi AS VARCHAR)")}
              / 1152921504606846976.0 AS u
          FROM orders
          CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS bi) bs),
        w AS (
          SELECT pri, price, bi,
            CASE WHEN u < 0.36787944117144233 THEN 0
                 WHEN u < 0.7357588823428847 THEN 1
                 WHEN u < 0.9196986029286058 THEN 2
                 WHEN u < 0.9810118431238462 THEN 3
                 WHEN u < 0.9963401531726563 THEN 4
                 ELSE 5 END AS wt
          FROM b),
        reps AS (
          SELECT pri, bi,
            CAST(round(sum(CAST(price AS DECIMAL(12,2))
                * CAST(wt AS DECIMAL(2,0))), 2) AS DOUBLE)
              / sum(wt) AS m
          FROM w GROUP BY 1, 2),
        boot AS (
          SELECT pri,
            CAST(round(sum(CAST(m AS DECIMAL(24,8))), 8) AS DOUBLE) AS s1,
            CAST(round(sum(CAST(m * m AS DECIMAL(30,8))), 8) AS DOUBLE) AS s2
          FROM reps GROUP BY 1),
        boot2 AS (
          SELECT pri,
            round(sqrt(greatest((s2 - s1 * s1 / 48.0) / 47.0, 0.0)), 4)
              AS se_boot
          FROM boot),
        an AS (
          SELECT o_orderpriority AS pri, count(*) AS n,
            ${sqlDsum("o_totalprice")} AS t1,
            ${sqlDsumsq("o_totalprice")} AS t2
          FROM orders GROUP BY 1),
        an2 AS (
          SELECT pri, n,
            round(sqrt((t2 - t1 * t1 / n) / (n - 1) / n), 4) AS se_analytic
          FROM an)
        SELECT b.pri, a.n, b.se_boot, a.se_analytic,
          round(b.se_boot / a.se_analytic, 4) AS ratio
        FROM boot2 b JOIN an2 a ON a.pri = b.pri
        ORDER BY b.pri""")),

    "q191_quantile_norm_map" -> Q(
      // Quantile-normalization map (the batch-effect remover of
      // bioinformatics, applied to account balances by market segment):
      // per-segment deciles vs pooled deciles, and the shift that maps
      // one onto the other. At 100 TB you compute this BOUNDED map
      // (segments × 11 rows), broadcast it, and apply map-side — the
      // query emits the map itself. Exact type-7 interpolation on both
      // engines (parity per q62); values snapped to 6 decimals because
      // the two engines' interpolation formulas can differ in the last
      // ulp on non-integer inputs.
      build = (s, dir) => {
        val qsArr = (0 to 10).map(i => s"${i / 10.0}D").mkString(
          "array(", ",", ")")
        val c = table(s, dir, "customer")
        val grp = c.groupBy(col("c_mktsegment").as("segment"))
          .agg(expr(s"percentile(c_acctbal, $qsArr)").as("gv"),
            count(lit(1)).as("n_rows"))
          .select(col("segment"), col("n_rows"),
            posexplode(col("gv")).as(Seq("qi", "group_val")))
        val pooled = c
          .agg(expr(s"percentile(c_acctbal, $qsArr)").as("pv"))
          .select(posexplode(col("pv")).as(Seq("qi", "pooled_val")))
        grp.join(broadcast(pooled), Seq("qi"))
          .select(col("segment"), col("qi").cast("long").as("qi"),
            col("n_rows"),
            round(col("group_val"), 6).as("group_val"),
            round(col("pooled_val"), 6).as("pooled_val"),
            round(round(col("pooled_val"), 6) - round(col("group_val"), 6),
              6).as("shift"))
          .orderBy(col("segment"), col("qi"))
      },
      oracle = Some(s"""
        WITH qs AS (SELECT unnest(generate_series(0, 10)) AS qi),
        grp AS (
          SELECT c_mktsegment AS segment, count(*) AS n_rows,
            quantile_cont(c_acctbal,
              [0.0,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0]) AS ql
          FROM customer GROUP BY 1),
        pooled AS (
          SELECT quantile_cont(c_acctbal,
            [0.0,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0]) AS pl
          FROM customer)
        SELECT g.segment, CAST(q.qi AS BIGINT) AS qi, g.n_rows,
          round(g.ql[q.qi + 1], 6) AS group_val,
          round(p.pl[q.qi + 1], 6) AS pooled_val,
          round(round(p.pl[q.qi + 1], 6) - round(g.ql[q.qi + 1], 6), 6)
            AS shift
        FROM grp g CROSS JOIN qs q CROSS JOIN pooled p
        ORDER BY g.segment, qi""")),

    "q192_compaction_planner" -> Q(
      // Small-files compaction planning — the operational answer to the
      // small-files problem a 100 TB event lake develops: model each
      // (user, day) event group as a "file", scan files in (day, user)
      // order, and bin-pack them into 4 KiB output buckets by integer
      // division of the EXCLUSIVE running byte total. The running total
      // uses PrefixSum.running (bucketed two-pass prefix sum — never a
      // single-partition window over the file list); bucket assignment
      // and all stats are pure integer arithmetic. Oversize files
      // (> target) are surfaced separately — they need splitting, not
      // packing.
      build = (s, dir) => {
        val target = 4096L
        val files = table(s, dir, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(sum(lit(32) + coalesce(length(col("props")), lit(0))
            + length(col("event_type"))).as("bytes"))
          .withColumn("ordk",
            datediff(col("d"), lit("1970-01-01")).cast("long") * 1000
              + col("user_id"))
        val ranked = PrefixSum.running(files, "ordk", "ordk", "bytes",
            descending = false)
          .withColumn("bucket",
            expr(s"CAST(cum - bytes AS BIGINT) div $target"))
        val per = ranked.groupBy(col("bucket"))
          .agg(count(lit(1)).as("nf"),
            sum(col("bytes")).as("bb"))
        val summary = per.agg(
          sum(col("nf")).as("n_files"),
          sum(col("bb")).as("total_bytes"),
          count(lit(1)).as("n_buckets"),
          max(col("bb")).as("max_bucket_bytes"),
          max(col("nf")).as("max_files_per_bucket"))
        val oversize = ranked.filter(col("bytes") > target)
          .agg(count(lit(1)).as("oversize_files"))
        summary.crossJoin(broadcast(oversize))
      },
      oracle = Some("""
        WITH files AS (
          SELECT user_id, CAST(ts AS DATE) AS d,
            CAST(sum(32 + coalesce(len(props), 0) + len(event_type))
              AS BIGINT) AS bytes
          FROM events GROUP BY 1, 2),
        ordf AS (
          SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT)
              * 1000 + user_id AS ordk,
            bytes
          FROM files),
        run AS (
          SELECT bytes,
            sum(bytes) OVER (ORDER BY ordk ROWS UNBOUNDED PRECEDING)
              - bytes AS excum
          FROM ordf),
        bk AS (SELECT bytes, excum // 4096 AS bucket FROM run),
        per AS (
          SELECT bucket, count(*) AS nf, CAST(sum(bytes) AS BIGINT) AS bb
          FROM bk GROUP BY 1),
        summary AS (
          SELECT CAST(sum(nf) AS BIGINT) AS n_files,
            CAST(sum(bb) AS BIGINT) AS total_bytes,
            count(*) AS n_buckets,
            max(bb) AS max_bucket_bytes,
            max(nf) AS max_files_per_bucket
          FROM per),
        oversize AS (
          SELECT count(*) AS oversize_files FROM files WHERE bytes > 4096)
        SELECT n_files, total_bytes, n_buckets, max_bucket_bytes,
          max_files_per_bucket, oversize_files
        FROM summary CROSS JOIN oversize""")),

    "q193_merkle_diff" -> Q(
      // Merkle-style table diff: find WHICH partitions of a 100 TB table
      // changed between versions without comparing rows — per-bucket
      // content digests (order-independent exact-decimal SUM of portable
      // per-row hashes over 256 hash buckets) compared base vs modified,
      // emitting only the differing buckets. Row comparison then targets
      // ~2/3 of buckets instead of the whole table (and in a real lake,
      // only those files). The modified version is a deterministic
      // mutation of orders: keys ≡0 mod 101 deleted, keys ≡0 mod 97 get
      // +1.00 on the price — both classes land in the diff. Doubles are
      // never stringified (engine formatting differs): the row serial
      // uses the exact DECIMAL rendering on both sides.
      build = (s, dir) => {
        val o = table(s, dir, "orders")
        def serial(price: Column): Column = concat_ws("|",
          col("o_orderkey").cast("string"),
          col("o_custkey").cast("string"),
          col("o_orderstatus"),
          price.cast("string"),
          to_date(col("o_orderdate")).cast("string"),
          col("o_orderpriority"))
        def digest(df: DataFrame, price: Column): DataFrame = df
          .withColumn("bucket",
            pmod(TextHash.md5Bits60(col("o_orderkey").cast("string")),
              lit(256L)))
          .withColumn("h", TextHash.md5Bits60(serial(price)))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(col("h").cast("decimal(38,0)")).as("dig"))
        val base = digest(o, dec(col("o_totalprice")))
        val mod = digest(
          o.filter(col("o_orderkey") % 101 =!= 0),
          dec(col("o_totalprice"))
            + when(col("o_orderkey") % 97 === 0, lit(1))
                .otherwise(lit(0)).cast("decimal(3,0)"))
        base.join(mod.select(col("bucket"), col("n").as("n_mod"),
            col("dig").as("dig_mod")), Seq("bucket"), "full")
          .filter(col("dig").isNull || col("dig_mod").isNull ||
            col("dig") =!= col("dig_mod"))
          .select(col("bucket"),
            coalesce(col("n"), lit(0L)).as("n_base"),
            coalesce(col("n_mod"), lit(0L)).as("n_mod"))
          .orderBy(col("bucket"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT ${TextHash.sqlMd5Bits60("CAST(o_orderkey AS VARCHAR)")}
              % 256 AS bucket,
            count(*) AS n,
            sum(CAST(${TextHash.sqlMd5Bits60(
              "CAST(o_orderkey AS VARCHAR) || '|' || " +
              "CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' " +
              "|| CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) || " +
              "'|' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || '|' " +
              "|| o_orderpriority")} AS DECIMAL(38,0))) AS dig
          FROM orders GROUP BY 1),
        modv AS (
          SELECT ${TextHash.sqlMd5Bits60("CAST(o_orderkey AS VARCHAR)")}
              % 256 AS bucket,
            count(*) AS n,
            sum(CAST(${TextHash.sqlMd5Bits60(
              "CAST(o_orderkey AS VARCHAR) || '|' || " +
              "CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' " +
              "|| CAST(CAST(o_totalprice AS DECIMAL(12,2)) + " +
              "CAST(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END " +
              "AS DECIMAL(3,0)) AS VARCHAR) || " +
              "'|' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || '|' " +
              "|| o_orderpriority")} AS DECIMAL(38,0))) AS dig
          FROM orders WHERE o_orderkey % 101 <> 0 GROUP BY 1)
        SELECT coalesce(b.bucket, m.bucket) AS bucket,
          CAST(coalesce(b.n, 0) AS BIGINT) AS n_base,
          CAST(coalesce(m.n, 0) AS BIGINT) AS n_mod
        FROM base b FULL JOIN modv m ON b.bucket = m.bucket
        WHERE b.dig IS NULL OR m.dig IS NULL OR b.dig <> m.dig
        ORDER BY bucket""")),

    "q194_debounce_dedup" -> Q(
      // Debounce deduplication — telemetry double-fire suppression: an
      // event is kept iff it is the first of its (user, event_type) key
      // or arrives > 1 h after the previous event of that key (the
      // standard lag-gap formulation; chains of rapid fires collapse
      // onto their opener — 184 of 10k fixture events). One per-key window
      // — state bounded per key, the same shape the streaming twin
      // (q79) bounds with a watermark.
      build = (s, dir) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        table(s, dir, "events")
          .withColumn("gap_us",
            unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1)
              .over(w))
          .withColumn("kept",
            (col("gap_us").isNull || col("gap_us") > 3600000000L)
              .cast("long"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_total"),
            sum(col("kept")).as("n_kept"),
            (count(lit(1)) - sum(col("kept"))).as("n_dropped"))
          .orderBy(col("event_type"))
      },
      oracle = Some(debounceOracle)),

    "q195_mixture_reweight" -> Q(
      // Training-mixture reweighting: importance weights that map the
      // corpus's language distribution onto a uniform target (the
      // domain-reweighting step of LLM data curation), plus the
      // effective sample size ESS = (Σw)²/Σw² — the number that says
      // how much data the reweighted corpus is actually worth (Kish
      // '65). Per-language rows carry source share and weight; the
      // '__all__' row carries the scalar ESS and its ratio to N. All
      // from two bounded aggregations over the per-language counts —
      // weights are a broadcastable map at any scale.
      build = (s, dir) => {
        val d = table(s, dir, "documents")
        val n = d.agg(count(lit(1)).as("nn"))
        val perLang = d.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"))
          .crossJoin(broadcast(n))
        val langs = perLang.agg(count(lit(1)).as("k"))
        val wl = perLang.crossJoin(broadcast(langs))
          .withColumn("src_share",
            round(col("n_docs").cast("double") / col("nn"), 8))
          .withColumn("w", round(col("nn").cast("double")
            / (col("k") * col("n_docs")), 8))
        val out = wl.select(col("lang"), col("n_docs"),
          col("src_share"), col("w"))
        val ess = wl.agg(
            round(sum((col("w") * col("n_docs")).cast("decimal(24,8)")), 8)
              .cast("double").as("s1"),
            round(sum((col("w") * col("w") * col("n_docs"))
              .cast("decimal(24,8)")), 8).cast("double").as("s2"),
            sum(col("n_docs")).as("ntot"))
          .select(lit("__all__").as("lang"), col("ntot").as("n_docs"),
            round(col("s1") * col("s1") / col("s2") / col("ntot"), 8)
              .as("src_share"),
            round(col("s1") * col("s1") / col("s2"), 8).as("w"))
        out.unionByName(ess).orderBy(col("lang"))
      },
      oracle = Some("""
        WITH per AS (
          SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n_docs) AS BIGINT) AS nn, count(*) AS k
          FROM per),
        wl AS (
          SELECT lang, n_docs,
            round(CAST(n_docs AS DOUBLE) / nn, 8) AS src_share,
            round(CAST(nn AS DOUBLE) / (k * n_docs), 8) AS w
          FROM per CROSS JOIN tot),
        ess AS (
          SELECT
            CAST(round(sum(CAST(w * n_docs AS DECIMAL(24,8))), 8)
              AS DOUBLE) AS s1,
            CAST(round(sum(CAST(w * w * n_docs AS DECIMAL(24,8))), 8)
              AS DOUBLE) AS s2,
            CAST(sum(n_docs) AS BIGINT) AS ntot
          FROM wl)
        SELECT lang, n_docs, src_share, w FROM wl
        UNION ALL
        SELECT '__all__', ntot,
          round(s1 * s1 / s2 / ntot, 8),
          round(s1 * s1 / s2, 8)
        FROM ess
        ORDER BY lang""")),

    "q196_wasserstein_grid" -> Q(
      // Wasserstein-1 distance of each priority's order-value
      // distribution from the pooled distribution, via the quantile
      // representation W₁ = ∫₀¹ |Q_g(u) − Q_pool(u)| du on a fixed
      // 101-point grid — the binless drift metric that complements
      // q121's KL and q122's PSI (both need binning; W₁ reads straight
      // off the quantile functions and carries units of money). Exact
      // type-7 interpolation per q62; |diffs| snapped to 6 decimals and
      // summed in exact decimal over the FIXED grid order.
      build = (s, dir) => {
        val grid = (0 to 100).map(i => s"${i / 100.0}D").mkString(
          "array(", ",", ")")
        val o = table(s, dir, "orders")
        val grp = o.groupBy(col("o_orderpriority").as("pri"))
          .agg(expr(s"percentile(o_totalprice, $grid)").as("gv"),
            count(lit(1)).as("n"))
          .select(col("pri"), col("n"),
            posexplode(col("gv")).as(Seq("qi", "gq")))
        val pooled = o.agg(expr(s"percentile(o_totalprice, $grid)").as("pv"))
          .select(posexplode(col("pv")).as(Seq("qi", "pq")))
        grp.join(broadcast(pooled), Seq("qi"))
          .withColumn("ad",
            abs(round(col("gq"), 6) - round(col("pq"), 6)))
          .groupBy(col("pri"))
          .agg(max(col("n")).as("n"),
            (round(sum(col("ad").cast("decimal(24,6)")), 6).cast("double")
              / 101).as("w1_vs_pooled"))
          .orderBy(col("pri"))
      },
      oracle = Some(s"""
        WITH qs AS (SELECT unnest(generate_series(0, 100)) AS qi),
        grp AS (
          SELECT o_orderpriority AS pri, count(*) AS n,
            quantile_cont(o_totalprice,
              ${(0 to 100).map(i => i / 100.0).mkString("[", ",", "]")})
              AS ql
          FROM orders GROUP BY 1),
        pooled AS (
          SELECT quantile_cont(o_totalprice,
            ${(0 to 100).map(i => i / 100.0).mkString("[", ",", "]")})
            AS pl
          FROM orders),
        diffs AS (
          SELECT g.pri, g.n,
            abs(round(g.ql[q.qi + 1], 6) - round(p.pl[q.qi + 1], 6)) AS ad
          FROM grp g CROSS JOIN qs q CROSS JOIN pooled p)
        SELECT pri, max(n) AS n,
          CAST(round(sum(CAST(ad AS DECIMAL(24,6))), 6) AS DOUBLE) / 101
            AS w1_vs_pooled
        FROM diffs GROUP BY 1
        ORDER BY pri""")),

    "q197_conformal_thresholds" -> Q(
      // Split-conformal calibration (Vovk; the distribution-free
      // selective-prediction recipe): per-language 0.9-quantile score
      // thresholds fit on the hash-carved calibration half, coverage
      // measured on the disjoint holdout — the finite-sample guarantee
      // says holdout coverage ≈ 0.9 per group, and the row shows it.
      // The thresholds are a bounded broadcastable map (like q191); the
      // split is q51's deterministic content-hash carve, so the whole
      // audit is reproducible across engines/runs/layouts.
      build = (s, dir) => {
        val d = table(s, dir, "documents")
          .withColumn("score", col("n_chars").cast("double")
            / (size(split(trim(col("text")), "\\s+")) + 1))
        val sp = Sampling.hashSplit(d, "doc_id", valBuckets = 50)
        val tau = sp.filter(col("split") === "val")
          .groupBy(col("lang"))
          .agg(round(expr("percentile(score, 0.9D)"), 6).as("tau"),
            count(lit(1)).as("n_cal"))
        sp.filter(col("split") === "train")
          .join(broadcast(tau), Seq("lang"))
          .groupBy(col("lang"))
          .agg(max(col("n_cal")).as("n_cal"),
            count(lit(1)).as("n_hold"),
            max(col("tau")).as("tau"),
            sum((col("score") <= col("tau")).cast("long")).as("n_cov"))
          .withColumn("coverage",
            round(col("n_cov").cast("double") / col("n_hold"), 8))
          .orderBy(col("lang"))
      },
      oracle = Some(s"""
        WITH d AS (
          SELECT doc_id, lang,
            CAST(n_chars AS DOUBLE)
              / (len(regexp_split_to_array(trim(text), '\\s+')) + 1)
              AS score,
            ${Sampling.sqlHashBucket("doc_id", 100)} AS b
          FROM documents),
        tau AS (
          SELECT lang, round(quantile_cont(score, 0.9), 6) AS tau,
            count(*) AS n_cal
          FROM d WHERE b < 50 GROUP BY 1),
        hold AS (SELECT * FROM d WHERE b >= 50)
        SELECT h.lang, max(t.n_cal) AS n_cal, count(*) AS n_hold,
          max(t.tau) AS tau,
          CAST(sum(CASE WHEN h.score <= t.tau THEN 1 ELSE 0 END)
            AS BIGINT) AS n_cov,
          round(CAST(sum(CASE WHEN h.score <= t.tau THEN 1 ELSE 0 END)
            AS DOUBLE) / count(*), 8) AS coverage
        FROM hold h JOIN tau t ON t.lang = h.lang
        GROUP BY 1 ORDER BY 1""")),

    "q198_rank_correlation" -> Q(
      // Spearman's ρ next to Pearson's r for per-order revenue vs lines
      // per order — the robust/monotone correlation pair of any EDA
      // panel, on a pair with real signal (revenue accumulates per line).
      // Average ranks (midranks for ties — l_count has ~7 distinct
      // values, so tie handling is the whole game) come from cumulative
      // counts over the DISTINCT-value frame via PrefixSum.running:
      // never a row-level global window, and the midrank
      // (2·cum − n_v + 1)/2 is exact integer-derived arithmetic. Both
      // coefficients then flow through the same exact-decimal Pearson
      // moments (Trend), distinguished by a metric key in one pass.
      build = (s, dir) => {
        val src = table(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(msum(col("l_extendedprice")).as("price"),
            count(lit(1)).as("ni"))
          .select(col("price"), col("ni"))
        def avgRanks(vals: DataFrame, outCol: String): DataFrame = {
          val dv = vals.groupBy(col("v")).agg(count(lit(1)).as("nv"))
          PrefixSum.running(dv, "v", "v", "nv", descending = false)
            .select(col("v"),
              ((col("cum") * 2 - col("nv") + 1).cast("double") / 2.0)
                .as(outCol))
        }
        val rx = avgRanks(src.select(col("price").as("v")), "rkx")
        val ry = avgRanks(src.select(col("ni").cast("double").as("v")),
          "rky")
        val ranked = src
          .join(rx, src("price") === rx("v")).drop("v")
          .join(ry, src("ni").cast("double") === ry("v")).drop("v")
        val both = src
          .select(lit("pearson").as("metric"),
            col("price").as("x"), col("ni").cast("double").as("y"))
          .unionByName(ranked.select(lit("spearman").as("metric"),
            col("rkx").as("x"), col("rky").as("y")))
        Trend.groupedPearson(both, Seq("metric"), "x", "y")
          .select(col("metric"), col("n"), col("r"))
          .orderBy(col("metric"))
      },
      oracle = Some(s"""
        WITH src AS (
          SELECT ${sqlMsum("l_extendedprice")} AS price,
            count(*) AS ni
          FROM lineitem GROUP BY l_orderkey),
        dx AS (SELECT price AS v, count(*) AS nv FROM src GROUP BY 1),
        cx AS (
          SELECT v, nv,
            sum(CAST(nv AS DECIMAL(18,2))) OVER (
              ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
          FROM dx),
        rx AS (
          SELECT v, CAST(2 * cum - nv + 1 AS DOUBLE) / 2.0 AS rkx
          FROM cx),
        dy AS (
          SELECT CAST(ni AS DOUBLE) AS v, count(*) AS nv
          FROM src GROUP BY 1),
        cy AS (
          SELECT v, nv,
            sum(CAST(nv AS DECIMAL(18,2))) OVER (
              ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
          FROM dy),
        ry AS (
          SELECT v, CAST(2 * cum - nv + 1 AS DOUBLE) / 2.0 AS rky
          FROM cy),
        rk_union AS (
          SELECT 'pearson' AS metric, price AS x, CAST(ni AS DOUBLE) AS y
          FROM src
          UNION ALL
          SELECT 'spearman', rx.rkx, ry.rky
          FROM src
          JOIN rx ON rx.v = src.price
          JOIN ry ON ry.v = CAST(src.ni AS DOUBLE)),
        ${Trend.sqlPearsonCtes("rk_union", "metric", "x", "y")}
        SELECT g AS metric, n, r FROM corr_g ORDER BY metric""")),

    "q199_hashing_trick_audit" -> Q(
      // Feature-hashing collision audit (Weinberger '09's hashing
      // trick): project the unigram+bigram vocabulary into 64/256/1024
      // buckets with the portable hash and measure what the collapse
      // costs — collided terms and the worst bucket load at each width.
      // The pre-flight check before fixing a feature dimension: the
      // sweep shows the width where collisions stop being structural.
      // One explode over the bounded vocabulary × 3 widths.
      build = (s, dir) => {
        val toks = table(s, dir, "documents")
          .select(split(trim(col("text")), "\\s+").as("a"))
        val uni = toks.select(explode(col("a")).as("term"))
        val bi = toks.filter(size(col("a")) >= 2)
          .select(explode(expr(
            "transform(sequence(0, size(a) - 2), i -> concat(a[i], ' ', a[i+1]))"))
            .as("term"))
        uni.unionByName(bi).distinct()
          .withColumn("k", explode(array(lit(64L), lit(256L), lit(1024L))))
          .withColumn("b", pmod(TextHash.md5Bits60(col("term")), col("k")))
          .groupBy(col("k"), col("b")).agg(count(lit(1)).as("load"))
          .groupBy(col("k")).agg(
            sum(col("load")).as("n_terms"),
            count(lit(1)).as("n_used_buckets"),
            max(col("load")).as("max_bucket_load"))
          .withColumn("n_collided_terms",
            col("n_terms") - col("n_used_buckets"))
          .orderBy(col("k"))
      },
      oracle = Some(s"""
        WITH toks AS (
          SELECT regexp_split_to_array(trim(text), '\\s+') AS a
          FROM documents),
        vocab AS (
          SELECT DISTINCT term FROM (
            SELECT unnest(a) AS term FROM toks
            UNION ALL
            SELECT unnest(list_transform(generate_series(1, len(a) - 1),
              i -> a[i] || ' ' || a[i+1])) AS term
            FROM toks WHERE len(a) >= 2)),
        hashed AS (
          SELECT ks.k,
            ${TextHash.sqlMd5Bits60("term")} % ks.k AS b
          FROM vocab
          CROSS JOIN (SELECT unnest([64, 256, 1024]) AS k) ks),
        loads AS (
          SELECT k, b, count(*) AS load FROM hashed GROUP BY 1, 2)
        SELECT CAST(k AS BIGINT) AS k,
          CAST(sum(load) AS BIGINT) AS n_terms,
          count(*) AS n_used_buckets,
          max(load) AS max_bucket_load,
          CAST(sum(load) - count(*) AS BIGINT) AS n_collided_terms
        FROM loads GROUP BY 1 ORDER BY 1""")),

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
        LEFT JOIN cells c ON c.pri = g.pri AND c.status = g.status
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
        val counts = table(s, dir, "events")
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
          .select(col("lang"), split(trim(col("text")), "\\s+").as("tk"))
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
          SELECT lang, regexp_split_to_array(trim(text), '\s+') AS t
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
        val daily = table(s, dir, "orders")
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
          FROM orders GROUP BY 1, 2),
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
            CAST(sum(CAST(x AS DECIMAL(7,0)) * CAST(y AS DECIMAL(12,2)))
              AS DECIMAL(23,2)) AS sxy
          FROM banded
          WHERE x IS NOT NULL AND y IS NOT NULL
          GROUP BY 1, 2)
        SELECT prio, day, n,
          CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 THEN
            round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 8)
          END AS slope,
          round((CAST(sy AS DOUBLE)
                 - (CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                              <> 0.0 THEN
                      round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 8)
                    END) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
            AS intercept
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
            explode(split(trim(col("text")), "\\s+")).as("w"))
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
            unnest(regexp_split_to_array(trim(text), '\s+')) AS w
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
        val rows = decs.map { p =>
          val i = (p * 10).toInt
          struct(lit(p).as("p"), col(s"qa_$i").as("q_urgent"),
            col(s"qb_$i").as("q_rest"),
            round(col(s"qa_$i") - col(s"qb_$i"), 6).as("qte"))
        }
        m.select(explode(array(rows: _*)).as("r"))
          .select(col("r.p").as("p"), col("r.q_urgent").as("q_urgent"),
            col("r.q_rest").as("q_rest"), col("r.qte").as("qte"))
          .orderBy(col("p"))
      },
      oracle = Some {
        val branches = (1 to 9).map { i =>
          val p = i / 10.0
          s"""SELECT CAST($p AS DOUBLE) AS p,
            quantile_cont(CASE WHEN o_orderpriority = '1-URGENT'
              THEN o_totalprice END, $p) AS q_urgent,
            quantile_cont(CASE WHEN NOT (o_orderpriority = '1-URGENT')
              THEN o_totalprice END, $p) AS q_rest,
            round(quantile_cont(CASE WHEN o_orderpriority = '1-URGENT'
                THEN o_totalprice END, $p)
              - quantile_cont(CASE WHEN NOT (o_orderpriority = '1-URGENT')
                THEN o_totalprice END, $p), 6) AS qte
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
          SELECT prio,
            string_agg(st, ',' ORDER BY st) AS statuses_sorted,
            string_agg(st || ':' || CAST(c AS VARCHAR), ','
              ORDER BY st || ':' || CAST(c AS VARCHAR)) AS status_counts
          FROM sc GROUP BY 1),
        topk AS (
          -- ORDER BY the BIGINT key, not its string form: lexicographic
          -- string order diverges from numeric once digit counts differ
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
        m.select(col("event_type"), col("n_days"),
            round(mean, 6).as("mean_daily"),
            round(disp, 6).as("dispersion_index"),
            round((disp - lit(1.0)) * sqrt((nD - lit(1.0)) / lit(2.0)), 6)
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
          round(((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
              * CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE))
            / (CAST(n_days AS DOUBLE) - 1.0))
            / (CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE)), 6)
            AS dispersion_index,
          round((((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
              * CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE))
            / (CAST(n_days AS DOUBLE) - 1.0))
            / (CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE)) - 1.0)
            * sqrt((CAST(n_days AS DOUBLE) - 1.0) / 2.0), 6)
            AS z_overdispersion
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
      // curve is oracle-exact. (Five fits = five scan-sets; the sweep
      // is a DIAGNOSTIC run, not a per-query cost.)
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .withColumn("price_k", col("l_extendedprice") / lit(1000.0))
        (2 to 6).map { k =>
          KMeans.fit2d(li, "l_quantity", "price_k", k = k, iters = 3)
            .agg(lit(k).as("k"),
              sum(col("n_points")).as("n_points"),
              round(sum(col("wcss").cast("decimal(24,4)")), 4)
                .cast("double").as("total_wcss"))
        }.reduce(_ unionByName _).orderBy(col("k"))
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
        val sd = sqrt((col("srr").cast("double")
          - col("sr").cast("double") * col("sr").cast("double") / nD)
          ./(nD - lit(1.0)))
        val dev = daily.join(m, "prio")
          .withColumn("absdev", round(abs(col("rev") - mean), 6))
        val w = Window.partitionBy(col("prio"))
          .orderBy(col("absdev").desc, col("day").asc)
        dev.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("prio"), col("n_days"),
            round(mean, 4).as("mean_rev"),
            round(sd, 4).as("sd_rev"),
            col("day").as("worst_day"),
            round(col("absdev") / sd, 6).as("g_stat"))
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
            CAST(sum(CAST(rev AS DECIMAL(18,2)) * CAST(rev AS DECIMAL(18,2)))
              AS DECIMAL(34,4)) AS srr
          FROM daily GROUP BY 1),
        dev AS (
          SELECT d.prio, d.day, m.n_days,
            CAST(sr AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean,
            sqrt((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)
              * CAST(sr AS DOUBLE) / CAST(n_days AS DOUBLE))
              / (CAST(n_days AS DOUBLE) - 1.0)) AS sd,
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
          round(absdev / sd, 6) AS g_stat
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
        val o = table(s, dir, "orders")
        val strata = o.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("nh"),
            sum(dec(col("o_totalprice"))).cast("decimal(24,2)").as("sh"),
            sum(dec(col("o_totalprice")) * dec(col("o_totalprice")))
              .cast("decimal(34,4)").as("shh"))
        def varOf(n: Column, sx: Column, sxx: Column) =
          (sxx.cast("double") - sx.cast("double") * sx.cast("double")
            / n.cast("double")) / (n.cast("double") - lit(1.0))
        val withVar = strata.withColumn("s2h",
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
          FROM orders GROUP BY 1),
        wv AS (
          SELECT *,
            (CAST(shh AS DOUBLE) - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)
              / CAST(nh AS DOUBLE)) / (CAST(nh AS DOUBLE) - 1.0) AS s2h
          FROM strata),
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
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
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
        val out = "/root/repo/target/graft/part_orders_" +
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
        val out = "/root/repo/target/graft/evo_orders_" +
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
            CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))
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
        val o = table(s, dir, "orders")
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
        WITH mm AS (
          SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
          FROM orders),
        b AS (
          SELECT
            least(CAST(floor((o_totalprice - mn) / (mx - mn) * 10)
              AS BIGINT), 9) AS bin,
            (o_totalprice - mn) / (mx - mn) AS conf,
            CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
          FROM orders, mm),
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
        val o = table(s, dir, "orders")
          .select(col("o_orderpriority").as("pri"),
            col("o_orderkey").as("id"),
            col("o_totalprice").cast("double").as("x"))
        QuantileNorm.toPooled(o, "pri", "x", "id")
          .groupBy(col("pri"))
          .agg(count(lit(1)).as("n"), davg(col("x")).as("mean_pre"),
            davg(col("qn_value")).as("mean_post"))
          .orderBy("pri")
      },
      oracle = Some(s"""
        WITH o AS (
          SELECT o_orderpriority AS pri, o_orderkey AS id,
            CAST(o_totalprice AS DOUBLE) AS x
          FROM orders),
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
        SELECT pri, count(*) AS n, ${sqlDavg("x")} AS mean_pre,
          ${sqlDavg("qn")} AS mean_post
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
        val e = table(s, dir, "embeddings")
        val a = e.select(col("vec_id").as("id_a"),
          Vectors.asDouble(col("embedding")).as("va"))
        val b = e.select(col("vec_id").as("id_b"),
          Vectors.asDouble(col("embedding")).as("vb"))
        val pairs = a.join(b, col("id_a") + 1 === col("id_b"))
        pairs
          .withColumn("d", explode(array(lit(8), lit(16), lit(32),
            lit(64))))
          .withColumn("cd", Vectors.cosine(
            slice(col("va"), lit(1), col("d")),
            slice(col("vb"), lit(1), col("d"))))
          .withColumn("cf", Vectors.cosine(col("va"), col("vb")))
          .groupBy(col("d"))
          .agg(count(lit(1)).as("n_pairs"),
            davg(abs(col("cd") - col("cf"))).as("mean_abs_delta"),
            sum(((col("cd") > 0) === (col("cf") > 0)).cast("long"))
              .as("sign_agree"))
          .orderBy("d")
      },
      oracle = Some(s"""
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings),
        p AS (
          SELECT a.emb AS va, b.emb AS vb
          FROM v a JOIN v b ON a.vec_id + 1 = b.vec_id),
        dd AS (SELECT unnest([8, 16, 32, 64]) AS d),
        x AS (
          SELECT d, va, vb, va[1:d] AS ca, vb[1:d] AS cb
          FROM p CROSS JOIN dd),
        c AS (
          SELECT d,
            list_dot_product(ca, cb) / (sqrt(list_dot_product(ca, ca))
              * sqrt(list_dot_product(cb, cb))) AS cd,
            list_dot_product(va, vb) / (sqrt(list_dot_product(va, va))
              * sqrt(list_dot_product(vb, vb))) AS cf
          FROM x)
        SELECT d, count(*) AS n_pairs,
          ${sqlDavg("abs(cd - cf)")} AS mean_abs_delta,
          CAST(sum(CASE WHEN (cd > 0) = (cf > 0) THEN 1 ELSE 0 END)
            AS BIGINT) AS sign_agree
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
          CAST(round(sum(CAST(CAST(l_quantity AS DECIMAL(12,2))
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
          SELECT user_id, ts, event_id, event_type,
            lag(event_type) OVER (
              PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events),
        f AS (SELECT * FROM chg WHERE prev IS DISTINCT FROM event_type),
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
        val cells = table(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select((col("user_id") % 2 === 0).cast("long").as("treated"),
            (col("ts") >= cut).cast("long").as("post"),
            col("value").cast("decimal(18,6)").as("v"))
          .groupBy(col("treated"), col("post"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
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
        WITH cells AS (
          SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
            CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
              THEN 1 ELSE 0 END AS post,
            count(*) AS n,
            CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
            CAST(CAST(sum(CAST(value AS DECIMAL(18,6))
              * CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,12))
              AS DOUBLE) AS svv
          FROM events WHERE event_type = 'purchase'
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
          val ts = round(t(l), 6).cast("decimal(12,6)")
          Seq(
            sum(ts).cast("decimal(24,6)").as(s"st_${nm(l)}"),
            sum(ts * ts).cast("decimal(38,12)").as(s"st2_${nm(l)}"))
        } ++ Seq(
          sum(round(log(y), 8).cast("decimal(20,8)")).cast("decimal(24,8)")
            .as("slog"),
          count(lit(1)).as("n"))
        val mom = table(s, dir, "orders").agg(aggs.head, aggs.tail: _*)
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
              / -1.0, 6) AS DECIMAL(12,6))) AS DECIMAL(24,6)) AS st_m10,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), -1.0) - 1.0)
              / -1.0, 6) AS DECIMAL(20,6)) * CAST(round((pow(CAST(o_totalprice
              AS DOUBLE), -1.0) - 1.0) / -1.0, 6) AS DECIMAL(12,6)))
              AS DECIMAL(38,12)) AS st2_m10,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), -0.5) - 1.0)
              / -0.5, 6) AS DECIMAL(12,6))) AS DECIMAL(24,6)) AS st_m05,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), -0.5) - 1.0)
              / -0.5, 6) AS DECIMAL(20,6)) * CAST(round((pow(CAST(o_totalprice
              AS DOUBLE), -0.5) - 1.0) / -0.5, 6) AS DECIMAL(12,6)))
              AS DECIMAL(38,12)) AS st2_m05,
            CAST(sum(CAST(round(ln(CAST(o_totalprice AS DOUBLE)), 6)
              AS DECIMAL(12,6))) AS DECIMAL(24,6)) AS st_p00,
            CAST(sum(CAST(round(ln(CAST(o_totalprice AS DOUBLE)), 6)
              AS DECIMAL(20,6)) * CAST(round(ln(CAST(o_totalprice AS DOUBLE)),
              6) AS DECIMAL(12,6))) AS DECIMAL(38,12)) AS st2_p00,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), 0.5) - 1.0)
              / 0.5, 6) AS DECIMAL(12,6))) AS DECIMAL(24,6)) AS st_p05,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), 0.5) - 1.0)
              / 0.5, 6) AS DECIMAL(20,6)) * CAST(round((pow(CAST(o_totalprice
              AS DOUBLE), 0.5) - 1.0) / 0.5, 6) AS DECIMAL(12,6)))
              AS DECIMAL(38,12)) AS st2_p05,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), 1.0) - 1.0)
              / 1.0, 6) AS DECIMAL(12,6))) AS DECIMAL(24,6)) AS st_p10,
            CAST(sum(CAST(round((pow(CAST(o_totalprice AS DOUBLE), 1.0) - 1.0)
              / 1.0, 6) AS DECIMAL(20,6)) * CAST(round((pow(CAST(o_totalprice
              AS DOUBLE), 1.0) - 1.0) / 1.0, 6) AS DECIMAL(12,6)))
              AS DECIMAL(38,12)) AS st2_p10
          FROM orders),
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
            size(array_distinct(split(trim(col("text")), "\\s+")))
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
            len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
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
          .filter(col("event_type") === "click")
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
          FROM events WHERE event_type = 'click'
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
          .filter(col("event_type") === "view")
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
            CAST(sum(CAST(value AS DECIMAL(18,6))
              * CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS svv
          FROM events WHERE event_type = 'view'
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
          .select(explode(split(trim(col("text")), "\\s+")).as("w"))
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
          FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
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
      // live in a keyed window over the bounded month frame; rank sums
      // and the chi-square statistic are exact integer arithmetic
      // (decimal revenue makes ties cross-engine-identical, and the
      // dense month x priority frame makes ties practically impossible
      // anyway).
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
            Window.partitionBy(col("m")).orderBy(col("rev"))))
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
            rank() OVER (PARTITION BY c.m ORDER BY c.rev) AS rk
          FROM cell c JOIN full_m USING (m)),
        sums AS (
          SELECT o_orderpriority, CAST(sum(rk) AS BIGINT) AS r_sum,
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
        val peru = table(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_u"),
            sum(col("value").cast("decimal(18,6)")).as("s_u"))
        def diffOf(df: DataFrame, sideCol: Column): Column = {
          // declared on a frame grouped so that each group sees one side
          round(
            (sum(when(sideCol === 0, col("s_u"))).cast("double")
              / sum(when(sideCol === 0, col("n_u"))))
            - (sum(when(sideCol === 1, col("s_u"))).cast("double")
              / sum(when(sideCol === 1, col("n_u")))), 8)
        }
        val obs = peru.agg(
          diffOf(peru, (col("user_id") % 2).cast("int")).as("d_obs"))
        val perms = peru
          .select(col("user_id"), col("n_u"), col("s_u"),
            explode(sequence(lit(0), lit(63))).as("b"))
          .withColumn("side", when(substring(md5(concat(
              col("user_id").cast("string"), lit(":"),
              col("b").cast("string"))), 1, 1)
              .isin("0", "2", "4", "6", "8", "a", "c", "e"), 0)
            .otherwise(1))
          .groupBy(col("b"))
          .agg(diffOf(peru, col("side")).as("diff"))
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
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
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
      // RUN count in insertion (orderkey) order. Runs come from the
      // dense-key k+1 self-equi-join (q304's trick) — a hash join, not
      // a global sort+lag — and all four columns' run starts reduce in
      // ONE aggregate over that single join. The advice rule is integer
      // arithmetic (dict when NDV <= 1% of rows, RLE when the mean run
      // >= 3), so the verdict can't flip on engine float quirks.
      build = (s, dir) => {
        import s.implicits._
        val o = table(s, dir, "orders")
        val prev = o.select((col("o_orderkey") + 1).as("o_orderkey"),
          col("o_orderstatus").as("p_status"),
          col("o_orderpriority").as("p_prio"),
          col("o_custkey").as("p_cust"),
          to_date(col("o_orderdate")).as("p_date"))
        def runStart(c: Column, p: Column): Column =
          sum(when(p.isNull || c =!= p, 1).otherwise(0))
        val agg = o.join(prev, Seq("o_orderkey"), "left")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("o_orderstatus")).as("ndv_status"),
            countDistinct(col("o_orderpriority")).as("ndv_prio"),
            countDistinct(col("o_custkey")).as("ndv_cust"),
            countDistinct(to_date(col("o_orderdate"))).as("ndv_date"),
            runStart(col("o_orderstatus"), col("p_status"))
              .as("runs_status"),
            runStart(col("o_orderpriority"), col("p_prio"))
              .as("runs_prio"),
            runStart(col("o_custkey"), col("p_cust")).as("runs_cust"),
            runStart(to_date(col("o_orderdate")), col("p_date"))
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
        WITH lagged AS (
          SELECT o_orderstatus, o_orderpriority, o_custkey,
            CAST(o_orderdate AS DATE) AS o_odate,
            lag(o_orderstatus) OVER w AS p_status,
            lag(o_orderpriority) OVER w AS p_prio,
            lag(o_custkey) OVER w AS p_cust,
            lag(CAST(o_orderdate AS DATE)) OVER w AS p_date
          FROM orders WINDOW w AS (ORDER BY o_orderkey)),
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
            explode(split(trim(col("text")), "\\s+")).as("w"))
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
            unnest(regexp_split_to_array(trim(text), '\s+')) AS w
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
        val c = table(s, dir, "customer")
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
        WITH gm AS (
          SELECT quantile_cont(c_acctbal, 0.5) AS gmed FROM customer),
        per AS (
          SELECT c_mktsegment, count(*) AS n_g,
            CAST(sum(CASE WHEN c_acctbal > gmed THEN 1 ELSE 0 END)
              AS BIGINT) AS above
          FROM customer CROSS JOIN gm
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

    "q324_theil_decomposition" -> Q(
      // Theil-T inequality decomposition (Theil 1967) of customer spend
      // by nation: total inequality = between-nation + within-nation —
      // the additive decomposition q141's Gini famously LACKS, and the
      // standard audit of "is the disparity across groups or inside
      // them". Spend-weighted logs reduce in ONE pass (per-row ln
      // snapped to 8 decimals into exact decimal sums — the q280 log
      // discipline), so T_g = L_g/Y_g − ln(mu_g) is closed-form per
      // nation and the identity T = between + Σ share·T_g holds to the
      // snap. Zero-spend customers are excluded (ln 0), stated here.
      build = (s, dir) => {
        val spend = table(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(dec(col("o_totalprice"))).cast("decimal(14,2)")
            .as("y"))
          .filter(col("y") > 0)
        val per = spend
          .join(table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_g"),
            sum(col("y")).cast("decimal(24,2)").as("yg"),
            sum((col("y").cast("double")
              * round(log(col("y").cast("double")), 8))
              .cast("decimal(28,8)")).as("lg"))
        val tot = per.agg(sum(col("n_g")).as("nn"),
          sum(col("yg")).cast("decimal(30,2)").as("yy"),
          sum(col("lg")).cast("decimal(34,8)").as("ll"))
        val parts = per.crossJoin(broadcast(tot))
          .withColumn("share", round(col("yg").cast("double")
            / col("yy").cast("double"), 8))
          .withColumn("t_g", round(col("lg").cast("double")
              / col("yg").cast("double")
            - log(col("yg").cast("double") / col("n_g")), 6))
          .withColumn("btw_term", round(col("yg").cast("double")
              / col("yy").cast("double")
            * log((col("yg").cast("double") / col("n_g"))
              / (col("yy").cast("double") / col("nn"))), 8))
        val decomp = parts.agg(
          round(max(col("ll").cast("double") / col("yy").cast("double")
            - log(col("yy").cast("double") / col("nn"))), 6)
            .as("t_total"),
          round(sum(col("btw_term").cast("decimal(16,8)"))
            .cast("double"), 6).as("t_between"))
        parts.crossJoin(broadcast(decomp))
          .select(col("n_name"), col("n_g"), col("share"), col("t_g"),
            col("t_total"), col("t_between"),
            round(col("t_total") - col("t_between"), 6).as("t_within"))
          .orderBy(col("n_name"))
      },
      oracle = Some("""
        WITH spend AS (
          SELECT o_custkey,
            CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DECIMAL(14,2)) AS y
          FROM orders GROUP BY 1
          HAVING sum(CAST(o_totalprice AS DECIMAL(12,2))) > 0),
        per AS (
          SELECT n_name, count(*) AS n_g,
            CAST(sum(y) AS DECIMAL(24,2)) AS yg,
            CAST(sum(CAST(CAST(y AS DOUBLE)
              * round(ln(CAST(y AS DOUBLE)), 8) AS DECIMAL(28,8)))
              AS DECIMAL(34,8)) AS lg
          FROM spend
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n_g) AS BIGINT) AS nn,
            CAST(sum(yg) AS DECIMAL(30,2)) AS yy,
            CAST(sum(lg) AS DECIMAL(34,8)) AS ll
          FROM per),
        parts AS (
          SELECT n_name, n_g, nn, yy, ll,
            round(CAST(yg AS DOUBLE) / CAST(yy AS DOUBLE), 8) AS share,
            round(CAST(lg AS DOUBLE) / CAST(yg AS DOUBLE)
              - ln(CAST(yg AS DOUBLE) / n_g), 6) AS t_g,
            round(CAST(yg AS DOUBLE) / CAST(yy AS DOUBLE)
              * ln((CAST(yg AS DOUBLE) / n_g)
                / (CAST(yy AS DOUBLE) / nn)), 8) AS btw_term
          FROM per CROSS JOIN tot),
        decomp AS (
          SELECT
            round(max(CAST(ll AS DOUBLE) / CAST(yy AS DOUBLE)
              - ln(CAST(yy AS DOUBLE) / nn)), 6) AS t_total,
            round(CAST(sum(CAST(btw_term AS DECIMAL(16,8)))
              AS DOUBLE), 6) AS t_between
          FROM parts)
        SELECT n_name, n_g, share, t_g, t_total, t_between,
          round(t_total - t_between, 6) AS t_within
        FROM parts CROSS JOIN decomp
        ORDER BY n_name""")),

    "q325_graph_modularity" -> Q(
      // Newman modularity of the NATION partition on the co-supply
      // graph (suppliers joined by supplying the same part) — the
      // community-QUALITY score that completes the graph battery
      // (q52/q132 find components, q115/q233 count closures; this
      // scores a given partition): Q = sum_c [e_c/m - (d_c/2m)^2].
      // Edges come from the part-BLOCKED self-join (distinct suppliers
      // per part is bounded — q229's discipline, never all-pairs),
      // deduped across parts; e_c and d_c are exact integer counts, so
      // Q is one rational formula rounded at 6. Nation tags ride a
      // broadcast dimension.
      build = (s, dir) => {
        val ps = table(s, dir, "lineitem")
          .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
          .distinct()
        val e = ps.join(ps.select(col("pk"),
            col("sk").as("sk2")), Seq("pk"))
          .filter(col("sk") < col("sk2"))
          .select(col("sk").as("a"), col("sk2").as("b"))
          .distinct()
        val snat = table(s, dir, "supplier")
          .join(broadcast(table(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name"))
        val tagged = e
          .join(snat.select(col("s_suppkey").as("a"),
            col("n_name").as("na")), Seq("a"))
          .join(snat.select(col("s_suppkey").as("b"),
            col("n_name").as("nb")), Seq("b"))
        val m = tagged.agg(count(lit(1)).as("m"))
        val deg = tagged.select(col("na").as("n_name"))
          .unionAll(tagged.select(col("nb").as("n_name")))
          .groupBy(col("n_name")).agg(count(lit(1)).as("d_c"))
        val ein = tagged.filter(col("na") === col("nb"))
          .groupBy(col("na").as("n_name"))
          .agg(count(lit(1)).as("e_in"))
        val per = deg.join(ein, Seq("n_name"), "left")
          .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
          .crossJoin(broadcast(m))
          .withColumn("q_term", round(col("e_in").cast("double")
              / col("m")
            - (col("d_c").cast("double") / (col("m") * 2))
              * (col("d_c").cast("double") / (col("m") * 2)), 8))
        val q = per.agg(
          round(sum(col("q_term").cast("decimal(16,8)")).cast("double"),
            6).as("modularity"))
        per.crossJoin(broadcast(q))
          .select(col("n_name"), col("d_c"), col("e_in"), col("m"),
            col("q_term"), col("modularity"))
          .orderBy(col("n_name"))
      },
      oracle = Some("""
        WITH ps AS (
          SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
          FROM lineitem),
        e AS (
          SELECT DISTINCT p1.sk AS a, p2.sk AS b
          FROM ps p1 JOIN ps p2 ON p1.pk = p2.pk AND p1.sk < p2.sk),
        snat AS (
          SELECT s_suppkey, n_name
          FROM supplier JOIN nation ON s_nationkey = n_nationkey),
        tagged AS (
          SELECT sa.n_name AS na, sb.n_name AS nb
          FROM e
          JOIN snat sa ON e.a = sa.s_suppkey
          JOIN snat sb ON e.b = sb.s_suppkey),
        m AS (SELECT count(*) AS m FROM tagged),
        deg AS (
          SELECT n_name, count(*) AS d_c FROM (
            SELECT na AS n_name FROM tagged
            UNION ALL SELECT nb FROM tagged)
          GROUP BY 1),
        ein AS (
          SELECT na AS n_name, count(*) AS e_in
          FROM tagged WHERE na = nb GROUP BY 1),
        per AS (
          SELECT d.n_name, d.d_c,
            CAST(coalesce(ei.e_in, 0) AS BIGINT) AS e_in, m.m,
            round(CAST(coalesce(ei.e_in, 0) AS DOUBLE) / m.m
              - (CAST(d.d_c AS DOUBLE) / (m.m * 2))
                * (CAST(d.d_c AS DOUBLE) / (m.m * 2)), 8) AS q_term
          FROM deg d LEFT JOIN ein ei USING (n_name) CROSS JOIN m),
        q AS (
          SELECT round(CAST(sum(CAST(q_term AS DECIMAL(16,8)))
            AS DOUBLE), 6) AS modularity
          FROM per)
        SELECT n_name, d_c, e_in, m, q_term, modularity
        FROM per CROSS JOIN q
        ORDER BY n_name""")),

    "q326_hurst_rs" -> Q(
      // Hurst exponent by rescaled-range (R/S) analysis (Hurst 1951;
      // Mandelbrot's long-memory diagnostic) over the event-value
      // series in event_id order: R/S per block at three block sizes,
      // H = log-log slope. The cumulative deviation never touches a
      // global window — blocks are keyed (size, chunk) partitions, and
      // the running deviation is kept EXACT by scaling: n·P_i − i·S_g
      // (prefix sum times block size minus index times block sum) is
      // pure decimal/integer arithmetic, so R needs no float cumsum at
      // all. Incomplete tail blocks are dropped. Block R/S snaps at 6,
      // block means and the final 3-point fit follow the q280 snapped-
      // log discipline.
      build = (s, dir) => {
        import s.implicits._
        val ev = table(s, dir, "events")
          .select(col("event_id"),
            col("value").cast("decimal(14,6)").as("v"))
        val sizes = Seq(64, 128, 256).toDF("bsize")
        val blocked = ev.crossJoin(broadcast(sizes))
          .withColumn("chunk", floor(col("event_id") / col("bsize")))
        val wPart = Window.partitionBy(col("bsize"), col("chunk"))
        val wRows = wPart.orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = blocked
          .withColumn("i", count(lit(1)).over(wRows).cast("decimal(4,0)"))
          .withColumn("p", sum(col("v")).over(wRows).cast("decimal(24,6)"))
          .withColumn("sg", sum(col("v")).over(wPart).cast("decimal(24,6)"))
          .withColumn("cnt", count(lit(1)).over(wPart))
          .filter(col("cnt") === col("bsize"))
          .withColumn("dev", col("p") * col("bsize") - col("sg") * col("i"))
        val per = cum.groupBy(col("bsize"), col("chunk"))
          .agg(max(col("dev")).as("mx"), min(col("dev")).as("mn"),
            max(col("sg")).as("sg"),
            sum((col("v") * col("v")).cast("decimal(38,12)")).as("szz"))
          .withColumn("r",
            (col("mx") - col("mn")).cast("double") / col("bsize"))
          .withColumn("sdev", sqrt(col("szz").cast("double")
              / col("bsize")
            - (col("sg").cast("double") / col("bsize"))
              * (col("sg").cast("double") / col("bsize"))))
          .withColumn("rs", round(col("r") / col("sdev"), 6))
        val bySize = per.groupBy(col("bsize"))
          .agg(count(lit(1)).as("n_blocks"),
            round(sum(col("rs").cast("decimal(16,6)")).cast("double")
              / count(lit(1)), 8).as("rs_mean"))
          .withColumn("lx", round(log(col("bsize").cast("double")), 8))
          .withColumn("ly", round(log(col("rs_mean")), 8))
        val fit = bySize.agg(count(lit(1)).as("np"),
            sum(col("lx").cast("decimal(16,8)")).as("sx"),
            sum(col("ly").cast("decimal(16,8)")).as("sy"),
            sum((col("lx").cast("decimal(16,8)")
              * col("ly").cast("decimal(16,8)")).cast("decimal(33,16)"))
              .as("sxy"),
            sum((col("lx").cast("decimal(16,8)")
              * col("lx").cast("decimal(16,8)")).cast("decimal(33,16)"))
              .as("sxx"))
          .select(round((col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double")
                / col("np"))
            / (col("sxx").cast("double") - col("sx").cast("double")
              * col("sx").cast("double") / col("np")), 6).as("hurst"))
        bySize.crossJoin(broadcast(fit))
          .select(col("bsize"), col("n_blocks"), col("rs_mean"),
            col("hurst"))
          .orderBy(col("bsize"))
      },
      oracle = Some("""
        WITH sizes AS (SELECT unnest([64, 128, 256]) AS bsize),
        blocked AS (
          SELECT bsize, event_id,
            CAST(value AS DECIMAL(14,6)) AS v,
            CAST(floor(event_id / bsize) AS BIGINT) AS chunk
          FROM events CROSS JOIN sizes),
        cum AS (
          SELECT bsize, chunk, v,
            CAST(count(*) OVER wr AS DECIMAL(4,0)) AS i,
            CAST(sum(v) OVER wr AS DECIMAL(24,6)) AS p,
            CAST(sum(v) OVER wp AS DECIMAL(24,6)) AS sg,
            count(*) OVER wp AS cnt
          FROM blocked
          WINDOW wr AS (PARTITION BY bsize, chunk ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wp AS (PARTITION BY bsize, chunk)),
        devs AS (
          SELECT bsize, chunk, v, sg,
            p * bsize - sg * i AS dev
          FROM cum WHERE cnt = bsize),
        per AS (
          SELECT bsize, chunk, max(dev) AS mx, min(dev) AS mn,
            max(sg) AS sg,
            sum(CAST(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6))
              AS DECIMAL(38,12))) AS szz
          FROM devs GROUP BY 1, 2),
        scored AS (
          SELECT bsize, chunk,
            round((CAST(mx - mn AS DOUBLE) / bsize)
              / sqrt(CAST(szz AS DOUBLE) / bsize
                - (CAST(sg AS DOUBLE) / bsize)
                  * (CAST(sg AS DOUBLE) / bsize)), 6) AS rs
          FROM per),
        by_size AS (
          SELECT bsize, count(*) AS n_blocks,
            round(CAST(sum(CAST(rs AS DECIMAL(16,6))) AS DOUBLE)
              / count(*), 8) AS rs_mean
          FROM scored GROUP BY 1),
        pts AS (
          SELECT bsize, n_blocks, rs_mean,
            round(ln(CAST(bsize AS DOUBLE)), 8) AS lx,
            round(ln(rs_mean), 8) AS ly
          FROM by_size),
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
                / count(*)), 6) AS hurst
          FROM pts)
        SELECT CAST(bsize AS INTEGER) AS bsize, n_blocks, rs_mean,
          hurst
        FROM pts CROSS JOIN fit
        ORDER BY bsize""")),

    "q327_stream_cusum" -> Q(
      // Streaming twin of q299: the stream maintains per-day click-value
      // moments (one (n, sum) state row per open day, emitted exactly
      // once on watermark close); the Page CUSUM scan then runs in batch
      // over the bounded emitted day frame — the production drift-
      // monitor shape ("store moments, decide later"). The final open
      // day is pending (q76's convention), so the oracle restricts
      // q299's SQL to days closed by the terminal watermark; on those
      // days stream ≡ batch hash-exactly. The CUSUM window is the q299
      // calendar-day frame (allowlisted).
      build = (s, dir) =>
        graft.streaming.BoundedRuns.streamedDailyCusum(s, dir),
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day, count(*) AS n,
            sum(CAST(value AS DECIMAL(18,6))) AS sv
          FROM events WHERE event_type = 'click'
            AND CAST(ts AS DATE) + INTERVAL '1 day'
              <= (SELECT max(ts) - INTERVAL '2 hours' FROM events)
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

    "q328_stream_msprt" -> Q(
      // Streaming twin of q300: per-(day, arm) view-value moments live
      // as streaming state (exactly-once emission per closed day), and
      // the always-valid mixture-SPRT decision — cumulative moments,
      // pooled variance, lnLambda, the ln(1/alpha) stop — is computed in
      // batch over the bounded emitted frame, q300's math verbatim. The
      // oracle is q300's SQL restricted to watermark-closed days; on
      // those days stream ≡ batch hash-exactly. The "peeking" monitor
      // literally peeks at streamed state, which is the shape this test
      // exists for.
      build = (s, dir) =>
        graft.streaming.BoundedRuns.streamedMsprt(s, dir),
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day, user_id % 2 AS arm,
            count(*) AS n,
            sum(CAST(value AS DECIMAL(18,6))) AS sv,
            CAST(sum(CAST(value AS DECIMAL(18,6))
              * CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS svv
          FROM events WHERE event_type = 'view'
            AND CAST(ts AS DATE) + INTERVAL '1 day'
              <= (SELECT max(ts) - INTERVAL '2 hours' FROM events)
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
            + diff * diff * 1.0 / (2.0 * vv * (vv + 1.0)), 6)
            AS ln_lambda,
          CAST(CASE WHEN round(0.5 * ln(vv / (vv + 1.0))
            + diff * diff * 1.0 / (2.0 * vv * (vv + 1.0)), 6)
            >= ln(20.0) THEN 1 ELSE 0 END AS BIGINT) AS significant
        FROM st ORDER BY day""")),

    "q329_hill_tail_index" -> Q(
      // Hill estimator of the power-law tail index (Hill 1975) for
      // customer lifetime spend — the EVT statistic behind "how heavy is
      // the whale tail", feeding q140's ABC and q141's Gini with an
      // extrapolatable exponent. The order statistics come from the
      // NATIVE graft_topk heap aggregate (k=100): a map-side-capped hash
      // aggregate, not a global sort — the q253 scale story doing real
      // statistical work. Ties at the boundary break toward the smaller
      // custkey in the aggregate AND in the oracle's window, so the
      // selected set is identical; lns snap at 8 into exact sums.
      build = (s, dir) => {
        val spend = table(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(dec(col("o_totalprice"))).as("spent"))
          .filter(col("spent") > 0)
        val top = spend.agg(expr(
            "graft_topk(CAST(spent AS DOUBLE), CAST(o_custkey AS BIGINT), 100)")
            .as("tk"))
          .select(posexplode(col("tk")))
          .select((col("pos") + 1).cast("long").as("rnk"),
            col("col.ord").as("x"))
        val xk = top.filter(col("rnk") === 100)
          .select(col("x").as("x_k"))
        top.filter(col("rnk") < 100).crossJoin(broadcast(xk))
          .agg(count(lit(1)).as("k_minus_1"),
            max(col("x_k")).as("x_k"),
            sum(round(log(col("x") / col("x_k")), 8)
              .cast("decimal(16,8)")).as("slog"))
          .select((col("k_minus_1") + 1).as("k"), col("x_k"),
            round(col("slog").cast("double") / col("k_minus_1"), 8)
              .as("mean_excess_log"),
            round(col("k_minus_1") / col("slog").cast("double"), 6)
              .as("hill_alpha"))
      },
      oracle = Some("""
        WITH spend AS (
          SELECT o_custkey,
            CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2)
              AS DOUBLE) AS spent
          FROM orders GROUP BY 1
          HAVING sum(CAST(o_totalprice AS DECIMAL(12,2))) > 0),
        ranked AS (
          SELECT spent AS x,
            row_number() OVER (ORDER BY spent DESC, o_custkey ASC)
              AS rnk
          FROM spend),
        xk AS (SELECT x AS x_k FROM ranked WHERE rnk = 100),
        agg AS (
          SELECT count(*) AS k_minus_1, max(x_k) AS x_k,
            sum(CAST(round(ln(x / x_k), 8) AS DECIMAL(16,8))) AS slog
          FROM ranked CROSS JOIN xk WHERE rnk < 100)
        SELECT CAST(k_minus_1 + 1 AS BIGINT) AS k, x_k,
          round(CAST(slog AS DOUBLE) / k_minus_1, 8) AS mean_excess_log,
          round(k_minus_1 / CAST(slog AS DOUBLE), 6) AS hill_alpha
        FROM agg""")),

    "q330_gumbel_return_level" -> Q(
      // Gumbel extreme-value fit by block maxima (Fisher-Tippett;
      // method-of-moments) on monthly maxima of daily revenue, with the
      // 12-period return level — the capacity-planning statistic ("the
      // monthly peak you expect once a year") that q329's tail index
      // complements from the other side. Daily and monthly reductions
      // are exact-decimal; the ~80-month maxima frame is bounded; mu,
      // beta and the return level are fixed double formulas from exact
      // moments (Euler-Mascheroni and pi as identical literals).
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(dec(col("o_totalprice"))).cast("decimal(14,2)")
            .as("rev"))
        val monthly = daily
          .groupBy(date_trunc("month", col("day")).as("m"))
          .agg(max(col("rev")).cast("decimal(19,2)").as("mx"))
        val mom = monthly.agg(count(lit(1)).as("nb"),
          sum(col("mx")).cast("decimal(24,2)").as("sm"),
          sum((col("mx") * col("mx")).cast("decimal(38,4)")).as("smm"),
          max(col("mx")).cast("double").as("max_of_max"))
        mom.select(col("nb"), col("max_of_max"),
            (col("sm").cast("double") / col("nb")).as("mean_mx"),
            sqrt((col("smm").cast("double") - col("sm").cast("double")
              * col("sm").cast("double") / col("nb"))
              / (col("nb") - 1)).as("sd_mx"))
          .select(col("nb"), col("max_of_max"),
            col("mean_mx"), col("sd_mx"),
            (col("sd_mx") * sqrt(lit(6.0)) / lit(math.Pi)).as("beta"))
          .select(col("nb"), col("max_of_max"),
            (col("mean_mx") - lit(0.5772156649) * col("beta"))
              .as("mu"), col("beta"))
          .select(col("nb"), col("max_of_max"),
            round(col("mu"), 4).as("mu"),
            round(col("beta"), 4).as("beta"),
            round(col("mu") - col("beta")
              * log(-log(lit(1.0) - lit(1.0) / 12)), 4)
              .as("return_level_12"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
            CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DECIMAL(14,2)) AS rev
          FROM orders GROUP BY 1),
        monthly AS (
          SELECT date_trunc('month', day) AS m,
            CAST(max(rev) AS DECIMAL(19,2)) AS mx
          FROM daily GROUP BY 1),
        mom AS (
          SELECT count(*) AS nb,
            CAST(sum(mx) AS DECIMAL(24,2)) AS sm,
            CAST(sum(CAST(mx * mx AS DECIMAL(38,4))) AS DECIMAL(38,4))
              AS smm,
            CAST(max(mx) AS DOUBLE) AS max_of_max
          FROM monthly),
        fit0 AS (
          SELECT nb, max_of_max,
            CAST(sm AS DOUBLE) / nb AS mean_mx,
            sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE)
              * CAST(sm AS DOUBLE) / nb) / (nb - 1)) AS sd_mx
          FROM mom),
        fit1 AS (
          SELECT nb, max_of_max, mean_mx,
            sd_mx * sqrt(6) / pi() AS beta
          FROM fit0),
        fit2 AS (
          SELECT nb, max_of_max,
            mean_mx - 0.5772156649 * beta AS mu, beta
          FROM fit1)
        SELECT nb, max_of_max, round(mu, 4) AS mu,
          round(beta, 4) AS beta,
          round(mu - beta * ln(-ln(1.0 - 1.0 / 12)), 4)
            AS return_level_12
        FROM fit2""")),

    "q331_tukey_hsd" -> Q(
      // Tukey HSD post-hoc battery: the studentized-range q statistic
      // for every pair of market segments — the multiple-comparison
      // follow-up q213's omnibus ANOVA demands before any "segment A
      // differs from B" claim. One scan builds the 5-group exact moment
      // frame; the 10 pairs are a broadcast self-join of that bounded
      // frame; pooled MSE and each q are fixed double formulas. The
      // unbalanced-n form (Tukey-Kramer) is used.
      build = (s, dir) => {
        val g = table(s, dir, "customer")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            sum(col("c_acctbal").cast("decimal(12,2)"))
              .cast("decimal(20,2)").as("sv"),
            sum((col("c_acctbal").cast("decimal(12,2)")
              * col("c_acctbal").cast("decimal(12,2)"))
              .cast("decimal(38,4)")).as("svv"))
        val mse = g.agg(sum(col("n")).as("nn"), count(lit(1)).as("k"),
            sum((col("svv").cast("double") - col("sv").cast("double")
              * col("sv").cast("double") / col("n"))
              .cast("decimal(24,4)")).as("ssw"))
          .select(col("nn"), col("k"),
            (col("ssw").cast("double") / (col("nn") - col("k")))
              .as("mse"))
        val a = g.select(col("c_mktsegment").as("seg_a"),
          col("n").as("na"), col("sv").as("sa"))
        val b = g.select(col("c_mktsegment").as("seg_b"),
          col("n").as("nb"), col("sv").as("sb"))
        a.join(broadcast(b), col("seg_a") < col("seg_b"))
          .crossJoin(broadcast(mse))
          .select(col("seg_a"), col("seg_b"),
            round(col("sa").cast("double") / col("na")
              - col("sb").cast("double") / col("nb"), 6)
              .as("mean_diff"),
            round(abs(col("sa").cast("double") / col("na")
              - col("sb").cast("double") / col("nb"))
              / sqrt(col("mse") / 2
                * (lit(1.0) / col("na") + lit(1.0) / col("nb"))), 6)
              .as("q_stat"))
          .orderBy(col("seg_a"), col("seg_b"))
      },
      oracle = Some("""
        WITH g AS (
          SELECT c_mktsegment, count(*) AS n,
            CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(20,2))
              AS sv,
            CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(19,2))
              * CAST(c_acctbal AS DECIMAL(19,2)) AS DECIMAL(38,4)))
              AS DECIMAL(38,4)) AS svv
          FROM customer GROUP BY 1),
        mse AS (
          SELECT CAST(sum(n) AS BIGINT) AS nn, count(*) AS k,
            CAST(sum(CAST(CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE)
              * CAST(sv AS DOUBLE) / n AS DECIMAL(24,4))) AS DOUBLE)
              / (sum(n) - count(*)) AS mse
          FROM g)
        SELECT a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b,
          round(CAST(a.sv AS DOUBLE) / a.n
            - CAST(b.sv AS DOUBLE) / b.n, 6) AS mean_diff,
          round(abs(CAST(a.sv AS DOUBLE) / a.n
            - CAST(b.sv AS DOUBLE) / b.n)
            / sqrt(mse / 2 * (1.0 / a.n + 1.0 / b.n)), 6) AS q_stat
        FROM g a JOIN g b ON a.c_mktsegment < b.c_mktsegment
        CROSS JOIN mse
        ORDER BY seg_a, seg_b""")),

    "q332_histogram_split" -> Q(
      // Histogram-based decision-stump split finding — THE distributed
      // gradient-boosting primitive (XGBoost/LightGBM's approx split):
      // ONE scan bins the feature (acctbal) into 32 fixed-width buckets
      // with exact per-bin (n, positives) for the label "customer has an
      // urgent order"; every candidate threshold's Gini gain is then
      // arithmetic on the bounded 32-row histogram via a 32x31
      // conditional cross — no sort, no per-candidate rescans, no
      // windows. Winner = max gain, ties to the smallest threshold.
      // Empty-side candidates are excluded (gain undefined).
      build = (s, dir) => {
        import s.implicits._
        val lbl = table(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")).distinct()
          .withColumn("pos", lit(1))
        val c = table(s, dir, "customer")
          .join(lbl, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_acctbal").as("x"),
            coalesce(col("pos"), lit(0)).as("y"))
        val mm = c.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
        val binned = c.crossJoin(broadcast(mm))
          .withColumn("b", least(lit(31), floor((col("x") - col("mn"))
            / (col("mx") - col("mn")) * 32).cast("int")))
        val hist = binned.groupBy(col("b"))
          .agg(count(lit(1)).as("n_b"), sum(col("y")).as("p_b"))
        val cands = (0 to 30).toDF("t")
        val split = hist.crossJoin(broadcast(cands))
          .groupBy(col("t"))
          .agg(
            sum(when(col("b") <= col("t"), col("n_b")).otherwise(0L))
              .as("nl"),
            sum(when(col("b") <= col("t"), col("p_b")).otherwise(0L))
              .as("pl"),
            sum(col("n_b")).as("nn"), sum(col("p_b")).as("pp"))
          .filter(col("nl") > 0 && col("nl") < col("nn"))
        def gini(p: Column, n: Column): Column = {
          val r = p.cast("double") / n
          lit(1.0) - r * r - (lit(1.0) - r) * (lit(1.0) - r)
        }
        val scored = split.select(col("t"), col("nl"), col("pl"),
          round(gini(col("pp"), col("nn"))
            - (col("nl").cast("double") / col("nn"))
              * gini(col("pl"), col("nl"))
            - ((col("nn") - col("nl")).cast("double") / col("nn"))
              * gini(col("pp") - col("pl"), col("nn") - col("nl")), 8)
            .as("gain"))
        val best = scored.agg(max(col("gain")).as("gmax"))
          .crossJoin(scored)
          .filter(col("gain") === col("gmax"))
          .agg(min(col("t")).as("best_t"))
        scored.crossJoin(broadcast(best))
          .select(col("t"), col("nl"), col("pl"), col("gain"),
            (col("t") === col("best_t")).cast("int").as("is_best"))
          .orderBy(col("t"))
      },
      oracle = Some("""
        WITH lbl AS (
          SELECT DISTINCT o_custkey, 1 AS pos
          FROM orders WHERE o_orderpriority = '1-URGENT'),
        c AS (
          SELECT c_acctbal AS x, coalesce(pos, 0) AS y
          FROM customer LEFT JOIN lbl ON c_custkey = o_custkey),
        mm AS (SELECT min(x) AS mn, max(x) AS mx FROM c),
        binned AS (
          SELECT least(31, CAST(floor((x - mn) / (mx - mn) * 32)
            AS INTEGER)) AS b, y
          FROM c CROSS JOIN mm),
        hist AS (
          SELECT b, count(*) AS n_b, CAST(sum(y) AS BIGINT) AS p_b
          FROM binned GROUP BY 1),
        cands AS (SELECT unnest(range(0, 31)) AS t),
        split AS (
          SELECT t,
            CAST(sum(CASE WHEN b <= t THEN n_b ELSE 0 END) AS BIGINT)
              AS nl,
            CAST(sum(CASE WHEN b <= t THEN p_b ELSE 0 END) AS BIGINT)
              AS pl,
            CAST(sum(n_b) AS BIGINT) AS nn,
            CAST(sum(p_b) AS BIGINT) AS pp
          FROM hist CROSS JOIN cands
          GROUP BY t
          HAVING sum(CASE WHEN b <= t THEN n_b ELSE 0 END) > 0
            AND sum(CASE WHEN b <= t THEN n_b ELSE 0 END) < sum(n_b)),
        scored AS (
          SELECT t, nl, pl,
            round(
              (1.0 - (CAST(pp AS DOUBLE) / nn) * (CAST(pp AS DOUBLE) / nn)
                - (1.0 - CAST(pp AS DOUBLE) / nn)
                  * (1.0 - CAST(pp AS DOUBLE) / nn))
              - (CAST(nl AS DOUBLE) / nn)
                * (1.0 - (CAST(pl AS DOUBLE) / nl)
                    * (CAST(pl AS DOUBLE) / nl)
                  - (1.0 - CAST(pl AS DOUBLE) / nl)
                    * (1.0 - CAST(pl AS DOUBLE) / nl))
              - (CAST(nn - nl AS DOUBLE) / nn)
                * (1.0 - (CAST(pp - pl AS DOUBLE) / (nn - nl))
                    * (CAST(pp - pl AS DOUBLE) / (nn - nl))
                  - (1.0 - CAST(pp - pl AS DOUBLE) / (nn - nl))
                    * (1.0 - CAST(pp - pl AS DOUBLE) / (nn - nl))), 8)
              AS gain
          FROM split),
        best AS (
          SELECT min(t) AS best_t FROM scored
          WHERE gain = (SELECT max(gain) FROM scored))
        SELECT CAST(t AS INTEGER) AS t, nl, pl, gain,
          CAST(CASE WHEN t = best_t THEN 1 ELSE 0 END AS INTEGER)
            AS is_best
        FROM scored CROSS JOIN best
        ORDER BY t"""),
      bench = true),

    "q333_page_trend" -> Q(
      // Page's L test for an ORDERED alternative (Page 1963) — the
      // directional sharpening of q310's Friedman: with treatments
      // pre-ordered by urgency (the priority's leading digit 1..5),
      // L = sum_j s_j R_j concentrates power on the monotone hypothesis
      // the omnibus test dilutes. Same complete-block monthly machinery
      // as q310 (exact-decimal cells, keyed rank windows, exact integer
      // rank sums); mu_L = b·k·(k+1)^2/4 and sigma_L^2 =
      // b·(k^3−k)^2 / (144·(k−1)) give the normal z as one double
      // formula.
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
            Window.partitionBy(col("m")).orderBy(col("rev"))))
        val sums = ranked.groupBy(col("o_orderpriority"))
          .agg(sum(col("rk")).as("r_sum"), count(lit(1)).as("b"))
          .withColumn("score",
            substring(col("o_orderpriority"), 1, 1).cast("long"))
        val stat = sums.agg(max(col("b")).as("b"),
            sum(col("score") * col("r_sum")).as("l_stat"))
          .select(col("b"), col("l_stat"),
            round((col("l_stat").cast("double")
              - col("b") * 5 * 36 / lit(4.0))
              / sqrt(col("b") * lit(120.0) * 120 / (lit(144.0) * 4)),
              6).as("z"))
        sums.crossJoin(broadcast(stat.select(col("b").as("n_blocks"),
            col("l_stat"), col("z"))))
          .select(col("o_orderpriority"), col("score"), col("r_sum"),
            col("n_blocks"), col("l_stat"), col("z"))
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
            rank() OVER (PARTITION BY c.m ORDER BY c.rev) AS rk
          FROM cell c JOIN full_m USING (m)),
        sums AS (
          SELECT o_orderpriority,
            CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS score,
            CAST(sum(rk) AS BIGINT) AS r_sum,
            count(*) AS b
          FROM ranked GROUP BY 1),
        stat AS (
          SELECT max(b) AS n_blocks,
            CAST(sum(score * r_sum) AS BIGINT) AS l_stat,
            round((CAST(sum(score * r_sum) AS DOUBLE)
              - max(b) * 5 * 36 / 4.0)
              / sqrt(max(b) * 120.0 * 120 / (144.0 * 4)), 6) AS z
          FROM sums)
        SELECT o_orderpriority, score, r_sum, n_blocks, l_stat, z
        FROM sums CROSS JOIN stat
        ORDER BY o_orderpriority""")),

    "q334_negbin_dispersion" -> Q(
      // Negative-binomial overdispersion fit by method of moments on
      // per-user-per-day event counts: dispersion index v/m, and the NB
      // size r = m^2/(v - m) with p = m/v — the count-data modeling
      // step that decides Poisson vs NB for activity simulation.
      // Population moments from exact integers (counts); r/p are NULL
      // when v <= m (under-dispersed — Poisson wins), decided by an
      // identical CASE on both engines. Zero-activity days are not
      // observed rows and are deliberately excluded (stated).
      build = (s, dir) => {
        val daily = table(s, dir, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
        val mom = daily.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
        mom.select(col("n"), col("sx"),
            (col("sx").cast("double") / col("n")).as("m"),
            ((col("sxx").cast("double") - col("sx").cast("double")
              * col("sx") / col("n")) / col("n")).as("v"))
          .select(col("n"), col("sx"),
            round(col("m"), 6).as("mean_count"),
            round(col("v"), 6).as("var_count"),
            round(col("v") / col("m"), 6).as("dispersion"),
            round(when(col("v") > col("m"),
              col("m") * col("m") / (col("v") - col("m"))), 6)
              .as("nb_r"),
            round(when(col("v") > col("m"), col("m") / col("v")), 6)
              .as("nb_p"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS x
          FROM events GROUP BY 1, 2),
        mom AS (
          SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
            CAST(sum(x * x) AS BIGINT) AS sxx
          FROM daily),
        mv AS (
          SELECT n, sx,
            CAST(sx AS DOUBLE) / n AS m,
            (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / n
              AS v
          FROM mom)
        SELECT n, sx, round(m, 6) AS mean_count,
          round(v, 6) AS var_count,
          round(v / m, 6) AS dispersion,
          round(CASE WHEN v > m THEN m * m / (v - m) END, 6) AS nb_r,
          round(CASE WHEN v > m THEN m / v END, 6) AS nb_p
        FROM mv""")),

    "q335_markov_entropy_rate" -> Q(
      // Entropy rate of the event-type Markov chain (Shannon): H =
      // -sum_i pi_i sum_j p_ij ln p_ij with the EMPIRICAL source
      // distribution as pi (stated: empirical, not the stationary
      // eigenvector — no iteration, exact from counts) — how
      // predictable the next user action is given the current one,
      // the sequence-compressibility rival of q58's unigram entropy.
      // Transitions come from one keyed lag per user (q107's shape);
      // everything after is exact integer counts on the bounded 5x5
      // grid with 8-decimal-snapped logs.
      build = (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val trans = table(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("a"))
          .withColumn("b", lead(col("a"), 1).over(w))
          .filter(col("b").isNotNull)
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("n_ab"))
        val outN = trans.groupBy(col("a"))
          .agg(sum(col("n_ab")).as("n_a"))
        val tot = outN.agg(sum(col("n_a")).as("nn"))
        val terms = trans.join(broadcast(outN), Seq("a"))
          .withColumn("p", col("n_ab").cast("double") / col("n_a"))
          .withColumn("term",
            (col("p") * round(-log(col("p")), 8))
              .cast("decimal(16,8)"))
        val perState = terms.groupBy(col("a"))
          .agg(max(col("n_a")).as("n_a"),
            round(sum(col("term")).cast("double"), 6).as("h_state"))
        val rate = perState.crossJoin(broadcast(tot))
          .agg(round(sum((col("n_a").cast("double") / col("nn")
              * col("h_state")).cast("decimal(16,8)")).cast("double"),
              6).as("h_rate"))
        perState.crossJoin(broadcast(tot))
          .select(col("a").as("state"), col("n_a"),
            round(col("n_a").cast("double") / col("nn"), 8).as("pi"),
            col("h_state"))
          .crossJoin(broadcast(rate))
          .orderBy(col("state"))
      },
      oracle = Some("""
        WITH seq AS (
          SELECT event_type AS a,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS b
          FROM events),
        trans AS (
          SELECT a, b, count(*) AS n_ab
          FROM seq WHERE b IS NOT NULL GROUP BY 1, 2),
        outn AS (
          SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a
          FROM trans GROUP BY 1),
        tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS nn FROM outn),
        terms AS (
          SELECT t.a, o.n_a,
            CAST((CAST(t.n_ab AS DOUBLE) / o.n_a)
              * round(-ln(CAST(t.n_ab AS DOUBLE) / o.n_a), 8)
              AS DECIMAL(16,8)) AS term
          FROM trans t JOIN outn o USING (a)),
        per_state AS (
          SELECT a, max(n_a) AS n_a,
            round(CAST(sum(term) AS DOUBLE), 6) AS h_state
          FROM terms GROUP BY a),
        rate AS (
          SELECT round(CAST(sum(CAST(CAST(n_a AS DOUBLE) / nn * h_state
            AS DECIMAL(16,8))) AS DOUBLE), 6) AS h_rate
          FROM per_state CROSS JOIN tot)
        SELECT a AS state, n_a,
          round(CAST(n_a AS DOUBLE) / nn, 8) AS pi, h_state, h_rate
        FROM per_state CROSS JOIN tot CROSS JOIN rate
        ORDER BY state""")),

    "q336_rolling_origin_backtest" -> Q(
      // Rolling-origin forecast backtest (time-series cross-validation):
      // for each of three origins, fit the monthly-revenue trend on all
      // PRIOR months only and score the one-step-ahead forecast against
      // the actual — the leakage-free evaluation harness every forecast
      // claim needs (q212's seasonal-naive MASE is the baseline; this
      // is the protocol). Monthly y floor-quantized to thousands (q312
      // integer-moment rule); per-origin training moments via the
      // origin-grid conditional cross on the bounded month frame — no
      // windows, no per-origin rescans.
      build = (s, dir) => {
        import s.implicits._
        val monthly = table(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
          .agg(sum(dec(col("o_totalprice"))).as("srev"))
          .select(((year(col("m")) - 1992) * 12 + month(col("m")) - 1)
            .as("mi"),
            floor(col("srev").cast("double") / lit(1000.0)).as("y"))
        val origins = Seq("1997-01-01", "1997-07-01", "1998-01-01")
          .toDF("od")
          .select(col("od").cast("date").as("origin"),
            ((year(col("od").cast("date")) - 1992) * 12
              + month(col("od").cast("date")) - 1).as("oi"))
        val mom = monthly.crossJoin(broadcast(origins))
          .groupBy(col("origin"), col("oi"))
          .agg(
            sum(when(col("mi") < col("oi"), 1).otherwise(0)).as("n"),
            sum(when(col("mi") < col("oi"), col("mi")).otherwise(0L))
              .as("sx"),
            sum(when(col("mi") < col("oi"), col("y"))).as("sy"),
            sum(when(col("mi") < col("oi"), col("mi") * col("y")))
              .as("sxy"),
            sum(when(col("mi") < col("oi"), col("mi") * col("mi"))
              .otherwise(0L)).as("sxx"),
            max(when(col("mi") === col("oi"), col("y"))).as("actual"))
          .filter(col("actual").isNotNull)
        def d(c: String): Column = col(c).cast("double")
        val fit = mom
          .withColumn("b", round((d("sxy") - d("sx") * d("sy")
              / col("n"))
            / (d("sxx") - d("sx") * d("sx") / col("n")), 6))
          .withColumn("a", round((d("sy") - col("b") * d("sx"))
            / col("n"), 6))
          .withColumn("yhat", round(col("a") + col("b") * col("oi"), 4))
        fit.select(col("origin"), col("n").as("n_train"),
            col("b").as("slope"), col("yhat"), col("actual"),
            round(abs(col("yhat") - col("actual"))
              / col("actual"), 6).as("ape"))
          .orderBy(col("origin"))
      },
      oracle = Some("""
        WITH monthly AS (
          SELECT (year(o_orderdate) - 1992) * 12
            + month(o_orderdate) - 1 AS mi,
            CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DOUBLE) / 1000.0) AS BIGINT) AS y
          FROM orders
          GROUP BY date_trunc('month', o_orderdate),
            (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1),
        origins AS (
          SELECT origin,
            (year(origin) - 1992) * 12 + month(origin) - 1 AS oi
          FROM (SELECT unnest([DATE '1997-01-01', DATE '1997-07-01',
            DATE '1998-01-01']) AS origin)),
        mom AS (
          SELECT origin, oi,
            CAST(sum(CASE WHEN mi < oi THEN 1 ELSE 0 END) AS BIGINT)
              AS n,
            CAST(sum(CASE WHEN mi < oi THEN mi ELSE 0 END) AS BIGINT)
              AS sx,
            CAST(sum(CASE WHEN mi < oi THEN y END) AS BIGINT) AS sy,
            CAST(sum(CASE WHEN mi < oi THEN mi * y END) AS BIGINT)
              AS sxy,
            CAST(sum(CASE WHEN mi < oi THEN mi * mi ELSE 0 END)
              AS BIGINT) AS sxx,
            max(CASE WHEN mi = oi THEN y END) AS actual
          FROM monthly CROSS JOIN origins
          GROUP BY 1, 2
          HAVING max(CASE WHEN mi = oi THEN y END) IS NOT NULL),
        fit AS (
          SELECT origin, n, actual, oi,
            round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sy AS DOUBLE) / n)
              / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sx AS DOUBLE) / n), 6) AS b,
            sx, sy
          FROM mom),
        fit2 AS (
          SELECT origin, n, actual, oi, b,
            round((CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / n, 6)
              AS a
          FROM fit),
        fc AS (
          SELECT origin, n, b, actual,
            round(a + b * oi, 4) AS yhat
          FROM fit2)
        SELECT origin, n AS n_train, b AS slope, yhat, actual,
          round(abs(yhat - actual) / actual, 6) AS ape
        FROM fc
        ORDER BY origin""")),

    "q337_classifier_panel" -> Q(
      // Binary-classifier evaluation panel beyond accuracy: confusion
      // matrix, precision/recall/F1, Matthews correlation and Cohen's
      // kappa for the rule "acctbal above the global median predicts an
      // urgent order" — the chance-corrected metrics (MCC, kappa) that
      // q95's AUC and the ML layer's report don't cover, as one
      // conditional-aggregate scan. The median threshold interpolates
      // in double on both engines (q320 rule); every cell is an exact
      // integer, and all metrics are fixed double formulas from those
      // four integers.
      build = (s, dir) => {
        val lbl = table(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")).distinct()
          .withColumn("y", lit(1))
        val gm = table(s, dir, "customer")
          .agg(expr("percentile(c_acctbal, 0.5)").as("med"))
        val scored = table(s, dir, "customer")
          .join(lbl, col("c_custkey") === col("o_custkey"), "left")
          .crossJoin(broadcast(gm))
          .select(coalesce(col("y"), lit(0)).as("y"),
            (col("c_acctbal") > col("med")).cast("int").as("yh"))
        val cm = scored.agg(
          sum(col("y") * col("yh")).as("tp"),
          sum((lit(1) - col("y")) * col("yh")).as("fp"),
          sum(col("y") * (lit(1) - col("yh"))).as("fn"),
          sum((lit(1) - col("y")) * (lit(1) - col("yh"))).as("tn"))
        def d(c: String): Column = col(c).cast("double")
        cm.select(col("tp"), col("fp"), col("fn"), col("tn"),
            round(d("tp") / (d("tp") + d("fp")), 6).as("precision"),
            round(d("tp") / (d("tp") + d("fn")), 6).as("recall"),
            round(lit(2.0) * d("tp")
              / (lit(2.0) * d("tp") + d("fp") + d("fn")), 6).as("f1"),
            round((d("tp") * d("tn") - d("fp") * d("fn"))
              / sqrt((d("tp") + d("fp")) * (d("tp") + d("fn"))
                * (d("tn") + d("fp")) * (d("tn") + d("fn"))), 6)
              .as("mcc"),
            round(((d("tp") + d("tn"))
                / (d("tp") + d("fp") + d("fn") + d("tn"))
              - ((d("tp") + d("fp")) * (d("tp") + d("fn"))
                + (d("fn") + d("tn")) * (d("fp") + d("tn")))
                / ((d("tp") + d("fp") + d("fn") + d("tn"))
                  * (d("tp") + d("fp") + d("fn") + d("tn"))))
              / (lit(1.0)
              - ((d("tp") + d("fp")) * (d("tp") + d("fn"))
                + (d("fn") + d("tn")) * (d("fp") + d("tn")))
                / ((d("tp") + d("fp") + d("fn") + d("tn"))
                  * (d("tp") + d("fp") + d("fn") + d("tn")))), 6)
              .as("kappa"))
      },
      oracle = Some("""
        WITH lbl AS (
          SELECT DISTINCT o_custkey, 1 AS y
          FROM orders WHERE o_orderpriority = '1-URGENT'),
        gm AS (
          SELECT quantile_cont(c_acctbal, 0.5) AS med FROM customer),
        scored AS (
          SELECT coalesce(y, 0) AS y,
            CASE WHEN c_acctbal > med THEN 1 ELSE 0 END AS yh
          FROM customer LEFT JOIN lbl ON c_custkey = o_custkey
          CROSS JOIN gm),
        cm AS (
          SELECT CAST(sum(y * yh) AS BIGINT) AS tp,
            CAST(sum((1 - y) * yh) AS BIGINT) AS fp,
            CAST(sum(y * (1 - yh)) AS BIGINT) AS fn,
            CAST(sum((1 - y) * (1 - yh)) AS BIGINT) AS tn
          FROM scored),
        m AS (
          SELECT tp, fp, fn, tn,
            CAST(tp AS DOUBLE) AS tpd, CAST(fp AS DOUBLE) AS fpd,
            CAST(fn AS DOUBLE) AS fnd, CAST(tn AS DOUBLE) AS tnd
          FROM cm)
        SELECT tp, fp, fn, tn,
          round(tpd / (tpd + fpd), 6) AS precision,
          round(tpd / (tpd + fnd), 6) AS recall,
          round(2.0 * tpd / (2.0 * tpd + fpd + fnd), 6) AS f1,
          round((tpd * tnd - fpd * fnd)
            / sqrt((tpd + fpd) * (tpd + fnd)
              * (tnd + fpd) * (tnd + fnd)), 6) AS mcc,
          round(((tpd + tnd) / (tpd + fpd + fnd + tnd)
            - ((tpd + fpd) * (tpd + fnd)
              + (fnd + tnd) * (fpd + tnd))
              / ((tpd + fpd + fnd + tnd)
                * (tpd + fpd + fnd + tnd)))
            / (1.0
            - ((tpd + fpd) * (tpd + fnd)
              + (fnd + tnd) * (fpd + tnd))
              / ((tpd + fpd + fnd + tnd)
                * (tpd + fpd + fnd + tnd))), 6) AS kappa
        FROM m""")),

    "q338_bradley_terry" -> Q(
      // Bradley-Terry preference strengths via Hunter's MM algorithm
      // (Hunter 2004), six unrolled iterations: which order priority
      // "wins" the monthly revenue contest, as a fitted strength rather
      // than a rank — the pairwise-comparison model behind every
      // LLM-preference leaderboard (Elo's batch cousin), here exercised
      // on exact-decimal monthly cells. Wins come from the complete-
      // block month frame (ties contribute nothing, identically on both
      // engines); the MM update runs on the bounded 20-pair frame with
      // every divisor term snapped to DECIMAL(20,10) before summing and
      // theta snapped to 8 decimals + sum-normalized per iteration
      // (the q301/q316 discipline). One localCheckpoint per iteration
      // keeps lineage linear (the q316 lesson).
      build = (s, dir) => {
        val cell = table(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("m"),
            col("o_orderpriority"))
          .agg(msum(col("o_totalprice")).as("rev"))
        val full = cell.groupBy(col("m"))
          .agg(count(lit(1)).as("k_m")).filter(col("k_m") === 5)
          .select(col("m"))
        val c2 = cell.join(broadcast(full), Seq("m"))
        val a = c2.select(col("m"), col("o_orderpriority").as("i"),
          col("rev").as("ri"))
        val b = c2.select(col("m"), col("o_orderpriority").as("j"),
          col("rev").as("rj"))
        val wins = a.join(b, Seq("m")).filter(col("i") =!= col("j"))
          .groupBy(col("i"), col("j"))
          .agg(sum((col("ri") > col("rj")).cast("long")).as("w"))
        val wRev = wins.select(col("j").as("i2"), col("i").as("j2"),
          col("w").as("w_rev"))
        val pairs = wins.join(wRev,
            col("i") === col("i2") && col("j") === col("j2"))
          .select(col("i"), col("j"), (col("w") + col("w_rev")).as("n"))
          .filter(col("n") > 0)
        val wI = wins.groupBy(col("i")).agg(sum(col("w")).as("wi"))
        var theta = wI.select(col("i"),
          lit(1.0).cast("decimal(12,8)").as("theta"))
        var prevCkpt: DataFrame = null
        for (_ <- 1 to 6) {
          val tj = theta.select(col("i").as("j"),
            col("theta").as("theta_j"))
          val den = pairs.join(broadcast(theta), Seq("i"))
            .join(broadcast(tj), Seq("j"))
            .withColumn("term", (col("n").cast("double")
              / (col("theta") + col("theta_j")).cast("double"))
              .cast("decimal(20,10)"))
            .groupBy(col("i")).agg(sum(col("term")).as("den"))
          val raw = den.join(broadcast(wI), Seq("i"))
            .withColumn("traw", round(col("wi").cast("double")
              / col("den").cast("double"), 8).cast("decimal(16,8)"))
          val tot = raw.agg(sum(col("traw")).cast("decimal(20,8)")
            .as("tot"))
          theta = raw.crossJoin(broadcast(tot))
            .select(col("i"), round(lit(5.0)
              * col("traw").cast("double") / col("tot").cast("double"),
              8).cast("decimal(12,8)").as("theta"))
            .localCheckpoint()
          if (prevCkpt != null) prevCkpt.unpersist()
          prevCkpt = theta
        }
        theta.join(broadcast(wI), Seq("i"))
          .select(col("i").as("o_orderpriority"), col("wi").as("n_wins"),
            col("theta").cast("double").as("bt_strength"))
          .orderBy(col("o_orderpriority"))
      },
      oracle = Some(bradleyTerryOracle)),

    "q339_newey_west" -> Q(
      // Newey-West (HAC) standard error of the daily-revenue mean, lag
      // window L=5 with Bartlett weights — the dependence-aware
      // uncertainty every autocorrelated daily series needs (q149
      // MEASURES the autocorrelation; this prices it into the SE; the
      // naive iid SE rides along for the contrast). The autocovariances
      // stay EXACT by the q339 scaling trick: n²·gamma_l's numerator is
      // sum (n·y_t − S)(n·y_{t−l} − S), pure integer arithmetic in
      // decimal(38,0) on the bounded day frame — no float residuals
      // anywhere. Calendar-day lags (missing-day pairs drop, stated);
      // the lag join is an equi-join against the 6-row lag grid.
      build = (s, dir) => {
        import s.implicits._
        val day0 = lit("1995-01-01").cast("date")
        val daily = table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(dec(col("o_totalprice"))).as("srev"))
          .select(datediff(col("day"), day0).as("x"),
            floor(col("srev").cast("double") / lit(1000.0)).as("y"))
        val tot = daily.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
        // integer-center first (shift-invariant: n·yd − sd == n·y − sy
        // exactly) so the scaled lag products stay well inside 2^53 at
        // the gate SFs — the q312 exactness budget applied to products
        val cent = daily.crossJoin(broadcast(tot))
          .withColumn("c", floor(col("sy").cast("double") / col("n")))
          .select(col("x"), (col("y") - col("c")).as("yd"), col("n"),
            (col("sy") - col("n") * col("c")).as("sd"))
        val lags = (0 to 5).toDF("l")
        val right = cent.crossJoin(broadcast(lags))
          .select((col("x") + col("l")).as("x"), col("l"),
            col("yd").as("yd_lag"))
        val prods = cent.join(right, Seq("x"))
          .groupBy(col("l"))
          .agg(max(col("n")).as("n"),
            sum(((col("n") * col("yd") - col("sd"))
              * (col("n") * col("yd_lag") - col("sd")))
              .cast("decimal(38,0)")).as("g_num"),
            count(lit(1)).as("n_pairs"))
          .withColumn("gamma", round(col("g_num").cast("double")
            / (col("n").cast("double") * col("n") * col("n")), 6))
        val se = prods.agg(max(col("n")).as("n"),
            round(sum(when(col("l") === 0, col("gamma"))
              .otherwise((lit(2.0) - lit(2.0) * col("l") / 6)
                * col("gamma")).cast("decimal(20,6)")).cast("double"),
              6).as("lrv"),
            round(max(when(col("l") === 0, col("gamma"))), 6)
              .as("g0"))
          .select(col("n"),
            round(sqrt(abs(col("lrv")) / col("n")), 6).as("se_nw"),
            round(sqrt(col("g0") / col("n")), 6).as("se_iid"))
        prods.select(col("l"), col("n_pairs"), col("gamma"))
          .crossJoin(broadcast(se))
          .orderBy(col("l"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT date_diff('day', DATE '1995-01-01',
              CAST(o_orderdate AS DATE)) AS x,
            CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DOUBLE) / 1000.0) AS BIGINT) AS y
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate < TIMESTAMP '1996-01-01'
          GROUP BY CAST(o_orderdate AS DATE)),
        tot AS (
          SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS sy
          FROM daily),
        cent AS (
          SELECT x,
            y - CAST(floor(CAST(sy AS DOUBLE) / n) AS BIGINT) AS yd,
            n,
            sy - n * CAST(floor(CAST(sy AS DOUBLE) / n) AS BIGINT)
              AS sd
          FROM daily CROSS JOIN tot),
        lags AS (SELECT unnest(range(0, 6)) AS l),
        rt AS (
          SELECT x + l AS x, l, yd AS yd_lag
          FROM cent CROSS JOIN lags),
        prods AS (
          SELECT l, max(n) AS n, count(*) AS n_pairs,
            round(CAST(sum(CAST((n * d.yd - sd)
              * (n * rt.yd_lag - sd) AS DECIMAL(38,0))) AS DOUBLE)
              / (CAST(max(n) AS DOUBLE) * max(n) * max(n)), 6)
              AS gamma
          FROM cent d JOIN rt USING (x)
          GROUP BY l),
        se AS (
          SELECT max(n) AS n,
            round(CAST(sum(CAST(CASE WHEN l = 0 THEN gamma
              ELSE (2.0 - 2.0 * l / 6) * gamma END AS DECIMAL(20,6)))
              AS DOUBLE), 6) AS lrv,
            round(max(CASE WHEN l = 0 THEN gamma END), 6) AS g0
          FROM prods)
        SELECT l, n_pairs, gamma,
          se.n, round(sqrt(abs(lrv) / se.n), 6) AS se_nw,
          round(sqrt(g0 / se.n), 6) AS se_iid
        FROM prods CROSS JOIN se
        ORDER BY l""")),

    "q340_periodogram" -> Q(
      // Fixed-frequency periodogram (Schuster) of daily revenue at the
      // candidate periods {7, 30, 91, 365} days — the frequency-domain
      // seasonality probe that complements q126/q248's calendar-keyed
      // view: which rhythm actually carries the power, asked of the raw
      // series. cos/sin values snap to 8 decimals before entering the
      // exact decimal sums (the q280 log discipline applied to trig),
      // so both engines accumulate identical terms; power is one double
      // formula per period over the bounded grid.
      build = (s, dir) => {
        import s.implicits._
        val day0 = lit("1995-01-01").cast("date")
        val daily = table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(dec(col("o_totalprice"))).as("srev"))
          .select(datediff(col("day"), day0).as("x"),
            floor(col("srev").cast("double") / lit(1000.0)).as("y"))
        // integer-center (q339's trick): removes DC leakage into the
        // nonzero frequencies AND keeps y·trig sums exact under 2^53
        val tot = daily.agg(count(lit(1)).as("n0"),
          sum(col("y")).as("sy0"))
        val cent = daily.crossJoin(broadcast(tot))
          .select(col("x"), (col("y") - floor(col("sy0").cast("double")
            / col("n0"))).as("yd"))
        val periods = Seq(7, 30, 91, 365).toDF("p")
        val terms = cent.crossJoin(broadcast(periods))
          .withColumn("arg", lit(2.0) * lit(math.Pi) * col("x")
            / col("p"))
          .select(col("p"), col("yd"),
            round(cos(col("arg")), 8).as("c8"),
            round(sin(col("arg")), 8).as("s8"))
        val pw = terms.groupBy(col("p"))
          .agg(count(lit(1)).as("n"),
            sum((col("yd") * col("c8")).cast("decimal(24,8)")).as("sc"),
            sum((col("yd") * col("s8")).cast("decimal(24,8)")).as("ss"))
          .withColumn("power", round((col("sc").cast("double")
              * col("sc").cast("double")
            + col("ss").cast("double") * col("ss").cast("double"))
            / col("n"), 2))
        val peak = pw.agg(max(col("power")).as("pmax"))
          .crossJoin(pw).filter(col("power") === col("pmax"))
          .agg(min(col("p")).as("peak_p"))
        pw.crossJoin(broadcast(peak))
          .select(col("p"), col("n"), col("power"),
            (col("p") === col("peak_p")).cast("int").as("is_peak"))
          .orderBy(col("p"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT date_diff('day', DATE '1995-01-01',
              CAST(o_orderdate AS DATE)) AS x,
            CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DOUBLE) / 1000.0) AS BIGINT) AS y
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate < TIMESTAMP '1996-01-01'
          GROUP BY CAST(o_orderdate AS DATE)),
        tot AS (SELECT count(*) AS n0, CAST(sum(y) AS BIGINT) AS sy0
          FROM daily),
        cent AS (
          SELECT x,
            y - CAST(floor(CAST(sy0 AS DOUBLE) / n0) AS BIGINT) AS yd
          FROM daily CROSS JOIN tot),
        periods AS (SELECT unnest([7, 30, 91, 365]) AS p),
        terms AS (
          SELECT p, yd,
            round(cos(2.0 * pi() * x / p), 8) AS c8,
            round(sin(2.0 * pi() * x / p), 8) AS s8
          FROM cent CROSS JOIN periods),
        pw AS (
          SELECT p, count(*) AS n,
            sum(CAST(yd * c8 AS DECIMAL(24,8))) AS sc,
            sum(CAST(yd * s8 AS DECIMAL(24,8))) AS ss
          FROM terms GROUP BY 1),
        scored AS (
          SELECT p, n,
            round((CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
              + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)) / n, 2)
              AS power
          FROM pw),
        peak AS (
          SELECT min(p) AS peak_p FROM scored
          WHERE power = (SELECT max(power) FROM scored))
        SELECT CAST(p AS INTEGER) AS p, n, power,
          CAST(CASE WHEN p = peak_p THEN 1 ELSE 0 END AS INTEGER)
            AS is_peak
        FROM scored CROSS JOIN peak
        ORDER BY p""")),

    "q341_partial_correlation" -> Q(
      // Partial correlation + variance-inflation panel on lineitem's
      // (quantity, extendedprice, discount): r_qty,price controlling
      // for discount, and the discount VIFs — the collinearity
      // diagnostics behind q241's multiple regression. ONE scan
      // collects all nine exact-decimal moments; the three pairwise
      // correlations, the partial and the VIFs are fixed double
      // formulas. Correlations are O(1) outputs, so the >2^53 decimal
      // sums' cast ulps are invisible under the 6-decimal round (the
      // q312 budget rule's output-magnitude corollary).
      build = (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_quantity").cast("decimal(8,2)").as("x"),
            col("l_extendedprice").cast("decimal(12,2)").as("y"),
            col("l_discount").cast("decimal(4,2)").as("z"))
        val m = li.agg(count(lit(1)).as("n"),
          sum(col("x")).cast("decimal(24,2)").as("sx"),
          sum(col("y")).cast("decimal(24,2)").as("sy"),
          sum(col("z")).cast("decimal(24,2)").as("sz"),
          sum((col("x") * col("y")).cast("decimal(30,4)")).as("sxy"),
          sum((col("x") * col("z")).cast("decimal(30,4)")).as("sxz"),
          sum((col("y") * col("z")).cast("decimal(30,4)")).as("syz"),
          sum((col("x") * col("x")).cast("decimal(30,4)")).as("sxx"),
          sum((col("y") * col("y")).cast("decimal(30,4)")).as("syy"),
          sum((col("z") * col("z")).cast("decimal(30,4)")).as("szz"))
        def d(c: String): Column = col(c).cast("double")
        def corr(sab: String, sa: String, sb: String,
            saa: String, sbb: String): Column =
          (d(sab) - d(sa) * d(sb) / col("n"))
            ./(sqrt((d(saa) - d(sa) * d(sa) / col("n"))
              * (d(sbb) - d(sb) * d(sb) / col("n"))))
        val withR = m
          .withColumn("r_xy", corr("sxy", "sx", "sy", "sxx", "syy"))
          .withColumn("r_xz", corr("sxz", "sx", "sz", "sxx", "szz"))
          .withColumn("r_yz", corr("syz", "sy", "sz", "syy", "szz"))
        withR.select(col("n"),
          round(col("r_xy"), 6).as("r_qty_price"),
          round(col("r_xz"), 6).as("r_qty_disc"),
          round(col("r_yz"), 6).as("r_price_disc"),
          round((col("r_xy") - col("r_xz") * col("r_yz"))
            / sqrt((lit(1.0) - col("r_xz") * col("r_xz"))
              * (lit(1.0) - col("r_yz") * col("r_yz"))), 6)
            .as("r_qty_price_given_disc"),
          round(lit(1.0) / (lit(1.0) - col("r_xz") * col("r_xz")), 6)
            .as("vif_qty_disc"),
          round(lit(1.0) / (lit(1.0) - col("r_yz") * col("r_yz")), 6)
            .as("vif_price_disc"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT CAST(l_quantity AS DECIMAL(8,2)) AS x,
            CAST(l_extendedprice AS DECIMAL(12,2)) AS y,
            CAST(l_discount AS DECIMAL(4,2)) AS z
          FROM lineitem),
        m AS (
          SELECT count(*) AS n,
            CAST(sum(x) AS DECIMAL(24,2)) AS sx,
            CAST(sum(y) AS DECIMAL(24,2)) AS sy,
            CAST(sum(z) AS DECIMAL(24,2)) AS sz,
            CAST(sum(CAST(CAST(x AS DECIMAL(19,2)) * y
              AS DECIMAL(30,4))) AS DECIMAL(30,4)) AS sxy,
            CAST(sum(CAST(CAST(x AS DECIMAL(19,2)) * z
              AS DECIMAL(30,4))) AS DECIMAL(30,4)) AS sxz,
            CAST(sum(CAST(CAST(y AS DECIMAL(19,2)) * z
              AS DECIMAL(30,4))) AS DECIMAL(30,4)) AS syz,
            CAST(sum(CAST(CAST(x AS DECIMAL(19,2)) * x
              AS DECIMAL(30,4))) AS DECIMAL(30,4)) AS sxx,
            CAST(sum(CAST(CAST(y AS DECIMAL(19,2)) * y
              AS DECIMAL(30,4))) AS DECIMAL(30,4)) AS syy,
            CAST(sum(CAST(CAST(z AS DECIMAL(19,2)) * z
              AS DECIMAL(30,4))) AS DECIMAL(30,4)) AS szz
          FROM li),
        r AS (
          SELECT n,
            (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
              * CAST(sy AS DOUBLE) / n)
            / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sx AS DOUBLE) / n)
              * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                * CAST(sy AS DOUBLE) / n)) AS r_xy,
            (CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE)
              * CAST(sz AS DOUBLE) / n)
            / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sx AS DOUBLE) / n)
              * (CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)
                * CAST(sz AS DOUBLE) / n)) AS r_xz,
            (CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE)
              * CAST(sz AS DOUBLE) / n)
            / sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                * CAST(sy AS DOUBLE) / n)
              * (CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)
                * CAST(sz AS DOUBLE) / n)) AS r_yz
          FROM m)
        SELECT n,
          round(r_xy, 6) AS r_qty_price,
          round(r_xz, 6) AS r_qty_disc,
          round(r_yz, 6) AS r_price_disc,
          round((r_xy - r_xz * r_yz)
            / sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz)), 6)
            AS r_qty_price_given_disc,
          round(1.0 / (1.0 - r_xz * r_xz), 6) AS vif_qty_disc,
          round(1.0 / (1.0 - r_yz * r_yz), 6) AS vif_price_disc
        FROM r""")),

    "q342_seasonal_strength" -> Q(
      // Strength-of-seasonality index (the STL F_s statistic, computed
      // as the day-of-week factor's eta-squared on the detrended
      // series): how much of the detrended variation the weekly cycle
      // explains — q248 SHOWS the decomposition, this scores it with
      // one number. Reuses q248's exact construction (centered 7-day MA
      // trend over the banded self-join, 8-decimal-snapped ratios);
      // between/total sums of squares come from the bounded 7-row
      // weekday moment frame with the q320 snap discipline.
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(dec(col("o_totalprice"))).cast("decimal(20,2)")
            .as("rev"))
          .withColumn("dayn", unix_date(col("day")))
        val trended = daily.as("a").join(daily.as("b"),
            col("b.dayn") >= col("a.dayn") - 3
              && col("b.dayn") <= col("a.dayn") + 3)
          .groupBy(col("a.day").as("day"), col("a.rev").as("rev"))
          .agg(count(lit(1)).as("w"),
            sum(col("b.rev")).cast("decimal(24,2)").as("srev"))
          .filter(col("w") === 7)
          .withColumn("ratio", round(col("rev").cast("double")
            / (col("srev").cast("double") / lit(7.0)), 8)
            .cast("decimal(14,8)"))
        val dowm = trended
          .withColumn("isodow", weekday(col("day")) + 1)
          .groupBy(col("isodow"))
          .agg(count(lit(1)).as("n_d"),
            sum(col("ratio")).cast("decimal(20,8)").as("sd"),
            sum((col("ratio") * col("ratio")).cast("decimal(30,16)"))
              .as("sdd"))
        val tot = dowm.agg(sum(col("n_d")).as("nn"),
          sum(col("sd")).cast("decimal(24,8)").as("st"),
          sum(col("sdd").cast("decimal(38,16)")).cast("decimal(38,16)")
            .as("sst"),
          round(sum((col("sd").cast("double") * col("sd").cast("double")
            / col("n_d")).cast("decimal(24,10)")).cast("double"), 8)
            .as("between_raw"))
        tot.select(col("nn").as("n_days"),
          round((col("between_raw") - col("st").cast("double")
              * col("st").cast("double") / col("nn"))
            / (col("sst").cast("double") - col("st").cast("double")
              * col("st").cast("double") / col("nn")), 6)
            .as("f_seasonal"),
          round((col("sst").cast("double") - col("st").cast("double")
            * col("st").cast("double") / col("nn"))
            / col("nn"), 8).as("var_detrended"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
            CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DECIMAL(20,2)) AS rev
          FROM orders GROUP BY 1),
        trended AS (
          SELECT a.day, a.rev, count(*) AS w,
            CAST(sum(b.rev) AS DECIMAL(24,2)) AS srev
          FROM daily a JOIN daily b
            ON b.day >= a.day - 3 AND b.day <= a.day + 3
          GROUP BY a.day, a.rev
          HAVING count(*) = 7),
        ratios AS (
          SELECT isodow(day) AS isodow,
            CAST(round(CAST(rev AS DOUBLE)
              / (CAST(srev AS DOUBLE) / 7.0), 8) AS DECIMAL(14,8))
              AS ratio
          FROM trended),
        dowm AS (
          SELECT isodow, count(*) AS n_d,
            CAST(sum(ratio) AS DECIMAL(20,8)) AS sd,
            sum(CAST(CAST(ratio AS DECIMAL(19,8))
              * CAST(ratio AS DECIMAL(19,8)) AS DECIMAL(30,16)))
              AS sdd
          FROM ratios GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n_d) AS BIGINT) AS nn,
            CAST(sum(sd) AS DECIMAL(24,8)) AS st,
            CAST(sum(sdd) AS DECIMAL(38,16)) AS sst,
            round(CAST(sum(CAST(CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
              / n_d AS DECIMAL(24,10))) AS DOUBLE), 8) AS between_raw
          FROM dowm)
        SELECT nn AS n_days,
          round((between_raw - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
              / nn)
            / (CAST(sst AS DOUBLE) - CAST(st AS DOUBLE)
              * CAST(st AS DOUBLE) / nn), 6) AS f_seasonal,
          round((CAST(sst AS DOUBLE) - CAST(st AS DOUBLE)
            * CAST(st AS DOUBLE) / nn) / nn, 8) AS var_detrended
        FROM tot""")),

    "q343_granger_lite" -> Q(
      // Granger-style predictive F-test: do yesterday's CLICKS help
      // predict today's PURCHASES beyond yesterday's purchases? Full
      // model p_t ~ p_{t-1} + c_{t-1} vs restricted p_t ~ p_{t-1}; the
      // F for the exclusion is the one-lag Granger test. All series are
      // integer daily counts, lags are calendar-day equi-joins, and the
      // two OLS fits are closed-form on exact centered moments (q272's
      // normal-equation formulas) — zero windows, zero sorts.
      build = (s, dir) => {
        val ev = table(s, dir, "events")
        def cnt(t: String, name: String): DataFrame = ev
          .filter(col("event_type") === t)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as(name))
        val p = cnt("purchase", "p")
        val c = cnt("click", "c")
        val cur = p.select(unix_date(col("day")).as("d"),
          col("p").as("y"))
        val lag = p.select((unix_date(col("day")) + 1).as("d"),
          col("p").as("a"))
          .join(c.select((unix_date(col("day")) + 1).as("d"),
            col("c").as("b")), Seq("d"))
        val rows = cur.join(lag, Seq("d"))
        val m = rows.agg(count(lit(1)).as("n"),
          sum(col("y")).as("sy"), sum(col("a")).as("sa"),
          sum(col("b")).as("sb"),
          sum(col("y") * col("a")).as("say"),
          sum(col("y") * col("b")).as("sby"),
          sum(col("a") * col("b")).as("sab"),
          sum(col("a") * col("a")).as("saa"),
          sum(col("b") * col("b")).as("sbb"),
          sum(col("y") * col("y")).as("syy"))
        def d(c0: String): Column = col(c0).cast("double")
        val cm = m.select(col("n"),
          (d("saa") - d("sa") * d("sa") / col("n")).as("caa"),
          (d("sbb") - d("sb") * d("sb") / col("n")).as("cbb"),
          (d("sab") - d("sa") * d("sb") / col("n")).as("cab"),
          (d("say") - d("sa") * d("sy") / col("n")).as("cay"),
          (d("sby") - d("sb") * d("sy") / col("n")).as("cby"),
          (d("syy") - d("sy") * d("sy") / col("n")).as("cyy"))
        val fit = cm.select(col("n"), col("cyy"),
            ((col("cay") * col("cbb") - col("cby") * col("cab"))
              / (col("caa") * col("cbb") - col("cab") * col("cab")))
              .as("b1"),
            ((col("cby") * col("caa") - col("cay") * col("cab"))
              / (col("caa") * col("cbb") - col("cab") * col("cab")))
              .as("b2"),
            col("cay"), col("cby"), col("caa"))
          .select(col("n"),
            (col("cyy") - col("b1") * col("cay")
              - col("b2") * col("cby")).as("sse_full"),
            (col("cyy") - col("cay") * col("cay") / col("caa"))
              .as("sse_restricted"),
            round(col("b2"), 6).as("b_clicks"))
        fit.select(col("n"), col("b_clicks"),
          round(col("sse_restricted"), 4).as("sse_restricted"),
          round(col("sse_full"), 4).as("sse_full"),
          round((col("sse_restricted") - col("sse_full"))
            / (col("sse_full") / (col("n") - 3)), 6).as("f_granger"))
      },
      oracle = Some("""
        WITH p AS (
          SELECT CAST(ts AS DATE) AS day, count(*) AS p
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        c AS (
          SELECT CAST(ts AS DATE) AS day, count(*) AS c
          FROM events WHERE event_type = 'click' GROUP BY 1),
        rows_ AS (
          SELECT cur.p AS y, lp.p AS a, lc.c AS b
          FROM p cur
          JOIN p lp ON lp.day + 1 = cur.day
          JOIN c lc ON lc.day + 1 = cur.day),
        m AS (
          SELECT count(*) AS n,
            CAST(sum(y) AS BIGINT) AS sy, CAST(sum(a) AS BIGINT) AS sa,
            CAST(sum(b) AS BIGINT) AS sb,
            CAST(sum(y * a) AS BIGINT) AS say,
            CAST(sum(y * b) AS BIGINT) AS sby,
            CAST(sum(a * b) AS BIGINT) AS sab,
            CAST(sum(a * a) AS BIGINT) AS saa,
            CAST(sum(b * b) AS BIGINT) AS sbb,
            CAST(sum(y * y) AS BIGINT) AS syy
          FROM rows_),
        cm AS (
          SELECT n,
            CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n AS caa,
            CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n AS cbb,
            CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * sb / n AS cab,
            CAST(say AS DOUBLE) - CAST(sa AS DOUBLE) * sy / n AS cay,
            CAST(sby AS DOUBLE) - CAST(sb AS DOUBLE) * sy / n AS cby,
            CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS cyy
          FROM m),
        fit AS (
          SELECT n, cyy, cay, cby, caa,
            (cay * cbb - cby * cab) / (caa * cbb - cab * cab) AS b1,
            (cby * caa - cay * cab) / (caa * cbb - cab * cab) AS b2
          FROM cm),
        sse AS (
          SELECT n, round(b2, 6) AS b_clicks,
            cyy - b1 * cay - b2 * cby AS sse_full,
            cyy - cay * cay / caa AS sse_restricted
          FROM fit)
        SELECT n, b_clicks,
          round(sse_restricted, 4) AS sse_restricted,
          round(sse_full, 4) AS sse_full,
          round((sse_restricted - sse_full) / (sse_full / (n - 3)), 6)
            AS f_granger
        FROM sse""")),

    "q344_power_analysis" -> Q(
      // Two-proportion sample-size calculator (the experiment-design
      // companion of q249's SRM check and q300's monitor): for the
      // MEASURED urgent-order baseline rate and a grid of absolute
      // MDEs, the per-arm n for alpha=0.05 two-sided / 80% power by the
      // standard normal approximation. The baseline comes from exact
      // integers; z quantiles are identical literals; ceil is
      // direction-deterministic. A planning operator — the answer the
      // data team needs BEFORE q293/q294 can ever be run.
      build = (s, dir) => {
        import s.implicits._
        val base = table(s, dir, "orders").agg(
          count(lit(1)).as("n_orders"),
          sum((col("o_orderpriority") === "1-URGENT").cast("long"))
            .as("n_urgent"))
        val mdes = Seq(0.01, 0.02, 0.05).toDF("mde")
        val za = lit(1.959963985)
        val zb = lit(0.8416212336)
        base.crossJoin(mdes)
          .withColumn("p1", col("n_urgent").cast("double")
            / col("n_orders"))
          .withColumn("p2", col("p1") + col("mde"))
          .withColumn("pbar", (col("p1") + col("p2")) / 2)
          .withColumn("n_per_arm", ceil(
            (za * sqrt(lit(2.0) * col("pbar") * (lit(1.0) - col("pbar")))
              + zb * sqrt(col("p1") * (lit(1.0) - col("p1"))
                + col("p2") * (lit(1.0) - col("p2"))))
            * (za * sqrt(lit(2.0) * col("pbar")
                * (lit(1.0) - col("pbar")))
              + zb * sqrt(col("p1") * (lit(1.0) - col("p1"))
                + col("p2") * (lit(1.0) - col("p2"))))
            / (col("mde") * col("mde"))))
          .select(col("mde"), round(col("p1"), 6).as("p_baseline"),
            round(col("p2"), 6).as("p_target"), col("n_per_arm"),
            col("n_orders"))
          .orderBy(col("mde"))
      },
      oracle = Some("""
        WITH base AS (
          SELECT count(*) AS n_orders,
            CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1
              ELSE 0 END) AS BIGINT) AS n_urgent
          FROM orders),
        mdes AS (SELECT CAST(unnest([0.01, 0.02, 0.05]) AS DOUBLE)
          AS mde),
        g AS (
          SELECT mde, n_orders,
            CAST(n_urgent AS DOUBLE) / n_orders AS p1,
            CAST(n_urgent AS DOUBLE) / n_orders + mde AS p2
          FROM base CROSS JOIN mdes),
        g2 AS (
          SELECT mde, n_orders, p1, p2, (p1 + p2) / 2 AS pbar
          FROM g)
        SELECT mde, round(p1, 6) AS p_baseline,
          round(p2, 6) AS p_target,
          CAST(ceil(
            (1.959963985 * sqrt(2.0 * pbar * (1.0 - pbar))
              + 0.8416212336 * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
            * (1.959963985 * sqrt(2.0 * pbar * (1.0 - pbar))
              + 0.8416212336 * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
            / (mde * mde)) AS BIGINT) AS n_per_arm,
          n_orders
        FROM g2
        ORDER BY mde""")),

    "q345_mann_kendall" -> Q(
      // Mann-Kendall trend test on monthly revenue — the nonparametric
      // "is there ANY monotone trend" standard (environmental
      // statistics' workhorse), rank-based where q139's Theil-Sen is
      // slope-based and q312 is model-based: S = sum of sign(y_j − y_i)
      // over ordered month pairs, tie-corrected variance, continuity-
      // corrected z. The pair frame is the bounded ~80-month
      // post-aggregation frame self-joined (≤3k pairs, broadcast);
      // signs compare EXACT decimals, so S and the tie groups are exact
      // integers and z is one double formula.
      build = (s, dir) => {
        val monthly = table(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
          .agg(sum(dec(col("o_totalprice"))).cast("decimal(20,2)")
            .as("y"))
          .select(((year(col("m")) - 1992) * 12 + month(col("m")) - 1)
            .as("mi"), col("y"))
        val a = monthly.select(col("mi").as("i"), col("y").as("yi"))
        val b = monthly.select(col("mi").as("j"), col("y").as("yj"))
        val sS = a.join(broadcast(b), col("i") < col("j"))
          .agg(sum(when(col("yj") > col("yi"), 1)
            .when(col("yj") < col("yi"), -1).otherwise(0)).as("s_stat"))
        val ties = monthly.groupBy(col("y"))
          .agg(count(lit(1)).as("t")).filter(col("t") > 1)
          .agg(coalesce(sum(col("t") * (col("t") - 1)
            * (col("t") * 2 + 5)), lit(0L)).as("tie_term"))
        val n = monthly.agg(count(lit(1)).as("nm"))
        sS.crossJoin(broadcast(ties)).crossJoin(broadcast(n))
          .withColumn("var_s", (col("nm") * (col("nm") - 1)
            * (col("nm") * 2 + 5) - col("tie_term")).cast("double")
            / 18)
          .select(col("nm").as("n_months"), col("s_stat"),
            round(col("var_s"), 4).as("var_s"),
            round(when(col("s_stat") > 0,
                (col("s_stat") - 1).cast("double") / sqrt(col("var_s")))
              .when(col("s_stat") < 0,
                (col("s_stat") + 1).cast("double") / sqrt(col("var_s")))
              .otherwise(lit(0.0)), 6).as("z"))
      },
      oracle = Some("""
        WITH monthly AS (
          SELECT (year(o_orderdate) - 1992) * 12 + month(o_orderdate)
              - 1 AS mi,
            CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DECIMAL(20,2)) AS y
          FROM orders GROUP BY date_trunc('month', o_orderdate),
            (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1),
        s_stat AS (
          SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
            WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
          FROM monthly a JOIN monthly b ON a.mi < b.mi),
        ties AS (
          SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
            AS BIGINT) AS tie_term
          FROM (SELECT count(*) AS t FROM monthly GROUP BY y
                HAVING count(*) > 1)),
        n AS (SELECT count(*) AS nm FROM monthly),
        v AS (
          SELECT nm, s_stat, tie_term,
            CAST(nm * (nm - 1) * (2 * nm + 5) - tie_term AS DOUBLE)
              / 18 AS var_s
          FROM s_stat CROSS JOIN ties CROSS JOIN n)
        SELECT nm AS n_months, s_stat, round(var_s, 4) AS var_s,
          round(CASE WHEN s_stat > 0
              THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
            WHEN s_stat < 0
              THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
            ELSE 0.0 END, 6) AS z
        FROM v""")),

    "q346_greenwood_bands" -> Q(
      // Greenwood 95% confidence bands for the q200 Kaplan-Meier curve
      // — the uncertainty every survival plot needs before anyone
      // compares arms: Var[S(t)] = S(t)² · cumsum d/(n(n−d)), bands
      // clamped to [0,1]. Same bounded distinct-duration machinery as
      // q200 (one day-level aggregate + cumulative windows on the
      // bounded frame, allowlisted); the Greenwood terms snap at 10
      // decimals into an exact cumulative sum, and the d = n_risk tail
      // (division by zero) yields NULL bands via identical guards.
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
          .withColumn("gwterm", when(col("d") < col("n_risk"),
              round(col("d").cast("double") / (col("n_risk")
                * (col("n_risk") - col("d"))), 10))
            .otherwise(lit(0.0)))
          .withColumn("gwsum",
            sum(col("gwterm").cast("decimal(24,10)")).over(wCum)
              .cast("double"))
          .withColumn("se", when(col("d") < col("n_risk"),
            round(col("surv") * sqrt(col("gwsum")), 8)))
          .select(col("dur").as("t_days"), col("n_risk"), col("d"),
            col("surv"), col("se"),
            round(greatest(col("surv") - lit(1.959963985) * col("se"),
              lit(0.0)), 8).as("ci_lo"),
            round(least(col("surv") + lit(1.959963985) * col("se"),
              lit(1.0)), 8).as("ci_hi"))
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
            CAST(CASE WHEN tp.dp IS NOT NULL THEN 1 ELSE 0 END
              AS BIGINT) AS ev
          FROM t0 LEFT JOIN tp ON tp.user_id = t0.user_id
          CROSS JOIN endd),
        day_agg AS (
          SELECT dur, CAST(sum(ev) AS BIGINT) AS d, count(*) AS cnt
          FROM durs GROUP BY 1),
        risk AS (
          SELECT dur, d,
            CAST((SELECT count(*) FROM durs) - coalesce(
              sum(cnt) OVER (ORDER BY dur
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_risk
          FROM day_agg),
        terms AS (
          SELECT dur, d, n_risk,
            CASE WHEN d < n_risk
              THEN round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 8)
              ELSE -99.0 END AS lnterm,
            CASE WHEN d < n_risk
              THEN round(CAST(d AS DOUBLE)
                / (n_risk * (n_risk - d)), 10)
              ELSE 0.0 END AS gwterm
          FROM risk WHERE d > 0),
        cum AS (
          SELECT dur, d, n_risk,
            round(exp(CAST(sum(CAST(lnterm AS DECIMAL(20,8)))
              OVER w AS DOUBLE)), 8) AS surv,
            CAST(sum(CAST(gwterm AS DECIMAL(24,10))) OVER w AS DOUBLE)
              AS gwsum
          FROM terms
          WINDOW w AS (ORDER BY dur
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        banded AS (
          SELECT dur, d, n_risk, surv,
            CASE WHEN d < n_risk
              THEN round(surv * sqrt(gwsum), 8) END AS se
          FROM cum)
        SELECT dur AS t_days, n_risk, d, surv, se,
          round(greatest(surv - 1.959963985 * se, 0.0), 8) AS ci_lo,
          round(least(surv + 1.959963985 * se, 1.0), 8) AS ci_hi
        FROM banded
        ORDER BY t_days""")),

    "q347_shift_share" -> Q(
      // Shift-share decomposition (Dunn 1960) of 1995→1996 regional
      // revenue growth into national-growth, industry-mix (priority
      // mix) and competitive components — the regional-economics
      // standard for "did the region grow because of WHAT it sells or
      // HOW it competes". Two scans reduce to the bounded 25-cell
      // (region × priority × year) frame; growth rates snap at 8 from
      // exact decimals; components fold through snapped decimal sums
      // so NS + IM + CE recomposes the actual change to the snap.
      build = (s, dir) => {
        val cells = table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .join(table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("o_orderpriority").as("ind"),
            year(col("o_orderdate")).as("yr"))
          .agg(sum(dec(col("o_totalprice"))).cast("decimal(20,2)")
            .as("rev"))
        val base = cells.filter(col("yr") === 1995)
          .select(col("r_name"), col("ind"), col("rev").as("b"))
        val cur = cells.filter(col("yr") === 1996)
          .select(col("r_name"), col("ind"), col("rev").as("c"))
        val ri = base.join(cur, Seq("r_name", "ind"))
          .withColumn("g_ri", round((col("c").cast("double")
            - col("b").cast("double")) / col("b").cast("double"), 8))
        val indG = ri.groupBy(col("ind"))
          .agg(sum(col("b")).cast("decimal(24,2)").as("bi"),
            sum(col("c")).cast("decimal(24,2)").as("ci"))
          .withColumn("g_i", round((col("ci").cast("double")
            - col("bi").cast("double")) / col("bi").cast("double"), 8))
          .select(col("ind"), col("g_i"))
        val nat = ri.agg(sum(col("b")).cast("decimal(26,2)").as("bn"),
            sum(col("c")).cast("decimal(26,2)").as("cn"))
          .select(round((col("cn").cast("double")
            - col("bn").cast("double")) / col("bn").cast("double"), 8)
            .as("g_n"))
        ri.join(broadcast(indG), Seq("ind"))
          .crossJoin(broadcast(nat))
          .groupBy(col("r_name"))
          .agg(
            sum(col("b")).cast("decimal(24,2)").as("base_rev"),
            round(sum(((col("c").cast("double")
              - col("b").cast("double"))).cast("decimal(24,6)"))
              .cast("double"), 2).as("actual_change"),
            round(sum((col("b").cast("double") * col("g_n"))
              .cast("decimal(24,6)")).cast("double"), 2).as("ns"),
            round(sum((col("b").cast("double")
              * (col("g_i") - col("g_n"))).cast("decimal(24,6)"))
              .cast("double"), 2).as("im"),
            round(sum((col("b").cast("double")
              * (col("g_ri") - col("g_i"))).cast("decimal(24,6)"))
              .cast("double"), 2).as("ce"))
          .select(col("r_name"),
            col("base_rev").cast("double").as("base_rev"),
            col("actual_change"), col("ns"), col("im"), col("ce"))
          .orderBy(col("r_name"))
      },
      oracle = Some("""
        WITH cells AS (
          SELECT r_name, o_orderpriority AS ind,
            year(o_orderdate) AS yr,
            CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DECIMAL(20,2)) AS rev
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate < TIMESTAMP '1997-01-01'
          GROUP BY 1, 2, 3),
        ri AS (
          SELECT b.r_name, b.ind, b.rev AS b, c.rev AS c,
            round((CAST(c.rev AS DOUBLE) - CAST(b.rev AS DOUBLE))
              / CAST(b.rev AS DOUBLE), 8) AS g_ri
          FROM (SELECT * FROM cells WHERE yr = 1995) b
          JOIN (SELECT * FROM cells WHERE yr = 1996) c
            USING (r_name, ind)),
        ind_g AS (
          SELECT ind,
            round((CAST(CAST(sum(c) AS DECIMAL(24,2)) AS DOUBLE)
              - CAST(CAST(sum(b) AS DECIMAL(24,2)) AS DOUBLE))
              / CAST(CAST(sum(b) AS DECIMAL(24,2)) AS DOUBLE), 8)
              AS g_i
          FROM ri GROUP BY 1),
        nat AS (
          SELECT round((CAST(CAST(sum(c) AS DECIMAL(26,2)) AS DOUBLE)
            - CAST(CAST(sum(b) AS DECIMAL(26,2)) AS DOUBLE))
            / CAST(CAST(sum(b) AS DECIMAL(26,2)) AS DOUBLE), 8) AS g_n
          FROM ri)
        SELECT r_name,
          CAST(CAST(sum(b) AS DECIMAL(24,2)) AS DOUBLE) AS base_rev,
          round(CAST(sum(CAST(CAST(c AS DOUBLE) - CAST(b AS DOUBLE)
            AS DECIMAL(24,6))) AS DOUBLE), 2) AS actual_change,
          round(CAST(sum(CAST(CAST(b AS DOUBLE) * g_n
            AS DECIMAL(24,6))) AS DOUBLE), 2) AS ns,
          round(CAST(sum(CAST(CAST(b AS DOUBLE) * (g_i - g_n)
            AS DECIMAL(24,6))) AS DOUBLE), 2) AS im,
          round(CAST(sum(CAST(CAST(b AS DOUBLE) * (g_ri - g_i)
            AS DECIMAL(24,6))) AS DOUBLE), 2) AS ce
        FROM ri JOIN ind_g USING (ind) CROSS JOIN nat
        GROUP BY r_name
        ORDER BY r_name""")),

    "q348_price_index" -> Q(
      // Laspeyres / Paasche / Fisher price indices for 1995→1996 on
      // per-part unit prices — index-number theory as a query: the
      // deflator machinery every revenue time series needs before
      // "growth" claims. Per-part-year unit price is an exact-decimal
      // ratio snapped at 6; the four basket sums (p1q0, p0q0, p1q1,
      // p0q1) are exact decimal products of snapped prices and integer-
      // quantity sums; the three indices are fixed double formulas.
      // Only parts traded in BOTH years enter (the matched-model rule,
      // stated).
      build = (s, dir) => {
        val py = table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(col("l_partkey"), year(col("l_shipdate")).as("yr"))
          .agg(sum(dec(col("l_extendedprice"))).cast("decimal(20,2)")
            .as("ext"),
            sum(col("l_quantity").cast("decimal(12,2)"))
              .cast("decimal(16,2)").as("qty"))
          .withColumn("p", round(col("ext").cast("double")
            / col("qty").cast("double"), 6).cast("decimal(16,6)"))
        val y0 = py.filter(col("yr") === 1995)
          .select(col("l_partkey"), col("p").as("p0"),
            col("qty").as("q0"))
        val y1 = py.filter(col("yr") === 1996)
          .select(col("l_partkey"), col("p").as("p1"),
            col("qty").as("q1"))
        val m = y0.join(y1, Seq("l_partkey"))
          .agg(count(lit(1)).as("n_parts"),
            sum((col("p1") * col("q0")).cast("decimal(30,8)"))
              .as("p1q0"),
            sum((col("p0") * col("q0")).cast("decimal(30,8)"))
              .as("p0q0"),
            sum((col("p1") * col("q1")).cast("decimal(30,8)"))
              .as("p1q1"),
            sum((col("p0") * col("q1")).cast("decimal(30,8)"))
              .as("p0q1"))
        m.select(col("n_parts"),
            (col("p1q0").cast("double") / col("p0q0").cast("double"))
              .as("laspeyres"),
            (col("p1q1").cast("double") / col("p0q1").cast("double"))
              .as("paasche"))
          .select(col("n_parts"),
            round(col("laspeyres"), 6).as("laspeyres"),
            round(col("paasche"), 6).as("paasche"),
            round(sqrt(col("laspeyres") * col("paasche")), 6)
              .as("fisher"))
      },
      oracle = Some("""
        WITH py AS (
          SELECT l_partkey, year(l_shipdate) AS yr,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
              AS DECIMAL(20,2)) AS ext,
            CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
              AS DECIMAL(16,2)) AS qty
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY 1, 2),
        priced AS (
          SELECT l_partkey, yr, qty,
            CAST(round(CAST(ext AS DOUBLE) / CAST(qty AS DOUBLE), 6)
              AS DECIMAL(16,6)) AS p
          FROM py),
        m AS (
          SELECT count(*) AS n_parts,
            sum(CAST(CAST(y1.p AS DECIMAL(19,6)) * y0.qty
              AS DECIMAL(30,8))) AS p1q0,
            sum(CAST(CAST(y0.p AS DECIMAL(19,6)) * y0.qty
              AS DECIMAL(30,8))) AS p0q0,
            sum(CAST(CAST(y1.p AS DECIMAL(19,6)) * y1.qty
              AS DECIMAL(30,8))) AS p1q1,
            sum(CAST(CAST(y0.p AS DECIMAL(19,6)) * y1.qty
              AS DECIMAL(30,8))) AS p0q1
          FROM (SELECT * FROM priced WHERE yr = 1995) y0
          JOIN (SELECT * FROM priced WHERE yr = 1996) y1
            USING (l_partkey)),
        idx AS (
          SELECT n_parts,
            CAST(p1q0 AS DOUBLE) / CAST(p0q0 AS DOUBLE) AS laspeyres,
            CAST(p1q1 AS DOUBLE) / CAST(p0q1 AS DOUBLE) AS paasche
          FROM m)
        SELECT n_parts, round(laspeyres, 6) AS laspeyres,
          round(paasche, 6) AS paasche,
          round(sqrt(laspeyres * paasche), 6) AS fisher
        FROM idx""")),

    "q349_chao1_richness" -> Q(
      // Chao1 richness estimator (Chao 1984): how many vocabulary types
      // the corpus HASN'T shown yet, from singleton/doubleton counts —
      // the unseen-species bound that pairs with q309's Good-Turing
      // unseen MASS and q321's Heaps growth curve. One term-count scan,
      // then pure arithmetic on three exact integers (S_obs, F1, F2),
      // with the bias-corrected form and Chao's variance as fixed
      // double formulas.
      build = (s, dir) => {
        val counts = table(s, dir, "documents")
          .select(explode(split(trim(col("text")), "\\s+")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("r"))
        val m = counts.agg(count(lit(1)).as("s_obs"),
          sum((col("r") === 1).cast("long")).as("f1"),
          sum((col("r") === 2).cast("long")).as("f2"))
        def d(c: String): Column = col(c).cast("double")
        m.select(col("s_obs"), col("f1"), col("f2"),
          round(d("s_obs") + d("f1") * (d("f1") - 1)
            / (lit(2.0) * (d("f2") + 1)), 4).as("chao1"),
          round((d("f1") * (d("f1") - 1) / (lit(2.0) * (d("f2") + 1)))
            + (d("f1") * (lit(2.0) * d("f1") - 1)
              * (lit(2.0) * d("f1") - 1))
              / (lit(4.0) * (d("f2") + 1) * (d("f2") + 1))
            + (d("f1") * d("f1") * d("f2")
              * (d("f1") - 1) * (d("f1") - 1))
              / (lit(4.0) * (d("f2") + 1) * (d("f2") + 1)
                * (d("f2") + 1) * (d("f2") + 1)), 4).as("var_chao1"))
      },
      oracle = Some("""
        WITH counts AS (
          SELECT w, count(*) AS r
          FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
                  AS w FROM documents)
          GROUP BY 1),
        m AS (
          SELECT count(*) AS s_obs,
            CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS f1,
            CAST(sum(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT)
              AS f2
          FROM counts),
        md AS (
          SELECT s_obs, f1, f2,
            CAST(s_obs AS DOUBLE) AS sd, CAST(f1 AS DOUBLE) AS f1d,
            CAST(f2 AS DOUBLE) AS f2d
          FROM m)
        SELECT s_obs, f1, f2,
          round(sd + f1d * (f1d - 1) / (2.0 * (f2d + 1)), 4) AS chao1,
          round((f1d * (f1d - 1) / (2.0 * (f2d + 1)))
            + (f1d * (2.0 * f1d - 1) * (2.0 * f1d - 1))
              / (4.0 * (f2d + 1) * (f2d + 1))
            + (f1d * f1d * f2d * (f1d - 1) * (f1d - 1))
              / (4.0 * (f2d + 1) * (f2d + 1) * (f2d + 1) * (f2d + 1)),
            4) AS var_chao1
        FROM md""")),

    "q350_odds_ratio" -> Q(
      // Odds ratio with the Woolf logit 95% CI for every market
      // segment vs the rest, outcome = has an urgent order — the
      // epidemiology-standard effect size q111's chi-square only tests
      // and q337's panel doesn't interval-ize. One conditional scan
      // per... no: ONE scan builds all five 2x2 tables simultaneously
      // (segment grid vs broadcast totals by moment subtraction); OR,
      // ln OR and the CI are fixed double formulas on exact integers,
      // with the Haldane-Anscombe +0.5 correction applied identically
      // when any cell is zero.
      build = (s, dir) => {
        val lbl = table(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")).distinct().withColumn("y", lit(1))
        val c = table(s, dir, "customer")
          .join(lbl, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_mktsegment"), coalesce(col("y"), lit(0)).as("y"))
        val per = c.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_g"), sum(col("y")).as("pos_g"))
        val tot = per.agg(sum(col("n_g")).as("nn"),
          sum(col("pos_g")).as("pp"))
        val cells = per.crossJoin(broadcast(tot))
          .select(col("c_mktsegment"),
            col("pos_g").as("a"), (col("n_g") - col("pos_g")).as("b"),
            (col("pp") - col("pos_g")).as("cc"),
            (col("nn") - col("n_g") - col("pp") + col("pos_g"))
              .as("dd"))
          .withColumn("corr", when(col("a") === 0 || col("b") === 0
            || col("cc") === 0 || col("dd") === 0, 0.5).otherwise(0.0))
        def ad(c0: String): Column = col(c0).cast("double") + col("corr")
        val scored = cells
          .withColumn("or_", (ad("a") * ad("dd"))
            / (ad("b") * ad("cc")))
          .withColumn("se_ln", sqrt(lit(1.0) / ad("a") + lit(1.0)
            / ad("b") + lit(1.0) / ad("cc") + lit(1.0) / ad("dd")))
        scored.select(col("c_mktsegment"), col("a"), col("b"),
            col("cc").as("c"), col("dd").as("d"),
            round(col("or_"), 6).as("odds_ratio"),
            round(exp(log(col("or_")) - lit(1.959963985)
              * col("se_ln")), 6).as("ci_lo"),
            round(exp(log(col("or_")) + lit(1.959963985)
              * col("se_ln")), 6).as("ci_hi"))
          .orderBy(col("c_mktsegment"))
      },
      oracle = Some("""
        WITH lbl AS (
          SELECT DISTINCT o_custkey, 1 AS y
          FROM orders WHERE o_orderpriority = '1-URGENT'),
        c AS (
          SELECT c_mktsegment, coalesce(y, 0) AS y
          FROM customer LEFT JOIN lbl ON c_custkey = o_custkey),
        per AS (
          SELECT c_mktsegment, count(*) AS n_g,
            CAST(sum(y) AS BIGINT) AS pos_g
          FROM c GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n_g) AS BIGINT) AS nn,
            CAST(sum(pos_g) AS BIGINT) AS pp
          FROM per),
        cells AS (
          SELECT c_mktsegment, pos_g AS a, n_g - pos_g AS b,
            pp - pos_g AS cc, nn - n_g - pp + pos_g AS dd,
            CASE WHEN pos_g = 0 OR n_g - pos_g = 0
              OR pp - pos_g = 0 OR nn - n_g - pp + pos_g = 0
              THEN 0.5 ELSE 0.0 END AS corr
          FROM per CROSS JOIN tot),
        scored AS (
          SELECT c_mktsegment, a, b, cc, dd,
            ((CAST(a AS DOUBLE) + corr) * (CAST(dd AS DOUBLE) + corr))
              / ((CAST(b AS DOUBLE) + corr)
                * (CAST(cc AS DOUBLE) + corr)) AS or_,
            sqrt(1.0 / (CAST(a AS DOUBLE) + corr)
              + 1.0 / (CAST(b AS DOUBLE) + corr)
              + 1.0 / (CAST(cc AS DOUBLE) + corr)
              + 1.0 / (CAST(dd AS DOUBLE) + corr)) AS se_ln
          FROM cells)
        SELECT c_mktsegment, a, b, cc AS c, dd AS d,
          round(or_, 6) AS odds_ratio,
          round(exp(ln(or_) - 1.959963985 * se_ln), 6) AS ci_lo,
          round(exp(ln(or_) + 1.959963985 * se_ln), 6) AS ci_hi
        FROM scored
        ORDER BY c_mktsegment""")),

    "q351_fleiss_kappa" -> Q(
      // Fleiss' kappa for THREE binary "raters" per customer (above-
      // median balance, has-urgent-order, BUILDING segment) — the
      // inter-rater agreement statistic behind every labeling-quality
      // audit, exercised on deterministic rule-raters. One scan tags
      // all three rules; agreement reduces to the bounded 4-row
      // positive-count histogram (N_k for k=0..3) of exact integers;
      // P-bar, P_e and kappa are fixed double formulas. The median
      // rater interpolates in double on both engines (q320 rule).
      build = (s, dir) => {
        val gm = table(s, dir, "customer")
          .agg(expr("percentile(c_acctbal, 0.5)").as("med"))
        val urgent = table(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")).distinct().withColumn("u", lit(1))
        val tagged = table(s, dir, "customer")
          .join(urgent, col("c_custkey") === col("o_custkey"), "left")
          .crossJoin(broadcast(gm))
          .select(((col("c_acctbal") > col("med")).cast("int")
            + coalesce(col("u"), lit(0))
            + (col("c_mktsegment") === "BUILDING").cast("int"))
            .as("k"))
        val hist = tagged.groupBy(col("k"))
          .agg(count(lit(1)).as("n_k"))
        val m = hist.agg(sum(col("n_k")).as("nn"),
          sum(col("k") * col("n_k")).as("spos"),
          sum((col("k") * (col("k") - 1)
            + (lit(3) - col("k")) * (lit(2) - col("k"))) * col("n_k"))
            .as("agree_num"))
        val stats = m.select(col("nn"),
            (col("agree_num").cast("double") / (col("nn") * 6))
              .as("p_bar"),
            (col("spos").cast("double") / (col("nn") * 3)).as("p_pos"))
          .select(col("nn"), col("p_bar"), col("p_pos"),
            (col("p_pos") * col("p_pos") + (lit(1.0) - col("p_pos"))
              * (lit(1.0) - col("p_pos"))).as("p_e"))
          .select(col("nn").as("n_items"),
            round(col("p_bar"), 6).as("p_observed"),
            round(col("p_e"), 6).as("p_expected"),
            round((col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e")),
              6).as("fleiss_kappa"))
        hist.crossJoin(broadcast(stats))
          .select(col("k"), col("n_k"), col("n_items"),
            col("p_observed"), col("p_expected"), col("fleiss_kappa"))
          .orderBy(col("k"))
      },
      oracle = Some("""
        WITH gm AS (
          SELECT quantile_cont(c_acctbal, 0.5) AS med FROM customer),
        urgent AS (
          SELECT DISTINCT o_custkey, 1 AS u
          FROM orders WHERE o_orderpriority = '1-URGENT'),
        tagged AS (
          SELECT (CASE WHEN c_acctbal > med THEN 1 ELSE 0 END)
            + coalesce(u, 0)
            + (CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
            AS k
          FROM customer LEFT JOIN urgent ON c_custkey = o_custkey
          CROSS JOIN gm),
        hist AS (SELECT k, count(*) AS n_k FROM tagged GROUP BY 1),
        m AS (
          SELECT CAST(sum(n_k) AS BIGINT) AS nn,
            CAST(sum(k * n_k) AS BIGINT) AS spos,
            CAST(sum((k * (k - 1) + (3 - k) * (2 - k)) * n_k)
              AS BIGINT) AS agree_num
          FROM hist),
        st AS (
          SELECT nn,
            CAST(agree_num AS DOUBLE) / (nn * 6) AS p_bar,
            CAST(spos AS DOUBLE) / (nn * 3) AS p_pos
          FROM m),
        st2 AS (
          SELECT nn, p_bar, p_pos,
            p_pos * p_pos + (1.0 - p_pos) * (1.0 - p_pos) AS p_e
          FROM st)
        SELECT k, n_k, nn AS n_items,
          round(p_bar, 6) AS p_observed,
          round(p_e, 6) AS p_expected,
          round((p_bar - p_e) / (1.0 - p_e), 6) AS fleiss_kappa
        FROM hist CROSS JOIN st2
        ORDER BY k""")),

    "q352_cronbach_alpha" -> Q(
      // Cronbach's alpha internal-consistency coefficient for the same
      // three binary indicators — do the "affluent customer" signals
      // hang together as a scale? Population item variances come from
      // exact marginals, the total-score variance from the bounded
      // 4-row score histogram (all exact integers), and alpha =
      // (k/(k-1))(1 − Σvar_i/var_T) is one double formula. Reliability
      // analysis as a two-aggregate query.
      build = (s, dir) => {
        val gm = table(s, dir, "customer")
          .agg(expr("percentile(c_acctbal, 0.5)").as("med"))
        val urgent = table(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")).distinct().withColumn("u", lit(1))
        val items = table(s, dir, "customer")
          .join(urgent, col("c_custkey") === col("o_custkey"), "left")
          .crossJoin(broadcast(gm))
          .select((col("c_acctbal") > col("med")).cast("long").as("i1"),
            coalesce(col("u"), lit(0)).cast("long").as("i2"),
            (col("c_mktsegment") === "BUILDING").cast("long").as("i3"))
        val m = items.agg(count(lit(1)).as("nn"),
          sum(col("i1")).as("s1"), sum(col("i2")).as("s2"),
          sum(col("i3")).as("s3"),
          sum((col("i1") + col("i2") + col("i3"))
            * (col("i1") + col("i2") + col("i3"))).as("stt"),
          sum(col("i1") + col("i2") + col("i3")).as("st"))
        def d(c: String): Column = col(c).cast("double")
        val v = m.select(col("nn"),
          (d("s1") / col("nn") * (lit(1.0) - d("s1") / col("nn"))
            + d("s2") / col("nn") * (lit(1.0) - d("s2") / col("nn"))
            + d("s3") / col("nn") * (lit(1.0) - d("s3") / col("nn")))
            .as("sum_var_items"),
          (d("stt") / col("nn") - d("st") / col("nn") * (d("st")
            / col("nn"))).as("var_total"))
        v.select(col("nn").as("n_items_scored"),
          round(col("sum_var_items"), 6).as("sum_var_items"),
          round(col("var_total"), 6).as("var_total"),
          round(lit(1.5) * (lit(1.0) - col("sum_var_items")
            / col("var_total")), 6).as("cronbach_alpha"))
      },
      oracle = Some("""
        WITH gm AS (
          SELECT quantile_cont(c_acctbal, 0.5) AS med FROM customer),
        urgent AS (
          SELECT DISTINCT o_custkey, 1 AS u
          FROM orders WHERE o_orderpriority = '1-URGENT'),
        items AS (
          SELECT CASE WHEN c_acctbal > med THEN 1 ELSE 0 END AS i1,
            coalesce(u, 0) AS i2,
            CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS i3
          FROM customer LEFT JOIN urgent ON c_custkey = o_custkey
          CROSS JOIN gm),
        m AS (
          SELECT count(*) AS nn,
            CAST(sum(i1) AS BIGINT) AS s1,
            CAST(sum(i2) AS BIGINT) AS s2,
            CAST(sum(i3) AS BIGINT) AS s3,
            CAST(sum((i1 + i2 + i3) * (i1 + i2 + i3)) AS BIGINT)
              AS stt,
            CAST(sum(i1 + i2 + i3) AS BIGINT) AS st
          FROM items),
        v AS (
          SELECT nn,
            CAST(s1 AS DOUBLE) / nn * (1.0 - CAST(s1 AS DOUBLE) / nn)
              + CAST(s2 AS DOUBLE) / nn
                * (1.0 - CAST(s2 AS DOUBLE) / nn)
              + CAST(s3 AS DOUBLE) / nn
                * (1.0 - CAST(s3 AS DOUBLE) / nn) AS sum_var_items,
            CAST(stt AS DOUBLE) / nn - CAST(st AS DOUBLE) / nn
              * (CAST(st AS DOUBLE) / nn) AS var_total
          FROM m)
        SELECT nn AS n_items_scored,
          round(sum_var_items, 6) AS sum_var_items,
          round(var_total, 6) AS var_total,
          round(1.5 * (1.0 - sum_var_items / var_total), 6)
            AS cronbach_alpha
        FROM v""")),

  )

  /** q316's oracle: three IPF sweeps unrolled as generated CTEs (row
    * half-sweep then column half-sweep per round), each half-sweep
    * snapping the weight to DECIMAL(20,8) exactly like the Spark build.
    * `lazy` is load-bearing — referenced from `all`. */
  private lazy val ipfRakingOracle: String = {
    val sweeps = (1 to 3).map { i =>
      val prev = if (i == 1) "w0" else s"w${i - 1}"
      s"""r$i AS (SELECT seg, sum(w) AS sw FROM $prev GROUP BY seg),
        wr$i AS (SELECT p.seg, p.reg, p.n, p.nn,
          CAST(round(CAST(p.w AS DOUBLE) * (CAST(p.nn AS DOUBLE) / 5.0)
            / CAST(r.sw AS DOUBLE), 8) AS DECIMAL(20,8)) AS w
          FROM $prev p JOIN r$i r USING (seg)),
        c$i AS (SELECT reg, sum(w) AS sw FROM wr$i GROUP BY reg),
        w$i AS (SELECT p.seg, p.reg, p.n, p.nn,
          CAST(round(CAST(p.w AS DOUBLE) * (CAST(p.nn AS DOUBLE) / 5.0)
            / CAST(c.sw AS DOUBLE), 8) AS DECIMAL(20,8)) AS w
          FROM wr$i p JOIN c$i c USING (reg))"""
    }.mkString(",\n        ")
    s"""
        WITH cells AS (
          SELECT c_mktsegment AS seg, r_name AS reg, count(*) AS n
          FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
        w0 AS (
          SELECT seg, reg, n, nn, CAST(n AS DECIMAL(20,8)) AS w
          FROM cells CROSS JOIN tot),
        $sweeps
        SELECT seg, reg, n, CAST(w AS DOUBLE) AS w_raked
        FROM w3 ORDER BY seg, reg"""
  }

  /** q338's oracle: Hunter's MM iteration unrolled six times as
    * generated CTEs, with the identical DECIMAL(20,10) term snap,
    * 8-decimal theta snap and sum-normalization as the Spark build.
    * `lazy` — referenced from `all`. */
  private lazy val bradleyTerryOracle: String = {
    val iters = (1 to 6).map { k =>
      val prev = s"it${k - 1}"
      s"""d$k AS MATERIALIZED (
          SELECT p.i,
            sum(CAST(CAST(p.n AS DOUBLE)
              / CAST(t.theta + t2.theta AS DOUBLE) AS DECIMAL(20,10)))
              AS den
          FROM pairs p
          JOIN $prev t ON t.i = p.i
          JOIN $prev t2 ON t2.i = p.j
          GROUP BY 1),
        r$k AS MATERIALIZED (
          SELECT d.i,
            CAST(round(CAST(w.wi AS DOUBLE) / CAST(d.den AS DOUBLE), 8)
              AS DECIMAL(16,8)) AS traw
          FROM d$k d JOIN wi w ON w.i = d.i),
        s$k AS MATERIALIZED (
          SELECT CAST(sum(traw) AS DECIMAL(20,8)) AS tot FROM r$k),
        it$k AS MATERIALIZED (
          SELECT i, CAST(round(5.0 * CAST(traw AS DOUBLE)
            / CAST(tot AS DOUBLE), 8) AS DECIMAL(12,8)) AS theta
          FROM r$k CROSS JOIN s$k)"""
    }.mkString(",\n        ")
    s"""
        WITH cell AS MATERIALIZED (
          SELECT date_trunc('month', o_orderdate) AS m, o_orderpriority,
            ${sqlMsum("o_totalprice")} AS rev
          FROM orders GROUP BY 1, 2),
        full_m AS (SELECT m FROM cell GROUP BY m HAVING count(*) = 5),
        c2 AS (SELECT c.* FROM cell c JOIN full_m USING (m)),
        wins AS MATERIALIZED (
          SELECT a.o_orderpriority AS i, b.o_orderpriority AS j,
            CAST(sum(CASE WHEN a.rev > b.rev THEN 1 ELSE 0 END)
              AS BIGINT) AS w
          FROM c2 a JOIN c2 b ON a.m = b.m
            AND a.o_orderpriority <> b.o_orderpriority
          GROUP BY 1, 2),
        pairs AS MATERIALIZED (
          SELECT w1.i, w1.j, w1.w + w2.w AS n
          FROM wins w1 JOIN wins w2 ON w1.i = w2.j AND w1.j = w2.i
          WHERE w1.w + w2.w > 0),
        wi AS MATERIALIZED (
          SELECT i, CAST(sum(w) AS BIGINT) AS wi FROM wins GROUP BY 1),
        it0 AS MATERIALIZED (
          SELECT i, CAST(1.0 AS DECIMAL(12,8)) AS theta FROM wi),
        $iters
        SELECT t.i AS o_orderpriority, w.wi AS n_wins,
          CAST(t.theta AS DOUBLE) AS bt_strength
        FROM it6 t JOIN wi w ON w.i = t.i
        ORDER BY o_orderpriority"""
  }

  /** q322's oracle: the OLS start plus three IRLS reweighting steps
    * unrolled as generated CTEs, with the identical 6/4-decimal snap
    * points as the Spark build. `lazy` — referenced from `all`. */
  private lazy val huberOracle: String = {
    val steps = (1 to 3).map { i =>
      val f = s"f${i - 1}"
      s"""s$i AS (
          SELECT d.x, d.y, f.k,
            CASE WHEN abs(d.y - f.a - f.b * d.x) <= f.k
              THEN CAST(1.0 AS DECIMAL(5,4))
              ELSE CAST(round(f.k / abs(d.y - f.a - f.b * d.x), 4)
                AS DECIMAL(5,4)) END AS w
          FROM daily d CROSS JOIN $f f),
        m$i AS (
          SELECT CAST(sum(w) AS DECIMAL(14,4)) AS sw,
            CAST(sum(w * x) AS DECIMAL(18,4)) AS swx,
            CAST(sum(w * y) AS DECIMAL(20,4)) AS swy,
            CAST(sum(w * x * y) AS DECIMAL(24,4)) AS swxy,
            CAST(sum(w * x * x) AS DECIMAL(20,4)) AS swxx,
            max(k) AS k
          FROM s$i),
        f${i}a AS (
          SELECT sw, swx, swy, swxx, swxy, k,
            round((CAST(swxy AS DOUBLE) - CAST(swx AS DOUBLE)
                * CAST(swy AS DOUBLE) / CAST(sw AS DOUBLE))
              / (CAST(swxx AS DOUBLE) - CAST(swx AS DOUBLE)
                * CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE)), 6) AS b
          FROM m$i),
        f$i AS (
          SELECT k, sw, b,
            round((CAST(swy AS DOUBLE) - b * CAST(swx AS DOUBLE))
              / CAST(sw AS DOUBLE), 6) AS a
          FROM f${i}a)"""
    }.mkString(",\n        ")
    val tails = (1 to 3).map { i =>
      s"""UNION ALL SELECT $i, a, b, k, round(CAST(sw AS DOUBLE), 4)
          FROM f$i"""
    }.mkString("\n        ")
    s"""
        WITH daily AS (
          SELECT date_diff('day', DATE '1995-01-01',
              CAST(o_orderdate AS DATE)) AS x,
            CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DOUBLE) / 1000.0) AS BIGINT) AS y
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate < TIMESTAMP '1996-01-01'
          GROUP BY CAST(o_orderdate AS DATE)),
        m0 AS (
          SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
            CAST(sum(y) AS BIGINT) AS sy,
            CAST(sum(x * y) AS BIGINT) AS sxy,
            CAST(sum(x * x) AS BIGINT) AS sxx,
            CAST(sum(y * y) AS BIGINT) AS syy
          FROM daily),
        f0a AS (
          SELECT n, sx, sy, sxy, sxx, syy,
            round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sy AS DOUBLE) / n)
              / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sx AS DOUBLE) / n), 6) AS b
          FROM m0),
        f0 AS (
          SELECT n, b,
            round((CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / n, 6)
              AS a,
            round(1.345 * sqrt(
              ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                  * CAST(sy AS DOUBLE) / n)
                - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sy AS DOUBLE) / n)
                  * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sy AS DOUBLE) / n)
                  / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sx AS DOUBLE) / n)) / n), 4) AS k
          FROM f0a),
        $steps
        SELECT CAST(0 AS INTEGER) AS step, a, b, k,
          round(CAST(n AS DOUBLE), 4) AS total_w FROM f0
        $tails
        ORDER BY step"""
  }

  /** q267's battery: ONE ANSI text executed by BOTH engines (spark.sql on
    * temp views; DuckDB on the parquet views) — correlated-subquery
    * decorrelation parity. The "above nation average" probe compares in
    * exact decimal (bal·count > sum) instead of against a float avg,
    * whose last-ulp combine-order difference could flip a boundary row.
    * `lazy` is load-bearing — referenced from `all`. */
  private lazy val correlatedBatterySql: String = """
    SELECT 'exists_urgent' AS op, count(*) AS n FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT 'not_exists_big', count(*) FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    UNION ALL
    SELECT 'scalar_above_nation_avg', count(*) FROM customer c
    WHERE CAST(c.c_acctbal AS DECIMAL(19,2)) *
          (SELECT count(*) FROM customer c2
           WHERE c2.c_nationkey = c.c_nationkey)
        > (SELECT CAST(sum(CAST(c3.c_acctbal AS DECIMAL(19,2)))
                  AS DECIMAL(30,2))
           FROM customer c3 WHERE c3.c_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'in_deep_debt_nations', count(*) FROM nation n
    WHERE n.n_nationkey IN (SELECT c_nationkey FROM customer
                            WHERE c_acctbal < -900)
    ORDER BY op"""

  /** q254's oracle: the greedy max-coverage sweep unrolled to 6 rounds.
    * Generated by loop because each round is the same two CTEs (top-1
    * winner, then anti-join the winner's shingles out of the remaining
    * pair frame); every multi-referenced CTE is MATERIALIZED. `lazy` is
    * load-bearing — referenced from `all`. */
  private lazy val coverageOracle: String = {
    val rounds = 6
    val sb = new StringBuilder
    sb ++= """WITH toks AS MATERIALIZED (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
    rem0 AS MATERIALIZED (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t) - 2),
          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
        FROM toks))"""
    for (r <- 1 to rounds) {
      sb ++= s""",
    w$r AS MATERIALIZED (
      SELECT doc_id, count(*) AS g FROM rem${r - 1}
      GROUP BY 1 ORDER BY g DESC, doc_id LIMIT 1)"""
      if (r < rounds) sb ++= s""",
    rem$r AS MATERIALIZED (
      SELECT a.doc_id, a.s FROM rem${r - 1} a
      WHERE a.s NOT IN (SELECT b.s FROM rem${r - 1} b JOIN w$r USING (doc_id)))"""
    }
    sb ++= (1 to rounds).map(r =>
      s"SELECT $r AS round, doc_id, CAST(g AS BIGINT) AS gain FROM w$r")
      .mkString("\n    ", "\n    UNION ALL ", "")
    sb ++= "\n    ORDER BY round"
    sb.toString
  }

  /** q301's oracle: eight Newton-Raphson steps of the grouped-data
    * logistic fit (Platt scaling) unrolled as generated CTE pairs —
    * moments m{k} over the 10-bin frame, then parameter update it{k} —
    * mirroring the Spark loop's snapped-decimal moments and the 8-decimal
    * parameter snap per step. `lazy` is load-bearing — referenced from
    * `all`. */
  private lazy val plattOracle: String = {
    val iters = 8
    val sb = new StringBuilder
    sb ++= s"""WITH mm AS (
      SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
    bins AS MATERIALIZED (
      SELECT least(CAST(floor((o_totalprice - mn) / (mx - mn) * 10)
          AS BIGINT), 9) AS bin,
        count(*) AS n,
        CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
          AS BIGINT) AS pos,
        ${graft.functions.Stable.sqlDavg("(o_totalprice - mn) / (mx - mn)")}
          AS c
      FROM orders, mm GROUP BY 1),
    it0 AS (SELECT 0.0 AS a, 0.0 AS b)"""
    for (k <- 1 to iters) {
      sb ++= s""",
    m$k AS (
      SELECT a, b,
        CAST(sum(CAST(round((pos - n * p) * c, 6) AS DECIMAL(18,6)))
          AS DOUBLE) AS g1,
        CAST(sum(CAST(round(pos - n * p, 6) AS DECIMAL(18,6)))
          AS DOUBLE) AS g2,
        CAST(sum(CAST(round(n * p * (1.0 - p) * c * c, 6)
          AS DECIMAL(18,6))) AS DOUBLE) AS h11,
        CAST(sum(CAST(round(n * p * (1.0 - p) * c, 6) AS DECIMAL(18,6)))
          AS DOUBLE) AS h12,
        CAST(sum(CAST(round(n * p * (1.0 - p), 6) AS DECIMAL(18,6)))
          AS DOUBLE) AS h22
      FROM (SELECT a, b, n, pos, c,
              round(1.0 / (1.0 + exp(-(a * c + b))), 8) AS p
            FROM bins CROSS JOIN it${k - 1})
      GROUP BY a, b),
    it$k AS (
      SELECT round(a + (g1 * h22 - g2 * h12)
          / (h11 * h22 - h12 * h12), 8) AS a,
        round(b + (g2 * h11 - g1 * h12)
          / (h11 * h22 - h12 * h12), 8) AS b
      FROM m$k)"""
    }
    sb ++= s"""
    SELECT CAST(sum(n) AS BIGINT) AS n, a, b,
      round(CAST(sum(CAST(round(-(pos * ln(c) + (n - pos) * ln(1.0 - c)), 4)
        AS DECIMAL(20,4))) AS DOUBLE), 4) AS ll_before,
      round(CAST(sum(CAST(round(-(pos * ln(p) + (n - pos) * ln(1.0 - p)), 4)
        AS DECIMAL(20,4))) AS DOUBLE), 4) AS ll_after
    FROM (SELECT a, b, n, pos, c,
            round(1.0 / (1.0 + exp(-(a * c + b))), 8) AS p
          FROM bins CROSS JOIN it$iters)
    GROUP BY a, b"""
    sb.toString
  }

  /** Shared CTE body computing per-document 60-bit simhash sketches (used
    * by the q29/q47 oracles; `lazy` is load-bearing — referenced from
    * `all`, which is initialized above these definitions). */
  private lazy val simhashCtes: String = """toks AS (
      SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\s+')) AS t
      FROM documents),
    th AS (
      SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)),
    votes AS (
      SELECT doc_id, bit,
        sum(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
      FROM th
      CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS bit) bits
      GROUP BY doc_id, bit),
    sk AS (
      SELECT doc_id,
        CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
      FROM votes
      GROUP BY doc_id)"""

  /** Shared CTE body computing exact word-3-gram Jaccard pairs (used by
    * q27/q28/q35 oracles; `lazy` is load-bearing — referenced from `all`,
    * which is initialized above these definitions). */
  private lazy val ngramPairCtes: String = """toks AS MATERIALIZED (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
    sh AS MATERIALIZED (
      SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks),
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(a.s) > 0 AND len(b.s) > 0)"""

  /** Shared oracle for q194 (batch debounce) and q201 (its streaming
    * twin): per-type kept/dropped counts under the 1 h lag-gap rule —
    * stream end-state ≡ batch is exactly what the shared oracle proves
    * (`lazy` is load-bearing — referenced from `all`). */
  private lazy val debounceOracle: String = """
    WITH g AS (
      SELECT event_type,
        epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
          PARTITION BY user_id, event_type
          ORDER BY ts, event_id) AS gap_us
      FROM events)
    SELECT event_type, count(*) AS n_total,
      CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 3600000000
        THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 3600000000
        THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
    FROM g GROUP BY 1 ORDER BY 1"""

  /** Shared oracle for q27/q28: exact word-3-gram Jaccard >= 0.6 pairs. */
  private lazy val ngramJaccardOracle: String = s"""
    WITH $ngramPairCtes
    SELECT id_a, id_b, jaccard FROM pairs
    WHERE jaccard >= 0.6
    ORDER BY id_a, id_b"""

  /** name -> builder, for SparkEntry.queries. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) => n -> q.build }.toMap

  /** name -> DuckDB oracle SQL, for SparkEntry.oracleSql. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, q) if q.oracle.isDefined =>
      // Do NOT collapse whitespace: SQL string literals may contain spaces
      // (e.g. '4-NOT SPECIFIED'); Verify JSON-escapes newlines correctly.
      n -> q.oracle.get.trim
    }.toMap

  /** Headline queries for Bench. */
  def benchNames: Seq[String] = all.collect { case (n, q) if q.bench => n }
}
