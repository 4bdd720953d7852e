package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Stable._
import graft.operators._

/** Catalog part 3 of 7: queries q155..q199, in original catalog
  * order ([[Queries.all]] concatenates the parts — split from the former
  * single-file catalog purely for compile/review ergonomics; content and
  * order are unchanged).
  */
private[graft] trait Catalog3 extends CatalogBase {
  protected val entries3: Seq[(String, Q)] = Seq(

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
          SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, len(t) - 2),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
          FROM toks),
        -- inverted-index delta×corpus pairs (recall: exact at 0.6 — a
        -- qualifying pair shares >= 1 shingle; the per-pair
        -- list_intersect scan was oracle-side quadratic, r11)
        rws AS MATERIALIZED (SELECT doc_id, unnest(s) AS g FROM sh),
        szs AS MATERIALIZED (
          SELECT doc_id, count(*) AS sz FROM rws GROUP BY doc_id),
        com AS (
          SELECT d.doc_id AS delta_id, c.doc_id AS corpus_id,
            count(*) AS common
          FROM rws d JOIN rws c
            ON d.g = c.g AND d.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
          GROUP BY 1, 2),
        pairs AS (
          SELECT delta_id, corpus_id,
            CAST(common AS DOUBLE) / (sd.sz + sc.sz - common) AS jaccard
          FROM com
          JOIN szs sd ON sd.doc_id = delta_id
          JOIN szs sc ON sc.doc_id = corpus_id
          WHERE CAST(common AS DOUBLE) / (sd.sz + sc.sz - common) >= 0.6),
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
          // snap, not round: round(double, 8) is engine-dependent on
          // half-boundary renderings — invisible at sf0.01, flushed by
          // the r11 sf1 sweep the oracle conversion unlocked (1-ulp
          // avg_jaccard diff; q138/q230/q346's r10 class)
          .agg(count(lit(1)).as("n_pairs"),
            snap(davg(snap(col("jaccard"), 8)), 8).as("avg_jaccard"))
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
          ${sqlSnap(sqlDavg(sqlSnap("jaccard", 8)), 8)} AS avg_jaccard
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
        // NULL dims coalesce to a sentinel BEFORE keying: concat_ws would
        // silently SKIP a NULL (folding the (NULL, x) group onto ("", x)'s
        // key shape) while the oracle's || would NULL the whole key —
        // both wrong, and differently so
        val h = TextHash.md5Bits60(concat_ws("|",
          coalesce(col("lang"), lit("(null)")),
          coalesce(col("source"), lit("(null)")), lit("dp")))
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
            (CAST(${TextHash.sqlMd5Bits60(
              "coalesce(lang, '(null)') || '|' || coalesce(source, '(null)') || '|dp'")}
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
        val e = emb(s, dir)
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
          FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) idx
          WHERE $sqlEmbValid),
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
      // and the one cast that can exceed 2^53 — the second moment s2 —
      // goes through Stable.portableDouble's 2^30-radix split, so the
      // final mean/σ/z doubles are bit-identical by construction at ANY
      // revenue magnitude. (round(·, 6) instead diverges on
      // half-boundaries — Spark rounds the shortest decimal rendering,
      // DuckDB the binary value — observed on sf0.01; the former direct
      // s2 cast held only below ~$10^9/day and broke at the r10 sf1
      // sweep, σ off at 1e-14 relative, cancellation-amplified.)
      build = (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(msum(col("o_totalprice")).as("rev"),
            (sum(dec(col("o_totalprice"))) * 100).cast("decimal(20,0)").as("c"))
        val wPrev = Window.orderBy(col("d")).rowsBetween(-7, -1)
        val c19 = col("c").cast("decimal(19,0)")
        val meanC = col("s1").cast("double") / 7.0
        // s2 exceeds 2^53 once daily revenue passes ~$10^9 (hit at the
        // sf1 probe), where a direct decimal→double cast stops being
        // engine-portable — split-cast it (Stable.portableDouble; the
        // r10 sf1 sweep caught σ off at 1e-14, cancellation-amplified)
        val sigmaC = sqrt(greatest(lit(0.0),
          portableDouble(col("s2")) / 7.0 - meanC * meanC))
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
            sqrt(greatest(0.0, ${sqlPortableDouble("s2")} / 7.0
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
          // snap, not round: q158's r11 sf1 half-boundary class — an
          // integer-ratio rate can render on a rounding half
          .withColumn("dup_rate", snap(col("n_pairs").cast("double") /
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
          ${sqlSnap(
            """CAST(t.n_pairs AS DOUBLE) /
            (CASE WHEN t.s_lo = t.s_hi
              THEN CAST(lo.n_docs AS DOUBLE) * CAST(lo.n_docs - 1 AS DOUBLE) / 2.0
              ELSE CAST(lo.n_docs AS DOUBLE) * CAST(hi.n_docs AS DOUBLE) END)""",
            8)}
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
        val e = emb(s, dir)
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
      oracle = Some(s"""
        WITH v AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings WHERE $sqlEmbValid),
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
        // observation contract (r9): same as q141 — identified customers,
        // observed prices (a NULL rank key shifts every rank differently
        // across engines)
        val perCust = table(s, dir, "orders")
          .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
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
          FROM orders
          WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
          GROUP BY 1),
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
        val e = emb(s, dir)
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
          FROM embeddings WHERE $sqlEmbValid),
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
          // degenerate-replicate contract (r9): a Poisson replicate whose
          // total weight is 0 (likely for 1-row groups) has no mean ->
          // NULL, and the across-replicate moments use the actual count
          // of defined replicates B instead of the nominal 48
          .agg(when(sum(col("wt")) > 0,
            round(sum(dec(col("price")) * col("wt").cast("decimal(2,0)")), 2)
              .cast("double") / sum(col("wt"))).as("m"))
        val boot = reps.groupBy(col("pri")).agg(
            count(col("m")).as("b"),
            round(sum(col("m").cast("decimal(24,8)")), 8).cast("double")
              .as("s1"),
            round(sum((col("m") * col("m")).cast("decimal(30,8)")), 8)
              .cast("double").as("s2"))
          .withColumn("se_boot", when(col("b") > 1, round(sqrt(greatest(
            (col("s2") - col("s1") * col("s1") / col("b")) / (col("b") - 1),
            lit(0.0))), 4)))
        val an = o.groupBy(col("o_orderpriority").as("pri")).agg(
            count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("t1"),
            dsumsq(col("o_totalprice")).as("t2"))
          .withColumn("se_analytic", when(col("n") > 1, round(sqrt(
            (col("t2") - col("t1") * col("t1") / col("n"))
              / (col("n") - 1) / col("n")), 4)))
        boot.join(an, Seq("pri"))
          .select(col("pri"), col("n"), col("se_boot"), col("se_analytic"),
            when(col("se_analytic") > 0,
              round(col("se_boot") / col("se_analytic"), 4)).as("ratio"))
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
            CASE WHEN sum(wt) > 0 THEN
              CAST(round(sum(CAST(price AS DECIMAL(12,2))
                  * CAST(wt AS DECIMAL(2,0))), 2) AS DOUBLE)
                / sum(wt) END AS m
          FROM w GROUP BY 1, 2),
        boot AS (
          SELECT pri, count(m) AS bcnt,
            CAST(round(sum(CAST(m AS DECIMAL(24,8))), 8) AS DOUBLE) AS s1,
            CAST(round(sum(CAST(m * m AS DECIMAL(30,8))), 8) AS DOUBLE) AS s2
          FROM reps GROUP BY 1),
        boot2 AS (
          SELECT pri,
            CASE WHEN bcnt > 1 THEN
              round(sqrt(greatest((s2 - s1 * s1 / bcnt) / (bcnt - 1), 0.0)), 4)
            END AS se_boot
          FROM boot),
        an AS (
          SELECT o_orderpriority AS pri, count(*) AS n,
            ${sqlDsum("o_totalprice")} AS t1,
            ${sqlDsumsq("o_totalprice")} AS t2
          FROM orders GROUP BY 1),
        an2 AS (
          SELECT pri, n,
            CASE WHEN n > 1 THEN
              round(sqrt((t2 - t1 * t1 / n) / (n - 1) / n), 4)
            END AS se_analytic
          FROM an)
        SELECT b.pri, a.n, b.se_boot, a.se_analytic,
          CASE WHEN a.se_analytic > 0 THEN
            round(b.se_boot / a.se_analytic, 4) END AS ratio
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
        // observation contract (r9): quantiles are over OBSERVED balances
        // — a group with none has no curve (Spark's percentile yields
        // NULL and posexplode drops it; DuckDB keeps a NULL-list row —
        // the filter makes both engines state the same thing)
        val c = table(s, dir, "customer").filter(col("c_acctbal").isNotNull)
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
          FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1),
        pooled AS (
          SELECT quantile_cont(c_acctbal,
            [0.0,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0]) AS pl
          FROM customer WHERE c_acctbal IS NOT NULL)
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
        // NULL-field handling: a compaction planner counts EVERY row's
        // bytes (coalesce on both variable-width fields), and unattributed
        // events still occupy a file — user_id coalesces to the -1
        // sentinel "file" so ordk stays a TOTAL order (a NULL ordk would
        // sort NULLS FIRST in Spark but NULLS LAST in SQL, silently
        // shifting every bucket boundary after it)
        val files = table(s, dir, "events")
          .groupBy(coalesce(col("user_id"), lit(-1L)).as("u"),
            to_date(col("ts")).as("d"))
          .agg(sum(lit(32) + coalesce(length(col("props")), lit(0))
            + coalesce(length(col("event_type")), lit(0))).as("bytes"))
          .withColumn("ordd",
            datediff(col("d"), lit("1970-01-01")).cast("long"))
        // Scan order is (day, user) DIRECTLY — day as the sort key, user
        // as the tie-break ((d, u) is the group key, so the order is
        // total). The locality intent: each output bucket packs files
        // from one day's contiguous user range, so compaction I/O stays
        // within a day partition. An earlier radix encoding
        // (day·1000 + user) aliased across days once user ids passed
        // 1000 — ids from day d interleaved with day d+1 and the r11
        // sf1 sweep caught max_bucket_bytes flapping on the tied keys.
        val ranked = PrefixSum.running(files, "ordd", "u", "bytes",
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
          SELECT coalesce(user_id, -1) AS u, CAST(ts AS DATE) AS d,
            CAST(sum(32 + coalesce(len(props), 0)
              + coalesce(len(event_type), 0)) AS BIGINT) AS bytes
          FROM events GROUP BY 1, 2),
        run AS (
          -- scan order (d, u) directly — total because (d, u) is the
          -- group key; mirrors the engine's day-locality pack order
          SELECT bytes,
            sum(bytes) OVER (ORDER BY d, u ROWS UNBOUNDED PRECEDING)
              - bytes AS excum
          FROM files),
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
        // pipeKey (NULL-propagating, = the oracle's ||): a row with a
        // NULL attribute serializes to a NULL hash on BOTH engines —
        // excluded from the decimal digest, still counted by n. concat_ws
        // would skip the field, hashing a truncated serial the oracle
        // never computes (the q356 ADVICE class).
        def serial(price: Column): Column = pipeKey(
          col("o_orderkey"),
          col("o_custkey"),
          col("o_orderstatus"),
          price,
          to_date(col("o_orderdate")),
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
          // keyed-operator contract (mirrors the shared oracle): the
          // debounce key is (user_id, event_type)
          .filter(col("user_id").isNotNull && col("event_type").isNotNull)
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
            / (size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")) + 1))
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
              / (len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) + 1)
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
          .select(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+").as("a"))
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
          SELECT regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS a
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
  )
}
