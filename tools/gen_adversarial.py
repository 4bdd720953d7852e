#!/usr/bin/env python3
"""Data-shape robustness fixture: derive an ADVERSARIAL copy of a testdata
scale-factor directory. The execution-environment invariance matrix
(tools/invariance.sh) re-runs the catalog under hostile EXECUTION configs;
this tool attacks the other axis — hostile DATA. A 100 TB web corpus is
not TPC-H-shaped: it has empty and whitespace-only documents, docs below
the shingle width, exact-duplicate clusters, 40k-char repetition bombs,
emoji/CJK/RTL/combining-accent text, NULL fields, zero-norm and
denormal-magnitude embeddings, duplicate vectors. Every catalog query and
its DuckDB oracle read the SAME parquet files, so the sweep stays a valid
differential test on the derived directory: any hash mismatch is a real
edge-case divergence (NULL ordering, empty-shingle-set handling, float
underflow, tie nondeterminism), invisible on the clean generator output.

Round 9 extends the fixture to the seven RELATIONAL tables (previously
symlinked unmodified): NULL and orphan foreign keys, duplicate primary
keys, negative/zero/NULL amounts, boundary dates at the exact ends of the
existing range, empty/unicode/duplicate names, unknown enum values. The
~200 relational/stat queries had never seen a hostile row before this.

Deliberately NOT included, with the contract that excludes each (same
discipline as the events section below): NaN/Inf in money columns (price,
balance, quantity — the exact-decimal money envelope is an INGEST
contract, like the embedding norm envelope; corrupt money is rejected at
the boundary, not carried), dates outside the existing [min, max] range
(date-spine operators would inflate their output spine — a size effect,
not an edge case), and huge-but-finite amounts beyond DECIMAL(12,2)'s
10^10 envelope (documented overflow cliff, guarded by the dec() cast).

Usage: python3 tools/gen_adversarial.py [baseSfDir] [outDir]
  defaults: /root/testdata/sf0.001 /tmp/sfadv
Every table gets appended hostile rows with fresh ids (plus deliberate
duplicate-PK rows). Fully deterministic — no RNG anywhere.
"""
import os
import sys
import unicodedata

import pyarrow as pa
import pyarrow.parquet as pq

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfadv"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def adversarial_documents(tbl: pa.Table) -> pa.Table:
    max_id = max(tbl.column("doc_id").to_pylist())
    texts0 = tbl.column("text").to_pylist()
    rows = []  # (text, lang, source)
    # --- degenerate lengths: below any shingle/k-gram width ---
    rows.append(("", "en", "srcadv"))
    rows.append(("   \n\t  ", "en", "srcadv"))
    rows.append(("a", "en", "srcadv"))
    rows.append(("ab", "fr", "srcadv"))
    rows.append(("!!! ??? ... ;;; :::", "de", "srcadv"))
    rows.append(("1234567890 0987654321", "es", "srcadv"))
    # --- exact-duplicate cluster of an ORIGINAL doc (sizes the clusters
    # the dedup family must agree on: original + 2 copies = 3) ---
    rows.append((texts0[0], "es", "src0"))
    rows.append((texts0[0], "es", "srcadv"))
    # --- identical new pair (duplicate text that exists ONLY here) ---
    dup = "duplicate pair adversarial row spark filter join window sort"
    rows.append((dup, "en", "srcadv"))
    rows.append((dup, "en", "src1"))
    # --- near-duplicate of an original: one character changed ---
    rows.append((texts0[1][:-1] + ("x" if texts0[1][-1] != "x" else "y"),
                 "zh", "srcadv"))
    # --- repetition bomb: one sentence repeated to ~40k chars ---
    rows.append(("the quick spark row scans the fast table. " * 1000,
                 "en", "srcadv"))
    # --- unicode battery ---
    rows.append(("数据 engine 🚀🚀 データ 分析 café naïve übergroß",
                 "zh", "srcadv"))
    rows.append(("مرحبا بالعالم هذا نص عربي واختبار", "xx", "srcadv"))
    rows.append((unicodedata.normalize("NFD", "café résumé naïve"),
                 "fr", "srcadv"))
    rows.append(("word word word　word", "en", "srcadv"))
    rows.append(("THE Fast KEY order SORT table SCAN merge", "en", "src0"))
    # --- line-ending / control chars ---
    rows.append(("line1\r\nline2\r\nline3\r\n", "de", "srcadv"))
    rows.append(("a\nb\nc\nd\ne\nf\ng\nh\ni\nj\n", "es", "srcadv"))
    # --- NULLs: missing text; missing lang ---
    rows.append((None, "en", "srcadv"))
    rows.append(("null language adversarial document row", None, "srcadv"))
    ids = list(range(max_id + 1, max_id + 1 + len(rows)))
    adv = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[0]) if r[0] is not None else None
                             for r in rows], pa.int64()),
    }).cast(tbl.schema)
    return pa.concat_tables([tbl, adv])


def adversarial_events(tbl: pa.Table) -> pa.Table:
    """Raw-telemetry edges: timestamp ties, exact window/session-gap
    boundaries, NULL keys/metrics, full-content duplicates, signed zeros,
    empty-vs-NULL strings, malformed props JSON, non-finite metric
    doubles. Stays inside the base table's time range so date spines
    don't change shape; appended ids are fresh. Deliberately NOT included
    (documented hazards with their own contracts): huge-but-finite metric
    values (the money-decimal envelope — DECIMAL(18,6) bounds the metric
    domain, like the embedding norm envelope bounds vectors),
    half-boundary decimals like 1.005 (the round-at-2dp trap), far-future
    timestamps (spine blowup), NULL event time (streams cannot watermark
    it — event time is NOT NULL at ingest by contract)."""
    max_id = max(tbl.column("event_id").to_pylist())
    ts0 = tbl.column("ts").to_pylist()[0]       # an EXISTING instant
    u0 = tbl.column("user_id").to_pylist()[0]
    import datetime as dt
    mid = dt.datetime(2024, 1, 15, 0, 0, 0)     # exact midnight
    rows = []  # (ts, user_id, event_type, value, props)
    # --- same-microsecond ties ---
    rows.append((ts0, u0, "click", 1.25, '{"k": 1}'))      # ties an ORIGINAL
    rows.append((ts0, u0, "view", 2.50, '{"k": 2}'))       # three-way tie
    rows.append((ts0, 3, "click", 1.25, '{"k": 3}'))       # cross-user tie
    # --- full-content duplicate pair (only event_id differs) ---
    rows.append((mid.replace(hour=6), 9, "view", 7.77, '{"k": 7}'))
    rows.append((mid.replace(hour=6), 9, "view", 7.77, '{"k": 7}'))
    # --- exact session/debounce boundaries: gap == 3600 s (the > vs >=
    # edge), then one microsecond beyond ---
    rows.append((mid.replace(hour=10), 9, "click", 1.00, '{"k": 10}'))
    rows.append((mid.replace(hour=11), 9, "click", 1.00, '{"k": 11}'))
    rows.append((mid.replace(hour=12, microsecond=1), 9, "click", 1.00,
                 '{"k": 12}'))
    # --- exact hour / midnight window boundaries ---
    rows.append((mid, 8, "purchase", 3.00, '{"k": 20}'))
    rows.append((mid.replace(hour=1), 8, "purchase", 4.00, '{"k": 21}'))
    # --- NULL key / metric / payload fields ---
    rows.append((mid.replace(hour=2), None, "purchase", 5.00, '{"k": 30}'))
    rows.append((mid.replace(hour=3), 7, None, 6.00, '{"k": 31}'))
    rows.append((mid.replace(hour=4), 7, "purchase", None, '{"k": 32}'))
    rows.append((mid.replace(hour=5), 7, "view", 8.00, None))
    # --- empty-vs-NULL string; malformed JSON payload ---
    rows.append((mid.replace(hour=7), 6, "", 9.00, '{"k": 40}'))
    rows.append((mid.replace(hour=8), 6, "click", 10.00, '{not json'))
    # --- signed zeros (grouping/aggregation must not split ±0.0) ---
    rows.append((mid.replace(hour=9), 6, "view", 0.0, '{"k": 50}'))
    rows.append((mid.replace(hour=9, minute=1), 6, "view", -0.0, '{"k": 51}'))
    # --- non-finite / overflow-scale metrics: corrupt telemetry doubles.
    # The engine's metric contract scrubs non-finite to NULL at the
    # consumption boundary (exact-decimal sums would otherwise ANSI-crash
    # and NaN ordering diverges across engines); huge-but-finite values
    # stay — they are data, and the decimal envelope must carry them ---
    rows.append((mid.replace(hour=13), 5, "purchase", float("nan"),
                 '{"k": 60}'))
    rows.append((mid.replace(hour=14), 5, "purchase", float("inf"),
                 '{"k": 61}'))
    rows.append((mid.replace(hour=15), 5, "view", float("-inf"),
                 '{"k": 62}'))
    # --- a user whose FIRST event is untyped, then typed: a NULL first
    # attribute is indistinguishable from "no previous row" under the
    # naive lag-encoding of change detection (prev IS DISTINCT FROM attr
    # misses it), while keyed SCD2 state correctly opens a NULL-attr
    # version and closes it on the change ---
    rows.append((mid.replace(hour=16), 15, None, 1.00, '{"k": 70}'))
    rows.append((mid.replace(hour=17), 15, "click", 2.00, '{"k": 71}'))
    ids = list(range(max_id + 1, max_id + 1 + len(rows)))
    adv = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array([r[0] for r in rows]),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array([r[4] for r in rows], pa.string()),
    }).cast(tbl.schema)
    return pa.concat_tables([tbl, adv])


def adversarial_embeddings(tbl: pa.Table) -> pa.Table:
    max_id = max(tbl.column("vec_id").to_pylist())
    vec0 = tbl.column("embedding").to_pylist()[0]
    lab0 = tbl.column("label").to_pylist()[0]
    dim = len(vec0)
    rows = []  # (vec, label)
    rows.append(([0.0] * dim, 0))                      # zero norm
    rows.append((list(vec0), lab0))                    # exact duplicate
    rows.append(([-x for x in vec0], (lab0 + 1) % 10))  # antipode
    rows.append(([1.0e18] * dim, 1))                   # huge magnitude
    rows.append(([1.0e-30] * dim, 2))                  # float-underflow dots
    rows.append(([0.0] * (dim // 2) + [1.0] * (dim - dim // 2), 3))
    rows.append(([0.5] * dim, 4))                      # zero variance
    ids = list(range(max_id + 1, max_id + 1 + len(rows)))
    adv = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r[0] for r in rows], pa.list_(pa.float32())),
        "label": pa.array([r[1] for r in rows], pa.int32()),
    }).cast(tbl.schema)
    return pa.concat_tables([tbl, adv])


def adversarial_region(tbl: pa.Table) -> pa.Table:
    """Tiny dim: empty/NULL/unicode/duplicate names, one duplicate PK."""
    rows = [  # (r_regionkey, r_name)
        (5, ""),                       # empty name
        (6, None),                     # NULL name
        (7, tbl.column("r_name").to_pylist()[0]),  # duplicate NAME
        (8, "亚洲 REGION 🌏"),          # unicode name
        (0, "DUPLICATE KEY REGION"),   # duplicate PRIMARY KEY
    ]
    adv = pa.table({
        "r_regionkey": pa.array([r[0] for r in rows], pa.int32()),
        "r_name": pa.array([r[1] for r in rows], pa.string()),
    }).cast(tbl.schema)
    return pa.concat_tables([tbl, adv])


def adversarial_nation(tbl: pa.Table) -> pa.Table:
    rows = [  # (n_nationkey, n_name, n_regionkey)
        (25, "", 0),                   # empty name
        (26, None, None),              # NULL name + NULL FK
        (27, "日本国 ñação", 9),        # unicode name + ORPHAN regionkey
        (28, tbl.column("n_name").to_pylist()[0], 1),  # duplicate name
        (0, "DUPLICATE KEY NATION", 0),  # duplicate PRIMARY KEY
    ]
    adv = pa.table({
        "n_nationkey": pa.array([r[0] for r in rows], pa.int32()),
        "n_name": pa.array([r[1] for r in rows], pa.string()),
        "n_regionkey": pa.array([r[2] for r in rows], pa.int32()),
    }).cast(tbl.schema)
    return pa.concat_tables([tbl, adv])


def adversarial_customer(tbl: pa.Table) -> pa.Table:
    max_id = max(tbl.column("c_custkey").to_pylist())
    name0 = tbl.column("c_name").to_pylist()[0]
    k = max_id + 1
    rows = [  # (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
        (k + 0, "", None, None, ""),   # empty name, NULL FK/bal, empty segment
        (k + 1, None, 99, -0.0, None),  # NULL name, ORPHAN nation, signed zero
        (k + 2, name0, 0, 0.0, "BUILDING"),  # duplicate NAME of customer 0
        (k + 3, "客户 Müller-Lücke ☃", 1, -9999999.99, "AUTOMOBILE"),  # unicode; deep debt
        (k + 4, "Customer#UPPER vs lower", 2, 9999999.99, "machinery"),  # case-variant segment
        (0, "DUPLICATE KEY CUSTOMER", 3, 100.0, "HOUSEHOLD"),  # duplicate PK
    ]
    adv = pa.table({
        "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_name": pa.array([r[1] for r in rows], pa.string()),
        "c_nationkey": pa.array([r[2] for r in rows], pa.int32()),
        "c_acctbal": pa.array([r[3] for r in rows], pa.float64()),
        "c_mktsegment": pa.array([r[4] for r in rows], pa.string()),
    }).cast(tbl.schema)
    return pa.concat_tables([tbl, adv])


def adversarial_supplier(tbl: pa.Table) -> pa.Table:
    max_id = max(tbl.column("s_suppkey").to_pylist())
    name0 = tbl.column("s_name").to_pylist()[0]
    k = max_id + 1
    rows = [  # (s_suppkey, s_name, s_nationkey, s_acctbal)
        (k + 0, "", None, None),
        (k + 1, None, 99, -0.0),       # NULL name, orphan nation
        (k + 2, name0, 0, 0.0),        # duplicate name
        (0, "DUPLICATE KEY SUPPLIER", 1, 50.0),  # duplicate PK
    ]
    adv = pa.table({
        "s_suppkey": pa.array([r[0] for r in rows], pa.int64()),
        "s_name": pa.array([r[1] for r in rows], pa.string()),
        "s_nationkey": pa.array([r[2] for r in rows], pa.int32()),
        "s_acctbal": pa.array([r[3] for r in rows], pa.float64()),
    }).cast(tbl.schema)
    return pa.concat_tables([tbl, adv])


def adversarial_part(tbl: pa.Table) -> pa.Table:
    max_id = max(tbl.column("p_partkey").to_pylist())
    # an existing (name, brand, type) — duplicated to stress ER blocking
    n0, b0, t0 = (tbl.column("p_name").to_pylist()[0],
                  tbl.column("p_brand").to_pylist()[0],
                  tbl.column("p_type").to_pylist()[0])
    k = max_id + 1
    rows = [  # (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
        (k + 0, "", "", "", 0, 0.0),   # empty strings, zero size/price
        (k + 1, None, None, None, None, None),  # all-NULL attributes
        (k + 2, n0, b0, t0, -5, -900.0),  # duplicate name+brand; negative size/price
        (k + 3, n0 + "x", b0, t0, 50, 919.9),  # near-dup name in the same block
        (k + 4, "πart ünïcode widget", "Brand#99", "PROMO", 1, 900.0),  # unicode; fresh brand
        (0, "duplicate key part", "Brand#13", "ECONOMY", 1, 900.0),  # duplicate PK
        # NULL brand + similar non-NULL names (r10 ADVICE): under a
        # NULL-skipping blocking key (concat_ws) these two pair in the
        # engine while the oracle's || NULLs the key — the divergence
        # class the all-NULL row masks (its name-inequality filter never
        # fires). With the NULL-propagating key neither engine pairs them.
        (k + 5, "ghost brand widget alpha", None, "STANDARD", 2, 901.0),
        (k + 6, "ghost brand widget alphb", None, "STANDARD", 2, 902.0),
    ]
    adv = pa.table({
        "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "p_name": pa.array([r[1] for r in rows], pa.string()),
        "p_brand": pa.array([r[2] for r in rows], pa.string()),
        "p_type": pa.array([r[3] for r in rows], pa.string()),
        "p_size": pa.array([r[4] for r in rows], pa.int32()),
        "p_retailprice": pa.array([r[5] for r in rows], pa.float64()),
    }).cast(tbl.schema)
    return pa.concat_tables([tbl, adv])


def adversarial_orders(tbl: pa.Table) -> pa.Table:
    import datetime as dt
    max_id = max(tbl.column("o_orderkey").to_pylist())
    dates = tbl.column("o_orderdate").to_pylist()
    dmin, dmax = min(dates), max(dates)
    k = max_id + 1
    rows = [  # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
        (k + 0, None, "O", 100.0, dmin, "1-URGENT"),   # NULL FK; min-boundary date
        (k + 1, 999999, "F", None, dmax, "5-LOW"),     # ORPHAN FK; NULL price; max-boundary date
        (k + 2, 0, "X", -500.0, dt.datetime(1998, 6, 15), "3-MEDIUM"),  # unknown status; negative price
        (k + 3, 1, "P", 0.0, dmin, None),              # zero price; NULL priority
        (k + 4, 1, None, 9999999.99, dmax, ""),        # NULL status; empty priority; huge-but-in-envelope price
        (0, 5, "O", 123.45, dt.datetime(1997, 3, 1), "3-MEDIUM"),  # duplicate PK
    ]
    adv = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
        "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[4] for r in rows]),
        "o_orderpriority": pa.array([r[5] for r in rows], pa.string()),
    }).cast(tbl.schema)
    return pa.concat_tables([tbl, adv])


def adversarial_lineitem(tbl: pa.Table) -> pa.Table:
    import datetime as dt
    dates = tbl.column("l_shipdate").to_pylist()
    dmin, dmax = min(dates), max(dates)
    mid = dt.datetime(1998, 6, 15)
    # fresh (orderkey, linenumber) pairs use an orderkey far beyond the base
    # range but WITHIN int64, so they join nothing (orphans) unless stated
    k = 900000
    rows = [  # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
              #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
        (k + 0, 999999, 999999, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", mid),  # orphan part+supp (and order)
        (k + 1, None, None, 1, None, None, None, None, None, None, dmin),  # NULL battery; min date
        (k + 2, 0, 0, 1, 0.0, 0.0, 0.0, 0.0, "", "", dmax),  # zero qty/price; empty flags; max date
        (k + 3, 0, 1, 2, -5.0, -1000.0, 0.0, 0.0, "R", "F", mid),  # negative qty/price
        (k + 4, 1, 1, 1, 10.0, 1000.0, 1.0, 0.08, "A", "F", mid),  # discount 1.0 → zero revenue
        (k + 5, 1, 2, 2, 10.0, 1000.0, -0.05, -0.02, "N", "O", mid),  # negative discount/tax
        (k + 6, 2, 3, 1, 0.001, 0.01, 0.999, 0.999, "N", "O", mid),  # sub-cent money, near-1 rates
        (0, 0, 0, 1, 17.0, 17000.0, 0.05, 0.02, "N", "O", mid),  # duplicate PK (l_orderkey 0, line 1 exists)
    ]
    adv = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
        "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
        "l_quantity": pa.array([r[4] for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[5] for r in rows], pa.float64()),
        "l_discount": pa.array([r[6] for r in rows], pa.float64()),
        "l_tax": pa.array([r[7] for r in rows], pa.float64()),
        "l_returnflag": pa.array([r[8] for r in rows], pa.string()),
        "l_linestatus": pa.array([r[9] for r in rows], pa.string()),
        "l_shipdate": pa.array([r[10] for r in rows]),
    }).cast(tbl.schema)
    return pa.concat_tables([tbl, adv])


RELATIONAL = {
    "region": adversarial_region,
    "nation": adversarial_nation,
    "customer": adversarial_customer,
    "supplier": adversarial_supplier,
    "part": adversarial_part,
    "orders": adversarial_orders,
    "lineitem": adversarial_lineitem,
}


def main():
    os.makedirs(OUT, exist_ok=True)
    for t in TABLES:
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.lexists(dst):
            os.remove(dst)
        if t == "documents":
            pq.write_table(adversarial_documents(pq.read_table(src)), dst)
        elif t == "embeddings":
            pq.write_table(adversarial_embeddings(pq.read_table(src)), dst)
        elif t == "events":
            pq.write_table(adversarial_events(pq.read_table(src)), dst)
        elif t in RELATIONAL:
            pq.write_table(RELATIONAL[t](pq.read_table(src)), dst)
        else:
            os.symlink(src, dst)
    d = pq.read_table(os.path.join(OUT, "documents.parquet"))
    e = pq.read_table(os.path.join(OUT, "embeddings.parquet"))
    print(f"wrote {OUT}: documents {d.num_rows} rows "
          f"(+{d.num_rows - pq.read_metadata(os.path.join(BASE, 'documents.parquet')).num_rows}), "
          f"embeddings {e.num_rows} rows")


if __name__ == "__main__":
    main()
