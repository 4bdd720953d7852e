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

Usage: python3 tools/gen_adversarial.py [baseSfDir] [outDir]
  defaults: /root/testdata/sf0.001 /tmp/sfadv
Unmodified tables are symlinked; documents/embeddings get appended rows
with fresh ids. Fully deterministic — no RNG anywhere.
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
        else:
            os.symlink(src, dst)
    d = pq.read_table(os.path.join(OUT, "documents.parquet"))
    e = pq.read_table(os.path.join(OUT, "embeddings.parquet"))
    print(f"wrote {OUT}: documents {d.num_rows} rows "
          f"(+{d.num_rows - pq.read_metadata(os.path.join(BASE, 'documents.parquet')).num_rows}), "
          f"embeddings {e.num_rows} rows")


if __name__ == "__main__":
    main()
