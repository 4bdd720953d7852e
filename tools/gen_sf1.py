#!/usr/bin/env python3
"""Generate an sf1 testdata directory (~10x sf0.1: 6M lineitem rows) for
the measured-exponent scale probe (COVERAGE.md round-9). The driver only
ships sf{0.001,0.01,0.1}; ScaleCheck's constants all come from the
0.01->0.1 step, so this provides the next decade.

Method: 10 copies of every sf0.1 fact/entity table with key offsets that
keep referential integrity INSIDE each copy (an order's lineitems, a
customer's orders, a part's lineitems all stay joined — join fan-outs
scale linearly, as a bigger business would). The two dims (region,
nation) stay fixed, so per-nation group counts grow 10x in membership
but not in group count — also the realistic shape.

A 10x corpus has 10x DISTINCT content with the SAME dup-rate, so the
copies must not be near-duplicates of each other (a v1 of this
generator used a 10-token document prefix, which leaves cross-copy
trigram Jaccard ~0.8 — every doc became a 10-clique and the dedup
family went quadratic in copies, a fixture artifact the first sf1 run
measured the hard way). Per-copy de-duplication, structure-preserving:
  - documents (copy i != 0): every token gets a copy-tag suffix
    (tok~c{i}) — cross-copy shingle overlap is ZERO, within-copy Jaccard
    and the whole shingle-df SPECTRUM are preserved exactly (see
    _interleave_markers for the v2/v3 marker-insertion schemes this
    replaced and the candidate blow-ups they caused);
  - embeddings (copy i != 0): dimensions rotated by i (norm-preserving,
    validity-gate-safe) plus a 1e-3 bump — cross-copy pairs then look
    like ordinary random pairs of the near-uniform corpus instead of
    exact duplicates;
  - part/customer/supplier names (copy i != 0): a cp{i} first token, so
    ER/fuzzy blocking keys land each copy in its own blocks and block
    populations stay sf0.1-sized (replicated names are the r6 worst-case
    SKEW stress, not a scale step — ScaleCheck covers that separately).
Events keep their time range (density grows 10x, the spine does not).
Fully deterministic — no RNG.

Usage: python3 tools/gen_sf1.py [baseSfDir] [outDir] [copies]
  defaults: /root/testdata/sf0.1 /tmp/sf1 10
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

OFF = 100_000_000  # key offset per copy — far above any base key

# table -> columns to offset per copy (key columns only)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


NAME_COLS = {"part": "p_name", "customer": "c_name", "supplier": "s_name"}


def _interleave_markers(text, i):
    """Copy-i text perturbation v4: every token gets a copy-tag SUFFIX
    (tok -> tok~c{i}). A pure per-token function, so it is exact on all
    three axes the earlier marker-insertion schemes traded off:
      - within-copy Jaccard is preserved EXACTLY for any shared span at
        ANY offsets (the r10-ADVICE offset-duplicate property — no mod-2
        alignment condition left);
      - cross-copy shingle overlap is zero (every token differs);
      - shingle ENTROPY is preserved exactly: the copy-i df of a tagged
        trigram equals the base df of the original trigram. The v2/v3
        inserted-marker schemes put a marker inside every trigram
        window, collapsing it to unigram (v3 constant cp{i}: hot
        shingles blew the containment candidate stage 116x at 10x docs —
        q354's phantom 1.95 exponent, r10) or bigram (content-derived
        marker: still 74x) specificity.
    Vocabulary grows 10x with the corpus — the realistic shape for 10x
    distinct content — and doc token counts are unchanged (insertion
    schemes inflated them 1.5x)."""
    if text is None:
        return None
    return " ".join(f"{t}~c{i}" for t in text.split())


def shifted(tbl: pa.Table, name: str, i: int) -> pa.Table:
    out = tbl
    for col in KEYED[name]:
        idx = out.schema.get_field_index(col)
        typ = out.schema.field(idx).type
        arr = pc.cast(pc.add(pc.cast(out.column(col), pa.int64()),
                             i * OFF), typ)
        out = out.set_column(idx, out.schema.field(idx), arr)
    if name == "documents" and i != 0:
        idx = out.schema.get_field_index("text")
        texts = [_interleave_markers(t, i)
                 for t in out.column("text").to_pylist()]
        txt = pa.array(texts, pa.string())
        out = out.set_column(idx, out.schema.field(idx), txt)
        # n_chars tracks the text perturbation
        if "n_chars" in out.schema.names:
            ncidx = out.schema.get_field_index("n_chars")
            nc = pa.array([None if t is None else len(t) for t in texts],
                          out.schema.field(ncidx).type)
            out = out.set_column(ncidx, out.schema.field(ncidx), nc)
    if name == "embeddings" and i != 0:
        vecs = out.column("embedding").to_pylist()
        rotated = []
        for vid, v in enumerate(vecs):
            if v is None:
                rotated.append(None)
                continue
            dim = len(v)
            r = i % max(dim, 1)
            w = v[r:] + v[:r]          # norm-preserving rotation
            w[vid % max(dim, 1)] += i * 1e-3
            rotated.append(w)
        idx = out.schema.get_field_index("embedding")
        arr = pa.array(rotated, out.schema.field(idx).type)
        out = out.set_column(idx, out.schema.field(idx), arr)
    if name in NAME_COLS and i != 0:
        # prefix INSIDE the first token (cp{i}hot bolt, not "cp{i} hot
        # bolt"): ER/fuzzy blocking keys use the first token, and a
        # standalone marker token would make it CONSTANT per copy —
        # collapsing every copy's parts into a handful of giant blocks
        # (measured: q144/q150 exponents ~2.0 under the v1 prefixing)
        colname = NAME_COLS[name]
        idx = out.schema.get_field_index(colname)
        names = [None if n is None else f"cp{i}{n}"
                 for n in out.column(colname).to_pylist()]
        out = out.set_column(idx, out.schema.field(idx),
                             pa.array(names, pa.string()))
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    for t in FIXED:
        src, dst = f"{BASE}/{t}.parquet", f"{OUT}/{t}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(src, dst)
    for t in KEYED:
        base = pq.read_table(f"{BASE}/{t}.parquet")
        parts = [shifted(base, t, i) for i in range(COPIES)]
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{OUT}/{t}.parquet")
        print(f"{t}: {base.num_rows} -> {big.num_rows}")


if __name__ == "__main__":
    main()
