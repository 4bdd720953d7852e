#!/usr/bin/env bash
# Data-shape robustness row: the invariance matrix's DATA axis.
# tools/invariance.sh re-runs the catalog under hostile EXECUTION configs;
# this script re-runs it over hostile DATA — an adversarial derivative of a
# testdata directory (tools/gen_adversarial.py: empty/whitespace/NULL
# documents, sub-shingle-width docs, exact-duplicate clusters, a 40k-char
# repetition bomb, emoji/CJK/RTL/combining-accent text, zero-norm /
# NaN-free-but-degenerate embeddings, duplicate vectors). Every query and
# its DuckDB oracle read the SAME derived parquet, so the sweep stays a
# valid differential test: any mismatch is a real edge-case divergence
# (NULL ordering, empty-token handling, float underflow, NaN comparison
# semantics), invisible on the clean generator output.
#
# First run (r8) found 15: ANSI divide-by-zero on empty docs (q24),
# decimal/long overflow on 1e18-magnitude vectors (q36/q63/q73/q173),
# NaN-vs-NULL cosine divergence on zero-norm vectors (q25/q30/q34/q176/
# q180), NULL-text hash/chunk semantics (q29/q32/q56), concat_ws-vs-||
# NULL key folding (q160), and NaN sign comparison on zero-norm prefixes
# (q285). Fixed via the embedding validity gate (Vectors.validEmbeddings
# + sqlValidEmbedding in every similarity/centroid/quantization query's
# BOTH sides) and explicit NULL/empty-input contracts.
#
# The events batch (r8, second run) found 13 more: typed-encoder kills on
# NULL metrics/keys in the streaming twins (q74/q75/q201/q289 — fixed via
# Option metric + the entity-keyed contract), a masked-rollback bug in
# JdbcUpsert's error path, a NULL-key IVM algebra bug in Incremental
# (q277 — plain = joins vs groupBy's NULL-equal grouping), concat_ws /
# NULL-ordering folds (q93/q105/q108/q192/q293), a throwing oracle on
# malformed JSON (q17), and an undefined one-observation variance (q238).
# See COVERAGE.md for the full record.
#
# The relational batch (r9) extended the generator to the seven TPC-H
# tables (NULL/orphan FKs, duplicate PKs, negative/zero/NULL amounts,
# boundary dates, empty/unicode names, unknown enum values) and found 23
# more: 8 ANSI crash paths (bare casts, n<=1 sample-variance
# denominators, decimal-envelope overflow on full-envelope money,
# log/pow domain violations) and 15 silent divergences (NULL-rank
# shifts, unlabeled-counted-as-negative, NULL-group lifecycle,
# duplicate-PK join multiplication, a batch-SCD2 NULL-first-version
# ORACLE bug, '' vs NULL empty aggregation). All fixed both-sides;
# 358/358 green on the extended fixture since.
#
# Usage: tools/adversarial.sh [baseSfDir]   (default /root/testdata/sf0.001)
set -eu
BASE=${1:-/root/testdata/sf0.001}
ADV=/tmp/sfadv
OUT=/tmp/advout
python3 tools/gen_adversarial.py "$BASE" "$ADV"
sbt -batch "runMain graft.Verify $ADV $OUT" > /tmp/adv_verify.log 2>&1 \
  || { echo "VERIFY FAILED (see /tmp/adv_verify.log)"; exit 1; }
python3 tools/compare.py "$OUT" "$ADV" | tail -1
