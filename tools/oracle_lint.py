#!/usr/bin/env python3
"""Authoring-time lint for the oracle catalog.

The driver's hash compare is type- and value-sensitive; every rule here
mechanizes a divergence class that cost a real round-time failure (the
full prose record lives in COVERAGE.md's round-6..9 sections):

  1. HUGEINT result column              -> FAIL. DuckDB's 128-bit sum
     type; Spark has no counterpart — always a missing CAST (q145, q227,
     q262 were this class).
  2. dtype mismatch vs the Spark dump   -> FAIL. DOUBLE/DECIMAL oracle
     column where Spark's parquet is integral, or vice versa.
  3. NULL-order sensitivity             -> FAIL. Spark orders NULLS FIRST
     on ASC, DuckDB NULLS LAST — any window/LIMIT whose ordering key is
     not total diverges (q192's bucket boundaries). Executable check: the
     oracle runs under BOTH default_null_order settings; a row-set
     difference means the result depends on NULL placement. Fix: make the
     key total (COALESCE a sentinel) or spell NULLS FIRST/LAST.
  4. json_extract without json_valid    -> FAIL. DuckDB's json_extract*
     THROWS on malformed JSON where get_json_object returns NULL (q17);
     guard with json_valid + TRY_CAST.
  5. int64-storage decimal multiplication with no headroom -> FAIL.
     DuckDB multiplies two width-<=18 decimals in their int64 storage
     (empirically re-pinned r9: `DECIMAL(15,6)*DECIMAL(15,6)` of 1e9-
     scale values raises "Overflow in multiplication of DECIMAL(18)"
     even though the declared RESULT width would be 30) — overflow is
     value-dependent, bounded by the unscaled product, so it is
     impossible iff w1+w2 <= 18 and latent otherwise. One width->=19
     operand forces the int128 path and the exact product (the
     sqlDsumsq rule). Flagged = both widths <= 18 AND w1+w2 >= 19:
     the declared envelopes admit values whose product overflows.
     The right operand's width is read by BALANCED-PAREN scan of its
     whole CAST — a nested `CAST(CAST(y AS DECIMAL(12,2)) AS
     DECIMAL(19,2))` is judged by the OUTER width 19 (its actual
     storage), not the inner 12 (the r10 ADVICE false-positive).
  6. string_agg without a coalesce guard    -> FAIL. Spark's
     concat_ws/array_join over an empty or all-NULL collect says ''
     where DuckDB's string_agg over zero non-NULL values says NULL
     (q236/q108's class). Exemption: `-- agg: nonempty` marks SQL
     whose grouping provably feeds >=1 non-NULL element per group
     (auditable, greppable — the json rule's pattern).
  7. isfinite in dual-dialect engine source -> FAIL. Engine-side SQL
     helper strings may execute under BOTH spark.sql and DuckDB;
     `isfinite(` is DuckDB-only (UNRESOLVED_ROUTINE on the Spark side
     — the q125/q161 episode). Scans the non-catalog engine source
     (catalog files hold oracle-only literals where isfinite is
     legal); a `duckdb-only` comment on the line disarms a helper
     that provably never reaches spark.sql.

Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/lint --sql-only"
    python3 tools/oracle_lint.py /tmp/lint /root/testdata/sf0.001 [verify_outdir]
    python3 tools/oracle_lint.py --selftest     # planted-violation canaries

<outdir> must contain oracle_sql.json; the optional third arg points at a
prior full Verify dump for the dtype cross-check (defaults to <outdir>).
"""
import json
import os
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

INTEGRAL = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}

# a `*` whose LEFT operand is a CAST(... AS DECIMAL(w, s)): the left
# capture anchors on the `AS DECIMAL` immediately before the cast's
# closing paren, so a nested left cast reads its OUTERMOST width; the
# right operand's CAST is then parsed by balanced-paren scan below.
DEC_MUL_LEFT = re.compile(
    r"AS\s+DECIMAL\((\d+)\s*,\s*\d+\)\s*\)\s*\*\s*CAST\s*(?=\()",
    re.IGNORECASE | re.DOTALL)

AS_DECIMAL = re.compile(r"AS\s+DECIMAL\s*\(\s*(\d+)\s*,\s*\d+\s*\)",
                        re.IGNORECASE)


def dec_mul_pairs(sql):
    """(w_left, w_right) per decimal-cast multiply, where w_right is the
    OUTERMOST `AS DECIMAL` of the right operand's CAST — found by scanning
    its balanced parens. A leading-edge regex would bind the FIRST
    `AS DECIMAL` inside the cast, misreading `CAST(CAST(y AS DECIMAL(12,2))
    AS DECIMAL(19,2))` as width-12 storage (false positive: the outer cast
    IS int128) and misattributing widths across expression boundaries."""
    pairs = []
    for m in DEC_MUL_LEFT.finditer(sql):
        open_i = sql.index("(", m.end() - 1)
        depth, j = 0, open_i
        body_end = -1
        while j < len(sql):
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
                if depth == 0:
                    body_end = j
                    break
            j += 1
        if body_end < 0:
            continue
        body = sql[open_i + 1:body_end]
        # the cast's own type annotation is the AS DECIMAL at depth 0 of
        # its body; nested casts' annotations sit at depth >= 1
        depth, j, w2 = 0, 0, None
        while j < len(body):
            if depth == 0:
                dm = AS_DECIMAL.match(body, j)
                if dm:
                    w2 = int(dm.group(1))
                    j = dm.end()
                    continue
            if body[j] == "(":
                depth += 1
            elif body[j] == ")":
                depth -= 1
            j += 1
        if w2 is not None:
            pairs.append((int(m.group(1)), w2))
    return pairs


# rule 7's scan surface: engine-side source where SQL helper strings may
# be dual-dialect (executed by spark.sql AND DuckDB). Catalog files are
# excluded — their oracle literals are DuckDB-only by contract.
ENGINE_SRC_DIRS = ["src/main/scala/graft/functions",
                   "src/main/scala/graft/operators",
                   "src/main/scala/graft/streaming",
                   "src/main/scala/graft/sources",
                   "src/main/scala/graft/ml",
                   "src/main/scala/graft/loan",
                   "src/main/scala/graft/plans"]


def isfinite_hits(text):
    """Line numbers calling `isfinite(` without a `duckdb-only` waiver on
    the line — the call form only, so prose mentions in comments (e.g.
    "NOT DuckDB's isfinite") never fire."""
    hits = []
    for ln, line in enumerate(text.splitlines(), 1):
        if re.search(r"\bisfinite\s*\(", line, re.I) and \
                not re.search(r"duckdb-only", line, re.I):
            hits.append(ln)
    return hits


def lint_engine_sources(root="."):
    problems = []
    for d in ENGINE_SRC_DIRS:
        full = os.path.join(root, d)
        if not os.path.isdir(full):
            continue
        for fn in sorted(os.listdir(full)):
            if not fn.endswith(".scala"):
                continue
            path = os.path.join(full, fn)
            for ln in isfinite_hits(open(path).read()):
                problems.append(
                    f"{d}/{fn}:{ln}: isfinite( in engine-side source — "
                    f"DuckDB-only, UNRESOLVED_ROUTINE under spark.sql "
                    f"(q125/q161 class); use isnan + an Infinity compare, "
                    f"or waive with a duckdb-only comment")
    return problems


def wide_dec_double_hits(sql):
    """Rule 8: a direct `CAST(<expr> AS DOUBLE)` whose body declares an
    INTEGER decimal (scale 0) of width >= 16 digits — values can exceed
    2^53 ~ 9.0e15, where decimal->double correct-rounding is NOT
    engine-portable (Spark rounds a BigDecimal, DuckDB its int64/int128
    storage; q174's sf1 divergence class). Route through
    sqlPortableDouble (whose 2^30-radix words make the body contain
    `1073741824`, exempting it) or waive with `-- portable: bounded`
    when the value is provably < 2^53."""
    hits = []
    for m in re.finditer(r"\bCAST\s*\(", sql, re.I):
        open_i = sql.index("(", m.end() - 1)
        depth, j, body_end = 0, open_i, -1
        while j < len(sql):
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
                if depth == 0:
                    body_end = j
                    break
            j += 1
        if body_end < 0:
            continue
        body = sql[open_i + 1:body_end]
        if not re.search(r"AS\s+DOUBLE\s*$", body.strip(), re.I):
            continue
        widths = [int(w) for w in
                  re.findall(r"AS\s+DECIMAL\s*\(\s*(\d+)\s*,\s*0\s*\)",
                             body, re.I)]
        if any(w >= 16 for w in widths) and "1073741824" not in body:
            line = sql.count("\n", 0, m.start()) + 1
            src_line = sql.splitlines()[line - 1]
            if not re.search(r"portable:\s*bounded", src_line, re.I):
                hits.append(
                    f"line {line}: CAST of a width-{max(widths)} integer "
                    f"DECIMAL directly to DOUBLE — not engine-portable "
                    f"above 2^53 (q174 class); use sqlPortableDouble or "
                    f"waive with `-- portable: bounded`")
    return hits


def is_floating(t):
    # DECIMAL included: pandas materializes it as float64, so a DECIMAL
    # oracle against an integral Spark column is the same dtype mismatch
    return t in ("FLOAT", "DOUBLE") or t.startswith("DECIMAL")


def canonical_rows(con, sql):
    """Row set as order-insensitive repr tuples (compare.py sorts rows
    before hashing, so pure output-order differences are not failures —
    only value/row-membership changes are)."""
    rows = con.sql(sql).fetchall()
    return sorted(tuple(repr(v) for v in row) for row in rows)


def lint_one(con, name, sql, dumpdir=None):
    """All problems found for one oracle entry (empty list = clean)."""
    problems = []
    try:
        rel = con.sql(sql)
        otypes = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
    except Exception as e:
        return [f"oracle exec error: {str(e)[:200]}"]
    # rule 1: HUGEINT
    problems += [f"col {c}: oracle type HUGEINT (add a CAST)"
                 for c, t in otypes.items() if t == "HUGEINT"]
    # rule 4: unguarded json_extract. Exemption: an explicit
    # `json: synthesized` comment marks SQL whose JSON is built by the
    # query itself (well-formed or NULL by construction) — auditable,
    # greppable, and NULL input never throws, only malformed text does.
    if re.search(r"\bjson_extract", sql, re.I) and \
            not re.search(r"\bjson_valid\b|json:\s*synthesized", sql, re.I):
        problems.append(
            "json_extract without a json_valid guard — DuckDB THROWS on "
            "malformed JSON where Spark's get_json_object returns NULL")
    # rule 5: int64-storage decimal multiply (right width by balanced scan)
    for w1, w2 in dec_mul_pairs(sql):
        if w1 <= 18 and w2 <= 18 and w1 + w2 >= 19:
            problems.append(
                f"DECIMAL({w1},*) * DECIMAL({w2},*) — both stored int64 "
                f"and the declared envelopes admit an unscaled product "
                f"beyond int64 (w1+w2 = {w1 + w2} > 18 digits); declare "
                f"one side width 19 to force int128 (the sqlDsumsq rule)")
    # rule 6: string_agg without a coalesce guard ('' vs NULL on empty)
    if not re.search(r"--\s*agg:\s*nonempty", sql, re.I):
        n_all = len(re.findall(r"\bstring_agg\s*\(", sql, re.I))
        n_guarded = len(re.findall(r"\bcoalesce\s*\(\s*string_agg\s*\(",
                                   sql, re.I))
        if n_all > n_guarded:
            problems.append(
                f"{n_all - n_guarded} string_agg( without a coalesce( "
                f"guard — NULL over zero non-NULL values where Spark's "
                f"concat_ws/array_join says '' (q236/q108 class); wrap in "
                f"coalesce or mark `-- agg: nonempty` if the grouping "
                f"provably feeds every group")
    # rule 8: wide integer decimal cast directly to DOUBLE
    problems += wide_dec_double_hits(sql)
    # rule 9: candidate-generating oracles (blocked/banded/inverted
    # pair discovery — CTE names ending in `cand` or `sigs`) must state
    # their recall argument IN THE SQL (`recall:` comment), so a future
    # lossy blocking cannot silently weaken an oracle's completeness
    if re.search(r"\b\w*(?:cand|sigs)\s+AS\s*\(", sql, re.I) and \
            not re.search(r"recall\s*:", sql, re.I):
        problems.append(
            "candidate-generation CTE without a `-- recall:` statement — "
            "blocked/banded oracles must document why no qualifying pair "
            "can be missed (exact cover proof or quantified bound)")
    # rule 3: NULL-order sensitivity (executable differential). Without
    # an ORDER BY-bearing construct the result cannot depend on NULL
    # placement (canonical_rows sorts), so skip the two extra executions
    # — they tripled stage-5 DuckDB time on bigger sf dirs (r10 ADVICE).
    if re.search(r"\bOVER\s*\(|\bORDER\s+BY\b|\bLIMIT\b", sql, re.I):
        try:
            con.execute("SET default_null_order='nulls_last'")
            last = canonical_rows(con, sql)
            con.execute("SET default_null_order='nulls_first'")
            first = canonical_rows(con, sql)
            if last != first:
                problems.append(
                    "result changes under default_null_order flip — an "
                    "ordering key (window or LIMIT) is not total over NULLs; "
                    "COALESCE a sentinel or spell NULLS FIRST/LAST")
        except Exception as e:
            problems.append(f"null-order probe error: {str(e)[:160]}")
        finally:
            con.execute("SET default_null_order='nulls_last'")  # DuckDB default
    # rule 2: dtype cross-check vs the Spark dump
    spark_dump = f"{dumpdir}/{name}" if dumpdir else None
    if spark_dump and os.path.isdir(spark_dump):
        try:
            srel = con.sql(f"SELECT * FROM '{spark_dump}/*.parquet'")
            stypes = {c: str(t).upper()
                      for c, t in zip(srel.columns, srel.types)}
            for c, ot in otypes.items():
                st = stypes.get(c)
                if st is None:
                    continue  # column-set mismatch is compare.py's job
                if is_floating(ot) and st in INTEGRAL:
                    problems.append(
                        f"col {c}: oracle {ot} but Spark {st} (floor/"
                        f"division artifact — cast the oracle)")
                elif ot in INTEGRAL and is_floating(st):
                    problems.append(
                        f"col {c}: oracle {ot} but Spark {st} (cast one side)")
        except Exception as e:
            problems.append(f"spark dump unreadable: {str(e)[:120]}")
    return problems


def selftest():
    """Planted violations — one per mechanized class — must each fire,
    and a clean query must pass. Run by gate.sh so a lint regression
    (a rule silently stops firing) fails the gate, not a future round."""
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM (VALUES "
            "(1, 2.5, '{\"a\": 1}'), (NULL, 3.5, '{not json')) AS t(k, v, js)")
    plants = {
        "hugeint": ("SELECT sum(k) AS s FROM t", "HUGEINT"),
        "nullorder": ("SELECT k, sum(v) OVER (ORDER BY k) AS rs FROM t",
                      "default_null_order"),
        "json": ("SELECT json_extract_string(js, '$.a') AS a FROM t",
                 "json_valid"),
        "decmul": ("SELECT CAST(v AS DECIMAL(18,6)) * CAST(v AS "
                   "DECIMAL(18,6)) AS p FROM t", "force int128"),
        # nested right cast: inner width 12 would false-fire, the OUTER
        # width 19 is the actual (int128) storage — must stay clean
        "decmul_nested": ("SELECT CAST(v AS DECIMAL(18,6)) * "
                          "CAST(CAST(v AS DECIMAL(12,2)) AS DECIMAL(19,2)) "
                          "AS p FROM t", None),
        "stragg": ("SELECT k, string_agg(CAST(v AS VARCHAR), ',') AS s "
                   "FROM t GROUP BY k", "coalesce"),
        "stragg_guarded": ("SELECT k, coalesce(string_agg("
                           "CAST(v AS VARCHAR), ','), '') AS s "
                           "FROM t GROUP BY k", None),
        "stragg_waived": ("SELECT k, string_agg(CAST(v AS VARCHAR), ',') "
                          "AS s -- agg: nonempty\n FROM t GROUP BY k", None),
        # rule 8: 10^26 sits above the single-split portability bound
        # 2^83 the r10 code silently assumed — a direct DOUBLE cast of a
        # wide integer decimal must fire...
        "widedec": ("SELECT CAST(CAST('100000000000000000000000000' AS "
                    "DECIMAL(38,0)) AS DOUBLE) AS d", "sqlPortableDouble"),
        # ...while the portable-split mirror (radix literal present) and
        # an explicitly waived bounded cast both stay clean
        "widedec_split": ("SELECT (CAST(CAST(CAST('1' AS DECIMAL(38,0)) "
                          "AS HUGEINT) // 1073741824 AS DOUBLE) * "
                          "1073741824.0 + CAST(CAST(CAST('1' AS "
                          "DECIMAL(38,0)) AS HUGEINT) % 1073741824 "
                          "AS DOUBLE)) AS d", None),
        "widedec_waived": ("SELECT CAST(CAST(k AS DECIMAL(38,0)) "
                           "AS DOUBLE) AS d -- portable: bounded\n"
                           "FROM t", None),
        # rule 9: a candidate CTE without a recall statement fires...
        "candnorecall": ("WITH mycand AS (SELECT k FROM t) "
                         "SELECT k FROM mycand", "recall"),
        # ...and with one stays clean
        "candrecall": ("WITH -- recall: exact (identity blocking)\n"
                       "mycand AS (SELECT k FROM t) "
                       "SELECT k FROM mycand", None),
        "clean": ("SELECT CAST(sum(k) AS BIGINT) AS s, "
                  "CAST(round(sum(CAST(v AS DECIMAL(19,6)) * CAST(v AS "
                  "DECIMAL(19,6))), 4) AS DOUBLE) AS ss FROM t", None),
    }
    failed = []
    for name, (sql, expect) in plants.items():
        problems = lint_one(con, name, sql)
        if expect is None:
            if problems:
                failed.append(f"{name}: clean query flagged: {problems}")
        elif not any(expect in p for p in problems):
            failed.append(f"{name}: planted violation NOT caught "
                          f"(got: {problems})")
    # rule 7 canaries: planted engine-source text, call form only
    if not isfinite_hits("val x = sql(s\"isfinite($c)\")"):
        failed.append("isfinite: planted call NOT caught")
    if isfinite_hits("// NOT DuckDB's isfinite: prose mention\n"
                     "val ok = s\"isfinite($c)\"  // duckdb-only helper"):
        failed.append("isfinite: prose/waived line wrongly flagged")
    if failed:
        print("SELFTEST FAIL:\n  " + "\n  ".join(failed))
        sys.exit(1)
    print(f"selftest: {len(plants) + 2} canaries pass "
          "(hugeint, null-order, json, dec-mul+nested, string-agg x3, "
          "wide-dec x3, cand-recall x2, isfinite x2, clean)")
    sys.exit(0)


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    dumpdir = sys.argv[3] if len(sys.argv) > 3 else outdir
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # rule 7: engine-source scan (repo-root relative, like gate.sh runs)
    src_problems = lint_engine_sources(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for p in src_problems:
        print(f"FAIL engine-src: {p}")
        n_fail += 1
    for name, sql in sorted(oracle.items()):
        problems = lint_one(con, name, sql, dumpdir)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
    else:
        main()
