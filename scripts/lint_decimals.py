#!/usr/bin/env python3
"""Decimal-literal lint (round-9 verdict item 7, the t23 lesson).

A bare decimal literal in oracle SQL (`1.015`, `84.6`) parses as DECIMAL
in DuckDB; combined with an INTEGER-derived operand the whole expression
stays in decimal arithmetic and rounds differently from the Spark twin's
DOUBLE math (t23 flesch: 5 of 5,000 docs crossed the r4 boundary at
sf0.1). Combined with a DOUBLE operand the literal converts and is safe.

Instead of a regex + hand-maintained whitelist of the ~90 safe sites,
this lint checks the semantics directly: for every oracle whose SQL
contains a bare decimal literal, run the SQL as-is AND with every bare
literal rewritten to CAST(lit AS DOUBLE), then compare the two DuckDB
results at BOTH levels:

 - type level (DESCRIBE): a column that is DECIMAL in the original but
   DOUBLE after the rewrite proves decimal arithmetic reaches the
   output. This is the mechanism check and is scale-independent —
   boundary-value collisions can hide the divergence at small SF (t23
   hit 5 of 5,000 docs only at sf0.1), but the type never lies.
 - value level: exact compare of both results, catching decimal
   arithmetic that feeds a non-DECIMAL output (e.g. through a CAST or
   a comparison) where the type check is blind.

A hit at either level FAILS the lint with the offending column. Safe
sites (literal meets a DOUBLE operand → converts immediately) pass both
levels on their own.

Because a value collision at the test SF can hide a real divergence (the
class is boundary-crossing, hence data-dependent), the lint is also a
RATCHET: every oracle containing a bare decimal literal must be recorded
in scripts/decimal_whitelist.json (name -> sha1 of its SQL), meaning its
sites were domain-swept safe (round 8) and re-verified by the semantic
tiers. A new or edited oracle with bare literals FAILS until the author
rewrites the literals with e0 (preferred) or re-sweeps and refreshes the
whitelist with --update (which only succeeds when the semantic tiers are
green). The ratchet can tighten, never silently widen.

Usage: lint_decimals.py <sfDir> <oracle_sql.json | verifyOutDir> [--update]
Runs at sf0.1 in round_checkpoint.sh (the largest local SF — maximal
boundary-crossing sensitivity for the value tier; the full sf0.1 oracle
sweep vs Spark stays the backstop).
"""
import sys, json, os, re, hashlib
import duckdb
import pandas as pd

sfdir, src = sys.argv[1], sys.argv[2]
selftest = src == "--selftest"
# --update never combines with --selftest: the refresh path must only
# ever see the real oracle set, not the synthetic selftest entries
update = "--update" in sys.argv[3:] and not selftest
if selftest:
    # the lint linting itself: the t23 class MUST flag (an unknown
    # oracle with a bare decimal literal trips the ratchet; the same
    # SQL written with e0 passes) — guards the lint against regex or
    # ratchet rot without touching the real whitelist
    oracle = {
        "selftest_bad_flesch":
            "SELECT doc_id, round((206.835 - 1.015 * n_tokens) * 10000)"
            " / 10000 AS score FROM (SELECT doc_id, length(text) // 5"
            " AS n_tokens FROM documents) t",
        "selftest_good_flesch":
            "SELECT doc_id, round((206.835e0 - 1.015e0 * n_tokens) *"
            " 10000) / 10000 AS score FROM (SELECT doc_id, length(text)"
            " // 5 AS n_tokens FROM documents) t",
    }
else:
    if os.path.isdir(src):
        src = os.path.join(src, "oracle_sql.json")
    oracle = json.load(open(src))
WL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "decimal_whitelist.json")
whitelist = json.load(open(WL_PATH)) if os.path.exists(WL_PATH) else {}

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sfdir}/{t}.parquet')")

# bare decimal literal: digits.digits not adjacent to word chars, another
# dot (1.2.3), or an exponent marker (1.5e0 is the FIX, never flag it)
LIT = re.compile(r"(?<![\w.])(\d+\.\d+)(?![\w.])")
# split out single-quoted SQL strings so 'v1.5' etc. are never rewritten
STR = re.compile(r"('(?:[^']|'')*')")


def doubled(sql):
    parts = STR.split(sql)
    return "".join(p if i % 2 else LIT.sub(r"CAST(\1 AS DOUBLE)", p)
                   for i, p in enumerate(parts))


def has_bare_literal(sql):
    return any(LIT.search(p) for i, p in enumerate(STR.split(sql))
               if i % 2 == 0)


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(list(v))
                              if hasattr(v, "__len__")
                              and not isinstance(v, (str, bytes)) else v)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def coltypes(sql):
    d = con.sql("DESCRIBE " + sql).df()
    return dict(zip(d["column_name"], d["column_type"]))


def sig(sql):
    return hashlib.sha1(sql.encode("utf-8")).hexdigest()[:16]


checked, flagged, swept = 0, [], {}
for name in sorted(oracle):
    sql = oracle[name]
    if not has_bare_literal(sql):
        continue
    checked += 1
    if not update and whitelist.get(name) != sig(sql):
        flagged.append(
            (name, "bare decimal literal in a new/edited oracle — "
                   "rewrite with e0, or domain-sweep and re-run the "
                   "lint with --update"))
        continue
    try:
        ta, tb = coltypes(sql), coltypes(doubled(sql))
        a = canon(con.sql(sql).df())
        b = canon(con.sql(doubled(sql)).df())
    except Exception as e:
        flagged.append((name, f"lint rewrite failed to run: {e}"))
        continue
    tdiff = [(c, ta[c], tb.get(c)) for c in ta if ta[c] != tb.get(c)]
    if tdiff:
        c, orig, doub = tdiff[0]
        flagged.append(
            (name, f"column {c} is {orig} in the oracle but {doub} "
                   f"under CAST-to-DOUBLE — decimal arithmetic reaches "
                   f"the output; write the literal with e0"))
        continue
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        flagged.append((name, "shape differs under CAST-to-DOUBLE"))
        continue
    ok = True
    for c in a.columns:
        # python float str is shortest-round-trip — distinct doubles
        # stringify distinctly, so this is a bit-level compare
        if not (a[c].astype(str) == b[c].astype(str)).all():
            i = (a[c].astype(str) != b[c].astype(str)).idxmax()
            flagged.append(
                (name, f"column {c} diverges decimal-vs-double "
                       f"(e.g. {a[c][i]} vs {b[c][i]}) — write the "
                       f"literal with e0 or CAST AS DOUBLE"))
            ok = False
            break
    if ok:
        swept[name] = sig(sql)

for name, why in flagged:
    print(f"FAIL {name}: {why}")
# whitelist entries for oracles that no longer carry bare literals (or
# were removed) are dropped — the ratchet tightens automatically
if update and not flagged:
    with open(WL_PATH, "w") as f:
        json.dump(swept, f, indent=1, sort_keys=True)
    print(f"whitelist refreshed: {len(swept)} swept-safe oracles")
elif update:
    print("whitelist NOT refreshed — semantic tier flagged entries")
print(f"\n{len(oracle)} oracles, {checked} with bare decimal literals, "
      f"{len(flagged)} flagged")
if selftest:
    ok = ([n for n, _ in flagged] == ["selftest_bad_flesch"])
    print("selftest " + ("PASS" if ok else
          "FAIL: expected exactly selftest_bad_flesch flagged"))
    sys.exit(0 if ok else 1)
sys.exit(1 if flagged else 0)
