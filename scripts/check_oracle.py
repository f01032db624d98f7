#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each
SparkEntry query's parquet dump (written by graft.Verify) and compare to
the DuckDB result of the matching oracle SQL over the same test tables.
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_ledger import spec_index, refs_for

# --partial: the dump dir holds a targeted (prefix) Verify run, so only
# check queries that were actually dumped. WITHOUT the flag a missing
# dump is a FAILURE — that default is the protection against a query
# silently vanishing from a full sweep; never use --partial on one.
argv = [a for a in sys.argv[1:] if a != "--partial"]
partial = "--partial" in sys.argv
sfdir, outdir = argv[0], argv[1]
# optional third arg: write a CORRECTNESS_r*-shaped JSON artifact so a
# non-driver run (e.g. the sf0.1 sweep) is mechanically diffable
json_out = argv[2] if len(argv) > 2 else None
report = {}

# `err` must unambiguously mean BROKEN (round-8 verdict nit #1): queries
# that are oracle-less BY DESIGN get status="spec_gated" + their gating
# spec names instead of an err, so a consumer reading the artifact at
# face value sees 21 gated estimates, not 21 errors.
SPEC_FULL, SPEC_SHORT = spec_index()

def record(name, rows_match=None, schema_match=None, hash_match=None,
           spark_rows=None, oracle_rows=None, err=None, status=None,
           gate=None):
    report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                    "hash_match": hash_match, "spark_rows": spark_rows,
                    "oracle_rows": oracle_rows, "err": err,
                    "status": status, "gate": gate}
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # arrays/lists are unhashable for sorting — stringify object columns
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(list(v)) if hasattr(v, "__len__")
                              and not isinstance(v, (str, bytes)) else v)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name in sorted(oracle):
    if partial and not os.path.isdir(os.path.join(outdir, name)):
        continue
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1
        record(name, err="no_spark_output", status="error"); continue
    spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
    try:
        duck_df = canon(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1
        record(name, spark_rows=len(spark_df), err=f"oracle_error: {e}",
               status="error")
        continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        fails += 1
        record(name, schema_match=False, spark_rows=len(spark_df),
               oracle_rows=len(duck_df), status="schema_mismatch"); continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
        fails += 1
        record(name, rows_match=False, schema_match=True,
               spark_rows=len(spark_df), oracle_rows=len(duck_df),
               status="rows_mismatch"); continue
    # value compare (exact, like a hash compare would be).
    # The driver hashes TYPED values, so an int64 column on one side vs
    # a float/HUGEINT-widened column on the other must FAIL here too —
    # a float-coercing compare hid exactly that divergence in round 6.
    def dclass(s):
        k = s.dtype.kind
        if k in "iu": return "int"
        if k == "f": return "float"
        if k == "b": return "bool"
        if k == "M": return "ts"
        if k == "O":
            import datetime
            v = next((x for x in s if x is not None
                      and not (isinstance(x, float) and pd.isna(x))), None)
            if isinstance(v, bool): return "bool"
            if isinstance(v, int): return "int"
            if isinstance(v, float): return "float"
            # Spark parquet DATE -> object of datetime.date; DuckDB dumps
            # datetime64 — same logical type, canonicalized at compare time
            if isinstance(v, (datetime.date, datetime.datetime)): return "ts"
            return "obj"
        return k
    bad = []
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        ca, cb = dclass(a), dclass(b)
        if ca != cb:
            bad.append((c, f"dtype {a.dtype}/{ca} vs {b.dtype}/{cb}"))
            continue
        try:
            if ca == "ts":
                ta, tb = pd.to_datetime(a), pd.to_datetime(b)
                eq = (ta.isna() == tb.isna()).all() and \
                    (ta.dropna().values == tb.dropna().values).all()
            elif ca == "float":
                # NULL-mask must match AND non-null values must be
                # bit-equal (no fillna conflation of NaN with a value)
                na_a, na_b = a.isna(), b.isna()
                eq = (na_a == na_b).all() and \
                    (a[~na_a].astype(float).values ==
                     b[~na_b].astype(float).values).all()
            else:
                eq = (a.astype(str) == b.astype(str)).all()
        except Exception:
            eq = (a.astype(str) == b.astype(str)).all()
        if not eq:
            n_mismatch = int((a.astype(str) != b.astype(str)).sum())
            bad.append((c, n_mismatch))
    if bad:
        print(f"FAIL {name}: value mismatch {bad}")
        for c, _ in bad[:2]:
            m = spark_df[c].astype(str) != duck_df[c].astype(str)
            print("  spark:", spark_df[m][c].head(3).tolist(),
                  " duck:", duck_df[m][c].head(3).tolist())
        fails += 1
        record(name, rows_match=True, schema_match=True, hash_match=False,
               spark_rows=len(spark_df), oracle_rows=len(duck_df),
               status="value_mismatch")
    else:
        print(f"OK   {name} ({len(spark_df)} rows)")
        record(name, rows_match=True, schema_match=True, hash_match=True,
               spark_rows=len(spark_df), oracle_rows=len(duck_df),
               status="hash_match")

# oracle-less-by-design queries (sketch/ANN/implementation-defined):
# non-empty output + a named ScalaTest gate. Zero rows is a FAILURE and
# recorded with a distinct err so the generated ledger surfaces it
# (round-8 ADVICE: err="no_oracle" hid a red run as benign rows-only).
for p in sorted(glob.glob(os.path.join(outdir, "*"))):
    name = os.path.basename(p)
    if not os.path.isdir(p) or name in oracle:
        continue
    files = glob.glob(os.path.join(p, "*.parquet"))
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    gate = refs_for(name, SPEC_FULL, SPEC_SHORT)
    print(("OK  " if n > 0 else "FAIL") +
          f" {name} spec-gated ({n} rows; gate={','.join(gate) or 'NONE'})")
    if n == 0:
        record(name, spark_rows=0, err="no_oracle_zero_rows",
               status="error", gate=gate or None)
        fails += 1
    else:
        record(name, spark_rows=n, status="spec_gated", gate=gate or None)

if json_out:
    with open(json_out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)

print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
