#!/usr/bin/env python3
"""Generate the per-query coverage ledger (docs/COVERAGE.md) mechanically
from the newest CORRECTNESS_r*.json plus the ScalaTest sources, so the
ledger can never drift from the artifacts the way a hand-maintained table
can (the round-6 m06 hand-sync slip).

For every registered query the row records:
  - oracle status straight from the driver's correctness artifact
    (hash-match / rows-only / err),
  - every spec file in src/test that references the query by name or by
    its operator symbol (the "gating spec" column for rows-only entries).

Usage: gen_ledger.py [correctness.json] > docs/COVERAGE.md
       (default: the lexically newest CORRECTNESS_r*.json in the repo root)
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_correctness():
    files = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    if not files:
        sys.exit("no CORRECTNESS_r*.json found")
    return files[-1]


def spec_index():
    """Map query name or short id -> spec files mentioning it. Queries
    are referenced in specs either by full name ("q137_psi_drift"), by
    operator symbol (Skew.q86QuantileSketch), or by short id in a test
    title ("m06 CDC chunking"); index all three, with a boundary that
    keeps t20 from matching t200."""
    full, short = {}, {}
    for path in glob.glob(os.path.join(ROOT, "src/test/scala/graft/*.scala")):
        base = os.path.basename(path)
        text = open(path, encoding="utf-8").read()
        for name in re.findall(r'"([a-z]+\d+[a-z0-9_]*)"', text):
            full.setdefault(name, set()).add(base)
        for sid in re.findall(r'\b([a-z]{1,2}\d{2,3})(?=[A-Z_ :.,)"\'/]|$)',
                              text):
            short.setdefault(sid, set()).add(base)
    return full, short


def refs_for(name, full, short):
    sid = name.split("_")[0]
    return sorted(full.get(name, set()) | short.get(sid, set()))


def status_of(entry):
    # the driver marks oracle-less (rows-only-by-design) queries with
    # err="no_oracle"; any other err is a real query failure
    if entry.get("err") == "no_oracle":
        return "rows-only"
    if entry.get("err"):
        return "err"
    if entry.get("hash_match"):
        return "hash-match"
    return "HASH-FAIL" if entry.get("rows_match") else "ROWS-FAIL"


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else newest_correctness()
    data = json.load(open(src))
    full, short = spec_index()
    counts = {}
    lines = [
        "# Coverage ledger (generated)",
        "",
        f"Source artifact: `{os.path.basename(src)}` ({len(data)} queries).",
        "Regenerate with `python3 scripts/gen_ledger.py > docs/COVERAGE.md`.",
        "",
        "| query | oracle status | spark rows | gating specs |",
        "|---|---|---|---|",
    ]
    for name in sorted(data):
        e = data[name]
        st = status_of(e)
        counts[st] = counts.get(st, 0) + 1
        specs = refs_for(name, full, short)
        lines.append(
            f"| {name} | {st} | {e.get('spark_rows')} | "
            f"{', '.join(specs) if specs else '—'} |")
    summary = ", ".join(f"{v} {k}" for k, v in sorted(counts.items()))
    lines.insert(4, f"Status counts: {summary}.")
    # rows-only entries must each carry at least one gating spec -- the
    # round-7 verdict's "100% green-by-some-gate" claim, kept honest here
    ungated = [n for n in sorted(data)
               if status_of(data[n]) == "rows-only"
               and not refs_for(n, full, short)]
    if ungated:
        lines.insert(5, f"**UNGATED rows-only queries: {ungated}**")
    print("\n".join(lines))
    if ungated:
        sys.exit(f"ungated rows-only queries: {ungated}")


if __name__ == "__main__":
    main()
