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
    operator symbol (Skew.q86QuantileSketch — a camelCase call site), or
    by short id in a test TITLE ("m06 CDC chunking"). Short ids are only
    counted in those two positions — a mention in a comment or an
    unrelated code line is NOT a gate (round-8 ADVICE: the old
    anywhere-in-file match let the UNGATED check pass without any
    assertion touching the query)."""
    full, short = {}, {}
    for path in glob.glob(os.path.join(ROOT, "src/test/scala/graft/*.scala")):
        base = os.path.basename(path)
        text = open(path, encoding="utf-8").read()
        for name in re.findall(r'"([a-z]+\d+[a-z0-9_]*)"', text):
            full.setdefault(name, set()).add(base)
        # short id in a test title, with a boundary that keeps t20 from
        # matching t200
        for title in re.findall(r'test\("([^"]*)"', text):
            for sid in re.findall(r'\b([a-z]{1,2}\d{2,3})(?=[^0-9]|$)',
                                  title):
                short.setdefault(sid, set()).add(base)
        # short id as a camelCase operator symbol (q86QuantileSketch(...))
        # on a non-comment line — an actual call site, not prose
        for line in text.splitlines():
            if line.lstrip().startswith(("//", "*", "/*")):
                continue
            for sid in re.findall(r'\b([a-z]{1,2}\d{2,3})(?=[A-Z])', line):
                short.setdefault(sid, set()).add(base)
    return full, short


def refs_for(name, full, short):
    sid = name.split("_")[0]
    return sorted(full.get(name, set()) | short.get(sid, set()))


def status_of(entry):
    # round-9 artifacts are self-describing: a `status` field where
    # "spec_gated" means oracle-less BY DESIGN (with its gate recorded)
    # and err unambiguously means broken
    st = entry.get("status")
    if st == "spec_gated":
        return "rows-only"
    if st == "hash_match":
        return "hash-match"
    if st == "error" or (st and st.endswith("_mismatch")):
        return "err" if st == "error" else st.upper()
    # legacy artifacts (pre-round-9, or the driver's own schema): the
    # oracle-less-by-design marker rides in the err field
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
