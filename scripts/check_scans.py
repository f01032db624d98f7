#!/usr/bin/env python3
"""Multi-scan ratchet: mechanize the plan-audit adjudication that was
previously a hand process (and that missed q135's hidden double fact
scan until round 9's EmptyRelation fallback exposed it).

Every PLAN_AUDIT row whose scans column contains `table×N` must have a
matching entry in scripts/scan_whitelist.json recording the EXACT scans
cell and a reason. The check fails when:
  - a multi-scan row is not whitelisted (a NEW multi-scan appeared), or
  - a whitelisted row's scans cell CHANGED (an adjudicated query grew a
    new or wider re-scan — e.g. lineitem×2 became ×3), or
  - a whitelist entry has an empty reason.
A query whose scans cell returns to single-scan is reported as stale so
the entry can be dropped (the ratchet only ever tightens).

Usage:
  check_scans.py                 # verify (exit 1 on any violation)
  check_scans.py --update NAME   # adopt NAME's current scans cell,
                                 # keeping its reason (must exist; add
                                 # new entries by hand, with a reason)
"""
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
AUDIT = os.path.join(HERE, "..", "docs", "PLAN_AUDIT.md")
WL = os.path.join(HERE, "scan_whitelist.json")


def audit_rows():
    rows = {}
    for line in open(AUDIT):
        m = re.match(r"^\| ([a-z][a-z0-9_]+) \|", line)
        if not m:
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) >= 6:
            rows[cells[0]] = cells[5]
    return rows


def main():
    rows = audit_rows()
    wl = json.load(open(WL)) if os.path.exists(WL) else {}
    multi = {n: s for n, s in rows.items() if "×" in s}

    if len(sys.argv) > 2 and sys.argv[1] == "--update":
        name = sys.argv[2]
        if name not in wl:
            sys.exit(f"--update {name}: not whitelisted; add a new entry "
                     "by hand with a reason")
        if name not in multi:
            sys.exit(f"--update {name}: no longer multi-scan; delete its "
                     "entry instead")
        wl[name]["scans"] = multi[name]
        json.dump(wl, open(WL, "w"), indent=1, sort_keys=True)
        print(f"updated {name} -> {multi[name]}")
        return

    bad = 0
    for n, s in sorted(multi.items()):
        if n not in wl:
            print(f"NEW multi-scan not adjudicated: {n} [{s}]")
            bad += 1
        elif wl[n].get("scans") != s:
            print(f"CHANGED scans for {n}: whitelisted "
                  f"[{wl[n].get('scans')}] vs audit [{s}]")
            bad += 1
        elif not wl[n].get("reason", "").strip():
            print(f"EMPTY reason for {n}")
            bad += 1
    for n in sorted(set(wl) - set(multi)):
        print(f"STALE whitelist entry (now single-scan): {n} — delete it")
        bad += 1

    print(f"\n{len(multi)} multi-scan rows, {bad} violations")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
