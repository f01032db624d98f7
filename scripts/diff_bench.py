#!/usr/bin/env python3
"""Diff two bench_full.json captures (e.g. BENCH_FULL_r08 vs the new
round's run) into a per-query regression report.

Host weather moves whole captures up and down together (the round-8
verdict measured +28% between two same-day runs with ~17% calibration
drift), so raw ratios conflate load with regressions. This report:

 - normalizes each capture by its calibration probe (a fixed query
   timed before/after the sweep, stored as calibration_sec),
 - reports the median raw and calibration-normalized ratio,
 - lists the worst normalized regressions with absolute deltas, so a
   1.4x on a 0.2s query (scheduling noise) reads differently from a
   1.4x on a 7s query (a real problem).

Usage: diff_bench.py <old_bench_full.json> <new_bench_full.json>
Exit 1 if any query regresses >1.5x normalized AND >1.0s absolute —
the double gate that host noise on sub-second queries cannot trip.
"""
import json
import sys


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    qo = {k: v["sec"] for k, v in old["queries"].items()}
    qn = {k: v["sec"] for k, v in new["queries"].items()}
    names = sorted(set(qo) & set(qn))
    co, cn = old["calibration_sec"], new["calibration_sec"]
    # calibration_sec is {"before": s, "after": s} (a list or scalar in
    # older captures)
    def cal(c):
        if isinstance(c, dict):
            c = list(c.values())
        return sum(c) / len(c) if isinstance(c, list) else float(c)
    weather = cal(cn) / cal(co)

    # Round-11 captures carry per-query norm_sec (each trial divided by
    # its g-position-interpolated calibration probe — Bench.scala's
    # interleaved series). When BOTH captures have it, compare those
    # directly: per-query load correction beats one global weather
    # factor, which is exactly the round-10 verdict's complaint.
    def norms(cap):
        qs = cap["queries"]
        if all("norm_sec" in v for v in qs.values()):
            return {k: v["norm_sec"] for k, v in qs.items()}
        return None
    no, nn = norms(old), norms(new)
    per_query_norm = no is not None and nn is not None

    ratios = sorted(qn[n] / qo[n] for n in names if qo[n] > 0)
    med = ratios[len(ratios) // 2]
    print(f"queries compared: {len(names)} "
          f"(old only: {len(set(qo) - set(qn))}, "
          f"new only: {len(set(qn) - set(qo))})")
    print(f"calibration: old={cal(co):.3f}s new={cal(cn):.3f}s "
          f"-> host-weather factor {weather:.2f}x")
    if per_query_norm:
        nrat = sorted(nn[n] / no[n] for n in names if no[n] > 0)
        print(f"median ratio: raw {med:.2f}x, per-query-probe-normalized "
              f"{nrat[len(nrat) // 2]:.2f}x (norm_sec from both captures)")
    else:
        print(f"median ratio: raw {med:.2f}x, "
              f"calibration-normalized {med / weather:.2f}x")
    print(f"total: old={sum(qo[n] for n in names):.1f}s "
          f"new={sum(qn[n] for n in names):.1f}s")

    rows = []
    failures = []  # ran before, failed now (sec/norm_sec == -1)
    for n in names:
        if qo[n] <= 0:
            continue
        # a query that FAILED only in the new capture records -1: a
        # negative ratio would sort to the bottom and sail past the
        # gate — a regression-to-failure must be an automatic entry
        if qn[n] < 0 or (per_query_norm and no[n] > 0 and nn[n] < 0):
            failures.append(n)
            continue
        if per_query_norm and no[n] > 0:
            norm = nn[n] / no[n]
        else:
            norm = qn[n] / qo[n] / weather
        rows.append((norm, qn[n] - qo[n], n, qo[n], qn[n]))
    rows.sort(reverse=True)
    print("\nworst normalized ratios:")
    for norm, delta, n, a, b in rows[:10]:
        print(f"  {n:40s} {a:7.2f}s -> {b:7.2f}s  "
              f"{norm:5.2f}x norm  {delta:+6.2f}s")

    bad = [(n, norm, delta) for norm, delta, n, a, b in rows
           if norm > 1.5 and delta > 1.0]
    if failures:
        print(f"\nREGRESSED TO FAILURE (ran in old, -1 in new): {failures}")
    if bad:
        print(f"\nREGRESSIONS (normalized >1.5x AND >1.0s): {bad}")
    elif not failures:
        print("\nno regressions past the 1.5x-normalized + 1.0s-absolute "
              "double gate")
    sys.exit(1 if bad or failures else 0)


if __name__ == "__main__":
    main()
