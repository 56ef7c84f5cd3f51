#!/usr/bin/env python3
"""Round-over-round bench diff, noise-robust.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [threshold_ratio] [threshold_sec]

Reads two bench_full_*.json artifacts (graft.Bench output) and diffs
per-query EXEC time using the most noise-robust number each side
carries: `exec_min` (per-query min over SPARK_GRAFT_REPEATS re-executions,
present since round 9) when available, else single-run `exec`.

Host-noise handling: this box shows uniform multiplicative swings of up
to +/-30% between full sweeps (round 8 nearly mis-read a 1.27x uniform
shift as a regression). The diff therefore prints the MEDIAN per-query
ratio first — a code regression concentrates in specific queries, while
a host factor moves every query by the same multiple — and then flags
only queries whose ratio exceeds `threshold_ratio` (default 2.0) AFTER
dividing out the median, with an absolute floor of `threshold_sec`
(default 1.0 s) so micro-queries' jitter doesn't page anyone.
"""
import json
import statistics
import sys


def execs(artifact, field):
    m = artifact.get(field) or {}
    return {q: v for q, v in m.items() if v >= 0}


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    # Use exec_min ONLY when BOTH sides carry it: min-of-N warm repeats is
    # structurally lower than one cold run, so mixing the two definitions
    # would bias every ratio toward phantom improvement (or regression).
    field = "exec_min" if (old.get("exec_min") and new.get("exec_min")) else "exec"
    eo, en = execs(old, field), execs(new, field)
    common = sorted(set(eo) & set(en))
    added = sorted(set(en) - set(eo))
    removed = sorted(set(eo) - set(en))
    src_old = src_new = field
    print(f"old: {len(eo)} queries ({src_old}); new: {len(en)} queries ({src_new}); "
          f"common {len(common)}, added {added or 'none'}, removed {removed or 'none'}")
    to = sum(eo[q] for q in common)
    tn = sum(en[q] for q in common)
    ratios = [(en[q] / eo[q]) for q in common if eo[q] > 0.01 and en[q] > 0.01]
    med = statistics.median(ratios) if ratios else 1.0
    print(f"common-query exec totals: {to:.1f}s -> {tn:.1f}s ({tn / to:.2f}x); "
          f"median per-query ratio {med:.2f} (uniform != regression: "
          f"a host factor moves EVERY query by the same multiple)")
    flagged = []
    for q in common:
        if en[q] < floor and eo[q] < floor:
            continue
        norm = (en[q] / eo[q]) / med if eo[q] > 0 else float("inf")
        if norm >= thr:
            flagged.append((norm, q, eo[q], en[q]))
    if not flagged:
        print(f"no query exceeds {thr}x after median normalization "
              f"(abs floor {floor}s) — no concentrated regression")
    else:
        print(f"queries > {thr}x after median normalization (re-run these "
              f"ISOLATED before calling them regressions):")
        for norm, q, o, n in sorted(flagged, reverse=True):
            print(f"  {q}: {o:.2f}s -> {n:.2f}s ({norm:.2f}x normalized)")


if __name__ == "__main__":
    main()
