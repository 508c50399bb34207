#!/usr/bin/env python3
"""Scale-sweep analyzer (driver-side tooling, like check.py — NOT part of
the library): compares two full-bench detail files (e.g. sf0.1 vs the
ScaleGen 10x fixture) and emits the per-query scaling-exponent table for
SCALING.md.

For data scaled by factor F, a query taking t1 -> t2 has empirical
exponent  e = log(t2/t1) / log(F):  e~1 linear, e~0 scale-free
(bounded output / dimension-bounded), e~2 quadratic. Wall time on a
shared box is noisy, so the table also carries the cpu_sec exponent
(contention-robust) and the shuffle exponent (machine-independent).

Usage: scale_sweep.py <detail_small.json> <detail_big.json> [factor=10]
Prints a markdown table sorted by cpu exponent (worst first).
"""
import json
import math
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))["queries"]
    big = json.load(open(sys.argv[2]))["queries"]
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    lf = math.log(factor)

    rows = []
    for name, s in sorted(small.items()):
        b = big.get(name)
        if b is None or s.get("err") or b.get("err"):
            continue

        def expo(key, floor):
            # values below `floor` are timer/meter noise: exponents from
            # noise ratios are meaningless, report None ("—")
            v1, v2 = s.get(key, 0), b.get(key, 0)
            if v1 < floor or v2 < floor:
                return None
            return math.log(v2 / v1) / lf

        rows.append({
            "name": name,
            "sec1": s["sec"], "sec2": b["sec"],
            "e_wall": expo("sec", 0.15),
            "e_cpu": expo("cpu_sec", 0.3),
            "e_shuf": expo("shuffle_mb", 0.05),
        })

    rows.sort(key=lambda r: (r["e_cpu"] is None,
                             -(r["e_cpu"] or 0.0)))

    def f(v, nd=2):
        return "—" if v is None else f"{v:.{nd}f}"

    print("| query | sec@1x | sec@%gx | e_wall | e_cpu | e_shuffle |"
          % factor)
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['name']} | {r['sec1']:.2f} | {r['sec2']:.2f} "
              f"| {f(r['e_wall'])} | {f(r['e_cpu'])} | {f(r['e_shuf'])} |")

    tot1 = sum(r["sec1"] for r in rows)
    tot2 = sum(r["sec2"] for r in rows)
    print(f"\ntotal: {tot1:.1f}s -> {tot2:.1f}s "
          f"(e_wall={math.log(tot2 / tot1) / lf:.2f}, n={len(rows)})")
    cpu_known = [r for r in rows if r["e_cpu"] is not None]
    over = [r for r in cpu_known if r["e_cpu"] > 1.35]
    print(f"queries with cpu exponent > 1.35 (superlinear x log budget): "
          f"{len(over)} of {len(cpu_known)} measurable")
    for r in over:
        print(f"  {r['name']}: e_cpu={r['e_cpu']:.2f} "
              f"e_shuffle={f(r['e_shuf'])}")


if __name__ == "__main__":
    main()
