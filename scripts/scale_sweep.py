#!/usr/bin/env python3
"""Scale-sweep analyzer (driver-side tooling, like check.py — NOT part of
the library): compares full-bench detail files across fixture scales and
emits the per-query scaling-exponent table for SCALING.md.

With two files the exponent is the point estimate
e = log(t2/t1)/log(F); with three or more it is the slope of a
least-squares fit of log t against log scale — robust to one noisy
point. Wall time on a shared box is noisy, so the table also carries
the cpu_sec exponent (contention-robust) and the shuffle exponent
(machine-independent).

Usage:
  scale_sweep.py small.json big.json [factor=10]
  scale_sweep.py --multi s1.json F1 s2.json F2 s3.json F3 ...
Prints a markdown table sorted by cpu exponent (worst first).
"""
import json
import math
import sys


def slope(points):
    """Least-squares slope of log(v) vs log(scale); None if <2 points."""
    pts = [(math.log(f), math.log(v)) for f, v in points if v and v > 0]
    if len(pts) < 2:
        return None
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    den = n * sxx - sx * sx
    if den == 0:
        return None
    return (n * sxy - sx * sy) / den


def main() -> None:
    if sys.argv[1] == "--multi":
        args = sys.argv[2:]
        runs = [(json.load(open(args[i]))["queries"], float(args[i + 1]))
                for i in range(0, len(args), 2)]
    else:
        runs = [(json.load(open(sys.argv[1]))["queries"], 1.0),
                (json.load(open(sys.argv[2]))["queries"],
                 float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)]

    base = runs[0][0]
    top = runs[-1][0]
    rows = []
    for name, s in sorted(base.items()):
        if any(name not in q or q[name].get("err") for q, _ in runs):
            continue

        def expo(key, floor):
            # values below `floor` are timer/meter noise
            pts = [(f, q[name].get(key, 0)) for q, f in runs]
            if any(v < floor for _, v in pts):
                return None
            return slope(pts)

        rows.append({
            "name": name,
            "sec1": s["sec"], "secN": top[name]["sec"],
            "e_wall": expo("sec", 0.15),
            "e_cold": expo("wall1_sec", 0.15),
            "e_cpu": expo("cpu_sec", 0.3),
            "e_shuf": expo("shuffle_mb", 0.05),
        })

    rows.sort(key=lambda r: (r["e_cpu"] is None, -(r["e_cpu"] or 0.0)))

    def f(v, nd=2):
        return "—" if v is None else f"{v:.{nd}f}"

    top_f = runs[-1][1]
    print(f"| query | sec@1x | sec@{top_f:g}x | e_wall | e_cold | e_cpu "
          "| e_shuffle |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['name']} | {r['sec1']:.2f} | {r['secN']:.2f} "
              f"| {f(r['e_wall'])} | {f(r.get('e_cold'))} | {f(r['e_cpu'])} "
              f"| {f(r['e_shuf'])} |")

    tot = [(fa, sum(q[r["name"]]["sec"] for r in rows)) for q, fa in runs]
    e_tot = slope(tot)
    print(f"\ntotals: " + ", ".join(f"{fa:g}x={t:.1f}s" for fa, t in tot) +
          f" (e_wall={e_tot:.2f}, n={len(rows)})")
    cpu_known = [r for r in rows if r["e_cpu"] is not None]
    over = [r for r in cpu_known if r["e_cpu"] > 1.35]
    print(f"queries with cpu exponent > 1.35 (superlinear x log budget): "
          f"{len(over)} of {len(cpu_known)} measurable")
    for r in over:
        print(f"  {r['name']}: e_cpu={r['e_cpu']:.2f} "
              f"e_shuffle={f(r['e_shuf'])}")
    # e_cold catches work a CacheScope cache hides from `sec` (min-of-2
    # measures the warm second run): a query whose cold run scales
    # superlinearly is flagged even when its warm read stays flat.
    cold_known = [r for r in rows if r.get("e_cold") is not None]
    cold_over = [r for r in cold_known if r["e_cold"] > 1.35]
    print(f"queries with COLD-run exponent > 1.35: "
          f"{len(cold_over)} of {len(cold_known)} measurable")
    for r in cold_over:
        print(f"  {r['name']}: e_cold={r['e_cold']:.2f} "
              f"e_cpu={f(r['e_cpu'])}")


if __name__ == "__main__":
    main()
