#!/usr/bin/env python3
"""Round-over-round bench comparison.

Usage: bench_compare.py PREV CURR [out.md]

PREV: a BENCH_DETAIL_r0N.json (full per-query map) or a BENCH_r0N.json
driver snapshot (whose stdout tail carries the headline+slowest subset —
the only credible per-query numbers for rounds before the detail file was
versioned). CURR: a BENCH_DETAIL json. Emits a markdown delta table of
every query present in BOTH, worst regressions first.
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        doc = json.load(f)
    # detail file: {"queries": {name: {"sec": s, ...}}}
    q = doc.get("queries")
    if isinstance(q, dict) and q and isinstance(next(iter(q.values())), dict):
        return {k: v["sec"] for k, v in q.items() if v.get("sec", -1) >= 0}, doc
    # driver snapshot: stdout JSON line embedded in the "tail" field.
    # Parse per line (a later log line containing '}' must not extend the
    # match and break json.loads).
    if "tail" in doc:
        for line in doc["tail"].replace("\\\"", '"').splitlines():
            m = re.search(r'\{"metric":.*\}', line)
            if m:
                try:
                    inner = json.loads(m.group(0))
                except json.JSONDecodeError:
                    continue
                return {k: v for k, v in inner.get("queries", {}).items()
                        if v >= 0}, inner
    # stdout-shaped: {"queries": {name: sec}}
    if isinstance(q, dict):
        return {k: v for k, v in q.items() if v >= 0}, doc
    raise SystemExit(f"unrecognized bench shape: {path}")


def main():
    prev_path, curr_path = sys.argv[1], sys.argv[2]
    prev, prev_doc = load(prev_path)
    curr, curr_doc = load(curr_path)
    common = sorted(set(prev) & set(curr),
                    key=lambda k: curr[k] - prev[k], reverse=True)
    lines = [
        f"Comparing {prev_path} ({len(prev)} queries) -> "
        f"{curr_path} ({len(curr)} queries); {len(common)} in both.",
        "",
        "| query | prev s | curr s | delta s | ratio |",
        "|---|---|---|---|---|",
    ]
    for k in common:
        p, c = prev[k], curr[k]
        ratio = (c / p) if p > 0 else float("inf")
        lines.append(f"| {k} | {p:.3f} | {c:.3f} | {c - p:+.3f} | {ratio:.2f}x |")
    pt = sum(prev[k] for k in common)
    ct = sum(curr[k] for k in common)
    lines += ["",
              f"Common-subset totals: {pt:.2f}s -> {ct:.2f}s "
              f"({ct - pt:+.2f}s, {ct / pt:.2f}x)" if pt else ""]
    new = sorted(set(curr) - set(prev))
    if new:
        ns = sum(curr[k] for k in new)
        lines.append(f"New queries this round ({len(new)}, {ns:.2f}s total): "
                     + ", ".join(new))
    out = "\n".join(lines) + "\n"
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            f.write(out)
    print(out)


if __name__ == "__main__":
    main()
