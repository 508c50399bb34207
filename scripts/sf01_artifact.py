#!/usr/bin/env python3
"""Assemble CORRECTNESS_SF01.json from a streamed check.py log (driver-side
tooling, like check.py — NOT part of the library).

Usage: sf01_artifact.py <check_log> <sf_dir> <out_json> [note]
Parses the per-query verdict lines check.py streams:
  [q_name] pass (N rows) T.Ts
  [q_name] FAIL ...
"""
import json
import re
import sys

log, sf_dir, out = sys.argv[1], sys.argv[2], sys.argv[3]
note = sys.argv[4] if len(sys.argv) > 4 else ""

rx_pass = re.compile(r"^\[(\S+)\] pass \((\d+) rows\) ([0-9.]+)s")
rx_fail = re.compile(r"^\[(\S+)\] FAIL (.*)")
queries, fails = {}, {}
for line in open(log):
    m = rx_pass.match(line)
    if m:
        queries[m.group(1)] = {"rows": int(m.group(2)),
                               "oracle_sec": round(float(m.group(3)), 1)}
        continue
    m = rx_fail.match(line)
    if m:
        fails[m.group(1)] = m.group(2).strip()

artifact = {
    "sweep": "full-catalog DuckDB oracle comparison at sf0.1 "
             "(VERDICT r10 next-round #2)",
    "sf_dir": sf_dir,
    "n_queries": len(queries) + len(fails),
    "n_pass": len(queries),
    "n_fail": len(fails),
    "note": note,
    "queries": dict(sorted(queries.items())),
}
if fails:
    artifact["failures"] = dict(sorted(fails.items()))
json.dump(artifact, open(out, "w"), indent=1)
print(f"{out}: {len(queries)} pass, {len(fails)} fail")
