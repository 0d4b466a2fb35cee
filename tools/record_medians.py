#!/usr/bin/env python3
"""Driver-side tooling (NOT part of the Spark library): pool >=3
[bench-full] lines from graft.Bench runs into per-query medians for
BASELINE.md. Usage: record_medians.py run1.json run2.json ..."""
import json, statistics, sys


def main(paths):
    runs = []
    for p in paths:
        line = open(p).read().strip()
        runs.append(json.loads(line.replace("[bench-full] ", ""))["queries"])
    keys = sorted(set().union(*[r.keys() for r in runs]))
    med = {}
    for k in keys:
        vals = [r[k] for r in runs if k in r and r[k] >= 0]
        if vals:
            med[k] = round(statistics.median(vals), 3)
    totals = [sum(v for v in r.values() if v >= 0) for r in runs]
    print(f"# runs: totals = {[round(t, 1) for t in totals]}")
    print(f"# sum of per-query medians: {round(sum(med.values()), 1)} over {len(med)} queries")
    items = sorted(med.items())
    out = []
    line = ""
    for k, v in items:
        tok = f'"{k}": {v}'
        if len(line) + len(tok) > 66:
            out.append(line.rstrip())
            line = " "
        line += tok + ", "
    out.append(line.rstrip().rstrip(","))
    body = "\n".join(out).rstrip(", ")
    print("{" + body[1:] if body.startswith(" ") else "{" + body, end="")
    print("}")


if __name__ == "__main__":
    main(sys.argv[1:])
