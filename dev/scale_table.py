#!/usr/bin/env python3
"""Per-entry scaling table from Bench JSON lines at multiple scale factors.

Usage: python3 dev/scale_table.py sf0.01=/tmp/bench_sf001.json \
           sf0.1=/tmp/bench_sf01.json sf1=/tmp/bench_sf1.json [--top N]

Prints a markdown table (entry, per-sf seconds, largest adjacent ratio)
sorted by the last column so superlinear entries surface first. A 10x data
step should cost well under 10x wall for scan-bound entries (fixed costs
amortize); ratios approaching or exceeding the data step are the
superlinearity candidates that get the q267/q271 treatment.
"""
import sys, json

argv = sys.argv[1:]
top = None
if "--top" in argv:
    i = argv.index("--top")
    top = int(argv[i + 1])
    argv = argv[:i] + argv[i + 2:]
args = argv

runs = []  # (label, {entry: sec})
for a in args:
    label, path = a.split("=", 1)
    with open(path) as f:
        d = json.load(f)
    runs.append((label, d["queries"]))

entries = sorted(set().union(*[set(q) for _, q in runs]))
rows = []
for e in entries:
    secs = [q.get(e) for _, q in runs]
    ratios = []
    for i in range(1, len(secs)):
        a, b = secs[i - 1], secs[i]
        if a and b and a > 0 and b > 0:
            ratios.append(b / a)
    worst = max(ratios) if ratios else 0.0
    rows.append((e, secs, worst))

rows.sort(key=lambda r: -r[2])
if top:
    rows = rows[:top]

hdr = ["entry"] + [l for l, _ in runs] + ["max step ratio"]
print("| " + " | ".join(hdr) + " |")
print("|" + "---|" * len(hdr))
for e, secs, worst in rows:
    cells = [f"{s:.2f}" if isinstance(s, (int, float)) and s > 0 else "—"
             for s in secs]
    print(f"| {e} | " + " | ".join(cells) + f" | {worst:.1f}x |")

tot = ["TOTAL"] + [f"{sum(v for v in q.values() if isinstance(v, (int, float)) and v > 0):.1f}"
                   for _, q in runs]
print("| " + " | ".join(tot) + " | |")
