#!/usr/bin/env python3
"""Same-tree bench agreement check (round-13 done criterion, VERDICT item 1).

Usage: python3 dev/agree.py detailA.json detailB.json [tol=0.15]

Compares the per-entry raw seconds of two bench_detail receipts from the
SAME tree and reports the fraction of entries agreeing within the
tolerance (|a-b| / min(a,b) <= tol), plus the worst disagreements.
Entries re-run in-process (the `reran` map) are compared on their
reported (min) value, which is the burst-immune one by design.
"""
import json, sys

a_path, b_path = sys.argv[1], sys.argv[2]
tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
A = json.load(open(a_path))
B = json.load(open(b_path))
# Prefer the burst-immune per-entry min (pass-2 protocol, round 13); fall
# back to the single-shot pass-1 values for pre-pass-2 receipts.
field = "queries_min" if ("queries_min" in A and "queries_min" in B) else "queries"
print(f"comparing field: {field}")
qa, qb = A[field], B[field]
common = sorted(set(qa) & set(qb))
rows = []
for q in common:
    x, y = qa[q], qb[q]
    ratio = abs(x - y) / max(min(x, y), 1e-9)
    rows.append((ratio, q, x, y))
rows.sort(reverse=True)
n = len(rows)
ok = sum(1 for r in rows if r[0] <= tol)
print(f"entries={n} within±{tol:.0%}={ok} ({ok/n:.1%})")
print(f"canary: {A.get('canary_median')} vs {B.get('canary_median')}; "
      f"canary2: {A.get('canary2_median')} vs {B.get('canary2_median')}")
print("worst 15:")
for ratio, q, x, y in rows[:15]:
    ra = "R" if q in A.get("reran", {}) else " "
    rb = "R" if q in B.get("reran", {}) else " "
    print(f"  {q:38s} {x:8.3f}{ra} {y:8.3f}{rb}  Δ={ratio:6.1%}")
