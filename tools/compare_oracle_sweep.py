#!/usr/bin/env python3
"""Budgeted sweep driver over tools/compare_oracle.py: runs the compare one
query at a time (fresh DuckDB process each) with a per-query wall-clock
budget, so a single quadratic ground-truth oracle cannot stall the whole
sweep at large SF. Intended for the off-gate scale receipts (sf0.1): the
driver's real gate (sf0.01) always runs the plain un-budgeted tool.

Usage: compare_oracle_sweep.py <sfdir> <outdir> [budget_sec] [skip,names]
Writes one line per query: OK / FAIL / TIMEOUT(budget) / SKIP.
Exit 0 iff no FAIL (timeouts are reported, not failures — they are oracle
cost, not engine wrongness; the per-query log says which)."""
import json, subprocess, sys, time

sfdir, outdir = sys.argv[1], sys.argv[2]
budget = int(sys.argv[3]) if len(sys.argv) > 3 else 900
skip = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else set()

names = sorted(json.load(open(f"{outdir}/oracle_sql.json")))
ok, fail, timeout = [], [], []
for n in names:
    if n in skip:
        print(f"{n}: SKIP", flush=True)
        continue
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "tools/compare_oracle.py", sfdir, outdir, n],
            capture_output=True, text=True, timeout=budget)
        line = [l for l in r.stdout.splitlines() if l.startswith(n)]
        print(f"{line[0] if line else r.stdout.strip()}  [{time.time()-t0:.1f}s]",
              flush=True)
        (ok if r.returncode == 0 else fail).append(n)
    except subprocess.TimeoutExpired:
        print(f"{n}: TIMEOUT({budget}s) — oracle truth re-derivation over budget",
              flush=True)
        timeout.append(n)
print(f"\nSWEEP: {len(ok)} OK, {len(fail)} FAIL, {len(timeout)} TIMEOUT, "
      f"{len(skip)} SKIP of {len(names)}")
if fail: print("FAILED:", ", ".join(fail))
if timeout: print("TIMED OUT:", ", ".join(timeout))
sys.exit(1 if fail else 0)
