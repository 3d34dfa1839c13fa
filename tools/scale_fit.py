#!/usr/bin/env python3
"""Fit per-query scaling exponents from tools/scale_probe.sh output.

Reads probe_{k}x.json files under the given dir (each the Bench
contract line at corpus scale k), fits t(k) ~ c * k^e by least squares
on log-log, and prints a markdown table sorted by exponent — the
SCALING.md evidence table. e <= ~1.1 is linear (healthy); flag
anything materially super-linear.

Usage: python3 tools/scale_fit.py /tmp/graft-scale [flag_threshold]
"""
import json, math, re, sys
from pathlib import Path

root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-scale")
flag_at = float(sys.argv[2]) if len(sys.argv) > 2 else 1.25

runs = {}
for p in sorted(root.glob("probe_*x.json")):
    k = int(re.search(r"probe_(\d+)x", p.name).group(1))
    runs[k] = json.loads(p.read_text())["queries"]
if len(runs) < 2:
    sys.exit(f"need >=2 probe_*x.json under {root}, found {len(runs)}")

ks = sorted(runs)
names = sorted(set().union(*[set(v) for v in runs.values()]))
rows = []
incomplete = []
for q in names:
    # explicit None checks: a 0.00-formatted sub-5ms time is a real
    # point, and a query MISSING at the largest scale (crashed there —
    # the super-linear symptom itself) must be reported, not dropped
    ts = [(k, runs[k][q]) for k in ks
          if q in runs[k] and runs[k][q] is not None]
    have = {k for k, _ in ts}
    if ks[-1] not in have and len(have) >= 1:
        incomplete.append(q)
    if len(ts) < 2:
        continue
    ts = [(k, max(t, 1e-3)) for k, t in ts]  # log() floor for 0.00 rows
    xs = [math.log(k) for k, _ in ts]
    ys = [math.log(t) for _, t in ts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    e = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
    rows.append((q, dict(ts), e))

rows.sort(key=lambda r: -r[2])
hdr = "| query | " + " | ".join(f"{k}x (s)" for k in ks) + " | exponent | verdict |"
sep = "|" + "---|" * (len(ks) + 3)
print(hdr)
print(sep)
worst = []
for q, ts, e in rows:
    cells = " | ".join(f"{ts.get(k, float('nan')):.2f}" for k in ks)
    verdict = "SUPER-LINEAR" if e > flag_at else ("~linear" if e > 0.75 else "sub-linear")
    if e > flag_at:
        worst.append(q)
    print(f"| {q} | {cells} | {e:.2f} | {verdict} |")
print()
if incomplete:
    # only flag when a LARGER probe exists that the query should have
    # appeared in (a deliberately-smaller 30x subset is fine when the
    # query was never in that probe's filter — but we cannot tell the
    # difference here, so surface it and let the reader decide)
    print(f"NOTE: missing at the largest scale ({ks[-1]}x): "
          f"{', '.join(sorted(incomplete))} — absent from that probe's "
          f"query set or CRASHED there; a crash at the largest scale "
          f"is itself the super-linear symptom, check the probe log")
if worst:
    print(f"FLAGGED (> k^{flag_at}): {', '.join(worst)}")
    sys.exit(1)
print(f"all exponents <= {flag_at}: no super-linear surprise")
