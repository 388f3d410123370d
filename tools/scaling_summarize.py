#!/usr/bin/env python3
"""Pool one or more run_scaling_quiet.py evidence JSONs and recompute the
capability-clean filter over the POOLED session bests (the filter is
relative to best observed capability; pooling runs can only tighten it).
Prints the headline numbers and a markdown table for BENCH/BASELINE.md.

Usage: python3 tools/scaling_summarize.py BENCH/scaling_quiet_8v32.json [more.json ...]
"""
import json
import statistics
import sys

CAP_FRACTION = 0.90

pairs = []
meta = None
for path in sys.argv[1:]:
    with open(path) as f:
        d = json.load(f)
    meta = meta or d
    for r in d.get("pairs", []):
        if "eff" in r:
            r["_src"] = path
            pairs.append(r)

if not pairs:
    print("no pairs")
    sys.exit(1)

best_n = max(r["rps_n"] for r in pairs)
best_4n = max(r["rps_4n"] for r in pairs)
clean = []
for r in pairs:
    ok = (r["small"]["stat_clean"] and r["big"]["stat_clean"] and
          r["rps_n"] >= CAP_FRACTION * best_n and
          r["rps_4n"] >= CAP_FRACTION * best_4n)
    r["_clean"] = ok
    if ok:
        clean.append(r["eff"])

clean.sort()
med = statistics.median(clean) if clean else None
print(f"pooled pairs: {len(pairs)}  clean: {len(clean)}")
print(f"best rps N={meta['n_cores']}: {best_n:,}   4N={meta['n4_cores']}: {best_4n:,}")
print(f"capability-implied eff (best4N / 4*bestN): {best_4n / (4 * best_n):.3f}")
if med is not None:
    print(f"CLEAN-PAIR MEDIAN EFFICIENCY: {med:.3f}  (pairs: "
          + ", ".join(f"{e:.3f}" for e in clean) + ")")
else:
    print("no clean pairs under the pooled filter")
print()
print("| pair | order | N rows/s | 4N rows/s | eff | steal% N/4N | ext cores | clean |")
print("|---|---|---|---|---|---|---|---|")
for r in pairs:
    s, b = r["small"], r["big"]
    print(f"| {r['i']} | {r['order']} | {r['rps_n']:,} | {r['rps_4n']:,} "
          f"| {r['eff']:.3f} | {s['steal_pct']:.1f}/{b['steal_pct']:.1f} "
          f"| {max(s['ext_cores'], b['ext_cores']):.1f} "
          f"| {'YES' if r['_clean'] else '—'} |")
