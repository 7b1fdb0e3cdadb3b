#!/usr/bin/env python3
"""Freeze a round's per-query bench baseline from full-bench samples.

    python3 tools/freeze_baseline.py <round> sample1.json [sample2.json ...]

Writes BASELINE_queries_r<round>.json with, per query, the MIN time
over the given full-bench artifacts (the best-same-host-floor
protocol: min-of-samples estimates the noise floor). The stamped
host_factor is the median ratio of the merged floors against the
NEWEST previous frozen baseline over their common keys (prev entries
under 0.05 s excluded as ratio-unstable, matching graft.Bench's own
stamping rule) — freeze from samples quiet enough that this lands
near 1.0. Never overwrites an existing round's file.
"""
import glob
import json
import re
import statistics
import sys


def main():
    rnd = int(sys.argv[1])
    out = f"BASELINE_queries_r{rnd}.json"
    if glob.glob(out):
        sys.exit(f"{out} already exists — refusing to rewrite a freeze")
    samples = [json.load(open(p)) for p in sys.argv[2:]]
    if not samples:
        sys.exit("need at least one full-bench sample")
    names = set(samples[0]["queries"])
    for s in samples[1:]:
        if set(s["queries"]) != names:
            sys.exit("samples cover different query sets — "
                     "freeze only from full-inventory runs")
    merged = {q: min(s["queries"][q] for s in samples)
              for q in sorted(names)}
    prev, prev_n = None, -1
    for p in glob.glob("BASELINE_queries_r*.json"):
        m = re.search(r"_r(\d+)\.json$", p)
        if m and int(m.group(1)) < rnd and int(m.group(1)) > prev_n:
            prev, prev_n = p, int(m.group(1))
    hf = 1.0
    if prev:
        pq = json.load(open(prev))["queries"]
        ratios = [merged[q] / pq[q] for q in merged
                  if q in pq and pq[q] >= 0.05]
        if ratios:
            hf = round(statistics.median(ratios), 3)
    art = {
        "metric": "total",
        "value": round(sum(merged.values()), 3),
        "unit": "sec",
        "n_queries": len(merged),
        "host_factor": hf,
        "queries": merged,
        "sf": samples[0].get("sf", "/root/testdata/sf0.1"),
    }
    with open(out, "w") as f:
        json.dump(art, f, indent=None, separators=(",", ":"))
        f.write("\n")
    print(f"froze {out}: {len(merged)} queries, "
          f"total {art['value']}s, host_factor {hf} vs {prev}")


if __name__ == "__main__":
    main()
