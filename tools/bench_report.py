#!/usr/bin/env python3
"""Render BENCH_REPORT.md from bench_full.json (+ streaming_bench.json),
the analogue of the reference's results/ report tier: headline workloads
vs the reference yardsticks (BASELINE.md table), the most expensive
queries with their rep spreads, and the streaming throughput table.

Dev tool: run after a bench; never part of the gate.
    python3 tools/bench_report.py [bench_full.json] [out.md]
"""
import json
import sys

BENCH = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
OUT = sys.argv[2] if len(sys.argv) > 2 else "BENCH_REPORT.md"

# Reference yardsticks: /root/reference analysis results, 3 nodes / 1 GB
# (see BASELINE.md for the caveats — different data + topology, so these
# are order-of-magnitude bars, not like-for-like).
YARDSTICKS = {
    "ETL pipeline": 39.43,
    "KMeans": 86.56,
    "PageRank": 68.89,
    "Triangle counting": 70.21,
}


def workload_time(qs, which):
    if which == "ETL pipeline":
        return sum(v for k, v in qs.items() if k.startswith("etl_") and v >= 0)
    if which == "KMeans":
        return qs.get("kmeans_lloyd", qs.get("kmeans_sizes", -1))
    if which == "PageRank":
        return qs.get("pagerank", -1)
    if which == "Triangle counting":
        return qs.get("triangle_count", -1)
    return -1


def main():
    d = json.load(open(BENCH))
    qs = d["queries"]
    spread = d.get("spread", {})
    lines = []
    lines.append("# Bench report\n")
    lines.append(
        f"Source: `{BENCH}` — {len(qs)} queries, total "
        f"{d['value']:.1f} s, sf={d.get('sf')}, cpus={d.get('cpus')}, "
        f"peak RSS {d.get('peak_rss_mb')} MB, "
        f"errors: {d.get('errors') or 'none'}.\n")

    lines.append("## Headline workloads vs the reference yardsticks\n")
    lines.append("Reference: 3-node cluster / 1 GB Reddit corpus "
                 "(order-of-magnitude bars — different data and topology; "
                 "see BASELINE.md caveats).\n")
    lines.append("| Workload | this engine (s) | reference (s) | ratio |")
    lines.append("|---|---|---|---|")
    for name, ref in YARDSTICKS.items():
        t = workload_time(qs, name)
        ratio = f"{t / ref:.2f}x" if t >= 0 else "n/a"
        lines.append(f"| {name} | {t:.1f} | {ref} | {ratio} |")
    lines.append("")

    lines.append("## Most expensive queries\n")
    lines.append("| query | median s | reps (sorted) |")
    lines.append("|---|---|---|")
    top = sorted(((v, k) for k, v in qs.items() if v >= 0), reverse=True)[:15]
    for v, k in top:
        reps = ", ".join(f"{x:.2f}" for x in spread.get(k, []))
        lines.append(f"| {k} | {v:.2f} | [{reps}] |")
    lines.append("")

    try:
        s = json.load(open("streaming_bench.json"))
        lines.append("## Streaming throughput\n")
        lines.append("| component | rows | sec | rows/s |")
        lines.append("|---|---|---|---|")
        for name, c in s["components"].items():
            lines.append(
                f"| {name} | {c['rows']} | {c['sec']} | {c['rows_per_sec']} |")
        lines.append("")
    except (OSError, json.JSONDecodeError):
        pass

    open(OUT, "w").write("\n".join(lines) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
