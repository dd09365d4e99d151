#!/usr/bin/env python3
"""Maintains BENCH_TREND.json: one row per (round, sf) with the headline
and round-4-subset totals, so cross-round perf claims read from one
artifact instead of git archaeology.

Usage:
  update_bench_trend.py BENCH_SF1.json [BENCH_SF3.json ...]

Each argument is a scale-bench artifact (assemble_scale_bench.py
output); its (round, sf) row is inserted or replaced. Rows sort by
(round, sf). Older rounds' rows are kept as committed — re-running with
a historical artifact (e.g. `git show <rev>:BENCH_SF1.json > /tmp/x.json`)
backfills them.
"""
import json
import os
import sys

TREND = os.path.join(os.path.dirname(__file__), "..", "BENCH_TREND.json")


def row(doc):
    r = {
        "round": doc["round"],
        # older artifacts carried verbose labels ("sf1 (10x sf0.1: ...)")
        "sf": doc["sf"].split()[0],
        "headline_spark_sec": doc["headline"]["spark_total_sec"],
        "headline_duckdb_sec": doc["headline"]["duckdb_total_sec"],
        "headline_ratio": doc["headline"]["ratio"],
        "n_compared": doc["headline"]["n_compared"],
    }
    if "round4_subset" in doc:
        r["subset17_spark_sec"] = doc["round4_subset"]["spark_total_sec"]
        r["subset17_duckdb_sec"] = doc["round4_subset"]["duckdb_total_sec"]
        r["subset17_ratio"] = doc["round4_subset"]["ratio"]
    return r


def main():
    rows = []
    if os.path.exists(TREND):
        rows = json.load(open(TREND))["rows"]
    for p in sys.argv[1:]:
        doc = json.load(open(p))
        new = row(doc)
        rows = [r for r in rows
                if not (r["round"] == new["round"] and r["sf"] == new["sf"])]
        rows.append(new)
    rows.sort(key=lambda r: (r["round"], r["sf"]))
    json.dump({
        "note": ("per-round scale-bench history; headline excludes the "
                 "legacy lane from its introduction (round 9) onward, "
                 "subset17 membership is frozen since round 4 - ratios "
                 "are spark/duckdb, lower is better"),
        "rows": rows,
    }, open(TREND, "w"), indent=1)
    print(f"{TREND}: {len(rows)} rows")


if __name__ == "__main__":
    main()
