#!/usr/bin/env python3
"""Merge N full bench runs into one median snapshot: per-query
{min, med, max} plus a median total, in the full-spread form
tools/bench_compare.py consumes. Usage:

    python3 tools/bench_median.py out.json run1.json run2.json ...
"""
import json
import statistics
import sys


def load(path):
    raw = open(path).read()
    return json.loads(raw[raw.index("{"):])


def main():
    out, paths = sys.argv[1], sys.argv[2:]
    runs = [load(p) for p in paths]
    names = sorted({q for r in runs for q in r["queries"]})
    queries = {}
    def sec(v):
        # accept both the flat bench line ({"q": sec}) and the
        # full-spread form ({"q": {"min","med","max"}}) -> its med
        return float(v["med"]) if isinstance(v, dict) else float(v)

    for q in names:
        vals = sorted(sec(r["queries"][q]) for r in runs if q in r["queries"])
        queries[q] = {"min": vals[0], "med": statistics.median(vals),
                      "max": vals[-1], "runs": len(vals)}
    totals = sorted(float(r["value"]) for r in runs)
    snap = {"metric": "total", "value": statistics.median(totals),
            "unit": "sec", "totals": totals, "n_runs": len(runs),
            "queries": queries, "sf": runs[0].get("sf")}
    with open(out, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    print(f"wrote {out}: median total {snap['value']:.1f}s over {totals}")


if __name__ == "__main__":
    sys.exit(main())
