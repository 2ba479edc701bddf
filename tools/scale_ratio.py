#!/usr/bin/env python3
"""Join two bench_full.json runs (baseline SF vs an N-x replica of it) into
a standing scale artifact: per-query wall ratio, flagged superlinear rows.

Usage: scale_ratio.py <bench_full_base.json> <bench_full_Nx.json> <N> <out.json>

Ratio = min-of-3 warm wall at Nx / min-of-3 warm wall at base. A ratio <= N
is at-worst-linear; > N is superlinear and gets named in the "superlinear"
list for explanation or fixing. Sub-0.15 s queries at BOTH scales are
job-overhead-floored (scheduler constant dominates data) and are reported
with "floored": true — their ratios are noise around 1, not scale evidence.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main():
    base_p, nx_p, n, out_p = sys.argv[1], sys.argv[2], float(sys.argv[3]), sys.argv[4]
    base, nx = load(base_p), load(nx_p)
    bq, nq = base["queries"], nx["queries"]
    rows = {}
    superlinear = []
    for name in sorted(nq):
        if name not in bq:
            continue
        b, x = bq[name], nq[name]
        ratio = round(x / b, 2) if b > 0 else None
        floored = b < 0.15 and x < 0.15
        rows[name] = {"base_s": b, "nx_s": x, "ratio": ratio, "floored": floored}
        if ratio is not None and ratio > n and not floored:
            superlinear.append(name)
    missing = sorted(set(bq) - set(nq))
    out = {
        "factor": n,
        "base": base_p,
        "nx": nx_p,
        "n_queries": len(rows),
        "skipped": missing,
        "superlinear": sorted(superlinear, key=lambda q: -rows[q]["ratio"]),
        "total_base_s": round(sum(bq[q] for q in rows), 1),
        "total_nx_s": round(sum(nq[q] for q in rows), 1),
        "queries": rows,
    }
    with open(out_p, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(f"{len(rows)} queries; skipped={missing}; "
          f"superlinear(> {n}x, unfloored)={out['superlinear']}; "
          f"total {out['total_base_s']}s -> {out['total_nx_s']}s")


if __name__ == "__main__":
    main()
