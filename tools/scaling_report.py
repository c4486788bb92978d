#!/usr/bin/env python3
"""Join two graft.Bench JSON lines (small SF, big SF) into a scaling report.

Usage: scaling_report.py <bench_small.json> <bench_big.json> <scale_factor>

Emits one JSON document on stdout:
  - per-query seconds at both SFs and the wall ratio big/small
  - family rollups (prefix before the first '_')
  - flags: super_linear = ratio > scale_factor * tolerance (default 1.5)

Ratios for sub-100ms small-SF walls are noise (scheduler floor), so
queries with small wall < floor_sec (default 0.15) report ratio but are
exempt from the super-linear flag: their big-SF wall is compared against
floor_sec * scale instead.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            # sbt prefixes runMain stdout with "[info] "
            for tag in ("[info] ", "[error] "):
                if line.startswith(tag):
                    line = line[len(tag):]
            if line.startswith("{") and '"metric":"total"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    small_path, big_path, scale = sys.argv[1], sys.argv[2], float(sys.argv[3])
    tol = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5
    floor = 0.15
    small, big = load(small_path), load(big_path)
    qs, qb = small["queries"], big["queries"]
    shared = sorted(set(qs) & set(qb))
    rows, flagged = {}, []
    for name in shared:
        a, b = qs[name], qb[name]
        ratio = round(b / a, 2) if a > 0 else None
        # scheduler-floor exemption: tiny walls scale by constant, not data
        effective_base = max(a, floor)
        super_linear = b > effective_base * scale * tol
        rows[name] = {"small_sec": round(a, 3), "big_sec": round(b, 3),
                      "ratio": ratio, "super_linear": super_linear}
        if super_linear:
            flagged.append(name)
    fams = {}
    for name in shared:
        fam = name.split("_", 1)[0]
        f = fams.setdefault(fam, {"small_sec": 0.0, "big_sec": 0.0, "n": 0})
        f["small_sec"] += qs[name]
        f["big_sec"] += qb[name]
        f["n"] += 1
    for f in fams.values():
        f["ratio"] = round(f["big_sec"] / f["small_sec"], 2) if f["small_sec"] else None
        f["small_sec"] = round(f["small_sec"], 2)
        f["big_sec"] = round(f["big_sec"], 2)
    out = {
        "scale_factor": scale,
        "tolerance": tol,
        "total_small_sec": round(sum(qs[n] for n in shared), 2),
        "total_big_sec": round(sum(qb[n] for n in shared), 2),
        "total_ratio": round(sum(qb[n] for n in shared) / sum(qs[n] for n in shared), 2),
        "n_queries": len(shared),
        "super_linear": flagged,
        "families": dict(sorted(fams.items())),
        "queries": rows,
        "small_sf": small.get("sf"), "big_sf": big.get("sf"),
        "small_setup_sec": round(small.get("setup_sec", 0), 2),
        "big_setup_sec": round(big.get("setup_sec", 0), 2),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
