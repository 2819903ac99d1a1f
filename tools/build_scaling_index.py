#!/usr/bin/env python3
"""Emit scaling_evidence/INDEX.json: one machine-readable row per
committed evidence window — levels measured, clean-superstep counts,
in-window floors, and the window's self-contained pair efficiencies —
so the merged estimators in BENCH_BUILDER_r*.json can be re-derived
without parsing the raw window JSONs by hand (VERDICT r5 item 7).

Gates and loaders are bench.py's own (`bench._committed_windows`,
`bench.cycle_clean_supersteps`): the index can never disagree with
what the graded merge would compute.

Usage: python tools/build_scaling_index.py [edges] [partitions]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 32181792
    partitions = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    wins = bench._committed_windows(n_edges, partitions)
    index: dict = {
        "edges": n_edges,
        "shuffle_partitions": partitions,
        "gates": {
            "steal_frac_clean": bench.STEAL_FRAC_CLEAN,
            "kernel_user_ratio_clean": bench.KERNEL_USER_RATIO_CLEAN,
            "foreign_load_cs_ratio": bench.FOREIGN_LOAD_CS_RATIO,
            "warmup_supersteps_dropped": bench.WARMUP_SUPERSTEPS,
        },
        "note": (
            "per-window clean-superstep counts and in-window floors under "
            "bench.py's own per-superstep gates; merged floors = min over "
            "windows per level; pair efficiency = (lo_floor/hi_floor)/4"
        ),
        "windows": {},
    }
    floors: dict[int, float] = {}
    counts: dict[int, int] = {}
    for name, s in wins:
        row: dict = {}
        for c in s.get("cycles", []):
            cores = c.get("cores")
            clean = bench.cycle_clean_supersteps(c.get("supersteps", []), cores)
            if not clean:
                row.setdefault(f"n{cores}", {"clean": 0})
                continue
            walls = [ss["wall_sec"] for ss in clean]
            lvl = row.setdefault(f"n{cores}", {"clean": 0})
            lvl["clean"] = lvl.get("clean", 0) + len(walls)
            lvl["floor_sec"] = round(min(walls + [lvl.get("floor_sec", 1e9)]), 3)
            floors[cores] = min(floors.get(cores, 1e9), min(walls))
            counts[cores] = counts.get(cores, 0) + len(walls)
        # self-contained pair efficiencies for this window (>=3 clean/leg)
        pairs = {}
        for a, b in bench.SCALING_PAIRS:
            la, lb = row.get(f"n{a}", {}), row.get(f"n{b}", {})
            if la.get("clean", 0) >= 3 and lb.get("clean", 0) >= 3:
                pairs[f"{a}_to_{b}"] = round(
                    (la["floor_sec"] / lb["floor_sec"]) / (b / a), 3
                )
        if pairs:
            row["self_contained_pairs"] = pairs
        index["windows"][name] = row
    index["merged_floors_sec"] = {
        f"n{c}": round(v, 3) for c, v in sorted(floors.items())
    }
    index["merged_clean_supersteps"] = {
        f"n{c}": counts[c] for c in sorted(counts)
    }
    index["merged_pair_efficiencies"] = {
        f"{a}_to_{b}": round((floors[a] / floors[b]) / (b / a), 3)
        for a, b in bench.SCALING_PAIRS
        if a in floors and b in floors
    }
    out_path = os.path.join(REPO, "scaling_evidence", "INDEX.json")
    with open(out_path, "w") as fh:
        json.dump(index, fh, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "windows": len(index["windows"]),
                "merged_floors_sec": index["merged_floors_sec"],
                "merged_pair_efficiencies": index["merged_pair_efficiencies"],
                "out": out_path,
            }
        )
    )


if __name__ == "__main__":
    main()
