#!/usr/bin/env python3
"""Merge scaling evidence from MULTIPLE bench windows into one
builder-evidence file (BENCH_BUILDER_r{N}.json).

Why: host steal on this VM arrives in multi-minute regimes — one
2700 s suite window can refuse every level while a window an hour
later is clean. The per-superstep gates (bench._superstep_clean:
steal ≤ 3% of the job's pinned cores AND kernel under the width-aware
gate, bench.KERNEL_USER_RATIO_CLEAN) make
clean supersteps from different windows directly comparable: every
cycle runs the identical pre-materialized table, fixed 256-partition
layout, pinned fresh JVM, AQE off — the only thing that varies across
windows is contamination, which is exactly what the gates remove.
The merged estimator is the same min-over-clean-supersteps the
single-window suite uses, now over the union of windows, with every
contributing cycle's provenance (source file, cycle index, wall,
per-superstep CPU split) carried into the output.

This is builder-side evidence assembly, not measurement: it never
relaxes a gate, never mixes table sizes or protocols (it refuses
mismatched `edges`/`shuffle_partitions`), and reports per-window
contributions so a reviewer can re-derive the minima from the raw
detail files.

Usage:
  python tools/merge_scaling_windows.py OUT.json DETAIL1.json [DETAIL2.json ...]

Each input is a BENCH_DETAIL_r*.json (with a "scaling" block) or a
raw run_scaling() dump / .partial file (with a top-level "cycles").
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _load_scaling(path: str) -> dict | None:
    with open(path) as fh:
        d = json.load(fh)
    if "scaling" in d:
        return d["scaling"]
    if "cycles" in d:
        return d
    return None


def merge(paths: list[str]) -> dict:
    windows = []
    for p in paths:
        s = _load_scaling(p)
        if s and s.get("cycles"):
            windows.append((os.path.basename(p), s))
    if not windows:
        raise SystemExit("no scaling cycles found in any input")

    # protocol compatibility: identical table + layout or refuse
    edges = {s.get("edges") for _, s in windows}
    parts = {s.get("shuffle_partitions") for _, s in windows}
    if len(edges) != 1 or len(parts) != 1:
        raise SystemExit(
            f"refusing to merge mismatched windows: edges={edges}, "
            f"shuffle_partitions={parts}"
        )
    n_edges = edges.pop()

    out: dict = {
        "protocol": windows[0][1].get("protocol"),
        "merged_from": [name for name, _ in windows],
        "edges": n_edges,
        "shuffle_partitions": parts.pop(),
        "warmup_supersteps_dropped": bench.WARMUP_SUPERSTEPS,
        "note": (
            "union of clean supersteps across independent suite windows; "
            "identical table/layout/pinning per cycle, per-superstep "
            "steal/kernel gates identical to the single-window suite "
            "(bench._superstep_clean). Min over clean supersteps."
        ),
    }

    levels: dict[int, list] = {}
    per_window_levels: dict[str, dict[int, list]] = {}
    provenance: list[dict] = []
    for name, s in windows:
        for c in s["cycles"]:
            cores = c["cores"]
            clean = bench.cycle_clean_supersteps(
                c.get("supersteps", []), cores
            )
            if clean:
                walls = [ss["wall_sec"] for ss in clean]
                levels.setdefault(cores, []).extend(walls)
                per_window_levels.setdefault(name, {}).setdefault(
                    cores, []
                ).extend(walls)
            provenance.append(
                {
                    "window": name,
                    "cycle": c.get("cycle"),
                    "cores": cores,
                    "failed": c.get("failed"),
                    "clean_supersteps": len(clean),
                    "clean_walls_sec": [round(ss["wall_sec"], 2) for ss in clean],
                    "all_walls_sec": c.get("all_walls_sec", c.get("walls_sec")),
                }
            )
    out["cycles_provenance"] = provenance

    for cores in sorted(
        set(levels) | {c for p in bench.SCALING_PAIRS for c in p}
    ):
        walls = levels.get(cores, [])
        lvl: dict = {
            "edges": n_edges,
            "clean_supersteps": len(walls),
            "steal_frac_gate": bench.STEAL_FRAC_CLEAN,
            "kernel_user_ratio_gate": bench._kernel_gate(cores),
        }
        if len(walls) >= 3:
            best = min(walls)
            lvl["min_sec_per_superstep"] = round(best, 3)
            lvl["median_sec_per_superstep"] = round(
                sorted(walls)[len(walls) // 2], 3
            )
            lvl["edges_per_sec"] = round(n_edges / best)
        else:
            lvl["unmeasurable"] = True
            lvl["reason"] = (
                f"only {len(walls)} steal-clean supersteps (need >=3) "
                "across all merged windows"
            )
        out[f"n{cores}"] = lvl

    for n, n4 in bench.SCALING_PAIRS:
        lo, hi = out.get(f"n{n}", {}), out.get(f"n{n4}", {})
        if "edges_per_sec" in lo and "edges_per_sec" in hi:
            eff, sl_reason = bench._pair_efficiency(
                lo["edges_per_sec"], hi["edges_per_sec"], n, n4
            )
            out[f"efficiency_{n}_to_{n4}"] = eff
            if sl_reason:
                out[f"efficiency_{n}_to_{n4}_unmeasurable"] = sl_reason
            note = bench._pair_note(eff)
            if note:
                out[f"efficiency_{n}_to_{n4}_note"] = note
            # conservative second estimator: medians of clean walls
            med = (lo["median_sec_per_superstep"] / hi["median_sec_per_superstep"]) / (
                n4 / n
            )
            out[f"efficiency_{n}_to_{n4}_median"] = round(med, 3)
        else:
            out[f"efficiency_{n}_to_{n4}"] = None
            missing = f"n{n}" if "edges_per_sec" not in lo else f"n{n4}"
            out[f"efficiency_{n}_to_{n4}_unmeasurable"] = (
                f"{missing} <3 clean supersteps across merged windows"
            )

    # per-window pair efficiencies: a window that measured BOTH legs
    # of a criterion pair (≥3 clean each) is a self-contained,
    # regime-matched measurement — surface each one so a reviewer sees
    # the within-window estimates next to the cross-window merge
    # instead of having to re-derive them from provenance.
    pw: dict[str, dict[str, float]] = {}
    for name, lv in per_window_levels.items():
        for n, n4 in bench.SCALING_PAIRS:
            if len(lv.get(n, [])) >= 3 and len(lv.get(n4, [])) >= 3:
                eff = (min(lv[n]) / min(lv[n4])) / (n4 / n)
                pw.setdefault(name, {})[f"{n}_to_{n4}"] = round(eff, 3)
    if pw:
        out["per_window_pairs"] = pw
    return out


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    # The first arg is the OUTPUT. A bare glob once put a window file
    # there and clobbered it (restored from git) — refuse mechanically
    # instead of relying on the docstring: the output must not be one
    # of the inputs, and must not live inside the evidence directory.
    out_path = os.path.abspath(sys.argv[1])
    in_paths = {os.path.abspath(p) for p in sys.argv[2:]}
    if out_path in in_paths:
        raise SystemExit(
            f"refusing: output {sys.argv[1]} is also an input — the "
            "first argument is the OUTPUT file, not a window"
        )
    evdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scaling_evidence",
    )
    if os.path.dirname(out_path) == evdir:
        raise SystemExit(
            f"refusing: output {sys.argv[1]} is inside scaling_evidence/ "
            "— writing there would overwrite harvested windows"
        )
    merged = merge(sys.argv[2:])
    with open(sys.argv[1], "w") as fh:
        json.dump(merged, fh, indent=1)
    for k, v in merged.items():
        if k.startswith("efficiency") or k.startswith("n"):
            print(k, v if not isinstance(v, dict) else {
                x: v[x] for x in ("clean_supersteps", "min_sec_per_superstep",
                                  "edges_per_sec", "unmeasurable") if x in v})
