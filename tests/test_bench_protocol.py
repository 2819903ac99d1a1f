"""Unit gates for the scaling-protocol helpers in bench.py (no Spark):
superstep window attribution, the steal/kernel cleanliness gates, and
the compact driver-line projection. These are the pieces whose silent
breakage would invalidate the BASELINE.md scaling evidence."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _ticks(user, system, steal, hz):
    # [user nice system idle iowait irq softirq steal]
    return [user * hz, 0, system * hz, 0, 0, 0, 0, steal * hz]


def test_per_superstep_cpu_attribution():
    hz = os.sysconf("SC_CLK_TCK")
    # two supersteps of 10 s each ending at t=20; samples at 1 Hz with
    # 1 busy core user in step 1 and 0.5 user + 0.5 steal in step 2
    samples = []
    for t in range(0, 11):
        samples.append((float(t), _ticks(t, 0, 0, hz)))
    for t in range(11, 21):
        u = 10 + (t - 10) * 0.5
        st = (t - 10) * 0.5
        samples.append((float(t), _ticks(u, 0, st, hz)))
    out = bench._per_superstep_cpu(samples, [(0.0, 10.0), (10.0, 20.0)], cores=2)
    assert len(out) == 2
    assert abs(out[0]["user_cores"] - 1.0) < 0.05
    assert out[0]["steal_cores"] < 0.01
    assert abs(out[1]["steal_cores"] - 0.5) < 0.05
    assert abs(out[1]["steal_frac_of_job"] - 0.25) < 0.03


def test_per_superstep_cpu_sparse_samples():
    # a window with <2 samples degrades to wall-only (no clean verdict)
    out = bench._per_superstep_cpu([(0.0, None)], [(0.0, 5.0)], cores=2)
    assert out == [{"wall_sec": 5.0}]
    assert not bench._superstep_clean(out[0], 2)


def test_superstep_clean_gates():
    clean = {"wall_sec": 8.0, "user_cores": 7.3, "system_cores": 0.2,
             "steal_frac_of_job": 0.001}
    assert bench._superstep_clean(clean, 8)
    stolen = dict(clean, steal_frac_of_job=0.08)
    assert not bench._superstep_clean(stolen, 8)
    # lock-holder-preemption signature: kernel-dominated, low steal
    pathological = {"wall_sec": 26.9, "user_cores": 2.35,
                    "system_cores": 5.08, "steal_frac_of_job": 0.005}
    assert not bench._superstep_clean(pathological, 8)
    # legit wide-level kernel share (tmpfs shuffle) stays clean
    wide = {"wall_sec": 4.8, "user_cores": 21.7, "system_cores": 4.7,
            "steal_frac_of_job": 0.0001}
    assert bench._superstep_clean(wide, 32)


def test_compact_scaling_fits_tail_capture():
    scaling = {
        "protocol": "pinned-affinity fresh-JVM per cycle, AQE off, "
        "256 fixed shuffle partitions, clean-window-gated cycles, "
        "min-of-clean-supersteps",
        "edges": 32181792,
        "shuffle_partitions": 256,
        "repeats": 4,
        "supersteps_per_cycle": {"n2": 6, "n8": 8, "n4": 6, "n16": 8, "n32": 8},
        "best_probe_sec": 0.0181,
        "best_window_eff_frac": 0.94,
        "cycles": [{"huge": "x" * 5000}],  # must NOT leak into compact
        "host_probe_start": {"effective_cores_2": 2.0},
        "host_probe_end": {"effective_cores_2": 2.0},
        "n2": {"min_sec_per_superstep": 22.3, "edges_per_sec": 1443129,
               "clean_supersteps": 8, "clean_cycles": 3},
        "n8": {"min_sec_per_superstep": 6.01, "edges_per_sec": 5354707,
               "clean_supersteps": 6, "clean_cycles": 2},
        "n4": {"min_sec_per_superstep": 11.6, "edges_per_sec": 2774292,
               "clean_supersteps": 4, "clean_cycles": 2},
        "n16": {"min_sec_per_superstep": 3.4, "edges_per_sec": 9465233,
                "clean_supersteps": 5, "clean_cycles": 2},
        "n32": {"unmeasurable": True, "clean_supersteps": 1},
        "efficiency_2_to_8": 0.929,
        "efficiency_vs_host_ceiling_2_to_8": 0.918,
        "efficiency_vs_membw_ceiling_2_to_8": 1.02,
        "host_ceiling_speedup_2_to_8": 4.049,
        "efficiency_4_to_16": 0.853,
        "efficiency_vs_host_ceiling_4_to_16": 0.88,
        "efficiency_8_to_32": None,
        "efficiency_8_to_32_unmeasurable": "level n32 had <3 clean supersteps",
    }
    compact = bench._compact_scaling(scaling)
    line = json.dumps(compact)
    assert "cycles" not in compact and "host_probe_start" not in compact
    assert "supersteps_per_cycle" not in compact  # detail-file material
    assert compact["n2"]["min_sec_per_superstep"] == 22.3
    assert compact["n16"]["edges_per_sec"] == 9465233
    assert compact["n32"]["unmeasurable"] is True
    assert compact["efficiency_2_to_8"] == 0.929
    assert compact["efficiency_4_to_16"] == 0.853
    # the driver's tail capture overflowed at ~2 KB in round 2; the
    # whole result line (headline queries add ~700 B) must stay under
    assert len(line) < 1300


def test_supersteps_and_clean_fracs_cover_all_levels():
    for pair in bench.SCALING_PAIRS:
        for c in pair:
            assert c in bench.CLEAN_EFF_FRAC
            assert bench._supersteps_for(c) > bench.WARMUP_SUPERSTEPS + 2


def test_salvage_partial_cycle(tmp_path):
    # a storm-killed cycle must contribute the supersteps its child
    # streamed out before the timeout, with per-superstep CPU intact
    hz = os.sysconf("SC_CLK_TCK")
    t0 = 100.0
    # two 10 s supersteps; sampler ticks at start/end of each window
    def stat(user, steal):
        return [user, 0, 0, 0, 0, 0, 0, steal]

    part = {
        "cores": 2,
        "walls_sec": [10.0, 10.0],
        "windows": [[t0, t0 + 10.0], [t0 + 10.0, t0 + 20.0]],
        "samples": [
            [t0, stat(0, 0)],
            [t0 + 10.0, stat(int(19 * hz), 0)],
            [t0 + 20.0, stat(int(38 * hz), int(5 * hz))],
        ],
    }
    p = tmp_path / "cyc.partial"
    p.write_text(json.dumps(part))
    r = bench._salvage_partial_cycle(str(p), 2, "TimeoutExpired")
    assert r["failed"] == "TimeoutExpired(partial 2 supersteps)"
    assert r["walls_sec"] == [10.0, 10.0]
    assert len(r["supersteps"]) == 2
    # superstep 1: 19 user-core-seconds over 10 s => 1.9 cores, clean
    assert abs(r["supersteps"][0]["user_cores"] - 1.9) < 0.05
    assert r["supersteps"][0]["steal_cores"] == 0.0
    # superstep 2: 5 steal-core-seconds over 10 s => dirty at N=2
    assert r["supersteps"][1]["steal_frac_of_job"] > bench.STEAL_FRAC_CLEAN
    assert bench._superstep_clean(r["supersteps"][0], 2)
    assert not bench._superstep_clean(r["supersteps"][1], 2)
    # unreadable / absent partial degrades to the empty refusal record
    r2 = bench._salvage_partial_cycle(str(tmp_path / "nope"), 2, "TimeoutExpired")
    assert r2 == {
        "cores": 2,
        "failed": "TimeoutExpired",
        "walls_sec": [],
        "supersteps": [],
    }


def test_materialize_reuses_verified_table(tmp_path, monkeypatch):
    """A marker written after a completed materialization short-circuits
    the 32-thread re-inflation (which would burn the burst credits the
    pinned cycles need). The reuse path must verify the marker AND the
    parquet footprint — a stale or mismatched marker falls through to a
    rewrite (asserted here by the fall-through raising, since no Spark
    session is available in-process)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table_dir = tmp_path / "edges"
    table_dir.mkdir()
    t = pa.table({"src": [1, 2, 3], "dst": [2, 3, 1]})
    pq.write_table(t, table_dir / "part-0.parquet")
    monkeypatch.setenv("SPARK_GRAFT_SCALING_TABLE", str(table_dir))
    marker = str(table_dir) + ".meta"
    with open(marker, "w") as fh:
        json.dump({"copies": 24, "sf_dir": bench.SF_DIR, "n_edges": 3}, fh)
    path, n = bench._materialize_scaling_table(24)
    assert path == str(table_dir) and n == 3
    # mismatched copies -> must NOT reuse (falls through to the Spark
    # write; we assert the reuse branch was not taken by intercepting
    # the session constructor)
    with open(marker, "w") as fh:
        json.dump({"copies": 32, "sf_dir": bench.SF_DIR, "n_edges": 3}, fh)
    sentinel = RuntimeError("fell through to rewrite")

    def boom(*a, **k):
        raise sentinel

    monkeypatch.setattr(bench, "_session", boom)
    try:
        bench._materialize_scaling_table(24)
        raise AssertionError("reused a mismatched table")
    except RuntimeError as e:
        assert e is sentinel
    # row-count mismatch vs marker -> also rewrites
    with open(marker, "w") as fh:
        json.dump({"copies": 24, "sf_dir": bench.SF_DIR, "n_edges": 99}, fh)
    try:
        bench._materialize_scaling_table(24)
        raise AssertionError("reused a table whose rows disagree with marker")
    except RuntimeError as e:
        assert e is sentinel


def test_harvester_counts_prior_clean_supersteps(tmp_path, monkeypatch):
    """The harvester resumes toward the global clean-superstep target by
    scanning committed evidence files; only windows with a matching
    table (edges + partitions) count, and only gate-passing supersteps.
    It delegates to bench._merged_levels, so the shared loader's
    EVIDENCE_DIR is what gets patched."""
    from tools import cycle_harvester as ch

    monkeypatch.setattr(bench, "EVIDENCE_DIR", str(tmp_path))
    clean_ss = {"wall_sec": 10.0, "user_cores": 1.9, "system_cores": 0.1,
                "steal_cores": 0.0, "steal_frac_of_job": 0.0}
    dirty_ss = {"wall_sec": 50.0, "user_cores": 0.9, "system_cores": 1.0,
                "steal_cores": 0.0, "steal_frac_of_job": 0.0}
    win = {"edges": 100, "shuffle_partitions": 256, "cycles": [
        {"cores": 2, "supersteps": [clean_ss, clean_ss, dirty_ss]},
        {"cores": 8, "supersteps": [dirty_ss]},
    ]}
    (tmp_path / "a.json").write_text(json.dumps(win))
    # mismatched table: ignored entirely
    other = dict(win, edges=999)
    (tmp_path / "b.json").write_text(json.dumps(other))
    # BENCH_DETAIL-shaped file (scaling nested) also accepted
    (tmp_path / "c.json").write_text(json.dumps({"scaling": win}))
    counts = ch.existing_clean_counts([2, 8, 4], 100)
    assert counts == {2: 4, 8: 0, 4: 0}


def test_scaling_table_path_is_content_keyed(monkeypatch):
    """Different (sf_dir, copies) must never share a /dev/shm path: a
    bench run at another SF once re-materialized over the shared path
    mid-harvest, and the harvester's cycles measured the wrong table
    while self-reporting the old edge count."""
    monkeypatch.delenv("SPARK_GRAFT_SCALING_TABLE", raising=False)
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.1")
    p_big = bench._scaling_table_path(24)
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.001")
    p_small = bench._scaling_table_path(24)
    assert p_big != p_small
    assert bench._scaling_table_path(8) != p_small  # copies in the key
    # explicit override honored verbatim
    monkeypatch.setenv("SPARK_GRAFT_SCALING_TABLE", "/dev/shm/x")
    assert bench._scaling_table_path(24) == "/dev/shm/x"


def test_docs_quote_current_merged_artifact():
    """BASELINE/BENCH/SCALE narrate numbers whose source of truth is
    the merged scaling artifact; a re-merge that moves a floor must
    fail CI until the three docs are updated (round 4 caught stale
    2->8 figures in all three after one re-merge). Targets the
    highest-round builder artifact so a new round can't be silently
    checked against the previous round's file."""
    from tools.check_doc_numbers import check, latest_builder_artifact

    artifact = latest_builder_artifact()
    assert check(artifact) == [], artifact


def test_dual_pair_mode_alternates_window_locally():
    """HARVEST_DUAL_PAIR harvests both legs into ONE window until each
    has `target` clean supersteps there — window-local counts, slow
    leg leads ties, per-leg cycle cap respected, None when done."""
    from tools.cycle_harvester import dual_pair_next

    pair, target, cap = (2, 8), 4, 5
    # fresh window: slow leg (n2) leads the tie
    assert dual_pair_next(pair, {}, {}, target, cap) == 2
    # n2 ahead window-locally -> n8 next, even if n8 is ahead globally
    assert dual_pair_next(pair, {2: 3, 8: 0}, {2: 1}, target, cap) == 8
    # n8 met its window target -> keep finishing n2
    assert dual_pair_next(pair, {2: 3, 8: 4}, {2: 1, 8: 1}, target, cap) == 2
    # both met, window pair <= 1.0 -> window complete
    done = ({2: 4, 8: 4}, {2: 2, 8: 1})
    assert dual_pair_next(pair, *done, target, cap,
                          {2: 20.0, 8: 5.5}) is None          # eff 0.909
    # both met but window pair > 1.0 -> slow-leg floor unfound in this
    # window: keep resampling the slow leg (window-scope protocol copy)
    assert dual_pair_next(pair, *done, target, cap,
                          {2: 24.0, 8: 5.5}) == 2             # eff 1.09
    # ... unless the slow leg hit its cycle cap
    assert dual_pair_next(pair, {2: 4, 8: 4}, {2: 5, 8: 1}, target, cap,
                          {2: 24.0, 8: 5.5}) is None
    # a leg at its cycle cap stops consuming budget even short of target
    assert dual_pair_next(pair, {2: 0, 8: 4}, {2: 5, 8: 1}, target, cap) is None


def test_foreign_load_gate_is_cycle_relative():
    """A second guest process burning the pinned CPUs books as plain
    user time (steal≈0, sys/user small) — invisible to the per-sample
    gates. Identical work per superstep bounds user-core-seconds: the
    worst legitimate (memory-stall) inflation measured 2.4× the
    cycle's floor; the one measured foreign-load sample read 4.0×.
    The cycle-relative gate rejects >3× and nothing else."""
    def ss(wall, user=1.8):
        return {"wall_sec": wall, "user_cores": user, "system_cores": 0.05,
                "steal_cores": 0.0, "steal_frac_of_job": 0.0}

    base = [ss(30.0), ss(31.0), ss(33.0)]           # cs ≈ 54-59
    stall = ss(70.0)                                # 2.33× floor: legit regime
    foreign = ss(136.2, user=1.9)                   # 4.8× floor: second process
    kept = bench.cycle_clean_supersteps(base + [stall, foreign], 2)
    assert stall in kept and foreign not in kept
    assert len(kept) == 4
    # the per-sample gates still apply first
    dirty = dict(ss(30.0), steal_frac_of_job=0.08)
    assert dirty not in bench.cycle_clean_supersteps(base + [dirty], 2)
    # a single passing sample has no intra-cycle reference: kept
    assert bench.cycle_clean_supersteps([ss(136.2)], 2) == [ss(136.2)]


def test_merge_tool_reports_per_window_pairs(tmp_path):
    """Windows that measured BOTH legs of a criterion pair (≥3 clean
    supersteps each) get a self-contained, regime-matched per-window
    efficiency in the merged artifact; single-leg windows don't."""
    from tools import merge_scaling_windows as msw

    def ss(wall):
        return {"wall_sec": wall, "user_cores": 1.9, "system_cores": 0.1,
                "steal_cores": 0.0, "steal_frac_of_job": 0.0}

    both = {"edges": 1000000, "shuffle_partitions": 256, "cycles": [
        {"cycle": 0, "cores": 2, "supersteps": [ss(40.0), ss(41.0), ss(42.0)]},
        {"cycle": 1, "cores": 8, "supersteps": [ss(11.0), ss(11.5), ss(12.0)]},
    ]}
    one_leg = {"edges": 1000000, "shuffle_partitions": 256, "cycles": [
        {"cycle": 0, "cores": 2, "supersteps": [ss(38.0), ss(39.0), ss(39.5)]},
    ]}
    a, b = tmp_path / "both.json", tmp_path / "oneleg.json"
    a.write_text(json.dumps(both))
    b.write_text(json.dumps(one_leg))
    merged = msw.merge([str(a), str(b)])
    # merged floor takes the one-leg window's faster n2 samples
    assert merged["n2"]["min_sec_per_superstep"] == 38.0
    assert merged["efficiency_2_to_8"] == round((38.0 / 11.0) / 4, 3)
    # per-window pair only for the window holding both legs
    assert merged["per_window_pairs"] == {
        "both.json": {"2_to_8": round((40.0 / 11.0) / 4, 3)}
    }


def test_skip_scaling_detail_never_clobbers_curated_artifact(monkeypatch):
    """A fast/smoke run (SPARK_GRAFT_SKIP_SCALING=1) has no scaling
    block; writing it over the committed full-run detail would
    silently delete evidence. It must land in the temp dir unless an
    explicit SPARK_GRAFT_DETAIL_PATH says otherwise."""
    monkeypatch.delenv("SPARK_GRAFT_DETAIL_PATH", raising=False)
    assert bench._detail_path(skip_scaling=False) == bench.DETAIL_FILE
    skip = bench._detail_path(skip_scaling=True)
    assert skip != bench.DETAIL_FILE
    assert "BENCH_DETAIL_r5" not in skip
    monkeypatch.setenv("SPARK_GRAFT_DETAIL_PATH", "/tmp/explicit.json")
    assert bench._detail_path(skip_scaling=True) == bench.DETAIL_FILE


def test_clean_eff_frac_handles_arbitrary_widths():
    """HARVEST_FORCE_LEVEL / HARVEST_LEVELS accept any core count; the
    window gate takes the nearest-wider tabulated threshold instead of
    KeyError-ing."""
    assert bench._clean_eff_frac(8) == bench.CLEAN_EFF_FRAC[8]
    assert bench._clean_eff_frac(24) == bench.CLEAN_EFF_FRAC[32]
    assert bench._clean_eff_frac(6) == bench.CLEAN_EFF_FRAC[8]
    assert bench._clean_eff_frac(64) == bench.CLEAN_EFF_FRAC[32]


def test_kernel_gate_is_width_aware():
    # fault-latency-regime n2 signature (BENCH.md round-4 root cause):
    # wall ~2x the healthy cost, steal near zero, sys/user 0.32-0.39 —
    # slipped under the old flat 0.4 gate and, being on the SLOW leg,
    # would inflate every N->4N efficiency computed from it
    fault_n2 = {"wall_sec": 41.8, "user_cores": 1.39,
                "system_cores": 0.54, "steal_frac_of_job": 0.003}
    assert not bench._superstep_clean(fault_n2, 2)
    # genuinely healthy narrow-width sample (measured cluster ~0.03-0.07)
    healthy_n2 = {"wall_sec": 21.0, "user_cores": 1.9,
                  "system_cores": 0.1, "steal_frac_of_job": 0.001}
    assert bench._superstep_clean(healthy_n2, 2)
    # legit wide-level tmpfs-shuffle kernel share stays admissible
    healthy_n32 = {"wall_sec": 4.8, "user_cores": 21.7,
                   "system_cores": 7.5, "steal_frac_of_job": 0.0001}
    assert bench._superstep_clean(healthy_n32, 32)
    # every slow-leg width has a strict (<0.3) gate
    for n, _ in bench.SCALING_PAIRS:
        assert bench._kernel_gate(n) < 0.3


def test_pair_efficiency_superlinear_refusal():
    eff, reason = bench._pair_efficiency(1000.0, 3716.0, 2, 8)
    assert eff == 0.929 and reason is None
    # slow leg wall-inflated 2x -> apparent efficiency 1.86: refused
    eff, reason = bench._pair_efficiency(500.0, 3716.0, 2, 8)
    assert eff is None and "superlinear" in reason
    # mildly superlinear (measurement noise) passes through...
    eff, reason = bench._pair_efficiency(1000.0, 4200.0, 2, 8)
    assert eff == 1.05 and reason is None
    # ...but carries the slow-leg-floor-unfound annotation, while a
    # physically possible reading does not
    assert "slow-leg" in bench._pair_note(1.05)
    assert bench._pair_note(0.93) is None
    assert bench._pair_note(None) is None


def test_merged_levels_unions_committed_windows(tmp_path, monkeypatch):
    """The driver-run artifact must report criterion numbers over the
    union of its own clean supersteps and committed scaling_evidence/
    windows of the IDENTICAL protocol instance (same table + layout),
    with provenance."""
    monkeypatch.setattr(bench, "EVIDENCE_DIR", str(tmp_path))

    def ss(wall, cores):
        return {"wall_sec": wall, "user_cores": cores * 0.95,
                "system_cores": cores * 0.02, "steal_frac_of_job": 0.0}

    committed = {
        "edges": 1000, "shuffle_partitions": 256,
        "cycles": [
            {"cores": 2, "supersteps": [ss(20.0, 2), ss(21.0, 2)]},
            {"cores": 8, "supersteps": [ss(5.5, 8), ss(5.6, 8), ss(5.4, 8)]},
        ],
    }
    (tmp_path / "w1.json").write_text(json.dumps(committed))
    # different table: must be excluded
    (tmp_path / "w2.json").write_text(
        json.dumps(dict(committed, edges=999)))
    own = [{"cores": 2, "supersteps": [ss(19.8, 2)]}]
    m = bench._merged_levels(own, 1000, 256, [2, 8], [(2, 8)])
    assert m["n2"]["clean_supersteps"] == 3  # 2 committed + 1 own
    assert m["n8"]["clean_supersteps"] == 3
    assert "<this window>" in m["n2"]["windows"]
    assert "w1.json" in m["n8"]["windows"]
    # min over the union: n2 19.8 (own), n8 5.4
    assert m["n2"]["min_sec_per_superstep"] == 19.8
    assert m["n8"]["min_sec_per_superstep"] == 5.4
    expected = round(
        (m["n8"]["edges_per_sec"] / m["n2"]["edges_per_sec"]) / 4, 3
    )
    assert m["efficiency_2_to_8"] == expected
    # median cross-check over the union: n2 [19.8,20,21] -> 20.0,
    # n8 [5.4,5.5,5.6] -> 5.5
    assert m["n2"]["median_sec_per_superstep"] == 20.0
    assert m["efficiency_2_to_8_median"] == round((20.0 / 5.5) / 4, 3)
    # w1 measured both legs with >=3 clean each? n2 only has 2 in w1
    # -> no self-contained pair from w1
    assert "per_window_pairs" not in m
    # give w1 a third clean n2 superstep: its pair becomes reportable
    committed["cycles"][0]["supersteps"].append(ss(20.5, 2))
    (tmp_path / "w1.json").write_text(json.dumps(committed))
    m2 = bench._merged_levels(own, 1000, 256, [2, 8], [(2, 8)])
    assert m2["per_window_pairs"]["w1.json"]["2_to_8"] == round(
        (20.0 / 5.4) / 4, 3
    )
    compact = bench._compact_scaling({"edges": 1000, "merged": m})
    assert compact["merged"]["efficiency_2_to_8"] == m["efficiency_2_to_8"]
    # the regime-mix median cross-check rides the same projection
    assert (
        compact["merged"]["efficiency_2_to_8_median"]
        == m["efficiency_2_to_8_median"]
    )
    assert compact["merged"]["clean_supersteps"]["n2"] == 3
    assert len(json.dumps(compact)) < 1300


def test_headline_query_contamination_adjudicator():
    """The per-query retry loop (round-5) keys off the same verdict
    main() publishes as ``contaminated_queries``: steal >= 2% of the
    window, or kernel time >= 0.6x user (lock-holder-preemption
    storm). A clean profile, a missing probe, and the boundary cases
    must adjudicate exactly — a drifting gate either retries forever
    (burning the budget) or publishes storm walls as clean."""
    c = bench._query_contaminated
    assert not c(None)
    assert not c({})
    assert not c({"user_pct": 90.0, "system_pct": 5.0, "steal_pct": 0.3})
    assert c({"user_pct": 50.0, "system_pct": 1.0, "steal_pct": 2.0})
    assert c({"user_pct": 50.0, "system_pct": 30.0, "steal_pct": 0.0})
    assert not c({"user_pct": 50.0, "system_pct": 29.9, "steal_pct": 0.0})
    # zero-user window (all-wait query): tiny kernel share must not
    # divide-by-zero or flag
    assert c({"user_pct": 0.0, "system_pct": 0.1, "steal_pct": 0.0})
