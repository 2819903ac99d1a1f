"""PageRank golden fixtures (/root/reference/lib/test/test_page_rank.c)
+ networkx cross-check + checkpoint/resume kill-test."""

from __future__ import annotations

import numpy as np
import pytest

from aduana_spark.datagen import (
    GOLDEN_PAGERANK_D085,
    GOLDEN_PAGERANK_D05_SCORES,
    GOLDEN_SCORES,
    golden_edges,
    golden_scores,
    random_digraph,
)
from aduana_spark.graph.pagerank import pagerank


def _ranks_dict(result):
    return {r["id"]: r["rank"] for r in result.ranks.collect()}


def test_pagerank_golden_d085(spark):
    """test_page_rank.c:104-140: d=0.85, precision 1e-6."""
    res = pagerank(golden_edges(spark), damping=0.85, precision=1e-6, strict=True)
    got = _ranks_dict(res)
    for i, want in GOLDEN_PAGERANK_D085.items():
        assert got[i] == pytest.approx(want, abs=1e-6), i
    assert res.converged


def test_pagerank_golden_d0_scores(spark):
    """test_page_rank.c:143-186: d=0 + content scores → PR_i = s_i/Σs."""
    res = pagerank(
        golden_edges(spark),
        damping=0.0,
        precision=1e-6,
        scores=golden_scores(spark),
        strict=True,
    )
    got = _ranks_dict(res)
    total = sum(GOLDEN_SCORES.values())
    for i, s in GOLDEN_SCORES.items():
        assert got[i] == pytest.approx(s / total, abs=1e-6), i


def test_pagerank_golden_d05_scores(spark):
    """test_page_rank.c:188-235: d=0.5 + content scores."""
    res = pagerank(
        golden_edges(spark),
        damping=0.5,
        precision=1e-6,
        scores=golden_scores(spark),
        strict=True,
    )
    got = _ranks_dict(res)
    for i, want in GOLDEN_PAGERANK_D05_SCORES.items():
        assert got[i] == pytest.approx(want, abs=1e-6), i


def test_pagerank_numpy_crosscheck(spark):
    """Independent dense-float64 oracle with the same reference
    semantics (tests/oracles.py) on a 200-node random digraph with a
    planted hub + dangling nodes."""
    from tests.oracles import pagerank_numpy

    edges, n = random_digraph(n=200, p=0.03, seed=7)
    want = pagerank_numpy(edges, n, damping=0.85, precision=1e-12)
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id LONG")
    res = pagerank(df, damping=0.85, precision=1e-7, vertices=verts, max_iters=200)
    got = _ranks_dict(res)
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-6), i


def test_pagerank_personalized_numpy_crosscheck(spark):
    from tests.oracles import pagerank_numpy

    edges, n = random_digraph(n=120, p=0.03, seed=21)
    scores = {i: (i % 7) / 7.0 for i in range(n)}
    want = pagerank_numpy(edges, n, damping=0.6, scores=scores, precision=1e-10)
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    sdf = spark.createDataFrame(list(scores.items()), "id LONG, score DOUBLE")
    res = pagerank(df, damping=0.6, precision=1e-7, scores=sdf, max_iters=200)
    got = _ranks_dict(res)
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-6), i


def test_pagerank_salted_matches_unsalted(spark):
    edges, n = random_digraph(n=150, p=0.03, seed=11)
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    plain = _ranks_dict(pagerank(df, precision=1e-8))
    salted = _ranks_dict(pagerank(df, precision=1e-8, salt_buckets=8))
    for i in plain:
        assert salted[i] == pytest.approx(plain[i], abs=1e-9)


def test_pagerank_checkpoint_resume(spark, tmp_path):
    """Kill-test: run 3 supersteps, then resume from the shard and
    converge — final ranks match an uninterrupted run to 1e-9."""
    edges, n = random_digraph(n=100, p=0.04, seed=3)
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    full = _ranks_dict(pagerank(df, precision=1e-10, max_iters=200))

    ck = str(tmp_path / "ck")
    partial = pagerank(
        df, precision=1e-10, max_iters=3, checkpoint=ck, checkpoint_interval=1
    )
    assert not partial.converged
    from aduana_spark.graph.checkpoint import CheckpointManager

    cm = CheckpointManager(ck, "pagerank")
    assert cm.latest() == 3
    m = cm.manifest(3)
    assert m["delta"] > 0 and m["edges"] == partial.n_edges

    resumed = pagerank(
        df,
        precision=1e-10,
        max_iters=200,
        checkpoint=ck,
        checkpoint_interval=5,
        resume=True,
    )
    got = _ranks_dict(resumed)
    for i in full:
        assert got[i] == pytest.approx(full[i], abs=1e-9)


def test_pagerank_metrics_recorded(spark):
    res = pagerank(golden_edges(spark), precision=1e-6)
    assert len(res.metrics) == res.n_iterations
    assert all(m.edges_per_sec > 0 for m in res.metrics)
    deltas = res.deltas
    assert deltas[-1] <= 1e-6


def test_derived_superstep_partitions_policy(spark):
    """The scale-adaptive loop width only ever NARROWS the session's
    shuffle setting: tiny inputs derive few partitions, inputs big
    enough to fill the configured width leave it alone (None)."""
    from aduana_spark.graph.pagerank import (
        SUPERSTEP_ROWS_PER_TASK,
        _derived_superstep_partitions,
    )

    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert _derived_superstep_partitions(spark, 1) == 1
    assert (
        _derived_superstep_partitions(spark, SUPERSTEP_ROWS_PER_TASK * (sess + 5))
        is None
    )


def test_pagerank_restores_session_shuffle_partitions(spark):
    """pagerank's derived loop width is session-conf-scoped state; it
    must be restored on exit so sibling queries in the same session
    keep the configured width."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    res = pagerank(golden_edges(spark), precision=1e-6, max_iters=60)
    assert res.converged
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
