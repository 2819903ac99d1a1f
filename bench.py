#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md scaling protocol).

Runs the engine's headline operators over ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "pagerank_edges_per_superstep_sec": ...,
     "scaling": {"n8_edges_per_sec": ..., "n32_edges_per_sec": ...,
                 "efficiency": ...}}

The scaling section implements the sandbox protocol for the north
rule's two-cluster-size criterion (BASELINE.md): the identical
PageRank job over the same deterministic edge table at two
parallelism levels (local[8] = N, local[32] = 4N on this 32-core
host); efficiency = (throughput@4N / throughput@N) / 4.

Edge table: deduplicated union of the star-schema's natural digraphs
(customer→order, order→part, part→supplier) — Zipf-ish part reuse
gives realistic in-degree skew. The scaling run inflates it ×16 with
salted copies so the job is compute-bound rather than
overhead-bound at both parallelism levels.

Set SPARK_GRAFT_SKIP_SCALING=1 to skip the two-level run (fast mode).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SKIP_SCALING = os.environ.get("SPARK_GRAFT_SKIP_SCALING", "") == "1"


def _session(cores: int, shuffle_partitions: int) -> SparkSession:
    import pathlib

    from aduana_spark.session import get_spark

    # tmpfs shuffle dirs: keeps local-mode shuffle I/O off the VM's
    # disk (measured: stabilizes superstep walls from 4-30s swings to
    # ±10% at 8 cores)
    local_dir = "/dev/shm/spark-local"
    pathlib.Path(local_dir).mkdir(exist_ok=True)
    return get_spark(
        app_name=f"aduana-bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle_partitions,
        extra_conf={"spark.local.dir": local_dir},
    )


def _t(spark, name) -> DataFrame:
    return spark.read.parquet(f"{SF_DIR}/{name}.parquet")


def bench_edges(spark) -> DataFrame:
    """Deduplicated multi-relation digraph from the star schema."""
    orders = _t(spark, "orders")
    li = _t(spark, "lineitem")
    P, S = 10_000_000, 20_000_000
    e1 = orders.select(
        F.col("o_custkey").cast("long").alias("src"),
        (F.col("o_orderkey") + 1_000_000).cast("long").alias("dst"),
    )
    e2 = li.select(
        (F.col("l_orderkey") + 1_000_000).cast("long").alias("src"),
        (F.col("l_partkey") + P).cast("long").alias("dst"),
    )
    e3 = li.select(
        (F.col("l_partkey") + P).cast("long").alias("src"),
        (F.col("l_suppkey") + S).cast("long").alias("dst"),
    )
    return e1.unionAll(e2).unionAll(e3).dropDuplicates(["src", "dst"])


def scaling_edges(spark, copies: int = 16) -> DataFrame:
    """×copies salted inflation of the bench graph (same for both
    parallelism levels)."""
    e = bench_edges(spark)
    k = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("k")
    return e.select("src", "dst", k).select(
        (F.col("src") + F.col("k") * 100_000_000).alias("src"),
        (F.col("dst") + F.col("k") * 100_000_000).alias("dst"),
    )


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def run_headline(spark) -> dict[str, float]:
    from aduana_spark.datagen import synth_pages
    from aduana_spark.extraction import extract_pages, raw_edges
    from aduana_spark.graph.components import connected_components
    from aduana_spark.graph.hits import hits
    from aduana_spark.graph.pagerank import pagerank
    from aduana_spark.graph.triangles import triangle_count
    from aduana_spark.pipeline.dedup import minhash_lsh_candidates
    from aduana_spark.pipeline.similarity import brute_force_topk

    q: dict[str, float] = {}
    edges = bench_edges(spark)

    sec, pr = timed(lambda: pagerank(edges, precision=1e-6, max_iters=60))
    q["pagerank_1e6"] = sec
    q["pagerank_superstep"] = sum(m.wall_sec for m in pr.metrics) / max(
        len(pr.metrics), 1
    )
    globals()["_PR_RESULT"] = pr

    sec, _ = timed(
        lambda: hits(edges, precision=1e-4, max_iters=40).ranks.count()
    )
    q["hits_1e4"] = sec

    sec, _ = timed(lambda: connected_components(edges).ranks.count())
    q["connected_components"] = sec

    li = _t(spark, "lineitem")
    mod = li.select(
        (F.col("l_partkey") % 500).cast("long").alias("src"),
        (F.col("l_suppkey") % 500).cast("long").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    sec, _ = timed(lambda: triangle_count(mod).collect())
    q["triangle_count"] = sec

    orders = _t(spark, "orders")
    sec, _ = timed(
        lambda: orders.where(F.col("o_orderstatus") == "O")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .collect()
    )
    q["frontier_topk"] = sec

    docs = _t(spark, "documents")
    sec, _ = timed(
        lambda: minhash_lsh_candidates(
            docs, num_perm=64, bands=16, shingle_k=3, threshold=0.5
        ).count()
    )
    q["minhash_lsh"] = sec

    emb = _t(spark, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    sec, _ = timed(
        lambda: brute_force_topk(emb, list(qvec), k=10).collect()
    )
    q["embedding_topk"] = sec

    sec, _ = timed(
        lambda: raw_edges(
            extract_pages(synth_pages(spark, n_pages=5000, n_domains=200))
        ).count()
    )
    q["extract_5k_pages"] = sec
    return q


def run_scaling(core_levels=(2, 8, 32), supersteps: int = 6, repeats: int | None = None) -> dict:
    """Identical PageRank job at multiple parallelism levels.

    Per BASELINE.md, scaling efficiency between N and 4N is evidenced
    by core-count pairs on this host: (2 → 8) and (8 → 32). This
    sandbox is a VM with heavy intermittent host CPU steal (a pure
    numpy matmul probe varies 10× run to run), so the estimator must
    be steal-robust: cycles over the levels are **interleaved in
    time** (repeats) and the per-superstep wall is the **minimum**
    over all steady-state supersteps of all cycles — every superstep
    processes the same edge set, so the minimum is the machine's true
    cost and the rest is host interference.
    """
    from aduana_spark.graph.pagerank import pagerank

    repeats = repeats or int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
    # identical partitioning (→ identical physical plan and task set) at
    # every level; only the number of worker threads varies — the same
    # way a cluster scales by adding executors under a fixed layout
    fixed_partitions = 2 * max(core_levels)
    out = {"shuffle_partitions": fixed_partitions, "repeats": repeats}
    walls_by_level: dict[int, list[float]] = {c: [] for c in core_levels}
    n_edges = None
    for _cycle in range(repeats):
        for cores in core_levels:
            spark = _session(cores, shuffle_partitions=fixed_partitions)
            try:
                edges = scaling_edges(spark)
                res = pagerank(edges, precision=1e-6, max_iters=supersteps)
                n_edges = res.n_edges
                walls_by_level[cores] += [m.wall_sec for m in res.metrics][1:]
            finally:
                spark.stop()
    for cores in core_levels:
        walls = walls_by_level[cores]
        best = min(walls)
        out[f"n{cores}"] = {
            "edges": n_edges,
            "steady_supersteps": len(walls),
            "walls_sec": [round(w, 2) for w in walls],
            "min_sec_per_superstep": round(best, 3),
            "edges_per_sec": n_edges / best,
        }
    for n, n4 in zip(core_levels, core_levels[1:]):
        if f"n{n}" in out and f"n{n4}" in out:
            out[f"efficiency_{n}_to_{n4}"] = (
                out[f"n{n4}"]["edges_per_sec"] / out[f"n{n}"]["edges_per_sec"]
            ) / (n4 / n)
    return out


def main() -> None:
    t_all = time.time()
    spark = _session(CPUS, shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        queries = run_headline(spark)
    finally:
        spark.stop()

    scaling = None
    if not SKIP_SCALING:
        # driver-budget-friendly default: the (N=8 → 4N=32) pair; the
        # full 3-level protocol (2/8/32) is run_scaling's default and
        # recorded in BENCH.md
        scaling = run_scaling(core_levels=(8, 32), supersteps=5)

    pr = globals().get("_PR_RESULT")
    result = {
        "metric": "headline_suite_total",
        "value": round(time.time() - t_all, 3),
        "unit": "sec",
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "pagerank_edges": pr.n_edges if pr else None,
        "pagerank_supersteps": pr.n_iterations if pr else None,
        "pagerank_edges_per_superstep_sec": (
            round(
                pr.n_edges * pr.n_iterations / sum(m.wall_sec for m in pr.metrics)
            )
            if pr
            else None
        ),
    }
    if scaling:
        result["scaling"] = {
            k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in scaling.items()
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
