"""Connected components by iterated min-id propagation (SURVEY.md
§2.10 — north-rule extension; no counterpart in the reference, which
promises "other ranking algorithms based on the link structure",
README.md:3-6).

Semantics: weakly connected components of the directed edge table —
each vertex is labeled with the smallest vertex id in its component
(exact oracle: ``networkx.weakly_connected_components``).

Algorithm: min-label propagation over the symmetrized edge set.
Each superstep::

    label'[v] = min(label[v], min_{(u,v) ∈ E_sym} label[u])

converging in O(diameter) supersteps (web graphs: ~15-25). Each
superstep is one join + min-aggregate with map-side partial
aggregation; convergence is detected by counting changed labels
(a cheap aggregate over the persisted candidate DF). For graphs with
pathological diameters, the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond") converges in O(log²) rounds — min-propagation is the
reference-shaped default because crawl graphs are shallow.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from aduana_spark.graph.checkpoint import CheckpointManager
from aduana_spark.graph.pagerank import (
    IterativeResult,
    SuperstepMetrics,
    _derived_superstep_partitions,
)


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected projection: edges ∪ reversed(edges), deduplicated."""
    return (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
    )


def connected_components(
    edges: DataFrame,
    max_iters: int = 50,
    checkpoint: CheckpointManager | str | None = None,
    checkpoint_interval: int = 5,
    algorithm: str = "minprop",
    resume: bool = False,
) -> IterativeResult:
    """Returns ranks DataFrame (id, component) — component = min id in
    the weakly connected component.

    ``algorithm='minprop'`` (default): O(diameter) min-label
    propagation — right for shallow crawl graphs.
    ``algorithm='two-phase'``: alternating large-star/small-star
    (Kiveris et al.), O(log²) rounds — the scale path for
    high-diameter graphs (see ``connected_components_two_phase``).
    ``resume=True`` warm-starts from the latest checkpoint shard
    (north-rule mid-iteration resume, like pagerank/hits): min-label
    propagation is monotone — labels only decrease — so resuming from
    any shard converges to the identical fixpoint.
    """
    if algorithm == "two-phase":
        return connected_components_two_phase(
            edges,
            max_iters=max_iters,
            checkpoint=checkpoint,
            checkpoint_interval=checkpoint_interval,
            resume=resume,
        )
    spark = edges.sparkSession
    ckpt = (
        CheckpointManager(checkpoint, "components")
        if isinstance(checkpoint, str)
        else checkpoint
    )
    sym = (
        symmetrize(edges)
        .repartition(F.col("src"))
        .sortWithinPartitions("src")  # cached sort order → SMJ never re-sorts E
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_edges = sym.count()

    # scale-adaptive loop width (pagerank._derived_superstep_partitions):
    # narrow per-superstep exchanges for small graphs, session value
    # restored at exit; the cached E-row layout above is untouched
    restore_parts: str | None = None
    dp = _derived_superstep_partitions(spark, n_edges)
    if dp:
        restore_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(dp))

    verts = (
        sym.select(F.col("src").alias("id"))
        .unionAll(sym.select(F.col("dst").alias("id")))
        .distinct()
    )
    start_iter = 0
    if resume and ckpt is not None and ckpt.latest() is not None:
        start_iter = ckpt.latest()
        prev = ckpt.load(spark, start_iter).select("id", "component")
        # vertices unseen by the shard (graph growth) start at their
        # own id — monotone labels make the merge restart-safe
        state = verts.join(prev, "id", "left").select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
    else:
        state = verts.select("id", F.col("id").alias("component"))
    # no explicit repartition: both branches are hash-partitioned by id
    # already (distinct / equi-join output)
    state = state.persist(StorageLevel.MEMORY_AND_DISK)
    n_vertices = state.count()

    metrics: list[SuperstepMetrics] = []
    converged = False
    it = start_iter
    # Delta propagation: a vertex only needs to (re)send its label after
    # the superstep in which that label changed — a label already
    # delivered to a neighbor was folded into the neighbor's (monotone,
    # non-increasing) label, so messages from unchanged vertices are
    # ≥ the receiver's current label and can never win the min. The
    # per-superstep labels (and therefore the changed-count convergence
    # test) are IDENTICAL to the broadcast-from-everyone formulation;
    # what shrinks is the E-row join output and the groupBy shuffle,
    # which decay with the frontier instead of staying O(E) for every
    # superstep. Superstep 1 sends from every vertex (initial labels
    # are unseen); after a resume the first superstep also sends from
    # everyone — monotonicity makes the extra messages harmless.
    frontier = state
    for it in range(start_iter + 1, start_iter + max_iters + 1):
        t0 = time.time()
        msgs = (
            sym.join(
                frontier.select(
                    F.col("id").alias("src"), F.col("component").alias("c")
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.min("c").alias("nbr_min"))
            .withColumnRenamed("dst", "id")
        )
        cand = state.join(msgs, "id", "left").select(
            "id",
            F.col("component").alias("old"),
            F.least(
                "component", F.coalesce("nbr_min", F.col("component"))
            ).alias("component"),
        ).localCheckpoint(eager=False)  # truncated; next action materializes
        changed = cand.where(F.col("component") != F.col("old")).count()
        new_state = cand.select("id", "component")
        frontier = cand.where(F.col("component") != F.col("old")).select(
            "id", "component"
        )
        wall = time.time() - t0
        metrics.append(
            SuperstepMetrics(it, float(changed), wall, n_edges, n_edges / max(wall, 1e-9))
        )
        converged = changed == 0
        if ckpt is not None and (it % checkpoint_interval == 0 or converged):
            new_state = ckpt.save(
                it,
                new_state,
                {"algo": "components", "changed": changed, "wall_sec": wall},
            )
        state.unpersist()
        state = new_state
        if converged:
            break

    if restore_parts is not None:
        spark.conf.set("spark.sql.shuffle.partitions", restore_parts)
    return IterativeResult(
        ranks=state,
        converged=converged,
        n_iterations=it - start_iter,
        n_vertices=n_vertices,
        n_edges=n_edges,
        metrics=metrics,
    )


def _large_star(sym: DataFrame) -> DataFrame:
    """For each u: m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u.
    ``sym`` must contain both directions of every edge."""
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.col("src")).alias("m")
    )
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _small_star(directed: DataFrame) -> DataFrame:
    """Input edges point large→small (src > dst). For each u:
    m = min(N(u) ∪ {u}) over its smaller neighbors; emit (v, m) for
    v ∈ N(u) ∪ {u}, v ≠ m."""
    mins = directed.groupBy("src").agg(
        F.least(F.min("dst"), F.col("src")).alias("m")
    )
    joined = directed.join(mins, "src")
    nbr_edges = joined.select(F.col("dst").alias("v"), F.col("m"))
    self_edges = mins.select(F.col("src").alias("v"), F.col("m"))
    return (
        nbr_edges.unionAll(self_edges)
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


def connected_components_two_phase(
    edges: DataFrame,
    max_iters: int = 40,
    checkpoint: CheckpointManager | str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> IterativeResult:
    """Alternating large-star/small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    converges in O(log² n) rounds independent of graph diameter, so a
    10^12-edge graph with a long-tail path structure still finishes in
    ~dozens of rounds where min-propagation would need thousands.

    Each round is two groupBy-min + join passes over the shrinking
    edge list; convergence = the small-star output is a stable
    star forest (edge multiset unchanged, detected by count +
    order-insensitive hash).

    Checkpoint/resume: the per-round edge list IS the whole state
    (each round is a pure function of the previous round's edges), so
    the shard is the (src, dst) list and the manifest carries the
    convergence signature. ``resume=True`` reloads the latest shard
    and continues the round loop from there; the result is identical
    to the uninterrupted run because the round transform is
    deterministic. The vertex set is always recomputed from the input
    ``edges`` (isolated vertices never enter the star forest)."""
    import time as _time

    spark = edges.sparkSession
    ckpt = (
        CheckpointManager(checkpoint, "components_two_phase")
        if isinstance(checkpoint, str)
        else checkpoint
    )
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_vertices = verts.count()
    cur = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=False)
    )
    n_edges = cur.count()

    def _sig(df: DataFrame):
        r = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).first()
        return (r["n"], r["h"])

    metrics: list[SuperstepMetrics] = []
    converged = False
    prev_sig = None
    start_iter = 0
    if resume and ckpt is not None and ckpt.latest() is not None:
        start_iter = ckpt.latest()
        cur = ckpt.load(spark, start_iter).select("src", "dst")
        man = ckpt.manifest(start_iter)
        if "sig_n" in man:
            prev_sig = (man["sig_n"], man["sig_h"])
    it = start_iter
    for it in range(start_iter + 1, start_iter + max_iters + 1):
        t0 = _time.time()
        sym = cur.unionAll(
            cur.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        after_large = _large_star(sym)
        cur = _small_star(after_large).localCheckpoint(eager=False)
        sig = _sig(cur)
        wall = _time.time() - t0
        metrics.append(
            SuperstepMetrics(it, float(sig[0]), wall, n_edges, n_edges / max(wall, 1e-9))
        )
        if sig == prev_sig:
            converged = True
        if ckpt is not None and (
            it % checkpoint_interval == 0 or converged or it == start_iter + max_iters
        ):
            cur = ckpt.save(
                it,
                cur,
                {
                    "algo": "components_two_phase",
                    "sig_n": sig[0],
                    "sig_h": sig[1],
                    "wall_sec": wall,
                },
            )
        if converged:
            break
        prev_sig = sig

    # stable star forest: cur maps v → root; isolated vertices map to self
    comp = verts.join(
        cur.select(F.col("src").alias("id"), F.col("dst").alias("component")),
        "id",
        "left",
    ).select("id", F.coalesce("component", F.col("id")).alias("component"))
    return IterativeResult(
        ranks=comp,
        converged=converged,
        n_iterations=it - start_iter,
        n_vertices=n_vertices,
        n_edges=n_edges,
        metrics=metrics,
    )
