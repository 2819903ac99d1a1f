"""BFS depth / provenance propagation.

The reference records ``depth`` and ``linked_from`` on the first
crawl path that reaches a page (page_db.c:196-237, 864-868, 921-931) —
an approximation of shortest-path depth validated in its Python tests
against ``networkx.single_source_shortest_path_length``
(/root/reference/test/test_crawl.py:82-88). Here we compute the exact
shortest-path depth from a seed set by iterative min-depth message
passing (the same superstep skeleton as connected components):

    depth'[v] = min(depth[v], min_{(u,v)} depth[u] + 1)

Frontier-only optimization: only vertices whose depth changed last
superstep emit messages, so each superstep joins the (shrinking)
frontier against the edge table instead of the full vertex state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from aduana_spark.graph.pagerank import _derived_superstep_partitions


def bfs_depths(
    edges: DataFrame, seeds: DataFrame, max_depth: int | None = None
) -> DataFrame:
    """Shortest-path depth from ``seeds`` (DataFrame with column
    ``id``). Returns (id, depth) for reachable vertices only."""
    spark = edges.sparkSession
    e = edges.select("src", "dst").repartition(F.col("src")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_edges = e.count()

    # scale-adaptive loop width (pagerank._derived_superstep_partitions):
    # narrow the per-superstep exchanges for small graphs; session value
    # restored at exit, the cached E-row layout above is untouched
    restore_parts: str | None = None
    dp = _derived_superstep_partitions(spark, n_edges)
    if dp:
        restore_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(dp))
    state = seeds.select("id", F.lit(0).alias("depth")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    frontier = state
    depth = 0
    while True:
        depth += 1
        if max_depth is not None and depth > max_depth:
            break
        reached = (
            e.join(frontier.select(F.col("id").alias("src")), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        new_frontier = (
            reached.join(state.select("id"), "id", "left_anti")
            .select("id", F.lit(depth).alias("depth"))
            .localCheckpoint()  # materialize + truncate lineage
        )
        if new_frontier.count() == 0:
            break
        new_state = state.unionAll(new_frontier).localCheckpoint()
        state.unpersist()
        state, frontier = new_state, new_frontier
    if restore_parts is not None:
        spark.conf.set("spark.sql.shuffle.partitions", restore_parts)
    return state
