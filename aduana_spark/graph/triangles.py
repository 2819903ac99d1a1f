"""Triangle counting (north-rule extension; oracle: networkx
``triangles`` on the undirected projection).

Canonical-orientation join plan — the standard shuffle-efficient
formulation:

1. undirected simple edges, oriented ``a < b`` (kills duplicate
   orientations and self-loops),
2. wedges = oriented ⋈ oriented on the middle vertex
   (a<b, b<c → wedge a-b-c),
3. triangles = wedges semi-joined against the oriented edge set on
   (a, c).

At web scale the classic refinement is to orient by *degree* rather
than id (each edge charged to its lower-degree endpoint, bounding
wedge fan-out by the graph's degeneracy); ``orient_by_degree=True``
enables that — same output, different shuffle profile; id orientation
is the default for plan simplicity on crawl graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _oriented(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def _oriented_by_degree(edges: DataFrame) -> DataFrame:
    und = _oriented(edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        und.join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "db"), "b")
    )
    # orient toward the lower-(degree, id) endpoint
    flip = (F.col("db") < F.col("da")) | (
        (F.col("db") == F.col("da")) & (F.col("b") < F.col("a"))
    )
    return e.select(
        F.when(flip, F.col("b")).otherwise(F.col("a")).alias("a"),
        F.when(flip, F.col("a")).otherwise(F.col("b")).alias("b"),
    )


def triangle_list(
    edges: DataFrame, orient_by_degree: bool = False, _caches: list | None = None
) -> DataFrame:
    """DataFrame (a, b, c) — each undirected triangle exactly once.

    id orientation: chain join a<b<c, closing edge (a, c).
    degree orientation: wedges fan out from each edge's low-degree
    *source* (out-degree bounded by degeneracy — the DAG orientation
    gives every triangle exactly one vertex with two out-edges), and
    the closing pair is checked against the id-canonical edge set.

    The oriented edge table is persisted (it feeds both sides of the
    wedge join and the closing-edge check); pass ``_caches`` to
    collect the persisted handles for unpersisting after the result
    is materialized (``triangle_count`` does this automatically).
    """
    if not orient_by_degree:
        o = _oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
        if _caches is not None:
            _caches.append(o)
        e1 = o.select(F.col("a"), F.col("b"))
        e2 = o.select(F.col("a").alias("b"), F.col("b").alias("c"))
        wedges = e1.join(e2, "b")
        closing = o.select(F.col("a"), F.col("b").alias("c"))
        return wedges.join(closing, ["a", "c"]).select("a", "b", "c")

    und = _oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    o = _oriented_by_degree(edges).persist(StorageLevel.MEMORY_AND_DISK)
    if _caches is not None:
        _caches += [und, o]
    e1 = o.select(F.col("a").alias("u"), F.col("b").alias("v"))
    e2 = o.select(F.col("a").alias("u"), F.col("b").alias("w"))
    wedges = e1.join(e2, "u").where(F.col("v") < F.col("w"))
    closing = und.select(F.col("a").alias("v"), F.col("b").alias("w"))
    return wedges.join(closing, ["v", "w"]).select(
        F.col("u").alias("a"), F.col("v").alias("b"), F.col("w").alias("c")
    )


def triangle_count(
    edges: DataFrame,
    per_vertex: bool = False,
    orient_by_degree: bool = False,
    eager: bool = True,
) -> DataFrame:
    """Global count (column ``n_triangles``) or per-vertex counts
    (id, n_triangles) matching ``networkx.triangles`` (each triangle
    counted once per member vertex). ``eager`` materializes the
    (small, aggregated) result and frees the oriented-edge caches."""
    caches: list = []
    tris = triangle_list(edges, orient_by_degree, _caches=caches)
    if not per_vertex:
        out = tris.agg(F.count("*").alias("n_triangles"))
    else:
        member = (
            tris.select(F.col("a").alias("id"))
            .unionAll(tris.select(F.col("b").alias("id")))
            .unionAll(tris.select(F.col("c").alias("id")))
        )
        out = member.groupBy("id").agg(F.count("*").alias("n_triangles"))
    if eager:
        out = out.localCheckpoint(eager=True)
        for c in caches:
            c.unpersist()
    return out
