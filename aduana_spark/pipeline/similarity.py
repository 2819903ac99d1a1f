"""Similarity search over embedding columns (array<float/double>).

- ``brute_force_topk``: exact cosine top-k of every row against a
  query vector — the correctness baseline. Dot product and norms are
  native higher-order functions (``aggregate``/``zip_with``), fully
  JVM-side; ranking is TakeOrderedAndProject (no global sort).
- ``lsh_topk``: random-hyperplane LSH — query probes only its own
  bucket (+ optional multi-probe by Hamming-1 neighbors), exact
  rerank inside. The scale path: bucket cardinality ~ n / 2^planes.
- ``all_pairs_topk`` (via ``embedding_near_duplicates`` in dedup):
  bucketed self-join.

An IVF variant (k-means coarse quantizer) follows the same plumbing —
assign to nearest centroid (a small broadcast table), shuffle on
centroid id, rerank within cell.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _cosine_expr(a: str | Column, b: str | Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k vs a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    cos = _dot(vec_col, q) / (_norm(vec_col) * _norm(q))
    return (
        df.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplane_signature(
    df: DataFrame, vec_col: str, n_planes: int, seed: int
) -> Column:
    """LSH bucket id: sign pattern of n_planes random projections,
    packed into a LONG. Plane coefficients are literals folded into
    the plan (broadcast-free)."""
    first = df.select(F.size(vec_col).alias("d")).first()
    dim = first["d"] if first else 0
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(c)) for c in planes[p]]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    multiprobe: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: probe the query's hyperplane bucket
    (plus Hamming-1 neighbor buckets when ``multiprobe``), exact
    rerank inside."""
    rng = np.random.RandomState(seed)
    q = np.asarray(query, dtype=float)
    planes = rng.randn(n_planes, len(q))
    qsig = 0
    for p in range(n_planes):
        if planes[p] @ q > 0:
            qsig |= 1 << p
    probes = [qsig]
    if multiprobe:
        probes += [qsig ^ (1 << p) for p in range(n_planes)]

    sig = _hyperplane_signature(df, vec_col, n_planes, seed)
    bucketed = df.withColumn("_bucket", sig).where(F.col("_bucket").isin(probes))
    return brute_force_topk(bucketed, query, k, id_col, vec_col)


# ------------------------------------------------------------------- IVF


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 5,
    seed: int = 42,
    sample_limit: int = 4096,
) -> np.ndarray:
    """Coarse quantizer for IVF: Lloyd's k-means. Centroids are tiny
    (k × dim) so each assignment pass broadcasts them as plan
    literals; updates aggregate per-cell sums/counts distributedly —
    one groupBy per iteration, no driver-side data beyond k rows."""
    import pyspark.sql.functions as F  # noqa: F811

    first = np.array(
        [r[0] for r in df.select(vec_col).limit(sample_limit).collect()],
        dtype=float,
    )
    rng = np.random.RandomState(seed)
    cents = first[rng.choice(len(first), size=min(k, len(first)), replace=False)]
    for _ in range(iters):
        assigned = df.select(
            _nearest_centroid_col(vec_col, cents).alias("cell"), F.col(vec_col).alias("v")
        )
        agg = (
            assigned.select(
                "cell", F.posexplode("v").alias("pos", "x")
            )
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = cents.copy()
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for r in agg:
            sums.setdefault(r["cell"], np.zeros(cents.shape[1]))[r["pos"]] = r["s"]
            counts[r["cell"]] = r["n"]
        for c, s in sums.items():
            if counts.get(c):
                new[c] = s / counts[c]
        cents = new
    return cents


def _nearest_centroid_col(vec_col: str, centroids: np.ndarray) -> Column:
    """argmin_c ||v - c||² as a pure Column expression: since ||v|| is
    shared, argmin of (||c||² - 2·v·c); centroids fold into the plan
    as literals (k ≤ ~64)."""
    best = None
    for ci, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.lit(float((c * c).sum())) - 2.0 * _dot(vec_col, carr)
        s = F.struct(d.alias("d"), F.lit(ci).alias("c"))
        best = s if best is None else F.least(best, s)
    return best["c"]


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: assign vectors to their nearest k-means
    cell (partition-pruned at scale by writing the table partitioned
    by cell), probe the ``n_probe`` cells nearest the query, exact
    cosine rerank inside. Pass precomputed ``centroids`` to amortize
    the quantizer across queries."""
    if centroids is None:
        centroids = kmeans_centroids(df, vec_col, k=n_cells, seed=seed)
    q = np.asarray(query, dtype=float)
    d2 = ((centroids - q) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2)[:n_probe]]
    cells = df.withColumn("_cell", _nearest_centroid_col(vec_col, centroids))
    return brute_force_topk(
        cells.where(F.col("_cell").isin(probes)), query, k, id_col, vec_col
    )
