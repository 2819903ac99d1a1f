"""Deterministic synthetic data (FIXTURES.md).

Everything is a pure function of (seed, row id) — no wall clock, no
partition-count dependence — so the same table is reproduced at any
parallelism. Randomness comes from a vectorized splitmix64-style
integer hash over the row id, NOT a seeded sequential RNG, so
generation distributes over executors via ``spark.range`` without
coordination.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from aduana_spark.extraction import ref_extract

BASE_TS = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

_WORDS = (
    "crawl frontier page rank link graph domain score spider fetch "
    "index web anchor host path query hub authority seed depth"
).split()


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 hash."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _u01(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """Uniform [0,1) per row id for a given stream tag."""
    h = _mix64(ids * np.uint64(0x1000003) + np.uint64(stream * 7919 + seed))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _zipf_cdf(n_domains: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, n_domains + 1) ** s
    return np.cumsum(w / w.sum())


def page_url(page_id: int | np.ndarray, n_domains: int, seed: int = 42) -> np.ndarray:
    """Deterministic URL for a page id: Zipfian domain + enumerated path."""
    ids = np.atleast_1d(np.asarray(page_id, dtype=np.uint64))
    cdf = _zipf_cdf(n_domains)
    dom = np.searchsorted(cdf, _u01(ids, 1, seed))
    return np.array(
        [f"https://d{d}.example.org/p{int(i)}" for d, i in zip(dom, ids)],
        dtype=object,
    )


def _gen_rows(ids: np.ndarray, n_pages: int, n_domains: int, avg_links: int, seed: int):
    urls = page_url(ids, n_domains, seed)
    n_links = (1 + _u01(ids, 2, seed) * (2 * avg_links - 1)).astype(np.int64)
    rows = []
    for j, (i, url) in enumerate(zip(ids, urls)):
        k = int(n_links[j])
        # hub-biased targets: floor(n * u^3) skews in-degree toward low ids
        u = _u01(np.uint64(i) * np.uint64(1000003) + np.arange(k, dtype=np.uint64), 3, seed)
        targets = np.minimum((n_pages * u**3).astype(np.int64), n_pages - 1)
        target_urls = page_url(targets, n_domains, seed)
        words = " ".join(
            _WORDS[int(w)]
            for w in (_u01(np.uint64(i) + np.arange(12, dtype=np.uint64), 4, seed) * len(_WORDS))
        )
        body = f"<p>{words}</p>" + "".join(
            f'<a href="{t}">anchor {m}</a>' for m, t in enumerate(target_urls)
        )
        html = (
            f"<html><head><title>t{int(i)}</title>"
            f"<script>var x={int(i)};</script><style>.s{{color:red}}</style>"
            f"</head><body>{body}</body></html>"
        ).encode("utf-8")
        text, _ = ref_extract(html)
        lang = "en" if _u01(np.atleast_1d(np.uint64(i)), 5, seed)[0] < 0.9 else (
            "de" if _u01(np.atleast_1d(np.uint64(i)), 6, seed)[0] < 0.5 else "fr"
        )
        rows.append(
            (
                str(url),
                BASE_TS + dt.timedelta(seconds=int(i)),
                html,
                text,
                lang,
            )
        )
    return rows


PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def synth_pages(
    spark: SparkSession,
    n_pages: int = 1000,
    n_domains: int = 50,
    avg_links: int = 10,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic pages table (FIXTURES.md §1).

    Uses ``spark.range`` + ``mapInPandas``; every row derives from its
    id alone, so output is identical at any partition count.
    """
    parts = partitions or max(1, min(32, n_pages // 250))

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.uint64)
            rows = _gen_rows(ids, n_pages, n_domains, avg_links, seed)
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return spark.range(0, n_pages, numPartitions=parts).mapInPandas(
        gen, schema=PAGES_SCHEMA
    )


# ---------------------------------------------------------------- golden graph

#: 5-node golden graph from /root/reference/lib/test/test_page_rank.c:69-101
#: and test_hits.c:10-62 (1-indexed vertices; node 5 dangling).
GOLDEN_EDGES = [
    (1, 2),
    (1, 5),
    (2, 3),
    (2, 5),
    (3, 4),
    (3, 5),
    (4, 1),
    (4, 5),
]

#: content scores used by the personalized-PageRank fixtures:
#: score(i) = (i-1)/5 (test_page_rank.c:152-158).
GOLDEN_SCORES = {i: (i - 1) / 5.0 for i in range(1, 6)}

GOLDEN_PAGERANK_D085 = {
    1: 0.15936255,
    2: 0.15936255,
    3: 0.15936255,
    4: 0.15936255,
    5: 0.3625498,
}
GOLDEN_PAGERANK_D05_SCORES = {
    1: 0.06386554621848739,
    2: 0.08739495798319329,
    3: 0.1647058823529412,
    4: 0.25546218487394956,
    5: 0.4285714285714286,
}
GOLDEN_HITS_HUB = {1: 0.25, 2: 0.25, 3: 0.25, 4: 0.25, 5: 0.0}
GOLDEN_HITS_AUTH = {1: 0.125, 2: 0.125, 3: 0.125, 4: 0.125, 5: 0.5}


def golden_edges(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(GOLDEN_EDGES, schema="src LONG, dst LONG")


def golden_scores(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(GOLDEN_SCORES.items()), schema="id LONG, score DOUBLE"
    )


def golden_pages(spark: SparkSession) -> DataFrame:
    """The golden graph as a pages table (all one domain, so run
    algorithms with the cross-domain filter OFF, like the C tests do —
    test_page_rank.c:109)."""
    url = {i: f"https://golden.example.org/p{i}" for i in range(1, 6)}
    out = {i: [] for i in range(1, 6)}
    for s, d in GOLDEN_EDGES:
        out[s].append(d)
    rows = []
    for i in range(1, 6):
        body = "".join(f'<a href="{url[t]}">l{t}</a>' for t in out[i])
        html = f"<html><body><p>page {i}</p>{body}</body></html>".encode()
        text, _ = ref_extract(html)
        rows.append((url[i], BASE_TS + dt.timedelta(seconds=i), html, text, "en"))
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)


# ------------------------------------------------------------- random digraph


def random_digraph(n: int = 500, p: float = 0.02, seed: int = 42):
    """Seeded random digraph + planted hub + isolated components, as
    plain edge list (FIXTURES.md §3). Pure numpy; used with networkx
    oracles in tests."""
    rng = np.random.RandomState(seed)
    mat = rng.rand(n, n) < p
    np.fill_diagonal(mat, False)
    src, dst = np.nonzero(mat)
    # planted hub: node 0 receives extra edges from ~20% of nodes
    hub_src = rng.choice(np.arange(1, n), size=n // 5, replace=False)
    src = np.concatenate([src, hub_src])
    dst = np.concatenate([dst, np.zeros_like(hub_src)])
    edges = sorted(set(zip(src.tolist(), dst.tolist())))
    # a small disconnected component + a dangling chain
    extra = [(n, n + 1), (n + 1, n), (n + 2, n + 3)]
    return edges + extra, n + 4
