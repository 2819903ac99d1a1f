"""Edge-table / vertex-table construction (SURVEY.md §1, §2.1 S1-S6).

The reference stores the link graph as LMDB adjacency lists keyed by a
domain-prefixed 64-bit hash (page_db.c:502-514) so one domain's pages
are contiguous. Here the edge table is a plain ``(src, dst)`` LONG
DataFrame; locality is reproduced by *partitioning by src* (and, when
persisted as a table, bucketing by ``domain(src_url)``) instead of by
key layout.

Last-crawl-wins adjacency (page_db.c:987: each new crawl overwrites a
page's out-links) is expressed as "keep the links of the latest
crawl per src" before dedup; the north rule then mandates a fully
deduplicated ``(src_url, dst_url)`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aduana_spark.functions.urls import domain_col, url_hash_col


def build_edges(
    raw_edges: DataFrame,
    ts_col: str | None = None,
    only_cross_domain: bool = False,
) -> DataFrame:
    """URL-level edge table: dedup'd (src_url, dst_url [, src_domain,
    dst_domain]).

    ``ts_col``: when the raw edges carry a crawl timestamp, apply the
    reference's last-crawl-wins semantics (keep only links from the
    latest crawl of each src) before dedup.
    ``only_cross_domain``: the production scorers in the reference see
    only cross-domain edges (page_db.h:392, page_rank_scorer.c:53-58);
    tests run with the filter off.
    """
    e = raw_edges
    if ts_col is not None:
        latest = Window.partitionBy("src_url")
        e = (
            e.withColumn("_max_ts", F.max(ts_col).over(latest))
            .where(F.col(ts_col) == F.col("_max_ts"))
            .drop("_max_ts")
        )
    e = e.select(
        "src_url",
        "dst_url",
        domain_col("src_url").alias("src_domain"),
        domain_col("dst_url").alias("dst_domain"),
    ).dropDuplicates(["src_url", "dst_url"])
    if only_cross_domain:
        e = cross_domain_edges(e)
    return e


def cross_domain_edges(edges_urls: DataFrame) -> DataFrame:
    """S3: keep edges whose endpoints live in different domains.

    Null-safe inequality: when both domains fail to parse the
    reference falls back to full-URL comparison (util.c:257-280).
    """
    d_src = F.col("src_domain") if "src_domain" in edges_urls.columns else domain_col("src_url")
    d_dst = F.col("dst_domain") if "dst_domain" in edges_urls.columns else domain_col("dst_url")
    same = F.when(
        d_src.isNull() & d_dst.isNull(), F.col("src_url") == F.col("dst_url")
    ).otherwise(d_src.eqNullSafe(d_dst))
    return edges_urls.where(~same)


def build_vertices(edges_urls: DataFrame, dense_ids: bool = False) -> DataFrame:
    """Vertex table (id LONG, url STRING, domain STRING) from the edge
    endpoints. ids = xxhash64(url) by default (join-key friendly, no
    global coordination); ``dense_ids=True`` runs the one-time dense
    assignment (collision-free; needed at 10^12-vertex scale)."""
    urls = (
        edges_urls.select(F.col("src_url").alias("url"))
        .unionAll(edges_urls.select(F.col("dst_url").alias("url")))
        .distinct()
    )
    if dense_ids:
        return assign_dense_ids(urls, "url").select(
            "id", "url", domain_col("url").alias("domain")
        )
    return urls.select(
        url_hash_col("url").alias("id"), "url", domain_col("url").alias("domain")
    )


def assign_dense_ids(df: DataFrame, key_col: str) -> DataFrame:
    """Collision-free dense LONG ids (0..N-1) for distinct keys.

    Two-phase, shuffle-light alternative to a global sort: count rows
    per partition, prefix-sum the counts on the driver (tiny), then
    add the partition offset to the within-partition position. This is
    the ``zipWithIndex`` pattern expressed once, as a utility — the
    id ↔ key mapping must then be persisted (it is NOT recomputable
    because partition layout is not stable across jobs).
    """
    distinct = df.select(key_col).distinct()
    rdd = distinct.rdd.zipWithIndex()
    spark = df.sparkSession
    return spark.createDataFrame(
        rdd.map(lambda kv: (kv[1], kv[0][0])), schema=f"id LONG, {key_col} STRING"
    )


def edges_with_ids(edges_urls: DataFrame, vertices: DataFrame) -> DataFrame:
    """Resolve URL edges to id edges: (src LONG, dst LONG)."""
    v = vertices.select("id", "url")
    return (
        edges_urls.join(v.withColumnRenamed("url", "src_url"), "src_url")
        .withColumnRenamed("id", "src")
        .join(v.withColumnRenamed("url", "dst_url"), "dst_url")
        .withColumnRenamed("id", "dst")
        .select("src", "dst")
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    """A1 (page_rank.c:208-232): out-degree per src. On the dedup'd
    edge table multiplicity is 1 per distinct link, matching the north
    rule; the reference counts duplicate links (§2.7 of SURVEY.md) —
    fixtures contain no duplicates so both agree."""
    return edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
