"""Edge/vertex construction: dedup, last-crawl-wins, cross-domain
split (reference: test_pagedb.c:40-190, 410-513), dense ids."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aduana_spark.graph.builder import (
    assign_dense_ids,
    build_edges,
    build_vertices,
    cross_domain_edges,
    edges_with_ids,
    out_degrees,
)

TS = dt.datetime(2026, 1, 1)


def test_build_edges_dedup_and_domains(spark):
    raw = spark.createDataFrame(
        [
            ("https://a.org/1", "https://a.org/2"),
            ("https://a.org/1", "https://a.org/2"),  # duplicate
            ("https://a.org/1", "https://b.org/1"),
            ("https://b.org/1", "https://a.org/1"),
        ],
        "src_url STRING, dst_url STRING",
    )
    e = build_edges(raw)
    assert e.count() == 3
    row = e.where(F.col("dst_url") == "https://b.org/1").first()
    assert row["src_domain"] == "a.org" and row["dst_domain"] == "b.org"


def test_last_crawl_wins(spark):
    """page_db.c:987: each new crawl overwrites a page's adjacency."""
    raw = spark.createDataFrame(
        [
            ("https://a.org/1", "https://a.org/old", TS),
            ("https://a.org/1", "https://a.org/new", TS + dt.timedelta(1)),
            ("https://a.org/1", "https://a.org/new2", TS + dt.timedelta(1)),
            ("https://b.org/1", "https://a.org/1", TS),
        ],
        "src_url STRING, dst_url STRING, crawl_ts TIMESTAMP",
    )
    e = build_edges(raw, ts_col="crawl_ts")
    dsts = {r["dst_url"] for r in e.where(F.col("src_url") == "https://a.org/1").collect()}
    assert dsts == {"https://a.org/new", "https://a.org/new2"}
    assert e.where(F.col("src_url") == "https://b.org/1").count() == 1


def test_cross_domain_split_matches_reference_semantics(spark):
    """S3 + production default (page_db.h:392): scorers see only the
    cross-domain subgraph; same-domain links drop. Fallback: when
    neither URL parses, full-string equality (util.c:257-280)."""
    raw = spark.createDataFrame(
        [
            ("https://a.org/1", "https://a.org/2"),   # same domain
            ("https://a.org/1", "https://b.org/1"),   # cross
            ("nota url", "nota url"),                  # both unparsed, equal → same
            ("nota url", "other"),                     # both unparsed, differ → cross
            ("https://a.org/1", "junk"),               # one parsed → cross
        ],
        "src_url STRING, dst_url STRING",
    )
    e = build_edges(raw, only_cross_domain=True)
    pairs = {(r["src_url"], r["dst_url"]) for r in e.collect()}
    assert pairs == {
        ("https://a.org/1", "https://b.org/1"),
        ("nota url", "other"),
        ("https://a.org/1", "junk"),
    }


def test_vertices_and_id_edges_roundtrip(spark):
    raw = spark.createDataFrame(
        [("https://a.org/1", "https://b.org/1"), ("https://b.org/1", "https://c.org/1")],
        "src_url STRING, dst_url STRING",
    )
    e = build_edges(raw)
    v = build_vertices(e)
    assert v.count() == 3
    assert v.where(F.col("id").isNull()).count() == 0
    ide = edges_with_ids(e, v)
    assert ide.count() == 2
    degs = {r["id"]: r["deg"] for r in out_degrees(ide).collect()}
    assert sorted(degs.values()) == [1, 1]


def test_assign_dense_ids(spark):
    df = spark.createDataFrame([(f"u{i}",) for i in range(100)], "url STRING")
    ids = assign_dense_ids(df, "url")
    rows = ids.collect()
    assert sorted(r["id"] for r in rows) == list(range(100))
    assert len({r["url"] for r in rows}) == 100


def test_bucketed_edge_table_roundtrip(spark, tmp_path):
    """storage: bucketed+sorted managed table round-trips and the
    bucketed scan feeds a src-keyed join without re-shuffling the
    edge side."""
    from aduana_spark.graph.builder import build_edges
    from aduana_spark.storage import read_edge_table, write_edge_table

    raw = spark.createDataFrame(
        [(f"https://d{i%5}.org/p{i}", f"https://d{(i+1)%5}.org/p{i+1}") for i in range(50)],
        "src_url STRING, dst_url STRING",
    )
    e = build_edges(raw)
    write_edge_table(e, name="test_edges_bucketed", buckets=4)
    back = read_edge_table(spark, "test_edges_bucketed")
    assert back.count() == e.count()
    from pyspark.sql import functions as F

    keys = back.select(F.col("src_url")).distinct().limit(10)
    joined = back.join(keys, "src_url")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    spark.sql("DROP TABLE IF EXISTS test_edges_bucketed")
