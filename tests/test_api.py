"""High-level API parity: PageDB / scorers / BFScheduler facade
(SURVEY.md §2.11, reference aduana/__init__.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aduana_spark.api import BFScheduler, CrawledPage, HitsScorer, PageDB, PageRankScorer
from aduana_spark.datagen import GOLDEN_EDGES, GOLDEN_PAGERANK_D085


@pytest.fixture(scope="module")
def golden_db(spark):
    db = PageDB(spark)
    out = {i: [] for i in range(1, 6)}
    for s, d in GOLDEN_EDGES:
        out[s].append(d)
    for i in range(1, 6):
        db.add(CrawledPage(url=f"p{i}", links=[(f"p{t}", 0.1) for t in out[i]]))
    return db


def test_pagedb_ingest_and_scans(golden_db):
    info = {r["url"]: r for r in golden_db.page_info.collect()}
    assert info["p1"]["n_crawls"] == 1
    assert info["p5"]["n_crawls"] == 1  # crawled last with no links
    edges = {(r["src"], r["dst"]) for r in golden_db.id_edges().collect()}
    assert len(edges) == len(GOLDEN_EDGES)
    nb = golden_db.neighborhood("p5").collect()
    assert {(r["direction"], r["url"]) for r in nb} == {
        ("in", "p1"), ("in", "p2"), ("in", "p3"), ("in", "p4")
    }
    assert golden_db.find("p[12]$").count() == 2


def test_backlink_path(spark):
    db = PageDB(spark)
    db.add(CrawledPage(url="seed", links=[("a", 0.5)]))
    db.add(CrawledPage(url="a", links=[("b", 0.5)]))
    db.add(CrawledPage(url="b", links=[("c", 0.5)]))
    assert db.backlink_path("c") == ["c", "b", "a", "seed"]


def test_pagerank_scorer_matches_golden(golden_db):
    scorer = PageRankScorer(golden_db, damping=0.85, precision=1e-6)
    scorer.update()
    got = {r["url"]: r["score"] for r in scorer.scores().collect()}
    for i, want in GOLDEN_PAGERANK_D085.items():
        assert got[f"p{i}"] == pytest.approx(want, abs=1e-6)


def test_hits_scorer_authority(golden_db):
    scorer = HitsScorer(golden_db, precision=1e-8)
    scorer.update()
    got = {r["url"]: r["score"] for r in scorer.scores().collect()}
    assert got["p5"] == pytest.approx(0.5, abs=1e-6)
    for i in range(1, 5):
        assert got[f"p{i}"] == pytest.approx(0.125, abs=1e-6)


def test_bf_scheduler_rekey_with_scorer(spark):
    """After scorer.update(), the frontier serves by converged
    authority/pagerank instead of link scores (U2)."""
    sch = BFScheduler(spark)
    db = PageDB(spark)
    # crawl 1 and 2; 3,4,5 stay frontier
    batches = [
        ("p1", [("p3", 0.9), ("p4", 0.1)]),
        ("p2", [("p4", 0.2), ("p5", 0.8), ("p3", 0.5)]),
    ]
    import datetime as dt

    for i, (url, links) in enumerate(batches):
        batch = spark.createDataFrame(
            [(i, url, [(u, float(s)) for u, s in links], 0.0, b"h",
              dt.datetime(2026, 1, 1, 0, 0, i))],
            schema=PageDB.BATCH_SCHEMA,
        )
        sch.add(batch)
        db.add(CrawledPage(url=url, links=links))
    # link-score order: p3 (0.9) > p5 (0.8) > p4 (0.1)
    assert sch.requests(3) == ["p3", "p5", "p4"]

    sch2 = BFScheduler(spark, scorer=PageRankScorer(db, precision=1e-8))
    sch2.page_info, sch2.schedule = sch.page_info, sch.schedule
    sch2.update_scores()
    got = sch2.requests(3)
    # pagerank order: p3 and p4 have 2 in-links, p5 has 1 → p5 last;
    # p3/p4 tie broken by hash
    assert set(got) == {"p3", "p4", "p5"} and got[2] == "p5"
