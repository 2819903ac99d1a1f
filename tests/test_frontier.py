"""Scheduler fixtures from /root/reference/lib/test/test_bf_scheduler.c
and page-info merge semantics from test_pagedb.c:40-147."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aduana_spark.frontier.bf_scheduler import BFSchedulerView, frontier_topk
from aduana_spark.frontier.freq_scheduler import (
    FreqRule,
    build_freq_table,
    next_due_view,
)
from aduana_spark.frontier.page_info import empty_page_info, ingest_crawl_batch

TS = dt.datetime(2026, 1, 1)

BATCH_SCHEMA = (
    "crawl_order INT, url STRING, "
    "links ARRAY<STRUCT<url: STRING, score: DOUBLE>>, "
    "page_score DOUBLE, content_hash BINARY, ts TIMESTAMP"
)


def _batch(spark, order, url, links, score=0.0, chash=b"h", ts=TS):
    return spark.createDataFrame(
        [(order, url, links, score, chash, ts)], schema=BATCH_SCHEMA
    )


#: the hand-drawn crawl of test_bf_scheduler.c:23-56
CRAWL = [
    ("1", [("2", 0.0), ("3", 0.1)]),
    ("2", [("4", 1.0)]),
    ("4", [("3", 0.2), ("5", 0.1)]),
    ("5", [("6", 0.0), ("7", 0.5), ("8", 0.5)]),
    ("8", [("7", 0.2), ("9", 0.4)]),
    ("7", []),
]


def test_bf_scheduler_pop_order(spark):
    """test_bf_scheduler.c:96-111: request(2) → [9, 3]; request(4) → [6]."""
    sch = BFSchedulerView(spark)
    for i, (url, links) in enumerate(CRAWL):
        sch.add(_batch(spark, i, url, links, ts=TS + dt.timedelta(seconds=i)))
    assert sch.requests(2) == ["9", "3"]
    assert sch.requests(4) == ["6"]


def test_bf_scheduler_restart_stability(spark):
    """test_bf_scheduler.c:248-314: 100 links score i/100; request(25)
    → 99..75, then (fresh view over the same persisted state) → 74..50."""
    sch = BFSchedulerView(spark)
    links = [(f"http://www.foobar.com/page_{i}", i / 100.0) for i in range(100)]
    sch.add(_batch(spark, 0, "http://www.foobar.com", links))
    got1 = sch.requests(25)
    assert got1 == [f"http://www.foobar.com/page_{i}" for i in range(99, 74, -1)]
    # "restart": rebuild the view object from the persisted tables
    sch2 = BFSchedulerView(spark)
    sch2.page_info, sch2.schedule, sch2.served = sch.page_info, sch.schedule, sch.served
    got2 = sch2.requests(25)
    assert got2 == [f"http://www.foobar.com/page_{i}" for i in range(74, 49, -1)]


def test_page_info_merge_semantics(spark):
    """test_pagedb.c:40-147: yahoo crawled once, bing twice with a
    changed hash, google only linked."""
    pi = empty_page_info(spark)
    b1 = _batch(
        spark,
        0,
        "www.yahoo.com",
        [("www.google.com", 1.1)],
        score=0.5,
        chash=b"\x10\x00",
    )
    pi, _ = ingest_crawl_batch(pi, b1)
    b2 = _batch(spark, 1, "www.bing.com", [], score=0.2, chash=b"\x20\x00")
    pi, _ = ingest_crawl_batch(pi, b2)
    b3 = _batch(
        spark, 2, "www.bing.com", [], score=0.2, chash=b"\x30\x00",
        ts=TS + dt.timedelta(seconds=10),
    )
    pi, _ = ingest_crawl_batch(pi, b3)

    rows = {r["url"]: r for r in pi.collect()}
    assert rows["www.yahoo.com"]["n_crawls"] == 1
    assert rows["www.yahoo.com"]["n_changes"] == 0
    assert rows["www.yahoo.com"]["score"] == pytest.approx(0.5)
    assert rows["www.google.com"]["n_crawls"] == 0
    assert rows["www.google.com"]["score"] == pytest.approx(1.1)
    assert rows["www.google.com"]["linked_from"] == "www.yahoo.com"
    assert rows["www.google.com"]["depth"] == 1
    assert rows["www.bing.com"]["n_crawls"] == 2
    assert rows["www.bing.com"]["n_changes"] == 1


def test_frontier_depth_gate(spark):
    """F1: max_crawl_depth excludes deep pages from the frontier."""
    sch = BFSchedulerView(spark, max_depth=1)
    sch.add(_batch(spark, 0, "a", [("b", 0.9)]))
    sch.add(_batch(spark, 1, "b", [("c", 1.0)]))  # c at depth 2
    assert sch.requests(10) == ["b"] or sch.requests(10) == []
    # b was served; c (depth 2) must never appear
    assert "c" not in sch.requests(10)


def test_frontier_rate_limit_gate(spark):
    """F2: per-domain temperature above the crawl limit excludes the
    domain's pages."""
    pi = empty_page_info(spark)
    batch = _batch(
        spark,
        0,
        "https://seed.org/",
        [("https://hot.org/a", 0.9), ("https://cold.org/b", 0.5)],
    )
    pi, sched = ingest_crawl_batch(pi, batch)
    rate = spark.createDataFrame(
        [("hot.org", 5.0), ("cold.org", 0.0)], "domain STRING, temp DOUBLE"
    )
    got = [
        r["url"]
        for r in frontier_topk(
            sched, pi, 10, domain_rate=rate, crawl_limit=1.0
        ).collect()
    ]
    assert got == ["https://cold.org/b"]


def test_freq_scheduler_next_due(spark):
    """T3/F7: earliest-deadline-first with margin gate and 1/freq
    deadlines."""
    rows = [
        # url, first, last, n_changes, n_crawls
        ("https://a.com/x", TS, TS + dt.timedelta(seconds=100), 4, 5),
        ("https://b.com/y", TS, TS + dt.timedelta(seconds=100), 0, 2),
        ("_seed_0", TS, TS, 0, 1),
        ("https://never.com", None, None, 0, 0),
    ]
    pi = spark.createDataFrame(
        [
            (u, None, 0, f, l, nc, ncr, 0.0, None)
            for (u, f, l, nc, ncr) in rows
        ],
        schema="url STRING, linked_from STRING, depth BIGINT, first_crawl TIMESTAMP,"
        " last_crawl TIMESTAMP, n_changes BIGINT, n_crawls BIGINT, score DOUBLE,"
        " content_hash BINARY",
    )
    ft = build_freq_table(pi, freq_default=0.01)
    freqs = {r["url"]: r["freq"] for r in ft.collect()}
    # a.com: rate (4+1)/100 = 0.05; b.com: 0 changes → est 0.01 default
    assert set(freqs) == {"https://a.com/x", "https://b.com/y"}
    assert freqs["https://a.com/x"] == pytest.approx(0.05)
    assert freqs["https://b.com/y"] == pytest.approx(0.01)

    now = (TS + dt.timedelta(seconds=100)).timestamp() + 50
    due = next_due_view(ft, 10, now=now, margin=0.1)
    urls = [r["url"] for r in due.collect()]
    # a.com due after 1/0.05 = 20s (margin gate 18.2s) → served;
    # b.com due after 100s (gate 90.9s) → not yet at +50s
    assert urls == ["https://a.com/x"]


def test_freq_spec_first_match_wins(spark):
    rules = [
        FreqRule(r"https://.*", rate_multiplier=2.0),
        FreqRule(r"http://www\..*", fixed_interval=200.0),
        FreqRule(r".*", fixed_interval=500.0),
    ]
    pi = spark.createDataFrame(
        [
            ("https://a.com", None, 0, TS, TS + dt.timedelta(seconds=100), 9, 10, 0.0, None),
            ("http://www.b", None, 0, TS, TS + dt.timedelta(seconds=100), 0, 1, 0.0, None),
            ("http://c.com", None, 0, TS, TS + dt.timedelta(seconds=100), 0, 1, 0.0, None),
        ],
        schema="url STRING, linked_from STRING, depth BIGINT, first_crawl TIMESTAMP,"
        " last_crawl TIMESTAMP, n_changes BIGINT, n_crawls BIGINT, score DOUBLE,"
        " content_hash BINARY",
    )
    ft = build_freq_table(pi, rules=rules)
    freqs = {r["url"]: r["freq"] for r in ft.collect()}
    assert freqs["https://a.com"] == pytest.approx(2.0 * 0.1)  # 2 × (9+1)/100
    assert freqs["http://www.b"] == pytest.approx(1 / 200.0)
    assert freqs["http://c.com"] == pytest.approx(1 / 500.0)


def test_parse_freq_spec():
    from aduana_spark.frontier.freq_scheduler import parse_freq_spec

    rules = parse_freq_spec(
        ["https://.* x0.001", r"http://www\..* 200.0", ".* 500.0", "malformed"]
    )
    assert len(rules) == 3
    assert rules[0].rate_multiplier == pytest.approx(0.001)
    assert rules[1].fixed_interval == pytest.approx(200.0)
    assert rules[2].fixed_interval == pytest.approx(500.0)


def test_frontera_backend_flow(spark):
    from aduana_spark.api import Backend

    b = Backend(spark)
    b.add_seeds(["https://a.org/", "https://b.org/"], scores=[0.9, 0.5])
    got = b.get_next_requests(10)
    assert got == ["https://a.org/", "https://b.org/"]
    b.page_crawled("https://a.org/", [("https://a.org/deep", 0.7)], score=0.4)
    assert b.get_next_requests(10) == ["https://a.org/deep"]
    # seeds excluded from page-state views (F4)
    from aduana_spark.frontier.page_info import is_seed_col

    seeds = b.page_db.page_info.where(is_seed_col("url")).count()
    assert seeds == 1


def test_freq_serving_ratios(spark):
    """Statistical property (reference test_freq_scheduler.py:6-55):
    long-run serve counts per page are proportional to the page's
    revisit frequency."""
    from aduana_spark.frontier.freq_scheduler import simulate_serving

    pi = spark.createDataFrame(
        [
            ("https://a.com", None, 0, TS, TS, 0, 1, 0.0, None),
            ("http://www.b", None, 0, TS, TS, 0, 1, 0.0, None),
            ("http://c.com", None, 0, TS, TS, 0, 1, 0.0, None),
        ],
        schema="url STRING, linked_from STRING, depth BIGINT, first_crawl TIMESTAMP,"
        " last_crawl TIMESTAMP, n_changes BIGINT, n_crawls BIGINT, score DOUBLE,"
        " content_hash BINARY",
    )
    rules = [
        FreqRule(r"https://.*", fixed_interval=10.0),   # 0.1 Hz
        FreqRule(r"http://www\..*", fixed_interval=200.0),
        FreqRule(r".*", fixed_interval=500.0),
    ]
    ft = build_freq_table(pi, rules=rules)
    t0 = TS.timestamp()
    served = simulate_serving(ft, t0, t0 + 10_000)
    # expected ≈ horizon * freq
    assert served["https://a.com"] == pytest.approx(1000, rel=0.01)
    assert served["http://www.b"] == pytest.approx(50, rel=0.05)
    assert served["http://c.com"] == pytest.approx(20, rel=0.05)
