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


def test_simulate_serving_collect_bounded(spark):
    """simulate_serving's one collect is guarded like
    FreqSchedulerView._load_table: a freq table larger than max_rows
    fails fast (limit max_rows+1, never a full materialization) with a
    pointer to the distributed EDF path; within the bound the
    simulation is unchanged."""
    from aduana_spark.frontier.freq_scheduler import simulate_serving

    pi = spark.createDataFrame(
        [
            (f"https://s{i}.com", None, 0, TS, TS, 0, 1, 0.0, None)
            for i in range(8)
        ],
        schema="url STRING, linked_from STRING, depth BIGINT, first_crawl TIMESTAMP,"
        " last_crawl TIMESTAMP, n_changes BIGINT, n_crawls BIGINT, score DOUBLE,"
        " content_hash BINARY",
    )
    ft = build_freq_table(pi, rules=[FreqRule(r".*", fixed_interval=10.0)])
    t0 = TS.timestamp()
    with pytest.raises(ValueError, match="max_rows=4"):
        simulate_serving(ft, t0, t0 + 100, max_rows=4)
    served = simulate_serving(ft, t0, t0 + 100, max_rows=8)
    assert served["https://s0.com"] == pytest.approx(10, abs=1)


# ---------------------------------------------------------------- round 2


def test_bf_requests_escalation_politeness(spark):
    """T2+F2 in the live request path (bf_scheduler.c:679-819): a hot
    domain is deferred at the soft limit and admitted once the
    escalation ladder relaxes past its temperature; cold domains are
    served first even when the hot pages outscore them."""
    t0 = TS
    sch = BFSchedulerView(spark)
    sch.set_crawl_rate(1.0, 4.0)  # window = 10/4.0 = 2.5 s
    assert sch.temp_window == pytest.approx(2.5)
    sch.add(
        _batch(
            spark,
            0,
            "https://seed.org/",
            [
                ("https://hot.org/a", 0.9),
                ("https://hot.org/b", 0.8),
                ("https://hot.org/c", 0.7),
                ("https://cold.org/x", 0.5),
                ("https://cold.org/y", 0.4),
            ],
            ts=t0,
        )
    )
    # crawl two hot.org pages shortly before `now` → hot.org heats up
    sch.add(_batch(spark, 1, "https://hot.org/a", [], ts=t0 + dt.timedelta(seconds=1)))
    sch.add(_batch(spark, 2, "https://hot.org/b", [], ts=t0 + dt.timedelta(seconds=1.2)))
    now = (t0 + dt.timedelta(seconds=2)).timestamp()
    # hot.org temp = (1-1/2.5) + (1-0.8/2.5) = 0.6+0.68 = 1.28: above the
    # soft limit 1.0, below the first escalation step 4^(1/4) ≈ 1.414
    got = sch.requests(3, now=now)
    assert got == ["https://cold.org/x", "https://cold.org/y", "https://hot.org/c"]
    # without politeness the hot page would have been served first
    sch2 = BFSchedulerView(spark)
    sch2.page_info, sch2.schedule, sch2.served = (
        sch.page_info,
        sch.schedule,
        spark.createDataFrame([], "url STRING"),
    )
    assert sch2.requests(1) == ["https://hot.org/c"]


def test_bf_scheduler_from_settings(spark):
    from aduana_spark.api import BFScheduler, PageRankScorer

    sch = BFScheduler.from_settings(
        spark,
        {
            "SCORER": PageRankScorer,
            "MAX_CRAWL_DEPTH": 2,
            "SOFT_CRAWL_LIMIT": 0.5,
            "HARD_CRAWL_LIMIT": 8.0,
            "SCORE_UPDATE_INTERVAL": 300,
        },
    )
    assert sch.max_depth == 2
    assert sch.soft_rate == pytest.approx(0.5)
    assert sch.hard_rate == pytest.approx(8.0)
    assert sch.temp_window == pytest.approx(10.0 / 8.0)
    assert sch.update_interval == 300
    assert sch.scorer is not None
    # escalation ladder: 5 geometric steps soft → hard
    limits = sch._escalation_limits()
    assert len(limits) == 5
    assert limits[0] == pytest.approx(0.5)
    assert limits[-1] == pytest.approx(8.0)


def test_freq_spec_anchored_and_null_excluded(spark):
    """ADVICE round 1: rules anchor at the URL start (re.match), and
    rule-unmatched pages stay excluded even when freq_min clipping is
    active (NULL must not be clipped into admission)."""
    pi = spark.createDataFrame(
        [
            ("https://a.com/x", None, 0, TS, TS + dt.timedelta(seconds=100), 0, 2, 0.0, None),
            ("https://evil.com/?u=https://a.com/x", None, 0, TS,
             TS + dt.timedelta(seconds=100), 0, 2, 0.0, None),
        ],
        schema="url STRING, linked_from STRING, depth BIGINT, first_crawl TIMESTAMP,"
        " last_crawl TIMESTAMP, n_changes BIGINT, n_crawls BIGINT, score DOUBLE,"
        " content_hash BINARY",
    )
    rules = [FreqRule(r"https://a\.com.*", fixed_interval=10.0)]
    ft = build_freq_table(pi, rules=rules, freq_min=0.0001, freq_max=10.0)
    urls = [r["url"] for r in ft.collect()]
    assert urls == ["https://a.com/x"]


def test_freq_load_simple_scale_semantics(spark):
    """freq_scheduler_load_simple (freq_scheduler.c:188-219): every
    crawled non-seed page gets freq_default, except pages with a
    positive rate estimate get freq_scale × rate when freq_scale>0."""
    from aduana_spark.frontier.freq_scheduler import FreqSchedulerView

    pi = spark.createDataFrame(
        [
            # rate = (4+1)/100 = 0.05
            ("https://a.com", None, 0, TS, TS + dt.timedelta(seconds=100), 4, 5, 0.0, None),
            # single crawl → empty interval → rate sentinel -1
            ("https://b.com", None, 0, TS, TS, 0, 1, 0.0, None),
            ("_seed_0", None, 0, TS, TS, 0, 1, 0.0, None),
            ("https://never.com", None, None, None, None, 0, 0, 0.0, None),
        ],
        schema="url STRING, linked_from STRING, depth BIGINT, first_crawl TIMESTAMP,"
        " last_crawl TIMESTAMP, n_changes BIGINT, n_crawls BIGINT, score DOUBLE,"
        " content_hash BINARY",
    )
    fs = FreqSchedulerView(spark, page_info=pi)
    fs.load_simple(freq_default=0.01, freq_scale=2.0)
    assert fs._schedule["https://a.com"][1] == pytest.approx(0.1)  # 2 × 0.05
    assert fs._schedule["https://b.com"][1] == pytest.approx(0.01)  # default
    assert "_seed_0" not in fs._schedule
    assert "https://never.com" not in fs._schedule
    # scale disabled (reference default -1): everyone gets the default
    fs2 = FreqSchedulerView(spark, page_info=pi)
    fs2.load_simple(freq_default=0.25)
    assert fs2._schedule["https://a.com"][1] == pytest.approx(0.25)
    # scale boundary: the facade's driver-side dict refuses above
    # max_facade_rows with a pointer to the distributed next_due_view
    # path — it must fail fast, not OOM the driver at 10^12 rows
    fs3 = FreqSchedulerView(spark, page_info=pi)
    fs3.max_facade_rows = 1  # table has 2 loadable pages
    with pytest.raises(ValueError, match="next_due_view"):
        fs3.load_simple(freq_default=0.01)
    assert fs3._schedule == {}


def test_freq_facade_margin_and_max_n_crawls(spark):
    from aduana_spark.frontier.freq_scheduler import FreqSchedulerView

    last = TS + dt.timedelta(seconds=100)
    pi = spark.createDataFrame(
        [
            ("https://a.com", None, 0, TS, last, 4, 5, 0.0, None),
            ("https://b.com", None, 0, TS, last, 4, 9, 0.0, None),
        ],
        schema="url STRING, linked_from STRING, depth BIGINT, first_crawl TIMESTAMP,"
        " last_crawl TIMESTAMP, n_changes BIGINT, n_crawls BIGINT, score DOUBLE,"
        " content_hash BINARY",
    )
    fs = FreqSchedulerView(spark, page_info=pi)
    fs.margin = 0.1
    fs.max_n_crawls = 9
    fs.load([("https://a.com", 0.1), ("https://b.com", 0.1)])
    t_last = last.timestamp()
    # margin gate: 1/(0.1 × 1.1) = 9.09 s must have elapsed — the whole
    # request interrupts at the first too-recent page
    assert fs.requests(5, now=t_last + 5) == []
    # after the gate: a.com served and reinserted with score += 1/freq;
    # b.com hit max_n_crawls (9) → dropped at pop time, so the second
    # slot pops a.com again (its last_crawl hasn't moved — no crawl
    # happened between the pops, exactly like the reference's loop)
    assert fs.requests(2, now=t_last + 9.5) == ["https://a.com", "https://a.com"]
    assert "https://b.com" not in fs._schedule
    assert fs._schedule["https://a.com"][0] == pytest.approx(20.0)


def test_freq_facade_serving_ratios(spark):
    """Reference statistical property (test_freq_scheduler.py:6-55)
    driven through the facade's requests loop: long-run serve counts
    are proportional to revisit frequency."""
    from aduana_spark.frontier.freq_scheduler import FreqSchedulerView

    # the served pages must exist in page_info: the pi==NULL path
    # deletes unknown entries without serving (freq_scheduler.c:335-372)
    pi = spark.createDataFrame(
        [(u, None, 0, TS, TS, 0, 1, 0.0, None) for u in "abc"],
        schema="url STRING, linked_from STRING, depth BIGINT, first_crawl TIMESTAMP,"
        " last_crawl TIMESTAMP, n_changes BIGINT, n_crawls BIGINT, score DOUBLE,"
        " content_hash BINARY",
    )
    fs = FreqSchedulerView(spark, page_info=pi)
    fs.load([("a", 0.1), ("b", 0.005), ("c", 0.002)])
    served = fs.requests(10_000, now=0.0)
    counts = {u: served.count(u) for u in "abc"}
    total_rate = 0.107
    horizon = 10_000 / total_rate
    assert counts["a"] == pytest.approx(horizon * 0.1, rel=0.01)
    assert counts["b"] == pytest.approx(horizon * 0.005, rel=0.02)
    assert counts["c"] == pytest.approx(horizon * 0.002, rel=0.05)


def test_freq_from_settings(spark):
    from aduana_spark.frontier.freq_scheduler import FreqSchedulerView

    pi = spark.createDataFrame(
        [("https://a.com", None, 0, TS, TS + dt.timedelta(seconds=100), 4, 5, 0.0, None)],
        schema="url STRING, linked_from STRING, depth BIGINT, first_crawl TIMESTAMP,"
        " last_crawl TIMESTAMP, n_changes BIGINT, n_crawls BIGINT, score DOUBLE,"
        " content_hash BINARY",
    )
    fs = FreqSchedulerView.from_settings(
        spark,
        {"FREQ_DEFAULT": 0.02, "FREQ_SCALE": 4.0, "FREQ_MARGIN": 0.5, "MAX_N_CRAWLS": 10},
        page_info=pi,
    )
    assert fs.margin == pytest.approx(0.5)
    assert fs.max_n_crawls == 10
    assert fs._schedule["https://a.com"][1] == pytest.approx(0.2)  # 4 × 0.05


def test_freq_missing_pageinfo_deleted(spark):
    """freq_scheduler_request (freq_scheduler.c:335-372): schedule
    entries whose PageInfo lookup returns NULL are deleted without
    being served — a load() of an unknown URL must not be served on
    every request forever."""
    from aduana_spark.frontier.freq_scheduler import FreqSchedulerView

    pi = spark.createDataFrame(
        [("a", None, 0, TS, TS, 0, 1, 0.0, None)],
        schema="url STRING, linked_from STRING, depth BIGINT, first_crawl TIMESTAMP,"
        " last_crawl TIMESTAMP, n_changes BIGINT, n_crawls BIGINT, score DOUBLE,"
        " content_hash BINARY",
    )
    fs = FreqSchedulerView(spark, page_info=pi)
    fs.load([("a", 0.1), ("ghost", 10.0)])  # ghost would win every pop
    served = fs.requests(4, now=0.0)
    assert served == ["a"] * 4
    assert "ghost" not in fs._schedule
    assert "a" in fs._schedule


def test_set_crawl_rate_nonpositive_hard_disables(spark):
    """hard_rate <= 0 must not raise ZeroDivisionError (the C float
    division, bf_scheduler.c:832-848, degrades to inf): treat it as
    politeness-disabled, like soft_rate < 0."""
    sch = BFSchedulerView(spark)
    sch.set_crawl_rate(0.25, 0.0)
    assert sch.temp_window is None
    assert sch._escalation_limits() == [None]
    sch.set_crawl_rate(0.25, 4.0)  # re-arming afterwards still works
    assert sch.temp_window == pytest.approx(2.5)


def test_maybe_update_counts_pages_not_batches(spark):
    """BF_SCHEDULER_UPDATE_NUM_PAGES (bf_scheduler.c:537-549) counts
    crawled *pages*, not add() calls: one 120-page batch must trip the
    >=100-new-pages gate."""
    from aduana_spark.api import BFScheduler

    rows = [
        (i, f"https://d{i}.com/", [(f"https://d{i}.com/x", 0.5)], 0.0, b"h", TS)
        for i in range(120)
    ]
    batch = spark.createDataFrame(rows, schema=BATCH_SCHEMA)
    sch = BFScheduler(spark)
    sch.add(batch)
    assert sch._pages_since_update == 120
    assert sch.maybe_update() is True
    assert sch._pages_since_update == 0


def test_maybe_update_recrawls_grow_the_base(spark):
    """The 1%-growth base is the CUMULATIVE pages-added counter
    (n_pages_old = n_pages_new snapshot, bf_scheduler.c:539-548), not
    the distinct crawled-page count: a crawl that mostly RE-crawls
    existing pages still grows the base, so 120 new pages against a
    15000-add history must NOT trip the gate (needs >=150)."""
    from aduana_spark.api import BFScheduler

    sch = BFScheduler(spark)
    # counter state after 15000 cumulative adds (recrawls included)
    # followed by a 120-page batch — driving 150 real add() batches
    # through Spark would test the same arithmetic at 1000x the cost
    sch._pages_added_total = 15000
    sch._pages_since_update = 120
    assert sch.maybe_update() is False  # 120 < 1% of 14880
    sch._pages_added_total = 15030
    sch._pages_since_update = 150
    assert sch.maybe_update() is True  # 150 >= 1% of 14880
    assert sch._pages_since_update == 0
    assert sch._pages_added_total == 15030  # cumulative never resets


def test_maybe_update_base_survives_restart(spark):
    """A scheduler opened over an EXISTING PageDB must seed the
    growth base from the persisted crawled pages — the reference's
    reload path adds reloaded pages into the cumulative counter
    (bf_scheduler.c:329), so a restart over a large DB must not
    re-fire the full score recompute on every >=100-page batch."""
    from aduana_spark.api import BFScheduler, PageDB

    db = PageDB(spark)
    rows = [
        (i, f"https://d{i}.com/", [(f"https://d{i}.com/x", 0.5)], 0.0, b"h", TS)
        for i in range(150)
    ]
    db.add_batch(spark.createDataFrame(rows, schema=BATCH_SCHEMA))

    # "restart": a fresh scheduler over the same persisted PageDB
    sch = BFScheduler(spark, page_db=db)
    assert sch._pages_added_total == 150
    # counter state as add() would leave it after a 1-page batch:
    # n_old = 150 persisted pages -> blocked by the >=100 gate
    sch._pages_added_total += 1
    sch._pages_since_update = 1
    assert sch.maybe_update() is False
    # +99 more (100 since restart) >= max(100, 1% of 150) -> fires
    sch._pages_added_total += 99
    sch._pages_since_update = 100
    assert sch.maybe_update() is True


def test_frontier_topk_per_domain(spark):
    """SURVEY §2.5 politeness interleave: per_domain_k caps each
    domain's share of the batch before the global top-k, so a hub
    domain cannot monopolize the frontier."""
    pi = empty_page_info(spark)
    links = [(f"https://hub.com/p{i}", 0.9 - i / 1000.0) for i in range(5)]
    links += [(f"https://small{i}.org/", 0.5 - i / 1000.0) for i in range(3)]
    pi, sched = ingest_crawl_batch(pi, _batch(spark, 0, "https://seed.io/", links))
    plain = [r["url"] for r in frontier_topk(sched, pi, 4).collect()]
    assert plain == [f"https://hub.com/p{i}" for i in range(4)]
    capped = [
        r["url"] for r in frontier_topk(sched, pi, 4, per_domain_k=2).collect()
    ]
    assert capped == [
        "https://hub.com/p0",
        "https://hub.com/p1",
        "https://small0.org/",
        "https://small1.org/",
    ]


def test_freq_requests_collect_bounded_by_schedule(spark):
    """r6: the per-request driver collect is semi-joined to the
    schedule's URLs — a page_info table far larger than the schedule
    serves correctly without shipping non-schedule rows to the driver
    (the max_facade_rows guard bounds the schedule, not page_info)."""
    from aduana_spark.frontier.freq_scheduler import FreqSchedulerView

    last = TS + dt.timedelta(seconds=100)
    big_pi = spark.range(0, 5000).selectExpr(
        "concat('https://bulk.org/p', id) AS url",
        "CAST(NULL AS STRING) AS linked_from",
        "CAST(0 AS BIGINT) AS depth",
        f"CAST('{TS.isoformat()}' AS TIMESTAMP) AS first_crawl",
        f"CAST('{last.isoformat()}' AS TIMESTAMP) AS last_crawl",
        "CAST(1 AS BIGINT) AS n_changes",
        "CAST(2 AS BIGINT) AS n_crawls",
        "CAST(0.0 AS DOUBLE) AS score",
        "CAST(NULL AS BINARY) AS content_hash",
    )
    fs = FreqSchedulerView(spark, page_info=big_pi)
    # schedule far smaller than page_info — and smaller than
    # max_facade_rows, so the facade contract is satisfied while the
    # old whole-table collect would have shipped all 5000 rows
    fs.max_facade_rows = 100
    fs.load([("https://bulk.org/p7", 0.5), ("https://bulk.org/p11", 0.25)])
    # both start at score 0 → (score, url) order is lexicographic
    got = fs.requests(2, now=last.timestamp() + 1000)
    assert got == ["https://bulk.org/p11", "https://bulk.org/p7"]
    # second round: p7 re-inserted at 1/0.5 = 2.0 < p11's 1/0.25 = 4.0
    assert fs.requests(1, now=last.timestamp() + 2000) == ["https://bulk.org/p7"]
