"""Best-first frontier as a Spark SQL view + a pop-semantics driver.

The reference keeps an LMDB schedule sorted by
(score DESC, hash ASC) — comparator scheduler.c:22-37 — and
``bf_scheduler_request`` (bf_scheduler.c:679-819) pops entries,
dropping already-crawled ones and deleting what it serves, with
per-domain politeness rate limiting and geometric escalation
(bf_scheduler.c:782-804).

Spark-first shape: the schedule is **not** a mutable queue but a
deterministic view over persisted tables::

    SELECT url FROM schedule s
    LEFT ANTI JOIN served USING (url)
    JOIN page_info USING (url)
    WHERE n_crawls = 0 [AND depth <= max_depth] [AND domain rate ok]
    ORDER BY score DESC, xxhash64(url) ASC LIMIT k

At scale this compiles to TakeOrderedAndProject after a cheap
anti-join — no global sort materializes. Served/crawled tracking is an
append-only log; restart stability (test_bf_scheduler.c:248-314) is
free because the view is a pure function of the persisted tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aduana_spark.frontier.page_info import (
    empty_page_info,
    ingest_crawl_batch,
    is_seed_col,
)
from aduana_spark.functions.urls import domain_col


def frontier_topk(
    schedule: DataFrame,
    page_info: DataFrame,
    k: int,
    served: DataFrame | None = None,
    max_depth: int | None = None,
    domain_rate: DataFrame | None = None,
    crawl_limit: float | None = None,
) -> DataFrame:
    """The ranked crawl-frontier view (north rule): top-k unfetched
    URLs by score with the reference's deterministic tie-break.

    ``schedule``: (url, score) candidate entries.
    ``served``: optional (url) log of already-served entries (pop
    semantics). ``domain_rate``: optional (domain, temp) table for the
    politeness gate F2 (bf_scheduler.c:716-721).
    """
    cand = schedule.join(
        page_info.select("url", "n_crawls", "depth"), "url", "left"
    ).where(F.coalesce("n_crawls", F.lit(0)) == 0)
    if max_depth is not None and max_depth > 0:
        # F1 (bf_scheduler.c:150-155)
        cand = cand.where(F.coalesce("depth", F.lit(0)) <= max_depth)
    if served is not None:
        cand = cand.join(served.select("url"), "url", "left_anti")
    if domain_rate is not None and crawl_limit is not None:
        cand = cand.withColumn("domain", domain_col("url")).join(
            domain_rate, "domain", "left"
        ).where(F.coalesce("temp", F.lit(0.0)) <= F.lit(crawl_limit)).drop(
            "domain", "temp"
        )
    return (
        cand.orderBy(F.col("score").desc(), F.xxhash64("url").asc())
        .limit(k)
        .select("url", "score")
    )


def significant_change(old_score, new_score, threshold: float = 0.1):
    """F5 (bf_scheduler.c:450): re-key a schedule entry only when the
    score moved by at least ``threshold`` of its old magnitude —
    |new - old| >= threshold * |old|."""
    old = F.col(old_score) if isinstance(old_score, str) else old_score
    new = F.col(new_score) if isinstance(new_score, str) else new_score
    return F.abs(new - old) >= F.lit(threshold) * F.abs(old)


class BFSchedulerView:
    """Driver for sequential ingest/request cycles over the view —
    the ``BFScheduler`` API (aduana/__init__.py:365-465) minus the
    mutable store. Small-state (fixture-scale) DataFrames are kept
    persisted; at production scale each of these tables is an Iceberg
    table and ingest is a MERGE job."""

    def __init__(self, spark: SparkSession, max_depth: int | None = None):
        self.spark = spark
        self.max_depth = max_depth
        self.page_info = empty_page_info(spark)
        self.schedule = spark.createDataFrame([], "url STRING, score DOUBLE")
        self.served = spark.createDataFrame([], "url STRING")

    def add(self, batch: DataFrame) -> None:
        """Ingest one crawl batch (bf_scheduler_add,
        bf_scheduler.c:157-246): page_db merge + schedule insertions
        for newly discovered crawlable pages (excluding seeds from
        nothing — the crawled page itself has n_crawls>0 and never
        enters)."""
        new_info, new_sched = ingest_crawl_batch(self.page_info, batch)
        self.page_info = new_info.persist()
        self.page_info.count()
        self.schedule = self.schedule.unionByName(new_sched.select("url", "score")).persist()
        self.schedule.count()

    def requests(self, n: int) -> list[str]:
        """Pop up to n URLs (bf_scheduler_request): serve the view's
        top-n and log them as served."""
        top = frontier_topk(
            self.schedule,
            self.page_info,
            n,
            served=self.served,
            max_depth=self.max_depth,
        )
        urls = [r["url"] for r in top.collect()]
        if urls:
            batch = self.spark.createDataFrame([(u,) for u in urls], "url STRING")
            self.served = self.served.unionByName(batch).persist()
            self.served.count()
        return urls
