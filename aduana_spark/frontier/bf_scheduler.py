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
    per_domain_k: int | None = None,
) -> DataFrame:
    """The ranked crawl-frontier view (north rule): top-k unfetched
    URLs by score with the reference's deterministic tie-break.

    ``schedule``: (url, score) candidate entries.
    ``served``: optional (url) log of already-served entries (pop
    semantics). ``domain_rate``: optional (domain, temp) table for the
    politeness gate F2 (bf_scheduler.c:716-721).
    ``per_domain_k``: optional politeness interleave (SURVEY §2.5) —
    admit at most k pages per domain BEFORE the global top-k, so one
    hub domain cannot monopolize the frontier batch (the declarative
    upgrade of the reference's temperature-based skipping). Compiles
    to a rank window partitioned by domain: one shuffle on domain,
    then the usual TakeOrderedAndProject — no global sort.
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
    if per_domain_k is not None and per_domain_k > 0:
        from pyspark.sql import Window

        w = Window.partitionBy(domain_col("url")).orderBy(
            F.col("score").desc(), F.xxhash64("url").asc()
        )
        cand = (
            cand.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= per_domain_k)
            .drop("_rn")
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
    table and ingest is a MERGE job.

    When ``page_db`` is given, page state lives in that PageDB and
    each batch is ingested exactly once (shared with the Frontera
    ``Backend``); otherwise the view owns its page-info table.

    ``set_crawl_rate(soft, hard)`` arms the politeness gate: crawled
    pages heat their domain (page_db.c:858-860) over a linear-decay
    window of ``10/hard_rate`` seconds (bf_scheduler.c:832-848), and
    ``requests`` admits a page only while its domain temperature is
    under the limit — first at the soft limit, then escalating
    geometrically soft→hard in 5 steps until the request is filled
    (bf_scheduler.c:782-804).
    """

    def __init__(
        self,
        spark: SparkSession,
        max_depth: int | None = None,
        page_db=None,
    ):
        self.spark = spark
        self.max_depth = max_depth
        self._page_db = page_db
        self._own_page_info = empty_page_info(spark) if page_db is None else None
        self.schedule = spark.createDataFrame([], "url STRING, score DOUBLE")
        self.served = spark.createDataFrame([], "url STRING")
        self.crawl_log = spark.createDataFrame([], "domain STRING, ts TIMESTAMP")
        self.soft_rate: float | None = None
        self.hard_rate: float | None = None
        self.temp_window: float | None = None
        self.update_interval: float | None = None

    @property
    def page_info(self) -> DataFrame:
        if self._page_db is not None:
            return self._page_db.page_info
        return self._own_page_info

    @page_info.setter
    def page_info(self, df: DataFrame) -> None:
        if self._page_db is not None:
            self._page_db.page_info = df
        else:
            self._own_page_info = df

    def set_crawl_rate(self, soft_rate: float, hard_rate: float) -> None:
        """bf_scheduler_set_max_domain_crawl_rate
        (bf_scheduler.c:832-855): window sized so ~10 crawls at the
        hard rate fit inside it. Non-positive hard_rate disables
        politeness (like soft_rate < 0 in _escalation_limits) instead
        of raising ZeroDivisionError — the C float division degrades
        to inf rather than throwing."""
        if hard_rate is None or hard_rate <= 0:
            self.soft_rate = -1.0
            self.hard_rate = None
            self.temp_window = None
            return
        self.soft_rate = soft_rate
        self.hard_rate = hard_rate
        self.temp_window = 10.0 / hard_rate

    def set_update_interval(self, seconds: float) -> None:
        """BFScheduler.set_update_interval (aduana/__init__.py:463-465):
        minimum seconds between scorer recomputations (consumed by the
        api.BFScheduler facade's maybe_update)."""
        self.update_interval = seconds

    def add(self, batch: DataFrame) -> None:
        """Ingest one crawl batch (bf_scheduler_add,
        bf_scheduler.c:157-246): page_db merge + schedule insertions
        for newly discovered crawlable pages (excluding seeds from
        nothing — the crawled page itself has n_crawls>0 and never
        enters). Crawled pages also heat their domain's temperature
        (page_db.c:858-860)."""
        if self._page_db is not None:
            new_sched = self._page_db.add_batch(batch)
        else:
            new_info, new_sched = ingest_crawl_batch(self._own_page_info, batch)
            # localCheckpoint truncates the per-batch lineage chain
            # (see PageDB.add_batch) — persist alone caches rows but
            # leaves the logical plan growing per batch
            self._own_page_info = new_info.localCheckpoint()
        self.schedule = self.schedule.unionByName(
            new_sched.select("url", "score")
        ).localCheckpoint()
        self.crawl_log = self.crawl_log.unionByName(
            batch.select(domain_col("url").alias("domain"), F.col("ts"))
        ).localCheckpoint()

    def _escalation_limits(self) -> list[float | None]:
        """The reference's request loop: one pass at the soft limit,
        then 4 geometrically escalated passes up to the hard limit
        when hard > soft, else a final pass at the hard limit
        (bf_scheduler.c:782-804). No rate set → one unlimited pass."""
        from aduana_spark.frontier.domain_temp import escalated_limits

        if self.soft_rate is None or self.soft_rate < 0:
            return [None]
        if self.hard_rate is not None and self.hard_rate > self.soft_rate:
            return list(escalated_limits(self.soft_rate, self.hard_rate, steps=5))
        return [self.soft_rate, self.hard_rate if self.hard_rate is not None else self.soft_rate]

    def requests(self, n: int, now: float | None = None) -> list[str]:
        """Pop up to n URLs (bf_scheduler_request): serve the view's
        top-n and log them as served. With a crawl rate armed, each
        pass admits only domains whose temperature is under that
        pass's limit; skipped pages stay scheduled and are re-examined
        at the next (relaxed) limit."""
        from aduana_spark.frontier.domain_temp import domain_temperature

        limits = self._escalation_limits()
        domain_rate = None
        if limits != [None]:
            if now is None:
                last = self.crawl_log.agg(F.max("ts")).first()[0]
                now = last.timestamp() if last is not None else 0.0
            domain_rate = domain_temperature(
                self.crawl_log, now=now, window_sec=self.temp_window, mode="linear"
            ).persist()

        urls: list[str] = []
        for limit in limits:
            if len(urls) >= n:
                break
            top = frontier_topk(
                self.schedule,
                self.page_info,
                n - len(urls),
                served=self.served,
                max_depth=self.max_depth,
                domain_rate=domain_rate,
                crawl_limit=limit,
            )
            got = [r["url"] for r in top.collect()]
            if got:
                batch = self.spark.createDataFrame([(u,) for u in got], "url STRING")
                self.served = self.served.unionByName(batch).localCheckpoint()
                urls += got
            if domain_rate is None:
                break  # single unlimited pass
        if domain_rate is not None:
            domain_rate.unpersist()
        return urls
