"""Revisit-frequency scheduling as an earliest-deadline-first view.

Reference: ``freq_scheduler`` (/root/reference/lib/src/freq_scheduler.c)
keeps a schedule sorted ASC by next-due time; popped pages are
reinserted with ``score += 1/freq`` (freq_scheduler.c:363-371).
Admission filters: positive frequency only (161-162), seeds excluded
(210-212 + page_db.c:437-445), optional max_n_crawls (210-211, 349),
margin gate ``now - last_crawl >= 1/(freq*(1+margin))``
(344-348, semantics freq_scheduler.h:45-53).

Frequency assignment mirrors the Python surface
(aduana/__init__.py:467-607):

- ``load_simple(freq_default, freq_min, freq_max)``: per-page rate
  from the change estimate (freq_algo_simple, freq_algo.c:6-44 —
  rate = (n_changes+1)/(last-first), n_crawls >= 2), clipped to
  [freq_min, freq_max], scaled... pages without an estimate get
  freq_default.
- ``freq_spec`` regex rules: first matching rule wins
  (__init__.py:583-607); a rule is (regex, multiplier-or-fixed).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aduana_spark.frontier.page_info import crawl_rate_col, is_seed_col


@dataclass
class FreqRule:
    pattern: str
    #: multiply the page's estimated change rate…
    rate_multiplier: float | None = None
    #: …or revisit every `fixed_interval` seconds
    fixed_interval: float | None = None

    def freq_col(self) -> F.Column:
        if self.rate_multiplier is not None:
            return F.lit(self.rate_multiplier) * F.greatest(
                crawl_rate_col(), F.lit(0.0)
            )
        return F.lit(1.0 / self.fixed_interval)


def freq_spec(rules: list[FreqRule]) -> F.Column:
    """First-match-wins regex rule cascade (J6, __init__.py:583-607)."""
    expr = F.lit(None).cast("double")
    for rule in reversed(rules):
        expr = F.when(F.col("url").rlike(rule.pattern), rule.freq_col()).otherwise(expr)
    return expr


def build_freq_table(
    page_info: DataFrame,
    rules: list[FreqRule] | None = None,
    freq_default: float = 0.1,
    freq_min: float | None = None,
    freq_max: float | None = None,
    max_n_crawls: int | None = None,
) -> DataFrame:
    """(url, freq, last_crawl) for pages admitted to revisit
    scheduling."""
    crawled = page_info.where(F.col("n_crawls") > 0).where(~is_seed_col("url"))
    if max_n_crawls is not None and max_n_crawls > 0:
        # F6 (freq_scheduler.c:210-211, 349)
        crawled = crawled.where(F.col("n_crawls") < max_n_crawls)
    if rules:
        freq = freq_spec(rules)
    else:
        est = crawl_rate_col()
        freq = F.when(
            (F.col("n_crawls") >= 2) & (est > 0), est
        ).otherwise(F.lit(freq_default))
    if freq_min is not None:
        freq = F.greatest(freq, F.lit(freq_min))
    if freq_max is not None:
        freq = F.least(freq, F.lit(freq_max))
    out = crawled.select("url", freq.alias("freq"), "last_crawl")
    # F8: drop non-positive frequencies (freq_scheduler.c:161-162)
    return out.where(F.col("freq") > 0)


def next_due_view(
    freq_table: DataFrame,
    n: int,
    now: float,
    margin: float = 0.1,
) -> DataFrame:
    """T3: earliest-deadline-first top-n of pages due for a revisit.

    next_due = last_crawl + 1/freq; the margin gate skips pages
    crawled more recently than 1/(freq*(1+margin))
    (freq_scheduler.c:344-348)."""
    due = freq_table.select(
        "url",
        "freq",
        (F.unix_timestamp("last_crawl") + 1.0 / F.col("freq")).alias("next_due"),
    )
    gate = F.lit(now) - F.unix_timestamp("last_crawl") >= 1.0 / (
        F.col("freq") * (1.0 + F.lit(margin))
    )
    return (
        due.where(gate)
        .orderBy(F.col("next_due").asc(), F.xxhash64("url").asc())
        .limit(n)
        .select("url", "freq", "next_due")
    )


def parse_freq_spec(lines: list[str]) -> list[FreqRule]:
    """Text rule format of aduana.freq_spec
    (/root/reference/aduana/__init__.py:583-607): one rule per line,
    ``<regex> <action>`` where action ``xN`` multiplies the page's
    estimated change rate by N and a bare number is a fixed revisit
    interval in seconds. First matching rule wins."""
    rules: list[FreqRule] = []
    for line in lines:
        cols = line.split()
        if len(cols) != 2:
            continue
        pattern, action = cols
        if action.startswith("x"):
            rules.append(FreqRule(pattern, rate_multiplier=float(action[1:])))
        else:
            rules.append(FreqRule(pattern, fixed_interval=float(action)))
    return rules


def simulate_serving(
    freq_table: DataFrame,
    t_start: float,
    t_end: float,
    batch: int = 4,
    margin: float = 0.1,
) -> dict[str, int]:
    """EDF serving-loop simulation (mirrors the reference's
    statistical test, test/test_freq_scheduler.py:6-55): repeatedly
    pop due pages and reinsert with ``next_due += 1/freq``
    (freq_scheduler.c:363-371). Driver loop over the view; serve
    counts over [t_start, t_end) should approach
    ``(t_end - t_start) * freq`` per page.

    State (url, freq, next_due) is kept as plain Python — the loop is
    control flow, exactly like the reference's cursor loop; the heavy
    lifting (building freq_table from page state) is the Spark part.
    """
    import heapq

    rows = freq_table.select("url", "freq", "last_crawl").collect()
    heap = [
        (
            (r["last_crawl"].timestamp() if r["last_crawl"] else t_start)
            + 1.0 / r["freq"],
            r["url"],
            float(r["freq"]),
        )
        for r in rows
    ]
    heapq.heapify(heap)
    served: dict[str, int] = {}
    while heap:
        due, url, freq = heapq.heappop(heap)
        if due >= t_end:
            break
        served[url] = served.get(url, 0) + 1
        heapq.heappush(heap, (due + 1.0 / freq, url, freq))
    return served
