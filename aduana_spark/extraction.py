"""HTML → text + outlink extraction (SURVEY.md §2.8 X9).

The reference extracts text app-side with BeautifulSoup — drop
``<script>``/``<style>`` subtrees, concatenate the remaining text
nodes (``get_text()``) — see
/root/reference/examples/keywords/example/spiders/example.py:18-21 and
/root/reference/examples/locations/locations/spiders/locations.py:34-37;
outlinks come from ``<a href>`` (scrapy LinkExtractor).

Here the extractor is defined once as a pure, dependency-free
function (``ref_extract``) on stdlib ``html.parser``, and the Spark
path runs the *same function* inside an Arrow-batched
``mapInPandas`` — this is what makes the per-URL byte-identity
invariant (BASELINE.json input_hint) testable: the ``text`` column of
a pages table generated with ``ref_extract`` must equal the output of
``extract_pages`` byte for byte.

Scale notes: extraction is embarrassingly parallel — no shuffle at
all; each input split maps straight to output. Column pruning keeps
the (big) ``html`` binary column out of every downstream job that
only needs ``text``/``links``.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SKIP_TAGS = frozenset(("script", "style"))
# HTML void elements never push on the skip stack.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _TextLinkParser(HTMLParser):
    """Collect text outside <script>/<style> plus <a href> targets."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.links: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS and tag not in _VOID:
            self._skip += 1
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
                    break

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip > 0:
            self._skip -= 1

    def handle_data(self, data):
        if not self._skip:
            self.chunks.append(data)


def ref_extract(html: bytes | str) -> tuple[str, list[str]]:
    """Single-process reference extractor: (text, outlinks).

    Text = concatenation of all text nodes outside script/style, in
    document order, whitespace preserved (BeautifulSoup
    ``get_text()`` semantics with no separator).
    """
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _TextLinkParser()
    p.feed(html)
    p.close()
    return "".join(p.chunks), p.links


EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("links", T.ArrayType(T.StringType()), True),
    ]
)


def _extract_batches(batches):
    for pdf in batches:
        texts = []
        links = []
        for h in pdf["html"]:
            t, ls = ref_extract(h)
            texts.append(t)
            links.append(ls)
        out = pd.DataFrame(
            {
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"] if "warc_ts" in pdf else None,
                "lang": pdf["lang"] if "lang" in pdf else None,
                "text": texts,
                "links": links,
            }
        )
        yield out


def extract_pages(pages: DataFrame) -> DataFrame:
    """Vectorized extraction job over a Common-Crawl-style pages table.

    Input columns: url STRING, html BINARY (+ passthrough warc_ts,
    lang). Output: url, warc_ts, lang, text, links ARRAY<STRING>.
    Arrow-batched ``mapInPandas``; no shuffle.
    """
    cols = [c for c in ("url", "warc_ts", "lang", "html") if c in pages.columns]
    return pages.select(*cols).mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)


def raw_edges(extracted: DataFrame) -> DataFrame:
    """(src_url, dst_url) rows from extracted outlinks. Duplicates kept —
    dedup happens in graph.builder (north rule: dedup'd edge table)."""
    return extracted.select(
        F.col("url").alias("src_url"),
        F.explode("links").alias("dst_url"),
    )
