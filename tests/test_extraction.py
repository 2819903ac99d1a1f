"""Byte-identity of vectorized extraction vs the single-process
reference extractor (BASELINE.json input_hint invariant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aduana_spark.datagen import golden_pages, synth_pages
from aduana_spark.extraction import extract_pages, raw_edges, ref_extract


def test_ref_extract_strips_script_style():
    html = (
        b"<html><head><title>T</title><script>var x;</script>"
        b"<style>.a{}</style></head><body><p>hello <b>world</b></p>"
        b'<a href="https://x.org/1">one</a></body></html>'
    )
    text, links = ref_extract(html)
    assert "var x" not in text and ".a{}" not in text
    assert "hello world" in text
    assert links == ["https://x.org/1"]


def test_extraction_byte_identity_synth(spark):
    pages = synth_pages(spark, n_pages=300, n_domains=20, seed=42).persist()
    ext = extract_pages(pages)
    joined = pages.select("url", F.col("text").alias("expected")).join(ext, "url")
    mismatches = joined.where(
        ~F.col("text").eqNullSafe(F.col("expected"))
    ).count()
    assert mismatches == 0
    assert ext.count() == 300
    pages.unpersist()


def test_extraction_deterministic_across_partitionings(spark):
    a = synth_pages(spark, n_pages=120, n_domains=10, partitions=1).orderBy("url").collect()
    b = synth_pages(spark, n_pages=120, n_domains=10, partitions=7).orderBy("url").collect()
    assert a == b


def test_golden_pages_extract_to_golden_edges(spark):
    from aduana_spark.datagen import GOLDEN_EDGES

    ext = extract_pages(golden_pages(spark))
    edges = {
        (int(r["src_url"].rsplit("p", 1)[1]), int(r["dst_url"].rsplit("p", 1)[1]))
        for r in raw_edges(ext).collect()
    }
    assert edges == set(GOLDEN_EDGES)
