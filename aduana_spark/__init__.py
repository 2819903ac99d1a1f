"""aduana-spark: a PySpark-native link-graph analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of
scrapinghub/aduana (reference: /root/reference, aduana v0.2.2) as an
idiomatic Spark DataFrame engine:

- vectorized (Arrow) text + outlink extraction over Common-Crawl-style
  page tables (``aduana_spark.extraction``),
- a deduplicated ``(src, dst)`` edge table with domain-aware layout
  (``aduana_spark.graph.builder``),
- iterative PageRank / HITS with aduana's exact numeric semantics
  (remainder redistribution, L-inf convergence, L1-normalized HITS),
  per-superstep checkpoint/resume (``aduana_spark.graph``),
- connected components, label propagation, triangle counting, BFS
  depth (north-rule extensions over the same edge table),
- the crawl frontier re-expressed as Spark SQL views: best-first
  top-k scheduling and revisit-frequency scheduling
  (``aduana_spark.frontier``),
- large-scale training-data pipeline ops: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding), similarity search, text
  statistics, multimodal plumbing (``aduana_spark.pipeline``).

Everything is DataFrame-first: plans are declared via pyspark.sql and
optimized by Catalyst; Python only appears in Arrow-vectorized UDFs.
"""

__version__ = "0.1.0"
