"""Graph layer: edge/vertex construction and iterative algorithms."""

from aduana_spark.graph.builder import (  # noqa: F401
    assign_dense_ids,
    build_edges,
    build_vertices,
    cross_domain_edges,
    out_degrees,
)
from aduana_spark.graph.checkpoint import CheckpointManager  # noqa: F401
from aduana_spark.graph.pagerank import pagerank  # noqa: F401
from aduana_spark.graph.hits import hits  # noqa: F401
from aduana_spark.graph.components import connected_components  # noqa: F401
from aduana_spark.graph.labelprop import label_propagation  # noqa: F401
from aduana_spark.graph.triangles import triangle_count  # noqa: F401
from aduana_spark.graph.bfs import bfs_depths  # noqa: F401
