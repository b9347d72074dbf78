from dachshund_spark.algorithms.betweenness import (
    betweenness_sampled,
    sample_sources,
)
from dachshund_spark.algorithms.brokerage import brokerage_scores, open_two_paths
from dachshund_spark.algorithms.components import (
    connected_components,
    is_connected,
    weakly_connected_components,
)
from dachshund_spark.algorithms.lpa import label_propagation
from dachshund_spark.algorithms.neighborhood import (
    distance_summary,
    neighborhood_function,
    neighborhood_function_exact,
)
from dachshund_spark.algorithms.pagerank import pagerank
from dachshund_spark.algorithms.triangles import (
    avg_clustering,
    clustering_coefficients,
    transitivity,
    triangle_counts,
    triples_counts,
)

__all__ = [
    "betweenness_sampled",
    "sample_sources",
    "connected_components",
    "weakly_connected_components",
    "is_connected",
    "pagerank",
    "label_propagation",
    "neighborhood_function",
    "neighborhood_function_exact",
    "distance_summary",
    "brokerage_scores",
    "open_two_paths",
    "triangle_counts",
    "triples_counts",
    "transitivity",
    "clustering_coefficients",
    "avg_clustering",
]
