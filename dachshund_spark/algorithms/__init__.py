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

from dachshund_spark.algorithms.matching import maximal_matching, vertex_cover_2approx
from dachshund_spark.algorithms.rewire import degree_preserving_swaps, motif_significance
from dachshund_spark.algorithms.roles import refex_features
from dachshund_spark.algorithms.scan import scan_clusters
from dachshund_spark.algorithms.sparsify import lspar_sparsify
from dachshund_spark.algorithms.sweep import sweep_cut
from dachshund_spark.algorithms.temporal import temporal_earliest_arrival
from dachshund_spark.algorithms.wl import wl_graph_hash, wl_labels
from dachshund_spark.algorithms.paths import voronoi_cells
from dachshund_spark.algorithms.hits import wtf_recommendations
from dachshund_spark.algorithms.scc import dag_path_counts
from dachshund_spark.algorithms.stats import core_periphery, oddball_ego

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
    "maximal_matching",
    "vertex_cover_2approx",
    "degree_preserving_swaps",
    "motif_significance",
    "refex_features",
    "scan_clusters",
    "lspar_sparsify",
    "sweep_cut",
    "temporal_earliest_arrival",
    "wl_graph_hash",
    "wl_labels",
    "voronoi_cells",
    "wtf_recommendations",
    "dag_path_counts",
    "core_periphery",
    "oddball_ego",
]
