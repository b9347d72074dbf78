from dachshund_spark.local.pack import (
    betweenness,
    cnm_communities,
    cnm_modularity_changes,
    eigenvector_centrality,
    enumerate_shortest_paths,
    featurize,
    fiedler_value,
)

__all__ = [
    "betweenness",
    "eigenvector_centrality",
    "fiedler_value",
    "cnm_communities",
    "cnm_modularity_changes",
    "enumerate_shortest_paths",
    "featurize",
]
