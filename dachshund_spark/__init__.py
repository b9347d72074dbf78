"""dachshund_spark — a PySpark-native link-graph analytics engine.

A from-scratch rebuild (NOT a port) of the analytic capabilities of
``bogdanstate/dachshund`` (Rust, in-memory) on top of the Spark DataFrame
API: iterative PageRank, connected components (hash-min label exchange),
label propagation, triangle counting, k-core/coreness, k-truss, BFS
shortest paths, plus a pandas-UDF island for the per-graph sequential
algorithms (betweenness, eigenvector centrality, Fiedler value, CNM
communities, brokerage, quasi-biclique beam search) and a training-data
pipeline layer (dedup, similarity search, text analysis).

Everything scale-sensitive is expressed as DataFrame joins + aggregations
so Catalyst/AQE/Tungsten handle physical planning; per-graph sequential
algorithms run inside ``groupBy(graph_id).applyInPandas`` on Arrow batches.
"""

from dachshund_spark.graph import LinkGraph
from dachshund_spark.session import get_spark

__all__ = ["LinkGraph", "get_spark"]
__version__ = "0.1.0"
