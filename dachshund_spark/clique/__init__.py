from dachshund_spark.clique.miner import SearchProblem, mine_cliques
from dachshund_spark.clique.typed_graph import TypedLocalGraph, process_typespec

__all__ = ["mine_cliques", "SearchProblem", "TypedLocalGraph", "process_typespec"]
