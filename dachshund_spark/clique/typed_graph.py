"""Typed bipartite (core / non-core) graph — local per-graph structure.

Mirrors the reference's TypedGraph semantics
(/root/reference/src/dachshund/typed_graph.rs:14-24 — only core↔non-core
edges exist) for the quasi-biclique miner, which runs per graph inside
``applyInPandas``.  Scale note: the *construction* and *pruning* of the
typed edge table happen distributed (DataFrame ops in miner.py); only
the beam search itself — inherently sequential — is local per graph.

Quirks faithfully reproduced:
- last-row-wins node typing (graph_builder.rs:148-154)
- multi-edges: one edge per input row, ties count multiplicities
  (node.rs:98-116)
- rows whose core type doesn't match the declared core type are
  rejected (nonsense-row tolerance, tests/tests.rs:177-190)
"""

from __future__ import annotations

from dataclasses import dataclass, field


def process_typespec(
    typespec: list[list[str]], core_type: str, non_core_types: list[str]
) -> dict[str, dict]:
    """Type dictionary: non-core type name → {type_id, max_edge_count}.

    ``max_edge_count_with_core_node`` = number of distinct relations the
    typespec declares between the core type and this non-core type
    (transformer.rs:89-108; tests/tests.rs:25-63: conference→3 with 3
    relations, journal→1).
    Type ids are 1-based in the order of ``non_core_types``.
    """
    out: dict[str, dict] = {}
    for i, t in enumerate(non_core_types):
        max_edges = sum(
            1 for row in typespec if row[0] == core_type and row[2] == t
        )
        out[t] = {"type_id": i + 1, "max_edge_count": max_edges}
    return out


@dataclass
class TypedLocalGraph:
    core_type: str
    type_info: dict[str, dict]
    # node_id -> list of (neighbor_id, edge_type) multi-edges
    adj: dict[int, list[tuple[int, str]]] = field(default_factory=dict)
    core_ids: list[int] = field(default_factory=list)
    non_core_ids: list[int] = field(default_factory=list)
    non_core_type_of: dict[int, str] = field(default_factory=dict)

    @classmethod
    def from_rows(
        cls,
        rows: list[tuple[int, int, str, str, str]],
        core_type: str,
        type_info: dict[str, dict],
        min_degree: int = 0,
    ) -> "TypedLocalGraph":
        """rows: (core_id, non_core_id, core_type, edge_type, non_core_type)."""
        g = cls(core_type=core_type, type_info=type_info)
        cores: set[int] = set()
        valid_rows = []
        for core_id, nc_id, ct, et, nct in rows:
            if ct != core_type or nct not in type_info:
                continue  # nonsense row — skipped like the reference
            valid_rows.append((int(core_id), int(nc_id), et, nct))
        for core_id, nc_id, et, nct in valid_rows:
            cores.add(core_id)
            g.non_core_type_of[nc_id] = nct  # last row wins
            g.adj.setdefault(core_id, []).append((nc_id, et))
            g.adj.setdefault(nc_id, []).append((core_id, et))
        g.core_ids = sorted(cores)
        g.non_core_ids = sorted(g.non_core_type_of)
        if min_degree > 0:
            g._trim(min_degree)
        return g

    def _trim(self, k: int) -> None:
        """Iterative min-degree pruning (graph_builder.rs:113-141):
        repeatedly delete nodes with < k distinct neighbors."""
        adj = {u: [e for e in es] for u, es in self.adj.items()}
        while True:
            bad = [u for u, es in adj.items() if len({t for t, _ in es}) < k]
            if not bad:
                break
            bad_set = set(bad)
            for u in bad:
                del adj[u]
            for u in list(adj):
                adj[u] = [e for e in adj[u] if e[0] not in bad_set]
        self.adj = adj
        self.core_ids = [c for c in self.core_ids if c in adj]
        self.non_core_ids = [n for n in self.non_core_ids if n in adj]
        self.non_core_type_of = {
            n: t for n, t in self.non_core_type_of.items() if n in adj
        }

    def is_core(self, node_id: int) -> bool:
        return node_id not in self.non_core_type_of

    def max_edge_count(self, non_core_id: int) -> int:
        return self.type_info[self.non_core_type_of[non_core_id]]["max_edge_count"]

    def type_id(self, non_core_id: int) -> int:
        return self.type_info[self.non_core_type_of[non_core_id]]["type_id"]

    def ties_with(self, node_id: int, id_set: set[int]) -> int:
        """Multi-edge tie count between a node and a node set
        (node.rs:98-116)."""
        return sum(1 for t, _ in self.adj.get(node_id, ()) if t in id_set)
