"""Quasi-biclique beam search (the reference's clique_miner).

Faithful re-implementation of the search *semantics*
(/root/reference/src/dachshund/beam.rs:91-302,
/root/reference/src/dachshund/candidate.rs:113-667,
/root/reference/src/dachshund/scorer.rs:41-106) in python, run per
graph_id inside ``applyInPandas``:

- seeds: optional prior clique rows first, then random-walk(7)
  endpoints from random core/non-core roots until beam_size seeds;
  the RNG is seeded by graph_id so runs are reproducible (the
  reference seeds StdRng from hash(graph_id), beam.rs:106-110 — we
  can't replicate Rust's RNG stream, so parity is on *outcomes*:
  the expected clique memberships of the reference test fixtures,
  which are search-stable).
- score = ln(|core|+1) + Σ_t ln(count_t+1) + α·cliqueness, gated by
  the global (cliqueness ≥ g) and local (every core node has ≥
  ceil(l·max_core_node_edges) ties) thresholds; −1 when either side
  is empty; cliqueness = multi-edge ties / (|core|·Σ max_edge_count).
- expansion: top-``num_to_search`` neighborhood nodes by tie count
  (ties desc, id asc — the reference's bounded heap ordering,
  candidate.rs:417-423); dedup by order-independent checksum;
  beam keeps top ``beam_size`` by (score desc, checksum desc);
  early stop after ``max_repeated_prior_scores`` repeats of the top
  score, budget ``num_epochs``.
"""

from __future__ import annotations

import hashlib
import math
import random
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from dachshund_spark.clique.typed_graph import TypedLocalGraph, process_typespec
from dachshund_spark.util import GRAPH_ID


@dataclass
class SearchProblem:
    """Miner parameters (defaults = the reference test harness,
    /root/reference/src/dachshund/test_utils.rs:22-35)."""

    beam_size: int = 20
    alpha: float = 1.0
    global_thresh: float | None = 1.0
    local_thresh: float | None = 1.0
    num_to_search: int = 20
    num_epochs: int = 100
    max_repeated_prior_scores: int = 3
    min_degree: int = 0


def _checksum(ids) -> int:
    """Order-independent member checksum (wrapping-add of per-id hashes,
    candidate.rs:173-184)."""
    total = 0
    for i in ids:
        h = int.from_bytes(
            hashlib.md5(str(i).encode()).digest()[:8], "big"
        )
        total = (total + h) & 0xFFFFFFFFFFFFFFFF
    return total


class Candidate:
    __slots__ = ("g", "core", "non_core", "score", "_checksum")

    def __init__(self, g: TypedLocalGraph, core=(), non_core=()):
        self.g = g
        self.core = set(core)
        self.non_core = set(non_core)
        self.score: float | None = None
        self._checksum: int | None = None

    @property
    def checksum(self) -> int:
        if self._checksum is None:
            self._checksum = _checksum(self.core | self.non_core)
        return self._checksum

    def max_core_node_edges(self) -> int:
        return sum(self.g.max_edge_count(n) for n in self.non_core)

    def ties_between_nodes(self) -> int:
        return sum(self.g.ties_with(c, self.non_core) for c in self.core)

    def cliqueness(self) -> float:
        size = len(self.core) * self.max_core_node_edges()
        return self.ties_between_nodes() / size if size > 0 else 1.0

    def compute_score(self, p: SearchProblem, num_types: int) -> float:
        if not self.core or not self.non_core:
            return -1.0
        score = math.log(len(self.core) + 1.0)
        counts = [0] * (num_types + 1)
        for n in self.non_core:
            counts[self.g.type_id(n)] += 1
        score += sum(math.log(c + 1.0) for c in counts)
        cl = self.cliqueness()
        score += cl * p.alpha
        if p.global_thresh is not None:
            score *= 1.0 if cl >= p.global_thresh else 0.0
        if p.local_thresh is not None and p.local_thresh > 0.0:
            need = math.ceil(p.local_thresh * self.max_core_node_edges())
            ok = all(
                self.g.ties_with(c, self.non_core) >= need for c in self.core
            )
            score *= 1.0 if ok else 0.0
        return score

    def neighborhood(self) -> dict[int, int]:
        """Adjacent non-member nodes → tie counts (candidate.rs:558-595)."""
        nbr: dict[int, int] = {}
        members = self.core | self.non_core
        for node in members:
            opposite = self.non_core if self.g.is_core(node) else self.core
            for target, _ in self.g.adj.get(node, ()):
                if target not in opposite:
                    nbr[target] = nbr.get(target, 0) + 1
        for node in members:
            nbr.pop(node, None)
        return nbr

    def expand_with(self, node_id: int) -> "Candidate":
        c = Candidate(self.g, self.core, self.non_core)
        (c.core if self.g.is_core(node_id) else c.non_core).add(node_id)
        return c


def _random_walk(rng: random.Random, g: TypedLocalGraph, root: int, steps: int) -> int:
    cur = root
    for _ in range(steps):
        edges = g.adj.get(cur)
        if not edges:
            break
        cur = rng.choice(edges)[0]
    return cur


def beam_search(
    g: TypedLocalGraph,
    p: SearchProblem,
    graph_id: int,
    num_types: int,
    seed_members: list[tuple[int, bool]] | None = None,
) -> Candidate | None:
    """Returns the top candidate, or None on an empty graph."""
    if not g.core_ids or not g.non_core_ids:
        return None
    rng = random.Random(graph_id)
    candidates: list[Candidate] = []
    if seed_members:
        init = Candidate(g)
        for node_id, is_core in seed_members:
            if node_id in g.adj:
                (init.core if is_core else init.non_core).add(node_id)
        if init.core or init.non_core:
            init.score = init.compute_score(p, num_types)
            candidates.append(init)
    while len(candidates) < p.beam_size:
        ids = g.non_core_ids if rng.random() <= 0.5 else g.core_ids
        root = rng.choice(ids)
        node = _random_walk(rng, g, root, 7)
        c = Candidate(
            g,
            core=[node] if g.is_core(node) else [],
            non_core=[] if g.is_core(node) else [node],
        )
        c.score = c.compute_score(p, num_types)
        candidates.append(c)

    visited: set[int] = set()
    prior_score = -2.0
    repeats = 0
    top = candidates[0]
    for _epoch in range(max(p.num_epochs, 1)):
        by_checksum: dict[int, Candidate] = {}
        can_continue = False
        for cand in candidates:
            if cand.checksum not in visited:
                can_continue = True
                nbr = cand.neighborhood()
                # top num_to_search by (ties desc, id asc)
                picks = sorted(nbr.items(), key=lambda kv: (-kv[1], kv[0]))[
                    : p.num_to_search
                ]
                visited.add(cand.checksum)
                for node_id, _ties in picks:
                    ell = cand.expand_with(node_id)
                    if ell.checksum in visited:
                        continue
                    ell.score = ell.compute_score(p, num_types)
                    by_checksum[ell.checksum] = ell
            by_checksum[cand.checksum] = cand
        ranked = sorted(
            by_checksum.values(), key=lambda c: (c.score, c.checksum), reverse=True
        )
        candidates = ranked[: p.beam_size]
        top = candidates[0]
        if not can_continue:
            break
        score = top.score
        if abs(score - prior_score) <= 1e-9:
            repeats += 1
        else:
            repeats = 0
        if repeats == p.max_repeated_prior_scores:
            break
        prior_score = score
    return top


TYPED_SCHEMA = (
    f"{GRAPH_ID} long, core_id long, non_core_id long, "
    "core_type string, edge_type string, non_core_type string"
)

RESULT_SCHEMA = (
    f"{GRAPH_ID} long, core_ids array<long>, non_core_ids array<long>, "
    "score double, cliqueness double"
)

DETAILED_SCHEMA = (
    RESULT_SCHEMA
    + ", non_core_types array<string>, core_densities array<double>, "
    "non_core_densities array<double>"
)


def candidate_densities(top: "Candidate", num_types: int) -> tuple[list, list]:
    """Per-core and per-type densities (candidate.rs:626-667)."""
    g = top.g
    max_size = sum(g.max_edge_count(n) for n in top.non_core)
    core_densities = [
        g.ties_with(c, top.non_core) / max_size if max_size else 0.0
        for c in sorted(top.core)
    ]
    max_counts = [0] * (num_types + 1)
    out_counts = [0] * (num_types + 1)
    for n in top.non_core:
        t = g.type_id(n)
        max_counts[t] += g.max_edge_count(n) * len(top.core)
        out_counts[t] += g.ties_with(n, top.core)
    non_core_densities = [
        out_counts[i] / max_counts[i] if max_counts[i] else float("nan")
        for i in range(1, num_types + 1)
    ]
    return core_densities, non_core_densities


def _apply_with_seeds(
    typed_edges: DataFrame,
    seeds: DataFrame | None,
    run_one,
    schema: str,
) -> DataFrame:
    """Run a per-graph kernel with optional distributed seed rows.

    With seeds, cogroup ships each graph's seed rows to the same task
    as its edges (no driver-side collect — unbounded graph counts would
    otherwise accumulate in driver memory)."""
    if seeds is None:
        return typed_edges.groupBy(GRAPH_ID).applyInPandas(
            lambda pdf: run_one(pdf, None), schema=schema
        )

    def fn_cogroup(edges_pdf: pd.DataFrame, seeds_pdf: pd.DataFrame) -> pd.DataFrame:
        seed_rows = (
            list(
                zip(
                    seeds_pdf["node_id"].astype("int64").map(int),
                    seeds_pdf["is_core"].map(bool),
                )
            )
            if not seeds_pdf.empty
            else None
        )
        return run_one(edges_pdf, seed_rows)

    return (
        typed_edges.groupBy(GRAPH_ID)
        .cogroup(seeds.groupBy(GRAPH_ID))
        .applyInPandas(fn_cogroup, schema=schema)
    )


def mine_cliques(
    typed_edges: DataFrame,
    typespec: list[list[str]],
    core_type: str,
    non_core_types: list[str] | None = None,
    problem: SearchProblem | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Distributed entry point: one beam search per graph_id group.

    ``typed_edges``: [graph_id, core_id, non_core_id, core_type,
    edge_type, non_core_type] (the reference's 6-col TSV,
    typed_graph_line_processor.rs:28-43).  ``seeds``: optional
    [graph_id, node_id, is_core] prior-clique rows.
    """
    p = problem or SearchProblem()
    ncts = non_core_types or sorted({row[2] for row in typespec})
    tinfo = process_typespec(typespec, core_type, ncts)
    num_types = len(ncts)

    cols = [GRAPH_ID, "core_ids", "non_core_ids", "score", "cliqueness"]

    def run_one(
        pdf: pd.DataFrame, seed_rows: list[tuple[int, bool]] | None
    ) -> pd.DataFrame:
        if pdf.empty:  # seed rows for a graph with no edges
            return pd.DataFrame(columns=cols)
        gid = int(pdf[GRAPH_ID].iloc[0])
        rows = list(
            zip(
                pdf["core_id"].astype("int64"),
                pdf["non_core_id"].astype("int64"),
                pdf["core_type"],
                pdf["edge_type"],
                pdf["non_core_type"],
            )
        )
        g = TypedLocalGraph.from_rows(rows, core_type, tinfo, p.min_degree)
        top = beam_search(g, p, gid, num_types, seed_rows)
        if top is None:
            return pd.DataFrame(columns=cols)
        return pd.DataFrame(
            {
                GRAPH_ID: [gid],
                "core_ids": [sorted(top.core)],
                "non_core_ids": [sorted(top.non_core)],
                "score": [float(top.score)],
                "cliqueness": [float(top.cliqueness())],
            }
        )

    return _apply_with_seeds(typed_edges, seeds, run_one, RESULT_SCHEMA)


def mine_cliques_detailed(
    typed_edges: DataFrame,
    typespec: list[list[str]],
    core_type: str,
    non_core_types: list[str] | None = None,
    problem: SearchProblem | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Like :func:`mine_cliques` but with the wide-row fields the
    reference prints (types + densities, candidate.rs:264-304)."""
    p = problem or SearchProblem()
    ncts = non_core_types or sorted({row[2] for row in typespec})
    tinfo = process_typespec(typespec, core_type, ncts)
    num_types = len(ncts)

    cols = [
        GRAPH_ID, "core_ids", "non_core_ids", "score", "cliqueness",
        "non_core_types", "core_densities", "non_core_densities",
    ]

    def run_one(
        pdf: pd.DataFrame, seed_rows: list[tuple[int, bool]] | None
    ) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        gid = int(pdf[GRAPH_ID].iloc[0])
        rows = list(
            zip(
                pdf["core_id"].astype("int64"),
                pdf["non_core_id"].astype("int64"),
                pdf["core_type"],
                pdf["edge_type"],
                pdf["non_core_type"],
            )
        )
        g = TypedLocalGraph.from_rows(rows, core_type, tinfo, p.min_degree)
        top = beam_search(g, p, gid, num_types, seed_rows)
        if top is None:
            return pd.DataFrame(columns=cols)
        cd, ncd = candidate_densities(top, num_types)
        return pd.DataFrame(
            {
                GRAPH_ID: [gid],
                "core_ids": [sorted(top.core)],
                "non_core_ids": [sorted(top.non_core)],
                "score": [float(top.score)],
                "cliqueness": [float(top.cliqueness())],
                "non_core_types": [
                    [g.non_core_type_of[n] for n in sorted(top.non_core)]
                ],
                "core_densities": [cd],
                "non_core_densities": [ncd],
            }
        )

    return _apply_with_seeds(typed_edges, seeds, run_one, DETAILED_SCHEMA)
