"""Per-graph sequential kernels (numpy / pure python).

These implement the reference's inherently-sequential algorithms for
fixture-scale graphs; at engine level they run inside
``groupBy(graph_id).applyInPandas`` (one group = one graph = one Arrow
batch), never on the driver for real data.

Each kernel takes an undirected edge list as a list of (u, v) int
pairs (deduplicated or not — they dedup internally) and returns plain
python structures.

Cited reference semantics:
- evcent:  /root/reference/src/dachshund/algorithms/eigenvector_centrality.rs:16-37
- Fiedler: /root/reference/src/dachshund/algorithms/algebraic_connectivity.rs:14-20
- betweenness (both): /root/reference/src/dachshund/algorithms/betweenness.rs:17-93
- shortest paths + enumeration: /root/reference/src/dachshund/algorithms/shortest_paths.rs:15-169
- CNM: /root/reference/src/dachshund/algorithms/cnm_communities.rs:79-281
- featurizer stats: /root/reference/src/dachshund/simple_transformer.rs:41-83
"""

from __future__ import annotations

import heapq
import random
from collections import deque

import numpy as np


def _adj(edges) -> dict[int, set[int]]:
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        u, v = int(u), int(v)
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


# --------------------------------------------------------------- evcent
def evcent_kernel(edges, eps: float = 0.001, max_iter: int = 1000) -> dict[int, float]:
    """Power iteration, max-normalized, L1 stopping rule — the exact
    loop of the reference (x0 = zeros, x1 = 1/n, x1 = x0·A / max)."""
    adj = _adj(edges)
    ids = sorted(adj)
    n = len(ids)
    if n == 0:
        return {}
    idx = {v: i for i, v in enumerate(ids)}
    a = np.zeros((n, n))
    for u, nbrs in adj.items():
        for v in nbrs:
            a[idx[u], idx[v]] = 1.0
    x0 = np.zeros(n)
    x1 = np.full(n, 1.0 / n)
    it = 0
    while np.abs(x0 - x1).sum() > eps and it < max_iter:
        x0 = x1
        x1 = x0 @ a
        x1 = x1 / x1.max()
        it += 1
    return {ids[i]: float(x1[i]) for i in range(n)}


# --------------------------------------------------------------- fiedler
def fiedler_kernel(edges) -> float:
    """Second-smallest eigenvalue of the combinatorial Laplacian."""
    adj = _adj(edges)
    ids = sorted(adj)
    n = len(ids)
    idx = {v: i for i, v in enumerate(ids)}
    lap = np.zeros((n, n))
    for u, nbrs in adj.items():
        lap[idx[u], idx[u]] = len(nbrs)
        for v in nbrs:
            lap[idx[u], idx[v]] = -1.0
    vals = np.linalg.eigvalsh(lap)
    return float(sorted(vals)[1]) if n >= 2 else 0.0


# ------------------------------------------------------------------ BFS
def bfs_kernel(adj: dict[int, set[int]], source: int):
    """Level BFS with all tie predecessors and path counts.

    Returns (order, dist, sigma, preds) — order is exploration order.
    """
    dist = {source: 0}
    sigma = {source: 1}
    preds: dict[int, list[int]] = {source: []}
    order = [source]
    q = deque([source])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                sigma[v] = 0
                preds[v] = []
                order.append(v)
                q.append(v)
            if dist[v] == dist[u] + 1:
                sigma[v] += sigma[u]
                preds[v].append(u)
    return order, dist, sigma, preds


def enumerate_paths_kernel(edges, source: int) -> dict[int, list[list[int]]]:
    """All shortest paths from source to every reachable node, walking
    predecessors in distance order (reference shortest_paths.rs:138-169).
    Source's own path list is [[source]]."""
    adj = _adj(edges)
    if source not in adj:
        return {source: [[source]]}
    _, dist, _, preds = bfs_kernel(adj, source)
    paths: dict[int, list[list[int]]] = {source: [[source]]}
    for v in sorted(dist, key=lambda x: dist[x]):
        if v == source:
            continue
        out: list[list[int]] = []
        for p in preds[v]:
            out.extend(path + [v] for path in paths[p])
        paths[v] = out
    return paths


# ------------------------------------------------------------ betweenness
def betweenness_naive_kernel(edges, sources=None) -> dict[int, float]:
    """Path-enumeration betweenness: every shortest path contributes
    0.5/|paths(target)| to each interior vertex (betweenness.rs:17-52)."""
    adj = _adj(edges)
    ids = sorted(adj)
    counts = {v: 0.0 for v in ids}
    for s in sources if sources is not None else ids:
        all_paths = enumerate_paths_kernel(edges, s)
        for target, paths in all_paths.items():
            if not paths:
                continue
            w = 0.5 / len(paths)
            for path in paths:
                for v in path[1:-1]:
                    counts[v] += w
    return counts


def betweenness_brandes_kernel(edges, sources=None) -> dict[int, float]:
    """Brandes with the reference's 0.5 undirected halving folded into
    the dependency accumulation (betweenness.rs:54-93)."""
    adj = _adj(edges)
    ids = sorted(adj)
    bet = {v: 0.0 for v in ids}
    for s in sources if sources is not None else ids:
        order, dist, sigma, preds = bfs_kernel(adj, s)
        dep = {v: 0.0 for v in ids}
        for w in reversed(order):
            for p in preds[w]:
                dep[p] += (0.5 + dep[w]) * (sigma[p] / sigma[w])
            if w != s:
                bet[w] += dep[w]
    return bet


# ------------------------------------------------------------------- CNM
def cnm_kernel(edges):
    """Clauset-Newman-Moore greedy modularity with the reference's
    deterministic tie-break (max ΔQ, then smallest i, then smallest j)
    and merge bookkeeping (cnm_communities.rs:79-281).

    Returns (communities: dict[community_id, set[node]],
             modularity_changes: list[float]).
    """
    adj = _adj(edges)
    ids = sorted(adj)
    n = len(ids)
    if n == 0:
        return {}, []
    # community index = rank of node id
    deg = {i: len(adj[ids[i]]) for i in range(n)}
    m = sum(deg.values()) // 2
    communities: dict[int, set[int]] = {i: {ids[i]} for i in range(n)}
    if m == 0:
        return communities, []
    idx = {v: i for i, v in enumerate(ids)}

    q0 = 1.0 / m
    bmap: dict[int, dict[int, float]] = {i: {} for i in range(n)}
    heaps: dict[int, list] = {i: [] for i in range(n)}
    for i in range(n):
        for nb in adj[ids[i]]:
            j = idx[nb]
            dq = q0 - 2.0 * (deg[i] * deg[j]) / float((2 * m) ** 2)
            bmap[i][j] = dq
            # min-heap on (-dq, i, j) == reference max-heap ordering
            heapq.heappush(heaps[i], (-dq, i, j))

    def maxh_top():
        best = None
        for i, h in heaps.items():
            if h and (best is None or h[0] < best):
                best = h[0]
        return best

    top = maxh_top()
    if top is None:
        return communities, []
    modularity_changes = [-top[0]]

    while True:
        top = maxh_top()
        if top is None or -top[0] <= 0.0:
            break
        _, i, j = top
        heapq.heappop(heaps[i])
        communities[j] |= communities.pop(i)

        neighbors_i = bmap.pop(i)
        neighbors_j = bmap.pop(j)
        all_neighbors = (set(neighbors_i) | set(neighbors_j)) - {i, j}

        new_jk: dict[int, float] = {}
        new_heap_j: list = []
        for k in all_neighbors:
            qik = neighbors_i.get(k)
            qjk = neighbors_j.get(k)
            if qik is not None and qjk is not None:
                ndq = qik + qjk
            elif qik is not None:
                ndq = qik - (deg[j] / m) * (deg[k] / (2 * m))
            else:
                ndq = qjk - (deg[i] / m) * (deg[k] / (2 * m))
            new_jk[k] = ndq

            nk = bmap[k]
            nk.pop(i, None)
            nk[j] = ndq
            rebuilt = []
            for negdq, kk, ll in sorted(heaps[k]):
                if ll == i:
                    continue
                if ll == j:
                    rebuilt.append((-ndq, kk, ll))
                else:
                    rebuilt.append((negdq, kk, ll))
            heapq.heapify(rebuilt)
            heaps[k] = rebuilt
            heapq.heappush(new_heap_j, (-ndq, j, k))

        bmap[j] = new_jk
        heaps[j] = new_heap_j
        heaps.pop(i, None)
        deg[j] = deg[i] + deg[j]
        deg.pop(i)

        nxt = maxh_top()
        if nxt is not None:
            modularity_changes.append(-nxt[0])

    return communities, modularity_changes


# ----------------------------------------------------------- components
def components_kernel(edges) -> list[set[int]]:
    """Connected components ordered by smallest member id
    (connected_components.rs:20-82)."""
    adj = _adj(edges)
    seen: set[int] = set()
    comps = []
    for v in sorted(adj):
        if v in seen:
            continue
        comp = set()
        q = deque([v])
        seen.add(v)
        while q:
            u = q.popleft()
            comp.add(u)
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    q.append(w)
        comps.append(comp)
    return comps


def k_core_kernel(edges, k: int) -> list[set[int]]:
    """Peel then return components of the survivors (coreness.rs:18-51)."""
    adj = {u: set(nb) for u, nb in _adj(edges).items()}
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for w in adj[v]:
                    adj[w].discard(v)
                del adj[v]
                changed = True
    surviving = [(u, v) for u, nbrs in adj.items() for v in nbrs if u < v]
    return components_kernel(surviving) if surviving else []


def k_truss_kernel(edges, k: int) -> list[set[int]]:
    """Edge-support peel on the (k-1)-core; returns truss node sets
    (coreness.rs:74-156)."""
    cores = k_core_kernel(edges, k - 1)
    keep_nodes = set().union(*cores) if cores else set()
    cur = {
        (min(u, v), max(u, v))
        for u, v in _edges_set(edges)
        if u in keep_nodes and v in keep_nodes
    }
    while True:
        adj = _adj(cur)
        drop = {
            (u, v)
            for u, v in cur
            if len(adj.get(u, set()) & adj.get(v, set())) < k - 2
        }
        if not drop:
            break
        cur -= drop
    if not cur:
        return []
    return components_kernel(list(cur))


def _edges_set(edges) -> set[tuple[int, int]]:
    out = set()
    for u, v in edges:
        u, v = int(u), int(v)
        if u != v:
            out.add((min(u, v), max(u, v)))
    return out


def clustering_avg_kernel(edges) -> float:
    adj = _adj(edges)
    coefs = []
    for v, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            continue
        ties = sum(len(adj[u] & nbrs) for u in nbrs)
        coefs.append(ties / (d * (d - 1)))
    return sum(coefs) / len(coefs) if coefs else 0.0


# ------------------------------------------------- dense matrices (G19-21)
def adjacency_matrix_kernel(edges):
    """Dense adjacency (multi-edge weighted, adjacency_matrix.rs:15-40).
    Returns (matrix, sorted node ids). Fixture-scale only — at engine
    level the edge DataFrame *is* the (sparse) matrix."""
    ids = sorted(_adj(edges))
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    a = np.zeros((n, n))
    for u, v in _edges_set(edges):
        a[idx[u], idx[v]] += 1.0
        a[idx[v], idx[u]] += 1.0
    return a, ids


def degree_matrix_kernel(edges):
    a, ids = adjacency_matrix_kernel(edges)
    return np.diag(a.sum(axis=1)), ids


def laplacian_kernel(edges):
    """L = D − A (laplacian.rs:15-30)."""
    a, ids = adjacency_matrix_kernel(edges)
    return np.diag(a.sum(axis=1)) - a, ids


# ------------------------------------------- seeded approximations (G10)
def approx_transitivity_kernel(edges, samples: int, seed: int = 42) -> float:
    """Wedge sampling: centers weighted by triples count, success =
    closing edge exists (transitivity.rs:52-87). The reference uses
    thread_rng (nondeterministic, SURVEY.md X9); ours is seeded."""
    adj = _adj(edges)
    centers = [v for v in sorted(adj) if len(adj[v]) >= 2]
    if not centers:
        return 0.0
    weights = [len(adj[v]) * (len(adj[v]) - 1) / 2 for v in centers]
    rng = random.Random(seed)
    hits = 0
    for _ in range(samples):
        v = rng.choices(centers, weights=weights)[0]
        a, b = rng.sample(sorted(adj[v]), 2)
        hits += b in adj[a]
    return hits / samples


def approx_avg_clustering_kernel(edges, samples: int, seed: int = 42) -> float:
    """Uniformly sampled nodes' local coefficients averaged
    (clustering.rs:48-79), seeded."""
    adj = _adj(edges)
    eligible = [v for v in sorted(adj) if len(adj[v]) >= 2]
    if not eligible:
        return 0.0
    rng = random.Random(seed)
    total = 0.0
    for _ in range(samples):
        v = rng.choice(eligible)
        nbrs = adj[v]
        d = len(nbrs)
        ties = sum(len(adj[u] & nbrs) for u in nbrs)
        total += ties / (d * (d - 1))
    return total / samples


# ------------------------------------------------------------ featurizer
def floor3(x: float) -> float:
    import math

    return math.floor(x * 1000.0) / 1000.0


def featurize_kernel(edges, seed: int = 0, max_sources: int = 100) -> dict:
    """Per-graph stats JSON fields (simple_transformer.rs:41-83).

    The reference samples betweenness sources with thread_rng
    (nondeterministic); we sample with a seed derived from the graph so
    output is reproducible (SURVEY.md §2.8 X9 note).
    """
    es = _edges_set(edges)
    comps = components_kernel(list(es))
    largest = max(comps, key=len) if comps else set()
    rng = random.Random(seed)
    src_pool = sorted(largest)
    sources = (
        src_pool if len(src_pool) <= max_sources else rng.sample(src_pool, max_sources)
    )
    sub = [(u, v) for u, v in es if u in largest and v in largest]
    bet = betweenness_brandes_kernel(sub, sources=sources) if sub else {}
    ev = evcent_kernel(list(es), 0.001, 1000)
    return {
        "num_edges": len(es),
        "num_2_cores": len(k_core_kernel(list(es), 2)),
        "num_4_cores": len(k_core_kernel(list(es), 4)),
        "num_8_cores": len(k_core_kernel(list(es), 8)),
        "num_16_cores": len(k_core_kernel(list(es), 16)),
        "num_3_trusses": len(k_truss_kernel(list(es), 3)),
        "num_5_trusses": len(k_truss_kernel(list(es), 5)),
        "num_9_trusses": len(k_truss_kernel(list(es), 9)),
        "num_17_trusses": len(k_truss_kernel(list(es), 17)),
        "num_connected_components": len(comps),
        "size_of_largest_cc": len(largest),
        "bet_cent": floor3(sum(bet.values()) / len(bet)) if bet else 0.0,
        "evcent": floor3(sum(ev.values()) / len(ev)) if ev else 0.0,
        "clust_coef": floor3(clustering_avg_kernel(list(es))),
    }
