"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship PageRank query at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents; iterative
algorithms (CC / PageRank / LPA) are expressed as *unrolled* superstep
CTE chains that exactly mirror the Spark semantics at a fixed superstep
count on the derived graph (dense, diameter ≤ 3, so fixpoints are
reached well within the unroll budget).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from dachshund_spark.derived import EDGES_SQL, N_NODES, derived_graph, load_table
from dachshund_spark.graph import LinkGraph

DAMPING = 0.85
PAGERANK_ITERS = 10
CC_ITERS = 10
LPA_ITERS = 5

# ---------------------------------------------------------------------------
# shared SQL building blocks (DuckDB dialect, ANSI)
# ---------------------------------------------------------------------------
SQL_E = f"edges_raw AS MATERIALIZED ({EDGES_SQL})"
SQL_D = "d_edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges_raw)"
SQL_U = (
    "und AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
    "(SELECT src, dst FROM edges_raw UNION ALL SELECT dst AS src, src AS dst FROM edges_raw))"
)
SQL_N = "nodes AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM und)"
SQL_CANON = "canon AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst)"
SQL_DEG = "deg AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS degree FROM und GROUP BY src)"
SQL_TRI = (
    "tri AS MATERIALIZED (SELECT a.src AS u, a.dst AS v, b.dst AS w "
    "FROM canon a JOIN canon b ON a.dst = b.src "
    "JOIN canon c ON c.src = a.src AND c.dst = b.dst)"
)
SQL_TRIC = (
    "pn AS MATERIALIZED (SELECT u AS node_id FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri), "
    "tric AS MATERIALIZED (SELECT n.node_id, COALESCE(t.triangles, 0) AS triangles FROM nodes n "
    "LEFT JOIN (SELECT node_id, COUNT(*) AS triangles FROM pn GROUP BY node_id) t "
    "ON n.node_id = t.node_id)"
)
MD5L = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"
_E8LN = "CAST(ROUND(LN(CAST({x} AS DOUBLE)) * 100000000, 0) AS BIGINT)"


def _cc_sql(iters: int = CC_ITERS) -> str:
    parts = [SQL_E, SQL_U, SQL_N, "l0 AS MATERIALIZED (SELECT node_id, node_id AS label FROM nodes)"]
    for i in range(1, iters + 1):
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT n.node_id, "
            f"CASE WHEN m.minl IS NULL OR n.label <= m.minl THEN n.label ELSE m.minl END AS label "
            f"FROM l{i-1} n LEFT JOIN ("
            f"SELECT u.dst AS node_id, MIN(l.label) AS minl "
            f"FROM und u JOIN l{i-1} l ON u.src = l.node_id GROUP BY u.dst) m "
            f"ON n.node_id = m.node_id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, label AS component, "
        f"CAST(DENSE_RANK() OVER (ORDER BY label) - 1 AS BIGINT) AS component_id "
        f"FROM l{iters}"
    )


def _pagerank_sql(iters: int = PAGERANK_ITERS, d: float = DAMPING) -> str:
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        SQL_D,
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "outdeg AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS od FROM d_edges GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT node_id, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"dang{i} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS dm FROM r{i} r "
            f"LEFT JOIN outdeg o ON r.node_id = o.node_id WHERE o.node_id IS NULL)"
        )
        parts.append(
            f"r{i+1} AS MATERIALIZED (SELECT n.node_id, "
            f"(1.0 - {d!r}) / (SELECT n FROM nn) + {d!r} * ("
            f"COALESCE(c.contrib, 0.0) + (SELECT dm FROM dang{i}) / (SELECT n FROM nn)"
            f") AS rank "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node_id, SUM(r.rank / o.od) AS contrib "
            f"FROM d_edges e JOIN r{i} r ON e.src = r.node_id "
            f"JOIN outdeg o ON e.src = o.node_id GROUP BY e.dst) c "
            f"ON n.node_id = c.node_id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, ROUND(rank, 8) AS pagerank FROM r{iters}"
    )


def _pagerank_weighted_sql(
    iters: int = PAGERANK_ITERS, d: float = DAMPING, wedges_body: str | None = None
) -> str:
    """Weighted PageRank unrolled: contribution = (rank / Σw(out)) · w
    — the expression tree mirrors the Spark side exactly (state-side
    division, edge-side multiply) for bit-stable double parity.
    ``wedges_body`` overrides the weighted-edge CTE body (same
    [src, dst, wt] shape) for variant weightings."""
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        SQL_D,
        "wedges AS MATERIALIZED ("
        + (
            wedges_body
            or "SELECT src, dst, CAST((src + dst) % 5 + 1 AS DOUBLE) AS wt FROM d_edges"
        )
        + ")",
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "outw AS MATERIALIZED (SELECT src AS node_id, SUM(wt) AS ow FROM wedges GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT node_id, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"dang{i} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS dm FROM r{i} r "
            f"LEFT JOIN outw o ON r.node_id = o.node_id WHERE o.node_id IS NULL)"
        )
        parts.append(
            f"r{i+1} AS MATERIALIZED (SELECT n.node_id, "
            f"(1.0 - {d!r}) / (SELECT n FROM nn) + {d!r} * ("
            f"COALESCE(c.contrib, 0.0) + (SELECT dm FROM dang{i}) / (SELECT n FROM nn)"
            f") AS rank "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node_id, SUM((r.rank / o.ow) * e.wt) AS contrib "
            f"FROM wedges e JOIN r{i} r ON e.src = r.node_id "
            f"JOIN outw o ON e.src = o.node_id GROUP BY e.dst) c "
            f"ON n.node_id = c.node_id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, ROUND(rank, 8) AS pagerank FROM r{iters}"
    )


def _walks_sql(
    walk_length: int = 6, walks_per_node: int = 2, seed: int = 0, max_node: int = 64
) -> str:
    """Deterministic random walks replayed step by step: the pick out
    of node v at step t is md5(seed#start#widx#t#v) % degree over the
    ascending-dst ranked adjacency — every subgraph node has degree ≥ 1
    so no stuck-walk branch is needed here."""
    md5pick = (
        f"CAST(('0x' || substr(md5('{seed}#' || CAST(s.start_node AS VARCHAR) || '#' || "
        "CAST(s.walk_idx AS VARCHAR) || '#' || '{t}' || '#' || CAST(s.cur AS VARCHAR)), 1, 15)) AS BIGINT)"
    )
    parts = [
        SQL_E,
        f"sube AS MATERIALIZED (SELECT src, dst FROM edges_raw WHERE src < {max_node} AND dst < {max_node})",
        "sub AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM sube UNION ALL SELECT dst AS src, src AS dst FROM sube) "
        "WHERE src <> dst)",
        "subn AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM sub)",
        "radj AS MATERIALIZED (SELECT src, dst, "
        "ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn, "
        "COUNT(*) OVER (PARTITION BY src) AS degree FROM sub)",
        f"w0 AS MATERIALIZED (SELECT node_id AS start_node, "
        f"CAST(unnest(range({walks_per_node})) AS BIGINT) AS walk_idx, "
        f"node_id AS cur, CAST(node_id AS VARCHAR) AS walk FROM subn)",
    ]
    for t in range(1, walk_length):
        parts.append(
            f"w{t} AS MATERIALIZED (SELECT s.start_node, s.walk_idx, "
            f"a.dst AS cur, s.walk || '->' || CAST(a.dst AS VARCHAR) AS walk "
            f"FROM w{t-1} s JOIN radj a ON a.src = s.cur "
            f"AND a.rn = ({md5pick.format(t=t)} % a.degree) + 1)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT start_node, walk_idx, walk FROM w{walk_length - 1}"
    )


def _node2vec_sql(
    walk_length: int = 6,
    walks_per_node: int = 2,
    p: float = 4.0,
    q: float = 0.25,
    seed: int = 0,
    max_node: int = 64,
    weight_scale: int = 1000,
) -> str:
    """node2vec second-order walks replayed exactly: step t≥2 weights
    each neighbor x of cur by round(scale/p) (x == prev), scale (x
    adjacent to prev) or round(scale/q) — integer weights so the
    cumulative-sum pick is exact — and selects the first ascending-rank
    neighbor whose cumulative weight exceeds
    md5(seed#n2v#start#widx#t#prev#cur) % total_weight.  Step 1 is the
    uniform DeepWalk pick."""
    w_return = int(round(weight_scale / p))
    w_common = int(weight_scale)
    w_far = int(round(weight_scale / q))
    pick1 = (
        f"CAST(('0x' || substr(md5('{seed}#' || CAST(s.start_node AS VARCHAR) || '#' || "
        "CAST(s.walk_idx AS VARCHAR) || '#1#' || CAST(s.start_node AS VARCHAR)), 1, 15)) AS BIGINT)"
    )
    parts = [
        SQL_E,
        f"sube AS MATERIALIZED (SELECT src, dst FROM edges_raw WHERE src < {max_node} AND dst < {max_node})",
        "sub AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM sube UNION ALL SELECT dst AS src, src AS dst FROM sube) "
        "WHERE src <> dst)",
        "subn AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM sub)",
        "radj AS MATERIALIZED (SELECT src, dst, "
        "ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn, "
        "COUNT(*) OVER (PARTITION BY src) AS degree FROM sub)",
        f"st AS MATERIALIZED (SELECT node_id AS start_node, "
        f"CAST(unnest(range({walks_per_node})) AS BIGINT) AS walk_idx FROM subn)",
        f"w1 AS MATERIALIZED (SELECT s.start_node, s.walk_idx, "
        f"s.start_node AS prev, a.dst AS cur, "
        f"CAST(s.start_node AS VARCHAR) || '->' || CAST(a.dst AS VARCHAR) AS walk "
        f"FROM st s JOIN radj a ON a.src = s.start_node "
        f"AND a.rn = ({pick1} % a.degree) + 1)",
    ]
    for t in range(2, walk_length):
        thr = (
            f"CAST(('0x' || substr(md5('{seed}#n2v#' || CAST(start_node AS VARCHAR) || '#' || "
            f"CAST(walk_idx AS VARCHAR) || '#{t}#' || CAST(prev AS VARCHAR) || '#' || "
            "CAST(cur AS VARCHAR)), 1, 15)) AS BIGINT) % tot"
        )
        parts.append(
            f"c{t} AS MATERIALIZED (SELECT s.start_node, s.walk_idx, s.prev, s.cur, "
            f"s.walk, a.dst AS x, a.rn, "
            f"CASE WHEN a.dst = s.prev THEN {w_return} "
            f"WHEN EXISTS (SELECT 1 FROM sub e WHERE e.src = s.prev AND e.dst = a.dst) "
            f"THEN {w_common} ELSE {w_far} END AS w "
            f"FROM w{t-1} s JOIN radj a ON a.src = s.cur)"
        )
        parts.append(
            f"k{t} AS MATERIALIZED (SELECT *, "
            "SUM(w) OVER (PARTITION BY start_node, walk_idx ORDER BY rn "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
            f"SUM(w) OVER (PARTITION BY start_node, walk_idx) AS tot FROM c{t})"
        )
        parts.append(
            f"w{t} AS MATERIALIZED (SELECT start_node, walk_idx, cur AS prev, "
            f"x AS cur, walk || '->' || CAST(x AS VARCHAR) AS walk FROM k{t} "
            f"WHERE ({thr}) >= cum - w AND ({thr}) < cum)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT start_node, walk_idx, walk FROM w{walk_length - 1}"
    )


def _hits_sql(iters: int = 10) -> str:
    """HITS unrolled: auth from hubs over in-edges, hubs from fresh
    auths over out-edges, each max-normalized; nodes outside the
    respective edge side get 0 (mirrors the Spark coalesce)."""
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        SQL_D,
        "s0 AS MATERIALIZED (SELECT node_id, 1.0 AS hub, 1.0 AS auth FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"ar{i} AS MATERIALIZED (SELECT e.dst AS node_id, SUM(s.hub) AS auth "
            f"FROM d_edges e JOIN s{i-1} s ON e.src = s.node_id GROUP BY e.dst)"
        )
        parts.append(f"am{i} AS MATERIALIZED (SELECT MAX(auth) AS mx FROM ar{i})")
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT node_id, auth / (SELECT mx FROM am{i}) AS auth FROM ar{i})"
        )
        parts.append(
            f"hr{i} AS MATERIALIZED (SELECT e.src AS node_id, SUM(a.auth) AS hub "
            f"FROM d_edges e JOIN a{i} a ON e.dst = a.node_id GROUP BY e.src)"
        )
        parts.append(f"hm{i} AS MATERIALIZED (SELECT MAX(hub) AS mx FROM hr{i})")
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT node_id, hub / (SELECT mx FROM hm{i}) AS hub FROM hr{i})"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT n.node_id, "
            f"COALESCE(h.hub, 0.0) AS hub, COALESCE(a.auth, 0.0) AS auth "
            f"FROM nodes n LEFT JOIN h{i} h ON n.node_id = h.node_id "
            f"LEFT JOIN a{i} a ON n.node_id = a.node_id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, ROUND(hub, 8) AS hub, ROUND(auth, 8) AS auth FROM s{iters}"
    )


def _densest_sql(rounds: int = 24, eps: float = 0.5) -> str:
    """Bahmani peel unrolled: each round drops nodes with degree ≤
    2(1+ε)·(m/n); emits one history row per non-empty round.  ε=0.5
    removes ≥ 1/3 of nodes per round, so 24 rounds cover n ≤ ~2·10^4.
    Division n=0 is guarded to NULL (empty stays empty)."""
    parts = [SQL_E, SQL_U, SQL_CANON, "e0 AS MATERIALIZED (SELECT src, dst FROM canon)"]
    hists = []
    for t in range(rounds):
        parts.append(
            f"st{t} AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e{t})"
        )
        parts.append(
            f"nd{t} AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM "
            f"(SELECT DISTINCT x FROM (SELECT src AS x FROM e{t} "
            f"UNION ALL SELECT dst AS x FROM e{t})))"
        )
        hists.append(
            f"SELECT CAST({t} AS BIGINT) AS round, (SELECT n FROM nd{t}) AS n_nodes, "
            f"(SELECT m FROM st{t}) AS n_edges, "
            f"CAST((SELECT m FROM st{t}) AS DOUBLE) / (SELECT n FROM nd{t}) AS density "
            f"WHERE (SELECT m FROM st{t}) > 0"
        )
        parts.append(
            f"deg{t} AS MATERIALIZED (SELECT x, COUNT(*) AS deg FROM "
            f"(SELECT src AS x FROM e{t} UNION ALL SELECT dst AS x FROM e{t}) "
            f"GROUP BY x)"
        )
        parts.append(
            f"keep{t} AS MATERIALIZED (SELECT x FROM deg{t} WHERE deg > "
            f"2.0 * (1.0 + {eps!r}) * (CASE WHEN (SELECT n FROM nd{t}) > 0 THEN "
            f"CAST((SELECT m FROM st{t}) AS DOUBLE) / (SELECT n FROM nd{t}) END))"
        )
        parts.append(
            f"e{t+1} AS MATERIALIZED (SELECT e.src, e.dst FROM e{t} e "
            f"JOIN keep{t} a ON e.src = a.x JOIN keep{t} b ON e.dst = b.x)"
        )
    parts.append("hist AS MATERIALIZED (" + " UNION ALL ".join(hists) + ")")
    parts.append(
        "best AS MATERIALIZED (SELECT round FROM hist "
        "ORDER BY density DESC, round ASC LIMIT 1)"
    )
    return (
        "WITH " + ", ".join(parts)
        + " SELECT round, n_nodes, n_edges, ROUND(density, 8) AS density, "
        "round = (SELECT round FROM best) AS is_best FROM hist"
    )


def _salsa_sql(iters: int = 10) -> str:
    """SALSA unrolled: like HITS but contributions are degree-divided
    (hub/outdeg on the auth half-step, auth/indeg on the hub one); both
    normalizers come from the static edge table built once up front,
    mirroring the Spark fold-before-loop."""
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        SQL_D,
        "outdeg AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS od FROM d_edges GROUP BY src)",
        "indeg AS MATERIALIZED (SELECT dst AS node_id, COUNT(*) AS ind FROM d_edges GROUP BY dst)",
        "sedges AS MATERIALIZED (SELECT e.src, e.dst, o.od, i.ind FROM d_edges e "
        "JOIN outdeg o ON e.src = o.node_id JOIN indeg i ON e.dst = i.node_id)",
        "s0 AS MATERIALIZED (SELECT node_id, 1.0 AS hub, 1.0 AS auth FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"ar{i} AS MATERIALIZED (SELECT e.dst AS node_id, SUM(s.hub / e.od) AS auth "
            f"FROM sedges e JOIN s{i-1} s ON e.src = s.node_id GROUP BY e.dst)"
        )
        parts.append(f"am{i} AS MATERIALIZED (SELECT MAX(auth) AS mx FROM ar{i})")
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT node_id, auth / (SELECT mx FROM am{i}) AS auth FROM ar{i})"
        )
        parts.append(
            f"hr{i} AS MATERIALIZED (SELECT e.src AS node_id, SUM(a.auth / e.ind) AS hub "
            f"FROM sedges e JOIN a{i} a ON e.dst = a.node_id GROUP BY e.src)"
        )
        parts.append(f"hm{i} AS MATERIALIZED (SELECT MAX(hub) AS mx FROM hr{i})")
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT node_id, hub / (SELECT mx FROM hm{i}) AS hub FROM hr{i})"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT n.node_id, "
            f"COALESCE(h.hub, 0.0) AS hub, COALESCE(a.auth, 0.0) AS auth "
            f"FROM nodes n LEFT JOIN h{i} h ON n.node_id = h.node_id "
            f"LEFT JOIN a{i} a ON n.node_id = a.node_id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, ROUND(hub, 8) AS hub, ROUND(auth, 8) AS auth FROM s{iters}"
    )


def _ppr_parts(
    seeds: tuple[int, ...], iters: int = PAGERANK_ITERS, d: float = DAMPING
) -> tuple[list, str]:
    """CTE chain for unrolled personalized PageRank (final state CTE
    name returned) — shared by the standalone oracle and composites."""
    seed_list = ", ".join(str(s) for s in seeds)
    pv = 1.0 / len(seeds)
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        SQL_D,
        f"pvec AS MATERIALIZED (SELECT node_id, CASE WHEN node_id IN ({seed_list}) "
        f"THEN {pv!r} ELSE 0.0 END AS p FROM nodes)",
        "outdeg AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS od FROM d_edges GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT node_id, p AS rank FROM pvec)",
    ]
    for i in range(iters):
        parts.append(
            f"dang{i} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS dm FROM r{i} r "
            f"LEFT JOIN outdeg o ON r.node_id = o.node_id WHERE o.node_id IS NULL)"
        )
        parts.append(
            f"r{i+1} AS MATERIALIZED (SELECT n.node_id, "
            f"(1.0 - {d!r}) * pv.p + {d!r} * ("
            f"COALESCE(c.contrib, 0.0) + (SELECT dm FROM dang{i}) * pv.p"
            f") AS rank "
            f"FROM nodes n JOIN pvec pv ON n.node_id = pv.node_id "
            f"LEFT JOIN ("
            f"SELECT e.dst AS node_id, SUM(r.rank / o.od) AS contrib "
            f"FROM d_edges e JOIN r{i} r ON e.src = r.node_id "
            f"JOIN outdeg o ON e.src = o.node_id GROUP BY e.dst) c "
            f"ON n.node_id = c.node_id)"
        )
    return parts, f"r{iters}"


def _ppr_sql(
    seeds: tuple[int, ...], iters: int = PAGERANK_ITERS, d: float = DAMPING
) -> str:
    parts, final = _ppr_parts(seeds, iters, d)
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, ROUND(rank, 8) AS pagerank FROM {final}"
    )


def _kcore_sql(k: int, rounds: int = 8) -> str:
    parts = [SQL_E, SQL_U, "p0 AS MATERIALIZED (SELECT src, dst FROM und)"]
    for i in range(rounds):
        parts.append(
            f"bad{i} AS MATERIALIZED (SELECT src FROM "
            f"(SELECT src, COUNT(*) AS c FROM p{i} GROUP BY src) t WHERE c < {k})"
        )
        parts.append(
            f"p{i+1} AS MATERIALIZED (SELECT e.src, e.dst FROM p{i} e "
            f"WHERE e.src NOT IN (SELECT src FROM bad{i}) "
            f"AND e.dst NOT IN (SELECT src FROM bad{i}))"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT DISTINCT src AS node_id FROM p{rounds}"
    )


SQL_WUND = (
    "wund AS MATERIALIZED (SELECT src, dst, "
    "CAST((src + dst) % 5 + 1 AS DOUBLE) AS wt FROM und)"
)


def _weighted_kcore_sql(k: float, rounds: int = 8) -> str:
    """Strength peel unrolled: each round removes nodes whose incident
    weight sum is < k and their edges (both sides)."""
    parts = [SQL_E, SQL_U, SQL_WUND, "q0 AS MATERIALIZED (SELECT src, dst, wt FROM wund)"]
    for i in range(rounds):
        parts.append(
            f"wbad{i} AS MATERIALIZED (SELECT src FROM "
            f"(SELECT src, SUM(wt) AS s FROM q{i} GROUP BY src) t WHERE s < {k})"
        )
        parts.append(
            f"q{i+1} AS MATERIALIZED (SELECT e.src, e.dst, e.wt FROM q{i} e "
            f"WHERE e.src NOT IN (SELECT src FROM wbad{i}) "
            f"AND e.dst NOT IN (SELECT src FROM wbad{i}))"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT src AS node_id, CAST(SUM(wt) AS BIGINT) AS strength "
        f"FROM q{rounds} GROUP BY src"
    )


_WEIGHTED_CLUSTERING_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_CANON}, {SQL_TRI}, {SQL_WUND}, "
    "wcanon AS MATERIALIZED (SELECT src, dst, wt FROM wund WHERE src < dst), "
    "wstats AS MATERIALIZED (SELECT src AS node_id, SUM(wt) AS strength, "
    "COUNT(*) AS degree FROM wund GROUP BY src), "
    "wtri AS MATERIALIZED (SELECT t.u, t.v, t.w, ab.wt AS w_ab, ac.wt AS w_ac, "
    "bc.wt AS w_bc FROM tri t "
    "JOIN wcanon ab ON ab.src = t.u AND ab.dst = t.v "
    "JOIN wcanon ac ON ac.src = t.u AND ac.dst = t.w "
    "JOIN wcanon bc ON bc.src = t.v AND bc.dst = t.w), "
    "pnc AS MATERIALIZED (SELECT u AS node_id, (w_ab + w_ac) AS c FROM wtri "
    "UNION ALL SELECT v, (w_ab + w_bc) FROM wtri "
    "UNION ALL SELECT w, (w_ac + w_bc) FROM wtri), "
    "tw AS MATERIALIZED (SELECT node_id, SUM(c) AS tw FROM pnc GROUP BY node_id) "
    "SELECT s.node_id, CAST(s.strength AS BIGINT) AS strength, "
    "ROUND(CASE WHEN s.degree >= 2 THEN COALESCE(t.tw, 0.0) / "
    "(s.strength * (s.degree - 1)) END, 8) AS wclustering "
    "FROM wstats s LEFT JOIN tw t ON s.node_id = t.node_id"
)


def _ktruss_surv_parts(
    k: int,
    peel_rounds: int = 8,
    support_rounds: int = 5,
    max_node: int | None = None,
) -> list[str]:
    """Shared CTE chain: (k-1)-core pre-peel then per-edge support prune
    to fixpoint; survivors live in y{support_rounds} (symmetric) /
    t{support_rounds} (canonical).  ``max_node`` restricts to the
    bounded subgraph (the truss-decomposition oracle runs there)."""
    lim = (
        f" WHERE src < {max_node} AND dst < {max_node}" if max_node else ""
    )
    parts = [SQL_E, SQL_U, f"q0 AS MATERIALIZED (SELECT src, dst FROM und{lim})"]
    # (k-1)-core peel on symmetric edges
    for i in range(peel_rounds):
        parts.append(
            f"kb{i} AS MATERIALIZED (SELECT src FROM "
            f"(SELECT src, COUNT(*) AS c FROM q{i} GROUP BY src) t WHERE c < {k - 1})"
        )
        parts.append(
            f"q{i+1} AS MATERIALIZED (SELECT e.src, e.dst FROM q{i} e "
            f"WHERE e.src NOT IN (SELECT src FROM kb{i}) "
            f"AND e.dst NOT IN (SELECT src FROM kb{i}))"
        )
    base = f"q{peel_rounds}"
    parts.append(
        f"t0 AS MATERIALIZED (SELECT src, dst FROM {base} WHERE src < dst)"
    )
    parts.append(
        f"y0 AS MATERIALIZED (SELECT src, dst FROM {base})"
    )
    for i in range(support_rounds):
        parts.append(
            f"sup{i} AS MATERIALIZED (SELECT c.src, c.dst, COUNT(*) AS sup "
            f"FROM t{i} c JOIN y{i} a ON a.src = c.src "
            f"JOIN y{i} b ON b.src = c.dst AND b.dst = a.dst "
            f"GROUP BY c.src, c.dst)"
        )
        parts.append(
            f"t{i+1} AS MATERIALIZED (SELECT c.src, c.dst FROM t{i} c "
            f"LEFT JOIN sup{i} s ON c.src = s.src AND c.dst = s.dst "
            f"WHERE COALESCE(s.sup, 0) >= {k - 2})"
        )
        parts.append(
            f"y{i+1} AS MATERIALIZED (SELECT src, dst FROM t{i+1} "
            f"UNION ALL SELECT dst AS src, src AS dst FROM t{i+1})"
        )
    return parts


def _truss_edges_sql(
    k: int,
    peel_rounds: int = 8,
    support_rounds: int = 5,
    max_node: int | None = None,
) -> str:
    """Canonical edges of the k-truss — the trussness >= k edge set
    (oracle for the one-fixpoint truss decomposition)."""
    parts = _ktruss_surv_parts(k, peel_rounds, support_rounds, max_node)
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT src, dst FROM t{support_rounds}"
    )


def _ktruss_sql(k: int, peel_rounds: int = 8, support_rounds: int = 5, cc_rounds: int = 8) -> str:
    """k-truss: (k-1)-core pre-peel, per-edge common-neighbor support
    prune to fixpoint, trusses = CC over survivors (numbered by smallest
    member). Round budgets verified ≥ the synchronous fixpoint depth on
    the derived graph at sf0.001/0.01."""
    parts = _ktruss_surv_parts(k, peel_rounds, support_rounds)
    surv = f"y{support_rounds}"
    parts.append(
        f"tn AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM {surv})"
    )
    parts.append("w0 AS MATERIALIZED (SELECT node_id, node_id AS label FROM tn)")
    for i in range(cc_rounds):
        parts.append(
            f"w{i+1} AS MATERIALIZED (SELECT n.node_id, "
            f"CASE WHEN m.minl IS NULL OR n.label <= m.minl THEN n.label ELSE m.minl END AS label "
            f"FROM w{i} n LEFT JOIN ("
            f"SELECT u.dst AS node_id, MIN(l.label) AS minl "
            f"FROM {surv} u JOIN w{i} l ON u.src = l.node_id GROUP BY u.dst) m "
            f"ON n.node_id = m.node_id)"
        )
    # truss_id = min-member component label (k_truss runs CC with
    # renumber=False — the stable scale-safe id, VERDICT r2 fix #2)
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, label AS truss_id FROM w{cc_rounds}"
    )


def _coreness_sql(rounds: int = 16) -> str:
    """h-index propagation unrolled: h0 = degree; each round
    h'(v) = max over neighbor positions rn (sorted by h desc) of
    min(h, rn).  Monotone non-increasing and converged well before
    ``rounds`` on the derived graph (depth 6 at sf0.001, 14 at sf0.01),
    so the fixed unroll equals the converged coreness."""
    parts = [
        SQL_E,
        SQL_U,
        "h0 AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS h FROM und GROUP BY src)",
    ]
    for i in range(rounds):
        parts.append(
            f"h{i+1} AS MATERIALIZED (SELECT node_id, MAX(LEAST(h, rn)) AS h FROM ("
            f"SELECT u.dst AS node_id, l.h, "
            f"ROW_NUMBER() OVER (PARTITION BY u.dst ORDER BY l.h DESC) AS rn "
            f"FROM und u JOIN h{i} l ON u.src = l.node_id) GROUP BY node_id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, h AS coreness FROM h{rounds}"
    )


def _brandes_parts(levels: int = 8, max_source: int = 16, max_node: int = 64) -> list[str]:
    """Brandes unrolled: multi-source forward BFS with σ (``levels``
    rounds, ≥ the 64-node subgraph's eccentricity), then reverse-level
    dependency accumulation with the reference's 0.5 undirected
    halving.  Rounded to 6 decimals on both sides (dependency sums are
    order-dependent doubles, same policy as the pagerank oracle)."""
    parts = [
        SQL_E,
        f"sube AS MATERIALIZED (SELECT src, dst FROM edges_raw WHERE src < {max_node} AND dst < {max_node})",
        "sub AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM sube UNION ALL SELECT dst AS src, src AS dst FROM sube))",
        "subn AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM sub)",
        f"srcs AS MATERIALIZED (SELECT node_id AS s FROM subn WHERE node_id < {max_source})",
        "st0 AS MATERIALIZED (SELECT s, s AS node, 0 AS dist, CAST(1 AS DOUBLE) AS sigma FROM srcs)",
    ]
    # forward BFS: settled set st{i}, frontier n{i}
    parts.append("n0 AS MATERIALIZED (SELECT s, node, sigma FROM st0)")
    for i in range(levels):
        parts.append(
            f"n{i+1} AS MATERIALIZED (SELECT x.s, x.node, SUM(x.sigma) AS sigma FROM ("
            f"SELECT b.s, e.dst AS node, b.sigma FROM sub e JOIN n{i} b ON e.src = b.node) x "
            f"WHERE NOT EXISTS (SELECT 1 FROM st{i} t WHERE t.s = x.s AND t.node = x.node) "
            f"GROUP BY x.s, x.node)"
        )
        parts.append(
            f"st{i+1} AS MATERIALIZED (SELECT s, node, dist, sigma FROM st{i} "
            f"UNION ALL SELECT s, node, {i+1} AS dist, sigma FROM n{i+1})"
        )
    st = f"st{levels}"
    # backward accumulation: dep{lvl} = deps known for nodes at depth >= lvl
    parts.append(
        f"dep{levels+1} AS MATERIALIZED (SELECT s, node, CAST(0 AS DOUBLE) AS dep "
        f"FROM {st} WHERE FALSE)"
    )
    for lvl in range(levels, 0, -1):
        parts.append(
            f"c{lvl} AS MATERIALIZED (SELECT w.s, p.node, "
            f"SUM((0.5 + COALESCE(d.dep, 0.0)) * (p.sigma / w.sigma)) AS c "
            f"FROM sub e "
            f"JOIN {st} w ON w.node = e.dst AND w.dist = {lvl} "
            f"LEFT JOIN dep{lvl+1} d ON d.s = w.s AND d.node = w.node "
            f"JOIN {st} p ON p.s = w.s AND p.node = e.src AND p.dist = {lvl - 1} "
            f"GROUP BY w.s, p.node)"
        )
        parts.append(
            f"dep{lvl} AS MATERIALIZED (SELECT COALESCE(a.s, b.s) AS s, "
            f"COALESCE(a.node, b.node) AS node, "
            f"COALESCE(a.dep, 0.0) + COALESCE(b.c, 0.0) AS dep "
            f"FROM dep{lvl+1} a FULL JOIN c{lvl} b ON a.s = b.s AND a.node = b.node)"
        )
    return parts


def _betweenness_sql(levels: int = 8, max_source: int = 16, max_node: int = 64) -> str:
    parts = _brandes_parts(levels, max_source, max_node)
    return (
        "WITH " + ", ".join(parts)
        + " SELECT n.node_id, ROUND(COALESCE(bt.b, 0.0), 6) AS betweenness "
        "FROM subn n LEFT JOIN ("
        "SELECT node AS node_id, SUM(dep) AS b FROM dep1 WHERE node <> s "
        "GROUP BY node) bt ON n.node_id = bt.node_id"
    )


def _edge_betweenness_sql(levels: int = 8, max_source: int = 16, max_node: int = 64) -> str:
    """Edge-level Brandes: the node oracle's backward levels aggregated
    on the traversed (src, dst) edge, folded onto canonical (u, v)."""
    parts = _brandes_parts(levels, max_source, max_node)
    for lvl in range(levels, 0, -1):
        parts.append(
            f"ec{lvl} AS MATERIALIZED (SELECT e.src, e.dst, "
            f"SUM((0.5 + COALESCE(d.dep, 0.0)) * (p.sigma / w.sigma)) AS c "
            f"FROM sub e "
            f"JOIN st{levels} w ON w.node = e.dst AND w.dist = {lvl} "
            f"LEFT JOIN dep{lvl+1} d ON d.s = w.s AND d.node = w.node "
            f"JOIN st{levels} p ON p.s = w.s AND p.node = e.src "
            f"AND p.dist = {lvl - 1} GROUP BY e.src, e.dst)"
        )
    allc = " UNION ALL ".join(
        f"SELECT src, dst, c FROM ec{lvl}" for lvl in range(levels, 0, -1)
    )
    parts.append(f"eall AS MATERIALIZED ({allc})")
    parts.append(
        "escore AS MATERIALIZED (SELECT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS v, SUM(c) AS b FROM eall GROUP BY 1, 2)"
    )
    return (
        "WITH " + ", ".join(parts)
        + " SELECT c.u, c.v, ROUND(COALESCE(e.b, 0.0), 6) AS betweenness "
        "FROM (SELECT src AS u, dst AS v FROM sub WHERE src < dst) c "
        "LEFT JOIN escore e ON c.u = e.u AND c.v = e.v"
    )


def _neighborhood_parts(max_node: int = 64, levels: int = 8) -> list[str]:
    """Shared CTE chain: unrolled ball expansion on the <max_node
    subgraph, then the monotone N(t) curve (rows stop at convergence,
    matching the per-graph emission of neighborhood_function_exact)."""
    parts = [
        SQL_E,
        f"sube AS MATERIALIZED (SELECT src, dst FROM edges_raw WHERE src < {max_node} AND dst < {max_node})",
        "subsym AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM sube UNION ALL SELECT dst AS src, src AS dst FROM sube) "
        "WHERE src <> dst)",
        "b0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS m FROM subsym)",
    ]
    for i in range(levels):
        parts.append(
            f"b{i+1} AS MATERIALIZED (SELECT DISTINCT v, m FROM ("
            f"SELECT v, m FROM b{i} UNION ALL "
            f"SELECT u.src AS v, b.m FROM subsym u JOIN b{i} b ON b.v = u.dst))"
        )
    counts = " UNION ALL ".join(
        f"SELECT {t} AS distance, COUNT(*) AS n_pairs FROM b{t}"
        for t in range(levels + 1)
    )
    parts.append(f"counts AS MATERIALIZED ({counts})")
    parts.append(
        "curve AS MATERIALIZED (SELECT CAST(distance AS INTEGER) AS distance, n_pairs FROM ("
        "SELECT distance, n_pairs, LAG(n_pairs) OVER (ORDER BY distance) AS p FROM counts) t "
        "WHERE p IS NULL OR n_pairs > p)"
    )
    return parts


def _neighborhood_sql(max_node: int = 64, levels: int = 8) -> str:
    parts = _neighborhood_parts(max_node, levels)
    return "WITH " + ", ".join(parts) + " SELECT distance, n_pairs FROM curve"


def _harmonic_parts(max_node: int = 64, levels: int = 8) -> list[str]:
    """Ball chain + first-seen distances + per-level 1/d sums."""
    parts = _neighborhood_parts(max_node, levels)
    seen = " UNION ALL ".join(
        f"SELECT v, m, {t} AS lvl FROM b{t}" for t in range(levels + 1)
    )
    parts.append(
        f"pr AS MATERIALIZED (SELECT v, m, MIN(lvl) AS dist FROM ({seen}) u GROUP BY v, m)"
    )
    parts.append(
        "lvl AS MATERIALIZED (SELECT v, dist, COUNT(*) AS cnt FROM pr "
        "WHERE dist > 0 GROUP BY v, dist)"
    )
    parts.append(
        "hagg AS MATERIALIZED (SELECT v, CAST(SUM(cnt) + 1 AS BIGINT) AS reachable, "
        "SUM(cnt / CAST(dist AS DOUBLE)) AS harmonic, "
        "CAST(SUM(cnt * dist) AS BIGINT) AS dist_sum FROM lvl GROUP BY v)"
    )
    return parts


def _harmonic_sql(max_node: int = 64, levels: int = 8) -> str:
    parts = _harmonic_parts(max_node, levels)
    return (
        "WITH " + ", ".join(parts) + " SELECT v AS node_id, reachable, "
        "ROUND(harmonic, 8) AS harmonic, "
        "ROUND(CASE WHEN dist_sum = 0 THEN 0.0 "
        "ELSE (reachable - 1) / CAST(dist_sum AS DOUBLE) END, 8) AS closeness "
        "FROM hagg"
    )


def _hyperball_harmonic_sql(max_node: int = 64, levels: int = 8) -> str:
    parts = _harmonic_parts(max_node, levels)
    return (
        "WITH " + ", ".join(parts) + " SELECT v AS node_id, "
        "reachable AS ball_size, ROUND(harmonic, 8) AS harmonic FROM hagg"
    )


def _distance_summary_sql(
    max_node: int = 64, levels: int = 8, alpha: float = 0.9
) -> str:
    parts = _neighborhood_parts(max_node, levels)
    a = f"CAST({alpha} AS DOUBLE)"
    parts.append(
        "tot AS MATERIALIZED (SELECT MAX(n_pairs) AS n_inf, "
        "MIN(CASE WHEN distance = 0 THEN n_pairs END) AS n0, "
        "SUM(distance * (n_pairs - COALESCE(p, 0))) AS dist_sum FROM ("
        "SELECT distance, n_pairs, LAG(n_pairs) OVER (ORDER BY distance) AS p "
        "FROM curve) d)"
    )
    parts.append(
        f"hit AS MATERIALIZED (SELECT MIN(distance) AS t_hit FROM curve, tot "
        f"WHERE n_pairs >= {a} * n_inf)"
    )
    parts.append(
        "vals AS MATERIALIZED (SELECT "
        "(SELECT n_pairs FROM curve WHERE distance = (SELECT t_hit FROM hit)) AS n_hit, "
        "(SELECT n_pairs FROM curve WHERE distance = (SELECT t_hit FROM hit) - 1) AS n_before)"
    )
    return (
        "WITH " + ", ".join(parts) + " SELECT "
        "ROUND(CASE WHEN n_inf = n0 THEN 0.0 "
        "ELSE dist_sum / (n_inf - n0) END, 8) AS avg_distance, "
        f"ROUND(CASE WHEN n_before IS NULL OR n_hit = n_before THEN CAST(t_hit AS DOUBLE) "
        f"ELSE (t_hit - 1) + ({a} * n_inf - n_before) / (n_hit - n_before) END, 8) "
        "AS effective_diameter, "
        "n_inf AS reachable_pairs "
        "FROM tot, hit, vals"
    )


def _weighted_sssp_sql(source: int = 0, rounds: int = 10, max_node: int = 64) -> str:
    """Bellman-Ford unrolled: after exactly ``rounds`` relaxations both
    engines hold identical ≤rounds-hop shortest distances (weights are
    integer-valued doubles — sums are exact, no rounding needed)."""
    parts = [
        SQL_E,
        f"sube AS MATERIALIZED (SELECT src, dst FROM edges_raw WHERE src < {max_node} AND dst < {max_node})",
        "subsym AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM sube UNION ALL SELECT dst AS src, src AS dst FROM sube) "
        "WHERE src <> dst)",
        "wsub AS MATERIALIZED (SELECT src, dst, CAST((src + dst) % 7 + 1 AS DOUBLE) AS wt FROM subsym)",
        "subn AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM subsym)",
        f"d0 AS MATERIALIZED (SELECT node_id, "
        f"CASE WHEN node_id = {source} THEN CAST(0.0 AS DOUBLE) END AS dist FROM subn)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT e.dst AS node_id, MIN(p.dist + e.wt) AS cand "
            f"FROM wsub e JOIN d{i-1} p ON e.src = p.node_id "
            f"WHERE p.dist IS NOT NULL GROUP BY e.dst)"
        )
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT n.node_id, "
            f"CASE WHEN n.dist IS NULL THEN c.cand "
            f"WHEN c.cand IS NULL THEN n.dist "
            f"ELSE LEAST(n.dist, c.cand) END AS dist "
            f"FROM d{i-1} n LEFT JOIN r{i} c ON n.node_id = c.node_id)"
        )
    return "WITH " + ", ".join(parts) + f" SELECT node_id, dist FROM d{rounds}"


def _scc_closure_sql(max_node: int = 64) -> str:
    """Shared CTE prefix: directed sub-``max_node`` subgraph, its
    recursive transitive closure, and min-member SCC labels (u, v in
    one SCC ⟺ mutual reachability)."""
    return (
        "WITH RECURSIVE " + SQL_E + ", "
        f"sube AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges_raw "
        f"WHERE src < {max_node} AND dst < {max_node}), "
        "subn AS MATERIALIZED (SELECT DISTINCT node_id FROM "
        "(SELECT src AS node_id FROM sube UNION SELECT dst FROM sube)), "
        "reach(a, b) AS (SELECT src, dst FROM sube "
        "UNION SELECT r.a, e.dst FROM reach r JOIN sube e ON r.b = e.src), "
        "scc AS MATERIALIZED (SELECT n.node_id, LEAST(n.node_id, COALESCE("
        "MIN(CASE WHEN r2.a IS NOT NULL THEN r1.b END), n.node_id)) AS scc_id "
        "FROM subn n "
        "LEFT JOIN reach r1 ON r1.a = n.node_id "
        "LEFT JOIN reach r2 ON r2.a = r1.b AND r2.b = n.node_id "
        "GROUP BY n.node_id)"
    )


def _scc_sql(max_node: int = 64) -> str:
    return _scc_closure_sql(max_node) + " SELECT node_id, scc_id FROM scc"


def _bowtie_sql(max_node: int = 64) -> str:
    """Bow-tie regions vs the largest SCC; precedence core > in > out >
    other matches the Spark side (scc.py bow_tie)."""
    return (
        _scc_closure_sql(max_node) + ", "
        "core_id AS MATERIALIZED (SELECT scc_id FROM ("
        "SELECT scc_id, COUNT(*) AS n FROM scc GROUP BY scc_id) "
        "ORDER BY n DESC, scc_id ASC LIMIT 1), "
        "core AS MATERIALIZED (SELECT node_id FROM scc "
        "WHERE scc_id = (SELECT scc_id FROM core_id)), "
        # NB: inside a WITH RECURSIVE list DuckDB gives `base UNION rest`
        # CTEs recursive-style (no cross-part dedup) semantics even
        # without self-reference — dedup explicitly.
        "fwd AS MATERIALIZED (SELECT DISTINCT node_id FROM ("
        "SELECT node_id FROM core "
        "UNION ALL SELECT r.b FROM reach r JOIN core c ON r.a = c.node_id)), "
        "bwd AS MATERIALIZED (SELECT DISTINCT node_id FROM ("
        "SELECT node_id FROM core "
        "UNION ALL SELECT r.a FROM reach r JOIN core c ON r.b = c.node_id)) "
        "SELECT n.node_id, CASE "
        "WHEN c.node_id IS NOT NULL THEN 'core' "
        "WHEN b.node_id IS NOT NULL THEN 'in' "
        "WHEN f.node_id IS NOT NULL THEN 'out' "
        "ELSE 'other' END AS region "
        "FROM subn n "
        "LEFT JOIN core c ON c.node_id = n.node_id "
        "LEFT JOIN fwd f ON f.node_id = n.node_id "
        "LEFT JOIN bwd b ON b.node_id = n.node_id"
    )


def _evcent_sql(iters: int = 10, max_node: int = 64) -> str:
    """Max-normalized power iteration unrolled (the reference's evcent
    loop, eigenvector_centrality.rs:16-37), fixed ``iters`` supersteps
    mirrored by the Spark side's fixed_iterations."""
    parts = [
        SQL_E,
        f"sube AS MATERIALIZED (SELECT src, dst FROM edges_raw WHERE src < {max_node} AND dst < {max_node})",
        "sub AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM sube UNION ALL SELECT dst AS src, src AS dst FROM sube) "
        "WHERE src <> dst)",
        "subn AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM sub)",
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM subn)",
        "x0 AS MATERIALIZED (SELECT node_id, 1.0 / (SELECT n FROM nn) AS x FROM subn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT e.dst AS node_id, SUM(p.x) AS s "
            f"FROM sub e JOIN x{i-1} p ON e.src = p.node_id GROUP BY e.dst)"
        )
        parts.append(f"m{i} AS MATERIALIZED (SELECT MAX(s) AS mx FROM s{i})")
        parts.append(
            f"x{i} AS MATERIALIZED (SELECT n.node_id, "
            f"COALESCE(s.s / (SELECT mx FROM m{i}), 0.0) AS x "
            f"FROM subn n LEFT JOIN s{i} s ON n.node_id = s.node_id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, ROUND(x, 6) AS evcent FROM x{iters}"
    )


def _minhash_lsh_sql(num_perm: int = 8, bands: int = 4) -> str:
    """Banded MinHash LSH candidates.  The Spark side buckets on an md5
    of the band's (k, minhash) slice; since each doc has exactly one
    minhash per k, band-hash equality ⟺ the band's minhash slice
    matches row-for-row, which is what this oracle joins on directly."""
    rpb = num_perm // bands
    return (
        "WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), "
        f"ks AS (SELECT unnest(range({num_perm})) AS k), "
        "h AS (SELECT doc_id, k, "
        + MD5L.format(x="tok || '#' || k")
        + " AS h FROM toks CROSS JOIN ks), "
        "sig AS (SELECT doc_id, k, MIN(h) AS minhash FROM h GROUP BY doc_id, k), "
        f"bmatch AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        f"CAST(FLOOR(a.k / {rpb}) AS INT) AS band "
        "FROM sig a JOIN sig b ON a.k = b.k AND a.minhash = b.minhash "
        "AND a.doc_id < b.doc_id "
        f"GROUP BY 1, 2, 3 HAVING COUNT(*) = {rpb}) "
        "SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared_bands "
        "FROM bmatch GROUP BY doc_a, doc_b"
    )


def _ann_lsh_sql(
    num_planes: int = 8, bands: int = 4, k: int = 5, max_query: int = 10, seed: int = 42
) -> str:
    """Banded random-hyperplane ANN.  Plane normals, rounded-projection
    sign bits, and the cosine re-rank mirror
    dachshund_spark.pipeline.similarity exactly (seed/plane/dim md5
    scheme, ROUND(·, 6) before the sign test and on cos_sim)."""
    rpb = num_planes // bands
    normal = (
        "list_transform(range(0, len(v)), i -> CASE WHEN "
        f"CAST(('0x' || substr(md5('{seed}#' || CAST(p AS VARCHAR) || '#' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 1 "
        "THEN 1.0 ELSE -1.0 END)"
    )
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
        f"planes AS (SELECT unnest(range({num_planes})) AS p), "
        "bits AS (SELECT vec_id, p, CASE WHEN "
        f"ROUND(list_dot_product(v, {normal}), 6) > 0 "
        "THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit "
        "FROM e CROSS JOIN planes), "
        f"bsig AS (SELECT vec_id, CAST(FLOOR(p / {rpb}) AS INT) AS band, "
        f"SUM(bit << CAST(p % {rpb} AS INT)) AS band_sig FROM bits GROUP BY 1, 2), "
        f"cand AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id "
        "FROM bsig a JOIN bsig b ON a.band = b.band AND a.band_sig = b.band_sig "
        f"WHERE a.vec_id < {max_query} AND a.vec_id <> b.vec_id), "
        "sims AS (SELECT query_id, neighbor_id, "
        "ROUND(list_dot_product(qa.v, qb.v) / "
        "(sqrt(list_dot_product(qa.v, qa.v)) * sqrt(list_dot_product(qb.v, qb.v))), 6) AS cos_sim "
        "FROM cand JOIN e qa ON qa.vec_id = query_id JOIN e qb ON qb.vec_id = neighbor_id) "
        "SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INT) AS rank FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        f"ORDER BY cos_sim DESC, neighbor_id ASC) AS rn FROM sims) t WHERE rn <= {k}"
    )


def _bfs_sql(source: int, levels: int = 8) -> str:
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        f"d0 AS MATERIALIZED (SELECT node_id, "
        f"CASE WHEN node_id = {source} THEN 0 END AS dist FROM nodes)",
    ]
    for i in range(levels):
        parts.append(
            f"f{i} AS MATERIALIZED (SELECT DISTINCT u.dst AS node_id "
            f"FROM und u JOIN d{i} l ON u.src = l.node_id WHERE l.dist = {i})"
        )
        parts.append(
            f"d{i+1} AS MATERIALIZED (SELECT n.node_id, "
            f"CASE WHEN n.dist IS NOT NULL THEN n.dist "
            f"WHEN f.node_id IS NOT NULL THEN {i + 1} END AS dist "
            f"FROM d{i} n LEFT JOIN f{i} f ON n.node_id = f.node_id)"
        )
    return "WITH " + ", ".join(parts) + f" SELECT node_id, dist FROM d{levels}"


def _lpa_sql(iters: int = LPA_ITERS) -> str:
    return (
        "WITH "
        + ", ".join(_lpa_parts(iters))
        + f" SELECT node_id, label FROM l{iters}"
    )


def _lpa_parts(iters: int = LPA_ITERS) -> list[str]:
    parts = [SQL_E, SQL_U, SQL_N, "l0 AS MATERIALIZED (SELECT node_id, node_id AS label FROM nodes)"]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT u.dst AS node_id, l.label, COUNT(*) AS cnt "
            f"FROM und u JOIN l{i-1} l ON u.src = l.node_id GROUP BY u.dst, l.label)"
        )
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT node_id, label AS new_label FROM ("
            f"SELECT node_id, label, ROW_NUMBER() OVER ("
            f"PARTITION BY node_id ORDER BY cnt DESC, label ASC) AS rn FROM c{i}) t "
            f"WHERE rn = 1)"
        )
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT l.node_id, COALESCE(m.new_label, l.label) AS label "
            f"FROM l{i-1} l LEFT JOIN m{i} m ON l.node_id = m.node_id)"
        )
    return parts


def _lpa_conductance_sql(iters: int = LPA_ITERS) -> str:
    parts = _lpa_parts(iters) + [
        f"ce AS MATERIALIZED (SELECT a.label AS ls, b.label AS ld "
        f"FROM und u JOIN l{iters} a ON u.src = a.node_id "
        f"JOIN l{iters} b ON u.dst = b.node_id)",
        "totm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM und)",
        "per AS MATERIALIZED (SELECT ls AS label, "
        "CAST(COUNT(*) AS BIGINT) AS volume, "
        "CAST(SUM(CASE WHEN ls <> ld THEN 1 ELSE 0 END) AS BIGINT) AS cut_edges "
        "FROM ce GROUP BY ls)",
    ]
    den = "LEAST(volume, (SELECT m2 FROM totm) - volume)"
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT label, volume, cut_edges, "
        f"CASE WHEN {den} > 0 THEN cut_edges / {den} ELSE NULL END "
        "AS conductance FROM per"
    )


# ---------------------------------------------------------------------------
# Spark-side query callables
# ---------------------------------------------------------------------------
def _q_out_degree(spark, sf_dir):
    return derived_graph(spark, sf_dir).out_degrees()


def _q_undirected_degree(spark, sf_dir):
    return derived_graph(spark, sf_dir).degrees()


def _q_graph_summary(spark, sf_dir):
    g = derived_graph(spark, sf_dir)
    deg = g.degrees()
    n_nodes = g.nodes().agg(F.count("*").alias("n_nodes"))
    n_und = g.canonical_edges().agg(F.count("*").alias("n_edges"))
    n_dir = g.edges.distinct().agg(F.count("*").alias("n_edges_directed"))
    dstats = deg.agg(
        F.max("degree").alias("max_degree"),
        (F.sum("degree").cast("double") / F.count("*")).alias("avg_degree"),
    )
    return n_nodes.crossJoin(n_und).crossJoin(n_dir).crossJoin(dstats)


def _q_hub_top20(spark, sf_dir):
    g = derived_graph(spark, sf_dir)
    return (
        g.in_degrees()
        .orderBy(F.desc("in_degree"), F.asc("node_id"))
        .limit(20)
    )


def _q_cc(spark, sf_dir):
    from dachshund_spark.algorithms import connected_components

    return connected_components(derived_graph(spark, sf_dir), renumber=True)


def _q_incremental_cc(spark, sf_dir):
    """Batch-incremental CC (the crawl-delta path): cold hash-min on a
    snapshot of ~80% of the edges PLUS ghost appendages (a negative
    twin -src-1 hanging off every src≡0 mod 7 node — negative, so the
    ghost becomes its component's min/label), then a WARM-START run
    over the real full graph: the ghosts are DELETED nodes, the
    remaining 20% of edges are additions.  Warm start with the
    deletion guard converges to the cold-run canonical labels (ghost-
    touched components fall back to own-id seeds; intact components'
    old min is still the canonical min), so the plain full-graph CC
    oracle pins it — without the guard the stale negative labels would
    survive the hash-min fixpoint and the hash would mismatch."""
    from dachshund_spark.algorithms.components import connected_components
    from dachshund_spark.derived import derived_edges

    e = derived_edges(spark, sf_dir)
    batch_a = e.where(F.pmod(F.col("src") + F.col("dst"), F.lit(5)) < 4)
    ghosts = (
        e.select("src")
        .where(F.pmod(F.col("src"), F.lit(7)) == 0)
        .distinct()
        .select("src", (-F.col("src") - 1).alias("dst"))
    )
    prev = connected_components(LinkGraph(batch_a.unionByName(ghosts)), renumber=False)
    return connected_components(
        derived_graph(spark, sf_dir), warm_start=prev, renumber=True
    )


def _q_cc_star(spark, sf_dir):
    """Star-contraction CC (O(log n) rounds): labels must equal
    hash-min's min-member components — same oracle label set."""
    from dachshund_spark.algorithms.components import connected_components_star

    out, _rounds = connected_components_star(derived_graph(spark, sf_dir))
    return out.select("node_id", "component")


def _q_pagerank(spark, sf_dir):
    from dachshund_spark.algorithms import pagerank

    pr = pagerank(derived_graph(spark, sf_dir), damping=DAMPING,
                  fixed_iterations=PAGERANK_ITERS)
    return pr.select("node_id", F.round("pagerank", 8).alias("pagerank"))


def _q_random_walks(spark, sf_dir):
    """Deterministic DeepWalk-style corpus on the 64-node subgraph:
    2 walks of length 6 per node, md5-driven picks (exact SQL replay)."""
    from dachshund_spark.walks import random_walks

    return random_walks(
        _small_graph(spark, sf_dir), walk_length=6, walks_per_node=2, seed=0
    )


def _q_skipgram_pairs(spark, sf_dir):
    """Skip-gram (center, context, cnt) extraction over the oracled
    DeepWalk corpus, window 2."""
    from dachshund_spark.walks import random_walks, skipgram_pairs

    w = random_walks(
        _small_graph(spark, sf_dir), walk_length=6, walks_per_node=2, seed=0
    )
    return skipgram_pairs(w, window=2)


def _skipgram_sql(
    walk_length: int = 6, walks_per_node: int = 2, seed: int = 0,
    max_node: int = 64, window: int = 2,
) -> str:
    """Replay the walk corpus (same CTE chain as _walks_sql) then
    extract in-window ordered pairs positionally."""
    walks = _walks_sql(walk_length, walks_per_node, seed, max_node)
    prefix = walks[: walks.rfind(" SELECT ")]
    last = f"w{walk_length - 1}"
    return (
        prefix
        + f", posi AS MATERIALIZED (SELECT unnest(range(1, {walk_length + 1})) AS i), "
        f"toks AS MATERIALIZED (SELECT start_node, walk_idx, i - 1 AS pos, "
        f"CAST(string_split(walk, '->')[i] AS BIGINT) AS node "
        f"FROM {last}, posi WHERE i <= len(string_split(walk, '->'))) "
        "SELECT a.node AS center, b.node AS context, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM toks a JOIN toks b ON a.start_node = b.start_node "
        "AND a.walk_idx = b.walk_idx AND a.pos <> b.pos "
        f"AND abs(a.pos - b.pos) <= {window} "
        "GROUP BY a.node, b.node"
    )


def _q_node2vec_walks(spark, sf_dir):
    """node2vec-biased corpus on the 64-node subgraph: p=4 (avoid
    returns), q=0.25 (explore outward), integer weights (exact SQL
    replay)."""
    from dachshund_spark.walks import node2vec_walks

    return node2vec_walks(
        _small_graph(spark, sf_dir),
        walk_length=6,
        walks_per_node=2,
        p=4.0,
        q=0.25,
        seed=0,
    )


def _q_hits(spark, sf_dir):
    """HITS hubs & authorities, fixed 10 iterations."""
    from dachshund_spark.algorithms.hits import hits

    out = hits(derived_graph(spark, sf_dir), fixed_iterations=10)
    return out.select(
        "node_id",
        F.round("hub", 8).alias("hub"),
        F.round("auth", 8).alias("auth"),
    )


def _q_densest(spark, sf_dir):
    """Densest-subgraph peel history (Bahmani 2(1+eps)-approx, eps=0.5);
    density rounded at 8 (raw doubles are bit-identical single
    divisions, the ROUND just normalizes display)."""
    from dachshund_spark.algorithms.densest import densest_subgraph_history

    out = densest_subgraph_history(derived_graph(spark, sf_dir), epsilon=0.5, max_rounds=24)
    return out.select(
        "round", "n_nodes", "n_edges",
        F.round("density", 8).alias("density"), "is_best",
    )


def _q_powerlaw(spark, sf_dir):
    """Power-law degree exponent (continuous MLE, dmin=5)."""
    from dachshund_spark.algorithms.stats import powerlaw_alpha

    return powerlaw_alpha(derived_graph(spark, sf_dir), dmin=5)


_POWERLAW_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_DEG} "
    "SELECT CAST(5 AS BIGINT) AS dmin, CAST(COUNT(*) AS BIGINT) AS n_tail, "
    "ROUND(1.0 + COUNT(*) / (CAST(SUM(CAST(ROUND(LN(degree / 4.5) * 100000000, 0) "
    "AS BIGINT)) AS DOUBLE) / 100000000.0), 8) AS alpha "
    "FROM deg WHERE degree >= 5"
)


def _q_ngram_containment(spark, sf_dir):
    """Asymmetric n-gram containment over the same (n_chars, lang)
    DEMO blocking as ngram_jaccard_pairs (SQL-expressible oracle;
    production pairing is the banded MinHash LSH)."""
    from dachshund_spark.pipeline.dedup import ngram_containment

    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("doc_a"), "n_chars", "lang")
    b = docs.select(F.col("doc_id").alias("doc_b"), "n_chars", "lang")
    pairs = a.join(b, ["n_chars", "lang"]).where(
        F.col("doc_a") < F.col("doc_b")
    ).select("doc_a", "doc_b")
    return ngram_containment(docs, pairs, n=3)


_CONTAINMENT_SQL = (
    "WITH pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM documents a "
    "JOIN documents b ON a.n_chars = b.n_chars AND a.lang = b.lang AND a.doc_id < b.doc_id), "
    "toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
    "grams AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram "
    "FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)), "
    "inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter FROM pairs p "
    "JOIN grams ga ON ga.doc_id = p.doc_a "
    "JOIN grams gb ON gb.doc_id = p.doc_b AND gb.gram = ga.gram "
    "GROUP BY p.doc_a, p.doc_b), "
    "sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id) "
    "SELECT i.doc_a, i.doc_b, CAST(i.n_inter AS BIGINT) AS n_inter, "
    "CAST(i.n_inter AS DOUBLE) / sa.n AS containment_a, "
    "CAST(i.n_inter AS DOUBLE) / sb.n AS containment_b "
    "FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id "
    "JOIN sizes sb ON i.doc_b = sb.doc_id"
)


def _q_url_canonical(spark, sf_dir):
    """Canonical-URL dedup groups over deliberately messy synthetic
    urls (case, default ports, utm params, fragments): docs sharing
    (doc_id % 8, doc_id % 40) canonicalize to the same page."""
    from dachshund_spark.pipeline.curate import canonical_url_groups

    docs = load_table(spark, sf_dir, "documents")
    x = (F.col("doc_id") % 8).cast("string")
    pg = (F.col("doc_id") % 40).cast("string")
    c = F.col("doc_id") % 5
    url = (
        F.when(c == 0, F.concat(
            F.lit("HTTPS://H"), x, F.lit(".Example.COM:443/p/"), pg,
            F.lit("?utm_source=feed&ref="), pg, F.lit("#frag")))
        .when(c == 1, F.concat(
            F.lit("https://h"), x, F.lit(".example.com:443/p/"), pg))
        .when(c == 2, F.concat(
            F.lit("https://h"), x, F.lit(".example.com/p/"), pg,
            F.lit("?ref="), pg, F.lit("&utm_campaign=x&utm_m=y")))
        .when(c == 3, F.concat(
            F.lit("https://h"), x, F.lit(".example.com/p/"), pg,
            F.lit("?utm_a=1&utm_b=2")))
        .otherwise(F.concat(F.lit("https://h"), x, F.lit(".example.com")))
    )
    urls = docs.select("doc_id", url.alias("url"))
    return canonical_url_groups(urls)


_URL_CANONICAL_SQL = (
    "WITH u0 AS MATERIALIZED (SELECT doc_id, CASE CAST(doc_id % 5 AS INT) "
    "WHEN 0 THEN 'HTTPS://H' || CAST(doc_id % 8 AS VARCHAR) || '.Example.COM:443/p/' "
    "|| CAST(doc_id % 40 AS VARCHAR) || '?utm_source=feed&ref=' || CAST(doc_id % 40 AS VARCHAR) || '#frag' "
    "WHEN 1 THEN 'https://h' || CAST(doc_id % 8 AS VARCHAR) || '.example.com:443/p/' || CAST(doc_id % 40 AS VARCHAR) "
    "WHEN 2 THEN 'https://h' || CAST(doc_id % 8 AS VARCHAR) || '.example.com/p/' || CAST(doc_id % 40 AS VARCHAR) "
    "|| '?ref=' || CAST(doc_id % 40 AS VARCHAR) || '&utm_campaign=x&utm_m=y' "
    "WHEN 3 THEN 'https://h' || CAST(doc_id % 8 AS VARCHAR) || '.example.com/p/' || CAST(doc_id % 40 AS VARCHAR) "
    "|| '?utm_a=1&utm_b=2' "
    "ELSE 'https://h' || CAST(doc_id % 8 AS VARCHAR) || '.example.com' END AS url FROM documents), "
    "c1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM u0), "
    "c2 AS (SELECT doc_id, "
    "lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme, "
    "lower(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS hostport, "
    "regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$', 1) AS rest FROM c1), "
    "c3 AS (SELECT doc_id, scheme, "
    "CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '') "
    "WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '') "
    "ELSE hostport END AS hp, "
    "regexp_replace(rest, '\\?.*$', '') AS path, "
    "regexp_extract(rest, '\\?(.*)$', 1) AS query FROM c2), "
    "c4 AS (SELECT doc_id, scheme, hp, "
    "CASE WHEN path = '' THEN '/' ELSE path END AS path2, "
    "array_to_string(list_filter(string_split(query, '&'), "
    "pp -> pp <> '' AND NOT starts_with(pp, 'utm_')), '&') AS newq FROM c3), "
    "c5 AS (SELECT doc_id, scheme || '://' || hp || path2 || "
    "CASE WHEN newq <> '' THEN '?' || newq ELSE '' END AS canonical_url FROM c4) "
    "SELECT canonical_url, MIN(doc_id) AS keeper_doc_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_copies FROM c5 GROUP BY canonical_url"
)


def _q_simrank(spark, sf_dir):
    """Exact SimRank (C=0.75, 5 iterations) on the directed 64-node
    subgraph; scores are 1e-10-scaled BIGINTs (exact integer sums —
    see algorithms/simrank.py parity notes)."""
    from dachshund_spark.algorithms.simrank import simrank

    return simrank(_small_graph(spark, sf_dir), decay=0.75, fixed_iterations=5)


def _simrank_sql(iters: int = 5, max_node: int = 64) -> str:
    """SimRank unrolled with 1e-10 fixed-point BIGINT state: the sum is
    exact, the single float multiply+round per pair is bit-stable."""
    parts = [
        SQL_E,
        f"sube AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges_raw "
        f"WHERE src < {max_node} AND dst < {max_node})",
        "ssubn AS MATERIALIZED (SELECT DISTINCT x AS node_id FROM "
        "(SELECT src AS x FROM sube UNION ALL SELECT dst AS x FROM sube))",
        "sindeg AS MATERIALIZED (SELECT dst AS node_id, COUNT(*) AS ind "
        "FROM sube GROUP BY dst)",
        "sr0 AS MATERIALIZED (SELECT node_id AS a, node_id AS b, "
        "CAST(10000000000 AS BIGINT) AS s FROM ssubn)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"srt{k} AS MATERIALIZED (SELECT ea.dst AS a, eb.dst AS b, "
            f"SUM(p.s) AS ssum FROM sr{k-1} p "
            f"JOIN sube ea ON ea.src = p.a JOIN sube eb ON eb.src = p.b "
            f"GROUP BY ea.dst, eb.dst)"
        )
        parts.append(
            f"sr{k} AS MATERIALIZED (SELECT node_id AS a, node_id AS b, "
            f"CAST(10000000000 AS BIGINT) AS s FROM ssubn "
            f"UNION ALL "
            f"SELECT t.a, t.b, CAST(ROUND((0.75 / (ia.ind * ib.ind)) * "
            f"CAST(t.ssum AS BIGINT), 0) AS BIGINT) AS s "
            f"FROM srt{k} t JOIN sindeg ia ON t.a = ia.node_id "
            f"JOIN sindeg ib ON t.b = ib.node_id "
            f"WHERE t.a <> t.b AND CAST(ROUND((0.75 / (ia.ind * ib.ind)) * "
            f"CAST(t.ssum AS BIGINT), 0) AS BIGINT) > 0)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT a AS node_a, b AS node_b, s AS simrank_e10 "
        f"FROM sr{iters} WHERE a < b"
    )


PHRASE = ["merge", "group"]


def _q_phrase(spark, sf_dir):
    """Exact phrase search over positional postings."""
    from dachshund_spark.pipeline.retrieval import phrase_matches

    return phrase_matches(load_table(spark, sf_dir, "documents"), PHRASE)


_PHRASE_SQL = (
    "WITH toks AS MATERIALIZED (SELECT doc_id, t[i] AS token, "
    "CAST(i - 1 AS BIGINT) AS pos FROM "
    "(SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
    "UNNEST(range(1, len(t) + 1)) AS r(i)), "
    "p0 AS (SELECT doc_id, pos AS start FROM toks WHERE token = 'merge'), "
    "p1 AS (SELECT doc_id, pos - 1 AS start FROM toks WHERE token = 'group') "
    "SELECT p0.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences "
    "FROM p0 JOIN p1 ON p0.doc_id = p1.doc_id AND p0.start = p1.start "
    "GROUP BY p0.doc_id"
)


def _q_cms(spark, sf_dir):
    """Count-Min sketch (depth 4, width 256) over corpus tokens probed
    at the true top-20: estimates are exact integers (md5 buckets),
    always >= true_count."""
    from dachshund_spark.pipeline.sketches import cms_build, cms_estimate
    from dachshund_spark.pipeline.text import tokens as _toks

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_toks("text")).alias("token"))
    true = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("true_count")
    )
    top = true.orderBy(F.desc("true_count"), F.asc("token")).limit(20)
    grid = cms_build(docs, depth=4, width=256)
    est = cms_estimate(grid, top, depth=4, width=256)
    return top.join(est, on="token").select("token", "true_count", "cms_estimate")


def _cms_sql(depth: int = 4, width: int = 256) -> str:
    cell_rows = " UNION ALL ".join(
        f"SELECT {i} AS row, " + MD5L.format(x=f"token || '#cms{i}'")
        + f" % {width} AS bucket FROM toks"
        for i in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT token, {i} AS row, " + MD5L.format(x=f"token || '#cms{i}'")
        + f" % {width} AS bucket FROM top"
        for i in range(depth)
    )
    return (
        "WITH toks AS MATERIALIZED (SELECT unnest(string_split(text, ' ')) AS token FROM documents), "
        "truec AS MATERIALIZED (SELECT token, CAST(COUNT(*) AS BIGINT) AS true_count FROM toks GROUP BY token), "
        "top AS MATERIALIZED (SELECT token, true_count FROM truec "
        "ORDER BY true_count DESC, token ASC LIMIT 20), "
        f"cells AS MATERIALIZED (SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt "
        f"FROM ({cell_rows}) GROUP BY row, bucket), "
        f"probe AS MATERIALIZED ({probe_rows}), "
        "est AS MATERIALIZED (SELECT p.token, MIN(c.cnt) AS cms_estimate FROM probe p "
        "JOIN cells c ON p.row = c.row AND p.bucket = c.bucket GROUP BY p.token) "
        "SELECT t.token, t.true_count, e.cms_estimate FROM top t "
        "JOIN est e ON t.token = e.token"
    )


ROBOTS_RULES = [
    ("h0.example.com", "/p/1", False),
    ("h0.example.com", "/p/12", True),
    ("h1.example.com", "/p", False),
    ("h1.example.com", "/p", True),
    ("h2.example.com", "/x", False),
]


def _q_robots(spark, sf_dir):
    """RFC 9309 longest-match robots verdicts over synthetic urls."""
    from dachshund_spark.pipeline.curate import robots_filter

    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 8).cast("string"),
            F.lit(".example.com/p/"), (F.col("doc_id") % 40).cast("string"),
        ).alias("url"),
    )
    rules = spark.createDataFrame(
        ROBOTS_RULES, "host string, rule_path string, allow boolean"
    )
    return robots_filter(urls, rules).select("doc_id", "robots_allowed")


_ROBOTS_VALUES = ", ".join(
    f"('{h}', '{rp}', {str(a).lower()})" for h, rp, a in ROBOTS_RULES
)
_ROBOTS_SQL = (
    "WITH u AS MATERIALIZED (SELECT doc_id, 'https://h' || CAST(doc_id % 8 AS VARCHAR) "
    "|| '.example.com/p/' || CAST(doc_id % 40 AS VARCHAR) AS url FROM documents), "
    f"rr AS MATERIALIZED (SELECT * FROM (VALUES {_ROBOTS_VALUES}) "
    "t(host, rule_path, allow)), "
    "b AS MATERIALIZED (SELECT doc_id, "
    "lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS host, "
    "CASE WHEN regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) = '' "
    "THEN '/' ELSE regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) END AS path "
    "FROM u), "
    "m AS MATERIALIZED (SELECT b.doc_id, "
    "arg_max(r.allow, length(r.rule_path) * 2 + CAST(r.allow AS INT)) AS verdict "
    "FROM b LEFT JOIN rr r ON b.host = r.host "
    "WHERE r.rule_path IS NULL OR starts_with(b.path, r.rule_path) "
    "GROUP BY b.doc_id) "
    "SELECT b.doc_id, COALESCE(m.verdict, true) AS robots_allowed "
    "FROM b LEFT JOIN m ON b.doc_id = m.doc_id"
)


def _q_salsa(spark, sf_dir):
    """SALSA hubs & authorities (degree-normalized HITS), 10 fixed
    iterations."""
    from dachshund_spark.algorithms.hits import salsa

    out = salsa(derived_graph(spark, sf_dir), fixed_iterations=10)
    return out.select(
        "node_id",
        F.round("hub", 8).alias("hub"),
        F.round("auth", 8).alias("auth"),
    )


def _q_ppr(spark, sf_dir):
    """Personalized PageRank: restarts land uniformly on seed nodes
    {0,1,2,3}."""
    from dachshund_spark.algorithms import pagerank

    pr = pagerank(
        derived_graph(spark, sf_dir),
        damping=DAMPING,
        fixed_iterations=PAGERANK_ITERS,
        personalization=[0, 1, 2, 3],
    )
    return pr.select("node_id", F.round("pagerank", 8).alias("pagerank"))


def _q_pagerank_weighted(spark, sf_dir):
    """Edge-weighted PageRank (synthetic deterministic weights on the
    deduped derived edges)."""
    from dachshund_spark.algorithms import pagerank

    g = derived_graph(spark, sf_dir)
    we = g.edges.distinct().withColumn(
        "wt", (F.pmod(F.col("src") + F.col("dst"), F.lit(5)) + 1).cast("double")
    )
    pr = pagerank(
        LinkGraph(we, extra_cols=["wt"]),
        damping=DAMPING,
        fixed_iterations=PAGERANK_ITERS,
        dedupe_edges=False,
        weight_col="wt",
    )
    return pr.select("node_id", F.round("pagerank", 8).alias("pagerank"))


def _q_lpa(spark, sf_dir):
    from dachshund_spark.algorithms import label_propagation

    return label_propagation(derived_graph(spark, sf_dir), iterations=LPA_ITERS)


def _q_triangles(spark, sf_dir):
    from dachshund_spark.algorithms import triangle_counts

    return triangle_counts(derived_graph(spark, sf_dir))


def _q_wedges(spark, sf_dir):
    from dachshund_spark.algorithms.triangles import triples_counts

    return triples_counts(derived_graph(spark, sf_dir))


def _q_transitivity(spark, sf_dir):
    from dachshund_spark.algorithms import transitivity

    return transitivity(derived_graph(spark, sf_dir))


def _q_clustering(spark, sf_dir):
    from dachshund_spark.algorithms import clustering_coefficients

    return clustering_coefficients(derived_graph(spark, sf_dir))


def _q_brokerage(spark, sf_dir):
    from dachshund_spark.algorithms import brokerage_scores

    g = derived_graph(spark, sf_dir)
    comm = g.nodes().withColumn("community", F.col("node_id") % 4)
    return brokerage_scores(g, comm)


def _q_sessions(spark, sf_dir):
    from dachshund_spark.relational import sessionize_events

    return sessionize_events(load_table(spark, sf_dir, "events"))


def _q_hourly(spark, sf_dir):
    from dachshund_spark.relational import hourly_event_rollup

    return hourly_event_rollup(load_table(spark, sf_dir, "events"))


def _q_pricing(spark, sf_dir):
    from dachshund_spark.relational import pricing_summary

    return pricing_summary(load_table(spark, sf_dir, "lineitem"))


def _q_dedup_exact(spark, sf_dir):
    from dachshund_spark.pipeline.dedup import exact_duplicates

    return exact_duplicates(load_table(spark, sf_dir, "documents"))


def _q_token_stats(spark, sf_dir):
    from dachshund_spark.pipeline.text import token_stats

    return token_stats(load_table(spark, sf_dir, "documents"))


def _q_quality(spark, sf_dir):
    from dachshund_spark.pipeline.text import quality_scores

    return quality_scores(load_table(spark, sf_dir, "documents"))


def _q_langid(spark, sf_dir):
    from dachshund_spark.pipeline.text import language_id

    return language_id(load_table(spark, sf_dir, "documents"))


def _q_fingerprint(spark, sf_dir):
    from dachshund_spark.pipeline.text import fingerprint

    return fingerprint(load_table(spark, sf_dir, "documents"))


def _q_minhash(spark, sf_dir):
    from dachshund_spark.pipeline.dedup import minhash_signatures

    return minhash_signatures(load_table(spark, sf_dir, "documents"), num_perm=8)


def _q_minhash_pairs(spark, sf_dir):
    from dachshund_spark.pipeline.dedup import minhash_similar_pairs

    return minhash_similar_pairs(
        load_table(spark, sf_dir, "documents"), num_perm=8, min_matches=6
    )


def _q_simhash(spark, sf_dir):
    from dachshund_spark.pipeline.dedup import simhash

    return simhash(load_table(spark, sf_dir, "documents"), bits=32)


def _q_dedup_clusters(spark, sf_dir):
    """End-to-end near-dup resolution: signature-verified pairs
    (>= 6/8 matching perms) -> CC transitive closure -> min-doc_id
    keeper per cluster, singletons keep themselves."""
    from dachshund_spark.pipeline.dedup import dedup_clusters

    return dedup_clusters(
        load_table(spark, sf_dir, "documents"),
        num_perm=8,
        verify_min_matches=6,
    )


def _dedup_cluster_parts(
    source: str = "documents",
    num_perm: int = 8,
    min_matches: int = 6,
    cc_rounds: int = 8,
) -> tuple[list[str], str]:
    """CTE parts + final select for the dedup-cluster replay over any
    (doc_id, text) source CTE — shared by the dedup_clusters oracle and
    the corpus_curation composite."""
    parts = [
        f"toks AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM {source})",
        f"ks AS MATERIALIZED (SELECT unnest(range({num_perm})) AS k)",
        "h AS MATERIALIZED (SELECT doc_id, k, "
        + MD5L.format(x="tok || '#' || k")
        + " AS h FROM toks CROSS JOIN ks)",
        "sig AS MATERIALIZED (SELECT doc_id, k, MIN(h) AS minhash FROM h GROUP BY doc_id, k)",
        "prs AS MATERIALIZED (SELECT a.doc_id AS src, b.doc_id AS dst "
        "FROM sig a JOIN sig b ON a.k = b.k AND a.minhash = b.minhash "
        f"AND a.doc_id < b.doc_id GROUP BY 1, 2 HAVING COUNT(*) >= {min_matches})",
        "du AS MATERIALIZED (SELECT src, dst FROM prs UNION SELECT dst, src FROM prs)",
        "dn AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM du)",
        "c0 AS MATERIALIZED (SELECT node_id, node_id AS label FROM dn)",
    ]
    for i in range(1, cc_rounds + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT n.node_id, "
            f"CASE WHEN m.minl IS NULL OR n.label <= m.minl THEN n.label ELSE m.minl END AS label "
            f"FROM c{i-1} n LEFT JOIN ("
            f"SELECT u.dst AS node_id, MIN(l.label) AS minl "
            f"FROM du u JOIN c{i-1} l ON u.src = l.node_id GROUP BY u.dst) m "
            f"ON n.node_id = m.node_id)"
        )
    final = (
        f"SELECT node_id AS doc_id, label AS keeper_doc_id FROM c{cc_rounds} "
        f"UNION ALL SELECT d.doc_id, d.doc_id AS keeper_doc_id FROM {source} d "
        "WHERE NOT EXISTS (SELECT 1 FROM dn n WHERE n.node_id = d.doc_id)"
    )
    return parts, final


def _dedup_clusters_sql(
    num_perm: int = 8, min_matches: int = 6, cc_rounds: int = 8
) -> str:
    """Signature pairs (>= min_matches agreeing perms) then hash-min CC
    unrolled over the pair graph; keeper = min-member label; docs with
    no pair map to themselves."""
    parts, final = _dedup_cluster_parts("documents", num_perm, min_matches, cc_rounds)
    return "WITH " + ", ".join(parts) + " " + final


def _q_corpus_curation(spark, sf_dir):
    """Full curation funnel: quality gate (min 25 tokens) ∧ English ∧
    near-dup cluster keeper — one composed job."""
    from dachshund_spark.pipeline.curate import curate_corpus

    return curate_corpus(
        load_table(spark, sf_dir, "documents"),
        allowed_langs=("en",),
        min_tokens=25,
        verify_min_matches=8,
    )


def _corpus_curation_sql(
    min_tokens: int = 25, num_perm: int = 8, min_matches: int = 6
) -> str:
    lang_scores = ", ".join(
        f"len(list_filter(toks, x -> x IN ({words}))) AS s_{lang}"
        for lang, words in _LANGS.items()
    )
    dedup_parts, dedup_final = _dedup_cluster_parts(
        "passed", num_perm, min_matches
    )
    parts = [
        "tq AS MATERIALIZED (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)",
        "qm AS MATERIALIZED (SELECT doc_id, text, CAST(len(toks) AS INT) AS n_tokens, "
        f"CAST(len(list_filter(toks, x -> x IN ({_STOP}))) AS INT) AS n_stop FROM tq)",
        f"q AS MATERIALIZED (SELECT doc_id, text, n_tokens FROM qm "
        f"WHERE n_tokens >= {min_tokens} AND n_tokens <= 100000 "
        "AND CAST(n_stop AS DOUBLE) / n_tokens < 0.5)",
        f"ls AS MATERIALIZED (SELECT doc_id, {lang_scores} FROM tq)",
        "lm AS MATERIALIZED (SELECT *, GREATEST(s_de, s_en, s_es, s_fr) AS mx FROM ls)",
        "lg AS MATERIALIZED (SELECT doc_id, CASE WHEN mx = 0 THEN 'und' "
        "WHEN s_de = mx THEN 'de' WHEN s_en = mx THEN 'en' "
        "WHEN s_es = mx THEN 'es' ELSE 'fr' END AS detected_lang FROM lm)",
        "passed AS MATERIALIZED (SELECT q.doc_id, q.text, q.n_tokens, lg.detected_lang "
        "FROM q JOIN lg USING (doc_id) WHERE lg.detected_lang IN ('en'))",
        *dedup_parts,
        f"keepmap AS MATERIALIZED ({dedup_final})",
        "keep AS MATERIALIZED (SELECT doc_id FROM keepmap WHERE doc_id = keeper_doc_id)",
    ]
    return (
        "WITH " + ", ".join(parts)
        + " SELECT p.doc_id, p.detected_lang, p.n_tokens FROM passed p "
        "JOIN keep USING (doc_id)"
    )


def _q_ngram_jaccard(spark, sf_dir):
    """DEMO candidate blocking on (n_chars, lang) — quadratic within a
    metadata bucket, used here only because it is trivially
    SQL-expressible for the oracle.  The recommended generator is
    dedup.near_dup_candidates (banded MinHash LSH, bucket-local)."""
    from dachshund_spark.pipeline.dedup import ngram_jaccard

    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("doc_a"), "n_chars", "lang")
    b = docs.select(F.col("doc_id").alias("doc_b"), "n_chars", "lang")
    pairs = a.join(b, ["n_chars", "lang"]).where(
        F.col("doc_a") < F.col("doc_b")
    ).select("doc_a", "doc_b")
    return ngram_jaccard(docs, pairs, n=3)


def _q_embedding_topk(spark, sf_dir):
    from dachshund_spark.pipeline.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


def _q_triplets(spark, sf_dir):
    """Batch-hard triplet mining (anchors = vec_id < 32): least-similar
    same-label positive + most-similar other-label negative."""
    from dachshund_spark.pipeline.similarity import triplet_mining

    emb = load_table(spark, sf_dir, "embeddings")
    return triplet_mining(emb, emb.where(F.col("vec_id") < 32))


_TRIPLETS_SQL = (
    "WITH a AS (SELECT vec_id AS anchor_id, label AS a_label, "
    "CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 32), "
    "v AS (SELECT vec_id AS neighbor_id, label AS n_label, "
    "CAST(embedding AS DOUBLE[]) AS nv FROM embeddings), "
    "sims AS (SELECT anchor_id, a_label, neighbor_id, n_label, "
    "ROUND(list_dot_product(qv, nv) / "
    "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))), 6) AS cos_sim "
    "FROM a CROSS JOIN v WHERE anchor_id <> neighbor_id), "
    "pos AS (SELECT anchor_id, neighbor_id AS pos_id, cos_sim AS pos_sim FROM ("
    "SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id "
    "ORDER BY cos_sim ASC, neighbor_id ASC) AS rn FROM sims "
    "WHERE a_label = n_label) WHERE rn = 1), "
    "neg AS (SELECT anchor_id, neighbor_id AS neg_id, cos_sim AS neg_sim FROM ("
    "SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id "
    "ORDER BY cos_sim DESC, neighbor_id ASC) AS rn FROM sims "
    "WHERE a_label <> n_label) WHERE rn = 1) "
    "SELECT p.anchor_id, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim, "
    "p.pos_sim - n.neg_sim AS margin "
    "FROM pos p JOIN neg n ON p.anchor_id = n.anchor_id"
)


def _q_embedding_ann_lsh(spark, sf_dir):
    from dachshund_spark.pipeline.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(
        emb, emb.where(F.col("vec_id") < 10), k=5, num_planes=12, bands=6
    )


def _q_minhash_lsh_candidates(spark, sf_dir):
    from dachshund_spark.pipeline.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(
        load_table(spark, sf_dir, "documents"), num_perm=8, bands=4
    )


def _q_kcore(spark, sf_dir):
    from dachshund_spark.algorithms.coreness import k_core

    return k_core(derived_graph(spark, sf_dir), k=10, components=False)


def _weighted_graph(spark, sf_dir):
    """Deduped derived edges + deterministic symmetric weights
    wt = (src+dst) % 5 + 1 (same convention as pagerank_weighted_10)."""
    g = derived_graph(spark, sf_dir)
    we = g.edges.distinct().withColumn(
        "wt", (F.pmod(F.col("src") + F.col("dst"), F.lit(5)) + 1).cast("double")
    )
    return LinkGraph(we, extra_cols=["wt"])


def _q_weighted_kcore(spark, sf_dir):
    """Strength-peel weighted k-core at strength >= 260 (6 cascade
    rounds to fixpoint at sf0.01); integer-valued
    weight sums cast long for exact hashing."""
    from dachshund_spark.algorithms.coreness import weighted_k_core

    out = weighted_k_core(_weighted_graph(spark, sf_dir), k=260.0)
    return out.select(
        "node_id", F.col("strength").cast("long").alias("strength")
    )


def _q_weighted_clustering(spark, sf_dir):
    """Barrat weighted clustering coefficients on the weighted derived
    graph."""
    from dachshund_spark.algorithms.triangles import weighted_clustering

    out = weighted_clustering(_weighted_graph(spark, sf_dir))
    return out.select(
        "node_id",
        F.col("strength").cast("long").alias("strength"),
        F.round("wclustering", 8).alias("wclustering"),
    )


def _q_coreness_all(spark, sf_dir):
    from dachshund_spark.algorithms.coreness import coreness_hindex

    return coreness_hindex(derived_graph(spark, sf_dir), fixed_iterations=16)


def _q_ktruss(spark, sf_dir):
    from dachshund_spark.algorithms.coreness import k_truss

    return k_truss(derived_graph(spark, sf_dir), k=5)


def _q_truss_edges(spark, sf_dir):
    """k=4 slice of the one-fixpoint truss decomposition on the
    256-node subgraph: the trussness >= 4 canonical edges must equal
    the peel-based k-truss survivor set (oracle reuses the unrolled
    k-truss SQL restricted to the same subgraph)."""
    from dachshund_spark.algorithms.coreness import trussness

    e = derived_graph(spark, sf_dir).edges
    sub = LinkGraph(e.where((F.col("src") < 256) & (F.col("dst") < 256)))
    tr = trussness(sub)
    return tr.where(F.col("trussness") >= 4).select("src", "dst")


def _q_bfs(spark, sf_dir):
    from dachshund_spark.algorithms.paths import all_distances

    return all_distances(derived_graph(spark, sf_dir), 0)


def _small_graph(spark, sf_dir):
    e = derived_graph(spark, sf_dir).edges
    return LinkGraph(e.where((F.col("src") < 64) & (F.col("dst") < 64)))


def _q_neighborhood(spark, sf_dir):
    """Exact neighborhood function N(t) on the 64-node subgraph —
    fixture-scale twin of the HyperBall sketch path (same curve,
    pinned bit-exact to it in tests/test_neighborhood.py)."""
    from dachshund_spark.algorithms.neighborhood import neighborhood_function_exact

    return neighborhood_function_exact(_small_graph(spark, sf_dir), max_distance=8)


def _q_eff_diameter(spark, sf_dir):
    """Interpolated 90% effective diameter of the 64-node subgraph
    (ANF convention): target = 0.9*N(inf), one compare, one division —
    the expression tree matches the oracle term-for-term."""
    from dachshund_spark.algorithms.neighborhood import effective_diameter

    return effective_diameter(_small_graph(spark, sf_dir), max_distance=8)


def _eff_diameter_sql(max_node: int = 64, levels: int = 8) -> str:
    parts = _neighborhood_parts(max_node, levels)
    parts += [
        "mx AS (SELECT MAX(n_pairs) AS nmax FROM curve)",
        "lagged AS MATERIALIZED (SELECT distance, n_pairs, "
        "LAG(n_pairs) OVER (ORDER BY distance) AS prev, "
        "CAST(0.9 AS DOUBLE) * CAST((SELECT nmax FROM mx) AS DOUBLE) AS target "
        "FROM curve)",
        "hit AS (SELECT * FROM lagged "
        "WHERE CAST(n_pairs AS DOUBLE) >= target ORDER BY distance LIMIT 1)",
    ]
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT CASE WHEN distance = 0 THEN CAST(0 AS DOUBLE) ELSE "
        "(distance - 1) + (target - CAST(prev AS DOUBLE)) / "
        "(CAST(n_pairs AS DOUBLE) - CAST(prev AS DOUBLE)) END "
        "AS effective_diameter FROM hit"
    )


def _q_harmonic(spark, sf_dir):
    """Exact harmonic/closeness centrality on the 64-node subgraph
    (first-seen ball expansion; per-level 1/d accumulation)."""
    from dachshund_spark.algorithms.neighborhood import harmonic_centrality_exact

    out = harmonic_centrality_exact(_small_graph(spark, sf_dir), max_distance=8)
    return out.select(
        "node_id",
        "reachable",
        F.round("harmonic", 8).alias("harmonic"),
        F.round("closeness", 8).alias("closeness"),
    )


def _q_hyperball_harmonic(spark, sf_dir):
    """HyperBall sketch harmonic centrality on the 64-node subgraph.
    DataSketches HLL is exact in sparse mode at 64 nodes, so the SKETCH
    path itself carries a full DuckDB oracle here (same ball-expansion
    SQL as the exact twin)."""
    from dachshund_spark.algorithms.neighborhood import harmonic_centrality

    out = harmonic_centrality(_small_graph(spark, sf_dir), max_distance=8, lg_k=12)
    return out.select(
        "node_id",
        "ball_size",
        F.round("harmonic", 8).alias("harmonic"),
    )


def _q_distance_summary(spark, sf_dir):
    """Avg distance / effective diameter / reachable pairs derived from
    the exact N(t) curve of the 64-node subgraph."""
    from dachshund_spark.algorithms.neighborhood import (
        distance_summary,
        neighborhood_function_exact,
    )

    nf = neighborhood_function_exact(_small_graph(spark, sf_dir), max_distance=8)
    out = distance_summary(nf)
    return out.select(
        F.round("avg_distance", 8).alias("avg_distance"),
        F.round("effective_diameter", 8).alias("effective_diameter"),
        "reachable_pairs",
    )


def _q_weighted_sssp(spark, sf_dir):
    """Bellman-Ford on the symmetrized 64-node subgraph with synthetic
    integer weights, fixed 10 relaxation rounds (oracle-deterministic)."""
    from dachshund_spark.algorithms.paths import weighted_sssp

    sub = _small_graph(spark, sf_dir)
    wund = sub.undirected_edges().withColumn(
        "wt", (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1).cast("double")
    )
    return weighted_sssp(
        LinkGraph(wund, extra_cols=["wt"]), 0, "wt", fixed_rounds=10
    )


def _q_kmv(spark, sf_dir):
    """KMV distinct-token estimate (k=64 smallest 40-bit hashes),
    integer-exact in both engines, with the true count alongside."""
    from dachshund_spark.pipeline.sketches import kmv_estimate

    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
    )
    return kmv_estimate(toks, "token", k=64)


_KMV_SQL = (
    "WITH t AS MATERIALIZED (SELECT DISTINCT "
    "CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) % 1099511627776 AS h "
    "FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)), "
    "kth AS MATERIALIZED (SELECT MAX(h) AS kth_hash, COUNT(*) AS got FROM "
    "(SELECT h FROM t ORDER BY h LIMIT 64)), "
    "ex AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM t) "
    "SELECT CAST(64 AS INT) AS k, CAST(kth_hash AS BIGINT) AS kth_hash, "
    "CAST(CASE WHEN got < 64 THEN exact_distinct "
    "ELSE CAST(63 AS BIGINT) * CAST(1099511627776 AS BIGINT) // kth_hash END "
    "AS BIGINT) AS est_distinct, exact_distinct "
    "FROM kth, ex"
)

def _q_widest_path(spark, sf_dir):
    """Max-bottleneck (widest) path capacities from node 0 on the
    weighted 64-node subgraph — (max, min) Bellman-Ford, 10 fixed
    rounds, integer weights end-to-end."""
    from dachshund_spark.algorithms.paths import widest_path

    sub = _small_graph(spark, sf_dir)
    wund = sub.undirected_edges().withColumn(
        "wt", (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1).cast("long")
    )
    return widest_path(
        LinkGraph(wund, extra_cols=["wt"]), 0, "wt", fixed_rounds=10
    )


def _widest_path_sql(source: int = 0, rounds: int = 10, max_node: int = 64) -> str:
    parts = [
        SQL_E,
        f"sube AS MATERIALIZED (SELECT src, dst FROM edges_raw WHERE src < {max_node} AND dst < {max_node})",
        "subsym AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM sube UNION ALL SELECT dst AS src, src AS dst FROM sube) "
        "WHERE src <> dst)",
        "wsub AS MATERIALIZED (SELECT src, dst, CAST((src + dst) % 7 + 1 AS BIGINT) AS wt FROM subsym)",
        "subn AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM subsym)",
        f"c0 AS MATERIALIZED (SELECT node_id, "
        f"CASE WHEN node_id = {source} THEN CAST(4611686018427387904 AS BIGINT) END AS cap FROM subn)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"x{i} AS MATERIALIZED (SELECT e.dst AS node_id, "
            f"MAX(LEAST(p.cap, e.wt)) AS cand "
            f"FROM wsub e JOIN c{i-1} p ON e.src = p.node_id "
            f"WHERE p.cap IS NOT NULL GROUP BY e.dst)"
        )
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT n.node_id, "
            f"CASE WHEN c.cand IS NULL THEN n.cap "
            f"WHEN n.cap IS NULL THEN c.cand "
            f"ELSE GREATEST(n.cap, c.cand) END AS cap "
            f"FROM c{i-1} n LEFT JOIN x{i} c ON n.node_id = c.node_id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, CASE WHEN node_id <> {source} THEN cap END "
        f"AS capacity FROM c{rounds}"
    )


def _q_attr_assortativity(spark, sf_dir):
    """Newman nominal assortativity by the synthetic class node_id % 4:
    cleared-denominator integer form, single final division."""
    from dachshund_spark.algorithms.stats import attribute_assortativity

    g = derived_graph(spark, sf_dir)
    classes = g.nodes().select("node_id", (F.col("node_id") % 4).alias("cls"))
    return attribute_assortativity(g, classes)


_ATTR_ASSORT_SQL = (
    f"WITH {SQL_E}, {SQL_U}, "
    "ec AS MATERIALIZED (SELECT src % 4 AS cs, dst % 4 AS cd FROM und), "
    "pc AS MATERIALIZED (SELECT cs, COUNT(*) AS s_i, "
    "SUM(CASE WHEN cs = cd THEN 1 ELSE 0 END) AS same_i FROM ec GROUP BY cs), "
    "mo AS MATERIALIZED (SELECT SUM(s_i) AS m, SUM(same_i) AS same, "
    "SUM(s_i * s_i) AS ss FROM pc) "
    "SELECT CAST(m AS BIGINT) AS m_edges, CAST(same AS BIGINT) AS same_class, "
    "CAST(ss AS BIGINT) AS sum_sq, "
    "CASE WHEN m * m - ss <> 0 THEN "
    "CAST(m * same - ss AS DOUBLE) / CAST(m * m - ss AS DOUBLE) END "
    "AS assortativity FROM mo"
)

def _q_assortativity(spark, sf_dir):
    """Newman degree assortativity of the full derived graph — sums of
    integer-valued doubles are exact, so the statistic is bit-stable;
    rounded to 8 decimals for the hash compare."""
    from dachshund_spark.algorithms.stats import degree_assortativity

    out = degree_assortativity(derived_graph(spark, sf_dir))
    return out.select(F.round("assortativity", 8).alias("assortativity"))


def _q_reciprocity(spark, sf_dir):
    """Directed-edge reciprocity (Garlaschelli & Loffredo) of the full
    derived graph."""
    from dachshund_spark.algorithms.stats import reciprocity

    out = reciprocity(derived_graph(spark, sf_dir))
    return out.select(
        "n_edges",
        "n_reciprocal",
        F.round("reciprocity", 8).alias("reciprocity"),
    )


def _q_degree_distribution(spark, sf_dir):
    """log2-binned degree histogram (power-law diagnostic); the bin is
    binary-digit-count − 1, integer-exact on both engines."""
    from dachshund_spark.algorithms.stats import degree_distribution

    return degree_distribution(derived_graph(spark, sf_dir))


def _q_scc(spark, sf_dir):
    """Strongly connected components of the directed 64-node subgraph
    (trim + forward-max-coloring + backward containment; the directed
    web-graph extension of the reference's undirected CC,
    connected_components.rs:26-70)."""
    from dachshund_spark.algorithms.scc import strongly_connected_components

    return strongly_connected_components(_small_graph(spark, sf_dir))


def _q_dag_levels(spark, sf_dir):
    """Topological levels of the 64-node subgraph's SCC condensation
    (dependency layering after cycle collapse) — exact longest-path
    levels in both engines."""
    from dachshund_spark.algorithms.scc import condensation_levels

    return condensation_levels(_small_graph(spark, sf_dir))


def _dag_levels_sql(max_node: int = 64) -> str:
    return (
        _scc_closure_sql(max_node) + ", "
        "cedges AS MATERIALIZED (SELECT DISTINCT s.scc_id AS src, "
        "d.scc_id AS dst FROM sube e "
        "JOIN scc s ON e.src = s.node_id JOIN scc d ON e.dst = d.node_id "
        "WHERE s.scc_id <> d.scc_id), "
        "lev(c, d) AS (SELECT DISTINCT scc_id, 0 FROM scc "
        "UNION SELECT ce.dst, l.d + 1 FROM lev l JOIN cedges ce ON ce.src = l.c) "
        "SELECT c AS scc_id, CAST(MAX(d) AS BIGINT) AS level FROM lev GROUP BY c"
    )


def _q_bowtie(spark, sf_dir):
    """Web bow-tie decomposition (Broder et al. 2000) relative to the
    largest SCC of the directed 64-node subgraph."""
    from dachshund_spark.algorithms.scc import bow_tie

    return bow_tie(_small_graph(spark, sf_dir))


def _q_evcent_dist(spark, sf_dir):
    """Distributed power-iteration evcent on the 64-node subgraph,
    fixed 10 supersteps — the scale-path twin of evcent_local, with an
    unrolled DuckDB oracle."""
    from dachshund_spark.algorithms.evcent import eigenvector_centrality_distributed

    out = eigenvector_centrality_distributed(
        _small_graph(spark, sf_dir), fixed_iterations=10
    )
    return out.select("node_id", F.round("evcent", 6).alias("evcent"))


def _q_evcent_local(spark, sf_dir):
    """Cross-equality check of the pandas-island evcent kernel against
    its oracled distributed twin: rows are the 10-superstep distributed
    values (bit-matching _evcent_sql), emitted ONLY where the local
    kernel agrees within 0.01 (measured gap between the eps=1e-3
    converged kernel and the 10-superstep power iteration is ~8e-4) —
    a broken/missing/NaN local value drops its row and fails the
    driver's row/hash compare."""
    from dachshund_spark.algorithms.evcent import eigenvector_centrality_distributed
    from dachshund_spark.local import eigenvector_centrality

    sub = _small_graph(spark, sf_dir)
    local = eigenvector_centrality(sub).select(
        "node_id", F.col("evcent").alias("_ev_local")
    )
    dist = eigenvector_centrality_distributed(sub, fixed_iterations=10)
    return (
        dist.join(local, on="node_id")
        .where(F.abs(F.col("evcent") - F.col("_ev_local")) <= 0.01)
        .select("node_id", F.round("evcent", 6).alias("evcent"))
    )


def _q_betweenness_dist(spark, sf_dir):
    """Distributed Brandes on the 64-node subgraph, sources = subgraph
    nodes < 16 — the scale-path twin of betweenness_local, with a fully
    unrolled DuckDB oracle (forward BFS + reverse dependency levels)."""
    from dachshund_spark.algorithms.betweenness import betweenness_sampled

    sub = _small_graph(spark, sf_dir)
    sources = sub.nodes().where(F.col("node_id") < 16).select(
        F.col("node_id").alias("source")
    )
    out = betweenness_sampled(sub, sources=sources)
    return out.select("node_id", F.round("betweenness", 6).alias("betweenness"))


def _q_edge_betweenness(spark, sf_dir):
    """Girvan-Newman edge betweenness on the 64-node subgraph, sources
    = subgraph nodes < 16 — same Brandes recurrence as
    betweenness_dist aggregated on the traversed edge, canonical
    (u, v), ROUND 6 both sides (order-dependent double sums)."""
    from dachshund_spark.algorithms.betweenness import edge_betweenness_sampled

    sub = _small_graph(spark, sf_dir)
    sources = sub.nodes().where(F.col("node_id") < 16).select(
        F.col("node_id").alias("source")
    )
    out = edge_betweenness_sampled(sub, sources=sources)
    return out.select("u", "v", F.round("betweenness", 6).alias("betweenness"))


def _q_betweenness_local(spark, sf_dir):
    """Cross-equality check of the pandas-island Brandes kernel against
    the distributed Brandes run over ALL sources (exact betweenness,
    measured agreement ~3e-14): rows are the distributed values
    (bit-matching _betweenness_sql(8, 64, 64)), emitted only where the
    local kernel agrees within 1e-6."""
    from dachshund_spark.algorithms.betweenness import betweenness_sampled
    from dachshund_spark.local import betweenness

    sub = _small_graph(spark, sf_dir)
    local = betweenness(sub).select(
        "node_id", F.col("betweenness").alias("_b_local")
    )
    allsrc = sub.nodes().select(F.col("node_id").alias("source"))
    dist = betweenness_sampled(sub, sources=allsrc)
    return (
        dist.join(local, on="node_id")
        .where(F.abs(F.col("betweenness") - F.col("_b_local")) <= 1e-6)
        .select("node_id", F.round("betweenness", 6).alias("betweenness"))
    )


def _cnm_sql(rounds: int = 63) -> str:
    """Full unrolled DuckDB replay of the CNM greedy merge gain
    sequence (cnm_communities.rs:79-281) on the 64-node subgraph —
    bit-exact doubles, no tolerance.

    Key insight: after every merge the kernel's heaps are rebuilt to
    exactly mirror the symmetric pair→ΔQ map, so the whole state is
    one canonical (i, j, dq) table; the selection rule collapses to
    ORDER BY dq DESC, i ASC, j ASC (both orientations share a dq, so
    the heap's (-dq, owner, other) minimum is the canonical pair).
    Every ΔQ is a fixed-shape scalar expression tree over exact
    integers and previously-derived doubles (no multi-row float SUM
    anywhere), so Spark's pandas kernel and DuckDB agree to the bit.
    63 rounds ≥ the 64-node maximum merge count; converged rounds are
    no-ops guarded by the dq > 0 merge gate."""
    M = "(SELECT m FROM cst)"
    parts = [
        SQL_E,
        "fze AS MATERIALIZED (SELECT src, dst FROM edges_raw WHERE src < 64 AND dst < 64)",
        "fsc AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS src, "
        "GREATEST(src, dst) AS dst FROM fze)",
        "fsu AS MATERIALIZED (SELECT src, dst FROM fsc UNION ALL "
        "SELECT dst AS src, src AS dst FROM fsc)",
        # community index = rank of node id (the kernel's idx map)
        "rk AS MATERIALIZED (SELECT node_id, CAST(ROW_NUMBER() OVER (ORDER BY node_id) - 1 AS BIGINT) AS r "
        "FROM (SELECT DISTINCT src AS node_id FROM fsu))",
        "cst AS MATERIALIZED (SELECT COUNT(*) AS m FROM fsc)",
        "dg0 AS MATERIALIZED (SELECT k.r AS c, COUNT(*) AS dg FROM fsu u "
        "JOIN rk k ON u.src = k.node_id GROUP BY k.r)",
        # initial dq = 1/m - 2*(di*dj)/(2m)^2 on canonical rank pairs
        f"b0 AS MATERIALIZED (SELECT ri.r AS i, rj.r AS j, "
        f"(1.0 / {M}) - (2.0 * (di.dg * dj.dg)) / CAST((2 * {M}) * (2 * {M}) AS DOUBLE) AS dq "
        f"FROM fsc e JOIN rk ri ON e.src = ri.node_id JOIN rk rj ON e.dst = rj.node_id "
        f"JOIN dg0 di ON di.c = ri.r JOIN dg0 dj ON dj.c = rj.r)",
    ]
    for r in range(rounds):
        parts.append(
            f"t{r} AS MATERIALIZED (SELECT i, j, dq FROM b{r} "
            f"ORDER BY dq DESC, i ASC, j ASC LIMIT 1)"
        )
        # merge gate: smaller index mi absorbs into mj while max ΔQ > 0
        parts.append(
            f"cm{r} AS MATERIALIZED (SELECT t.i AS mi, t.j AS mj, di.dg AS di, dj.dg AS dj "
            f"FROM t{r} t JOIN dg{r} di ON di.c = t.i JOIN dg{r} dj ON dj.c = t.j "
            f"WHERE t.dq > 0.0)"
        )
        parts.append(
            f"kq{r} AS MATERIALIZED (SELECT "
            f"CASE WHEN b.i IN (c.mi, c.mj) THEN b.j ELSE b.i END AS k, "
            f"CASE WHEN b.i = c.mi OR b.j = c.mi THEN b.dq END AS qik, "
            f"CASE WHEN b.i = c.mj OR b.j = c.mj THEN b.dq END AS qjk "
            f"FROM b{r} b CROSS JOIN cm{r} c "
            f"WHERE (b.i IN (c.mi, c.mj) OR b.j IN (c.mi, c.mj)) "
            f"AND NOT (b.i IN (c.mi, c.mj) AND b.j IN (c.mi, c.mj)))"
        )
        parts.append(
            f"kn{r} AS MATERIALIZED (SELECT k, MAX(qik) AS qik, MAX(qjk) AS qjk "
            f"FROM kq{r} GROUP BY k)"
        )
        # pre-merge degrees feed the missing-side correction terms
        parts.append(
            f"nw{r} AS MATERIALIZED (SELECT LEAST(c.mj, k.k) AS i, GREATEST(c.mj, k.k) AS j, "
            f"CASE WHEN k.qik IS NOT NULL AND k.qjk IS NOT NULL THEN k.qik + k.qjk "
            f"WHEN k.qik IS NOT NULL THEN k.qik - (CAST(c.dj AS DOUBLE) / {M}) * (CAST(d.dg AS DOUBLE) / (2 * {M})) "
            f"ELSE k.qjk - (CAST(c.di AS DOUBLE) / {M}) * (CAST(d.dg AS DOUBLE) / (2 * {M})) END AS dq "
            f"FROM kn{r} k CROSS JOIN cm{r} c JOIN dg{r} d ON d.c = k.k)"
        )
        parts.append(
            f"b{r+1} AS MATERIALIZED (SELECT b.i, b.j, b.dq FROM b{r} b "
            f"WHERE NOT EXISTS (SELECT 1 FROM cm{r} c "
            f"WHERE b.i IN (c.mi, c.mj) OR b.j IN (c.mi, c.mj)) "
            f"UNION ALL SELECT i, j, dq FROM nw{r})"
        )
        parts.append(
            f"dg{r+1} AS MATERIALIZED (SELECT d.c, "
            f"CASE WHEN c.mj IS NOT NULL AND d.c = c.mj THEN d.dg + c.di ELSE d.dg END AS dg "
            f"FROM dg{r} d LEFT JOIN cm{r} c ON 1 = 1 "
            f"WHERE c.mi IS NULL OR d.c <> c.mi)"
        )
        # the kernel appends the post-merge max even when it is <= 0
        # (that value is the loop's break witness) — mirror exactly
        parts.append(
            f"chg{r+1} AS MATERIALIZED (SELECT {r+1} AS step, dq FROM "
            f"(SELECT dq FROM b{r+1} ORDER BY dq DESC, i ASC, j ASC LIMIT 1) "
            f"WHERE EXISTS (SELECT 1 FROM cm{r}))"
        )
    sel = ["SELECT 0 AS step, dq AS modularity_change FROM t0"]
    sel += [
        f"SELECT step, dq AS modularity_change FROM chg{r}"
        for r in range(1, rounds + 1)
    ]
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(sel)


def _q_cnm_local(spark, sf_dir):
    """CNM greedy modularity gain sequence from the pandas-island heap
    kernel — full bit-exact oracle via _cnm_sql's per-merge unroll
    (VERDICT r3 #9)."""
    from dachshund_spark.local import cnm_modularity_changes

    return cnm_modularity_changes(_small_graph(spark, sf_dir))


def _fz_cc_parts(pfx: str, edge_cte: str, rounds: int = 24) -> list[str]:
    """Min-label CC over a symmetrized edge CTE; final labels in
    ``{pfx}f`` (node_id, label).  24 rounds ≥ the 64-node subgraph's
    diameter at both SFs (verified vs the sequential kernel)."""
    parts = [
        f"{pfx}n AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM {edge_cte})",
        f"{pfx}0 AS MATERIALIZED (SELECT node_id, node_id AS label FROM {pfx}n)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"{pfx}{i} AS MATERIALIZED (SELECT n.node_id, "
            f"CASE WHEN m.minl IS NULL OR n.label <= m.minl THEN n.label ELSE m.minl END AS label "
            f"FROM {pfx}{i-1} n LEFT JOIN ("
            f"SELECT u.dst AS node_id, MIN(l.label) AS minl "
            f"FROM {edge_cte} u JOIN {pfx}{i-1} l ON u.src = l.node_id GROUP BY u.dst) m "
            f"ON n.node_id = m.node_id)"
        )
    parts.append(f"{pfx}f AS MATERIALIZED (SELECT node_id, label FROM {pfx}{rounds})")
    return parts


def _fz_peel_parts(pfx: str, edge_cte: str, k: int, rounds: int = 12) -> list[str]:
    """Synchronous min-degree-k peel; surviving symmetrized edges in
    ``{pfx}s``.  12 synchronous rounds reach the (unique) k-core
    fixpoint on the 64-node subgraph at both SFs."""
    parts = [f"{pfx}p0 AS MATERIALIZED (SELECT src, dst FROM {edge_cte})"]
    for i in range(rounds):
        parts.append(
            f"{pfx}b{i} AS MATERIALIZED (SELECT src FROM "
            f"(SELECT src, COUNT(*) AS c FROM {pfx}p{i} GROUP BY src) t WHERE c < {k})"
        )
        parts.append(
            f"{pfx}p{i+1} AS MATERIALIZED (SELECT e.src, e.dst FROM {pfx}p{i} e "
            f"WHERE e.src NOT IN (SELECT src FROM {pfx}b{i}) "
            f"AND e.dst NOT IN (SELECT src FROM {pfx}b{i}))"
        )
    parts.append(f"{pfx}s AS MATERIALIZED (SELECT src, dst FROM {pfx}p{rounds})")
    return parts


def _fz_truss_parts(pfx: str, k: int, support_rounds: int = 8) -> list[str]:
    """(k-1)-core pre-peel then synchronous support-<k-2 edge drop
    (the kernel's loop, coreness.rs:74-156); surviving symmetrized
    edges in ``{pfx}ts``."""
    parts = _fz_peel_parts(f"{pfx}c", "fsu", k - 1)
    parts.append(
        f"{pfx}e0 AS MATERIALIZED (SELECT src, dst FROM {pfx}cs WHERE src < dst)"
    )
    for i in range(support_rounds):
        parts.append(
            f"{pfx}u{i} AS MATERIALIZED (SELECT src, dst FROM {pfx}e{i} "
            f"UNION ALL SELECT dst AS src, src AS dst FROM {pfx}e{i})"
        )
        parts.append(
            f"{pfx}s{i} AS MATERIALIZED (SELECT e.src, e.dst, COUNT(*) AS supp "
            f"FROM {pfx}e{i} e JOIN {pfx}u{i} x ON x.src = e.src "
            f"JOIN {pfx}u{i} y ON y.src = e.dst AND y.dst = x.dst "
            f"GROUP BY e.src, e.dst)"
        )
        parts.append(
            f"{pfx}e{i+1} AS MATERIALIZED (SELECT e.src, e.dst FROM {pfx}e{i} e "
            f"LEFT JOIN {pfx}s{i} s ON s.src = e.src AND s.dst = e.dst "
            f"WHERE COALESCE(s.supp, 0) >= {k - 2})"
        )
    parts.append(
        f"{pfx}ts AS MATERIALIZED (SELECT src, dst FROM {pfx}e{support_rounds} "
        f"UNION ALL SELECT dst AS src, src AS dst FROM {pfx}e{support_rounds})"
    )
    return parts


def _featurize_sql() -> str:
    """DuckDB replay of the featurizer's 14 JSON fields
    (simple_transformer.rs:41-83) on the 64-node subgraph — counts are
    exact integers; the three floor3 means are computed in integer
    space: per-node values pre-rounded to 1e-6/1e-8-scaled BIGINTs,
    summed exactly, then floor(x*1000) = S // (scale * n) so the
    final value is a single engine-stable cast.  Brandes parts and the
    fixed-10 evcent iteration are the proven betweenness_local /
    evcent_dist templates (kernel↔replay agreement gated Spark-side)."""
    parts = [
        SQL_E,
        "fse AS MATERIALIZED (SELECT src, dst FROM edges_raw WHERE src < 64 AND dst < 64)",
        "fsc AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS src, "
        "GREATEST(src, dst) AS dst FROM fse)",
        "fsu AS MATERIALIZED (SELECT src, dst FROM fsc UNION ALL SELECT dst AS src, src AS dst FROM fsc)",
    ]
    parts += _fz_cc_parts("gcc", "fsu")
    parts.append(
        "gsz AS MATERIALIZED (SELECT label, COUNT(*) AS cnt FROM gccf GROUP BY label)"
    )
    # kernel ties: comps ordered by smallest member, Python max keeps the
    # first maximum -> largest label = (cnt DESC, label ASC) first row
    parts.append(
        "glc AS MATERIALIZED (SELECT label, cnt FROM gsz ORDER BY cnt DESC, label ASC LIMIT 1)"
    )
    for k in (2, 4, 8, 16):
        parts += _fz_peel_parts(f"kc{k}", "fsu", k)
        parts += _fz_cc_parts(f"kcc{k}", f"kc{k}s")
    for k in (3, 5, 9, 17):
        parts += _fz_truss_parts(f"kt{k}", k)
        parts += _fz_cc_parts(f"ktc{k}", f"kt{k}ts")
    parts += _brandes_parts(8, 64, 64)[1:]  # [0] is SQL_E, already present
    parts.append(
        "betn AS MATERIALIZED (SELECT n.node_id, "
        "CAST(ROUND(COALESCE(bt.b, 0.0) * 1000000.0, 0) AS BIGINT) AS e6 "
        "FROM subn n LEFT JOIN ("
        "SELECT node AS node_id, SUM(dep) AS b FROM dep1 WHERE node <> s "
        "GROUP BY node) bt ON n.node_id = bt.node_id)"
    )
    parts.append(
        "betm AS MATERIALIZED (SELECT SUM(b.e6) AS s, COUNT(*) AS n FROM betn b "
        "JOIN gccf c ON b.node_id = c.node_id WHERE c.label = (SELECT label FROM glc))"
    )
    # fixed-10 max-normalized power iteration over the Brandes sub/subn
    # (no self-loops in the derived edges, so the edge sets coincide)
    parts.append("fnn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM subn)")
    parts.append(
        "fx0 AS MATERIALIZED (SELECT node_id, 1.0 / (SELECT n FROM fnn) AS x FROM subn)"
    )
    for i in range(1, 11):
        parts.append(
            f"fs{i} AS MATERIALIZED (SELECT e.dst AS node_id, SUM(p.x) AS s "
            f"FROM sub e JOIN fx{i-1} p ON e.src = p.node_id GROUP BY e.dst)"
        )
        parts.append(f"fm{i} AS MATERIALIZED (SELECT MAX(s) AS mx FROM fs{i})")
        parts.append(
            f"fx{i} AS MATERIALIZED (SELECT n.node_id, "
            f"COALESCE(s.s / (SELECT mx FROM fm{i}), 0.0) AS x "
            f"FROM subn n LEFT JOIN fs{i} s ON n.node_id = s.node_id)"
        )
    parts.append(
        "evm AS MATERIALIZED (SELECT SUM(CAST(ROUND(x * 1000000.0, 0) AS BIGINT)) AS s, "
        "COUNT(*) AS n FROM fx10)"
    )
    parts.append(
        "ftri AS MATERIALIZED (SELECT a.src AS u, a.dst AS v, b.dst AS w "
        "FROM fsc a JOIN fsc b ON a.dst = b.src "
        "JOIN fsc c ON c.src = a.src AND c.dst = b.dst)"
    )
    parts.append(
        "ftc AS MATERIALIZED (SELECT node_id, COUNT(*) AS tri FROM "
        "(SELECT u AS node_id FROM ftri UNION ALL SELECT v FROM ftri "
        "UNION ALL SELECT w FROM ftri) GROUP BY node_id)"
    )
    parts.append(
        "fdeg AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS degree FROM fsu GROUP BY src)"
    )
    parts.append(
        "fcl AS MATERIALIZED (SELECT d.node_id, "
        "CAST(ROUND((2.0 * COALESCE(t.tri, 0) / (d.degree * (d.degree - 1))) * 100000000.0, 0) AS BIGINT) AS e8 "
        "FROM fdeg d LEFT JOIN ftc t ON d.node_id = t.node_id WHERE d.degree >= 2)"
    )
    parts.append("fclm AS MATERIALIZED (SELECT SUM(e8) AS s, COUNT(*) AS n FROM fcl)")

    selects = [
        "SELECT 'num_edges' AS field, CAST((SELECT COUNT(*) FROM fsc) AS DOUBLE) AS value",
        "SELECT 'num_connected_components', CAST((SELECT COUNT(DISTINCT label) FROM gccf) AS DOUBLE)",
        "SELECT 'size_of_largest_cc', CAST((SELECT cnt FROM glc) AS DOUBLE)",
    ]
    for k in (2, 4, 8, 16):
        selects.append(
            f"SELECT 'num_{k}_cores', CAST((SELECT COUNT(DISTINCT label) FROM kcc{k}f) AS DOUBLE)"
        )
    for k in (3, 5, 9, 17):
        selects.append(
            f"SELECT 'num_{k}_trusses', CAST((SELECT COUNT(DISTINCT label) FROM ktc{k}f) AS DOUBLE)"
        )
    selects.append(
        "SELECT 'bet_cent', CAST((SELECT s // (1000 * n) FROM betm) AS DOUBLE) / 1000.0"
    )
    selects.append(
        "SELECT 'evcent', CAST((SELECT s // (1000 * CAST(n AS BIGINT)) FROM evm) AS DOUBLE) / 1000.0"
    )
    selects.append(
        "SELECT 'clust_coef', CAST((SELECT s // (100000 * n) FROM fclm) AS DOUBLE) / 1000.0"
    )
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(selects)


def _q_featurize_local(spark, sf_dir):
    """Cross-equality flip of the featurizer (VERDICT r3 #9): one row
    per stats field, value = the distributed replay of that field
    (exact integers for the 11 counts; e6/e8 pre-rounded integer
    floor3 for bet_cent / evcent / clust_coef, matching
    _featurize_sql bit-for-bit), emitted ONLY where the pandas-island
    kernel's JSON field agrees (exact for counts, grid-tolerance for
    the three floored means) — a broken kernel field drops its row and
    fails the driver's row/hash compare."""
    from dachshund_spark.algorithms.betweenness import betweenness_sampled
    from dachshund_spark.algorithms.components import connected_components
    from dachshund_spark.algorithms.coreness import k_core, k_truss
    from dachshund_spark.algorithms.evcent import (
        eigenvector_centrality_distributed,
    )
    from dachshund_spark.algorithms.triangles import clustering_coefficients
    from dachshund_spark.local import featurize

    sub = _small_graph(spark, sf_dir)
    kern = featurize(sub).select(
        F.explode(F.from_json("stats_json", "map<string,double>")).alias(
            "field", "_kval"
        )
    )

    cc = connected_components(sub, renumber=False).persist()
    top = (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("component").asc())
        .first()
    )
    largest_label, largest_cnt = int(top[0]), int(top[1])
    num_cc = cc.select("component").distinct().count()
    num_edges = (
        sub.undirected_edges().where(F.col("src") < F.col("dst")).count()
    )

    rows = [
        ("num_edges", float(num_edges), 0.0),
        ("num_connected_components", float(num_cc), 0.0),
        ("size_of_largest_cc", float(largest_cnt), 0.0),
    ]
    for k in (2, 4, 8, 16):
        n = k_core(sub, k).select("core_id").distinct().count()
        rows.append((f"num_{k}_cores", float(n), 0.0))
    for k in (3, 5, 9, 17):
        n = k_truss(sub, k).select("truss_id").distinct().count()
        rows.append((f"num_{k}_trusses", float(n), 0.0))

    # bet_cent: all-source Brandes (== largest-CC sources: paths never
    # cross components), per-node e6 pre-round, integer floor3 mean
    allsrc = sub.nodes().select(F.col("node_id").alias("source"))
    bet = betweenness_sampled(sub, sources=allsrc)
    s_bet = (
        bet.join(
            cc.where(F.col("component") == largest_label).select("node_id"),
            on="node_id",
        )
        .agg(
            F.sum(
                F.round(F.col("betweenness") * 1000000.0, 0).cast("long")
            ).alias("s")
        )
        .first()[0]
        or 0
    )
    rows.append(("bet_cent", float(s_bet // (1000 * largest_cnt)) / 1000.0, 0.0015))

    ev = eigenvector_centrality_distributed(sub, fixed_iterations=10)
    ev_agg = ev.agg(
        F.sum(F.round(F.col("evcent") * 1000000.0, 0).cast("long")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    s_ev, n_ev = int(ev_agg[0] or 0), int(ev_agg[1])
    # eps=1e-3-converged kernel vs fixed-10 power iteration: measured
    # per-node gap ~8e-4 (evcent_local), plus the 1e-3 floor grid
    rows.append(("evcent", float(s_ev // (1000 * n_ev)) / 1000.0, 0.003))

    cl_agg = (
        clustering_coefficients(sub)
        .where(F.col("clustering").isNotNull())
        .agg(
            F.sum(
                F.round(F.col("clustering") * 100000000.0, 0).cast("long")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    s_cl, n_cl = int(cl_agg[0] or 0), int(cl_agg[1])
    rows.append(("clust_coef", float(s_cl // (100000 * n_cl)) / 1000.0, 0.0015))
    cc.unpersist()

    replay = spark.createDataFrame(rows, "field string, value double, _tol double")
    return (
        kern.join(replay, on="field")
        .where(F.abs(F.col("_kval") - F.col("value")) <= F.col("_tol"))
        .select("field", "value")
    )


def _q_motif_triads(spark, sf_dir):
    """Motif API through the driver gate: per-source counts of closed
    feed-forward triads ((a)->(b)->(c) with (a)->(c)) and open triads
    (closing edge negated) on the directed distinct edge set."""
    from dachshund_spark.motifs import find

    g = derived_graph(spark, sf_dir)
    ffl = (
        find(g, "(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)")
        .groupBy(F.col("a").alias("node_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("pattern", F.lit("ffl"))
    )
    open_ = (
        find(g, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
        .groupBy(F.col("a").alias("node_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("pattern", F.lit("open"))
    )
    return ffl.unionByName(open_).select("pattern", "node_id", "n")


_MOTIF_TRIADS_SQL = (
    f"WITH {SQL_E}, {SQL_D} "
    "SELECT 'ffl' AS pattern, x.a AS node_id, CAST(COUNT(*) AS BIGINT) AS n FROM "
    "(SELECT e1.src AS a, e1.dst AS b, e2.dst AS c FROM d_edges e1 "
    "JOIN d_edges e2 ON e1.dst = e2.src "
    "WHERE EXISTS (SELECT 1 FROM d_edges e3 WHERE e3.src = e1.src AND e3.dst = e2.dst)) x "
    "GROUP BY x.a "
    "UNION ALL "
    "SELECT 'open' AS pattern, y.a AS node_id, CAST(COUNT(*) AS BIGINT) AS n FROM "
    "(SELECT e1.src AS a, e1.dst AS b, e2.dst AS c FROM d_edges e1 "
    "JOIN d_edges e2 ON e1.dst = e2.src "
    "WHERE NOT EXISTS (SELECT 1 FROM d_edges e3 WHERE e3.src = e1.src AND e3.dst = e2.dst)) y "
    "GROUP BY y.a"
)


def _q_host_graph(spark, sf_dir):
    """Host-level reduction of the url link graph: node urls share a
    host per node_id % 32, edges collapse to [src_host, dst_host,
    n_links] — the standard first aggregation of a web crawl (host
    PageRank / spam-mass / domain dedup all run on it)."""
    from dachshund_spark.pages.extract import host_edges

    g = derived_graph(spark, sf_dir)
    urls = g.nodes().select(
        "node_id",
        F.concat(
            F.lit("https://h"),
            F.pmod(F.col("node_id"), F.lit(32)).cast("string"),
            F.lit(".example.com/p/"),
            F.col("node_id").cast("string"),
        ).alias("url"),
    )
    return host_edges(g.edges.distinct(), urls)


_HOST_GRAPH_SQL = (
    f"WITH {SQL_E}, {SQL_D}, "
    "hn AS MATERIALIZED (SELECT node_id, lower(regexp_extract("
    "'https://h' || CAST(node_id % 32 AS VARCHAR) || '.example.com/p/' || CAST(node_id AS VARCHAR), "
    "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)) AS host FROM "
    "(SELECT DISTINCT src AS node_id FROM edges_raw "
    "UNION SELECT DISTINCT dst FROM edges_raw)) "
    "SELECT s.host AS src_host, d.host AS dst_host, "
    "CAST(COUNT(*) AS BIGINT) AS n_links "
    "FROM d_edges e JOIN hn s ON e.src = s.node_id "
    "JOIN hn d ON e.dst = d.node_id "
    "GROUP BY s.host, d.host"
)


def _q_host_pagerank(spark, sf_dir):
    """End-to-end web-pipeline composition: url edge table → host-level
    reduction (n_links edge weights) → 10-iteration WEIGHTED PageRank
    over the host graph — the standard host-authority computation a
    crawl pipeline feeds back into prioritization."""
    from dachshund_spark.algorithms import pagerank
    from dachshund_spark.pages.extract import host_edges

    g = derived_graph(spark, sf_dir)
    urls = g.nodes().select(
        "node_id",
        F.concat(
            F.lit("https://h"),
            F.pmod(F.col("node_id"), F.lit(32)).cast("string"),
            F.lit(".example.com/p/"),
            F.col("node_id").cast("string"),
        ).alias("url"),
    )
    he = host_edges(g.edges.distinct(), urls)
    hg = LinkGraph(
        he.select(
            F.col("src_host").alias("src"),
            F.col("dst_host").alias("dst"),
            F.col("n_links").cast("double").alias("wt"),
        ),
        extra_cols=["wt"],
    )
    pr = pagerank(
        hg,
        weight_col="wt",
        dedupe_edges=False,
        damping=DAMPING,
        fixed_iterations=PAGERANK_ITERS,
    )
    return pr.select(
        F.col("node_id").alias("host"), F.round("pagerank", 8).alias("pagerank")
    )


def _host_pagerank_parts(iters: int = PAGERANK_ITERS, d: float = DAMPING):
    """Shared CTE chain for host-level weighted PageRank; returns
    (parts, final_rank_cte) so composition queries (crawl_frontier)
    reuse the identical expression tree."""
    parts = [
        SQL_E,
        SQL_D,
        "hn AS MATERIALIZED (SELECT node_id, lower(regexp_extract("
        "'https://h' || CAST(node_id % 32 AS VARCHAR) || '.example.com/p/' || CAST(node_id AS VARCHAR), "
        "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)) AS host FROM "
        "(SELECT DISTINCT src AS node_id FROM edges_raw "
        "UNION SELECT DISTINCT dst FROM edges_raw))",
        "hedges AS MATERIALIZED (SELECT s.host AS src, d2.host AS dst, "
        "CAST(COUNT(*) AS DOUBLE) AS wt "
        "FROM d_edges e JOIN hn s ON e.src = s.node_id "
        "JOIN hn d2 ON e.dst = d2.node_id GROUP BY s.host, d2.host)",
        "hnodes AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM "
        "(SELECT src FROM hedges UNION ALL SELECT dst AS src FROM hedges))",
        "hnn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM hnodes)",
        "outw AS MATERIALIZED (SELECT src AS node_id, SUM(wt) AS ow FROM hedges GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT node_id, 1.0 / (SELECT n FROM hnn) AS rank FROM hnodes)",
    ]
    for i in range(iters):
        parts.append(
            f"dang{i} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS dm FROM r{i} r "
            f"LEFT JOIN outw o ON r.node_id = o.node_id WHERE o.node_id IS NULL)"
        )
        parts.append(
            f"r{i+1} AS MATERIALIZED (SELECT n.node_id, "
            f"(1.0 - {d!r}) / (SELECT n FROM hnn) + {d!r} * ("
            f"COALESCE(c.contrib, 0.0) + (SELECT dm FROM dang{i}) / (SELECT n FROM hnn)"
            f") AS rank "
            f"FROM hnodes n LEFT JOIN ("
            f"SELECT e.dst AS node_id, SUM((r.rank / o.ow) * e.wt) AS contrib "
            f"FROM hedges e JOIN r{i} r ON e.src = r.node_id "
            f"JOIN outw o ON e.src = o.node_id GROUP BY e.dst) c "
            f"ON n.node_id = c.node_id)"
        )
    return parts, f"r{iters}"


def _host_pagerank_sql(iters: int = PAGERANK_ITERS, d: float = DAMPING) -> str:
    parts, final = _host_pagerank_parts(iters, d)
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id AS host, ROUND(rank, 8) AS pagerank FROM {final}"
    )


def _q_crawl_frontier(spark, sf_dir):
    """Crawl-prioritization capstone: host authority (weighted host
    PageRank) × host content quality (fraction of the host's documents
    passing the Gopher/C4-style gates) → a priority score per host.
    Documents map to hosts via doc_id % N_NODES % 32 — the same
    deterministic url scheme the host graph uses."""
    from dachshund_spark.pipeline.curate import frontier_priority
    from dachshund_spark.pipeline.text import quality_scores

    hr = _q_host_pagerank(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    q = quality_scores(docs).select("doc_id", "passes_quality")
    dh = docs.select(
        "doc_id",
        F.concat(
            F.lit("h"),
            ((F.col("doc_id") % N_NODES) % 32).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
    ).join(q, on="doc_id")
    return frontier_priority(hr, dh)


def _crawl_frontier_sql(iters: int = PAGERANK_ITERS, d: float = DAMPING) -> str:
    parts, final = _host_pagerank_parts(iters, d)
    parts += [
        f"hpr AS MATERIALIZED (SELECT node_id AS host, ROUND(rank, 8) AS pagerank FROM {final})",
        "dq AS MATERIALIZED (SELECT doc_id, "
        f"'h' || CAST((doc_id % {N_NODES}) % 32 AS VARCHAR) || '.example.com' AS host, "
        "len(string_split(text, ' ')) AS nt, "
        "len(list_filter(string_split(text, ' '), t -> t IN (" + _STOP + "))) AS ns "
        "FROM documents)",
        "hq AS MATERIALIZED (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(CASE WHEN nt >= 10 AND nt <= 100000 "
        "AND ns / CAST(nt AS DOUBLE) < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_docs "
        "FROM dq GROUP BY host)",
    ]
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT p.host, p.pagerank, COALESCE(q.n_docs, 0) AS n_docs, "
        "COALESCE(q.n_quality_docs, 0) AS n_quality_docs, "
        "CASE WHEN COALESCE(q.n_docs, 0) > 0 "
        "THEN ROUND(p.pagerank * (q.n_quality_docs / CAST(q.n_docs AS DOUBLE)), 8) "
        "ELSE 0.0 END AS priority "
        "FROM hpr p LEFT JOIN hq q ON p.host = q.host"
    )


def _q_pages_roundtrip(spark, sf_dir):
    """End-to-end ingestion check: embed the derived graph in synthetic
    pages, re-extract, and verify (a) the edge set survives exactly and
    (b) extracted text is byte-identical to the stored text column.
    The oracle states the invariants (mismatches must be 0)."""
    from dachshund_spark.pages import extract_text, generate_pages, pages_to_edges

    g = derived_graph(spark, sf_dir)
    pages = generate_pages(g)
    edges_df, _nodes = pages_to_edges(pages)
    n_edges = edges_df.distinct().count()
    text_mismatches = pages.where(
        extract_text(F.col("html")) != F.col("text")
    ).count()
    return spark.createDataFrame(
        [(n_edges, text_mismatches)], "n_edges long, text_mismatches long"
    )


def _q_warc_roundtrip(spark, sf_dir):
    """Common-Crawl container round-trip: pages → per-bucket WARC/1.0
    files (per-record gzip members, the real CC layout) → record split
    + HTTP-envelope strip → pages again. Invariants are exact: record
    count and Σ epoch(warc_ts) replay from the node formula in SQL,
    html bytes and timestamps must survive byte-identically, and the
    re-extracted edge set must equal the embedded graph."""
    from dachshund_spark.pages import generate_pages, pages_to_edges
    from dachshund_spark.pages.warc import pages_to_warc_files, warc_to_pages

    g = derived_graph(spark, sf_dir)
    pages = generate_pages(g).persist()
    parsed = warc_to_pages(
        pages_to_warc_files(pages, num_files=8, gzipped=True)
    ).persist()
    n_pages = parsed.count()
    joined = pages.select(
        "url", F.col("html").alias("p_html"), F.col("warc_ts").alias("p_ts")
    ).join(
        parsed.select(
            "url", F.col("html").alias("w_html"), F.col("warc_ts").alias("w_ts")
        ),
        on="url",
        how="full_outer",
    )
    mismatches = joined.where(
        F.col("p_html").isNull()
        | F.col("w_html").isNull()
        | (F.col("p_html") != F.col("w_html"))
        | (F.col("p_ts") != F.col("w_ts"))
    ).count()
    ts_sum = (
        parsed.agg(F.sum(F.unix_timestamp("warc_ts")).cast("long")).collect()[0][0]
    )
    edges_df, _nodes = pages_to_edges(parsed)
    n_edges = edges_df.distinct().count()
    pages.unpersist()
    parsed.unpersist()
    return spark.createDataFrame(
        [(n_pages, n_edges, mismatches, int(ts_sum))],
        "n_pages long, n_edges long, mismatches long, ts_sum long",
    )


_WARC_ROUNDTRIP_SQL = (
    f"WITH {SQL_E}, {SQL_D}, {SQL_U}, {SQL_N} "
    "SELECT (SELECT COUNT(*) FROM nodes) AS n_pages, "
    "(SELECT COUNT(*) FROM d_edges) AS n_edges, "
    "CAST(0 AS BIGINT) AS mismatches, "
    "(SELECT CAST(SUM(1600000000 + (node_id * 37 + 42) % 10000000) AS BIGINT) "
    "FROM nodes) AS ts_sum"
)

def _q_clique_miner(spark, sf_dir):
    """Quasi-biclique beam search over a typed bipartite graph derived
    from lineitem (core=order bucket, non-core=part bucket, relation
    type from supplier parity). Rows-only check: the search is a
    seeded stochastic beam, not SQL-expressible."""
    from dachshund_spark.clique import mine_cliques

    li = load_table(spark, sf_dir, "lineitem")
    typed = li.select(
        (F.col("l_orderkey") % 16).alias("graph_id"),
        (F.col("l_orderkey") % 64).alias("core_id"),
        (1000 + F.col("l_partkey") % 64).alias("non_core_id"),
        F.lit("author").alias("core_type"),
        F.lit("published_at").alias("edge_type"),
        F.when(F.col("l_suppkey") % 2 == 0, "conference")
        .otherwise("journal")
        .alias("non_core_type"),
    )
    ts = [
        ["author", "published_at", "conference"],
        ["author", "published_at", "journal"],
    ]
    out = mine_cliques(typed, ts, "author")
    # serialize the member arrays: the driver's rows-only check
    # canonicalizes via pandas sort_values, which cannot sort list cells
    return out.select(
        "graph_id",
        F.to_json("core_ids").alias("core_ids_json"),
        F.to_json("non_core_ids").alias("non_core_ids_json"),
        "score",
        "cliqueness",
    )


def _q_streaming_window(spark, sf_dir):
    from dachshund_spark.streaming import windowed_edge_rates

    ev = load_table(spark, sf_dir, "events")
    out = windowed_edge_rates(ev.select("ts", "event_type"))
    return out.select(
        F.unix_timestamp("window_start").alias("win_start_epoch"),
        "event_type",
        "n_events",
    )


def _q_image_features(spark, sf_dir):
    from dachshund_spark.pipeline.multimodal import decode_image_features, make_fake_media

    return decode_image_features(make_fake_media(spark, n=256), fake=True)


def _q_image_near_dups(spark, sf_dir):
    """pHash Hamming-band LSH near-dup candidates over a 256-image
    fixture with planted exact duplicates (payload key = id % 200):
    the dedup stack extended to the multimodal column."""
    from dachshund_spark.pipeline.multimodal import (
        decode_image_features,
        make_fake_media,
        phash_near_dups,
    )

    feats = decode_image_features(
        make_fake_media(spark, n=256, n_distinct=200), fake=True
    )
    return phash_near_dups(feats, bands=4, band_bits=16)


def _image_media_sql(n: int = 256, n_distinct: int | None = None, seed: int = 42) -> str:
    """DuckDB replay of make_fake_media + the digest fake decoder
    (dachshund_spark/pipeline/multimodal.py): sha256 of the payload
    string reproduces the mapInPandas decode byte-for-byte, so the
    'stub' decode is fully oracle-able even though the real image libs
    are absent."""
    key = f"media_id % {n_distinct}" if n_distinct else "media_id"
    return (
        f"media AS MATERIALIZED (SELECT CAST(unnest(range({n})) AS BIGINT) AS media_id), "
        f"digest AS MATERIALIZED (SELECT media_id, "
        f"sha256('payload-{seed}-' || CAST({key} AS VARCHAR)) AS sha FROM media), "
        "uns AS MATERIALIZED (SELECT media_id, sha, "
        "CAST(('0x' || substr(sha, 7, 16)) AS UBIGINT) AS u FROM digest), "
        "feats AS MATERIALIZED (SELECT media_id, "
        "CAST(media_id % 4 * 64 + 64 AS INTEGER) AS width, "
        "CAST(media_id % 3 * 64 + 64 AS INTEGER) AS height, "
        "CAST(('0x' || substr(sha, 1, 2)) AS BIGINT) / 255.0 AS mean_r, "
        "CAST(('0x' || substr(sha, 3, 2)) AS BIGINT) / 255.0 AS mean_g, "
        "CAST(('0x' || substr(sha, 5, 2)) AS BIGINT) / 255.0 AS mean_b, "
        "CAST(CAST(u AS HUGEINT) - CASE WHEN u >= 9223372036854775808 "
        "THEN CAST('18446744073709551616' AS HUGEINT) ELSE CAST(0 AS HUGEINT) END "
        "AS BIGINT) AS phash FROM uns)"
    )


def _image_near_dups_sql(
    n: int = 256, n_distinct: int = 200, bands: int = 4, band_bits: int = 16
) -> str:
    mask = (1 << band_bits) - 1
    return (
        "WITH " + _image_media_sql(n, n_distinct) + ", "
        f"bnd AS MATERIALIZED (SELECT media_id, phash, band, "
        f"(phash >> ({band_bits} * band)) & {mask} AS band_val "
        f"FROM feats, (SELECT CAST(unnest(range({bands})) AS BIGINT) AS band)) "
        "SELECT a.media_id AS media_a, b.media_id AS media_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_shared_bands, "
        "CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming "
        "FROM bnd a JOIN bnd b ON a.band = b.band AND a.band_val = b.band_val "
        "AND a.media_id < b.media_id "
        "GROUP BY a.media_id, b.media_id, a.phash, b.phash"
    )


def _q_link_prediction(spark, sf_dir):
    """Classic neighborhood link-prediction scores (common neighbors /
    Jaccard / Adamic-Adar / preferential attachment) for every
    non-adjacent pair of the 256-node subgraph."""
    from dachshund_spark.algorithms.linkpred import link_prediction_scores

    e = derived_graph(spark, sf_dir).edges
    sub = LinkGraph(e.where((F.col("src") < 256) & (F.col("dst") < 256)))
    return link_prediction_scores(sub)


_LINKPRED_SQL = (
    f"WITH {SQL_E}, "
    "sube AS MATERIALIZED (SELECT src, dst FROM edges_raw WHERE src < 256 AND dst < 256), "
    "unds AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
    "(SELECT src, dst FROM sube UNION ALL SELECT dst AS src, src AS dst FROM sube) "
    "WHERE src <> dst), "
    "degs AS MATERIALIZED (SELECT src AS node_id, CAST(COUNT(*) AS BIGINT) AS degree "
    "FROM unds GROUP BY src), "
    "canons AS MATERIALIZED (SELECT src, dst FROM unds WHERE src < dst), "
    "wed AS MATERIALIZED (SELECT a.dst AS u, b.dst AS v, a.src AS w "
    "FROM unds a JOIN unds b ON a.src = b.src AND a.dst < b.dst), "
    # per-wedge Adamic-Adar terms pre-rounded to 1e-8 integers: the sum
    # is exact, so distributed order and libm ulp differences both wash
    "ps AS MATERIALIZED (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn, "
    "CAST(SUM(CAST(ROUND(1e8 / ln(CAST(d.degree AS DOUBLE)), 0) AS BIGINT)) AS BIGINT) AS aa_e8, "
    "CAST(SUM(1000000000 // d.degree) AS BIGINT) AS ra_e9 "
    "FROM wed JOIN degs d ON wed.w = d.node_id GROUP BY u, v), "
    "cand AS MATERIALIZED (SELECT ps.* FROM ps WHERE NOT EXISTS "
    "(SELECT 1 FROM canons c WHERE c.src = ps.u AND c.dst = ps.v)) "
    "SELECT cand.u, cand.v, cand.cn, "
    "cand.cn / CAST(du.degree + dv.degree - cand.cn AS DOUBLE) AS jaccard, "
    "aa_e8 / 1e8 AS adamic_adar, "
    "CAST(du.degree * dv.degree AS BIGINT) AS pref_attach, "
    "ra_e9 / 1e9 AS resource_alloc "
    "FROM cand JOIN degs du ON cand.u = du.node_id "
    "JOIN degs dv ON cand.v = dv.node_id"
)


def _q_lpa_modularity(spark, sf_dir):
    """Newman modularity of the 5-round LPA labeling — integer
    numerators (within-community edge count, Σ community-degree²) plus
    one scalar double expression, bit-identical to the unrolled-LPA
    oracle."""
    from dachshund_spark.algorithms.lpa import label_propagation
    from dachshund_spark.algorithms.stats import modularity

    g = derived_graph(spark, sf_dir)
    labels = label_propagation(g, iterations=LPA_ITERS)
    return modularity(g, labels)


def _lpa_modularity_sql(iters: int = LPA_ITERS) -> str:
    lpa = _lpa_sql(iters)
    prefix = lpa[: lpa.rfind(" SELECT ")]
    return (
        prefix + ", "
        f"canon2 AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst), "
        f"deg2 AS MATERIALIZED (SELECT src AS node_id, CAST(COUNT(*) AS BIGINT) AS degree "
        f"FROM und GROUP BY src), "
        f"win AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS within_edges "
        f"FROM canon2 c JOIN l{iters} a ON c.src = a.node_id "
        f"JOIN l{iters} b ON c.dst = b.node_id WHERE a.label = b.label), "
        f"cd AS MATERIALIZED (SELECT l.label, CAST(SUM(d.degree) AS DOUBLE) AS d_c "
        f"FROM deg2 d JOIN l{iters} l ON d.node_id = l.node_id GROUP BY l.label), "
        f"sq AS MATERIALIZED (SELECT SUM(d_c * d_c) AS sum_deg_sq FROM cd), "
        f"mm AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM canon2) "
        f"SELECT within_edges, CAST(sum_deg_sq AS BIGINT) AS sum_deg_sq, "
        f"within_edges / m - sum_deg_sq / (4.0 * m * m) AS modularity "
        f"FROM win, sq, mm"
    )


def _q_repetition_stats(spark, sf_dir):
    """Gopher-style within-doc repetition fractions (token + 2-gram)
    over the documents table — all ratios of exact integer counts."""
    from dachshund_spark.pipeline.text import repetition_stats

    return repetition_stats(load_table(spark, sf_dir, "documents"))


_REPETITION_SQL = (
    "WITH lst AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS l FROM documents), "
    "uni AS MATERIALIZED (SELECT doc_id, unnest(l) AS g FROM lst), "
    # parallel unnests zip in DuckDB: (l[i], l[i+1]) pairs
    "bi AS MATERIALIZED (SELECT doc_id, a || ' ' || b AS g FROM ("
    "SELECT doc_id, unnest(l[1:len(l)-1]) AS a, unnest(l[2:len(l)]) AS b "
    "FROM lst WHERE len(l) >= 2)), "
    "uc AS MATERIALIZED (SELECT doc_id, g, COUNT(*) AS c FROM uni GROUP BY doc_id, g), "
    "bc AS MATERIALIZED (SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY doc_id, g), "
    "u AS MATERIALIZED (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, "
    "CAST(COUNT(*) AS BIGINT) AS nd, CAST(MAX(c) AS BIGINT) AS tc FROM uc GROUP BY doc_id), "
    "b AS MATERIALIZED (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS ng, "
    "CAST(COUNT(*) AS BIGINT) AS ngd, CAST(MAX(c) AS BIGINT) AS tg FROM bc GROUP BY doc_id) "
    "SELECT u.doc_id, u.n_tokens, "
    "(u.n_tokens - u.nd) / CAST(u.n_tokens AS DOUBLE) AS dup_token_frac, "
    "u.tc / CAST(u.n_tokens AS DOUBLE) AS top_token_frac, "
    "CASE WHEN b.ng > 0 THEN (b.ng - b.ngd) / CAST(b.ng AS DOUBLE) END AS dup_2gram_frac, "
    "CASE WHEN b.ng > 0 THEN b.tg / CAST(b.ng AS DOUBLE) END AS top_2gram_frac "
    "FROM u LEFT JOIN b ON u.doc_id = b.doc_id"
)


def _q_segment_dedup(spark, sf_dir):
    """CCNet-style common-segment removal over the documents corpus.
    The fixture corpus is single-line, so segments are tokens here
    (sep=' '); in production sep='\\n' drops boilerplate lines. A
    segment is dropped when its document frequency ≥ max(2, 25% of the
    corpus); surviving segments are reassembled in original order."""
    from dachshund_spark.pipeline.dedup import drop_common_segments

    return drop_common_segments(
        load_table(spark, sf_dir, "documents"),
        sep=" ",
        max_doc_frac=0.25,
    )


_SEGMENT_DEDUP_SQL = (
    "WITH lst AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS l FROM documents), "
    "segs AS MATERIALIZED (SELECT doc_id, unnest(range(len(l))) AS pos, unnest(l) AS seg FROM lst), "
    "dfc AS MATERIALIZED (SELECT seg, COUNT(*) AS df FROM "
    "(SELECT DISTINCT seg, doc_id FROM segs) GROUP BY seg), "
    "thr AS MATERIALIZED (SELECT GREATEST(2, 0.25 * CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)) AS t), "
    "mk AS MATERIALIZED (SELECT s.doc_id, s.pos, s.seg, "
    "d.df >= (SELECT t FROM thr) AS drp FROM segs s JOIN dfc d ON s.seg = d.seg) "
    "SELECT doc_id, COALESCE(string_agg(CASE WHEN NOT drp THEN seg END, ' ' ORDER BY pos), '') AS text, "
    "CAST(SUM(CASE WHEN drp THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped "
    "FROM mk GROUP BY doc_id"
)


def _q_anchor_text(spark, sf_dir):
    """Anchor-text side table over the synthetic pages corpus: the html
    is REALLY parsed (pandas-UDF regex extraction); the oracle states
    the generation invariant — every distinct edge (s, d) contributes
    one anchor 'link d' pointing at node d's url."""
    from dachshund_spark.pages import generate_pages
    from dachshund_spark.pages.extract import anchor_text_table

    g = derived_graph(spark, sf_dir)
    return anchor_text_table(generate_pages(g))


_ANCHOR_TEXT_SQL = (
    f"WITH {SQL_E}, {SQL_D} "
    "SELECT 'https://node' || CAST(dst AS VARCHAR) || '.example.com' AS dst_url, "
    "CAST(COUNT(*) AS BIGINT) AS n_anchors, "
    "CAST(1 AS BIGINT) AS n_unique_texts, "
    "'link ' || CAST(dst AS VARCHAR) AS top_anchor "
    "FROM d_edges GROUP BY dst"
)


def _q_page_structure(spark, sf_dir):
    """Per-page structure/boilerplate stats over the synthetic pages
    corpus: Spark counts tags/links from the REAL html bytes (JVM
    regex); the oracle reconstructs the page template from the edge
    list (generation invariant, like anchor_text) — so the counting
    path is pinned against structural ground truth."""
    from dachshund_spark.pages import generate_pages
    from dachshund_spark.pages.extract import page_structure_stats

    g = derived_graph(spark, sf_dir)
    return page_structure_stats(generate_pages(g))


_PAGE_STRUCTURE_SQL = (
    f"WITH {SQL_E}, {SQL_D}, "
    "pn AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM "
    "(SELECT src FROM edges_raw UNION ALL SELECT dst FROM edges_raw)), "
    "od AS MATERIALIZED (SELECT n.node_id, "
    "COALESCE(a.ods, 0) AS ods, a.anchors_html, a.anchors_text FROM pn n "
    "LEFT JOIN (SELECT src AS node_id, COUNT(*) AS ods, "
    "STRING_AGG('<a href=\"https://node' || CAST(dst AS VARCHAR) || "
    "'.example.com\">link ' || CAST(dst AS VARCHAR) || '</a>', '' ORDER BY dst) "
    "AS anchors_html, "
    "STRING_AGG('link ' || CAST(dst AS VARCHAR), ' ' ORDER BY dst) AS anchors_text "
    "FROM d_edges GROUP BY src) a ON n.node_id = a.node_id), "
    "page AS MATERIALIZED (SELECT node_id, ods, "
    "'<html><head><title>Node ' || k || '</title><script>var x = \"ignored-' "
    "|| k || '\";</script><style>body { color: #000; }</style></head>"
    "<body><h1>Page ' || k || '</h1><p>Synthetic page ' || k || "
    "' of the corpus &amp; friends.</p>' || COALESCE(anchors_html, '') || "
    "'</body></html>' AS html, "
    "CASE WHEN ods > 0 THEN 'Node ' || k || ' Page ' || k || "
    "' Synthetic page ' || k || ' of the corpus & friends. ' || anchors_text "
    "ELSE 'Node ' || k || ' Page ' || k || ' Synthetic page ' || k || "
    "' of the corpus & friends.' END AS text "
    "FROM (SELECT node_id, ods, anchors_html, anchors_text, "
    "CAST(node_id AS VARCHAR) AS k FROM od)) "
    "SELECT 'https://node' || CAST(node_id AS VARCHAR) || '.example.com' AS url, "
    "CAST(ods AS BIGINT) AS n_links, CAST(1 AS BIGINT) AS n_scripts, "
    "CAST(1 AS BIGINT) AS n_styles, "
    "CAST(16 + 2 * ods AS BIGINT) AS n_tags, "
    "CAST(LENGTH(html) AS BIGINT) AS html_len, "
    "CAST(LENGTH(text) AS BIGINT) AS text_len, "
    "CAST(LENGTH(text) AS DOUBLE) / CAST(LENGTH(html) AS DOUBLE) AS text_ratio "
    "FROM page"
)

def _q_mis(spark, sf_dir):
    """Luby maximal independent set on the 256-node subgraph:
    deterministic md5 priorities, (priority, node) total order, rounds
    until the active set empties."""
    from dachshund_spark.algorithms.mis import maximal_independent_set
    from dachshund_spark.derived import derived_edges

    e = derived_edges(spark, sf_dir)
    sub = LinkGraph(e.where((F.col("src") < 256) & (F.col("dst") < 256)))
    return maximal_independent_set(sub, seed=0)


def _mis_sql(rounds: int = 12, max_node: int = 256, seed: int = 0) -> str:
    """Exact round-by-round replay of Luby MIS.  ``rounds`` must be ≥
    the supersteps Spark needs to drain the active set; once drained,
    further rounds are no-ops, so a generous fixed unroll equals the
    converged result."""
    pr = MD5L.format(x=f"'mis{seed}#' || CAST(node_id AS VARCHAR)")
    parts = [
        SQL_E,
        f"sube AS MATERIALIZED (SELECT src, dst FROM edges_raw "
        f"WHERE src < {max_node} AND dst < {max_node})",
        "undm AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM sube UNION ALL SELECT dst, src FROM sube))",
        "nodesm AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM undm)",
        f"s0 AS MATERIALIZED (SELECT node_id, {pr} AS pr, 0 AS status FROM nodesm)",
    ]
    for i in range(1, rounds + 1):
        p = f"s{i-1}"
        parts += [
            f"a{i} AS MATERIALIZED (SELECT node_id, pr FROM {p} WHERE status = 0)",
            f"m{i} AS MATERIALIZED (SELECT u.dst AS node_id, "
            f"MAX(ROW(a.pr, a.node_id)) AS mx "
            f"FROM undm u JOIN a{i} a ON u.src = a.node_id "
            f"JOIN a{i} b ON u.dst = b.node_id GROUP BY u.dst)",
            f"w{i} AS MATERIALIZED (SELECT a.node_id FROM a{i} a "
            f"LEFT JOIN m{i} m ON a.node_id = m.node_id "
            f"WHERE m.mx IS NULL OR ROW(a.pr, a.node_id) > m.mx)",
            f"r{i} AS MATERIALIZED (SELECT DISTINCT u.dst AS node_id "
            f"FROM undm u JOIN w{i} w ON u.src = w.node_id "
            f"JOIN a{i} b ON u.dst = b.node_id)",
            f"s{i} AS MATERIALIZED (SELECT s.node_id, s.pr, "
            f"CASE WHEN s.status <> 0 THEN s.status "
            f"WHEN s.node_id IN (SELECT node_id FROM w{i}) THEN 1 "
            f"WHEN s.node_id IN (SELECT node_id FROM r{i}) THEN 2 "
            f"ELSE 0 END AS status FROM {p} s)",
        ]
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node_id, status = 1 AS in_mis FROM s{rounds}"
    )


def _q_single_linkage(spark, sf_dir):
    """Single-linkage clustering of the first 64 embeddings at cosine
    ≥ 0.28: connected components of the threshold similarity graph
    (equivalently the Borůvka MSF dendrogram cut at distance 0.72 —
    equivalence pinned in tests/test_msf.py); singletons cluster as
    themselves."""
    from dachshund_spark.pipeline.similarity import single_linkage_clusters

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 64)
    return single_linkage_clusters(emb, min_sim=0.28)


def _single_linkage_sql(min_sim: float = 0.28, iters: int = 16) -> str:
    parts = [
        "v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec "
        "FROM embeddings WHERE vec_id < 64)",
        "sp AS MATERIALIZED (SELECT a.vec_id AS a, b.vec_id AS b FROM v a "
        "JOIN v b ON a.vec_id < b.vec_id "
        "WHERE ROUND(list_dot_product(a.vec, b.vec) / "
        "(sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))), 6) "
        f">= {min_sim!r})",
        "su AS MATERIALIZED (SELECT a AS src, b AS dst FROM sp "
        "UNION ALL SELECT b, a FROM sp)",
        "sl0 AS MATERIALIZED (SELECT vec_id AS node_id, vec_id AS label FROM v)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"sl{i} AS MATERIALIZED (SELECT n.node_id, "
            f"CASE WHEN m.minl IS NULL OR n.label <= m.minl THEN n.label ELSE m.minl END AS label "
            f"FROM sl{i-1} n LEFT JOIN ("
            f"SELECT u.dst AS node_id, MIN(l.label) AS minl "
            f"FROM su u JOIN sl{i-1} l ON u.src = l.node_id GROUP BY u.dst) m "
            f"ON n.node_id = m.node_id)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node_id AS vec_id, label AS cluster FROM sl{iters}"
    )


def _q_pagerank_warmstart(spark, sf_dir):
    """Incremental PageRank across crawl snapshots: converge (10 steps)
    on the old snapshot, publish rounded scores, warm-start 3 steps on
    the churned new snapshot (same overlapping lineitem split as
    crawl_delta).  The prior is rounded to 8 decimals BEFORE the warm
    start — warm-starting from published scores, which also pins float
    parity for the renormalization sum."""
    from dachshund_spark.algorithms.pagerank import pagerank

    li = load_table(spark, sf_dir, "lineitem")

    def snap(pred):
        e = li.where(pred).select(
            (F.col("l_orderkey") % N_NODES).alias("src"),
            (F.col("l_partkey") % N_NODES).alias("dst"),
        )
        return e.where(F.col("src") != F.col("dst"))

    old = LinkGraph(snap(F.col("l_linenumber") <= 3))
    new = LinkGraph(snap(F.col("l_linenumber") >= 2))
    prior = pagerank(old, fixed_iterations=PAGERANK_ITERS).select(
        "node_id", F.round("pagerank", 8).alias("pagerank")
    )
    warm = pagerank(new, fixed_iterations=3, init_ranks=prior)
    return warm.select("node_id", F.round("pagerank", 8).alias("pagerank"))


def _warmstart_sql(
    old_iters: int = PAGERANK_ITERS, new_iters: int = 3, d: float = DAMPING
) -> str:
    """Exact replay: old-snapshot unroll → ROUND(.,8) prior →
    coalesce/renormalize init → new-snapshot unroll."""

    def pr_rounds(pfx: str, edges: str, nodes: str, nn: str, od: str, iters: int):
        out = []
        for i in range(iters):
            out.append(
                f"{pfx}dang{i} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS dm "
                f"FROM {pfx}r{i} r LEFT JOIN {od} o ON r.node_id = o.node_id "
                f"WHERE o.node_id IS NULL)"
            )
            out.append(
                f"{pfx}r{i+1} AS MATERIALIZED (SELECT n.node_id, "
                f"(1.0 - {d!r}) / (SELECT n FROM {nn}) + {d!r} * ("
                f"COALESCE(c.contrib, 0.0) + (SELECT dm FROM {pfx}dang{i}) / (SELECT n FROM {nn})"
                f") AS rank FROM {nodes} n LEFT JOIN ("
                f"SELECT e.dst AS node_id, SUM(r.rank / o.od) AS contrib "
                f"FROM {edges} e JOIN {pfx}r{i} r ON e.src = r.node_id "
                f"JOIN {od} o ON e.src = o.node_id GROUP BY e.dst) c "
                f"ON n.node_id = c.node_id)"
            )
        return out

    parts = [
        f"oe AS MATERIALIZED (SELECT DISTINCT l_orderkey % {N_NODES} AS src, "
        f"l_partkey % {N_NODES} AS dst FROM lineitem "
        f"WHERE l_orderkey % {N_NODES} <> l_partkey % {N_NODES} AND l_linenumber <= 3)",
        f"ne AS MATERIALIZED (SELECT DISTINCT l_orderkey % {N_NODES} AS src, "
        f"l_partkey % {N_NODES} AS dst FROM lineitem "
        f"WHERE l_orderkey % {N_NODES} <> l_partkey % {N_NODES} AND l_linenumber >= 2)",
        "onodes AS MATERIALIZED (SELECT DISTINCT node_id FROM "
        "(SELECT src AS node_id FROM oe UNION ALL SELECT dst FROM oe))",
        "onn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM onodes)",
        "ood AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS od FROM oe GROUP BY src)",
        "or0 AS MATERIALIZED (SELECT node_id, 1.0 / (SELECT n FROM onn) AS rank FROM onodes)",
    ]
    parts += pr_rounds("o", "oe", "onodes", "onn", "ood", old_iters)
    parts += [
        f"prior AS MATERIALIZED (SELECT node_id, ROUND(rank, 8) AS prior FROM or{old_iters})",
        "wnodes AS MATERIALIZED (SELECT DISTINCT node_id FROM "
        "(SELECT src AS node_id FROM ne UNION ALL SELECT dst FROM ne))",
        "wnn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM wnodes)",
        "wod AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS od FROM ne GROUP BY src)",
        "wraw AS MATERIALIZED (SELECT n.node_id, "
        "COALESCE(p.prior, 1.0 / (SELECT n FROM wnn)) AS raw "
        "FROM wnodes n LEFT JOIN prior p ON n.node_id = p.node_id)",
        "wtot AS MATERIALIZED (SELECT SUM(raw) AS t FROM wraw)",
        "wr0 AS MATERIALIZED (SELECT node_id, raw / (SELECT t FROM wtot) AS rank FROM wraw)",
    ]
    parts += pr_rounds("w", "ne", "wnodes", "wnn", "wod", new_iters)
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node_id, ROUND(rank, 8) AS pagerank FROM wr{new_iters}"
    )


def _q_msf(spark, sf_dir):
    """Borůvka minimum spanning forest on the 256-node subgraph with
    deterministic integer-valued weights wt=(src·dst)%97+1; the
    (wt, src, dst) total order makes the MSF unique, so the oracle's
    round-by-round replay must match edge for edge."""
    from dachshund_spark.algorithms.msf import boruvka_msf
    from dachshund_spark.derived import derived_edges

    e = derived_edges(spark, sf_dir).where(
        (F.col("src") < 256) & (F.col("dst") < 256)
    )
    e = e.withColumn(
        "wt", ((F.col("src") * F.col("dst")) % 97 + 1).cast("double")
    )
    return boruvka_msf(LinkGraph(e, extra_cols=["wt"]), "wt")


def _msf_sql(rounds: int = 8, doubling: int = 8, max_node: int = 256) -> str:
    """Borůvka replay: per round, min cross edge per component (struct
    min over (wt,src,dst,other)), 2-cycle break at the smaller label,
    ``doubling`` pointer-doubling steps, relabel.  Rounds/doubling are
    generous fixed unrolls — both are no-ops past convergence."""
    parts = [
        SQL_E,
        f"sube AS MATERIALIZED (SELECT src, dst FROM edges_raw "
        f"WHERE src < {max_node} AND dst < {max_node} AND src <> dst)",
        "mcanon AS MATERIALIZED (SELECT src, dst, "
        "CAST((src * dst) % 97 + 1 AS DOUBLE) AS wt FROM "
        "(SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst FROM sube))",
        "mnodes AS MATERIALIZED (SELECT DISTINCT node_id FROM "
        "(SELECT src AS node_id FROM mcanon UNION ALL SELECT dst FROM mcanon))",
        "lab0 AS MATERIALIZED (SELECT node_id, node_id AS comp FROM mnodes)",
    ]
    for i in range(1, rounds + 1):
        parts += [
            f"cr{i} AS MATERIALIZED (SELECT c.src, c.dst, c.wt, "
            f"lu.comp AS cu, lv.comp AS cv FROM mcanon c "
            f"JOIN lab{i-1} lu ON c.src = lu.node_id "
            f"JOIN lab{i-1} lv ON c.dst = lv.node_id WHERE lu.comp <> lv.comp)",
            f"bo{i} AS MATERIALIZED (SELECT cu AS comp, cv AS o, wt, src, dst FROM cr{i} "
            f"UNION ALL SELECT cv, cu, wt, src, dst FROM cr{i})",
            f"ch{i} AS MATERIALIZED (SELECT comp, "
            f"MIN(struct_pack(w := wt, s := src, d := dst, o := o)) AS e "
            f"FROM bo{i} GROUP BY comp)",
            f"pk{i} AS MATERIALIZED (SELECT DISTINCT (e).s AS src, (e).d AS dst, "
            f"(e).w AS wt FROM ch{i})",
            f"p{i}_0 AS MATERIALIZED (SELECT c.comp, "
            f"CASE WHEN (t.e).o = c.comp AND c.comp < (c.e).o THEN c.comp "
            f"ELSE (c.e).o END AS parent "
            f"FROM ch{i} c JOIN ch{i} t ON (c.e).o = t.comp)",
        ]
        for j in range(1, doubling + 1):
            parts.append(
                f"p{i}_{j} AS MATERIALIZED (SELECT a.comp, b.parent "
                f"FROM p{i}_{j-1} a JOIN p{i}_{j-1} b ON a.parent = b.comp)"
            )
        parts.append(
            f"lab{i} AS MATERIALIZED (SELECT l.node_id, "
            f"COALESCE(p.parent, l.comp) AS comp FROM lab{i-1} l "
            f"LEFT JOIN p{i}_{doubling} p ON l.comp = p.comp)"
        )
    union = " UNION ".join(f"SELECT src, dst, wt FROM pk{i}" for i in range(1, rounds + 1))
    return "WITH " + ", ".join(parts) + f" SELECT src, dst, wt FROM ({union})"


def _q_decontaminate(spark, sf_dir):
    """Benchmark decontamination over the documents corpus: docs with
    doc_id % 10 == 0 play the (broadcast-sized) eval benchmark; the rest
    are the training corpus, flagged on any shared 3-gram.  n=3 instead
    of the production 13 because the fixture vocabulary is tiny (3-gram
    collisions actually occur, so the overlap counts are non-trivial)."""
    from dachshund_spark.pipeline.decontam import benchmark_ngrams, decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    return decontaminate(corpus, benchmark_ngrams(bench, n=3), n=3)


_DECONTAM_SQL = (
    "WITH lst AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS l FROM documents), "
    "grams AS MATERIALIZED (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS gram "
    "FROM lst, UNNEST(range(1, len(l) - 1)) AS r(i)), "
    "bench AS MATERIALIZED (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0), "
    "corpus AS MATERIALIZED (SELECT * FROM grams WHERE doc_id % 10 <> 0), "
    "agg AS MATERIALIZED (SELECT c.doc_id, COUNT(*) AS n_grams, "
    "SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap "
    "FROM corpus c LEFT JOIN bench b ON c.gram = b.gram GROUP BY c.doc_id) "
    "SELECT d.doc_id, CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams, "
    "CAST(COALESCE(a.n_overlap, 0) AS BIGINT) AS n_overlap, "
    "COALESCE(a.n_overlap, 0) > 0 AS contaminated "
    "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id WHERE d.doc_id % 10 <> 0"
)


def _q_dup_ngrams(spark, sf_dir):
    """Cross-document exact-substring duplication (Lee et al. 2022 §4):
    per doc, the fraction of 3-gram positions whose gram occurs in ≥2
    distinct documents — the verbatim-boilerplate signal whole-document
    MinHash misses."""
    from dachshund_spark.pipeline.decontam import duplicate_ngram_stats

    return duplicate_ngram_stats(
        load_table(spark, sf_dir, "documents"), n=3, min_docs=2
    )


_DUP_NGRAMS_SQL = (
    "WITH lst AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS l FROM documents), "
    "pos AS MATERIALIZED (SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS gram "
    "FROM lst, UNNEST(range(1, len(l) - 1)) AS r(i)), "
    "dfg AS MATERIALIZED (SELECT gram FROM (SELECT gram, COUNT(*) AS df FROM "
    "(SELECT DISTINCT gram, doc_id FROM pos) GROUP BY gram) WHERE df >= 2), "
    "agg AS MATERIALIZED (SELECT p.doc_id, COUNT(*) AS np, "
    "SUM(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END) AS nd "
    "FROM pos p LEFT JOIN dfg d ON p.gram = d.gram GROUP BY p.doc_id) "
    "SELECT d.doc_id, CAST(COALESCE(a.np, 0) AS BIGINT) AS n_positions, "
    "CAST(COALESCE(a.nd, 0) AS BIGINT) AS n_dup_positions, "
    "CASE WHEN COALESCE(a.np, 0) > 0 THEN CAST(a.nd AS DOUBLE) / a.np END AS dup_frac "
    "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"
)


_MIX_RATES = {"en": 1.0, "de": 0.5, "fr": 0.25, "es": 0.125, "zh": 0.0625}


def _q_mixture_sample(spark, sf_dir):
    """Deterministic data-mixing sampler: per-language keep rates via an
    md5 hash threshold on doc_id — reproducible across runs, engines,
    and repartitioning (unlike rand(seed)); zero shuffles."""
    from dachshund_spark.pipeline.decontam import stratified_sample

    return stratified_sample(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang"),
        rates=_MIX_RATES,
        seed=0,
    )


_MIXSAMPLE_SQL = (
    "SELECT doc_id, lang FROM documents WHERE "
    + MD5L.format(x="CAST(doc_id AS VARCHAR) || '#0'")
    + " % 1000000 < CASE lang WHEN 'en' THEN 1000000 WHEN 'de' THEN 500000 "
    "WHEN 'fr' THEN 250000 WHEN 'es' THEN 125000 WHEN 'zh' THEN 62500 "
    "ELSE 0 END"
)


def _q_pii_scrub(spark, sf_dir):
    """PII redaction over a deterministic contact string synthesized
    from customer rows (the fixture has no natural PII): emails, IPv4,
    phone numbers → typed placeholders, with per-pattern match counts.
    Pure map-side regexp work — zero shuffles."""
    from dachshund_spark.pipeline.decontam import scrub_pii

    cust = load_table(spark, sf_dir, "customer")
    profile = cust.select(
        F.col("c_custkey").alias("cust_id"),
        F.concat(
            F.lit("contact "),
            F.col("c_name"),
            F.lit(" at user"),
            F.col("c_custkey").cast("string"),
            F.lit("@mail.example.com via 10.0."),
            (F.col("c_custkey") % 250).cast("string"),
            F.lit("."),
            F.col("c_nationkey").cast("string"),
            F.lit(" or 555-"),
            F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return scrub_pii(profile, id_col="cust_id")


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{3,4}-\d{4}\b"

_PII_SCRUB_SQL = (
    "WITH p AS MATERIALIZED (SELECT c_custkey AS cust_id, "
    "'contact ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR) || "
    "'@mail.example.com via 10.0.' || CAST(c_custkey % 250 AS VARCHAR) || '.' || "
    "CAST(c_nationkey AS VARCHAR) || ' or 555-' || "
    "lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' || "
    "lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS text FROM customer) "
    "SELECT cust_id, "
    f"CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_email, "
    f"CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_ipv4, "
    f"CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phone, "
    "regexp_replace(regexp_replace(regexp_replace(text, "
    f"'{_PII_EMAIL}', '<EMAIL>', 'g'), "
    f"'{_PII_IP}', '<IP>', 'g'), "
    f"'{_PII_PHONE}', '<PHONE>', 'g') AS text "
    "FROM p"
)


def _q_lpa_weighted(spark, sf_dir):
    """Weighted LPA (modal label by incident WEIGHT sum): integer
    weights wt=(src+dst)%5+1 keep every tie-break exact."""
    from dachshund_spark.algorithms.lpa import label_propagation
    from dachshund_spark.derived import derived_edges

    e = derived_edges(spark, sf_dir).withColumn(
        "wt", ((F.col("src") + F.col("dst")) % 5 + 1).cast("long")
    )
    return label_propagation(
        LinkGraph(e, extra_cols=["wt"]), iterations=LPA_ITERS, weight_col="wt"
    )


def _lpa_weighted_sql(iters: int = LPA_ITERS) -> str:
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        "wund AS MATERIALIZED (SELECT src, dst, "
        "CAST((src + dst) % 5 + 1 AS BIGINT) AS wt FROM und)",
        "l0 AS MATERIALIZED (SELECT node_id, node_id AS label FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT u.dst AS node_id, l.label, "
            f"CAST(SUM(u.wt) AS BIGINT) AS cnt "
            f"FROM wund u JOIN l{i-1} l ON u.src = l.node_id GROUP BY u.dst, l.label)"
        )
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT node_id, label AS new_label FROM ("
            f"SELECT node_id, label, ROW_NUMBER() OVER ("
            f"PARTITION BY node_id ORDER BY cnt DESC, label ASC) AS rn FROM c{i}) t "
            f"WHERE rn = 1)"
        )
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT l.node_id, COALESCE(m.new_label, l.label) AS label "
            f"FROM l{i-1} l LEFT JOIN m{i} m ON l.node_id = m.node_id)"
        )
    return "WITH " + ", ".join(parts) + f" SELECT node_id, label FROM l{iters}"


def _q_ego(spark, sf_dir):
    """Radius-2 directed ego networks around seeds {0,1,2,3} on the
    64-node subgraph — all seeds advance in ONE multi-source BFS."""
    from dachshund_spark.algorithms.neighborhood import ego_networks

    members, _edges = ego_networks(
        _small_graph(spark, sf_dir), [0, 1, 2, 3], radius=2, directed=True
    )
    return members.select(
        "seed", "node_id", F.col("dist").cast("int").alias("dist")
    )


def _ego_sql(seeds=(0, 1, 2, 3), max_node: int = 64) -> str:
    seed_list = ", ".join(str(s) for s in seeds)
    return (
        f"WITH {SQL_E}, "
        f"sube AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges_raw "
        f"WHERE src < {max_node} AND dst < {max_node}), "
        "subn AS MATERIALIZED (SELECT DISTINCT node_id FROM "
        "(SELECT src AS node_id FROM sube UNION SELECT dst FROM sube)), "
        f"s AS MATERIALIZED (SELECT CAST(unnest([{seed_list}]) AS BIGINT) AS seed), "
        "m0 AS MATERIALIZED (SELECT s.seed, s.seed AS node_id FROM s "
        "JOIN subn n ON n.node_id = s.seed), "
        "f1 AS MATERIALIZED (SELECT DISTINCT m.seed, e.dst AS node_id "
        "FROM m0 m JOIN sube e ON e.src = m.node_id), "
        "m1 AS MATERIALIZED (SELECT f.seed, f.node_id FROM f1 f "
        "WHERE NOT EXISTS (SELECT 1 FROM m0 p WHERE p.seed = f.seed AND p.node_id = f.node_id)), "
        "f2 AS MATERIALIZED (SELECT DISTINCT m.seed, e.dst AS node_id "
        "FROM m1 m JOIN sube e ON e.src = m.node_id), "
        "m2 AS MATERIALIZED (SELECT f.seed, f.node_id FROM f2 f "
        "WHERE NOT EXISTS (SELECT 1 FROM m0 p WHERE p.seed = f.seed AND p.node_id = f.node_id) "
        "AND NOT EXISTS (SELECT 1 FROM m1 p WHERE p.seed = f.seed AND p.node_id = f.node_id)) "
        "SELECT seed, node_id, CAST(0 AS INT) AS dist FROM m0 "
        "UNION ALL SELECT seed, node_id, CAST(1 AS INT) FROM m1 "
        "UNION ALL SELECT seed, node_id, CAST(2 AS INT) FROM m2"
    )


def _q_hub_robustness(spark, sf_dir):
    """Targeted hub attack: remove the top-10 degree hubs and report
    node counts + largest-component sizes before/after."""
    from dachshund_spark.algorithms.stats import hub_removal_robustness

    return hub_removal_robustness(derived_graph(spark, sf_dir), k=10)


def _hub_robustness_sql(k: int = 10, iters: int = CC_ITERS) -> str:
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        SQL_DEG,
        f"hubs AS MATERIALIZED (SELECT node_id FROM deg "
        f"ORDER BY degree DESC, node_id ASC LIMIT {k})",
        "rund AS MATERIALIZED (SELECT src, dst FROM und "
        "WHERE src NOT IN (SELECT node_id FROM hubs) "
        "AND dst NOT IN (SELECT node_id FROM hubs))",
        "rn AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM rund)",
        "a0 AS MATERIALIZED (SELECT node_id, node_id AS label FROM nodes)",
        "b0 AS MATERIALIZED (SELECT node_id, node_id AS label FROM rn)",
    ]
    for pre, etab in (("a", "und"), ("b", "rund")):
        for i in range(1, iters + 1):
            parts.append(
                f"{pre}{i} AS MATERIALIZED (SELECT n.node_id, "
                f"CASE WHEN m.minl IS NULL OR n.label <= m.minl THEN n.label ELSE m.minl END AS label "
                f"FROM {pre}{i-1} n LEFT JOIN ("
                f"SELECT u.dst AS node_id, MIN(l.label) AS minl "
                f"FROM {etab} u JOIN {pre}{i-1} l ON u.src = l.node_id GROUP BY u.dst) m "
                f"ON n.node_id = m.node_id)"
            )
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes, "
        f"(SELECT CAST(MAX(c) AS BIGINT) FROM (SELECT COUNT(*) AS c FROM a{iters} GROUP BY label)) AS largest_cc, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM rn) AS n_nodes_after, "
        f"(SELECT CAST(MAX(c) AS BIGINT) FROM (SELECT COUNT(*) AS c FROM b{iters} GROUP BY label)) AS largest_cc_after"
    )


def _q_edge_sample(spark, sf_dir):
    """Deterministic ≤4-out-edges-per-node subsample (md5-seeded rank)
    of the distinct derived edge table — the GraphSAGE-style neighbor
    cap, reproducible across engines."""
    from dachshund_spark.skew import sample_edges_per_node

    e = derived_graph(spark, sf_dir).edges.distinct()
    return sample_edges_per_node(e, k=4, seed=7).select(
        "src", "dst", F.col("sample_rank").cast("int").alias("sample_rank")
    )


_EDGE_SAMPLE_SQL = (
    f"WITH {SQL_E}, {SQL_D}, "
    "rk AS MATERIALIZED (SELECT src, dst, CAST(ROW_NUMBER() OVER ("
    "PARTITION BY src ORDER BY md5(CAST(7 AS VARCHAR) || '|' || "
    "CAST(src AS VARCHAR) || '|' || CAST(dst AS VARCHAR)), src, dst) AS INT) "
    "AS sample_rank FROM d_edges) "
    "SELECT src, dst, sample_rank FROM rk WHERE sample_rank <= 4"
)


def _q_neighbor_sample(spark, sf_dir):
    """GraphSAGE minibatch computation graph: 2-hop node-wise neighbor
    sampling (fanout 4 per hop, md5-rank deterministic) from the seed
    set node_id % 64 == 0 — the GNN-training sampling primitive."""
    from dachshund_spark.skew import khop_neighbor_sample

    e = derived_graph(spark, sf_dir).edges.distinct()
    seeds = (
        e.select(F.col("src").alias("node_id"))
        .union(e.select("dst"))
        .distinct()
        .where(F.col("node_id") % 64 == 0)
    )
    return khop_neighbor_sample(e, seeds, fanouts=(4, 4), seed=7)


def _khop_sql(seed: int, fanouts=(4, 4)) -> str:
    hops = []
    prev_frontier = "seeds"
    for h, k in enumerate(fanouts, start=1):
        s = seed * 31 + h
        hops.append(
            f"e{h} AS MATERIALIZED (SELECT e.src, e.dst FROM d_edges e "
            f"JOIN {prev_frontier} f ON e.src = f.node_id), "
            f"r{h} AS MATERIALIZED (SELECT src, dst, ROW_NUMBER() OVER ("
            f"PARTITION BY src ORDER BY md5(CAST({s} AS VARCHAR) || '|' || "
            "CAST(src AS VARCHAR) || '|' || CAST(dst AS VARCHAR)), src, dst) "
            f"AS rk FROM e{h}), "
            f"h{h} AS MATERIALIZED (SELECT src, dst FROM r{h} WHERE rk <= {k}), "
            f"f{h} AS MATERIALIZED (SELECT DISTINCT dst AS node_id FROM h{h}), "
        )
        prev_frontier = f"f{h}"
    union = " UNION ALL ".join(
        f"SELECT CAST({h} AS INT) AS hop, src, dst FROM h{h}"
        for h in range(1, len(fanouts) + 1)
    )
    body = "".join(hops)[: -len(", ")]
    return (
        f"WITH {SQL_E}, {SQL_D}, {SQL_U}, {SQL_N}, "
        "seeds AS MATERIALIZED (SELECT node_id FROM nodes WHERE node_id % 64 = 0), "
        + body
        + " "
        + union
    )


_LANDMARKS = (0, 7, 13)


def _q_landmark_dists(spark, sf_dir):
    """Landmark BFS tables (offline phase of a landmark distance
    oracle) on the undirected 64-node subgraph — all landmarks in one
    multi-source BFS."""
    from dachshund_spark.algorithms.neighborhood import landmark_distances

    out = landmark_distances(
        _small_graph(spark, sf_dir), list(_LANDMARKS), max_distance=8
    )
    return out.select("landmark", "node_id", F.col("dist").cast("int").alias("dist"))


def _landmark_parts(
    seeds=_LANDMARKS, rounds: int = 8, max_node: int = 64, lm_sql: str | None = None
):
    seed_list = ", ".join(str(s) for s in seeds)
    parts = [
        SQL_E,
        f"sube AS MATERIALIZED (SELECT src, dst FROM edges_raw "
        f"WHERE src < {max_node} AND dst < {max_node})",
        "subsym AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM sube UNION ALL SELECT dst AS src, src AS dst FROM sube) "
        "WHERE src <> dst)",
        "subn AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM subsym)",
        lm_sql
        or f"lm AS MATERIALIZED (SELECT CAST(unnest([{seed_list}]) AS BIGINT) AS seed)",
        "d0 AS MATERIALIZED (SELECT l.seed, n.node_id, "
        "CASE WHEN n.node_id = l.seed THEN 0 END AS dist FROM subn n, lm l)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT p.seed, e.dst AS node_id, "
            f"MIN(p.dist + 1) AS cand FROM subsym e JOIN d{i-1} p ON e.src = p.node_id "
            f"WHERE p.dist IS NOT NULL GROUP BY p.seed, e.dst)"
        )
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT n.seed, n.node_id, "
            f"CASE WHEN n.dist IS NULL THEN c.cand "
            f"WHEN c.cand IS NULL THEN n.dist "
            f"ELSE LEAST(n.dist, c.cand) END AS dist "
            f"FROM d{i-1} n LEFT JOIN r{i} c "
            f"ON n.seed = c.seed AND n.node_id = c.node_id)"
        )
    return parts, f"d{rounds}"


def _landmark_sql() -> str:
    parts, final = _landmark_parts()
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT seed AS landmark, node_id, CAST(dist AS INT) AS dist "
        f"FROM {final} WHERE dist IS NOT NULL"
    )


def _q_eccentricity(spark, sf_dir):
    """Per-node eccentricity of the 64-node subgraph: ALL nodes as BFS
    sources in one coupled multi-source sweep (16 rounds ≥ diameter);
    radius/center/periphery derive directly from this table."""
    from dachshund_spark.algorithms.neighborhood import landmark_distances

    g = _small_graph(spark, sf_dir)
    seeds = sorted(r[0] for r in g.nodes().collect())
    d = landmark_distances(g, seeds, max_distance=16)
    return d.groupBy(F.col("landmark").alias("node_id")).agg(
        F.max("dist").cast("long").alias("eccentricity"),
        F.count("dist").cast("long").alias("n_reached"),
    )


def _ecc_sql(rounds: int = 16, max_node: int = 64) -> str:
    parts, final = _landmark_parts(
        rounds=rounds,
        max_node=max_node,
        lm_sql="lm AS MATERIALIZED (SELECT node_id AS seed FROM subn)",
    )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT seed AS node_id, CAST(MAX(dist) AS BIGINT) AS eccentricity, "
        f"CAST(COUNT(dist) AS BIGINT) AS n_reached "
        f"FROM {final} WHERE dist IS NOT NULL GROUP BY seed"
    )


def _q_landmark_est(spark, sf_dir):
    """Landmark upper-bound distance estimates for all pairs of
    multiple-of-4 nodes in the 64-node subgraph."""
    from dachshund_spark.algorithms.neighborhood import (
        estimate_distances,
        landmark_distances,
    )

    g = _small_graph(spark, sf_dir)
    dists = landmark_distances(g, list(_LANDMARKS), max_distance=8)
    n4 = g.nodes().where(F.col("node_id") % 4 == 0)
    pairs = (
        n4.select(F.col("node_id").alias("u"))
        .crossJoin(n4.select(F.col("node_id").alias("v")))
        .where(F.col("u") < F.col("v"))
    )
    return estimate_distances(dists, pairs)


def _landmark_est_sql() -> str:
    parts, final = _landmark_parts()
    parts.append(
        f"dd AS MATERIALIZED (SELECT seed, node_id, dist FROM {final} "
        f"WHERE dist IS NOT NULL)"
    )
    parts.append(
        "pairsq AS MATERIALIZED (SELECT a.node_id AS u, b.node_id AS v "
        "FROM subn a JOIN subn b ON a.node_id < b.node_id "
        "WHERE a.node_id % 4 = 0 AND b.node_id % 4 = 0)"
    )
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT p.u, p.v, CAST(MIN(du.dist + dv.dist) AS INT) AS est_distance "
        "FROM pairsq p JOIN dd du ON du.node_id = p.u "
        "JOIN dd dv ON dv.seed = du.seed AND dv.node_id = p.v "
        "GROUP BY p.u, p.v"
    )


def _q_url_filter(spark, sf_dir):
    """URL blocklist verdicts (scheme allow-list > host-suffix
    blocklist > regex pattern blocklist, first match wins) over urls
    synthesized deterministically from doc_id."""
    from dachshund_spark.pipeline.curate import classify_urls

    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 17 == 0, "ftp").otherwise("https"),
            F.lit("://h"),
            (F.col("doc_id") % 8).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 13 == 0, "?utm_source=spam").otherwise(""),
        ).alias("url"),
    )
    return classify_urls(
        urls,
        blocked_hosts=["h3.example.com"],
        blocked_patterns=[r"utm_source"],
    ).select("doc_id", "url_host", "url_verdict")


_URL_FILTER_SQL = (
    "WITH u AS MATERIALIZED (SELECT doc_id, "
    "CASE WHEN doc_id % 17 = 0 THEN 'ftp' ELSE 'https' END || '://h' || "
    "CAST(doc_id % 8 AS VARCHAR) || '.example.com/p/' || CAST(doc_id AS VARCHAR) || "
    "CASE WHEN doc_id % 13 = 0 THEN '?utm_source=spam' ELSE '' END AS url "
    "FROM documents), "
    "h AS MATERIALIZED (SELECT doc_id, url, "
    "lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme, "
    "lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS url_host "
    "FROM u) "
    "SELECT doc_id, url_host, "
    "CASE WHEN scheme NOT IN ('http', 'https') THEN 'bad_scheme' "
    "WHEN url_host = 'h3.example.com' OR url_host LIKE '%.h3.example.com' THEN 'blocked_host' "
    "WHEN regexp_matches(url, 'utm_source') THEN 'blocked_pattern' "
    "ELSE 'ok' END AS url_verdict FROM h"
)


KATZ_ALPHA = 2.0 ** -11  # exactly representable; α·λ_max ≪ 1 on the fixture
KATZ_ITERS = 10


def _q_katz(spark, sf_dir):
    """Katz centrality, 10 fixed supersteps, β=1."""
    from dachshund_spark.algorithms.evcent import katz_centrality

    out = katz_centrality(
        derived_graph(spark, sf_dir),
        alpha=KATZ_ALPHA,
        beta=1.0,
        fixed_iterations=KATZ_ITERS,
    )
    return out.select("node_id", F.round("katz", 8).alias("katz"))


def _katz_sql(iters: int = KATZ_ITERS, alpha: float = KATZ_ALPHA) -> str:
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        SQL_D,
        # CAST the literals: DuckDB parses bare decimals as DECIMAL and
        # the unrolled multiplications overflow scale 38
        "x0 AS MATERIALIZED (SELECT node_id, CAST(1.0 AS DOUBLE) AS x FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"x{i+1} AS MATERIALIZED (SELECT n.node_id, "
            f"1.0 + CAST({alpha!r} AS DOUBLE) * COALESCE(c.contrib, 0.0) AS x "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node_id, SUM(x.x) AS contrib "
            f"FROM d_edges e JOIN x{i} x ON e.src = x.node_id GROUP BY e.dst) c "
            f"ON n.node_id = c.node_id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, ROUND(x, 8) AS katz FROM x{iters}"
    )


# deterministic 64-dim "trained" logreg weights: quarters, exactly
# representable, nonzero mix of signs
_MODEL_W = [((i % 7) - 3) / 4.0 for i in range(64)]
_MODEL_B = 0.25


def _q_embedding_scores(spark, sf_dir):
    """Broadcast linear/logistic model scoring over the embeddings
    table — the quality-classifier inference pass of an LLM data
    pipeline (zero shuffle; dot product in element order)."""
    from dachshund_spark.pipeline.scoring import linear_scores

    emb = load_table(spark, sf_dir, "embeddings")
    out = linear_scores(emb, _MODEL_W, _MODEL_B)
    return out.select("id", F.round("score", 8).alias("score"), "prob", "passes")


def _embedding_scores_sql() -> str:
    w = "[" + ", ".join(repr(x) for x in _MODEL_W) + "]"
    return (
        f"WITH m AS MATERIALIZED (SELECT vec_id AS id, "
        f"list_dot_product(CAST(embedding AS DOUBLE[]), {w}) + 0.25 AS score "
        f"FROM embeddings) "
        "SELECT id, ROUND(score, 8) AS score, "
        "ROUND(1.0 / (1.0 + exp(-score)), 8) AS prob, "
        "ROUND(1.0 / (1.0 + exp(-score)), 8) >= 0.5 AS passes FROM m"
    )


def _q_vocabulary(spark, sf_dir):
    """Corpus vocabulary (term + document frequency), df ≥ 2 — the
    tokenizer-training / df-threshold first pass."""
    from dachshund_spark.pipeline.text import vocabulary

    return vocabulary(load_table(spark, sf_dir, "documents"), min_df=2)


_VOCABULARY_SQL = (
    "WITH t AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, ' ')) AS token "
    "FROM documents), "
    "pd AS MATERIALIZED (SELECT token, doc_id, COUNT(*) AS tf FROM t GROUP BY token, doc_id) "
    "SELECT token, CAST(SUM(tf) AS BIGINT) AS tf, CAST(COUNT(*) AS BIGINT) AS df "
    "FROM pd GROUP BY token HAVING COUNT(*) >= 2"
)


def _q_readability(spark, sf_dir):
    """Flesch-Kincaid grade + reading ease. The fixture corpus has no
    sentence punctuation, so the query first inserts deterministic
    sentence breaks (replace ' the ' → '. the ' — plain left-to-right
    non-overlapping replace, identical semantics in both engines)."""
    from dachshund_spark.pipeline.text import readability

    docs = load_table(spark, sf_dir, "documents")
    punct = docs.withColumn(
        "text", F.replace(F.col("text"), F.lit(" the "), F.lit(". the "))
    )
    return readability(punct)


_READABILITY_SQL = (
    "WITH d AS MATERIALIZED (SELECT doc_id, "
    "replace(text, ' the ', '. the ') AS text FROM documents), "
    "c AS MATERIALIZED (SELECT doc_id, "
    "CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words, "
    "GREATEST(CAST(length(regexp_extract_all(text, '[.!?]+')) AS BIGINT), "
    "CAST(1 AS BIGINT)) AS n_sentences, "
    "CAST(length(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) "
    "AS n_syllables FROM d) "
    "SELECT doc_id, n_words, n_sentences, n_syllables, "
    "ROUND(CAST(0.39 AS DOUBLE) * CAST(GREATEST(n_words, CAST(1 AS BIGINT)) AS DOUBLE) "
    "/ CAST(n_sentences AS DOUBLE) + CAST(11.8 AS DOUBLE) * CAST(n_syllables AS DOUBLE) "
    "/ CAST(GREATEST(n_words, CAST(1 AS BIGINT)) AS DOUBLE) - CAST(15.59 AS DOUBLE), 8) "
    "AS fk_grade, "
    "ROUND(CAST(206.835 AS DOUBLE) - CAST(1.015 AS DOUBLE) * "
    "CAST(GREATEST(n_words, CAST(1 AS BIGINT)) AS DOUBLE) / CAST(n_sentences AS DOUBLE) "
    "- CAST(84.6 AS DOUBLE) * CAST(n_syllables AS DOUBLE) "
    "/ CAST(GREATEST(n_words, CAST(1 AS BIGINT)) AS DOUBLE), 8) AS reading_ease "
    "FROM c"
)


def _q_token_entropy(spark, sf_dir):
    """Corpus unigram Shannon entropy (1e-8-nat exact integer) — the
    diversity dial curation tracks across dedup/filter sweeps."""
    from dachshund_spark.pipeline.text import token_entropy

    return token_entropy(load_table(spark, sf_dir, "documents"))


_TOKEN_ENTROPY_SQL = (
    "WITH t AS MATERIALIZED (SELECT unnest(string_split(text, ' ')) AS token "
    "FROM documents), "
    "c AS MATERIALIZED (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt "
    "FROM t GROUP BY token), "
    "n AS MATERIALIZED (SELECT CAST(SUM(cnt) AS BIGINT) AS n_tokens FROM c) "
    "SELECT n.n_tokens AS n_tokens, CAST(COUNT(*) AS BIGINT) AS n_types, "
    "CAST(SUM(CAST(ROUND(-(CAST(cnt AS DOUBLE) / CAST(n.n_tokens AS DOUBLE) * "
    "ln(CAST(cnt AS DOUBLE) / CAST(n.n_tokens AS DOUBLE))) * 1e8, 0) AS BIGINT)) "
    "AS BIGINT) AS entropy_e8 "
    "FROM c, n GROUP BY n.n_tokens"
)


def _q_cocitation(spark, sf_dir):
    """Co-citation strength on the 256-node subgraph: pairs of pages
    with ≥1 shared in-linker, weight = number of co-citing pages."""
    from dachshund_spark.algorithms.linkpred import cocitation

    e = derived_graph(spark, sf_dir).edges
    sub = LinkGraph(e.where((F.col("src") < 256) & (F.col("dst") < 256)))
    return cocitation(sub)


_COCITATION_SQL = (
    f"WITH {SQL_E}, "
    "sube AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges_raw "
    "WHERE src < 256 AND dst < 256) "
    "SELECT a.dst AS u, b.dst AS v, CAST(COUNT(*) AS BIGINT) AS weight "
    "FROM sube a JOIN sube b ON a.src = b.src AND a.dst < b.dst "
    "GROUP BY a.dst, b.dst"
)


def _q_coupling(spark, sf_dir):
    """Bibliographic coupling on the 256-node subgraph: pairs of pages
    sharing ≥1 out-link target, weight = number of shared targets."""
    from dachshund_spark.algorithms.linkpred import bibliographic_coupling

    e = derived_graph(spark, sf_dir).edges
    sub = LinkGraph(e.where((F.col("src") < 256) & (F.col("dst") < 256)))
    return bibliographic_coupling(sub)


_COUPLING_SQL = (
    f"WITH {SQL_E}, "
    "sube AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges_raw "
    "WHERE src < 256 AND dst < 256) "
    "SELECT a.src AS u, b.src AS v, CAST(COUNT(*) AS BIGINT) AS weight "
    "FROM sube a JOIN sube b ON a.dst = b.dst AND a.src < b.src "
    "GROUP BY a.src, b.src"
)


def _q_butterflies(spark, sf_dir):
    """Per-node bipartite butterfly (2x2 biclique) counts on the
    256-node subgraph, destination side — the link-farm motif signal.
    Counts are exact integers (sum of C(shared_sources, 2) over
    co-cited pairs), so the oracle comparison is arithmetic-free."""
    from dachshund_spark.algorithms.butterflies import butterfly_counts

    e = derived_graph(spark, sf_dir).edges
    sub = LinkGraph(e.where((F.col("src") < 256) & (F.col("dst") < 256)))
    return butterfly_counts(sub, side="dst")


_BUTTERFLY_SQL = (
    f"WITH {SQL_E}, "
    "sube AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges_raw "
    "WHERE src < 256 AND dst < 256), "
    "pairs AS MATERIALIZED (SELECT a.dst AS u, b.dst AS v, "
    "CAST(COUNT(*) AS BIGINT) AS w "
    "FROM sube a JOIN sube b ON a.src = b.src AND a.dst < b.dst "
    "GROUP BY a.dst, b.dst HAVING COUNT(*) >= 2), "
    "ends AS (SELECT u AS node_id, w FROM pairs "
    "UNION ALL SELECT v AS node_id, w FROM pairs) "
    "SELECT node_id, CAST(SUM((w * (w - 1)) // 2) AS BIGINT) AS butterflies "
    "FROM ends GROUP BY node_id"
)


def _q_coloring(spark, sf_dir):
    """Speculative greedy coloring (Gebremedhin-Manne) on the 256-node
    subgraph, 8 fixed rounds, seed 0.  Fixed rounds make the output
    deterministic regardless of convergence: still-uncolored nodes
    carry color = NULL and the oracle unroll replays the exact
    round-by-round trace (md5 priorities, mex, conflict domination)."""
    from dachshund_spark.algorithms.coloring import speculative_coloring

    e = derived_graph(spark, sf_dir).edges
    sub = LinkGraph(e.where((F.col("src") < 256) & (F.col("dst") < 256)))
    return speculative_coloring(sub, rounds=8, seed=0)


def _coloring_sql(rounds: int = 8) -> str:
    """Exact SQL replay of speculative_coloring(rounds, seed=0) on the
    <256 subgraph.  Every CTE is AS MATERIALIZED — s{r} is referenced
    by four CTEs of round r+1 and the inlined chain goes exponential
    (CLAUDE.md onion_layers lesson)."""
    parts = [
        SQL_E,
        "sube AS MATERIALIZED (SELECT src, dst FROM edges_raw "
        "WHERE src < 256 AND dst < 256)",
        "subsym AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM sube UNION ALL "
        "SELECT dst AS src, src AS dst FROM sube) WHERE src <> dst)",
        "cnodes AS MATERIALIZED (SELECT DISTINCT node_id FROM "
        "(SELECT src AS node_id FROM sube UNION ALL SELECT dst FROM sube))",
        "s0 AS MATERIALIZED (SELECT node_id, "
        "md5('0#color#' || CAST(node_id AS VARCHAR)) AS h, "
        "CAST(NULL AS INTEGER) AS color FROM cnodes)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts += [
            f"unc{r} AS MATERIALIZED (SELECT node_id, h FROM s{p} "
            "WHERE color IS NULL)",
            # distinct committed neighbor colors of each uncolored node
            f"used{r} AS MATERIALIZED (SELECT DISTINCT u.dst AS node_id, "
            f"CAST(c.color AS BIGINT) AS c FROM subsym u "
            f"JOIN s{p} c ON u.src = c.node_id AND c.color IS NOT NULL "
            f"JOIN unc{r} x ON u.dst = x.node_id)",
            f"ncol{r} AS MATERIALIZED (SELECT node_id, COUNT(*) AS n "
            f"FROM used{r} GROUP BY node_id)",
            # mex candidates 0..n (n used colors leave a hole in [0, n])
            f"cand{r} AS MATERIALIZED (SELECT t.node_id, t.h, "
            "UNNEST(generate_series(0, COALESCE(n.n, CAST(0 AS BIGINT)))) AS c "
            f"FROM unc{r} t LEFT JOIN ncol{r} n ON t.node_id = n.node_id)",
            f"tent{r} AS MATERIALIZED (SELECT a.node_id, a.h, MIN(a.c) AS tc "
            f"FROM cand{r} a LEFT JOIN used{r} u "
            "ON a.node_id = u.node_id AND a.c = u.c "
            "WHERE u.node_id IS NULL GROUP BY a.node_id, a.h)",
            # dominated: an adjacent uncolored node picked the same
            # tentative color with strictly higher (h, node_id)
            f"dom{r} AS MATERIALIZED (SELECT DISTINCT t.node_id "
            f"FROM subsym u JOIN tent{r} o ON u.src = o.node_id "
            f"JOIN tent{r} t ON u.dst = t.node_id "
            "WHERE o.tc = t.tc AND (o.h > t.h OR "
            "(o.h = t.h AND o.node_id > t.node_id)))",
            f"s{r} AS MATERIALIZED (SELECT s.node_id, s.h, "
            "COALESCE(s.color, CASE WHEN w.node_id IS NOT NULL "
            "AND d.node_id IS NULL THEN CAST(w.tc AS INTEGER) END) AS color "
            f"FROM s{p} s LEFT JOIN tent{r} w ON s.node_id = w.node_id "
            f"LEFT JOIN dom{r} d ON s.node_id = d.node_id)",
        ]
    return (
        "WITH " + ", ".join(parts) + f" SELECT node_id, color FROM s{rounds}"
    )


def _q_dup_spans(spark, sf_dir):
    """ExactSubstr duplicated 32-char spans across documents (Lee et
    al. 2022) — all hashes/counts exact integers, arithmetic-free."""
    from dachshund_spark.pipeline.dedup import duplicate_spans

    return duplicate_spans(load_table(spark, sf_dir, "documents"), k=32)


_DUP_SPANS_SQL = (
    "WITH grams AS MATERIALIZED (SELECT doc_id, "
    + MD5L.format(x="substr(text, CAST(p AS INTEGER), 32)")
    + " AS gram_hash FROM documents, "
    "UNNEST(generate_series(1, LENGTH(text) - 31)) AS t(p) "
    "WHERE LENGTH(text) >= 32) "
    "SELECT gram_hash, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, "
    "CAST(COUNT(*) AS BIGINT) AS n_occurrences, MIN(doc_id) AS min_doc_id "
    "FROM grams GROUP BY gram_hash HAVING COUNT(DISTINCT doc_id) >= 2"
)


def _q_winnow(spark, sf_dir):
    """Winnowing fingerprint selection (k=16, w=4): per 4-gram-hash
    window keep min (hash, pos) — deterministic content-based
    sampling, row-level exact."""
    from dachshund_spark.pipeline.dedup import winnow_fingerprints

    return winnow_fingerprints(
        load_table(spark, sf_dir, "documents"), k=16, w=4
    )


_WINNOW_SQL = (
    "WITH grams AS MATERIALIZED (SELECT doc_id, CAST(p AS INTEGER) AS pos, "
    + MD5L.format(x="substr(text, CAST(p AS INTEGER), 16)")
    + " AS h, CAST(LENGTH(text) - 15 AS INTEGER) AS ng FROM documents, "
    "UNNEST(generate_series(1, LENGTH(text) - 15)) AS t(p) "
    "WHERE LENGTH(text) >= 16), "
    "sel AS MATERIALIZED (SELECT doc_id, pos, ng, "
    "MIN({'h': h, 'p': pos}) OVER (PARTITION BY doc_id ORDER BY pos "
    "ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m FROM grams) "
    "SELECT DISTINCT doc_id, m.p AS pos, m.h AS gram_hash "
    "FROM sel WHERE pos <= ng - 3"
)


def _q_winnow_pairs(spark, sf_dir):
    """MOSS candidate pairs from shared winnowing fingerprints
    (k=16, w=4, bucket cap 16).  est_jaccard is a single IEEE division
    of exact integers — engine-stable raw doubles."""
    from dachshund_spark.pipeline.dedup import winnow_candidate_pairs

    return winnow_candidate_pairs(
        load_table(spark, sf_dir, "documents"), k=16, w=4, max_bucket=16
    )


_WINNOW_PAIRS_SQL = (
    "WITH grams AS MATERIALIZED (SELECT doc_id, CAST(p AS INTEGER) AS pos, "
    + MD5L.format(x="substr(text, CAST(p AS INTEGER), 16)")
    + " AS h, CAST(LENGTH(text) - 15 AS INTEGER) AS ng FROM documents, "
    "UNNEST(generate_series(1, LENGTH(text) - 15)) AS t(p) "
    "WHERE LENGTH(text) >= 16), "
    "sel AS MATERIALIZED (SELECT doc_id, pos, ng, "
    "MIN({'h': h, 'p': pos}) OVER (PARTITION BY doc_id ORDER BY pos "
    "ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m FROM grams), "
    "fp0 AS MATERIALIZED (SELECT DISTINCT doc_id, m.h AS gram_hash "
    "FROM sel WHERE pos <= ng - 3), "
    "fp AS MATERIALIZED (SELECT doc_id, gram_hash FROM fp0 "
    "WHERE gram_hash IN (SELECT gram_hash FROM fp0 "
    "GROUP BY gram_hash HAVING COUNT(*) <= 16)), "
    "counts AS MATERIALIZED (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp "
    "FROM fp GROUP BY doc_id), "
    "pairs AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "CAST(COUNT(*) AS BIGINT) AS shared_fp FROM fp a "
    "JOIN fp b ON a.gram_hash = b.gram_hash AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id) "
    "SELECT doc_a, doc_b, shared_fp, ca.n_fp AS n_fp_a, cb.n_fp AS n_fp_b, "
    "shared_fp / (ca.n_fp + cb.n_fp - shared_fp) AS est_jaccard "
    "FROM pairs JOIN counts ca ON pairs.doc_a = ca.doc_id "
    "JOIN counts cb ON pairs.doc_b = cb.doc_id"
)


def _q_dsir(spark, sf_dir):
    """DSIR hashed-unigram importance weights, target = lang 'en'.
    Four pre-rounded e8 ln terms per bucket combined in integer space
    (PMI decomposition — overflow-safe, engine-exact); w_e8 is an
    exact integer dot product, log_weight the single closing /1e8."""
    from dachshund_spark.pipeline.lm import dsir_weights

    return dsir_weights(
        load_table(spark, sf_dir, "documents"), F.col("lang") == "en"
    )


_DSIR_SQL = (
    "WITH dt AS MATERIALIZED (SELECT doc_id, lang = 'en' AS ist, "
    "unnest(string_split(text, ' ')) AS tok FROM documents), "
    "bk AS MATERIALIZED (SELECT doc_id, ist, ("
    + MD5L.format(x="tok")
    + ") % 1024 AS bucket FROM dt), "
    "bc AS MATERIALIZED (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS sc, "
    "CAST(SUM(CASE WHEN ist THEN 1 ELSE 0 END) AS BIGINT) AS tc "
    "FROM bk GROUP BY bucket), "
    "tot AS (SELECT CAST(SUM(sc) AS BIGINT) AS s, "
    "CAST(SUM(tc) AS BIGINT) AS t FROM bc), "
    "terms AS MATERIALIZED (SELECT bucket, "
    + _E8LN.format(x="tc + 1")
    + " - "
    + _E8LN.format(x="sc + 1")
    + " + "
    + _E8LN.format(x="(SELECT s FROM tot) + 1024")
    + " - "
    + _E8LN.format(x="(SELECT t FROM tot) + 1024")
    + " AS term FROM bc), "
    "dc AS MATERIALIZED (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c "
    "FROM bk GROUP BY doc_id, bucket) "
    "SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, "
    "CAST(SUM(c * term) AS BIGINT) AS w_e8, "
    "CAST(SUM(c * term) AS BIGINT) / 100000000 AS log_weight "
    "FROM dc JOIN terms USING (bucket) GROUP BY doc_id"
)


def _q_pack(spark, sf_dir):
    """Concat-and-chunk packing manifest at capacity 256 — pure
    integer arithmetic over a two-phase global cumsum (no
    single-partition window; plan-guarded in tests)."""
    from dachshund_spark.pipeline.packing import pack_documents

    return pack_documents(load_table(spark, sf_dir, "documents"), 256)


_PACK_SQL = (
    "WITH n AS MATERIALIZED (SELECT doc_id, "
    "CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents), "
    "c AS MATERIALIZED (SELECT doc_id, n, "
    "CAST(SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n "
    "AS BIGINT) AS gs FROM n), "
    "spans AS MATERIALIZED (SELECT doc_id, n, gs, "
    "UNNEST(generate_series(gs // 256, (gs + n - 1) // 256)) AS s "
    "FROM c WHERE n > 0) "
    "SELECT CAST(s AS BIGINT) AS seq_id, doc_id, "
    "CAST(GREATEST(gs, s * 256) - s * 256 AS BIGINT) AS seq_offset, "
    "CAST(GREATEST(gs, s * 256) - gs AS BIGINT) AS doc_offset, "
    "CAST(LEAST(gs + n, (s + 1) * 256) - GREATEST(gs, s * 256) AS BIGINT) AS n_tok "
    "FROM spans"
)


def _q_stratified_sample(spark, sf_dir):
    """Deterministic hash-threshold stratified sample (en 50%, de 25%,
    others 10%) — keep decision is a pure function of doc_id, so both
    engines select identical rows with integer-only comparisons."""
    from dachshund_spark.pipeline.curate import hash_stratified_sample

    return hash_stratified_sample(
        load_table(spark, sf_dir, "documents"),
        {"en": 0.5, "de": 0.25},
        default=0.1,
    ).select("doc_id", "lang", "source")


_STRATIFIED_SQL = (
    "SELECT doc_id, lang, source FROM documents WHERE ("
    + MD5L.format(x="'0#samp#' || CAST(doc_id AS VARCHAR)")
    + ") % 1000000 < (CASE WHEN lang = 'en' THEN 500000 "
    "WHEN lang = 'de' THEN 250000 ELSE 100000 END)"
)


def _q_novelty(spark, sf_dir):
    """Per-doc 32-gram novelty (share of windows unseen in any other
    doc) — integer counts, one closing division."""
    from dachshund_spark.pipeline.dedup import ngram_novelty

    return ngram_novelty(load_table(spark, sf_dir, "documents"), k=32)


_NOVELTY_SQL = (
    "WITH grams AS MATERIALIZED (SELECT doc_id, "
    + MD5L.format(x="substr(text, CAST(p AS INTEGER), 32)")
    + " AS gram_hash FROM documents, "
    "UNNEST(generate_series(1, LENGTH(text) - 31)) AS t(p) "
    "WHERE LENGTH(text) >= 32), "
    "cross_counts AS MATERIALIZED (SELECT gram_hash, "
    "COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY gram_hash) "
    "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
    "CAST(SUM(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel, "
    "CAST(SUM(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS BIGINT) / "
    "CAST(COUNT(*) AS BIGINT) AS novelty "
    "FROM grams JOIN cross_counts USING (gram_hash) GROUP BY doc_id"
)


def _q_bpe(spark, sf_dir):
    """First 8 BPE merges learned from the corpus (Sennrich greedy
    left-to-right, lexicographic tie-break) — the full round-by-round
    trace replays in SQL; counts are exact integers."""
    from dachshund_spark.pipeline.lm import bpe_merges

    return bpe_merges(load_table(spark, sf_dir, "documents"), 8)


def _bpe_sql(rounds: int = 8) -> str:
    final = " UNION ALL ".join(
        f'SELECT CAST({r} AS INTEGER) AS "rank", a, b, '
        f"CAST(c AS BIGINT) AS pair_count FROM top{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ", ".join(_bpe_parts(rounds)) + " " + final


def _bpe_encode_sql(rounds: int = 8) -> str:
    """Replay the learning unroll, then encode: every distinct word's
    final symbol list IS its encoding, so per-doc counts are one word
    join over the exploded corpus."""
    return (
        "WITH "
        + ", ".join(_bpe_parts(rounds))
        + ", corpus AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word "
        "FROM documents) "
        "SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, "
        f"CAST(SUM(len(v.syms)) AS BIGINT) AS n_bpe_tokens "
        f"FROM corpus c JOIN v{rounds} v ON c.word = v.word GROUP BY c.doc_id"
    )


def _bpe_parts(rounds: int = 8) -> list[str]:
    parts = [
        "v0 AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq, "
        "string_split(word, '') AS syms FROM (SELECT "
        "unnest(string_split(text, ' ')) AS word FROM documents) GROUP BY word)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts += [
            f"pr{r} AS MATERIALIZED (SELECT word, freq, CAST(p AS INTEGER) AS p, "
            "syms[CAST(p + 1 AS INTEGER)] AS a, syms[CAST(p + 2 AS INTEGER)] AS b "
            f"FROM v{p}, UNNEST(generate_series(0, len(syms) - 2)) AS t(p) "
            "WHERE len(syms) >= 2)",
            f"top{r} AS MATERIALIZED (SELECT a, b, SUM(freq) AS c FROM pr{r} "
            "GROUP BY a, b ORDER BY c DESC, a, b LIMIT 1)",
            f"m{r}b AS MATERIALIZED (SELECT pr.word, pr.p FROM pr{r} pr "
            f"JOIN top{r} t ON pr.a = t.a AND pr.b = t.b)",
            f"isl{r} AS (SELECT word, p, p - ROW_NUMBER() OVER "
            f"(PARTITION BY word ORDER BY p) AS island FROM m{r}b)",
            f"kept{r} AS MATERIALIZED (SELECT word, p FROM (SELECT word, p, "
            f"MIN(p) OVER (PARTITION BY word, island) AS mn FROM isl{r}) "
            "WHERE (p - mn) % 2 = 0)",
            f"allq{r} AS (SELECT word, freq, CAST(q AS INTEGER) AS q, "
            "syms[CAST(q + 1 AS INTEGER)] AS sym "
            f"FROM v{p}, UNNEST(generate_series(0, len(syms) - 1)) AS t(q))",
            f"v{r} AS MATERIALIZED (SELECT a.word, a.freq, "
            f"list(CASE WHEN s.p IS NOT NULL THEN (SELECT a || b FROM top{r}) "
            "ELSE a.sym END ORDER BY a.q) AS syms "
            f"FROM allq{r} a LEFT JOIN kept{r} s "
            "ON a.word = s.word AND a.q = s.p "
            f"LEFT JOIN kept{r} s2 ON a.word = s2.word AND a.q = s2.p + 1 "
            "WHERE s2.p IS NULL GROUP BY a.word, a.freq)",
        ]
    return parts


def _q_lpa_conductance(spark, sf_dir):
    """Per-community conductance of the 5-round LPA partition —
    integer cut/volume sums, one closing division (NULL when a label
    spans the whole graph)."""
    from dachshund_spark.algorithms import label_propagation
    from dachshund_spark.algorithms.stats import conductance

    g = derived_graph(spark, sf_dir)
    return conductance(g, label_propagation(g, iterations=LPA_ITERS))


def _q_dup_intervals(spark, sf_dir):
    """Maximal duplicated char intervals (ExactSubstr removal step):
    cross-doc duplicated 32-gram windows merged by SQL interval
    merging — all integers, per-doc windows."""
    from dachshund_spark.pipeline.dedup import duplicate_intervals

    return duplicate_intervals(load_table(spark, sf_dir, "documents"), k=32)


_DUP_INTERVALS_SQL = (
    "WITH grams AS MATERIALIZED (SELECT doc_id, CAST(p AS INTEGER) AS pos, "
    + MD5L.format(x="substr(text, CAST(p AS INTEGER), 32)")
    + " AS gram_hash FROM documents, "
    "UNNEST(generate_series(1, LENGTH(text) - 31)) AS t(p) "
    "WHERE LENGTH(text) >= 32), "
    "dupg AS MATERIALIZED (SELECT gram_hash FROM grams "
    "GROUP BY gram_hash HAVING COUNT(DISTINCT doc_id) >= 2), "
    "dup AS MATERIALIZED (SELECT doc_id, pos, pos + 31 AS w_end FROM grams "
    "WHERE gram_hash IN (SELECT gram_hash FROM dupg)), "
    "flagged AS MATERIALIZED (SELECT doc_id, pos, w_end, "
    "CASE WHEN pos > COALESCE(MAX(w_end) OVER (PARTITION BY doc_id "
    "ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1 "
    "THEN 1 ELSE 0 END AS nw FROM dup), "
    "isl AS MATERIALIZED (SELECT doc_id, pos, w_end, "
    "SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos "
    "ROWS UNBOUNDED PRECEDING) AS island FROM flagged) "
    "SELECT doc_id, MIN(pos) AS start_pos, MAX(w_end) AS end_pos, "
    "MAX(w_end) - MIN(pos) + 1 AS span_len "
    "FROM isl GROUP BY doc_id, island"
)


def _q_spam_mass(spark, sf_dir):
    """TrustRank spam-mass estimation: trusted core {0,1,2,3}; the
    spam-mass ratio is computed from the 8-decimal-rounded PR/TR so
    the oracle composition (nested pagerank + PPR unrolls) is exact."""
    from dachshund_spark.algorithms.trust import spam_mass

    return spam_mass(
        derived_graph(spark, sf_dir),
        trusted=[0, 1, 2, 3],
        damping=DAMPING,
        fixed_iterations=PAGERANK_ITERS,
    )


def _unrounded_rank_sql(sql: str) -> str:
    """Strip the final ROUND(rank, 8) projection of a pagerank/PPR
    unroll — the spam-mass ratio must divide RAW ranks (rounding first
    zeroes the (1-d)/n floor on huge graphs)."""
    import re as _re

    i = sql.rfind(" SELECT ")
    m = _re.search(r"FROM (r\d+)$", sql[i:])
    return sql[:i] + f" SELECT node_id, rank FROM {m.group(1)}"


def _spam_mass_sql(seeds=(0, 1, 2, 3)) -> str:
    # nested WITH queries: DuckDB scopes each unroll's CTE names inside
    # its own subquery, so the PR and TR chains cannot collide
    return (
        f"WITH prq AS MATERIALIZED ({_unrounded_rank_sql(_pagerank_sql())}), "
        f"trq AS MATERIALIZED ({_unrounded_rank_sql(_ppr_sql(tuple(seeds)))}) "
        "SELECT prq.node_id, ROUND(prq.rank, 8) AS pagerank, "
        "ROUND(trq.rank, 8) AS trustrank, "
        "ROUND((prq.rank - trq.rank) / prq.rank, 8) AS spam_mass "
        "FROM prq JOIN trq ON prq.node_id = trq.node_id"
    )


def _q_crawl_delta(spark, sf_dir):
    """Per-page link churn between two crawl snapshots (old =
    lineitem rows 1-3, new = rows 2+ — overlapping, realistic
    add/remove/stable mix)."""
    from dachshund_spark.algorithms.delta import snapshot_delta

    li = load_table(spark, sf_dir, "lineitem")

    def snap(pred):
        e = li.where(pred).select(
            (F.col("l_orderkey") % N_NODES).alias("src"),
            (F.col("l_partkey") % N_NODES).alias("dst"),
        )
        return e.where(F.col("src") != F.col("dst"))

    return snapshot_delta(
        snap(F.col("l_linenumber") <= 3), snap(F.col("l_linenumber") >= 2)
    )


_CRAWL_DELTA_SQL = (
    f"WITH o AS MATERIALIZED (SELECT DISTINCT l_orderkey % {N_NODES} AS src, "
    f"l_partkey % {N_NODES} AS dst FROM lineitem "
    f"WHERE l_orderkey % {N_NODES} <> l_partkey % {N_NODES} AND l_linenumber <= 3), "
    f"n AS MATERIALIZED (SELECT DISTINCT l_orderkey % {N_NODES} AS src, "
    f"l_partkey % {N_NODES} AS dst FROM lineitem "
    f"WHERE l_orderkey % {N_NODES} <> l_partkey % {N_NODES} AND l_linenumber >= 2), "
    "j AS MATERIALIZED (SELECT COALESCE(o.src, n.src) AS src, "
    "o.src IS NOT NULL AS in_old, n.src IS NOT NULL AS in_new "
    "FROM o FULL JOIN n ON o.src = n.src AND o.dst = n.dst), "
    "agg AS MATERIALIZED (SELECT src, "
    "CAST(SUM(CASE WHEN NOT in_old AND in_new THEN 1 ELSE 0 END) AS BIGINT) AS n_added, "
    "CAST(SUM(CASE WHEN in_old AND NOT in_new THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, "
    "CAST(SUM(CASE WHEN in_old AND in_new THEN 1 ELSE 0 END) AS BIGINT) AS n_stable "
    "FROM j GROUP BY src) "
    "SELECT src, n_added, n_removed, n_stable, "
    "n_stable / CAST(n_added + n_removed + n_stable AS DOUBLE) AS jaccard FROM agg"
)


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------
_STOP = "'the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'"
_LANGS = {
    "de": "'der', 'die', 'und', 'das'",
    "en": "'the', 'and', 'of', 'is'",
    "es": "'el', 'la', 'de', 'que'",
    "fr": "'le', 'la', 'et', 'les'",
}

_ORACLES: dict[str, str] = {
    "out_degree": (
        f"WITH {SQL_E}, {SQL_D} "
        "SELECT src AS node_id, COUNT(*) AS out_degree FROM d_edges GROUP BY src"
    ),
    "undirected_degree": (
        f"WITH {SQL_E}, {SQL_U} "
        "SELECT src AS node_id, COUNT(*) AS degree FROM und GROUP BY src"
    ),
    "graph_summary": (
        f"WITH {SQL_E}, {SQL_U}, {SQL_D}, {SQL_N}, {SQL_DEG} "
        "SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes, "
        "(SELECT COUNT(*) FROM und WHERE src < dst) AS n_edges, "
        "(SELECT COUNT(*) FROM d_edges) AS n_edges_directed, "
        "(SELECT MAX(degree) FROM deg) AS max_degree, "
        "(SELECT CAST(SUM(degree) AS DOUBLE) / COUNT(*) FROM deg) AS avg_degree"
    ),
    "hub_top20": (
        f"WITH {SQL_E}, {SQL_D} "
        "SELECT dst AS node_id, COUNT(*) AS in_degree FROM d_edges GROUP BY dst "
        "ORDER BY in_degree DESC, node_id ASC LIMIT 20"
    ),
    "cc_components": _cc_sql(),
    "incremental_cc": _cc_sql(),
    # star-contraction CC: identical min-member labels, so the oracle is
    # the hash-min unroll minus the renumber column
    "cc_star": (
        _cc_sql()[: _cc_sql().rfind(" SELECT ")]
        + f" SELECT node_id, label AS component FROM l{CC_ITERS}"
    ),
    "pagerank_10": _pagerank_sql(),
    "pagerank_weighted_10": _pagerank_weighted_sql(),
    "ppr_10": _ppr_sql((0, 1, 2, 3)),
    "hits_10": _hits_sql(10),
    "salsa_10": _salsa_sql(10),
    "densest_peel": _densest_sql(24, 0.5),
    "powerlaw_alpha_5": _POWERLAW_SQL,
    "ngram_containment_pairs": _CONTAINMENT_SQL,
    "url_canonical_groups": _URL_CANONICAL_SQL,
    "simrank_64": _simrank_sql(5, 64),
    "phrase_merge_group": _PHRASE_SQL,
    "cms_top20": _cms_sql(4, 256),
    "robots_allowed": _ROBOTS_SQL,
    "random_walks_64": _walks_sql(6, 2, 0, 64),
    "node2vec_walks_64": _node2vec_sql(6, 2, 4.0, 0.25, 0, 64),
    "skipgram_pairs": _skipgram_sql(6, 2, 0, 64, 2),
    "lpa_5": _lpa_sql(),
    "triangle_counts": (
        f"WITH {SQL_E}, {SQL_U}, {SQL_N}, {SQL_CANON}, {SQL_TRI}, {SQL_TRIC} "
        "SELECT node_id, triangles FROM tric"
    ),
    "wedge_counts": (
        f"WITH {SQL_E}, {SQL_U}, {SQL_DEG} "
        "SELECT node_id, CAST(degree * (degree - 1) / 2 AS BIGINT) AS triples FROM deg"
    ),
    "transitivity_global": (
        f"WITH {SQL_E}, {SQL_U}, {SQL_N}, {SQL_CANON}, {SQL_TRI}, {SQL_TRIC}, {SQL_DEG} "
        "SELECT CAST((SELECT SUM(triangles) FROM tric) AS DOUBLE) / "
        "CAST((SELECT SUM(CAST(degree * (degree - 1) / 2 AS BIGINT)) FROM deg) AS DOUBLE) "
        "AS transitivity"
    ),
    "clustering_coefficients": (
        f"WITH {SQL_E}, {SQL_U}, {SQL_N}, {SQL_CANON}, {SQL_TRI}, {SQL_TRIC}, {SQL_DEG} "
        "SELECT d.node_id, CASE WHEN d.degree >= 2 "
        "THEN 2.0 * t.triangles / (d.degree * (d.degree - 1)) END AS clustering "
        "FROM deg d JOIN tric t ON d.node_id = t.node_id"
    ),
    "brokerage_roles": (
        f"WITH {SQL_E}, {SQL_U}, {SQL_N}, {SQL_D}, "
        "comm AS (SELECT node_id, node_id % 4 AS community FROM nodes), "
        "paths AS (SELECT i.src AS a, i.dst AS v, o.dst AS b "
        "FROM d_edges i JOIN d_edges o ON i.dst = o.src "
        "WHERE NOT EXISTS (SELECT 1 FROM d_edges e WHERE e.src = i.src AND e.dst = o.dst)), "
        "lab AS (SELECT p.v, ca.community AS c_a, cv.community AS c_v, cb.community AS c_b "
        "FROM paths p JOIN comm ca ON p.a = ca.node_id "
        "JOIN comm cv ON p.v = cv.node_id JOIN comm cb ON p.b = cb.node_id), "
        "rolecnt AS (SELECT v AS node_id, "
        "CAST(SUM(CASE WHEN c_v = c_a AND c_v = c_b THEN 1 ELSE 0 END) AS BIGINT) AS coordinator, "
        "CAST(SUM(CASE WHEN c_v <> c_a AND c_a = c_b THEN 1 ELSE 0 END) AS BIGINT) AS itinerant, "
        "CAST(SUM(CASE WHEN c_v <> c_a AND c_a <> c_b AND c_v = c_b THEN 1 ELSE 0 END) AS BIGINT) AS gatekeeper, "
        "CAST(SUM(CASE WHEN c_v = c_a AND c_v <> c_b THEN 1 ELSE 0 END) AS BIGINT) AS representative, "
        "CAST(SUM(CASE WHEN c_v <> c_a AND c_a <> c_b AND c_v <> c_b THEN 1 ELSE 0 END) AS BIGINT) AS liaison, "
        "CAST(COUNT(*) AS BIGINT) AS open_twopaths "
        "FROM lab GROUP BY v) "
        "SELECT n.node_id, COALESCE(coordinator, 0) AS coordinator, "
        "COALESCE(itinerant, 0) AS itinerant, COALESCE(gatekeeper, 0) AS gatekeeper, "
        "COALESCE(representative, 0) AS representative, COALESCE(liaison, 0) AS liaison, "
        "COALESCE(open_twopaths, 0) AS open_twopaths "
        "FROM nodes n LEFT JOIN rolecnt r ON n.node_id = r.node_id"
    ),
    "event_sessions": (
        "WITH x AS (SELECT user_id, ts, event_id, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        "OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800 "
        "THEN 1 ELSE 0 END AS new_sess "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT user_id, SUM(new_sess) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id "
        "FROM x), "
        "per AS (SELECT user_id, sess_id, COUNT(*) AS cnt FROM s GROUP BY user_id, sess_id) "
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions, "
        "CAST(MAX(cnt) AS BIGINT) AS max_session_events FROM per GROUP BY user_id"
    ),
    "hourly_rollup": (
        "SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents "
        "FROM events GROUP BY event_type, date_trunc('hour', ts)"
    ),
    "pricing_summary": (
        "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, "
        "CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_price_cents, "
        "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_disc_price_e4, "
        "CAST(COUNT(*) AS BIGINT) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "dedup_exact_groups": (
        "SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_doc_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_copies FROM documents GROUP BY md5(text)"
    ),
    "token_stats": (
        "SELECT doc_id, CAST(length(text) AS INT) AS n_chars_measured, "
        "CAST(len(string_split(text, ' ')) AS INT) AS n_tokens, "
        "CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_tokens "
        "FROM documents"
    ),
    "quality_scores": (
        f"WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents), "
        f"m AS (SELECT doc_id, text, CAST(len(toks) AS INT) AS n_tokens, "
        f"CAST(len(list_filter(toks, x -> x IN ({_STOP}))) AS INT) AS n_stop, "
        f"CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS INT) AS n_punct "
        f"FROM t) "
        f"SELECT doc_id, n_tokens, "
        f"CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio, "
        f"CAST(n_punct AS DOUBLE) / length(text) AS punct_ratio, "
        f"CAST(length(text) - (n_tokens - 1) AS DOUBLE) / n_tokens AS mean_word_len, "
        f"(n_tokens >= 10 AND n_tokens <= 100000 AND CAST(n_stop AS DOUBLE) / n_tokens < 0.5) "
        f"AS passes_quality FROM m"
    ),
    "language_id": (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
        + "s AS (SELECT doc_id, "
        + ", ".join(
            f"len(list_filter(toks, x -> x IN ({words}))) AS s_{lang}"
            for lang, words in _LANGS.items()
        )
        + " FROM t), "
        "m AS (SELECT *, GREATEST(s_de, s_en, s_es, s_fr) AS mx FROM s) "
        "SELECT doc_id, CASE WHEN mx = 0 THEN 'und' "
        "WHEN s_de = mx THEN 'de' WHEN s_en = mx THEN 'en' "
        "WHEN s_es = mx THEN 'es' ELSE 'fr' END AS detected_lang FROM m"
    ),
    "doc_fingerprints": (
        "SELECT doc_id, CAST(SUM("
        + MD5L.format(x="tok")
        + " % 1099511627776) AS BIGINT) AS fingerprint "
        "FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) "
        "GROUP BY doc_id"
    ),
    "minhash_signatures": (
        "WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), "
        "ks AS (SELECT unnest(range(8)) AS k), "
        "h AS (SELECT doc_id, k, "
        + MD5L.format(x="tok || '#' || k")
        + " AS h FROM toks CROSS JOIN ks) "
        "SELECT doc_id, k, MIN(h) AS minhash FROM h GROUP BY doc_id, k"
    ),
    "minhash_similar_pairs": (
        "WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), "
        "ks AS (SELECT unnest(range(8)) AS k), "
        "h AS (SELECT doc_id, k, "
        + MD5L.format(x="tok || '#' || k")
        + " AS h FROM toks CROSS JOIN ks), "
        "sig AS (SELECT doc_id, k, MIN(h) AS minhash FROM h GROUP BY doc_id, k) "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_matches "
        "FROM sig a JOIN sig b ON a.k = b.k AND a.minhash = b.minhash AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= 6"
    ),
    "simhash": (
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), "
        "h AS (SELECT doc_id, " + MD5L.format(x="tok") + " AS h FROM toks), "
        "bits AS (SELECT unnest(range(32)) AS bit), "
        "contrib AS (SELECT doc_id, bit, "
        "CASE WHEN (h >> CAST(bit AS INT)) & 1 = 1 THEN 1 ELSE -1 END AS c "
        "FROM h CROSS JOIN bits), "
        "s AS (SELECT doc_id, bit, SUM(c) AS s FROM contrib GROUP BY doc_id, bit) "
        "SELECT doc_id, CAST(SUM(CASE WHEN s > 0 "
        "THEN (CAST(1 AS BIGINT) << CAST(bit AS INT)) ELSE 0 END) AS BIGINT) AS simhash "
        "FROM s GROUP BY doc_id"
    ),
    "ngram_jaccard_pairs": (
        "WITH pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM documents a "
        "JOIN documents b ON a.n_chars = b.n_chars AND a.lang = b.lang AND a.doc_id < b.doc_id), "
        "toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
        "grams AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram "
        "FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)), "
        "inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter FROM pairs p "
        "JOIN grams ga ON ga.doc_id = p.doc_a "
        "JOIN grams gb ON gb.doc_id = p.doc_b AND gb.gram = ga.gram "
        "GROUP BY p.doc_a, p.doc_b), "
        "sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id) "
        "SELECT i.doc_a, i.doc_b, "
        "CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) AS jaccard "
        "FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id "
        "JOIN sizes sb ON i.doc_b = sb.doc_id"
    ),
    "streaming_window": (
        "SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start_epoch, "
        "event_type, CAST(COUNT(*) AS BIGINT) AS n_events "
        "FROM events GROUP BY 1, 2"
    ),
    "minhash_lsh_candidates": _minhash_lsh_sql(8, 4),
    "dedup_clusters": _dedup_clusters_sql(8, 6),
    "corpus_curation": _corpus_curation_sql(25, 8, 8),
    "embedding_ann_lsh": _ann_lsh_sql(12, 6, 5, 10),
    "image_features": (
        "WITH " + _image_media_sql(256)
        + " SELECT media_id, width, height, mean_r, mean_g, mean_b, phash FROM feats"
    ),
    "image_near_dups": _image_near_dups_sql(256, 200, 4, 16),
    "kcore_10": _kcore_sql(10),
    "weighted_kcore_260": _weighted_kcore_sql(260.0),
    "weighted_clustering": _WEIGHTED_CLUSTERING_SQL,
    "coreness_all": _coreness_sql(16),
    "betweenness_dist": _betweenness_sql(8, 16, 64),
    "edge_betweenness_64": _edge_betweenness_sql(8, 16, 64),
    "betweenness_local": _betweenness_sql(8, 64, 64),
    "evcent_dist": _evcent_sql(10, 64),
    "evcent_local": _evcent_sql(10, 64),
    "ktruss_5": _ktruss_sql(5),
    "truss_edges_4": _truss_edges_sql(4, support_rounds=8, max_node=256),
    "bfs_dist_0": _bfs_sql(0),
    "neighborhood_64": _neighborhood_sql(64, 8),
    "distance_summary_64": _distance_summary_sql(64, 8),
    "harmonic_64": _harmonic_sql(64, 8),
    "hyperball_harmonic_64": _hyperball_harmonic_sql(64, 8),
    "weighted_sssp_0": _weighted_sssp_sql(0, 10, 64),
    "widest_path_0": _widest_path_sql(0, 10, 64),
    "kmv_distinct_64": _KMV_SQL,
    "eccentricity_64": _ecc_sql(16, 64),
    "triplet_mining_32": _TRIPLETS_SQL,
    "scc_64": _scc_sql(64),
    "dag_levels_64": _dag_levels_sql(64),
    "bowtie_64": _bowtie_sql(64),
    "assortativity": (
        f"WITH {SQL_E}, {SQL_U}, {SQL_DEG}, "
        "ends AS MATERIALIZED (SELECT CAST(dx.degree AS DOUBLE) AS x, "
        "CAST(dy.degree AS DOUBLE) AS y FROM und e "
        "JOIN deg dx ON e.src = dx.node_id "
        "JOIN deg dy ON e.dst = dy.node_id), "
        "mo AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS m, "
        "SUM(x) AS sx, SUM(x*x) AS sxx, SUM(x*y) AS sxy FROM ends) "
        "SELECT ROUND(CASE WHEN sxx/m - (sx/m)*(sx/m) <> 0 THEN "
        "(sxy/m - (sx/m)*(sx/m)) / (sxx/m - (sx/m)*(sx/m)) END, 8) "
        "AS assortativity FROM mo"
    ),
    "reciprocity": (
        f"WITH {SQL_E}, {SQL_D}, "
        "r AS MATERIALIZED (SELECT a.src, a.dst, "
        "CASE WHEN b.src IS NOT NULL THEN 1 ELSE 0 END AS hr "
        "FROM d_edges a LEFT JOIN d_edges b "
        "ON b.src = a.dst AND b.dst = a.src) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_edges, "
        "CAST(SUM(hr) AS BIGINT) AS n_reciprocal, "
        "ROUND(CAST(SUM(hr) AS BIGINT) / COUNT(*), 8) AS reciprocity FROM r"
    ),
    "degree_distribution": (
        f"WITH {SQL_E}, {SQL_U}, {SQL_DEG} "
        "SELECT CAST(length(bin(degree)) - 1 AS BIGINT) AS bin, "
        "CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg GROUP BY 1"
    ),
    "host_graph": _HOST_GRAPH_SQL,
    "motif_triads": _MOTIF_TRIADS_SQL,
    "spam_mass_10": _spam_mass_sql(),
    "crawl_delta": _CRAWL_DELTA_SQL,
    "cocitation_256": _COCITATION_SQL,
    "coupling_256": _COUPLING_SQL,
    "butterflies_256": _BUTTERFLY_SQL,
    "coloring_8": _coloring_sql(),
    "dup_spans_32": _DUP_SPANS_SQL,
    "winnow_16_4": _WINNOW_SQL,
    "winnow_pairs": _WINNOW_PAIRS_SQL,
    "dsir_weights": _DSIR_SQL,
    "pack_256": _PACK_SQL,
    "effective_diameter_64": _eff_diameter_sql(64, 8),
    "stratified_sample": _STRATIFIED_SQL,
    "ngram_novelty_32": _NOVELTY_SQL,
    "dup_intervals_32": _DUP_INTERVALS_SQL,
    "lpa_conductance_5": _lpa_conductance_sql(),
    "bpe_merges_8": _bpe_sql(),
    "embedding_scores": _embedding_scores_sql(),
    "vocabulary": _VOCABULARY_SQL,
    "readability": _READABILITY_SQL,
    "token_entropy": _TOKEN_ENTROPY_SQL,
    "lpa_weighted_5": _lpa_weighted_sql(),
    "katz_10": _katz_sql(),
    "url_filter": _URL_FILTER_SQL,
    "ego_64": _ego_sql(),
    "hub_robustness_10": _hub_robustness_sql(),
    "landmark_dists_64": _landmark_sql(),
    "landmark_est_64": _landmark_est_sql(),
    "edge_sample_4": _EDGE_SAMPLE_SQL,
    "host_pagerank_10": _host_pagerank_sql(),
    "link_prediction_256": _LINKPRED_SQL,
    "lpa_modularity": _lpa_modularity_sql(),
    "repetition_stats": _REPETITION_SQL,
    "segment_dedup": _SEGMENT_DEDUP_SQL,
    "anchor_text": _ANCHOR_TEXT_SQL,
    "mis_256": _mis_sql(),
    "msf_256": _msf_sql(),
    "pagerank_warmstart": _warmstart_sql(),
    "crawl_frontier": _crawl_frontier_sql(),
    "single_linkage_64": _single_linkage_sql(),
    "decontaminate_3": _DECONTAM_SQL,
    "dup_ngram_stats_3": _DUP_NGRAMS_SQL,
    "mixture_sample": _MIXSAMPLE_SQL,
    "pii_scrub": _PII_SCRUB_SQL,
    "pages_roundtrip": (
        f"WITH {SQL_E}, {SQL_D} "
        "SELECT (SELECT COUNT(*) FROM d_edges) AS n_edges, "
        "CAST(0 AS BIGINT) AS text_mismatches"
    ),
    "warc_roundtrip": _WARC_ROUNDTRIP_SQL,
    "neighbor_sample_2x4": _khop_sql(7),
    "embedding_topk": (
        "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv "
        "FROM embeddings WHERE vec_id < 10), "
        "v AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings), "
        "sims AS (SELECT query_id, neighbor_id, "
        "ROUND(list_dot_product(qv, nv) / "
        "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))), 6) AS cos_sim "
        "FROM q CROSS JOIN v WHERE query_id <> neighbor_id) "
        "SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INT) AS rank FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY cos_sim DESC, neighbor_id ASC) AS rn FROM sims) t WHERE rn <= 5"
    ),
}


# ---------------------------------------------------------------------------
# retrieval layer (pipeline/retrieval.py): tf-idf, BM25, window chunking
# ---------------------------------------------------------------------------
BM25_TERMS = ["merge", "scan", "spark", "vector", "window"]


def _q_tfidf_top3(spark, sf_dir):
    """Per-doc top-3 terms by tf-idf; idf pre-rounded to a 1e-8 BIGINT
    per token so ranking is integer-exact (engine-independent)."""
    from dachshund_spark.pipeline.retrieval import tfidf_top_terms

    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


_TFIDF_SQL = (
    "WITH post AS MATERIALIZED (SELECT tok AS token, doc_id, "
    "CAST(COUNT(*) AS BIGINT) AS tf "
    "FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) "
    "GROUP BY tok, doc_id), "
    "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents), "
    "dfs AS MATERIALIZED (SELECT token, "
    "CAST(ROUND(LN((SELECT n FROM nn) / CAST(COUNT(*) AS BIGINT)) * 100000000, 0) AS BIGINT) AS idf_e8 "
    "FROM post GROUP BY token), "
    "scored AS (SELECT p.doc_id, p.token, p.tf, p.tf * d.idf_e8 AS score_e8 "
    "FROM post p JOIN dfs d ON p.token = d.token), "
    "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
    "ORDER BY score_e8 DESC, token ASC) AS rk FROM scored) "
    "SELECT doc_id, token, tf, score_e8, CAST(rk AS BIGINT) AS rank "
    "FROM r WHERE rk <= 3"
)


def _q_bm25(spark, sf_dir):
    """BM25 top-10 docs for a fixed 5-term query; per-term scores are
    pre-rounded 1e-8 BIGINTs summed exactly (oracle-parity-safe)."""
    from dachshund_spark.pipeline.retrieval import bm25_topk

    return bm25_topk(load_table(spark, sf_dir, "documents"), BM25_TERMS, k=10)


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in sorted(set(BM25_TERMS)))
_BM25_SQL = (
    "WITH toks AS MATERIALIZED (SELECT doc_id, "
    "unnest(string_split(text, ' ')) AS token FROM documents), "
    f"post AS MATERIALIZED (SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf "
    f"FROM toks WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY token, doc_id), "
    "dl AS MATERIALIZED (SELECT doc_id, "
    "CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents), "
    "st AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
    "CAST(SUM(dl) AS BIGINT) / COUNT(*) AS avgdl FROM dl), "
    "dfs AS MATERIALIZED (SELECT token, CAST(ROUND(LN("
    "((SELECT n FROM st) - CAST(COUNT(*) AS BIGINT) + 0.5) / "
    "(CAST(COUNT(*) AS BIGINT) + 0.5) + 1.0) * 100000000, 0) AS BIGINT) AS idf_e8 "
    "FROM post GROUP BY token), "
    "scored AS (SELECT p.doc_id, CAST(ROUND(d.idf_e8 * ("
    "(p.tf * (1.5 + 1.0)) / (p.tf + 1.5 * (1.0 - 0.75 + 0.75 * "
    "(l.dl / (SELECT avgdl FROM st))))), 0) AS BIGINT) AS term_e8 "
    "FROM post p JOIN dfs d ON p.token = d.token "
    "JOIN dl l ON p.doc_id = l.doc_id) "
    "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched_terms, "
    "CAST(SUM(term_e8) AS BIGINT) AS score_e8 "
    "FROM scored GROUP BY doc_id ORDER BY score_e8 DESC, doc_id ASC LIMIT 10"
)

# the same BM25 pipeline up to the per-doc score table, reusable as a
# CTE prefix (rrf fusion builds its candidate lists from it)
_BM25_CORE = _BM25_SQL[len("WITH ") : _BM25_SQL.rfind(" SELECT doc_id")].rstrip() + (
    ", sbm AS MATERIALIZED (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched_terms, "
    "CAST(SUM(term_e8) AS BIGINT) AS score_e8 FROM scored GROUP BY doc_id)"
)


def _q_chunk_windows(spark, sf_dir):
    """Sliding 32-token windows, stride 16, md5-bigint chunk hashes."""
    from dachshund_spark.pipeline.retrieval import chunk_windows

    return chunk_windows(
        load_table(spark, sf_dir, "documents"), window=32, stride=16
    )


_CHUNK_SLICE = "list_slice(toks, ci * 16 + 1, ci * 16 + 32)"
_CHUNKS_SQL = (
    "WITH t AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS toks "
    "FROM documents), "
    "c AS (SELECT doc_id, toks, unnest(range(0, "
    "1 + ((greatest(len(toks) - 32, 0) + 15) // 16))) AS ci FROM t) "
    "SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx, "
    "CAST(ci * 16 AS BIGINT) AS start_token, "
    f"CAST(len({_CHUNK_SLICE}) AS BIGINT) AS n_tokens, "
    + MD5L.format(x=f"array_to_string({_CHUNK_SLICE}, ' ')")
    + " AS chunk_hash FROM c"
)


_EVAL_QUERIES = {
    0: ["merge", "scan", "vector"],
    1: ["window", "batch", "join"],
    2: ["hash", "filter", "stream"],
    3: ["customer", "order", "query"],
}


def _q_retrieval_eval(spark, sf_dir):
    """nDCG@10 + MRR of the BM25 ranker against term-overlap relevance
    (rel = matched query terms - 1, gain = 2^rel - 1) over four fixed
    3-term queries; the log2 rank discounts are baked e8-integer
    literals so DCG/IDCG are exact BIGINT sums."""
    from dachshund_spark.pipeline.retrieval import retrieval_eval

    return retrieval_eval(
        load_table(spark, sf_dir, "documents"), _EVAL_QUERIES, k=10
    )


def _retrieval_eval_sql(k: int = 10) -> str:
    import math

    disc_vals = ", ".join(
        f"({r}, {int(round(100000000 / math.log2(r + 1)))})"
        for r in range(1, k + 1)
    )
    qt_vals = ", ".join(
        f"({q}, '{t}')"
        for q, ts in sorted(_EVAL_QUERIES.items())
        for t in sorted(set(ts))
    )
    all_terms = ", ".join(
        f"'{t}'" for t in sorted({t for ts in _EVAL_QUERIES.values() for t in ts})
    )
    return (
        "WITH toks AS MATERIALIZED (SELECT doc_id, "
        "unnest(string_split(text, ' ')) AS token FROM documents), "
        f"qt(query_id, token) AS (VALUES {qt_vals}), "
        f"disc(r, d) AS (VALUES {disc_vals}), "
        f"post AS MATERIALIZED (SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf "
        f"FROM toks WHERE token IN ({all_terms}) GROUP BY token, doc_id), "
        "dl AS MATERIALIZED (SELECT doc_id, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents), "
        "st AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
        "CAST(SUM(dl) AS BIGINT) / COUNT(*) AS avgdl FROM dl), "
        "dfs AS MATERIALIZED (SELECT token, CAST(ROUND(LN("
        "((SELECT n FROM st) - CAST(COUNT(*) AS BIGINT) + 0.5) / "
        "(CAST(COUNT(*) AS BIGINT) + 0.5) + 1.0) * 100000000, 0) AS BIGINT) AS idf_e8 "
        "FROM post GROUP BY token), "
        "term AS MATERIALIZED (SELECT p.token, p.doc_id, "
        "CAST(ROUND(d.idf_e8 * ((p.tf * (1.5 + 1.0)) / (p.tf + 1.5 * "
        "(1.0 - 0.75 + 0.75 * (l.dl / (SELECT avgdl FROM st))))), 0) AS BIGINT) AS term_e8 "
        "FROM post p JOIN dfs d ON p.token = d.token "
        "JOIN dl l ON p.doc_id = l.doc_id), "
        "qd AS MATERIALIZED (SELECT q.query_id, t.doc_id, "
        "CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(t.term_e8) AS BIGINT) AS score_e8 "
        "FROM qt q JOIN term t ON q.token = t.token GROUP BY q.query_id, t.doc_id), "
        "qg AS MATERIALIZED (SELECT query_id, doc_id, score_e8, "
        "CAST((1::BIGINT << CAST(m - 1 AS INTEGER)) - 1 AS BIGINT) AS gain "
        "FROM qd), "
        "rkd AS MATERIALIZED (SELECT query_id, doc_id, gain, "
        "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score_e8 DESC, doc_id ASC) AS rank, "
        "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY gain DESC, doc_id ASC) AS ideal_rank "
        "FROM qg), "
        "ag AS MATERIALIZED (SELECT g.query_id, "
        f"CAST(SUM(CASE WHEN g.rank <= {k} THEN g.gain * dr.d ELSE 0 END) AS BIGINT) AS dcg_e8, "
        f"CAST(SUM(CASE WHEN g.ideal_rank <= {k} THEN g.gain * di.d ELSE 0 END) AS BIGINT) AS idcg_e8, "
        f"MIN(CASE WHEN g.rank <= {k} AND g.gain >= 1 THEN g.rank END) AS first_r "
        "FROM rkd g LEFT JOIN disc dr ON dr.r = g.rank "
        "LEFT JOIN disc di ON di.r = g.ideal_rank GROUP BY g.query_id) "
        "SELECT CAST(query_id AS BIGINT) AS query_id, dcg_e8, idcg_e8, "
        "CASE WHEN idcg_e8 > 0 THEN CAST(dcg_e8 AS DOUBLE) / CAST(idcg_e8 AS DOUBLE) "
        "ELSE 0.0 END AS ndcg, "
        "CAST(COALESCE(first_r, 0) AS BIGINT) AS first_rel_rank, "
        "CASE WHEN first_r IS NOT NULL THEN 1.0 / first_r ELSE 0.0 END AS rr "
        "FROM ag"
    )


_ORACLES.update(
    {
        "tfidf_top3": _TFIDF_SQL,
        "bm25_top10": _BM25_SQL,
        "chunk_windows_32": _CHUNKS_SQL,
        "retrieval_eval_10": _retrieval_eval_sql(10),
    }
)


def _q_redirects(spark, sf_dir):
    """Redirect-chain resolution (pointer doubling) on a derived
    functional graph: every non-multiple-of-4 node redirects to its
    smallest strictly-larger neighbor; multiples of 4 (and nodes with
    no larger neighbor) are terminals.  Strictly increasing pointers
    mean no loops, so the unrolled oracle is round-count independent
    once all chains terminate; loop semantics are pinned by pytest
    goldens (tests/test_redirects.py)."""
    from dachshund_spark.algorithms.redirects import resolve_redirects
    from dachshund_spark.derived import derived_edges

    e = derived_edges(spark, sf_dir).distinct()
    f = (
        e.where((F.col("dst") > F.col("src")) & (F.col("src") % 4 != 0))
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
    )
    out = resolve_redirects(f, max_rounds=8)
    return out.select(
        "src",
        F.when(F.col("is_loop"), F.lit(None)).otherwise(F.col("final")).alias("final"),
        F.when(F.col("is_loop"), F.lit(None))
        .otherwise(F.col("hops"))
        .cast("long")
        .alias("hops"),
        "is_loop",
    ).orderBy("src")


def _redirects_sql(rounds: int = 8) -> str:
    parts = [
        SQL_E,
        SQL_D,
        "f AS MATERIALIZED (SELECT src, MIN(dst) AS dst FROM d_edges "
        "WHERE dst > src AND src % 4 <> 0 GROUP BY src)",
        "s0 AS MATERIALIZED (SELECT src AS node, dst AS ptr, "
        "CAST(1 AS BIGINT) AS hops, FALSE AS done FROM f)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT s.node, "
            "CASE WHEN s.done OR n.ptr IS NULL THEN s.ptr ELSE n.ptr END AS ptr, "
            "CASE WHEN s.done OR n.ptr IS NULL THEN s.hops ELSE s.hops + n.hops END AS hops, "
            "(s.done OR n.ptr IS NULL OR COALESCE(n.done, FALSE)) AS done "
            f"FROM s{i - 1} s LEFT JOIN s{i - 1} n ON s.ptr = n.node)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node AS src, CASE WHEN done THEN ptr END AS final, "
        f"CASE WHEN done THEN hops END AS hops, NOT done AS is_loop "
        f"FROM s{rounds} ORDER BY src"
    )


_ORACLES["attribute_assortativity"] = _ATTR_ASSORT_SQL


def _q_knn_curve(spark, sf_dir):
    """Average-neighbor-degree spectrum knn(k) — exact integer sums per
    degree class, one IEEE division."""
    from dachshund_spark.algorithms.stats import neighbor_degree_curve

    return neighbor_degree_curve(derived_graph(spark, sf_dir))


_KNN_CURVE_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_DEG}, "
    "ends AS MATERIALIZED (SELECT u.src, u.dst, ds.degree AS d_src, "
    "dd.degree AS d_dst FROM und u "
    "JOIN deg ds ON u.src = ds.node_id JOIN deg dd ON u.dst = dd.node_id), "
    "per_deg AS MATERIALIZED (SELECT d_src AS degree, COUNT(*) AS n_nbr, "
    "SUM(d_dst) AS sum_nbr_degree FROM ends GROUP BY d_src), "
    "cnts AS MATERIALIZED (SELECT degree, COUNT(*) AS n_nodes FROM deg "
    "GROUP BY degree) "
    "SELECT CAST(c.degree AS BIGINT) AS degree, "
    "CAST(c.n_nodes AS BIGINT) AS n_nodes, "
    "CAST(p.sum_nbr_degree AS BIGINT) AS sum_nbr_degree, "
    "CAST(p.n_nbr AS BIGINT) AS n_nbr, "
    "CAST(p.sum_nbr_degree AS DOUBLE) / CAST(p.n_nbr AS DOUBLE) AS knn "
    "FROM cnts c JOIN per_deg p ON c.degree = p.degree"
)

_ORACLES["knn_degree_curve"] = _KNN_CURVE_SQL
_ORACLES["page_structure_stats"] = _PAGE_STRUCTURE_SQL
_ORACLES["redirect_resolve"] = _redirects_sql()
# VERDICT r3 #9: featurize_local and cnm_local flipped from rows-only
# to full oracles — distributed replays of the 14 stats fields
# (kernel-gated) and the bit-exact per-merge CNM unroll
_ORACLES["featurize_local"] = _featurize_sql()
_ORACLES["cnm_local"] = _cnm_sql()


def _q_fastrp(spark, sf_dir):
    """FastRP integer embeddings (dim=4, weights 1·A + 2·A²) on the
    derived graph, emitted long-form (node_id, dim, value) so the
    driver's canonicalizer never sees an array column."""
    from dachshund_spark.algorithms.fastrp import fastrp_embeddings

    emb = fastrp_embeddings(derived_graph(spark, sf_dir), dim=4, weights=(1, 2))
    return emb.select(
        "node_id",
        F.expr("stack(4, 0, e0, 1, e1, 2, e2, 3, e3) AS (dim, value)"),
    ).select(
        "node_id", F.col("dim").cast("long").alias("dim"), "value"
    ).orderBy("node_id", "dim")


def _fastrp_sql(dim: int = 4, weights: tuple[int, ...] = (1, 2), seed: int = 0) -> str:
    proj = MD5L.format(x=f"concat_ws('#', {seed}, 'rp', node_id, dim)")
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        f"dims AS (SELECT unnest(range(0, {dim})) AS dim)",
        "r0 AS MATERIALIZED (SELECT node_id, dim, "
        f"CASE ({proj}) % 4 WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS val "
        "FROM nodes CROSS JOIN dims)",
    ]
    terms = []
    for k, w in enumerate(weights, start=1):
        prev = "r0" if k == 1 else f"s{k - 1}"
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT u.src AS node_id, r.dim, "
            f"SUM(r.val) AS val FROM und u JOIN {prev} r ON u.dst = r.node_id "
            "GROUP BY u.src, r.dim)"
        )
        terms.append(f"SELECT node_id, dim, val * {int(w)} AS val FROM s{k}")
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT node_id, CAST(dim AS BIGINT) AS dim, "
        "CAST(SUM(val) AS BIGINT) AS value FROM ("
        + " UNION ALL ".join(terms)
        + ") GROUP BY node_id, dim ORDER BY node_id, dim"
    )


_ORACLES["fastrp_4"] = _fastrp_sql()


def _q_opic(spark, sf_dir):
    """OPIC (Abiteboul WWW 2003) crawl-frontier importance: 6
    synchronized cash-diffusion rounds, integer-exact (cash DIV od per
    out-edge, remainder kept, dangling nodes keep everything — total
    cash conserved every round)."""
    from dachshund_spark.algorithms.opic import opic

    return opic(derived_graph(spark, sf_dir), rounds=6)


def _opic_sql(rounds: int = 6) -> str:
    parts = [
        SQL_E,
        SQL_D,
        SQL_U,
        SQL_N,
        "odt AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS od "
        "FROM d_edges GROUP BY src)",
        "s0 AS MATERIALIZED (SELECT n.node_id, COALESCE(o.od, 0) AS od, "
        "CAST(100000000 AS BIGINT) AS cash, CAST(0 AS BIGINT) AS hist "
        "FROM nodes n LEFT JOIN odt o ON n.node_id = o.node_id)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT n.node_id, n.od, "
            f"CAST((CASE WHEN n.od > 0 THEN n.cash - n.od * (n.cash // n.od) "
            f"ELSE n.cash END) + COALESCE(i{i}.infl, 0) AS BIGINT) AS cash, "
            f"CAST(n.hist + n.cash AS BIGINT) AS hist "
            f"FROM s{i-1} n LEFT JOIN ("
            f"SELECT e.dst AS node_id, SUM(s.cash // s.od) AS infl "
            f"FROM d_edges e JOIN s{i-1} s ON e.src = s.node_id "
            f"GROUP BY e.dst) i{i} ON n.node_id = i{i}.node_id)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node_id, cash AS cash_e8, hist AS history_e8, "
        f"CAST(cash + hist AS BIGINT) AS importance_e8 FROM s{rounds}"
    )


_ORACLES["opic_6"] = _opic_sql()

SYBIL_SEEDS = (7, 97, 211, 503)


def _q_sybilrank(spark, sf_dir):
    """SybilRank (NSDI 2012): early-terminated degree-normalized trust
    walk from verified seeds, ranked by trust/degree."""
    from dachshund_spark.algorithms.trust import sybilrank

    out = sybilrank(
        derived_graph(spark, sf_dir), list(SYBIL_SEEDS), rounds=8
    )
    return out.select("node_id", "trust", "sybil_score").orderBy("node_id")


def _sybilrank_sql(seeds: tuple[int, ...] = SYBIL_SEEDS, rounds: int = 8) -> str:
    seed_list = ", ".join(str(s) for s in seeds)
    parts = [
        SQL_E,
        SQL_U,
        "sdeg AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS deg FROM und GROUP BY src)",
        # sender degree folded into the static edge table, as in Spark
        "sedges AS MATERIALIZED (SELECT u.src, u.dst, d.deg FROM und u "
        "JOIN sdeg d ON u.src = d.node_id)",
        "t0 AS MATERIALIZED (SELECT node_id, CASE WHEN node_id IN "
        f"({seed_list}) THEN 1.0 / {len(seeds)} ELSE 0.0 END AS trust FROM sdeg)",
    ]
    for i in range(rounds):
        parts.append(
            f"t{i + 1} AS MATERIALIZED (SELECT n.node_id, "
            "COALESCE(c.trust, 0.0) AS trust FROM sdeg n LEFT JOIN ("
            "SELECT e.dst AS node_id, SUM(t.trust / e.deg) AS trust "
            f"FROM sedges e JOIN t{i} t ON e.src = t.node_id GROUP BY e.dst) c "
            "ON n.node_id = c.node_id)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT t.node_id, ROUND(t.trust, 8) AS trust, "
        f"ROUND(t.trust / d.deg, 8) AS sybil_score "
        f"FROM t{rounds} t JOIN sdeg d ON t.node_id = d.node_id ORDER BY t.node_id"
    )


_ORACLES["sybilrank_8"] = _sybilrank_sql()


def _q_rich_club(spark, sf_dir):
    """Rich-club coefficient sweep over the derived graph."""
    from dachshund_spark.algorithms.stats import rich_club

    return rich_club(derived_graph(spark, sf_dir)).orderBy("k")


_RICH_CLUB_SQL = (
    "WITH "
    + ", ".join(
        [
            SQL_E,
            SQL_U,
            SQL_N,
            SQL_CANON,
            SQL_DEG,
            "mval AS MATERIALIZED (SELECT LEAST(a.degree, b.degree) AS val "
            "FROM canon c JOIN deg a ON c.src = a.node_id "
            "JOIN deg b ON c.dst = b.node_id)",
            "nh AS (SELECT degree AS val, COUNT(*) AS ncnt FROM deg GROUP BY degree)",
            "eh AS (SELECT val, COUNT(*) AS ecnt FROM mval GROUP BY val)",
            "h AS (SELECT n.val, n.ncnt, COALESCE(e.ecnt, 0) AS ecnt "
            "FROM nh n LEFT JOIN eh e ON n.val = e.val)",
            "cum AS (SELECT val AS k, "
            "CAST(SUM(ncnt) OVER (ORDER BY val DESC ROWS UNBOUNDED PRECEDING) - ncnt AS BIGINT) AS n_nodes, "
            "CAST(SUM(ecnt) OVER (ORDER BY val DESC ROWS UNBOUNDED PRECEDING) - ecnt AS BIGINT) AS n_edges "
            "FROM h)",
        ]
    )
    + " SELECT k, n_nodes, n_edges, "
    "ROUND(CAST(2.0 AS DOUBLE) * n_edges / "
    "(CAST(n_nodes AS DOUBLE) * CAST(n_nodes - 1 AS DOUBLE)), 8) AS phi "
    "FROM cum WHERE n_nodes >= 2 ORDER BY k"
)

_ORACLES["rich_club"] = _RICH_CLUB_SQL


def _q_onion(spark, sf_dir):
    """Onion decomposition (coreness + peel-layer depth); Spark runs to
    convergence, the oracle unrolls 48 passes (43 needed at sf0.01 —
    extra rounds are no-ops on the emptied graph)."""
    from dachshund_spark.algorithms.coreness import onion_decomposition

    return onion_decomposition(derived_graph(spark, sf_dir)).orderBy("node_id")


def _onion_sql(rounds: int = 48) -> str:
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        "r0 AS MATERIALIZED (SELECT node_id FROM nodes)",
        "e0 AS MATERIALIZED (SELECT src, dst FROM und)",
        "k0 AS (SELECT CAST(0 AS BIGINT) AS k)",
    ]
    outs = []
    for i in range(1, rounds + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT n.node_id, COALESCE(c.dg, 0) AS dg "
            f"FROM r{i - 1} n LEFT JOIN (SELECT src AS node_id, COUNT(*) AS dg "
            f"FROM e{i - 1} GROUP BY src) c ON n.node_id = c.node_id)"
        )
        parts.append(
            # MATERIALIZED is load-bearing: k{i} is referenced 3× and
            # references k{i-1} twice — inlined, the chain re-evaluates
            # exponentially (the DuckDB CTE gotcha)
            f"k{i} AS MATERIALIZED (SELECT GREATEST((SELECT k FROM k{i - 1}), "
            f"COALESCE((SELECT MIN(dg) FROM d{i}), (SELECT k FROM k{i - 1}))) AS k)"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT node_id FROM d{i} "
            f"WHERE dg <= (SELECT k FROM k{i}))"
        )
        outs.append(
            f"SELECT node_id, (SELECT k FROM k{i}) AS coreness, "
            f"CAST({i} AS BIGINT) AS layer FROM s{i}"
        )
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT node_id FROM r{i - 1} "
            f"WHERE node_id NOT IN (SELECT node_id FROM s{i}))"
        )
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT src, dst FROM e{i - 1} "
            f"WHERE src NOT IN (SELECT node_id FROM s{i}) "
            f"AND dst NOT IN (SELECT node_id FROM s{i}))"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT node_id, coreness, layer FROM ("
        + " UNION ALL ".join(outs)
        + ") ORDER BY node_id"
    )


_ORACLES["onion_layers"] = _onion_sql()


def _q_bigram_lm(spark, sf_dir):
    """CCNet-style LM quality scores: add-one bigram log-likelihood,
    self-trained on the documents corpus; ln terms pre-rounded to
    1e-8 BIGINTs so sums are engine-exact."""
    from dachshund_spark.pipeline.lm import bigram_lm_scores

    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores(docs).orderBy("doc_id")


_BIGRAM_LM_SQL = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
    "b AS MATERIALIZED (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM "
    "(SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t "
    "WHERE len(toks) >= 2)), "
    "cnt AS MATERIALIZED (SELECT w1, w2, COUNT(*) AS c FROM b GROUP BY w1, w2), "
    "hist AS MATERIALIZED (SELECT w1, COUNT(*) AS h FROM b GROUP BY w1), "
    "v AS (SELECT COUNT(DISTINCT tok) AS v FROM (SELECT unnest(toks) AS tok FROM t)), "
    "terms AS MATERIALIZED (SELECT b.doc_id, "
    "CAST(ROUND(LN(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) / "
    "CAST(COALESCE(h.h, 0) + (SELECT v FROM v) AS DOUBLE)) * 100000000, 0) AS BIGINT) AS lp "
    "FROM b LEFT JOIN cnt c ON b.w1 = c.w1 AND b.w2 = c.w2 "
    "LEFT JOIN hist h ON b.w1 = h.w1) "
    "SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(lp) AS BIGINT) AS lp_e8, "
    "CAST(SUM(lp) AS DOUBLE) / 100000000 / COUNT(*) AS avg_logprob "
    "FROM terms GROUP BY doc_id ORDER BY doc_id"
)

_ORACLES["bigram_lm_scores"] = _BIGRAM_LM_SQL


def _q_kneser_ney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram probabilities for the corpus
    top-100 bigrams: exact integer count/continuation tables, dyadic
    discount 0.75, shared IEEE expression tree (no libm)."""
    from dachshund_spark.pipeline.lm import kneser_ney_bigrams

    return kneser_ney_bigrams(load_table(spark, sf_dir, "documents"), topk=100)


_KNESER_NEY_SQL = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
    "b AS MATERIALIZED (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM "
    "(SELECT toks, unnest(range(1, len(toks))) AS i FROM t "
    "WHERE len(toks) >= 2)), "
    "cnt AS MATERIALIZED (SELECT w1, w2, COUNT(*) AS c FROM b GROUP BY w1, w2), "
    "ctx AS MATERIALIZED (SELECT w1, SUM(c) AS c1, COUNT(*) AS n1f "
    "FROM cnt GROUP BY w1), "
    "bk AS MATERIALIZED (SELECT w2, COUNT(*) AS n1b FROM cnt GROUP BY w2), "
    "nt AS (SELECT COUNT(*) AS n FROM cnt), "
    "top AS MATERIALIZED (SELECT w1, w2, c FROM cnt "
    "ORDER BY c DESC, w1, w2 LIMIT 100) "
    "SELECT t.w1, t.w2, CAST(t.c AS BIGINT) AS c12, CAST(x.c1 AS BIGINT) AS c1, "
    "CAST(x.n1f AS BIGINT) AS n1f, CAST(k.n1b AS BIGINT) AS n1b, "
    "CAST((SELECT n FROM nt) AS BIGINT) AS n_types, "
    "GREATEST(CAST(t.c AS DOUBLE) - 0.75, 0.0) / CAST(x.c1 AS DOUBLE) "
    "+ (0.75 * CAST(x.n1f AS DOUBLE) / CAST(x.c1 AS DOUBLE)) "
    "* (CAST(k.n1b AS DOUBLE) / CAST((SELECT n FROM nt) AS DOUBLE)) AS p_kn "
    "FROM top t JOIN ctx x ON t.w1 = x.w1 JOIN bk k ON t.w2 = k.w2"
)

_ORACLES["kneser_ney_top100"] = _KNESER_NEY_SQL


def _q_gopher(spark, sf_dir):
    """Gopher rule flags (Rae et al. 2021 token-level subset) — every
    threshold a cross-multiplied integer comparison, SQL-exact."""
    from dachshund_spark.pipeline.text import gopher_filters

    return gopher_filters(load_table(spark, sf_dir, "documents"))


_GOPHER_SQL = (
    "WITH t AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS toks "
    "FROM documents), "
    "w AS MATERIALIZED (SELECT doc_id, unnest(toks) AS tok FROM t), "
    "m AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_words, "
    "SUM(LENGTH(tok)) AS sum_word_len, "
    "SUM(CASE WHEN regexp_matches(tok, '[a-zA-Z]') THEN 1 ELSE 0 END) AS n_alpha, "
    "SUM(CASE WHEN tok IN ('the','a','of','and','to','in','is','it') "
    "THEN 1 ELSE 0 END) AS n_stop, "
    "SUM(CASE WHEN contains(tok, '#') OR contains(tok, '...') "
    "THEN 1 ELSE 0 END) AS n_sym FROM w GROUP BY doc_id) "
    "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, "
    "CAST(sum_word_len AS BIGINT) AS sum_word_len, "
    "CAST(n_alpha AS BIGINT) AS n_alpha_words, "
    "CAST(n_stop AS BIGINT) AS n_stopwords, "
    "CAST(n_sym AS BIGINT) AS n_symbol_words, "
    "n_words >= 50 AND n_words <= 100000 AS pass_word_count, "
    "sum_word_len >= 3 * n_words AND sum_word_len <= 10 * n_words "
    "AS pass_mean_word_len, "
    "5 * n_alpha >= 4 * n_words AS pass_alpha_ratio, "
    "n_stop >= 2 AS pass_stopwords, "
    "10 * n_sym <= n_words AS pass_symbol_ratio, "
    "(n_words >= 50 AND n_words <= 100000 AND sum_word_len >= 3 * n_words "
    "AND sum_word_len <= 10 * n_words AND 5 * n_alpha >= 4 * n_words "
    "AND n_stop >= 2 AND 10 * n_sym <= n_words) AS pass_gopher "
    "FROM m"
)

_ORACLES["gopher_filters"] = _GOPHER_SQL


def _q_ccnet_buckets(spark, sf_dir):
    """CCNet head/middle/tail split by fixed perplexity cutoffs —
    integer cross-multiplied lp_e8 vs cutoff·n_bigrams, zero extra
    shuffles past the LM scoring joins."""
    from dachshund_spark.pipeline.lm import ccnet_buckets

    return ccnet_buckets(load_table(spark, sf_dir, "documents"))


_CCNET_BUCKETS_SQL = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
    "b AS MATERIALIZED (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM "
    "(SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t "
    "WHERE len(toks) >= 2)), "
    "cnt AS MATERIALIZED (SELECT w1, w2, COUNT(*) AS c FROM b GROUP BY w1, w2), "
    "hist AS MATERIALIZED (SELECT w1, COUNT(*) AS h FROM b GROUP BY w1), "
    "v AS (SELECT COUNT(DISTINCT tok) AS v FROM (SELECT unnest(toks) AS tok FROM t)), "
    "terms AS MATERIALIZED (SELECT b.doc_id, "
    "CAST(ROUND(LN(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) / "
    "CAST(COALESCE(h.h, 0) + (SELECT v FROM v) AS DOUBLE)) * 100000000, 0) AS BIGINT) AS lp "
    "FROM b LEFT JOIN cnt c ON b.w1 = c.w1 AND b.w2 = c.w2 "
    "LEFT JOIN hist h ON b.w1 = h.w1), "
    "sc AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_bigrams, "
    "CAST(SUM(lp) AS BIGINT) AS lp_e8 FROM terms GROUP BY doc_id) "
    "SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams, lp_e8, "
    "CASE WHEN lp_e8 > -339000000 * n_bigrams THEN 'head' "
    "WHEN lp_e8 > -342000000 * n_bigrams THEN 'middle' "
    "ELSE 'tail' END AS bucket FROM sc"
)

_ORACLES["ccnet_buckets"] = _CCNET_BUCKETS_SQL


def _q_pmi(spark, sf_dir):
    """Top-100 PMI token pairs (±2 window) over the documents corpus;
    four ln terms pre-rounded to 1e-8 BIGINTs — integer-exact ranking,
    no c·N overflow at web scale."""
    from dachshund_spark.pipeline.lm import pmi_pairs

    docs = load_table(spark, sf_dir, "documents")
    return pmi_pairs(docs, window=2, min_count=5, top_k=100).orderBy(
        F.desc("pmi_e8"), "w1", "w2"
    )


_PMI_SQL = (
    "WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents), "
    "p AS MATERIALIZED (SELECT toks[i] AS a, toks[i + o] AS b FROM "
    "(SELECT toks, i, unnest(range(1, 3)) AS o FROM "
    "(SELECT toks, unnest(range(1, len(toks))) AS i FROM t WHERE len(toks) >= 2)) "
    "WHERE i + o <= len(toks)), "
    "sym AS MATERIALIZED (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p), "
    "cxy AS MATERIALIZED (SELECT a AS w1, b AS w2, COUNT(*) AS c FROM sym GROUP BY a, b), "
    "cx AS MATERIALIZED (SELECT w1 AS w, CAST(SUM(c) AS BIGINT) AS cw FROM cxy GROUP BY w1), "
    "nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cxy) "
    "SELECT x.w1, x.w2, x.c, "
    + _E8LN.format(x="x.c")
    + " + "
    + _E8LN.format(x="(SELECT n FROM nn)")
    + " - "
    + _E8LN.format(x="a.cw")
    + " - "
    + _E8LN.format(x="b.cw")
    + " AS pmi_e8, ("
    + _E8LN.format(x="x.c")
    + " + "
    + _E8LN.format(x="(SELECT n FROM nn)")
    + " - "
    + _E8LN.format(x="a.cw")
    + " - "
    + _E8LN.format(x="b.cw")
    + ") / 100000000 AS pmi "
    "FROM cxy x JOIN cx a ON x.w1 = a.w JOIN cx b ON x.w2 = b.w "
    "WHERE x.c >= 5 AND x.w1 < x.w2 "
    "ORDER BY pmi_e8 DESC, x.w1, x.w2 LIMIT 100"
)

_ORACLES["pmi_top100"] = _PMI_SQL


def _q_double_sweep(spark, sf_dir):
    """Double-sweep diameter lower bound from source 0 (two BFS
    fixpoints; the scalar handoff between sweeps is replayed in the
    oracle via a LIMIT 1 pick CTE)."""
    from dachshund_spark.algorithms.paths import double_sweep_diameter

    return double_sweep_diameter(derived_graph(spark, sf_dir), source=0)


def _double_sweep_sql(source: int = 0, levels: int = 8) -> str:
    parts = [SQL_E, SQL_U, SQL_N]

    def sweep(tag: str, src_expr: str) -> None:
        parts.append(
            f"{tag}0 AS MATERIALIZED (SELECT node_id, "
            f"CASE WHEN node_id = {src_expr} THEN 0 END AS dist FROM nodes)"
        )
        for i in range(levels):
            parts.append(
                f"{tag}f{i} AS MATERIALIZED (SELECT DISTINCT u.dst AS node_id "
                f"FROM und u JOIN {tag}{i} l ON u.src = l.node_id WHERE l.dist = {i})"
            )
            parts.append(
                f"{tag}{i + 1} AS MATERIALIZED (SELECT n.node_id, "
                f"CASE WHEN n.dist IS NOT NULL THEN n.dist "
                f"WHEN f.node_id IS NOT NULL THEN {i + 1} END AS dist "
                f"FROM {tag}{i} n LEFT JOIN {tag}f{i} f ON n.node_id = f.node_id)"
            )

    sweep("a", str(source))
    parts.append(
        f"p1 AS MATERIALIZED (SELECT node_id AS far, dist AS ecc FROM a{levels} "
        "WHERE dist IS NOT NULL ORDER BY dist DESC, node_id LIMIT 1)"
    )
    sweep("b", "(SELECT far FROM p1)")
    parts.append(
        f"p2 AS MATERIALIZED (SELECT node_id AS witness, dist AS dlb FROM b{levels} "
        "WHERE dist IS NOT NULL ORDER BY dist DESC, node_id LIMIT 1)"
    )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT CAST({source} AS BIGINT) AS source, "
        "CAST((SELECT ecc FROM p1) AS BIGINT) AS ecc_source, "
        "(SELECT far FROM p1) AS far_node, "
        "CAST((SELECT dlb FROM p2) AS BIGINT) AS diameter_lb, "
        "(SELECT witness FROM p2) AS witness"
    )


_ORACLES["double_sweep_diameter"] = _double_sweep_sql()

# recency decay: weight = 2^-min(years_before_2002, 7) — dyadic
# literals are exactly representable, so MAX/SUM over them is
# engine-exact with no libm anywhere
_DECAY_CASE = (
    "CAST(CASE {b} WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 WHEN 2 THEN 0.25 "
    "WHEN 3 THEN 0.125 WHEN 4 THEN 0.0625 WHEN 5 THEN 0.03125 "
    "WHEN 6 THEN 0.015625 ELSE 0.0078125 END AS DOUBLE)"
)
_B_SPARK = (
    "least(cast(datediff(DATE'2002-01-01', cast(l_shipdate as date)) as bigint) "
    "div 365, 7)"
)
_B_DUCK = (
    "least(datediff('day', CAST(l_shipdate AS DATE), DATE '2002-01-01') // 365, 7)"
)


def _q_temporal_pagerank(spark, sf_dir):
    """Recency-weighted PageRank: each edge weighted by 2^-age_years of
    its most recent occurrence (crawl-freshness ranking).  Dyadic decay
    keeps every weight exact; the rest is the oracled weighted-PageRank
    machinery."""
    from dachshund_spark.algorithms import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select(
        (F.col("l_orderkey") % N_NODES).alias("src"),
        (F.col("l_partkey") % N_NODES).alias("dst"),
        F.expr(_DECAY_CASE.format(b=_B_SPARK)).alias("w"),
    ).where(F.col("src") != F.col("dst"))
    we = rows.groupBy("src", "dst").agg(F.max("w").alias("wt"))
    pr = pagerank(
        LinkGraph(we, extra_cols=["wt"]),
        damping=DAMPING,
        fixed_iterations=PAGERANK_ITERS,
        dedupe_edges=False,
        weight_col="wt",
    )
    return pr.select("node_id", F.round("pagerank", 8).alias("pagerank"))


_TEMPORAL_WEDGES = (
    "SELECT src, dst, MAX(w) AS wt FROM ("
    f"SELECT l_orderkey % {N_NODES} AS src, l_partkey % {N_NODES} AS dst, "
    + _DECAY_CASE.format(b=_B_DUCK)
    + " AS w FROM lineitem "
    f"WHERE l_orderkey % {N_NODES} <> l_partkey % {N_NODES}"
    ") GROUP BY src, dst"
)

_ORACLES["temporal_pagerank_10"] = _pagerank_weighted_sql(
    wedges_body=_TEMPORAL_WEDGES
)


def _q_four_cliques(spark, sf_dir):
    """Per-node 4-clique counts on the induced <256 subgraph (degree-
    oriented enumeration; the oracle uses id order — counts are
    enumeration-order independent)."""
    from dachshund_spark.algorithms.triangles import four_clique_counts

    g = derived_graph(spark, sf_dir)
    sub = LinkGraph(g.edges.where((F.col("src") < 256) & (F.col("dst") < 256)))
    return four_clique_counts(sub).orderBy("node_id")


_FOUR_CLIQUE_SQL = (
    "WITH "
    + ", ".join(
        [
            SQL_E,
            SQL_U,
            SQL_CANON,
            "c2 AS MATERIALIZED (SELECT src AS a, dst AS b FROM canon "
            "WHERE src < 256 AND dst < 256)",
            "n2 AS MATERIALIZED (SELECT DISTINCT a AS node_id FROM "
            "(SELECT a FROM c2 UNION ALL SELECT b FROM c2))",
            "tri AS MATERIALIZED (SELECT p.a, p.b, q.b AS c FROM c2 p "
            "JOIN c2 q ON p.a = q.a AND p.b < q.b "
            "JOIN c2 r ON r.a = p.b AND r.b = q.b)",
            "quad AS MATERIALIZED (SELECT t.a, t.b, t.c, e.b AS d FROM tri t "
            "JOIN c2 e ON e.a = t.c "
            "JOIN c2 e2 ON e2.a = t.a AND e2.b = e.b "
            "JOIN c2 e3 ON e3.a = t.b AND e3.b = e.b)",
            "pn AS MATERIALIZED (SELECT a AS node_id FROM quad "
            "UNION ALL SELECT b FROM quad UNION ALL SELECT c FROM quad "
            "UNION ALL SELECT d FROM quad)",
        ]
    )
    + " SELECT n.node_id, COALESCE(c.cnt, 0) AS cliques4 FROM n2 n "
    "LEFT JOIN (SELECT node_id, COUNT(*) AS cnt FROM pn GROUP BY node_id) c "
    "ON n.node_id = c.node_id ORDER BY n.node_id"
)

_ORACLES["four_cliques_256"] = _FOUR_CLIQUE_SQL


def _q_kclique_counts(spark, sf_dir):
    """k-clique census (k = 2..6) on the <512 subgraph: Chiba–Nishizeki
    extension joins over the oriented edge table; counts are
    enumeration-order independent so the id-ordered oracle matches."""
    from dachshund_spark.algorithms.triangles import kclique_counts_by_size

    g = derived_graph(spark, sf_dir)
    sub = LinkGraph(g.edges.where((F.col("src") < 512) & (F.col("dst") < 512)))
    return kclique_counts_by_size(sub, max_k=6).select(
        "k", F.col("cliques").cast("long").alias("cliques")
    )


_KCLIQUE_SQL = (
    "WITH "
    + ", ".join(
        [
            SQL_E,
            SQL_U,
            SQL_CANON,
            "c5 AS MATERIALIZED (SELECT src AS a, dst AS b FROM canon "
            "WHERE src < 512 AND dst < 512)",
            "tri5 AS MATERIALIZED (SELECT p.a, p.b, q.b AS c FROM c5 p "
            "JOIN c5 q ON p.a = q.a AND p.b < q.b "
            "JOIN c5 r ON r.a = p.b AND r.b = q.b)",
            "quad5 AS MATERIALIZED (SELECT t.a, t.b, t.c, e.b AS d FROM tri5 t "
            "JOIN c5 e ON e.a = t.c "
            "JOIN c5 e2 ON e2.a = t.a AND e2.b = e.b "
            "JOIN c5 e3 ON e3.a = t.b AND e3.b = e.b)",
            "quint5 AS MATERIALIZED (SELECT q.a, q.b, q.c, q.d, x.b AS f "
            "FROM quad5 q JOIN c5 x ON x.a = q.d "
            "JOIN c5 x2 ON x2.a = q.a AND x2.b = x.b "
            "JOIN c5 x3 ON x3.a = q.b AND x3.b = x.b "
            "JOIN c5 x4 ON x4.a = q.c AND x4.b = x.b)",
            "sext5 AS MATERIALIZED (SELECT q.a, y.b AS h FROM quint5 q "
            "JOIN c5 y ON y.a = q.f "
            "JOIN c5 y2 ON y2.a = q.a AND y2.b = y.b "
            "JOIN c5 y3 ON y3.a = q.b AND y3.b = y.b "
            "JOIN c5 y4 ON y4.a = q.c AND y4.b = y.b "
            "JOIN c5 y5 ON y5.a = q.d AND y5.b = y.b)",
        ]
    )
    + " SELECT CAST(2 AS BIGINT) AS k, COUNT(*) AS cliques FROM c5"
    " UNION ALL SELECT 3, COUNT(*) FROM tri5"
    " UNION ALL SELECT 4, COUNT(*) FROM quad5"
    " UNION ALL SELECT 5, COUNT(*) FROM quint5"
    " UNION ALL SELECT 6, COUNT(*) FROM sext5"
)

_ORACLES["kclique_counts_512"] = _KCLIQUE_SQL


def _q_maximal_cliques(spark, sf_dir):
    """Maximal-clique census (k = 2..6, levels enumerated to 7) on the
    <512 subgraph: maximal_k = |L_k| − |distinct drop-one subsets of
    L_{k+1}| — set algebra over census levels, order-independent."""
    from dachshund_spark.algorithms.triangles import maximal_clique_counts

    g = derived_graph(spark, sf_dir)
    sub = LinkGraph(g.edges.where((F.col("src") < 512) & (F.col("dst") < 512)))
    return maximal_clique_counts(sub, max_k=6).select("k", "maximal_cliques")


def _maximal_clique_sql(max_k: int = 6, lim: int = 512) -> str:
    parts = [
        SQL_E,
        SQL_U,
        SQL_CANON,
        f"l2 AS MATERIALIZED (SELECT src AS x1, dst AS x2 FROM canon "
        f"WHERE src < {lim} AND dst < {lim})",
    ]
    # level k+1 = level k ⋈ extension on x_k + (k-1) adjacency checks
    for k in range(2, max_k + 1):
        joins = [f"JOIN l2 e ON e.x1 = t.x{k}"]
        joins += [
            f"JOIN l2 e{i} ON e{i}.x1 = t.x{i} AND e{i}.x2 = e.x2"
            for i in range(1, k)
        ]
        cols = ", ".join([f"t.x{i}" for i in range(1, k + 1)] + [f"e.x2 AS x{k+1}"])
        parts.append(
            f"l{k+1} AS MATERIALIZED (SELECT {cols} FROM l{k} t "
            + " ".join(joins)
            + ")"
        )
    # distinct drop-one subsets of each upper level
    for k in range(2, max_k + 1):
        sels = []
        cols = [f"x{i}" for i in range(1, k + 2)]
        for drop in cols:
            keep = [c for c in cols if c != drop]
            sels.append(
                "SELECT "
                + ", ".join(f"{c} AS x{i+1}" for i, c in enumerate(keep))
                + f" FROM l{k+1}"
            )
        parts.append(f"ns{k} AS MATERIALIZED ({' UNION '.join(sels)})")
    finals = [
        f"SELECT CAST({k} AS BIGINT) AS k, "
        f"(SELECT COUNT(*) FROM l{k}) - (SELECT COUNT(*) FROM ns{k}) "
        f"AS maximal_cliques"
        for k in range(2, max_k + 1)
    ]
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(finals)


_ORACLES["maximal_cliques_512"] = _maximal_clique_sql()


def _q_graphlets(spark, sf_dir):
    """Exact non-induced graphlet census on the <256 subgraph — every
    motif a closed-form integer combination of degree / triangle /
    support / codegree aggregates (motifs.graphlet_census; brute-force
    pinned in tests/test_graphlets.py)."""
    from dachshund_spark.motifs import graphlet_census

    g = derived_graph(spark, sf_dir)
    sub = LinkGraph(g.edges.where((F.col("src") < 256) & (F.col("dst") < 256)))
    return graphlet_census(sub)


_GRAPHLET_SQL = (
    "WITH "
    + ", ".join(
        [
            SQL_E,
            "sube AS MATERIALIZED (SELECT src, dst FROM edges_raw "
            "WHERE src < 256 AND dst < 256)",
            "undg AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
            "(SELECT src, dst FROM sube UNION ALL SELECT dst, src FROM sube) "
            "WHERE src <> dst)",
            "cg AS MATERIALIZED (SELECT src AS a, dst AS b FROM undg WHERE src < dst)",
            "degg AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS d "
            "FROM undg GROUP BY src)",
            "trig AS MATERIALIZED (SELECT p.a, p.b, q.b AS c FROM cg p "
            "JOIN cg q ON p.a = q.a AND p.b < q.b "
            "JOIN cg r ON r.a = p.b AND r.b = q.b)",
            "quadg AS MATERIALIZED (SELECT t.a, t.b, t.c, e.b AS dd FROM trig t "
            "JOIN cg e ON e.a = t.c "
            "JOIN cg e2 ON e2.a = t.a AND e2.b = e.b "
            "JOIN cg e3 ON e3.a = t.b AND e3.b = e.b)",
            "ejg AS MATERIALIZED (SELECT c.a, c.b, da.d AS d_a, db.d AS d_b "
            "FROM cg c JOIN degg da ON c.a = da.node_id "
            "JOIN degg db ON c.b = db.node_id)",
            "codegg AS MATERIALIZED (SELECT w1.dst AS u, w2.dst AS w, "
            "COUNT(*) AS c FROM undg w1 JOIN undg w2 "
            "ON w1.src = w2.src AND w1.dst < w2.dst GROUP BY w1.dst, w2.dst)",
            "supg AS MATERIALIZED (SELECT es, ed, COUNT(*) AS s FROM ("
            "SELECT LEAST(a, b) AS es, GREATEST(a, b) AS ed FROM trig "
            "UNION ALL SELECT LEAST(a, c), GREATEST(a, c) FROM trig "
            "UNION ALL SELECT LEAST(b, c), GREATEST(b, c) FROM trig) "
            "GROUP BY es, ed)",
            "ntri AS MATERIALIZED (SELECT COUNT(*) AS t FROM trig)",
        ]
    )
    + " SELECT 'wedge' AS motif, CAST(SUM(d * (d - 1)) // 2 AS BIGINT) AS count FROM degg"
    " UNION ALL SELECT 'triangle', CAST(t AS BIGINT) FROM ntri"
    " UNION ALL SELECT 'claw', CAST(SUM(d * (d - 1) * (d - 2)) // 6 AS BIGINT) FROM degg"
    " UNION ALL SELECT 'path4', CAST(SUM((d_a - 1) * (d_b - 1)) "
    "- 3 * (SELECT t FROM ntri) AS BIGINT) FROM ejg"
    " UNION ALL SELECT 'cycle4', CAST((SUM(c * (c - 1)) // 2) // 2 AS BIGINT) FROM codegg"
    " UNION ALL SELECT 'diamond', CAST(SUM(s * (s - 1)) // 2 AS BIGINT) FROM supg"
    " UNION ALL SELECT 'clique4', CAST(COUNT(*) AS BIGINT) FROM quadg"
)

_ORACLES["graphlet_census_256"] = _GRAPHLET_SQL


def _q_cpm(spark, sf_dir):
    """Clique-percolation (k=3) OVERLAPPING communities on the <256
    subgraph: triangles chained through shared edges, hash-min CC over
    the overlap graph (algorithms/cpm.py).  Output decodes the packed
    community label back to its lexicographically-min triangle
    (cu, cv, cw) so the label is pack-scale independent."""
    from dachshund_spark.algorithms.cpm import clique_percolation

    g = derived_graph(spark, sf_dir)
    sub = LinkGraph(g.edges.where((F.col("src") < 256) & (F.col("dst") < 256)))
    out = clique_percolation(sub, max_iterations=24)
    mx = sub.edges.agg(F.max(F.greatest("src", "dst"))).first()[0]
    sc = 1 << max(int(mx).bit_length(), 1)
    return out.select(
        F.expr(f"community DIV {sc * sc}").cast("long").alias("cu"),
        F.expr(f"(community DIV {sc}) % {sc}").cast("long").alias("cv"),
        F.expr(f"community % {sc}").cast("long").alias("cw"),
        F.col("node_id").cast("long").alias("node_id"),
    )


def _cpm_sql(iters: int = 24) -> str:
    """CPM k=3 unroll: canonical triangles → packed ids (fixed scale 256,
    valid because ids < 256; ANY order-preserving scale decodes to the
    same lex-min triangle) → per-edge chain links → hash-min rounds."""
    parts = [
        SQL_E,
        SQL_U,
        SQL_CANON,
        "c2 AS MATERIALIZED (SELECT src AS a, dst AS b FROM canon "
        "WHERE src < 256 AND dst < 256)",
        "tri AS MATERIALIZED (SELECT p.a AS u, p.b AS v, q.b AS w, "
        "(p.a * 256 + p.b) * 256 + q.b AS tid FROM c2 p "
        "JOIN c2 q ON p.a = q.a AND p.b < q.b "
        "JOIN c2 r ON r.a = p.b AND r.b = q.b)",
        "em AS MATERIALIZED (SELECT u AS es, v AS ed, tid FROM tri "
        "UNION ALL SELECT u, w, tid FROM tri UNION ALL SELECT v, w, tid FROM tri)",
        "chain AS MATERIALIZED (SELECT es, ed, tid, "
        "LAG(tid) OVER (PARTITION BY es, ed ORDER BY tid) AS prev FROM em)",
        "oe AS MATERIALIZED (SELECT prev AS src, tid AS dst FROM chain "
        "WHERE prev IS NOT NULL)",
        "oesym AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM oe UNION ALL SELECT dst, src FROM oe))",
        "tn AS MATERIALIZED (SELECT DISTINCT tid AS node_id FROM tri)",
        "t0 AS MATERIALIZED (SELECT node_id, node_id AS label FROM tn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"t{i} AS MATERIALIZED (SELECT n.node_id, "
            f"CASE WHEN m.minl IS NULL OR n.label <= m.minl THEN n.label "
            f"ELSE m.minl END AS label FROM t{i-1} n LEFT JOIN ("
            f"SELECT u.dst AS node_id, MIN(l.label) AS minl "
            f"FROM oesym u JOIN t{i-1} l ON u.src = l.node_id GROUP BY u.dst) m "
            f"ON n.node_id = m.node_id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f", mem AS MATERIALIZED ("
        "SELECT tid, u AS node_id FROM tri UNION ALL SELECT tid, v FROM tri "
        "UNION ALL SELECT tid, w FROM tri) "
        f"SELECT DISTINCT CAST(l.label // 65536 AS BIGINT) AS cu, "
        f"CAST((l.label // 256) % 256 AS BIGINT) AS cv, "
        f"CAST(l.label % 256 AS BIGINT) AS cw, "
        f"CAST(m.node_id AS BIGINT) AS node_id "
        f"FROM mem m JOIN t{iters} l ON m.tid = l.node_id"
    )


_ORACLES["cpm_communities_256"] = _cpm_sql()


def _q_pagerank_residuals(spark, sf_dir):
    """Per-superstep convergence metrics of the flagship PageRank run
    (north-rule lineage: residual + message count per iteration).  The
    residual is a sum of PRE-ROUNDED 1e-8 |Δrank| integers, so the
    metric itself is engine-exact."""
    from dachshund_spark.algorithms import pagerank

    sink: list = []
    pagerank(
        derived_graph(spark, sf_dir),
        damping=DAMPING,
        fixed_iterations=PAGERANK_ITERS,
        metrics_sink=sink,
    ).count()
    return spark.createDataFrame(
        [
            (i + 1, m["residual_e8"], m["message_count"])
            for i, m in enumerate(sink)
        ],
        "iteration long, residual_e8 long, message_count long",
    )


def _pagerank_residuals_sql(iters: int = PAGERANK_ITERS, d: float = DAMPING) -> str:
    base = _pagerank_sql(iters, d)
    body = base[len("WITH ") : base.rindex(" SELECT node_id")]
    parts = [body]
    outs = []
    for i in range(1, iters + 1):
        parts.append(
            f"res{i} AS MATERIALIZED (SELECT "
            "CAST(SUM(CAST(ROUND(ABS(a.rank - b.rank) * 100000000, 0) AS BIGINT)) AS BIGINT) AS d, "
            f"COUNT(*) AS c FROM r{i} a JOIN r{i - 1} b ON a.node_id = b.node_id)"
        )
        outs.append(
            f"SELECT CAST({i} AS BIGINT) AS iteration, "
            f"(SELECT d FROM res{i}) AS residual_e8, "
            f"(SELECT c FROM res{i}) AS message_count"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT iteration, residual_e8, message_count FROM ("
        + " UNION ALL ".join(outs)
        + ") ORDER BY iteration"
    )


_ORACLES["pagerank_residuals_10"] = _pagerank_residuals_sql()


def _q_copurchase(spark, sf_dir):
    """Market-basket one-mode projection of the REAL order→part
    bipartite table: weight = shared orders, per-order fan-out gate,
    top-20 by (weight, ids)."""
    from dachshund_spark.algorithms.butterflies import bipartite_projection

    li = load_table(spark, sf_dir, "lineitem")
    pairs = bipartite_projection(
        li, group_col="l_orderkey", item_col="l_partkey", max_group_size=64
    )
    return (
        pairs.orderBy(F.desc("weight"), F.asc("item_a"), F.asc("item_b"))
        .limit(20)
        .select(
            F.col("item_a").cast("long").alias("item_a"),
            F.col("item_b").cast("long").alias("item_b"),
            F.col("weight").cast("long").alias("weight"),
        )
    )


_COPURCHASE_SQL = (
    "WITH m AS MATERIALIZED (SELECT DISTINCT l_orderkey AS g, "
    "l_partkey AS item FROM lineitem), "
    "sz AS MATERIALIZED (SELECT g FROM m GROUP BY g HAVING COUNT(*) <= 64), "
    "mk AS MATERIALIZED (SELECT m.g, m.item FROM m JOIN sz ON m.g = sz.g), "
    "p AS MATERIALIZED (SELECT a.item AS item_a, b.item AS item_b, "
    "COUNT(*) AS weight FROM mk a JOIN mk b "
    "ON a.g = b.g AND a.item < b.item GROUP BY a.item, b.item) "
    "SELECT CAST(item_a AS BIGINT) AS item_a, CAST(item_b AS BIGINT) AS item_b, "
    "CAST(weight AS BIGINT) AS weight FROM p "
    "ORDER BY weight DESC, item_a, item_b LIMIT 20"
)

_ORACLES["copurchase_top20"] = _COPURCHASE_SQL


def _q_assoc_rules(spark, sf_dir):
    """Directed association rules over the order→part baskets
    (confidence + lift as single divisions of exact counts), weight ≥ 3."""
    from dachshund_spark.algorithms.butterflies import association_rules

    li = load_table(spark, sf_dir, "lineitem")
    return association_rules(
        li,
        group_col="l_orderkey",
        item_col="l_partkey",
        max_group_size=64,
        min_weight=3,
    ).select(
        F.col("item_a").cast("long").alias("item_a"),
        F.col("item_b").cast("long").alias("item_b"),
        "weight",
        "n_a",
        "n_b",
        "confidence",
        "lift",
    )


_ASSOC_SQL = (
    "WITH m AS MATERIALIZED (SELECT DISTINCT l_orderkey AS g, "
    "l_partkey AS item FROM lineitem), "
    "sz AS MATERIALIZED (SELECT g FROM m GROUP BY g HAVING COUNT(*) <= 64), "
    "mk AS MATERIALIZED (SELECT m.g, m.item FROM m JOIN sz ON m.g = sz.g), "
    "ng AS MATERIALIZED (SELECT COUNT(DISTINCT g) AS n FROM mk), "
    "p AS MATERIALIZED (SELECT a.item AS item_a, b.item AS item_b, "
    "COUNT(*) AS weight FROM mk a JOIN mk b "
    "ON a.g = b.g AND a.item <> b.item GROUP BY a.item, b.item "
    "HAVING COUNT(*) >= 3), "
    "mg AS MATERIALIZED (SELECT item, COUNT(*) AS n FROM mk GROUP BY item) "
    "SELECT CAST(p.item_a AS BIGINT) AS item_a, CAST(p.item_b AS BIGINT) AS item_b, "
    "CAST(p.weight AS BIGINT) AS weight, CAST(ma.n AS BIGINT) AS n_a, "
    "CAST(mb.n AS BIGINT) AS n_b, "
    "CAST(p.weight AS DOUBLE) / CAST(ma.n AS DOUBLE) AS confidence, "
    "CAST((SELECT n FROM ng) * p.weight AS DOUBLE) / CAST(ma.n * mb.n AS DOUBLE) AS lift "
    "FROM p JOIN mg ma ON p.item_a = ma.item JOIN mg mb ON p.item_b = mb.item"
)

_ORACLES["assoc_rules_3"] = _ASSOC_SQL


def _q_burstiness(spark, sf_dir):
    """Per-user inter-event burstiness (Goh–Barabási) over the events
    stream: exact integer gap moments, one shared IEEE expression tree
    for B."""
    from dachshund_spark.relational import interevent_burstiness

    return interevent_burstiness(load_table(spark, sf_dir, "events"))


_BURSTINESS_SQL = (
    "WITH ev AS MATERIALIZED (SELECT user_id, "
    "epoch_us(ts) // 1000000 AS sec, ts, event_id FROM events), "
    "d AS MATERIALIZED (SELECT user_id, sec - LAG(sec) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id) AS d FROM ev), "
    "m AS MATERIALIZED (SELECT user_id, COUNT(d) AS n, SUM(d) AS s, "
    "SUM(d * d) AS q FROM d WHERE d IS NOT NULL GROUP BY user_id) "
    "SELECT user_id, CAST(n AS BIGINT) AS n_gaps, CAST(s AS BIGINT) AS sum_gap, "
    "(SQRT(CAST(n * q - s * s AS DOUBLE) / CAST(n * n AS DOUBLE)) "
    "- CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / "
    "(SQRT(CAST(n * q - s * s AS DOUBLE) / CAST(n * n AS DOUBLE)) "
    "+ CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS burstiness "
    "FROM m WHERE n >= 2 AND s > 0"
)

_ORACLES["interevent_burstiness"] = _BURSTINESS_SQL


def _q_event_transitions(spark, sf_dir):
    """First-order Markov transitions over per-user event streams."""
    from dachshund_spark.relational import event_transitions

    ev = load_table(spark, sf_dir, "events")
    return event_transitions(ev).orderBy("src_type", "dst_type")


_EVENT_TRANSITIONS_SQL = (
    "WITH pairs AS MATERIALIZED (SELECT src_type, dst_type FROM ("
    "SELECT event_type AS src_type, "
    "LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst_type "
    "FROM events) WHERE dst_type IS NOT NULL), "
    "trans AS MATERIALIZED (SELECT src_type, dst_type, COUNT(*) AS c "
    "FROM pairs GROUP BY src_type, dst_type), "
    "marg AS MATERIALIZED (SELECT src_type, CAST(SUM(c) AS BIGINT) AS tot "
    "FROM trans GROUP BY src_type) "
    "SELECT t.src_type, t.dst_type, t.c, t.c / m.tot AS prob "
    "FROM trans t JOIN marg m ON t.src_type = m.src_type "
    "ORDER BY t.src_type, t.dst_type"
)

_ORACLES["event_transitions"] = _EVENT_TRANSITIONS_SQL

HIT_TARGETS = tuple(range(0, 1024, 17))  # node_id % 17 == 0
HIT_ABSORBERS = tuple(range(1, 1024, 17))  # node_id % 17 == 1


def _q_absorbing_hit(spark, sf_dir):
    """Truncated absorbing-walk spam proximity: P(hit target set
    before trusted set), 8 supersteps."""
    from dachshund_spark.algorithms.trust import absorbing_hit_probability

    out = absorbing_hit_probability(
        derived_graph(spark, sf_dir),
        list(HIT_TARGETS),
        list(HIT_ABSORBERS),
        rounds=8,
    )
    return out.select("node_id", "cls", "hit_prob").orderBy("node_id")


def _absorbing_sql(rounds: int = 8) -> str:
    parts = [
        SQL_E,
        SQL_U,
        "adeg AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS deg FROM und GROUP BY src)",
        "anodes AS MATERIALIZED (SELECT node_id, deg, "
        "CASE WHEN node_id % 17 = 0 THEN 'target' "
        "WHEN node_id % 17 = 1 THEN 'absorber' ELSE 'free' END AS cls FROM adeg)",
        "h0 AS MATERIALIZED (SELECT node_id, "
        "CASE WHEN cls = 'target' THEN 1.0 ELSE 0.0 END AS h FROM anodes)",
    ]
    for i in range(rounds):
        parts.append(
            f"h{i + 1} AS MATERIALIZED (SELECT n.node_id, "
            "CASE WHEN n.cls = 'target' THEN 1.0 "
            "WHEN n.cls = 'absorber' THEN 0.0 "
            "ELSE COALESCE(c.s, 0.0) / n.deg END AS h "
            "FROM anodes n LEFT JOIN ("
            f"SELECT u.dst AS node_id, SUM(t.h) AS s FROM und u "
            f"JOIN h{i} t ON u.src = t.node_id GROUP BY u.dst) c "
            "ON n.node_id = c.node_id)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT n.node_id, n.cls, ROUND(t.h, 8) AS hit_prob "
        f"FROM h{rounds} t JOIN anodes n ON t.node_id = n.node_id "
        "ORDER BY n.node_id"
    )


_ORACLES["absorbing_hit_8"] = _absorbing_sql()


def _q_cascade(spark, sf_dir):
    """Derandomized independent-cascade spread from node_id %% 101 == 0
    seeds (p = 0.30 md5 coin per edge, 8 rounds)."""
    from dachshund_spark.algorithms.trust import independent_cascade

    out = independent_cascade(
        derived_graph(spark, sf_dir),
        list(range(0, N_NODES, 101)),
        p_percent=30,
        rounds=8,
    )
    return out.select("node_id", "round").orderBy("node_id")


def _cascade_sql(p_percent: int = 30, rounds: int = 8, seed: int = 0) -> str:
    coin = MD5L.format(x=f"concat_ws('#', {seed}, 'ic', src, dst)")
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        f"live AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges_raw "
        f"WHERE ({coin}) % 100 < {p_percent})",
        "ca0 AS MATERIALIZED (SELECT node_id, CAST(0 AS BIGINT) AS round "
        "FROM nodes WHERE node_id % 101 = 0)",
    ]
    for i in range(rounds):
        parts.append(
            f"ca{i + 1} AS MATERIALIZED ("
            f"SELECT node_id, round FROM ca{i} UNION ALL "
            f"SELECT DISTINCT l.dst AS node_id, CAST({i + 1} AS BIGINT) AS round "
            f"FROM live l JOIN ca{i} f ON l.src = f.node_id AND f.round = {i} "
            f"WHERE l.dst NOT IN (SELECT node_id FROM ca{i}))"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node_id, round FROM ca{rounds} ORDER BY node_id"
    )


_ORACLES["cascade_8"] = _cascade_sql()


def _q_matching(spark, sf_dir):
    """Greedy maximal matching (Luby local-minima, md5 priorities);
    Spark runs to exhaustion (8 rounds at sf0.01), oracle unrolls 12."""
    from dachshund_spark.algorithms.matching import maximal_matching

    out = maximal_matching(derived_graph(spark, sf_dir))
    return out.select("u", "v", "priority").orderBy("u", "v")


def _matching_parts(rounds: int = 12, seed: int = 0) -> tuple[list[str], str]:
    """Shared unroll for matching_greedy and coarsen_matching: returns
    (CTE parts, selected-edges union SQL)."""
    prio = MD5L.format(x=f"concat_ws('#', {seed}, 'm', src, dst)")
    parts = [
        SQL_E,
        SQL_U,
        SQL_CANON,
        f"m0 AS MATERIALIZED (SELECT src AS u, dst AS v, {prio} AS p FROM canon)",
    ]
    outs = []
    for i in range(rounds):
        parts.append(
            f"nm{i} AS MATERIALIZED (SELECT node_id, MIN(p) AS pm FROM ("
            f"SELECT u AS node_id, p FROM m{i} UNION ALL SELECT v, p FROM m{i}"
            ") GROUP BY node_id)"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT e.u, e.v, e.p FROM m{i} e "
            f"JOIN nm{i} a ON e.u = a.node_id AND e.p = a.pm "
            f"JOIN nm{i} b ON e.v = b.node_id AND e.p = b.pm)"
        )
        outs.append(f"SELECT u, v, p AS priority FROM s{i}")
        parts.append(
            f"gone{i} AS MATERIALIZED (SELECT u AS node_id FROM s{i} "
            f"UNION ALL SELECT v FROM s{i})"
        )
        parts.append(
            f"m{i + 1} AS MATERIALIZED (SELECT u, v, p FROM m{i} "
            f"WHERE u NOT IN (SELECT node_id FROM gone{i}) "
            f"AND v NOT IN (SELECT node_id FROM gone{i}))"
        )
    return parts, " UNION ALL ".join(outs)


def _matching_sql(rounds: int = 12, seed: int = 0) -> str:
    parts, union = _matching_parts(rounds, seed)
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT u, v, priority FROM ("
        + union
        + ") ORDER BY u, v"
    )


_ORACLES["matching_greedy"] = _matching_sql()


def _q_coarsen(spark, sf_dir):
    """One METIS-style coarsening level over the greedy matching:
    coarse edge list [u, v, weight]."""
    from dachshund_spark.algorithms.matching import coarsen_by_matching

    _mapping, coarse = coarsen_by_matching(derived_graph(spark, sf_dir))
    return coarse.orderBy("u", "v")


def _coarsen_sql(rounds: int = 12, seed: int = 0) -> str:
    parts, union = _matching_parts(rounds, seed)
    parts.append(f"mat AS MATERIALIZED (SELECT u, v FROM ({union}))")
    parts.append(
        "pmap AS MATERIALIZED (SELECT u AS node_id, u AS super FROM mat "
        "UNION ALL SELECT v, u FROM mat)"
    )
    # LinkGraph.nodes(): raw endpoints incl. self-loop-only nodes
    parts.append(
        "rawn AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM "
        "(SELECT src FROM edges_raw UNION ALL SELECT dst FROM edges_raw))"
    )
    parts.append(
        "cmap AS MATERIALIZED (SELECT n.node_id, "
        "COALESCE(p.super, n.node_id) AS super FROM rawn n "
        "LEFT JOIN pmap p ON n.node_id = p.node_id)"
    )
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT LEAST(a.super, b.super) AS u, GREATEST(a.super, b.super) AS v, "
        "COUNT(*) AS weight FROM canon c "
        "JOIN cmap a ON c.src = a.node_id JOIN cmap b ON c.dst = b.node_id "
        "WHERE a.super <> b.super GROUP BY 1, 2 ORDER BY u, v"
    )


_ORACLES["coarsen_matching"] = _coarsen_sql()


def _q_unigram_kl(spark, sf_dir):
    """Per-doc unigram KL vs the corpus distribution (DSIR-style
    outlier feature); terms pre-rounded to 1e-8 BIGINTs."""
    from dachshund_spark.pipeline.lm import unigram_kl_scores

    docs = load_table(spark, sf_dir, "documents")
    return unigram_kl_scores(docs).orderBy("doc_id")


_UNIGRAM_KL_SQL = (
    "WITH dt AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
    "FROM documents), "
    "dc AS MATERIALIZED (SELECT doc_id, tok, COUNT(*) AS c FROM dt GROUP BY doc_id, tok), "
    "nd AS MATERIALIZED (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM dc GROUP BY doc_id), "
    "ct AS MATERIALIZED (SELECT tok, COUNT(*) AS cc FROM dt GROUP BY tok), "
    "tot AS (SELECT COUNT(*) AS nn, COUNT(DISTINCT tok) AS v FROM dt), "
    "terms AS MATERIALIZED (SELECT d.doc_id, nd.n, "
    "CAST(ROUND(((d.c / nd.n) * LN((d.c / nd.n) / "
    "((COALESCE(ct.cc, 0) + 1) / ((SELECT nn FROM tot) + (SELECT v FROM tot))))) "
    "* 100000000, 0) AS BIGINT) AS t_e8 "
    "FROM dc d JOIN nd ON d.doc_id = nd.doc_id "
    "LEFT JOIN ct ON d.tok = ct.tok) "
    "SELECT doc_id, MAX(n) AS n_tokens, CAST(SUM(t_e8) AS BIGINT) AS kl_e8, "
    "CAST(SUM(t_e8) AS BIGINT) / 100000000 AS kl "
    "FROM terms GROUP BY doc_id ORDER BY doc_id"
)

_ORACLES["unigram_kl"] = _UNIGRAM_KL_SQL


def _q_incremental_dedup(spark, sf_dir):
    """Incremental seen-hash dedup: documents stream in 3 micro-batches
    (doc_id % 3); marking replayed by the oracle as a min-key window
    over (batch, doc_id) order."""
    import shutil
    import tempfile

    from dachshund_spark.streaming import merge_seen_batch

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="dedup_state_")
    try:
        out = None
        for b in range(3):
            marked = merge_seen_batch(
                spark, docs.where(F.col("doc_id") % 3 == b), b, f"{tmp}/state"
            )
            out = marked if out is None else out.unionByName(marked)
        # marked frames are eagerly localCheckpointed inside
        # merge_seen_batch, so the union survives the state dir removal
        return out.orderBy("doc_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_INCR_DEDUP_SQL = (
    "WITH keyed AS MATERIALIZED (SELECT doc_id, "
    + MD5L.format(x="text")
    + " AS text_hash, "
    "(doc_id % 3) * 1099511627776 + doc_id AS k FROM documents) "
    "SELECT doc_id, text_hash, "
    "k > MIN(k) OVER (PARTITION BY text_hash) AS is_dup "
    "FROM keyed ORDER BY doc_id"
)

_ORACLES["incremental_dedup_3"] = _INCR_DEDUP_SQL


def _q_mutual_links(spark, sf_dir):
    """Reciprocal (mutual) link pairs ranked by combined degree —
    written against the engine's SQL surface (temp view + spark.sql)
    rather than the DataFrame API, exercising that entry point
    end-to-end."""
    from dachshund_spark.derived import derived_edges

    derived_edges(spark, sf_dir).distinct().createOrReplaceTempView("edges_v")
    return spark.sql(
        """
        WITH und AS (
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM edges_v
                UNION ALL
                SELECT dst AS src, src AS dst FROM edges_v
            )
        ),
        deg AS (SELECT src AS node_id, COUNT(*) AS degree FROM und GROUP BY src),
        mutual AS (
            SELECT e.src AS u, e.dst AS v
            FROM edges_v e JOIN edges_v r ON e.src = r.dst AND e.dst = r.src
            WHERE e.src < e.dst
        )
        SELECT m.u, m.v, a.degree + b.degree AS combined_degree
        FROM mutual m
        JOIN deg a ON m.u = a.node_id
        JOIN deg b ON m.v = b.node_id
        ORDER BY combined_degree DESC, m.u, m.v
        LIMIT 20
        """
    )


_MUTUAL_SQL = (
    "WITH "
    + ", ".join(
        [
            SQL_E,
            SQL_D,
            SQL_U,
            SQL_DEG,
            "mutual AS MATERIALIZED (SELECT e.src AS u, e.dst AS v "
            "FROM d_edges e JOIN d_edges r ON e.src = r.dst AND e.dst = r.src "
            "WHERE e.src < e.dst)",
        ]
    )
    + " SELECT m.u, m.v, a.degree + b.degree AS combined_degree "
    "FROM mutual m JOIN deg a ON m.u = a.node_id JOIN deg b ON m.v = b.node_id "
    "ORDER BY combined_degree DESC, m.u, m.v LIMIT 20"
)

_ORACLES["mutual_links_top20"] = _MUTUAL_SQL


def _q_zipf(spark, sf_dir):
    """Zipf exponent of the corpus token-frequency tail (fmin=5)."""
    from dachshund_spark.pipeline.lm import zipf_alpha

    return zipf_alpha(load_table(spark, sf_dir, "documents"), fmin=5)


_ZIPF_SQL = (
    "WITH tf AS MATERIALIZED (SELECT tok, COUNT(*) AS f FROM "
    "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents) GROUP BY tok) "
    "SELECT CAST(5 AS BIGINT) AS fmin, CAST(COUNT(*) AS BIGINT) AS n_tail, "
    "ROUND(1.0 + COUNT(*) / (CAST(SUM(CAST(ROUND(LN(f / 4.5) * 100000000, 0) "
    "AS BIGINT)) AS DOUBLE) / 100000000.0), 8) AS alpha "
    "FROM tf WHERE f >= 5"
)

_ORACLES["token_zipf_alpha"] = _ZIPF_SQL


def _q_cdc(spark, sf_dir):
    """Content-defined chunking (window 3, divisor 8) with cross-doc
    duplication counts."""
    from dachshund_spark.pipeline.dedup import cdc_chunks

    docs = load_table(spark, sf_dir, "documents")
    return cdc_chunks(docs, window=3, divisor=8).orderBy("doc_id", "chunk_idx")


def _cdc_sql(w: int = 3, d: int = 8) -> str:
    win = MD5L.format(x=f"array_to_string(l[i - {w} + 1:i], ' ')")
    chunk = MD5L.format(x="array_to_string(l[b[j + 1] + 1:b[j + 2]], ' ')")
    return (
        "WITH t AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS l FROM documents), "
        f"bp AS MATERIALIZED (SELECT doc_id, l, list_filter(range({w}, len(l) + 1), "
        f"i -> ({win}) % {d} = 0) AS pos FROM t), "
        "bb AS MATERIALIZED (SELECT doc_id, l, "
        "list_concat(list_concat([CAST(0 AS BIGINT)], pos), "
        "CASE WHEN len(pos) > 0 AND pos[-1] = len(l) THEN [] "
        "ELSE [CAST(len(l) AS BIGINT)] END) AS b FROM bp), "
        "chunks AS MATERIALIZED (SELECT doc_id, CAST(j AS BIGINT) AS chunk_idx, "
        "CAST(b[j + 1] AS BIGINT) AS start_token, "
        "CAST(b[j + 2] - b[j + 1] AS BIGINT) AS n_tokens, "
        f"{chunk} AS chunk_hash "
        "FROM (SELECT doc_id, l, b, unnest(range(0, len(b) - 1)) AS j FROM bb)), "
        "dd AS MATERIALIZED (SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_dup_docs "
        "FROM chunks GROUP BY chunk_hash) "
        "SELECT c.doc_id, c.chunk_idx, c.start_token, c.n_tokens, c.chunk_hash, "
        "dd.n_dup_docs FROM chunks c JOIN dd ON c.chunk_hash = dd.chunk_hash "
        "ORDER BY c.doc_id, c.chunk_idx"
    )


_ORACLES["cdc_chunks_3_8"] = _cdc_sql()


def _q_hll(spark, sf_dir):
    """HLL-40 distinct-token sketch per document source, with the
    exact distinct count alongside for measured error."""
    from dachshund_spark.pipeline.sketches import hll_estimate, hll_registers
    from dachshund_spark.pipeline.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    dt = docs.select("source", F.explode(tokens("text")).alias("tok"))
    est = hll_estimate(hll_registers(dt, ["source"], "tok"), ["source"])
    exact = dt.groupBy("source").agg(
        F.countDistinct("tok").cast("long").alias("exact_distinct")
    )
    return est.join(exact, on="source").orderBy("source")


def _hll_sql(p: int = 8, rcap: int = 40, seed: int = 0) -> str:
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = m * m * (1 << rcap)
    full = 1 << rcap
    hb = 60
    h = MD5L.format(x=f"concat_ws('#', {seed}, 'hll', tok)")
    return (
        "WITH dt AS MATERIALIZED (SELECT source, unnest(string_split(text, ' ')) AS tok "
        "FROM documents), "
        f"hh AS MATERIALIZED (SELECT source, tok, {h} AS h FROM dt), "
        f"rr AS (SELECT source, h % {m} AS reg, "
        f"LEAST(CASE WHEN (h >> {p}) = 0 THEN {hb - p + 1} "
        f"ELSE {hb - p} - length(to_base(h >> {p}, 2)) + 1 END, {rcap}) AS rho FROM hh), "
        "regs AS MATERIALIZED (SELECT source, reg, MAX(rho) AS rho FROM rr "
        "GROUP BY source, reg), "
        "agg AS MATERIALIZED (SELECT source, COUNT(*) AS registers_set, "
        f"CAST(SUM(CAST(1 AS BIGINT) << CAST({rcap} - rho AS INT)) AS BIGINT) AS zset "
        "FROM regs GROUP BY source), "
        "est AS (SELECT source, CAST(registers_set AS BIGINT) AS registers_set, "
        f"CAST(zset + ({m} - registers_set) * CAST({full} AS BIGINT) AS BIGINT) AS z_e "
        "FROM agg), "
        "ex AS (SELECT source, COUNT(DISTINCT tok) AS exact_distinct FROM dt GROUP BY source) "
        "SELECT e.source, e.registers_set, e.z_e, "
        f"CASE WHEN ({alpha!r} * {scale} / e.z_e) <= {2.5 * m!r} "
        f"AND ({m} - e.registers_set) > 0 "
        f"THEN {float(m)!r} * LN({m} / CAST({m} - e.registers_set AS DOUBLE)) "
        f"ELSE {alpha!r} * {scale} / e.z_e END AS estimate, "
        "x.exact_distinct FROM est e JOIN ex x ON e.source = x.source "
        "ORDER BY e.source"
    )


_ORACLES["hll_source_distinct"] = _hll_sql()


def _q_truss_communities(spark, sf_dir):
    """Truss communities: connected components of the trussness >= 4
    edge set (<256 subgraph) — the cohesive-core community variant
    (dense overlapping-free k-truss communities, Huang et al. 2014),
    composed from the two already-oracled machines."""
    from dachshund_spark.algorithms import connected_components
    from dachshund_spark.algorithms.coreness import trussness

    e = derived_graph(spark, sf_dir).edges
    sub = LinkGraph(e.where((F.col("src") < 256) & (F.col("dst") < 256)))
    tr = trussness(sub).where(F.col("trussness") >= 4).select("src", "dst")
    comps = connected_components(LinkGraph(tr), renumber=False)
    return comps.select("node_id", "component").orderBy("node_id")


def _truss_communities_sql(
    k: int = 4, cc_rounds: int = 8, support_rounds: int = 5
) -> str:
    parts = _ktruss_surv_parts(k, max_node=256)
    parts.append(
        f"tn AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM y{support_rounds})"
    )
    parts.append("c0 AS MATERIALIZED (SELECT node_id, node_id AS label FROM tn)")
    for i in range(1, cc_rounds + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT n.node_id, "
            "CASE WHEN m.minl IS NULL OR n.label <= m.minl THEN n.label ELSE m.minl END AS label "
            f"FROM c{i - 1} n LEFT JOIN ("
            f"SELECT u.dst AS node_id, MIN(l.label) AS minl "
            f"FROM y{support_rounds} u JOIN c{i - 1} l ON u.src = l.node_id "
            "GROUP BY u.dst) m ON n.node_id = m.node_id)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node_id, label AS component FROM c{cc_rounds} ORDER BY node_id"
    )


_ORACLES["truss_communities_4"] = _truss_communities_sql()


def _q_degree_quantiles(spark, sf_dir):
    """Exact degree quantiles via histogram cumsum (no global sort)."""
    from dachshund_spark.algorithms.stats import degree_quantiles

    return degree_quantiles(derived_graph(spark, sf_dir)).orderBy("q")


_DEGREE_QUANTILES_SQL = (
    "WITH "
    + ", ".join(
        [
            SQL_E,
            SQL_U,
            SQL_DEG,
            "nn AS (SELECT COUNT(*) AS n FROM deg)",
            "hist AS MATERIALIZED (SELECT degree AS val, COUNT(*) AS cnt "
            "FROM deg GROUP BY degree)",
            "cum AS MATERIALIZED (SELECT val, "
            "SUM(cnt) OVER (ORDER BY val ROWS UNBOUNDED PRECEDING) AS cum FROM hist)",
            "qs AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10), "
            "('p99', 99, 100), ('p100', 1, 1)) AS t(q, num, den))",
            "ranks AS (SELECT q, (num * (SELECT n FROM nn) + den - 1) // den AS rank "
            "FROM qs)",
        ]
    )
    + " SELECT r.q, CAST(r.rank AS BIGINT) AS rank, "
    "CAST(MIN(c.val) AS BIGINT) AS degree "
    "FROM ranks r JOIN cum c ON c.cum >= r.rank "
    "GROUP BY r.q, r.rank ORDER BY r.q"
)

_ORACLES["degree_quantiles"] = _DEGREE_QUANTILES_SQL


def _q_bloom_decontam(spark, sf_dir):
    """Bloom-prefiltered decontamination (m=1024 bits, k=3) with the
    same benchmark split as decontaminate_3; the small filter forces
    measurable false positives, pinning the two-layer semantics."""
    from dachshund_spark.pipeline.decontam import (
        benchmark_ngrams,
        bloom_decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = benchmark_ngrams(docs.where(F.col("doc_id") % 10 == 0), n=3)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    return bloom_decontaminate(corpus, bench, n=3, m=1024, k=3).orderBy("doc_id")


_BLOOM_POS = MD5L.format(x="concat_ws('#', 0, 'bf', gram, j)") + " % 1024"

_BLOOM_DECONTAM_SQL = (
    "WITH lst AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS l FROM documents), "
    "grams AS MATERIALIZED (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS gram "
    "FROM lst, UNNEST(range(1, len(l) - 1)) AS r(i)), "
    "bench AS MATERIALIZED (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0), "
    "corpus AS MATERIALIZED (SELECT doc_id, gram FROM grams WHERE doc_id % 10 <> 0), "
    f"bits AS MATERIALIZED (SELECT DISTINCT {_BLOOM_POS} AS pos "
    "FROM bench, UNNEST(range(1, 4)) AS rj(j)), "
    "probe AS MATERIALIZED (SELECT doc_id, gram FROM ("
    "SELECT c.doc_id, c.gram, COUNT(*) AS s FROM ("
    f"SELECT doc_id, gram, {_BLOOM_POS} AS pos "
    "FROM corpus, UNNEST(range(1, 4)) AS rj(j)) c "
    "JOIN bits b ON c.pos = b.pos GROUP BY c.doc_id, c.gram) WHERE s = 3), "
    "exact AS MATERIALIZED (SELECT c.doc_id, c.gram FROM corpus c "
    "JOIN bench b ON c.gram = b.gram), "
    "pd AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id), "
    "pb AS (SELECT doc_id, COUNT(*) AS nb FROM probe GROUP BY doc_id), "
    "pe AS (SELECT doc_id, COUNT(*) AS ne FROM exact GROUP BY doc_id) "
    "SELECT pd.doc_id, pd.n_grams, "
    "CAST(COALESCE(pb.nb, 0) AS BIGINT) AS n_bloom_hits, "
    "CAST(COALESCE(pe.ne, 0) AS BIGINT) AS n_exact_hits, "
    "CAST(COALESCE(pb.nb, 0) - COALESCE(pe.ne, 0) AS BIGINT) AS n_false_pos "
    "FROM pd LEFT JOIN pb ON pd.doc_id = pb.doc_id "
    "LEFT JOIN pe ON pd.doc_id = pe.doc_id ORDER BY pd.doc_id"
)

_ORACLES["bloom_decontam_3"] = _BLOOM_DECONTAM_SQL


def _q_batch_ppr(spark, sf_dir):
    """Batch personalized PageRank: 4 seeds, one shared edge scan,
    sparse (seed, node) state."""
    from dachshund_spark.algorithms.batch_ppr import batch_personalized_pagerank

    out = batch_personalized_pagerank(
        derived_graph(spark, sf_dir), list(SYBIL_SEEDS), damping=DAMPING,
        iterations=6,
    )
    return out.orderBy("seed", "node_id")


def _batch_ppr_sql(
    seeds: tuple[int, ...] = SYBIL_SEEDS, iters: int = 6, d: float = DAMPING
) -> str:
    seed_list = ", ".join(str(s) for s in seeds)
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        SQL_D,
        "bod AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS od FROM d_edges GROUP BY src)",
        "bdn AS MATERIALIZED (SELECT node_id FROM nodes WHERE node_id NOT IN "
        "(SELECT node_id FROM bod))",
        f"bseeds AS MATERIALIZED (SELECT unnest([{seed_list}]) AS seed)",
        "p0 AS MATERIALIZED (SELECT seed, seed AS node_id, "
        "CAST(1.0 AS DOUBLE) AS rank FROM bseeds)",
    ]
    for i in range(iters):
        parts.append(
            f"bc{i} AS MATERIALIZED (SELECT seed, node_id, {d!r} * m AS m FROM ("
            f"SELECT p.seed, e.dst AS node_id, SUM(p.rank / o.od) AS m "
            f"FROM d_edges e JOIN p{i} p ON e.src = p.node_id "
            "JOIN bod o ON e.src = o.node_id GROUP BY p.seed, e.dst))"
        )
        parts.append(
            f"bg{i} AS MATERIALIZED (SELECT seed, SUM(rank) AS dm FROM p{i} "
            "WHERE node_id IN (SELECT node_id FROM bdn) GROUP BY seed)"
        )
        parts.append(
            f"bj{i} AS MATERIALIZED (SELECT s.seed, s.seed AS node_id, "
            f"{1.0 - d!r} + {d!r} * COALESCE(g.dm, 0.0) AS m "
            f"FROM bseeds s LEFT JOIN bg{i} g ON s.seed = g.seed)"
        )
        parts.append(
            f"p{i + 1} AS MATERIALIZED (SELECT seed, node_id, SUM(m) AS rank "
            f"FROM (SELECT * FROM bc{i} UNION ALL SELECT * FROM bj{i}) "
            "GROUP BY seed, node_id)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT CAST(seed AS BIGINT) AS seed, node_id, ROUND(rank, 8) AS rank "
        f"FROM p{iters} ORDER BY seed, node_id"
    )


_ORACLES["batch_ppr_6"] = _batch_ppr_sql()


# ---------------------------------------------------------------------------
# Louvain-style local moving (algorithms/louvain.py) — synchronized
# best-gain moves on the integer key 2m·e_ic − k_i·vol'_c; even rounds
# restrict moves to labels <= current (anti-swap).  All-integer compare
# so the unroll replays bit-identically.
# ---------------------------------------------------------------------------
LOUVAIN_ROUNDS = 8


def _q_louvain(spark, sf_dir):
    from dachshund_spark.algorithms.louvain import louvain_move

    return louvain_move(derived_graph(spark, sf_dir), rounds=LOUVAIN_ROUNDS)


def _louvain_sql(rounds: int = LOUVAIN_ROUNDS) -> str:
    return (
        "WITH "
        + ", ".join(_louvain_parts(rounds))
        + f" SELECT node_id, label FROM lv{rounds}"
    )


def _louvain_parts(rounds: int = LOUVAIN_ROUNDS) -> list[str]:
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        "lvdeg AS MATERIALIZED (SELECT src AS node_id, CAST(COUNT(*) AS BIGINT) AS k "
        "FROM und GROUP BY src)",
        "lvm AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM und)",
        "lv0 AS MATERIALIZED (SELECT node_id, node_id AS label FROM nodes)",
    ]
    for i in range(1, rounds + 1):
        restrict = "WHERE c.c <= l.label" if (i - 1) % 2 == 0 else ""
        parts += [
            f"le{i} AS MATERIALIZED (SELECT u.src AS node_id, l.label AS c, "
            f"CAST(COUNT(*) AS BIGINT) AS e FROM und u "
            f"JOIN lv{i-1} l ON u.dst = l.node_id GROUP BY u.src, l.label)",
            f"lc{i} AS MATERIALIZED (SELECT node_id, c, MAX(e) AS e FROM ("
            f"SELECT node_id, c, e FROM le{i} UNION ALL "
            f"SELECT node_id, label AS c, CAST(0 AS BIGINT) AS e FROM lv{i-1}"
            f") GROUP BY node_id, c)",
            f"lvol{i} AS MATERIALIZED (SELECT l.label AS c, CAST(SUM(d.k) AS BIGINT) "
            f"AS vol FROM lv{i-1} l JOIN lvdeg d ON l.node_id = d.node_id "
            f"GROUP BY l.label)",
            f"lk{i} AS MATERIALIZED (SELECT c.node_id, c.c, "
            f"m.m2 * c.e - d.k * (v.vol - CASE WHEN c.c = l.label THEN d.k "
            f"ELSE CAST(0 AS BIGINT) END) AS gain_key "
            f"FROM lc{i} c JOIN lv{i-1} l ON c.node_id = l.node_id "
            f"JOIN lvdeg d ON c.node_id = d.node_id "
            f"JOIN lvol{i} v ON v.c = c.c CROSS JOIN lvm m {restrict})",
            f"lv{i} AS MATERIALIZED (SELECT node_id, c AS label FROM ("
            f"SELECT node_id, c, ROW_NUMBER() OVER (PARTITION BY node_id "
            f"ORDER BY gain_key DESC, c ASC) AS rn FROM lk{i}) t WHERE rn = 1)",
        ]
    return parts


_ORACLES["louvain_8"] = _louvain_sql()


def _q_louvain_modularity(spark, sf_dir):
    """Newman modularity of the 8-round Louvain labeling — same
    integer-numerator composition as lpa_modularity, so the two are
    directly comparable (local moving should not score below LPA)."""
    from dachshund_spark.algorithms.louvain import louvain_move
    from dachshund_spark.algorithms.stats import modularity

    g = derived_graph(spark, sf_dir)
    return modularity(g, louvain_move(g, rounds=LOUVAIN_ROUNDS))


def _louvain_modularity_sql(rounds: int = LOUVAIN_ROUNDS) -> str:
    parts = _louvain_parts(rounds) + [
        "lmcanon AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst)",
        "lmdeg AS MATERIALIZED (SELECT src AS node_id, CAST(COUNT(*) AS BIGINT) "
        "AS degree FROM und GROUP BY src)",
        f"lmwin AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS within_edges "
        f"FROM lmcanon c JOIN lv{rounds} a ON c.src = a.node_id "
        f"JOIN lv{rounds} b ON c.dst = b.node_id WHERE a.label = b.label)",
        f"lmcd AS MATERIALIZED (SELECT l.label, CAST(SUM(d.degree) AS DOUBLE) AS d_c "
        f"FROM lmdeg d JOIN lv{rounds} l ON d.node_id = l.node_id GROUP BY l.label)",
        "lmsq AS MATERIALIZED (SELECT SUM(d_c * d_c) AS sum_deg_sq FROM lmcd)",
        "lmm AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM lmcanon)",
    ]
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT within_edges, CAST(sum_deg_sq AS BIGINT) AS sum_deg_sq, "
        "within_edges / m - sum_deg_sq / (4.0 * m * m) AS modularity "
        "FROM lmwin, lmsq, lmm"
    )


_ORACLES["louvain_modularity"] = _louvain_modularity_sql()


# ---------------------------------------------------------------------------
# Reciprocal rank fusion (pipeline/retrieval.py:rrf_fuse) — BM25 top-20
# fused with a raw matched-tf top-20 at k=60; contributions are exact
# floor(1e8/(60+rank)) BIGINTs.
# ---------------------------------------------------------------------------
def _q_rrf(spark, sf_dir):
    from pyspark.sql import Window

    from dachshund_spark.pipeline.retrieval import bm25_topk, rrf_fuse
    from dachshund_spark.pipeline.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    bm = bm25_topk(docs, BM25_TERMS, k=20).withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("score_e8"), F.asc("doc_id"))
        ),
    )
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .where(F.col("token").isin(*sorted(set(BM25_TERMS))))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .orderBy(F.desc("tf"), F.asc("doc_id"))
        .limit(20)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("tf"), F.asc("doc_id"))),
        )
    )
    return rrf_fuse([bm, tf], k=60, topk=10)


_RRF_SQL = (
    "WITH "
    + _BM25_CORE
    + ", bmr AS MATERIALIZED (SELECT doc_id, CAST(ROW_NUMBER() OVER ("
    "ORDER BY score_e8 DESC, doc_id ASC) AS BIGINT) AS rank FROM sbm "
    "ORDER BY score_e8 DESC, doc_id ASC LIMIT 20), "
    "tfr AS MATERIALIZED (SELECT doc_id, CAST(ROW_NUMBER() OVER ("
    "ORDER BY tf DESC, doc_id ASC) AS BIGINT) AS rank FROM ("
    "SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tf FROM post GROUP BY doc_id) "
    "ORDER BY tf DESC, doc_id ASC LIMIT 20), "
    "u AS (SELECT doc_id, CAST(FLOOR(100000000.0 / (60 + rank)) AS BIGINT) AS c "
    "FROM bmr UNION ALL SELECT doc_id, "
    "CAST(FLOOR(100000000.0 / (60 + rank)) AS BIGINT) AS c FROM tfr) "
    "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lists, "
    "CAST(SUM(c) AS BIGINT) AS rrf_e8, "
    "CAST(SUM(c) AS DOUBLE) / 100000000.0 AS rrf FROM u GROUP BY doc_id "
    "ORDER BY rrf_e8 DESC, doc_id ASC LIMIT 10"
)
_ORACLES["rrf_top10"] = _RRF_SQL


# ---------------------------------------------------------------------------
# Per-language length quantiles (algorithms/stats.py:exact_quantiles)
# — the corpus-profiling twin of degree_quantiles; sort-free histogram
# cumsum per language.
# ---------------------------------------------------------------------------
def _q_length_quantiles(spark, sf_dir):
    from dachshund_spark.algorithms.stats import exact_quantiles

    return exact_quantiles(
        load_table(spark, sf_dir, "documents"), "n_chars", group_cols=["lang"]
    ).orderBy("lang", "q")


_LENGTH_QUANTILES_SQL = (
    "WITH nn AS MATERIALIZED (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang), "
    "hist AS MATERIALIZED (SELECT lang, n_chars AS val, COUNT(*) AS cnt "
    "FROM documents GROUP BY lang, n_chars), "
    "cum AS MATERIALIZED (SELECT lang, val, SUM(cnt) OVER ("
    "PARTITION BY lang ORDER BY val ROWS UNBOUNDED PRECEDING) AS cum FROM hist), "
    "qs AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10), "
    "('p99', 99, 100), ('p100', 1, 1)) AS t(q, num, den)), "
    "ranks AS (SELECT lang, q, (num * n + den - 1) // den AS rank "
    "FROM nn CROSS JOIN qs) "
    "SELECT r.lang, r.q, CAST(r.rank AS BIGINT) AS rank, "
    "CAST(MIN(c.val) AS BIGINT) AS n_chars "
    "FROM ranks r JOIN cum c ON c.lang = r.lang AND c.cum >= r.rank "
    "GROUP BY r.lang, r.q, r.rank ORDER BY r.lang, r.q"
)
_ORACLES["length_quantiles"] = _LENGTH_QUANTILES_SQL


# ---------------------------------------------------------------------------
# SemDedup (pipeline/similarity.py:semantic_dedup) — nearest-centroid
# clusters (centroids = vec_id < 8, deterministic) then within-cluster
# near-dup marking at cos >= 0.2; cosines ROUND(,6) on both engines.
# ---------------------------------------------------------------------------
SEMDEDUP_TAU = 0.2
SEMDEDUP_K = 8


def _q_semdedup(spark, sf_dir):
    from dachshund_spark.pipeline.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, emb.where(F.col("vec_id") < SEMDEDUP_K), tau=SEMDEDUP_TAU
    )


_SEMDEDUP_SQL = (
    "WITH se AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
    "FROM embeddings), "
    f"scent AS MATERIALIZED (SELECT vec_id AS cid, v AS cv FROM se WHERE vec_id < {SEMDEDUP_K}), "
    "ssim AS (SELECT se.vec_id, c.cid, "
    "ROUND(list_dot_product(v, cv) / "
    "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6) AS sim "
    "FROM se CROSS JOIN scent c), "
    "sasg AS MATERIALIZED (SELECT vec_id, cid AS cluster_id FROM ("
    "SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id "
    "ORDER BY sim DESC, cid ASC) AS rn FROM ssim) t WHERE rn = 1), "
    "sdup AS MATERIALIZED (SELECT b.vec_id AS vec_id, MIN(a.vec_id) AS dup_of "
    "FROM sasg a JOIN sasg b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id "
    "JOIN se ea ON ea.vec_id = a.vec_id JOIN se eb ON eb.vec_id = b.vec_id "
    "WHERE ROUND(list_dot_product(ea.v, eb.v) / "
    "(sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6) "
    f">= {SEMDEDUP_TAU} GROUP BY b.vec_id) "
    "SELECT s.vec_id, s.cluster_id, d.dup_of, d.dup_of IS NULL AS keep "
    "FROM sasg s LEFT JOIN sdup d ON s.vec_id = d.vec_id"
)
_ORACLES["semdedup"] = _SEMDEDUP_SQL


# ---------------------------------------------------------------------------
# Mixture weights (pipeline/curate.py:mixture_weights) — temperature-0.5
# alpha-sampling over per-source character mass; sqrt is IEEE-exact and
# the normalizer sums 1e8-integerized terms, so weights replay exactly.
# ---------------------------------------------------------------------------
def _q_mixture_weights(spark, sf_dir):
    from dachshund_spark.pipeline.curate import mixture_weights

    return mixture_weights(load_table(spark, sf_dir, "documents"))


_MIXTURE_SQL = (
    "WITH ms AS MATERIALIZED (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass "
    "FROM documents GROUP BY source), "
    "mt AS MATERIALIZED (SELECT source, mass, "
    "CAST(FLOOR(sqrt(CAST(mass AS DOUBLE)) * 100000000.0) AS BIGINT) AS tw FROM ms), "
    "mtot AS (SELECT CAST(SUM(tw) AS BIGINT) AS tot FROM mt) "
    "SELECT source, mass, CAST(tw AS DOUBLE) / CAST(tot AS DOUBLE) AS weight "
    "FROM mt CROSS JOIN mtot"
)
_ORACLES["mixture_weights"] = _MIXTURE_SQL


# ---------------------------------------------------------------------------
# SimHash Hamming-band near-dups (pipeline/dedup.py:simhash_near_dups)
# — 32-bit simhash, 4 bands of 8 bits, candidates post-filtered at
# Hamming <= 12; lossless for d < bands by pigeonhole.
# ---------------------------------------------------------------------------
def _q_simhash_near_dups(spark, sf_dir):
    from dachshund_spark.pipeline.dedup import simhash_near_dups

    return simhash_near_dups(
        load_table(spark, sf_dir, "documents"), bands=4, max_hamming=12
    )


def _simhash_near_dups_sql(
    bits: int = 32, bands: int = 4, max_hamming: int = 12
) -> str:
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    return (
        f"WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), "
        "h AS (SELECT doc_id, " + MD5L.format(x="tok") + " AS h FROM toks), "
        f"bits AS (SELECT unnest(range({bits})) AS bit), "
        "contrib AS (SELECT doc_id, bit, "
        "CASE WHEN (h >> CAST(bit AS INT)) & 1 = 1 THEN 1 ELSE -1 END AS c "
        "FROM h CROSS JOIN bits), "
        "s AS (SELECT doc_id, bit, SUM(c) AS s FROM contrib GROUP BY doc_id, bit), "
        "sig AS MATERIALIZED (SELECT doc_id, CAST(SUM(CASE WHEN s > 0 "
        "THEN (CAST(1 AS BIGINT) << CAST(bit AS INT)) ELSE 0 END) AS BIGINT) AS simhash "
        "FROM s GROUP BY doc_id), "
        f"bnd AS MATERIALIZED (SELECT doc_id, simhash, band, "
        f"(simhash >> CAST({band_bits} * band AS INT)) & {mask} AS band_val "
        f"FROM sig CROSS JOIN (SELECT unnest(range({bands})) AS band) b), "
        "cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash AS sa, "
        "b.simhash AS sb, CAST(COUNT(*) AS BIGINT) AS n_shared_bands "
        "FROM bnd a JOIN bnd b ON a.band = b.band AND a.band_val = b.band_val "
        "AND a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4) "
        "SELECT doc_a, doc_b, n_shared_bands, "
        "CAST(bit_count(xor(sa, sb)) AS INT) AS hamming FROM cand "
        f"WHERE bit_count(xor(sa, sb)) <= {max_hamming}"
    )


_ORACLES["simhash_near_dups"] = _simhash_near_dups_sql()


# ---------------------------------------------------------------------------
# BPE encoding (pipeline/lm.py:bpe_encode_counts) — apply the learned
# merges back to the corpus; per-doc subword counts via one vocab join.
# ---------------------------------------------------------------------------
def _q_bpe_encode(spark, sf_dir):
    from dachshund_spark.pipeline.lm import bpe_encode_counts

    return bpe_encode_counts(load_table(spark, sf_dir, "documents"), n_merges=8)


_ORACLES["bpe_encode_8"] = _bpe_encode_sql(8)


# ---------------------------------------------------------------------------
# Degree-preserving rewiring (algorithms/rewire.py) — synchronized
# Maslov-Sneppen double-edge swaps; the null-model generator for motif
# significance (triangles/butterflies/four-cliques baselines).
# ---------------------------------------------------------------------------
def _q_rewire(spark, sf_dir):
    """2 seeded synchronized swap rounds over the canonical derived
    edge set; degrees and edge count are invariant, the edge set is
    not — the oracle replays every round exactly."""
    from dachshund_spark.algorithms.rewire import degree_preserving_swaps

    return degree_preserving_swaps(
        derived_graph(spark, sf_dir), rounds=2, num_buckets=8, seed=42
    )


def _rewire_sql(rounds: int = 2, nb: int = 8, seed: int = 42) -> str:
    parts = [
        SQL_E,
        SQL_U,
        SQL_CANON,
        "rw0 AS MATERIALIZED (SELECT src, dst FROM canon)",
    ]
    for r in range(1, rounds + 1):
        key = MD5L.format(
            x=f"'{seed}#{r}#' || CAST(src AS VARCHAR) || '#' || CAST(dst AS VARCHAR)"
        )
        parts.append(
            f"rk{r} AS MATERIALIZED (SELECT src, dst, k % {nb} AS bkt, "
            f"ROW_NUMBER() OVER (PARTITION BY k % {nb} ORDER BY k, src, dst) AS rn "
            f"FROM (SELECT src, dst, {key} AS k FROM rw{r-1}))"
        )
        # consecutive (odd, odd+1) pairing within a bucket; self-loop and
        # identical-new-edges degeneracies rejected at proposal time
        parts.append(
            f"pp{r} AS MATERIALIZED (SELECT * FROM ("
            f"SELECT lh.src AS a, lh.dst AS b, rh.src AS c, rh.dst AS d, "
            f"LEAST(lh.src, rh.dst) AS n1s, GREATEST(lh.src, rh.dst) AS n1d, "
            f"LEAST(rh.src, lh.dst) AS n2s, GREATEST(rh.src, lh.dst) AS n2d "
            f"FROM rk{r} lh JOIN rk{r} rh "
            f"ON lh.bkt = rh.bkt AND rh.rn = lh.rn + 1 AND lh.rn % 2 = 1) "
            f"WHERE a <> d AND c <> b AND NOT (n1s = n2s AND n1d = n2d))"
        )
        parts.append(
            f"prop{r} AS MATERIALIZED ("
            f"SELECT a, b, n1s AS ps, n1d AS pd FROM pp{r} "
            f"UNION ALL SELECT a, b, n2s AS ps, n2d AS pd FROM pp{r})"
        )
        # reject pairs whose new edge exists in the current state or is
        # proposed by another pair this round (synchronized collision rule)
        parts.append(
            f"bad{r} AS MATERIALIZED (SELECT DISTINCT a, b FROM prop{r} p "
            f"WHERE EXISTS (SELECT 1 FROM rw{r-1} s WHERE s.src = p.ps AND s.dst = p.pd) "
            f"OR EXISTS (SELECT 1 FROM prop{r} q WHERE q.ps = p.ps AND q.pd = p.pd "
            f"AND NOT (q.a = p.a AND q.b = p.b)))"
        )
        parts.append(
            f"ok{r} AS MATERIALIZED (SELECT * FROM pp{r} p "
            f"WHERE NOT EXISTS (SELECT 1 FROM bad{r} x WHERE x.a = p.a AND x.b = p.b))"
        )
        parts.append(
            f"rw{r} AS MATERIALIZED ("
            f"SELECT s.src, s.dst FROM rw{r-1} s "
            f"WHERE NOT EXISTS (SELECT 1 FROM ok{r} o WHERE "
            f"(o.a = s.src AND o.b = s.dst) OR (o.c = s.src AND o.d = s.dst)) "
            f"UNION ALL SELECT n1s AS src, n1d AS dst FROM ok{r} "
            f"UNION ALL SELECT n2s AS src, n2d AS dst FROM ok{r})"
        )
    return "WITH " + ", ".join(parts) + f" SELECT src, dst FROM rw{rounds}"


_ORACLES["rewire_2"] = _rewire_sql()


def _q_motif_significance(spark, sf_dir):
    """Triangle excess over the degree-preserving null (2 swap rounds,
    same seed as rewire_2): the motif-significance readout — any excess
    over 1.0 is structure beyond the degree sequence."""
    from dachshund_spark.algorithms.rewire import motif_significance

    return motif_significance(
        derived_graph(spark, sf_dir), rounds=2, num_buckets=8, seed=42
    )


def _motif_sig_sql(rounds: int = 2, nb: int = 8, seed: int = 42) -> str:
    body = _rewire_sql(rounds, nb, seed)
    with_part = body[len("WITH ") : body.rindex(" SELECT src, dst FROM")]
    return (
        "WITH " + with_part + ", "
        "obs AS MATERIALIZED (SELECT COUNT(*) AS c FROM canon a "
        "JOIN canon b ON a.dst = b.src "
        "JOIN canon c2 ON c2.src = a.src AND c2.dst = b.dst), "
        f"nl AS MATERIALIZED (SELECT COUNT(*) AS c FROM rw{rounds} a "
        f"JOIN rw{rounds} b ON a.dst = b.src "
        f"JOIN rw{rounds} c2 ON c2.src = a.src AND c2.dst = b.dst) "
        "SELECT CAST(obs.c AS BIGINT) AS observed_triangles, "
        "CAST(nl.c AS BIGINT) AS null_triangles, "
        "CASE WHEN nl.c > 0 THEN CAST(obs.c AS DOUBLE) / CAST(nl.c AS DOUBLE) END "
        "AS excess_ratio FROM obs, nl"
    )


_ORACLES["motif_significance_2"] = _motif_sig_sql()


# ---------------------------------------------------------------------------
# SCAN structural clustering (algorithms/scan.py) — ε as a rational,
# σ ≥ ε cross-multiplied in integer space; clusters = hash-min CC over
# core ε-edges, replayed round-exactly.
# ---------------------------------------------------------------------------
def _q_scan(spark, sf_dir):
    """SCAN (ε=1/2, μ=3) per-node labels on the derived graph:
    cluster (smallest core id, NULL for hubs/outliers) + role."""
    from dachshund_spark.algorithms.scan import scan_clusters

    return scan_clusters(derived_graph(spark, sf_dir), eps_num=1, eps_den=2, mu=3)


def _scan_sql(mu: int = 3, iters: int = 12) -> str:
    parts = [
        SQL_E,
        SQL_U,
        SQL_CANON,
        SQL_N,
        SQL_DEG,
        SQL_TRI,
        "sup AS MATERIALIZED (SELECT s, d, COUNT(*) AS t FROM ("
        "SELECT LEAST(u, v) AS s, GREATEST(u, v) AS d FROM tri "
        "UNION ALL SELECT LEAST(u, w), GREATEST(u, w) FROM tri "
        "UNION ALL SELECT LEAST(v, w), GREATEST(v, w) FROM tri) GROUP BY s, d)",
        "esupp AS MATERIALIZED (SELECT c.src, c.dst, COALESCE(s.t, 0) AS t "
        "FROM canon c LEFT JOIN sup s ON s.s = c.src AND s.d = c.dst)",
        # σ ≥ 1/2  ⟺  ((t+2)·2)² ≥ (du+1)(dv+1), exact in HUGEINT
        "eps AS MATERIALIZED (SELECT e.src, e.dst FROM esupp e "
        "JOIN deg a ON a.node_id = e.src JOIN deg b ON b.node_id = e.dst "
        "WHERE CAST((e.t + 2) * 2 AS HUGEINT) * CAST((e.t + 2) * 2 AS HUGEINT) "
        ">= CAST(a.degree + 1 AS HUGEINT) * CAST(b.degree + 1 AS HUGEINT))",
        "epssym AS MATERIALIZED (SELECT src, dst FROM eps "
        "UNION ALL SELECT dst AS src, src AS dst FROM eps)",
        "ecnt AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS k "
        "FROM epssym GROUP BY src)",
        f"core AS MATERIALIZED (SELECT n.node_id FROM nodes n "
        f"LEFT JOIN ecnt c ON n.node_id = c.node_id "
        f"WHERE COALESCE(c.k, 0) + 1 >= {mu})",
        "cesym AS MATERIALIZED (SELECT s.src, s.dst FROM epssym s "
        "JOIN core a ON s.src = a.node_id JOIN core b ON s.dst = b.node_id)",
        "s0 AS MATERIALIZED (SELECT node_id, node_id AS label FROM core)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT n.node_id, "
            f"CASE WHEN m.minl IS NULL OR n.label <= m.minl THEN n.label ELSE m.minl END AS label "
            f"FROM s{i-1} n LEFT JOIN ("
            f"SELECT u.dst AS node_id, MIN(l.label) AS minl "
            f"FROM cesym u JOIN s{i-1} l ON u.src = l.node_id GROUP BY u.dst) m "
            f"ON n.node_id = m.node_id)"
        )
    parts += [
        f"comp AS MATERIALIZED (SELECT node_id, label AS cluster FROM s{iters})",
        "border AS MATERIALIZED (SELECT s.src AS node_id, MIN(c.cluster) AS cluster "
        "FROM epssym s JOIN comp c ON s.dst = c.node_id "
        "WHERE s.src NOT IN (SELECT node_id FROM core) GROUP BY s.src)",
        "assigned AS MATERIALIZED ("
        "SELECT node_id, cluster, 'core' AS role FROM comp "
        "UNION ALL SELECT node_id, cluster, 'border' AS role FROM border)",
        "nbrc AS MATERIALIZED (SELECT u.src AS node_id, "
        "COUNT(DISTINCT a.cluster) AS nc FROM und u "
        "JOIN assigned a ON u.dst = a.node_id GROUP BY u.src)",
    ]
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT node_id, cluster, role FROM assigned "
        "UNION ALL "
        "SELECT n.node_id, CAST(NULL AS BIGINT) AS cluster, "
        "CASE WHEN COALESCE(c.nc, 0) >= 2 THEN 'hub' ELSE 'outlier' END AS role "
        "FROM nodes n LEFT JOIN nbrc c ON n.node_id = c.node_id "
        "WHERE n.node_id NOT IN (SELECT node_id FROM assigned)"
    )


_ORACLES["scan_clusters"] = _scan_sql()


# ---------------------------------------------------------------------------
# L-Spar local-similarity sparsification (algorithms/sparsify.py)
# ---------------------------------------------------------------------------
def _q_lspar(spark, sf_dir):
    """Top-⌈sqrt(d)⌉-by-Jaccard edges per node (kept if either endpoint
    keeps them) — the community-preserving sparsifier pre-pass."""
    from dachshund_spark.algorithms.sparsify import lspar_sparsify

    return lspar_sparsify(derived_graph(spark, sf_dir))


_LSPAR_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_CANON}, {SQL_N}, {SQL_DEG}, {SQL_TRI}, "
    "sup AS MATERIALIZED (SELECT s, d, COUNT(*) AS t FROM ("
    "SELECT LEAST(u, v) AS s, GREATEST(u, v) AS d FROM tri "
    "UNION ALL SELECT LEAST(u, w), GREATEST(u, w) FROM tri "
    "UNION ALL SELECT LEAST(v, w), GREATEST(v, w) FROM tri) GROUP BY s, d), "
    "esupp AS MATERIALIZED (SELECT c.src, c.dst, COALESCE(s.t, 0) AS t "
    "FROM canon c LEFT JOIN sup s ON s.s = c.src AND s.d = c.dst), "
    "ej AS MATERIALIZED (SELECT e.src, e.dst, a.degree AS du, b.degree AS dv, "
    "(e.t * 1000000000) // (a.degree + b.degree - e.t) AS k "
    "FROM esupp e JOIN deg a ON a.node_id = e.src JOIN deg b ON b.node_id = e.dst), "
    "bo AS MATERIALIZED ("
    "SELECT src AS node, dst AS nbr, src, dst, k, du AS dg FROM ej "
    "UNION ALL SELECT dst AS node, src AS nbr, src, dst, k, dv AS dg FROM ej), "
    "rk AS MATERIALIZED (SELECT *, ROW_NUMBER() OVER ("
    "PARTITION BY node ORDER BY k DESC, nbr ASC) AS rn FROM bo) "
    "SELECT DISTINCT src, dst FROM rk "
    "WHERE rn <= GREATEST(CAST(CEIL(SQRT(CAST(dg AS DOUBLE))) AS BIGINT), 1)"
)

_ORACLES["lspar_sparsify"] = _LSPAR_SQL


# ---------------------------------------------------------------------------
# Integer-exact Lloyd k-means (pipeline/clustering.py) — quantized grid,
# truncating-integer centroid means, full-trajectory SQL replay.
# ---------------------------------------------------------------------------
def _q_kmeans(spark, sf_dir):
    """3 Lloyd iterations, k=4, clusters labeled by seed vec_id; exact
    integer dist2 to the winning centroid at the last assignment."""
    from dachshund_spark.pipeline.clustering import kmeans_assignments

    return kmeans_assignments(
        load_table(spark, sf_dir, "embeddings"), k=4, iterations=3
    )


def _kmeans_parts(
    k: int = 4, iters: int = 3, scale: int = 1_000_000
) -> "list[str]":
    parts = [
        f"q AS MATERIALIZED (SELECT vec_id, d, "
        f"CAST(ROUND(CAST(v AS DOUBLE) * {scale}, 0) AS BIGINT) AS q FROM ("
        "SELECT vec_id, generate_subscripts(embedding, 1) AS d, "
        "unnest(embedding) AS v FROM embeddings))",
        f"c0 AS MATERIALIZED (SELECT q.vec_id AS cl, q.d, q.q AS c FROM q "
        f"WHERE q.vec_id IN (SELECT vec_id FROM "
        f"(SELECT DISTINCT vec_id FROM embeddings) ORDER BY vec_id LIMIT {k}))",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT p.vec_id, c.cl, "
            f"CAST(SUM((p.q - c.c) * (p.q - c.c)) AS BIGINT) AS dist2 "
            f"FROM q p JOIN c{i-1} c ON p.d = c.d GROUP BY p.vec_id, c.cl)"
        )
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT vec_id, cl, dist2 FROM ("
            f"SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id "
            f"ORDER BY dist2, cl) AS rn FROM a{i}) WHERE rn = 1)"
        )
        if i < iters:
            parts.append(
                f"c{i} AS MATERIALIZED (SELECT o.cl, o.d, "
                f"COALESCE(n.nc, o.c) AS c FROM c{i-1} o LEFT JOIN ("
                f"SELECT b.cl, p.d, CAST(SUM(p.q) // COUNT(*) AS BIGINT) AS nc "
                f"FROM b{i} b JOIN q p ON p.vec_id = b.vec_id "
                f"GROUP BY b.cl, p.d) n ON o.cl = n.cl AND o.d = n.d)"
            )
    return parts


def _kmeans_sql(k: int = 4, iters: int = 3, scale: int = 1_000_000) -> str:
    parts = _kmeans_parts(k, iters, scale)
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT vec_id, cl AS cluster, dist2 FROM b{iters}"
    )


_ORACLES["kmeans_4_3"] = _kmeans_sql()


def _q_pq_adc(spark, sf_dir):
    """Product-quantization ANN (Jégou et al. 2011): m=4 subspaces ×
    k=4 codes trained with the integer-exact Lloyd (one distributed job
    trains all subspaces — subspace is a grouping key), then ADC top-5
    for the first 4 query vectors via a broadcast (query, s, code) →
    partial-dist2 lookup table.  Exact BIGINTs end-to-end."""
    from dachshund_spark.pipeline.clustering import pq_adc_topk

    return pq_adc_topk(
        load_table(spark, sf_dir, "embeddings"),
        m=4,
        k=4,
        iterations=2,
        n_queries=4,
        topk=5,
    )


def _pq_sql(
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    nq: int = 4,
    topk: int = 5,
    scale: int = 1_000_000,
    sub: int = 16,
) -> str:
    parts = [
        f"qp AS MATERIALIZED (SELECT vec_id, d, (d - 1) // {sub} AS s, "
        f"CAST(ROUND(CAST(v AS DOUBLE) * {scale}, 0) AS BIGINT) AS q FROM ("
        "SELECT vec_id, generate_subscripts(embedding, 1) AS d, "
        "unnest(embedding) AS v FROM embeddings))",
        f"sd AS MATERIALIZED (SELECT vec_id, "
        f"ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cl FROM "
        f"(SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}))",
        "c0 AS MATERIALIZED (SELECT p.s, sd.cl, p.d, p.q AS c "
        "FROM qp p JOIN sd ON p.vec_id = sd.vec_id)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT p.vec_id, p.s, c.cl, "
            f"CAST(SUM((p.q - c.c) * (p.q - c.c)) AS BIGINT) AS dist2 "
            f"FROM qp p JOIN c{i-1} c ON p.s = c.s AND p.d = c.d "
            f"GROUP BY p.vec_id, p.s, c.cl)"
        )
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT vec_id, s, cl, dist2 FROM ("
            f"SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s "
            f"ORDER BY dist2, cl) AS rn FROM a{i}) WHERE rn = 1)"
        )
        if i < iters:
            parts.append(
                f"c{i} AS MATERIALIZED (SELECT o.s, o.cl, o.d, "
                f"COALESCE(n.nc, o.c) AS c FROM c{i-1} o LEFT JOIN ("
                f"SELECT b.s, b.cl, p.d, CAST(SUM(p.q) // COUNT(*) AS BIGINT) AS nc "
                f"FROM b{i} b JOIN qp p ON p.vec_id = b.vec_id AND p.s = b.s "
                f"GROUP BY b.s, b.cl, p.d) n "
                f"ON o.s = n.s AND o.cl = n.cl AND o.d = n.d)"
            )
    parts.append(
        f"qset AS MATERIALIZED (SELECT DISTINCT vec_id FROM embeddings "
        f"ORDER BY vec_id LIMIT {nq})"
    )
    parts.append(
        f"lut AS MATERIALIZED (SELECT p.vec_id AS query_id, p.s, c.cl, "
        f"CAST(SUM((p.q - c.c) * (p.q - c.c)) AS BIGINT) AS pd2 "
        f"FROM qp p JOIN qset ON p.vec_id = qset.vec_id "
        f"JOIN c{iters - 1} c ON p.s = c.s AND p.d = c.d "
        f"GROUP BY p.vec_id, p.s, c.cl)"
    )
    parts.append(
        f"adc AS MATERIALIZED (SELECT l.query_id, b.vec_id, "
        f"CAST(SUM(l.pd2) AS BIGINT) AS adc "
        f"FROM b{iters} b JOIN lut l ON b.s = l.s AND b.cl = l.cl "
        f"WHERE l.query_id <> b.vec_id GROUP BY l.query_id, b.vec_id)"
    )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id, adc FROM ("
        f"SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        f"ORDER BY adc, vec_id) AS rn FROM adc) WHERE rn <= {topk}"
    )


_ORACLES["pq_adc_top5"] = _pq_sql()


# ---------------------------------------------------------------------------
# ReFeX recursive structural features (algorithms/roles.py)
# ---------------------------------------------------------------------------
def _q_refex(spark, sf_dir):
    """Two rounds of neighbor-sum aggregation over (degree, triangles)
    — the RolX feature table, integer-exact (cast to long at fixture
    scale)."""
    from dachshund_spark.algorithms.roles import refex_features

    out = refex_features(derived_graph(spark, sf_dir), rounds=2)
    cols = [
        "degree",
        "triangles",
        "s1_degree",
        "s1_triangles",
        "s2_degree",
        "s2_triangles",
    ]
    return out.select(
        "node_id", *[F.col(c).cast("long").alias(c) for c in cols]
    )


_REFEX_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_CANON}, {SQL_N}, {SQL_DEG}, {SQL_TRI}, {SQL_TRIC}, "
    "f0 AS MATERIALIZED (SELECT d.node_id, d.degree, t.triangles "
    "FROM deg d JOIN tric t ON d.node_id = t.node_id), "
    "g1 AS MATERIALIZED (SELECT u.src AS node_id, SUM(f.degree) AS s1_degree, "
    "SUM(f.triangles) AS s1_triangles FROM und u JOIN f0 f ON u.dst = f.node_id "
    "GROUP BY u.src), "
    "f1 AS MATERIALIZED (SELECT f0.node_id, f0.degree, f0.triangles, "
    "COALESCE(g1.s1_degree, 0) AS s1_degree, "
    "COALESCE(g1.s1_triangles, 0) AS s1_triangles "
    "FROM f0 LEFT JOIN g1 ON f0.node_id = g1.node_id), "
    "g2 AS MATERIALIZED (SELECT u.src AS node_id, SUM(f.s1_degree) AS s2_degree, "
    "SUM(f.s1_triangles) AS s2_triangles FROM und u JOIN f1 f ON u.dst = f.node_id "
    "GROUP BY u.src) "
    "SELECT f1.node_id, CAST(f1.degree AS BIGINT) AS degree, "
    "CAST(f1.triangles AS BIGINT) AS triangles, "
    "CAST(f1.s1_degree AS BIGINT) AS s1_degree, "
    "CAST(f1.s1_triangles AS BIGINT) AS s1_triangles, "
    "CAST(COALESCE(g2.s2_degree, 0) AS BIGINT) AS s2_degree, "
    "CAST(COALESCE(g2.s2_triangles, 0) AS BIGINT) AS s2_triangles "
    "FROM f1 LEFT JOIN g2 ON f1.node_id = g2.node_id"
)

_ORACLES["refex_2"] = _REFEX_SQL


# ---------------------------------------------------------------------------
# Weisfeiler-Lehman graph fingerprints (algorithms/wl.py) — multi-graph
# frame: 4 residue-class subgraphs of the derived graph, hashed in one job.
# ---------------------------------------------------------------------------
def _q_wl_hash(spark, sf_dir):
    """3-round 1-WL fingerprint per subgraph (graph_id = src % 4,
    same-residue edges): structural dedup key for graph batches."""
    from dachshund_spark.algorithms.wl import wl_graph_hash

    e = derived_graph(spark, sf_dir).edges
    me = e.where(F.col("src") % 4 == F.col("dst") % 4).select(
        (F.col("src") % 4).alias("graph_id"), "src", "dst"
    )
    return wl_graph_hash(LinkGraph(me), rounds=3)


def _wl_sql(rounds: int = 3) -> str:
    mod = 1 << 40
    parts = [
        SQL_E,
        "me AS MATERIALIZED (SELECT src % 4 AS graph_id, src, dst "
        "FROM edges_raw WHERE src % 4 = dst % 4)",
        "mund AS MATERIALIZED (SELECT DISTINCT graph_id, src, dst FROM ("
        "SELECT graph_id, src, dst FROM me "
        "UNION ALL SELECT graph_id, dst AS src, src AS dst FROM me))",
        "mdeg AS MATERIALIZED (SELECT graph_id, src AS node_id, COUNT(*) AS degree "
        "FROM mund GROUP BY graph_id, src)",
        "w0 AS MATERIALIZED (SELECT graph_id, node_id, "
        + MD5L.format(x="'d#' || CAST(degree AS VARCHAR)")
        + " AS wl FROM mdeg)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"n{r} AS MATERIALIZED (SELECT u.graph_id, u.src AS node_id, "
            f"SUM(l.wl % {mod}) AS ns FROM mund u "
            f"JOIN w{r-1} l ON u.graph_id = l.graph_id AND u.dst = l.node_id "
            f"GROUP BY u.graph_id, u.src)"
        )
        parts.append(
            f"w{r} AS MATERIALIZED (SELECT n.graph_id, n.node_id, "
            + MD5L.format(
                x="CAST(l.wl AS VARCHAR) || '#' || CAST(n.ns AS VARCHAR)"
            )
            + f" AS wl FROM n{r} n JOIN w{r-1} l "
            f"ON n.graph_id = l.graph_id AND n.node_id = l.node_id)"
        )
    return (
        "WITH " + ", ".join(parts) + ", "
        f"na AS MATERIALIZED (SELECT graph_id, COUNT(*) AS n_nodes, "
        f"SUM(wl % {mod}) AS wl_hash FROM w{rounds} GROUP BY graph_id), "
        "ea AS MATERIALIZED (SELECT graph_id, COUNT(*) AS n_edges FROM "
        "(SELECT DISTINCT graph_id, src, dst FROM mund WHERE src < dst) "
        "GROUP BY graph_id) "
        "SELECT na.graph_id, CAST(na.n_nodes AS BIGINT) AS n_nodes, "
        "CAST(ea.n_edges AS BIGINT) AS n_edges, "
        "CAST(na.wl_hash AS BIGINT) AS wl_hash "
        "FROM na JOIN ea ON na.graph_id = ea.graph_id"
    )


_ORACLES["wl_hash_3"] = _wl_sql()


# ---------------------------------------------------------------------------
# ACL PPR sweep cut (algorithms/sweep.py) — integer push + integer
# conductance argmin, replayed superstep-exactly.
# ---------------------------------------------------------------------------
def _q_sweep_cut(spark, sf_dir):
    """Best-conductance local community around node 0 (6 push rounds,
    top-64 sweep)."""
    from dachshund_spark.algorithms.sweep import sweep_cut

    return sweep_cut(derived_graph(spark, sf_dir), seed=0, iterations=6, top=64)


def _sweep_sql(
    seed: int = 0, iters: int = 6, top: int = 64, scale: int = 10**12
) -> str:
    teleport = scale * 3 // 20
    parts = [
        SQL_E,
        SQL_D,
        SQL_U,
        SQL_CANON,
        SQL_N,
        SQL_DEG,
        "odt AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM d_edges GROUP BY src)",
        "we AS MATERIALIZED (SELECT e.src, e.dst, o.od FROM d_edges e "
        "JOIN odt o ON e.src = o.src)",
        f"p0 AS MATERIALIZED (SELECT CAST({seed} AS BIGINT) AS node_id, "
        f"CAST({scale} AS BIGINT) AS r)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT node_id, CAST(SUM(r) AS BIGINT) AS r FROM ("
            f"SELECT e.dst AS node_id, (17 * p.r) // (20 * e.od) AS r "
            f"FROM we e JOIN p{i-1} p ON e.src = p.node_id "
            f"UNION ALL SELECT CAST({seed} AS BIGINT), CAST({teleport} AS BIGINT)) "
            f"GROUP BY node_id)"
        )
    parts += [
        f"kdt AS MATERIALIZED (SELECT p.node_id, (p.r * 1000000) // d.degree AS k, "
        f"d.degree FROM p{iters} p JOIN deg d ON d.node_id = p.node_id "
        f"WHERE p.r > 0)",
        f"ranked AS MATERIALIZED (SELECT node_id, degree, rnk FROM ("
        f"SELECT node_id, degree, ROW_NUMBER() OVER (ORDER BY k DESC, node_id ASC) "
        f"AS rnk FROM kdt) WHERE rnk <= {top})",
        "tm AS MATERIALIZED (SELECT SUM(degree) AS two_m FROM deg)",
        "itl AS MATERIALIZED (SELECT GREATEST(a.rnk, b.rnk) AS rnk, COUNT(*) AS ni "
        "FROM canon c JOIN ranked a ON c.src = a.node_id "
        "JOIN ranked b ON c.dst = b.node_id GROUP BY GREATEST(a.rnk, b.rnk))",
        "swp AS MATERIALIZED (SELECT r.rnk, "
        "SUM(r.degree) OVER (ORDER BY r.rnk) AS vol, "
        "SUM(COALESCE(i.ni, 0)) OVER (ORDER BY r.rnk) AS intc "
        "FROM ranked r LEFT JOIN itl i ON r.rnk = i.rnk)",
        "phv AS MATERIALIZED (SELECT s.rnk, (s.vol - 2 * s.intc) AS cut, s.vol, "
        "LEAST(s.vol, t.two_m - s.vol) AS mv FROM swp s, tm t)",
        "best AS MATERIALIZED (SELECT rnk AS sweep_size, cut, vol FROM ("
        "SELECT rnk, cut, vol, (cut * 1000000000) // mv AS phik FROM phv "
        "WHERE mv > 0) ORDER BY phik ASC, rnk ASC LIMIT 1)",
    ]
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT r.node_id, CAST(r.rnk AS INT) AS rnk, "
        "CAST(b.sweep_size AS INT) AS sweep_size, "
        "CAST(b.cut AS BIGINT) AS cut, CAST(b.vol AS BIGINT) AS vol "
        "FROM ranked r, best b WHERE r.rnk <= b.sweep_size"
    )


_ORACLES["sweep_cut_0"] = _sweep_sql()


# ---------------------------------------------------------------------------
# Crawl budget apportionment (pipeline/curate.py) + adjacency
# compressibility profile (algorithms/stats.py)
# ---------------------------------------------------------------------------
def _q_crawl_budget(spark, sf_dir):
    """Hamilton largest-remainder split of 10k fetch slots across hosts
    proportional to inbound-link counts (hosts = node_id % 32 synthetic
    urls, as host_graph)."""
    from dachshund_spark.pages.extract import host_edges
    from dachshund_spark.pipeline.curate import largest_remainder_allocation

    g = derived_graph(spark, sf_dir)
    urls = g.nodes().select(
        "node_id",
        F.concat(
            F.lit("https://h"),
            F.pmod(F.col("node_id"), F.lit(32)).cast("string"),
            F.lit(".example.com/p/"),
            F.col("node_id").cast("string"),
        ).alias("url"),
    )
    he = host_edges(g.edges.distinct(), urls)
    wt = he.groupBy(F.col("dst_host").alias("key")).agg(
        F.sum("n_links").alias("weight")
    )
    return largest_remainder_allocation(wt, total=10_000)


_HN_CTE = (
    "hn AS MATERIALIZED (SELECT node_id, lower(regexp_extract("
    "'https://h' || CAST(node_id % 32 AS VARCHAR) || '.example.com/p/' || CAST(node_id AS VARCHAR), "
    "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)) AS host FROM "
    "(SELECT DISTINCT src AS node_id FROM edges_raw "
    "UNION SELECT DISTINCT dst FROM edges_raw))"
)

_CRAWL_BUDGET_SQL = (
    f"WITH {SQL_E}, {SQL_D}, {_HN_CTE}, "
    "wt AS MATERIALIZED (SELECT d.host AS key, CAST(COUNT(*) AS BIGINT) AS weight "
    "FROM d_edges e JOIN hn s ON e.src = s.node_id JOIN hn d ON e.dst = d.node_id "
    "GROUP BY d.host), "
    "tot AS MATERIALIZED (SELECT SUM(weight) AS w FROM wt), "
    "base AS MATERIALIZED (SELECT key, weight, "
    "(10000 * weight) // t.w AS b, (10000 * weight) % t.w AS rem FROM wt, tot t), "
    "lo AS MATERIALIZED (SELECT 10000 - SUM(b) AS l FROM base), "
    "rk AS MATERIALIZED (SELECT key, ROW_NUMBER() OVER "
    "(ORDER BY rem DESC, key ASC) AS rn FROM base) "
    "SELECT b.key, b.weight, CAST(b.b + CASE WHEN r.rn <= (SELECT l FROM lo) "
    "THEN 1 ELSE 0 END AS BIGINT) AS alloc "
    "FROM base b JOIN rk r ON b.key = r.key"
)

_ORACLES["crawl_budget_10000"] = _CRAWL_BUDGET_SQL


def _q_gap_bits(spark, sf_dir):
    """Exact γ-payload bit cost of gap-encoding each node's sorted
    successor list (BV-graph storage planning)."""
    from dachshund_spark.algorithms.stats import gap_encoding_stats

    return gap_encoding_stats(derived_graph(spark, sf_dir).edges)


_GAP_BITS_SQL = (
    f"WITH {SQL_E}, {SQL_D}, "
    "gaps AS MATERIALIZED (SELECT src, CASE WHEN "
    "LAG(dst) OVER (PARTITION BY src ORDER BY dst) IS NULL THEN dst + 1 "
    "ELSE dst - LAG(dst) OVER (PARTITION BY src ORDER BY dst) END AS gap "
    "FROM d_edges) "
    "SELECT src AS node_id, CAST(COUNT(*) AS BIGINT) AS n_out, "
    "CAST(SUM(LENGTH(bin(gap))) AS BIGINT) AS gap_bits FROM gaps GROUP BY src"
)

_ORACLES["gap_bits"] = _GAP_BITS_SQL


# ---------------------------------------------------------------------------
# Temporal earliest-arrival reachability (algorithms/temporal.py)
# ---------------------------------------------------------------------------
def _q_temporal_reach(spark, sf_dir):
    """Time-respecting earliest arrivals from node 0 over the derived
    contact graph with deterministic edge times (7·src+13·dst) % 64;
    10 fixed relaxation rounds."""
    from dachshund_spark.algorithms.temporal import temporal_earliest_arrival

    e = (
        derived_graph(spark, sf_dir)
        .edges.distinct()
        .withColumn("t", F.pmod(F.col("src") * 7 + F.col("dst") * 13, F.lit(64)))
    )
    return temporal_earliest_arrival(e, seed=0, start=0, iterations=10)


def _temporal_reach_sql(seed: int = 0, iters: int = 10) -> str:
    parts = [
        SQL_E,
        SQL_D,
        "te AS MATERIALIZED (SELECT src, dst, "
        "(src * 7 + dst * 13) % 64 AS t FROM d_edges)",
        f"a0 AS MATERIALIZED (SELECT CAST({seed} AS BIGINT) AS node_id, "
        f"CAST(0 AS BIGINT) AS arr)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT node_id, CAST(MIN(arr) AS BIGINT) AS arr FROM ("
            f"SELECT node_id, arr FROM a{i-1} "
            f"UNION ALL SELECT e.dst AS node_id, e.t AS arr "
            f"FROM te e JOIN a{i-1} p ON e.src = p.node_id WHERE e.t >= p.arr) "
            f"GROUP BY node_id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, arr AS arrival FROM a{iters}"
    )


_ORACLES["temporal_reach_10"] = _temporal_reach_sql()


# ---------------------------------------------------------------------------
# Matched-endpoints vertex cover + bond-percolation robustness curve
# ---------------------------------------------------------------------------
def _q_vertex_cover(spark, sf_dir):
    """2-approx vertex cover = both endpoints of the greedy maximal
    matching (matching_greedy's trajectory, so the same oracle unroll)."""
    from dachshund_spark.algorithms.matching import vertex_cover_2approx

    return vertex_cover_2approx(derived_graph(spark, sf_dir))


def _vertex_cover_sql() -> str:
    parts, union = _matching_parts(12, 0)
    return (
        "WITH " + ", ".join(parts)
        + ", mm AS MATERIALIZED (SELECT u, v FROM (" + union + ")) "
        "SELECT u AS node_id, v AS partner FROM mm "
        "UNION ALL SELECT v AS node_id, u AS partner FROM mm"
    )


_ORACLES["vertex_cover_2"] = _vertex_cover_sql()


def _q_percolation(spark, sf_dir):
    """Random-failure robustness: coupled bond percolation at
    p ∈ {25, 50, 75}%, largest component after 24 hash-min rounds."""
    from dachshund_spark.algorithms.stats import bond_percolation

    return bond_percolation(
        derived_graph(spark, sf_dir), thresholds=(25, 50, 75), seed=11
    )


def _percolation_sql(
    thresholds: tuple = (25, 50, 75), seed: int = 11, rounds: int = 24
) -> str:
    hcte = MD5L.format(
        x=f"'{seed}#' || CAST(src AS VARCHAR) || '#' || CAST(dst AS VARCHAR)"
    )
    parts = [
        SQL_E,
        SQL_U,
        SQL_CANON,
        f"ph AS MATERIALIZED (SELECT src, dst, {hcte} % 100 AS h FROM canon)",
    ]
    sels = []
    for p in thresholds:
        parts.append(
            f"k{p} AS MATERIALIZED (SELECT src, dst FROM ph WHERE h < {p})"
        )
        parts.append(
            f"s{p} AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
            f"SELECT src, dst FROM k{p} "
            f"UNION ALL SELECT dst AS src, src AS dst FROM k{p}))"
        )
        parts.append(
            f"q{p}0 AS MATERIALIZED (SELECT DISTINCT src AS node_id, "
            f"src AS label FROM s{p})"
        )
        for i in range(1, rounds + 1):
            parts.append(
                f"q{p}{i} AS MATERIALIZED (SELECT n.node_id, "
                f"CASE WHEN m.minl IS NULL OR n.label <= m.minl THEN n.label ELSE m.minl END AS label "
                f"FROM q{p}{i-1} n LEFT JOIN ("
                f"SELECT u.dst AS node_id, MIN(l.label) AS minl "
                f"FROM s{p} u JOIN q{p}{i-1} l ON u.src = l.node_id GROUP BY u.dst) m "
                f"ON n.node_id = m.node_id)"
            )
        sels.append(
            f"SELECT {p} AS p_pct, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM k{p}) AS n_edges, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM q{p}{rounds}) AS n_nodes, "
            f"(SELECT CAST(MAX(c) AS BIGINT) FROM ("
            f"SELECT COUNT(*) AS c FROM q{p}{rounds} GROUP BY label)) AS largest_cc"
        )
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(sels)


_ORACLES["percolation_3"] = _percolation_sql()


def _q_articulation(spark, sf_dir):
    """Cut vertices of the 64-node induced subgraph: all |V| vertex
    deletions as ONE multi-graph hash-min CC fixpoint (graph_id =
    deleted vertex + intact-graph sentinel), 24 rounds both engines."""
    from dachshund_spark.algorithms.stats import articulation_points

    e = derived_graph(spark, sf_dir).edges
    sub = LinkGraph(e.where((F.col("src") < 64) & (F.col("dst") < 64)))
    return articulation_points(sub, cc_rounds=24)


def _articulation_sql(rounds: int = 24) -> str:
    parts = [
        SQL_E,
        SQL_U,
        "su AS MATERIALIZED (SELECT src, dst FROM und WHERE src < 64 AND dst < 64)",
        "xs AS MATERIALIZED (SELECT DISTINCT src AS x FROM su UNION SELECT -1)",
        "ex AS MATERIALIZED (SELECT x.x, s.src, s.dst FROM xs x JOIN su s "
        "ON s.src <> x.x AND s.dst <> x.x)",
        "a0 AS MATERIALIZED (SELECT DISTINCT x, src AS node_id, src AS label FROM ex)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT n.x, n.node_id, "
            "CASE WHEN m.minl IS NULL OR n.label <= m.minl THEN n.label "
            "ELSE m.minl END AS label "
            f"FROM a{i-1} n LEFT JOIN ("
            "SELECT u.x, u.dst AS node_id, MIN(l.label) AS minl "
            f"FROM ex u JOIN a{i-1} l ON u.x = l.x AND u.src = l.node_id "
            "GROUP BY u.x, u.dst) m "
            "ON n.x = m.x AND n.node_id = m.node_id)"
        )
    parts.append(
        f"nc AS MATERIALIZED (SELECT x, CAST(COUNT(DISTINCT label) AS BIGINT) "
        f"AS n_components FROM a{rounds} GROUP BY x)"
    )
    parts.append(
        "nb AS MATERIALIZED (SELECT src, COUNT(DISTINCT dst) AS nd, "
        "MIN(dst) AS onlyn FROM su GROUP BY src)"
    )
    parts.append(
        "iso AS MATERIALIZED (SELECT onlyn AS x, CAST(COUNT(*) AS BIGINT) "
        "AS n_isolated FROM nb WHERE nd = 1 GROUP BY onlyn)"
    )
    parts.append(
        "base AS MATERIALIZED (SELECT n_components AS b FROM nc WHERE x = -1)"
    )
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT xs.x AS node_id, "
        "COALESCE(nc.n_components, CAST(0 AS BIGINT)) AS n_components, "
        "COALESCE(iso.n_isolated, CAST(0 AS BIGINT)) AS n_isolated, "
        "CAST(CASE WHEN COALESCE(nc.n_components, 0) + "
        "COALESCE(iso.n_isolated, 0) > base.b THEN 1 ELSE 0 END AS INT) "
        "AS is_articulation "
        "FROM xs LEFT JOIN nc ON xs.x = nc.x "
        "LEFT JOIN iso ON xs.x = iso.x CROSS JOIN base "
        "WHERE xs.x <> -1"
    )


_ORACLES["articulation_64"] = _articulation_sql()


def _q_bridges(spark, sf_dir):
    """Bridge edges of the 64-node induced subgraph: all |E| edge
    deletions as one multi-graph hash-min CC fixpoint (graph_id =
    deleted edge key, sentinel intact graph), 24 rounds both engines."""
    from dachshund_spark.algorithms.stats import bridges

    e = derived_graph(spark, sf_dir).edges
    sub = LinkGraph(e.where((F.col("src") < 64) & (F.col("dst") < 64)))
    return bridges(sub, cc_rounds=24)


def _bridges_parts(rounds: int = 24) -> list:
    # Mirrors the library's packed deleted-edge key.  The static 2^20
    # factor is safe here ONLY because the query restricts to node ids
    # < 64; the library itself derives the shift from the observed max
    # id and raises when the packed key would overflow (ADVICE r3).
    parts = [
        SQL_E,
        SQL_U,
        "su AS MATERIALIZED (SELECT src, dst FROM und WHERE src < 64 AND dst < 64)",
        "cn AS MATERIALIZED (SELECT src, dst, src * 1048576 + dst AS ek "
        "FROM su WHERE src < dst)",
        "xs AS MATERIALIZED (SELECT ek AS x FROM cn UNION SELECT -1)",
        "ex AS MATERIALIZED (SELECT x.x, s.src, s.dst FROM xs x JOIN su s "
        "ON LEAST(s.src, s.dst) * 1048576 + GREATEST(s.src, s.dst) <> x.x)",
        "b0 AS MATERIALIZED (SELECT DISTINCT x, src AS node_id, src AS label FROM ex)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT n.x, n.node_id, "
            "CASE WHEN m.minl IS NULL OR n.label <= m.minl THEN n.label "
            "ELSE m.minl END AS label "
            f"FROM b{i-1} n LEFT JOIN ("
            "SELECT u.x, u.dst AS node_id, MIN(l.label) AS minl "
            f"FROM ex u JOIN b{i-1} l ON u.x = l.x AND u.src = l.node_id "
            "GROUP BY u.x, u.dst) m "
            "ON n.x = m.x AND n.node_id = m.node_id)"
        )
    parts.append(
        f"nc AS MATERIALIZED (SELECT x, CAST(COUNT(DISTINCT label) AS BIGINT) "
        f"AS n_components FROM b{rounds} GROUP BY x)"
    )
    parts.append(
        "dg AS MATERIALIZED (SELECT src AS n, COUNT(DISTINCT dst) AS deg "
        "FROM su GROUP BY src)"
    )
    parts.append(
        "iso AS MATERIALIZED (SELECT c.ek, "
        "CAST(CASE WHEN ds.deg = 1 THEN 1 ELSE 0 END + "
        "CASE WHEN dd.deg = 1 THEN 1 ELSE 0 END AS BIGINT) AS n_isolated "
        "FROM cn c JOIN dg ds ON c.src = ds.n JOIN dg dd ON c.dst = dd.n)"
    )
    parts.append(
        "base AS MATERIALIZED (SELECT n_components AS b FROM nc WHERE x = -1)"
    )
    return parts


def _bridges_sql(rounds: int = 24) -> str:
    return (
        "WITH " + ", ".join(_bridges_parts(rounds)) + " "
        "SELECT cn.src, cn.dst, "
        "COALESCE(nc.n_components, CAST(0 AS BIGINT)) AS n_components, "
        "iso.n_isolated, "
        "CAST(CASE WHEN COALESCE(nc.n_components, 0) + iso.n_isolated > base.b "
        "THEN 1 ELSE 0 END AS INT) AS is_bridge "
        "FROM cn LEFT JOIN nc ON cn.ek = nc.x "
        "JOIN iso ON cn.ek = iso.ek CROSS JOIN base"
    )


_ORACLES["bridges_64"] = _bridges_sql()


def _q_two_edge(spark, sf_dir):
    """Bridge-free (2-edge-connected) components of the 64-node induced
    subgraph: the bridges what-if fixpoint, then one more hash-min CC
    over the surviving edges with the full node set (bridge-only nodes
    become singletons)."""
    from dachshund_spark.algorithms.stats import two_edge_components

    e = derived_graph(spark, sf_dir).edges
    sub = LinkGraph(e.where((F.col("src") < 64) & (F.col("dst") < 64)))
    return two_edge_components(sub, cc_rounds=24)


def _two_edge_sql(rounds: int = 24) -> str:
    parts = _bridges_parts(rounds)
    parts.append(
        "bset AS MATERIALIZED (SELECT cn.ek FROM cn "
        "LEFT JOIN nc ON cn.ek = nc.x JOIN iso ON cn.ek = iso.ek "
        "CROSS JOIN base "
        "WHERE COALESCE(nc.n_components, 0) + iso.n_isolated > base.b)"
    )
    parts.append(
        "kc AS MATERIALIZED (SELECT src, dst FROM cn "
        "WHERE ek NOT IN (SELECT ek FROM bset))"
    )
    parts.append(
        "ku AS MATERIALIZED (SELECT src, dst FROM kc "
        "UNION ALL SELECT dst AS src, src AS dst FROM kc)"
    )
    parts.append(
        "c0 AS MATERIALIZED (SELECT DISTINCT src AS node_id, src AS label FROM su)"
    )
    for i in range(1, rounds + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT n.node_id, "
            "CASE WHEN m.minl IS NULL OR n.label <= m.minl THEN n.label "
            "ELSE m.minl END AS label "
            f"FROM c{i-1} n LEFT JOIN ("
            "SELECT u.dst AS node_id, MIN(l.label) AS minl "
            f"FROM ku u JOIN c{i-1} l ON u.src = l.node_id "
            "GROUP BY u.dst) m ON n.node_id = m.node_id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, label AS component FROM c{rounds}"
    )


_ORACLES["two_edge_components_64"] = _two_edge_sql()


# ---------------------------------------------------------------------------
# Dyad census (stats.py) — Holland-Leinhardt MAN counts
# ---------------------------------------------------------------------------
def _q_dyad_census(spark, sf_dir):
    """MAN dyad census of the full derived directed graph: mutual /
    asymmetric pair counts from one canonical-pair aggregation, null
    dyads closed-form (never materialized) — exact integers."""
    from dachshund_spark.algorithms.stats import dyad_census

    return dyad_census(derived_graph(spark, sf_dir))


_DYAD_CENSUS_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_N}, "
    "dde AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges_raw WHERE src <> dst), "
    "pc AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, "
    "COUNT(*) AS ndir FROM dde GROUP BY 1, 2), "
    "man AS (SELECT "
    "CAST(SUM(CASE WHEN ndir = 2 THEN 1 ELSE 0 END) AS BIGINT) AS mutual, "
    "CAST(SUM(CASE WHEN ndir = 1 THEN 1 ELSE 0 END) AS BIGINT) AS asymmetric FROM pc), "
    "nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes) "
    "SELECT nc.n_nodes, man.mutual, man.asymmetric, "
    "CAST(nc.n_nodes * (nc.n_nodes - 1) / 2 AS BIGINT) - man.mutual - man.asymmetric "
    "AS null_dyads FROM man, nc"
)

_ORACLES["dyad_census"] = _DYAD_CENSUS_SQL


# ---------------------------------------------------------------------------
# TextRank keywords (pipeline/lm.py) — weighted PageRank over the word
# co-occurrence graph; the link-graph engine pointed at the token stream
# ---------------------------------------------------------------------------
def _q_textrank(spark, sf_dir):
    """Corpus TextRank top-50 keywords: adjacent-token co-occurrence
    edges (window 2), 10 weighted PageRank supersteps via the engine's
    pagerank (same expression tree as host_pagerank), deterministic
    (rounded score, token) tie-break."""
    from dachshund_spark.pipeline.lm import textrank_keywords

    return textrank_keywords(
        load_table(spark, sf_dir, "documents"),
        damping=DAMPING,
        iterations=PAGERANK_ITERS,
        topk=50,
    )


def _textrank_sql(iters: int = PAGERANK_ITERS, d: float = DAMPING, topk: int = 50) -> str:
    parts = [
        "t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)",
        "bg AS MATERIALIZED (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM "
        "(SELECT toks, unnest(range(1, len(toks))) AS i FROM t WHERE len(toks) >= 2))",
        "cp AS MATERIALIZED (SELECT LEAST(w1, w2) AS a, GREATEST(w1, w2) AS b, "
        "CAST(COUNT(*) AS DOUBLE) AS wt FROM bg WHERE w1 <> w2 GROUP BY 1, 2)",
        "wedges AS MATERIALIZED (SELECT a AS src, b AS dst, wt FROM cp "
        "UNION ALL SELECT b AS src, a AS dst, wt FROM cp)",
        "wnodes AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM wedges)",
        "wnn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM wnodes)",
        "outw AS MATERIALIZED (SELECT src AS node_id, SUM(wt) AS ow "
        "FROM wedges GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT node_id, 1.0 / (SELECT n FROM wnn) AS rank "
        "FROM wnodes)",
    ]
    # symmetric weighted double cover ⇒ no dangling nodes; dang{i} is
    # kept as an exact 0.0 so the expression tree mirrors the Spark
    # recurrence (adding 0.0/n is an IEEE identity)
    for i in range(iters):
        parts.append(
            f"dang{i} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS dm "
            f"FROM r{i} r LEFT JOIN outw o ON r.node_id = o.node_id "
            f"WHERE o.node_id IS NULL)"
        )
        parts.append(
            f"r{i+1} AS MATERIALIZED (SELECT n.node_id, "
            f"(1.0 - {d!r}) / (SELECT n FROM wnn) + {d!r} * ("
            f"COALESCE(c.contrib, 0.0) + (SELECT dm FROM dang{i}) / (SELECT n FROM wnn)"
            f") AS rank "
            f"FROM wnodes n LEFT JOIN ("
            f"SELECT e.dst AS node_id, SUM((r.rank / o.ow) * e.wt) AS contrib "
            f"FROM wedges e JOIN r{i} r ON e.src = r.node_id "
            f"JOIN outw o ON e.src = o.node_id GROUP BY e.dst) c "
            f"ON n.node_id = c.node_id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id AS token, ROUND(rank, 8) AS score FROM r{iters} "
        f"ORDER BY score DESC, token LIMIT {topk}"
    )


_ORACLES["textrank_top50"] = _textrank_sql()


# ---------------------------------------------------------------------------
# Degree Gini coefficient (stats.py) — histogram-exact inequality scalar
# ---------------------------------------------------------------------------
def _q_degree_gini(spark, sf_dir):
    """Gini of the degree sequence via the sort-free histogram rank-sum
    identity — exact BIGINT numerator, one scalar IEEE division."""
    from dachshund_spark.algorithms.stats import degree_gini

    return degree_gini(derived_graph(spark, sf_dir))


_DEGREE_GINI_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_DEG}, "
    "h AS MATERIALIZED (SELECT degree AS val, CAST(COUNT(*) AS BIGINT) AS cnt "
    "FROM deg GROUP BY 1), "
    "c AS MATERIALIZED (SELECT val, cnt, SUM(cnt) OVER "
    "(ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h), "
    "a AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_nodes, "
    "CAST(SUM(val * cnt) AS BIGINT) AS sum_degree, "
    "CAST(SUM(val * (cnt * (cum - cnt) + cnt * (cnt + 1) // 2)) AS BIGINT) AS t FROM c) "
    "SELECT n_nodes, sum_degree, "
    "CAST(2 * t - (n_nodes + 1) * sum_degree AS BIGINT) AS gini_num, "
    "CAST(2 * t - (n_nodes + 1) * sum_degree AS BIGINT) / (n_nodes * sum_degree) AS gini "
    "FROM a"
)

_ORACLES["degree_gini"] = _DEGREE_GINI_SQL


# ---------------------------------------------------------------------------
# Burt structural-holes constraint (stats.py) on the 256-node subgraph
# ---------------------------------------------------------------------------
def _q_constraint(spark, sf_dir):
    """Burt constraint on the 256-node induced subgraph: e8-integer
    addends (direct 1e8/dᵢ, indirect 1e8/(dᵢ·d_q) per shared contact),
    squared into DECIMAL(38,0) 1e-16 units — wedge-join shape."""
    from dachshund_spark.algorithms.stats import burt_constraint

    e = derived_graph(spark, sf_dir).edges
    sub = LinkGraph(e.where((F.col("src") < 256) & (F.col("dst") < 256)))
    out = burt_constraint(sub)
    return out.select(
        "node_id",
        "degree",
        "constraint_e16",
        F.col("constraint").alias("c_burt"),
    )


_CONSTRAINT_SQL = (
    f"WITH {SQL_E}, "
    "se AS MATERIALIZED (SELECT src, dst FROM edges_raw "
    "WHERE src < 256 AND dst < 256), "
    "su AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
    "(SELECT src, dst FROM se UNION ALL SELECT dst AS src, src AS dst FROM se) "
    "WHERE src <> dst), "
    "sdeg AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS d FROM su GROUP BY 1), "
    "ind AS MATERIALIZED (SELECT iq.src, qj.dst, "
    "CAST(SUM(CAST(ROUND(100000000.0 / (di.d * dq.d), 0) AS BIGINT)) AS BIGINT) AS ind_e8 "
    "FROM su iq JOIN su qj ON iq.dst = qj.src AND qj.dst <> iq.src "
    "JOIN sdeg di ON iq.src = di.node_id "
    "JOIN sdeg dq ON iq.dst = dq.node_id "
    "WHERE EXISTS (SELECT 1 FROM su d2 WHERE d2.src = iq.src AND d2.dst = qj.dst) "
    "GROUP BY iq.src, qj.dst), "
    "s AS MATERIALIZED (SELECT e.src, di.d, "
    "CAST(ROUND(100000000.0 / di.d, 0) AS BIGINT) + COALESCE(i.ind_e8, 0) AS s_e8 "
    "FROM su e JOIN sdeg di ON e.src = di.node_id "
    "LEFT JOIN ind i ON e.src = i.src AND e.dst = i.dst) "
    "SELECT src AS node_id, CAST(MAX(d) AS BIGINT) AS degree, "
    "CAST(SUM(CAST(s_e8 * s_e8 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS constraint_e16, "
    "CAST(CAST(SUM(CAST(s_e8 * s_e8 AS DECIMAL(38,0))) AS DOUBLE) / 1e16 AS DOUBLE) "
    "AS c_burt FROM s GROUP BY src"
)

_ORACLES["constraint_256"] = _CONSTRAINT_SQL


# ---------------------------------------------------------------------------
# RAKE keyword phrases (pipeline/text.py)
# ---------------------------------------------------------------------------
def _q_rake(spark, sf_dir):
    """RAKE top-20 phrases over the documents corpus: stopword-
    delimited runs, e8-integer deg/freq word scores, exact phrase sums."""
    from dachshund_spark.pipeline.text import rake_keywords

    return rake_keywords(load_table(spark, sf_dir, "documents"), topk=20)


_RAKE_SQL = (
    "WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
    "t AS MATERIALIZED (SELECT doc_id, i AS pos, toks[i + 1] AS tok FROM "
    "(SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM tk)), "
    "ns AS MATERIALIZED (SELECT doc_id, pos, tok FROM t WHERE tok NOT IN "
    "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')), "
    "runs AS MATERIALIZED (SELECT doc_id, pos, tok, "
    "pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM ns), "
    "plen AS MATERIALIZED (SELECT doc_id, grp, COUNT(*) AS plen "
    "FROM runs GROUP BY 1, 2), "
    "ws AS MATERIALIZED (SELECT r.tok, COUNT(*) AS freq, SUM(p.plen) AS deg "
    "FROM runs r JOIN plen p ON r.doc_id = p.doc_id AND r.grp = p.grp "
    "GROUP BY r.tok), "
    "wsc AS MATERIALIZED (SELECT tok, CAST(ROUND(CAST(deg AS DOUBLE) * 100000000.0 "
    "/ CAST(freq AS DOUBLE), 0) AS BIGINT) AS sc FROM ws), "
    "occ AS MATERIALIZED (SELECT r.doc_id, r.grp, "
    "string_agg(r.tok, ' ' ORDER BY r.pos) AS phrase, "
    "CAST(SUM(w.sc) AS BIGINT) AS score_e8 "
    "FROM runs r JOIN wsc w ON r.tok = w.tok GROUP BY r.doc_id, r.grp) "
    "SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences, "
    "CAST(MAX(score_e8) AS BIGINT) AS score_e8 FROM occ GROUP BY phrase "
    "ORDER BY score_e8 DESC, phrase LIMIT 20"
)

_ORACLES["rake_top20"] = _RAKE_SQL


# ---------------------------------------------------------------------------
# TPC-H Q6-shaped revenue forecast (relational.py)
# ---------------------------------------------------------------------------
def _q_revenue_q6(spark, sf_dir):
    """Single scan-filter-aggregate: 1996 shipments, discount band
    [0.05, 0.07], quantity < 24 — e4-integer revenue, pushdown-clean."""
    from dachshund_spark.relational import revenue_forecast

    return revenue_forecast(load_table(spark, sf_dir, "lineitem"))


_REVENUE_Q6_SQL = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_items, "
    "CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000, 0) AS BIGINT)) "
    "AS BIGINT) AS revenue_e4 FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l_shipdate < TIMESTAMP '1997-01-01' "
    "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"
)

_ORACLES["revenue_q6"] = _REVENUE_Q6_SQL


# ---------------------------------------------------------------------------
# Sitemap XML round-trip (pages/extract.py)
# ---------------------------------------------------------------------------
def _q_sitemap(spark, sf_dir):
    """Per-host sitemap XML built from the deterministic url scheme,
    then parsed back via the column-algebra <loc> extractor — count +
    lexicographic first/last url recovered per host."""
    from dachshund_spark.pages.extract import sitemap_entries

    g = derived_graph(spark, sf_dir)
    u = g.nodes().select(
        F.concat(
            F.lit("h"),
            F.pmod(F.col("node_id"), F.lit(32)).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        F.concat(
            F.lit("<url><loc>https://h"),
            F.pmod(F.col("node_id"), F.lit(32)).cast("string"),
            F.lit(".example.com/p/"),
            F.col("node_id").cast("string"),
            F.lit("</loc></url>"),
        ).alias("entry"),
    )
    sm = u.groupBy("host").agg(
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'),
            F.concat_ws("", F.array_sort(F.collect_list("entry"))),
            F.lit("</urlset>"),
        ).alias("sitemap_xml")
    )
    locs = sitemap_entries(sm)
    return locs.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_locs"),
        F.min("loc").alias("first_loc"),
        F.max("loc").alias("last_loc"),
    )


_SITEMAP_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_N}, "
    "u AS MATERIALIZED (SELECT "
    "'h' || CAST(node_id % 32 AS VARCHAR) || '.example.com' AS host, "
    "'<url><loc>https://h' || CAST(node_id % 32 AS VARCHAR) || "
    "'.example.com/p/' || CAST(node_id AS VARCHAR) || '</loc></url>' AS entry "
    "FROM nodes), "
    "sm AS MATERIALIZED (SELECT host, "
    "'<?xml version=\"1.0\"?><urlset>' || string_agg(entry, '' ORDER BY entry) "
    "|| '</urlset>' AS sitemap_xml FROM u GROUP BY host), "
    "locs AS (SELECT host, unnest(regexp_extract_all(sitemap_xml, "
    "'<loc>([^<]*)</loc>', 1)) AS loc FROM sm) "
    "SELECT host, CAST(COUNT(*) AS BIGINT) AS n_locs, "
    "MIN(loc) AS first_loc, MAX(loc) AS last_loc FROM locs GROUP BY host"
)

_ORACLES["sitemap_roundtrip"] = _SITEMAP_SQL


# ---------------------------------------------------------------------------
# Exact closeness centrality on the 64-node subgraph (neighborhood.py)
# ---------------------------------------------------------------------------
def _q_closeness(spark, sf_dir):
    """Wasserman-Faust closeness from the all-source coupled BFS used
    by eccentricity_64: C = ((r−1)/(n−1))·((r−1)/Σd) as ONE division of
    exact integer products — disconnected-safe."""
    from dachshund_spark.algorithms.neighborhood import landmark_distances

    g = _small_graph(spark, sf_dir)
    seeds = sorted(r[0] for r in g.nodes().collect())
    n = len(seeds)
    d = landmark_distances(g, seeds, max_distance=16)
    agg = d.groupBy(F.col("landmark").alias("node_id")).agg(
        F.count("dist").cast("long").alias("n_reached"),
        F.sum("dist").cast("long").alias("dist_sum"),
    )
    r1 = F.col("n_reached") - F.lit(1)
    return agg.select(
        "node_id",
        "n_reached",
        "dist_sum",
        (
            (r1 * r1).cast("double") / (F.lit(n - 1) * F.col("dist_sum"))
        ).alias("closeness"),
    )


def _closeness_sql(rounds: int = 16, max_node: int = 64) -> str:
    parts, final = _landmark_parts(
        rounds=rounds,
        max_node=max_node,
        lm_sql="lm AS MATERIALIZED (SELECT node_id AS seed FROM subn)",
    )
    parts.append("nn2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM subn)")
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT seed AS node_id, CAST(COUNT(dist) AS BIGINT) AS n_reached, "
        f"CAST(SUM(dist) AS BIGINT) AS dist_sum, "
        f"CAST((CAST(COUNT(dist) AS BIGINT) - 1) * (CAST(COUNT(dist) AS BIGINT) - 1) "
        f"AS DOUBLE) / (((SELECT n FROM nn2) - 1) * CAST(SUM(dist) AS BIGINT)) "
        f"AS closeness FROM {final} GROUP BY seed"
    )


_ORACLES["closeness_64"] = _closeness_sql()


# ---------------------------------------------------------------------------
# Clustering spectrum C(k) (triangles.py)
# ---------------------------------------------------------------------------
def _q_clustering_by_degree(spark, sf_dir):
    """Mean clustering per degree class: 2·ΣT/(n_k·k·(k−1)) — exact
    integer moments, one division per degree row."""
    from dachshund_spark.algorithms.triangles import clustering_by_degree

    return clustering_by_degree(derived_graph(spark, sf_dir))


_CLUSTERING_BY_DEGREE_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_N}, {SQL_CANON}, {SQL_DEG}, {SQL_TRI}, {SQL_TRIC}, "
    "j AS (SELECT d.degree, t.triangles FROM tric t "
    "JOIN deg d ON t.node_id = d.node_id WHERE d.degree >= 2) "
    "SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes, "
    "CAST(SUM(triangles) AS BIGINT) AS sum_triangles, "
    "CAST(2 * CAST(SUM(triangles) AS BIGINT) AS DOUBLE) / "
    "(CAST(COUNT(*) AS BIGINT) * degree * (degree - 1)) AS mean_clustering "
    "FROM j GROUP BY degree"
)

_ORACLES["clustering_by_degree"] = _CLUSTERING_BY_DEGREE_SQL


# ---------------------------------------------------------------------------
# Wiener index + global efficiency on the 64-node subgraph
# ---------------------------------------------------------------------------
def _q_efficiency(spark, sf_dir):
    """Global efficiency (Latora-Marchiori) + Wiener index from the
    all-source coupled BFS: per-pair 1/d pre-rounded to e8 BIGINTs so
    the sum is exact; the efficiency is the sum over n(n−1) ordered
    pairs as a shared two-division tree."""
    from dachshund_spark.algorithms.neighborhood import landmark_distances

    g = _small_graph(spark, sf_dir)
    seeds = sorted(r[0] for r in g.nodes().collect())
    n = len(seeds)
    d = landmark_distances(g, seeds, max_distance=16).where(F.col("dist") > 0)
    term_e8 = F.round(F.lit(100000000.0) / F.col("dist"), 0).cast("long")
    agg = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs_reached"),
        F.sum("dist").cast("long").alias("_s"),
        F.sum(term_e8).cast("long").alias("inv_dist_e8_sum"),
    )
    return agg.select(
        F.lit(n).cast("long").alias("n_nodes"),
        "n_pairs_reached",
        F.expr("_s div 2").alias("wiener"),
        "inv_dist_e8_sum",
        (
            F.col("inv_dist_e8_sum").cast("double")
            / F.lit(n * (n - 1))
            / F.lit(100000000.0)
        ).alias("global_efficiency"),
    )


def _efficiency_sql(rounds: int = 16, max_node: int = 64) -> str:
    parts, final = _landmark_parts(
        rounds=rounds,
        max_node=max_node,
        lm_sql="lm AS MATERIALIZED (SELECT node_id AS seed FROM subn)",
    )
    parts.append("nn2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM subn)")
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT (SELECT n FROM nn2) AS n_nodes, "
        f"CAST(COUNT(*) AS BIGINT) AS n_pairs_reached, "
        f"CAST(SUM(dist) AS BIGINT) // 2 AS wiener, "
        f"CAST(SUM(CAST(ROUND(100000000.0 / dist, 0) AS BIGINT)) AS BIGINT) "
        f"AS inv_dist_e8_sum, "
        f"CAST(SUM(CAST(ROUND(100000000.0 / dist, 0) AS BIGINT)) AS DOUBLE) "
        f"/ ((SELECT n FROM nn2) * ((SELECT n FROM nn2) - 1)) / 100000000.0 "
        f"AS global_efficiency "
        f"FROM {final} WHERE dist IS NOT NULL AND dist > 0"
    )


_ORACLES["efficiency_64"] = _efficiency_sql()


# ---------------------------------------------------------------------------
# TPC-H Q3-shaped shipping priority (relational.py)
# ---------------------------------------------------------------------------
def _q_shipping_priority(spark, sf_dir):
    """Top-10 BUILDING-segment unshipped orders by e4-integer revenue."""
    from dachshund_spark.relational import shipping_priority

    return shipping_priority(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


_SHIPPING_SQL = (
    "SELECT o.o_orderkey AS l_orderkey, "
    "CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000, 0) "
    "AS BIGINT)) AS BIGINT) AS revenue_e4, o.o_orderdate, o.o_orderpriority "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "WHERE c.c_mktsegment = 'BUILDING' "
    "AND o.o_orderdate < TIMESTAMP '1998-01-01' "
    "AND l.l_shipdate > TIMESTAMP '1998-01-01' "
    "GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority "
    "ORDER BY revenue_e4 DESC, o.o_orderdate ASC, o.o_orderkey ASC LIMIT 10"
)

_ORACLES["shipping_priority"] = _SHIPPING_SQL


def _q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5-shaped star join: per-nation revenue, ASIA 1996, dims
    folded into one broadcast, same-nation predicate post-join."""
    from dachshund_spark.relational import local_supplier_volume

    return local_supplier_volume(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


_LOCAL_SUPPLIER_SQL = (
    "SELECT n.n_name, "
    "CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000, 0) "
    "AS BIGINT)) AS BIGINT) AS revenue_e4 "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey "
    "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
    "AND o.o_orderdate < TIMESTAMP '1997-01-01' "
    "GROUP BY n.n_name ORDER BY revenue_e4 DESC, n.n_name ASC"
)

_ORACLES["local_supplier_volume"] = _LOCAL_SUPPLIER_SQL


def _q_funnel(spark, sf_dir):
    """Ordered view→click→purchase funnel: per-user deepest prefix
    completed with strictly increasing timestamps."""
    from dachshund_spark.relational import funnel

    ev = load_table(spark, sf_dir, "events")
    return funnel(ev, ["view", "click", "purchase"])


_FUNNEL_SQL = (
    "WITH u0 AS MATERIALIZED (SELECT DISTINCT user_id FROM events), "
    "s1 AS MATERIALIZED (SELECT user_id, MIN(ts) AS t FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "s2 AS MATERIALIZED (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
    "JOIN s1 ON e.user_id = s1.user_id "
    "WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id), "
    "s3 AS MATERIALIZED (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
    "JOIN s2 ON e.user_id = s2.user_id "
    "WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id), "
    "lv AS (SELECT user_id, 0 AS reached FROM u0 "
    "UNION ALL SELECT user_id, 1 FROM s1 "
    "UNION ALL SELECT user_id, 2 FROM s2 "
    "UNION ALL SELECT user_id, 3 FROM s3) "
    "SELECT user_id, CAST(MAX(reached) AS INT) AS reached "
    "FROM lv GROUP BY user_id"
)

_ORACLES["funnel_3"] = _FUNNEL_SQL


def _q_retention(spark, sf_dir):
    """Weekly retention cohorts over the events stream (first-activity
    week × offset, integer day/week arithmetic)."""
    from dachshund_spark.relational import retention_cohorts

    return retention_cohorts(load_table(spark, sf_dir, "events"), weeks=4)


_RETENTION_SQL = (
    "WITH uw AS MATERIALIZED (SELECT DISTINCT user_id AS u, "
    "date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS week "
    "FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-01'), "
    "fw AS MATERIALIZED (SELECT u, MIN(week) AS cohort_week FROM uw GROUP BY u) "
    "SELECT CAST(fw.cohort_week AS BIGINT) AS cohort_week, "
    "CAST(uw.week - fw.cohort_week AS BIGINT) AS week_offset, "
    "CAST(COUNT(*) AS BIGINT) AS n_users "
    "FROM uw JOIN fw ON uw.u = fw.u "
    "WHERE uw.week - fw.cohort_week < 4 "
    "GROUP BY fw.cohort_week, uw.week - fw.cohort_week"
)

_ORACLES["retention_cohorts"] = _RETENTION_SQL


def _q_gap_fill(spark, sf_dir):
    """Dense hourly per-type series with explicit zero rows (grid =
    broadcast hours × types, fact table shuffled once)."""
    from dachshund_spark.relational import gap_fill_hourly

    return gap_fill_hourly(load_table(spark, sf_dir, "events"))


_GAP_FILL_SQL = (
    "WITH hc AS MATERIALIZED (SELECT date_trunc('hour', ts) AS hour, "
    "event_type, CAST(COUNT(*) AS BIGINT) AS n_events "
    "FROM events GROUP BY 1, 2), "
    "rng AS MATERIALIZED (SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM hc), "
    "hours AS MATERIALIZED (SELECT unnest(generate_series(h0, h1, "
    "INTERVAL 1 HOUR)) AS hour FROM rng), "
    "types AS MATERIALIZED (SELECT DISTINCT event_type FROM events) "
    "SELECT t.event_type, h.hour, COALESCE(hc.n_events, 0) AS n_events "
    "FROM hours h CROSS JOIN types t "
    "LEFT JOIN hc ON hc.hour = h.hour AND hc.event_type = t.event_type"
)

_ORACLES["gap_fill_hourly"] = _GAP_FILL_SQL


def _q_decayed_counts(spark, sf_dir):
    """Exponentially time-decayed event counters (half-life 1 day,
    'now' = corpus max ts): weight 2^(40−age_days) kept as exact
    BIGINTs — dyadic decay sums are order-independent integers, where
    float 2^-age sums silently drop bits (same trick as
    temporal_pagerank_10)."""
    from dachshund_spark.relational import decayed_counts

    return decayed_counts(load_table(spark, sf_dir, "events"))


_DECAYED_SQL = (
    "WITH mx AS MATERIALIZED (SELECT MAX(ts) AS now_ts FROM events), "
    "ag AS MATERIALIZED (SELECT event_type, "
    "LEAST(date_diff('day', CAST(ts AS DATE), CAST(now_ts AS DATE)), 40) AS age "
    "FROM events, mx) "
    "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events, "
    "CAST(SUM(CAST(1 AS BIGINT) << CAST(40 - age AS INT)) AS BIGINT) "
    "AS decayed_e40 FROM ag GROUP BY event_type"
)

_ORACLES["decayed_counts"] = _DECAYED_SQL


def _q_ws_graph(spark, sf_dir):
    """Watts-Strogatz small-world generator WS(512, k=4, p=10%):
    deterministic md5 rewiring, edge list replayable in SQL."""
    return LinkGraph.watts_strogatz(spark, 512, 4, 10, seed=5).edges


_WS_SQL = (
    "WITH lat AS MATERIALIZED (SELECT i, unnest(range(1, 3)) AS j "
    "FROM (SELECT unnest(range(512)) AS i)), "
    "d AS MATERIALIZED (SELECT i, j, "
    "CAST('0x' || substr(md5('5#' || CAST(i AS VARCHAR) || '#' || "
    "CAST(j AS VARCHAR) || '#r'), 1, 15) AS BIGINT) % 100 < 10 AS rew, "
    "CAST('0x' || substr(md5('5#' || CAST(i AS VARCHAR) || '#' || "
    "CAST(j AS VARCHAR) || '#t'), 1, 15) AS BIGINT) % 512 AS tgt "
    "FROM lat) "
    "SELECT CAST(i AS BIGINT) AS src, "
    "CAST(CASE WHEN rew AND tgt <> i THEN tgt ELSE (i + j) % 512 END "
    "AS BIGINT) AS dst FROM d"
)

_ORACLES["ws_graph_512_4"] = _WS_SQL


def _q_session_window(spark, sf_dir):
    """Spark's NATIVE session_window aggregation (30-min gap) — cross
    checked against an independent lag+cumsum sessionization in the
    oracle, so the built-in operator's gap semantics are pinned."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


_SESSION_WINDOW_SQL = (
    "WITH m AS MATERIALIZED (SELECT user_id, ts, "
    # session_window MERGES an event at exactly prev+gap (verified in
    # tests/test_relational.py), so the break test is strict >
    "CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "> INTERVAL 30 MINUTE OR LAG(ts) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS brk FROM events), "
    "s AS MATERIALIZED (SELECT user_id, ts, "
    "SUM(brk) OVER (PARTITION BY user_id ORDER BY ts "
    "ROWS UNBOUNDED PRECEDING) AS sid FROM m) "
    "SELECT user_id, MIN(ts) AS session_start, "
    "CAST(COUNT(*) AS BIGINT) AS n_events "
    "FROM s GROUP BY user_id, sid"
)

_ORACLES["session_window_30m"] = _SESSION_WINDOW_SQL


def _q_doc_sim(spark, sf_dir):
    """Sparse lexical doc-doc similarity: inverted-index self-join with
    df ≤ 32 prefix filter, exact integer tf-idf dot products, top-3
    neighbors per query doc (< 64)."""
    from dachshund_spark.pipeline.retrieval import doc_similarity_topk

    return doc_similarity_topk(
        load_table(spark, sf_dir, "documents"), k=3, max_df=32, query_max_id=64
    )


_DOC_SIM_SQL = (
    "WITH post AS MATERIALIZED (SELECT tok AS token, doc_id, "
    "CAST(COUNT(*) AS BIGINT) AS tf "
    "FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) "
    "GROUP BY tok, doc_id), "
    "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents), "
    "dfs AS MATERIALIZED (SELECT token, "
    "CAST(ROUND(LN((SELECT n FROM nn) / CAST(COUNT(*) AS BIGINT)) * 10000.0, 0) "
    "AS BIGINT) AS idf_e4 FROM post GROUP BY token "
    "HAVING COUNT(*) <= 32), "
    "pw AS MATERIALIZED (SELECT p.token, p.doc_id, p.tf, d.idf_e4 "
    "FROM post p JOIN dfs d ON p.token = d.token), "
    "pairs AS MATERIALIZED (SELECT a.doc_id AS qa, b.doc_id AS qb, "
    "CAST(SUM(a.tf * b.tf * a.idf_e4 * a.idf_e4) AS BIGINT) AS score_e8 "
    "FROM pw a JOIN pw b ON a.token = b.token "
    "WHERE a.doc_id < 64 AND a.doc_id <> b.doc_id "
    "GROUP BY a.doc_id, b.doc_id) "
    "SELECT qa AS doc_id, qb AS sim_id, score_e8, CAST(rk AS BIGINT) AS rank "
    "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qa "
    "ORDER BY score_e8 DESC, qb ASC) AS rk FROM pairs) WHERE rk <= 3"
)

_ORACLES["doc_similarity_top3"] = _DOC_SIM_SQL


def _q_ws_curve(spark, sf_dir):
    """Watts-Strogatz small-world signature: global transitivity at
    rewiring p ∈ {0, 20, 100}% on WS(256, k=4) — clustering collapses
    as the ring randomizes. The rewire decisions share one md5 per
    lattice edge (monotone coupling, like percolation_3), so the three
    graphs are nested by construction."""
    from dachshund_spark.algorithms.triangles import transitivity

    out = None
    for p in (0, 20, 100):
        g = LinkGraph.watts_strogatz(spark, 256, 4, p, seed=5)
        row = transitivity(g).select(
            F.lit(p).alias("p_pct"),
            F.round("transitivity", 8).alias("transitivity"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _ws_curve_sql(n: int = 256, seed: int = 5, ps=(0, 20, 100)) -> str:
    parts = [
        "lat AS MATERIALIZED (SELECT i, unnest(range(1, 3)) AS j "
        f"FROM (SELECT unnest(range({n})) AS i))",
        "dec AS MATERIALIZED (SELECT i, j, "
        f"CAST('0x' || substr(md5('{seed}#' || CAST(i AS VARCHAR) || '#' || "
        "CAST(j AS VARCHAR) || '#r'), 1, 15) AS BIGINT) % 100 AS h, "
        f"CAST('0x' || substr(md5('{seed}#' || CAST(i AS VARCHAR) || '#' || "
        f"CAST(j AS VARCHAR) || '#t'), 1, 15) AS BIGINT) % {n} AS tgt "
        "FROM lat)",
    ]
    sels = []
    for p in ps:
        parts.append(
            f"e{p} AS MATERIALIZED (SELECT CAST(i AS BIGINT) AS src, "
            f"CAST(CASE WHEN h < {p} AND tgt <> i THEN tgt "
            f"ELSE (i + j) % {n} END AS BIGINT) AS dst FROM dec)"
        )
        parts.append(
            f"u{p} AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
            f"SELECT src, dst FROM e{p} "
            f"UNION ALL SELECT dst AS src, src AS dst FROM e{p}) "
            "WHERE src <> dst)"
        )
        parts.append(
            f"c{p} AS MATERIALIZED (SELECT src, dst FROM u{p} WHERE src < dst)"
        )
        parts.append(
            f"t{p} AS MATERIALIZED (SELECT COUNT(*) AS tri FROM c{p} a "
            f"JOIN c{p} b ON a.dst = b.src "
            f"JOIN c{p} c ON c.src = a.src AND c.dst = b.dst)"
        )
        parts.append(
            f"w{p} AS MATERIALIZED (SELECT SUM(d * (d - 1) / 2) AS wedges FROM ("
            f"SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM u{p} GROUP BY src))"
        )
        sels.append(
            f"SELECT {p} AS p_pct, ROUND(3.0 * (SELECT tri FROM t{p}) / "
            f"(SELECT wedges FROM w{p}), 8) AS transitivity"
        )
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(sels)


_ORACLES["ws_smallworld_curve"] = _ws_curve_sql()


def _q_zorder(spark, sf_dir):
    """Z-order (Morton) edge-layout locality profile: per top-8-bit
    Morton bucket, edge count + distinct src/dst — each bucket is a
    2-D tile so both stay tile-bounded (the Iceberg/Delta Z-ORDER
    clustering rationale, measured)."""
    from dachshund_spark.bucketed import zorder_layout_stats

    e = derived_graph(spark, sf_dir).edges.distinct()
    # fixture node ids span 10 bits; 64 buckets = 128x128 tiles
    return zorder_layout_stats(e, bits=10, bucket_bits=6)


def _zorder_sql(bits: int = 16, bucket_bits: int = 8) -> str:
    morton = " + ".join(
        f"(((src >> {i}) & 1) << {2 * i + 1}) + (((dst >> {i}) & 1) << {2 * i})"
        for i in range(bits)
    )
    return (
        f"WITH {SQL_E}, {SQL_D}, "
        f"mk AS MATERIALIZED (SELECT ({morton}) >> {2 * bits - bucket_bits} "
        "AS bucket, src, dst FROM d_edges) "
        "SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_edges, "
        "CAST(COUNT(DISTINCT src) AS BIGINT) AS n_src, "
        "CAST(COUNT(DISTINCT dst) AS BIGINT) AS n_dst "
        "FROM mk GROUP BY bucket"
    )


_ORACLES["zorder_layout"] = _zorder_sql(bits=10, bucket_bits=6)


# ---------------------------------------------------------------------------
# Deterministic R-MAT generator (graph.py LinkGraph.rmat)
# ---------------------------------------------------------------------------
def _q_rmat(spark, sf_dir):
    """R-MAT(scale=8, m=4096, a/b/c = 57/19/19) — md5-driven quadrant
    choices, engine-replayable edge list (self-loops/dups kept)."""
    return LinkGraph.rmat(spark, scale=8, n_edges=4096, seed=42).edges


_RMAT_SQL = (
    "WITH ed AS MATERIALIZED (SELECT unnest(range(4096)) AS edge_id), "
    "lv AS MATERIALIZED (SELECT edge_id, unnest(range(8)) AS l FROM ed), "
    "hb AS MATERIALIZED (SELECT edge_id, l, "
    + MD5L.format(
        x="'42#' || CAST(edge_id AS VARCHAR) || '#' || CAST(l AS VARCHAR)"
    )
    + " % 100 AS h FROM lv), "
    "qb AS MATERIALIZED (SELECT edge_id, l, CASE WHEN h < 57 THEN 0 "
    "WHEN h < 76 THEN 1 WHEN h < 95 THEN 2 ELSE 3 END AS q FROM hb) "
    "SELECT CAST(SUM((CASE WHEN q >= 2 THEN 1 ELSE 0 END) * (CAST(1 AS BIGINT) << l)) AS BIGINT) AS src, "
    "CAST(SUM((q % 2) * (CAST(1 AS BIGINT) << l)) AS BIGINT) AS dst "
    "FROM qb GROUP BY edge_id"
)

_ORACLES["rmat_8_4096"] = _RMAT_SQL


# ---------------------------------------------------------------------------
# Pipeline evaluation composites: tokenizer fertility by language,
# LSH candidate precision vs exact n-gram Jaccard.
# ---------------------------------------------------------------------------
def _q_fertility(spark, sf_dir):
    """Per-language tokenizer fertility under the 8-merge BPE vocab:
    exact integer word/subword sums, fertility = one IEEE division."""
    from dachshund_spark.pipeline.lm import bpe_encode_counts
    from dachshund_spark.pipeline.text import language_id

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode_counts(docs, n_merges=8)
    lid = language_id(docs)
    return (
        enc.join(lid, on="doc_id")
        .groupBy(F.col("detected_lang").alias("lang"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("sum_words"),
            F.sum("n_bpe_tokens").cast("long").alias("sum_bpe_tokens"),
        )
        .withColumn(
            "fertility",
            F.col("sum_bpe_tokens").cast("double")
            / F.col("sum_words").cast("double"),
        )
    )


def _fertility_sql() -> str:
    return (
        "WITH enc AS MATERIALIZED (" + _ORACLES["bpe_encode_8"] + "), "
        "lid AS MATERIALIZED (" + _ORACLES["language_id"] + ") "
        "SELECT l.detected_lang AS lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(e.n_words) AS BIGINT) AS sum_words, "
        "CAST(SUM(e.n_bpe_tokens) AS BIGINT) AS sum_bpe_tokens, "
        "CAST(SUM(e.n_bpe_tokens) AS DOUBLE) / CAST(SUM(e.n_words) AS DOUBLE) "
        "AS fertility "
        "FROM enc e JOIN lid l ON e.doc_id = l.doc_id GROUP BY l.detected_lang"
    )


_ORACLES["tokenizer_fertility"] = _fertility_sql()


def _q_lsh_precision(spark, sf_dir):
    """Banded-LSH candidate quality: per shared-band count, how many
    candidate pairs are true near-dups (exact 3-gram Jaccard ≥ 0.5)."""
    from dachshund_spark.pipeline.dedup import minhash_lsh_candidates, ngram_jaccard

    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(docs, num_perm=8, bands=4)
    jac = ngram_jaccard(docs, cand.select("doc_a", "doc_b"), n=3)
    return (
        cand.join(jac, on=["doc_a", "doc_b"], how="left")
        .groupBy("n_shared_bands")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(
                F.when(F.col("jaccard") >= 0.5, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_true"),
        )
    )


def _lsh_precision_sql() -> str:
    return (
        "WITH cand AS MATERIALIZED (" + _ORACLES["minhash_lsh_candidates"] + "), "
        "tk2 AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
        "gr2 AS MATERIALIZED (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram "
        "FROM tk2, UNNEST(range(1, len(t) - 1)) AS r(i)), "
        "int2 AS MATERIALIZED (SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter "
        "FROM cand p JOIN gr2 ga ON ga.doc_id = p.doc_a "
        "JOIN gr2 gb ON gb.doc_id = p.doc_b AND gb.gram = ga.gram "
        "GROUP BY p.doc_a, p.doc_b), "
        "sz2 AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM gr2 GROUP BY doc_id), "
        "jac AS MATERIALIZED (SELECT i.doc_a, i.doc_b, "
        "CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) AS jaccard "
        "FROM int2 i JOIN sz2 sa ON i.doc_a = sa.doc_id "
        "JOIN sz2 sb ON i.doc_b = sb.doc_id) "
        "SELECT c.n_shared_bands, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM(CASE WHEN j.jaccard >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_true "
        "FROM cand c LEFT JOIN jac j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b "
        "GROUP BY c.n_shared_bands"
    )


_ORACLES["lsh_precision"] = _lsh_precision_sql()


# ---------------------------------------------------------------------------
# REAL PNG decode (pipeline/multimodal.py stdlib codec) — the oracle
# computes expected stats from the fixture's pixel formula; Spark must
# recover identical integers from the actual PNG bytes.
# ---------------------------------------------------------------------------
def _q_png_decode(spark, sf_dir):
    """Channel sums + 64-bit aHash from genuinely decoded 8×8 PNGs."""
    from dachshund_spark.pipeline.multimodal import (
        decode_png_features,
        make_png_media,
    )

    return decode_png_features(make_png_media(spark, n=64, size=8))


_PNG_DECODE_SQL = (
    "WITH ids AS MATERIALIZED (SELECT unnest(range(64)) AS media_id), "
    "xs AS MATERIALIZED (SELECT unnest(range(8)) AS x), "
    "ys AS MATERIALIZED (SELECT unnest(range(8)) AS y), "
    "px AS MATERIALIZED (SELECT media_id, x, y, "
    "(media_id + 3 * x + 5 * y) % 256 AS r, "
    "(2 * media_id + 7 * x + 11 * y) % 256 AS g, "
    "(3 * media_id + 13 * x + 17 * y) % 256 AS b FROM ids, xs, ys), "
    "agg AS MATERIALIZED (SELECT media_id, SUM(r) AS sum_r, SUM(g) AS sum_g, "
    "SUM(b) AS sum_b FROM px GROUP BY media_id), "
    "bits AS MATERIALIZED (SELECT p.media_id, p.y * 8 + p.x AS i, "
    "CASE WHEN 64 * p.r >= a.sum_r THEN 1 ELSE 0 END AS bit "
    "FROM px p JOIN agg a ON p.media_id = a.media_id), "
    "ah AS MATERIALIZED (SELECT media_id, "
    "SUM(CASE WHEN i < 63 THEN bit * (CAST(1 AS BIGINT) << i) ELSE 0 END) AS lo, "
    "MAX(CASE WHEN i = 63 THEN bit ELSE 0 END) AS hi FROM bits GROUP BY media_id) "
    "SELECT a.media_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height, "
    "CAST(a.sum_r AS BIGINT) AS sum_r, CAST(a.sum_g AS BIGINT) AS sum_g, "
    "CAST(a.sum_b AS BIGINT) AS sum_b, "
    "CAST(h.lo + CASE WHEN h.hi = 1 THEN CAST(-9223372036854775807 AS BIGINT) - 1 "
    "ELSE 0 END AS BIGINT) AS ahash "
    "FROM agg a JOIN ah h ON a.media_id = h.media_id"
)

_ORACLES["png_decode_features"] = _PNG_DECODE_SQL


def _q_wav_decode(spark, sf_dir):
    """REAL audio decode: integer energy + zero crossings from actual
    mono PCM16 WAV bytes (stdlib codec), formula-oracled."""
    from dachshund_spark.pipeline.multimodal import (
        decode_audio_features,
        make_wav_media,
    )

    return decode_audio_features(make_wav_media(spark, n=64, n_samples=256))


_WAV_DECODE_SQL = (
    "WITH ids AS MATERIALIZED (SELECT unnest(range(64)) AS media_id), "
    "ix AS MATERIALIZED (SELECT unnest(range(256)) AS i), "
    "sm AS MATERIALIZED (SELECT media_id, i, "
    "((media_id * 13 + i * 509) % 65536) - 32768 AS s FROM ids, ix), "
    "fl AS MATERIALIZED (SELECT media_id, s, "
    "LAG(s) OVER (PARTITION BY media_id ORDER BY i) AS ps FROM sm) "
    "SELECT media_id, CAST(8000 AS INT) AS sample_rate, "
    "CAST(256 AS BIGINT) AS n_samples, "
    "CAST(SUM(s * s) AS BIGINT) AS sum_sq, "
    "CAST(SUM(CASE WHEN ps IS NOT NULL AND ((s >= 0) <> (ps >= 0)) "
    "THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings "
    "FROM fl GROUP BY media_id"
)

_ORACLES["wav_decode_features"] = _WAV_DECODE_SQL


def _q_jpeg_decode(spark, sf_dir):
    """REAL baseline-JPEG decode: Huffman → dequant → IDCT from actual
    JFIF bytes (stdlib codec, pipeline/jpeg.py); constant-8×8-block
    fixture makes quantization exact so every output integer is
    formula-predictable."""
    from dachshund_spark.pipeline.jpeg import decode_jpeg_features, make_jpeg_media

    return decode_jpeg_features(make_jpeg_media(spark, n=64, size=16))


_JPEG_DECODE_SQL = (
    "WITH ids AS MATERIALIZED (SELECT unnest(range(64)) AS media_id), "
    "bs AS MATERIALIZED (SELECT unnest(range(2)) AS b), "
    "blk AS MATERIALIZED (SELECT media_id, "
    "(media_id * 17 + x.b * 29 + y.b * 47) % 256 AS g "
    "FROM ids, bs x, bs y) "
    "SELECT media_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height, "
    "CAST(SUM(64 * g) AS BIGINT) AS sum_gray, "
    "CAST(MIN(g) AS INT) AS min_gray, CAST(MAX(g) AS INT) AS max_gray "
    "FROM blk GROUP BY media_id"
)

_ORACLES["jpeg_decode_features"] = _JPEG_DECODE_SQL


def _q_jpeg_progressive(spark, sf_dir):
    """REAL progressive-JPEG (SOF2) decode: six scans — DC successive
    approximation (Al=1→0) + two spectral AC bands each at two bit
    planes — reassembled by the T.81 Annex G decoder in
    pipeline/jpeg.py; the constant-block fixture is lossless so every
    output integer is formula-predictable (gray
    (id·19 + bx·31 + by·53) % 256)."""
    from dachshund_spark.pipeline.jpeg import (
        decode_jpeg_features,
        make_progressive_jpeg_media,
    )

    return decode_jpeg_features(make_progressive_jpeg_media(spark, n=64, size=16))


_JPEG_PROGRESSIVE_SQL = (
    "WITH ids AS MATERIALIZED (SELECT unnest(range(64)) AS media_id), "
    "bs AS MATERIALIZED (SELECT unnest(range(2)) AS b), "
    "blk AS MATERIALIZED (SELECT media_id, "
    "(media_id * 19 + x.b * 31 + y.b * 53) % 256 AS g "
    "FROM ids, bs x, bs y) "
    "SELECT media_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height, "
    "CAST(SUM(64 * g) AS BIGINT) AS sum_gray, "
    "CAST(MIN(g) AS INT) AS min_gray, CAST(MAX(g) AS INT) AS max_gray "
    "FROM blk GROUP BY media_id"
)

_ORACLES["jpeg_progressive_features"] = _JPEG_PROGRESSIVE_SQL


def _q_video_decode(spark, sf_dir):
    """REAL MJPEG-AVI video decode (VERDICT r3 #3 — retires the last
    digest-fake): RIFF chunk walk → per-frame baseline-JPEG decode →
    exact integer pixel stats (pipeline/video.py).  Frame f of video v
    is block-constant gray (v·17+f·13+bx·29+by·47)%256, so the oracle
    replays the formula with zero decoding — the container walker and
    codec are what's under test."""
    from dachshund_spark.pipeline.video import (
        decode_video_frame_features,
        make_video_media,
    )

    return decode_video_frame_features(
        make_video_media(spark, n=24, n_frames=4, size=16, fps=10)
    )


_VIDEO_DECODE_SQL = (
    "WITH ids AS MATERIALIZED (SELECT unnest(range(24)) AS media_id), "
    "fs AS MATERIALIZED (SELECT unnest(range(4)) AS f), "
    "bs AS MATERIALIZED (SELECT unnest(range(2)) AS b), "
    "blk AS MATERIALIZED (SELECT media_id, f, "
    "(media_id * 17 + f * 13 + x.b * 29 + y.b * 47) % 256 AS g "
    "FROM ids, fs, bs x, bs y) "
    "SELECT media_id, CAST(f AS INT) AS frame_idx, "
    "CAST(f * 100 AS BIGINT) AS frame_ts_ms, "
    "CAST(16 AS INT) AS width, CAST(16 AS INT) AS height, "
    "CAST(SUM(64 * g) AS BIGINT) AS sum_gray, "
    "CAST(MIN(g) AS INT) AS min_gray, CAST(MAX(g) AS INT) AS max_gray "
    "FROM blk GROUP BY media_id, f"
)

_ORACLES["video_frame_features"] = _VIDEO_DECODE_SQL


# ---------------------------------------------------------------------------
# REAL BMP / GIF decode + generic magic-byte dispatch (multimodal.py
# stdlib codecs) — same fixture-formula oracle pattern as PNG/JPEG: the
# oracle computes expected stats from the pixel formula; Spark must
# recover identical integers from the actual container bytes.
# ---------------------------------------------------------------------------
def _q_bmp_decode(spark, sf_dir):
    """Channel sums + aHash from genuinely decoded 24-bit BMPs — same
    per-channel pixel formula as the PNG fixture, so a BGR byte-order
    bug in the BMP codec breaks the oracle (reuses _PNG_DECODE_SQL)."""
    from dachshund_spark.pipeline.multimodal import (
        decode_image_features_auto,
        make_bmp_media,
    )

    return decode_image_features_auto(make_bmp_media(spark, n=64, size=8))


# identical pixel formula, different container — same expected stats
_ORACLES["bmp_decode_features"] = _PNG_DECODE_SQL


def _q_gif_decode(spark, sf_dir):
    """REAL GIF decode: LZW codec + palette mapping under oracle test.
    Pixel index i = (id + 3x + 5y) % 256 through the colored palette
    (7i, 11i, 13i) % 256."""
    from dachshund_spark.pipeline.multimodal import (
        decode_image_features_auto,
        make_gif_media,
    )

    return decode_image_features_auto(make_gif_media(spark, n=64, size=8))


_GIF_DECODE_SQL = (
    "WITH ids AS MATERIALIZED (SELECT unnest(range(64)) AS media_id), "
    "xs AS MATERIALIZED (SELECT unnest(range(8)) AS x), "
    "ys AS MATERIALIZED (SELECT unnest(range(8)) AS y), "
    "px AS MATERIALIZED (SELECT media_id, x, y, "
    "(7 * ((media_id + 3 * x + 5 * y) % 256)) % 256 AS r, "
    "(11 * ((media_id + 3 * x + 5 * y) % 256)) % 256 AS g, "
    "(13 * ((media_id + 3 * x + 5 * y) % 256)) % 256 AS b FROM ids, xs, ys), "
    "agg AS MATERIALIZED (SELECT media_id, SUM(r) AS sum_r, SUM(g) AS sum_g, "
    "SUM(b) AS sum_b FROM px GROUP BY media_id), "
    "bits AS MATERIALIZED (SELECT p.media_id, p.y * 8 + p.x AS i, "
    "CASE WHEN 64 * p.r >= a.sum_r THEN 1 ELSE 0 END AS bit "
    "FROM px p JOIN agg a ON p.media_id = a.media_id), "
    "ah AS MATERIALIZED (SELECT media_id, "
    "SUM(CASE WHEN i < 63 THEN bit * (CAST(1 AS BIGINT) << i) ELSE 0 END) AS lo, "
    "MAX(CASE WHEN i = 63 THEN bit ELSE 0 END) AS hi FROM bits GROUP BY media_id) "
    "SELECT a.media_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height, "
    "CAST(a.sum_r AS BIGINT) AS sum_r, CAST(a.sum_g AS BIGINT) AS sum_g, "
    "CAST(a.sum_b AS BIGINT) AS sum_b, "
    "CAST(h.lo + CASE WHEN h.hi = 1 THEN CAST(-9223372036854775807 AS BIGINT) - 1 "
    "ELSE 0 END AS BIGINT) AS ahash "
    "FROM agg a JOIN ah h ON a.media_id = h.media_id"
)

_ORACLES["gif_decode_features"] = _GIF_DECODE_SQL


def _q_image_dispatch(spark, sf_dir):
    """Mixed-container corpus (PNG / BMP / GIF by media_id % 3, all
    lossless encodings of the SAME grayscale formula image) through ONE
    magic-byte-dispatching Arrow stage — the oracle is format-blind, so
    any decoder or dispatch bug shows up as a sum mismatch."""
    from dachshund_spark.pipeline.multimodal import (
        decode_image_features_auto,
        make_mixed_media,
    )

    return decode_image_features_auto(make_mixed_media(spark, n=96, size=8))


_IMAGE_DISPATCH_SQL = (
    "WITH ids AS MATERIALIZED (SELECT unnest(range(96)) AS media_id), "
    "xs AS MATERIALIZED (SELECT unnest(range(8)) AS x), "
    "ys AS MATERIALIZED (SELECT unnest(range(8)) AS y), "
    "px AS MATERIALIZED (SELECT media_id, x, y, "
    "(media_id + 3 * x + 5 * y) % 256 AS v FROM ids, xs, ys), "
    "agg AS MATERIALIZED (SELECT media_id, SUM(v) AS sum_v FROM px GROUP BY media_id), "
    "bits AS MATERIALIZED (SELECT p.media_id, p.y * 8 + p.x AS i, "
    "CASE WHEN 64 * p.v >= a.sum_v THEN 1 ELSE 0 END AS bit "
    "FROM px p JOIN agg a ON p.media_id = a.media_id), "
    "ah AS MATERIALIZED (SELECT media_id, "
    "SUM(CASE WHEN i < 63 THEN bit * (CAST(1 AS BIGINT) << i) ELSE 0 END) AS lo, "
    "MAX(CASE WHEN i = 63 THEN bit ELSE 0 END) AS hi FROM bits GROUP BY media_id) "
    "SELECT a.media_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height, "
    "CAST(a.sum_v AS BIGINT) AS sum_r, CAST(a.sum_v AS BIGINT) AS sum_g, "
    "CAST(a.sum_v AS BIGINT) AS sum_b, "
    "CAST(h.lo + CASE WHEN h.hi = 1 THEN CAST(-9223372036854775807 AS BIGINT) - 1 "
    "ELSE 0 END AS BIGINT) AS ahash "
    "FROM agg a JOIN ah h ON a.media_id = h.media_id"
)

_ORACLES["image_decode_dispatch"] = _IMAGE_DISPATCH_SQL


# ---------------------------------------------------------------------------
# Radicchi edge clustering coefficient (triangles.py)
# ---------------------------------------------------------------------------
def _q_edge_clustering(spark, sf_dir):
    """Top-100 edges by Radicchi C3 = (T+1)/(min_deg-1) — integer
    truncating division into e9 units so values/ordering are
    engine-exact; min-degree-1 edges excluded (zero denominator)."""
    from dachshund_spark.algorithms.triangles import edge_clustering

    return edge_clustering(derived_graph(spark, sf_dir), topk=100)


_EDGE_CLUSTERING_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_N}, {SQL_CANON}, {SQL_DEG}, {SQL_TRI}, "
    "pr AS MATERIALIZED (SELECT u AS a, v AS b FROM tri "
    "UNION ALL SELECT u, w FROM tri UNION ALL SELECT v, w FROM tri), "
    "sup AS MATERIALIZED (SELECT a, b, COUNT(*) AS t FROM pr GROUP BY 1, 2), "
    "sc AS (SELECT c.src, c.dst, CAST(COALESCE(s.t, 0) AS BIGINT) AS support, "
    "CAST(((COALESCE(s.t, 0) + 1) * 1000000000) // "
    "(LEAST(du.degree, dv.degree) - 1) AS BIGINT) AS score_e9 "
    "FROM canon c LEFT JOIN sup s ON c.src = s.a AND c.dst = s.b "
    "JOIN deg du ON c.src = du.node_id JOIN deg dv ON c.dst = dv.node_id "
    "WHERE LEAST(du.degree, dv.degree) >= 2) "
    "SELECT src, dst, support, score_e9 FROM sc "
    "ORDER BY score_e9 DESC, src, dst LIMIT 100"
)

_ORACLES["edge_clustering_top100"] = _EDGE_CLUSTERING_SQL


# ---------------------------------------------------------------------------
# Signed structural balance (triangles.py)
# ---------------------------------------------------------------------------
def _q_signed_balance(spark, sf_dir):
    """Cartwright-Harary balance census: md5-parity edge signs (the
    seeded-synthetic convention), balanced = sign product +1; fraction
    is a single IEEE division of exact integer counts."""
    from dachshund_spark.algorithms.triangles import signed_triangle_balance

    return signed_triangle_balance(derived_graph(spark, sf_dir))


_SIGNED_BALANCE_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_N}, {SQL_CANON}, {SQL_TRI}, "
    "sg AS MATERIALIZED (SELECT src, dst, "
    "CASE WHEN CAST(('0x' || substr(md5(CAST(src AS VARCHAR) || '#' || "
    "CAST(dst AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sign "
    "FROM canon), "
    "tb AS (SELECT s1.sign * s2.sign * s3.sign AS prod FROM tri t "
    "JOIN sg s1 ON t.u = s1.src AND t.v = s1.dst "
    "JOIN sg s2 ON t.u = s2.src AND t.w = s2.dst "
    "JOIN sg s3 ON t.v = s3.src AND t.w = s3.dst) "
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles, "
    "CAST(SUM(CASE WHEN prod = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_balanced, "
    "CAST(SUM(CASE WHEN prod = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unbalanced, "
    "CAST(SUM(CASE WHEN prod = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
    "/ nullif(COUNT(*), 0) AS frac_balanced FROM tb"
)

_ORACLES["signed_balance"] = _SIGNED_BALANCE_SQL


# ---------------------------------------------------------------------------
# Temporal 3-cycle motifs (temporal.py)
# ---------------------------------------------------------------------------
def _q_temporal_triangles(spark, sf_dir):
    """Directed temporal 3-cycles u→v→w→u with strictly increasing
    first-contact times spanning ≤ 365 days (Paranjape et al. temporal
    motifs); timestamps are integer day offsets, fully engine-exact."""
    from dachshund_spark.algorithms.temporal import temporal_cycle_count

    li = load_table(spark, sf_dir, "lineitem")
    e = li.select(
        (F.col("l_orderkey") % N_NODES).alias("src"),
        (F.col("l_partkey") % N_NODES).alias("dst"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).alias("t"),
    )
    return temporal_cycle_count(e, delta=365)


_TEMPORAL_TRI_SQL = (
    "WITH te AS MATERIALIZED (SELECT "
    f"l_orderkey % {N_NODES} AS src, l_partkey % {N_NODES} AS dst, "
    "MIN(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))) AS t "
    f"FROM lineitem WHERE l_orderkey % {N_NODES} <> l_partkey % {N_NODES} "
    "GROUP BY 1, 2), "
    "wg AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w, e1.t AS t1, e2.t AS t2 "
    "FROM te e1 JOIN te e2 ON e1.dst = e2.src AND e2.dst <> e1.src "
    "WHERE e2.t > e1.t AND e2.t - e1.t < 365), "
    "cy AS (SELECT COUNT(*) AS n_cycles FROM wg "
    "JOIN te e3 ON e3.src = wg.w AND e3.dst = wg.u "
    "WHERE e3.t > wg.t2 AND e3.t - wg.t1 <= 365) "
    "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM te) AS n_edges, "
    "CAST(n_cycles AS BIGINT) AS n_cycles FROM cy"
)

_ORACLES["temporal_triangles_365"] = _TEMPORAL_TRI_SQL


# ---------------------------------------------------------------------------
# MATTR lexical diversity (pipeline/text.py)
# ---------------------------------------------------------------------------
def _q_mattr(spark, sf_dir):
    """Moving-Average Type-Token Ratio, window 10: Σ distinct-per-span
    · 10^8 DIV (n_windows · 10) — exact integers end-to-end."""
    from dachshund_spark.pipeline.text import mattr

    return mattr(load_table(spark, sf_dir, "documents"), window=10)


_MATTR_SQL = (
    "WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
    "t AS MATERIALIZED (SELECT doc_id, i AS pos, toks[i + 1] AS tok FROM "
    "(SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM tk)), "
    "n AS MATERIALIZED (SELECT doc_id, MAX(pos) AS maxp FROM t GROUP BY doc_id), "
    "sp AS MATERIALIZED (SELECT t.doc_id, t.tok, t.pos - o.off AS p "
    "FROM t JOIN n USING (doc_id) "
    "CROSS JOIN (SELECT unnest(range(10)) AS off) o "
    "WHERE n.maxp >= 9 AND t.pos - o.off >= 0 AND t.pos - o.off <= n.maxp - 9), "
    "ps AS MATERIALIZED (SELECT doc_id, p, COUNT(DISTINCT tok) AS nd "
    "FROM sp GROUP BY 1, 2) "
    "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows, "
    "CAST(SUM(nd) AS BIGINT) AS sum_distinct, "
    "CAST(SUM(nd) * 100000000 // (COUNT(*) * 10) AS BIGINT) AS mattr_e8 "
    "FROM ps GROUP BY doc_id"
)

_ORACLES["mattr_10"] = _MATTR_SQL


# ---------------------------------------------------------------------------
# Crawl politeness schedule (pipeline/curate.py)
# ---------------------------------------------------------------------------
def _q_politeness(spark, sf_dir):
    """Per-host polite fetch schedule over the deterministic url scheme:
    md5-priority rank within host × per-host Crawl-delay — windows
    partitioned BY HOST only, integer offsets."""
    from dachshund_spark.pipeline.curate import politeness_schedule

    g = derived_graph(spark, sf_dir)
    hid = F.pmod(F.col("node_id"), F.lit(32))
    urls = g.nodes().select(
        F.concat(F.lit("h"), hid.cast("string"), F.lit(".example.com")).alias("host"),
        F.concat(
            F.lit("https://h"),
            hid.cast("string"),
            F.lit(".example.com/p/"),
            F.col("node_id").cast("string"),
        ).alias("url"),
        (F.lit(1) + F.pmod(hid, F.lit(5))).cast("long").alias("crawl_delay_s"),
    )
    return politeness_schedule(urls)


_POLITENESS_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_N}, "
    "u AS MATERIALIZED (SELECT "
    "'h' || CAST(node_id % 32 AS VARCHAR) || '.example.com' AS host, "
    "'https://h' || CAST(node_id % 32 AS VARCHAR) || '.example.com/p/' || "
    "CAST(node_id AS VARCHAR) AS url, "
    "CAST(1 + (node_id % 32) % 5 AS BIGINT) AS crawl_delay_s FROM nodes), "
    "r AS (SELECT host, url, crawl_delay_s, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY "
    "CAST(('0x' || substr(md5(url), 1, 15)) AS BIGINT), url) AS BIGINT) "
    "AS fetch_rank FROM u) "
    "SELECT host, url, crawl_delay_s, fetch_rank, "
    "CAST((fetch_rank - 1) * crawl_delay_s AS BIGINT) AS fetch_offset_s FROM r"
)

_ORACLES["politeness_schedule"] = _POLITENESS_SQL


# ---------------------------------------------------------------------------
# TPC-H Q10 / Q4-Q12 shapes (relational.py)
# ---------------------------------------------------------------------------
def _q_returned_items(spark, sf_dir):
    """Q10-shaped returned-item report: e4-integer revenue per customer
    on 'R' lineitems in a one-quarter order window, nation broadcast,
    top-20 by revenue."""
    from dachshund_spark.relational import returned_item_report

    return returned_item_report(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
    )


_RETURNED_ITEMS_SQL = (
    "WITH o AS (SELECT o_orderkey, o_custkey FROM orders "
    "WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'), "
    "l AS (SELECT l_orderkey, CAST(ROUND(l_extendedprice * (1 - l_discount) "
    "* 10000, 0) AS BIGINT) AS rev FROM lineitem WHERE l_returnflag = 'R') "
    "SELECT c.c_custkey, c.c_name, CAST(SUM(l.rev) AS BIGINT) AS revenue_e4, "
    "c.c_acctbal, n.n_name "
    "FROM o JOIN l ON l.l_orderkey = o.o_orderkey "
    "JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name "
    "ORDER BY revenue_e4 DESC, c.c_custkey LIMIT 20"
)

_ORACLES["returned_items_top20"] = _RETURNED_ITEMS_SQL


def _q_priority_shipments(spark, sf_dir):
    """Q4/Q12-shaped two-bucket priority census per ship year —
    integer conditional counts, one join + one groupBy."""
    from dachshund_spark.relational import priority_shipments

    return priority_shipments(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


_PRIORITY_SHIPMENTS_SQL = (
    "WITH o AS (SELECT o_orderkey, "
    "o_orderpriority IN ('1-URGENT', '2-HIGH') AS hi FROM orders), "
    "l AS (SELECT l_orderkey, "
    "EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS ship_year FROM lineitem) "
    "SELECT CAST(ship_year AS INT) AS ship_year, "
    "CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
    "CAST(SUM(CASE WHEN hi THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
    "FROM l JOIN o ON l.l_orderkey = o.o_orderkey GROUP BY ship_year"
)

_ORACLES["priority_shipments"] = _PRIORITY_SHIPMENTS_SQL


# ---------------------------------------------------------------------------
# MMR diversity re-ranking (pipeline/similarity.py)
# ---------------------------------------------------------------------------
def _q_mmr(spark, sf_dir):
    """MMR λ=0.5 over the top-20 cosine candidates of query vec 0:
    every score an exact dyadic halving of rounded-6 sims; 5-round
    greedy selection replayed verbatim by the unrolled oracle."""
    from dachshund_spark.pipeline.similarity import mmr_rerank

    return mmr_rerank(
        load_table(spark, sf_dir, "embeddings"), query_id=0, n_candidates=20, k=5
    )


def _mmr_sql(k: int = 5, n_candidates: int = 20) -> str:
    cos_q = (
        "ROUND(list_dot_product((SELECT qv FROM q), nv) / "
        "(sqrt(list_dot_product((SELECT qv FROM q), (SELECT qv FROM q))) * "
        "sqrt(list_dot_product(nv, nv))), 6)"
    )
    parts = [
        "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)",
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings)",
        f"sq AS MATERIALIZED (SELECT vec_id, {cos_q} AS sim_q FROM v WHERE vec_id <> 0)",
        f"cand AS MATERIALIZED (SELECT vec_id, sim_q FROM sq "
        f"ORDER BY sim_q DESC, vec_id LIMIT {n_candidates})",
        "cv AS MATERIALIZED (SELECT v.vec_id, v.nv FROM v "
        "JOIN cand c ON v.vec_id = c.vec_id)",
        "cs AS MATERIALIZED (SELECT a.vec_id AS i, b.vec_id AS j, "
        "ROUND(list_dot_product(a.nv, b.nv) / (sqrt(list_dot_product(a.nv, a.nv)) "
        "* sqrt(list_dot_product(b.nv, b.nv))), 6) AS s "
        "FROM cv a JOIN cv b ON a.vec_id <> b.vec_id)",
        "sel1 AS MATERIALIZED (SELECT 1 AS rnk, vec_id, sim_q, sim_q AS mmr_score "
        "FROM cand ORDER BY sim_q DESC, vec_id LIMIT 1)",
        "acc1 AS MATERIALIZED (SELECT * FROM sel1)",
    ]
    for r in range(2, k + 1):
        parts.append(
            f"sc{r} AS (SELECT c.vec_id, c.sim_q, "
            "CAST(0.5 AS DOUBLE) * c.sim_q - CAST(0.5 AS DOUBLE) * MAX(cs.s) AS m "
            f"FROM cand c JOIN cs ON cs.i = c.vec_id "
            f"JOIN acc{r-1} s ON cs.j = s.vec_id "
            f"WHERE c.vec_id NOT IN (SELECT vec_id FROM acc{r-1}) "
            "GROUP BY c.vec_id, c.sim_q)"
        )
        parts.append(
            f"sel{r} AS MATERIALIZED (SELECT {r} AS rnk, vec_id, sim_q, m AS mmr_score "
            f"FROM sc{r} ORDER BY m DESC, vec_id LIMIT 1)"
        )
        parts.append(
            f"acc{r} AS MATERIALIZED (SELECT * FROM acc{r-1} "
            f"UNION ALL SELECT * FROM sel{r})"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT CAST(rnk AS INT) AS rank, vec_id, sim_q, mmr_score FROM acc{k}"
    )


_ORACLES["mmr_rerank_5"] = _mmr_sql()


# ---------------------------------------------------------------------------
# HLL mergeability proof over daily buckets (pipeline/sketches.py)
# ---------------------------------------------------------------------------
def _q_hll_merge(spark, sf_dir):
    """Per-day HLL register sketches max-merged across days vs the
    single-pass global sketch: both Z sums exact BIGINTs, so the
    mergeability theorem (MAX is the combine) is hash-verified —
    merged_zset must equal global_zset."""
    from dachshund_spark.pipeline.sketches import hll_registers

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").cast("string").alias("day"),
        F.col("user_id").cast("string").alias("u"),
    )
    daily = hll_registers(ev, ["day"], "u")
    merged = daily.groupBy("reg").agg(F.max("rho").alias("rho"))
    glob = hll_registers(ev.select("u"), [], "u")

    def zagg(regs, pfx):
        return regs.agg(
            F.count(F.lit(1)).cast("long").alias(f"{pfx}_registers_set"),
            F.sum(
                F.expr("cast(shiftleft(1L, cast(40 - rho as int)) as long)")
            )
            .cast("long")
            .alias(f"{pfx}_zset"),
        )

    nd = ev.agg(F.countDistinct("day").cast("long").alias("n_days"))
    ex = ev.agg(F.countDistinct("u").cast("long").alias("exact_distinct"))
    return (
        nd.crossJoin(zagg(merged, "merged"))
        .crossJoin(zagg(glob, "global"))
        .crossJoin(ex)
    )


def _hll_merge_sql(p: int = 8, rcap: int = 40, seed: int = 0) -> str:
    m = 1 << p
    hb = 60
    h = MD5L.format(x=f"concat_ws('#', {seed}, 'hll', u)")
    return (
        "WITH ev AS MATERIALIZED (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, "
        "CAST(user_id AS VARCHAR) AS u FROM events), "
        f"hh AS MATERIALIZED (SELECT day, u, {h} AS h FROM ev), "
        f"rr AS MATERIALIZED (SELECT day, h % {m} AS reg, "
        f"LEAST(CASE WHEN (h >> {p}) = 0 THEN {hb - p + 1} "
        f"ELSE {hb - p} - length(to_base(h >> {p}, 2)) + 1 END, {rcap}) AS rho FROM hh), "
        "daily AS MATERIALIZED (SELECT day, reg, MAX(rho) AS rho FROM rr GROUP BY 1, 2), "
        "merged AS (SELECT reg, MAX(rho) AS rho FROM daily GROUP BY reg), "
        "gsk AS (SELECT reg, MAX(rho) AS rho FROM rr GROUP BY reg), "
        "zm AS (SELECT CAST(COUNT(*) AS BIGINT) AS merged_registers_set, "
        f"CAST(SUM(CAST(1 AS BIGINT) << CAST({rcap} - rho AS INT)) AS BIGINT) "
        "AS merged_zset FROM merged), "
        "zg AS (SELECT CAST(COUNT(*) AS BIGINT) AS global_registers_set, "
        f"CAST(SUM(CAST(1 AS BIGINT) << CAST({rcap} - rho AS INT)) AS BIGINT) "
        "AS global_zset FROM gsk), "
        "nd AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days FROM ev), "
        "ex AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS exact_distinct FROM ev) "
        "SELECT nd.n_days, zm.merged_registers_set, zm.merged_zset, "
        "zg.global_registers_set, zg.global_zset, ex.exact_distinct "
        "FROM nd, zm, zg, ex"
    )


_ORACLES["hll_merge_daily"] = _hll_merge_sql()


# ---------------------------------------------------------------------------
# Recrawl scheduling from snapshot churn (algorithms/delta.py)
# ---------------------------------------------------------------------------
def _q_recrawl(spark, sf_dir):
    """Cho-Garcia-Molina recrawl intervals from three overlapping edge
    snapshots: per-page out-link fingerprints (sum of dst md5 mod 2^40
    over DISTINCT dst + out-degree), changes counted over consecutive
    pairs, mapped (0,1,2)→(30,7,1) days — exact integers throughout."""
    from dachshund_spark.algorithms.delta import recrawl_intervals

    li = load_table(spark, sf_dir, "lineitem")

    def snap(lo, hi):
        return li.where(
            (F.col("l_linenumber") >= lo) & (F.col("l_linenumber") <= hi)
        ).select(
            (F.col("l_orderkey") % N_NODES).alias("src"),
            (F.col("l_partkey") % N_NODES).alias("dst"),
        ).where(F.col("src") != F.col("dst"))

    return recrawl_intervals([snap(1, 4), snap(2, 5), snap(3, 7)])


def _recrawl_sql() -> str:
    fp = (
        "SELECT src, CAST(SUM(CAST(('0x' || substr(md5(CAST(dst AS VARCHAR)), 1, 15)) "
        "AS BIGINT) % 1099511627776 ) AS BIGINT) AS fp, "
        "CAST(COUNT(*) AS BIGINT) AS od FROM s{i} GROUP BY src"
    )
    snaps = {0: (1, 4), 1: (2, 5), 2: (3, 7)}
    parts = []
    for i, (lo, hi) in snaps.items():
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT DISTINCT l_orderkey % {N_NODES} AS src, "
            f"l_partkey % {N_NODES} AS dst FROM lineitem "
            f"WHERE l_linenumber BETWEEN {lo} AND {hi} "
            f"AND l_orderkey % {N_NODES} <> l_partkey % {N_NODES})"
        )
        parts.append(f"f{i} AS MATERIALIZED ({fp.format(i=i)})")
    parts.append(
        "uni AS (SELECT DISTINCT src FROM "
        "(SELECT src FROM f0 UNION ALL SELECT src FROM f1 UNION ALL SELECT src FROM f2))"
    )
    parts.append(
        "j AS (SELECT u.src, "
        "COALESCE(f0.fp, -1) AS fp0, COALESCE(f0.od, 0) AS od0, "
        "COALESCE(f1.fp, -1) AS fp1, COALESCE(f1.od, 0) AS od1, "
        "COALESCE(f2.fp, -1) AS fp2, COALESCE(f2.od, 0) AS od2 "
        "FROM uni u LEFT JOIN f0 ON u.src = f0.src "
        "LEFT JOIN f1 ON u.src = f1.src LEFT JOIN f2 ON u.src = f2.src)"
    )
    chg = (
        "(CASE WHEN fp0 <> fp1 OR od0 <> od1 THEN 1 ELSE 0 END "
        "+ CASE WHEN fp1 <> fp2 OR od1 <> od2 THEN 1 ELSE 0 END)"
    )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT src, CAST({chg} AS BIGINT) AS n_changes, "
        f"CAST(CASE {chg} WHEN 0 THEN 30 WHEN 1 THEN 7 ELSE 1 END AS BIGINT) "
        "AS recrawl_days FROM j"
    )


_ORACLES["recrawl_intervals_3"] = _recrawl_sql()


# ---------------------------------------------------------------------------
# Per-source language mix (pipeline/text.py)
# ---------------------------------------------------------------------------
def _q_source_lang_mix(spark, sf_dir):
    """Per-source language census: majority language (ties → smallest
    code) with exact integer share, via MAX(n) + MIN(lang) among
    arg-max rows — no engine-specific arg_max."""
    from dachshund_spark.pipeline.text import source_language_mix

    return source_language_mix(load_table(spark, sf_dir, "documents"))


_SOURCE_LANG_SQL = (
    "WITH per AS MATERIALIZED (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM documents GROUP BY source, lang), "
    "tot AS MATERIALIZED (SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs, "
    "CAST(COUNT(*) AS BIGINT) AS n_langs, CAST(MAX(n) AS BIGINT) AS n_top "
    "FROM per GROUP BY source), "
    "top AS (SELECT p.source, MIN(p.lang) AS top_lang "
    "FROM per p JOIN tot t ON p.source = t.source AND p.n = t.n_top "
    "GROUP BY p.source) "
    "SELECT t.source, t.n_docs, t.n_langs, top.top_lang, "
    "CAST(t.n_top * 100000000 // t.n_docs AS BIGINT) AS top_share_e8 "
    "FROM tot t JOIN top ON t.source = top.source"
)

_ORACLES["source_lang_mix"] = _SOURCE_LANG_SQL


# ---------------------------------------------------------------------------
# Event Markov stationary distribution (relational.py)
# ---------------------------------------------------------------------------
def _q_event_markov(spark, sf_dir):
    """8-round integer power iteration over the event-type Markov
    chain: e12 BIGINT mass, per-term truncating division — the unrolled
    oracle replays every round bit-for-bit."""
    from dachshund_spark.relational import event_markov_stationary

    return event_markov_stationary(load_table(spark, sf_dir, "events"), iterations=8)


def _event_markov_sql(iters: int = 8, scale: int = 10**12) -> str:
    parts = [
        "mkpairs AS MATERIALIZED (SELECT src_type, dst_type FROM "
        "(SELECT event_type AS src_type, LEAD(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS dst_type FROM events) "
        "WHERE dst_type IS NOT NULL)",
        "mktr AS MATERIALIZED (SELECT src_type, dst_type, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM mkpairs GROUP BY 1, 2)",
        "mkrg AS MATERIALIZED (SELECT src_type, CAST(SUM(c) AS BIGINT) AS r "
        "FROM mktr GROUP BY 1)",
        "mkty AS MATERIALIZED (SELECT DISTINCT t FROM "
        "(SELECT src_type AS t FROM mkpairs UNION ALL "
        "SELECT dst_type FROM mkpairs))",
        f"mks0 AS MATERIALIZED (SELECT t, CAST({scale} // "
        "(SELECT COUNT(*) FROM mkty) AS BIGINT) AS s FROM mkty)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"mks{k} AS MATERIALIZED (SELECT tr.dst_type AS t, "
            "CAST(SUM((s.s * tr.c) // g.r) AS BIGINT) AS s "
            f"FROM mks{k-1} s JOIN mktr tr ON s.t = tr.src_type "
            "JOIN mkrg g ON tr.src_type = g.src_type GROUP BY tr.dst_type)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT ty.t AS event_type, CAST(COALESCE(s.s, 0) AS BIGINT) "
        f"AS stationary_e12 FROM mkty ty LEFT JOIN mks{iters} s ON ty.t = s.t"
    )


_ORACLES["event_markov_8"] = _event_markov_sql()


# ---------------------------------------------------------------------------
# Spearman(PageRank, degree) — two-phase ranks (algorithms/stats.py)
# ---------------------------------------------------------------------------
def _q_spearman(spark, sf_dir):
    """Spearman rho between PageRank (10 iters, round-8) and degree:
    deterministic tie-broken total ranks (no global window — two-phase
    bucketed row_number), exact BIGINT sum of squared rank gaps, one
    division."""
    from dachshund_spark.algorithms.stats import spearman_pagerank_degree

    return spearman_pagerank_degree(derived_graph(spark, sf_dir), iterations=10)


def _spearman_sql() -> str:
    pr = _pagerank_sql()
    return (
        f"WITH spr AS MATERIALIZED ({pr}), "
        "sdeg AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS degree FROM "
        "(SELECT DISTINCT src, dst FROM (SELECT src, dst FROM ("
        f"{EDGES_SQL}) e0 UNION ALL SELECT dst AS src, src AS dst FROM ("
        f"{EDGES_SQL}) e1)) GROUP BY src), "
        "j AS MATERIALIZED (SELECT p.node_id, "
        "ROW_NUMBER() OVER (ORDER BY p.pagerank, p.node_id) AS rank_pr, "
        "ROW_NUMBER() OVER (ORDER BY d.degree, p.node_id) AS rank_deg "
        "FROM spr p JOIN sdeg d ON p.node_id = d.node_id), "
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes, "
        "CAST(SUM((rank_pr - rank_deg) * (rank_pr - rank_deg)) AS BIGINT) "
        "AS sum_d2 FROM j) "
        "SELECT n_nodes, sum_d2, "
        "1.0 - CAST(6 * sum_d2 AS DOUBLE) / "
        "CAST(n_nodes * (n_nodes * n_nodes - 1) AS DOUBLE) AS spearman FROM s"
    )


_ORACLES["spearman_pr_degree"] = _spearman_sql()


# ---------------------------------------------------------------------------
# Configuration-model clustering expectation (algorithms/stats.py)
# ---------------------------------------------------------------------------
def _q_config_model(spark, sf_dir):
    """Observed transitivity vs the Newman configuration-model
    expectation from exact degree moments — the closed-form null beside
    motif_significance's empirical rewiring null."""
    from dachshund_spark.algorithms.stats import configuration_model_check

    return configuration_model_check(derived_graph(spark, sf_dir))


_CONFIG_MODEL_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_N}, {SQL_CANON}, {SQL_DEG}, {SQL_TRI}, "
    "mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes, "
    "CAST(SUM(degree) AS BIGINT) AS s1, "
    "CAST(SUM(degree * degree) AS BIGINT) AS s2 FROM deg), "
    "tc AS (SELECT CAST(COUNT(*) * 3 AS BIGINT) AS triangles3 FROM tri) "
    "SELECT n_nodes, s1, s2, triangles3, "
    "CAST((s2 - s1) // 2 AS BIGINT) AS wedges, "
    "CAST(triangles3 AS DOUBLE) / CAST((s2 - s1) // 2 AS DOUBLE) AS transitivity, "
    "CAST((s2 - s1) AS DOUBLE) * CAST((s2 - s1) AS DOUBLE) * CAST(n_nodes AS DOUBLE) "
    "/ (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) AS c_expected, "
    "(CAST(triangles3 AS DOUBLE) / CAST((s2 - s1) // 2 AS DOUBLE)) / "
    "(CAST((s2 - s1) AS DOUBLE) * CAST((s2 - s1) AS DOUBLE) * CAST(n_nodes AS DOUBLE) "
    "/ (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))) AS excess_ratio "
    "FROM mom, tc"
)

_ORACLES["config_model_check"] = _CONFIG_MODEL_SQL


# ---------------------------------------------------------------------------
# Backward as-of join: click→purchase attribution (relational.py)
# ---------------------------------------------------------------------------
def _q_asof_attribution(spark, sf_dir):
    """asof_join(purchases, clicks) per user, 30-minute tolerance:
    union + per-key windowed MAX over a struct — no non-equi range
    join; gap arithmetic is timezone-invariant."""
    from dachshund_spark.relational import asof_join

    ev = load_table(spark, sf_dir, "events")
    out = asof_join(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        on="user_id",
        tolerance_s=1800,
    )
    return out.select("event_id", "user_id", "matched_event_id", "gap_s")


_ASOF_SQL = (
    # epoch MICROSECONDS (epoch_us == Spark unix_micros) — second-granular
    # epochs floor in Spark but round in DuckDB on sub-second timestamps.
    "WITH au AS MATERIALIZED ("
    "SELECT user_id AS k, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS t, "
    "1 AS kind, event_id AS lid, CAST(NULL AS BIGINT) AS rid "
    "FROM events WHERE event_type = 'purchase' "
    "UNION ALL "
    "SELECT user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT), "
    "0, CAST(NULL AS BIGINT), event_id "
    "FROM events WHERE event_type = 'click'), "
    "ac AS (SELECT k, t, kind, lid, "
    "MAX(CASE WHEN kind = 0 THEN {'t': t, 'i': rid} END) OVER "
    "(PARTITION BY k ORDER BY t, kind, rid "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lr FROM au) "
    "SELECT lid AS event_id, k AS user_id, "
    "CASE WHEN lr IS NOT NULL AND t - lr.t <= 1800000000 THEN lr.i END "
    "AS matched_event_id, "
    "CASE WHEN lr IS NOT NULL AND t - lr.t <= 1800000000 "
    "THEN CAST((t - lr.t) // 1000000 AS BIGINT) END AS gap_s "
    "FROM ac WHERE kind = 1"
)

_ORACLES["asof_attribution_30m"] = _ASOF_SQL


# ---------------------------------------------------------------------------
# Degree-distribution entropy (algorithms/stats.py)
# ---------------------------------------------------------------------------
def _q_degree_entropy(spark, sf_dir):
    """Shannon entropy of the degree distribution: e8 pre-rounded ln
    terms weighted by exact histogram counts, one final division."""
    from dachshund_spark.algorithms.stats import degree_entropy

    return degree_entropy(derived_graph(spark, sf_dir))


_DEGREE_ENTROPY_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_DEG}, "
    "hist AS MATERIALIZED (SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_k "
    "FROM deg GROUP BY degree), "
    "tot AS (SELECT CAST(SUM(n_k) AS BIGINT) AS n FROM hist), "
    "terms AS (SELECT (SELECT n FROM tot) AS n, "
    f"n_k * ({_E8LN.format(x='(SELECT n FROM tot)')} - {_E8LN.format(x='n_k')}) "
    "AS term FROM hist) "
    "SELECT n AS n_nodes, CAST(COUNT(*) AS BIGINT) AS n_distinct_degrees, "
    "CAST(SUM(term) AS BIGINT) AS h_e8_sum, "
    "CAST(SUM(term) AS DOUBLE) / (CAST(n AS DOUBLE) * 100000000.0) AS entropy "
    "FROM terms GROUP BY n"
)

_ORACLES["degree_entropy"] = _DEGREE_ENTROPY_SQL


# ---------------------------------------------------------------------------
# TPC-H Q7-shaped volume shipping (relational.py)
# ---------------------------------------------------------------------------
def _q_volume_shipping(spark, sf_dir):
    """Cross-region trade volume per ship year (ASIA<->EUROPE, both
    directions): nation⋈region folded into one broadcast dim used
    twice, e4-integer revenue."""
    from dachshund_spark.relational import volume_shipping

    return volume_shipping(
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


_VOLUME_SHIPPING_SQL = (
    "WITH vnr AS (SELECT n_nationkey, r_name FROM nation n "
    "JOIN region r ON n.n_regionkey = r.r_regionkey) "
    "SELECT sr AS supp_region, cr AS cust_region, l_year, "
    "CAST(SUM(rev) AS BIGINT) AS revenue_e4 FROM ("
    "SELECT ns.r_name AS sr, nc.r_name AS cr, "
    "CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year, "
    "CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000, 0) AS BIGINT) "
    "AS rev "
    "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN vnr ns ON s.s_nationkey = ns.n_nationkey "
    "JOIN vnr nc ON c.c_nationkey = nc.n_nationkey "
    "WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l.l_shipdate <= TIMESTAMP '1998-12-31') "
    "WHERE (sr = 'ASIA' AND cr = 'EUROPE') OR (sr = 'EUROPE' AND cr = 'ASIA') "
    "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
)

_ORACLES["volume_shipping"] = _VOLUME_SHIPPING_SQL


# ---------------------------------------------------------------------------
# TPC-H Q8-shaped market share (relational.py)
# ---------------------------------------------------------------------------
def _q_market_share(spark, sf_dir):
    """NATION_3's share of EUROPE-customer PROMO revenue per order
    year: numerator and denominator exact e4 BIGINTs, share = one raw
    IEEE division."""
    from dachshund_spark.relational import market_share

    return market_share(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


_MARKET_SHARE_SQL = (
    "WITH msnr AS (SELECT n_nationkey, n_name, r_name FROM nation n "
    "JOIN region r ON n.n_regionkey = r.r_regionkey), "
    "msj AS (SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year, "
    "ns.n_name AS supp_nation, "
    "CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000, 0) AS BIGINT) "
    "AS rev "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN msnr ns ON s.s_nationkey = ns.n_nationkey "
    "JOIN msnr nc ON c.c_nationkey = nc.n_nationkey "
    "WHERE p.p_type = 'PROMO' AND nc.r_name = 'EUROPE' "
    "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
    "AND o.o_orderdate <= TIMESTAMP '1998-12-31'), "
    "msa AS (SELECT o_year, "
    "CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END) AS BIGINT) "
    "AS nation_rev_e4, CAST(SUM(rev) AS BIGINT) AS total_rev_e4 "
    "FROM msj GROUP BY o_year) "
    "SELECT o_year, nation_rev_e4, total_rev_e4, "
    "CAST(nation_rev_e4 AS DOUBLE) / CAST(total_rev_e4 AS DOUBLE) AS mkt_share "
    "FROM msa ORDER BY o_year"
)

_ORACLES["market_share"] = _MARKET_SHARE_SQL


# ---------------------------------------------------------------------------
# TPC-H Q13-shaped customer order distribution (relational.py)
# ---------------------------------------------------------------------------
def _q_cust_order_dist(spark, sf_dir):
    """Order-count histogram over ALL customers (zero-order customers
    included via left join); priority exclusion stands in for Q13's
    comment filter."""
    from dachshund_spark.relational import customer_order_distribution

    return customer_order_distribution(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
    )


_CUST_ORDER_DIST_SQL = (
    "WITH codpc AS (SELECT c.c_custkey, "
    "CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count "
    "FROM customer c LEFT JOIN "
    "(SELECT o_orderkey, o_custkey FROM orders "
    "WHERE o_orderpriority <> '5-LOW') o "
    "ON c.c_custkey = o.o_custkey GROUP BY c.c_custkey) "
    "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM codpc "
    "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
)

_ORACLES["cust_order_dist"] = _CUST_ORDER_DIST_SQL


# ---------------------------------------------------------------------------
# TPC-H Q14-shaped promotion effect (relational.py)
# ---------------------------------------------------------------------------
def _q_promo_effect(spark, sf_dir):
    """One month's PROMO revenue share: exact e4 sums, percentage is
    one shared 100.0*x/y IEEE tree."""
    from dachshund_spark.relational import promo_revenue_effect

    return promo_revenue_effect(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


_PROMO_EFFECT_SQL = (
    "WITH pej AS (SELECT p.p_type, "
    "CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000, 0) AS BIGINT) "
    "AS rev "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
    "WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' "
    "AND l.l_shipdate < TIMESTAMP '1997-10-01'), "
    "pea AS (SELECT "
    "CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) "
    "AS promo_rev_e4, CAST(SUM(rev) AS BIGINT) AS total_rev_e4 FROM pej) "
    "SELECT promo_rev_e4, total_rev_e4, "
    "100.0 * CAST(promo_rev_e4 AS DOUBLE) / CAST(total_rev_e4 AS DOUBLE) "
    "AS promo_share_pct FROM pea"
)

_ORACLES["promo_effect"] = _PROMO_EFFECT_SQL


# ---------------------------------------------------------------------------
# TPC-H Q18-shaped large-volume customers (relational.py)
# ---------------------------------------------------------------------------
def _q_large_volume_customers(spark, sf_dir):
    """Top-20 orders by total price whose summed line quantity exceeds
    150 (exact BIGINT quantities), with their customer."""
    from dachshund_spark.relational import large_volume_customers

    return large_volume_customers(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


_LARGE_VOLUME_SQL = (
    "WITH lvb AS (SELECT l_orderkey, "
    "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
    "FROM lineitem GROUP BY l_orderkey "
    "HAVING CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) > 150) "
    "SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, "
    "CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS totalprice_cents, "
    "b.sum_qty "
    "FROM lvb b JOIN orders o ON b.l_orderkey = o.o_orderkey "
    "JOIN customer c ON o.o_custkey = c.c_custkey "
    "ORDER BY totalprice_cents DESC, o.o_orderkey ASC LIMIT 20"
)

_ORACLES["large_volume_customers"] = _LARGE_VOLUME_SQL


# ---------------------------------------------------------------------------
# TPC-H Q17-shaped small-quantity revenue (relational.py)
# ---------------------------------------------------------------------------
def _q_small_qty_revenue(spark, sf_dir):
    """Revenue locked in sub-20%-of-average-quantity Brand#1 lines:
    cleared-denominator 5·n·qty < Σqty integer predicate, exact cents,
    one shared /700.0 division."""
    from dachshund_spark.relational import small_quantity_revenue

    return small_quantity_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


_SMALL_QTY_SQL = (
    "WITH sqr AS (SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty, "
    "CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS cents "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
    "WHERE p.p_brand = 'Brand#1'), "
    "sqs AS (SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS s, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM sqr GROUP BY l_partkey), "
    "sqa AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "CAST(SUM(r.cents) AS BIGINT) AS sum_price_cents "
    "FROM sqr r JOIN sqs st ON r.l_partkey = st.l_partkey "
    "WHERE 5 * st.n * r.qty < st.s) "
    "SELECT n_rows, sum_price_cents, "
    "CAST(sum_price_cents AS DOUBLE) / 700.0 AS avg_yearly FROM sqa"
)

_ORACLES["small_qty_revenue"] = _SMALL_QTY_SQL


# ---------------------------------------------------------------------------
# TPC-H Q19-shaped discounted revenue (relational.py)
# ---------------------------------------------------------------------------
def _q_discounted_revenue(spark, sf_dir):
    """OR-of-ANDs (brand, quantity-band, size-band) channel revenue:
    exact e4 scalar over the broadcast part join."""
    from dachshund_spark.relational import discounted_revenue

    return discounted_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


_DISCOUNTED_REV_SQL = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000, 0) "
    "AS BIGINT)) AS BIGINT) AS revenue_e4 "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
    "WHERE (p.p_brand = 'Brand#1' AND CAST(l.l_quantity AS BIGINT) "
    "BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 5) "
    "OR (p.p_brand = 'Brand#2' AND CAST(l.l_quantity AS BIGINT) "
    "BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10) "
    "OR (p.p_brand = 'Brand#3' AND CAST(l.l_quantity AS BIGINT) "
    "BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)"
)

_ORACLES["discounted_revenue"] = _DISCOUNTED_REV_SQL


# ---------------------------------------------------------------------------
# TPC-H Q21-shaped sole-late-supplier census (relational.py)
# ---------------------------------------------------------------------------
def _q_sole_late_suppliers(spark, sf_dir):
    """Suppliers who were the only late shipper on finished
    multi-supplier orders (late = >90 days after order date): the
    EXISTS/NOT-EXISTS pair as one flag + one per-order count, no
    correlated subqueries."""
    from dachshund_spark.relational import sole_late_suppliers

    return sole_late_suppliers(
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
    )


_SOLE_LATE_SQL = (
    "WITH slp AS (SELECT l.l_orderkey, l.l_suppkey, "
    "MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY "
    "THEN 1 ELSE 0 END) AS late "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "WHERE o.o_orderstatus = 'F' GROUP BY l.l_orderkey, l.l_suppkey), "
    "sla AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_supp, "
    "CAST(SUM(late) AS BIGINT) AS n_late FROM slp GROUP BY l_orderkey) "
    "SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait "
    "FROM slp JOIN sla ON slp.l_orderkey = sla.l_orderkey "
    "JOIN supplier s ON slp.l_suppkey = s.s_suppkey "
    "WHERE slp.late = 1 AND sla.n_supp >= 2 AND sla.n_late = 1 "
    "GROUP BY s.s_name ORDER BY numwait DESC, s.s_name ASC LIMIT 20"
)

_ORACLES["sole_late_suppliers"] = _SOLE_LATE_SQL


# ---------------------------------------------------------------------------
# TPC-H Q22-shaped dormant rich customers (relational.py)
# ---------------------------------------------------------------------------
def _q_dormant_rich(spark, sf_dir):
    """Per-nation census of above-average-balance customers with no
    recent orders: cleared-denominator cents·n > Σcents compare,
    left-anti dormancy join."""
    from dachshund_spark.relational import dormant_rich_customers

    return dormant_rich_customers(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "nation"),
    )


_DORMANT_RICH_SQL = (
    "WITH drc AS (SELECT c_custkey, c_nationkey, "
    "CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents FROM customer "
    "WHERE c_nationkey IN (0,1,2,3,4,5,6,7,8,9)), "
    "dra AS (SELECT CAST(SUM(cents) AS BIGINT) AS s, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM drc WHERE cents > 0) "
    "SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust, "
    "CAST(SUM(cents) AS BIGINT) AS total_acctbal_cents "
    "FROM drc, dra JOIN nation ON drc.c_nationkey = nation.n_nationkey "
    "WHERE drc.cents * dra.n > dra.s "
    "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = drc.c_custkey "
    "AND o.o_orderdate >= TIMESTAMP '1999-07-01') "
    "GROUP BY n_name ORDER BY n_name"
)

_ORACLES["dormant_rich_customers"] = _DORMANT_RICH_SQL


# ---------------------------------------------------------------------------
# TPC-H Q15-shaped top-revenue supplier (relational.py)
# ---------------------------------------------------------------------------
def _q_top_supplier(spark, sf_dir):
    """All suppliers tied for max quarterly shipped revenue — the Q15
    view + scalar-max shape; e4-integer revenue makes the tie predicate
    engine-exact."""
    from dachshund_spark.relational import top_revenue_suppliers

    return top_revenue_suppliers(
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
    )


_TOP_SUPPLIER_SQL = (
    "WITH rev AS MATERIALIZED (SELECT l_suppkey, "
    "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) "
    "AS BIGINT)) AS BIGINT) AS total_revenue_e4 FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
    "SELECT s_suppkey, s_name, total_revenue_e4 "
    "FROM rev JOIN supplier ON l_suppkey = s_suppkey "
    "WHERE total_revenue_e4 = (SELECT MAX(total_revenue_e4) FROM rev) "
    "ORDER BY s_suppkey"
)

_ORACLES["top_supplier_q15"] = _TOP_SUPPLIER_SQL


# ---------------------------------------------------------------------------
# RFM segmentation over the event stream (relational.py)
# ---------------------------------------------------------------------------
def _q_rfm(spark, sf_dir):
    """Quartile RFM scores via the histogram-cumsum exact-quantile
    machinery — no NTILE / global sort; strict-compare bucketing is
    tie-deterministic in both engines."""
    from dachshund_spark.relational import rfm_segments

    return rfm_segments(load_table(spark, sf_dir, "events"))


def _rfm_sql() -> str:
    parts = [
        "pu AS MATERIALIZED (SELECT user_id, "
        "date_diff('day', MAX(CAST(ts AS DATE)), "
        "(SELECT MAX(CAST(ts AS DATE)) FROM events)) AS recency_days, "
        "CAST(COUNT(*) AS BIGINT) AS frequency, "
        "CAST(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)) AS BIGINT) "
        "AS monetary_e4 FROM events GROUP BY user_id)",
        "nn AS (SELECT COUNT(*) AS n FROM pu)",
    ]
    for m in ("recency_days", "frequency", "monetary_e4"):
        parts.append(
            f"h_{m} AS (SELECT {m} AS val, COUNT(*) AS cnt FROM pu GROUP BY 1)"
        )
        parts.append(
            f"c_{m} AS (SELECT val, SUM(cnt) OVER (ORDER BY val "
            f"ROWS UNBOUNDED PRECEDING) AS cum FROM h_{m})"
        )
        parts.append(
            f"t_{m} AS (SELECT "
            "MIN(CASE WHEN cum >= (1 * (SELECT n FROM nn) + 3) // 4 THEN val END) AS p25, "
            "MIN(CASE WHEN cum >= (1 * (SELECT n FROM nn) + 1) // 2 THEN val END) AS p50, "
            "MIN(CASE WHEN cum >= (3 * (SELECT n FROM nn) + 3) // 4 THEN val END) AS p75 "
            f"FROM c_{m})"
        )
    score_r = (
        "CAST(1 + CAST(pu.recency_days < t_recency_days.p25 AS INTEGER) "
        "+ CAST(pu.recency_days < t_recency_days.p50 AS INTEGER) "
        "+ CAST(pu.recency_days < t_recency_days.p75 AS INTEGER) AS BIGINT)"
    )
    score_f = (
        "CAST(1 + CAST(pu.frequency > t_frequency.p25 AS INTEGER) "
        "+ CAST(pu.frequency > t_frequency.p50 AS INTEGER) "
        "+ CAST(pu.frequency > t_frequency.p75 AS INTEGER) AS BIGINT)"
    )
    score_m = (
        "CAST(1 + CAST(pu.monetary_e4 > t_monetary_e4.p25 AS INTEGER) "
        "+ CAST(pu.monetary_e4 > t_monetary_e4.p50 AS INTEGER) "
        "+ CAST(pu.monetary_e4 > t_monetary_e4.p75 AS INTEGER) AS BIGINT)"
    )
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days, "
        "frequency, monetary_e4, "
        f"{score_r} AS r_score, {score_f} AS f_score, {score_m} AS m_score, "
        f"CAST(({score_r}) * 100 + ({score_f}) * 10 + ({score_m}) AS BIGINT) AS rfm "
        "FROM pu, t_recency_days, t_frequency, t_monetary_e4"
    )


_ORACLES["rfm_segments"] = _rfm_sql()


# ---------------------------------------------------------------------------
# Gaps-and-islands activity streaks (relational.py)
# ---------------------------------------------------------------------------
def _q_streaks(spark, sf_dir):
    """Longest/last consecutive-day activity streak per user — island
    anchor = day − row_number(day); user-partitioned windows only."""
    from dachshund_spark.relational import activity_streaks

    return activity_streaks(load_table(spark, sf_dir, "events"))


_STREAKS_SQL = (
    "WITH days AS MATERIALIZED (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
    "FROM events), "
    "isl AS (SELECT user_id, day, day - CAST(ROW_NUMBER() OVER "
    "(PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor FROM days), "
    "st AS (SELECT user_id, anchor, COUNT(*) AS len, MAX(day) AS last_day "
    "FROM isl GROUP BY 1, 2) "
    "SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days, "
    "CAST(COUNT(*) AS BIGINT) AS n_streaks, "
    "CAST(MAX(len) AS BIGINT) AS longest_streak, "
    "CAST(ARG_MAX(len, last_day) AS BIGINT) AS last_streak_len "
    "FROM st GROUP BY user_id"
)

_ORACLES["activity_streaks"] = _STREAKS_SQL


# ---------------------------------------------------------------------------
# C4-style line-level filtering census (pipeline/text.py)
# ---------------------------------------------------------------------------
def _q_c4_lines(spark, sf_dir):
    """C4 line filters (terminal punct + ≥5 words + brace/js bans)
    over readability-style injected sentence boundaries."""
    from dachshund_spark.pipeline.text import c4_line_filters

    return c4_line_filters(load_table(spark, sf_dir, "documents"))


_C4_LINES_SQL = (
    "WITH t AS (SELECT doc_id, replace(text, ' the ', '. the ') AS tx "
    "FROM documents), "
    "ls AS MATERIALIZED (SELECT doc_id, string_split(tx, '. ') AS ln FROM t), "
    "ex AS (SELECT doc_id, len(ln) AS n_lines, i AS pos, ln[i + 1] AS line "
    "FROM ls, UNNEST(range(len(ln))) AS r(i)), "
    "pl AS (SELECT doc_id, n_lines, len(string_split(line, ' ')) AS nw, "
    "CASE WHEN pos < n_lines - 1 AND len(string_split(line, ' ')) >= 5 "
    "AND NOT contains(line, '{') AND NOT contains(line, 'javascript') "
    "THEN 1 ELSE 0 END AS kept FROM ex) "
    "SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines, "
    "CAST(SUM(kept) AS BIGINT) AS n_kept, "
    "CAST(SUM(nw) AS BIGINT) AS total_words, "
    "CAST(SUM(nw * kept) AS BIGINT) AS kept_words, "
    "(SUM(kept) >= 3) AS doc_kept "
    "FROM pl GROUP BY doc_id, n_lines"
)

_ORACLES["c4_line_filters"] = _C4_LINES_SQL


# ---------------------------------------------------------------------------
# Mojibake / encoding-health census (pipeline/text.py)
# ---------------------------------------------------------------------------
def _q_mojibake(spark, sf_dir):
    """Encoding census over a deterministically double-encoded corpus
    (docs ≡ 0 mod 7 corrupted 'a'→'Ã¡' in BOTH engines) — the detector
    itself is what the oracle pins."""
    from dachshund_spark.pipeline.text import inject_mojibake, mojibake_census

    docs = inject_mojibake(load_table(spark, sf_dir, "documents"), every=7)
    return mojibake_census(docs)


_MOJIBAKE_SQL = (
    "WITH c AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 "
    "THEN replace(text, 'a', 'Ã¡') ELSE text END AS tx FROM documents), "
    "m AS (SELECT doc_id, length(tx) AS n_chars, "
    "length(regexp_replace(tx, '[^ -~]', '', 'g')) AS n_ascii, "
    "length(tx) - length(replace(tx, 'Ã', '')) AS n_moji FROM c) "
    "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, "
    "CAST(n_chars - n_ascii AS BIGINT) AS n_nonascii, "
    "CAST(n_moji AS BIGINT) AS n_moji_markers, "
    "CAST(n_ascii * 100000000 // n_chars AS BIGINT) AS ascii_ratio_e8, "
    "n_moji > 0 AS moji_flag FROM m"
)

_ORACLES["mojibake_census"] = _MOJIBAKE_SQL


# ---------------------------------------------------------------------------
# Outlink host-entropy (pages/extract.py)
# ---------------------------------------------------------------------------
def _q_outlink_entropy(spark, sf_dir):
    """Per-host outlink diversity over the host-reduced link graph —
    e8-integer entropy terms, single final division."""
    from dachshund_spark.pages.extract import outlink_host_entropy

    g = derived_graph(spark, sf_dir)
    urls = g.nodes().select(
        "node_id",
        F.concat(
            F.lit("https://h"),
            F.pmod(F.col("node_id"), F.lit(32)).cast("string"),
            F.lit(".example.com/p/"),
            F.col("node_id").cast("string"),
        ).alias("url"),
    )
    return outlink_host_entropy(g.edges.distinct(), urls, drop_intra=True)


_E8LN = "CAST(ROUND(LN(CAST({x} AS DOUBLE)) * 100000000.0, 0) AS BIGINT)"

_OUTLINK_ENTROPY_SQL = (
    "WITH "
    + ", ".join(
        [
            SQL_E,
            SQL_D,
            "hn AS MATERIALIZED (SELECT node_id, lower(regexp_extract("
            "'https://h' || CAST(node_id % 32 AS VARCHAR) || '.example.com/p/' || CAST(node_id AS VARCHAR), "
            "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)) AS host FROM "
            "(SELECT DISTINCT src AS node_id FROM edges_raw "
            "UNION SELECT DISTINCT dst FROM edges_raw))",
            "he AS MATERIALIZED (SELECT s.host AS src_host, d2.host AS dst_host, "
            "CAST(COUNT(*) AS BIGINT) AS n_links "
            "FROM d_edges e JOIN hn s ON e.src = s.node_id "
            "JOIN hn d2 ON e.dst = d2.node_id "
            "WHERE s.host <> d2.host GROUP BY s.host, d2.host)",
            "tot AS MATERIALIZED (SELECT src_host, CAST(SUM(n_links) AS BIGINT) AS total_links, "
            "CAST(COUNT(*) AS BIGINT) AS n_dst_hosts FROM he GROUP BY src_host)",
        ]
    )
    + " SELECT he.src_host, n_dst_hosts, total_links, "
    "CAST(SUM(n_links * ("
    + _E8LN.format(x="total_links")
    + " - "
    + _E8LN.format(x="n_links")
    + ")) AS BIGINT) AS h_e8_sum, "
    "CAST(SUM(n_links * ("
    + _E8LN.format(x="total_links")
    + " - "
    + _E8LN.format(x="n_links")
    + ")) AS DOUBLE) / (CAST(total_links AS DOUBLE) * 100000000.0) AS entropy "
    "FROM he JOIN tot ON he.src_host = tot.src_host "
    "GROUP BY he.src_host, n_dst_hosts, total_links"
)

_ORACLES["outlink_host_entropy"] = _OUTLINK_ENTROPY_SQL


# ---------------------------------------------------------------------------
# Levenshtein name near-duplicates (pipeline/dedup.py)
# ---------------------------------------------------------------------------
def _q_name_neardups(spark, sf_dir):
    """Edit-distance near-dup pairs over distinct part names, blocked
    on the last token (vocabulary-bounded self-join, never all-pairs)."""
    from dachshund_spark.pipeline.dedup import name_neardup_pairs

    return name_neardup_pairs(
        load_table(spark, sf_dir, "part"), "p_name", max_dist=6, topk=20
    )


_NAME_NEARDUP_SQL = (
    "WITH names AS MATERIALIZED (SELECT DISTINCT p_name AS name, "
    "regexp_extract(p_name, '[^ ]+$') AS blk FROM part WHERE p_name IS NOT NULL) "
    "SELECT a.name AS name_a, b.name AS name_b, "
    "CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist "
    "FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name "
    "WHERE levenshtein(a.name, b.name) <= 6 "
    "ORDER BY dist, name_a, name_b LIMIT 20"
)

_ORACLES["name_neardup_pairs"] = _NAME_NEARDUP_SQL


# ---------------------------------------------------------------------------
# Grid-blocked DBSCAN over embedding dims 1-2 (pipeline/clustering.py)
# ---------------------------------------------------------------------------
def _q_grid_dbscan(spark, sf_dir):
    """DBSCAN with eps-grid candidate blocking (cell = shuffle key),
    integer e6 coordinates, 24-round hash-min cluster closure, and
    min-label border assignment."""
    from dachshund_spark.pipeline.clustering import grid_dbscan

    return grid_dbscan(
        load_table(spark, sf_dir, "embeddings"),
        eps_e6=20000,
        min_pts=4,
        cc_rounds=24,
    )


def _grid_dbscan_sql(
    eps: int = 20000, min_pts: int = 4, shift: int = 2_000_000, rounds: int = 24
) -> str:
    parts = [
        "p AS MATERIALIZED (SELECT vec_id AS pid, "
        f"CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1000000.0, 0) AS BIGINT) + {shift} AS x, "
        f"CAST(ROUND(CAST(embedding[2] AS DOUBLE) * 1000000.0, 0) AS BIGINT) + {shift} AS y "
        "FROM embeddings)",
        f"pc AS MATERIALIZED (SELECT pid, x, y, x // {eps} AS cx, y // {eps} AS cy FROM p)",
        "pr AS MATERIALIZED (SELECT a.pid AS a, b.pid AS b "
        "FROM pc a JOIN pc b ON b.cx BETWEEN a.cx - 1 AND a.cx + 1 "
        "AND b.cy BETWEEN a.cy - 1 AND a.cy + 1 "
        f"AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {eps * eps})",
        f"cr AS MATERIALIZED (SELECT a AS pid FROM pr GROUP BY a HAVING COUNT(*) >= {min_pts})",
        "ce AS MATERIALIZED (SELECT pr.a AS src, pr.b AS dst FROM pr "
        "JOIN cr c1 ON pr.a = c1.pid JOIN cr c2 ON pr.b = c2.pid WHERE pr.a <> pr.b)",
        "l0 AS MATERIALIZED (SELECT pid AS node_id, pid AS label FROM cr)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT n.node_id, "
            f"CASE WHEN m.minl IS NULL OR n.label <= m.minl THEN n.label ELSE m.minl END AS label "
            f"FROM l{i-1} n LEFT JOIN ("
            f"SELECT e.dst AS node_id, MIN(l.label) AS minl "
            f"FROM ce e JOIN l{i-1} l ON e.src = l.node_id GROUP BY e.dst) m "
            f"ON n.node_id = m.node_id)"
        )
    parts.append(
        f"clbl AS MATERIALIZED (SELECT cr.pid, COALESCE(l.label, cr.pid) AS cluster "
        f"FROM cr LEFT JOIN l{rounds} l ON cr.pid = l.node_id)"
    )
    parts.append(
        "bl AS MATERIALIZED (SELECT pr.a AS pid, MIN(c.cluster) AS cluster "
        "FROM pr JOIN clbl c ON pr.b = c.pid "
        "WHERE pr.a <> pr.b AND pr.a NOT IN (SELECT pid FROM cr) GROUP BY pr.a)"
    )
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT pid AS vec_id, role, CAST(cluster AS BIGINT) AS cluster FROM ("
        "SELECT pid, 'core' AS role, cluster FROM clbl "
        "UNION ALL SELECT pid, 'border' AS role, cluster FROM bl "
        "UNION ALL SELECT pc.pid, 'noise' AS role, -1 AS cluster FROM pc "
        "WHERE pc.pid NOT IN (SELECT pid FROM clbl) "
        "AND pc.pid NOT IN (SELECT pid FROM bl))"
    )


_ORACLES["grid_dbscan"] = _grid_dbscan_sql()


# ---------------------------------------------------------------------------
# Feature propagation (algorithms/featprop.py)
# ---------------------------------------------------------------------------
def _q_feature_prop(spark, sf_dir):
    """Rossi-style missing-feature imputation: 3 synchronous rounds of
    truncating-integer neighbor means over the derived graph; feature =
    (node_id % 100)·10^8, known iff node_id % 3 ≠ 0."""
    from dachshund_spark.algorithms.featprop import feature_propagation

    g = derived_graph(spark, sf_dir)
    feats = g.nodes().select(
        "node_id",
        F.when(
            F.col("node_id") % 3 != 0,
            (F.col("node_id") % 100) * F.lit(100000000),
        )
        .cast("long")
        .alias("feat_e8"),
    )
    return feature_propagation(g, feats, rounds=3)


def _feature_prop_sql(rounds: int = 3) -> str:
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        "s0 AS MATERIALIZED (SELECT node_id, (node_id % 3) <> 0 AS known, "
        "CASE WHEN (node_id % 3) <> 0 THEN (node_id % 100) * 100000000 "
        "ELSE NULL END AS feat FROM nodes)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT n.node_id, n.known, "
            f"CASE WHEN n.known THEN n.feat ELSE COALESCE(m.a, n.feat) END AS feat "
            f"FROM s{i-1} n LEFT JOIN ("
            f"SELECT u.dst AS node_id, SUM(l.feat) // COUNT(l.feat) AS a "
            f"FROM und u JOIN s{i-1} l ON u.src = l.node_id "
            f"WHERE l.feat IS NOT NULL GROUP BY u.dst) m "
            f"ON n.node_id = m.node_id)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node_id, known, CAST(feat AS BIGINT) AS feat_e8, "
        f"((NOT known) AND feat IS NOT NULL) AS filled FROM s{rounds}"
    )


_ORACLES["feature_prop_3"] = _feature_prop_sql()


# ---------------------------------------------------------------------------
# TPC-H Q9-shaped product profit (relational.py)
# ---------------------------------------------------------------------------
def _q_product_profit(spark, sf_dir):
    """Per-(nation, order year) profit on 'widget' parts; cost =
    retail cents · integral quantity (no partsupp in this schema)."""
    from dachshund_spark.relational import product_profit

    return product_profit(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "orders"),
    )


_PRODUCT_PROFIT_SQL = (
    "WITH p AS (SELECT p_partkey, CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) "
    "AS cents FROM part WHERE contains(p_name, 'widget')), "
    "li AS (SELECT l_orderkey, l_partkey, l_suppkey, "
    "CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT) AS rev, "
    "CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty FROM lineitem) "
    "SELECT n_name, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year, "
    "CAST(SUM(rev - p.cents * qty * 100) AS BIGINT) AS profit_e4 "
    "FROM li JOIN p ON li.l_partkey = p.p_partkey "
    "JOIN supplier s ON li.l_suppkey = s.s_suppkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "JOIN orders o ON li.l_orderkey = o.o_orderkey "
    "GROUP BY n_name, o_year"
)

_ORACLES["product_profit_q9"] = _PRODUCT_PROFIT_SQL


# ---------------------------------------------------------------------------
# Seeded label propagation (algorithms/lpa.py)
# ---------------------------------------------------------------------------
def _q_seeded_lpa(spark, sf_dir):
    """Semi-supervised class diffusion: seeds = nodes ≡ 0 mod 10 with
    cls = node_id % 5, 4 synchronous modal rounds, packed-BIGINT
    argmax (count·1024 + 1023 − cls) so ties are engine-exact."""
    from dachshund_spark.algorithms.lpa import seeded_label_propagation

    g = derived_graph(spark, sf_dir)
    seeds = g.nodes().where(F.col("node_id") % 10 == 0).select(
        "node_id", (F.col("node_id") % 5).alias("cls")
    )
    return seeded_label_propagation(g, seeds, iterations=4)


def _seeded_lpa_sql(rounds: int = 4) -> str:
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        "s0 AS MATERIALIZED (SELECT node_id, "
        "CASE WHEN node_id % 10 = 0 THEN node_id % 5 ELSE NULL END AS cls, "
        "node_id % 10 = 0 AS is_seed FROM nodes)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"m{i}s AS MATERIALIZED (SELECT node_id, MAX(n * 1024 + (1023 - c)) AS pk "
            f"FROM (SELECT u.dst AS node_id, l.cls AS c, COUNT(*) AS n "
            f"FROM und u JOIN s{i-1} l ON u.src = l.node_id "
            f"WHERE l.cls IS NOT NULL GROUP BY u.dst, l.cls) GROUP BY node_id)"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT n.node_id, "
            f"CASE WHEN n.is_seed THEN n.cls "
            f"ELSE COALESCE(1023 - (m.pk % 1024), n.cls) END AS cls, n.is_seed "
            f"FROM s{i-1} n LEFT JOIN m{i}s m ON n.node_id = m.node_id)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node_id, CAST(cls AS BIGINT) AS cls, is_seed FROM s{rounds}"
    )


_ORACLES["seeded_label_prop_4"] = _seeded_lpa_sql()


# ---------------------------------------------------------------------------
# Linear multi-touch attribution (relational.py)
# ---------------------------------------------------------------------------
def _q_multitouch(spark, sf_dir):
    """Every click in the 30 min before a same-user purchase shares
    the credit equally; first/last flags via packed epoch·2^20+id."""
    from dachshund_spark.relational import multitouch_attribution

    return multitouch_attribution(load_table(spark, sf_dir, "events"))


_MULTITOUCH_SQL = (
    "WITH p AS (SELECT event_id AS conv_id, user_id AS u, "
    "epoch_us(ts) // 1000000 AS pt FROM events WHERE event_type = 'purchase'), "
    "c AS (SELECT event_id AS touch_id, user_id AS u, "
    "epoch_us(ts) // 1000000 AS ct FROM events WHERE event_type = 'click'), "
    "pr AS MATERIALIZED (SELECT conv_id, touch_id, ct * 1048576 + touch_id AS k "
    "FROM p JOIN c ON p.u = c.u AND c.ct <= p.pt AND c.ct > p.pt - 1800), "
    "st AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_touches, "
    "MIN(k) AS f, MAX(k) AS l FROM pr GROUP BY conv_id) "
    "SELECT pr.conv_id, pr.touch_id, n_touches, "
    "CAST(100000000 // n_touches AS BIGINT) AS credit_e8, "
    "pr.k = st.f AS is_first, pr.k = st.l AS is_last "
    "FROM pr JOIN st ON pr.conv_id = st.conv_id"
)

_ORACLES["multitouch_attribution"] = _MULTITOUCH_SQL


# ---------------------------------------------------------------------------
# Greedy max-coverage seed selection (algorithms/coverage.py)
# ---------------------------------------------------------------------------
def _q_max_coverage(spark, sf_dir):
    """k=6 greedy crawl-seed picks by closed out-neighborhood
    coverage; each argmax is a LIMIT-1 scalar handoff (double_sweep
    precedent) and ties break to the smallest id for exact replay."""
    from dachshund_spark.algorithms.coverage import greedy_max_coverage

    return greedy_max_coverage(derived_graph(spark, sf_dir), k=6)


def _max_coverage_sql(k: int = 6) -> str:
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        "cov AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM edges_raw "
        "UNION ALL SELECT node_id AS src, node_id AS dst FROM nodes))",
    ]
    prior_seeds = "SELECT seed FROM p1"
    for r in range(1, k + 1):
        if r == 1:
            parts.append(
                "g1 AS (SELECT src, COUNT(*) AS gain FROM cov GROUP BY src)"
            )
            parts.append(
                "p1 AS MATERIALIZED (SELECT src AS seed, gain FROM g1 "
                "ORDER BY gain DESC, src LIMIT 1)"
            )
            parts.append(
                "c1 AS MATERIALIZED (SELECT DISTINCT dst FROM cov "
                "JOIN p1 ON cov.src = p1.seed)"
            )
            continue
        seeds_so_far = " UNION ALL ".join(
            f"SELECT seed FROM p{j}" for j in range(1, r)
        )
        parts.append(
            f"g{r} AS (SELECT cov.src, COUNT(*) AS gain FROM cov "
            f"LEFT JOIN c{r-1} cc ON cov.dst = cc.dst "
            f"WHERE cc.dst IS NULL AND cov.src NOT IN ({seeds_so_far}) "
            f"GROUP BY cov.src)"
        )
        parts.append(
            f"p{r} AS MATERIALIZED (SELECT seed, gain FROM ("
            f"SELECT src AS seed, gain, 1 AS pri FROM g{r} "
            f"UNION ALL SELECT src AS seed, 0 AS gain, 0 AS pri FROM "
            f"(SELECT DISTINCT src FROM cov WHERE src NOT IN ({seeds_so_far}))"
            f") ORDER BY pri DESC, gain DESC, seed LIMIT 1)"
        )
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT dst FROM c{r-1} "
            f"UNION SELECT dst FROM cov JOIN p{r} ON cov.src = p{r}.seed)"
        )
    picks = " UNION ALL ".join(
        f"SELECT {r} AS round, seed, gain FROM p{r}" for r in range(1, k + 1)
    )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT CAST(round AS BIGINT) AS round, CAST(seed AS BIGINT) AS seed, "
        f"CAST(gain AS BIGINT) AS gain, "
        f"CAST(SUM(gain) OVER (ORDER BY round ROWS UNBOUNDED PRECEDING) AS BIGINT) "
        f"AS covered_total FROM ({picks})"
    )


_ORACLES["max_coverage_6"] = _max_coverage_sql()


# ---------------------------------------------------------------------------
# Canonical-link dedup groups (pages/extract.py)
# ---------------------------------------------------------------------------
def _q_canonical_groups(spark, sf_dir):
    """rel=canonical clusters: every generated page gets a canonical
    link to node (id − id%4) injected into its real html; Spark must
    recover the groups from the BYTES while the oracle computes them
    from the id formula (generation-invariant, like anchor_text)."""
    from dachshund_spark.pages.extract import canonical_groups
    from dachshund_spark.pages.generator import generate_pages

    pages = generate_pages(derived_graph(spark, sf_dir))
    nid = F.regexp_extract(F.col("url"), r"node(\d+)", 1).cast("long")
    cid = nid - F.pmod(nid, F.lit(4))
    inj = pages.withColumn(
        "html",
        F.encode(
            F.replace(
                F.decode(F.col("html"), "utf-8"),
                F.lit("</head>"),
                F.concat(
                    F.lit('<link rel="canonical" href="https://node'),
                    cid.cast("string"),
                    F.lit('.example.com"></head>'),
                ),
            ),
            "utf-8",
        ),
    )
    return canonical_groups(inj)


_CANONICAL_GROUPS_SQL = (
    "WITH "
    + ", ".join([SQL_E, SQL_U, SQL_N])
    + " SELECT 'https://node' || CAST(node_id - node_id % 4 AS VARCHAR) "
    "|| '.example.com' AS canonical_url, "
    "CAST(COUNT(*) AS BIGINT) AS n_pages, "
    "CAST(MIN(node_id) AS BIGINT) AS keeper_id "
    "FROM nodes GROUP BY 1"
)

_ORACLES["canonical_groups"] = _CANONICAL_GROUPS_SQL


# ---------------------------------------------------------------------------
# Windowed audio energy / silence frames (pipeline/multimodal.py)
# ---------------------------------------------------------------------------
def _q_wav_windows(spark, sf_dir):
    """64-sample frame energy + peak + cross-multiplied silence flag
    from genuinely decoded WAV bytes (formula-oracled)."""
    from dachshund_spark.pipeline.multimodal import (
        decode_audio_windows,
        make_wav_media,
    )

    return decode_audio_windows(
        make_wav_media(spark, n=64, n_samples=256),
        window=64,
        silence_sq=22_000_000_000,
    )


_WAV_WINDOWS_SQL = (
    "WITH ids AS MATERIALIZED (SELECT unnest(range(64)) AS media_id), "
    "ix AS MATERIALIZED (SELECT unnest(range(256)) AS i), "
    "sm AS MATERIALIZED (SELECT media_id, i, "
    "((media_id * 13 + i * 509) % 65536) - 32768 AS s FROM ids, ix), "
    "w AS (SELECT media_id, i // 64 AS win, s FROM sm) "
    "SELECT media_id, CAST(win AS BIGINT) AS win, "
    "CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(s * s) AS BIGINT) AS sum_sq, "
    "CAST(MAX(ABS(s)) AS BIGINT) AS peak, "
    "SUM(s * s) * 64 < 22000000000 * COUNT(*) AS silent "
    "FROM w GROUP BY media_id, win"
)

_ORACLES["wav_energy_windows"] = _WAV_WINDOWS_SQL


# ---------------------------------------------------------------------------
# Cross-document boilerplate lines (pipeline/text.py)
# ---------------------------------------------------------------------------
def _q_boilerplate(spark, sf_dir):
    """Site-level boilerplate census: a deterministic per-source
    footer line is appended to every doc (both engines), and the
    detector must find it as the ≥50%-of-docs repeated line."""
    from dachshund_spark.pipeline.text import boilerplate_lines

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"), F.lit(". copyright "), F.col("source"), F.lit(" footer")
        ),
    )
    return boilerplate_lines(docs, threshold_pct=50)


_BOILERPLATE_SQL = (
    "WITH d AS (SELECT source, doc_id, "
    "text || '. copyright ' || source || ' footer' AS tx FROM documents), "
    "r AS (SELECT source, doc_id, replace(tx, ' the ', '. the ') AS tx FROM d), "
    "dl AS MATERIALIZED (SELECT DISTINCT source, doc_id, "
    "unnest(string_split(tx, '. ')) AS line FROM r), "
    "nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source), "
    "lc AS MATERIALIZED (SELECT source, line, COUNT(*) AS cnt FROM dl GROUP BY 1, 2) "
    "SELECT lc.source, CAST(n_docs AS BIGINT) AS n_docs, "
    "CAST(COUNT(*) AS BIGINT) AS n_distinct_lines, "
    "CAST(SUM(CASE WHEN cnt * 100 >= 50 * n_docs THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_boilerplate_lines "
    "FROM lc JOIN nd ON lc.source = nd.source GROUP BY lc.source, n_docs"
)

_ORACLES["boilerplate_lines"] = _BOILERPLATE_SQL


# ---------------------------------------------------------------------------
# CUSUM hourly changepoint scan (relational.py)
# ---------------------------------------------------------------------------
def _q_cusum(spark, sf_dir):
    """Integer CUSUM against each type's own uniform hourly rate;
    max(0, ·) recursion via the cum − min(0, running-min cum) closed
    form — two event_type-partitioned windows, no recursion."""
    from dachshund_spark.relational import cusum_hourly

    return cusum_hourly(load_table(spark, sf_dir, "events"))


_CUSUM_SQL = (
    "WITH hc AS MATERIALIZED (SELECT event_type, "
    "epoch_us(date_trunc('hour', ts)) // 1000000 AS hour_epoch, "
    "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2), "
    "t AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS total, "
    "CAST(COUNT(*) AS BIGINT) AS n_hours FROM hc GROUP BY 1), "
    "a AS (SELECT hc.event_type, hour_epoch, total, n_hours, "
    "c * n_hours - total AS a FROM hc JOIN t ON hc.event_type = t.event_type), "
    "cm AS (SELECT event_type, hour_epoch, total, n_hours, "
    "SUM(a) OVER (PARTITION BY event_type ORDER BY hour_epoch "
    "ROWS UNBOUNDED PRECEDING) AS cum FROM a), "
    "s AS (SELECT event_type, hour_epoch, total, n_hours, "
    "cum - LEAST(CAST(0 AS BIGINT), MIN(cum) OVER (PARTITION BY event_type "
    "ORDER BY hour_epoch ROWS UNBOUNDED PRECEDING)) AS s FROM cm) "
    "SELECT event_type, n_hours, total, CAST(MAX(s) AS BIGINT) AS max_s, "
    "CAST(COALESCE(MIN(CASE WHEN s * 1 > total * 1 THEN hour_epoch END), -1) "
    "AS BIGINT) AS first_alarm_hour "
    "FROM s GROUP BY event_type, n_hours, total"
)

_ORACLES["cusum_hourly"] = _CUSUM_SQL


# ---------------------------------------------------------------------------
# Best page per host (pagerank composition)
# ---------------------------------------------------------------------------
def _q_site_best_page(spark, sf_dir):
    """Per-host top page by PageRank — the 'site representative'
    selection a SERP/crawl pipeline runs after ranking.  Argmax is a
    packed BIGINT (e8-rounded rank · 2^20 + (2^20−1 − node)) so 'max
    rank, ties to smallest node' is one MAX in both engines."""
    from dachshund_spark.algorithms import pagerank

    g = derived_graph(spark, sf_dir)
    pr = pagerank(g, damping=DAMPING, fixed_iterations=PAGERANK_ITERS)
    host = F.concat(
        F.lit("h"),
        F.pmod(F.col("node_id"), F.lit(32)).cast("string"),
        F.lit(".example.com"),
    )
    r8 = F.round(F.col("pagerank") * F.lit(100000000.0), 0).cast("long")
    key = r8 * F.lit(1048576) + (F.lit(1048575) - F.col("node_id"))
    return (
        pr.select(host.alias("host"), key.alias("_k"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.max("_k").alias("_mk"),
        )
        .select(
            "host",
            "n_pages",
            (F.lit(1048575) - F.pmod(F.col("_mk"), F.lit(1048576))).alias(
                "best_node"
            ),
            F.expr("_mk DIV 1048576").cast("long").alias("best_rank_e8"),
        )
    )


def _site_best_page_sql(iters: int = PAGERANK_ITERS, d: float = DAMPING) -> str:
    base = _pagerank_sql(iters, d)
    body = base[len("WITH ") : base.rfind(" SELECT ")]
    return (
        "WITH "
        + body
        + f" , pk AS (SELECT node_id, "
        f"CAST(ROUND(rank * 100000000.0, 0) AS BIGINT) * 1048576 "
        f"+ (1048575 - node_id) AS k, "
        f"'h' || CAST(node_id % 32 AS VARCHAR) || '.example.com' AS host "
        f"FROM r{iters}) "
        "SELECT host, CAST(COUNT(*) AS BIGINT) AS n_pages, "
        "CAST(1048575 - (MAX(k) % 1048576) AS BIGINT) AS best_node, "
        "CAST(MAX(k) // 1048576 AS BIGINT) AS best_rank_e8 "
        "FROM pk GROUP BY host"
    )


_ORACLES["site_best_page"] = _site_best_page_sql()


# ---------------------------------------------------------------------------
# Grouped exact value quantiles (algorithms/stats.exact_quantiles)
# ---------------------------------------------------------------------------
def _q_event_quantiles(spark, sf_dir):
    """Per-event-type exact p50/p90/p99/p100 of the cent value via the
    grouped histogram-cumsum machinery (windows partitioned by type)."""
    from dachshund_spark.algorithms.stats import exact_quantiles

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return exact_quantiles(ev, "cents", group_cols=("event_type",)).orderBy(
        "event_type", "q"
    )


_EVENT_QUANTILES_SQL = (
    "WITH ev AS MATERIALIZED (SELECT event_type, "
    "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events), "
    "nn AS (SELECT event_type, COUNT(*) AS n FROM ev GROUP BY event_type), "
    "hist AS MATERIALIZED (SELECT event_type, cents AS val, COUNT(*) AS cnt "
    "FROM ev GROUP BY 1, 2), "
    "cum AS MATERIALIZED (SELECT event_type, val, "
    "SUM(cnt) OVER (PARTITION BY event_type ORDER BY val "
    "ROWS UNBOUNDED PRECEDING) AS cum FROM hist), "
    "qs AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10), "
    "('p99', 99, 100), ('p100', 1, 1)) AS t(q, num, den)), "
    "ranks AS (SELECT event_type, q, (num * n + den - 1) // den AS rank "
    "FROM nn, qs) "
    "SELECT r.event_type, r.q, CAST(r.rank AS BIGINT) AS rank, "
    "CAST(MIN(c.val) AS BIGINT) AS cents "
    "FROM ranks r JOIN cum c ON c.event_type = r.event_type AND c.cum >= r.rank "
    "GROUP BY r.event_type, r.q, r.rank ORDER BY r.event_type, r.q"
)

_ORACLES["event_value_quantiles"] = _EVENT_QUANTILES_SQL


# ---------------------------------------------------------------------------
# Directed degree assortativity, four modes (stats.directed_assortativity)
# ---------------------------------------------------------------------------
def _q_directed_assortativity(spark, sf_dir):
    """Foster et al. four-mode directed assortativity fingerprint;
    one 13-moment aggregation, scalar correlation trees."""
    from dachshund_spark.algorithms.stats import directed_assortativity

    return directed_assortativity(derived_graph(spark, sf_dir)).orderBy("mode")


_DIRECTED_ASSORT_SQL = (
    f"WITH {SQL_E}, "
    "de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges_raw "
    "WHERE src <> dst), "
    "od AS (SELECT src AS node_id, CAST(COUNT(*) AS DOUBLE) AS outdeg "
    "FROM de GROUP BY src), "
    "idg AS (SELECT dst AS node_id, CAST(COUNT(*) AS DOUBLE) AS indeg "
    "FROM de GROUP BY dst), "
    "degs AS MATERIALIZED (SELECT COALESCE(o.node_id, i.node_id) AS node_id, "
    "COALESCE(o.outdeg, 0) AS outdeg, COALESCE(i.indeg, 0) AS indeg "
    "FROM od o FULL JOIN idg i ON o.node_id = i.node_id), "
    "ends AS MATERIALIZED (SELECT a.outdeg AS so, a.indeg AS si, "
    "b.outdeg AS do_, b.indeg AS di FROM de "
    "JOIN degs a ON de.src = a.node_id JOIN degs b ON de.dst = b.node_id), "
    "mo AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m, "
    "SUM(si) AS s_si, SUM(si*si) AS ss_si, "
    "SUM(so) AS s_so, SUM(so*so) AS ss_so, "
    "SUM(di) AS s_di, SUM(di*di) AS ss_di, "
    "SUM(do_) AS s_do, SUM(do_*do_) AS ss_do, "
    "SUM(si*di) AS x_si_di, SUM(si*do_) AS x_si_do, "
    "SUM(so*di) AS x_so_di, SUM(so*do_) AS x_so_do FROM ends) "
    + " UNION ALL ".join(
        "SELECT '{name}' AS mode, "
        "CASE WHEN (ss_{a}/m - (s_{a}/m)*(s_{a}/m)) > 0.0 "
        "AND (ss_{b}/m - (s_{b}/m)*(s_{b}/m)) > 0.0 THEN "
        "ROUND((x_{a}_{b}/m - (s_{a}/m)*(s_{b}/m)) / "
        "(SQRT(ss_{a}/m - (s_{a}/m)*(s_{a}/m)) * "
        "SQRT(ss_{b}/m - (s_{b}/m)*(s_{b}/m))), 8) END AS assortativity "
        "FROM mo".format(name=n, a=a, b=b)
        for n, a, b in (
            ("in-in", "si", "di"),
            ("in-out", "si", "do"),
            ("out-in", "so", "di"),
            ("out-out", "so", "do"),
        )
    )
    + " ORDER BY mode"
)

_ORACLES["directed_assortativity"] = _DIRECTED_ASSORT_SQL


# ---------------------------------------------------------------------------
# Host-split leakage audit (pipeline/decontam.split_leakage_census)
# ---------------------------------------------------------------------------
def _q_split_leakage(spark, sf_dir):
    """Train/test split by host hash (doc_id % 16 hosts, bucket 9 =
    test); census of 5-gram shingles leaking across the boundary and
    the test docs they touch."""
    from dachshund_spark.pipeline.decontam import split_leakage_census
    from dachshund_spark.pipeline.text import tokens

    n = 5
    toks = tokens("text")
    gram_array = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("h"), F.pmod(F.col("doc_id"), F.lit(16)).cast("string")
        ).alias("host"),
        F.explode(gram_array).alias("gram"),
    )
    return split_leakage_census(sh)


_SPLIT_LEAKAGE_SQL = (
    "WITH toks AS (SELECT doc_id, doc_id % 16 AS hid, "
    "string_split(text, ' ') AS t FROM documents), "
    "sh AS MATERIALIZED (SELECT doc_id, "
    "('h' || CAST(hid AS VARCHAR)) AS host, "
    "md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]) AS g "
    "FROM toks, UNNEST(range(1, len(t) - 3)) AS r(i)), "
    "tg AS MATERIALIZED (SELECT doc_id, g, "
    "(CAST(('0x' || substr(md5('spl0#' || host), 1, 15)) AS BIGINT) % 10) = 9 "
    "AS is_test FROM sh), "
    "train_g AS (SELECT DISTINCT g FROM tg WHERE NOT is_test), "
    "test AS (SELECT doc_id, g FROM tg WHERE is_test), "
    "shared AS MATERIALIZED (SELECT t.doc_id, t.g FROM test t "
    "JOIN train_g tr ON t.g = tr.g) "
    "SELECT (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM test) "
    "AS n_test_docs, "
    "(SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM shared) "
    "AS n_contaminated, "
    "(SELECT CAST(COUNT(DISTINCT g) AS BIGINT) FROM shared) "
    "AS n_shared_grams"
)

_ORACLES["split_leakage"] = _SPLIT_LEAKAGE_SQL


# ---------------------------------------------------------------------------
# Matryoshka truncation eval (pipeline/similarity.truncation_agreement)
# ---------------------------------------------------------------------------
def _q_truncation(spark, sf_dir):
    """Exact top-1 neighbor under full 64-dim vs first-32-dim integer
    dot products; per-vector agreement (brute eval harness)."""
    from dachshund_spark.pipeline.similarity import truncation_agreement

    return truncation_agreement(load_table(spark, sf_dir, "embeddings"))


_TRUNCATION_SQL = (
    "WITH q AS MATERIALIZED (SELECT vec_id, d, "
    "CAST(ROUND(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT) AS q FROM ("
    "SELECT vec_id, generate_subscripts(embedding, 1) AS d, "
    "unnest(embedding) AS v FROM embeddings)), "
    "dots AS MATERIALIZED (SELECT a.vec_id AS qa, b.vec_id AS nb, "
    "CAST(SUM(a.q * b.q) AS BIGINT) AS fl, "
    "CAST(SUM(CASE WHEN a.d <= 32 THEN a.q * b.q ELSE 0 END) AS BIGINT) AS hf "
    "FROM q a JOIN q b ON a.d = b.d AND a.vec_id <> b.vec_id "
    "GROUP BY a.vec_id, b.vec_id) "
    "SELECT qa AS vec_id, "
    "CAST(MIN({'s': -fl, 'n': nb}).n AS BIGINT) AS nn_full, "
    "CAST(MIN({'s': -hf, 'n': nb}).n AS BIGINT) AS nn_half, "
    "CASE WHEN MIN({'s': -fl, 'n': nb}).n = MIN({'s': -hf, 'n': nb}).n "
    "THEN 1 ELSE 0 END AS agree "
    "FROM dots GROUP BY qa ORDER BY qa"
)

_ORACLES["truncation_agreement"] = _TRUNCATION_SQL


# ---------------------------------------------------------------------------
# Kaplan–Meier user-retention curve (relational.kaplan_meier)
# ---------------------------------------------------------------------------
def _q_kaplan_meier(spark, sf_dir):
    """KM time-to-first-purchase (hours from a user's first event),
    never-purchasers right-censored at their last event; log-survival
    as exact e8-integer cumsums of pre-rounded ln(1 − d/n) terms;
    histogram-sized windows."""
    from dachshund_spark.relational import kaplan_meier

    return kaplan_meier(load_table(spark, sf_dir, "events"))


_KAPLAN_MEIER_SQL = (
    "WITH pu AS (SELECT user_id, MIN(epoch_us(ts)) AS f, "
    "MAX(epoch_us(ts)) AS l FROM events GROUP BY user_id), "
    "dth AS (SELECT user_id, MIN(epoch_us(ts)) AS p FROM events "
    "WHERE event_type = 'purchase' GROUP BY user_id), "
    "obs AS (SELECT (COALESCE(p, l) - f) // 3600000000 AS t, "
    "CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS death "
    "FROM pu LEFT JOIN dth USING (user_id)), "
    "hist AS (SELECT t, COUNT(*) AS n, SUM(death) AS d "
    "FROM obs GROUP BY t), "
    "risk AS (SELECT t, d AS n_events, "
    "SUM(n) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n_risk "
    "FROM hist), "
    "st AS (SELECT t, n_risk, n_events, "
    "CASE WHEN n_events < n_risk THEN "
    "CAST(ROUND(LN(1.0 - CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE)) "
    "* 100000000.0, 0) AS BIGINT) END AS term, "
    "MAX(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END) OVER "
    "(ORDER BY t ASC ROWS UNBOUNDED PRECEDING) AS z FROM risk) "
    "SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk, "
    "CAST(n_events AS BIGINT) AS n_events, "
    "CASE WHEN z = 0 THEN CAST(SUM(term) OVER "
    "(ORDER BY t ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) END "
    "AS log_surv_e8 FROM st ORDER BY t"
)

_ORACLES["kaplan_meier"] = _KAPLAN_MEIER_SQL


# ---------------------------------------------------------------------------
# Granovetter local bridges (algorithms/sparsify.local_bridges)
# ---------------------------------------------------------------------------
def _q_local_bridges(spark, sf_dir):
    """Canonical edges in no triangle (span ≥ 3 weak ties), endpoint
    degrees attached; one anti-join against the triangle pair table."""
    from dachshund_spark.algorithms.sparsify import local_bridges

    return local_bridges(derived_graph(spark, sf_dir))


_LOCAL_BRIDGES_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_CANON}, {SQL_N}, {SQL_DEG}, {SQL_TRI}, "
    "intri AS MATERIALIZED (SELECT DISTINCT s, d FROM ("
    "SELECT LEAST(u, v) AS s, GREATEST(u, v) AS d FROM tri "
    "UNION ALL SELECT LEAST(u, w), GREATEST(u, w) FROM tri "
    "UNION ALL SELECT LEAST(v, w), GREATEST(v, w) FROM tri)) "
    "SELECT c.src, c.dst, CAST(a.degree AS BIGINT) AS du, "
    "CAST(b.degree AS BIGINT) AS dv "
    "FROM canon c JOIN deg a ON c.src = a.node_id "
    "JOIN deg b ON c.dst = b.node_id "
    "WHERE NOT EXISTS (SELECT 1 FROM intri t "
    "WHERE t.s = c.src AND t.d = c.dst)"
)

_ORACLES["local_bridges"] = _LOCAL_BRIDGES_SQL


# ---------------------------------------------------------------------------
# Forman-Ricci edge curvature (algorithms/stats.forman_curvature)
# ---------------------------------------------------------------------------
def _q_forman_curvature(spark, sf_dir):
    """Augmented Forman curvature 4 − du − dv + 3·tri per canonical
    edge — all-integer, one shared triangle pass + two degree joins."""
    from dachshund_spark.algorithms.stats import forman_curvature

    return forman_curvature(derived_graph(spark, sf_dir))


_FORMAN_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_CANON}, {SQL_N}, {SQL_DEG}, {SQL_TRI}, "
    "et AS MATERIALIZED (SELECT s, d, CAST(COUNT(*) AS BIGINT) AS tri FROM ("
    "SELECT LEAST(u, v) AS s, GREATEST(u, v) AS d FROM tri "
    "UNION ALL SELECT LEAST(u, w), GREATEST(u, w) FROM tri "
    "UNION ALL SELECT LEAST(v, w), GREATEST(v, w) FROM tri) GROUP BY s, d) "
    "SELECT c.src, c.dst, COALESCE(t.tri, 0) AS tri, "
    "CAST(4 - a.degree - b.degree + 3 * COALESCE(t.tri, 0) AS BIGINT) "
    "AS curvature "
    "FROM canon c JOIN deg a ON c.src = a.node_id "
    "JOIN deg b ON c.dst = b.node_id "
    "LEFT JOIN et t ON t.s = c.src AND t.d = c.dst"
)

_ORACLES["forman_curvature"] = _FORMAN_SQL


# ---------------------------------------------------------------------------
# forest-fire sample (walks.forest_fire_sample)
# ---------------------------------------------------------------------------
def _q_forest_fire(spark, sf_dir):
    """Bernoulli forest-fire burn from md5-chosen ignition nodes
    (~n/64), 8 rounds, p=1/2 — every coin a pure (edge, round) hash so
    the whole process replays exactly in SQL."""
    from dachshund_spark.walks import forest_fire_sample

    return forest_fire_sample(
        derived_graph(spark, sf_dir), rounds=8, seed=0, seed_mod=64
    )


def _forest_fire_sql(rounds: int = 8, seed: int = 0, seed_mod: int = 64) -> str:
    pri = MD5L.format(x=f"'ff{seed}#' || CAST(node_id AS VARCHAR)")
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        f"b0 AS MATERIALIZED (SELECT node_id, CAST(0 AS BIGINT) AS round_burned "
        f"FROM nodes WHERE {pri} % {seed_mod} = 0)",
        "f0 AS MATERIALIZED (SELECT node_id FROM b0)",
    ]
    for r in range(1, rounds + 1):
        coin = MD5L.format(
            x=(
                f"'ffc{seed}#' || CAST(u.src AS VARCHAR) || ':' || "
                f"CAST(u.dst AS VARCHAR) || ':' || '{r}'"
            )
        )
        parts.append(
            f"n{r} AS MATERIALIZED (SELECT DISTINCT u.dst AS node_id "
            f"FROM und u JOIN f{r-1} f ON u.src = f.node_id "
            f"WHERE {coin} % 2 < 1 AND NOT EXISTS "
            f"(SELECT 1 FROM b{r-1} b WHERE b.node_id = u.dst))"
        )
        parts.append(
            f"b{r} AS MATERIALIZED (SELECT * FROM b{r-1} UNION ALL "
            f"SELECT node_id, CAST({r} AS BIGINT) FROM n{r})"
        )
        parts.append(f"f{r} AS MATERIALIZED (SELECT node_id FROM n{r})")
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node_id, round_burned FROM b{rounds}"
    )


_ORACLES["forest_fire_8"] = _forest_fire_sql()


# ---------------------------------------------------------------------------
# Dirichlet query likelihood (pipeline/retrieval.query_likelihood_topk)
# ---------------------------------------------------------------------------
def _q_ql_dirichlet(spark, sf_dir):
    """Dirichlet-smoothed query-likelihood top-10 for the fixed 5-term
    query; per-(doc, term) log terms pre-rounded to e8 BIGINTs."""
    from dachshund_spark.pipeline.retrieval import query_likelihood_topk

    return query_likelihood_topk(
        load_table(spark, sf_dir, "documents"), BM25_TERMS, k=10, mu=100.0
    )


def _ql_dirichlet_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(set(BM25_TERMS)))
    return (
        "WITH toks AS MATERIALIZED (SELECT doc_id, "
        "unnest(string_split(text, ' ')) AS token FROM documents), "
        "dl AS MATERIALIZED (SELECT doc_id, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents), "
        "ct AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS ctot FROM toks), "
        f"cf AS MATERIALIZED (SELECT token, CAST(COUNT(*) AS BIGINT) AS cf "
        f"FROM toks WHERE token IN ({terms}) GROUP BY token), "
        f"post AS MATERIALIZED (SELECT token, doc_id, "
        f"CAST(COUNT(*) AS BIGINT) AS tf "
        f"FROM toks WHERE token IN ({terms}) GROUP BY token, doc_id), "
        "pairs AS (SELECT d.doc_id, d.dl, c.token, c.cf FROM dl d CROSS JOIN cf c), "
        "scored AS (SELECT p.doc_id, "
        "CASE WHEN po.tf IS NOT NULL THEN 1 ELSE 0 END AS m, "
        "CAST(ROUND(LN((CAST(COALESCE(po.tf, 0) AS DOUBLE) + 100.0 * "
        "(CAST(p.cf AS DOUBLE) / CAST((SELECT ctot FROM ct) AS DOUBLE))) / "
        "(CAST(p.dl AS DOUBLE) + 100.0)) * 100000000, 0) AS BIGINT) AS term_e8 "
        "FROM pairs p LEFT JOIN post po "
        "ON po.token = p.token AND po.doc_id = p.doc_id) "
        "SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_matched_terms, "
        "CAST(SUM(term_e8) AS BIGINT) AS score_e8 "
        "FROM scored GROUP BY doc_id "
        "ORDER BY score_e8 DESC, doc_id ASC LIMIT 10"
    )


_ORACLES["ql_dirichlet_top10"] = _ql_dirichlet_sql()


# ---------------------------------------------------------------------------
# hashing-trick features (pipeline/text.feature_hash)
# ---------------------------------------------------------------------------
def _q_feature_hash(spark, sf_dir):
    """Signed 32-bucket hashing-trick features per document —
    vocabulary-free, all-integer, one explode + one aggregation."""
    from dachshund_spark.pipeline.text import feature_hash

    return feature_hash(load_table(spark, sf_dir, "documents"), n_buckets=32)


_FEATURE_HASH_SQL = (
    "WITH toks AS MATERIALIZED (SELECT doc_id, "
    "unnest(string_split(text, ' ')) AS token FROM documents), "
    "hashed AS (SELECT doc_id, "
    + MD5L.format(x="'fh#' || token")
    + " % 32 AS bucket, CASE WHEN "
    + MD5L.format(x="'fs#' || token")
    + " % 2 = 0 THEN 1 ELSE -1 END AS sign FROM toks) "
    "SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS value "
    "FROM hashed GROUP BY doc_id, bucket"
)

_ORACLES["feature_hash_32"] = _FEATURE_HASH_SQL


# ---------------------------------------------------------------------------
# trigram Stupid Backoff (pipeline/lm.stupid_backoff_scores)
# ---------------------------------------------------------------------------
def _q_stupid_backoff(spark, sf_dir):
    """Self-scored trigram Stupid Backoff (α = 0.4) — three count
    tables, five equi-joins, per-position e8-pre-rounded log terms."""
    from dachshund_spark.pipeline.lm import stupid_backoff_scores

    return stupid_backoff_scores(load_table(spark, sf_dir, "documents"))


_STUPID_BACKOFF_SQL = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
    "tg AS MATERIALIZED (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2, "
    "toks[i + 2] AS w3 FROM (SELECT doc_id, toks, "
    "unnest(range(1, len(toks) - 1)) AS i FROM t WHERE len(toks) >= 3)), "
    "c3 AS MATERIALIZED (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c3 "
    "FROM tg GROUP BY w1, w2, w3), "
    "b AS MATERIALIZED (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM "
    "(SELECT toks, unnest(range(1, len(toks))) AS i FROM t WHERE len(toks) >= 2)), "
    "c2 AS MATERIALIZED (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 "
    "FROM b GROUP BY w1, w2), "
    "c1 AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS c1 FROM "
    "(SELECT unnest(toks) AS w FROM t) GROUP BY w), "
    "ct AS (SELECT CAST(COUNT(*) AS BIGINT) AS ctot FROM "
    "(SELECT unnest(toks) AS w FROM t)), "
    "terms AS MATERIALIZED (SELECT g.doc_id, CAST(ROUND(LN("
    "CASE WHEN t3.c3 IS NOT NULL THEN CAST(t3.c3 AS DOUBLE) / CAST(h3.c2 AS DOUBLE) "
    "WHEN b2.c2 IS NOT NULL THEN (CAST(2 AS DOUBLE) / 5) * "
    "(CAST(b2.c2 AS DOUBLE) / CAST(h2.c1 AS DOUBLE)) "
    "ELSE (CAST(2 AS DOUBLE) / 5) * (CAST(2 AS DOUBLE) / 5) * "
    "(CAST(GREATEST(COALESCE(u3.c1, 0), 1) AS DOUBLE) / "
    "CAST((SELECT ctot FROM ct) AS DOUBLE)) END) * 100000000, 0) AS BIGINT) AS lp "
    "FROM tg g "
    "LEFT JOIN c3 t3 ON g.w1 = t3.w1 AND g.w2 = t3.w2 AND g.w3 = t3.w3 "
    "LEFT JOIN c2 h3 ON g.w1 = h3.w1 AND g.w2 = h3.w2 "
    "LEFT JOIN c2 b2 ON g.w2 = b2.w1 AND g.w3 = b2.w2 "
    "LEFT JOIN c1 h2 ON g.w2 = h2.w "
    "LEFT JOIN c1 u3 ON g.w3 = u3.w) "
    "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams, "
    "CAST(SUM(lp) AS BIGINT) AS sb_e8, "
    "CAST(SUM(lp) AS DOUBLE) / 100000000 / COUNT(*) AS avg_score "
    "FROM terms GROUP BY doc_id"
)

_ORACLES["stupid_backoff"] = _STUPID_BACKOFF_SQL


# ---------------------------------------------------------------------------
# Spinner-style balanced partition (algorithms/partition.balanced_partition)
# ---------------------------------------------------------------------------
def _q_balanced_partition(spark, sf_dir):
    """Balanced 4-way label-propagation partition, 8 md5-parity
    scheduled rounds; every migration an integer struct-max argmax."""
    from dachshund_spark.algorithms.partition import balanced_partition

    return balanced_partition(derived_graph(spark, sf_dir), k=4, rounds=8, seed=0)


def _balanced_partition_parts(
    k: int = 4, rounds: int = 8, seed: int = 0
) -> "tuple[list[str], str]":
    """Shared CTE chain for the Spinner unroll; returns (parts, final
    state CTE name) so composites can build on the converged state."""
    pri = MD5L.format(x=f"'sp{seed}#' || CAST(n.node_id AS VARCHAR)")
    upd = MD5L.format(x=f"'spu{seed}#' || CAST(n.node_id AS VARCHAR)")
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        SQL_DEG,
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"s0 AS MATERIALIZED (SELECT n.node_id, CAST({pri} % {k} AS BIGINT) AS part, "
        f"CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree, "
        f"CAST({upd} % 2 AS BIGINT) AS upd "
        f"FROM nodes n LEFT JOIN deg d ON n.node_id = d.node_id)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"ld{r} AS MATERIALIZED (SELECT part, CAST(COUNT(*) AS BIGINT) AS load "
            f"FROM s{r-1} GROUP BY part)"
        )
        parts.append(
            f"cn{r} AS MATERIALIZED (SELECT u.dst AS node_id, s.part, "
            f"CAST(COUNT(*) AS BIGINT) AS cnt "
            f"FROM und u JOIN s{r-1} s ON u.src = s.node_id GROUP BY u.dst, s.part)"
        )
        parts.append(
            f"bs{r} AS MATERIALIZED (SELECT c.node_id, "
            f"{k} - (MAX({{'s': c.cnt * (SELECT n FROM nn) - st.degree * l.load, "
            f"'np': {k} - c.part}})).np AS newp "
            f"FROM cn{r} c JOIN ld{r} l ON c.part = l.part "
            f"JOIN s{r-1} st ON c.node_id = st.node_id GROUP BY c.node_id)"
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT s.node_id, "
            f"CASE WHEN s.upd = {r % 2} AND b.newp IS NOT NULL THEN b.newp "
            f"ELSE s.part END AS part, s.degree, s.upd "
            f"FROM s{r-1} s LEFT JOIN bs{r} b ON s.node_id = b.node_id)"
        )
    return parts, f"s{rounds}"


def _balanced_partition_sql(k: int = 4, rounds: int = 8, seed: int = 0) -> str:
    parts, fin = _balanced_partition_parts(k, rounds, seed)
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node_id, CAST(part AS BIGINT) AS part FROM {fin}"
    )


_ORACLES["balanced_partition_4"] = _balanced_partition_sql()


# ---------------------------------------------------------------------------
# Erdős–Gallai graphicality boundaries (algorithms/stats.erdos_gallai)
# ---------------------------------------------------------------------------
def _q_erdos_gallai(spark, sf_dir):
    """Erdős–Gallai lhs/rhs at the strong distinct-degree boundaries —
    histogram cumsums + one broadcast range join, all-integer."""
    from dachshund_spark.algorithms.stats import erdos_gallai

    return erdos_gallai(derived_graph(spark, sf_dir))


_ERDOS_GALLAI_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_N}, {SQL_DEG}, "
    "hist AS MATERIALIZED (SELECT degree AS val, CAST(COUNT(*) AS BIGINT) AS cnt "
    "FROM deg GROUP BY degree), "
    "b AS MATERIALIZED (SELECT val AS d, "
    "CAST(SUM(cnt) OVER (ORDER BY val DESC ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND CURRENT ROW) AS BIGINT) AS k, "
    "CAST(SUM(val * cnt) OVER (ORDER BY val DESC ROWS BETWEEN UNBOUNDED "
    "PRECEDING AND CURRENT ROW) AS BIGINT) AS lhs FROM hist), "
    "t AS (SELECT b.d, b.k, b.lhs, "
    "CAST(COALESCE(SUM(h.cnt * LEAST(h.val, b.k)), 0) AS BIGINT) AS tail "
    "FROM b LEFT JOIN hist h ON h.val < b.d WHERE b.d >= b.k "
    "GROUP BY b.d, b.k, b.lhs) "
    "SELECT k, CAST(d AS BIGINT) AS d, lhs, "
    "CAST(k * (k - 1) + tail AS BIGINT) AS rhs, "
    "lhs <= k * (k - 1) + tail AS ok FROM t"
)

_ORACLES["erdos_gallai"] = _ERDOS_GALLAI_SQL


# ---------------------------------------------------------------------------
# JSON props rollup + hour-of-day chi-square (relational.py)
# ---------------------------------------------------------------------------
def _q_props_key_stats(spark, sf_dir):
    """props.k extracted engine-side (codegen'd get_json_object),
    bucketed DIV 10, exact cents sums."""
    from dachshund_spark.relational import props_key_stats

    return props_key_stats(load_table(spark, sf_dir, "events"))


_PROPS_KEY_SQL = (
    "WITH x AS (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, "
    "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents, user_id FROM events) "
    "SELECT k // 10 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_events, "
    "CAST(SUM(cents) AS BIGINT) AS sum_cents, "
    "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
    "FROM x WHERE k IS NOT NULL GROUP BY k // 10"
)

_ORACLES["props_key_stats"] = _PROPS_KEY_SQL


def _q_hourly_uniformity(spark, sf_dir):
    """Exact-integer chi-square vs the uniform hour-of-day profile per
    event type; chi2_num = 576·Σo² − 24·n² folds in empty bins."""
    from dachshund_spark.relational import hourly_uniformity

    return hourly_uniformity(load_table(spark, sf_dir, "events"))


_HOURLY_UNIFORMITY_SQL = (
    "WITH h AS MATERIALIZED (SELECT event_type, EXTRACT(hour FROM ts) AS hh, "
    "CAST(COUNT(*) AS BIGINT) AS o FROM events GROUP BY event_type, hh), "
    "p AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS n, "
    "CAST(SUM(o * o) AS BIGINT) AS oo FROM h GROUP BY event_type) "
    "SELECT event_type, n, CAST(576 * oo - 24 * n * n AS BIGINT) AS chi2_num, "
    "CAST(576 * oo - 24 * n * n AS DOUBLE) / "
    "(CAST(24 AS DOUBLE) * CAST(n AS DOUBLE)) AS chi2 FROM p"
)

_ORACLES["hourly_uniformity"] = _HOURLY_UNIFORMITY_SQL


# ---------------------------------------------------------------------------
# nearest-centroid eval (pipeline/clustering.nearest_centroid_eval)
# ---------------------------------------------------------------------------
def _q_nearest_centroid(spark, sf_dir):
    """Rocchio confusion matrix over the labeled embeddings — integer
    lattice centroids, exact argmin assignment."""
    from dachshund_spark.pipeline.clustering import nearest_centroid_eval

    return nearest_centroid_eval(load_table(spark, sf_dir, "embeddings"))


_NEAREST_CENTROID_SQL = (
    "WITH q AS MATERIALIZED (SELECT vec_id, d, "
    "CAST(ROUND(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT) AS q FROM ("
    "SELECT vec_id, generate_subscripts(embedding, 1) AS d, "
    "unnest(embedding) AS v FROM embeddings)), "
    "lb AS MATERIALIZED (SELECT vec_id, CAST(label AS BIGINT) AS label "
    "FROM embeddings), "
    "cent AS MATERIALIZED (SELECT l.label AS cand, p.d, "
    "CAST(SUM(p.q) // COUNT(*) AS BIGINT) AS c "
    "FROM q p JOIN lb l ON p.vec_id = l.vec_id GROUP BY l.label, p.d), "
    "a AS MATERIALIZED (SELECT p.vec_id, c.cand, "
    "CAST(SUM((p.q - c.c) * (p.q - c.c)) AS BIGINT) AS dist2 "
    "FROM q p JOIN cent c ON p.d = c.d GROUP BY p.vec_id, c.cand), "
    "b AS (SELECT vec_id, cand AS pred FROM (SELECT *, ROW_NUMBER() OVER ("
    "PARTITION BY vec_id ORDER BY dist2, cand) AS rn FROM a) WHERE rn = 1) "
    "SELECT l.label, b.pred, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM b JOIN lb l ON b.vec_id = l.vec_id GROUP BY l.label, b.pred"
)

_ORACLES["nearest_centroid_eval"] = _NEAREST_CENTROID_SQL


# ---------------------------------------------------------------------------
# Hilbert-curve layout (bucketed.hilbert_layout_stats)
# ---------------------------------------------------------------------------
def _q_hilbert_layout(spark, sf_dir):
    """Hilbert-curve edge-layout locality profile (the Morton
    companion without Z-jumps); 10-bit coords, top-6-bit buckets."""
    from dachshund_spark.bucketed import hilbert_layout_stats

    e = derived_graph(spark, sf_dir).edges.distinct()
    return hilbert_layout_stats(e, bits=10, bucket_bits=6)


def _hilbert_sql(bits: int = 10, bucket_bits: int = 6) -> str:
    mask = (1 << bits) - 1
    parts = [
        SQL_E,
        SQL_D,
        f"h{bits} AS (SELECT src, dst, src & {mask} AS x, dst & {mask} AS y, "
        "CAST(0 AS BIGINT) AS d FROM d_edges)",
    ]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"((x >> {i}) & 1)"
        ry = f"((y >> {i}) & 1)"
        tx = f"(CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s - 1} - x ELSE x END)"
        ty = f"(CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s - 1} - y ELSE y END)"
        parts.append(
            f"h{i} AS (SELECT src, dst, "
            f"CASE WHEN {ry} = 0 THEN {ty} ELSE {tx} END AS x, "
            f"CASE WHEN {ry} = 0 THEN {tx} ELSE {ty} END AS y, "
            f"d + {s} * {s} * CAST(xor(3 * {rx}, {ry}) AS BIGINT) AS d "
            f"FROM h{i + 1})"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT d >> {2 * bits - bucket_bits} AS bucket, "
        "CAST(COUNT(*) AS BIGINT) AS n_edges, "
        "CAST(COUNT(DISTINCT src) AS BIGINT) AS n_src, "
        "CAST(COUNT(DISTINCT dst) AS BIGINT) AS n_dst "
        "FROM h0 GROUP BY bucket"
    )


_ORACLES["hilbert_layout"] = _hilbert_sql()


# ---------------------------------------------------------------------------
# Local Path index (algorithms/linkpred.local_path_scores)
# ---------------------------------------------------------------------------
def _q_local_path(spark, sf_dir):
    """LP link prediction A² + 0.01·A³ (exact integer hundredths) for
    non-adjacent wedge-connected pairs of the 256-node subgraph."""
    from dachshund_spark.algorithms.linkpred import local_path_scores

    e = derived_graph(spark, sf_dir).edges
    sub = LinkGraph(e.where((F.col("src") < 256) & (F.col("dst") < 256)))
    return local_path_scores(sub)


_LOCAL_PATH_SQL = (
    f"WITH {SQL_E}, "
    "sube AS MATERIALIZED (SELECT src, dst FROM edges_raw WHERE src < 256 AND dst < 256), "
    "unds AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
    "(SELECT src, dst FROM sube UNION ALL SELECT dst AS src, src AS dst FROM sube) "
    "WHERE src <> dst), "
    "canons AS MATERIALIZED (SELECT src, dst FROM unds WHERE src < dst), "
    "w2 AS MATERIALIZED (SELECT a.dst AS x, b.dst AS y, "
    "CAST(COUNT(*) AS BIGINT) AS w FROM unds a JOIN unds b "
    "ON a.src = b.src AND a.dst <> b.dst GROUP BY a.dst, b.dst), "
    "p2 AS MATERIALIZED (SELECT a.dst AS u, b.dst AS v, "
    "CAST(COUNT(*) AS BIGINT) AS p2 FROM unds a JOIN unds b "
    "ON a.src = b.src AND a.dst < b.dst GROUP BY a.dst, b.dst), "
    "cand AS MATERIALIZED (SELECT p.u, p.v, p.p2 FROM p2 p "
    "WHERE NOT EXISTS (SELECT 1 FROM canons c WHERE c.src = p.u AND c.dst = p.v)), "
    "p3 AS (SELECT c.u, c.v, CAST(SUM(COALESCE(w2.w, 0)) AS BIGINT) AS p3 "
    "FROM cand c JOIN unds e ON e.src = c.u "
    "LEFT JOIN w2 ON w2.x = e.dst AND w2.y = c.v GROUP BY c.u, c.v) "
    "SELECT c.u, c.v, c.p2, p3.p3, "
    "CAST(100 * c.p2 + p3.p3 AS BIGINT) AS lp_e2 "
    "FROM cand c JOIN p3 ON c.u = p3.u AND c.v = p3.v"
)

_ORACLES["local_path_256"] = _LOCAL_PATH_SQL


# ---------------------------------------------------------------------------
# partition quality census (algorithms/partition.partition_quality)
# ---------------------------------------------------------------------------
def _q_partition_quality(spark, sf_dir):
    """Per-part node/intra/cut census of the converged Spinner
    assignment — how a partitioner is graded."""
    from dachshund_spark.algorithms.partition import (
        balanced_partition,
        partition_quality,
    )

    g = derived_graph(spark, sf_dir)
    assign = balanced_partition(g, k=4, rounds=8, seed=0)
    return partition_quality(g, assign)


def _partition_quality_sql(k: int = 4, rounds: int = 8, seed: int = 0) -> str:
    parts, fin = _balanced_partition_parts(k, rounds, seed)
    parts = parts + [
        SQL_CANON,
        f"pe AS MATERIALIZED (SELECT a.part AS pa, b.part AS pb FROM canon c "
        f"JOIN {fin} a ON c.src = a.node_id JOIN {fin} b ON c.dst = b.node_id)",
        f"nnp AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS n_nodes "
        f"FROM {fin} GROUP BY part)",
        "intra AS (SELECT pa AS part, CAST(COUNT(*) AS BIGINT) AS intra_edges "
        "FROM pe WHERE pa = pb GROUP BY pa)",
        "cut AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS cut_edges FROM ("
        "SELECT pa AS part FROM pe WHERE pa <> pb "
        "UNION ALL SELECT pb FROM pe WHERE pa <> pb) GROUP BY part)",
    ]
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT n.part, n.n_nodes, COALESCE(i.intra_edges, 0) AS intra_edges, "
        "COALESCE(c.cut_edges, 0) AS cut_edges "
        "FROM nnp n LEFT JOIN intra i ON n.part = i.part "
        "LEFT JOIN cut c ON n.part = c.part"
    )


_ORACLES["partition_quality_4"] = _partition_quality_sql()


# ---------------------------------------------------------------------------
# URL template mining (pipeline/curate.url_pattern_census)
# ---------------------------------------------------------------------------
def _q_url_pattern(spark, sf_dir):
    """Digit-run URL templates per host over synthetic faceted-nav
    urls — the crawler-trap detector; global regex replace parity."""
    from dachshund_spark.pipeline.curate import url_pattern_census

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    x = (d % 8).cast("string")
    c = d % 3
    url = (
        F.when(
            c == 0,
            F.concat(
                F.lit("https://h"), x, F.lit(".example.com/item/"),
                (d % 40).cast("string"), F.lit("/page/"),
                (d % 7).cast("string"), F.lit("?sid="), d.cast("string"),
            ),
        )
        .when(
            c == 1,
            F.concat(F.lit("https://h"), x, F.lit(".example.com/about")),
        )
        .otherwise(
            F.concat(
                F.lit("https://h"), x, F.lit(".example.com/tag/t"),
                (d % 5).cast("string"), F.lit("/"), (d % 11).cast("string"),
            )
        )
    )
    return url_pattern_census(
        docs.select("doc_id", url.alias("url")), min_pages=2
    )


_URL_PATTERN_SQL = (
    "WITH urls AS (SELECT doc_id, CASE "
    "WHEN doc_id % 3 = 0 THEN 'https://h' || (doc_id % 8) || "
    "'.example.com/item/' || (doc_id % 40) || '/page/' || (doc_id % 7) || "
    "'?sid=' || doc_id "
    "WHEN doc_id % 3 = 1 THEN 'https://h' || (doc_id % 8) || '.example.com/about' "
    "ELSE 'https://h' || (doc_id % 8) || '.example.com/tag/t' || "
    "(doc_id % 5) || '/' || (doc_id % 11) END AS url FROM documents), "
    "px AS (SELECT lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS host, "
    "regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), "
    "'[0-9]+', 'N', 'g') AS pattern, url FROM urls) "
    "SELECT host, pattern, CAST(COUNT(*) AS BIGINT) AS n_pages, "
    "CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls "
    "FROM px GROUP BY host, pattern HAVING COUNT(*) >= 2"
)

_ORACLES["url_pattern_census"] = _URL_PATTERN_SQL


# ---------------------------------------------------------------------------
# parallel-pivot correlation clustering (algorithms/correlation.py)
# ---------------------------------------------------------------------------
def _q_correlation_pivot(spark, sf_dir):
    """KwikCluster parallel-pivot rounds on the md5-signed derived
    graph; md5 priorities, deterministic, singleton finalization."""
    from dachshund_spark.algorithms.correlation import correlation_pivot

    return correlation_pivot(derived_graph(spark, sf_dir), rounds=12, seed=0)


def _correlation_parts(rounds: int = 12, seed: int = 0) -> "tuple[list[str], str]":
    sign = MD5L.format(
        x="CAST(src AS VARCHAR) || '#' || CAST(dst AS VARCHAR)"
    )
    pri = MD5L.format(x=f"'cp{seed}#' || CAST(node_id AS VARCHAR)")
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        SQL_CANON,
        f"sg AS MATERIALIZED (SELECT src, dst, "
        f"CASE WHEN {sign} % 2 = 0 THEN 1 ELSE -1 END AS sign FROM canon)",
        "pos AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM sg WHERE sign = 1 "
        "UNION ALL SELECT dst AS src, src AS dst FROM sg WHERE sign = 1))",
        f"s0 AS MATERIALIZED (SELECT node_id, {pri} AS pri, "
        "CAST(NULL AS BIGINT) AS cluster FROM nodes)",
    ]
    for r in range(1, rounds + 1):
        parts += [
            f"a{r} AS MATERIALIZED (SELECT node_id, pri FROM s{r-1} "
            f"WHERE cluster IS NULL)",
            f"e{r} AS MATERIALIZED (SELECT p.src, p.dst, sa.pri AS ps "
            f"FROM pos p JOIN a{r} sa ON p.src = sa.node_id "
            f"JOIN a{r} sb ON p.dst = sb.node_id)",
            f"nm{r} AS MATERIALIZED (SELECT dst AS node_id, MIN(ps) AS mn "
            f"FROM e{r} GROUP BY dst)",
            f"pv{r} AS MATERIALIZED (SELECT a.node_id FROM a{r} a "
            f"LEFT JOIN nm{r} m ON a.node_id = m.node_id "
            f"WHERE m.mn IS NULL OR a.pri < m.mn)",
            f"ag{r} AS MATERIALIZED (SELECT e.dst AS node_id, "
            f"(MIN({{'p': e.ps, 'c': e.src}})).c AS joined "
            f"FROM e{r} e JOIN pv{r} p ON e.src = p.node_id GROUP BY e.dst)",
            f"s{r} AS MATERIALIZED (SELECT s.node_id, s.pri, "
            f"CASE WHEN s.cluster IS NOT NULL THEN s.cluster "
            f"WHEN p.node_id IS NOT NULL THEN s.node_id "
            f"ELSE g.joined END AS cluster "
            f"FROM s{r-1} s LEFT JOIN pv{r} p ON s.node_id = p.node_id "
            f"LEFT JOIN ag{r} g ON s.node_id = g.node_id)",
        ]
    parts.append(
        f"fin AS MATERIALIZED (SELECT node_id, "
        f"COALESCE(cluster, node_id) AS cluster FROM s{rounds})"
    )
    return parts, "fin"


def _correlation_pivot_sql(rounds: int = 12, seed: int = 0) -> str:
    parts, fin = _correlation_parts(rounds, seed)
    return (
        "WITH " + ", ".join(parts) + f" SELECT node_id, cluster FROM {fin}"
    )


_ORACLES["correlation_pivot"] = _correlation_pivot_sql()


def _q_correlation_quality(spark, sf_dir):
    """Disagreement census (intra −, inter +) of the pivot clustering
    — the correlation-clustering objective, exact integers."""
    from dachshund_spark.algorithms.correlation import (
        correlation_disagreements,
        correlation_pivot,
    )

    g = derived_graph(spark, sf_dir)
    return correlation_disagreements(g, correlation_pivot(g, rounds=12, seed=0))


def _correlation_quality_sql(rounds: int = 12, seed: int = 0) -> str:
    parts, fin = _correlation_parts(rounds, seed)
    parts.append(
        f"pe AS (SELECT g.sign, a.cluster AS ca, b.cluster AS cb FROM sg g "
        f"JOIN {fin} a ON g.src = a.node_id JOIN {fin} b ON g.dst = b.node_id)"
    )
    return (
        "WITH " + ", ".join(parts) + " SELECT CAST(COUNT(*) AS BIGINT) AS n_edges, "
        "CAST(SUM(CASE WHEN ca = cb AND sign = -1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS intra_neg, "
        "CAST(SUM(CASE WHEN ca <> cb AND sign = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS inter_pos, "
        "CAST(SUM(CASE WHEN ca = cb AND sign = -1 THEN 1 ELSE 0 END) + "
        "SUM(CASE WHEN ca <> cb AND sign = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS disagreements FROM pe"
    )


_ORACLES["correlation_quality"] = _correlation_quality_sql()


# ---------------------------------------------------------------------------
# U-shaped attribution, Heaps' law, AMS F2 sketch
# ---------------------------------------------------------------------------
def _q_positional_attribution(spark, sf_dir):
    """40-20-40 position-based credit split (exact e8 integers; packed
    epoch·2^20+id first/last order)."""
    from dachshund_spark.relational import positional_attribution

    return positional_attribution(load_table(spark, sf_dir, "events"))


_POSITIONAL_SQL = (
    "WITH p AS (SELECT event_id AS conv_id, user_id AS u, "
    "epoch_us(ts) // 1000000 AS pt FROM events WHERE event_type = 'purchase'), "
    "c AS (SELECT event_id AS touch_id, user_id AS u, "
    "epoch_us(ts) // 1000000 AS ct FROM events WHERE event_type = 'click'), "
    "pr AS MATERIALIZED (SELECT conv_id, touch_id, ct * 1048576 + touch_id AS k "
    "FROM p JOIN c ON p.u = c.u AND c.ct <= p.pt AND c.ct > p.pt - 1800), "
    "st AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_touches, "
    "MIN(k) AS f, MAX(k) AS l FROM pr GROUP BY conv_id) "
    "SELECT pr.conv_id, pr.touch_id, n_touches, "
    "CAST(CASE WHEN n_touches = 1 THEN 100000000 "
    "WHEN n_touches = 2 THEN 50000000 "
    "WHEN pr.k = st.f OR pr.k = st.l THEN 40000000 "
    "ELSE 20000000 // (n_touches - 2) END AS BIGINT) AS credit_e8 "
    "FROM pr JOIN st ON pr.conv_id = st.conv_id"
)

_ORACLES["positional_attribution"] = _POSITIONAL_SQL


def _q_heaps_curve(spark, sf_dir):
    """Vocabulary growth at power-of-two doc-id prefixes — first-seen
    min ids, bin-length levels, tiny range self-joins (sort-free)."""
    from dachshund_spark.pipeline.text import heaps_curve

    return heaps_curve(load_table(spark, sf_dir, "documents"))


_HEAPS_SQL = (
    "WITH pd AS MATERIALIZED (SELECT CAST(length(bin(doc_id + 1)) AS BIGINT) "
    "AS lvl, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt FROM documents), "
    "dh AS MATERIALIZED (SELECT lvl, CAST(COUNT(*) AS BIGINT) AS docs, "
    "CAST(SUM(nt) AS BIGINT) AS toks FROM pd GROUP BY lvl), "
    "fs AS MATERIALIZED (SELECT CAST(length(bin(MIN(doc_id) + 1)) AS BIGINT) AS lvl "
    "FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token "
    "FROM documents) GROUP BY token), "
    "vh AS MATERIALIZED (SELECT lvl, CAST(COUNT(*) AS BIGINT) AS vocab "
    "FROM fs GROUP BY lvl), "
    "lv AS (SELECT DISTINCT lvl FROM dh), "
    "cum AS (SELECT l.lvl AS k, CAST(SUM(d.docs) AS BIGINT) AS n_docs, "
    "CAST(SUM(d.toks) AS BIGINT) AS tokens_cum FROM lv l "
    "JOIN dh d ON d.lvl <= l.lvl GROUP BY l.lvl), "
    "vc AS (SELECT l.lvl AS k, CAST(SUM(v.vocab) AS BIGINT) AS vocab_cum "
    "FROM lv l JOIN vh v ON v.lvl <= l.lvl GROUP BY l.lvl) "
    "SELECT c.k, c.n_docs, c.tokens_cum, vc.vocab_cum "
    "FROM cum c JOIN vc ON c.k = vc.k"
)

_ORACLES["heaps_curve"] = _HEAPS_SQL


def _q_ams_f2(spark, sf_dir):
    """16 AMS ±1-hash F2 estimators + the exact F2 — the estimator
    error is itself oracle-pinned."""
    from dachshund_spark.pipeline.sketches import ams_f2

    return ams_f2(load_table(spark, sf_dir, "documents"), k=16)


_AMS_SQL = (
    "WITH toks AS MATERIALIZED (SELECT unnest(string_split(text, ' ')) AS token "
    "FROM documents), "
    "sg AS (SELECT j, CASE WHEN "
    + MD5L.format(x="'ams' || CAST(j AS VARCHAR) || '#' || token")
    + " % 2 = 0 THEN 1 ELSE -1 END AS s "
    "FROM toks CROSS JOIN (SELECT unnest(range(0, 16)) AS j)), "
    "z AS (SELECT j, CAST(SUM(s) AS BIGINT) AS z FROM sg GROUP BY j), "
    "f2 AS (SELECT CAST(SUM(f * f) AS BIGINT) AS f2 FROM ("
    "SELECT CAST(COUNT(*) AS BIGINT) AS f FROM toks GROUP BY token)) "
    "SELECT CAST(j AS BIGINT) AS estimator, z, CAST(z * z AS BIGINT) AS z2, "
    "(SELECT f2 FROM f2) AS f2_exact FROM z"
)

_ORACLES["ams_f2_16"] = _AMS_SQL


# ---------------------------------------------------------------------------
# WAV autocorrelation (pipeline/multimodal.decode_audio_autocorr)
# ---------------------------------------------------------------------------
def _q_wav_autocorr(spark, sf_dir):
    """Exact-integer lag-{1,2,4,8} autocorrelation from REAL WAV bytes
    — the decoder is pinned because the oracle computes the same sums
    from the fixture formula without decoding."""
    from dachshund_spark.pipeline.multimodal import (
        decode_audio_autocorr,
        make_wav_media,
    )

    return decode_audio_autocorr(make_wav_media(spark, n=64, n_samples=256))


_WAV_AUTOCORR_SQL = (
    "WITH ids AS MATERIALIZED (SELECT unnest(range(64)) AS media_id), "
    "ix AS MATERIALIZED (SELECT unnest(range(256)) AS i), "
    "lg AS MATERIALIZED (SELECT unnest([1, 2, 4, 8]) AS lag), "
    "sm AS MATERIALIZED (SELECT media_id, i, "
    "((media_id * 13 + i * 509) % 65536) - 32768 AS s FROM ids, ix) "
    "SELECT a.media_id, CAST(l.lag AS BIGINT) AS lag, "
    "CAST(SUM(a.s * b.s) AS BIGINT) AS ac "
    "FROM lg l JOIN sm a ON TRUE JOIN sm b "
    "ON b.media_id = a.media_id AND b.i = a.i + l.lag "
    "GROUP BY a.media_id, l.lag"
)

_ORACLES["wav_autocorr"] = _WAV_AUTOCORR_SQL


# ---------------------------------------------------------------------------
# edge dispersion (algorithms/linkpred.dispersion_scores)
# ---------------------------------------------------------------------------
def _q_dispersion(spark, sf_dir):
    """Backstrom-Kleinberg absolute dispersion per edge of the
    256-node subgraph — strong-tie detection vs plain embeddedness."""
    from dachshund_spark.algorithms.linkpred import dispersion_scores

    e = derived_graph(spark, sf_dir).edges
    sub = LinkGraph(e.where((F.col("src") < 256) & (F.col("dst") < 256)))
    return dispersion_scores(sub)


_DISPERSION_SQL = (
    f"WITH {SQL_E}, "
    "sube AS MATERIALIZED (SELECT src, dst FROM edges_raw WHERE src < 256 AND dst < 256), "
    "unds AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
    "(SELECT src, dst FROM sube UNION ALL SELECT dst AS src, src AS dst FROM sube) "
    "WHERE src <> dst), "
    "canons AS MATERIALIZED (SELECT src AS u, dst AS v FROM unds WHERE src < dst), "
    "cne AS MATERIALIZED (SELECT c.u, c.v, a.dst AS w FROM canons c "
    "JOIN unds a ON a.src = c.u JOIN unds b ON b.src = c.v AND b.dst = a.dst), "
    "cnt AS MATERIALIZED (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn "
    "FROM cne GROUP BY u, v), "
    "prs AS MATERIALIZED (SELECT a.u, a.v, a.w AS s, b.w AS t "
    "FROM cne a JOIN cne b ON a.u = b.u AND a.v = b.v AND a.w < b.w "
    "WHERE NOT EXISTS (SELECT 1 FROM unds e WHERE e.src = a.w AND e.dst = b.w)), "
    "shared AS MATERIALIZED (SELECT DISTINCT p.u, p.v, p.s, p.t "
    "FROM prs p JOIN cne c ON c.u = p.u AND c.v = p.v "
    "JOIN unds x ON x.src = p.s AND x.dst = c.w "
    "JOIN unds y ON y.src = p.t AND y.dst = c.w), "
    "disp AS (SELECT p.u, p.v, CAST(COUNT(*) AS BIGINT) AS disp FROM prs p "
    "WHERE NOT EXISTS (SELECT 1 FROM shared s "
    "WHERE s.u = p.u AND s.v = p.v AND s.s = p.s AND s.t = p.t) GROUP BY p.u, p.v) "
    "SELECT c.u, c.v, COALESCE(n.cn, 0) AS cn, COALESCE(d.disp, 0) AS disp "
    "FROM canons c LEFT JOIN cnt n ON c.u = n.u AND c.v = n.v "
    "LEFT JOIN disp d ON c.u = d.u AND c.v = d.v"
)

_ORACLES["dispersion_256"] = _DISPERSION_SQL


# ---------------------------------------------------------------------------
# empirical-Bayes host quality (relational.shrunken_rates)
# ---------------------------------------------------------------------------
def _q_host_quality_shrunk(spark, sf_dir):
    """Per-host quality pass-rate with prior-strength-16 shrinkage
    toward the corpus rate — exact integer num/den, one division."""
    from dachshund_spark.pipeline.text import quality_scores
    from dachshund_spark.relational import shrunken_rates

    docs = load_table(spark, sf_dir, "documents")
    q = quality_scores(docs).select("doc_id", "passes_quality")
    host = F.concat(
        F.lit("h"),
        F.pmod(F.col("doc_id"), F.lit(32)).cast("string"),
        F.lit(".example.com"),
    )
    return shrunken_rates(
        q.select(host.alias("host"), "passes_quality"), "host", "passes_quality"
    )


_HOST_QUALITY_SQL = (
    f"WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents), "
    f"m AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens, "
    f"CAST(len(list_filter(toks, x -> x IN ({_STOP}))) AS INT) AS n_stop FROM t), "
    "q AS MATERIALIZED (SELECT 'h' || (doc_id % 32) || '.example.com' AS host, "
    "CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 AND "
    "CAST(n_stop AS DOUBLE) / n_tokens < 0.5 THEN 1 ELSE 0 END AS p FROM m), "
    "per AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(p) AS BIGINT) AS s FROM q GROUP BY host), "
    "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn, CAST(SUM(p) AS BIGINT) AS pp FROM q) "
    "SELECT host, n, s, "
    "CAST(s * (SELECT nn FROM tot) + 16 * (SELECT pp FROM tot) AS BIGINT) AS shrunk_num, "
    "CAST((SELECT nn FROM tot) * (n + 16) AS BIGINT) AS shrunk_den, "
    "CAST(s * (SELECT nn FROM tot) + 16 * (SELECT pp FROM tot) AS DOUBLE) / "
    "CAST((SELECT nn FROM tot) * (n + 16) AS DOUBLE) AS shrunk_rate FROM per"
)

_ORACLES["host_quality_shrunk"] = _HOST_QUALITY_SQL


# ---------------------------------------------------------------------------
# damping sweep (algorithms/pagerank.pagerank_damping_sweep)
# ---------------------------------------------------------------------------
def _q_pagerank_damping_sweep(spark, sf_dir):
    """Four damping factors in ONE coupled run — one edges join per
    superstep for the whole sweep (percolation-curve coupling)."""
    from dachshund_spark.algorithms.pagerank import pagerank_damping_sweep

    return pagerank_damping_sweep(derived_graph(spark, sf_dir))


def _pagerank_sweep_sql(
    dampings: "tuple[float, ...]" = (0.5, 0.7, 0.85, 0.95),
    iters: int = PAGERANK_ITERS,
) -> str:
    ks = [f"k{int(round(d * 100))}" for d in dampings]
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        SQL_D,
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "outdeg AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS od FROM d_edges GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT node_id, "
        + ", ".join(f"1.0 / (SELECT n FROM nn) AS {k}" for k in ks)
        + " FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"dang{i} AS MATERIALIZED (SELECT "
            + ", ".join(
                f"COALESCE(SUM(r.{k}), 0.0) AS dm_{k}" for k in ks
            )
            + f" FROM r{i} r LEFT JOIN outdeg o ON r.node_id = o.node_id "
            "WHERE o.node_id IS NULL)"
        )
        cols = ", ".join(
            f"{(1.0 - d)!r} / (SELECT n FROM nn) + {d!r} * ("
            f"COALESCE(c.c_{k}, 0.0) + (SELECT dm_{k} FROM dang{i}) / "
            f"(SELECT n FROM nn)) AS {k}"
            for d, k in zip(dampings, ks)
        )
        csums = ", ".join(f"SUM(r.{k} / o.od) AS c_{k}" for k in ks)
        parts.append(
            f"r{i+1} AS MATERIALIZED (SELECT n.node_id, {cols} "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node_id, {csums} "
            f"FROM d_edges e JOIN r{i} r ON e.src = r.node_id "
            f"JOIN outdeg o ON e.src = o.node_id GROUP BY e.dst) c "
            f"ON n.node_id = c.node_id)"
        )
    sel = " UNION ALL ".join(
        f"SELECT node_id, CAST({int(round(d * 100))} AS BIGINT) AS damping_e2, "
        f"ROUND({k}, 8) AS pagerank FROM r{iters}"
        for d, k in zip(dampings, ks)
    )
    return "WITH " + ", ".join(parts) + " " + sel


_ORACLES["pagerank_damping_sweep"] = _pagerank_sweep_sql()


# ---------------------------------------------------------------------------
# simplified silhouette (pipeline/clustering.silhouette_simplified)
# ---------------------------------------------------------------------------
def _q_silhouette(spark, sf_dir):
    """Centroid-surrogate silhouette of the kmeans_4_3 state — exact
    a2/b2 BIGINTs, one engine-stable division per point."""
    from dachshund_spark.pipeline.clustering import silhouette_simplified

    return silhouette_simplified(
        load_table(spark, sf_dir, "embeddings"), k=4, iterations=3
    )


def _silhouette_sql(k: int = 4, iters: int = 3) -> str:
    parts = _kmeans_parts(k, iters)
    parts.append(
        f"oth AS (SELECT a.vec_id, CAST(MIN(a.dist2) AS BIGINT) AS b2 "
        f"FROM a{iters} a JOIN b{iters} b ON a.vec_id = b.vec_id "
        f"AND a.cl <> b.cl GROUP BY a.vec_id)"
    )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT b.vec_id, b.cl AS cluster, CAST(b.dist2 AS BIGINT) AS a2, "
        "o.b2, CASE WHEN GREATEST(b.dist2, o.b2) = 0 THEN 0.0 ELSE "
        "CAST(o.b2 - b.dist2 AS DOUBLE) / "
        "CAST(GREATEST(b.dist2, o.b2) AS DOUBLE) END AS sil "
        f"FROM b{iters} b JOIN oth o ON b.vec_id = o.vec_id"
    )


_ORACLES["silhouette_4_3"] = _silhouette_sql()


# ---------------------------------------------------------------------------
# per-dimension MI screen (pipeline/clustering.dim_mutual_information)
# ---------------------------------------------------------------------------
def _q_dim_mi(spark, sf_dir):
    """I(label; sign(v_d)) per embedding dimension — e8 PMI terms
    weighted by exact cell counts."""
    from dachshund_spark.pipeline.clustering import dim_mutual_information

    return dim_mutual_information(load_table(spark, sf_dir, "embeddings"))


_DIM_MI_SQL = (
    "WITH q AS MATERIALIZED (SELECT vec_id, d, "
    "CAST(ROUND(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT) AS q FROM ("
    "SELECT vec_id, generate_subscripts(embedding, 1) AS d, "
    "unnest(embedding) AS v FROM embeddings)), "
    "lb AS MATERIALIZED (SELECT vec_id, CAST(label AS BIGINT) AS label "
    "FROM embeddings), "
    "cells AS MATERIALIZED (SELECT p.d, l.label, "
    "CASE WHEN p.q >= 0 THEN 1 ELSE 0 END AS s, "
    "CAST(COUNT(*) AS BIGINT) AS c "
    "FROM q p JOIN lb l ON p.vec_id = l.vec_id GROUP BY p.d, l.label, s), "
    "cl AS MATERIALIZED (SELECT label, CAST(COUNT(*) AS BIGINT) AS cl "
    "FROM lb GROUP BY label), "
    "cs AS MATERIALIZED (SELECT d, s, CAST(SUM(c) AS BIGINT) AS cs "
    "FROM cells GROUP BY d, s), "
    "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM lb), "
    "t AS (SELECT ce.d, CAST(ROUND(LN(CAST(ce.c * (SELECT nn FROM nn) AS DOUBLE) / "
    "CAST(cl.cl * cs.cs AS DOUBLE)) * 100000000, 0) AS BIGINT) * ce.c AS term "
    "FROM cells ce JOIN cl ON ce.label = cl.label "
    "JOIN cs ON ce.d = cs.d AND ce.s = cs.s) "
    "SELECT CAST(d AS BIGINT) AS d, CAST(SUM(term) AS BIGINT) AS mi_num_e8, "
    "CAST(SUM(term) AS DOUBLE) / (CAST((SELECT nn FROM nn) AS DOUBLE) * "
    "100000000.0) AS mi FROM t GROUP BY d"
)

_ORACLES["dim_mi_64"] = _DIM_MI_SQL


# ---------------------------------------------------------------------------
# greedy k-center coreset (pipeline/clustering.k_center_greedy)
# ---------------------------------------------------------------------------
def _q_k_center(spark, sf_dir):
    """Gonzalez farthest-first selection, k=8 — the coreset/pruning
    selector; each pick a LIMIT-1 scalar handoff, radii exact."""
    from dachshund_spark.pipeline.clustering import k_center_greedy

    return k_center_greedy(load_table(spark, sf_dir, "embeddings"), k=8)


def _k_center_sql(k: int = 8) -> str:
    parts = [
        "q AS MATERIALIZED (SELECT vec_id, d, "
        "CAST(ROUND(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT) AS q FROM ("
        "SELECT vec_id, generate_subscripts(embedding, 1) AS d, "
        "unnest(embedding) AS v FROM embeddings))",
        "c1 AS (SELECT MIN(vec_id) AS vec_id FROM q)",
        "m1 AS MATERIALIZED (SELECT a.vec_id, "
        "CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS d2 "
        "FROM q a JOIN q b ON a.d = b.d "
        "AND b.vec_id = (SELECT vec_id FROM c1) GROUP BY a.vec_id)",
    ]
    for i in range(2, k + 1):
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT vec_id, d2 FROM m{i-1} "
            f"ORDER BY d2 DESC, vec_id ASC LIMIT 1)"
        )
        if i < k:
            parts.append(
                f"m{i} AS MATERIALIZED (SELECT m.vec_id, "
                f"LEAST(m.d2, n.nd2) AS d2 FROM m{i-1} m JOIN ("
                f"SELECT a.vec_id, CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT) "
                f"AS nd2 FROM q a JOIN q b ON a.d = b.d "
                f"AND b.vec_id = (SELECT vec_id FROM s{i}) GROUP BY a.vec_id) n "
                f"ON m.vec_id = n.vec_id)"
            )
    sels = [
        "SELECT CAST(1 AS BIGINT) AS k_order, "
        "(SELECT vec_id FROM c1) AS center_id, CAST(0 AS BIGINT) AS sel_d2"
    ] + [
        f"SELECT CAST({i} AS BIGINT), (SELECT vec_id FROM s{i}), "
        f"(SELECT d2 FROM s{i})"
        for i in range(2, k + 1)
    ]
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(sels)


_ORACLES["k_center_8"] = _k_center_sql()


# ---------------------------------------------------------------------------
# Freeman centralization (algorithms/stats.degree_centralization)
# ---------------------------------------------------------------------------
def _q_degree_centralization(spark, sf_dir):
    """Freeman degree centralization — exact integer num/den, one
    division; the hub-domination dial."""
    from dachshund_spark.algorithms.stats import degree_centralization

    return degree_centralization(derived_graph(spark, sf_dir))


_DEGREE_CENTRALIZATION_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_N}, {SQL_DEG}, "
    "mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes, "
    "CAST(MAX(degree) AS BIGINT) AS max_degree, "
    "CAST(SUM(degree) AS BIGINT) AS sd FROM deg) "
    "SELECT n_nodes, max_degree, "
    "CAST(n_nodes * max_degree - sd AS BIGINT) AS cent_num, "
    "CAST((n_nodes - 1) * (n_nodes - 2) AS BIGINT) AS cent_den, "
    "CASE WHEN n_nodes > 2 THEN "
    "CAST(n_nodes * max_degree - sd AS DOUBLE) / "
    "CAST((n_nodes - 1) * (n_nodes - 2) AS DOUBLE) END AS centralization "
    "FROM mo"
)

_ORACLES["degree_centralization"] = _DEGREE_CENTRALIZATION_SQL


# ---------------------------------------------------------------------------
# PPJoin prefix-filtered similarity join (pipeline/dedup.jaccard_join_prefix)
# ---------------------------------------------------------------------------
def _q_jaccard_join(spark, sf_dir):
    """Exact Jaccard ≥ 0.7 self-join via df-ordered prefix filtering —
    the oracle brute-forces the token equijoin, so the candidate
    pruning's zero-false-negative guarantee is itself under test."""
    from dachshund_spark.pipeline.dedup import jaccard_join_prefix

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 512)
    return jaccard_join_prefix(docs, tau_num=7, tau_den=10)


_JACCARD_JOIN_SQL = (
    "WITH tk AS MATERIALIZED (SELECT DISTINCT doc_id, token FROM ("
    "SELECT doc_id, unnest(string_split(text, ' ')) AS token "
    "FROM documents WHERE doc_id < 512)), "
    "sz AS MATERIALIZED (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz "
    "FROM tk GROUP BY doc_id), "
    "pr AS MATERIALIZED (SELECT a.doc_id AS a, b.doc_id AS b, "
    "CAST(COUNT(*) AS BIGINT) AS inter FROM tk a JOIN tk b "
    "ON a.token = b.token AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id) "
    "SELECT p.a, p.b, p.inter, sa.sz AS size_a, sb.sz AS size_b "
    "FROM pr p JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id "
    "WHERE 10 * p.inter >= 7 * (sa.sz + sb.sz - p.inter)"
)

_ORACLES["jaccard_join_07"] = _JACCARD_JOIN_SQL


# ---------------------------------------------------------------------------
# exact-lattice kNN evals (pipeline/similarity.py)
# ---------------------------------------------------------------------------
_LATTICE_PAIRS_SQL = (
    "q AS MATERIALIZED (SELECT vec_id, d, "
    "CAST(ROUND(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT) AS q FROM ("
    "SELECT vec_id, generate_subscripts(embedding, 1) AS d, "
    "unnest(embedding) AS v FROM embeddings WHERE vec_id < 256)), "
    "pr AS MATERIALIZED (SELECT x.vec_id AS a, y.vec_id AS b, "
    "CAST(SUM((x.q - y.q) * (x.q - y.q)) AS BIGINT) AS dist2 "
    "FROM q x JOIN q y ON x.d = y.d AND x.vec_id <> y.vec_id "
    "GROUP BY x.vec_id, y.vec_id)"
)


def _q_mutual_nn(spark, sf_dir):
    """Reciprocal exact nearest neighbors over the 256-vector subset
    — the high-precision pairing primitive."""
    from dachshund_spark.pipeline.similarity import mutual_nearest_neighbors

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 256)
    return mutual_nearest_neighbors(emb)


_MUTUAL_NN_SQL = (
    "WITH " + _LATTICE_PAIRS_SQL + ", "
    "nn AS MATERIALIZED (SELECT a, b, dist2 FROM ("
    "SELECT *, ROW_NUMBER() OVER (PARTITION BY a ORDER BY dist2, b) AS rn "
    "FROM pr) WHERE rn = 1) "
    "SELECT f.a, f.b, f.dist2 FROM nn f JOIN nn g "
    "ON f.a = g.b AND f.b = g.a AND f.a < f.b"
)

_ORACLES["mutual_nn_256"] = _MUTUAL_NN_SQL


def _q_knn_label_agreement(spark, sf_dir):
    """5-NN label consistency (mislabel screen) over the 256-vector
    subset; agree is one division of exact integers."""
    from dachshund_spark.pipeline.similarity import knn_label_agreement

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 256)
    return knn_label_agreement(emb, k=5)


_KNN_LABEL_SQL = (
    "WITH " + _LATTICE_PAIRS_SQL + ", "
    "lb AS MATERIALIZED (SELECT vec_id, CAST(label AS BIGINT) AS label "
    "FROM embeddings WHERE vec_id < 256), "
    "tk AS MATERIALIZED (SELECT a, b FROM ("
    "SELECT *, ROW_NUMBER() OVER (PARTITION BY a ORDER BY dist2, b) AS rn "
    "FROM pr) WHERE rn <= 5), "
    "j AS (SELECT t.a, la.label AS la, lb2.label AS lbl FROM tk t "
    "JOIN lb la ON t.a = la.vec_id JOIN lb lb2 ON t.b = lb2.vec_id) "
    "SELECT a AS vec_id, la AS label, "
    "CAST(SUM(CASE WHEN la = lbl THEN 1 ELSE 0 END) AS BIGINT) AS n_same, "
    "CAST(SUM(CASE WHEN la <> lbl THEN 1 ELSE 0 END) AS BIGINT) AS n_diff, "
    "CAST(SUM(CASE WHEN la = lbl THEN 1 ELSE 0 END) AS DOUBLE) / "
    "CAST(COUNT(*) AS DOUBLE) AS agree FROM j GROUP BY a, la"
)

_ORACLES["knn_label_agreement_256"] = _KNN_LABEL_SQL


# ---------------------------------------------------------------------------
# Dunning LLR collocations (pipeline/lm.dunning_collocations)
# ---------------------------------------------------------------------------
def _q_dunning(spark, sf_dir):
    """G² collocations — four e8-pre-rounded ln terms weighted by
    exact cell counts; integer ordering, no float boundary."""
    from dachshund_spark.pipeline.lm import dunning_collocations

    return dunning_collocations(
        load_table(spark, sf_dir, "documents"), min_count=5, top_k=100
    )


def _dunning_term(o: str, row: str, col: str) -> str:
    return (
        f"CASE WHEN {o} > 0 THEN {o} * CAST(ROUND(LN("
        f"CAST({o} * nn AS DOUBLE) / CAST(({row}) * ({col}) AS DOUBLE)"
        f") * 100000000, 0) AS BIGINT) ELSE 0 END"
    )


_DUNNING_SQL = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
    "b AS MATERIALIZED (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM "
    "(SELECT toks, unnest(range(1, len(toks))) AS i FROM t WHERE len(toks) >= 2)), "
    "c12 AS MATERIALIZED (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 "
    "FROM b GROUP BY w1, w2), "
    "c1 AS MATERIALIZED (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM b GROUP BY w1), "
    "c2 AS MATERIALIZED (SELECT w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM b GROUP BY w2), "
    "nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM b), "
    "j AS (SELECT p.w1, p.w2, p.c12, a.c1, d.c2, (SELECT nn FROM nt) AS nn "
    "FROM c12 p JOIN c1 a ON p.w1 = a.w1 JOIN c2 d ON p.w2 = d.w2 "
    "WHERE p.c12 >= 5) "
    "SELECT w1, w2, c12, c1, c2, CAST(2 * ("
    + _dunning_term("c12", "c1", "c2")
    + " + "
    + _dunning_term("(c1 - c12)", "c1", "(nn - c2)")
    + " + "
    + _dunning_term("(c2 - c12)", "(nn - c1)", "c2")
    + " + "
    + _dunning_term("(nn - c1 - c2 + c12)", "(nn - c1)", "(nn - c2)")
    + ") AS BIGINT) AS llr_e8 FROM j "
    "ORDER BY llr_e8 DESC, w1 ASC, w2 ASC LIMIT 100"
)

_ORACLES["dunning_collocations"] = _DUNNING_SQL


# ---------------------------------------------------------------------------
# Weighted priority sample + rendezvous shard routing (pipeline/curate)
# ---------------------------------------------------------------------------
def _q_priority_sample(spark, sf_dir):
    """Top-64 events by deterministic w/u priority (Duffield priority
    sampling), weight = value cents; TakeOrdered, no global sort."""
    from dachshund_spark.pipeline.curate import priority_sample

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return priority_sample(ev, 64, "cents", id_col="event_id")


_PRIORITY_SAMPLE_SQL = (
    "WITH w AS (SELECT event_id, "
    "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events), "
    "p AS (SELECT event_id, cents, "
    "CAST((cents * CAST(1099511627776 AS BIGINT)) // "
    "((CAST(('0x' || substr(md5('pri0#' || CAST(event_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT) % 1099511627776) + 1) AS BIGINT) AS priority FROM w) "
    "SELECT event_id, cents, priority FROM p "
    "ORDER BY priority DESC, event_id ASC LIMIT 64"
)

_ORACLES["priority_sample_64"] = _PRIORITY_SAMPLE_SQL


def _q_rendezvous(spark, sf_dir):
    """HRW routing census over the corpus: winning shard of 8 per doc,
    plus the winner after shard 3 is removed — only shard-3 keys move."""
    from dachshund_spark.pipeline.curate import rendezvous_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    r = rendezvous_shards(docs, 8, removed=3)
    return (
        r.groupBy("shard", "shard_after")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("shard", "shard_after")
    )


def _rendezvous_sql(n: int = 8, removed: int = 3, seed: int = 0) -> str:
    def packed(i: int) -> str:
        return (
            f"((CAST(('0x' || substr(md5('hrw{seed}#{i}#' || "
            f"CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1099511627776) "
            f"* {n} + {i})"
        )

    full = "GREATEST(" + ", ".join(packed(i) for i in range(n)) + ")"
    after = "GREATEST(" + ", ".join(
        packed(i) for i in range(n) if i != removed
    ) + ")"
    return (
        f"WITH r AS (SELECT doc_id, "
        f"CAST({full} % {n} AS BIGINT) AS shard, "
        f"CAST({after} % {n} AS BIGINT) AS shard_after FROM documents) "
        "SELECT shard, shard_after, CAST(COUNT(*) AS BIGINT) AS n_docs "
        "FROM r GROUP BY shard, shard_after ORDER BY shard, shard_after"
    )


_ORACLES["rendezvous_census_8"] = _rendezvous_sql()


# ---------------------------------------------------------------------------
# OddBall egonet anomaly features (algorithms/stats.oddball_ego)
# ---------------------------------------------------------------------------
def _q_oddball(spark, sf_dir):
    """Per-node egonet (N, E) from degree + triangle tables only:
    E = deg + tri, N = deg + 1; density is one IEEE division."""
    from dachshund_spark.algorithms.stats import oddball_ego

    return oddball_ego(derived_graph(spark, sf_dir))


_ODDBALL_SQL = (
    f"WITH {SQL_E}, {SQL_U}, {SQL_N}, {SQL_CANON}, {SQL_DEG}, {SQL_TRI}, {SQL_TRIC} "
    "SELECT d.node_id, CAST(d.degree + 1 AS BIGINT) AS n_ego, "
    "CAST(d.degree + t.triangles AS BIGINT) AS e_ego, "
    "CAST(t.triangles AS BIGINT) AS tri, "
    "CAST(2.0 AS DOUBLE) * CAST(d.degree + t.triangles AS DOUBLE) / "
    "(CAST(d.degree + 1 AS DOUBLE) * CAST(d.degree AS DOUBLE)) AS density "
    "FROM deg d JOIN tric t ON d.node_id = t.node_id"
)

_ORACLES["oddball_ego"] = _ODDBALL_SQL


# ---------------------------------------------------------------------------
# Mirror-site census over per-host content fingerprints (pipeline/dedup)
# ---------------------------------------------------------------------------
def _q_host_mirrors(spark, sf_dir):
    """Host-pair shared-shingle census (Bharat–Broder mirror detection
    fingerprints 5-gram shingles, not whole pages): hosts are the
    deterministic doc_id % 16 shards of the corpus; inverted-index
    join on the shingle md5, df-capped fan-out."""
    from dachshund_spark.pipeline.dedup import host_overlap_census
    from dachshund_spark.pipeline.text import tokens

    n = 5
    toks = tokens("text")
    gram_array = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    shingles = load_table(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("h"), F.pmod(F.col("doc_id"), F.lit(16)).cast("string")
        ).alias("host"),
        F.explode(gram_array).alias("gram"),
    )
    return host_overlap_census(shingles, text_col="gram")


_HOST_MIRRORS_SQL = (
    "WITH toks AS (SELECT doc_id % 16 AS hid, string_split(text, ' ') AS t "
    "FROM documents), "
    "fp AS MATERIALIZED (SELECT DISTINCT 'h' || CAST(hid AS VARCHAR) AS host, "
    "md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]) AS h "
    "FROM toks, UNNEST(range(1, len(t) - 3)) AS r(i)), "
    "sizes AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n FROM fp GROUP BY host), "
    "ok AS (SELECT h FROM fp GROUP BY h "
    "HAVING COUNT(*) >= 2 AND COUNT(*) <= 32), "
    "fpo AS MATERIALIZED (SELECT f.host, f.h FROM fp f "
    "JOIN ok ON f.h = ok.h), "
    "pairs AS (SELECT a.host AS host_a, b.host AS host_b, "
    "CAST(COUNT(*) AS BIGINT) AS n_shared "
    "FROM fpo a JOIN fpo b ON a.h = b.h AND a.host < b.host "
    "GROUP BY a.host, b.host) "
    "SELECT p.host_a, p.host_b, p.n_shared, sa.n AS n_a, sb.n AS n_b, "
    "CAST(p.n_shared AS DOUBLE) / CAST(sa.n + sb.n - p.n_shared AS DOUBLE) "
    "AS jaccard "
    "FROM pairs p JOIN sizes sa ON p.host_a = sa.host "
    "JOIN sizes sb ON p.host_b = sb.host ORDER BY p.host_a, p.host_b"
)

_ORACLES["host_mirrors"] = _HOST_MIRRORS_SQL


# ---------------------------------------------------------------------------
# Exact path counts on the SCC condensation DAG (scc.dag_path_counts)
# ---------------------------------------------------------------------------
def _q_dag_paths(spark, sf_dir):
    """Source-to-component distinct path counts on the 64-node
    subgraph's condensation; BIGINT-exact synchronous relaxation."""
    from dachshund_spark.algorithms.scc import dag_path_counts

    return dag_path_counts(_small_graph(spark, sf_dir), max_rounds=24)


def _dag_paths_sql(rounds: int = 24, max_node: int = 64) -> str:
    parts = [
        "cedges AS MATERIALIZED (SELECT DISTINCT s.scc_id AS src, "
        "d.scc_id AS dst FROM sube e "
        "JOIN scc s ON e.src = s.node_id JOIN scc d ON e.dst = d.node_id "
        "WHERE s.scc_id <> d.scc_id)",
        "comps AS MATERIALIZED (SELECT DISTINCT scc_id, "
        "CASE WHEN scc_id NOT IN (SELECT dst FROM cedges) THEN 1 ELSE 0 END "
        "AS is_src FROM scc)",
        "p0 AS MATERIALIZED (SELECT scc_id, is_src, "
        "CAST(is_src AS BIGINT) AS path_count FROM comps)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT s.scc_id, s.is_src, "
            f"CASE WHEN s.is_src = 1 THEN CAST(1 AS BIGINT) "
            f"ELSE CAST(COALESCE(c.cnt, 0) AS BIGINT) END AS path_count "
            f"FROM p{i-1} s LEFT JOIN ("
            f"SELECT ce.dst AS scc_id, SUM(p.path_count) AS cnt "
            f"FROM cedges ce JOIN p{i-1} p ON ce.src = p.scc_id "
            f"GROUP BY ce.dst) c ON s.scc_id = c.scc_id)"
        )
    return (
        _scc_closure_sql(max_node)
        + ", "
        + ", ".join(parts)
        + f" SELECT scc_id, path_count FROM p{rounds}"
    )


_ORACLES["dag_path_counts_64"] = _dag_paths_sql()


# ---------------------------------------------------------------------------
# Whom-to-follow recommendations (PPR circle of trust → bipartite SALSA)
# ---------------------------------------------------------------------------
_WTF_SEEDS = (0, 1, 2, 3)
_WTF_CIRCLE = 20
_WTF_ITERS = 6
_WTF_TOPK = 10


def _q_wtf(spark, sf_dir):
    """Twitter-WTF shape (Gupta et al., WWW 2013): PPR from the seed
    set picks the top-20 "circle of trust"; SALSA runs on the bipartite
    graph of circle members (hubs) and their out-neighbors
    (authorities); the top authorities not already followed by (or
    equal to) a seed are the recommendations.  The circle handoff is a
    bounded LIMIT-20 collect; both top-k cuts rank by an e8-integer
    key so selection is engine-stable."""
    from dachshund_spark.algorithms.hits import wtf_recommendations

    return wtf_recommendations(
        derived_graph(spark, sf_dir),
        list(_WTF_SEEDS),
        circle_size=_WTF_CIRCLE,
        salsa_iterations=_WTF_ITERS,
        top_k=_WTF_TOPK,
        damping=DAMPING,
        ppr_iterations=PAGERANK_ITERS,
    )


def _wtf_sql() -> str:
    """Composes the PPR unroll with a prefixed SALSA unroll over the
    circle-filtered edge subgraph; same e8-integer ranking keys."""
    parts, pr_final = _ppr_parts(_WTF_SEEDS)
    seed_list = ", ".join(str(s) for s in _WTF_SEEDS)
    parts.append(
        f"circle AS MATERIALIZED (SELECT node_id FROM {pr_final} "
        f"ORDER BY CAST(ROUND(rank * 100000000.0, 0) AS BIGINT) DESC, "
        f"node_id ASC LIMIT {_WTF_CIRCLE})"
    )
    parts.append(
        "wedges AS MATERIALIZED (SELECT DISTINCT src, dst FROM d_edges "
        "WHERE src IN (SELECT node_id FROM circle))"
    )
    parts.append(
        "wnodes AS MATERIALIZED (SELECT DISTINCT node_id FROM "
        "(SELECT src AS node_id FROM wedges UNION ALL SELECT dst FROM wedges))"
    )
    parts.append(
        "wod AS MATERIALIZED (SELECT src AS node_id, COUNT(*) AS od "
        "FROM wedges GROUP BY src)"
    )
    parts.append(
        "wind AS MATERIALIZED (SELECT dst AS node_id, COUNT(*) AS ind "
        "FROM wedges GROUP BY dst)"
    )
    parts.append(
        "wse AS MATERIALIZED (SELECT e.src, e.dst, o.od, i.ind FROM wedges e "
        "JOIN wod o ON e.src = o.node_id JOIN wind i ON e.dst = i.node_id)"
    )
    parts.append(
        "ws0 AS MATERIALIZED (SELECT node_id, 1.0 AS hub, 1.0 AS auth FROM wnodes)"
    )
    for i in range(1, _WTF_ITERS + 1):
        parts.append(
            f"war{i} AS MATERIALIZED (SELECT e.dst AS node_id, "
            f"SUM(s.hub / e.od) AS auth "
            f"FROM wse e JOIN ws{i-1} s ON e.src = s.node_id GROUP BY e.dst)"
        )
        parts.append(
            f"wam{i} AS MATERIALIZED (SELECT MAX(auth) AS mx FROM war{i})"
        )
        parts.append(
            f"wa{i} AS MATERIALIZED (SELECT node_id, "
            f"auth / (SELECT mx FROM wam{i}) AS auth FROM war{i})"
        )
        parts.append(
            f"whr{i} AS MATERIALIZED (SELECT e.src AS node_id, "
            f"SUM(a.auth / e.ind) AS hub "
            f"FROM wse e JOIN wa{i} a ON e.dst = a.node_id GROUP BY e.src)"
        )
        parts.append(
            f"whm{i} AS MATERIALIZED (SELECT MAX(hub) AS mx FROM whr{i})"
        )
        parts.append(
            f"wh{i} AS MATERIALIZED (SELECT node_id, "
            f"hub / (SELECT mx FROM whm{i}) AS hub FROM whr{i})"
        )
        parts.append(
            f"ws{i} AS MATERIALIZED (SELECT n.node_id, "
            f"COALESCE(h.hub, 0.0) AS hub, COALESCE(a.auth, 0.0) AS auth "
            f"FROM wnodes n LEFT JOIN wh{i} h ON n.node_id = h.node_id "
            f"LEFT JOIN wa{i} a ON n.node_id = a.node_id)"
        )
    parts.append(
        f"followed AS (SELECT DISTINCT dst FROM d_edges "
        f"WHERE src IN ({seed_list}))"
    )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, ROUND(auth, 8) AS auth FROM ws{_WTF_ITERS} "
        f"WHERE node_id NOT IN (SELECT dst FROM followed) "
        f"AND node_id NOT IN ({seed_list}) "
        f"ORDER BY CAST(ROUND(auth * 100000000.0, 0) AS BIGINT) DESC, "
        f"node_id ASC LIMIT {_WTF_TOPK}"
    )


_ORACLES["wtf_recs_10"] = _wtf_sql()


# ---------------------------------------------------------------------------
# k-means|| oversampling init (pipeline/clustering.kmeanspp_init)
# ---------------------------------------------------------------------------
def _q_kmeanspp(spark, sf_dir):
    """Bahmani k-means|| seeding: 3 independent oversampling rounds
    (l=4), 20-bit round-tagged md5 coins, exact integer thresholds,
    nearest-candidate weights."""
    from dachshund_spark.pipeline.clustering import kmeanspp_init

    return kmeanspp_init(load_table(spark, sf_dir, "embeddings"))


def _kmeanspp_sql(
    l: int = 4, rounds: int = 3, seed: int = 0, scale: int = 1_000
) -> str:
    """Round-by-round replay; φ is a per-round scalar CTE (Spark
    collects the same exact BIGINT), NULLIF guards the φ=0 round."""
    parts = [
        f"q AS MATERIALIZED (SELECT vec_id, d, "
        f"CAST(ROUND(CAST(v AS DOUBLE) * {scale}, 0) AS BIGINT) AS q FROM ("
        "SELECT vec_id, generate_subscripts(embedding, 1) AS d, "
        "unnest(embedding) AS v FROM embeddings))",
        "first AS (SELECT MIN(vec_id) AS fid FROM embeddings)",
        "cent0 AS (SELECT fid AS vec_id, 0 AS round_added FROM first)",
        "d0 AS MATERIALIZED (SELECT p.vec_id, "
        "CAST(SUM((p.q - c.q) * (p.q - c.q)) AS BIGINT) AS d2 "
        "FROM q p JOIN q c ON p.d = c.d AND c.vec_id = (SELECT fid FROM first) "
        "GROUP BY p.vec_id)",
    ]
    for i in range(1, rounds + 1):
        coin = (
            f"CAST(('0x' || substr(md5('kpp{seed}#r{i}#' || "
            f"CAST(vec_id AS VARCHAR)), 1, 5)) AS BIGINT)"
        )
        parts.append(
            f"phi{i} AS (SELECT CAST(SUM(d2) AS BIGINT) AS phi FROM d{i-1})"
        )
        parts.append(
            f"new{i} AS MATERIALIZED (SELECT vec_id FROM d{i-1}, phi{i} "
            f"WHERE d2 > 0 AND ({coin}) < "
            f"CAST({l} * d2 * 1048576 // NULLIF(phi, 0) AS BIGINT))"
        )
        parts.append(
            f"nd{i} AS (SELECT vec_id, MIN(s) AS nd FROM ("
            f"SELECT p.vec_id, c.vec_id AS cl, "
            f"CAST(SUM((p.q - c.q) * (p.q - c.q)) AS BIGINT) AS s "
            f"FROM q p JOIN q c ON p.d = c.d "
            f"AND c.vec_id IN (SELECT vec_id FROM new{i}) "
            f"GROUP BY p.vec_id, c.vec_id) GROUP BY vec_id)"
        )
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT d.vec_id, "
            f"LEAST(d.d2, COALESCE(n.nd, d.d2)) AS d2 "
            f"FROM d{i-1} d LEFT JOIN nd{i} n ON d.vec_id = n.vec_id)"
        )
        parts.append(
            f"cent{i} AS MATERIALIZED (SELECT * FROM cent{i-1} "
            f"UNION ALL SELECT vec_id, {i} AS round_added FROM new{i})"
        )
    parts.append(
        f"ad AS (SELECT p.vec_id, c.vec_id AS cl, "
        f"CAST(SUM((p.q - c.q) * (p.q - c.q)) AS BIGINT) AS dist2 "
        f"FROM q p JOIN q c ON p.d = c.d "
        f"AND c.vec_id IN (SELECT vec_id FROM cent{rounds}) "
        f"GROUP BY p.vec_id, c.vec_id)"
    )
    parts.append(
        "nr AS (SELECT vec_id, cl FROM (SELECT *, ROW_NUMBER() OVER ("
        "PARTITION BY vec_id ORDER BY dist2, cl) AS rn FROM ad) WHERE rn = 1)"
    )
    parts.append("wt AS (SELECT cl, COUNT(*) AS weight FROM nr GROUP BY cl)")
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT c.vec_id, CAST(c.round_added AS BIGINT) AS round_added, "
        f"CAST(COALESCE(w.weight, 0) AS BIGINT) AS weight "
        f"FROM cent{rounds} c LEFT JOIN wt w ON c.vec_id = w.cl "
        f"ORDER BY c.vec_id"
    )


_ORACLES["kmeanspp_init_4_3"] = _kmeanspp_sql()


# ---------------------------------------------------------------------------
# Graph Voronoi partition around hash-sampled seeds (paths.voronoi_cells)
# ---------------------------------------------------------------------------
def _q_voronoi(spark, sf_dir):
    """Nearest-seed partition of the FULL derived graph; ~n/64 md5-
    sampled seeds, single packed (dist, cell) state per node."""
    from dachshund_spark.algorithms.paths import voronoi_cells

    return voronoi_cells(derived_graph(spark, sf_dir), seed_mod=64, seed=0)


def _voronoi_sql(rounds: int = 12, seed_mod: int = 64, seed: int = 0) -> str:
    """Packed-BIGINT Bellman-Ford replay: state(v) = MIN over ≤R-hop
    walks from any seed of dist·2^40 + seed_id (adding 2^40 per hop
    preserves the seed bits, so one MIN orders (dist, cell)
    lexicographically).  Rounds past convergence are no-ops, so a
    generous fixed unroll equals Spark's early-stopped frontier BFS."""
    pri = MD5L.format(x=f"'vor{seed}#' || CAST(node_id AS VARCHAR)")
    two40 = 1 << 40
    parts = [
        SQL_E,
        SQL_U,
        SQL_N,
        f"s0 AS MATERIALIZED (SELECT node_id, node_id AS packed FROM nodes "
        f"WHERE ({pri}) % {seed_mod} = 0)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"r{i} AS (SELECT e.dst AS node_id, "
            f"MIN(p.packed + {two40}) AS packed "
            f"FROM und e JOIN s{i-1} p ON e.src = p.node_id GROUP BY e.dst)"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT node_id, MIN(packed) AS packed "
            f"FROM (SELECT * FROM s{i-1} UNION ALL SELECT * FROM r{i}) "
            f"GROUP BY node_id)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT node_id, CAST(packed // {two40} AS BIGINT) AS dist, "
        f"CAST(packed % {two40} AS BIGINT) AS cell FROM s{rounds}"
    )


_ORACLES["voronoi_64"] = _voronoi_sql()


# ---------------------------------------------------------------------------
# Borgatti–Everett core–periphery split (algorithms/stats.core_periphery)
# ---------------------------------------------------------------------------
def _q_core_periphery(spark, sf_dir):
    """Lip's degree-prefix argmin on the degree histogram: ≤4 exact
    integer candidates per distinct degree, engine-stable tie-break."""
    from dachshund_spark.algorithms.stats import core_periphery

    return core_periphery(derived_graph(spark, sf_dir))


_CORE_PERIPHERY_SQL = (
    "WITH "
    + ", ".join(
        [
            SQL_E,
            SQL_U,
            SQL_DEG,
            "hist AS (SELECT degree AS d, COUNT(*) AS cnt FROM deg GROUP BY degree)",
            "blocks AS MATERIALIZED (SELECT d, "
            "SUM(cnt) OVER (ORDER BY d DESC ROWS UNBOUNDED PRECEDING) AS b, "
            "SUM(cnt) OVER (ORDER BY d DESC ROWS UNBOUNDED PRECEDING) - cnt + 1 AS a, "
            "SUM(d * cnt) OVER (ORDER BY d DESC ROWS UNBOUNDED PRECEDING) - d * cnt AS cum_prev "
            "FROM hist)",
            "tot AS (SELECT CAST(SUM(degree) AS BIGINT) AS degree_total, "
            "CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)",
            "cand AS (SELECT DISTINCT d, a, cum_prev, k FROM blocks, "
            "UNNEST([a, b, GREATEST(a, LEAST(b, d)), "
            "GREATEST(a, LEAST(b, d + 1))]) AS t(k))",
            "z AS MATERIALIZED (SELECT k, d, n_nodes, degree_total, "
            "k * (k - 1) + degree_total - 2 * (cum_prev + (k - a + 1) * d) AS z2 "
            "FROM cand, tot)",
        ]
    )
    + " SELECT CAST(MIN(k) AS BIGINT) AS k_star, "
    "CAST(arg_min(d, k) AS BIGINT) AS boundary_degree, "
    "CAST(z2 AS BIGINT) AS z2_min, n_nodes, degree_total "
    "FROM z, (SELECT MIN(z2) AS zm FROM z) "
    "WHERE z2 = zm GROUP BY z2, n_nodes, degree_total"
)

_ORACLES["core_periphery"] = _CORE_PERIPHERY_SQL


# ---------------------------------------------------------------------------
# TPC-H Q2/Q11/Q16/Q20 shapes over the derived partsupp catalog
# (relational.derived_partsupp — the fixture has no PARTSUPP table, so
# availqty/supplycost are modular formulas of the keys, identical in
# both engines).  These four close out the 22-query TPC-H sweep.
# ---------------------------------------------------------------------------
_PARTSUPP_CTE = (
    "partsupp AS MATERIALIZED (SELECT l_partkey AS ps_partkey, "
    "l_suppkey AS ps_suppkey, "
    "(l_partkey * 37 + l_suppkey * 101) % 9999 + 1 AS ps_availqty, "
    "(l_partkey * 13 + l_suppkey * 7) % 100000 + 100 AS ps_supplycost_e2 "
    "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))"
)


def _q_min_cost_supplier(spark, sf_dir):
    """Q2 decorrelated: groupBy-min over the derived partsupp + join
    back on (partkey, min cost); part/supplier dims broadcast."""
    from dachshund_spark.relational import min_cost_supplier

    return min_cost_supplier(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


_MIN_COST_SUPPLIER_SQL = (
    "WITH " + _PARTSUPP_CTE + ", "
    "sdim AS (SELECT s_suppkey, s_name, n_name, "
    "CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS acctbal_cents "
    "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'), "
    "cand AS MATERIALIZED (SELECT ps_partkey, ps_supplycost_e2, s_suppkey, "
    "s_name, n_name, acctbal_cents FROM partsupp "
    "JOIN part ON ps_partkey = p_partkey AND p_type = 'ECONOMY' "
    "JOIN sdim ON ps_suppkey = s_suppkey), "
    "mins AS (SELECT ps_partkey AS mk, MIN(ps_supplycost_e2) AS min_cost_e2 "
    "FROM cand GROUP BY ps_partkey) "
    "SELECT CAST(ps_partkey AS BIGINT) AS p_partkey, "
    "CAST(min_cost_e2 AS BIGINT) AS min_cost_e2, "
    "CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name, acctbal_cents "
    "FROM cand JOIN mins ON ps_partkey = mk AND ps_supplycost_e2 = min_cost_e2 "
    "ORDER BY p_partkey, s_suppkey"
)

_ORACLES["min_cost_supplier_q2"] = _MIN_COST_SUPPLIER_SQL


def _q_important_stock(spark, sf_dir):
    """Q11 scalar subquery as a broadcast one-row (total, n) aggregate;
    scale-invariant above-average cut, exact integer cross-multiply."""
    from dachshund_spark.relational import important_stock

    return important_stock(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


_IMPORTANT_STOCK_SQL = (
    "WITH " + _PARTSUPP_CTE + ", "
    "sdim AS (SELECT s_suppkey FROM supplier "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'), "
    "pp AS MATERIALIZED (SELECT ps_partkey, "
    "CAST(SUM(ps_supplycost_e2 * ps_availqty) AS BIGINT) AS value_e2 "
    "FROM partsupp JOIN sdim ON ps_suppkey = s_suppkey GROUP BY ps_partkey), "
    "tot AS (SELECT CAST(SUM(value_e2) AS BIGINT) AS total, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM pp) "
    "SELECT CAST(ps_partkey AS BIGINT) AS ps_partkey, value_e2 "
    "FROM pp, tot WHERE value_e2 * n * 2 > total * 3 "
    "ORDER BY value_e2 DESC, ps_partkey"
)

_ORACLES["important_stock_q11"] = _IMPORTANT_STOCK_SQL


def _q_supplier_part_census(spark, sf_dir):
    """Q16 NOT-IN as a broadcast anti-join (complaint analog: suppkey %
    7 == 0); distinct-supplier count per brand/type/size."""
    from dachshund_spark.relational import supplier_part_census

    return supplier_part_census(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
    )


_SUPPLIER_PART_CENSUS_SQL = (
    "WITH " + _PARTSUPP_CTE + " "
    "SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size, "
    "CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt "
    "FROM partsupp JOIN part ON ps_partkey = p_partkey "
    "WHERE p_brand <> 'Brand#13' AND ps_suppkey % 7 <> 0 "
    "GROUP BY p_brand, p_type, p_size "
    "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
)

_ORACLES["supplier_part_census_q16"] = _SUPPLIER_PART_CENSUS_SQL


def _q_promotion_candidates(spark, sf_dir):
    """Q20 nested-EXISTS as a per-(part,supp) rollup joined to the
    derived partsupp on the composite key; integer excess compare."""
    from dachshund_spark.relational import promotion_candidates

    return promotion_candidates(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
    )


_PROMOTION_CANDIDATES_SQL = (
    "WITH " + _PARTSUPP_CTE + ", "
    "qty AS (SELECT l_partkey, l_suppkey, "
    "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q "
    "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
    "AND l_shipdate < TIMESTAMP '1998-01-01' GROUP BY 1, 2), "
    "excess AS (SELECT ps_suppkey, CAST(COUNT(*) AS BIGINT) AS n_excess_parts "
    "FROM partsupp "
    "JOIN part ON ps_partkey = p_partkey AND p_name LIKE '%widget%' "
    "JOIN qty ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey "
    "WHERE ps_availqty > q * 100 GROUP BY ps_suppkey) "
    "SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name, "
    "n_excess_parts FROM excess "
    "JOIN supplier ON ps_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey ORDER BY s_suppkey"
)

_ORACLES["promotion_candidates_q20"] = _PROMOTION_CANDIDATES_SQL


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-10 nodes by PageRank on the sf0.001 derived graph."""
    from dachshund_spark.algorithms import pagerank

    g = derived_graph(spark, "/root/testdata/sf0.001")
    pr = pagerank(g, damping=DAMPING, fixed_iterations=PAGERANK_ITERS)
    return (
        pr.orderBy(F.desc("pagerank"), F.asc("node_id"))
        .limit(10)
        .select("node_id", F.round("pagerank", 8).alias("pagerank"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "out_degree": _q_out_degree,
        "undirected_degree": _q_undirected_degree,
        "graph_summary": _q_graph_summary,
        "hub_top20": _q_hub_top20,
        "cc_components": _q_cc,
        "incremental_cc": _q_incremental_cc,
        "cc_star": _q_cc_star,
        "pagerank_10": _q_pagerank,
        "pagerank_weighted_10": _q_pagerank_weighted,
        "ppr_10": _q_ppr,
        "hits_10": _q_hits,
        "salsa_10": _q_salsa,
        "densest_peel": _q_densest,
        "powerlaw_alpha_5": _q_powerlaw,
        "ngram_containment_pairs": _q_ngram_containment,
        "url_canonical_groups": _q_url_canonical,
        "simrank_64": _q_simrank,
        "phrase_merge_group": _q_phrase,
        "cms_top20": _q_cms,
        "robots_allowed": _q_robots,
        "random_walks_64": _q_random_walks,
        "node2vec_walks_64": _q_node2vec_walks,
        "skipgram_pairs": _q_skipgram_pairs,
        "lpa_5": _q_lpa,
        "triangle_counts": _q_triangles,
        "wedge_counts": _q_wedges,
        "transitivity_global": _q_transitivity,
        "clustering_coefficients": _q_clustering,
        "brokerage_roles": _q_brokerage,
        "event_sessions": _q_sessions,
        "hourly_rollup": _q_hourly,
        "pricing_summary": _q_pricing,
        "dedup_exact_groups": _q_dedup_exact,
        "token_stats": _q_token_stats,
        "quality_scores": _q_quality,
        "language_id": _q_langid,
        "doc_fingerprints": _q_fingerprint,
        "minhash_signatures": _q_minhash,
        "minhash_similar_pairs": _q_minhash_pairs,
        "minhash_lsh_candidates": _q_minhash_lsh_candidates,
        "dedup_clusters": _q_dedup_clusters,
        "corpus_curation": _q_corpus_curation,
        "simhash": _q_simhash,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "embedding_topk": _q_embedding_topk,
        "triplet_mining_32": _q_triplets,
        "embedding_ann_lsh": _q_embedding_ann_lsh,
        "image_features": _q_image_features,
        "image_near_dups": _q_image_near_dups,
        "kcore_10": _q_kcore,
        "weighted_kcore_260": _q_weighted_kcore,
        "weighted_clustering": _q_weighted_clustering,
        "coreness_all": _q_coreness_all,
        "ktruss_5": _q_ktruss,
        "truss_edges_4": _q_truss_edges,
        "bfs_dist_0": _q_bfs,
        "neighborhood_64": _q_neighborhood,
        "distance_summary_64": _q_distance_summary,
        "harmonic_64": _q_harmonic,
        "hyperball_harmonic_64": _q_hyperball_harmonic,
        "weighted_sssp_0": _q_weighted_sssp,
        "widest_path_0": _q_widest_path,
        "kmv_distinct_64": _q_kmv,
        "eccentricity_64": _q_eccentricity,
        "scc_64": _q_scc,
        "dag_levels_64": _q_dag_levels,
        "bowtie_64": _q_bowtie,
        "assortativity": _q_assortativity,
        "attribute_assortativity": _q_attr_assortativity,
        "knn_degree_curve": _q_knn_curve,
        "reciprocity": _q_reciprocity,
        "degree_distribution": _q_degree_distribution,
        "evcent_local": _q_evcent_local,
        "evcent_dist": _q_evcent_dist,
        "betweenness_dist": _q_betweenness_dist,
        "edge_betweenness_64": _q_edge_betweenness,
        "betweenness_local": _q_betweenness_local,
        "cnm_local": _q_cnm_local,
        "featurize_local": _q_featurize_local,
        "host_graph": _q_host_graph,
        "motif_triads": _q_motif_triads,
        "spam_mass_10": _q_spam_mass,
        "crawl_delta": _q_crawl_delta,
        "cocitation_256": _q_cocitation,
        "coupling_256": _q_coupling,
        "butterflies_256": _q_butterflies,
        "coloring_8": _q_coloring,
        "dup_spans_32": _q_dup_spans,
        "winnow_16_4": _q_winnow,
        "winnow_pairs": _q_winnow_pairs,
        "dsir_weights": _q_dsir,
        "pack_256": _q_pack,
        "effective_diameter_64": _q_eff_diameter,
        "stratified_sample": _q_stratified_sample,
        "ngram_novelty_32": _q_novelty,
        "dup_intervals_32": _q_dup_intervals,
        "lpa_conductance_5": _q_lpa_conductance,
        "bpe_merges_8": _q_bpe,
        "bpe_encode_8": _q_bpe_encode,
        "embedding_scores": _q_embedding_scores,
        "vocabulary": _q_vocabulary,
        "readability": _q_readability,
        "token_entropy": _q_token_entropy,
        "lpa_weighted_5": _q_lpa_weighted,
        "katz_10": _q_katz,
        "url_filter": _q_url_filter,
        "ego_64": _q_ego,
        "hub_robustness_10": _q_hub_robustness,
        "landmark_dists_64": _q_landmark_dists,
        "landmark_est_64": _q_landmark_est,
        "edge_sample_4": _q_edge_sample,
        "neighbor_sample_2x4": _q_neighbor_sample,
        "host_pagerank_10": _q_host_pagerank,
        "link_prediction_256": _q_link_prediction,
        "lpa_modularity": _q_lpa_modularity,
        "louvain_8": _q_louvain,
        "louvain_modularity": _q_louvain_modularity,
        "semdedup": _q_semdedup,
        "simhash_near_dups": _q_simhash_near_dups,
        "mixture_weights": _q_mixture_weights,
        "repetition_stats": _q_repetition_stats,
        "segment_dedup": _q_segment_dedup,
        "anchor_text": _q_anchor_text,
        "page_structure_stats": _q_page_structure,
        "mis_256": _q_mis,
        "msf_256": _q_msf,
        "pagerank_warmstart": _q_pagerank_warmstart,
        "crawl_frontier": _q_crawl_frontier,
        "single_linkage_64": _q_single_linkage,
        "decontaminate_3": _q_decontaminate,
        "dup_ngram_stats_3": _q_dup_ngrams,
        "mixture_sample": _q_mixture_sample,
        "pii_scrub": _q_pii_scrub,
        "pages_roundtrip": _q_pages_roundtrip,
        "warc_roundtrip": _q_warc_roundtrip,
        "clique_miner": _q_clique_miner,
        "streaming_window": _q_streaming_window,
        "tfidf_top3": _q_tfidf_top3,
        "bm25_top10": _q_bm25,
        "retrieval_eval_10": _q_retrieval_eval,
        "rrf_top10": _q_rrf,
        "chunk_windows_32": _q_chunk_windows,
        "redirect_resolve": _q_redirects,
        "fastrp_4": _q_fastrp,
        "sybilrank_8": _q_sybilrank,
        "opic_6": _q_opic,
        "rich_club": _q_rich_club,
        "onion_layers": _q_onion,
        "bigram_lm_scores": _q_bigram_lm,
        "kneser_ney_top100": _q_kneser_ney,
        "gopher_filters": _q_gopher,
        "ccnet_buckets": _q_ccnet_buckets,
        "pmi_top100": _q_pmi,
        "double_sweep_diameter": _q_double_sweep,
        "temporal_pagerank_10": _q_temporal_pagerank,
        "four_cliques_256": _q_four_cliques,
        "pagerank_residuals_10": _q_pagerank_residuals,
        "event_transitions": _q_event_transitions,
        "interevent_burstiness": _q_burstiness,
        "copurchase_top20": _q_copurchase,
        "assoc_rules_3": _q_assoc_rules,
        "absorbing_hit_8": _q_absorbing_hit,
        "cascade_8": _q_cascade,
        "matching_greedy": _q_matching,
        "bloom_decontam_3": _q_bloom_decontam,
        "batch_ppr_6": _q_batch_ppr,
        "coarsen_matching": _q_coarsen,
        "unigram_kl": _q_unigram_kl,
        "incremental_dedup_3": _q_incremental_dedup,
        "mutual_links_top20": _q_mutual_links,
        "token_zipf_alpha": _q_zipf,
        "cdc_chunks_3_8": _q_cdc,
        "hll_source_distinct": _q_hll,
        "truss_communities_4": _q_truss_communities,
        "degree_quantiles": _q_degree_quantiles,
        "length_quantiles": _q_length_quantiles,
        "rewire_2": _q_rewire,
        "motif_significance_2": _q_motif_significance,
        "scan_clusters": _q_scan,
        "lspar_sparsify": _q_lspar,
        "kmeans_4_3": _q_kmeans,
        "pq_adc_top5": _q_pq_adc,
        "refex_2": _q_refex,
        "wl_hash_3": _q_wl_hash,
        "sweep_cut_0": _q_sweep_cut,
        "crawl_budget_10000": _q_crawl_budget,
        "gap_bits": _q_gap_bits,
        "temporal_reach_10": _q_temporal_reach,
        "vertex_cover_2": _q_vertex_cover,
        "percolation_3": _q_percolation,
        "shipping_priority": _q_shipping_priority,
        "local_supplier_volume": _q_local_supplier_volume,
        "funnel_3": _q_funnel,
        "retention_cohorts": _q_retention,
        "gap_fill_hourly": _q_gap_fill,
        "decayed_counts": _q_decayed_counts,
        "ws_graph_512_4": _q_ws_graph,
        "session_window_30m": _q_session_window,
        "doc_similarity_top3": _q_doc_sim,
        "ws_smallworld_curve": _q_ws_curve,
        "zorder_layout": _q_zorder,
        "articulation_64": _q_articulation,
        "bridges_64": _q_bridges,
        "two_edge_components_64": _q_two_edge,
        "dyad_census": _q_dyad_census,
        "textrank_top50": _q_textrank,
        "degree_gini": _q_degree_gini,
        "constraint_256": _q_constraint,
        "rake_top20": _q_rake,
        "revenue_q6": _q_revenue_q6,
        "sitemap_roundtrip": _q_sitemap,
        "closeness_64": _q_closeness,
        "clustering_by_degree": _q_clustering_by_degree,
        "efficiency_64": _q_efficiency,
        "rmat_8_4096": _q_rmat,
        "tokenizer_fertility": _q_fertility,
        "lsh_precision": _q_lsh_precision,
        "cpm_communities_256": _q_cpm,
        "kclique_counts_512": _q_kclique_counts,
        "maximal_cliques_512": _q_maximal_cliques,
        "graphlet_census_256": _q_graphlets,
        "png_decode_features": _q_png_decode,
        "bmp_decode_features": _q_bmp_decode,
        "gif_decode_features": _q_gif_decode,
        "image_decode_dispatch": _q_image_dispatch,
        "wav_decode_features": _q_wav_decode,
        "jpeg_decode_features": _q_jpeg_decode,
        "jpeg_progressive_features": _q_jpeg_progressive,
        "video_frame_features": _q_video_decode,
        "edge_clustering_top100": _q_edge_clustering,
        "signed_balance": _q_signed_balance,
        "temporal_triangles_365": _q_temporal_triangles,
        "mattr_10": _q_mattr,
        "politeness_schedule": _q_politeness,
        "returned_items_top20": _q_returned_items,
        "priority_shipments": _q_priority_shipments,
        "mmr_rerank_5": _q_mmr,
        "hll_merge_daily": _q_hll_merge,
        "recrawl_intervals_3": _q_recrawl,
        "source_lang_mix": _q_source_lang_mix,
        "event_markov_8": _q_event_markov,
        "spearman_pr_degree": _q_spearman,
        "config_model_check": _q_config_model,
        "asof_attribution_30m": _q_asof_attribution,
        "degree_entropy": _q_degree_entropy,
        "volume_shipping": _q_volume_shipping,
        "market_share": _q_market_share,
        "cust_order_dist": _q_cust_order_dist,
        "promo_effect": _q_promo_effect,
        "large_volume_customers": _q_large_volume_customers,
        "small_qty_revenue": _q_small_qty_revenue,
        "discounted_revenue": _q_discounted_revenue,
        "sole_late_suppliers": _q_sole_late_suppliers,
        "dormant_rich_customers": _q_dormant_rich,
        "top_supplier_q15": _q_top_supplier,
        "c4_line_filters": _q_c4_lines,
        "grid_dbscan": _q_grid_dbscan,
        "seeded_label_prop_4": _q_seeded_lpa,
        "canonical_groups": _q_canonical_groups,
        "boilerplate_lines": _q_boilerplate,
        "site_best_page": _q_site_best_page,
        "event_value_quantiles": _q_event_quantiles,
        "cusum_hourly": _q_cusum,
        "wav_energy_windows": _q_wav_windows,
        "multitouch_attribution": _q_multitouch,
        "max_coverage_6": _q_max_coverage,
        "feature_prop_3": _q_feature_prop,
        "product_profit_q9": _q_product_profit,
        "mojibake_census": _q_mojibake,
        "outlink_host_entropy": _q_outlink_entropy,
        "name_neardup_pairs": _q_name_neardups,
        "rfm_segments": _q_rfm,
        "activity_streaks": _q_streaks,
        "core_periphery": _q_core_periphery,
        "voronoi_64": _q_voronoi,
        "kmeanspp_init_4_3": _q_kmeanspp,
        "wtf_recs_10": _q_wtf,
        "dag_path_counts_64": _q_dag_paths,
        "oddball_ego": _q_oddball,
        "host_mirrors": _q_host_mirrors,
        "priority_sample_64": _q_priority_sample,
        "rendezvous_census_8": _q_rendezvous,
        "local_bridges": _q_local_bridges,
        "forman_curvature": _q_forman_curvature,
        "forest_fire_8": _q_forest_fire,
        "ql_dirichlet_top10": _q_ql_dirichlet,
        "feature_hash_32": _q_feature_hash,
        "stupid_backoff": _q_stupid_backoff,
        "balanced_partition_4": _q_balanced_partition,
        "erdos_gallai": _q_erdos_gallai,
        "props_key_stats": _q_props_key_stats,
        "nearest_centroid_eval": _q_nearest_centroid,
        "hilbert_layout": _q_hilbert_layout,
        "local_path_256": _q_local_path,
        "partition_quality_4": _q_partition_quality,
        "url_pattern_census": _q_url_pattern,
        "correlation_pivot": _q_correlation_pivot,
        "correlation_quality": _q_correlation_quality,
        "positional_attribution": _q_positional_attribution,
        "heaps_curve": _q_heaps_curve,
        "ams_f2_16": _q_ams_f2,
        "wav_autocorr": _q_wav_autocorr,
        "dispersion_256": _q_dispersion,
        "host_quality_shrunk": _q_host_quality_shrunk,
        "pagerank_damping_sweep": _q_pagerank_damping_sweep,
        "silhouette_4_3": _q_silhouette,
        "dim_mi_64": _q_dim_mi,
        "k_center_8": _q_k_center,
        "degree_centralization": _q_degree_centralization,
        "jaccard_join_07": _q_jaccard_join,
        "mutual_nn_256": _q_mutual_nn,
        "knn_label_agreement_256": _q_knn_label_agreement,
        "dunning_collocations": _q_dunning,
        "hourly_uniformity": _q_hourly_uniformity,
        "kaplan_meier": _q_kaplan_meier,
        "truncation_agreement": _q_truncation,
        "split_leakage": _q_split_leakage,
        "directed_assortativity": _q_directed_assortativity,
        "min_cost_supplier_q2": _q_min_cost_supplier,
        "important_stock_q11": _q_important_stock,
        "supplier_part_census_q16": _q_supplier_part_census,
        "promotion_candidates_q20": _q_promotion_candidates,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles; keys without an entry (LSH-bucketed ops and the
    pandas-UDF image stub) get the driver's rows-only check."""
    return dict(_ORACLES)
