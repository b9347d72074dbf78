"""LinkGraph — the engine's core abstraction.

A thin, lazy wrapper over a directed edge DataFrame
``edges([graph_id: long,] src: long, dst: long)``.  The edge DataFrame
*is* the sparse adjacency matrix; nothing is ever materialized densely
(the reference builds dense nalgebra matrices on demand,
/root/reference/src/dachshund/algorithms/adjacency_matrix.rs:13-40 —
that only works because its graphs fit in RAM).

Undirected semantics follow the reference's ``SimpleNode``
(BTreeSet neighbors — deduplicated, /root/reference/src/dachshund/node.rs:149-152):
symmetrize then distinct.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from dachshund_spark.util import GRAPH_ID, gcols

EDGE_SCHEMA = "src long, dst long"
EDGE_SCHEMA_G = f"{GRAPH_ID} long, src long, dst long"


class LinkGraph:
    """Wrapper holding the canonical directed edge DataFrame.

    All algorithm modules accept/return DataFrames; this class only
    provides the normalized views they share (symmetrized edges, node
    set, degrees) so a query plan can reuse one cached symmetrization
    across algorithms.
    """

    def __init__(self, edges: DataFrame, extra_cols: Sequence[str] = ()):
        """``extra_cols`` keeps named attribute columns (e.g. an edge
        weight) on ``self.edges``; the normalized views (undirected /
        canonical / degrees) still project them away."""
        cols = set(edges.columns)
        if not {"src", "dst"} <= cols:
            raise ValueError(f"edges must have src/dst columns, got {edges.columns}")
        missing = set(extra_cols) - cols
        if missing:
            raise ValueError(f"extra_cols not in edges: {sorted(missing)}")
        keep = (
            ([GRAPH_ID] if GRAPH_ID in cols else [])
            + ["src", "dst"]
            + list(extra_cols)
        )
        self.edges = edges.select(*keep)
        self._undirected: DataFrame | None = None
        self._canonical: DataFrame | None = None

    # ---------------------------------------------------------- views
    @property
    def grouping(self) -> list[str]:
        return gcols(self.edges)

    def undirected_edges(self) -> DataFrame:
        """Symmetrized, deduplicated adjacency (each edge both ways).

        Mirrors SimpleUndirectedGraphBuilder::from_vector inserting both
        directions into BTreeSets
        (/root/reference/src/dachshund/simple_undirected_graph_builder.rs:84-108).
        Self-loops are dropped (the reference's set-based adjacency keeps
        them but every algorithm fixture is loop-free).
        """
        if self._undirected is None:
            e = self.edges
            g = self.grouping
            sym = e.select(*g, "src", "dst").union(
                e.select(*g, F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            self._undirected = (
                sym.where(F.col("src") != F.col("dst")).distinct()
            )
        return self._undirected

    def weighted_undirected_edges(
        self, weight_col: str, agg: str = "max"
    ) -> DataFrame:
        """Symmetrized weighted adjacency: [g?, src, dst, weight_col].

        Duplicate rows for the same unordered pair collapse via ``agg``
        ("max" default — deterministic; for a simple weighted graph this
        is the identity; MSF callers use "min", the lightest parallel
        edge).  Self-loops dropped, matching :meth:`undirected_edges`."""
        if weight_col not in self.edges.columns:
            raise ValueError(f"weight column {weight_col!r} not in edges")
        e = self.edges
        g = self.grouping
        sym = e.select(*g, "src", "dst", weight_col).union(
            e.select(
                *g,
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                weight_col,
            )
        )
        agg_fn = {"max": F.max, "min": F.min, "sum": F.sum}[agg]
        return (
            sym.where(F.col("src") != F.col("dst"))
            .groupBy(*g, "src", "dst")
            .agg(agg_fn(weight_col).alias(weight_col))
        )

    def canonical_edges(self) -> DataFrame:
        """Each undirected edge exactly once, oriented src < dst.

        The reference emits undirected edges once with id < neighbor
        (/root/reference/src/dachshund/simple_undirected_graph.rs:85).
        """
        if self._canonical is None:
            self._canonical = self.undirected_edges().where(F.col("src") < F.col("dst"))
        return self._canonical

    def nodes(self) -> DataFrame:
        """Distinct node ids appearing on either endpoint."""
        g = self.grouping
        e = self.edges
        return (
            e.select(*g, F.col("src").alias("node_id"))
            .union(e.select(*g, F.col("dst").alias("node_id")))
            .distinct()
        )

    def degrees(self) -> DataFrame:
        """Undirected degree = distinct-neighbor count per node.

        SimpleNode::degree is the size of a deduplicated neighbor set
        (/root/reference/src/dachshund/node.rs:176-179).
        """
        und = self.undirected_edges()
        return (
            und.groupBy(*gcols(und), F.col("src").alias("node_id"))
            .agg(F.count("*").alias("degree"))
        )

    def out_degrees(self) -> DataFrame:
        e = self.edges.distinct()
        return e.groupBy(*self.grouping, F.col("src").alias("node_id")).agg(
            F.count("*").alias("out_degree")
        )

    def in_degrees(self) -> DataFrame:
        e = self.edges.distinct()
        return e.groupBy(*self.grouping, F.col("dst").alias("node_id")).agg(
            F.count("*").alias("in_degree")
        )

    def approx_degrees(self, rsd: float = 0.05) -> DataFrame:
        """HyperLogLog++ distinct-neighbor counts: [g?, node_id,
        approx_degree].

        The trillion-edge variant of :meth:`degrees`: the exact path
        must first DISTINCT the symmetrized edge list (a full shuffle
        of the edge table); the sketch path aggregates the RAW edge
        list once — duplicate (src, dst) rows fold into the HLL
        register update instead of a pre-shuffle, and the relative
        standard deviation dial trades memory for accuracy.
        """
        e = self.edges
        g = self.grouping
        sym = e.select(*g, "src", "dst").union(
            e.select(*g, F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).where(F.col("src") != F.col("dst"))
        return sym.groupBy(*g, F.col("src").alias("node_id")).agg(
            F.approx_count_distinct("dst", rsd).alias("approx_degree")
        )

    def num_edges(self) -> int:
        """Undirected edge count (sum of degrees / 2,
        /root/reference/src/dachshund/simple_undirected_graph.rs:63-69)."""
        return self.canonical_edges().count()

    def num_nodes(self) -> int:
        return self.nodes().count()

    def excluding_nodes(self, nodes: DataFrame) -> "LinkGraph":
        """Induced subgraph without the given nodes — the reference's
        prune / ignore_nodes masks (graph_builder.rs:175-217,
        connected_components.rs:20-44) as left_anti joins."""
        g = self.grouping
        bad_src = nodes.select(*g, F.col("node_id").alias("src"))
        bad_dst = nodes.select(*g, F.col("node_id").alias("dst"))
        e = self.edges.join(bad_src, on=g + ["src"], how="left_anti").join(
            bad_dst, on=g + ["dst"], how="left_anti"
        )
        return LinkGraph(e)

    def excluding_edges(self, edges: DataFrame) -> "LinkGraph":
        """Subgraph without the given undirected edges (ignore_edges
        mask, connected_components.rs:20-44); both orientations of each
        listed pair are removed."""
        g = self.grouping
        both = edges.select(*g, "src", "dst").union(
            edges.select(*g, F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        return LinkGraph(self.edges.join(both, on=g + ["src", "dst"], how="left_anti"))

    def persist(self) -> "LinkGraph":
        self.undirected_edges().persist()
        return self

    def unpersist(self) -> "LinkGraph":
        if self._undirected is not None:
            self._undirected.unpersist()
        return self

    # ---------------------------------------------------- construction
    @classmethod
    def from_edgelist(
        cls,
        spark: SparkSession,
        edges: Iterable[Sequence[int]],
        graph_id: int | None = None,
        num_partitions: int | None = None,
    ) -> "LinkGraph":
        """Build from python tuples — fixture-scale convenience only."""
        rows = list(edges)
        if rows and len(rows[0]) == 3:
            df = spark.createDataFrame(rows, schema=EDGE_SCHEMA_G)
        else:
            if graph_id is not None:
                rows = [(graph_id, s, d) for (s, d) in rows]
                df = spark.createDataFrame(rows, schema=EDGE_SCHEMA_G)
            else:
                df = spark.createDataFrame(rows, schema=EDGE_SCHEMA)
        if num_partitions:
            df = df.repartition(num_partitions)
        return cls(df)

    # --------------------------------------------- synthetic generators
    # Deterministic counterparts of the reference's test-graph builders
    # (/root/reference/src/dachshund/simple_undirected_graph_builder.rs:17-76);
    # the reference's Erdős–Rényi uses thread_rng (nondeterministic, :63)
    # — ours is seeded.
    @staticmethod
    def complete_graph(spark: SparkSession, n: int) -> "LinkGraph":
        ids = spark.range(n).select(F.col("id").alias("src"))
        pairs = ids.crossJoin(spark.range(n).select(F.col("id").alias("dst")))
        return LinkGraph(pairs.where(F.col("src") < F.col("dst")))

    @staticmethod
    def path_graph(spark: SparkSession, n: int) -> "LinkGraph":
        df = spark.range(n - 1).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        return LinkGraph(df)

    @staticmethod
    def cycle_graph(spark: SparkSession, n: int) -> "LinkGraph":
        df = spark.range(n).select(
            F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
        )
        return LinkGraph(df)

    @staticmethod
    def erdos_renyi(spark: SparkSession, n: int, p: float, seed: int = 42) -> "LinkGraph":
        ids = spark.range(n).select(F.col("id").alias("src"))
        pairs = ids.crossJoin(spark.range(n).select(F.col("id").alias("dst")))
        df = pairs.where(F.col("src") < F.col("dst")).where(F.rand(seed) < p)
        return LinkGraph(df)

    @staticmethod
    def powerlaw_graph(
        spark: SparkSession,
        n_nodes: int,
        n_edges: int,
        exponent: float = 1.2,
        seed: int = 42,
        num_partitions: int | None = None,
    ) -> "LinkGraph":
        """Seeded scale-free-ish directed multigraph with hub skew.

        dst is drawn from an inverse-power CDF so a handful of nodes
        capture most in-links — this is the skew fixture feeding the
        salting / two-phase aggregation paths (FIXTURES.md §5).
        Fully distributed: built from spark.range, no driver data.
        """
        e = spark.range(n_edges)
        if num_partitions:
            e = e.repartition(num_partitions)
        u1 = F.rand(seed)
        u2 = F.rand(seed + 1)
        src = (u1 * n_nodes).cast("long")
        # inverse-transform sample of a truncated zipf-like law
        dst = (
            F.pow(u2, F.lit(exponent * 2.5)) * n_nodes
        ).cast("long") % n_nodes
        df = e.select(src.alias("src"), dst.alias("dst")).where(
            F.col("src") != F.col("dst")
        )
        return LinkGraph(df)

    @staticmethod
    def rmat(
        spark: SparkSession,
        scale: int,
        n_edges: int,
        seed: int = 42,
        probs: tuple = (57, 19, 19),
        num_partitions: int | None = None,
    ) -> "LinkGraph":
        """Deterministic R-MAT generator (Chakrabarti, Zhan & Faloutsos,
        SDM 2004): 2^scale nodes, ``n_edges`` edges, quadrant
        probabilities a/b/c percent (d = remainder) — the Graph500
        topology with community structure + power-law degrees.

        Every quadrant choice is ``md5(seed#edge#level) % 100`` against
        the cumulative thresholds, so the edge list is a pure function
        of (scale, n_edges, seed): replayable in any engine, identical
        across runs/cluster sizes.  The build is column algebra over
        ``spark.range(n_edges)`` exploded by level — embarrassingly
        parallel, zero shuffles until the per-edge bit sums (one
        grouped agg on edge_id).  Self-loops and duplicate edges are
        kept, as standard for R-MAT.
        """
        from dachshund_spark.pipeline.text import md5_long

        a, b, c = (int(x) for x in probs)
        e = spark.range(n_edges).select(F.col("id").alias("edge_id"))
        if num_partitions:
            e = e.repartition(num_partitions)
        lv = e.select(
            "edge_id", F.explode(F.sequence(F.lit(0), F.lit(int(scale) - 1))).alias("l")
        )
        h = md5_long(
            F.concat_ws("#", F.lit(int(seed)), F.col("edge_id"), F.col("l"))
        ) % 100
        q = (
            F.when(h < a, F.lit(0))
            .when(h < a + b, F.lit(1))
            .when(h < a + b + c, F.lit(2))
            .otherwise(F.lit(3))
        )
        bits = lv.select(
            "edge_id",
            "l",
            (q >= 2).cast("long").alias("_sb"),
            (q % 2).cast("long").alias("_db"),
        ).withColumn(
            "_p2", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(l AS INT))")
        )
        edges = bits.groupBy("edge_id").agg(
            F.sum(F.col("_sb") * F.col("_p2")).alias("src"),
            F.sum(F.col("_db") * F.col("_p2")).alias("dst"),
        )
        return LinkGraph(edges.select("src", "dst"))

    @staticmethod
    def watts_strogatz(
        spark: SparkSession,
        n: int,
        k: int,
        p_pct: int,
        seed: int = 42,
    ) -> "LinkGraph":
        """Deterministic Watts-Strogatz small-world generator: ring
        lattice of ``n`` nodes each wired to its ``k/2`` clockwise
        neighbors, then each lattice edge rewired with probability
        ``p_pct``% to an md5-chosen target — high clustering with
        log-length shortcuts (Watts & Strogatz 1998).

        Both the rewire decision (``md5(seed#i#j#r) % 100``) and the
        replacement target (``md5(seed#i#j#t) % n``) are pure functions
        of (n, k, p_pct, seed) — engine-replayable, zero shuffles
        (rewired targets landing on the source are kept as the lattice
        edge instead, the standard no-self-loop simplification).
        """
        from dachshund_spark.pipeline.text import md5_long

        # k=0 would make F.sequence(1, 0) DESCEND (Spark semantics),
        # emitting bogus j∈{1,0} rows incl. self-loops — require the
        # Watts-Strogatz preconditions outright (ADVICE r3)
        assert k >= 2 and k % 2 == 0 and n > k and 0 <= p_pct <= 100
        base = spark.range(n).select(F.col("id").alias("i"))
        lat = base.select(
            "i",
            F.explode(F.sequence(F.lit(1), F.lit(int(k // 2)))).alias("j"),
        )
        key = lambda tag: F.concat_ws(  # noqa: E731
            "#", F.lit(int(seed)), F.col("i"), F.col("j"), F.lit(tag)
        )
        ring_dst = (F.col("i") + F.col("j")) % F.lit(int(n))
        rewired = md5_long(key("r")) % 100 < F.lit(int(p_pct))
        target = md5_long(key("t")) % F.lit(int(n))
        dst = F.when(
            rewired & (target != F.col("i")), target
        ).otherwise(ring_dst)
        return LinkGraph(lat.select(F.col("i").alias("src"), dst.alias("dst")))
