"""Generic iterative graph dataflow over edge DataFrames.

Companion to the connected-components operator in ``dedup.py`` (the
alternating star algorithm): where CC answers "which docs form one
near-dup cluster", PageRank answers "which doc is the most central
member" — canonical-document selection inside a cluster, domain/link
authority over a crawl graph, influence over an interaction graph.

The reference ships no graph operator (GraphX is out of its surveyed
surface, SURVEY §7.4); both operators are beyond-reference
training-data-pipeline components built purely from joins + groupBys,
so Catalyst/AQE own the physical strategy at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iterations: int = 8,
    damping: float = 0.85,
) -> DataFrame:
    """(id, rank) PageRank over the undirected graph given as a pair
    list (near-dup pairs, co-click pairs, hyperlinks-as-pairs).
    Undirected: each edge contributes mass in both directions, the
    standard symmetrization for similarity graphs.

    Power iteration, fixed ``iterations`` (8 rounds reaches ~1e-3 on
    graphs with damping 0.85; callers needing tighter tails raise it):

        r(v) <- (1-d)/N + d * sum_{u~v} r(u) / deg(u)

    Numerics (round 6, the repo's integer convention): rank state is a
    fixed-point BIGINT in 1e-12 units of total mass, contributions are
    integer floor divisions (``rq div deg``), and damping applies as
    an exact integer ratio (``damping`` quantized to 1/10000) — the
    whole iteration is integer arithmetic, bit-identical on any
    engine/partitioning, which is what lets graph_pagerank carry an
    unrolled SQL oracle. The floor divisions shave at most one 1e-12
    unit per edge per iteration off total mass — far below the 1e-3
    convergence scale of the fixpoint itself.

    Every node appearing in ``pairs`` gets a row; ranks over each
    connected component sum to that component's share of N (teleport
    is uniform), so within-cluster ranks are directly comparable for
    canonical-member selection.

    100 TB design: one join (ranks x edges on the source key) + one
    groupBy (destination key) per iteration — both hash-partitioned by
    node id, map-side combined; degrees come from one upfront groupBy.
    Rank state is localCheckpoint-ed every iteration to truncate the
    iterative lineage (swap for checkpoint() on a cluster if executor
    loss matters). Hub nodes cost their own degree, never a
    neighborhood materialization.
    """
    edges = (
        pairs.select(
            F.col(id_a).cast("long").alias("u"),
            F.col(id_b).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    deg = sym.groupBy("u").agg(F.count("*").alias("deg"))
    n_nodes = deg.count()
    scale = 10**12
    d_num = int(round(damping * 10000))  # damping as an exact /10000 ratio
    t_q = ((10000 - d_num) * scale) // (10000 * n_nodes)
    ranks = deg.select("u", F.lit(scale // n_nodes).cast("long").alias("rq"))
    for _ in range(iterations):
        contribs = (
            sym.join(ranks, "u")
            .join(deg, "u")
            # integer floor division — `div`, not `/`: a double ratio's
            # floor can flip an ulp away from an integer; div cannot
            .select("v", F.expr("rq div deg").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("mass"))
        )
        # left join keeps isolated-by-direction nodes (none in the
        # symmetrized graph, but the shape stays correct for directed
        # callers); missing mass means only teleport rank
        ranks = (
            deg.select("u")
            .join(contribs.withColumnRenamed("v", "u"), "u", "left")
            .select(
                "u",
                (
                    F.lit(t_q)
                    + F.expr(f"({d_num} * coalesce(mass, 0L)) div 10000")
                )
                .cast("long")
                .alias("rq"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("u").alias("id"), (F.col("rq") / F.lit(float(scale))).alias("rank")
    )


def co_occurrence_edges(
    df: DataFrame, group_col: str, node_col: str
) -> DataFrame:
    """Undirected co-occurrence edge list: nodes sharing a group
    (suppliers co-filling an order, users co-editing a doc, terms
    co-occurring in a window) get one canonical ``src < dst`` edge.

    Scale shape: distinct (group, node) first — membership dedup kills
    the multiplicity blowup — then a within-group self-join whose
    fan-out is bounded by group size squared. A power-law hub group
    WOULD blow up here, so real deployments cap or sample mega-groups;
    the fixture's groups (lineitems per order) are bounded by
    construction. Final distinct collapses parallel edges."""
    m = df.select(
        F.col(group_col).alias("g"), F.col(node_col).alias("n")
    ).distinct()
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.n") < F.col("b.n")))
        .select(F.col("a.n").alias("src"), F.col("b.n").alias("dst"))
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over a canonical (src < dst) edge list —
    the clustering-structure scalar every graph report leads with.

    The classic two-join formulation: wedges a-b-c from edges (a,b),
    (b,c), closed by probing (a,c). Canonical orientation (a < b < c
    throughout) counts each triangle exactly once AND bounds the wedge
    stream by out-degrees in the degree-ordered DAG — the standard
    skew-defense for triangle counting at scale. Joins are plain
    equi-joins; AQE picks broadcast vs shuffle per side."""
    ab = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return (
        ab.join(bc, "b")
        .join(ac, ["a", "c"])
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Degree distribution of an undirected canonical edge list:
    (degree, n_nodes) rows. Two map-side-combined groupBys — endpoints
    union to (node, 1) partials, then degrees roll up; shuffle traffic
    is node- then degree-cardinality, never edge payloads."""
    ends = edges.select(F.col("src").alias("n")).unionAll(
        edges.select(F.col("dst").alias("n"))
    )
    deg = ends.groupBy("n").agg(F.count("*").cast("bigint").alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count("*").cast("bigint").alias("n_nodes"))
        .orderBy("degree")
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007): every node starts in its own community; each round a
    node adopts the most frequent label among its neighbors (ties →
    smallest label, making the whole run deterministic — the classic
    LPA tie-coin is the one thing that doesn't belong on a cluster).
    Returns (node, label) — topical grouping of a near-dup/co-click
    graph where connected components are too coarse (CC glues
    everything that touches; LPA splits loosely-bridged regions).

    100 TB design: per round, one join (labels × symmetrized edges on
    the source key) + one two-level groupBy (neighbor-label counts →
    per-node argmax via max_by) — all hash-partitioned on node id,
    map-side combined, no neighborhood materialization; hubs cost
    their degree in count rows, never a collect_list. Label state is
    localCheckpoint-ed per round (same lineage discipline as
    ``pagerank``). Fixed ``iterations`` keeps the job graph static;
    LPA converges in a handful of sweeps on social/similarity graphs.

    Convergence guard (the ``dedup_clusters`` poison-round
    convention): one extra probe sweep runs after the last round, and
    if ANY label would still change the result gains a single
    (node=-1, label=-1) sentinel row — so an under-provisioned
    ``iterations`` breaks an oracle row-count match LOUDLY instead of
    both engines agreeing on the same non-fixed-point answer.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # NB: a repartition("v") before this checkpoint measures ~2x SLOWER
    # end-to-end — localCheckpoint scans report unknown partitioning to
    # Catalyst, so the join re-shuffles anyway and the upfront exchange
    # is pure overhead. On a real cluster, bucketed edge storage is the
    # way to make the per-round edge shuffle disappear.
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    def sweep(state: DataFrame) -> DataFrame:
        neigh = sym.join(
            state.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "label")
        counts = neigh.groupBy("node", "label").agg(F.count("*").alias("c"))
        return counts.groupBy("node").agg(
            # argmax by (count, -label): most frequent neighbor
            # label, smallest label on ties
            F.max_by(
                "label", F.struct(F.col("c"), (-F.col("label")).alias("nl"))
            ).alias("label")
        )

    for _ in range(iterations):
        labels = sweep(labels).localCheckpoint(eager=True)
    # poison probe: one more sweep; any node whose label would still
    # move yields ONE sentinel row (values constant, so limit(1) is
    # deterministic). Costs one extra join+groupBy — the price of never
    # certifying a non-converged labeling as final.
    poison = (
        sweep(labels)
        .withColumnRenamed("label", "next_label")
        .join(labels, "node")
        .filter(F.col("next_label") != F.col("label"))
        .select(
            F.lit(-1).cast("long").alias("node"),
            F.lit(-1).cast("long").alias("label"),
        )
        .limit(1)
    )
    return labels.unionByName(poison).orderBy("node")


def k_core(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core decomposition by synchronous peeling (Batagelj-Zaversnik
    family, fixed-round distributed form): repeatedly delete every
    node whose degree in the SURVIVING subgraph is < ``k``. The
    standard link-graph denoiser — spam farms and orphan pages fall
    out of the 3-core; what survives is the densely-linked body.
    Returns (node, degree) for nodes still alive after ``rounds``
    peels, with their final in-core degree.

    A fixed ``rounds`` keeps the job graph static and the operator
    oracle-checkable (the SQL oracle unrolls the same rounds —
    LPA's discipline); peeling converges geometrically on power-law
    graphs. Convergence guard (the ``dedup_clusters`` poison-round
    convention): peeling has converged iff NO surviving node's degree
    is still < k, so the final degree table doubles as the probe — if
    any violation remains, the result gains a single
    (node=-1, degree=-1) sentinel row, making an under-provisioned
    ``rounds`` break an oracle match LOUDLY instead of both engines
    agreeing on the same non-converged subgraph. The probe is free
    (the final degrees are computed anyway).

    100 TB design: per round, one map-side-combined degree count over
    surviving edges + one broadcast-friendly semi-join of edges
    against surviving nodes on EACH endpoint — all hash-partitioned
    on node id; edge state localCheckpoint-ed per round so lineage
    stays flat while the edge set shrinks monotonically."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = sym.groupBy("u").agg(F.count("*").alias("d"))
        alive = deg.filter(F.col("d") >= k).select("u")
        sym = (
            sym.join(alive, "u", "left_semi")
            .join(alive.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    final_deg = sym.groupBy("u").agg(
        F.count("*").cast("bigint").alias("degree")
    )
    poison = (
        final_deg.filter(F.col("degree") < k)
        .select(
            F.lit(-1).cast("long").alias("node"),
            F.lit(-1).cast("bigint").alias("degree"),
        )
        .limit(1)
    )
    return (
        final_deg.filter(F.col("degree") >= k)
        .select(F.col("u").alias("node"), "degree")
        .unionByName(poison)
        .orderBy("node")
    )
