"""Graph analytics over DataFrame edge lists.

Connected components already live in ``operators/dedup.py``
(large-star/small-star for dedup clustering); this module holds the
rank/centrality side. Everything is expressed as joins + aggregations
so Catalyst plans the physical strategy; iteration unrolls into the
plan (bounded, explicit) rather than driver-side collect loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_int(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """ALL-INTEGER PageRank — the det-kmeans determinism recipe applied
    to the iterative-graph family: ranks live on a fixed integer grid
    (``scale`` = initial rank), per-edge contributions are truncating
    integer division ``rank DIV out_degree``, and the update is
    ``r' = base + (num·Σcontrib) DIV den`` with
    ``base = ((den−num)·scale) DIV den`` (the two terms truncate
    SEPARATELY — the oracle and the Python replay mirror exactly this
    form) — every operation
    is exact int64 arithmetic, so the result is independent of
    partitioning, engine, and float-summation order, and an oracle can
    replay each unrolled iteration bit-for-bit (the BPE/FFD pattern).
    The truncation bias per step is < out_degree ulps on a 1e-12 grid —
    far below any ranking-relevant difference.

    ``edges`` must be the DIRECTED edge list the walk follows;
    symmetrize first (union both directions) for an undirected walk —
    which also removes dangling nodes by construction. Nodes appear in
    the output iff they have at least one outgoing edge (dangling
    handling is the caller's modeling decision, stated rather than
    hidden).

    Overflow: ``damping_num·Σcontrib ≤ 85·n_nodes·scale`` must stay
    inside int64 — exact below ~10^5 nodes at the default 1e12 grid;
    lower ``scale`` for bigger graphs (the ranking is scale-invariant:
    1e9 covers ~10^8 nodes), mirroring the importance-resample bound
    note.

    Scale plan: the (edge, out-degree) frame is PERSISTED once — every
    iteration joins it. With ``broadcast_ranks=True`` the node-grain
    rank frame broadcasts into that join, so each round costs ONE
    shuffle (the contribution aggregate) and the big edge list never
    re-shuffles — right whenever the node dimension fits a broadcast
    (up to ~10^7 nodes). The default shuffles ranks instead —
    unbounded node counts, two shuffles per round; pre-partition edges
    by ``src`` on a cluster so the rank join co-locates."""
    from moisturizer_spark.operators.common import materialize

    e0 = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).distinct()
    deg = e0.groupBy("_src").agg(
        F.count(F.lit(1)).cast("bigint").alias("_deg")
    )
    e = materialize(e0.join(deg, "_src"))
    # the node set is STATIC (deg's keys): left-joining contributions
    # back against it each round keeps zero-inflow nodes alive without
    # referencing the evolving rank frame twice. Each round's ranks
    # are materialized — without the boundary the lineage doubles per
    # iteration (the broadcast side AND the keep-alive side both
    # re-derive the previous round) and the plan grows exponentially.
    nodes = materialize(deg.select(F.col("_src").alias("_node")))
    ranks = nodes.select(
        "_node", F.lit(scale).cast("bigint").alias("_r")
    )
    base = ((damping_den - damping_num) * scale) // damping_den
    for _ in range(iterations):
        r_side = ranks.withColumnRenamed("_node", "_src")
        if broadcast_ranks:
            r_side = F.broadcast(r_side)
        contrib = (
            e.join(r_side, "_src")
            .select(
                F.col("_dst").alias("_node"),
                F.expr("_r div _deg").alias("_c"),
            )
            .groupBy("_node")
            .agg(F.sum("_c").alias("_sum"))
        )
        ranks = materialize(
            nodes.join(contrib, "_node", "left")
            .select(
                "_node",
                (
                    F.lit(base)
                    + F.expr(
                        f"(CAST({damping_num} AS BIGINT) * "
                        f"coalesce(_sum, CAST(0 AS BIGINT))) "
                        f"div CAST({damping_den} AS BIGINT)"
                    )
                ).cast("bigint").alias("_r"),
            )
        )
    return ranks.select(
        F.col("_node").alias("node"), F.col("_r").alias("rank_scaled")
    )


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_degrees: bool = False,
) -> DataFrame:
    """Exact triangle enumeration over an undirected graph — the motif
    primitive behind clustering coefficients, cohesion scoring, and
    community quality. Input edges may carry either direction and
    duplicates; self-loops drop. Returns one row per triangle as
    ``(node_a, node_b, node_c)`` with ``node_a < node_b < node_c`` —
    a set, so the result is engine- and partitioning-independent and
    an oracle enumerates it with plain id-ordered joins.

    Scale: enumeration uses DEGREE ORIENTATION (Suri & Vassilvitskii
    2011, "Counting triangles and the curse of the last reducer"):
    each undirected edge orients from its (degree, id)-smaller to its
    (degree, id)-larger endpoint, making the graph a DAG whose
    max out-degree is O(sqrt(m)) — so the wedge join's fan-out is
    bounded at Σ outdeg² ≤ m·sqrt(2m) instead of the Σ deg² blow-up a
    skewed hub would cause under naive id-ordering. Each triangle
    x≺y≺z appears exactly once as the path x→y→z closed by x→z; the
    output re-canonicalizes to id order, so the orientation is purely
    a physical strategy. The oriented edge list persists once and
    feeds all three join legs; joins are equi-key (never a nested
    loop). ``broadcast_degrees=True`` broadcasts the node-grain degree
    frame into the orientation join (the ``pagerank_int
    broadcast_ranks`` contract: right whenever the node dimension fits
    a broadcast, up to ~10^7 nodes; the default shuffles instead for
    unbounded node counts)."""
    from moisturizer_spark.operators.common import materialize

    a = F.least(F.col(src_col), F.col(dst_col))
    b = F.greatest(F.col(src_col), F.col(dst_col))
    und = materialize(
        edges.select(a.alias("_a"), b.alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
    )
    deg = (
        und.select(F.col("_a").alias("_n"))
        .unionAll(und.select(F.col("_b").alias("_n")))
        .groupBy("_n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_d"))
    )
    if broadcast_degrees:
        deg = F.broadcast(deg)
    e = und.join(
        deg.select(F.col("_n").alias("_a"), F.col("_d").alias("_da")), "_a"
    ).join(
        deg.select(F.col("_n").alias("_b"), F.col("_d").alias("_db")), "_b"
    )
    lo_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("_a") < F.col("_b"))
    )
    oriented = materialize(
        e.select(
            F.when(lo_first, F.col("_a")).otherwise(F.col("_b")).alias("_u"),
            F.when(lo_first, F.col("_b")).otherwise(F.col("_a")).alias("_v"),
        )
    )
    e1 = oriented.select(
        F.col("_u").alias("_x"), F.col("_v").alias("_y")
    )
    e2 = oriented.select(
        F.col("_u").alias("_y"), F.col("_v").alias("_z")
    )
    e3 = oriented.select(
        F.col("_u").alias("_x"), F.col("_v").alias("_z")
    )
    tri = e1.join(e2, "_y").join(e3, ["_x", "_z"])
    arr = F.array_sort(F.array("_x", "_y", "_z"))
    return tri.select(
        arr[0].alias("node_a"), arr[1].alias("node_b"), arr[2].alias("node_c")
    )


def lpa_communities(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    broadcast_labels: bool = False,
) -> DataFrame:
    """Deterministic SYNCHRONOUS label propagation (Raghavan et al.
    2007) — community detection as bounded unrolled iteration, the
    pagerank/BFS discipline applied to the clustering family. Every
    node starts labeled with its own id; each round it adopts the most
    frequent label among its NEIGHBORS (self-vote excluded), breaking
    count ties by the SMALLEST label — a total order, so the result is
    partitioning- and engine-independent and an oracle replays each
    round as a CTE with ``ROW_NUMBER() OVER (ORDER BY count DESC,
    label)``. Classic sync-LPA label oscillation is possible on
    bipartite-ish structure — ``iterations`` is a hard bound by design
    (the BFS argument: unbounded convergence is a driver loop), and
    the returned labels are exactly the round-``iterations`` state.

    Input edges are symmetrized and de-duplicated here; isolated nodes
    (no edges) don't appear. Returns ``(node, community)``.

    Scale: the symmetrized edge list persists once; each round is one
    equi-join (labels onto edge sources) + two aggregations keyed on
    the destination node — the (node, label) count and the per-node
    argmax, which fold map-side. The per-round argmax uses
    ``min(struct(-count, label))`` so no second shuffle for a window.
    Each round's labels materialize — the pagerank lineage-doubling
    lesson. ``broadcast_labels=True`` broadcasts the node-grain label
    frame into each round's edge join (the ``pagerank_int
    broadcast_ranks`` contract — one shuffle saved per round while the
    node dimension fits a broadcast, up to ~10^7 nodes)."""
    from moisturizer_spark.operators.common import materialize

    sym = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).unionAll(
        edges.select(
            F.col(dst_col).alias("_src"), F.col(src_col).alias("_dst")
        )
    )
    e = materialize(sym.filter(F.col("_src") != F.col("_dst")).distinct())
    labels = materialize(
        e.select(F.col("_src").alias("_node"))
        .distinct()
        .withColumn("_lab", F.col("_node"))
    )
    for _ in range(iterations):
        l_side = labels.select(F.col("_node").alias("_src"), F.col("_lab"))
        if broadcast_labels:
            l_side = F.broadcast(l_side)
        cnt = (
            e.join(
                l_side,
                "_src",
            )
            .groupBy("_dst", "_lab")
            .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
        )
        labels = materialize(
            cnt.groupBy("_dst")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("_c")).alias("_negc"),
                        F.col("_lab").alias("_l"),
                    )
                ).alias("_m")
            )
            .select(
                F.col("_dst").alias("_node"), F.col("_m._l").alias("_lab")
            )
        )
    return labels.select(
        F.col("_node").alias("node"), F.col("_lab").alias("community")
    )


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    max_hops: int = 3,
) -> DataFrame:
    """K-hop breadth-first reach: for every node reachable from the
    seed set within ``max_hops`` directed edges, the MINIMUM hop count
    (seeds are level 0). The frontier-expansion loop unrolls into the
    plan (bounded, explicit — the pagerank/BPE iteration pattern), and
    every step is a join + min-aggregate over integer levels, so the
    result is exact, engine-independent, and oracle-replayable as a
    CTE chain.

    Scale: the edge list persists once; each hop joins the CURRENT
    frontier (not the full visited set) against it and anti-minimizes
    into the visited frame — per-hop cost tracks frontier size, the
    textbook distributed BFS shape. Levels are a node-grain frame.
    ``max_hops`` is a hard bound by design: unbounded BFS on a 100 TB
    graph is a driver-convergence loop; pipelines want "within k hops"
    anyway (fraud rings, supply reach, contamination spread)."""
    from moisturizer_spark.operators.common import materialize

    e = materialize(
        edges.select(
            F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
        ).distinct()
    )
    visited = materialize(
        seeds.select(F.col(seed_col).alias("_node"))
        .distinct()
        .withColumn("_level", F.lit(0))
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(
                frontier.withColumnRenamed("_node", "_src").select("_src"),
                "_src",
            )
            .select(F.col("_dst").alias("_node"))
            .distinct()
            .join(visited.select("_node"), "_node", "left_anti")
            .withColumn("_level", F.lit(hop))
        )
        frontier = materialize(nxt)
        visited = materialize(visited.unionByName(frontier))
    return visited.select(
        F.col("_node").alias("node"), F.col("_level").alias("hops")
    )


def hits_bipartite(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 2,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a DIRECTED edge
    list, in the all-integer discipline of :func:`pagerank_int` — the
    mutual-reinforcement ranking PageRank cannot express (a hub is good
    because it points at good authorities, and vice versa; on the
    customer→supplier trade graph: breadth-weighted buyers vs
    demand-weighted suppliers). Classic HITS L2-normalizes each round —
    a float op; instead the UNNORMALIZED power iteration runs a FIXED
    number of rounds on exact DECIMAL(38,0) sums (rankings are
    normalization-invariant), so the result is partitioning- and
    engine-exact and an oracle unrolls it as CTE chains.

    One round = ``a ← Σ_in h`` then ``h ← Σ_out a``; hubs start at 1.
    Growth bounds the round count instead of a convergence loop (the
    BFS argument): scores grow like ``(d_src·d_dst)^rounds`` — at the
    default 2 rounds, exact below ~10^9 nodes of degree ~10^4
    (max ≈ 10^26 ≪ 10^38); raise ``rounds`` only with the headroom
    arithmetic redone. Returns ``(node, role, score)`` with role
    'hub' (source side) / 'authority' (destination side), scores as
    DECIMAL(38,0).

    Scale: each half-round is one equi-join of the persisted edge list
    against a node-grain score frame plus one map-combinable sum; score
    frames materialize per half-round (the pagerank lineage lesson)."""
    from moisturizer_spark.operators.common import materialize

    d38 = "decimal(38,0)"
    e = materialize(
        edges.select(
            F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
        ).distinct()
    )
    h = materialize(
        e.select("_s").distinct().withColumn("_h", F.lit(1).cast(d38))
    )
    a = None
    for _ in range(rounds):
        a = materialize(
            e.join(h, "_s")
            .groupBy("_d")
            .agg(F.sum("_h").cast(d38).alias("_a"))
        )
        h = materialize(
            e.join(a, "_d")
            .groupBy("_s")
            .agg(F.sum("_a").cast(d38).alias("_h"))
        )
    hubs = h.select(
        F.col("_s").alias("node"),
        F.lit("hub").alias("role"),
        F.col("_h").alias("score"),
    )
    auths = a.select(
        F.col("_d").alias("node"),
        F.lit("authority").alias("role"),
        F.col("_a").alias("score"),
    )
    return hubs.unionByName(auths)
