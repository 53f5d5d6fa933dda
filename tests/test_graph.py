"""pagerank_int: all-integer PageRank vs an unbounded-int Python replay."""

from __future__ import annotations


def _pagerank_ref(edges, iterations=3, scale=10**12, num=85, den=100):
    from collections import defaultdict

    e = sorted(set(edges))
    deg = defaultdict(int)
    for s, _ in e:
        deg[s] += 1
    r = {n: scale for n in deg}
    base = ((den - num) * scale) // den
    for _ in range(iterations):
        inflow = defaultdict(int)
        for s, d in e:
            inflow[d] += r[s] // deg[s]
        r = {n: base + (num * inflow.get(n, 0)) // den for n in deg}
    return r


def test_pagerank_int_matches_python_replay(spark):
    import random

    rng = random.Random(3)
    raw = [(rng.randrange(30), rng.randrange(30)) for _ in range(200)]
    edges = [(f"n{a}", f"n{b}") for a, b in raw if a != b]
    # symmetrize: the documented no-dangling form
    edges = edges + [(b, a) for a, b in edges]
    from moisturizer_spark.operators.graph import pagerank_int

    df = spark.createDataFrame(edges, "src string, dst string")
    for bcast in (False, True):
        got = {
            r["node"]: r["rank_scaled"]
            for r in pagerank_int(df, broadcast_ranks=bcast).collect()
        }
        assert got == _pagerank_ref(edges), f"broadcast_ranks={bcast}"


def test_pagerank_int_dangling_nodes_documented_out(spark):
    """Directed edges with a pure-sink node: the sink has no outgoing
    edge, so it is absent from the output (the documented contract);
    sources still rank."""
    from moisturizer_spark.operators.graph import pagerank_int

    df = spark.createDataFrame(
        [("a", "sink"), ("b", "sink"), ("a", "b")], "src string, dst string"
    )
    got = {r["node"] for r in pagerank_int(df).collect()}
    assert got == {"a", "b"}


def test_bfs_levels_matches_python_replay(spark):
    import random
    from collections import deque

    rng = random.Random(9)
    edges = list({(f"n{rng.randrange(40)}", f"n{rng.randrange(40)}")
                  for _ in range(120)})
    seeds = ["n0", "n1"]

    def ref():
        adj = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
        lvl = {s: 0 for s in seeds}
        q = deque(seeds)
        while q:
            n = q.popleft()
            if lvl[n] >= 3:
                continue
            for m in adj.get(n, []):
                if m not in lvl:
                    lvl[m] = lvl[n] + 1
                    q.append(m)
        return lvl

    from moisturizer_spark.operators.graph import bfs_levels

    e = spark.createDataFrame(edges, "src string, dst string")
    sd = spark.createDataFrame([(s,) for s in seeds], "node string")
    got = {r["node"]: r["hops"] for r in bfs_levels(e, sd).collect()}
    assert got == ref()
