"""PageRank operator tests (operators/graph.py): closed-form checks on
tiny graphs, numpy power-iteration parity on the synthetic md5 graph,
and checkpoint-invariance (checkpoint_every must not change values)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from firmwarescraper_spark.operators import graph as G


def _nodes(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def _ranks(df):
    return {r["doc_id"]: r["pagerank"] for r in df.collect()}


def test_two_node_cycle_is_uniform(spark):
    nodes = _nodes(spark, 2)
    edges = spark.createDataFrame([(0, 1), (1, 0)], ["src", "dst"])
    out = _ranks(G.pagerank(nodes, edges, iterations=5))
    assert out == {0: 0.5, 1: 0.5}


def test_sink_authority_exceeds_spokes(spark):
    # star: every spoke links to the hub, hub links back to spoke 1
    nodes = _nodes(spark, 4)
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (0, 1)], ["src", "dst"]
    )
    # the 0<->1 cycle oscillates before convergence, so compare at a
    # depth where the 0.85^k transient is dead
    out = _ranks(G.pagerank(nodes, edges, iterations=40, checkpoint_every=10))
    assert out[0] > out[1] > out[2] == out[3]


def test_dangling_mass_is_teleport_only(spark):
    # node 1 has no out-edges: its rank is not redistributed, so total
    # mass drops below 1 — the documented (oracle-matching) semantics
    nodes = _nodes(spark, 2)
    edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
    out = _ranks(G.pagerank(nodes, edges, iterations=3))
    assert sum(out.values()) < 1.0
    assert out[1] > out[0]


def test_matches_numpy_power_iteration(spark):
    n, d, iters = 60, 0.85, 4
    nodes = _nodes(spark, n)
    edges = G.synthetic_link_edges(nodes, out_degree=3)
    got = _ranks(G.pagerank(nodes, edges, iterations=iters, damping=d))

    el = [(r["src"], r["dst"]) for r in edges.collect()]
    assert len(el) == 3 * n and all(0 <= v < n for _, v in el)
    outdeg = np.zeros(n)
    for u, _ in el:
        outdeg[u] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        for u, v in el:
            nxt[v] += d * r[u] / outdeg[u]
        r = nxt
    for i in range(n):
        assert got[i] == pytest.approx(round(r[i], 6), abs=1.5e-6)


def test_checkpoint_every_is_value_invariant(spark):
    nodes = _nodes(spark, 40)
    edges = G.synthetic_link_edges(nodes, out_degree=3)
    plain = _ranks(G.pagerank(nodes, edges, iterations=6))
    ckpt = _ranks(G.pagerank(nodes, edges, iterations=6, checkpoint_every=2))
    assert plain == ckpt


def _harmonic(df):
    return {r["doc_id"]: r["harmonic"] for r in df.collect()}


def test_hyperball_star_hub(spark):
    # 3 spokes -> hub: harmonic(hub) ~ 3 at one hop, spokes unreachable
    nodes = _nodes(spark, 4)
    edges = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], ["src", "dst"])
    out = _harmonic(G.hyperball_centrality(nodes, edges, max_t=2))
    assert abs(out[0] - 3.0) < 0.2   # HLL small-range is near-exact here
    assert out[1] == out[2] == out[3] == 0.0


def test_hyperball_chain_distance_weighting(spark):
    # 0 -> 1 -> 2: harmonic(2) ~ 1/1 + 1/2, harmonic(1) ~ 1, harmonic(0) = 0
    nodes = _nodes(spark, 3)
    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    out = _harmonic(G.hyperball_centrality(nodes, edges, max_t=2))
    assert abs(out[2] - 1.5) < 0.1
    assert abs(out[1] - 1.0) < 0.1
    assert out[0] == 0.0


def test_hyperball_checkpoint_invariance(spark):
    nodes = _nodes(spark, 50)
    edges = G.synthetic_link_edges(nodes, out_degree=2)
    plain = _harmonic(G.hyperball_centrality(nodes, edges, max_t=3))
    ckpt = _harmonic(
        G.hyperball_centrality(nodes, edges, max_t=3, checkpoint_every=1)
    )
    assert plain == ckpt


def test_hyperball_register_state_is_bounded(spark):
    # the sketch table can never exceed 2^p rows per node, however
    # dense the graph — the property that makes HyperBall feasible at
    # 10^10 nodes (the exact ball would be |V| rows per node here)
    from firmwarescraper_spark.operators.sketches import hll_register_table

    n, p = 40, 6
    nodes = _nodes(spark, n)
    # complete-ish digraph: every node links to every other
    edges = (
        nodes.select(F.col("doc_id").alias("src"))
        .crossJoin(nodes.select(F.col("doc_id").alias("dst")))
        .filter("src != dst")
    )
    regs = hll_register_table(
        nodes.select(F.col("doc_id").alias("v"),
                     F.col("doc_id").alias("_val")),
        "_val", ["v"], p)
    shipped = edges.join(regs.withColumnRenamed("v", "src"), on="src") \
        .select(F.col("dst").alias("v"), "j", "mj")
    merged = regs.unionByName(shipped).groupBy("v", "j") \
        .agg(F.max("mj").alias("mj"))
    per_node = merged.groupBy("v").count().agg(F.max("count")).collect()[0][0]
    assert per_node <= (1 << p)


# ---------------------------------------------------------------------------
# redirect-chain resolution (pointer doubling)
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _resolved(df):
    return {
        r["doc_id"]: (r["final_id"], r["hops"], r["resolved"])
        for r in df.collect()
    }


def test_resolve_redirects_chain(spark):
    # 0 -> 1 -> 2 (terminal); 3 is standalone
    out = _resolved(
        G.resolve_redirects(_nodes(spark, 4), _edges(spark, [(0, 1), (1, 2)]))
    )
    assert out[0] == (2, 2, True)
    assert out[1] == (2, 1, True)
    assert out[2] == (2, 0, True)
    assert out[3] == (3, 0, True)


def test_resolve_redirects_flags_cycle(spark):
    # 0 -> 1 -> 0 is a redirect loop; 2 -> 1 enters it
    out = _resolved(
        G.resolve_redirects(
            _nodes(spark, 3), _edges(spark, [(0, 1), (1, 0), (2, 1)])
        )
    )
    assert out[0][2] is False and out[1][2] is False and out[2][2] is False
    # the standalone terminal semantics stay exact alongside the cycle
    out4 = _resolved(
        G.resolve_redirects(
            _nodes(spark, 4), _edges(spark, [(0, 1), (1, 0), (3, 2)])
        )
    )
    assert out4[3] == (2, 1, True) and out4[2] == (2, 0, True)


def test_resolve_redirects_edge_outside_node_table(spark):
    # a redirect target missing from the node table is terminal by
    # definition (coalesce keeps it, resolved stays true)
    out = _resolved(
        G.resolve_redirects(_nodes(spark, 2), _edges(spark, [(1, 99)]))
    )
    assert out[1] == (99, 1, True)


def test_resolve_redirects_doubling_horizon(spark):
    # a 12-hop chain (the synthetic bound) resolves at rounds=4 (2^4=16)
    # but NOT at rounds=3 (2^3=8) — the horizon is real, not padding
    chain = [(i, i + 1) for i in range(12)]
    nodes = _nodes(spark, 13)
    ok = _resolved(G.resolve_redirects(nodes, _edges(spark, chain), rounds=4))
    assert ok[0] == (12, 12, True)
    short = _resolved(
        G.resolve_redirects(nodes, _edges(spark, chain), rounds=3)
    )
    assert short[0][2] is False


def test_synthetic_redirects_acyclic_and_bounded(spark):
    nodes = _nodes(spark, 200)
    edges = G.synthetic_redirect_edges(nodes).collect()
    n = len(edges)
    assert n > 10  # the md5 condition actually fires
    for e in edges:
        assert e["dst"] > e["src"]          # strictly forward => acyclic
        assert e["dst"] <= e["src"] + 5
        assert e["src"] % 16 < 12           # block-window construction
    out = G.resolve_redirects(nodes, G.synthetic_redirect_edges(nodes))
    rows = out.collect()
    assert all(r["resolved"] for r in rows)
    assert max(r["hops"] for r in rows) <= 12
