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
