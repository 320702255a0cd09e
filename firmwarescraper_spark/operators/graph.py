"""Link-graph operators for crawl prioritization: PageRank over a
(src, dst) edge table, plus a deterministic synthetic link graph so the
algorithm is testable (and DuckDB-replayable) on the sandbox corpus.

Why this lives in the crawl engine: the reference spiders rank frontier
URLs by hand-written heuristics (vendor-seed depth, firmware-extension
href scoring — see operators/frontier.py priority and SURVEY §2 W5).
At 10^10-URL Common-Crawl scale the standard complement is link
authority: a few PageRank sweeps over the host- or URL-level link graph,
folded into the frontier priority so high-authority hosts are dequeued
first (the OPIC/BFS-vs-PageRank crawl-ordering literature). The operator
here is the Spark-idiomatic batch formulation: one edge table, one rank
table, each iteration a co-partitioned join + groupBy — no RDDs, no
driver-side loops over rows (the only driver work is the fixed, small
iteration count).

Scale notes (the 100 TB / 10^10-edge plan):

* ``edges`` is read once, joined to its out-degree once, and persisted
  hash-partitioned by ``src`` OUTSIDE the loop — each iteration then
  joins ranks (partitioned by the same key) without re-shuffling the
  edge table, so per-iteration cost is one shuffle of the RANK table
  (fixed-width rows: id + double) plus the groupBy(dst) exchange of the
  contribution stream. Edge bytes never move after the first partition.
* partial aggregation (map-side combine) on groupBy(dst) compresses the
  contribution stream to one row per (partition, dst) before the
  exchange — in-link skew (everyone links to the homepage) is absorbed
  map-side exactly like the salted politeness dequeue absorbs hot hosts.
* lineage: every iteration appends a join+agg to the rank plan, so a
  deep run re-analyzes an ever-growing tree; ``checkpoint_every``
  truncates with localCheckpoint — same pattern as
  plans/crawl.py compact_state (r4 verdict #4).
* dangling nodes (no out-edges) contribute only teleport mass — their
  rank is not redistributed. This matches the unrolled-SQL oracle
  semantics exactly; the mass-conserving variant adds one scalar agg per
  iteration and is deliberately not the default (document, don't hide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_hash64


def synthetic_link_edges(
    nodes: DataFrame, id_col: str = "doc_id", out_degree: int = 3
) -> DataFrame:
    """A deterministic ``(src, dst)`` link graph over the given node
    table: node ``v`` links to ``md5_60bit("edge{i}|v") % N`` for
    ``i in [0, out_degree)`` — reproducible in DuckDB verbatim
    (``('0x' || substr(md5(...), 1, 15))::BIGINT % N``), so the PageRank
    oracle replays the same graph. Requires ids contiguous ``0..N-1``
    (true for the sandbox ``documents`` table); multi-edges and
    self-loops are possible and PageRank sums them like any edge.
    Shuffle-free: one explode fused into the scan.
    """
    n = nodes.count()
    ids = F.array(*[F.lit(i) for i in range(out_degree)])
    return (
        nodes.select(F.col(id_col).alias("src"))
        .withColumn("i", F.explode(ids))
        .select(
            "src",
            F.pmod(
                _md5_hash64(
                    F.concat(
                        F.lit("edge"),
                        F.col("i").cast("string"),
                        F.lit("|"),
                        F.col("src").cast("string"),
                    )
                ),
                F.lit(n),
            ).alias("dst"),
        )
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    id_col: str = "doc_id",
    checkpoint_every: int = 0,
) -> DataFrame:
    """Fixed-iteration PageRank: returns ``(<id_col>, pagerank)`` with
    ``pagerank`` rounded to 6 decimals (cross-engine float parity; the
    compounding double error over a handful of iterations is ~1e-15,
    far below the rounding quantum).

    r_{k+1}(v) = (1-d)/N + d * sum_{(u,v) in E} r_k(u) / outdeg(u)

    The edge⋈outdeg join happens ONCE before the loop and the result is
    persisted partitioned by ``src`` — each iteration shuffles only the
    rank table onto that partitioning, then map-side-combines the
    contributions on ``dst``. ``checkpoint_every > 0`` localCheckpoints
    the rank table every K iterations so deep runs keep a bounded plan
    (crawl.py compact_state pattern).
    """
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # one shuffle each side onto src; persisted so the loop re-reads,
    # never re-shuffles, the edge bytes
    e = (
        edges.join(deg, "src")
        .repartition("src")
        .persist()
    )
    teleport = (1.0 - damping) / n
    ranks = nodes.select(
        F.col(id_col).alias("v"), F.lit(1.0 / n).alias("rank")
    )
    for k in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["v"])
            .select(F.col("dst"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.select(F.col(id_col).alias("v"))
            .join(contrib, F.col("v") == F.col("dst"), "left")
            .select(
                "v",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint_every and (k + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    # NOTE: ``e`` stays persisted — the returned plan references it once
    # per iteration, and unpersisting before the caller's action would
    # silently recompute the edge join per branch. Callers running many
    # pagerank jobs in one session can spark.catalog.clearCache().
    return ranks.select(
        F.col("v").alias(id_col), F.round(F.col("rank"), 6).alias("pagerank")
    )
