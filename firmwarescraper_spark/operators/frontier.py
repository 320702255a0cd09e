"""Frontier discipline: the URL-seen anti-join and the politeness-budgeted,
skew-defused per-host dequeue (SURVEY.md §2.3 J5, §2.7 T1, §4.2).

Scale design (10^10-URL frontier, 1000 executors):

* **Seen set** — authoritative dedup is an exact ``left_anti`` equi-join on
  ``url_hash`` (xxhash64 of the canonical URL). A Bloom filter is only a
  *prefilter*: Spark's own runtime bloom filters (InjectRuntimeFilter,
  Spark 3.3+) fire on this join automatically, and ``bloom_prefilter``
  below builds an explicit broadcast Bloom when the seen side is orders of
  magnitude larger than the frontier side. False positives never drop URLs
  because the anti-join stays authoritative (north_rule: seen-set must
  match the reference exactly).

* **Politeness dequeue** — a global per-host token budget fights
  data-parallel ranking: one hot host (download.avm.de holds >90% of the
  synthetic corpus; FIXTURES.md §1.3) would funnel its entire backlog
  through a single window task. Two-phase salted ranking fixes the skew:

    phase 1: rank within (host, salt=pmod(xxhash64(canon_url), S)) and keep
             only ``budget`` rows per salt bucket — shrinks the hot host's
             candidate set from |backlog| to S×budget rows;
    phase 2: exact global rank within host over survivors, keep ``budget``.

  This is the partial+final pattern of a map-side combine, applied to a
  rank-limit. Order key is (priority DESC, seq ASC): priority carries the
  firmware-href scoring, seq the deterministic DFS path key, so dequeue
  order is reproducible regardless of parallelism.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def anti_join_seen(frontier: DataFrame, seen: DataFrame,
                   bloom: bool = False,
                   expected_items: int = 1_000_000, fpp: float = 0.03) -> DataFrame:
    """Drop frontier rows whose ``url_hash`` is in the seen set — the
    scrapy RFPDupeFilter equivalent, placed BEFORE the fetch stage (the
    reference's key hand-optimization, SURVEY.md §4).

    With ``bloom=True`` the frontier is split by an explicit broadcast
    Bloom membership test first: definite non-members (the overwhelming
    majority of a fresh crawl's candidates) bypass the seen-check shuffle
    entirely and only the "maybe seen" rows go through the exact
    anti-join. Bloom false positives therefore cost one extra shuffled row
    each, never a dropped URL — the anti-join stays authoritative
    (north_rule: seen-set must match the reference exactly). Result parity
    with the plain path is pinned by tests/test_operators.py and the
    ``bloom_anti_join`` driver oracle."""
    if not bloom:
        return frontier.join(seen.select("url_hash"), "url_hash", "left_anti")
    flagged = bloom_prefilter(frontier, seen, expected_items, fpp)
    fresh = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybes = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    return fresh.unionByName(
        maybes.join(seen.select("url_hash"), "url_hash", "left_anti")
    )


def _bloom_geometry(expected_items: int, fpp: float) -> tuple:
    """Standard Bloom sizing: m = -n ln(p)/ln(2)^2 bits, k = m/n ln(2)."""
    import math

    m_bits = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    m_bits = (m_bits + 63) // 64 * 64
    k = max(1, round(m_bits / expected_items * math.log(2)))
    return m_bits, k


_BLOOM_MIX = 0x9E3779B97F4A7C15  # 64-bit golden-ratio odd multiplier


def build_bloom(seen: DataFrame, key: str = "url_hash",
                expected_items: int = 1_000_000, fpp: float = 0.03) -> tuple:
    """Build a Bloom bitmap over ``seen[key]`` from scratch (north_star:
    "partitioned Bloom/cuckoo-filter URL-seen set") — no driver-side
    per-row collect: each partition builds its own numpy bitmap inside one
    Arrow-batched ``mapInPandas`` pass, and the driver ORs the (one per
    partition, fixed-size) partials — the same merge shape Spark's own
    sketch aggregates use.

    Hashing: the key is already a 64-bit xxhash64 fingerprint, so the k
    probe positions come from Kirsch–Mitzenmacher double hashing
    (h1 + i*h2 mod m, h2 forced odd) — no re-hashing of the URL bytes.

    Returns (bitmap bytes, m_bits, k)."""
    import numpy as np

    m_bits, k = _bloom_geometry(expected_items, fpp)
    words = m_bits // 64

    def _partial(batches):
        bm = np.zeros(words, dtype=np.uint64)
        seen_any = False
        for pdf in batches:
            h1 = pdf[key].to_numpy(dtype=np.int64).view(np.uint64)
            h2 = (h1 * np.uint64(_BLOOM_MIX)) | np.uint64(1)
            for i in range(k):
                idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                np.bitwise_or.at(
                    bm, (idx >> np.uint64(6)).astype(np.int64),
                    np.left_shift(np.uint64(1), idx & np.uint64(63)),
                )
            seen_any = True
        if seen_any:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    partials = seen.select(key).mapInPandas(_partial, "bm binary").collect()
    out = np.zeros(words, dtype=np.uint64)
    for row in partials:
        out |= np.frombuffer(row["bm"], dtype=np.uint64)
    return out.tobytes(), m_bits, k


def bloom_prefilter(frontier: DataFrame, seen: DataFrame,
                    expected_items: int = 1_000_000, fpp: float = 0.03) -> DataFrame:
    """Tag each frontier row with ``_maybe_seen``: a broadcast Bloom
    membership test over the seen-set's ``url_hash``. Consumed by
    ``anti_join_seen(..., bloom=True)``, which anti-joins only the maybes
    and unions the definite-unseen rows back.

    Cost model: building the filter is one scan + fixed-size-per-partition
    merge over ``seen`` (~``1.44 * expected_items * log2(1/fpp)`` bits
    total). Worth it when |seen| >> |frontier-candidates| and the seen side
    exceeds the broadcast threshold — exactly the 10^10-URL steady state.
    The membership test is a vectorized Arrow-batched pandas UDF over the
    broadcast bitmap (numpy bit ops, no per-row Python)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    bm_bytes, m_bits, k = build_bloom(seen, "url_hash", expected_items, fpp)
    spark = frontier.sparkSession
    bf_b = spark.sparkContext.broadcast((bm_bytes, m_bits, k))

    @pandas_udf(BooleanType())
    def maybe_seen(hashes: pd.Series) -> pd.Series:
        raw, m, kk = bf_b.value
        bm = np.frombuffer(raw, dtype=np.uint64)
        h1 = hashes.to_numpy(dtype=np.int64).view(np.uint64)
        h2 = (h1 * np.uint64(_BLOOM_MIX)) | np.uint64(1)
        res = np.ones(len(h1), dtype=bool)
        for i in range(kk):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
            bit = np.left_shift(np.uint64(1), idx & np.uint64(63))
            res &= (bm[(idx >> np.uint64(6)).astype(np.int64)] & bit) != 0
        return pd.Series(res, index=hashes.index)

    return frontier.withColumn("_maybe_seen", maybe_seen(F.col("url_hash")))


def write_bucketed(df: DataFrame, table: str, buckets: int = 32,
                   key: str = "url_hash"):
    """Persist a state table bucketed+sorted by the join key — the layout
    that makes the frontier⋈seen anti-join (and the frontier⋈pages fetch
    join) shuffle-free PAST the broadcast threshold: co-bucketed scans feed
    a SortMergeJoin with zero Exchange and zero Sort (captured plan:
    PLANS.md §2b; pinned by tests/test_round2_fixes.py). On Iceberg the
    same property comes from a ``bucket(N, url_hash)`` partition transform
    via storage-partitioned joins; Spark's native bucketed parquet
    exercises the identical planner rule without a catalog."""
    (df.write.bucketBy(buckets, key).sortBy(key)
       .mode("overwrite").saveAsTable(table))
    return df.sparkSession.table(table)


def politeness_dequeue(
    frontier: DataFrame,
    tokens_per_host: int = 64,
    salt_buckets: int = 8,
    host_budget: DataFrame | None = None,
) -> tuple:
    """Dequeue up to ``budget`` URLs per host this round; returns
    (dequeued, deferred).

    ``host_budget`` (optional, broadcast): (host, tokens) overrides from
    robots Crawl-delay — the reference's per-domain DOWNLOAD_DELAY
    (/root/reference/firmware/spiders/asus.py:38-42) maps to a reduced
    per-round token count. Budget is deterministic (fixed tokens/round, no
    wall clock) in correctness mode — SURVEY.md §7.0.
    """
    df = frontier
    if host_budget is not None:
        df = df.join(F.broadcast(host_budget), "host", "left")
        budget = F.coalesce(F.col("tokens"), F.lit(tokens_per_host))
    else:
        budget = F.lit(tokens_per_host)
    df = df.withColumn("_budget", budget).drop("tokens")

    salt = F.pmod(F.xxhash64("canon_url"), F.lit(salt_buckets))
    w1 = Window.partitionBy("host", "_salt").orderBy(
        F.desc("priority"), F.asc("seq")
    )
    staged = df.withColumn("_salt", salt).withColumn("_r1", F.row_number().over(w1))
    survivors = staged.filter(F.col("_r1") <= F.col("_budget"))
    w2 = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("seq"))
    ranked = survivors.withColumn("_r2", F.row_number().over(w2))
    aux = ["_salt", "_r1", "_r2", "_budget"]
    dequeued = ranked.filter(F.col("_r2") <= F.col("_budget")).drop(*aux)
    # deferred = phase-1-pruned ∪ phase-2 overflow — derived by filters over
    # the same window subtrees (exchanges get reused), NOT by an extra
    # frontier⋈dequeued anti-join shuffle
    deferred = (
        staged.filter(F.col("_r1") > F.col("_budget")).drop("_salt", "_r1", "_budget")
        .unionByName(ranked.filter(F.col("_r2") > F.col("_budget")).drop(*aux))
    )
    return dequeued, deferred


def dedup_new_children(children: DataFrame, seen: DataFrame) -> DataFrame:
    """First-yielder-wins dedup of freshly extracted frontier candidates:
    drop already-seen URLs, then keep the lexicographically-smallest seq per
    url_hash (= the first yielder in pinned DFS order — matches the
    simulator's enqueue-time dupefilter, plans/simulator.py)."""
    fresh = anti_join_seen(children, seen)
    w = Window.partitionBy("url_hash").orderBy(F.asc("seq"))
    return (
        fresh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def priority_score(url_col) -> F.Column:
    """Firmware-link heuristic scoring (north_star: .bin/.img/.zip href
    scoring; reference extension predicates F4 — avm.py:39,
    linksys.py:86-87, ftp/dlink.py:92): firmware-payload-looking URLs
    outrank listing pages at dequeue."""
    return (
        F.when(url_col.rlike(r"\.(image|bin|img|zip|tar|gz|bz2)$"), F.lit(2))
        .when(url_col.rlike(r"(fritz\.os/|firmware|download)"), F.lit(1))
        .otherwise(F.lit(0))
    )
