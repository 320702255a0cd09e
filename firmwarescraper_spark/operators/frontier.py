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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def anti_join_seen(frontier: DataFrame, seen: DataFrame) -> DataFrame:
    """Drop frontier rows whose ``url_hash`` is in the seen set — the
    scrapy RFPDupeFilter equivalent, placed BEFORE the fetch stage (the
    reference's key hand-optimization, SURVEY.md §4)."""
    return frontier.join(seen.select("url_hash"), "url_hash", "left_anti")


def bloom_prefilter(frontier: DataFrame, seen: DataFrame,
                    expected_items: int = 1_000_000, fpp: float = 0.03) -> DataFrame:
    """Optional explicit Bloom prefilter before the authoritative anti-join:
    cheap broadcast-side membership test that lets most never-seen URLs skip
    the shuffle. Composes as: bloom_prefilter(...) |> anti_join_seen(...).

    The filter REMOVES only definite non-members from the *seen-check*
    shuffle; rows flagged as "maybe seen" still go through the exact
    anti-join, so false positives cannot drop URLs."""
    bf = seen.stat.bloomFilter("url_hash", expected_items, fpp)
    spark = frontier.sparkSession
    bf_b = spark.sparkContext.broadcast(bf)

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType
    import pandas as pd

    @pandas_udf(BooleanType())
    def maybe_seen(hashes: pd.Series) -> pd.Series:
        f = bf_b.value
        return hashes.map(lambda h: f.mightContain(int(h)))

    return frontier.withColumn("_maybe_seen", maybe_seen(F.col("url_hash")))


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
