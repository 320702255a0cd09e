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
                   expected_items: int | None = None, fpp: float = 0.03,
                   buckets: int = 64, probe: str = "auto") -> DataFrame:
    """Drop frontier rows whose ``url_hash`` is in the seen set — the
    scrapy RFPDupeFilter equivalent, placed BEFORE the fetch stage (the
    reference's key hand-optimization, SURVEY.md §4).

    With ``bloom=True`` the frontier is split by a partitioned-Bloom
    membership test first: definite non-members (the overwhelming
    majority of a fresh crawl's candidates) bypass the seen-check shuffle
    entirely and only the "maybe seen" rows go through the exact
    anti-join. Bloom false positives therefore cost one extra shuffled row
    each, never a dropped URL — the anti-join stays authoritative
    (north_rule: seen-set must match the reference exactly). Result parity
    with the plain path is pinned by tests/test_operators.py and the
    ``bloom_anti_join`` driver oracle."""
    if not bloom:
        return frontier.join(seen.select("url_hash"), "url_hash", "left_anti")
    flagged = bloom_prefilter(frontier, seen, expected_items, fpp,
                              buckets=buckets, probe=probe)
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


def _bloom_set_bits(bm, h1_i64, m_bits: int, k: int):
    """Set the k Kirsch–Mitzenmacher probe bits for each 64-bit key in
    ``h1_i64`` (int64 ndarray) into bitmap ``bm`` (uint64 ndarray)."""
    import numpy as np

    h1 = h1_i64.view(np.uint64)
    h2 = (h1 * np.uint64(_BLOOM_MIX)) | np.uint64(1)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(
            bm, (idx >> np.uint64(6)).astype(np.int64),
            np.left_shift(np.uint64(1), idx & np.uint64(63)),
        )


def _bloom_test_bits(bm, h1_i64, m_bits: int, k: int):
    """Vectorized membership test; returns a bool ndarray."""
    import numpy as np

    h1 = h1_i64.view(np.uint64)
    h2 = (h1 * np.uint64(_BLOOM_MIX)) | np.uint64(1)
    res = np.ones(len(h1), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        bit = np.left_shift(np.uint64(1), idx & np.uint64(63))
        res &= (bm[(idx >> np.uint64(6)).astype(np.int64)] & bit) != 0
    return res


def build_bloom_buckets(seen: DataFrame, key: str = "url_hash",
                        buckets: int = 64,
                        expected_items: int | None = None,
                        fpp: float = 0.03):
    """Build a PARTITIONED Bloom filter over ``seen[key]`` (north_star:
    "partitioned Bloom/cuckoo-filter URL-seen set"): the key space is
    bucketed by ``pmod(key, buckets)`` and each bucket gets its own
    independent bitmap, built completely inside one ``applyInPandas`` task
    — no driver-side merge at all, and no single structure that has to fit
    one node. At 10^10 keys / fpp=0.03 (~7.3 bits/key ≈ 9 GB total),
    buckets=4096 keeps every bitmap ≈ 2.2 MB: broadcastable per-bucket,
    shippable as ordinary rows, and rebuildable per-bucket on change.

    Sizing: ``expected_items=None`` sizes from a ``seen.count()`` (ADVICE
    r2: a fixed 1M default silently degrades fpp toward 1 as the seen set
    grows). Keys are already 64-bit xxhash64 fingerprints, so per-bucket
    occupancy is uniform (n/buckets) and probe positions come from
    Kirsch–Mitzenmacher double hashing — no re-hashing of URL bytes.

    Returns (bitmaps DataFrame ``(bucket int, bm binary)``, m_bits, k)
    where m_bits/k are the per-bucket geometry."""
    import math

    import numpy as np

    n = seen.count() if expected_items is None else expected_items
    per_bucket = max(64, math.ceil(max(n, 1) / buckets))
    m_bits, k = _bloom_geometry(per_bucket, fpp)
    words = m_bits // 64

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(words, dtype=np.uint64)
        _bloom_set_bits(bm, pdf[key].to_numpy(dtype=np.int64), m_bits, k)
        return pd.DataFrame(
            {"bucket": [int(pdf["_bucket"].iloc[0])], "bm": [bm.tobytes()]}
        )

    bitmaps = (
        seen.select(key)
        .withColumn("_bucket", F.pmod(F.col(key), F.lit(buckets)).cast("int"))
        .groupBy("_bucket")
        .applyInPandas(_build, "bucket int, bm binary")
    )
    return bitmaps, m_bits, k


def merge_bloom_buckets(bitmaps: DataFrame, new_seen: DataFrame,
                        m_bits: int, k: int, key: str = "url_hash",
                        buckets: int = 64) -> DataFrame:
    """Incremental filter maintenance (the 10^10-URL steady state): OR the
    new keys' probe bits into the existing per-bucket bitmaps instead of
    rebuilding the whole filter. Implemented as a full-outer cogroup on
    bucket — a bucket with no new keys passes through untouched, a bucket
    with no prior bitmap starts from zeros, and only the touched buckets'
    fixed-size bitmaps move. Bit-OR is associative/idempotent, so
    ``merge(build(A), B) == build(A ∪ B)`` byte-for-byte at equal geometry
    (pinned by tests/test_round3_fixes.py).

    ``m_bits``/``k`` must be the geometry the bitmaps were built with
    (returned by build_bloom_buckets)."""
    import numpy as np

    words = m_bits // 64

    def _merge(bm_pdf: pd.DataFrame, keys_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(bm_pdf):
            bm = np.frombuffer(bm_pdf["bm"].iloc[0], dtype=np.uint64).copy()
            bucket = int(bm_pdf["bucket"].iloc[0])
        else:
            bm = np.zeros(words, dtype=np.uint64)
            bucket = int(keys_pdf["_bucket"].iloc[0])
        if len(keys_pdf):
            _bloom_set_bits(
                bm, keys_pdf[key].to_numpy(dtype=np.int64), m_bits, k)
        return pd.DataFrame({"bucket": [bucket], "bm": [bm.tobytes()]})

    tagged = new_seen.select(key).withColumn(
        "_bucket", F.pmod(F.col(key), F.lit(buckets)).cast("int")
    )
    return (
        bitmaps.groupBy("bucket")
        .cogroup(tagged.groupBy("_bucket"))
        .applyInPandas(_merge, "bucket int, bm binary")
    )


# total-bitmap-bytes ceiling for the broadcast probe path; past it the
# cogroup path keeps every bitmap executor-side
_BLOOM_BROADCAST_CAP = 64 << 20


def bloom_prefilter(frontier: DataFrame, seen: DataFrame,
                    expected_items: int | None = None, fpp: float = 0.03,
                    buckets: int = 64, probe: str = "auto") -> DataFrame:
    """Tag each frontier row with ``_maybe_seen``: a membership test
    against the partitioned Bloom filter of the seen-set's ``url_hash``.
    Consumed by ``anti_join_seen(..., bloom=True)``, which anti-joins only
    the maybes and unions the definite-unseen rows back.

    Two probe strategies (``probe="auto"`` picks by total bitmap size):

    * ``"broadcast"`` — collect the (fixed-size, per-bucket) bitmaps into
      a dict and broadcast; the test is a vectorized pandas UDF indexing
      its bucket's bitmap per batch. No shuffle of the frontier. Right
      while the whole filter fits comfortably in executor memory.
    * ``"cogroup"`` — group BOTH sides by bucket and probe inside
      ``cogroup(...).applyInPandas``: each task sees one bucket's frontier
      rows plus that one bucket's bitmap row. The driver never
      materializes a single bitmap; total filter size is unbounded by any
      one node. Costs one hash-partition of the frontier by bucket — the
      10^10-key path.

    Either way, false positives cost one extra shuffled row in the exact
    anti-join, never a dropped URL."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    bitmaps, m_bits, k = build_bloom_buckets(
        seen, "url_hash", buckets, expected_items, fpp)
    total_bytes = buckets * (m_bits // 8)
    if probe == "auto":
        probe = "broadcast" if total_bytes <= _BLOOM_BROADCAST_CAP else "cogroup"

    bucket_col = F.pmod(F.col("url_hash"), F.lit(buckets)).cast("int")

    if probe == "broadcast":
        bm_by_bucket = {r["bucket"]: r["bm"] for r in bitmaps.collect()}
        spark = frontier.sparkSession
        bf_b = spark.sparkContext.broadcast((bm_by_bucket, m_bits, k, buckets))

        @pandas_udf(T.BooleanType())
        def maybe_seen(hashes: pd.Series) -> pd.Series:
            table, m, kk, nb = bf_b.value
            h1 = hashes.to_numpy(dtype=np.int64)
            bkt = np.mod(h1, np.int64(nb))  # numpy % == floored == pmod
            res = np.zeros(len(h1), dtype=bool)
            for b in np.unique(bkt):
                raw = table.get(int(b))
                if raw is None:  # bucket empty in seen => definitely unseen
                    continue
                sel = bkt == b
                bm = np.frombuffer(raw, dtype=np.uint64)
                res[sel] = _bloom_test_bits(bm, h1[sel], m, kk)
            return pd.Series(res, index=hashes.index)

        return frontier.withColumn("_maybe_seen", maybe_seen(F.col("url_hash")))

    # cogroup path: one bucket's frontier rows + that bucket's single
    # bitmap row per task; nothing ever sits on the driver
    tagged = frontier.withColumn("_bucket", bucket_col)
    out_schema = T.StructType(
        list(tagged.schema.fields) + [T.StructField("_maybe_seen", T.BooleanType())]
    )

    def _probe(fr_pdf: pd.DataFrame, bm_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(fr_pdf) == 0:
            return fr_pdf.assign(_maybe_seen=pd.Series([], dtype=bool))
        if len(bm_pdf) == 0:
            res = np.zeros(len(fr_pdf), dtype=bool)
        else:
            bm = np.frombuffer(bm_pdf["bm"].iloc[0], dtype=np.uint64)
            res = _bloom_test_bits(
                bm, fr_pdf["url_hash"].to_numpy(dtype=np.int64), m_bits, k)
        return fr_pdf.assign(_maybe_seen=res)

    return (
        tagged.groupBy("_bucket")
        .cogroup(bitmaps.groupBy("bucket"))
        .applyInPandas(_probe, out_schema)
        .drop("_bucket")
    )


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


# Budgets at or above this are "unlimited": the per-host rank-limit can
# never bind (no real round backlogs 10^9 URLs on ONE host), so those
# hosts bypass the rank windows entirely. Without this, an
# unlimited-budget round (the steady-state drain shape) would still push
# every hot-host row through one phase-2 window task — measured ~8 s of
# near-serial work per round at the 102k-page bench corpus.
UNLIMITED_TOKENS = 10 ** 9


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

    Hosts whose effective budget is >= ``UNLIMITED_TOKENS`` skip the rank
    windows (every row dequeues; rank-limit provably cannot bind), so an
    effectively-unbudgeted round costs zero window work.
    """
    df = frontier
    if host_budget is not None:
        df = df.join(F.broadcast(host_budget), "host", "left")
        budget = F.coalesce(F.col("tokens"), F.lit(tokens_per_host))
    else:
        budget = F.lit(tokens_per_host)
    df = df.withColumn("_budget", budget).drop("tokens")

    free = df.filter(F.col("_budget") >= UNLIMITED_TOKENS).drop("_budget")
    capped = df.filter(F.col("_budget") < UNLIMITED_TOKENS)

    salt = F.pmod(F.xxhash64("canon_url"), F.lit(salt_buckets))
    w1 = Window.partitionBy("host", "_salt").orderBy(
        F.desc("priority"), F.asc("seq")
    )
    staged = capped.withColumn("_salt", salt).withColumn(
        "_r1", F.row_number().over(w1))
    survivors = staged.filter(F.col("_r1") <= F.col("_budget"))
    # phase-2 (exact per-host rank) funnels each host through ONE window
    # task, so run it ONLY for hosts where it can actually bind: a
    # parallel count decides, and the common case (survivors <= budget:
    # the whole backlog dequeues) bypasses the sort entirely. The hot
    # host still pays it when contended, but on a bounded input
    # (<= salt_buckets * budget rows, phase 1's guarantee).
    cnts = survivors.groupBy("host").agg(F.count("*").alias("_cnt"))
    survivors = survivors.join(cnts, "host")
    aux = ["_salt", "_r1", "_r2", "_budget", "_cnt"]
    easy = survivors.filter(F.col("_cnt") <= F.col("_budget")).drop(
        "_salt", "_r1", "_budget", "_cnt")
    hard = survivors.filter(F.col("_cnt") > F.col("_budget"))
    w2 = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("seq"))
    ranked = hard.withColumn("_r2", F.row_number().over(w2))
    dequeued = free.unionByName(easy).unionByName(
        ranked.filter(F.col("_r2") <= F.col("_budget")).drop(*aux)
    )
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
