"""Cardinality and frequency sketches: HyperLogLog distinct estimation
and a count-min sketch with heavy-hitter extraction — both deterministic
(md5-derived hashing) so a DuckDB oracle replays them bit-for-bit.

Why sketches live in a crawl engine: the partitioned Bloom seen-set
(operators/frontier.py, the north-star structure) must be SIZED — bits
per bucket is a function of the expected distinct-URL count per
partition, and at 10^10 URLs you cannot count-distinct exactly per
partition to find out (that is itself a full shuffle of the key space).
HyperLogLog gives the per-group estimate with a fixed 2^p-register
state per group and nothing but two map-side-combinable groupBys.
The count-min sketch is the frequency complement: per-host or per-token
hot-key detection (which hosts dominate the frontier → salting
candidates; which tokens dominate a corpus → stopword induction) in
O(depth × width) state regardless of corpus size.

Determinism contract (shared with operators/dedup.py): the hash is the
first 60 bits of md5 as a non-negative bigint, register index / bucket
via modulus, the HLL rho via exact INTEGER bit-length (``length(bin(w))``
— Spark's ``bin`` and DuckDB's ``bin`` both render the minimal binary
string), and the harmonic sum kept in exact integer arithmetic
(sum of ``1 << (K - rho)``) until a single final float division. The
only float-library calls are one ``ln`` per group (small-range
correction) and the final round — stable across JVM/DuckDB at 4
decimals.

Scale notes (10^10 rows):

* ``hll_register_table`` is groupBy(group, register) → max(rho): partial
  aggregation combines map-side, so the shuffle carries at most
  ``groups × 2^p`` fixed-width rows no matter the input size. The
  second groupBy folds 2^p rows per group. p=6 (64 registers, ~13%
  relative error) suits the sandbox; the 10^10-frontier config is
  p=12–14 (4k–16k registers, 1.6–0.8% error) — still KBs per group.
* ``cms_sketch`` is ``depth`` exploded copies of the token stream
  → groupBy(depth, bucket) count: again map-side combined, and the
  result is ``depth × width`` rows TOTAL — always broadcastable, which
  is the whole point: frequency estimation of any candidate set is then
  a broadcast join, never a shuffle of the corpus.
* Heavy-hitter candidates at sandbox scale are the distinct tokens
  (exact, for the oracle); at 10^10 the candidate stream is whatever
  survives a cheap pre-filter (per-partition local top-k) — the sketch
  lookup itself is unchanged.

No reference analogue (the scrapy engine never estimates cardinality);
this is the training-data-pipeline surface mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_hash64

_HASH_BITS = 60


def _hll_params(p: int):
    m = 1 << p
    k = _HASH_BITS - p + 1  # rho for w == 0 (no 1-bit in the w window)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # alpha * m^2, pre-scaled by 2^(k) because the harmonic sum is kept
    # as the exact integer sum(1 << (k - rho)) = 2^k * sum(2^-rho)
    const = alpha * m * m * float(1 << k)
    return m, k, alpha, const


def hll_register_table(
    df: DataFrame, value_col: str, group_cols: list, p: int = 6
) -> DataFrame:
    """(group..., register j, M_j = max rho) — the mergeable HLL state.

    rho(w) = leading zeros of w in its (60 - p)-bit window, plus 1:
    computed exactly as K - bit_length(w) with bit_length via
    ``length(bin(w))`` (w > 0), and K for w == 0.
    """
    m, k, _, _ = _hll_params(p)
    h = _md5_hash64(F.col(value_col).cast("string"))
    j = F.pmod(h, F.lit(m)).alias("j")
    w = F.shiftrightunsigned(h, p)
    rho = (
        F.when(w == 0, F.lit(k))
        .otherwise(F.lit(k) - F.length(F.bin(w)))
        .alias("rho")
    )
    return (
        df.select(*group_cols, j, rho)
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("mj"))
    )


def hll_estimate_from_regs(
    regs: DataFrame, group_cols: list, p: int = 6
) -> DataFrame:
    """Per-group estimate ``hll_est`` from an existing ``(group..., j,
    mj)`` register table — the merge-then-estimate half of HLL, exposed
    separately so iterative consumers (graph.hyperball_centrality merges
    register tables along edges) reuse the exact same integer harmonic
    sum and small-range correction as :func:`hll_distinct`."""
    m, k, _, const = _hll_params(p)
    agg = regs.groupBy(*group_cols).agg(
        F.expr(f"sum(shiftleft(cast(1 as bigint), {k} - mj))").alias("s_present"),
        F.count(F.lit(1)).alias("cnt"),
    )
    s_total = F.col("s_present") + (F.lit(m) - F.col("cnt")) * F.lit(1 << k).cast("long")
    v_zero = (F.lit(m) - F.col("cnt")).cast("double")
    e_raw = F.lit(const) / s_total.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero),
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 4).alias("hll_est"))


def hll_distinct(
    df: DataFrame, value_col: str, group_cols: list, p: int = 6
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate ``hll_est``
    (double, rounded to 4 decimals), Flajolet et al. with the standard
    small-range (linear-counting) correction.

    The harmonic denominator is exact integer math: present registers
    contribute ``1 << (K - M_j)``, the ``m - cnt`` absent registers
    contribute ``1 << K`` each (M_j = 0); the single float division
    ``CONST / S`` happens once per group, so Spark and the SQL oracle
    agree to the last bit before rounding.
    """
    return hll_estimate_from_regs(
        hll_register_table(df, value_col, group_cols, p), group_cols, p
    )


def hll_oracle_sql(
    table: str, value_col: str, group_cols: list, p: int = 6,
    where: str = "", group_out: str = "",
) -> str:
    """The DuckDB replay of :func:`hll_distinct` — same hash, same
    integer rho, same integer harmonic sum, same single division."""
    m, k, _, const = _hll_params(p)
    gc = ", ".join(group_cols)
    sel = group_out or gc
    return f"""
        WITH hashed AS (
            SELECT {gc},
                   ('0x' || substr(md5({value_col}::VARCHAR), 1, 15))::BIGINT AS h
            FROM {table} {where}
        ), rho AS (
            SELECT {gc}, h % {m} AS j,
                   CASE WHEN h // {m} = 0 THEN {k}
                        ELSE {k} - length(bin(h // {m})) END AS rho
            FROM hashed
        ), regs AS (
            SELECT {gc}, j, max(rho) AS mj FROM rho GROUP BY {gc}, j
        ), agg AS (
            SELECT {gc},
                   sum(1::BIGINT << ({k} - mj))::BIGINT AS s_present,
                   count(*) AS cnt
            FROM regs GROUP BY {gc}
        )
        SELECT {sel},
               round(CASE WHEN {const!r} / (s_present + ({m} - cnt) * (1::BIGINT << {k}))::DOUBLE
                               <= {2.5 * m}
                          AND ({m} - cnt) > 0
                     THEN {float(m)} * ln({float(m)} / ({m} - cnt)::DOUBLE)
                     ELSE {const!r} / (s_present + ({m} - cnt) * (1::BIGINT << {k}))::DOUBLE
                     END, 4) AS hll_est
        FROM agg
    """


def hll_estimate_sql(regs_rel: str, group_cols: list, p: int = 6) -> str:
    """``SELECT <groups>, hll_est FROM <regs_rel>`` — the DuckDB replay
    of :func:`hll_estimate_from_regs` over an existing ``(group..., j,
    mj)`` relation, for oracles that build their own register tables
    (graph.hyperball_oracle_sql merges them along edges)."""
    m, k, _, const = _hll_params(p)
    gc = ", ".join(group_cols)
    return f"""
        SELECT {gc},
               round(CASE WHEN {const!r} / (s_present + ({m} - cnt) * (1::BIGINT << {k}))::DOUBLE
                               <= {2.5 * m}
                          AND ({m} - cnt) > 0
                     THEN {float(m)} * ln({float(m)} / ({m} - cnt)::DOUBLE)
                     ELSE {const!r} / (s_present + ({m} - cnt) * (1::BIGINT << {k}))::DOUBLE
                     END, 4) AS hll_est
        FROM (SELECT {gc},
                     sum(1::BIGINT << ({k} - mj))::BIGINT AS s_present,
                     count(*) AS cnt
              FROM {regs_rel} GROUP BY {gc})
    """


def _tokens(text: Column) -> Column:
    """Lower-cased alphanumeric tokens, empties dropped — the exact
    tokenization textops._bm25_tokens uses (oracle-proven split)."""
    return F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != "")


def cms_sketch(
    df: DataFrame, text_col: str = "text", depth: int = 4, width: int = 256,
) -> DataFrame:
    """Count-min sketch of the token stream: (row i, bucket, cnt) with
    bucket_i(t) = md5_60bit("cms{i}|" + t) % width. ``depth × width``
    rows total — broadcastable at any corpus size. Token skew is
    absorbed by partial aggregation (hot tokens combine map-side)."""
    toks = df.select(F.explode(_tokens(F.col(text_col))).alias("tok"))
    rows = toks.select(
        "tok", F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i")
    )
    return (
        rows.select(
            "i",
            F.pmod(
                _md5_hash64(
                    F.concat(F.lit("cms"), F.col("i").cast("string"),
                             F.lit("|"), F.col("tok"))
                ),
                F.lit(width),
            ).alias("bucket"),
        )
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, token_col: str = "tok",
    depth: int = 4, width: int = 256,
) -> DataFrame:
    """(token, cms_est): min over the depth rows of the sketch cell the
    token hashes into. The sketch side is broadcast (≤ depth × width
    rows); the candidate stream never shuffles."""
    probes = candidates.select(
        token_col,
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i"),
    ).select(
        token_col,
        "i",
        F.pmod(
            _md5_hash64(
                F.concat(F.lit("cms"), F.col("i").cast("string"),
                         F.lit("|"), F.col(token_col))
            ),
            F.lit(width),
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy(token_col)
        .agg(F.min("cnt").alias("cms_est"))
    )


def cms_heavy_hitters(
    df: DataFrame, text_col: str = "text", k: int = 20,
    depth: int = 4, width: int = 256,
) -> DataFrame:
    """Top-k tokens by count-min estimate (ties broken by token asc):
    (tok, cms_est). Candidates here are the exact distinct tokens so
    the oracle replays verbatim; at 10^10 scale the candidate set is a
    per-partition local top-k pre-filter feeding the same sketch
    lookup. The final top-k is a TakeOrderedAndProject, not a sort."""
    sketch = cms_sketch(df, text_col, depth, width)
    cands = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("tok")).distinct()
    )
    est = cms_estimate(sketch, cands, "tok", depth, width)
    return est.orderBy(F.desc("cms_est"), F.asc("tok")).limit(k)


def cms_oracle_sql(
    table: str, text_col: str = "text", k: int = 20,
    depth: int = 4, width: int = 256, where: str = "",
) -> str:
    """DuckDB replay of :func:`cms_heavy_hitters`."""
    return f"""
        WITH toks AS (
            SELECT unnest(list_filter(
                       string_split_regex(lower({text_col}), '[^a-z0-9]+'),
                       t -> t <> '')) AS tok
            FROM {table} {where}
        ), rows AS (
            SELECT tok, unnest(range({depth})) AS i FROM toks
        ), sketch AS (
            SELECT i,
                   ('0x' || substr(md5('cms' || i || '|' || tok), 1, 15))::BIGINT
                       % {width} AS bucket,
                   count(*) AS cnt
            FROM rows GROUP BY i, bucket
        ), cands AS (
            SELECT DISTINCT tok FROM toks
        ), probes AS (
            SELECT tok, unnest(range({depth})) AS i FROM cands
        ), est AS (
            SELECT p.tok, min(s.cnt) AS cms_est
            FROM probes p
            JOIN sketch s
              ON s.i = p.i
             AND s.bucket = ('0x' || substr(md5('cms' || p.i || '|' || p.tok), 1, 15))::BIGINT
                     % {width}
            GROUP BY p.tok
        )
        SELECT tok, cms_est FROM est
        ORDER BY cms_est DESC, tok ASC LIMIT {k}
    """
