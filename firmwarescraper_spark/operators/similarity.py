"""Approximate-nearest-neighbor similarity search over embedding columns.

Two tiers (SURVEY-mandated training-data ops):
  * ``cosine_topk`` — brute-force exact top-k: one scan, one shuffle for
    the global top-k (Spark's TakeOrderedAndProject). The correctness
    baseline and the right answer for small candidate sets.
  * ``lsh_bucketed_topk`` — the scale path: deterministic random-hyperplane
    LSH signatures bucket vectors; search only the query's bucket (plus
    optional multi-probe neighbors). Hyperplanes are generated from md5 of
    (plane_index, dim_index) so the signature is reproducible anywhere —
    no RNG state shipped to executors.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from firmwarescraper_spark.operators.dedup import cosine_sim


def _literal_vec(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    emb: DataFrame, query_vec, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to a literal query
    vector. Plan: scan -> project (codegen'd zip_with/aggregate) ->
    TakeOrderedAndProject (no full sort, no wide shuffle)."""
    q = _literal_vec(query_vec)
    scored = emb.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col).cast("array<double>"), q), 4).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def _hyperplane(plane: int, dim: int) -> list:
    """Deterministic pseudo-random hyperplane: component j in {-1,+1} from
    md5(plane|j) parity — reproducible in any engine/language."""
    out = []
    for j in range(dim):
        h = hashlib.md5(f"{plane}|{j}".encode()).hexdigest()
        out.append(1.0 if int(h[:2], 16) % 2 == 0 else -1.0)
    return out


def lsh_signature(vec_col: Column, dim: int, planes: int = 8) -> Column:
    """Bit i = sign(vec . hyperplane_i) packed into an int."""
    sig = None
    for p in range(planes):
        plane = _literal_vec(_hyperplane(p, dim))
        dot = F.aggregate(
            F.zip_with(vec_col.cast("array<double>"), plane, lambda x, y: x * y),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        term = F.when(dot >= 0, F.lit(2 ** p)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sig.cast("int")


def lsh_bucketed_topk(
    emb: DataFrame, query_vec, k: int = 10, planes: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: score only vectors whose LSH signature is within
    ``multiprobe_hamming`` bits of the query's signature. Recall/latency
    trade-off is (planes, multiprobe); at cluster scale the signature is a
    partition key so a query touches a handful of partitions."""
    import itertools

    dim = len(query_vec)
    qsig_bits = _hyperplane_sig(query_vec, dim, planes)
    probe_sigs = {qsig_bits}
    for r in range(1, multiprobe_hamming + 1):
        for bits in itertools.combinations(range(planes), r):
            flip = 0
            for b in bits:
                flip |= 1 << b
            probe_sigs.add(qsig_bits ^ flip)
    sig = lsh_signature(F.col(vec_col), dim, planes)
    bucketed = emb.withColumn("_sig", sig).filter(
        F.col("_sig").isin(list(probe_sigs))
    )
    return cosine_topk(bucketed, query_vec, k, id_col, vec_col)


def _hyperplane_sig(vec, dim: int, planes: int) -> int:
    sig = 0
    for p in range(planes):
        plane = _hyperplane(p, dim)
        dot = sum(float(x) * y for x, y in zip(vec, plane))
        if dot >= 0:
            sig |= 1 << p
    return sig
