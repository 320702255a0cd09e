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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path next to hyperplane LSH.
#
# Coarse quantizer: max-inner-product against a small centroid table (the
# FAISS IndexIVF IP-metric shape). Centroid seeding is DETERMINISTIC — the k
# rows with the smallest md5(vec_id) — so any engine (DuckDB oracle included)
# reproduces the identical index with no RNG state. Assignment is a pure
# zero-shuffle projection (a least() over k literal structs) for small k, or
# a vectorized numpy argmax via mapInPandas for large k; both paths are
# tested equal. At cluster scale `cid` is the partition/cluster key: a query
# touches only its nprobe inverted lists.
# ---------------------------------------------------------------------------


def _ip(a: Column, b: Column) -> Column:
    """Inner product as a sequential left fold — the same operation order as
    DuckDB's list_inner_product, so doubles match bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def ivf_centroids(
    emb: DataFrame, k: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> list:
    """Deterministic seed centroids: the k rows with the smallest
    md5(str(id)), ties by id; centroid ids are 0..k-1 in that order.
    Returns [(cid, [float, ...]), ...] driver-side — the centroid table is an
    index structure the size of a broadcast dim (k * dim doubles), never the
    data. At 100 TB pick k ~ sqrt(N)/1000 lists and refine on a sample
    (ivf_refine); the seed rule keeps every engine's index identical."""
    rows = (
        emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    return [(i, [float(x) for x in r["_v"]]) for i, r in enumerate(rows)]


def ivf_assign(
    emb: DataFrame, centroids: list,
    vec_col: str = "embedding", out_col: str = "cid",
    via: str = "literal",
) -> DataFrame:
    """Add the coarse-quantizer cell id: argmax inner product over the
    centroid table (ties -> lowest cid).

    via="literal": least() over k literal (−ip, cid) structs — zero shuffle,
    whole-stage-codegen, right for k <= ~64.
    via="pandas": one numpy matmul per Arrow batch (mapInPandas) — right for
    large k where k*dim literals would bloat codegen; still zero shuffle."""
    if not centroids:
        raise ValueError("ivf_assign needs a non-empty centroid table")
    if via == "literal":
        v = F.col(vec_col).cast("array<double>")
        cands = [
            F.struct(
                (-_ip(v, _literal_vec(cv))).alias("d"),
                F.lit(cid).alias("cid"),
            )
            for cid, cv in centroids
        ]
        best = cands[0] if len(cands) == 1 else F.least(*cands)
        return emb.withColumn(out_col, best["cid"])
    if via == "pandas":
        import numpy as np

        cmat = np.array([cv for _, cv in centroids], dtype=np.float64).T
        fields = emb.schema.fields
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in fields
        ) + f", {out_col} int"

        def _assign(batches):
            for pdf in batches:
                vecs = np.array(
                    [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
                )
                if len(vecs):
                    pdf[out_col] = (vecs @ cmat).argmax(axis=1).astype("int32")
                else:
                    pdf[out_col] = pdf.get(out_col, [])
                yield pdf

        return emb.mapInPandas(_assign, schema=out_schema)
    raise ValueError(f"unknown ivf_assign via={via!r}")


def ivf_topk(
    emb: DataFrame, query_vec, centroids: list,
    k: int = 10, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    assign_via: str = "literal",
) -> DataFrame:
    """IVF ANN top-k: rank centroids by inner product with the query
    (driver-side — the centroid table is already local), scan only the
    nprobe nearest inverted lists, exact cosine top-k within them. The
    filter on cid prunes before the scored projection; at scale cid is the
    partition key so unprobed lists are never read."""
    scored_c = sorted(
        centroids,
        key=lambda c: (-sum(float(x) * y for x, y in zip(query_vec, c[1])), c[0]),
    )
    probe = [cid for cid, _ in scored_c[:nprobe]]
    assigned = ivf_assign(emb, centroids, vec_col=vec_col, via=assign_via)
    return cosine_topk(
        assigned.filter(F.col("cid").isin(probe)).drop("cid"),
        query_vec, k, id_col, vec_col,
    )


def ivf_refine(
    emb: DataFrame, centroids: list, iters: int = 1,
    vec_col: str = "embedding", sample_fraction: float = 1.0,
) -> list:
    """Lloyd refinement of the seed centroids: assign (zero-shuffle
    projection) then per-dimension mean per cell. One posexplode pass +
    one (cid, dim) aggregation per iteration; rows*dim exploded records, so
    at corpus scale refine on a sample (sample_fraction) — k-means quality
    needs samples-per-centroid, not the full corpus. Empty cells keep their
    previous centroid. Deterministic given deterministic seeds."""
    cur = centroids
    base = (
        emb.sample(fraction=sample_fraction, seed=7)
        if sample_fraction < 1.0 else emb
    )
    for _ in range(iters):
        assigned = ivf_assign(base, cur, vec_col=vec_col)
        means = (
            assigned.select(
                "cid", F.posexplode(F.col(vec_col).cast("array<double>"))
                .alias("pos", "val")
            )
            .groupBy("cid", "pos").agg(F.avg("val").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
            .collect()
        )
        got = {r["cid"]: [float(x) for x in r["centroid"]] for r in means}
        cur = [(cid, got.get(cid, cv)) for cid, cv in cur]
    return cur


# ---------------------------------------------------------------------------
# PQ (product quantization) — the compression tier of the ANN stack.
#
# IVF narrows WHERE to look (nprobe inverted lists); PQ shrinks WHAT is
# scanned: a dim-double vector (512 B at dim 64) becomes m uint8 codes
# (4 B at m=4), so the candidate scan is memory-resident at corpus sizes
# where raw vectors are not — the FAISS IVF-PQ/ADC shape (Jégou et al.,
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011). All
# randomness is the same md5 seed rule as ivf_centroids, so any engine
# (the DuckDB oracle included) builds the identical codebooks.
# ---------------------------------------------------------------------------


def pq_codebooks(
    emb: DataFrame, m: int = 4, ksub: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> list:
    """Deterministic PQ codebooks: the ksub rows with the smallest
    (md5(str(id)), id) seed ALL m subspaces — codebook[j][i] is seed row
    i restricted to subspace j. Returns m lists of ksub sub-vectors
    (driver-side: m*ksub*dsub doubles — index metadata, never data).
    Refinement (per-subspace Lloyd) would reuse ivf_refine's shape; the
    seed rule alone is what the cross-engine contract needs."""
    rows = (
        emb.select(
            F.col(vec_col).cast("array<double>").alias("_v"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
            F.col(id_col).alias("_id"),
        )
        .orderBy("_h", "_id")
        .limit(ksub)
        .collect()
    )
    dim = len(rows[0]["_v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        [[float(x) for x in r["_v"][j * dsub:(j + 1) * dsub]] for r in rows]
        for j in range(m)
    ]


def _pq_sub_score(vsub: Column, c: list) -> Column:
    """Argmax objective for one codebook entry: ip(v_sub, c) − ½‖c‖² —
    the max-inner-product form of the L2 argmin (‖v−c‖² = ‖v‖² − 2·that),
    chosen because the sequential-fold inner product is the one primitive
    proven bit-equal to DuckDB's list_inner_product. ½‖c‖² is a driver
    constant (Python left-fold sum — same order as the oracle's fold).
    Rounded to 4 dp in both engines so near-ties break on the SAME side
    (ties → lowest code index)."""
    half_norm = 0.5 * _py_ip(c, c)
    return F.round(_ip(vsub, _literal_vec(c)) - F.lit(half_norm), 4)


def _py_ip(a, b) -> float:
    """Driver-side inner product with the SAME left-fold order as _ip /
    DuckDB list_inner_product — constants fed to executors must be the
    bit-identical doubles the oracle derives."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def pq_encode(
    emb: DataFrame, codebooks: list,
    id_col: str = "vec_id", vec_col: str = "embedding",
    via: str = "literal",
) -> DataFrame:
    """Quantize each vector to m small-int codes (argmax of _pq_sub_score
    per subspace, ties → lowest index). Zero shuffle on either path:

    via="literal": per subspace a least() over ksub literal (−score, i)
    structs — whole-stage codegen, right for m·ksub ≤ ~128 candidates.
    via="pandas": one numpy matmul per Arrow batch per subspace — right
    for production codebooks (m=16, ksub=256 → 4096 literals would bloat
    codegen). Both paths tested equal.

    Returns (id_col, codes array<int>). At 100 TB the codes table is the
    thing you persist (and bucket by the IVF cid): m bytes/vector."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    if via == "literal":
        v = F.col(vec_col).cast("array<double>")
        codes = []
        for j, cb in enumerate(codebooks):
            vsub = F.slice(v, j * dsub + 1, dsub)
            cands = [
                F.struct(
                    (-_pq_sub_score(vsub, c)).alias("d"),
                    F.lit(i).alias("i"),
                )
                for i, c in enumerate(cb)
            ]
            best = cands[0] if len(cands) == 1 else F.least(*cands)
            codes.append(best["i"])
        return emb.select(F.col(id_col), F.array(*codes).alias("codes"))
    if via == "pandas":
        import numpy as np

        cmats = [np.array(cb, dtype=np.float64) for cb in codebooks]
        # ½‖c‖² with the left-fold order (numpy pairwise sum differs in
        # the last ulps — the rounded score must match the literal path)
        half = [np.array([0.5 * _py_ip(c, c) for c in cb]) for cb in codebooks]
        id_name = id_col

        def _enc(batches):
            for pdf in batches:
                if not len(pdf):
                    yield pdf[[id_name]].assign(codes=None)
                    continue
                vecs = np.array(
                    [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
                )
                cols = []
                for j in range(m):
                    vsub = vecs[:, j * dsub:(j + 1) * dsub]
                    # fold-order ip: accumulate term by term like _ip
                    sc = np.zeros((len(vsub), ksub))
                    for t in range(dsub):
                        sc = sc + np.outer(vsub[:, t], cmats[j][:, t])
                    sc = np.round(sc - half[j], 4)
                    cols.append(sc.argmax(axis=1))  # first max = lowest i
                out = pdf[[id_name]].copy()
                out["codes"] = [list(map(int, row)) for row in zip(*cols)]
                yield out

        id_type = dict(
            (f.name, f.dataType.simpleString()) for f in emb.schema.fields
        )[id_col]
        return emb.mapInPandas(
            _enc, schema=f"{id_col} {id_type}, codes array<int>"
        )
    raise ValueError(f"unknown pq_encode via={via!r}")


def pq_adc_topk(
    emb: DataFrame, query_vec, codebooks: list, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    via: str = "literal", refine: int = 0,
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k: the query stays a
    full-precision vector; each corpus vector is its m PQ codes. The
    per-subspace lookup table lut[j][i] = ip(q_sub_j, c_{j,i}) is built
    DRIVER-side (m·ksub doubles), shipped as literal arrays, and the
    approximate score is a fixed-order m-term sum of element_at lookups —
    zero shuffle, then TakeOrderedAndProject. At 100 TB this runs over
    the persisted codes table inside the query's nprobe IVF lists; here
    it encodes inline so the op is self-contained.

    refine=R (R > k) adds the exact re-rank stage (FAISS refine/
    reorder): the ADC shortlist of R ids — a driver-sized set —
    broadcast-semijoins back to the raw vectors and the final top-k is
    the EXACT inner product over those R rows only. This is what
    restores within-cluster ordering that quantization flattens; the
    raw-vector fetch touches R rows, never the corpus.

    Returns (id_col, aip) — approximate inner product, descending; with
    refine, aip is the exact inner product of the surviving rows."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    luts = [
        F.array(*[
            F.lit(_py_ip(query_vec[j * dsub:(j + 1) * dsub], c))
            for c in cb
        ])
        for j, cb in enumerate(codebooks)
    ]
    codes = pq_encode(emb, codebooks, id_col, vec_col, via=via)
    score = None
    for j in range(m):
        term = F.element_at(luts[j], F.col("codes")[j] + 1)
        score = term if score is None else score + term
    scored = codes.select(F.col(id_col), F.round(score, 4).alias("aip"))
    shortlist = scored.orderBy(F.desc("aip"), F.asc(id_col)).limit(
        max(k, refine))
    if refine <= k:
        return shortlist.limit(k)
    exact = emb.join(F.broadcast(shortlist.select(id_col)), id_col).select(
        F.col(id_col),
        F.round(
            _ip(F.col(vec_col).cast("array<double>"),
                _literal_vec(query_vec)), 4).alias("aip"),
    )
    return exact.orderBy(F.desc("aip"), F.asc(id_col)).limit(k)
