"""Corpus-curation operators for large-scale training-data pipelines:
deterministic sampling / split assignment, stratified per-source quotas,
PII scrubbing, chunk-level (paragraph) dedup, benchmark decontamination,
and data-mixture statistics.

These are the operations a 100 TB pretraining pipeline runs BETWEEN the
raw crawl (plans/crawl.py) and tokenization — the standard curation
chain published for web-text corpora (CCNet line-dedup, Gopher quality
filters in textops.py, GPT-3-appendix benchmark decontamination). Every
operator is pure DataFrame algebra (JVM-side, whole-stage codegen, no
Python in the hot path), and every hash that reaches a compared output
is md5-derived so DuckDB can replay it exactly (see operators/dedup.py
hash-design note).

Scale notes are inline per operator; the common theme: sampling and
scrubbing are shuffle-free map work that fuses into the scan; the
dedup/decontamination joins key on content hashes, never on raw text,
so only fixed-width columns move.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _md5_hash64
from .textops import normalize_text

# ---------------------------------------------------------------------------
# deterministic hash sampling / split assignment
# ---------------------------------------------------------------------------


def hash_bucket(id_col: Column, salt: str = "split", buckets: int = 10_000) -> Column:
    """Deterministic bucket in [0, buckets) from an id column: the
    md5-derived 60-bit hash of ``salt|id``. Reproducible across engines
    and runs — rerunning the pipeline on a grown corpus keeps every
    previously-sampled row in its split (the property random() sampling
    lacks, and why production pipelines key splits on content ids).
    """
    return _md5_hash64(F.concat(F.lit(f"{salt}|"), id_col.cast("string"))) % buckets


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split",
    val_bps: int = 500,
    test_bps: int = 500,
) -> DataFrame:
    """Train/val/test split assignment by deterministic hash bucket
    (basis points of 10 000): bucket < val_bps -> val, next test_bps ->
    test, rest -> train. Shuffle-free, scan-fused map work — the 100 TB
    plan is exactly the small one.
    """
    b = hash_bucket(F.col(id_col), salt)
    return df.withColumn(
        "split",
        F.when(b < val_bps, "val")
        .when(b < val_bps + test_bps, "test")
        .otherwise("train"),
    )


def sample_fraction(
    df: DataFrame, id_col: str = "doc_id", keep_bps: int = 1_000,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ~keep_bps/10000 fraction of rows by id hash.
    Unlike ``df.sample()`` this is stable across reruns, partitionings,
    and engine versions, and composable (nested samples with different
    salts are independent)."""
    return df.filter(hash_bucket(F.col(id_col), salt) < keep_bps)


def shuffle_key(id_col: Column, seed: str = "0") -> Column:
    """The deterministic shuffle key: md5 of ``seed:id``. Uniform over
    the corpus, a pure function of (seed, id) — so the induced order is
    reproducible across reruns/engines, and a new seed (e.g. the epoch
    number) is an independent permutation."""
    return F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "0",
    shards: int | None = None,
    shard_buckets: int = 64,
) -> DataFrame:
    """Deterministic global shuffle — the data-ORDERING stage between
    curation and shard writing. Training wants each epoch to see the
    corpus in (pseudo)random order, decorrelated from crawl/domain
    order; at 10^10 rows you cannot materialize a permutation index, so
    the industrial shape is: order by a seeded content hash.

    Adds ``shuffle_key`` (md5 of ``seed:id``) and ``shard`` (a coarse
    64-way key prefix bucket — the loader-facing "which file range"
    handle). Because the key is uniform, ``repartitionByRange`` on it
    (done here when ``shards`` is set, or downstream by
    ``plans.curate.write_training_shards(sort_col="shuffle_key")``)
    gets balanced partitions from sampled boundaries — a full shuffle
    but NEVER a global sort task, and no skew regardless of how skewed
    the id space is. Epoch re-shuffles are free: same job, new seed.

    Plan shape: key and shard are scan-fused column expressions; the
    only wide op is the (optional) range exchange. 100 TB = the same
    plan with more partitions."""
    key = shuffle_key(F.col(id_col), seed)
    out = df.withColumn("shuffle_key", key).withColumn(
        "shard",
        (F.conv(F.substring("shuffle_key", 1, 4), 16, 10).cast("bigint")
         % shard_buckets),
    )
    if shards:
        out = out.repartitionByRange(
            shards, F.col("shuffle_key")
        ).sortWithinPartitions("shuffle_key")
    return out


def upsample_epochs(
    df: DataFrame,
    epochs_bps: dict,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "up",
) -> DataFrame:
    """Materialize fractional source-repetition factors ("code: 2.3
    epochs, web: 0.8") — the mixture-weighting twin of
    :func:`budget_mix`. ``epochs_bps`` maps source -> epochs in BASIS
    POINTS (23_000 = 2.3 epochs) so the fractional part stays exact
    integer arithmetic: every doc gets ``bps // 10000`` full copies
    plus one more iff its deterministic id-hash bucket falls under
    ``bps % 10000`` — so a 2.3-epoch source repeats each doc 2 times
    and a stable hash-chosen 30% of docs a 3rd, giving exactly the
    target expected token multiplicity with rerun/engine-stable
    membership (the same reason splits key on id hashes, not random()).
    Sources absent from ``epochs_bps`` get 0 copies (excluded).

    Returns (id_col, source, copy) with copy in 1..n — feed
    ``copy`` into the :func:`global_shuffle` seed (e.g.
    ``md5(seed:id:copy)``) so repeated copies land far apart in the
    epoch order. Scale shape: a scan-fused map + one generator explode
    of at most ceil(epochs) rows per doc — no shuffle at all."""
    bps = F.create_map(
        *[F.lit(x) for k in sorted(epochs_bps)
          for x in (k, int(epochs_bps[k]))]
    )[F.col(source_col)]
    x = F.coalesce(bps, F.lit(0)).cast("long")
    extra = (hash_bucket(F.col(id_col), salt) < x % 10_000).cast("int")
    n = F.floor(x / 10_000).cast("int") + extra
    return (
        df.select(
            F.col(id_col), F.col(source_col).alias("source"), n.alias("_n")
        )
        .filter(F.col("_n") >= 1)
        .select(
            id_col, "source",
            F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("copy"),
        )
    )


def weighted_sample(
    df: DataFrame, weight_col: str, k: int = 100, id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weight-proportional sample of ``k`` rows
    (sequential Poisson / order sampling, Ohlsson): each row draws a
    deterministic uniform ``u`` from its id hash and the ``k`` rows with
    the smallest priority ``u / weight`` win — so inclusion probability
    is ~proportional to weight (P[u/w < t] ∝ w), but the draw is stable
    across reruns, partitionings, and engines. Returns
    ``(<id_col>, weight)``; rows with weight <= 0 are excluded (they
    have no sampling mass).

    Determinism contract: the priority is ``double(hash) / double(w)`` —
    int→double conversion and division are IEEE-exact hardware ops
    (round-to-nearest), NOT libm calls, so Spark and the DuckDB oracle
    produce bit-identical priorities and therefore the identical top-k
    (ties broken by id).

    Scale shape: no shuffle at all — the top-k is a
    TakeOrderedAndProject (per-partition partial heaps of k rows, one
    driver merge), the weighted-sampling analogue of the uniform
    ``sample_fraction``. Use this to downsample a 10^10-row corpus
    proportional to document quality/length without a sort.
    """
    from .dedup import _md5_hash64

    u = _md5_hash64(F.col(id_col).cast("string")).cast("double")
    pri = u / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .select(F.col(id_col), F.col(weight_col).alias("weight"),
                pri.alias("_pri"))
        .orderBy(F.asc("_pri"), F.asc(id_col))
        .limit(k)
        .drop("_pri")
    )


def stratified_sample(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    quota: int = 100,
    salt: str = "strat",
) -> DataFrame:
    """Per-group quota sampling: the ``quota`` rows of each group with
    the smallest deterministic id-hash — the standard way to cap a
    dominant domain in a data mixture without biasing within the domain
    (hash order is uniform; taking the smallest hashes is a uniform
    subsample that is STABLE as the group grows: a row leaves the sample
    only when displaced by a smaller hash, so incremental recrawls reuse
    almost all previously-selected rows).

    Scale shape: rank-within-group is a single hash-partitioned window
    on ``group_col``. A group is a web domain — the same skew profile as
    the crawl frontier — so the hot-domain fix is the same two-phase
    salted rank used by the politeness dequeue (operators/frontier.py):
    per-(group, salt) partial top-quota, then global top-quota over the
    (salts x quota)-bounded survivors. Used automatically past
    ``salt_buckets=1``.
    """
    h = hash_bucket(F.col(id_col), salt, buckets=1 << 60)
    w = Window.partitionBy(group_col).orderBy(F.asc("_h"), F.asc(id_col))
    return (
        df.withColumn("_h", h)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_h", "_rk")
    )


def stratified_sample_salted(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    quota: int = 100,
    salt: str = "strat",
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-phase salted variant of :func:`stratified_sample` for hot
    groups (same selection, provably: smallest-quota-by-hash commutes
    with any partition of the group — each global winner is a winner of
    its salt bucket by transitivity, mirroring the politeness-dequeue
    argument pinned by test_politeness_salt_invariance). Phase 1 ranks
    inside (group, hash-salt) buckets and keeps ``quota`` per bucket —
    the hot group's rows never funnel through one window task; phase 2
    ranks the bounded survivors (<= salt_buckets * quota per group).
    """
    h = hash_bucket(F.col(id_col), salt, buckets=1 << 60)
    df = df.withColumn("_h", h).withColumn(
        "_sb", (F.col("_h") % salt_buckets).cast("int")
    )
    w1 = Window.partitionBy(group_col, "_sb").orderBy(F.asc("_h"), F.asc(id_col))
    w2 = Window.partitionBy(group_col).orderBy(F.asc("_h"), F.asc(id_col))
    return (
        df.withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= quota)
        .withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") <= quota)
        .drop("_h", "_sb", "_rk1", "_rk")
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Order matters: SSN before phone (an SSN is also a dash-digit run the
# phone pattern would claim), email before bare-domain heuristics. Each
# pattern is RE2-safe (no backrefs/lookarounds) so DuckDB's regexp_replace
# replays it byte-identically — that is the oracle contract.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 \-]{7,}[0-9]", "<PHONE>"),
]


def scrub_pii(text: Column) -> Column:
    """Replace common PII shapes (emails, SSNs, IPv4 addresses,
    international-format phone numbers) with typed placeholder tokens.
    Pure chained regexp_replace — scan-fused, shuffle-free; the 100 TB
    cost is one codegen'd regex pass per pattern over the scan stage."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> dict:
    """Per-category match counts BEFORE scrubbing (audit/reporting
    column; counts overlap-free occurrences the same way the scrub
    replaces them — each category counted on the text with earlier
    categories already scrubbed, mirroring the replace chain)."""
    counts = {}
    cur = text
    for name, pat, token in PII_PATTERNS:
        counts[name] = F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, pat, token)
    return counts


# ---------------------------------------------------------------------------
# chunk-level dedup (CCNet-style paragraph/line dedup)
# ---------------------------------------------------------------------------


def word_chunks(text: Column, chunk_words: int = 10) -> Column:
    """Split the normalized text into consecutive ``chunk_words``-word
    chunks (last chunk may be short) — the unit of CCNet-style
    paragraph-level dedup when documents carry no layout structure.
    Pure column algebra: O(words) slices, no explode here."""
    words = F.split(normalize_text(text), " ")
    n = F.size(words)
    n_chunks = F.ceil(n / F.lit(chunk_words)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i * chunk_words + 1, chunk_words))
    )


def chunk_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
) -> DataFrame:
    """Per-document chunk-duplication profile: how many of the doc's
    word-chunks also appear (verbatim, normalized) in at least one OTHER
    document. High ``dup_chunk_frac`` = boilerplate/template pages — the
    document-granularity signal CCNet's line-dedup acts on.

    Output: (id, n_chunks, n_dup_chunks, dup_chunk_frac).

    Scale shape: raw text never leaves the scan stage — chunks hash to
    60-bit ints before the explode, so the exploded relation is two
    fixed-width columns; corpus-wide chunk frequency is a two-level hash
    aggregation on the hash (map-side partial combine); the join back to
    documents keys on (id) after a per-doc partial agg. No all-pairs
    anything; every shuffle is on fixed-width keys."""
    chunks = df.select(
        F.col(id_col),
        F.explode(word_chunks(F.col(text_col), chunk_words)).alias("_c"),
    ).select(id_col, _md5_hash64(F.col("_c")).alias("_ch"))
    # distinct (doc, chunk-hash): within-doc repeats count once toward
    # doc frequency, like CCNet's per-paragraph doc counting. Persisted:
    # it feeds both the frequency agg and the join back — uncached the
    # explode + per-chunk md5 scan would run twice.
    doc_chunks = chunks.distinct().persist()
    freq = doc_chunks.groupBy("_ch").agg(F.count("*").alias("_docs"))
    per_doc = (
        doc_chunks.join(freq, "_ch")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("_docs") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
        )
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_chunks").cast("bigint").alias("n_chunks"),
        F.col("n_dup_chunks").cast("bigint").alias("n_dup_chunks"),
        F.round(F.col("n_dup_chunks") / F.greatest(F.col("n_chunks"), F.lit(1)), 4).alias(
            "dup_chunk_frac"
        ),
    )


def chunk_dedup_apply(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
    max_df: int = 1,
) -> DataFrame:
    """The APPLY step of CCNet-style chunk/paragraph dedup
    (``chunk_dedup_stats`` is the profiling step): drop every chunk whose
    corpus document-frequency exceeds ``max_df`` (boilerplate — cookie
    banners, nav strings, templated footers) and reassemble each
    document from its surviving chunks in position order.

    Output: (id, n_chunks, n_kept, text_clean) — text_clean is '' when
    every chunk was boilerplate (the downstream length filter's job).

    Scale shape: same as the stats op — chunks hash to 60-bit ints
    in-scan, document frequency is a map-side-combinable hash
    aggregation on fixed-width keys, the df mark joins back on the
    hash; the only text-carrying wide op is the final doc-keyed regroup
    (collect surviving (pos, chunk) structs), whose width is bounded by
    the SURVIVING text — boilerplate never rides the shuffle."""
    # persisted: the chunk relation feeds the df count, the n_chunks agg
    # and the survivor regroup — three consumers that would each re-run
    # the explode + per-chunk md5 scan uncached
    chunks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(word_chunks(F.col(text_col), chunk_words)).alias("_p", "_c"),
    ).withColumn("_ch", _md5_hash64(F.col("_c"))).persist()
    freq = (
        chunks.select(id_col, "_ch").distinct()
        .groupBy("_ch").agg(F.count("*").alias("_df"))
    )
    marked = chunks.join(freq, "_ch")
    kept = marked.filter(F.col("_df") <= max_df)
    per_doc = (
        marked.groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_chunks"))
        .join(
            kept.groupBy(id_col).agg(
                F.count("*").cast("bigint").alias("n_kept"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("_p", "_c"))),
                        lambda s: s["_c"],
                    ),
                    " ",
                ).alias("text_clean"),
            ),
            id_col,
            "left",
        )
    )
    return per_doc.select(
        id_col, "n_chunks",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )


def site_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    host_col: str = "source",
    chunk_words: int = 10,
    min_host_docs: int = 3,
    boiler_frac: float = 0.5,
) -> DataFrame:
    """Per-SITE template detection and excision: a word-chunk is SITE
    BOILERPLATE when it appears in at least ``boiler_frac`` of its host's
    documents (hosts with fewer than ``min_host_docs`` docs are exempt —
    a 2-page site sharing a chunk is not evidence of a template). This is
    the host-keyed counterpart of ``chunk_dedup_apply``'s corpus-global
    document-frequency rule: nav bars, cookie banners, and footers repeat
    on ONE site at near-100% page frequency while staying globally rare
    enough to survive a global df cap — CCNet and trafilatura strip them
    per-site for exactly this reason.

    Output: (id, host, n_chunks, n_boiler, text_clean) — text_clean is
    the doc reassembled from its non-boilerplate chunks in position
    order ('' when every chunk was template).

    Scale shape: chunks hash to 60-bit ints in-scan, so the exploded
    relation shuffles fixed-width (host, hash) keys with map-side
    partial aggregation; the per-host doc-count table is |hosts| rows
    (AQE broadcasts it when it fits — it is NOT force-broadcast, since
    at 10^8 hosts it can exceed the driver); the boilerplate mark joins
    back on (host, hash), which inherently spreads even a giant host
    across its chunk space (no single-key skew); the only text-carrying
    wide op is the final doc-keyed regroup of SURVIVING chunks —
    boilerplate text never rides a shuffle."""
    # Input-parallelism floor (operators/partitioning.spread_input): the
    # chunk explode + per-chunk md5 is the CPU wall and a one-file
    # benchmark table runs it as a single task that the cache's
    # concurrent consumers then convoy behind; fires only when the
    # input's file count cannot feed every core.
    from firmwarescraper_spark.operators.partitioning import spread_input

    df = spread_input(df, id_col)
    base = df.filter(F.col(text_col).isNotNull())
    # the chunk relation feeds the df count, the boilerplate mark join
    # and the survivor regroup — three consumers that would otherwise
    # each re-run the explode + per-chunk md5 scan (the expensive part);
    # persist so it is computed once within the consuming action
    chunks = base.select(
        F.col(id_col), F.col(host_col),
        F.posexplode(word_chunks(F.col(text_col), chunk_words)).alias("_p", "_c"),
    ).withColumn("_ch", _md5_hash64(F.col("_c"))).persist()
    host_docs = base.groupBy(host_col).agg(
        F.countDistinct(id_col).alias("_hd"))
    freq = (
        chunks.select(host_col, id_col, "_ch").distinct()
        .groupBy(host_col, "_ch").agg(F.count("*").alias("_df"))
    )
    boiler = (
        freq.join(host_docs, host_col)
        .filter((F.col("_hd") >= min_host_docs)
                & (F.col("_df") >= F.col("_hd") * boiler_frac))
        .select(host_col, "_ch", F.lit(True).alias("_boiler"))
    )
    marked = chunks.join(boiler, [host_col, "_ch"], "left").withColumn(
        "_boiler", F.coalesce(F.col("_boiler"), F.lit(False)))
    kept = marked.filter(~F.col("_boiler"))
    per_doc = (
        marked.groupBy(id_col, host_col)
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("_boiler"), 1).otherwise(0))
            .cast("bigint").alias("n_boiler"),
        )
        .join(
            kept.groupBy(id_col).agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("_p", "_c"))),
                        lambda s: s["_c"],
                    ),
                    " ",
                ).alias("text_clean"),
            ),
            id_col,
            "left",
        )
    )
    return per_doc.select(
        id_col, host_col, "n_chunks", "n_boiler",
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (GPT-3 appendix-C style n-gram overlap)
# ---------------------------------------------------------------------------


def _word_ngram_hashes(text: Column, n: int) -> Column:
    """Array of md5-60bit hashes of word n-grams of the normalized text
    (documents shorter than n words contribute their whole text as one
    gram, so short benchmark items still decontaminate)."""
    words = F.split(normalize_text(text), " ")
    ln = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(ln - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    return F.transform(grams, _md5_hash64)


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
) -> DataFrame:
    """Flag training documents sharing any word ``ngram``-gram with a
    benchmark/eval set (the GPT-3 appendix-C decontamination rule; 13 in
    the paper, parameterized here). Output per training doc:
    (id, n_hits = distinct contaminated grams, contaminated).

    Scale shape: both sides shingle to 60-bit hashes inside their scan
    stages; the benchmark side (eval suites — thousands of docs, not
    billions) aggregates to a distinct-hash set that BROADCASTS, so the
    100 TB training side is scanned once with a map-side join and never
    shuffles on content. The train-side ``.distinct()`` (a doc may
    repeat a contaminated gram; the paper counts distinct grams) runs
    AFTER the broadcast join: only the contaminated (id, gram) pairs —
    tiny by construction — ever reach an exchange. (The r5 shape ran
    the distinct BEFORE the join; Catalyst cannot push a join below an
    aggregate, so the full ~n_tokens-per-doc explosion of the 100 TB
    side shuffled on every run.) The broadcast hint is size-gated on
    the benchmark row count: an eval suite that somehow outgrows the
    broadcast cap drops the hint and leaves the strategy to the
    planner/AQE instead of forcing an executor-OOM-sized build side."""
    b = (
        benchmark.select(F.explode(_word_ngram_hashes(F.col(text_col), ngram)).alias("_gh"))
        .distinct()
    )
    # hard F.broadcast overrides autoBroadcastJoinThreshold, so gate it
    # on a cheap driver-side count of the (already tiny) benchmark side
    bench_rows = benchmark.count()
    if bench_rows <= 1_000_000:  # ~1M docs x ~1k grams still < 8 GB hashes
        b = F.broadcast(b)
    t = train.select(
        F.col(id_col), F.explode(_word_ngram_hashes(F.col(text_col), ngram)).alias("_gh")
    )
    hits = t.join(b, "_gh").distinct().groupBy(id_col).agg(
        F.count("*").alias("n_hits")
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# data-mixture statistics
# ---------------------------------------------------------------------------


def domain_mix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source mixture statistics: doc count, whitespace-token volume,
    share of total tokens — the table a mixture-weighting step consumes.
    One two-level hash aggregation plus a scalar total (tiny second agg,
    broadcast back); at 100 TB the group count is the number of sources
    (small), so the reduce side is trivially bounded."""
    per = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col(text_col)), r"\s+"))).alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").alias("_tot"))
    return per.crossJoin(F.broadcast(total)).select(
        group_col,
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.col("n_tokens") / F.col("_tot"), 4).alias("token_share"),
    )


def host_profile(
    df: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    q_col: str = "q",
    lang_col: str = "lang",
    shrink_k: float = 20.0,
) -> DataFrame:
    """Per-HOST curation profile — the host-level pruning signal real
    pipelines apply before any per-document filter (spam hosts, SEO
    farms, and mis-languaged mirrors are cheaper to drop wholesale than
    doc-by-doc; CCNet routes per-domain, RefinedWeb prunes whole
    domains). Three signals per host:

    * ``q_prior`` — empirical-Bayes shrunk mean quality:
      (sum_q + k*mu) / (n + k) with mu the corpus-global mean — a
      2-doc host cannot earn an extreme prior from two lucky pages,
      while a 10^4-doc host's prior converges to its own mean.
    * ``major_lang`` / ``lang_agreement`` — majority language and the
      fraction of the host's docs agreeing with it (ties break toward
      the lexicographically GREATER language tag — a total order both
      engines share).

    Scale shape: one (host, lang)-keyed count + one host-keyed
    struct-max fold (both map-side combinable; language cardinality is
    tiny so the intermediate is ~|hosts|x|langs|), one host-keyed sum
    for quality, and ONE global scalar broadcast back — never a
    corpus-wide sort or window. Determinism: priors and agreement
    round to 6; the global mean is rounded to 6 BEFORE the shrinkage
    arithmetic so both engines fold identical inputs."""
    per_lang = df.groupBy(host_col, lang_col).agg(
        F.count("*").alias("_c"))
    major = per_lang.groupBy(host_col).agg(
        F.max(F.struct(F.col("_c"), F.col(lang_col))).alias("_m"),
        F.sum("_c").alias("n_docs"),
    )
    qsum = df.groupBy(host_col).agg(F.sum(q_col).alias("_qs"))
    mu = df.agg(F.round(F.avg(q_col), 6).alias("_mu"))
    return (
        major.join(qsum, host_col)
        .crossJoin(F.broadcast(mu))
        .select(
            host_col,
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round(
                (F.col("_qs") + F.lit(shrink_k) * F.col("_mu"))
                / (F.col("n_docs") + F.lit(shrink_k)), 6).alias("q_prior"),
            F.col("_m")[lang_col].alias("major_lang"),
            F.round(F.col("_m")["_c"] / F.col("n_docs"), 6)
            .alias("lang_agreement"),
        )
    )


# ---------------------------------------------------------------------------
# C4-style line-level cleaning (Raffel et al. 2020, §2.2 heuristics)
# ---------------------------------------------------------------------------

# Page-level kill markers from the C4 paper: "lorem ipsum" placeholder
# text and a curly brace (source code leaking into prose).
C4_PAGE_MARKERS = ("lorem ipsum", "{")


def c4_line_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning profile (the public heuristics from
    the C4/T5 paper): a line survives iff it ends in terminal
    punctuation (``. ! ? "``), has at least ``min_words`` whitespace
    words, and does not mention ``javascript``; the page survives iff it
    contains none of :data:`C4_PAGE_MARKERS` (``lorem ipsum``, ``{``)
    and keeps at least ``min_kept_lines`` lines.

    Output per doc: ``(id, n_lines, n_kept, kept_frac, page_ok,
    cleaned_fp)`` where ``cleaned_fp`` is the md5 of the kept lines
    rejoined with newlines — the fingerprint a downstream rewrite step
    would produce.

    Scale shape: pure per-row column algebra (split / transform /
    filter / rlike inside whole-stage codegen) — shuffle-free,
    scan-fused; the 100 TB plan is one codegen'd pass, identical to the
    small one. Every predicate is RE2-safe so the DuckDB oracle replays
    it byte-identically.
    """
    lines = F.transform(F.split(F.col(text_col), "\n"), F.trim)

    def _keep(line: Column) -> Column:
        return (
            line.rlike('[.!?"]$')
            & (F.size(F.split(line, r"\s+")) >= min_words)
            & ~F.lower(line).contains("javascript")
        )

    low = F.lower(F.col(text_col))
    marker_hit = None
    for m in C4_PAGE_MARKERS:
        hit = low.contains(m)
        marker_hit = hit if marker_hit is None else (marker_hit | hit)
    out = df.select(
        F.col(id_col),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.filter(lines, _keep).alias("_kept"),
        marker_hit.alias("_marker"),
    )
    return out.select(
        id_col,
        "n_lines",
        F.size("_kept").cast("bigint").alias("n_kept"),
        F.round(F.size("_kept") / F.greatest(F.col("n_lines"), F.lit(1)), 4).alias(
            "kept_frac"
        ),
        (~F.col("_marker") & (F.size("_kept") >= min_kept_lines)).alias("page_ok"),
        F.md5(F.concat_ws("\n", F.col("_kept"))).alias("cleaned_fp"),
    )


# ---------------------------------------------------------------------------
# DSIR hashed n-gram importance weights (Xie et al. 2023)
# ---------------------------------------------------------------------------


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    score each RAW-corpus document by the log importance ratio of a
    hashed-n-gram bag-of-words model fit on the TARGET distribution vs
    one fit on the raw distribution. Features are word unigrams+bigrams
    hashed into ``buckets`` buckets; both models are add-``alpha``
    smoothed multinomials over buckets; a doc's weight is the sum over
    its features of ``log p_target(b) - log p_raw(b)`` — resampling the
    raw corpus proportional to ``exp(dsir_logw)`` shifts it toward the
    target domain. Output: ``(id, n_feats, dsir_logw)``.

    Scale shape: exactly the pruned-LM scoring shape (textops.lm_score)
    — both models are ``buckets``-row aggregates (the whole point of
    feature hashing: the model size is fixed at 10^4-ish buckets no
    matter the corpus size), broadcast to executors; scoring the 100 TB
    raw side is scan + one broadcast join + one hash agg keyed on doc
    id. The target side (a quality reference corpus) is the small input
    by construction.

    Float determinism (DuckDB-oracle contract): per-bucket log-ratios
    rounded to 6, summed in document position order (fixed reduction
    order), final sum rounded to 4 — the lm_score pattern.
    """
    # Input-parallelism floor (operators/partitioning.spread_input): the
    # hashed-feature explode is the operator's CPU wall, and a
    # benchmark-sized table arriving as one parquet file runs it as ONE
    # task (measured: 3 concurrent consumers each saw a 9.6 s
    # single-task stage); the branch only fires when the input's file
    # count cannot feed every core, so the 100 TB raw side never
    # shuffles at deployment file counts.
    from firmwarescraper_spark.operators.partitioning import spread_input

    raw = spread_input(raw, id_col)
    target = spread_input(target, id_col)
    words = lambda c: F.split(normalize_text(c), " ")  # noqa: E731

    def _feats(c: Column) -> Column:
        w = words(c)
        bi = F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 2),
                lambda i: F.concat(
                    F.element_at(w, i + 1), F.lit(" "), F.element_at(w, i + 2)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(w, bi)

    def _buckets(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.posexplode(_feats(F.col(text_col))).alias("_pos", "_g"),
        ).select(id_col, "_pos", (_md5_hash64(F.col("_g")) % buckets).alias("_b"))

    tb = _buckets(target).groupBy("_b").agg(F.count("*").cast("double").alias("_ct"))
    # The raw-side feature relation feeds BOTH the raw model (bucket
    # counts) and the scoring pass. Uncached, Catalyst evaluates the
    # explode subtree twice — two full normalize + per-feature md5
    # scans of the 100 TB side, the single most expensive part of the
    # op. Persist the fixed-width (id, pos, bucket) relation so the
    # expensive scan runs once; the cache is populated and reused
    # within the one action that consumes the returned plan. (At
    # deployment scale this intermediate is what you would write to
    # storage between the two passes anyway — DSIR is inherently
    # two-pass over the raw features.)
    rb_all = _buckets(raw).persist()
    rb = rb_all.groupBy("_b").agg(F.count("*").cast("double").alias("_cr"))
    tt = tb.agg(F.coalesce(F.sum("_ct"), F.lit(0.0)).alias("_ctot"))
    rt = rb.agg(F.coalesce(F.sum("_cr"), F.lit(0.0)).alias("_rtot"))
    denom = float(alpha) * buckets
    llr = (
        tb.join(rb, "_b", "full_outer")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "_b",
            F.round(
                F.log((F.coalesce(F.col("_ct"), F.lit(0.0)) + alpha)
                      / (F.col("_ctot") + denom))
                - F.log((F.coalesce(F.col("_cr"), F.lit(0.0)) + alpha)
                        / (F.col("_rtot") + denom)),
                6,
            ).alias("_llr"),
        )
    )
    scored = (
        rb_all.join(F.broadcast(llr), "_b")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_feats"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_pos", "_llr"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_llr"],
            ).alias("_sum"),
        )
    )
    return scored.select(
        id_col, "n_feats", F.round(F.col("_sum"), 4).alias("dsir_logw")
    )


# ---------------------------------------------------------------------------
# sequence packing (distributed prefix sum)
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
) -> DataFrame:
    """Greedy sequence packing: documents are concatenated in ascending id
    order and sliced into fixed-length training sequences of ``max_tokens``
    whitespace tokens. Each doc gets its global token offset and the
    sequence coordinates a packer/tokenizer downstream needs:
    ``start_token``, ``seq_id`` (sequence containing the doc's first
    token), ``seq_offset`` (position within it), ``n_seqs`` (how many
    sequences the doc spans).

    The global running sum is the whole problem at scale: a single
    ``Window.orderBy(id)`` with no partition key collapses the corpus into
    ONE task. This implements the classic two-phase distributed prefix sum
    instead: docs land in id-range buckets (bucket b's ids all precede
    bucket b+1's, so cross-bucket order is free); phase 1 computes
    per-bucket token totals (a ``buckets``-row table — window over it is
    trivially cheap); phase 2 adds the broadcast bucket offset to a
    within-bucket cumulative window. Wide work is per-bucket, never
    global. One scalar max(id) job sizes the bucket width up front."""
    mx = df.agg(F.max(F.col(id_col)).alias("m")).first()["m"]
    width = max(1, (int(mx) + buckets) // buckets) if mx is not None else 1
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = df.select(
        F.col(id_col),
        n_tok.cast("bigint").alias("n_tokens"),
        # integer `div`, not `/`: float division of a 10^14-token offset
        # loses exactness past 2^53 and can mis-bucket boundary docs
        F.expr(f"cast({id_col} as bigint) div {width}").alias("_b"),
    )
    bucket_tot = base.groupBy("_b").agg(F.sum("n_tokens").alias("_bt"))
    w_b = (
        Window.orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_off = bucket_tot.select(
        "_b", F.coalesce(F.sum("_bt").over(w_b), F.lit(0)).alias("_boff")
    )
    w_in = (
        Window.partitionBy("_b").orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)) + F.col("_boff")
    ).alias("start_token")
    out = base.join(F.broadcast(bucket_off), "_b").select(
        id_col, "n_tokens", start
    )
    m = int(max_tokens)
    return out.select(
        id_col,
        "n_tokens",
        "start_token",
        F.expr(f"start_token div {m}").alias("seq_id"),
        F.pmod(F.col("start_token"), F.lit(m)).cast("bigint").alias("seq_offset"),
        F.expr(f"(start_token + n_tokens - 1) div {m}").alias("_last"),
    ).select(
        id_col, "n_tokens", "start_token", "seq_id", "seq_offset",
        (F.col("_last") - F.col("seq_id") + 1).cast("bigint").alias("n_seqs"),
    )


def budget_mix(
    df: DataFrame,
    budgets: dict,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mix",
    buckets: int = 64,
) -> DataFrame:
    """Materialize a token-budget mixture: for each source, keep
    documents in deterministic seeded-hash order until that source's
    token budget is met — how a pretraining mixture spec ("web: 60B
    tokens, code: 20B, ...") becomes an actual corpus. ``domain_mix``
    reports the proportions; this op ENFORCES them.

    Keep rule: a doc survives iff its source's running token total
    INCLUDING the doc is <= ``budgets[source]`` (sources absent from
    ``budgets`` get 0 — excluded). The order is (md5(salt|id), id) — so
    the selection is rerun/engine-stable, a grown corpus only ever
    APPENDS candidates at existing priorities, and a new salt draws an
    independent sample.

    The per-source running sum is the scale problem: one
    ``Window.partitionBy(source).orderBy(hash)`` makes each source a
    single task — and real mixtures have a "web" source holding 90% of
    the corpus. Same cure as :func:`pack_sequences`: the hash space
    splits into ``buckets`` ranges (hash-range order IS the priority
    order, so cross-bucket order is free), phase 1 reduces per
    (source, bucket) totals — a ``|sources| x buckets``-row table whose
    offset window is trivially cheap — and phase 2 adds the broadcast
    offset to a within-(source, bucket) cumulative window. Wide work is
    per-bucket, never per-source. Integer ``div`` keeps 10^14-token
    offsets exact. Returns (id_col, source, n_tokens, cum_tokens)."""
    from .dedup import _md5_hash64

    h = _md5_hash64(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint")
    width = max(1, (1 << 60) // buckets)
    base = df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        n_tok.alias("n_tokens"),
        h.alias("_h"),
    ).withColumn("_b", F.expr(f"_h div {width}"))
    bucket_tot = base.groupBy("source", "_b").agg(
        F.sum("n_tokens").alias("_bt")
    )
    w_b = (
        Window.partitionBy("source").orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_off = bucket_tot.select(
        "source", "_b",
        F.coalesce(F.sum("_bt").over(w_b), F.lit(0)).alias("_boff"),
    )
    w_in = (
        Window.partitionBy("source", "_b").orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    budget = F.create_map(
        *[F.lit(x) for k in sorted(budgets) for x in (k, int(budgets[k]))]
    )[F.col("source")]
    return (
        base.join(F.broadcast(bucket_off), ["source", "_b"])
        .select(
            id_col, "source", "n_tokens",
            (F.sum("n_tokens").over(w_in) + F.col("_boff"))
            .alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= F.coalesce(budget, F.lit(0)))
    )


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------


def semdedup(
    emb: DataFrame, centroids: list, threshold: float = 0.35,
    id_col: str = "vec_id", vec_col: str = "embedding",
    assign_via: str = "literal",
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al., arXiv:2303.09540):
    coarse-cluster the embeddings, then prune near-duplicate pairs ONLY
    within each cluster — the whole point of the method is that the
    pairwise cosine check runs over sum(|cluster|^2) candidates instead
    of N^2. Clusters come from the deterministic IVF coarse quantizer
    (similarity.ivf_centroids / ivf_assign — md5-seeded, so any engine
    builds the identical index).

    Keep rule: a row is DROPPED iff some lower-id row in the same
    cluster has cosine >= threshold with it ("dominated by an earlier
    representative"). The paper keeps one random member per duplicate
    group; this variant is deterministic, one-pass, and decided
    per-pair with no sequential dependency — the natural distributed
    form (and at the paper's tau ~ 0.95+ the kept sets differ only in
    which twin survives, never in how many).

    Plan shape: zero-shuffle literal-argmax assignment fused into the
    scan, then the cid-keyed prune stage (semdedup_prune — measured
    shapes in PLANS.md §4). At 100 TB: k grows with N (k ~ sqrt(N)) so
    expected cluster size stays bounded; cid is also the storage
    partition key, making the prune co-located and the per-cluster
    candidate volume the only quadratic term — bounded by the
    cluster-size cap. Returns (id_col, cid, keep)."""
    from .similarity import ivf_assign

    assigned = ivf_assign(
        emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ),
        centroids, vec_col="_v", out_col="cid", via=assign_via,
    ).persist()  # the prune reads it three times (both self-join sides
    # + the keep-flag base); the k-centroid argmax projection should run
    # once — the deployment shape persists this table bucketed anyway
    # No forced repartition here: at sandbox scale Catalyst broadcasts
    # the self-join side (measured 2x faster than a forced cid
    # shuffle); at deployment the assignment is PERSISTED bucketed by
    # cid and pruned via semdedup_prune, which is exchange-free over
    # that layout (plan-pinned).
    return semdedup_prune(
        assigned, threshold=threshold, id_col="_id", vec_col="_v",
    ).select(
        F.col("_id").alias(id_col), "cid", "keep",
    )


def semdedup_prune(
    assigned: DataFrame, threshold: float = 0.35,
    id_col: str = "vec_id", vec_col: str = "embedding",
    cid_col: str = "cid",
) -> DataFrame:
    """The cid-scoped prune stage of :func:`semdedup`, public so it can
    run directly over a PERSISTED assignment table — the deployment
    shape, where (id, vec, cid) is written once, bucketed by cid, and
    the prune (plus the IVF probe scans and the diversity window) reads
    it back co-located.

    Every wide op here keys on cid: the in-cluster self-join on
    ``cid_col``, the dropped-id dedup grouped on (cid, id) — a superset
    of cid — and the keep-flag join on (cid, id). Measured plans
    (PLANS.md §4): broadcast self-join at sandbox scale; past the
    broadcast threshold, cid-keyed SortMergeJoins whose exchanges ALL
    collapse when the input is a cid-bucketed table (pinned by
    test_semdedup_prune_bucketed_table_is_exchange_free) — the
    bucketing satisfies every clustering requirement in the chain.
    Returns (id_col, cid, keep)."""
    from .dedup import cosine_sim

    a = assigned.select(
        F.col(id_col).alias("_ida"), F.col(vec_col).alias("_va"),
        F.col(cid_col).alias("cid"))
    b = assigned.select(
        F.col(id_col).alias("_idb"), F.col(vec_col).alias("_vb"),
        F.col(cid_col).alias("cid"))
    dropped = (
        a.join(b, "cid")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(
            F.round(cosine_sim(F.col("_va"), F.col("_vb")), 4)
            >= F.lit(float(threshold)))
        .select("cid", F.col("_idb").alias("_di"), F.lit(True).alias("_dup"))
        .groupBy("cid", "_di").agg(F.first("_dup").alias("_dup"))
    )
    base = assigned.select(
        F.col(id_col), F.col(cid_col).alias("cid"))
    return (
        base
        .join(dropped,
              (base["cid"] == dropped["cid"])
              & (base[id_col] == dropped["_di"]), "left")
        .select(
            base[id_col],
            base["cid"].cast("bigint").alias("cid"),
            F.col("_dup").isNull().alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# diversity (cluster-balanced) sampling
# ---------------------------------------------------------------------------


def diversity_sample(
    emb: DataFrame, centroids: list, quota: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    salt: str = "div", salt_buckets: int = 1,
    assign_via: str = "literal",
) -> DataFrame:
    """Cluster-balanced sampling over an embedding column: cap every
    semantic cluster at ``quota`` rows — the embedding-space analogue of
    per-domain stratified sampling (and the selection step SemDeDup-style
    curation pipelines run after pruning: keep a BALANCED subset, not
    whatever mixture the crawl happened to find). Clusters come from the
    deterministic md5-seeded IVF coarse quantizer, the per-cluster pick
    is smallest-(id-hash, id) — uniform within the cluster and STABLE
    under corpus growth (a row leaves the sample only when displaced by
    a smaller hash).

    Plan shape: zero-shuffle assignment fused into the scan, then ONE
    hash-partitioned window on cid (two-phase salted for hot clusters
    via ``salt_buckets`` — identical selection, same argument as the
    politeness dequeue). At 100 TB: k ∝ N keeps windows bounded, and cid
    is the storage partition key so the window never re-shuffles data
    already bucketed by the SemDeDup/IVF stages. Returns (id_col, cid)."""
    from .similarity import ivf_assign

    assigned = ivf_assign(
        emb.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ),
        centroids, vec_col="_v", out_col="cid", via=assign_via,
    ).select(id_col, "cid")
    pick = stratified_sample_salted if salt_buckets > 1 else stratified_sample
    kwargs = {"salt_buckets": salt_buckets} if salt_buckets > 1 else {}
    out = pick(assigned, group_col="cid", id_col=id_col, quota=quota,
               salt=salt, **kwargs)
    return out.select(F.col(id_col), F.col("cid").cast("bigint").alias("cid"))
