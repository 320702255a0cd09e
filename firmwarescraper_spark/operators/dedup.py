"""Deduplication operators for web-scale training-data pipelines:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Hash design: every hash used in a *compared output* is derived from md5,
which Spark and DuckDB compute identically — so the driver's DuckDB oracle
can reproduce MinHash/SimHash values bit-for-bit (the correctness gate is
a value-hash comparison, not a rows-only check). xxhash64 (faster, Spark
built-in) is used only for engine-internal keys that never cross engines.

Scale notes:
  * MinHash signatures: one explode per (doc, shingle) then a single hash
    aggregation — shuffle keyed by doc_id, partial aggregation map-side.
  * LSH bucketing turns the quadratic all-pairs problem into equi-joins on
    band keys; candidate pairs per bucket are bounded by bucket size.
  * n-gram Jaccard join prunes n-grams with document frequency > df_cap —
    the standard stop-shingle trick that keeps the self-join from
    exploding on boilerplate at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from firmwarescraper_spark.operators.textops import normalize_text

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per identical normalized text (deterministic
    survivor). Hash-groupBy on the md5 fingerprint — never shuffles the
    full text."""
    key = F.md5(normalize_text(F.col(text_col))).alias("fp")
    return (
        df.select(F.col(id_col), key)
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
    )


def dup_spans(
    df: DataFrame, L: int = 8, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplicate spans (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    formulation, re-expressed over hashed windows): every OVERLAPPING
    L-token window of the normalized text is hashed; a window whose
    exact token sequence occurs in >= 2 distinct documents marks its
    token range, and overlapping-or-adjacent marked ranges merge into
    maximal removable spans. This is the surgical complement to
    doc-level dedup: boilerplate/license/quote blocks get excised while
    the host document survives. Cross-doc semantics (doc-frequency,
    like chunk_dedup_stats) — a phrase repeated only WITHIN one doc is
    repetition (textops.repetition_signals), not duplication.

    Returns one row per document that has at least one duplicated span:
    (id_col, spans "s-e;s-e" token-index string, n_spans,
    n_dup_tokens, n_tokens, dup_frac).

    Scale shape: the window explode is ~n_tokens rows/doc — the
    method's inherent cost — but each row is a fixed-width
    (id, pos, 60-bit hash) triple; text never shuffles, and the explode
    (normalize + per-window md5, the expensive scan) runs EXACTLY ONCE:
    one hash-keyed aggregation gathers each hash's occurrence list AND
    its distinct-doc count in the same pass (both map-side combinable),
    the >=2-doc filter drops singleton hashes — the overwhelming
    majority — before their occurrence lists ever re-explode, and the
    survivors regroup by doc. (The previous shape evaluated the explode
    subtree twice — once for the doc-frequency reduce, once for the
    mark-back semi-join — plus a third shuffle for the join itself;
    plan now: 2 Exchanges, both on fixed-width keys. A hash shared by
    many docs concentrates its occurrence list on one reducer, but that
    is the same key-skew exposure the semi-join had; rows are 16-byte
    structs.) Span merging is a per-doc JVM ``F.aggregate`` fold over
    the sorted positions — the gaps-and-islands rule ``break iff
    pos - prev > L`` — so no per-row Python anywhere."""
    # Input-parallelism floor (operators/partitioning.spread_input): the
    # window scan is the operator's CPU wall, and a benchmark-sized
    # table arriving as ONE parquet file would run it on one core
    # (measured: an 11 s single-task stage at local[32]); when — and
    # only when — the input's file count cannot feed every core, the
    # docs are first hash-spread by id. At deployment file counts the
    # branch never fires, so text still never shuffles at scale.
    from firmwarescraper_spark.operators.partitioning import spread_input

    df = spread_input(df, id_col)
    words = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(words)
    wins = F.when(
        n >= L,
        F.transform(
            F.sequence(F.lit(0), n - L),
            lambda i: _md5_hash64(F.concat_ws(" ", F.slice(words, i + 1, L))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    base = df.select(
        F.col(id_col), n.cast("bigint").alias("n_tokens"),
        F.posexplode(wins).alias("pos", "h"),
    )
    marked = (
        base.groupBy("h")
        .agg(
            F.count_distinct(F.col(id_col)).alias("ndocs"),
            F.collect_list(
                F.struct(F.col(id_col), F.col("n_tokens"), F.col("pos"))
            ).alias("occ"),
        )
        .filter(F.col("ndocs") >= 2)
        .select(F.explode("occ").alias("o"))
    )
    per = (
        marked.groupBy(
            F.col(f"o.{id_col}").alias(id_col),
            F.col("o.n_tokens").alias("n_tokens"),
        )
        .agg(F.sort_array(F.collect_list("o.pos")).alias("ps"))
    )
    close = lambda st: F.concat(
        st["acc"],
        F.array(F.struct(st["cs"].alias("s"), (st["cp"] + L - 1).alias("e"))),
    )
    init = F.struct(
        F.array().cast("array<struct<s:int,e:int>>").alias("acc"),
        F.lit(-1).alias("cs"), F.lit(-1).alias("cp"),
    )

    def step(st, p):
        brk = (st["cs"] == -1) | (p - st["cp"] > L)
        closed = F.when(st["cs"] == -1, st["acc"]).otherwise(close(st))
        return F.struct(
            F.when(brk, closed).otherwise(st["acc"]).alias("acc"),
            F.when(brk, p).otherwise(st["cs"]).alias("cs"),
            p.alias("cp"),
        )

    spans = F.aggregate(
        F.col("ps"), init, step,
        lambda st: F.when(st["cs"] == -1, st["acc"]).otherwise(close(st)),
    )
    return (
        per.select(id_col, "n_tokens", spans.alias("_sp"))
        .select(
            id_col,
            F.array_join(
                F.transform(
                    "_sp", lambda s: F.concat_ws("-", s["s"], s["e"])
                ),
                ";",
            ).alias("spans"),
            F.size("_sp").alias("n_spans"),
            F.aggregate(
                "_sp", F.lit(0), lambda a, s: a + (s["e"] - s["s"] + 1)
            ).cast("bigint").alias("n_dup_tokens"),
            "n_tokens",
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("n_dup_tokens") / F.col("n_tokens"), 6),
        )
    )


def excise_spans(
    df: DataFrame, spans_df: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", out_col: str = "clean_text",
) -> DataFrame:
    """Apply :func:`dup_spans` output: remove the marked token ranges
    from each document's normalized text and rejoin the survivors —
    the excision step that actually shrinks the corpus. Docs with no
    span row pass through with their normalized text intact (left
    join), so the operator composes as a plain pipeline stage.

    Pure column algebra: the spans string re-parses to ranges, a
    filter-by-index transform drops covered tokens, and the broadcast
    side is the spans table (id -> short string), never text. Adds
    ``out_col`` plus ``n_removed_tokens``."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    sp = spans_df.select(
        F.col(id_col), F.col("spans").alias("_spans"),
        F.col("n_dup_tokens").alias("n_removed_tokens"),
    )
    ranges = F.transform(
        F.split(F.col("_spans"), ";"),
        lambda r: F.struct(
            F.split(r, "-")[0].cast("int").alias("s"),
            F.split(r, "-")[1].cast("int").alias("e"),
        ),
    )
    covered = lambda i: F.exists(
        ranges, lambda rg: (i >= rg["s"]) & (i <= rg["e"])
    )
    kept = F.filter(
        F.zip_with(
            words,
            F.sequence(F.lit(0), F.size(words) - 1),
            lambda w, i: F.struct(w.alias("w"), i.alias("i")),
        ),
        lambda t: ~covered(t["i"]),
    )
    return (
        df.join(sp, id_col, "left")
        .withColumn(
            out_col,
            F.when(
                F.col("_spans").isNull(), normalize_text(F.col(text_col))
            ).otherwise(
                F.array_join(
                    F.transform(kept, lambda t: t["w"]), " "
                )
            ),
        )
        .withColumn(
            "n_removed_tokens",
            F.coalesce(F.col("n_removed_tokens"), F.lit(0)).cast("bigint"),
        )
        .drop("_spans")
    )


def dup_spans_oracle_sql(
    L: int = 8, table: str = "documents", text_col: str = "text",
    id_col: str = "doc_id", where: str = "",
) -> str:
    """DuckDB replay of :func:`dup_spans`: zipped unnests for the
    window explode, HAVING count(DISTINCT doc) >= 2 for the
    doc-frequency mark, and the classic lag/sum gaps-and-islands for
    the span merge (break iff pos - prev > L — identical to the fold)."""
    toks = (
        f"string_split(trim(regexp_replace(lower({text_col}),"
        "'\\s+',' ','g')),' ')"
    )
    h = "('0x' || substr(md5(array_to_string(toks[i+1:i+" + str(L) + \
        "],' ')),1,15))::BIGINT"
    return f"""
        WITH t AS (
            SELECT {id_col}, {toks} AS toks FROM {table} {where}
        ), w AS (
            SELECT {id_col}, len(toks)::BIGINT AS n_tokens,
                   unnest(range(0, greatest(len(toks) - {L} + 1, 0)))
                       AS pos,
                   unnest(list_transform(
                       range(0, greatest(len(toks) - {L} + 1, 0)),
                       i -> {h})) AS h
            FROM t
        ), d AS (
            SELECT h FROM w GROUP BY h
            HAVING count(DISTINCT {id_col}) >= 2
        ), m AS (
            SELECT * FROM w WHERE h IN (SELECT h FROM d)
        ), i AS (
            SELECT {id_col}, n_tokens, pos,
                   CASE WHEN pos - lag(pos) OVER (
                            PARTITION BY {id_col} ORDER BY pos) <= {L}
                        THEN 0 ELSE 1 END AS brk
            FROM m
        ), g AS (
            SELECT *, sum(brk) OVER (
                PARTITION BY {id_col} ORDER BY pos
                ROWS UNBOUNDED PRECEDING) AS island
            FROM i
        ), s AS (
            SELECT {id_col}, n_tokens, min(pos) AS s,
                   max(pos) + {L} - 1 AS e
            FROM g GROUP BY {id_col}, n_tokens, island
        )
        SELECT {id_col},
               string_agg(s::VARCHAR || '-' || e::VARCHAR, ';'
                          ORDER BY s) AS spans,
               count(*)::INT AS n_spans,
               sum(e - s + 1)::BIGINT AS n_dup_tokens,
               n_tokens,
               round(sum(e - s + 1)::DOUBLE / n_tokens, 6) AS dup_frac
        FROM s GROUP BY {id_col}, n_tokens
    """


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _md5_hash64(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint — computable
    identically in DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text."""
    words = F.split(normalize_text(text), " ")
    cnt = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 8, shingle_n: int = 3,
) -> DataFrame:
    """(id, sig_0..sig_{k-1}): sig_i = min over shingles of
    md5-hash64(i || '|' || shingle)."""
    shingled = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("sh")
    )
    aggs = [
        F.min(_md5_hash64(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return shingled.groupBy(id_col).agg(*aggs)


def minhash_band_keys(
    sigs: DataFrame, id_col: str = "doc_id",
    num_hashes: int = 8, bands: int = 4,
) -> DataFrame:
    """Stack a signature table into (id, band_key) rows — band b's key is
    'b_sig..sig' over its rows_per_band = num_hashes/bands signature
    slots. This is the LSH INDEX layout: stored bucketed/partitioned by
    band_key, an incremental job's index side is a bucketed scan with no
    exchange (the frontier-state pattern, PLANS.md §2b)."""
    rows_per_band = num_hashes // bands
    band_cols = [
        F.concat_ws(
            "_", F.lit(b),
            *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)],
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select(id_col, *band_cols)
    return banded.select(
        id_col,
        F.explode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias("band_key"),
    )


def minhash_lsh_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 8, bands: int = 4, shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) that agree on at least
    one LSH band (rows_per_band = num_hashes / bands). Equi-join on the
    band key — no quadratic blow-up."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    # both self-join sides read the band keys; persist so the shingle
    # explode + k-way min aggregation runs once
    stacked = minhash_band_keys(sigs, id_col, num_hashes, bands).persist()
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def incremental_lsh_pairs(
    index_sigs: DataFrame, new_docs: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 8, bands: int = 4, shingle_n: int = 3,
) -> DataFrame:
    """Near-dup candidates for a NEW crawl shard against a stored
    signature INDEX — the daily-increment shape at 100 TB: old-old pairs
    are never re-formed and old text is never re-shingled (the index IS
    the signature table ``minhash_signatures`` wrote when each old shard
    arrived; append the new shard's signatures after this job).

    ``index_sigs``: (id, sig_0..sig_{k-1}) for the accumulated corpus.
    ``new_docs``: raw (id, text) for the increment. Id spaces must be
    disjoint (the crawl's url_hash key is).

    Output: (id_new, id_other, vs) where vs='index' for new-vs-corpus
    matches (id_other is the index doc) and vs='new' for within-shard
    matches (id_new < id_other). Pair volume is banded-equi-join bounded
    exactly like minhash_lsh_pairs — never all-pairs, and never
    index x index.

    Scale shape: the index's (id, band_key) layout is stored bucketed by
    band_key, so the vs-index join plans as a bucketed scan with NO
    exchange on the (10^10-row) index side; only the shard-sized new
    side shuffles. The within-shard self-join touches shard-sized data
    only."""
    new_sigs = minhash_signatures(new_docs, text_col, id_col, num_hashes,
                                  shingle_n)
    idx_keys = minhash_band_keys(index_sigs, id_col, num_hashes, bands)
    # the new shard's band keys feed the vs-index join and both sides of
    # the within-shard self-join; persist so the shard is shingled once
    new_keys = minhash_band_keys(new_sigs, id_col, num_hashes,
                                 bands).persist()
    a, b = new_keys.alias("a"), idx_keys.alias("b")
    vs_index = (
        a.join(b, F.col("a.band_key") == F.col("b.band_key"))
        .select(F.col(f"a.{id_col}").alias("id_new"),
                F.col(f"b.{id_col}").alias("id_other"),
                F.lit("index").alias("vs"))
    )
    n1, n2 = new_keys.alias("n1"), new_keys.alias("n2")
    vs_new = (
        n1.join(n2, (F.col("n1.band_key") == F.col("n2.band_key"))
                & (F.col(f"n1.{id_col}") < F.col(f"n2.{id_col}")))
        .select(F.col(f"n1.{id_col}").alias("id_new"),
                F.col(f"n2.{id_col}").alias("id_other"),
                F.lit("new").alias("vs"))
    )
    return vs_index.unionByName(vs_new).distinct()


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: each node gets
    ``component`` = the minimum node id reachable from it. This is the step
    that turns LSH candidate PAIRS into dedup GROUPS (keep the row where
    id == component, drop the rest).

    Algorithm: min-label propagation with pointer jumping — per round,
    label(u) := min(label(u), min over neighbors of their labels), then
    compress label(u) := label(label(u)). Pointer jumping makes convergence
    O(log diameter) rounds instead of O(diameter), the property that matters
    at 10^10 nodes (cf. Kiveris et al., "Connected Components in MapReduce
    and Beyond" — same doubling idea as their star operations). Each round
    is two shuffles on node id; labels are localCheckpoint'ed per round so
    lineage stays flat over the iteration (same discipline as the crawl
    loop's state tables). Near-dup graphs converge in 2-4 rounds in
    practice: cluster diameters are tiny.

    Driver-side work per round is one count (the convergence check) — no
    collect of node data.
    """
    # persisted: every propagation round joins the edge table against the
    # current labels — uncached, each round re-derived the whole upstream
    # candidate-pair pipeline (LSH banding etc.) from scratch
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .unionByName(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("id")).distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iters):
            nbr_min = (
                edges.join(labels, edges["v"] == labels["id"])
                .groupBy("u").agg(F.min("component").alias("nmin"))
            )
            # persisted per round: prop feeds both sides of the pointer
            # jump — uncached, the neighbor-min aggregation ran twice
            prop = (
                labels.join(nbr_min, labels["id"] == nbr_min["u"], "left")
                .select(
                    "id",
                    F.least(F.col("component"),
                            F.coalesce("nmin", "component"))
                    .alias("component"),
                )
                .persist()
            )
            ptr = prop.select(
                F.col("id").alias("pid"), F.col("component").alias("pcomp")
            )
            jumped = (
                prop.join(ptr, prop["component"] == ptr["pid"], "left")
                .select(
                    "id", F.coalesce("pcomp", "component").alias("component")
                )
                .localCheckpoint(eager=True)
            )
            prop.unpersist()  # jumped is materialized; round cache done
            changed = (
                jumped.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels = jumped
            if changed == 0:
                break
    finally:
        # the returned labels are checkpoint-materialized — they no
        # longer reference the edge cache
        edges.unpersist()
    return labels


def neardup_components(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
) -> DataFrame:
    """Every row of ``df`` labeled with its near-dup component (min id in
    the component; singletons label themselves). ``component == id`` marks
    the canonical survivor — filtering on that IS the dedup."""
    cc = connected_components(pairs).withColumnRenamed("id", id_col)
    # no forced broadcast: the component table is nodes-that-had-a-pair and
    # can be arbitrarily large on a dirty corpus — let AQE pick the strategy
    return (
        df.select(id_col)
        .join(cc, id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
    )


def dedup_keep_best(
    df: DataFrame, pairs: DataFrame, score_col: str, id_col: str = "doc_id",
) -> DataFrame:
    """Cluster-representative dedup (the FineWeb/DCLM keep rule): label
    near-dup components, keep the HIGHEST-``score_col`` document per
    component (ties -> lowest id), instead of neardup_components' min-id
    survivor. One row per component: (id, component, score, n_members).

    The argmax is a single struct-max aggregation — (score, -id) structs
    compare lexicographically, so no window/sort over the corpus and the
    per-component reduction combines map-side. At 100 TB this is the
    same shuffle as the component labeling itself (component-keyed,
    fixed-width)."""
    comp = neardup_components(df, pairs, id_col)
    j = comp.join(df.select(id_col, score_col), id_col)
    best = j.groupBy("component").agg(
        F.max(
            F.struct(F.col(score_col).alias("s"), (-F.col(id_col)).alias("n"))
        ).alias("_b"),
        F.count("*").cast("bigint").alias("n_members"),
    )
    return best.select(
        (-F.col("_b.n")).cast("long").alias(id_col),
        "component",
        F.col("_b.s").alias(score_col),
        "n_members",
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16,
) -> DataFrame:
    """(id, simhash): classic sign-of-weighted-bit-sums over distinct word
    tokens; token hash = md5-hash64. `bits` kept modest because each bit is
    one aggregate expression (all fused in a single hash-agg pass)."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
        ).alias("tok"),
    ).withColumn("h", _md5_hash64(F.col("tok")))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = toks.groupBy(id_col).agg(*bit_aggs)
    sim = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return sums.select(F.col(id_col), sim.cast("long").alias("simhash"))


def hamming_neardup_pairs(sig: DataFrame, sig_col: str, id_col: str,
                          max_hamming: int, bits: int,
                          bands: int) -> DataFrame:
    """Pairs of rows whose ``sig_col`` signatures lie within
    ``max_hamming`` bits — EXACT, by the block-combination construction
    of Manku, Jain & Das Sarma (WWW'07, "Detecting Near-Duplicates for
    Web Crawling"). Signature-agnostic: simhash_neardup_pairs feeds it
    text simhashes, multimodal.binary.dhash_neardup_pairs feeds it
    64-bit image dHashes — same banding, same exactness proof.

    The signature splits into ``bands`` contiguous blocks; each row
    explodes one join key per (bands - max_hamming)-sized block
    COMBINATION (C(bands, max_hamming) keys). A pair within hamming k
    differs in at most k blocks, so at least bands-k blocks agree and the
    combination made of those agreeing blocks collides — exact recall by
    pigeonhole, like single-block banding, but each key carries
    (bands-k)/bands of the signature instead of 1/bands: on uniform
    signatures candidate volume drops from C(m,1)·N²/2^(bits/m) to
    C(m,k)·N²/2^(bits·(m-k)/m). (r4: the single-block version measured
    super-linear in the N→4N scale probe — its 4-bit keys collide
    constantly; 8-bit combination keys restore near-linear growth, and
    the 10^10-row configuration is bits=48..64 with bands=8: 36+-bit keys
    make expected collisions per combination negligible.) Candidates go
    through one equi-join (hash join, never nested-loop) and the exact
    ``bit_count(xor)`` verify keeps precision 1.

    Heavy-hitter signatures (r5): rows are first grouped by EXACT
    signature. Identical-signature pairs (hamming 0 — exact dups,
    templated web images, boilerplate docs) come from a plain equi
    self-join on the full signature, output-proportional with no
    banding work; only DISTINCT signatures enter the banding explode,
    and the verified distinct-signature pairs are expanded back to id
    pairs by two equi-joins. Without this tier a signature shared by m
    rows costs m²·C(bands,k) banding candidates for m²/2 true pairs —
    the dhash scale probe's first (degenerate) image corpus measured
    exactly that blow-up (180 distinct hashes over 5k rows → 11×
    super-linear) before the generator was fixed; a real crawl's
    spacer-GIF/logo-variant population has the same shape, and here it
    now costs only its own output size."""
    import itertools

    if bands <= max_hamming:
        raise ValueError(
            f"bands={bands} must exceed max_hamming={max_hamming} for exact recall"
        )
    if bits % bands:
        raise ValueError(f"bits={bits} must divide evenly into bands={bands}")
    width = bits // bands
    mask = (1 << width) - 1
    pick = bands - max_hamming  # blocks per combination key
    combos = list(itertools.combinations(range(bands), pick))

    # the signature relation feeds both tiers' self-joins, the distinct
    # banding input and the two expansion joins — five consumers; the
    # upstream signature computation (simhash's per-bit aggregation /
    # the image decode+hash scan) must run once, not five times
    ids = sig.select(id_col, sig_col).persist()

    # tier 1: identical signatures — hamming 0 by definition, no banding
    ia, ib = ids.alias("ia"), ids.alias("ib")
    same = ia.join(
        ib,
        (F.col(f"ia.{sig_col}") == F.col(f"ib.{sig_col}"))
        & (F.col(f"ia.{id_col}") < F.col(f"ib.{id_col}")),
    ).select(
        F.col(f"ia.{id_col}").alias("id_a"),
        F.col(f"ib.{id_col}").alias("id_b"),
        F.lit(0).alias("hamming"),
    )

    # tier 2: banding over DISTINCT signatures only
    def _block(i):
        return F.shiftright(F.col(sig_col), i * width).bitwiseAND(F.lit(mask))

    stacked = ids.select(sig_col).distinct().select(
        sig_col,
        F.explode(
            F.array(*[
                F.concat_ws("_", F.lit(ci), *[_block(b) for b in blocks])
                for ci, blocks in enumerate(combos)
            ])
        ).alias("band_key"),
    )
    a, b = stacked.alias("a"), stacked.alias("b")
    xor = F.expr(f"a.{sig_col} ^ b.{sig_col}")
    sig_pairs = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{sig_col}") < F.col(f"b.{sig_col}")),
        )
        .select(
            F.col(f"a.{sig_col}").alias("_sig_a"),
            F.col(f"b.{sig_col}").alias("_sig_b"),
            F.bit_count(xor).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a signature pair may agree on several bands
    )
    # expand verified signature pairs back to id pairs (each join is
    # 1:multiplicity on the signature; AQE broadcasts the small pair set)
    cross = (
        sig_pairs
        .join(ia, F.col(f"ia.{sig_col}") == F.col("_sig_a"))
        .join(ib, F.col(f"ib.{sig_col}") == F.col("_sig_b"))
        .select(
            F.least(F.col(f"ia.{id_col}"), F.col(f"ib.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"ia.{id_col}"), F.col(f"ib.{id_col}")).alias("id_b"),
            "hamming",
        )
    )
    return same.unionByName(cross)


def simhash_neardup_pairs(df: DataFrame, max_hamming: int = 2,
                          id_col: str = "doc_id", bits: int = 16,
                          bands: int = 4) -> DataFrame:
    """Text pairs within `max_hamming` simhash bits — simhash signatures
    through the exact Manku block-combination banding (see
    :func:`hamming_neardup_pairs` for the construction and the
    10^10-row configuration notes)."""
    sh = simhash(df, id_col=id_col, bits=bits)
    return hamming_neardup_pairs(sh, sig_col="simhash", id_col=id_col,
                                 max_hamming=max_hamming, bits=bits,
                                 bands=bands)


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, threshold: float = 0.5, df_cap: int = 1000,
) -> DataFrame:
    """Exact Jaccard over distinct word n-grams for pairs sharing >=1
    shingle. df_cap drops shingles present in more than df_cap docs (the
    anti-boilerplate prune; log what was dropped at call site if needed)."""
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("sh")
    )
    # rare feeds doc_sizes and BOTH sides of the intersection self-join,
    # and itself contains two evaluations of the shingle explode —
    # uncached, the explode subtree ran six times per query. Persist the
    # capped relation (it is the pruned shingle space, the thing the
    # df_cap exists to keep small).
    rare = sh.join(
        sh.groupBy("sh").agg(F.countDistinct(id_col).alias("df")).filter(
            F.col("df") <= df_cap
        ).select("sh"),
        "sh",
    ).persist()
    # doc sizes over the SAME capped shingle space as the intersections:
    # when the cap binds, jaccard is the exact similarity of the pruned
    # shingle sets (numerator and denominator both exclude boilerplate);
    # when it does not bind, this is the true n-gram jaccard.
    doc_sizes = rare.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a, b = rare.alias("a"), rare.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(doc_sizes.withColumnRenamed(id_col, "id_a")
                   .withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(doc_sizes.withColumnRenamed(id_col, "id_b")
              .withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns — pure column
    expressions (zip_with + aggregate), JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine near-dup pairs — the O(N^2) correctness baseline
    and cross-check oracle for ``embedding_neardup_pairs_lsh`` (the scale
    path). Keep N small; never run this shape at corpus scale."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", F.round(cosine_sim(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_neardup_pairs_lsh(
    emb: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 16, planes: int = 8, multiprobe_hamming: int = 2,
) -> DataFrame:
    """Scale path for pairwise embedding near-dup: bucket by deterministic
    random-hyperplane LSH signature (operators/similarity.lsh_signature),
    equi-join on the bucket with multiprobe expansion, cosine-verify inside
    buckets.

    Side B explodes each vector into every signature within
    ``multiprobe_hamming`` bits of its own (sum of C(planes, 0..h) probe
    keys per row — a constant), so any pair whose signatures differ by at
    most that many bits meets in EXACTLY ONE equi-join bucket: candidate
    volume is O(N * probes * bucket_size), never the O(N^2) cartesian of
    the brute-force baseline. Sizing rule: bucket_size = N / 2^planes, so
    ``planes`` must grow with log2(N) to keep per-bucket work constant —
    planes ≈ log2(N / target_bucket_size) (e.g. 10^10 rows at ~10k-row
    buckets → 20 planes); a fixed plane count makes candidate volume
    quadratic again once buckets saturate. (Recall at a given cosine
    threshold depends on planes × multiprobe together — re-pin against
    the brute-force oracle when changing either.)
    The in-bucket cosine filter keeps precision
    1.0; recall is 1.0 iff no qualifying pair's signatures differ by more
    than ``multiprobe_hamming`` bits — pinned against the brute-force
    result on the test vectors (tests/test_training_ops.py) at the shipped
    (planes, probes)."""
    from itertools import combinations

    from firmwarescraper_spark.operators.similarity import lsh_signature

    sig = lsh_signature(F.col(vec_col), dim, planes)
    # both join sides project from `signed`; persist so the
    # planes x dim hyperplane-fold signature runs once per row
    signed = emb.select(
        F.col(id_col), F.col(vec_col), sig.alias("_sig")).persist()
    masks = [0]
    for h in range(1, multiprobe_hamming + 1):
        masks.extend(
            sum(1 << b for b in bits_set)
            for bits_set in combinations(range(planes), h)
        )
    # double-precision verify: float32xfloat32 products can flip the
    # rounded cosine at the 4th decimal near threshold boundaries
    a = signed.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
        F.col("_sig").alias("_sig_a"),
    )
    b = signed.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
        F.explode(
            F.array(*[F.col("_sig").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("_probe"),
    )
    # exactly one probe of B equals A's signature per qualifying pair, so
    # the equi-join emits each pair at most once — no distinct needed
    cand = a.join(
        b, (F.col("_sig_a") == F.col("_probe")) & (F.col("id_a") < F.col("id_b"))
    )
    return (
        cand.withColumn("cos", F.round(cosine_sim(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
