"""Query-suite scaling datapoint (r3 verdict #6).

The driver's per-query numbers are all sf0.1 and several driver queries
cap their id range for DuckDB-oracle cost, so replaying them at a bigger
SF would not exercise scaling. This probe instead runs the UNCAPPED
operator implementations on deterministic synthetic corpora at N and 4N
rows and reports the wall-time ratio per operator — near-linear means
ratio ≈ 4 (modulo the fixed per-job floor, which deflates the ratio for
sub-second ops).

Corpus model: web-text-like growth — the vocabulary scales with corpus
size (vocab = N/5), so shingle document-frequency stays roughly constant
as N grows, exactly like a growing crawl (new pages bring new shingles).
A fixed vocabulary would instead grow every shingle's df linearly and
make ANY pairwise-join operator look quadratic — that would measure the
corpus model, not the operator.

Run:  python BENCH/scale_probe.py [N] [op1,op2,…]
      (default 25_000; measures N and 4N; the optional second arg limits
      the run to the named ops — for probing newly added rows without
      re-measuring the whole table)
Output: one JSON line {op: {"n_sec":…, "n4_sec":…, "ratio":…}, …}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_docs(spark, n: int, words_per_doc: int = 40):
    """Deterministic pseudo-text: word k of doc i = w<xxhash64(i,k) % vocab>,
    vocab = n/5 so shingle df stays ~constant across scales."""
    from pyspark.sql import functions as F

    vocab = max(50, n // 5)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
                lambda k: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("id"), k), F.lit(vocab)),
                ),
            ),
            " ",
        ).alias("text"),
    )


def synth_docs_grouped(spark, n: int, words_per_doc: int = 40, group: int = 3):
    """Like synth_docs but every ``group`` consecutive docs share one text:
    a corpus with a dup-cluster count that grows linearly with N, so the
    pairs→components pipeline has real (and linearly many) components to
    find at every scale."""
    from pyspark.sql import functions as F

    vocab = max(50, n // 5)
    base = F.col("id") - F.pmod(F.col("id"), F.lit(group))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
                lambda k: F.concat(
                    F.lit("w"), F.pmod(F.xxhash64(base, k), F.lit(vocab)),
                ),
            ),
            " ",
        ).alias("text"),
    )


EMB_DIM = 32  # ANN probe vector dim: big enough to cost, small enough
               # that candidate verify (not codegen setup) dominates


def synth_embeddings(spark, n: int, dim: int = 64):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (F.pmod(F.xxhash64(F.col("id"), j), F.lit(2001)) - 1000)
            / 1000.0,
        ).cast("array<float>").alias("embedding"),
    )


def synth_images(spark, n: int, w: int = 24, h: int = 18, group: int = 3):
    """n small BMP payloads, every ``group`` consecutive ids sharing one
    raster (near-dup pair volume ∝ N, like synth_docs_grouped); each
    base raster is seeded-RNG pixel noise so cross-group dHashes are
    ~uniform 64-bit signatures (a per-base XOR *constant* is NOT enough
    — it washes out through luma mixing + area-mean downsampling and
    collapsed 5k images to 180 distinct hashes, band buckets of 558,
    and an 11x super-linear probe before this fix)."""
    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    schema = StructType([StructField("id", LongType()),
                         StructField("payload", BinaryType())])

    def gen(batches):
        import numpy as np
        import pandas as pd

        from firmwarescraper_spark.multimodal import codecs as CX

        cache = {}
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                base = int(i) - int(i) % group
                p = cache.get(base)
                if p is None:
                    rng = np.random.default_rng(base)
                    arr = rng.integers(0, 256, size=(h, w, 3),
                                       dtype=np.uint8)
                    p = CX.encode_bmp(arr)
                    cache[base] = p
                rows.append((int(i), p))
            yield pd.DataFrame(rows, columns=["id", "payload"])

    return spark.range(n).mapInPandas(gen, schema)


def synth_events(spark, n: int, events_per_user: int = 50):
    """n events over n/events_per_user users, hash-scattered timestamps
    across 30 days — the user count (and so the session count) grows
    linearly with N, like a growing clickstream."""
    from pyspark.sql import functions as F

    users = max(1, n // events_per_user)
    return spark.range(n).select(
        F.pmod(F.col("id"), F.lit(users)).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.pmod(F.xxhash64(F.col("id")), F.lit(86_400 * 30))
        ).alias("ts"),
    )


def main():
    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    n_hi = 4 * n_lo
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    from firmwarescraper_spark.operators import dedup as DD
    from firmwarescraper_spark.operators import textops as TX
    from firmwarescraper_spark.session import get_spark

    spark = get_spark(app_name="scale-probe", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("FATAL")

    def ops(docs, docs_dup, emb, events, planes, imgs):
        from pyspark.sql import functions as F

        from firmwarescraper_spark.operators import curation as CU
        from firmwarescraper_spark.operators import graph as GR
        from firmwarescraper_spark.operators import similarity as SIM
        from firmwarescraper_spark.operators import sketches as SK
        from firmwarescraper_spark.operators import extract as EXT
        from firmwarescraper_spark.sources import warc as WA
        from firmwarescraper_spark.streaming import events as EV

        # synthetic pages for the web-text-extraction rows: nav + two
        # body paragraphs + a per-doc promo link + footer; '/w/<word>'
        # anchor targets follow the vocab (∝ N/5), so the anchor_texts
        # group count grows linearly — a growing crawl's link graph
        w = F.split("text", " ")
        pages = docs.select(
            "doc_id",
            F.concat(
                F.lit('<div class="nav"><a href="/">home</a> '
                      '<a href="/about">about us</a> '
                      '<a href="/more">more links here now</a></div><p>'),
                F.array_join(F.slice(w, 1, 20), " "),
                F.lit('</p><div>see <a href="/w/'), F.get(w, 0),
                F.lit('">'), F.array_join(F.slice(w, 1, 2), " "),
                F.lit('</a> offer</div><p>'),
                F.array_join(F.slice(w, 21, 100), " "),
                F.lit('</p><div class="footer"><a href="/tos">terms</a> '
                      '<a href="/priv">privacy</a></div>'),
            ).alias("html"),
        )

        # a fixed deterministic query vector (dim matches synth_embeddings)
        query = [((i * 37) % 200 - 100) / 100.0 for i in range(EMB_DIM)]
        # IVF index build (centroid selection) happens here, OUTSIDE the
        # timed region — index build vs query cost are separate budgets at
        # deployment too. nlist is held FIXED across scales: the probe
        # measures the QUERY path (assignment + nprobe scan, both linear
        # in N at fixed nlist). The deployment sizing rule nlist ∝ sqrt(N)
        # trades index-build flops (N·nlist matmul) for a smaller scanned
        # fraction — an index-build knob, not a query-path scaling property.
        ivf_cents = SIM.ivf_centroids(emb, k=64)
        # SemDeDup cluster count follows the documented sizing rule
        # k ∝ N (constant expected cluster size ≈ 400), so the in-cluster
        # candidate volume sum(|c|²) ≈ N·400 stays LINEAR; a fixed k
        # would let clusters grow with N and measure the (documented)
        # quadratic failure mode, not the operator. Centroid selection is
        # index build — outside the timed region, like ivf_cents above.
        sem_k = max(16, emb.count() // 400)
        sem_cents = SIM.ivf_centroids(emb, k=sem_k)
        # PQ codebooks are index build too — fixed size across scales
        # (m=4 subspaces of EMB_DIM/4 dims, 16 codes each)
        pq_cbs = SIM.pq_codebooks(emb, m=4, ksub=16)
        return {
            "minhash_lsh_pairs": lambda: DD.minhash_lsh_pairs(docs),
            # daily-increment dedup on the grouped corpus: index = 3/4 of
            # the docs (signatures only — old text never re-shingled),
            # new shard = 1/4; shared group texts make cross pairs ∝ N
            "incremental_neardup": lambda: DD.incremental_lsh_pairs(
                DD.minhash_signatures(docs_dup.filter("doc_id % 4 != 0")),
                docs_dup.filter("doc_id % 4 = 0")),
            # the 10^10-row simhash config: 48-bit signatures (sparse true-pair
            # space) + 8-block Manku combination keys (36-bit join keys)
            "simhash_pairs": lambda: DD.simhash_neardup_pairs(
                docs, max_hamming=2, bits=48, bands=8),
            "ngram_jaccard": lambda: DD.ngram_jaccard_pairs(
                docs, threshold=0.2, df_cap=1000),
            "repetition": lambda: TX.repetition_signals(docs),
            "langid": lambda: docs.select(
                "doc_id", TX.langid_col(__import__(
                    "pyspark.sql.functions", fromlist=["col"]).col("text"))),
            "exact_dedup": lambda: DD.exact_dedup(docs),
            # ANN path (r4 verdict #7): planes follows the documented
            # sizing rule planes ≈ log2(N / target_bucket) — 10 at 25k,
            # 12 at 100k — so per-bucket occupancy stays ~constant and
            # candidate volume stays linear; holding planes FIXED across
            # scales would saturate buckets and measure the (documented)
            # quadratic failure mode, not the operator.
            "embedding_neardup_lsh": lambda: DD.embedding_neardup_pairs_lsh(
                emb, threshold=0.9, dim=EMB_DIM, planes=planes,
                multiprobe_hamming=1),
            "cosine_topk_lsh": lambda: SIM.lsh_bucketed_topk(
                emb, query, k=10, planes=planes, multiprobe_hamming=1),
            # IVF query path at fixed nlist=64, nprobe=8: assignment is one
            # numpy matmul per Arrow batch (the large-k path), probed lists
            # hold nprobe/nlist = 1/8 of the corpus at any scale — linear.
            "ivf_topk": lambda: SIM.ivf_topk(
                emb, query, ivf_cents, k=10, nprobe=8, assign_via="pandas"),
            # pairs -> groups on a corpus whose dup-cluster count grows
            # linearly with N (every 3 consecutive docs identical): measures
            # banded pair-gen + pointer-jumping label propagation end-to-end.
            "neardup_components": lambda: DD.neardup_components(
                docs_dup, DD.minhash_lsh_pairs(docs_dup)),
            # two-phase distributed prefix sum: bucket totals + within-
            # bucket window — the row proves the packing offsets cost
            # stays linear (a naive global window would serialize)
            "pack_sequences": lambda: CU.pack_sequences(
                docs, max_tokens=512, buckets=64),
            # BM25: the explode is pre-filtered to query-term hits and the
            # df/stats sides broadcast, so cost is one tokenizing scan +
            # O(hits) shuffle; the vocab grows with N so per-term hit
            # counts stay ~constant per doc (webby growth, as above)
            "bm25_topk": lambda: TX.bm25_topk(
                docs, ["w1", "w2", "w3", "w5"], k=20),
            # gap sessionization: one shuffle on user_id + per-user sort;
            # user count grows with N so partitions stay balanced
            "sessionize": lambda: EV.sessionize_batch(events,
                                                      gap_minutes=30),
            # PageRank, 3 sweeps over a 3-out-degree link graph: edge
            # table cached hash-partitioned by src once, one rank-table
            # shuffle + map-side-combined groupBy(dst) per iteration —
            # linear in edges at fixed iteration count
            "pagerank": lambda: GR.pagerank(
                docs.select("doc_id"),
                GR.synthetic_link_edges(docs.select("doc_id")),
                iterations=3),
            # HyperBall harmonic centrality: per-hop register shipping is
            # one src-join + one (v,j)-keyed max fold — state <= 64
            # rows/node at p=6 regardless of ball size, so cost tracks
            # |E| per hop; expected ~linear
            "hyperball": lambda: GR.hyperball_centrality(
                docs.select("doc_id"),
                GR.synthetic_link_edges(docs.select("doc_id")),
                max_t=2),
            # pruned bigram LM: training aggregations shuffle vocab-sized
            # tables, scoring is scan + broadcast joins; the prune cap is
            # FIXED across scales (the broadcastability invariant)
            "lm_score": lambda: TX.lm_score(docs, top_bigrams=20_000),
            # CCNet head/middle/tail partition: lm_score + a window over
            # the COMPACT per-score distribution (bounded by rounded-4
            # score cardinality) + broadcast bucket join — adds no
            # corpus-sized wide op beyond lm_score itself
            "ppl_buckets": lambda: TX.ppl_buckets(docs, top_bigrams=20_000),
            # HLL distinct per group: the shuffle carries at most
            # groups × 2^p fixed-width register rows (map-side combined)
            # no matter the input size — flat-to-linear by construction.
            # Distinct-ts per user-bucket so the TRUE cardinality grows
            # with N (the estimator's state still doesn't).
            "hll_distinct": lambda: SK.hll_distinct(
                events.withColumn(
                    "g", __import__("pyspark.sql.functions",
                                    fromlist=["pmod"]).pmod("user_id", 8)),
                "ts", ["g"]),
            # C4 line cleaning: pure scan-fused column algebra, zero
            # shuffle — the row pins that the per-line regex work stays
            # linear. Lines are injected by breaking the synthetic text
            # every 5 words (regexp, still scan-fused).
            "c4_clean": lambda: CU.c4_line_stats(
                docs.withColumn(
                    "text",
                    __import__("pyspark.sql.functions",
                               fromlist=["regexp_replace"]).regexp_replace(
                        "text", r"((?:\S+ ){5})", "$1\n"))),
            # DSIR importance weights: both hashed-ngram models are
            # fixed-size bucket tables (broadcast) — the N-proportional
            # costs are the two feature scans and one doc-keyed agg
            "dsir": lambda: CU.dsir_weights(
                docs.filter(docs["doc_id"] % 13 != 0),
                docs.filter(docs["doc_id"] % 13 == 0),
                buckets=4096),
            # count-min heavy hitters: sketch is depth×width rows total
            # (broadcast), candidates are the distinct tokens — the only
            # N-proportional costs are the tokenizing scan + distinct
            "cms_heavy_hitters": lambda: SK.cms_heavy_hitters(
                docs, "text", k=20),
            # SemDeDup: zero-shuffle pandas-matmul assignment (k is in the
            # hundreds here — too many literal structs for codegen) + ONE
            # cid-keyed self-join whose candidate volume is linear at the
            # k ∝ N sizing above + distinct + left join back
            "semdedup": lambda: CU.semdedup(
                emb, sem_cents, threshold=0.2, assign_via="pandas"),
            # PQ/ADC with exact re-rank: encode is a per-batch numpy
            # matmul (zero shuffle), ADC is literal-LUT lookups +
            # TakeOrderedAndProject, re-rank touches 100 rows — nothing
            # here shuffles the corpus, so the row must be ~linear
            "pq_topk": lambda: SIM.pq_adc_topk(
                emb, query, pq_cbs, k=10, refine=100, via="pandas"),
            # BPE training's only corpus-proportional stage: the
            # tokenize scan + map-side-combined word-freq reduction +
            # vocab-sized pair count. The merge loop itself iterates on
            # the vocab table (bounded), so THIS row is the one whose
            # linearity the 100-TB story rests on. Vocab grows with N
            # here (synthetic words are row-indexed), the worst case.
            "bpe_pair_counts": lambda: __import__(
                "firmwarescraper_spark.operators.bpe", fromlist=["x"]
            ).bpe_pair_counts(docs, k=50),
            # diversity sampling at the same k ∝ N cluster sizing:
            # zero-shuffle assignment + ONE cid-keyed window whose
            # partitions stay ~400 rows at any scale
            "diversity_sample": lambda: CU.diversity_sample(
                emb, sem_cents, quota=20, assign_via="pandas"),
            # BPE apply via the vocab-join shape: the fold cost is paid
            # per DISTINCT word (vocab ∝ N/5 here — worst case), the
            # corpus side is one broadcast join + doc-keyed regroup
            "bpe_encode": lambda: __import__(
                "firmwarescraper_spark.operators.bpe", fromlist=["x"]
            ).bpe_encode(
                docs, [("w", "1"), ("w1", "2"), ("w", "2"), ("0", "</w>")],
                via="join"),
            # seeded global shuffle: key+shard scan-fused, ONE range
            # exchange on the uniform md5 key (shards ∝ N keeps
            # partition size constant)
            "global_shuffle": lambda: CU.global_shuffle(
                docs, seed="probe", shards=max(4, n // 6_250)),
            # exact-substring spans on the grouped corpus (dup volume
            # ∝ N): the window explode is ~40 fixed-width rows/doc,
            # doc-frequency reduce combines map-side, semi-join mark
            "dup_spans": lambda: DD.dup_spans(docs_dup, L=8),
            # CCNet chunk-dedup APPLY on the grouped corpus (duplicated
            # chunks ∝ N): hash-only df mark + doc-keyed regroup of
            # surviving text — boilerplate never rides the shuffle
            "chunk_dedup_apply": lambda: CU.chunk_dedup_apply(docs_dup),
            # per-SITE template excision: hosts ∝ N (~50 docs each), one
            # injected 10-word template chunk per host; the df reduce is
            # (host, hash)-keyed fixed-width rows with map-side combine,
            # the host-doc-count side is |hosts| rows, and only SURVIVING
            # text rides the final doc-keyed regroup
            "site_boilerplate": lambda: CU.site_boilerplate(
                docs.select(
                    "doc_id",
                    F.concat(F.lit("h"),
                             F.pmod(F.col("doc_id"), F.lit(max(2, n // 50)))
                             ).alias("source"),
                    F.concat_ws(
                        " ", F.lit("tmpl"),
                        F.concat(F.lit("h"),
                                 F.pmod(F.col("doc_id"),
                                        F.lit(max(2, n // 50)))),
                        F.lit("nav home about contact privacy terms "
                              "search login"),
                        F.col("text")).alias("text"),
                )),
            # host-level curation profile: two map-side-combinable
            # host-keyed aggs + one 1-row global-mean broadcast; hosts
            # ∝ N (~50 docs each) so group sizes stay constant
            "host_profile": lambda: CU.host_profile(
                docs.select(
                    "doc_id",
                    F.concat(F.lit("h"),
                             F.pmod("doc_id", F.lit(max(2, n // 50)))
                             ).alias("source"),
                    ((F.pmod(F.xxhash64("doc_id"), F.lit(1024)))
                     / F.lit(1024.0)).alias("q"),
                    F.element_at(
                        F.array(F.lit("en"), F.lit("en"), F.lit("en"),
                                F.lit("de"), F.lit("fr")),
                        (F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(5))
                         + 1).cast("int")).alias("lang"),
                )),
            # token-budget mixture: per-(source, hash-bucket) windows —
            # budgets ∝ N so the kept fraction is scale-constant
            "budget_mix": lambda: CU.budget_mix(
                docs.withColumn(
                    "source",
                    F.concat(F.lit("s"), F.pmod(F.col("doc_id"), F.lit(8))),
                ),
                {f"s{i}": 2 * n for i in range(6)},
            ),
            # learned-filter inference: all work inside one projection —
            # flat per row at any scale
            "classifier_score": lambda: TX.classifier_score(docs),
            # boilerplate removal: one projection over the page scan —
            # regex block split + per-block strip/density, zero shuffle
            "html_main_content": lambda: EXT.main_content(pages),
            # anchor-text harvest: explode anchors in-scan, one href-keyed
            # shuffle of capped fixed-width rows; groups ∝ vocab ∝ N
            "anchor_texts": lambda: EXT.anchor_texts(pages),
            # learned-filter TRAINING (2 full-batch GD iterations): the
            # feature relation is built once (∝ N) and persisted
            # partitioned by doc; each iteration is a broadcast of the
            # 64-row model + zero-shuffle margin agg + 64-group gradient
            # agg — per-iteration cost ∝ N, model traffic constant
            "classifier_train": lambda: TX.classifier_train(
                docs.withColumn(
                    "y", F.pmod(F.xxhash64("doc_id"), F.lit(2)).cast("int")
                ),
                "y", buckets=64, iters=2,
            ),
            # WARC wire round trip (encode + gzip + parse back): per-row
            # codec work in scan-fused mapInPandas, zero shuffle
            "warc_roundtrip": lambda: WA.warc_to_pages(WA.pages_to_warc(
                docs.select(
                    F.concat(F.lit("http://h/"), "doc_id").alias("url"),
                    F.pmod(F.xxhash64("doc_id"), F.lit(86400)).alias("warc_epoch"),
                    F.col("text").cast("binary").alias("html"),
                ))),
            # revisit classification + wire roundtrip: one url-keyed join
            # vs the prior index (prior ∝ N/2), sha256 + codec per row in
            # the scan — half the corpus writes body-less revisit records
            "warc_revisit": lambda: WA.warc_records(WA.pages_to_warc(
                WA.classify_revisits(
                    docs.select(
                        F.concat(F.lit("http://h/"), "doc_id").alias("url"),
                        F.col("text").cast("binary").alias("html"),
                        F.lit(1704067200).cast("long").alias("warc_epoch"),
                    ),
                    docs.filter(F.pmod("doc_id", F.lit(2)) == 0).select(
                        F.concat(F.lit("http://h/"), "doc_id").alias("url"),
                        F.sha2(F.col("text").cast("binary"), 256)
                        .alias("digest"),
                        F.lit(1600000000).cast("long").alias("warc_epoch"),
                    )),
                rec_type_col="rec_type", refers_epoch_col="refers_to_epoch",
                digest_col="digest")),
            # image dHash near-dup: per-row BMP decode + 64-bit hash in
            # one scan, then the Manku banding equi-join — dup pair
            # volume ∝ N (3-sharing groups), cross-group collisions
            # negligible at 32-bit combination keys
            "dhash_neardup": lambda: __import__(
                "firmwarescraper_spark.multimodal.binary", fromlist=["x"]
            ).dhash_neardup_pairs(imgs),
            # CDX capture-log collapse: two captures per URL (urls ∝ N)
            # through the full emit→parse→struct-max-index pipeline; the
            # only wide op is the map-side-combinable latest-per-SURT agg
            "cdx_index": lambda: (lambda CX, caps: CX.cdx_index(
                CX.parse_cdx(CX.to_cdx(caps))))(
                __import__("firmwarescraper_spark.sources.cdx",
                           fromlist=["x"]),
                docs.select(
                    F.concat(F.lit("https://WWW.h"),
                             F.pmod(F.xxhash64("doc_id"), F.lit(1000)),
                             F.lit(".Example.com/"), "doc_id",
                             F.lit("?b=2&a=1")).alias("url"),
                    F.timestamp_seconds(
                        F.lit(1704067200)
                        + F.pmod(F.xxhash64("doc_id"), F.lit(86400))
                    ).alias("warc_ts"),
                ).unionByName(docs.select(
                    F.concat(F.lit("https://WWW.h"),
                             F.pmod(F.xxhash64("doc_id"), F.lit(1000)),
                             F.lit(".Example.com/"), "doc_id",
                             F.lit("?b=2&a=1")).alias("url"),
                    F.timestamp_seconds(
                        F.lit(1735689600)
                        + F.pmod(F.xxhash64("doc_id"), F.lit(86400))
                    ).alias("warc_ts"),
                ))),
            # URL filter: suffix-chain explode (bounded ~4 rows/URL) +
            # semi/anti join against a fixed blocklist + keyword CASE sum;
            # hosts follow the vocab so distinct-domain count grows ∝ N
            "url_filter": lambda: (lambda UF: UF.url_filter(
                docs.select("doc_id", F.concat(
                    F.lit("https://www."), F.get(w, 0),
                    F.lit(".example.com/"),
                    F.when(F.col("doc_id") % 11 == 0, F.lit("casino/"))
                    .otherwise(F.lit("blog/")),
                    "doc_id").alias("url")),
                spark.createDataFrame(
                    [(f"w{i}.example.com",) for i in range(500)],
                    ["domain"])))(
                __import__("firmwarescraper_spark.operators.urlfilter",
                           fromlist=["x"])),
            # trap detection: one projection (regex/array algebra) + ONE
            # host-keyed agg (two count-distincts share one Expand of
            # fixed-width keys); hosts follow the vocab (∝ N/5) with a
            # calendar-trap template on every 7th URL — expected ~linear
            "trap_signals": lambda: (lambda UF: UF.trap_signals(
                docs.select(F.concat(
                    F.lit("https://"), F.get(w, 0), F.lit(".example.com/"),
                    F.when(
                        F.col("doc_id") % 7 == 0,
                        F.concat(F.lit("cal/2024/"),
                                 (F.col("doc_id") % 12).cast("string"),
                                 F.lit("/"),
                                 F.col("doc_id").cast("string")),
                    ).otherwise(
                        F.concat(F.lit("post/"), F.get(w, 1),
                                 F.lit("-"), F.get(w, 2))
                    )).alias("url")),
                min_urls=10))(
                __import__("firmwarescraper_spark.operators.urlfilter",
                           fromlist=["x"])),
            # CCNet normalization: two translate tables + four regexes in
            # one codegen projection — scan-proportional, expected flat
            "ccnet_normalize": lambda: docs.select(
                "doc_id", TX.ccnet_normalize(F.col("text")).alias("n")),
            # PR threshold sweep: per-score counts combine map-side to a
            # compact table (scores here take 1000 distinct values at any
            # N); the cumulative window runs over that table only
            "pr_curve": lambda: TX.pr_curve(docs.select(
                (F.pmod(F.xxhash64("doc_id"), F.lit(1000)).cast("double")
                 / F.lit(1000.0)).alias("score"),
                F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(2))
                .cast("int").alias("label"))),
            # sitemap parse: 3 blocks per page, regexp_extract_all +
            # explode — a narrow generator, expected flat per-page
            "sitemap_entries": lambda: __import__(
                "firmwarescraper_spark.sources.sitemaps", fromlist=["x"]
            ).sitemap_entries(
                docs.select("doc_id", F.concat(
                    F.lit("<urlset><url><loc>https://h/"), F.get(w, 0),
                    F.lit("</loc><lastmod>2024-01-15</lastmod>"
                          "<priority>0.8</priority></url>"
                          "<url><loc>https://h/p/"), F.get(w, 1),
                    F.lit("</loc><changefreq>daily</changefreq></url>"
                          "<sitemap><loc>https://h/maps/"), "doc_id",
                    F.lit(".xml</loc></sitemap></urlset>"),
                ).alias("xml")),
                keep_cols=("doc_id",)),
            # redirect-chain resolution: pointer doubling — 4 self-joins
            # of fixed-width rows regardless of N; expected ~linear
            "redirect_resolve": lambda: GR.resolve_redirects(
                docs.select("doc_id"),
                GR.synthetic_redirect_edges(docs.select("doc_id")),
                rounds=4),
            # mirror detection: host count grows with N (~400 docs/host)
            # so per-host content stays constant like a growing crawl;
            # pair volume is linear via the per-fp host-set cap
            "mirror_hosts": lambda: __import__(
                "firmwarescraper_spark.operators.urlfilter", fromlist=["x"]
            ).mirror_hosts(
                docs.select(
                    F.concat(
                        F.lit("h"),
                        F.pmod(F.xxhash64("doc_id", F.lit(11)),
                               F.lit(max(12, n // 400))),
                    ).alias("host"),
                    # ~1/3 of docs fall into shared-content groups of
                    # ~10 (group count ∝ N, group size constant — stays
                    # under the per-fp host cap at every scale)
                    F.md5(F.when(
                        F.pmod(F.xxhash64("doc_id", F.lit(13)), F.lit(3))
                        == 0,
                        F.concat(F.lit("shared"),
                                 F.pmod(F.col("doc_id"),
                                        F.lit(max(7, n // 30)))),
                    ).otherwise(F.col("text"))).alias("fp"),
                ),
                min_shared=2, min_jaccard=0.01),
            # robots-policy extraction: zero-shuffle projection over the
            # same synthetic pages as the other extraction rows
            "robots_directives": lambda: EXT.robots_directives(pages),
            # entity decoding: zero-shuffle projection — split +
            # extract_all + per-element CASE + zip_with reassembly,
            # ~6 entities/row incl. one astral-plane codepoint
            "decode_entities": lambda: EXT.decode_entities(
                docs.select(
                    "doc_id",
                    F.concat(
                        F.lit("caf&eacute; &amp; &#x1F600; n&#233;e "),
                        F.col("text"), F.lit(" &#"),
                        (F.pmod("doc_id", F.lit(255)) + 1).cast("string"),
                        F.lit(";"),
                    ).alias("text"),
                )),
            # charset sniff+transcode: zero-shuffle projection — per-row
            # cost bounded by the 1 KiB meta scan + one validate + one
            # decode; payloads rotate through all five detection rules
            "detect_charset": lambda: EXT.detect_charset(
                docs.select(
                    "doc_id",
                    F.when(F.pmod("doc_id", F.lit(5)) == 0,
                           F.encode(F.concat(F.lit("café "), "text"),
                                    "UTF-8"))
                    .when(F.pmod("doc_id", F.lit(5)) == 1,
                          F.concat(F.lit(b"\xef\xbb\xbf"),
                                   F.encode(F.concat(F.lit("café "), "text"),
                                            "UTF-8")))
                    .when(F.pmod("doc_id", F.lit(5)) == 2,
                          F.concat(F.lit(b"\xff\xfe"),
                                   F.encode(F.concat(F.lit("café "), "text"),
                                            "UTF-16LE")))
                    .when(F.pmod("doc_id", F.lit(5)) == 3,
                          F.encode(F.concat(
                              F.lit('<meta charset="ISO-8859-1">café '),
                              "text"), "ISO-8859-1"))
                    .otherwise(F.encode(F.concat(F.lit("café "), "text"),
                                        "ISO-8859-1")).alias("payload"),
                )),
            # inverted-index build: vocab scales with N (synth_docs'
            # web-growth model) so per-term posting lists stay ~constant
            # and the two-phase top-k windows see flat group sizes
            "build_postings": lambda: TX.build_postings(docs, top_k=20),
            # snapshot diff: one full-outer join of two per-key index
            # snapshots (~N rows each) + the per-host rollup
            "crawl_diff": lambda: __import__(
                "firmwarescraper_spark.sources.cdx", fromlist=["x"]
            ).crawl_diff_summary(__import__(
                "firmwarescraper_spark.sources.cdx", fromlist=["x"]
            ).crawl_diff(
                docs.select(
                    F.concat(F.lit("com,h"),
                             F.pmod(F.xxhash64("doc_id", F.lit(17)),
                                    F.lit(max(12, n // 400))),
                             F.lit(")/d/"), "doc_id").alias("surt"),
                    F.md5("text").alias("last_digest")),
                docs.filter(
                    F.pmod(F.xxhash64("doc_id", F.lit(19)), F.lit(7)) != 0
                ).select(
                    F.concat(F.lit("com,h"),
                             F.pmod(F.xxhash64("doc_id", F.lit(17)),
                                    F.lit(max(12, n // 400))),
                             F.lit(")/d/"), "doc_id").alias("surt"),
                    F.when(
                        F.pmod(F.xxhash64("doc_id", F.lit(23)), F.lit(5))
                        == 0,
                        F.md5(F.concat(F.col("text"), F.lit("!"))),
                    ).otherwise(F.md5("text")).alias("last_digest")),
            )),
        }

    import math

    out = {}
    for label, n in (("n", n_lo), ("n4", n_hi)):
        docs = synth_docs(spark, n).persist()
        docs_dup = synth_docs_grouped(spark, n).persist()
        emb = synth_embeddings(spark, n, dim=EMB_DIM).persist()
        events = synth_events(spark, n).persist()
        imgs = synth_images(spark, n).persist()
        # materialize: measure the operator, not the generator
        docs.count(), docs_dup.count(), emb.count(), events.count()
        imgs.count()
        planes = round(math.log2(n / 25))  # ~25-row buckets at any scale
        for name, fn in ops(docs, docs_dup, emb, events, planes,
                            imgs).items():
            if only is not None and name not in only:
                continue
            best = None
            for _ in range(2):  # best-of-2 defeats one-off stalls
                t0 = time.monotonic()
                fn().write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            out.setdefault(name, {})[f"{label}_sec"] = round(best, 2)
            out[name][f"{label}_rows"] = n
            if name in ("embedding_neardup_lsh", "cosine_topk_lsh"):
                out[name][f"{label}_planes"] = planes
        docs.unpersist()
        docs_dup.unpersist()
        emb.unpersist()
        events.unpersist()
        imgs.unpersist()
    for name, rec in out.items():
        rec["ratio"] = round(rec["n4_sec"] / max(rec["n_sec"], 1e-9), 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
