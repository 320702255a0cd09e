"""BM25 ranked retrieval (textops.bm25_topk) — hand-computed values and
rank semantics, plus the sessionize driver row's shape. The full DuckDB
oracle parity for both runs in test_entry_oracle.py."""

import math

import pytest
from pyspark.sql import functions as F

from firmwarescraper_spark.operators import textops as TX


def _bm25_hand(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_hand_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark shuffle"),          # tf(spark)=2, dl=3
            (2, "spark joins a table"),          # tf(spark)=1, dl=4
            (3, "nothing relevant here at all"), # no hit,      dl=5
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["bm25"]
           for r in TX.bm25_topk(docs, ["spark"], k=10).collect()}
    # df(spark)=2 over n=3 docs, avgdl=4
    exp1 = round(round(_bm25_hand(2, 2, 3, 3, 4.0), 6), 4)
    exp2 = round(round(_bm25_hand(1, 2, 3, 4, 4.0), 6), 4)
    assert out == {1: pytest.approx(exp1, abs=1e-9),
                   2: pytest.approx(exp2, abs=1e-9)}
    assert out[1] > out[2]  # higher tf, shorter doc ranks first


def test_bm25_multi_term_and_topk(spark):
    docs = spark.createDataFrame(
        [(i, "common word " + ("rare " if i == 7 else "") + "tail") for i in range(10)],
        ["doc_id", "text"],
    )
    top = TX.bm25_topk(docs, ["common", "rare"], k=3).collect()
    assert len(top) == 3
    # the only doc containing the rare term outranks pure-common docs
    assert top[0]["doc_id"] == 7
    # deterministic tie-break among equal-scored docs: ascending doc_id
    assert [r["doc_id"] for r in top[1:]] == [0, 1]


def test_bm25_empty_and_nonmatching_query(spark):
    docs = spark.createDataFrame([(1, "alpha beta")], ["doc_id", "text"])
    assert TX.bm25_topk(docs, ["missing"], k=5).count() == 0


def test_sessionize_query_shape(spark):
    import __spark_entry__ as entry

    out = entry.queries()["sessionize"](spark, "/root/testdata/sf0.001")
    assert out.columns == ["user_id", "session_events",
                           "session_start", "session_end"]
    row = out.orderBy("user_id", "session_start").first()
    assert row["session_events"] >= 1
    assert len(row["session_start"]) == 19  # formatted, tz-stable


def test_lm_score_hand_values(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "b z")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in TX.lm_score(docs, top_bigrams=100).collect()}
    # unigrams: a=3, b=4, z=1 -> V=3
    # bigrams:  "a b"=3, "b a"=1, "b z"=1
    def lp(cb, cu):
        return round(math.log((cb + 1.0) / (cu + 3.0)), 6)

    d1 = round((lp(3, 3) + lp(1, 4) + lp(3, 3)) / 3, 4)   # a b, b a, a b
    d2 = round(lp(3, 3) / 1, 4)
    d3 = round(lp(1, 4) / 1, 4)
    assert out[1]["n_bigrams"] == 3 and out[1]["lm_logprob"] == pytest.approx(d1, abs=1e-9)
    assert out[2]["lm_logprob"] == pytest.approx(d2, abs=1e-9)
    assert out[3]["lm_logprob"] == pytest.approx(d3, abs=1e-9)
    # the common-pattern doc scores higher (less negative) than the rare one
    assert out[2]["lm_logprob"] > out[3]["lm_logprob"]


def test_lm_score_pruning_floor(spark):
    """A bigram pruned out of the top-M table gets the unseen floor."""
    rows = [(i, "x y") for i in range(10)] + [(99, "q r")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["lm_logprob"]
           for r in TX.lm_score(docs, top_bigrams=1).collect()}
    # "x y" (count 10) survives the prune; "q r" doesn't -> floor
    assert out[0] > out[99]


def test_ppl_buckets_thirds_and_ordering(spark):
    """head/middle/tail split ~n/3 by integer cutoffs, and every head
    score beats every middle score beats every tail score."""
    rows = (
        [(i, "the quick brown fox jumps the quick brown fox") for i in range(10)]
        + [(100 + i, f"the quick brown w{i} jumps") for i in range(10)]
        + [(200 + i, f"z{i} q{i} v{i} k{i}") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = TX.ppl_buckets(docs, top_bigrams=100).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["lm_logprob"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])
    # each template family lands in one bucket (ties share a bucket)
    assert len(by_bucket["head"]) == 10


def test_ppl_buckets_tie_semantics(spark):
    """Identical docs = identical scores = ONE bucket, even when a
    global ntile would have split them across the cutoff."""
    docs = spark.createDataFrame(
        [(i, "same text every time") for i in range(9)], ["doc_id", "text"])
    out = TX.ppl_buckets(docs, top_bigrams=100).collect()
    assert {r["bucket"] for r in out} == {"head"}


# ---------------------------------------------------------------------------
# hashed-n-gram linear classifier (fastText-style quality-filter inference)
# ---------------------------------------------------------------------------

def _clf_hand(text, buckets=1 << 12, seed="quality-v1", scale=256):
    """Pure-Python replay of classifier_score (the same md5 hash rule)."""
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    words = " ".join(text.lower().split()).split(" ")
    feats = words + [f"{a} {b}" for a, b in zip(words, words[1:])]
    bks = [h60(f"{seed}|{g}") % buckets for g in feats]
    tot = sum((h60(f"{seed}#{b}") % 1024) - 512 for b in bks)
    logit = tot / (max(len(feats), 1) * scale)
    return len(feats), round(logit, 6), round(1 / (1 + math.exp(-logit)), 6)


def test_classifier_hand_values(spark):
    docs = spark.createDataFrame(
        [(1, "The quick  Brown fox"), (2, "single"), (3, "")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in TX.classifier_score(docs).collect()}
    for i, text in [(1, "The quick  Brown fox"), (2, "single"), (3, "")]:
        n, logit, score = _clf_hand(text)
        assert out[i]["n_features"] == n
        assert out[i]["logit"] == pytest.approx(logit, abs=1e-9)
        assert out[i]["score"] == pytest.approx(score, abs=1e-9)
    # 4 words -> 4 unigrams + 3 bigrams; 1 word -> no bigrams
    assert out[1]["n_features"] == 7 and out[2]["n_features"] == 1


def test_classifier_join_equals_inline(spark):
    """The broadcast-weight-table plan (the real-trained-model path) and
    the inline zero-shuffle plan compute the identical scores."""
    docs = spark.createDataFrame(
        [(i, f"doc {i} has words w{i % 7} and w{i % 3} repeated {i}")
         for i in range(60)], ["doc_id", "text"])
    a = {tuple(r) for r in TX.classifier_score(docs, via="inline").collect()}
    b = {tuple(r) for r in TX.classifier_score(docs, via="join").collect()}
    assert a == b


def test_classifier_inline_plan_has_no_exchange(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = TX.classifier_score(docs, via="inline") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_classifier_join_plan_broadcasts_weights(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = TX.classifier_score(docs, via="join") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_classifier_bad_via_raises(spark):
    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        TX.classifier_score(docs, via="nope")


# ---------------------------------------------------------------------------
# hashed linear classifier TRAINING (full-batch logistic GD)
# ---------------------------------------------------------------------------

def _h60(s):
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _feat_buckets(text, buckets, seed):
    words = " ".join(text.lower().split()).split(" ")
    feats = words + [f"{a} {b}" for a, b in zip(words, words[1:])]
    return [_h60(f"{seed}|{g}") % buckets for g in feats]


def test_classifier_train_iter1_hand_values(spark):
    """One GD iteration from w0=0 is exactly hand-computable: every doc's
    residual is the constant ±2^19 (sigmoid(0)=0.5), so
    w1[b] = -((sum_docs r_doc * count_b) >> lr_shift)."""
    corpus = [(1, "good good stuff", 1), (2, "bad stuff", 0), (3, "good bad", 1)]
    docs = spark.createDataFrame(corpus, ["doc_id", "text", "y"])
    out = {
        r["bucket"]: r["weight"]
        for r in TX.classifier_train(
            docs, "y", buckets=32, iters=1, seed="t1", lr_shift=4
        ).collect()
    }
    scale = 1 << 20
    grads = {}
    for _, text, y in corpus:
        r = math.floor((0.5 - y) * scale)
        for b in _feat_buckets(text, 32, "t1"):
            grads[b] = grads.get(b, 0) + r
    for b in range(32):
        expect = round(-(grads.get(b, 0) >> 4) / scale, 6)
        assert out[b] == pytest.approx(expect, abs=1e-12), b
    assert len(out) == 32


def test_classifier_train_learns_separation(spark):
    """Two disjoint vocabularies, three iterations: every positive doc
    must outscore every negative under classifier_apply with the trained
    weights (the train-then-filter loop actually filters)."""
    pos_words = ["good", "great", "fine", "super"]
    neg_words = ["bad", "awful", "poor", "grim"]
    rows = []
    for i in range(20):
        rows.append((i, " ".join(pos_words[j % 4] for j in range(i % 5 + 2)), 1))
        rows.append((100 + i, " ".join(neg_words[j % 4] for j in range(i % 5 + 2)), 0))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    w = TX.classifier_train(docs, "y", buckets=256, iters=3, seed="sep",
                            lr_shift=10)
    scored = TX.classifier_apply(docs, w, buckets=256, seed="sep").collect()
    pos = [r["score"] for r in scored if r["doc_id"] < 100]
    neg = [r["score"] for r in scored if r["doc_id"] >= 100]
    assert min(pos) > max(neg)
    assert min(pos) > 0.5 > max(neg)


def test_classifier_train_margin_agg_is_shuffle_free(spark):
    """The per-iteration margin aggregation must add no data shuffle: the
    persisted feature relation is partitioned by doc, which satisfies the
    (doc, label) clustering; the only Exchange in the margin plan is the
    model broadcast."""
    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 3} w{i % 5}", i % 2) for i in range(50)],
        ["doc_id", "text", "y"])
    ex = TX._train_feature_relation(docs, "y", "text", "doc_id", 64, "s").persist()
    try:
        ex.count()  # materialize so downstream plans see the cached partitioning
        wdf = spark.createDataFrame([(3, 17)], "_b bigint, _w bigint")
        plan = TX._train_margins(ex, wdf) \
            ._jdf.queryExecution().executedPlan().toString()
        # the InMemoryRelation node embeds the CACHE-BUILD plan (which
        # legitimately contains the one-time repartition(doc) exchange);
        # the training-iteration plan is everything above the cache scan
        iter_plan = plan.split("InMemoryTableScan")[0]
        assert "Exchange hashpartitioning" not in iter_plan, plan
        assert "BroadcastHashJoin" in iter_plan
    finally:
        ex.unpersist()


def test_classifier_train_fixed_output_matches_real(spark):
    """output='fixed' is the same model in fixed-point: wgt / 2^20
    rounded 6 equals the real-units table exactly."""
    docs = spark.createDataFrame(
        [(i, f"w{i % 5} w{i % 3}", i % 2) for i in range(30)],
        ["doc_id", "text", "y"])
    kw = dict(buckets=32, iters=2, seed="fx")
    real = {r["bucket"]: r["weight"]
            for r in TX.classifier_train(docs, "y", **kw).collect()}
    fixed = {r["bucket"]: r["wgt"]
             for r in TX.classifier_train(docs, "y", output="fixed", **kw).collect()}
    assert set(real) == set(fixed)
    for b, wgt in fixed.items():
        assert real[b] == pytest.approx(round(wgt / (1 << 20), 6), abs=1e-12)
    with pytest.raises(ValueError):
        TX.classifier_train(docs, "y", output="nope", **kw)


def test_classifier_apply_fixed_point_close_to_real(spark):
    """Fixed-point inference (exact bigint sum / 2^20) and real-units
    inference (float sum of rounded-6 weights) agree to rounding noise —
    the fixed path is the engine-replayable one."""
    docs = spark.createDataFrame(
        [(i, f"w{i % 5} w{i % 3} w{i % 7}", i % 2) for i in range(40)],
        ["doc_id", "text", "y"])
    kw = dict(buckets=64, iters=2, seed="fp")
    wr = TX.classifier_train(docs, "y", **kw)
    wf = TX.classifier_train(docs, "y", output="fixed", **kw)
    a = {r["doc_id"]: r for r in
         TX.classifier_apply(docs, wr, buckets=64, seed="fp").collect()}
    b = {r["doc_id"]: r for r in
         TX.classifier_apply(docs, wf, buckets=64, seed="fp",
                             scale_bits=20).collect()}
    for i in a:
        assert a[i]["logit"] == pytest.approx(b[i]["logit"], abs=1e-4)
        assert a[i]["score"] == pytest.approx(b[i]["score"], abs=1e-4)


def test_train_then_filter_keeps_positive_class(spark):
    """End-to-end composed loop on a separable corpus: filtering at 0.5
    keeps exactly the positive-vocabulary docs."""
    rows = []
    for i in range(15):
        rows.append((i, "good great fine work here today", 1))
        rows.append((100 + i, "bad awful poor mess there now", 0))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    w = TX.classifier_train(docs, "y", buckets=256, iters=3, seed="tf",
                            lr_shift=8, output="fixed")
    kept = TX.classifier_apply(docs, w, buckets=256, seed="tf",
                               scale_bits=20) \
        .filter("score >= 0.5").select("doc_id").collect()
    assert {r["doc_id"] for r in kept} == set(range(15))


def test_classifier_train_weight_table_covers_all_buckets(spark):
    """Buckets never touched by any feature come back with weight 0.0 —
    stable (buckets)-row schema for the model artifact."""
    docs = spark.createDataFrame([(1, "only one doc", 1)], ["doc_id", "text", "y"])
    rows = TX.classifier_train(docs, "y", buckets=16, iters=1, seed="z").collect()
    assert len(rows) == 16
    assert {r["bucket"] for r in rows} == set(range(16))
    assert any(r["weight"] == 0.0 for r in rows)
    assert any(r["weight"] != 0.0 for r in rows)


# ---------------------------------------------------------------------------
# inverted-index build (posting lists)
# ---------------------------------------------------------------------------


def _postings(spark, rows, **kw):
    from firmwarescraper_spark.operators.textops import build_postings

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["term"]: (r["df"], r["cf"], r["postings"])
        for r in build_postings(df, **kw).collect()
    }


def test_build_postings_exact(spark):
    out = _postings(spark, [
        (1, "spark spark hash"),
        (2, "spark window"),
        (3, "hash hash hash window"),
    ])
    assert out["spark"] == (2, 3, "1:2|2:1")     # tf desc
    assert out["hash"] == (2, 4, "3:3|1:1")
    assert out["window"] == (2, 2, "2:1|3:1")    # tie -> doc asc


def test_build_postings_topk_cap_keeps_exact_df_cf(spark):
    rows = [(i, "common") for i in range(10)] + [(50, "common common rare")]
    out = _postings(spark, rows, top_k=3)
    df, cf, post = out["common"]
    assert (df, cf) == (11, 12)                  # exact beyond the cap
    assert post == "50:2|0:1|1:1"                # top-3 by (tf desc, doc)
    assert out["rare"] == (1, 1, "50:1")


def test_build_postings_salt_invariance(spark):
    rows = [(i, f"w{i % 7} shared") for i in range(40)]
    a = _postings(spark, rows, top_k=4, salt_buckets=2)
    b = _postings(spark, rows, top_k=4, salt_buckets=16)
    assert a == b


def test_build_postings_tokenization(spark):
    # same regex family as bm25: non-alnum splits, case folds, empties drop
    out = _postings(spark, [(7, "Re-Hash! hash,HASH  9lives")])
    assert out["hash"] == (1, 3, "7:3")
    assert out["re"] == (1, 1, "7:1")
    assert out["9lives"] == (1, 1, "7:1")


def test_build_postings_plan_two_phase_windows(spark):
    """Plan pin: the per-term top-k is TWO chained sort-based Window
    ranks (partial per (term, salt), exact per term) — the spillable
    shape — and the only collect_list sits above the rank filter, where
    group size is already bounded at top_k per term."""
    from firmwarescraper_spark.operators.textops import build_postings

    df = spark.createDataFrame(
        [(i, f"w{i % 5} shared") for i in range(30)],
        "doc_id long, text string")
    plan = build_postings(df)._jdf.queryExecution().executedPlan().toString()
    # two rank phases, each with the rank-limit PUSHED DOWN by Catalyst
    # (WindowGroupLimit Partial+Final per phase): tasks stream the top-k
    # per group instead of fully sorting it — the bound is enforced
    # before the window even runs
    assert plan.count("WindowGroupLimit") == 4
    # exact-rank window partitions by term alone; partial by (term, salt)
    assert "_salt" in plan
