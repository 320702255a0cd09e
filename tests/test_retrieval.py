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
