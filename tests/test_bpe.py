"""Distributed BPE tokenizer training (operators/bpe.py): Spark merge
loop vs the pure-Python reference, merge-apply edge cases, oracle-SQL
parity, and the bounded-iteration plan pin.

The reference repo never trains a tokenizer; this is one of the
beyond-reference training-data operators the build brief mandates. The
correctness anchor is therefore the classic algorithm itself (Sennrich
et al. 2016 / the HF-tokenizers word-frequency formulation), pinned two
ways: a pure-Python reimplementation run on the same word frequencies,
and the DuckDB oracle for the corpus-proportional stage
(__spark_entry__.py bpe_pair_counts).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from firmwarescraper_spark.operators import bpe as BPE

DOCS = [
    "the cat sat on the mat",
    "the rat sat on the cat",
    "low lower lowest slow slower",
    "new newer newest news",
    "the low new cat",
]


def _docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id int, text string"
    )


def _word_freq_py():
    import collections
    import re

    wf = collections.Counter()
    for t in DOCS:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                wf[w] += 1
    return dict(wf)


def test_word_symbols_and_merge_fold(spark):
    df = spark.createDataFrame(
        [("aaa",), ("ab",), ("b",)], "word string"
    ).withColumn("syms", BPE.word_symbols(F.col("word")))
    rows = {r["word"]: r["syms"] for r in df.collect()}
    assert rows["aaa"] == ["a", "a", "a", BPE.END]
    assert rows["b"] == ["b", BPE.END]

    # left-to-right NON-OVERLAPPING merge: [a,a,a] + (a,a) -> [aa, a]
    merged = df.withColumn(
        "m", BPE.merge_symbols(F.col("syms"), "a", "a")
    ).collect()
    m = {r["word"]: r["m"] for r in merged}
    assert m["aaa"] == ["aa", "a", BPE.END]
    assert m["ab"] == ["a", "b", BPE.END]  # no match -> unchanged
    # merge that consumes the end marker
    endm = df.withColumn(
        "m", BPE.merge_symbols(F.col("syms"), "b", BPE.END)
    ).collect()
    e = {r["word"]: r["m"] for r in endm}
    assert e["b"] == ["b" + BPE.END]
    assert e["ab"] == ["a", "b" + BPE.END]


def test_bpe_learn_matches_pure_python_reference(spark):
    got = BPE.bpe_learn(_docs_df(spark), merges=8, checkpoint_every=3)
    want = BPE.bpe_reference(_word_freq_py(), merges=8)
    assert got == want
    # determinism: a rerun learns the identical merge table
    assert BPE.bpe_learn(_docs_df(spark), merges=8) == got


def test_bpe_learn_min_freq_floor(spark):
    # with a freq floor, hapax words can't contribute pair counts
    wf = {w: f for w, f in _word_freq_py().items() if f >= 2}
    got = BPE.bpe_learn(_docs_df(spark), merges=4, min_freq=2)
    want = BPE.bpe_reference(wf, merges=4)
    assert got == want


def test_bpe_pair_counts_matches_duckdb_oracle(spark):
    sdf = BPE.bpe_pair_counts(_docs_df(spark), k=30).collect()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id INT, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(i, t) for i, t in enumerate(DOCS)],
    )
    orc = con.execute(
        BPE.pair_counts_oracle_sql(table="documents", k=30)
    ).fetchall()
    assert [(r["left_sym"], r["right_sym"], r["cnt"]) for r in sdf] == orc


def test_bpe_iteration_runs_on_checkpointed_vocab(spark):
    """The merge loop must iterate over the vocab snapshot, not re-scan
    the corpus: after the initial localCheckpoint, a pair_counts plan
    over the vocab carries no file scan of the input."""
    vocab = (
        BPE.word_freqs(_docs_df(spark))
        .withColumn("syms", BPE.word_symbols(F.col("word")))
        .select("syms", "freq")
        .localCheckpoint()
    )
    plan = BPE.pair_counts(vocab)._jdf.queryExecution().executedPlan().toString()
    assert "Scan" not in plan or "ExistingRDD" in plan or "LocalTableScan" in plan
    # and the vocab table is what the fold rewrites — symbols only ever
    # shrink or keep length (merges concatenate, never split)
    merged = vocab.withColumn("m", BPE.merge_symbols(F.col("syms"), "t", "h"))
    bad = merged.filter(F.size("m") > F.size("syms")).count()
    assert bad == 0


def _encode_merges():
    # chained rule ((t,h) then (th,e)), two </w>-suffix rules, and
    # rules that never fire — the fixed table the entry oracle also uses
    return [("t", "h"), ("th", "e"), ("e", "</w>"), ("o", "w"),
            ("l", "ow"), ("e", "r"), ("q", "z")]


def _encode_py(text, merges):
    import re

    out = []
    for w in re.split(r"[^a-z0-9]+", text.lower()):
        if not w:
            continue
        syms = list(w) + [BPE.END]
        for left, right in merges:
            new, pending = [], None
            for s in syms:
                if pending == left and s == right:
                    new.append(left + right)
                    pending = None
                else:
                    if pending is not None:
                        new.append(pending)
                    pending = s
            if pending is not None:
                new.append(pending)
            syms = new
        out.extend(syms)
    return " ".join(out)


def test_bpe_encode_matches_pure_python(spark):
    merges = _encode_merges()
    got = {
        r["doc_id"]: (r["token_str"], r["n_tokens"])
        for r in BPE.bpe_encode(_docs_df(spark), merges).collect()
    }
    for i, t in enumerate(DOCS):
        want = _encode_py(t, merges)
        assert got[i][0] == want, (i, got[i][0], want)
        assert got[i][1] == len(want.split())


def test_bpe_encode_join_equals_inline(spark):
    merges = _encode_merges()
    a = {r["doc_id"]: r["token_str"] for r in
         BPE.bpe_encode(_docs_df(spark), merges, via="join").collect()}
    b = {r["doc_id"]: r["token_str"] for r in
         BPE.bpe_encode(_docs_df(spark), merges, via="inline").collect()}
    assert a == b


def test_bpe_encode_empty_and_punct_only_docs(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "?!... --"), (2, "the")], "doc_id int, text string"
    )
    for via in ("join", "inline"):
        rows = {r["doc_id"]: (r["token_str"], r["n_tokens"])
                for r in BPE.bpe_encode(df, _encode_merges(), via=via).collect()}
        assert rows[0] == ("", 0)
        assert rows[1] == ("", 0)
        assert rows[2] == ("the " + BPE.END, 2)


def test_bpe_encode_matches_duckdb_oracle(spark):
    merges = _encode_merges()
    sdf = sorted(
        (r["doc_id"], r["token_str"], r["n_tokens"])
        for r in BPE.bpe_encode(_docs_df(spark), merges).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(i, t) for i, t in enumerate(DOCS)],
    )
    orc = con.execute(BPE.encode_oracle_sql(merges)).fetchall()
    assert sdf == [tuple(r) for r in orc]


def test_bpe_encode_accepts_learn_output(spark):
    """bpe_learn's 5-tuples feed bpe_encode directly — the train→apply
    handoff needs no reshaping."""
    learned = BPE.bpe_learn(_docs_df(spark), merges=3)
    assert learned and len(learned[0]) == 5
    pairs = [(m[1], m[2]) for m in learned]
    a = {r["doc_id"]: r["token_str"] for r in
         BPE.bpe_encode(_docs_df(spark), learned).collect()}
    b = {r["doc_id"]: r["token_str"] for r in
         BPE.bpe_encode(_docs_df(spark), pairs).collect()}
    assert a == b


def test_bpe_encode_join_folds_vocab_not_corpus(spark):
    """The via='join' plan must broadcast the encoded vocab into the
    corpus side — the fold runs on the distinct-word table, the corpus
    join is a BroadcastHashJoin, and the only corpus-wide exchange is
    the doc-keyed regroup."""
    plan = (
        BPE.bpe_encode(_docs_df(spark), _encode_merges(), via="join")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
