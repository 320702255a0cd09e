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
