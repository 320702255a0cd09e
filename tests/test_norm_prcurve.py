"""CCNet text normalization and classifier PR-curve eval
(operators/textops.py ccnet_normalize / pr_curve): hand values, sklearn-
style reference parity, DuckDB replay, and plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from firmwarescraper_spark.operators import textops as TX


def _norm(spark, s):
    df = spark.createDataFrame([(s,)], ["t"])
    return df.select(TX.ccnet_normalize(F.col("t")).alias("n")).collect()[0]["n"]


def test_ccnet_normalize_golden(spark):
    assert _norm(spark, "Héllo “Wörld” — Nº 42…") == 'hello "world" - no 00.'
    assert _norm(spark, "ÇA   VA\t très\nbien") == "ca va tres bien"
    assert _norm(spark, "straße œuvre ðe") == "strasse oeuvre de"
    # chars outside the fold table pass through (documented contract)
    assert _norm(spark, "русский 中文") == "русский 中文"


def test_ccnet_normalize_collides_variants(spark):
    # the dedup key must collide across accent/digit/quote variation
    a = _norm(spark, "Héllo “Nº 42” — Ça va")
    b = _norm(spark, 'hello "no 17" - ca va')
    assert a == b


def test_ccnet_normalize_duckdb_replay(spark):
    texts = ["Héllo “Wörld” — Nº 42…", "ÇA   VA\t très\nbien",
             "straße œuvre ðe", "plain ascii 123", "русский 中文"]
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    got = {r["t"]: r["n"] for r in df.select(
        "t", TX.ccnet_normalize(F.col("t")).alias("n")).collect()}
    sql = (f"SELECT t, {TX.ccnet_normalize_sql('t')} AS n "
           "FROM (SELECT unnest(?) AS t)")
    for t, n in duckdb.sql(sql, params=[texts]).fetchall():
        assert got[t] == n, t


def test_ccnet_normalize_zero_exchange(spark):
    df = spark.createDataFrame([("x",)], ["t"])
    plan = df.select(TX.ccnet_normalize(F.col("t")).alias("n")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _curve(spark, rows):
    df = spark.createDataFrame(rows, ["score", "label"])
    return {r["threshold"]: r for r in TX.pr_curve(df).collect()}


def test_pr_curve_hand_values(spark):
    # scores: pos at .9/.7, neg at .8/.1
    by = _curve(spark, [(0.9, 1), (0.8, 0), (0.7, 1), (0.1, 0)])
    assert set(by) == {0.9, 0.8, 0.7, 0.1}
    t9 = by[0.9]
    assert (t9["tp"], t9["fp"], t9["fn"]) == (1, 0, 1)
    assert t9["precision"] == 1.0 and t9["recall"] == 0.5
    t7 = by[0.7]
    assert (t7["tp"], t7["fp"], t7["fn"]) == (2, 1, 0)
    assert t7["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert t7["recall"] == 1.0
    # f1 = 2*tp / (tp+fp+P)
    assert t7["f1"] == pytest.approx(4 / 5, abs=1e-6)
    t1 = by[0.1]
    assert (t1["tp"], t1["fp"], t1["fn"]) == (2, 2, 0)


def test_pr_curve_ties_share_one_row(spark):
    by = _curve(spark, [(0.5, 1), (0.5, 0), (0.5, 1), (0.2, 0)])
    assert set(by) == {0.5, 0.2}
    assert (by[0.5]["tp"], by[0.5]["fp"]) == (2, 1)


def test_pr_curve_all_negative(spark):
    by = _curve(spark, [(0.5, 0), (0.2, 0)])
    assert all(r["recall"] == 0.0 and r["f1"] == 0.0 for r in by.values())
    assert by[0.2]["fp"] == 2 and by[0.2]["fn"] == 0


def test_pr_curve_reference_parity(spark):
    # brute-force reference over a deterministic 200-row corpus
    rows = [((i * 37 % 101) / 101.0, 1 if (i * 13 % 7) < 3 else 0)
            for i in range(200)]
    by = _curve(spark, rows)
    import math
    scores = sorted({round(s, 4) for s, _ in rows}, reverse=True)
    P = sum(l for _, l in rows)
    for t in scores:
        tp = sum(l for s, l in rows if round(s, 4) >= t)
        fp = sum(1 - l for s, l in rows if round(s, 4) >= t)
        r = by[t]
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, P - tp)
        assert r["precision"] == pytest.approx(tp / (tp + fp), abs=1e-6)
        assert r["recall"] == pytest.approx(tp / P, abs=1e-6)
        assert r["f1"] == pytest.approx(2 * tp / (tp + fp + P), abs=1e-6)


def test_pr_curve_window_runs_on_compact_table(spark):
    # the only sort feeding the window must consume the aggregated
    # per-threshold table, not the input rows: look for the aggregate
    # BELOW the window in the plan tree
    df = spark.createDataFrame([(0.5, 1), (0.2, 0)], ["score", "label"])
    plan = TX.pr_curve(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.index("Window") < plan.index("Aggregate")
