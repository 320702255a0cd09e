"""Sketch operator tests (operators/sketches.py): HLL error bounds on
both formula branches, register-table mergeability (the property that
makes HLL distributable), CMS never-underestimate, and sketch size
bounds."""

import pytest
from pyspark.sql import functions as F

from firmwarescraper_spark.operators import sketches as SK


def _est(df):
    return {tuple(r[:-1]): r[-1] for r in df.collect()}


def test_hll_small_range_branch(spark):
    # 150 distinct values, m=64: E_raw <= 2.5m and V > 0 -> linear
    # counting branch; error well inside the HLL envelope
    df = spark.range(3000).select(
        F.lit("g").alias("g"), (F.col("id") % 150).alias("v")
    )
    est = _est(SK.hll_distinct(df, "v", ["g"]))[("g",)]
    assert abs(est - 150) / 150 < 0.20


def test_hll_raw_branch(spark):
    # 5000 distinct values saturate every register (V == 0 almost
    # surely) -> raw harmonic-mean branch; ~13% std error at m=64
    df = spark.range(5000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    est = _est(SK.hll_distinct(df, "v", ["g"]))[("g",)]
    assert abs(est - 5000) / 5000 < 0.35


def test_hll_is_insensitive_to_duplicates(spark):
    once = spark.range(400).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    thrice = once.union(once).union(once)
    assert _est(SK.hll_distinct(once, "v", ["g"])) == _est(
        SK.hll_distinct(thrice, "v", ["g"])
    )


def test_hll_register_tables_merge(spark):
    # the distributed-merge property: max-combining the register tables
    # of two disjoint halves equals the register table of the union
    lo = spark.range(0, 300).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    hi = spark.range(300, 700).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    merged = (
        SK.hll_register_table(lo, "v", ["g"])
        .union(SK.hll_register_table(hi, "v", ["g"]))
        .groupBy("g", "j")
        .agg(F.max("mj").alias("mj"))
    )
    full = SK.hll_register_table(lo.union(hi), "v", ["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_hll_multi_group(spark):
    # per-group cardinalities differ; estimates must track each group
    df = spark.range(4000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 997).alias("v")
    )
    exact = {
        r["g"]: r["d"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("d")).collect()
    }
    out = _est(SK.hll_distinct(df, "v", ["g"]))
    assert len(out) == 4
    for (g,), est in out.items():
        assert abs(est - exact[g]) / exact[g] < 0.30


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .filter(F.col("doc_id") < 300)
    )


def test_cms_never_underestimates(spark, docs):
    exact = (
        docs.select(F.explode(SK._tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sketch = SK.cms_sketch(docs, "text", depth=2, width=32)  # force collisions
    est = SK.cms_estimate(sketch, exact.select("tok"), depth=2, width=32)
    joined = est.join(exact, "tok").collect()
    assert joined and all(r["cms_est"] >= r["c"] for r in joined)


def test_cms_topk_matches_exact_at_sandbox_width(spark, docs):
    got = [(r["tok"], r["cms_est"])
           for r in SK.cms_heavy_hitters(docs, "text", k=10).collect()]
    exact = (
        docs.select(F.explode(SK._tokens(F.col("text"))).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok")).limit(10).collect()
    )
    assert got == [(r["tok"], r["c"]) for r in exact]


def test_cms_sketch_is_bounded(spark, docs):
    sketch = SK.cms_sketch(docs, "text", depth=3, width=64)
    assert sketch.count() <= 3 * 64
