"""URL-level filtering (operators/urlfilter.py): blocklist subdomain
semantics, keyword scoring, structural features, DuckDB score replay,
and plan pins."""

import duckdb
from pyspark.sql import functions as F

from firmwarescraper_spark.operators import urlfilter as UF


def test_host_and_suffix_chain(spark):
    df = spark.createDataFrame(
        [("https://User:p@A.B.Example.COM:8443/x?y#z",)], ["url"])
    row = df.select(
        UF.url_host(F.col("url")).alias("h"),
        UF.host_suffix_chain(UF.url_host(F.col("url"))).alias("c"),
    ).collect()[0]
    assert row["h"] == "a.b.example.com"
    assert row["c"] == ["a.b.example.com", "b.example.com", "example.com", "com"]


def test_blocklist_subdomain_semantics(spark):
    df = spark.createDataFrame(
        [("http://a.b.blocked.org/page",),   # subdomain of a blocked domain
         ("http://blocked.org/",),           # the domain itself
         ("http://notblocked.org/",),        # sibling: suffix 'org' not listed
         ("http://fine.example.net/",)],
        ["url"])
    blocked = spark.createDataFrame([("blocked.org",)], ["domain"])
    kept = sorted(r["url"] for r in UF.blocklist_filter(df, blocked).collect())
    assert kept == ["http://fine.example.net/", "http://notblocked.org/"]


def test_keyword_score_hand_values(spark):
    df = spark.createDataFrame(
        [("http://x.com/CASINO/night",),        # hard 1.0
         ("http://x.com/poker?viagra=1",),      # 0.5 + 0.5
         ("http://x.com/torrent",),             # 0.25 survives
         ("http://x.com/blog",)],
        ["url"])
    got = df.select(
        "url", UF.url_keyword_score(F.col("url")).alias("s")).collect()
    by = {r["url"]: r["s"] for r in got}
    assert by["http://x.com/CASINO/night"] == 1.0
    assert by["http://x.com/poker?viagra=1"] == 1.0
    assert by["http://x.com/torrent"] == 0.25
    assert by["http://x.com/blog"] == 0.0
    kept = UF.url_filter(df).collect()
    assert sorted(r["url"] for r in kept) == [
        "http://x.com/blog", "http://x.com/torrent"]


def test_keyword_score_duckdb_replay(spark):
    urls = ["http://x.com/CASINO", "http://x.com/poker?viagra=1",
            "http://x.com/torrent", "http://x.com/free-download/xxx"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    spark_scores = {
        r["url"]: r["s"]
        for r in df.select(
            "url", UF.url_keyword_score(F.col("url")).alias("s")).collect()
    }
    sql = (f"SELECT u, {UF.keyword_score_sql('u')} AS s "
           "FROM (SELECT unnest(?) AS u)")
    for u, s in duckdb.sql(sql, params=[urls]).fetchall():
        assert spark_scores[u] == s, u


def test_url_features(spark):
    df = spark.createDataFrame(
        [("https://a1b2.example.co.uk/x/y/z.html?a=1&b=2&c=3",)], ["url"])
    row = UF.url_features(df).collect()[0]
    assert row["host"] == "a1b2.example.co.uk"
    assert row["tld"] == "uk"
    assert row["path_depth"] == 3
    assert row["n_params"] == 3
    assert row["url_len"] == len(row["url"])
    assert abs(row["host_digit_ratio"] - 2 / 18) < 1e-12


def test_keyword_projection_has_no_exchange(spark):
    df = spark.createDataFrame([("http://x.com/a",)], ["url"])
    plan = df.select(
        UF.url_keyword_score(F.col("url")).alias("s")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_blocklist_joins_carry_keys_not_payload(spark):
    # the payload column must not appear in the exploded suffix subtree
    df = spark.createDataFrame(
        [("http://a.com/", "X" * 10)], ["url", "text"])
    blocked = spark.createDataFrame([("b.com",)], ["domain"])
    plan = UF.blocklist_filter(df, blocked)._jdf.queryExecution() \
        .optimizedPlan().toString()
    gen = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert gen and all("text" not in ln for ln in gen)
