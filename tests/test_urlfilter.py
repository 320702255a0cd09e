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


def test_trap_signals_hand_values(spark):
    # calendar trap: 25 URLs, one /cal/N/N template
    cal = [(f"https://trap.cal.org/cal/2024/{i % 12}/{i}",) for i in range(25)]
    # symlink cycle: one segment repeats 3 times
    cyc = [("https://trap.cyc.org/a/b/a/b/a/b/page",)]
    # runaway depth: 13 segments
    deep = [("https://trap.deep.org/" + "/".join(f"d{c}" for c in "abcdefghijklm"),)]
    # clean host: letter slugs, template ratio 1.0
    ok = [(f"https://fine.org/post/{'x' * (i + 1)}",) for i in range(25)]
    df = spark.createDataFrame(cal + cyc + deep + ok, ["url"])
    rows = {r["host"]: r for r in UF.trap_signals(df, min_urls=10).collect()}

    cal_r = rows["trap.cal.org"]
    assert cal_r["n_urls"] == 25 and cal_r["n_templates"] == 1
    assert cal_r["url_template_ratio"] == 25.0 and cal_r["is_trap"]

    cyc_r = rows["trap.cyc.org"]
    assert cyc_r["max_segment_repeat"] == 3 and cyc_r["is_trap"]

    deep_r = rows["trap.deep.org"]
    assert deep_r["max_depth"] == 13 and deep_r["is_trap"]

    ok_r = rows["fine.org"]
    assert ok_r["url_template_ratio"] == 1.0
    assert ok_r["max_segment_repeat"] == 1 and not ok_r["is_trap"]


def test_trap_filter_drops_trapped_hosts_only(spark):
    urls = [(f"https://trap.cal.org/cal/2024/{i % 12}/{i}",) for i in range(25)]
    urls += [(f"https://fine.org/post/{'x' * (i + 1)}",) for i in range(5)]
    df = spark.createDataFrame(urls, ["url"])
    kept = UF.trap_filter(df, min_urls=10).collect()
    assert len(kept) == 5
    assert all(r["url"].startswith("https://fine.org/") for r in kept)


def test_trap_filter_broadcasts_host_set(spark):
    df = spark.createDataFrame([("https://fine.org/post/x",)], ["url"])
    plan = UF.trap_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


# ---------------------------------------------------------------------------
# mirror-host detection
# ---------------------------------------------------------------------------


def _pf(spark, rows):
    return spark.createDataFrame(rows, "host string, fp string")


def test_mirror_hosts_detects_pair(spark):
    from firmwarescraper_spark.operators.urlfilter import mirror_hosts

    rows = [("a", f"f{i}") for i in range(10)]
    rows += [("b", f"f{i}") for i in range(5)]       # b mirrors half of a
    rows += [("c", f"g{i}") for i in range(10)]      # disjoint host
    out = {
        (r["host1"], r["host2"]): (r["shared"], r["n1"], r["n2"], r["jaccard"])
        for r in mirror_hosts(
            _pf(spark, rows), min_shared=3, min_jaccard=0.2
        ).collect()
    }
    assert out == {("a", "b"): (5, 10, 5, 0.5)}


def test_mirror_hosts_thresholds(spark):
    from firmwarescraper_spark.operators.urlfilter import mirror_hosts

    rows = [("a", f"f{i}") for i in range(10)]
    rows += [("b", "f0"), ("b", "f1")]               # shared=2 < min_shared
    rows += [("c", f"f{i}") for i in range(3)]       # shared=3 passes count
    rows += [("c", f"x{i}") for i in range(40)]      # ...but jaccard 3/50
    out = mirror_hosts(_pf(spark, rows), min_shared=3, min_jaccard=0.2)
    assert out.count() == 0


def test_mirror_hosts_caps_boilerplate_fp(spark):
    from firmwarescraper_spark.operators.urlfilter import mirror_hosts

    # one fingerprint on 20 hosts (> cap 16): boilerplate, contributes to
    # no pair; without the cap every one of C(20,2)=190 pairs would appear
    rows = [(f"h{i}", "BOILER") for i in range(20)]
    rows += [("h0", "f1"), ("h0", "f2"), ("h0", "f3"),
             ("h1", "f1"), ("h1", "f2"), ("h1", "f3")]
    out = {
        (r["host1"], r["host2"]): r["shared"]
        for r in mirror_hosts(
            _pf(spark, rows), min_shared=3, min_jaccard=0.2
        ).collect()
    }
    # the real mirror pair survives with shared=3 (BOILER excluded)
    assert out == {("h0", "h1"): 3}


def test_mirror_hosts_duplicate_observations_collapse(spark):
    from firmwarescraper_spark.operators.urlfilter import mirror_hosts

    # repeated (host, fp) observations (many URLs, same content) count once
    rows = [("a", "f1")] * 5 + [("b", "f1")] * 3
    rows += [("a", "f2"), ("b", "f2"), ("a", "f3"), ("b", "f3")]
    out = mirror_hosts(_pf(spark, rows), min_shared=3, min_jaccard=0.2)
    r = out.collect()[0]
    assert (r["shared"], r["n1"], r["n2"], r["jaccard"]) == (3, 3, 3, 1.0)
