"""CDX URL-index source/sink, SURT canonicalization, and sitemap parsing
(sources/cdx.py, sources/sitemaps.py): golden hand values, round trips,
malformed-input tolerance, DuckDB-replay parity, and plan pins."""

import duckdb
import pytest
from pyspark.sql import functions as F

from firmwarescraper_spark.sources import cdx as C
from firmwarescraper_spark.sources import sitemaps as S

SURT_GOLDENS = [
    # (url, surt) — lowercase, www-strip, default-port strip, query sort,
    # fragment strip, userinfo strip, empty path -> '/'
    ("https://WWW.Example.COM:443/Foo/Bar?b=2&a=1#frag",
     "com,example)/foo/bar?a=1&b=2"),
    ("http://example.com:8080/", "com,example:8080)/"),
    ("http://user:pw@Sub.Example.org/p?x=", "org,example,sub)/p?x="),
    ("ftp://www2.example.net", "net,example)/"),
    ("https://ex.com/a?z&y=3&y=1", "com,ex)/a?y=1&y=3&z"),
    ("http://a.b.example.co.uk/deep/", "uk,co,example,b,a)/deep/"),
]


def _surt(spark, url):
    df = spark.createDataFrame([(url,)], ["url"])
    return df.select(C.surt_key(F.col("url")).alias("s")).collect()[0]["s"]


@pytest.mark.parametrize("url,expected", SURT_GOLDENS)
def test_surt_golden(spark, url, expected):
    assert _surt(spark, url) == expected


@pytest.mark.parametrize("url,expected", SURT_GOLDENS)
def test_surt_duckdb_replay(url, expected):
    got = duckdb.sql(
        f"WITH t(u) AS (VALUES (?)) SELECT {C.surt_sql('u')} FROM t",
        params=[url],
    ).fetchone()[0]
    assert got == expected


def _pages(spark):
    return spark.createDataFrame(
        [("https://WWW.Example.COM/Foo?b=2&a=1", "2024-01-15 10:30:00"),
         ("http://other.net/x", "2024-03-02 00:00:07")],
        ["url", "ts"],
    ).withColumn("warc_ts", F.to_timestamp("ts")).drop("ts")


def test_cdx_roundtrip(spark):
    pages = _pages(spark)
    back = C.parse_cdx(C.to_cdx(pages)).orderBy("surt").collect()
    assert [r["surt"] for r in back] == [
        "com,example)/foo?a=1&b=2", "net,other)/x"]
    assert [r["url"] for r in back] == [
        "https://WWW.Example.COM/Foo?b=2&a=1", "http://other.net/x"]
    assert str(back[0]["warc_ts"]) == "2024-01-15 10:30:00"
    assert back[0]["status"] == 200 and back[0]["mime"] == "text/html"
    assert back[0]["digest"].startswith("sha1:")
    assert back[0]["length"] == 0 and back[0]["filename"] == "crawl.warc.gz"


def test_cdx_explicit_fields_and_escaping(spark):
    pages = _pages(spark).limit(1).select(
        "url", "warc_ts",
        F.lit("application/json").alias("mime"),
        F.lit(404).alias("status"),
        F.lit('we"ird\\name.warc.gz').alias("filename"),
        F.lit(123).alias("length"),
    )
    row = C.parse_cdx(C.to_cdx(pages)).collect()[0]
    assert row["mime"] == "application/json"
    assert row["status"] == 404
    assert row["length"] == 123
    assert row["filename"] == 'we"ird\\name.warc.gz'


def test_cdx_malformed_lines_never_raise(spark):
    bad = spark.createDataFrame(
        [("garbage",), ("x 20240101120000 {notjson",),
         ("surt 2024 {}",), ("",)],
        ["cdx_line"],
    )
    rows = C.parse_cdx(bad).collect()
    assert len(rows) == 4
    assert all(r["url"] is None for r in rows)
    # only the line with a valid 14-digit ts gets a timestamp
    assert sum(r["warc_ts"] is not None for r in rows) == 1


def test_cdx_index_latest_capture(spark):
    caps = spark.createDataFrame(
        [("http://a.com/", "2024-01-01 00:00:00", "old"),
         ("http://A.com/", "2024-06-01 00:00:00", "new"),
         ("http://b.com/", "2024-02-01 00:00:00", "only")],
        ["url", "ts", "digest"],
    ).withColumn("warc_ts", F.to_timestamp("ts")).drop("ts")
    idx = C.cdx_index(C.parse_cdx(C.to_cdx(caps))).orderBy("surt").collect()
    assert [(r["surt"], r["n_captures"], r["last_digest"]) for r in idx] == [
        ("com,a)/", 2, "new"), ("com,b)/", 1, "only")]


def test_anti_join_cdx(spark):
    idx = C.cdx_index(C.parse_cdx(C.to_cdx(_pages(spark))))
    frontier = spark.createDataFrame(
        [("HTTPS://www.example.com/Foo?a=1&b=2",),  # same surt, messier url
         ("http://fresh.example/",)],
        ["url"],
    )
    kept = C.anti_join_cdx(frontier, idx).collect()
    assert [r["url"] for r in kept] == ["http://fresh.example/"]
    assert kept[0].asDict().keys() == {"url"}  # helper column dropped


SITEMAP = (
    '<?xml version="1.0"?><urlset>'
    "<url><loc> https://ex.com/a </loc>"
    "<lastmod>2024-01-15T10:30:00+00:00</lastmod>"
    "<priority>0.8</priority></url>"
    "<url><LOC>https://ex.com/b</LOC><changefreq>daily</changefreq></url>"
    "<url><lastmod>2024-05-05</lastmod></url>"  # loc-less: parses, not enqueued
    "</urlset>"
)
SITEMAP_INDEX = (
    "<sitemapindex><sitemap><loc>https://ex.com/s1.xml</loc>"
    "<lastmod>2024-02-01</lastmod></sitemap></sitemapindex>"
)


def test_sitemap_entries_golden(spark):
    df = spark.createDataFrame(
        [("u1", SITEMAP), ("u2", SITEMAP_INDEX)], ["url", "xml"])
    rows = S.sitemap_entries(df).orderBy("kind", "loc").collect()
    by = {(r["kind"], r["loc"]): r for r in rows}
    assert len(rows) == 4
    a = by[("url", "https://ex.com/a")]
    assert str(a["lastmod"]) == "2024-01-15"
    assert a["lastmod_raw"] == "2024-01-15T10:30:00+00:00"
    assert a["priority"] == 0.8 and a["changefreq"] is None
    b = by[("url", "https://ex.com/b")]  # case-insensitive tags
    assert b["changefreq"] == "daily" and b["lastmod"] is None
    child = by[("sitemap", "https://ex.com/s1.xml")]
    assert str(child["lastmod"]) == "2024-02-01"
    assert ("url", None) in by  # loc-less block survives parse


def test_sitemap_frontier_split(spark):
    df = spark.createDataFrame(
        [("u1", SITEMAP), ("u2", SITEMAP_INDEX)], ["url", "xml"])
    urls, children = S.sitemap_frontier(S.sitemap_entries(df))
    u = urls.orderBy("loc").collect()
    assert [r["loc"] for r in u] == ["https://ex.com/a", "https://ex.com/b"]
    assert [r["priority"] for r in u] == [0.8, 0.5]  # protocol default
    assert [r["loc"] for r in children.collect()] == ["https://ex.com/s1.xml"]


def test_sitemap_garbage_never_raises(spark):
    df = spark.createDataFrame(
        [("u", "<url><loc>x</loc><priority>high</priority>"
               "<lastmod>soon</lastmod></url>")],
        ["url", "xml"])
    row = S.sitemap_entries(df).collect()[0]
    assert row["priority"] is None and row["lastmod"] is None
    assert row["lastmod_raw"] == "soon"


def test_parse_and_sitemap_plans_have_no_exchange(spark):
    pages = _pages(spark)
    parse_plan = C.parse_cdx(C.to_cdx(pages))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in parse_plan
    sm = spark.createDataFrame([("u1", SITEMAP)], ["url", "xml"])
    sm_plan = S.sitemap_entries(sm)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in sm_plan


ROBOTS = (
    "User-agent: *\nDisallow: /private\n"
    "Sitemap: https://ex.com/s0.xml\n"
    "User-agent: bot\nDisallow: /\n"
    "SITEMAP: https://ex.com/s1.xml  # trailing comment\n"
)


def test_robots_sitemaps_harvest(spark):
    from firmwarescraper_spark.operators.robots import robots_sitemaps

    pages = spark.createDataFrame(
        [("http://ex.com:8080/robots.txt", ROBOTS.encode()),
         ("http://other.net/robots.txt", b"User-agent: *\nAllow: /"),
         ("http://ex.com/page.html", b"Sitemap: https://decoy.xml")],
        ["url", "html"],
    )
    rows = robots_sitemaps(pages).orderBy("sitemap_url").collect()
    # group-independent (RFC 9309): the line inside the foreign-agent
    # group is harvested too; non-robots pages are not; port stripped
    # to match the frontier host key
    assert [(r["host"], r["sitemap_url"]) for r in rows] == [
        ("ex.com", "https://ex.com/s0.xml"),
        ("ex.com", "https://ex.com/s1.xml"),
    ]


def test_discovery_path_robots_to_frontier(spark):
    """End-to-end seed discovery: robots.txt Sitemap lines -> fetch the
    sitemap payloads (corpus join, the sandbox fetch stage) -> parse ->
    enqueueable frontier rows + child sitemaps."""
    from firmwarescraper_spark.operators.robots import robots_sitemaps

    corpus = spark.createDataFrame(
        [("http://ex.com/robots.txt", ROBOTS.encode()),
         ("https://ex.com/s0.xml", SITEMAP.encode()),
         ("https://ex.com/s1.xml", SITEMAP_INDEX.encode())],
        ["url", "html"],
    )
    declared = robots_sitemaps(corpus)
    fetched = declared.join(
        corpus.select(F.col("url").alias("sitemap_url"),
                      F.col("html").cast("string").alias("xml")),
        on="sitemap_url",
    )
    urls, children = S.sitemap_frontier(
        S.sitemap_entries(fetched, keep_cols=("host", "sitemap_url")))
    assert sorted(r["loc"] for r in urls.collect()) == [
        "https://ex.com/a", "https://ex.com/b"]
    # the sitemap-index child comes back as a next-round fetch target —
    # the W4 pagination-fixpoint shape
    assert [r["loc"] for r in children.collect()] == ["https://ex.com/s1.xml"]


def test_cdx_index_single_aggregate_exchange(spark):
    idx = C.cdx_index(C.parse_cdx(C.to_cdx(_pages(spark))))
    plan = idx._jdf.queryExecution().executedPlan().toString()
    # one hash-partitioned exchange for the struct-max agg, nothing else
    assert plan.count("Exchange") == 1
    assert "partial_max" in plan or "partial" in plan.lower()


def test_recrawl_priority(spark):
    urls = spark.createDataFrame(
        [("http://static.com/",), ("http://hot.com/",), ("http://half.com/",)],
        ["url"])

    def cap(year, digests):
        return urls.withColumn(
            "warc_ts", F.to_timestamp(F.lit(f"{year}-01-01 00:00:00"))
        ).withColumn(
            "digest",
            F.element_at(
                F.map_from_arrays(
                    F.array(*[F.lit(u) for u in digests]),
                    F.array(*[F.lit(d) for d in digests.values()]),
                ), F.col("url")),
        )

    caps = (
        cap(2024, {"http://static.com/": "s1", "http://hot.com/": "h1",
                   "http://half.com/": "m1"})
        .unionByName(cap(2025, {"http://static.com/": "s1",
                                "http://hot.com/": "h2",
                                "http://half.com/": "m1"}))
        .unionByName(cap(2026, {"http://static.com/": "s1",
                                "http://hot.com/": "h3",
                                "http://half.com/": "m2"}))
    )
    out = C.recrawl_priority(C.parse_cdx(C.to_cdx(caps))).collect()
    by = {r["surt"]: r for r in out}
    assert by["com,static)/"]["change_rate"] == 0.0
    assert by["com,hot)/"]["change_rate"] == 1.0
    assert by["com,half)/"]["change_rate"] == 0.5
    assert all(r["n_captures"] == 3 for r in out)
    assert str(by["com,hot)/"]["last_ts"]) == "2026-01-01 00:00:00"


def test_recrawl_priority_single_capture_rate_zero(spark):
    one = spark.createDataFrame([("http://a.com/",)], ["url"]).withColumn(
        "warc_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    row = C.recrawl_priority(C.parse_cdx(C.to_cdx(one))).collect()[0]
    assert row["n_captures"] == 1 and row["change_rate"] == 0.0


def test_recrawl_priority_single_aggregate_exchange(spark):
    one = spark.createDataFrame([("http://a.com/",)], ["url"]).withColumn(
        "warc_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    plan = C.recrawl_priority(C.parse_cdx(C.to_cdx(one))) \
        ._jdf.queryExecution().executedPlan().toString()
    # count+count-distinct compiles to the two-phase distinct-aggregate
    # plan: exchanges keyed by surt only (expand for the distinct), and
    # none carrying the payload
    assert 0 < plan.count("Exchange") <= 2


# ---------------------------------------------------------------------------
# crawl-over-crawl snapshot diff
# ---------------------------------------------------------------------------


def _snap(spark, rows):
    return spark.createDataFrame(rows, "surt string, last_digest string")


def test_crawl_diff_statuses(spark):
    from firmwarescraper_spark.sources.cdx import crawl_diff

    old = _snap(spark, [
        ("com,a)/1", "d1"), ("com,a)/2", "d2"), ("com,b)/3", "d3"),
    ])
    new = _snap(spark, [
        ("com,a)/1", "d1"),            # unchanged
        ("com,a)/2", "d2x"),           # changed
        ("com,b)/4", "d4"),            # added; /3 removed
    ])
    out = {r["surt"]: (r["host"], r["change"])
           for r in crawl_diff(old, new).collect()}
    assert out == {
        "com,a)/1": ("com,a", "unchanged"),
        "com,a)/2": ("com,a", "changed"),
        "com,b)/3": ("com,b", "removed"),
        "com,b)/4": ("com,b", "added"),
    }


def test_crawl_diff_null_digest_presence(spark):
    from firmwarescraper_spark.sources.cdx import crawl_diff

    # presence comes from explicit markers: a NULL digest on both sides
    # is 'unchanged', NULL vs value is 'changed' — never 'added'/'removed'
    old = _snap(spark, [("com,a)/1", None), ("com,a)/2", None)])
    new = _snap(spark, [("com,a)/1", None), ("com,a)/2", "d")])
    out = {r["surt"]: r["change"] for r in crawl_diff(old, new).collect()}
    assert out == {"com,a)/1": "unchanged", "com,a)/2": "changed"}


def test_crawl_diff_summary(spark):
    from firmwarescraper_spark.sources.cdx import (
        crawl_diff, crawl_diff_summary)

    old = _snap(spark, [
        ("com,a)/1", "d1"), ("com,a)/2", "d2"), ("com,a)/3", "d3"),
        ("com,b)/1", "e1"),
    ])
    new = _snap(spark, [
        ("com,a)/1", "d1"), ("com,a)/2", "D2"), ("com,a)/4", "d4"),
        ("com,b)/1", "e1"),
    ])
    out = {
        r["host"]: (r["n_added"], r["n_removed"], r["n_changed"],
                    r["n_unchanged"], r["n_total"])
        for r in crawl_diff_summary(crawl_diff(old, new)).collect()
    }
    assert out == {"com,a": (1, 1, 1, 1, 4), "com,b": (0, 0, 0, 1, 1)}
