"""Sitemap-XML frontier feeder (sitemaps.org protocol).

The reference's spiders hardcode their seed URLs
(/root/reference/firmware/spiders/*.py ``start_urls``); a web-scale
crawl discovers most of its frontier from robots.txt ``Sitemap:`` lines
(operators/robots.robots_sitemaps harvests those) and the
sitemap/sitemap-index XML they point at. This module parses fetched
sitemap payloads into frontier rows, Spark-first:

* ``sitemap_entries`` — one row per ``<url>`` (kind='url') or
  ``<sitemap>`` (kind='sitemap', a child index to enqueue) block, with
  loc / lastmod / changefreq / priority. The block harvest is
  regexp_extract_all + explode — a narrow generator, NO shuffle: at
  100 TB the parse rides the fetch scan exactly like link extraction
  (functions/html.py). Every regex is in the Java/RE2 common subset
  (no backreferences — url and sitemap blocks are extracted by two
  separate patterns) so the DuckDB oracle replays them verbatim.
* ``sitemap_frontier`` — the enqueue projection: kind='url' rows keyed
  for the frontier (canonical hash via functions/url.url_hash_col is
  applied by the caller's enqueue path), children kind='sitemap' fed
  back as fetch targets — the pagination-fixpoint shape the engine
  already runs for vendor catalogs (plans/rulepacks_vendors.py W4).

Documented contract (same on both engines): tags match
case-insensitively; text nodes are trimmed; entities are not decoded
(same rule as extract.py); ``lastmod`` keeps the raw W3C-datetime
string plus a best-effort DATE from its first 10 chars (try-cast,
NULL on garbage); ``priority``/``changefreq`` are NULL when absent;
ill-formed blocks yield NULL fields, never raise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-safe: two separate block patterns (backreferences are unavailable).
URL_BLOCK_RE = r"(?is)<url>.*?</url>"
SITEMAP_BLOCK_RE = r"(?is)<sitemap>.*?</sitemap>"
LOC_RE = r"(?is)<loc>\s*(.*?)\s*</loc>"
LASTMOD_RE = r"(?is)<lastmod>\s*(.*?)\s*</lastmod>"
CHANGEFREQ_RE = r"(?is)<changefreq>\s*(.*?)\s*</changefreq>"
PRIORITY_RE = r"(?is)<priority>\s*(.*?)\s*</priority>"


def _field(block: Column, pattern: str) -> Column:
    got = F.regexp_extract(block, pattern, 1)
    return F.when(got == "", None).otherwise(got)


def sitemap_entries(
    df: DataFrame,
    xml_col: str = "xml",
    keep_cols: tuple = ("url",),
) -> DataFrame:
    """Explode sitemap XML into typed entry rows. Output columns:
    ``keep_cols`` + (kind, loc, lastmod_raw, lastmod, changefreq,
    priority). Zero shuffle — explode is a narrow generator over the
    scan."""
    xml = F.col(xml_col)
    blocks = F.concat(
        F.transform(
            F.regexp_extract_all(xml, F.lit(URL_BLOCK_RE), 0),
            lambda b: F.struct(F.lit("url").alias("kind"), b.alias("block")),
        ),
        F.transform(
            F.regexp_extract_all(xml, F.lit(SITEMAP_BLOCK_RE), 0),
            lambda b: F.struct(F.lit("sitemap").alias("kind"), b.alias("block")),
        ),
    )
    keep = [F.col(c) for c in keep_cols]
    e = df.select(*keep, F.explode(blocks).alias("e"))
    block = F.col("e.block")
    lastmod_raw = _field(block, LASTMOD_RE)
    return e.select(
        *keep,
        F.col("e.kind").alias("kind"),
        _field(block, LOC_RE).alias("loc"),
        lastmod_raw.alias("lastmod_raw"),
        F.substring(lastmod_raw, 1, 10).try_cast("date").alias("lastmod"),
        _field(block, CHANGEFREQ_RE).alias("changefreq"),
        _field(block, PRIORITY_RE).try_cast("double").alias("priority"),
    )


def sitemap_frontier(entries: DataFrame) -> "tuple[DataFrame, DataFrame]":
    """Split parsed entries into enqueueable URL rows and child
    sitemaps to fetch next round (the W4 pagination-fixpoint shape).
    Priority defaults to the protocol's 0.5; loc-less blocks drop."""
    urls = (
        entries.filter((F.col("kind") == "url") & F.col("loc").isNotNull())
        .withColumn("priority", F.coalesce(F.col("priority"), F.lit(0.5)))
    )
    children = entries.filter(
        (F.col("kind") == "sitemap") & F.col("loc").isNotNull()
    ).select("loc")
    return urls, children
