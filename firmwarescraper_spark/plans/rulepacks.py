"""Declarative per-vendor rule packs — the Spark-side spider logic.

Each rule is a function ``fetched_df -> (children_df | None, items_df | None)``:

  fetched_df columns: url, canon_url, url_hash, host, depth, priority,
                      rule, lineage (map<string,string>), seq,
                      parsed (the parse-once PAGE_STRUCT —
                      functions/html.py)
  children_df columns: url (absolute), rule, lineage, pos (link position —
                       the deterministic ordering key component), depth,
                       parent_seq
  items_df columns:   the FirmwareItem schema with ItemLoader list-wrapping
                      (vendor, device_name, firmware_version, device_class,
                      release_date: array<string>; file_urls: array<string>)
                      — mirror of /root/reference/firmware/items.py:4-12.

Plan shape (the whole point of the ``parsed`` struct): HTML is parsed
EXACTLY ONCE per fetched page per round, inside ``parse_page_udf``;
everything below is JVM array functions (filter/transform/posexplode) and
codegen'd column expressions — zero Python in the per-rule extraction.
Positional joins (J1/J2) use posexplode: position is the join key,
preserving document order exactly (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from firmwarescraper_spark.functions import url as U
from firmwarescraper_spark.functions import versions as V
from firmwarescraper_spark.plans.simulator import (
    AVM_DEVICE_CLASSES,
    LINKSYS_DEVICE_CLASSES,
)


def _ignore_filter(href, prefixes) -> F.Column:
    """F2 prefix-ignore (avm.py:25,33): NOT startswith(any of prefixes)."""
    cond = F.lit(False)
    for p in prefixes:
        cond = cond | href.startswith(p)
    return ~cond


def _children(df: DataFrame, rule: str, lineage=None, form=None) -> DataFrame:
    """Normalize a (child_url, pos[, lineage[, form]]) frame into the
    children schema. ``form`` carries POST form data (S2) — empty map for
    plain GET requests."""
    lineage_col = lineage if lineage is not None else F.col("lineage")
    form_col = form if form is not None else F.create_map().cast("map<string,string>")
    return df.select(
        F.col("child_url").alias("url"),
        F.lit(rule).alias("rule"),
        lineage_col.alias("lineage"),
        F.col("pos").cast("int").alias("pos"),
        (F.col("depth") + 1).alias("depth"),
        F.col("seq").alias("parent_seq"),
        form_col.alias("form_data"),
    )


def _class_case(pairs, product: F.Column) -> F.Column:
    """J3 lookup join as a generated first-match-wins CASE expression
    (declaration order == reference iteration order). Miss -> NULL
    (the reference raises; the engine quarantines — SURVEY.md §2.3 J3)."""
    expr = None
    for prefixes, cls in pairs:
        cond = F.lit(False)
        for p in prefixes:
            cond = cond | product.startswith(p)
        expr = F.when(cond, cls) if expr is None else expr.when(cond, cls)
    return expr


def _wrap_items(df: DataFrame) -> DataFrame:
    """F10 projection to the fixed item schema with ItemLoader
    list-wrapping (items.py:4-12; test_avm.py:111-118)."""
    return df.select(
        F.array("vendor").alias("vendor"),
        F.array("device_name").alias("device_name"),
        F.array("firmware_version").alias("firmware_version"),
        F.array("device_class").alias("device_class"),
        F.array("release_date").alias("release_date"),
        F.array("file_url").alias("file_urls"),
    )


# ---------------------------------------------------------------------------
# AVM (/root/reference/firmware/spiders/avm.py)
# ---------------------------------------------------------------------------

def _explode_links(fetched: DataFrame, ignore: tuple) -> DataFrame:
    """posexplode the page's hrefs with the F2 prefix filter applied and the
    absolute child URL resolved JVM-side."""
    exploded = fetched.select(
        "url", "depth", "seq", "lineage",
        F.posexplode("parsed.hrefs").alias("pos", "href"),
    ).filter(_ignore_filter(F.col("href"), ignore))
    return exploded.withColumn(
        "child_url", U.url_join_col(F.col("url"), F.col("href"))
    )


def avm_parse(fetched: DataFrame):
    """Index page -> product-directory requests (avm.py:24-26)."""
    joined = _explode_links(fetched, ("beta", "tools", "license", ".."))
    return _children(joined, "avm:parse_product"), None


def avm_parse_product(fetched: DataFrame):
    """Directory recursion or leaf firmware extraction, dispatched on the
    URL's leaf directory (avm.py:28-34)."""
    leaf_dir = V.url_path_part_col(F.col("url"), 1)
    dirs = fetched.filter(leaf_dir != "fritz.os")
    leaves = fetched.filter(leaf_dir == "fritz.os")

    children = _children(
        _explode_links(dirs, ("recover", "..")), "avm:parse_product"
    )

    # Leaf: J2 index-aligned link<->date join via posexplode — position is
    # the join key; the 1:1 ordering assumption of avm.py:37-40 is
    # preserved exactly (misalignment when a row lacks a date is reproduced,
    # not fixed).
    dates = F.filter(
        F.transform(F.col("parsed.pre_texts"), V.avm_listing_date_col),
        lambda d: d.isNotNull(),
    )
    filtered_hrefs = F.filter(F.col("parsed.hrefs"), lambda h: ~h.startswith(".."))
    base = leaves.select(
        "url", "seq", dates.alias("dates"),
        F.posexplode(filtered_hrefs).alias("pos", "href"),
        V.url_path_part_col(F.col("url"), 3).alias("device_name"),
    )
    items = (
        base.withColumn("file_url", U.url_join_col(F.col("url"), F.col("href")))
        .filter(F.col("file_url").endswith(".image"))
        .select(
            F.lit("AVM").alias("vendor"),
            F.col("device_name"),
            V.avm_version_col(
                V.url_basename_col(F.col("file_url")), F.col("device_name")
            ).alias("firmware_version"),
            F.coalesce(
                _class_case(AVM_DEVICE_CLASSES, F.col("device_name")), F.lit("Router")
            ).alias("device_class"),
            F.get(F.col("dates"), F.col("pos")).alias("release_date"),
            F.col("file_url"),
        )
    )
    return children, _wrap_items(items)


# ---------------------------------------------------------------------------
# Linksys (/root/reference/firmware/spiders/linksys.py)
# ---------------------------------------------------------------------------

def linksys_parse(fetched: DataFrame):
    """Sitemap: positional zip join of product hrefs x device names
    (linksys.py:68-72, J1) — lineage carries device_name downstream (J6)."""
    item_anchors = F.filter(
        F.col("parsed.anchors"),
        lambda a: F.array_contains(a["div_classes"], "item") & a["href"].isNotNull(),
    )
    exploded = fetched.select(
        "url", "depth", "seq", F.posexplode(item_anchors).alias("pos", "a")
    )
    joined = exploded.withColumn(
        "child_url", U.url_join_col(F.col("url"), F.col("a.href"))
    )
    lineage = F.create_map(F.lit("device_name"), F.col("a.text"))
    return _children(joined, "linksys:parse_product", lineage), None


def linksys_parse_product(fetched: DataFrame):
    """First 'Download Software' anchor -> versions page (linksys.py:74-78,
    W2 first-match-in-list via element_at(filter(...), 1))."""
    first_dl = F.try_element_at(
        F.filter(
            F.col("parsed.anchors"),
            lambda a: F.array_contains(a["div_classes"], "support-downloads")
            & (a["title"] == "Download Software") & a["href"].isNotNull(),
        ),
        F.lit(1),
    )
    hit = fetched.select(
        "url", "depth", "seq", "lineage", first_dl["href"].alias("href")
    ).filter(F.col("href").isNotNull())
    joined = hit.withColumn(
        "child_url", U.url_join_col(F.col("url"), F.col("href"))
    ).withColumn("pos", F.lit(0))
    return _children(joined, "linksys:parse_versions"), None


def linksys_parse_versions(fetched: DataFrame):
    """Accordion blocks -> firmware items (linksys.py:80-124): line-scoped
    Ver..href span regex, extension predicate, scalar rule pack, and the
    per-block PRODUCT_DICTIONARIES dedup (A1) as dropDuplicates scoped by
    (page, block)."""
    blocks = F.transform(
        F.filter(
            F.col("parsed.divs"),
            lambda d: F.array_contains(d["classes"], "article-accordian-content")
            & (d["parent_id"] == "support-article-downloads"),
        ),
        lambda d: d["html"],
    )
    spans = fetched.select(
        "url", "seq", "lineage",
        F.posexplode(blocks).alias("block_pos", "block"),
    ).select(
        "url", "seq", "lineage", "block_pos",
        F.explode(
            F.regexp_extract_all(
                F.col("block"), F.lit(r'Ver.+href=".+(?:bin|img)"'), F.lit(0)
            )
        ).alias("fw"),
    ).filter(F.col("fw").rlike(r"(\.img|\.bin)"))

    device = F.col("lineage")["device_name"]
    meta = spans.select(
        "url", "block_pos",
        F.lit("Linksys").alias("vendor"),
        device.alias("device_name"),
        V.linksys_version_col(F.col("fw")).alias("firmware_version"),
        _class_case(LINKSYS_DEVICE_CLASSES, device).alias("device_class"),
        V.linksys_date_col(F.col("fw")).alias("release_date"),
        V.linksys_file_url_col(F.col("fw")).alias("file_url"),
    )
    # J3 class-map miss: the reference raises UnknownDeviceClassException
    # (linksys.py:126-133), which scrapy logs and drops. The engine routes
    # the offending rows to the auditable quarantine table instead of
    # silently losing them (schema: CrawlEngine.quarantine()).
    quarantine = (
        meta.filter(F.col("device_class").isNull())
        .select(
            "url",
            F.lit("linksys:parse_versions").alias("rule"),
            F.lit("unknown_device_class").alias("reason"),
            F.col("device_name").alias("detail"),
        )
        .dropDuplicates(["url", "detail"])
    )
    kept = meta.filter(F.col("device_class").isNotNull())

    deduped = kept.dropDuplicates(
        ["url", "block_pos", "vendor", "device_name", "firmware_version",
         "device_class", "release_date", "file_url"]
    )
    return None, _wrap_items(deduped), quarantine


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

RULES = {
    "avm:parse": avm_parse,
    "avm:parse_product": avm_parse_product,
    "linksys:parse": linksys_parse,
    "linksys:parse_product": linksys_parse_product,
    "linksys:parse_versions": linksys_parse_versions,
}

# PAGE_STRUCT fields each rule pack actually reads from `parsed` — the
# parse UDF trims its per-row output to this set (functions/html.py
# parse_page_udf), which cuts the Arrow struct conversion + executor
# cache to a fraction for the listing-shaped rules that dominate a
# crawl round. Vendor rules merge their own map in via
# _register_vendor_rules (rulepacks_vendors.VENDOR_PARSE_FIELDS); a
# rule absent from the merged map parses in full, so forgetting to map
# a new rule costs speed, never correctness. Keep in sync with the
# `parsed.` references in the rule functions.
RULE_PARSE_FIELDS = {
    "avm:parse": ("hrefs",),
    "avm:parse_product": ("hrefs", "pre_texts"),
    "linksys:parse": ("anchors",),
    "linksys:parse_product": ("anchors",),
    "linksys:parse_versions": ("divs",),
}


def _register_vendor_rules():
    """Deferred import: rulepacks_vendors imports helpers from this module."""
    from firmwarescraper_spark.plans.rulepacks_vendors import (
        VENDOR_HOST_PATTERNS,
        VENDOR_PARSE_FIELDS,
        VENDOR_RULES,
    )

    RULES.update(VENDOR_RULES)
    RULE_PARSE_FIELDS.update(VENDOR_PARSE_FIELDS)
    ALLOWED_HOST_PATTERNS.update(VENDOR_HOST_PATTERNS)

# F8 offsite filter — allowed_domains per spider family as host regexes
# (avm.py:16; linksys implicit single host; mirror hosts for the bench
# corpus's many-host shape, sources/generate.py).
ALLOWED_HOST_PATTERNS = {
    "avm": r"^(download\.avm\.de|mirror-\d+\.avm-mirror\.example)$",
    "linksys": r"^www\.linksys\.com$",
}


def allowed_host_pattern(rule: str) -> str:
    return ALLOWED_HOST_PATTERNS[rule.split(":", 1)[0]]


_register_vendor_rules()
