"""Common-Crawl URL-index (CDX) source/sink + SURT canonicalization.

The reference's scrapy engine consults only its in-process dupefilter to
decide whether a URL was already fetched (scrapy RFPDupeFilter — the
engine analogue is operators/frontier.anti_join_seen). At web scale the
*cross-crawl* version of that question is answered by the crawl's URL
index: Common Crawl publishes one as CDX-JSON ("CDXJ") lines, keyed by
the SURT form of the URL. This module implements that wire format and
key, Spark-first:

* ``surt_key`` — Sort-friendly URI Reordering Transform (the public
  SURT convention used by CC/Wayback: reversed comma-joined host
  labels, ``)`` separator, sorted query). Pure column algebra (lower/
  regexp/split/array_sort), zero shuffle; every regex is in the
  Java/RE2 common subset so DuckDB replays it verbatim (``surt_sql``
  emits the equivalent SQL for oracles).
* ``to_cdx`` / ``parse_cdx`` — emit and parse CDXJ index lines
  (``<surt> <ts14> {"url": ..., "mime": ..., "status": ..., "digest":
  ..., "length": ..., "offset": ..., "filename": ...}``, CC's exact
  field layout with numbers-as-strings). Both are single projections
  over the scan (zero Exchange); malformed lines parse to NULL fields
  via try_-casts, never raise.
* ``cdx_index`` — collapse captures to the latest snapshot per SURT
  via one map-side-combinable struct-max aggregation (the
  dedup_keep_best pattern — no window, no sort). At 10^10 captures the
  shuffle carries one fixed-width struct per distinct URL.
* ``anti_join_cdx`` — frontier rows whose SURT key is absent from the
  index: "don't refetch what a previous crawl already captured" — the
  cross-crawl twin of frontier.anti_join_seen, and the join is
  exchange-free on the index side when the index is stored bucketed by
  ``surt`` (frontier.write_bucketed).

Documented contract (same on both engines): the whole URL is
lowercased (CC's canonicalizer does); fragments, userinfo, a leading
``www\\d*.`` host label, and default ports (80/443/21) are dropped;
non-default ports survive as ``host_rev:port)``; query params sort
bytewise with blank values kept; a trailing bare ``?`` is dropped;
entity/percent decoding is NOT attempted (keys compare encoded-form
equal, which is stable — the fetch path still uses the original URL
per the r4 fix in plans/fetchers.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java/RE2 common subset only (no backreferences, no lookaround).
_SCHEME_RE = r"^[a-z][a-z0-9+.-]*://"
_FRAG_RE = r"#.*$"
_USERINFO_RE = r"^[^@/]*@"
_AUTH_RE = r"^([^/?]*)"
_WWW_RE = r"^www\d*\."
_DEFAULT_PORTS = ("80", "443", "21")

TS14_FMT = "yyyyMMddHHmmss"


def surt_key(url: Column) -> Column:
    """SURT form of *url* — e.g. ``https://WWW.Example.COM/Foo?b=2&a=1``
    -> ``com,example)/foo?a=1&b=2``. One projection, no shuffle."""
    u = F.lower(F.trim(url))
    u = F.regexp_replace(u, _FRAG_RE, "")
    u = F.regexp_replace(u, _SCHEME_RE, "")
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    pathq = F.regexp_replace(u, r"^[^/?]*", "")
    host = F.regexp_replace(auth, _USERINFO_RE, "")
    port = F.regexp_extract(host, r":(\d+)$", 1)
    hostname = F.regexp_replace(host, r":\d+$", "")
    hostname = F.regexp_replace(hostname, _WWW_RE, "")
    rev = F.array_join(F.reverse(F.split(hostname, r"\.")), ",")
    portpart = F.when(
        (port == "") | port.isin(*_DEFAULT_PORTS), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    qpart = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")), "&"))
    )
    return F.concat(rev, portpart, F.lit(")"), path, qpart)


def surt_sql(expr: str) -> str:
    """DuckDB SQL replaying ``surt_key`` over the SQL expression *expr*
    — identical regexes (both engines are RE2-compatible on this
    subset), list_reverse/list_sort for the array steps. Used by the
    driver oracles."""
    u = f"regexp_replace(regexp_replace(lower(trim({expr})), '#.*$', ''), '^[a-z][a-z0-9+.-]*://', '')"
    auth = f"regexp_extract({u}, '^([^/?]*)', 1)"
    pathq = f"regexp_replace({u}, '^[^/?]*', '')"
    host = f"regexp_replace({auth}, '^[^@/]*@', '')"
    port = f"regexp_extract({host}, ':(\\d+)$', 1)"
    hostname = f"regexp_replace(regexp_replace({host}, ':\\d+$', ''), '^www\\d*\\.', '')"
    rev = f"array_to_string(list_reverse(string_split({hostname}, '.')), ',')"
    portpart = (
        f"CASE WHEN {port} = '' OR {port} IN ('80','443','21') THEN '' "
        f"ELSE ':' || {port} END"
    )
    path = f"CASE WHEN regexp_extract({pathq}, '^([^?]*)', 1) = '' THEN '/' ELSE regexp_extract({pathq}, '^([^?]*)', 1) END"
    query = f"regexp_extract({pathq}, '\\?(.*)$', 1)"
    qpart = (
        f"CASE WHEN {query} = '' THEN '' "
        f"ELSE '?' || array_to_string(list_sort(string_split({query}, '&')), '&') END"
    )
    return f"({rev} || {portpart} || ')' || {path} || {qpart})"


def _json_escape(c: Column) -> Column:
    """Minimal JSON string escaping (backslash then quote) — CC index
    fields are URLs/digests/mimes, so this covers the value space; the
    order (backslash first) makes the pair composable."""
    return F.regexp_replace(
        F.regexp_replace(c, r"\\", r"\\\\"), '"', r'\\"'
    )


def to_cdx(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    line_col: str = "cdx_line",
) -> DataFrame:
    """Emit one CDXJ index line per row. Expects (url, warc_ts) plus
    optional mime/status/digest/length/offset/filename columns (CC
    layout, numbers-as-strings; sensible defaults when absent). Single
    projection — at 100 TB the index emit rides the capture scan."""
    cols = set(df.columns)

    def opt(name: str, default: Column) -> Column:
        return _json_escape(F.coalesce(
            F.col(name).cast("string") if name in cols else F.lit(None).cast("string"),
            default,
        ))

    fields = [
        ("url", _json_escape(F.col(url_col))),
        ("mime", opt("mime", F.lit("text/html"))),
        ("status", opt("status", F.lit("200"))),
        ("digest", opt("digest", F.concat(F.lit("sha1:"), F.md5(F.col(url_col))))),
        ("length", opt("length", F.lit("0"))),
        ("offset", opt("offset", F.lit("0"))),
        ("filename", opt("filename", F.lit("crawl.warc.gz"))),
    ]
    body = []
    for i, (k, v) in enumerate(fields):
        body.append(F.lit(('' if i == 0 else ', ') + f'"{k}": "'))
        body.append(v)
        body.append(F.lit('"'))
    line = F.concat(
        surt_key(F.col(url_col)),
        F.lit(" "),
        F.date_format(F.col(ts_col), TS14_FMT),
        F.lit(" {"),
        *body,
        F.lit("}"),
    )
    return df.withColumn(line_col, line)


def parse_cdx(df: DataFrame, line_col: str = "cdx_line") -> DataFrame:
    """Parse CDXJ lines to typed columns (surt, warc_ts, url, mime,
    status, digest, length, offset, filename). Zero shuffle; malformed
    lines yield NULL fields (try_-casts), never raise — the 64k-file
    index of a real crawl always has truncated tails."""
    line = F.col(line_col)
    surt = F.regexp_extract(line, r"^(\S+) ", 1)
    ts14 = F.regexp_extract(line, r"^\S+ (\d{14}) ", 1)
    js = F.regexp_extract(line, r"^\S+ \d{14} (\{.*\})$", 1)

    def jfield(name: str) -> Column:
        return F.get_json_object(js, f"$.{name}")

    return df.select(
        F.when(surt == "", None).otherwise(surt).alias("surt"),
        F.try_to_timestamp(
            F.when(ts14 == "", None).otherwise(ts14), F.lit(TS14_FMT)
        ).alias("warc_ts"),
        jfield("url").alias("url"),
        jfield("mime").alias("mime"),
        jfield("status").try_cast("int").alias("status"),
        jfield("digest").alias("digest"),
        jfield("length").try_cast("bigint").alias("length"),
        jfield("offset").try_cast("bigint").alias("offset"),
        jfield("filename").alias("filename"),
    )


def cdx_index(parsed: DataFrame) -> DataFrame:
    """Latest capture per SURT: one struct-max aggregation (map-side
    combinable — the dedup_keep_best pattern; never a window over the
    capture log). Output: (surt, n_captures, last_ts, last_status,
    last_digest, last_url)."""
    best = F.max(
        F.struct(
            F.col("warc_ts").alias("ts"),
            F.col("status").alias("status"),
            F.col("digest").alias("digest"),
            F.col("url").alias("url"),
        )
    ).alias("best")
    return (
        parsed.filter(F.col("surt").isNotNull())
        .groupBy("surt")
        .agg(F.count(F.lit(1)).alias("n_captures"), best)
        .select(
            "surt",
            "n_captures",
            F.col("best.ts").alias("last_ts"),
            F.col("best.status").alias("last_status"),
            F.col("best.digest").alias("last_digest"),
            F.col("best.url").alias("last_url"),
        )
    )


def anti_join_cdx(
    frontier: DataFrame, index: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Frontier rows not yet captured by a previous crawl: left-anti
    join on the SURT key. With the index stored bucketed by ``surt``
    (frontier.write_bucketed), the corpus-sized side needs no exchange
    — only the round's frontier shuffles, exactly like the incremental
    near-dup path (operators/dedup.incremental_lsh_pairs)."""
    keyed = frontier.withColumn("_surt", surt_key(F.col(url_col)))
    return (
        keyed.join(
            index.select(F.col("surt").alias("_surt")),
            on="_surt",
            how="left_anti",
        ).drop("_surt")
    )


def recrawl_priority(parsed: DataFrame) -> DataFrame:
    """Freshness-aware recrawl scheduling over the capture log (the
    Cho/Garcia-Molina change-frequency estimator, uniform-interval
    form): per SURT, the fraction of revisits that observed a NEW
    content digest — URLs that change every visit float to the top of
    the refetch frontier, static ones sink. One aggregation keyed by
    surt (count + count-distinct combine map-side; the distinct pass
    shuffles only (surt, digest) pairs). Output: (surt, n_captures,
    n_versions, last_ts, change_rate), change_rate = (versions-1) /
    (captures-1), 0.0 for single-capture URLs, rounded 6 for
    cross-engine replay. Feeds frontier.priority_score as the recrawl
    term alongside the link-heuristic term."""
    g = (
        parsed.filter(F.col("surt").isNotNull())
        .groupBy("surt")
        .agg(
            F.count(F.lit(1)).alias("n_captures"),
            F.count_distinct(F.col("digest")).alias("n_versions"),
            F.max("warc_ts").alias("last_ts"),
        )
    )
    rate = F.when(
        F.col("n_captures") > 1,
        (F.col("n_versions") - 1).cast("double")
        / (F.col("n_captures") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    return g.select(
        "surt", "n_captures", "n_versions", "last_ts",
        F.round(rate, 6).alias("change_rate"),
    )


def surt_host(surt: Column) -> Column:
    """Host key of a SURT: everything before ``)`` (labels stay reversed
    — this is a grouping key, not a display name; same split in DuckDB:
    ``string_split(surt, ')')[1]``)."""
    return F.split(surt, r"\)").getItem(0)


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "surt",
    digest_col: str = "last_digest",
) -> DataFrame:
    """Crawl-over-crawl delta: which URLs appeared, vanished, or changed
    between two crawl snapshots (each one row per SURT — cdx_index
    output). The operational complement to recrawl_priority: the
    priority estimator needs the capture HISTORY, the diff needs only
    two index snapshots — which is what a deployment actually has per
    crawl cycle (Common Crawl publishes exactly these per-crawl CDX
    snapshots).

    ONE full-outer join on the SURT key; with both snapshots stored
    bucketed by ``surt`` (operators/frontier.write_bucketed — the
    anti_join_cdx layout) the join plans exchange-free on both sides,
    so a 10^10-URL diff costs a co-located merge, not a shuffle.
    Presence is tracked with explicit markers, never inferred from
    digest nullness (a capture with a NULL digest is still present).

    Output: (surt, host, change, old_digest, new_digest) with
    ``change`` in {added, removed, changed, unchanged}.
    """
    o = old.select(
        F.col(key_col).alias("surt"),
        F.col(digest_col).alias("old_digest"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key_col).alias("surt"),
        F.col(digest_col).alias("new_digest"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, "surt", "full_outer")
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_digest").eqNullSafe(F.col("new_digest")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        "surt",
        surt_host(F.col("surt")).alias("host"),
        change.alias("change"),
        "old_digest",
        "new_digest",
    )


def crawl_diff_summary(diff: DataFrame) -> DataFrame:
    """Per-host rollup of a crawl_diff: one map-side-combinable
    aggregation of conditional counts (never a pivot over exploded
    rows). Output: (host, n_added, n_removed, n_changed, n_unchanged,
    n_total) — the per-host churn table that drives crawl-budget
    allocation (hosts with high churn earn more refetch tokens,
    the recrawl_priority signal at host granularity)."""

    def cnt(status: str) -> Column:
        return F.sum(
            (F.col("change") == status).cast("bigint")
        ).alias(f"n_{status}")

    return diff.groupBy("host").agg(
        cnt("added"), cnt("removed"), cnt("changed"), cnt("unchanged"),
        F.count(F.lit(1)).alias("n_total"),
    )
