"""URL-level corpus filtering — the FIRST stage of the published
web-text pipelines (RefinedWeb §3.1 "URL filtering", CCNet, FineWeb):
drop documents by where they came from before paying to parse them.

Two public signals, both implemented Spark-first:

* **Domain blocklist with subdomain semantics** (the UT1-blocklist
  rule: blocking ``example.com`` blocks ``a.b.example.com``). The host
  explodes into its parent-suffix chain (``a.b.c`` -> [``a.b.c``,
  ``b.c``, ``c``] — bounded by label count, ~4 fixed-width rows per
  URL), then one semi-join marks blocked URLs and one anti-join drops
  them. Both joins are on short domain strings; Spark/AQE broadcasts
  the multi-million-row blocklist side when it fits and falls back to
  a shuffle join past the threshold — the plan survives a 4.6M-domain
  UT1 list either way.
* **Weighted keyword scoring** (RefinedWeb's soft-match word list:
  hard words weigh enough to block alone, soft words accumulate).
  The fixed keyword list unrolls into a literal sum-of-CASE projection
  — whole-stage codegen, zero shuffle, and byte-replayable in the
  DuckDB oracle.

``url_features`` adds the structural signals the published filters
gate on (host digit ratio, path depth, parameter count, length).

The reference has no corpus-quality analogue (its spiders *whitelist*
URLs — plans/rulepacks_vendors.py F5); this is the inverse operation
the training-data surface needs, sharing the host regex with
sources/cdx.surt_key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# host of a URL: scheme and userinfo dropped, port kept out via char class
_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^@/?#]*@)?([^/:?#]+)"

# RefinedWeb-flavored default weights: a hard hit blocks alone at the
# default threshold 1.0; soft words must co-occur.
DEFAULT_KEYWORDS = {
    "porn": 1.0, "xxx": 1.0, "casino": 1.0,
    "poker": 0.5, "escort": 0.5, "viagra": 0.5,
    "free-download": 0.25, "torrent": 0.25,
}


def url_host(url: Column) -> Column:
    """Lowercased host of *url* (no port, no userinfo)."""
    return F.regexp_extract(F.lower(F.trim(url)), _HOST_RE, 1)


def host_suffix_chain(host: Column) -> Column:
    """All dot-suffixes of *host*: ``a.b.c`` -> [a.b.c, b.c, c]. Array
    size = label count (bounded ~4-6 for real hosts), built in one
    higher-order expression — no Python, no shuffle."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )


def url_keyword_score(url: Column, weights: dict | None = None) -> Column:
    """Weighted keyword score of *url*: sum of weights over case-
    insensitive substring hits. Unrolled literal CASE sum — codegen'd,
    exactly replayable in SQL."""
    weights = DEFAULT_KEYWORDS if weights is None else weights
    lo = F.lower(url)
    score = F.lit(0.0)
    for kw, w in sorted(weights.items()):
        score = score + F.when(
            F.instr(lo, kw) > 0, F.lit(float(w))
        ).otherwise(F.lit(0.0))
    return score


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Structural URL signals: host, tld, host_digit_ratio, path_depth,
    n_params, url_len. One projection, zero shuffle."""
    url = F.col(url_col)
    host = url_host(url)
    pathq = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(url)), _HOST_RE, ""), r"^[^/?]*", ""
    )
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    labels = F.split(host, r"\.")
    return (
        df.withColumn("host", host)
        .withColumn("tld", F.element_at(labels, -1))
        .withColumn(
            "host_digit_ratio",
            F.when(F.length(host) > 0,
                   (F.length(host)
                    - F.length(F.regexp_replace(host, r"\d", "")))
                   .cast("double") / F.length(host).cast("double"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "path_depth",
            F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
            .cast("bigint"),
        )
        .withColumn(
            "n_params",
            F.when(query == "", F.lit(0))
            .otherwise(F.size(F.split(query, "&"))).cast("bigint"),
        )
        .withColumn("url_len", F.length(url).cast("bigint"))
    )


def blocklist_filter(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose host — or ANY parent domain of it — appears in
    *blocked* (UT1 subdomain semantics). Suffix-chain explode (bounded
    fan-out) -> semi-join -> distinct blocked keys -> anti-join back;
    every shuffled row is a short domain string or the URL key, never
    the document payload."""
    keyed = df.withColumn("_host", url_host(F.col(url_col)))
    sfx = keyed.select(
        F.col(url_col).alias("_k"),
        F.explode(host_suffix_chain(F.col("_host"))).alias("_sfx"),
    )
    bad = (
        sfx.join(
            blocked.select(F.col(domain_col).alias("_sfx")),
            on="_sfx", how="left_semi",
        )
        .select(F.col("_k").alias(url_col))
        .distinct()
    )
    return keyed.join(bad, on=url_col, how="left_anti").drop("_host")


def url_filter(
    df: DataFrame,
    blocked: DataFrame | None = None,
    url_col: str = "url",
    weights: dict | None = None,
    max_score: float = 1.0,
) -> DataFrame:
    """The composed RefinedWeb stage: blocklist (when given) then
    keyword-score gate (keep score < ``max_score``). Adds ``url_score``
    to surviving rows."""
    out = df if blocked is None else blocklist_filter(df, blocked, url_col)
    out = out.withColumn(
        "url_score", url_keyword_score(F.col(url_col), weights)
    )
    return out.filter(F.col("url_score") < F.lit(float(max_score)))


def keyword_score_sql(expr: str, weights: dict | None = None) -> str:
    """DuckDB replay of ``url_keyword_score`` over SQL expression
    *expr* — identical keyword order and float literals."""
    weights = DEFAULT_KEYWORDS if weights is None else weights
    parts = [
        f"(CASE WHEN position('{kw}' IN lower({expr})) > 0 "
        f"THEN {float(w)!r}::DOUBLE ELSE 0.0 END)"
        for kw, w in sorted(weights.items())
    ]
    return "(" + " + ".join(parts) + ")"
