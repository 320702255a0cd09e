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


def url_path(url: Column) -> Column:
    """Path component of *url* (query and fragment stripped), lowercased."""
    pathq = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(url)), _HOST_RE, ""), r"^[^/?#]*", ""
    )
    return F.regexp_extract(pathq, r"^([^?#]*)", 1)


def path_template(url: Column) -> Column:
    """URL-space template of *url*: the path with every digit run
    collapsed to ``N``. Calendar pickers, session ids, and paginated
    archives generate unbounded distinct URLs from a handful of
    templates — the explosion signal the trap detectors key on."""
    return F.regexp_replace(url_path(url), r"[0-9]+", "N")


def trap_signals(
    df: DataFrame,
    url_col: str = "url",
    min_urls: int = 20,
    template_ratio: float = 10.0,
    repeat_limit: int = 3,
    depth_limit: int = 12,
) -> DataFrame:
    """Per-host crawler-trap signals over a frontier / URL log — the
    trap heuristics published for large crawlers (IRLbot's URL-space
    budgeting, Heritrix's path-repetition and depth rules), Spark-first.

    Three independent flags, OR-ed into ``is_trap``:

    * **template explosion** — ``>= min_urls`` distinct URLs whose
      distinct-URL / distinct-template ratio is ``>= template_ratio``
      (one ``/cal/N/N/N`` template backing thousands of URLs is a
      calendar trap, not content);
    * **segment repetition** — some path repeats a single segment
      ``>= repeat_limit`` times (the ``/a/b/a/b/a/...`` symlink-cycle
      shape Heritrix's path-repetition filter kills);
    * **runaway depth** — some path has ``>= depth_limit`` segments.

    Plan: one projection (pure regex/array column algebra, codegen'd,
    zero Python) then ONE host-keyed aggregation. Hosts are a
    high-cardinality key with partial (map-side) combine, so the
    shuffle moves one short row per (host, template) group — at a
    10^10-URL frontier the aggregate output is ~|hosts| rows, which is
    what the per-host politeness state already costs. The two
    count-distincts share one Expand of fixed-width keys (url hash /
    template string), never the page payload. Per-path segment stats
    are O(len^2) higher-order array expressions on paths capped by the
    frontier's own URL-length guard.
    """
    url = F.col(url_col)
    path = url_path(url)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    max_rep = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(segs),
                lambda s: F.size(F.filter(segs, lambda x: x == s)),
            )
        ),
        F.lit(0),
    )
    per_url = df.select(
        url_host(url).alias("host"),
        url.alias("_u"),
        path_template(url).alias("_t"),
        F.size(segs).cast("bigint").alias("_depth"),
        max_rep.cast("bigint").alias("_rep"),
    )
    agg = per_url.groupBy("host").agg(
        F.countDistinct("_u").alias("n_urls"),
        F.countDistinct("_t").alias("n_templates"),
        F.max("_depth").alias("max_depth"),
        F.max("_rep").alias("max_segment_repeat"),
    )
    ratio = F.col("n_urls").cast("double") / F.col("n_templates").cast("double")
    return agg.select(
        "host",
        "n_urls",
        "n_templates",
        ratio.alias("url_template_ratio"),
        "max_depth",
        "max_segment_repeat",
        (
            ((F.col("n_urls") >= int(min_urls))
             & (ratio >= float(template_ratio)))
            | (F.col("max_segment_repeat") >= int(repeat_limit))
            | (F.col("max_depth") >= int(depth_limit))
        ).alias("is_trap"),
    )


def trap_filter(df: DataFrame, url_col: str = "url", **signal_kw) -> DataFrame:
    """Drop every URL on a host ``trap_signals`` flags. The trapped-host
    set is tiny by construction (hosts, not URLs), so the anti-join back
    is an explicit broadcast — the frontier side never shuffles."""
    trapped = (
        trap_signals(df, url_col=url_col, **signal_kw)
        .filter(F.col("is_trap"))
        .select(F.col("host").alias("_host"))
    )
    keyed = df.withColumn("_host", url_host(F.col(url_col)))
    return keyed.join(
        F.broadcast(trapped), on="_host", how="left_anti"
    ).drop("_host")


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


def mirror_hosts(
    pf: DataFrame,
    host_col: str = "host",
    fp_col: str = "fp",
    min_shared: int = 3,
    min_jaccard: float = 0.2,
    max_hosts_per_fp: int = 16,
) -> DataFrame:
    """Mirror-host detection: host pairs whose CONTENT overlaps — the
    crawl-dedup problem one level above URL dedup (the reference's own
    bench corpus models AVM download mirrors; Common Crawl and IRLbot
    both collapse mirrors so the politeness budget isn't spent fetching
    the same bytes from twelve aliases). Input is one row per
    ``(host, content fingerprint)`` observation.

    Spark-first shape, never all-pairs-of-hosts:

    1. ``distinct(host, fp)`` — map-side-combinable exchange on fp.
    2. per-fp host sets CAPPED at ``max_hosts_per_fp``: a fingerprint on
       more hosts than that is boilerplate (empty pages, error shells),
       not mirroring — the cap bounds the next step to C(cap, 2) pairs
       per fingerprint, which is what keeps the operator linear in
       |observations| at 10^10 rows.
    3. intra-fingerprint host pairs (h1 < h2) from the sorted host set
       via nested array transforms (zero Python), then one pair-keyed
       count — shared fingerprints per host pair.
    4. per-host distinct-fp totals join in (broadcast-able: |hosts|
       rows), Jaccard = shared / (n1 + n2 - shared).

    Returns ``(host1, host2, shared, n1, n2, jaccard)`` for pairs with
    ``shared >= min_shared`` and ``jaccard >= min_jaccard``, jaccard
    rounded to 6 decimals for cross-engine float parity.
    """
    d = pf.select(
        F.col(host_col).alias("host"), F.col(fp_col).alias("fp")
    ).distinct()
    totals = d.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    hosts = (
        d.groupBy("fp")
        .agg(F.sort_array(F.collect_set("host")).alias("hs"))
        .filter(
            (F.size("hs") >= 2) & (F.size("hs") <= max_hosts_per_fp)
        )
    )
    pairs = hosts.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("hs"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("hs"), i + 2,
                            F.size(F.col("hs"))
                        ),
                        lambda y: F.struct(
                            x.alias("host1"), y.alias("host2")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.host1", "p.host2")
    shared = pairs.groupBy("host1", "host2").agg(
        F.count(F.lit(1)).alias("shared"))
    t1 = totals.select(F.col("host").alias("host1"), F.col("n").alias("n1"))
    t2 = totals.select(F.col("host").alias("host2"), F.col("n").alias("n2"))
    out = (
        shared.join(F.broadcast(t1), "host1")
        .join(F.broadcast(t2), "host2")
        .select(
            "host1", "host2", "shared", "n1", "n2",
            F.round(
                F.col("shared")
                / (F.col("n1") + F.col("n2") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
    )
    return out.filter(
        (F.col("shared") >= min_shared)
        & (F.col("jaccard") >= min_jaccard)
    )
