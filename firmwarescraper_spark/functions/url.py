"""URL canonicalization, host extraction, join, and fingerprinting.

Re-implements (from public API docs / published behavior, no code copied)
the canonicalization rules scrapy's dupefilter applies via
``w3lib.url.canonicalize_url`` — the reference activates them implicitly
through its pinned scrapy engine (/root/reference/requirements.txt:1):

  * scheme + host lowercased
  * default port stripped
  * query parameters sorted by (key, value), blank values kept
  * percent-encoding normalized (uppercase hex), path safely quoted
  * fragment removed
  * empty path -> '/'

The single-string functions are the shared core: the pure-Python crawl
simulator (plans/simulator.py) uses them directly so engine and oracle
share byte-identical canonicalization. The ``*_udf`` wrappers are
Arrow-batched pandas UDFs (Series -> Series): vectorized at the transport
layer, no per-row Python UDF registration.

Fingerprint: the engine hashes ``canonicalize_url(url) || form_body``
with Spark's built-in ``xxhash64`` (JVM-side, codegen'd) — see
``url_hash_col``. The reference's SHA1 request fingerprint
(scrapy RFPDupeFilter) serves the same role; xxhash64 is chosen for
speed and native Catalyst support; exactness of the seen set does not
depend on the hash function since the authoritative dedup is an
anti-join on the canonical URL hash, not a lossy filter.
"""

from __future__ import annotations

import re
from urllib.parse import (
    parse_qsl,
    quote,
    urlencode,
    urljoin,
    urlparse,
    urlunparse,
)

_HEX_ESCAPE_RE = re.compile(r"%[0-9a-fA-F]{2}")

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}

# RFC 3986 path characters that stay unescaped when (re)quoting.
_PATH_SAFE = "/;:@&=+$,!~*'()-._"


def canonicalize_url(url: str) -> str:
    """Canonical form of *url* (w3lib-compatible rule set, see module doc)."""
    if url is None:
        return None
    url = url.strip()
    parts = urlparse(url)
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if parts.port is not None and _DEFAULT_PORTS.get(scheme) == parts.port:
        netloc = netloc.rsplit(":", 1)[0]
    # normalize percent-encoding in place: quote unsafe chars, uppercase the
    # hex of existing escapes — never decode (%2F must not become '/')
    path = quote(parts.path, safe=_PATH_SAFE + "%") or "/"
    path = _HEX_ESCAPE_RE.sub(lambda m: m.group(0).upper(), path)
    params = parts.params
    query_pairs = parse_qsl(parts.query, keep_blank_values=True)
    query = urlencode(sorted(query_pairs))
    return urlunparse((scheme, netloc, path, params, query, ""))


def url_host(url: str) -> str:
    """Lowercased host (netloc without port/userinfo) of *url*."""
    if url is None:
        return None
    host = urlparse(url).hostname
    return host.lower() if host else ""


def url_join(base: str, href: str) -> str:
    """RFC 3986 reference resolution — the reference's ``response.urljoin``
    (/root/reference/firmware/tests/mock_classes.py:12-13)."""
    if href is None:
        return None
    return urljoin(base or "", href)


# --- Arrow-batched pandas UDFs ------------------------------------------------
# Declared lazily so importing this module never requires an active session.

def _pandas_udf(fn, name):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def _udf(*cols: pd.Series) -> pd.Series:
        return fn(*cols)

    _udf.__name__ = name
    return _udf


# Fast-path shape: URLs for which canonicalize_url is PROVABLY the
# identity, checkable with one vectorized regex —
#   * lowercase scheme, lowercase host, no port/userinfo (nothing to
#     lowercase or strip; any port goes slow-path, including default
#     ports that must strip)
#   * mandatory path containing only RFC-3986 path-safe chars / alnum
#     and NO '%' (nothing to quote, no escape-hex to uppercase; ';'
#     params split and rejoin byte-identically — EXCEPT a trailing ';',
#     which urlparse reads as empty params and urlunparse then drops, so
#     ';'-final URLs go slow-path; caught by the hypothesis sweep)
#   * no query (sorting/re-encoding never applies), no fragment
# Everything else takes the full urllib slow path. This keeps the
# canonicalization of crawl children — the writes-phase hot loop, where
# generator-shaped URLs are ~100% fast-path — at pandas regex speed per
# batch instead of 5 urllib calls per row, with the plan shape (one
# ArrowEvalPython) unchanged.
_CANONICAL_IDENTITY_RE = re.compile(
    r"[a-z][a-z0-9+.\-]*://[a-z0-9.\-]+/[A-Za-z0-9/;:@&=+$,!~*'()\-._]*(?<!;)"
)


def _canonicalize_series(urls: pd.Series) -> pd.Series:
    fast = urls.str.fullmatch(_CANONICAL_IDENTITY_RE, na=False)
    if fast.all():
        return urls
    out = urls.copy()
    slow = ~fast & urls.notna()
    out[slow] = urls[slow].map(canonicalize_url)
    return out


def _host_series(urls: pd.Series) -> pd.Series:
    """Vectorized twin of url_host: for the common authority shape (no
    userinfo '@', no IPv6 '[]'), hostname == lowercase(authority up to
    the first ':') — two pandas regex passes per batch instead of a
    urlparse per row. Anything else falls back to urllib row-wise;
    byte-parity with url_host pinned by the hypothesis sweep."""
    auth = urls.str.extract(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)",
                            expand=False)
    fast = auth.notna() & ~auth.str.contains(r"[@\[\]]", na=True)
    out = pd.Series(index=urls.index, dtype=object)
    out[fast] = auth[fast].str.split(":").str[0].str.lower()
    slow = ~fast & urls.notna()
    if slow.any():
        out[slow] = urls[slow].map(url_host)
    return out


def _join_series(bases: pd.Series, hrefs: pd.Series) -> pd.Series:
    return pd.Series(
        [url_join(b, h) for b, h in zip(bases, hrefs)], index=bases.index
    )


from functools import lru_cache

canonicalize_url_udf = lru_cache(maxsize=None)(
    lambda: _pandas_udf(_canonicalize_series, "canonicalize_url"))
url_host_udf = lru_cache(maxsize=None)(lambda: _pandas_udf(_host_series, "url_host"))
url_join_udf = lru_cache(maxsize=None)(lambda: _pandas_udf(_join_series, "url_join"))

def form_body(form: dict | None) -> str:
    """Canonical POST body: sorted urlencoded pairs (the scrapy request
    fingerprint includes the body — S2, dlink_gpl.py:97-107)."""
    if not form:
        return ""
    return urlencode(sorted(form.items()))


def fetch_key(canon_url: str, form: dict | None = None) -> str:
    """The key a request is fetched/deduped by: canonical URL, plus a
    '|form|' suffix for POST requests so the same URL with different form
    data is a different fetch."""
    body = form_body(form)
    return canon_url + ("|form|" + body if body else "")


def form_body_col(form_col: Column) -> Column:
    """JVM twin of form_body over a map<string,string> column."""
    pairs = F.transform(
        F.sort_array(F.map_entries(form_col)),
        lambda e: F.concat(
            _urlencode_col(e["key"]), F.lit("="), _urlencode_col(e["value"])
        ),
    )
    return F.when(
        form_col.isNull() | (F.size(F.map_entries(form_col)) == 0), F.lit("")
    ).otherwise(F.array_join(pairs, "&"))


def _urlencode_col(c: Column) -> Column:
    """Full ``urllib.parse.quote_plus`` semantics as a column expression:
    Spark's ``url_encode`` is java.net.URLEncoder (application/
    x-www-form-urlencoded: space->'+', uppercase percent-escapes of the
    UTF-8 bytes), which differs from Python's quote_plus in exactly two
    characters — Java leaves '*' bare and escapes '~', Python escapes '*'
    and leaves '~'. Patch those two and the JVM fetch_key is byte-identical
    to the Python twin ``form_body`` for ANY value (pinned by a
    hypothesis test over adversarial vocabularies)."""
    return F.regexp_replace(
        F.regexp_replace(F.url_encode(c), r"\*", "%2A"), "%7E", "~"
    )


def fetch_key_col(canon_url: Column, form_col: Column | None = None) -> Column:
    if form_col is None:
        return canon_url
    body = form_body_col(form_col)
    return F.when(body == "", canon_url).otherwise(
        F.concat(canon_url, F.lit("|form|"), body)
    )


def url_join_col(base: Column, href: Column) -> Column:
    """JVM-side (codegen'd) RFC-3986 reference resolution for the three
    href shapes crawl pages actually contain — absolute, root-relative,
    and relative-to-directory. Python's urljoin (url_join_udf) remains the
    general fallback; parity between the two on corpus link shapes is
    pinned by tests."""
    is_absolute = href.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
    is_protocol_rel = href.startswith("//")
    is_root_rel = href.startswith("/") & ~is_protocol_rel
    scheme = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    origin = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    # directory of the base: strip query/fragment, then the trailing segment
    base_path = F.regexp_replace(base, r"[?#].*$", "")
    base_dir = F.regexp_replace(base_path, r"[^/]*$", "")
    return (
        F.when(is_absolute, href)
        .when(is_protocol_rel, F.concat(scheme, F.lit(":"), href))
        .when(is_root_rel, F.concat(origin, href))
        .otherwise(F.concat(base_dir, href))
    )


def url_hash_col(canon_url: Column | str, form_body: Column | str | None = None) -> Column:
    """Frontier/seen fingerprint column: JVM-side xxhash64 over the
    canonical URL (plus the POST form body for S2 form requests —
    reference: FormRequest bodies participate in the scrapy request
    fingerprint, /root/reference/firmware/spiders/dlink_gpl.py:97-107)."""
    canon = F.col(canon_url) if isinstance(canon_url, str) else canon_url
    if form_body is None:
        return F.xxhash64(canon)
    body = F.col(form_body) if isinstance(form_body, str) else form_body
    return F.xxhash64(canon, F.coalesce(body, F.lit("")))
