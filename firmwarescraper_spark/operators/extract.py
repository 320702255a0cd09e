"""Web-text extraction: HTML boilerplate removal and anchor-text harvest.

The crawl side of this repo parses HTML for *navigation* (link extraction,
table-cell rulepacks — functions/html.py, the reference's scrapy-XPath
analogue); this module is the *corpus-production* side: turning fetched
pages into training text, the Common-Crawl -> C4/FineWeb stage that sits
between the WARC source (sources/warc.py) and the curation operators
(curation.py, textops.py).

Both operators are PURE COLUMN ALGEBRA (regexp split/extract/replace +
higher-order array functions) — JVM-side, whole-stage codegen, zero
Python in the hot path — and every regex is written in the Java/RE2
common subset so the DuckDB oracle replays them verbatim (probed: block
split keeps trailing empties on both engines, lazy quantifiers and
inline (?is) flags agree).

* ``main_content`` — jusText/Arc90-flavored block heuristic: split the
  page at block-closing tags, strip tags per block, keep blocks whose
  visible text is long enough and whose link density (anchor-text chars /
  text chars) is low enough, re-join. Deliberately a per-row projection:
  no shuffle, scales with scan width only.
* ``anchor_pairs`` / ``anchor_texts`` — harvest (href, anchor text)
  pairs and aggregate the distinct anchor phrases per target: the
  link-text corpus used for query-document training data and anchor-
  based page titling (and the classic web-IR signal). One href-keyed
  shuffle whose rows are capped fixed-width (anchor text truncated at
  ``max_text_len``).

Simplifications (documented contract, same on both engines): character
entities are not decoded in-place (chain ``decode_entities`` after
extraction for that); nested/ill-formed anchors resolve by lazy
matching; block structure is tag-based, not CSS/visual. Reference parity
note: the reference's spiders never produce corpus text (they navigate
and download binaries); this stage is part of the training-data surface
the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Block-closing boundaries: the page splits into visual blocks at these.
BLOCK_SPLIT_RE = r"(?i)</p>|</div>|</li>|</h[1-6]>|</td>|</tr>|</blockquote>|<br[^>]*>"
# Full anchor elements (lazy body, optional attributes).
ANCHOR_RE = r"(?is)<a(?:\s[^>]*)?>.*?</a>"
HREF_RE = r'(?is)href\s*=\s*"([^"]*)"'
# Script/style subtrees vanish before tag stripping.
SCRIPT_STYLE_RE = r"(?is)<script(?:\s[^>]*)?>.*?</script>|<style(?:\s[^>]*)?>.*?</style>"
TAG_RE = r"<[^>]*>"


def block_text(block: Column) -> Column:
    """Visible text of one block: drop script/style subtrees, strip tags,
    collapse whitespace."""
    no_code = F.regexp_replace(block, SCRIPT_STYLE_RE, " ")
    no_tags = F.regexp_replace(no_code, TAG_RE, " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def anchor_text_len(block: Column) -> Column:
    """Total visible-text characters inside the block's anchors — the
    numerator of link density."""
    anchors = F.regexp_extract_all(block, F.lit(ANCHOR_RE), 0)
    return F.aggregate(
        anchors, F.lit(0), lambda acc, a: acc + F.length(block_text(a))
    )


def main_content(
    df: DataFrame,
    html_col: str = "html",
    min_text_len: int = 25,
    max_link_density: float = 0.34,
    out_col: str = "main_text",
) -> DataFrame:
    """Boilerplate removal: keep blocks with >= ``min_text_len`` visible
    chars and link density <= ``max_link_density``; navigation bars,
    footers, and link farms fail one or both tests. Adds (n_blocks =
    non-empty-text blocks, n_kept, main_text, main_len). ZERO shuffle —
    the whole operator is one projection over the scan, so at 100 TB it
    rides the WARC read for free. Link density compares an exact
    int/int double on both engines — no rounding boundary exists."""
    blocks = F.split(F.col(html_col), BLOCK_SPLIT_RE)
    scored = F.transform(
        blocks,
        lambda b: F.struct(
            block_text(b).alias("t"), anchor_text_len(b).alias("a")
        ),
    )
    nonempty = F.filter(scored, lambda s: F.length(s["t"]) > 0)
    kept = F.filter(
        nonempty,
        lambda s: (F.length(s["t"]) >= min_text_len)
        & (
            s["a"].cast("double") / F.length(s["t"]).cast("double")
            <= F.lit(float(max_link_density))
        ),
    )
    out = df.withColumn("_ne", nonempty).withColumn("_kept", kept)
    return (
        out.withColumn("n_blocks", F.size("_ne").cast("bigint"))
        .withColumn("n_kept", F.size("_kept").cast("bigint"))
        .withColumn(
            out_col, F.array_join(F.transform("_kept", lambda s: s["t"]), "\n")
        )
        .withColumn("main_len", F.length(out_col).cast("bigint"))
        .drop("_ne", "_kept")
    )


def anchor_pairs(
    df: DataFrame,
    html_col: str = "html",
    max_text_len: int = 100,
) -> DataFrame:
    """Explode every page into (href, anchor) rows: href from the
    element's href attribute, anchor = visible text truncated at
    ``max_text_len`` (the fixed-width-shuffle cap). Elements without an
    href or without visible text are dropped. URL resolution against the
    page URL is the crawl side's job (functions/url.py urljoin, X1) —
    hrefs here stay verbatim so the extraction is engine-replayable."""
    elems = F.explode(
        F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 0)
    ).alias("_a")
    pairs = df.select(*df.columns, elems).select(
        *df.columns,
        F.regexp_extract("_a", HREF_RE, 1).alias("href"),
        F.substring(block_text(F.col("_a")), 1, max_text_len).alias("anchor"),
    )
    return pairs.filter((F.col("href") != "") & (F.col("anchor") != ""))


def anchor_texts(
    df: DataFrame,
    html_col: str = "html",
    max_text_len: int = 100,
    max_texts: int = 20,
) -> DataFrame:
    """Aggregate the link-text corpus per target: n_links (total anchor
    occurrences), n_texts (distinct phrases), texts (first ``max_texts``
    distinct phrases, sorted, '|'-joined — a bounded column by
    construction). One href-keyed shuffle of capped fixed-width rows;
    the distinct pass combines map-side (hot targets like '/' collapse
    before the exchange)."""
    pairs = anchor_pairs(df, html_col, max_text_len).select("href", "anchor")
    n_links = pairs.groupBy("href").agg(F.count("*").alias("n_links"))
    texts = (
        pairs.distinct()
        .groupBy("href")
        .agg(
            F.count("*").cast("bigint").alias("n_texts"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("anchor")), 1, max_texts),
                "|",
            ).alias("texts"),
        )
    )
    return n_links.join(texts, "href").select(
        "href", F.col("n_links").cast("bigint").alias("n_links"),
        "n_texts", "texts",
    )


# <meta name="robots"> element and its content attribute; rel=nofollow
# attribute inside an anchor element (matched against the full element —
# documented contract: a literal 'rel="..nofollow.."' in the anchor TEXT
# also matches, same on both engines).
META_ROBOTS_RE = r'(?is)<meta\s[^>]*name\s*=\s*"robots"[^>]*>'
META_CONTENT_RE = r'(?is)content\s*=\s*"([^"]*)"'
REL_NOFOLLOW_RE = r'(?is)rel\s*=\s*"[^"]*nofollow[^"]*"'


def robots_directives(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Per-page robots POLICY extraction — the in-HTML half of RFC 9309
    compliance that the robots.txt evaluator (operators/robots.py, T2)
    cannot see: ``<meta name="robots" content="noindex, nofollow">`` and
    per-anchor ``rel="nofollow"`` (Google/Bing's documented directives;
    scrapy's LinkExtractor honors the anchor-level one the same way).
    The crawl engine consumes this downstream of fetch: ``noindex``
    pages are excluded from the corpus sink, ``nofollow`` pages (or
    anchors) contribute nothing to the next round's frontier — at
    10^10-URL scale this is a corpus-wide projection, so it is PURE
    COLUMN ALGEBRA (regex + higher-order array functions, zero Python,
    zero shuffle), fused into the page scan like main_content.

    Returns ``(<id_col>, noindex, nofollow, n_links, n_followable)``:
    ``n_links`` counts anchors with a non-empty href; ``n_followable``
    is 0 under page-level nofollow, else the href-anchors not
    individually rel="nofollow"-ed. Directive tokens are comma-split
    and trimmed (``content="noindex , nofollow"`` parses); ``none``
    means noindex+nofollow per the published semantics.
    """
    meta = F.regexp_extract(F.col(html_col), META_ROBOTS_RE, 0)
    content = F.lower(F.regexp_extract(meta, META_CONTENT_RE, 1))
    toks = F.transform(F.split(content, ","), lambda t: F.trim(t))
    noindex = F.arrays_overlap(
        toks, F.array(F.lit("noindex"), F.lit("none")))
    nofollow = F.arrays_overlap(
        toks, F.array(F.lit("nofollow"), F.lit("none")))
    anchors = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 0)
    linked = F.filter(
        anchors, lambda a: F.regexp_extract(a, HREF_RE, 1) != "")
    n_follow = F.when(nofollow, F.lit(0)).otherwise(
        F.size(F.filter(linked, lambda a: ~a.rlike(REL_NOFOLLOW_RE))))
    return df.select(
        F.col(id_col),
        noindex.alias("noindex"),
        nofollow.alias("nofollow"),
        F.size(linked).cast("bigint").alias("n_links"),
        n_follow.cast("bigint").alias("n_followable"),
    )


# <meta charset="..."> / <meta http-equiv content="...charset=..."> label,
# read from a LATIN-1 view of the payload prefix (byte-lossless: every
# byte maps to one char, so the regex sees the raw bytes).
META_CHARSET_RE = r"""(?i)<meta[^>]*charset\s*=\s*["']?\s*([A-Za-z0-9_.:-]+)"""


def detect_charset(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    meta_scan_bytes: int = 1024,
) -> DataFrame:
    """Charset detection + transcoding over raw fetched bytes — the
    WARC->WET step between the fetch/WARC layer (sources/warc.py) and
    every text operator, which all assume a decoded ``string`` column
    (Common Crawl's WET extraction runs exactly this sniffing chain).
    Reference parity note: the reference's scrapy stack delegates this
    to w3lib's encoding detection inside Response.text; this is that
    stage made explicit, Spark-first.

    Detection precedence (the WHATWG/html5 order):

    1. BOM — ``EF BB BF`` -> utf-8, ``FF FE`` -> utf-16le, ``FE FF`` ->
       utf-16be (BOM stripped before decode).
    2. ``<meta charset=...>`` in the first ``meta_scan_bytes`` bytes,
       read through a latin-1 view (byte-lossless). Labels normalize to
       the Java-charset set Spark's ``decode`` supports: utf-8/ascii
       aliases, and iso-8859-1 aliases incl. windows-1252 (decoded as
       latin-1 — the 0x80-0x9F block diverges; browsers map the OTHER
       way, documented divergence). A meta claiming UTF-16 is IGNORED
       per the HTML5 spec (a decodable meta tag proves the page is not
       UTF-16).
    3. UTF-8 validation (``is_valid_utf8``) — valid multibyte wins.
    4. latin-1 fallback (total: every byte decodes).

    Every branch carries its own decode guard (Spark's ``decode``
    RAISES on malformed input under ANSI): UTF-8 decodes only behind
    ``is_valid_utf8``, UTF-16 only behind a BOM + even byte length,
    latin-1 never fails — so a hostile payload can downgrade its own
    label but can never fail the job. A lying ``meta charset=utf-8`` on
    invalid bytes falls through to the latin-1 fallback; a BOM on an
    invalid UTF-8 body likewise.

    Output: ``(<id_col>, charset, via, text)`` — ``via`` in
    {bom, meta, valid-utf8, fallback, null} records WHICH rule fired
    (the per-charset mix is the corpus-health dashboard number).

    Scale shape: one zero-shuffle projection fused into the payload
    scan — per-row cost is bounded by ``meta_scan_bytes`` plus one
    validation pass and one decode of the payload; nothing wide.
    """
    p = F.col(payload_col)
    h3 = F.lower(F.hex(p.substr(F.lit(1), F.lit(3))))
    h2 = F.lower(F.hex(p.substr(F.lit(1), F.lit(2))))
    body8 = p.substr(F.lit(4), F.length(p))       # after the 3-byte BOM
    body16 = p.substr(F.lit(3), F.length(p))      # after a 2-byte BOM
    prefix_l1 = F.decode(
        p.substr(F.lit(1), F.lit(meta_scan_bytes)), "ISO-8859-1")
    meta_raw = F.upper(F.regexp_extract(prefix_l1, META_CHARSET_RE, 1))
    meta = (
        F.when(meta_raw.isin("UTF-8", "UTF8"), F.lit("utf-8"))
        .when(meta_raw.isin("US-ASCII", "ASCII"), F.lit("us-ascii"))
        .when(meta_raw.isin("ISO-8859-1", "ISO8859-1", "LATIN-1", "LATIN1",
                            "WINDOWS-1252", "CP1252"), F.lit("iso-8859-1"))
        .otherwise(F.lit(""))     # unknown / UTF-16 meta: ignored (html5)
    )
    valid8 = F.is_valid_utf8(p)
    even16 = F.pmod(F.length(body16), F.lit(2)) == 0

    def _r(charset, via, text):
        return F.struct(charset.alias("charset"), F.lit(via).alias("via"),
                        text.alias("text"))

    res = (
        F.when(p.isNull(),
               _r(F.lit(None).cast("string"), "null",
                  F.lit(None).cast("string")))
        .when((h3 == "efbbbf") & F.is_valid_utf8(body8),
              _r(F.lit("utf-8"), "bom", F.decode(body8, "UTF-8")))
        .when((h2 == "fffe") & even16,
              _r(F.lit("utf-16le"), "bom", F.decode(body16, "UTF-16LE")))
        .when((h2 == "feff") & even16,
              _r(F.lit("utf-16be"), "bom", F.decode(body16, "UTF-16BE")))
        .when(meta == "iso-8859-1",
              _r(F.lit("iso-8859-1"), "meta", F.decode(p, "ISO-8859-1")))
        .when(meta.isin("utf-8", "us-ascii") & valid8,
              _r(meta, "meta", F.decode(p, "UTF-8")))
        .when(valid8,
              _r(F.lit("utf-8"), "valid-utf8", F.decode(p, "UTF-8")))
        .otherwise(
            _r(F.lit("iso-8859-1"), "fallback", F.decode(p, "ISO-8859-1")))
    )
    return df.select(
        F.col(id_col), res["charset"].alias("charset"),
        res["via"].alias("via"), res["text"].alias("text"),
    )


# One strict-; entity token: named, decimal numeric, or hex numeric.
# A single tokenization pass gives correct single-decode semantics:
# '&amp;#233;' decodes to the literal '&#233;', never to 'é'.
ENTITY_RE = r"&(?:[a-zA-Z][a-zA-Z0-9]*|#[0-9]+|#[xX][0-9a-fA-F]+);"

# The HTML named entities worth decoding without a full parser: the
# HTML4 core set + latin-1 accents + typography (the long tail keeps
# its literal form, documented contract).
NAMED_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "copy": "©", "reg": "®",
    "trade": "™", "deg": "°", "middot": "·",
    "laquo": "«", "raquo": "»", "ldquo": "“",
    "rdquo": "”", "lsquo": "‘", "rsquo": "’",
    "ndash": "–", "mdash": "—", "hellip": "…",
    "pound": "£", "euro": "€", "cent": "¢",
    "sect": "§", "para": "¶", "times": "×",
    "divide": "÷", "plusmn": "±", "frac12": "½",
    "frac14": "¼", "sup2": "²", "sup3": "³",
    "micro": "µ", "szlig": "ß", "agrave": "à",
    "aacute": "á", "acirc": "â", "atilde": "ã",
    "auml": "ä", "aring": "å", "aelig": "æ",
    "ccedil": "ç", "egrave": "è", "eacute": "é",
    "ecirc": "ê", "euml": "ë", "igrave": "ì",
    "iacute": "í", "icirc": "î", "iuml": "ï",
    "ntilde": "ñ", "ograve": "ò", "oacute": "ó",
    "ocirc": "ô", "otilde": "õ", "ouml": "ö",
    "oslash": "ø", "ugrave": "ù", "uacute": "ú",
    "ucirc": "û", "uuml": "ü", "yacute": "ý",
    "yuml": "ÿ",
}


def _chr_col(code: Column) -> Column:
    """Unicode codepoint -> one-char string, PURE column algebra: the
    UTF-16BE byte image of the codepoint (one code unit for the BMP, a
    computed surrogate pair above it) built with hex/unhex and decoded
    JVM-side. Spark has no full-range chr() (``F.char`` wraps at 256);
    this is the general construction. The CALLER guards validity —
    decode raises on lone surrogates, so feed only 1..0x10FFFF minus
    the surrogate block."""
    bmp = F.unhex(F.lpad(F.hex(code), 4, "0"))
    cp = code - 0x10000
    hi = F.lit(0xD800) + F.shiftright(cp, 10)
    lo = F.lit(0xDC00) + (cp % 1024)
    supp = F.unhex(F.concat(F.lpad(F.hex(hi), 4, "0"),
                            F.lpad(F.hex(lo), 4, "0")))
    return F.decode(F.when(code <= 0xFFFF, bmp).otherwise(supp), "UTF-16BE")


def decode_entities(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """HTML character-entity decoding — the post-extraction normalize
    step main_content deliberately skips (its documented simplification;
    real WET text is full of ``&amp;`` / ``&#233;`` / ``&#x1F600;``).
    Single-pass tokenization: the text splits at entity tokens and each
    token decodes independently, so ``&amp;#233;`` yields the literal
    ``&#233;`` (never double-decodes to é). Named entities resolve via
    a ~60-entry map literal (HTML4 core + latin-1 + typography; unknown
    names keep their literal form); numeric entities (decimal and hex)
    decode through the hex/unhex UTF-16BE construction in ``_chr_col``
    — full astral-plane range via computed surrogate pairs — guarded so
    codepoint 0, the surrogate block, > 0x10FFFF, and overflow-length
    digit runs all keep their literal form instead of raising.

    Output: (id, text_decoded, n_entities). Scale shape: one
    zero-shuffle projection (split + extract_all + per-element CASE +
    zip_with reassembly), all JVM-side — the detect_charset /
    main_content scan-fused shape."""
    t = F.col(text_col)
    parts = F.split(t, ENTITY_RE, -1)
    ents = F.regexp_extract_all(t, F.lit("(" + ENTITY_RE + ")"), 1)
    named = F.create_map(
        *[F.lit(x) for kv in sorted(NAMED_ENTITIES.items()) for x in kv])

    def dec_one(e: Column) -> Column:
        body = F.substring(e, 2, F.length(e) - 2)       # strip & ;
        is_hex = body.rlike(r"^#[xX]")
        digits = F.when(is_hex, F.substring(body, 3, 10_000)) \
            .otherwise(F.substring(body, 2, 10_000))
        # overflow guard BEFORE conv/cast: 0x10FFFF is 7 decimal /
        # 6 hex digits; longer runs keep their literal form
        in_len = F.when(is_hex, F.length(digits) <= 6) \
            .otherwise(F.length(digits) <= 7)
        code = F.when(
            is_hex, F.conv(digits, 16, 10).cast("bigint")
        ).otherwise(digits.try_cast("bigint"))
        valid = (in_len & code.isNotNull() & (code >= 1)
                 & (code <= 0x10FFFF)
                 & ~((code >= 0xD800) & (code <= 0xDFFF)))
        return (
            F.when(e == "", F.lit(""))                  # zip tail pad
            .when(body.startswith("#"),
                  F.when(valid, _chr_col(code)).otherwise(e))
            .otherwise(                                 # unknown: literal
                F.coalesce(F.try_element_at(named, body), e))
        )

    ents_padded = F.concat(ents, F.array(F.lit("")))
    decoded = F.array_join(
        F.zip_with(parts, ents_padded,
                   lambda s, e: F.concat(s, dec_one(e))), "")
    return df.select(
        F.col(id_col),
        F.when(t.isNull(), None).otherwise(decoded).alias("text_decoded"),
        F.size(ents).cast("bigint").alias("n_entities"),
    )
