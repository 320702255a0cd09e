"""Web-text extraction (operators/extract.py): boilerplate removal and
anchor-text harvest — golden hand values, gate semantics, plan pins, and
a crawl-corpus smoke check."""

import pytest
from pyspark.sql import functions as F

from firmwarescraper_spark.operators import extract as EX

NAV = ('<div class="nav"><a href="/">home</a> <a href="/a">about us page</a>'
       ' <a href="/b">more links here</a></div>')
BODY1 = "<p>this is the real body of the page with plenty of text</p>"
PROMO = '<div>see <a href="/x">this great promotional offer right now</a> ok</div>'
BODY2 = "<p>a second real paragraph that also has enough visible text</p>"
FOOT = '<div class="footer"><a href="/tos">terms</a> <a href="/p">privacy</a></div>'
PAGE = NAV + BODY1 + PROMO + BODY2 + FOOT


def _mc(spark, html, **kw):
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    return EX.main_content(df, **kw).collect()[0]


def test_main_content_golden(spark):
    row = _mc(spark, PAGE)
    assert row["main_text"] == (
        "this is the real body of the page with plenty of text\n"
        "a second real paragraph that also has enough visible text"
    )
    # nav, body1, promo, body2, footer all have visible text
    assert row["n_blocks"] == 5
    assert row["n_kept"] == 2
    assert row["main_len"] == len(row["main_text"])


def test_main_content_density_gate(spark):
    # the promo block is long enough (>25 chars) but ~86% of its text is
    # anchor text -> density gate drops it; loosening the gate keeps it
    row = _mc(spark, PROMO)
    assert row["n_kept"] == 0
    row = _mc(spark, PROMO, max_link_density=0.95)
    assert row["n_kept"] == 1
    assert "promotional offer" in row["main_text"]


def test_main_content_length_gate(spark):
    short = "<p>tiny clean text</p>"
    assert _mc(spark, short)["n_kept"] == 0
    assert _mc(spark, short, min_text_len=5)["n_kept"] == 1


def test_main_content_strips_scripts_and_styles(spark):
    html = ("<p>visible body text that is long enough to keep here"
            "<script>var boilerplate = 'should never ever appear';</script>"
            "<style>p { color: red }</style> and continues after</p>")
    row = _mc(spark, html)
    assert "boilerplate" not in row["main_text"]
    assert "color" not in row["main_text"]
    assert row["main_text"].startswith("visible body text")
    assert row["main_text"].endswith("and continues after")


def test_main_content_case_insensitive_blocks(spark):
    html = "<P>upper case paragraph tags still delimit blocks fine</P><BR>"
    assert _mc(spark, html)["n_kept"] == 1


def test_main_content_plan_has_no_exchange(spark):
    df = spark.createDataFrame([(1, PAGE)], ["doc_id", "html"])
    plan = EX.main_content(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_anchor_pairs_golden(spark):
    html = ('<a href="/x">First Link</a> <A HREF="/y">second\n link</A>'
            ' <a name="noref">no href</a> <a href="/z"><img src="i"/></a>')
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    rows = {r["href"]: r["anchor"] for r in EX.anchor_pairs(df).collect()}
    # uppercase attribute + embedded newline both extract; the href-less
    # anchor and the image-only (no visible text) anchor are dropped
    assert rows == {"/x": "First Link", "/y": "second link"}


def test_anchor_pairs_truncates_text(spark):
    html = '<a href="/long">' + "word " * 60 + "</a>"
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    row = EX.anchor_pairs(df, max_text_len=40).collect()[0]
    assert len(row["anchor"]) == 40


def test_anchor_texts_aggregation(spark):
    pages = [
        (1, '<a href="/t">alpha</a> <a href="/t">beta</a> <a href="/u">x y</a>'),
        (2, '<a href="/t">alpha</a> <a href="/t">gamma</a>'),
    ]
    df = spark.createDataFrame(pages, ["doc_id", "html"])
    out = {r["href"]: r for r in EX.anchor_texts(df).collect()}
    assert out["/t"]["n_links"] == 4          # alpha twice counts twice
    assert out["/t"]["n_texts"] == 3          # but once among distinct
    assert out["/t"]["texts"] == "alpha|beta|gamma"  # sorted
    assert out["/u"]["n_links"] == 1 and out["/u"]["texts"] == "x y"


def test_anchor_texts_caps_phrase_list(spark):
    html = " ".join(f'<a href="/t">phrase {i:02d}</a>' for i in range(30))
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    row = EX.anchor_texts(df, max_texts=5).collect()[0]
    assert row["n_texts"] == 30               # count is NOT truncated
    assert row["texts"].count("|") == 4       # phrase list is


def test_extract_on_crawl_corpus(spark, tmp_path):
    """Smoke over the vendor page corpus: extraction never emits markup,
    and link-farm vendor index pages yield anchor pairs."""
    from firmwarescraper_spark.sources import generate as G

    path = str(tmp_path / "pages")
    G.write_corpus(spark, path, n_avm=2, n_linksys=2)
    pages = spark.read.parquet(path).filter(F.col("html").isNotNull())
    mc = EX.main_content(pages, html_col="html")
    assert mc.filter(F.col("main_text").contains("<")).count() == 0
    assert EX.anchor_pairs(pages, html_col="html").count() > 0


# ---------------------------------------------------------------------------
# robots directives (meta robots + rel=nofollow)
# ---------------------------------------------------------------------------


def _robots(spark, html):
    from firmwarescraper_spark.operators.extract import robots_directives

    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = robots_directives(df).collect()[0]
    return (r["noindex"], r["nofollow"], r["n_links"], r["n_followable"])


def test_robots_meta_tokens(spark):
    assert _robots(
        spark,
        '<meta name="robots" content="noindex , nofollow">'
        '<a href="/a">x</a>',
    ) == (True, True, 1, 0)
    # 'none' implies both; token parsing trims spaced commas
    assert _robots(
        spark, '<meta name="robots" content=" none ">'
    ) == (True, True, 0, 0)
    assert _robots(
        spark, '<meta name="robots" content="index, follow"><a href="/a">x</a>'
    ) == (False, False, 1, 1)
    # no meta element at all: everything followable
    assert _robots(spark, '<a href="/a">x</a>') == (False, False, 1, 1)
    # substrings must NOT match tokens ('noindexing' is not 'noindex')
    assert _robots(
        spark, '<meta name="robots" content="noindexing">'
    ) == (False, False, 0, 0)


def test_robots_nofollow_anchors(spark):
    html = (
        '<a href="/a">a</a> <a rel="nofollow" href="/spam">s</a> '
        '<a name="top">no href</a> <a href="/b">b</a>'
    )
    assert _robots(spark, html) == (False, False, 3, 2)
    # page-level nofollow zeroes followable but keeps the link count
    assert _robots(
        spark, '<meta name="robots" content="nofollow">' + html
    ) == (False, True, 3, 0)


def test_robots_case_insensitive(spark):
    assert _robots(
        spark,
        '<META NAME="robots" CONTENT="NOINDEX">'
        '<A REL="NOFOLLOW" HREF="/x">x</A>',
    ) == (True, False, 1, 0)


# ---------------------------------------------------------------------------
# charset detection + transcoding
# ---------------------------------------------------------------------------

def _cs(spark, payloads):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, payload binary")
    return {r["doc_id"]: r
            for r in EX.detect_charset(df).collect()}


def test_detect_charset_bom_precedence(spark):
    text = "café naïve résumé body"
    out = _cs(spark, [
        b"\xef\xbb\xbf" + text.encode("utf-8"),
        b"\xff\xfe" + text.encode("utf-16le"),
        b"\xfe\xff" + text.encode("utf-16be"),
        # BOM beats a contradicting meta tag
        b"\xef\xbb\xbf" + ('<meta charset="iso-8859-1">' + text).encode("utf-8"),
    ])
    assert (out[0]["charset"], out[0]["via"], out[0]["text"]) == (
        "utf-8", "bom", text)
    assert (out[1]["charset"], out[1]["via"], out[1]["text"]) == (
        "utf-16le", "bom", text)
    assert (out[2]["charset"], out[2]["via"], out[2]["text"]) == (
        "utf-16be", "bom", text)
    assert out[3]["via"] == "bom" and out[3]["charset"] == "utf-8"


def test_detect_charset_meta_labels(spark):
    l1 = '<meta charset="ISO-8859-1"><p>café</p>'
    w1252 = "<meta charset='windows-1252'>café"
    u8 = '<html><head><meta http-equiv="Content-Type" ' \
         'content="text/html; charset=utf-8"></head>café</html>'
    out = _cs(spark, [l1.encode("latin-1"), w1252.encode("latin-1"),
                      u8.encode("utf-8")])
    assert (out[0]["charset"], out[0]["via"], out[0]["text"]) == (
        "iso-8859-1", "meta", l1)
    # windows-1252 normalizes to the latin-1 decoder (documented)
    assert (out[1]["charset"], out[1]["text"]) == ("iso-8859-1", w1252)
    assert (out[2]["charset"], out[2]["via"], out[2]["text"]) == (
        "utf-8", "meta", u8)


def test_detect_charset_validation_and_fallback(spark):
    out = _cs(spark, [
        "plain café utf-8 no declaration".encode("utf-8"),
        "bare latin-1 café".encode("latin-1"),    # 0xE9: invalid utf-8
        b"pure ascii only",
    ])
    assert (out[0]["charset"], out[0]["via"]) == ("utf-8", "valid-utf8")
    assert out[0]["text"] == "plain café utf-8 no declaration"
    assert (out[1]["charset"], out[1]["via"]) == ("iso-8859-1", "fallback")
    assert out[1]["text"] == "bare latin-1 café"
    # ascii is valid utf-8 — no fallback label
    assert (out[2]["charset"], out[2]["via"]) == ("utf-8", "valid-utf8")


def test_detect_charset_hostile_never_raises(spark):
    """Lying/malformed declarations downgrade, never raise: meta utf-8
    over invalid bytes, a BOM over a truncated UTF-16 body (odd length),
    a BOM over an invalid UTF-8 body, a meta claiming UTF-16 (ignored
    per html5), and a null payload."""
    lying_meta = b'<meta charset="utf-8">caf\xe9'        # latin-1 byte
    odd_utf16 = b"\xff\xfeA"                              # 1-byte body
    bad_bom8 = b"\xef\xbb\xbf\xe9\xe9"
    meta16 = '<meta charset="utf-16">plain ascii'.encode("ascii")
    out = _cs(spark, [lying_meta, odd_utf16, bad_bom8, meta16, None])
    assert (out[0]["charset"], out[0]["via"]) == ("iso-8859-1", "fallback")
    assert out[0]["text"].endswith("café")
    assert (out[1]["charset"], out[1]["via"]) == ("iso-8859-1", "fallback")
    assert (out[2]["charset"], out[2]["via"]) == ("iso-8859-1", "fallback")
    # utf-16 meta ignored -> ascii body validates as utf-8
    assert (out[3]["charset"], out[3]["via"]) == ("utf-8", "valid-utf8")
    assert out[4]["charset"] is None and out[4]["via"] == "null"


def test_detect_charset_meta_scan_window(spark):
    """A meta tag past meta_scan_bytes is not seen (the prefix bound is
    what keeps per-row cost flat at 100 TB)."""
    far = b" " * 2000 + '<meta charset="iso-8859-1">caf\xe9'.encode("latin-1")
    out = _cs(spark, [far])
    assert (out[0]["charset"], out[0]["via"]) == ("iso-8859-1", "fallback")


def test_detect_charset_shuffle_free(spark):
    df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
    plan = EX.detect_charset(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# HTML entity decoding
# ---------------------------------------------------------------------------

def _ent(spark, rows):
    df = spark.createDataFrame(
        list(enumerate(rows)), "doc_id long, text string")
    return {r["doc_id"]: r for r in EX.decode_entities(df).collect()}


def test_decode_entities_named_and_numeric(spark):
    out = _ent(spark, [
        "a &amp; b &lt;tag&gt; &eacute;",
        "caf&#233; caf&#xE9; caf&#xe9;",     # decimal + both hex cases
        "&eacute;",                            # entity IS the string
        "tail &amp;",
    ])
    assert (out[0]["text_decoded"], out[0]["n_entities"]) == (
        "a & b <tag> é", 4)
    assert out[1]["text_decoded"] == "café café café"
    assert out[2]["text_decoded"] == "é"
    assert out[3]["text_decoded"] == "tail &"


def test_decode_entities_single_pass_no_double_decode(spark):
    """'&amp;#233;' is the AMP entity followed by literal '#233;' —
    decoding must not re-scan its own output into 'é'."""
    out = _ent(spark, ["&amp;#233; stays literal"])
    assert out[0]["text_decoded"] == "&#233; stays literal"
    assert out[0]["n_entities"] == 1


def test_decode_entities_astral_plane(spark):
    """Supplementary-plane codepoints go through the computed
    surrogate-pair construction (Spark has no full-range chr)."""
    out = _ent(spark, ["emoji &#128512; and hex &#x1F680;"])
    assert out[0]["text_decoded"] == "emoji \U0001F600 and hex \U0001F680"


def test_decode_entities_hostile_kept_literal(spark):
    """Surrogate-block, zero, out-of-range, overflow-length, and
    unknown-name entities all keep their literal form — never raise."""
    s = ("bad &#xD800; &#0; &#1114112; &#99999999999999999999; "
         "&unknown; &noSemi end")
    out = _ent(spark, [s, None, "no entities here"])
    assert out[0]["text_decoded"] == s
    assert out[0]["n_entities"] == 5      # noSemi is not an entity token
    assert out[1]["text_decoded"] is None
    assert (out[2]["text_decoded"], out[2]["n_entities"]) == (
        "no entities here", 0)


def test_decode_entities_shuffle_free(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = EX.decode_entities(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
