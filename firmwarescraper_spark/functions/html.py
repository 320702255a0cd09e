"""Vectorized HTML extraction — the engine's table-valued UDF layer.

The reference queries pages with parsel/lxml XPath
(/root/reference/firmware/tests/mock_classes.py:15-17). This container has
no lxml, so the engine implements the *specific XPath queries the spiders
use* on top of the stdlib ``html.parser`` — a single parse pass per page
collects everything the rule packs need (anchors with ancestor scope,
``<pre>`` text nodes, raw inner HTML of selected ``<div>`` blocks,
``<script>`` bodies, table cells). Semantics are pinned by the golden
fixtures ported from /root/reference/firmware/tests/test_avm.py:6-72 and
test_linksys.py:6-91.

Spark surface: every extractor is exposed as an Arrow-batched pandas UDF
returning ``array<...>`` columns which rule packs ``explode``/``posexplode``
— the positional-zip-join pattern (SURVEY.md §2.3 J1/J2). No per-row
Python UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)


@dataclass
class _Anchor:
    href: str | None
    title: str | None
    onclick: str | None
    text: str
    div_classes: tuple  # classes of all ancestor <div>s
    div_ids: tuple      # ids of all ancestor <div>s


@dataclass
class _DivBlock:
    classes: tuple
    div_id: str | None
    parent_classes: tuple
    parent_id: str | None
    start: int
    end: int = -1
    inner_start: int = -1


@dataclass
class _ParsedDoc:
    anchors: list = field(default_factory=list)
    pre_texts: list = field(default_factory=list)
    div_blocks: list = field(default_factory=list)
    head_scripts: list = field(default_factory=list)
    tables: list = field(default_factory=list)   # list of rows; row = list of cell texts
    raw: str = ""


class _Parser(HTMLParser):
    def __init__(self, raw: str):
        super().__init__(convert_charrefs=True)
        self.raw = raw
        self.doc = _ParsedDoc(raw=raw)
        self._line_offsets = [0]
        for i, ch in enumerate(raw):
            if ch == "\n":
                self._line_offsets.append(i + 1)
        self._div_stack: list[_DivBlock] = []
        self._cur_anchor: _Anchor | None = None
        self._in_pre = 0
        self._in_head = 0
        self._in_script = 0
        self._script_buf: list[str] = []
        self._cur_row: list | None = None
        self._cur_cell: list | None = None
        self._cur_table: list | None = None

    def _abs(self) -> int:
        line, col = self.getpos()
        return self._line_offsets[line - 1] + col

    # -- tags -------------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "div":
            start = self._abs()
            parent = self._div_stack[-1] if self._div_stack else None
            blk = _DivBlock(
                classes=tuple((a.get("class") or "").split()),
                div_id=a.get("id"),
                parent_classes=parent.classes if parent else (),
                parent_id=parent.div_id if parent else None,
                start=start,
            )
            # inner HTML starts right after this start tag
            end_of_tag = self.raw.find(">", start)
            blk.inner_start = end_of_tag + 1
            self._div_stack.append(blk)
        elif tag == "a":
            self._cur_anchor = _Anchor(
                href=a.get("href"),
                title=a.get("title"),
                onclick=a.get("onclick"),
                text="",
                div_classes=tuple(c for b in self._div_stack for c in b.classes),
                div_ids=tuple(b.div_id for b in self._div_stack if b.div_id),
            )
        elif tag == "pre":
            self._in_pre += 1
        elif tag == "head":
            self._in_head += 1
        elif tag == "script":
            self._in_script += 1
            self._script_buf = []
        elif tag == "table":
            self._cur_table = []
        elif tag == "tr":
            self._cur_row = []
        elif tag in ("td", "th"):
            self._cur_cell = []

    def handle_endtag(self, tag):
        if tag == "div" and self._div_stack:
            blk = self._div_stack.pop()
            blk.end = self._abs()
            self.doc.div_blocks.append(blk)
        elif tag == "a" and self._cur_anchor is not None:
            self.doc.anchors.append(self._cur_anchor)
            self._cur_anchor = None
        elif tag == "pre" and self._in_pre:
            self._in_pre -= 1
        elif tag == "head" and self._in_head:
            self._in_head -= 1
        elif tag == "script" and self._in_script:
            self._in_script -= 1
            if self._in_head:
                self.doc.head_scripts.append("".join(self._script_buf))
        elif tag in ("td", "th") and self._cur_cell is not None:
            if self._cur_row is not None:
                self._cur_row.append("".join(self._cur_cell))
            self._cur_cell = None
        elif tag == "tr" and self._cur_row is not None:
            if self._cur_table is not None:
                self._cur_table.append(self._cur_row)
            self._cur_row = None
        elif tag == "table" and self._cur_table is not None:
            self.doc.tables.append(self._cur_table)
            self._cur_table = None

    # -- text ---------------------------------------------------------------
    def handle_data(self, data):
        if self._cur_anchor is not None:
            self._cur_anchor.text += data
        elif self._in_pre:
            self.doc.pre_texts.append(data)
        if self._in_script:
            self._script_buf.append(data)
        if self._cur_cell is not None:
            self._cur_cell.append(data)


def parse_html(html) -> _ParsedDoc:
    """Single-pass parse; accepts str or bytes (UTF-8)."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Parser(html)
    p.feed(html)
    p.close()
    return p.doc


# ---------------------------------------------------------------------------
# Single-document extractors (shared with plans/simulator.py)
# ---------------------------------------------------------------------------

def extract_hrefs(html) -> list:
    """XPath ``//a/@href`` in document order — F1
    (/root/reference/firmware/spiders/avm.py:73-75)."""
    return [a.href for a in parse_html(html).anchors if a.href is not None]


def extract_anchors(html, div_class: str | None = None, div_id: str | None = None):
    """(href, text, title, onclick) tuples, optionally scoped to anchors
    under a ``<div>`` with the given class token / id — the scoped XPaths
    of /root/reference/firmware/spiders/linksys.py:58-64."""
    out = []
    for a in parse_html(html).anchors:
        if div_class is not None and div_class not in a.div_classes:
            continue
        if div_id is not None and div_id not in a.div_ids:
            continue
        out.append((a.href, a.text, a.title, a.onclick))
    return out


def extract_pre_texts(html) -> list:
    """XPath ``//pre/text()`` — each text node between tags inside <pre>
    (/root/reference/firmware/spiders/avm.py:77-84)."""
    return parse_html(html).pre_texts


def extract_div_html(html, div_class: str | None = None, div_id: str | None = None,
                     parent_id: str | None = None) -> list:
    """Raw inner HTML of each matching <div>, in document order — parsel
    ``extract()`` on a div node (/root/reference/firmware/spiders/linksys.py:63,81)."""
    doc = parse_html(html)
    matched = [
        b for b in doc.div_blocks
        if (div_class is None or div_class in b.classes)
        and (div_id is None or b.div_id == div_id)
        and (parent_id is None or b.parent_id == parent_id)
    ]
    matched.sort(key=lambda b: b.inner_start)
    return [doc.raw[b.inner_start:b.end] for b in matched]


def extract_head_script_texts(html) -> list:
    """Text of each ``<head><script>`` — ASUS redirect harvest
    (/root/reference/firmware/spiders/asus.py:44-51)."""
    return parse_html(html).head_scripts


def extract_table_rows(html) -> list:
    """All table rows as lists of cell texts — HP / Linksys-GPL table walks
    (/root/reference/firmware/spiders/hp.py:20-30, linksys_gpl.py:54-70)."""
    doc = parse_html(html)
    return [row for table in doc.tables for row in table]


def extract_text(html) -> str:
    """Pinned HTML->text rule (input_hint: byte-identical per url):
    stripped non-empty text nodes (anchors' text, <pre> chunks, cell and
    body text, in document order) joined with a single newline. Both the
    corpus generator and the engine use this one function, so the
    invariant is enforced by construction and tested end-to-end."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")

    chunks: list[str] = []

    class _TextParser(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self._skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self._skip += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self._skip:
                self._skip -= 1

        def handle_data(self, data):
            if not self._skip:
                s = data.strip()
                if s:
                    chunks.append(s)

    p = _TextParser()
    p.feed(html)
    p.close()
    return "\n".join(chunks)


@lru_cache(maxsize=None)
def extract_text_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def _extract_text(html: pd.Series) -> pd.Series:
        return html.map(extract_text, na_action="ignore")

    return _extract_text


# ---------------------------------------------------------------------------
# Arrow-batched pandas UDF factories
# ---------------------------------------------------------------------------

_ANCHOR_SCHEMA = ArrayType(
    StructType(
        [
            StructField("href", StringType()),
            StructField("text", StringType()),
            StructField("title", StringType()),
            StructField("onclick", StringType()),
        ]
    )
)

# ---------------------------------------------------------------------------
# parse-once page struct: ONE parse per page yields every extraction product;
# rule packs then operate with JVM array functions (filter/transform/explode)
# on the struct — no further Python in the round's hot path.
# ---------------------------------------------------------------------------

PAGE_STRUCT = StructType([
    StructField("hrefs", ArrayType(StringType())),
    StructField("anchors", ArrayType(StructType([
        StructField("href", StringType()),
        StructField("text", StringType()),
        StructField("title", StringType()),
        StructField("onclick", StringType()),
        StructField("div_classes", ArrayType(StringType())),
        StructField("div_ids", ArrayType(StringType())),
    ]))),
    StructField("pre_texts", ArrayType(StringType())),
    StructField("divs", ArrayType(StructType([
        StructField("classes", ArrayType(StringType())),
        StructField("id", StringType()),
        StructField("parent_id", StringType()),
        StructField("html", StringType()),
    ]))),
    StructField("scripts", ArrayType(StringType())),
])


def parse_page(html) -> dict:
    """Single-parse extraction of everything the rule packs consume."""
    doc = parse_html(html)
    divs = sorted(doc.div_blocks, key=lambda b: b.inner_start)
    return {
        "hrefs": [a.href for a in doc.anchors if a.href is not None],
        "anchors": [
            {
                "href": a.href, "text": a.text, "title": a.title,
                "onclick": a.onclick,
                "div_classes": list(a.div_classes),
                "div_ids": list(a.div_ids),
            }
            for a in doc.anchors
        ],
        "pre_texts": list(doc.pre_texts),
        "divs": [
            {
                "classes": list(b.classes), "id": b.div_id,
                "parent_id": b.parent_id,
                "html": doc.raw[b.inner_start:b.end],
            }
            for b in divs
        ],
        "scripts": list(doc.head_scripts),
    }


@lru_cache(maxsize=None)
def parse_page_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(PAGE_STRUCT)
    def _parse_page(html: pd.Series) -> pd.DataFrame:
        parsed = [parse_page(h) if h is not None else
                  {"hrefs": None, "anchors": None, "pre_texts": None,
                   "divs": None, "scripts": None}
                  for h in html]
        return pd.DataFrame(parsed, index=html.index)

    return _parse_page


@lru_cache(maxsize=None)
def extract_hrefs_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def _extract_hrefs(html: pd.Series) -> pd.Series:
        return html.map(extract_hrefs, na_action="ignore")

    return _extract_hrefs


@lru_cache(maxsize=None)
def extract_anchors_udf(div_class: str | None = None, div_id: str | None = None):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_ANCHOR_SCHEMA)
    def _extract_anchors(html: pd.Series) -> pd.Series:
        return html.map(
            lambda h: extract_anchors(h, div_class=div_class, div_id=div_id),
            na_action="ignore",
        )

    return _extract_anchors


@lru_cache(maxsize=None)
def extract_pre_texts_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def _extract_pre_texts(html: pd.Series) -> pd.Series:
        return html.map(extract_pre_texts, na_action="ignore")

    return _extract_pre_texts


@lru_cache(maxsize=None)
def extract_div_html_udf(div_class: str | None = None, div_id: str | None = None,
                         parent_id: str | None = None):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def _extract_div_html(html: pd.Series) -> pd.Series:
        return html.map(
            lambda h: extract_div_html(h, div_class=div_class, div_id=div_id,
                                       parent_id=parent_id),
            na_action="ignore",
        )

    return _extract_div_html


@lru_cache(maxsize=None)
def extract_head_scripts_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def _extract_head_scripts(html: pd.Series) -> pd.Series:
        return html.map(extract_head_script_texts, na_action="ignore")

    return _extract_head_scripts


@lru_cache(maxsize=None)
def extract_table_rows_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(ArrayType(StringType())))
    def _extract_table_rows(html: pd.Series) -> pd.Series:
        return html.map(extract_table_rows, na_action="ignore")

    return _extract_table_rows
