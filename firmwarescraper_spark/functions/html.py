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
    classes: tuple        # the anchor's own class tokens
    class_attr: str | None
    div_classes: tuple    # classes of all ancestor <div>s
    div_ids: tuple        # ids of all ancestor <div>s
    td_classes: tuple     # classes of the enclosing <td>, if any
    tr_classes: tuple     # classes of the enclosing <tr>, if any
    li_classes: tuple     # classes of the enclosing <li>, if any


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
class _Text:
    tag: str
    classes: tuple
    elem_id: str | None
    text: str  # direct text nodes only (XPath tag/text())


@dataclass
class _Cell:
    td_classes: tuple
    direct_text: str          # direct + div-wrapped text (td//div/text() style)
    texts: list               # all descendant text nodes
    hrefs: list               # descendant a/@href
    a_titles: list            # descendant a/@title
    a_texts: list
    classed_hrefs: list       # hrefs of descendant anchors that carry @class
    span_first_texts: list    # first text node of each descendant <span>
    input_names: list         # names of <input> elements inside the cell
    inner_start: int = -1
    inner_end: int = -1
    inner_html: str = ""


@dataclass
class _Row:
    tr_classes: tuple
    onclick: str | None
    cells: list = field(default_factory=list)


@dataclass
class _Para:
    bold_texts: list = field(default_factory=list)  # strong / bold-span text
    a_texts: list = field(default_factory=list)
    a_hrefs: list = field(default_factory=list)


@dataclass
class _ParsedDoc:
    anchors: list = field(default_factory=list)
    pre_texts: list = field(default_factory=list)
    div_blocks: list = field(default_factory=list)
    head_scripts: list = field(default_factory=list)
    rows: list = field(default_factory=list)      # _Row, document order
    texts: list = field(default_factory=list)     # _Text for classed/id'd h1,h2,span,div
    paras: list = field(default_factory=list)     # _Para for <p> with bold markers
    inputs: list = field(default_factory=list)    # (name, value)
    raw: str = ""

    @property
    def tables(self):
        """Back-compat: rows as lists of concatenated cell text."""
        return [[["".join(c.texts) for c in r.cells] for r in self.rows]]


_BOLD_STYLE = "FONT-WEIGHT: bold"


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
        self._cur_row: _Row | None = None
        self._cur_cell: _Cell | None = None
        self._td_stack: list[tuple] = []
        self._tr_stack: list[tuple] = []
        self._li_stack: list[tuple] = []
        self._text_stack: list[_Text] = []   # open h1/h2/span/div text captures
        self._cur_para: _Para | None = None
        self._bold_depth = 0                 # inside strong / bold span within <p>
        self._span_in_cell: list | None = None  # first-text sink of open span in cell

    def _abs(self) -> int:
        line, col = self.getpos()
        return self._line_offsets[line - 1] + col

    @staticmethod
    def _classes(a: dict) -> tuple:
        return tuple((a.get("class") or "").split())

    # -- tags -------------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        cls = self._classes(a)
        if tag == "div":
            start = self._abs()
            parent = self._div_stack[-1] if self._div_stack else None
            if a.get("data-class"):
                # XPath @data-class selectors become 'data-<value>' tokens
                cls = cls + tuple("data-" + t for t in a["data-class"].split())
            blk = _DivBlock(
                classes=cls,
                div_id=a.get("id"),
                parent_classes=parent.classes if parent else (),
                parent_id=parent.div_id if parent else None,
                start=start,
            )
            blk.inner_start = self.raw.find(">", start) + 1
            self._div_stack.append(blk)
        elif tag == "a":
            self._cur_anchor = _Anchor(
                href=a.get("href"),
                title=a.get("title"),
                onclick=a.get("onclick"),
                text="",
                classes=cls,
                class_attr=a.get("class"),
                div_classes=tuple(c for b in self._div_stack for c in b.classes),
                div_ids=tuple(b.div_id for b in self._div_stack if b.div_id),
                td_classes=self._td_stack[-1] if self._td_stack else (),
                tr_classes=self._tr_stack[-1] if self._tr_stack else (),
                li_classes=self._li_stack[-1] if self._li_stack else (),
            )
            if self._cur_cell is not None:
                if a.get("href") is not None:
                    self._cur_cell.hrefs.append(a.get("href"))
                    if a.get("class") is not None:
                        self._cur_cell.classed_hrefs.append(a.get("href"))
                if a.get("title") is not None:
                    self._cur_cell.a_titles.append(a.get("title"))
        elif tag == "pre":
            self._in_pre += 1
        elif tag == "head":
            self._in_head += 1
        elif tag == "script":
            self._in_script += 1
            self._script_buf = []
        elif tag == "tr":
            self._cur_row = _Row(tr_classes=cls, onclick=a.get("onclick"))
            self._tr_stack.append(cls)
        elif tag in ("td", "th"):
            start = self._abs()
            self._cur_cell = _Cell(
                td_classes=cls, direct_text="", texts=[], hrefs=[], a_titles=[],
                a_texts=[], classed_hrefs=[], span_first_texts=[], input_names=[],
                inner_start=self.raw.find(">", start) + 1,
            )
            self._td_stack.append(cls)
        elif tag == "li":
            self._li_stack.append(cls)
        elif tag == "p":
            self._cur_para = _Para()
        elif tag == "strong":
            if self._cur_para is not None:
                self._bold_depth += 1
        elif tag == "input":
            self.doc.inputs.append((a.get("name"), a.get("value")))
            if self._cur_cell is not None and a.get("name"):
                self._cur_cell.input_names.append(a.get("name"))
        if tag == "span":
            if self._cur_para is not None and _BOLD_STYLE in (a.get("style") or ""):
                self._bold_depth += 1
            if self._cur_cell is not None:
                self._span_in_cell = []  # capture first text node
        if tag in ("h1", "h2", "span", "div") and (cls or a.get("id")):
            self._text_stack.append(_Text(tag=tag, classes=cls, elem_id=a.get("id"), text=""))

    def handle_endtag(self, tag):
        if tag == "div" and self._div_stack:
            blk = self._div_stack.pop()
            blk.end = self._abs()
            self.doc.div_blocks.append(blk)
        elif tag == "a" and self._cur_anchor is not None:
            self.doc.anchors.append(self._cur_anchor)
            if self._cur_cell is not None:
                self._cur_cell.a_texts.append(self._cur_anchor.text)
            if self._cur_para is not None:
                self._cur_para.a_texts.append(self._cur_anchor.text)
                if self._cur_anchor.href is not None:
                    self._cur_para.a_hrefs.append(self._cur_anchor.href)
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
            self._cur_cell.inner_end = self._abs()
            self._cur_cell.inner_html = self.raw[
                self._cur_cell.inner_start:self._cur_cell.inner_end]
            if self._cur_row is not None:
                self._cur_row.cells.append(self._cur_cell)
            self._cur_cell = None
            if self._td_stack:
                self._td_stack.pop()
        elif tag == "tr" and self._cur_row is not None:
            self.doc.rows.append(self._cur_row)
            self._cur_row = None
            if self._tr_stack:
                self._tr_stack.pop()
        elif tag == "li" and self._li_stack:
            self._li_stack.pop()
        elif tag == "p":
            if self._cur_para is not None and self._cur_para.bold_texts:
                self.doc.paras.append(self._cur_para)
            self._cur_para = None
            self._bold_depth = 0
        elif tag == "strong" and self._bold_depth:
            self._bold_depth -= 1
        if tag == "span":
            if self._span_in_cell is not None and self._cur_cell is not None:
                self._cur_cell.span_first_texts.append(
                    self._span_in_cell[0] if self._span_in_cell else "")
            self._span_in_cell = None
        if tag in ("h1", "h2", "span", "div") and self._text_stack and \
                self._text_stack[-1].tag == tag:
            self.doc.texts.append(self._text_stack.pop())

    # -- text ---------------------------------------------------------------
    def handle_data(self, data):
        if self._cur_anchor is not None:
            self._cur_anchor.text += data
        elif self._in_pre:
            self.doc.pre_texts.append(data)
        if self._in_script:
            self._script_buf.append(data)
        if self._cur_cell is not None:
            self._cur_cell.texts.append(data)
            if self._cur_anchor is None:
                self._cur_cell.direct_text += data
            if self._span_in_cell is not None:
                self._span_in_cell.append(data)
        if self._text_stack and self._cur_anchor is None:
            self._text_stack[-1].text += data
        if self._cur_para is not None and self._bold_depth and self._cur_anchor is None:
            self._cur_para.bold_texts.append(data)


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
        StructField("classes", ArrayType(StringType())),
        StructField("class_attr", StringType()),
        StructField("div_classes", ArrayType(StringType())),
        StructField("div_ids", ArrayType(StringType())),
        StructField("td_classes", ArrayType(StringType())),
        StructField("tr_classes", ArrayType(StringType())),
        StructField("li_classes", ArrayType(StringType())),
    ]))),
    StructField("pre_texts", ArrayType(StringType())),
    StructField("divs", ArrayType(StructType([
        StructField("classes", ArrayType(StringType())),
        StructField("id", StringType()),
        StructField("parent_id", StringType()),
        StructField("html", StringType()),
    ]))),
    StructField("scripts", ArrayType(StringType())),
    StructField("texts", ArrayType(StructType([
        StructField("tag", StringType()),
        StructField("classes", ArrayType(StringType())),
        StructField("id", StringType()),
        StructField("text", StringType()),
    ]))),
    StructField("rows", ArrayType(StructType([
        StructField("tr_classes", ArrayType(StringType())),
        StructField("onclick", StringType()),
        StructField("cells", ArrayType(StructType([
            StructField("td_classes", ArrayType(StringType())),
            StructField("direct_text", StringType()),
            StructField("texts", ArrayType(StringType())),
            StructField("hrefs", ArrayType(StringType())),
            StructField("a_titles", ArrayType(StringType())),
            StructField("a_texts", ArrayType(StringType())),
            StructField("classed_hrefs", ArrayType(StringType())),
            StructField("span_first_texts", ArrayType(StringType())),
            StructField("input_names", ArrayType(StringType())),
            StructField("inner_html", StringType()),
        ]))),
    ]))),
    StructField("paras", ArrayType(StructType([
        StructField("bold_texts", ArrayType(StringType())),
        StructField("a_texts", ArrayType(StringType())),
        StructField("a_hrefs", ArrayType(StringType())),
    ]))),
    StructField("inputs", ArrayType(StructType([
        StructField("name", StringType()),
        StructField("value", StringType()),
    ]))),
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
                "classes": list(a.classes),
                "class_attr": a.class_attr,
                "div_classes": list(a.div_classes),
                "div_ids": list(a.div_ids),
                "td_classes": list(a.td_classes),
                "tr_classes": list(a.tr_classes),
                "li_classes": list(a.li_classes),
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
        "texts": [
            {"tag": t.tag, "classes": list(t.classes), "id": t.elem_id,
             "text": t.text}
            for t in doc.texts
        ],
        "rows": [
            {
                "tr_classes": list(r.tr_classes),
                "onclick": r.onclick,
                "cells": [
                    {
                        "td_classes": list(c.td_classes),
                        "direct_text": c.direct_text,
                        "texts": list(c.texts),
                        "hrefs": list(c.hrefs),
                        "a_titles": list(c.a_titles),
                        "a_texts": list(c.a_texts),
                        "classed_hrefs": list(c.classed_hrefs),
                        "span_first_texts": list(c.span_first_texts),
                        "input_names": list(c.input_names),
                        "inner_html": c.inner_html,
                    }
                    for c in r.cells
                ],
            }
            for r in doc.rows
        ],
        "paras": [
            {"bold_texts": list(p.bold_texts), "a_texts": list(p.a_texts),
             "a_hrefs": list(p.a_hrefs)}
            for p in doc.paras
        ],
        "inputs": [{"name": n, "value": v} for n, v in doc.inputs],
    }


_EMPTY_PAGE = {k.name: None for k in PAGE_STRUCT.fields}


@lru_cache(maxsize=None)
def parse_page_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(PAGE_STRUCT)
    def _parse_page(html: pd.Series) -> pd.DataFrame:
        parsed = [parse_page(h) if h is not None else dict(_EMPTY_PAGE)
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
