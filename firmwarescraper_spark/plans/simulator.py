"""Pure-Python reference crawl simulator — the parity oracle.

Replays the reference spiders' logical crawl single-threaded over an
in-memory ``{url: html}`` corpus and emits (visit order, seen set, items).
This defines the reference behavior the Spark engine must match
(SURVEY.md §7.0 semantics pins):

* **Ordering pin**: scrapy's live order is nondeterministic under
  concurrency; the pinned reference order is depth-first pre-order in
  yield order (priority queues with all-equal priority, concurrency 1).
  The simulator uses an explicit stack, pushing each callback's yielded
  requests in reverse so pop order == yield order.
* **Seen pin**: dupefilter semantics — a request is dropped iff its
  canonicalized-URL fingerprint was already enqueued
  (scrapy RFPDupeFilter; /root/reference/requirements.txt:1). Fingerprint
  here is ``canonicalize_url(url) + '\\x00' + form_body``.

Spider rules are expressed with the same single-document extractors and
scalar twins the Spark rule packs use (functions/html.py,
functions/versions.py), so any divergence between engine and simulator
isolates to the dataflow, not the scalar layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from firmwarescraper_spark.functions import html as H
from firmwarescraper_spark.functions import url as U
from firmwarescraper_spark.functions import versions as V


@dataclass
class SimRequest:
    url: str
    rule: str
    lineage: dict = field(default_factory=dict)
    depth: int = 0
    seq: str = ""  # deterministic DFS path key: zero-padded link positions


@dataclass
class SimResult:
    order: list = field(default_factory=list)   # (seq, url, canon, depth, rule)
    seen: set = field(default_factory=set)      # canonical URLs
    items: list = field(default_factory=list)   # item dicts (list-wrapped)


def _pad(i: int) -> str:
    return f"{i:06d}"


# ---------------------------------------------------------------------------
# AVM spider rules (/root/reference/firmware/spiders/avm.py)
# ---------------------------------------------------------------------------

AVM_DEVICE_CLASSES = [
    (("fritzrepeater", "fritzwlan-repeater"), "Repeater"),
    (("fritzwlan-usb",), "Wifi-Stick"),
    (("fritzpowerline",), "PLC Adapter"),
]


def avm_map_device_class(product: str) -> str:
    for prefixes, cls in AVM_DEVICE_CLASSES:
        if product.startswith(prefixes):
            return cls
    return "Router"


def _avm_extract_links(url: str, html: str, ignore) -> list:
    return [
        U.url_join(url, h) for h in H.extract_hrefs(html) if not h.startswith(ignore)
    ]


def _avm_extract_dates(html: str) -> list:
    import re

    out = []
    for text in H.extract_pre_texts(html):
        m = re.search(V.AVM_DATE_RE, text)
        if m:
            out.append(V.avm_convert_date(m.group(1)))
    return out


def _avm_parse(req: SimRequest, html: str):
    for pos, link in enumerate(
        _avm_extract_links(req.url, html, ("beta", "tools", "license", ".."))
    ):
        yield SimRequest(link, "avm:parse_product", {}, req.depth + 1,
                         req.seq + "." + _pad(pos))


def _avm_parse_product(req: SimRequest, html: str):
    path = req.url.split("/")[:-1]
    if path and path[-1] == "fritz.os":
        device_name = path[-3]
        dates = _avm_extract_dates(html)
        links = _avm_extract_links(req.url, html, "..")
        for index, file_url in enumerate(links):
            if file_url.endswith(".image"):
                release_date = dates[index] if index < len(dates) else None
                yield {
                    "file_urls": [file_url],
                    "vendor": ["AVM"],
                    "device_name": [device_name],
                    "firmware_version": [
                        V.avm_extract_version(file_url.split("/")[-1], device_name)
                    ],
                    "device_class": [avm_map_device_class(device_name)],
                    "release_date": [release_date],
                }
    else:
        for pos, sub in enumerate(
            _avm_extract_links(req.url, html, ("recover", ".."))
        ):
            yield SimRequest(sub, "avm:parse_product", {}, req.depth + 1,
                             req.seq + "." + _pad(pos))


# ---------------------------------------------------------------------------
# Linksys spider rules (/root/reference/firmware/spiders/linksys.py)
# ---------------------------------------------------------------------------

LINKSYS_DEVICE_CLASSES = [
    (["AM"], "Modem"),
    (["CIT"], "Internet Telephone"),
    (["EF", "EP", "PPS", "PSU", "WPS"], "Print Server"),
    (["DMP", "DMC", "DMR", "DMS", "KWH", "MCC"], "Wireless Home Audio"),
    (["DMA"], "Media Center Extender"),
    (["LACP"], "Injector"),
    (["LACX", "LACG"], "Transceiver"),
    (["LAPN", "LAPAC"], "Business Access Point"),
    (["LCA"], "Business Camera"),
    (["LMR", "LNR"], "Business Video Recorder"),
    (["LNE", "EG", "WMP"], "PCI Network Adapter"),
    (["LRT"], "VPN Router"),
    (["LGS"], "Business Switch"),
    (["MR", "EA", "WRT", "E", "BEF", "WKU", "WRK"], "Router"),
    (["M10", "M20"], "Hotspot"),
    (["NMH"], "Media Hub"),
    (["NSL"], "Network Storage Link"),
    (["PCM"], "CardBus PC Card"),
    (["PL"], "PLC Adapter"),
    (["RE", "WRE"], "Repeater"),
    (["SE", "EZX"], "Home Switch"),
    (["WAP"], "Home Access Point"),
    (["WET", "WUM", "WES"], "Bridge"),
    (["WGA", "WMA", "WPC"], "Wireless Adapter"),
    (["WHW", "VLP", "MX"], "Wifi Mesh System"),
    (["WMC", "WVC"], "Home Camera"),
    (["WML"], "Music System"),
    (["WUSB", "USB", "AE"], "Wifi USB Adapter"),
    (["X", "AG", "WAG"], "Modem Router"),
]


def linksys_map_device_class(product: str):
    """First match wins in declaration order (linksys.py:126-133); None on
    miss (the reference raises UnknownDeviceClassException — the engine
    quarantines instead, SURVEY.md §2.3 J3)."""
    for shortcuts, cls in LINKSYS_DEVICE_CLASSES:
        for sc in shortcuts:
            if product.startswith(sc):
                return cls
    return None


def _linksys_parse(req: SimRequest, html: str):
    anchors = H.extract_anchors(html, div_class="item")
    hrefs = [a[0] for a in anchors if a[0] is not None]
    names = [a[1] for a in anchors]
    for pos, (href, name) in enumerate(zip(hrefs, names)):
        yield SimRequest(U.url_join(req.url, href), "linksys:parse_product",
                         {"device_name": name}, req.depth + 1,
                         req.seq + "." + _pad(pos))


def _linksys_parse_product(req: SimRequest, html: str):
    dl = [
        a[0]
        for a in H.extract_anchors(html, div_class="support-downloads")
        if a[2] == "Download Software" and a[0]
    ]
    if dl:
        yield SimRequest(U.url_join(req.url, dl[0]), "linksys:parse_versions",
                         req.lineage, req.depth + 1, req.seq + "." + _pad(0))


def _linksys_parse_versions(req: SimRequest, html: str):
    import re

    device_name = req.lineage["device_name"]
    blocks = H.extract_div_html(
        html, div_class="article-accordian-content",
        parent_id="support-article-downloads",
    )
    for block in blocks:
        seen_meta = []  # PRODUCT_DICTIONARIES reset per version page (linksys.py:85)
        for firmware in re.findall(r"Ver.+href=\".+(?:bin|img)\"", block):
            if re.search(r"(\.img|\.bin)", firmware):
                cls = linksys_map_device_class(device_name)
                if cls is None:
                    continue
                meta = V.linksys_meta(firmware, device_name, cls)
                if meta in seen_meta:
                    continue
                seen_meta.append(meta)
                yield {k: [v] if not isinstance(v, list) else v
                       for k, v in meta.items()}


RULES = {
    "avm:parse": _avm_parse,
    "avm:parse_product": _avm_parse_product,
    "linksys:parse": _linksys_parse,
    "linksys:parse_product": _linksys_parse_product,
    "linksys:parse_versions": _linksys_parse_versions,
}


def simulate(corpus: dict, seeds: list) -> SimResult:
    """Run the pinned reference crawl.

    corpus: {url: html-string}; seeds: [(url, rule)].
    """
    res = SimResult()
    stack = []
    for i, (url, rule) in enumerate(seeds):
        req = SimRequest(url, rule, {}, 0, _pad(i))
        canon = U.canonicalize_url(req.url)
        if canon not in res.seen:
            res.seen.add(canon)
            stack.append(req)
    # DFS pre-order in yield order: reverse-push children, pop from the end
    stack.reverse()
    while stack:
        req = stack.pop()
        canon = U.canonicalize_url(req.url)
        res.order.append((req.seq, req.url, canon, req.depth, req.rule))
        html = corpus.get(canon)
        if html is None:
            continue  # 404 — logged, not fatal (handle_httpstatus_list)
        children = []
        for out in RULES[req.rule](req, html):
            if isinstance(out, SimRequest):
                ccanon = U.canonicalize_url(out.url)
                if ccanon in res.seen:
                    continue
                res.seen.add(ccanon)
                children.append(out)
            else:
                res.items.append(out)
        stack.extend(reversed(children))
    return res
