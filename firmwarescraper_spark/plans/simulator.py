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
    form: dict | None = None  # POST form data (S2)


@dataclass
class SimResult:
    order: list = field(default_factory=list)   # (seq, url, canon, depth, rule)
    seen: set = field(default_factory=set)      # canonical URLs
    items: list = field(default_factory=list)   # item dicts (list-wrapped)


def _pad(i: int) -> str:
    # lexicographic DFS order invariant: width must cover the largest
    # possible link position on a page — %09d == the engine's pad width
    # (plans/crawl.py child seq); diverging widths break ordering parity
    return f"{i:09d}"


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


# ---------------------------------------------------------------------------
# TP-Link retail (/root/reference/firmware/spiders/tplink.py)
# ---------------------------------------------------------------------------

def tplink_map_device_class(product_url: str) -> str:
    """tplink.py:121-131 — note 'access_point' (underscore) never matches the
    hyphenated URLs, so the access-point category falls through to Router;
    quirk preserved."""
    if any(kw in product_url for kw in ["wifi-router", "all-gateways", "mifi"]):
        return "Router"
    if "range-extender" in product_url:
        return "Repeater"
    if "powerline" in product_url:
        return "PLC Adapter"
    if any(kw in product_url for kw in ["access_point", "deco"]):
        return "AP"
    return "Router"


def _tplink_parse(req: SimRequest, html: str):
    page = H.parse_page(html)
    pos = 0
    for a in page["anchors"]:
        if "tp-product-link" in a["classes"] and a["href"]:
            yield SimRequest(U.url_join(req.url, a["href"]), "tplink:parse_product",
                             {}, req.depth + 1, req.seq + "." + _pad(pos))
            pos += 1
    for a in page["anchors"]:
        if ("tp-product-pagination-btn" in a["classes"]
                and "tp-product-pagination-item" in a["li_classes"] and a["href"]):
            yield SimRequest(U.url_join(req.url, a["href"]), "tplink:parse",
                             {}, req.depth + 1, req.seq + "." + _pad(pos))
            pos += 1


def _tplink_parse_product(req: SimRequest, html: str):
    page = H.parse_page(html)
    names = [t["text"] for t in page["texts"]
             if t["tag"] == "h2" and "product-name" in t["classes"]]
    supports = [a["href"] for a in page["anchors"]
                if a["class_attr"] and "support" in a["class_attr"] and a["href"]]
    if not names or not supports:
        return
    yield SimRequest(U.url_join(req.url, supports[0]), "tplink:parse_firmware",
                     {"device_name": names[0],
                      "device_class": tplink_map_device_class(req.url)},
                     req.depth + 1, req.seq + "." + _pad(0))


def _tplink_parse_firmware(req: SimRequest, html: str):
    from datetime import datetime

    page = H.parse_page(html)
    file_url = None
    for row in page["rows"]:
        if "basic-info" in row["tr_classes"]:  # [1] predicate: first such row
            for c in row["cells"]:
                if c["classed_hrefs"]:
                    file_url = U.url_join(req.url, c["classed_hrefs"][0])
                    break
            break
    versions = [t["text"] for t in page["texts"]
                if t["tag"] == "span" and t["id"] == "verison-hidden"]
    date = None
    for row in page["rows"]:
        if "detail-info" in row["tr_classes"]:
            sft = row["cells"][0]["span_first_texts"] if row["cells"] else []
            date = sft[1] if len(sft) > 1 else None
            break
    device_name, device_class = req.lineage["device_name"], req.lineage["device_class"]
    version = versions[0] if versions else None
    if any(v is None for v in [device_name, device_class, file_url, version, date]):
        return  # reference raises ValueError (tplink.py:65-66); engine quarantines
    yield {
        "file_urls": [file_url],
        "vendor": ["TP-Link"],
        "device_name": [device_name],
        "firmware_version": [version.replace(device_name, "").strip()],
        "device_class": [device_class],
        "release_date": [datetime.strptime(date.strip(), "%Y-%m-%d").strftime("%d-%m-%Y")],
    }


# ---------------------------------------------------------------------------
# Netgear GPL (/root/reference/firmware/spiders/netgear_gpl.py)
# ---------------------------------------------------------------------------

NETGEAR_WHITELIST = ["AC1450"]


def _netgear_parse(req: SimRequest, html: str):
    page = H.parse_page(html)
    for para in page["paras"]:
        device_name = para["bold_texts"]  # a LIST — netgear_gpl.py:57
        if not any(allowed in device_name for allowed in NETGEAR_WHITELIST):
            continue  # exact list-membership semantics (netgear_gpl.py:46)
        for version, link in zip(para["a_texts"], para["a_hrefs"]):
            yield {
                "file_urls": [link],
                "vendor": ["Netgear"],
                "device_name": list(device_name),
                "firmware_version": [version],
                "device_class": ["-"],
                "release_date": ["01-01-1970"],
            }


# ---------------------------------------------------------------------------
# Linksys GPL (/root/reference/firmware/spiders/linksys_gpl.py)
# ---------------------------------------------------------------------------

LINKSYS_GPL_WHITELIST = ["EA7500"]


def _linksys_gpl_parse(req: SimRequest, html: str):
    page = H.parse_page(html)
    device_names = []
    for row in page["rows"][1:]:  # header skip (linksys_gpl.py:56, W3)
        cells = row["cells"]
        if len(cells) not in (2, 3):
            continue
        offset = 0
        if len(cells) == 3:
            device_names = cells[0]["texts"]
            offset = 1
        version = "".join(cells[offset]["texts"]).strip()
        link = "".join(cells[offset + 1]["hrefs"]).strip()
        for device in device_names:
            if not any(a in device for a in LINKSYS_GPL_WHITELIST):
                continue  # substring whitelist (linksys_gpl.py:44-46)
            yield {
                "file_urls": [link],
                "vendor": ["Linksys"],
                "device_name": [device.strip()],
                "firmware_version": [version],
                "device_class": ["-"],
                "release_date": ["01-01-1970"],
            }


# ---------------------------------------------------------------------------
# TP-Link GPL (/root/reference/firmware/spiders/tplink_gpl.py)
# ---------------------------------------------------------------------------

def _tplink_gpl_anchors(page):
    return [
        a for a in page["anchors"]
        if "ga-click" in a["classes"] and a["href"]
        and "data-wi-fi-routers" in a["div_classes"] and "item-box" in a["div_classes"]
    ]


def _tplink_gpl_parse(req: SimRequest, html: str):
    page = H.parse_page(html)
    pos = 0
    for a in _tplink_gpl_anchors(page):
        if "static" in a["href"]:  # ddl: direct archive (tplink_gpl.py:72-76)
            yield {
                "file_urls": [a["href"].strip()],
                "vendor": ["TP-Link"],
                "device_name": [a["text"].strip()],
                "firmware_version": ["0.0"],
                "device_class": ["Router"],
                "release_date": ["01/01/1970"],
            }
    for a in _tplink_gpl_anchors(page):
        if "static" not in a["href"]:  # multi: follow-up table (tplink_gpl.py:79-83)
            url = (f"https://www.tp-link.com/phppage/gpl-res-list.html"
                   f"{a['href'].strip()}&appPath=de")
            yield SimRequest(url, "tplink_gpl:parse_multi",
                             {"device": a["text"].strip()},
                             req.depth + 1, req.seq + "." + _pad(pos))
            pos += 1


def _tplink_gpl_parse_multi(req: SimRequest, html: str):
    page = H.parse_page(html)
    versions = []
    for row in page["rows"]:
        cells = row["cells"]
        for ci, c in enumerate(cells):
            if "model" in c["td_classes"] and ci + 1 < len(cells):
                versions.append(cells[ci + 1]["direct_text"])
    links = [a["href"] for a in page["anchors"]
             if a["class_attr"] == "bold ga-click" and a["text"] == "Download"
             and a["href"]]
    for version, link in zip(versions, links):
        yield {
            "file_urls": [link.strip()],
            "vendor": ["TP-Link"],
            "device_name": [req.lineage["device"]],
            "firmware_version": [version.strip()],
            "device_class": ["Router"],
            "release_date": ["01/01/1970"],
        }


# ---------------------------------------------------------------------------
# ASUS (/root/reference/firmware/spiders/asus.py)
# ---------------------------------------------------------------------------

ASUS_DEVICE_DICT = dict(
    gt="Router (Home)", rt="Router (Home)", rp="Repeater", ea="Access Point",
    ly="Router (Home)", bl="Router (Home)", ds="Router (Modem)",
    pc="PCIe-Networkcard", us="USB-Networkcard", bt="Bluetooth-Adapter",
    br="Router (Business)", es="Server", rs="Server", ro="Router (Gaming)",
)


def _asus_parse(req: SimRequest, html: str):
    import re

    page = H.parse_page(html)
    redirects = []  # first-occurrence-ordered dedup (pin; reference uses a set)
    for script in page["scripts"]:
        if '"url"' not in script:
            continue
        for u in re.findall(r'"url": "(https://[\w\d\-\_\./]+)"', script):
            if u not in redirects:
                redirects.append(u)
    pos = 0
    for u in redirects:
        if u[-1] != "/":
            continue
        yield SimRequest(f"{u}HelpDesk_BIOS/", "asus:parse_firmware", {},
                         req.depth + 1, req.seq + "." + _pad(pos))
        pos += 1


def _asus_parse_firmware(req: SimRequest, html: str):
    from datetime import datetime

    page = H.parse_page(html)

    def _text(tag, token, by_id=False):
        for t in page["texts"]:
            if t["tag"] != tag:
                continue
            if by_id and t["id"] == token:
                return t["text"]
            if not by_id and any(token in c for c in t["classes"]):
                return t["text"]
        return None

    product_name = _text("h1", "productTitle")
    version = _text("div", "ProductSupportDriverBIOS__version")
    date = _text("div", "ProductSupportDriverBIOS__releaseDate")
    file_url = None
    for a in page["anchors"]:
        if any("ProductSupportDriverBIOS__contentRight" in c for c in a["div_classes"]) \
                and a["href"]:
            file_url = a["href"]
            break
    if file_url is None:
        return  # asus.py:60-61
    device_class = ASUS_DEVICE_DICT.get((product_name or "??")[:2].lower())
    yield {
        "file_urls": [file_url],
        "vendor": ["asus"],
        "device_name": [product_name],
        "firmware_version": [version.replace("Version", "").strip() if version else None],
        "device_class": [device_class],
        "release_date": [
            datetime.strptime(date.strip(), "%Y/%m/%d").date().isoformat()
            if date else None
        ],
    }


# ---------------------------------------------------------------------------
# HP (/root/reference/firmware/spiders/hp.py)
# ---------------------------------------------------------------------------

def _hp_parse(req: SimRequest, html: str):
    import re
    from datetime import datetime

    page = H.parse_page(html)
    pos = 0
    for row in page["rows"]:
        cells = row["cells"]
        if len(cells) < 5:
            continue
        next_url = cells[4]["hrefs"][0] if cells[4]["hrefs"] else None
        if not next_url:
            continue
        if "http://" not in next_url:
            next_url = "http://" + next_url  # hp.py:24-25 (https would break too)
        raw_date = cells[3]["direct_text"]
        release_date = (
            datetime.strptime(raw_date, "%Y").date().isoformat() if len(raw_date) == 4
            else datetime.strptime(raw_date, "%Y%m%d").date().isoformat()
        )
        m = re.search(r"</a> ?(.*?)</div>", "<div>" + cells[0]["inner_html"] + "</div>")
        device_name = m.group(1) if m else None
        yield SimRequest(next_url, "hp:parse_firmware",
                         {"device_name": device_name, "device_class": "Printer",
                          "firmware_version": cells[2]["direct_text"],
                          "release_date": release_date},
                         req.depth + 1, req.seq + "." + _pad(pos))
        pos += 1


def _hp_parse_firmware(req: SimRequest, html: str):
    page = H.parse_page(html)
    file_urls = [
        a["href"] for a in page["anchors"]
        if a["class_attr"] == "button-sm primary hpdiaButton desktopHpdia" and a["href"]
    ]
    yield {
        "file_urls": file_urls,
        "vendor": ["HP"],
        "device_name": [req.lineage["device_name"]],
        "firmware_version": [req.lineage["firmware_version"]],
        "device_class": [req.lineage["device_class"]],
        "release_date": [req.lineage["release_date"]],
    }


# ---------------------------------------------------------------------------
# D-Link GPL (/root/reference/firmware/spiders/dlink_gpl.py) — POST flows
# ---------------------------------------------------------------------------

def _dlink_parse(req: SimRequest, html: str):
    import re

    from firmwarescraper_spark.sources import vendors as VN

    page = H.parse_page(html)
    pos = 0
    for a in page["anchors"]:
        if "pord_3" in a["td_classes"] and a["title"]:
            product, model = a["title"].split("-", 1)
            yield SimRequest(VN.DLINK_DETAIL_URL, "dlink_gpl:detail",
                             {"product": product, "model": model},
                             req.depth + 1, req.seq + "." + _pad(pos),
                             form=VN.dlink_detail_form(product, model))
            pos += 1
    # sequential pagination (W4): one next-page POST per page
    current = next((i["value"] for i in page["inputs"] if i["name"] == "sel_PageNo"), None)
    pag_text = None
    for row in page["rows"]:
        for c in row["cells"]:
            if "sel_PageNo" in c["input_names"] and c["texts"]:
                pag_text = c["texts"][-1].strip()
    if current is not None and pag_text is not None:
        m = re.search(r"^\((\d+)\s\/\s(\d+)\)$", pag_text)
        if m and int(current) == int(m.group(1)) and int(current) < int(m.group(2)):
            yield SimRequest(VN.DLINK_PAGE_URL, "dlink_gpl:parse", {},
                             req.depth + 1, req.seq + "." + _pad(pos),
                             form=VN.dlink_next_page_form(str(int(current) + 1)))


def _dlink_detail(req: SimRequest, html: str):
    import re

    from firmwarescraper_spark.sources import vendors as VN

    page = H.parse_page(html)
    product, model = req.lineage["product"], req.lineage["model"]
    pos = 0
    for row in page["rows"]:
        onclick = row["onclick"] or ""
        m = re.search(r"^dwn\('([A-Z]+)',['\da-zA-Z]+\)$", onclick)
        if m is None:
            continue
        identifier = m.group(1)
        desc = row["cells"][1]["texts"][0].strip() if len(row["cells"]) > 1 else ""
        vm = re.search(r"FW\sv(\d+\..+)", desc)
        version = vm.group(1) if vm else "0.0"
        yield SimRequest(VN.DLINK_DDGO_URL, "dlink_gpl:download",
                         {"product": product, "model": model, "version": version},
                         req.depth + 1, req.seq + "." + _pad(pos),
                         form=VN.dlink_file_form(product, model, identifier))
        pos += 1


def _dlink_download(req: SimRequest, html: str):
    from datetime import datetime

    page = H.parse_page(html)
    tds = [c for row in page["rows"] for c in row["cells"]
           if "MdDclist12" in c["td_classes"]]
    if len(tds) < 4:
        return
    link = ""
    for href in tds[2]["hrefs"]:
        if "dlink-gpl.s3.amazonaws.com" in href and not href.endswith(".txt"):
            link = href
            break
    if link == "":
        return
    date = tds[3]["texts"][0].strip()
    yield {
        "file_urls": [link],
        "vendor": ["D-Link"],
        "device_name": [f"{req.lineage['product']}-{req.lineage['model']}"],
        "firmware_version": [req.lineage["version"]],
        "device_class": ["-"],
        "release_date": [datetime.strptime(date, "%Y/%m/%d").strftime("%d-%m-%Y")],
    }


# ---------------------------------------------------------------------------
# D-Link FTP walker (/root/reference/firmware/ftp/dlink.py) — JSON listings
# ---------------------------------------------------------------------------

FTP_SKIPPED = {
    '@archive', 'anleitungen', 'D-Link_Assist_Anleitung.pdf',
    'Hinweise Datenblaetter.txt', 'Images_High_Resolution',
    'Images_Low_Resolution', 'index_info.txt', 'Legal - Information',
    'Product_Images', 'Product_Information_Material', 'self - service',
    'software', 'Supportsystem_Anleitung_Mass_RMA.pdf', 'Terms_and_Conditions',
    'tmp', 'Warranty_Documents',
    'ant24', 'ant70', 'dcf', 'de', 'dfw', 'dhd', 'dif', 'dm', 'dph', 'dvc',
    'dvg', 'dta', 'dsn', 'dsm', 'dns', 'dvs', 'dfl', 'dbt', 'dev', 'dcm',
    'dgl', 'dhs', 'di', 'dws', 'dfe', 'du',
}

FTP_DEVICE_CLASSES = {
    'dba': 'Access Point', 'dap': 'Access Point', 'dis': 'Converter',
    'dmc': 'Converter', 'dge': 'PCIe-Networkcard', 'dwa': 'PCIe-Networkcard',
    'dxe': 'PCIe-Networkcard', 'dps': 'Redundant Power Supply',
    'dsr': 'Router (Business)', 'dwr': 'Router (mobile)', 'dwm': 'Router (mobile)',
    'dsl': 'Router (Modem)', 'covr': 'Router (Home)', 'dir': 'Router (Home)',
    'dva': 'Router (Home)', 'go': 'Router (Home)', 'dsp': 'Smart Plug',
    'dcs': 'Smart Wi-Fi Camera', 'dsh': 'Smart Wi-Fi Camera', 'des': 'Switch',
    'dgs': 'Switch', 'dkvm': 'Switch', 'dqs': 'Switch', 'dxs': 'Switch',
    'dem': 'Transceiver', 'dub': 'USB Extensions', 'dnr': 'Video Recorder',
    'dwc': 'Wireless Controller', 'dwl': 'other',
}


def ftp_device_class(device_name: str):
    """ftp/dlink.py:120-130 incl. the dwl+'ap' special case; None on miss."""
    initials = device_name.split("-")[0]
    cls = FTP_DEVICE_CLASSES.get(initials)
    if cls is None:
        return None
    if initials == "dwl" and "ap" in device_name:
        cls = "Access Point"
    return cls


def _ftp_entries(body: str) -> list:
    import json as _json

    return _json.loads(body)[3:]  # start_iteration skips 3 (ftp/dlink.py:148-153)


def _ftp_root(req: SimRequest, html: str):
    pos = 0
    for e in _ftp_entries(html):
        if e["name"] in FTP_SKIPPED or e["type"] != "dir":
            continue  # skip-set (F6); cwd on a file -> error_perm, logged
        yield SimRequest(req.url + e["name"] + "/", "dlink_ftp:family", {},
                         req.depth + 1, req.seq + "." + _pad(pos))
        pos += 1


def _ftp_family(req: SimRequest, html: str):
    pos = 0
    for e in _ftp_entries(html):
        if e["type"] != "dir":
            continue
        yield SimRequest(req.url + e["name"] + "/", "dlink_ftp:device",
                         {"device_name": e["name"]},
                         req.depth + 1, req.seq + "." + _pad(pos))
        pos += 1


def _ftp_device(req: SimRequest, html: str):
    pos = 0
    for e in _ftp_entries(html):
        if e["name"] == "driver_software":
            yield SimRequest(req.url + "driver_software/", "dlink_ftp:files",
                             req.lineage, req.depth + 1, req.seq + "." + _pad(pos))
            pos += 1


def _ftp_files(req: SimRequest, html: str):
    import re
    from datetime import datetime, timezone

    device_name = req.lineage["device_name"]
    for e in _ftp_entries(html):
        name = e["name"]
        if not re.search("zip$", name):
            continue
        if "_fw_" in name:
            try:
                version = name.split("_")[3]
            except IndexError:
                version = None
            try:
                epoch = datetime.strptime(e["modify"], "%Y%m%d%H%M%S").replace(
                    tzinfo=timezone.utc).timestamp()
                release_date = f"{epoch:.1f}"
            except ValueError:
                release_date = None
            yield {
                "file_urls": [req.url + name],
                "vendor": ["D-Link"],
                "device_name": [device_name],
                "firmware_version": [version],
                "device_class": [ftp_device_class(device_name)],
                "release_date": [release_date],
            }


RULES = {
    "avm:parse": _avm_parse,
    "avm:parse_product": _avm_parse_product,
    "linksys:parse": _linksys_parse,
    "linksys:parse_product": _linksys_parse_product,
    "linksys:parse_versions": _linksys_parse_versions,
    "tplink:parse": _tplink_parse,
    "tplink:parse_product": _tplink_parse_product,
    "tplink:parse_firmware": _tplink_parse_firmware,
    "netgear_gpl:parse": _netgear_parse,
    "linksys_gpl:parse": _linksys_gpl_parse,
    "tplink_gpl:parse": _tplink_gpl_parse,
    "tplink_gpl:parse_multi": _tplink_gpl_parse_multi,
    "asus:parse": _asus_parse,
    "asus:parse_firmware": _asus_parse_firmware,
    "hp:parse": _hp_parse,
    "hp:parse_firmware": _hp_parse_firmware,
    "dlink_gpl:parse": _dlink_parse,
    "dlink_gpl:detail": _dlink_detail,
    "dlink_gpl:download": _dlink_download,
    "dlink_ftp:root": _ftp_root,
    "dlink_ftp:family": _ftp_family,
    "dlink_ftp:device": _ftp_device,
    "dlink_ftp:files": _ftp_files,
}


def simulate(corpus: dict, seeds: list) -> SimResult:
    """Run the pinned reference crawl.

    corpus: {fetch_key: body}; seeds: [(url, rule)] or [(url, rule, form)].
    """
    res = SimResult()
    stack = []
    for i, seed in enumerate(seeds):
        url, rule, form = seed if len(seed) == 3 else (*seed, None)
        req = SimRequest(url, rule, {}, 0, _pad(i), form)
        key = U.fetch_key(U.canonicalize_url(req.url), req.form)
        if key not in res.seen:
            res.seen.add(key)
            stack.append(req)
    # DFS pre-order in yield order: reverse-push children, pop from the end
    stack.reverse()
    while stack:
        req = stack.pop()
        key = U.fetch_key(U.canonicalize_url(req.url), req.form)
        res.order.append((req.seq, req.url, key, req.depth, req.rule))
        html = corpus.get(key)
        if html is None:
            continue  # 404 — logged, not fatal (handle_httpstatus_list)
        children = []
        for out in RULES[req.rule](req, html):
            if isinstance(out, SimRequest):
                ckey = U.fetch_key(U.canonicalize_url(out.url), out.form)
                if ckey in res.seen:
                    continue
                res.seen.add(ckey)
                children.append(out)
            else:
                res.items.append(out)
        stack.extend(reversed(children))
    return res
