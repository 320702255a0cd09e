"""Deterministic synthetic pages for the remaining vendor rule packs:
TP-Link, TP-Link GPL, Netgear GPL, Linksys GPL, ASUS, HP, D-Link GPL
(POST/pagination) and the D-Link FTP walker (JSON listings).

Each generator returns ``{fetch_key: body}`` — fetch_key is the canonical
URL, plus a ``|form|<sorted-urlencoded-body>`` suffix for POST-fetched
pages (S2; functions/url.py:fetch_key). Templates mirror the structures
the reference spiders query (file:line cites inline); scale knobs are pure
functions of integers — no RNG.
"""

from __future__ import annotations

import json

from firmwarescraper_spark.functions.url import canonicalize_url, fetch_key

TPLINK_HOST = "www.tp-link.com"
TPLINK_STATIC = "static.tp-link.com"
NETGEAR_HOST = "www.downloads.netgear.com"
LINKSYS_HOST = "www.linksys.com"
ASUS_HOST = "www.asus.com"
HP_HOST = "support.hp.com"
DLINK_HOST = "tsd.dlink.com.tw"
DLINK_S3 = "dlink-gpl.s3.amazonaws.com"
FTP_HOST = "ftp.dlink.de"

# ---------------------------------------------------------------------------
# TP-Link retail (tplink.py)
# ---------------------------------------------------------------------------

TPLINK_CATEGORIES = [  # tplink.py:20-28
    "wifi-router", "all-gateways", "deco", "mifi",
    "range-extender", "powerline", "access-point",
]


def _tplink_product_name(cat: str, i: int) -> str:
    return f"Archer {cat[:2].upper()}{100 + i}"


def _tplink_category_page(cat: str, page: int, n_products: int, n_pages: int) -> str:
    base = f"https://{TPLINK_HOST}/de/home-networking/{cat}/"
    prods = "\n".join(
        f'<a class="tp-product-link ga-click" href="/de/home-networking/{cat}/prod-{page}-{i}.html">'
        f"{_tplink_product_name(cat, i)}</a>"
        for i in range(n_products)
    )
    pagination = "\n".join(
        f'<li class="tp-product-pagination-item">'
        f'<a class="tp-product-pagination-btn" href="{base}?page={p}">{p}</a></li>'
        for p in range(1, n_pages + 1)
    )
    return (
        "<html><head></head><body>\n"
        f"{prods}\n<ul>\n{pagination}\n</ul>\n</body></html>"
    )


def _tplink_product_page(cat: str, page: int, i: int) -> str:
    name = _tplink_product_name(cat, i)
    return (
        "<html><head></head><body>"
        f'<h2 class="product-name">{name}</h2>'
        f'<a class="support-link" href="/de/support/download/prod-{cat}-{page}-{i}/">Support</a>'
        "</body></html>"
    )


def _tplink_support_page(cat: str, page: int, i: int) -> str:
    name = _tplink_product_name(cat, i)
    ver = f"{name} 1.{page}.{i} Build 2019"
    return (
        "<html><head></head><body><table>"
        '<tr class="basic-info"><td>'
        f'<a class="download-btn" href="https://{TPLINK_STATIC}/fw/{name.replace(" ", "_")}_v1.{page}.{i}.zip">Download</a>'
        "</td></tr>"
        f'<tr class="detail-info"><td><span>Published Date</span><span>20{15 + i % 5}-0{1 + i % 9}-1{i % 9}</span></td></tr>'
        f'<span id="verison-hidden">{ver}</span>'
        "</table></body></html>"
    )


def tplink_pages(n_products: int = 3, n_pages: int = 2) -> dict:
    pages = {}
    for cat in TPLINK_CATEGORIES:
        base = f"https://{TPLINK_HOST}/de/home-networking/{cat}/"
        pages[base] = _tplink_category_page(cat, 1, n_products, n_pages)
        for p in range(2, n_pages + 1):
            pages[f"{base}?page={p}"] = _tplink_category_page(cat, p, n_products, 0)
        for p in range(1, n_pages + 1):
            for i in range(n_products):
                pages[f"https://{TPLINK_HOST}/de/home-networking/{cat}/prod-{p}-{i}.html"] = \
                    _tplink_product_page(cat, p, i)
                pages[f"https://{TPLINK_HOST}/de/support/download/prod-{cat}-{p}-{i}/"] = \
                    _tplink_support_page(cat, p, i)
    return pages


def tplink_seeds() -> list:
    return [
        (f"https://{TPLINK_HOST}/de/home-networking/{cat}/", "tplink:parse", None)
        for cat in TPLINK_CATEGORIES
    ]


# ---------------------------------------------------------------------------
# Netgear GPL (netgear_gpl.py) — single page of bold-device paragraphs
# ---------------------------------------------------------------------------

NETGEAR_URL = f"https://{NETGEAR_HOST}/files/GDC/2649_GPLv1.html"
NETGEAR_WHITELIST = ["AC1450"]


def netgear_pages(n_devices: int = 6) -> dict:
    paras = []
    for i in range(n_devices):
        # device 0 is the whitelisted one; device 1 a near-miss (exact-member
        # whitelist semantics — netgear_gpl.py:46 checks list membership)
        name = "AC1450" if i == 0 else ("AC1450v2" if i == 1 else f"R{7000 + i}")
        links = "".join(
            f'<a href="http://{NETGEAR_HOST}/files/GPL/{name}_V1.0.{k}_gpl.tar.gz">V1.0.{k}</a>'
            for k in range(1 + i % 3)
        )
        paras.append(f"<div><p><strong>{name}</strong>{links}</p></div>")
    body = "\n".join(paras)
    return {NETGEAR_URL: f"<html><head></head><body>{body}</body></html>"}


def netgear_seeds() -> list:
    return [(NETGEAR_URL, "netgear_gpl:parse", None)]


# ---------------------------------------------------------------------------
# Linksys GPL (linksys_gpl.py) — one article page, 2/3-column table with
# device-name carry-over; whitelist substring semantics
# ---------------------------------------------------------------------------

LINKSYS_GPL_URL = f"https://{LINKSYS_HOST}/de/support-article?articleNum=114663"
LINKSYS_GPL_WHITELIST = ["EA7500"]


def linksys_gpl_pages(n_groups: int = 3) -> dict:
    rows = ["<tr><td>Device</td><td>Version</td><td>Link</td></tr>"]  # header ([1:])
    for g in range(n_groups):
        devs = (
            "<div>EA7500</div><div>EA7500v2</div>" if g == 0
            else f"<div>WRT{1900 + g}AC</div>"
        )
        rows.append(
            f"<tr><td>{devs}</td><td>1.0.{g}</td>"
            f'<td><a href="https://downloads.{LINKSYS_HOST.split(".", 1)[1]}/gpl/fw_{g}_a.tar.gz">DL</a></td></tr>'
        )
        # 2-column continuation row: inherits the group's device list
        rows.append(
            f"<tr><td>1.1.{g}</td>"
            f'<td><a href="https://downloads.{LINKSYS_HOST.split(".", 1)[1]}/gpl/fw_{g}_b.tar.gz">DL</a></td></tr>'
        )
        # malformed row (wrong column count) — skipped (linksys_gpl.py:59)
        rows.append("<tr><td>a</td><td>b</td><td>c</td><td>d</td></tr>")
    table = "<table><thead>" + "".join(rows) + "</thead></table>"
    return {LINKSYS_GPL_URL: f"<html><head></head><body>{table}</body></html>"}


def linksys_gpl_seeds() -> list:
    return [(LINKSYS_GPL_URL, "linksys_gpl:parse", None)]


# ---------------------------------------------------------------------------
# TP-Link GPL (tplink_gpl.py) — ddl vs multi anchors, table follow-up
# ---------------------------------------------------------------------------

TPLINK_GPL_URL = f"https://{TPLINK_HOST}/de/support/gpl-code/"


def tplink_gpl_pages(n_ddl: int = 3, n_multi: int = 2, n_versions: int = 2) -> dict:
    pages = {}
    ddl = "".join(
        f'<a class="ga-click" href="https://{TPLINK_STATIC}/gpl/Archer_C{i}_gpl.tar.gz">Archer C{i}</a>'
        for i in range(n_ddl)
    )
    multi = "".join(
        f'<a class="ga-click" href="?app=gpl-code&id={i}">Archer AX{20 + i}</a>'
        for i in range(n_multi)
    )
    pages[TPLINK_GPL_URL] = (
        "<html><head></head><body>"
        f'<div data-class="wi-fi-routers"><div class="item-box">{ddl}{multi}</div></div>'
        "</body></html>"
    )
    for i in range(n_multi):
        rows = "".join(
            f'<tr><td class="model">Archer AX{20 + i}</td><td><div>V{v + 1}</div></td>'
            f'<td><a class="bold ga-click" href="https://{TPLINK_STATIC}/gpl/AX{20 + i}_v{v + 1}_gpl.tar.gz">Download</a></td></tr>'
            for v in range(n_versions)
        )
        pages[
            f"https://{TPLINK_HOST}/phppage/gpl-res-list.html?app=gpl-code&id={i}&appPath=de"
        ] = f"<html><head></head><body><table>{rows}</table></body></html>"
    return pages


def tplink_gpl_seeds() -> list:
    return [(TPLINK_GPL_URL, "tplink_gpl:parse", None)]


# ---------------------------------------------------------------------------
# ASUS (asus.py) — header-script URL harvest + BIOS pages
# ---------------------------------------------------------------------------

ASUS_CATEGORIES = ["WiFi-Routers", "Modem-Routers", "WiFi-6"]


def _asus_device(cat: str, i: int) -> str:
    prefixes = {"WiFi-Routers": "RT", "Modem-Routers": "DS", "WiFi-6": "GT"}
    return f"{prefixes[cat]}-AX{50 + i}U"


def asus_pages(n_devices: int = 3) -> dict:
    pages = {}
    for cat in ASUS_CATEGORIES:
        entries = []
        for i in range(n_devices):
            dev = _asus_device(cat, i)
            entries.append(f'"url": "https://{ASUS_HOST}/de/Networking-IoT-Servers/{dev}/"')
        # distractor without trailing slash (filtered, asus.py:52) + a
        # duplicate entry across scripts (set-dedup A2, asus.py:45-51)
        script1 = "var cfg = {" + ", ".join(entries) + "};"
        script2 = ('var extra = {"url": "https://' + ASUS_HOST + '/de/site/about", '
                   + entries[0] + "};")
        pages[f"https://{ASUS_HOST}/de/Networking-IoT-Servers/{cat}/All-series/filter/"] = (
            f"<html><head><script>{script1}</script><script>{script2}</script>"
            "</head><body></body></html>"
        )
        for i in range(n_devices):
            dev = _asus_device(cat, i)
            pages[f"https://{ASUS_HOST}/de/Networking-IoT-Servers/{dev}/HelpDesk_BIOS/"] = (
                "<html><head></head><body>"
                f'<h1 class="productTitle">{dev}</h1>'
                f'<div class="ProductSupportDriverBIOS__version">Version 3.0.0.{i}</div>'
                f'<div class="ProductSupportDriverBIOS__releaseDate">20{18 + i % 4}/0{1 + i % 9}/1{i % 9}</div>'
                f'<div class="ProductSupportDriverBIOS__contentRight">'
                f'<a href="https://dlcdnets.asus.com/pub/{dev}_{i}.zip">DOWNLOAD</a></div>'
                "</body></html>"
            )
    return pages


def asus_seeds() -> list:
    return [
        (f"https://{ASUS_HOST}/de/Networking-IoT-Servers/{cat}/All-series/filter/",
         "asus:parse", None)
        for cat in ASUS_CATEGORIES
    ]


# ---------------------------------------------------------------------------
# HP (hp.py) — printer firmware table + button anchors
# ---------------------------------------------------------------------------

HP_DOC_URL = f"https://{HP_HOST}/za-en/document/c03933242"


def hp_pages(n_rows: int = 4) -> dict:
    pages = {}
    rows = []
    for i in range(n_rows):
        date = f"20{14 + i % 6}" if i % 2 == 0 else f"20{14 + i % 6}0{1 + i % 9}1{i % 9}"
        rows.append(
            "<tr>"
            f'<td><div><a href="#spec{i}">specs</a> LaserJet Pro {400 + i}</div></td>'
            "<td><div>-</div></td>"
            f"<td><div>2030{i}_0{i % 10}</div></td>"
            f"<td><div>{date}</div></td>"
            f'<td><div><a href="{HP_HOST}/fwpage/{i}">firmware</a></div></td>'
            "</tr>"
        )
    table = (
        '<div class="section expandable"><div><div><div><table><tbody>'
        + "".join(rows) + "</tbody></table></div></div></div></div>"
    )
    pages[HP_DOC_URL] = f"<html><head></head><body>{table}</body></html>"
    for i in range(n_rows):
        buttons = "".join(
            f'<a class="button-sm primary hpdiaButton desktopHpdia" '
            f'href="https://ftp.hp.com/pub/softlib/fw{i}_{k}.rfu">Download</a>'
            for k in range(1 + i % 2)
        )
        pages[f"http://{HP_HOST}/fwpage/{i}"] = (
            f"<html><head></head><body>{buttons}"
            '<a class="button-sm secondary" href="https://ftp.hp.com/pub/other.txt">Other</a>'
            "</body></html>"
        )
    return pages


def hp_seeds() -> list:
    return [(HP_DOC_URL, "hp:parse", None)]


# ---------------------------------------------------------------------------
# D-Link GPL (dlink_gpl.py) — POST forms + sequential pagination (S2/W4)
# ---------------------------------------------------------------------------

DLINK_LIST_URL = f"https://{DLINK_HOST}/dlist?SourceType=download&OS=GPL"
DLINK_PAGE_URL = (
    f"https://{DLINK_HOST}/downloads2008list.asp?t=1&OS=GPL&SourceType=download&pagetype=G"
)
DLINK_DETAIL_URL = f"https://{DLINK_HOST}/ddetail"
DLINK_DDGO_URL = f"https://{DLINK_HOST}/ddgo"


def _dlink_devices(page: int, n: int) -> list:
    fams = ["COVR", "DIR", "DAP", "DGS"]
    return [(fams[(page * n + i) % len(fams)], f"{1100 + page * 100 + i}")
            for i in range(n)]


def _dlink_list_page(page: int, n_devices: int, n_pages: int) -> str:
    cells = "".join(
        f'<td class="pord_3"><a title="{p}-{m}" href="#">{p}-{m}</a></td>'
        for p, m in _dlink_devices(page, n_devices)
    )
    return (
        "<html><head></head><body><table>"
        f"<tr>{cells}</tr>"
        f'<tr><td><input name="sel_PageNo" value="{page + 1}">({page + 1} / {n_pages})</td></tr>'
        "</table></body></html>"
    )


def _identifier(product: str, model: str) -> str:
    # IDENTIFIER_RE captures [A-Z]+ only (dlink_gpl.py:42)
    return product + "X"


def _dlink_detail_page(product: str, model: str, n_fw: int = 2) -> str:
    rows = "".join(
        f"""<tr onclick="dwn('{_identifier(product, model)}{chr(65 + v)}','x{v}')">"""
        f"<td>{product}-{model}</td><td>D-Link {product}-{model} FW v1.{v:02d}B05</td></tr>"
        for v in range(n_fw)
    )
    # a row whose onclick doesn't match the identifier regex -> skipped
    rows += """<tr onclick="dwn('bad1','x')"><td>x</td><td>no fw</td></tr>"""
    return f"<html><head></head><body><table>{rows}</table></body></html>"


def _dlink_ddgo_page(product: str, model: str, version: str) -> str:
    return (
        "<html><head></head><body><table><tr>"
        f'<td class="MdDclist12">{product}-{model}</td>'
        f'<td class="MdDclist12">FW v{version}</td>'
        '<td class="MdDclist12">'
        f'<a href="https://{DLINK_S3}/GPL/{product}-{model}/readme_{version}.txt">readme</a>'
        f'<a href="https://{DLINK_S3}/GPL/{product}-{model}/{product}_{model}_v{version}_GPL.tar.gz">GPL</a>'
        "</td>"
        f'<td class="MdDclist12">20{15 + int(version[-2:]) % 6}/0{1 + int(version[-2:]) % 9}/2{int(version[-2:]) % 8}</td>'
        "</tr></table></body></html>"
    )


def dlink_next_page_form(next_page: str) -> dict:
    # dlink_gpl.py:58
    return dict(Enter="OK", sel_PageNo=next_page, ModelCategory="0", ModelSno="0",
                ModelCategory_="", ModelSno_="", search_string="", ModelVer="",
                Model_Sno="", OS="GPL")


def dlink_detail_form(product: str, model: str) -> dict:
    # dlink_gpl.py:99
    return dict(Enter="OK", ModelCategory="0", ModelSno="", ModelCategory_=product,
                ModelSno_=model, Model_Sno="", OS="GPL")


def dlink_file_form(product: str, model: str, identifier: str) -> dict:
    # dlink_gpl.py:105
    return dict(Enter="OK", ModelCategory="0", ModelSno="0", ModelCategory_=product,
                ModelSno_=model, Model_Sno="", ModelVer="", docuSno=identifier,
                docuSource="1")


def dlink_pages(n_devices: int = 3, n_pages: int = 2, n_fw: int = 2) -> dict:
    pages = {}
    pages[canonicalize_url(DLINK_LIST_URL)] = _dlink_list_page(0, n_devices, n_pages)
    for p in range(1, n_pages):
        key = fetch_key(canonicalize_url(DLINK_PAGE_URL), dlink_next_page_form(str(p + 1)))
        pages[key] = _dlink_list_page(p, n_devices, n_pages)
    for p in range(n_pages):
        for product, model in _dlink_devices(p, n_devices):
            dkey = fetch_key(canonicalize_url(DLINK_DETAIL_URL),
                             dlink_detail_form(product, model))
            pages[dkey] = _dlink_detail_page(product, model, n_fw)
            for v in range(n_fw):
                ident = f"{_identifier(product, model)}{chr(65 + v)}"
                gkey = fetch_key(canonicalize_url(DLINK_DDGO_URL),
                                 dlink_file_form(product, model, ident))
                pages[gkey] = _dlink_ddgo_page(product, model, f"1.{v:02d}B05")
    return pages


def dlink_seeds() -> list:
    return [(DLINK_LIST_URL, "dlink_gpl:parse", None)]


# ---------------------------------------------------------------------------
# D-Link FTP walker (ftp/dlink.py) — JSON listing pages (S4/S5)
# ---------------------------------------------------------------------------

FTP_SKIP_DIRS = ["@archive", "anleitungen", "software", "tmp", "dfw", "de"]
_FTP_HEADER = [
    {"name": ".", "size": 0, "modify": "20200101000000", "type": "cdir"},
    {"name": "..", "size": 0, "modify": "20200101000000", "type": "pdir"},
    {"name": "index_header", "size": 0, "modify": "20200101000000", "type": "file"},
]


def _ftp_listing(entries: list) -> str:
    """mlsd-style listing as JSON: the reference's FTPFileListProtocol
    renders listings as JSON TextResponses (handlers.py:36-39); the first
    three mlsd entries are skipped by start_iteration (ftp/dlink.py:148-153)."""
    return json.dumps(_FTP_HEADER + entries)


# Top level holds family dirs; devices are level 2; 'driver_software' is
# level 3 — the walker's device_name is the LEVEL-2 dir
# (ftp/dlink.py:69-87: get_subpage iterates level 2, get_sub_subpage scans
# level 3 for 'driver_software' and downloads with device_name = level-2).
FTP_FAMILIES = ["covr", "dap", "dgs", "dwl"]


def ftp_device_names(n: int) -> list:
    out = []
    for i in range(n):
        fam = FTP_FAMILIES[i % len(FTP_FAMILIES)]
        # dwl devices get an 'ap' marker sometimes — exercises the
        # dwl+'ap' special case (ftp/dlink.py:124-125)
        model = f"ap{800 + i}" if fam == "dwl" and i % 2 == 1 else f"{800 + i}"
        out.append((fam, f"{fam}-{model}"))
    return out


def ftp_pages(n_devices: int = 4) -> dict:
    pages = {}
    base = f"ftp://{FTP_HOST}"
    devices = ftp_device_names(n_devices)
    fams = sorted({f for f, _ in devices})
    top = [{"name": d, "size": 0, "modify": "20200301000000", "type": "dir"}
           for d in FTP_SKIP_DIRS + fams]
    top.append({"name": "notes.txt", "size": 5, "modify": "20200301000000",
                "type": "file"})  # cwd on a file -> error_perm, skipped
    pages[f"{base}/"] = _ftp_listing(top)
    for fam in fams:
        devs = [d for f, d in devices if f == fam]
        pages[f"{base}/{fam}/"] = _ftp_listing(
            [{"name": d, "size": 0, "modify": "20200301000000", "type": "dir"}
             for d in devs]
        )
        for i, dev in enumerate(devs):
            sub = [
                {"name": "documentation", "size": 0, "modify": "20200301000000",
                 "type": "dir"},
                {"name": "driver_software", "size": 0, "modify": "20200301000000",
                 "type": "dir"},
            ]
            pages[f"{base}/{fam}/{dev}/"] = _ftp_listing(sub)
            pages[f"{base}/{fam}/{dev}/documentation/"] = _ftp_listing([])
            files = [
                {"name": f"{dev}_fw_revA_1.{i:02d}_20200510.zip", "size": 1000 + i,
                 "modify": f"202005101200{i % 60:02d}", "type": "file"},
                {"name": f"{dev}_sw_tool_2.0_20200510.zip", "size": 2000 + i,
                 "modify": "20200510120000", "type": "file"},
                {"name": f"{dev}_fw_notes.txt", "size": 10,
                 "modify": "20200510120000", "type": "file"},
            ]
            pages[f"{base}/{fam}/{dev}/driver_software/"] = _ftp_listing(files)
    return pages


def ftp_seeds() -> list:
    return [(f"ftp://{FTP_HOST}/", "dlink_ftp:root", None)]


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def all_vendor_pages(scale: int = 1) -> dict:
    """{fetch_key: body} for every extra vendor, scaled by an integer knob."""
    pages = {}
    pages.update(tplink_pages(n_products=2 * scale, n_pages=2))
    pages.update(netgear_pages(n_devices=4 + 2 * scale))
    pages.update(linksys_gpl_pages(n_groups=2 + scale))
    pages.update(tplink_gpl_pages(n_ddl=2 + scale, n_multi=2, n_versions=2))
    pages.update(asus_pages(n_devices=2 + scale))
    pages.update(hp_pages(n_rows=3 + scale))
    pages.update(dlink_pages(n_devices=2 + scale, n_pages=2, n_fw=2))
    pages.update(ftp_pages(n_devices=3 + scale))
    return {
        (k if "|form|" in k else canonicalize_url(k)): v for k, v in pages.items()
    }


def all_vendor_seeds() -> list:
    return (tplink_seeds() + netgear_seeds() + linksys_gpl_seeds()
            + tplink_gpl_seeds() + asus_seeds() + hp_seeds() + dlink_seeds()
            + ftp_seeds())
