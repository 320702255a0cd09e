"""Spark rule packs for the remaining vendors: TP-Link (retail + GPL),
Netgear GPL, Linksys GPL, ASUS, HP, D-Link GPL (POST forms + sequential
pagination, S2/W4), and the D-Link FTP walker (JSON listings, S4/S5).

Same contract as plans/rulepacks.py — every rule is JVM array/column
algebra over the parse-once PAGE_STRUCT (or ``from_json`` for FTP listing
bodies); the pure-Python twins live in plans/simulator.py and pin parity.
Child `pos` values are contiguous over *yielded* children (filter the
array first, then posexplode) so the deterministic seq path keys match the
simulator's DFS order exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from firmwarescraper_spark.functions import url as U
from firmwarescraper_spark.plans.rulepacks import _children, _wrap_items
from firmwarescraper_spark.plans.simulator import (
    ASUS_DEVICE_DICT,
    FTP_DEVICE_CLASSES,
    FTP_SKIPPED,
    LINKSYS_GPL_WHITELIST,
    NETGEAR_WHITELIST,
)
from firmwarescraper_spark.sources import vendors as VN

def _anchors():
    return F.col("parsed.anchors")


def _texts():
    return F.col("parsed.texts")


def _rows():
    return F.col("parsed.rows")


def _first(arr):
    return F.try_element_at(arr, F.lit(1))


def _text_of(tag: str, token: str, by_id: bool = False):
    """First parsed.texts entry matching tag + class-token/-id."""
    if by_id:
        pred = lambda t: (t["tag"] == tag) & (t["id"] == token)  # noqa: E731
    else:
        pred = lambda t: (t["tag"] == tag) & F.exists(  # noqa: E731
            t["classes"], lambda c: c.contains(token)
        )
    return _first(F.filter(_texts(), pred))["text"]


# ---------------------------------------------------------------------------
# TP-Link retail (tplink.py)
# ---------------------------------------------------------------------------

def tplink_parse(fetched: DataFrame):
    prods = F.filter(
        _anchors(),
        lambda a: F.array_contains(a["classes"], "tp-product-link") & a["href"].isNotNull(),
    )
    pages = F.filter(
        _anchors(),
        lambda a: F.array_contains(a["classes"], "tp-product-pagination-btn")
        & F.array_contains(a["li_classes"], "tp-product-pagination-item")
        & a["href"].isNotNull(),
    )
    c1 = fetched.select(
        "url", "depth", "seq", "lineage", F.posexplode(prods).alias("pos", "a")
    ).withColumn("child_url", U.url_join_col(F.col("url"), F.col("a.href")))
    c2 = fetched.select(
        "url", "depth", "seq", "lineage", F.size(prods).alias("_off"),
        F.posexplode(pages).alias("pos", "a"),
    ).withColumn("pos", F.col("pos") + F.col("_off")).withColumn(
        "child_url", U.url_join_col(F.col("url"), F.col("a.href"))
    )
    children = _children(c1, "tplink:parse_product").unionByName(
        _children(c2, "tplink:parse")
    )
    return children, None


def _tplink_class_from_url(url):
    # tplink.py:121-131 — 'access_point' (underscore) never matches, quirk kept
    return (
        F.when(
            url.contains("wifi-router") | url.contains("all-gateways")
            | url.contains("mifi"), "Router")
        .when(url.contains("range-extender"), "Repeater")
        .when(url.contains("powerline"), "PLC Adapter")
        .when(url.contains("access_point") | url.contains("deco"), "AP")
        .otherwise("Router")
    )


def tplink_parse_product(fetched: DataFrame):
    name = _text_of("h2", "product-name")
    support = _first(
        F.filter(
            _anchors(),
            lambda a: a["class_attr"].isNotNull()
            & a["class_attr"].contains("support") & a["href"].isNotNull(),
        )
    )["href"]
    hit = fetched.select(
        "url", "depth", "seq", name.alias("name"), support.alias("href")
    ).filter(F.col("name").isNotNull() & F.col("href").isNotNull())
    joined = hit.withColumn(
        "child_url", U.url_join_col(F.col("url"), F.col("href"))
    ).withColumn("pos", F.lit(0))
    lineage = F.create_map(
        F.lit("device_name"), F.col("name"),
        F.lit("device_class"), _tplink_class_from_url(F.col("url")),
    )
    return _children(joined, "tplink:parse_firmware", lineage), None


def tplink_parse_firmware(fetched: DataFrame):
    first_basic = _first(
        F.filter(_rows(), lambda r: F.array_contains(r["tr_classes"], "basic-info"))
    )
    file_href = _first(
        F.flatten(F.transform(first_basic["cells"], lambda c: c["classed_hrefs"]))
    )
    version = _text_of("span", "verison-hidden", by_id=True)
    first_detail = _first(
        F.filter(_rows(), lambda r: F.array_contains(r["tr_classes"], "detail-info"))
    )
    date_raw = F.try_element_at(
        _first(first_detail["cells"])["span_first_texts"], F.lit(2)
    )
    device = F.col("lineage")["device_name"]
    base = fetched.select(
        "url", device.alias("device_name"),
        F.col("lineage")["device_class"].alias("device_class"),
        U.url_join_col(F.col("url"), file_href).alias("file_url"),
        version.alias("v_raw"), date_raw.alias("d_raw"),
    ).filter(
        F.col("device_name").isNotNull() & F.col("device_class").isNotNull()
        & F.col("file_url").isNotNull() & F.col("v_raw").isNotNull()
        & F.col("d_raw").isNotNull()  # F7: reference raises ValueError
    )
    items = base.select(
        F.lit("TP-Link").alias("vendor"),
        "device_name",
        F.trim(F.replace(F.col("v_raw"), F.col("device_name"), F.lit(""))).alias(
            "firmware_version"),
        "device_class",
        F.date_format(F.try_to_date(F.trim("d_raw"), "yyyy-MM-dd"), "dd-MM-yyyy").alias(
            "release_date"),
        "file_url",
    )
    return None, _wrap_items(items)


# ---------------------------------------------------------------------------
# Netgear GPL (netgear_gpl.py) — bold-paragraph zip join, exact-member whitelist
# ---------------------------------------------------------------------------

def netgear_parse(fetched: DataFrame):
    wl = F.array(*[F.lit(w) for w in NETGEAR_WHITELIST])
    paras = fetched.select(
        "url", F.explode("parsed.paras").alias("p")
    ).filter(F.arrays_overlap(F.col("p.bold_texts"), wl))
    zipped = paras.select(
        "url", F.col("p.bold_texts").alias("device_name_list"),
        F.explode(F.arrays_zip("p.a_texts", "p.a_hrefs")).alias("z"),
    )
    items = zipped.select(
        F.array(F.lit("Netgear")).alias("vendor"),
        F.col("device_name_list").alias("device_name"),  # list-valued (J1 quirk)
        F.array(F.col("z.a_texts")).alias("firmware_version"),
        F.array(F.lit("-")).alias("device_class"),
        F.array(F.lit("01-01-1970")).alias("release_date"),
        F.array(F.col("z.a_hrefs")).alias("file_urls"),
    )
    return None, items


# ---------------------------------------------------------------------------
# Linksys GPL (linksys_gpl.py) — 2/3-column table with device carry-over (X19)
# ---------------------------------------------------------------------------

def linksys_gpl_parse(fetched: DataFrame):
    rows = fetched.select(
        "url", F.posexplode(_rows()).alias("pos", "row")
    ).filter(F.col("pos") >= 1)  # header skip, W3
    rows = rows.filter(F.size("row.cells").isin(2, 3))
    dev_arr = F.when(F.size("row.cells") == 3, F.col("row.cells")[0]["texts"])
    w = Window.partitionBy("url").orderBy("pos")
    carried = rows.withColumn(
        "devices", F.last(dev_arr, ignorenulls=True).over(w)
    )
    offset = F.when(F.size("row.cells") == 3, 1).otherwise(0)
    staged = carried.select(
        "url",
        F.trim(F.array_join(F.get(F.col("row.cells"), offset)["texts"], "")).alias("version"),
        F.trim(F.array_join(F.get(F.col("row.cells"), offset + 1)["hrefs"], "")).alias("link"),
        F.explode("devices").alias("device"),
    )
    wl_cond = F.lit(False)
    for wlw in LINKSYS_GPL_WHITELIST:
        wl_cond = wl_cond | F.col("device").contains(wlw)  # substring whitelist
    items = staged.filter(wl_cond).select(
        F.lit("Linksys").alias("vendor"),
        F.trim("device").alias("device_name"),
        F.col("version").alias("firmware_version"),
        F.lit("-").alias("device_class"),
        F.lit("01-01-1970").alias("release_date"),
        F.col("link").alias("file_url"),
    )
    return None, _wrap_items(items)


# ---------------------------------------------------------------------------
# TP-Link GPL (tplink_gpl.py)
# ---------------------------------------------------------------------------

def _tplink_gpl_scoped():
    return F.filter(
        _anchors(),
        lambda a: F.array_contains(a["classes"], "ga-click") & a["href"].isNotNull()
        & F.array_contains(a["div_classes"], "data-wi-fi-routers")
        & F.array_contains(a["div_classes"], "item-box"),
    )


def tplink_gpl_parse(fetched: DataFrame):
    scoped = _tplink_gpl_scoped()
    ddl = F.filter(scoped, lambda a: a["href"].contains("static"))
    multi = F.filter(scoped, lambda a: ~a["href"].contains("static"))

    items = fetched.select("url", F.explode(ddl).alias("a")).select(
        F.lit("TP-Link").alias("vendor"),
        F.trim(F.col("a.text")).alias("device_name"),
        F.lit("0.0").alias("firmware_version"),
        F.lit("Router").alias("device_class"),
        F.lit("01/01/1970").alias("release_date"),
        F.trim(F.col("a.href")).alias("file_url"),
    )

    kids = fetched.select(
        "url", "depth", "seq", F.posexplode(multi).alias("pos", "a")
    ).withColumn(
        "child_url",
        F.concat(
            F.lit("https://www.tp-link.com/phppage/gpl-res-list.html"),
            F.trim(F.col("a.href")), F.lit("&appPath=de"),
        ),
    )
    lineage = F.create_map(F.lit("device"), F.trim(F.col("a.text")))
    return _children(kids, "tplink_gpl:parse_multi", lineage), _wrap_items(items)


def tplink_gpl_parse_multi(fetched: DataFrame):
    versions = F.flatten(
        F.transform(
            _rows(),
            lambda r: F.filter(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(r["cells"]) - 2, F.lit(0))),
                    lambda i: F.when(
                        F.array_contains(F.get(r["cells"], i)["td_classes"], "model"),
                        F.get(r["cells"], i + 1)["direct_text"],
                    ),
                ),
                lambda x: x.isNotNull(),
            ),
        )
    )
    links = F.transform(
        F.filter(
            _anchors(),
            lambda a: (a["class_attr"] == "bold ga-click") & (a["text"] == "Download")
            & a["href"].isNotNull(),
        ),
        lambda a: a["href"],
    )
    zipped = fetched.select(
        "url", F.col("lineage")["device"].alias("device"),
        F.explode(F.arrays_zip(versions.alias("v"), links.alias("l"))).alias("z"),
    ).filter(F.col("z.v").isNotNull() & F.col("z.l").isNotNull())
    items = zipped.select(
        F.lit("TP-Link").alias("vendor"),
        F.col("device").alias("device_name"),
        F.trim("z.v").alias("firmware_version"),
        F.lit("Router").alias("device_class"),
        F.lit("01/01/1970").alias("release_date"),
        F.trim("z.l").alias("file_url"),
    )
    return None, _wrap_items(items)


# ---------------------------------------------------------------------------
# ASUS (asus.py) — X16 script-URL harvest + BIOS extraction
# ---------------------------------------------------------------------------

ASUS_URL_RE = r'"url": "(https://[\w\d\-\_\./]+)"'


def asus_parse(fetched: DataFrame):
    redirects = F.filter(
        F.array_distinct(  # keeps first occurrence — A2 pin
            F.flatten(
                F.transform(
                    F.filter(F.col("parsed.scripts"), lambda s: s.contains('"url"')),
                    lambda s: F.regexp_extract_all(s, F.lit(ASUS_URL_RE), F.lit(1)),
                )
            )
        ),
        lambda u: u.endswith("/"),
    )
    kids = fetched.select(
        "url", "depth", "seq", "lineage", F.posexplode(redirects).alias("pos", "u")
    ).withColumn("child_url", F.concat(F.col("u"), F.lit("HelpDesk_BIOS/")))
    return _children(kids, "asus:parse_firmware"), None


def asus_parse_firmware(fetched: DataFrame):
    name = _text_of("h1", "productTitle")
    version = _text_of("div", "ProductSupportDriverBIOS__version")
    date = _text_of("div", "ProductSupportDriverBIOS__releaseDate")
    file_url = _first(
        F.filter(
            _anchors(),
            lambda a: F.exists(
                a["div_classes"],
                lambda c: c.contains("ProductSupportDriverBIOS__contentRight"),
            ) & a["href"].isNotNull(),
        )
    )["href"]
    class_map = F.create_map(*[F.lit(x) for kv in ASUS_DEVICE_DICT.items() for x in kv])
    base = fetched.select(
        name.alias("device_name"), version.alias("v"), date.alias("d"),
        file_url.alias("file_url"),
    ).filter(F.col("file_url").isNotNull())  # asus.py:60-61
    items = base.select(
        F.lit("asus").alias("vendor"),
        "device_name",
        F.trim(F.replace(F.col("v"), F.lit("Version"), F.lit(""))).alias("firmware_version"),
        F.element_at(class_map, F.lower(F.substring("device_name", 1, 2))).alias(
            "device_class"),
        F.date_format(F.try_to_date(F.trim("d"), "yyyy/MM/dd"), "yyyy-MM-dd").alias(
            "release_date"),
        "file_url",
    )
    return None, _wrap_items(items)


# ---------------------------------------------------------------------------
# HP (hp.py) — table walk with lineage carry (X19/J6), multi-file items
# ---------------------------------------------------------------------------

def hp_parse(fetched: DataFrame):
    candidates = F.filter(
        _rows(),
        lambda r: (F.size(r["cells"]) >= 5)
        & (F.size(F.get(r["cells"], 4)["hrefs"]) > 0),
    )
    rows = fetched.select(
        "url", "depth", "seq", F.posexplode(candidates).alias("pos", "row")
    )
    next_url = _first(F.get(F.col("row.cells"), 4)["hrefs"])
    fixed = F.when(
        ~next_url.contains("http://"), F.concat(F.lit("http://"), next_url)
    ).otherwise(next_url)  # hp.py:24-25 quirk preserved
    raw_date = F.get(F.col("row.cells"), 3)["direct_text"]
    date = F.when(
        F.length(raw_date) == 4,
        F.date_format(F.try_to_date(raw_date, "yyyy"), "yyyy-MM-dd"),
    ).otherwise(F.date_format(F.try_to_date(raw_date, "yyyyMMdd"), "yyyy-MM-dd"))
    device = F.regexp_extract(
        F.concat(F.lit("<div>"), F.get(F.col("row.cells"), 0)["inner_html"],
                 F.lit("</div>")),
        r"</a> ?(.*?)</div>", 1,
    )
    staged = rows.withColumn("child_url", fixed)
    lineage = F.create_map(
        F.lit("device_name"), device,
        F.lit("device_class"), F.lit("Printer"),
        F.lit("firmware_version"), F.get(F.col("row.cells"), 2)["direct_text"],
        F.lit("release_date"), date,
    )
    return _children(staged, "hp:parse_firmware", lineage), None


def hp_parse_firmware(fetched: DataFrame):
    file_urls = F.transform(
        F.filter(
            _anchors(),
            lambda a: (a["class_attr"] == "button-sm primary hpdiaButton desktopHpdia")
            & a["href"].isNotNull(),
        ),
        lambda a: a["href"],
    )
    items = fetched.select(
        F.array(F.lit("HP")).alias("vendor"),
        F.array(F.col("lineage")["device_name"]).alias("device_name"),
        F.array(F.col("lineage")["firmware_version"]).alias("firmware_version"),
        F.array(F.col("lineage")["device_class"]).alias("device_class"),
        F.array(F.col("lineage")["release_date"]).alias("release_date"),
        file_urls.alias("file_urls"),
    )
    return None, items


# ---------------------------------------------------------------------------
# D-Link GPL (dlink_gpl.py) — POST forms (S2) + sequential pagination (W4)
# ---------------------------------------------------------------------------

def _form_map(d: dict, **dynamic):
    args = []
    for k, v in d.items():
        args += [F.lit(k), F.lit(v)]
    for k, v in dynamic.items():
        args += [F.lit(k), v]
    return F.create_map(*args)


def dlink_parse(fetched: DataFrame):
    devices = F.filter(
        _anchors(),
        lambda a: F.array_contains(a["td_classes"], "pord_3") & a["title"].isNotNull(),
    )
    dev_rows = fetched.select(
        "url", "depth", "seq", F.size(devices).alias("_n"),
        F.posexplode(devices).alias("pos", "a"),
    ).withColumn("product", F.get(F.split("a.title", "-", 2), 0)).withColumn(
        "model", F.get(F.split("a.title", "-", 2), 1)
    )
    detail_form = _form_map(
        dict(Enter="OK", ModelCategory="0", ModelSno="", Model_Sno="", OS="GPL"),
        ModelCategory_=F.col("product"), ModelSno_=F.col("model"),
    )
    # built inline (not via _children): the form_data map depends on
    # product/model columns that _children's projection would drop
    kids1 = (
        dev_rows.withColumn("child_url", F.lit(VN.DLINK_DETAIL_URL))
        .select(
            F.col("child_url").alias("url"),
            F.lit("dlink_gpl:detail").alias("rule"),
            F.create_map(F.lit("product"), F.col("product"),
                         F.lit("model"), F.col("model")).alias("lineage"),
            F.col("pos").cast("int").alias("pos"),
            (F.col("depth") + 1).alias("depth"),
            F.col("seq").alias("parent_seq"),
            detail_form.alias("form_data"),
        )
    )

    cells_flat = F.flatten(F.transform(_rows(), lambda r: r["cells"]))
    pag_cells = F.filter(
        cells_flat, lambda c: F.array_contains(c["input_names"], "sel_PageNo")
    )
    pag_text = F.trim(F.element_at(F.try_element_at(pag_cells, F.lit(-1))["texts"], -1))
    current = _first(
        F.filter(F.col("parsed.inputs"), lambda i: i["name"] == "sel_PageNo")
    )["value"].cast("int")
    g1 = F.regexp_extract(pag_text, r"^\((\d+)\s\/\s(\d+)\)$", 1).try_cast("int")
    g2 = F.regexp_extract(pag_text, r"^\((\d+)\s\/\s(\d+)\)$", 2).try_cast("int")
    pager = fetched.select(
        "url", "depth", "seq",
        F.size(devices).alias("pos"),
        current.alias("cur"), g1.alias("g1"), g2.alias("g2"),
    ).filter(
        F.col("cur").isNotNull() & F.col("g1").isNotNull()
        & (F.col("cur") == F.col("g1")) & (F.col("cur") < F.col("g2"))
    )
    next_form = _form_map(
        dict(Enter="OK", ModelCategory="0", ModelSno="0", ModelCategory_="",
             ModelSno_="", search_string="", ModelVer="", Model_Sno="", OS="GPL"),
        sel_PageNo=(F.col("cur") + 1).cast("string"),
    )
    kids2 = pager.select(
        F.lit(VN.DLINK_PAGE_URL).alias("url"),
        F.lit("dlink_gpl:parse").alias("rule"),
        F.create_map().cast("map<string,string>").alias("lineage"),
        F.col("pos").cast("int").alias("pos"),
        (F.col("depth") + 1).alias("depth"),
        F.col("seq").alias("parent_seq"),
        next_form.alias("form_data"),
    )
    return kids1.unionByName(kids2), None


def dlink_detail(fetched: DataFrame):
    fw_rows = F.filter(
        _rows(),
        lambda r: r["onclick"].isNotNull()
        & r["onclick"].rlike(r"^dwn\('([A-Z]+)',['\da-zA-Z]+\)$"),
    )
    staged = fetched.select(
        "url", "depth", "seq",
        F.col("lineage")["product"].alias("product"),
        F.col("lineage")["model"].alias("model"),
        F.posexplode(fw_rows).alias("pos", "row"),
    )
    identifier = F.regexp_extract(
        F.col("row.onclick"), r"^dwn\('([A-Z]+)',['\da-zA-Z]+\)$", 1
    )
    desc = F.trim(_first(F.get(F.col("row.cells"), 1)["texts"]))
    vraw = F.regexp_extract(desc, r"FW\sv(\d+\..+)", 1)
    version = F.when(vraw == "", "0.0").otherwise(vraw)
    file_form = _form_map(
        dict(Enter="OK", ModelCategory="0", ModelSno="0", Model_Sno="",
             ModelVer="", docuSource="1"),
        ModelCategory_=F.col("product"), ModelSno_=F.col("model"),
        docuSno=identifier,
    )
    kids = staged.select(
        F.lit(VN.DLINK_DDGO_URL).alias("url"),
        F.lit("dlink_gpl:download").alias("rule"),
        F.create_map(
            F.lit("product"), F.col("product"), F.lit("model"), F.col("model"),
            F.lit("version"), version,
        ).alias("lineage"),
        F.col("pos").cast("int").alias("pos"),
        (F.col("depth") + 1).alias("depth"),
        F.col("seq").alias("parent_seq"),
        file_form.alias("form_data"),
    )
    return kids, None


def dlink_download(fetched: DataFrame):
    tds = F.filter(
        F.flatten(F.transform(_rows(), lambda r: r["cells"])),
        lambda c: F.array_contains(c["td_classes"], "MdDclist12"),
    )
    link = _first(
        F.filter(
            F.try_element_at(tds, F.lit(3))["hrefs"],
            lambda h: h.contains("dlink-gpl.s3.amazonaws.com") & ~h.endswith(".txt"),
        )
    )
    date = F.trim(_first(F.try_element_at(tds, F.lit(4))["texts"]))
    base = fetched.select(
        F.col("lineage")["product"].alias("product"),
        F.col("lineage")["model"].alias("model"),
        F.col("lineage")["version"].alias("version"),
        link.alias("file_url"), date.alias("d"),
        F.size(tds).alias("_n"),
    ).filter((F.col("_n") >= 4) & F.col("file_url").isNotNull())
    items = base.select(
        F.lit("D-Link").alias("vendor"),
        F.concat("product", F.lit("-"), "model").alias("device_name"),
        F.col("version").alias("firmware_version"),
        F.lit("-").alias("device_class"),
        F.date_format(F.try_to_date("d", "yyyy/MM/dd"), "dd-MM-yyyy").alias(
            "release_date"),
        "file_url",
    )
    return None, _wrap_items(items)


# ---------------------------------------------------------------------------
# D-Link FTP walker (ftp/dlink.py) — JSON listings (S4/S5)
# ---------------------------------------------------------------------------

_FTP_LISTING_SCHEMA = "array<struct<name:string, size:bigint, modify:string, type:string>>"


def _ftp_entries_col():
    arr = F.from_json(F.col("html"), _FTP_LISTING_SCHEMA)
    return F.slice(arr, 4, F.greatest(F.size(arr) - 3, F.lit(0)))  # skip 3 (W3)


def ftp_root(fetched: DataFrame):
    skip = F.array(*[F.lit(x) for x in sorted(FTP_SKIPPED)])
    dirs = F.filter(
        _ftp_entries_col(),
        lambda e: (e["type"] == "dir") & ~F.array_contains(skip, e["name"]),
    )
    kids = fetched.select(
        "url", "depth", "seq", "lineage", F.posexplode(dirs).alias("pos", "e")
    ).withColumn("child_url", F.concat("url", F.col("e.name"), F.lit("/")))
    return _children(kids, "dlink_ftp:family"), None


def ftp_family(fetched: DataFrame):
    dirs = F.filter(_ftp_entries_col(), lambda e: e["type"] == "dir")
    kids = fetched.select(
        "url", "depth", "seq", F.posexplode(dirs).alias("pos", "e")
    ).withColumn("child_url", F.concat("url", F.col("e.name"), F.lit("/")))
    lineage = F.create_map(F.lit("device_name"), F.col("e.name"))
    return _children(kids, "dlink_ftp:device", lineage), None


def ftp_device(fetched: DataFrame):
    hits = F.filter(_ftp_entries_col(), lambda e: e["name"] == "driver_software")
    kids = fetched.select(
        "url", "depth", "seq", "lineage", F.posexplode(hits).alias("pos", "e")
    ).withColumn("child_url", F.concat("url", F.lit("driver_software/")))
    return _children(kids, "dlink_ftp:files"), None


def ftp_files(fetched: DataFrame):
    fw = F.filter(
        _ftp_entries_col(),
        lambda e: e["name"].rlike("zip$") & e["name"].contains("_fw_"),
    )
    staged = fetched.select(
        "url", F.col("lineage")["device_name"].alias("device_name"),
        F.explode(fw).alias("e"),
    )
    version = F.try_element_at(F.split("e.name", "_"), F.lit(4))
    epoch = F.unix_timestamp(
        F.try_to_timestamp(F.col("e.modify"), F.lit("yyyyMMddHHmmss"))
    ).cast("double")
    initials = F.get(F.split("device_name", "-"), 0)
    class_map = F.create_map(*[F.lit(x) for kv in FTP_DEVICE_CLASSES.items() for x in kv])
    base_class = F.element_at(class_map, initials)
    device_class = F.when(
        (initials == "dwl") & F.col("device_name").contains("ap") & base_class.isNotNull(),
        F.lit("Access Point"),
    ).otherwise(base_class)
    items = staged.select(
        F.lit("D-Link").alias("vendor"),
        "device_name",
        version.alias("firmware_version"),
        device_class.alias("device_class"),
        F.format_string("%.1f", epoch).alias("release_date"),
        F.concat("url", F.col("e.name")).alias("file_url"),
    )
    return None, _wrap_items(items)


VENDOR_RULES = {
    "tplink:parse": tplink_parse,
    "tplink:parse_product": tplink_parse_product,
    "tplink:parse_firmware": tplink_parse_firmware,
    "netgear_gpl:parse": netgear_parse,
    "linksys_gpl:parse": linksys_gpl_parse,
    "tplink_gpl:parse": tplink_gpl_parse,
    "tplink_gpl:parse_multi": tplink_gpl_parse_multi,
    "asus:parse": asus_parse,
    "asus:parse_firmware": asus_parse_firmware,
    "hp:parse": hp_parse,
    "hp:parse_firmware": hp_parse_firmware,
    "dlink_gpl:parse": dlink_parse,
    "dlink_gpl:detail": dlink_detail,
    "dlink_gpl:download": dlink_download,
    "dlink_ftp:root": ftp_root,
    "dlink_ftp:family": ftp_family,
    "dlink_ftp:device": ftp_device,
    "dlink_ftp:files": ftp_files,
}

# PAGE_STRUCT fields each vendor rule actually reads from `parsed` —
# merged into rulepacks.RULE_PARSE_FIELDS so the parse UDF trims its
# per-row output for vendor pages too (round-6 audit, one entry per
# `parsed.` / helper reference in the functions above). The dlink_ftp
# rules consume the raw `html` JSON listing via from_json and never read
# `parsed` at all: their empty tuple skips the HTML parse entirely.
# Forgetting a field a rule reads breaks the vendor parity suite
# (tests/test_crawl_vendors.py runs these rules through the full
# engine), never silently.
VENDOR_PARSE_FIELDS = {
    "tplink:parse": ("anchors",),
    "tplink:parse_product": ("anchors", "texts"),
    "tplink:parse_firmware": ("rows", "texts"),
    "netgear_gpl:parse": ("paras",),
    "linksys_gpl:parse": ("rows",),
    "tplink_gpl:parse": ("anchors",),
    "tplink_gpl:parse_multi": ("anchors", "rows"),
    "asus:parse": ("scripts",),
    "asus:parse_firmware": ("anchors", "texts"),
    "hp:parse": ("rows",),
    "hp:parse_firmware": ("anchors",),
    "dlink_gpl:parse": ("anchors", "rows", "inputs"),
    "dlink_gpl:detail": ("rows",),
    "dlink_gpl:download": ("rows",),
    "dlink_ftp:root": (),
    "dlink_ftp:family": (),
    "dlink_ftp:device": (),
    "dlink_ftp:files": (),
}

VENDOR_HOST_PATTERNS = {
    "tplink": r"^(www|static)\.tp-link\.com$",
    "netgear_gpl": r"^www\.downloads\.netgear\.com$",
    "linksys_gpl": r"^(www|downloads)\.linksys\.com$",
    "tplink_gpl": r"^(www|static)\.tp-link\.com$",
    # asus.py / hp.py declare no allowed_domains -> offsite filter disabled
    "asus": r".*",
    "hp": r".*",
    "dlink_gpl": r"^(tsd\.dlink\.com\.tw|dlink-gpl\.s3\.amazonaws\.com)$",
    "dlink_ftp": r"^ftp\.dlink\.de$",
}
