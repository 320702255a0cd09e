"""WARC source/sink (sources/warc.py): record codec, CC-style gzip-member
layout, distributed round trip, and the file sink/source pair.

The reference fetches live sites (firmware/spiders/avm.py:20-44); WARC is
the batch-corpus analogue of that download stage — Common Crawl's actual
wire format for the input_hint pages table."""

import gzip

import pytest
from pyspark.sql import functions as F

from firmwarescraper_spark.sources import warc as W


def _mk(uri="http://a.example/x?b=2&a=1", epoch=1704067200,
        payload=b"<html>hello</html>", **kw):
    return W.encode_record(uri, epoch, payload, **kw)


# ---------------------------------------------------------------------------
# pure codec
# ---------------------------------------------------------------------------

def test_encode_record_plain_layout():
    rec = _mk(gzip_member=False)
    head, _, rest = rec.partition(b"\r\n\r\n")
    lines = head.split(b"\r\n")
    assert lines[0] == b"WARC/1.0"
    hdrs = dict(l.split(b": ", 1) for l in lines[1:])
    assert hdrs[b"WARC-Type"] == b"response"
    assert hdrs[b"WARC-Target-URI"] == b"http://a.example/x?b=2&a=1"
    assert hdrs[b"WARC-Date"] == b"2024-01-01T00:00:00Z"
    # block = HTTP head + payload; Content-Length covers the whole block
    assert rest.startswith(b"HTTP/1.1 200 OK\r\n")
    assert rest.endswith(b"<html>hello</html>\r\n\r\n")
    block_len = int(hdrs[b"Content-Length"])
    assert block_len == len(rest) - 4


def test_encode_is_deterministic():
    assert _mk() == _mk()                        # incl. record id + gzip mtime
    assert _mk(uri="http://b/") != _mk(uri="http://c/")


def test_roundtrip_single_record():
    recs = list(W.parse_warc_bytes(_mk()))
    assert len(recs) == 1
    r = recs[0]
    assert r["rec_type"] == "response"
    assert r["uri"] == "http://a.example/x?b=2&a=1"
    assert r["epoch_sec"] == 1704067200
    assert r["http_status"] == 200
    assert r["payload"] == b"<html>hello</html>"


def test_gzip_members_concatenate_and_split():
    # CC layout: a .warc.gz is per-record gzip members, concatenated
    data = b"".join(_mk(uri=f"http://h/{i}", payload=b"p%d" % i)
                    for i in range(5))
    recs = list(W.parse_warc_bytes(data))
    assert [r["uri"] for r in recs] == [f"http://h/{i}" for i in range(5)]
    assert [r["payload"] for r in recs] == [b"p%d" % i for i in range(5)]


def test_plain_concatenation_also_parses():
    data = b"".join(_mk(uri=f"http://h/{i}", gzip_member=False)
                    for i in range(3))
    assert len(list(W.parse_warc_bytes(data))) == 3


def test_non_response_records_and_status():
    info = W.encode_record("http://h/", 0, b"software: x", rec_type="warcinfo")
    resp404 = _mk(uri="http://h/missing", http_status=404)
    recs = list(W.parse_warc_bytes(info + resp404))
    assert [r["rec_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[0]["payload"] == b"software: x"
    assert recs[1]["http_status"] == 404


@pytest.mark.parametrize("mangle", [
    lambda d: d[: len(d) // 2],                     # truncated member
    lambda d: d + b"\x00garbage-not-gzip",          # trailing garbage
    lambda d: d + gzip.compress(b"WARC/1.0\r\nContent-Length: zz\r\n\r\n"),
])
def test_malformed_tail_never_raises(mangle):
    good = _mk(uri="http://h/ok")
    recs = list(W.parse_warc_bytes(good + mangle(_mk(uri="http://h/bad"))))
    assert [r["uri"] for r in recs][:1] == ["http://h/ok"]


def test_oversize_content_length_is_truncation():
    rec = _mk(gzip_member=False)
    # lie: double the declared length -> record extends past the buffer
    rec = rec.replace(b"Content-Length: ", b"Content-Length: 9", 1)
    assert list(W.parse_warc_bytes(rec)) == []


# ---------------------------------------------------------------------------
# distributed round trip
# ---------------------------------------------------------------------------

@pytest.fixture()
def pages(spark):
    rows = [(f"http://site{i % 3}.example/p/{i}", 1704067200 + i * 7,
             200 if i % 5 else 404, f"<html>doc {i} ü</html>".encode())
            for i in range(40)]
    return spark.createDataFrame(rows, "url string, warc_epoch long, "
                                       "http_status int, html binary")


def test_dataframe_roundtrip_byte_identical(spark, pages):
    blobs = W.pages_to_warc(pages.repartition(4), status_col="http_status")
    back = W.warc_to_pages(blobs)
    want = {(r.url, r.warc_epoch, r.html) for r in pages.collect()}
    got = {(r.url, r.warc_epoch, r.html) for r in back.collect()}
    assert got == want                      # byte-identical payloads
    # statuses survive too (404s included — they're corpus rows in CC)
    assert back.filter(F.col("http_status") == 404).count() == \
        pages.filter(F.col("http_status") == 404).count()


def test_roundtrip_plan_has_no_exchange(spark, pages):
    plan = W.warc_to_pages(W.pages_to_warc(pages)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan           # scan-fused encode + decode


def test_file_sink_source_roundtrip(spark, pages, tmp_path):
    out = str(tmp_path / "warcs")
    manifest = W.write_warc(pages.repartition(3), out)
    assert sum(n for _, n in manifest) == 40
    assert all(p.endswith(".warc.gz") for p, _ in manifest)
    back = W.read_warc(spark, out)
    assert {(r.url, r.html) for r in back.collect()} == \
        {(r.url, r.html) for r in pages.collect()}
    # each file is a valid standalone multi-member .warc.gz
    with open(manifest[0][0], "rb") as f:
        assert next(iter(W.parse_warc_bytes(f.read())))["rec_type"] == "response"


# ---------------------------------------------------------------------------
# revisit records (CC cross-crawl dedup)
# ---------------------------------------------------------------------------

def test_revisit_record_codec():
    rec = _mk(rec_type="revisit", refers_to_epoch=1600000000,
              payload_digest="sha256:ab12", gzip_member=False)
    # empty block, profile + refers headers present on the wire
    assert b"WARC-Type: revisit" in rec
    assert b"WARC-Profile: " + W._REVISIT_PROFILE.encode() in rec
    assert b"WARC-Refers-To-Target-URI: http://a.example/x?b=2&a=1" in rec
    assert b"WARC-Refers-To-Date: 2020-09-13" in rec
    assert b"Content-Length: 0\r\n" in rec
    (r,) = list(W.parse_warc_bytes(rec))
    assert (r["rec_type"], r["payload"]) == ("revisit", b"")
    assert r["refers_to_epoch"] == 1600000000
    assert r["payload_digest"] == "sha256:ab12"
    # response records parse with the new fields absent
    (r2,) = list(W.parse_warc_bytes(_mk(gzip_member=False)))
    assert r2["refers_to_epoch"] is None and r2["payload_digest"] is None


def test_classify_revisits_semantics(spark):
    import hashlib
    pages = spark.createDataFrame(
        [("u/same", 200, b"same-body"), ("u/changed", 201, b"new-body"),
         ("u/fresh", 202, b"fresh-body")],
        "url string, warc_epoch long, html binary")
    prior = spark.createDataFrame(
        [("u/same", hashlib.sha256(b"same-body").hexdigest(), 100),
         ("u/changed", hashlib.sha256(b"old-body").hexdigest(), 101)],
        "url string, digest string, warc_epoch long")
    out = {r["url"]: r
           for r in W.classify_revisits(pages, prior).collect()}
    assert (out["u/same"]["rec_type"],
            out["u/same"]["refers_to_epoch"]) == ("revisit", 100)
    # digest mismatch and fresh url both stay full responses
    assert out["u/changed"]["rec_type"] == "response"
    assert out["u/changed"]["refers_to_epoch"] is None
    assert out["u/fresh"]["rec_type"] == "response"


def test_revisit_wire_roundtrip_drops_bodies(spark):
    import hashlib
    pages = spark.createDataFrame(
        [("u/same", 200, b"same-body"), ("u/fresh", 202, b"fresh-body")],
        "url string, warc_epoch long, html binary")
    prior = spark.createDataFrame(
        [("u/same", hashlib.sha256(b"same-body").hexdigest(), 100)],
        "url string, digest string, warc_epoch long")
    cls = W.classify_revisits(pages, prior)
    blobs = W.pages_to_warc(cls, rec_type_col="rec_type",
                            refers_epoch_col="refers_to_epoch",
                            digest_col="digest")
    # the revisit body never reaches the wire (gzip.decompress handles
    # the concatenated-member layout)
    blob = b"".join(bytes(r["warc"]) for r in blobs.collect())
    wire = gzip.decompress(blob)
    assert b"same-body" not in wire and b"fresh-body" in wire
    recs = {r["url"]: r for r in W.warc_records(blobs).collect()}
    assert recs["u/same"]["rec_type"] == "revisit"
    assert recs["u/same"]["refers_to_epoch"] == 100
    assert recs["u/same"]["payload_digest"] == \
        hashlib.sha256(b"same-body").hexdigest()
    # corpus view excludes revisits, keeps the fresh response
    corpus = W.warc_to_pages(blobs).collect()
    assert [r["url"] for r in corpus] == ["u/fresh"]
    assert bytes(corpus[0]["html"]) == b"fresh-body"
