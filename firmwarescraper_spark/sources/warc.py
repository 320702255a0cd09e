"""WARC (ISO 28500) container source/sink for Common-Crawl-style pages.

The input_hint's pages table (url, warc_ts, html, text, lang) is the
*decoded* form of what Common Crawl actually ships: WARC/1.0 files where
each record is an independently-gzipped member and a response record's
block is a raw HTTP/1.1 message. This module closes that gap so the
engine can ingest real CC segments and emit crawl output in the same
wire format (the reference scrapy spiders fetch live sites —
firmware/spiders/avm.py:20-44 — so WARC is the batch-corpus analogue of
their download stage, not a ported feature).

Layout follows Common Crawl exactly:

* ``.warc.gz`` = a CONCATENATION of per-record gzip members (one member
  per WARC record). A reader can therefore split on member boundaries
  without decompressing the whole file, and a writer builds the file
  record-by-record in one pass.
* Response records carry ``Content-Type: application/http;
  msgtype=response``; the payload (the HTML) starts after the HTTP
  head's first blank line.

Scale notes (100 TB): a CC crawl is ~64k files x ~1 GB; Spark's
``binaryFile`` source does not split individual files, so parallelism ==
file count — exactly how CC is processed in practice (one task decodes
one file's gzip-member stream; decompression is sequential per file by
format necessity, embarrassingly parallel across files). All decoding
runs in Arrow-batched ``mapInPandas`` (no per-row Python UDFs); records
stream member-by-member so a task never materializes more than one
record block beyond the configured cap.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from datetime import datetime, timezone

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

_CRLF = b"\r\n"

# ---------------------------------------------------------------------------
# record codec (pure functions — unit-testable without Spark)
# ---------------------------------------------------------------------------


def _warc_date(epoch_sec: int) -> str:
    return datetime.fromtimestamp(int(epoch_sec), tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ")


def _record_id(uri: str, epoch_sec: int) -> str:
    """Deterministic WARC-Record-ID (rerun/engine-stable, like every other
    compared hash in this repo): a UUID-shaped md5 of (uri, date)."""
    h = hashlib.md5(f"{uri}|{epoch_sec}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


_REVISIT_PROFILE = \
    "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"


def encode_record(uri: str, epoch_sec: int, payload: bytes,
                  rec_type: str = "response", http_status: int = 200,
                  gzip_member: bool = True, refers_to_epoch: int = None,
                  payload_digest: str = None) -> bytes:
    """One WARC/1.0 record; for ``rec_type='response'`` the block is a raw
    HTTP/1.1 message wrapping ``payload`` (Common Crawl's response
    layout). ``rec_type='revisit'`` emits CC's cross-crawl dedup record
    (identical-payload-digest profile): an EMPTY block (deterministic;
    the spec allows the fetched HTTP headers, which this engine does not
    retain) with WARC-Profile, WARC-Refers-To-Target-URI (same URI —
    the identical-URL revisit CC emits), WARC-Refers-To-Date pointing at
    the prior capture, and WARC-Payload-Digest carrying ``payload_digest``.
    Returns the record as its own gzip member when ``gzip_member``
    (CC's .warc.gz layout) else plain bytes."""
    epoch_sec = int(epoch_sec)   # numpy ints format identically after this
    extra = ""
    if rec_type == "response":
        http_head = (f"HTTP/1.1 {http_status} OK\r\n"
                     f"Content-Type: text/html; charset=utf-8\r\n"
                     f"Content-Length: {len(payload)}\r\n\r\n").encode()
        block = http_head + payload
        content_type = "application/http; msgtype=response"
    elif rec_type == "revisit":
        block = b""
        content_type = "application/http; msgtype=response"
        extra = (f"WARC-Profile: {_REVISIT_PROFILE}\r\n"
                 f"WARC-Refers-To-Target-URI: {uri}\r\n"
                 f"WARC-Refers-To-Date: "
                 f"{_warc_date(int(refers_to_epoch or 0))}\r\n")
        if payload_digest:
            extra += f"WARC-Payload-Digest: {payload_digest}\r\n"
    else:
        block = payload
        content_type = "application/octet-stream"
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {rec_type}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: {_warc_date(epoch_sec)}\r\n"
            f"WARC-Record-ID: {_record_id(uri, epoch_sec)}\r\n"
            + extra +
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(block)}\r\n\r\n").encode()
    rec = head + block + _CRLF + _CRLF
    if not gzip_member:
        return rec
    buf = io.BytesIO()
    # mtime pinned so output is byte-deterministic across reruns
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(rec)
    return buf.getvalue()


def _split_gzip_members(data: bytes):
    """Yield each gzip member of a multi-member stream decompressed —
    the CC .warc.gz record boundary. Streams via zlib so only one
    member is resident at a time; trailing garbage ends the stream
    instead of raising (truncated tail files happen in real crawls)."""
    pos = 0
    view = memoryview(data)   # zero-copy slicing: the bytes-slice form
    # copied the entire remaining stream per member — O(members x bytes)
    # memcpy, the dominant cost of parsing a many-record .warc.gz
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(view[pos:])
        except zlib.error:
            return
        if not d.eof:            # truncated final member
            return
        yield out
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def parse_warc_bytes(data: bytes):
    """Yield dicts (rec_type, uri, epoch_sec, http_status, payload) for
    every well-formed record in ``data`` (gzip multi-member or plain
    concatenated WARC). Malformed records end the stream quietly —
    never raise on hostile input (same contract as multimodal/codecs)."""
    if data[:2] == b"\x1f\x8b":
        chunks = _split_gzip_members(data)
    else:
        chunks = [data]
    for chunk in chunks:
        pos = 0
        while True:
            rec, pos = _parse_one(chunk, pos)
            if rec is None:
                break
            yield rec


_DATE_DIGITS = (0, 1, 2, 3, 5, 6, 8, 9, 11, 12, 14, 15, 17, 18)


def _warc_epoch(date: str) -> int:
    """Epoch seconds of a WARC-Date string — semantics identical to
    ``strptime(date, "%Y-%m-%dT%H:%M:%SZ")`` (raises ValueError on
    anything it rejects) but ~10x faster on the canonical zero-padded
    20-char layout every conforming writer emits; non-canonical-but-
    parseable variants (e.g. single-digit fields, which %m tolerates)
    fall back to strptime."""
    if (len(date) == 20 and date[4] == "-" and date[7] == "-"
            and date[10] == "T" and date[13] == ":" and date[16] == ":"
            and date[19] == "Z"
            and all(date[i].isdigit() for i in _DATE_DIGITS)):
        # datetime() applies the same range/calendar validation the
        # strptime path ends with (ValueError on Feb 31 etc.)
        return int(datetime(
            int(date[0:4]), int(date[5:7]), int(date[8:10]),
            int(date[11:13]), int(date[14:16]), int(date[17:19]),
            tzinfo=timezone.utc).timestamp())
    return int(datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ")
               .replace(tzinfo=timezone.utc).timestamp())


def _parse_one(buf: bytes, pos: int):
    start = buf.find(b"WARC/", pos)
    if start < 0:
        return None, pos
    head_end = buf.find(_CRLF + _CRLF, start)
    if head_end < 0:
        return None, pos
    headers = {}
    for line in buf[start:head_end].split(_CRLF)[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().lower()] = v.strip()
    try:
        length = int(headers.get(b"content-length", b""))
    except ValueError:
        return None, pos
    block_start = head_end + 4
    if block_start + length > len(buf):
        return None, pos                      # truncated record
    block = buf[block_start:block_start + length]
    uri = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
    rec_type = headers.get(b"warc-type", b"").decode("ascii", "replace")
    date = headers.get(b"warc-date", b"").decode("ascii", "replace")
    try:
        epoch = _warc_epoch(date)
    except ValueError:
        epoch = 0
    status, payload = 0, block
    if rec_type == "response" and block[:5] == b"HTTP/":
        he = block.find(_CRLF + _CRLF)
        if he >= 0:
            status_line = block[:he].split(_CRLF)[0].split(b" ")
            try:
                status = int(status_line[1])
            except (IndexError, ValueError):
                status = 0
            payload = block[he + 4:]
    rdate = headers.get(b"warc-refers-to-date", b"").decode("ascii", "replace")
    try:
        refers_epoch = _warc_epoch(rdate)
    except ValueError:
        refers_epoch = None
    return ({"rec_type": rec_type, "uri": uri, "epoch_sec": epoch,
             "http_status": status, "payload": payload,
             "refers_to_epoch": refers_epoch,
             "payload_digest": headers.get(b"warc-payload-digest", b"")
             .decode("ascii", "replace") or None},
            block_start + length + 4)


# ---------------------------------------------------------------------------
# DataFrame codec (distributed, Arrow-batched)
# ---------------------------------------------------------------------------

_BLOB_SCHEMA = StructType([StructField("warc", BinaryType())])

_PAGE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_epoch", LongType()),
    StructField("http_status", IntegerType()),
    StructField("html", BinaryType()),
])


def pages_to_warc(pages: DataFrame, url_col: str = "url",
                  epoch_col: str = "warc_epoch", payload_col: str = "html",
                  status_col: str = None, rec_type_col: str = None,
                  refers_epoch_col: str = None, digest_col: str = None,
                  gzip_members: bool = True) -> DataFrame:
    """Encode page rows into WARC blobs — one multi-record blob per Arrow
    batch, each record its own gzip member (so blobs concatenate into a
    valid .warc.gz). Scan-fused mapInPandas: no shuffle; at 100 TB this
    is the shape of the fetch-sink stage (one ~1 GB file per task).
    ``status_col`` carries the HTTP status into the record's HTTP head
    (default: 200 for every row). ``rec_type_col`` (usually the
    ``classify_revisits`` output) switches rows between full response
    records and CC revisit records; revisit rows read their prior
    capture's date from ``refers_epoch_col`` and carry ``digest_col``
    as WARC-Payload-Digest — their payload bytes are NOT written (the
    entire point of the revisit record: a 10^10-page recrawl whose
    corpus barely changed writes digests, not bodies)."""
    cols = ([url_col, epoch_col, payload_col]
            + [c for c in (status_col, rec_type_col, refers_epoch_col,
                           digest_col) if c])

    def enc(batches):
        import pandas as pd
        for pdf in batches:
            n = len(pdf)
            statuses = pdf[status_col] if status_col else [200] * n
            rtypes = pdf[rec_type_col] if rec_type_col else ["response"] * n
            refers = pdf[refers_epoch_col] if refers_epoch_col else [0] * n
            digests = pdf[digest_col] if digest_col else [None] * n
            parts = [
                encode_record(
                    u, e, b"" if t == "revisit" else bytes(p),
                    rec_type=str(t), http_status=int(s),
                    gzip_member=gzip_members,
                    refers_to_epoch=int(r) if r == r and r is not None else 0,
                    payload_digest=d if isinstance(d, str) else None)
                for u, e, p, s, t, r, d in zip(
                    pdf[url_col], pdf[epoch_col], pdf[payload_col],
                    statuses, rtypes, refers, digests)
            ]
            if parts:
                yield pd.DataFrame({"warc": [b"".join(parts)]})

    return pages.select(*cols).mapInPandas(enc, _BLOB_SCHEMA)


def warc_to_pages(blobs: DataFrame, blob_col: str = "warc") -> DataFrame:
    """Decode WARC blobs back into page rows (response records only —
    warcinfo/request/metadata records are crawl bookkeeping, not corpus).
    Streams record-by-record; a malformed tail yields the records before
    it. Output: (url, warc_epoch, http_status, html)."""

    def dec(batches):
        import pandas as pd
        for pdf in batches:
            rows = [
                (r["uri"], r["epoch_sec"], r["http_status"], r["payload"])
                for blob in pdf[blob_col] if blob is not None
                for r in parse_warc_bytes(bytes(blob))
                if r["rec_type"] == "response"
            ]
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "url", "warc_epoch", "http_status", "html"])

    out = blobs.select(blob_col).mapInPandas(dec, _PAGE_SCHEMA)
    return out


_RECORD_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("rec_type", StringType()),
    StructField("warc_epoch", LongType()),
    StructField("http_status", IntegerType()),
    StructField("refers_to_epoch", LongType()),
    StructField("payload_digest", StringType()),
])


def warc_records(blobs: DataFrame, blob_col: str = "warc") -> DataFrame:
    """Record-level metadata view of WARC blobs — EVERY record type
    (response, revisit, warcinfo, ...), payload bytes dropped. This is
    the crawl-accounting read path: revisit fraction per segment, digest
    coverage, capture timeline — the stats CC publishes per crawl.
    Same scan-fused mapInPandas shape as warc_to_pages."""

    def dec(batches):
        import pandas as pd
        for pdf in batches:
            rows = [
                (r["uri"], r["rec_type"], r["epoch_sec"], r["http_status"],
                 r["refers_to_epoch"], r["payload_digest"])
                for blob in pdf[blob_col] if blob is not None
                for r in parse_warc_bytes(bytes(blob))
            ]
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "url", "rec_type", "warc_epoch", "http_status",
                    "refers_to_epoch", "payload_digest"])

    return blobs.select(blob_col).mapInPandas(dec, _RECORD_SCHEMA)


def classify_revisits(pages: DataFrame, prior: DataFrame,
                      url_col: str = "url", payload_col: str = "html",
                      digest_col: str = "digest",
                      prior_epoch_col: str = "warc_epoch") -> DataFrame:
    """Cross-crawl dedup classification — CC's revisit-record semantics:
    a refetched page whose payload digest equals the prior crawl's
    capture of the SAME url becomes a ``revisit`` (written without its
    body, pointing at the original capture); changed or fresh urls stay
    ``response``. ``prior`` is (url, digest, prior-epoch) — exactly the
    per-SURT cdx_index projection a deployment already has per cycle.

    Digest is sha256 hex of the payload (CC ships sha1-base32;
    digest-agnostic by design — both sides of the comparison use the
    same function, documented divergence). Output: the page rows plus
    (digest, rec_type, refers_to_epoch) — feed straight into
    ``pages_to_warc(rec_type_col=..., refers_epoch_col=...,
    digest_col=...)``.

    Scale shape: one url-keyed equi-join against the prior index —
    exchange-free on the index side when it is stored bucketed by url
    (the anti_join_cdx layout); the only new column work is one sha256
    per page, fused into the scan."""
    d = pages.withColumn(digest_col, F.sha2(F.col(payload_col), 256))
    pr = prior.select(
        F.col(url_col),
        F.col(digest_col).alias("_prior_digest"),
        F.col(prior_epoch_col).alias("_prior_epoch"),
    )
    joined = d.join(pr, url_col, "left")
    is_rev = (F.col("_prior_digest").isNotNull()
              & (F.col("_prior_digest") == F.col(digest_col)))
    return (
        joined.withColumn(
            "rec_type",
            F.when(is_rev, F.lit("revisit")).otherwise(F.lit("response")))
        .withColumn(
            "refers_to_epoch",
            F.when(is_rev, F.col("_prior_epoch")).cast("long"))
        .drop("_prior_digest", "_prior_epoch")
    )


# ---------------------------------------------------------------------------
# file sink / source (the write_training_shards pattern)
# ---------------------------------------------------------------------------


def write_warc(pages: DataFrame, out_dir: str, url_col: str = "url",
               epoch_col: str = "warc_epoch",
               payload_col: str = "html") -> list:
    """Materialize pages as ``part-<n>.warc.gz`` files, one per partition,
    written inside the tasks (never through the driver). Returns a small
    manifest [(path, records)] — the Iceberg-manifest analogue, same
    contract as plans/curate.write_training_shards."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    manifest_schema = StructType([
        StructField("path", StringType()), StructField("records", LongType())])

    def sink(batches):
        import pandas as pd
        n, buf, pid = 0, [], None
        for pdf in batches:
            for u, e, p in zip(pdf[url_col], pdf[epoch_col], pdf[payload_col]):
                buf.append(encode_record(u, int(e), bytes(p)))
                n += 1
        if not buf:
            return
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        with open(path, "wb") as f:
            f.write(b"".join(buf))
        yield pd.DataFrame({"path": [path], "records": [n]})

    rows = (pages.select(url_col, epoch_col, payload_col)
            .mapInPandas(sink, manifest_schema).collect())
    return sorted((r.path, r.records) for r in rows)


def read_warc(spark, path_glob: str) -> DataFrame:
    """Read .warc(.gz) files into page rows. binaryFile keeps one file =
    one task (CC files are per-record-gzipped so a file is sequential by
    format; a 64k-file crawl gives 64k-way parallelism)."""
    blobs = (spark.read.format("binaryFile").load(path_glob)
             .select(F.col("content").alias("warc")))
    return warc_to_pages(blobs)
