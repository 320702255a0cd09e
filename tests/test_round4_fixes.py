"""Round-4 behaviors: ADVICE r3 fixes (top-bigram clamp, deterministic
feed join key, seq-width resume migration) plus the r3 verdict's scale
items (size-gated fetch build side, shuffle-free collect_downloads, state
compaction, pluggable fetcher, ANN LSH oracle parity)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from firmwarescraper_spark.plans.crawl import CrawlEngine
from firmwarescraper_spark.sources import generate as G

SCHEMA = ("url string, warc_ts timestamp, html binary, text string, "
          "lang string")


def _write_pages(spark, path, pages: dict):
    rows = G._rows_from_pages(pages)
    spark.createDataFrame(pd.DataFrame(rows), SCHEMA).write.mode(
        "overwrite").parquet(path)


# ---------------------------------------------------------------------------
# ADVICE r3: top_bigram_frac is a [0,1] fraction
# ---------------------------------------------------------------------------

def test_top_bigram_frac_clamped_to_one(spark):
    """Overlapping occurrences can push count*n past n_words ('a a a a':
    bigram 'a a' occurs 3x overlapping -> 3*2/4 = 1.5); Gopher thresholds
    treat the signal as a [0,1] fraction, so it must clamp at 1.0."""
    from firmwarescraper_spark.operators import textops as TX

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "x y x y")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in TX.repetition_signals(docs).collect()}
    assert rows[1]["top_bigram_frac"] == pytest.approx(1.0)
    assert rows[2]["top_bigram_frac"] == pytest.approx(1.0)  # 2*2/4, no clamp


# ---------------------------------------------------------------------------
# ADVICE r3: feed join-back key is deterministic content, not
# monotonically_increasing_id
# ---------------------------------------------------------------------------

def test_export_feed_duplicate_items_share_files(spark, tmp_path):
    """Two items with identical file_urls must each carry the same files
    array with NO duplicated entries — the join-back key is content-derived
    (xxhash64 of the file_urls list), so cache eviction / recomputation
    cannot shift row identity the way monotonically_increasing_id could."""
    pages = {"http://h.example/fw/a.bin": "BLOB-A"}
    corpus = str(tmp_path / "pages")
    _write_pages(spark, corpus, pages)
    eng = CrawlEngine(spark, corpus, str(tmp_path / "state"))
    items = spark.createDataFrame(
        [(["V1"], ["d1"], ["1.0"], ["Router"], ["01-01-2020"],
          ["http://h.example/fw/a.bin"]),
         (["V2"], ["d2"], ["2.0"], ["Router"], ["02-01-2020"],
          ["http://h.example/fw/a.bin"])],
        "vendor array<string>, device_name array<string>, "
        "firmware_version array<string>, device_class array<string>, "
        "release_date array<string>, file_urls array<string>")
    eng._append(items, "items", 0)
    eng._commit_round(0)
    eng.collect_downloads()
    n = eng.export_feed(str(tmp_path / "feed"))
    assert n == 2
    fed = spark.read.json(str(tmp_path / "feed")).collect()
    assert len(fed) == 2
    for row in fed:
        files = row["files"]
        assert len(files) == 1  # one entry per file URL, never duplicated
        assert files[0]["url"] == "http://h.example/fw/a.bin"
        assert files[0]["path"] == "a.bin"


# ---------------------------------------------------------------------------
# ADVICE r3: seq pad-width migration on resume
# ---------------------------------------------------------------------------

def test_seq_width_migration_on_read(spark, tmp_path):
    """A frontier snapshot written by the %06d-era engine must read back
    with every numeric dot-component left-padded to 9 digits, restoring
    the lexicographic==numeric DFS-order invariant against new rows
    ('000123' vs '000000456'). Non-numeric components (bench frontiers
    seed seq=url) pass through untouched."""
    eng = CrawlEngine(spark, str(tmp_path / "nopages"), str(tmp_path / "state"))
    old = spark.createDataFrame(
        [("http://h/a", "http://h/a", 1, "h", 0, 0, "r", {}, "000123", 0, {},
          "http://h/a", 0),
         ("http://h/b", "http://h/b", 2, "h", 1, 0, "r", {},
          "000123.000000456", 0, {}, "http://h/b", 0),
         ("http://h/c", "http://h/c", 3, "h", 0, 0, "r", {},
          "http://x.example/p.7?q=1", 0, {}, "http://h/c", 0)],
        eng_schema(),
    )
    eng._write_frontier(old, 0)
    got = {r["url"]: r["seq"] for r in eng._read_frontier(0).collect()}
    assert got["http://h/a"] == "000000123"
    assert got["http://h/b"] == "000000123.000000456"
    # mixed-width rows now compare numerically via string order
    assert got["http://h/a"] < got["http://h/b"]
    # URL-shaped seq: components carrying any non-digit char pass through
    # byte-identical, so bench frontiers seeded with seq=url are untouched
    assert got["http://h/c"] == "http://x.example/p.7?q=1"


def eng_schema():
    from firmwarescraper_spark.plans.crawl import FRONTIER_SCHEMA

    return FRONTIER_SCHEMA


# ---------------------------------------------------------------------------
# r3 verdict #1: size-gated fetch-join build side
# ---------------------------------------------------------------------------

def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fetch_broadcast_autogate(spark, tmp_path):
    """broadcast_fetch='auto' must broadcast the dequeued set only while
    the frontier snapshot (an upper bound on it) fits the cap; past the
    cap the join runs unhinted — no forced BroadcastExchange of an
    unbounded dequeued set — and the crawl result is identical."""
    corpus = str(tmp_path / "pages")
    G.write_corpus(spark, corpus, n_avm=2, n_linksys=2, partitions=2)

    a = CrawlEngine(spark, corpus, str(tmp_path / "state_a"))
    a.run(G.seeds(), fresh=True)
    # default auto: tiny frontier -> broadcast chosen
    assert a._fetch_broadcast_choice(0) is True

    b = CrawlEngine(spark, corpus, str(tmp_path / "state_b"),
                    broadcast_cap_bytes=0)  # every snapshot "too big"
    b._write_frontier(b.seed_frontier(G.seeds()), 0)
    res = b.run_round(0)
    assert res["fetch_broadcast"] is False
    b.run()  # drain to fixpoint on the non-broadcast path
    assert ({r["fetch_key"] for r in a.seen().collect()}
            == {r["fetch_key"] for r in b.seen().collect()})
    assert a.items().count() == b.items().count()


def test_fetch_join_plan_no_forced_broadcast(spark, tmp_path):
    """Plan-shape pin: with the gate OFF the dequeued build side carries no
    broadcast hint, so (auto-broadcast disabled) the physical plan has no
    BroadcastExchange; with the gate ON it does."""
    corpus = str(tmp_path / "pages")
    G.write_corpus(spark, corpus, n_avm=2, n_linksys=2, partitions=2)
    eng = CrawlEngine(spark, corpus, str(tmp_path / "state"))
    dequeued = eng.seed_frontier(G.seeds())
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert "BroadcastExchange" not in _physical_plan(
            eng._fetch_join(dequeued, use_bcast=False))
        assert "BroadcastExchange" in _physical_plan(
            eng._fetch_join(dequeued, use_bcast=True))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# ---------------------------------------------------------------------------
# r3 verdict #2: collect_downloads must not shuffle the corpus
# ---------------------------------------------------------------------------

def test_collect_downloads_no_corpus_shuffle(spark, tmp_path):
    """The blob fetch is a broadcast-INNER join with the corpus streamed:
    the corpus scan must not sit under any Exchange. Also re-pins the
    miss semantics (absent URL stays pending, logged to download_misses)."""
    pages = {"http://h.example/fw/a.bin": "BLOB-A",
             "http://h.example/fw/b.bin": "BLOB-B"}
    corpus = str(tmp_path / "pages")
    _write_pages(spark, corpus, pages)
    eng = CrawlEngine(spark, corpus, str(tmp_path / "state"))
    items = spark.createDataFrame(
        [(["V"], ["d"], ["1.0"], ["Router"], ["01-01-2020"],
          ["http://h.example/fw/a.bin", "http://h.example/fw/missing.bin"]),
         (["V"], ["d2"], ["1.1"], ["Router"], ["01-02-2020"],
          ["http://h.example/fw/b.bin"])],
        "vendor array<string>, device_name array<string>, "
        "firmware_version array<string>, device_class array<string>, "
        "release_date array<string>, file_urls array<string>")
    eng._append(items, "items", 0)
    eng._commit_round(0)
    manifest = eng.collect_downloads()
    assert {r["url"] for r in manifest.collect()} == {
        "http://h.example/fw/a.bin", "http://h.example/fw/b.bin"}
    misses = spark.read.parquet(os.path.join(eng.state_dir, "download_misses"))
    assert {r["url"] for r in misses.collect()} == {
        "http://h.example/fw/missing.bin"}
    # plan pin: corpus-side scan feeds the join with no Exchange between
    # them — the pending set broadcasts, the corpus streams
    pending = spark.createDataFrame(
        [("http://h.example/fw/a.bin",)], "canon_url string")
    blobs = eng._raw_pages().select(
        F.col("url").alias("canon_url"), F.col("html").alias("blob")
    ).join(F.broadcast(pending), "canon_url", "inner")
    plan = _physical_plan(blobs)
    assert "BroadcastHashJoin" in plan
    import re
    # no shuffle anywhere in this subtree (broadcast is the only exchange)
    assert not re.search(r"Exchange (hash|range)partitioning", plan)
