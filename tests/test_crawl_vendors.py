"""All-vendor end-to-end parity: engine vs simulator over the full
7-vendor + FTP corpus (TP-Link retail/GPL, Netgear GPL, Linksys GPL,
ASUS, HP, D-Link GPL with POST pagination, D-Link FTP walker)."""

import pytest
from pyspark.sql import functions as F

from firmwarescraper_spark.plans.crawl import CrawlEngine
from firmwarescraper_spark.plans.simulator import simulate
from firmwarescraper_spark.sources import generate as G
from firmwarescraper_spark.sources import vendors as VN

SCALE = 1


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, spark):
    out = str(tmp_path_factory.mktemp("vcorpus") / "pages")
    G.write_corpus(spark, out, n_avm=2, n_linksys=2, partitions=4,
                   vendor_scale=SCALE)
    return out


@pytest.fixture(scope="module")
def sim_result():
    return simulate(
        G.corpus_dict(2, 2, vendor_scale=SCALE),
        G.seeds(include_vendors=True),
    )


@pytest.fixture(scope="module")
def engine_state(tmp_path_factory, spark, corpus):
    state = str(tmp_path_factory.mktemp("vstate"))
    eng = CrawlEngine(spark, corpus, state, tokens_per_host=10_000, salt_buckets=4)
    summary = eng.run(G.seeds(include_vendors=True), fresh=True)
    return eng, summary


def _item_key(d):
    return (
        tuple(d["vendor"]), tuple(d["device_name"]), tuple(d["firmware_version"]),
        tuple(d["device_class"]), tuple(d["release_date"]), tuple(d["file_urls"]),
    )


def test_seen_set_parity_all_vendors(engine_state, sim_result):
    eng, _ = engine_state
    engine_seen = {r["fetch_key"] for r in eng.seen().collect()}
    missing = sim_result.seen - engine_seen
    extra = engine_seen - sim_result.seen
    assert not missing and not extra, (
        f"missing={sorted(missing)[:5]} extra={sorted(extra)[:5]}"
    )


def test_items_parity_all_vendors(engine_state, sim_result):
    eng, _ = engine_state
    engine_items = sorted(
        _item_key(r.asDict()) for r in eng.items().drop("round").collect()
    )
    sim_items = sorted(_item_key(d) for d in sim_result.items)
    only_engine = [i for i in engine_items if i not in sim_items]
    only_sim = [i for i in sim_items if i not in engine_items]
    assert engine_items == sim_items, (
        f"engine-only={only_engine[:3]} sim-only={only_sim[:3]}"
    )


def test_every_vendor_produced_items(engine_state):
    eng, _ = engine_state
    vendors = {
        r["v"] for r in eng.items().select(F.col("vendor")[0].alias("v")).distinct().collect()
    }
    assert vendors == {"AVM", "Linksys", "TP-Link", "Netgear", "asus", "HP", "D-Link"}


def test_post_pagination_fetched(engine_state):
    """W4/S2: the second D-Link list page is reachable only via a POST with
    form data — its fetch_key must be in the seen set."""
    eng, _ = engine_state
    post_rows = eng.seen().filter(F.col("fetch_key").contains("|form|")).count()
    assert post_rows > 0


def test_ftp_items_shape(engine_state):
    eng, _ = engine_state
    ftp = eng.items().filter(
        F.col("file_urls")[0].startswith("ftp://")
    )
    rows = ftp.collect()
    assert rows, "FTP walker produced no items"
    for r in rows:
        assert r["release_date"][0].endswith(".0")  # epoch float repr
        assert "_fw_" in r["file_urls"][0]


def test_crawl_order_parity_all_vendors(engine_state, sim_result):
    import os

    eng, _ = engine_state
    base = os.path.join(eng.state_dir, "frontier")
    dfs = [eng.spark.read.parquet(os.path.join(base, d)) for d in sorted(os.listdir(base))]
    all_rows = dfs[0]
    for d in dfs[1:]:
        all_rows = all_rows.unionByName(d)
    engine_order = [
        r["fetch_key"]
        for r in all_rows.select("fetch_key", "seq").dropDuplicates(["fetch_key"])
        .orderBy("seq").collect()
        if r["fetch_key"] in sim_result.seen
    ]
    sim_order = [k for (_, _, k, _, _) in sim_result.order]
    assert engine_order == sim_order
