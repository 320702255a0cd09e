"""End-to-end crawl parity: the Spark engine vs the pinned pure-Python
reference simulator over the same deterministic corpus (SURVEY.md §7.0/M7)."""

import pytest
from pyspark.sql import functions as F

from firmwarescraper_spark.plans.crawl import CrawlEngine
from firmwarescraper_spark.plans.simulator import simulate
from firmwarescraper_spark.sources import generate as G

N_AVM, N_LINKSYS = 3, 5


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, spark):
    out = str(tmp_path_factory.mktemp("corpus") / "pages")
    G.write_corpus(spark, out, n_avm=N_AVM, n_linksys=N_LINKSYS, partitions=4)
    return out


@pytest.fixture(scope="module")
def sim_result():
    return simulate(G.corpus_dict(N_AVM, N_LINKSYS), G.seeds())


@pytest.fixture(scope="module")
def engine_state(tmp_path_factory, spark, corpus):
    state = str(tmp_path_factory.mktemp("state"))
    eng = CrawlEngine(spark, corpus, state, tokens_per_host=10_000, salt_buckets=4)
    summary = eng.run(G.seeds(), fresh=True)
    return eng, summary


def _item_key(d):
    return (
        d["vendor"][0], d["device_name"][0], d["firmware_version"][0],
        d["device_class"][0], d["release_date"][0], tuple(d["file_urls"]),
    )


def test_seen_set_parity(engine_state, sim_result):
    eng, _ = engine_state
    engine_seen = {r["fetch_key"] for r in eng.seen().collect()}
    assert engine_seen == sim_result.seen


def test_items_parity(engine_state, sim_result):
    eng, _ = engine_state
    engine_items = [
        _item_key(r.asDict()) for r in eng.items().drop("round").collect()
    ]
    sim_items = [_item_key(d) for d in sim_result.items]
    assert sorted(engine_items) == sorted(sim_items)
    assert len(engine_items) == len(sim_items)  # multiset equality incl. dups


def test_expected_item_counts(engine_state):
    # per corpus construction: each AVM device yields 2 items (deutschland +
    # other), each Linksys product 2 (duplicate deduped, .exe filtered)
    eng, _ = engine_state
    items = eng.items()
    avm = items.filter(F.col("vendor")[0] == "AVM").count()
    lk = items.filter(F.col("vendor")[0] == "Linksys").count()
    assert avm == N_AVM * 3 * 2
    assert lk == N_LINKSYS * 2


def test_golden_avm_item(engine_state, spark):
    # the golden row shape of test_avm.py:111-118 (scaled device ids)
    eng, _ = engine_state
    row = (
        eng.items()
        .filter(F.col("device_name")[0] == "fritzbox-7000")
        .filter(F.col("file_urls")[0].contains("deutschland"))
        .first()
    )
    assert row["vendor"] == ["AVM"]
    assert row["device_class"] == ["Router"]
    assert row["firmware_version"] == ["100.07.01"]
    assert row["release_date"] == ["01-01-2015"]


def test_crawl_order_parity(engine_state, sim_result):
    """Engine BFS rounds reconstruct the pinned DFS order via ORDER BY seq
    over the seen table's insertion keys — compare against the simulator's
    visit order."""
    eng, _ = engine_state
    # seq is carried on frontier rows; seen keeps canon_url per round.
    # Reconstruct order from the union of all frontier snapshots' dequeued
    # rows: seen ∪ frontier history. Simplest faithful source: items of
    # frontier snapshots are not retained, so use seen + simulator canon
    # mapping: engine order = ORDER BY seq of the frontier rows that were
    # dequeued; we re-derive it by re-reading all frontier snapshots.
    import os

    base = os.path.join(eng.state_dir, "frontier")
    dfs = [
        eng.spark.read.parquet(os.path.join(base, d))
        for d in sorted(os.listdir(base))
    ]
    all_rows = dfs[0]
    for d in dfs[1:]:
        all_rows = all_rows.unionByName(d)
    engine_order = [
        r["fetch_key"]
        for r in all_rows.select("fetch_key", "seq").dropDuplicates(["fetch_key"])
        .orderBy("seq").collect()
        if r["fetch_key"] in sim_result.seen
    ]
    sim_order = [canon for (_, _, canon, _, _) in sim_result.order]
    assert engine_order == sim_order


def test_resume_reproduces_state(spark, corpus, sim_result, tmp_path_factory):
    """T4: run 2 rounds, 'kill', resume — final state identical to the
    one-shot run."""
    state = str(tmp_path_factory.mktemp("state_resume"))
    eng = CrawlEngine(spark, corpus, state, tokens_per_host=10_000, salt_buckets=4)
    eng._write_frontier(eng.seed_frontier(G.seeds()), 0)
    eng.run_round(0)
    eng.run_round(1)
    # resume: a fresh engine object picks up from the latest snapshot
    eng2 = CrawlEngine(spark, corpus, state, tokens_per_host=10_000, salt_buckets=4)
    summary = eng2.run()
    engine_seen = {r["fetch_key"] for r in eng2.seen().collect()}
    assert engine_seen == sim_result.seen
    assert summary["items"] == len(sim_result.items)


def test_politeness_budget_defers(spark, corpus, tmp_path_factory):
    """A tight per-host budget must defer, not drop: the crawl takes more
    rounds but converges to the same seen set."""
    state = str(tmp_path_factory.mktemp("state_tight"))
    eng = CrawlEngine(spark, corpus, state, tokens_per_host=5, salt_buckets=4)
    summary = eng.run(G.seeds(), fresh=True)
    sim = simulate(G.corpus_dict(N_AVM, N_LINKSYS), G.seeds())
    assert summary["seen"] == len(sim.seen)
    assert summary["rounds"] > 4  # budget forced extra rounds


def test_text_invariant(spark, corpus):
    """input_hint invariant: engine-side text extraction reproduces the
    corpus text column byte-identically per url."""
    from firmwarescraper_spark.functions.html import extract_text_udf

    pages = spark.read.parquet(corpus)
    mismatches = pages.select(
        "url",
        (extract_text_udf()(F.col("html").cast("string")) == F.col("text")).alias("ok"),
    ).filter(~F.col("ok"))
    assert mismatches.isEmpty()


def test_cli_crawl_and_feed(spark, tmp_path):
    """The reference's user surface (`scrapy crawl avm -o items.json`,
    README.md:37-41) through the CLI: gen-corpus -> crawl avm+linksys
    -> feed written, state resumable, spider name validation."""
    import json

    import pytest as pt

    from firmwarescraper_spark.__main__ import main, spider_seeds

    corpus = str(tmp_path / "pages")
    out = main(["gen-corpus", "--out", corpus, "--avm", "2",
                "--linksys", "2", "--vendor-scale", "0"], spark=spark)
    assert out["pages"] > 0
    state = str(tmp_path / "state")
    feed = str(tmp_path / "feed")
    res = main(["crawl", "avm", "linksys", "--pages", corpus,
                "--state", state, "-o", feed, "--fresh"], spark=spark)
    assert res["items"] > 0 and res["feed_items"] == res["items"]
    fed = spark.read.json(feed)
    assert fed.count() == res["items"]
    assert "files" in fed.columns
    # resume on completed state: no new rounds, same counts
    res2 = main(["crawl", "avm", "linksys", "--pages", corpus,
                 "--state", state], spark=spark)
    assert res2["items"] == res["items"]
    # all == the full 10-spider seed list; bad names rejected
    assert len(spider_seeds(["all"])) > len(spider_seeds(["avm"]))
    with pt.raises(SystemExit):
        spider_seeds(["nope"])
