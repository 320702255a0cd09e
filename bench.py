"""Benchmark harness.

Measures (1) the headline crawl metric from BASELINE.json — frontier-
dequeue -> fetch -> extract throughput in URLs/s — at two parallelism
levels (local[N] vs local[4N]) on the same corpus, reporting the scaling
efficiency; and (2) per-query wall time for every __spark_entry__ query at
$SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ...,
   "crawl": {"urls_per_sec_nXX": ..., "scaling_efficiency": ...}}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_AVM/LINKSYS corpus scale,
SPARK_GRAFT_SKIP_SCALING=1 to skip the second (N-core) crawl run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_AVM = int(os.environ.get("SPARK_GRAFT_BENCH_AVM", "1600"))
N_LINKSYS = int(os.environ.get("SPARK_GRAFT_BENCH_LINKSYS", "400"))
# many-host frontier shape: mirrors spread the backlog across hosts while
# download.avm.de stays the hot host (skew-handling still exercised)
N_MIRRORS = int(os.environ.get("SPARK_GRAFT_BENCH_MIRRORS", "72"))
N_AVM_MIRROR = int(os.environ.get("SPARK_GRAFT_BENCH_AVM_MIRROR", "24"))
N_PAD = int(os.environ.get("SPARK_GRAFT_BENCH_PAD", "360"))


def _make_spark(cores: int, shuffle_partitions: int):
    from firmwarescraper_spark.session import get_spark

    return get_spark(
        app_name=f"fw-bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle_partitions,
    )


def bench_crawl(cores: int, corpus_path: str, workdir: str) -> dict:
    """One full crawl to fixpoint; returns urls/s. shuffle_partitions and
    salt_buckets are held CONSTANT across parallelism levels so the two
    scaling runs execute the identical physical plan shape."""
    from firmwarescraper_spark.plans.crawl import CrawlEngine
    from firmwarescraper_spark.sources import generate as G

    spark = _make_spark(cores, 16)
    try:
        state = os.path.join(workdir, f"state_{cores}")
        eng = CrawlEngine(
            spark, corpus_path, state,
            tokens_per_host=1_000_000, salt_buckets=8,
            round_seconds=14400.0,  # politeness budget: one round models 4h of crawl-delay tokens
        )
        t0 = time.monotonic()
        summary = eng.run(G.seeds(n_mirrors=N_MIRRORS), fresh=True)
        dt = time.monotonic() - t0
        return {
            "cores": cores,
            "seconds": round(dt, 2),
            "urls": summary["seen"],
            "items": summary["items"],
            "rounds": summary["rounds"],
            "urls_per_sec": round(summary["seen"] / dt, 2),
        }
    finally:
        spark.stop()


def bench_queries(spark) -> dict:
    import __spark_entry__ as E

    times = {}
    for name, q in E.queries().items():
        t0 = time.monotonic()
        df = q(spark, SF_DIR)
        # noop sink: full computation, no driver-side collect
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.monotonic() - t0, 3)
    return times


def main():
    from firmwarescraper_spark.sources import generate as G

    workdir = tempfile.mkdtemp(prefix="fw_bench_")
    total_t0 = time.monotonic()
    try:
        # -- corpus (generated once, reused by both crawl runs) -------------
        spark = _make_spark(CPUS, max(CPUS, 16))
        corpus_path = os.path.join(workdir, "pages")
        n_pages = G.write_corpus(
            spark, corpus_path, n_avm=N_AVM, n_linksys=N_LINKSYS,
            partitions=CPUS, n_mirrors=N_MIRRORS, n_avm_mirror=N_AVM_MIRROR,
            n_pad=N_PAD,
        )
        # -- query benches at SF_DIR -----------------------------------------
        qtimes = bench_queries(spark)
        spark.stop()

        # -- crawl throughput: headline at CPUS, scaling pair at N / 4N ------
        # The scaling pair is pinned to (2, 8) cores: a raw multiprocessing
        # probe of this container shows ~10-12 effective cores (32 logical),
        # so only pairs inside that envelope can evidence engine scaling
        # rather than hardware saturation — see BENCH/BASELINE.md.
        crawl_hi = bench_crawl(CPUS, corpus_path, workdir)
        crawl = {
            "corpus_pages": n_pages,
            f"run_n{CPUS}": crawl_hi,
        }
        if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
            n_lo, n_hi = 2, 8
            lo = crawl_hi if CPUS == n_lo else bench_crawl(n_lo, corpus_path, workdir)
            hi = crawl_hi if CPUS == n_hi else bench_crawl(n_hi, corpus_path, workdir)
            crawl[f"run_n{n_lo}"] = lo
            crawl[f"run_n{n_hi}"] = hi
            speedup = hi["urls_per_sec"] / lo["urls_per_sec"]
            crawl["scaling_pair"] = [n_lo, n_hi]
            crawl["scaling_efficiency"] = round(speedup / (n_hi / n_lo), 3)

        total = round(time.monotonic() - total_t0, 2)
        out = {
            "metric": "frontier-dequeue->fetch->extract crawl + query suite",
            "value": total,
            "unit": "sec",
            "queries": qtimes,
            "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
            "crawl": crawl,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
