"""Crawl-loop corpus-scaling datapoint (r4 verdict #5).

Every crawl bench number so far used the ~102k-page corpus; the query
suite has its own N->4N probe (scale_probe.py) but the crawl loop itself
had no datapoint showing URLs/s per page stays flat as the corpus grows.
This probe runs the SAME two crawl jobs bench.py times — the multi-round
fixpoint and the single steady-state round — at local[4] on the 1x
(~102k pages) and 4x (~408k pages) corpora and reports URLs/s at both.

Expectation: flat-or-better URLs/s per page at 4x. The fixpoint should
IMPROVE per page (its fixed per-round serial floor — driver plan
analysis, robots parse, job scheduling — amortizes over 4x the parse
work); the steady round should hold roughly flat (it is one giant round
already, floor-free by construction).

Scaling knobs: page volume scales via families-per-vendor and pad pages
(hosts and mirror structure held constant, so the politeness/dequeue
shape is identical and only per-host volume grows — the "same web, more
pages" model).

Run:  python BENCH/corpus_scale_probe.py
Output: one JSON line {"x1": {...}, "x4": {...}, "ratio_*": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B  # noqa: E402  (reuses _make_spark/bench_crawl/bench_steady_round)


def main():
    workdir = tempfile.mkdtemp(prefix="fw_corpus_scale_")
    out = {}
    try:
        from firmwarescraper_spark.sources import generate as G

        for label, scale in (("x1", 1), ("x4", 4)):
            spark = B._make_spark(B.CPUS, max(B.CPUS, 16))
            corpus = os.path.join(workdir, f"pages_{label}")
            n_pages = G.write_corpus(
                spark, corpus,
                n_avm=B.N_AVM * scale, n_linksys=B.N_LINKSYS * scale,
                partitions=B.CPUS, n_mirrors=B.N_MIRRORS,
                n_avm_mirror=B.N_AVM_MIRROR * scale,
                n_pad=B.N_PAD * scale,
            )
            spark.stop()
            fix = B.bench_crawl(4, corpus, workdir)
            steady = B.bench_steady_round(4, corpus, workdir)
            out[label] = {
                "pages": n_pages,
                "fixpoint_urls_per_sec": fix["urls_per_sec"],
                "fixpoint_sec": fix["seconds"],
                "fixpoint_rounds": fix["rounds"],
                "steady_urls_per_sec": steady["urls_per_sec"],
                "steady_sec": steady["seconds"],
            }
            shutil.rmtree(corpus, ignore_errors=True)
        out["pages_ratio"] = round(out["x4"]["pages"] / out["x1"]["pages"], 2)
        # >= 1.0 means per-page throughput held or improved at 4x volume
        out["fixpoint_throughput_ratio"] = round(
            out["x4"]["fixpoint_urls_per_sec"]
            / out["x1"]["fixpoint_urls_per_sec"], 2)
        out["steady_throughput_ratio"] = round(
            out["x4"]["steady_urls_per_sec"]
            / out["x1"]["steady_urls_per_sec"], 2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
