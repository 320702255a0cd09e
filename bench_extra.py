"""Per-query isolation harness (guide §1.4) — NOT the driver bench.

Times each __spark_entry__ query with the noop sink on a shared session
(same shape as bench.py's query loop: local[$SPARK_GRAFT_CPUS], shuffle
partitions max(CPUS,16), SF from $SPARK_GRAFT_SF_DIR), optionally dumping
.explain("formatted") per query to plans/r06/.

Usage:
  python bench_extra.py [--reps N] [--explain DIR_SUFFIX] [query ...]
  (no query args = all 99)

Prints one JSON line {"queries": {name: best_sec}, "reps": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    reps = 1
    explain_dir = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--explain":
            explain_dir = os.path.join(REPO, "plans", "r06")
            suffix = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    import __spark_entry__ as E
    from firmwarescraper_spark.session import get_spark

    spark = get_spark(app_name="fw-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 16))
    spark.sparkContext.setLogLevel("FATAL")

    qs = E.queries()
    if names:
        qs = {n: qs[n] for n in names}
    times = {}
    for name, q in qs.items():
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = q(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = q(spark, SF_DIR)
            with open(os.path.join(explain_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(f"{name:28s} {times[name]:8.3f}", file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps({"queries": times, "reps": reps, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
