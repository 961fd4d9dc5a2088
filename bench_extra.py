#!/usr/bin/env python
"""Per-query profiling harness (guide section 1: measure first).

NOT the driver bench (bench.py is frozen). For each queries() entry
this reports, from one warm execution:

* warm seconds (noop sink, same methodology as bench.py)
* n_jobs — Spark jobs launched by ONE execution (driver-coordinated
  loops and multi-action queries show up as high job counts; a pure
  single-action query with AQE shows one job per materialized query
  stage + 1)
* shuffles / broadcasts — distinct runtime query stages, read off the
  executed plan of a collect() (plan_stats.py convention)

Usage:
    python bench_extra.py                    # all queries, summary
    python bench_extra.py kcore_decomposition containment_join ...
    SPARK_GRAFT_PROFILE_REPEATS=3 python bench_extra.py ...

Prints one JSON line per query and a total line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import __spark_entry__ as E  # noqa: E402
from ocr_translation_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPEATS", "2"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )
    sc = spark.sparkContext
    queries = E.queries()
    names = sys.argv[1:] or list(queries)

    rows = []
    for name in names:
        if name not in queries:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        fn = queries[name]
        sc.setJobDescription(f"profile:{name}")
        try:
            _force(fn(spark, SF_DIR))  # cold (codegen/JIT warm-up)
            warms = []
            for _ in range(REPEATS):
                t0 = time.monotonic()
                _force(fn(spark, SF_DIR))
                warms.append(time.monotonic() - t0)
            warm = min(warms)
            # job count for one execution, via a dedicated job group
            group = f"prof_{name}_{time.monotonic_ns()}"
            sc.setJobGroup(group, name)
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            df.collect()
            collect_s = time.monotonic() - t0
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
            s = df._jdf.queryExecution().executedPlan().toString()
            rec = {
                "q": name,
                "warm": round(warm, 3),
                "collect": round(collect_s, 3),
                "jobs": n_jobs,
                "shuffles": len(
                    set(re.findall(r"ShuffleQueryStage (\d+)", s))
                ),
                "bcasts": len(
                    set(re.findall(r"BroadcastQueryStage (\d+)", s))
                ),
                "py": sum(
                    s.count(m)
                    for m in (
                        "ArrowEvalPython",
                        "BatchEvalPython",
                        "MapInPandas",
                        "MapInArrow",
                        "FlatMapGroupsInPandas",
                    )
                ),
            }
        except Exception as exc:  # keep profiling the rest
            rec = {"q": name, "error": str(exc)[:200]}
        print(json.dumps(rec), flush=True)
        rows.append(rec)
    ok = [r for r in rows if "warm" in r]
    print(
        json.dumps(
            {
                "total_warm": round(sum(r["warm"] for r in ok), 3),
                "n": len(ok),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
