#!/usr/bin/env python
"""Honest runtime plan stats for a queries() entry.

Textual `executedPlan` exchange counts overcount badly: every
InMemoryRelation occurrence re-prints its full cached child plan
(raw `Exchange` nodes that do NOT run in this query — the cache was
built once, earlier), and AQE reuse prints the same stage under every
reference. What actually runs in a warm execution is the set of
DISTINCT adaptive query stages, so this tool forces the query
end-to-end and reports:

* warm_shuffles    — distinct `ShuffleQueryStage N` ids
* warm_broadcasts  — distinct `BroadcastQueryStage N` ids
* cached_prints    — InMemoryTableScan occurrences (reads, not builds)
* textual_exchange — the raw `Exchange` substring count (the number
                     PLANS.md used through round 4, kept for
                     comparability)
* cartesian / python crossings — structural red flags (should be 0
                     for every near-dup path)

    python tools/plan_stats.py simhash_near_dup minhash_near_dup
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/plan_stats.py ...
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as E  # noqa: E402
from ocr_translation_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def stats_for(df) -> dict:
    # collect() executes THIS DataFrame's QueryExecution (a .write would
    # plan a fresh one, leaving df's own plan un-finalized under AQE)
    n_rows = len(df.collect())
    s = df._jdf.queryExecution().executedPlan().toString()
    return {
        "rows": n_rows,
        "warm_shuffles": len(set(re.findall(r"ShuffleQueryStage (\d+)", s))),
        "warm_broadcasts": len(
            set(re.findall(r"BroadcastQueryStage (\d+)", s))
        ),
        "cached_prints": s.count("InMemoryTableScan"),
        "textual_exchange": s.count("Exchange"),
        "cartesian": s.count("CartesianProduct") + s.count("BroadcastNestedLoop"),
        "python_crossings": sum(
            s.count(m)
            for m in (
                "ArrowEvalPython",
                "BatchEvalPython",
                "MapInPandas",
                "FlatMapGroupsInPandas",
            )
        ),
    }


def main() -> None:
    names = sys.argv[1:]
    queries = E.queries()
    if not names:
        names = list(queries)
    spark = get_spark(
        "plan_stats", master="local[8]", shuffle_partitions=8
    )
    out = {}
    for name in names:
        out[name] = stats_for(queries[name](spark, SF_DIR))
        print(name, json.dumps(out[name]), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
