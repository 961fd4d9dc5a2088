#!/usr/bin/env python
"""Dump .explain("formatted") for queries() entries to files.

    python tools/dump_plans.py plans/r06 _before kcore_decomposition ...

Writes <outdir>/<query><suffix>.txt for each query named.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as E  # noqa: E402
from ocr_translation_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        app_name="dump_plans",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )
    queries = E.queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(path)
    spark.stop()


if __name__ == "__main__":
    main()
