#!/usr/bin/env python
"""Driver-grade correctness mirror at ANY scale factor: runs every
queries() entry against its oracle_sql() twin through DuckDB and
compares schema + row count + exact values (order-insensitive).

    python tools/check_oracles.py [query ...]          # sf0.01
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python tools/check_oracles.py

Exit 0 iff every compared query matches.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from ocr_translation_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or sorted(E.oracle_sql())
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    qs, oracles = E.queries(), E.oracle_sql()
    ok = True
    for n in names:
        sdf = qs[n](spark, sf).toPandas()
        odf = con.execute(oracles[n]).fetchdf()
        cols = sorted(sdf.columns)
        if cols != sorted(odf.columns):
            print(f"{n}: SCHEMA MISMATCH {cols} vs {sorted(odf.columns)}")
            ok = False
            continue
        # normalize datetime resolutions first: Spark fetches ns,
        # DuckDB us, and pandas' assert_frame_equal treats NaT != NaT
        # ACROSS resolutions (probed) — equal nullable-timestamp
        # columns would false-mismatch
        for df_ in (sdf, odf):
            for c in df_.columns:
                if str(df_[c].dtype).startswith("datetime64"):
                    df_[c] = df_[c].astype("datetime64[us]")
        a = sdf[cols].sort_values(cols).reset_index(drop=True)
        b = odf[cols].sort_values(cols).reset_index(drop=True)
        if len(a) != len(b):
            print(f"{n}: ROWS {len(a)} vs {len(b)}")
            ok = False
            continue
        try:
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, check_exact=True
            )
            print(f"{n}: OK ({len(a)} rows)")
        except AssertionError as ex:
            print(f"{n}: VALUE MISMATCH: {str(ex)[:300]}")
            ok = False
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
