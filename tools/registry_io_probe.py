#!/usr/bin/env python
"""Two-epoch registry I/O measurement (VERDICT r4 item 6).

The streaming near-dup registries are written partitioned by a 256-way
key prefix so each micro-batch reads only the partitions its keys
probe. The mechanism has a file-level pruning test
(tests/test_stream_dedup.py); this probe commits the NUMBERS across
two epochs (history grown 10x):

* pruned probe bytes vs the UNPRUNED full-registry read at both
  epochs — the probed SHARE stays constant at ~probed/256 while the
  unpruned baseline grows with the whole history;
* probe file count before vs after compaction at identical history —
  each appended batch dir contributes files to every probed prefix,
  so file opens grow with the batch count until the catalog's
  auto-compaction (COMPACT_AFTER=32 merges) folds them back to one
  dir per prefix. Compaction is what bounds per-batch file opens; the
  prefix layout is what bounds bytes.

Bytes read = sum of on-disk sizes of the parquet files the pruned scan
actually touches (input_file_name() is evaluated at scan time, AFTER
partition pruning — the same evidence channel as the pruning test).

    python tools/registry_io_probe.py          # prints one JSON line
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
from urllib.parse import unquote, urlparse

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ocr_translation_spark.session import get_spark  # noqa: E402
from ocr_translation_spark.sources.catalog import Catalog  # noqa: E402
from ocr_translation_spark.streaming.neardup_stream import (  # noqa: E402
    SIG_REGISTRY,
    _prefix_part,
)


def _fp(i: int) -> str:
    return hashlib.sha256(f"doc-{i}".encode()).hexdigest()


def _write_epoch(spark, cat, start: int, n: int) -> None:
    rows = [(_fp(i), i, [i % 97, i % 89]) for i in range(start, start + n)]
    df = spark.createDataFrame(
        rows, "fp string, canonical_id long, sig array<int>"
    ).withColumn("p", _prefix_part(F.col("fp")))
    cat.merge_cache(df, SIG_REGISTRY, key="fp", partition_by=("p",))


def _dir_bytes(root: str) -> int:
    total = 0
    for dp, _, fns in os.walk(root):
        for fn in fns:
            total += os.path.getsize(os.path.join(dp, fn))
    return total


def _probe_bytes(spark, reg_dir: str, probe_ps: list[int]) -> tuple[int, int]:
    raw = spark.read.parquet(os.path.join(reg_dir, SIG_REGISTRY))
    files = {
        r[0]
        for r in raw.filter(F.col("p").isin(probe_ps))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    return (
        sum(
            os.path.getsize(unquote(urlparse(f).path))
            for f in files
        ),
        len(files),
    )


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="registry_io_probe_")
    spark = get_spark(
        "registry_io_probe", master="local[8]", shuffle_partitions=8
    )
    try:
        reg = os.path.join(tmp, "reg")
        cat = Catalog(spark, reg)
        # a micro-batch probing 4 of the 256 prefix partitions
        probe_ps = [0, 17, 128, 255]

        _write_epoch(spark, cat, 0, 20_000)
        total1 = _dir_bytes(os.path.join(reg, SIG_REGISTRY))
        read1, files1 = _probe_bytes(spark, reg, probe_ps)

        # epoch 2: 10x the history (9 more merges of the same size)
        for k in range(1, 10):
            _write_epoch(spark, cat, 20_000 * k, 20_000)
        total2 = _dir_bytes(os.path.join(reg, SIG_REGISTRY))
        read2, files2 = _probe_bytes(spark, reg, probe_ps)

        # compaction (auto-fires every COMPACT_AFTER merges in the
        # stream; forced here to measure its effect at this history)
        cat.compact_cache(SIG_REGISTRY, "fp", partition_by=("p",))
        total3 = _dir_bytes(os.path.join(reg, SIG_REGISTRY))
        read3, files3 = _probe_bytes(spark, reg, probe_ps)

        out = {
            "metric": "registry_probe_bytes_two_epochs",
            "probe_partitions": len(probe_ps),
            "epoch1_20k": {
                "registry_bytes": total1,
                "probe_bytes": read1,
                "probe_files": files1,
                "probe_share": round(read1 / total1, 4),
            },
            "epoch2_200k_10batches": {
                "registry_bytes": total2,
                "probe_bytes": read2,
                "probe_files": files2,
                "probe_share": round(read2 / total2, 4),
            },
            "epoch2_compacted": {
                "registry_bytes": total3,
                "probe_bytes": read3,
                "probe_files": files3,
                "probe_share": round(read3 / total3, 4),
            },
            "unpruned_baseline_bytes": total2,
            "pruned_vs_unpruned_epoch2": round(total2 / read2, 1),
            "compaction_file_open_reduction": round(files2 / files3, 1),
        }
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
