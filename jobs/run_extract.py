#!/usr/bin/env python
"""spark-submit entrypoint for the extraction job.

Cluster launch (the north-rule form; N and 4N executors change only
the --num-executors line, the job re-plans via AQE):

    zip -r ocr_translation_spark.zip ocr_translation_spark
    spark-submit \\
      --py-files ocr_translation_spark.zip \\
      --num-executors 100 --executor-cores 4 --executor-memory 8g \\
      jobs/run_extract.py \\
      --input  s3://corpus/documents --media s3://corpus/media \\
      --output s3://corpus/extracted --state s3://corpus/state \\
      --buckets 1024

Local smoke:

    spark-submit --master 'local[8]' --py-files ocr_translation_spark.zip \\
      jobs/run_extract.py --input ... --media ... --output /tmp/out \\
      --state /tmp/state --buckets 4

Resumable by construction: re-running with the same --state processes
only uncommitted buckets (operators/resume.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--media", default=None, help="media side-table parquet path")
    p.add_argument("--output", required=True)
    p.add_argument("--state", required=True, help="lineage/metrics dir")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--salt-buckets", type=int, default=8)
    p.add_argument("--no-cache", action="store_true")
    p.add_argument(
        "--ocr-cache", default=None,
        help="WRITABLE dir holding the persisted ocr_cache table: read "
        "at start (unreadable/corrupt degrades to recompute, never "
        "aborts), grown crash-safely after every bucket (store-always)",
    )
    p.add_argument(
        "--concurrency", type=int, default=1,
        help="buckets processed concurrently (thread pool; the lineage "
        "append stays each bucket's serialized commit point)",
    )
    p.add_argument(
        "--quarantine", default=None,
        help="path for invalid rows (reason-tagged); omit to fail-open",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from ocr_translation_spark.operators.resume import ResumableRun

    # under spark-submit the session config (master, executors, AQE
    # flags from --conf) comes from the launcher; just attach. Only
    # stop the session if WE created it (embedded callers — tests,
    # notebooks — keep theirs).
    pre_existing = SparkSession.getActiveSession() is not None
    spark = SparkSession.builder.appName("ocr-translation-extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(args.input)
    media = spark.read.parquet(args.media) if args.media else None

    n_quarantined = 0
    if args.quarantine:
        from ocr_translation_spark.operators.quarantine import (
            validate_documents,
        )

        docs, bad = validate_documents(docs)
        bad.write.mode("overwrite").parquet(args.quarantine)
        n_quarantined = spark.read.parquet(args.quarantine).count()

    run = ResumableRun(
        spark, args.output, args.state,
        n_buckets=args.buckets, cache_dir=args.ocr_cache,
    )
    processed = run.run(
        docs,
        media,
        max_concurrency=args.concurrency,
        use_cache=not args.no_cache,
        num_partitions=args.partitions,
        salt_buckets=args.salt_buckets,
    )
    lineage = run.read_lineage()
    total = lineage.groupBy().sum("n_docs", "n_spans", "wall_ms").collect()[0]
    print(
        json.dumps(
            {
                "run_id": run.run_id,
                "buckets_processed": processed,
                "total_docs": total[0],
                "total_spans": total[1],
                "total_wall_ms": total[2],
                "quarantined": n_quarantined,
            }
        )
    )
    if not pre_existing:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
