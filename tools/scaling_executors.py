#!/usr/bin/env python
"""N-vs-4N scaling with REAL executor JVMs (the north rule's literal
form: "N and 4N executors"), complementing bench_scaling.py's
thread-based legs.

Runs the bucketed extraction job under local-cluster[E,4,MEM] with
E=2 (N: 8 cores) and E=8 (4N: 32 cores): separate executor JVMs,
netty shuffle, executor-side Python workers, and the package shipped
to executors via the --py-files zip mechanism. Every executor still
shares this host's ONE local disk and memory bus, so like the
thread legs this UNDERSTATES real-cluster scaling (per-node disks
and NICs scale with node count there).

Method matches bench_scaling.py: one subprocess per leg (a JVM
cannot change master), taskset-pinned to exactly the leg's core
count, 1 discarded cold run + R timed runs, best warm taken.

Env: SPARK_GRAFT_SCALE_DOCS (default 1600000),
SPARK_GRAFT_SCALE_REPS (default 3). Reuses bench_scaling.py's
corpus dir when present. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SYN_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "1600000"))
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
N_BUCKETS = 256
CORES_PER_EXEC = 4
WORKER_MEM_MB = 8192

PROBE = r"""
import json, shutil, sys, tempfile, time

sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from ocr_translation_spark.pipeline import extract
from ocr_translation_spark.session import get_spark
from ocr_translation_spark.datagen import bucketed_documents_ddl

n_exec, base, reps = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = get_spark(
    "scale-exec",
    master=f"local-cluster[{{n_exec}},{cores_per_exec},{worker_mem}]",
    shuffle_partitions=max(n_exec * {cores_per_exec}, 8),
    extra_conf={{"spark.executor.memory": "7g"}},
)
# ship the package exactly as spark-submit --py-files would
# build the zip in a private mkdtemp dir (no mktemp race); executors
# fetch it LAZILY from the driver's file server, which serves the
# ORIGINAL path, so cleanup must wait until after spark.stop()
_zip_dir = tempfile.mkdtemp(prefix="otspark_pkg_")
zip_path = shutil.make_archive(
    _zip_dir + "/pkg", "zip",
    root_dir={repo!r}, base_dir="ocr_translation_spark",
)
spark.sparkContext.addPyFile(zip_path)

spark.sql(bucketed_documents_ddl(
    "documents_bucketed", base + "/documents_bucketed", {n_buckets}))
docs = spark.table("documents_bucketed")
media = spark.read.parquet(f"{{base}}/media.parquet")
n_docs = docs.count()
n_spans = docs.agg(F.sum(F.size("spans"))).collect()[0][0]
jvms = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()

runs = []
for i in range(reps + 1):  # +1 cold run, discarded
    t0 = time.monotonic()
    extract(spark, docs, media, pre_partitioned=True).result \
        .write.format("noop").mode("overwrite").save()
    runs.append(round(time.monotonic() - t0, 2))
print(json.dumps({{"n_exec": n_exec, "jvms": jvms, "runs": runs,
                  "best_warm": min(runs[1:]),
                  "n_docs": n_docs, "n_spans": int(n_spans)}}))
spark.stop()
shutil.rmtree(_zip_dir, ignore_errors=True)
"""


def run_level(n_exec: int) -> dict:
    base = os.path.join("/tmp", f"ocr_xlate_bench_{SYN_DOCS}")
    cores = n_exec * CORES_PER_EXEC
    script = PROBE.format(
        repo=REPO,
        n_buckets=N_BUCKETS,
        cores_per_exec=CORES_PER_EXEC,
        worker_mem=WORKER_MEM_MB,
    )
    cmd = [
        "taskset", "-c", f"0-{cores - 1}", sys.executable, "-c",
        script, str(n_exec), base, str(REPS),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True,
        env={**os.environ, "SPARK_DRIVER_MEM": "24g"},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    base = os.path.join("/tmp", f"ocr_xlate_bench_{SYN_DOCS}")
    if not os.path.exists(os.path.join(base, "documents_bucketed")):
        # same corpus recipe as bench_scaling.py, generated in a
        # subprocess so the gateway JVM dies with it
        gen = "\n".join(
            [
                f"import sys; sys.path.insert(0, {REPO!r})",
                "from ocr_translation_spark.session import get_spark",
                "from ocr_translation_spark.datagen import ("
                "write_fixture_parquet_spark, write_bucketed_documents)",
                "spark = get_spark('gen', master='local[*]')",
                f"write_fixture_parquet_spark(spark, {base!r}, "
                f"n_docs={SYN_DOCS})"
                if not os.path.exists(
                    os.path.join(base, "documents.parquet")
                )
                else "pass",
                f"write_bucketed_documents(spark, {base!r}, "
                f"n_buckets={N_BUCKETS})",
                "spark.stop()",
            ]
        )
        subprocess.run([sys.executable, "-c", gen], check=True)
    small = run_level(2)
    large = run_level(8)
    thr_n = round(small["n_docs"] / small["best_warm"], 1)
    thr_4n = round(large["n_docs"] / large["best_warm"], 1)
    out = {
        "metric": "executor_scaling_efficiency",
        "value": round((thr_4n / thr_n) / 4, 3),
        "unit": "ratio",
        "thr_n_docs_sec": thr_n,
        "thr_4n_docs_sec": thr_4n,
        "sp_n": round(small["n_spans"] / small["best_warm"], 1),
        "sp_4n": round(large["n_spans"] / large["best_warm"], 1),
        "small": small,
        "large": large,
        "form": "local-cluster[2,4] vs local-cluster[8,4] real executor JVMs",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
