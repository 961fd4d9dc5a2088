#!/usr/bin/env python
"""Scaling-efficiency evidence: the same job at N and 4N parallelism.

Sandbox substitute for the north rule's two-cluster-size criterion
(no real cluster available): run the extraction job at local[N] and
local[4N] on identical input, report throughput at both plus
efficiency = (throughput_4N / throughput_N) / 4.

Method notes (this environment is noisy — see BENCH/BASELINE.md):
* one subprocess per parallelism level (a JVM cannot change master);
* per level: 1 cold run (JIT/codegen warmup, discarded) + R timed
  runs, BEST warm taken — run-to-run variance on this host reaches
  3x under high thread counts (kernel-time spikes), and steady-state
  throughput is the metric;
* extraction job only (the relational queries have their own absolute
  timings in bench.py's output).

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
SYN_DOCS = int(os.environ.get("SPARK_GRAFT_SYN_DOCS", "60000"))
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))

PROBE = r"""
import json, sys, time

sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from ocr_translation_spark.pipeline import extract
from ocr_translation_spark.session import get_spark

cpus, base, reps = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
# shuffle through tmpfs: on a real cluster aggregate shuffle bandwidth
# scales with node count; a single shared spinning /tmp serializes the
# 4N leg and corrupts the comparison (documented in BENCH/BASELINE.md)
import os
os.makedirs("/dev/shm/spark-local", exist_ok=True)
spark = get_spark(
    "scale",
    master=f"local[{{cpus}}]",
    shuffle_partitions=max(cpus, 8),
    extra_conf={{"spark.local.dir": "/dev/shm/spark-local"}},
)
docs = spark.read.parquet(f"{{base}}/documents.parquet")
media = spark.read.parquet(f"{{base}}/media.parquet")
n_docs = docs.count()
n_spans = docs.agg(F.sum(F.size("spans"))).collect()[0][0]


def force(df):
    df.write.format("noop").mode("overwrite").save()


runs = []
for i in range(reps + 1):  # +1 cold run, discarded
    t0 = time.monotonic()
    # DEFAULT arguments: the per-doc resolved map is never broadcast
    # anymore (pipeline.py), so the serial driver-side broadcast build
    # that used to pollute this comparison is gone from the default plan
    force(extract(spark, docs, media).result)
    runs.append(round(time.monotonic() - t0, 2))
print(json.dumps({{"cpus": cpus, "runs": runs, "best_warm": min(runs[1:]),
                  "n_docs": n_docs, "n_spans": int(n_spans)}}))
spark.stop()
"""


def run_level(cpus: int, base: str) -> dict:
    script = PROBE.format(repo=REPO)
    # Pin the WHOLE process tree (JVM GC/netty threads + Python workers
    # included) to exactly `cpus` CPUs — otherwise local[N]'s auxiliary
    # threads spill onto all cores and "N" understates the resources,
    # corrupting the N-vs-4N comparison.
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", script,
           str(cpus), base, str(REPS)]
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True,
        env={**os.environ, "SPARK_DRIVER_MEM": os.environ.get("SPARK_DRIVER_MEM", "48g")},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sys.path.insert(0, REPO)

    base = os.path.join("/tmp", f"ocr_xlate_bench_{SYN_DOCS}")
    if not os.path.exists(os.path.join(base, "documents.parquet")):
        if SYN_DOCS > 100_000:
            # big corpora generate in parallel through Spark — in a
            # SUBPROCESS so the gateway JVM dies with it (spark.stop()
            # leaves the JVM attached to this process otherwise, and it
            # pollutes the timed legs)
            gen_script = (
                f"import sys; sys.path.insert(0, {REPO!r})\n"
                "from ocr_translation_spark.datagen import write_fixture_parquet_spark\n"
                "from ocr_translation_spark.session import get_spark\n"
                "spark = get_spark('gen', master='local[*]')\n"
                f"write_fixture_parquet_spark(spark, {base!r}, n_docs={SYN_DOCS})\n"
                "spark.stop()\n"
            )
            subprocess.run([sys.executable, "-c", gen_script], check=True)
        else:
            from ocr_translation_spark.datagen import write_fixture_parquet

            write_fixture_parquet(base, n_docs=SYN_DOCS)

    small = run_level(N, base)
    large = run_level(4 * N, base)
    thr_n = round(small["n_docs"] / small["best_warm"], 1)
    thr_4n = round(large["n_docs"] / large["best_warm"], 1)
    sp_n = round(small["n_spans"] / small["best_warm"], 1)
    sp_4n = round(large["n_spans"] / large["best_warm"], 1)
    eff = round((thr_4n / thr_n) / 4, 3)
    result = {
        "metric": "scaling_efficiency",
        "value": eff,
        "unit": "ratio",
        "n_cores": N,
        "throughput_docs_per_sec_N": thr_n,
        "throughput_docs_per_sec_4N": thr_4n,
        "spans_per_sec_N": sp_n,
        "spans_per_sec_4N": sp_4n,
        "runs_N": small["runs"],
        "runs_4N": large["runs"],
        "synthetic_docs": small["n_docs"],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH — scaling-efficiency evidence

Two-parallelism substitute for the north rule's two-cluster-size
criterion (same extraction job, same input, local[{N}] vs
local[{4 * N}]; 1 discarded cold run + best of {REPS} warm runs per
level — this host shows up to 3x run-to-run noise at high thread
counts, raw runs below):

| parallelism | docs/sec | spans/sec | best warm wall (s) | raw runs (s, first=cold) |
|---|---|---|---|---|
| local[{N}] (N) | {thr_n} | {sp_n} | {small['best_warm']} | {small['runs']} |
| local[{4 * N}] (4N) | {thr_4n} | {sp_4n} | {large['best_warm']} | {large['runs']} |

**Scaling efficiency (docs/sec): {eff}** (target >= 0.8).
Corpus: {small['n_docs']} synthetic interleaved docs
({small['n_spans']} spans, ~3.4 media refs/doc, media-heavy skew docs
included), stages A+B+C incl. OCR, forced end-to-end via the noop sink.

```json
{json.dumps(result, indent=2)}
```
"""
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
