#!/usr/bin/env python
"""Scaling-efficiency evidence: the same job at N and 4N parallelism.

Sandbox substitute for the north rule's two-cluster-size criterion
(no real cluster available): run bench.py in separate processes at
local[N] and local[4N] on identical input, report throughput at both
plus efficiency = (throughput_4N / throughput_N) / 4.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
SYN_DOCS = os.environ.get("SPARK_GRAFT_SYN_DOCS", "20000")


def run_bench(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SYN_DOCS"] = SYN_DOCS
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    small = run_bench(N)
    large = run_bench(4 * N)
    thr_n = small["docs_per_sec"]
    thr_4n = large["docs_per_sec"]
    eff = round((thr_4n / thr_n) / 4, 3)
    span_eff = round((large["spans_per_sec"] / small["spans_per_sec"]) / 4, 3)
    result = {
        "metric": "scaling_efficiency",
        "value": eff,
        "unit": "ratio",
        "n_cores": N,
        "throughput_docs_per_sec_N": thr_n,
        "throughput_docs_per_sec_4N": thr_4n,
        "spans_per_sec_N": small["spans_per_sec"],
        "spans_per_sec_4N": large["spans_per_sec"],
        "span_scaling_efficiency": span_eff,
        "synthetic_docs": small["synthetic_docs"],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH — scaling-efficiency evidence

Two-parallelism substitute for the north rule's two-cluster-size
criterion (same job, same input, local[{N}] vs local[{4 * N}]):

| parallelism | docs/sec | spans/sec | extract wall (s) |
|---|---|---|---|
| local[{N}] (N) | {thr_n} | {small['spans_per_sec']} | {small['queries']['extract_synthetic']} |
| local[{4 * N}] (4N) | {thr_4n} | {large['spans_per_sec']} | {large['queries']['extract_synthetic']} |

**Scaling efficiency (docs/sec): {eff}** — spans/sec: {span_eff}
(target >= 0.8). Corpus: {small['synthetic_docs']} synthetic interleaved
docs ({small['synthetic_spans']} spans), stages A+B+C incl. OCR.

Full per-query timings (local[{4 * N}]):

```json
{json.dumps(large, indent=2)}
```
"""
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
