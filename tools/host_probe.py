#!/usr/bin/env python
"""Host CPU reference probe: prints one JSON line with single-thread
and 32-way-concurrent times for a fixed pure-Python loop.

Purpose: bench numbers on this host drift at hour scale (documented
in BENCH/BASELINE.md); this probe gives an ENGINE-FREE reference
point so a future reader can attribute a bench delta to host state
vs code change. Committed observations:

  2026-08-20 (nineteenth session): single-thread 2.3-3.2 s while the
  32-process concurrent median for the IDENTICAL loop was 1.8 s —
  lone threads run ~1.5x slower than loaded cores (frequency
  governor / co-tenant behavior; /proc/cpuinfo pinned 2100 MHz).
  Under that regime driver-sequential phases inflate while
  wide-parallel stages stay nominal, which inflated the
  warm wall-times of driver-heavy queries (extract_flagship 1.9 ->
  3.4 s, extract_synthetic 3.7 -> 5.6 s) while pure-agg queries held
  (tpch_pricing_summary 0.50 s, dedup_clusters 0.22 s, both at or
  below their round-4 values) on the SAME code (extraction-path diff
  since round 4: one warning-suppression flag).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

N = 20_000_000


def _spin(_=None) -> float:
    t0 = time.monotonic()
    x = 0
    for i in range(N):
        x += i * i
    return time.monotonic() - t0


def main() -> None:
    single = [round(_spin(), 3) for _ in range(3)]
    with mp.Pool(32) as p:
        conc = sorted(p.map(_spin, range(32)))
    print(
        json.dumps(
            {
                "single_thread_s": single,
                "concurrent32_median_s": round(conc[16], 3),
                "concurrent32_max_s": round(conc[-1], 3),
                "loop_iters": N,
            }
        )
    )


if __name__ == "__main__":
    main()
