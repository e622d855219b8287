"""DRAM-bandwidth microbenchmark — evidence for the 8→32 scaling ceiling.

BASELINE.md attributes the engine's sub-linear 8→32 CPU scaling to the
machine's single shared memory bus (the conv GEMM with inner dim 60 is
bandwidth-bound). This script measures that ceiling with a pure
STREAM-triad-style kernel (no engine code at all): P concurrent Ray tasks
each stream ``a + 0.5 * b -> c`` over ~48 MB arrays; aggregate bytes moved
per wall-second is the machine's effective bandwidth at that concurrency.

If aggregate GB/s plateaus well before 32 workers, the ceiling is
machine-imposed: ANY engine's memory-bound kernel stops scaling there, and
the 2→8 pair is the honest proxy for N→4N nodes (each real node brings its
own memory bus).

Usage: python membench.py  → one JSON line
       {"workers": {"2": GBs, "8": GBs, "16": GBs, "24": GBs, "32": GBs}}
"""

from __future__ import annotations

import json
import time

# per-task array length: 3 arrays × 8 B × N = ~144 MB working set/task —
# far beyond L3 slice per worker, so traffic is DRAM, not cache
N = 6_000_000
ITERS = 40


def main():
    import numpy as np
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)

    @ray.remote(num_cpus=1)
    def triad(iters: int) -> float:
        a = np.full(N, 1.0)
        b = np.full(N, 2.0)
        c = np.empty_like(a)
        # warm / first-touch all three arrays
        np.add(a, b, out=c)
        t0 = time.perf_counter()
        for _ in range(iters):
            np.multiply(b, 0.5, out=c)
            np.add(c, a, out=c)
        dt = time.perf_counter() - t0
        # per iteration: read a, read b, write c (+ the intermediate pass
        # reads/writes c) ≈ 5 arrays of traffic
        return 5 * 8 * N * iters / dt

    # pre-spawn the whole worker pool so no measured round pays process
    # startup, imports, or allocator warmup
    ray.get([triad.remote(2) for _ in range(32)])

    results = {}
    for p in (2, 8, 16, 24, 32):
        # two rounds, keep the second: in-task timings while all P run
        # concurrently; aggregate = sum of per-task streaming rates
        for _ in range(2):
            per_task = ray.get([triad.remote(ITERS) for _ in range(p)])
        results[str(p)] = round(sum(per_task) / 1e9, 1)
    ray.shutdown()
    print(json.dumps({"metric": "dram_triad_bandwidth",
                      "unit": "GB/s_aggregate", "workers": results,
                      "array_mb": round(8 * N / 1e6, 1), "iters": ITERS}))


if __name__ == "__main__":
    main()
