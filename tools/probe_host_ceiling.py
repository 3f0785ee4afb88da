"""Host parallelism ceiling probe (no Spark): bounds what ANY job can show.

Runs K identical single-threaded worker processes (numpy integer/hash math +
array traffic, the same flavor of work as the pipeline's compute) and
measures aggregate throughput at two concurrency levels.  The ratio

    eff(K1 -> K2) = thr_K2 / ((K2 / K1) * thr_K1)

is the best scaling efficiency the VM itself permits between those levels —
a distributed job measured on the same box cannot beat it.  This sandbox's
kernel serializes concurrent page faults (mmap_lock), so the ceiling is well
below 1.0 past ~16 cores; on real cluster hardware each node runs in the
low-concurrency regime where the ceiling is ~1.0.

Usage: python tools/probe_host_ceiling.py [k1 k2 [repeats]]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

WORKER = r"""
import os, time
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
import numpy as np
rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
a = rng.integers(0, 2**62, 2_000_000, dtype=np.uint64)
t0 = time.time()
x = a.copy()
for _ in range(120):
    x = (x * np.uint64(6364136223846793005) + np.uint64(1442695040888963407))
    x ^= x >> np.uint64(33)
    s = float(np.sin(x.astype(np.float64) * 1e-19).sum())
print(time.time() - t0)
"""
import sys as _sys


def run_k(k: int) -> float:
    """Aggregate throughput (work units / sec) with k concurrent workers."""
    procs = [
        subprocess.Popen(
            [_sys.executable, "-c", "import sys\n" + WORKER, str(i)],
            stdout=subprocess.PIPE,
            text=True,
        )
        for i in range(k)
    ]
    walls = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        walls.append(float(out.strip().splitlines()[-1]))
    # each worker is one work unit; aggregate throughput uses the slowest
    # (all k unitsdone when the last finishes)
    return k / max(walls)


def main():
    k1 = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    k2 = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    thr1 = max(run_k(k1) for _ in range(repeats))
    thr2 = max(run_k(k2) for _ in range(repeats))
    eff = thr2 / ((k2 / k1) * thr1)
    print(
        json.dumps(
            {
                "k1": k1,
                "k2": k2,
                "thr_k1_units_per_sec": round(thr1, 3),
                "thr_k2_units_per_sec": round(thr2, 3),
                "host_ceiling_efficiency": round(eff, 3),
                "note": "upper bound on any job's scaling efficiency between these concurrency levels on this VM",
            }
        )
    )


if __name__ == "__main__":
    main()
