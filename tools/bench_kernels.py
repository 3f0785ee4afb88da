"""Pure-kernel micro-benchmarks (no Spark): prints one JSON line with
throughputs of the numpy geometry kernels — the per-core compute envelope
underneath the distributed plans.

Usage: python tools/bench_kernels.py [n]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

# glibc tuning must be set before the allocator initializes: re-exec once
# (same fix engine/session.py applies to executor python workers — without
# it this VM's mmap_lock serializes fresh-array page faults, ~3x slower)
if os.environ.get("MALLOC_MMAP_THRESHOLD_") != "1073741824":
    os.environ.update(
        MALLOC_MMAP_THRESHOLD_="1073741824",
        MALLOC_TRIM_THRESHOLD_="1073741824",
        MALLOC_ARENA_MAX="2",
    )
    os.execv(sys.executable, [sys.executable] + sys.argv)

import numpy as np

sys.path.insert(0, ".")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from rust_s2_spark.kernel import hilbert
    from rust_s2_spark.kernel.covering import RegionCoverer
    from rust_s2_spark.kernel.pip import Loop, regular_loop
    from rust_s2_spark.kernel.region import Cap, _latlng_point

    rng = np.random.default_rng(1)
    lat = rng.uniform(-85, 85, n)
    lng = rng.uniform(-180, 180, n)
    out = {}

    t0 = time.time()
    cids = hilbert.cellid_from_latlng(lat, lng)
    out["encode_mrows_s"] = round(n / (time.time() - t0) / 1e6, 2)

    t0 = time.time()
    hilbert.cellid_to_face_ij_orientation(cids)
    out["decode_mrows_s"] = round(n / (time.time() - t0) / 1e6, 2)

    c = _latlng_point(math.radians(40), math.radians(-100))
    lp = regular_loop(c, math.radians(5), 24)
    x, y, z = hilbert.cellid_to_xyz(cids[:200_000])
    t0 = time.time()
    lp.contains_points(np.asarray(x), np.asarray(y), np.asarray(z))
    out["pip_24edge_mrows_s"] = round(200_000 / (time.time() - t0) / 1e6, 2)

    coverer = RegionCoverer(max_cells=16)
    t0 = time.time()
    reps = 50
    for k in range(reps):
        coverer.covering(Cap.from_latlng_radius(10.0 + k, 20.0, 3.0))
    out["cap_coverings_s"] = round(reps / (time.time() - t0), 1)

    big = regular_loop(c, math.radians(8), 2048)
    t0 = time.time()
    coverer.covering(big)
    out["coastline2048_covering_sec"] = round(time.time() - t0, 2)

    big4k = regular_loop(c, math.radians(8), 4096)
    t0 = time.time()
    coverer.covering(big4k)
    out["coastline4096_covering_sec"] = round(time.time() - t0, 3)
    # deeper covering: more candidate cells -> exercises the uv-grid bucket
    # index (per-cell candidate gather instead of O(n_edges) bbox scans)
    deep = RegionCoverer(max_cells=256, max_level=12)
    t0 = time.time()
    deep.covering(big4k)
    out["coastline4096_deep_covering_sec"] = round(time.time() - t0, 3)

    out["n"] = n
    print(json.dumps(out))


if __name__ == "__main__":
    main()
