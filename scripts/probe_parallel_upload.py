#!/usr/bin/env python
"""Does the axon tunnel aggregate bandwidth across CONCURRENT device_puts?

If the transport multiplexes per-transfer streams, uploading the round's
chunks from K threads could multiply effective wire bandwidth — the
headline is upload-bound (probe_gantt.py: 0.45 of a 0.53 s round).
Also checks size scaling (per-transfer overhead amortization).

Usage: python scripts/probe_parallel_upload.py
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main() -> int:
    rng = np.random.default_rng(0)
    mb = 1 << 20

    # warm the tunnel
    jax.block_until_ready(jax.device_put(jnp.asarray(np.zeros(1024, np.uint8))))

    def bw(nbytes, k_threads, reps=3):
        bufs = [rng.integers(0, 255, nbytes // k_threads, dtype=np.uint8)
                for _ in range(k_threads)]
        best = 1e9
        with ThreadPoolExecutor(max_workers=k_threads) as ex:
            for _ in range(reps):
                t0 = time.perf_counter()
                ds = list(ex.map(
                    lambda b: jax.device_put(jnp.asarray(b)), bufs))
                jax.block_until_ready(ds)
                best = min(best, time.perf_counter() - t0)
        return nbytes / best / 1e6, best

    for size_mb in (1, 4, 16):
        r, t = bw(size_mb * mb, 1)
        print(f"{size_mb:3d} MB, 1 thread : {r:7.1f} MB/s ({t:.3f}s)")
    for k in (2, 4, 8):
        r, t = bw(4 * mb, k)
        print(f"  4 MB, {k} threads: {r:7.1f} MB/s ({t:.3f}s)")
    # sliced: many small puts from one thread (per-transfer overhead)
    r, t = bw(4 * mb, 1)
    print(f"  4 MB, 1 thread : {r:7.1f} MB/s ({t:.3f}s) [repeat]")
    bufs = [rng.integers(0, 255, mb // 4, dtype=np.uint8) for _ in range(16)]
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        ds = [jax.device_put(jnp.asarray(b)) for b in bufs]
        jax.block_until_ready(ds)
        best = min(best, time.perf_counter() - t0)
    print(f"  4 MB as 16 x 256KB serial puts: {4*mb/best/1e6:7.1f} MB/s "
          f"({best:.3f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
