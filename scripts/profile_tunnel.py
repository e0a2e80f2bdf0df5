#!/usr/bin/env python
"""Characterize the axon tunnel: bandwidth vs transfer size, stream
concurrency, and up/down duplex overlap.

The FASTQ headline is wire-dominated (scripts/profile_wire_vs_kernel.py:
upload 17 MB/s, fetch ~25 ms RTT per transaction in the same window), so
the pipeline design should be fit to the link's actual shape.

Usage: python scripts/profile_tunnel.py
"""

from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def fresh(nbytes):
        return rng.integers(0, 256, size=(nbytes,), dtype=np.uint8)

    # warm
    jax.block_until_ready(jax.device_put(jnp.asarray(fresh(1 << 20))))

    def best_of(fn, reps=2):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    print("-- upload bandwidth vs transfer size --")
    for mb in (0.25, 1, 4):
        nb = int(mb * (1 << 20))
        bufs = [fresh(nb) for _ in range(max(1, int(4 / mb)))]

        def up():
            ds = [jax.device_put(jnp.asarray(b)) for b in bufs]
            jax.block_until_ready(ds)

        t = best_of(up)
        tot = sum(b.nbytes for b in bufs)
        print(f"  {mb:7.4f} MB x {len(bufs):3d}: {tot/t/1e6:7.1f} MB/s "
              f"({t/len(bufs)*1e3:6.1f} ms/transfer)")

    print("-- download bandwidth vs transfer size --")
    for mb in (0.25, 1):
        nb = int(mb * (1 << 20))
        n = max(1, int(4 / mb))
        devs = [jax.device_put(jnp.asarray(fresh(nb))) for _ in range(n)]
        jax.block_until_ready(devs)

        def down():
            return [np.asarray(d) for d in devs]

        t = best_of(down)
        tot = n * nb
        print(f"  {mb:7.4f} MB x {n:3d}: {tot/t/1e6:7.1f} MB/s "
              f"({t/n*1e3:6.1f} ms/transfer)")

    print("-- async download (copy_to_host_async then block) --")
    nb = 1 << 20
    n = 8
    devs = [jax.device_put(jnp.asarray(fresh(nb))) for _ in range(n)]
    jax.block_until_ready(devs)

    def down_async():
        for d in devs:
            d.copy_to_host_async()
        return [np.asarray(d) for d in devs]

    t = best_of(down_async)
    print(f"  1 MB x {n}: {n*nb/t/1e6:7.1f} MB/s ({t/n*1e3:6.1f} ms/transfer)")

    print("-- 2-thread concurrent uploads (does the link multiplex?) --")
    bufs = [fresh(4 << 20) for _ in range(4)]
    pool = ThreadPoolExecutor(max_workers=2)

    def up_half(half):
        ds = [jax.device_put(jnp.asarray(b)) for b in half]
        jax.block_until_ready(ds)

    def up2():
        fs = [pool.submit(up_half, bufs[:2]), pool.submit(up_half, bufs[2:])]
        for f in fs:
            f.result()

    t = best_of(up2)
    print(f"  2x2x4MB: {16/t:7.1f} MB/s total")

    print("-- duplex: upload while downloading --")
    up_bufs = [fresh(4 << 20) for _ in range(2)]
    down_devs = [jax.device_put(jnp.asarray(fresh(4 << 20))) for _ in range(2)]
    jax.block_until_ready(down_devs)

    def duplex():
        f_up = pool.submit(up_half, up_bufs)
        got = [np.asarray(d) for d in down_devs]
        f_up.result()
        return got

    t = best_of(duplex)
    print(f"  8MB up + 8MB down in {t:6.3f}s "
          f"(= {16/t:6.1f} MB/s aggregate; serial would be ~2x slower)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
