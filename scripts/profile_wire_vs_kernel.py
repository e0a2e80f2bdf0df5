#!/usr/bin/env python
"""Separate the bench round's device stage into wire vs kernel.

The bench's `device_wait_and_fetch` blocks on fetch futures, so it conflates
(a) the packed-read upload over the tunnel, (b) the kernel launches, and
(c) the compact-result fetch.  This script times each in isolation at the
exact bench shapes (64 launches of the 8192-read bucket-96 body = 524k
reads/round):

  upload   : device_put of all 64 packed chunk buffers, block at end
  kernel   : 64 async launches on ONE device-resident buffer, block once
  fetch    : block on all 64 compact results (they're tiny)

Usage: python scripts/profile_wire_vs_kernel.py [--launches 64] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--launches", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from nimble_tpu.models.aligner import DeviceAlignEngine

    index, reference, cfg, mat, lens = build_workload(n_reads=args.batch)
    eng = DeviceAlignEngine(index, cfg)
    bucket = 96
    B = args.batch
    buf = DeviceAlignEngine._pack_reads(mat, lens, bucket, B)
    n = args.launches
    # n distinct host buffers (distinct bytes so no caching tricks)
    bufs = [buf.copy() for _ in range(n)]
    for i, b in enumerate(bufs):
        b[:, 0] = (b[:, 0] + i) % 251

    nbytes = buf.nbytes
    print(f"packed buffer: {nbytes/1e6:.2f} MB x {n} launches "
          f"({n*nbytes/1e6:.1f} MB/round, {nbytes/B:.1f} B/read)")

    def launch(d3):
        return eng._launch_chunked_kernel(d3, bucket)

    # --- warmup (compile + first-transfer) -------------------------------
    d = jax.device_put(jnp.asarray(bufs[0].reshape(1, B, -1)))
    r = launch(d)
    jax.block_until_ready(r)

    def best_of(fn, reps=3):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # --- upload only ------------------------------------------------------
    def up():
        ds = [jax.device_put(jnp.asarray(b.reshape(1, B, -1))) for b in bufs]
        jax.block_until_ready(ds)

    t_up = best_of(up)
    print(f"upload : {t_up:7.3f} s  ({n*nbytes/t_up/1e6:7.1f} MB/s, "
          f"{t_up/(n*B)*1e9:6.1f} ns/read)")

    # --- kernel only (device-resident input) ------------------------------
    def kern():
        outs = [launch(d) for _ in range(n)]
        jax.block_until_ready(outs)

    t_k = best_of(kern)
    print(f"kernel : {t_k:7.3f} s  ({t_k/n*1e3:7.2f} ms/launch, "
          f"{t_k/(n*B)*1e9:6.1f} ns/read)")

    # --- kernel + fetch ----------------------------------------------------
    def kern_fetch():
        outs = [launch(d) for _ in range(n)]
        got = [np.asarray(o) for o in outs]
        return got

    t_kf = best_of(kern_fetch)
    print(f"kern+ft: {t_kf:7.3f} s  (fetch adds {t_kf-t_k:7.3f} s)")

    # --- full pipeline the bench way: upload_i -> launch_i -> fetch_i -----
    def full():
        ds = [jax.device_put(jnp.asarray(b.reshape(1, B, -1))) for b in bufs]
        outs = [launch(dd) for dd in ds]
        got = [np.asarray(o) for o in outs]
        return got

    t_full = best_of(full)
    print(f"full   : {t_full:7.3f} s  ({n*B/t_full/1e6:5.2f} M reads/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
