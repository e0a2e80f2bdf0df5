#!/usr/bin/env python
"""Does the tunnel overlap host->device upload with kernel execution?

VERDICT r4 item 1: the bench's measured rounds (0.41-0.70 s) sit 1.5-2.6x
above the perfect-overlap floor (~0.27 s, upload-bound).  This probe
answers the prerequisite questions directly, at bench shapes:

  q1  is device_put async (returns before the bytes arrive)?
  q2  upload-while-kernels-enqueued: wall ~= max(up, kern) or up + kern?
  q3  does splitting a chunk upload into n_sub per-launch puts reduce the
      time-to-last-result vs one whole-chunk put?
  q4  do TWO python threads (one uploading, one launching) beat one?

Usage: python scripts/probe_overlap.py [--launches 16] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--launches", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=3)
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
    n = args.launches
    buf = DeviceAlignEngine._pack_reads(mat, lens, bucket, B)
    bufs = [buf.copy() for _ in range(n)]
    for i, b in enumerate(bufs):
        b[:, 0] = (b[:, 0] + i) % 251
    nbytes = buf.nbytes
    print(f"{nbytes/1e6:.2f} MB/launch x {n} = {n*nbytes/1e6:.1f} MB")

    def launch(d3):
        return eng._launch_chunked_kernel(d3, bucket)

    d_res = jax.device_put(jnp.asarray(bufs[0].reshape(1, B, -1)))
    jax.block_until_ready(launch(d_res))

    def best_of(fn, reps=args.reps):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            vals.append(time.perf_counter() - t0)
        return min(vals), vals

    # --- q1: is device_put async? ---------------------------------------
    t0 = time.perf_counter()
    ds = [jax.device_put(jnp.asarray(b.reshape(1, B, -1))) for b in bufs]
    t_call = time.perf_counter() - t0
    jax.block_until_ready(ds)
    t_done = time.perf_counter() - t0
    print(f"q1 device_put x{n}: call returns {t_call:.3f}s, "
          f"complete {t_done:.3f}s -> {'ASYNC' if t_call < 0.5*t_done else 'BLOCKING'}")
    del ds

    # --- baselines -------------------------------------------------------
    def up_only():
        ds = [jax.device_put(jnp.asarray(b.reshape(1, B, -1))) for b in bufs]
        jax.block_until_ready(ds)

    t_up, up_vals = best_of(up_only)
    print(f"upload only : {t_up:.3f}s  {up_vals}")

    def kern_only():
        outs = [launch(d_res) for _ in range(n)]
        jax.block_until_ready(outs)

    t_k, k_vals = best_of(kern_only)
    print(f"kernel only : {t_k:.3f}s  {k_vals}")

    # --- q2: upload new buffers while kernels run on resident buffer -----
    def overlapped():
        outs = [launch(d_res) for _ in range(n)]
        ds = [jax.device_put(jnp.asarray(b.reshape(1, B, -1))) for b in bufs]
        jax.block_until_ready(outs)
        jax.block_until_ready(ds)

    t_ov, ov_vals = best_of(overlapped)
    print(f"q2 kern||up : {t_ov:.3f}s  (serial would be {t_up+t_k:.3f}, "
          f"perfect {max(t_up, t_k):.3f})  {ov_vals}")

    # --- q3: per-launch puts + launch-as-you-go vs whole-chunk put -------
    def chained_whole():
        # one put of all n launches' bytes, then n launches, then fetch
        big = np.stack([b for b in bufs])  # (n, B, nb)
        d = jax.device_put(jnp.asarray(big))
        outs = [launch(d[i : i + 1]) for i in range(n)]
        return [np.asarray(o) for o in outs]

    t_cw, cw_vals = best_of(chained_whole)
    print(f"q3 whole-put: {t_cw:.3f}s  {cw_vals}")

    def chained_split():
        outs = []
        for b in bufs:
            d = jax.device_put(jnp.asarray(b.reshape(1, B, -1)))
            outs.append(launch(d))
        return [np.asarray(o) for o in outs]

    t_cs, cs_vals = best_of(chained_split)
    print(f"q3 split-put: {t_cs:.3f}s  {cs_vals}")

    # --- q4: two threads: uploader + launcher ----------------------------
    def two_thread():
        slots = [None] * n
        sem = threading.Semaphore(0)

        def uploader():
            for i, b in enumerate(bufs):
                slots[i] = jax.device_put(jnp.asarray(b.reshape(1, B, -1)))
                sem.release()

        th = threading.Thread(target=uploader)
        th.start()
        outs = []
        for i in range(n):
            sem.acquire()
            outs.append(launch(slots[i]))
        th.join()
        return [np.asarray(o) for o in outs]

    t_2t, vals_2t = best_of(two_thread)
    print(f"q4 2-thread : {t_2t:.3f}s  {vals_2t}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
