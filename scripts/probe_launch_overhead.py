#!/usr/bin/env python
"""Measure the fixed per-launch cost and the launch-batch scaling.

profile_kernel2 shows a trivial unpack launch costs ~0.88 ms — if that is
fixed per-launch overhead (tunnel submission / device scheduling), the
fastest kernel change is FEWER, BIGGER launches, not cheaper stages.

Measures, on device-resident buffers with async-batched launches:
  1. empty kernel (return one input byte)      -> pure launch overhead
  2. unpack-only kernel at B=8192 and B=16384  -> overhead vs compute split
  3. full kernel at B=8192, 16384, 32768       -> ns/read scaling

Usage: python scripts/probe_launch_overhead.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import jax
    import jax.numpy as jnp
    from functools import partial

    from bench import build_workload
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.ops import engine_fast as ef

    index, reference, cfg, mat, lens = build_workload(n_reads=32768)
    eng = DeviceAlignEngine(index, cfg)
    bucket = 96
    bidx = eng.bidx
    dev = eng._dev_fast
    s_min = eng._s_min_dev(bucket)
    thr, nmm, dm, dn = eng._dev_scalars
    kw = dict(
        k=bidx.k, max_probe=bidx.max_probe, c_max=eng.c_max,
        bucket_mask=bidx.n_buckets - 1, p_limit=bucket - bidx.k + 1,
        ref_pad=bidx.ref_pad,
    )

    def timed(fn, arg, reps=40):
        jax.block_until_ready(fn(arg))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(arg) for _ in range(reps)]
            jax.block_until_ready(outs)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    bufs = {}
    for B in (8192, 16384, 32768):
        bufs[B] = jax.device_put(jnp.asarray(
            DeviceAlignEngine._pack_reads(mat[:B], lens[:B], bucket, B)))

    @jax.jit
    def v_empty(packed):
        return packed[0, 0]

    @jax.jit
    def v_sum(packed):
        return packed.astype(jnp.int32).sum()

    def v_unpack(packed):
        nb = (bucket + 3) // 4
        words = packed[:, :nb].astype(jnp.int32)
        j = jnp.arange(bucket, dtype=jnp.int32)
        reads = (words[:, j >> 2] >> ((j & 3) * 2)[None, :]) & 3
        return reads.sum()

    v_unpack = jax.jit(v_unpack)

    full = partial(
        ef.probe_walk_filter_packed,
        bkey_lo=dev["bkey_lo"], bkey_hi=dev["bkey_hi"],
        bkey_fp=dev["bkey_fp"],
        bstart=dev["bstart"], bcount=dev["bcount"],
        postings_row=dev["postings_row"], postings_off=dev["postings_off"],
        ref_codes_packed=dev["ref_codes_packed"],
        row_starts=dev["row_starts"], row_lengths=dev["row_lengths"],
        s_min_table=s_min, score_threshold=thr, num_mismatches=nmm,
        discard_multiple=dm, discard_nonzero=dn, bucket=bucket, **kw,
    )

    @jax.jit
    def v_full(packed):
        return full(packed).sum()

    t = timed(v_empty, bufs[8192])
    print(f"empty   B=8192 : {t*1e3:7.3f} ms/launch", flush=True)
    t = timed(v_sum, bufs[8192])
    print(f"sum     B=8192 : {t*1e3:7.3f} ms/launch", flush=True)
    for B in (8192, 16384):
        t = timed(v_unpack, bufs[B])
        print(f"unpack  B={B:5d}: {t*1e3:7.3f} ms/launch "
              f"({t/B*1e9:6.1f} ns/read)", flush=True)
    for B in (8192, 16384, 32768):
        t = timed(v_full, bufs[B])
        print(f"full    B={B:5d}: {t*1e3:7.3f} ms/launch "
              f"({t/B*1e9:6.1f} ns/read)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
