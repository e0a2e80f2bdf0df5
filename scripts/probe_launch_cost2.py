#!/usr/bin/env python
"""Same-window reconciliation of per-launch cost discrepancies.

probe_launch_overhead measured empty launches at 0.87 ms; probe_gather_shapes
measured 0.022 ms minutes later.  Difference candidates: argument size,
engine/device-table residency, output shape, submission weather.  All timed
here in ONE window, interleaved twice to catch drift.

Usage: python scripts/probe_launch_cost2.py
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

    index, reference, cfg, mat, lens = build_workload(n_reads=8192)
    eng = DeviceAlignEngine(index, cfg)
    bucket = 96
    B = 8192
    bidx = eng.bidx
    dev = eng._dev_fast
    s_min = eng._s_min_dev(bucket)
    thr, nmm, dm, dn = eng._dev_scalars
    kw = dict(
        k=bidx.k, max_probe=bidx.max_probe, c_max=eng.c_max,
        bucket_mask=bidx.n_buckets - 1, p_limit=bucket - bidx.k + 1,
        ref_pad=bidx.ref_pad,
    )
    buf_dev = jax.device_put(jnp.asarray(
        DeviceAlignEngine._pack_reads(mat, lens, bucket, B)))
    tiny = jnp.zeros(8, jnp.uint32)

    @jax.jit
    def empty_small(x):
        return x[0]

    @jax.jit
    def empty_big(packed):
        return packed[0, 0]

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

    def timed(fn, arg, reps=40):
        jax.block_until_ready(fn(arg))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(arg) for _ in range(reps)]
            jax.block_until_ready(outs)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    cases = [
        ("empty_small(8B arg)", empty_small, tiny),
        ("empty_big(208KB arg)", empty_big, buf_dev),
        ("unpack(208KB arg)", v_unpack, buf_dev),
        ("full_kernel", v_full, buf_dev),
    ]
    for rnd in (1, 2):
        for name, fn, arg in cases:
            t = timed(fn, arg)
            print(f"[{rnd}] {name:>22}: {t*1e3:8.3f} ms/launch", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
