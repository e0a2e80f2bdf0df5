#!/usr/bin/env python
"""Isolated-op on-device profile of the span gather/match stage.

The span stage is the kernel's dominant stage (round-3 profile: 1.64 ms
of 4.02 per 8192x96 launch), but prefix-truncation profiling is
untrustworthy here (XLA re-optimizes each prefix differently — round-4
finding).  This script times each sub-op of `_span_walk_abs_packed` IN
ISOLATION: stage inputs are precomputed on device from a real probe run,
then each op is timed by enqueueing N ASYNC launches (alternating two
input variants so nothing caches) and blocking once — (wall - one_launch)
/ (N-1) is per-launch device time with submission overhead amortized.

Do NOT time ops by repeating them inside an outer lax.scan: ops whose
body contains its own lax.scan (the walk) measured ~30x slower under
scan-nesting than the same op as a top-level launch (round-4 finding) —
the nested harness, not the op.

Usage: python scripts/profile_span_ops.py [--batch 8192] [--rounds 40] [--cpu]
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
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--rounds", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.ops import engine_fast as ef

    index, reference, cfg, mat, lens = build_workload(n_reads=args.batch)
    eng = DeviceAlignEngine(index, cfg)
    bucket = 96
    B = args.batch
    buf = DeviceAlignEngine._pack_reads(mat, lens, bucket, B)
    dev = eng._dev_fast
    bidx = eng.bidx
    k, ref_pad = bidx.k, bidx.ref_pad
    C = eng.c_max
    Lmax = bucket
    NWr = (Lmax + 15) // 16
    NW = NWr + 1

    # ---- compute the stage INPUTS once (host->device, outside timing) ---
    @jax.jit
    def stage_inputs(packed):
        nb = (bucket + 3) // 4
        words = packed[:, :nb].astype(jnp.int32)
        j = jnp.arange(bucket, dtype=jnp.int32)
        reads = (words[:, j >> 2] >> ((j & 3) * 2)[None, :]) & 3
        read_lens = (
            packed[:, nb].astype(jnp.int32)
            | (packed[:, nb + 1].astype(jnp.int32) << 8)
        )
        has_anchor, anchor, bucket_sel, lane_sel, _fp = ef._probe_bucketed(
            reads, read_lens, dev["bkey_lo"], dev["bkey_hi"], dev["bkey_fp"],
            k=k, max_probe=bidx.max_probe, bucket_mask=bidx.n_buckets - 1,
            p_limit=bucket - k + 1,
        )
        astart = dev["bstart"][bucket_sel, lane_sel]
        acnt = jnp.where(has_anchor, dev["bcount"][bucket_sel, lane_sel], 0)
        c_idx = jnp.arange(C, dtype=jnp.int32)[None, :]
        live0 = c_idx < jnp.minimum(acnt, C)[:, None]
        pidx = jnp.clip(astart[:, None] + c_idx, 0,
                        dev["postings_row"].shape[0] - 1)
        rows = dev["postings_row"][pidx]
        offs = dev["postings_off"][pidx].astype(jnp.int32)
        r_start = dev["row_starts"][rows]
        starts = (r_start + offs - anchor[:, None] + ref_pad).reshape(-1)
        return reads, read_lens, anchor, rows, offs, live0, starts

    buf_dev = jax.device_put(jnp.asarray(buf))
    ins = jax.block_until_ready(stage_inputs(buf_dev))
    reads, read_lens, anchor, rows, offs, live0, starts = ins

    # materialized intermediates for downstream isolated ops
    @jax.jit
    def mk_words(starts):
        return ef._gather_span_words(dev["ref_codes_packed"], starts, NW)

    words, phase = jax.block_until_ready(mk_words(starts))

    @jax.jit
    def mk_aligned(words, phase):
        sh = (jnp.uint32(2) * phase.astype(jnp.uint32))[:, None]
        lo_w = words[:, :NWr] >> sh
        hi_w = (words[:, 1:NWr + 1] << (jnp.uint32(31) - sh)) << jnp.uint32(1)
        return (lo_w | hi_w).reshape(B, C, NWr)

    aligned = jax.block_until_ready(mk_aligned(words, phase))

    @jax.jit
    def mk_rw(reads):
        pad = NWr * 16 - Lmax
        r = reads if pad == 0 else jnp.pad(reads, ((0, 0), (0, pad)))
        j16 = (jnp.uint32(2)
               * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
        return (r.astype(jnp.uint32).reshape(B, NWr, 16) << j16).sum(
            axis=2, dtype=jnp.uint32)

    rw = jax.block_until_ready(mk_rw(reads))

    @jax.jit
    def mk_mbits(aligned, rw):
        x = aligned ^ rw[:, None, :]
        return (~(x | (x >> jnp.uint32(1)))) & jnp.uint32(0x55555555)

    mbits = jax.block_until_ready(mk_mbits(aligned, rw))

    # ---- isolated ops (each a jitted fn of ONE perturbable input) ------
    @jax.jit
    def op_gather(s):
        w, ph = ef._gather_span_words(dev["ref_codes_packed"], s, NW)
        return w.astype(jnp.int32).sum() + ph.sum()

    @jax.jit
    def op_funnel(w):
        return mk_aligned(w, phase).astype(jnp.int32).sum()

    @jax.jit
    def op_rw(r):
        return mk_rw(r).astype(jnp.int32).sum()

    @jax.jit
    def op_mbits(a):
        return mk_mbits(a, rw).astype(jnp.int32).sum()

    @jax.jit
    def op_transpose(m):
        t = jnp.transpose(m, (2, 1, 0))
        t = jax.lax.optimization_barrier(t)
        return t.astype(jnp.int32).sum()

    @jax.jit
    def op_span_full(a):
        live, ws, wm = ef._span_walk_abs_packed(
            reads, read_lens, a, rows, offs, live0,
            dev["ref_codes_packed"], dev["row_starts"], dev["row_lengths"],
            k=k, ref_pad=ref_pad,
        )
        return live.astype(jnp.int32).sum() + ws.sum() + wm.sum()

    def timed_async(fn, x, n):
        x2 = x + jnp.zeros((), dtype=x.dtype)  # distinct buffer, same value
        fn(x).block_until_ready()
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            outs = [fn(x if i % 2 == 0 else x2) for i in range(n)]
            outs[-1].block_until_ready()
            wall = time.perf_counter() - t0
            t0 = time.perf_counter()
            fn(x).block_until_ready()
            one = time.perf_counter() - t0
            best = min(best, max(wall - one, 0.0) / (n - 1))
        return best

    ops = [
        ("span_gather (B*C x 28B rows)", op_gather, starts),
        ("funnel_align", op_funnel, words),
        ("read_words", op_rw, reads),
        ("xor_mbits", op_mbits, aligned),
        ("mbits_transpose", op_transpose, mbits),
        ("span_stage_total (gather..scan)", op_span_full, anchor),
    ]
    print(f"batch={B} bucket={bucket} C={C} NWr={NWr} "
          f"rounds={args.rounds}", flush=True)
    for name, fn, x in ops:
        per = timed_async(fn, x, args.rounds)
        print(f"{name:36s} {per*1e3:8.3f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
