#!/usr/bin/env python
"""Stage-level on-hardware profile of the fast compact kernel.

Compiles prefix-truncated variants of `_probe_walk_filter_impl` (each
ending at one of the kernel's optimization_barrier stage fences) and
reports per-stage time by subtraction:

  unpack+probe | +span gather/unpack/match | +walk scans | +filters/pack

Each variant is jitted over the SAME packed launch buffer the production
engine ships, on the bench workload's table (50 features x 500 bp,
90 bp reads, launch_batch x bucket-96 body).  VERDICT r2 item 4.

Usage: python scripts/profile_kernel.py [--batch 8192] [--rounds 30] [--cpu]
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
    from functools import partial

    from bench import build_workload
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.ops import engine_fast as ef

    index, reference, cfg, mat, lens = build_workload(n_reads=args.batch)
    eng = DeviceAlignEngine(index, cfg)
    bucket = 96
    B = args.batch
    buf = DeviceAlignEngine._pack_reads(mat, lens, bucket, B)
    buf_dev = jax.device_put(jnp.asarray(buf))

    bidx = eng.bidx
    dev = eng._dev_fast
    s_min = eng._s_min_dev(bucket)
    thr, nmm, dm, dn = eng._dev_scalars
    kw = dict(
        k=bidx.k, max_probe=bidx.max_probe, c_max=eng.c_max,
        bucket_mask=bidx.n_buckets - 1, p_limit=bucket - bidx.k + 1,
        ref_pad=bidx.ref_pad,
    )

    def unpack(packed):
        nb = (bucket + 3) // 4
        words = packed[:, :nb].astype(jnp.int32)
        j = jnp.arange(bucket, dtype=jnp.int32)
        reads = (words[:, j >> 2] >> ((j & 3) * 2)[None, :]) & 3
        read_lens = (
            packed[:, nb].astype(jnp.int32)
            | (packed[:, nb + 1].astype(jnp.int32) << 8)
        )
        return reads, read_lens

    # --- stage-truncated variants (must mirror _probe_walk_filter_impl) --
    @jax.jit
    def v_probe(packed):
        reads, read_lens = unpack(packed)
        has_anchor, anchor, bucket_sel, lane_sel, fp_bad = ef._probe_bucketed(
            reads, read_lens, dev["bkey_lo"], dev["bkey_hi"], dev["bkey_fp"],
            k=kw["k"], max_probe=kw["max_probe"],
            bucket_mask=kw["bucket_mask"], p_limit=kw["p_limit"],
        )
        return (has_anchor.astype(jnp.int32).sum()
                + anchor.sum() + bucket_sel.sum() + lane_sel.sum()
                + fp_bad.astype(jnp.int32).sum())

    def common_prefix(packed):
        reads, read_lens = unpack(packed)
        pr = ef._probe_bucketed(
            reads, read_lens, dev["bkey_lo"], dev["bkey_hi"], dev["bkey_fp"],
            k=kw["k"], max_probe=kw["max_probe"],
            bucket_mask=kw["bucket_mask"], p_limit=kw["p_limit"],
        )
        has_anchor, anchor, bucket_sel, lane_sel, _fp_bad = (
            jax.lax.optimization_barrier(pr))
        astart = dev["bstart"][bucket_sel, lane_sel]
        acnt = jnp.where(has_anchor, dev["bcount"][bucket_sel, lane_sel], 0)
        c_idx = jnp.arange(kw["c_max"], dtype=jnp.int32)[None, :]
        live0 = c_idx < jnp.minimum(acnt, kw["c_max"])[:, None]
        pidx = jnp.clip(astart[:, None] + c_idx, 0,
                        dev["postings_row"].shape[0] - 1)
        rows = dev["postings_row"][pidx]
        offs = dev["postings_off"][pidx].astype(jnp.int32)
        return reads, read_lens, has_anchor, anchor, rows, offs, live0

    @jax.jit
    def v_span(packed):
        reads, read_lens, has_anchor, anchor, rows, offs, live0 = (
            common_prefix(packed))
        # span gather + funnel align + packed match only (walk scans
        # excluded): replicate _span_walk_abs_packed up to its mbits barrier
        Lmax = reads.shape[1]
        B, C = rows.shape[0], rows.shape[1]
        NWr = (Lmax + 15) // 16
        r_start = dev["row_starts"][rows]
        starts = (r_start + offs - anchor[:, None] + kw["ref_pad"]).reshape(-1)
        words, phase = ef._gather_span_words(
            dev["ref_codes_packed"], starts, NWr + 1)
        sh = (jnp.uint32(2) * phase.astype(jnp.uint32))[:, None]
        lo_w = words[:, :NWr] >> sh
        hi_w = (words[:, 1:NWr + 1] << (jnp.uint32(31) - sh)) << jnp.uint32(1)
        aligned = (lo_w | hi_w).reshape(B, C, NWr)
        pad = NWr * 16 - Lmax
        r = reads if pad == 0 else jnp.pad(reads, ((0, 0), (0, pad)))
        j16 = (jnp.uint32(2) * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
        rw = (r.astype(jnp.uint32).reshape(B, NWr, 16) << j16).sum(
            axis=2, dtype=jnp.uint32)
        x = aligned ^ rw[:, None, :]
        mbits = (~(x | (x >> jnp.uint32(1)))) & jnp.uint32(0x55555555)
        return mbits.astype(jnp.int32).sum() + live0.sum()

    @jax.jit
    def v_walk(packed):
        reads, read_lens, has_anchor, anchor, rows, offs, live0 = (
            common_prefix(packed))
        live, ws, wm = ef._span_walk(
            reads, read_lens, anchor, rows, offs, live0,
            dev["ref_codes_packed"], dev["row_starts"], dev["row_lengths"],
            k=kw["k"], ref_pad=kw["ref_pad"],
            l_steps=min(kw["p_limit"] - 1, reads.shape[1] - kw["k"]),
        )
        return live.astype(jnp.int32).sum() + ws.sum() + wm.sum()

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

    variants = [
        ("unpack+probe", v_probe),
        ("+span_match", v_span),
        ("+walk_scans", v_walk),
        ("full_kernel", v_full),
    ]
    # The remote tunnel charges ~30-45 ms of round-trip latency per
    # synchronous transaction AND per-launch submission overhead that
    # varies with tunnel weather.  So: repeat each variant `rounds` times
    # ON DEVICE inside ONE launch (lax.scan whose carry perturbs one input
    # byte, defeating loop-invariant hoisting) — per-iteration time is
    # pure device compute; the single launch's RTT is measured on a
    # 1-iteration run and subtracted.
    def repeated(fn, reps):
        @jax.jit
        def run(packed):
            def body(c, _):
                p = packed.at[0, 0].set(
                    packed[0, 0] ^ (c & 1).astype(packed.dtype))
                return c + fn(p).astype(jnp.int32), None
            out, _ = jax.lax.scan(body, jnp.int32(0), None, length=reps)
            return out
        return run

    def timed(run):
        run(buf_dev).block_until_ready()  # compile + warm
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            run(buf_dev).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    times = {}
    for name, fn in variants:
        base = timed(repeated(fn, 1))
        wall = timed(repeated(fn, args.rounds + 1))
        per = max(wall - base, 0.0) / args.rounds
        times[name] = per
        print(f"{name:>14}: {per*1e3:8.3f} ms/iter  "
              f"({per/args.batch*1e9:7.1f} ns/read cumulative)")

    print("\nper-stage (by subtraction):")
    prev = 0.0
    for name, _ in variants:
        dt = times[name] - prev
        print(f"{name:>14}: {dt*1e3:8.3f} ms  ({dt/args.batch*1e9:7.1f} ns/read)")
        prev = times[name]
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
