#!/usr/bin/env python
"""A/B the probe stage across bucket widths (gather row bytes).

The fingerprint probe showed gather cost tracking row BYTES (64->32 B rows
halved the stage); if that holds, width-4 tables (16 B rows, 2x buckets,
same total memory) should halve it again.  Times the isolated probe stage
with the on-device lax.scan repeat trick from scripts/profile_kernel.py.

Usage: python scripts/probe_width_ab.py [--batch 8192] [--rounds 30] [--cpu]
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
    ap.add_argument("--widths", type=int, nargs="+", default=[8, 4, 2])
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.ops import engine_fast as ef
    from nimble_tpu.ops.device_index import build_bucketed_index

    index, reference, cfg, mat, lens = build_workload(n_reads=args.batch)
    bucket = 96
    B = args.batch
    buf = DeviceAlignEngine._pack_reads(mat, lens, bucket, B)
    buf_dev = jax.device_put(jnp.asarray(buf))
    k = index.k
    p_limit = bucket - k + 1

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

    def make_probe(bidx):
        lo = jax.device_put(jnp.asarray(bidx.bkey_lo))
        hi = jax.device_put(jnp.asarray(bidx.bkey_hi))
        fp = jax.device_put(jnp.asarray(bidx.bkey_fp))

        @jax.jit
        def v_probe(packed):
            reads, read_lens = unpack(packed)
            has_anchor, anchor, bucket_sel, lane_sel, fp_bad = ef._probe_bucketed(
                reads, read_lens, lo, hi, fp,
                k=k, max_probe=bidx.max_probe,
                bucket_mask=bidx.n_buckets - 1, p_limit=p_limit,
            )
            return (has_anchor.astype(jnp.int32).sum()
                    + anchor.sum() + bucket_sel.sum() + lane_sel.sum()
                    + fp_bad.astype(jnp.int32).sum())

        return v_probe

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
        run(buf_dev).block_until_ready()
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            run(buf_dev).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    for w in args.widths:
        bidx = build_bucketed_index(index, width=w)
        fn = make_probe(bidx)
        base = timed(repeated(fn, 1))
        wall = timed(repeated(fn, args.rounds + 1))
        per = max(wall - base, 0.0) / args.rounds
        mem_mb = bidx.n_buckets * w * 20 / 1e6
        print(
            f"width={w}: n_buckets={bidx.n_buckets} max_probe={bidx.max_probe}"
            f" table={mem_mb:.1f}MB  probe={per*1e3:8.3f} ms/iter"
            f" ({per/args.batch*1e9:6.1f} ns/read)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
