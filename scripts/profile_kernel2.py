#!/usr/bin/env python
"""Fine-grained kernel decomposition via async-launch batching.

profile_kernel.py times prefix-truncated kernels under a lax.scan repeat
wrapper; this variant times the SAME prefixes (plus finer ones) by issuing
R independent async launches on a device-resident buffer and blocking once
— per-launch device time with submission pipelined (cross-checked against
the scan method: both give ~4.3 ms for the full 8192x96 kernel).

Usage: python scripts/profile_kernel2.py [--batch 8192] [--rounds 40]
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
    ap.add_argument("--rounds", type=int, default=40)
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
    from nimble_tpu.ops.engine_xla import _hash_kmer, _rolling_keys

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
    P = kw["p_limit"]
    print(f"table: {bidx.bkey_fp.shape[0]} buckets x {bidx.bkey_fp.shape[1]} "
          f"lanes, P={P}, k={kw['k']}, max_probe={kw['max_probe']}")

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

    @jax.jit
    def v_unpack(packed):
        reads, read_lens = unpack(packed)
        return reads.sum() + read_lens.sum()

    @jax.jit
    def v_keys(packed):
        reads, read_lens = unpack(packed)
        lo, hi = _rolling_keys(reads[:, : P + kw["k"] - 1], kw["k"])
        h = _hash_kmer(lo, hi) & jnp.uint32(kw["bucket_mask"])
        fp = ef._kmer_fp(lo, hi)
        return h.sum() + fp.sum() + read_lens.sum()

    @jax.jit
    def v_probeA(packed):
        """keys + phase-A table gather + encoded max (no phase B)."""
        reads, read_lens = unpack(packed)
        lo, hi = _rolling_keys(reads[:, : P + kw["k"] - 1], kw["k"])
        h = _hash_kmer(lo, hi) & jnp.uint32(kw["bucket_mask"])
        fp = ef._kmer_fp(lo, hi)
        pos_valid = (
            jnp.arange(P, dtype=jnp.int32)[None, :] + kw["k"]
            <= read_lens[:, None]
        )
        W = dev["bkey_fp"].shape[1]
        lane_prio = (jnp.uint32(W)
                     - jnp.arange(W, dtype=jnp.uint32)[None, None, :])
        pos_prio = jnp.uint32(P) - jnp.arange(P, dtype=jnp.uint32)
        S = min(ef.PROBE_PHASE_A, P)
        bfps = dev["bkey_fp"][h[:, :S].astype(jnp.int32)]
        lane_m = jnp.where(
            bfps == fp[:, :S, None], lane_prio, 0).max(axis=2)
        enc = jnp.where(
            (lane_m > 0) & pos_valid[:, :S],
            (pos_prio[None, :S] << jnp.uint32(8)) | lane_m, 0)
        return enc.max(axis=1).sum()

    @jax.jit
    def v_probe(packed):
        reads, read_lens = unpack(packed)
        pr = ef._probe_bucketed(
            reads, read_lens, dev["bkey_lo"], dev["bkey_hi"], dev["bkey_fp"],
            k=kw["k"], max_probe=kw["max_probe"],
            bucket_mask=kw["bucket_mask"], p_limit=P,
        )
        return sum(x.astype(jnp.int32).sum() for x in pr)

    def common_prefix(packed):
        reads, read_lens = unpack(packed)
        pr = ef._probe_bucketed(
            reads, read_lens, dev["bkey_lo"], dev["bkey_hi"], dev["bkey_fp"],
            k=kw["k"], max_probe=kw["max_probe"],
            bucket_mask=kw["bucket_mask"], p_limit=P,
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
    def v_postings(packed):
        reads, read_lens, has_anchor, anchor, rows, offs, live0 = (
            common_prefix(packed))
        return (rows.sum() + offs.sum() + live0.sum()
                + anchor.sum() + reads[:, 0].sum())

    @jax.jit
    def v_span(packed):
        reads, read_lens, has_anchor, anchor, rows, offs, live0 = (
            common_prefix(packed))
        Lmax = reads.shape[1]
        Bb, C = rows.shape[0], rows.shape[1]
        NWr = (Lmax + 15) // 16
        r_start = dev["row_starts"][rows]
        starts = (r_start + offs - anchor[:, None] + kw["ref_pad"]).reshape(-1)
        words, phase = ef._gather_span_words(
            dev["ref_codes_packed"], starts, NWr + 1)
        sh = (jnp.uint32(2) * phase.astype(jnp.uint32))[:, None]
        lo_w = words[:, :NWr] >> sh
        hi_w = (words[:, 1:NWr + 1] << (jnp.uint32(31) - sh)) << jnp.uint32(1)
        aligned = (lo_w | hi_w).reshape(Bb, C, NWr)
        pad = NWr * 16 - Lmax
        r = reads if pad == 0 else jnp.pad(reads, ((0, 0), (0, pad)))
        j16 = (jnp.uint32(2) * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
        rw = (r.astype(jnp.uint32).reshape(Bb, NWr, 16) << j16).sum(
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
            l_steps=min(P - 1, reads.shape[1] - kw["k"]),
        )
        return live.astype(jnp.int32).sum() + ws.sum() + wm.sum()

    from functools import partial

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
        ("unpack", v_unpack),
        ("+rolling_keys", v_keys),
        ("+probeA_gather", v_probeA),
        ("+probe_full2ph", v_probe),
        ("+postings", v_postings),
        ("+span_match", v_span),
        ("+walk_scans", v_walk),
        ("full_kernel", v_full),
    ]

    R = args.rounds

    def timed(fn):
        jax.block_until_ready(fn(buf_dev))  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(buf_dev) for _ in range(R)]
            jax.block_until_ready(outs)
            best = min(best, (time.perf_counter() - t0) / R)
        return best

    times = {}
    for name, fn in variants:
        t = timed(fn)
        times[name] = t
        print(f"{name:>16}: {t*1e3:8.3f} ms/launch "
              f"({t/args.batch*1e9:7.1f} ns/read cumulative)", flush=True)

    print("\nper-stage (by subtraction):")
    prev = 0.0
    for name, _ in variants:
        dt = times[name] - prev
        print(f"{name:>16}: {dt*1e3:8.3f} ms")
        prev = times[name]
    return 0


if __name__ == "__main__":
    sys.exit(main())
