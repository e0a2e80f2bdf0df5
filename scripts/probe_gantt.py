#!/usr/bin/env python
"""Pipeline-shaped overlap probe: interleaved upload->kernel chains.

probe_overlap.py showed upload DOES overlap kernels when the kernels are
enqueued first.  The real pipeline enqueues (upload_i, launches_i) pairs
in order; upload_{i+1} has no data dependency on kernel_i, so a
dependency-driven scheduler overlaps them while an in-order stream
serializes the round to upload + kernel + fetch.  This measures the
exact bench shape: N_CHUNK chunks x (1 chunk upload + n_sub launches +
concat + async fetch), plus diagnostic variants.

Usage: python scripts/probe_gantt.py [--chunks 4] [--subs 5]
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
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--subs", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from nimble_tpu.models.aligner import DeviceAlignEngine, finalize_launch_output

    index, reference, cfg, mat, lens = build_workload(n_reads=args.batch)
    eng = DeviceAlignEngine(index, cfg)
    bucket = 96
    B = args.batch
    nsub, nch = args.subs, args.chunks
    buf = DeviceAlignEngine._pack_reads(mat, lens, bucket, B)
    chunks = []
    for c in range(nch):
        cb = np.repeat(buf[None], nsub, axis=0).copy()
        cb[:, :, 1] = (cb[:, :, 1] + c) % 251
        chunks.append(cb)  # (nsub, B, nb)
    per_chunk_mb = chunks[0].nbytes / 1e6
    print(f"{nch} chunks x {nsub} launches x {B} reads; "
          f"{per_chunk_mb:.2f} MB/chunk upload")

    def launch(d3):
        return eng._launch_chunked_kernel(d3, bucket)

    d0 = jax.device_put(jnp.asarray(chunks[0]))
    jax.block_until_ready(launch(d0[0:1]))

    def best_of(fn, reps=args.reps):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            vals.append(round(time.perf_counter() - t0, 3))
        return min(vals), vals

    # components
    def up_only():
        ds = [jax.device_put(jnp.asarray(c)) for c in chunks]
        jax.block_until_ready(ds)

    t, vals = best_of(up_only)
    print(f"uploads only          : {t:.3f}s {vals}")

    def kern_only():
        outs = []
        for _ in range(nch):
            outs.append(finalize_launch_output(
                [launch(d0[i : i + 1]) for i in range(nsub)]))
        _ = [np.asarray(o) for o in outs]

    t, vals = best_of(kern_only)
    print(f"kernels+fetch resident: {t:.3f}s {vals}")

    # the real pipeline shape: per chunk upload -> launches -> concat+fetch
    def pipeline_shape():
        outs = []
        for c in chunks:
            d = jax.device_put(jnp.asarray(c))
            outs.append(finalize_launch_output(
                [launch(d[i : i + 1]) for i in range(nsub)]))
        _ = [np.asarray(o) for o in outs]

    t_pipe, vals = best_of(pipeline_shape)
    print(f"pipeline shape        : {t_pipe:.3f}s {vals}")

    # variant: all uploads enqueued first, then all launches
    def uploads_first():
        ds = [jax.device_put(jnp.asarray(c)) for c in chunks]
        outs = []
        for d in ds:
            outs.append(finalize_launch_output(
                [launch(d[i : i + 1]) for i in range(nsub)]))
        _ = [np.asarray(o) for o in outs]

    t_uf, vals = best_of(uploads_first)
    print(f"uploads first         : {t_uf:.3f}s {vals}")

    # variant: no fetch at all (does the fetch serialize?)
    def pipeline_nofetch():
        outs = []
        for c in chunks:
            d = jax.device_put(jnp.asarray(c))
            outs.append(finalize_launch_output(
                [launch(d[i : i + 1]) for i in range(nsub)]))
        jax.block_until_ready(outs)

    t_nf, vals = best_of(pipeline_nofetch)
    print(f"pipeline, no fetch    : {t_nf:.3f}s {vals}")

    # variant: one sub-launch per chunk over the whole batch? -> emulate by
    # fewer, bigger launches: nsub=1 with the same bytes
    big = np.concatenate(chunks, axis=1)  # (nsub, nch*B, nb) -> reshape
    big1 = np.ascontiguousarray(big.reshape(1, nsub * nch * B, -1))

    def fused_upload():
        d = jax.device_put(jnp.asarray(big1))
        outs = [launch(d[:, i * B : (i + 1) * B, :])
                for i in range(nsub * nch)]
        out = finalize_launch_output(outs)
        _ = np.asarray(out)

    t_fu, vals = best_of(fused_upload)
    print(f"one big upload        : {t_fu:.3f}s {vals}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
