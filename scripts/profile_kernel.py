#!/usr/bin/env python
"""Isolate per-call overhead vs true kernel compute on the TPU tunnel."""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nimble_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import build_workload  # noqa: E402
from nimble_tpu.models.aligner import DeviceAlignEngine  # noqa: E402
from nimble_tpu.ops.engine_fast import probe_walk_filter  # noqa: E402

N = 1 << 17


def timed(fn, reps=5, label=""):
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = min(best, dt)
    print(f"{label}: best {best*1e3:.1f} ms", flush=True)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    index, reference, cfg, mat, lens = build_workload(n_reads=N)
    engine = DeviceAlignEngine(index, cfg)

    dev = engine._dev_fast
    s_min_dev = jax.device_put(engine._s_min_table(90))
    thr = jax.device_put(np.int32(cfg.score_threshold))
    nmm = jax.device_put(np.int32(cfg.num_mismatches))
    dm = jax.device_put(np.bool_(cfg.discard_multiple_matches))
    dn = jax.device_put(np.bool_(cfg.discard_nonzero_mismatch))

    def launch(rd, ld, bucket, p_limit):
        return probe_walk_filter(
            rd, ld,
            dev["bkey_lo"], dev["bkey_hi"], dev["bstart"], dev["bcount"],
            dev["postings_row"], dev["postings_off"],
            dev["ref_codes_packed"], dev["row_starts"], dev["row_lengths"],
            s_min_dev, thr, nmm, dm, dn,
            k=engine.bidx.k, max_probe=engine.bidx.max_probe, c_max=engine.c_max,
            bucket_mask=engine.bidx.n_buckets - 1,
            p_limit=min(p_limit, bucket - engine.bidx.k + 1),
            ref_pad=engine.bidx.ref_pad, use_pallas=False,
        )

    for B in (1 << 16, 1 << 17, 1 << 18):
        reads = np.zeros((B, 90), dtype=np.int8)
        reads[:, :] = np.resize(mat, (B, 90))
        rls = np.full(B, 90, dtype=np.int32)
        rd = jax.device_put(reads)
        ld = jax.device_put(rls)
        out = launch(rd, ld, 90, 8)  # compile
        jax.block_until_ready(out)
        timed(lambda: jax.block_until_ready(launch(rd, ld, 90, 8)),
              5, f"kernel B={B} dev-resident prefetched scalars")

    # per-call overhead: launch with host np scalars like the engine does
    B = 1 << 16
    reads = np.zeros((B, 90), dtype=np.int8)
    reads[:, :] = mat[:B]
    rls = np.full(B, 90, dtype=np.int32)
    rd = jax.device_put(reads)
    ld = jax.device_put(rls)
    jax.block_until_ready(engine._launch_fast_kernel(np.asarray(rd), np.asarray(ld), 90, 8))

    def engine_style():
        out = engine._launch_fast_kernel(reads, rls, 90, 8)
        jax.block_until_ready(out)
    timed(engine_style, 5, f"engine-style launch B={B} (np input + np scalars)")

    # upload cost, int8 vs packed 2-bit
    packed = np.zeros((B, 23), dtype=np.uint8)
    timed(lambda: jax.block_until_ready(jax.device_put(reads)), 5,
          f"upload int8 {reads.nbytes/1e6:.1f}MB")
    timed(lambda: jax.block_until_ready(jax.device_put(packed)), 5,
          f"upload packed {packed.nbytes/1e6:.1f}MB")

    # empty launch: dispatch+fetch latency floor
    f = jax.jit(lambda x: x * 2 + 1)
    small = jax.device_put(np.zeros((8, 128), np.int32))
    jax.block_until_ready(f(small))
    timed(lambda: jax.block_until_ready(f(small)), 10, "tiny jit roundtrip")
    timed(lambda: np.asarray(f(small)), 10, "tiny jit + fetch")

    # host tail cProfile
    import cProfile, io as _io, pstats

    from nimble_tpu.core.fast_count import FastCounter

    bounds = [(i * (1 << 16), (i + 1) * (1 << 16)) for i in range(N >> 16)]
    raws = [engine.align_raw_compact_from_matrix(mat[lo:hi], lens[lo:hi])
            for lo, hi in bounds]
    counter = FastCounter(engine, reference, cfg)
    pr = cProfile.Profile()
    pr.enable()
    for (lo, hi), raw in zip(bounds, raws):
        counter._add_with_raw(mat[lo:hi], lens[lo:hi], None, None, dict(raw), None)
    res = counter.finalize()
    pr.disable()
    s = _io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(25)
    print(s.getvalue(), flush=True)


if __name__ == "__main__":
    main()
