#!/usr/bin/env python
"""Feasibility + throughput probe: vectorized gathers inside a Pallas kernel.

The fast kernel's two dominant stages are HBM row-gathers (bucket fp rows in
the probe, span word windows in the walk).  If Mosaic can gather rows from a
VMEM-RESIDENT table with vector indices (jnp.take / take_along_axis inside a
kernel), the tables are small enough (bench: ~117 KB win matrix, ~1-8 MB
bucket fp) to live in VMEM and the gathers stop paying HBM random-access
cost.  This script answers, ON HARDWARE:

  1. does `jnp.take(table, idx, axis=0)` compile inside a Pallas TPU kernel?
  2. same for take_along_axis on the sublane axis?
  3. what's the throughput vs the XLA HBM gather at bench shapes?

Usage: python scripts/probe_mosaic_gather.py [--cpu]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # bench shapes: span gather = 65536 rows from a (3667, 8) u32 window
    # matrix; probe gather = 131072 rows from a (n_buckets, 8) u32 fp table.
    N_TAB = 4096
    W = 8
    M = 65536

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, 2**32, size=(N_TAB, W), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, N_TAB, size=(M,), dtype=np.int32))

    def timed(fn, *a, reps=20):
        out = fn(*a)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best, out

    # --- XLA baseline: HBM gather ---------------------------------------
    @jax.jit
    def xla_gather(tab, idx):
        return jnp.take(tab, idx, axis=0)

    t_xla, ref = timed(xla_gather, tab, idx)
    print(f"XLA take        : {t_xla*1e6:9.1f} us  ({t_xla/M*1e9:6.2f} ns/row)")

    # --- Pallas: table fully in VMEM, vector-index gather ---------------
    def k_take(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def pallas_take(tab, idx):
        return pl.pallas_call(
            k_take,
            out_shape=jax.ShapeDtypeStruct((M, W), jnp.uint32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    try:
        t_p, out = timed(pallas_take, tab, idx)
        ok = bool(jnp.array_equal(out, ref))
        print(f"Pallas take     : {t_p*1e6:9.1f} us  ({t_p/M*1e9:6.2f} ns/row)  match={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"Pallas take     : FAILED ({type(e).__name__}): {str(e)[:300]}")

    # --- Pallas: take_along_axis formulation -----------------------------
    def k_taa(tab_ref, idx_ref, out_ref):
        ii = idx_ref[:].reshape(-1, 1)
        out_ref[:] = jnp.take_along_axis(
            tab_ref[:], jnp.broadcast_to(ii, (M, W)), axis=0
        )

    @jax.jit
    def pallas_taa(tab, idx):
        return pl.pallas_call(
            k_taa,
            out_shape=jax.ShapeDtypeStruct((M, W), jnp.uint32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    try:
        t_p, out = timed(pallas_taa, tab, idx)
        ok = bool(jnp.array_equal(out, ref))
        print(f"Pallas taa      : {t_p*1e6:9.1f} us  ({t_p/M*1e9:6.2f} ns/row)  match={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"Pallas taa      : FAILED ({type(e).__name__}): {str(e)[:300]}")

    # --- Pallas: gather transposed table along LANES ---------------------
    # tab_t is (W, N_TAB): gather along the lane axis with per-lane indices.
    tab_t = tab.T.copy()  # (W, N_TAB)

    def k_lane(tab_ref, idx_ref, out_ref):
        ii = jnp.broadcast_to(idx_ref[:].reshape(1, -1), (W, M))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], ii, axis=1)

    @jax.jit
    def pallas_lane(tab_t, idx):
        return pl.pallas_call(
            k_lane,
            out_shape=jax.ShapeDtypeStruct((W, M), jnp.uint32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab_t, idx)

    try:
        t_p, out = timed(pallas_lane, tab_t, idx)
        ok = bool(jnp.array_equal(out.T, ref))
        print(f"Pallas lane-taa : {t_p*1e6:9.1f} us  ({t_p/M*1e9:6.2f} ns/row)  match={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"Pallas lane-taa : FAILED ({type(e).__name__}): {str(e)[:300]}")

    # --- XLA sub-op splits at bench shapes -------------------------------
    # where does the span stage's 1.64 ms go? time the gather alone vs the
    # funnel+match alone (bench shapes, B=8192, C=8, NWr=6).
    B, C, NWr = 8192, 8, 6
    words = jnp.asarray(
        rng.integers(0, 2**32, size=(B * C, NWr + 1), dtype=np.uint32))
    phase = jnp.asarray(rng.integers(0, 16, size=(B * C,), dtype=np.int32))
    reads = jnp.asarray(rng.integers(0, 4, size=(B, 96), dtype=np.int32))

    @jax.jit
    def funnel_match(words, phase, reads):
        sh = (jnp.uint32(2) * phase.astype(jnp.uint32))[:, None]
        lo_w = words[:, :NWr] >> sh
        hi_w = (words[:, 1:NWr + 1] << (jnp.uint32(31) - sh)) << jnp.uint32(1)
        aligned = (lo_w | hi_w).reshape(B, C, NWr)
        j16 = (jnp.uint32(2) * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
        rw = (reads.astype(jnp.uint32).reshape(B, NWr, 16) << j16).sum(
            axis=2, dtype=jnp.uint32)
        x = aligned ^ rw[:, None, :]
        return (~(x | (x >> jnp.uint32(1)))) & jnp.uint32(0x55555555)

    t_fm, _ = timed(funnel_match, words, phase, reads)
    print(f"XLA funnel+match: {t_fm*1e6:9.1f} us  (per 8192x8 launch)")

    # the sliding-window stack build (is it re-done per launch?)
    packed = jnp.asarray(
        rng.integers(0, 2**32, size=(N_TAB + 8,), dtype=np.uint32))

    @jax.jit
    def win_build_and_take(packed, idx):
        win = jnp.stack([packed[j:N_TAB + j] for j in range(8)], axis=1)
        return jnp.take(win, idx, axis=0)

    t_wb, _ = timed(win_build_and_take, packed, idx)
    print(f"XLA win+take    : {t_wb*1e6:9.1f} us  ({t_wb/M*1e9:6.2f} ns/row)")

    return 0


if __name__ == "__main__":
    sys.exit(main())
