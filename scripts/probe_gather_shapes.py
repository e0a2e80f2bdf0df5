#!/usr/bin/env python
"""Why do in-kernel gathers cost ~5 cycles/element when an isolated
(65536,)-index row gather runs at 0.42 ns/row?

Hypotheses tested on hardware, each as its own jit with async-batched
launches (fixed ~0.87 ms launch overhead subtracted via an empty launch):

  A. table size     — 4K/64K/512K-row tables (VMEM prefetch cutoff?)
  B. index shape    — flat (M,) vs (B, S) 2-D indices
  C. row width      — (N, 8) u32 rows vs (N,) u64 elements vs (N,) u32
  D. fused pair     — postings row+off as two gathers vs one packed i64
  E. dependency     — indices fresh from HBM vs computed on the fly

Usage: python scripts/probe_gather_shapes.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, S, C = 8192, 16, 8
    M = B * C

    def timed(fn, *args, reps=30):
        jax.block_until_ready(fn(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(reps)]
            jax.block_until_ready(outs)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    @jax.jit
    def empty(x):
        return x[0]

    base = jnp.zeros(8, jnp.uint32)
    t0 = timed(empty, base)
    print(f"empty launch: {t0*1e3:.3f} ms (subtracted below)", flush=True)

    print("-- A/C: row gather rate vs table rows x row width --")
    for n_tab in (4096, 65536, 524288):
        tab = jnp.asarray(
            rng.integers(0, 2**32, size=(n_tab, 8), dtype=np.uint32))
        idx = jnp.asarray(rng.integers(0, n_tab, size=(M,), dtype=np.int32))

        @jax.jit
        def g(tab, idx):
            return jnp.take(tab, idx, axis=0).sum()

        t = timed(g, tab, idx) - t0
        print(f"  ({n_tab:6d}, 8) u32 rows : {t*1e6:8.1f} us "
              f"({t/M*1e9:6.2f} ns/row)", flush=True)

    for n_tab in (65536, 524288):
        tab1 = jnp.asarray(
            rng.integers(0, 2**32, size=(n_tab,), dtype=np.uint32))
        idx = jnp.asarray(rng.integers(0, n_tab, size=(M,), dtype=np.int32))

        @jax.jit
        def g1(tab, idx):
            return jnp.take(tab, idx, axis=0).sum()

        t = timed(g1, tab1, idx) - t0
        print(f"  ({n_tab:6d},) u32 elems : {t*1e6:8.1f} us "
              f"({t/M*1e9:6.2f} ns/elem)", flush=True)

    print("-- B: index shape (B, S) vs flat, (65536, 8) u32 table --")
    tab = jnp.asarray(
        rng.integers(0, 2**32, size=(65536, 8), dtype=np.uint32))
    idx2 = jnp.asarray(
        rng.integers(0, 65536, size=(B, S), dtype=np.int32))

    @jax.jit
    def g2(tab, idx2):
        return tab[idx2].sum()          # (B, S, 8) result

    t = timed(g2, tab, idx2) - t0
    print(f"  (B,S) idx -> (B,S,8): {t*1e6:8.1f} us "
          f"({t/(B*S)*1e9:6.2f} ns/row)", flush=True)

    @jax.jit
    def g2f(tab, idx2):
        return tab[idx2.reshape(-1)].sum()

    t = timed(g2f, tab, idx2) - t0
    print(f"  flat idx  -> (M,8)  : {t*1e6:8.1f} us "
          f"({t/(B*S)*1e9:6.2f} ns/row)", flush=True)

    print("-- D: postings pair: 2x i32 gathers vs 1 packed i64 --")
    n_post = 49152
    prow = jnp.asarray(rng.integers(0, 200, size=(n_post,), dtype=np.int32))
    poff = jnp.asarray(rng.integers(0, 500, size=(n_post,), dtype=np.int32))
    ppack = (prow.astype(jnp.int64) << 32) | poff.astype(jnp.int64)
    pidx = jnp.asarray(rng.integers(0, n_post, size=(B, C), dtype=np.int32))

    @jax.jit
    def two(prow, poff, pidx):
        return prow[pidx].sum() + poff[pidx].sum()

    t = timed(two, prow, poff, pidx) - t0
    print(f"  two i32 gathers : {t*1e6:8.1f} us", flush=True)

    @jax.jit
    def one(ppack, pidx):
        v = ppack[pidx]
        return (v >> 32).sum() + (v & 0xFFFFFFFF).sum()

    try:
        t = timed(one, ppack, pidx) - t0
        print(f"  one i64 gather  : {t*1e6:8.1f} us", flush=True)
    except OverflowError:
        # x64 disabled: the i64 pack truncates to i32 and the u32 mask
        # overflows — the u32-packed variant below is the meaningful one
        print("  one i64 gather  : skipped (jax_enable_x64 off)", flush=True)

    # u32 pack (row<<16 | off) — half the gathered bytes of the i64
    ppack32 = ((prow.astype(jnp.uint32) << 16)
               | poff.astype(jnp.uint32)).astype(jnp.uint32)

    @jax.jit
    def one32(ppack32, pidx):
        v = ppack32[pidx]
        return (v >> 16).sum() + (v & 0xFFFF).sum()

    t = timed(one32, ppack32, pidx) - t0
    print(f"  one u32 gather  : {t*1e6:8.1f} us", flush=True)

    print("-- E: gather behind a while_loop dependency --")
    idx = jnp.asarray(rng.integers(0, 65536, size=(M,), dtype=np.int32))

    @jax.jit
    def dep(tab, idx):
        # tiny while loop producing a data-dependent scalar, then gather
        def cond(c):
            return c[0] < 3

        def body(c):
            return (c[0] + 1, c[1] + idx[:1].sum())

        n, s = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
        return jnp.take(tab, jnp.clip(idx + (s & 0), 0, 65535), axis=0).sum()

    t = timed(dep, tab, idx) - t0
    print(f"  post-while gather: {t*1e6:8.1f} us ({t/M*1e9:6.2f} ns/row)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
