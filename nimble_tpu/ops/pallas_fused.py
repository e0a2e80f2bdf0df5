"""Fused Pallas TPU kernel: span unpack + match + double walk in VMEM.

The XLA fast path (`ops.engine_fast._span_walk_abs`) materializes several
(B, C, Lmax)-shaped intermediates in HBM between fenced stages (the phase
select, the unpacked reference span, the match matrix, and their (T, C, B)
transposes for the scan), and then runs the walk recurrence as a ~2*(Lmax-k)
step `lax.scan` whose per-step While-loop overhead dominates at (C, B) step
widths.  This kernel removes both costs at once:

  * the ONLY array inputs are the raw gathered reference words
    (NW per candidate), the reads, and a handful of (C, B)/(B,) scalars —
    ~3 MB per 8192-read body instead of >50 MB of intermediates;
  * phase alignment, 2-bit unpack, match, and BOTH walk recurrences
    (forward then left) run inside one Pallas program per read-tile, the
    loop fully in VMEM/registers with no per-step dispatch overhead.

Semantics are bit-identical to `_span_walk_abs` (read-absolute coordinates;
the recurrence is `ops.engine_xla._walk_scan`'s): forward steps are
p = k..Lmax-1 with alive = base_off + p < row_len, active = anchor + k <= p
< read_len; left steps are p = P-2..0 with alive = base_off + p >= 0,
active = p < anchor.  Equality with the XLA path is asserted in
tests/test_pallas_fused.py (interpret mode on CPU; compiled on TPU).

Replaces the hot inner loop of `map_read_with_mismatch` from the
reference's external `debruijn_mapping` crate (`src/align.rs:965`).

Layout (Mosaic): lanes = read tile (128-aligned), sublanes = C candidates;
the step index walks leading dims only (lane dims cannot be dynamically
indexed); compute is int32/uint32 (no int8 reductions on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel_factory(k: int, Lmax: int, NW: int):
    """Build the kernel body for static (k, Lmax, NW)."""

    def kernel(
        reads_ref,    # (Lmax, TB) int32 — read codes, position-major
        lens_ref,     # (1, TB) int32 — read lengths
        anchor_ref,   # (1, TB) int32
        base_ref,     # (C, TB) int32 — off - anchor per candidate
        rlen_ref,     # (C, TB) int32 — candidate row lengths
        live0_ref,    # (C, TB) int32 — initial live lanes (0/1)
        words_ref,    # (NW, C, TB) uint32 — gathered ref words per candidate
        phase_ref,    # (C, TB) uint32 — span start & 15
        live_out,     # (C, TB) int32
        score_out,    # (1, TB) int32
        mm_out,       # (1, TB) int32
        sw_ref,       # scratch (NW-1, C, TB) uint32 — phase-aligned words
    ):
        # Phase-align the span words once: aligned word w holds span
        # positions [16w, 16w+16).  Shifting by (31-s) then 1 keeps every
        # shift amount < 32 (a single << (32-s) is undefined at s=0).
        s = phase_ref[:, :] * jnp.uint32(2)
        for w in range(NW - 1):
            lo = words_ref[w] >> s
            hi = (words_ref[w + 1] << (jnp.uint32(31) - s)) << jnp.uint32(1)
            sw_ref[w] = lo | hi

        live = live0_ref[:, :]
        base = base_ref[:, :]
        rlen = rlen_ref[:, :]
        anchor = anchor_ref[0, :]
        rdlen = lens_ref[0, :]
        TB = live.shape[1]
        score = jnp.zeros((TB,), dtype=jnp.int32)
        mm = jnp.zeros((TB,), dtype=jnp.int32)

        def step_at(p, live, score, mm, alive, active):
            """One walk step at absolute read position p (traced int32)."""
            w = p >> 4
            sh = ((p & 15) * 2).astype(jnp.uint32)
            code = ((sw_ref[w] >> sh) & jnp.uint32(3)).astype(jnp.int32)
            read_p = reads_ref[p]                       # (TB,) int32
            m = (code == read_p[None, :]).astype(jnp.int32) * alive
            la = live * alive
            lm = live * m
            any_alive = jnp.max(la, axis=0)             # (TB,)
            any_match = jnp.max(lm, axis=0)
            act = active * any_alive
            act_match = act * any_match
            live = jnp.where(
                act_match[None, :] > 0, lm,
                jnp.where(act[None, :] > 0, la, live),
            )
            score = score + act_match
            mm = mm + act * (1 - any_match)
            return live, score, mm

        def fwd_step(p, carry):
            live, score, mm = carry
            alive = ((base + p) < rlen).astype(jnp.int32)
            active = ((p >= anchor + k) & (p < rdlen)).astype(jnp.int32)
            return step_at(p, live, score, mm, alive, active)

        live, score, mm = jax.lax.fori_loop(
            k, Lmax, fwd_step, (live, score, mm)
        )

        # left walk: p descends P-2..0 (P = Lmax - k + 1 k-mer positions)
        P = Lmax - k + 1

        def left_step(t, carry):
            live, score, mm = carry
            p = (P - 2) - t
            alive = ((base + p) >= 0).astype(jnp.int32)
            active = (p < anchor).astype(jnp.int32)
            return step_at(p, live, score, mm, alive, active)

        live, score, mm = jax.lax.fori_loop(
            0, P - 1, left_step, (live, score, mm)
        )

        live_out[:, :] = live
        score_out[0, :] = score
        mm_out[0, :] = mm

    return kernel


@partial(jax.jit, static_argnames=("k", "tile_b", "interpret"))
def pallas_fused_span_walk(
    reads_i32,   # (B, Lmax) int32
    read_lens,   # (B,) int32
    anchor,      # (B,) int32
    base_off,    # (B, C) int32
    r_len,       # (B, C) int32
    live0,       # (B, C) bool
    words,       # (B, C, NW) uint32
    phase,       # (B, C) uint32
    *,
    k: int,
    tile_b: int = 512,
    interpret: bool = False,
):
    """Fused span-walk over gathered reference words; see module docstring.

    Returns (live (B, C) bool, score (B,) int32, mm (B,) int32) — exactly
    `_span_walk_abs`'s outputs for the same candidate set.
    """
    B, Lmax = reads_i32.shape
    C = base_off.shape[1]
    NW = words.shape[2]
    assert B % tile_b == 0, (B, tile_b)
    grid = (B // tile_b,)

    def cb_spec(dtype_rows):
        return pl.BlockSpec(
            (dtype_rows, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    live, score, mm = pl.pallas_call(
        _fused_kernel_factory(k, Lmax, NW),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Lmax, tile_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            cb_spec(1), cb_spec(1),
            cb_spec(C), cb_spec(C), cb_spec(C),
            pl.BlockSpec((NW, C, tile_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            cb_spec(C),
        ],
        out_specs=[cb_spec(C), cb_spec(1), cb_spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((C, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((NW - 1, C, tile_b), jnp.uint32)],
        interpret=interpret,
    )(
        jnp.transpose(reads_i32, (1, 0)),
        read_lens[None, :].astype(jnp.int32),
        anchor[None, :].astype(jnp.int32),
        jnp.transpose(base_off, (1, 0)),
        jnp.transpose(r_len, (1, 0)).astype(jnp.int32),
        jnp.transpose(live0, (1, 0)).astype(jnp.int32),
        jnp.transpose(words, (2, 1, 0)),
        jnp.transpose(phase, (1, 0)).astype(jnp.uint32),
    )
    return jnp.transpose(live, (1, 0)).astype(bool), score[0], mm[0]
