"""Pallas TPU kernel for the lockstep walk recurrence.

The walk (semantics: `nimble_tpu/core/walk.py`) is the only genuinely
sequential stage of the align pipeline: a T-step recurrence over a (B, C)
boolean live-set.  The XLA formulation (`ops.engine_xla._walk_scan_t`) runs
it as `lax.scan`; this Pallas kernel runs BOTH walks (forward then left) of a
read-tile entirely in VMEM with the loop in-register.

Layout notes (Mosaic constraints):
  * tensors are (T, C, TILE_B): the time step indexes the LEADING dim (lane
    dims cannot be dynamically indexed), candidates C are sublanes, and the
    read tile is the 128-aligned lane dimension;
  * compute is int32 (Mosaic has no int8 reductions); int8 in/out.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _walk_kernel(
    f_alive_ref, f_match_ref, f_active_ref,
    l_alive_ref, l_match_ref, l_active_ref,
    live0_ref,
    live_out_ref, score_out_ref, mm_out_ref,
):
    """One read-tile: forward walk then left walk, fully in VMEM.

    Shapes per tile: alive/match (T, C, TILE_B) int8, active (T, TILE_B)
    int8, live0 (C, TILE_B) int8; outputs live (C, TILE_B) int8 and
    score/mm (1, TILE_B) int32.
    """

    def one_walk(live, score, mm, alive_ref, match_ref, active_ref):
        T = alive_ref.shape[0]

        def step(t, carry):
            live, score, mm = carry
            alive_t = alive_ref[t]                        # (C, TB) int32
            match_t = match_ref[t]
            active_t = active_ref[t]                      # (TB,) int32

            la = live * alive_t
            lm = live * match_t
            any_alive = jnp.max(la, axis=0)               # (TB,)
            any_match = jnp.max(lm, axis=0)
            act = active_t * any_alive
            act_match = act * any_match

            live = jnp.where(
                act_match[None, :] > 0, lm, jnp.where(act[None, :] > 0, la, live)
            )
            score = score + act_match
            mm = mm + act * (1 - any_match)
            return live, score, mm

        return jax.lax.fori_loop(0, T, step, (live, score, mm))

    live = live0_ref[:, :]
    zeros = jnp.zeros(live.shape[1], dtype=jnp.int32)
    live, score, mm = one_walk(live, zeros, zeros, f_alive_ref, f_match_ref, f_active_ref)
    live, score, mm = one_walk(live, score, mm, l_alive_ref, l_match_ref, l_active_ref)

    live_out_ref[:, :] = live
    score_out_ref[0, :] = score
    mm_out_ref[0, :] = mm


@partial(jax.jit, static_argnames=("tile_b",))
def pallas_double_walk(
    f_alive, f_match, f_active,
    l_alive, l_match, l_active,
    live0,
    *,
    tile_b: int = 512,
):
    """Run forward+left walks for a batch; Pallas TPU kernel.

    All inputs int8 (0/1): alive/match (B, C, T), active (B, T), live0 (B, C).
    Returns (live (B, C) int8, score (B,) int32, mm (B,) int32).
    """
    B, C, T = f_alive.shape
    Tl = l_alive.shape[2]  # the left walk may have a different step count
    assert B % tile_b == 0, (B, tile_b)
    grid = (B // tile_b,)

    # transpose to the kernel layout and widen to int32 outside the kernel
    # (int8 tiles need 32-aligned sublanes; C=8 only fits the int32 tiling)
    def tcb(x):
        return jnp.transpose(x, (2, 1, 0)).astype(jnp.int32)

    def tb(x):
        return jnp.transpose(x, (1, 0)).astype(jnp.int32)

    def tcb_spec(t):
        return pl.BlockSpec((t, C, tile_b), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    def tb_spec(t):
        return pl.BlockSpec((t, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)

    cb_spec = pl.BlockSpec((C, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)

    live, score, mm = pl.pallas_call(
        _walk_kernel,
        grid=grid,
        in_specs=[tcb_spec(T), tcb_spec(T), tb_spec(T),
                  tcb_spec(Tl), tcb_spec(Tl), tb_spec(Tl), cb_spec],
        out_specs=[cb_spec, s_spec, s_spec],
        out_shape=[
            jax.ShapeDtypeStruct((C, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
    )(
        tcb(f_alive), tcb(f_match), tb(f_active),
        tcb(l_alive), tcb(l_match), tb(l_active),
        jnp.transpose(live0, (1, 0)).astype(jnp.int32),
    )
    return jnp.transpose(live, (1, 0)).astype(jnp.int8), score[0], mm[0]
