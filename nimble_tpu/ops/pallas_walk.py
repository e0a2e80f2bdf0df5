"""Pallas TPU kernel for the lockstep walk recurrence.

The walk (semantics: `nimble_tpu/core/walk.py`) is the only genuinely
sequential stage of the align pipeline: a T-step recurrence over a (B, C)
boolean live-set.  The XLA formulation (`ops.engine_xla._walk_scan`) runs it
as `lax.scan`, which materializes the per-step state between iterations; this
Pallas kernel runs BOTH walks (forward then left) of a read-tile entirely in
VMEM with the loop in-register:

  * grid over read tiles (TILE_B reads per program);
  * per step t, the VPU processes the (TILE_B, C) slices of the precomputed
    alive/match tensors;
  * score/mismatch accumulators live in VMEM scratch, written once.

Inputs are int8 (bool) tensors produced by the same gather stage as the XLA
path, so the kernel is a drop-in replacement for the two `_walk_scan` calls.
C (candidate lanes) is padded to the 128-lane boundary by the caller.
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

    Shapes per tile: alive/match (TILE_B, C, T) int8, active (TILE_B, T)
    int8, live0 (TILE_B, C) int8; outputs live (TILE_B, C) int8 and
    score/mm (TILE_B, 1) int32.
    """
    T = f_alive_ref.shape[2]

    def one_walk(live, score, mm, alive_ref, match_ref, active_ref):
        def step(t, carry):
            live, score, mm = carry
            alive_t = alive_ref[:, :, t]
            match_t = match_ref[:, :, t]
            active_t = active_ref[:, t]

            la = live * alive_t
            lm = live * match_t
            any_alive = jnp.max(la, axis=1)
            any_match = jnp.max(lm, axis=1)
            act = active_t * any_alive
            act_match = act * any_match

            live = jnp.where(
                act_match[:, None] > 0, lm, jnp.where(act[:, None] > 0, la, live)
            )
            score = score + act_match.astype(jnp.int32)
            mm = mm + (act * (1 - any_match)).astype(jnp.int32)
            return live, score, mm

        return jax.lax.fori_loop(0, T, step, (live, score, mm))

    live = live0_ref[:, :]
    zeros = jnp.zeros(live.shape[0], dtype=jnp.int32)
    live, score, mm = one_walk(live, zeros, zeros, f_alive_ref, f_match_ref, f_active_ref)
    live, score, mm = one_walk(live, score, mm, l_alive_ref, l_match_ref, l_active_ref)

    live_out_ref[:, :] = live
    score_out_ref[:, 0] = score
    mm_out_ref[:, 0] = mm


@partial(jax.jit, static_argnames=("tile_b",))
def pallas_double_walk(
    f_alive, f_match, f_active,
    l_alive, l_match, l_active,
    live0,
    *,
    tile_b: int = 256,
):
    """Run forward+left walks for a batch; Pallas TPU kernel.

    All inputs int8 (0/1): alive/match (B, C, T), active (B, T), live0 (B, C).
    Returns (live (B, C) int8, score (B,) int32, mm (B,) int32).
    """
    B, C, T = f_alive.shape
    assert B % tile_b == 0, (B, tile_b)
    grid = (B // tile_b,)

    bc_spec = pl.BlockSpec((tile_b, C, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bt_spec = pl.BlockSpec((tile_b, T), lambda i: (i, 0), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((tile_b, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    live, score, mm = pl.pallas_call(
        _walk_kernel,
        grid=grid,
        in_specs=[bc_spec, bc_spec, bt_spec, bc_spec, bc_spec, bt_spec, c_spec],
        out_specs=[c_spec, s_spec, s_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, C), jnp.int8),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
    )(f_alive, f_match, f_active, l_alive, l_match, l_active, live0)
    return live, score[:, 0], mm[:, 0]
