"""Pallas walk kernel vs the XLA scan formulation (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nimble_tpu.ops.engine_xla import _walk_scan


def reference_double_walk(f_alive, f_match, f_active, l_alive, l_match, l_active, live0):
    live, s1, m1 = _walk_scan(
        jnp.asarray(live0, bool),
        jnp.asarray(f_alive, bool),
        jnp.asarray(f_match, bool),
        jnp.asarray(f_active, bool),
    )
    live, s2, m2 = _walk_scan(
        live, jnp.asarray(l_alive, bool), jnp.asarray(l_match, bool),
        jnp.asarray(l_active, bool),
    )
    return np.asarray(live), np.asarray(s1 + s2), np.asarray(m1 + m2)


def test_pallas_walk_matches_scan_interpret():
    from jax.experimental.pallas import tpu as pltpu
    from nimble_tpu.ops import pallas_walk

    rng = np.random.default_rng(3)
    B, C, T = 256, 8, 32
    f_alive = (rng.random((B, C, T)) < 0.8).astype(np.int8)
    f_match = (f_alive.astype(bool) & (rng.random((B, C, T)) < 0.7)).astype(np.int8)
    f_active = (rng.random((B, T)) < 0.9).astype(np.int8)
    # make active prefix-monotone like real walks (active until read end)
    f_active = np.sort(f_active, axis=1)[:, ::-1].copy()
    l_alive = (rng.random((B, C, T)) < 0.6).astype(np.int8)
    l_alive = np.sort(l_alive, axis=2)[:, :, ::-1].copy()
    f_alive = np.sort(f_alive, axis=2)[:, :, ::-1].copy()
    f_match = (f_alive.astype(bool) & f_match.astype(bool)).astype(np.int8)
    l_match = (l_alive.astype(bool) & (rng.random((B, C, T)) < 0.7)).astype(np.int8)
    l_active = np.sort((rng.random((B, T)) < 0.7).astype(np.int8), axis=1)[:, ::-1].copy()
    live0 = (rng.random((B, C)) < 0.9).astype(np.int8)

    want_live, want_score, want_mm = reference_double_walk(
        f_alive, f_match, f_active, l_alive, l_match, l_active, live0
    )

    with pltpu.force_tpu_interpret_mode():
        live, score, mm = pallas_walk.pallas_double_walk(
            jnp.asarray(f_alive), jnp.asarray(f_match), jnp.asarray(f_active),
            jnp.asarray(l_alive), jnp.asarray(l_match), jnp.asarray(l_active),
            jnp.asarray(live0), tile_b=64,
        )

    np.testing.assert_array_equal(np.asarray(live).astype(bool), want_live)
    np.testing.assert_array_equal(np.asarray(score), want_score)
    np.testing.assert_array_equal(np.asarray(mm), want_mm)
