"""Fused Pallas span+walk kernel vs the XLA absolute-coordinate walk.

The fused kernel (ops/pallas_fused.py) must reproduce `_span_walk_abs`
bit-exactly — live lanes, score, mismatch count — for arbitrary candidate
geometry: anchors anywhere, negative/overhanging base offsets, dead lanes,
word-phase boundaries.  Interpret mode on CPU; the same code path compiles
on TPU hardware.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nimble_tpu.config import AlignFilterConfig
from nimble_tpu.core.fast_count import fast_count_calls
from nimble_tpu.index.build import build_index
from nimble_tpu.library import Reference
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.ops.engine_fast import _span_walk_abs, _span_walk_abs_fused
from nimble_tpu.utils.dna import encode_bases, revcomp


def _random_case(rng, B, Lmax, C, k=30):
    """Random packed reference + candidate geometry shaped like the engine's
    real inputs (guard-padded packed ref, row starts/lengths, postings)."""
    n_rows = 6
    row_lengths = rng.integers(k + 2, 220, n_rows).astype(np.int32)
    ref_pad = Lmax + 16
    total = int(row_lengths.sum()) + 2 * ref_pad + 32
    ref_codes = rng.integers(0, 4, total).astype(np.uint32)
    n_words = (total + 15) // 16 + 4
    packed = np.zeros(n_words, dtype=np.uint32)
    for j in range(total):
        packed[j >> 4] |= ref_codes[j] << ((j & 15) * 2)
    row_starts = np.zeros(n_rows, dtype=np.int32)
    pos = 0
    for r in range(n_rows):
        row_starts[r] = pos
        pos += int(row_lengths[r])

    reads = rng.integers(0, 4, (B, Lmax)).astype(np.int32)
    read_lens = rng.integers(k, Lmax + 1, B).astype(np.int32)
    # bias half the reads toward real reference content so walks survive
    for i in range(0, B, 2):
        r = int(rng.integers(0, n_rows))
        off = int(rng.integers(0, max(1, row_lengths[r] - k)))
        span = ref_codes[ref_pad + row_starts[r] + off :
                         ref_pad + row_starts[r] + off + Lmax]
        reads[i, : len(span)] = span[: Lmax]

    anchor = rng.integers(0, np.maximum(1, read_lens - k + 1)).astype(np.int32)
    rows = rng.integers(0, n_rows, (B, C)).astype(np.int32)
    offs = rng.integers(-3, 150, (B, C)).astype(np.int32)
    live0 = rng.random((B, C)) < 0.7
    # ensure some fully-dead reads too
    live0[:: 7] = False
    return dict(
        reads_i32=jnp.asarray(reads), read_lens=jnp.asarray(read_lens),
        anchor=jnp.asarray(anchor), rows=jnp.asarray(rows),
        offs=jnp.asarray(offs), live0=jnp.asarray(live0),
        ref_codes_packed=jnp.asarray(packed),
        row_starts=jnp.asarray(row_starts),
        row_lengths=jnp.asarray(np.asarray(row_lengths)),
    ), ref_pad


@pytest.mark.parametrize("seed,B,Lmax", [(0, 128, 90), (1, 256, 64),
                                         (2, 128, 123), (3, 128, 32)])
def test_fused_matches_abs_walk(seed, B, Lmax):
    rng = np.random.default_rng(seed)
    case, ref_pad = _random_case(rng, B, Lmax, C=8)
    live_a, score_a, mm_a = _span_walk_abs(**case, k=30, ref_pad=ref_pad)
    live_f, score_f, mm_f = _span_walk_abs_fused(**case, k=30, ref_pad=ref_pad)
    np.testing.assert_array_equal(np.asarray(live_a), np.asarray(live_f))
    np.testing.assert_array_equal(np.asarray(score_a), np.asarray(score_f))
    np.testing.assert_array_equal(np.asarray(mm_a), np.asarray(mm_f))
    # the case must exercise real walks, not just dead lanes
    assert int(np.asarray(score_a).sum()) > 0


def test_fused_engine_matches_scan_engine():
    """End-to-end: DeviceAlignEngine(use_pallas_walk="fused") produces the
    same counts as the default XLA engine."""
    rng = np.random.default_rng(77)
    feats = ["".join(rng.choice(list("ACGT"), size=200)) for _ in range(5)]
    doubled = [x for s in feats for x in (s, revcomp(s))]
    names = []
    for i in range(5):
        names += [f"f{i}", f"f{i}§rev"]
    ref = Reference(
        group_on=0, headers=["sequence_name", "sequence"],
        columns=[names, doubled], sequence_name_idx=0, sequence_idx=1,
    )
    cfg = AlignFilterConfig(
        score_percent=0.2, score_threshold=40, num_mismatches=1,
        max_hits_to_report=8,
    )
    index = build_index(doubled)

    reads = []
    for _ in range(150):
        f = int(rng.integers(0, len(doubled)))
        s = int(rng.integers(0, 140))
        frag = doubled[f][s : s + 55]
        reads.append(encode_bases(frag))

    scan_engine = DeviceAlignEngine(index, cfg)
    expected = fast_count_calls(reads, None, scan_engine, ref, cfg)

    fused_engine = DeviceAlignEngine(index, cfg, use_pallas_walk="fused")
    got = fast_count_calls(reads, None, fused_engine, ref, cfg)
    assert got == expected
    assert len(got) > 0
