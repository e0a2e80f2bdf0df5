"""Two-phase probe (engine_fast._probe_bucketed) boundary parity.

The compacted two-phase probe must return bit-identical results to the
single-phase full-range probe for every anchor position — especially at
the PROBE_PHASE_A boundary, for junk reads (no anchor anywhere), and when
the unresolved set spans multiple PROBE_GROUP trips.
"""

import numpy as np
import pytest

from nimble_tpu.index.build import build_index
from nimble_tpu.ops import engine_fast as ef
from nimble_tpu.ops.device_index import build_bucketed_index
from nimble_tpu.utils.dna import encode_bases


def _mk(rng, n_feats=8, feat_len=300):
    feats = [
        "".join(rng.choice(list("ACGT"), size=feat_len)) for _ in range(n_feats)
    ]
    index = build_index(feats)
    bidx = build_bucketed_index(index)
    codes = np.stack([encode_bases(f) for f in feats])
    return feats, index, bidx, codes


def _probe(bidx, reads, lens, p_limit):
    import jax.numpy as jnp

    out = ef._probe_bucketed(
        jnp.asarray(reads, dtype=jnp.int32), jnp.asarray(lens),
        jnp.asarray(bidx.bkey_lo), jnp.asarray(bidx.bkey_hi),
        jnp.asarray(bidx.bkey_fp),
        k=bidx.k, max_probe=bidx.max_probe,
        bucket_mask=bidx.n_buckets - 1, p_limit=p_limit,
    )
    return tuple(np.asarray(x) for x in out)


def _reads_with_anchor_at(rng, codes, pos, L, k):
    """A read whose FIRST table k-mer sits exactly at position ``pos``:
    junk prefix (non-table random bases rejected against the index) then a
    reference fragment."""
    feat = rng.integers(0, codes.shape[0])
    start = rng.integers(0, codes.shape[1] - (L - pos))
    read = rng.integers(0, 4, L).astype(np.int8)
    read[pos:] = codes[feat, start : start + (L - pos)]
    return read


@pytest.mark.parametrize("seed", [0, 7])
def test_two_phase_matches_single_phase_across_boundary(seed):
    rng = np.random.default_rng(seed)
    feats, index, bidx, codes = _mk(rng)
    k, L = bidx.k, 96
    S = ef.PROBE_PHASE_A
    P = L - k + 1

    reads, lens = [], []
    # anchors straddling the phase boundary and the extremes
    for pos in [0, 1, S - 2, S - 1, S, S + 1, S + 5, P - 2, P - 1]:
        reads.append(_reads_with_anchor_at(rng, codes, pos, L, k))
        lens.append(L)
    # junk reads (no anchor anywhere) and a short-read tail
    for _ in range(6):
        reads.append(rng.integers(0, 4, L).astype(np.int8))
        lens.append(L)
    r = np.zeros(L, dtype=np.int8)
    short = _reads_with_anchor_at(rng, codes, 2, k + 4, k)
    r[: len(short)] = short
    reads.append(r)
    lens.append(k + 4)  # only positions 0..4 valid
    mat = np.stack(reads)
    lens = np.asarray(lens, dtype=np.int32)

    got = _probe(bidx, mat, lens, P)

    # single-phase reference: disable phase B by raising the boundary
    old = ef.PROBE_PHASE_A
    ef.PROBE_PHASE_A = 1 << 30
    try:
        want = _probe(bidx, mat, lens, P)
    finally:
        ef.PROBE_PHASE_A = old

    names = ["has_anchor", "anchor", "bucket_sel", "lane_sel", "fp_bad"]
    for name, g, w in zip(names, got, want):
        np.testing.assert_array_equal(g, w, err_msg=name)
    # sanity: the expected anchors actually probed where planted (the junk
    # prefix can accidentally contain a table k-mer only with ~0 prob)
    assert got[0][: 9].all() and not got[0][9:15].any()


def test_two_phase_multiple_trips(monkeypatch):
    """Force > 2 while_loop trips: more unresolved reads than PROBE_GROUP."""
    monkeypatch.setattr(ef, "PROBE_GROUP", 8)
    rng = np.random.default_rng(3)
    feats, index, bidx, codes = _mk(rng)
    k, L = bidx.k, 96
    S = ef.PROBE_PHASE_A
    P = L - k + 1

    reads, lens = [], []
    for i in range(40):  # all unresolved in phase A -> 5 trips of 8
        if i % 3 == 0:
            reads.append(rng.integers(0, 4, L).astype(np.int8))  # junk
        else:
            pos = int(rng.integers(S, P))
            reads.append(_reads_with_anchor_at(rng, codes, pos, L, k))
        lens.append(L)
    for i in range(9):  # some early anchors mixed in
        reads.append(_reads_with_anchor_at(rng, codes, i % S, L, k))
        lens.append(L)
    mat = np.stack(reads)
    lens = np.asarray(lens, dtype=np.int32)

    got = _probe(bidx, mat, lens, P)
    old = ef.PROBE_PHASE_A
    ef.PROBE_PHASE_A = 1 << 30
    try:
        want = _probe(bidx, mat, lens, P)
    finally:
        ef.PROBE_PHASE_A = old
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
