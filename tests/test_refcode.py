"""CRAM-style reference-coded upload: parity and encoder correctness.

Exact-match reads ship as (row, off, len) in 8 wire bytes; the kernel
reconstructs them from the device-resident reference.  The encoder
VERIFIES byte-equality before coding, so results must be bit-identical to
the raw packed path for every read — matching and not.

The feature is OPT-IN (NIMBLE_REFCODE=1; it measured slower on the
tunnel — see models/aligner._REFCODE), so these tests force the module
flag on explicitly.
"""

import numpy as np
import pytest

import nimble_tpu.models.aligner as al


@pytest.fixture(autouse=True)
def _force_refcode_on():
    old = al._REFCODE
    al._REFCODE = True
    yield
    al._REFCODE = old

from nimble_tpu.config import AlignFilterConfig
from nimble_tpu.index.build import build_index
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.utils.dna import encode_bases, revcomp


def _problem(seed=0, n_feats=8, feat_len=260):
    rng = np.random.default_rng(seed)
    feats = ["".join(rng.choice(list("ACGT"), size=feat_len))
             for _ in range(n_feats)]
    doubled = [x for f in feats for x in (f, revcomp(f))]
    cfg = AlignFilterConfig(
        reference_genome_size=len(doubled), score_percent=0.25,
        score_threshold=40, num_mismatches=1, max_hits_to_report=10,
    )
    return build_index(doubled), cfg, feats


def _reads(feats, seed=1, n=600):
    rng = np.random.default_rng(seed)
    W = 90
    mat = np.zeros((n, W), dtype=np.int8)
    lens = np.zeros(n, dtype=np.int32)
    for i in range(n):
        f = feats[i % len(feats)]
        kind = i % 5
        if kind <= 1:  # clean fragment (exact window -> ref-codable)
            s = int(rng.integers(0, len(f) - 80))
            seq = encode_bases(f[s : s + 80])
        elif kind == 2:  # mutated (first k-mer clean, later mismatch)
            s = int(rng.integers(0, len(f) - 80))
            seq = encode_bases(f[s : s + 80]).copy()
            seq[60] = (seq[60] + 1) % 4
        elif kind == 3:  # revcomp fragment (matches the doubled row)
            s = int(rng.integers(0, len(f) - 70))
            seq = encode_bases(revcomp(f[s : s + 70]))
        else:  # junk
            seq = rng.integers(0, 4, 75).astype(np.int8)
        mat[i, : len(seq)] = seq
        lens[i] = len(seq)
    return mat, lens


def test_refcode_encoder_verifies_exact_windows():
    index, cfg, feats = _problem()
    eng = DeviceAlignEngine(index, cfg)
    mat, lens = _reads(feats)
    is_ref, row, off = eng._refcode_rows(mat, lens)
    # every flagged read must equal its claimed window byte-for-byte
    for i in np.flatnonzero(is_ref):
        codes = index.row_codes[row[i]]
        np.testing.assert_array_equal(
            codes[off[i] : off[i] + lens[i]], mat[i, : lens[i]]
        )
    # clean fragments are codable; the mid-read mutants must NOT be coded
    # as their clean window (verification catches the mismatch)
    kinds = np.arange(len(lens)) % 5
    assert is_ref[kinds <= 1].mean() > 0.9
    assert not is_ref[kinds == 2].any() or all(
        np.array_equal(
            index.row_codes[row[i]][off[i] : off[i] + lens[i]],
            mat[i, : lens[i]],
        )
        for i in np.flatnonzero(is_ref & (kinds == 2))
    )


def test_refcode_bit_parity_with_raw_path():
    index, cfg, feats = _problem(seed=3)
    mat, lens = _reads(feats, seed=4)
    eng_on = DeviceAlignEngine(index, cfg)
    got = eng_on.align_raw_compact_from_matrix(mat, lens)
    al._REFCODE = False
    try:
        eng_off = al.DeviceAlignEngine(index, cfg)
        want = eng_off.align_raw_compact_from_matrix(mat, lens)
    finally:
        al._REFCODE = True
    for key in ("astart", "mask", "passed", "needs_host"):
        np.testing.assert_array_equal(got[key], want[key], err_msg=key)


def test_refcode_full_chunk_all_exact():
    """The sel=None fast path splits correctly when EVERY read ref-codes."""
    index, cfg, feats = _problem(seed=7)
    rng = np.random.default_rng(8)
    n, W = 256, 80
    mat = np.zeros((n, W), dtype=np.int8)
    lens = np.full(n, W, dtype=np.int32)
    for i in range(n):
        f = feats[i % len(feats)]
        s = int(rng.integers(0, len(f) - W))
        mat[i] = encode_bases(f[s : s + W])
    eng = DeviceAlignEngine(index, cfg)
    is_ref, _, _ = eng._refcode_rows(mat, lens)
    assert is_ref.all()
    got = eng.align_raw_compact_from_matrix(mat, lens)
    assert got["passed"].all()
    # decode one combo to prove end-to-end integrity
    rows = eng.decode_combo(int(got["astart"][0]), int(got["mask"][0]))
    assert len(rows) >= 1
