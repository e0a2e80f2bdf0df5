"""Tandem-repeat divergence-class detection at library load.

docs/SEMANTICS.md isolates tandem repeats (period p <= k, run >= k + p) as
the ONE structure where the shipped positional walk can report a subset of
the colored-DBG eq class.  `build_index` must flag such rows and warn so a
user loading a repeat-heavy library knows they are in the documented class.
"""

import random
import warnings

import numpy as np
import pytest

from nimble_tpu.index.build import build_index, detect_tandem_repeat_rows

K = 30


def _rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _flagged(seqs):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        idx = build_index(seqs)
    return idx.repeat_rows.tolist()


def test_tandem_row_flagged_and_warned():
    rng = random.Random(3)
    U = "ACGTTGCA"  # period 8
    seqs = [U * 10, U * 5 + _rand_seq(rng, 30), _rand_seq(rng, 120)]
    with pytest.warns(UserWarning, match="tandem repeats.*SEMANTICS"):
        idx = build_index(seqs)
    # both repeat rows flagged; the random row is not
    assert idx.repeat_rows.tolist() == [0, 1]


def test_random_library_not_flagged():
    rng = random.Random(7)
    seqs = [_rand_seq(rng, 400) for _ in range(20)]
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning fails
        idx = build_index(seqs)
    assert len(idx.repeat_rows) == 0


def test_run_length_boundary_exact():
    """Flag requires a duplicated k-mer at distance p, i.e. a period-p run
    spanning exactly k + p bases; one base short must NOT flag."""
    rng = random.Random(11)
    p = 8
    U = "ACGTTGCA"
    assert len(U) == p
    tail = _rand_seq(rng, 60)
    run_exact = (U * 5)[: K + p]       # 38 bases of period 8 = minimal cert
    run_short = (U * 5)[: K + p - 1]   # 37 bases: no duplicate k-mer
    assert _flagged([run_exact + tail]) == [0]
    assert _flagged([run_short + tail]) == []


def test_distant_duplicate_kmer_not_flagged():
    """Two copies of the same 30-mer at distance > k is NOT the divergence
    class (the walk chain pins contiguity through unique flank k-mers)."""
    rng = random.Random(13)
    block = _rand_seq(rng, K)
    row = block + _rand_seq(rng, 50) + block  # distance 80 > k
    assert _flagged([row]) == []
    # same duplicate at distance <= k IS flagged (period = distance)
    row2 = block + block[:10] + block  # second copy at offset 40 > k...
    # construct distance exactly k: overlap so copies start k apart
    row3 = block + block  # distance 30 == k -> period-30 run of length 2k
    assert _flagged([row3]) == [0]


def test_homopolymer_flagged():
    """Period-1 repeats (homopolymers >= k+1) are in the class too."""
    rng = random.Random(17)
    row = "A" * (K + 1) + _rand_seq(rng, 40)
    assert _flagged([row]) == [0]
    row_short = "A" * K + "C" + _rand_seq(rng, 40)
    assert _flagged([row_short]) == []


def test_detector_direct_api():
    """detect_tandem_repeat_rows over hand-built postings arrays."""
    # key spans: key0 -> row0 offs (0, 10); key1 -> row0 off 50, row1 off 3
    postings_rows = np.array([0, 0, 0, 1], dtype=np.int32)
    postings_offs = np.array([0, 10, 50, 3], dtype=np.int32)
    post_starts = np.array([0, 2, 4], dtype=np.int64)
    got = detect_tandem_repeat_rows(
        postings_rows, postings_offs, post_starts, K)
    assert got.tolist() == [0]
    # cross-key adjacency (row0 off 50 then row1 off 3) must NOT pair, and
    # the (row0, row1) boundary inside one key must NOT pair either
    postings_rows2 = np.array([0, 1], dtype=np.int32)
    postings_offs2 = np.array([0, 5], dtype=np.int32)
    post_starts2 = np.array([0, 2], dtype=np.int64)
    got2 = detect_tandem_repeat_rows(
        postings_rows2, postings_offs2, post_starts2, K)
    assert got2.tolist() == []
