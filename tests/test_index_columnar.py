"""Columnar KmerIndex invariants: CSR postings, lazy dict view, and the
native-vs-Python table insertion equivalence the device builders rely on."""

import numpy as np
import pytest

from nimble_tpu import native
from nimble_tpu.index.build import build_index, pack_kmer_keys
from nimble_tpu.ops.device_index import (
    EMPTY_SLOT,
    insert_bucket_table,
    insert_hash_table,
    span_gather_indices,
)
from nimble_tpu.utils.dna import encode_bases


def _toy_index(n_rows=20, row_len=120, seed=3):
    rng = np.random.default_rng(seed)
    seqs = ["".join(rng.choice(list("ACGT"), size=row_len)) for _ in range(n_rows)]
    # force shared k-mers across rows: splice row 0's prefix into every row
    seqs = [seqs[0][:40] + s[40:] for s in seqs]
    return build_index(seqs), seqs


def test_csr_matches_bruteforce_postings():
    index, seqs = _toy_index()
    # brute-force postings from the raw sequences
    expect: dict = {}
    for r, s in enumerate(seqs):
        keys = pack_kmer_keys(encode_bases(s), index.k)
        for o, key in enumerate(keys):
            expect.setdefault(int(key), []).append((r, o))
    assert len(index.keys_sorted) == len(expect)
    assert index.num_kmers == sum(len(v) for v in expect.values())
    # keys ascending, spans match, postings row-major then offset-ascending
    assert (np.diff(index.keys_sorted.astype(np.uint64)) > 0).all()
    for i, key in enumerate(index.keys_sorted):
        s0, e0 = int(index.post_starts[i]), int(index.post_starts[i + 1])
        got = list(zip(index.postings_rows[s0:e0], index.postings_offs[s0:e0]))
        assert [(int(r), int(o)) for r, o in got] == expect[int(key)]


def test_kmer_map_view_is_dict_shaped():
    index, _ = _toy_index()
    view = index.kmer_map
    assert len(view) == len(index.keys_sorted)
    k0 = int(index.keys_sorted[7])
    p = view[k0]
    assert p.ndim == 2 and p.shape[1] == 2 and p.dtype == np.int32
    assert np.array_equal(view.get(k0), p)
    assert k0 in view
    missing = (1 << 60) + 123  # 60-bit keys: this is out of range
    assert view.get(missing) is None
    assert missing not in view
    with pytest.raises(KeyError):
        view[missing]
    assert np.array_equal(np.fromiter(view.keys(), dtype=np.uint64,
                                      count=len(view)), index.keys_sorted)


def test_span_gather_indices():
    starts = np.array([5, 0, 9], dtype=np.int64)
    counts = np.array([2, 3, 0], dtype=np.int64)
    got = span_gather_indices(starts, counts)
    assert got.tolist() == [5, 6, 0, 1, 2]
    assert span_gather_indices(np.empty(0, np.int64), np.empty(0, np.int64)).size == 0


@pytest.mark.skipif(not native.available(), reason="native library unavailable")
def test_bucket_insertion_native_matches_python():
    index, _ = _toy_index(n_rows=40)
    keys = index.keys_sorted
    counts = np.diff(index.post_starts)
    starts = index.post_starts[:-1]
    width = 4
    n_buckets = 64  # overfull enough to force probe hops
    while n_buckets * width < len(keys):
        n_buckets *= 2

    def build(force_python):
        bkl = np.full((n_buckets, width), EMPTY_SLOT, dtype=np.uint32)
        bkh = np.full((n_buckets, width), EMPTY_SLOT, dtype=np.uint32)
        bst = np.zeros((n_buckets, width), dtype=np.int32)
        bcn = np.zeros((n_buckets, width), dtype=np.int32)
        if force_python:
            import unittest.mock as mock

            with mock.patch.object(native, "build_bucket_table",
                                   lambda *a, **k: None):
                mp = insert_bucket_table(keys, starts, counts,
                                         bkl, bkh, bst, bcn, width)
        else:
            mp = insert_bucket_table(keys, starts, counts,
                                     bkl, bkh, bst, bcn, width)
        return mp, bkl, bkh, bst, bcn

    got = build(False)
    ref = build(True)
    assert got[0] == ref[0]
    for a, b in zip(got[1:], ref[1:]):
        assert np.array_equal(a, b)


@pytest.mark.skipif(not native.available(), reason="native library unavailable")
def test_flat_insertion_native_matches_python():
    index, _ = _toy_index(n_rows=40)
    keys = index.keys_sorted
    counts = np.diff(index.post_starts)
    starts = index.post_starts[:-1]
    table_size = 64
    while table_size * 0.4 < len(keys):
        table_size *= 2

    def build(force_python):
        tkl = np.full(table_size, EMPTY_SLOT, dtype=np.uint32)
        tkh = np.full(table_size, EMPTY_SLOT, dtype=np.uint32)
        tst = np.zeros(table_size, dtype=np.int32)
        tcn = np.zeros(table_size, dtype=np.int32)
        if force_python:
            import unittest.mock as mock

            with mock.patch.object(native, "build_hash_table",
                                   lambda *a, **k: None):
                mp = insert_hash_table(keys, starts, counts, tkl, tkh, tst, tcn)
        else:
            mp = insert_hash_table(keys, starts, counts, tkl, tkh, tst, tcn)
        return mp, tkl, tkh, tst, tcn

    got = build(False)
    ref = build(True)
    assert got[0] == ref[0]
    for a, b in zip(got[1:], ref[1:]):
        assert np.array_equal(a, b)


def test_empty_library_index():
    index = build_index([])
    assert len(index.keys_sorted) == 0 and index.num_kmers == 0
    assert index.lookup(0) is None
    from nimble_tpu.ops.device_index import build_bucketed_index, build_device_index

    b = build_bucketed_index(index)
    d = build_device_index(index)
    assert b.max_probe >= 1 and d.max_probe >= 1
    assert (b.bkey_lo == EMPTY_SLOT).all() and (d.table_key_lo == EMPTY_SLOT).all()
