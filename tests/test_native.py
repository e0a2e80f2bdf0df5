"""Native C++ host ops vs Python fallbacks."""

import numpy as np
import pytest

from nimble_tpu import native
from nimble_tpu.index.build import pack_kmer_keys
from nimble_tpu.utils.dna import encode_bases

from conftest import reads_path


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


@requires_native
def test_encode_bases_bulk():
    data = b"ACGTacgtNNXX" * 100
    np.testing.assert_array_equal(native.encode_bases_bulk(data), encode_bases(data))


@requires_native
def test_fastq_scan_matches_python_reader():
    from nimble_tpu.io.fastq import read_fastq_codes, read_fastq_matrix

    path = reads_path("basic.fastq")
    reads = read_fastq_codes(path)
    mat, lens = read_fastq_matrix(path)
    assert mat.shape[0] == len(reads)
    for i, r in enumerate(reads):
        assert lens[i] == len(r)
        np.testing.assert_array_equal(mat[i, : lens[i]], r)


@requires_native
def test_fastq_scan_malformed():
    buf = b"no_at_sign\nACGT\n+\nIIII\n"
    with pytest.raises(ValueError, match="Unable to read sequence"):
        native.fastq_scan(buf, 10)


@requires_native
def test_extract_kmer_keys():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 200).astype(np.int8)
    got = native.extract_kmer_keys(codes, 30)
    np.testing.assert_array_equal(got, pack_kmer_keys(codes, 30))


@requires_native
def test_build_hash_table_matches_python():
    """Native vs Python insertion loops must produce identical tables."""
    from nimble_tpu.index.build import build_index
    from nimble_tpu.ops import device_index as di
    from nimble_tpu.utils.dna import revcomp

    rng = np.random.default_rng(5)
    seqs = ["".join(rng.choice(list("ACGT"), size=200)) for _ in range(6)]
    doubled = [x for s in seqs for x in (s, revcomp(s))]
    index = build_index(doubled)

    native_didx = di.build_device_index(index)

    # force the Python fallback by monkeypatching availability
    orig = native.build_hash_table
    try:
        native.build_hash_table = lambda *a, **k: None
        python_didx = di.build_device_index(index)
    finally:
        native.build_hash_table = orig

    assert native_didx.max_probe == python_didx.max_probe
    np.testing.assert_array_equal(native_didx.table_key_lo, python_didx.table_key_lo)
    np.testing.assert_array_equal(native_didx.table_key_hi, python_didx.table_key_hi)
    np.testing.assert_array_equal(native_didx.table_start, python_didx.table_start)
    np.testing.assert_array_equal(native_didx.table_count, python_didx.table_count)


@requires_native
def test_pack_reads_matches_numpy():
    """nimble_pack_reads must produce byte-identical launch buffers to the
    NumPy pack in DeviceAlignEngine._pack_reads (the accelerator upload
    format: 2-bit codes + u16 LE length per row, zero-padded to B rows)."""
    from nimble_tpu.models.aligner import DeviceAlignEngine

    rng = np.random.default_rng(11)
    for _ in range(60):
        m = int(rng.integers(1, 400))
        width = int(rng.integers(1, 200))
        bucket = int(rng.integers(1, 300))
        B = m + int(rng.integers(0, 64))
        mat = rng.integers(0, 4, size=(m, width)).astype(np.int8)
        lens = rng.integers(0, 60000, size=m).astype(np.int32)
        got = native.pack_reads(mat, lens, bucket, B)
        # NumPy reference: force the fallback branch
        orig = native.pack_reads
        try:
            native.pack_reads = lambda *a, **k: None
            want = DeviceAlignEngine._pack_reads(mat, lens, bucket, B)
        finally:
            native.pack_reads = orig
        np.testing.assert_array_equal(got, want)


@requires_native
def test_pack_reads_guards_launch_batch_overflow():
    """m > B would make the C++ kernel write past the (B, nb+2) buffer;
    the wrapper must raise loudly instead (heap-corruption guard)."""
    mat = np.zeros((4, 8), dtype=np.int8)
    lens = np.zeros(4, dtype=np.int32)
    with pytest.raises(ValueError, match="exceed launch batch"):
        native.pack_reads(mat, lens, 8, 2)


def _insert_pair(ds, r1: bytes, r2: bytes | None) -> bool:
    """Insert ONE (r1, r2) pair; True iff it was new."""
    f1 = np.frombuffer(r1, dtype=np.int8)
    o1 = np.array([0, len(r1)], dtype=np.int64)
    if r2 is None:
        mask = ds.insert_batch(f1, o1, None, None)
    else:
        f2 = np.frombuffer(r2, dtype=np.int8)
        o2 = np.array([0, len(r2)], dtype=np.int64)
        mask = ds.insert_batch(f1, o1, f2, o2)
    return bool(mask[0])


@requires_native
def test_dedupe_streamhash_split_invariance():
    """The dedupe key is the hash of the CONCATENATED r1+r2 bytes (the
    reference's score map is keyed by the concatenation,
    `src/align.rs:576-579`): equal concatenations under DIFFERENT split
    points must collide, including splits that leave r1 % 8 != 0 (the
    word-wise StreamHash must carry partial words across the boundary)."""
    payload = b"ACGTACGTAACCGGTTAGCTAGCTA"  # 25 bytes, prime-ish
    splits = [0, 1, 3, 7, 8, 9, 13, 16, 24, 25]
    ds = native.make_dedupe_set()
    assert ds is not None
    assert _insert_pair(ds, payload[: splits[0]], payload[splits[0]:])
    for s in splits[1:]:
        assert not _insert_pair(ds, payload[:s], payload[s:]), (
            f"split at {s} hashed differently from split at {splits[0]}"
        )
    # single-end insert of the same bytes = pair with NO mate: the
    # reference key for single-end is just the read string, identical
    # to r1 + "" — must also collide
    assert not _insert_pair(ds, payload, None)
    assert len(ds) == 1


@requires_native
def test_dedupe_streamhash_length_safety():
    """'AB' + '' and 'AB\\0' have different total lengths and must stay
    distinct (no zero-padding ambiguity in the word-wise hash)."""
    ds = native.make_dedupe_set()
    assert _insert_pair(ds, b"AB", b"")
    assert _insert_pair(ds, b"AB\x00", None), "'AB' vs 'AB\\0' collided"
    assert len(ds) == 2
    # and the empty-mate split of the longer payload still collides with
    # its other splits
    assert not _insert_pair(ds, b"AB", b"\x00")


@requires_native
def test_orient_decode_matches_numpy():
    """nimble_orient_decode vs the NumPy matrix/revcomp/decode chain it
    replaced in bam_fast._prepare_batch — byte parity on ragged rows,
    mixed rev flags, zero-length rows, and the padded tails."""
    rng = np.random.default_rng(11)
    n = 500
    lens = rng.integers(0, 120, n).astype(np.int64)
    lens[rng.random(n) < 0.05] = 0  # empty rows
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = rng.integers(0, 4, int(offs[-1])).astype(np.int8)
    rev = (rng.random(n) < 0.5).astype(np.uint8)
    W = max(int(lens.max()), 1)

    oriented_c, dec_c = native.orient_decode(offs, flat, rev, W)

    # the NumPy chain (verbatim from the pre-C++ _prepare_batch)
    l32 = lens.astype(np.int32)
    mat = np.zeros((n, W), dtype=np.int8)
    valid0 = np.arange(W, dtype=np.int32)[None, :] < l32[:, None]
    mat[valid0] = flat
    ar = np.arange(W, dtype=np.int32)[None, :]
    ridx = np.clip(l32[:, None] - 1 - ar, 0, W - 1)
    idx = np.where(rev.astype(bool)[:, None], ridx, ar)
    om = np.take_along_axis(mat, idx, axis=1)
    valid = ar < l32[:, None]
    oriented_np = np.where(
        rev.astype(bool)[:, None] & valid, 3 - om, np.where(valid, om, 0)
    )
    dec_np = np.frombuffer(b"ACGT", dtype=np.uint8)[oriented_np].tobytes()

    np.testing.assert_array_equal(oriented_c, oriented_np)
    assert dec_c == dec_np
