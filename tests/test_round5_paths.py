"""Round-5 wire/parse paths: pinned parity tests.

Covers the three round-5 exactness-sensitive changes that previously had
only ad-hoc verification:

  1. fused encode+fill FASTQ parse (nimble_fill_matrix_encode) vs the
     two-pass encode_bases_bulk + fill_matrix on adversarial bytes;
  2. uniform-length packed payload (length tail dropped, length baked
     into the executable) vs the tailed payload — bit-identical compact
     results (`models/aligner._launch_series` uniform_len);
  3. geometric tail launches (last sub-launch sized {lb..lb/8} instead
     of zero-padding to a full launch_batch) vs unpadded dispatch.
"""

import gzip
import os
import tempfile

import numpy as np
import pytest

from nimble_tpu import native
from nimble_tpu.config import AlignFilterConfig
from nimble_tpu.index.build import build_index
from nimble_tpu.io.fastq import iter_fastq_matrix_chunks, read_fastq_codes
from nimble_tpu.library import Reference
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.utils.dna import encode_bases, revcomp

requires_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@requires_native
def test_fill_matrix_encode_matches_two_pass():
    """LUT-during-fill must equal encode whole block + memcpy fill for
    every byte value, including lowercase/N/U/high-bit garbage."""
    rng = np.random.default_rng(7)
    # raw block: random bytes incl. every value 0..255 at least once
    raw = bytes(rng.integers(0, 256, size=4096, dtype=np.uint8)) + bytes(
        range(256)
    )
    n = 64
    offsets = np.sort(
        rng.integers(0, len(raw) - 128, size=n).astype(np.int64)
    )
    lens = rng.integers(1, 120, size=n).astype(np.int64)
    W = int(lens.max())

    got = np.zeros((n, W), dtype=np.int8)
    assert native.fill_matrix_encode(raw, offsets, lens, W, out=got)

    codes = native.encode_bases_bulk(raw)
    want = np.zeros((n, W), dtype=np.int8)
    native.fill_matrix(codes, offsets, lens, W, out=want)
    np.testing.assert_array_equal(got, want)

    # and both equal the reference LUT semantics (unknown -> 0)
    for i in range(0, n, 7):
        span = raw[offsets[i] : offsets[i] + lens[i]]
        np.testing.assert_array_equal(
            got[i, : lens[i]], encode_bases(span)
        )


@requires_native
@pytest.mark.parametrize("gz", [False, True])
def test_chunked_parse_matches_per_record_reader(gz):
    """Streaming fused parse == the per-record reader, mixed lengths,
    lowercase and N bases, plain and gzip inputs."""
    rng = np.random.default_rng(11)
    records = []
    for i in range(777):
        L = int(rng.integers(20, 140))
        seq = "".join(rng.choice(list("ACGTacgtN"), size=L))
        records.append(seq)
    body = b"".join(
        b"@r%d some description\n%s\n+\n%s\n"
        % (i, s.encode(), b"I" * len(s))
        for i, s in enumerate(records)
    )
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "mix.fastq" + (".gz" if gz else ""))
        if gz:
            with gzip.open(path, "wb") as f:
                f.write(body)
        else:
            with open(path, "wb") as f:
                f.write(body)
        want = read_fastq_codes(path)
        got = []
        for mat, lens in iter_fastq_matrix_chunks(path, 100):
            for j in range(mat.shape[0]):
                got.append(mat[j, : lens[j]])
    assert len(got) == len(want) == len(records)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def _bench_like_workload(n_reads, read_len=90, uniform=True, seed=3):
    rng = np.random.default_rng(seed)
    feats = ["".join(rng.choice(list("ACGT"), size=400)) for _ in range(8)]
    doubled = [x for s in feats for x in (s, revcomp(s))]
    names = []
    for i in range(len(feats)):
        names += [f"f{i}", f"f{i}§rev"]
    ref = Reference(
        group_on=0, headers=["sequence_name", "sequence"],
        columns=[names, doubled], sequence_name_idx=0, sequence_idx=1,
    )
    cfg = AlignFilterConfig(
        reference_genome_size=len(doubled), score_percent=0.33,
        score_threshold=50, num_mismatches=1, max_hits_to_report=10,
    )
    index = build_index(doubled)
    rows = rng.integers(0, len(doubled), n_reads)
    starts = rng.integers(0, 400 - read_len, n_reads)
    base = np.stack([encode_bases(s) for s in doubled])
    mat = base[rows[:, None], starts[:, None] + np.arange(read_len)]
    mat = np.ascontiguousarray(mat, dtype=np.int8)
    lens = np.full(n_reads, read_len, dtype=np.int32)
    if not uniform:
        cut = rng.integers(40, read_len + 1, n_reads).astype(np.int32)
        lens = cut
        mat = np.where(
            np.arange(read_len)[None, :] < lens[:, None], mat, 0
        ).astype(np.int8)
    return index, cfg, mat, lens


def _compact(engine, mat, lens):
    raw = engine.align_raw_compact_from_matrix(mat, lens)
    return {k: np.asarray(v) for k, v in raw.items()}


@pytest.mark.parametrize("uniform", [True, False])
def test_uniform_len_payload_bit_parity(uniform, monkeypatch):
    """Uniform-length payload (no uint16 tail, static length) must be
    bit-identical to the tailed payload; mixed-length batches must fall
    back to the tailed path and still agree."""
    import nimble_tpu.models.aligner as al

    index, cfg, mat, lens = _bench_like_workload(512, uniform=uniform)
    engine = DeviceAlignEngine(index, cfg)

    monkeypatch.setattr(al, "_UNIFORM_LEN", True)
    on = _compact(engine, mat, lens)
    monkeypatch.setattr(al, "_UNIFORM_LEN", False)
    off = _compact(engine, mat, lens)
    assert on.keys() == off.keys()
    for k in on:
        np.testing.assert_array_equal(on[k], off[k], err_msg=k)


def test_geometric_tail_bit_parity():
    """Padded launches with the geometric tail must equal the unpadded
    engine on a batch that exercises a non-trivial tail (lb + lb/8 + 3
    rows with launch_batch=256 -> sizes [256, 64])."""
    index, cfg, mat, lens = _bench_like_workload(256 + 32 + 3)
    padded = DeviceAlignEngine(index, cfg, launch_batch=256,
                               pad_launches=True)
    plain = DeviceAlignEngine(index, cfg, launch_batch=256,
                              pad_launches=False)
    a = _compact(padded, mat, lens)
    b = _compact(plain, mat, lens)
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
