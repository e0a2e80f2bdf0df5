"""Byte-range sharded FASTQ parsing: the multi-host feed's scaling path
(each host parses only its byte slice; SURVEY.md §2c 'host feed sharded
per-host over input files/record ranges')."""

import numpy as np
import pytest

from nimble_tpu.io.fastq import (
    _fastq_boundary,
    is_gzip,
    read_fastq_matrix,
    read_fastq_matrix_byterange,
)


def _write_fastq(path, seqs, quals=None):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            q = quals[i] if quals else "I" * len(s)
            f.write(f"@r{i} desc\n{s}\n+\n{q}\n")


def _random_seqs(n, rng):
    return ["".join(rng.choice(list("ACGT"), size=int(rng.integers(40, 120))))
            for _ in range(n)]


@pytest.mark.parametrize("n_hosts", [1, 2, 3, 5])
def test_byterange_partition_equals_full(tmp_path, n_hosts):
    rng = np.random.default_rng(0)
    fq = tmp_path / "r.fastq"
    _write_fastq(str(fq), _random_seqs(200, rng))
    full_mat, full_lens = read_fastq_matrix(str(fq))

    import os

    size = os.path.getsize(str(fq))
    mats, lens = [], []
    for h in range(n_hosts):
        m, l = read_fastq_matrix_byterange(
            str(fq), size * h // n_hosts, size * (h + 1) // n_hosts)
        mats.append(m)
        lens.append(l)
    got_lens = np.concatenate(lens)
    assert got_lens.tolist() == full_lens.tolist()
    at = 0
    for m, l in zip(mats, lens):
        for i in range(m.shape[0]):
            row = full_mat[at + i, : full_lens[at + i]]
            assert m[i, : l[i]].tolist() == row.tolist()
        at += m.shape[0]


def test_boundary_at_exact_record_start(tmp_path):
    fq = tmp_path / "r.fastq"
    seqs = ["ACGT" * 12, "TTTTCCCCGGGG", "GATTACA" * 8]
    _write_fastq(str(fq), seqs)
    data = fq.read_bytes()
    # offset of record 1: after record 0's 4 lines
    rec1 = data.index(b"@r1")
    with open(str(fq), "rb") as f:
        assert _fastq_boundary(f, rec1, len(data)) == rec1
        # mid-record offsets snap forward to the next record
        assert _fastq_boundary(f, rec1 + 1, len(data)) == data.index(b"@r2")
        assert _fastq_boundary(f, 1, len(data)) == rec1
        assert _fastq_boundary(f, 0, len(data)) == 0
        assert _fastq_boundary(f, len(data), len(data)) == len(data)


def test_boundary_not_fooled_by_at_sign_quality(tmp_path):
    """A quality line starting with '@' is not a record boundary."""
    fq = tmp_path / "r.fastq"
    seqs = ["ACGTACGTACGT", "CCCCGGGGTTTT"]
    quals = ["@" + "I" * 11, "@@@" + "J" * 9]
    _write_fastq(str(fq), seqs, quals)
    data = fq.read_bytes()
    qual0 = data.index(b"@I")
    with open(str(fq), "rb") as f:
        b = _fastq_boundary(f, qual0, len(data))
    assert b == data.index(b"@r1")
    # partitions stay exact despite the decoy lines
    import os

    size = os.path.getsize(str(fq))
    full_mat, full_lens = read_fastq_matrix(str(fq))
    n0 = read_fastq_matrix_byterange(str(fq), 0, size // 2)[0].shape[0]
    n1 = read_fastq_matrix_byterange(str(fq), size // 2, size)[0].shape[0]
    assert n0 + n1 == full_mat.shape[0] == 2


def test_boundary_final_record_at_sign_quality(tmp_path):
    """A shard boundary inside the FINAL record must snap to EOF even when
    that record's quality line starts with '@' (Phred Q31): two lines after
    a true record start is always the '+' separator, so hitting EOF there
    instead proves the '@' line was quality, not a header."""
    fq = tmp_path / "r.fastq"
    seqs = ["ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"] * 2
    quals = ["I" * 40, "@" + "I" * 39]
    _write_fastq(str(fq), seqs, quals)
    data = fq.read_bytes()
    size = len(data)
    rec1 = data.index(b"@r1")
    with open(str(fq), "rb") as f:
        # every offset inside the final record snaps to EOF, never to the
        # '@...' quality line
        for off in range(rec1 + 1, size + 1):
            assert _fastq_boundary(f, off, size) == size, off
    # partitions with the boundary inside the final record parse cleanly
    # and cover both records exactly once
    full_mat, full_lens = read_fastq_matrix(str(fq))
    for split in (rec1 + 1, size - 3, size - 1):
        parts = [read_fastq_matrix_byterange(str(fq), 0, split),
                 read_fastq_matrix_byterange(str(fq), split, size)]
        assert sum(p[0].shape[0] for p in parts) == full_mat.shape[0]
        got = np.concatenate([p[1] for p in parts])
        assert got.tolist() == full_lens.tolist()


def test_is_gzip(tmp_path):
    import gzip

    plain = tmp_path / "p.fastq"
    _write_fastq(str(plain), ["ACGT" * 10])
    gz = tmp_path / "g.fastq.gz"
    with gzip.open(str(gz), "wb") as f:
        f.write(plain.read_bytes())
    assert not is_gzip(str(plain))
    assert is_gzip(str(gz))
