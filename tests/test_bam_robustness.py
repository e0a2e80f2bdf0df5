"""Corrupted/truncated-BAM behavior (the role of htslib's validation)."""

import gzip

import numpy as np
import pytest

from nimble_tpu.io.bam import (
    BamReader,
    _BGZF_EOF,
    check_bgzf_eof,
    write_bam,
    BamHeader,
    BamRecord,
)
from nimble_tpu.io.synth import make_synthetic_bam


def _make_bam(path, n_groups=3):
    feats = ["ACGT" * 40, "TTGACCAT" * 22]
    return make_synthetic_bam(str(path), feats, n_groups=n_groups,
                              pairs_per_group=2, read_len=60, seed=0)


def test_eof_marker_present_on_written_bams(tmp_path):
    bam = tmp_path / "x.bam"
    _make_bam(bam)
    assert check_bgzf_eof(str(bam))


def test_missing_eof_marker_warns(tmp_path, capsys):
    bam = tmp_path / "x.bam"
    _make_bam(bam)
    data = bam.read_bytes()
    assert data.endswith(_BGZF_EOF)
    bam.write_bytes(data[: -len(_BGZF_EOF)])
    assert not check_bgzf_eof(str(bam))
    reader = BamReader(str(bam))
    out = capsys.readouterr().out
    assert "EOF marker is absent" in out
    # records before the cut still decode
    assert sum(1 for _ in reader) == 12


def test_truncated_final_block_raises(tmp_path):
    bam = tmp_path / "x.bam"
    _make_bam(bam)
    data = bam.read_bytes()
    # cut inside the last real BGZF block (before the EOF marker)
    bam.write_bytes(data[: len(data) - len(_BGZF_EOF) - 37])
    with pytest.raises(EOFError):
        list(BamReader(str(bam)))


def test_crc_corruption_detected(tmp_path):
    bam = tmp_path / "x.bam"
    _make_bam(bam)
    data = bytearray(bam.read_bytes())
    # flip a payload byte inside the first block (past the gzip header)
    data[60] ^= 0xFF
    bam.write_bytes(bytes(data))
    with pytest.raises(Exception) as exc_info:
        list(BamReader(str(bam)))
    # zlib/gzip surfaces corruption as BadGzipFile/error, never silent data
    assert exc_info.type is not StopIteration


def test_undecodable_record_skipped_by_sorted_reader(tmp_path):
    """A record failing to decode is skipped, mirroring the reference's
    `Err(_) => continue` (`src/parse/sorted_bam_reader.rs:38-43`)."""
    from nimble_tpu.io.sorted_bam import BamTruncated, SortedBamReader

    bam = tmp_path / "x.bam"
    header = BamHeader(text="@HD\tVN:1.6\n", references=[("chr1", 1000)])
    recs = []
    for i, qn in enumerate(["a", "a", "b", "b"]):
        r = BamRecord(qname=qn, flag=0x1 | (0x40 if i % 2 == 0 else 0x80),
                      tid=0, pos=i, mtid=0, mpos=i, seq="ACGTACGT",
                      qual=bytes([30] * 8))
        r.tags["CB"] = ("Z", "CB1-1")
        r.tags["UB"] = ("Z", "CCCCCCCCCC")
        recs.append(r)
    write_bam(str(bam), header, recs)

    reader = SortedBamReader(str(bam), force_bam_paired=True)
    got = []
    while True:
        try:
            got.append(reader.next().qname)
        except BamTruncated:
            break
    assert got == ["a", "a", "b", "b"]
