"""Native parallel BGZF inflater (`nimble_bgzf_inflate`): byte parity with
gzip, chunk-boundary carries, spec'd BSIZE encoding, and gzip fallback."""

import gzip

import pytest

from nimble_tpu import native
from nimble_tpu.io.bam import (
    BamReader,
    BgzfFile,
    _bgzf_block,
    _sniff_bgzf,
    open_bgzf,
)
from nimble_tpu.io.synth import make_synthetic_bam

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _make_bam(path, n_groups=300):
    feats = ["ACGT" * 40, "TTGACCAT" * 22]
    make_synthetic_bam(str(path), feats, n_groups=n_groups,
                       pairs_per_group=3, read_len=60, seed=7)


def test_bgzf_parity_with_gzip(tmp_path):
    bam = tmp_path / "x.bam"
    _make_bam(bam)
    ref = gzip.open(str(bam), "rb").read()
    assert _sniff_bgzf(str(bam))
    assert BgzfFile(str(bam), native).read() == ref


def test_bgzf_small_reads_across_chunk_boundaries(tmp_path):
    bam = tmp_path / "x.bam"
    _make_bam(bam)
    ref = gzip.open(str(bam), "rb").read()
    f = BgzfFile(str(bam), native)
    f._RAW_CHUNK = 1 << 12  # force partial members at every raw chunk edge
    parts, sizes = [], [1, 3, 7, 100, 4096, 13]
    i = 0
    while True:
        b = f.read(sizes[i % len(sizes)])
        i += 1
        if not b:
            break
        parts.append(b)
    assert b"".join(parts) == ref


def test_bsize_field_is_block_size_minus_one():
    # SAM spec 4.1: BSIZE = total block length - 1 (htslib seeks by it)
    block = _bgzf_block(b"hello bgzf")
    xlen = block[10] | (block[11] << 8)
    assert block[12:14] == b"BC"
    bsize = block[16] | (block[17] << 8)
    assert xlen == 6 and bsize == len(block) - 1


def test_plain_gzip_bam_falls_back_and_reads(tmp_path):
    bam = tmp_path / "x.bam"
    _make_bam(bam, n_groups=5)
    plain = tmp_path / "p.bam"
    with gzip.open(str(plain), "wb") as f:
        f.write(gzip.open(str(bam), "rb").read())
    assert not _sniff_bgzf(str(plain))
    assert isinstance(open_bgzf(str(plain)), gzip.GzipFile)
    n_native = sum(1 for _ in BamReader(str(bam)))
    n_plain = sum(1 for _ in BamReader(str(plain)))
    assert n_plain == n_native > 0


def test_mid_stream_garbage_raises_badgzip(tmp_path):
    bam = tmp_path / "x.bam"
    _make_bam(bam, n_groups=50)
    data = bytearray(bam.read_bytes())
    # wreck a later block's gzip magic so the first chunk scan hits it
    second = data.index(b"\x1f\x8b\x08\x04", 4)
    data[second] ^= 0xFF
    bam.write_bytes(bytes(data))
    with pytest.raises((gzip.BadGzipFile, EOFError)):
        BgzfFile(str(bam), native).read()
