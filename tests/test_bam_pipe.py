"""Native BamPipe producer vs pure-Python ColumnarGroupStream parity.

The C++ pipe (`native/nimble_host.cpp` BamPipe) re-implements the columnar
producer front half on a dedicated GIL-free worker thread; this harness
pins it against the pure-Python orchestration at the STREAM level — every
emitted batch column, group boundary, progress/warning print, terminal
error and final-group verdict must match exactly, across regular,
irregular, truncating and fatally-broken streams.
"""

import contextlib
import io

import numpy as np
import pytest

from nimble_tpu import native
from nimble_tpu.io.bam import BamHeader, BamRecord, write_bam
from nimble_tpu.io.bam_columnar import ColumnarGroupStream
from nimble_tpu.io.synth import make_synthetic_bam

requires_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)

FEATS = [
    "ACGTACGGATCCTTAGCAGTACCGATGGCATCAGGCTTACAGATTCCGGATACCGTTAGGCATCAGAT",
    "TTGACCGGTTAACCGGATCCAGTACCATGGCCTTAGACATCCGGTAACCGATTCCAGGATCCATGACA",
]


def _col_bytes(col):
    return (np.diff(col.offs).tolist(), col.flat.tobytes())


def _run(path, force_paired, target, monkeypatch, no_pipe):
    if no_pipe:
        monkeypatch.delenv("NIMBLE_BAM_PIPE", raising=False)
    else:
        monkeypatch.setenv("NIMBLE_BAM_PIPE", "1")
    batches = []
    err = None
    with contextlib.redirect_stdout(io.StringIO()) as cap:
        stream = ColumnarGroupStream(path, force_paired)
        if not no_pipe:
            assert stream._pipe is not None, "pipe did not engage"
        try:
            for b in stream.batches(target_records=target):
                batches.append(b)
        except Exception as e:  # noqa: BLE001 — error parity is asserted
            err = e
    return stream, batches, err, cap.getvalue()


def _assert_parity(path, monkeypatch, force_paired=False, target=16384):
    s_pipe, b_pipe, e_pipe, out_pipe = _run(
        path, force_paired, target, monkeypatch, no_pipe=False)
    s_pure, b_pure, e_pure, out_pure = _run(
        path, force_paired, target, monkeypatch, no_pipe=True)
    assert out_pipe == out_pure
    assert repr(e_pipe) == repr(e_pure)
    assert s_pipe.read_counter == s_pure.read_counter
    assert s_pipe.final_open_group_pending == s_pure.final_open_group_pending
    assert len(b_pipe) == len(b_pure)
    for bp, bq in zip(b_pipe, b_pure):
        assert bp.group_off.tolist() == bq.group_off.tolist()
        np.testing.assert_array_equal(bp.skip_true, bq.skip_true)
        for name in ("meta", "skipb", "qual", "rev2", "seq15", "qn", "seq"):
            assert _col_bytes(getattr(bp, name)) == _col_bytes(
                getattr(bq, name)), f"column {name} diverged"
    return b_pipe


def _rec(qname, flag, seq, cb=b"CBX00001-1", ub=b"CCCCCCCCCC"):
    r = BamRecord(qname=qname, flag=flag, tid=0, pos=1, mtid=0, mpos=1,
                  seq=seq, qual=bytes([35] * len(seq)))
    if cb is not None:
        r.tags["CB"] = ("Z", cb.decode())
    if ub is not None:
        r.tags["UB"] = ("Z", ub.decode())
    return r


_HDR = BamHeader(text="@HD\tVN:1.6\n", references=[("chr1", 100000)])


def _frag(rng, n=60):
    f = FEATS[int(rng.integers(0, len(FEATS)))]
    s = int(rng.integers(0, len(f) - n))
    return f[s : s + n]


@requires_native
@pytest.mark.parametrize("force_paired", [False, True])
def test_pipe_regular_stream(tmp_path, monkeypatch, force_paired):
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(bam, FEATS, n_groups=7, pairs_per_group=3,
                       read_len=64, unpaired_per_group=1, seed=5)
    batches = _assert_parity(bam, monkeypatch, force_paired=force_paired)
    assert sum(b.n_groups for b in batches) >= 6


@requires_native
def test_pipe_small_batches(tmp_path, monkeypatch):
    """Tiny target_records exercises the pend flush boundaries."""
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(bam, FEATS, n_groups=12, pairs_per_group=2,
                       read_len=64, seed=9)
    batches = _assert_parity(bam, monkeypatch, target=4)
    assert len(batches) >= 2


@requires_native
def test_pipe_irregular_qnames_carry(tmp_path, monkeypatch):
    """A paired-flagged orphan inside a populated run drops to the Python
    fallback via the pipe's carry handoff; warnings + resume must match."""
    rng = np.random.default_rng(3)
    recs = []
    for i in range(2):
        q = f"p{i}"
        recs.append(_rec(q, 0x1 | 0x40, _frag(rng)))
        recs.append(_rec(q, 0x1 | 0x80 | 0x10, _frag(rng)))
    recs.append(_rec("orphan", 0x1 | 0x40, _frag(rng)))
    recs.append(_rec("p9", 0x1 | 0x40, _frag(rng)))
    recs.append(_rec("p9", 0x1 | 0x80 | 0x10, _frag(rng)))
    # second + third groups so emission resumes after the carry
    for g, umi in ((1, b"GGGGGGGGGG"), (2, b"TTTTTTTTTT")):
        for i in range(2):
            q = f"z{g}{i}"
            recs.append(_rec(q, 0x1 | 0x40, _frag(rng), ub=umi))
            recs.append(_rec(q, 0x1 | 0x80 | 0x10, _frag(rng), ub=umi))
    bam = str(tmp_path / "in.bam")
    write_bam(bam, _HDR, recs)
    s_pipe, _, _, out = _run(bam, False, 16384, monkeypatch, no_pipe=False)
    assert "Warning: Unpaired qname!" in out
    _assert_parity(bam, monkeypatch)


@requires_native
def test_pipe_missing_umi_fatal(tmp_path, monkeypatch):
    """A CB-bearing record with no UB/UR is the reference's fatal
    could-not-read-UMI error; prefix groups still flush first."""
    rng = np.random.default_rng(4)
    recs = []
    for g, umi in ((0, b"CCCCCCCCCC"), (1, b"GGGGGGGGGG")):
        for i in range(2):
            q = f"g{g}x{i}"
            recs.append(_rec(q, 0x1 | 0x40, _frag(rng), ub=umi))
            recs.append(_rec(q, 0x1 | 0x80 | 0x10, _frag(rng), ub=umi))
    recs.append(_rec("bad", 0x1 | 0x40, _frag(rng), ub=None))
    recs.append(_rec("t0", 0x1 | 0x40, _frag(rng), ub=b"TTTTTTTTTT"))
    recs.append(_rec("t0", 0x1 | 0x80 | 0x10, _frag(rng), ub=b"TTTTTTTTTT"))
    bam = str(tmp_path / "in.bam")
    write_bam(bam, _HDR, recs)
    _, _, err, _ = _run(bam, False, 16384, monkeypatch, no_pipe=False)
    assert isinstance(err, ValueError)
    _assert_parity(bam, monkeypatch)


@requires_native
def test_pipe_leading_orphan_free_pass(tmp_path, monkeypatch):
    """An all-orphan FIRST run consumes the producer's one free pass
    (`src/process/bam.rs:163-179`) — the stream continues."""
    rng = np.random.default_rng(6)
    recs = [_rec("lonely", 0x1 | 0x40, _frag(rng), ub=b"AACCGGTTAA")]
    for g, umi in ((0, b"CCCCCCCCCC"), (1, b"GGGGGGGGGG")):
        for i in range(2):
            q = f"g{g}x{i}"
            recs.append(_rec(q, 0x1 | 0x40, _frag(rng), ub=umi))
            recs.append(_rec(q, 0x1 | 0x80 | 0x10, _frag(rng), ub=umi))
    bam = str(tmp_path / "in.bam")
    write_bam(bam, _HDR, recs)
    batches = _assert_parity(bam, monkeypatch)
    assert sum(b.n_groups for b in batches) >= 1


@requires_native
def test_pipe_orphan_run_truncates(tmp_path, monkeypatch):
    """An all-orphan run AFTER a delivered group ends the stream (the
    fuzz-found BamTruncatedRecord semantics); trailing groups are never
    read."""
    rng = np.random.default_rng(7)
    recs = []
    for g, umi in ((0, b"CCCCCCCCCC"), (1, b"GGGGGGGGGG")):
        for i in range(2):
            q = f"g{g}x{i}"
            recs.append(_rec(q, 0x1 | 0x40, _frag(rng), ub=umi))
            recs.append(_rec(q, 0x1 | 0x80 | 0x10, _frag(rng), ub=umi))
    recs.append(_rec("lonely", 0x1 | 0x40, _frag(rng), ub=b"AACCGGTTAA"))
    for i in range(2):
        q = f"tail{i}"
        recs.append(_rec(q, 0x1 | 0x40, _frag(rng), ub=b"TTTTTTTTTT"))
        recs.append(_rec(q, 0x1 | 0x80 | 0x10, _frag(rng), ub=b"TTTTTTTTTT"))
    bam = str(tmp_path / "in.bam")
    write_bam(bam, _HDR, recs)
    _assert_parity(bam, monkeypatch)


@requires_native
def test_pipe_truncated_bam_raises(tmp_path, monkeypatch):
    """A stream ending mid-record raises EOFError from both paths."""
    import gzip as _gzip

    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(bam, FEATS, n_groups=3, pairs_per_group=2,
                       read_len=64, seed=8)
    with open(bam, "rb") as f:
        raw = f.read()
    # chop the DECOMPRESSED payload mid-record and rebuild a clean BGZF
    # (EOF marker intact, so only the record truncation is abnormal)
    from nimble_tpu.io.bam import _BGZF_EOF, _bgzf_block

    with _gzip.open(io.BytesIO(raw), "rb") as f:
        payload = f.read()
    payload = payload[:-7]
    with open(bam, "wb") as f:
        for i in range(0, len(payload), 60000):
            f.write(_bgzf_block(payload[i : i + 60000]))
        f.write(_BGZF_EOF)
    _, _, err, _ = _run(bam, False, 16384, monkeypatch, no_pipe=False)
    assert isinstance(err, EOFError)
    _assert_parity(bam, monkeypatch)


@requires_native
def test_pipe_single_group(tmp_path, monkeypatch):
    """Single-group stream: the dropped-final-group bookkeeping."""
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(bam, FEATS, n_groups=1, pairs_per_group=4,
                       read_len=64, seed=10)
    _assert_parity(bam, monkeypatch)


@requires_native
def test_pipe_124bp_clip(tmp_path, monkeypatch):
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(bam, FEATS, n_groups=4, pairs_per_group=2,
                       read_len=111, pad_to_124=True, seed=11)
    _assert_parity(bam, monkeypatch)
