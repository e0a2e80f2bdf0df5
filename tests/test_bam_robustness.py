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


def _orphan_run_bam(path):
    """Groups g0, g1, then a UMI run holding ONLY a paired-flag orphan
    (mate never written), then two more groups.  The reference stream
    TERMINATES at the orphan run: SortedBamReader::next refills once and
    returns BamTruncatedRecord on an empty post-filter buffer
    (`src/parse/sorted_bam_reader.rs:164-185`), so g3/g4 are never read
    and (quirks) g1 becomes the dropped final group."""
    from nimble_tpu.io.bam import (
        FLAG_FIRST_IN_TEMPLATE,
        FLAG_LAST_IN_TEMPLATE,
        FLAG_PAIRED,
    )

    # NB not "ACGT"*n — that is its own revcomp, and a read hitting both
    # orientations of a feature is dropped by the orientation filter
    feats = ["TTGACCAT" * 22, "GATTACCA" * 22]
    records = []
    qn = 0

    def pair(umi, cb, frag):
        nonlocal qn
        r1 = BamRecord(qname=f"q{qn}", flag=FLAG_PAIRED | FLAG_FIRST_IN_TEMPLATE,
                       pos=100, mpos=200, tlen=150, seq=frag,
                       qual=bytes([40] * len(frag)), tid=0, mtid=0, mapq=60)
        r2 = BamRecord(qname=f"q{qn}", flag=FLAG_PAIRED | FLAG_LAST_IN_TEMPLATE,
                       pos=200, mpos=100, tlen=-150, seq=frag,
                       qual=bytes([40] * len(frag)), tid=0, mtid=0, mapq=60)
        qn += 1
        for r in (r1, r2):
            r.tags["CB"] = ("Z", cb)
            r.tags["UB"] = ("Z", umi)
        return [r1, r2]

    records += pair("CCCCCCCCCC", "CB0-1", feats[0][:60])
    records += pair("GGGGGGGGGG", "CB0-1", feats[1][:60])
    orphan = pair("TTTTTTTTTT", "CB0-1", feats[0][10:70])[0]  # r1 only
    records.append(orphan)
    records += pair("ACACACACAC", "CB0-1", feats[0][20:80])
    records += pair("TGTGTGTGTG", "CB0-1", feats[1][30:90])
    header = BamHeader(text="@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000000\n",
                       references=[("chr1", 1_000_000)])
    write_bam(str(path), header, records)


@pytest.mark.parametrize("quirks", [True, False])
def test_all_orphan_run_terminates_stream(tmp_path, quirks):
    """Fuzz-found (fuzz_bam.py seed 5 trial 40): the fast columnar path
    kept reading past an all-orphan UMI run; the reference ends there."""
    import contextlib
    import io as _io

    import jax

    jax.config.update("jax_platforms", "cpu")
    from nimble_tpu.config import AlignFilterConfig
    from nimble_tpu.index.build import build_index
    from nimble_tpu.library import Reference
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.pipeline import bam_pipeline
    from nimble_tpu.pipeline.bam_fast import process_fast
    from nimble_tpu.utils.dna import revcomp

    bam = tmp_path / "orphan_run.bam"
    _orphan_run_bam(bam)
    feats = ["TTGACCAT" * 22, "GATTACCA" * 22]
    doubled = [x for f in feats for x in (f, revcomp(f))]
    ref = Reference(group_on=0, headers=["sequence_name", "sequence"],
                    columns=[["f0", "f0§rev", "f1", "f1§rev"], doubled],
                    sequence_name_idx=0, sequence_idx=1)
    cfg = AlignFilterConfig(reference_genome_size=4, score_percent=0.33,
                            score_threshold=40, num_mismatches=1,
                            max_hits_to_report=10)
    engine = DeviceAlignEngine(build_index(doubled), cfg)
    outs = []
    for name, fn in (("fast", process_fast), ("slow", bam_pipeline.process)):
        out = str(tmp_path / f"{name}.tsv.gz")
        with contextlib.redirect_stdout(_io.StringIO()):
            fn([str(bam)], [engine], [ref], [cfg], [out], 2, False,
               parity_quirks=quirks)
        outs.append(gzip.open(out, "rb").read())
    assert outs[0] == outs[1]
    qnames = {r.split(b"\t")[2] for r in outs[0].splitlines()[1:]}
    # groups after the orphan run (q3, q4) must NOT appear; with quirks the
    # final surfaced group before termination (q1) is dropped too
    assert b"q3" not in qnames and b"q4" not in qnames
    assert (b"q1" not in qnames) == quirks
    assert b"q0" in qnames


@pytest.mark.parametrize("quirks", [True, False])
def test_leading_orphan_run_consumes_free_pass(tmp_path, quirks):
    """An empty post-filter run BEFORE any delivered group does NOT end the
    stream: the reference producer's has_aligned is still False on
    iteration 1, so it sends the (empty) current group and keeps reading
    (`src/process/bam.rs:163-179`); only a LATER empty run breaks.
    Fuzz-found (fuzz_bam.py seed 77 trial 178)."""
    import contextlib
    import io as _io

    import jax

    jax.config.update("jax_platforms", "cpu")
    from nimble_tpu.config import AlignFilterConfig
    from nimble_tpu.index.build import build_index
    from nimble_tpu.io.bam import (
        FLAG_FIRST_IN_TEMPLATE,
        FLAG_LAST_IN_TEMPLATE,
        FLAG_PAIRED,
    )
    from nimble_tpu.library import Reference
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.pipeline import bam_pipeline
    from nimble_tpu.pipeline.bam_fast import process_fast
    from nimble_tpu.utils.dna import revcomp

    feats = ["TTGACCAT" * 22, "GATTACCA" * 22]
    records, qn = [], 0

    def pair(umi, frag, orphan=False):
        nonlocal qn
        r1 = BamRecord(qname=f"q{qn}", flag=FLAG_PAIRED | FLAG_FIRST_IN_TEMPLATE,
                       pos=100, mpos=200, tlen=150, seq=frag,
                       qual=bytes([40] * len(frag)), tid=0, mtid=0, mapq=60)
        r2 = BamRecord(qname=f"q{qn}", flag=FLAG_PAIRED | FLAG_LAST_IN_TEMPLATE,
                       pos=200, mpos=100, tlen=-150, seq=frag,
                       qual=bytes([40] * len(frag)), tid=0, mtid=0, mapq=60)
        qn += 1
        out = [r1] if orphan else [r1, r2]
        for r in out:
            r.tags["CB"] = ("Z", "CB0-1")
            r.tags["UB"] = ("Z", umi)
        return out

    # stream STARTS with an all-orphan run, then three normal groups
    records += pair("TTTTTTTTTT", feats[0][10:70], orphan=True)
    records += pair("CCCCCCCCCC", feats[0][:60])
    records += pair("GGGGGGGGGG", feats[1][:60])
    records += pair("ACACACACAC", feats[1][24:84])
    header = BamHeader(text="@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000000\n",
                       references=[("chr1", 1_000_000)])
    bam = tmp_path / "lead_orphan.bam"
    write_bam(str(bam), header, records)

    doubled = [x for f in feats for x in (f, revcomp(f))]
    ref = Reference(group_on=0, headers=["sequence_name", "sequence"],
                    columns=[["f0", "f0§rev", "f1", "f1§rev"], doubled],
                    sequence_name_idx=0, sequence_idx=1)
    cfg = AlignFilterConfig(reference_genome_size=4, score_percent=0.33,
                            score_threshold=40, num_mismatches=1,
                            max_hits_to_report=10)
    engine = DeviceAlignEngine(build_index(doubled), cfg)
    outs = []
    for name, fn in (("fast", process_fast), ("slow", bam_pipeline.process)):
        out = str(tmp_path / f"{name}.tsv.gz")
        with contextlib.redirect_stdout(_io.StringIO()):
            fn([str(bam)], [engine], [ref], [cfg], [out], 2, False,
               parity_quirks=quirks)
        outs.append(gzip.open(out, "rb").read())
    assert outs[0] == outs[1]
    qnames = {r.split(b"\t")[2] for r in outs[0].splitlines()[1:]}
    # the stream continued past the leading orphan run: q1/q2 present
    assert b"q1" in qnames and b"q2" in qnames
    # with quirks the final group (q3) is dropped
    assert (b"q3" not in qnames) == quirks


def _fast_slow_outputs(tmp_path, records, quirks):
    """Run both pipelines on a record stream; returns [(err, bytes), ...]."""
    import contextlib
    import io as _io

    import jax

    jax.config.update("jax_platforms", "cpu")
    from nimble_tpu.config import AlignFilterConfig
    from nimble_tpu.index.build import build_index
    from nimble_tpu.library import Reference
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.pipeline import bam_pipeline
    from nimble_tpu.pipeline.bam_fast import process_fast
    from nimble_tpu.utils.dna import revcomp

    feats = ["TTGACCAT" * 22, "GATTACCA" * 22]
    doubled = [x for f in feats for x in (f, revcomp(f))]
    ref = Reference(group_on=0, headers=["sequence_name", "sequence"],
                    columns=[["f0", "f0§rev", "f1", "f1§rev"], doubled],
                    sequence_name_idx=0, sequence_idx=1)
    cfg = AlignFilterConfig(reference_genome_size=4, score_percent=0.33,
                            score_threshold=40, num_mismatches=1,
                            max_hits_to_report=10)
    engine = DeviceAlignEngine(build_index(doubled), cfg)
    bam = str(tmp_path / "stream.bam")
    header = BamHeader(text="@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000000\n",
                       references=[("chr1", 1_000_000)])
    write_bam(bam, header, records)
    outs = []
    for name, fn in (("fast", process_fast), ("slow", bam_pipeline.process)):
        out = str(tmp_path / f"{name}{quirks}.tsv.gz")
        err = ""
        try:
            with contextlib.redirect_stdout(_io.StringIO()):
                fn([bam], [engine], [ref], [cfg], [out], 2, False,
                   parity_quirks=quirks)
        except Exception as e:
            err = f"{type(e).__name__}: {e}"
        try:
            body = gzip.open(out, "rb").read()
        except Exception:
            body = b""
        outs.append((err, body))
    return outs


def _mk_pair(qn, umi, frag, orphan=False, no_umi=False):
    from nimble_tpu.io.bam import (
        FLAG_FIRST_IN_TEMPLATE,
        FLAG_LAST_IN_TEMPLATE,
        FLAG_PAIRED,
    )

    r1 = BamRecord(qname=f"q{qn}", flag=FLAG_PAIRED | FLAG_FIRST_IN_TEMPLATE,
                   pos=100, mpos=200, tlen=150, seq=frag,
                   qual=bytes([40] * len(frag)), tid=0, mtid=0, mapq=60)
    r2 = BamRecord(qname=f"q{qn}", flag=FLAG_PAIRED | FLAG_LAST_IN_TEMPLATE,
                   pos=200, mpos=100, tlen=-150, seq=frag,
                   qual=bytes([40] * len(frag)), tid=0, mtid=0, mapq=60)
    out = [r1] if orphan else [r1, r2]
    for r in out:
        r.tags["CB"] = ("Z", "CB0-1")
        if not no_umi:
            r.tags["UB"] = ("Z", umi)
    return out


@pytest.mark.parametrize("quirks", [True, False])
def test_free_pass_then_single_group_quirk(tmp_path, quirks):
    """Leading orphan run + ONE group + EOF: the free pass flips
    has_aligned, so with quirks the single group IS dropped at EOF (the
    single-group exemption must not apply)."""
    f0 = "TTGACCAT" * 22
    records = (_mk_pair(0, "TTTTTTTTTT", f0[10:70], orphan=True)
               + _mk_pair(1, "CCCCCCCCCC", f0[:60]))
    fast, slow = _fast_slow_outputs(tmp_path, records, quirks)
    assert fast == slow
    qnames = {r.split(b"\t")[2] for r in fast[1].splitlines()[1:]}
    assert (b"q1" not in qnames) == quirks


@pytest.mark.parametrize("quirks", [True, False])
def test_free_pass_delivered_group_survives_error(tmp_path, quirks):
    """Group A + orphan run (free pass delivers A) + a record with no UMI:
    the fatal error must not drop what the free pass already delivered;
    both pipelines raise the same error with identical bytes."""
    f0, f1 = "TTGACCAT" * 22, "GATTACCA" * 22
    records = (_mk_pair(0, "CCCCCCCCCC", f0[:60])
               + _mk_pair(1, "TTTTTTTTTT", f0[10:70], orphan=True)
               + _mk_pair(2, "GGGGGGGGGG", f1[:60], no_umi=True))
    fast, slow = _fast_slow_outputs(tmp_path, records, quirks)
    assert fast == slow
    assert "Could not read UMI" in fast[0]
