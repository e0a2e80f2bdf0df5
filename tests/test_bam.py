"""BAM codec, sorted/UMI readers, and the full threaded BAM pipeline."""

import gzip
import json

import numpy as np
import pytest

from nimble_tpu.config import LibraryChemistry
from nimble_tpu.core.calls import HostAlignEngine
from nimble_tpu.index.build import build_index
from nimble_tpu.io.bam import (
    BamHeader,
    BamReader,
    BamRecord,
    FLAG_FIRST_IN_TEMPLATE,
    FLAG_PAIRED,
    FLAG_REVERSE,
    write_bam,
)
from nimble_tpu.io.sorted_bam import BamTruncated, SortedBamReader
from nimble_tpu.io.synth import make_synthetic_bam
from nimble_tpu.io.umi import (
    UMIReader,
    record_metadata,
    strip_nonbio_regions,
    strip_nonbio_regions_qual,
)
from nimble_tpu.library import get_reference_sequence_data, load_reference_library
from nimble_tpu.pipeline import bam_pipeline

from conftest import library_path


# --- codec roundtrip ---

def test_bam_roundtrip(tmp_path):
    recs = [
        BamRecord(
            qname="q1", flag=FLAG_PAIRED | FLAG_FIRST_IN_TEMPLATE,
            tid=0, pos=10, mapq=60, mtid=0, mpos=50, tlen=90,
            seq="ACGTNACGT", qual=bytes([30] * 9),
            cigar_ops=[(9, 0)],
            tags={"CB": ("Z", "AAACCC-1"), "UB": ("Z", "ACGTACGTAC"), "NH": ("i", 1)},
        ),
        BamRecord(qname="q2", flag=FLAG_REVERSE, seq="GGGG", qual=bytes([40] * 4)),
    ]
    path = str(tmp_path / "rt.bam")
    write_bam(path, BamHeader(text="@HD\tVN:1.6\n", references=[("chr1", 1000)]), recs)

    r = BamReader(path)
    assert r.header.references == [("chr1", 1000)]
    got = list(r)
    assert len(got) == 2
    assert got[0].qname == "q1"
    assert got[0].seq == "ACGTNACGT"
    assert got[0].qual == bytes([30] * 9)
    assert got[0].aux_string("CB") == "AAACCC-1"
    assert got[0].aux_string("NH") is None  # int tag: not a Z string
    assert got[0].cigar_string() == "9M"
    assert got[1].is_reverse()


def test_aux_two_byte_resolution(tmp_path):
    """htslib resolves tags by first two bytes (SKIP_ALIGN -> 'SK')."""
    rec = BamRecord(qname="q", seq="AAAA", qual=bytes([40] * 4))
    rec.push_aux("SKIP_ALIGN", "TRUE")
    assert rec.aux_string("SKIP_ALIGN") == "TRUE"
    assert rec.aux_string("SK") == "TRUE"


# --- clip rules (`src/parse/bam.rs:255-287`) ---

def test_strip_nonbio_regions():
    seq124 = "T" * 13 + "A" * 111
    assert strip_nonbio_regions(seq124, False) == "A" * 111
    seq124r = "A" * 111 + "T" * 13
    assert strip_nonbio_regions(seq124r, True) == "A" * 111
    assert strip_nonbio_regions("ACGT", False) == "ACGT"


def test_strip_nonbio_regions_qual():
    q = "".join(chr(30 + (i % 10)) for i in range(124))
    fwd = strip_nonbio_regions_qual(q, False)
    assert fwd == q[13:]
    rev = strip_nonbio_regions_qual(q, True)
    assert rev == q[: 124 - 13][::-1]  # clipped at 3' then reversed
    assert strip_nonbio_regions_qual("abc", True) == "cba"


# --- sorted reader semantics ---

def _tagged(qname, umi, cb, flag=0, seq="ACGT"):
    r = BamRecord(qname=qname, flag=flag, seq=seq, qual=bytes([40] * len(seq)))
    r.tags["CB"] = ("Z", cb)
    r.tags["UB"] = ("Z", umi)
    return r


def test_sorted_reader_dummy_pairs_and_order(tmp_path):
    # one UMI run with a single unpaired read -> dummy twin, dummy first
    recs = [_tagged("r1", "ACGTACGTAC", "CELL01-1")]
    path = str(tmp_path / "s.bam")
    write_bam(path, BamHeader(references=[("chr1", 100)]), recs)
    reader = SortedBamReader(path, force_bam_paired=False)
    first = reader.next()
    second = reader.next()
    assert first.aux_string("SKIP_ALIGN") == "TRUE"    # dummy emitted first
    assert second.aux_string("SKIP_ALIGN") == "FALSE"
    with pytest.raises(BamTruncated):
        reader.next()


def test_sorted_reader_skips(tmp_path):
    recs = [
        _tagged("skip_umi", "AAAAAAAAAA", "CELL01-1"),       # whitelisted UMI
        BamRecord(qname="no_cb", seq="ACGT", qual=bytes([40] * 4),
                  tags={"UB": ("Z", "ACGTACGTAC")}),          # no CB
        _tagged("keep", "ACGTACGTAC", "CELL01-1"),
    ]
    path = str(tmp_path / "s2.bam")
    write_bam(path, BamHeader(references=[("chr1", 100)]), recs)
    reader = SortedBamReader(path, force_bam_paired=False)
    got = [reader.next().qname for _ in range(2)]
    assert got == ["keep", "keep"]  # original + dummy only


def test_force_bam_paired_skips_unpaired(tmp_path):
    recs = [_tagged("u1", "ACGTACGTAC", "CELL01-1", flag=0)]
    path = str(tmp_path / "s3.bam")
    write_bam(path, BamHeader(references=[("chr1", 100)]), recs)
    reader = SortedBamReader(path, force_bam_paired=True)
    with pytest.raises(BamTruncated):
        reader.next()


# --- UMI reader grouping ---

def test_umi_reader_groups(tmp_path):
    lib = json.load(open(library_path("mismatch.json")))
    gene = lib[1]["columns"][3][0]
    path = str(tmp_path / "g.bam")
    make_synthetic_bam(path, [gene], n_groups=3, pairs_per_group=2, seed=1)
    reader = UMIReader(path, terminate_on_error=False, force_bam_paired=False)

    groups = []
    while not reader.next():
        groups.append(
            (list(reader.current_umi_group), list(reader.current_metadata_group))
        )
    # note: final call leaves the LAST group in current_* (the reference's
    # producer drops it; the reader itself exposes it)
    groups.append((list(reader.current_umi_group), list(reader.current_metadata_group)))

    assert len(groups) == 3
    for seqs, metas in groups:
        assert len(seqs) == 4          # 2 pairs
        assert len(metas) == 4
        for m in metas:
            assert len(m) == 38
            assert m[37] == "FALSE"    # all paired -> no dummies
        # R1/R2 interleaved: REVERSE flags alternate false/true
        assert [m[2] for m in metas] == ["false", "true", "false", "true"]


# --- full threaded pipeline ---

def _pipeline_setup(tmp_path, **synth_kwargs):
    cfg, ref = load_reference_library(
        library_path("mismatch.json"), LibraryChemistry.UNSTRANDED
    )
    seqs, _ = get_reference_sequence_data(ref)
    index = build_index(seqs)
    engine = HostAlignEngine(index, cfg)
    gene = ref.columns[3][0]
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(bam, [gene], **synth_kwargs)
    out = str(tmp_path / "out.tsv.gz")
    return cfg, ref, engine, bam, out


def _read_rows(out):
    with gzip.open(out, "rt") as f:
        lines = f.read().splitlines()
    header = lines[0].split("\t")
    rows = [ln.split("\t") for ln in lines[1:]]
    return header, rows


def test_bam_pipeline_end_to_end(tmp_path):
    cfg, ref, engine, bam, out = _pipeline_setup(
        tmp_path, n_groups=3, pairs_per_group=2, seed=2
    )
    bam_pipeline.process([bam], [engine], [ref], [cfg], [out], 2, False)

    header, rows = _read_rows(out)
    assert header[0] == "nimble_features"
    assert header[1] == "nimble_score"
    assert header[2] == "r1_QNAME"
    assert "r1_QUAL" not in header and "r1_SEQ" not in header
    assert header[-1] == "aligndirection"
    # 36+36+2+10 columns
    assert len(header) == 84

    # parity quirk: the final UMI group is dropped -> rows only for 2 groups
    # each group: one aggregated (gene,2) row + one zero row for the
    # first pair (scored_qnames only remembers the last pair's qname)
    feature_rows = [r for r in rows if r[0] == "gene"]
    zero_rows = [r for r in rows if r[0] == ""]
    assert len(feature_rows) == 2
    assert all(r[1] == "2" for r in feature_rows)
    assert len(zero_rows) == 2
    assert all(r[1] == "0" for r in zero_rows)
    for r in rows:
        assert len(r) == 84


def test_bam_pipeline_no_quirks_keeps_final_group(tmp_path):
    cfg, ref, engine, bam, out = _pipeline_setup(
        tmp_path, n_groups=3, pairs_per_group=2, seed=2
    )
    bam_pipeline.process(
        [bam], [engine], [ref], [cfg], [out], 2, False, parity_quirks=False
    )
    _, rows = _read_rows(out)
    feature_rows = [r for r in rows if r[0] == "gene"]
    assert len(feature_rows) == 3  # all 3 groups present


def test_bam_pipeline_unpaired_dummy_path(tmp_path):
    cfg, ref, engine, bam, out = _pipeline_setup(
        tmp_path, n_groups=2, pairs_per_group=0, unpaired_per_group=1, seed=3
    )
    bam_pipeline.process([bam], [engine], [ref], [cfg], [out], 2, False)
    _, rows = _read_rows(out)
    # first group only (parity quirk drops the last); unpaired read aligns as
    # the real mate of a dummy pair -> called feature with count 1
    feature_rows = [r for r in rows if r[0] == "gene"]
    assert len(feature_rows) == 1
    assert feature_rows[0][1] == "1"


def test_bam_pipeline_clip_124(tmp_path):
    cfg, ref, engine, bam, out = _pipeline_setup(
        tmp_path, n_groups=2, pairs_per_group=1, read_len=111,
        pad_to_124=True, seed=4,
    )
    bam_pipeline.process([bam], [engine], [ref], [cfg], [out], 2, False)
    _, rows = _read_rows(out)
    feature_rows = [r for r in rows if r[0] == "gene"]
    assert len(feature_rows) == 1  # clipped reads still align cleanly


def test_native_reader_matches_python_reader(tmp_path):
    """The C++ batch scanner must produce identical records to the Python
    per-record decoder."""
    lib = json.load(open(library_path("mismatch.json")))
    gene = lib[1]["columns"][3][0]
    path = str(tmp_path / "cmp.bam")
    make_synthetic_bam(path, [gene], n_groups=4, pairs_per_group=3,
                       unpaired_per_group=1, seed=9, pad_to_124=True,
                       read_len=111)
    from nimble_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    fast = list(BamReader(path, use_native=True))
    slow = list(BamReader(path, use_native=False))
    assert len(fast) == len(slow) and len(fast) > 0
    for a, b in zip(fast, slow):
        assert a.qname == b.qname
        assert a.flag == b.flag
        assert (a.tid, a.pos, a.mapq, a.mtid, a.mpos, a.tlen) == (
            b.tid, b.pos, b.mapq, b.mtid, b.mpos, b.tlen)
        assert a.seq == b.seq
        assert a.qual == b.qual
        assert a.cigar_ops == b.cigar_ops
        # Z tags identical (native surfaces only Z/H, which is all the
        # pipeline consumes)
        z_a = {k: v for k, v in a.tags.items() if v[0] == "Z"}
        z_b = {k: v for k, v in b.tags.items() if v[0] == "Z"}
        assert z_a == z_b
