"""rust-htslib ``read_pair_orientation`` parity (`src/parse/bam.rs:214`).

The reference renders rust-htslib 0.40's ``Record::read_pair_orientation``
(bio-types ``SequenceReadPairOrientation`` Display) into the forensic
``PAIR_ORIENTATION`` column.  Pinned semantics: paired + both mates mapped
to the same contig required; mates starting at the SAME position are
undecidable -> "None"; otherwise the leftmost mate's (strand, template-role)
label leads — e.g. F1R2 = read 1 forward at the lower coordinate, read 2
reverse.  These tests pin the Python model (`nimble_tpu/io/bam.py`) and the
duplicated C++ columnar implementation (`native/nimble_host.cpp`) against
each other and against the derivation.
"""

import contextlib
import gzip
import io

import numpy as np
import pytest

from nimble_tpu import native
from nimble_tpu.config import AlignFilterConfig
from nimble_tpu.core.calls import HostAlignEngine
from nimble_tpu.index.build import build_index
from nimble_tpu.io.bam import (
    FLAG_FIRST_IN_TEMPLATE,
    FLAG_LAST_IN_TEMPLATE,
    FLAG_MATE_REVERSE,
    FLAG_MATE_UNMAPPED,
    FLAG_PAIRED,
    FLAG_REVERSE,
    FLAG_UNMAPPED,
    BamHeader,
    BamRecord,
    write_bam,
)
from nimble_tpu.library import Reference
from nimble_tpu.utils.dna import revcomp


def _rec(flag, pos, mpos, tid=0, mtid=0):
    return BamRecord(qname="q", flag=flag, pos=pos, mpos=mpos,
                     tid=tid, mtid=mtid, seq="ACGT", qual=bytes([40] * 4))


P1 = FLAG_PAIRED | FLAG_FIRST_IN_TEMPLATE
P2 = FLAG_PAIRED | FLAG_LAST_IN_TEMPLATE


def test_orientation_requires_pairing_and_mapping():
    assert _rec(0, 10, 20).read_pair_orientation() == "None"
    assert _rec(P1 | FLAG_UNMAPPED, 10, 20).read_pair_orientation() == "None"
    assert _rec(P1 | FLAG_MATE_UNMAPPED, 10, 20).read_pair_orientation() == "None"
    assert _rec(P1, 10, 20, tid=0, mtid=1).read_pair_orientation() == "None"


def test_orientation_same_start_is_undecidable():
    # rust-htslib: mates starting at the same position -> None
    assert _rec(P1, 10, 10).read_pair_orientation() == "None"
    assert _rec(P2 | FLAG_REVERSE, 10, 10).read_pair_orientation() == "None"


@pytest.mark.parametrize(
    "flag,pos,mpos,expected",
    [
        # self = read1 leftmost
        (P1 | FLAG_MATE_REVERSE, 10, 20, "F1R2"),
        (P1, 10, 20, "F1F2"),
        (P1 | FLAG_REVERSE, 10, 20, "R1F2"),
        (P1 | FLAG_REVERSE | FLAG_MATE_REVERSE, 10, 20, "R1R2"),
        # self = read1 rightmost: mate (read2) label leads
        (P1 | FLAG_MATE_REVERSE, 20, 10, "R2F1"),
        (P1, 20, 10, "F2F1"),
        (P1 | FLAG_REVERSE, 20, 10, "F2R1"),
        (P1 | FLAG_REVERSE | FLAG_MATE_REVERSE, 20, 10, "R2R1"),
        # self = read2 views of the same fragments
        (P2 | FLAG_REVERSE, 20, 10, "F1R2"),
        (P2 | FLAG_MATE_REVERSE, 10, 20, "F2R1"),
    ],
)
def test_orientation_labels(flag, pos, mpos, expected):
    assert _rec(flag, pos, mpos).read_pair_orientation() == expected


# --- C++ columnar implementation agrees with the Python model -------------

@pytest.mark.skipif(not native.available(), reason="native library required")
def test_columnar_orientation_matches_python(tmp_path):
    """A BAM with tie-position and reversed-coordinate pairs produces
    byte-identical forensic TSVs via the slow (Python BamRecord) and fast
    (C++ nimble_bam_meta) pipelines, with 'None' for the tie pair."""
    from nimble_tpu.pipeline import bam_pipeline
    from nimble_tpu.pipeline.bam_fast import process_fast

    rng = np.random.default_rng(7)
    feats = ["".join(rng.choice(list("ACGT"), size=220)) for _ in range(4)]
    doubled = [x for s in feats for x in (s, revcomp(s))]
    names = [n for i in range(4) for n in (f"feat{i}", f"feat{i}§rev")]
    reference = Reference(
        group_on=0, headers=["sequence_name", "sequence"],
        columns=[names, doubled], sequence_name_idx=0, sequence_idx=1,
    )
    index = build_index(doubled)
    cfg = AlignFilterConfig(
        reference_genome_size=8, score_threshold=30, score_percent=0.25,
        num_mismatches=1, max_hits_to_report=10,
    )

    records = []
    # three pairs in one UMI group: tie-position, normal, coordinate-swapped
    geometries = [(150, 150), (100, 200), (260, 40)]
    for p, (pos1, pos2) in enumerate(geometries):
        qname = f"tie{p:03d}"
        frag1 = feats[p % 4][20:90]
        frag2 = feats[p % 4][40:110]
        r1 = BamRecord(
            qname=qname, flag=P1 | FLAG_MATE_REVERSE,
            pos=pos1, mpos=pos2, tid=0, mtid=0, mapq=60, tlen=150,
            seq=frag1, qual=bytes([40] * len(frag1)),
        )
        r2 = BamRecord(
            qname=qname, flag=P2 | FLAG_REVERSE,
            pos=pos2, mpos=pos1, tid=0, mtid=0, mapq=60, tlen=-150,
            seq=frag2, qual=bytes([40] * len(frag2)),
        )
        for r in (r1, r2):
            r.tags["CB"] = ("Z", "CBTIE00-1")
            r.tags["UB"] = ("Z", "ACGTACGTAC")
        records.extend([r1, r2])
    header = BamHeader(
        text="@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:chr1\tLN:1000000\n",
        references=[("chr1", 1_000_000)],
    )
    bam = str(tmp_path / "tie.bam")
    write_bam(bam, header, records)

    from nimble_tpu.models.aligner import DeviceAlignEngine

    host_engine = HostAlignEngine(index, cfg)
    dev_engine = DeviceAlignEngine(index, cfg)
    slow_out = str(tmp_path / "slow.tsv.gz")
    fast_out = str(tmp_path / "fast.tsv.gz")
    with contextlib.redirect_stdout(io.StringIO()):
        bam_pipeline.process(
            [bam], [host_engine], [reference], [cfg], [slow_out], 2, False,
            parity_quirks=False,
        )
        process_fast(
            [bam], [dev_engine], [reference], [cfg], [fast_out], 2, False,
            parity_quirks=False,
        )
    slow = gzip.open(slow_out, "rb").read()
    fast = gzip.open(fast_out, "rb").read()
    assert slow == fast

    header_cols = slow.decode().splitlines()[0].split("\t")
    ori_idx = header_cols.index("r1_PAIR_ORIENTATION")
    oris = {
        line.split("\t")[0 if False else ori_idx]
        for line in slow.decode().splitlines()[1:]
        if line
    }
    # tie pair -> None; (100,200) -> F1R2; (260,40) -> R2F1 (read2 leftmost)
    assert "None" in oris
    assert "F1R2" in oris
    assert "R2F1" in oris
