"""Edge cases: empty inputs, paired FASTQ via CLI, tiny libraries."""

import gzip

import numpy as np
import pytest

from nimble_tpu.cli import main
from nimble_tpu.config import AlignFilterConfig, LibraryChemistry
from nimble_tpu.core.calls import HostAlignEngine
from nimble_tpu.core.fast_count import fast_count_calls
from nimble_tpu.index.build import build_index
from nimble_tpu.io.bam import BamHeader, write_bam
from nimble_tpu.library import Reference, get_reference_sequence_data, load_reference_library
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.pipeline import bam_pipeline

from conftest import library_path, reads_path


def test_empty_fastq(tmp_path):
    empty = tmp_path / "empty.fastq"
    empty.write_text("")
    out = str(tmp_path / "out.tsv")
    rc = main([
        "-r", library_path("basic.json"), "-i", str(empty), "-o", out,
        "--engine", "host",
    ])
    assert rc == 0
    assert open(out).read() == "feature\tscore\n"


def test_empty_fastq_device_engine(tmp_path):
    empty = tmp_path / "empty.fastq"
    empty.write_text("")
    out = str(tmp_path / "out.tsv")
    rc = main(["-r", library_path("basic.json"), "-i", str(empty), "-o", out])
    assert rc == 0
    assert open(out).read() == "feature\tscore\n"


def test_paired_fastq_cli(tmp_path):
    """R1=basic reads, R2=junk mates, chemistry none: R1 calls survive."""
    junk = tmp_path / "r2.fastq"
    rng = np.random.default_rng(0)
    with open(junk, "w") as f:
        for i in range(4):
            seq = "".join(rng.choice(list("ACGT"), size=100))
            f.write(f"@m{i}\n{seq}\n+\n{'I'*100}\n")
    out = str(tmp_path / "out.tsv")
    rc = main([
        "-r", library_path("basic.json"),
        "-i", reads_path("basic.fastq"), "-i", str(junk),
        "-o", out, "-f", "none",
    ])
    assert rc == 0
    lines = open(out).read().splitlines()
    assert len(lines) > 1  # R1-only calls survive under chemistry none


def test_empty_bam(tmp_path):
    bam = str(tmp_path / "empty.bam")
    write_bam(bam, BamHeader(references=[("chr1", 100)]), [])
    out = str(tmp_path / "out.tsv.gz")
    cfg, ref = load_reference_library(
        library_path("mismatch.json"), LibraryChemistry.UNSTRANDED
    )
    index = build_index(get_reference_sequence_data(ref)[0])
    bam_pipeline.process(
        [bam], [HostAlignEngine(index, cfg)], [ref], [cfg], [out], 2, False
    )
    with gzip.open(out, "rt") as f:
        assert f.read() == ""  # no rows, no header (first_write never fired)


def test_single_row_library_device():
    """A 1-feature library (2 doubled rows) through the device engine."""
    ref = Reference(
        group_on=0, headers=["sequence_name", "sequence"],
        columns=[["g", "g§rev"],
                 ["ACGTTGCAAGGCTTAGGACCTTGCAATCGGATTACCGGTAACCGGTTAACCGGATCGATCG",
                  "CGATCGATCCGGTTAACCGGTTACCGGTAATCCGATTGCAAGGTCCTAAGCCTTGCAACGT"]],
        sequence_name_idx=0, sequence_idx=1,
    )
    cfg = AlignFilterConfig(score_percent=0.1, score_threshold=30,
                            max_hits_to_report=5)
    index = build_index(ref.columns[1])
    from nimble_tpu.utils.dna import encode_bases

    reads = [encode_bases(ref.columns[1][0][:45])]
    dev = DeviceAlignEngine(index, cfg)
    result = fast_count_calls(reads, None, dev, ref, cfg)
    assert result == [(["g"], (1, [], []))]


def test_read_exactly_k_long():
    """Reads shorter than MIN_READ_LENGTH are ShortRead even if == k."""
    cfg, ref = load_reference_library(library_path("basic.json"), LibraryChemistry.NONE)
    index = build_index(get_reference_sequence_data(ref)[0])
    from nimble_tpu.utils.dna import encode_bases

    read30 = encode_bases(ref.columns[3][0][:30])
    dev = DeviceAlignEngine(index, cfg)
    host = HostAlignEngine(index, cfg)
    assert dev.align_batch([read30]) == host.align_batch([read30])
    from nimble_tpu.config import FilterReason

    assert host.align_batch([read30])[0][1][0] == FilterReason.SHORT_READ
