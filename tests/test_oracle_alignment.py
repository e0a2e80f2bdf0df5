"""End-to-end parity with the reference integration tests.

Oracle: `tests/basic-cases.rs` and `tests/mismatch.rs` expected (callset,
count) vectors, using the same FASTQ reads and library JSON fixtures, run
through the host oracle engine (exact reference semantics).
"""

import pytest

from nimble_tpu.config import LibraryChemistry
from nimble_tpu.core.calls import HostAlignEngine, get_calls, sort_score_vector
from nimble_tpu.index.build import build_index
from nimble_tpu.io.fastq import read_fastq_codes
from nimble_tpu.library import get_reference_sequence_data, load_reference_library

from conftest import library_path, reads_path


def get_data(seq_filename, lib_filename, strand_filter=LibraryChemistry.NONE):
    """Equivalent of `tests/utils.rs:17-61` get_data."""
    cfg, ref = load_reference_library(library_path(lib_filename), strand_filter)
    seqs, _names = get_reference_sequence_data(ref)
    index = build_index(seqs)
    reads = read_fastq_codes(reads_path(seq_filename))
    return reads, index, ref, cfg


def run(reads, index, ref, cfg):
    engine = HostAlignEngine(index, cfg)
    results, _, _ = get_calls(reads, None, [], engine, ref, cfg)
    return sort_score_vector(results)


def strip_meta(results):
    return [(features, entry[0]) for features, entry in results]


BASIC_EXPECTED = [
    (["A02-0", "A02-1", "A02-2", "A02-LC"], 1),
    (["A02-0", "A02-LC"], 1),
    (["A02-1"], 1),
]


@pytest.mark.parametrize("lib", ["basic.json", "basic-rev.json"])
@pytest.mark.parametrize("mismatches,expected_a02_1", [(0, 1), (1, 1), (2, 2)])
def test_basic_cases(lib, mismatches, expected_a02_1):
    """`tests/basic-cases.rs:42-252` — forward and reverse libraries at
    num_mismatches 0/1/2."""
    reads, index, ref, cfg = get_data("basic.fastq", lib)
    cfg.num_mismatches = mismatches
    expected = [
        (["A02-0", "A02-1", "A02-2", "A02-LC"], 1),
        (["A02-0", "A02-LC"], 1),
        (["A02-1"], expected_a02_1),
    ]
    assert strip_meta(run(reads, index, ref, cfg)) == expected


def get_group_by_data(seq_filename, lib_filename):
    """`tests/basic-cases.rs:15-39` — inject a 5th group_on column."""
    reads, index, ref, cfg = get_data(seq_filename, lib_filename)
    ref.group_on = 4
    ref.headers.append("test_group_on")
    ref.columns.append(["g1", "g1", "g2", "g2", "g2", "g2", "g1", "g1", "g1", "g1"])
    return reads, index, ref, cfg


def test_group_by():
    """`tests/basic-cases.rs:254-307`."""
    reads, index, ref, cfg = get_group_by_data("basic.fastq", "basic.json")
    expected = [
        (["g1"], 1),
        (["g1", "g2"], 1),
        (["g2"], 1),
    ]
    assert strip_meta(run(reads, index, ref, cfg)) == expected


@pytest.mark.parametrize("mismatches,expected_count", [(0, 1), (1, 2)])
def test_mismatch_cases(mismatches, expected_count):
    """`tests/mismatch.rs:9-60` — count goes 1 -> 2 at num_mismatches 0 -> 1."""
    reads, index, ref, cfg = get_data("mismatch.fastq", "mismatch.json")
    cfg.num_mismatches = mismatches
    assert strip_meta(run(reads, index, ref, cfg)) == [(["gene"], expected_count)]
