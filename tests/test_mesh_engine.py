"""MeshAlignEngine (multi-chip sharded) vs host oracle, on the 8-CPU mesh."""

import numpy as np
import pytest

from nimble_tpu.config import LibraryChemistry
from nimble_tpu.core.calls import HostAlignEngine, get_calls, sort_score_vector
from nimble_tpu.core.fast_count import fast_count_calls
from nimble_tpu.index.build import build_index
from nimble_tpu.io.fastq import read_fastq_codes
from nimble_tpu.library import get_reference_sequence_data, load_reference_library
from nimble_tpu.models.mesh_aligner import MeshAlignEngine

from conftest import library_path, reads_path


def _setup(lib):
    cfg, ref = load_reference_library(library_path(lib), LibraryChemistry.NONE)
    index = build_index(get_reference_sequence_data(ref)[0])
    return cfg, ref, index


def strip_meta(results):
    return [(features, entry[0]) for features, entry in results]


@pytest.mark.parametrize("lib,fastq", [
    ("basic.json", "basic.fastq"),
    ("mismatch.json", "mismatch.fastq"),
])
@pytest.mark.parametrize("mm", [0, 2])
def test_mesh_align_batch_matches_host(lib, fastq, mm):
    cfg, ref, index = _setup(lib)
    cfg.num_mismatches = mm
    reads = read_fastq_codes(reads_path(fastq))
    host = HostAlignEngine(index, cfg)
    mesh = MeshAlignEngine(index, cfg)
    assert mesh.align_batch(reads) == host.align_batch(reads)


def test_mesh_fast_count_matches_general():
    cfg, ref, index = _setup("basic.json")
    reads = read_fastq_codes(reads_path("basic.fastq")) * 3
    host = HostAlignEngine(index, cfg)
    mesh = MeshAlignEngine(index, cfg)
    general = strip_meta(
        sort_score_vector(get_calls(reads, None, [], host, ref, cfg)[0])
    )
    fast = strip_meta(fast_count_calls(reads, None, mesh, ref, cfg))
    assert fast == general


def test_mesh_paired_stacked_dispatch_matches_general():
    """Paired reads through FastCounter.dispatch (ONE stacked R1+R2 device
    transaction) on the sharded mesh engine must equal the general path."""
    from nimble_tpu.core.fast_count import FastCounter, pack_matrix
    from nimble_tpu.utils.dna import revcomp_codes

    cfg, ref, index = _setup("basic.json")
    reads = read_fastq_codes(reads_path("basic.fastq")) * 3
    mates = [revcomp_codes(r) for r in reads]
    host = HostAlignEngine(index, cfg)
    mesh = MeshAlignEngine(index, cfg)
    general = strip_meta(
        sort_score_vector(get_calls(reads, mates, [], host, ref, cfg)[0])
    )
    mat, lens = pack_matrix(reads)
    mmat, mlens = pack_matrix(mates)
    counter = FastCounter(mesh, ref, cfg)
    counter.process(counter.dispatch(mat, lens, mmat, mlens))
    assert strip_meta(counter.finalize()) == general
