"""Device engine (XLA probe+walk) vs host oracle equivalence.

The device path must agree with `HostAlignEngine` per read: same filter
reasons, equivalence classes, scores, and mismatch counts — on the repo
fixtures and on randomized libraries/reads with injected mutations.
"""

import numpy as np
import pytest

from nimble_tpu.config import LibraryChemistry
from nimble_tpu.core.calls import HostAlignEngine, get_calls, sort_score_vector
from nimble_tpu.index.build import build_index
from nimble_tpu.io.fastq import read_fastq_codes
from nimble_tpu.library import get_reference_sequence_data, load_reference_library
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.utils.dna import decode_bases, revcomp

from conftest import library_path, reads_path


def make_engines(lib):
    cfg, ref = load_reference_library(library_path(lib), LibraryChemistry.NONE)
    seqs, _ = get_reference_sequence_data(ref)
    index = build_index(seqs)
    return (
        HostAlignEngine(index, cfg),
        DeviceAlignEngine(index, cfg),
        cfg,
        ref,
        index,
    )


def assert_same_results(host_res, dev_res):
    assert len(host_res) == len(dev_res)
    for i, (h, d) in enumerate(zip(host_res, dev_res)):
        assert h == d, f"read {i}: host={h} device={d}"


@pytest.mark.parametrize("lib,fastq", [
    ("basic.json", "basic.fastq"),
    ("basic-rev.json", "basic.fastq"),
    ("mismatch.json", "mismatch.fastq"),
])
def test_device_matches_host_on_fixtures(lib, fastq):
    host, dev, cfg, ref, _ = make_engines(lib)
    reads = read_fastq_codes(reads_path(fastq))
    for mm in (0, 1, 2):
        cfg.num_mismatches = mm
        assert_same_results(host.align_batch(reads), dev.align_batch(reads))


@pytest.mark.parametrize("lib,fastq", [
    ("basic.json", "basic.fastq"),
    ("mismatch.json", "mismatch.fastq"),
])
def test_device_end_to_end_counts(lib, fastq):
    """Full get_calls through the device engine reproduces oracle counts."""
    host, dev, cfg, ref, _ = make_engines(lib)
    reads = read_fastq_codes(reads_path(fastq))
    r_host = sort_score_vector(get_calls(reads, None, [], host, ref, cfg)[0])
    r_dev = sort_score_vector(get_calls(reads, None, [], dev, ref, cfg)[0])
    assert r_host == r_dev


def _random_library(rng, n_features=12, length=300):
    bases = "ACGT"
    seqs = []
    for _ in range(n_features):
        seqs.append("".join(rng.choice(list(bases), size=length)))
    return seqs


def _mutate(rng, s, n_mut):
    s = list(s)
    for _ in range(n_mut):
        p = rng.integers(0, len(s))
        s[p] = rng.choice([b for b in "ACGT" if b != s[p]])
    return "".join(s)


def test_device_matches_host_randomized():
    """Property test: random library, reads sampled from rows with injected
    substitutions, truncations, junk tails, and revcomp orientation."""
    rng = np.random.default_rng(42)
    feats = _random_library(rng)
    # doubled library, like the loader produces
    doubled = []
    for s in feats:
        doubled.append(s)
        doubled.append(revcomp(s))
    index = build_index(doubled)

    from nimble_tpu.config import AlignFilterConfig

    cfg = AlignFilterConfig(
        score_percent=0.1, score_threshold=32, num_mismatches=2,
        max_hits_to_report=10,
    )
    host = HostAlignEngine(index, cfg)
    dev = DeviceAlignEngine(index, cfg)

    reads = []
    for _ in range(200):
        row = int(rng.integers(0, len(doubled)))
        start = int(rng.integers(0, len(doubled[row]) - 60))
        length = int(rng.integers(45, min(140, len(doubled[row]) - start)))
        frag = doubled[row][start : start + length]
        kind = rng.integers(0, 5)
        if kind == 1:
            frag = _mutate(rng, frag, 1)
        elif kind == 2:
            frag = _mutate(rng, frag, 3)
        elif kind == 3:
            frag = frag + "".join(rng.choice(list("ACGT"), size=12))
        elif kind == 4:
            frag = "".join(rng.choice(list("ACGT"), size=length))  # junk
        from nimble_tpu.utils.dna import encode_bases

        reads.append(encode_bases(frag))

    assert_same_results(host.align_batch(reads), dev.align_batch(reads))


def test_padded_launch_shape_matches_pow2():
    """Accelerator launch padding (B -> launch_batch for small batches) must
    not change results — compare an engine forced to pad against default."""
    import numpy as np

    from nimble_tpu.config import AlignFilterConfig
    from nimble_tpu.core.fast_count import pack_matrix
    from nimble_tpu.index.build import build_index
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.utils.dna import encode_bases, revcomp

    rng = np.random.default_rng(3)
    feats = ["".join(rng.choice(list("ACGT"), size=200)) for _ in range(4)]
    doubled = [x for s in feats for x in (s, revcomp(s))]
    cfg = AlignFilterConfig(
        reference_genome_size=8, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    index = build_index(doubled)
    e_pow2 = DeviceAlignEngine(index, cfg)
    e_pad = DeviceAlignEngine(index, cfg, pad_launches=True)

    reads = [encode_bases(feats[i % 4][10:80]) for i in range(7)]
    mat, lens = pack_matrix(reads)
    a = e_pow2.align_raw_compact_from_matrix(mat, lens)
    b = e_pad.align_raw_compact_from_matrix(mat, lens)
    for key in ("astart", "mask", "passed", "needs_host"):
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)

    act = np.ones(7, dtype=bool)
    fa = e_pow2.full_collect(e_pow2.full_dispatch(mat, lens, act))
    fb = e_pad.full_collect(e_pad.full_dispatch(mat, lens, act))
    for key in ("reason", "norm", "score"):
        np.testing.assert_array_equal(fa[key], fb[key], err_msg=key)
