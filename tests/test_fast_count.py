"""Fast counting path vs the general get_calls path — must be identical."""

import numpy as np
import pytest

from nimble_tpu.config import (
    AlignFilterConfig,
    IntersectLevel,
    LibraryChemistry,
)
from nimble_tpu.core.calls import HostAlignEngine, get_calls, sort_score_vector
from nimble_tpu.core.fast_count import fast_count_calls
from nimble_tpu.index.build import build_index
from nimble_tpu.io.fastq import read_fastq_codes
from nimble_tpu.library import get_reference_sequence_data, load_reference_library
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.utils.dna import encode_bases, revcomp

from conftest import library_path, reads_path


def strip_meta(results):
    return [(features, entry[0]) for features, entry in results]


def general_path(reads, mates, index, ref, cfg):
    host = HostAlignEngine(index, cfg)
    return strip_meta(sort_score_vector(get_calls(reads, mates, [], host, ref, cfg)[0]))


@pytest.mark.parametrize("lib,fastq", [
    ("basic.json", "basic.fastq"),
    ("basic-rev.json", "basic.fastq"),
    ("mismatch.json", "mismatch.fastq"),
])
@pytest.mark.parametrize("mm", [0, 1, 2])
def test_fast_count_matches_general_single_end(lib, fastq, mm):
    cfg, ref = load_reference_library(library_path(lib), LibraryChemistry.NONE)
    cfg.num_mismatches = mm
    index = build_index(get_reference_sequence_data(ref)[0])
    reads = read_fastq_codes(reads_path(fastq))
    dev = DeviceAlignEngine(index, cfg)
    fast = strip_meta(fast_count_calls(reads, None, dev, ref, cfg))
    assert fast == general_path(reads, None, index, ref, cfg)


def test_fast_count_dedupes_identical_reads():
    """Duplicate reads must count ONCE (score-map key semantics)."""
    cfg, ref = load_reference_library(library_path("basic.json"), LibraryChemistry.NONE)
    index = build_index(get_reference_sequence_data(ref)[0])
    reads = read_fastq_codes(reads_path("basic.fastq"))
    reads_dup = reads + reads + reads
    dev = DeviceAlignEngine(index, cfg)
    fast = strip_meta(fast_count_calls(reads_dup, None, dev, ref, cfg))
    assert fast == general_path(reads_dup, None, index, ref, cfg)
    assert fast == general_path(reads, None, index, ref, cfg)  # dedupe happened


@pytest.mark.parametrize("chem", [
    LibraryChemistry.NONE,
    LibraryChemistry.UNSTRANDED,
    LibraryChemistry.FIVE_PRIME,
    LibraryChemistry.THREE_PRIME,
])
@pytest.mark.parametrize("intersect", [
    IntersectLevel.NO_INTERSECT,
    IntersectLevel.INTERSECT_WITH_FALLBACK,
    IntersectLevel.FORCE_INTERSECT,
])
@pytest.mark.parametrize("require_valid_pair", [False, True])
def test_fast_count_matches_general_paired_randomized(
    chem, intersect, require_valid_pair
):
    """Randomized paired-end reads across all chemistry/intersect configs."""
    rng = np.random.default_rng(11)
    feats = ["".join(rng.choice(list("ACGT"), size=250)) for _ in range(8)]
    doubled = [x for s in feats for x in (s, revcomp(s))]
    index = build_index(doubled)
    ref_cols = [
        [f"feat{i // 2}" + ("§rev" if i % 2 else "") for i in range(16)],
        doubled,
    ]
    from nimble_tpu.library import Reference

    ref = Reference(
        group_on=0,
        headers=["sequence_name", "sequence"],
        columns=ref_cols,
        sequence_name_idx=0,
        sequence_idx=1,
    )
    cfg = AlignFilterConfig(
        reference_genome_size=16,
        score_percent=0.2,
        score_threshold=32,
        num_mismatches=1,
        max_hits_to_report=8,
        intersect_level=intersect,
        strand_filter=chem,
        require_valid_pair=require_valid_pair,
    )

    reads, mates = [], []
    for _ in range(120):
        f = int(rng.integers(0, len(feats)))
        s1 = int(rng.integers(0, 180))
        frag1 = feats[f][s1 : s1 + 60]
        # mate: same feature reverse orientation, or sometimes another feature
        f2 = f if rng.random() < 0.8 else int(rng.integers(0, len(feats)))
        s2 = int(rng.integers(0, 180))
        frag2 = revcomp(feats[f2][s2 : s2 + 60])
        if rng.random() < 0.2:  # junk mate
            frag2 = "".join(rng.choice(list("ACGT"), size=60))
        reads.append(encode_bases(frag1))
        mates.append(encode_bases(frag2))

    dev = DeviceAlignEngine(index, cfg)
    fast = strip_meta(fast_count_calls(reads, mates, dev, ref, cfg))
    assert fast == general_path(reads, mates, index, ref, cfg)


def test_paired_key_is_plain_concatenation():
    """The reference's score-map key is the plain string concatenation
    r1 + r2 (`src/align.rs:576-579`): two pairs whose (r1, r2) SPLITS
    differ but whose concatenations are equal are ONE map entry and count
    once.  Pins the dedupe-set key against a separator regression, and a
    longer R2 list is tolerated like the slow path (extras ignored)."""
    rng = np.random.default_rng(17)
    feat = "".join(rng.choice(list("ACGT"), size=200))
    cfg = AlignFilterConfig(
        reference_genome_size=2, score_percent=0.1, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    doubled = [feat, revcomp(feat)]
    ref_obj = __import__("nimble_tpu.library", fromlist=["Reference"]).Reference(
        group_on=0, headers=["sequence_name", "sequence"],
        columns=[["f0", "f0§rev"], doubled],
        sequence_name_idx=0, sequence_idx=1,
    )
    index = build_index(doubled)

    frag = feat[0:96]
    # same concatenation, different splits
    r1s = [encode_bases(frag[:48]), encode_bases(frag[:47])]
    r2s = [encode_bases(frag[48:]), encode_bases(frag[47:])]

    expected = general_path(list(r1s), list(r2s), index, ref_obj, cfg)
    got = strip_meta(fast_count_calls(
        r1s, r2s, DeviceAlignEngine(index, cfg), ref_obj, cfg))
    assert got == expected
    # the point of the fixture: the general path collapses them to 1 count
    assert all(count == 1 for _, count in expected)

    # extra R2 rows are ignored (slow path zips by R1 index)
    got2 = strip_meta(fast_count_calls(
        r1s, r2s + [encode_bases(frag[:40])],
        DeviceAlignEngine(index, cfg), ref_obj, cfg))
    assert got2 == expected


def test_dispatch_tolerates_longer_mate_matrix():
    """FastCounter.dispatch/add with MORE mate rows than reads must ignore
    the extras (slow-path zip semantics), not crash on a broadcast."""
    from nimble_tpu.core.fast_count import FastCounter, pack_matrix

    rng = np.random.default_rng(18)
    feat = "".join(rng.choice(list("ACGT"), size=200))
    cfg = AlignFilterConfig(
        reference_genome_size=2, score_percent=0.1, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    doubled = [feat, revcomp(feat)]
    ref_obj = __import__("nimble_tpu.library", fromlist=["Reference"]).Reference(
        group_on=0, headers=["sequence_name", "sequence"],
        columns=[["f0", "f0§rev"], doubled],
        sequence_name_idx=0, sequence_idx=1,
    )
    index = build_index(doubled)
    r1s = [encode_bases(feat[0:60]), encode_bases(feat[50:110])]
    r2s = [encode_bases(feat[60:120]), encode_bases(feat[110:170]),
           encode_bases(feat[10:52])]  # one extra mate row

    expected = general_path(list(r1s), list(r2s), index, ref_obj, cfg)
    engine = DeviceAlignEngine(index, cfg)
    mat, lens = pack_matrix(r1s)
    mmat, mlens = pack_matrix(r2s)
    c = FastCounter(engine, ref_obj, cfg)
    c.process(c.dispatch(mat, lens, mmat, mlens))
    assert strip_meta(c.finalize()) == expected
    c2 = FastCounter(engine, ref_obj, cfg)
    c2.add(mat, lens, mmat, mlens)
    assert strip_meta(c2.finalize()) == expected


def test_group_rows_exact_hash_and_lexsort_agree():
    """The collision fallback (lexsort grouping) must produce the same
    groups and first-occurrence representatives as the hash path."""
    import numpy as np

    from nimble_tpu.core.fast_count import _group_rows_exact

    rng = np.random.default_rng(5)
    reps_pool = rng.integers(0, 2**62, (37, 16)).astype(np.int64)
    rows = reps_pool[rng.integers(0, 37, 5000)]
    gid_h, reps_h = _group_rows_exact(rows)
    gid_l, reps_l = _group_rows_exact(rows, _force_lexsort=True)
    # group ids may be numbered differently; compare the PARTITION and the
    # representative rows
    key_h = {}
    for i, g in enumerate(gid_h):
        key_h.setdefault(int(g), rows[i].tobytes())
    key_l = {}
    for i, g in enumerate(gid_l):
        key_l.setdefault(int(g), rows[i].tobytes())
    part_h = [key_h[int(g)] for g in gid_h]
    part_l = [key_l[int(g)] for g in gid_l]
    assert part_h == part_l
    # representatives are FIRST occurrences of their own group, both paths
    for gid, reps in ((gid_h, reps_h), (gid_l, reps_l)):
        first = {}
        for i, g in enumerate(gid):
            first.setdefault(int(g), i)
        assert all(int(reps[g]) == first[g] for g in range(len(reps)))
        np.testing.assert_array_equal(gid[reps], np.arange(len(reps)))


def test_one_col_compact_matches_two_col():
    """The one-int32 compact result (bucket/lane shipped, astart recovered
    host-side) must match the (B, 2) astart/flags result exactly."""
    import numpy as np

    from nimble_tpu.config import AlignFilterConfig
    from nimble_tpu.index.build import build_index
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.utils.dna import encode_bases

    rng = np.random.default_rng(9)
    feats = ["".join(rng.choice(list("ACGT"), size=300)) for _ in range(10)]
    index = build_index(feats)
    cfg = AlignFilterConfig(
        reference_genome_size=len(feats), score_percent=0.2,
        score_threshold=32, num_mismatches=1, max_hits_to_report=10,
    )
    engine = DeviceAlignEngine(index, cfg)
    assert engine._compact_one_col  # small table: packing must fit

    L = 96
    reads = []
    for _ in range(300):
        f = int(rng.integers(0, len(feats)))
        start = int(rng.integers(0, 300 - L))
        r = encode_bases(feats[f])[start : start + L].copy()
        if rng.random() < 0.3:
            p = int(rng.integers(0, L))
            r[p] = (r[p] + 1) % 4
        reads.append(r)
    for _ in range(30):
        reads.append(rng.integers(0, 4, L).astype(np.int8))
    mat = np.stack(reads)
    lens = np.full(len(reads), L, dtype=np.int32)

    got = engine.align_raw_compact_from_matrix(mat, lens)
    engine._compact_one_col = False
    want = engine.align_raw_compact_from_matrix(mat, lens)
    for key in want:
        sel = want["passed"] | want["needs_host"] if key == "astart" else slice(None)
        np.testing.assert_array_equal(got[key][sel], want[key][sel], err_msg=key)
