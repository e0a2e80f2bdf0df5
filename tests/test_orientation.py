"""Parity tests for orientation/chemistry filters and feature mapping.

Oracle values from the `src/align.rs:991-1753` unit tests.
"""

from nimble_tpu.config import (
    AlignFilterConfig,
    AlignmentOrientation,
    FilterReason,
    IntersectLevel,
    LibraryChemistry,
)
from nimble_tpu.core.calls import filter_pair
from nimble_tpu.core.features import process_equivalence_class_to_feature_list, unmap
from nimble_tpu.core.orientation import (
    filter_five_prime,
    filter_orientation_on_library_chemistry,
    filter_read_calls_with_orientation,
    filter_three_prime,
    filter_unstranded,
    get_all_calls,
    get_intersecting_reads,
    parse_calls,
)
from nimble_tpu.library import Reference

SEP = "§"


def setup_reference() -> Reference:
    return Reference(
        group_on=0,
        headers=["nt_sequence", "gene"],
        columns=[
            ["seq1", "seq2", "seq3"],
            ["geneA", "geneB", "geneA"],
        ],
        sequence_name_idx=0,
        sequence_idx=0,
    )


def setup_config() -> AlignFilterConfig:
    return AlignFilterConfig(
        reference_genome_size=1000,
        score_percent=0.1,
        score_threshold=50,
        num_mismatches=3,
        discard_nonzero_mismatch=False,
        discard_multiple_matches=False,
        score_filter=10,
        intersect_level=IntersectLevel.INTERSECT_WITH_FALLBACK,
        require_valid_pair=False,
        discard_multi_hits=0,
        max_hits_to_report=5,
        strand_filter=LibraryChemistry.FIVE_PRIME,
        trim_strictness=0.5,
        trim_target_length=15,
    )


# --- filter_pair (`src/align.rs:1110-1143`) ---

def test_filter_pair_oracle():
    assert filter_pair([], []) is True
    assert filter_pair([1, 2, 3], []) is True
    assert filter_pair([], [1, 2, 3]) is True
    assert filter_pair([1, 2, 3], [4, 5, 6]) is True
    assert filter_pair([1, 2, 3], [1, 2, 3]) is False
    assert filter_pair([1, 2, 3, 4], [1, 2, 3]) is True


# --- process_equivalence_class_to_feature_list (`src/align.rs:1146-1231`) ---

def test_group_by_nt_sequence():
    assert process_equivalence_class_to_feature_list(
        [0, 1, 2], setup_reference(), setup_config(), False
    ) == ["seq1", "seq2", "seq3"]


def test_group_by_gene():
    ref = setup_reference()
    ref.group_on = 1
    assert process_equivalence_class_to_feature_list(
        [0, 1, 2], ref, setup_config(), False
    ) == ["geneA", "geneB"]


def test_fallback_to_feature_name():
    ref = setup_reference()
    ref.columns[1] = ["geneA", "", "geneA"]
    ref.group_on = 1
    assert process_equivalence_class_to_feature_list(
        [0, 1, 2], ref, setup_config(), False
    ) == ["geneA", "seq2"]


def test_ignore_groupby():
    ref = setup_reference()
    ref.columns[1] = ["geneA", "", "geneA"]
    ref.group_on = 1
    assert process_equivalence_class_to_feature_list(
        [0, 1, 2], ref, setup_config(), True
    ) == ["seq1", "seq2", "seq3"]


def test_discard_multi_hits():
    cfg = setup_config()
    cfg.discard_multi_hits = 1
    assert (
        process_equivalence_class_to_feature_list([0, 1, 2], setup_reference(), cfg, False)
        == []
    )


def test_empty_equivalence_class():
    assert (
        process_equivalence_class_to_feature_list([], setup_reference(), setup_config(), False)
        == []
    )


def test_list_stability_and_order():
    ref = setup_reference()
    ref.group_on = 1
    r1 = process_equivalence_class_to_feature_list([2, 0, 1], ref, setup_config(), False)
    r2 = process_equivalence_class_to_feature_list([0, 1, 2], ref, setup_config(), False)
    assert r1 == r2 == ["geneA", "geneB"]


# --- parse_calls (`src/align.rs:1234-1252`) ---

def test_parse_calls():
    calls = [
        "feat1", f"feat2{SEP}rev", "feat3", f"feat4{SEP}rev", f"feat4{SEP}rev", "feat4",
    ]
    assert parse_calls(calls) == [
        ("feat1", False), ("feat2", True), ("feat3", False),
        ("feat4", True), ("feat4", True), ("feat4", False),
    ]


# --- filter_unstranded / five prime / three prime (`src/align.rs:1255-1337`) ---

def test_filter_unstranded():
    seq = [("feat1", False), ("feat2", True), ("feat4", True), ("feat5", True)]
    mate = [("feat1", False), ("feat3", False), ("feat4", False), ("feat5", True)]
    fs, fm = filter_unstranded(seq, mate)
    assert fs == [("feat2", True), ("feat4", True)]
    assert fm == [("feat3", False), ("feat4", False)]


def test_filter_five_prime():
    seq = [("feat1", False), ("feat2", True), ("feat4", False), ("feat5", True), ("feat6", False)]
    mate = [("feat1", False), ("feat3", True), ("feat4", True), ("feat5", False), ("feat7", False)]
    fs, fm = filter_five_prime(seq, mate)
    assert fs == ["feat4", "feat6"]
    assert fm == ["feat3", "feat4"]


def test_filter_three_prime():
    seq = [("feat1", False), ("feat2", True), ("feat4", False), ("feat5", True), ("feat6", False)]
    mate = [("feat1", False), ("feat3", False), ("feat4", True), ("feat5", False), ("feat7", True)]
    fs, fm = filter_three_prime(seq, mate)
    assert fs == ["feat2", "feat5"]
    assert fm == ["feat3", "feat5"]


# --- filter_orientation_on_library_chemistry (`src/align.rs:1339-1452`) ---

def test_chemistry_none():
    fs, fm = filter_orientation_on_library_chemistry(
        ["feat1", f"feat2{SEP}rev"], ["feat3", f"feat4{SEP}rev"], LibraryChemistry.NONE
    )
    assert fs == ["feat1", "feat2"]
    assert fm == ["feat3", "feat4"]


def test_chemistry_unstranded():
    fs, fm = filter_orientation_on_library_chemistry(
        ["feat1", "feat2", f"feat4{SEP}rev", "feat5"],
        ["feat1", "feat3", "feat4", f"feat5{SEP}rev"],
        LibraryChemistry.UNSTRANDED,
    )
    assert fs == ["feat2", "feat4", "feat5"]
    assert fm == ["feat3", "feat4", "feat5"]


def test_chemistry_five_prime():
    fs, fm = filter_orientation_on_library_chemistry(
        ["feat1", f"feat2{SEP}rev", "feat3", "feat5", "feat6", f"feat8{SEP}rev"],
        ["feat1", "feat3", "feat8", "feat4", f"feat5{SEP}rev", f"feat7{SEP}rev"],
        LibraryChemistry.FIVE_PRIME,
    )
    assert fs == ["feat5", "feat6"]
    assert fm == ["feat5", "feat7"]


def test_chemistry_three_prime():
    fs, fm = filter_orientation_on_library_chemistry(
        ["feat1", f"feat2{SEP}rev", "feat3", f"feat5{SEP}rev"],
        ["feat7", "feat1", "feat5", f"feat6{SEP}rev", f"feat4{SEP}rev"],
        LibraryChemistry.THREE_PRIME,
    )
    assert fs == ["feat2", "feat5"]
    assert fm == ["feat7", "feat5"]


# --- filter_read_calls_with_orientation (`src/align.rs:1454-1530`) ---

def test_no_duplicates():
    calls = ["name1", "name2", "name3", "name4"]
    assert filter_read_calls_with_orientation(calls) == calls


def test_with_duplicates():
    calls = [
        "name1", f"name1{SEP}rev", "name2", f"name3{SEP}rev", "name3", f"name4{SEP}rev",
    ]
    assert filter_read_calls_with_orientation(calls) == ["name2", f"name4{SEP}rev"]


def test_all_revs():
    calls = [f"name{i}{SEP}rev" for i in (1, 2, 3, 4)]
    assert filter_read_calls_with_orientation(calls) == calls


def test_mixed():
    calls = [
        "name1", f"name2{SEP}rev", f"name1{SEP}rev", "name3", f"name4{SEP}rev",
        f"name3{SEP}rev", "name5", f"name6{SEP}rev", "name7", f"name8{SEP}rev",
        "name9", "name8",
    ]
    assert filter_read_calls_with_orientation(calls) == [
        f"name2{SEP}rev", f"name4{SEP}rev", "name5", f"name6{SEP}rev", "name7", "name9",
    ]


# --- unmap (`src/align.rs:1532-1608`) ---

def _unmap_reference() -> Reference:
    return Reference(
        headers=["nt_sequence"],
        group_on=0,
        columns=[["feature1", "feature2", "feature3"]],
        sequence_name_idx=0,
        sequence_idx=1,
    )


def test_unmap():
    assert unmap(["feature1", "feature2", "feature3"], _unmap_reference()) == [0, 1, 2]


def test_unmap_unorder():
    assert unmap(["feature2", "feature1", "feature3"], _unmap_reference()) == [1, 0, 2]


def test_process_and_unmap():
    ref = _unmap_reference()
    features = process_equivalence_class_to_feature_list(
        [0, 1, 2], ref, setup_config(), True
    )
    assert unmap(features, ref) == [0, 1, 2]


# --- get_all_calls / get_intersecting_reads (`src/align.rs:1610-1654`) ---

def test_get_all_calls_both_present():
    assert get_all_calls(["1", "2", "3"], ["4", "5", "6"]) == ["1", "2", "3", "4", "5", "6"]


def test_get_intersecting_reads_success():
    filtered = {}
    result = get_intersecting_reads(
        ["1", "2", "3", "4"], ["4", "5", "6"], False, "read_key", filtered
    )
    assert result == ["4"]
    assert filtered == {}


def test_get_intersecting_reads_fallback():
    filtered = {}
    result = get_intersecting_reads(
        ["1", "2", "3"], ["4", "5", "6"], True, "read_key", filtered
    )
    assert result == ["1", "2", "3", "4", "5", "6"]
    assert filtered == {}


def test_get_intersecting_reads_fail_no_fallback():
    filtered = {}
    result = get_intersecting_reads(
        ["1", "2", "3"], ["4", "5", "6"], False, "read_key", filtered
    )
    assert result == []
    assert filtered["read_key"] == (
        FilterReason.FORCE_INTERSECT_FAILURE,
        AlignmentOrientation.NONE,
    )
