"""Parity tests for the reference-library loader.

Oracle values from `src/reference_library.rs:228-481` tests, run against the
same JSON fixtures.
"""

import pytest

from nimble_tpu.config import AlignFilterConfig, IntersectLevel, LibraryChemistry
from nimble_tpu.library import load_reference_library

from conftest import library_path


def test_load_correct_library():
    cfg, ref = load_reference_library(
        library_path("reference-library-correct.json"), LibraryChemistry.NONE
    )
    assert cfg.score_percent == 0.85
    assert cfg.score_filter == 200
    assert cfg.score_threshold == 300
    assert cfg.num_mismatches == 2
    assert cfg.discard_multiple_matches is True
    assert cfg.require_valid_pair is False
    assert cfg.discard_multi_hits == 1
    assert cfg.intersect_level == IntersectLevel.INTERSECT_WITH_FALLBACK
    assert cfg.max_hits_to_report == 10
    assert cfg.trim_target_length == 40
    assert cfg.trim_strictness == 0.9
    assert ref.group_on == 1
    assert ref.headers == ["id", "feature_id", "sequence_name", "sequence"]
    assert ref.columns[0] == ["1", "1", "2", "2"]
    assert ref.columns[1] == ["fid1", "fid1", "fid2", "fid2"]
    assert ref.columns[2] == ["seq_name1", "seq_name1§rev", "seq_name2", "seq_name2§rev"]
    assert ref.columns[3] == ["ATGC", "GCAT", "CGTA", "TACG"]
    assert ref.sequence_name_idx == 2
    assert ref.sequence_idx == 3


def test_missing_fields():
    with pytest.raises(ValueError, match="could not parse score_percent as f64"):
        load_reference_library(
            library_path("reference-library-missing-fields.json"), LibraryChemistry.NONE
        )


def test_types_broken():
    with pytest.raises(ValueError, match="could not parse score_percent as f64"):
        load_reference_library(
            library_path("reference-library-types-broken.json"), LibraryChemistry.NONE
        )


def test_broken_format():
    with pytest.raises(ValueError, match="could not parse reference library JSON"):
        load_reference_library(
            library_path("reference-library-broken-format.json"), LibraryChemistry.NONE
        )


def test_rna_to_dna_conversion():
    _, ref = load_reference_library(
        library_path("reference-library-rna.json"), LibraryChemistry.NONE
    )
    assert ref.columns[3][0] == "ATGCTT"
    assert ref.columns[3][1] == "AAGCAT"
    assert ref.columns[3][2] == "tTgcAT"
    assert ref.columns[3][3] == "ATgcAa"


def test_mixed_case_rna_to_dna_conversion():
    _, ref = load_reference_library(
        library_path("reference-library-mixed-case-rna.json"), LibraryChemistry.NONE
    )
    assert ref.columns[3][0] == "atGcTt"
    assert ref.columns[3][1] == "aAgCat"
    assert ref.columns[3][2] == "TtgCAt"
    assert ref.columns[3][3] == "aTGcaA"


def test_no_rna_bases():
    _, ref = load_reference_library(
        library_path("reference-library-no-rna-bases.json"), LibraryChemistry.NONE
    )
    assert ref.columns[3][0] == "ATGCGT"
    assert ref.columns[3][1] == "ACGCAT"
    assert ref.columns[3][2] == "CGTACG"
    assert ref.columns[3][3] == "CGTACG"


def test_sanity_check_invalid_score_percent():
    cfg = AlignFilterConfig(score_percent=1.5)
    with pytest.raises(ValueError, match="score_percent must be between 0 and 1"):
        cfg.sanity_check()


def test_sanity_check_negative_score_filter():
    cfg = AlignFilterConfig(score_filter=-10)
    with pytest.raises(ValueError, match="score_filter must be positive"):
        cfg.sanity_check()


def test_sanity_check_invalid_trim_strictness():
    cfg = AlignFilterConfig(trim_strictness=1.5)
    with pytest.raises(ValueError, match="trim_strictness must be between 0 and 1"):
        cfg.sanity_check()


def test_sanity_check_valid():
    AlignFilterConfig(
        score_percent=0.85, score_filter=50, trim_strictness=0.9
    ).sanity_check()
