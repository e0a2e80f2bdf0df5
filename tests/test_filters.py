"""Parity tests for filter_alignment_by_metrics (`src/filter/align.rs:47-195`)."""

from nimble_tpu.config import FilterReason
from nimble_tpu.core.filters import filter_alignment_by_metrics


def test_do_not_filter():
    results, _ = filter_alignment_by_metrics([1, 2], 50, 1.0, 20, 0.5, False, 0, 0)
    assert results == ([1, 2], 1.0, 50)


def test_filter():
    _, results = filter_alignment_by_metrics([1, 2], 10, 0.10, 20, 0.5, False, 0, 0)
    assert results == (FilterReason.SCORE_BELOW_THRESHOLD, 0.10, 10)


def test_filter_multiple_matches():
    _, results = filter_alignment_by_metrics([1, 2], 50, 1.0, 20, 0.5, True, 0, 0)
    assert results == (FilterReason.DISCARDED_MULTIPLE_MATCH, 1.0, 50)


def test_do_not_filter_mismatches():
    results, _ = filter_alignment_by_metrics([1, 2], 50, 1.0, 20, 0.5, False, 1, 0)
    assert results == ([1, 2], 1.0, 50)


def test_do_not_filter_mismatches_equal():
    results, _ = filter_alignment_by_metrics([1, 2], 50, 1.0, 20, 0.5, False, 1, 1)
    assert results == ([1, 2], 1.0, 50)


def test_filter_mismatches():
    _, results = filter_alignment_by_metrics([1, 2], 50, 1.0, 20, 0.5, False, 1, 2)
    assert results == (FilterReason.ABOVE_MISMATCH_THRESHOLD, 1.0, 50)
