"""Parity tests for threshold_percentage (`src/filter/report.rs:15-70`)."""

from nimble_tpu.core.report import threshold_percentage


def test_no_threshold():
    scores = [("name1", 50.5), ("name2", 17.2), ("name3", 98.3)]
    assert threshold_percentage(scores, 0.0) == scores


def test_max_threshold():
    scores = [("name1", 50.5), ("name2", 17.2), ("name3", 98.2)]
    assert threshold_percentage(scores, 100.0) == []


def test_half_threshold():
    scores = [("name1", 50.5), ("name2", 17.2), ("name3", 98.3)]
    assert threshold_percentage(scores, 25.0) == [("name1", 50.5), ("name3", 98.3)]
