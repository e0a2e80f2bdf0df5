"""Per-read pre-filters and score/metric filtering.

Parity ports of:
  * `pseudoalign` — `src/align.rs:945-989` (length gate, entropy gate, walk,
    normalization, metric filters)
  * `filter_alignment_by_metrics` — `src/filter/align.rs:4-45`
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from nimble_tpu.config import (
    MIN_ENTROPY_SCORE,
    MIN_READ_LENGTH,
    AlignFilterConfig,
    FilterReason,
)
from nimble_tpu.core.walk import map_read_with_mismatch
from nimble_tpu.index.build import KmerIndex
from nimble_tpu.utils.dna import shannon_entropy_from_counts

# (eq_class, normalized_score, score) — `AlignmentScore`, src/align.rs:22
AlignmentScore = Tuple[List[int], float, int]
# (reason, normalized_score, score) — `Filter`, src/align.rs:23
FilterRec = Tuple[FilterReason, float, int]


def filter_alignment_by_metrics(
    equivalence_class: List[int],
    score: int,
    normalized_score: float,
    score_threshold: int,
    normalized_score_threshold: float,
    discard_multiple_matches: bool,
    mismatch_threshold: int,
    mismatches: int,
) -> Tuple[Optional[AlignmentScore], Optional[FilterRec]]:
    """Threshold/ambiguity/mismatch filtering (`src/filter/align.rs:4-45`)."""
    if (
        score >= score_threshold
        and normalized_score >= normalized_score_threshold
        and len(equivalence_class) > 0
    ):
        if discard_multiple_matches and len(equivalence_class) > 1:
            return None, (FilterReason.DISCARDED_MULTIPLE_MATCH, normalized_score, score)
        if mismatches > mismatch_threshold:
            return None, (FilterReason.ABOVE_MISMATCH_THRESHOLD, normalized_score, score)
        return (equivalence_class, normalized_score, score), None
    return None, (FilterReason.SCORE_BELOW_THRESHOLD, normalized_score, score)


def entropy_of_codes(codes: np.ndarray) -> float:
    """Shannon entropy of a coded read, identical to the reference's
    `shannon_entropy(&sequence.to_string())` (`src/align.rs:960`,
    `src/utils.rs:96-119`): decoded strings contain only uppercase ACGT, so
    counting codes is exact."""
    counts = np.bincount(np.asarray(codes, dtype=np.int64), minlength=4)
    # reference frequency order is A, T, C, G (`src/utils.rs:99-108`)
    return shannon_entropy_from_counts(
        int(counts[0]), int(counts[3]), int(counts[1]), int(counts[2]), len(codes)
    )


def pseudoalign(
    codes: np.ndarray,
    index: KmerIndex,
    config: AlignFilterConfig,
    min_read_length: int = MIN_READ_LENGTH,
) -> Tuple[Optional[AlignmentScore], Optional[FilterRec]]:
    """Align one (already trimmed) read; host reference path (`src/align.rs:945-989`).

    The batched device engine (`nimble_tpu.ops`) implements the same function
    over read batches; this scalar version is the oracle and the rescue path.
    """
    if len(codes) < min_read_length:
        return None, (FilterReason.SHORT_READ, 0.0, 0)

    if entropy_of_codes(codes) < MIN_ENTROPY_SCORE:
        return None, (FilterReason.HIGH_ENTROPY, 0.0, 0)

    result = map_read_with_mismatch(codes, index)
    if result is None:
        return None, (FilterReason.NO_MATCH, 0.0, 0)

    equivalence_class, score, mismatches = result
    normalized_score = score / len(codes)

    if config.discard_nonzero_mismatch and mismatches != 0:
        return None, (FilterReason.DISCARDED_NONZERO_MISMATCH, 0.0, 0)

    return filter_alignment_by_metrics(
        equivalence_class,
        score,
        normalized_score,
        config.score_threshold,
        config.score_percent,
        config.discard_multiple_matches,
        config.num_mismatches,
        mismatches,
    )
