"""Alignment-orientation and library-chemistry filtering.

Parity ports of the `AlignmentOrientation` impl block (`src/align.rs:136-376`)
and the call-coercion helpers (`get_all_calls` / `get_intersecting_reads`,
`src/align.rs:763-796`).

Feature orientation is encoded in names: a hit on a reverse-complement library
row carries the ``§rev`` suffix added by the loader.  The pipeline per
read-pair (driven by :func:`filter_and_coerce_sequence_call_orientations`):

  1. map each mate's equivalence class to names (rev tags kept);
  2. drop features a single mate hit in BOTH orientations;
  3. apply the library-chemistry filter (None / Unstranded / 5' / 3');
  4. merge mate callsets per the intersect level;
  5. unmap names -> row ids, group-rollup, cap by max_hits_to_report;
  6. bump the callset's count in the results accumulator.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from nimble_tpu.config import (
    AlignFilterConfig,
    AlignmentOrientation,
    FilterReason,
    IntersectLevel,
    LibraryChemistry,
    PairState,
)
from nimble_tpu.core.features import process_equivalence_class_to_feature_list, unmap
from nimble_tpu.library import REV_SUFFIX, Reference

# results accumulator value: [count, sequence_metadata, mate_sequence_metadata]
ResultsMap = Dict[Tuple[str, ...], list]
# read_key -> (reason, orientation)
TriageMap = Dict[str, Tuple[FilterReason, AlignmentOrientation]]
# (pair_state, Option[(eq_class, norm_score)], Option[(eq_class, norm_score)],
#  sequence_metadata, mate_sequence_metadata) — score_map value, src/align.rs:496-505
SequenceCall = Tuple[
    PairState,
    Optional[Tuple[List[int], float]],
    Optional[Tuple[List[int], float]],
    List[str],
    List[str],
]


def filter_read_calls_with_orientation(calls: List[str]) -> List[str]:
    """Remove features one mate hit in both orientations (`src/align.rs:144-171`).

    Any base name occurring more than once (any orientation combination) has
    ALL of its entries removed.
    """
    seen: set = set()
    to_remove: set = set()
    for feature in calls:
        base = feature[: -len(REV_SUFFIX)] if feature.endswith(REV_SUFFIX) else feature
        if base in seen:
            to_remove.add(base)
        else:
            seen.add(base)
    return [
        c
        for c in calls
        if (c[: -len(REV_SUFFIX)] if c.endswith(REV_SUFFIX) else c) not in to_remove
    ]


def parse_calls(calls: List[str]) -> List[Tuple[str, bool]]:
    """Split names into (base_feature, is_rev) (`src/align.rs:276-285`).

    Reproduces the reference quirks: the check is ``ends_with("rev")`` (no
    separator required), and stripping removes ALL trailing "rev" repetitions
    then ALL trailing separators.
    """
    out = []
    for call in calls:
        if call.endswith("rev"):
            base = call
            while base.endswith("rev"):
                base = base[: -3]
            while base.endswith("§"):
                base = base[: -1]
            out.append((base, True))
        else:
            out.append((call, False))
    return out


def filter_unstranded(
    sequence_calls: List[Tuple[str, bool]],
    mate_sequence_calls: List[Tuple[str, bool]],
) -> Tuple[List[Tuple[str, bool]], List[Tuple[str, bool]]]:
    """Drop (feature, orientation) pairs present in BOTH mates (`src/align.rs:287-309`)."""
    seq_set = set(sequence_calls)
    mate_set = set(mate_sequence_calls)
    seq_filtered = [c for c in sequence_calls if c not in mate_set]
    mate_filtered = [c for c in mate_sequence_calls if c not in seq_set]
    return seq_filtered, mate_filtered


def filter_five_prime(
    sequence_calls: List[Tuple[str, bool]],
    mate_sequence_calls: List[Tuple[str, bool]],
) -> Tuple[List[str], List[str]]:
    """5' chemistry orientation filter (`src/align.rs:311-342`)."""
    seq_u, mate_u = filter_unstranded(sequence_calls, mate_sequence_calls)
    seq_filtered: List[Tuple[str, bool]] = []
    mate_filtered = list(mate_u)
    for feat, rev in seq_u:
        if rev:
            # remove the first mate call with the same feature name (any orientation)
            for pos, (mate_feat, _) in enumerate(mate_filtered):
                if mate_feat == feat:
                    del mate_filtered[pos]
                    break
        else:
            seq_filtered.append((feat, rev))
    # forward-orientation mate calls survive only with a same-named sequence call
    mate_filtered = [
        (mf, mrev)
        for (mf, mrev) in mate_filtered
        if mrev or any(sf == mf for sf, _ in seq_filtered)
    ]
    return [f for f, _ in seq_filtered], [f for f, _ in mate_filtered]


def filter_three_prime(
    sequence_calls: List[Tuple[str, bool]],
    mate_sequence_calls: List[Tuple[str, bool]],
) -> Tuple[List[str], List[str]]:
    """3' chemistry orientation filter (`src/align.rs:344-375`)."""
    seq_u, mate_u = filter_unstranded(sequence_calls, mate_sequence_calls)
    seq_filtered: List[Tuple[str, bool]] = []
    mate_filtered = list(mate_u)
    for feat, rev in seq_u:
        if not rev:
            for pos, (mate_feat, _) in enumerate(mate_filtered):
                if mate_feat == feat:
                    del mate_filtered[pos]
                    break
        else:
            seq_filtered.append((feat, rev))
    # reverse-orientation mate calls survive only with a same-named sequence call
    mate_filtered = [
        (mf, mrev)
        for (mf, mrev) in mate_filtered
        if (not mrev) or any(sf == mf for sf, _ in seq_filtered)
    ]
    return [f for f, _ in seq_filtered], [f for f, _ in mate_filtered]


def filter_orientation_on_library_chemistry(
    sequence_calls: List[str],
    mate_sequence_calls: List[str],
    lib_type: LibraryChemistry,
) -> Tuple[List[str], List[str]]:
    """Dispatch by chemistry; returns rev-stripped names (`src/align.rs:255-274`)."""
    parsed_seq = parse_calls(sequence_calls)
    parsed_mate = parse_calls(mate_sequence_calls)
    if lib_type == LibraryChemistry.NONE:
        return [f for f, _ in parsed_seq], [f for f, _ in parsed_mate]
    if lib_type == LibraryChemistry.UNSTRANDED:
        calls, mate_calls = filter_unstranded(parsed_seq, parsed_mate)
        return [f for f, _ in calls], [f for f, _ in mate_calls]
    if lib_type == LibraryChemistry.FIVE_PRIME:
        return filter_five_prime(parsed_seq, parsed_mate)
    if lib_type == LibraryChemistry.THREE_PRIME:
        return filter_three_prime(parsed_seq, parsed_mate)
    raise AssertionError(lib_type)


def get_all_calls(sequence_call: List[str], mate_sequence_call: List[str]) -> List[str]:
    """Union merge (`src/align.rs:788-796`).

    NB: the reference calls array_tool's non-mutating ``unique()`` and discards
    the result (`src/align.rs:794`), so duplicates between the mates are KEPT.
    Reproduced for output parity.
    """
    return list(sequence_call) + list(mate_sequence_call)


def get_intersecting_reads(
    sequence_call: List[str],
    mate_sequence_call: List[str],
    fallback_on_intersect_fail: bool,
    read_key: str,
    filtered_keys: TriageMap,
) -> List[str]:
    """Intersect merge with optional fallback (`src/align.rs:763-785`).

    array_tool's ``intersect`` keeps elements of self present in other, deduped,
    in self order.
    """
    other = set(mate_sequence_call)
    cls: List[str] = []
    for x in sequence_call:
        if x in other and x not in cls:
            cls.append(x)
    if len(cls) == 0 and fallback_on_intersect_fail:
        return get_all_calls(sequence_call, mate_sequence_call)
    if len(cls) != 0:
        return cls
    filtered_keys[read_key] = (
        FilterReason.FORCE_INTERSECT_FAILURE,
        AlignmentOrientation.NONE,
    )
    return []


def filter_and_coerce_sequence_call_orientations(
    call: SequenceCall,
    results: ResultsMap,
    reference_metadata: Reference,
    config: AlignFilterConfig,
    read_key: str,
    filtered_keys: TriageMap,
) -> None:
    """Orientation pipeline for one read-pair's calls (`src/align.rs:178-252`)."""
    _, sequence_call_option, mate_sequence_call_option, seq_meta, mate_meta = call

    sequence_features: List[str] = []
    if sequence_call_option is not None:
        sequence_features = process_equivalence_class_to_feature_list(
            sequence_call_option[0], reference_metadata, config, True
        )
    mate_sequence_features: List[str] = []
    if mate_sequence_call_option is not None:
        mate_sequence_features = process_equivalence_class_to_feature_list(
            mate_sequence_call_option[0], reference_metadata, config, True
        )

    sequence_features = filter_read_calls_with_orientation(sequence_features)
    mate_sequence_features = filter_read_calls_with_orientation(mate_sequence_features)

    sequence_features, mate_sequence_features = filter_orientation_on_library_chemistry(
        sequence_features, mate_sequence_features, config.strand_filter
    )

    if config.intersect_level == IntersectLevel.NO_INTERSECT:
        final_callset = get_all_calls(sequence_features, mate_sequence_features)
    elif config.intersect_level == IntersectLevel.INTERSECT_WITH_FALLBACK:
        final_callset = get_intersecting_reads(
            sequence_features, mate_sequence_features, True, read_key, filtered_keys
        )
    else:  # FORCE_INTERSECT
        final_callset = get_intersecting_reads(
            sequence_features, mate_sequence_features, False, read_key, filtered_keys
        )

    final_ids = unmap(final_callset, reference_metadata)
    feature_callset = process_equivalence_class_to_feature_list(
        final_ids, reference_metadata, config, False
    )

    # max-hits cap runs AFTER rollup (`src/align.rs:232-236`)
    if len(feature_callset) > config.max_hits_to_report:
        filtered_keys[read_key] = (
            FilterReason.MAX_HITS_EXCEEDED,
            AlignmentOrientation.NONE,
        )
        return

    if len(feature_callset) == 0:
        filtered_keys[read_key] = (
            FilterReason.TRIAGE_EMPTY_EQUIVALENCE_CLASS,
            AlignmentOrientation.NONE,
        )
        return

    entry = results.setdefault(tuple(feature_callset), [0, [], []])
    entry[0] += 1
    entry[1] = seq_meta
    entry[2] = mate_meta
