"""High-throughput counting path for the FASTQ workload.

Semantically identical to `core.calls.get_calls` -> counts (the FASTQ
pipeline discards the per-read forensics, `src/process/fastq.rs:16-27`), but
restructured for batch throughput — NO per-read Python anywhere:

  1. the engine's ``align_raw_from_matrix`` consumes a padded (N, Lmax) code
     matrix and returns flat arrays (pass mask + sorted deduped eq classes);
  2. read-pairs are DEDUPED by sequence bytes with one ``np.unique`` over the
     padded matrix: the reference's score map is keyed by the read(+mate)
     string (`src/align.rs:574-579`), so duplicate pairs contribute ONCE;
  3. distinct pairs are GROUPED by their (eq1, eq2) combination with a second
     ``np.unique``; the string-shaped tail (orientation/chemistry filtering,
     intersect levels, group rollup, natural sort) runs once per combo —
     real libraries produce few combos regardless of read count.

Reads the device engine could not bound (``needs_host``) are rescued through
the per-read host oracle, preserving exactness.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from nimble_tpu.config import (
    MIN_READ_LENGTH,
    AlignFilterConfig,
    PairState,
)
from nimble_tpu.core.calls import sort_score_vector
from nimble_tpu.core.filters import pseudoalign
from nimble_tpu.core.orientation import filter_and_coerce_sequence_call_orientations
from nimble_tpu.library import Reference


def pack_matrix(reads: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a list of coded reads into an (N, Lmax) int8 matrix + lengths."""
    n = len(reads)
    lmax = max((len(r) for r in reads), default=1)
    mat = np.zeros((n, max(lmax, 1)), dtype=np.int8)
    lens = np.zeros(n, dtype=np.int32)
    for i, r in enumerate(reads):
        mat[i, : len(r)] = r
        lens[i] = len(r)
    return mat, lens


def _rescue_matrix(mat, lens, raw, engine):
    """Host-oracle rescue for needs_host entries; returns {idx: eq_list}."""
    idxs = np.flatnonzero(raw["needs_host"])
    rescued: Dict[int, List[int]] = {}
    for i in idxs:
        codes = mat[i, : lens[i]]
        alignment, _ = pseudoalign(codes, engine.index, engine.config, MIN_READ_LENGTH)
        if alignment is not None:
            raw["passed"][i] = True
            rescued[int(i)] = alignment[0]
    return rescued


def _void_rows(mat: np.ndarray) -> np.ndarray:
    """Rows of a 2-D array as one void scalar each (for exact np.unique)."""
    c = np.ascontiguousarray(mat)
    return c.view([("", c.dtype)] * c.shape[1]).reshape(-1)


def fast_count_calls_matrix(
    mat: np.ndarray,
    lens: np.ndarray,
    mate_mat: Optional[np.ndarray],
    mate_lens: Optional[np.ndarray],
    engine,
    reference: Reference,
    config: AlignFilterConfig,
) -> List[Tuple[List[str], Tuple[int, List[str], List[str]]]]:
    """Counts identical to ``sort_score_vector(get_calls(...)[0])`` with
    empty metadata (the FASTQ path)."""
    from nimble_tpu.models.aligner import EQ_PAD

    n = mat.shape[0]
    raw1 = engine.align_raw_from_matrix(mat, lens)
    rescued1 = _rescue_matrix(mat, lens, raw1, engine)
    if mate_mat is not None:
        raw2 = engine.align_raw_from_matrix(mate_mat, mate_lens)
        rescued2 = _rescue_matrix(mate_mat, mate_lens, raw2, engine)
    else:
        raw2, rescued2 = None, {}

    eq1 = np.where(raw1["passed"][:, None], raw1["eq_sorted"], EQ_PAD)
    if raw2 is not None:
        eq2 = np.where(raw2["passed"][:, None], raw2["eq_sorted"], EQ_PAD)
    else:
        eq2 = np.full_like(eq1, EQ_PAD)

    has_rescue = bool(rescued1) or bool(rescued2)

    def eq_tuple(i: int, which: int) -> Tuple[int, ...]:
        """Exact eq class of read i (handles rescued wide classes)."""
        raw, rescued, eq = (raw1, rescued1, eq1) if which == 1 else (raw2, rescued2, eq2)
        if raw is None or not raw["passed"][i]:
            return ()
        r = rescued.get(int(i))
        if r is not None:
            return tuple(r)
        row = eq[i]
        return tuple(int(x) for x in row[row != EQ_PAD])

    nonempty1 = eq1[:, 0] != EQ_PAD
    nonempty2 = eq2[:, 0] != EQ_PAD
    for i in rescued1:
        nonempty1[i] = True
    for i in rescued2:
        nonempty2[i] = True

    # score-map admission (`src/align.rs:582-604`)
    keep = nonempty1 | nonempty2
    if config.require_valid_pair and mate_mat is not None:
        valid = nonempty1 & nonempty2 & (eq1 == eq2).all(axis=1)
        for i in set(rescued1) | set(rescued2):
            valid[i] = bool(eq_tuple(i, 1)) and eq_tuple(i, 1) == eq_tuple(i, 2)
        keep &= valid

    if not keep.any():
        return []

    # --- dedupe read pairs by sequence bytes (vectorized) ---
    kept = np.flatnonzero(keep)
    if mate_mat is not None:
        key_mat = np.concatenate(
            [
                mat[kept].astype(np.uint8),
                lens[kept, None].astype(np.int32).view(np.uint8).reshape(len(kept), 4),
                mate_mat[kept].astype(np.uint8),
                mate_lens[kept, None].astype(np.int32).view(np.uint8).reshape(len(kept), 4),
            ],
            axis=1,
        )
    else:
        key_mat = np.concatenate(
            [
                mat[kept].astype(np.uint8),
                lens[kept, None].astype(np.int32).view(np.uint8).reshape(len(kept), 4),
            ],
            axis=1,
        )
    _, first_idx = np.unique(_void_rows(key_mat), return_index=True)
    distinct = kept[first_idx]  # one representative per distinct pair

    # --- group distinct pairs by eq combo (vectorized) ---
    combo_mat = np.concatenate([eq1[distinct], eq2[distinct]], axis=1)
    combos, counts = np.unique(_void_rows(combo_mat), return_counts=True)
    combo_rows = combos.view(combo_mat.dtype).reshape(len(combos), combo_mat.shape[1])
    c = eq1.shape[1]

    results: Dict[Tuple[str, ...], int] = {}

    def run_combo(eq1_list, eq2_list, multiplicity):
        state = (
            PairState.BOTH if (eq1_list and eq2_list)
            else PairState.FIRST if eq1_list
            else PairState.SECOND
        )
        call = (
            state,
            (eq1_list, 0.0) if eq1_list else None,
            (eq2_list, 0.0) if eq2_list else None,
            [],
            [],
        )
        tmp: Dict[Tuple[str, ...], list] = {}
        filter_and_coerce_sequence_call_orientations(
            call, tmp, reference, config, "", {}
        )
        for callset in tmp:
            results[callset] = results.get(callset, 0) + multiplicity

    if not has_rescue:
        for row, mult in zip(combo_rows, counts):
            e1 = [int(x) for x in row[:c] if x != EQ_PAD]
            e2 = [int(x) for x in row[c:] if x != EQ_PAD]
            run_combo(e1, e2, int(mult))
    else:
        # rare path: rescued reads carry out-of-band (wide) eq lists
        combo_counts: Dict[Tuple[Tuple[int, ...], Tuple[int, ...]], int] = {}
        for i in distinct:
            key = (eq_tuple(i, 1), eq_tuple(i, 2))
            combo_counts[key] = combo_counts.get(key, 0) + 1
        for (e1, e2), mult in combo_counts.items():
            run_combo(list(e1), list(e2), mult)

    ret = [(list(callset), (count, [], [])) for callset, count in results.items()]
    return sort_score_vector(ret)


def fast_count_calls(
    reads: Sequence[np.ndarray],
    mate_reads: Optional[Sequence[np.ndarray]],
    engine,
    reference: Reference,
    config: AlignFilterConfig,
) -> List[Tuple[List[str], Tuple[int, List[str], List[str]]]]:
    """List-of-arrays convenience wrapper over the matrix fast path."""
    if len(reads) == 0:
        return []
    if mate_reads is not None and len(mate_reads) < len(reads):
        raise ValueError(
            "Error -- read and reverse read files do not have matching lengths: "
        )
    mat, lens = pack_matrix(reads)
    if mate_reads is not None:
        mate_mat, mate_lens = pack_matrix(list(mate_reads)[: len(reads)])
    else:
        mate_mat, mate_lens = None, None
    return fast_count_calls_matrix(
        mat, lens, mate_mat, mate_lens, engine, reference, config
    )
