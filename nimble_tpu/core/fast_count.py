"""High-throughput counting path for the FASTQ workload.

Semantically identical to `core.calls.get_calls` -> counts (the FASTQ
pipeline discards the per-read forensics, `src/process/fastq.rs:16-27`), but
restructured for batch throughput:

  1. the engine's compact interface runs the WHOLE per-read filter chain on
     device and downloads ~6 bytes/read: a (anchor-postings-start, live-lane
     bitmask) pair that exactly identifies the read's equivalence class
     without shipping it (decoded host-side from the postings array);
  2. read-pairs are DEDUPED by sequence bytes: the reference's score map is
     keyed by the read(+mate) string (`src/align.rs:574-579`), so duplicate
     pairs contribute ONCE;
  3. the string-shaped tail (orientation/chemistry filtering, intersect
     levels, group rollup, natural sort) runs once per distinct
     (eq1, eq2) combination — real libraries produce few combos regardless
     of read count.

Reads the device could not decide exactly (candidate overflow, entropy on
the f32 boundary, oversized reads) are rescued through the per-read host
oracle, preserving exactness for every read.
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


def _combo_ids(mat, lens, engine, which_label):
    """Run the compact device path + host rescue for one mate side.

    Returns (cid (N,) int64, eq_of_cid dict).  cid semantics:
      -1            — read did not pass (no eq class)
      >= 0          — device result: astart * 2^c_max + mask
      <= -2         — rescued read with an out-of-band eq class
    ``eq_of_cid`` maps every non-(-1) cid to its eq-class list.
    """
    raw = engine.align_raw_compact_from_matrix(mat, lens)
    c_max = engine.c_max
    cid = np.where(
        raw["passed"],
        raw["astart"].astype(np.int64) * (1 << c_max) + raw["mask"],
        np.int64(-1),
    )

    eq_of_cid: Dict[int, List[int]] = {}
    next_rescue_id = -2
    for i in np.flatnonzero(raw["needs_host"]):
        codes = mat[i, : lens[i]]
        alignment, _ = pseudoalign(codes, engine.index, engine.config, MIN_READ_LENGTH)
        if alignment is not None:
            eq_of_cid[next_rescue_id] = alignment[0]
            cid[i] = next_rescue_id
            next_rescue_id -= 1
        else:
            cid[i] = -1
    return cid, eq_of_cid


class FastCounter:
    """Streaming FASTQ counter: feed chunks, finalize to results.

    Dedupe (score-map key semantics) and combo accumulation are GLOBAL
    across chunks — feeding a file in chunks produces results identical to
    one giant batch, with memory bounded by distinct reads + combos (the
    same asymptotics as the reference's score map).
    """

    def __init__(self, engine, reference: Reference, config: AlignFilterConfig):
        self.engine = engine
        self.reference = reference
        self.config = config
        self._seen: set = set()
        # combo key -> [eq1, eq2, multiplicity]
        self._combos: Dict[Tuple, list] = {}

    def _eq_key(self, cid_val: int, rescued: Dict[int, List[int]]):
        """Chunk-stable combo key half + eq list for a combo id."""
        if cid_val == -1:
            return None, []
        if cid_val < -1:
            eq = list(rescued[int(cid_val)])
            return ("r", tuple(eq)), eq
        c_max = self.engine.c_max
        eq = self.engine.decode_combo(
            cid_val >> c_max, cid_val & ((1 << c_max) - 1)
        )
        return ("c", int(cid_val)), eq

    def add(self, mat, lens, mate_mat=None, mate_lens=None) -> None:
        n = mat.shape[0]
        if n == 0:
            return
        engine, config = self.engine, self.config

        cid1, rescued1 = _combo_ids(mat, lens, engine, "r1")
        if mate_mat is not None:
            cid2, rescued2 = _combo_ids(mate_mat, mate_lens, engine, "r2")
        else:
            cid2 = np.full(n, -1, dtype=np.int64)
            rescued2 = {}

        # per-combo eq decode + pair validity (vectorized over combos)
        pair_mat = np.stack([cid1, cid2], axis=1)
        combos, inverse = np.unique(pair_mat, axis=0, return_inverse=True)
        combo_info = []  # (key, eq1, eq2) or None (filtered)
        for c1, c2 in combos:
            k1, e1 = self._eq_key(int(c1), rescued1)
            k2, e2 = self._eq_key(int(c2), rescued2)
            keep = bool(e1) or bool(e2)  # score-map admission (src/align.rs:604)
            if keep and config.require_valid_pair and mate_mat is not None:
                # filter_pair (src/align.rs:732-760): sorted eq equality
                keep = bool(e1) and bool(e2) and e1 == e2
            combo_info.append(((k1, k2), e1, e2) if keep else None)

        keep_mask = np.array([combo_info[i] is not None for i in inverse])
        if not keep_mask.any():
            return

        # dedupe kept read pairs by sequence bytes (GLOBAL across chunks —
        # keys are the exact-length read bytes so chunk padding width is
        # irrelevant)
        kept = np.flatnonzero(keep_mask)
        kept_inverse = inverse[kept]
        for j in range(len(kept)):
            i = kept[j]
            if mate_mat is not None:
                key = (mat[i, : lens[i]].tobytes(),
                       mate_mat[i, : mate_lens[i]].tobytes())
            else:
                key = mat[i, : lens[i]].tobytes()
            if key in self._seen:
                continue
            self._seen.add(key)
            combo_key, e1, e2 = combo_info[int(kept_inverse[j])]
            entry = self._combos.get(combo_key)
            if entry is None:
                self._combos[combo_key] = [e1, e2, 1]
            else:
                entry[2] += 1

    def finalize(self) -> List[Tuple[List[str], Tuple[int, List[str], List[str]]]]:
        """Memoized orientation pipeline per combo -> sorted results."""
        results: Dict[Tuple[str, ...], int] = {}
        for e1, e2, mult in self._combos.values():
            state = (
                PairState.BOTH if (e1 and e2)
                else PairState.FIRST if e1
                else PairState.SECOND
            )
            call = (
                state,
                (e1, 0.0) if e1 else None,
                (e2, 0.0) if e2 else None,
                [],
                [],
            )
            tmp: Dict[Tuple[str, ...], list] = {}
            filter_and_coerce_sequence_call_orientations(
                call, tmp, self.reference, self.config, "", {}
            )
            for callset in tmp:
                results[callset] = results.get(callset, 0) + mult

        ret = [
            (list(callset), (count, [], [])) for callset, count in results.items()
        ]
        return sort_score_vector(ret)


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
    counter = FastCounter(engine, reference, config)
    counter.add(mat, lens, mate_mat, mate_lens)
    return counter.finalize()


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
