"""MAXINFO quality trimmer (Trimmomatic-style), bit-parity port.

Parity target: `trim_sequence` / `maxinfo` / `compute_norm_ratio` / `normalize`
in `src/align.rs:866-942`.  The reference precomputes two f64 score tables,
fixed-point normalizes both into i64 by a shared ratio, then scans the quality
string accumulating i64 quality scores and taking the argmax prefix length.
The i64 fixed-point math is reproduced exactly (numpy int64 with explicit
Rust-`as`-cast semantics for the f64->i64 conversion: saturating, NaN->0).

NB: the quality string here contains RAW quality values as bytes (the BAM
path takes htslib's `record.qual()` numeric values and reinterprets them as
chars, `src/parse/bam.rs:191-195`), NOT ASCII-33-offset PHRED text.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import numpy as np

LONGEST_READ = 1000  # `src/align.rs:874`
MAXQUAL = 60         # `src/align.rs:875`
_I64_MAX = (1 << 63) - 1
_I64_MIN = -(1 << 63)


def _rust_f64_as_i64(x: float) -> int:
    """Rust `as` cast f64 -> i64: truncate toward zero, saturate, NaN -> 0."""
    if math.isnan(x):
        return 0
    if x >= float(_I64_MAX):
        return _I64_MAX
    if x <= float(_I64_MIN):
        return _I64_MIN
    return int(x)  # Python int() truncates toward zero like Rust `as`


def _compute_norm_ratio(array: np.ndarray, margin: int) -> float:
    """`src/align.rs:927-938`: i64::MAX / (max_abs * margin)."""
    max_val = float(np.max(np.abs(array)))
    # IEEE f64 semantics like Rust: x/0.0 == inf (strictness extremes hit this)
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(np.float64(_I64_MAX) / np.float64(max_val * float(margin)))


@lru_cache(maxsize=32)
def _tables(target_length: int, strictness: float) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute normalized i64 length-score and quality-probability tables.

    length_scores[i] = ln(1/(1+e^(target-i-1))) + ln(i+1)*(1-strictness)
    qual_probs[q]    = ln(1 - 10^(-(0.5+q)/10)) * strictness
    both scaled by a shared fixed-point ratio (`src/align.rs:877-897,893-897`).
    """
    i = np.arange(LONGEST_READ, dtype=np.float64)
    with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
        pow1 = np.exp(float(target_length) - i - 1.0)
        unique = np.log(1.0 / (1.0 + pow1))
        coverage = np.log(i + 1.0) * (1.0 - strictness)
        length_scores = unique + coverage

        q = np.arange(MAXQUAL + 1, dtype=np.float64)
        prob_correct = 1.0 - np.power(10.0, -((0.5 + q) / 10.0))
        qual_probs = np.log(prob_correct) * strictness

    norm_ratio = max(
        _compute_norm_ratio(length_scores, LONGEST_READ * 2),
        _compute_norm_ratio(qual_probs, LONGEST_READ * 2),
    )

    with np.errstate(over="ignore", invalid="ignore"):
        ls_i64 = np.array(
            [_rust_f64_as_i64(v * norm_ratio) for v in length_scores], dtype=np.int64
        )
        qp_i64 = np.array(
            [_rust_f64_as_i64(v * norm_ratio) for v in qual_probs], dtype=np.int64
        )
    return ls_i64, qp_i64


def maxinfo(quality: bytes | str, target_length: int, strictness: float) -> int:
    """Optimal prefix length for a quality string (`src/align.rs:873-925`).

    ``quality`` holds raw quality VALUES as bytes/chars (clamped to MAXQUAL).
    Returns 0 when no positive-scoring prefix exists.
    """
    if isinstance(quality, str):
        qvals = np.frombuffer(quality.encode("latin-1"), dtype=np.uint8)
    else:
        qvals = np.frombuffer(bytes(quality), dtype=np.uint8)
    n = len(qvals)
    if n == 0:
        return 0

    length_scores, qual_probs = _tables(int(target_length), float(strictness))

    q = np.minimum(qvals.astype(np.int64), MAXQUAL)
    accum = np.cumsum(qual_probs[q])  # i64 accumulation (wrapping like Rust +=)
    ls = np.zeros(n, dtype=np.int64)
    m = min(n, LONGEST_READ)
    ls[:m] = length_scores[:m]
    scores = ls + accum

    # argmax with `>=` (ties -> LAST max), compared in f64 against f64::MIN
    # then stored back as f64 (`src/align.rs:899-916`).
    scores_f64 = scores.astype(np.float64)
    max_score = float(scores_f64.max())
    # running ">=" keeps the LAST occurrence of the global max
    max_score_position = int(np.flatnonzero(scores_f64 == max_score).max()) + 1

    if max_score_position < 1 or max_score == 0.0:
        return 0
    if max_score_position < n:
        return max_score_position
    return n


def trim_codes(codes: np.ndarray, quality: str, target_length: int, strictness: float) -> np.ndarray:
    """Trim a coded read to its MAXINFO prefix (`trim_sequence`, `src/align.rs:866-871`)."""
    trimmed_length = maxinfo(quality, target_length, strictness)
    return codes[:trimmed_length]


def maxinfo_batch(
    quals: "list[str | bytes]", target_length: int, strictness: float
) -> np.ndarray:
    """Vectorized :func:`maxinfo` over many quality strings.

    Identical i64 fixed-point math per read (same tables, same accumulate/
    argmax semantics), batched across a padded matrix for throughput on the
    BAM path where every read is quality-trimmed.
    """
    if hasattr(quals, "offs"):  # columnar (offsets, flat) input
        from nimble_tpu import native

        ls_t, qp_t = _tables(int(target_length), float(strictness))
        res = native.maxinfo_ragged(quals.offs, quals.flat, ls_t, qp_t)
        if res is not None:
            return res
        lens = np.diff(quals.offs)
        n = len(lens)
        flat = quals.flat
    else:
        n = len(quals)
        lens = np.fromiter((len(q) for q in quals), dtype=np.int64, count=n)
        flat = None
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    width = int(lens.max()) if n else 0
    if width == 0:
        return out

    length_scores, qual_probs = _tables(int(target_length), float(strictness))

    # vectorized padded fill from the concatenated quality bytes
    if flat is None:
        if quals and isinstance(quals[0], str):
            flat = np.frombuffer(
                "".join(quals).encode("latin-1"), dtype=np.uint8
            )
        else:
            flat = np.frombuffer(
                b"".join(bytes(q) for q in quals), dtype=np.uint8
            )
    qmat = np.zeros((n, width), dtype=np.uint8)
    qmat[np.arange(width)[None, :] < lens[:, None]] = flat

    q = np.minimum(qmat.astype(np.int64), MAXQUAL)
    accum = np.cumsum(qual_probs[q], axis=1)
    ls = np.zeros(width, dtype=np.int64)
    m = min(width, LONGEST_READ)
    ls[:m] = length_scores[:m]
    scores = (ls[None, :] + accum).astype(np.float64)

    # mask beyond each read's length, then last-argmax with ">=" semantics
    pos = np.arange(width)[None, :]
    valid = pos < lens[:, None]
    scores = np.where(valid, scores, -np.inf)
    gmax = scores.max(axis=1)
    # last occurrence of the max (running ">=" keeps the last)
    is_max = (scores == gmax[:, None]) & valid
    last_pos = width - 1 - np.argmax(is_max[:, ::-1], axis=1)
    max_score_position = last_pos + 1

    result = np.where(
        (max_score_position < 1) | (gmax == 0.0),
        0,
        np.minimum(max_score_position, lens),
    )
    return result.astype(np.int64)
