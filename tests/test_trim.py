"""Parity tests for the MAXINFO trimmer (`src/align.rs:1656-1752`).

The reference tests build quality strings from PHRED+33 text and subtract 33
(`adjust_quality`, `src/align.rs:1023-1027`) — the aligner consumes raw
quality values as chars.
"""

import numpy as np

from nimble_tpu.core.trim import maxinfo, trim_codes
from nimble_tpu.utils.dna import decode_bases, encode_bases


def adjust_quality(q: str) -> str:
    return "".join(chr(ord(c) - 33) for c in q)


def test_trim_sequence_high_quality():
    codes = encode_bases("ACGTACGTACGTACGTACGT")
    trimmed = trim_codes(codes, adjust_quality("I" * 20), 15, 0.5)
    assert decode_bases(trimmed) == "ACGTACGTACGTACGTACGT"


def test_trim_sequence_low_quality():
    codes = encode_bases("ACGTACGTACGTACGTACGT")
    trimmed = trim_codes(codes, adjust_quality("!" * 20), 15, 0.9)
    assert decode_bases(trimmed) == "A"


def test_trim_sequence_mixed_quality():
    codes = encode_bases("ACGTACGTACGTACGTACGT")
    trimmed = trim_codes(codes, adjust_quality("IIIIII!!!!!!IIIIII"), 15, 0.8)
    assert decode_bases(trimmed) == "ACGTAC"


def test_maxinfo_all_high_quality():
    assert maxinfo(adjust_quality("I" * 20), 15, 0.5) == 20


def test_maxinfo_all_low_quality():
    assert maxinfo(adjust_quality("!" * 20), 15, 0.9) == 1


def test_maxinfo_mixed_quality():
    assert maxinfo(adjust_quality("IIIIII!!!!!!IIIIII"), 15, 0.7) == 6


def test_maxinfo_strictness_1():
    assert maxinfo(adjust_quality("I" * 20), 15, 1.0) == 20


def test_maxinfo_strictness_0():
    assert maxinfo(adjust_quality("I" * 20), 15, 0.0) == 20


def test_maxinfo_batch_matches_scalar():
    """Vectorized batch MAXINFO must equal the scalar oracle per read."""
    import numpy as np
    from nimble_tpu.core.trim import maxinfo_batch

    rng = np.random.default_rng(7)
    quals = []
    for _ in range(200):
        n = int(rng.integers(1, 150))
        quals.append("".join(chr(int(q)) for q in rng.integers(0, 45, n)))
    quals.append("")  # empty edge case
    for target, strict in [(15, 0.5), (40, 0.9), (15, 0.0), (15, 1.0), (80, 0.7)]:
        batch = maxinfo_batch(quals, target, strict)
        for i, q in enumerate(quals):
            assert batch[i] == maxinfo(q, target, strict), (i, target, strict)


def test_maxinfo_native_columnar_matches_scalar():
    """The C++ single-pass MAXINFO over a ragged column must equal the
    scalar oracle bit-for-bit (i64 wrapping accumulation, last-max ties,
    >MAXQUAL clamping, reads beyond LONGEST_READ)."""
    import numpy as np
    from nimble_tpu import native
    from nimble_tpu.core.trim import maxinfo, maxinfo_batch

    class Col:
        def __init__(s, offs, flat):
            s.offs, s.flat = offs, flat

    rng = np.random.default_rng(11)
    for trial in range(40):
        n = int(rng.integers(0, 40))
        hi = int(rng.choice([5, 40, 70, 255]))
        quals = [
            bytes(rng.integers(0, hi, int(rng.integers(0, 1200))).astype(np.uint8))
            for _ in range(n)
        ]
        tl = int(rng.choice([0, 1, 36, 90, 1000]))
        st = float(rng.choice([0.0, 0.1, 0.5, 0.9, 1.0]))
        offs = np.zeros(n + 1, np.int64)
        offs[1:] = np.cumsum([len(q) for q in quals])
        flat = np.frombuffer(b"".join(quals), dtype=np.uint8)
        got = maxinfo_batch(Col(offs, flat), tl, st)
        want = np.array([maxinfo(q, tl, st) for q in quals], dtype=np.int64)
        assert (got == want).all(), (trial, tl, st)
