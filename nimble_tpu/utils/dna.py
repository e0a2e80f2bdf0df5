"""DNA primitives: 2-bit codes, reverse complement, Shannon entropy.

The device-side read representation is an int8 code per base with the same
code assignment as the reference's 2-bit `DnaString` (rust-debruijn crate,
`Cargo.toml:22`): A=0, C=1, G=2, T=3.  Unknown characters (incl. N) map to 0
('A'), matching `DnaString::from_acgt_bytes` — codes round-trip to uppercase
ACGT strings, which is what all downstream string-keyed logic sees.

String-level `revcomp` and `shannon_entropy` are parity ports of
`src/utils.rs:61-119` (incl. the panic on non-IUPAC input and the
uppercase-only base counting).
"""

from __future__ import annotations

import math

import numpy as np

A, C, G, T = 0, 1, 2, 3

# byte -> 2-bit code lookup (unknown -> 0, mirroring DnaString::from_acgt_bytes)
_ENCODE_LUT = np.zeros(256, dtype=np.int8)
for _ch, _code in (("A", 0), ("a", 0), ("C", 1), ("c", 1),
                   ("G", 2), ("g", 2), ("T", 3), ("t", 3)):
    _ENCODE_LUT[ord(_ch)] = _code

_DECODE_LUT = np.frombuffer(b"ACGT", dtype=np.uint8)

# code -> complement code (A<->T is 0<->3, C<->G is 1<->2): complement = 3 - code.


def encode_bases(seq: str | bytes) -> np.ndarray:
    """Encode a DNA string to int8 codes (A=0 C=1 G=2 T=3, unknown->0)."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    raw = np.frombuffer(seq, dtype=np.uint8)
    return _ENCODE_LUT[raw]


def decode_bases(codes: np.ndarray) -> str:
    """Decode int8 codes back to an uppercase ACGT string.

    Equivalent to `DnaString::to_string()` — the canonical read-key form used
    by the score map (`src/align.rs:576-579`).
    """
    return _DECODE_LUT[np.asarray(codes, dtype=np.int64)].tobytes().decode("ascii")


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    """Reverse complement in code space: complement(c) = 3 - c, reversed."""
    return (3 - np.asarray(codes))[::-1]


_REVCOMP_MAP = {
    "a": "t", "c": "g", "t": "a", "g": "c", "u": "a",
    "A": "T", "C": "G", "T": "A", "G": "C", "U": "A",
    "N": "N", "n": "N",
}
_VALID_BASES = set("AaCcGgTtUuNn")


# byte translation table for the fast path; 0 marks invalid characters
_REVCOMP_LUT = np.zeros(256, dtype=np.uint8)
for _bp, _c in _REVCOMP_MAP.items():
    _REVCOMP_LUT[ord(_bp)] = ord(_c)


def revcomp(sequence: str) -> str:
    """String-level reverse complement, parity with `src/utils.rs:61-94`.

    Case-preserving for ACGTU; N/n -> 'N'; raises on any other character
    (the reference panics: "Input sequence base is not DNA").
    """
    try:
        raw = np.frombuffer(sequence.encode("latin-1"), dtype=np.uint8)
    except UnicodeEncodeError:
        raw = np.zeros(1, dtype=np.uint8)  # non-latin char: certainly invalid
    out = _REVCOMP_LUT[raw[::-1]]
    if (out == 0).any():
        # find the first invalid character in the reference's scan order
        for bp in reversed(sequence):
            if bp not in _VALID_BASES:
                raise ValueError(f"Input sequence base is not DNA: {bp}")
    return out.tobytes().decode("latin-1")


def shannon_entropy(dna: str) -> float:
    """Shannon entropy over uppercase A/T/C/G frequencies (`src/utils.rs:96-119`).

    Characters other than uppercase A/T/C/G contribute to total length but not
    to any frequency bin, exactly as the reference. Empty input returns -0.0
    (the reference divides by zero yielding NaN frequencies which are filtered
    out; net result 0.0 — we reproduce the 0.0).
    """
    total = float(len(dna))
    if total == 0.0:
        return 0.0
    counts = [dna.count("A"), dna.count("T"), dna.count("C"), dna.count("G")]
    entropy = 0.0
    for c in counts:
        f = c / total
        if f > 0.0:
            entropy += f * math.log2(f)
    return -entropy


def shannon_entropy_from_counts(n_a: int, n_t: int, n_c: int, n_g: int, total: int) -> float:
    """Entropy from precomputed base counts (device path helper).

    For 2-bit-coded reads every base is one of A/C/G/T, so
    ``total == n_a+n_t+n_c+n_g`` and this matches :func:`shannon_entropy` of the
    decoded string bit-for-bit (same f64 operation order: f*log2(f) summed in
    A,T,C,G order, negated).
    """
    if total == 0:
        return 0.0
    entropy = 0.0
    for c in (n_a, n_t, n_c, n_g):
        f = c / total
        if f > 0.0:
            entropy += f * math.log2(f)
    return -entropy
