"""Parity tests for DNA utils and natural sort.

Oracle values from `src/utils.rs:121-404` tests.
"""

import math

import numpy as np
import pytest

from nimble_tpu.utils.dna import (
    decode_bases,
    encode_bases,
    revcomp,
    revcomp_codes,
    shannon_entropy,
)
from nimble_tpu.utils.natsort import natural_lexical_sort


def test_encode_decode_roundtrip():
    assert decode_bases(encode_bases("ACGTacgt")) == "ACGTACGT"
    # unknown -> 'A' like DnaString::from_acgt_bytes
    assert decode_bases(encode_bases("NNXX")) == "AAAA"


def test_revcomp_codes():
    assert decode_bases(revcomp_codes(encode_bases("ATGC"))) == "GCAT"


def test_revcomp():
    assert revcomp("ATGC") == "GCAT"
    assert revcomp("CCGGTTAA") == "TTAACCGG"
    # case-preserving, U -> A
    assert revcomp("aU") == "At"  # U -> 'A' (uppercase), a -> t
    assert revcomp("N") == "N"


def test_revcomp_invalid_input():
    with pytest.raises(ValueError, match="Input sequence base is not DNA"):
        revcomp("ATGX")


def test_shannon_entropy_oracle():
    assert abs(shannon_entropy("")) < 1e-10
    assert abs(shannon_entropy("A")) < 1e-10
    assert abs(shannon_entropy("AT") - 1.0) < 1e-10
    assert abs(shannon_entropy("ATCG") - 2.0) < 1e-10
    expected = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert abs(shannon_entropy("AAAT") - expected) < 1e-10
    assert abs(shannon_entropy("ATCGATCGATCG") - 2.0) < 1e-10


def test_natural_sort():
    assert natural_lexical_sort(["A02-10", "A02-2", "A02-1"]) == [
        "A02-1",
        "A02-2",
        "A02-10",
    ]
    assert natural_lexical_sort(["geneB", "geneA"]) == ["geneA", "geneB"]
    # case-insensitive primary ordering
    assert natural_lexical_sort(["b", "A"]) == ["A", "b"]
    assert natural_lexical_sort(["x2y", "x10y", "x2z"]) == ["x2y", "x2z", "x10y"]
