"""Streamed synthetic-BAM generation is byte-identical to the in-memory
writer (`BamStreamWriter` backs the reference-scale soak fixtures,
scripts/soak_bam.py)."""

import hashlib

import numpy as np

from nimble_tpu.io.synth import make_synthetic_bam


def _sha(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_streamed_bam_bytes_match_in_memory(tmp_path):
    rng = np.random.default_rng(3)
    feats = ["".join(rng.choice(list("ACGT"), size=300)) for _ in range(5)]
    a = str(tmp_path / "a.bam")
    b = str(tmp_path / "b.bam")
    kw = dict(n_groups=50, pairs_per_group=3, unpaired_per_group=1,
              read_len=80, seed=9, mutate_every=4)
    n1 = make_synthetic_bam(a, feats, **kw)
    n2 = make_synthetic_bam(b, feats, stream=True, **kw)
    assert n1 == n2 == 350
    assert _sha(a) == _sha(b)


def test_streamed_bam_padded_variant(tmp_path):
    rng = np.random.default_rng(4)
    feats = ["".join(rng.choice(list("ACGT"), size=300)) for _ in range(3)]
    a = str(tmp_path / "a.bam")
    b = str(tmp_path / "b.bam")
    kw = dict(n_groups=12, pairs_per_group=2, read_len=90, seed=2,
              pad_to_124=True)
    n1 = make_synthetic_bam(a, feats, **kw)
    n2 = make_synthetic_bam(b, feats, stream=True, **kw)
    assert n1 == n2
    assert _sha(a) == _sha(b)
