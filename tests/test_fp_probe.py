"""Fingerprint-probe exactness: forced fp collisions must land in the
host-rescue path and produce oracle-identical results.

The fast kernel probes a uint32 fingerprint table (`device_index.kmer_fp`)
instead of the full lo|hi key pair (halving the dominant gather's bytes).
A collision (~2^-32 per lane compare) makes the probe select a wrong
anchor/bucket/lane; the kernel verifies the selected lane's full key and
flags the read for exact host rescue.  False NEGATIVES are impossible
(equal keys always fingerprint equal), so these tests forge false
POSITIVES: reads carry a junk prefix whose position-0 k-mer is NOT in the
library, and the table fingerprint of the bucket that k-mer probes is
corrupted to collide — diverting the anchor to position 0.
"""

import numpy as np
import pytest

from nimble_tpu.config import AlignFilterConfig
from nimble_tpu.core.calls import HostAlignEngine
from nimble_tpu.index.build import build_index
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.ops.device_index import hash_kmer, kmer_fp
from nimble_tpu.utils.dna import encode_bases, revcomp

K = 30


def _key_halves(codes30):
    """(lo, hi) uint32 halves of one 30-mer, matching _rolling_keys:
    hi = bases [0, 15), lo = bases [15, 30), first base most significant."""
    hi = np.uint32(0)
    lo = np.uint32(0)
    for j in range(15):
        hi = np.uint32(hi << np.uint32(2)) | np.uint32(codes30[j])
        lo = np.uint32(lo << np.uint32(2)) | np.uint32(codes30[15 + j])
    return lo, hi


def _workload(seed=5, n_feats=6, feat_len=200, n_reads=48):
    rng = np.random.default_rng(seed)
    feats = ["".join(rng.choice(list("ACGT"), size=feat_len))
             for _ in range(n_feats)]
    doubled = [x for s in feats for x in (s, revcomp(s))]
    index = build_index(doubled)
    cfg = AlignFilterConfig(
        reference_genome_size=2 * n_feats, score_percent=0.25,
        score_threshold=40, num_mismatches=1, max_hits_to_report=10,
    )
    # 10 junk bases + 55 real bases: true anchor sits at position 10
    reads = []
    for i in range(n_reads):
        src = feats[i % n_feats]
        start = (i * 11) % (feat_len - 60)
        junk = "".join(rng.choice(list("ACGT"), size=10))
        frag = junk + src[start : start + 55]
        reads.append(np.asarray(encode_bases(frag), dtype=np.int8))
    lens = np.asarray([len(r) for r in reads], dtype=np.int32)
    mat = np.zeros((n_reads, 96), dtype=np.int8)
    for i, r in enumerate(reads):
        mat[i, : len(r)] = r
    return index, cfg, mat, lens, reads


def _plant_collisions(eng, reads, positions=(0,)):
    """Corrupt table fingerprints so each read's k-mer at ``positions``
    (not present in the library) fp-matches lane 0 of its probed bucket —
    a realistic false positive.  Returns #planted."""
    import jax.numpy as jnp

    b = eng.bidx
    mask = b.n_buckets - 1
    fp = np.array(b.bkey_fp, copy=True)
    planted = 0
    for r in reads:
        for p in positions:
            lo, hi = _key_halves(r[p : p + K])
            bucket = int(hash_kmer(np.uint32(lo), np.uint32(hi))) & mask
            want = kmer_fp(np.uint32(lo), np.uint32(hi))
            if fp[bucket, 0] != want:
                fp[bucket, 0] = want
                planted += 1
    eng._dev_fast["bkey_fp"] = jnp.asarray(fp)
    return planted


def test_fp_table_matches_key_tables():
    index, cfg, *_ = _workload()
    eng = DeviceAlignEngine(index, cfg)
    b = eng.bidx
    assert b.bkey_fp.shape == b.bkey_lo.shape
    np.testing.assert_array_equal(b.bkey_fp, kmer_fp(b.bkey_lo, b.bkey_hi))


@pytest.mark.parametrize("seed", [5, 11])
def test_planted_collisions_rescue_to_oracle(seed):
    """align_batch (full path): diverted anchors must host-rescue to
    byte-identical oracle results."""
    index, cfg, mat, lens, reads = _workload(seed=seed)
    eng = DeviceAlignEngine(index, cfg)
    host = HostAlignEngine(index, cfg)
    planted = _plant_collisions(eng, reads)
    assert planted > 0

    got = eng.align_batch(reads)
    want = host.align_batch(reads)
    assert got == want, "planted fp collisions must rescue to oracle results"


def test_planted_collisions_flag_needs_host_compact():
    """Compact path: diverted anchors must raise needs_host (never a clean
    wrong pass), and untouched reads must stay bit-identical."""
    index, cfg, mat, lens, reads = _workload()
    eng_clean = DeviceAlignEngine(index, cfg)
    clean = eng_clean.align_raw_compact_from_matrix(mat, lens)
    assert clean["passed"].any()
    assert not clean["needs_host"].any()

    eng = DeviceAlignEngine(index, cfg)
    planted = _plant_collisions(eng, reads)
    assert planted > 0
    out = eng.align_raw_compact_from_matrix(mat, lens)
    assert out["needs_host"].any(), "collisions did not raise rescues"
    # no read may pass with a DIFFERENT result than the clean kernel
    both = out["passed"] & ~out["needs_host"] & clean["passed"]
    for i in np.flatnonzero(both):
        assert (out["astart"][i], out["mask"][i]) == (
            clean["astart"][i], clean["mask"][i],
        )
