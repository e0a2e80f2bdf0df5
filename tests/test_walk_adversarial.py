"""Adversarial differential oracles for the walk semantics (VERDICT r1 #5).

`core/walk.py` pins `map_read_with_mismatch` from the reference's test
oracles; the upstream crate is unfetchable (zero egress), so the defense
against silent drift is exhaustive DIFFERENTIAL agreement: every device
formulation (single-chip fast kernel, columnar full kernel, mesh step) must
equal the pinned host oracle on corpora built to hit the under-constrained
cases:

  * anchors at positions > 0 (junk prefixes of every length)
  * reads whose ONLY anchor k-mer is in the tail
  * multi-feature shared k-mer blocks (anchor ties across rows)
  * branch-point mismatches (read follows one candidate then diverges)
  * eq-class-changing left walks (prefix distinguishes candidates)
  * mismatch tolerance interacting with row exhaustion
"""

import numpy as np
import pytest

from nimble_tpu.config import AlignFilterConfig, FilterReason
from nimble_tpu.core.calls import HostAlignEngine
from nimble_tpu.core.filters import pseudoalign
from nimble_tpu.index.build import build_index
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.utils.dna import decode_bases, encode_bases, revcomp

K = 30


def _cfg(**kw):
    base = dict(
        reference_genome_size=8, score_percent=0.1, score_threshold=30,
        num_mismatches=3, max_hits_to_report=10,
    )
    base.update(kw)
    return AlignFilterConfig(**base)


def _rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def _assert_engines_agree(features, reads, cfg):
    """Device align_batch and columnar full path == host oracle, per read."""
    index = build_index(features)
    host = HostAlignEngine(index, cfg)
    dev = DeviceAlignEngine(index, cfg)

    expected = host.align_batch(reads)
    got = dev.align_batch(reads)
    assert got == expected

    # columnar full path (BAM fast consumer's align)
    n = len(reads)
    W = max(len(r) for r in reads)
    mat = np.zeros((n, W), dtype=np.int8)
    lens = np.zeros(n, dtype=np.int32)
    for i, r in enumerate(reads):
        mat[i, : len(r)] = r
        lens[i] = len(r)
    res = dev.full_collect(dev.full_dispatch(mat, lens, np.ones(n, bool)))
    for i, (alignment, filt) in enumerate(expected):
        if alignment is not None:
            eq, norm, score = alignment
            assert res["reason"][i] == -1, f"read {i}: expected pass"
            assert res["score"][i] == score
            assert res["norm"][i] == norm
            key = int(res["eq_key"][i])
            got_eq = (res["rescued"][key] if key < -1
                      else dev.decode_combo(key >> dev.c_max,
                                            key & ((1 << dev.c_max) - 1)))
            assert list(got_eq) == list(eq), f"read {i}"
        else:
            reason, norm, score = filt
            ri = int(res["reason"][i])
            assert ri >= 0, f"read {i}: expected filter {reason}"
            assert DeviceAlignEngine._REASON_LIST[ri] == reason
            assert res["norm"][i] == norm
            assert res["score"][i] == score


def test_anchor_positions_exhaustive():
    """Junk prefix of every length 0..L-k forces every anchor position."""
    rng = np.random.default_rng(1)
    feats = [_rand_seq(rng, 200) for _ in range(4)]
    doubled = [x for f in feats for x in (f, revcomp(f))]
    reads = []
    frag = feats[0][40:40 + 48]
    for junk_len in range(0, 45):
        junk = _rand_seq(rng, junk_len)
        reads.append(encode_bases((junk + frag)[:90]))
    _assert_engines_agree(doubled, reads, _cfg())


def test_tail_only_anchor():
    """The only index k-mer sits at the very end of the read."""
    rng = np.random.default_rng(2)
    feats = [_rand_seq(rng, 150) for _ in range(3)]
    doubled = [x for f in feats for x in (f, revcomp(f))]
    reads = []
    for tail in (30, 31, 35, 40):
        junk = _rand_seq(rng, 80 - tail)
        reads.append(encode_bases(junk + feats[1][:tail]))
    _assert_engines_agree(doubled, reads, _cfg())


def test_candidate_overflow_rescue():
    """Anchor k-mer with MORE postings than the device's candidate cap
    (c_max=8): the kernel must flag needs_host and the host-oracle rescue
    must make the end results identical to the pure host engine."""
    rng = np.random.default_rng(11)
    shared = _rand_seq(rng, 44)  # 15 k-mer positions shared by every row
    feats = [
        _rand_seq(rng, 60) + shared + _rand_seq(rng, 60) for _ in range(12)
    ]
    doubled = [x for f in feats for x in (f, revcomp(f))]
    index = build_index(doubled)
    # the shared block's k-mers really do exceed the candidate cap
    first_key = None
    from nimble_tpu.index.build import pack_kmer_keys

    first_key = int(pack_kmer_keys(encode_bases(shared), K)[0])
    assert len(index.kmer_map[first_key]) == 12 > 8
    reads = []
    for i in range(12):
        # anchor in the shared block, flanks discriminate row i
        reads.append(encode_bases(feats[i][40 : 40 + 80]))
    reads.append(encode_bases(shared + _rand_seq(rng, 20)))  # stays ambiguous
    _assert_engines_agree(doubled, reads, _cfg())
    """Features sharing an exact k-mer block: anchor hits multiple rows,
    walk must discriminate by the divergent flanks."""
    rng = np.random.default_rng(3)
    shared = _rand_seq(rng, 60)
    feats = [
        _rand_seq(rng, 50) + shared + _rand_seq(rng, 50),
        _rand_seq(rng, 50) + shared + _rand_seq(rng, 50),
        _rand_seq(rng, 30) + shared + _rand_seq(rng, 70),
    ]
    doubled = [x for f in feats for x in (f, revcomp(f))]
    reads = [
        encode_bases(shared),                     # pure tie: all rows live
        encode_bases(shared + feats[0][110:130]), # right flank resolves to 0
        encode_bases(feats[1][30:50] + shared),   # left flank resolves to 1
        encode_bases(feats[2][10:30] + shared + feats[2][90:100]),
    ]
    _assert_engines_agree(doubled, reads, _cfg())


def test_branch_point_mismatches():
    """Read matches a candidate then substitutes bases mid-walk."""
    rng = np.random.default_rng(4)
    feats = [_rand_seq(rng, 160) for _ in range(3)]
    doubled = [x for f in feats for x in (f, revcomp(f))]
    reads = []
    base = feats[0][20:20 + 80]
    for pos in (31, 45, 60, 79):  # mismatches after the anchor k-mer
        mutated = base[:pos] + ("A" if base[pos] != "A" else "C") + base[pos + 1:]
        reads.append(encode_bases(mutated))
    # two mismatches straddling the anchor
    m2 = ("T" if base[5] != "T" else "G").join([base[:5], base[6:]])
    m2 = m2[:70] + ("A" if m2[70] != "A" else "C") + m2[71:]
    reads.append(encode_bases(m2))
    _assert_engines_agree(doubled, reads, _cfg())


def test_left_walk_changes_eq_class():
    """Shared k-mer at the read's END: the anchor ties rows, and only the
    LEFT walk (before the anchor) discriminates them."""
    rng = np.random.default_rng(5)
    shared = _rand_seq(rng, 34)
    feats = [
        _rand_seq(rng, 60) + shared,
        _rand_seq(rng, 60) + shared,
    ]
    doubled = [x for f in feats for x in (f, revcomp(f))]
    reads = [
        encode_bases(feats[0][40:60] + shared),   # left flank picks row 0
        encode_bases(feats[1][40:60] + shared),   # left flank picks row 2
        # mismatching left flank: substitution tolerance in the left walk
        encode_bases("A" + feats[0][41:60] + shared),
    ]
    _assert_engines_agree(doubled, reads, _cfg())


def test_row_exhaustion_mid_walk():
    """Candidates at different offsets exhaust at different walk steps."""
    rng = np.random.default_rng(6)
    shared = _rand_seq(rng, 40)
    feats = [
        shared + _rand_seq(rng, 10),           # short right flank
        _rand_seq(rng, 30) + shared + _rand_seq(rng, 60),
        _rand_seq(rng, 80) + shared,           # no right flank at all
    ]
    doubled = [x for f in feats for x in (f, revcomp(f))]
    reads = [
        encode_bases(shared + feats[1][70:110]),  # outruns rows 0 and 4
        encode_bases(shared + _rand_seq(rng, 30)),  # junk tail: mismatches
    ]
    _assert_engines_agree(doubled, reads, _cfg(num_mismatches=5))


def test_randomized_differential_sweep():
    """Fuzz: random libraries × mutated/chimeric/junk reads, several
    configurations — every engine result equals the host oracle."""
    rng = np.random.default_rng(7)
    for trial in range(3):
        feats = [_rand_seq(rng, int(rng.integers(60, 300)))
                 for _ in range(int(rng.integers(2, 8)))]
        doubled = [x for f in feats for x in (f, revcomp(f))]
        reads = []
        for _ in range(60):
            kind = rng.integers(0, 4)
            f = feats[int(rng.integers(0, len(feats)))]
            L = int(rng.integers(40, 100))
            if kind == 0 and len(f) > L:  # clean fragment
                s = int(rng.integers(0, len(f) - L))
                seq = f[s : s + L]
            elif kind == 1 and len(f) > L:  # mutated fragment
                s = int(rng.integers(0, len(f) - L))
                seq = list(f[s : s + L])
                for _ in range(int(rng.integers(1, 4))):
                    p = int(rng.integers(0, L))
                    seq[p] = "ACGT"[int(rng.integers(0, 4))]
                seq = "".join(seq)
            elif kind == 2 and len(f) > 40:  # chimera of two features
                g = feats[int(rng.integers(0, len(feats)))]
                seq = f[: L // 2] + g[: L - L // 2]
            else:  # junk
                seq = _rand_seq(rng, L)
            reads.append(encode_bases(seq))
        cfg = _cfg(
            num_mismatches=int(rng.integers(0, 4)),
            score_percent=float(rng.choice([0.1, 0.33, 0.5])),
            score_threshold=int(rng.choice([30, 45, 60])),
            discard_multiple_matches=bool(rng.integers(0, 2)),
        )
        _assert_engines_agree(doubled, reads, cfg)


def test_mesh_agrees_on_adversarial_corpus():
    """The mesh step agrees with the host oracle on the tie/branch corpus."""
    from nimble_tpu.models.mesh_aligner import MeshAlignEngine

    rng = np.random.default_rng(8)
    shared = _rand_seq(rng, 45)
    feats = [
        _rand_seq(rng, 40) + shared + _rand_seq(rng, 40),
        _rand_seq(rng, 70) + shared,
        shared + _rand_seq(rng, 70),
    ]
    doubled = [x for f in feats for x in (f, revcomp(f))]
    index = build_index(doubled)
    cfg = _cfg(num_mismatches=2)
    reads = [
        encode_bases(shared),
        encode_bases(feats[0][20:40] + shared),
        encode_bases(shared + feats[2][45:75]),
        encode_bases(_rand_seq(rng, 20) + shared),
    ]
    host = HostAlignEngine(index, cfg)
    mesh = MeshAlignEngine(index, cfg)
    assert mesh.align_batch(reads) == host.align_batch(reads)
