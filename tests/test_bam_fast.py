"""Byte-parity of the columnar fast BAM pipeline vs the reference-port
slow pipeline (gzipped forensic TSVs compared decompressed)."""

import contextlib
import gzip
import io
import os

import numpy as np
import pytest

from nimble_tpu import native
from nimble_tpu.config import AlignFilterConfig, IntersectLevel, LibraryChemistry
from nimble_tpu.core.calls import HostAlignEngine
from nimble_tpu.index.build import build_index
from nimble_tpu.io.synth import make_synthetic_bam
from nimble_tpu.library import Reference
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.pipeline import bam_pipeline
from nimble_tpu.pipeline.bam_fast import process_fast
from nimble_tpu.utils.dna import revcomp

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library required"
)


def _workload(n_features=8, feat_len=220, seed=0):
    rng = np.random.default_rng(seed)
    feats = ["".join(rng.choice(list("ACGT"), size=feat_len))
             for _ in range(n_features)]
    doubled = [x for s in feats for x in (s, revcomp(s))]
    names = []
    for i in range(n_features):
        names.append(f"feat{i}")
        names.append(f"feat{i}§rev")
    reference = Reference(
        group_on=0,
        headers=["sequence_name", "sequence"],
        columns=[names, doubled],
        sequence_name_idx=0,
        sequence_idx=1,
    )
    index = build_index(doubled)
    return feats, reference, index


def _run_both(tmp_path, bam, reference, index, cfg, quirks=True):
    host_engine = HostAlignEngine(index, cfg)
    dev_engine = DeviceAlignEngine(index, cfg)
    slow_out = str(tmp_path / "slow.tsv.gz")
    fast_out = str(tmp_path / "fast.tsv.gz")
    with contextlib.redirect_stdout(io.StringIO()):
        bam_pipeline.process(
            [bam], [host_engine], [reference], [cfg], [slow_out], 2, False,
            parity_quirks=quirks,
        )
        process_fast(
            [bam], [dev_engine], [reference], [cfg], [fast_out], 2, False,
            parity_quirks=quirks,
        )
    with gzip.open(slow_out, "rb") as f:
        slow = f.read()
    with gzip.open(fast_out, "rb") as f:
        fast = f.read()
    return slow, fast


CONFIG_VARIANTS = [
    dict(),
    dict(strand_filter=LibraryChemistry.FIVE_PRIME),
    dict(strand_filter=LibraryChemistry.THREE_PRIME),
    dict(strand_filter=LibraryChemistry.NONE),
    dict(intersect_level=IntersectLevel.FORCE_INTERSECT),
    dict(intersect_level=IntersectLevel.NO_INTERSECT),
    dict(require_valid_pair=True),
    dict(discard_multiple_matches=True),
    dict(num_mismatches=0, score_percent=0.5),
    dict(trim_target_length=36, trim_strictness=0.9),
]


@pytest.mark.parametrize("variant", range(len(CONFIG_VARIANTS)))
def test_fast_matches_slow_across_configs(tmp_path, variant):
    feats, reference, index = _workload(seed=variant)
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(
        bam, feats, n_groups=6, pairs_per_group=3, read_len=80,
        unpaired_per_group=1, seed=variant, mutate_every=3,
    )
    kw = dict(
        reference_genome_size=16, score_percent=0.25, score_threshold=45,
        num_mismatches=2, intersect_level=IntersectLevel.INTERSECT_WITH_FALLBACK,
        max_hits_to_report=10,
    )
    kw.update(CONFIG_VARIANTS[variant])
    cfg = AlignFilterConfig(**kw)
    slow, fast = _run_both(tmp_path, bam, reference, index, cfg)
    assert fast == slow


def test_fast_matches_slow_strandedness_library(tmp_path):
    """The reference's BAM smoke test runs `strandedness.json` through the
    threaded pipeline (`tests/bam_pipeline_run.rs:11-48` — smoke-only since
    its sample.bam is an unavailable LFS object).  Run the real fixture
    library over a synthetic 10x BAM: its feature is AT-rich, so every
    sampled read fails the 1.75-bit Shannon-entropy gate
    (`src/align.rs:954-962`), and a UMI group with zero scored callsets
    logs nothing — not even zero-rows (`src/process/bam.rs:332-353`).
    Both pipelines must agree on that end-to-end: empty output content."""
    from nimble_tpu.library import load_reference_library
    from nimble_tpu.utils import shannon_entropy
    from conftest import library_path

    cfg, reference = load_reference_library(
        library_path("strandedness.json"), LibraryChemistry.UNSTRANDED
    )
    feats = reference.columns[reference.sequence_idx][0::2]
    assert shannon_entropy(feats[0][:80]) < 1.75  # the premise of the test
    index = build_index(reference.columns[reference.sequence_idx])
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(
        bam, feats, n_groups=8, pairs_per_group=3, read_len=80,
        unpaired_per_group=1, seed=7, mutate_every=4,
    )
    slow, fast = _run_both(tmp_path, bam, reference, index, cfg)
    assert fast == slow == b""


@pytest.mark.parametrize("quirks", [True, False])
def test_fast_matches_slow_quirk_modes(tmp_path, quirks):
    feats, reference, index = _workload(seed=42)
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(
        bam, feats, n_groups=5, pairs_per_group=2, read_len=124,
        seed=7, pad_to_124=False, mutate_every=4,
    )
    cfg = AlignFilterConfig(
        reference_genome_size=16, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    slow, fast = _run_both(tmp_path, bam, reference, index, cfg, quirks=quirks)
    assert fast == slow


def test_fast_matches_slow_single_group(tmp_path):
    feats, reference, index = _workload(seed=3)
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(bam, feats, n_groups=1, pairs_per_group=4, read_len=70,
                       seed=3)
    cfg = AlignFilterConfig(
        reference_genome_size=16, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    slow, fast = _run_both(tmp_path, bam, reference, index, cfg)
    assert fast == slow


def test_fast_matches_slow_124bp_clip(tmp_path):
    feats, reference, index = _workload(seed=5, feat_len=150)
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(
        bam, feats, n_groups=4, pairs_per_group=2, read_len=111,
        seed=5, pad_to_124=True,
    )
    cfg = AlignFilterConfig(
        reference_genome_size=16, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    slow, fast = _run_both(tmp_path, bam, reference, index, cfg)
    assert fast == slow


def test_fast_matches_slow_irregular_qnames(tmp_path):
    """A paired-flagged record whose mate is missing forces the reference's
    unpaired-qname warning path — the C++ emitter bails out and the Python
    fallback must keep outputs byte-identical."""
    from nimble_tpu.io.bam import BamHeader, BamRecord, write_bam

    feats, reference, index = _workload(seed=21)
    header = BamHeader(text="@HD\tVN:1.6\n", references=[("chr1", 100000)])
    rng = np.random.default_rng(3)
    recs = []
    qn = 0

    def rec(qname, flag, seq):
        r = BamRecord(qname=qname, flag=flag, tid=0, pos=qn, mtid=0, mpos=qn,
                      seq=seq, qual=bytes([35] * len(seq)))
        r.tags["CB"] = ("Z", "CBX00001-1")
        r.tags["UB"] = ("Z", "CCCCCCCCCC")
        return r

    def frag():
        f = feats[int(rng.integers(0, len(feats)))]
        s = int(rng.integers(0, len(f) - 60))
        return f[s : s + 60]

    # two clean pairs, then a paired-flagged ORPHAN, then another clean pair
    for i in range(2):
        q = f"p{qn}"; qn += 1
        recs.append(rec(q, 0x1 | 0x40, frag()))
        recs.append(rec(q, 0x1 | 0x80 | 0x10, frag()))
    recs.append(rec("orphan", 0x1 | 0x40, frag()))
    q = f"p{qn}"; qn += 1
    recs.append(rec(q, 0x1 | 0x40, frag()))
    recs.append(rec(q, 0x1 | 0x80 | 0x10, frag()))
    # second UMI group so the quirk-drop still leaves output
    recs2 = []
    for i in range(2):
        q = f"z{qn}"; qn += 1
        a = rec(q, 0x1 | 0x40, frag()); a.tags["UB"] = ("Z", "GGGGGGGGGG")
        b = rec(q, 0x1 | 0x80 | 0x10, frag()); b.tags["UB"] = ("Z", "GGGGGGGGGG")
        recs2 += [a, b]
    write_bam(str(tmp_path / "in.bam"), header, recs + recs2)

    cfg = AlignFilterConfig(
        reference_genome_size=16, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    slow, fast = _run_both(tmp_path, str(tmp_path / "in.bam"), reference,
                           index, cfg)
    assert fast == slow


def test_fast_matches_slow_umi_cb_boundary_shift(tmp_path):
    """The reference's group key is the CONCATENATED string
    ``umi + cb[:-2]`` (`src/parse/bam.rs:178`): different (UMI, CB) splits
    with equal concatenation are the SAME group.  Pins the native
    `nimble_bam_runs` key comparison against a component-wise regression."""
    from nimble_tpu.io.bam import BamHeader, BamRecord, write_bam

    feats, reference, index = _workload(seed=33)
    header = BamHeader(text="@HD\tVN:1.6\n", references=[("chr1", 100000)])
    rng = np.random.default_rng(8)

    def rec(qname, flag, seq, cb, ub):
        r = BamRecord(qname=qname, flag=flag, tid=0, pos=1, mtid=0, mpos=1,
                      seq=seq, qual=bytes([35] * len(seq)))
        r.tags["CB"] = ("Z", cb)
        r.tags["UB"] = ("Z", ub)
        return r

    def frag():
        f = feats[int(rng.integers(0, len(feats)))]
        s = int(rng.integers(0, len(f) - 60))
        return f[s : s + 60]

    recs = []
    # pair 1: UMI "AAAATTTTGB" + CB[:-2] "CC"  -> key "AAAATTTTGBCC"
    recs.append(rec("p0", 0x1 | 0x40, frag(), "CC-1", "AAAATTTTGB"))
    recs.append(rec("p0", 0x1 | 0x80 | 0x10, frag(), "CC-1", "AAAATTTTGB"))
    # pair 2: UMI "AAAATTTTG" + CB[:-2] "BCC" -> SAME concatenated key,
    # different components (and a different UMI run)
    recs.append(rec("p1", 0x1 | 0x40, frag(), "BCC-1", "AAAATTTTG"))
    recs.append(rec("p1", 0x1 | 0x80 | 0x10, frag(), "BCC-1", "AAAATTTTG"))
    # a second, distinct group so the quirk-drop still leaves output
    recs.append(rec("z0", 0x1 | 0x40, frag(), "DD-1", "GGGGGGGGGG"))
    recs.append(rec("z0", 0x1 | 0x80 | 0x10, frag(), "DD-1", "GGGGGGGGGG"))
    bam = str(tmp_path / "in.bam")
    write_bam(bam, header, recs)

    # the merged group is the point of the test: UMIReader must see 2 groups
    from nimble_tpu.io.umi import UMIReader

    r = UMIReader(bam, False, False)
    n_groups = 0
    while not r.next():
        n_groups += 1
    n_groups += 1  # final buffered group
    assert n_groups == 2

    from nimble_tpu.io.bam_columnar import ColumnarGroupStream

    got = sum(b.n_groups for b in ColumnarGroupStream(bam, False).batches(64))
    assert got == 2

    cfg = AlignFilterConfig(
        reference_genome_size=16, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    slow, fast = _run_both(tmp_path, bam, reference, index, cfg)
    assert fast == slow


def test_odd_group_raises_like_slow_path(tmp_path):
    """Mates carrying DIFFERENT CB tags split a pair across a group
    boundary -> odd groups.  The reference panics de-interleaving them
    (`src/align.rs:540`); both pipelines must raise, never floor-pair."""
    from nimble_tpu.io.bam import BamHeader, BamRecord, write_bam

    feats, reference, index = _workload(seed=55)
    header = BamHeader(text="@HD\tVN:1.6\n", references=[("chr1", 100000)])

    def rec(qname, flag, seq, cb):
        r = BamRecord(qname=qname, flag=flag, tid=0, pos=1, mtid=0, mpos=1,
                      seq=seq, qual=bytes([35] * len(seq)))
        r.tags["CB"] = ("Z", cb)
        r.tags["UB"] = ("Z", "CCCCCCCCCC")
        return r

    frag = feats[0][10:70]
    recs = [
        rec("p0", 0x1 | 0x40, frag, "AA-1"),
        rec("p0", 0x1 | 0x80 | 0x10, frag, "BB-1"),  # mate: different CB
        rec("z0", 0x1 | 0x40, frag, "DD-1"),
        rec("z0", 0x1 | 0x80 | 0x10, frag, "DD-1"),
    ]
    bam = str(tmp_path / "in.bam")
    write_bam(bam, header, recs)
    cfg = AlignFilterConfig(
        reference_genome_size=16, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    host_engine = HostAlignEngine(index, cfg)
    dev_engine = DeviceAlignEngine(index, cfg)
    with contextlib.redirect_stdout(io.StringIO()):
        with pytest.raises(ValueError, match="matching lengths"):
            bam_pipeline.process(
                [bam], [host_engine], [reference], [cfg],
                [str(tmp_path / "s.tsv.gz")], 2, False,
            )
        with pytest.raises(ValueError, match="matching lengths"):
            process_fast(
                [bam], [dev_engine], [reference], [cfg],
                [str(tmp_path / "f.tsv.gz")], 2, False,
            )


def test_fast_matches_slow_sk_tag_not_true(tmp_path):
    """force_bam_paired path: the skip test is EXACT equality of the SK:Z:
    aux value with "TRUE" (`src/align.rs:527-531`).  A 4-byte value that
    merely starts with 'T' (here "Trio") must still align."""
    from nimble_tpu.io.bam import BamHeader, BamRecord, write_bam

    feats, reference, index = _workload(seed=44)
    header = BamHeader(text="@HD\tVN:1.6\n", references=[("chr1", 100000)])
    rng = np.random.default_rng(12)

    def rec(qname, flag, seq, sk=None):
        r = BamRecord(qname=qname, flag=flag, tid=0, pos=1, mtid=0, mpos=1,
                      seq=seq, qual=bytes([35] * len(seq)))
        r.tags["CB"] = ("Z", "CBX00001-1")
        r.tags["UB"] = ("Z", "CCCCCCCCCC")
        if sk is not None:
            r.tags["SK"] = ("Z", sk)
        return r

    def frag():
        f = feats[int(rng.integers(0, len(feats)))]
        s = int(rng.integers(0, len(f) - 60))
        return f[s : s + 60]

    recs = [
        rec("p0", 0x1 | 0x40, frag(), sk="Trio"),
        rec("p0", 0x1 | 0x80 | 0x10, frag(), sk="TRUE"),
        rec("p1", 0x1 | 0x40, frag()),
        rec("p1", 0x1 | 0x80 | 0x10, frag()),
    ]
    for i in range(2):  # second group so the quirk-drop leaves output
        a = rec(f"z{i}", 0x1 | 0x40, frag())
        b = rec(f"z{i}", 0x1 | 0x80 | 0x10, frag())
        a.tags["UB"] = b.tags["UB"] = ("Z", "GGGGGGGGGG")
        recs += [a, b]
    bam = str(tmp_path / "in.bam")
    write_bam(bam, header, recs)

    host_engine = HostAlignEngine(index, _sk_cfg := AlignFilterConfig(
        reference_genome_size=16, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    ))
    dev_engine = DeviceAlignEngine(index, _sk_cfg)
    slow_out = str(tmp_path / "slow.tsv.gz")
    fast_out = str(tmp_path / "fast.tsv.gz")
    with contextlib.redirect_stdout(io.StringIO()):
        bam_pipeline.process([bam], [host_engine], [reference], [_sk_cfg],
                             [slow_out], 2, True)
        process_fast([bam], [dev_engine], [reference], [_sk_cfg],
                     [fast_out], 2, True)
    with gzip.open(slow_out, "rb") as f:
        slow = f.read()
    with gzip.open(fast_out, "rb") as f:
        fast = f.read()
    assert fast == slow
    assert b"Trio" in slow  # the SK value rides the forensic metadata


def test_fast_matches_slow_force_paired(tmp_path):
    feats, reference, index = _workload(seed=9)
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(
        bam, feats, n_groups=5, pairs_per_group=2, read_len=80,
        unpaired_per_group=2, seed=9,
    )
    cfg = AlignFilterConfig(
        reference_genome_size=16, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    host_engine = HostAlignEngine(index, cfg)
    dev_engine = DeviceAlignEngine(index, cfg)
    slow_out = str(tmp_path / "slow.tsv.gz")
    fast_out = str(tmp_path / "fast.tsv.gz")
    with contextlib.redirect_stdout(io.StringIO()):
        bam_pipeline.process(
            [bam], [host_engine], [reference], [cfg], [slow_out], 2, True,
        )
        process_fast(
            [bam], [dev_engine], [reference], [cfg], [fast_out], 2, True,
        )
    with gzip.open(slow_out, "rb") as f:
        slow = f.read()
    with gzip.open(fast_out, "rb") as f:
        fast = f.read()
    assert fast == slow


def test_fast_invalid_revcomp_char_falls_back(tmp_path):
    """A REVERSE-flagged record whose SE metadata override holds a non-DNA
    character: the C++ row assembler bails out (rc=-2) and the Python path
    raises the reference's revcomp panic (`src/utils.rs:84-87`)."""
    from nimble_tpu.io.bam import (
        FLAG_FIRST_IN_TEMPLATE,
        FLAG_LAST_IN_TEMPLATE,
        FLAG_MATE_REVERSE,
        FLAG_PAIRED,
        FLAG_REVERSE,
        BamHeader,
        BamRecord,
        write_bam,
    )
    from nimble_tpu.io.bam_columnar import ColumnarGroupStream
    from nimble_tpu.pipeline.bam_fast import (
        _LibraryWorker,
        _finish_batch,
        _prepare_batch,
    )

    feats, reference, index = _workload(seed=9)
    cfg = AlignFilterConfig(
        reference_genome_size=16, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    frag = feats[0][10:80]
    r1 = BamRecord(
        qname="q0", flag=FLAG_PAIRED | FLAG_FIRST_IN_TEMPLATE | FLAG_MATE_REVERSE,
        pos=100, mpos=200, tid=0, mtid=0, mapq=60,
        seq=frag, qual=bytes([40] * len(frag)),
    )
    r2 = BamRecord(
        qname="q0", flag=FLAG_PAIRED | FLAG_LAST_IN_TEMPLATE | FLAG_REVERSE,
        pos=200, mpos=100, tid=0, mtid=0, mapq=60,
        seq=frag, qual=bytes([40] * len(frag)),
    )
    for r in (r1, r2):
        r.tags["CB"] = ("Z", "CBX0000-1")
        r.tags["UB"] = ("Z", "ACGTACGTAC")
    r2.tags["SE"] = ("Z", "AC!T")  # SEQ override with a non-DNA character
    bam = str(tmp_path / "bad.bam")
    write_bam(
        bam,
        BamHeader(text="@HD\tVN:1.6\n@SQ\tSN:c\tLN:99999\n",
                  references=[("c", 99999)]),
        [r1, r2],
    )

    worker = _LibraryWorker(DeviceAlignEngine(index, cfg), reference, cfg)
    batches = list(ColumnarGroupStream(bam, False).batches(1024))
    assert len(batches) == 1
    ctx = _prepare_batch(batches[0], [worker])
    with pytest.raises(ValueError, match="Input sequence base is not DNA"):
        _finish_batch(ctx, [worker])


def test_fast_require_pair_all_junk_batch(tmp_path):
    """require_valid_pair=True with a batch where nothing aligns: the
    native pre-pass must not crash on the empty sorted-content table
    (regression: IndexError on scid_arr[g1])."""
    rng = np.random.default_rng(13)
    feats, reference, index = _workload(seed=13)
    junk = ["".join(rng.choice(list("ACGT"), size=70)) for _ in range(4)]
    bam = str(tmp_path / "junk.bam")
    make_synthetic_bam(bam, junk, n_groups=2, pairs_per_group=2, read_len=70,
                       seed=13)
    cfg = AlignFilterConfig(
        reference_genome_size=16, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8, require_valid_pair=True,
    )
    slow, fast = _run_both(tmp_path, bam, reference, index, cfg)
    assert fast == slow


def test_fast_multi_library_single_pass(tmp_path):
    """Two libraries through one process_fast call (stacked single-pass
    device launches) match the slow pipeline's per-library outputs."""
    feats1, ref1, idx1 = _workload(seed=31)
    feats2, ref2, idx2 = _workload(seed=32, n_features=6, feat_len=260)
    bam = str(tmp_path / "in.bam")
    # reads drawn from BOTH libraries' features
    make_synthetic_bam(bam, feats1 + feats2, n_groups=6, pairs_per_group=3,
                       read_len=80, seed=31, mutate_every=4)
    cfg1 = AlignFilterConfig(
        reference_genome_size=16, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    cfg2 = AlignFilterConfig(
        reference_genome_size=12, score_percent=0.3, score_threshold=45,
        num_mismatches=0, max_hits_to_report=8,
    )

    import gzip

    slow_outs = [str(tmp_path / f"slow{i}.tsv.gz") for i in range(2)]
    fast_outs = [str(tmp_path / f"fast{i}.tsv.gz") for i in range(2)]
    with contextlib.redirect_stdout(io.StringIO()):
        bam_pipeline.process(
            [bam], [HostAlignEngine(idx1, cfg1), HostAlignEngine(idx2, cfg2)],
            [ref1, ref2], [cfg1, cfg2], slow_outs, 2, False,
            parity_quirks=True,
        )
        process_fast(
            [bam],
            [DeviceAlignEngine(idx1, cfg1), DeviceAlignEngine(idx2, cfg2)],
            [ref1, ref2], [cfg1, cfg2], fast_outs, 2, False,
            parity_quirks=True,
        )
    for s, f in zip(slow_outs, fast_outs):
        assert gzip.open(f, "rb").read() == gzip.open(s, "rb").read()


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 1)])
def test_fast_bam_on_mesh_engine(tmp_path, mesh_shape):
    """The columnar fast BAM pipeline over MeshAlignEngine (sharded full
    kernel / degenerate delegate) is byte-identical to the slow pipeline."""
    import gzip

    import jax

    from nimble_tpu.models.mesh_aligner import MeshAlignEngine

    if len(jax.devices()) < mesh_shape[0] * mesh_shape[1]:
        pytest.skip("needs virtual device mesh")
    feats, reference, index = _workload(seed=21)
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(bam, feats, n_groups=6, pairs_per_group=3,
                       read_len=80, seed=21, mutate_every=4)
    cfg = AlignFilterConfig(
        reference_genome_size=16, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    mesh = jax.make_mesh(mesh_shape, ("data", "model"))
    mesh_engine = MeshAlignEngine(index, cfg, mesh=mesh)

    slow_out = str(tmp_path / "slow.tsv.gz")
    fast_out = str(tmp_path / "fast.tsv.gz")
    with contextlib.redirect_stdout(io.StringIO()):
        bam_pipeline.process(
            [bam], [HostAlignEngine(index, cfg)], [reference], [cfg],
            [slow_out], 2, False, parity_quirks=True,
        )
        process_fast(
            [bam], [mesh_engine], [reference], [cfg], [fast_out], 2, False,
            parity_quirks=True,
        )
    assert gzip.open(fast_out, "rb").read() == gzip.open(slow_out, "rb").read()


def test_fast_multiple_consumers_deterministic(tmp_path):
    """-c 5 (4 consumers) must produce byte-identical output to -c 2 (the
    sequence-numbered logger restores stream order)."""
    import gzip

    feats, reference, index = _workload(seed=44)
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(bam, feats, n_groups=40, pairs_per_group=3,
                       read_len=80, seed=44, mutate_every=4)
    cfg = AlignFilterConfig(
        reference_genome_size=16, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    outs = []
    for cores in (2, 5):
        out = str(tmp_path / f"c{cores}.tsv.gz")
        with contextlib.redirect_stdout(io.StringIO()):
            process_fast(
                [bam], [DeviceAlignEngine(index, cfg)], [reference], [cfg],
                [out], cores, False, batch_records=64,
            )
        outs.append(gzip.open(out, "rb").read())
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0


def test_consumer_failure_fails_the_run(tmp_path, monkeypatch):
    """A consumer thread dying mid-run must raise from process_fast (and
    never report success with silently truncated output)."""
    import nimble_tpu.pipeline.bam_fast as bf

    if not native.available():
        pytest.skip("native library required")
    feats, reference, index = _workload(seed=45)
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(bam, feats, n_groups=40, pairs_per_group=3,
                       read_len=80, seed=45)
    cfg = AlignFilterConfig(
        reference_genome_size=16, score_percent=0.2, score_threshold=40,
        num_mismatches=1, max_hits_to_report=8,
    )
    real = bf._prepare_batch
    calls = []

    def flaky(batch, workers, multi=None):
        calls.append(1)
        if len(calls) == 2:
            raise ValueError("injected device failure")
        return real(batch, workers, multi)

    monkeypatch.setattr(bf, "_prepare_batch", flaky)
    out = str(tmp_path / "out.tsv.gz")
    with contextlib.redirect_stdout(io.StringIO()):
        with pytest.raises(ValueError, match="injected device failure"):
            process_fast(
                [bam], [DeviceAlignEngine(index, cfg)], [reference], [cfg],
                [out], 3, False, batch_records=32,
            )
