"""Multi-library single-pass device execution: byte parity with the
sequential per-library path (VERDICT r1 item 6)."""

import contextlib
import io
import os

import numpy as np
import pytest

from nimble_tpu.config import AlignFilterConfig, LibraryChemistry
from nimble_tpu.index.build import build_index
from nimble_tpu.library import Reference, get_reference_sequence_data, load_reference_library
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.models.multi_aligner import MultiLibraryDispatcher
from nimble_tpu.pipeline import fastq_pipeline
from nimble_tpu.utils.dna import revcomp

from conftest import library_path, reads_path


def _lib(seed, n_features=5, feat_len=200, **cfg_kw):
    rng = np.random.default_rng(seed)
    feats = ["".join(rng.choice(list("ACGT"), size=feat_len))
             for _ in range(n_features)]
    doubled = [x for s in feats for x in (s, revcomp(s))]
    names = []
    for i in range(n_features):
        names.append(f"L{seed}F{i}")
        names.append(f"L{seed}F{i}§rev")
    reference = Reference(
        group_on=0, headers=["sequence_name", "sequence"],
        columns=[names, doubled], sequence_name_idx=0, sequence_idx=1,
    )
    kw = dict(reference_genome_size=2 * n_features, score_percent=0.2,
              score_threshold=40, num_mismatches=1, max_hits_to_report=10)
    kw.update(cfg_kw)
    return reference, build_index(doubled), AlignFilterConfig(**kw), feats


def _write_reads(path, libs, rng):
    with open(path, "w") as f:
        i = 0
        for _ in range(40):
            feats = libs[int(rng.integers(0, len(libs)))][3]
            src = feats[int(rng.integers(0, len(feats)))]
            s = int(rng.integers(0, len(src) - 60))
            seq = src[s : s + 60]
            f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
            i += 1
        # junk reads too
        for _ in range(8):
            seq = "".join(rng.choice(list("ACGT"), size=60))
            f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
            i += 1


def test_multi_library_single_pass_matches_sequential(tmp_path):
    rng = np.random.default_rng(0)
    libs = [_lib(1), _lib(2, num_mismatches=0, score_percent=0.5), _lib(3)]
    fastq = str(tmp_path / "reads.fastq")
    _write_reads(fastq, libs, rng)

    refs = [l[0] for l in libs]
    cfgs = [l[2] for l in libs]

    # sequential: one engine per library, separate pipeline runs
    seq_outs = []
    for i, (ref, index, cfg, _) in enumerate(libs):
        out = str(tmp_path / f"seq{i}.tsv")
        engine = DeviceAlignEngine(index, cfg)
        with contextlib.redirect_stdout(io.StringIO()):
            fastq_pipeline.process([fastq], [engine], [ref], [cfg], [out])
        seq_outs.append(open(out).read())

    # single-pass: all libraries through one pipeline call (multi dispatch)
    engines = [DeviceAlignEngine(l[1], l[2]) for l in libs]
    multi_outs = [str(tmp_path / f"multi{i}.tsv") for i in range(len(libs))]
    with contextlib.redirect_stdout(io.StringIO()):
        fastq_pipeline.process([fastq], engines, refs, cfgs, multi_outs)
    for i in range(len(libs)):
        assert open(multi_outs[i]).read() == seq_outs[i], f"library {i}"


def test_multi_dispatcher_matches_each_engine_raw():
    rng = np.random.default_rng(5)
    libs = [_lib(7), _lib(8, feat_len=320), _lib(9, n_features=2)]
    engines = [DeviceAlignEngine(l[1], l[2]) for l in libs]
    multi = MultiLibraryDispatcher(engines)

    reads = []
    for _ in range(50):
        feats = libs[int(rng.integers(0, 3))][3]
        src = feats[int(rng.integers(0, len(feats)))]
        s = int(rng.integers(0, len(src) - 70))
        reads.append(src[s : s + 70])
    from nimble_tpu.utils.dna import encode_bases
    from nimble_tpu.core.fast_count import pack_matrix

    mat, lens = pack_matrix([encode_bases(r) for r in reads])
    raws = multi.collect(multi.dispatch(mat, lens))
    for li, e in enumerate(engines):
        ref_raw = e.align_raw_compact_from_matrix(mat, lens)
        got = raws[li]
        np.testing.assert_array_equal(got["passed"], ref_raw["passed"])
        np.testing.assert_array_equal(got["needs_host"], ref_raw["needs_host"])
        for i in np.flatnonzero(ref_raw["passed"]):
            eq_ref = e.decode_combo(
                int(ref_raw["astart"][i]), int(ref_raw["mask"][i])
            )
            eq_got = e.decode_combo(
                int(got["astart"][i]), int(got["mask"][i])
            )
            assert eq_ref == eq_got, f"lib {li} read {i}"


def test_paired_end_multi_library(tmp_path):
    cfg, ref = load_reference_library(library_path("basic.json"), LibraryChemistry.NONE)
    cfg2, ref2 = load_reference_library(library_path("basic-rev.json"), LibraryChemistry.NONE)
    idx = build_index(get_reference_sequence_data(ref)[0])
    idx2 = build_index(get_reference_sequence_data(ref2)[0])

    outs_seq, outs_multi = [], []
    for i, (r, x, c) in enumerate(((ref, idx, cfg), (ref2, idx2, cfg2))):
        out = str(tmp_path / f"s{i}.tsv")
        with contextlib.redirect_stdout(io.StringIO()):
            fastq_pipeline.process(
                [reads_path("basic.fastq"), reads_path("basic.fastq")],
                [DeviceAlignEngine(x, c)], [r], [c], [out],
            )
        outs_seq.append(open(out).read())
    m_outs = [str(tmp_path / f"m{i}.tsv") for i in range(2)]
    with contextlib.redirect_stdout(io.StringIO()):
        fastq_pipeline.process(
            [reads_path("basic.fastq"), reads_path("basic.fastq")],
            [DeviceAlignEngine(idx, cfg), DeviceAlignEngine(idx2, cfg2)],
            [ref, ref2], [cfg, cfg2], m_outs,
        )
    for i in range(2):
        assert open(m_outs[i]).read() == outs_seq[i]


def test_paired_end_multi_library_distinct_mates(tmp_path):
    """Distinct R2 (revcomp of R1): a mate swap in the stacked R1+R2
    split (_drain_pending / split_stacked) would change these outputs."""
    comp = str.maketrans("ACGT", "TGCA")
    lines = open(reads_path("basic.fastq")).read().splitlines()
    r2 = str(tmp_path / "r2.fastq")
    with open(r2, "w") as f:
        for i in range(0, len(lines), 4):
            seq = lines[i + 1].translate(comp)[::-1]
            f.write(f"{lines[i]}\n{seq}\n+\n{lines[i + 3]}\n")

    cfg, ref = load_reference_library(library_path("basic.json"), LibraryChemistry.NONE)
    cfg2, ref2 = load_reference_library(library_path("basic-rev.json"), LibraryChemistry.NONE)
    idx = build_index(get_reference_sequence_data(ref)[0])
    idx2 = build_index(get_reference_sequence_data(ref2)[0])

    outs_seq = []
    for i, (r, x, c) in enumerate(((ref, idx, cfg), (ref2, idx2, cfg2))):
        out = str(tmp_path / f"sd{i}.tsv")
        with contextlib.redirect_stdout(io.StringIO()):
            fastq_pipeline.process(
                [reads_path("basic.fastq"), r2],
                [DeviceAlignEngine(x, c)], [r], [c], [out],
            )
        outs_seq.append(open(out).read())
    assert any(len(o.splitlines()) > 1 for o in outs_seq)  # non-empty oracle
    m_outs = [str(tmp_path / f"md{i}.tsv") for i in range(2)]
    with contextlib.redirect_stdout(io.StringIO()):
        fastq_pipeline.process(
            [reads_path("basic.fastq"), r2],
            [DeviceAlignEngine(idx, cfg), DeviceAlignEngine(idx2, cfg2)],
            [ref, ref2], [cfg, cfg2], m_outs,
        )
    for i in range(2):
        assert open(m_outs[i]).read() == outs_seq[i]


def test_multi_library_duplicates_across_chunks(tmp_path):
    """Pre-upload shared dedupe: duplicate reads (within AND across chunks)
    contribute once per distinct pair, byte-identical to sequential runs."""
    rng = np.random.default_rng(11)
    libs = [_lib(21), _lib(22)]
    fastq = str(tmp_path / "dup.fastq")
    with open(fastq, "w") as f:
        seqs = []
        for _ in range(10):
            feats = libs[int(rng.integers(0, len(libs)))][3]
            src = feats[int(rng.integers(0, len(feats)))]
            s = int(rng.integers(0, len(src) - 60))
            seqs.append(src[s : s + 60])
        # heavy duplication: every read appears 6x, interleaved so copies
        # land in different chunks
        i = 0
        for rep in range(6):
            for seq in seqs:
                f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
                i += 1

    refs = [l[0] for l in libs]
    cfgs = [l[2] for l in libs]
    seq_outs = []
    for i, (ref, index, cfg, _) in enumerate(libs):
        out = str(tmp_path / f"dseq{i}.tsv")
        engine = DeviceAlignEngine(index, cfg)
        with contextlib.redirect_stdout(io.StringIO()):
            fastq_pipeline.process([fastq], [engine], [ref], [cfg], [out],
                                   chunk_reads=16)
        seq_outs.append(open(out).read())

    engines = [DeviceAlignEngine(l[1], l[2]) for l in libs]
    multi_outs = [str(tmp_path / f"dmulti{i}.tsv") for i in range(len(libs))]
    with contextlib.redirect_stdout(io.StringIO()):
        fastq_pipeline.process(fastq.split(), engines, refs, cfgs, multi_outs,
                               chunk_reads=16)
    for i in range(len(libs)):
        assert open(multi_outs[i]).read() == seq_outs[i], f"library {i}"
