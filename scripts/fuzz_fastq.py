#!/usr/bin/env python
"""Randomized FASTQ end-to-end differential campaign: the streaming fast
counting path (`pipeline/fastq_pipeline.py` + `core/fast_count.py` with the
device engine) must write byte-identical `feature\\tscore` TSVs to the slow
parity path (`core/calls.call` over the host oracle) across the whole
config surface — chemistry (none/unstranded/5'/3'), intersect levels,
group_on rollup, discard_multi_hits, require_valid_pair, multi-hit caps,
paired/single input, gzip input, duplicate-heavy read sets, and N>1
multi-library single-pass runs.

Usage: python scripts/fuzz_fastq.py [--minutes 20] [--seed 0]
Prints one line per trial block; exits nonzero on the first divergence with
a reproducer (seed, trial).
"""
from __future__ import annotations

import argparse
import contextlib
import gzip
import io
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    )
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from nimble_tpu.config import AlignFilterConfig, LibraryChemistry  # noqa: E402
from nimble_tpu.core.calls import HostAlignEngine  # noqa: E402
from nimble_tpu.index.build import build_index  # noqa: E402
from nimble_tpu.library import Reference  # noqa: E402
from nimble_tpu.models.aligner import DeviceAlignEngine  # noqa: E402
from nimble_tpu.pipeline import fastq_pipeline  # noqa: E402
from nimble_tpu.utils.dna import revcomp  # noqa: E402

BASES = np.array(list("ACGT"))


def rand_seq(rng, n):
    return "".join(rng.choice(BASES, size=n))


def make_library(rng):
    """Random doubled library + Reference, sometimes with a group_on
    rollup column (the basic-cases group_by shape)."""
    style = int(rng.integers(0, 4))
    feats = []
    if style == 0:
        for _ in range(int(rng.integers(2, 8))):
            feats.append(rand_seq(rng, int(rng.integers(40, 300))))
    elif style == 1:  # shared-block features (eq-class ties, multi-hits)
        block = rand_seq(rng, int(rng.integers(30, 60)))
        for _ in range(int(rng.integers(3, 8))):
            feats.append(
                rand_seq(rng, int(rng.integers(0, 30))) + block
                + rand_seq(rng, int(rng.integers(0, 30)))
            )
    elif style == 2:  # palindromic-ish: feature contains its own revcomp
        core = rand_seq(rng, int(rng.integers(35, 70)))
        feats.append(core + revcomp(core))
        feats.append(rand_seq(rng, 150))
    else:  # mixed short / normal
        feats.append(rand_seq(rng, int(rng.integers(10, 29))))
        feats.append(rand_seq(rng, int(rng.integers(100, 220))))
        feats.append(rand_seq(rng, 31))
    doubled = [x for f in feats for x in (f, revcomp(f))]
    names = []
    for i in range(len(feats)):
        names += [f"f{i:02d}", f"f{i:02d}§rev"]
    columns = [names, doubled]
    headers = ["sequence_name", "sequence"]
    group_on = 0
    if rng.random() < 0.4:  # group_on rollup column
        headers.append("family")
        n_groups = int(rng.integers(1, 4))
        fam = []
        for i in range(len(feats)):
            g = f"g{int(rng.integers(0, n_groups))}"
            fam += [g, g]
        columns.append(fam)
        group_on = 2
    ref = Reference(group_on=group_on, headers=headers, columns=columns,
                    sequence_name_idx=0, sequence_idx=1)
    return feats, doubled, ref


def make_reads(rng, feats, n_reads, paired):
    """(r1, r2|None) string lists; duplicate-heavy with revcomp/mutation/
    chimera/junk shapes (the engine-level fuzzer covers walk edge cases;
    this one aims at the counting/orientation tail, so reads mostly HIT)."""
    pool = [f for f in feats if len(f) >= 40] or feats
    r1s, r2s = [], []
    for _ in range(n_reads):
        f = pool[int(rng.integers(0, len(pool)))]
        kind = int(rng.integers(0, 10))
        L = min(len(f), int(rng.integers(40, 120)))
        s = int(rng.integers(0, max(1, len(f) - L + 1)))
        seq = f[s : s + L]
        if kind == 0:
            seq = revcomp(seq)
        elif kind == 1:  # mutated
            sl = list(seq)
            for _ in range(int(rng.integers(1, 4))):
                sl[int(rng.integers(0, len(sl)))] = (
                    "ACGT"[int(rng.integers(0, 4))])
            seq = "".join(sl)
        elif kind == 2:  # chimera across two features
            g = pool[int(rng.integers(0, len(pool)))]
            seq = seq[: L // 2] + g[: L - L // 2]
        elif kind == 3:  # junk
            seq = rand_seq(rng, L)
        r1s.append(seq)
        if paired:
            mk = int(rng.integers(0, 4))
            if mk == 0:
                r2s.append(revcomp(seq))        # proper mate
            elif mk == 1:
                g = pool[int(rng.integers(0, len(pool)))]
                L2 = min(len(g), int(rng.integers(40, 120)))
                s2 = int(rng.integers(0, max(1, len(g) - L2 + 1)))
                frag = g[s2 : s2 + L2]
                r2s.append(revcomp(frag) if rng.integers(0, 2) else frag)
            elif mk == 2:
                r2s.append(seq)                  # same-orientation mate
            else:
                r2s.append(rand_seq(rng, L))     # junk mate
    # duplicate-heavy: repeat a slice of the reads (pre-upload dedupe path;
    # the reference's score map counts duplicate pairs once)
    if n_reads >= 4 and rng.random() < 0.7:
        k = int(rng.integers(1, max(2, n_reads // 2)))
        idx = rng.integers(0, n_reads, size=k)
        for i in idx:
            r1s.append(r1s[int(i)])
            if paired:
                r2s.append(r2s[int(i)])
    return r1s, (r2s if paired else None)


def write_fastq(path, seqs, gz):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i:06d}\n{s}\n+\n{'I' * len(s)}\n")


def run_pipeline(files, engines, refs, cfgs, td, tag):
    outs = []
    paths = [f"{td}/{tag}_{i}.tsv" for i in range(len(engines))]
    for p in paths:
        if os.path.exists(p):
            os.unlink(p)  # writer is append-mode
    with contextlib.redirect_stdout(io.StringIO()):
        fastq_pipeline.process(files, engines, refs, cfgs, paths,
                               chunk_reads=1 << int(np.random.default_rng(
                                   len(tag)).integers(4, 8)))
    for p in paths:
        with open(p, "rb") as f:
            outs.append(f.read())
    return outs


def check_trial(rng, td, trial):
    feats, doubled, ref = make_library(rng)
    if not any(len(f) >= 30 for f in doubled):
        return 0
    chem = LibraryChemistry(
        str(rng.choice(["none", "unstranded", "fiveprime", "threeprime"])))
    paired = bool(rng.integers(0, 2))
    cfg = AlignFilterConfig(
        reference_genome_size=len(doubled),
        score_percent=float(rng.choice([0.05, 0.1, 0.33, 0.5])),
        score_threshold=int(rng.choice([20, 30, 45, 60])),
        num_mismatches=int(rng.integers(0, 4)),
        max_hits_to_report=int(rng.choice([1, 3, 10])),
        discard_multiple_matches=bool(rng.random() < 0.2),
        require_valid_pair=bool(paired and rng.random() < 0.3),
        discard_multi_hits=int(rng.choice([0, 0, 0, 1, 2])),
        intersect_level=int(rng.choice([0, 1, 2])) if paired else 0,
        strand_filter=chem,
    )
    n_reads = int(rng.integers(6, 60))
    r1s, r2s = make_reads(rng, feats, n_reads, paired)
    gz = rng.random() < 0.3
    ext = ".fastq.gz" if gz else ".fastq"
    f1 = f"{td}/r1_{trial}{ext}"
    write_fastq(f1, r1s, gz)
    files = [f1]
    if paired:
        f2 = f"{td}/r2_{trial}{ext}"
        write_fastq(f2, r2s, gz)
        files.append(f2)

    index = build_index(doubled)
    multi_lib = rng.random() < 0.25
    if multi_lib:
        # second independent library: the multi-library single-pass
        # dispatcher must match per-library sequential slow runs
        feats2, doubled2, ref2 = make_library(rng)
        if not any(len(f) >= 30 for f in doubled2):
            multi_lib = False
    if multi_lib:
        cfg2 = AlignFilterConfig(
            reference_genome_size=len(doubled2),
            score_percent=cfg.score_percent,
            score_threshold=cfg.score_threshold,
            num_mismatches=int(rng.integers(0, 4)),
            max_hits_to_report=cfg.max_hits_to_report,
            intersect_level=cfg.intersect_level,
            require_valid_pair=cfg.require_valid_pair,
            strand_filter=chem,
        )
        index2 = build_index(doubled2)
        fast = run_pipeline(
            files,
            [DeviceAlignEngine(index, cfg), DeviceAlignEngine(index2, cfg2)],
            [ref, ref2], [cfg, cfg2], td, f"fast{trial}")
        slow0 = run_pipeline(files, [HostAlignEngine(index, cfg)], [ref],
                             [cfg], td, f"slowA{trial}")
        slow1 = run_pipeline(files, [HostAlignEngine(index2, cfg2)], [ref2],
                             [cfg2], td, f"slowB{trial}")
        slow = [slow0[0], slow1[0]]
    else:
        use_mesh = rng.random() < 0.12
        if use_mesh:
            from nimble_tpu.models.mesh_aligner import MeshAlignEngine

            dev = MeshAlignEngine(index, cfg)
        else:
            dev = DeviceAlignEngine(index, cfg)
        fast = run_pipeline(files, [dev], [ref], [cfg], td, f"fast{trial}")
        slow = run_pipeline(files, [HostAlignEngine(index, cfg)], [ref],
                            [cfg], td, f"slow{trial}")
    if fast != slow:
        for i, (a, b) in enumerate(zip(fast, slow)):
            if a != b:
                sys.stderr.write(
                    f"library {i} diverges\nFAST:\n{a.decode()}\n"
                    f"SLOW:\n{b.decode()}\n")
        raise AssertionError(
            f"fast/slow FASTQ outputs diverge (trial={trial}, "
            f"chem={chem}, paired={paired}, multi={multi_lib}, "
            f"cfg={cfg.__dict__})")
    return len(r1s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=20.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    t_end = time.time() + args.minutes * 60
    trials = reads_total = 0
    with tempfile.TemporaryDirectory() as td:
        while time.time() < t_end:
            child = int(rng.integers(0, 2**63 - 1))
            crng = np.random.default_rng(child)
            try:
                reads_total += check_trial(crng, td, trials)
            except AssertionError:
                print(f"FAILED trial {trials} child_seed={child}",
                      flush=True)
                raise
            trials += 1
            if trials % 10 == 0:
                print(f"{trials} trials, {reads_total} reads, "
                      "byte-identical", flush=True)
                jax.clear_caches()
    print(f"DONE: {trials} trials, {reads_total} reads, zero divergences",
          flush=True)


if __name__ == "__main__":
    main()
