#!/usr/bin/env python
"""Randomized BAM pipeline differential campaign: the columnar fast path
(`pipeline/bam_fast.py`) must write byte-identical decompressed forensic
TSVs to the reference-port object pipeline (`pipeline/bam_pipeline.py`) on
anarchic record streams — missing CB tags, whitelist UMIs, UB->UR
fallback, unpaired dummy pairs, orphan qnames, 124bp clip reads, mixed
lengths/strands — in both quirk modes.

Usage: python scripts/fuzz_bam.py [--minutes 20] [--seed 0]
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
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from nimble_tpu.config import AlignFilterConfig  # noqa: E402
from nimble_tpu.index.build import build_index  # noqa: E402
from nimble_tpu.io.bam import (  # noqa: E402
    FLAG_FIRST_IN_TEMPLATE,
    FLAG_LAST_IN_TEMPLATE,
    FLAG_MATE_REVERSE,
    FLAG_PAIRED,
    FLAG_REVERSE,
    BamHeader,
    BamRecord,
    write_bam,
)
from nimble_tpu.library import Reference  # noqa: E402
from nimble_tpu.models.aligner import DeviceAlignEngine  # noqa: E402
from nimble_tpu.pipeline import bam_pipeline  # noqa: E402
from nimble_tpu.pipeline.bam_fast import process_fast  # noqa: E402
from nimble_tpu.utils.dna import revcomp  # noqa: E402

BASES = np.array(list("ACGT"))


def rand_seq(rng, n):
    return "".join(rng.choice(BASES, size=n))


def make_stream(rng, feats):
    """A randomized record stream grouped in UMI runs (stream order is
    semantic: consecutive same-UMI records form one SortedBamReader run)."""
    records = []
    qn = 0
    n_groups = int(rng.integers(2, 10))
    for g in range(n_groups):
        umi = ("AAAAAAAAAA" if rng.random() < 0.08
               else rand_seq(rng, 10))
        # several cell barcodes inside one UMI run (CB sort inside the run)
        cbs = [f"CB{int(rng.integers(0, 5)):04d}-1"
               for _ in range(int(rng.integers(1, 3)))]
        for _ in range(int(rng.integers(1, 6))):
            cb = cbs[int(rng.integers(0, len(cbs)))]
            kind = int(rng.integers(0, 10))
            f = feats[int(rng.integers(0, len(feats)))]
            L = int(rng.choice([50, 70, 90, 124]))
            s = int(rng.integers(0, max(1, len(f) - min(L, len(f)) + 1)))
            frag = (f + rand_seq(rng, L))[s : s + L]
            if rng.random() < 0.3:  # substitutions
                fl = list(frag)
                for _ in range(int(rng.integers(1, 4))):
                    fl[int(rng.integers(0, len(fl)))] = (
                        "ACGT"[int(rng.integers(0, 4))])
                frag = "".join(fl)

            def tag(r, missing_cb=False, ur_only=False, no_umi=False):
                if not missing_cb:
                    r.tags["CB"] = ("Z", cb)
                if not no_umi:
                    if ur_only:
                        r.tags["UR"] = ("Z", umi)
                    else:
                        r.tags["UB"] = ("Z", umi)
                        r.tags["UR"] = ("Z", umi)

            missing_cb = kind == 7  # skipped by the CB rule
            ur_only = kind == 8     # UB->UR fallback
            # rare: a kept record with NO UMI at all — both pipelines must
            # raise the same "Could not read UMI" after identical output
            no_umi = kind == 5 and rng.random() < 0.1
            if kind == 9:
                # unpaired read (dummy-pair injection downstream)
                r = BamRecord(
                    qname=f"q{qn:06d}", flag=0, pos=300, mpos=-1, tlen=0,
                    seq=frag, qual=bytes([30 + int(rng.integers(0, 10))]
                                         * len(frag)),
                    tid=0, mtid=-1, mapq=60,
                )
                qn += 1
                tag(r, missing_cb, ur_only, no_umi)
                records.append(r)
                continue
            rev1 = bool(rng.integers(0, 2))
            frag2 = revcomp(frag) if rng.random() < 0.5 else rand_seq(
                rng, len(frag))
            r1 = BamRecord(
                qname=f"q{qn:06d}",
                flag=(FLAG_PAIRED | FLAG_FIRST_IN_TEMPLATE
                      | (FLAG_REVERSE if rev1 else 0)
                      | (0 if rev1 else FLAG_MATE_REVERSE)),
                pos=100, mpos=200, tlen=150,
                seq=frag, qual=bytes([37] * len(frag)),
                tid=0, mtid=0, mapq=60,
            )
            r2 = BamRecord(
                qname=f"q{qn:06d}",
                flag=(FLAG_PAIRED | FLAG_LAST_IN_TEMPLATE
                      | (0 if rev1 else FLAG_REVERSE)
                      | (FLAG_MATE_REVERSE if rev1 else 0)),
                pos=200, mpos=100, tlen=-150,
                seq=frag2, qual=bytes([37] * len(frag2)),
                tid=0, mtid=0, mapq=60,
            )
            qn += 1
            tag(r1, missing_cb, ur_only, no_umi)
            tag(r2, missing_cb, ur_only, no_umi)
            if kind == 6 and rng.random() < 0.5:
                records.append(r1)  # orphan: mate never written
            else:
                records.extend([r1, r2])
    return records


def run_both(bam, engine, ref, cfg, quirks, td, tag):
    outs = []
    for name, fn in (("fast", process_fast), ("slow", bam_pipeline.process)):
        out = f"{td}/{tag}_{name}.tsv.gz"
        err = ""
        try:
            with contextlib.redirect_stdout(io.StringIO()):
                fn([bam], [engine], [ref], [cfg], [out], 2, False,
                   parity_quirks=quirks)
        except Exception as e:  # error parity: type+message must match
            err = f"{type(e).__name__}: {e}"
        try:
            body = gzip.open(out, "rb").read()
        except Exception:
            body = b""
        outs.append((err + "\n").encode() + body)
    return outs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=20.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    t_end = time.time() + args.minutes * 60
    trials = recs = 0
    with tempfile.TemporaryDirectory() as td:
        while time.time() < t_end:
            child = int(rng.integers(0, 2**63 - 1))
            crng = np.random.default_rng(child)
            feats = [rand_seq(crng, int(crng.integers(80, 300)))
                     for _ in range(int(crng.integers(2, 6)))]
            doubled = [x for f in feats for x in (f, revcomp(f))]
            names = []
            for i in range(len(feats)):
                names += [f"f{i}", f"f{i}§rev"]
            ref = Reference(
                group_on=0, headers=["sequence_name", "sequence"],
                columns=[names, doubled], sequence_name_idx=0,
                sequence_idx=1,
            )
            cfg = AlignFilterConfig(
                reference_genome_size=len(doubled),
                score_percent=float(crng.choice([0.1, 0.33, 0.5])),
                score_threshold=int(crng.choice([25, 45, 60])),
                num_mismatches=int(crng.integers(0, 4)),
                max_hits_to_report=10,
                require_valid_pair=bool(crng.integers(0, 2)),
            )
            engine = DeviceAlignEngine(build_index(doubled), cfg)
            records = make_stream(crng, feats)
            bam = f"{td}/fuzz.bam"
            header = BamHeader(
                text="@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:chr1\tLN:1000000\n",
                references=[("chr1", 1_000_000)],
            )
            write_bam(bam, header, records)
            for quirks in (True, False):
                a, b = run_both(bam, engine, ref, cfg, quirks, td,
                                f"t{trials}")
                if a != b:
                    print(f"FAILED trial {trials} child_seed={child} "
                          f"quirks={quirks}", flush=True)
                    raise AssertionError("fast/slow BAM outputs diverge")
            trials += 1
            recs += len(records)
            if trials % 10 == 0:
                print(f"{trials} trials, {recs} records, byte-identical",
                      flush=True)
                # per-trial engines compile fresh shapes; drop the
                # in-process XLA cache so long campaigns don't OOM
                jax.clear_caches()
    print(f"DONE: {trials} trials, {recs} records, zero divergences",
          flush=True)


if __name__ == "__main__":
    main()
