"""Synthetic 10x-style scRNA-seq BAM generation.

The reference's BAM integration fixtures (`tests/test-sequences/reads/
sample.bam`) are git-LFS objects that are not vendored, so the framework
ships its own generator: UMI-run-ordered records with CB/UB tags, paired
R1/R2 with correct orientation flags, optional unpaired records, and
optional 124bp reads exercising the 10x clip rule.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from nimble_tpu.io.bam import (
    FLAG_FIRST_IN_TEMPLATE,
    FLAG_LAST_IN_TEMPLATE,
    FLAG_MATE_REVERSE,
    FLAG_PAIRED,
    FLAG_REVERSE,
    BamHeader,
    BamRecord,
    BamStreamWriter,
    write_bam,
)
from nimble_tpu.utils.dna import revcomp

_BASES = np.array(list("ACGT"))


def _random_umi(rng) -> str:
    while True:
        umi = "".join(rng.choice(_BASES, size=10))
        if umi != "AAAAAAAAAA":
            return umi


def make_synthetic_bam(
    path: str,
    library_seqs: Sequence[str],
    *,
    n_groups: int = 4,
    pairs_per_group: int = 2,
    read_len: int = 70,
    unpaired_per_group: int = 0,
    seed: int = 0,
    mutate_every: Optional[int] = None,
    pad_to_124: bool = False,
    stream: bool = False,
) -> int:
    """Write a synthetic BAM; returns the number of records written.

    Each UMI×CB group draws fragments from ``library_seqs``; R2 mates are
    stored reverse-complemented with the REVERSE flag set, so the pipeline's
    orientation correction recovers the forward fragment.  With
    ``mutate_every=n`` every n-th fragment gets one substitution.  With
    ``pad_to_124`` fragments are extended to 124bp with 13 leading junk
    bases (clipped away by the 10x rule).  With ``stream=True`` records are
    written incrementally (same bytes) — reference-scale fixtures never
    materialize in memory.
    """
    rng = np.random.default_rng(seed)
    records: List[BamRecord] = []
    qname_counter = 0
    frag_counter = 0

    def sample_fragment() -> str:
        nonlocal frag_counter
        src = library_seqs[int(rng.integers(0, len(library_seqs)))]
        L = min(read_len, len(src))
        start = int(rng.integers(0, max(len(src) - L, 0) + 1))
        frag = src[start : start + L].upper().replace("U", "T")
        if mutate_every and frag_counter % mutate_every == mutate_every - 1:
            p = int(rng.integers(0, len(frag)))
            frag = frag[:p] + str(rng.choice([b for b in "ACGT" if b != frag[p]])) + frag[p + 1 :]
        frag_counter += 1
        return frag

    def finish_seq(frag: str, reverse: bool) -> str:
        """Pad a fragment the way it would appear in a genome-aligned BAM.

        BAM SEQ is stored reference-forward regardless of strand; the
        REVERSE flag records that the original read was the reverse
        complement.  The pipeline's orientation correction
        (`src/process/bam.rs:322-326`) revcomps flagged reads, so a
        REVERSE-flagged record whose stored seq is a forward library
        fragment ends up hitting the §rev library row — like real 10x data.
        """
        seq = frag
        if pad_to_124 and len(seq) < 124:
            junk = "".join(rng.choice(_BASES, size=124 - len(seq)))
            # forward reads are clipped CLIP_LENGTH from the 5' end,
            # reverse reads from the 3' end — put the junk there
            seq = junk + seq if not reverse else seq + junk
        return seq

    writer = None
    if stream:
        header = BamHeader(
            text="@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:chr1\tLN:1000000\n",
            references=[("chr1", 1_000_000)],
        )
        writer = BamStreamWriter(path, header)
        n_written = 0

    for g in range(n_groups):
        umi = _random_umi(rng)
        cb = f"CB{g:06d}-1"
        for p in range(pairs_per_group):
            qname = f"read{qname_counter:06d}"
            qname_counter += 1
            frag1, frag2 = sample_fragment(), sample_fragment()
            seq1 = finish_seq(frag1, reverse=False)
            seq2 = finish_seq(frag2, reverse=True)
            common = dict(tid=0, mtid=0, mapq=60)
            r1 = BamRecord(
                qname=qname,
                flag=FLAG_PAIRED | FLAG_FIRST_IN_TEMPLATE | FLAG_MATE_REVERSE,
                pos=100 + p, mpos=200 + p, tlen=150,
                seq=seq1, qual=bytes([40] * len(seq1)), **common,
            )
            r2 = BamRecord(
                qname=qname,
                flag=FLAG_PAIRED | FLAG_LAST_IN_TEMPLATE | FLAG_REVERSE,
                pos=200 + p, mpos=100 + p, tlen=-150,
                seq=seq2, qual=bytes([40] * len(seq2)), **common,
            )
            for r in (r1, r2):
                r.tags["CB"] = ("Z", cb)
                r.tags["UB"] = ("Z", umi)
                r.tags["CR"] = ("Z", cb[:-2])
                r.tags["UR"] = ("Z", umi)
            if writer is not None:
                writer.add(r1)
                writer.add(r2)
                n_written += 2
            else:
                records.extend([r1, r2])
        for u in range(unpaired_per_group):
            qname = f"read{qname_counter:06d}"
            qname_counter += 1
            frag = sample_fragment()
            seq = finish_seq(frag, reverse=False)
            r = BamRecord(
                qname=qname, flag=0, pos=300 + u, mpos=-1, tlen=0,
                seq=seq, qual=bytes([40] * len(seq)), tid=0, mtid=-1, mapq=60,
            )
            r.tags["CB"] = ("Z", cb)
            r.tags["UB"] = ("Z", umi)
            if writer is not None:
                writer.add(r)
                n_written += 1
            else:
                records.append(r)

    if writer is not None:
        writer.close()
        return n_written

    header = BamHeader(
        text="@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:chr1\tLN:1000000\n",
        references=[("chr1", 1_000_000)],
    )
    write_bam(path, header, records)
    return len(records)
