"""Moderate-scale parity: a library ~10x larger than the other fixtures.

Every other test uses <=50-feature libraries; production nimble libraries
(and the BASELINE workloads) are larger.  This pins that the bucketized
device table, the span walk and the host tail stay byte-exact against the
NumPy host oracle when the key set is in the hundreds of thousands and
anchor buckets start colliding.
"""

import numpy as np

from nimble_tpu.config import AlignFilterConfig
from nimble_tpu.core.fast_count import fast_count_calls
from nimble_tpu.index.build import build_index
from nimble_tpu.library import Reference
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.core.calls import HostAlignEngine
from nimble_tpu.utils.dna import encode_bases, revcomp


def _library(rng, n_features=400, feat_len=400):
    feats = ["".join(rng.choice(list("ACGT"), size=feat_len))
             for _ in range(n_features)]
    doubled = [x for s in feats for x in (s, revcomp(s))]
    names = []
    for i in range(n_features):
        names += [f"f{i:04d}", f"f{i:04d}§rev"]
    ref = Reference(
        group_on=0, headers=["sequence_name", "sequence"],
        columns=[names, doubled], sequence_name_idx=0, sequence_idx=1,
    )
    return feats, doubled, ref


def test_scale_device_matches_host_oracle():
    rng = np.random.default_rng(12021)
    feats, doubled, ref = _library(rng)
    cfg = AlignFilterConfig(
        score_percent=0.33, score_threshold=50, num_mismatches=1,
        max_hits_to_report=10,
    )
    index = build_index(doubled)
    # ~300k distinct 30-mers: the table is orders beyond the small fixtures
    assert len(index.keys_sorted) > 250_000

    # reads: clean fragments, one-substitution fragments, chimeric
    # (cross-feature) splices, and junk
    reads = []
    for i in range(1500):
        f = int(rng.integers(0, len(doubled)))
        s = int(rng.integers(0, 300))
        frag = list(doubled[f][s : s + 72])
        kind = i % 4
        if kind == 1:  # one substitution mid-read
            p = int(rng.integers(0, len(frag)))
            frag[p] = "ACGT"[(("ACGT".index(frag[p])) + 1) % 4]
        elif kind == 2:  # chimera: head of one feature, tail of another
            g = int(rng.integers(0, len(doubled)))
            frag[40:] = list(doubled[g][s : s + len(frag) - 40])
        elif kind == 3 and i % 8 == 3:  # junk
            frag = list("".join(rng.choice(list("ACGT"), size=72)))
        reads.append(encode_bases("".join(frag)))

    host = HostAlignEngine(index, cfg)
    dev = DeviceAlignEngine(index, cfg)
    # per-read parity (scores, eq classes, filter reasons)
    host_res = host.align_batch(reads)
    dev_res = dev.align_batch(reads)
    assert len(host_res) == len(dev_res)
    for i, (h, d) in enumerate(zip(host_res, dev_res)):
        assert h == d, f"read {i}: host={h} device={d}"
    # end-to-end counts through the fast path
    got = fast_count_calls(reads, None, dev, ref, cfg)
    assert len(got) > 100  # the corpus must spread across the library
