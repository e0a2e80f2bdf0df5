"""Engine with the Pallas walk vs the scan walk (interpret mode on CPU)."""

import numpy as np
from jax.experimental.pallas import tpu as pltpu

from nimble_tpu.config import AlignFilterConfig
from nimble_tpu.core.fast_count import fast_count_calls
from nimble_tpu.index.build import build_index
from nimble_tpu.library import Reference
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.utils.dna import encode_bases, revcomp


def test_pallas_engine_matches_scan_engine():
    rng = np.random.default_rng(31)
    feats = ["".join(rng.choice(list("ACGT"), size=200)) for _ in range(5)]
    doubled = [x for s in feats for x in (s, revcomp(s))]
    names = []
    for i in range(5):
        names += [f"f{i}", f"f{i}§rev"]
    ref = Reference(
        group_on=0, headers=["sequence_name", "sequence"],
        columns=[names, doubled], sequence_name_idx=0, sequence_idx=1,
    )
    cfg = AlignFilterConfig(
        score_percent=0.2, score_threshold=40, num_mismatches=1,
        max_hits_to_report=8,
    )
    index = build_index(doubled)

    reads = []
    for _ in range(150):
        f = int(rng.integers(0, len(doubled)))
        s = int(rng.integers(0, 140))
        frag = doubled[f][s : s + 55]
        reads.append(encode_bases(frag))

    scan_engine = DeviceAlignEngine(index, cfg)
    expected = fast_count_calls(reads, None, scan_engine, ref, cfg)

    pallas_engine = DeviceAlignEngine(index, cfg, use_pallas_walk=True)
    with pltpu.force_tpu_interpret_mode():
        got = fast_count_calls(reads, None, pallas_engine, ref, cfg)
    assert got == expected
    assert len(got) > 0
