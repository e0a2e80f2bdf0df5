"""Pre-upload dedupe on the full-output path (BAM consumer's align).

`DeviceAlignEngine.full_dispatch` groups identical packed read rows and
aligns each distinct row once; `full_collect` scatters results back via
the inverse mapping.  Duplicates must get results IDENTICAL to the 1:1
path — including rescue ids being per-original-row.
"""

import numpy as np

from nimble_tpu.config import AlignFilterConfig
from nimble_tpu.index.build import build_index
from nimble_tpu.models.aligner import DeviceAlignEngine, dedupe_packed_rows
from nimble_tpu.utils.dna import encode_bases, revcomp


def test_dedupe_packed_rows_invariants():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, size=(37, 25), dtype=np.uint8)
    buf = base[rng.integers(0, 37, size=300)]
    first, inv = dedupe_packed_rows(buf)
    # representative expansion reproduces every row exactly
    np.testing.assert_array_equal(buf[first][inv], buf)
    # each group's representative is content-identical to its members
    assert len(first) == len(np.unique(buf.view([("", "V25")]).ravel()))


def test_full_path_duplicates_match_unique_run():
    rng = np.random.default_rng(9)
    feats = ["".join(rng.choice(list("ACGT"), size=300)) for _ in range(6)]
    doubled = [x for f in feats for x in (f, revcomp(f))]
    cfg = AlignFilterConfig(
        reference_genome_size=len(doubled), score_percent=0.2,
        score_threshold=40, num_mismatches=1, max_hits_to_report=10,
    )
    index = build_index(doubled)
    eng = DeviceAlignEngine(index, cfg)

    # 40 distinct reads (some mutated, one junk), then tile to 160 rows
    reads = []
    for i in range(40):
        f = feats[i % 6]
        s = (i * 7) % 200
        r = list(f[s : s + 80])
        if i % 3 == 0:
            r[10] = "ACGT"[(i // 3) % 4]
        reads.append(encode_bases("".join(r)))
    reads_dup = [reads[i % 40] for i in range(160)]
    W = 80
    mat = np.zeros((160, W), dtype=np.int8)
    lens = np.zeros(160, dtype=np.int32)
    for i, r in enumerate(reads_dup):
        mat[i, : len(r)] = r
        lens[i] = len(r)
    act = np.ones(160, dtype=bool)

    got = eng.full_collect(eng.full_dispatch(mat, lens, act))
    # the unique prefix run equals the deduped run row-for-row
    ref = eng.full_collect(eng.full_dispatch(mat[:40], lens[:40], act[:40]))
    for key in ("reason", "norm", "score"):
        for i in range(160):
            assert got[key][i] == ref[key][i % 40], (key, i)
    # eq keys: device combos equal directly; rescued ids may differ but
    # must decode to the same eq class
    for i in range(160):
        k_g, k_r = got["eq_key"][i], ref["eq_key"][i % 40]
        if k_r >= 0 or k_r == -1:
            assert k_g == k_r, i
        else:
            assert k_g <= -2 and got["rescued"][k_g] == ref["rescued"][k_r], i
