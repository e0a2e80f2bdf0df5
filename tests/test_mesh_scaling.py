"""Mesh overhead regression: the data-parallel mesh must stay cheap.

scripts/mesh_scaling.py measures the full curve (STATUS.md round-4 table).
The virtual CPU devices timeshare the same host cores, so with zero
partitioning overhead a mesh run costs the same wall time as the
single-chip engine; the measured round-4 curve put pure data-parallel
meshes at efficiency >= 1.2 (the virtual devices actually parallelize the
host compute) and model sharding at the expected ~1/P (every shard probes
every read against its table shard — model sharding exists for
larger-than-HBM tables, not speed).

This test pins the data-parallel result with a LOOSE bound so a future
regression in the shard_map step (extra collectives, lost pmax merge,
per-launch resharding) is caught without CI timing flakes.
"""

import time

import jax
import numpy as np
import pytest

from nimble_tpu.config import AlignFilterConfig
from nimble_tpu.index.build import build_index
from nimble_tpu.library import Reference
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.models.mesh_aligner import MeshAlignEngine
from nimble_tpu.utils.dna import revcomp


def _workload(n_reads=16384, n_features=20, feat_len=300, seed=0):
    rng = np.random.default_rng(seed)
    feats = ["".join(rng.choice(list("ACGT"), size=feat_len))
             for _ in range(n_features)]
    doubled = [x for s in feats for x in (s, revcomp(s))]
    cfg = AlignFilterConfig(
        reference_genome_size=len(doubled), score_percent=0.33,
        score_threshold=50, num_mismatches=1, max_hits_to_report=10,
    )
    index = build_index(doubled)
    from nimble_tpu.utils.dna import encode_bases

    base_codes = np.stack([encode_bases(s) for s in doubled])
    rows = rng.integers(0, len(doubled), n_reads)
    starts = rng.integers(0, feat_len - 90, n_reads)
    mat = base_codes[rows[:, None], starts[:, None] + np.arange(90)]
    mat = np.ascontiguousarray(mat, dtype=np.int8)
    lens = np.full(n_reads, 90, dtype=np.int32)
    return index, cfg, mat, lens


def _best_of(run, rounds=2):
    run()  # compile + warm
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_collective_inventory():
    """Timing-free regression guard on the sharded step's ICI traffic.

    The (data x model) step's compiled HLO must contain exactly the
    designed collectives: ONE pmax all-reduce (the (B,) encoded anchor
    owner-merge) plus ONE fused psum all-reduce (the owner-masked result
    columns), and NO resharding collectives at all.  A reintroduced
    per-position (B, P) psum (the round-3 formulation this replaced) or a
    shard_map spec change that makes XLA insert all-gathers would trip
    the op-count or byte bound without any timing involved — unlike the
    wall-clock efficiency floor below, this cannot flake on a loaded CI
    host.
    """
    import re

    index, cfg, mat, lens = _workload(n_reads=2048)
    mesh = jax.make_mesh((4, 2), ("data", "model"))
    eng = MeshAlignEngine(index, cfg, mesh=mesh)
    bucket = int(eng.buckets[-1])
    step = eng._step_for(bucket)
    B = eng.launch_batch
    buf = eng._pack(mat[: min(len(mat), B)], lens[: min(len(lens), B)],
                    bucket, B)
    txt = step.lower(buf, *eng._dev, eng._s_min_dev(bucket)).compile().as_text()

    n_ar = txt.count(" all-reduce(") + txt.count(" all-reduce-start(")
    assert n_ar == 2, f"expected exactly 2 all-reduces (pmax + fused psum), got {n_ar}"
    for forbidden in (" all-gather(", " all-gather-start(", " all-to-all(",
                      " collective-permute(", " collective-permute-start(",
                      " reduce-scatter("):
        assert txt.count(forbidden) == 0, (
            f"unexpected resharding collective {forbidden.strip()} in the "
            f"sharded step HLO"
        )

    # byte bound: every all-reduced operand is (B,)-shaped (per-shard B);
    # the old per-position psum shipped (B, P~67) and would blow this up.
    # Parse both single shapes `= s32[8192]{0} all-reduce(` and tuple
    # shapes `= (s32[8192]{0}, ...) all-reduce(`.
    total_elems = 0
    for m in re.finditer(r"= (\([^)]*\)|\S+) all-reduce", txt):
        for shape in re.finditer(r"[a-z]\d+\[([\d,]*)\]", m.group(1)):
            dims = [int(x) for x in shape.group(1).split(",") if x]
            total_elems += int(np.prod(dims)) if dims else 1
    b_shard = B // 4  # data axis = 4
    assert 0 < total_elems <= 8 * b_shard, (
        f"all-reduced element count {total_elems} exceeds 8 x per-shard "
        f"batch ({8 * b_shard}) — a (B, P)-shaped collective regressed in"
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_data_parallel_mesh_overhead_bounded():
    index, cfg, mat, lens = _workload()
    single = DeviceAlignEngine(index, cfg)
    ref = single.align_raw_compact_from_matrix(mat, lens)
    t_single = _best_of(
        lambda: single.align_raw_compact_from_matrix(mat, lens))

    mesh = jax.make_mesh((8, 1), ("data", "model"))
    eng = MeshAlignEngine(index, cfg, mesh=mesh)
    out = eng.align_raw_compact_from_matrix(mat, lens)
    for key in ("passed", "needs_host"):
        np.testing.assert_array_equal(out[key], ref[key], err_msg=key)
    t_mesh = _best_of(lambda: eng.align_raw_compact_from_matrix(mat, lens))

    # round-4 measured efficiency ~1.5 on this machine; 0.6 is the loose
    # regression floor (shard_map machinery suddenly costing >1.6x single
    # wall would trip it, CI noise will not)
    eff = t_single / t_mesh
    assert eff >= 0.6, (
        f"(8,1) data-parallel mesh efficiency {eff:.3f} < 0.6 "
        f"(single {t_single:.3f}s vs mesh {t_mesh:.3f}s)"
    )
