#!/usr/bin/env python
"""Virtual-mesh scaling curve: shard_map/psum overhead vs compute.

Fixed total work (one read matrix) through `MeshAlignEngine` at every mesh
shape over the 8 virtual CPU devices.  The virtual devices TIMESHARE the
same host cores, so with zero partitioning overhead every shape would take
the same wall time as the single-chip engine; the ratio

    efficiency(shape) = t_single / t_mesh(shape)

isolates exactly what the mesh machinery (shard_map dispatch, the model-axis
pmax/psum owner-merges, padded per-shard batches) costs — the piece of the
BASELINE.md >=0.9 ICI-scaling target measurable without multi-chip hardware.
On real chips the compute term divides by P while the collective term rides
ICI, so measured-here overhead is an upper bound on the per-step overhead
there.

Usage: python scripts/mesh_scaling.py [--reads 65536] [--rounds 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=65536)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from bench import build_workload
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.models.mesh_aligner import MeshAlignEngine

    index, reference, cfg, mat, lens = build_workload(n_reads=args.reads)
    n_dev = len(jax.devices())
    assert n_dev >= 8, f"need 8 virtual devices, got {n_dev}"

    def timed(run):
        run()  # compile + warm
        best = 1e9
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        return best

    single = DeviceAlignEngine(index, cfg)
    ref_out = single.align_raw_compact_from_matrix(mat, lens)
    t_single = timed(lambda: single.align_raw_compact_from_matrix(mat, lens))
    rps = args.reads / t_single
    print(f"single-chip engine : {t_single:7.3f}s  ({rps:10,.0f} reads/s)")

    shapes = [(1, 1), (2, 1), (4, 1), (8, 1), (1, 2), (4, 2), (2, 4), (1, 8)]
    rows = []
    for data, model in shapes:
        if data * model > n_dev:
            continue
        mesh = jax.make_mesh((data, model), ("data", "model"))
        eng = MeshAlignEngine(index, cfg, mesh=mesh)
        out = eng.align_raw_compact_from_matrix(mat, lens)
        # bit-equality against the single-chip engine on the shared flags
        for key in ("passed", "needs_host"):
            np.testing.assert_array_equal(out[key], ref_out[key], err_msg=key)
        t = timed(lambda e=eng: e.align_raw_compact_from_matrix(mat, lens))
        eff = t_single / t
        rows.append((data, model, t, eff))
        print(f"mesh ({data},{model})        : {t:7.3f}s  "
              f"(efficiency {eff:5.3f})")

    print("\n| mesh (data,model) | wall s | efficiency vs single |")
    print("|---|---|---|")
    print(f"| single | {t_single:.3f} | 1.000 |")
    for data, model, t, eff in rows:
        print(f"| ({data},{model}) | {t:.3f} | {eff:.3f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
