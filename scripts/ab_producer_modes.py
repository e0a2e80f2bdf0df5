"""ABBA A/B of BAM producer prefetch modes (producer-only, no device).

NIMBLE_BAM_PREFETCH is read per batches() call, so modes alternate in one
process and CPU/cache drift cancels to first order.

    python scripts/ab_producer_modes.py --a 2 --b 1 [--rounds 12]
"""

import argparse
import contextlib
import io
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="2")
    ap.add_argument("--b", default="1")
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--groups", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=16384)
    args = ap.parse_args()

    from bench import build_workload
    from nimble_tpu.io.bam_columnar import ColumnarGroupStream
    from nimble_tpu.io.synth import make_synthetic_bam

    _, reference, _, _, _ = build_workload(n_reads=1)
    feats = reference.columns[1][0::2]
    td = tempfile.mkdtemp()
    bam = f"{td}/ab.bam"
    n_records = make_synthetic_bam(
        bam, feats, n_groups=args.groups, pairs_per_group=4,
        read_len=90, seed=1, mutate_every=5,
    )
    print(f"BAM: {n_records} records / {args.groups} groups", flush=True)

    def run_once(mode: str) -> float:
        os.environ["NIMBLE_BAM_PREFETCH"] = mode
        stream = ColumnarGroupStream(bam, False)
        t0 = time.time()
        n = 0
        with contextlib.redirect_stdout(io.StringIO()):
            for b in stream.batches(args.batch):
                n += len(b)
        return time.time() - t0

    for name, mode in (("A", args.a), ("B", args.b)):
        print(f"warmup {name}: {run_once(mode):.3f}s", flush=True)

    base = ["A", "B", "B", "A"]
    sched = (base * ((args.rounds + 3) // 4))[: args.rounds]
    res = {"A": [], "B": []}
    for name in sched:
        mode = args.a if name == "A" else args.b
        dt = run_once(mode)
        res[name].append(dt)
        print(f"{name}(mode={mode}): {dt:.3f}s -> "
              f"{n_records/dt:,.0f} rec/s", flush=True)
    for name in ("A", "B"):
        ts = np.array(res[name])
        mode = args.a if name == "A" else args.b
        print(f"{name} (mode={mode}): best={n_records/ts.min():,.0f} "
              f"median={n_records/np.median(ts):,.0f} rec/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
