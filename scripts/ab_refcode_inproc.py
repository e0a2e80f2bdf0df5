"""Same-process interleaved A/B of the reference-coded upload.

One engine, one tunnel session; NIMBLE_REFCODE is toggled between timed
rounds in an ABBA-mirrored order so tunnel-weather drift cancels to first
order.  Run on the TPU backend:

    python scripts/ab_refcode_inproc.py [--rounds 12] [--reads 524288]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--reads", type=int, default=524288)
    ap.add_argument("--chunk", type=int, default=131072)
    ap.add_argument("--depth", type=int, default=3)
    args = ap.parse_args()

    from bench import build_workload
    import nimble_tpu.models.aligner as al
    from nimble_tpu.core.fast_count import FastCounter
    from nimble_tpu.models.aligner import DeviceAlignEngine

    index, reference, cfg, mat, lens = build_workload(n_reads=args.reads)
    engine = DeviceAlignEngine(index, cfg)

    n_chunks = max(1, args.reads // args.chunk)
    bounds = [
        (i * args.reads // n_chunks, (i + 1) * args.reads // n_chunks)
        for i in range(n_chunks)
    ]

    def run_round() -> float:
        t0 = time.time()
        counter = FastCounter(engine, reference, cfg)
        pending: list = []
        for lo, hi in bounds:
            pending.append(counter.dispatch_async(mat[lo:hi], lens[lo:hi]))
            if len(pending) >= args.depth:
                counter.process(pending.pop(0))
        while pending:
            counter.process(pending.pop(0))
        counter.finalize()
        return time.time() - t0

    # warm BOTH variants (compiles + first-transfer)
    for flag in (True, False):
        al._REFCODE = flag
        dt = run_round()
        print(f"warmup refcode={int(flag)}: {dt:.3f}s", flush=True)

    # ABBA-mirrored schedule cancels linear drift
    base = [True, False, False, True]
    sched = (base * ((args.rounds + 3) // 4))[: args.rounds]
    on, off = [], []
    for flag in sched:
        al._REFCODE = flag
        dt = run_round()
        (on if flag else off).append(dt)
        print(
            f"refcode={int(flag)}: {dt:.3f}s -> {args.reads/dt:,.0f} reads/s",
            flush=True,
        )

    for name, ts in (("ON", on), ("OFF", off)):
        ts = np.array(ts)
        print(
            f"{name}: n={len(ts)} best={args.reads/ts.min():,.0f} "
            f"median={args.reads/np.median(ts):,.0f} reads/s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
