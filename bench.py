#!/usr/bin/env python
"""Throughput benchmark: FASTQ-path alignment+counting, reads/sec/chip.

Workload: a synthetic custom reference library (50 features x 500 bp, like
the KIR-style libraries nimble targets) against 10x-style 90 bp reads with a
salted mismatch fraction — the end-to-end device counting path
(`align_raw_from_matrix` + vectorized dedupe/combo counting), which is what
the FASTQ pipeline runs per library.

Baseline note: the reference publishes NO benchmark numbers anywhere (see
BASELINE.md) and no Rust toolchain exists in this image to measure it, so
``vs_baseline`` is reported against the HIGH END of a defended estimate
range for the reference's single-process throughput: 20,000-170,000
reads/s, derived in BASELINE.md ("Defended baseline estimate") from the
kallisto paper's headline pace, per-core quasi-mapping figures, and a
work-per-read comparison against the reference's hot loop.  Dividing by
170k credits the reference with kallisto's full machine-level headline
despite its strictly heavier per-read work — deliberately generous.  The
JSON carries the range so the multiple can be re-derived at any other
point in it (rounds 1-2 used a 50k mid-range estimate; x50/170 to compare).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# High end of the defended 20k-170k reads/s estimate range (BASELINE.md,
# "Defended baseline estimate") — generous to the reference by design.
BASELINE_RANGE_READS_PER_SEC = (20_000.0, 170_000.0)
RUST_BASELINE_READS_PER_SEC = BASELINE_RANGE_READS_PER_SEC[1]
_base_note = {"baseline_range_reads_per_sec": list(BASELINE_RANGE_READS_PER_SEC)}


def build_workload(n_features=50, feat_len=500, read_len=90, n_reads=1 << 16, seed=0):
    from nimble_tpu.config import AlignFilterConfig
    from nimble_tpu.index.build import build_index
    from nimble_tpu.library import Reference
    from nimble_tpu.utils.dna import encode_bases, revcomp

    rng = np.random.default_rng(seed)
    feats = ["".join(rng.choice(list("ACGT"), size=feat_len)) for _ in range(n_features)]
    doubled = [x for s in feats for x in (s, revcomp(s))]
    names = []
    for i in range(n_features):
        names.append(f"feature{i}")
        names.append(f"feature{i}§rev")
    reference = Reference(
        group_on=0,
        headers=["sequence_name", "sequence"],
        columns=[names, doubled],
        sequence_name_idx=0,
        sequence_idx=1,
    )
    cfg = AlignFilterConfig(
        reference_genome_size=len(doubled),
        score_percent=0.33,
        score_threshold=50,
        num_mismatches=1,
        max_hits_to_report=10,
    )
    index = build_index(doubled)

    # reads: sampled fragments; ~20% carry one substitution, ~5% are junk
    rows = rng.integers(0, len(doubled), n_reads)
    starts = rng.integers(0, feat_len - read_len, n_reads)
    base_codes = np.stack([encode_bases(s) for s in doubled])
    mat = base_codes[rows[:, None], starts[:, None] + np.arange(read_len)]
    mat = np.ascontiguousarray(mat, dtype=np.int8)
    mutate = rng.random(n_reads) < 0.2
    pos = rng.integers(0, read_len, n_reads)
    delta = rng.integers(1, 4, n_reads).astype(np.int8)
    mat[mutate, pos[mutate]] = (mat[mutate, pos[mutate]] + delta[mutate]) % 4
    junk = rng.random(n_reads) < 0.05
    mat[junk] = rng.integers(0, 4, (junk.sum(), read_len), dtype=np.int8)
    lens = np.full(n_reads, read_len, dtype=np.int32)
    return index, reference, cfg, mat, lens


def measure_kernel_ns_per_read(engine, mat, lens, log, n_launches=16):
    """Weather-independent device-resident kernel time, ns/read.

    The headline reads/s number is dominated by tunnel weather (±30%
    between windows), which can hide real kernel progress round-over-round
    (rounds 3 and 4 were indistinguishable in BENCH_r0N despite a measured
    kernel change).  This measures ONLY the device-resident compute: pack
    one launch_batch of reads, upload once, then enqueue N async kernel
    launches (alternating two identical-value buffers so nothing caches)
    and block once — (wall - one_launch) / (N - 1) amortizes submission
    overhead and excludes all wire time.  Method per round-4 findings:
    async-N, never scan-nesting.
    """
    import jax
    import jax.numpy as jnp

    lb = engine.launch_batch
    bucket_arr = np.asarray(engine.buckets)
    bucket = int(bucket_arr[np.searchsorted(bucket_arr, int(lens.max()))])
    m = min(mat.shape[0], lb)
    buf = engine._pack_reads(mat[:m], lens[:m], bucket, lb)
    buf3 = buf.reshape(1, lb, buf.shape[1])
    x1 = jax.device_put(jnp.asarray(buf3))
    x2 = x1 + jnp.zeros((), dtype=x1.dtype)  # distinct buffer, same value
    jax.block_until_ready(x2)

    def launch(x):
        return engine._launch_chunked_kernel(x, bucket)

    jax.block_until_ready(launch(x1))  # compile (persistent-cached)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [launch(x1 if i % 2 == 0 else x2) for i in range(n_launches)]
        jax.block_until_ready(outs[-1])
        wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(launch(x1))
        one = time.perf_counter() - t0
        best = min(best, max(wall - one, 0.0) / (n_launches - 1))
    ns = best / lb * 1e9
    log(f"kernel: {best*1e3:.3f} ms / {lb}-read launch = {ns:.0f} ns/read")
    return ns


def bench_bam(args, log) -> dict:
    """End-to-end threaded BAM pipeline throughput (records/s)."""
    import tempfile

    from nimble_tpu.index.build import build_index
    from nimble_tpu.io.synth import make_synthetic_bam
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.pipeline import bam_pipeline

    index, reference, cfg, _, _ = build_workload(n_reads=1)
    engine = DeviceAlignEngine(index, cfg)
    feats = reference.columns[1][0::2]

    from nimble_tpu import native
    from nimble_tpu.pipeline.bam_fast import process_fast

    with tempfile.TemporaryDirectory() as td:
        bam = f"{td}/bench.bam"
        n_records = make_synthetic_bam(
            bam, feats, n_groups=args.bam_groups, pairs_per_group=4,
            read_len=90, seed=1, mutate_every=5,
        )
        log(f"synthetic BAM: {n_records} records, {args.bam_groups} groups")

        import contextlib, io as _io

        use_fast = native.available()

        def run(out):
            with contextlib.redirect_stdout(_io.StringIO()):
                if use_fast:
                    process_fast(
                        [bam], [engine], [reference], [cfg], [out],
                        args.bam_cores, False,
                        batch_records=args.bam_batch,
                    )
                else:
                    bam_pipeline.process(
                        [bam], [engine], [reference], [cfg], [out],
                        args.bam_cores, False,
                    )

        run(f"{td}/warm.tsv.gz")  # warmup (compiles + tunnel setup)
        times = []
        # best-of-6: BAM rounds swing with tunnel weather AND 4-core CPU
        # scheduling; sample like the FASTQ headline does (12 rounds)
        for r in range(6):
            t0 = time.time()
            run(f"{td}/out{r}.tsv.gz")
            dt = time.time() - t0
            times.append(dt)
            log(f"bam round {r}: {dt:.2f}s -> {n_records/dt:,.0f} records/s")
    rps = n_records / min(times)
    return {
        "metric": "bam_pipeline_records_per_sec_per_chip",
        "value": round(rps, 1),
        "unit": "records/s",
        "vs_baseline": round(rps / RUST_BASELINE_READS_PER_SEC, 2),
    }


def bench_e2e(args, log) -> dict:
    """From-disk end-to-end FASTQ bench: parse -> align -> count -> TSV.

    The kernel-path headline feeds in-memory matrices; the reference's
    FASTQ number includes file ingest and output write
    (`src/process/fastq.rs:7-30`).  This mode writes the SAME synthetic
    workload to a real FASTQ on tmpfs and times the actual pipeline
    (`nimble_tpu.pipeline.fastq_pipeline.process`), so the two rates are
    directly comparable.
    """
    import contextlib
    import io as _io
    import os
    import tempfile
    import time as _time

    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.pipeline.fastq_pipeline import process

    index, reference, cfg, mat, lens = build_workload(
        n_features=args.features, feat_len=args.feat_len, n_reads=args.reads)
    d = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    fq = os.path.join(d, f"nimble_bench_e2e_{os.getpid()}.fastq")
    out = os.path.join(d, f"nimble_bench_e2e_{os.getpid()}.tsv")
    try:
        N, L = mat.shape
        base = np.frombuffer(b"ACGT", dtype=np.uint8)
        seq = base[mat.astype(np.int64)]
        qline = b"I" * L
        t0 = _time.time()
        with open(fq, "wb") as f:
            slab = 65536
            for lo in range(0, N, slab):
                body = bytearray()
                sl = seq[lo:min(N, lo + slab)]
                for i in range(sl.shape[0]):
                    body += b"@r%d\n" % (lo + i)
                    body += sl[i].tobytes()
                    body += b"\n+\n"
                    body += qline
                    body += b"\n"
                f.write(body)
        log(f"wrote {os.path.getsize(fq)/1e6:.1f} MB FASTQ in "
            f"{_time.time()-t0:.1f}s")

        engine = DeviceAlignEngine(index, cfg)

        def run():
            if os.path.exists(out):
                os.remove(out)
            with contextlib.redirect_stdout(_io.StringIO()) as cap:
                process([fq], [engine], [reference], [cfg], [out],
                        chunk_reads=args.chunk)
            return cap.getvalue()

        run()  # warmup: compiles + tunnel setup
        times = []
        for r in range(args.timed_rounds):
            t0 = _time.time()
            stages = run()
            dt = _time.time() - t0
            times.append(dt)
            log(f"e2e round {r}: {dt:.3f}s -> {args.reads/dt:,.0f} reads/s")
        log("pipeline stage meter (last round):", stages.strip())
        rps = args.reads / min(times)
        return {
            "metric": "fastq_e2e_from_disk_reads_per_sec_per_chip",
            "value": round(rps, 1),
            "unit": "reads/s",
            "vs_baseline": round(rps / RUST_BASELINE_READS_PER_SEC, 2),
        }
    finally:
        for pth in (fq, out):
            if os.path.exists(pth):
                os.remove(pth)


def bench_multihost_cpu(args, log) -> dict:
    """Multi-host overhead ratio on ONE machine: N coordinated
    `jax.distributed` CLI processes, each pinned to a disjoint 1/N of the
    CPU cores, vs ONE process using ALL cores — same total hardware, same
    total work.  Efficiency = T_single / T_multihost: it isolates what the
    multihost machinery costs (boundary-snapped parse split, content-hash
    routing exchange, count merge) from the co-located processes' shared
    memory bandwidth (which real separate hosts would not share).  This is
    the measurable form of the BASELINE 2-host target without second-host
    hardware; the align stage is embarrassingly per-host, so on real hosts
    scaling follows if this ratio stays >=0.9.
    """
    import os
    import socket
    import subprocess
    import tempfile

    n_hosts = args.multihost_cpu
    total_cores = os.cpu_count() or 2
    per = max(1, total_cores // n_hosts)
    core_sets = [
        ",".join(str(c) for c in range(h * per, (h + 1) * per))
        for h in range(n_hosts)
    ]
    # pin the single-process reference to the SAME cores the multihost run
    # uses in total, so the comparison stays "same total hardware" even
    # when total_cores isn't divisible by n_hosts
    single_cores = ",".join(str(c) for c in range(n_hosts * per))

    from nimble_tpu.utils.dna import revcomp

    rng = np.random.default_rng(0)
    feats = ["".join(rng.choice(list("ACGT"), size=500)) for _ in range(50)]
    td = tempfile.mkdtemp()
    lib = f"{td}/lib.json"
    with open(lib, "w") as f:
        json.dump([
            {"score_percent": 0.33, "score_filter": 25, "score_threshold": 50,
             "num_mismatches": 1, "discard_multiple_matches": False,
             "require_valid_pair": False, "discard_multi_hits": 0,
             "intersect_level": 0, "max_hits_to_report": 10, "group_on": "",
             "trim_target_length": 0, "trim_strictness": 0.5},
            {"headers": ["sequence_name", "sequence"],
             "columns": [[f"f{i}" for i in range(50)], feats]},
        ], f)
    # size the workload so the per-process fixed costs (~3s interpreter +
    # jax import + distributed init) are <10% of the run; mutate reads so
    # most are DISTINCT (a fully duplicate-heavy file measures only the
    # parse, which trivially scales)
    n = args.reads if args.reads != 2**19 else 6_000_000
    fastq = f"{td}/r.fastq"
    rows = rng.integers(0, 50, n)
    starts = rng.integers(0, 410, n)
    feat_mat = np.frombuffer("".join(feats).encode(), dtype=np.uint8)
    feat_mat = feat_mat.reshape(50, 500)
    reads = feat_mat[rows[:, None], starts[:, None] + np.arange(90)]
    mut_pos = rng.integers(0, 90, n)
    mut_base = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, n)]
    reads[np.arange(n), mut_pos] = mut_base
    blank = np.full((n, 1), ord("\n"), dtype=np.uint8)
    qual = np.full((n, 90), ord("I"), dtype=np.uint8)
    plus = np.tile(np.frombuffer(b"\n+\n", dtype=np.uint8), (n, 1))
    hdr = np.tile(np.frombuffer(b"@rx\n", dtype=np.uint8), (n, 1))
    body = np.concatenate([hdr, reads, plus, qual, blank], axis=1)
    with open(fastq, "wb") as f:
        f.write(body.tobytes())

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    # belt AND braces: the image's preloaded accelerator plugin pins
    # jax_platforms programmatically (JAX_PLATFORMS alone is ignored), and a
    # child that reaches the remote-TPU tunnel serializes against every other
    # child — so ALSO force cpu through the CLI's jax.config override and
    # drop the plugin injection by overwriting PYTHONPATH with just the repo
    env["NIMBLE_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))

    seq = [0]

    def run_single():
        seq[0] += 1
        out = f"{td}/single{seq[0]}.tsv"
        t0 = time.time()
        rc = subprocess.run(
            ["taskset", "-c", single_cores, sys.executable, "-m",
             "nimble_tpu.cli", "-r", lib, "-i", fastq, "-o", out],
            env=env, capture_output=True, timeout=1200,
        )
        assert rc.returncode == 0, rc.stderr.decode()[-800:]
        import shutil as _sh

        _sh.copy(out, f"{td}/single.tsv")
        return time.time() - t0

    def run_multi():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        seq[0] += 1
        outs = [f"{td}/mh{seq[0]}_{h}.tsv" for h in range(n_hosts)]
        t0 = time.time()
        procs = [
            subprocess.Popen(
                ["taskset", "-c", core_sets[h], sys.executable, "-m",
                 "nimble_tpu.cli", "-r", lib, "-i", fastq, "-o", outs[h],
                 "--num-processes", str(n_hosts), "--process-id", str(h),
                 "--coordinator", f"127.0.0.1:{port}"],
                env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
            )
            for h in range(n_hosts)
        ]
        for p in procs:
            _, err = p.communicate(timeout=1200)
            assert p.returncode == 0, err.decode()[-800:]
        dt = time.time() - t0
        assert open(outs[0]).read() == open(f"{td}/single.tsv").read()
        return dt

    run_single()  # warm compile caches
    t1 = min(run_single() for _ in range(2))
    tn = min(run_multi() for _ in range(2))
    log(f"single ({n_hosts * per} cores): {t1:.1f}s; "
        f"{n_hosts} hosts x {per} cores: {tn:.1f}s")
    eff = t1 / tn
    return {
        "metric": f"fastq_multihost{n_hosts}_overhead_efficiency",
        "value": round(eff, 3),
        "unit": "efficiency",
        "vs_baseline": round(eff / 0.9, 2),  # target >=0.9
        "t_single_s": round(t1, 1),
        "t_multi_s": round(tn, 1),
    }


def bench_multilib(args, log) -> dict:
    """N-library single-pass dispatch (MultiLibraryDispatcher): the N-library
    run should cost ~the cost of one library, vs the reference's sequential
    per-library passes (`src/process/fastq.rs:15`)."""
    import time as _time

    from nimble_tpu.core.fast_count import FastCounter, submit_transaction
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.models.multi_aligner import MultiLibraryDispatcher

    L = args.libraries
    workloads = [build_workload(n_reads=args.reads, seed=s) for s in range(L)]
    engines = [DeviceAlignEngine(w[0], w[2]) for w in workloads]
    refs = [w[1] for w in workloads]
    cfgs = [w[2] for w in workloads]
    # mixed workload: equal read share drawn from every library's features
    per = args.reads // L
    mat = np.concatenate([w[3][:per] for w in workloads])
    lens = np.concatenate([w[4][:per] for w in workloads])
    args = argparse.Namespace(**{**vars(args), "reads": len(mat)})
    multi = MultiLibraryDispatcher(engines)

    n_chunks = max(1, args.reads // args.chunk)
    bounds = [
        (i * args.reads // n_chunks, (i + 1) * args.reads // n_chunks)
        for i in range(n_chunks)
    ]

    from concurrent.futures import ThreadPoolExecutor

    from nimble_tpu import native
    from nimble_tpu.pipeline.fastq_pipeline import _dispatch_multi

    fetcher = ThreadPoolExecutor(max_workers=1)
    dispatcher = ThreadPoolExecutor(max_workers=1)

    def run_once():
        # fresh shared dedupe set per round (pipeline state, not index state)
        multi._seen = native.make_dedupe_set()
        counters = [FastCounter(engines[i], refs[i], cfgs[i]) for i in range(L)]
        pending = None

        def drain(p):
            pmat, plens, _, _, fut, pdd = p.result()
            if not pmat.shape[0]:
                return
            for counter, raw in zip(counters, fut.result()):
                counter._add_with_raw(pmat, plens, None, None, raw, None,
                                      prededuped=pdd)

        for lo, hi in bounds:
            # pipelined dispatch (dedupe + pack + upload on its own thread),
            # matching the FASTQ pipeline's _run_fast_loop discipline
            fut = dispatcher.submit(
                _dispatch_multi, multi, fetcher, mat[lo:hi], lens[lo:hi],
                None, None,
            )
            if pending is not None:
                drain(pending)
            pending = fut
        drain(pending)
        return [c.finalize() for c in counters]

    run_once()  # warmup
    times = []
    for r in range(args.timed_rounds):
        t0 = _time.time()
        results = run_once()
        dt = _time.time() - t0
        times.append(dt)
        log(f"multilib round {r}: {dt:.3f}s -> "
            f"{args.reads/dt:,.0f} reads/s across {L} libraries")
    best = min(times)
    rps = args.reads / best
    log(f"callsets per library: {[len(r) for r in results]}")
    return {
        "metric": f"fastq_multilib{L}_reads_per_sec_per_chip",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps * L / RUST_BASELINE_READS_PER_SEC, 2),
        "libraries": L,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--reads", type=int, default=1 << 19)
    p.add_argument("--chunk", type=int, default=1 << 17)
    # library scale knobs: the default mirrors nimble's KIR-style custom
    # libraries; --features 2000 --feat-len 1500 is a transcriptome-scale
    # stress (several million k-mers; the device table auto-sizes)
    p.add_argument("--features", type=int, default=50,
                   help="reference features in the synthetic library")
    p.add_argument("--feat-len", type=int, default=500,
                   help="length (bp) of each synthetic feature")
    # best-of-N: the remote-TPU tunnel's weather swings are large (round-5
    # probes measured 10 MB/s to >1 GB/s across adjacent minutes), so more
    # timed rounds = better weather sampling (rounds are ~0.4-1.5s each;
    # warmup dominates total runtime either way)
    p.add_argument("--timed-rounds", type=int, default=12)
    p.add_argument("--walk", choices=["scan", "abs", "pallas", "fused"],
                   default="scan",
                   help="walk kernel: packed-domain XLA scan (default), the"
                        " unpacked absolute-coordinate XLA walk it replaced"
                        " (abs), Pallas double-walk, or the fused Pallas"
                        " span+walk")
    p.add_argument("--bam", action="store_true",
                   help="benchmark the threaded BAM pipeline instead")
    p.add_argument("--bam-groups", type=int, default=16384)
    p.add_argument("--bam-batch", type=int, default=16384,
                   help="records per BAM device batch (transaction "
                        "amortization A/B on the tunnel)")
    # 3 = 2 consumers: on the 4-core TPU host, 3 consumers + producer +
    # logger oversubscribe (same-window A/B, scripts/ab_bam_knobs.py)
    p.add_argument("--bam-cores", type=int, default=3,
                   help="num_cores for the BAM pipeline (cores-1 consumers)")
    p.add_argument("--mesh", action="store_true",
                   help="run the FASTQ bench through MeshAlignEngine "
                        "(single-chip-degenerate mesh on 1 device)")
    p.add_argument("--e2e", action="store_true",
                   help="from-disk end-to-end FASTQ bench (parse -> align "
                        "-> count -> TSV), comparable to the reference's "
                        "fastq path")
    p.add_argument("--paired", action="store_true",
                   help="paired-end FASTQ workload (R2 = revcomp fragments)")
    p.add_argument("--multihost-cpu", type=int, default=0,
                   help="N>0: measure N-process scaling efficiency on CPU "
                        "(disjoint pinned cores per simulated host)")
    p.add_argument("--libraries", type=int, default=0,
                   help="N>0: benchmark the N-library single-pass dispatcher")
    # 3-in-flight pipelining measured marginally best on the tunnel (the
    # wire serializes transactions, so deeper helps little; 65k chunks hurt)
    p.add_argument("--depth", type=int, default=3,
                   help="max chunks in flight (drain when this many pend)")
    p.add_argument("--launch-batch", type=int, default=8192,
                   help="fixed kernel sub-launch size (per-launch overhead "
                        "amortization A/B; each size compiles once)")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)

    import os

    # persistent compilation cache: kernel shapes compile once per machine
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nimble_tpu_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    # --multihost-cpu is a host-only orchestration bench (its CLI children
    # force cpu themselves): never touch the TPU backend for it, both for
    # speed and because a transiently unreachable tunnel would abort a
    # bench that doesn't need it
    if args.cpu or args.multihost_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    # env vars are captured at jax import (which images may preload):
    # apply the cache config directly as well
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from nimble_tpu.core.fast_count import (
        FastCounter, fast_count_calls_matrix, split_stacked)
    from nimble_tpu.models.aligner import DeviceAlignEngine

    def log(*a):
        if args.verbose:
            print(*a, file=sys.stderr)

    backend_note = {}
    if not (args.cpu or args.multihost_cpu):
        # Probe the accelerator in a SUBPROCESS with a hard timeout: a
        # down/unreachable remote-TPU tunnel otherwise blocks backend init
        # for ~30 minutes before raising, which would eat the whole bench
        # window.  On probe failure fall back to CPU and say so in the
        # output — a lower honest number beats no number.
        import subprocess

        try:
            rc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=300,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc != 0:
            print("WARNING: accelerator backend unavailable; benching on "
                  "the CPU backend instead", file=sys.stderr)
            jax.config.update("jax_platforms", "cpu")
            backend_note = {"backend": "cpu_fallback"}

    log("devices:", jax.devices())

    if args.bam:
        print(json.dumps({**bench_bam(args, log), **_base_note, **backend_note}))
        return 0
    if args.e2e:
        print(json.dumps({**bench_e2e(args, log), **_base_note, **backend_note}))
        return 0
    if args.libraries:
        print(json.dumps({**bench_multilib(args, log), **_base_note, **backend_note}))
        return 0
    if args.multihost_cpu:
        print(json.dumps(bench_multihost_cpu(args, log)))
        return 0
    index, reference, cfg, mat, lens = build_workload(
        n_features=args.features, feat_len=args.feat_len, n_reads=args.reads)
    mate_mat = mate_lens = None
    if args.paired:
        # R2 mates: revcomp of the R1 fragments (hit the §rev library rows)
        W = mat.shape[1]
        ar = np.arange(W)[None, :]
        ridx = np.clip(lens[:, None] - 1 - ar, 0, W - 1)
        om = np.take_along_axis(mat, ridx, axis=1)
        mate_mat = np.where(ar < lens[:, None], 3 - om, 0).astype(np.int8)
        mate_lens = lens.copy()
    if args.mesh:
        from nimble_tpu.models.mesh_aligner import MeshAlignEngine

        n_dev = len(jax.devices())
        model = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
        mesh = jax.make_mesh((n_dev // model, model), ("data", "model"))
        engine = MeshAlignEngine(index, cfg, mesh=mesh)
        log(f"mesh: {dict(mesh.shape)}")
    else:
        engine = DeviceAlignEngine(
            index, cfg,
            use_pallas_walk={"scan": False, "abs": "abs", "pallas": True,
                             "fused": "fused"}[args.walk],
            launch_batch=args.launch_batch,
        )

    n_chunks = max(1, args.reads // args.chunk)
    chunk_bounds = [
        (i * args.reads // n_chunks, (i + 1) * args.reads // n_chunks)
        for i in range(n_chunks)
    ]

    # warmup: absorbs kernel compiles and the tunnel's first-transfer setup,
    # through the same chunked pathway the timed rounds use
    t0 = time.time()
    warm_counter = FastCounter(engine, reference, cfg)
    for lo, hi in chunk_bounds:
        warm_counter.process(warm_counter.dispatch(
            mat[lo:hi], lens[lo:hi],
            mate_mat[lo:hi] if mate_mat is not None else None,
            mate_lens[lo:hi] if mate_lens is not None else None,
        ))
    warm = warm_counter.finalize()
    log(f"warmup: {time.time()-t0:.1f}s, callsets={len(warm)}")

    times = []
    splits = []
    for r in range(args.timed_rounds):
        t0 = time.time()
        t_dispatch = t_collect = t_host = 0.0
        # the pipeline's feed: chunk N's fetch runs on a background thread
        # while chunk N-1's host counting executes (FastCounter.dispatch)
        counter = FastCounter(engine, reference, cfg)
        pending: list = []

        def drain_one():
            nonlocal t_collect, t_host
            handle = pending.pop(0)
            ts = time.time()
            if not isinstance(handle, tuple):
                handle = handle.result()  # dispatch_async future
            raw1 = handle[4].result() if handle[4] is not None else None
            raw2 = handle[5].result() if handle[5] is not None else None
            if raw1 is not None and handle[8]:
                # stacked R1+R2 transaction: split rows back per mate
                raw1, raw2 = split_stacked(raw1, handle[0].shape[0])
            t_collect += time.time() - ts
            ts = time.time()
            if raw1 is not None:
                counter._add_with_raw(
                    handle[0], handle[1], handle[2], handle[3], raw1, raw2,
                    prededuped=handle[7],
                )
            t_host += time.time() - ts

        for lo, hi in chunk_bounds:
            ts = time.time()
            # dispatch_async pipelines dedupe+pack+upload on a dedicated
            # thread: the 3 stages (dispatch | device+fetch | count) overlap
            pending.append(counter.dispatch_async(
                mat[lo:hi], lens[lo:hi],
                mate_mat[lo:hi] if mate_mat is not None else None,
                mate_lens[lo:hi] if mate_lens is not None else None,
            ))
            t_dispatch += time.time() - ts
            if len(pending) >= args.depth:
                drain_one()
        while pending:
            drain_one()
        ts = time.time()
        results = counter.finalize()
        t_host += time.time() - ts
        dt = time.time() - t0
        times.append(dt)
        splits.append((t_dispatch, t_collect, t_host))
        log(f"round {r}: {dt:.3f}s -> {args.reads/dt:,.0f} reads/s "
            f"(dispatch {t_dispatch:.3f}s, device-wait {t_collect:.3f}s, "
            f"host {t_host:.3f}s)")

    best_i = min(range(len(times)), key=lambda i: times[i])
    best = times[best_i]
    reads_per_sec = args.reads / best
    total_counted = sum(entry[0] for _, entry in results)
    log(f"distinct callsets: {len(results)}, reads counted: {total_counted}")

    # weather-independent companion metric (VERDICT r4 item 6): device-
    # resident kernel ns/read, so kernel progress stays visible across
    # rounds even when tunnel weather flattens the headline
    kernel_note = {}
    if not args.mesh:
        try:
            kernel_note = {
                "kernel_ns_per_read": round(
                    measure_kernel_ns_per_read(engine, mat, lens, log), 1
                )
            }
        except Exception as e:  # never let the companion kill the headline
            log(f"kernel_ns_per_read measurement failed: {e!r}")

    t_dispatch, t_collect, t_host = splits[best_i]
    print(
        json.dumps(
            {
                "metric": (
                    ("fastq_mesh" if args.mesh else "fastq")
                    + ("_paired" if args.paired else "")
                    + "_align_count_reads_per_sec_per_chip"
                ),
                "value": round(reads_per_sec, 1),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_sec / RUST_BASELINE_READS_PER_SEC, 2),
                # weather honesty: the capture is best-of-N (tunnel rounds
                # swing +/-30%); the median is carried alongside so a
                # lucky/unlucky window is visible in the record itself
                "median_value": round(args.reads / float(np.median(times)), 1),
                "timed_rounds": len(times),
                **_base_note,
                **kernel_note,
                "split_s": {
                    "dispatch_pack_upload": round(t_dispatch, 3),
                    "device_wait_and_fetch": round(t_collect, 3),
                    "host_tail": round(t_host, 3),
                },
                **(
                    {"features": args.features, "feat_len": args.feat_len}
                    if (args.features, args.feat_len) != (50, 500) else {}
                ),
                **backend_note,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
