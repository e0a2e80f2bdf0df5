"""FASTQ workload orchestration.

Parity target: `src/process/fastq.rs:7-30` — for each reference library,
align the input file(s) (second file supplies mates) and append a
``feature\\tscore`` TSV per library.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

from nimble_tpu.config import AlignFilterConfig
from nimble_tpu.core.calls import AlignEngine, call
from nimble_tpu.core.fast_count import (
    FastCounter, split_stacked, stack_pair, submit_transaction)
from nimble_tpu.io.fastq import (
    iter_fastq_matrix_chunks,
    read_fastq_codes,
    read_fastq_matrix,
)
from nimble_tpu.io.writers import write_to_tsv
from nimble_tpu.library import Reference

# streaming chunk size for the fast path (reads per device batch)
DEFAULT_CHUNK_READS = 1 << 17


def _drain_pending(pending, multi) -> None:
    """Process buffered chunk handles; with the multi-library dispatcher the
    shared launch is collected ONCE and each counter gets its library's
    slice."""
    if multi is None:
        for counter, handle in pending:
            counter.process(handle)
        return
    if not pending:
        return
    handle = pending[0][1]
    if not isinstance(handle, tuple):
        handle = handle.result()  # pipelined dispatch future
    mat, lens, mate_mat, mate_lens, st1, prededuped = handle
    if not mat.shape[0]:
        return
    raws1 = st1.result() if hasattr(st1, "result") else multi.collect(st1)
    if mate_mat is None:
        raws2 = [None] * len(pending)
    else:
        # stacked R1+R2 launch: each library's raw splits by row
        split = [split_stacked(raw, mat.shape[0]) for raw in raws1]
        raws1, raws2 = [a for a, _ in split], [b for _, b in split]
    for (counter, _), raw1, raw2 in zip(pending, raws1, raws2):
        counter._add_with_raw(mat, lens, mate_mat, mate_lens, raw1, raw2,
                              prededuped=prededuped)


def process(
    input_files: Sequence[str],
    engines: Sequence[AlignEngine],
    references: Sequence[Reference],
    aligner_configs: Sequence[AlignFilterConfig],
    output_paths: Sequence[str],
    chunk_reads: int = DEFAULT_CHUNK_READS,
) -> None:
    fast = all(hasattr(e, "align_raw_compact_from_matrix") for e in engines)

    if fast:
        # N>1 libraries: ONE concatenated device table serves every library
        # per launch (vs the reference's sequential per-library passes,
        # `src/process/fastq.rs:15`) — per-launch latency dominates, so the
        # N-library run costs ~the same as one.  Mesh engines get the same
        # stacked dispatcher sharded data-parallel over their mesh
        # (replicated tables, GSPMD-partitioned kernel); the counters then
        # decode through dispatcher-compatible single-device engines.
        multi = None
        fetcher = None
        dispatcher = None
        count_engines = list(engines)
        if len(engines) > 1:
            try:
                from nimble_tpu.models.aligner import DeviceAlignEngine
                from nimble_tpu.models.mesh_aligner import MeshAlignEngine
                from nimble_tpu.models.multi_aligner import (
                    MultiLibraryDispatcher,
                )

                if all(isinstance(e, DeviceAlignEngine) for e in engines):
                    multi = MultiLibraryDispatcher(engines)
                elif (
                    all(isinstance(e, MeshAlignEngine) for e in engines)
                    and len({id(e.mesh) for e in engines}) == 1
                ):
                    dev_engines = [
                        DeviceAlignEngine(
                            e.index, e.config, c_max=e.c_max,
                            buckets=e.buckets, min_batch=e.min_batch,
                        )
                        for e in engines
                    ]
                    multi = MultiLibraryDispatcher(
                        dev_engines, mesh=engines[0].mesh
                    )
                    count_engines = dev_engines
            except (AssertionError, ValueError):
                # incompatible geometry -> safe per-engine launches
                multi = None
            if multi is not None:
                from concurrent.futures import ThreadPoolExecutor

                # one worker keeps tunnel transfer order deterministic
                fetcher = ThreadPoolExecutor(max_workers=1)
                dispatcher = ThreadPoolExecutor(max_workers=1)
        # streaming fast path: chunks flow through all libraries' counters;
        # dedupe/count state is global so chunking is invisible in results
        counters = [
            FastCounter(count_engines[i], references[i], aligner_configs[i])
            for i in range(len(count_engines))
        ]
        r1_chunks = iter_fastq_matrix_chunks(input_files[0], chunk_reads)
        r2_chunks = (
            iter_fastq_matrix_chunks(input_files[1], chunk_reads)
            if len(input_files) > 1
            else None
        )
        from nimble_tpu.utils.metrics import METRICS

        meter = METRICS.meter("fastq_align")
        # double-buffered feed: chunk N+1's kernels launch (async) before
        # chunk N's host-side counting runs
        pending: List = []
        try:
            _run_fast_loop(
                r1_chunks, r2_chunks, counters, multi, fetcher, dispatcher,
                meter, pending
            )
        finally:
            if dispatcher is not None:
                dispatcher.shutdown(wait=True)
            if fetcher is not None:
                fetcher.shutdown(wait=True)
        print(meter.summary())
        for i, counter in enumerate(counters):
            results = counter.finalize()
            write_to_tsv(
                [(features, entry[0]) for features, entry in results],
                output_paths[i],
            )
        return

    reads = read_fastq_codes(input_files[0])
    mates: Optional[List] = (
        read_fastq_codes(input_files[1]) if len(input_files) > 1 else None
    )
    for i, engine in enumerate(engines):
        results, _alignment_metadata, _ = call(
            reads, mates, [], engine, references[i], aligner_configs[i]
        )
        write_to_tsv(
            [(features, entry[0]) for features, entry in results],
            output_paths[i],
        )


def _dispatch_multi(multi, fetcher, mat, lens, mate_mat, mate_lens):
    """Dedupe + launch one chunk through the multi-library dispatcher
    (the single-library FastCounter.dispatch disciplines, applied once for
    all libraries)."""
    mat, lens, mate_mat, mate_lens, prededuped = (
        multi.dedupe(mat, lens, mate_mat, mate_lens)
    )
    if mat.shape[0]:
        # one device transaction for all libraries (stacked R1+R2 when
        # paired, split back in drain), launched under NIMBLE_DISPATCH
        launch_args = (
            stack_pair(mat, lens, mate_mat, mate_lens)
            if mate_mat is not None else (mat, lens)
        )
        st1 = submit_transaction(
            fetcher, multi.dispatch, multi.collect, launch_args)
    else:
        st1 = None
    return (mat, lens, mate_mat, mate_lens, st1, prededuped)


def _prefetch_iter(it, depth: int = 2):
    """Run an iterator one-or-two items ahead on its own thread.

    The FASTQ chunk parse (C++ block scan + matrix fill, GIL-releasing)
    costs ~45 ms per 131k-read chunk; inline it serializes with the count
    stage on the main thread (~0.18 s per 524k round = the measured gap
    between the from-disk e2e rate and the in-memory headline).  A single
    ordered worker hides it behind the device stage.  Exceptions re-raise
    at the same consume point.
    """
    import queue as _queue
    import threading as _threading

    q: "_queue.Queue" = _queue.Queue(maxsize=depth)
    _END = object()
    stop = _threading.Event()

    def worker() -> None:
        try:
            for item in it:
                if stop.is_set():
                    return
                q.put(("ok", item))
        except BaseException as e:  # noqa: BLE001 — replayed at consume
            q.put(("exc", e))
            return
        q.put(("end", _END))

    t = _threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            kind, val = q.get()
            if kind == "exc":
                raise val
            if kind == "end":
                return
            yield val
    finally:
        # abandoned mid-stream (consumer exception, early generator close,
        # mismatched-R1/R2 raise): signal the worker and drain its queue so
        # a blocked put() wakes, it observes `stop` and exits — otherwise
        # the thread + its open FASTQ handle leak for the process lifetime
        # (ADVICE r4)
        stop.set()
        while t.is_alive():
            try:
                q.get_nowait()
            except _queue.Empty:
                t.join(0.05)


def _run_fast_loop(r1_chunks, r2_chunks, counters, multi, fetcher,
                   dispatcher, meter, pending) -> None:
    # keep up to DEPTH chunks in flight before draining the oldest: chunk
    # N's host counting then overlaps chunks N+1/N+2's upload + device
    # work (the bench's --depth A/B measured 3 best on the tunnel; 1 —
    # the old behavior here — left the device idle during every count)
    import sys as _sys
    import time as _time

    depth = int(os.environ.get("NIMBLE_PIPELINE_DEPTH", "3"))
    _timing = os.environ.get("NIMBLE_TIMING")
    t_parse = t_submit = t_drain = 0.0
    in_flight: List = []
    r1_chunks = _prefetch_iter(r1_chunks)
    if r2_chunks is not None:
        r2_chunks = _prefetch_iter(r2_chunks)
    while True:
        ts = _time.time()
        nxt = next(r1_chunks, None)
        t_parse += _time.time() - ts
        if nxt is None:
            break
        mat, lens = nxt
        if r2_chunks is not None:
            ts = _time.time()
            try:
                mate_mat, mate_lens = next(r2_chunks)
            except StopIteration:
                mate_mat, mate_lens = None, None
            t_parse += _time.time() - ts
            if mate_mat is None or mate_mat.shape[0] < mat.shape[0]:
                raise ValueError(
                    "Error -- read and reverse read files do not have "
                    "matching lengths: "
                )
        else:
            mate_mat, mate_lens = None, None
        with meter.measure(mat.shape[0] * len(counters)):
            ts = _time.time()
            if multi is not None:
                # pipelined dispatch: dedupe + pack + upload run on the
                # dispatcher thread, overlapping the previous chunk's
                # host-side counting (see FastCounter.dispatch_async)
                fut = dispatcher.submit(
                    _dispatch_multi, multi, fetcher,
                    mat, lens, mate_mat, mate_lens,
                )
                handles = [fut] * len(counters)
            else:
                handles = [
                    counter.dispatch_async(mat, lens, mate_mat, mate_lens)
                    for counter in counters
                ]
            t_submit += _time.time() - ts
            in_flight.append(list(zip(counters, handles)))
            if len(in_flight) >= depth:
                ts = _time.time()
                _drain_pending(in_flight.pop(0), multi)
                t_drain += _time.time() - ts
    with meter.measure(0):
        ts = _time.time()
        while in_flight:
            _drain_pending(in_flight.pop(0), multi)
        t_drain += _time.time() - ts
    if _timing:
        print(f"[fastq loop] parse-wait {t_parse:.3f}s submit "
              f"{t_submit:.3f}s drain {t_drain:.3f}s", file=_sys.stderr)
