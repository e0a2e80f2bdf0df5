"""Multi-host scaffolding: content-hash routing + count merge equal the
single-process results — simulated in-process, and for real with TWO jax
processes over `jax.distributed` on CPU."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from nimble_tpu.config import LibraryChemistry
from nimble_tpu.core.fast_count import FastCounter, pack_matrix
from nimble_tpu.index.build import build_index
from nimble_tpu.io.fastq import read_fastq_codes
from nimble_tpu.library import get_reference_sequence_data, load_reference_library
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.parallel import multihost

from conftest import library_path, reads_path


def _setup():
    cfg, ref = load_reference_library(library_path("basic.json"), LibraryChemistry.NONE)
    cfg.num_mismatches = 1
    index = build_index(get_reference_sequence_data(ref)[0])
    return cfg, ref, index


def _local_allgather_factory(per_host_payloads):
    """Shim: 'allgather' over simulated hosts executing in one process."""

    def allgather(arrays):
        return per_host_payloads

    return allgather


def test_simulated_two_host_merge_equals_single():
    cfg, ref, index = _setup()
    engine = DeviceAlignEngine(index, cfg)
    reads = read_fastq_codes(reads_path("basic.fastq")) * 6  # 24 reads, dups
    mat, lens = pack_matrix(reads)

    # single-process truth
    single = FastCounter(engine, ref, cfg)
    single.add(mat, lens)
    expected = [(cs, e[0]) for cs, e in single.finalize()]

    # simulate 2 hosts: contiguous record split, content-hash routing
    n_hosts = 2
    shards = [
        (mat[lo:hi], lens[lo:hi])
        for lo, hi in (
            multihost.host_record_range(mat.shape[0], n_hosts, h)
            for h in range(n_hosts)
        )
    ]
    payloads = [
        (m, l, multihost._read_owner_hash(m, l, n_hosts)) for m, l in shards
    ]
    allgather = _local_allgather_factory(payloads)

    local_results = []
    for h in range(n_hosts):
        own_mat, own_lens = multihost.exchange_reads_by_content(
            shards[h][0], shards[h][1], n_hosts, h, allgather=allgather
        )
        counter = FastCounter(engine, ref, cfg)
        counter.add(own_mat, own_lens)
        local_results.append(counter.finalize())

    # ownership is disjoint and covers every read exactly once
    owned_total = sum(
        multihost.exchange_reads_by_content(
            shards[h][0], shards[h][1], n_hosts, h, allgather=allgather
        )[0].shape[0]
        for h in range(n_hosts)
    )
    assert owned_total == mat.shape[0]

    blobs = []
    import pickle

    for res in local_results:
        blobs.append(pickle.dumps([(tuple(cs), e[0]) for cs, e in res]))
    merged = multihost.merge_host_results(
        local_results[0], allgather_bytes=lambda payload: blobs
    )
    assert [(cs, e[0]) for cs, e in merged] == expected


_WORKER = textwrap.dedent("""
    import os, sys, pickle
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nimble_tpu_jax_cache_mh")
    import jax
    jax.config.update("jax_platforms", "cpu")
    proc_id = int(sys.argv[1]); n_proc = int(sys.argv[2]); port = sys.argv[3]
    out_path = sys.argv[4]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=n_proc, process_id=proc_id,
    )
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tests")
    from conftest import library_path, reads_path
    from nimble_tpu.config import LibraryChemistry
    from nimble_tpu.index.build import build_index
    from nimble_tpu.library import get_reference_sequence_data, load_reference_library
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.parallel import multihost
    cfg, ref = load_reference_library(library_path("basic.json"), LibraryChemistry.NONE)
    cfg.num_mismatches = 1
    index = build_index(get_reference_sequence_data(ref)[0])
    engine = DeviceAlignEngine(index, cfg)
    merged = multihost.process_fastq_multihost(
        reads_path("basic.fastq"), engine, ref, cfg, None,
        n_hosts=n_proc, host_id=proc_id,
    )
    if proc_id == 0:
        with open(out_path, "wb") as f:
            pickle.dump([(cs, e[0]) for cs, e in merged], f)
""")


def test_real_two_process_distributed_cpu(tmp_path):
    """Two actual jax processes, coordinated via jax.distributed, produce
    counts identical to the single-process run (VERDICT r1 item 4)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    out_path = str(tmp_path / "merged.pkl")
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(_WORKER)

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(i), "2", port, out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append((p.returncode, stdout, stderr))
    for rc, stdout, stderr in outs:
        assert rc == 0, stderr.decode()[-2000:]

    import pickle

    with open(out_path, "rb") as f:
        merged = pickle.load(f)

    cfg, ref, index = _setup()
    engine = DeviceAlignEngine(index, cfg)
    reads = read_fastq_codes(reads_path("basic.fastq"))
    mat, lens = pack_matrix(reads)
    counter = FastCounter(engine, ref, cfg)
    counter.add(mat, lens)
    expected = [(cs, e[0]) for cs, e in counter.finalize()]
    assert merged == expected


def test_simulated_two_host_paired_merge_equals_single():
    """Paired-end routing: all copies of a PAIR land on one owner host and
    the merged counts equal the single-process paired run."""
    cfg, ref, index = _setup()
    engine = DeviceAlignEngine(index, cfg)
    reads = read_fastq_codes(reads_path("basic.fastq"))
    # mates = reversed list so pairs are non-trivial; duplicate the pairs
    r1 = (reads * 6)[:20]
    r2 = (list(reversed(reads)) * 6)[:20]
    m1, l1 = pack_matrix(r1)
    m2, l2 = pack_matrix(r2)

    single = FastCounter(engine, ref, cfg)
    single.add(m1, l1, m2, l2)
    expected = [(cs, e[0]) for cs, e in single.finalize()]

    n_hosts = 2
    ranges = [multihost.host_record_range(m1.shape[0], n_hosts, h)
              for h in range(n_hosts)]
    payloads = [
        (
            m1[lo:hi], l1[lo:hi], m2[lo:hi], l2[lo:hi],
            multihost._read_owner_hash(
                m1[lo:hi], l1[lo:hi], n_hosts, m2[lo:hi], l2[lo:hi]
            ),
        )
        for lo, hi in ranges
    ]

    local_results = []
    owned_total = 0
    for h in range(n_hosts):
        lo, hi = ranges[h]
        om, ol, om2, ol2 = multihost.exchange_reads_by_content(
            m1[lo:hi], l1[lo:hi], n_hosts, h,
            allgather=lambda arrays: payloads,
            mate_mat=m2[lo:hi], mate_lens=l2[lo:hi],
        )
        owned_total += om.shape[0]
        assert om.shape[0] == om2.shape[0]
        counter = FastCounter(engine, ref, cfg)
        counter.add(om, ol, om2, ol2)
        local_results.append(counter.finalize())
    assert owned_total == m1.shape[0]

    import pickle

    blobs = [
        pickle.dumps([(tuple(cs), e[0]) for cs, e in res])
        for res in local_results
    ]
    merged = multihost.merge_host_results(
        local_results[0], allgather_bytes=lambda payload: blobs
    )
    assert [(cs, e[0]) for cs, e in merged] == expected


def test_real_two_process_cli(tmp_path):
    """The CLI's --num-processes/--process-id/--coordinator surface: two
    real processes produce the same TSV as the single-process CLI."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nimble_tpu_jax_cache_mh")
    env["PYTHONPATH"] = "/root/repo"

    single_out = str(tmp_path / "single.tsv")
    rc = subprocess.run(
        [sys.executable, "-m", "nimble_tpu.cli",
         "-r", library_path("basic.json"), "-i", reads_path("basic.fastq"),
         "-o", single_out, "--engine", "device"],
        env=env, capture_output=True, timeout=150,
    )
    assert rc.returncode == 0, rc.stderr.decode()[-2000:]

    outs = [str(tmp_path / f"mh{i}.tsv") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "nimble_tpu.cli",
             "-r", library_path("basic.json"),
             "-i", reads_path("basic.fastq"), "-o", outs[i],
             "--engine", "device",
             "--num-processes", "2", "--process-id", str(i),
             "--coordinator", f"127.0.0.1:{port}"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed CLI timed out")
        assert p.returncode == 0, stderr.decode()[-2000:]

    with open(single_out, "rb") as f:
        expected_bytes = f.read()
    with open(outs[0], "rb") as f:
        assert f.read() == expected_bytes  # process 0 writes the table
    assert not os.path.exists(outs[1]) or open(outs[1], "rb").read() in (
        b"", expected_bytes
    )
