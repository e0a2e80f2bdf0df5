"""Sharded (data × model) step vs single-device probe_and_walk equivalence,
on an 8-virtual-CPU-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimble_tpu.config import LibraryChemistry
from nimble_tpu.index.build import build_index
from nimble_tpu.io.fastq import read_fastq_codes
from nimble_tpu.library import get_reference_sequence_data, load_reference_library
from nimble_tpu.ops.device_index import build_device_index
from nimble_tpu.ops.engine_xla import probe_and_walk
from nimble_tpu.parallel.sharded import (
    build_sharded_index,
    device_arrays,
    make_sharded_step,
)

from conftest import library_path, reads_path


def _padded_batch(reads, B, Lmax):
    out = np.zeros((B, Lmax), dtype=np.int8)
    lens = np.zeros(B, dtype=np.int32)
    for i, r in enumerate(reads):
        out[i, : len(r)] = r
        lens[i] = len(r)
    return out, lens


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1)])
def test_sharded_matches_single_device(mesh_shape):
    cfg, ref = load_reference_library(library_path("basic.json"), LibraryChemistry.NONE)
    index = build_index(get_reference_sequence_data(ref)[0])

    reads = read_fastq_codes(reads_path("basic.fastq")) * 4  # 16 reads
    B, Lmax = 16, 128
    batch, lens = _padded_batch(reads, B, Lmax)

    # single-device reference result
    didx = build_device_index(index)
    ref_out = probe_and_walk(
        jnp.asarray(batch), jnp.asarray(lens),
        jnp.asarray(didx.table_key_lo), jnp.asarray(didx.table_key_hi),
        jnp.asarray(didx.table_start), jnp.asarray(didx.table_count),
        jnp.asarray(didx.postings_row), jnp.asarray(didx.postings_off),
        jnp.asarray(didx.ref_codes), jnp.asarray(didx.row_starts),
        jnp.asarray(didx.row_lengths),
        k=didx.k, max_probe=didx.max_probe, c_max=8,
        table_mask=didx.table_size - 1,
    )
    ref_out = {k: np.asarray(v) for k, v in ref_out.items()}

    # sharded result
    mesh = jax.make_mesh(mesh_shape, ("data", "model"))
    sidx = build_sharded_index(index, mesh_shape[1])
    step = make_sharded_step(mesh, sidx, c_max=8)
    out = step(jnp.asarray(batch), jnp.asarray(lens), *device_arrays(sidx))
    out = {k: np.asarray(v) for k, v in out.items()}

    np.testing.assert_array_equal(out["has_anchor"], ref_out["has_anchor"])
    np.testing.assert_array_equal(out["score"], ref_out["score"])
    np.testing.assert_array_equal(out["mismatches"], ref_out["mismatches"])
    np.testing.assert_array_equal(out["overflow"], ref_out["overflow"])

    # equivalence classes: compare as sets of live rows per read
    for b in range(B):
        eq_ref = sorted(set(ref_out["rows"][b, ref_out["live"][b]].tolist()))
        eq_sh = sorted(set(out["rows"][b, out["live"][b]].tolist()))
        assert eq_ref == eq_sh, f"read {b}"

    # histogram merge: total live-row hits across the mesh
    expected_counts = np.zeros(len(index.row_lengths), dtype=np.int64)
    for b in range(B):
        for r in ref_out["rows"][b][ref_out["live"][b]]:
            expected_counts[r] += 1
    np.testing.assert_array_equal(out["row_hit_counts"], expected_counts)


def test_mesh_devices_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1), (1, 8), (1, 1)])
def test_sharded_fast_step_bit_equal(mesh_shape):
    """The mesh port of the FAST kernel is bit-identical to
    probe_walk_filter on the same packed batch (VERDICT r1 item 3)."""
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.models.mesh_aligner import MeshAlignEngine

    cfg, ref = load_reference_library(library_path("basic.json"), LibraryChemistry.NONE)
    cfg.num_mismatches = 2
    index = build_index(get_reference_sequence_data(ref)[0])

    reads = read_fastq_codes(reads_path("basic.fastq")) * 8  # 32 reads
    B, Lmax = 32, 128
    batch, lens = _padded_batch(reads, B, Lmax)

    single = DeviceAlignEngine(index, cfg)
    ref_raw = single.align_raw_compact_from_matrix(batch, lens)

    mesh = jax.make_mesh(mesh_shape, ("data", "model"))
    eng = MeshAlignEngine(index, cfg, mesh=mesh)
    out_raw = eng.align_raw_compact_from_matrix(batch, lens)

    np.testing.assert_array_equal(out_raw["passed"], ref_raw["passed"])
    np.testing.assert_array_equal(out_raw["needs_host"], ref_raw["needs_host"])
    # combo identity differs (global astart spaces differ) but the DECODED
    # equivalence classes must be identical per read
    for i in range(B):
        if not ref_raw["passed"][i]:
            continue
        eq_ref = single.decode_combo(
            int(ref_raw["astart"][i]) , int(ref_raw["mask"][i])
        )
        eq_mesh = eng.decode_combo(
            int(out_raw["astart"][i]), int(out_raw["mask"][i])
        )
        assert eq_ref == eq_mesh, f"read {i}"


def test_sharded_fast_align_batch_matches_single():
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.models.mesh_aligner import MeshAlignEngine

    cfg, ref = load_reference_library(library_path("basic.json"), LibraryChemistry.NONE)
    cfg.num_mismatches = 1
    index = build_index(get_reference_sequence_data(ref)[0])
    reads = read_fastq_codes(reads_path("basic.fastq")) * 4

    single = DeviceAlignEngine(index, cfg)
    mesh = jax.make_mesh((4, 2), ("data", "model"))
    eng = MeshAlignEngine(index, cfg, mesh=mesh)
    assert eng.align_batch(reads) == single.align_batch(reads)


def test_sharded_fast_multi_sublaunch_bit_equal():
    """The fixed-size sub-launch discipline (chunk > launch_batch) must be
    bit-identical to the single-chip kernel AND to a one-launch mesh run."""
    from nimble_tpu.models.aligner import DeviceAlignEngine
    from nimble_tpu.models.mesh_aligner import MeshAlignEngine

    cfg, ref = load_reference_library(library_path("basic.json"), LibraryChemistry.NONE)
    cfg.num_mismatches = 1
    index = build_index(get_reference_sequence_data(ref)[0])
    reads = read_fastq_codes(reads_path("basic.fastq")) * 75  # 300 reads
    B, Lmax = 300, 128
    batch, lens = _padded_batch(reads, B, Lmax)

    single = DeviceAlignEngine(index, cfg)
    ref_raw = single.align_raw_compact_from_matrix(batch, lens)

    mesh = jax.make_mesh((4, 2), ("data", "model"))
    # launch_batch 16/shard -> lb=64: 300 reads span 5 fixed sub-launches
    eng = MeshAlignEngine(index, cfg, mesh=mesh, launch_batch=16)
    assert eng.launch_batch == 64
    out_raw = eng.align_raw_compact_from_matrix(batch, lens)

    np.testing.assert_array_equal(out_raw["passed"], ref_raw["passed"])
    np.testing.assert_array_equal(out_raw["needs_host"], ref_raw["needs_host"])
    for i in range(B):
        if not ref_raw["passed"][i]:
            continue
        eq_ref = single.decode_combo(
            int(ref_raw["astart"][i]), int(ref_raw["mask"][i])
        )
        eq_mesh = eng.decode_combo(
            int(out_raw["astart"][i]), int(out_raw["mask"][i])
        )
        assert eq_ref == eq_mesh, f"read {i}"
