"""Mesh-sharded multi-library dispatcher: bit-equality with the
single-device stacked dispatcher on virtual meshes.

`MultiLibraryDispatcher(engines, mesh=...)` shards the packed launch
buffer over the mesh's 'data' axis and replicates the stacked tables;
GSPMD partitions the stacked kernel data-parallel.  Results must be
bit-identical to the unsharded dispatcher for both the compact
(FastCounter) and full-output (BAM consumer) paths.
"""

import jax
import numpy as np
import pytest

from nimble_tpu.config import AlignFilterConfig
from nimble_tpu.index.build import build_index
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.models.multi_aligner import MultiLibraryDispatcher
from nimble_tpu.utils.dna import encode_bases, revcomp


def _lib(seed, n_feats, feat_len):
    rng = np.random.default_rng(seed)
    feats = ["".join(rng.choice(list("ACGT"), size=feat_len))
             for _ in range(n_feats)]
    doubled = [x for s in feats for x in (s, revcomp(s))]
    return feats, build_index(doubled)


def _reads(feats_a, feats_b, n_reads, seed):
    rng = np.random.default_rng(seed)
    mat = np.zeros((n_reads, 96), dtype=np.int8)
    lens = np.zeros(n_reads, dtype=np.int32)
    pools = [feats_a, feats_b]
    for i in range(n_reads):
        src = pools[i % 2][i % len(pools[i % 2])]
        ln = 55 if i % 3 else 80
        start = (i * 7) % (len(src) - ln - 1)
        frag = encode_bases(src[start : start + ln])
        if i % 5 == 0:  # salt a mismatch
            frag = np.array(frag, copy=True)
            frag[ln // 2] = (frag[ln // 2] + 1) % 4
        mat[i, :ln] = frag
        lens[i] = ln
    return mat, lens


def _mesh(data, model):
    devs = jax.devices("cpu")
    if len(devs) < data * model:
        pytest.skip(f"needs {data * model} devices")
    return jax.sharding.Mesh(
        np.asarray(devs[: data * model]).reshape(data, model),
        ("data", "model"),
    )


@pytest.fixture(scope="module")
def setup():
    feats_a, index_a = _lib(1, 5, 300)
    feats_b, index_b = _lib(2, 4, 260)
    cfg_a = AlignFilterConfig(
        reference_genome_size=10, score_percent=0.25, score_threshold=40,
        num_mismatches=1, max_hits_to_report=10,
    )
    cfg_b = AlignFilterConfig(
        reference_genome_size=8, score_percent=0.25, score_threshold=40,
        num_mismatches=0, max_hits_to_report=10,
    )
    mat, lens = _reads(feats_a, feats_b, 600, seed=9)
    return index_a, index_b, cfg_a, cfg_b, mat, lens


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2), (2, 1)])
def test_mesh_multi_compact_bit_equal(setup, data, model):
    index_a, index_b, cfg_a, cfg_b, mat, lens = setup
    mesh = _mesh(data, model)

    plain = MultiLibraryDispatcher(
        [DeviceAlignEngine(index_a, cfg_a), DeviceAlignEngine(index_b, cfg_b)]
    )
    sharded = MultiLibraryDispatcher(
        [DeviceAlignEngine(index_a, cfg_a),
         DeviceAlignEngine(index_b, cfg_b)],
        mesh=mesh,
    )
    want = plain.collect(plain.dispatch(mat, lens))
    got = sharded.collect(sharded.dispatch(mat, lens))
    assert len(want) == len(got) == 2
    for li in range(2):
        for key in ("astart", "mask", "passed", "needs_host"):
            np.testing.assert_array_equal(
                got[li][key], want[li][key],
                err_msg=f"lib {li} field {key} diverges on ({data},{model})",
            )
    assert want[0]["passed"].any()


def test_mesh_multi_full_bit_equal(setup):
    index_a, index_b, cfg_a, cfg_b, mat, lens = setup
    mesh = _mesh(4, 2)

    plain = MultiLibraryDispatcher(
        [DeviceAlignEngine(index_a, cfg_a), DeviceAlignEngine(index_b, cfg_b)]
    )
    sharded = MultiLibraryDispatcher(
        [DeviceAlignEngine(index_a, cfg_a),
         DeviceAlignEngine(index_b, cfg_b)],
        mesh=mesh,
    )
    active = np.ones(mat.shape[0], dtype=bool)
    active[::17] = False
    want = plain.full_collect(plain.full_dispatch(mat, lens, active))
    got = sharded.full_collect(sharded.full_dispatch(mat, lens, active))
    for li in range(2):
        for key in want[li]:
            if key == "rescued":
                assert got[li][key] == want[li][key]
                continue
            np.testing.assert_array_equal(
                got[li][key], want[li][key],
                err_msg=f"lib {li} field {key} diverges",
            )


def test_mesh_multi_library_pipeline_byte_parity(tmp_path):
    """End-to-end: the FASTQ pipeline with N>1 MESH engines must emit the
    same TSVs as N>1 single-device engines (the pipeline routes mesh
    engines through the mesh-sharded stacked dispatcher)."""
    import contextlib
    import io

    from nimble_tpu.library import Reference
    from nimble_tpu.models.mesh_aligner import MeshAlignEngine
    from nimble_tpu.pipeline import fastq_pipeline

    rng = np.random.default_rng(3)

    def lib(seed, n_features=4, feat_len=200, **cfg_kw):
        r = np.random.default_rng(seed)
        feats = ["".join(r.choice(list("ACGT"), size=feat_len))
                 for _ in range(n_features)]
        doubled = [x for s in feats for x in (s, revcomp(s))]
        names = []
        for i in range(n_features):
            names.append(f"L{seed}F{i}")
            names.append(f"L{seed}F{i}§rev")
        reference = Reference(
            group_on=0, headers=["sequence_name", "sequence"],
            columns=[names, doubled], sequence_name_idx=0, sequence_idx=1,
        )
        kw = dict(reference_genome_size=2 * n_features, score_percent=0.2,
                  score_threshold=40, num_mismatches=1, max_hits_to_report=10)
        kw.update(cfg_kw)
        return reference, build_index(doubled), AlignFilterConfig(**kw), feats

    libs = [lib(21), lib(22, num_mismatches=0)]
    fastq = str(tmp_path / "reads.fastq")
    with open(fastq, "w") as f:
        i = 0
        for _ in range(50):
            feats = libs[int(rng.integers(0, 2))][3]
            src = feats[int(rng.integers(0, len(feats)))]
            s = int(rng.integers(0, len(src) - 60))
            seq = src[s : s + 60]
            f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
            i += 1

    refs = [l[0] for l in libs]
    cfgs = [l[2] for l in libs]
    dev_outs = [str(tmp_path / f"dev{i}.tsv") for i in range(2)]
    engines = [DeviceAlignEngine(l[1], l[2]) for l in libs]
    with contextlib.redirect_stdout(io.StringIO()):
        fastq_pipeline.process([fastq], engines, refs, cfgs, dev_outs)

    mesh = _mesh(4, 2)
    mesh_outs = [str(tmp_path / f"mesh{i}.tsv") for i in range(2)]
    mesh_engines = [MeshAlignEngine(l[1], l[2], mesh=mesh) for l in libs]
    with contextlib.redirect_stdout(io.StringIO()):
        fastq_pipeline.process([fastq], mesh_engines, refs, cfgs, mesh_outs)
    for i in range(2):
        assert open(mesh_outs[i]).read() == open(dev_outs[i]).read(), (
            f"library {i} TSV diverges"
        )
