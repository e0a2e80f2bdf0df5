"""BAM pipeline through the device engine must equal the host-engine output."""

import gzip
import json

from nimble_tpu.config import LibraryChemistry
from nimble_tpu.core.calls import HostAlignEngine
from nimble_tpu.index.build import build_index
from nimble_tpu.io.synth import make_synthetic_bam
from nimble_tpu.library import get_reference_sequence_data, load_reference_library
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.pipeline import bam_pipeline

from conftest import library_path


def _run(tmp_path, engine_cls, name, bam):
    cfg, ref = load_reference_library(
        library_path("mismatch.json"), LibraryChemistry.UNSTRANDED
    )
    cfg.num_mismatches = 1
    index = build_index(get_reference_sequence_data(ref)[0])
    engine = engine_cls(index, cfg)
    out = str(tmp_path / f"{name}.tsv.gz")
    bam_pipeline.process([bam], [engine], [ref], [cfg], [out], 2, False)
    with gzip.open(out, "rt") as f:
        lines = f.read().splitlines()
    return lines[0], sorted(lines[1:])


def test_bam_device_matches_host(tmp_path):
    lib = json.load(open(library_path("mismatch.json")))
    gene = lib[1]["columns"][3][0]
    bam = str(tmp_path / "in.bam")
    make_synthetic_bam(
        bam, [gene], n_groups=6, pairs_per_group=3, unpaired_per_group=1,
        mutate_every=4, seed=17,
    )
    header_h, rows_h = _run(tmp_path, HostAlignEngine, "host", bam)
    header_d, rows_d = _run(tmp_path, DeviceAlignEngine, "dev", bam)
    assert header_h == header_d
    assert rows_h == rows_d
    assert len(rows_h) > 0
