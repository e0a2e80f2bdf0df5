"""Producer scan-ahead thread parity: NIMBLE_BAM_PREFETCH=1 (default)
must emit exactly the same batch stream as the inline producer.

The prefetch thread only pipelines _scan_chunk ahead of run/group
emission (io/bam_columnar.py); semantics must be unchanged.  This pins
the OFF path against the ON path now that ON is the default — a
regression in either direction (pool-buffer aliasing, queue ordering,
exception replay) shows up as a column or group-boundary diff.
"""

import os
import tempfile

import numpy as np
import pytest

from nimble_tpu import native
from nimble_tpu.io.bam_columnar import ColumnarGroupStream
from nimble_tpu.io.synth import make_synthetic_bam

requires_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _drain(path: str, prefetch: str, batch_records: int):
    os.environ["NIMBLE_BAM_PREFETCH"] = prefetch
    try:
        out = []
        for b in ColumnarGroupStream(path, False).batches(batch_records):
            cols = {
                name: (np.array(col.offs, copy=True),
                       np.array(col.flat, copy=True))
                for name, col in (
                    ("meta", b.meta), ("skipb", b.skipb), ("qual", b.qual),
                    ("rev2", b.rev2), ("seq15", b.seq15), ("qn", b.qn),
                    ("seq", b.seq),
                )
            }
            out.append((cols, np.array(b.skip_true, copy=True),
                        np.array(b.group_off, copy=True)))
        return out
    finally:
        os.environ.pop("NIMBLE_BAM_PREFETCH", None)


@requires_native
@pytest.mark.parametrize("batch_records", [512, 16384])
@pytest.mark.parametrize("mode", ["1", "2"])
def test_prefetch_stream_parity(batch_records, mode):
    """Mode 1 (scan-ahead thread, default) and mode 2 (two-stage
    scan/meta pipeline, opt-in for wider hosts) must both emit exactly
    the inline producer's batch stream."""
    feats = [
        "".join(np.random.default_rng(s).choice(list("ACGT"), size=400))
        for s in range(6)
    ]
    with tempfile.TemporaryDirectory() as td:
        bam = f"{td}/p.bam"
        make_synthetic_bam(bam, feats, n_groups=700, pairs_per_group=3,
                           read_len=90, seed=13)
        on = _drain(bam, mode, batch_records)
        off = _drain(bam, "0", batch_records)
    assert len(on) == len(off)
    for (c1, s1, g1), (c2, s2, g2) in zip(on, off):
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(g1, g2)
        for name in c1:
            np.testing.assert_array_equal(c1[name][0], c2[name][0], name)
            np.testing.assert_array_equal(c1[name][1], c2[name][1], name)
