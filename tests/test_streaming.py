"""Chunked/streaming fast counting must equal one-shot counting."""

import numpy as np

from nimble_tpu.config import AlignFilterConfig
from nimble_tpu.core.fast_count import FastCounter, fast_count_calls_matrix, pack_matrix
from nimble_tpu.index.build import build_index
from nimble_tpu.library import Reference
from nimble_tpu.models.aligner import DeviceAlignEngine
from nimble_tpu.utils.dna import encode_bases, revcomp


def _setup():
    rng = np.random.default_rng(23)
    feats = ["".join(rng.choice(list("ACGT"), size=220)) for _ in range(6)]
    doubled = [x for s in feats for x in (s, revcomp(s))]
    names = []
    for i in range(6):
        names += [f"g{i}", f"g{i}§rev"]
    ref = Reference(
        group_on=0, headers=["sequence_name", "sequence"],
        columns=[names, doubled], sequence_name_idx=0, sequence_idx=1,
    )
    cfg = AlignFilterConfig(
        score_percent=0.2, score_threshold=40, num_mismatches=1,
        max_hits_to_report=8,
    )
    index = build_index(doubled)
    engine = DeviceAlignEngine(index, cfg)

    reads = []
    for i in range(300):
        f = int(rng.integers(0, len(doubled)))
        s = int(rng.integers(0, 150))
        frag = doubled[f][s : s + 60]
        reads.append(encode_bases(frag))
    # force duplicates across chunk boundaries
    reads = reads + reads[:50]
    return engine, ref, cfg, reads


def test_chunked_equals_oneshot():
    engine, ref, cfg, reads = _setup()
    mat, lens = pack_matrix(reads)
    oneshot = fast_count_calls_matrix(mat, lens, None, None, engine, ref, cfg)

    counter = FastCounter(engine, ref, cfg)
    for start in range(0, len(reads), 64):
        cm, cl = pack_matrix(reads[start : start + 64])
        counter.add(cm, cl)
    chunked = counter.finalize()
    assert chunked == oneshot
    assert len(chunked) > 0


def test_dispatch_pipeline_equals_oneshot():
    """dispatch/process (async launch + pre-upload dedupe) must match the
    synchronous path, including duplicates both within and across chunks."""
    engine, ref, cfg, reads = _setup()
    mat, lens = pack_matrix(reads)
    oneshot = fast_count_calls_matrix(mat, lens, None, None, engine, ref, cfg)

    counter = FastCounter(engine, ref, cfg)
    handles = []
    for start in range(0, len(reads), 64):
        cm, cl = pack_matrix(reads[start : start + 64])
        handles.append(counter.dispatch(cm, cl))
    for h in handles:
        counter.process(h)
    assert counter.finalize() == oneshot


def test_dispatch_pipeline_paired_equals_oneshot():
    engine, ref, cfg, reads = _setup()
    n = len(reads) // 2
    r1, r2 = reads[:n], reads[n : 2 * n]
    # duplicate pairs across chunk boundaries
    r1 = r1 + r1[:40]
    r2 = r2 + r2[:40]
    m1, l1 = pack_matrix(r1)
    m2, l2 = pack_matrix(r2)
    oneshot = fast_count_calls_matrix(m1, l1, m2, l2, engine, ref, cfg)

    counter = FastCounter(engine, ref, cfg)
    handles = []
    for start in range(0, len(r1), 48):
        cm1, cl1 = pack_matrix(r1[start : start + 48])
        cm2, cl2 = pack_matrix(r2[start : start + 48])
        handles.append(counter.dispatch(cm1, cl1, cm2, cl2))
    for h in handles:
        counter.process(h)
    assert counter.finalize() == oneshot


# --- native streaming FASTQ reader (block scan + vectorized fill) ---------

def _python_chunks(path, chunk_reads):
    """The pure-Python reference path for iter_fastq_matrix_chunks."""
    from nimble_tpu.core.fast_count import pack_matrix
    from nimble_tpu.io.fastq import iter_fastq_codes

    batch = []
    for codes in iter_fastq_codes(path):
        batch.append(codes)
    out = []
    for s in range(0, len(batch), chunk_reads):
        out.append(pack_matrix(batch[s : s + chunk_reads]))
    return batch, out


def _all_reads(chunks):
    reads = []
    for mat, lens in chunks:
        for i in range(mat.shape[0]):
            reads.append(mat[i, : lens[i]].tolist())
    return reads


def test_native_chunk_reader_matches_python(tmp_path):
    """Block-scanned chunks cover exactly the Python reader's records, in
    order, across block boundaries / variable lengths / blank lines."""
    import gzip

    from nimble_tpu import native
    from nimble_tpu.io.fastq import iter_fastq_matrix_chunks

    if not native.available():
        import pytest

        pytest.skip("native library required")
    rng = np.random.default_rng(7)
    path = str(tmp_path / "r.fastq")
    with open(path, "w") as f:
        for i in range(997):
            L = int(rng.integers(30, 151))
            seq = "".join(rng.choice(list("ACGTN"), size=L))
            f.write(f"@r{i} extra words\n{seq}\n+\n{'I' * L}\n")
            if i % 101 == 0:
                f.write("\n")  # blank-line tolerance
    expected, _ = _python_chunks(path, 64)
    got = _all_reads(iter_fastq_matrix_chunks(path, 64))
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g == e.tolist()

    # gzip input through the same path
    gz = str(tmp_path / "r.fastq.gz")
    with open(path, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    got_gz = _all_reads(iter_fastq_matrix_chunks(gz, 64))
    assert got_gz == got


def test_native_chunk_reader_no_trailing_newline(tmp_path):
    from nimble_tpu import native
    from nimble_tpu.io.fastq import iter_fastq_matrix_chunks

    if not native.available():
        import pytest

        pytest.skip("native library required")
    path = str(tmp_path / "nt.fastq")
    with open(path, "w") as f:
        f.write("@a\nACGTACGT\n+\nIIIIIIII\n@b\nTTTTCCCC\n+\nIIIIIIII")
    reads = _all_reads(iter_fastq_matrix_chunks(path, 10))
    assert len(reads) == 2 and len(reads[1]) == 8


def test_native_chunk_reader_malformed_raises(tmp_path):
    import pytest

    from nimble_tpu import native
    from nimble_tpu.io.fastq import iter_fastq_matrix_chunks

    if not native.available():
        pytest.skip("native library required")
    bad = str(tmp_path / "bad.fastq")
    with open(bad, "w") as f:
        f.write("@a\nACGT\nNOPLUS\nIIII\n")
    with pytest.raises(ValueError, match="Unable to read sequence"):
        list(iter_fastq_matrix_chunks(bad, 10))
    trunc = str(tmp_path / "trunc.fastq")
    with open(trunc, "w") as f:
        f.write("@a\nACGT\n+\nIIII\n@b\nACGT\n")  # record cut after seq
    with pytest.raises(ValueError, match="Unable to read sequence"):
        list(iter_fastq_matrix_chunks(trunc, 10))


def test_native_chunk_reader_exact_chunk_sizes(tmp_path):
    """Chunks must hold EXACTLY chunk_reads records (final partial) — the
    paired-end pipelines zip R1/R2 chunk iterators in lockstep, so files
    with different record byte sizes must chunk at identical counts."""
    from nimble_tpu import native
    from nimble_tpu.io.fastq import iter_fastq_matrix_chunks

    if not native.available():
        import pytest

        pytest.skip("native library required")
    rng = np.random.default_rng(3)
    r1 = str(tmp_path / "r1.fastq")   # short records (10x barcode-like)
    r2 = str(tmp_path / "r2.fastq")   # long records
    n = 1000
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(n):
            s1 = "".join(rng.choice(list("ACGT"), size=26))
            s2 = "".join(rng.choice(list("ACGT"), size=90))
            f1.write(f"@p{i}\n{s1}\n+\n{'I' * 26}\n")
            f2.write(f"@p{i}\n{s2}\n+\n{'I' * 90}\n")
    sizes1 = [m.shape[0] for m, _ in iter_fastq_matrix_chunks(r1, 64)]
    sizes2 = [m.shape[0] for m, _ in iter_fastq_matrix_chunks(r2, 64)]
    assert sizes1 == sizes2 == [64] * (n // 64) + [n % 64]


def test_paired_asymmetric_lengths_chunked_pipeline(tmp_path):
    """Paired-end files with different record byte sizes (10x-style short
    R1, long R2) through the chunked pipeline equal the single-chunk run
    (regression: variable-size chunks broke R1/R2 lockstep)."""
    import contextlib
    import io

    from nimble_tpu.pipeline import fastq_pipeline

    engine, ref, cfg, _ = _setup()
    rng = np.random.default_rng(9)
    doubled = ref.columns[1]
    r1p = str(tmp_path / "r1.fastq")
    r2p = str(tmp_path / "r2.fastq")
    with open(r1p, "w") as f1, open(r2p, "w") as f2:
        for i in range(333):
            f = int(rng.integers(0, len(doubled)))
            s = int(rng.integers(0, 120))
            a = doubled[f][s : s + 45]
            b = doubled[f][s : s + 95]
            f1.write(f"@p{i}\n{a}\n+\n{'I' * len(a)}\n")
            f2.write(f"@p{i}\n{b}\n+\n{'I' * len(b)}\n")

    outs = []
    for chunk in (64, 1 << 20):
        out = str(tmp_path / f"o{chunk}.tsv")
        with contextlib.redirect_stdout(io.StringIO()):
            fastq_pipeline.process(
                [r1p, r2p], [engine], [ref], [cfg], [out], chunk_reads=chunk
            )
        outs.append(open(out).read())
    assert outs[0] == outs[1]
    assert outs[0].count("\n") > 1
