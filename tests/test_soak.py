"""Pipeline-level soak: CLI outputs identical across engines on a synthetic
corpus exercising mutation, junk, duplicates, length variation, phase-B
deferral, dedupe, and chunked streaming."""

import numpy as np
import pytest

from nimble_tpu.cli import main


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    td = tmp_path_factory.mktemp("soak")
    rng = np.random.default_rng(99)
    feats = ["".join(rng.choice(list("ACGT"), size=400)) for _ in range(12)]

    import json

    lib = [
        {
            "trim_target_length": 40, "trim_strictness": 0.9,
            "score_percent": 0.25, "score_filter": 25, "score_threshold": 45,
            "num_mismatches": 1, "discard_multiple_matches": False,
            "max_hits_to_report": 10, "intersect_level": 0, "group_on": "",
            "discard_multi_hits": 0, "require_valid_pair": False,
            "data_type": "DNA",
        },
        {
            "headers": ["reference_genome", "sequence_name", "sequence"],
            "columns": [
                ["soak"] * 12,
                [f"feat{i:02d}" for i in range(12)],
                feats,
            ],
        },
    ]
    lib_path = td / "lib.json"
    lib_path.write_text(json.dumps(lib))

    reads = []
    for i in range(3000):
        f = int(rng.integers(0, 12))
        start = int(rng.integers(0, 300))
        ln = int(rng.integers(45, 100))
        frag = feats[f][start : start + ln]
        kind = rng.integers(0, 6)
        if kind == 1:  # one substitution
            p = int(rng.integers(0, len(frag)))
            frag = frag[:p] + str(rng.choice([b for b in "ACGT" if b != frag[p]])) + frag[p + 1 :]
        elif kind == 2:  # substitution early (phase-B territory)
            p = int(rng.integers(5, 35))
            if p < len(frag):
                frag = frag[:p] + str(rng.choice([b for b in "ACGT" if b != frag[p]])) + frag[p + 1 :]
        elif kind == 3:  # junk
            frag = "".join(rng.choice(list("ACGT"), size=ln))
        elif kind == 4:  # low complexity
            frag = "A" * ln
        reads.append(frag)
    reads += reads[:500]  # duplicates
    fq = td / "reads.fastq"
    with open(fq, "w") as f:
        for i, seq in enumerate(reads):
            f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    return str(lib_path), str(fq), td


@pytest.mark.parametrize("chem", ["none", "unstranded"])
def test_cli_engines_agree(corpus, chem, tmp_path):
    lib_path, fq, _ = corpus
    outputs = {}
    for engine in ("host", "device", "mesh"):
        out = str(tmp_path / f"{engine}_{chem}.tsv")
        rc = main(["-r", lib_path, "-i", fq, "-o", out, "-f", chem,
                   "--engine", engine])
        assert rc == 0
        outputs[engine] = open(out).read()
    assert outputs["device"] == outputs["host"]
    assert outputs["mesh"] == outputs["host"]
    assert len(outputs["host"].splitlines()) > 5


@pytest.fixture(scope="module")
def paired_corpus(corpus, tmp_path_factory):
    """R2 mates: mostly same-feature reverse-orientation fragments."""
    lib_path, fq, td = corpus
    import json

    feats = json.load(open(lib_path))[1]["columns"][2]
    rng = np.random.default_rng(55)
    from nimble_tpu.utils.dna import revcomp

    r1_seqs = []
    with open(fq) as f:
        lines = f.read().splitlines()
        r1_seqs = lines[1::4]
    r2 = td / "mates.fastq"
    with open(r2, "w") as f:
        for i, _ in enumerate(r1_seqs):
            fi = int(rng.integers(0, len(feats)))
            start = int(rng.integers(0, 300))
            frag = revcomp(feats[fi][start : start + 60])
            if rng.random() < 0.25:
                frag = "".join(rng.choice(list("ACGT"), size=60))
            f.write(f"@m{i}\n{frag}\n+\n{'I' * len(frag)}\n")
    return lib_path, fq, str(r2)


@pytest.mark.parametrize("chem", ["unstranded", "fiveprime", "threeprime"])
def test_cli_paired_engines_agree(paired_corpus, chem, tmp_path):
    lib_path, fq, r2 = paired_corpus
    outputs = {}
    for engine in ("host", "device"):
        out = str(tmp_path / f"{engine}_{chem}.tsv")
        rc = main(["-r", lib_path, "-i", fq, "-i", r2, "-o", out, "-f", chem,
                   "--engine", engine])
        assert rc == 0
        outputs[engine] = open(out).read()
    assert outputs["device"] == outputs["host"]
    if chem != "threeprime":
        # this corpus is 5'-oriented (R1 forward / R2 reverse); threeprime
        # chemistry correctly filters it to nothing on both engines
        assert len(outputs["host"].splitlines()) > 2
