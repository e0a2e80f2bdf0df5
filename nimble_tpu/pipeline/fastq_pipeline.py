"""FASTQ workload orchestration.

Parity target: `src/process/fastq.rs:7-30` — for each reference library,
align the input file(s) (second file supplies mates) and append a
``feature\\tscore`` TSV per library.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from nimble_tpu.config import AlignFilterConfig
from nimble_tpu.core.calls import AlignEngine, call
from nimble_tpu.core.fast_count import fast_count_calls_matrix
from nimble_tpu.io.fastq import read_fastq_codes, read_fastq_matrix
from nimble_tpu.io.writers import write_to_tsv
from nimble_tpu.library import Reference


def process(
    input_files: Sequence[str],
    engines: Sequence[AlignEngine],
    references: Sequence[Reference],
    aligner_configs: Sequence[AlignFilterConfig],
    output_paths: Sequence[str],
) -> None:
    fast = all(hasattr(e, "align_raw_compact_from_matrix") for e in engines)

    if fast:
        mat, lens = read_fastq_matrix(input_files[0])
        mate_mat, mate_lens = (
            read_fastq_matrix(input_files[1]) if len(input_files) > 1 else (None, None)
        )
        for i, engine in enumerate(engines):
            # batched fast path: counts only, identical to the general path
            results = fast_count_calls_matrix(
                mat, lens, mate_mat, mate_lens, engine,
                references[i], aligner_configs[i],
            )
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
