"""UMI × cell-barcode group iterator over a BAM stream.

Parity port of `UMIReader` (`src/parse/bam.rs:51-288`):

  * group key = UMI + cell barcode, where the UMI is UB falling back to UR
    (`:162-170`) and the cell barcode is CB minus its last two characters
    (the "-1" gem-group suffix, `:172-176`);
  * double-buffers the current and next group (`:100-111,238-251`);
  * 10x V(D)J non-biological regions: reads of length exactly 124 are
    clipped by 13 bases from the 5' end (3' end when the reverse flag is
    set); qualities likewise, and the quality string is REVERSED for
    reverse reads (`strip_nonbio_regions(_qual)`, `:255-287`);
  * emits a 38-field metadata row per record following BAM_FIELDS_TO_REPORT
    (`:9-49`); values: a string (Z) aux tag whose first two bytes match the
    field name wins, otherwise the built-in accessor, otherwise "" —
    reproducing htslib's two-byte tag resolution quirks;
  * progress print every 1,000,000 reads (`:5,121-127`).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from nimble_tpu.io.bam import BamRecord
from nimble_tpu.io.sorted_bam import BamTruncated, SortedBamReader
from nimble_tpu.utils.dna import decode_bases, encode_bases

READ_BLOCK_REPORT_SIZE = 1_000_000
# DEAD PARITY KNOB: in the reference, `UMIReader::get_umi_from_bam` returns
# None on ANY reader error BEFORE its error-report match arms run
# (`src/parse/bam.rs:115-117` precedes `:134-157`), the counter increment is
# commented out (`:150`), and `SortedBamReader::next` can only ever err with
# BamTruncatedRecord at end-of-stream (`src/parse/sorted_bam_reader.rs:183`).
# The cap, `terminate_on_error`, and `number_cr_skipped` are therefore
# unreachable machinery in the reference; they are kept here as the same
# vestigial surface.
MAX_RECORD_ERROR_REPORT_SIZE = 100
CLIP_LENGTH = 13

# `src/parse/bam.rs:9-49`; indices matter: 0=QNAME, 1=QUAL, 2=REVERSE,
# 15=SEQ, 37=SKIP_ALIGN.
BAM_FIELDS_TO_REPORT = [
    "QNAME", "QUAL", "REVERSE", "MATE_REVERSE", "PAIRED", "PROPER_PAIRED",
    "PAIR_ORIENTATION", "UNMAPPED", "MATE_UNMAPPED", "FIRST_IN_TEMPLATE",
    "LAST_IN_TEMPLATE", "STRAND", "MAPQ", "POS", "MATE_POS", "SEQ", "SEQ_LEN",
    "INSERT_SIZE", "QUALITY_FAILED", "SECONDARY", "DUPLICATE", "SUPPLEMENTARY",
    "NH", "HI", "AS", "GN", "TX", "AN", "nM", "fx", "RE", "CR", "CY", "CB",
    "UR", "UY", "UB", "SKIP_ALIGN",
]


def _rust_bool(b: bool) -> str:
    return "true" if b else "false"


def strip_nonbio_regions(seq: str, rev_comp: bool) -> str:
    """Clip 13 bases of 10x non-biological sequence from 124bp reads
    (`src/parse/bam.rs:258-268`)."""
    if len(seq) == 124:
        if rev_comp:
            return seq[: len(seq) - CLIP_LENGTH]
        return seq[CLIP_LENGTH:]
    return seq


def strip_nonbio_regions_qual(qual: str, rev_comp: bool) -> str:
    """Same for quality strings; reversed for reverse reads
    (`src/parse/bam.rs:271-287`)."""
    if len(qual) == 124:
        trimmed = qual[: len(qual) - CLIP_LENGTH] if rev_comp else qual[CLIP_LENGTH:]
    else:
        trimmed = qual
    return trimmed[::-1] if rev_comp else trimmed


# per-field value getters (dispatch table beats a 22-way if-chain in the
# per-record hot path); QUAL and SEQ are injected by record_metadata
_FIELD_GETTERS = {
    "QNAME": lambda r: r.qname,
    "REVERSE": lambda r: _rust_bool(r.is_reverse()),
    "MATE_REVERSE": lambda r: _rust_bool(r.is_mate_reverse()),
    "PAIRED": lambda r: _rust_bool(r.is_paired()),
    "PROPER_PAIRED": lambda r: _rust_bool(r.is_proper_pair()),
    "PAIR_ORIENTATION": lambda r: r.read_pair_orientation(),
    "UNMAPPED": lambda r: _rust_bool(r.is_unmapped()),
    "MATE_UNMAPPED": lambda r: _rust_bool(r.is_mate_unmapped()),
    "FIRST_IN_TEMPLATE": lambda r: _rust_bool(r.is_first_in_template()),
    "LAST_IN_TEMPLATE": lambda r: _rust_bool(r.is_last_in_template()),
    "STRAND": lambda r: r.strand_symbol(),
    "MAPQ": lambda r: str(r.mapq),
    "POS": lambda r: str(r.pos),
    "MATE_POS": lambda r: str(r.mpos),
    "SEQ_LEN": lambda r: str(r.seq_len()),
    "INSERT_SIZE": lambda r: str(r.insert_size()),
    "QUALITY_FAILED": lambda r: _rust_bool(r.is_quality_check_failed()),
    "SECONDARY": lambda r: _rust_bool(r.is_secondary()),
    "DUPLICATE": lambda r: _rust_bool(r.is_duplicate()),
    "SUPPLEMENTARY": lambda r: _rust_bool(r.is_supplementary()),
}
_FIELD_PLAN = [
    (f, f[:2], _FIELD_GETTERS.get(f)) for f in BAM_FIELDS_TO_REPORT
]


def record_metadata(record: BamRecord, seq: str, qual: str) -> List[str]:
    """The 38-field metadata row (`src/parse/bam.rs:197-236`).

    Per field: a string (Z) aux tag whose first two bytes match wins
    (htslib's 2-byte tag resolution), then the built-in accessor, else "".
    """
    tags = record.tags
    fields = []
    for name, tag2, getter in _FIELD_PLAN:
        t = tags.get(tag2)
        if t is not None and t[0] == "Z":
            fields.append(str(t[1]))
        elif name == "QUAL":
            fields.append(qual)
        elif name == "SEQ":
            fields.append(seq)
        elif getter is not None:
            fields.append(getter(record))
        else:
            fields.append("")
    return fields


class UMIReader:
    """Yields UMI×CB groups with per-record metadata (`src/parse/bam.rs:51`)."""

    def __init__(self, file_path: str, terminate_on_error: bool, force_bam_paired: bool):
        self.reader = SortedBamReader(file_path, force_bam_paired)
        self.read_counter = 0
        self.current_umi_group: List[str] = []       # clipped seq strings
        self.current_metadata_group: List[List[str]] = []
        self.current_umi = ""
        self.current_cell_barcode = ""
        self.next_umi_group: List[str] = []
        self.next_metadata_group: List[List[str]] = []
        self.next_umi = ""
        self.next_cell_barcode = ""
        self.terminate_on_error = terminate_on_error
        self.number_error_reports = 0
        self.number_cr_skipped = 0
        self.current_iteration_key = ""
        self.next_iteration_key = ""

    def next(self) -> bool:
        """Advance to the next group; True when the stream is exhausted."""
        return self._get_umi_from_bam() is None

    def _get_umi_from_bam(self) -> Optional[bool]:
        self.current_umi_group = list(self.next_umi_group)
        self.current_metadata_group = list(self.next_metadata_group)
        self.current_umi = self.next_umi
        self.current_iteration_key = self.next_iteration_key
        self.current_cell_barcode = self.next_cell_barcode
        self.next_umi_group.clear()
        self.next_metadata_group.clear()
        self.next_umi = ""
        self.next_cell_barcode = ""
        self.next_iteration_key = ""

        while True:
            try:
                record = self.reader.next()
            except BamTruncated:
                return None

            self.read_counter += 1
            if self.read_counter % READ_BLOCK_REPORT_SIZE == 0:
                print(
                    f"Aligned reads {self.read_counter - READ_BLOCK_REPORT_SIZE}"
                    f"-{self.read_counter}"
                )

            read_umi = _read_umi(record)
            cb = record.aux_string("CB")
            if cb is None:
                raise ValueError(
                    "Error Read without cell barcode, cannot excise read-mate."
                )
            current_cell_barcode = cb[: len(cb) - 2]
            current_iteration_key = read_umi + current_cell_barcode

            if self.current_umi == "":
                self.current_umi = read_umi
            if self.current_iteration_key == "":
                self.current_iteration_key = read_umi + current_cell_barcode

            # DnaString normalization: non-ACGT bases (incl. N) become 'A',
            # mirroring `DnaString::from_acgt_bytes` on the clipped slice.
            seq = decode_bases(
                encode_bases(strip_nonbio_regions(record.seq, record.is_reverse()))
            )
            # latin-1 maps byte k -> chr(k): the qual-value-as-chars string
            qual = record.qual.decode("latin-1")
            qual = strip_nonbio_regions_qual(qual, record.is_reverse())
            fields = record_metadata(record, seq, qual)

            if self.current_iteration_key == current_iteration_key:
                self.current_umi_group.append(seq)
                self.current_metadata_group.append(fields)
                self.current_cell_barcode = current_cell_barcode
                self.current_iteration_key = current_iteration_key
            else:
                self.next_umi_group.append(seq)
                self.next_metadata_group.append(fields)
                self.next_umi = read_umi
                self.next_cell_barcode = current_cell_barcode
                self.next_iteration_key = current_iteration_key
                return True


def _read_umi(record: BamRecord) -> str:
    ub = record.aux_string("UB")
    if ub is not None:
        return ub
    ur = record.aux_string("UR")
    if ur is not None:
        return ur
    raise ValueError("Error -- Could not read UMI.")
