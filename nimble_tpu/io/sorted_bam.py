"""UMI-run buffering BAM reader.

Parity port of `SortedBamReader` (`src/parse/sorted_bam_reader.rs:6-186`):

  * streams records, skipping: unpaired reads when ``force_bam_paired``
    (`:45-47`), records without a CB tag (`:49-54`), and the whitelisted UMI
    "AAAAAAAAAA" (`:66-68`);
  * buffers one consecutive UMI run at a time; when the UMI changes the
    buffered run is stably sorted by full CB string (`:84-97`) — NB the FINAL
    run of the file is NOT sorted (the loop ends before the sort branch),
    reproduced;
  * unless forcing pairs, every unpaired read gets a cloned dummy with
    SKIP_ALIGN=TRUE appended so downstream always sees R1/R2 interleaving
    (`add_dummy_paired_reads`, `:109-125`); NB the original+dummy pair is
    emitted dummy-first because ``is_first_in_template`` is false for both
    (`filter_paired_reads` `:136-142`);
  * only adjacent records with equal qname survive, first-in-template first
    (`:127-162`); odd trailing records are dropped;
  * exhaustion surfaces as ``BamTruncated`` (the reference's
    BamTruncatedRecord error, `:183`).
"""

from __future__ import annotations

from typing import List, Optional

from nimble_tpu.io.bam import BamReader, BamRecord, BamRecordError

UMI_TAG_WHITELIST = ("AAAAAAAAAA",)  # `src/parse/sorted_bam_reader.rs:4`


class BamTruncated(Exception):
    """End-of-stream marker (reference: rust_htslib BamTruncatedRecord)."""


def read_umi(record: BamRecord) -> str:
    """UB (corrected) falling back to UR (`src/parse/sorted_bam_reader.rs:56-64`)."""
    ub = record.aux_string("UB")
    if ub is not None:
        return ub
    ur = record.aux_string("UR")
    if ur is not None:
        return ur
    raise ValueError("Error -- Could not read UMI.")


class SortedBamReader:
    def __init__(self, file_path: str, force_bam_paired: bool):
        self._records = iter(BamReader(file_path))
        self._exhausted = False
        self.current_umi = ""
        self.dna_sorted_buffer: List[BamRecord] = []
        self.next_records: List[BamRecord] = []
        self.next_umi = ""
        self.force_bam_paired = force_bam_paired

    def _fill_buffer(self) -> None:
        self.dna_sorted_buffer.clear()
        self.dna_sorted_buffer.extend(self.next_records)
        self.next_records.clear()
        self.current_umi = self.next_umi

        if self._exhausted:
            return
        while True:
            try:
                record = next(self._records)
            except StopIteration:
                break
            except BamRecordError:
                # undecodable records are skipped, mirroring the reference's
                # `Err(_) => continue` (`src/parse/sorted_bam_reader.rs:38-43`)
                continue
            if not record.is_paired() and self.force_bam_paired:
                continue
            if record.aux_string("CB") is None:
                continue
            umi = read_umi(record)
            if umi in UMI_TAG_WHITELIST:
                continue
            if self.current_umi == "":
                self.current_umi = umi
            if self.current_umi != umi:
                # sort the completed run by full CB string (stable)
                self.dna_sorted_buffer.sort(key=lambda r: r.aux_string("CB") or "")
                self.next_records.append(record)
                self.next_umi = umi
                return
            self.dna_sorted_buffer.append(record)
        self._exhausted = True
        # NB: reference does NOT sort the final run (loop ends naturally)

    def _add_dummy_paired_reads(self) -> None:
        new_buffer: List[BamRecord] = []
        for read in self.dna_sorted_buffer:
            modified = _clone(read)
            modified.push_aux("SKIP_ALIGN", "FALSE")
            new_buffer.append(modified)
            if not read.is_paired():
                dummy = _clone(read)
                dummy.push_aux("SKIP_ALIGN", "TRUE")
                new_buffer.append(dummy)
        self.dna_sorted_buffer = new_buffer

    def _filter_paired_reads(self) -> None:
        paired: List[BamRecord] = []
        seen_qnames = set()
        buf = self.dna_sorted_buffer
        i = 0
        while i < len(buf):
            if i + 1 < len(buf):
                q1, q2 = buf[i].qname, buf[i + 1].qname
                if q1 == q2:
                    if buf[i].is_first_in_template():
                        paired.append(buf[i])
                        paired.append(buf[i + 1])
                    else:
                        paired.append(buf[i + 1])
                        paired.append(buf[i])
                    seen_qnames.add(q1)
                    i += 2
                else:
                    print("Warning: Unpaired qname!")
                    if q1 in seen_qnames:
                        print(
                            f"Warning: Read with qname '{q1}' has been deleted "
                            "but was seen before."
                        )
                    seen_qnames.add(q1)
                    i += 1
            else:
                break
        self.dna_sorted_buffer = paired

    def next(self) -> BamRecord:
        if self.dna_sorted_buffer:
            return self.dna_sorted_buffer.pop()
        self._fill_buffer()
        if not self.force_bam_paired:
            self._add_dummy_paired_reads()
        self._filter_paired_reads()
        self.dna_sorted_buffer.reverse()
        if self.dna_sorted_buffer:
            return self.dna_sorted_buffer.pop()
        raise BamTruncated()


def _clone(record: BamRecord) -> BamRecord:
    return BamRecord(
        qname=record.qname, flag=record.flag, tid=record.tid, pos=record.pos,
        mapq=record.mapq, mtid=record.mtid, mpos=record.mpos, tlen=record.tlen,
        seq=record.seq, qual=record.qual, cigar_ops=list(record.cigar_ops),
        tags=dict(record.tags),
    )
