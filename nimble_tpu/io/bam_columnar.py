"""Columnar BAM group streaming: the fast-path equivalent of
SortedBamReader + UMIReader (`src/parse/sorted_bam_reader.rs`,
`src/parse/bam.rs`) with records kept as flat arrays / bytes columns
end-to-end — no per-record Python objects.

Records are parsed in bulk by the native C++ scanner (`nimble_bam_scan`),
derived fields (the 38-field metadata row, clipped/normalized sequences,
CB/UMI tags) are computed in one C++ pass (`nimble_bam_meta`), and the
UMI-run buffering / CB sort / dummy-pair / qname-pairing / UMI×CB group-by
semantics run over lightweight index lists.

Byte-parity contract: the stream of groups (record order + per-record
metadata) equals what `UMIReader` over `SortedBamReader` yields — the
pipeline tests assert the final gzipped TSVs are byte-identical.
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Tuple

import numpy as np

from nimble_tpu.io.umi import READ_BLOCK_REPORT_SIZE

UMI_WHITELIST = (b"AAAAAAAAAA",)  # `src/parse/sorted_bam_reader.rs:4`


@dataclass
class EmittedBatch:
    """Many UMI×CB groups in one flat columnar batch.

    Per-record lists cover all emitted records of the batch in order;
    ``group_off`` (int64, n_groups+1) delimits groups.  The output metadata
    block of record i is ``meta[i] + b"\\t" + skip[i]``.
    """

    meta: List[bytes]
    skip: List[bytes]
    qual: List[bytes]
    rev2: List[bytes]
    seq15: List[bytes]
    qn: List[bytes]
    seqs: List[np.ndarray]
    group_off: np.ndarray

    def __len__(self) -> int:
        return len(self.meta)

    @property
    def n_groups(self) -> int:
        return len(self.group_off) - 1

    def drop_last_group(self) -> "EmittedBatch":
        """Batch minus its final group (the reference's dropped-final-UMI
        quirk, `src/process/bam.rs:163-179`)."""
        if self.n_groups == 0:
            return self
        end = int(self.group_off[-2])
        return EmittedBatch(
            self.meta[:end], self.skip[:end], self.qual[:end],
            self.rev2[:end], self.seq15[:end], self.qn[:end],
            self.seqs[:end], self.group_off[:-1].copy(),
        )


@dataclass
class EmittedGroup:
    """One UMI×CB group in columnar form (post sort/dummy/pairing).

    Per-record lists are in reader emission order (R1/R2 interleaved).
    ``meta`` holds the 35 leading output metadata fields tab-joined;
    the full output metadata block is ``meta[i] + b"\\t" + skip[i]``.
    """

    meta: List[bytes] = field(default_factory=list)    # 35-field prefix
    skip: List[bytes] = field(default_factory=list)    # metadata[37]
    qual: List[bytes] = field(default_factory=list)    # metadata[1]
    rev2: List[bytes] = field(default_factory=list)    # metadata[2]
    seq15: List[bytes] = field(default_factory=list)   # metadata[15]
    qn: List[bytes] = field(default_factory=list)      # metadata[0]
    seqs: List[np.ndarray] = field(default_factory=list)  # clipped codes

    def append_record(self, c: "_Carry", i: int, skip_val: bytes) -> None:
        self.meta.append(c.meta[i])
        self.skip.append(skip_val)
        self.qual.append(c.meta1[i])
        self.rev2.append(c.rev2[i])
        self.seq15.append(c.meta15[i])
        self.qn.append(c.qn[i])
        self.seqs.append(c.seqs[i])

    def __len__(self) -> int:
        return len(self.meta)

    def metadata_rows(self) -> List[List[str]]:
        """Expand to UMIReader-style 38-field rows (slow-path interop,
        used by tests and the non-columnar consumer)."""
        rows = []
        for i in range(len(self.meta)):
            parts = self.meta[i].decode("latin-1").split("\t")
            # parts = fields [0, 2..14, 16..36]
            row = (
                [parts[0]]
                + [self.qual[i].decode("latin-1")]
                + parts[1:14]
                + [self.seq15[i].decode("latin-1")]
                + parts[14:]
                + [self.skip[i].decode("latin-1")]
            )
            rows.append(row)
        return rows


def read_bam_header(f) -> Tuple[str, List[Tuple[str, int]]]:
    """Parse the BAM header from a decompressed stream; returns (text, refs)."""

    def rd(n):
        d = f.read(n)
        if len(d) != n:
            raise EOFError("truncated BAM stream")
        return d

    if rd(4) != b"BAM\x01":
        raise ValueError("not a BAM file")
    l_text = struct.unpack("<i", rd(4))[0]
    text = rd(l_text).decode("ascii", "replace")
    n_ref = struct.unpack("<i", rd(4))[0]
    refs = []
    for _ in range(n_ref):
        l_name = struct.unpack("<i", rd(4))[0]
        name = rd(l_name)[:-1].decode("ascii", "replace")
        refs.append((name, struct.unpack("<i", rd(4))[0]))
    return text, refs


def _split_bytes(offs: np.ndarray, flat: np.ndarray, idx) -> List[bytes]:
    b = flat.tobytes()
    return [b[offs[i] : offs[i + 1]] for i in idx]


class _Carry:
    """Pending (not yet emitted) surviving records, in stream order."""

    COLS = ("meta", "meta1", "meta15", "rev2", "qn", "sk", "cb", "umi",
            "qname_raw")

    def __init__(self):
        for c in self.COLS:
            setattr(self, c, [])
        self.seqs: List[np.ndarray] = []
        self.paired: List[bool] = []
        self.fit: List[bool] = []  # first-in-template

    def __len__(self):
        return len(self.umi)

    def extend(self, other: "_Carry") -> None:
        for c in self.COLS:
            getattr(self, c).extend(getattr(other, c))
        self.seqs.extend(other.seqs)
        self.paired.extend(other.paired)
        self.fit.extend(other.fit)

    def drop_front(self, n: int) -> None:
        for c in self.COLS:
            setattr(self, c, getattr(self, c)[n:])
        self.seqs = self.seqs[n:]
        self.paired = self.paired[n:]
        self.fit = self.fit[n:]


class ColumnarGroupStream:
    """Yields UMI×CB groups (EmittedGroup) with reference semantics.

    Requires the native library; callers fall back to the object-based
    UMIReader when :func:`nimble_tpu.native.available` is false.
    """

    _CHUNK = 8 << 20

    def __init__(self, path: str, force_bam_paired: bool):
        from nimble_tpu import native

        if not native.available():
            raise RuntimeError("columnar BAM stream requires the native library")
        from nimble_tpu.io.bam import _warn_missing_eof

        self._native = native
        _warn_missing_eof(path)
        self._f = gzip.open(path, "rb")
        read_bam_header(self._f)
        self.force_bam_paired = force_bam_paired
        self.read_counter = 0
        self._tail = b""
        self._eof = False
        self._error: Optional[Exception] = None

    # -------------------------- chunk ingestion ------------------------

    def _scan_chunk(self) -> Optional[_Carry]:
        """Read+scan one chunk, apply skip rules; None at (logical) EOF."""
        while True:
            if self._error is not None:
                return None  # no reads past a fatal record
            if self._eof and not self._tail:
                return None
            if not self._eof:
                chunk = self._f.read(self._CHUNK)
                if len(chunk) < self._CHUNK:
                    self._eof = True
                data = self._tail + chunk
            else:
                data = self._tail
            if not data:
                return None
            res = self._native.bam_scan(data, len(data) // 36 + 1)
            (count, consumed, fixed, qname, seq, qual, aux, _cig) = res
            self._tail = data[consumed:]
            if count == 0:
                if self._eof:
                    if self._tail:
                        raise EOFError("truncated BAM stream")
                    return None
                continue

            cols = self._native.bam_meta(count, fixed, qname, seq, qual, aux)
            oflags = cols["oflags"]
            paired = (oflags & 1) != 0
            has_cb = (oflags & 4) != 0
            has_umi = (oflags & 8) != 0

            # skip rules, reference order (`sorted_bam_reader.rs:45-68`)
            keep = np.ones(count, dtype=bool)
            if self.force_bam_paired:
                keep &= paired
            keep &= has_cb
            bad_umi = keep & ~has_umi
            if bad_umi.any():
                # the reference raises when the reader reaches this record
                first_bad = int(np.flatnonzero(bad_umi)[0])
                keep &= np.arange(count) < first_bad
                self._error = ValueError("Error -- Could not read UMI.")

            idx = np.flatnonzero(keep)
            umis = _split_bytes(*cols["umi"], idx)
            if any(u in UMI_WHITELIST for u in umis):
                sub = [j for j, u in enumerate(umis) if u not in UMI_WHITELIST]
                idx = idx[sub]
                umis = [umis[j] for j in sub]

            out = _Carry()
            out.umi = umis
            out.meta = _split_bytes(*cols["meta"], idx)
            out.meta1 = _split_bytes(*cols["meta1"], idx)
            out.meta15 = _split_bytes(*cols["meta15"], idx)
            out.rev2 = _split_bytes(*cols["rev2"], idx)
            out.qn = _split_bytes(*cols["qn"], idx)
            out.sk = _split_bytes(*cols["sk"], idx)
            out.cb = _split_bytes(*cols["cb"], idx)
            out.qname_raw = _split_bytes(qname[0], qname[1], idx)
            s_offs, s_flat = cols["seq2"]
            out.seqs = [s_flat[s_offs[i] : s_offs[i + 1]] for i in idx]
            out.paired = [bool(b) for b in paired[idx]]
            out.fit = [bool(b) for b in (oflags[idx] & 16) != 0]
            return out

    # ----------------- run processing (SortedBamReader) ----------------

    def _run_entries(self, c: _Carry, lo: int, hi: int,
                     is_final: bool) -> List[Tuple[int, bytes]]:
        """CB-sort + dummy-pair + qname-pair one UMI run; returns emission
        order as (carry_index, SKIP_ALIGN value) pairs."""
        order = list(range(lo, hi))
        if not is_final:
            # stable sort by full CB (`sorted_bam_reader.rs:85-97`);
            # the FINAL run of the file is never sorted (reference quirk)
            order.sort(key=lambda i: c.cb[i])

        if not self.force_bam_paired:
            # dummy-pair expansion (`:109-125`): every record gets
            # SKIP_ALIGN=FALSE; unpaired records get a TRUE clone appended
            buf: List[Tuple[int, bytes]] = []
            for i in order:
                buf.append((i, b"FALSE"))
                if not c.paired[i]:
                    buf.append((i, b"TRUE"))
        else:
            # no SKIP_ALIGN push: metadata[37] = the aux SK value if any
            buf = [(i, c.sk[i]) for i in order]

        # qname pairing (`:127-162`): adjacent equal-qname records survive,
        # first-in-template first; singles dropped with a warning
        qn = c.qname_raw
        fit = c.fit
        entries: List[Tuple[int, bytes]] = []
        n = len(buf)
        j = 0
        seen_qnames: Optional[set] = None
        while j < n:
            if j + 1 >= n:
                break
            i1, s1 = buf[j]
            i2, s2 = buf[j + 1]
            if qn[i1] == qn[i2]:
                if fit[i1]:
                    entries.append((i1, s1))
                    entries.append((i2, s2))
                else:
                    entries.append((i2, s2))
                    entries.append((i1, s1))
                if seen_qnames is not None:
                    seen_qnames.add(qn[i1])
                j += 2
            else:
                print("Warning: Unpaired qname!")
                if seen_qnames is None:
                    seen_qnames = set(qn[i] for i, _ in entries)
                if qn[i1] in seen_qnames:
                    print(
                        f"Warning: Read with qname "
                        f"'{qn[i1].decode('latin-1')}' has been deleted "
                        "but was seen before."
                    )
                seen_qnames.add(qn[i1])
                j += 1
        return entries

    # ------------------- group iteration (UMIReader) -------------------

    def groups(self) -> Iterator[EmittedGroup]:
        """Yield completed UMI×CB groups in stream order.

        The caller reproduces the pipeline's final-group quirk (the
        reference producer drops the last group of a multi-group BAM when
        parity quirks are on, `src/process/bam.rs:163-179`).
        """
        carry = _Carry()
        cur: Optional[EmittedGroup] = None
        cur_key: Optional[bytes] = None

        while True:
            batch = self._scan_chunk()
            at_eof = batch is None
            if batch is not None:
                carry.extend(batch)
            n = len(carry)

            boundaries = [0]
            umis = carry.umi
            for i in range(1, n):
                if umis[i] != umis[i - 1]:
                    boundaries.append(i)
            boundaries.append(n)
            runs = list(zip(boundaries[:-1], boundaries[1:]))
            if runs and runs[-1][0] == runs[-1][1]:
                runs.pop()
            if not at_eof and runs:
                # the last run may continue into the next chunk
                keep_from = runs[-1][0]
                runs = runs[:-1]
            else:
                keep_from = n
            if at_eof and self._error is not None and runs:
                # the reference raises while filling the run in progress,
                # discarding it (and the still-open group before it)
                runs = runs[:-1]

            for lo, hi in runs:
                is_final = at_eof and hi == n
                for i, skip_val in self._run_entries(carry, lo, hi, is_final):
                    self.read_counter += 1
                    if self.read_counter % READ_BLOCK_REPORT_SIZE == 0:
                        print(
                            f"Aligned reads "
                            f"{self.read_counter - READ_BLOCK_REPORT_SIZE}"
                            f"-{self.read_counter}"
                        )
                    key = umis[i] + carry.cb[i][: max(len(carry.cb[i]) - 2, 0)]
                    if key != cur_key:
                        if cur is not None:
                            yield cur
                        cur = EmittedGroup()
                        cur_key = key
                    cur.append_record(carry, i, skip_val)

            if at_eof:
                if self._error is not None:
                    raise self._error
                if cur is not None and len(cur):
                    yield cur
                self._f.close()
                return
            carry.drop_front(keep_from)

    # ------------------- batch iteration (fast pipeline) ----------------

    _SKIP_BYTES = (b"FALSE", b"TRUE")

    def batches(self, target_records: int = 16384) -> Iterator[EmittedBatch]:
        """Yield flat multi-group batches (EmittedBatch) in stream order.

        Same emission semantics as :meth:`groups`; the run/sort/pair/group
        index work runs in C++ (`nimble_bam_runs`) when available, falling
        back to the Python helpers for irregular streams (unpaired-qname
        warnings need the reference's prints).  The stream's CURRENT last
        group is withheld until more groups follow or clean EOF — exactly
        when the object-based reader would surface it.
        """
        from nimble_tpu import native as _native

        carry = _Carry()
        acc = EmittedBatch([], [], [], [], [], [], [],
                           np.zeros(1, dtype=np.int64))
        starts: List[int] = []  # absolute group starts in acc

        def emit_ready(final: bool):
            n_keep = 0 if final else 1
            while len(starts) > n_keep and (
                final or starts[-1] >= target_records
            ):
                end = starts[-1] if not final else len(acc.meta)
                cut = len(starts) - n_keep
                out = EmittedBatch(
                    acc.meta[:end], acc.skip[:end], acc.qual[:end],
                    acc.rev2[:end], acc.seq15[:end], acc.qn[:end],
                    acc.seqs[:end],
                    np.asarray(starts[:cut] + [end], dtype=np.int64),
                )
                del acc.meta[:end], acc.skip[:end], acc.qual[:end]
                del acc.rev2[:end], acc.seq15[:end], acc.qn[:end]
                del acc.seqs[:end]
                rem = [s - end for s in starts[cut:]]
                starts.clear()
                starts.extend(rem)
                yield out
                if final:
                    break

        def add_emitted(c: _Carry, emit_idx, emit_skip, group_starts):
            base = len(acc.meta)
            for s in group_starts:
                starts.append(base + int(s))
            sk_map = self._SKIP_BYTES
            for j in range(len(emit_idx)):
                i = int(emit_idx[j])
                s = emit_skip[j]
                acc.meta.append(c.meta[i])
                acc.skip.append(sk_map[s] if s < 2 else c.sk[i])
                acc.qual.append(c.meta1[i])
                acc.rev2.append(c.rev2[i])
                acc.seq15.append(c.meta15[i])
                acc.qn.append(c.qn[i])
                acc.seqs.append(c.seqs[i])
            # progress print parity (`src/parse/bam.rs:121-127`)
            before = self.read_counter
            self.read_counter += len(emit_idx)
            blk = READ_BLOCK_REPORT_SIZE
            for mark in range((before // blk) + 1,
                              (self.read_counter // blk) + 1):
                print(f"Aligned reads {(mark - 1) * blk}-{mark * blk}")

        def flatten(col: List[bytes]):
            offs = np.zeros(len(col) + 1, dtype=np.int64)
            np.cumsum(
                np.fromiter((len(b) for b in col), dtype=np.int64,
                            count=len(col)),
                out=offs[1:],
            )
            return offs, np.frombuffer(b"".join(col), dtype=np.uint8)

        while True:
            batch = self._scan_chunk()
            at_eof = batch is None
            if batch is not None:
                carry.extend(batch)
            n = len(carry)
            if n == 0 and at_eof:
                if self._error is not None:
                    # the reference discards the open group before erroring
                    if starts:
                        end = starts.pop()
                        del acc.meta[end:], acc.skip[end:], acc.qual[end:]
                        del acc.rev2[end:], acc.seq15[end:], acc.qn[end:]
                        del acc.seqs[end:]
                    yield from emit_ready(final=True)
                    raise self._error
                yield from emit_ready(final=True)
                self._f.close()
                return

            res = None
            if n:
                oflags = np.zeros(n, dtype=np.uint8)
                for i in range(n):
                    f = 0
                    if carry.paired[i]:
                        f |= 1
                    if carry.fit[i]:
                        f |= 16
                    oflags[i] = f
                res = _native.bam_runs(
                    flatten(carry.umi), flatten(carry.cb),
                    flatten(carry.qname_raw), oflags, n,
                    self.force_bam_paired,
                    at_eof and self._error is None,
                )
            if res is not None:
                emit_idx, emit_skip, group_off, consumed = res
                add_emitted(carry, emit_idx, emit_skip, group_off[:-1])
                carry.drop_front(consumed)
            elif n:
                # Python fallback (irregular stream: reference warnings)
                boundaries = [0]
                umis = carry.umi
                for i in range(1, n):
                    if umis[i] != umis[i - 1]:
                        boundaries.append(i)
                boundaries.append(n)
                runs = [
                    (a, b)
                    for a, b in zip(boundaries[:-1], boundaries[1:]) if a < b
                ]
                process_final = at_eof and self._error is None
                if not process_final and runs:
                    keep_from = runs[-1][0]
                    runs = runs[:-1]
                else:
                    keep_from = n
                e_idx: List[int] = []
                e_skip: List[int] = []
                g_starts: List[int] = []
                last_key = None
                for lo, hi in runs:
                    is_final_run = process_final and hi == n
                    for i, skip_val in self._run_entries(
                        carry, lo, hi, is_final_run
                    ):
                        cb = carry.cb[i]
                        key = carry.umi[i] + cb[: max(len(cb) - 2, 0)]
                        if key != last_key:
                            g_starts.append(len(e_idx))
                            last_key = key
                        e_idx.append(i)
                        e_skip.append(
                            2 if self.force_bam_paired
                            else (1 if skip_val == b"TRUE" else 0)
                        )
                add_emitted(carry, e_idx, np.asarray(e_skip, dtype=np.int8),
                            g_starts)
                carry.drop_front(keep_from)

            if at_eof:
                if self._error is not None:
                    if starts:  # discard the open group
                        end = starts.pop()
                        del acc.meta[end:], acc.skip[end:], acc.qual[end:]
                        del acc.rev2[end:], acc.seq15[end:], acc.qn[end:]
                        del acc.seqs[end:]
                    yield from emit_ready(final=True)
                    raise self._error
                yield from emit_ready(final=True)
                self._f.close()
                return
            yield from emit_ready(final=False)
