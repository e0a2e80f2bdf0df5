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
