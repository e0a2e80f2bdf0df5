"""BAM container codec (reader + writer), no external dependencies.

The reference reads BAMs through rust-htslib (C htslib,
`src/parse/sorted_bam_reader.rs:1`); this is a from-scratch implementation of
the BAM spec (BGZF-compressed binary records) sufficient for the pipeline's
needs and for generating synthetic fixtures:

  * reading: Python's gzip module decompresses concatenated BGZF members
    transparently; records are decoded per the SAM/BAM spec;
  * writing: spec-compliant BGZF blocks (FEXTRA 'BC' subfield with BSIZE)
    plus the standard 28-byte EOF marker, so outputs are readable by
    samtools/htslib as well;
  * aux tags are looked up by their FIRST TWO BYTES, mirroring htslib's
    ``bam_aux_get`` (the reference calls ``record.aux(b"SKIP_ALIGN")`` which
    htslib resolves as tag "SK" — `src/parse/sorted_bam_reader.rs:114-119`).

Flag-bit accessors mirror the rust-htslib names used by the reference
(`src/parse/bam.rs:210-230`).
"""

from __future__ import annotations

import gzip
import struct
import zlib
from dataclasses import dataclass, field
from typing import BinaryIO, Dict, Iterator, List, Optional, Tuple

import numpy as np

# 4-bit seq codes per the BAM spec
_SEQ_DECODE = "=ACMGRSVTWYHKDBN"
_SEQ_ENCODE = {c: i for i, c in enumerate(_SEQ_DECODE)}
_SEQ_DECODE_LUT = np.frombuffer(_SEQ_DECODE.encode("ascii"), dtype=np.uint8)

FLAG_PAIRED = 0x1
FLAG_PROPER_PAIR = 0x2
FLAG_UNMAPPED = 0x4
FLAG_MATE_UNMAPPED = 0x8
FLAG_REVERSE = 0x10
FLAG_MATE_REVERSE = 0x20
FLAG_FIRST_IN_TEMPLATE = 0x40
FLAG_LAST_IN_TEMPLATE = 0x80
FLAG_SECONDARY = 0x100
FLAG_QCFAIL = 0x200
FLAG_DUPLICATE = 0x400
FLAG_SUPPLEMENTARY = 0x800

_CIGAR_OPS = "MIDNSHP=X"


@dataclass
class BamRecord:
    """One alignment record with htslib-style accessors."""

    qname: str = ""
    flag: int = 0
    tid: int = -1
    pos: int = -1
    mapq: int = 255
    mtid: int = -1
    mpos: int = -1
    tlen: int = 0
    seq: str = ""
    qual: bytes = b""              # raw quality VALUES (no +33 offset)
    cigar_ops: List[Tuple[int, int]] = field(default_factory=list)  # (oplen, op)
    # insertion-ordered aux tags: 2-char tag -> (type_char, value)
    tags: Dict[str, Tuple[str, object]] = field(default_factory=dict)

    # --- flags (names mirror rust-htslib / `src/parse/bam.rs:210-230`) ---
    def is_paired(self):            return bool(self.flag & FLAG_PAIRED)
    def is_proper_pair(self):       return bool(self.flag & FLAG_PROPER_PAIR)
    def is_unmapped(self):          return bool(self.flag & FLAG_UNMAPPED)
    def is_mate_unmapped(self):     return bool(self.flag & FLAG_MATE_UNMAPPED)
    def is_reverse(self):           return bool(self.flag & FLAG_REVERSE)
    def is_mate_reverse(self):      return bool(self.flag & FLAG_MATE_REVERSE)
    def is_first_in_template(self): return bool(self.flag & FLAG_FIRST_IN_TEMPLATE)
    def is_last_in_template(self):  return bool(self.flag & FLAG_LAST_IN_TEMPLATE)
    def is_secondary(self):         return bool(self.flag & FLAG_SECONDARY)
    def is_quality_check_failed(self): return bool(self.flag & FLAG_QCFAIL)
    def is_duplicate(self):         return bool(self.flag & FLAG_DUPLICATE)
    def is_supplementary(self):     return bool(self.flag & FLAG_SUPPLEMENTARY)

    def seq_len(self) -> int:
        return len(self.seq)

    def insert_size(self) -> int:
        return self.tlen

    def strand_symbol(self) -> str:
        """rust-htslib Record::strand(): reverse flag decides +/-."""
        return "-" if self.is_reverse() else "+"

    def cigar_string(self) -> str:
        return "".join(f"{ln}{_CIGAR_OPS[op]}" for ln, op in self.cigar_ops) or "*"

    def read_pair_orientation(self) -> str:
        """rust-htslib 0.40 ``Record::read_pair_orientation`` (the reference
        renders it with the bio-types enum's Display, `src/parse/bam.rs:214`).

        Semantics per rust-htslib's implementation: requires a paired record
        with both mates mapped to the same contig; if both mates start at the
        same position the orientation is undecidable and the result is
        ``None``; otherwise the label leads with the leftmost mate's
        (strand, template-role) pair — e.g. ``F1R2`` = read 1 forward at the
        lower coordinate, read 2 reverse.  Derived from the rust-htslib
        ``record.rs`` source semantics (the crate itself is not in this
        image); the same-position→None case is documented in its API docs.
        """
        if (
            self.is_paired()
            and not self.is_unmapped()
            and not self.is_mate_unmapped()
            and self.tid == self.mtid
        ):
            if self.pos == self.mpos:
                # mates start at the same position: orientation undecidable
                return "None"
            self_label = ("R" if self.is_reverse() else "F") + (
                "1" if self.is_first_in_template() else "2"
            )
            mate_label = ("R" if self.is_mate_reverse() else "F") + (
                "2" if self.is_first_in_template() else "1"
            )
            if self.pos < self.mpos:
                return self_label + mate_label
            return mate_label + self_label
        return "None"

    # --- aux tags (htslib semantics: 2-byte tag resolution) ---
    def aux_string(self, tag: str) -> Optional[str]:
        """String (Z-type) aux value; non-Z or missing -> None.

        Mirrors the reference's ``if let Ok(Aux::String(s)) = record.aux(..)``
        pattern, including the first-two-bytes tag resolution.
        """
        t = self.tags.get(tag[:2])
        if t is not None and t[0] == "Z":
            return str(t[1])
        return None

    def push_aux(self, tag: str, value: str) -> None:
        """Append a string aux tag (first two bytes, htslib-style)."""
        self.tags[tag[:2]] = ("Z", value)


@dataclass
class BamHeader:
    text: str = ""
    references: List[Tuple[str, int]] = field(default_factory=list)  # (name, length)


# ---------------------------------------------------------------------------
# reading
# ---------------------------------------------------------------------------

def _read_exact(f: BinaryIO, n: int) -> bytes:
    data = f.read(n)
    if len(data) != n:
        raise EOFError("truncated BAM stream")
    return data


def _decode_aux(buf: bytes) -> Dict[str, Tuple[str, object]]:
    tags: Dict[str, Tuple[str, object]] = {}
    i = 0
    n = len(buf)
    while i + 3 <= n:
        tag = buf[i : i + 2].decode("ascii", "replace")
        typ = chr(buf[i + 2])
        i += 3
        if typ == "A":
            tags[tag] = (typ, chr(buf[i])); i += 1
        elif typ in "cC":
            tags[tag] = (typ, struct.unpack_from("<b" if typ == "c" else "<B", buf, i)[0]); i += 1
        elif typ in "sS":
            tags[tag] = (typ, struct.unpack_from("<h" if typ == "s" else "<H", buf, i)[0]); i += 2
        elif typ in "iI":
            tags[tag] = (typ, struct.unpack_from("<i" if typ == "i" else "<I", buf, i)[0]); i += 4
        elif typ == "f":
            tags[tag] = (typ, struct.unpack_from("<f", buf, i)[0]); i += 4
        elif typ in "ZH":
            end = buf.index(b"\x00", i)
            tags[tag] = ("Z" if typ == "Z" else "H", buf[i:end].decode("ascii", "replace"))
            i = end + 1
        elif typ == "B":
            sub = chr(buf[i])
            cnt = struct.unpack_from("<i", buf, i + 1)[0]
            size = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}[sub]
            fmt = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}[sub]
            arr = struct.unpack_from("<%d%s" % (cnt, fmt), buf, i + 5)
            tags[tag] = (typ, list(arr))
            i += 5 + size * cnt
        else:
            break  # unknown type: stop parsing aux
    return tags


def _decode_record(data: bytes) -> BamRecord:
    (
        tid, pos, l_read_name, mapq, _bin, n_cigar, flag, l_seq,
        mtid, mpos, tlen,
    ) = struct.unpack_from("<iiBBHHHiiii", data, 0)
    off = 32
    qname = data[off : off + l_read_name - 1].decode("ascii", "replace")
    off += l_read_name
    cigar_ops = []
    for _ in range(n_cigar):
        v = struct.unpack_from("<I", data, off)[0]
        cigar_ops.append((v >> 4, v & 0xF))
        off += 4
    n_seq_bytes = (l_seq + 1) // 2
    packed = np.frombuffer(data, dtype=np.uint8, count=n_seq_bytes, offset=off)
    nibbles = np.empty(n_seq_bytes * 2, dtype=np.uint8)
    nibbles[0::2] = packed >> 4
    nibbles[1::2] = packed & 0xF
    seq = _SEQ_DECODE_LUT[nibbles[:l_seq]].tobytes().decode("ascii")
    off += n_seq_bytes
    qual = data[off : off + l_seq]
    off += l_seq
    tags = _decode_aux(data[off:])
    return BamRecord(
        qname=qname, flag=flag, tid=tid, pos=pos, mapq=mapq,
        mtid=mtid, mpos=mpos, tlen=tlen,
        seq=seq, qual=bytes(qual), cigar_ops=cigar_ops, tags=tags,
    )


class BamRecordError(ValueError):
    """A single record failed to decode (stream remains positioned)."""


def check_bgzf_eof(path: str) -> bool:
    """True iff the file ends with the 28-byte BGZF EOF marker.

    htslib warns "EOF marker is absent. The input is probably truncated"
    for BAMs missing it; per-block CRC32/ISIZE validation is done by the
    gzip module during decompression (BadGzipFile on mismatch).
    """
    try:
        with open(path, "rb") as f:
            f.seek(0, 2)
            size = f.tell()
            if size < len(_BGZF_EOF):
                return False
            f.seek(size - len(_BGZF_EOF))
            return f.read(len(_BGZF_EOF)) == _BGZF_EOF
    except OSError:
        return False


def _warn_missing_eof(path: str) -> None:
    if not check_bgzf_eof(path):
        print(f"[W::bam] EOF marker is absent. The input {path} is probably truncated")


class BgzfFile:
    """File-like BGZF reader over the native parallel inflater.

    Fills htslib's multi-threaded BGZF decompression role: BGZF members are
    independent gzip blocks, so each raw chunk splits into blocks that
    inflate concurrently in C++ (GIL released).  Error behavior mirrors the
    gzip module the fallback path uses: per-block CRC32/ISIZE are validated
    (``gzip.BadGzipFile`` on mismatch) and a stream ending inside a block
    raises ``EOFError`` like gzip's end-of-stream truncation error.
    """

    _RAW_CHUNK = 4 << 20

    def __init__(self, path: str, native, n_threads: int = 0):
        import os

        self._raw = open(path, "rb")
        self._native = native
        self._nt = n_threads or min(4, os.cpu_count() or 1)
        self._carry = b""
        self._pieces: list = []
        self._avail = 0
        self._pos = 0  # consumed prefix of _pieces[0]
        self._raw_eof = False

    def _ingest(self) -> None:
        chunk = b"" if self._raw_eof else self._raw.read(self._RAW_CHUNK)
        if len(chunk) < self._RAW_CHUNK:
            self._raw_eof = True
        data = self._carry + chunk
        if not data:
            return
        status, consumed, out = self._native.bgzf_inflate_chunk(
            data, self._nt)
        if status:
            raise gzip.BadGzipFile(
                f"corrupt BGZF stream (native inflate code {status})")
        self._carry = data[consumed:]
        if out:
            self._pieces.append(out)
            self._avail += len(out)
        if self._raw_eof and consumed == 0 and self._carry:
            raise EOFError("Compressed file ended before the "
                           "end-of-stream marker was reached")

    def read(self, n: int = -1) -> bytes:
        while (n < 0 or self._avail < n) and not (
                self._raw_eof and not self._carry):
            self._ingest()
        if n < 0 or n > self._avail:
            n = self._avail
        got: list = []
        need = n
        while need > 0:
            head = self._pieces[0]
            take = min(need, len(head) - self._pos)
            got.append(head[self._pos : self._pos + take])
            self._pos += take
            need -= take
            if self._pos == len(self._pieces[0]):
                self._pieces.pop(0)
                self._pos = 0
        self._avail -= n
        return got[0] if len(got) == 1 else b"".join(got)

    def close(self) -> None:
        self._raw.close()


def _sniff_bgzf(path: str) -> bool:
    """True iff the file starts with a BGZF member (gzip + FEXTRA 'BC')."""
    with open(path, "rb") as f:
        head = f.read(256)
    if len(head) < 18 or head[:3] != b"\x1f\x8b\x08" or not head[3] & 0x04:
        return False
    xlen = head[10] | (head[11] << 8)
    extra = head[12 : 12 + xlen]
    q = 0
    while q + 4 <= len(extra):
        slen = extra[q + 2] | (extra[q + 3] << 8)
        if extra[q : q + 2] == b"BC" and slen == 2:
            return True
        q += 4 + slen
    return False


def open_bgzf(path: str):
    """Open a BAM's BGZF stream: native parallel inflater when available
    and the file really is BGZF; otherwise Python's gzip (which handles
    concatenated members, the degenerate non-BGZF-gzip case included)."""
    from nimble_tpu import native

    if native.available() and _sniff_bgzf(path):
        return BgzfFile(path, native)
    return gzip.open(path, "rb")


class BamReader:
    """Streaming BAM reader (BGZF via gzip's concatenated-member support).

    When the native library is available, records are parsed in bulk by the
    C++ batch scanner (`nimble_bam_scan`) from chunked reads of the
    decompressed stream; otherwise each record is decoded in Python.

    Robustness (the role of htslib's checks): per-block CRC32/ISIZE are
    verified by gzip during decompression (BadGzipFile propagates), a
    missing BGZF EOF marker prints htslib's truncation warning at open, and
    a stream ending mid-record raises ``EOFError("truncated BAM stream")``.
    """

    _CHUNK = 4 << 20

    def __init__(self, path: str, use_native: bool = True):
        _warn_missing_eof(path)
        self._f = open_bgzf(path) if use_native else gzip.open(path, "rb")
        magic = _read_exact(self._f, 4)
        if magic != b"BAM\x01":
            raise ValueError(f"{path}: not a BAM file")
        l_text = struct.unpack("<i", _read_exact(self._f, 4))[0]
        text = _read_exact(self._f, l_text).decode("ascii", "replace")
        n_ref = struct.unpack("<i", _read_exact(self._f, 4))[0]
        refs = []
        for _ in range(n_ref):
            l_name = struct.unpack("<i", _read_exact(self._f, 4))[0]
            name = _read_exact(self._f, l_name)[:-1].decode("ascii", "replace")
            l_ref = struct.unpack("<i", _read_exact(self._f, 4))[0]
            refs.append((name, l_ref))
        self.header = BamHeader(text=text, references=refs)

        from nimble_tpu import native

        self._native = native if (use_native and native.available()) else None
        self._pending: list = []
        self._pending_pos = 0
        self._carry = b""
        self._eof = False

    def __iter__(self) -> Iterator[BamRecord]:
        return self

    def __next__(self) -> BamRecord:
        if self._native is not None:
            if self._pending_pos >= len(self._pending):
                self._fill_native()
            rec = self._pending[self._pending_pos]
            self._pending_pos += 1
            return rec

        size_bytes = self._f.read(4)
        if len(size_bytes) < 4:
            raise StopIteration
        block_size = struct.unpack("<i", size_bytes)[0]
        if block_size <= 0:
            raise BamRecordError(f"invalid record block size {block_size}")
        body = _read_exact(self._f, block_size)
        try:
            return _decode_record(body)
        except (struct.error, IndexError, UnicodeDecodeError) as e:
            # stream stays positioned at the next record
            raise BamRecordError(str(e)) from e

    def _fill_native(self) -> None:
        """Bulk-parse the next chunk of records via the C++ scanner."""
        while True:
            if not self._eof:
                chunk = self._f.read(self._CHUNK)
                if len(chunk) < self._CHUNK:
                    self._eof = True
                data = self._carry + chunk
            else:
                data = self._carry
            if not data:
                raise StopIteration
            res = self._native.bam_scan(data, len(data) // 36 + 1)
            (count, consumed, fixed, (qno, qnf), (sqo, sqf),
             (qlo, qlf), (axo, axf), (cgo, cgf)) = res
            self._carry = data[consumed:]
            if count == 0:
                if self._eof:
                    if self._carry:
                        raise EOFError("truncated BAM stream")
                    raise StopIteration
                continue  # need more bytes for even one record

            qn_all = qnf[: qno[count]].tobytes()
            sq_all = sqf[: sqo[count]].tobytes()
            ql_all = qlf[: qlo[count]].tobytes()
            ax_all = axf[: axo[count]].tobytes()

            pending = []
            for i in range(count):
                f = fixed[i]
                tags: Dict[str, Tuple[str, object]] = {}
                a, b = axo[i], axo[i + 1]
                while a < b:
                    tag = ax_all[a : a + 2].decode("ascii", "replace")
                    ln = ax_all[a + 2] | (ax_all[a + 3] << 8)
                    tags[tag] = ("Z", ax_all[a + 4 : a + 4 + ln].decode(
                        "ascii", "replace"))
                    a += 4 + ln
                cops = cgf[cgo[i] : cgo[i + 1]]
                pending.append(BamRecord(
                    qname=qn_all[qno[i] : qno[i + 1]].decode("ascii", "replace"),
                    flag=int(f[0]), tid=int(f[1]), pos=int(f[2]), mapq=int(f[3]),
                    mtid=int(f[4]), mpos=int(f[5]), tlen=int(f[6]),
                    seq=sq_all[sqo[i] : sqo[i + 1]].decode("ascii"),
                    qual=ql_all[qlo[i] : qlo[i + 1]],
                    cigar_ops=[(int(v) >> 4, int(v) & 0xF) for v in cops],
                    tags=tags,
                ))
            self._pending = pending
            self._pending_pos = 0
            return

    def close(self) -> None:
        self._f.close()


# ---------------------------------------------------------------------------
# writing
# ---------------------------------------------------------------------------

_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def _bgzf_block(payload: bytes) -> bytes:
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = comp.compress(payload) + comp.flush()
    # BC subfield stores total block size MINUS 1 (SAM spec 4.1; the EOF
    # marker encodes 0x1b = 27 for its 28-byte block)
    bsize = len(cdata) + 25  # header(12) + extra(6) + crc(4) + isize(4) - 1
    header = (
        b"\x1f\x8b\x08\x04" + b"\x00" * 6 + b"\x06\x00"
        + b"BC\x02\x00" + struct.pack("<H", bsize)
    )
    return header + cdata + struct.pack("<I", zlib.crc32(payload)) + struct.pack(
        "<I", len(payload) & 0xFFFFFFFF
    )


def _encode_aux(tags: Dict[str, Tuple[str, object]]) -> bytes:
    out = bytearray()
    for tag, (typ, value) in tags.items():
        out += tag.encode("ascii")[:2].ljust(2, b"\x00")
        if typ == "Z":
            out += b"Z" + str(value).encode("ascii") + b"\x00"
        elif typ == "A":
            out += b"A" + str(value).encode("ascii")[:1]
        elif typ == "i":
            out += b"i" + struct.pack("<i", int(value))
        elif typ == "f":
            out += b"f" + struct.pack("<f", float(value))
        else:
            raise ValueError(f"unsupported aux type for writing: {typ}")
    return bytes(out)


def _encode_record(rec: BamRecord) -> bytes:
    name = rec.qname.encode("ascii") + b"\x00"
    l_seq = len(rec.seq)
    seq_bytes = bytearray((l_seq + 1) // 2)
    for i, ch in enumerate(rec.seq):
        code = _SEQ_ENCODE.get(ch.upper(), 15)
        if i % 2 == 0:
            seq_bytes[i // 2] |= code << 4
        else:
            seq_bytes[i // 2] |= code
    qual = rec.qual if len(rec.qual) == l_seq else bytes([0xFF] * l_seq)
    cigar = b"".join(
        struct.pack("<I", (ln << 4) | op) for ln, op in rec.cigar_ops
    )
    aux = _encode_aux(rec.tags)
    body = (
        struct.pack(
            "<iiBBHHHiiii",
            rec.tid, rec.pos, len(name), rec.mapq, 0,
            len(rec.cigar_ops), rec.flag, l_seq, rec.mtid, rec.mpos, rec.tlen,
        )
        + name + cigar + bytes(seq_bytes) + qual + aux
    )
    return struct.pack("<i", len(body)) + body


class BamStreamWriter:
    """Incremental spec-compliant BAM writer (BGZF blocks + EOF marker).

    Same bytes as :func:`write_bam` for the same record sequence, but
    records stream to disk as they are added — reference-scale synthetic
    fixtures (millions of records) never materialize in memory."""

    _STEP = 60000  # BGZF blocks must stay under 64KB

    def __init__(self, path: str, header: BamHeader):
        self._f = open(path, "wb")
        self._buf = bytearray()
        self._buf += b"BAM\x01"
        text = header.text.encode("ascii")
        self._buf += struct.pack("<i", len(text)) + text
        self._buf += struct.pack("<i", len(header.references))
        for name, l_ref in header.references:
            nb = name.encode("ascii") + b"\x00"
            self._buf += struct.pack("<i", len(nb)) + nb
            self._buf += struct.pack("<i", l_ref)

    def add(self, rec: BamRecord) -> None:
        self._buf += _encode_record(rec)
        while len(self._buf) >= self._STEP:
            self._f.write(_bgzf_block(bytes(self._buf[: self._STEP])))
            del self._buf[: self._STEP]

    def close(self) -> None:
        if self._f is None:
            return
        if self._buf:
            self._f.write(_bgzf_block(bytes(self._buf)))
            self._buf.clear()
        self._f.write(_BGZF_EOF)
        self._f.close()
        self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_bam(path: str, header: BamHeader, records: List[BamRecord]) -> None:
    """Write a spec-compliant BAM (BGZF blocks + EOF marker)."""
    payload = bytearray()
    payload += b"BAM\x01"
    text = header.text.encode("ascii")
    payload += struct.pack("<i", len(text)) + text
    payload += struct.pack("<i", len(header.references))
    for name, l_ref in header.references:
        nb = name.encode("ascii") + b"\x00"
        payload += struct.pack("<i", len(nb)) + nb + struct.pack("<i", l_ref)
    for rec in records:
        payload += _encode_record(rec)

    with open(path, "wb") as f:
        # split into <=60KB blocks (BGZF blocks must stay under 64KB)
        view = memoryview(bytes(payload))
        step = 60000
        for i in range(0, len(view), step):
            f.write(_bgzf_block(bytes(view[i : i + step])))
        f.write(_BGZF_EOF)
