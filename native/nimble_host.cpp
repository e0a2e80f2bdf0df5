// Native host ops for nimble_tpu.
//
// The reference gets its host-side speed from Rust + C dependencies
// (rust-debruijn's packed DnaStrings, htslib, jemalloc); here the hot host
// paths are C++ behind a ctypes boundary with pure-Python fallbacks:
//
//   * encode_bases      — byte -> 2-bit code LUT translation (FASTQ/BAM ingest)
//   * fastq_scan        — record-boundary scan of a FASTQ text buffer
//   * build_hash_table  — open-addressing insertion loop for the k-mer table
//                         (must match ops/device_index.py's fmix32 hashing)
//   * extract_kmer_keys — rolling 60-bit k-mer keys of a code array
//
// Build: g++ -O3 -march=native -shared -fPIC nimble_host.cpp -o libnimble_host.so

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_set>

namespace {
struct DedupSet {
    std::unordered_set<std::string> seen;
};
}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// base encoding: A/a=0 C/c=1 G/g=2 T/t=3, everything else 0 (DnaString rule)
// ---------------------------------------------------------------------------
void nimble_encode_bases(const uint8_t* in, int64_t n, int8_t* out) {
    static int8_t lut[256];
    static bool init = false;
    if (!init) {
        std::memset(lut, 0, sizeof(lut));
        lut['A'] = 0; lut['a'] = 0;
        lut['C'] = 1; lut['c'] = 1;
        lut['G'] = 2; lut['g'] = 2;
        lut['T'] = 3; lut['t'] = 3;
        init = true;
    }
    for (int64_t i = 0; i < n; ++i) out[i] = lut[in[i]];
}

// ---------------------------------------------------------------------------
// FASTQ record scan: finds (seq_offset, seq_len) per record in a text buffer.
// Returns the number of records, or -1 on a malformed record (missing '@'
// header / '+' separator / truncated quality line) — the caller raises the
// reference-compatible "Unable to read sequence" error.
// ---------------------------------------------------------------------------
static inline int64_t next_line(const uint8_t* buf, int64_t n, int64_t pos,
                                int64_t* start, int64_t* len) {
    if (pos >= n) return -1;
    int64_t s = pos;
    while (pos < n && buf[pos] != '\n') ++pos;
    int64_t e = pos;
    while (e > s && (buf[e - 1] == '\r' || buf[e - 1] == ' ')) --e;
    *start = s;
    *len = e - s;
    return pos < n ? pos + 1 : n;
}

int64_t nimble_fastq_scan(const uint8_t* buf, int64_t n,
                          int64_t* seq_offsets, int64_t* seq_lens,
                          int64_t max_records) {
    int64_t pos = 0, count = 0;
    while (pos < n && count < max_records) {
        int64_t hs, hl;
        pos = next_line(buf, n, pos, &hs, &hl);
        if (pos < 0) break;
        if (hl == 0) continue;  // blank line tolerance
        if (buf[hs] != '@') return -1;
        int64_t ss, sl;
        pos = next_line(buf, n, pos, &ss, &sl);
        if (pos < 0) return -1;
        int64_t ps, plen;
        pos = next_line(buf, n, pos, &ps, &plen);
        if (pos < 0 || plen == 0 || buf[ps] != '+') return -1;
        int64_t qs, ql;
        pos = next_line(buf, n, pos, &qs, &ql);
        if (pos < 0) return -1;
        seq_offsets[count] = ss;
        seq_lens[count] = sl;
        ++count;
    }
    return count;
}

// ---------------------------------------------------------------------------
// k-mer key extraction: packed 2-bit base-major keys, one per position.
// ---------------------------------------------------------------------------
void nimble_extract_kmer_keys(const int8_t* codes, int64_t n, int32_t k,
                              uint64_t* keys_out) {
    if (n < k) return;
    const uint64_t mask = (k >= 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
    uint64_t key = 0;
    for (int64_t i = 0; i < k; ++i) key = (key << 2) | (uint64_t)codes[i];
    keys_out[0] = key & mask;
    for (int64_t i = k; i < n; ++i) {
        key = ((key << 2) | (uint64_t)codes[i]) & mask;
        keys_out[i - k + 1] = key;
    }
}

// ---------------------------------------------------------------------------
// open-addressing hash table build (matches ops/device_index.py exactly)
// ---------------------------------------------------------------------------
static inline uint32_t fmix32(uint32_t x) {
    x ^= x >> 16;
    x *= 0x85EBCA6Bu;
    x ^= x >> 13;
    x *= 0xC2B2AE35u;
    x ^= x >> 16;
    return x;
}

int32_t nimble_build_hash_table(
    const uint64_t* keys, const int32_t* starts, const int32_t* counts,
    int64_t n_keys,
    uint32_t* table_key_lo, uint32_t* table_key_hi,
    int32_t* table_start, int32_t* table_count,
    int64_t table_size) {
    const int64_t mask = table_size - 1;
    int32_t max_probe = 1;
    // caller pre-fills table_key_lo/hi with the 0xFFFFFFFF sentinel
    for (int64_t i = 0; i < n_keys; ++i) {
        uint32_t lo = (uint32_t)(keys[i] & 0x3FFFFFFFULL);
        uint32_t hi = (uint32_t)((keys[i] >> 30) & 0x3FFFFFFFULL);
        int64_t slot = (int64_t)(fmix32(lo ^ fmix32(hi))) & mask;
        int32_t probe = 1;
        while (table_key_lo[slot] != 0xFFFFFFFFu || table_key_hi[slot] != 0xFFFFFFFFu) {
            slot = (slot + 1) & mask;
            ++probe;
        }
        table_key_lo[slot] = lo;
        table_key_hi[slot] = hi;
        table_start[slot] = starts[i];
        table_count[slot] = counts[i];
        if (probe > max_probe) max_probe = probe;
    }
    return max_probe;
}

// ---------------------------------------------------------------------------
// global read-pair dedupe set (the score map is keyed by read strings,
// `src/align.rs:574-579`; duplicates count once).  Keys are exact-length
// byte strings; the handle owns an arena-backed hash set that persists
// across chunks for streaming runs.
// ---------------------------------------------------------------------------
// ---------------------------------------------------------------------------
// BAM record batch scan: parses a decompressed BAM record stream into flat
// arrays (the role htslib's C decoder plays for the reference).  Returns the
// number of complete records parsed; *consumed gets the bytes consumed so a
// streaming caller can carry partial trailing records into the next chunk.
// Z-type aux tags are extracted into a compact blob per record
// ([tag 2B][len u16][bytes]); other aux types are skipped (every consumer in
// the pipeline filters for Z — htslib semantics are preserved).
// ---------------------------------------------------------------------------
static const char kSeqDecode[17] = "=ACMGRSVTWYHKDBN";

int64_t nimble_bam_scan(
    const uint8_t* buf, int64_t n, int64_t max_records,
    int32_t* fixed,          // (max_records, 8): flag,tid,pos,mapq,mtid,mpos,tlen,l_seq
    int64_t* qname_off, uint8_t* qname_flat,
    int64_t* seq_off, uint8_t* seq_flat,
    int64_t* qual_off, uint8_t* qual_flat,
    int64_t* aux_off, uint8_t* aux_flat,
    int64_t* cigar_off, uint32_t* cigar_flat,
    int64_t* consumed) {
    int64_t pos = 0, count = 0;
    int64_t qn = 0, sq = 0, ql = 0, ax = 0, cg = 0;
    qname_off[0] = seq_off[0] = qual_off[0] = aux_off[0] = cigar_off[0] = 0;
    while (count < max_records) {
        if (pos + 4 > n) break;
        int32_t block_size;
        std::memcpy(&block_size, buf + pos, 4);
        if (block_size <= 0 || pos + 4 + block_size > n) break;
        const uint8_t* r = buf + pos + 4;
        int32_t tid, rpos, l_seq, mtid, mpos, tlen;
        std::memcpy(&tid, r + 0, 4);
        std::memcpy(&rpos, r + 4, 4);
        uint8_t l_read_name = r[8];
        uint8_t mapq = r[9];
        uint16_t n_cigar, flag;
        std::memcpy(&n_cigar, r + 12, 2);
        std::memcpy(&flag, r + 14, 2);
        std::memcpy(&l_seq, r + 16, 4);
        std::memcpy(&mtid, r + 20, 4);
        std::memcpy(&mpos, r + 24, 4);
        std::memcpy(&tlen, r + 28, 4);

        int32_t* f = fixed + count * 8;
        f[0] = flag; f[1] = tid; f[2] = rpos; f[3] = mapq;
        f[4] = mtid; f[5] = mpos; f[6] = tlen; f[7] = l_seq;

        int64_t off = 32;
        // qname (drop trailing NUL)
        std::memcpy(qname_flat + qn, r + off, l_read_name - 1);
        qn += l_read_name - 1;
        off += l_read_name;
        std::memcpy(cigar_flat + cg, r + off, 4LL * n_cigar);
        cg += n_cigar;
        off += 4LL * n_cigar;
        // seq: unpack 4-bit codes to ASCII
        const uint8_t* sp = r + off;
        for (int32_t i = 0; i < l_seq; ++i) {
            uint8_t b = sp[i >> 1];
            seq_flat[sq + i] = kSeqDecode[(i & 1) ? (b & 0xF) : (b >> 4)];
        }
        sq += l_seq;
        off += (l_seq + 1) / 2;
        // qual (raw values)
        std::memcpy(qual_flat + ql, r + off, l_seq);
        ql += l_seq;
        off += l_seq;
        // aux: extract Z tags into [tag2][u16 len][bytes] entries
        while (off + 3 <= block_size) {
            uint8_t t0 = r[off], t1 = r[off + 1];
            char typ = (char)r[off + 2];
            off += 3;
            if (typ == 'Z' || typ == 'H') {
                int64_t s = off;
                while (off < block_size && r[off] != 0) ++off;
                int64_t len = off - s;
                aux_flat[ax] = t0; aux_flat[ax + 1] = t1;
                uint16_t l16 = (uint16_t)(len > 65535 ? 65535 : len);
                std::memcpy(aux_flat + ax + 2, &l16, 2);
                std::memcpy(aux_flat + ax + 4, r + s, l16);
                ax += 4 + l16;
                ++off;  // NUL
            } else if (typ == 'A' || typ == 'c' || typ == 'C') {
                off += 1;
            } else if (typ == 's' || typ == 'S') {
                off += 2;
            } else if (typ == 'i' || typ == 'I' || typ == 'f') {
                off += 4;
            } else if (typ == 'B') {
                if (off + 5 > block_size) break;
                char sub = (char)r[off];
                int32_t cnt32;
                std::memcpy(&cnt32, r + off + 1, 4);
                int64_t esz = (sub == 'c' || sub == 'C') ? 1
                             : (sub == 's' || sub == 'S') ? 2 : 4;
                off += 5 + esz * cnt32;
            } else {
                break;  // unknown type
            }
        }

        ++count;
        qname_off[count] = qn;
        seq_off[count] = sq;
        qual_off[count] = ql;
        aux_off[count] = ax;
        cigar_off[count] = cg;
        pos += 4 + block_size;
    }
    *consumed = pos;
    return count;
}

void* nimble_dedupe_new() { return new DedupSet(); }

void nimble_dedupe_free(void* handle) { delete static_cast<DedupSet*>(handle); }

int64_t nimble_dedupe_size(void* handle) {
    return (int64_t)static_cast<DedupSet*>(handle)->seen.size();
}

// r1/r2 are the flattened exact-length read bytes; offsets have n+1 entries.
// r2 may be null (single-end).  out_is_new[i]=1 iff the pair was unseen.
// Returns the number of new pairs.
int64_t nimble_dedupe_insert(
    void* handle,
    const int8_t* r1, const int64_t* off1,
    const int8_t* r2, const int64_t* off2,
    int64_t n, uint8_t* out_is_new) {
    auto& seen = static_cast<DedupSet*>(handle)->seen;
    int64_t n_new = 0;
    std::string key;
    for (int64_t i = 0; i < n; ++i) {
        key.clear();
        key.append(reinterpret_cast<const char*>(r1 + off1[i]),
                   (size_t)(off1[i + 1] - off1[i]));
        if (r2 != nullptr) {
            key.push_back('\xff');
            key.append(reinterpret_cast<const char*>(r2 + off2[i]),
                       (size_t)(off2[i + 1] - off2[i]));
        }
        bool inserted = seen.insert(key).second;
        out_is_new[i] = inserted ? 1 : 0;
        n_new += inserted;
    }
    return n_new;
}

}  // extern "C"
