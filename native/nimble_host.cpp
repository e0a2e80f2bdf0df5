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
