// Native sequence reader: FASTA/FASTQ (plain or gzip) -> dna4 rank batches.
//
// Host-side hot path of the classify pipeline (the reference runs its
// parser in a dedicated C++ thread, GanonClassify.cpp:1220-1287; here the
// parser also 2-bit-encodes straight into the pinned numpy batch buffer
// that feeds the TPU). Exposed through a C ABI consumed via ctypes.
//
// Encoding: A=0 C=1 G=2 T=3, U->T, everything else -> A (dna4 semantics,
// see ganon_tpu/ops/minimizers.py).

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

struct Reader {
    gzFile gz = nullptr;          // zlib reads plain files transparently
    bool fastq = false;
    bool eof = false;
    std::string pending;          // lookahead line (fasta headers)
    bool has_pending = false;
    std::vector<char> buf;

    bool getline(std::string& out) {
        if (has_pending) {
            out = std::move(pending);
            has_pending = false;
            return true;
        }
        out.clear();
        char chunk[4096];
        for (;;) {
            if (gzgets(gz, chunk, sizeof(chunk)) == nullptr) {
                eof = true;
                return !out.empty();
            }
            size_t n = std::strlen(chunk);
            bool nl = n > 0 && chunk[n - 1] == '\n';
            if (nl) --n;
            if (n > 0 && chunk[n - 1] == '\r') --n;
            out.append(chunk, n);
            if (nl) return true;
        }
    }
};

uint8_t g_lut[256];

struct LutInit {
    LutInit() {
        std::memset(g_lut, 0, sizeof(g_lut));
        g_lut[(unsigned char)'C'] = g_lut[(unsigned char)'c'] = 1;
        g_lut[(unsigned char)'G'] = g_lut[(unsigned char)'g'] = 2;
        g_lut[(unsigned char)'T'] = g_lut[(unsigned char)'t'] = 3;
        g_lut[(unsigned char)'U'] = g_lut[(unsigned char)'u'] = 3;
    }
} g_lut_init;

void encode_into(const std::string& seq, uint8_t* row, int64_t max_len) {
    const int64_t n = std::min<int64_t>(seq.size(), max_len);
    for (int64_t i = 0; i < n; ++i)
        row[i] = g_lut[(unsigned char)seq[i]];
}

} // namespace

extern "C" {

// Open a sequence file; returns a handle (nullptr on failure).
void* seqio_open(const char* path) {
    gzFile gz = gzopen(path, "rb");
    if (!gz) return nullptr;
    gzbuffer(gz, 1 << 20);
    auto* r = new Reader();
    r->gz = gz;
    // detect format from the first record char
    std::string first;
    if (!r->getline(first) || first.empty()) {
        gzclose(gz);
        delete r;
        return nullptr;
    }
    r->fastq = first[0] == '@';
    if (!r->fastq && first[0] != '>') {
        gzclose(gz);
        delete r;
        return nullptr;
    }
    r->pending = std::move(first);
    r->has_pending = true;
    return r;
}

void seqio_close(void* handle) {
    auto* r = static_cast<Reader*>(handle);
    if (r) {
        gzclose(r->gz);
        delete r;
    }
}

// Read up to max_reads records. Writes dna4 codes into codes[max_reads x
// max_len] (row-major, pre-zeroed by caller or overwritten here), true
// lengths into lengths[max_reads], and ids separated by '\n' into ids_buf
// (truncated if ids_cap reached). Returns number of records read, or -1
// on error.
int64_t seqio_next_batch(void* handle, int64_t max_reads, int64_t max_len,
                         uint8_t* codes, int32_t* lengths, char* ids_buf,
                         int64_t ids_cap) {
    auto* r = static_cast<Reader*>(handle);
    if (!r) return -1;
    int64_t count = 0;
    int64_t ids_len = 0;
    std::string line, header, seq;
    while (count < max_reads) {
        if (!r->getline(header)) break;
        if (header.empty()) continue;
        seq.clear();
        if (r->fastq) {
            if (!r->getline(seq)) break;
            r->getline(line);  // +
            r->getline(line);  // qual
        } else {
            // fasta: concatenate until next header / EOF
            for (;;) {
                if (!r->getline(line)) break;
                if (!line.empty() && line[0] == '>') {
                    r->pending = std::move(line);
                    r->has_pending = true;
                    break;
                }
                seq.append(line);
                if (r->eof) break;
            }
        }
        uint8_t* row = codes + count * max_len;
        std::memset(row, 0, max_len);
        encode_into(seq, row, max_len);
        lengths[count] = (int32_t)seq.size();
        // id: header without '>'/'@'
        const char* id = header.c_str() + 1;
        int64_t idn = (int64_t)header.size() - 1;
        if (ids_len + idn + 1 < ids_cap) {
            std::memcpy(ids_buf + ids_len, id, idn);
            ids_len += idn;
            ids_buf[ids_len++] = '\n';
        }
        ++count;
    }
    if (ids_len < ids_cap) ids_buf[ids_len] = '\0';
    return count;
}

} // extern "C"
