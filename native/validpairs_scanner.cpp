// Native validPairs stream scanner.
//
// The HiC-Pro allValidPairs file can be 10^8-10^9 lines; part3 needs only
// the pairs whose (scaffold1, scaffold4) key is in a small set of
// adjacent-scaffold keys (orientSmallScaffolds.py:159-177 streams this in
// Python).  This scanner does the same filter at native speed: mmap-free
// buffered reads, manual tab splitting, unordered_set membership, and a
// growing output buffer of matching records "s1\ts2\tpos1\tpos2\n".
//
// C ABI (ctypes):
//   scan_validpairs(path, keys, n_keys, &out, &out_len) -> 0 on success
//   free_buffer(out)
//
// "keys" is a newline-joined list of "scaffA\tscaffB" strings.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_set>
#include <vector>

namespace {

struct Out {
    char* data = nullptr;
    size_t len = 0;
    size_t cap = 0;

    void append(const char* s, size_t n) {
        if (len + n > cap) {
            cap = (cap ? cap * 2 : 1 << 20);
            while (cap < len + n) cap *= 2;
            data = static_cast<char*>(realloc(data, cap));
        }
        memcpy(data + len, s, n);
        len += n;
    }
};

// Find the next n-th tab-separated field; returns (ptr, len) pairs.
inline bool split_fields(const char* line, size_t line_len,
                         const char** f, size_t* flen, int upto) {
    int field = 0;
    const char* start = line;
    const char* end = line + line_len;
    const char* p = line;
    while (field < upto) {
        const char* tab = static_cast<const char*>(memchr(p, '\t', end - p));
        const char* stop = tab ? tab : end;
        f[field] = start;
        flen[field] = stop - start;
        ++field;
        if (!tab) break;
        p = tab + 1;
        start = p;
    }
    return field >= upto;
}

}  // namespace

extern "C" {

int scan_validpairs(const char* path, const char* keys, int64_t n_keys,
                    char** out_data, int64_t* out_len) {
    std::unordered_set<std::string> keyset;
    {
        const char* p = keys;
        for (int64_t i = 0; i < n_keys; ++i) {
            const char* nl = strchr(p, '\n');
            size_t n = nl ? static_cast<size_t>(nl - p) : strlen(p);
            keyset.emplace(p, n);
            if (!nl) break;
            p = nl + 1;
        }
    }

    FILE* fp = fopen(path, "rb");
    if (!fp) return 1;

    Out out;
    std::string key;
    key.reserve(256);
    std::vector<char> buf(1 << 22);
    std::string carry;
    const char* f[6];
    size_t flen[6];

    while (true) {
        size_t got = fread(buf.data(), 1, buf.size(), fp);
        if (got == 0) break;
        size_t begin = 0;
        for (size_t i = 0; i < got; ++i) {
            if (buf[i] != '\n') continue;
            const char* line;
            size_t line_len;
            if (!carry.empty()) {
                carry.append(buf.data() + begin, i - begin);
                line = carry.data();
                line_len = carry.size();
            } else {
                line = buf.data() + begin;
                line_len = i - begin;
            }
            if (line_len && line[line_len - 1] == '\r') --line_len;
            if (split_fields(line, line_len, f, flen, 6)) {
                key.assign(f[1], flen[1]);
                key.push_back('\t');
                key.append(f[4], flen[4]);
                if (keyset.count(key)) {
                    out.append(f[1], flen[1]);
                    out.append("\t", 1);
                    out.append(f[4], flen[4]);
                    out.append("\t", 1);
                    out.append(f[2], flen[2]);
                    out.append("\t", 1);
                    out.append(f[5], flen[5]);
                    out.append("\n", 1);
                }
            }
            carry.clear();
            begin = i + 1;
        }
        if (begin < got) carry.append(buf.data() + begin, got - begin);
    }
    fclose(fp);

    *out_data = out.data;
    *out_len = static_cast<int64_t>(out.len);
    return 0;
}

void free_buffer(char* p) { free(p); }

}  // extern "C"
