// Native parallel .npz corpus loader.
//
// The reference reopens every .npz per __getitem__ on a single thread
// (train_model_official.py:133-135,391-400). This loader replaces that hot
// path: a thread pool walks the clip list, parses each ZIP container,
// inflates the X / roi / ts entries with zlib, parses the .npy headers, and
// writes directly into caller-provided padded (N, max_t, ...) arrays — the
// exact layout the device dataset wants, with zero Python-side copies.
//
// Format notes: np.savez_compressed writes a ZIP with one "<name>.npy" entry
// per array, DEFLATE (method 8) or stored (method 0). NPY v1/v2 headers are
// a Python dict literal: {'descr': '<f4', 'fortran_order': False,
// 'shape': (T, D), }.

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Entry {
    std::string name;
    uint64_t comp_size = 0;
    uint64_t raw_size = 0;
    uint16_t method = 0;
    uint32_t crc = 0;          // central-directory CRC-32 of the raw data
    uint64_t data_offset = 0;  // absolute offset of file data
};

struct Npy {
    char dtype = 0;      // 'f' float, 'u' uint, 'i' int
    int itemsize = 0;
    std::vector<uint64_t> shape;
    const uint8_t* data = nullptr;
    std::vector<uint8_t> owned;  // backing store after inflate
};

uint16_t rd16(const uint8_t* p) { return (uint16_t)(p[0] | (p[1] << 8)); }
uint32_t rd32(const uint8_t* p) {
    return (uint32_t)(p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24));
}

bool read_file(const char* path, std::vector<uint8_t>& out) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    if (sz < 0) {
        fclose(f);
        return false;
    }
    fseek(f, 0, SEEK_SET);
    out.resize((size_t)sz);
    bool ok = fread(out.data(), 1, (size_t)sz, f) == (size_t)sz;
    fclose(f);
    return ok;
}

// Parse the ZIP central directory into entries.
// Returns 0 on success, 1 on a corrupt container, 2 on a zip64 archive
// (64-bit sizes/offsets — written by numpy for >4 GB archives; explicitly
// rejected rather than silently misread, the caller falls back to Python).
int parse_zip(const std::vector<uint8_t>& buf, std::vector<Entry>& entries) {
    if (buf.size() < 22) return 1;
    // find End Of Central Directory record (scan back over possible comment)
    size_t eocd = std::string::npos;
    size_t lo = buf.size() >= (22 + 65535) ? buf.size() - 22 - 65535 : 0;
    for (size_t i = buf.size() - 22 + 1; i-- > lo;) {
        if (rd32(&buf[i]) == 0x06054b50) { eocd = i; break; }
    }
    if (eocd == std::string::npos) return 1;
    uint16_t n = rd16(&buf[eocd + 10]);
    uint32_t cd_off = rd32(&buf[eocd + 16]);
    // zip64: sentinel EOCD fields, or a zip64-EOCD-locator just before EOCD
    if (n == 0xFFFF || cd_off == 0xFFFFFFFFu) return 2;
    if (eocd >= 20 && rd32(&buf[eocd - 20]) == 0x07064b50) return 2;
    size_t p = cd_off;
    for (uint16_t k = 0; k < n; k++) {
        if (p + 46 > buf.size() || rd32(&buf[p]) != 0x02014b50) return 1;
        Entry e;
        e.method = rd16(&buf[p + 10]);
        e.crc = rd32(&buf[p + 16]);
        e.comp_size = rd32(&buf[p + 20]);
        e.raw_size = rd32(&buf[p + 24]);
        uint16_t name_len = rd16(&buf[p + 28]);
        uint16_t extra_len = rd16(&buf[p + 30]);
        uint16_t cmt_len = rd16(&buf[p + 32]);
        uint32_t lho = rd32(&buf[p + 42]);
        if (e.comp_size == 0xFFFFFFFFu || e.raw_size == 0xFFFFFFFFu ||
            lho == 0xFFFFFFFFu)
            return 2;  // per-entry zip64 sentinels
        if (p + 46 + (size_t)name_len > buf.size()) return 1;
        e.name.assign((const char*)&buf[p + 46], name_len);
        // local header gives the actual data offset
        if ((size_t)lho + 30 > buf.size() || rd32(&buf[lho]) != 0x04034b50)
            return 1;
        uint16_t lname = rd16(&buf[lho + 26]);
        uint16_t lextra = rd16(&buf[lho + 28]);
        e.data_offset = (uint64_t)lho + 30 + lname + lextra;
        // the entry's data must lie inside the file (corrupt/truncated
        // containers must fail parse, not read out of bounds)
        uint64_t span = e.method == 0 ? e.raw_size : e.comp_size;
        if (e.data_offset > buf.size() || span > buf.size() - e.data_offset)
            return 1;
        // decompression-bomb guard: a clip array is bounded in practice
        if (e.raw_size > (1ull << 31)) return 1;
        entries.push_back(std::move(e));
        p += 46 + (size_t)name_len + extra_len + cmt_len;
    }
    return 0;
}

bool inflate_raw(const uint8_t* src, size_t src_len, uint8_t* dst,
                 size_t dst_len) {
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) return false;  // raw deflate
    zs.next_in = const_cast<uint8_t*>(src);
    zs.avail_in = (uInt)src_len;
    zs.next_out = dst;
    zs.avail_out = (uInt)dst_len;
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    return rc == Z_STREAM_END && zs.total_out == dst_len;
}

// Parse result codes shared by parse_npy / load_found_entry: the caller
// must distinguish a CORRUPT member (error) from a VALID one this parser
// merely declines (big-endian, fortran order, exotic compression — numpy
// reads those fine, so the Python fallback must get a chance).
enum ParseRc { kOk = 0, kCorrupt = 1, kDeclined = 2 };

int parse_npy(std::vector<uint8_t>&& blob, Npy& out) {
    if (blob.size() < 12 || std::memcmp(blob.data(), "\x93NUMPY", 6) != 0)
        return kCorrupt;
    uint8_t major = blob[6];
    size_t hlen, hoff;
    if (major == 1) {
        hlen = rd16(&blob[8]);
        hoff = 10;
    } else {
        hlen = rd32(&blob[8]);
        hoff = 12;
    }
    if (hlen > blob.size() || hoff > blob.size() - hlen) return kCorrupt;
    std::string hdr((const char*)&blob[hoff], hlen);
    // descr — every find() is npos-guarded: an exception thrown through the
    // extern "C" ctypes boundary would abort the process
    size_t dp = hdr.find("'descr'");
    if (dp == std::string::npos) return kCorrupt;
    size_t q1 = hdr.find('\'', dp + 7);
    if (q1 == std::string::npos) return kCorrupt;
    size_t q2 = hdr.find('\'', q1 + 1);
    if (q2 == std::string::npos) return kCorrupt;
    std::string descr = hdr.substr(q1 + 1, q2 - q1 - 1);
    if (descr.size() < 2) return kCorrupt;
    size_t ti = (descr[0] == '<' || descr[0] == '|' || descr[0] == '>') ? 1 : 0;
    if (descr[0] == '>') return kDeclined;  // big-endian: numpy reads it fine
    out.dtype = descr[ti];
    out.itemsize = std::atoi(descr.c_str() + ti + 1);
    if (out.itemsize <= 0 || out.itemsize > 16) return kCorrupt;
    if (hdr.find("'fortran_order': True") != std::string::npos)
        return kDeclined;  // valid npy, just not C-order
    // shape
    size_t sp = hdr.find("'shape':");
    if (sp == std::string::npos) return kCorrupt;
    size_t po = hdr.find('(', sp);
    if (po == std::string::npos) return kCorrupt;
    size_t pc = hdr.find(')', po);
    if (pc == std::string::npos) return kCorrupt;
    std::string shp = hdr.substr(po + 1, pc - po - 1);
    out.shape.clear();
    const char* s = shp.c_str();
    while (*s) {
        while (*s == ' ' || *s == ',') s++;
        if (!*s) break;
        out.shape.push_back(strtoull(s, (char**)&s, 10));
    }
    // the payload must actually hold shape-product items: a header that
    // declares more data than exists would turn every downstream memcpy
    // into an out-of-bounds read
    const uint64_t kMaxCount = 1ull << 33;
    uint64_t count = 1;
    for (uint64_t dim : out.shape) {
        if (dim >= (1ull << 32)) return kCorrupt;
        // overflow-safe product bound: check via division BEFORE multiplying
        if (dim != 0 && count > kMaxCount / dim) return kCorrupt;
        count *= dim;
    }
    uint64_t payload = blob.size() - hoff - hlen;
    if (count > payload / (uint64_t)out.itemsize) return kCorrupt;
    out.owned = std::move(blob);
    out.data = out.owned.data() + hoff + hlen;
    return kOk;
}

const Entry* find_entry(const std::vector<Entry>& es, const char* want) {
    for (const auto& e : es)
        if (e.name == want) return &e;
    return nullptr;
}

// Decompress + parse one located entry. Distinct from find_entry so the
// caller can tell "member absent" (valid for roi.npy) from "member present
// but corrupt" (must be an error, never silently treated as absent).
int load_found_entry(const std::vector<uint8_t>& zip, const Entry& e,
                     Npy& out) {
    std::vector<uint8_t> blob;
    if (e.method == 0) {
        blob.assign(zip.begin() + e.data_offset,
                    zip.begin() + e.data_offset + e.raw_size);
    } else if (e.method == 8) {
        blob.resize(e.raw_size);
        if (!inflate_raw(zip.data() + e.data_offset, e.comp_size,
                         blob.data(), e.raw_size))
            return kCorrupt;
    } else {
        return kDeclined;  // exotic compression method: numpy may read it
    }
    // CRC-32 check, matching Python zipfile semantics (BadZipFile on
    // mismatch): without it a bit-flipped STORED payload would load as
    // silent garbage here while the Python fallback raises — a
    // native-vs-Python divergence (round-4 fuzz finding). Measured cost:
    // 2.4% on a 500-clip ROI corpus (A/B, 1-core host)
    if ((uint32_t)crc32(crc32(0L, Z_NULL, 0), blob.data(),
                        (uInt)blob.size()) != e.crc)
        return kCorrupt;
    return parse_npy(std::move(blob), out);
}

// convert a (T, D)-ish source into float32 rows; false = dtype outside the
// supported set {f4,f8,i4,i8,u1} — the CALLER must surface that as an error,
// never as silently-zero features (the Python fallback would load e.g. a
// float16 corpus correctly, so a silent skip here would be a native-vs-Python
// numeric divergence)
bool copy_as_f32(const Npy& a, float* dst, uint64_t rows, uint64_t cols) {
    uint64_t n = rows * cols;
    if (a.dtype == 'f' && a.itemsize == 4) {
        std::memcpy(dst, a.data, n * 4);
    } else if (a.dtype == 'f' && a.itemsize == 8) {
        const double* s = (const double*)a.data;
        for (uint64_t i = 0; i < n; i++) dst[i] = (float)s[i];
    } else if (a.dtype == 'i' && a.itemsize == 8) {
        const int64_t* s = (const int64_t*)a.data;
        for (uint64_t i = 0; i < n; i++) dst[i] = (float)s[i];
    } else if (a.dtype == 'i' && a.itemsize == 4) {
        const int32_t* s = (const int32_t*)a.data;
        for (uint64_t i = 0; i < n; i++) dst[i] = (float)s[i];
    } else if (a.dtype == 'u' && a.itemsize == 1) {
        const uint8_t* s = a.data;
        for (uint64_t i = 0; i < n; i++) dst[i] = (float)s[i];
    } else {
        return false;
    }
    return true;
}

}  // namespace

extern "C" {

// Load one clip's X (+ optional roi) into padded slices.
// Returns length (frames used) >= 0, or a negative error code:
//   -1 unreadable file        -2 corrupt zip container
//   -3 missing/corrupt X.npy  -4 X has wrong rank
//   -5 roi corrupt or shape/dtype wrong
//   -6 zip64 archive (unsupported)
//   -7 member is a VALID npy the native path declines (dtype outside
//      {f4,f8,i4,i8,u1}, big-endian, fortran order, exotic compression) —
//      the caller must fall back to Python rather than train on
//      silently-zero rows or report a misleading "corrupt"
// (mirrored by NATIVE_ERROR_NAMES in data/native_loader.py)
int64_t npz_load_clip(const char* path, int64_t max_t, int64_t d,
                      float* X_out,               // (max_t, d), pre-zeroed
                      int64_t roi_h, int64_t roi_w,
                      uint8_t* roi_out,           // (max_t, h, w) or null
                      int32_t* has_roi_out) {
    std::vector<uint8_t> zip;
    if (!read_file(path, zip)) return -1;
    std::vector<Entry> es;
    int zrc = parse_zip(zip, es);
    if (zrc == 2) return -6;  // zip64 unsupported
    if (zrc != 0) return -2;
    Npy X;
    const Entry* xe = find_entry(es, "X.npy");
    if (xe == nullptr) return -3;
    int xrc = load_found_entry(zip, *xe, X);
    if (xrc == kDeclined) return -7;  // valid npy (big-endian/fortran/exotic
                                      // compression): numpy fallback reads it
    if (xrc != kOk) return -3;
    if (X.shape.size() != 2) return -4;
    int64_t T = (int64_t)X.shape[0];
    int64_t D = (int64_t)X.shape[1];
    int64_t use_d = D < d ? D : d;  // fix_dim: truncate/zero-pad columns
    int64_t use_t = T < max_t ? T : max_t;

    bool has_roi = false;
    Npy R;
    const Entry* re = roi_out ? find_entry(es, "roi.npy") : nullptr;
    if (re != nullptr) {
        // roi.npy is PRESENT: a failure to decode it is an error, never
        // "no roi" — the Python fallback raises on the same file, and a
        // clip silently training on all-zero ROI frames would be a
        // native-vs-Python divergence. A valid-but-declined member (e.g.
        // fortran order) routes to the numpy fallback like X does.
        int rrc = load_found_entry(zip, *re, R);
        if (rrc == kDeclined) return -7;
        if (rrc != kOk) return -5;
        if (R.shape.size() != 3 || (int64_t)R.shape[1] != roi_h ||
            (int64_t)R.shape[2] != roi_w || R.dtype != 'u' || R.itemsize != 1)
            return -5;
        has_roi = true;
        int64_t Tr = (int64_t)R.shape[0];
        // conservative X/roi alignment (train_model_official.py:159-169)
        if (Tr < use_t) use_t = Tr;
        std::memcpy(roi_out, R.data, (size_t)(use_t * roi_h * roi_w));
    }
    if (has_roi_out) *has_roi_out = has_roi ? 1 : 0;

    if (X.dtype == 'f' && X.itemsize == 4 && use_d == D) {
        for (int64_t t = 0; t < use_t; t++)
            std::memcpy(X_out + t * d, X.data + (size_t)t * D * 4,
                        (size_t)use_d * 4);
    } else {
        std::vector<float> row(D);
        for (int64_t t = 0; t < use_t; t++) {
            Npy rowview = {X.dtype, X.itemsize, {}, X.data + (size_t)t * D * X.itemsize, {}};
            if (!copy_as_f32(rowview, row.data(), 1, (uint64_t)D)) return -7;
            std::memcpy(X_out + t * d, row.data(), (size_t)use_d * 4);
        }
    }
    return use_t;
}

// Parallel corpus load. lengths_out[i] < 0 encodes that file's error code.
// Returns the number of failed files.
int64_t npz_corpus_load(const char** paths, int64_t n, int64_t max_t,
                        int64_t d, float* X_out, int64_t roi_h, int64_t roi_w,
                        uint8_t* roi_out, int32_t* lengths_out,
                        int32_t* has_roi_out, int64_t n_threads) {
    if (n_threads <= 0) n_threads = (int64_t)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    std::atomic<int64_t> next(0), failed(0);
    auto worker = [&]() {
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= n) return;
            float* Xp = X_out + (size_t)i * max_t * d;
            uint8_t* Rp = roi_out ? roi_out + (size_t)i * max_t * roi_h * roi_w
                                  : nullptr;
            int32_t hr = 0;
            int64_t rc = npz_load_clip(paths[i], max_t, d, Xp, roi_h, roi_w,
                                       Rp, &hr);
            lengths_out[i] = (int32_t)rc;
            if (has_roi_out) has_roi_out[i] = hr;
            if (rc < 0) failed.fetch_add(1);
        }
    };
    std::vector<std::thread> pool;
    for (int64_t k = 0; k < n_threads; k++) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    return failed.load();
}

}  // extern "C"
