// Fast npz (zip-of-npy) loader for the TPU PlenOctree runtime.
//
// Replaces the role of the reference's vendored cnpy (3rdparty/cnpy) and the
// slow generic Python zipfile path: numpy's np.load on a 1.6 GB uncompressed
// tree archive costs ~70 s; this loader memory-maps the archive, parses the
// zip central directory, and copies/inflates members straight into
// caller-provided buffers (numpy arrays preallocated in Python), with a
// thread pool across members and chunked parallel memcpy for large STORED
// members. Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Zip subset supported: local headers + central directory, STORED (0) and
// DEFLATE (8) methods, zip64 extra fields for >4 GB archives.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <thread>
#include <atomic>
#include <zlib.h>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Member {
    std::string name;
    uint16_t method = 0;
    uint64_t comp_size = 0;
    uint64_t raw_size = 0;
    uint64_t header_off = 0;  // local header offset
    uint64_t data_off = 0;    // resolved payload offset
};

struct Archive {
    int fd = -1;
    const uint8_t* map = nullptr;
    uint64_t size = 0;
    std::vector<Member> members;
    std::string error;
};

uint16_t rd16(const uint8_t* p) { uint16_t v; memcpy(&v, p, 2); return v; }
uint32_t rd32(const uint8_t* p) { uint32_t v; memcpy(&v, p, 4); return v; }
uint64_t rd64(const uint8_t* p) { uint64_t v; memcpy(&v, p, 8); return v; }

bool parse_central_directory(Archive* a) {
    const uint8_t* m = a->map;
    const uint64_t n = a->size;
    // find EOCD (scan back over the comment area)
    const uint64_t max_scan = std::min<uint64_t>(n, 65557);
    uint64_t eocd = UINT64_MAX;
    for (uint64_t i = 22; i <= max_scan; ++i) {
        const uint8_t* p = m + n - i;
        if (rd32(p) == 0x06054b50) { eocd = n - i; break; }
    }
    if (eocd == UINT64_MAX) { a->error = "no EOCD"; return false; }
    uint64_t cd_count = rd16(m + eocd + 10);
    uint64_t cd_off = rd32(m + eocd + 16);
    // zip64?
    if (cd_count == 0xFFFF || cd_off == 0xFFFFFFFFu) {
        if (eocd < 20) { a->error = "bad zip64"; return false; }
        const uint8_t* loc = m + eocd - 20;
        if (rd32(loc) != 0x07064b50) { a->error = "no zip64 locator"; return false; }
        uint64_t z64 = rd64(loc + 8);
        if (z64 + 56 > n || rd32(m + z64) != 0x06064b50) {
            a->error = "bad zip64 EOCD"; return false;
        }
        cd_count = rd64(m + z64 + 32);
        cd_off = rd64(m + z64 + 48);
    }
    uint64_t p = cd_off;
    for (uint64_t i = 0; i < cd_count; ++i) {
        if (p + 46 > n || rd32(m + p) != 0x02014b50) {
            a->error = "bad central header"; return false;
        }
        Member e;
        e.method = rd16(m + p + 10);
        e.comp_size = rd32(m + p + 20);
        e.raw_size = rd32(m + p + 24);
        uint16_t name_len = rd16(m + p + 28);
        uint16_t extra_len = rd16(m + p + 30);
        uint16_t comment_len = rd16(m + p + 32);
        e.header_off = rd32(m + p + 42);
        e.name.assign((const char*)(m + p + 46), name_len);
        // zip64 extra
        const uint8_t* x = m + p + 46 + name_len;
        const uint8_t* xe = x + extra_len;
        while (x + 4 <= xe) {
            uint16_t id = rd16(x), sz = rd16(x + 2);
            const uint8_t* f = x + 4;
            if (id == 0x0001) {
                if (e.raw_size == 0xFFFFFFFFu) { e.raw_size = rd64(f); f += 8; }
                if (e.comp_size == 0xFFFFFFFFu) { e.comp_size = rd64(f); f += 8; }
                if (e.header_off == 0xFFFFFFFFu) { e.header_off = rd64(f); f += 8; }
            }
            x += 4 + sz;
        }
        // resolve payload offset from the local header
        const uint8_t* lh = m + e.header_off;
        if (e.header_off + 30 > n || rd32(lh) != 0x04034b50) {
            a->error = "bad local header"; return false;
        }
        uint16_t lh_name = rd16(lh + 26), lh_extra = rd16(lh + 28);
        e.data_off = e.header_off + 30 + lh_name + lh_extra;
        a->members.push_back(std::move(e));
        p += 46 + name_len + extra_len + comment_len;
    }
    return true;
}

void copy_parallel(uint8_t* dst, const uint8_t* src, uint64_t nbytes,
                   int n_threads) {
    if (nbytes < (8u << 20) || n_threads <= 1) {
        memcpy(dst, src, nbytes);
        return;
    }
    std::vector<std::thread> ts;
    uint64_t chunk = (nbytes + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        uint64_t off = (uint64_t)t * chunk;
        if (off >= nbytes) break;
        uint64_t len = std::min(chunk, nbytes - off);
        ts.emplace_back([=] { memcpy(dst + off, src + off, len); });
    }
    for (auto& t : ts) t.join();
}

int inflate_into(const uint8_t* src, uint64_t comp_size, uint8_t* dst,
                 uint64_t raw_size) {
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) return -1;  // raw deflate
    zs.next_in = const_cast<uint8_t*>(src);
    zs.avail_in = (uInt)std::min<uint64_t>(comp_size, UINT32_MAX);
    uint64_t in_used = zs.avail_in;
    zs.next_out = dst;
    zs.avail_out = (uInt)std::min<uint64_t>(raw_size, UINT32_MAX);
    uint64_t out_used = zs.avail_out;
    int ret;
    while ((ret = inflate(&zs, Z_NO_FLUSH)) == Z_OK || ret == Z_BUF_ERROR) {
        bool progress = false;
        if (zs.avail_in == 0 && in_used < comp_size) {
            uint64_t left = comp_size - in_used;
            zs.avail_in = (uInt)std::min<uint64_t>(left, UINT32_MAX);
            in_used += zs.avail_in;
            progress = true;
        }
        if (zs.avail_out == 0 && out_used < raw_size) {
            uint64_t left = raw_size - out_used;
            zs.avail_out = (uInt)std::min<uint64_t>(left, UINT32_MAX);
            out_used += zs.avail_out;
            progress = true;
        }
        if (ret == Z_BUF_ERROR && !progress) break;
    }
    inflateEnd(&zs);
    return (ret == Z_STREAM_END) ? 0 : -2;
}

}  // namespace

extern "C" {

void* npz_open(const char* path) {
    auto* a = new Archive();
    a->fd = open(path, O_RDONLY);
    if (a->fd < 0) { a->error = "open failed"; return a; }
    struct stat st;
    if (fstat(a->fd, &st) != 0) { a->error = "stat failed"; return a; }
    a->size = (uint64_t)st.st_size;
    a->map = (const uint8_t*)mmap(nullptr, a->size, PROT_READ, MAP_PRIVATE,
                                  a->fd, 0);
    if (a->map == MAP_FAILED) { a->map = nullptr; a->error = "mmap failed"; return a; }
    madvise((void*)a->map, a->size, MADV_SEQUENTIAL | MADV_WILLNEED);
    parse_central_directory(a);
    return a;
}

const char* npz_error(void* h) {
    auto* a = (Archive*)h;
    return a->error.empty() ? nullptr : a->error.c_str();
}

int npz_count(void* h) { return (int)((Archive*)h)->members.size(); }

const char* npz_name(void* h, int i) {
    return ((Archive*)h)->members[i].name.c_str();
}

// Returns the npy payload header (first `cap` bytes of the member) so Python
// can parse dtype/shape, plus sizes.
int npz_member_info(void* h, int i, uint64_t* raw_size, uint64_t* comp_size,
                    int* method, uint8_t* head, int cap) {
    auto* a = (Archive*)h;
    const Member& e = a->members[i];
    *raw_size = e.raw_size;
    *comp_size = e.comp_size;
    *method = e.method;
    int want = (int)std::min<uint64_t>((uint64_t)cap, e.raw_size);
    if (e.method == 0) {
        memcpy(head, a->map + e.data_off, want);
    } else {
        // inflate just the prefix
        z_stream zs;
        memset(&zs, 0, sizeof(zs));
        if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) return -1;
        zs.next_in = const_cast<uint8_t*>(a->map + e.data_off);
        zs.avail_in = (uInt)std::min<uint64_t>(e.comp_size, UINT32_MAX);
        zs.next_out = head;
        zs.avail_out = want;
        int ret = inflate(&zs, Z_NO_FLUSH);
        inflateEnd(&zs);
        if (ret != Z_OK && ret != Z_STREAM_END && ret != Z_BUF_ERROR)
            return -1;
    }
    return want;
}

// Copy/inflate the whole member payload into dst (raw_size bytes).
int npz_read(void* h, int i, uint8_t* dst, int n_threads) {
    auto* a = (Archive*)h;
    const Member& e = a->members[i];
    if (e.method == 0) {
        copy_parallel(dst, a->map + e.data_off, e.raw_size, n_threads);
        return 0;
    }
    if (e.method == 8) {
        return inflate_into(a->map + e.data_off, e.comp_size, dst,
                            e.raw_size);
    }
    return -3;
}

void npz_close(void* h) {
    auto* a = (Archive*)h;
    if (a->map) munmap((void*)a->map, a->size);
    if (a->fd >= 0) close(a->fd);
    delete a;
}

}  // extern "C"
