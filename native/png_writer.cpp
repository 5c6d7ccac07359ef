// Parallel PNG writer — the TPU-native answer to the reference's PNG
// bottleneck (src/imwrite.cpp:14-79 tunes libpng to compression 0 +
// Z_HUFFMAN_ONLY because "The PNG writing is a huge bottleneck",
// README.md:127-128; it stays single-threaded).
//
// Scheme (pigz-style): scanlines are split into T row-chunks; each thread
// assembles its filtered rows (filter byte 0 per scanline) and raw-deflates
// them with a byte-aligned Z_FULL_FLUSH tail (the last chunk ends with
// Z_FINISH). The concatenation of the pieces is one valid deflate stream;
// a hand-built zlib header plus an adler32_combine() of the per-chunk
// checksums wraps it into the zlib format PNG requires. Each piece is
// emitted as its own IDAT chunk (consecutive IDATs concatenate per spec),
// so no post-compression stitching pass is needed.
//
// Exposed C ABI (ctypes bridge: volrend_tpu/utils/png.py):
//   int png_write(const char* path, const uint8_t* img,
//                 int h, int w, int c, int level, int n_threads);
// img is row-major (h, w, c) uint8, c in {1, 3, 4}. Returns 0 on success.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Piece {
    std::vector<uint8_t> out;   // compressed bytes
    uint32_t adler = 1;         // adler32 of this piece's raw bytes
    uint64_t raw_len = 0;
    int err = 0;
};

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back((x >> 24) & 0xff);
    v.push_back((x >> 16) & 0xff);
    v.push_back((x >> 8) & 0xff);
    v.push_back(x & 0xff);
}

void write_chunk(FILE* f, const char tag[4], const uint8_t* data,
                 size_t n) {
    uint8_t len[4] = {uint8_t(n >> 24), uint8_t(n >> 16), uint8_t(n >> 8),
                      uint8_t(n)};
    fwrite(len, 1, 4, f);
    fwrite(tag, 1, 4, f);
    if (n) fwrite(data, 1, n, f);
    uint32_t crc = crc32(0, reinterpret_cast<const Bytef*>(tag), 4);
    if (n) crc = crc32(crc, data, static_cast<uInt>(n));
    uint8_t cb[4] = {uint8_t(crc >> 24), uint8_t(crc >> 16),
                     uint8_t(crc >> 8), uint8_t(crc)};
    fwrite(cb, 1, 4, f);
}

void compress_rows(const uint8_t* img, int w, int c, int row0, int rows,
                   int level, bool last, Piece* p) {
    const size_t stride = size_t(w) * c;
    const size_t raw_len = rows * (stride + 1);
    std::vector<uint8_t> raw(raw_len);
    for (int r = 0; r < rows; ++r) {
        uint8_t* dst = raw.data() + size_t(r) * (stride + 1);
        dst[0] = 0;  // filter: None
        std::memcpy(dst + 1, img + size_t(row0 + r) * stride, stride);
    }
    p->raw_len = raw_len;
    p->adler = adler32(1, raw.data(), static_cast<uInt>(raw_len));

    z_stream s;
    std::memset(&s, 0, sizeof(s));
    // raw deflate (windowBits < 0): pieces concatenate into one stream.
    // level 1 takes the reference's speed stance (Z_HUFFMAN_ONLY,
    // src/imwrite.cpp:44-45); higher levels use full matching.
    if (deflateInit2(&s, level, Z_DEFLATED, -15, 8,
                     level <= 1 ? Z_HUFFMAN_ONLY
                                : Z_DEFAULT_STRATEGY) != Z_OK) {
        p->err = 1;
        return;
    }
    p->out.resize(deflateBound(&s, static_cast<uLong>(raw_len)) + 16);
    s.next_in = raw.data();
    s.avail_in = static_cast<uInt>(raw_len);
    s.next_out = p->out.data();
    s.avail_out = static_cast<uInt>(p->out.size());
    int rc = deflate(&s, last ? Z_FINISH : Z_FULL_FLUSH);
    if ((last && rc != Z_STREAM_END) || (!last && rc != Z_OK)) {
        p->err = 2;
        deflateEnd(&s);
        return;
    }
    p->out.resize(p->out.size() - s.avail_out);
    deflateEnd(&s);
}

}  // namespace

extern "C" int png_write(const char* path, const uint8_t* img,
                         int h, int w, int c, int level, int n_threads) {
    if (!path || !img || h <= 0 || w <= 0 ||
        (c != 1 && c != 3 && c != 4))
        return 10;
    if (level < 0) level = 0;
    if (level > 9) level = 9;
    if (n_threads < 1) n_threads = 1;
    // small images: threading overhead isn't worth it
    if (size_t(h) * w * c < (1u << 20)) n_threads = 1;
    if (n_threads > h) n_threads = h;

    std::vector<Piece> pieces(n_threads);
    std::vector<std::thread> ts;
    int base = h / n_threads, rem = h % n_threads;
    int row = 0;
    for (int t = 0; t < n_threads; ++t) {
        int rows = base + (t < rem ? 1 : 0);
        bool last = (t == n_threads - 1);
        ts.emplace_back(compress_rows, img, w, c, row, rows, level, last,
                        &pieces[t]);
        row += rows;
    }
    for (auto& th : ts) th.join();
    for (auto& p : pieces)
        if (p.err) return 20 + p.err;

    // combined zlib wrapper: header + pieces + adler32 of all raw bytes
    uint32_t adler = pieces[0].adler;
    for (int t = 1; t < n_threads; ++t)
        adler = static_cast<uint32_t>(adler32_combine(
            adler, pieces[t].adler,
            static_cast<z_off_t>(pieces[t].raw_len)));

    FILE* f = std::fopen(path, "wb");
    if (!f) return 30;
    static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n',
                                   0x1a, '\n'};
    fwrite(sig, 1, 8, f);
    std::vector<uint8_t> ihdr;
    put_be32(ihdr, static_cast<uint32_t>(w));
    put_be32(ihdr, static_cast<uint32_t>(h));
    ihdr.push_back(8);                                   // bit depth
    ihdr.push_back(c == 1 ? 0 : (c == 3 ? 2 : 6));       // color type
    ihdr.push_back(0);
    ihdr.push_back(0);
    ihdr.push_back(0);
    write_chunk(f, "IHDR", ihdr.data(), ihdr.size());

    for (int t = 0; t < n_threads; ++t) {
        std::vector<uint8_t> body;
        if (t == 0) {               // zlib header: 32K window, fastest FLG
            body.push_back(0x78);
            body.push_back(0x01);
        }
        body.insert(body.end(), pieces[t].out.begin(), pieces[t].out.end());
        if (t == n_threads - 1) put_be32(body, adler);
        write_chunk(f, "IDAT", body.data(), body.size());
    }
    write_chunk(f, "IEND", nullptr, 0);
    int rc = std::fclose(f);
    return rc ? 31 : 0;
}
