// Native host-side dataplane for cglgan_tpu.
//
// The reference has no native layer at all (its compute is libtorch, its
// "network" is queue.Queue — SURVEY.md §2); the XLA/Pallas path is this
// framework's device-side native layer.  What remains host-side and hot is
// dataset synthesis and shard construction, implemented here:
//
//   * synth_glyphs — the deterministic label-conditioned 28x28 glyph dataset
//     (the MNIST stand-in for zero-egress machines).  The numpy reference
//     implementation (cglgan_tpu/data/mnist.py) takes ~10s for 60k samples
//     on this host; this single-pass C++ version takes ~0.2s.
//   * build_shards — wrap-padded (num_workers, max_len, row) shard tensor
//     assembly from per-worker index lists.
//   * read_idx_u8 — standard IDX image/label file parser (uncompressed).
//
// Exposed over a plain C ABI, loaded from Python with ctypes
// (cglgan_tpu/data/native.py) — no pybind11 required.
//
// RNG: splitmix64 + xoshiro256++, seeded deterministically.  The native
// stream is deterministic per seed but distinct from the numpy backend's
// PCG64 stream; select a backend explicitly for bit-reproducibility.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>

namespace {

struct Xoshiro256 {
    uint64_t s[4];
    explicit Xoshiro256(uint64_t seed) {
        // splitmix64 to expand the seed
        uint64_t x = seed;
        for (int i = 0; i < 4; i++) {
            x += 0x9e3779b97f4a7c15ULL;
            uint64_t z = x;
            z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
            z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
            s[i] = z ^ (z >> 31);
        }
    }
    static inline uint64_t rotl(uint64_t v, int k) {
        return (v << k) | (v >> (64 - k));
    }
    inline uint64_t next() {
        uint64_t result = rotl(s[0] + s[3], 23) + s[0];
        uint64_t t = s[1] << 17;
        s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3];
        s[2] ^= t; s[3] = rotl(s[3], 45);
        return result;
    }
    inline double uniform() {   // [0, 1)
        return (next() >> 11) * (1.0 / 9007199254740992.0);
    }
    inline int64_t randint(int64_t lo, int64_t hi) {  // [lo, hi)
        return lo + (int64_t)(uniform() * (double)(hi - lo));
    }
    // Box-Muller
    bool have_spare = false;
    double spare = 0.0;
    inline double normal() {
        if (have_spare) { have_spare = false; return spare; }
        double u, v, sq;
        do {
            u = 2.0 * uniform() - 1.0;
            v = 2.0 * uniform() - 1.0;
            sq = u * u + v * v;
        } while (sq >= 1.0 || sq == 0.0);
        double mul = std::sqrt(-2.0 * std::log(sq) / sq);
        spare = v * mul;
        have_spare = true;
        return u * mul;
    }
};

// The 10 glyph templates — same formulas as data/mnist.py::_glyph_bank.
void glyph_bank(float* bank, int side, int num_class) {
    float cx = (side - 1) / 2.0f, cy = cx;
    for (int c = 0; c < num_class && c < 10; c++) {
        for (int y = 0; y < side; y++) {
            for (int x = 0; x < side; x++) {
                float dx = x - cx, dy = y - cy;
                float r = std::sqrt(dx * dx + dy * dy);
                float ang = std::atan2((float)(y - cy), (float)(x - cx));
                float v = 0.0f;
                switch (c) {
                    case 0: v = std::exp(-(r - 8.f) * (r - 8.f) / 6.f); break;
                    case 1: v = std::exp(-dx * dx / 5.f); break;
                    case 2: v = std::exp(-dy * dy / 5.f); break;
                    case 3: v = std::fmax(std::exp(-dx * dx / 5.f),
                                          std::exp(-dy * dy / 5.f)); break;
                    case 4: { float d = (float)(x - y);
                              v = std::exp(-d * d / 8.f); } break;
                    case 5: { float d = (float)(x + y) - 2.f * cx;
                              v = std::exp(-d * d / 8.f); } break;
                    case 6: v = std::exp(-(r - 4.f) * (r - 4.f) / 4.f)
                              + std::exp(-(r - 11.f) * (r - 11.f) / 4.f); break;
                    case 7: { float a = (x - 8.f) * (x - 8.f) + (y - 8.f) * (y - 8.f);
                              float b = (x - 20.f) * (x - 20.f) + (y - 20.f) * (y - 20.f);
                              v = std::exp(-a / 12.f) + std::exp(-b / 12.f); } break;
                    case 8: v = (std::cos(3.f * ang) * .5f + .5f)
                              * std::exp(-(r - 8.f) * (r - 8.f) / 16.f); break;
                    case 9: { float rr = r - 6.f - 3.f * std::sin(2.f * ang);
                              v = std::exp(-rr * rr / 6.f); } break;
                }
                if (v < 0.f) v = 0.f;
                if (v > 1.f) v = 1.f;
                bank[(size_t)c * side * side + (size_t)y * side + x] = v;
            }
        }
    }
}

}  // namespace

extern "C" {

// out: n*side*side uint8 (label-sorted); labels: n int64 (sorted ascending)
int synth_glyphs(uint8_t* out, int64_t* labels, int64_t n, int side,
                 int num_class, uint64_t seed) {
    if (num_class > 10 || num_class < 1 || side < 8) return -1;
    float* bank = new float[(size_t)num_class * side * side];
    glyph_bank(bank, side, num_class);
    Xoshiro256 rng(seed);

    // counts per class first so output can be written label-sorted in one pass
    int64_t* count = new int64_t[num_class]();
    int64_t* cls = new int64_t[n];
    for (int64_t i = 0; i < n; i++) {
        cls[i] = rng.randint(0, num_class);
        count[cls[i]]++;
    }
    int64_t* offset = new int64_t[num_class + 1];
    offset[0] = 0;
    for (int c = 0; c < num_class; c++) offset[c + 1] = offset[c] + count[c];
    int64_t* cursor = new int64_t[num_class];
    std::memcpy(cursor, offset, sizeof(int64_t) * num_class);

    const size_t px = (size_t)side * side;
    for (int64_t i = 0; i < n; i++) {
        int64_t c = cls[i];
        int64_t row = cursor[c]++;
        labels[row] = c;
        int dx = (int)rng.randint(-2, 3);
        int dy = (int)rng.randint(-2, 3);
        float gain = 0.75f + 0.25f * (float)rng.uniform();
        const float* g = bank + (size_t)c * px;
        uint8_t* o = out + (size_t)row * px;
        for (int y = 0; y < side; y++) {
            int sy = y - dy; sy %= side; if (sy < 0) sy += side;
            for (int x = 0; x < side; x++) {
                int sx = x - dx; sx %= side; if (sx < 0) sx += side;
                float v = g[(size_t)sy * side + sx] * gain
                        + 0.04f * (float)rng.normal();
                if (v < 0.f) v = 0.f;
                if (v > 1.f) v = 1.f;
                o[(size_t)y * side + x] = (uint8_t)(v * 255.0f);
            }
        }
    }
    delete[] bank; delete[] count; delete[] cls; delete[] offset;
    delete[] cursor;
    return 0;
}

// Wrap-padded shard tensor: out[(w, j)] = data[idx[off[w] + (j % len[w])]]
int build_shards(const uint8_t* data, int64_t row_bytes,
                 const int64_t* shard_idx, const int64_t* shard_off,
                 const int64_t* shard_len, int64_t num_workers,
                 int64_t max_len, uint8_t* out) {
    for (int64_t w = 0; w < num_workers; w++) {
        int64_t len = shard_len[w];
        if (len <= 0) {
            std::memset(out + (size_t)w * max_len * row_bytes, 0,
                        (size_t)max_len * row_bytes);
            continue;
        }
        const int64_t* idx = shard_idx + shard_off[w];
        uint8_t* dst = out + (size_t)w * max_len * row_bytes;
        for (int64_t j = 0; j < max_len; j++) {
            const uint8_t* src = data + (size_t)idx[j % len] * row_bytes;
            std::memcpy(dst + (size_t)j * row_bytes, src, (size_t)row_bytes);
        }
    }
    return 0;
}

// IDX parser (uncompressed).  Returns 0 on success; shape_out must hold 4.
int read_idx_u8(const char* path, uint8_t* out, int64_t cap,
                int64_t* shape_out, int* ndim_out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    unsigned char hdr[4];
    if (std::fread(hdr, 1, 4, f) != 4 || hdr[0] != 0 || hdr[1] != 0
        || hdr[2] != 0x08) { std::fclose(f); return -2; }
    int ndim = hdr[3];
    if (ndim > 4) { std::fclose(f); return -3; }
    int64_t total = 1;
    for (int d = 0; d < ndim; d++) {
        unsigned char b[4];
        if (std::fread(b, 1, 4, f) != 4) { std::fclose(f); return -4; }
        int64_t dim = ((int64_t)b[0] << 24) | ((int64_t)b[1] << 16)
                    | ((int64_t)b[2] << 8) | b[3];
        shape_out[d] = dim;
        total *= dim;
    }
    *ndim_out = ndim;
    if (out == nullptr) { std::fclose(f); return 0; }   // size query
    if (total > cap) { std::fclose(f); return -5; }
    size_t got = std::fread(out, 1, (size_t)total, f);
    std::fclose(f);
    return got == (size_t)total ? 0 : -6;
}

}  // extern "C"
