// depthio — native host-side data runtime for the TPU depth framework.
//
// The reference's data path is PIL/numpy inside forked DataLoader workers
// (src/dataset.py:27-70, src/main.py:622-646). This library replaces the
// per-sample Python decode with native code: a minimal PNG decoder (zlib
// inflate + scanline unfiltering), a .npy float32 reader, and a pthread pool
// that fills whole pinned batch buffers in parallel — the host side of the
// prefetching loader. Exposed through a C ABI consumed via ctypes
// (mde_tpu/data/native.py).
//
// Supported PNG subset (everything PIL emits for RGB photos): 8-bit depth,
// color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced.
// Output is always packed RGB8.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>
#include <thread>
#include <mutex>
#include <condition_variable>
#include <queue>
#include <functional>
#include <atomic>
#include <zlib.h>

namespace {

// ---------------------------------------------------------------------------
// IO helpers
// ---------------------------------------------------------------------------

bool read_file(const char* path, std::vector<uint8_t>& out) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (n < 0) { fclose(f); return false; }
    out.resize(static_cast<size_t>(n));
    size_t got = fread(out.data(), 1, out.size(), f);
    fclose(f);
    return got == out.size();
}

uint32_t be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) | p[3];
}

// ---------------------------------------------------------------------------
// PNG decoding
// ---------------------------------------------------------------------------

struct PngImage {
    uint32_t width = 0, height = 0;
    int channels = 0;       // channels in the file
    std::vector<uint8_t> rgb;  // packed RGB8 output
};

int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

// returns 0 on success, negative error code otherwise
int decode_png(const uint8_t* data, size_t size, PngImage& img) {
    static const uint8_t SIG[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (size < 8 || memcmp(data, SIG, 8) != 0) return -1;

    size_t pos = 8;
    uint32_t width = 0, height = 0;
    int bit_depth = 0, color_type = -1, interlace = 0;
    std::vector<uint8_t> idat;

    while (pos + 8 <= size) {
        uint32_t len = be32(data + pos);
        const uint8_t* type = data + pos + 4;
        const uint8_t* body = data + pos + 8;
        if (pos + 12 + len > size) return -2;
        if (memcmp(type, "IHDR", 4) == 0) {
            if (len < 13) return -3;
            width = be32(body);
            height = be32(body + 4);
            bit_depth = body[8];
            color_type = body[9];
            interlace = body[12];
        } else if (memcmp(type, "IDAT", 4) == 0) {
            idat.insert(idat.end(), body, body + len);
        } else if (memcmp(type, "IEND", 4) == 0) {
            break;
        }
        pos += 12 + len;
    }
    if (width == 0 || height == 0 || idat.empty()) return -4;
    if (bit_depth != 8 || interlace != 0) return -5;  // subset: 8-bit, no Adam7

    int channels;
    switch (color_type) {
        case 0: channels = 1; break;  // gray
        case 2: channels = 3; break;  // RGB
        case 4: channels = 2; break;  // gray+alpha
        case 6: channels = 4; break;  // RGBA
        default: return -6;           // palette unsupported
    }

    const size_t stride = size_t(width) * channels;
    std::vector<uint8_t> raw(height * (stride + 1));
    uLongf raw_len = raw.size();
    if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
        raw_len != raw.size()) {
        return -7;
    }

    // Unfilter scanlines in place into `pixels`.
    std::vector<uint8_t> pixels(height * stride);
    const int bpp = channels;  // bytes per pixel at 8-bit depth
    for (uint32_t y = 0; y < height; ++y) {
        const uint8_t filter = raw[y * (stride + 1)];
        const uint8_t* src = raw.data() + y * (stride + 1) + 1;
        uint8_t* cur = pixels.data() + y * stride;
        const uint8_t* up = y > 0 ? pixels.data() + (y - 1) * stride : nullptr;
        switch (filter) {
            case 0:
                memcpy(cur, src, stride);
                break;
            case 1:  // Sub
                for (size_t x = 0; x < stride; ++x)
                    cur[x] = uint8_t(src[x] + (x >= size_t(bpp) ? cur[x - bpp] : 0));
                break;
            case 2:  // Up
                for (size_t x = 0; x < stride; ++x)
                    cur[x] = uint8_t(src[x] + (up ? up[x] : 0));
                break;
            case 3:  // Average
                for (size_t x = 0; x < stride; ++x) {
                    int a = x >= size_t(bpp) ? cur[x - bpp] : 0;
                    int b = up ? up[x] : 0;
                    cur[x] = uint8_t(src[x] + ((a + b) >> 1));
                }
                break;
            case 4:  // Paeth
                for (size_t x = 0; x < stride; ++x) {
                    int a = x >= size_t(bpp) ? cur[x - bpp] : 0;
                    int b = up ? up[x] : 0;
                    int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
                    cur[x] = uint8_t(src[x] + paeth(a, b, c));
                }
                break;
            default:
                return -8;
        }
    }

    // Convert to packed RGB8.
    img.width = width;
    img.height = height;
    img.channels = channels;
    img.rgb.resize(size_t(width) * height * 3);
    const uint8_t* p = pixels.data();
    uint8_t* o = img.rgb.data();
    const size_t n = size_t(width) * height;
    switch (channels) {
        case 3:
            memcpy(o, p, n * 3);
            break;
        case 4:
            for (size_t i = 0; i < n; ++i) { o[3*i] = p[4*i]; o[3*i+1] = p[4*i+1]; o[3*i+2] = p[4*i+2]; }
            break;
        case 1:
            for (size_t i = 0; i < n; ++i) { o[3*i] = o[3*i+1] = o[3*i+2] = p[i]; }
            break;
        case 2:
            for (size_t i = 0; i < n; ++i) { o[3*i] = o[3*i+1] = o[3*i+2] = p[2*i]; }
            break;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// NPY float32 reader (v1.0/v2.0 headers, C-order, little-endian f4/f8)
// ---------------------------------------------------------------------------

int read_npy_f32(const uint8_t* data, size_t size, float* out, size_t out_count) {
    if (size < 10 || memcmp(data, "\x93NUMPY", 6) != 0) return -1;
    int major = data[6];
    size_t header_len, header_off;
    if (major == 1) {
        header_len = data[8] | (size_t(data[9]) << 8);
        header_off = 10;
    } else {
        if (size < 12) return -2;
        // v2.0+: little-endian uint32 header length
        header_len = data[8] | (size_t(data[9]) << 8) | (size_t(data[10]) << 16) | (size_t(data[11]) << 24);
        header_off = 12;
    }
    if (header_off + header_len > size) return -3;
    std::string header(reinterpret_cast<const char*>(data + header_off), header_len);
    bool f8 = header.find("'<f8'") != std::string::npos || header.find("\"<f8\"") != std::string::npos;
    bool f4 = header.find("'<f4'") != std::string::npos || header.find("\"<f4\"") != std::string::npos;
    if (!f4 && !f8) return -4;
    if (header.find("'fortran_order': True") != std::string::npos) return -5;
    const uint8_t* body = data + header_off + header_len;
    size_t body_size = size - header_off - header_len;
    if (f4) {
        if (body_size < out_count * 4) return -6;
        memcpy(out, body, out_count * 4);
    } else {
        if (body_size < out_count * 8) return -6;
        const double* d = reinterpret_cast<const double*>(body);
        for (size_t i = 0; i < out_count; ++i) out[i] = float(d[i]);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Thread pool
// ---------------------------------------------------------------------------

class ThreadPool {
  public:
    explicit ThreadPool(int n) : stop_(false) {
        for (int i = 0; i < n; ++i)
            workers_.emplace_back([this] { loop(); });
    }
    ~ThreadPool() {
        {
            std::lock_guard<std::mutex> g(mu_);
            stop_ = true;
        }
        cv_.notify_all();
        for (auto& w : workers_) w.join();
    }
    void submit(std::function<void()> f) {
        {
            std::lock_guard<std::mutex> g(mu_);
            tasks_.push(std::move(f));
        }
        cv_.notify_one();
    }

  private:
    void loop() {
        for (;;) {
            std::function<void()> task;
            {
                std::unique_lock<std::mutex> g(mu_);
                cv_.wait(g, [this] { return stop_ || !tasks_.empty(); });
                if (stop_ && tasks_.empty()) return;
                task = std::move(tasks_.front());
                tasks_.pop();
            }
            task();
        }
    }
    std::vector<std::thread> workers_;
    std::queue<std::function<void()>> tasks_;
    std::mutex mu_;
    std::condition_variable cv_;
    bool stop_;
};

ThreadPool* g_pool = nullptr;
std::mutex g_pool_mu;

ThreadPool& pool(int workers) {
    std::lock_guard<std::mutex> g(g_pool_mu);
    if (!g_pool) g_pool = new ThreadPool(workers > 0 ? workers : 4);
    return *g_pool;
}

struct Latch {
    std::mutex mu;
    std::condition_variable cv;
    int remaining;
    explicit Latch(int n) : remaining(n) {}
    void done() {
        std::lock_guard<std::mutex> g(mu);
        if (--remaining == 0) cv.notify_all();
    }
    void wait() {
        std::unique_lock<std::mutex> g(mu);
        cv.wait(g, [this] { return remaining == 0; });
    }
};

}  // namespace

extern "C" {

// Decode one PNG into a caller-provided RGB8 buffer of h*w*3 bytes.
// Returns 0 on success; the image must match (h, w) exactly.
int depthio_decode_png(const char* path, uint8_t* out, int h, int w) {
    std::vector<uint8_t> file;
    if (!read_file(path, file)) return -100;
    PngImage img;
    int rc = decode_png(file.data(), file.size(), img);
    if (rc != 0) return rc;
    if (int(img.height) != h || int(img.width) != w) return -101;
    memcpy(out, img.rgb.data(), img.rgb.size());
    return 0;
}

// Query PNG dimensions without a full decode. Returns 0 on success.
int depthio_png_info(const char* path, int* h, int* w) {
    std::vector<uint8_t> file;
    if (!read_file(path, file)) return -100;
    if (file.size() < 33) return -1;
    if (memcmp(file.data() + 12, "IHDR", 4) != 0) return -2;
    *w = int(be32(file.data() + 16));
    *h = int(be32(file.data() + 20));
    return 0;
}

// Read a float32/float64 .npy of exactly `count` elements into `out` (as f32).
int depthio_read_npy(const char* path, float* out, long long count) {
    std::vector<uint8_t> file;
    if (!read_file(path, file)) return -100;
    return read_npy_f32(file.data(), file.size(), out, size_t(count));
}

// Decode a whole batch in parallel: `paths` is n null-terminated RGB png paths
// and n depth npy paths (nullable). Fills rgb_out (n*h*w*3 u8) and depth_out
// (n*h*w f32, may be null). Returns 0, or the first nonzero per-item status.
int depthio_load_batch(const char** rgb_paths, const char** depth_paths, int n,
                       uint8_t* rgb_out, float* depth_out, int h, int w,
                       int workers) {
    ThreadPool& tp = pool(workers);
    std::vector<int> status(n, 0);
    Latch latch(n);
    const size_t rgb_stride = size_t(h) * w * 3;
    const size_t depth_stride = size_t(h) * w;
    for (int i = 0; i < n; ++i) {
        tp.submit([&, i] {
            int rc = depthio_decode_png(rgb_paths[i], rgb_out + i * rgb_stride, h, w);
            if (rc == 0 && depth_paths && depth_out) {
                rc = depthio_read_npy(depth_paths[i], depth_out + i * depth_stride,
                                      (long long)depth_stride);
            }
            status[i] = rc;
            latch.done();
        });
    }
    latch.wait();
    for (int i = 0; i < n; ++i)
        if (status[i] != 0) return status[i];
    return 0;
}

}  // extern "C"
