// Native PNG decode + resize for the host data pipeline.
//
// The reference leans on pillow-simd / OpenCV for image decode
// (reference: docker/Dockerfile, datasets/augmentations.py:16-55). Here the
// hot decode path is a small zlib-based PNG reader with a std::thread batch
// API, exposed through a C ABI for ctypes (no pybind11 in this image).
//
// Supports: 8-bit gray/RGB/gray+alpha/RGBA and 16-bit gray (KITTI/NCDB depth
// maps). Interlaced PNGs return an error and the Python caller falls back to
// PIL.
//
// Build: see csrc/Makefile (g++ -O3 -shared -fPIC pngio.cpp -lz).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <thread>
#include <zlib.h>

namespace {

struct Chunk {
    uint32_t length;
    char type[5];
    const uint8_t* data;
};

uint32_t be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct PngImage {
    int width = 0, height = 0, channels = 0, bitdepth = 0;
    std::vector<uint8_t> pixels;  // unfiltered scanline data (no filter byte)
};

int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

// returns 0 on success
int decode_png(const char* path, PngImage& img) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(size);
    if (fread(buf.data(), 1, size, f) != size_t(size)) { fclose(f); return -2; }
    fclose(f);

    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (size < 8 || memcmp(buf.data(), sig, 8) != 0) return -3;

    int color_type = -1, interlace = 0;
    std::vector<uint8_t> idat;
    size_t off = 8;
    while (off + 8 <= size_t(size)) {
        uint32_t len = be32(&buf[off]);
        char type[5] = {0};
        memcpy(type, &buf[off + 4], 4);
        const uint8_t* data = &buf[off + 8];
        if (off + 12 + len > size_t(size)) return -4;
        if (strcmp(type, "IHDR") == 0) {
            img.width = be32(data);
            img.height = be32(data + 4);
            img.bitdepth = data[8];
            color_type = data[9];
            interlace = data[12];
        } else if (strcmp(type, "IDAT") == 0) {
            idat.insert(idat.end(), data, data + len);
        } else if (strcmp(type, "IEND") == 0) {
            break;
        }
        off += 12 + len;
    }
    if (interlace != 0) return -5;               // Adam7 unsupported
    if (img.bitdepth != 8 && img.bitdepth != 16) return -6;
    switch (color_type) {
        case 0: img.channels = 1; break;
        case 2: img.channels = 3; break;
        case 4: img.channels = 2; break;
        case 6: img.channels = 4; break;
        default: return -7;                       // palette unsupported
    }

    const int bytes_per_sample = img.bitdepth / 8;
    const size_t stride = size_t(img.width) * img.channels * bytes_per_sample;
    const size_t raw_size = (stride + 1) * img.height;
    std::vector<uint8_t> raw(raw_size);

    uLongf dest_len = raw_size;
    if (uncompress(raw.data(), &dest_len, idat.data(), idat.size()) != Z_OK ||
        dest_len != raw_size)
        return -8;

    // Unfilter
    img.pixels.resize(stride * img.height);
    const int bpp = img.channels * bytes_per_sample;
    for (int y = 0; y < img.height; ++y) {
        uint8_t filter = raw[y * (stride + 1)];
        const uint8_t* src = &raw[y * (stride + 1) + 1];
        uint8_t* dst = &img.pixels[y * stride];
        const uint8_t* prev = y > 0 ? &img.pixels[(y - 1) * stride] : nullptr;
        switch (filter) {
            case 0:
                memcpy(dst, src, stride);
                break;
            case 1:  // Sub
                for (size_t x = 0; x < stride; ++x)
                    dst[x] = src[x] + (x >= size_t(bpp) ? dst[x - bpp] : 0);
                break;
            case 2:  // Up
                for (size_t x = 0; x < stride; ++x)
                    dst[x] = src[x] + (prev ? prev[x] : 0);
                break;
            case 3:  // Average
                for (size_t x = 0; x < stride; ++x) {
                    int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
                    int b = prev ? prev[x] : 0;
                    dst[x] = src[x] + uint8_t((a + b) / 2);
                }
                break;
            case 4:  // Paeth
                for (size_t x = 0; x < stride; ++x) {
                    int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
                    int b = prev ? prev[x] : 0;
                    int c = (prev && x >= size_t(bpp)) ? prev[x - bpp] : 0;
                    dst[x] = src[x] + uint8_t(paeth(a, b, c));
                }
                break;
            default:
                return -9;
        }
    }
    return 0;
}

}  // namespace

extern "C" {

// Query dimensions. Returns 0 on success.
int png_info(const char* path, int* w, int* h, int* channels, int* bitdepth) {
    PngImage img;
    // Decode fully (cheap enough; info-only parse would duplicate code)
    int rc = decode_png(path, img);
    if (rc != 0) return rc;
    *w = img.width; *h = img.height;
    *channels = img.channels; *bitdepth = img.bitdepth;
    return 0;
}

// Decode 8-bit image into caller buffer [h*w*channels] u8.
int png_decode8(const char* path, uint8_t* out, int out_size) {
    PngImage img;
    int rc = decode_png(path, img);
    if (rc != 0) return rc;
    if (img.bitdepth != 8) return -10;
    if (int(img.pixels.size()) > out_size) return -11;
    memcpy(out, img.pixels.data(), img.pixels.size());
    return int(img.pixels.size());
}

// Decode 16-bit gray into caller buffer [h*w] u16 (host endianness).
int png_decode16(const char* path, uint16_t* out, int out_size) {
    PngImage img;
    int rc = decode_png(path, img);
    if (rc != 0) return rc;
    if (img.bitdepth != 16 || img.channels != 1) return -10;
    int n = img.width * img.height;
    if (n > out_size) return -11;
    for (int i = 0; i < n; ++i)  // PNG stores big-endian samples
        out[i] = (uint16_t(img.pixels[2 * i]) << 8) | img.pixels[2 * i + 1];
    return n;
}

// Threaded batch decode of 8-bit images with identical shapes.
// paths: array of n C strings; out: n contiguous [h*w*c] u8 buffers.
// Returns number of successfully decoded images.
int png_decode8_batch(const char** paths, int n, uint8_t* out,
                      int image_bytes, int num_threads) {
    if (num_threads <= 0) num_threads = 4;
    std::vector<int> ok(n, 0);
    std::vector<std::thread> threads;
    int per = (n + num_threads - 1) / num_threads;
    for (int t = 0; t < num_threads; ++t) {
        threads.emplace_back([&, t]() {
            for (int i = t * per; i < std::min(n, (t + 1) * per); ++i) {
                int rc = png_decode8(paths[i], out + size_t(i) * image_bytes,
                                     image_bytes);
                ok[i] = rc > 0;
            }
        });
    }
    for (auto& th : threads) th.join();
    int total = 0;
    for (int v : ok) total += v;
    return total;
}

// Bilinear u8 resize (HWC), align_corners=false convention.
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw) {
    for (int y = 0; y < dh; ++y) {
        float fy = (y + 0.5f) * sh / dh - 0.5f;
        if (fy < 0) fy = 0;
        int y0 = int(fy);
        int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
        float wy = fy - y0;
        for (int x = 0; x < dw; ++x) {
            float fx = (x + 0.5f) * sw / dw - 0.5f;
            if (fx < 0) fx = 0;
            int x0 = int(fx);
            int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
            float wx = fx - x0;
            for (int k = 0; k < c; ++k) {
                float v00 = src[(y0 * sw + x0) * c + k];
                float v01 = src[(y0 * sw + x1) * c + k];
                float v10 = src[(y1 * sw + x0) * c + k];
                float v11 = src[(y1 * sw + x1) * c + k];
                float top = v00 + (v01 - v00) * wx;
                float bot = v10 + (v11 - v10) * wx;
                dst[(y * dw + x) * c + k] = uint8_t(top + (bot - top) * wy + 0.5f);
            }
        }
    }
}

// Sparse-preserving depth downsample: scatter valid (>0) f32 points
// (reference semantics: datasets/augmentations.py:58-100).
void resize_depth_preserve_f32(const float* src, int sh, int sw,
                               float* dst, int dh, int dw) {
    memset(dst, 0, sizeof(float) * dh * dw);
    for (int y = 0; y < sh; ++y) {
        for (int x = 0; x < sw; ++x) {
            float v = src[y * sw + x];
            if (v <= 0) continue;
            int ny = int(y * (float(dh) / sh));
            int nx = int(x * (float(dw) / sw));
            if (ny < dh && nx < dw) dst[ny * dw + nx] = v;
        }
    }
}

}  // extern "C"
