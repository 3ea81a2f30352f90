// Native host image pipeline: threaded JPEG/PNG decode + Pillow-exact
// bicubic resize + center crop into fixed-shape uint8 batches.
//
// TPU-native counterpart of the reference's torch DataLoader worker
// processes (reference train.py:154-155: DataLoader(num_workers=4) doing
// PIL decode + torchvision transforms per worker). On a TPU VM the host
// pipeline is the throughput bound of the gallery-embedding north star
// (SURVEY.md section 6), and CPython threads serialize PIL's Python glue;
// this library does decode+resize entirely in C++ (no GIL) with one
// std::thread pool per batch call.
//
// Parity contract (tested bit-exact in tests/test_native_loader.py):
//  * decode matches PIL: same system libjpeg-turbo (JDCT_ISLOW, fancy
//    upsampling — libjpeg defaults, which Pillow also uses) and libpng;
//    RGBA/palette/gray handling mirrors Image.convert("RGB"/"L"),
//    including PIL's exact integer luma L = (R*19595 + G*38470 + B*7471
//    + 0x8000) >> 16.
//  * resize reimplements Pillow's Resample.c fixed-point path exactly:
//    bicubic a=-0.5, PRECISION_BITS = 32-8-2, the same coefficient
//    rounding, accumulator init 1<<(PB-1) and clip8 — horizontal pass
//    then vertical pass.
//  * geometry matches art_sbir_tpu/data/loader.py::decode_image:
//    mode 0 = square Resize((size, size)); mode 1 = torchvision
//    Resize(shortest=size, int-truncated long side) + CenterCrop
//    (python-round half-to-even offsets).
//
// Unsupported inputs (CMYK/16-bit/exotic) return a nonzero per-image
// status and the Python wrapper falls back to PIL for those images only.

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ------------------------------------------------------------------ resize
// Pillow src/libImaging/Resample.c, 8bpc path, reimplemented.

constexpr int PRECISION_BITS = 32 - 8 - 2;

inline double bicubic_filter(double x) {
    // Pillow's bicubic, a = -0.5
    constexpr double a = -0.5;
    if (x < 0.0) x = -x;
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1;
    if (x < 2.0) return (((x - 5) * x + 8) * x - 4) * a;
    return 0.0;
}

inline uint8_t clip8(int in) {
    if (in >= (1 << PRECISION_BITS << 8)) return 255;
    if (in <= 0) return 0;
    return (uint8_t)(in >> PRECISION_BITS);
}

// Pillow precompute_coeffs for a full-image box, bicubic (support 2.0).
// Returns ksize; fills bounds (2*outSize) and int coeffs (outSize*ksize).
int precompute_coeffs(int inSize, int outSize, std::vector<int>& bounds,
                      std::vector<int>& kk) {
    double support0 = 2.0;  // bicubic support
    double scale = (double)inSize / outSize;
    double filterscale = scale < 1.0 ? 1.0 : scale;
    double support = support0 * filterscale;
    int ksize = (int)ceil(support) * 2 + 1;

    bounds.assign((size_t)outSize * 2, 0);
    std::vector<double> prekk((size_t)outSize * ksize, 0.0);
    for (int xx = 0; xx < outSize; xx++) {
        double center = (xx + 0.5) * scale;
        double ww = 0.0;
        double ss = 1.0 / filterscale;
        int xmin = (int)(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = (int)(center + support + 0.5);
        if (xmax > inSize) xmax = inSize;
        xmax -= xmin;
        double* k = &prekk[(size_t)xx * ksize];
        int x = 0;
        for (; x < xmax; x++) {
            double w = bicubic_filter((x + xmin - center + 0.5) * ss);
            k[x] = w;
            ww += w;
        }
        for (x = 0; x < xmax; x++) {
            if (ww != 0.0) k[x] /= ww;
        }
        bounds[(size_t)xx * 2 + 0] = xmin;
        bounds[(size_t)xx * 2 + 1] = xmax;
    }
    // normalize_coeffs_8bpc: round to fixed point with half-away-from-zero
    kk.assign(prekk.size(), 0);
    for (size_t i = 0; i < prekk.size(); i++) {
        if (prekk[i] < 0)
            kk[i] = (int)(-0.5 + prekk[i] * (1 << PRECISION_BITS));
        else
            kk[i] = (int)(0.5 + prekk[i] * (1 << PRECISION_BITS));
    }
    return ksize;
}

// in: (h, w, CH) uint8 -> out: (h, outW, CH). CH is a compile-time
// constant so the coefficient loop runs ONCE with CH accumulators
// (contiguous pixel loads) instead of CH strided passes.
template <int CH>
void resample_horizontal(const uint8_t* in, int w, int h, int outW,
                         int ksize, const std::vector<int>& bounds,
                         const std::vector<int>& kk, uint8_t* out) {
    for (int yy = 0; yy < h; yy++) {
        const uint8_t* row = in + (size_t)yy * w * CH;
        uint8_t* orow = out + (size_t)yy * outW * CH;
        for (int xx = 0; xx < outW; xx++) {
            int xmin = bounds[(size_t)xx * 2 + 0];
            int xmax = bounds[(size_t)xx * 2 + 1];
            const int* k = &kk[(size_t)xx * ksize];
            int ss[CH];
            for (int b = 0; b < CH; b++) ss[b] = 1 << (PRECISION_BITS - 1);
            const uint8_t* px = row + (size_t)xmin * CH;
            for (int x = 0; x < xmax; x++) {
                int kv = k[x];
                for (int b = 0; b < CH; b++) ss[b] += px[b] * kv;
                px += CH;
            }
            for (int b = 0; b < CH; b++) orow[(size_t)xx * CH + b] = clip8(ss[b]);
        }
    }
}

// in: (h, w, ch) -> out: (outH, w, ch)
void resample_vertical(const uint8_t* in, int w, int h, int ch, int outH,
                       int ksize, const std::vector<int>& bounds,
                       const std::vector<int>& kk, uint8_t* out) {
    for (int yy = 0; yy < outH; yy++) {
        int ymin = bounds[(size_t)yy * 2 + 0];
        int ymax = bounds[(size_t)yy * 2 + 1];
        const int* k = &kk[(size_t)yy * ksize];
        uint8_t* orow = out + (size_t)yy * w * ch;
        for (int xx = 0; xx < w * ch; xx++) {
            int ss = 1 << (PRECISION_BITS - 1);
            for (int y = 0; y < ymax; y++)
                ss += in[(size_t)(y + ymin) * w * ch + xx] * k[y];
            orow[xx] = clip8(ss);
        }
    }
}

// Pillow ImagingResample order: horizontal pass, then vertical pass.
// Identity sizes short-circuit like Image.resize (returns a copy).
void resize_bicubic(const std::vector<uint8_t>& in, int w, int h, int ch,
                    int outW, int outH, std::vector<uint8_t>& out) {
    if (w == outW && h == outH) {
        out = in;
        return;
    }
    std::vector<int> bounds, kk;
    const std::vector<uint8_t>* src = &in;
    std::vector<uint8_t> tmp;
    int curW = w;
    if (outW != w) {
        int ksize = precompute_coeffs(w, outW, bounds, kk);
        tmp.resize((size_t)h * outW * ch);
        if (ch == 3)
            resample_horizontal<3>(src->data(), w, h, outW, ksize, bounds,
                                   kk, tmp.data());
        else
            resample_horizontal<1>(src->data(), w, h, outW, ksize, bounds,
                                   kk, tmp.data());
        src = &tmp;
        curW = outW;
    }
    if (outH != h) {
        int ksize = precompute_coeffs(h, outH, bounds, kk);
        out.resize((size_t)outH * curW * ch);
        resample_vertical(src->data(), curW, h, ch, outH, ksize, bounds, kk,
                          out.data());
    } else {
        out = *src;
    }
}

// ------------------------------------------------------------------ decode

constexpr long MAX_PIXELS = 300L * 1000 * 1000;  // decompression-bomb guard

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* e = (JpegErr*)cinfo->err;
    longjmp(e->jb, 1);
}

// -> rgb (h, w, 3); returns 0 ok / nonzero error. Memory source so the
// same decoder serves files (slurped by process_one) and HTTP request
// bodies (decode_resize_batch_mem) — libjpeg's jpeg_mem_src.
int decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>& rgb,
                int& w, int& h) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return 3;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
                 (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    if (cinfo.jpeg_color_space == JCS_CMYK ||
        cinfo.jpeg_color_space == JCS_YCCK) {
        jpeg_destroy_decompress(&cinfo);
        return 2;  // PIL converts CMYK with its own tables; fall back
    }
    cinfo.out_color_space = JCS_RGB;  // gray sources replicate, like PIL L->RGB
    // dct_method / do_fancy_upsampling stay at libjpeg defaults
    // (JDCT_ISLOW, TRUE) — the same defaults Pillow decodes with.
    jpeg_start_decompress(&cinfo);
    w = (int)cinfo.output_width;
    h = (int)cinfo.output_height;
    if ((long)w * h > MAX_PIXELS || cinfo.output_components != 3) {
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        return 4;
    }
    rgb.resize((size_t)w * h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* rowp = rgb.data() + (size_t)cinfo.output_scanline * w * 3;
        jpeg_read_scanlines(&cinfo, &rowp, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// libpng memory source: read_fn over a (ptr, remaining) cursor
struct PngMem {
    const uint8_t* p;
    size_t n;
    size_t off;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t want) {
    PngMem* m = (PngMem*)png_get_io_ptr(png);
    if (m->off + want > m->n) png_error(png, "png mem source truncated");
    memcpy(out, m->p + m->off, want);
    m->off += want;
}

int decode_png(const uint8_t* data, size_t len, std::vector<uint8_t>& rgb,
               int& w, int& h) {
    png_structp png =
        png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (!png) return 3;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return 3;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return 3;
    }
    PngMem mem{data, len, 0};
    png_set_read_fn(png, &mem, png_mem_read);
    png_read_info(png, info);
    w = (int)png_get_image_width(png, info);
    h = (int)png_get_image_height(png, info);
    if ((long)w * h > MAX_PIXELS) {
        png_destroy_read_struct(&png, &info, nullptr);
        return 4;
    }
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);
    if (depth == 16) {
        // PIL's I;16 -> RGB conversion is NOT a high-byte strip (measured
        // maxdiff 212 vs png_set_strip_16); leave 16-bit to the PIL path
        png_destroy_read_struct(&png, &info, nullptr);
        return 2;
    }
    // normalize to 8-bit RGB or RGBA (alpha dropped below, like
    // Image.convert("RGB") which copies RGB bytes and ignores alpha)
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);  // replicate, like PIL L->RGB
    png_read_update_info(png, info);
    int ch = (int)png_get_channels(png, info);
    if (ch != 3 && ch != 4) {
        png_destroy_read_struct(&png, &info, nullptr);
        return 2;
    }
    std::vector<uint8_t> raw((size_t)w * h * ch);
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; y++) rows[y] = raw.data() + (size_t)y * w * ch;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    if (ch == 4) {
        rgb.resize((size_t)w * h * 3);
        for (size_t i = 0; i < (size_t)w * h; i++) {
            rgb[i * 3 + 0] = raw[i * 4 + 0];
            rgb[i * 3 + 1] = raw[i * 4 + 1];
            rgb[i * 3 + 2] = raw[i * 4 + 2];
        }
    } else {
        rgb = std::move(raw);
    }
    return 0;
}

// PIL ImagingConvert rgb2l: L24(rgb) >> 16 with the 0x8000 rounding bias
inline uint8_t pil_luma(uint8_t r, uint8_t g, uint8_t b) {
    return (uint8_t)((r * 19595u + g * 38470u + b * 7471u + 0x8000u) >> 16);
}

// torchvision Resize(int) short-side semantics (ops/resize.py:85-91)
void shortest_side_size(int h, int w, int size, int& nh, int& nw) {
    if (h <= w) {
        nh = size;
        nw = (int)((double)size * w / h);
    } else {
        nh = (int)((double)size * h / w);
        nw = size;
    }
}

// python round() — half to even (ops/resize.py:93-97)
int python_round_half(int num) {  // round(num / 2.0)
    int t = num / 2;              // num >= 0 here (nh, nw >= crop)
    if (num % 2 == 0) return t;
    // fraction exactly .5: round to even
    return (t % 2 == 0) ? t : t + 1;
}

// decode+convert+resize one in-memory image (JPEG/PNG sniffed by magic)
int process_buf(const uint8_t* data, size_t len, int size, int mode,
                int grayscale, uint8_t* out) {
    std::vector<uint8_t> rgb;
    int w = 0, h = 0, rc;
    if (len >= 2 && data[0] == 0xFF && data[1] == 0xD8) {
        rc = decode_jpeg(data, len, rgb, w, h);
    } else if (len >= 8 && !memcmp(data, "\x89PNG\r\n\x1a\n", 8)) {
        rc = decode_png(data, len, rgb, w, h);
    } else {
        rc = 2;  // unsupported container -> PIL fallback
    }
    if (rc) return rc;
    if (w <= 0 || h <= 0) return 3;

    // PIL-order ops: convert() happens BEFORE resize in decode_image
    int ch = 3;
    if (grayscale) {
        std::vector<uint8_t> gray((size_t)w * h);
        for (size_t i = 0; i < (size_t)w * h; i++)
            gray[i] = pil_luma(rgb[i * 3], rgb[i * 3 + 1], rgb[i * 3 + 2]);
        rgb = std::move(gray);
        ch = 1;
    }

    std::vector<uint8_t> resized;
    if (mode == 0) {  // square
        resize_bicubic(rgb, w, h, ch, size, size, resized);
        memcpy(out, resized.data(), (size_t)size * size * ch);
    } else {  // shortest_crop
        int nh, nw;
        shortest_side_size(h, w, size, nh, nw);
        if (nh < size || nw < size) return 3;  // cannot happen for valid sizes
        resize_bicubic(rgb, w, h, ch, nw, nh, resized);
        int top = python_round_half(nh - size);
        int left = python_round_half(nw - size);
        for (int y = 0; y < size; y++)
            memcpy(out + (size_t)y * size * ch,
                   resized.data() + ((size_t)(top + y) * nw + left) * ch,
                   (size_t)size * ch);
    }
    return 0;
}

int process_one(const char* path, int size, int mode, int grayscale,
                uint8_t* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    // slurp: image files are MBs; the decode already buffers w*h*3 anyway
    fseek(f, 0, SEEK_END);
    long fl = ftell(f);
    rewind(f);
    if (fl < 0) {
        fclose(f);
        return 1;
    }
    std::vector<uint8_t> buf((size_t)fl);
    size_t got = fl ? fread(buf.data(), 1, (size_t)fl, f) : 0;
    fclose(f);
    if (got != (size_t)fl) return 1;
    return process_buf(buf.data(), buf.size(), size, mode, grayscale, out);
}

}  // namespace

extern "C" {

// paths: n C strings; out: (n, size, size, C) uint8, C = grayscale ? 1 : 3;
// status: n ints, 0 ok / 1 open / 2 unsupported / 3 decode / 4 too big.
// mode: 0 = square Resize((size,size)), 1 = Resize(shortest)+CenterCrop.
void decode_resize_batch(const char** paths, int n, int size, int mode,
                         int grayscale, int n_threads, unsigned char* out,
                         int* status) {
    int ch = grayscale ? 1 : 3;
    size_t stride = (size_t)size * size * ch;
    std::atomic<int> next(0);
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) return;
            status[i] = process_one(paths[i], size, mode, grayscale,
                                    out + (size_t)i * stride);
        }
    };
    int nt = n_threads < 1 ? 1 : (n_threads > n ? n : n_threads);
    if (nt == 1) {
        worker();
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve(nt);
    for (int t = 0; t < nt; t++) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
}

// In-memory variant for byte streams that never touch the filesystem
// (the serving path's HTTP request bodies). bufs/lens: n buffers; other
// parameters and the status contract match decode_resize_batch.
void decode_resize_batch_mem(const unsigned char** bufs,
                             const long long* lens, int n, int size,
                             int mode, int grayscale, int n_threads,
                             unsigned char* out, int* status) {
    int ch = grayscale ? 1 : 3;
    size_t stride = (size_t)size * size * ch;
    std::atomic<int> next(0);
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) return;
            status[i] = process_buf(bufs[i], (size_t)lens[i], size, mode,
                                    grayscale, out + (size_t)i * stride);
        }
    };
    int nt = n_threads < 1 ? 1 : (n_threads > n ? n : n_threads);
    if (nt == 1) {
        worker();
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve(nt);
    for (int t = 0; t < nt; t++) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
}

}  // extern "C"
