// Native batch JPEG decode + bicubic resize for the host data loader.
//
// The reference reaches libjpeg through PIL inside torch DataLoader worker
// PROCESSES (data/datasets/make_dataloader.py num_workers); the TPU-native
// host runtime keeps one process and parallelizes the decode loop with
// OpenMP threads instead (editor_tpu/data/loader.py BatchLoader). This
// module is the C++ hot loop: decode each JPEG with libjpeg, optionally
// crop a tile (the wide-JPEG multi-modal layout, reference bases.py:21-26),
// and bicubic-resize (a = -0.5, PIL-style clamped+normalized borders) to
// the model input size.
//
// Build: g++ -O3 -fopenmp -shared -fPIC imagecodec.cpp -ljpeg
// Entry: editor_tpu_decode_resize_batch (see signature below).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <csetjmp>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct ErrMgr {
    jpeg_error_mgr pub;
    jmp_buf jb;
};

void on_error(j_common_ptr cinfo) {
    ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
    longjmp(e->jb, 1);
}

// Decode one JPEG file to RGB8. Returns true on success.
bool decode_jpeg(const char* path, std::vector<unsigned char>& rgb,
                 int& w, int& h) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = on_error;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        std::fclose(f);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    w = cinfo.output_width;
    h = cinfo.output_height;
    rgb.resize(static_cast<size_t>(w) * h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char* row = rgb.data()
            + static_cast<size_t>(cinfo.output_scanline) * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return true;
}

inline double bicubic(double x) {  // a = -0.5 (PIL / Catmull-Rom)
    const double a = -0.5;
    x = std::fabs(x);
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
    if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
    return 0.0;
}

// Separable bicubic resize of an interleaved RGB8 region.
void resize_bicubic(const unsigned char* src, int sw, int sh, int x0, int y0,
                    int cw, int ch, unsigned char* dst, int dw, int dh) {
    const double sx = static_cast<double>(cw) / dw;
    const double sy = static_cast<double>(ch) / dh;
    const double support_x = sx > 1.0 ? 2.0 * sx : 2.0;
    const double support_y = sy > 1.0 ? 2.0 * sy : 2.0;
    const double inv_fx = sx > 1.0 ? 1.0 / sx : 1.0;
    const double inv_fy = sy > 1.0 ? 1.0 / sy : 1.0;

    // horizontal pass into a float buffer [ch, dw, 3]
    std::vector<float> tmp(static_cast<size_t>(ch) * dw * 3);
    std::vector<double> wbuf;
    for (int ox = 0; ox < dw; ++ox) {
        const double center = (ox + 0.5) * sx - 0.5;
        int lo = static_cast<int>(std::floor(center - support_x)) + 1;
        int hi = static_cast<int>(std::floor(center + support_x));
        wbuf.assign(hi - lo + 1, 0.0);
        double wsum = 0.0;
        for (int ix = lo; ix <= hi; ++ix) {
            double wv = bicubic((ix - center) * inv_fx);
            wbuf[ix - lo] = wv;
            wsum += wv;
        }
        for (double& wv : wbuf) wv /= wsum;
        for (int y = 0; y < ch; ++y) {
            const unsigned char* row =
                src + (static_cast<size_t>(y0 + y) * sw + x0) * 3;
            double acc[3] = {0, 0, 0};
            for (int ix = lo; ix <= hi; ++ix) {
                int cx = ix < 0 ? 0 : (ix >= cw ? cw - 1 : ix);
                const unsigned char* px = row + static_cast<size_t>(cx) * 3;
                for (int c = 0; c < 3; ++c) acc[c] += wbuf[ix - lo] * px[c];
            }
            float* out = tmp.data() + (static_cast<size_t>(y) * dw + ox) * 3;
            for (int c = 0; c < 3; ++c) out[c] = static_cast<float>(acc[c]);
        }
    }
    // vertical pass
    for (int oy = 0; oy < dh; ++oy) {
        const double center = (oy + 0.5) * sy - 0.5;
        int lo = static_cast<int>(std::floor(center - support_y)) + 1;
        int hi = static_cast<int>(std::floor(center + support_y));
        wbuf.assign(hi - lo + 1, 0.0);
        double wsum = 0.0;
        for (int iy = lo; iy <= hi; ++iy) {
            double wv = bicubic((iy - center) * inv_fy);
            wbuf[iy - lo] = wv;
            wsum += wv;
        }
        for (double& wv : wbuf) wv /= wsum;
        for (int ox = 0; ox < dw; ++ox) {
            double acc[3] = {0, 0, 0};
            for (int iy = lo; iy <= hi; ++iy) {
                int cy = iy < 0 ? 0 : (iy >= ch ? ch - 1 : iy);
                const float* px =
                    tmp.data() + (static_cast<size_t>(cy) * dw + ox) * 3;
                for (int c = 0; c < 3; ++c) acc[c] += wbuf[iy - lo] * px[c];
            }
            unsigned char* out =
                dst + (static_cast<size_t>(oy) * dw + ox) * 3;
            for (int c = 0; c < 3; ++c) {
                double v = acc[c];
                out[c] = static_cast<unsigned char>(
                    v < 0.0 ? 0 : (v > 255.0 ? 255 : std::lround(v)));
            }
        }
    }
}

}  // namespace

extern "C" {

// Decode n JPEGs, crop [crop_x0[i], crop_x0[i]+crop_w) x [0, crop_h)
// (crop_w <= 0: whole image), bicubic-resize to (out_h, out_w) and write
// into out[n, out_h, out_w, 3] u8. Returns the number of FAILED items.
int editor_tpu_decode_resize_batch(const char** paths, int n,
                                   const int* crop_x0, int crop_w,
                                   int crop_h, int out_h, int out_w,
                                   unsigned char* out) {
    int failures = 0;
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
    for (int i = 0; i < n; ++i) {
        std::vector<unsigned char> rgb;
        int w = 0, h = 0;
        if (!decode_jpeg(paths[i], rgb, w, h)) {
            ++failures;
            continue;
        }
        int x0 = 0, cw = w, ch = h;
        if (crop_w > 0) {
            x0 = crop_x0 ? crop_x0[i] : 0;
            cw = crop_w;
            ch = crop_h > 0 ? crop_h : h;
            if (x0 < 0 || x0 + cw > w || ch > h) {
                ++failures;
                continue;
            }
        }
        resize_bicubic(rgb.data(), w, h, x0, 0, cw, ch,
                       out + static_cast<size_t>(i) * out_h * out_w * 3,
                       out_w, out_h);
    }
    return failures;
}

}  // extern "C"
