// Native host-side image preprocessing for the TPU extraction pipeline.
//
// Replaces the reference's PIL/libjpeg dependency (SURVEY.md §2.1: "host-side
// decode ... overlapped with device compute") with a first-party,
// multi-threaded C++ component: JPEG/PNG decode -> RGB -> max-side bilinear
// resize -> ImageNet mean/std normalize -> float32 NHWC slot in a padded
// batch buffer + validity extents. One call prepares a whole batch; the
// Python side (data/native.py, ctypes) overlaps these calls with device
// compute via the extractor's prefetch thread.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links libjpeg + libpng)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> rgb;  // H*W*3
  int h = 0, w = 0;
  bool ok = false;
};

// ---------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

Image decode_jpeg(FILE* f) {
  Image img;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.rgb.resize(size_t(img.w) * img.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.rgb.data() + size_t(cinfo.output_scanline) * img.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

// ----------------------------------------------------------------- PNG ----
Image decode_png(FILE* f) {
  Image img;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return img;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  img.w = png_get_image_width(png, info);
  img.h = png_get_image_height(png, info);
  img.rgb.resize(size_t(img.w) * img.h * 3);
  std::vector<png_bytep> rows(img.h);
  for (int y = 0; y < img.h; y++) rows[y] = img.rgb.data() + size_t(y) * img.w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

Image decode_file(const char* path) {
  Image img;
  FILE* f = fopen(path, "rb");
  if (!f) return img;
  uint8_t sig[8] = {0};
  size_t got = fread(sig, 1, 8, f);
  rewind(f);
  if (got >= 3 && sig[0] == 0xFF && sig[1] == 0xD8) {
    img = decode_jpeg(f);
  } else if (got >= 8 && !png_sig_cmp(sig, 0, 8)) {
    img = decode_png(f);
  }
  fclose(f);
  return img;
}

// --------------------------------------------------------------- resize ---
// Bilinear resize with half-pixel centers (align_corners=False semantics),
// then ImageNet normalize, written into a padded float32 NHWC slot.
const float kMean[3] = {0.485f, 0.456f, 0.406f};
const float kStd[3] = {0.229f, 0.224f, 0.225f};

// Raw uint8 variant: resized pixels only — normalization happens on device
// (shipping uint8 is 4x less host->device traffic than normalized f32).
void resize_into_u8(const Image& img, int nh, int nw, uint8_t* out,
                    int out_h, int out_w) {
  const float sy = float(img.h) / nh;
  const float sx = float(img.w) / nw;
  for (int y = 0; y < nh; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, std::min(img.h - 1, int(std::floor(fy))));
    int y1 = std::min(img.h - 1, y0 + 1);
    float wy = std::max(0.0f, std::min(1.0f, fy - y0));
    for (int x = 0; x < nw; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::max(0, std::min(img.w - 1, int(std::floor(fx))));
      int x1 = std::min(img.w - 1, x0 + 1);
      float wx = std::max(0.0f, std::min(1.0f, fx - x0));
      uint8_t* o = out + (size_t(y) * out_w + x) * 3;
      const uint8_t* p00 = img.rgb.data() + (size_t(y0) * img.w + x0) * 3;
      const uint8_t* p01 = img.rgb.data() + (size_t(y0) * img.w + x1) * 3;
      const uint8_t* p10 = img.rgb.data() + (size_t(y1) * img.w + x0) * 3;
      const uint8_t* p11 = img.rgb.data() + (size_t(y1) * img.w + x1) * 3;
      for (int c = 0; c < 3; c++) {
        float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                  wy * ((1 - wx) * p10[c] + wx * p11[c]);
        o[c] = uint8_t(std::lround(std::max(0.0f, std::min(255.0f, v))));
      }
    }
  }
}

// Lanczos-3 separable resize with PIL-compatible coefficients (half-pixel
// centers; when downscaling the kernel support scales with 1/scale, i.e.
// antialiased — PIL "thumbnail"/LANCZOS semantics, the reference's eval
// preprocessing). Accumulation is double; the intermediate stays float
// (PIL rounds to uint8 between passes — differences are sub-LSB) and the
// final write quantizes to uint8, matching the PIL path's u8 round-trip.
struct ResampleCoeffs {
  std::vector<double> k;   // [outSize * ksize]
  std::vector<int> xmin;   // first input tap per output index
  std::vector<int> xmax;   // tap count per output index
  int ksize = 0;
};

double lanczos3(double x) {
  if (x <= -3.0 || x >= 3.0) return 0.0;
  if (x == 0.0) return 1.0;
  const double pix = M_PI * x;
  return (std::sin(pix) / pix) * (std::sin(pix / 3.0) / (pix / 3.0));
}

ResampleCoeffs precompute_coeffs(int in_size, int out_size) {
  ResampleCoeffs c;
  const double scale = double(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 3.0 * filterscale;
  c.ksize = int(std::ceil(support)) * 2 + 1;
  c.k.assign(size_t(out_size) * c.ksize, 0.0);
  c.xmin.resize(out_size);
  c.xmax.resize(out_size);
  const double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; xx++) {
    const double center = (xx + 0.5) * scale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = c.k.data() + size_t(xx) * c.ksize;
    double ww = 0.0;
    for (int x = 0; x < xmax; x++) {
      const double w = lanczos3((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax; x++) k[x] /= ww;
    c.xmin[xx] = xmin;
    c.xmax[xx] = xmax;
  }
  return c;
}

void resize_lanczos_into_u8(const Image& img, int nh, int nw, uint8_t* out,
                            int out_h, int out_w) {
  const ResampleCoeffs cx = precompute_coeffs(img.w, nw);
  const ResampleCoeffs cy = precompute_coeffs(img.h, nh);
  auto clip8 = [](double v) -> uint8_t {
    return uint8_t(std::lround(std::max(0.0, std::min(255.0, v))));
  };
  // horizontal pass: [img.h, nw, 3]. PIL rounds AND CLAMPS the intermediate
  // to uint8 — the clamp is a nonlinearity (Lanczos lobes overshoot), so we
  // must replicate it or diverge by several LSB on high-frequency content.
  std::vector<uint8_t> tmp(size_t(img.h) * nw * 3);
  for (int y = 0; y < img.h; y++) {
    const uint8_t* row = img.rgb.data() + size_t(y) * img.w * 3;
    uint8_t* trow = tmp.data() + size_t(y) * nw * 3;
    for (int xx = 0; xx < nw; xx++) {
      const double* k = cx.k.data() + size_t(xx) * cx.ksize;
      const int x0 = cx.xmin[xx], n = cx.xmax[xx];
      double acc[3] = {0, 0, 0};
      for (int t = 0; t < n; t++) {
        const uint8_t* p = row + size_t(x0 + t) * 3;
        acc[0] += k[t] * p[0];
        acc[1] += k[t] * p[1];
        acc[2] += k[t] * p[2];
      }
      trow[xx * 3 + 0] = clip8(acc[0]);
      trow[xx * 3 + 1] = clip8(acc[1]);
      trow[xx * 3 + 2] = clip8(acc[2]);
    }
  }
  // vertical pass into the padded output slot
  for (int yy = 0; yy < nh; yy++) {
    const double* k = cy.k.data() + size_t(yy) * cy.ksize;
    const int y0 = cy.xmin[yy], n = cy.xmax[yy];
    uint8_t* orow = out + size_t(yy) * out_w * 3;
    for (int x = 0; x < nw; x++) {
      double acc[3] = {0, 0, 0};
      for (int t = 0; t < n; t++) {
        const uint8_t* p = tmp.data() + (size_t(y0 + t) * nw + x) * 3;
        acc[0] += k[t] * p[0];
        acc[1] += k[t] * p[1];
        acc[2] += k[t] * p[2];
      }
      for (int c = 0; c < 3; c++) orow[x * 3 + c] = clip8(acc[c]);
    }
  }
}

void resize_normalize_into(const Image& img, int nh, int nw, float* out,
                           int out_h, int out_w) {
  const float sy = float(img.h) / nh;
  const float sx = float(img.w) / nw;
  for (int y = 0; y < nh; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, std::min(img.h - 1, int(std::floor(fy))));
    int y1 = std::min(img.h - 1, y0 + 1);
    float wy = std::max(0.0f, std::min(1.0f, fy - y0));
    for (int x = 0; x < nw; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::max(0, std::min(img.w - 1, int(std::floor(fx))));
      int x1 = std::min(img.w - 1, x0 + 1);
      float wx = std::max(0.0f, std::min(1.0f, fx - x0));
      float* o = out + (size_t(y) * out_w + x) * 3;
      const uint8_t* p00 = img.rgb.data() + (size_t(y0) * img.w + x0) * 3;
      const uint8_t* p01 = img.rgb.data() + (size_t(y0) * img.w + x1) * 3;
      const uint8_t* p10 = img.rgb.data() + (size_t(y1) * img.w + x0) * 3;
      const uint8_t* p11 = img.rgb.data() + (size_t(y1) * img.w + x1) * 3;
      for (int c = 0; c < 3; c++) {
        float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                  wy * ((1 - wx) * p10[c] + wx * p11[c]);
        o[c] = (v / 255.0f - kMean[c]) / kStd[c];
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode + max-side-resize + normalize a batch of images into a padded
// float32 NHWC buffer.
//
//   paths:      n file paths
//   image_size: max-side target (shrink or grow, aspect preserved). When
//               negative, |image_size| is shrink-only (reference thumbnail
//               semantics: images already smaller keep their size).
//   out:        [n, out_h, out_w, 3] float32, zero-initialized by caller
//   sizes:      [n, 2] int32 — receives each image's valid (h, w)
//   bbx:        optional [n, 4] float (x0, y0, x1, y1) crop per image, or null
//   filter:     0 = bilinear (half-pixel), 1 = Lanczos-3 (PIL/reference)
//   returns:    number of successfully processed images
static int process_batch(const char** paths, int n, int image_size,
                         void* out, bool as_u8, int out_h, int out_w,
                         int* sizes, const float* bbx, int filter,
                         int nthreads) {
  const bool shrink_only = image_size < 0;
  if (shrink_only) image_size = -image_size;
  std::atomic<int> next(0), ok(0);
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image img = decode_file(paths[i]);
      sizes[i * 2] = 0;
      sizes[i * 2 + 1] = 0;
      if (!img.ok || img.w <= 0 || img.h <= 0) continue;
      if (bbx) {
        int x0 = std::max(0, std::min(img.w - 1, int(std::lround(bbx[i * 4 + 0]))));
        int y0 = std::max(0, std::min(img.h - 1, int(std::lround(bbx[i * 4 + 1]))));
        int x1 = std::max(x0 + 1, std::min(img.w, int(std::lround(bbx[i * 4 + 2]))));
        int y1 = std::max(y0 + 1, std::min(img.h, int(std::lround(bbx[i * 4 + 3]))));
        Image crop;
        crop.w = x1 - x0;
        crop.h = y1 - y0;
        crop.rgb.resize(size_t(crop.w) * crop.h * 3);
        for (int y = 0; y < crop.h; y++)
          memcpy(crop.rgb.data() + size_t(y) * crop.w * 3,
                 img.rgb.data() + (size_t(y + y0) * img.w + x0) * 3,
                 size_t(crop.w) * 3);
        crop.ok = true;
        img = std::move(crop);
      }
      const int m = std::max(img.h, img.w);
      int nh = img.h, nw = img.w;
      if (m != image_size && !(shrink_only && m < image_size)) {
        const float scale = float(image_size) / m;
        nh = std::max(1, int(std::lround(img.h * scale)));
        nw = std::max(1, int(std::lround(img.w * scale)));
      }
      nh = std::min(nh, out_h);
      nw = std::min(nw, out_w);
      if (filter == 1) {
        // Lanczos resizes into a u8 staging image (the PIL path also
        // round-trips u8), then normalizes from there if needed.
        if (as_u8) {
          resize_lanczos_into_u8(
              img, nh, nw,
              static_cast<uint8_t*>(out) + size_t(i) * out_h * out_w * 3,
              out_h, out_w);
        } else {
          std::vector<uint8_t> stage(size_t(nh) * nw * 3);
          resize_lanczos_into_u8(img, nh, nw, stage.data(), nh, nw);
          float* o = static_cast<float*>(out) + size_t(i) * out_h * out_w * 3;
          for (int y = 0; y < nh; y++)
            for (int x = 0; x < nw; x++)
              for (int c = 0; c < 3; c++)
                o[(size_t(y) * out_w + x) * 3 + c] =
                    (stage[(size_t(y) * nw + x) * 3 + c] / 255.0f - kMean[c]) /
                    kStd[c];
        }
      } else if (as_u8) {
        resize_into_u8(img, nh, nw,
                       static_cast<uint8_t*>(out) + size_t(i) * out_h * out_w * 3,
                       out_h, out_w);
      } else {
        resize_normalize_into(
            img, nh, nw,
            static_cast<float*>(out) + size_t(i) * out_h * out_w * 3,
            out_h, out_w);
      }
      sizes[i * 2] = nh;
      sizes[i * 2 + 1] = nw;
      ok.fetch_add(1);
    }
  };
  int nt = std::max(1, std::min(nthreads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; t++) threads.emplace_back(work);
  for (auto& t : threads) t.join();
  return ok.load();
}

// Bumped whenever exported signatures change; the Python loader rebuilds a
// stale .so automatically when the version doesn't match.
int irtpu_abi_version() { return 2; }

int irtpu_preprocess_batch(const char** paths, int n, int image_size,
                           float* out, int out_h, int out_w, int* sizes,
                           const float* bbx, int filter, int nthreads) {
  return process_batch(paths, n, image_size, out, /*as_u8=*/false, out_h,
                       out_w, sizes, bbx, filter, nthreads);
}

// uint8 variant: raw resized pixels, no normalization (done on device).
int irtpu_preprocess_batch_u8(const char** paths, int n, int image_size,
                              unsigned char* out, int out_h, int out_w,
                              int* sizes, const float* bbx, int filter,
                              int nthreads) {
  return process_batch(paths, n, image_size, out, /*as_u8=*/true, out_h,
                       out_w, sizes, bbx, filter, nthreads);
}

// Probe decoded dimensions without full preprocessing (for bucketing).
int irtpu_probe_size(const char* path, int* h, int* w) {
  Image img = decode_file(path);  // full decode; cached upstream if hot
  if (!img.ok) return 0;
  *h = img.h;
  *w = img.w;
  return 1;
}
}
