// Native batch image loader for the TPU input pipeline.
//
// The reference feeds its GPU from torch DataLoader workers doing PIL decode
// (src/datasets/classification.py:176-181). Feeding a TPU pod slice needs
// more host throughput than Python/PIL delivers, so this library does the
// host-side hot path in C++: PNG/JPEG decode (libpng/libjpeg), grayscale
// conversion, bilinear resize, and direct writes into a caller-owned batch
// buffer, parallelized over a pthread pool. Exposed as a C ABI consumed from
// Python via ctypes (nextgen_uia_tpu/data/native_loader.py).
//
// API: decode_batch(paths, n, img_size, gray, out) fills out[n, S, S, C]
// (C = 1 for grayscale, 3 otherwise), uint8. Returns the number of images
// decoded successfully; failed slots are zero-filled and reported via the
// status array.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <atomic>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> data;  // HWC, C in {1, 3}
  int w = 0, h = 0, c = 0;
};

bool decode_png(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  uint8_t header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_packing(png);
  png_set_strip_alpha(png);
  int color = png_get_color_type(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && png_get_bit_depth(png, info) < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = png_get_channels(png, info);
  out->data.resize(size_t(out->w) * out->h * out->c);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * out->c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return out->c == 1 || out->c == 3;
}

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

bool decode_jpeg(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = cinfo.output_components;
  out->data.resize(size_t(out->w) * out->h * out->c);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data.data() + size_t(cinfo.output_scanline) * out->w * out->c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return out->c == 1 || out->c == 3;
}

bool decode_any(const char* path, Image* out) {
  const char* dot = strrchr(path, '.');
  bool is_png = dot && (!strcmp(dot, ".png") || !strcmp(dot, ".PNG"));
  if (is_png ? decode_png(path, out) : decode_jpeg(path, out)) return true;
  // extension lied — try the other decoder
  return is_png ? decode_jpeg(path, out) : decode_png(path, out);
}

void to_gray(Image* img) {
  if (img->c == 1) return;
  std::vector<uint8_t> g(size_t(img->w) * img->h);
  const uint8_t* s = img->data.data();
  // PIL "L" weights: L = R*299/1000 + G*587/1000 + B*114/1000
  for (size_t i = 0; i < g.size(); ++i) {
    const uint8_t* p = s + i * 3;
    g[i] = uint8_t((p[0] * 299u + p[1] * 587u + p[2] * 114u) / 1000u);
  }
  img->data.swap(g);
  img->c = 1;
}

// PIL-compatible separable resampling (Pillow's antialiased convolution:
// adaptive filter support scaled by the downscale ratio, normalized weights).
// filter_id: 0 = bilinear (triangle, support 1), 1 = bicubic (Keys a=-0.5,
// support 2) — bicubic is PIL's Image.resize default.

static float filt_bilinear(float x) {
  x = x < 0 ? -x : x;
  return x < 1.0f ? 1.0f - x : 0.0f;
}

static float filt_bicubic(float x) {
  const float a = -0.5f;
  x = x < 0 ? -x : x;
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

struct Coeffs {
  std::vector<int> bounds;    // [out] first source index
  std::vector<int> counts;    // [out] taps
  std::vector<float> weights; // [out][ksize]
  int ksize = 0;
};

static Coeffs precompute(int in_size, int out_size, int filter_id) {
  float support = filter_id == 1 ? 2.0f : 1.0f;
  float (*filt)(float) = filter_id == 1 ? filt_bicubic : filt_bilinear;
  float scale = float(in_size) / out_size;
  float fscale = scale < 1.0f ? 1.0f : scale;
  float radius = support * fscale;
  Coeffs co;
  co.ksize = int(radius) * 2 + 2;
  co.bounds.resize(out_size);
  co.counts.resize(out_size);
  co.weights.assign(size_t(out_size) * co.ksize, 0.0f);
  for (int x = 0; x < out_size; ++x) {
    float center = (x + 0.5f) * scale;
    int xmin = int(center - radius + 0.5f);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + radius + 0.5f);
    if (xmax > in_size) xmax = in_size;
    int n = xmax - xmin;
    float* w = co.weights.data() + size_t(x) * co.ksize;
    float total = 0.0f;
    for (int i = 0; i < n; ++i) {
      w[i] = filt((xmin + i - center + 0.5f) / fscale);
      total += w[i];
    }
    if (total != 0.0f)
      for (int i = 0; i < n; ++i) w[i] /= total;
    co.bounds[x] = xmin;
    co.counts[x] = n;
  }
  return co;
}

static uint8_t clamp_u8(float v) {
  int i = int(v + 0.5f);
  return uint8_t(i < 0 ? 0 : (i > 255 ? 255 : i));
}

void resize_pil(const Image& src, int S, uint8_t* dst, int filter_id) {
  const int c = src.c;
  Coeffs cx = precompute(src.w, S, filter_id);
  Coeffs cy = precompute(src.h, S, filter_id);

  // horizontal pass: [h, w, c] -> [h, S, c]. PIL's 8-bit path quantizes the
  // intermediate rows back to uint8 (ImagingResampleHorizontal_8bpc), so we
  // do too — float intermediates would diverge where bicubic lobes clip.
  std::vector<uint8_t> mid(size_t(src.h) * S * c);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* row = src.data.data() + size_t(y) * src.w * c;
    uint8_t* orow = mid.data() + size_t(y) * S * c;
    for (int x = 0; x < S; ++x) {
      const float* w = cx.weights.data() + size_t(x) * cx.ksize;
      int x0 = cx.bounds[x], n = cx.counts[x];
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.0f;
        for (int i = 0; i < n; ++i) acc += row[(x0 + i) * c + ch] * w[i];
        orow[x * c + ch] = clamp_u8(acc);
      }
    }
  }
  // vertical pass: [h, S, c] -> [S, S, c]
  for (int y = 0; y < S; ++y) {
    const float* w = cy.weights.data() + size_t(y) * cy.ksize;
    int y0 = cy.bounds[y], n = cy.counts[y];
    uint8_t* orow = dst + size_t(y) * S * c;
    for (int x = 0; x < S * c; ++x) {
      float acc = 0.0f;
      for (int i = 0; i < n; ++i) acc += mid[size_t(y0 + i) * S * c + x] * w[i];
      orow[x] = clamp_u8(acc);
    }
  }
}

}  // namespace

extern "C" {

// Fills out[n, S, S, C] uint8. gray!=0 -> C=1 (grayscale); else C=3 (gray
// inputs replicated). filter_id: 0 bilinear, 1 bicubic (PIL resize default).
// status[n]: 1 ok, 0 failed (slot zero-filled). Returns successful count.
int decode_batch_f(const char** paths, int n, int img_size, int gray,
                   int filter_id, uint8_t* out, uint8_t* status,
                   int num_threads) {
  const int C = gray ? 1 : 3;
  const size_t stride = size_t(img_size) * img_size * C;
  std::atomic<int> next(0), ok(0);
  int hw = int(std::thread::hardware_concurrency());
  int nt = num_threads > 0 ? num_threads : (hw > 0 ? hw : 4);
  if (nt > n) nt = n > 0 ? n : 1;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image img;
      uint8_t* dst = out + stride * i;
      if (!decode_any(paths[i], &img)) {
        memset(dst, 0, stride);
        status[i] = 0;
        continue;
      }
      if (gray) {
        to_gray(&img);
        resize_pil(img, img_size, dst, filter_id);
      } else {
        if (img.c == 1) {
          std::vector<uint8_t> tmp(size_t(img_size) * img_size);
          resize_pil(img, img_size, tmp.data(), filter_id);
          for (size_t p = 0; p < tmp.size(); ++p) {
            dst[p * 3] = dst[p * 3 + 1] = dst[p * 3 + 2] = tmp[p];
          }
        } else {
          resize_pil(img, img_size, dst, filter_id);
        }
      }
      status[i] = 1;
      ok.fetch_add(1);
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// Back-compat entry: bicubic (PIL resize default).
int decode_batch(const char** paths, int n, int img_size, int gray,
                 uint8_t* out, uint8_t* status, int num_threads) {
  return decode_batch_f(paths, n, img_size, gray, 1, out, status, num_threads);
}

}  // extern "C"
