// Native data-loader: multithreaded JPEG/PNG decode + bilinear resize +
// center crop + normalize + h-flip, assembling NHWC float32 batches.
//
// This is the TPU build's native input pipeline — the runtime-side
// counterpart of the reference's torch DataLoader + torchvision transform
// stack (reference: lora_diffusion/dataset.py:126-139, torchvision C++
// kernels).  The Python datasets pick captions/masks; pixel work and batch
// assembly run here off the GIL so the host never stalls the device feed.
//
// C ABI (ctypes):
//   dft_decode_rgb(path, &w, &h) -> uint8* (caller frees via dft_free)
//   dft_load_one(path, size, flip, out) -> 0 on success
//       out: float32 [size*size*3], short-side bilinear resize -> center
//       crop -> /255 -> *2-1, optional horizontal flip
//   dft_load_batch(paths, n, size, flips, out, n_threads) -> 0 on success
//       out: float32 [n*size*size*3]; decodes in a thread pool
//   dft_version() -> int

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

uint8_t* decode_jpeg(FILE* f, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  // volatile: modified between setjmp and longjmp (C longjmp semantics)
  uint8_t* volatile out = nullptr;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    free(out);
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out = static_cast<uint8_t*>(malloc(size_t(*w) * *h * 3));
  if (!out) {  // absurd claimed dimensions: fail per-image, don't segfault
    jpeg_destroy_decompress(&cinfo);
    return nullptr;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return out;
}

uint8_t* decode_png(FILE* f, int* w, int* h) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return nullptr;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return nullptr;
  }
  // volatile raw pointers only: C++ objects with destructors must not be
  // mutated between setjmp and longjmp (indeterminate after the jump)
  uint8_t* volatile out = nullptr;
  png_bytep* volatile rows = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    free(rows);
    free(out);
    return nullptr;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  // drop alpha: composite over black is wrong for photos, PIL converts by
  // dropping the channel for "RGB" — match that
  if (color & PNG_COLOR_MASK_ALPHA || png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out = static_cast<uint8_t*>(malloc(size_t(*w) * *h * 3));
  rows = static_cast<png_bytep*>(malloc(size_t(*h) * sizeof(png_bytep)));
  if (!out || !rows) {
    png_destroy_read_struct(&png, &info, nullptr);
    free(rows);
    free(out);
    return nullptr;
  }
  for (int y = 0; y < *h; ++y) rows[y] = out + size_t(y) * *w * 3;
  png_read_image(png, rows);
  png_destroy_read_struct(&png, &info, nullptr);
  free(rows);
  return out;
}

// Triangle-filter resampling matching Pillow's BILINEAR semantics: filter
// support scales with the downscale factor (antialiasing), separable
// horizontal-then-vertical passes with per-output-pixel weight tables.
struct ResampleTable {
  std::vector<int> xmin, xsize;
  std::vector<float> weights;  // per-output-pixel, padded to max_taps
  int max_taps = 0;
};

inline ResampleTable build_table(int in_size, int out_size) {
  ResampleTable t;
  const double scale = double(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;  // triangle filter support = 1
  t.max_taps = int(std::ceil(support)) * 2 + 1;
  t.xmin.resize(out_size);
  t.xsize.resize(out_size);
  t.weights.assign(size_t(out_size) * t.max_taps, 0.0f);
  for (int x = 0; x < out_size; ++x) {
    double center = (x + 0.5) * scale;
    int xlo = std::max(0, int(center - support + 0.5));
    int xhi = std::min(in_size, int(center + support + 0.5));
    double total = 0.0;
    for (int i = xlo; i < xhi; ++i) {
      double w = 1.0 - std::abs((i - center + 0.5) / filterscale);
      if (w < 0) w = 0;
      t.weights[size_t(x) * t.max_taps + (i - xlo)] = float(w);
      total += w;
    }
    if (total > 0)
      for (int i = 0; i < xhi - xlo; ++i)
        t.weights[size_t(x) * t.max_taps + i] /= float(total);
    t.xmin[x] = xlo;
    t.xsize[x] = xhi - xlo;
  }
  return t;
}

inline void bilinear_resize(const uint8_t* src, int sw, int sh,
                            uint8_t* dst, int dw, int dh) {
  ResampleTable tx = build_table(sw, dw);
  ResampleTable ty = build_table(sh, dh);

  // horizontal pass: (sh, sw) -> (sh, dw), float intermediate
  std::vector<float> tmp(size_t(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + size_t(y) * sw * 3;
    float* orow = tmp.data() + size_t(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float* w = &tx.weights[size_t(x) * tx.max_taps];
      int x0 = tx.xmin[x], n = tx.xsize[x];
      float r = 0, g = 0, b = 0;
      for (int i = 0; i < n; ++i) {
        const uint8_t* p = row + size_t(x0 + i) * 3;
        r += w[i] * p[0];
        g += w[i] * p[1];
        b += w[i] * p[2];
      }
      orow[x * 3 + 0] = r;
      orow[x * 3 + 1] = g;
      orow[x * 3 + 2] = b;
    }
  }
  // vertical pass: (sh, dw) -> (dh, dw)
  for (int y = 0; y < dh; ++y) {
    const float* w = &ty.weights[size_t(y) * ty.max_taps];
    int y0 = ty.xmin[y], n = ty.xsize[y];
    uint8_t* orow = dst + size_t(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      float r = 0, g = 0, b = 0;
      for (int i = 0; i < n; ++i) {
        const float* p = tmp.data() + (size_t(y0 + i) * dw + x) * 3;
        r += w[i] * p[0];
        g += w[i] * p[1];
        b += w[i] * p[2];
      }
      orow[x * 3 + 0] = uint8_t(std::clamp(r + 0.5f, 0.0f, 255.0f));
      orow[x * 3 + 1] = uint8_t(std::clamp(g + 0.5f, 0.0f, 255.0f));
      orow[x * 3 + 2] = uint8_t(std::clamp(b + 0.5f, 0.0f, 255.0f));
    }
  }
}

int load_one_impl(const char* path, int size, int flip, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  int w = 0, h = 0;
  uint8_t* rgb = nullptr;
  if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    rgb = decode_png(f, &w, &h);
  } else if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    rgb = decode_jpeg(f, &w, &h);
  }
  fclose(f);
  if (!rgb) return 2;

  // short-side resize to `size`, keeping aspect; round-half-even matches
  // the Python path's round() (banker's rounding)
  int nw, nh;
  if (w <= h) {
    nw = size;
    nh = std::max(size, int(std::nearbyint(double(h) * size / w)));
  } else {
    nh = size;
    nw = std::max(size, int(std::nearbyint(double(w) * size / h)));
  }
  std::vector<uint8_t> resized(size_t(nw) * nh * 3);
  bilinear_resize(rgb, w, h, resized.data(), nw, nh);
  free(rgb);

  // center crop + normalize + optional flip
  int left = (nw - size) / 2, top = (nh - size) / 2;
  for (int y = 0; y < size; ++y) {
    for (int x = 0; x < size; ++x) {
      int sx_ = left + (flip ? (size - 1 - x) : x);
      const uint8_t* p = &resized[(size_t(top + y) * nw + sx_) * 3];
      float* q = &out[(size_t(y) * size + x) * 3];
      // exact op sequence of data.dataset.to_normalized_array
      // ((v/255)*2-1, each step rounded once in float32): bit-identity
      // lets collate's uint8 requantization round-trip native batches
      q[0] = p[0] / 255.0f * 2.0f - 1.0f;
      q[1] = p[1] / 255.0f * 2.0f - 1.0f;
      q[2] = p[2] / 255.0f * 2.0f - 1.0f;
    }
  }
  return 0;
}

}  // namespace

extern "C" {

int dft_version() { return 1; }

void dft_free(void* p) { free(p); }

uint8_t* dft_decode_rgb(const char* path, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  uint8_t* rgb = nullptr;
  if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    rgb = decode_png(f, w, h);
  } else if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    rgb = decode_jpeg(f, w, h);
  }
  fclose(f);
  return rgb;
}

// C++ exceptions (e.g. std::bad_alloc from an extreme-aspect resize buffer)
// must not cross the C ABI into ctypes or escape into std::thread (both
// terminate the host process) — convert to a per-image error code so the
// Python side can fall back to PIL.
int load_one_noexcept(const char* path, int size, int flip,
                      float* out) noexcept {
  try {
    return load_one_impl(path, size, flip, out);
  } catch (...) {
    return 3;
  }
}

int dft_load_one(const char* path, int size, int flip, float* out) {
  return load_one_noexcept(path, size, flip, out);
}

int dft_load_batch(const char** paths, int n, int size, const int* flips,
                   float* out, int n_threads) {
  if (n_threads <= 0)
    n_threads = std::max(1u, std::thread::hardware_concurrency());
  n_threads = std::min(n_threads, n);
  std::atomic<int> next{0};
  std::atomic<int> status{0};
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int rc = load_one_noexcept(paths[i], size, flips ? flips[i] : 0,
                                 out + size_t(i) * size * size * 3);
      if (rc != 0) status.store(rc);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return status.load();
}

}  // extern "C"
