// mdeaug — native augmentation engine for the NYUD2/KITTI data pipeline.
//
// The per-sample PIL/numpy augmentation chain is the reference's data-loading
// hot spot (SURVEY.md §3: "PIL-based per-sample augmentation,
// dataloader.py:116-236"). This engine fuses the whole train-time chain —
// rotate (PIL-exact inverse-map sampling), depth rescale, crop, h-flip,
// gamma/brightness/color jitter, ImageNet normalize — into one pass per
// sample, parallelized across the batch with std::thread. Randomness stays in
// Python (parameters are inputs), so the numpy and native paths are
// bit-comparable and deterministic under the same seed.
//
// C ABI only; bound from Python via ctypes (no pybind11 dependency).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <setjmp.h>

namespace {

constexpr float kImagenetMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kImagenetStd[3] = {0.229f, 0.224f, 0.225f};

struct AugParams {
  // geometry
  float angle_deg;      // rotation angle (0 = skip)
  int32_t crop_x;       // crop origin in the rotated frame
  int32_t crop_y;
  int32_t do_flip;      // horizontal flip after crop
  // photometric (applied iff do_augment)
  int32_t do_augment;
  float gamma;
  float brightness;
  float color[3];
  float depth_scale;    // 1/1000 nyu, 1/256 kitti
};

inline float bilinear_u8(const uint8_t* src, int h, int w, int c, float y,
                         float x, int ch) {
  // zero-fill outside, PIL-style float bilinear on /255 values
  int y0 = (int)std::floor(y);
  int x0 = (int)std::floor(x);
  float fy = y - y0, fx = x - x0;
  float acc = 0.f;
  for (int dy = 0; dy < 2; ++dy) {
    int yy = y0 + dy;
    if (yy < 0 || yy >= h) continue;
    float wy = dy ? fy : 1.f - fy;
    for (int dx = 0; dx < 2; ++dx) {
      int xx = x0 + dx;
      if (xx < 0 || xx >= w) continue;
      float wx = dx ? fx : 1.f - fx;
      acc += wy * wx * (float)src[(yy * w + xx) * c + ch];
    }
  }
  return acc;
}

template <typename T>
inline T nearest_or_zero(const T* src, int h, int w, float y, float x) {
  int yy = (int)std::lround(y);
  int xx = (int)std::lround(x);
  if (yy < 0 || yy >= h || xx < 0 || xx >= w) return (T)0;
  return src[yy * w + xx];
}

// Inverse rotation map matching PIL.Image.rotate(angle, expand=False):
// out (x, y) -> in coords, centered, half-pixel offsets.
struct RotMap {
  float cos_t, sin_t, cx, cy;
  bool identity;
  RotMap(float angle_deg, int h, int w) {
    identity = angle_deg == 0.f;
    float th = angle_deg * (float)M_PI / 180.f;
    cos_t = std::cos(th);
    sin_t = std::sin(th);
    cx = w / 2.f;
    cy = h / 2.f;
  }
  inline void map(float xo, float yo, float* xi, float* yi) const {
    float dx = xo + 0.5f - cx;
    float dy = yo + 0.5f - cy;
    *xi = cos_t * dx - sin_t * dy + cx - 0.5f;
    *yi = sin_t * dx + cos_t * dy + cy - 0.5f;
  }
};

// gamma via a 2049-entry LUT: std::pow per pixel dominates the augment cost
// (~100ns x 700k channel values); the table costs 2k pows once per sample and
// linear interpolation keeps error < 1e-4 — invisible under the jitter noise.
struct GammaLUT {
  static constexpr int kN = 2048;
  float table[kN + 1];
  explicit GammaLUT(float gamma) {
    for (int i = 0; i <= kN; ++i)
      table[i] = std::pow((float)i / kN, gamma);
  }
  inline float operator()(float v) const {
    v = std::min(std::max(v, 0.f), 1.f) * kN;
    int i = (int)v;
    float f = v - i;
    return i >= kN ? table[kN] : table[i] * (1.f - f) + table[i + 1] * f;
  }
};

void augment_one(const uint8_t* rgb, const uint16_t* depth,
                 const int32_t* sem, const int32_t* ilab, const int32_t* iarea,
                 int in_h, int in_w, int out_h, int out_w,
                 const AugParams& p, float* out_img, float* out_depth,
                 int32_t* out_sem, int32_t* out_ilab, int32_t* out_iarea) {
  RotMap rot(p.angle_deg, in_h, in_w);
  GammaLUT gamma_lut(p.do_augment ? p.gamma : 1.0f);

  for (int oy = 0; oy < out_h; ++oy) {
    for (int ox = 0; ox < out_w; ++ox) {
      // flip -> crop -> rotate back to input coords
      int fx = p.do_flip ? (out_w - 1 - ox) : ox;
      float rx = (float)(fx + p.crop_x);
      float ry = (float)(oy + p.crop_y);
      float sx = rx, sy = ry;
      if (!rot.identity) rot.map(rx, ry, &sx, &sy);

      int out_idx = oy * out_w + ox;

      // image: bilinear, /255, photometric, normalize
      for (int ch = 0; ch < 3; ++ch) {
        float v;
        if (rot.identity) {
          int yy = (int)sy, xx = (int)sx;
          v = (yy >= 0 && yy < in_h && xx >= 0 && xx < in_w)
                  ? (float)rgb[(yy * in_w + xx) * 3 + ch]
                  : 0.f;
        } else {
          // PIL re-quantizes the rotated uint8 image; match its round-half-up
          v = std::floor(bilinear_u8(rgb, in_h, in_w, 3, sy, sx, ch) + 0.5f);
        }
        v *= (1.f / 255.f);
        if (p.do_augment) {
          v = gamma_lut(v) * p.brightness * p.color[ch];
          v = std::min(std::max(v, 0.f), 1.f);
        }
        out_img[out_idx * 3 + ch] = (v - kImagenetMean[ch]) / kImagenetStd[ch];
      }

      // depth: nearest + rescale
      uint16_t d = rot.identity
                       ? (((int)sy >= 0 && (int)sy < in_h && (int)sx >= 0 &&
                           (int)sx < in_w)
                              ? depth[(int)sy * in_w + (int)sx]
                              : 0)
                       : nearest_or_zero<uint16_t>(depth, in_h, in_w, sy, sx);
      out_depth[out_idx] = (float)d * p.depth_scale;

      if (sem && out_sem)
        out_sem[out_idx] = nearest_or_zero<int32_t>(sem, in_h, in_w, sy, sx);
      if (ilab && out_ilab)
        out_ilab[out_idx] = nearest_or_zero<int32_t>(ilab, in_h, in_w, sy, sx);
      if (iarea && out_iarea)
        out_iarea[out_idx] = nearest_or_zero<int32_t>(iarea, in_h, in_w, sy, sx);
    }
  }
}

// ------------------------------------------------------------ image decoding

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG file to RGB8. Returns true on success; out resized.
bool decode_jpeg_file(const char* path, std::vector<uint8_t>* out, int* h,
                      int* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize((size_t)(*h) * (*w) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + (size_t)cinfo.output_scanline * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// Decode a 16-bit (or 8-bit) grayscale PNG to uint16. NYUD2 sync_depth pngs
// are single-channel 16-bit.
bool decode_png16_file(const char* path, std::vector<uint16_t>* out, int* h,
                       int* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) {
    std::fclose(f);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  if (color != PNG_COLOR_TYPE_GRAY) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return false;
  }
  if (bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  png_read_update_info(png, info);
  out->resize((size_t)(*h) * (*w));
  std::vector<uint8_t> rowbuf(png_get_rowbytes(png, info));
  for (int y = 0; y < *h; ++y) {
    png_read_row(png, rowbuf.data(), nullptr);
    uint16_t* dst = out->data() + (size_t)y * (*w);
    if (bit_depth == 16) {
      for (int x = 0; x < *w; ++x)  // PNG is big-endian
        dst[x] = (uint16_t)((rowbuf[2 * x] << 8) | rowbuf[2 * x + 1]);
    } else {
      for (int x = 0; x < *w; ++x) dst[x] = rowbuf[x];
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  return true;
}

struct CropRect {
  int32_t x, y, w, h;  // pre-augment crop (NYU boundary / KITTI kb)
};

}  // namespace

extern "C" {

// Fused loader: file read + JPEG/PNG decode + pre-crop + rotate/crop/flip/
// jitter/normalize, one thread per sample. Cue maps (npy/npz-parsed in
// Python) arrive decoded at full frame and are cropped with the same rect.
// Returns the number of samples that failed to decode (their outputs are
// zero-filled).
int mdeaug_load_augment_batch(int batch,
                              const char** rgb_paths, const char** depth_paths,
                              const int32_t** sems, const int32_t** ilabs,
                              const int32_t** iareas,
                              const CropRect* rects, int out_h, int out_w,
                              const AugParams* params, float* out_img,
                              float* out_depth, int32_t* out_sem,
                              int32_t* out_ilab, int32_t* out_iarea,
                              int num_threads) {
  const size_t img_stride = (size_t)out_h * out_w * 3;
  const size_t map_stride = (size_t)out_h * out_w;
  std::atomic_int failures{0};

  auto work = [&](int b) {
    std::vector<uint8_t> rgb;
    std::vector<uint16_t> depth;
    int ih = 0, iw = 0, dh = 0, dw = 0;
    if (!decode_jpeg_file(rgb_paths[b], &rgb, &ih, &iw) ||
        !decode_png16_file(depth_paths[b], &depth, &dh, &dw) || dh != ih ||
        dw != iw) {
      failures.fetch_add(1);
      std::memset(out_img + b * img_stride, 0, img_stride * sizeof(float));
      std::memset(out_depth + b * map_stride, 0, map_stride * sizeof(float));
      return;
    }
    CropRect r = rects[b];
    if (r.w <= 0) {  // full frame
      r = {0, 0, iw, ih};
    }
    // crop views: build contiguous cropped buffers (small, cache-friendly)
    std::vector<uint8_t> rgb_c((size_t)r.h * r.w * 3);
    std::vector<uint16_t> depth_c((size_t)r.h * r.w);
    for (int y = 0; y < r.h; ++y) {
      std::memcpy(rgb_c.data() + (size_t)y * r.w * 3,
                  rgb.data() + ((size_t)(y + r.y) * iw + r.x) * 3,
                  (size_t)r.w * 3);
      std::memcpy(depth_c.data() + (size_t)y * r.w,
                  depth.data() + (size_t)(y + r.y) * iw + r.x,
                  (size_t)r.w * sizeof(uint16_t));
    }
    std::vector<int32_t> sem_c, ilab_c, iarea_c;
    auto crop_i32 = [&](const int32_t* src, std::vector<int32_t>* dst) {
      dst->resize((size_t)r.h * r.w);
      for (int y = 0; y < r.h; ++y)
        std::memcpy(dst->data() + (size_t)y * r.w,
                    src + (size_t)(y + r.y) * iw + r.x,
                    (size_t)r.w * sizeof(int32_t));
    };
    if (sems && sems[b]) crop_i32(sems[b], &sem_c);
    if (ilabs && ilabs[b]) crop_i32(ilabs[b], &ilab_c);
    if (iareas && iareas[b]) crop_i32(iareas[b], &iarea_c);

    augment_one(rgb_c.data(), depth_c.data(),
                sem_c.empty() ? nullptr : sem_c.data(),
                ilab_c.empty() ? nullptr : ilab_c.data(),
                iarea_c.empty() ? nullptr : iarea_c.data(), r.h, r.w, out_h,
                out_w, params[b], out_img + b * img_stride,
                out_depth + b * map_stride,
                out_sem ? out_sem + b * map_stride : nullptr,
                out_ilab ? out_ilab + b * map_stride : nullptr,
                out_iarea ? out_iarea + b * map_stride : nullptr);
  };

  if (num_threads <= 1 || batch == 1) {
    for (int b = 0; b < batch; ++b) work(b);
  } else {
    std::vector<std::thread> threads;
    std::atomic_int next{0};
    int nt = std::min(num_threads, batch);
    for (int t = 0; t < nt; ++t) {
      threads.emplace_back([&]() {
        int b;
        while ((b = next.fetch_add(1)) < batch) work(b);
      });
    }
    for (auto& th : threads) th.join();
  }
  return failures.load();
}

// Batch entry: arrays of per-sample pointers; null cue pointers are skipped.
// out_img is (B, out_h, out_w, 3) f32 NHWC, out_depth (B, out_h, out_w).
void mdeaug_augment_batch(int batch,
                          const uint8_t** rgbs, const uint16_t** depths,
                          const int32_t** sems, const int32_t** ilabs,
                          const int32_t** iareas,
                          const int32_t* in_hs, const int32_t* in_ws,
                          int out_h, int out_w, const AugParams* params,
                          float* out_img, float* out_depth, int32_t* out_sem,
                          int32_t* out_ilab, int32_t* out_iarea,
                          int num_threads) {
  const size_t img_stride = (size_t)out_h * out_w * 3;
  const size_t map_stride = (size_t)out_h * out_w;

  auto work = [&](int b) {
    augment_one(rgbs[b], depths[b],
                sems ? sems[b] : nullptr,
                ilabs ? ilabs[b] : nullptr,
                iareas ? iareas[b] : nullptr,
                in_hs[b], in_ws[b], out_h, out_w, params[b],
                out_img + b * img_stride, out_depth + b * map_stride,
                out_sem ? out_sem + b * map_stride : nullptr,
                out_ilab ? out_ilab + b * map_stride : nullptr,
                out_iarea ? out_iarea + b * map_stride : nullptr);
  };

  if (num_threads <= 1 || batch == 1) {
    for (int b = 0; b < batch; ++b) work(b);
    return;
  }
  std::vector<std::thread> threads;
  std::atomic_int next{0};
  int nt = std::min(num_threads, batch);
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&]() {
      int b;
      while ((b = next.fetch_add(1)) < batch) work(b);
    });
  }
  for (auto& th : threads) th.join();
}

int mdeaug_version() { return 1; }

}  // extern "C"
