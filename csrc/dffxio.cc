// dffxio — native host-side data-path kernels for the dffx input pipeline.
//
// The reference delegates its loader hot path (uint8 -> float normalize,
// padding, layout transpose) to numpy inside torch DataLoader workers
// (test_Dataloader.py:36,126-141).  Here it is a small C++ library driven
// through ctypes: multithreaded, SIMD-friendly inner loops, one pass over the
// pixels, writing directly into the padded NHWC destination the TPU transfer
// expects.  Falls back to numpy transparently when the .so is absent
// (dffx/data/native.py).
//
// Build: make -C csrc   (produces libdffxio.so)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// x / 127.5 - 1 over n elements.
void dffxio_normalize_u8(const uint8_t* src, float* dst, int64_t n) {
  static float lut[256];
  static std::atomic<bool> lut_ready{false};
  if (!lut_ready.load(std::memory_order_acquire)) {
    for (int i = 0; i < 256; ++i) lut[i] = static_cast<float>(i) / 127.5f - 1.0f;
    lut_ready.store(true, std::memory_order_release);
  }
  for (int64_t i = 0; i < n; ++i) dst[i] = lut[src[i]];
}

// Focal-stack loader hot path, fused:
//   src: (N, H, W, C) uint8 slices
//   dst: (N, Hp, Wp, C) float32, normalized x/127.5-1, padded bottom/right
//        with `pad_value` (Hp/Wp are the x32-padded sizes).
// Parallelized over slices (the decoders upstream release the GIL too).
void dffxio_normalize_pad_stack(const uint8_t* src, float* dst, int64_t n,
                                int64_t h, int64_t w, int64_t c, int64_t hp,
                                int64_t wp, float pad_value, int threads) {
  float lut[256];
  for (int i = 0; i < 256; ++i) lut[i] = static_cast<float>(i) / 127.5f - 1.0f;

  auto do_slice = [&](int64_t s) {
    const uint8_t* sp = src + s * h * w * c;
    float* dp = dst + s * hp * wp * c;
    for (int64_t y = 0; y < h; ++y) {
      const uint8_t* row = sp + y * w * c;
      float* out = dp + y * wp * c;
      for (int64_t i = 0; i < w * c; ++i) out[i] = lut[row[i]];
      std::fill(out + w * c, out + wp * c, pad_value);
    }
    for (int64_t y = h; y < hp; ++y)
      std::fill(dp + y * wp * c, dp + (y + 1) * wp * c, pad_value);
  };

  if (threads <= 1 || n == 1) {
    for (int64_t s = 0; s < n; ++s) do_slice(s);
    return;
  }
  std::atomic<int64_t> next{0};
  std::vector<std::thread> pool;
  int nthreads = std::min<int64_t>(threads, n);
  for (int t = 0; t < nthreads; ++t) {
    pool.emplace_back([&]() {
      for (int64_t s = next.fetch_add(1); s < n; s = next.fetch_add(1))
        do_slice(s);
    });
  }
  for (auto& th : pool) th.join();
}

// float32 variant (e.g. EXR-decoded slices that are already float).
void dffxio_normalize_pad_stack_f32(const float* src, float* dst, int64_t n,
                                    int64_t h, int64_t w, int64_t c, int64_t hp,
                                    int64_t wp, float pad_value, int threads) {
  auto do_slice = [&](int64_t s) {
    const float* sp = src + s * h * w * c;
    float* dp = dst + s * hp * wp * c;
    for (int64_t y = 0; y < h; ++y) {
      const float* row = sp + y * w * c;
      float* out = dp + y * wp * c;
      for (int64_t i = 0; i < w * c; ++i) out[i] = row[i] / 127.5f - 1.0f;
      std::fill(out + w * c, out + wp * c, pad_value);
    }
    for (int64_t y = h; y < hp; ++y)
      std::fill(dp + y * wp * c, dp + (y + 1) * wp * c, pad_value);
  };
  std::atomic<int64_t> next{0};
  std::vector<std::thread> pool;
  int nthreads = std::max<int64_t>(1, std::min<int64_t>(threads, n));
  for (int t = 0; t < nthreads; ++t)
    pool.emplace_back([&]() {
      for (int64_t s = next.fetch_add(1); s < n; s = next.fetch_add(1))
        do_slice(s);
    });
  for (auto& th : pool) th.join();
}

// (H, W, C, N) float64/uint8 cv2-style stacks -> (N, H, W, C) float32 with
// normalize, the DefocusNet/Middlebury layout conversion in one pass.
void dffxio_hwcn_to_nhwc_normalize(const double* src, float* dst, int64_t h,
                                   int64_t w, int64_t c, int64_t n,
                                   int threads) {
  auto do_slice = [&](int64_t s) {
    float* dp = dst + s * h * w * c;
    for (int64_t y = 0; y < h; ++y)
      for (int64_t x = 0; x < w; ++x)
        for (int64_t ch = 0; ch < c; ++ch)
          dp[(y * w + x) * c + ch] = static_cast<float>(
              src[((y * w + x) * c + ch) * n + s] / 127.5 - 1.0);
  };
  std::atomic<int64_t> next{0};
  std::vector<std::thread> pool;
  int nthreads = std::max<int64_t>(1, std::min<int64_t>(threads, n));
  for (int t = 0; t < nthreads; ++t)
    pool.emplace_back([&]() {
      for (int64_t s = next.fetch_add(1); s < n; s = next.fetch_add(1))
        do_slice(s);
    });
  for (auto& th : pool) th.join();
}

// ---------------------------------------------------------------------------
// Image decode (JPEG via libjpeg, PNG via libpng) — the cv2-free IO path
// (ROADMAP item: drop the OpenCV dependency from the loaders).  Output is
// 8-bit BGR interleaved, matching cv2.imread's channel order so the loaders
// keep byte parity with the reference.  Two-phase API: *_info reads the
// header, *_decode fills a caller-allocated (h * w * 3) buffer.
// Returns 0 on success, negative on error.
// ---------------------------------------------------------------------------

}  // extern "C"

#include <csetjmp>
#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

}  // namespace

extern "C" {

int dffxio_jpeg_info(const uint8_t* buf, int64_t len, int64_t* h, int64_t* w) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// dst: (h, w, 3) uint8 BGR.
int dffxio_jpeg_decode(const uint8_t* buf, int64_t len, uint8_t* dst,
                       int64_t h, int64_t w) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
#ifdef JCS_EXTENSIONS
  cinfo.out_color_space = JCS_EXT_BGR;  // libjpeg-turbo: decode straight to BGR
#else
  cinfo.out_color_space = JCS_RGB;
#endif
  jpeg_start_decompress(&cinfo);
  if (cinfo.output_height != static_cast<JDIMENSION>(h) ||
      cinfo.output_width != static_cast<JDIMENSION>(w) ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  std::vector<uint8_t> rowbuf(static_cast<size_t>(w) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = dst + static_cast<int64_t>(cinfo.output_scanline) * w * 3;
#ifdef JCS_EXTENSIONS
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
#else
    JSAMPROW rows[1] = {rowbuf.data()};
    jpeg_read_scanlines(&cinfo, rows, 1);
    for (int64_t x = 0; x < w; ++x) {  // RGB -> BGR
      row[x * 3 + 0] = rowbuf[x * 3 + 2];
      row[x * 3 + 1] = rowbuf[x * 3 + 1];
      row[x * 3 + 2] = rowbuf[x * 3 + 0];
    }
#endif
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int dffxio_png_info(const uint8_t* buf, int64_t len, int64_t* h, int64_t* w) {
  png_image img;
  std::memset(&img, 0, sizeof img);
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&img, buf, static_cast<size_t>(len)))
    return -1;
  // Alpha (incl. palette+tRNS) and 16-bit PNGs decode differently from
  // cv2.imread (libpng composites/rescales; cv2 drops alpha, scales 16→8
  // its own way) — report them unsupported so the caller's cv2 fallback
  // keeps byte parity, mirroring the JPEG EXIF-orientation guard.
  if (img.format & (PNG_FORMAT_FLAG_ALPHA | PNG_FORMAT_FLAG_LINEAR)) {
    png_image_free(&img);
    return -4;
  }
  *h = img.height;
  *w = img.width;
  png_image_free(&img);
  return 0;
}

// dst: (h, w, 3) uint8 BGR (libpng's simplified API converts directly).
int dffxio_png_decode(const uint8_t* buf, int64_t len, uint8_t* dst,
                      int64_t h, int64_t w) {
  png_image img;
  std::memset(&img, 0, sizeof img);
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&img, buf, static_cast<size_t>(len)))
    return -1;
  if (img.height != static_cast<png_uint_32>(h) ||
      img.width != static_cast<png_uint_32>(w)) {
    png_image_free(&img);
    return -3;
  }
  if (img.format & (PNG_FORMAT_FLAG_ALPHA | PNG_FORMAT_FLAG_LINEAR)) {
    png_image_free(&img);
    return -4;  // see dffxio_png_info — cv2 parity requires the fallback
  }
  img.format = PNG_FORMAT_BGR;
  if (!png_image_finish_read(&img, nullptr, dst, 0, nullptr)) {
    png_image_free(&img);
    return -2;
  }
  return 0;
}

int dffxio_version() { return 3; }

}  // extern "C"
