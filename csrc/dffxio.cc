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

// ---------------------------------------------------------------------------
// cv2.IMREAD_UNCHANGED-semantics decode (PNG via the full libpng API, TIFF via
// libtiff) — covers the reference's raw GT reads: Smartphone merged-depth PNGs
// (train_Dataloader.py:341) and the DefocusNet `All.tif` focal stacks
// (train_Dataloader.py:84,104).  The *_info functions report a `kind` code the
// Python side maps to a dtype/shape; anything cv2 would decode differently
// (palette, alpha, interlace, exotic sample layouts) reports unsupported so
// the caller's cv2 fallback keeps byte parity.
//   kind: 1 = uint8 gray (H,W)    2 = uint16 gray (H,W)   3 = float32 gray (H,W)
//         4 = uint8 BGR (H,W,3)   5 = uint16 BGR (H,W,3)
// ---------------------------------------------------------------------------

}  // extern "C"

#include <tiffio.h>

namespace {

// libtiff reads through a caller-owned memory cursor (no tmp files).
struct TiffMem {
  const uint8_t* buf;
  toff_t len;
  toff_t pos;
};

tmsize_t tiff_read(thandle_t h, void* out, tmsize_t n) {
  TiffMem* m = reinterpret_cast<TiffMem*>(h);
  tmsize_t avail = static_cast<tmsize_t>(m->len - m->pos);
  if (n > avail) n = avail;
  std::memcpy(out, m->buf + m->pos, static_cast<size_t>(n));
  m->pos += n;
  return n;
}
tmsize_t tiff_write(thandle_t, void*, tmsize_t) { return 0; }
toff_t tiff_seek(thandle_t h, toff_t off, int whence) {
  TiffMem* m = reinterpret_cast<TiffMem*>(h);
  toff_t base = whence == SEEK_CUR ? m->pos : whence == SEEK_END ? m->len : 0;
  m->pos = base + off;
  return m->pos;
}
int tiff_close(thandle_t) { return 0; }
toff_t tiff_size(thandle_t h) { return reinterpret_cast<TiffMem*>(h)->len; }

TIFF* tiff_open_mem(TiffMem* m) {
  // one-time: silence libtiff's stderr chatter (errors surface as nullptrs /
  // failed reads; the Python caller falls back to cv2)
  static bool quiet = [] {
    TIFFSetErrorHandler(nullptr);
    TIFFSetWarningHandler(nullptr);
    return true;
  }();
  (void)quiet;
  return TIFFClientOpen("mem", "rm", reinterpret_cast<thandle_t>(m), tiff_read,
                        tiff_write, tiff_seek, tiff_close, tiff_size, nullptr,
                        nullptr);
}

// Classify the first directory into a `kind` (see table above); -4 when cv2
// parity can't be guaranteed natively.
int tiff_kind(TIFF* tif, int64_t* h, int64_t* w) {
  uint32_t ih = 0, iw = 0;
  uint16_t bps = 8, spp = 1, fmt = SAMPLEFORMAT_UINT, planar = PLANARCONFIG_CONTIG;
  if (!TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &ih) ||
      !TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &iw))
    return -2;
  TIFFGetFieldDefaulted(tif, TIFFTAG_BITSPERSAMPLE, &bps);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLESPERPIXEL, &spp);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLEFORMAT, &fmt);
  TIFFGetFieldDefaulted(tif, TIFFTAG_PLANARCONFIG, &planar);
  *h = ih;
  *w = iw;
  uint16_t photo = PHOTOMETRIC_MINISBLACK;
  TIFFGetFieldDefaulted(tif, TIFFTAG_PHOTOMETRIC, &photo);
  if (photo == PHOTOMETRIC_PALETTE) return -4;
  if (spp == 1) {
    if (bps == 8 && fmt == SAMPLEFORMAT_UINT) return 1;
    if (bps == 16 && fmt == SAMPLEFORMAT_UINT) return 2;
    if (bps == 32 && fmt == SAMPLEFORMAT_IEEEFP) return 3;
    return -4;
  }
  if (spp == 3 && bps == 8 && fmt == SAMPLEFORMAT_UINT &&
      planar == PLANARCONFIG_CONTIG)
    return 4;
  if (spp == 3 && bps == 16 && fmt == SAMPLEFORMAT_UINT &&
      planar == PLANARCONFIG_CONTIG)
    return 5;
  return -4;
}

}  // namespace

extern "C" {

int dffxio_tiff_info(const uint8_t* buf, int64_t len, int64_t* h, int64_t* w,
                     int64_t* kind) {
  TiffMem m{buf, static_cast<toff_t>(len), 0};
  TIFF* tif = tiff_open_mem(&m);
  if (!tif) return -1;
  int k = tiff_kind(tif, h, w);
  TIFFClose(tif);
  if (k < 0) return k;
  *kind = k;
  return 0;
}

// cv2.imread (IMREAD_COLOR) semantics: (h, w, 3) uint8 BGR.  Only 8-bit
// gray/RGB directories (kinds 1 and 4) — exactly the cases where OpenCV's own
// TIFF decoder also routes through libtiff's RGBA reader, so values match.
int dffxio_tiff_decode_bgr(const uint8_t* buf, int64_t len, uint8_t* dst,
                           int64_t h, int64_t w) {
  TiffMem m{buf, static_cast<toff_t>(len), 0};
  TIFF* tif = tiff_open_mem(&m);
  if (!tif) return -1;
  int64_t ih, iw;
  int k = tiff_kind(tif, &ih, &iw);
  if ((k != 1 && k != 4) || ih != h || iw != w) {
    TIFFClose(tif);
    return -3;
  }
  std::vector<uint32_t> rgba(static_cast<size_t>(h) * w);
  if (!TIFFReadRGBAImageOriented(tif, static_cast<uint32_t>(w),
                                 static_cast<uint32_t>(h), rgba.data(),
                                 ORIENTATION_TOPLEFT, 0)) {
    TIFFClose(tif);
    return -2;
  }
  TIFFClose(tif);
  for (int64_t i = 0; i < h * w; ++i) {
    uint32_t px = rgba[static_cast<size_t>(i)];
    dst[i * 3 + 0] = static_cast<uint8_t>(TIFFGetB(px));
    dst[i * 3 + 1] = static_cast<uint8_t>(TIFFGetG(px));
    dst[i * 3 + 2] = static_cast<uint8_t>(TIFFGetR(px));
  }
  return 0;
}

// IMREAD_UNCHANGED semantics.  `dst` is a caller-allocated buffer of the
// dtype/shape `kind` implies; `kind` must equal what dffxio_tiff_info
// reported (re-verified here).
int dffxio_tiff_decode_raw(const uint8_t* buf, int64_t len, void* dst,
                           int64_t h, int64_t w, int64_t kind) {
  TiffMem m{buf, static_cast<toff_t>(len), 0};
  TIFF* tif = tiff_open_mem(&m);
  if (!tif) return -1;
  int64_t ih, iw;
  int k = tiff_kind(tif, &ih, &iw);
  if (k != kind || ih != h || iw != w) {
    TIFFClose(tif);
    return -3;
  }
  const int64_t bytes_per_px = kind == 1 ? 1 : kind == 2 ? 2
                               : kind == 3 ? 4 : kind == 4 ? 3 : 6;
  if (TIFFScanlineSize64(tif) != static_cast<uint64_t>(w * bytes_per_px)) {
    TIFFClose(tif);
    return -5;
  }
  uint8_t* out = static_cast<uint8_t*>(dst);
  for (int64_t y = 0; y < h; ++y) {
    if (TIFFReadScanline(tif, out + y * w * bytes_per_px,
                         static_cast<uint32_t>(y)) < 0) {
      TIFFClose(tif);
      return -2;
    }
  }
  TIFFClose(tif);
  if (kind == 4 || kind == 5) {  // RGB -> BGR, matching cv2
    if (kind == 4) {
      for (int64_t i = 0; i < h * w; ++i)
        std::swap(out[i * 3 + 0], out[i * 3 + 2]);
    } else {
      uint16_t* o16 = static_cast<uint16_t*>(dst);
      for (int64_t i = 0; i < h * w; ++i)
        std::swap(o16[i * 3 + 0], o16[i * 3 + 2]);
    }
  }
  return 0;
}

}  // extern "C"

namespace {

struct PngMem {
  const uint8_t* buf;
  size_t len;
  size_t pos;
};

void png_mem_read(png_structp p, png_bytep out, png_size_t n) {
  PngMem* m = reinterpret_cast<PngMem*>(png_get_io_ptr(p));
  if (m->pos + n > m->len) png_error(p, "dffxio: png eof");
  std::memcpy(out, m->buf + m->pos, n);
  m->pos += n;
}

// Shared open-and-classify for the unchanged PNG path.  On success the read
// struct is positioned after png_read_info with BGR/endian transforms applied.
int png_open_unchanged(const uint8_t* buf, int64_t len, png_structp* pp,
                       png_infop* ip, PngMem* mem, int64_t* h, int64_t* w,
                       int64_t* kind) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return -1;
  png_structp p = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                         nullptr, nullptr);
  if (!p) return -1;
  png_infop info = png_create_info_struct(p);
  if (!info) {
    png_destroy_read_struct(&p, nullptr, nullptr);
    return -1;
  }
  if (setjmp(png_jmpbuf(p))) {
    png_destroy_read_struct(&p, &info, nullptr);
    return -2;
  }
  mem->buf = buf;
  mem->len = static_cast<size_t>(len);
  mem->pos = 0;
  png_set_read_fn(p, mem, png_mem_read);
  png_read_info(p, info);
  const int bits = png_get_bit_depth(p, info);
  const int color = png_get_color_type(p, info);
  *h = png_get_image_height(p, info);
  *w = png_get_image_width(p, info);
  int k;
  if (png_get_interlace_type(p, info) != PNG_INTERLACE_NONE)
    k = -4;  // cv2 handles interlace; rare — take the fallback
  else if (color == PNG_COLOR_TYPE_GRAY && bits == 8)
    k = 1;
  else if (color == PNG_COLOR_TYPE_GRAY && bits == 16)
    k = 2;
  else if (color == PNG_COLOR_TYPE_RGB && bits == 8)
    k = 4;
  else if (color == PNG_COLOR_TYPE_RGB && bits == 16)
    k = 5;
  else
    k = -4;  // palette / alpha / sub-byte gray -> cv2 fallback
  if (k < 0) {
    png_destroy_read_struct(&p, &info, nullptr);
    return k;
  }
  if (k == 4 || k == 5) png_set_bgr(p);  // cv2 channel order
  if (bits == 16) png_set_swap(p);       // PNG is big-endian; cv2 swaps too
  png_read_update_info(p, info);
  *kind = k;
  *pp = p;
  *ip = info;
  return 0;
}

}  // namespace

extern "C" {

int dffxio_png_info_unchanged(const uint8_t* buf, int64_t len, int64_t* h,
                              int64_t* w, int64_t* kind) {
  png_structp p;
  png_infop info;
  PngMem mem;
  int rc = png_open_unchanged(buf, len, &p, &info, &mem, h, w, kind);
  if (rc == 0) png_destroy_read_struct(&p, &info, nullptr);
  return rc;
}

int dffxio_png_decode_unchanged(const uint8_t* buf, int64_t len, void* dst,
                                int64_t h, int64_t w, int64_t kind) {
  png_structp p;
  png_infop info;
  PngMem mem;
  int64_t ih, iw, k;
  int rc = png_open_unchanged(buf, len, &p, &info, &mem, &ih, &iw, &k);
  if (rc != 0) return rc;
  if (ih != h || iw != w || k != kind) {
    png_destroy_read_struct(&p, &info, nullptr);
    return -3;
  }
  if (setjmp(png_jmpbuf(p))) {
    png_destroy_read_struct(&p, &info, nullptr);
    return -2;
  }
  const int64_t row_bytes = w * (k == 1 ? 1 : k == 2 ? 2 : k == 4 ? 3 : 6);
  if (static_cast<int64_t>(png_get_rowbytes(p, info)) != row_bytes) {
    png_destroy_read_struct(&p, &info, nullptr);
    return -5;
  }
  uint8_t* out = static_cast<uint8_t*>(dst);
  for (int64_t y = 0; y < h; ++y)
    png_read_row(p, out + y * row_bytes, nullptr);
  png_destroy_read_struct(&p, &info, nullptr);
  return 0;
}

int dffxio_version() { return 4; }

}  // extern "C"
