// osijpeg: fused JPEG decode -> shorter-side resize -> crop -> flip.
//
// Native data-path for openset_imagenet_tpu replacing the reference's
// PIL/torchvision per-item decode (reference dataset.py:46-53 +
// torchvision transforms, SURVEY.md C2/C3).  Speed levers over PIL:
//
//  * libjpeg DCT scaling: decode directly at M/8 resolution (M=1..8), the
//    smallest fraction whose shorter side still >= the resize target.  For
//    a typical 500x375 ImageNet JPEG resized to 256 this decodes at 4/8
//    scale -- ~4x fewer pixels through the IDCT and color conversion.
//  * window-restricted decode (libjpeg-turbo): IDCT + color conversion
//    run only over the source window the crop actually samples —
//    `jpeg_crop_scanline` limits columns, `jpeg_skip_scanlines` + an
//    early abort limit rows (entropy decoding still scans the stream;
//    a small margin keeps fancy-upsampling context away from edges).
//  * fused bilinear resize straight into the crop window: only the
//    `crop x crop` output pixels are resampled, not the full resized
//    frame, with per-column source indices/weights precomputed once.
//  * optional horizontal flip fused into the same pass (negative x stride).
//
// Because DCT scaling leaves a residual downscale factor <= ~1.14, plain
// 2-tap bilinear here matches PIL's antialiased resize closely (antialias
// matters for factors > 2; those are absorbed by the IDCT box prefilter).
//
// Thread-safety: no globals; each call owns its decompress struct.  The
// Python side drives one call per image from a thread pool.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>  // jpeglib.h needs FILE declared first
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Count corrupt-data warnings without libjpeg's default stderr spam (the
// thread pool would interleave it).  Truncated entropy data is only a
// WARNING to libjpeg — it fakes an EOI and fills the rest with gray — so
// decode_core must check num_warnings and fail such images over to PIL.
void emit_message_quiet(j_common_ptr cinfo, int msg_level) {
  if (msg_level < 0) cinfo->err->num_warnings++;
}

// Per-thread scratch reused across images: the decoded window plus the
// precomputed per-output-column sample indices/weights.  Owned by the
// CALLER of decode_core so libjpeg's longjmp unwind can never skip a
// live destructor.
struct DecodeScratch {
  std::vector<uint8_t> decoded;
  std::vector<int> x0, x1;
  std::vector<float> ax;
};

// Bilinear sample of channel-interleaved RGB row data with precomputed
// column indices.  Arithmetic is bit-identical to the original
// per-pixel form (same float expression order, +0.5 truncation).
inline void sample_row_bilinear(const uint8_t* row0, const uint8_t* row1,
                                float ay, const int* x0, const int* x1,
                                const float* ax, int n, uint8_t* out,
                                int flip) {
  for (int x = 0; x < n; ++x) {
    const uint8_t* p00 = row0 + x0[x] * 3;
    const uint8_t* p01 = row0 + x1[x] * 3;
    const uint8_t* p10 = row1 + x0[x] * 3;
    const uint8_t* p11 = row1 + x1[x] * 3;
    uint8_t* o = out + (flip ? (n - 1 - x) : x) * 3;
    const float axx = ax[x];
    for (int c = 0; c < 3; ++c) {
      float v0 = p00[c] + axx * (p01[c] - p00[c]);
      float v1 = p10[c] + axx * (p11[c] - p10[c]);
      float v = v0 + ay * (v1 - v0);
      o[c] = static_cast<uint8_t>(v + 0.5f);
    }
  }
}

bool read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (sz <= 0) {
    std::fclose(f);
    return false;
  }
  buf.resize(static_cast<size_t>(sz));
  bool okr = std::fread(buf.data(), 1, buf.size(), f) == buf.size();
  std::fclose(f);
  return okr;
}

}  // namespace

extern "C" {

// Implementation core.  The caller owns `decoded` so that the longjmp
// unwind from libjpeg's error handler cannot skip a live std::vector
// destructor (the object outlives the setjmp region; resizing inside it
// is safe — the buffer is freed by the owner either way).
// utop/uleft: fractional crop draws in [0, 1) mapped to integer offsets
// from the image's own resized extent (computed HERE, the one place that
// knows rw/rh, in float64 to match the PIL replay's Python-float math);
// negative draws defer to the integer top/left (which in turn select a
// center crop when negative).
static int decode_core(const uint8_t* jpeg, size_t len, int resize,
                       int crop, int top, int left, double utop,
                       double uleft, int flip, uint8_t* out,
                       DecodeScratch& scratch) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = emit_message_quiet;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, jpeg, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }

  const int full_w = cinfo.image_width, full_h = cinfo.image_height;
  if (full_w < 1 || full_h < 1) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }

  // Target resized geometry: shorter side == resize, aspect preserved.
  // The long side TRUNCATES like torchvision's Resize
  // (int(size * long / short) in _compute_resized_output_size).
  // Derivable from the header alone, so the crop window is known BEFORE
  // decoding — that is what lets the decode itself be window-restricted.
  int rw, rh;
  if (full_w <= full_h) {
    rw = resize;
    rh = std::max(1, static_cast<int>(
        static_cast<double>(resize) * full_h / full_w));
  } else {
    rh = resize;
    rw = std::max(1, static_cast<int>(
        static_cast<double>(resize) * full_w / full_h));
  }
  // Center offset = int(round(d / 2.0)) with round-half-to-even, matching
  // torchvision's F_pil.center_crop (floor differs when d % 4 == 3).
  auto center_offset = [](int extent, int size) {
    int d = extent - size;
    if (d <= 0) return 0;
    int k = d / 2;
    if ((d & 1) && (k & 1)) ++k;
    return k;
  };
  if (crop > rw || crop > rh) {  // window must fit; PIL pads
    jpeg_destroy_decompress(&cinfo);
    return 6;
  }
  if (utop >= 0.0) top = static_cast<int>(utop * (rh - crop + 1));
  if (uleft >= 0.0) left = static_cast<int>(uleft * (rw - crop + 1));
  if (top < 0) top = center_offset(rh, crop);
  if (left < 0) left = center_offset(rw, crop);
  // Defensive clamp: fractional-draw rounding can land one past the last
  // valid offset.
  top = std::min(top, rh - crop);
  left = std::min(left, rw - crop);

  // Smallest DCT fraction m/8 whose decoded shorter side >= resize.
  const int short_side = std::min(full_w, full_h);
  int m = 8;
  for (int cand = 1; cand <= 8; ++cand) {
    if (static_cast<long>(short_side) * cand >= static_cast<long>(resize) * 8) {
      m = cand;
      break;
    }
  }
  cinfo.scale_num = m;
  cinfo.scale_denom = 8;
  cinfo.out_color_space = JCS_RGB;
  cinfo.dct_method = JDCT_ISLOW;
  jpeg_start_decompress(&cinfo);

  const int dw = cinfo.output_width, dh = cinfo.output_height;
  const int comps = cinfo.output_components;
  if (comps != 3) {  // JCS_RGB should always yield 3; be defensive.
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 4;
  }

  // Source window the crop samples, in decoded coordinates (PIL-style
  // half-pixel centers: src = (dst + 0.5) * scale - 0.5), padded by 2px
  // so fancy-upsampling context at window edges cannot touch sampled
  // pixels.  Sampling math below is bit-identical to a full-frame
  // decode because IDCT/color conversion are blockwise-pure.
  const float sx = static_cast<float>(dw) / rw;
  const float sy = static_cast<float>(dh) / rh;
  auto clampf = [](float v, float hi) {
    return std::min(std::max(v, 0.0f), hi);
  };
  const float fx_min = clampf((left + 0.5f) * sx - 0.5f,
                              static_cast<float>(dw - 1));
  const float fx_max = clampf((crop - 1 + left + 0.5f) * sx - 0.5f,
                              static_cast<float>(dw - 1));
  const float fy_min = clampf((top + 0.5f) * sy - 0.5f,
                              static_cast<float>(dh - 1));
  const float fy_max = clampf((crop - 1 + top + 0.5f) * sy - 0.5f,
                              static_cast<float>(dh - 1));
  int win_x0 = std::max(0, static_cast<int>(fx_min) - 2);
  const int win_x1 = std::min(dw - 1, std::min(
      static_cast<int>(fx_max) + 1, dw - 1) + 2);
  const int win_y0 = std::max(0, static_cast<int>(fy_min) - 2);
  const int win_y1 = std::min(dh - 1, std::min(
      static_cast<int>(fy_max) + 1, dh - 1) + 2);

  // Column restriction (libjpeg-turbo).  jpeg_crop_scanline widens the
  // request to iMCU/upsampling alignment and updates output_width.
  int xoff = 0, wwin = dw;
#ifdef LIBJPEG_TURBO_VERSION
  if (win_x0 > 0 || win_x1 < dw - 1) {
    JDIMENSION cx = static_cast<JDIMENSION>(win_x0);
    JDIMENSION cw = static_cast<JDIMENSION>(win_x1 - win_x0 + 1);
    jpeg_crop_scanline(&cinfo, &cx, &cw);
    xoff = static_cast<int>(cx);
    wwin = static_cast<int>(cinfo.output_width);
  }
#endif

  const int rows_n = win_y1 - win_y0 + 1;
  std::vector<uint8_t>& decoded = scratch.decoded;
  decoded.resize(static_cast<size_t>(wwin) * rows_n * 3);

  // Row restriction: skip ahead to the window (turbo fast-path; plain
  // read-and-discard otherwise), read the window, then abort the rest.
#ifdef LIBJPEG_TURBO_VERSION
  if (win_y0 > 0) {
    jpeg_skip_scanlines(&cinfo, static_cast<JDIMENSION>(win_y0));
  }
#endif
  while (cinfo.output_scanline < static_cast<JDIMENSION>(win_y0)) {
    JSAMPROW rows[1] = {decoded.data()};  // discard scratch
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  while (cinfo.output_scanline <= static_cast<JDIMENSION>(win_y1)) {
    uint8_t* row = decoded.data() +
        (static_cast<size_t>(cinfo.output_scanline) - win_y0) * wwin * 3;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  if (cinfo.output_scanline < cinfo.output_height) {
    jpeg_abort_decompress(&cinfo);
  } else {
    jpeg_finish_decompress(&cinfo);
  }
  const long n_warnings = jerr.pub.num_warnings;
  jpeg_destroy_decompress(&cinfo);
  if (n_warnings > 0) return 5;  // corrupt data decoded as gray: reject

  // Per-output-column source indices/weights, precomputed once (the
  // same clamp/floor/weight expressions the per-pixel loop used).
  scratch.x0.resize(crop);
  scratch.x1.resize(crop);
  scratch.ax.resize(crop);
  for (int x = 0; x < crop; ++x) {
    const float fx = clampf((x + left + 0.5f) * sx - 0.5f,
                            static_cast<float>(dw - 1));
    int gx0 = static_cast<int>(fx);
    int gx1 = std::min(gx0 + 1, dw - 1);
    scratch.ax[x] = fx - gx0;
    scratch.x0[x] = std::min(std::max(gx0 - xoff, 0), wwin - 1);
    scratch.x1[x] = std::min(std::max(gx1 - xoff, 0), wwin - 1);
  }

  for (int y = 0; y < crop; ++y) {
    const float fy = clampf((y + top + 0.5f) * sy - 0.5f,
                            static_cast<float>(dh - 1));
    int gy0 = static_cast<int>(fy);
    int gy1 = std::min(gy0 + 1, dh - 1);
    const float ay = fy - gy0;
    const uint8_t* row0 = decoded.data() +
        (static_cast<size_t>(gy0) - win_y0) * wwin * 3;
    const uint8_t* row1 = decoded.data() +
        (static_cast<size_t>(gy1) - win_y0) * wwin * 3;
    uint8_t* orow = out + static_cast<size_t>(y) * crop * 3;
    sample_row_bilinear(row0, row1, ay, scratch.x0.data(),
                        scratch.x1.data(), scratch.ax.data(), crop, orow,
                        flip);
  }
  return 0;
}

// Public entry: see header comment above.  top/left < 0 -> center crop.
int osi_decode_resize_crop(const uint8_t* jpeg, size_t len, int resize,
                           int crop, int top, int left, int flip,
                           uint8_t* out) {
  DecodeScratch scratch;  // owned here; safe across longjmp
  return decode_core(jpeg, len, resize, crop, top, left, -1.0, -1.0, flip,
                     out, scratch);
}

// Batch loader: decode n JPEG files into one contiguous uint8 batch
// buffer with an internal thread pool (one fused decode per image).
//
// Geometry draws are fractional (utop/uleft in [0,1), mapped to integer
// offsets from each image's own resized size; < 0 selects a center crop),
// so the Python side can pre-draw augmentation without knowing image
// sizes.  ok[i] is set to 1 on success, 0 on failure (caller falls back to
// PIL for those images).  Returns the number of failures.
int osi_decode_batch(const char** paths, int n, const float* utop,
                     const float* uleft, const uint8_t* flip, int resize,
                     int crop, int threads, uint8_t* out, uint8_t* ok) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(crop) * crop * 3;

  auto work = [&]() {
    std::vector<uint8_t> buf;
    DecodeScratch scratch;  // reused per thread across images
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      ok[i] = 0;
      if (!read_file(paths[i], buf)) {
        failures.fetch_add(1);
        continue;
      }
      // Fractional draws map to offsets inside decode_core (the one
      // place that knows the resized extents), in float64 — matching the
      // PIL replay's Python-float math exactly; this also removes a
      // second header parse per image.
      const double ut = utop ? static_cast<double>(utop[i]) : -1.0;
      const double ul = uleft ? static_cast<double>(uleft[i]) : -1.0;
      const int fl = flip ? flip[i] : 0;
      if (decode_core(buf.data(), buf.size(), resize, crop, -1, -1,
                      ut, ul, fl, out + stride * i, scratch) == 0) {
        ok[i] = 1;
      } else {
        failures.fetch_add(1);
      }
    }
  };

  const int n_threads = std::max(1, threads);
  std::vector<std::thread> pool;
  pool.reserve(n_threads - 1);
  for (int t = 1; t < n_threads; ++t) pool.emplace_back(work);
  work();
  for (auto& th : pool) th.join();
  return failures.load();
}

// In-memory batch variant: same fused decode + thread pool as
// osi_decode_batch, but over caller-held JPEG buffers instead of file
// paths (the serving daemon's bulk endpoint holds request bodies in
// RAM; writing temp files just to decode them would serialize on the
// filesystem).  Center crops only when utop/uleft are null, like the
// file variant.  ok[i] = 1 on success; returns the failure count.
int osi_decode_batch_mem(const uint8_t** bufs, const size_t* lens, int n,
                         const float* utop, const float* uleft,
                         const uint8_t* flip, int resize, int crop,
                         int threads, uint8_t* out, uint8_t* ok) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(crop) * crop * 3;

  auto work = [&]() {
    DecodeScratch scratch;  // reused per thread across images
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      ok[i] = 0;
      if (bufs[i] == nullptr || lens[i] == 0) {
        failures.fetch_add(1);
        continue;
      }
      const double ut = utop ? static_cast<double>(utop[i]) : -1.0;
      const double ul = uleft ? static_cast<double>(uleft[i]) : -1.0;
      const int fl = flip ? flip[i] : 0;
      if (decode_core(bufs[i], lens[i], resize, crop, -1, -1,
                      ut, ul, fl, out + stride * i, scratch) == 0) {
        ok[i] = 1;
      } else {
        failures.fetch_add(1);
      }
    }
  };

  const int n_threads = std::max(1, threads);
  std::vector<std::thread> pool;
  pool.reserve(n_threads - 1);
  for (int t = 1; t < n_threads; ++t) pool.emplace_back(work);
  work();
  for (auto& th : pool) th.join();
  return failures.load();
}

// Geometry probe: decoded full size -> (w, h); returns 0 on success.
int osi_jpeg_size(const uint8_t* jpeg, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, jpeg, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
