// detax native image loader: JPEG decode + bilinear letterbox in C++.
//
// The reference's image IO runs through native code in its dependencies
// (OpenCV imread at python/src/utils.py:169-174, PIL decode at
// preprocessing/classification/imagenet.py) — this is detax's first-party
// equivalent for the serving/data hot path: decode a JPEG with libjpeg and
// letterbox-resize it into a caller-provided square uint8 canvas in one
// pass, GIL-free. The device does the (x-mean)/std normalize (fused into
// the jitted forward).
//
// C ABI, consumed via ctypes (detax/serve/loader.py).

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  auto* mgr = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(mgr->jump, 1);
}

// bilinear resize (src HWC uint8, 3 channels) into dst (nh x nw)
void resize_bilinear(const uint8_t* src, int h, int w, uint8_t* dst, int nh, int nw,
                     int dst_stride) {
  for (int y = 0; y < nh; ++y) {
    float fy = (y + 0.5f) * h / nh - 0.5f;
    fy = std::max(fy, 0.0f);
    int y0 = std::min(static_cast<int>(fy), h - 1);
    int y1 = std::min(y0 + 1, h - 1);
    float wy = fy - y0;
    for (int x = 0; x < nw; ++x) {
      float fx = (x + 0.5f) * w / nw - 0.5f;
      fx = std::max(fx, 0.0f);
      int x0 = std::min(static_cast<int>(fx), w - 1);
      int x1 = std::min(x0 + 1, w - 1);
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(y0 * w + x0) * 3 + c];
        float v01 = src[(y0 * w + x1) * 3 + c];
        float v10 = src[(y1 * w + x0) * 3 + c];
        float v11 = src[(y1 * w + x1) * 3 + c];
        float v = (1 - wy) * ((1 - wx) * v00 + wx * v01) + wy * ((1 - wx) * v10 + wx * v11);
        dst[y * dst_stride + x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

bool decode_rgb(const uint8_t* data, size_t len, std::vector<uint8_t>& pixels, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = error_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  pixels.resize(static_cast<size_t>(*h) * *w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels.data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

}  // namespace

extern "C" {

// Decode header only: returns 0 on success, fills h/w.
int detax_jpeg_info(const uint8_t* data, size_t len, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = error_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  int ok = jpeg_read_header(&cinfo, TRUE) == JPEG_HEADER_OK;
  if (ok) {
    *h = cinfo.image_height;
    *w = cinfo.image_width;
  }
  jpeg_destroy_decompress(&cinfo);
  return ok ? 0 : 1;
}

// Decode a JPEG into a raw HWC RGB buffer (caller-sized h*w*3).
int detax_jpeg_decode(const uint8_t* data, size_t len, uint8_t* out, int max_bytes,
                      int* h, int* w) {
  std::vector<uint8_t> pixels;
  if (!decode_rgb(data, len, pixels, h, w)) return 1;
  if (static_cast<int>(pixels.size()) > max_bytes) return 2;
  std::memcpy(out, pixels.data(), pixels.size());
  return 0;
}

// Decode + letterbox into a zeroed (canvas x canvas x 3) uint8 buffer
// (image scaled to fit, anchored top-left). Fills scale and the valid
// region size. Returns 0 on success.
int detax_jpeg_letterbox(const uint8_t* data, size_t len, int canvas, uint8_t* out,
                         float* scale, int* new_h, int* new_w) {
  int h = 0, w = 0;
  std::vector<uint8_t> pixels;
  if (!decode_rgb(data, len, pixels, &h, &w)) return 1;
  float s = std::min(static_cast<float>(canvas) / h, static_cast<float>(canvas) / w);
  int nh = std::min(static_cast<int>(h * s + 0.5f), canvas);
  int nw = std::min(static_cast<int>(w * s + 0.5f), canvas);
  std::memset(out, 0, static_cast<size_t>(canvas) * canvas * 3);
  resize_bilinear(pixels.data(), h, w, out, nh, nw, canvas * 3);
  *scale = s;
  *new_h = nh;
  *new_w = nw;
  return 0;
}

}  // extern "C"
