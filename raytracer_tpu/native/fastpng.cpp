// fastpng: native image-export runtime for raytracer_tpu.
//
// The reference exports frames through the browser (canvas.toDataURL("image/png"),
// src/dom.rs:126-143) — its "native" layer is Rust→WASM. Our host runtime is
// native C++: float32 framebuffer → sRGB8 quantization + vertical flip (the
// accumulation buffer is GL-oriented, row 0 = bottom) + PNG encode via zlib.
// Exposed over a plain C ABI and loaded with ctypes (no pybind11 needed).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC fastpng.cpp -lz).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

inline uint32_t be32(uint32_t v) {
  return ((v & 0xff) << 24) | ((v & 0xff00) << 8) | ((v >> 8) & 0xff00) |
         ((v >> 24) & 0xff);
}

struct Buf {
  std::vector<uint8_t> data;
  void put(const void* p, size_t n) {
    const uint8_t* b = static_cast<const uint8_t*>(p);
    data.insert(data.end(), b, b + n);
  }
  void put_u32(uint32_t v) {
    uint32_t b = be32(v);
    put(&b, 4);
  }
};

void put_chunk(Buf& out, const char type[4], const uint8_t* payload, size_t n) {
  out.put_u32(static_cast<uint32_t>(n));
  size_t start = out.data.size();
  out.put(type, 4);
  out.put(payload, n);
  uint32_t crc = crc32(0L, out.data.data() + start, static_cast<uInt>(n + 4));
  out.put_u32(crc);
}

}  // namespace

extern "C" {

// Quantize a float32 RGB framebuffer (values already gamma-encoded, in [0,1])
// to interleaved RGB8, optionally flipping vertically (GL row order → scanline
// order). Returns 0 on success.
int rt_tonemap_u8(const float* rgb, int height, int width, int flip_vertical,
                  uint8_t* out) {
  if (!rgb || !out || height <= 0 || width <= 0) return -1;
  const int row_floats = width * 3;
  for (int y = 0; y < height; ++y) {
    const int src_y = flip_vertical ? (height - 1 - y) : y;
    const float* src = rgb + static_cast<size_t>(src_y) * row_floats;
    uint8_t* dst = out + static_cast<size_t>(y) * row_floats;
    for (int i = 0; i < row_floats; ++i) {
      float v = src[i];
      if (v < 0.f) v = 0.f;
      if (v > 1.f) v = 1.f;
      dst[i] = static_cast<uint8_t>(v * 255.0f + 0.5f);
    }
  }
  return 0;
}

// Encode interleaved RGB8 as a PNG (8-bit truecolor). Caller provides the
// output buffer; *out_len holds its capacity on entry, the encoded size on
// exit. Returns 0 on success, -2 if the buffer is too small.
int rt_encode_png(const uint8_t* rgb8, int height, int width, uint8_t* out,
                  size_t* out_len) {
  if (!rgb8 || !out || !out_len || height <= 0 || width <= 0) return -1;

  // Filtered scanlines: filter byte 0 (None) + row data.
  const size_t stride = static_cast<size_t>(width) * 3;
  std::vector<uint8_t> raw((stride + 1) * height);
  for (int y = 0; y < height; ++y) {
    uint8_t* row = raw.data() + static_cast<size_t>(y) * (stride + 1);
    row[0] = 0;
    std::memcpy(row + 1, rgb8 + static_cast<size_t>(y) * stride, stride);
  }

  uLongf comp_cap = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(),
                static_cast<uLong>(raw.size()), 6) != Z_OK)
    return -3;
  comp.resize(comp_cap);

  Buf png;
  static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  png.put(magic, 8);

  uint8_t ihdr[13];
  uint32_t w_be = be32(static_cast<uint32_t>(width));
  uint32_t h_be = be32(static_cast<uint32_t>(height));
  std::memcpy(ihdr, &w_be, 4);
  std::memcpy(ihdr + 4, &h_be, 4);
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type: truecolor RGB
  ihdr[10] = 0;  // compression
  ihdr[11] = 0;  // filter
  ihdr[12] = 0;  // interlace
  put_chunk(png, "IHDR", ihdr, 13);
  put_chunk(png, "IDAT", comp.data(), comp.size());
  put_chunk(png, "IEND", nullptr, 0);

  if (png.data.size() > *out_len) return -2;
  std::memcpy(out, png.data.data(), png.data.size());
  *out_len = png.data.size();
  return 0;
}

// Convenience: float framebuffer → PNG in one call (tonemap + encode).
int rt_write_png(const float* rgb, int height, int width, int flip_vertical,
                 uint8_t* out, size_t* out_len) {
  std::vector<uint8_t> rgb8(static_cast<size_t>(height) * width * 3);
  int rc = rt_tonemap_u8(rgb, height, width, flip_vertical, rgb8.data());
  if (rc != 0) return rc;
  return rt_encode_png(rgb8.data(), height, width, out, out_len);
}

}  // extern "C"
