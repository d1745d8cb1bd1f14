// Native ANSI half-block frame encoder for the terminal viewer.
//
// The viewer (raytracer_tpu/app/viewer.py) displays the progressive
// accumulation buffer as truecolor half-block characters every frame —
// the analog of the reference's canvas blit. In Python that is ~2 cells
// per pixel-pair of f-string formatting per frame (the per-frame host
// hot path); this encoder emits the identical byte stream from the f32
// framebuffer in one call. Byte-for-byte parity with
// viewer.frame_to_ansi is pinned by tests/test_viewer.py.

#include <cstddef>
#include <cstdint>

namespace {

// minimal unsigned itoa (values are 0..255)
inline size_t put_u8_dec(uint8_t v, uint8_t* out) {
  if (v >= 100) {
    out[0] = '0' + v / 100;
    out[1] = '0' + (v / 10) % 10;
    out[2] = '0' + v % 10;
    return 3;
  }
  if (v >= 10) {
    out[0] = '0' + v / 10;
    out[1] = '0' + v % 10;
    return 2;
  }
  out[0] = '0' + v;
  return 1;
}

inline uint8_t tonemap(float x) {
  float v = x * 255.0f + 0.5f;
  if (v < 0.0f) v = 0.0f;
  if (v > 255.0f) v = 255.0f;
  return static_cast<uint8_t>(v);
}

inline size_t put_lit(const char* s, size_t n, uint8_t* out) {
  for (size_t i = 0; i < n; ++i) out[i] = static_cast<uint8_t>(s[i]);
  return n;
}

}  // namespace

extern "C" {

// f32 (height, width, 3) framebuffer in GL row order (row 0 = bottom of
// the image, like the accumulation buffer) -> ANSI truecolor half-block
// text, downsampled by `stride` in both axes, two pixels per cell.
// Writes at most `cap` bytes into `out`; returns the encoded length, or
// -1 if `cap` is too small. Matches viewer.frame_to_ansi byte-for-byte.
long rt_ansi_halfblocks(const float* rgb, int height, int width, int stride,
                        uint8_t* out, size_t cap) {
  if (stride < 1 || height <= 0 || width <= 0) return -1;
  // sub-sampled dimensions after the vertical flip + stride
  const int sub_h_all = (height + stride - 1) / stride;
  const int sub_h = sub_h_all - (sub_h_all % 2);  // drop odd trailing row
  const int sub_w = (width + stride - 1) / stride;
  // worst case per cell: 2 escapes (19 bytes each with 3-digit components)
  // + 3 UTF-8 bytes for the half block; per line: reset (4) + newline
  const size_t worst =
      static_cast<size_t>(sub_h / 2) * (static_cast<size_t>(sub_w) * 41 + 5);
  if (cap < worst) return -1;

  uint8_t* p = out;
  for (int pair = 0; pair < sub_h / 2; ++pair) {
    // sub row i maps to source row (height-1 - i*stride) after the flip
    const int top_src = height - 1 - (2 * pair) * stride;
    const int bot_src = height - 1 - (2 * pair + 1) * stride;
    const float* top_row = rgb + static_cast<size_t>(top_src) * width * 3;
    const float* bot_row = rgb + static_cast<size_t>(bot_src) * width * 3;
    for (int j = 0; j < sub_w; ++j) {
      const float* t = top_row + static_cast<size_t>(j) * stride * 3;
      const float* b = bot_row + static_cast<size_t>(j) * stride * 3;
      p += put_lit("\x1b[38;2;", 7, p);
      p += put_u8_dec(tonemap(t[0]), p);
      *p++ = ';';
      p += put_u8_dec(tonemap(t[1]), p);
      *p++ = ';';
      p += put_u8_dec(tonemap(t[2]), p);
      *p++ = 'm';
      p += put_lit("\x1b[48;2;", 7, p);
      p += put_u8_dec(tonemap(b[0]), p);
      *p++ = ';';
      p += put_u8_dec(tonemap(b[1]), p);
      *p++ = ';';
      p += put_u8_dec(tonemap(b[2]), p);
      *p++ = 'm';
      p += put_lit("\xe2\x96\x80", 3, p);  // ▀
    }
    p += put_lit("\x1b[0m", 4, p);
    if (pair + 1 < sub_h / 2) *p++ = '\n';
  }
  return static_cast<long>(p - out);
}

}  // extern "C"
