// Native Radiance RGBE codec + BMP encoder.
//
// The runtime-native replacement for the reference's vendored stb IO
// (stb_image.h / stb_image_write.h used via asset_loading.cpp:9-59):
// a small C-ABI library the Python layer loads with ctypes. The pure
// numpy codec in texture/hdr.py remains the always-available fallback
// and the correctness reference; this path exists because decoding a
// 4K RLE .hdr per-scanline in Python is interpreter-bound.
//
// Build: make -C native   (produces librgbe.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

// stb-compatible RGBE -> float rule: f = 2^(e-136), rgb = mantissa * f.
inline void rgbe_to_float(const uint8_t rgbe[4], float out[3]) {
  if (rgbe[3] == 0) {
    out[0] = out[1] = out[2] = 0.0f;
    return;
  }
  const float f = std::ldexp(1.0f, static_cast<int>(rgbe[3]) - 136);
  out[0] = rgbe[0] * f;
  out[1] = rgbe[1] * f;
  out[2] = rgbe[2] * f;
}

}  // namespace

extern "C" {

// Parse the header. Returns 0 on success; fills width/height and the
// byte offset of the first scanline.
int rgbe_read_header(const uint8_t* data, long len, int* width, int* height,
                     long* offset) {
  if (len < 16) return -1;
  if (std::memcmp(data, "#?RADIANCE", 10) != 0 &&
      std::memcmp(data, "#?RGBE", 6) != 0) {
    return -2;
  }
  // header ends at the first blank line
  long i = 0;
  while (i + 1 < len && !(data[i] == '\n' && data[i + 1] == '\n')) i++;
  if (i + 1 >= len) return -3;
  long res_start = i + 2;
  long res_end = res_start;
  while (res_end < len && data[res_end] != '\n') res_end++;
  if (res_end >= len) return -4;

  char line[128];
  long n = res_end - res_start;
  if (n >= static_cast<long>(sizeof(line))) return -5;
  std::memcpy(line, data + res_start, n);
  line[n] = 0;
  int h = 0, w = 0;
  if (std::sscanf(line, "-Y %d +X %d", &h, &w) != 2) return -6;
  *width = w;
  *height = h;
  *offset = res_end + 1;
  return 0;
}

// Decode all scanlines into out (height*width*3 floats, file row order —
// caller handles vertical flip). Returns 0 on success.
int rgbe_decode(const uint8_t* data, long len, long offset, int width,
                int height, float* out) {
  const uint8_t* p = data + offset;
  const uint8_t* end = data + len;
  // per-scanline RGBE staging buffer
  uint8_t* row = new uint8_t[static_cast<size_t>(width) * 4];

  for (int y = 0; y < height; y++) {
    if (p + 4 > end) goto fail;
    const bool rle = width >= 8 && width < 32768 && p[0] == 2 && p[1] == 2 &&
                     ((p[2] << 8) | p[3]) == width;
    if (rle) {
      p += 4;
      for (int c = 0; c < 4; c++) {
        int x = 0;
        while (x < width) {
          if (p >= end) goto fail;
          int count = *p++;
          if (count > 128) {  // run
            if (p >= end) goto fail;
            uint8_t v = *p++;
            count -= 128;
            if (x + count > width) goto fail;
            for (int k = 0; k < count; k++) row[(x + k) * 4 + c] = v;
            x += count;
          } else {  // literal
            if (p + count > end || x + count > width) goto fail;
            for (int k = 0; k < count; k++) row[(x + k) * 4 + c] = p[k];
            p += count;
            x += count;
          }
        }
      }
    } else {
      if (p + static_cast<long>(width) * 4 > end) goto fail;
      std::memcpy(row, p, static_cast<size_t>(width) * 4);
      p += static_cast<long>(width) * 4;
    }
    float* dst = out + static_cast<size_t>(y) * width * 3;
    for (int x = 0; x < width; x++) {
      rgbe_to_float(row + x * 4, dst + x * 3);
    }
  }
  delete[] row;
  return 0;
fail:
  delete[] row;
  return -1;
}

// Encode float RGB -> flat (uncompressed) RGBE pixels, stb rule.
// out must hold height*width*4 bytes.
int rgbe_encode(const float* rgb, int width, int height, uint8_t* out) {
  const size_t n = static_cast<size_t>(width) * height;
  for (size_t i = 0; i < n; i++) {
    const float r = rgb[i * 3] < 0 ? 0 : rgb[i * 3];
    const float g = rgb[i * 3 + 1] < 0 ? 0 : rgb[i * 3 + 1];
    const float b = rgb[i * 3 + 2] < 0 ? 0 : rgb[i * 3 + 2];
    float maxc = r > g ? r : g;
    if (b > maxc) maxc = b;
    uint8_t* o = out + i * 4;
    if (maxc < 1e-32f) {
      o[0] = o[1] = o[2] = o[3] = 0;
      continue;
    }
    int e;
    const float m = std::frexp(maxc, &e);
    const float scale = m * 256.0f / maxc;
    auto q = [&](float v) {
      float s = v * scale;
      if (s < 0) s = 0;
      if (s > 255) s = 255;
      return static_cast<uint8_t>(s);
    };
    o[0] = q(r);
    o[1] = q(g);
    o[2] = q(b);
    o[3] = static_cast<uint8_t>(e + 128);
  }
  return 0;
}

// Encode (H, W, 3) u8 RGB into a 24-bit bottom-up BGR BMP. Returns the
// number of bytes written, or -1 if out_cap is too small.
long bmp_encode(const uint8_t* rgb, int width, int height, uint8_t* out,
                long out_cap) {
  const long row_size = (width * 3 + 3) & ~3L;
  const long pixel_bytes = row_size * height;
  const long total = 54 + pixel_bytes;
  if (out_cap < total) return -1;

  std::memset(out, 0, 54);
  out[0] = 'B';
  out[1] = 'M';
  auto put32 = [&](long off, uint32_t v) {
    out[off] = v & 0xFF;
    out[off + 1] = (v >> 8) & 0xFF;
    out[off + 2] = (v >> 16) & 0xFF;
    out[off + 3] = (v >> 24) & 0xFF;
  };
  put32(2, static_cast<uint32_t>(total));
  put32(10, 54);
  put32(14, 40);
  put32(18, static_cast<uint32_t>(width));
  put32(22, static_cast<uint32_t>(height));
  out[26] = 1;
  out[28] = 24;
  put32(34, static_cast<uint32_t>(pixel_bytes));
  put32(38, 2835);
  put32(42, 2835);

  for (int y = 0; y < height; y++) {
    const uint8_t* src = rgb + static_cast<size_t>(height - 1 - y) * width * 3;
    uint8_t* dst = out + 54 + static_cast<size_t>(y) * row_size;
    for (int x = 0; x < width; x++) {
      dst[x * 3] = src[x * 3 + 2];      // B
      dst[x * 3 + 1] = src[x * 3 + 1];  // G
      dst[x * 3 + 2] = src[x * 3];      // R
    }
    for (long pad = width * 3; pad < row_size; pad++) dst[pad] = 0;
  }
  return total;
}

}  // extern "C"
