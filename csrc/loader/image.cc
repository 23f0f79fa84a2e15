#include "image.h"

#include <zlib.h>

#include <cstdio>
#include <csetjmp>
#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>

namespace ofa {

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

static uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

static int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool decode_png(const uint8_t* buf, size_t len, Image* out) {
  static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || std::memcmp(buf, magic, 8) != 0) return false;

  size_t pos = 8;
  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = -1, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // RGB triples

  while (pos + 8 <= len) {
    uint32_t clen = be32(buf + pos);
    const char* ctype = reinterpret_cast<const char*>(buf + pos + 4);
    const uint8_t* cdata = buf + pos + 8;
    if (pos + 12 + clen > len) return false;

    if (std::memcmp(ctype, "IHDR", 4) == 0) {
      width = be32(cdata);
      height = be32(cdata + 4);
      bit_depth = cdata[8];
      color_type = cdata[9];
      interlace = cdata[12];
    } else if (std::memcmp(ctype, "PLTE", 4) == 0) {
      palette.assign(cdata, cdata + clen);
    } else if (std::memcmp(ctype, "IDAT", 4) == 0) {
      idat.insert(idat.end(), cdata, cdata + clen);
    } else if (std::memcmp(ctype, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + clen;
  }
  if (width == 0 || height == 0 || bit_depth != 8 || interlace != 0)
    return false;

  int in_ch;
  switch (color_type) {
    case 0: in_ch = 1; break;   // gray
    case 2: in_ch = 3; break;   // RGB
    case 3: in_ch = 1; break;   // palette
    case 4: in_ch = 2; break;   // gray+alpha
    case 6: in_ch = 4; break;   // RGBA
    default: return false;
  }

  const size_t stride = size_t(width) * in_ch;
  std::vector<uint8_t> raw((stride + 1) * height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size())
    return false;

  // unfilter
  std::vector<uint8_t> img(stride * height);
  const int bpp = in_ch;
  for (uint32_t y = 0; y < height; ++y) {
    const uint8_t ft = raw[y * (stride + 1)];
    const uint8_t* src = raw.data() + y * (stride + 1) + 1;
    uint8_t* dst = img.data() + y * stride;
    const uint8_t* up = y ? img.data() + (y - 1) * stride : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
      int v = src[x];
      switch (ft) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = uint8_t(v);
    }
  }

  // convert to RGB
  out->h = int(height);
  out->w = int(width);
  out->c = 3;
  out->data.resize(size_t(width) * height * 3);
  const size_t n = size_t(width) * height;
  for (size_t i = 0; i < n; ++i) {
    const uint8_t* px = img.data() + i * in_ch;
    uint8_t r, g, b;
    if (color_type == 0 || color_type == 4) {
      r = g = b = px[0];
    } else if (color_type == 3) {
      if (size_t(px[0]) * 3 + 2 >= palette.size()) return false;
      r = palette[px[0] * 3];
      g = palette[px[0] * 3 + 1];
      b = palette[px[0] * 3 + 2];
    } else {
      r = px[0];
      g = px[1];
      b = px[2];
    }
    out->data[i * 3] = r;
    out->data[i * 3 + 1] = g;
    out->data[i * 3 + 2] = b;
  }
  return true;
}

// ---------------------------------------------------------------------------
// PPM (P6)
// ---------------------------------------------------------------------------

bool decode_ppm(const uint8_t* buf, size_t len, Image* out) {
  if (len < 2 || buf[0] != 'P' || buf[1] != '6') return false;
  size_t pos = 2;
  auto skip_ws = [&]() {
    while (pos < len) {
      if (buf[pos] == '#') {
        while (pos < len && buf[pos] != '\n') ++pos;
      } else if (std::isspace(buf[pos])) {
        ++pos;
      } else {
        break;
      }
    }
  };
  auto read_int = [&]() {
    skip_ws();
    long v = 0;
    while (pos < len && std::isdigit(buf[pos])) v = v * 10 + (buf[pos++] - '0');
    return v;
  };
  long w = read_int(), h = read_int(), maxv = read_int();
  ++pos;  // single whitespace after maxval
  if (w <= 0 || h <= 0 || maxv != 255) return false;
  size_t need = size_t(w) * h * 3;
  if (pos + need > len) return false;
  out->h = int(h);
  out->w = int(w);
  out->c = 3;
  out->data.assign(buf + pos, buf + pos + need);
  return true;
}

// ---------------------------------------------------------------------------
// JPEG (libjpeg) — the ImageNet provider's format (imagenet.py loads JPEG
// class folders); PNG/PPM cover the SR datasets.
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_error_exit(j_common_ptr ci) {
  // libjpeg's default error handler exit()s the process; longjmp back to
  // the decoder so corrupt files just return false
  JpegErr* e = reinterpret_cast<JpegErr*>(ci->err);
  longjmp(e->jb, 1);
}

static void jpeg_emit_nothing(j_common_ptr, int) {}

bool decode_jpeg(const uint8_t* buf, size_t len, Image* out) {
  if (len < 3 || buf[0] != 0xFF || buf[1] != 0xD8) return false;
  jpeg_decompress_struct ci;
  JpegErr err;
  ci.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_error_exit;
  err.mgr.emit_message = jpeg_emit_nothing;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&ci);
    return false;
  }
  jpeg_create_decompress(&ci);
  jpeg_mem_src(&ci, const_cast<unsigned char*>(buf),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&ci, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&ci);
    return false;
  }
  // RGB out (libjpeg converts YCbCr and expands grayscale); CMYK/YCCK
  // sources fail jpeg_start_decompress and land in the setjmp handler
  ci.out_color_space = JCS_RGB;
  jpeg_start_decompress(&ci);
  if (ci.output_components != 3) {
    jpeg_destroy_decompress(&ci);
    return false;
  }
  out->h = static_cast<int>(ci.output_height);
  out->w = static_cast<int>(ci.output_width);
  out->c = 3;
  out->data.resize(size_t(out->h) * out->w * 3);
  while (ci.output_scanline < ci.output_height) {
    JSAMPROW row = out->data.data() + size_t(ci.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&ci, &row, 1);
  }
  jpeg_finish_decompress(&ci);
  jpeg_destroy_decompress(&ci);
  return true;
}

bool load_image(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(sz));
  size_t rd = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  if (rd != buf.size()) return false;
  if (decode_png(buf.data(), buf.size(), out)) return true;
  if (decode_jpeg(buf.data(), buf.size(), out)) return true;
  return decode_ppm(buf.data(), buf.size(), out);
}

// ---------------------------------------------------------------------------
// Bicubic resize (PIL-compatible: see ofa_sr_tpu/data/bicubic.py)
// ---------------------------------------------------------------------------

static double bicubic_filter(double x) {
  const double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Taps {
  std::vector<int> xmin;
  std::vector<int> count;
  std::vector<double> weights;  // per out pixel: count[i] weights
  int max_count = 0;
};

static Taps make_taps(int in_size, int out_size) {
  Taps t;
  const double support = 2.0;
  const double scale = double(in_size) / out_size;
  const double fs = std::max(scale, 1.0);
  const double sup = support * fs;
  t.xmin.resize(out_size);
  t.count.resize(out_size);
  std::vector<std::vector<double>> rows(out_size);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int lo = std::max(0, int(center - sup + 0.5));
    int hi = std::min(in_size, int(center + sup + 0.5));
    double sum = 0.0;
    rows[xx].resize(hi - lo);
    for (int j = lo; j < hi; ++j) {
      double w = bicubic_filter((j + 0.5 - center) / fs);
      rows[xx][j - lo] = w;
      sum += w;
    }
    for (auto& w : rows[xx]) w /= sum;
    t.xmin[xx] = lo;
    t.count[xx] = hi - lo;
    t.max_count = std::max(t.max_count, hi - lo);
  }
  t.weights.resize(size_t(out_size) * t.max_count, 0.0);
  for (int xx = 0; xx < out_size; ++xx)
    std::copy(rows[xx].begin(), rows[xx].end(),
              t.weights.begin() + size_t(xx) * t.max_count);
  return t;
}

void resize_bicubic_f32(const float* src, int sh, int sw, int c,
                        float* dst, int dh, int dw) {
  Taps tx = make_taps(sw, dw);
  Taps ty = make_taps(sh, dh);
  // horizontal pass: (sh, sw, c) -> (sh, dw, c)
  std::vector<float> tmp(size_t(sh) * dw * c);
  for (int y = 0; y < sh; ++y) {
    for (int x = 0; x < dw; ++x) {
      const double* w = tx.weights.data() + size_t(x) * tx.max_count;
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int k = 0; k < tx.count[x]; ++k)
          acc += w[k] * src[(size_t(y) * sw + tx.xmin[x] + k) * c + ch];
        tmp[(size_t(y) * dw + x) * c + ch] = float(acc);
      }
    }
  }
  // vertical pass: (sh, dw, c) -> (dh, dw, c)
  for (int y = 0; y < dh; ++y) {
    const double* w = ty.weights.data() + size_t(y) * ty.max_count;
    for (int x = 0; x < dw; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int k = 0; k < ty.count[y]; ++k)
          acc += w[k] * tmp[(size_t(ty.xmin[y] + k) * dw + x) * c + ch];
        dst[(size_t(y) * dw + x) * c + ch] = float(acc);
      }
    }
  }
}

void to_float(const Image& img, float* dst) {
  const size_t n = img.data.size();
  for (size_t i = 0; i < n; ++i) dst[i] = img.data[i] / 255.0f;
}

void crop_f32(const float* src, int sh, int sw, int c, int top, int left,
              int th, int tw, float* dst) {
  (void)sh;
  for (int y = 0; y < th; ++y)
    std::memcpy(dst + size_t(y) * tw * c,
                src + (size_t(top + y) * sw + left) * c,
                size_t(tw) * c * sizeof(float));
}

}  // namespace ofa
