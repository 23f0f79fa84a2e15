// Native image pipeline for ofa_sr_tpu (the TPU-host analogue of the
// reference's C-backed DataLoader fork, my_data_loader.py:12-13).
// PNG (zlib) + JPEG (libjpeg) decode, PIL-compatible bicubic resize, crops.
#pragma once

#include <cstddef>
#include <cstdint>
#include <vector>

namespace ofa {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, row-major
};

// Decode an 8-bit non-interlaced PNG (gray / RGB / RGBA / palette) into RGB.
// Returns false on unsupported or corrupt input.
bool decode_png(const uint8_t* buf, size_t len, Image* out);

// Decode a binary PPM (P6).
bool decode_ppm(const uint8_t* buf, size_t len, Image* out);

// Decode a baseline/progressive JPEG (libjpeg) into RGB; grayscale sources
// are expanded, CMYK is rejected. Returns false on unsupported or corrupt
// input.
bool decode_jpeg(const uint8_t* buf, size_t len, Image* out);

// Load + decode by file extension. Returns false on failure.
bool load_image(const char* path, Image* out);

// PIL-compatible bicubic resize (Keys a=-0.5, support 2, antialiased on
// downscale, edge-renormalized taps), float32 HWC in [0,1].
void resize_bicubic_f32(const float* src, int sh, int sw, int c,
                        float* dst, int dh, int dw);

// uint8 HWC -> float32 HWC in [0,1].
void to_float(const Image& img, float* dst);

// crops on float32 HWC buffers
void crop_f32(const float* src, int sh, int sw, int c, int top, int left,
              int th, int tw, float* dst);

}  // namespace ofa
