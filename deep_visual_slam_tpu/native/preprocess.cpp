// Native host-side image preprocessing for the TPU data loader.
//
// The reference's native runtime surface is its CPU data path (24 torch
// DataLoader worker processes, SURVEY.md §2.6); this is the equivalent
// native component for the TPU loader: a fused
//   uint8 HWC -> bilinear resize -> float32 [0,1] (optionally RGB<->BGR)
// pass over an OpenMP thread pool. Fusing the resize with the dtype
// conversion avoids the intermediate uint8-resized and float-converted
// buffers the cv2.resize + astype/255 path materializes, and batches any
// number of frames per call (one Python->C transition per batch).
//
// Built by utils/native_build.py with g++ -O3 -fopenmp; exposed via ctypes
// (no pybind11 in this image). Python fallback: cv2 (data/base.py).

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// One image: src [sh, sw, 3] uint8 -> dst [dh, dw, 3] float32 in [0,1].
// Bilinear with half-pixel centers (cv2.INTER_LINEAR convention).
// swap_rb: exchange channels 0/2 (BGR -> RGB) during the same pass.
void resize_normalize_u8_f32(
    const uint8_t* src, int sh, int sw,
    float* dst, int dh, int dw,
    int swap_rb) {
  const float scale_y = static_cast<float>(sh) / dh;
  const float scale_x = static_cast<float>(sw) / dw;
  const float inv255 = 1.0f / 255.0f;

  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * scale_y - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    int y0 = static_cast<int>(fy);
    y0 = std::min(y0, sh - 2 >= 0 ? sh - 2 : 0);
    const float wy = fy - y0;
    const int y1 = std::min(y0 + 1, sh - 1);

    const uint8_t* row0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* row1 = src + static_cast<size_t>(y1) * sw * 3;
    float* out = dst + static_cast<size_t>(y) * dw * 3;

    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * scale_x - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
      int x0 = static_cast<int>(fx);
      x0 = std::min(x0, sw - 2 >= 0 ? sw - 2 : 0);
      const float wx = fx - x0;
      const int x1 = std::min(x0 + 1, sw - 1);

      const float w00 = (1 - wy) * (1 - wx);
      const float w01 = (1 - wy) * wx;
      const float w10 = wy * (1 - wx);
      const float w11 = wy * wx;

      for (int c = 0; c < 3; ++c) {
        const int sc = swap_rb ? 2 - c : c;
        const float v = w00 * row0[x0 * 3 + sc] + w01 * row0[x1 * 3 + sc] +
                        w10 * row1[x0 * 3 + sc] + w11 * row1[x1 * 3 + sc];
        out[x * 3 + c] = v * inv255;
      }
    }
  }
}

// Batch entry: n images of identical source size, parallel over images
// (and rows within an image when n is small).
void resize_normalize_batch(
    const uint8_t* src, int n, int sh, int sw,
    float* dst, int dh, int dw,
    int swap_rb) {
  const size_t src_stride = static_cast<size_t>(sh) * sw * 3;
  const size_t dst_stride = static_cast<size_t>(dh) * dw * 3;
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < n; ++i) {
    resize_normalize_u8_f32(
        src + i * src_stride, sh, sw, dst + i * dst_stride, dh, dw, swap_rb);
  }
}

// Fused color-jitter (brightness/contrast/saturation) over a float batch,
// in place: the tail of the host augmentation pipeline
// (hue stays in Python/cv2 — it needs HSV).
void jitter_batch(
    float* data, int n, int h, int w,
    float brightness, float contrast, float saturation) {
  const size_t npix_img = static_cast<size_t>(h) * w;
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < n; ++i) {
    float* img = data + i * npix_img * 3;
    // Per-image contrast pivot (matches data/base.py color_jitter which
    // takes the mean over each image independently).
    double sum = 0.0;
    for (size_t j = 0; j < npix_img * 3; ++j) sum += img[j] * brightness;
    const float mean = static_cast<float>(sum / (npix_img * 3));
    for (size_t p = 0; p < npix_img; ++p) {
      float* px = img + p * 3;
      float r = px[0] * brightness, g = px[1] * brightness,
            b = px[2] * brightness;
      r = (r - mean) * contrast + mean;
      g = (g - mean) * contrast + mean;
      b = (b - mean) * contrast + mean;
      const float gray = 0.299f * r + 0.587f * g + 0.114f * b;
      r = (r - gray) * saturation + gray;
      g = (g - gray) * saturation + gray;
      b = (b - gray) * saturation + gray;
      px[0] = std::min(1.0f, std::max(0.0f, r));
      px[1] = std::min(1.0f, std::max(0.0f, g));
      px[2] = std::min(1.0f, std::max(0.0f, b));
    }
  }
}

}  // extern "C"
