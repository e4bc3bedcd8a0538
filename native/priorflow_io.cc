// Native host-side data-pipeline kernels for PriOr-Flow TPU.
//
// The TPU compute path is JAX/XLA/Pallas; this library accelerates the
// *host* side of the input pipeline (the reference burns per-sample Python
// time in .flo parsing and an O(W) python-loop roll augmentation,
// core/utils/augmentor.py:269-279). Exposed via ctypes
// (prior_flow_tpu/data/native.py) with a pure-numpy fallback.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Middlebury .flo decoding (format: magic f32, w i32, h i32, data f32[h*w*2])
// ---------------------------------------------------------------------------

// Returns 0 on success; fills *h, *w. Two-call protocol with pf_read_flo.
int pf_flo_dims(const char* path, int* h, int* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  float magic = 0.f;
  int32_t wi = 0, hi = 0;
  if (std::fread(&magic, 4, 1, f) != 1 || magic != 202021.25f ||
      std::fread(&wi, 4, 1, f) != 1 || std::fread(&hi, 4, 1, f) != 1) {
    std::fclose(f);
    return -2;
  }
  *w = wi;
  *h = hi;
  std::fclose(f);
  return 0;
}

// out must hold h*w*2 floats. wrap_u != 0 additionally wraps the horizontal
// component into [-W/2, W/2) (the 360° dataset convention,
// reference core/datasets.py:137-138).
int pf_read_flo(const char* path, float* out, int h, int w, int wrap_u) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (std::fseek(f, 12, SEEK_SET) != 0) {
    std::fclose(f);
    return -2;
  }
  size_t n = static_cast<size_t>(h) * w * 2;
  if (std::fread(out, 4, n, f) != n) {
    std::fclose(f);
    return -3;
  }
  std::fclose(f);
  if (wrap_u) {
    const float half = w / 2.0f;
    const float full = static_cast<float>(w);
    for (size_t i = 0; i < n; i += 2) {
      float u = out[i] + half;
      u -= full * static_cast<long long>(u / full);
      if (u < 0) u += full;
      out[i] = u - half;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Horizontal roll (the 360° "rotation" augmentation)
// ---------------------------------------------------------------------------

// dst[y, (x + shift) mod w, c] = src[y, x, c]; elem_size in bytes.
void pf_roll(const uint8_t* src, uint8_t* dst, int h, int w, int c,
             int shift, int elem_size) {
  const int row_bytes = w * c * elem_size;
  const int px = c * elem_size;
  int s = shift % w;
  if (s < 0) s += w;
  const int tail = (w - s) * px;  // bytes moving to the right part
  for (int y = 0; y < h; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * row_bytes;
    uint8_t* drow = dst + static_cast<size_t>(y) * row_bytes;
    std::memcpy(drow + s * px, srow, tail);
    std::memcpy(drow, srow + tail, static_cast<size_t>(s) * px);
  }
}

// ---------------------------------------------------------------------------
// Eraser occlusion: paint a mean-colour rectangle into an RGB u8 image
// ---------------------------------------------------------------------------

void pf_erase_rect(uint8_t* img, int h, int w, int x0, int y0, int dx,
                   int dy, const float* color) {
  uint8_t c0 = static_cast<uint8_t>(color[0]);
  uint8_t c1 = static_cast<uint8_t>(color[1]);
  uint8_t c2 = static_cast<uint8_t>(color[2]);
  int y1 = y0 + dy < h ? y0 + dy : h;
  int x1 = x0 + dx < w ? x0 + dx : w;
  for (int y = y0; y < y1; ++y) {
    uint8_t* row = img + (static_cast<size_t>(y) * w + x0) * 3;
    for (int x = x0; x < x1; ++x) {
      row[0] = c0;
      row[1] = c1;
      row[2] = c2;
      row += 3;
    }
  }
}

// ---------------------------------------------------------------------------
// Mean colour of an RGB u8 image (used by the eraser)
// ---------------------------------------------------------------------------

void pf_mean_color(const uint8_t* img, int h, int w, float* out) {
  double acc[3] = {0, 0, 0};
  const size_t n = static_cast<size_t>(h) * w;
  for (size_t i = 0; i < n; ++i) {
    acc[0] += img[i * 3 + 0];
    acc[1] += img[i * 3 + 1];
    acc[2] += img[i * 3 + 2];
  }
  out[0] = static_cast<float>(acc[0] / n);
  out[1] = static_cast<float>(acc[1] / n);
  out[2] = static_cast<float>(acc[2] / n);
}

}  // extern "C"
