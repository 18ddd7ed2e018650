// Multi-Scale Deformable Attention — C++ CPU kernel.
//
// Native counterpart of the reference's vendored CUDA/C++ extension
// (preprocess/oneformer_code/.../ops/src/cpu/ms_deform_attn_cpu.cpp role):
// used by the host-side preprocessing (panoptic segmentation) pipeline
// where TPU round-trips would dominate. Exposed through a plain C ABI and
// bound with ctypes (frameino_tpu/native/__init__.py); no pybind11
// dependency.
//
// Semantics match frameino_tpu/ops/ms_deform_attn.py (grid_sample with
// align_corners=false, zero padding outside).

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// value:              [B, S, H, D]  (S = sum_l H_l * W_l)
// spatial_shapes:     [L, 2] int64 (H_l, W_l)
// sampling_locations: [B, Q, H, L, P, 2] float32 in [0, 1]
// attention_weights:  [B, Q, H, L, P] float32
// output:             [B, Q, H * D] float32 (caller-allocated, zeroed here)
void ms_deform_attn_forward(
    const float* value, const int64_t* spatial_shapes,
    const float* sampling_locations, const float* attention_weights,
    float* output,
    int64_t B, int64_t S, int64_t H, int64_t D,
    int64_t Q, int64_t L, int64_t P) {
  std::memset(output, 0, sizeof(float) * B * Q * H * D);

  // level start offsets
  int64_t offsets[64];
  offsets[0] = 0;
  for (int64_t l = 0; l < L; ++l) {
    offsets[l + 1] =
        offsets[l] + spatial_shapes[2 * l] * spatial_shapes[2 * l + 1];
  }

  for (int64_t b = 0; b < B; ++b) {
    for (int64_t q = 0; q < Q; ++q) {
      for (int64_t h = 0; h < H; ++h) {
        float* out = output + ((b * Q + q) * H + h) * D;
        for (int64_t l = 0; l < L; ++l) {
          const int64_t Hl = spatial_shapes[2 * l];
          const int64_t Wl = spatial_shapes[2 * l + 1];
          const float* vbase = value + ((b * S + offsets[l]) * H + h) * D;
          for (int64_t p = 0; p < P; ++p) {
            const int64_t li =
                ((((b * Q + q) * H + h) * L + l) * P + p) * 2;
            const float w =
                attention_weights[(((b * Q + q) * H + h) * L + l) * P + p];
            const float x = sampling_locations[li] * Wl - 0.5f;
            const float y = sampling_locations[li + 1] * Hl - 0.5f;
            const int64_t x0 = (int64_t)std::floor(x);
            const int64_t y0 = (int64_t)std::floor(y);
            const float fx = x - x0;
            const float fy = y - y0;

            const float cw[4] = {(1 - fx) * (1 - fy), fx * (1 - fy),
                                 (1 - fx) * fy, fx * fy};
            const int64_t xs[4] = {x0, x0 + 1, x0, x0 + 1};
            const int64_t ys[4] = {y0, y0, y0 + 1, y0 + 1};
            for (int c = 0; c < 4; ++c) {
              if (xs[c] < 0 || xs[c] >= Wl || ys[c] < 0 || ys[c] >= Hl)
                continue;
              // value row stride over S is H*D
              const float* vp = vbase + (ys[c] * Wl + xs[c]) * H * D;
              const float scale = w * cw[c];
              for (int64_t d = 0; d < D; ++d) out[d] += scale * vp[d];
            }
          }
        }
      }
    }
  }
}

}  // extern "C"
