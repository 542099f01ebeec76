// Fully-connected CRF mean-field inference (Krähenbühl & Koltun 2011) with a
// Gaussian (x, y) kernel and a bilateral (x, y, r, g, b) kernel — the native
// equivalent of the reference's pydensecrf post-processing
// (utils/dcrf.py:42-68, params tools/eval_seg_voc.py:104-111).
//
// Multi-threaded over images at the Python layer (the ctypes call releases
// the GIL); this translation unit is single-image.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

#include "permutohedral.h"

using duplcrf::Permutohedral;

extern "C" {

// probs:  C x H x W softmax probabilities (class-major, like the reference
//         feeds unary_from_softmax).
// image:  H x W x 3 uint8 RGB.
// out:    C x H x W marginals after iter_max mean-field iterations.
void dense_crf_inference(const float* probs, const unsigned char* image,
                         int H, int W, int C, int iter_max,
                         float pos_w, float pos_xy_std,
                         float bi_w, float bi_xy_std, float bi_rgb_std,
                         float* out) {
  const int n = H * W;

  // ---- build filters -------------------------------------------------------
  std::vector<float> feat2(static_cast<size_t>(n) * 2);
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) {
      feat2[(static_cast<size_t>(y) * W + x) * 2 + 0] = x / pos_xy_std;
      feat2[(static_cast<size_t>(y) * W + x) * 2 + 1] = y / pos_xy_std;
    }
  Permutohedral pos_lattice;
  pos_lattice.init(feat2.data(), 2, n);

  std::vector<float> feat5(static_cast<size_t>(n) * 5);
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) {
      const size_t i = static_cast<size_t>(y) * W + x;
      feat5[i * 5 + 0] = x / bi_xy_std;
      feat5[i * 5 + 1] = y / bi_xy_std;
      feat5[i * 5 + 2] = image[i * 3 + 0] / bi_rgb_std;
      feat5[i * 5 + 3] = image[i * 3 + 1] / bi_rgb_std;
      feat5[i * 5 + 4] = image[i * 3 + 2] / bi_rgb_std;
    }
  Permutohedral bi_lattice;
  bi_lattice.init(feat5.data(), 5, n);

  // ---- unary = -log(prob), point-major layout ------------------------------
  std::vector<float> unary(static_cast<size_t>(n) * C);
  for (int c = 0; c < C; ++c)
    for (int i = 0; i < n; ++i)
      unary[static_cast<size_t>(i) * C + c] =
          -std::log(std::max(probs[static_cast<size_t>(c) * n + i], 1e-20f));

  // ---- mean field -----------------------------------------------------------
  std::vector<float> Q(static_cast<size_t>(n) * C);
  std::vector<float> tmp_pos(static_cast<size_t>(n) * C);
  std::vector<float> tmp_bi(static_cast<size_t>(n) * C);

  // init: Q = softmax(-unary) == renormalised probs
  for (int i = 0; i < n; ++i) {
    float mx = -1e30f;
    for (int c = 0; c < C; ++c) mx = std::max(mx, -unary[static_cast<size_t>(i) * C + c]);
    float s = 0.f;
    for (int c = 0; c < C; ++c) {
      const float e = std::exp(-unary[static_cast<size_t>(i) * C + c] - mx);
      Q[static_cast<size_t>(i) * C + c] = e;
      s += e;
    }
    for (int c = 0; c < C; ++c) Q[static_cast<size_t>(i) * C + c] /= s;
  }

  for (int it = 0; it < iter_max; ++it) {
    pos_lattice.compute(tmp_pos.data(), Q.data(), C);
    bi_lattice.compute(tmp_bi.data(), Q.data(), C);
    for (int i = 0; i < n; ++i) {
      float mx = -1e30f;
      float* q = &Q[static_cast<size_t>(i) * C];
      const float* u = &unary[static_cast<size_t>(i) * C];
      const float* mp = &tmp_pos[static_cast<size_t>(i) * C];
      const float* mb = &tmp_bi[static_cast<size_t>(i) * C];
      // Potts compatibility: energy(l) = U(l) - w * message(l) (the
      // label-independent sum drops in the softmax).
      for (int c = 0; c < C; ++c) {
        q[c] = -u[c] + pos_w * mp[c] + bi_w * mb[c];
        mx = std::max(mx, q[c]);
      }
      float s = 0.f;
      for (int c = 0; c < C; ++c) { q[c] = std::exp(q[c] - mx); s += q[c]; }
      for (int c = 0; c < C; ++c) q[c] /= s;
    }
  }

  // out in class-major layout
  for (int c = 0; c < C; ++c)
    for (int i = 0; i < n; ++i)
      out[static_cast<size_t>(c) * n + i] = Q[static_cast<size_t>(i) * C + c];
}

}  // extern "C"
