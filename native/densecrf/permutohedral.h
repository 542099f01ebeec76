// Permutohedral-lattice high-dimensional Gaussian filtering
// (Adams, Baek & Davis, "Fast High-Dimensional Filtering Using the
// Permutohedral Lattice", EG 2010) — the filter underlying fully-connected
// CRF inference (Krähenbühl & Koltun, NeurIPS 2011).
//
// Independent implementation for the dupl_tpu native CRF; serves as the
// bit-level parity oracle the reference gets from pydensecrf
// (reference: utils/dcrf.py:42-68).
#pragma once

#include <cstdint>
#include <unordered_map>
#include <vector>

namespace duplcrf {

class Permutohedral {
 public:
  // features: d x n column-major per point (feature j of point i at
  // features[i*d + j]).
  void init(const float* features, int d, int n);

  // Filter `value_size` channels: in/out are n x value_size (point-major).
  // Symmetric normalization is applied so that filtering an all-ones signal
  // returns (approximately) all ones.
  void compute(float* out, const float* in, int value_size) const;

 private:
  int d_ = 0;       // feature dimension
  int n_ = 0;       // number of points
  int m_ = 0;       // number of occupied lattice points
  // For each input point: d_+1 vertex indices and barycentric weights.
  std::vector<int32_t> offset_;   // n * (d+1)
  std::vector<float> barycentric_;  // n * (d+1)
  // Blur neighbor tables: for each lattice point and axis, indices of the
  // two neighbors along that axis (-1 if absent).
  std::vector<int32_t> blur_n1_;  // m * (d+1)
  std::vector<int32_t> blur_n2_;  // m * (d+1)
  std::vector<float> norm_;       // per-point symmetric normalization
};

}  // namespace duplcrf
