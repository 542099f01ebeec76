#include "permutohedral.h"

#include <algorithm>
#include <cmath>
#include <cstring>

namespace duplcrf {
namespace {

// Open-addressing hash table over flat int16 keys of fixed length kd.
// Key convention: the first d coordinates of a lattice point (the (d+1)-th is
// redundant — coordinates sum to 0).
class KeyTable {
 public:
  KeyTable(int kd, size_t expected) : kd_(kd) {
    capacity_ = 16;
    while (capacity_ < expected * 2) capacity_ <<= 1;
    slots_.assign(capacity_, -1);
    keys_.reserve(expected * kd);
  }

  int size() const { return static_cast<int>(keys_.size() / kd_); }

  const int16_t* key(int idx) const { return keys_.data() + static_cast<size_t>(idx) * kd_; }

  // Returns the index of `k`, inserting if absent.
  int find_or_insert(const int16_t* k) {
    size_t h = hash(k) & (capacity_ - 1);
    while (true) {
      int slot = slots_[h];
      if (slot < 0) {
        const int idx = size();
        keys_.insert(keys_.end(), k, k + kd_);
        slots_[h] = idx;
        if (static_cast<size_t>(size()) * 2 > capacity_) grow();
        return idx;
      }
      if (equal(key(slot), k)) return slot;
      h = (h + 1) & (capacity_ - 1);
    }
  }

  // Lookup only; -1 if absent.
  int find(const int16_t* k) const {
    size_t h = hash(k) & (capacity_ - 1);
    while (true) {
      int slot = slots_[h];
      if (slot < 0) return -1;
      if (equal(key(slot), k)) return slot;
      h = (h + 1) & (capacity_ - 1);
    }
  }

 private:
  size_t hash(const int16_t* k) const {
    size_t r = 0;
    for (int i = 0; i < kd_; ++i) r = r * 2531011u + static_cast<uint16_t>(k[i]);
    return r;
  }

  bool equal(const int16_t* a, const int16_t* b) const {
    return std::memcmp(a, b, sizeof(int16_t) * kd_) == 0;
  }

  void grow() {
    capacity_ <<= 1;
    slots_.assign(capacity_, -1);
    const int n = size();
    for (int i = 0; i < n; ++i) {
      size_t h = hash(key(i)) & (capacity_ - 1);
      while (slots_[h] >= 0) h = (h + 1) & (capacity_ - 1);
      slots_[h] = i;
    }
  }

  int kd_;
  size_t capacity_;
  std::vector<int> slots_;
  std::vector<int16_t> keys_;
};

}  // namespace

void Permutohedral::init(const float* features, int d, int n) {
  d_ = d;
  n_ = n;
  const int dp1 = d + 1;
  offset_.assign(static_cast<size_t>(n) * dp1, 0);
  barycentric_.assign(static_cast<size_t>(n) * dp1, 0.f);

  // Scaling so the expected embedded-point spacing matches the lattice
  // (standard permutohedral construction).
  std::vector<float> scale(d);
  const float inv_std = std::sqrt(2.f / 3.f) * dp1;
  for (int i = 0; i < d; ++i)
    scale[i] = inv_std / std::sqrt(static_cast<float>((i + 1) * (i + 2)));

  KeyTable table(d, static_cast<size_t>(n) * dp1 / 2);

  std::vector<float> elevated(dp1), rem0(dp1), bary(dp1 + 2);
  std::vector<int> rank(dp1);
  std::vector<int16_t> key(d);

  for (int p = 0; p < n; ++p) {
    const float* f = features + static_cast<size_t>(p) * d;

    // Embed into the hyperplane sum(x)=0 (backward sweep of the E matrix).
    float sm = 0.f;
    for (int j = d; j > 0; --j) {
      const float cf = f[j - 1] * scale[j - 1];
      elevated[j] = sm - j * cf;
      sm += cf;
    }
    elevated[0] = sm;

    // Nearest remainder-0 lattice point (round to multiples of d+1).
    int sum = 0;
    for (int i = 0; i <= d; ++i) {
      const float v = elevated[i] / dp1;
      const float up = std::ceil(v) * dp1;
      const float down = std::floor(v) * dp1;
      rem0[i] = (up - elevated[i] < elevated[i] - down) ? up : down;
      sum += static_cast<int>(std::lround(rem0[i] / dp1));
    }

    // Rank differentials to identify the enclosing simplex.
    std::fill(rank.begin(), rank.end(), 0);
    for (int i = 0; i < d; ++i)
      for (int j = i + 1; j <= d; ++j) {
        if (elevated[i] - rem0[i] < elevated[j] - rem0[j]) ++rank[i];
        else ++rank[j];
      }

    // Fix points rounded outside the canonical simplex.
    for (int i = 0; i <= d; ++i) {
      rank[i] += sum;
      if (rank[i] < 0) { rank[i] += dp1; rem0[i] += dp1; }
      else if (rank[i] > d) { rank[i] -= dp1; rem0[i] -= dp1; }
    }

    // Barycentric coordinates from sorted residuals.
    std::fill(bary.begin(), bary.end(), 0.f);
    for (int i = 0; i <= d; ++i) {
      const float delta = (elevated[i] - rem0[i]) / dp1;
      bary[d - rank[i]] += delta;
      bary[d + 1 - rank[i]] -= delta;
    }
    bary[0] += 1.f + bary[dp1];

    // Splat targets: the d+1 simplex vertices.
    for (int r = 0; r <= d; ++r) {
      for (int i = 0; i < d; ++i)
        key[i] = static_cast<int16_t>(std::lround(rem0[i]) +
                                      (rank[i] > d - r ? r - dp1 : r));
      offset_[static_cast<size_t>(p) * dp1 + r] = table.find_or_insert(key.data());
      barycentric_[static_cast<size_t>(p) * dp1 + r] = bary[r];
    }
  }

  m_ = table.size();

  // Blur neighbor tables: neighbors along axis a are key -+ e_a with
  // e_a = (+1,...,+1,-d,+1,...,+1).
  blur_n1_.assign(static_cast<size_t>(m_) * dp1, -1);
  blur_n2_.assign(static_cast<size_t>(m_) * dp1, -1);
  std::vector<int16_t> nkey(d);
  for (int j = 0; j < m_; ++j) {
    const int16_t* k = table.key(j);
    for (int a = 0; a <= d; ++a) {
      for (int i = 0; i < d; ++i) nkey[i] = static_cast<int16_t>(k[i] + 1);
      if (a < d) nkey[a] = static_cast<int16_t>(k[a] - d);
      blur_n1_[static_cast<size_t>(j) * dp1 + a] = table.find(nkey.data());

      for (int i = 0; i < d; ++i) nkey[i] = static_cast<int16_t>(k[i] - 1);
      if (a < d) nkey[a] = static_cast<int16_t>(k[a] + d);
      blur_n2_[static_cast<size_t>(j) * dp1 + a] = table.find(nkey.data());
    }
  }

  // Symmetric normalization: norm = 1/sqrt(filter(ones)).
  norm_.assign(n_, 1.f);
  std::vector<float> ones(n_, 1.f), out(n_);
  compute(out.data(), ones.data(), 1);
  for (int i = 0; i < n_; ++i)
    norm_[i] = 1.f / std::sqrt(std::max(out[i], 1e-20f));
}

void Permutohedral::compute(float* out, const float* in, int vs) const {
  const int dp1 = d_ + 1;
  std::vector<float> values(static_cast<size_t>(m_) * vs, 0.f);
  std::vector<float> new_values(static_cast<size_t>(m_) * vs, 0.f);

  // Splat (pre-normalised).
  for (int p = 0; p < n_; ++p) {
    const float np = norm_[p];
    const float* src = in + static_cast<size_t>(p) * vs;
    for (int r = 0; r <= d_; ++r) {
      const int o = offset_[static_cast<size_t>(p) * dp1 + r];
      const float w = barycentric_[static_cast<size_t>(p) * dp1 + r] * np;
      float* dst = &values[static_cast<size_t>(o) * vs];
      for (int v = 0; v < vs; ++v) dst[v] += w * src[v];
    }
  }

  // Blur along each lattice direction with [1, 2, 1] / 2.
  for (int a = 0; a <= d_; ++a) {
    for (int j = 0; j < m_; ++j) {
      const int o1 = blur_n1_[static_cast<size_t>(j) * dp1 + a];
      const int o2 = blur_n2_[static_cast<size_t>(j) * dp1 + a];
      const float* c = &values[static_cast<size_t>(j) * vs];
      const float* l = o1 >= 0 ? &values[static_cast<size_t>(o1) * vs] : nullptr;
      const float* r = o2 >= 0 ? &values[static_cast<size_t>(o2) * vs] : nullptr;
      float* dst = &new_values[static_cast<size_t>(j) * vs];
      for (int v = 0; v < vs; ++v) {
        float acc = 2.f * c[v];
        if (l) acc += l[v];
        if (r) acc += r[v];
        dst[v] = acc * 0.5f;
      }
    }
    values.swap(new_values);
  }

  // Slice (post-normalised).
  for (int p = 0; p < n_; ++p) {
    float* dst = out + static_cast<size_t>(p) * vs;
    std::memset(dst, 0, sizeof(float) * vs);
    const float np = norm_[p];
    for (int r = 0; r <= d_; ++r) {
      const int o = offset_[static_cast<size_t>(p) * dp1 + r];
      const float w = barycentric_[static_cast<size_t>(p) * dp1 + r] * np;
      const float* src = &values[static_cast<size_t>(o) * vs];
      for (int v = 0; v < vs; ++v) dst[v] += w * src[v];
    }
  }
}

}  // namespace duplcrf
