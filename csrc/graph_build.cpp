// Native host-side graph building for hydragnn_tpu.
//
// TPU-native replacement for the reference's compiled preprocessing deps
// (vesin neighbor lists, reference usage at
// hydragnn/preprocess/graph_samples_checks_and_updates.py:144-417):
//   * cell-list radius neighbor search, open boundaries and PBC
//     (minimum-image over explicit shift images), max-neighbor truncation
//     sorted by distance,
//   * receiver-sorted edge emission (the layout the Pallas SpMM kernel
//     and XLA's sorted-segment lowering need),
//   * aggregation tile planning (block offsets / counts / local ids) so
//     the per-batch Pallas plans cost C++ loops, not Python.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <tuple>
#include <vector>

extern "C" {

// Open-boundary radius graph.
//   pos:      [n, 3] float32
//   radius, max_neighbors (<=0 means unlimited)
//   out_src/out_dst: caller-allocated int64 buffers of capacity cap
// Returns number of edges written, sorted by receiver then distance;
// returns -needed if cap is too small.
long long radius_graph_open(
    const float* pos, long long n, float radius, long long max_neighbors,
    long long cap, long long* out_src, long long* out_dst) {
  const float r2 = radius * radius;
  // cell list
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (long long i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], pos[3 * i + k]);
      hi[k] = std::max(hi[k], pos[3 * i + k]);
    }
  const float cell = std::max(radius, 1e-6f);
  int dims[3];
  for (int k = 0; k < 3; ++k)
    dims[k] = std::max(1, (int)std::floor((hi[k] - lo[k]) / cell) + 1);
  const long long ncell = (long long)dims[0] * dims[1] * dims[2];
  std::vector<std::vector<int>> buckets(ncell);
  auto cell_of = [&](long long i) {
    long long c[3];
    for (int k = 0; k < 3; ++k) {
      long long v = (long long)((pos[3 * i + k] - lo[k]) / cell);
      c[k] = std::min<long long>(std::max<long long>(v, 0), dims[k] - 1);
    }
    return (c[0] * dims[1] + c[1]) * dims[2] + c[2];
  };
  for (long long i = 0; i < n; ++i) buckets[cell_of(i)].push_back((int)i);

  std::vector<std::pair<float, long long>> nbrs;  // (d2, j) per receiver
  long long count = 0;
  for (long long i = 0; i < n; ++i) {
    nbrs.clear();
    long long ci[3];
    for (int k = 0; k < 3; ++k) {
      long long v = (long long)((pos[3 * i + k] - lo[k]) / cell);
      ci[k] = std::min<long long>(std::max<long long>(v, 0), dims[k] - 1);
    }
    for (long long dx = -1; dx <= 1; ++dx)
      for (long long dy = -1; dy <= 1; ++dy)
        for (long long dz = -1; dz <= 1; ++dz) {
          long long cx = ci[0] + dx, cy = ci[1] + dy, cz = ci[2] + dz;
          if (cx < 0 || cy < 0 || cz < 0 || cx >= dims[0] || cy >= dims[1] ||
              cz >= dims[2])
            continue;
          for (int j : buckets[(cx * dims[1] + cy) * dims[2] + cz]) {
            if (j == i) continue;
            float d2 = 0;
            for (int k = 0; k < 3; ++k) {
              float d = pos[3 * i + k] - pos[3 * j + k];
              d2 += d * d;
            }
            if (d2 <= r2) nbrs.emplace_back(d2, j);
          }
        }
    std::sort(nbrs.begin(), nbrs.end());
    long long keep = (max_neighbors > 0)
                         ? std::min<long long>(nbrs.size(), max_neighbors)
                         : (long long)nbrs.size();
    if (count + keep > cap) {
      // count the rest to report the needed capacity
      long long needed = count + keep;
      for (long long i2 = i + 1; i2 < n; ++i2) needed += max_neighbors > 0 ? max_neighbors : n;
      return -needed;
    }
    for (long long k = 0; k < keep; ++k) {
      out_src[count] = nbrs[k].second;
      out_dst[count] = i;
      ++count;
    }
  }
  return count;
}

// PBC radius graph over explicit shift images.
//   cell: [3,3] row-major lattice vectors; pbc: per-axis flags
//   out_shift: [cap, 3] float32 Cartesian shift s.t.
//     vec = pos[dst] - pos[src] + shift
long long radius_graph_pbc(
    const float* pos, long long n, const float* cellm, const uint8_t* pbc,
    float radius, long long max_neighbors, long long cap, long long* out_src,
    long long* out_dst, float* out_shift) {
  // images needed per axis from plane spacings (|inverse rows|)
  double a[3][3];
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) a[r][c] = cellm[3 * r + c];
  // inverse of cell
  double det = a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1]) -
               a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0]) +
               a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0]);
  if (std::abs(det) < 1e-12) return 0;
  double inv[3][3];
  inv[0][0] = (a[1][1] * a[2][2] - a[1][2] * a[2][1]) / det;
  inv[0][1] = (a[0][2] * a[2][1] - a[0][1] * a[2][2]) / det;
  inv[0][2] = (a[0][1] * a[1][2] - a[0][2] * a[1][1]) / det;
  inv[1][0] = (a[1][2] * a[2][0] - a[1][0] * a[2][2]) / det;
  inv[1][1] = (a[0][0] * a[2][2] - a[0][2] * a[2][0]) / det;
  inv[1][2] = (a[0][2] * a[1][0] - a[0][0] * a[1][2]) / det;
  inv[2][0] = (a[1][0] * a[2][1] - a[1][1] * a[2][0]) / det;
  inv[2][1] = (a[0][1] * a[2][0] - a[0][0] * a[2][1]) / det;
  inv[2][2] = (a[0][0] * a[1][1] - a[0][1] * a[1][0]) / det;
  int nmax[3];
  for (int k = 0; k < 3; ++k) {
    double col = std::sqrt(inv[0][k] * inv[0][k] + inv[1][k] * inv[1][k] +
                           inv[2][k] * inv[2][k]);
    double height = col > 1e-12 ? 1.0 / col : 0.0;
    nmax[k] = pbc[k] && height > 1e-12
                  ? (int)std::ceil(radius / height)
                  : 0;
  }
  const float r2 = radius * radius;
  std::vector<std::tuple<float, long long, float, float, float>> nbrs;
  long long count = 0;
  for (long long i = 0; i < n; ++i) {
    nbrs.clear();
    for (long long j = 0; j < n; ++j) {
      for (int sx = -nmax[0]; sx <= nmax[0]; ++sx)
        for (int sy = -nmax[1]; sy <= nmax[1]; ++sy)
          for (int sz = -nmax[2]; sz <= nmax[2]; ++sz) {
            if (i == j && sx == 0 && sy == 0 && sz == 0) continue;
            float sh[3];
            for (int k = 0; k < 3; ++k)
              sh[k] = sx * (float)a[0][k] + sy * (float)a[1][k] +
                      sz * (float)a[2][k];
            // image of j at pos[j] + sh near i; edge vec = pos[i]-(pos[j]+sh)
            float d2 = 0;
            for (int k = 0; k < 3; ++k) {
              float d = pos[3 * j + k] + sh[k] - pos[3 * i + k];
              d2 += d * d;
            }
            if (d2 <= r2)
              nbrs.emplace_back(d2, j, -sh[0], -sh[1], -sh[2]);
          }
    }
    std::sort(nbrs.begin(), nbrs.end(),
              [](const auto& x, const auto& y) {
                return std::get<0>(x) < std::get<0>(y);
              });
    long long keep = (max_neighbors > 0)
                         ? std::min<long long>(nbrs.size(), max_neighbors)
                         : (long long)nbrs.size();
    if (keep == 0 && max_neighbors != -2) {
      // artificial self edge for isolated nodes (reference :300-322)
      if (count + 1 > cap) return -(count + 1);
      out_src[count] = i;
      out_dst[count] = i;
      out_shift[3 * count] = out_shift[3 * count + 1] =
          out_shift[3 * count + 2] = 0.f;
      ++count;
      continue;
    }
    if (count + keep > cap) return -(count + keep + (n - i) * std::max<long long>(max_neighbors, 8));
    for (long long k = 0; k < keep; ++k) {
      out_src[count] = std::get<1>(nbrs[k]);
      out_dst[count] = i;
      out_shift[3 * count] = std::get<2>(nbrs[k]);
      out_shift[3 * count + 1] = std::get<3>(nbrs[k]);
      out_shift[3 * count + 2] = std::get<4>(nbrs[k]);
      ++count;
    }
  }
  return count;
}

// Aggregation tile plan (mirrors ops/pallas_segment.plan_segment_tiles).
//   receivers: [E] int32 sorted; mask: [E] uint8
//   outputs: offsets [T*MB] int32, nblocks [T] int32, sid [T*MB*TE] int32
// Returns 0 on success, -1 if a tile needs more than MB blocks.
int plan_segment_tiles(
    const int* receivers, const uint8_t* mask, long long E, long long n_node,
    int TN, int TE, int MB, int* out_off, int* out_nb, int* out_sid) {
  const long long T = (n_node + TN - 1) / TN;
  std::vector<long long> starts(T, E), ends(T, 0);
  for (long long t = 0; t < T; ++t) { starts[t] = E; ends[t] = 0; }
  for (long long e = 0; e < E; ++e) {
    if (!mask[e]) continue;
    long long t = receivers[e] / TN;
    if (t >= T) continue;
    starts[t] = std::min(starts[t], e);
    ends[t] = std::max(ends[t], e + 1);
  }
  std::memset(out_off, 0, sizeof(int) * T * MB);
  std::memset(out_nb, 0, sizeof(int) * T);
  for (long long i = 0; i < T * (long long)MB * TE; ++i) out_sid[i] = -1;
  for (long long t = 0; t < T; ++t) {
    if (ends[t] <= 0 || starts[t] >= E) continue;
    long long sa = (starts[t] / 8) * 8;
    long long nb = (ends[t] - sa + TE - 1) / TE;
    if (nb > MB) return -1;
    out_nb[t] = (int)nb;
    for (long long b = 0; b < nb; ++b) {
      long long off = sa + b * TE;
      out_off[t * MB + b] = (int)off;
      int* sid = out_sid + (t * MB + b) * TE;
      for (long long k = 0; k < TE; ++k) {
        long long e = off + k;
        if (e >= E || !mask[e]) continue;
        long long local = (long long)receivers[e] - t * TN;
        if (local >= 0 && local < TN) sid[k] = (int)local;
      }
    }
  }
  return 0;
}

}  // extern "C"
