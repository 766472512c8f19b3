// Native runtime components for unified_cvo_tpu.
//
// The reference keeps its measurement-processing hot path in native code
// (vendored libelas stereo matcher, thirdparty/libelas/, ~11k LoC C++/SSE;
// reference src/utils/StaticStereo.cpp:22-63 drives it). This library is the
// TPU-framework equivalent: a from-scratch census/semi-global stereo matcher
// plus a hash-grid voxel downsampler, exported with a plain C ABI consumed
// via ctypes (unified_cvo_tpu/native/__init__.py).
//
// Build: make -C native   (produces libcvo_native.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kCensusR = 2;  // 5x5 census window

inline int popcount32(uint32_t v) { return __builtin_popcount(v); }

// 5x5 census transform (24-bit signature per pixel).
void census_transform(const uint8_t* img, int h, int w, uint32_t* out) {
  const int R = kCensusR;
  auto worker = [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      for (int x = 0; x < w; ++x) {
        uint32_t sig = 0;
        const uint8_t c = img[y * w + x];
        for (int dy = -R; dy <= R; ++dy) {
          for (int dx = -R; dx <= R; ++dx) {
            if (dy == 0 && dx == 0) continue;
            int yy = std::min(std::max(y + dy, 0), h - 1);
            int xx = std::min(std::max(x + dx, 0), w - 1);
            sig = (sig << 1) | (img[yy * w + xx] < c ? 1u : 0u);
          }
        }
        out[y * w + x] = sig;
      }
    }
  };
  int nt = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> ts;
  int rows = (h + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int y0 = t * rows, y1 = std::min(h, y0 + rows);
    if (y0 < y1) ts.emplace_back(worker, y0, y1);
  }
  for (auto& t : ts) t.join();
}

// One horizontal scanline pass of SGM cost aggregation (rows are
// independent -> threaded). agg += min-path-cost along direction (dx, 0).
void aggregate_dir(const uint16_t* cost, int h, int w, int D, int dx, int dy,
                   int P1, int P2, uint32_t* agg) {
  int xs = dx >= 0 ? 0 : w - 1, xe = dx >= 0 ? w : -1, xstep = dx >= 0 ? 1 : -1;
  (void)dy;
  {
    auto worker2 = [&](int y0, int y1) {
      std::vector<uint16_t> Lp(D), Lc(D);
      for (int y = y0; y < y1; ++y) {
        uint16_t minprev = 0;
        bool first = true;
        for (int x = xs; x != xe; x += xstep) {
          const uint16_t* c = cost + (static_cast<size_t>(y) * w + x) * D;
          uint32_t* a = agg + (static_cast<size_t>(y) * w + x) * D;
          uint16_t mincur = std::numeric_limits<uint16_t>::max();
          for (int d = 0; d < D; ++d) {
            uint32_t v = c[d];
            if (!first) {
              uint32_t best = Lp[d];
              if (d > 0) best = std::min<uint32_t>(best, Lp[d - 1] + P1);
              if (d < D - 1) best = std::min<uint32_t>(best, Lp[d + 1] + P1);
              best = std::min<uint32_t>(best, static_cast<uint32_t>(minprev) + P2);
              v += best - minprev;
            }
            uint16_t vv = static_cast<uint16_t>(std::min<uint32_t>(v, 60000));
            Lc[d] = vv;
            a[d] += vv;
            if (vv < mincur) mincur = vv;
          }
          std::swap(Lp, Lc);
          minprev = mincur;
          first = false;
        }
      }
    };
    int nt = std::max(1u, std::thread::hardware_concurrency());
    std::vector<std::thread> ts;
    int rows = (h + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
      int y0 = t * rows, y1 = std::min(h, y0 + rows);
      if (y0 < y1) ts.emplace_back(worker2, y0, y1);
    }
    for (auto& t : ts) t.join();
  }
}

// Same vertical/diagonal pass writing its OWN u16 volume (assignment, not
// accumulation): the four non-horizontal passes are mutually independent,
// so the driver runs them on four concurrent threads into private buffers
// and reduces afterwards — one pass of wall time instead of four.
void aggregate_dir_u16(const uint16_t* cost, int h, int w, int D, int dx,
                       int dy, int P1, int P2, uint16_t* out) {
  int ys = dy >= 0 ? 0 : h - 1, ye = dy >= 0 ? h : -1, ystep = dy >= 0 ? 1 : -1;
  std::vector<uint16_t> L(static_cast<size_t>(w) * D);
  std::vector<uint16_t> Lrow_prev(static_cast<size_t>(w) * D, 0);
  std::vector<uint16_t> minrow_prev(w, 0);
  std::vector<uint8_t> valid_prev(w, 0);
  std::vector<uint16_t> minrow_cur(w, 0);
  std::vector<uint8_t> valid_cur(w, 0);
  for (int y = ys; y != ye; y += ystep) {
    for (int x = 0; x < w; ++x) {
      int px = x - dx;  // predecessor column in the previous row
      const uint16_t* c = cost + (static_cast<size_t>(y) * w + x) * D;
      uint16_t* a = out + (static_cast<size_t>(y) * w + x) * D;
      uint16_t* Lc = L.data() + static_cast<size_t>(x) * D;
      bool has_prev = (y != ys) && px >= 0 && px < w && valid_prev[px];
      const uint16_t* Lp = Lrow_prev.data() + static_cast<size_t>(std::min(std::max(px, 0), w - 1)) * D;
      uint16_t minprev = has_prev ? minrow_prev[px] : 0;
      uint16_t mincur = std::numeric_limits<uint16_t>::max();
      for (int d = 0; d < D; ++d) {
        uint32_t v = c[d];
        if (has_prev) {
          uint32_t best = Lp[d];
          if (d > 0) best = std::min<uint32_t>(best, Lp[d - 1] + P1);
          if (d < D - 1) best = std::min<uint32_t>(best, Lp[d + 1] + P1);
          best = std::min<uint32_t>(best, static_cast<uint32_t>(minprev) + P2);
          v += best - minprev;
        }
        uint16_t vv = static_cast<uint16_t>(std::min<uint32_t>(v, 60000));
        Lc[d] = vv;
        a[d] = vv;
        if (vv < mincur) mincur = vv;
      }
      minrow_cur[x] = mincur;
      valid_cur[x] = 1;
    }
    std::swap(L, Lrow_prev);
    std::swap(minrow_cur, minrow_prev);
    std::swap(valid_cur, valid_prev);
  }
}

}  // namespace

extern "C" {

// Semi-global stereo matching. left/right: [h*w] uint8 grayscale.
// disparity_out: [h*w] float32, <= 0 where invalid.
// Returns 0 on success.
int cvo_sgm_disparity(const uint8_t* left, const uint8_t* right, int h, int w,
                      int max_disp, int p1, int p2, float uniqueness,
                      float* disparity_out) {
  if (h <= 0 || w <= 0 || max_disp <= 0 || max_disp > 256) return -1;
  const int D = max_disp;
  std::vector<uint32_t> cl(static_cast<size_t>(h) * w), cr(static_cast<size_t>(h) * w);
  census_transform(left, h, w, cl.data());
  census_transform(right, h, w, cr.data());

  // matching cost: census hamming distance
  std::vector<uint16_t> cost(static_cast<size_t>(h) * w * D);
  {
    auto worker = [&](int y0, int y1) {
      for (int y = y0; y < y1; ++y) {
        for (int x = 0; x < w; ++x) {
          uint16_t* c = cost.data() + (static_cast<size_t>(y) * w + x) * D;
          uint32_t sig = cl[y * w + x];
          for (int d = 0; d < D; ++d) {
            int xr = x - d;
            c[d] = (xr >= 0)
                       ? static_cast<uint16_t>(popcount32(sig ^ cr[y * w + xr]))
                       : static_cast<uint16_t>(24);
          }
        }
      }
    };
    int nt = std::max(1u, std::thread::hardware_concurrency());
    std::vector<std::thread> ts;
    int rows = (h + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
      int y0 = t * rows, y1 = std::min(h, y0 + rows);
      if (y0 < y1) ts.emplace_back(worker, y0, y1);
    }
    for (auto& t : ts) t.join();
  }

  // 6-path aggregation: the 2 horizontal passes thread over rows and
  // accumulate straight into agg; the 4 vertical/diagonal passes (whose
  // scanline recurrences serialize rows) run CONCURRENTLY into private
  // u16 volumes, reduced below — one pass of wall time instead of four.
  std::vector<uint32_t> agg(static_cast<size_t>(h) * w * D, 0);
  aggregate_dir(cost.data(), h, w, D, 1, 0, p1, p2, agg.data());
  aggregate_dir(cost.data(), h, w, D, -1, 0, p1, p2, agg.data());
  {
    const int dirs[4][2] = {{0, 1}, {0, -1}, {1, 1}, {-1, -1}};
    std::vector<std::vector<uint16_t>> bufs(4);
    std::vector<std::thread> ts;
    for (int k = 0; k < 4; ++k) {
      bufs[k].resize(static_cast<size_t>(h) * w * D);
      ts.emplace_back([&, k] {
        aggregate_dir_u16(cost.data(), h, w, D, dirs[k][0], dirs[k][1], p1,
                          p2, bufs[k].data());
      });
    }
    for (auto& t : ts) t.join();
    const size_t total = static_cast<size_t>(h) * w * D;
    int nt = std::max(1u, std::thread::hardware_concurrency());
    std::vector<std::thread> rs;
    size_t chunk = (total + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
      size_t i0 = t * chunk, i1 = std::min(total, i0 + chunk);
      if (i0 >= i1) break;
      rs.emplace_back([&, i0, i1] {
        for (size_t i = i0; i < i1; ++i)
          agg[i] += static_cast<uint32_t>(bufs[0][i]) + bufs[1][i] +
                    bufs[2][i] + bufs[3][i];
      });
    }
    for (auto& t : rs) t.join();
  }

  // WTA + uniqueness + subpixel, then left-right consistency
  std::vector<float> disp_l(static_cast<size_t>(h) * w, -1.0f);
  std::vector<float> disp_r(static_cast<size_t>(h) * w, -1.0f);
  {
    auto worker = [&](int y0, int y1) {
      for (int y = y0; y < y1; ++y) {
        // left disparity
        for (int x = 0; x < w; ++x) {
          const uint32_t* a = agg.data() + (static_cast<size_t>(y) * w + x) * D;
          int best = 0;
          uint32_t bc = a[0];
          for (int d = 1; d < D; ++d)
            if (a[d] < bc) { bc = a[d]; best = d; }
          // uniqueness: second-best excluding the winner's neighbors
          uint32_t second = std::numeric_limits<uint32_t>::max();
          for (int d = 0; d < D; ++d)
            if (std::abs(d - best) > 1 && a[d] < second) second = a[d];
          if (second != std::numeric_limits<uint32_t>::max() &&
              bc * (1.0f + uniqueness) > second)
            continue;  // ambiguous
          float d = static_cast<float>(best);
          if (best > 0 && best < D - 1) {
            float c0 = a[best - 1], c1 = a[best], c2 = a[best + 1];
            float denom = c0 - 2 * c1 + c2;
            if (denom > 1e-6f) d += 0.5f * (c0 - c2) / denom;
          }
          disp_l[y * w + x] = d;
        }
        // right disparity from the same aggregated volume:
        // cost_r(xr, d) = cost_l(xr + d, d)
        for (int x = 0; x < w; ++x) {
          uint32_t bc = std::numeric_limits<uint32_t>::max();
          int best = -1;
          for (int d = 0; d < D; ++d) {
            int xl = x + d;
            if (xl >= w) break;
            uint32_t v = agg[(static_cast<size_t>(y) * w + xl) * D + d];
            if (v < bc) { bc = v; best = d; }
          }
          if (best >= 0) disp_r[y * w + x] = static_cast<float>(best);
        }
      }
    };
    int nt = std::max(1u, std::thread::hardware_concurrency());
    std::vector<std::thread> ts;
    int rows = (h + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
      int y0 = t * rows, y1 = std::min(h, y0 + rows);
      if (y0 < y1) ts.emplace_back(worker, y0, y1);
    }
    for (auto& t : ts) t.join();
  }

  // LR check
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float d = disp_l[y * w + x];
      float out = -1.0f;
      if (d >= 0.5f) {
        int xr = x - static_cast<int>(d + 0.5f);
        if (xr >= 0) {
          float dr = disp_r[y * w + xr];
          if (dr >= 0 && std::abs(dr - d) <= 1.5f) out = d;
        }
      }
      disparity_out[y * w + x] = out;
    }
  }

  // 3x3 median over valid disparities (standard post-SGM salt removal;
  // cv2's SGBM applies the same class of filter internally)
  {
    std::vector<float> med(static_cast<size_t>(h) * w);
    for (int y = 0; y < h; ++y) {
      for (int x = 0; x < w; ++x) {
        float vals[9];
        int n = 0;
        for (int dy2 = -1; dy2 <= 1; ++dy2) {
          for (int dx2 = -1; dx2 <= 1; ++dx2) {
            int yy = y + dy2, xx = x + dx2;
            if (yy < 0 || yy >= h || xx < 0 || xx >= w) continue;
            float v = disparity_out[yy * w + xx];
            if (v > 0) vals[n++] = v;
          }
        }
        float self = disparity_out[y * w + x];
        if (self > 0 && n >= 5) {
          std::nth_element(vals, vals + n / 2, vals + n);
          med[y * w + x] = vals[n / 2];
        } else {
          med[y * w + x] = self;
        }
      }
    }
    std::copy(med.begin(), med.end(), disparity_out);
  }

  // speckle removal: invalidate connected regions (4-neighborhood,
  // |d_i - d_j| <= 1) smaller than kSpeckleMin pixels — the cv2 SGBM
  // speckleWindowSize analogue; kills isolated LR-check survivors
  {
    constexpr int kSpeckleMin = 120;
    std::vector<int32_t> label(static_cast<size_t>(h) * w, -1);
    std::vector<int32_t> stack;
    std::vector<int32_t> region;
    for (int start = 0; start < h * w; ++start) {
      if (label[start] >= 0 || disparity_out[start] <= 0) continue;
      stack.assign(1, start);
      region.clear();
      label[start] = start;
      while (!stack.empty()) {
        int i = stack.back();
        stack.pop_back();
        region.push_back(i);
        int y = i / w, x = i - y * w;
        const int ny[4] = {y - 1, y + 1, y, y};
        const int nx[4] = {x, x, x - 1, x + 1};
        for (int k = 0; k < 4; ++k) {
          if (ny[k] < 0 || ny[k] >= h || nx[k] < 0 || nx[k] >= w) continue;
          int j = ny[k] * w + nx[k];
          if (label[j] >= 0 || disparity_out[j] <= 0) continue;
          if (std::abs(disparity_out[j] - disparity_out[i]) <= 1.0f) {
            label[j] = start;
            stack.push_back(j);
          }
        }
      }
      if (static_cast<int>(region.size()) < kSpeckleMin) {
        for (int i : region) disparity_out[i] = -1.0f;
      }
    }
  }
  return 0;
}

// Hash-grid voxel downsampling: writes up to n indices of representative
// points (first point per voxel, stable order); returns the count.
// (reference VoxelMap sample_points, utils/VoxelMap.hpp:80-157)
int cvo_voxel_downsample(const float* xyz, int n, float voxel,
                         int32_t* indices_out) {
  if (voxel <= 0) {
    for (int i = 0; i < n; ++i) indices_out[i] = i;
    return n;
  }
  std::unordered_map<uint64_t, int32_t> seen;
  seen.reserve(static_cast<size_t>(n) * 2);
  int count = 0;
  const double inv = 1.0 / voxel;
  for (int i = 0; i < n; ++i) {
    int64_t qx = static_cast<int64_t>(std::floor(xyz[3 * i] * inv));
    int64_t qy = static_cast<int64_t>(std::floor(xyz[3 * i + 1] * inv));
    int64_t qz = static_cast<int64_t>(std::floor(xyz[3 * i + 2] * inv));
    uint64_t key = (static_cast<uint64_t>(qx & 0x1FFFFF) << 42) |
                   (static_cast<uint64_t>(qy & 0x1FFFFF) << 21) |
                   static_cast<uint64_t>(qz & 0x1FFFFF);
    if (seen.emplace(key, i).second) indices_out[count++] = i;
  }
  return count;
}

}  // extern "C"
