// Native backend cloud ops: voxel-grid downsample + kNN PCA normals.
//
// The reference's CloudSliceProcessor leans on PCL's C++ VoxelGrid and
// NormalEstimation (CloudSliceProcessor.cpp:119-151); this is the
// equivalent native runtime piece for the TPU build's host backend —
// a grid-hash downsample and a shell-expanding grid kNN with
// per-thread PCA, callable from Python via ctypes (see
// kintinuous_tpu/backend/native_ops.py).
//
// Build: make -C native  (produces libcloud_ops.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct CellKey {
    int64_t k;
    bool operator==(const CellKey& o) const { return k == o.k; }
};

struct CellHash {
    size_t operator()(const CellKey& c) const {
        uint64_t x = (uint64_t)c.k;
        x ^= x >> 33; x *= 0xff51afd7ed558ccdULL;
        x ^= x >> 33; x *= 0xc4ceb9fe1a85ec53ULL;
        x ^= x >> 33;
        return (size_t)x;
    }
};

inline int64_t pack_key(int ix, int iy, int iz) {
    const int64_t off = 1 << 20;
    return (((int64_t)ix + off) << 42) | (((int64_t)iy + off) << 21) |
           ((int64_t)iz + off);
}

// 3x3 symmetric eigen-decomposition via Jacobi sweeps; returns the
// eigenvector of the smallest eigenvalue (the PCA normal).
void smallest_eigvec(const double C[6], float out[3]) {
    double a[3][3] = {{C[0], C[1], C[2]},
                      {C[1], C[3], C[4]},
                      {C[2], C[4], C[5]}};
    double v[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
    for (int sweep = 0; sweep < 12; ++sweep) {
        double offd = std::fabs(a[0][1]) + std::fabs(a[0][2]) +
                      std::fabs(a[1][2]);
        if (offd < 1e-15) break;
        for (int p = 0; p < 2; ++p) {
            for (int q = p + 1; q < 3; ++q) {
                if (std::fabs(a[p][q]) < 1e-18) continue;
                double theta = (a[q][q] - a[p][p]) / (2.0 * a[p][q]);
                double t = (theta >= 0 ? 1.0 : -1.0) /
                           (std::fabs(theta) + std::sqrt(theta * theta + 1));
                double c = 1.0 / std::sqrt(t * t + 1), s = t * c;
                for (int r = 0; r < 3; ++r) {
                    double arp = a[r][p], arq = a[r][q];
                    a[r][p] = c * arp - s * arq;
                    a[r][q] = s * arp + c * arq;
                }
                for (int r = 0; r < 3; ++r) {
                    double apr = a[p][r], aqr = a[q][r];
                    a[p][r] = c * apr - s * aqr;
                    a[q][r] = s * apr + c * aqr;
                }
                for (int r = 0; r < 3; ++r) {
                    double vrp = v[r][p], vrq = v[r][q];
                    v[r][p] = c * vrp - s * vrq;
                    v[r][q] = s * vrp + c * vrq;
                }
            }
        }
    }
    int mi = 0;
    double mv = a[0][0];
    for (int i = 1; i < 3; ++i)
        if (a[i][i] < mv) { mv = a[i][i]; mi = i; }
    out[0] = (float)v[0][mi];
    out[1] = (float)v[1][mi];
    out[2] = (float)v[2][mi];
}

}  // namespace

extern "C" {

// Average points/colours/weights per leaf cell. Returns the number of
// output cells (<= n). Output order is unspecified. colors/weights may
// be null.
int cloud_voxel_downsample(const float* pts, const uint8_t* cols,
                           const float* wgts, int n, float leaf,
                           float* out_pts, uint8_t* out_cols,
                           float* out_wgts) {
    std::unordered_map<CellKey, int, CellHash> cells;
    cells.reserve((size_t)n * 2);
    std::vector<double> acc;   // per cell: x y z r g b w count
    const float inv = 1.0f / leaf;
    for (int i = 0; i < n; ++i) {
        int ix = (int)std::floor(pts[3 * i + 0] * inv);
        int iy = (int)std::floor(pts[3 * i + 1] * inv);
        int iz = (int)std::floor(pts[3 * i + 2] * inv);
        CellKey key{pack_key(ix, iy, iz)};
        auto it = cells.find(key);
        int slot;
        if (it == cells.end()) {
            slot = (int)(acc.size() / 8);
            cells.emplace(key, slot);
            acc.resize(acc.size() + 8, 0.0);
        } else {
            slot = it->second;
        }
        double* a = &acc[(size_t)slot * 8];
        a[0] += pts[3 * i + 0];
        a[1] += pts[3 * i + 1];
        a[2] += pts[3 * i + 2];
        if (cols) {
            a[3] += cols[3 * i + 0];
            a[4] += cols[3 * i + 1];
            a[5] += cols[3 * i + 2];
        }
        if (wgts) a[6] += wgts[i];
        a[7] += 1.0;
    }
    int m = (int)(acc.size() / 8);
    for (int s = 0; s < m; ++s) {
        const double* a = &acc[(size_t)s * 8];
        double c = a[7];
        out_pts[3 * s + 0] = (float)(a[0] / c);
        out_pts[3 * s + 1] = (float)(a[1] / c);
        out_pts[3 * s + 2] = (float)(a[2] / c);
        if (out_cols && cols) {
            out_cols[3 * s + 0] = (uint8_t)(a[3] / c);
            out_cols[3 * s + 1] = (uint8_t)(a[4] / c);
            out_cols[3 * s + 2] = (uint8_t)(a[5] / c);
        }
        if (out_wgts && wgts) out_wgts[s] = (float)(a[6] / c);
    }
    return m;
}

// PCA normals from (approximate) k nearest neighbours found by
// expanding-shell search over a grid hash with cell size `cell`
// (pick ~ the downsample leaf). Normals oriented towards `viewpoint`
// when non-null. Multithreaded.
void cloud_estimate_normals(const float* pts, int n, int k, float cell,
                            const float* viewpoint, float* out_normals) {
    if (n == 0) return;
    if (k > n) k = n;
    std::unordered_map<CellKey, std::vector<int>, CellHash> grid;
    grid.reserve((size_t)n * 2);
    const float inv = 1.0f / cell;
    std::vector<int> ci(n), cj(n), ck(n);
    for (int i = 0; i < n; ++i) {
        ci[i] = (int)std::floor(pts[3 * i + 0] * inv);
        cj[i] = (int)std::floor(pts[3 * i + 1] * inv);
        ck[i] = (int)std::floor(pts[3 * i + 2] * inv);
        grid[CellKey{pack_key(ci[i], cj[i], ck[i])}].push_back(i);
    }

    int nthreads = (int)std::thread::hardware_concurrency();
    if (nthreads < 1) nthreads = 1;
    if (nthreads > 16) nthreads = 16;
    std::atomic<int> next{0};
    const int CHUNK = 256;

    auto worker = [&]() {
        std::vector<std::pair<float, int>> cand;
        for (;;) {
            int start = next.fetch_add(CHUNK);
            if (start >= n) break;
            int end = std::min(start + CHUNK, n);
            for (int i = start; i < end; ++i) {
                const float px = pts[3 * i], py = pts[3 * i + 1],
                            pz = pts[3 * i + 2];
                cand.clear();
                // expand shells until we have k candidates, then one
                // more shell to be safe
                int found_at = -1;
                for (int r = 0; r <= 4; ++r) {
                    for (int dz = -r; dz <= r; ++dz)
                        for (int dy = -r; dy <= r; ++dy)
                            for (int dx = -r; dx <= r; ++dx) {
                                if (std::max(std::abs(dx),
                                             std::max(std::abs(dy),
                                                      std::abs(dz))) != r)
                                    continue;
                                auto it = grid.find(CellKey{pack_key(
                                    ci[i] + dx, cj[i] + dy, ck[i] + dz)});
                                if (it == grid.end()) continue;
                                for (int j : it->second) {
                                    float ddx = pts[3 * j] - px;
                                    float ddy = pts[3 * j + 1] - py;
                                    float ddz = pts[3 * j + 2] - pz;
                                    cand.emplace_back(
                                        ddx * ddx + ddy * ddy + ddz * ddz, j);
                                }
                            }
                    if (found_at < 0 && (int)cand.size() >= k) found_at = r;
                    else if (found_at >= 0 && r > found_at) break;
                }
                int kk = std::min((int)cand.size(), k);
                std::partial_sort(cand.begin(), cand.begin() + kk,
                                  cand.end());
                // covariance of the kk neighbours
                double mx = 0, my = 0, mz = 0;
                for (int t = 0; t < kk; ++t) {
                    int j = cand[t].second;
                    mx += pts[3 * j];
                    my += pts[3 * j + 1];
                    mz += pts[3 * j + 2];
                }
                mx /= kk; my /= kk; mz /= kk;
                double C[6] = {0, 0, 0, 0, 0, 0};
                for (int t = 0; t < kk; ++t) {
                    int j = cand[t].second;
                    double dx = pts[3 * j] - mx;
                    double dy = pts[3 * j + 1] - my;
                    double dz = pts[3 * j + 2] - mz;
                    C[0] += dx * dx; C[1] += dx * dy; C[2] += dx * dz;
                    C[3] += dy * dy; C[4] += dy * dz; C[5] += dz * dz;
                }
                float nrm[3];
                smallest_eigvec(C, nrm);
                if (viewpoint) {
                    float tx = viewpoint[0] - px, ty = viewpoint[1] - py,
                          tz = viewpoint[2] - pz;
                    if (nrm[0] * tx + nrm[1] * ty + nrm[2] * tz < 0) {
                        nrm[0] = -nrm[0]; nrm[1] = -nrm[1]; nrm[2] = -nrm[2];
                    }
                }
                out_normals[3 * i + 0] = nrm[0];
                out_normals[3 * i + 1] = nrm[1];
                out_normals[3 * i + 2] = nrm[2];
            }
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < nthreads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
}

}  // extern "C"
