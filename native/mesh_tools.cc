// Native mesh preprocessing for the asset pipeline.
//
// The reference leans on external native code (PyBullet's mesh loaders,
// OMG's SDF builders, pyrender) for asset preparation
// (reference: env/panda_scene.py:523-573, misc/online_object_renderer.py).
// This library provides the TPU build's host-side equivalents: turning a
// triangle mesh into the static arrays the on-device simulator consumes
// (interior sphere sets for contact, surface samples for the point-splat
// camera, an SDF grid for planners). Called from Python via ctypes
// (gaddpg_tpu/data/mesh_native.py), with pure-numpy fallbacks when the
// shared library is not built.
//
// Build: cc -O2 -shared -fPIC -o libmesh_tools.so mesh_tools.cc  (see Makefile)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

struct V3 {
  double x, y, z;
};

inline V3 sub(const V3& a, const V3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline double dot(const V3& a, const V3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline double norm(const V3& a) { return std::sqrt(dot(a, a)); }

// Moller-Trumbore ray/triangle intersection along +z.
bool ray_z_hits(const V3& o, const V3& v0, const V3& v1, const V3& v2, double* t_out) {
  const V3 dir{0.0, 0.0, 1.0};
  V3 e1 = sub(v1, v0), e2 = sub(v2, v0);
  V3 p = cross(dir, e2);
  double det = dot(e1, p);
  if (std::fabs(det) < 1e-12) return false;
  double inv = 1.0 / det;
  V3 tv = sub(o, v0);
  double u = dot(tv, p) * inv;
  if (u < 0.0 || u > 1.0) return false;
  V3 q = cross(tv, e1);
  double v = dot(dir, q) * inv;
  if (v < 0.0 || u + v > 1.0) return false;
  double t = dot(e2, q) * inv;
  if (t <= 1e-12) return false;
  *t_out = t;
  return true;
}

double point_tri_dist(const V3& p, const V3& a, const V3& b, const V3& c) {
  // Ericson, Real-Time Collision Detection 5.1.5
  V3 ab = sub(b, a), ac = sub(c, a), ap = sub(p, a);
  double d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0 && d2 <= 0) return norm(ap);
  V3 bp = sub(p, b);
  double d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0 && d4 <= d3) return norm(bp);
  double vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    double v = d1 / (d1 - d3);
    V3 q{a.x + v * ab.x, a.y + v * ab.y, a.z + v * ab.z};
    return norm(sub(p, q));
  }
  V3 cp = sub(p, c);
  double d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0 && d5 <= d6) return norm(cp);
  double vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    double w = d2 / (d2 - d6);
    V3 q{a.x + w * ac.x, a.y + w * ac.y, a.z + w * ac.z};
    return norm(sub(p, q));
  }
  double va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    double w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    V3 q{b.x + w * (c.x - b.x), b.y + w * (c.y - b.y), b.z + w * (c.z - b.z)};
    return norm(sub(p, q));
  }
  V3 n = cross(ab, ac);
  double nn = norm(n);
  if (nn < 1e-12) return norm(ap);
  return std::fabs(dot(ap, n)) / nn;
}

}  // namespace

extern "C" {

// ABI/semantics version. Bump whenever any kernel's semantics change so
// gaddpg_tpu/data/mesh_native.py can reject an outdated prebuilt .so by
// symbol rather than by filesystem mtime (a fresh git checkout stamps
// sources with checkout time, making a current .so look stale).
long mesh_tools_version(void) { return 3; }

// Parity-count voxel occupancy: grid (res^3) of 0/1 interior flags.
// tris: (n_tri * 9) floats; bounds: lo[3], hi[3].
void voxel_occupancy(const float* tris, int n_tri, const float* lo,
                     const float* hi, int res, uint8_t* out) {
  std::vector<V3> v(n_tri * 3);
  for (int i = 0; i < n_tri * 3; ++i)
    v[i] = {tris[i * 3], tris[i * 3 + 1], tris[i * 3 + 2]};
  const double dx = (hi[0] - lo[0]) / res, dy = (hi[1] - lo[1]) / res,
               dz = (hi[2] - lo[2]) / res;
  for (int ix = 0; ix < res; ++ix) {
    for (int iy = 0; iy < res; ++iy) {
      // one ray per (x, y) column: collect crossing heights
      V3 o{lo[0] + (ix + 0.5) * dx, lo[1] + (iy + 0.5) * dy, lo[2] - 1.0};
      std::vector<double> ts;
      for (int t = 0; t < n_tri; ++t) {
        double th;
        if (ray_z_hits(o, v[t * 3], v[t * 3 + 1], v[t * 3 + 2], &th)) ts.push_back(th);
      }
      std::sort(ts.begin(), ts.end());
      for (int iz = 0; iz < res; ++iz) {
        // ray param of the cell center: o.z == lo[2] - 1.0, so
        // t = cell_z - o.z = (iz + 0.5) * dz + 1.0
        double z = (iz + 0.5) * dz + 1.0;
        int crossings = 0;
        for (double th : ts)
          if (th < z) ++crossings;
        out[(ix * res + iy) * res + iz] = (crossings % 2) ? 1 : 0;
      }
    }
  }
}

// Unsigned distance to the surface on a grid (slow exact; res^3 * n_tri).
void surface_distance_grid(const float* tris, int n_tri, const float* lo,
                           const float* hi, int res, float* out) {
  std::vector<V3> v(n_tri * 3);
  for (int i = 0; i < n_tri * 3; ++i)
    v[i] = {tris[i * 3], tris[i * 3 + 1], tris[i * 3 + 2]};
  const double dx = (hi[0] - lo[0]) / res, dy = (hi[1] - lo[1]) / res,
               dz = (hi[2] - lo[2]) / res;
  for (int ix = 0; ix < res; ++ix)
    for (int iy = 0; iy < res; ++iy)
      for (int iz = 0; iz < res; ++iz) {
        V3 p{lo[0] + (ix + 0.5) * dx, lo[1] + (iy + 0.5) * dy,
             lo[2] + (iz + 0.5) * dz};
        double best = 1e30;
        for (int t = 0; t < n_tri; ++t) {
          double d = point_tri_dist(p, v[t * 3], v[t * 3 + 1], v[t * 3 + 2]);
          if (d < best) best = d;
        }
        out[(ix * res + iy) * res + iz] = (float)best;
      }
}

// Greedy interior sphere packing from occupancy + distance grids.
// Returns number of spheres written to out (n_out * 4: x, y, z, r).
int sphere_pack(const uint8_t* occ, const float* dist, const float* lo,
                const float* hi, int res, int max_spheres, float min_radius,
                float* out) {
  const double dx = (hi[0] - lo[0]) / res, dy = (hi[1] - lo[1]) / res,
               dz = (hi[2] - lo[2]) / res;
  const size_t n = (size_t)res * res * res;
  std::vector<float> d(dist, dist + n);
  // depth + spread score: pure deepest-first clusters the whole budget
  // in the thickest region (a cup's 2.4 mm base plate absorbs all 32
  // spheres; its 1.4 mm walls end up contactless and every pinch grasp
  // closes on air). The farthest-point term pulls later picks toward
  // uncovered regions while the depth term still prefers the largest
  // sphere available there.
  std::vector<float> mind(n, 0.0f);  // min distance to chosen centers
  int count = 0;
  while (count < max_spheres) {
    int best = -1;
    double bs = -1.0;
    for (size_t i = 0; i < n; ++i) {
      if (!occ[i] || d[i] <= min_radius) continue;
      double score = d[i] + 0.5 * mind[i];
      if (score > bs) {
        bs = score;
        best = (int)i;
      }
    }
    if (best < 0) break;
    int ix = best / (res * res), iy = (best / res) % res, iz = best % res;
    float cx = (float)(lo[0] + (ix + 0.5) * dx);
    float cy = (float)(lo[1] + (iy + 0.5) * dy);
    float cz = (float)(lo[2] + (iz + 0.5) * dz);
    float bd = d[best];
    out[count * 4 + 0] = cx;
    out[count * 4 + 1] = cy;
    out[count * 4 + 2] = cz;
    out[count * 4 + 3] = bd;
    // carve covered cells; refresh the farthest-point distances
    for (int jx = 0; jx < res; ++jx)
      for (int jy = 0; jy < res; ++jy)
        for (int jz = 0; jz < res; ++jz) {
          size_t j = ((size_t)jx * res + jy) * res + jz;
          if (!occ[j]) continue;
          double px = lo[0] + (jx + 0.5) * dx - cx;
          double py = lo[1] + (jy + 0.5) * dy - cy;
          double pz = lo[2] + (jz + 0.5) * dz - cz;
          double dist_c = std::sqrt(px * px + py * py + pz * pz);
          if (d[j] > 0 && dist_c + 0.6 * d[j] < bd) d[j] = 0;  // covered
          float fd = (float)dist_c;
          if (count == 0 || fd < mind[j]) mind[j] = fd;
        }
    ++count;
  }
  return count;
}

// Area-weighted surface point sampling.
void surface_sample(const float* tris, int n_tri, int n_samples,
                    uint64_t seed, float* out) {
  std::vector<V3> v(n_tri * 3);
  for (int i = 0; i < n_tri * 3; ++i)
    v[i] = {tris[i * 3], tris[i * 3 + 1], tris[i * 3 + 2]};
  std::vector<double> cum(n_tri);
  double total = 0;
  for (int t = 0; t < n_tri; ++t) {
    V3 e1 = sub(v[t * 3 + 1], v[t * 3]), e2 = sub(v[t * 3 + 2], v[t * 3]);
    total += 0.5 * norm(cross(e1, e2));
    cum[t] = total;
  }
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  for (int s = 0; s < n_samples; ++s) {
    double r = uni(rng) * total;
    int t = (int)(std::lower_bound(cum.begin(), cum.end(), r) - cum.begin());
    if (t >= n_tri) t = n_tri - 1;
    double u = uni(rng), w = uni(rng);
    if (u + w > 1) {
      u = 1 - u;
      w = 1 - w;
    }
    const V3 &a = v[t * 3], &b = v[t * 3 + 1], &c = v[t * 3 + 2];
    out[s * 3 + 0] = (float)(a.x + u * (b.x - a.x) + w * (c.x - a.x));
    out[s * 3 + 1] = (float)(a.y + u * (b.y - a.y) + w * (c.y - a.y));
    out[s * 3 + 2] = (float)(a.z + u * (b.z - a.z) + w * (c.z - a.z));
  }
}

}  // extern "C"
