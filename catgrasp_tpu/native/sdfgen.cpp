// Native mesh -> signed-distance voxelizer (and batch point queries).
//
// C++/OpenMP replacement for the external SDFGen binary the reference shells
// out to (make_sdf.py:30-36), and the host-side counterpart of the JAX bake
// in geom/sdf.py (same algorithm: exact point-triangle distance, sign from
// generalized winding numbers, so unions of overlapping watertight parts
// stay correctly signed).  Used for large preprocessing batches where the
// accelerator is busy simulating, and as a cross-implementation oracle in
// tests.
//
// Build: make -C catgrasp_tpu/native   (produces libcatgrasp_native.so)

#include <cmath>
#include <cstdint>
#include <algorithm>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

inline V3 sub(const V3& a, const V3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline float dot(const V3& a, const V3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline float norm(const V3& a) { return std::sqrt(dot(a, a)); }

// Ericson, Real-Time Collision Detection: squared distance point-triangle.
float point_tri_dist_sq(const V3& p, const V3& a, const V3& b, const V3& c) {
  V3 ab = sub(b, a), ac = sub(c, a), ap = sub(p, a);
  float d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0.f && d2 <= 0.f) { V3 d = sub(p, a); return dot(d, d); }
  V3 bp = sub(p, b);
  float d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0.f && d4 <= d3) { V3 d = sub(p, b); return dot(d, d); }
  float vc = d1 * d4 - d3 * d2;
  if (vc <= 0.f && d1 >= 0.f && d3 <= 0.f) {
    float v = d1 / (d1 - d3);
    V3 q{a.x + v * ab.x, a.y + v * ab.y, a.z + v * ab.z};
    V3 d = sub(p, q); return dot(d, d);
  }
  V3 cp = sub(p, c);
  float d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0.f && d5 <= d6) { V3 d = sub(p, c); return dot(d, d); }
  float vb = d5 * d2 - d1 * d6;
  if (vb <= 0.f && d2 >= 0.f && d6 <= 0.f) {
    float w = d2 / (d2 - d6);
    V3 q{a.x + w * ac.x, a.y + w * ac.y, a.z + w * ac.z};
    V3 d = sub(p, q); return dot(d, d);
  }
  float va = d3 * d6 - d5 * d4;
  if (va <= 0.f && (d4 - d3) >= 0.f && (d5 - d6) >= 0.f) {
    float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    V3 bc = sub(c, b);
    V3 q{b.x + w * bc.x, b.y + w * bc.y, b.z + w * bc.z};
    V3 d = sub(p, q); return dot(d, d);
  }
  float denom = 1.f / (va + vb + vc);
  float v = vb * denom, w = vc * denom;
  V3 q{a.x + v * ab.x + w * ac.x, a.y + v * ab.y + w * ac.y, a.z + v * ab.z + w * ac.z};
  V3 d = sub(p, q); return dot(d, d);
}

// van Oosterom & Strackee solid angle of one triangle as seen from p.
double solid_angle(const V3& p, const V3& a, const V3& b, const V3& c) {
  V3 av = sub(a, p), bv = sub(b, p), cv = sub(c, p);
  double la = norm(av), lb = norm(bv), lc = norm(cv);
  double det = dot(av, cross(bv, cv));
  double denom = la * lb * lc + dot(av, bv) * lc + dot(bv, cv) * la + dot(cv, av) * lb;
  return 2.0 * std::atan2(det, denom);
}

float signed_distance(const V3& p, const float* verts, const int* faces, int n_faces) {
  float best = 1e30f;
  double omega = 0.0;
  for (int f = 0; f < n_faces; ++f) {
    const V3 a = {verts[3 * faces[3 * f]], verts[3 * faces[3 * f] + 1], verts[3 * faces[3 * f] + 2]};
    const V3 b = {verts[3 * faces[3 * f + 1]], verts[3 * faces[3 * f + 1] + 1], verts[3 * faces[3 * f + 1] + 2]};
    const V3 c = {verts[3 * faces[3 * f + 2]], verts[3 * faces[3 * f + 2] + 1], verts[3 * faces[3 * f + 2] + 2]};
    best = std::min(best, point_tri_dist_sq(p, a, b, c));
    omega += solid_angle(p, a, b, c);
  }
  float dist = std::sqrt(best);
  bool inside = omega > 2.0 * M_PI;  // winding number > 0.5
  return inside ? -dist : dist;
}

}  // namespace

extern "C" {

// Batch signed distance of points (n_pts x 3) to a triangle mesh.
void mesh_sdf(const float* verts, int n_verts, const int* faces, int n_faces,
              const float* pts, int n_pts, float* out) {
  (void)n_verts;
#pragma omp parallel for schedule(dynamic, 64)
  for (int i = 0; i < n_pts; ++i) {
    V3 p{pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
    out[i] = signed_distance(p, verts, faces, n_faces);
  }
}

// Bake a cubic dims^3 SDF grid over the padded mesh AABB (same layout as
// geom.sdf.bake_sdf: cubic grid centered on the bbox).
void bake_sdf(const float* verts, int n_verts, const int* faces, int n_faces,
              int dims, float padding, float* out_values, float* out_lower,
              float* out_spacing) {
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int v = 0; v < n_verts; ++v)
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], verts[3 * v + k]);
      hi[k] = std::max(hi[k], verts[3 * v + k]);
    }
  for (int k = 0; k < 3; ++k) { lo[k] -= padding; hi[k] += padding; }
  float ext = 0.f;
  for (int k = 0; k < 3; ++k) ext = std::max(ext, hi[k] - lo[k]);
  float spacing = ext / (dims - 1);
  float lower[3];
  for (int k = 0; k < 3; ++k)
    lower[k] = (lo[k] + hi[k]) * 0.5f - spacing * (dims - 1) * 0.5f;

#pragma omp parallel for schedule(dynamic, 1)
  for (int i = 0; i < dims; ++i)
    for (int j = 0; j < dims; ++j)
      for (int k = 0; k < dims; ++k) {
        V3 p{lower[0] + i * spacing, lower[1] + j * spacing, lower[2] + k * spacing};
        out_values[(i * dims + j) * dims + k] = signed_distance(p, verts, faces, n_faces);
      }
  for (int k = 0; k < 3; ++k) out_lower[k] = lower[k];
  *out_spacing = spacing;
}

}  // extern "C"
