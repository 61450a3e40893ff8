// Quadric-error-metric mesh decimation (Garland & Heckbert 1997).
//
// Native host-side mesh preprocessing for the TPU pose-estimation framework:
// BOP CAD models carry 10k-200k triangles, far beyond what a 30x30 (or even
// 100x100) depth render resolves — the TPU rasterizer's cost is linear in
// triangle count, so decimating to a per-resolution budget is the single
// biggest lever for real-dataset throughput. This plays the role of the
// reference's native layer around mesh handling (SciGL upload_mesh/GLSL,
// see SURVEY.md §2B) in a TPU-appropriate place: ahead of time, on the host.
//
// Exposed as a C ABI for ctypes (no pybind11 in the image):
//   int decimate_mesh(const float* verts, int n_verts,
//                     const int* faces, int n_faces,
//                     int target_faces,
//                     float* out_verts, int* out_n_verts,
//                     int* out_faces, int* out_n_faces);
// Returns 0 on success. Output buffers must be sized for the input counts.
//
// Build: g++ -O3 -shared -fPIC -o libdecimate.so decimate.cpp

#include <cstring>
#include <cmath>
#include <cstdint>
#include <functional>
#include <queue>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Quadric {
  // symmetric 4x4: stored as upper triangle [a11 a12 a13 a14 a22 a23 a24 a33 a34 a44]
  double q[10] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0};

  void add_plane(double a, double b, double c, double d) {
    q[0] += a * a; q[1] += a * b; q[2] += a * c; q[3] += a * d;
    q[4] += b * b; q[5] += b * c; q[6] += b * d;
    q[7] += c * c; q[8] += c * d;
    q[9] += d * d;
  }
  void add(const Quadric& o) {
    for (int i = 0; i < 10; ++i) q[i] += o.q[i];
  }
  double eval(double x, double y, double z) const {
    return q[0] * x * x + 2 * q[1] * x * y + 2 * q[2] * x * z + 2 * q[3] * x +
           q[4] * y * y + 2 * q[5] * y * z + 2 * q[6] * y +
           q[7] * z * z + 2 * q[8] * z + q[9];
  }
  // solve for the minimizing point; returns false if near-singular
  bool optimal(double* out) const {
    double A[9] = {q[0], q[1], q[2], q[1], q[4], q[5], q[2], q[5], q[7]};
    double b[3] = {-q[3], -q[6], -q[8]};
    // 3x3 Cramer with pivot guard
    double det = A[0] * (A[4] * A[8] - A[5] * A[7]) -
                 A[1] * (A[3] * A[8] - A[5] * A[6]) +
                 A[2] * (A[3] * A[7] - A[4] * A[6]);
    if (std::fabs(det) < 1e-12) return false;
    double inv = 1.0 / det;
    out[0] = inv * (b[0] * (A[4] * A[8] - A[5] * A[7]) -
                    A[1] * (b[1] * A[8] - A[5] * b[2]) +
                    A[2] * (b[1] * A[7] - A[4] * b[2]));
    out[1] = inv * (A[0] * (b[1] * A[8] - A[5] * b[2]) -
                    b[0] * (A[3] * A[8] - A[5] * A[6]) +
                    A[2] * (A[3] * b[2] - b[1] * A[6]));
    out[2] = inv * (A[0] * (A[4] * b[2] - b[1] * A[7]) -
                    A[1] * (A[3] * b[2] - b[1] * A[6]) +
                    b[0] * (A[3] * A[7] - A[4] * A[6]));
    return true;
  }
};

struct EdgeKey {
  int a, b;
  bool operator==(const EdgeKey& o) const { return a == o.a && b == o.b; }
};
struct EdgeHash {
  size_t operator()(const EdgeKey& e) const {
    return std::hash<int64_t>()((int64_t)e.a << 32 | (uint32_t)e.b);
  }
};

struct Candidate {
  double cost;
  int a, b;       // collapse b -> a
  int version;    // staleness check
  double pos[3];
  bool operator<(const Candidate& o) const { return cost > o.cost; }  // min-heap
};

}  // namespace

extern "C" int decimate_mesh(const float* verts, int n_verts, const int* faces,
                             int n_faces, int target_faces, float* out_verts,
                             int* out_n_verts, int* out_faces, int* out_n_faces) {
  if (n_verts <= 0 || n_faces <= 0 || target_faces < 4) return 1;

  std::vector<double> V(3 * (size_t)n_verts);
  for (size_t i = 0; i < V.size(); ++i) V[i] = verts[i];
  std::vector<int> F(faces, faces + 3 * (size_t)n_faces);
  std::vector<bool> face_alive(n_faces, true);
  std::vector<Quadric> Q(n_verts);
  std::vector<std::unordered_set<int>> vert_faces(n_verts);
  std::vector<int> version(n_verts, 0);
  // union-find style vertex remapping after collapses
  std::vector<int> remap(n_verts);
  for (int i = 0; i < n_verts; ++i) remap[i] = i;
  std::function<int(int)> find = [&](int v) {
    while (remap[v] != v) { remap[v] = remap[remap[v]]; v = remap[v]; }
    return v;
  };

  // initial quadrics from face planes
  for (int f = 0; f < n_faces; ++f) {
    int i0 = F[3 * f], i1 = F[3 * f + 1], i2 = F[3 * f + 2];
    if (i0 == i1 || i1 == i2 || i0 == i2) { face_alive[f] = false; continue; }
    double* p0 = &V[3 * i0];
    double* p1 = &V[3 * i1];
    double* p2 = &V[3 * i2];
    double e1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
    double e2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
    double n[3] = {e1[1] * e2[2] - e1[2] * e2[1], e1[2] * e2[0] - e1[0] * e2[2],
                   e1[0] * e2[1] - e1[1] * e2[0]};
    double len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    if (len < 1e-18) { face_alive[f] = false; continue; }
    for (double& c : n) c /= len;
    double d = -(n[0] * p0[0] + n[1] * p0[1] + n[2] * p0[2]);
    Quadric plane;
    plane.add_plane(n[0], n[1], n[2], d);
    Q[i0].add(plane); Q[i1].add(plane); Q[i2].add(plane);
    vert_faces[i0].insert(f); vert_faces[i1].insert(f); vert_faces[i2].insert(f);
  }

  std::priority_queue<Candidate> heap;
  auto push_edge = [&](int a, int b) {
    a = find(a); b = find(b);
    if (a == b) return;
    Quadric sum = Q[a];
    sum.add(Q[b]);
    Candidate c;
    double pos[3];
    if (!sum.optimal(pos)) {
      // fallback: best of endpoints / midpoint
      double mid[3] = {(V[3 * a] + V[3 * b]) / 2, (V[3 * a + 1] + V[3 * b + 1]) / 2,
                       (V[3 * a + 2] + V[3 * b + 2]) / 2};
      double ca = sum.eval(V[3 * a], V[3 * a + 1], V[3 * a + 2]);
      double cb = sum.eval(V[3 * b], V[3 * b + 1], V[3 * b + 2]);
      double cm = sum.eval(mid[0], mid[1], mid[2]);
      if (ca <= cb && ca <= cm) { pos[0] = V[3 * a]; pos[1] = V[3 * a + 1]; pos[2] = V[3 * a + 2]; }
      else if (cb <= cm) { pos[0] = V[3 * b]; pos[1] = V[3 * b + 1]; pos[2] = V[3 * b + 2]; }
      else { pos[0] = mid[0]; pos[1] = mid[1]; pos[2] = mid[2]; }
    }
    c.cost = sum.eval(pos[0], pos[1], pos[2]);
    c.a = a; c.b = b;
    c.version = version[a] + version[b];
    c.pos[0] = pos[0]; c.pos[1] = pos[1]; c.pos[2] = pos[2];
    heap.push(c);
  };

  std::unordered_set<EdgeKey, EdgeHash> seen;
  for (int f = 0; f < n_faces; ++f) {
    if (!face_alive[f]) continue;
    for (int e = 0; e < 3; ++e) {
      int a = F[3 * f + e], b = F[3 * f + (e + 1) % 3];
      EdgeKey k{std::min(a, b), std::max(a, b)};
      if (seen.insert(k).second) push_edge(a, b);
    }
  }

  int alive_faces = 0;
  for (int f = 0; f < n_faces; ++f) alive_faces += face_alive[f];

  while (alive_faces > target_faces && !heap.empty()) {
    Candidate c = heap.top();
    heap.pop();
    int a = find(c.a), b = find(c.b);
    if (a == b) continue;
    if (c.version != version[a] + version[b]) continue;  // stale

    // collapse b into a at c.pos
    V[3 * a] = c.pos[0]; V[3 * a + 1] = c.pos[1]; V[3 * a + 2] = c.pos[2];
    Q[a].add(Q[b]);
    remap[b] = a;
    version[a]++;

    // merge face sets; kill faces that became degenerate
    std::vector<int> moved(vert_faces[b].begin(), vert_faces[b].end());
    for (int f : moved) {
      if (!face_alive[f]) continue;
      int i0 = find(F[3 * f]), i1 = find(F[3 * f + 1]), i2 = find(F[3 * f + 2]);
      if (i0 == i1 || i1 == i2 || i0 == i2) {
        face_alive[f] = false;
        --alive_faces;
        vert_faces[i0].erase(f); vert_faces[i1].erase(f); vert_faces[i2].erase(f);
      } else {
        vert_faces[a].insert(f);
      }
    }
    vert_faces[b].clear();

    // refresh candidate edges around a
    std::unordered_set<int> nbrs;
    for (int f : vert_faces[a]) {
      if (!face_alive[f]) continue;
      for (int e = 0; e < 3; ++e) {
        int v = find(F[3 * f + e]);
        if (v != a) nbrs.insert(v);
      }
    }
    for (int v : nbrs) push_edge(a, v);
  }

  // compact output
  std::vector<int> new_id(n_verts, -1);
  int nv = 0;
  std::vector<int> out_f;
  out_f.reserve(3 * (size_t)alive_faces);
  for (int f = 0; f < n_faces; ++f) {
    if (!face_alive[f]) continue;
    int idx[3];
    bool ok = true;
    for (int e = 0; e < 3; ++e) {
      int v = find(F[3 * f + e]);
      if (new_id[v] < 0) {
        new_id[v] = nv;
        out_verts[3 * nv] = (float)V[3 * v];
        out_verts[3 * nv + 1] = (float)V[3 * v + 1];
        out_verts[3 * nv + 2] = (float)V[3 * v + 2];
        ++nv;
      }
      idx[e] = new_id[v];
    }
    if (idx[0] == idx[1] || idx[1] == idx[2] || idx[0] == idx[2]) ok = false;
    if (ok) {
      out_f.push_back(idx[0]);
      out_f.push_back(idx[1]);
      out_f.push_back(idx[2]);
    }
  }
  *out_n_verts = nv;
  *out_n_faces = (int)(out_f.size() / 3);
  std::memcpy(out_faces, out_f.data(), out_f.size() * sizeof(int));
  return 0;
}
