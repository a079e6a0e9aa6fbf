// Per-atom Voronoi cell construction by incremental half-space clipping.
//
// Replaces the global scipy/Qhull tessellation of the featurizer hot path
// (scann_tpu/data/voronoi.py:_voronoi_facets) with an exact per-cell
// algorithm in the spirit of Voro++ (Rycroft 2009): each home atom's cell
// starts as a large cube and is clipped by the bisector half-space of every
// candidate point in ascending-distance order, stopping as soon as the next
// candidate is farther than twice the cell's current vertex radius (such a
// plane provably cannot cut the cell). The result is the EXACT Voronoi cell
// of the atom with respect to the full candidate cloud — identical facets,
// solid angles and distances as the global tessellation, to floating-point
// noise — at a fraction of the cost, because Qhull's O(P log P) global
// build (P = home atoms x periodic images, thousands of points) is replaced
// by ~tens of plane cuts per atom.
//
// Semantics mirrored from the reference featurizer
// (reference scann/utils/voronoi_neighbor.py:26-60 via the scipy path):
//   - facets are (neighbor point, solid angle at the atom, center distance);
//   - a facet whose polygon touches the bounding walls corresponds to an
//     unbounded ridge of the finite tessellation and is dropped, matching
//     the scipy path's `mins >= 0` filter;
//   - any geometric inconsistency (degenerate chaining, coincident points)
//     marks the atom failed (count = -1) and the caller falls back to the
//     scipy path for the whole structure.
//
// Exposed C ABI (ctypes, see scann_tpu/data/native_voronoi.py):
//   scann_voronoi_facets(points[P,3], P, n_home, max_facets,
//                        counts[n_home], nbr_point[n_home*max_facets],
//                        solid[n_home*max_facets], dist[n_home*max_facets])
//   returns 0 on success, 1 if any atom overflowed max_facets (caller
//   retries with a larger budget).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kEps = 1e-9;       // on-plane tolerance (angstrom scale)
constexpr double kWallEps = 1e-7;   // wall-contact tolerance

struct V3 {
  double x, y, z;
};

inline V3 sub(const V3& a, const V3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline double dot(const V3& a, const V3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline double norm2(const V3& a) { return dot(a, a); }

struct Face {
  int64_t plane;          // candidate point index, or -1 for a wall
  std::vector<int> ring;  // ordered vertex indices
  bool alive = true;
};

// Solid angle at the origin subtended by the ordered polygon ring
// (van Oosterom & Strackee 1983 triangle fan) — the same formula as
// scann_tpu/data/voronoi.py:_fan_solid_angle.
double ring_solid_angle(const std::vector<V3>& verts, const std::vector<int>& ring) {
  if (ring.size() < 3) return 0.0;
  const V3 r1 = verts[ring[0]];
  const double n1 = std::sqrt(norm2(r1));
  double total = 0.0;
  for (size_t t = 1; t + 1 < ring.size(); ++t) {
    const V3 r2 = verts[ring[t]];
    const V3 r3 = verts[ring[t + 1]];
    const double n2 = std::sqrt(norm2(r2));
    const double n3 = std::sqrt(norm2(r3));
    const double numer = std::fabs(dot(cross(r2, r3), r1));
    const double denom =
        n1 * n2 * n3 + dot(r2, r1) * n3 + dot(r3, r1) * n2 + dot(r2, r3) * n1;
    total += 2.0 * std::atan2(numer, denom);
  }
  return total;
}

// One atom's Voronoi cell. Coordinates are relative to the atom (the cell
// owner sits at the origin — every bisector then has positive offset, and
// the solid-angle fan needs no recentring).
class Cell {
 public:
  // Initial axis-aligned cube of half-width h.
  explicit Cell(double h) {
    verts_.reserve(64);
    for (int sx = -1; sx <= 1; sx += 2)
      for (int sy = -1; sy <= 1; sy += 2)
        for (int sz = -1; sz <= 1; sz += 2)
          verts_.push_back({h * sx, h * sy, h * sz});
    // vertex ids: bit2 = x>0, bit1 = y>0, bit0 = z>0
    faces_.push_back({-1, {1, 3, 7, 5}});  // +z? no: ring orientation is
    faces_.push_back({-1, {0, 4, 6, 2}});  // irrelevant for solid angles —
    faces_.push_back({-1, {4, 5, 7, 6}});  // only adjacency must be right.
    faces_.push_back({-1, {0, 1, 3, 2}});
    faces_.push_back({-1, {2, 3, 7, 6}});
    faces_.push_back({-1, {0, 1, 5, 4}});
    r2max_ = 3.0 * h * h;
    ok_ = true;
  }

  bool ok() const { return ok_; }
  double r2max() const { return r2max_; }

  // Clip by the bisector of candidate at relative position p (plane
  // n.x = |p|/2 with n = p/|p|; the origin side is kept).
  // Returns false if the plane did not cut the cell.
  bool clip(const V3& p, int64_t plane_id) {
    const double pn2 = norm2(p);
    if (pn2 < 1e-16) {  // coincident point: degenerate input
      ok_ = false;
      return false;
    }
    const double inv = 1.0 / std::sqrt(pn2);
    const V3 n = {p.x * inv, p.y * inv, p.z * inv};
    const double d = 0.5 * std::sqrt(pn2);

    const size_t nv = verts_.size();
    sd_.resize(nv);
    bool any_out = false;
    for (size_t i = 0; i < nv; ++i) {
      sd_[i] = dot(verts_[i], n) - d;
      if (sd_[i] > kEps) any_out = true;
    }
    if (!any_out) return false;

    // Intersection vertex per cut edge, shared between the two faces that
    // own the edge.
    edge_cut_.clear();
    // Edges of the new (cut-plane) face, as vertex-index pairs.
    std::vector<std::pair<int, int>> new_edges;

    for (auto& f : faces_) {
      if (!f.alive) continue;
      const std::vector<int>& ring = f.ring;
      const size_t k = ring.size();
      bool face_out = false, face_in = false;
      for (int v : ring) {
        if (sd_[v] > kEps) face_out = true;
        else face_in = true;
      }
      if (!face_out) continue;  // untouched
      if (!face_in) {           // fully outside
        f.alive = false;
        continue;
      }
      std::vector<int> nr;
      nr.reserve(k + 2);
      std::vector<int> on_plane;  // cut-boundary vertices, in walk order
      for (size_t a = 0; a < k; ++a) {
        const int va = ring[a];
        const int vb = ring[(a + 1) % k];
        const double sa = sd_[va], sb = sd_[vb];
        const bool a_out = sa > kEps, b_out = sb > kEps;
        const bool a_on = !a_out && sa >= -kEps;
        const bool b_on = !b_out && sb >= -kEps;
        if (!a_out) {
          nr.push_back(va);
          if (a_on) on_plane.push_back(va);
        }
        // strict crossing only: an on-plane endpoint IS the cut point
        if ((sa < -kEps && b_out) || (a_out && sb < -kEps)) {
          const int w = cut_vertex(va, vb, sa, sb);
          nr.push_back(w);
          on_plane.push_back(w);
        } else if (a_out && b_on) {
          // vb will be pushed (and recorded on-plane) at its own turn
        }
      }
      if (nr.size() < 3) {
        f.alive = false;
        continue;
      }
      f.ring.swap(nr);
      // The cut boundary of a convex face is a segment: its endpoints are
      // the first and last on-plane vertices (intermediate ones, if the
      // plane grazes existing vertices, are collinear between them).
      if (on_plane.size() >= 2) {
        int u = on_plane.front(), w = on_plane.back();
        if (u != w) new_edges.emplace_back(u, w);
      } else if (!on_plane.empty()) {
        // a single touch point cannot seed a closed ring — degenerate
        // grazing contact; treat as no edge.
      }
    }

    if (new_edges.size() >= 3) {
      std::vector<int> ring = chain_ring(new_edges);
      if (ring.empty()) {
        ok_ = false;
        return true;
      }
      faces_.push_back({plane_id, std::move(ring)});
    } else if (!new_edges.empty()) {
      // a real cut must close a polygon
      ok_ = false;
      return true;
    }

    refresh_r2max();
    return true;
  }

  // Emit facets: (plane_id, solid_angle, wall_contact) per alive candidate
  // face. Wall contact = any ring vertex within kWallEps of the bounding
  // cube (half-width h) — the finite-tessellation unbounded-ridge marker.
  template <typename Emit>
  void facets(double h, Emit emit) const {
    for (const auto& f : faces_) {
      if (!f.alive || f.plane < 0) continue;
      bool wall = false;
      for (int v : f.ring) {
        const V3& q = verts_[v];
        const double m = std::max({std::fabs(q.x), std::fabs(q.y), std::fabs(q.z)});
        if (m >= h - kWallEps) {
          wall = true;
          break;
        }
      }
      const double sa = ring_solid_angle(verts_, f.ring);
      emit(f.plane, sa, wall);
    }
  }

 private:
  int cut_vertex(int va, int vb, double sa, double sb) {
    const uint64_t key =
        (static_cast<uint64_t>(std::min(va, vb)) << 32) | static_cast<uint32_t>(std::max(va, vb));
    for (const auto& e : edge_cut_)
      if (e.first == key) return e.second;
    const double t = sa / (sa - sb);
    const V3& A = verts_[va];
    const V3& B = verts_[vb];
    verts_.push_back({A.x + t * (B.x - A.x), A.y + t * (B.y - A.y), A.z + t * (B.z - A.z)});
    const int idx = static_cast<int>(verts_.size()) - 1;
    edge_cut_.emplace_back(key, idx);
    return idx;
  }

  // Chain undirected edges into a single closed ring; empty on failure
  // (branching/open chains from degenerate geometry).
  std::vector<int> chain_ring(const std::vector<std::pair<int, int>>& edges) {
    // adjacency (each vertex must have degree exactly 2)
    adj_.clear();
    for (const auto& e : edges) {
      adj_.emplace_back(e.first, e.second);
      adj_.emplace_back(e.second, e.first);
    }
    std::sort(adj_.begin(), adj_.end());
    // duplicate edges (two faces contributing the same segment) break the
    // degree invariant
    auto nbrs = [&](int v, int out[2]) -> int {
      auto lo = std::lower_bound(adj_.begin(), adj_.end(), std::make_pair(v, INT32_MIN));
      int cnt = 0;
      for (auto it = lo; it != adj_.end() && it->first == v; ++it) {
        if (cnt < 2) out[cnt] = it->second;
        ++cnt;
      }
      return cnt;
    };
    std::vector<int> ring;
    ring.reserve(edges.size());
    const int start = edges[0].first;
    int prev = -1, cur = start;
    for (size_t step = 0; step <= edges.size(); ++step) {
      ring.push_back(cur);
      int nb[2];
      if (nbrs(cur, nb) != 2) return {};
      const int nxt = (nb[0] == prev) ? nb[1] : nb[0];
      prev = cur;
      cur = nxt;
      if (cur == start) {
        if (ring.size() == edges.size()) return ring;
        return {};
      }
    }
    return {};
  }

  void refresh_r2max() {
    double m = 0.0;
    seen_.assign(verts_.size(), 0);
    for (const auto& f : faces_) {
      if (!f.alive) continue;
      for (int v : f.ring) {
        if (!seen_[v]) {
          seen_[v] = 1;
          m = std::max(m, norm2(verts_[v]));
        }
      }
    }
    r2max_ = m;
  }

  std::vector<V3> verts_;
  std::vector<Face> faces_;
  std::vector<double> sd_;
  std::vector<std::pair<uint64_t, int>> edge_cut_;
  std::vector<std::pair<int, int>> adj_;
  std::vector<char> seen_;
  double r2max_ = 0.0;
  bool ok_ = false;
};

}  // namespace

extern "C" {

// points: [P, 3] row-major, home atoms first. For each home atom i emit up
// to max_facets facets into row i of the output arrays:
//   nbr_point[i*max_facets + f] — candidate point index (global, into
//                                 points),
//   solid[...]                 — solid angle at atom i,
//   dist[...]                  — |points[j] - points[i]|.
// counts[i] = number emitted, or -1 if the cell construction failed for
// atom i (caller falls back to the scipy path). Facets whose polygon
// touches the bounding cube are dropped (unbounded-ridge semantics), as
// are zero-solid-angle facets. Returns 1 if any atom ran out of facet
// budget (counts[i] = -2 for those), else 0.
int scann_voronoi_facets(const double* points, int64_t n_points, int64_t n_home,
                         int64_t max_facets, int32_t* counts, int64_t* nbr_point,
                         double* solid, double* dist) {
  std::vector<std::pair<double, int64_t>> cand;  // (d2, point index)
  cand.reserve(n_points);
  int overflow = 0;

  for (int64_t i = 0; i < n_home; ++i) {
    const V3 c = {points[3 * i], points[3 * i + 1], points[3 * i + 2]};
    cand.clear();
    double maxd2 = 0.0;
    for (int64_t j = 0; j < n_points; ++j) {
      if (j == i) continue;
      const V3 p = sub({points[3 * j], points[3 * j + 1], points[3 * j + 2]}, c);
      const double d2 = norm2(p);
      cand.emplace_back(d2, j);
      maxd2 = std::max(maxd2, d2);
    }

    const double h = std::sqrt(maxd2) + 2.0;  // walls beyond every candidate
    Cell cell(h);
    // Candidates are consumed in ascending-distance order, but the early
    // stop typically needs only the nearest few dozen of thousands — sort
    // incrementally: nth_element a chunk to the front, sort just it, and
    // only partition further when the stop rule hasn't fired yet.
    const size_t n_cand = cand.size();
    size_t idx = 0, sorted_upto = 0, chunk = 64;
    while (idx < n_cand) {
      if (idx == sorted_upto) {
        const size_t upto = std::min(n_cand, sorted_upto + chunk);
        if (upto < n_cand)
          std::nth_element(cand.begin() + sorted_upto, cand.begin() + upto, cand.end());
        std::sort(cand.begin() + sorted_upto, cand.begin() + upto);
        sorted_upto = upto;
        chunk *= 4;
      }
      const auto [d2, j] = cand[idx++];
      if (d2 > 4.0 * cell.r2max()) break;  // no farther plane can cut
      const V3 p = sub({points[3 * j], points[3 * j + 1], points[3 * j + 2]}, c);
      cell.clip(p, j);
      if (!cell.ok()) break;
    }

    int32_t cnt = 0;
    if (!cell.ok()) {
      counts[i] = -1;
      continue;
    }
    bool over = false;
    cell.facets(h, [&](int64_t j, double sa, bool wall) {
      if (wall || !(sa > 0.0)) return;
      if (cnt >= max_facets) {
        over = true;
        return;
      }
      const int64_t o = i * max_facets + cnt;
      nbr_point[o] = j;
      solid[o] = sa;
      const V3 p = sub({points[3 * j], points[3 * j + 1], points[3 * j + 2]}, c);
      dist[o] = std::sqrt(norm2(p));
      ++cnt;
    });
    if (over) {
      counts[i] = -2;
      overflow = 1;
    } else {
      counts[i] = cnt;
    }
  }
  return overflow;
}

}  // extern "C"
