// csmpn_lift: native simplicial lifting core.
//
// C++ replacement for the reference's GUDHI/networkx preprocessing backends
// (SURVEY.md C17/C18/C22): Vietoris-Rips flag complexes up to dim 2, clique
// lifts with edge-length / triangle-area thresholds, and the
// boundary/coboundary/upper adjacency generation including the reference's
// fully-connected 0-0 augmentation quirk (utils.py:91-96).
//
// Exposed through a minimal C ABI (ctypes-friendly, caller-allocated
// buffers); semantics are bit-identical to the pure-Python
// csmpn_tpu/data/lifting.py path, which doubles as its test oracle.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <set>
#include <vector>

namespace {

struct Complex {
  int n_points = 0;
  std::vector<std::pair<int, int>> edges;          // sorted pairs, lex order
  std::vector<std::array<int, 3>> tris;            // sorted triples, lex
};

// adjacency quad: (src_dim, dst_dim, src_idx, dst_idx)
using AdjVec = std::vector<std::array<int32_t, 4>>;

int edge_index(const Complex& c, int a, int b) {
  if (a > b) std::swap(a, b);
  auto it = std::lower_bound(c.edges.begin(), c.edges.end(),
                             std::make_pair(a, b));
  return static_cast<int>(it - c.edges.begin());
}

// Boundary + upper (shared-coface) adjacency, mirroring the Python
// generate_adjacencies(); downward relations are added by the flattening
// step later.
void generate_adjacencies(const Complex& c, bool fully_connect,
                          AdjVec* out) {
  // 0-0 upper adjacency via edge cofaces: both directions per edge
  for (const auto& e : c.edges) {
    out->push_back({0, 0, (int32_t)e.second, (int32_t)e.first});
    out->push_back({0, 0, (int32_t)e.first, (int32_t)e.second});
  }
  // 1-1 upper adjacency via triangle cofaces: all ordered pairs of the 3
  // boundary edges of each triangle
  for (const auto& t : c.tris) {
    int e01 = edge_index(c, t[0], t[1]);
    int e02 = edge_index(c, t[0], t[2]);
    int e12 = edge_index(c, t[1], t[2]);
    int es[3] = {e01, e02, e12};
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b)
        if (a != b)
          out->push_back({1, 1, (int32_t)es[a], (int32_t)es[b]});
  }
  // boundary 0 -> 1
  for (size_t i = 0; i < c.edges.size(); ++i) {
    out->push_back({0, 1, (int32_t)c.edges[i].first, (int32_t)i});
    out->push_back({0, 1, (int32_t)c.edges[i].second, (int32_t)i});
  }
  // boundary 1 -> 2
  for (size_t i = 0; i < c.tris.size(); ++i) {
    const auto& t = c.tris[i];
    out->push_back({1, 2, (int32_t)edge_index(c, t[0], t[1]), (int32_t)i});
    out->push_back({1, 2, (int32_t)edge_index(c, t[0], t[2]), (int32_t)i});
    out->push_back({1, 2, (int32_t)edge_index(c, t[1], t[2]), (int32_t)i});
  }
  if (fully_connect) {
    // Reference quirk (utils.py:91-96): membership tested against sorted
    // pairs only — (i, j) added whenever NOT (i < j and {i, j} an edge),
    // duplicating the (hi, lo) direction of real edges.
    std::set<std::pair<int, int>> edge_set(c.edges.begin(), c.edges.end());
    for (int i = 0; i < c.n_points; ++i)
      for (int j = 0; j < c.n_points; ++j)
        if (i != j && !(i < j && edge_set.count({i, j})))
          out->push_back({0, 0, (int32_t)i, (int32_t)j});
  }
}

int write_outputs(const Complex& c, const AdjVec& adj, int32_t* edges_out,
                  int32_t* n_edges, int32_t max_edges, int32_t* tris_out,
                  int32_t* n_tris, int32_t max_tris, int32_t* adj_out,
                  int32_t* n_adj, int32_t max_adj) {
  if ((int32_t)c.edges.size() > max_edges ||
      (int32_t)c.tris.size() > max_tris ||
      (int32_t)adj.size() > max_adj)
    return -1;  // caller buffers too small
  *n_edges = (int32_t)c.edges.size();
  for (size_t i = 0; i < c.edges.size(); ++i) {
    edges_out[2 * i] = c.edges[i].first;
    edges_out[2 * i + 1] = c.edges[i].second;
  }
  *n_tris = (int32_t)c.tris.size();
  for (size_t i = 0; i < c.tris.size(); ++i)
    for (int k = 0; k < 3; ++k) tris_out[3 * i + k] = c.tris[i][k];
  *n_adj = (int32_t)adj.size();
  for (size_t i = 0; i < adj.size(); ++i)
    for (int k = 0; k < 4; ++k) adj_out[4 * i + k] = adj[i][k];
  return 0;
}

}  // namespace

extern "C" {

// Vietoris-Rips flag complex (dim <= 2) at scale `dis` + adjacency.
// points: (n, d) row-major doubles.  Returns 0 ok, -1 buffers too small.
int csmpn_rips_lift(const double* points, int32_t n, int32_t d, double dis,
                    int32_t max_dim, int32_t fully_connect,
                    int32_t* edges_out, int32_t* n_edges, int32_t max_edges,
                    int32_t* tris_out, int32_t* n_tris, int32_t max_tris,
                    int32_t* adj_out, int32_t* n_adj, int32_t max_adj) {
  Complex c;
  c.n_points = n;
  const double d2max = dis * dis;
  std::vector<uint8_t> within((size_t)n * n, 0);
  for (int i = 0; i < n; ++i)
    for (int j = i + 1; j < n; ++j) {
      double s = 0;
      for (int k = 0; k < d; ++k) {
        double diff = points[i * d + k] - points[j * d + k];
        s += diff * diff;
      }
      if (s <= d2max) {
        within[(size_t)i * n + j] = within[(size_t)j * n + i] = 1;
        c.edges.push_back({i, j});
      }
    }
  if (max_dim >= 2) {
    for (const auto& e : c.edges) {
      for (int k = e.second + 1; k < n; ++k)
        if (within[(size_t)e.first * n + k] &&
            within[(size_t)e.second * n + k])
          c.tris.push_back({e.first, e.second, k});
    }
    std::sort(c.tris.begin(), c.tris.end());
  }
  AdjVec adj;
  generate_adjacencies(c, fully_connect != 0, &adj);
  return write_outputs(c, adj, edges_out, n_edges, max_edges, tris_out,
                       n_tris, max_tris, adj_out, n_adj, max_adj);
}

// Clique lift with thresholds (reference simplicial_lift semantics,
// utils.py:151-207): candidate edges/triangles come from the GRAPH given by
// und_edges; edges filtered by length, triangles by area; surviving
// triangles resurrect their boundary edges.  No fully-connected fill.
int csmpn_clique_lift(const double* points, int32_t n, int32_t d,
                      const int32_t* und_edges, int32_t n_und,
                      double edge_th, double tri_th, int32_t* edges_out,
                      int32_t* n_edges, int32_t max_edges, int32_t* tris_out,
                      int32_t* n_tris, int32_t max_tris, int32_t* adj_out,
                      int32_t* n_adj, int32_t max_adj) {
  std::vector<std::set<int>> nbrs(n);
  std::vector<std::pair<int, int>> und;
  for (int i = 0; i < n_und; ++i) {
    int a = und_edges[2 * i], b = und_edges[2 * i + 1];
    if (a > b) std::swap(a, b);
    if (a == b) continue;
    und.push_back({a, b});
  }
  std::sort(und.begin(), und.end());
  und.erase(std::unique(und.begin(), und.end()), und.end());
  for (const auto& e : und) {
    nbrs[e.first].insert(e.second);
    nbrs[e.second].insert(e.first);
  }

  auto dist = [&](int a, int b) {
    double s = 0;
    for (int k = 0; k < d; ++k) {
      double diff = points[a * d + k] - points[b * d + k];
      s += diff * diff;
    }
    return std::sqrt(s);
  };

  std::set<std::pair<int, int>> edge_set;
  std::vector<std::array<int, 3>> tris;
  for (const auto& e : und)
    if (dist(e.first, e.second) <= edge_th) edge_set.insert(e);
  // 3-cliques; triangle area via Gram determinant (dimension-agnostic)
  for (const auto& e : und) {
    int a = e.first, b = e.second;
    for (int cvx : nbrs[a]) {
      if (cvx <= b || !nbrs[b].count(cvx)) continue;
      std::vector<double> v1(d), v2(d);
      for (int k = 0; k < d; ++k) {
        v1[k] = points[b * d + k] - points[a * d + k];
        v2[k] = points[cvx * d + k] - points[a * d + k];
      }
      double g11 = 0, g12 = 0, g22 = 0;
      for (int k = 0; k < d; ++k) {
        g11 += v1[k] * v1[k];
        g12 += v1[k] * v2[k];
        g22 += v2[k] * v2[k];
      }
      double det = g11 * g22 - g12 * g12;
      double area = 0.5 * std::sqrt(det > 0 ? det : 0);
      if (area <= tri_th) {
        tris.push_back({a, b, cvx});
        // gudhi insert semantics: faces resurrected
        edge_set.insert({a, b});
        edge_set.insert({a, cvx});
        edge_set.insert({b, cvx});
      }
    }
  }
  Complex c;
  c.n_points = n;
  c.edges.assign(edge_set.begin(), edge_set.end());
  std::sort(tris.begin(), tris.end());
  c.tris = tris;
  AdjVec adj;
  generate_adjacencies(c, false, &adj);
  return write_outputs(c, adj, edges_out, n_edges, max_edges, tris_out,
                       n_tris, max_tris, adj_out, n_adj, max_adj);
}

}  // extern "C"
