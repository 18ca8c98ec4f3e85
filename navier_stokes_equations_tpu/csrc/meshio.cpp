// Native mesh-ingest runtime: fast gmsh v2.2 parsing + P2 edge synthesis.
//
// The reference's ingest is C++ inside deal.II (reference:
// src/classes/NavierStokes.cpp:7-62 reads the .msh on every rank;
// DoF generation happens in the library).  Here the host-side runtime is
// likewise native: this library parses .msh files and deduplicates element
// edges (the P2-node synthesis step, the most expensive part of
// preprocessing for large 3D meshes) with O(n log n) sorts, exposed to
// Python through a plain C ABI (ctypes).  The Python implementations in
// mesh/gmsh_io.py and mesh/taylor_hood.py remain as the portable fallback;
// results are bit-identical (tests/test_native.py).
//
// Build: make -C navier_stokes_equations_tpu/csrc
//
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct MshData {
  std::vector<double> points;          // (n_nodes, 3)
  std::vector<int64_t> node_ids;       // original 1-based ids
  std::vector<int32_t> tris, tri_tags; // (n, 3) / (n,)
  std::vector<int32_t> tets, tet_tags;
  std::vector<int32_t> lines, line_tags;
  std::string error;
};

bool read_all(const char *path, std::string &out) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = std::fread(out.data(), 1, static_cast<size_t>(n), f);
  std::fclose(f);
  out.resize(got);
  return true;
}

// Fast forward-only tokenizer.
struct Cursor {
  const char *p, *end;
  explicit Cursor(const std::string &s) : p(s.data()), end(s.data() + s.size()) {}
  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n')) ++p;
  }
  bool line(std::string &out) {
    if (p >= end) return false;
    const char *nl = static_cast<const char *>(memchr(p, '\n', end - p));
    if (!nl) nl = end;
    out.assign(p, nl);
    while (!out.empty() && (out.back() == '\r')) out.pop_back();
    p = nl < end ? nl + 1 : end;
    return true;
  }
  long next_long() {
    skip_ws();
    char *q;
    long v = std::strtol(p, &q, 10);
    p = q;
    return v;
  }
  double next_double() {
    skip_ws();
    char *q;
    double v = std::strtod(p, &q);
    p = q;
    return v;
  }
  void skip_line() {
    const char *nl = static_cast<const char *>(memchr(p, '\n', end - p));
    p = nl ? nl + 1 : end;
  }
};

MshData *parse(const char *path) {
  auto *m = new MshData();
  std::string buf;
  if (!read_all(path, buf)) {
    m->error = "cannot open file";
    return m;
  }
  Cursor c(buf);
  std::string ln;
  while (c.line(ln)) {
    if (ln == "$Nodes" || ln == "$ParametricNodes") {
      // $ParametricNodes carries extra columns after x y z; both sections
      // start each line with "id x y z" (reference rewrites the header the
      // same way, NavierStokes.cpp:16-51).
      long n = c.next_long();
      c.skip_line();
      m->points.reserve(3 * n);
      m->node_ids.reserve(n);
      for (long i = 0; i < n; ++i) {
        long id = c.next_long();
        double x = c.next_double(), y = c.next_double(), z = c.next_double();
        m->node_ids.push_back(id);
        m->points.push_back(x);
        m->points.push_back(y);
        m->points.push_back(z);
        c.skip_line();
      }
    } else if (ln == "$Elements") {
      long n = c.next_long();
      c.skip_line();
      for (long i = 0; i < n; ++i) {
        c.next_long(); // element id
        long etype = c.next_long();
        long ntags = c.next_long();
        long phys = 0;
        for (long t = 0; t < ntags; ++t) {
          long v = c.next_long();
          if (t == 0) phys = v;
        }
        auto push = [&](std::vector<int32_t> &conn, std::vector<int32_t> &tags, int k) {
          for (int j = 0; j < k; ++j) conn.push_back(static_cast<int32_t>(c.next_long()));
          tags.push_back(static_cast<int32_t>(phys));
        };
        if (etype == 1) push(m->lines, m->line_tags, 2);
        else if (etype == 2) push(m->tris, m->tri_tags, 3);
        else if (etype == 4) push(m->tets, m->tet_tags, 4);
        c.skip_line();
      }
    }
  }
  if (m->points.empty()) m->error = "no $Nodes section";
  return m;
}

} // namespace

extern "C" {

void *ns_msh_open(const char *path) { return parse(path); }

const char *ns_msh_error(void *h) {
  auto *m = static_cast<MshData *>(h);
  return m->error.empty() ? nullptr : m->error.c_str();
}

int64_t ns_msh_n_nodes(void *h) { return static_cast<MshData *>(h)->node_ids.size(); }
int64_t ns_msh_n_tris(void *h) { return static_cast<MshData *>(h)->tri_tags.size(); }
int64_t ns_msh_n_tets(void *h) { return static_cast<MshData *>(h)->tet_tags.size(); }
int64_t ns_msh_n_lines(void *h) { return static_cast<MshData *>(h)->line_tags.size(); }

void ns_msh_copy(void *h, double *points, int64_t *node_ids, int32_t *tris,
                 int32_t *tri_tags, int32_t *tets, int32_t *tet_tags,
                 int32_t *lines, int32_t *line_tags) {
  auto *m = static_cast<MshData *>(h);
  auto cp = [](auto &v, auto *dst) {
    if (dst && !v.empty()) std::memcpy(dst, v.data(), v.size() * sizeof(v[0]));
  };
  cp(m->points, points);
  cp(m->node_ids, node_ids);
  cp(m->tris, tris);
  cp(m->tri_tags, tri_tags);
  cp(m->tets, tets);
  cp(m->tet_tags, tet_tags);
  cp(m->lines, lines);
  cp(m->line_tags, line_tags);
}

void ns_msh_close(void *h) { delete static_cast<MshData *>(h); }

// P2 edge synthesis: deduplicate the (sorted) endpoint pairs of all element
// edges.  cells: (n_el, nv) int32; edge_list: (n_edges_per_el, 2) local
// vertex indices.  Outputs: unique_edges (n_unique, 2) and, per element
// edge, its index into the unique list.  Returns n_unique.
int64_t ns_unique_edges(int64_t n_el, int32_t nv, const int32_t *cells,
                        int32_t n_eper, const int32_t *edge_list,
                        int32_t *unique_edges /* cap 2*n_el*n_eper */,
                        int64_t *elem_edge_idx /* n_el*n_eper */) {
  const int64_t total = n_el * n_eper;
  struct E {
    int32_t a, b;
    int64_t src;
  };
  std::vector<E> edges(total);
  for (int64_t e = 0; e < n_el; ++e) {
    const int32_t *cell = cells + e * nv;
    for (int32_t k = 0; k < n_eper; ++k) {
      int32_t a = cell[edge_list[2 * k]];
      int32_t b = cell[edge_list[2 * k + 1]];
      if (a > b) std::swap(a, b);
      edges[e * n_eper + k] = {a, b, e * n_eper + k};
    }
  }
  std::sort(edges.begin(), edges.end(), [](const E &x, const E &y) {
    return x.a != y.a ? x.a < y.a : x.b < y.b;
  });
  int64_t n_unique = 0;
  for (int64_t i = 0; i < total; ++i) {
    if (i == 0 || edges[i].a != edges[i - 1].a || edges[i].b != edges[i - 1].b) {
      unique_edges[2 * n_unique] = edges[i].a;
      unique_edges[2 * n_unique + 1] = edges[i].b;
      ++n_unique;
    }
    elem_edge_idx[edges[i].src] = n_unique - 1;
  }
  return n_unique;
}

} // extern "C"
