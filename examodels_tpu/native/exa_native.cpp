// exa_native — native (C++) build-time runtime for examodels_tpu.
//
// The TPU compute path is XLA/Pallas (see examodels_tpu/ops); this library
// covers the *host runtime* around it: data loading and build-time sparsity
// planning, the pieces the reference delegates to compiled Julia and to the
// ExaPowerIO.jl data loader (capability parity: the data build of
// /root/reference/benchmark/runbenchmark.jl:63-150 and the duplicate-NNZ
// compression planning of /root/reference/src/utils.jl:411-512).
//
// Exposed C ABI (consumed via ctypes from examodels_tpu.native):
//   MATPOWER case parser:  mp_parse / mp_matrix_meta / mp_matrix_copy /
//                          mp_base_mva / mp_free
//   COO compression plan:  coo_compress_plan  (stable sort by (row, col),
//                          unique coordinates, segment ids)
//   Segment bounds:        segment_bounds     (CSR-style pointer array from
//                          sorted target ids)

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Matrix {
  std::vector<double> data;  // row-major, padded to `cols`
  int64_t rows = 0;
  int64_t cols = 0;
};

struct MpCase {
  std::unordered_map<std::string, Matrix> mats;
  double base_mva = 100.0;
};

// ---------------------------------------------------------------------------
// MATPOWER .m tokenizer: finds `mpc.<name> = <scalar>;` and
// `mpc.<name> = [ ... ];` blocks. `%`-comments run to end of line; matrix
// rows are separated by `;` or newline; entries by whitespace or commas.
// ---------------------------------------------------------------------------

inline const char* skip_ws_comments(const char* p, const char* end) {
  for (;;) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    if (p < end && *p == '%') {
      while (p < end && *p != '\n') ++p;
      continue;
    }
    return p;
  }
}

bool parse_matrix(const char*& p, const char* end, Matrix& m) {
  // p points just past '['
  std::vector<std::vector<double>> rows;
  std::vector<double> cur;
  for (;;) {
    p = skip_ws_comments(p, end);
    if (p >= end) return false;
    char c = *p;
    if (c == ']') {
      ++p;
      break;
    }
    if (c == ';' || c == '\n') {
      if (!cur.empty()) {
        rows.emplace_back(std::move(cur));
        cur.clear();
      }
      ++p;
      continue;
    }
    if (c == ',') {
      ++p;
      continue;
    }
    char* after = nullptr;
    double v = std::strtod(p, &after);
    if (after == p) return false;  // not a number where one was expected
    cur.push_back(v);
    p = after;
  }
  if (!cur.empty()) rows.emplace_back(std::move(cur));
  int64_t width = 0;
  for (auto& r : rows) width = std::max<int64_t>(width, (int64_t)r.size());
  m.rows = (int64_t)rows.size();
  m.cols = width;
  m.data.assign((size_t)(m.rows * m.cols), 0.0);
  for (int64_t i = 0; i < m.rows; ++i)
    std::copy(rows[(size_t)i].begin(), rows[(size_t)i].end(),
              m.data.begin() + (size_t)(i * m.cols));
  return true;
}

}  // namespace

extern "C" {

void* mp_parse(const char* text, int64_t len) {
  auto* cs = new MpCase();
  // Blank %-comments (to end of line) up front so the top-level `mpc.` scan
  // cannot pick up a commented-out assignment (e.g. `% mpc.baseMVA = 200;`)
  // as live data; newlines are preserved for row separation.
  std::string clean(text, (size_t)len);
  for (size_t i = 0; i < clean.size(); ++i) {
    if (clean[i] == '%') {
      while (i < clean.size() && clean[i] != '\n') clean[i++] = ' ';
    }
  }
  const char* p = clean.data();
  const char* end = p + clean.size();
  while (p < end) {
    const char* hit = (const char*)memmem(p, (size_t)(end - p), "mpc.", 4);
    if (!hit) break;
    p = hit + 4;
    const char* name_start = p;
    while (p < end && (std::isalnum((unsigned char)*p) || *p == '_')) ++p;
    std::string name(name_start, p);
    p = skip_ws_comments(p, end);
    if (p >= end || *p != '=') continue;
    ++p;
    p = skip_ws_comments(p, end);
    if (p >= end) break;
    if (*p == '[') {
      ++p;
      Matrix m;
      if (parse_matrix(p, end, m)) cs->mats.emplace(std::move(name), std::move(m));
    } else if (*p == '\'' || *p == '"') {
      // string field (e.g. mpc.version = '2') — skip to closing quote
      char q = *p++;
      while (p < end && *p != q) ++p;
    } else {
      char* after = nullptr;
      double v = std::strtod(p, &after);
      if (after != p) {
        if (name == "baseMVA") cs->base_mva = v;
        p = after;
      }
    }
  }
  return cs;
}

// rows/cols of a named matrix; returns 0 if present, -1 if absent.
int32_t mp_matrix_meta(void* handle, const char* name, int64_t* rows,
                       int64_t* cols) {
  auto* cs = static_cast<MpCase*>(handle);
  auto it = cs->mats.find(name);
  if (it == cs->mats.end()) return -1;
  *rows = it->second.rows;
  *cols = it->second.cols;
  return 0;
}

int32_t mp_matrix_copy(void* handle, const char* name, double* out) {
  auto* cs = static_cast<MpCase*>(handle);
  auto it = cs->mats.find(name);
  if (it == cs->mats.end()) return -1;
  std::memcpy(out, it->second.data.data(),
              it->second.data.size() * sizeof(double));
  return 0;
}

double mp_base_mva(void* handle) {
  return static_cast<MpCase*>(handle)->base_mva;
}

void mp_free(void* handle) { delete static_cast<MpCase*>(handle); }

// ---------------------------------------------------------------------------
// COO compression plan: stable argsort of (row, col) keys + unique
// coordinates + segment ids. Inputs are int64 arrays of length n; outputs
// perm (n), seg (n), urows (n), ucols (n) are caller-allocated (n is an
// upper bound on unique count); returns the number of unique coordinates.
// ---------------------------------------------------------------------------

int64_t coo_compress_plan(const int64_t* rows, const int64_t* cols, int64_t n,
                          int32_t* perm, int32_t* seg, int32_t* urows,
                          int32_t* ucols) {
  std::vector<int64_t> idx((size_t)n);
  std::iota(idx.begin(), idx.end(), 0);
  std::stable_sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
    if (rows[a] != rows[b]) return rows[a] < rows[b];
    return cols[a] < cols[b];
  });
  int64_t nu = 0;
  int64_t prev_r = INT64_MIN, prev_c = INT64_MIN;
  for (int64_t k = 0; k < n; ++k) {
    int64_t j = idx[(size_t)k];
    perm[k] = (int32_t)j;
    if (rows[j] != prev_r || cols[j] != prev_c) {
      urows[nu] = (int32_t)rows[j];
      ucols[nu] = (int32_t)cols[j];
      prev_r = rows[j];
      prev_c = cols[j];
      ++nu;
    }
    seg[k] = (int32_t)(nu - 1);
  }
  return nu;
}

// CSR-style segment boundaries of sorted non-negative target ids:
// bounds[s] = first index with target >= s, for s in 0..nseg.
void segment_bounds(const int64_t* sorted_targets, int64_t n, int64_t nseg,
                    int32_t* bounds) {
  int64_t k = 0;
  for (int64_t s = 0; s <= nseg; ++s) {
    while (k < n && sorted_targets[k] < s) ++k;
    bounds[s] = (int32_t)k;
  }
}

}  // extern "C"
