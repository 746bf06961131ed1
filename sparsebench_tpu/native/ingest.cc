// Native host-side ingest kernels for sparsebench_tpu.
//
// TPU-native counterpart of the reference's C host layer: the HPCG stencil
// generator (reference src/matrix.c:30-121), the Matrix Market parser
// (src/mmio.c + src/matrix.c:123-229), and the SELL-C-sigma fill loop
// (src/matrix-SCS.c:165-196). The Python numpy implementations in
// sparsebench_tpu/host are the behavioral spec; these replace them 1:1 for
// speed on benchmark-scale problems (a 200^3 generator call is ~870 MB of
// output; numpy takes minutes, this takes ~1 s).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this
// environment). All output buffers are allocated by the caller (numpy);
// functions return actual element counts or negative error codes.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Stencil generator (reference src/matrix.c:30-121).
// row_ptr: int64[local_nrow+1]; col: int32[27*local_nrow];
// val32/val64: exactly one non-null, capacity 27*local_nrow.
// Returns actual nnz.
int64_t sb_generate_stencil(int32_t nx, int32_t ny, int32_t nz, int32_t rank,
                            int32_t size, int32_t use_7pt, int64_t* row_ptr,
                            int32_t* col, float* val32, double* val64) {
  const int64_t local_nrow = (int64_t)nx * ny * nz;
  const int64_t total_nrow = local_nrow * size;
  const int64_t start_row = local_nrow * rank;
  const int64_t plane = (int64_t)nx * ny;

  // Precompute the (sz, sy, sx) offset list in reference loop order.
  int64_t offs[27];
  int8_t osx[27], osy[27];
  int noff = 0;
  for (int sz = -1; sz <= 1; ++sz)
    for (int sy = -1; sy <= 1; ++sy)
      for (int sx = -1; sx <= 1; ++sx) {
        if (use_7pt && sz * sz + sy * sy + sx * sx > 1) continue;
        offs[noff] = (int64_t)sz * plane + (int64_t)sy * nx + sx;
        osx[noff] = (int8_t)sx;
        osy[noff] = (int8_t)sy;
        ++noff;
      }

  int64_t cursor = 0;
  row_ptr[0] = 0;
  int64_t row_id = 0;
  for (int32_t iz = 0; iz < nz; ++iz) {
    for (int32_t iy = 0; iy < ny; ++iy) {
      for (int32_t ix = 0; ix < nx; ++ix, ++row_id) {
        const int64_t currow = start_row + row_id;
        for (int k = 0; k < noff; ++k) {
          const int32_t jx = ix + osx[k];
          const int32_t jy = iy + osy[k];
          if (jx < 0 || jx >= nx || jy < 0 || jy >= ny) continue;
          const int64_t curcol = currow + offs[k];
          if (curcol < 0 || curcol >= total_nrow) continue;
          col[cursor] = (int32_t)curcol;
          if (val32)
            val32[cursor] = (curcol == currow) ? 27.0f : -1.0f;
          else
            val64[cursor] = (curcol == currow) ? 27.0 : -1.0;
          ++cursor;
        }
        row_ptr[row_id + 1] = cursor;
      }
    }
  }
  return cursor;
}

// ---------------------------------------------------------------------------
// Matrix Market body parser. The caller (Python) reads the banner/size line
// and hands over the file offset of the first entry plus the entry count
// and flags. Fills row/col/val (capacity nz, or 2*nz when symmetric
// mirroring is requested) and returns the entry count after mirroring.
// pattern: values forced to 1.0. Returns -1 on parse error, -2 on I/O.
int64_t sb_mm_parse_body(const char* path, int64_t body_offset, int64_t nz,
                         int32_t pattern, int32_t symmetric, int64_t* row,
                         int64_t* col, double* val) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -2;
  if (std::fseek(f, (long)body_offset, SEEK_SET) != 0) {
    std::fclose(f);
    return -2;
  }
  // Slurp the rest of the file.
  std::fseek(f, 0, SEEK_END);
  const long end = std::ftell(f);
  std::fseek(f, (long)body_offset, SEEK_SET);
  std::vector<char> buf((size_t)(end - body_offset) + 1);
  const size_t got = std::fread(buf.data(), 1, buf.size() - 1, f);
  std::fclose(f);
  buf[got] = '\0';

  const char* p = buf.data();
  char* q = nullptr;
  int64_t cursor = 0;
  for (int64_t i = 0; i < nz; ++i) {
    const long r = std::strtol(p, &q, 10);
    if (q == p) return -1;
    p = q;
    const long c = std::strtol(p, &q, 10);
    if (q == p) return -1;
    p = q;
    double v = 1.0;
    if (!pattern) {
      v = std::strtod(p, &q);
      if (q == p) return -1;
      p = q;
    }
    row[cursor] = r - 1;  // 1-based -> 0-based (reference matrix.c:200-201)
    col[cursor] = c - 1;
    val[cursor] = v;
    ++cursor;
    if (symmetric && r != c) {  // mirror (reference matrix.c:204-208)
      row[cursor] = c - 1;
      col[cursor] = r - 1;
      val[cursor] = v;
      ++cursor;
    }
  }
  return cursor;
}

// ---------------------------------------------------------------------------
// Row-major (row, col) sort of COO entries, in place. Equivalent to the
// reference's qsort-by-col + stable-qsort-by-row (src/matrix.c:219-228).
void sb_coo_sort(int64_t n, int64_t* row, int64_t* col, double* val) {
  std::vector<int64_t> perm(n);
  for (int64_t i = 0; i < n; ++i) perm[i] = i;
  std::sort(perm.begin(), perm.end(), [&](int64_t a, int64_t b) {
    if (row[a] != row[b]) return row[a] < row[b];
    return col[a] < col[b];
  });
  std::vector<int64_t> tmp_i(n);
  std::vector<double> tmp_d(n);
  for (int64_t i = 0; i < n; ++i) tmp_i[i] = row[perm[i]];
  std::memcpy(row, tmp_i.data(), n * sizeof(int64_t));
  for (int64_t i = 0; i < n; ++i) tmp_i[i] = col[perm[i]];
  std::memcpy(col, tmp_i.data(), n * sizeof(int64_t));
  for (int64_t i = 0; i < n; ++i) tmp_d[i] = val[perm[i]];
  std::memcpy(val, tmp_d.data(), n * sizeof(double));
}

// ---------------------------------------------------------------------------
// SELL-C-sigma flat fill (reference src/matrix-SCS.c:165-196): scatter CSR
// entries into the chunk-column-major flat layout given the row permutation
// and chunk pointers. Types match the host conversion (int64 indices).
void sb_sell_fill(int64_t nr, const int64_t* row_ptr, const int64_t* csr_col,
                  const double* csr_val, const int64_t* old_to_new,
                  const int64_t* chunk_ptr, int64_t C, int64_t* out_col,
                  double* out_val) {
  for (int64_t i = 0; i < nr; ++i) {
    const int64_t rnew = old_to_new[i];
    const int64_t chunk = rnew / C;
    const int64_t lane = rnew % C;
    const int64_t base = chunk_ptr[chunk] + lane;
    int64_t j = 0;
    for (int64_t e = row_ptr[i]; e < row_ptr[i + 1]; ++e, ++j) {
      const int64_t idx = base + j * C;
      out_col[idx] = csr_col[e];
      out_val[idx] = csr_val[e];
    }
  }
}

// ---------------------------------------------------------------------------
// BSELL builder (formats/bsell.py layout; the numpy builder is the spec).
// Rows group 128 per lane-group (8 groups/tile); entries bucket by 128-wide
// column block; per (group, block) rows pad to the longest per-row count
// ("slices"). Two passes: plan (slice counts + window extents) then fill.
//
// The numpy pipeline does ~10 full argsort/scatter passes over nnz-length
// int64 arrays (measured ~57 min at 200^3 on this one-core host); these two
// linear passes run in seconds.

namespace {
constexpr int64_t kLanes = 128;
constexpr int64_t kSublanes = 8;
constexpr int64_t kTileRows = kLanes * kSublanes;

inline uint16_t f32_to_bf16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  return (uint16_t)((x + 0x7FFFu + ((x >> 16) & 1u)) >> 16);
}

// Per-group (block -> max per-row run length), blocks kept sorted ascending
// to match the numpy builder's slice order.
struct GroupPlan {
  std::vector<std::pair<int64_t, int32_t>> lmax;  // (block, lmax) ascending

  void scan(const int64_t* row_ptr, const int64_t* col, int64_t r0,
            int64_t r1) {
    lmax.clear();
    for (int64_t i = r0; i < r1; ++i) {
      int64_t e = row_ptr[i];
      const int64_t end = row_ptr[i + 1];
      while (e < end) {
        const int64_t b = col[e] >> 7;
        int64_t e2 = e + 1;
        while (e2 < end && (col[e2] >> 7) == b) ++e2;
        const int32_t run = (int32_t)(e2 - e);
        auto it = std::lower_bound(
            lmax.begin(), lmax.end(), b,
            [](const std::pair<int64_t, int32_t>& p, int64_t key) {
              return p.first < key;
            });
        if (it != lmax.end() && it->first == b) {
          if (run > it->second) it->second = run;
        } else {
          lmax.insert(it, {b, run});
        }
        e = e2;
      }
    }
  }
};
}  // namespace

// Plan pass. win_lo/win_hi: int64[n_tiles], pre-filled by caller with
// INT64_MAX / -1. Returns global s_max (>= 1).
int64_t sb_bsell_plan(int64_t nr, const int64_t* row_ptr, const int64_t* col,
                      int64_t* win_lo, int64_t* win_hi) {
  const int64_t ngroups = (nr + kLanes - 1) / kLanes;
  int64_t s_max = 1;
  GroupPlan gp;
  for (int64_t g = 0; g < ngroups; ++g) {
    gp.scan(row_ptr, col, g * kLanes, std::min(nr, (g + 1) * kLanes));
    int64_t s = 0;
    for (auto& p : gp.lmax) s += p.second;
    if (s > s_max) s_max = s;
    if (!gp.lmax.empty()) {
      const int64_t t = g / kSublanes;
      win_lo[t] = std::min(win_lo[t], gp.lmax.front().first);
      win_hi[t] = std::max(win_hi[t], gp.lmax.back().first);
    }
  }
  return s_max;
}

// Fill pass. All output arrays zero-initialized by the caller.
// vals_out: float[n_tiles*s_max*8*128] (bf16_out==0) or
// uint16 bf16 (bf16_out==1); val is f64 (val_is_f64) or f32.
// blocks_out: int32[n_tiles*s_max*8], ids relative to base_blocks[t].
void sb_bsell_fill(int64_t nr, const int64_t* row_ptr, const int64_t* col,
                   const void* val, int32_t val_is_f64, int64_t s_max,
                   const int32_t* base_blocks, int32_t bf16_out,
                   void* vals_out, int8_t* lidx_out, int32_t* blocks_out) {
  const int64_t ngroups = (nr + kLanes - 1) / kLanes;
  const double* v64 = val_is_f64 ? (const double*)val : nullptr;
  const float* v32 = val_is_f64 ? nullptr : (const float*)val;
  float* o32 = bf16_out ? nullptr : (float*)vals_out;
  uint16_t* o16 = bf16_out ? (uint16_t*)vals_out : nullptr;
  GroupPlan gp;
  std::vector<int64_t> offset;  // slice offset per planned block
  for (int64_t g = 0; g < ngroups; ++g) {
    const int64_t r0 = g * kLanes, r1 = std::min(nr, (g + 1) * kLanes);
    gp.scan(row_ptr, col, r0, r1);
    const int64_t t = g / kSublanes, s = g % kSublanes;
    offset.resize(gp.lmax.size());
    int64_t cur = 0;
    for (size_t k = 0; k < gp.lmax.size(); ++k) {
      offset[k] = cur;
      // block table: slices [cur, cur+lmax) of sublane s hold this block
      const int32_t rel = (int32_t)(gp.lmax[k].first - base_blocks[t]);
      for (int32_t j = 0; j < gp.lmax[k].second; ++j)
        blocks_out[((t * s_max + cur + j) * kSublanes) + s] = rel;
      cur += gp.lmax[k].second;
    }
    for (int64_t i = r0; i < r1; ++i) {
      const int64_t lane = i - r0;
      int64_t e = row_ptr[i];
      const int64_t end = row_ptr[i + 1];
      while (e < end) {
        const int64_t b = col[e] >> 7;
        auto it = std::lower_bound(
            gp.lmax.begin(), gp.lmax.end(), b,
            [](const std::pair<int64_t, int32_t>& p, int64_t key) {
              return p.first < key;
            });
        const int64_t slice0 = offset[it - gp.lmax.begin()];
        int64_t j = 0;
        while (e < end && (col[e] >> 7) == b) {
          const int64_t idx =
              (((t * s_max + slice0 + j) * kSublanes) + s) * kLanes + lane;
          const float fv = v64 ? (float)v64[e] : v32[e];
          if (o16)
            o16[idx] = f32_to_bf16(fv);
          else
            o32[idx] = fv;
          lidx_out[idx] = (int8_t)(col[e] & 127);
          ++e;
          ++j;
        }
      }
    }
  }
}

}  // extern "C"
