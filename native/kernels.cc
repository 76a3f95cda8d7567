// Native host-side kernel library for matlab_code_tpu.
//
// TPU-native replacements for the reference's external native dependencies
// (L-BFGS-B-C, TV_Condat_v2, Proximity Operator Repository — README.md:7-10):
// exact 1-D total-variation prox (Condat's direct algorithm), isotonic (PAVA)
// and unimodal (Stout prefix-isotonic) regression, simplex projection, and a
// box-constrained limited-memory BFGS.  These run on the host CPU as the
// golden/validation path and for host-side pre/post-processing; the jit
// compute path uses the JAX implementations in matlab_code_tpu/ops/.
//
// C ABI, consumed via ctypes (native/__init__.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Condat's direct 1-D TV denoising (exact prox), one column.
// Reference behavior: TV_Condat_v2.m as wrapped by functions/prox_TV.m.
// ---------------------------------------------------------------------------
void tv_denoise(const double* y, double* x, int64_t n, double lam) {
  if (n <= 0) return;
  if (n == 1 || lam <= 0) {
    std::memcpy(x, y, sizeof(double) * n);
    return;
  }
  int64_t k = 0, k0 = 0, km = 0, kp = 0;
  double vmin = y[0] - lam, vmax = y[0] + lam;
  double umin = lam, umax = -lam;
  for (;;) {
    if (k == n - 1) {
      // boundary handling (steps b/i/j/k of the paper)
      if (umin < 0) {
        for (int64_t i = k0; i <= km; ++i) x[i] = vmin;
        k = k0 = km = km + 1;
        vmin = y[k];
        umin = lam;
        umax = y[k] + lam - vmax;
        if (k == n - 1) { x[k] = vmin + umin; return; }
        continue;
      } else if (umax > 0) {
        for (int64_t i = k0; i <= kp; ++i) x[i] = vmax;
        k = k0 = kp = kp + 1;
        vmax = y[k];
        umax = -lam;
        umin = y[k] - lam - vmin;
        if (k == n - 1) { x[k] = vmin + umin; return; }
        continue;
      } else {
        double v = vmin + umin / static_cast<double>(k - k0 + 1);
        for (int64_t i = k0; i <= n - 1; ++i) x[i] = v;
        return;
      }
    }
    if (y[k + 1] + umin < vmin - lam) {          // negative jump
      for (int64_t i = k0; i <= km; ++i) x[i] = vmin;
      k = k0 = km = kp = km + 1;
      vmin = y[k];
      vmax = y[k] + 2 * lam;
      umin = lam;
      umax = -lam;
      if (k == n - 1) { x[k] = vmin + umin; return; }
    } else if (y[k + 1] + umax > vmax + lam) {   // positive jump
      for (int64_t i = k0; i <= kp; ++i) x[i] = vmax;
      k = k0 = km = kp = kp + 1;
      vmin = y[k] - 2 * lam;
      vmax = y[k];
      umin = lam;
      umax = -lam;
      if (k == n - 1) { x[k] = vmin + umin; return; }
    } else {                                      // no jump: extend segment
      k += 1;
      umin += y[k] - vmin;
      umax += y[k] - vmax;
      if (umin >= lam) {
        vmin += (umin - lam) / static_cast<double>(k - k0 + 1);
        umin = lam;
        km = k;
      }
      if (umax <= -lam) {
        vmax += (umax + lam) / static_cast<double>(k - k0 + 1);
        umax = -lam;
        kp = k;
      }
    }
  }
}

// column-wise over an (n x r) column-major-by-column buffer
void tv_denoise_cols(const double* Y, double* X, int64_t n, int64_t r,
                     double lam) {
  for (int64_t c = 0; c < r; ++c) tv_denoise(Y + c * n, X + c * n, n, lam);
}

// ---------------------------------------------------------------------------
// L2 isotonic regression (PAVA), nondecreasing, one vector.
// Reference behavior: project_monotone (constraints_to_prox.m:25-28).
// ---------------------------------------------------------------------------
void isotonic(const double* y, double* x, int64_t n) {
  std::vector<double> level(n), weight(n);
  std::vector<int64_t> len(n);
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    level[m] = y[i];
    weight[m] = 1.0;
    len[m] = 1;
    while (m > 0 && level[m - 1] >= level[m]) {
      double w = weight[m - 1] + weight[m];
      level[m - 1] = (weight[m - 1] * level[m - 1] + weight[m] * level[m]) / w;
      weight[m - 1] = w;
      len[m - 1] += len[m];
      --m;
    }
    ++m;
  }
  int64_t pos = 0;
  for (int64_t b = 0; b < m; ++b)
    for (int64_t i = 0; i < len[b]; ++i) x[pos++] = level[b];
}

// ---------------------------------------------------------------------------
// Unimodal (optionally nonnegative) L2 regression, one vector —
// Stout 2008 prefix-isotonic algorithm; reference behavior:
// functions/project_unimodal_vector.m.
// ---------------------------------------------------------------------------
namespace {
struct PrefixIso {
  std::vector<double> level, err;
  std::vector<int64_t> idxr;  // slot of the leftmost member of the level set
};

PrefixIso prefix_isotonic(const double* y, int64_t n, bool nonneg) {
  PrefixIso out;
  // slot 0 is a sentinel (level -inf, err 0)
  std::vector<double> sumwy(n + 1, 0), sumwy2(n + 1, 0), sumw(n + 1, 0);
  out.level.assign(n + 1, -HUGE_VAL);
  out.err.assign(n + 1, 0.0);
  out.idxr.assign(n + 1, 0);
  std::vector<double> cum(n + 1, 0.0);
  std::vector<char> thresh(n + 1, 0);
  for (int64_t i = 1; i <= n; ++i) {
    sumwy[i] = y[i - 1];
    sumwy2[i] = y[i - 1] * y[i - 1];
    sumw[i] = 1.0;
    cum[i] = cum[i - 1] + sumwy2[i];
  }
  for (int64_t i = 1; i <= n; ++i) {
    out.level[i] = y[i - 1];
    out.idxr[i] = i;
    while (out.level[i] <= out.level[out.idxr[i] - 1]) {
      int64_t mg = out.idxr[i] - 1;
      sumwy[i] += sumwy[mg];
      sumwy2[i] += sumwy2[mg];
      sumw[i] += sumw[mg];
      out.level[i] = sumwy[i] / sumw[i];
      out.idxr[i] = out.idxr[mg];
    }
    double levelerror = sumwy2[i] - sumwy[i] * sumwy[i] / sumw[i];
    if (nonneg && out.level[i] < 0) {
      thresh[i] = 1;
      out.err[i] = cum[i - 1];  // replicates project_unimodal_vector.m:68-70
    } else {
      out.err[i] = levelerror + out.err[out.idxr[i] - 1];
    }
  }
  if (nonneg)
    for (int64_t i = 1; i <= n; ++i)
      if (thresh[i]) out.level[i] = 0.0;
  return out;
}

void reconstruct(const PrefixIso& p, int64_t mode_idx, double* x) {
  int64_t idx = mode_idx;
  while (idx >= 1) {
    int64_t left = p.idxr[idx];
    for (int64_t j = left; j <= idx; ++j) x[j - 1] = p.level[idx];
    idx = left - 1;
  }
}
}  // namespace

void unimodal(const double* y, double* x, int64_t n, int nonneg) {
  PrefixIso L = prefix_isotonic(y, n, nonneg != 0);
  std::vector<double> yr(n);
  for (int64_t i = 0; i < n; ++i) yr[i] = y[n - 1 - i];
  PrefixIso Rp = prefix_isotonic(yr.data(), n, nonneg != 0);
  // best peak index (1-based prefix length), first minimum wins
  int64_t best = 1;
  double best_err = L.err[1] + Rp.err[n];
  for (int64_t i = 2; i <= n; ++i) {
    double e = L.err[i] + Rp.err[n - i + 1];
    if (e < best_err) {
      best_err = e;
      best = i;
    }
  }
  std::vector<double> left(n, 0.0), right(n, 0.0);
  reconstruct(L, best, left.data());
  reconstruct(Rp, n - best, right.data());
  for (int64_t j = 0; j < n; ++j)
    x[j] = (j < best) ? left[j] : right[n - 1 - j];
}

// ---------------------------------------------------------------------------
// Euclidean projection of a vector onto {v >= 0, sum v = eta}.
// ---------------------------------------------------------------------------
void simplex_project(const double* y, double* x, int64_t n, double eta) {
  std::vector<double> u(y, y + n);
  std::sort(u.begin(), u.end(), std::greater<double>());
  double css = 0.0, tau = 0.0;
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i) {
    css += u[i];
    double t = (css - eta) / static_cast<double>(i + 1);
    if (u[i] - t > 0) {
      k = i + 1;
      tau = t;
    }
  }
  (void)k;
  for (int64_t i = 0; i < n; ++i) x[i] = std::max(y[i] - tau, 0.0);
}

// ---------------------------------------------------------------------------
// Box-constrained limited-memory BFGS (projected two-loop with active-set
// restriction + Armijo backtracking) — host-side counterpart of
// matlab_code_tpu/ops/lbfgsb.py; replaces the L-BFGS-B-C MEX dependency
// (cmtf_fun_AOADMM.m:1415) for host callers.
// fg: callback computing f and grad at x.
// ---------------------------------------------------------------------------
typedef double (*fg_fn)(const double* x, double* grad, int64_t n, void* ctx);

int64_t lbfgsb_minimize(fg_fn fg, void* ctx, double* x, int64_t n,
                        const double* lo, const double* hi, int m,
                        int maxiter, double pgtol, double factr) {
  const double eps = 2.220446049250313e-16;
  auto proj = [&](std::vector<double>& v) {
    for (int64_t i = 0; i < n; ++i) v[i] = std::min(std::max(v[i], lo[i]), hi[i]);
  };
  std::vector<double> xv(x, x + n);
  proj(xv);
  std::vector<double> g(n), gnew(n), d(n), xtry(n);
  double f = fg(xv.data(), g.data(), n, ctx);
  std::vector<std::vector<double>> S, Y;
  std::vector<double> rho;
  int64_t it = 0;
  for (; it < maxiter; ++it) {
    // projected-gradient stopping
    double pg = 0.0;
    for (int64_t i = 0; i < n; ++i) {
      double step = std::min(std::max(xv[i] - g[i], lo[i]), hi[i]) - xv[i];
      pg = std::max(pg, std::fabs(step));
    }
    if (pg <= pgtol) break;
    // active-set restricted two-loop
    std::vector<char> active(n);
    for (int64_t i = 0; i < n; ++i)
      active[i] = (xv[i] <= lo[i] + 1e-10 && g[i] > 0) ||
                  (xv[i] >= hi[i] - 1e-10 && g[i] < 0);
    std::vector<double> q(n);
    for (int64_t i = 0; i < n; ++i) q[i] = active[i] ? 0.0 : g[i];
    int np = static_cast<int>(S.size());
    std::vector<double> alpha(np);
    for (int j = np - 1; j >= 0; --j) {
      double a = 0;
      for (int64_t i = 0; i < n; ++i) a += S[j][i] * q[i];
      a *= rho[j];
      alpha[j] = a;
      for (int64_t i = 0; i < n; ++i) q[i] -= a * Y[j][i];
    }
    double gamma = 1.0;
    if (np > 0) {
      double sy = 0, yy = 0;
      for (int64_t i = 0; i < n; ++i) {
        sy += S[np - 1][i] * Y[np - 1][i];
        yy += Y[np - 1][i] * Y[np - 1][i];
      }
      if (yy > 0) gamma = sy / yy;
    }
    for (int64_t i = 0; i < n; ++i) q[i] *= gamma;
    for (int j = 0; j < np; ++j) {
      double b = 0;
      for (int64_t i = 0; i < n; ++i) b += Y[j][i] * q[i];
      b *= rho[j];
      for (int64_t i = 0; i < n; ++i) q[i] += (alpha[j] - b) * S[j][i];
    }
    double desc = 0;
    for (int64_t i = 0; i < n; ++i) {
      d[i] = active[i] ? 0.0 : -q[i];
      desc += g[i] * d[i];
    }
    if (desc >= 0)
      for (int64_t i = 0; i < n; ++i) d[i] = active[i] ? 0.0 : -g[i];
    // line search
    double dn = 0;
    for (int64_t i = 0; i < n; ++i) dn += d[i] * d[i];
    dn = std::sqrt(dn);
    double a = (np == 0) ? std::min(1.0, 1.0 / std::max(dn, 1e-30)) : 1.0;
    bool ok = false;
    double ftry = f;
    for (int ls = 0; ls < 60; ++ls) {
      for (int64_t i = 0; i < n; ++i) xtry[i] = xv[i] + a * d[i];
      proj(xtry);
      ftry = fg(xtry.data(), gnew.data(), n, ctx);
      double dec = 0;
      for (int64_t i = 0; i < n; ++i) dec += g[i] * (xtry[i] - xv[i]);
      if (ftry <= f + 1e-4 * dec || (ls == 59 && ftry < f)) {
        ok = true;
        break;
      }
      a *= 0.5;
    }
    if (!ok) break;
    // curvature pair
    std::vector<double> s(n), yv(n);
    double sy = 0, sn = 0, yn = 0;
    for (int64_t i = 0; i < n; ++i) {
      s[i] = xtry[i] - xv[i];
      yv[i] = gnew[i] - g[i];
      sy += s[i] * yv[i];
      sn += s[i] * s[i];
      yn += yv[i] * yv[i];
    }
    if (sy > eps * std::sqrt(sn) * std::sqrt(yn)) {
      S.push_back(std::move(s));
      Y.push_back(std::move(yv));
      rho.push_back(1.0 / sy);
      if (static_cast<int>(S.size()) > m) {
        S.erase(S.begin());
        Y.erase(Y.begin());
        rho.erase(rho.begin());
      }
    }
    double df = f - ftry;
    xv.swap(xtry);
    g.swap(gnew);
    f = ftry;
    if (df <= factr * eps * std::max({std::fabs(f), std::fabs(f + df), 1.0}))
      { ++it; break; }
  }
  std::memcpy(x, xv.data(), sizeof(double) * n);
  return it;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Sparse-MTTKRP Pallas plan builder (host preprocessing).
//
// Native equivalent of matlab_code_tpu/ops/sparse_pallas.build_plan_mode's
// sort/bucket/chop/pack phases (the Python/numpy path costs ~45 s at 1e7
// nonzeros; this is the production path, the Python builder stays as the
// golden reference).  Layout contract is identical: nonzeros lex-sorted by
// (j-tile, k-tile, i), chopped into <=`block`-nnz blocks that stay within
// one bucket and one TILE-row output window, local offsets packed into one
// int32 per nonzero (bits 0-6 j_loc, 7-13 k_loc, 14-20 i_rel).
// ---------------------------------------------------------------------------

namespace {
struct SparsePlanHandle {
  int64_t nb = 0;
  int64_t block = 0;
  std::vector<int32_t> packed;   // nb * block codes (0 = padding)
  std::vector<int32_t> btile, ctile, rowstart;
  std::vector<int64_t> slots;    // per SORTED nnz: flat index into packed
  std::vector<int64_t> order;    // per SORTED nnz: original nnz index
};
}  // namespace

extern "C" {

// Build the plan for one target mode.  indices: (nnz, ncols) row-major
// int32; mode/gm0/gm1: target and gathered column ids; dpad: padded output
// rows (multiple of 8, >= TILE); block: nnz per block; tile: output window
// and factor-tile rows (128).  Returns an opaque handle via *out and the
// number of blocks; call sparse_plan_export then sparse_plan_free.
int64_t sparse_plan_build(const int32_t* indices, int64_t nnz, int64_t ncols,
                          int32_t mode, int32_t gm0, int32_t gm1,
                          int64_t dk, int64_t dpad, int64_t block,
                          int64_t tile, void** out) {
  auto* h = new SparsePlanHandle();
  h->block = block;
  const int64_t ntk = (dk + tile - 1) / tile;
  // sort by composite key (bucket << 32 | i); buckets = jt * ntk + kt.
  // LSD radix (stable, so equal triples keep input order — matching
  // np.lexsort); constant key bytes are skipped, so e.g. a 2048^3 tensor
  // needs 5 of the 8 passes.
  std::vector<uint64_t> key(nnz), key2(nnz);
  std::vector<int64_t> ord(nnz), ord2(nnz);
  uint64_t maxkey = 0;
  for (int64_t t = 0; t < nnz; ++t) {
    const int32_t* row = indices + t * ncols;
    const uint64_t jt = static_cast<uint64_t>(row[gm0]) / tile;
    const uint64_t kt = static_cast<uint64_t>(row[gm1]) / tile;
    key[t] = ((jt * ntk + kt) << 32) | static_cast<uint32_t>(row[mode]);
    maxkey |= key[t];
    ord[t] = t;
  }
  for (int shift = 0; shift < 64; shift += 8) {
    if (!((maxkey >> shift) & 0xFF)) continue;
    int64_t hist[257] = {0};
    for (int64_t t = 0; t < nnz; ++t)
      ++hist[((key[t] >> shift) & 0xFF) + 1];
    for (int b = 0; b < 256; ++b) hist[b + 1] += hist[b];
    for (int64_t t = 0; t < nnz; ++t) {
      const int64_t pos = hist[(key[t] >> shift) & 0xFF]++;
      key2[pos] = key[t];
      ord2[pos] = ord[t];
    }
    key.swap(key2);
    ord.swap(ord2);
  }
  key2.clear();
  key2.shrink_to_fit();
  ord2.clear();
  ord2.shrink_to_fit();

  // chop into blocks (bucket-local, one output window each)
  std::vector<int64_t> lo_v, hi_v, rs_v;
  int64_t pos = 0;
  while (pos < nnz) {
    const uint64_t bucket = key[pos] >> 32;
    int64_t bend = pos;
    while (bend < nnz && (key[bend] >> 32) == bucket) ++bend;
    while (pos < bend) {
      int64_t cand = std::min(pos + block, bend);
      const int64_t i0 = static_cast<uint32_t>(key[pos]);
      int64_t rs = std::min((i0 / 8) * 8, dpad - tile);
      const int64_t ilast = static_cast<uint32_t>(key[cand - 1]);
      if (ilast - rs >= tile) {
        // first index with i >= rs + tile (binary search on the i bits)
        const uint64_t limit = (bucket << 32) |
                               static_cast<uint32_t>(rs + tile);
        cand = std::lower_bound(key.begin() + pos, key.begin() + cand,
                                limit) -
               key.begin();
      }
      lo_v.push_back(pos);
      hi_v.push_back(cand);
      rs_v.push_back(rs);
      pos = cand;
    }
  }

  const int64_t nb = static_cast<int64_t>(lo_v.size());
  h->nb = nb;
  h->packed.assign(nb * block, 0);
  h->btile.resize(nb);
  h->ctile.resize(nb);
  h->rowstart.resize(nb);
  h->slots.resize(nnz);
  h->order.resize(nnz);
  for (int64_t b = 0; b < nb; ++b) {
    const int64_t lo = lo_v[b], hi = hi_v[b], rs = rs_v[b];
    const int32_t* first = indices + ord[lo] * ncols;
    h->btile[b] = first[gm0] / tile;
    h->ctile[b] = first[gm1] / tile;
    h->rowstart[b] = static_cast<int32_t>(rs);
    for (int64_t t = lo; t < hi; ++t) {
      const int64_t src = ord[t];
      const int32_t* row = indices + src * ncols;
      const int32_t jl = row[gm0] % tile;
      const int32_t kl = row[gm1] % tile;
      const int32_t ir = static_cast<int32_t>(row[mode] - rs);
      const int64_t slot = b * block + (t - lo);
      h->packed[slot] = jl | (kl << 7) | (ir << 14);
      h->slots[t] = slot;
      h->order[t] = src;
    }
  }
  *out = h;
  return nb;
}

// Copy plan arrays into caller buffers: packed (nb*block) int32,
// btile/ctile/rowstart (nb) int32, slots/order (nnz) int64.
void sparse_plan_export(void* handle, int32_t* packed, int32_t* btile,
                        int32_t* ctile, int32_t* rowstart, int64_t* slots,
                        int64_t* order) {
  auto* h = static_cast<SparsePlanHandle*>(handle);
  std::memcpy(packed, h->packed.data(), h->packed.size() * sizeof(int32_t));
  std::memcpy(btile, h->btile.data(), h->nb * sizeof(int32_t));
  std::memcpy(ctile, h->ctile.data(), h->nb * sizeof(int32_t));
  std::memcpy(rowstart, h->rowstart.data(), h->nb * sizeof(int32_t));
  std::memcpy(slots, h->slots.data(), h->slots.size() * sizeof(int64_t));
  std::memcpy(order, h->order.data(), h->order.size() * sizeof(int64_t));
}

void sparse_plan_free(void* handle) {
  delete static_cast<SparsePlanHandle*>(handle);
}

}  // extern "C"
