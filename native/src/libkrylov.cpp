// libkrylov — native CPU solver core behind the krylov.h C ABI.
//
// The reference builds its native library by compiling Julia solvers with
// juliac (interfaces/src/LibKrylov.jl); here the native core is a C++
// re-implementation of the solver recurrences, templated over
// float/double/complex, with user matvecs crossing the C boundary via
// function pointers exactly like the reference's COperator design
// (interfaces/src/c_operator.jl).

#include "krylov.h"

#include <chrono>
#include <cmath>
#include <complex>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

namespace {

template <typename T>
struct RealOf {
  using type = T;
};
template <typename R>
struct RealOf<std::complex<R>> {
  using type = R;
};

template <typename T>
using real_t = typename RealOf<T>::type;

template <typename T>
real_t<T> re(const T &v) {
  if constexpr (std::is_same_v<T, real_t<T>>) return v;
  else return v.real();
}

template <typename T>
T conj_(const T &v) {
  if constexpr (std::is_same_v<T, real_t<T>>) return v;
  else return std::conj(v);
}

template <typename T>
T dot(const std::vector<T> &x, const std::vector<T> &y) {
  T s = T(0);
  for (size_t i = 0; i < x.size(); ++i) s += conj_(x[i]) * y[i];
  return s;
}

template <typename T>
real_t<T> dotr(const std::vector<T> &x, const std::vector<T> &y) {
  return re(dot(x, y));
}

template <typename T>
real_t<T> nrm2(const std::vector<T> &x) {
  return std::sqrt(dotr(x, x));
}

template <typename T>
void axpy(T a, const std::vector<T> &x, std::vector<T> &y) {
  for (size_t i = 0; i < x.size(); ++i) y[i] += a * x[i];
}

template <typename T>
void scal(T a, std::vector<T> &x) {
  for (auto &v : x) v *= a;
}

// Givens as in reference src/krylov_utils.jl:21-51 (real path suffices:
// the C core runs the Hermitian/real-coefficient recurrences with real
// rotation scalars; complex dtypes use the magnitude form).
template <typename R>
void sym_givens(R a, R b, R &c, R &s, R &rho) {
  if (b == R(0)) {
    c = (a == R(0)) ? R(1) : R((a > 0) - (a < 0));
    s = R(0);
    rho = std::abs(a);
  } else if (a == R(0)) {
    c = R(0);
    s = R((b > 0) - (b < 0));
    rho = std::abs(b);
  } else if (std::abs(b) > std::abs(a)) {
    R t = a / b;
    s = R((b > 0) - (b < 0)) / std::sqrt(R(1) + t * t);
    c = s * t;
    rho = b / s;
  } else {
    R t = b / a;
    c = R((a > 0) - (a < 0)) / std::sqrt(R(1) + t * t);
    s = c * t;
    rho = a / c;
  }
}

// complex-capable Givens with real cosine annihilating [a; b] via
// [c s; conj(s) -c]: c = |a|/h, s = a*conj(b)/(h|a|), rho = a*h/|a|.
template <typename T>
void cgivens(T a, T b, real_t<T> &c, T &s, T &rho) {
  using R = real_t<T>;
  R aa = std::abs(a), ab = std::abs(b);
  R h = std::sqrt(aa * aa + ab * ab);
  if (h == R(0)) { c = R(1); s = T(0); rho = T(0); return; }
  if (aa == R(0)) { c = R(0); s = T(1); rho = b; return; }
  c = aa / h;
  s = a * conj_(b) / T(h * aa);
  rho = a * T(h / aa);
}

struct Options {
  double atol, rtol, lambda, timemax, radius;
  int64_t itmax, verbose, restart, reorth, linesearch;
  double tau, nu;
};

template <typename T>
Options decode(const krylov_options *o) {
  using R = real_t<T>;
  Options d;
  double se = std::sqrt(std::numeric_limits<R>::epsilon());
  d.atol = (o && !std::isnan(o->atol)) ? o->atol : se;
  d.rtol = (o && !std::isnan(o->rtol)) ? o->rtol : se;
  d.lambda = (o && !std::isnan(o->lambda)) ? o->lambda : 0.0;
  d.timemax = (o && !std::isnan(o->timemax))
                  ? o->timemax
                  : std::numeric_limits<double>::infinity();
  d.radius = (o && !std::isnan(o->radius)) ? o->radius : 0.0;
  d.tau = (o && !std::isnan(o->tau)) ? o->tau : 1.0;
  d.nu = (o && !std::isnan(o->nu)) ? o->nu : -1.0;
  d.itmax = o ? o->itmax : 0;
  d.verbose = o ? o->verbose : 0;
  d.restart = o ? o->restart : 0;
  d.reorth = o ? o->reorthogonalization : 0;
  d.linesearch = o ? o->linesearch : 0;
  return d;
}

struct WorkspaceBase {
  krylov_solver solver;
  krylov_dtype dtype;
  int64_t m, n;
  int64_t memory, window;
  int64_t niter = 0;
  bool solved = false;
  double elapsed = 0.0;
  std::string status = "unknown";
  bool has_warm = false, has_warm2 = false;
  std::vector<unsigned char> x0raw, y0raw;
  std::vector<unsigned char> xraw, yraw;
};

template <typename T>
struct Op {
  krylov_matvec f;
  const void *ud;
  void apply(std::vector<T> &x, std::vector<T> &y) const {
    f(ud, x.data(), y.data());
  }
};

template <typename T>
void applyP(const Op<T> *P, const std::vector<T> &x, std::vector<T> &y) {
  if (!P || !P->f) {
    y = x;
  } else {
    std::vector<T> tmp = x;
    P->f(P->ud, tmp.data(), y.data());
  }
}

// ---------------------------------------------------------------------------
// solver kernels (templated); each returns via ws.{x,niter,solved,status}
// ---------------------------------------------------------------------------

template <typename T>
struct Ctx {
  const Op<T> *A, *At, *M, *N;
  Options opt;
  int64_t m, n;
};

template <typename T>
void matvec(const Ctx<T> &c, std::vector<T> &x, std::vector<T> &y) {
  c.A->apply(x, y);
}

template <typename T>
void rmatvec(const Ctx<T> &c, std::vector<T> &x, std::vector<T> &y) {
  c.At->apply(x, y);
}

template <typename T>
void solve_cg(const Ctx<T> &c, const std::vector<T> &b, std::vector<T> &x,
              int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : 2 * n;
  x.assign(n, T(0));
  std::vector<T> r = b, z(n), p(n), Ap(n);
  applyP(c.M, r, z);
  p = z;
  R gamma = dotr(r, z);
  R rnorm = std::sqrt(std::max<R>(gamma, 0));
  R eps = R(c.opt.atol + c.opt.rtol * rnorm);
  if (gamma == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  solved = rnorm <= eps;
  iter = 0;
  while (!solved && iter < itmax) {
    std::vector<T> pc = p;
    matvec(c, pc, Ap);
    R pAp = dotr(p, Ap);
    if (pAp <= 0) { status = "nonpositive curvature"; solved = true; break; }
    R alpha = gamma / pAp;
    axpy(T(alpha), p, x);
    axpy(T(-alpha), Ap, r);
    applyP(c.M, r, z);
    R gn = dotr(r, z);
    rnorm = std::sqrt(std::max<R>(gn, 0));
    R beta = gn / gamma;
    gamma = gn;
    for (int64_t i = 0; i < n; ++i) p[i] = z[i] + T(beta) * p[i];
    ++iter;
    solved = rnorm <= eps;
  }
  if (solved && status == "unknown")
    status = "solution good enough given atol and rtol";
  else if (!solved)
    status = "maximum number of iterations exceeded";
}

template <typename T>
void solve_cr(const Ctx<T> &c, const std::vector<T> &b, std::vector<T> &x,
              int64_t &iter, bool &solved, std::string &status, bool car) {
  using R = real_t<T>;
  int64_t n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : 2 * n;
  x.assign(n, T(0));
  std::vector<T> r = b, p = b, Ar(n), Ap(n), tmp(n);
  matvec(c, r, Ar);
  Ap = Ar;
  R rho = dotr(r, Ar);
  R rnorm = nrm2(r);
  R eps = R(c.opt.atol + c.opt.rtol * rnorm);
  if (rnorm == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  solved = rnorm <= eps;
  iter = 0;
  while (!solved && iter < itmax) {
    R denom = dotr(Ap, Ap);
    if (denom == R(0)) break;
    R alpha = rho / denom;
    axpy(T(alpha), p, x);
    axpy(T(-alpha), Ap, r);
    matvec(c, r, Ar);
    R rho_n = dotr(r, Ar);
    R beta = rho_n / rho;
    rho = rho_n;
    for (int64_t i = 0; i < n; ++i) p[i] = r[i] + T(beta) * p[i];
    for (int64_t i = 0; i < n; ++i) Ap[i] = Ar[i] + T(beta) * Ap[i];
    rnorm = nrm2(r);
    ++iter;
    solved = rnorm <= eps;
  }
  status = solved ? "solution good enough given atol and rtol"
                  : "maximum number of iterations exceeded";
}

template <typename T>
void solve_minres(const Ctx<T> &c, const std::vector<T> &b, std::vector<T> &x,
                  int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : 2 * n;
  R lam = R(c.opt.lambda);
  x.assign(n, T(0));
  std::vector<T> v = b, v_prev(n, T(0)), w(n, T(0)), w_prev(n, T(0)), q(n);
  R beta1 = nrm2(v);
  if (beta1 == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  scal(T(R(1) / beta1), v);
  R beta = R(0), c_rot = R(-1), s_rot = R(0), dbar = R(0), ebar = R(0),
    phibar = beta1;
  R eps = R(c.opt.atol + c.opt.rtol * beta1);
  iter = 0;
  solved = beta1 <= eps;
  R eps_prev = R(0);
  while (!solved && iter < itmax) {
    ++iter;
    std::vector<T> vc = v;
    matvec(c, vc, q);
    if (lam != R(0)) axpy(T(lam), v, q);
    if (iter >= 2) axpy(T(-beta), v_prev, q);
    R alpha = dotr(v, q);
    axpy(T(-alpha), v, q);
    v_prev = v;
    R beta_n = nrm2(q);
    // rotations
    R delta = c_rot * dbar + s_rot * alpha;
    R gbar = s_rot * dbar - c_rot * alpha;
    R eps_new = s_rot * beta_n;
    dbar = -c_rot * beta_n;
    R gamma, cs, sn;
    sym_givens(gbar, beta_n, cs, sn, gamma);
    gamma = std::max(gamma, std::numeric_limits<R>::epsilon());
    std::vector<T> w_new(n);
    for (int64_t i = 0; i < n; ++i)
      w_new[i] = (v[i] - T(delta) * w[i] - T(eps_prev) * w_prev[i]) / T(gamma);
    R phi = cs * phibar;
    phibar = sn * phibar;
    axpy(T(phi), w_new, x);
    w_prev = w;
    w = w_new;
    eps_prev = eps_new;
    c_rot = cs;
    s_rot = sn;
    if (beta_n != R(0)) scal(T(R(1) / beta_n), q);
    v = q;
    beta = beta_n;
    solved = phibar <= eps;
  }
  status = solved ? "found approximate minimum least-squares solution"
                  : "maximum number of iterations exceeded";
}

// flexible=true is FGMRES (reference src/fgmres.jl): the per-iteration
// right-preconditioned vectors Z_k = N*V_k are stored and recombined, so
// N may change between iterations.
template <typename T>
void solve_gmres(const Ctx<T> &c, const std::vector<T> &b, std::vector<T> &x,
                 int64_t mem, int64_t &iter, bool &solved,
                 std::string &status, bool flexible = false) {
  using R = real_t<T>;
  int64_t n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : 2 * n;
  if (mem <= 0) mem = 20;
  x.assign(n, T(0));
  std::vector<std::vector<T>> V;
  std::vector<T> H((mem + 1) * mem, T(0)), g(mem + 1, T(0));
  std::vector<R> cs(mem), sn_r(mem);
  std::vector<T> r(n), w(n), z(n);
  iter = 0;
  solved = false;
  R beta0 = -1;
  while (iter < itmax && !solved) {
    // (re)start
    r = b;
    std::vector<T> Ax(n);
    std::vector<T> xc = x;
    matvec(c, xc, Ax);
    for (int64_t i = 0; i < n; ++i) r[i] -= Ax[i];
    applyP(c.M, r, z);
    R beta = nrm2(z);
    if (beta0 < 0) beta0 = beta;
    R eps = R(c.opt.atol + c.opt.rtol * beta0);
    if (beta <= eps) { solved = true; break; }
    V.assign(1, z);
    scal(T(R(1) / beta), V[0]);
    std::vector<std::vector<T>> Z;
    std::fill(g.begin(), g.end(), T(0));
    g[0] = T(beta);
    int64_t k = 0;
    R rnorm = beta;
    for (; k < mem && iter < itmax; ++k) {
      std::vector<T> p(n);
      applyP(c.N, V[k], p);
      if (flexible) Z.push_back(p);
      matvec(c, p, w);
      applyP(c.M, w, z);
      for (int64_t i = 0; i <= k; ++i) {
        T hik = dot(V[i], z);
        H[i * mem + k] = hik;
        axpy(T(-hik), V[i], z);
      }
      R hk1 = nrm2(z);
      // apply previous rotations
      for (int64_t i = 0; i < k; ++i) {
        T t = T(cs[i]) * H[i * mem + k] + T(sn_r[i]) * H[(i + 1) * mem + k];
        H[(i + 1) * mem + k] =
            T(sn_r[i]) * H[i * mem + k] - T(cs[i]) * H[(i + 1) * mem + k];
        H[i * mem + k] = t;
      }
      R hv = re(H[k * mem + k]);
      R rr, cc, ss;
      sym_givens(hv, hk1, cc, ss, rr);
      cs[k] = cc;
      sn_r[k] = ss;
      H[k * mem + k] = T(rr);
      T gk = g[k];
      g[k] = T(cc) * gk;
      g[k + 1] = T(ss) * gk;
      rnorm = std::abs(g[k + 1]);
      ++iter;
      if (rnorm <= eps || hk1 <= std::pow(std::numeric_limits<R>::epsilon(), 0.75)) {
        ++k;
        break;
      }
      V.push_back(z);
      scal(T(R(1) / hk1), V[k + 1]);
    }
    // back substitution
    std::vector<T> y(k, T(0));
    for (int64_t i = k - 1; i >= 0; --i) {
      T acc = g[i];
      for (int64_t j = i + 1; j < k; ++j) acc -= H[i * mem + j] * y[j];
      y[i] = acc / H[i * mem + i];
    }
    std::vector<T> xr(n, T(0));
    if (flexible) {
      for (int64_t i = 0; i < k; ++i) axpy(y[i], Z[i], xr);
      for (int64_t i = 0; i < n; ++i) x[i] += xr[i];
    } else {
      for (int64_t i = 0; i < k; ++i) axpy(y[i], V[i], xr);
      std::vector<T> xr2(n);
      applyP(c.N, xr, xr2);
      for (int64_t i = 0; i < n; ++i) x[i] += xr2[i];
    }
    if (rnorm <= R(c.opt.atol + c.opt.rtol * beta0)) solved = true;
  }
  status = solved ? "solution good enough given atol and rtol"
                  : "maximum number of iterations exceeded";
}

// FOM: Arnoldi with a Galerkin (square Hessenberg) solve Hy = beta*e1
// instead of GMRES's least-squares QR (reference src/fom.jl).  The
// per-iteration residual estimate is h_{k+1,k} |e_k' y|.
template <typename T>
void solve_fom(const Ctx<T> &c, const std::vector<T> &b, std::vector<T> &x,
               int64_t mem, int64_t &iter, bool &solved,
               std::string &status) {
  using R = real_t<T>;
  int64_t n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : 2 * n;
  if (mem <= 0) mem = 20;
  x.assign(n, T(0));
  std::vector<std::vector<T>> V;
  std::vector<T> H((mem + 1) * mem, T(0));
  std::vector<T> w(n), z(n);
  iter = 0;
  solved = false;
  R beta0 = -1;

  auto hess_solve = [&](int64_t k, std::vector<T> &y, R beta) {
    // dense copy + partial-pivot LU of the k-by-k leading Hessenberg
    std::vector<T> Hk(k * k);
    for (int64_t i = 0; i < k; ++i)
      for (int64_t j = 0; j < k; ++j)
        Hk[i * k + j] = (i <= j + 1) ? H[i * mem + j] : T(0);
    y.assign(k, T(0));
    if (k > 0) y[0] = T(beta);
    for (int64_t col = 0; col < k; ++col) {
      int64_t piv = col;
      for (int64_t i = col + 1; i < std::min(col + 2, k); ++i)
        if (std::abs(Hk[i * k + col]) > std::abs(Hk[piv * k + col])) piv = i;
      if (std::abs(Hk[piv * k + col]) == R(0)) return false;
      if (piv != col) {
        for (int64_t j = 0; j < k; ++j)
          std::swap(Hk[col * k + j], Hk[piv * k + j]);
        std::swap(y[col], y[piv]);
      }
      for (int64_t i = col + 1; i < std::min(col + 2, k); ++i) {
        T f = Hk[i * k + col] / Hk[col * k + col];
        for (int64_t j = col; j < k; ++j) Hk[i * k + j] -= f * Hk[col * k + j];
        y[i] -= f * y[col];
      }
    }
    for (int64_t i = k - 1; i >= 0; --i) {
      T acc = y[i];
      for (int64_t j = i + 1; j < k; ++j) acc -= Hk[i * k + j] * y[j];
      y[i] = acc / Hk[i * k + i];
    }
    return true;
  };

  while (iter < itmax && !solved) {
    std::vector<T> r = b, Ax(n), xc = x;
    matvec(c, xc, Ax);
    for (int64_t i = 0; i < n; ++i) r[i] -= Ax[i];
    applyP(c.M, r, z);
    R beta = nrm2(z);
    if (beta0 < 0) beta0 = beta;
    R eps = R(c.opt.atol + c.opt.rtol * beta0);
    if (beta <= eps) { solved = true; break; }
    V.assign(1, z);
    scal(T(R(1) / beta), V[0]);
    std::fill(H.begin(), H.end(), T(0));
    int64_t k = 0;
    std::vector<T> y;
    for (; k < mem && iter < itmax; ++k) {
      std::vector<T> p(n);
      applyP(c.N, V[k], p);
      matvec(c, p, w);
      applyP(c.M, w, z);
      for (int64_t i = 0; i <= k; ++i) {
        T hik = dot(V[i], z);
        H[i * mem + k] = hik;
        axpy(T(-hik), V[i], z);
      }
      R hk1 = nrm2(z);
      H[(k + 1) * mem + k] = T(hk1);
      ++iter;
      bool ok = hess_solve(k + 1, y, beta);
      R rnorm = ok ? hk1 * std::abs(y[k])
                   : std::numeric_limits<R>::infinity();
      if ((ok && rnorm <= eps) ||
          hk1 <= std::pow(std::numeric_limits<R>::epsilon(), 0.75)) {
        ++k;
        break;
      }
      V.push_back(z);
      scal(T(R(1) / hk1), V[k + 1]);
    }
    if (!hess_solve(k, y, beta)) { status = "singular Hessenberg system"; break; }
    std::vector<T> xr(n, T(0));
    for (int64_t i = 0; i < k; ++i) axpy(y[i], V[i], xr);
    std::vector<T> xr2(n);
    applyP(c.N, xr, xr2);
    for (int64_t i = 0; i < n; ++i) x[i] += xr2[i];
    // outer check on the true residual
    std::vector<T> Ax2(n), xc2 = x;
    matvec(c, xc2, Ax2);
    R tr = R(0), tb = R(0);
    for (int64_t i = 0; i < n; ++i) {
      T d = b[i] - Ax2[i];
      tr += re(conj_(d) * d);
    }
    (void)tb;
    if (std::sqrt(tr) <= eps) solved = true;
  }
  if (solved) status = "solution good enough given atol and rtol";
  else if (status == "unknown") status = "maximum number of iterations exceeded";
}

// USYMLQ: Saunders-Simon-Yip tridiagonalization + LQ with transfer to
// the USYMCG point (reference src/usymlq.jl); x lives in the U basis.
template <typename T>
void solve_usymlq(const Ctx<T> &c, const std::vector<T> &b,
                  const std::vector<T> *cvec, std::vector<T> &x,
                  int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t m = c.m, n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : m + n;
  x.assign(n, T(0));
  std::vector<T> cseed;
  if (cvec) cseed = *cvec;
  else if (m == n) cseed = b;
  else cseed.assign(n, T(1));
  std::vector<T> v = b, u = cseed, v_old(m, T(0)), u_old(n, T(0)), q(m),
                 p(n), dbar_vec(n, T(0));
  R beta1 = nrm2(v);
  if (beta1 == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  scal(T(R(1) / beta1), v);
  R gamma = nrm2(u);
  if (gamma != R(0)) scal(T(R(1) / gamma), u);
  R beta = beta1;
  R c_km1 = R(-1);
  T s_km1 = T(0);
  T dbar = T(0), zeta_km1 = T(0), zeta_km2 = T(0), eta_km1 = T(0);
  T zetabar = T(0);
  R eps = R(c.opt.atol + c.opt.rtol * beta1);
  R rnorm = beta1;
  bool cg_pending = false;
  iter = 0;
  solved = beta1 <= eps;
  while (!solved && iter < itmax) {
    ++iter;
    std::vector<T> uc = u, vc = v;
    matvec(c, uc, q);
    rmatvec(c, vc, p);
    if (iter >= 2) {
      axpy(T(-gamma), v_old, q);
      axpy(T(-beta), u_old, p);
    }
    T alpha = dot(v, q);
    axpy(-alpha, v, q);
    axpy(-conj_(alpha), u, p);
    R beta_n = nrm2(q);
    R gamma_n = nrm2(p);
    // LQ rotation on (dbar, gamma); no rotation at iter 1.
    R ck;
    T sk, d_km1;
    if (iter == 1) { ck = R(-1); sk = T(0); d_km1 = T(0); }
    else cgivens(dbar, T(gamma), ck, sk, d_km1);
    T eps_km2 = s_km1 * T(beta);
    T lam_km1 = (iter == 2) ? T(ck) * T(beta) + sk * alpha
                            : -T(c_km1) * T(ck) * T(beta) + sk * alpha;
    T dbar_k = (iter == 1) ? alpha
               : (iter == 2) ? conj_(sk) * T(beta) - T(ck) * alpha
                             : -T(c_km1) * conj_(sk) * T(beta)
                               - T(ck) * alpha;
    T dsafe = (d_km1 == T(0)) ? T(1) : d_km1;
    T zeta_km1_new = (iter >= 2) ? eta_km1 / dsafe : zeta_km1;
    T zeta_km2_new = (iter >= 3) ? zeta_km1 : zeta_km2;
    T eta = (iter == 1) ? T(beta1)
            : (iter == 2) ? -lam_km1 * zeta_km1_new
                          : -eps_km2 * zeta_km2_new - lam_km1 * zeta_km1_new;
    if (iter >= 2)
      for (int64_t i = 0; i < n; ++i)
        x[i] += zeta_km1_new * T(ck) * dbar_vec[i] + zeta_km1_new * sk * u[i];
    if (iter == 1) dbar_vec = u;
    else
      for (int64_t i = 0; i < n; ++i)
        dbar_vec[i] = conj_(sk) * dbar_vec[i] - T(ck) * u[i];
    T mu = T(beta) * (s_km1 * zeta_km2_new
                      - T(c_km1) * T(ck) * zeta_km1_new)
         + alpha * sk * zeta_km1_new;
    T om = T(beta_n) * sk * zeta_km1_new;
    if (iter >= 2)
      rnorm = std::sqrt(std::abs(mu) * std::abs(mu)
                        + std::abs(om) * std::abs(om));
    bool dbar_ok = std::abs(dbar_k) > std::numeric_limits<R>::epsilon();
    if (dbar_ok) zetabar = eta / dbar_k;
    R rnorm_cg = std::abs(T(beta_n) * (sk * zeta_km1_new - T(ck) * zetabar));
    bool solved_lq = rnorm <= eps;
    bool solved_cg = dbar_ok && rnorm_cg <= eps;
    cg_pending = solved_cg && !solved_lq;
    solved = solved_lq || solved_cg;
    // advance
    v_old = v; u_old = u;
    if (beta_n != R(0)) { v = q; scal(T(R(1) / beta_n), v); }
    else v.assign(m, T(0));
    if (gamma_n != R(0)) { u = p; scal(T(R(1) / gamma_n), u); }
    else u.assign(n, T(0));
    c_km1 = ck; s_km1 = sk; dbar = dbar_k;
    zeta_km1 = zeta_km1_new; zeta_km2 = zeta_km2_new; eta_km1 = eta;
    beta = beta_n; gamma = gamma_n;
    if (!solved && beta_n == R(0) && gamma_n == R(0)) break;
  }
  if (cg_pending) axpy(zetabar, dbar_vec, x);
  if (solved) status = "solution good enough given atol and rtol";
  else if (status == "unknown") status = "maximum number of iterations exceeded";
}

// USYMQR: Saunders-Simon-Yip tridiagonalization + QR — the LS sweep of
// USYMLQR (reference src/usymqr.jl); minimizes ‖b - Ax‖ with x in the
// U (n-side) basis; ‖Aᴴr‖-based inconsistency detection.
template <typename T>
void solve_usymqr(const Ctx<T> &c, const std::vector<T> &b,
                  const std::vector<T> *cvec, std::vector<T> &x,
                  int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t m = c.m, n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : m + n;
  x.assign(n, T(0));
  std::vector<T> cseed;
  if (cvec) cseed = *cvec;
  else if (m == n) cseed = b;
  else cseed.assign(n, T(1));
  std::vector<T> v = b, u = cseed, v_old(m, T(0)), u_old(n, T(0)), q(m),
                 p(n);
  R beta = nrm2(v);
  if (beta == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  scal(T(R(1) / beta), v);
  R gamma = nrm2(u);
  if (gamma != R(0)) scal(T(R(1) / gamma), u);
  std::vector<T> w_km1(n, T(0)), w_km2(n, T(0));
  R c_km1 = R(-1), c_km2 = R(-1);
  T s_km1 = T(0), s_km2 = T(0);
  T phibar = T(beta);
  R eps = R(c.opt.atol + c.opt.rtol * beta);
  R kappa = R(0);
  iter = 0;
  solved = beta <= eps;
  bool inconsistent = false;
  while (!solved && !inconsistent && iter < itmax) {
    ++iter;
    // SSY step
    std::vector<T> uc = u, vc = v;
    matvec(c, uc, q);
    rmatvec(c, vc, p);
    if (iter >= 2) {
      axpy(T(-gamma), v_old, q);
      axpy(T(-beta), u_old, p);
    }
    T alpha = dot(v, q);
    axpy(-alpha, v, q);
    axpy(-conj_(alpha), u, p);
    v_old = v; u_old = u;
    R beta_n = nrm2(q);
    R gamma_n = nrm2(p);
    // rotation cascade (two previous + new), gamma/beta real
    T eps_km2 = s_km2 * T(gamma);
    T lambdabar = -T(c_km2) * T(gamma);
    T lam_km1 = T(c_km1) * lambdabar + s_km1 * alpha;
    T deltabar = conj_(s_km1) * lambdabar - T(c_km1) * alpha;
    R cs;
    T sn, delta;
    cgivens(deltabar, T(beta_n), cs, sn, delta);
    T dsafe = (delta == T(0)) ? T(1) : delta;
    std::vector<T> w_new(n);
    for (int64_t i = 0; i < n; ++i)
      w_new[i] = (u[i] - lam_km1 * w_km1[i] - eps_km2 * w_km2[i]) / dsafe;
    T phi = T(cs) * phibar;
    T phibar_n = conj_(sn) * phibar;
    axpy(phi, w_new, x);
    R rnorm = std::abs(phibar_n);
    R AHrNorm = std::abs(phibar) * std::sqrt(
        std::abs(deltabar) * std::abs(deltabar)
        + (c_km1 * gamma_n) * (c_km1 * gamma_n));
    if (iter == 1) kappa = R(c.opt.atol + c.opt.rtol * AHrNorm);
    phibar = phibar_n;
    solved = rnorm <= eps;
    inconsistent = !solved && AHrNorm <= kappa;
    // advance
    if (beta_n != R(0)) { v = q; scal(T(R(1) / beta_n), v); }
    else v.assign(m, T(0));
    if (gamma_n != R(0)) { u = p; scal(T(R(1) / gamma_n), u); }
    else u.assign(n, T(0));
    w_km2 = w_km1; w_km1 = w_new;
    c_km2 = c_km1; s_km2 = s_km1;
    c_km1 = cs; s_km1 = sn;
    beta = beta_n; gamma = gamma_n;
    if (beta_n == R(0) && gamma_n == R(0)) break;
  }
  if (solved) status = "solution good enough given atol and rtol";
  else if (inconsistent) {
    solved = true;
    status = "found approximate minimum least-squares solution";
  } else if (status == "unknown")
    status = "maximum number of iterations exceeded";
}

// SYMMLQ: LQ factorization of the Lanczos tridiagonal (Paige-Saunders;
// reference src/symmlq.jl).  Returns the CG point when its residual
// estimate beats the LQ point's, like the reference's transfer_to_cg.
template <typename T>
void solve_symmlq(const Ctx<T> &c, const std::vector<T> &b, std::vector<T> &x,
                  int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : 2 * n;
  R lam = R(c.opt.lambda);
  x.assign(n, T(0));
  std::vector<T> v = b, q(n), vn(n);
  R beta1 = nrm2(v);
  if (beta1 == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  scal(T(R(1) / beta1), v);
  // first Lanczos step
  std::vector<T> vc = v;
  matvec(c, vc, q);
  if (lam != R(0)) axpy(T(lam), v, q);
  R alpha = dotr(v, q);
  axpy(T(-alpha), v, q);
  R beta = nrm2(q);
  vn = q;
  if (beta != R(0)) scal(T(R(1) / beta), vn);
  R gbar = alpha, dbar = beta;
  R rhs1 = beta1, rhs2 = R(0), snprod = R(1);
  std::vector<T> wbar = v;
  R eps = R(c.opt.atol + c.opt.rtol * beta1);
  R lqnorm = beta1, cgnorm = beta1;
  iter = 0;
  solved = beta1 <= eps;
  while (!solved && iter < itmax) {
    ++iter;
    // Lanczos step k+1
    std::vector<T> vnc = vn;
    matvec(c, vnc, q);
    if (lam != R(0)) axpy(T(lam), vn, q);
    axpy(T(-beta), v, q);
    R alpha_n = dotr(vn, q);
    axpy(T(-alpha_n), vn, q);
    R beta_n = nrm2(q);
    // rotation eliminating the subdiagonal beta from [gbar; beta]
    R gamma, cs, sn;
    sym_givens(gbar, beta, cs, sn, gamma);
    gamma = std::max(gamma, std::numeric_limits<R>::epsilon());
    R delta = cs * dbar + sn * alpha_n;
    gbar = sn * dbar - cs * alpha_n;
    R eps_k = sn * beta_n;
    dbar = -cs * beta_n;
    R zeta = rhs1 / gamma;
    // LQ point update: x += zeta * (cs*wbar + sn*v_{k+1})
    for (int64_t i = 0; i < n; ++i) {
      T w = T(cs) * wbar[i] + T(sn) * vn[i];
      wbar[i] = T(sn) * wbar[i] - T(cs) * vn[i];
      x[i] += T(zeta) * w;
    }
    rhs1 = rhs2 - delta * zeta;
    rhs2 = -eps_k * zeta;
    snprod *= sn;
    lqnorm = std::sqrt(rhs1 * rhs1 + rhs2 * rhs2);
    cgnorm = (gbar != R(0)) ? snprod * beta1 * std::abs(cs) : lqnorm;
    // advance Lanczos vectors
    v = vn;
    if (beta_n != R(0)) { vn = q; scal(T(R(1) / beta_n), vn); }
    else vn.assign(n, T(0));
    beta = beta_n;
    solved = std::min(lqnorm, cgnorm) <= eps || beta_n == R(0);
  }
  // transfer to the CG point when it is at least as good (reference
  // transfer_to_cg default).
  if (gbar != R(0) && cgnorm <= lqnorm) {
    R zbar = rhs1 / gbar;
    axpy(T(zbar), wbar, x);
  }
  status = solved ? "solution good enough given atol and rtol"
                  : "maximum number of iterations exceeded";
}

// QMR (real-coefficient path): QR of the bi-Lanczos tridiagonal with
// the MINRES rotation pattern but nonsymmetric (gamma != beta) couplings
// (reference src/qmr.jl).  |phibar| is the quasi-residual estimate; the
// loop additionally verifies the true residual before declaring success.
template <typename T>
void solve_qmr(const Ctx<T> &c, const std::vector<T> &b,
               const std::vector<T> *cshadow, std::vector<T> &x,
               int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : 2 * n;
  x.assign(n, T(0));
  std::vector<T> c0 = cshadow ? *cshadow : b;
  T cHb = dot(c0, b);
  R bnorm = nrm2(b);
  if (bnorm == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  if (std::abs(cHb) == R(0)) { status = "Breakdown bᴴc = 0"; solved = false; iter = 0; return; }
  R beta = std::sqrt(std::abs(cHb));
  T gammaT = cHb / T(beta);
  std::vector<T> v = b, u = c0, v_old(n, T(0)), u_old(n, T(0)), q(n), p(n);
  scal(T(R(1) / beta), v);
  { T g = conj_(gammaT); for (auto &e : u) e = e / g; }
  std::vector<T> w_km1(n, T(0)), w_km2(n, T(0));
  R c_km1 = R(-1), c_km2 = R(-1);
  T s_km1 = T(0), s_km2 = T(0);
  T gamma = gammaT;
  T phibar = T(beta);
  R eps = R(c.opt.atol + c.opt.rtol * bnorm);
  iter = 0;
  solved = bnorm <= eps;
  while (!solved && iter < itmax) {
    ++iter;
    // bi-Lanczos step
    std::vector<T> vc = v, uc = u;
    matvec(c, vc, q);
    rmatvec(c, uc, p);
    if (iter >= 2) {
      axpy(-gamma, v_old, q);
      axpy(-conj_(T(beta)), u_old, p);
    }
    T alpha = dot(u, q);
    axpy(-alpha, v, q);
    axpy(-conj_(alpha), u, p);
    T pHq = dot(p, q);
    R beta_n = std::sqrt(std::abs(pHq));
    T gamma_n = (beta_n != R(0)) ? pHq / T(beta_n) : T(0);
    // QR rotations (two previous + one new)
    T eps_km2 = s_km2 * gamma;
    T lambdabar = -T(c_km2) * gamma;
    T lam_km1 = T(c_km1) * lambdabar + s_km1 * alpha;
    T deltabar = conj_(s_km1) * lambdabar - T(c_km1) * alpha;
    // eliminate beta_{k+1}: complex-capable Givens with real cosine
    R adb = std::abs(deltabar);
    R rho = std::sqrt(adb * adb + beta_n * beta_n);
    R cs; T sn, delta;
    if (rho == R(0)) { cs = R(1); sn = T(0); delta = T(0); }
    else if (adb == R(0)) { cs = R(0); sn = T(1); delta = T(beta_n); }
    else {
      cs = adb / rho;
      T phase = deltabar / T(adb);
      /* [c s; conj(s) -c][deltabar; beta] = [delta; 0] with c real
         requires s = phase*conj(beta)/rho (beta real here). */
      sn = phase * T(beta_n / rho);
      delta = phase * T(rho);
    }
    // direction w_k = (v_k - lam_km1 w_{k-1} - eps_km2 w_{k-2}) / delta
    std::vector<T> w_new(n);
    T dsafe = (delta == T(0)) ? T(1) : delta;
    for (int64_t i = 0; i < n; ++i)
      w_new[i] = (v[i] - lam_km1 * w_km1[i] - eps_km2 * w_km2[i]) / dsafe;
    T phi = T(cs) * phibar;
    axpy(phi, w_new, x);
    phibar = conj_(sn) * phibar;
    // advance
    v_old = v; u_old = u;
    if (beta_n != R(0)) { v = q; scal(T(R(1) / beta_n), v); }
    else v.assign(n, T(0));
    if (std::abs(gamma_n) != R(0)) {
      u = p;
      T g = conj_(gamma_n);
      for (auto &e : u) e = e / g;
    } else u.assign(n, T(0));
    w_km2 = w_km1; w_km1 = w_new;
    c_km2 = c_km1; s_km2 = s_km1;
    c_km1 = cs; s_km1 = sn;
    gamma = gamma_n;
    beta = beta_n;
    R aphibar = std::abs(phibar);
    if (aphibar * std::sqrt(R(iter + 1)) <= eps || aphibar <= eps) {
      // verify with the true residual (quasi-residual is an estimate)
      std::vector<T> Ax(n), xc = x;
      matvec(c, xc, Ax);
      for (int64_t i = 0; i < n; ++i) Ax[i] = b[i] - Ax[i];
      solved = nrm2(Ax) <= eps * R(10);
      if (solved) break;
    }
    if (beta_n == R(0)) break;
  }
  if (solved)
    status = "solution good enough given atol and rtol";
  else if (status == "unknown")
    status = "maximum number of iterations exceeded";
}

// BiLQ: LQ factorization of the bi-Lanczos tridiagonal with transfer
// to the BiCG point (reference src/bilq.jl).
template <typename T>
void solve_bilq(const Ctx<T> &c, const std::vector<T> &b,
                const std::vector<T> *cshadow, std::vector<T> &x,
                int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : 2 * n;
  x.assign(n, T(0));
  std::vector<T> c0 = cshadow ? *cshadow : b;
  T cHb = dot(c0, b);
  R bnorm = nrm2(b);
  if (bnorm == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  if (std::abs(cHb) == R(0)) { status = "Breakdown bᴴc = 0"; iter = 0; return; }
  R beta1 = std::sqrt(std::abs(cHb));
  T gamma1 = cHb / T(beta1);
  std::vector<T> v = b, u = c0, v_old(n, T(0)), u_old(n, T(0)), q(n), p(n);
  scal(T(R(1) / beta1), v);
  { T g = conj_(gamma1); for (auto &e : u) e = e / g; }
  std::vector<T> dbar_vec(n, T(0));
  R c_km1 = R(-1);
  T s_km1 = T(0);
  T beta = T(beta1), gamma = gamma1;
  T dbar = T(0), zeta_km1 = T(0), zeta_km2 = T(0), eta_km1 = T(0);
  T zetabar = T(0);
  R norm_vk = nrm2(v);
  R eps = R(c.opt.atol + c.opt.rtol * bnorm);
  R rnorm = bnorm;
  bool cg_pending = false;
  iter = 0;
  solved = bnorm <= eps;
  while (!solved && iter < itmax) {
    ++iter;
    // bi-Lanczos step
    std::vector<T> vc = v, uc = u;
    matvec(c, vc, q);
    rmatvec(c, uc, p);
    if (iter >= 2) {
      axpy(-gamma, v_old, q);
      axpy(-conj_(beta), u_old, p);
    }
    T alpha = dot(u, q);
    axpy(-alpha, v, q);
    axpy(-conj_(alpha), u, p);
    T pHq = dot(p, q);
    R beta_n = std::sqrt(std::abs(pHq));
    T gamma_n = (beta_n != R(0)) ? pHq / T(beta_n) : T(0);
    // LQ rotation: at iter 1 keep the (-1, 0) initialization.
    R ck;
    T sk, d_km1;
    if (iter == 1) { ck = R(-1); sk = T(0); d_km1 = T(0); }
    else cgivens(dbar, gamma, ck, sk, d_km1);
    T eps_km2 = s_km1 * beta;
    T lam_km1 = (iter == 2) ? T(ck) * beta + sk * alpha
                            : -T(c_km1) * T(ck) * beta + sk * alpha;
    T dbar_k = (iter == 1) ? alpha
               : (iter == 2) ? conj_(sk) * beta - T(ck) * alpha
                             : -T(c_km1) * conj_(sk) * beta - T(ck) * alpha;
    // zeta chain
    T dsafe = (d_km1 == T(0)) ? T(1) : d_km1;
    T zeta_km1_new = (iter >= 2) ? eta_km1 / dsafe : zeta_km1;
    T zeta_km2_new = (iter >= 3) ? zeta_km1 : zeta_km2;
    T eta = (iter == 1) ? beta
            : (iter == 2) ? -lam_km1 * zeta_km1_new
                          : -eps_km2 * zeta_km2_new - lam_km1 * zeta_km1_new;
    if (iter >= 2) {
      for (int64_t i = 0; i < n; ++i)
        x[i] += zeta_km1_new * T(ck) * dbar_vec[i]
              + zeta_km1_new * sk * v[i];
    }
    if (iter == 1) dbar_vec = v;
    else
      for (int64_t i = 0; i < n; ++i)
        dbar_vec[i] = conj_(sk) * dbar_vec[i] - T(ck) * v[i];
    // advance basis
    bool nz = std::abs(pHq) != R(0);
    std::vector<T> vprev = v;
    v_old = v; u_old = u;
    if (nz) {
      v = q; scal(T(R(1) / beta_n), v);
      u = p; T g = conj_(gamma_n); for (auto &e : u) e = e / g;
    }
    R norm_vkp1 = nrm2(v);
    T vHv = dot(vprev, v);
    // LQ residual estimate with non-orthonormal basis
    T mu = beta * (s_km1 * zeta_km2_new - T(c_km1) * T(ck) * zeta_km1_new)
         + alpha * sk * zeta_km1_new;
    T om = T(beta_n) * sk * zeta_km1_new;
    if (iter >= 2) {
      R m2 = std::abs(mu), o2 = std::abs(om);
      R cross = R(2) * re(conj_(mu) * om * vHv);
      R arg = m2 * m2 * norm_vk * norm_vk + o2 * o2 * norm_vkp1 * norm_vkp1
            + cross;
      rnorm = std::sqrt(std::max<R>(arg, R(0)));
    }
    // BiCG transfer point
    bool dbar_ok = std::abs(dbar_k) > std::numeric_limits<R>::epsilon();
    if (dbar_ok) zetabar = eta / dbar_k;
    R rnorm_cg = std::abs(T(beta_n) * (sk * zeta_km1_new - T(ck) * zetabar))
               * norm_vkp1;
    bool solved_lq = rnorm <= eps;
    bool solved_cg = dbar_ok && rnorm_cg <= eps;
    cg_pending = solved_cg && !solved_lq;
    solved = solved_lq || solved_cg;
    if (!solved && !nz) { status = "Breakdown"; break; }
    // shift scalars
    c_km1 = ck; s_km1 = sk;
    dbar = dbar_k;
    zeta_km1 = zeta_km1_new; zeta_km2 = zeta_km2_new; eta_km1 = eta;
    beta = T(beta_n); gamma = gamma_n;
    norm_vk = norm_vkp1;
  }
  if (cg_pending) axpy(zetabar, dbar_vec, x);
  if (solved) status = "solution good enough given atol and rtol";
  else if (status == "unknown") status = "maximum number of iterations exceeded";
}

template <typename T>
void solve_bicgstab(const Ctx<T> &c, const std::vector<T> &b,
                    const std::vector<T> *cshadow, std::vector<T> &x,
                    int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : 2 * n;
  x.assign(n, T(0));
  std::vector<T> r = b, r0 = cshadow ? *cshadow : b, p = b, v(n, T(0)), s(n),
                 t(n), q(n);
  R rnorm = nrm2(r);
  R eps = R(c.opt.atol + c.opt.rtol * rnorm);
  if (rnorm == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  T rho = dot(r0, r);
  iter = 0;
  solved = rnorm <= eps;
  while (!solved && iter < itmax) {
    ++iter;
    std::vector<T> pc = p;
    matvec(c, pc, v);
    T denom = dot(r0, v);
    if (denom == T(0)) { status = "breakdown alpha == 0"; break; }
    T alpha = rho / denom;
    s = r;
    axpy(-alpha, v, s);
    axpy(alpha, p, x);
    std::vector<T> sc = s;
    matvec(c, sc, t);
    T tt = dot(t, t);
    T omega = (tt == T(0)) ? T(0) : dot(t, s) / tt;
    axpy(omega, s, x);
    r = s;
    axpy(-omega, t, r);
    T rho_n = dot(r0, r);
    T beta = (rho_n / rho) * (alpha / omega);
    rho = rho_n;
    for (int64_t i = 0; i < n; ++i) p[i] = r[i] + beta * (p[i] - omega * v[i]);
    rnorm = nrm2(r);
    solved = rnorm <= eps;
  }
  if (solved && status == "unknown")
    status = "solution good enough given atol and rtol";
  else if (!solved && status == "unknown")
    status = "maximum number of iterations exceeded";
}

template <typename T>
void solve_cgs(const Ctx<T> &c, const std::vector<T> &b,
               const std::vector<T> *cshadow, std::vector<T> &x,
               int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : 2 * n;
  x.assign(n, T(0));
  std::vector<T> r = b, r0 = cshadow ? *cshadow : b, u = b, p = b,
                 q(n, T(0)), v(n), w(n);
  R rnorm = nrm2(r);
  R eps = R(c.opt.atol + c.opt.rtol * rnorm);
  if (rnorm == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  T rho = dot(r0, r);
  iter = 0;
  solved = rnorm <= eps;
  while (!solved && iter < itmax) {
    ++iter;
    std::vector<T> pc = p;
    matvec(c, pc, v);
    T sigma = dot(r0, v);
    if (sigma == T(0)) { status = "breakdown alpha == 0"; break; }
    T alpha = rho / sigma;
    for (int64_t i = 0; i < n; ++i) q[i] = u[i] - alpha * v[i];
    std::vector<T> uq(n);
    for (int64_t i = 0; i < n; ++i) uq[i] = u[i] + q[i];
    axpy(alpha, uq, x);
    std::vector<T> uqc = uq;
    matvec(c, uqc, w);
    axpy(-alpha, w, r);
    T rho_n = dot(r0, r);
    T beta = rho_n / rho;
    rho = rho_n;
    for (int64_t i = 0; i < n; ++i) u[i] = r[i] + beta * q[i];
    for (int64_t i = 0; i < n; ++i) p[i] = u[i] + beta * (q[i] + beta * p[i]);
    rnorm = nrm2(r);
    solved = rnorm <= eps;
  }
  if (solved && status == "unknown")
    status = "solution good enough given atol and rtol";
  else if (!solved && status == "unknown")
    status = "maximum number of iterations exceeded";
}

template <typename T>
void solve_lsqr(const Ctx<T> &c, const std::vector<T> &b, std::vector<T> &x,
                int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t m = c.m, n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : m + n;
  R lam = R(c.opt.lambda);
  x.assign(n, T(0));
  std::vector<T> u = b, v(n), w(n), tmpm(m), tmpn(n);
  R beta = nrm2(u);
  if (beta == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  scal(T(R(1) / beta), u);
  rmatvec(c, u, v);
  R alpha = nrm2(v);
  if (alpha == R(0)) { solved = true; status = "x is a minimum least-squares solution"; iter = 0; return; }
  scal(T(R(1) / alpha), v);
  w = v;
  R phibar = beta, rhobar = alpha;
  R arnorm0 = alpha * beta;
  R eps_ar = R(c.opt.atol + c.opt.rtol * arnorm0);
  iter = 0;
  solved = false;
  while (!solved && iter < itmax) {
    ++iter;
    std::vector<T> vc = v;
    matvec(c, vc, tmpm);
    for (int64_t i = 0; i < m; ++i) tmpm[i] -= T(alpha) * u[i];
    beta = nrm2(tmpm);
    if (beta != R(0)) {
      u = tmpm;
      scal(T(R(1) / beta), u);
      std::vector<T> uc = u;
      rmatvec(c, uc, tmpn);
      for (int64_t i = 0; i < n; ++i) tmpn[i] -= T(beta) * v[i];
      alpha = nrm2(tmpn);
      if (alpha != R(0)) {
        v = tmpn;
        scal(T(R(1) / alpha), v);
      }
    }
    R c1, s1, rhobar1;
    sym_givens(rhobar, lam, c1, s1, rhobar1);
    phibar = c1 * phibar;
    R cs, sn, rho;
    sym_givens(rhobar1, beta, cs, sn, rho);
    R phi = cs * phibar;
    phibar = sn * phibar;
    R theta = sn * alpha;
    rhobar = -cs * alpha;
    for (int64_t i = 0; i < n; ++i) {
      x[i] += T(phi / rho) * w[i];
      w[i] = v[i] - T(theta / rho) * w[i];
    }
    R arnorm = alpha * std::abs(sn * phi);
    solved = arnorm <= eps_ar || std::abs(phibar) <= R(c.opt.atol);
  }
  status = solved ? "found approximate minimum least-squares solution"
                  : "maximum number of iterations exceeded";
}

template <typename T>
void solve_lsmr(const Ctx<T> &c, const std::vector<T> &b, std::vector<T> &x,
                int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t m = c.m, n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : m + n;
  R lam = R(c.opt.lambda);
  x.assign(n, T(0));
  std::vector<T> u = b, v(n), h(n), hbar(n, T(0)), tmpm(m), tmpn(n);
  R beta = nrm2(u);
  if (beta == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  scal(T(R(1) / beta), u);
  rmatvec(c, u, v);
  R alpha = nrm2(v);
  if (alpha == R(0)) { solved = true; status = "x is a minimum least-squares solution"; iter = 0; return; }
  scal(T(R(1) / alpha), v);
  h = v;
  R zetabar = alpha * beta, alphabar = alpha, rho = 1, rhobar = 1, cbar = 1,
    sbar = 0;
  R arnorm0 = alpha * beta;
  R eps_ar = R(c.opt.atol + c.opt.rtol * arnorm0);
  iter = 0;
  solved = false;
  while (!solved && iter < itmax) {
    ++iter;
    std::vector<T> vc = v;
    matvec(c, vc, tmpm);
    for (int64_t i = 0; i < m; ++i) tmpm[i] -= T(alpha) * u[i];
    beta = nrm2(tmpm);
    if (beta != R(0)) {
      u = tmpm;
      scal(T(R(1) / beta), u);
      std::vector<T> uc = u;
      rmatvec(c, uc, tmpn);
      for (int64_t i = 0; i < n; ++i) tmpn[i] -= T(beta) * v[i];
      alpha = nrm2(tmpn);
      if (alpha != R(0)) {
        v = tmpn;
        scal(T(R(1) / alpha), v);
      }
    }
    R chat, shat, alphahat;
    sym_givens(alphabar, lam, chat, shat, alphahat);
    R rho_old = rho, cs, sn;
    sym_givens(alphahat, beta, cs, sn, rho);
    R thetanew = sn * alpha;
    alphabar = cs * alpha;
    R rhobar_old = rhobar;
    R thetabar = sbar * rho;
    R rhotemp = cbar * rho;
    sym_givens(rhotemp, thetanew, cbar, sbar, rhobar);
    R zeta = cbar * zetabar;
    zetabar = -sbar * zetabar;
    R delta = thetabar * rho / (rho_old * rhobar_old);
    for (int64_t i = 0; i < n; ++i) hbar[i] = h[i] - T(delta) * hbar[i];
    for (int64_t i = 0; i < n; ++i)
      x[i] += T(zeta / (rho * rhobar)) * hbar[i];
    for (int64_t i = 0; i < n; ++i) h[i] = v[i] - T(thetanew / rho) * h[i];
    solved = std::abs(zetabar) <= eps_ar;
  }
  status = solved ? "found approximate minimum least-squares solution"
                  : "maximum number of iterations exceeded";
}

template <typename T>
void solve_cgls(const Ctx<T> &c, const std::vector<T> &b, std::vector<T> &x,
                int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t m = c.m, n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : m + n;
  R lam = R(c.opt.lambda);
  x.assign(n, T(0));
  std::vector<T> r = b, s(n), p(n), q(m);
  std::vector<T> rc = r;
  rmatvec(c, rc, s);
  p = s;
  R gamma = dotr(s, s);
  R eps = R(c.opt.atol + c.opt.rtol * std::sqrt(gamma));
  iter = 0;
  solved = std::sqrt(gamma) <= eps;
  while (!solved && iter < itmax) {
    ++iter;
    std::vector<T> pc = p;
    matvec(c, pc, q);
    R delta = dotr(q, q) + lam * dotr(p, p);
    if (delta == R(0)) break;
    R alpha = gamma / delta;
    axpy(T(alpha), p, x);
    axpy(T(-alpha), q, r);
    std::vector<T> rc2 = r;
    rmatvec(c, rc2, s);
    if (lam > R(0)) axpy(T(-lam), x, s);
    R gn = dotr(s, s);
    R beta = gn / gamma;
    gamma = gn;
    for (int64_t i = 0; i < n; ++i) p[i] = s[i] + T(beta) * p[i];
    solved = std::sqrt(gamma) <= eps;
  }
  status = solved ? "solution good enough given atol and rtol"
                  : "maximum number of iterations exceeded";
}

// CRLS: conjugate residuals on the (regularized) normal equations
// (AᴴA + λI)x = Aᴴb — minimizes ‖Aᴴr‖ (reference src/crls.jl).
template <typename T>
void solve_crls(const Ctx<T> &c, const std::vector<T> &b, std::vector<T> &x,
                int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t m = c.m, n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : m + n;
  R lam = R(c.opt.lambda);
  x.assign(n, T(0));
  // s = Aᴴr (normal-equation residual), Ms = (AᴴA+λI)s, p, Mp likewise
  std::vector<T> r = b, s(n), Ms(n), p(n), Mp(n), tmpm(m);
  std::vector<T> rc = r;
  rmatvec(c, rc, s);
  auto applyM = [&](std::vector<T> &vin, std::vector<T> &vout) {
    std::vector<T> vc = vin;
    matvec(c, vc, tmpm);
    std::vector<T> tc = tmpm;
    rmatvec(c, tc, vout);
    if (lam > R(0)) axpy(T(lam), vin, vout);
  };
  applyM(s, Ms);
  p = s;
  Mp = Ms;
  R rho = dotr(s, Ms);
  R snorm = nrm2(s);
  R eps = R(c.opt.atol + c.opt.rtol * snorm);
  if (snorm == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  iter = 0;
  solved = snorm <= eps;
  while (!solved && iter < itmax) {
    ++iter;
    R denom = dotr(Mp, Mp);
    if (denom == R(0)) break;
    R alpha = rho / denom;
    axpy(T(alpha), p, x);
    axpy(T(-alpha), Mp, s);
    applyM(s, Ms);
    R rho_n = dotr(s, Ms);
    R beta = rho_n / rho;
    rho = rho_n;
    for (int64_t i = 0; i < n; ++i) p[i] = s[i] + T(beta) * p[i];
    for (int64_t i = 0; i < n; ++i) Mp[i] = Ms[i] + T(beta) * Mp[i];
    snorm = nrm2(s);
    solved = snorm <= eps;
  }
  status = solved ? "solution good enough given atol and rtol"
                  : "maximum number of iterations exceeded";
}

// CRMR: conjugate residuals on AAᴴy = b with x = Aᴴy — minimum-norm
// solution of consistent systems (reference src/crmr.jl).
template <typename T>
void solve_crmr(const Ctx<T> &c, const std::vector<T> &b, std::vector<T> &x,
                int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t m = c.m, n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : m + n;
  x.assign(n, T(0));
  std::vector<T> r = b, s(n), p(n), q(m);
  std::vector<T> rc = r;
  rmatvec(c, rc, s);
  p = s;
  R rho = dotr(s, s);     // ⟨r, AAᴴr⟩ pulled back to ‖Aᴴr‖²
  R rnorm = nrm2(r);
  R eps = R(c.opt.atol + c.opt.rtol * rnorm);
  if (rnorm == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  R kappa = R(c.opt.atol + c.opt.rtol * std::sqrt(rho));
  iter = 0;
  solved = rnorm <= eps;
  bool inconsistent = false;
  while (!solved && !inconsistent && iter < itmax) {
    ++iter;
    std::vector<T> pc = p;
    matvec(c, pc, q);
    R denom = dotr(q, q);
    if (denom == R(0)) break;
    R alpha = rho / denom;
    axpy(T(alpha), p, x);
    axpy(T(-alpha), q, r);
    std::vector<T> rc2 = r;
    rmatvec(c, rc2, s);
    R rho_n = dotr(s, s);
    R beta = rho_n / rho;
    rho = rho_n;
    for (int64_t i = 0; i < n; ++i) p[i] = s[i] + T(beta) * p[i];
    rnorm = nrm2(r);
    solved = rnorm <= eps;
    inconsistent = !solved && std::sqrt(rho) <= kappa;
  }
  if (solved) status = "solution good enough given atol and rtol";
  else if (inconsistent) status = "system probably inconsistent but least squares/norm solution found";
  else status = "maximum number of iterations exceeded";
}

template <typename T>
void solve_cgne(const Ctx<T> &c, const std::vector<T> &b, std::vector<T> &x,
                int64_t &iter, bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t m = c.m, n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : m + n;
  x.assign(n, T(0));
  std::vector<T> r = b, p(n), q(m), az(n);
  std::vector<T> rc = r;
  rmatvec(c, rc, p);
  R gamma = dotr(r, r);
  R rnorm = std::sqrt(gamma);
  R eps = R(c.opt.atol + c.opt.rtol * rnorm);
  if (rnorm == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  iter = 0;
  solved = rnorm <= eps;
  while (!solved && iter < itmax) {
    ++iter;
    std::vector<T> pc = p;
    matvec(c, pc, q);
    R delta = dotr(p, p);
    if (delta == R(0)) break;
    R alpha = gamma / delta;
    axpy(T(alpha), p, x);
    axpy(T(-alpha), q, r);
    R gn = dotr(r, r);
    R beta = gn / gamma;
    gamma = gn;
    std::vector<T> rc2 = r;
    rmatvec(c, rc2, az);
    for (int64_t i = 0; i < n; ++i) p[i] = az[i] + T(beta) * p[i];
    rnorm = std::sqrt(gamma);
    solved = rnorm <= eps;
  }
  status = solved ? "solution good enough given atol and rtol"
                  : "maximum number of iterations exceeded";
}

// CRAIGMR: minimum-residual method on AA^H y = b with x = A^H y —
// CR on the second-kind normal equations tracking the dual iterate
// (reference src/craigmr.jl semantics: residual-minimizing (x, y)).
template <typename T>
void solve_craigmr(const Ctx<T> &c, const std::vector<T> &b,
                   std::vector<T> &x, std::vector<T> &y, int64_t &iter,
                   bool &solved, std::string &status) {
  using R = real_t<T>;
  int64_t m = c.m, n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : m + n;
  x.assign(n, T(0));
  y.assign(m, T(0));
  std::vector<T> r = b, s(n), p(n), py(m), q(m);
  std::vector<T> rc = r;
  rmatvec(c, rc, s);
  p = s;
  py = r;
  R rho = dotr(s, s);
  R rnorm = nrm2(r);
  R eps = R(c.opt.atol + c.opt.rtol * rnorm);
  if (rnorm == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  R kappa = R(c.opt.atol + c.opt.rtol * std::sqrt(rho));
  iter = 0;
  solved = rnorm <= eps;
  bool inconsistent = false;
  while (!solved && !inconsistent && iter < itmax) {
    ++iter;
    std::vector<T> pc = p;
    matvec(c, pc, q);
    R denom = dotr(q, q);
    if (denom == R(0)) break;
    R alpha = rho / denom;
    axpy(T(alpha), p, x);
    axpy(T(alpha), py, y);
    axpy(T(-alpha), q, r);
    std::vector<T> rc2 = r;
    rmatvec(c, rc2, s);
    R rho_n = dotr(s, s);
    R beta = rho_n / rho;
    rho = rho_n;
    for (int64_t i = 0; i < n; ++i) p[i] = s[i] + T(beta) * p[i];
    for (int64_t i = 0; i < m; ++i) py[i] = r[i] + T(beta) * py[i];
    rnorm = nrm2(r);
    solved = rnorm <= eps;
    inconsistent = !solved && std::sqrt(rho) <= kappa;
  }
  if (solved) status = "solution good enough given atol and rtol";
  else if (inconsistent) status = "system probably inconsistent but least squares/norm solution found";
  else status = "maximum number of iterations exceeded";
}

template <typename T>
void solve_craig(const Ctx<T> &c, const std::vector<T> &b, std::vector<T> &x,
                 std::vector<T> &y, int64_t &iter, bool &solved,
                 std::string &status) {
  using R = real_t<T>;
  int64_t m = c.m, n = c.n;
  int64_t itmax = c.opt.itmax ? c.opt.itmax : m + n;
  x.assign(n, T(0));
  y.assign(m, T(0));
  std::vector<T> u = b, v(n), w(m, T(0)), tmpm(m), tmpn(n);
  R beta1 = nrm2(u);
  if (beta1 == R(0)) { solved = true; status = "x is a zero-residual solution"; iter = 0; return; }
  scal(T(R(1) / beta1), u);
  R beta = beta1, theta = beta1, xi = -1, rho_prev = 1;
  R eps = R(c.opt.atol + c.opt.rtol * beta1);
  iter = 0;
  solved = false;
  while (!solved && iter < itmax) {
    ++iter;
    std::vector<T> uc = u;
    rmatvec(c, uc, tmpn);
    for (int64_t i = 0; i < n; ++i) tmpn[i] -= T(beta) * v[i];
    R alpha = nrm2(tmpn);
    if (alpha == R(0)) { status = "system may be inconsistent"; break; }
    v = tmpn;
    scal(T(R(1) / alpha), v);
    xi = -theta / alpha * xi;
    axpy(T(xi), v, x);
    for (int64_t i = 0; i < m; ++i) w[i] = u[i] - T(theta / rho_prev) * w[i];
    axpy(T(xi / alpha), w, y);
    std::vector<T> vc = v;
    matvec(c, vc, tmpm);
    for (int64_t i = 0; i < m; ++i) tmpm[i] -= T(alpha) * u[i];
    beta = nrm2(tmpm);
    if (beta != R(0)) {
      u = tmpm;
      scal(T(R(1) / beta), u);
    }
    theta = beta;
    rho_prev = alpha;
    R rnorm = beta * std::abs(xi);
    solved = rnorm <= eps;
  }
  if (solved)
    status = "solution good enough for the tolerances given";
  else if (status == "unknown")
    status = "maximum number of iterations exceeded";
}

// ---------------------------------------------------------------------------
// typed workspace + dispatch
// ---------------------------------------------------------------------------

#include "solvers_extra.inc"

template <typename T>
struct Workspace : WorkspaceBase {
  std::vector<T> x, y;
};

template <typename T>
int do_solve(Workspace<T> *w, krylov_matvec Af, krylov_matvec Atf,
             krylov_matvec Mf, krylov_matvec Nf, const void *bp,
             const void *cp, const void *ud, const krylov_options *o) {
  using R = real_t<T>;
  auto t0 = std::chrono::steady_clock::now();
  Ctx<T> ctx;
  Op<T> A{Af, ud}, At{Atf, ud}, M{Mf, ud}, N{Nf, ud};
  ctx.A = &A;
  ctx.At = Atf ? &At : nullptr;
  ctx.M = Mf ? &M : nullptr;
  ctx.N = Nf ? &N : nullptr;
  ctx.opt = decode<T>(o);
  ctx.m = w->m;
  ctx.n = w->n;
  const T *b = static_cast<const T *>(bp);
  std::vector<T> bv(b, b + w->m);
  std::vector<T> cv;
  if (cp) {
    const T *cc = static_cast<const T *>(cp);
    cv.assign(cc, cc + w->n);
  }
  // warm start: solve the shifted system (reference warm-start contract).
  // Two-output solvers fold (x0, y0) into both right-hand sides with
  // their own composition (reference tricg/trimr/gpmr/usymlqr/bilqr).
  std::vector<T> x0, y0;
  bool two_out = w->solver == KRYLOV_BILQR || w->solver == KRYLOV_TRILQR ||
                 w->solver == KRYLOV_USYMLQR || w->solver == KRYLOV_TRICG ||
                 w->solver == KRYLOV_TRIMR || w->solver == KRYLOV_GPMR;
  if (w->has_warm && !two_out) {
    const T *p = reinterpret_cast<const T *>(w->x0raw.data());
    x0.assign(p, p + w->n);
    std::vector<T> Ax(w->m);
    std::vector<T> xc = x0;
    A.apply(xc, Ax);
    for (int64_t i = 0; i < w->m; ++i) bv[i] -= Ax[i];
    w->has_warm = false;
  } else if (w->has_warm && two_out) {
    const T *px = reinterpret_cast<const T *>(w->x0raw.data());
    x0.assign(px, px + (w->solver == KRYLOV_USYMLQR ? w->m : w->n));
    if (w->has_warm2) {
      const T *py = reinterpret_cast<const T *>(w->y0raw.data());
      y0.assign(py, py + (w->solver == KRYLOV_USYMLQR ? w->n : w->m));
    } else {
      y0.assign(w->solver == KRYLOV_USYMLQR ? w->n : w->m, T(0));
    }
    std::vector<T> t1(w->m), t2(w->n);
    std::vector<T> xc = x0, yc = y0;
    switch (w->solver) {
      case KRYLOV_BILQR:
      case KRYLOV_TRILQR:
        // b0 = b - A x0 ; c0 = c - Aᴴ y0
        A.apply(xc, t1);
        for (int64_t i = 0; i < w->m; ++i) bv[i] -= t1[i];
        if (Atf && !cv.empty()) {
          At.apply(yc, t2);
          for (int64_t i = 0; i < w->n; ++i) cv[i] -= t2[i];
        }
        break;
      case KRYLOV_TRICG:
      case KRYLOV_TRIMR: {
        // b0 = b - A y0 - τ x0 ; c0 = c - Aᴴ x0 - ν y0
        double tau = (o && !std::isnan(o->tau)) ? o->tau : 1.0;
        double nu = (o && !std::isnan(o->nu)) ? o->nu : -1.0;
        A.apply(yc, t1);
        for (int64_t i = 0; i < w->m; ++i)
          bv[i] -= t1[i] + T(real_t<T>(tau)) * x0[i];
        if (Atf && !cv.empty()) {
          At.apply(xc, t2);
          for (int64_t i = 0; i < w->n; ++i)
            cv[i] -= t2[i] + T(real_t<T>(nu)) * y0[i];
        }
        break;
      }
      case KRYLOV_GPMR: {
        // b0 = b - A y0 - λ x0 ; c0 = c - B x0 - μ y0 (B in the At slot)
        double glam = (o && !std::isnan(o->lambda)) ? o->lambda : 1.0;
        double gmu = (o && !std::isnan(o->nu)) ? o->nu : 1.0;
        A.apply(yc, t1);
        for (int64_t i = 0; i < w->m; ++i)
          bv[i] -= t1[i] + T(real_t<T>(glam)) * x0[i];
        if (Atf && !cv.empty()) {
          At.apply(xc, t2);
          for (int64_t i = 0; i < w->n; ++i)
            cv[i] -= t2[i] + T(real_t<T>(gmu)) * y0[i];
        }
        break;
      }
      case KRYLOV_USYMLQR:
        // b0 = b - x0 - A y0 ; c0 = c - Aᴴ x0
        A.apply(yc, t1);
        for (int64_t i = 0; i < w->m; ++i) bv[i] -= x0[i] + t1[i];
        if (Atf && !cv.empty()) {
          At.apply(xc, t2);
          for (int64_t i = 0; i < w->n; ++i) cv[i] -= t2[i];
        }
        break;
      default:
        break;
    }
    w->has_warm = false;
    w->has_warm2 = false;
  }
  w->status = "unknown";
  int64_t iter = 0;
  bool solved = false;
  switch (w->solver) {
    case KRYLOV_CG:
      solve_cg(ctx, bv, w->x, iter, solved, w->status);
      break;
    case KRYLOV_CR:
      solve_cr(ctx, bv, w->x, iter, solved, w->status, false);
      break;
    case KRYLOV_CAR:
      solve_cr(ctx, bv, w->x, iter, solved, w->status, true);
      break;
    case KRYLOV_MINRES:
      solve_minres(ctx, bv, w->x, iter, solved, w->status);
      break;
    case KRYLOV_MINARES:
      solve_minares_bounded(ctx, bv, w->x, iter, solved, w->status);
      break;
    case KRYLOV_MINRES_QLP:
      solve_minres_qlp(ctx, bv, w->x, iter, solved, w->status);
      break;
    case KRYLOV_DIOM:
      solve_diom(ctx, bv, w->x, w->memory, iter, solved, w->status);
      break;
    case KRYLOV_DQGMRES:
      solve_dqgmres(ctx, bv, w->x, w->memory, iter, solved, w->status);
      break;
    case KRYLOV_LSLQ:
      if (!ctx.At) return 2;
      solve_lslq(ctx, bv, w->x, iter, solved, w->status);
      break;
    case KRYLOV_LNLQ:
      if (!ctx.At) return 2;
      solve_lnlq(ctx, bv, w->x, w->y, iter, solved, w->status);
      break;
    case KRYLOV_BILQR:
      if (!ctx.At) return 2;
      if (!cp) return 4;
      solve_bilqr(ctx, bv, cv, w->x, w->y, iter, solved, w->status);
      break;
    case KRYLOV_TRILQR:
      if (!ctx.At) return 2;
      if (!cp) return 4;
      solve_trilqr(ctx, bv, cv, w->x, w->y, iter, solved, w->status);
      break;
    case KRYLOV_USYMLQR:
      if (!ctx.At) return 2;
      if (!cp) return 4;
      solve_usymlqr(ctx, bv, cv, w->x, w->y, iter, solved, w->status);
      break;
    case KRYLOV_TRICG:
      if (!ctx.At) return 2;
      if (!cp) return 4;
      solve_tricg(ctx, bv, cv, w->x, w->y, iter, solved, w->status);
      break;
    case KRYLOV_TRIMR:
      if (!ctx.At) return 2;
      if (!cp) return 4;
      solve_trimr(ctx, bv, cv, w->x, w->y, iter, solved, w->status);
      break;
    case KRYLOV_GPMR: {
      if (!ctx.At) return 2;  // At slot carries the second operator B
      if (!cp) return 4;
      // GPMR block scalars: λ via opts.lambda (NaN → 1), μ via opts.nu
      // (NaN → 1) — defaults match reference gpmr λ=μ=1.
      double glam = (o && !std::isnan(o->lambda)) ? o->lambda : 1.0;
      double gmu = (o && !std::isnan(o->nu)) ? o->nu : 1.0;
      solve_gpmr(ctx, bv, cv, w->x, w->y, glam, gmu, iter, solved,
                 w->status);
      break;
    }
    case KRYLOV_SYMMLQ:
      solve_symmlq(ctx, bv, w->x, iter, solved, w->status);
      break;
    case KRYLOV_GMRES:
      solve_gmres(ctx, bv, w->x, w->memory, iter, solved, w->status);
      break;
    case KRYLOV_FGMRES:
      solve_gmres(ctx, bv, w->x, w->memory, iter, solved, w->status, true);
      break;
    case KRYLOV_FOM:
      solve_fom(ctx, bv, w->x, w->memory, iter, solved, w->status);
      break;
    case KRYLOV_BICGSTAB:
      solve_bicgstab(ctx, bv, cp ? &cv : nullptr, w->x, iter, solved,
                     w->status);
      break;
    case KRYLOV_BILQ:
      if (!ctx.At) return 2;
      solve_bilq(ctx, bv, cp ? &cv : nullptr, w->x, iter, solved, w->status);
      break;
    case KRYLOV_QMR:
      if (!ctx.At) return 2;
      solve_qmr(ctx, bv, cp ? &cv : nullptr, w->x, iter, solved, w->status);
      break;
    case KRYLOV_CGS:
      solve_cgs(ctx, bv, cp ? &cv : nullptr, w->x, iter, solved, w->status);
      break;
    case KRYLOV_LSQR:
      if (!ctx.At) return 2;
      solve_lsqr(ctx, bv, w->x, iter, solved, w->status);
      break;
    case KRYLOV_USYMQR:
      if (!ctx.At) return 2;
      solve_usymqr(ctx, bv, cp ? &cv : nullptr, w->x, iter, solved,
                   w->status);
      break;
    case KRYLOV_LSMR:
      if (!ctx.At) return 2;
      solve_lsmr(ctx, bv, w->x, iter, solved, w->status);
      break;
    case KRYLOV_CGLS:
      if (!ctx.At) return 2;
      solve_cgls(ctx, bv, w->x, iter, solved, w->status);
      break;
    case KRYLOV_CRLS:
      if (!ctx.At) return 2;
      solve_crls(ctx, bv, w->x, iter, solved, w->status);
      break;
    case KRYLOV_CGNE:
      if (!ctx.At) return 2;
      solve_cgne(ctx, bv, w->x, iter, solved, w->status);
      break;
    case KRYLOV_USYMLQ:
      if (!ctx.At) return 2;
      solve_usymlq(ctx, bv, cp ? &cv : nullptr, w->x, iter, solved,
                   w->status);
      break;
    case KRYLOV_CRMR:
      if (!ctx.At) return 2;
      solve_crmr(ctx, bv, w->x, iter, solved, w->status);
      break;
    case KRYLOV_CRAIG:
      if (!ctx.At) return 2;
      solve_craig(ctx, bv, w->x, w->y, iter, solved, w->status);
      break;
    case KRYLOV_CRAIGMR:
      if (!ctx.At) return 2;
      solve_craigmr(ctx, bv, w->x, w->y, iter, solved, w->status);
      break;
    default:
      return 3; /* not implemented */
  }
  if (!x0.empty())
    for (size_t i = 0; i < x0.size() && i < w->x.size(); ++i) w->x[i] += x0[i];
  if (!y0.empty())
    for (size_t i = 0; i < y0.size() && i < w->y.size(); ++i) w->y[i] += y0[i];
  w->niter = iter;
  w->solved = solved;
  w->elapsed =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();
  return 0;
}

template <typename T>
int get_vec(WorkspaceBase *w, void *out, bool want_y) {
  auto *tw = static_cast<Workspace<T> *>(w);
  const std::vector<T> &src = want_y ? tw->y : tw->x;
  if (src.empty()) return 1;
  std::memcpy(out, src.data(), src.size() * sizeof(T));
  return 0;
}

size_t dtype_size(krylov_dtype dt) {
  switch (dt) {
    case KRYLOV_FLOAT32: return 4;
    case KRYLOV_FLOAT64: return 8;
    case KRYLOV_COMPLEX32: return 8;
    case KRYLOV_COMPLEX64: return 16;
  }
  return 8;
}

// ---- block family: real block Krylov methods over the callback SpMM ----

struct BlockWorkspaceBase {
  krylov_block_solver solver;
  krylov_dtype dtype;
  int64_t m, n, p, memory;
  int64_t niter = 0;
  bool solved = false;
  double elapsed = 0.0;
  std::string status = "unknown";
  bool has_warm = false;
  std::vector<unsigned char> X0raw;
  virtual ~BlockWorkspaceBase() = default;
};

template <typename T>
struct BlockWorkspaceT : BlockWorkspaceBase {
  std::vector<T> X;   // column-major n×p
};

template <typename T>
int do_block_solve(BlockWorkspaceT<T> *w, krylov_block_matvec Af,
                   const void *Bp, const void *ud,
                   const krylov_options *opts) {
  using R = real_t<T>;
  auto t0 = std::chrono::steady_clock::now();
  const int64_t n = w->n;
  const int64_t p = w->p;
  const T *B = static_cast<const T *>(Bp);
  std::vector<T> Bv(B, B + n * p);
  Options o = decode<T>(opts);
  // warm start: solve the residual system, shift back.
  std::vector<T> X0;
  if (w->has_warm) {
    const T *x0 = reinterpret_cast<const T *>(w->X0raw.data());
    X0.assign(x0, x0 + n * p);
    std::vector<T> AX(n * p);
    std::vector<T> xc = X0;
    Af(ud, xc.data(), int(p), AX.data());
    for (int64_t i = 0; i < n * p; ++i) Bv[i] -= AX[i];
    w->has_warm = false;
  }
  int64_t iter = 0;
  bool solved = false;
  std::string status;
  switch (w->solver) {
    case KRYLOV_BLOCK_GMRES:
      solve_block_gmres(Af, ud, Bv, w->X, n, p, w->memory, o.atol, o.rtol,
                        o.itmax, iter, solved, status);
      break;
    case KRYLOV_BLOCK_MINRES:
      solve_block_minres(Af, ud, Bv, w->X, n, p, o.atol, o.rtol, o.itmax,
                         iter, solved, status);
      break;
    default:
      return 3;
  }
  if (!X0.empty())
    for (int64_t i = 0; i < n * p; ++i) w->X[i] += X0[i];
  w->niter = iter;
  w->solved = solved;
  w->status = status;
  w->elapsed =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();
  return 0;
}


template <typename T>
int block_get(BlockWorkspaceBase *w, void *X) {
  auto *tw = static_cast<BlockWorkspaceT<T> *>(w);
  if (tw->X.empty()) return 1;
  std::memcpy(X, tw->X.data(), tw->X.size() * sizeof(T));
  return 0;
}


}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void krylov_get_version(int *major, int *minor, int *patch) {
  if (major) *major = KRYLOV_VERSION_MAJOR;
  if (minor) *minor = KRYLOV_VERSION_MINOR;
  if (patch) *patch = KRYLOV_VERSION_PATCH;
}

void krylov_default_workspace_options(krylov_workspace_options *o) {
  if (!o) return;
  o->memory = 20;
  o->window = 5;
}

void krylov_default_options(krylov_options *o) {
  if (!o) return;
  double nan = std::numeric_limits<double>::quiet_NaN();
  o->atol = nan;
  o->rtol = nan;
  o->itmax = 0;
  o->verbose = 0;
  o->lambda = nan;
  o->tau = nan;
  o->nu = nan;
  o->timemax = nan;
  o->radius = nan;
  o->restart = 0;
  o->reorthogonalization = 0;
  o->linesearch = 0;
}

krylov_workspace_t krylov_workspace_create(krylov_solver solver,
                                           krylov_dtype dtype, int64_t m,
                                           int64_t n,
                                           const krylov_workspace_options *o) {
  WorkspaceBase *w = nullptr;
  switch (dtype) {
    case KRYLOV_FLOAT32: w = new Workspace<float>(); break;
    case KRYLOV_FLOAT64: w = new Workspace<double>(); break;
    case KRYLOV_COMPLEX32: w = new Workspace<std::complex<float>>(); break;
    case KRYLOV_COMPLEX64: w = new Workspace<std::complex<double>>(); break;
    default: return nullptr;
  }
  w->solver = solver;
  w->dtype = dtype;
  w->m = m;
  w->n = n;
  w->memory = (o && o->memory > 0) ? o->memory : 20;
  w->window = (o && o->window > 0) ? o->window : 5;
  return w;
}

void krylov_workspace_free(krylov_workspace_t ws) {
  WorkspaceBase *w = static_cast<WorkspaceBase *>(ws);
  if (!w) return;
  switch (w->dtype) {
    case KRYLOV_FLOAT32: delete static_cast<Workspace<float> *>(w); break;
    case KRYLOV_FLOAT64: delete static_cast<Workspace<double> *>(w); break;
    case KRYLOV_COMPLEX32:
      delete static_cast<Workspace<std::complex<float>> *>(w);
      break;
    case KRYLOV_COMPLEX64:
      delete static_cast<Workspace<std::complex<double>> *>(w);
      break;
  }
}

int krylov_solve(krylov_workspace_t ws, krylov_matvec A, krylov_matvec At,
                 krylov_matvec M, krylov_matvec N, const void *b,
                 const void *c, const void *userdata,
                 const krylov_options *opts) {
  WorkspaceBase *w = static_cast<WorkspaceBase *>(ws);
  if (!w || !A || !b) return 1;
  switch (w->dtype) {
    case KRYLOV_FLOAT32:
      return do_solve(static_cast<Workspace<float> *>(w), A, At, M, N, b, c,
                      userdata, opts);
    case KRYLOV_FLOAT64:
      return do_solve(static_cast<Workspace<double> *>(w), A, At, M, N, b, c,
                      userdata, opts);
    case KRYLOV_COMPLEX32:
      return do_solve(static_cast<Workspace<std::complex<float>> *>(w), A, At,
                      M, N, b, c, userdata, opts);
    case KRYLOV_COMPLEX64:
      return do_solve(static_cast<Workspace<std::complex<double>> *>(w), A, At,
                      M, N, b, c, userdata, opts);
  }
  return 1;
}

int krylov_get_x(krylov_workspace_t ws, void *x) {
  WorkspaceBase *w = static_cast<WorkspaceBase *>(ws);
  if (!w || !x) return 1;
  switch (w->dtype) {
    case KRYLOV_FLOAT32: return get_vec<float>(w, x, false);
    case KRYLOV_FLOAT64: return get_vec<double>(w, x, false);
    case KRYLOV_COMPLEX32: return get_vec<std::complex<float>>(w, x, false);
    case KRYLOV_COMPLEX64: return get_vec<std::complex<double>>(w, x, false);
  }
  return 1;
}

int krylov_get_y(krylov_workspace_t ws, void *y) {
  WorkspaceBase *w = static_cast<WorkspaceBase *>(ws);
  if (!w || !y) return 1;
  switch (w->dtype) {
    case KRYLOV_FLOAT32: return get_vec<float>(w, y, true);
    case KRYLOV_FLOAT64: return get_vec<double>(w, y, true);
    case KRYLOV_COMPLEX32: return get_vec<std::complex<float>>(w, y, true);
    case KRYLOV_COMPLEX64: return get_vec<std::complex<double>>(w, y, true);
  }
  return 1;
}

int krylov_is_solved(krylov_workspace_t ws) {
  WorkspaceBase *w = static_cast<WorkspaceBase *>(ws);
  return w && w->solved ? 1 : 0;
}

int64_t krylov_niter(krylov_workspace_t ws) {
  WorkspaceBase *w = static_cast<WorkspaceBase *>(ws);
  return w ? w->niter : -1;
}

double krylov_elapsed_time(krylov_workspace_t ws) {
  WorkspaceBase *w = static_cast<WorkspaceBase *>(ws);
  return w ? w->elapsed : -1.0;
}

const char *krylov_get_status(krylov_workspace_t ws) {
  WorkspaceBase *w = static_cast<WorkspaceBase *>(ws);
  return w ? w->status.c_str() : "invalid workspace";
}

int krylov_warm_start(krylov_workspace_t ws, const void *x0) {
  WorkspaceBase *w = static_cast<WorkspaceBase *>(ws);
  if (!w || !x0) return 1;
  size_t bytes = dtype_size(w->dtype) * static_cast<size_t>(w->n);
  w->x0raw.assign(static_cast<const unsigned char *>(x0),
                  static_cast<const unsigned char *>(x0) + bytes);
  w->has_warm = true;
  return 0;
}

int krylov_warm_start2(krylov_workspace_t ws, const void *x0, const void *y0) {
  WorkspaceBase *w = static_cast<WorkspaceBase *>(ws);
  if (!w || !x0 || !y0) return 1;
  krylov_warm_start(ws, x0);
  size_t bytes = dtype_size(w->dtype) * static_cast<size_t>(w->m);
  w->y0raw.assign(static_cast<const unsigned char *>(y0),
                  static_cast<const unsigned char *>(y0) + bytes);
  w->has_warm2 = true;
  return 0;
}

krylov_block_workspace_t krylov_block_workspace_create(
    krylov_block_solver solver, krylov_dtype dtype, int64_t m, int64_t n,
    int64_t p, const krylov_workspace_options *o) {
  if (solver != KRYLOV_BLOCK_GMRES && solver != KRYLOV_BLOCK_MINRES)
    return nullptr;
  BlockWorkspaceBase *w = nullptr;
  switch (dtype) {
    case KRYLOV_FLOAT32: w = new BlockWorkspaceT<float>(); break;
    case KRYLOV_FLOAT64: w = new BlockWorkspaceT<double>(); break;
    case KRYLOV_COMPLEX32: w = new BlockWorkspaceT<std::complex<float>>(); break;
    case KRYLOV_COMPLEX64: w = new BlockWorkspaceT<std::complex<double>>(); break;
    default: return nullptr;
  }
  w->solver = solver;
  w->dtype = dtype;
  w->m = m;
  w->n = n;
  w->p = p;
  w->memory = (o && o->memory > 0) ? o->memory : 5;
  return w;
}

void krylov_block_workspace_free(krylov_block_workspace_t ws) {
  delete static_cast<BlockWorkspaceBase *>(ws);
}

int krylov_block_solve(krylov_block_workspace_t ws, krylov_block_matvec A,
                       const void *Bp, const void *ud,
                       const krylov_options *opts) {
  auto *w = static_cast<BlockWorkspaceBase *>(ws);
  if (!w || !A || !Bp) return 1;
  switch (w->dtype) {
    case KRYLOV_FLOAT32:
      return do_block_solve(static_cast<BlockWorkspaceT<float> *>(w), A, Bp,
                            ud, opts);
    case KRYLOV_FLOAT64:
      return do_block_solve(static_cast<BlockWorkspaceT<double> *>(w), A, Bp,
                            ud, opts);
    case KRYLOV_COMPLEX32:
      return do_block_solve(
          static_cast<BlockWorkspaceT<std::complex<float>> *>(w), A, Bp, ud,
          opts);
    case KRYLOV_COMPLEX64:
      return do_block_solve(
          static_cast<BlockWorkspaceT<std::complex<double>> *>(w), A, Bp, ud,
          opts);
    default:
      return 1;
  }
}

int krylov_block_get_x(krylov_block_workspace_t ws, void *X) {
  auto *w = static_cast<BlockWorkspaceBase *>(ws);
  if (!w || !X) return 1;
  switch (w->dtype) {
    case KRYLOV_FLOAT32: return block_get<float>(w, X);
    case KRYLOV_FLOAT64: return block_get<double>(w, X);
    case KRYLOV_COMPLEX32: return block_get<std::complex<float>>(w, X);
    case KRYLOV_COMPLEX64: return block_get<std::complex<double>>(w, X);
    default: return 1;
  }
}

int krylov_block_is_solved(krylov_block_workspace_t ws) {
  auto *w = static_cast<BlockWorkspaceBase *>(ws);
  return w && w->solved ? 1 : 0;
}

int64_t krylov_block_niter(krylov_block_workspace_t ws) {
  auto *w = static_cast<BlockWorkspaceBase *>(ws);
  return w ? w->niter : -1;
}

double krylov_block_elapsed_time(krylov_block_workspace_t ws) {
  auto *w = static_cast<BlockWorkspaceBase *>(ws);
  return w ? w->elapsed : -1.0;
}

int krylov_block_warm_start(krylov_block_workspace_t ws, const void *X0) {
  auto *w = static_cast<BlockWorkspaceBase *>(ws);
  if (!w || !X0) return 1;
  size_t bytes = dtype_size(w->dtype) *
                 static_cast<size_t>(w->n) * static_cast<size_t>(w->p);
  w->X0raw.assign(static_cast<const unsigned char *>(X0),
                  static_cast<const unsigned char *>(X0) + bytes);
  w->has_warm = true;
  return 0;
}

}  // extern "C"
