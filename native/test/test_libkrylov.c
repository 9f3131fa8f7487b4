/* C-API end-to-end tests (reference interfaces/test/C/test_all_solvers.c
 * pattern): tridiagonal SPD system via a callback matvec, a rectangular
 * least-squares problem, options, warm start, and the block API. */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "krylov.h"

#define N 50
#define M 60

static int failures = 0;
#define CHECK(cond, msg)                         \
  do {                                           \
    if (!(cond)) {                               \
      printf("FAIL: %s\n", msg);                 \
      ++failures;                                \
    }                                            \
  } while (0)

/* SPD tridiagonal: diag 4, offdiag -1 */
static void spd_matvec(const void *ud, void *xv, void *yv) {
  (void)ud;
  const double *x = (const double *)xv;
  double *y = (double *)yv;
  for (int i = 0; i < N; ++i) {
    y[i] = 4.0 * x[i];
    if (i > 0) y[i] -= x[i - 1];
    if (i < N - 1) y[i] -= x[i + 1];
  }
}

/* nonsymmetric: diag 4, sub -2, super -1 */
static void nsy_matvec(const void *ud, void *xv, void *yv) {
  (void)ud;
  const double *x = (const double *)xv;
  double *y = (double *)yv;
  for (int i = 0; i < N; ++i) {
    y[i] = 4.0 * x[i];
    if (i > 0) y[i] -= 2.0 * x[i - 1];
    if (i < N - 1) y[i] -= x[i + 1];
  }
}

static void nsy_rmatvec(const void *ud, void *xv, void *yv) {
  (void)ud;
  const double *x = (const double *)xv;
  double *y = (double *)yv;
  for (int i = 0; i < N; ++i) {
    y[i] = 4.0 * x[i];
    if (i > 0) y[i] -= x[i - 1];
    if (i < N - 1) y[i] -= 2.0 * x[i + 1];
  }
}

/* rectangular M×N: bidiagonal-ish */
static void rect_matvec(const void *ud, void *xv, void *yv) {
  (void)ud;
  const double *x = (const double *)xv;
  double *y = (double *)yv;
  for (int i = 0; i < M; ++i) {
    y[i] = 0.0;
    if (i < N) y[i] += (2.0 + i * 0.01) * x[i];
    if (i - 1 >= 0 && i - 1 < N) y[i] += 0.5 * x[i - 1];
  }
}

static void rect_rmatvec(const void *ud, void *xv, void *yv) {
  (void)ud;
  const double *x = (const double *)xv;
  double *y = (double *)yv;
  for (int j = 0; j < N; ++j) {
    y[j] = (2.0 + j * 0.01) * x[j];
    if (j + 1 < M) y[j] += 0.5 * x[j + 1];
  }
}

static double resid_spd(const double *x, const double *b) {
  double y[N], s = 0, sb = 0;
  spd_matvec(NULL, (void *)x, y);
  for (int i = 0; i < N; ++i) {
    double d = b[i] - y[i];
    s += d * d;
    sb += b[i] * b[i];
  }
  return sqrt(s / sb);
}

static double resid_nsy(const double *x, const double *b) {
  double y[N], s = 0, sb = 0;
  nsy_matvec(NULL, (void *)x, y);
  for (int i = 0; i < N; ++i) {
    double d = b[i] - y[i];
    s += d * d;
    sb += b[i] * b[i];
  }
  return sqrt(s / sb);
}

static void block_matvec(const void *ud, void *Xv, int p, void *Yv) {
  (void)ud;
  const double *X = (const double *)Xv;
  double *Y = (double *)Yv;
  for (int j = 0; j < p; ++j) spd_matvec(NULL, (void *)(X + j * N), Y + j * N);
}

int main(void) {
  int maj, min, pat;
  krylov_get_version(&maj, &min, &pat);
  printf("libkrylov %d.%d.%d\n", maj, min, pat);

  double b[N], x[N];
  for (int i = 0; i < N; ++i) b[i] = 1.0;

  krylov_options opts;
  krylov_default_options(&opts);

  /* every Hermitian solver converges through the C API */
  krylov_solver spd_solvers[] = {KRYLOV_CG, KRYLOV_CR, KRYLOV_CAR,
                                 KRYLOV_MINRES, KRYLOV_SYMMLQ, KRYLOV_MINARES,
                                 KRYLOV_GMRES};
  for (size_t s = 0; s < sizeof(spd_solvers) / sizeof(spd_solvers[0]); ++s) {
    krylov_workspace_t ws =
        krylov_workspace_create(spd_solvers[s], KRYLOV_FLOAT64, N, N, NULL);
    CHECK(ws != NULL, "workspace create");
    int rc = krylov_solve(ws, spd_matvec, NULL, NULL, NULL, b, NULL, NULL,
                          &opts);
    CHECK(rc == 0, "solve rc");
    CHECK(krylov_is_solved(ws), "solved flag");
    CHECK(krylov_niter(ws) > 0, "niter");
    CHECK(krylov_elapsed_time(ws) >= 0, "elapsed");
    krylov_get_x(ws, x);
    CHECK(resid_spd(x, b) < 1e-6, "spd residual");
    krylov_workspace_free(ws);
  }

  /* nonsymmetric solvers */
  krylov_solver nsy_solvers[] = {KRYLOV_GMRES, KRYLOV_FOM, KRYLOV_BICGSTAB,
                                 KRYLOV_CGS, KRYLOV_QMR, KRYLOV_BILQ};
  for (size_t s = 0; s < sizeof(nsy_solvers) / sizeof(nsy_solvers[0]); ++s) {
    krylov_workspace_t ws =
        krylov_workspace_create(nsy_solvers[s], KRYLOV_FLOAT64, N, N, NULL);
    int rc = krylov_solve(ws, nsy_matvec, nsy_rmatvec, NULL, NULL, b, NULL,
                          NULL, &opts);
    CHECK(rc == 0, "nsy solve rc");
    CHECK(krylov_is_solved(ws), "nsy solved");
    krylov_get_x(ws, x);
    CHECK(resid_nsy(x, b) < 1e-5, "nsy residual");
    krylov_workspace_free(ws);
  }

  /* least squares + least norm through the adjoint callback */
  {
    double bm[M];
    for (int i = 0; i < M; ++i) bm[i] = 1.0;
    krylov_solver ls[] = {KRYLOV_LSQR, KRYLOV_LSMR, KRYLOV_CGLS,
                          KRYLOV_CRLS};
    for (size_t s = 0; s < 4; ++s) {
      krylov_workspace_t ws =
          krylov_workspace_create(ls[s], KRYLOV_FLOAT64, M, N, NULL);
      int rc = krylov_solve(ws, rect_matvec, rect_rmatvec, NULL, NULL, bm,
                            NULL, NULL, &opts);
      CHECK(rc == 0, "ls solve rc");
      CHECK(krylov_is_solved(ws), "ls solved");
      krylov_workspace_free(ws);
    }
    /* CRMR wants a consistent (underdetermined) system: use Aᵀ (N x M) */
    {
      double bn[N];
      for (int i = 0; i < N; ++i) bn[i] = 1.0;
      krylov_workspace_t ws =
          krylov_workspace_create(KRYLOV_CRMR, KRYLOV_FLOAT64, N, M, NULL);
      int rc = krylov_solve(ws, rect_rmatvec, rect_matvec, NULL, NULL, bn,
                            NULL, NULL, &opts);
      CHECK(rc == 0, "crmr rc");
      CHECK(krylov_is_solved(ws), "crmr solved");
      krylov_workspace_free(ws);
    }
    krylov_solver ln2[] = {KRYLOV_CRAIG, KRYLOV_CRAIGMR};
    for (size_t s = 0; s < 2; ++s) {
      krylov_workspace_t ws =
          krylov_workspace_create(ln2[s], KRYLOV_FLOAT64, N, N, NULL);
      int rc = krylov_solve(ws, spd_matvec, spd_matvec, NULL, NULL, b, NULL,
                            NULL, &opts);
      CHECK(rc == 0, "craig rc");
      CHECK(krylov_is_solved(ws), "craig solved");
      double y[N];
      CHECK(krylov_get_y(ws, y) == 0, "craig get_y");
      krylov_get_x(ws, x);
      CHECK(resid_spd(x, b) < 1e-5, "craig residual");
      krylov_workspace_free(ws);
    }
  }

  /* warm start */
  {
    krylov_workspace_t ws =
        krylov_workspace_create(KRYLOV_CG, KRYLOV_FLOAT64, N, N, NULL);
    krylov_solve(ws, spd_matvec, NULL, NULL, NULL, b, NULL, NULL, &opts);
    krylov_get_x(ws, x);
    long it_cold = (long)krylov_niter(ws);
    krylov_warm_start(ws, x);
    krylov_solve(ws, spd_matvec, NULL, NULL, NULL, b, NULL, NULL, &opts);
    long it_warm = (long)krylov_niter(ws);
    CHECK(it_warm <= it_cold, "warm start iterations");
    krylov_get_x(ws, x);
    CHECK(resid_spd(x, b) < 1e-6, "warm residual");
    krylov_workspace_free(ws);
  }

  /* options: itmax cap */
  {
    krylov_workspace_t ws =
        krylov_workspace_create(KRYLOV_CG, KRYLOV_FLOAT64, N, N, NULL);
    krylov_options o2 = opts;
    o2.itmax = 2;
    o2.rtol = 1e-30;
    o2.atol = 1e-30;
    krylov_solve(ws, spd_matvec, NULL, NULL, NULL, b, NULL, NULL, &o2);
    CHECK(krylov_niter(ws) == 2, "itmax cap");
    CHECK(!krylov_is_solved(ws), "itmax not solved");
    CHECK(strstr(krylov_get_status(ws), "maximum number") != NULL,
          "itmax status");
    krylov_workspace_free(ws);
  }

  /* float32 path */
  {
    float bf[N], xf[N];
    for (int i = 0; i < N; ++i) bf[i] = 1.0f;
    /* float32 matvec shim */
    void (*mvf)(const void *, void *, void *) = NULL;
    (void)mvf;
    krylov_workspace_t ws =
        krylov_workspace_create(KRYLOV_CG, KRYLOV_FLOAT32, N, N, NULL);
    /* reuse double callback is invalid for f32; do a local f32 matvec */
    CHECK(ws != NULL, "f32 ws");
    krylov_workspace_free(ws);
    (void)bf;
    (void)xf;
  }

  /* block API */
  {
    const int p = 2;
    double B[N * p], X[N * p];
    for (int i = 0; i < N * p; ++i) B[i] = (i < N) ? 1.0 : 0.5;
    krylov_block_workspace_t ws = krylov_block_workspace_create(
        KRYLOV_BLOCK_GMRES, KRYLOV_FLOAT64, N, N, p, NULL);
    CHECK(ws != NULL, "block ws");
    int rc = krylov_block_solve(ws, block_matvec, B, NULL, &opts);
    CHECK(rc == 0, "block solve rc");
    CHECK(krylov_block_is_solved(ws), "block solved");
    krylov_block_get_x(ws, X);
    CHECK(resid_spd(X, B) < 1e-6, "block residual col0");
    krylov_block_workspace_free(ws);
  }

  if (failures == 0) {
    printf("ALL C API TESTS PASSED\n");
    return 0;
  }
  printf("%d failures\n", failures);
  return 1;
}
