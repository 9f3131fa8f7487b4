/* LSQR on a rectangular system through the C ABI. */
#include <stdio.h>
#include "krylov.h"
#define M 30
#define N 20

static void mv(const void *ud, void *xv, void *yv) {
  (void)ud;
  const double *x = (const double *)xv;
  double *y = (double *)yv;
  for (int i = 0; i < M; ++i) {
    y[i] = 0.0;
    if (i < N) y[i] += (1.0 + 0.1 * i) * x[i];
    if (i - 1 >= 0 && i - 1 < N) y[i] += 0.3 * x[i - 1];
  }
}

static void rmv(const void *ud, void *xv, void *yv) {
  (void)ud;
  const double *x = (const double *)xv;
  double *y = (double *)yv;
  for (int j = 0; j < N; ++j) {
    y[j] = (1.0 + 0.1 * j) * x[j];
    if (j + 1 < M) y[j] += 0.3 * x[j + 1];
  }
}

int main(void) {
  double b[M], x[N];
  for (int i = 0; i < M; ++i) b[i] = 1.0;
  krylov_options opts;
  krylov_default_options(&opts);
  krylov_workspace_t ws =
      krylov_workspace_create(KRYLOV_LSQR, KRYLOV_FLOAT64, M, N, NULL);
  int rc = krylov_solve(ws, mv, rmv, NULL, NULL, b, NULL, NULL, &opts);
  krylov_get_x(ws, x);
  printf("rc=%d solved=%d niter=%lld\n", rc, krylov_is_solved(ws),
         (long long)krylov_niter(ws));
  krylov_workspace_free(ws);
  return rc;
}
