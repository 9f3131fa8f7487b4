/* Minimal libkrylov usage: CG on a 1-D Laplacian via a callback matvec
 * (reference interfaces/examples/C/basic_cg.c pattern). */
#include <stdio.h>
#include "krylov.h"
#define N 100

static void laplacian(const void *ud, void *xv, void *yv) {
  (void)ud;
  const double *x = (const double *)xv;
  double *y = (double *)yv;
  for (int i = 0; i < N; ++i) {
    y[i] = 2.0 * x[i];
    if (i > 0) y[i] -= x[i - 1];
    if (i < N - 1) y[i] -= x[i + 1];
  }
}

int main(void) {
  double b[N], x[N];
  for (int i = 0; i < N; ++i) b[i] = 1.0;
  krylov_options opts;
  krylov_default_options(&opts);
  krylov_workspace_t ws =
      krylov_workspace_create(KRYLOV_CG, KRYLOV_FLOAT64, N, N, NULL);
  int rc = krylov_solve(ws, laplacian, NULL, NULL, NULL, b, NULL, NULL, &opts);
  krylov_get_x(ws, x);
  printf("rc=%d solved=%d niter=%lld status=%s\n", rc, krylov_is_solved(ws),
         (long long)krylov_niter(ws), krylov_get_status(ws));
  krylov_workspace_free(ws);
  return rc;
}
