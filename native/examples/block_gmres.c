/* Block GMRES with 4 right-hand sides through the C ABI (mirrors the
 * reference's interfaces/examples/C/block_gmres.c). */
#include <math.h>
#include <stdio.h>

#include "krylov.h"

#define N 80
#define P 4

/* nonsymmetric tridiagonal: diag 4, sub -2, super -1 */
static void block_matvec(const void *ud, void *Xv, int p, void *Yv) {
  (void)ud;
  const double *X = (const double *)Xv;
  double *Y = (double *)Yv;
  for (int j = 0; j < p; ++j) {
    const double *x = X + j * N;
    double *y = Y + j * N;
    for (int i = 0; i < N; ++i) {
      y[i] = 4.0 * x[i];
      if (i > 0) y[i] -= 2.0 * x[i - 1];
      if (i < N - 1) y[i] -= x[i + 1];
    }
  }
}

int main(void) {
  double B[N * P], X[N * P];
  for (int j = 0; j < P; ++j)
    for (int i = 0; i < N; ++i) B[j * N + i] = 1.0 + 0.1 * j;

  krylov_workspace_options wopts;
  krylov_default_workspace_options(&wopts);
  wopts.memory = 10;

  krylov_options opts;
  krylov_default_options(&opts);

  krylov_block_workspace_t ws = krylov_block_workspace_create(
      KRYLOV_BLOCK_GMRES, KRYLOV_FLOAT64, N, N, P, &wopts);
  int rc = krylov_block_solve(ws, block_matvec, B, NULL, &opts);
  printf("block GMRES: rc=%d, %lld iterations, solved=%d\n", rc,
         (long long)krylov_block_niter(ws), krylov_block_is_solved(ws));
  krylov_block_get_x(ws, X);

  /* residual of the first column */
  double Y[N * P];
  block_matvec(NULL, X, P, Y);
  double s = 0;
  for (int i = 0; i < N; ++i) {
    double d = B[i] - Y[i];
    s += d * d;
  }
  printf("col-0 residual = %.3e\n", sqrt(s));

  krylov_block_workspace_free(ws);
  return 0;
}
