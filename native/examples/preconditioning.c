/* Jacobi-preconditioned CG through the C ABI (mirrors the reference's
 * interfaces/examples/C/preconditioning.c): the M callback applies the
 * inverse diagonal of a variable-coefficient SPD tridiagonal system. */
#include <math.h>
#include <stdio.h>

#include "krylov.h"

#define N 100

/* SPD tridiagonal with growing diagonal: diag 4+i/10, offdiag -1 */
static void matvec(const void *ud, void *xv, void *yv) {
  (void)ud;
  const double *x = (const double *)xv;
  double *y = (double *)yv;
  for (int i = 0; i < N; ++i) {
    y[i] = (4.0 + 0.1 * i) * x[i];
    if (i > 0) y[i] -= x[i - 1];
    if (i < N - 1) y[i] -= x[i + 1];
  }
}

/* Jacobi preconditioner: y = D^{-1} x */
static void jacobi(const void *ud, void *xv, void *yv) {
  (void)ud;
  const double *x = (const double *)xv;
  double *y = (double *)yv;
  for (int i = 0; i < N; ++i) y[i] = x[i] / (4.0 + 0.1 * i);
}

int main(void) {
  double b[N], x[N];
  for (int i = 0; i < N; ++i) b[i] = 1.0;

  krylov_options opts;
  krylov_default_options(&opts);

  krylov_workspace_t ws =
      krylov_workspace_create(KRYLOV_CG, KRYLOV_FLOAT64, N, N, NULL);

  /* unpreconditioned */
  krylov_solve(ws, matvec, NULL, NULL, NULL, b, NULL, NULL, &opts);
  printf("CG            : %lld iterations (%s)\n",
         (long long)krylov_niter(ws), krylov_get_status(ws));

  /* Jacobi-preconditioned */
  krylov_solve(ws, matvec, NULL, jacobi, NULL, b, NULL, NULL, &opts);
  printf("CG + Jacobi   : %lld iterations (%s)\n",
         (long long)krylov_niter(ws), krylov_get_status(ws));
  krylov_get_x(ws, x);
  printf("x[0] = %.6f, x[%d] = %.6f\n", x[0], N - 1, x[N - 1]);

  krylov_workspace_free(ws);
  return 0;
}
