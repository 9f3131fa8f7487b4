/* test_fortran_abi.c — compiler-free executable check of the Fortran
 * binding surface (reference analogue: interfaces/test/Fortran/ runs the
 * compiled bindings; this image has no Fortran compiler, so the binding
 * CONTRACT is verified instead): every symbol include/krylov.f90 binds
 * with bind(C, name="...") must resolve in libkrylov.so, and the entry
 * points the Fortran examples call are exercised through the same C ABI
 * (c_int / c_int64_t / c_double kinds) the iso_c_binding interfaces
 * declare.
 *
 * The symbol list is extracted from krylov.f90 at build time (Makefile
 * rule build/fortran_abi_syms.h), so a binding added to the .f90 without
 * a matching export fails this test.
 */
#include <dlfcn.h>
#include <stdio.h>
#include <stdint.h>
#include <string.h>

#include "krylov.h"

static const char *syms[] = {
#include "fortran_abi_syms.h"
};

/* the CSR matvec callback shape krylov.f90 documents:
 *   subroutine my_matvec(udata, x, y) bind(C)
 *     type(c_ptr), value :: udata, x, y                                  */
static void matvec_tridiag(const void *udata, void *x_, void *y_) {
  int64_t n = *(const int64_t *)udata;
  const double *x = (const double *)x_;
  double *y = (double *)y_;
  for (int64_t i = 0; i < n; ++i) {
    y[i] = 4.0 * x[i];
    if (i > 0) y[i] -= x[i - 1];
    if (i + 1 < n) y[i] -= x[i + 1];
  }
}

int main(void) {
  void *lib = dlopen("./build/libkrylov.so", RTLD_NOW);
  if (!lib) lib = dlopen("./libkrylov.so", RTLD_NOW);
  if (!lib) {
    fprintf(stderr, "FAIL: cannot dlopen libkrylov.so: %s\n", dlerror());
    return 1;
  }
  size_t nsyms = sizeof(syms) / sizeof(syms[0]);
  size_t missing = 0;
  for (size_t i = 0; i < nsyms; ++i) {
    if (!dlsym(lib, syms[i])) {
      fprintf(stderr, "FAIL: Fortran-bound symbol %s not exported\n",
              syms[i]);
      ++missing;
    }
  }
  if (missing) return 1;
  printf("fortran-abi: %zu bind(C) symbols resolved\n", nsyms);

  /* exercise the exact call sequence examples/basic_cg.f90 performs,
   * with the kinds the interfaces declare (int, int64_t, double). */
  int64_t n = 64;
  krylov_workspace_options wopts;
  krylov_options opts;
  krylov_default_workspace_options(&wopts);
  krylov_default_options(&opts);
  void *ws = krylov_workspace_create(KRYLOV_CG, KRYLOV_FLOAT64, n, n,
                                     &wopts);
  if (!ws) { fprintf(stderr, "FAIL: workspace_create\n"); return 1; }
  double b[64], x[64];
  for (int i = 0; i < 64; ++i) b[i] = 1.0;
  int rc = krylov_solve(ws, matvec_tridiag, NULL, NULL, NULL, b, NULL, &n,
                        &opts);
  if (rc != 0) { fprintf(stderr, "FAIL: solve rc=%d\n", rc); return 1; }
  if (!krylov_is_solved(ws)) { fprintf(stderr, "FAIL: !solved\n"); return 1; }
  rc = krylov_get_x(ws, x);
  if (rc != 0) { fprintf(stderr, "FAIL: get_x rc=%d\n", rc); return 1; }
  /* residual check in the caller, like the Fortran example does */
  double y[64], rn = 0.0, bn = 0.0;
  matvec_tridiag(&n, x, y);
  for (int i = 0; i < 64; ++i) {
    double r = b[i] - y[i];
    rn += r * r;
    bn += b[i] * b[i];
  }
  if (!(rn <= 1e-12 * bn)) {
    fprintf(stderr, "FAIL: residual %g\n", rn / bn);
    return 1;
  }
  printf("fortran-abi: basic_cg call sequence OK (niter=%lld)\n",
         (long long)krylov_niter(ws));
  krylov_workspace_free(ws);
  return 0;
}
