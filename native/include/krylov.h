/* libkrylov — C ABI for the krylov_tpu native solver core.
 *
 * Mirrors the reference interface layer (interfaces/include/krylov.h):
 * opaque workspaces, callback matvecs, option structs with NaN/0
 * "use default" sentinels, and a parallel krylov_block_* family.
 * Control crosses this boundary twice per iteration per operator apply —
 * the design that makes the library matrix-free from C.
 */
#ifndef KRYLOV_H
#define KRYLOV_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define KRYLOV_VERSION_MAJOR 0
#define KRYLOV_VERSION_MINOR 1
#define KRYLOV_VERSION_PATCH 0

typedef enum {
  KRYLOV_FLOAT32 = 0,
  KRYLOV_FLOAT64 = 1,
  KRYLOV_COMPLEX32 = 2,
  KRYLOV_COMPLEX64 = 3
} krylov_dtype;

typedef enum { KRYLOV_CPU = 0, KRYLOV_TPU = 1 } krylov_device;

/* Solver enum — values match the reference ABI table one-for-one
 * (reference interfaces/scripts/solver_table.jl:7-43; the enum value is
 * the 0-based index in that list and must stay stable). */
typedef enum {
  KRYLOV_CG = 0,
  KRYLOV_CR = 1,
  KRYLOV_SYMMLQ = 2,
  KRYLOV_MINRES = 3,
  KRYLOV_MINRES_QLP = 4,
  KRYLOV_DIOM = 5,
  KRYLOV_DQGMRES = 6,
  KRYLOV_FOM = 7,
  KRYLOV_GMRES = 8,
  KRYLOV_FGMRES = 9,
  KRYLOV_BICGSTAB = 10,
  KRYLOV_CGS = 11,
  KRYLOV_BILQ = 12,
  KRYLOV_QMR = 13,
  KRYLOV_USYMLQ = 14,
  KRYLOV_USYMQR = 15,
  KRYLOV_TRICG = 16,
  KRYLOV_TRIMR = 17,
  KRYLOV_TRILQR = 18,
  KRYLOV_BILQR = 19,
  KRYLOV_LSLQ = 20,
  KRYLOV_LSQR = 21,
  KRYLOV_LSMR = 22,
  KRYLOV_USYMLQR = 23,
  KRYLOV_CGLS = 24,
  KRYLOV_CRLS = 25,
  KRYLOV_CGNE = 26,
  KRYLOV_CRMR = 27,
  KRYLOV_CRAIG = 28,
  KRYLOV_CRAIGMR = 29,
  KRYLOV_LNLQ = 30,
  KRYLOV_GPMR = 31,
  KRYLOV_CAR = 32,
  KRYLOV_MINARES = 33,
  KRYLOV_NUM_SOLVERS = 34
} krylov_solver;

/* Block solvers are a separate enum (reference solver_table.jl:47-50). */
typedef enum {
  KRYLOV_BLOCK_GMRES = 0,
  KRYLOV_BLOCK_MINRES = 1,
  KRYLOV_NUM_BLOCK_SOLVERS = 2
} krylov_block_solver;

/* y <- op(userdata) * x ; op applies the matrix (or preconditioner). */
typedef void (*krylov_matvec)(const void *userdata, void *x, void *y);
/* block variant: X,Y hold p column vectors in column-major order. */
typedef void (*krylov_block_matvec)(const void *userdata, void *X, int p,
                                    void *Y);

typedef struct {
  int64_t memory;  /* basis size for GMRES-type methods (0 = default 20)  */
  int64_t window;  /* error-estimate window (0 = default 5)               */
} krylov_workspace_options;

typedef struct {
  double atol;       /* NaN = default sqrt(eps)  */
  double rtol;       /* NaN = default sqrt(eps)  */
  int64_t itmax;     /* 0 = solver default       */
  int64_t verbose;   /* 0 = quiet                */
  double lambda;     /* regularization (NaN = 0) */
  double tau;        /* tricg/trimr tau (NaN=1)  */
  double nu;         /* tricg/trimr nu (NaN=-1)  */
  double timemax;    /* NaN = unlimited          */
  double radius;     /* trust region (NaN = 0)   */
  int64_t restart;   /* gmres/fom restart flag   */
  int64_t reorthogonalization;
  int64_t linesearch;
} krylov_options;

typedef void *krylov_workspace_t;

/* version / defaults */
void krylov_get_version(int *major, int *minor, int *patch);
void krylov_default_workspace_options(krylov_workspace_options *opts);
void krylov_default_options(krylov_options *opts);

/* workspace lifecycle */
krylov_workspace_t krylov_workspace_create(krylov_solver solver,
                                           krylov_dtype dtype, int64_t m,
                                           int64_t n,
                                           const krylov_workspace_options *opts);
void krylov_workspace_free(krylov_workspace_t ws);

/* solve: A, At (may be NULL when unused), M, N preconditioners (NULL = I).
 * b is the rhs (length m); c the auxiliary vector for two-term methods
 * (shadow vector, second rhs for tricg/trimr/bilqr/trilqr/usymlqr/gpmr;
 * may be NULL where optional).  For KRYLOV_GPMR the `At` callback applies
 * the second operator B (y = B*x), matching the reference's (A,B,b,c)
 * signature through the 4-callback ABI.
 * Error codes: 0 ok, 1 bad argument, 2 missing required callback (At),
 * 3 solver not available, 4 missing required c vector.               */
int krylov_solve(krylov_workspace_t ws, krylov_matvec A, krylov_matvec At,
                 krylov_matvec M, krylov_matvec N, const void *b,
                 const void *c, const void *userdata,
                 const krylov_options *opts);

/* results */
int krylov_get_x(krylov_workspace_t ws, void *x);
int krylov_get_y(krylov_workspace_t ws, void *y);
int krylov_is_solved(krylov_workspace_t ws);
int64_t krylov_niter(krylov_workspace_t ws);
double krylov_elapsed_time(krylov_workspace_t ws);
const char *krylov_get_status(krylov_workspace_t ws);

/* warm start */
int krylov_warm_start(krylov_workspace_t ws, const void *x0);
int krylov_warm_start2(krylov_workspace_t ws, const void *x0, const void *y0);

/* ---- block family (multiple right-hand sides) ---- */
typedef void *krylov_block_workspace_t;

krylov_block_workspace_t krylov_block_workspace_create(
    krylov_block_solver solver, krylov_dtype dtype, int64_t m, int64_t n,
    int64_t p, const krylov_workspace_options *opts);
void krylov_block_workspace_free(krylov_block_workspace_t ws);
int krylov_block_solve(krylov_block_workspace_t ws, krylov_block_matvec A,
                       const void *B, const void *userdata,
                       const krylov_options *opts);
int krylov_block_get_x(krylov_block_workspace_t ws, void *X);
int krylov_block_is_solved(krylov_block_workspace_t ws);
int64_t krylov_block_niter(krylov_block_workspace_t ws);
double krylov_block_elapsed_time(krylov_block_workspace_t ws);
int krylov_block_warm_start(krylov_block_workspace_t ws, const void *X0);

#ifdef __cplusplus
}
#endif

#endif /* KRYLOV_H */
