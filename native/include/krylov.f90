! krylov.f90 — Fortran iso_c_binding interface to libkrylov.
!
! Mirrors native/include/krylov.h one declaration for one (the reference
! ships interfaces/include/krylov.f90 with the same structure).  Usage:
!
!   use krylov
!   type(c_ptr) :: ws
!   ws = krylov_workspace_create(KRYLOV_CG, KRYLOV_FLOAT64, n, n, c_null_ptr)
!   rc = krylov_solve(ws, c_funloc(my_matvec), c_null_funptr, &
!                     c_null_funptr, c_null_funptr, c_loc(b), c_null_ptr, &
!                     c_null_ptr, c_loc(opts))
!
! Matvec callbacks are bind(C) subroutines:
!   subroutine my_matvec(udata, x, y) bind(C)
!     type(c_ptr), value :: udata, x, y
!
! This file is hand-maintained and compile-checked in CI when gfortran is
! available (not present in the build image used here).

module krylov
  use, intrinsic :: iso_c_binding
  implicit none

  ! ---- version ----------------------------------------------------------
  integer(c_int), parameter :: KRYLOV_VERSION_MAJOR = 0
  integer(c_int), parameter :: KRYLOV_VERSION_MINOR = 1
  integer(c_int), parameter :: KRYLOV_VERSION_PATCH = 0

  ! ---- enums (values match krylov.h / the reference solver table) -------
  integer(c_int), parameter :: KRYLOV_FLOAT32 = 0
  integer(c_int), parameter :: KRYLOV_FLOAT64 = 1
  integer(c_int), parameter :: KRYLOV_COMPLEX32 = 2
  integer(c_int), parameter :: KRYLOV_COMPLEX64 = 3

  integer(c_int), parameter :: KRYLOV_CPU = 0
  integer(c_int), parameter :: KRYLOV_TPU = 1

  integer(c_int), parameter :: KRYLOV_CG = 0
  integer(c_int), parameter :: KRYLOV_CR = 1
  integer(c_int), parameter :: KRYLOV_SYMMLQ = 2
  integer(c_int), parameter :: KRYLOV_MINRES = 3
  integer(c_int), parameter :: KRYLOV_MINRES_QLP = 4
  integer(c_int), parameter :: KRYLOV_DIOM = 5
  integer(c_int), parameter :: KRYLOV_DQGMRES = 6
  integer(c_int), parameter :: KRYLOV_FOM = 7
  integer(c_int), parameter :: KRYLOV_GMRES = 8
  integer(c_int), parameter :: KRYLOV_FGMRES = 9
  integer(c_int), parameter :: KRYLOV_BICGSTAB = 10
  integer(c_int), parameter :: KRYLOV_CGS = 11
  integer(c_int), parameter :: KRYLOV_BILQ = 12
  integer(c_int), parameter :: KRYLOV_QMR = 13
  integer(c_int), parameter :: KRYLOV_USYMLQ = 14
  integer(c_int), parameter :: KRYLOV_USYMQR = 15
  integer(c_int), parameter :: KRYLOV_TRICG = 16
  integer(c_int), parameter :: KRYLOV_TRIMR = 17
  integer(c_int), parameter :: KRYLOV_TRILQR = 18
  integer(c_int), parameter :: KRYLOV_BILQR = 19
  integer(c_int), parameter :: KRYLOV_LSLQ = 20
  integer(c_int), parameter :: KRYLOV_LSQR = 21
  integer(c_int), parameter :: KRYLOV_LSMR = 22
  integer(c_int), parameter :: KRYLOV_USYMLQR = 23
  integer(c_int), parameter :: KRYLOV_CGLS = 24
  integer(c_int), parameter :: KRYLOV_CRLS = 25
  integer(c_int), parameter :: KRYLOV_CGNE = 26
  integer(c_int), parameter :: KRYLOV_CRMR = 27
  integer(c_int), parameter :: KRYLOV_CRAIG = 28
  integer(c_int), parameter :: KRYLOV_CRAIGMR = 29
  integer(c_int), parameter :: KRYLOV_LNLQ = 30
  integer(c_int), parameter :: KRYLOV_GPMR = 31
  integer(c_int), parameter :: KRYLOV_CAR = 32
  integer(c_int), parameter :: KRYLOV_MINARES = 33
  integer(c_int), parameter :: KRYLOV_NUM_SOLVERS = 34

  integer(c_int), parameter :: KRYLOV_BLOCK_GMRES = 0
  integer(c_int), parameter :: KRYLOV_BLOCK_MINRES = 1
  integer(c_int), parameter :: KRYLOV_NUM_BLOCK_SOLVERS = 2

  ! ---- option structs ----------------------------------------------------
  type, bind(C) :: krylov_workspace_options
    integer(c_int64_t) :: memory
    integer(c_int64_t) :: window
  end type krylov_workspace_options

  type, bind(C) :: krylov_options
    real(c_double)     :: atol
    real(c_double)     :: rtol
    integer(c_int64_t) :: itmax
    integer(c_int64_t) :: verbose
    real(c_double)     :: lambda
    real(c_double)     :: tau
    real(c_double)     :: nu
    real(c_double)     :: timemax
    real(c_double)     :: radius
    integer(c_int64_t) :: restart
    integer(c_int64_t) :: reorthogonalization
    integer(c_int64_t) :: linesearch
  end type krylov_options

  ! ---- abstract callback interfaces --------------------------------------
  abstract interface
    subroutine krylov_matvec(udata, x, y) bind(C)
      import :: c_ptr
      type(c_ptr), value :: udata
      type(c_ptr), value :: x
      type(c_ptr), value :: y
    end subroutine krylov_matvec

    subroutine krylov_block_matvec(udata, x, p, y) bind(C)
      import :: c_ptr, c_int
      type(c_ptr), value :: udata
      type(c_ptr), value :: x
      integer(c_int), value :: p
      type(c_ptr), value :: y
    end subroutine krylov_block_matvec
  end interface

  ! ---- C entry points -----------------------------------------------------
  interface

    subroutine krylov_get_version(major, minor, patch) &
        bind(C, name="krylov_get_version")
      import :: c_int
      integer(c_int), intent(out) :: major, minor, patch
    end subroutine krylov_get_version

    subroutine krylov_default_workspace_options(opts) &
        bind(C, name="krylov_default_workspace_options")
      import :: krylov_workspace_options
      type(krylov_workspace_options), intent(out) :: opts
    end subroutine krylov_default_workspace_options

    subroutine krylov_default_options(opts) &
        bind(C, name="krylov_default_options")
      import :: krylov_options
      type(krylov_options), intent(out) :: opts
    end subroutine krylov_default_options

    function krylov_workspace_create(solver, dtype, m, n, opts) &
        result(ws) bind(C, name="krylov_workspace_create")
      import :: c_ptr, c_int, c_int64_t
      integer(c_int), value :: solver
      integer(c_int), value :: dtype
      integer(c_int64_t), value :: m, n
      type(c_ptr), value :: opts
      type(c_ptr) :: ws
    end function krylov_workspace_create

    subroutine krylov_workspace_free(ws) &
        bind(C, name="krylov_workspace_free")
      import :: c_ptr
      type(c_ptr), value :: ws
    end subroutine krylov_workspace_free

    function krylov_solve(ws, a, at, m, n, b, c, udata, opts) &
        result(rc) bind(C, name="krylov_solve")
      import :: c_ptr, c_funptr, c_int
      type(c_ptr), value :: ws
      type(c_funptr), value :: a, at, m, n
      type(c_ptr), value :: b, c, udata, opts
      integer(c_int) :: rc
    end function krylov_solve

    function krylov_get_x(ws, x) result(rc) bind(C, name="krylov_get_x")
      import :: c_ptr, c_int
      type(c_ptr), value :: ws
      type(c_ptr), value :: x
      integer(c_int) :: rc
    end function krylov_get_x

    function krylov_get_y(ws, y) result(rc) bind(C, name="krylov_get_y")
      import :: c_ptr, c_int
      type(c_ptr), value :: ws
      type(c_ptr), value :: y
      integer(c_int) :: rc
    end function krylov_get_y

    function krylov_is_solved(ws) result(rc) &
        bind(C, name="krylov_is_solved")
      import :: c_ptr, c_int
      type(c_ptr), value :: ws
      integer(c_int) :: rc
    end function krylov_is_solved

    function krylov_niter(ws) result(n) bind(C, name="krylov_niter")
      import :: c_ptr, c_int64_t
      type(c_ptr), value :: ws
      integer(c_int64_t) :: n
    end function krylov_niter

    function krylov_elapsed_time(ws) result(t) &
        bind(C, name="krylov_elapsed_time")
      import :: c_ptr, c_double
      type(c_ptr), value :: ws
      real(c_double) :: t
    end function krylov_elapsed_time

    function krylov_get_status(ws) result(s) &
        bind(C, name="krylov_get_status")
      import :: c_ptr
      type(c_ptr), value :: ws
      type(c_ptr) :: s
    end function krylov_get_status

    function krylov_warm_start(ws, x0) result(rc) &
        bind(C, name="krylov_warm_start")
      import :: c_ptr, c_int
      type(c_ptr), value :: ws
      type(c_ptr), value :: x0
      integer(c_int) :: rc
    end function krylov_warm_start

    function krylov_warm_start2(ws, x0, y0) result(rc) &
        bind(C, name="krylov_warm_start2")
      import :: c_ptr, c_int
      type(c_ptr), value :: ws
      type(c_ptr), value :: x0, y0
      integer(c_int) :: rc
    end function krylov_warm_start2

    ! ---- block family ----------------------------------------------------

    function krylov_block_workspace_create(solver, dtype, m, n, p, opts) &
        result(ws) bind(C, name="krylov_block_workspace_create")
      import :: c_ptr, c_int, c_int64_t
      integer(c_int), value :: solver
      integer(c_int), value :: dtype
      integer(c_int64_t), value :: m, n, p
      type(c_ptr), value :: opts
      type(c_ptr) :: ws
    end function krylov_block_workspace_create

    subroutine krylov_block_workspace_free(ws) &
        bind(C, name="krylov_block_workspace_free")
      import :: c_ptr
      type(c_ptr), value :: ws
    end subroutine krylov_block_workspace_free

    function krylov_block_solve(ws, a, b, udata, opts) result(rc) &
        bind(C, name="krylov_block_solve")
      import :: c_ptr, c_funptr, c_int
      type(c_ptr), value :: ws
      type(c_funptr), value :: a
      type(c_ptr), value :: b, udata, opts
      integer(c_int) :: rc
    end function krylov_block_solve

    function krylov_block_get_x(ws, x) result(rc) &
        bind(C, name="krylov_block_get_x")
      import :: c_ptr, c_int
      type(c_ptr), value :: ws
      type(c_ptr), value :: x
      integer(c_int) :: rc
    end function krylov_block_get_x

    function krylov_block_is_solved(ws) result(rc) &
        bind(C, name="krylov_block_is_solved")
      import :: c_ptr, c_int
      type(c_ptr), value :: ws
      integer(c_int) :: rc
    end function krylov_block_is_solved

    function krylov_block_niter(ws) result(n) &
        bind(C, name="krylov_block_niter")
      import :: c_ptr, c_int64_t
      type(c_ptr), value :: ws
      integer(c_int64_t) :: n
    end function krylov_block_niter

    function krylov_block_elapsed_time(ws) result(t) &
        bind(C, name="krylov_block_elapsed_time")
      import :: c_ptr, c_double
      type(c_ptr), value :: ws
      real(c_double) :: t
    end function krylov_block_elapsed_time

    function krylov_block_warm_start(ws, x0) result(rc) &
        bind(C, name="krylov_block_warm_start")
      import :: c_ptr, c_int
      type(c_ptr), value :: ws
      type(c_ptr), value :: x0
      integer(c_int) :: rc
    end function krylov_block_warm_start

  end interface

end module krylov
