! test_krylov.f90 — Fortran-side checks of the libkrylov ABI (mirrors the
! reference's interfaces/test/Fortran suite).  Compile-gated in CI when
! gfortran is available:
!
!   gfortran -I../include -o test_krylov ../include/krylov.f90 \
!     test_krylov.f90 -L../build -lkrylov -Wl,-rpath,'$ORIGIN/../build'

module test_ops
  use, intrinsic :: iso_c_binding
  implicit none
  integer, parameter :: nn = 50
contains
  subroutine spd_matvec(udata, xp, yp) bind(C)
    type(c_ptr), value :: udata, xp, yp
    real(c_double), pointer :: x(:), y(:)
    integer :: i
    call c_f_pointer(xp, x, [nn])
    call c_f_pointer(yp, y, [nn])
    do i = 1, nn
      y(i) = 4.0d0 * x(i)
      if (i > 1) y(i) = y(i) - x(i - 1)
      if (i < nn) y(i) = y(i) - x(i + 1)
    end do
  end subroutine spd_matvec

  subroutine jacobi(udata, xp, yp) bind(C)
    type(c_ptr), value :: udata, xp, yp
    real(c_double), pointer :: x(:), y(:)
    call c_f_pointer(xp, x, [nn])
    call c_f_pointer(yp, y, [nn])
    y = x / 4.0d0
  end subroutine jacobi
end module test_ops

program test_krylov
  use, intrinsic :: iso_c_binding
  use krylov
  use test_ops
  implicit none

  type(c_ptr) :: ws
  type(krylov_options), target :: opts
  real(c_double), target :: b(nn), x(nn), r(nn)
  integer(c_int) :: rc, maj, mnr, pat
  integer :: failures, i

  failures = 0
  call krylov_get_version(maj, mnr, pat)
  print '(a,i0,a,i0,a,i0)', "libkrylov ", maj, ".", mnr, ".", pat

  call krylov_default_options(opts)
  b = 1.0d0

  ! every SPD solver converges
  block
    integer(c_int) :: solvers(5)
    integer :: s
    solvers = [KRYLOV_CG, KRYLOV_CR, KRYLOV_CAR, KRYLOV_MINRES, &
               KRYLOV_SYMMLQ]
    do s = 1, 5
      ws = krylov_workspace_create(solvers(s), KRYLOV_FLOAT64, &
                                   int(nn, c_int64_t), &
                                   int(nn, c_int64_t), c_null_ptr)
      rc = krylov_solve(ws, c_funloc(spd_matvec), c_null_funptr, &
                        c_null_funptr, c_null_funptr, c_loc(b), &
                        c_null_ptr, c_null_ptr, c_loc(opts))
      if (rc /= 0 .or. krylov_is_solved(ws) == 0) then
        print *, "FAIL: solver enum ", solvers(s)
        failures = failures + 1
      end if
      rc = krylov_get_x(ws, c_loc(x))
      call spd_matvec(c_null_ptr, c_loc(x), c_loc(r))
      if (sqrt(sum((r - b)**2)) > 1.0d-6 * sqrt(sum(b**2))) then
        print *, "FAIL: residual for enum ", solvers(s)
        failures = failures + 1
      end if
      call krylov_workspace_free(ws)
    end do
  end block

  ! preconditioned solve + warm start
  ws = krylov_workspace_create(KRYLOV_CG, KRYLOV_FLOAT64, &
                               int(nn, c_int64_t), int(nn, c_int64_t), &
                               c_null_ptr)
  rc = krylov_solve(ws, c_funloc(spd_matvec), c_null_funptr, &
                    c_funloc(jacobi), c_null_funptr, c_loc(b), &
                    c_null_ptr, c_null_ptr, c_loc(opts))
  if (rc /= 0 .or. krylov_is_solved(ws) == 0) then
    print *, "FAIL: preconditioned cg"
    failures = failures + 1
  end if
  rc = krylov_get_x(ws, c_loc(x))
  rc = krylov_warm_start(ws, c_loc(x))
  rc = krylov_solve(ws, c_funloc(spd_matvec), c_null_funptr, &
                    c_null_funptr, c_null_funptr, c_loc(b), &
                    c_null_ptr, c_null_ptr, c_loc(opts))
  if (krylov_niter(ws) > 2) then
    print *, "FAIL: warm start did not cut iterations"
    failures = failures + 1
  end if
  call krylov_workspace_free(ws)

  ! itmax option honored
  block
    type(krylov_options), target :: o2
    call krylov_default_options(o2)
    o2%itmax = 3
    o2%rtol = 1.0d-14
    o2%atol = 0.0d0
    ws = krylov_workspace_create(KRYLOV_CG, KRYLOV_FLOAT64, &
                                 int(nn, c_int64_t), int(nn, c_int64_t), &
                                 c_null_ptr)
    rc = krylov_solve(ws, c_funloc(spd_matvec), c_null_funptr, &
                      c_null_funptr, c_null_funptr, c_loc(b), &
                      c_null_ptr, c_null_ptr, c_loc(o2))
    if (krylov_niter(ws) /= 3 .or. krylov_is_solved(ws) /= 0) then
      print *, "FAIL: itmax option"
      failures = failures + 1
    end if
    call krylov_workspace_free(ws)
  end block

  if (failures == 0) then
    print *, "ALL FORTRAN TESTS PASSED"
  else
    print *, failures, " failures"
    stop 1
  end if
end program test_krylov
