! least_squares.f90 — LSQR on an overdetermined system through the
! Fortran bindings (mirrors reference interfaces/examples/Fortran/).
!
! Build (when gfortran is available):
!   gfortran -I../include -o least_squares_f ../include/krylov.f90 \
!     least_squares.f90 -L../build -lkrylov -Wl,-rpath,'$ORIGIN/../build'

module ls_ops
  use, intrinsic :: iso_c_binding
  implicit none
  integer, parameter :: mrow = 60, ncol = 40
contains
  ! tall bidiagonal-ish A (m×n)
  subroutine amv(udata, xp, yp) bind(C)
    type(c_ptr), value :: udata, xp, yp
    real(c_double), pointer :: x(:), y(:)
    integer :: i
    call c_f_pointer(xp, x, [ncol])
    call c_f_pointer(yp, y, [mrow])
    y = 0.0d0
    do i = 1, mrow
      if (i <= ncol) y(i) = y(i) + (2.0d0 + 0.01d0 * i) * x(i)
      if (i - 1 >= 1 .and. i - 1 <= ncol) y(i) = y(i) + 0.5d0 * x(i - 1)
    end do
  end subroutine amv

  subroutine atmv(udata, xp, yp) bind(C)
    type(c_ptr), value :: udata, xp, yp
    real(c_double), pointer :: x(:), y(:)
    integer :: j
    call c_f_pointer(xp, x, [mrow])
    call c_f_pointer(yp, y, [ncol])
    do j = 1, ncol
      y(j) = (2.0d0 + 0.01d0 * j) * x(j)
      if (j + 1 <= mrow) y(j) = y(j) + 0.5d0 * x(j + 1)
    end do
  end subroutine atmv
end module ls_ops

program least_squares
  use, intrinsic :: iso_c_binding
  use krylov
  use ls_ops
  implicit none

  type(c_ptr) :: ws
  type(krylov_options), target :: opts
  real(c_double), target :: b(mrow), x(ncol), r(mrow), atr(ncol)
  integer(c_int) :: rc
  integer :: i

  do i = 1, mrow
    b(i) = 1.0d0 - 0.005d0 * i
  end do
  call krylov_default_options(opts)

  ws = krylov_workspace_create(KRYLOV_LSQR, KRYLOV_FLOAT64, &
                               int(mrow, c_int64_t), &
                               int(ncol, c_int64_t), c_null_ptr)
  rc = krylov_solve(ws, c_funloc(amv), c_funloc(atmv), c_null_funptr, &
                    c_null_funptr, c_loc(b), c_null_ptr, c_null_ptr, &
                    c_loc(opts))
  if (rc /= 0) then
    print *, "solve failed: ", rc
    stop 1
  end if
  rc = krylov_get_x(ws, c_loc(x))
  call amv(c_null_ptr, c_loc(x), c_loc(r))
  r = b - r
  call atmv(c_null_ptr, c_loc(r), c_loc(atr))
  print '(a,i0,a)', "LSQR converged in ", krylov_niter(ws), " iterations"
  print '(a,es10.3)', "normal-equations residual |A'r| = ", &
      sqrt(sum(atr**2))
  call krylov_workspace_free(ws)
end program least_squares
