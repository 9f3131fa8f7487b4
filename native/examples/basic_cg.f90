! basic_cg.f90 — CG on an SPD tridiagonal system through the Fortran
! bindings (mirrors reference interfaces/examples/Fortran/).
!
! Build (when gfortran is available):
!   gfortran -I../include -o basic_cg_f basic_cg.f90 ../include/krylov.f90 \
!     -L../build -lkrylov -Wl,-rpath,'$ORIGIN/../build'

module operators
  use, intrinsic :: iso_c_binding
  implicit none
  integer, parameter :: nsize = 100
contains
  subroutine spd_matvec(udata, xp, yp) bind(C)
    type(c_ptr), value :: udata, xp, yp
    real(c_double), pointer :: x(:), y(:)
    integer :: i
    call c_f_pointer(xp, x, [nsize])
    call c_f_pointer(yp, y, [nsize])
    do i = 1, nsize
      y(i) = 4.0d0 * x(i)
      if (i > 1) y(i) = y(i) - x(i - 1)
      if (i < nsize) y(i) = y(i) - x(i + 1)
    end do
  end subroutine spd_matvec
end module operators

program basic_cg
  use, intrinsic :: iso_c_binding
  use krylov
  use operators
  implicit none

  type(c_ptr) :: ws
  type(krylov_options), target :: opts
  real(c_double), target :: b(nsize), x(nsize)
  integer(c_int) :: rc
  integer :: i

  b = 1.0d0
  call krylov_default_options(opts)

  ws = krylov_workspace_create(KRYLOV_CG, KRYLOV_FLOAT64, &
                               int(nsize, c_int64_t), &
                               int(nsize, c_int64_t), c_null_ptr)
  rc = krylov_solve(ws, c_funloc(spd_matvec), c_null_funptr, &
                    c_null_funptr, c_null_funptr, c_loc(b), c_null_ptr, &
                    c_null_ptr, c_loc(opts))
  if (rc /= 0) then
    print *, "solve failed with code ", rc
    stop 1
  end if
  rc = krylov_get_x(ws, c_loc(x))
  print '(a,i0,a)', "CG converged in ", krylov_niter(ws), " iterations"
  print '(a,f10.6,a,f10.6)', "x(1) = ", x(1), "  x(n) = ", x(nsize)
  call krylov_workspace_free(ws)
end program basic_cg
