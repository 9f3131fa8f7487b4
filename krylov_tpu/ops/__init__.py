from .kops import (
    kdot,
    kdotr,
    knorm,
    knorm_elliptic,
    sym_givens,
    roots_quadratic,
    to_boundary,
)
from .sparse import CSRMatrix, csr_from_dense, csr_from_coo, spmv
