from .sharding import (
    make_mesh,
    shard_vector,
    shard_dia,
    sharded_dia_operator,
    halo_dia_spmv,
)
from .pipelined import pipelined_cg
