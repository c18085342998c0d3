"""Multi-device layer: mesh construction, sharded solvers, multi-host
wiring. The solver façades' ``mesh=`` argument (api.py) is the
construct-once object form over these functional entry points."""

from .sharding import (  # noqa: F401
    DATA_AXIS,
    ROW_AXIS,
    cosamp_sharded,
    gram_replicated,
    homotopy_sharded,
    irls_cg_sharded,
    irls_sharded,
    irls_sharded_from_a,
    make_mesh,
    omp_sharded,
    qr_sharded,
    shard_inputs,
    update_column_sharded,
)
