"""Multi-host wiring helper (parallel/distributed.py).

Real multi-process runs need multiple hosts; these tests pin the
single-host contracts: the unconditional `initialize()` call is a
no-op outside a cluster environment, the helpers report single-process
values, and `global_mesh` lays the (data, row) mesh over the global
device list (8 virtual CPU devices from conftest).
"""

import jax
import numpy as np

from sparse_solvers_tpu.parallel import distributed as dist
from sparse_solvers_tpu.parallel import sharding as sh


def test_initialize_noop_on_single_host(monkeypatch):
    for v in dist._CLUSTER_ENV_VARS + ("JAX_NUM_PROCESSES",
                                       "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(v, raising=False)
    assert dist.initialize() is False
    assert dist.is_initialized() is False  # nothing was started


def test_process_helpers_single_host():
    assert dist.process_index() == 0
    assert dist.process_count() == 1


def test_global_mesh_covers_all_devices():
    mesh = dist.global_mesh()
    assert mesh.shape == {"data": 1, "row": jax.device_count()}
    mesh2 = dist.global_mesh(n_data=2)
    assert mesh2.shape == {"data": 2, "row": jax.device_count() // 2}
    # the mesh composes with the sharded solvers
    rng = np.random.RandomState(0)
    A = rng.randn(16, 8).astype(np.float32)
    Y = rng.randn(2, 16).astype(np.float32)
    Ad, Yd = sh.shard_inputs(mesh2, A, Y)
    X, rep = sh.homotopy_sharded(mesh2, Ad, Yd, 0.1, 8)
    assert X.shape == (2, 8)
