"""Child program for the two-process jax.distributed test.

Launched twice by tests/test_distributed.py (process_id 0 and 1), each
process owning 4 virtual CPU devices; together they form one 8-device
SPMD job. The child joins the cluster through the framework's own
``parallel.distributed.initialize`` wrapper, lays the (data=2, row=4)
global mesh, runs a row+batch-sharded homotopy solve, and asserts its
*addressable* shards equal the single-process unsharded solve of the
same inputs (both processes hold the full numpy problem, so each can
compute the reference locally).

Exit code 0 plus a final "DIST_CHILD_OK" line is the success contract.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
# isolate from any outer compile-cache / platform settings
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparse_solvers_tpu.parallel import distributed as dist  # noqa: E402
from sparse_solvers_tpu.parallel import sharding as sh  # noqa: E402


def main() -> int:
    coordinator, process_id = sys.argv[1], int(sys.argv[2])
    assert dist.is_initialized() is False
    ok = dist.initialize(coordinator_address=coordinator,
                         num_processes=2, process_id=process_id)
    assert ok is True
    assert dist.is_initialized() is True
    # idempotent re-entry must be a no-op returning True
    assert dist.initialize() is True
    assert dist.process_count() == 2
    assert dist.process_index() == process_id
    assert jax.device_count() == 8
    assert len(jax.local_devices()) == 4

    # (data=2, row=4): jax.devices() is process-major and make_mesh fills
    # the grid row-major, so each data row is exactly one process's
    # devices — the placement policy global_mesh documents.
    mesh = dist.global_mesh(n_data=2)
    assert mesh.shape == {"data": 2, "row": 4}

    rng = np.random.RandomState(0)
    m, n, k, batch = 32, 16, 2, 4
    A = rng.randn(m, n).astype(np.float64)
    A /= np.linalg.norm(A, axis=0)
    X0 = np.zeros((batch, n))
    for b in range(batch):
        sup = rng.choice(n, k, replace=False)
        X0[b, sup] = rng.uniform(0.5, 1.0, k)
    Y = X0 @ A.T

    # multi-process global arrays must be built from per-host shards
    # (device_put of a host array onto a cross-process sharding is the
    # single-process path shard_inputs takes)
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put_global(arr, spec):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])

    Ad = put_global(A, P("row", None))
    Yd = put_global(Y, P("data", "row"))
    X, rep = sh.homotopy_sharded(mesh, Ad, Yd, 1e-6, 12)

    # single-process reference on the same inputs, computed locally
    import sparse_solvers_tpu as ss
    Xref, repref = ss.Homotopy(A, engine="jax").solve_batch(
        Y, tolerance=1e-6, max_iterations=12)
    Xref = np.asarray(Xref)

    for shard in X.addressable_shards:
        got = np.asarray(shard.data)
        want = Xref[shard.index]
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)
    # per-lane reports are data-sharded the same way
    for shard in rep.iter.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      np.asarray(repref.iter)[shard.index])
    # recovery sanity on this host's lanes
    for shard in X.addressable_shards:
        got = np.asarray(shard.data)
        want0 = X0[shard.index[0]]
        np.testing.assert_allclose(got, want0, atol=1e-6)

    print("DIST_CHILD_OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
