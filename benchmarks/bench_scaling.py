"""Multi-device scaling benchmark — row-sharded homotopy over a mesh.

The reference has no distributed mode (SURVEY.md §2.4); this measures the
framework's scaling design: A row-partitioned over the mesh's "row" axis,
signals over "data", one psum per correlation product. On a CPU host this
exercises a virtual device mesh (XLA_FLAGS=--xla_force_host_platform_
device_count=8); on a TPU slice it uses real chips over ICI.

One JSON line per mesh shape:
  {"bench": "scaling", "devices": D, "mesh": "(data, row)",
   "solves_per_sec": ..., "efficiency_vs_1dev": ...}

Run:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/bench_scaling.py --quick
"""

from __future__ import annotations

import argparse
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    from sparse_solvers_tpu.parallel import sharding as sh

    m, n, k, batch = ((256, 512, 8, 8) if args.quick
                      else (2048, 4096, 32, 32))
    max_iter = 2 * k

    rng = np.random.RandomState(0)
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    X = np.zeros((batch, n), np.float32)
    for b in range(batch):
        sup = rng.choice(n, k, replace=False)
        X[b, sup] = rng.uniform(0.5, 1.0, k)
    Y = (X @ A.T).astype(np.float32)

    ndev = len(jax.devices())
    base = None
    d = 1
    while d <= ndev:
        mesh = sh.make_mesh(n_row=d, n_data=1, devices=jax.devices()[:d])
        Ad, Yd = sh.shard_inputs(mesh, A, Y)
        run = jax.jit(lambda a, y: sh.homotopy_sharded(
            mesh, a, y, tolerance=1e-2, max_iterations=max_iter))
        Xs, rep = run(Ad, Yd)
        jax.block_until_ready(Xs)
        t0 = time.time()
        Xs, rep = run(Ad, Yd)
        jax.block_until_ready(Xs)
        dt = time.time() - t0
        sps = batch / dt
        if base is None:
            base = sps
        print(json.dumps({
            "bench": "scaling", "devices": d, "mesh": "(data=1, row=%d)" % d,
            "solves_per_sec": round(sps, 3),
            "efficiency_vs_1dev": round(sps / (base * d), 3)}), flush=True)
        d *= 2


if __name__ == "__main__":
    sys.exit(main())
