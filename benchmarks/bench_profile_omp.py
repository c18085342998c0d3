"""Per-op profile of the batched-OMP driver solve.

Traces one `Omp.solve_batch` at the OMP bench config (4096x8192 k=64
b=256, the slot-space batch driver route) with jax.profiler and prints a
per-op time table aggregated by fusion name — the evidence base for
driver optimization (same harness as bench_profile_headline.py).

Usage:  timeout 900 python benchmarks/bench_profile_omp.py
Env:    SS_PROFILE_PRECISION=default|high (default "default")
Output: stderr table + benchmarks/results/profile_omp_<precision>.json
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import sparse_solvers_tpu as ss
    from benchmarks._common import make_sparse_problem

    M = int(os.environ.get("SS_PROFILE_M", 4096))
    N = int(os.environ.get("SS_PROFILE_N", 8192))
    K = int(os.environ.get("SS_PROFILE_K", 64))
    B = int(os.environ.get("SS_PROFILE_B", 256))
    PRECISION = os.environ.get("SS_PROFILE_PRECISION", "default")
    TOL, MAX_ITER = 1e-2, K + 8
    A, X0, Y = make_sparse_problem(M, N, K, B, seed=0)
    solver = ss.Omp(A, engine="jax", precision=PRECISION)
    plan = solver.explain(batch=B, max_iterations=MAX_ITER)
    assert plan["corr"] == "driver", plan
    Y = jax.device_put(Y)

    X, rep = solver.solve_batch(Y, tolerance=TOL, max_iterations=MAX_ITER)
    iters = np.asarray(rep.iter)
    print(f"warmup done; iters mean={iters.mean():.1f} max={iters.max()}",
          file=sys.stderr)

    logdir = "/tmp/ss_profile_omp"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    X, rep = solver.solve_batch(Y, tolerance=TOL, max_iterations=MAX_ITER)
    np.asarray(rep.iter)  # fence (tunneled-device block_until_ready trap)
    jax.profiler.stop_trace()

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {logdir}"
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(paths[0], "rb").read())

    agg: dict[str, list[float]] = {}
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                if "XLA Modules" in line.name:
                    continue
                if "XLA Ops" in line.name or "Steps" not in line.name:
                    agg.setdefault(ev.name, []).append(ev.duration_ns)
    rows = []
    for name, durs in agg.items():
        rows.append((sum(durs) / 1e6, len(durs), name))
    rows.sort(reverse=True)
    total_ms = sum(r[0] for r in rows)
    print(f"\n=== op table (total {total_ms:.1f} ms across "
          f"{sum(r[1] for r in rows)} events) ===", file=sys.stderr)
    out_rows = []
    for tot, cnt, name in rows[:40]:
        per = tot / cnt * 1e3
        print(f"{tot:9.2f} ms  x{cnt:5d}  ({per:8.1f} us/ev)  {name[:110]}",
              file=sys.stderr)
        out_rows.append({"total_ms": round(tot, 3), "count": cnt,
                         "name": name})

    os.makedirs(os.path.join(repo, "benchmarks", "results"), exist_ok=True)
    fname = f"profile_omp_{PRECISION}.json"
    with open(os.path.join(repo, "benchmarks", "results", fname), "w") as f:
        json.dump({"config": {"m": M, "n": N, "k": K, "b": B,
                              "max_iter": MAX_ITER,
                              "precision": PRECISION},
                   "iters_mean": float(iters.mean()),
                   "iters_max": int(iters.max()),
                   "ops": out_rows}, f, indent=1)
    print(f"wrote benchmarks/results/{fname}", file=sys.stderr)


if __name__ == "__main__":
    main()
