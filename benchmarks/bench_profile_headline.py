"""Per-op profile of the headline batched-homotopy solve.

Traces one `solve_batch` at the headline config (4096x8192 k=64 b=256) with
jax.profiler, parses the XPlane with jax.profiler.ProfileData, and prints a
per-op time table aggregated by fusion name — the round-2 "attribute the
176 ms/batch" evidence (VERDICT.md next-round item 1).

Usage:  timeout 900 python benchmarks/bench_profile_headline.py
Output: stderr table + benchmarks/results/profile_headline.json
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
    from bench import make_problem

    # shape overrides profile other regimes (SS_PROFILE_GRAM=0 +
    # SS_PROFILE_M/N/... = the gram-free large-n driver)
    M = int(os.environ.get("SS_PROFILE_M", 4096))
    N = int(os.environ.get("SS_PROFILE_N", 8192))
    K = int(os.environ.get("SS_PROFILE_K", 64))
    B = int(os.environ.get("SS_PROFILE_B", 256))
    TOL, MAX_ITER = 1e-2, int(os.environ.get("SS_PROFILE_MAX_ITER", 128))
    KMAX = int(os.environ.get("SS_PROFILE_KMAX", (3 * K) // 2))
    GRAM = os.environ.get("SS_PROFILE_GRAM") != "0"
    # SS_PROFILE_PRECISION=default|certified re-ranks the phases in the
    # one-pass regime (the bench.py headline since the certified mode)
    PRECISION = os.environ.get("SS_PROFILE_PRECISION")
    A, Y = make_problem(M, N, K, B)
    solver = ss.Homotopy(A, k_max=KMAX, precision=PRECISION, gram=GRAM)
    Y = jax.device_put(Y)
    if not GRAM:
        os.environ["SS_BATCH_NATIVE"] = "1"  # profile the gram-free driver

    X, rep = solver.solve_batch(Y, tolerance=TOL, max_iterations=MAX_ITER)
    iters = np.asarray(rep.iter)
    print(f"warmup done; iters mean={iters.mean():.1f} max={iters.max()}",
          file=sys.stderr)

    logdir = "/tmp/ss_profile_headline"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    X, rep = solver.solve_batch(Y, tolerance=TOL, max_iterations=MAX_ITER)
    np.asarray(rep.iter)  # fence (tunneled-device block_until_ready trap)
    jax.profiler.stop_trace()

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {logdir}"
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(paths[0], "rb").read())

    # Aggregate XLA-op durations on the device plane(s).
    agg: dict[str, list[float]] = {}
    total_ns = 0
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name and "XLA Modules" not in line.name:
                # on some versions the op line is named after the op stream
                pass
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns
                if "XLA Modules" in line.name:
                    continue
                if "XLA Ops" in line.name or "Steps" not in line.name:
                    agg.setdefault(name, []).append(dur)
    # keep only leaf op events (heuristic: names with '.' fusions or dots)
    rows = []
    for name, durs in agg.items():
        tot = sum(durs) / 1e6
        rows.append((tot, len(durs), name))
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
    # per-Pallas-kernel device times (the authoritative kernel
    # measurements — loop-harness micro-benches on this tunneled device
    # carry ~±0.1 ms/iteration of loop-carry churn, bench_kernels.py)
    kernels = {}
    for tot, cnt, name in rows:
        for key in ("find_max_gamma_fused", "transition"):
            if name.lstrip("%").startswith(key):
                kernels.setdefault(key, {"total_ms": round(tot, 3),
                                         "count": cnt,
                                         "us_per_call": round(tot / cnt
                                                              * 1e3, 1)})
    for key, v in kernels.items():
        print(f"kernel {key}: {v['us_per_call']} us/call x{v['count']}",
              file=sys.stderr)

    os.makedirs(os.path.join(repo, "benchmarks", "results"), exist_ok=True)
    # precision-suffixed file so the recorded 3-pass profile (the round-2
    # roofline evidence) is never overwritten by a re-profiling run
    fname = ("profile_headline.json" if not PRECISION
             else f"profile_headline_{PRECISION}.json")
    if not GRAM:
        fname = fname.replace(".json", "_gramfree.json")
    with open(os.path.join(repo, "benchmarks", "results", fname), "w") as f:
        json.dump({"config": {"m": M, "n": N, "k": K, "b": B,
                              "max_iter": MAX_ITER, "k_max": KMAX,
                              "gram": GRAM,
                              "precision": PRECISION or "high"},
                   "iters_mean": float(iters.mean()),
                   "iters_max": int(iters.max()),
                   "pallas_kernels": kernels,
                   "ops": out_rows}, f, indent=1)
    print(f"wrote benchmarks/results/{fname}", file=sys.stderr)


if __name__ == "__main__":
    main()
