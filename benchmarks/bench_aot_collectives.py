"""AOT collective-structure evidence for the sharded overlapped drivers.

No multi-chip hardware is reachable in this environment, but the real
TPU compiler is: this script AOT-compiles the sharded batch-native
homotopy and OMP solves (overlap_blocks=4) against a v5e:2x4 8-chip
topology (jax.experimental.topologies) and reports, for each:

  * the StableHLO while-body all_reduce count (the S independent
    column-block collectives the overlap emits — the dataflow an
    async-collective scheduler hides behind the next block's gemm);
  * the compiled loop collective's operand count (XLA's combiner merges
    the S block all-reduces into ONE variadic all-reduce whose operands
    remain the per-block partial products);
  * the TPU backend's collective_algorithm_config (the ring emitter
    actually chosen — docs/design.md §9 records the round-4 findings);
  * for overlap_mode="ppermute" (round 5): the while-body
    collective-permute count — the hand-pipelined collective-matmul
    ring's S−1 chained permutes, which the all-reduce combiner cannot
    merge (each is data-dependent on the previous step's accumulation),
    interleaved with the local column-block gemms.

Run:  JAX_PLATFORMS=cpu is NOT needed — the script forces the cpu
client itself and compiles against the AOT topology.
    timeout 900 python benchmarks/bench_aot_collectives.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def loop_collective_permutes(txt: str) -> int:
    """collective-permute(-start) defs reachable from while-loop body
    computations (transitive closure over referenced computations — the
    tests' _loop_body_permutes parse)."""
    comps, name, buf = {}, None, []
    for l in txt.splitlines():
        m = re.match(r"\s*(%[\w.\-]+)\s*\(.*\{\s*$", l)
        if m and name is None:
            name = m.group(1)
            buf = []
            continue
        if name is not None:
            if l.strip() == "}":
                comps[name] = "\n".join(buf)
                name = None
            else:
                buf.append(l)
    bodies = set(re.findall(r"body=(%[\w.\-]+)", txt))
    total = 0
    for body in bodies:
        seen, frontier = set(), [body]
        while frontier:
            c = frontier.pop()
            if c in seen or c not in comps:
                continue
            seen.add(c)
            for ref in re.findall(r"(%[\w.\-]+)", comps[c]):
                if ref in comps and ref not in seen and ref not in bodies:
                    frontier.append(ref)
        text = "\n".join(comps[c] for c in seen)
        total += len(re.findall(r"= .*collective-permute(?:-start)?\(",
                                text))
    return total


def total_collective_permutes(txt: str) -> int:
    return len(re.findall(r"= .*collective-permute(?:-start)?\(", txt))


def async_permute_pairs(txt: str) -> int:
    """collective-permute-start definitions — each is an ASYNC permute
    whose done the scheduler can place after independent local work
    (the overlap all-reduce never got from this toolchain: round-4
    evidence showed zero all-reduce-start pairs)."""
    return len(re.findall(r"= .*\bcollective-permute-start\(", txt))


def loop_allreduce_operands(txt: str) -> int:
    loop_ars = [l for l in txt.splitlines()
                if re.search(r"= .*all-reduce\(", l) and "while" in l]
    return sum(l.split("all-reduce(")[1].split(")")[0].count("%")
               for l in loop_ars)


def backend_config(txt: str) -> str:
    for l in txt.splitlines():
        if "collective_algorithm_config" in l:
            m = re.search(r'collective_algorithm_config[^}]*', l)
            return m.group(0)[:160]
    return "(none found)"


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from sparse_solvers_tpu.parallel import sharding as sh

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    devs = np.asarray(topo.devices).reshape(2, 4)
    mesh = Mesh(devs, (sh.DATA_AXIS, sh.ROW_AXIS))

    m, n, b = 64, 512, 8
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.randn(m, n).astype(np.float32))
    Y = jnp.asarray(rng.randn(b, m).astype(np.float32))

    cases = {
        "homotopy_overlap4": lambda a, y: sh.homotopy_sharded(
            mesh, a, y, 1e-2, 8, gram=True, batch_native=True,
            overlap_blocks=4, overlap_mode="psum"),
        "omp_overlap4": lambda a, y: sh.omp_sharded(
            mesh, a, y, 1e-2, 8, batch_native=True, overlap_blocks=4,
            overlap_mode="psum"),
        "homotopy_ppermute": lambda a, y: sh.homotopy_sharded(
            mesh, a, y, 1e-2, 8, gram=True, batch_native=True,
            overlap_mode="ppermute"),
        "omp_ppermute": lambda a, y: sh.omp_sharded(
            mesh, a, y, 1e-2, 8, batch_native=True,
            overlap_mode="ppermute"),
    }
    for name, f in cases.items():
        low = jax.jit(f).lower(A, Y)
        s = low.as_text()
        txt = low.compile().as_text()
        print(json.dumps({
            "bench": "aot_collectives", "case": name,
            "topology": "v5e:2x4",
            "stablehlo_all_reduce": s.count("stablehlo.all_reduce"),
            "stablehlo_collective_permute":
                s.count("stablehlo.collective_permute"),
            "loop_allreduce_operands": loop_allreduce_operands(txt),
            "compiled_collective_permutes": total_collective_permutes(txt),
            "loop_collective_permutes": loop_collective_permutes(txt),
            "async_permute_pairs": async_permute_pairs(txt),
            "backend": backend_config(txt),
        }), flush=True)


if __name__ == "__main__":
    main()
