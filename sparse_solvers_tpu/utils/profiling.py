"""Profiling & roofline utilities.

The reference's only observability is Google-Benchmark counters
(reference: src/solvers/homotopy_bench.cpp:53); the TPU-native equivalents
are XLA profiler traces and roofline accounting against the chip's peak
FLOP/s and HBM bandwidth (SURVEY.md §5 "Tracing / profiling").
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/sparse_solvers_trace"):
    """Capture a jax.profiler trace around a block.

    View with TensorBoard's profile plugin or xprof. Usage::

        with profiling.trace("/tmp/tr"):
            solver.solve_batch(Y).block_until_ready()
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class ChipSpec:
    """Peak numbers for roofline accounting (per chip)."""
    name: str
    bf16_tflops: float
    hbm_gbps: float

    @property
    def f32_highest_tflops(self) -> float:
        # HIGHEST f32 = 6 bf16 MXU passes
        return self.bf16_tflops / 6

    @property
    def f32_high_tflops(self) -> float:
        return self.bf16_tflops / 3


# Public chip specs (cloud.google.com/tpu/docs/system-architecture).
CHIPS = {
    "v4": ChipSpec("v4", bf16_tflops=275, hbm_gbps=1228),
    "v5e": ChipSpec("v5e", bf16_tflops=197, hbm_gbps=819),
    "v5p": ChipSpec("v5p", bf16_tflops=459, hbm_gbps=2765),
    "v6e": ChipSpec("v6e", bf16_tflops=918, hbm_gbps=1640),
}


def detect_chip() -> ChipSpec | None:
    """Best-effort chip spec for the default device."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for key, spec in CHIPS.items():
        if key in kind.replace(" ", "").replace("lite", "e"):
            return spec
    if "v5" in kind and "lite" in kind:
        return CHIPS["v5e"]
    return None


@dataclasses.dataclass
class Roofline:
    """Measured-vs-peak summary for one op."""
    seconds: float
    flops: float
    bytes: float
    chip: ChipSpec | None

    @property
    def tflops(self) -> float:
        return self.flops / self.seconds / 1e12

    @property
    def gbps(self) -> float:
        return self.bytes / self.seconds / 1e9

    def fraction_of_peak(self, precision: str = "high") -> float | None:
        """max(compute, memory) fraction of the roofline bound."""
        if self.chip is None:
            return None
        peak_f = {"highest": self.chip.f32_highest_tflops,
                  "high": self.chip.f32_high_tflops,
                  "default": self.chip.bf16_tflops}[precision]
        return max(self.tflops / peak_f, self.gbps / self.chip.hbm_gbps)

    def __str__(self):
        s = f"{self.seconds*1e3:.3f} ms, {self.tflops:.2f} TFLOP/s, " \
            f"{self.gbps:.0f} GB/s"
        frac = self.fraction_of_peak()
        if frac is not None:
            s += f", {100*frac:.0f}% of roofline ({self.chip.name})"
        return s


def measure(fn, *args, flops: float = 0, bytes: float = 0,
            reps: int = 10) -> Roofline:
    """Time a jitted callable and report roofline occupancy.

    ``flops``/``bytes`` are the caller's op accounting (e.g. 4·b·m·n and
    m·n·itemsize for a fused correlation).
    """
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return Roofline(seconds=(time.time() - t0) / reps, flops=flops,
                    bytes=bytes, chip=detect_chip())
