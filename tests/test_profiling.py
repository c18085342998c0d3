"""utils/profiling — roofline accounting sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from sparse_solvers_tpu.utils import profiling


def test_measure_reports_consistent_rates():
    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((128, 128), jnp.float32)
    r = profiling.measure(f, x, flops=2 * 128**3, bytes=3 * 128 * 128 * 4,
                          reps=3)
    assert r.seconds > 0
    np.testing.assert_allclose(r.tflops, r.flops / r.seconds / 1e12)
    np.testing.assert_allclose(r.gbps, r.bytes / r.seconds / 1e9)
    s = str(r)
    assert "TFLOP/s" in s and "GB/s" in s


def test_chip_specs_precisions():
    v5e = profiling.CHIPS["v5e"]
    assert v5e.f32_highest_tflops * 6 == v5e.bf16_tflops
    assert v5e.f32_high_tflops * 3 == v5e.bf16_tflops
    r = profiling.Roofline(seconds=1e-3, flops=1e9, bytes=1e6, chip=v5e)
    frac = r.fraction_of_peak("highest")
    assert frac is not None and frac > 0


def test_trace_context_manager(tmp_path):
    with profiling.trace(str(tmp_path / "tr")) as d:
        jnp.ones(8).sum().block_until_ready()
    assert (tmp_path / "tr").exists()
