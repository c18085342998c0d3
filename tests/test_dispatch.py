"""Runtime backend dispatch (ops/dispatch.py) — the kernelpp analog."""

import os

import pytest

from sparse_solvers_tpu.ops import dispatch


@pytest.fixture(autouse=True)
def _reset():
    dispatch.set_backend(None)
    yield
    dispatch.set_backend(None)
    os.environ.pop("SS_TPU_BACKEND", None)


def test_probe_returns_valid_backend():
    assert dispatch.backend() in ("pallas", "xla")


def test_forced_by_env():
    os.environ["SS_TPU_BACKEND"] = "xla"
    dispatch.set_backend(None)
    assert dispatch.backend() == "xla"


def test_set_backend_overrides_and_validates():
    dispatch.set_backend("pallas")
    assert dispatch.backend() == "pallas"
    with pytest.raises(ValueError):
        dispatch.set_backend("cuda")


def test_cpu_platform_uses_xla():
    # the suite runs on the CPU backend (conftest), so the probe must not
    # pick pallas compiled kernels
    dispatch.set_backend(None)
    assert dispatch.backend() == "xla"


def test_readme_quickstart_runs_as_written():
    """The README's quickstart must work verbatim."""
    import numpy as np
    import sparse_solvers_tpu as ss

    N = 10
    np.random.seed(101)
    A = np.random.randn(N, N).astype(np.float32) + np.eye(N,
                                                         dtype=np.float32)
    x_true = np.zeros(N, np.float32)
    x_true[2] = 1.0
    y = A @ x_true

    solver = ss.Homotopy(A)
    x, report = solver.solve(y, tolerance=0.1)
    assert int(np.argmax(x)) == 2
    assert float(np.mean(x == 0)) >= 0.8
    assert report.iter >= 1


def test_native_disabled_forced_engine_raises(monkeypatch):
    """SS_NATIVE_DISABLE=1 + engine="native": explain() still reports
    the native plan (a solve would attempt it — _route_native's probe
    contract), but the solve itself raises RuntimeError instead of
    silently degrading to the jax engine."""
    import numpy as np
    import sparse_solvers_tpu as ss

    monkeypatch.setenv("SS_NATIVE_DISABLE", "1")
    A = np.identity(5, np.float32)
    solver = ss.Homotopy(A, engine="native")
    assert solver.explain()["engine"] == "native"
    with pytest.raises(RuntimeError, match="native engine requested"):
        solver.solve(np.eye(5, dtype=np.float32)[2])
    # auto quietly degrades to jax on the same problem
    x, rep = ss.Homotopy(A).solve(np.eye(5, dtype=np.float32)[2])
    assert rep.solution_error == 0.0
