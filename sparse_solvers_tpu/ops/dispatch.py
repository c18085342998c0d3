"""Runtime backend dispatch.

The reference picks a compute backend at first use: kernelpp probes the CPU
for AVX and dlopens a HASWELL or NEHALEM OpenBLAS accordingly (reference:
src/linalg/blas_wrapper.cpp:27-66, cmake/BlasUtils.cmake:20-50). The
TPU-native analog is much simpler — XLA compiles per TPU generation
automatically — but a genuine runtime choice remains: the hot correlation
kernels can run either as hand-written Pallas kernels (TPU) or through plain
XLA ops (CPU backend, interpret mode, or when Pallas is unavailable).

This module makes that choice once, lazily, at first use, exactly like the
reference's ``cblas::configure`` (blas_wrapper.cpp:39-49) — except that a
failed probe degrades gracefully to the XLA path rather than ``abort()``-ing
the process.
"""

from __future__ import annotations

import os
from typing import Literal

import jax

Backend = Literal["pallas", "xla"]

_backend: Backend | None = None


def _probe() -> Backend:
    forced = os.environ.get("SS_TPU_BACKEND", "").lower()
    if forced in ("pallas", "xla"):
        return forced  # type: ignore[return-value]
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover - no devices at all
        return "xla"
    # Pallas TPU kernels only target real TPU devices; everywhere else
    # (CPU meshes used in tests, GPU) the XLA lowering is used.
    if platform in ("tpu", "axon"):
        return "pallas"
    return "xla"


def backend() -> Backend:
    """Return the active compute backend, probing on first use."""
    global _backend
    if _backend is None:
        _backend = _probe()
    return _backend


def set_backend(name: Backend | None) -> None:
    """Force a backend ("pallas" or "xla"), or None to re-probe lazily."""
    global _backend
    if name is not None and name not in ("pallas", "xla"):
        raise ValueError(f"Unknown backend {name!r}; expected 'pallas' or 'xla'")
    _backend = name
