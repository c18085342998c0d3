"""Pallas TPU kernels: fused correlation products (kernels), the γ-scan
(scan), and the active-set transition (transition)."""

from . import kernels  # noqa: F401
from . import scan  # noqa: F401
from . import transition  # noqa: F401
