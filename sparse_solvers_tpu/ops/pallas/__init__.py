"""Pallas TPU kernels (fused correlation products, active-set update)."""

from . import kernels  # noqa: F401
from . import active_set  # noqa: F401
