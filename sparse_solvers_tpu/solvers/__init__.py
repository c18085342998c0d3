"""Solver cores (jit/vmap-safe pure functions)."""
from . import homotopy, irls  # noqa: F401
