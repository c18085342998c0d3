"""Dense primitives and backend dispatch (TPU analog of the BLAS layer)."""
from . import blas, dispatch  # noqa: F401
