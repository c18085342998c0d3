"""Linear-algebra components (TPU analogs of reference src/linalg)."""
from . import active_set, cholesky, norms, online_inverse, qr  # noqa: F401
