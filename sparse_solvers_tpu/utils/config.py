"""Library configuration and version.

TPU-native analog of the reference's generated config header
(reference: include/ss/ss_config.h.in:8-19) — carries the library name and
semantic version. There is no BLAS runtime filename analog: backend selection
is handled by :mod:`sparse_solvers_tpu.ops.dispatch`.
"""

from __future__ import annotations

LIB_NAME = "sparse-solvers-tpu"

VERSION_MAJOR = 0
VERSION_MINOR = 2
VERSION_PATCH = 0


def version() -> list[int]:
    """Return ``[major, minor, patch]``.

    Mirrors the reference Python binding's ``version()``
    (reference: bindings/python/sparsesolvers/binding.cpp:42-45,117).
    """
    return [VERSION_MAJOR, VERSION_MINOR, VERSION_PATCH]
