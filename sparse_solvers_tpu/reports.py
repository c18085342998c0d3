"""Solver reports — the library's observability API.

The reference exposes exactly two structured reports
(reference: include/ss/policies.h:25-32, :58-71) and the README example
prints error/sparsity/argmax from them (reference: README.md:30-33). These
classes reproduce the field names exactly; they are plain Python values
(converted from device arrays after a solve) for the user-facing API, while
the jitted solver cores carry the pytree variants
(solvers/homotopy.py HomotopyReportArrays, solvers/irls.py IrlsReportArrays).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class HomotopyReport:
    """Mirrors ss::homotopy_report (policies.h:25-32)."""
    iter: int = 0
    solution_error: float = 0.0


@dataclass
class OmpReport:
    """OMP report (beyond-reference solver — no policies.h twin; field
    names follow the house style). ``solution_error`` is the final
    residual norm ‖y − Ax‖₂ — OMP's own convergence criterion — unlike
    the homotopy report's ‖Aᵀ(y−Ax)‖∞."""
    iter: int = 0
    solution_error: float = 0.0


@dataclass
class IrlsReport:
    """Mirrors ss::irls_report (policies.h:58-71).

    ``solution_error`` is the final eps of the reweighting schedule, not a
    residual norm (reference: irls-cpu.cpp:123).
    """
    iter: int = 0
    solution_error: float = 0.0
    spd_failure: bool = False
