from .transmon import (
    transmon_qutrit_problem, two_transmon_cz_problem,
    transmon_ensemble_trajectories, two_transmon_cz_ensemble_problem,
    two_transmon_subspace_gate_problem,
)
from .tls import tls_problem, tls_xgate_problem
from .open import dissipative_tls_problem

__all__ = [
    "tls_problem", "tls_xgate_problem", "transmon_qutrit_problem",
    "two_transmon_cz_problem", "two_transmon_cz_ensemble_problem",
    "two_transmon_subspace_gate_problem",
    "transmon_ensemble_trajectories", "dissipative_tls_problem",
]
