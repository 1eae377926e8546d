from .transmon import (
    transmon_qutrit_problem, two_transmon_cz_problem,
    transmon_ensemble_trajectories,
)
from .tls import tls_problem

__all__ = [
    "tls_problem", "transmon_qutrit_problem", "two_transmon_cz_problem",
    "transmon_ensemble_trajectories",
]
