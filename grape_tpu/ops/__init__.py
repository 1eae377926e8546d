from .expm import expm, expm_pade13
from .frechet import expm_frechet, gradgen_step, taylor_grad_step

__all__ = [
    "expm", "expm_pade13", "expm_frechet", "gradgen_step", "taylor_grad_step",
]
