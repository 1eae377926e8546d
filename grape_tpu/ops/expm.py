"""Batched matrix exponential for TPU.

TPU-native replacement for the reference's ``ExpProp`` propagator
(QuantumPropagators; used e.g. at ``/root/reference/README.md:38``).  The
reference computes ``exp(-i H dt)`` per time step via a dense matrix
exponential; here we provide a batched scaling-and-squaring Padé-13 expm that
maps onto the MXU: all matmuls are batched over the leading (trajectory /
control) axes, and the squaring loop uses a single *shared* scaling parameter
``s`` (max over the batch) so the loop count is one traced scalar rather than
per-matrix dynamic control flow.

Unlike a generic expm, this is never differentiated through: GRAPE computes
exact per-step gradients via the Fréchet kernels in ``frechet.py``.
"""

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["expm", "expm_pade13"]

# Padé-13 numerator coefficients (Higham 2005). float64 exact.
_B = (
    64764752532480000.0,
    32382376266240000.0,
    7771770303897600.0,
    1187353796428800.0,
    129060195264000.0,
    10559470521600.0,
    670442572800.0,
    33522128640.0,
    1323241920.0,
    40840800.0,
    960960.0,
    16380.0,
    182.0,
    1.0,
)
_THETA13_F64 = 5.371920351148152
# Single precision theta for Padé-13 (Higham 2005, Table 2.3 single column):
_THETA13_F32 = 3.925724783138660


def _theta13(dtype):
    if dtype in (jnp.complex128, jnp.float64):
        return _THETA13_F64
    return _THETA13_F32


def expm_pade13(A):
    """Padé-13 approximant of expm(A) without scaling (valid for small norm)."""
    d = A.shape[-1]
    ident = jnp.eye(d, dtype=A.dtype)
    A2 = A @ A
    A4 = A2 @ A2
    A6 = A2 @ A4
    b = _B
    U = A @ (
        A6 @ (b[13] * A6 + b[11] * A4 + b[9] * A2)
        + b[7] * A6 + b[5] * A4 + b[3] * A2 + b[1] * ident
    )
    V = (
        A6 @ (b[12] * A6 + b[10] * A4 + b[8] * A2)
        + b[6] * A6 + b[4] * A4 + b[2] * A2 + b[0] * ident
    )
    return jnp.linalg.solve(V - U, V + U)


def expm(A, max_squarings=32):
    """Matrix exponential of a batch of square matrices ``A (..., d, d)``.

    Scaling-and-squaring with Padé-13; the scaling exponent ``s`` is shared
    across the batch (max of the per-matrix 1-norms), so the squaring loop is
    a single ``fori_loop`` with a traced trip count.
    """
    A = jnp.asarray(A)
    norm = jnp.max(jnp.sum(jnp.abs(A), axis=-2))  # max 1-norm over batch
    theta = _theta13(A.dtype)
    # s = max(0, ceil(log2(norm / theta)))
    s = jnp.maximum(
        0.0, jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-300) / theta))
    ).astype(jnp.int32)
    s = jnp.minimum(s, max_squarings)
    scale = jnp.exp2(-s.astype(jnp.float32)).astype(
        jnp.real(A).dtype if jnp.issubdtype(A.dtype, jnp.complexfloating) else A.dtype
    )
    E = expm_pade13(A * scale)

    def square(_, M):
        return M @ M

    return lax.fori_loop(0, s, square, E)
