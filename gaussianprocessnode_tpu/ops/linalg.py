"""Dense linear-algebra primitives (L0 layer).

TPU-native equivalents of the reference's LinearAlgebra usage
(``fastcholesky``, ``cholinv``, triangular solves, ``jdotavx`` SIMD dot —
reference: helper_functions/gp_helperfunction.jl:125-131 and the
``KuuL \\ x`` / ``Uv * x`` patterns in GPnode/UniSGPnode.jl).

Everything here is a pure jittable function; XLA lowers the matmuls and
triangular solves onto the MXU, so no manual cache pools (the reference's
``GPCache``) are needed.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..config import JITTER_KUU


def jittered(A: jax.Array, jitter: float = JITTER_KUU) -> jax.Array:
    """A + jitter*I (reference: `Kuu + 1e-8*I` pattern)."""
    return A + jitter * jnp.eye(A.shape[-1], dtype=A.dtype)


def chol_lower(A: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Lower Cholesky factor, optionally with added jitter.

    Equivalent of the reference's ``fastcholesky(Kuu).L``.
    """
    if jitter:
        A = jittered(A, jitter)
    return jnp.linalg.cholesky(A)


def chol_upper(A: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Upper Cholesky factor (reference's ``cholesky(Rv).U``)."""
    return chol_lower(A, jitter).mT


def tri_solve_lower(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve L X = B with L lower triangular (reference: ``KuuL \\ B``)."""
    return jax.scipy.linalg.solve_triangular(L, B, lower=True)


def tri_solve_upper(U: jax.Array, B: jax.Array) -> jax.Array:
    """Solve U X = B with U upper triangular."""
    return jax.scipy.linalg.solve_triangular(U, B, lower=False)


def chol_solve(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve A X = B given the lower Cholesky factor L of A.

    Equivalent of ``KuuL' \\ (KuuL \\ B)`` (reference: UniSGPnode.jl:189).
    """
    return tri_solve_upper(L.mT, tri_solve_lower(L, B))


def cholinv(A: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Inverse via Cholesky (reference: ReactiveMP ``cholinv``)."""
    L = chol_lower(A, jitter)
    return chol_solve(L, jnp.eye(A.shape[-1], dtype=A.dtype))


def logdet_from_chol(L: jax.Array) -> jax.Array:
    """log det(A) from the lower Cholesky factor of A."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def jdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Flat dot product (reference: ``jdotavx``, gp_helperfunction.jl:125-131).

    On TPU the VPU/MXU handle the reduction; no SIMD macro needed.
    """
    return jnp.vdot(a, b)


def quad_form(U: jax.Array, x: jax.Array) -> jax.Array:
    """‖U x‖² = xᵀ Uᵀ U x (the reference's ``dot(β,β)`` with β = Uv*B)."""
    y = U @ x
    return jnp.vdot(y, y)


def sym(A: jax.Array) -> jax.Array:
    """Symmetrize (guards accumulation error before Cholesky)."""
    return 0.5 * (A + A.mT)


@partial(jax.jit, static_argnames=())
def rv_chol_upper(mu_v: jax.Array, Sigma_v: jax.Array) -> jax.Array:
    """Uv = chol(Σ_v + μ_v μ_vᵀ).U — the reference's amortized statistic
    (GPnode/UniSGPnode.jl:62-73)."""
    Rv = Sigma_v + jnp.outer(mu_v, mu_v)
    return chol_upper(sym(Rv))


def solve_psd(A: jax.Array, B: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Solve A X = B for symmetric PSD A via Cholesky."""
    L = chol_lower(A, jitter)
    return chol_solve(L, B)


def kron(A: jax.Array, B: jax.Array) -> jax.Array:
    """Kronecker product (reference: ``kron!`` in MultiSGPnode.jl:306)."""
    return jnp.kron(A, B)


def block_trace_products(Rv: jax.Array, S: jax.Array, D: int, M: int) -> jax.Array:
    """Ψ4[i,j] = <Rv_block[i,j], Sᵀ> for a (DM,DM) matrix viewed as D×D grid
    of M×M blocks (reference: create_blockmatrix + `sum(Rv_i .* Ψ2')`,
    MultiSGPnode.jl:397)."""
    blocks = Rv.reshape(D, M, D, M)
    return jnp.einsum("imjn,mn->ij", blocks, S)


def sum_blocks_weighted(Rv: jax.Array, W: jax.Array, D: int, M: int) -> jax.Array:
    """Σ_{ij} W[i,j] * Rv_block[i,j] — an (M,M) matrix
    (reference: `sum(create_blockmatrix(Σ_v,D,M) .* W)`, MultiSGPnode.jl:180)."""
    blocks = Rv.reshape(D, M, D, M)
    return jnp.einsum("imjn,ij->mn", blocks, W)


def sum_diagonal_blocks(V: jax.Array, M: int) -> jax.Array:
    """Σ_i V[block i of rows, column i] — an (M,) vector
    (reference: sum_diagonal_M, derivative_helper.jl:119-122)."""
    D = V.shape[1]
    return jnp.einsum("imi->m", V.reshape(D, M, D))
