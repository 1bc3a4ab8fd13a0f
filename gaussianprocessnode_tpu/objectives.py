"""Hyperparameter-learning objectives (L4 layer).

JAX-native replacement of helper_functions/derivative_helper.jl: the batched
negative log backward messages over θ, differentiated with ``jax.grad``
instead of ForwardDiff dual sweeps.

The reference loops data with per-datum triangular solves
(derivative_helper.jl:23-39); here each objective is a handful of batched
GEMMs/solves over the whole minibatch — the form XLA tiles onto the MXU.
"""

import jax
import jax.numpy as jnp

from .ops.linalg import chol_lower, cholinv, spd_inverse, tri_solve_lower
from .ops.psi import psi_batch_expected_multi, psi_batch_expected_uni
from .config import JITTER_KUU_SSM

__all__ = [
    "neg_log_backwardmess_fast",
    "neg_log_backwardmess_uncertain",
    "neg_log_backwardmess_multi",
    "grad_fast",
    "grad_uncertain",
    "grad_multi",
]


def neg_log_backwardmess_fast(theta, *, kernel, Xu, X, y, mu_v, Uv, w, kuu_jitter: float = 0.0):
    """Batched known-input hyperparameter loss
    (reference: derivative_helper.jl:23-39):

        −Σᵢ [ −½w kxxᵢ + ½w‖Lu⁻¹kᵢ‖² − ½w‖Uv kᵢ‖² + w yᵢ⟨μ_v, kᵢ⟩ ]

    with kᵢ = K(Xu, xᵢ). X is (N,Din), y (N,), Uv the upper Cholesky of Rv.
    """
    Kuu = kernel.kuu(theta, Xu, jitter=kuu_jitter)
    Lu = chol_lower(Kuu)
    kxx = kernel.diag(theta, X)
    Kux = kernel(theta, Xu, X)  # (M, N)
    alpha = tri_solve_lower(Lu, Kux)
    beta = Uv @ Kux
    llh = (
        -0.5 * w * jnp.sum(kxx)
        + 0.5 * w * jnp.sum(alpha * alpha)
        - 0.5 * w * jnp.sum(beta * beta)
        + w * jnp.dot(y, Kux.T @ mu_v)
    )
    return -llh


def neg_log_backwardmess_uncertain(
    theta, *, kernel, Xu, y, qx_means, qx_vars, mu_v, Uv, w, method
):
    """Uncertain-input loss (reference: derivative_helper.jl:42-52):

        −Σᵢ [ w yᵢ⟨Ψ1ᵢ, μ_v⟩ − ½w (Ψ0ᵢ + tr(Ψ2ᵢ(UvᵀUv − Kuu⁻¹))) ]
    """
    Kuu_inv = cholinv(kernel.kuu(theta, Xu), jitter=JITTER_KUU_SSM)
    A = Uv.T @ Uv - Kuu_inv
    psi0, psi1, Kp, wq = psi_batch_expected_uni(kernel, theta, Xu, method, qx_means, qx_vars)
    # Σᵢ tr(Ψ2ᵢ A) = Σ_{i,p} w_p kᵢₚᵀ A kᵢₚ
    AK = jnp.einsum("mq,qnp->mnp", A, Kp)
    tr_terms = jnp.einsum("mnp,mnp,p->n", Kp, AK, wq)
    llh = jnp.sum(w * y * jnp.einsum("mn,m->n", psi1, mu_v) - 0.5 * w * (psi0 + tr_terms))
    return -llh


def neg_log_backwardmess_multi(
    theta, *, kernel, Xu, y_means, qx_means, qx_covs, sumRv_W, mu_v, W, method
):
    """Multivariate (C = I) hyperparameter loss
    (reference: derivative_helper.jl:92-106):

        −Σᵢ [ −½tr(W)(Ψ0ᵢ − ⟨Kuu⁻¹,Ψ2ᵢ⟩) + ⟨ΣdiagVᵢ, Ψ1ᵢ⟩ − ½⟨sumRv_W, Ψ2ᵢ⟩ ]

    with Vᵢ = μ_v yᵢᵀ W and sumRv_W = Σ_blocks Rv_blk ⊙ W precomputed.
    y_means (N,D); qx_means (N,Din); qx_covs (N,Din,Din); mu_v (M·D,).
    """
    M = Xu.shape[0]
    D = y_means.shape[1]
    tr_W = jnp.trace(W)
    Kuu_inv = cholinv(kernel.kuu(theta, Xu), jitter=JITTER_KUU_SSM)
    psi0, psi1, Kp, wq = psi_batch_expected_multi(kernel, theta, Xu, method, qx_means, qx_covs)
    # sumdiagV_i = Σ_d (μ_v yᵢᵀ W)[block d, d] = Σ_d μ_v^(d) (yᵢᵀW)_d : (N, M)
    mu_blocks = mu_v.reshape(D, M)
    yW = y_means @ W  # (N, D)
    sumdiagV = yW @ mu_blocks  # (N, M)
    lin_terms = jnp.einsum("nm,mn->n", sumdiagV, psi1)
    # trace terms: ⟨A, Ψ2ᵢ⟩ with A = tr(W)·Kuu⁻¹·(−1)… combine both Ψ2 contractions
    A = 0.5 * tr_W * Kuu_inv - 0.5 * sumRv_W  # ⟨A,Ψ2ᵢ⟩ enters +; see below
    AK = jnp.einsum("mq,qnp->mnp", A, Kp)
    tr_terms = jnp.einsum("mnp,mnp,p->n", Kp, AK, wq)
    llh = jnp.sum(-0.5 * tr_W * psi0 + tr_terms + lin_terms)
    return -llh


def neg_log_backwardmess_gram(
    theta, *, kernel, Xu, X, y, mu_v, Rv, w,
    kuu_inv_warm=None, ns_iters: int = 30, kuu_jitter: float = 0.0,
):
    """Factorization-free form of :func:`neg_log_backwardmess_fast` for TPU
    hot loops: the per-datum triangular solves collapse into trace forms

        −Σᵢ llhᵢ = −[ −½w Σkxxᵢ + ½w·tr(Kuu⁻¹S) − ½w·tr(Rv·S) + w·yᵀKuxᵀμ_v ]

    with S = Kux·Kuxᵀ (one GEMM) and Kuu⁻¹ by warm-started Newton–Schulz
    (matmul-only, analytic VJP). Returns ``(loss, Kuu_inv)`` so callers can
    carry the warm start. Mathematically identical to the reference objective
    (derivative_helper.jl:23-39) since ‖Uv k‖² = kᵀ Rv k.
    """
    hi = jax.lax.Precision.HIGHEST
    Kuu = kernel.kuu(theta, Xu, jitter=kuu_jitter)
    Kuu_inv = spd_inverse(Kuu, warm=kuu_inv_warm, iters=ns_iters)
    kxx = kernel.diag(theta, X)
    Kux = kernel(theta, Xu, X)
    S = jnp.matmul(Kux, Kux.T, precision=hi)
    llh = (
        -0.5 * w * jnp.sum(kxx)
        + 0.5 * w * jnp.sum(Kuu_inv * S)
        - 0.5 * w * jnp.sum(Rv * S)
        + w * jnp.dot(y, jnp.matmul(Kux.T, mu_v, precision=hi))
    )
    return -llh, Kuu_inv


grad_fast = jax.grad(neg_log_backwardmess_fast)
grad_uncertain = jax.grad(neg_log_backwardmess_uncertain)
grad_multi = jax.grad(neg_log_backwardmess_multi)
