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

from .ops.linalg import (chol_lower, effective_jitter, spd_inverse,
                         tri_solve_lower)
from .ops.psi import psi_batch_expected_multi, psi_batch_expected_uni
from .config import JITTER_KUU, JITTER_KUU_SSM

__all__ = [
    "neg_log_backwardmess_fast",
    "neg_log_backwardmess_uncertain",
    "neg_log_backwardmess_multi",
    "grad_fast",
    "grad_uncertain",
    "grad_multi",
]


def neg_log_backwardmess_fast(theta, *, kernel, Xu, X, y, mu_v, Uv, w,
                              kuu_jitter: float = JITTER_KUU):
    """Batched known-input hyperparameter loss
    (reference: derivative_helper.jl:23-39):

        −Σᵢ [ −½w kxxᵢ + ½w‖Lu⁻¹kᵢ‖² − ½w‖Uv kᵢ‖² + w yᵢ⟨μ_v, kᵢ⟩ ]

    with kᵢ = K(Xu, xᵢ). X is (N,Din), y (N,), Uv the upper Cholesky of Rv.
    ``kuu_jitter`` defaults to the reference's own +1e-8·I on Kuu (its
    notebooks jitter every Kuu; an unjittered Cholesky can NaN during
    L-BFGS linesearch excursions to large lengthscales, silently wasting
    the epoch's θ update — the sibling objectives already jitter).
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

    The Kuu⁻¹ contraction is computed as ‖Lu⁻¹kₚ‖² (triangular solve), NOT
    via the explicit inverse: near-duplicate inducing inputs make κ(Kuu)
    ~1/jitter, where the inverse-form value AND its autodiff gradient are
    pure rounding noise while the solve form stays exact (the reference's
    explicit `inv(Kuu + 1e-12 I)` has the same pathology under ForwardDiff).
    """
    Lu = chol_lower(kernel.kuu(theta, Xu, jitter=JITTER_KUU_SSM))
    psi0, psi1, Kp, wq = psi_batch_expected_uni(kernel, theta, Xu, method, qx_means, qx_vars)
    M = Kp.shape[0]
    a = tri_solve_lower(Lu, Kp.reshape(M, -1)).reshape(Kp.shape)
    tr_kuu = jnp.einsum("mnp,mnp,p->n", a, a, wq)
    UK = jnp.einsum("qm,mnp->qnp", Uv, Kp)
    tr_rv = jnp.einsum("qnp,qnp,p->n", UK, UK, wq)
    llh = jnp.sum(
        w * y * jnp.einsum("mn,m->n", psi1, mu_v)
        - 0.5 * w * (psi0 + tr_rv - tr_kuu)
    )
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
    # solve form for the Kuu⁻¹ contraction — see neg_log_backwardmess_uncertain.
    # Dtype-aware jitter: in the f32-first device mode the reference's 1e-12
    # is invisible at f32 resolution and the Cholesky of the ill-conditioned
    # Kuu NaNs outright; 300·ε_f32 ≈ 3.6e-5 keeps the objective (and its
    # L-BFGS gradients) finite while staying f32-native — the M-step's hot
    # loop is exactly this solve, so pinning it to f64 would forfeit the
    # mode's point (see chain_smoother._kuu_inv_f64 for the E-step analogue).
    dt_k = jnp.result_type(theta, Xu)
    jit = (JITTER_KUU_SSM if dt_k == jnp.float64
           else effective_jitter(dt_k, JITTER_KUU_SSM))
    Lu = chol_lower(kernel.kuu(theta, Xu, jitter=jit))
    psi0, psi1, Kp, wq = psi_batch_expected_multi(kernel, theta, Xu, method, qx_means, qx_covs)
    # sumdiagV_i = Σ_d (μ_v yᵢᵀ W)[block d, d] = Σ_d μ_v^(d) (yᵢᵀW)_d : (N, M)
    mu_blocks = mu_v.reshape(D, M)
    yW = y_means @ W  # (N, D)
    sumdiagV = yW @ mu_blocks  # (N, M)
    lin_terms = jnp.einsum("nm,mn->n", sumdiagV, psi1)
    # ⟨Kuu⁻¹, Ψ2ᵢ⟩ = Σ_p w_p ‖Lu⁻¹ kᵢₚ‖²
    a = tri_solve_lower(Lu, Kp.reshape(M, -1)).reshape(Kp.shape)
    tr_kuu = jnp.einsum("mnp,mnp,p->n", a, a, wq)
    AK = jnp.einsum("mq,qnp->mnp", sumRv_W, Kp)
    tr_rv = jnp.einsum("mnp,mnp,p->n", Kp, AK, wq)
    llh = jnp.sum(
        -0.5 * tr_W * (psi0 - tr_kuu) + lin_terms - 0.5 * tr_rv
    )
    return -llh


def neg_log_backwardmess_gram(
    theta, *, kernel, Xu, X, y, mu_v, Rv, w,
    kuu_inv_warm=None, ns_iters: int = 30, ns_tol: float | None = None,
    kuu_jitter: float = JITTER_KUU,  # = neg_log_backwardmess_fast's default
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
    # Kuu = PSD Gram + jitter·I ⪰ jitter·I, so the jitter is a rigorous λmin
    # bound enabling the scaled Newton–Schulz cold start (0.0 → scaling off)
    Kuu_inv = spd_inverse(Kuu, warm=kuu_inv_warm, iters=ns_iters, tol=ns_tol,
                          lambda_min=kuu_jitter)
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
