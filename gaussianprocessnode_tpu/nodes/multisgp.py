"""MultiSGP node: D-output sparse-GP factor with identity coregionalization.

TPU-native re-implementation of GPnode/MultiSGPnode.jl. Model (reference
MultiSGPnode.jl:47-49 and §2.2 of SURVEY.md): shared scalar kernel, C = I_D,
v ∈ R^{M·D} stacked per output (block d = v for output d), process-noise
precision W is D×D (Wishart or PointMass).

Edges: out = x_t, in = x_{t-1}, v, w = W, θ.

The reference keeps a dense ``Kuu_inverse`` in the meta
(gp_helperfunction.jl:55-73); we mirror that in ``MultiSGPArgs`` because the
rules contract against Kuu⁻¹ rather than solving per datum.
"""

from typing import Callable, NamedTuple

import math

import jax
import jax.numpy as jnp

from ..config import JITTER_KUU_SSM
from ..dists import MvGaussian, MvGaussianNat, WishartFast
from ..ops import psi as psiops
from ..ops import quadrature as quad
from ..ops.linalg import block_trace_products, sum_blocks_weighted

_LOG2PI = math.log(2.0 * math.pi)  # pure-host constant: a jnp op here
#          would initialize the device backend at IMPORT time (slow and
#          fragile through the device tunnel)


class MultiSGPArgs(NamedTuple):
    theta: jax.Array
    Xu: jax.Array  # (M, Din)
    Kuu_inv: jax.Array  # (M, M) dense inverse of Kuu + 1e-12 I


def _split_blocks(mu_v, M, D):
    """v stacked per output: block d = μ_v[d·M:(d+1)·M] (MultiSGPnode.jl:101)."""
    return mu_v.reshape(D, M)


def _sum_diag_V(mu_v, mu_y, W, M, D):
    """sumdiagV (M,) from V = μ_v (μ_yᵀW): Σ_d (Wμ_y)_d μ_v^(d)
    (reference: sum_diagonal_M(V, M), MultiSGPnode.jl:179)."""
    yW = W @ mu_y  # (D,)
    return yW @ _split_blocks(mu_v, M, D)  # (M,)


# ---------------------------------------------------------------------------
# out rule (MultiSGPnode.jl:90-120)
# ---------------------------------------------------------------------------


def out_message(kernel, method, args: MultiSGPArgs, q_in: MvGaussian, mu_v, W_mean) -> MvGaussian:
    """Forward message MvN(μ_y, W̄⁻¹) with μ_y[d] = Ψ1ᵀ μ_v^(d)."""
    M = args.Xu.shape[0]
    D = W_mean.shape[0]
    psi1 = psiops.psi1_expected_multi(
        kernel, args.theta, args.Xu, method, q_in.mean, q_in.cov
    )  # Ψ1 only: the out rule never consumes Ψ0/Ψ2
    mu_y = _split_blocks(mu_v, M, D) @ psi1  # (D,)
    from ..ops.linalg import cholinv, sym

    return MvGaussian(mu_y, cholinv(sym(W_mean)))


# ---------------------------------------------------------------------------
# in rule (MultiSGPnode.jl:162-236)
# ---------------------------------------------------------------------------


def in_log_message(kernel, args: MultiSGPArgs, mu_y, mu_v, Rv, W_mean) -> Callable:
    """Backward log-density over the input x (MultiSGPnode.jl:162-208):

        log ν(x) = −½tr(W)(Ψ0(x) − ⟨Kuu⁻¹,Ψ2(x)⟩) + ⟨ΣdiagV, Ψ1(x)⟩
                   − ½⟨Ψ2(x), ΣRv_blk·W⟩
    """
    M = args.Xu.shape[0]
    D = mu_y.shape[0]
    tr_W = jnp.trace(W_mean)
    sumdiagV = _sum_diag_V(mu_v, mu_y, W_mean, M, D)
    sumRv_W = sum_blocks_weighted(Rv, W_mean, D, M)
    A = 0.5 * tr_W * args.Kuu_inv - 0.5 * sumRv_W  # Ψ2 contraction matrix

    def logpdf(x):
        k = psiops.psi1_exact(kernel, args.theta, args.Xu, x)
        psi0 = kernel.kxx(args.theta, x)
        # ⟨A, kkᵀ⟩ = kᵀAk  (Ψ2(x) = k kᵀ)
        return -0.5 * tr_W * psi0 + k @ A @ k + sumdiagV @ k

    return logpdf


def marginal_in(kernel, args: MultiSGPArgs, mu_y, mu_v, Rv, W_mean, q_fwd: MvGaussian,
                method=quad.SphericalRadial()) -> MvGaussian:
    """Fused in-rule + srcubature moment-matched product
    (reference: MultiSGPnode.jl:162-184 then prod at :37-44)."""
    logpdf = in_log_message(kernel, args, mu_y, mu_v, Rv, W_mean)
    m, V = quad.moment_match_multi(logpdf, q_fwd.mean, q_fwd.cov, method=method)
    return MvGaussian(m, V)


def in_message_laplace(kernel, args: MultiSGPArgs, mu_y, mu_v, Rv, W_mean, q_in_mean,
                       lbfgs_steps: int = 20) -> MvGaussianNat:
    """Laplace-style in message (MultiSGPnode.jl:210-236): minimize −log ν
    with L-BFGS (20 iterations) from mean(q_in), then Λ = Hessian at the
    minimizer → MvNormalWeightedMeanPrecision(Λ m, Λ)."""
    from ..infer.training import lbfgs_solve

    logpdf = in_log_message(kernel, args, mu_y, mu_v, Rv, W_mean)
    neg = lambda x: -logpdf(x)
    m_z, _ = lbfgs_solve(neg, q_in_mean, max_steps=lbfgs_steps)
    W_z = jax.hessian(neg)(m_z)
    return MvGaussianNat(W_z @ m_z, W_z)


# ---------------------------------------------------------------------------
# v rule (MultiSGPnode.jl:290-328)
# ---------------------------------------------------------------------------


def v_message(kernel, method, args: MultiSGPArgs, mu_y, q_in: MvGaussian, W_mean) -> MvGaussianNat:
    """ξ = vcat_d((Wμ_y)_d·Ψ1), Λ = W ⊗ Ψ2 (Kronecker precision)."""
    _, psi1, psi2 = psiops.psi_expected_multi(
        kernel, args.theta, args.Xu, method, q_in.mean, q_in.cov
    )
    yW = W_mean @ mu_y  # (D,)
    xi = (yW[:, None] * psi1[None, :]).reshape(-1)  # vcat_d((Wμ_y)_d·Ψ1)
    prec = jnp.kron(W_mean, psi2)
    return MvGaussianNat(xi, prec)


def v_message_batch(psi1, sum_psi2, sum_yW, W_mean) -> MvGaussianNat:
    """Σ_t v-messages sharing one W (the GPSSM chain / GPLVM case):
    ξ = vec_d(Σ_t (Wμ_y,t)_d Ψ1_t), Λ = W ⊗ Σ_t Ψ2_t.

    ``psi1`` (M, N), ``sum_psi2`` (M,M) = Σ_t Ψ2_t, ``sum_yW`` (N, D) rows
    (W μ_y,t)ᵀ."""
    xi = jnp.einsum("nd,mn->dm", sum_yW, psi1,
                    precision=jax.lax.Precision.HIGHEST).reshape(-1)
    prec = jnp.kron(W_mean, sum_psi2)
    return MvGaussianNat(xi, prec)


# ---------------------------------------------------------------------------
# w rule (MultiSGPnode.jl:367-444)
# ---------------------------------------------------------------------------


def w_message(kernel, method, args: MultiSGPArgs, mu_y, Sigma_y, q_in: MvGaussian,
              mu_v, Sigma_v) -> WishartFast:
    """WishartFast(D+2, I1 + I2) with
    I1 = (Ψ0 − tr(Kuu⁻¹Ψ2))·I_D,
    I2 = Ry − μ_y Eᵀ − E μ_yᵀ + Ψ4,  E[d] = Ψ1ᵀμ_v^(d),
    Ψ4[i,j] = ⟨Rv_blk[i,j], Ψ2ᵀ⟩.  Σ_y = 0 for PointMass out."""
    M = args.Xu.shape[0]
    D = mu_y.shape[0]
    psi0, psi1, psi2 = psiops.psi_expected_multi(
        kernel, args.theta, args.Xu, method, q_in.mean, q_in.cov
    )
    Rv = Sigma_v + jnp.outer(mu_v, mu_v)
    I1 = (psi0 - jnp.sum(args.Kuu_inv * psi2.T)) * jnp.eye(D, dtype=mu_y.dtype)
    E = _split_blocks(mu_v, M, D) @ psi1  # (D,)
    psi4 = block_trace_products(Rv, psi2.T, D, M)
    Ry = Sigma_y + jnp.outer(mu_y, mu_y)
    I2 = Ry - jnp.outer(mu_y, E) - jnp.outer(E, mu_y) + psi4
    return WishartFast(jnp.asarray(D + 2.0), I1 + I2)


# ---------------------------------------------------------------------------
# θ rule (MultiSGPnode.jl:447-466)
# ---------------------------------------------------------------------------


def theta_log_message(kernel, method, Xu, q_in: MvGaussian, mu_y, mu_v, Rv, W_mean,
                      psi2_jitter: float = 1e-7) -> Callable:
    """log ν(θ) = −½tr(W̄ I1(θ)) + μ_yᵀW̄(I⊗Ψ1(θ))μ_v − ½tr((W̄⊗Ψ2(θ))Rv)
    with expected Ψ's per θ (+1e-7·I on Ψ2, MultiSGPnode.jl:459)."""
    D = mu_y.shape[0]

    def logpdf(theta):
        from ..ops.linalg import cholinv

        M = Xu.shape[0]
        psi0, psi1, psi2 = psiops.psi_expected_multi(kernel, theta, Xu, method, q_in.mean, q_in.cov)
        psi2 = psi2 + psi2_jitter * jnp.eye(M, dtype=psi2.dtype)
        # jittered like every other Kuu inverse in this module (JITTER_KUU_SSM
        # convention): unjittered, a long-lengthscale θ probe NaNs the whole
        # log-density and its gradient
        Kuu_inv = cholinv(kernel.kuu(theta, Xu), jitter=JITTER_KUU_SSM)
        tr_I1 = jnp.trace(W_mean) * (psi0 - jnp.trace(Kuu_inv @ psi2))
        lin = (W_mean @ mu_y) @ (_split_blocks(mu_v, M, D) @ psi1)
        # tr((W̄⊗Ψ2)Rv) = Σ_{ij} W̄_ij ⟨Ψ2, Rv_blk[j,i]⟩
        quad_term = jnp.sum(sum_blocks_weighted(Rv, W_mean.T, D, M) * psi2)
        return -0.5 * tr_I1 + lin - 0.5 * quad_term

    return logpdf


# ---------------------------------------------------------------------------
# average energy (MultiSGPnode.jl:544-632)
# ---------------------------------------------------------------------------


def average_energy(kernel, method, args: MultiSGPArgs, mu_y, Sigma_y, q_in: MvGaussian,
                   mu_v, Sigma_v, W_mean, E_logdet_W):
    """U[q] = ½D log2π − ½E[logdet W] + ½tr(W̄ Ry)
             + ½tr(W̄)(Ψ0 − ⟨Kuu⁻¹,Ψ2⟩) − ⟨ΣdiagV,Ψ1⟩ + ½⟨Ψ2, ΣRv_blk·W̄⟩."""
    M = args.Xu.shape[0]
    D = mu_y.shape[0]
    psi0, psi1, psi2 = psiops.psi_expected_multi(
        kernel, args.theta, args.Xu, method, q_in.mean, q_in.cov
    )
    Rv = Sigma_v + jnp.outer(mu_v, mu_v)
    Ry = Sigma_y + jnp.outer(mu_y, mu_y)
    sumdiagV = _sum_diag_V(mu_v, mu_y, W_mean, M, D)
    sumRv_W = sum_blocks_weighted(Rv, W_mean, D, M)
    return (
        0.5 * D * _LOG2PI
        - 0.5 * E_logdet_W
        + 0.5 * jnp.trace(W_mean @ Ry)
        + 0.5 * jnp.trace(W_mean) * (psi0 - jnp.sum(args.Kuu_inv * psi2.T))
        - sumdiagV @ psi1
        + 0.5 * jnp.sum(psi2 * sumRv_W)
    )
