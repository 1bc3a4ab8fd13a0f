"""UniSGP node: univariate-output sparse-GP likelihood/transition factor.

TPU-native re-implementation of the reference's ``@rule UniSGP(...)`` bodies
and ``@average_energy`` implementations (GPnode/UniSGPnode.jl). Node edges
follow the reference convention (UniSGPnode.jl:76-82):

    out : y (or x_t)          in : x (or x_{t-1})
    v   : transformed inducing outputs  v = Kuu⁻¹u   (length M)
    w   : process-noise precision       θ : kernel hyperparameters

Design translation (SURVEY.md §7.1):
- the mutable ``UniSGPMeta`` becomes the immutable ``UniSGPArgs`` pytree;
- ``@rule`` dispatch on marginal types becomes explicit function variants
  (``*_uncertain`` = Gaussian input via quadrature, ``*_exact`` = observed
  input with exact kernel rows);
- ``BufferUniSGP`` counter-based accumulation becomes an order-free
  natural-parameter sum (``vmap`` + batched GEMM) with an explicit ``Uv``
  refresh once per sweep — identical semantics, no hidden state;
- ``ContinuousUnivariateLogPdf`` messages are returned as closures for
  testing parity, and fused with their Gaussian product into
  ``marginal_in`` (21-pt Gauss–Hermite moment matching) for inference.
"""

from typing import Callable, NamedTuple

import math

import jax
import jax.numpy as jnp

from ..config import CLAMP_HI, CLAMP_LO, JITTER_KUU, JITTER_PSI2, VAR_FLOOR
from ..dists import Gaussian, GammaShapeRate, MvGaussianNat
from ..ops import psi as psiops
from ..ops import quadrature as quad
from ..ops.linalg import jdot, tri_solve_lower

_LOG2PI = math.log(2.0 * math.pi)  # pure-host constant: a jnp op here
#          would initialize the device backend at IMPORT time (slow and
#          fragile through the device tunnel)


class UniSGPArgs(NamedTuple):
    """Per-node static state (the reference's UniSGPMeta,
    gp_helperfunction.jl:33-52, minus the mutable buffers/counter)."""

    theta: jax.Array  # kernel hyperparameters (PointMass q_θ mean)
    Xu: jax.Array  # inducing inputs (M, Din)
    KuuL: jax.Array  # lower Cholesky of K(Xu,Xu) + jitter
    Uv: jax.Array  # upper Cholesky of Rv = Σ_v + μ_v μ_vᵀ


def _clamp(x):
    return jnp.clip(x, CLAMP_LO, CLAMP_HI)


# ---------------------------------------------------------------------------
# out rule  (UniSGPnode.jl:85-104)
# ---------------------------------------------------------------------------


def out_message_uncertain(kernel, method, args: UniSGPArgs, q_in: Gaussian, mu_v, w_mean) -> Gaussian:
    """Forward message N(Ψ1ᵀμ_v, w̄⁻¹) with Ψ1 by cubature
    (reference: UniSGPnode.jl:85-93)."""
    _, psi1, _ = psiops.psi_expected_uni(kernel, args.theta, args.Xu, method, q_in.mean, q_in.var)
    return Gaussian(jdot(psi1, mu_v), 1.0 / w_mean)


def out_message_exact(kernel, args: UniSGPArgs, x, mu_v, w_mean) -> Gaussian:
    """Forward message with exact K(Xu, x̂) (reference: UniSGPnode.jl:96-104)."""
    psi1 = psiops.psi1_exact(kernel, args.theta, args.Xu, jnp.atleast_1d(x))
    return Gaussian(jdot(psi1, mu_v), 1.0 / w_mean)


# ---------------------------------------------------------------------------
# in rule  (UniSGPnode.jl:107-122) + fused product
# ---------------------------------------------------------------------------


def in_log_message(kernel, args: UniSGPArgs, q_out: Gaussian, mu_v, w_mean) -> Callable:
    """Backward log-density message over the input x
    (reference: UniSGPnode.jl:107-122):

        log ν(x) = −½ A(x) w̄ + w̄ μ_y B(x)ᵀ μ_v − ½ w̄ ‖Uv B(x)‖²
        A(x) = k(x,x) − ‖KuuL⁻¹ B(x)‖²,   B(x) = K(Xu, x)
    """
    mu_y = q_out.mean

    def logpdf(x):
        xv = jnp.atleast_1d(x)
        B = psiops.psi1_exact(kernel, args.theta, args.Xu, xv)
        alpha = tri_solve_lower(args.KuuL, B)
        A = kernel.kxx(args.theta, xv) - jdot(alpha, alpha)
        beta = args.Uv @ B
        return -0.5 * A * w_mean + w_mean * mu_y * jdot(B, mu_v) - 0.5 * w_mean * jdot(beta, beta)

    return logpdf


def marginal_in(kernel, args: UniSGPArgs, q_out: Gaussian, mu_v, w_mean, q_fwd: Gaussian, n_gh: int = 21) -> Gaussian:
    """Fused in-rule + product: moment-match q_fwd·exp(log ν) with GH(n)
    (reference: rule UniSGPnode.jl:107-122 followed by prod at :39-46,
    including the +1e-6 variance floor and NaN fallback)."""
    logpdf = in_log_message(kernel, args, q_out, mu_v, w_mean)
    m, v = quad.moment_match_uni(logpdf, q_fwd.mean, q_fwd.var, n=n_gh,
                                 var_floor=VAR_FLOOR)
    return Gaussian(m, v)


# ---------------------------------------------------------------------------
# v rule  (UniSGPnode.jl:125-173)
# ---------------------------------------------------------------------------


def v_message_uncertain(kernel, method, args: UniSGPArgs, mu_y, q_in: Gaussian, w_mean) -> MvGaussianNat:
    """Natural-parameter message to v with expected Ψ's (+1e-8·I on Ψ2)
    (reference: UniSGPnode.jl:125-140)."""
    _, psi1, psi2 = psiops.psi_expected_uni(kernel, args.theta, args.Xu, method, q_in.mean, q_in.var)
    M = psi2.shape[0]
    psi2 = psi2 + JITTER_PSI2 * jnp.eye(M, dtype=psi2.dtype)
    return MvGaussianNat(w_mean * mu_y * psi1, w_mean * psi2)


def v_message_exact(kernel, args: UniSGPArgs, x, mu_y, w_mean) -> MvGaussianNat:
    """Exact-input v message: ξ = w μ_y Ψ1, Λ = w Ψ1Ψ1ᵀ (reference:
    UniSGPnode.jl:144-173 — regression & classification fast paths)."""
    psi1 = psiops.psi1_exact(kernel, args.theta, args.Xu, jnp.atleast_1d(x))
    return MvGaussianNat(w_mean * mu_y * psi1, w_mean * jnp.outer(psi1, psi1))


def v_message_batch_exact(Kux, y_mean, w_mean) -> MvGaussianNat:
    """Σᵢ v-messages for a whole batch in two GEMMs (the order-free
    equivalent of N BufferUniSGP products, UniSGPnode.jl:62-73):
        ξ = w · Kux @ μ_y,   Λ = w · Kux Kuxᵀ
    ``Kux`` is (M, N) from psi_batch_exact."""
    xi = w_mean * (Kux @ y_mean)
    prec = w_mean * (Kux @ Kux.T)
    return MvGaussianNat(xi, prec)


# ---------------------------------------------------------------------------
# w rule  (UniSGPnode.jl:177-238)
# ---------------------------------------------------------------------------


def _w_terms_exact(kernel, args: UniSGPArgs, x, mu_y, v_y, mu_v):
    psi1 = psiops.psi1_exact(kernel, args.theta, args.Xu, jnp.atleast_1d(x))
    alpha = tri_solve_lower(args.KuuL, psi1)
    I1 = kernel.kxx(args.theta, jnp.atleast_1d(x)) - jdot(alpha, alpha)
    beta = args.Uv @ psi1
    I2 = mu_y**2 + v_y - 2.0 * mu_y * jdot(psi1, mu_v) + jdot(beta, beta)
    return I1, I2


def w_message_exact(kernel, args: UniSGPArgs, x, mu_y, v_y, mu_v) -> GammaShapeRate:
    """Γ(3/2, ½(I1+I2)) with exact kernel rows (reference: UniSGPnode.jl:196-238;
    v_y = 0 recovers the regression fast path)."""
    I1, I2 = _w_terms_exact(kernel, args, x, mu_y, v_y, mu_v)
    return GammaShapeRate(jnp.asarray(1.5), 0.5 * (I1 + I2))


def _w_terms_uncertain(kernel, method, args: UniSGPArgs, q_out_mean,
                       q_out_var, q_in: Gaussian, mu_v):
    """Clamped uncertain-input (I1, I2) — shared by the w message AND the
    average energy (UniSGPnode.jl computes the same trace terms at :177-192
    and :290-313; one copy here keeps the FE consistent with the messages
    that produced it)."""
    psi0, psi1, psi2 = psiops.psi_expected_uni(
        kernel, args.theta, args.Xu, method, q_in.mean, q_in.var
    )
    M = psi2.shape[0]
    psi2 = psi2 + JITTER_PSI2 * jnp.eye(M, dtype=psi2.dtype)
    s = tri_solve_lower(args.KuuL, psi2)
    s = tri_solve_lower(args.KuuL, s.T)  # KuuL⁻¹ (KuuL⁻¹ Ψ2)ᵀ; trace-equivalent
    I1 = _clamp(psi0 - jnp.trace(s))
    # tr(UvᵀUv Ψ2) = Σᵢⱼ (Uv Ψ2)ᵢⱼ (Uv)ᵢⱼ — one GEMM instead of two (only
    # the diagonal of the old Uvᵀ(UvΨ2) product was consumed)
    tr_uvpsi2 = jnp.sum((args.Uv @ psi2) * args.Uv)
    I2 = _clamp(q_out_mean**2 + q_out_var
                - 2.0 * q_out_mean * jdot(psi1, mu_v) + tr_uvpsi2)
    return I1, I2


def w_message_uncertain(kernel, method, args: UniSGPArgs, q_out_mean, q_out_var, q_in: Gaussian, mu_v) -> GammaShapeRate:
    """Uncertain-input w message with clamped I1/I2
    (reference: UniSGPnode.jl:177-192)."""
    I1, I2 = _w_terms_uncertain(kernel, method, args, q_out_mean, q_out_var,
                                q_in, mu_v)
    return GammaShapeRate(jnp.asarray(1.5), 0.5 * (I1 + I2))


def _w_terms_batch_exact(args: UniSGPArgs, kxx, Kux, y_mean, y_var, mu_v):
    """Per-datum exact (I1, I2) vectors — shared by the batched w message
    and the batched average energy."""
    alpha = tri_solve_lower(args.KuuL, Kux)  # (M, N)
    I1 = kxx - jnp.sum(alpha * alpha, axis=0)
    beta = args.Uv @ Kux
    I2 = y_mean**2 + y_var - 2.0 * y_mean * (Kux.T @ mu_v) + jnp.sum(beta * beta, axis=0)
    return I1, I2


def w_message_batch_exact(kernel, args: UniSGPArgs, kxx, Kux, y_mean, y_var, mu_v):
    """Batched exact w messages: returns (Σ shape increments, Σ rates).
    Equivalent of N products of Γ(3/2, rateᵢ) messages:
        q(w) = Γ(a₀ + N/2, b₀ + Σᵢ rateᵢ)."""
    I1, I2 = _w_terms_batch_exact(args, kxx, Kux, y_mean, y_var, mu_v)
    rates = 0.5 * (I1 + I2)
    N = kxx.shape[0]
    return 0.5 * N, jnp.sum(rates)


# ---------------------------------------------------------------------------
# θ rule  (UniSGPnode.jl:242-287) — log-density over hyperparameters
# ---------------------------------------------------------------------------


def theta_log_message_exact(kernel, Xu, x, mu_y, mu_v, Rv, w_mean,
                            kuu_jitter: float = JITTER_KUU) -> Callable:
    """log ν(θ) = w μ_y Ψ1(θ)ᵀμ_v − ½w(Ψ0(θ) + tr(Ψ2(θ)(Rv − Kuu(θ)⁻¹)))
    with exact Ψ's (reference: UniSGPnode.jl:242-272). Kuu is jittered by
    default (the reference's own +1e-8·I): an L-BFGS excursion to a long
    lengthscale makes Kuu numerically singular and an unjittered Cholesky
    NaNs the whole log-density AND its gradient."""

    def logpdf(theta):
        from ..ops.linalg import cholinv

        xv = jnp.atleast_1d(x)
        psi1 = psiops.psi1_exact(kernel, theta, Xu, xv)
        psi0 = kernel.kxx(theta, xv)
        Kuu_inv = cholinv(kernel.kuu(theta, Xu), jitter=kuu_jitter)
        quad_term = psi1 @ (Rv - Kuu_inv) @ psi1
        return w_mean * mu_y * jdot(psi1, mu_v) - 0.5 * w_mean * (psi0 + quad_term)

    return logpdf


def theta_log_message_uncertain(kernel, method, Xu, q_in: Gaussian, mu_y,
                                mu_v, Rv, w_mean,
                                kuu_jitter: float = JITTER_KUU) -> Callable:
    """Same with expected Ψ's under q_in (reference: UniSGPnode.jl:274-287);
    Kuu jittered as in :func:`theta_log_message_exact`."""

    def logpdf(theta):
        from ..ops.linalg import cholinv

        psi0, psi1, psi2 = psiops.psi_expected_uni(kernel, theta, Xu, method, q_in.mean, q_in.var)
        Kuu_inv = cholinv(kernel.kuu(theta, Xu), jitter=kuu_jitter)
        tr_term = jnp.sum(psi2 * (Rv - Kuu_inv).T)
        return w_mean * mu_y * jdot(psi1, mu_v) - 0.5 * w_mean * (psi0 + tr_term)

    return logpdf


# ---------------------------------------------------------------------------
# average energy  (UniSGPnode.jl:290-458)
# ---------------------------------------------------------------------------


def _energy(I1, I2, w_mean, E_logw):
    return 0.5 * (I1 * w_mean - E_logw + _LOG2PI + I2 * w_mean)


def average_energy_exact(kernel, args: UniSGPArgs, x, mu_y, v_y, mu_v, w_mean, E_logw):
    """U[q] for observed input (reference: UniSGPnode.jl:337-387 — regression
    v_y=0 and classification variants; also the PointMass-w variants
    at :411-458 by passing E_logw = log w̄)."""
    I1, I2 = _w_terms_exact(kernel, args, x, mu_y, v_y, mu_v)
    return _energy(I1, I2, w_mean, E_logw)


def average_energy_exact_batch(kernel, args: UniSGPArgs, kxx, Kux, y_mean, y_var, mu_v, w_mean, E_logw):
    """Σᵢ U[q] over a batch with exact kernel rows — batched GEMM form."""
    I1, I2 = _w_terms_batch_exact(args, kxx, Kux, y_mean, y_var, mu_v)
    return jnp.sum(_energy(I1, I2, w_mean, E_logw))


def average_energy_uncertain(kernel, method, args: UniSGPArgs, q_out_mean, q_out_var, q_in: Gaussian, mu_v, w_mean, E_logw):
    """U[q] with expected Ψ's and clamped I1/I2
    (reference: UniSGPnode.jl:290-313) — the w rule's shared terms."""
    I1, I2 = _w_terms_uncertain(kernel, method, args, q_out_mean, q_out_var,
                                q_in, mu_v)
    return _energy(I1, I2, w_mean, E_logw)
