"""Whitened SVGP baseline: ELBO-trained sparse variational GP.

Equivalent of the reference's baseline notebooks (Regression_VSGP.ipynb /
Classification_VSGP.ipynb — ApproximateGPs.jl SVGP with the whitened
Cholesky parameterization, AdaMax/LBFGS on −ELBO). Titsias/Hensman SVGP:

    q(u) = N(Lu·m̃ + μ₀, Lu·Ã·Ãᵀ·Luᵀ)   (whitened: m̃, Ã free params)
    ELBO = Σᵢ E_q(fᵢ)[log p(yᵢ|fᵢ)] − KL(q(u)‖p(u))

Gaussian likelihood gives closed-form expectations; Bernoulli-probit uses
Gauss–Hermite. Everything is batched GEMMs; one training run is one jitted
scan.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import JITTER_KUU
from ..ops.linalg import chol_lower, solve_psd, tri_solve_lower, tri_solve_upper
from ..ops.quadrature import gh_nodes

__all__ = ["SVGPParams", "init_svgp", "svgp_predict", "fit_svgp"]


class SVGPParams(NamedTuple):
    theta: jax.Array  # kernel hyperparameters (softplus-transformed in kernel)
    m_white: jax.Array  # whitened variational mean (M,)
    A_raw: jax.Array  # raw lower-triangular factor (M, M); diag softplus'd
    log_noise: jax.Array  # Gaussian likelihood: log observation variance


def init_svgp(theta0, M, dtype=None, noise: float | None = None,
              raw_tril: bool = False):
    """``noise``: initial Gaussian likelihood variance (the reference fixes
    lik_noise = 0.01, Regression_VSGP.ipynb cell 8 — pass 0.01 and train with
    ``learn_noise=False`` to match)."""
    dtype = dtype or theta0.dtype
    log_noise = jnp.asarray(-2.0 if noise is None else float(jnp.log(noise)), dtype)
    # raw diag = invsoftplus(1) so the EFFECTIVE factor _A_tril(A_raw) = I,
    # matching the reference's A_init = I (Regression_VSGP cell 9)
    diag0 = 1.0 if raw_tril else float(jnp.log(jnp.expm1(jnp.asarray(1.0))))
    return SVGPParams(
        theta=theta0,
        m_white=jnp.zeros(M, dtype),
        A_raw=diag0 * jnp.eye(M, dtype=dtype),
        log_noise=log_noise,
    )


def _A_tril(A_raw, raw: bool = False):
    """Lower-triangular variational factor. Default: softplus-positive
    diagonal (safe under long optimization). ``raw=True`` uses the diagonal
    as-is — the reference's parameterization (Regression_VSGP cell 8 takes
    LowerTriangular(A) directly as the Cholesky factor), needed to replicate
    its finite-step trajectories."""
    if raw:
        return jnp.tril(A_raw)
    A = jnp.tril(A_raw, -1)
    return A + jnp.diag(jax.nn.softplus(jnp.diagonal(A_raw)))


def _marginal_f(kernel, params: SVGPParams, Xu, X, whitened: bool = True,
                jitter: float = JITTER_KUU, raw_tril: bool = False):
    """Predictive q(f) = N(mean, var) at inputs X.

    whitened=True: q(u) = N(Lu m̃, Lu ÃÃᵀ Luᵀ) (free coords).
    whitened=False: the reference's centered SVGPModel (Regression_VSGP cell 7)
    q(u) = N(m, AAᵀ) directly in u-space."""
    Kuu = kernel.kuu(params.theta, Xu, jitter=jitter)
    Lu = chol_lower(Kuu)
    Kux = kernel(params.theta, Xu, X)  # (M, N)
    Akx = tri_solve_lower(Lu, Kux)  # Lu⁻¹ Kux, (M, N)
    A = _A_tril(params.A_raw, raw_tril)
    kxx = kernel.diag(params.theta, X)
    if whitened:
        mean = Akx.T @ params.m_white
        SAk = A.T @ Akx  # (M, N)
    else:
        # B = Kuu⁻¹ Kux = Lu⁻ᵀ Akx;  mean = Bᵀ m;  cov term = ‖Aᵀ B‖² per col
        B = tri_solve_upper(Lu.mT, Akx)
        mean = B.T @ params.m_white
        SAk = A.T @ B
    var = kxx - jnp.sum(Akx * Akx, axis=0) + jnp.sum(SAk * SAk, axis=0)
    return mean, jnp.maximum(var, 1e-12)


def _kl_whitened(params: SVGPParams, raw_tril: bool = False):
    """KL(q(u)‖p(u)) in whitened coordinates: ½(‖m̃‖² + ‖Ã‖²_F − M − 2·log|Ã|)."""
    A = _A_tril(params.A_raw, raw_tril)
    M = params.m_white.shape[0]
    # |diag|: with raw_tril the unconstrained diagonal may go negative during
    # optimization — AAᵀ is still PD and log|AAᵀ| = 2Σlog|A_ii|, but a plain
    # log returns NaN for the VALUE (gradients were fine), silently breaking
    # loss traces and value-based linesearches
    logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(A))))
    return 0.5 * (
        params.m_white @ params.m_white + jnp.sum(A * A) - M - logdet
    )


def _kl_centered(kernel, params: SVGPParams, Xu, jitter: float = JITTER_KUU,
                 raw_tril: bool = False):
    """KL(N(m, AAᵀ) ‖ N(0, Kuu)) for the centered parameterization:
    ½(tr(Kuu⁻¹AAᵀ) + mᵀKuu⁻¹m − M − log|AAᵀ| + log|Kuu|)."""
    A = _A_tril(params.A_raw, raw_tril)
    M = params.m_white.shape[0]
    Kuu = kernel.kuu(params.theta, Xu, jitter=jitter)
    Lu = chol_lower(Kuu)
    LiA = tri_solve_lower(Lu, A)
    Lim = tri_solve_lower(Lu, params.m_white)
    logdet_S = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(A))))  # see _kl_whitened
    logdet_K = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lu)))
    return 0.5 * (
        jnp.sum(LiA * LiA) + Lim @ Lim - M - logdet_S + logdet_K
    )


def elbo_gaussian(kernel, params: SVGPParams, Xu, X, y, scale: float = 1.0,
                  whitened: bool = True, jitter: float = JITTER_KUU,
                  raw_tril: bool = False):
    """Gaussian-likelihood ELBO (Regression_VSGP). ``scale`` reweights the
    likelihood term for minibatching (N_total / batch)."""
    mean, var = _marginal_f(kernel, params, Xu, X, whitened, jitter, raw_tril)
    noise = jnp.exp(params.log_noise)
    ll = -0.5 * (
        jnp.log(2.0 * jnp.pi * noise) + ((y - mean) ** 2 + var) / noise
    )
    kl = (_kl_whitened(params, raw_tril) if whitened
          else _kl_centered(kernel, params, Xu, jitter, raw_tril))
    return scale * jnp.sum(ll) - kl


def elbo_bernoulli(kernel, params: SVGPParams, Xu, X, y, scale: float = 1.0,
                   n_gh: int = 20, whitened: bool = True,
                   jitter: float = JITTER_KUU, raw_tril: bool = False):
    """Probit-Bernoulli ELBO via Gauss–Hermite (Classification_VSGP)."""
    mean, var = _marginal_f(kernel, params, Xu, X, whitened, jitter, raw_tril)
    z, w = gh_nodes(n_gh)
    s = 2.0 * y - 1.0
    pts = mean[:, None] + jnp.sqrt(var)[:, None] * z[None, :]
    ll = jax.scipy.stats.norm.logcdf(s[:, None] * pts) @ w
    kl = (_kl_whitened(params, raw_tril) if whitened
          else _kl_centered(kernel, params, Xu, jitter, raw_tril))
    return scale * jnp.sum(ll) - kl


def svgp_predict(kernel, params: SVGPParams, Xu, X, whitened: bool = True,
                 jitter: float = JITTER_KUU, raw_tril: bool = False):
    return _marginal_f(kernel, params, Xu, X, whitened, jitter, raw_tril)


def collapsed_neg_elbo(kernel, theta, Xu, X, y, noise, jitter: float = 1e-10):
    """Titsias (2009) collapsed sparse-GP bound −ELBO* for a Gaussian
    likelihood with fixed noise — the analytic optimum over q(u) for given
    hyperparameters. Serves as the convergence ORACLE for fit_svgp: a fully
    trained uncollapsed run must match the collapsed optimum (the reference's
    recorded toy SMSE 0.004615 sits mid-trajectory of its 5000-step AdaMax
    run; the true ELBO optimum of its own model is SMSE 0.00883)."""
    N = X.shape[0]
    M = Xu.shape[0]
    Kuu = kernel.kuu(theta, Xu, jitter=jitter)
    Kux = kernel(theta, Xu, X)
    kxx = kernel.diag(theta, X)
    L = chol_lower(Kuu)
    A = tri_solve_lower(L, Kux)  # (M, N)
    B = jnp.eye(M, dtype=A.dtype) + A @ A.T / noise
    LB = chol_lower(B)
    c = tri_solve_lower(LB, A @ y / noise)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(LB))) + N * jnp.log(noise)
    quad = (y @ y) / noise - c @ c
    tr_term = (jnp.sum(kxx) - jnp.sum(A * A)) / noise
    return 0.5 * (logdet + quad + N * jnp.log(2.0 * jnp.pi) + tr_term)


@partial(jax.jit, static_argnames=("kernel", "steps", "learning_rate", "jitter"))
def fit_svgp_collapsed(
    kernel,
    theta0,
    Xu,
    X,  # (N, D) FULL batch
    y,
    noise: float,
    steps: int = 200,
    learning_rate: float = 0.05,
    jitter: float = 1e-6,
):
    """TPU-first VSGP training: AdaMax on the COLLAPSED Titsias bound.

    Same model and variational family as the reference's minibatched
    ApproximateGPs run (Regression_VSGP.ipynb cells 15-19, M=512, fixed
    lik_noise) — but instead of 2200 epochs of stochastic uncollapsed ELBO
    steps over 44,000 minibatches, q(u) is profiled out analytically
    (Titsias 2009) and θ takes a few hundred FULL-batch natural steps. At
    kin40k scale the full-batch bound is a handful of MXU GEMMs
    (M×N Gram + M×M×N SYRK), so one step costs milliseconds on a TPU chip
    where the Julia baseline needed ~8 s per epoch. The collapsed optimum
    dominates every uncollapsed q(u) for the same θ, so reaching the
    reference's SMSE needs no minibatch schedule at all.

    Returns (θ, -elbo trace).
    """
    theta, _, trace = fit_svgp_collapsed_resumable(
        kernel, theta0, collapsed_opt_init(theta0, learning_rate), Xu, X, y,
        noise, steps=steps, learning_rate=learning_rate, jitter=jitter,
    )
    return theta, trace


@partial(jax.jit, static_argnames=("kernel", "steps", "learning_rate", "jitter"))
def fit_svgp_collapsed_resumable(
    kernel, theta0, opt_state, Xu, X, y, noise: float,
    steps: int = 25, learning_rate: float = 0.05, jitter: float = 1e-6,
):
    """Chunked variant of :func:`fit_svgp_collapsed` carrying the optimizer
    state, so a driver can interleave SMSE evaluations (time-to-target
    tracking) without restarting AdaMax. Build ``opt_state`` with
    :func:`collapsed_opt_init`."""
    optimizer = optax.chain(optax.zero_nans(), optax.adamax(learning_rate))
    loss = lambda th: collapsed_neg_elbo(kernel, th, Xu, X, y, noise, jitter)
    vg = jax.value_and_grad(loss)

    def step(carry, _):
        th, os_ = carry
        v, g = vg(th)
        upd, os_ = optimizer.update(g, os_, th)
        return (optax.apply_updates(th, upd), os_), v

    (theta, opt_state), trace = jax.lax.scan(
        step, (theta0, opt_state), None, length=steps
    )
    return theta, opt_state, trace


def collapsed_opt_init(theta0, learning_rate: float = 0.05):
    optimizer = optax.chain(optax.zero_nans(), optax.adamax(learning_rate))
    return optimizer.init(theta0)


def collapsed_predict(kernel, theta, Xu, X_test, X, y, noise, jitter: float = 1e-10):
    """Predictive mean of the collapsed-optimal q(u) at X_test:
    Kuu⁻¹μ_u = Kuu⁻¹·Kuu·S⁻¹(Kux y/σ²) = S⁻¹(Kux y/σ²) — the two Kuu ops
    cancel algebraically, so neither is computed (the old form also used
    jnp.linalg.solve, whose LU lowering has no f64 path on this TPU backend;
    the SPD S gets a Cholesky solve like every other solve in the repo)."""
    Kuu = kernel.kuu(theta, Xu, jitter=jitter)
    Kux = kernel(theta, Xu, X)
    Kut = kernel(theta, Xu, X_test)
    S = Kuu + Kux @ Kux.T / noise
    return Kut.T @ solve_psd(S, Kux @ y / noise)


@partial(jax.jit, static_argnames=(
    "kernel", "likelihood", "epochs", "learn_noise", "whitened", "jitter",
    "raw_tril"))
def fit_svgp(
    kernel,
    params0: SVGPParams,
    Xu,
    X_batched,  # (B, batch, D)
    y_batched,
    n_total: int,
    likelihood: str = "gaussian",
    epochs: int = 100,
    learning_rate: float = 0.002,
    learn_noise: bool = True,
    whitened: bool = True,
    jitter: float = JITTER_KUU,
    raw_tril: bool = False,
):
    """AdaMax on −ELBO over minibatches, one jitted scan
    (reference: Regression_VSGP cells 7-10, Flux AdaMax on -elbo).
    ``learn_noise=False`` fixes the Gaussian likelihood variance at its
    initial value (the reference's lik_noise = 0.01 is a constant).
    ``whitened=False`` optimizes the reference's centered q(u) = N(m, AAᵀ)
    coordinates — needed to reproduce its finite-step trajectories exactly."""
    elbo = elbo_gaussian if likelihood == "gaussian" else elbo_bernoulli
    batch = X_batched.shape[1]
    scale = n_total / batch
    optimizer = optax.chain(optax.zero_nans(), optax.adamax(learning_rate))

    def loss(p, Xb, yb):
        if not learn_noise:
            p = p._replace(log_noise=jax.lax.stop_gradient(p.log_noise))
        return -elbo(kernel, p, Xu, Xb, yb, scale=scale, whitened=whitened,
                     jitter=jitter, raw_tril=raw_tril)

    grad_fn = jax.grad(loss)

    def step(carry, b):
        p, os_ = carry
        Xb, yb = b
        g = grad_fn(p, Xb, yb)
        upd, os_ = optimizer.update(g, os_, p)
        return (optax.apply_updates(p, upd), os_), None

    def epoch(carry, _):
        carry, _ = jax.lax.scan(step, carry, (X_batched, y_batched))
        return carry, None

    (params, _), _ = jax.lax.scan(
        epoch, (params0, optimizer.init(params0)), None, length=epochs
    )
    return params
