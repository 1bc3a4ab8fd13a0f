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
from ..ops.linalg import chol_lower, tri_solve_lower
from ..ops.quadrature import gh_nodes

__all__ = ["SVGPParams", "init_svgp", "svgp_predict", "fit_svgp"]


class SVGPParams(NamedTuple):
    theta: jax.Array  # kernel hyperparameters (softplus-transformed in kernel)
    m_white: jax.Array  # whitened variational mean (M,)
    A_raw: jax.Array  # raw lower-triangular factor (M, M); diag softplus'd
    log_noise: jax.Array  # Gaussian likelihood: log observation variance


def init_svgp(theta0, M, dtype=None):
    dtype = dtype or theta0.dtype
    return SVGPParams(
        theta=theta0,
        m_white=jnp.zeros(M, dtype),
        A_raw=jnp.eye(M, dtype=dtype),
        log_noise=jnp.asarray(-2.0, dtype),
    )


def _A_tril(A_raw):
    """Lower-triangular variational factor with softplus-positive diagonal."""
    A = jnp.tril(A_raw, -1)
    return A + jnp.diag(jax.nn.softplus(jnp.diagonal(A_raw)))


def _marginal_f(kernel, params: SVGPParams, Xu, X):
    """Predictive q(f) = N(mean, var) at inputs X (whitened algebra)."""
    Kuu = kernel.kuu(params.theta, Xu, jitter=JITTER_KUU)
    Lu = chol_lower(Kuu)
    Kux = kernel(params.theta, Xu, X)  # (M, N)
    Akx = tri_solve_lower(Lu, Kux)  # Lu⁻¹ Kux, (M, N)
    mean = Akx.T @ params.m_white
    A = _A_tril(params.A_raw)
    SAk = A.T @ Akx  # (M, N)
    kxx = kernel.diag(params.theta, X)
    var = kxx - jnp.sum(Akx * Akx, axis=0) + jnp.sum(SAk * SAk, axis=0)
    return mean, jnp.maximum(var, 1e-12)


def _kl_whitened(params: SVGPParams):
    """KL(q(u)‖p(u)) in whitened coordinates: ½(‖m̃‖² + ‖Ã‖²_F − M − 2·log|Ã|)."""
    A = _A_tril(params.A_raw)
    M = params.m_white.shape[0]
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(A)))
    return 0.5 * (
        params.m_white @ params.m_white + jnp.sum(A * A) - M - logdet
    )


def elbo_gaussian(kernel, params: SVGPParams, Xu, X, y, scale: float = 1.0):
    """Gaussian-likelihood ELBO (Regression_VSGP). ``scale`` reweights the
    likelihood term for minibatching (N_total / batch)."""
    mean, var = _marginal_f(kernel, params, Xu, X)
    noise = jnp.exp(params.log_noise)
    ll = -0.5 * (
        jnp.log(2.0 * jnp.pi * noise) + ((y - mean) ** 2 + var) / noise
    )
    return scale * jnp.sum(ll) - _kl_whitened(params)


def elbo_bernoulli(kernel, params: SVGPParams, Xu, X, y, scale: float = 1.0, n_gh: int = 20):
    """Probit-Bernoulli ELBO via Gauss–Hermite (Classification_VSGP)."""
    mean, var = _marginal_f(kernel, params, Xu, X)
    z, w = gh_nodes(n_gh)
    s = 2.0 * y - 1.0
    pts = mean[:, None] + jnp.sqrt(var)[:, None] * z[None, :]
    ll = jax.scipy.stats.norm.logcdf(s[:, None] * pts) @ w
    return scale * jnp.sum(ll) - _kl_whitened(params)


def svgp_predict(kernel, params: SVGPParams, Xu, X):
    return _marginal_f(kernel, params, Xu, X)


@partial(jax.jit, static_argnames=("kernel", "likelihood", "epochs"))
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
):
    """AdaMax on −ELBO over minibatches, one jitted scan
    (reference: Regression_VSGP cells 7-10, Flux AdaMax on -elbo)."""
    elbo = elbo_gaussian if likelihood == "gaussian" else elbo_bernoulli
    batch = X_batched.shape[1]
    scale = n_total / batch
    optimizer = optax.chain(optax.zero_nans(), optax.adamax(learning_rate))

    def loss(p, Xb, yb):
        return -elbo(kernel, p, Xu, Xb, yb, scale=scale)

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
