"""Exponential-family distributions as JAX pytrees (L1 layer).

Equivalents of the Distributions.jl / ExponentialFamily.jl types used by the
reference rules (SURVEY.md §1 L1): NormalMeanVariance/NormalMeanPrecision,
MvNormalMeanCovariance, MvNormalWeightedMeanPrecision, GammaShapeRate,
Wishart/WishartFast, PointMass.

All types are immutable NamedTuples (valid pytree leaves containers), so they
flow through jit/vmap/scan. Products are explicit natural-parameter updates —
the reference's ``prod(GenericProd, …)`` dispatch becomes plain functions.
"""

from typing import NamedTuple

import math

import jax
import jax.numpy as jnp

__all__ = [
    "Gaussian",
    "MvGaussian",
    "MvGaussianNat",
    "GammaShapeRate",
    "Wishart",
    "WishartFast",
    "PointMass",
    "gaussian_prod",
    "mv_nat_to_meancov",
    "mv_meancov_to_nat",
    "mv_gaussian_prod_nat",
    "gamma_mean",
    "gamma_mean_log",
    "wishart_mean",
    "wishart_mean_logdet",
    "gaussian_entropy",
    "mv_gaussian_entropy",
    "mv_gaussian_entropy_from_prec",
    "gamma_entropy",
    "wishart_entropy",
]


class Gaussian(NamedTuple):
    """Univariate Gaussian, mean/variance parameterization."""

    mean: jax.Array
    var: jax.Array

    @property
    def precision(self):
        return 1.0 / self.var


class MvGaussian(NamedTuple):
    """Multivariate Gaussian, mean/covariance (MvNormalMeanCovariance)."""

    mean: jax.Array
    cov: jax.Array


class MvGaussianNat(NamedTuple):
    """Multivariate Gaussian, weighted-mean/precision
    (MvNormalWeightedMeanPrecision): q(x) ∝ exp(ξᵀx − ½ xᵀΛx)."""

    xi: jax.Array
    prec: jax.Array


class GammaShapeRate(NamedTuple):
    shape: jax.Array
    rate: jax.Array


class Wishart(NamedTuple):
    """Wishart with scale matrix S: E[W] = df·S."""

    df: jax.Array
    scale: jax.Array


class WishartFast(NamedTuple):
    """Wishart parameterized by the *inverse* scale (ReactiveMP WishartFast):
    E[W] = df·inv(inv_scale)."""

    df: jax.Array
    inv_scale: jax.Array


class PointMass(NamedTuple):
    point: jax.Array


# ---------------------------------------------------------------------------
# Conversions & products
# ---------------------------------------------------------------------------


def gaussian_prod(a: Gaussian, b: Gaussian) -> Gaussian:
    """Product of two univariate Gaussians (normalized)."""
    pa, pb = 1.0 / a.var, 1.0 / b.var
    prec = pa + pb
    mean = (a.mean * pa + b.mean * pb) / prec
    return Gaussian(mean, 1.0 / prec)


def mv_nat_to_meancov(q: MvGaussianNat) -> MvGaussian:
    from .ops.linalg import chol_lower, chol_solve, sym

    L = chol_lower(sym(q.prec))
    eye = jnp.eye(q.prec.shape[-1], dtype=q.prec.dtype)
    cov = chol_solve(L, eye)
    mean = chol_solve(L, q.xi)
    return MvGaussian(mean, sym(cov))


def mv_meancov_to_nat(q: MvGaussian) -> MvGaussianNat:
    from .ops.linalg import chol_lower, chol_solve, sym

    L = chol_lower(sym(q.cov))
    eye = jnp.eye(q.cov.shape[-1], dtype=q.cov.dtype)
    prec = chol_solve(L, eye)
    return MvGaussianNat(chol_solve(L, q.mean), sym(prec))


def mv_gaussian_prod_nat(a: MvGaussianNat, b: MvGaussianNat) -> MvGaussianNat:
    return MvGaussianNat(a.xi + b.xi, a.prec + b.prec)


# ---------------------------------------------------------------------------
# Moments
# ---------------------------------------------------------------------------


def gamma_mean(q: GammaShapeRate):
    return q.shape / q.rate


def gamma_mean_log(q: GammaShapeRate):
    """E[log w] = ψ(a) − log b (used in average energies, UniSGPnode.jl:293)."""
    return jax.scipy.special.digamma(q.shape) - jnp.log(q.rate)


def wishart_mean(q):
    if isinstance(q, Wishart):
        return q.df * q.scale
    if isinstance(q, WishartFast):
        from .ops.linalg import cholinv, sym

        return q.df * cholinv(sym(q.inv_scale))
    raise TypeError(type(q))


def _mv_digamma_sum(df, d):
    i = jnp.arange(1, d + 1, dtype=df.dtype if hasattr(df, "dtype") else None)
    return jnp.sum(jax.scipy.special.digamma((jnp.asarray(df) + 1.0 - i) / 2.0))


def wishart_mean_logdet(q):
    """E[log det W] (used in MultiSGP energies, MultiSGPnode.jl:549)."""
    from .ops.linalg import chol_lower, logdet_from_chol, sym

    if isinstance(q, Wishart):
        d = q.scale.shape[-1]
        ld_S = logdet_from_chol(chol_lower(sym(q.scale)))
    elif isinstance(q, WishartFast):
        d = q.inv_scale.shape[-1]
        ld_S = -logdet_from_chol(chol_lower(sym(q.inv_scale)))
    else:
        raise TypeError(type(q))
    return _mv_digamma_sum(jnp.asarray(q.df, dtype=ld_S.dtype), d) + d * jnp.log(2.0) + ld_S


# ---------------------------------------------------------------------------
# Entropies (for free-energy evaluation: FE = Σ U_node − Σ H(q))
# ---------------------------------------------------------------------------

_LOG2PI = math.log(2.0 * math.pi)  # pure-host constant: a jnp op here
#          would initialize the device backend at IMPORT time (slow and
#          fragile through the device tunnel)


def gaussian_entropy(q: Gaussian):
    return 0.5 * (_LOG2PI + 1.0 + jnp.log(q.var))


def mv_gaussian_entropy(q: MvGaussian):
    from .ops.linalg import chol_lower, logdet_from_chol, sym

    d = q.mean.shape[-1]
    return 0.5 * (d * (_LOG2PI + 1.0) + logdet_from_chol(chol_lower(sym(q.cov))))


def mv_gaussian_entropy_from_prec(prec: jax.Array):
    """Entropy of N(·, Λ⁻¹) directly from the precision Λ:
    ½(d(1+log 2π) − logdet Λ).

    Numerically preferable whenever Λ is the quantity actually held (natural
    parameterization): chol(Λ) factors the exactly-SPD matrix, while the
    ``mv_gaussian_entropy(cov)`` route Choleskys an APPROXIMATE inverse whose
    rounding can leave it indefinite — measured NaN at κ(Λ) ≈ 1e10 for the
    converged GPLVM q(v) on the TPU backend's emulated f64 while the same
    state is finite on CPU (DEVIATIONS #30)."""
    from .ops.linalg import chol_lower, logdet_from_chol, sym

    d = prec.shape[-1]
    return 0.5 * (d * (_LOG2PI + 1.0)
                  - logdet_from_chol(chol_lower(sym(prec))))


def gamma_entropy(q: GammaShapeRate):
    a, b = q.shape, q.rate
    return a - jnp.log(b) + jax.scipy.special.gammaln(a) + (1.0 - a) * jax.scipy.special.digamma(a)


def _mv_gammaln(a, d):
    i = jnp.arange(1, d + 1, dtype=jnp.asarray(a).dtype)
    return d * (d - 1) / 4.0 * jnp.log(jnp.pi) + jnp.sum(
        jax.scipy.special.gammaln(a + (1.0 - i) / 2.0)
    )


def wishart_entropy(q):
    """Entropy of a Wishart distribution."""
    from .ops.linalg import chol_lower, logdet_from_chol, sym

    if isinstance(q, WishartFast):
        d = q.inv_scale.shape[-1]
        ld_S = -logdet_from_chol(chol_lower(sym(q.inv_scale)))
    else:
        d = q.scale.shape[-1]
        ld_S = logdet_from_chol(chol_lower(sym(q.scale)))
    df = jnp.asarray(q.df, dtype=ld_S.dtype)
    return (
        (d + 1.0) / 2.0 * ld_S
        + d * (d + 1.0) / 2.0 * jnp.log(2.0)
        + _mv_gammaln(df / 2.0, d)
        - (df - d - 1.0) / 2.0 * _mv_digamma_sum(df, d)
        + df * d / 2.0
    )
