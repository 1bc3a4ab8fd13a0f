"""Probit likelihood node (non-conjugate path).

Equivalent of ReactiveMP's external ``Probit`` node with ``ProbitMeta(32)``
used by the classification experiments
(reference: classification_banana.ipynb cell 7, GPT_classification.ipynb).

The reference's Probit node computes EP-style moment-matched messages by
quadrature; here we use the *closed-form* Gaussian–probit tilted moments
(Rasmussen & Williams eq. 3.58) — exact, cheaper, and jit-friendly — and
32-point Gauss–Hermite only for the average energy integral.
"""

import jax
import jax.numpy as jnp

from ..dists import Gaussian
from ..ops.quadrature import gh_points_weights

__all__ = [
    "out_probability",
    "tilted_marginal",
    "tilted_marginal_batch",
    "tilted_marginal_gh",
    "tilted_marginal_gh_batch",
    "average_energy",
    "average_energy_batch",
]

_norm = jax.scipy.stats.norm


def out_probability(q_f: Gaussian):
    """P(y=1) = E_q[Φ(f)] = Φ(m/√(1+v)) — the Probit :out rule used for
    prediction (reference: classification_banana.ipynb cell 13)."""
    return _norm.cdf(q_f.mean / jnp.sqrt(1.0 + q_f.var))


def _tilted(m, v, y):
    """Moments of N(f; m, v)·Φ(s·f), s = 2y−1 (y ∈ {0,1})."""
    s = 2.0 * y - 1.0
    denom = jnp.sqrt(1.0 + v)
    z = s * m / denom
    # stable φ(z)/Φ(z)
    ratio = jnp.exp(_norm.logpdf(z) - _norm.logcdf(z))
    m_t = m + s * v * ratio / denom
    v_t = v - (v * v / (1.0 + v)) * ratio * (z + ratio)
    v_t = jnp.maximum(v_t, 1e-12)
    return m_t, v_t


def tilted_marginal(q_fwd: Gaussian, y) -> Gaussian:
    """q(f) ∝ forward(f)·p(y|f): the product the reference's scheduler forms
    from the UniSGP forward message and the Probit backward message."""
    m, v = _tilted(q_fwd.mean, q_fwd.var, y)
    return Gaussian(m, v)


def tilted_marginal_batch(means, variances, ys) -> Gaussian:
    m, v = _tilted(means, variances, ys)
    return Gaussian(m, v)


def tilted_marginal_gh(m, v, y, n_gh: int = 32) -> Gaussian:
    """GH-quadrature moment matching of N(f; m, v)·Φ(s·f) — the reference's
    ProbitMeta(32) product path (ReactiveMP Probit node moment-matches by
    n-point Gauss–Hermite instead of the closed form). Kept behind a flag for
    exact trajectory parity with the reference's recorded results; the
    closed-form :func:`tilted_marginal` is the default (exact and cheaper)."""
    s = 2.0 * y - 1.0
    pts, w = gh_points_weights(n_gh, m, v)
    F = _norm.cdf(s * pts)
    # dtype-aware floor: a literal 1e-300 underflows to 0.0 in f32 (the
    # experiments' default dtype), making the guard a no-op and leaving the
    # 0/0 NaN to the downstream isfinite fallback
    Zsum = jnp.sum(w * F)
    Z = jnp.maximum(Zsum, jnp.finfo(Zsum.dtype).tiny)
    m_t = jnp.sum(w * F * pts) / Z
    v_t = jnp.sum(w * F * (pts - m_t) ** 2) / Z
    v_t = jnp.maximum(v_t, 1e-12)
    # Zsum > 0 is part of the guard: when every GH value underflows (f32 at
    # |m| ≳ 12, e.g. a mislabeled outlier) the floored Z makes m_t = 0/tiny
    # = 0 and v_t = 1e-12 — both FINITE, so an isfinite-only guard would
    # return a confidently wrong N(0, 1e-12) instead of the documented
    # fallback to the forward marginal
    good = jnp.isfinite(m_t) & jnp.isfinite(v_t) & (Zsum > 0)
    return Gaussian(jnp.where(good, m_t, m), jnp.where(good, v_t, v))


def tilted_marginal_gh_batch(means, variances, ys, n_gh: int = 32) -> Gaussian:
    return jax.vmap(lambda m_, v_, y_: tilted_marginal_gh(m_, v_, y_, n_gh))(
        means, variances, ys
    )


def average_energy(q_f: Gaussian, y, n_gh: int = 32):
    """U = −E_q(f)[log Φ(s·f)] by Gauss–Hermite (ProbitMeta(32) equivalent)."""
    s = 2.0 * y - 1.0
    pts, w = gh_points_weights(n_gh, q_f.mean, q_f.var)
    return -jnp.sum(w * _norm.logcdf(s * pts))


def average_energy_batch(means, variances, ys, n_gh: int = 32):
    return jnp.sum(
        jax.vmap(lambda m, v, y: average_energy(Gaussian(m, v), y, n_gh))(means, variances, ys)
    )
