"""Quadrature / cubature / unscented-transform rules (L2 layer).

TPU-native equivalents of ReactiveMP's ``ghcubature(n)`` / ``srcubature()``
approximation methods and the reference's Generalized Unscented Transform
(helper_functions/ut_approx.jl).

All rules produce **static-shape** point/weight arrays so that every
expectation is a fixed-size batched kernel evaluation — one Gram matrix over
all sigma points (an MXU matmul) instead of the reference's per-point Julia
closure loop (GPnode/UniSGPnode.jl:11-19).

Conventions:
- univariate rules take ``(m, v)`` scalars, return ``points (P,)``, ``weights (P,)``
- multivariate rules take ``(m, V)`` with ``m (d,)``, ``V (d,d)``, return
  ``points (P, d)``, ``weights (P,)``
"""

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "GaussHermite",
    "SphericalRadial",
    "Unscented",
    "GenUT",
    "gh_nodes",
    "gh_points_weights",
    "sr_points_weights",
    "ut_points_weights",
    "genut_points_weights_uni",
    "genut_points_weights_multi",
    "genut_expectation_joint",
    "genut_statistics_joint",
    "points_weights_uni",
    "points_weights_multi",
    "expect_uni",
    "expect_multi",
    "moment_match_uni",
    "moment_match_uni_logz",
    "moment_match_multi",
]


# ---------------------------------------------------------------------------
# Method marker types (equivalent of ReactiveMP AbstractApproximationMethod)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GaussHermite:
    """Gauss–Hermite quadrature with ``n`` nodes (ReactiveMP ghcubature(n))."""

    n: int = 21


@dataclass(frozen=True)
class SphericalRadial:
    """3rd-degree spherical-radial (CKF) cubature: 2d equal-weight points
    (ReactiveMP srcubature())."""


@dataclass(frozen=True)
class Unscented:
    """Classic scaled UT (ReactiveMP UT()/Unscented() defaults)."""

    alpha: float = 1e-3
    beta: float = 2.0
    kappa: float = 0.0


@dataclass(frozen=True)
class GenUT:
    """Generalized UT with skewness/kurtosis-matched asymmetric sigma points
    (reference: helper_functions/ut_approx.jl:116-151).

    Note: we use *raw central moments* (μ3, μ4) as in the GenUT paper; for a
    Gaussian these are 0 and 3V² (the reference feeds Julia's standardized
    moments, which only coincides at unit variance)."""


# ---------------------------------------------------------------------------
# Point/weight constructions
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _gh_nodes_np(n: int):
    # cache HOST constants only: caching jnp arrays created inside a jit
    # trace leaks tracers across traces (UnexpectedTracerError)
    x, w = np.polynomial.hermite.hermgauss(n)
    return np.sqrt(2.0) * x, w / np.sqrt(np.pi)


def gh_nodes(n: int):
    """Hermite-Gauss nodes/weights for E[f(Z)], Z~N(0,1): Σ w_i f(z_i)."""
    z, wn = _gh_nodes_np(n)
    return jnp.asarray(z), jnp.asarray(wn)


def gh_points_weights(n: int, m, v):
    """Univariate GH rule for N(m, v)."""
    z, w = gh_nodes(n)
    m = jnp.asarray(m)
    pts = m + jnp.sqrt(jnp.asarray(v)) * z.astype(m.dtype)
    return pts, w.astype(m.dtype)


def _cholsqrt(V):
    """Lower Cholesky factor; closed form for d ≤ 2 (the GPSSM state
    dimension) — avoids the while-loop lowering of jnp.linalg.cholesky on
    backends with high per-op dispatch cost."""
    d = V.shape[-1]
    if d == 1:
        return jnp.sqrt(V)
    if d == 2:
        a = jnp.sqrt(V[..., 0, 0])
        b = V[..., 1, 0] / a
        c = jnp.sqrt(jnp.maximum(V[..., 1, 1] - b * b, 1e-300 if V.dtype == jnp.float64 else 1e-30))
        z = jnp.zeros_like(a)
        return jnp.stack([jnp.stack([a, z], -1), jnp.stack([b, c], -1)], -2)
    return jnp.linalg.cholesky(V)


def sr_points_weights(m, V):
    """3rd-degree spherical-radial cubature for N(m, V): 2d points
    m ± √d·L eᵢ with equal weights 1/(2d)."""
    m = jnp.asarray(m)
    d = m.shape[-1]
    L = _cholsqrt(V)
    scaled = jnp.sqrt(jnp.asarray(d, dtype=m.dtype)) * L.T  # rows = √d Lᵀ_i
    pts = jnp.concatenate([m + scaled, m - scaled], axis=0)
    w = jnp.full((2 * d,), 1.0 / (2 * d), dtype=m.dtype)
    return pts, w


def ut_points_weights(m, V, alpha: float = 1e-3, beta: float = 2.0, kappa: float = 0.0):
    """Scaled unscented transform: 2d+1 points; returns (points, w_mean, w_cov)."""
    m = jnp.asarray(m)
    d = m.shape[-1]
    lam = alpha * alpha * (d + kappa) - d
    L = _cholsqrt(V)
    scale = jnp.sqrt(jnp.asarray(d + lam, dtype=m.dtype))
    offs = scale * L.T
    pts = jnp.concatenate([m[None, :], m + offs, m - offs], axis=0)
    wm0 = lam / (d + lam)
    wc0 = wm0 + (1.0 - alpha * alpha + beta)
    wi = 1.0 / (2.0 * (d + lam))
    w_mean = jnp.concatenate(
        [jnp.array([wm0], dtype=m.dtype), jnp.full((2 * d,), wi, dtype=m.dtype)]
    )
    w_cov = jnp.concatenate(
        [jnp.array([wc0], dtype=m.dtype), jnp.full((2 * d,), wi, dtype=m.dtype)]
    )
    return pts, w_mean, w_cov


def genut_points_weights_uni(m, V, S=None, K=None):
    """Univariate GenUT 3-point rule matching mean/var/skew/kurt
    (reference: ut_approx.jl:116-126). ``S``/``K`` are raw central moments
    μ3, μ4; Gaussian defaults are used when None."""
    m = jnp.asarray(m)
    V = jnp.asarray(V)
    S = jnp.zeros_like(V) if S is None else jnp.asarray(S)
    K = 3.0 * V * V if K is None else jnp.asarray(K)
    L = jnp.sqrt(V)
    invL3 = 1.0 / (L * L * L)
    u = 0.5 * (-S * invL3 + jnp.sqrt(4.0 * K / (V * V) - 3.0 * (S * invL3) ** 2))
    v = u + S * invL3
    aux = 1.0 / (v * (u + v))
    pts = jnp.stack([m, m - u * L, m + v * L])
    w = jnp.stack([1.0 - aux * (v / u + 1.0), (v / u) * aux, aux])
    return pts, w


def genut_points_weights_multi(m, V, S=None, K=None):
    """Multivariate GenUT 2d+1 asymmetric points
    (reference: ut_approx.jl:129-151). ``S``/``K`` are per-axis raw central
    moments; Gaussian defaults when None."""
    m = jnp.asarray(m)
    d = m.shape[-1]
    L = _cholsqrt(V)
    diagL = jnp.diagonal(L)
    # per-axis standardized skew/kurt in the Cholesky basis
    S = jnp.zeros((d,), dtype=m.dtype) if S is None else jnp.asarray(S)
    if K is None:
        K = 3.0 * diagL**4
    else:
        K = jnp.asarray(K)
    invL3_S = S / diagL**3
    invL4_K = K / diagL**4
    disc = 4.0 * invL4_K - 3.0 * invL3_S**2
    u = 0.5 * (-invL3_S + jnp.sqrt(disc))
    v = u + invL3_S
    pts_minus = m[None, :] - L.T * u[:, None]
    pts_plus = m[None, :] + L.T * v[:, None]
    pts = jnp.concatenate([m[None, :], pts_minus, pts_plus], axis=0)
    w_plus = 1.0 / (v * (u + v))
    w_minus = w_plus * (v / u)
    w0 = 1.0 - jnp.sum(w_plus) - jnp.sum(w_minus)
    w = jnp.concatenate([w0[None], w_minus, w_plus])
    return pts, w


# ---------------------------------------------------------------------------
# Uniform dispatch helpers
# ---------------------------------------------------------------------------


def points_weights_uni(method, m, v):
    if isinstance(method, GaussHermite):
        return gh_points_weights(method.n, m, v)
    if isinstance(method, GenUT):
        return genut_points_weights_uni(m, v)
    if isinstance(method, (SphericalRadial, Unscented)):
        m1 = jnp.reshape(jnp.asarray(m), (1,))
        V1 = jnp.reshape(jnp.asarray(v), (1, 1))
        if isinstance(method, SphericalRadial):
            pts, w = sr_points_weights(m1, V1)
            return pts[:, 0], w
        pts, wm, _ = ut_points_weights(m1, V1, method.alpha, method.beta, method.kappa)
        return pts[:, 0], wm
    raise TypeError(f"unknown method {method!r}")


def points_weights_multi(method, m, V):
    if isinstance(method, SphericalRadial):
        return sr_points_weights(m, V)
    if isinstance(method, Unscented):
        pts, wm, _ = ut_points_weights(m, V, method.alpha, method.beta, method.kappa)
        return pts, wm
    if isinstance(method, GenUT):
        return genut_points_weights_multi(m, V)
    raise TypeError(f"unsupported multivariate method {method!r}")


def points_weights_cov_multi(method, m, V):
    """(points, mean weights, COVARIANCE weights). For every rule except the
    classic UT the two weight sets coincide; the UT's central-moment weights
    differ at the center point by 1−α²+β (≈3 at the α=1e-3 default) — a
    second central moment contracted with the MEAN weights there is simply
    wrong, so covariance-computing consumers (moment_match_multi) must use
    this dispatch, not points_weights_multi."""
    if isinstance(method, Unscented):
        pts, wm, wc = ut_points_weights(m, V, method.alpha, method.beta,
                                        method.kappa)
        return pts, wm, wc
    pts, w = points_weights_multi(method, m, V)
    return pts, w, w


def expect_uni(method, f, m, v):
    """E_q[f(x)] for scalar q = N(m, v); f is vmapped over points
    (equivalent of approximate_kernel_expectation, UniSGPnode.jl:25-33)."""
    pts, w = points_weights_uni(method, m, v)
    vals = jax.vmap(f)(pts)
    return jnp.tensordot(w, vals, axes=1)


def expect_multi(method, f, m, V):
    """E_q[f(x)] for q = N(m, V) multivariate
    (equivalent of approximate_kernel_expectation, MultiSGPnode.jl:26-35)."""
    pts, w = points_weights_multi(method, m, V)
    vals = jax.vmap(f)(pts)
    return jnp.tensordot(w, vals, axes=1)


# ---------------------------------------------------------------------------
# Moment-matched products  q(x) ∝ N(x; m, v) · exp(logf(x))
# ---------------------------------------------------------------------------


def moment_match_uni(logf, m, v, n: int = 21, var_floor: float = 0.0):
    """Moment-match N(m,v)·exp(logf) with n-point GH.

    Equivalent of ReactiveMP ``prod(GenericProd, Normal, ContinuousUnivariateLogPdf)``
    via ``approximate_meancov(ghcubature(21), exp∘logpdf, left)``
    (reference: UniSGPnode.jl:39-54). NaN guard falls back to (m, v);
    ``var_floor`` reproduces the +1e-6 floor of the (Normal, LogPdf) order.
    """
    pts, w = gh_points_weights(n, m, v)
    lf = jax.vmap(logf)(pts)
    lmax = jnp.max(lf)
    # stabilized; reference exponentiates raw values. The double-where on
    # Z keeps the VJP clean when the product has zero quadrature mass:
    # mt = Σ/Z at Z = 0 is a NaN whose derivative (−Σ/Z²) would poison the
    # cotangent through the fallback where (0·NaN = NaN) — the EP-EM
    # trainers differentiate THROUGH this function (infer/pad_learn.py).
    lf = lf - jnp.where(jnp.isfinite(lmax), lmax, 0.0)
    f = jnp.exp(lf)
    Z = jnp.sum(w * f)
    ok_z = jnp.isfinite(Z) & (Z > 0)
    Zs = jnp.where(ok_z, Z, 1.0)
    mt = jnp.sum(w * f * pts) / Zs
    vt = jnp.sum(w * f * (pts - mt) ** 2) / Zs + var_floor
    good = ok_z & jnp.isfinite(mt) & jnp.isfinite(vt) & (vt > 0)
    m_out = jnp.where(good, mt, m)
    v_out = jnp.where(good, vt, v)
    return m_out, v_out


def moment_match_uni_logz(logf, m, v, n: int = 21):
    """Like :func:`moment_match_uni`, but also returns the tilted
    log-normalizer  log Z = log ∫ N(f; m, v) · exp(logf(f)) df  (by the same
    n-point GH rule). The normalizer is the per-site evidence contribution
    the EP chains need (infer/gppad.ep_chain_evidence) and the
    model-evidence tilt of the Bayesian-θ updates; moment_match_uni drops it
    because message products only need the moments. NaN guard falls back to
    (m, v, −inf) so a dead site scores itself out rather than poisoning the
    evidence sum."""
    pts, w = gh_points_weights(n, m, v)
    lf = jax.vmap(logf)(pts)
    lmax = jnp.max(lf)
    # same double-where discipline as moment_match_uni: zero-mass products
    # must not leak NaN/inf derivatives through the fallback wheres
    f = jnp.exp(lf - jnp.where(jnp.isfinite(lmax), lmax, 0.0))
    Z = jnp.sum(w * f)
    ok_z = jnp.isfinite(Z) & (Z > 0)
    Zs = jnp.where(ok_z, Z, 1.0)
    log_z = jnp.log(Zs) + lmax
    mt = jnp.sum(w * f * pts) / Zs
    vt = jnp.sum(w * f * (pts - mt) ** 2) / Zs
    good = ok_z & jnp.isfinite(mt) & jnp.isfinite(vt) & (vt > 0)
    return (jnp.where(good, mt, m), jnp.where(good, vt, v),
            jnp.where(good & jnp.isfinite(log_z), log_z, -jnp.inf))


def moment_match_multi(logf, m, V, method=SphericalRadial()):
    """Moment-match N(m,V)·exp(logf) with spherical-radial cubature.

    Equivalent of ``prod(GenericProd, MvNormal, ContinuousMultivariateLogPdf)``
    (reference: MultiSGPnode.jl:37-44). NaN guard falls back to (m, V).
    """
    pts, w, w_cov = points_weights_cov_multi(method, m, V)
    lf = jax.vmap(logf)(pts)
    lf = lf - jnp.max(lf)
    f = jnp.exp(lf)
    Z = jnp.sum(w * f)
    mt = (w * f) @ pts / Z
    diff = pts - mt[None, :]
    # central second moment uses the method's COVARIANCE weights (UT's
    # center weight differs from its mean weight by 1−α²+β)
    Vt = jnp.einsum("p,pi,pj->ij", w_cov * f, diff, diff) / Z
    # guard: with few cubature points a strongly-varying log-density makes the
    # matched covariance (near-)singular — fall back to the Gaussian factor,
    # mirroring the reference's overflow/NaN fallback (MultiSGPnode.jl:39-43).
    # Keep a relative floor so "barely PD" results remain usable downstream
    # (their cholsqrt feeds the next sweep's sigma points).
    d = m.shape[-1]
    floor = 1e-8 * jnp.trace(V) / d
    Vt = Vt + floor * jnp.eye(d, dtype=V.dtype)
    L = jnp.linalg.cholesky(Vt)
    good = (
        jnp.all(jnp.isfinite(mt))
        & jnp.all(jnp.isfinite(Vt))
        & jnp.all(jnp.isfinite(L))
        & (jnp.min(jnp.diagonal(L)) > jnp.sqrt(floor) * 0.5)
    )
    m_out = jnp.where(good, mt, m)
    V_out = jnp.where(good, Vt, V)
    return m_out, V_out


# ---------------------------------------------------------------------------
# GenUT statistics propagation (reference: ut_approx.jl:40-112)
# ---------------------------------------------------------------------------


def genut_statistics_uni(g, m, v, S=None, K=None, compute_cross: bool = True):
    """Propagate a univariate distribution through g with GenUT sigma points,
    returning (m̃, Ṽ, S̃, K̃, C̃) — transformed mean/var/3rd/4th central
    moments and the input-output cross-covariance
    (reference: unscented_statistics, ut_approx.jl:51-69)."""
    pts, w = genut_points_weights_uni(m, v, S, K)
    gs = jax.vmap(g)(pts)
    mt = jnp.sum(w * gs)
    d = gs - mt
    Vt = jnp.sum(w * d**2)
    St = jnp.sum(w * d**3)
    Kt = jnp.sum(w * d**4)
    Ct = jnp.sum(w * (pts - m) * d) if compute_cross else None
    return mt, Vt, St, Kt, Ct


def genut_statistics_multi(g, m, V, S=None, K=None, compute_cross: bool = True):
    """Multivariate GenUT propagation (reference: ut_approx.jl:72-91)."""
    pts, w = genut_points_weights_multi(m, V, S, K)
    gs = jax.vmap(g)(pts)
    mt = w @ gs
    d = gs - mt
    Vt = jnp.einsum("p,pi,pj->ij", w, d, d)
    St = jnp.einsum("p,pi->i", w, d**3)
    Kt = jnp.einsum("p,pi->i", w, d**4)
    Ct = jnp.einsum("p,pi,pj->ij", w, pts - m, d) if compute_cross else None
    return mt, Vt, St, Kt, Ct


def genut_expectation_uni(g, m, v, S=None, K=None):
    """E[g(x)] under GenUT points (reference: approximate_expectation,
    ut_approx.jl:19-26)."""
    pts, w = genut_points_weights_uni(m, v, S, K)
    return jnp.tensordot(w, jax.vmap(g)(pts), axes=1)


# ---------------------------------------------------------------------------
# GenUT over tuples of marginals (reference: ut_approx.jl:28-38, 93-112)
# ---------------------------------------------------------------------------


def _joint_from_marginals(marginals):
    """Build the block-diagonal joint of independent marginals.

    Each marginal is ``(m, V)`` or ``(m, V, S, K)`` with scalar or vector
    ``m`` (S/K are raw central 3rd/4th moments; Gaussian defaults when
    omitted). Returns (m, V, S, K, sizes) where ``sizes[i]`` is 0 for a
    scalar marginal (so sigma-point slices are unpacked back to scalars, the
    reference's ``__splitjoin``) and the marginal's dimension otherwise.
    Equivalent of the sparse ``blockdiag`` joint in ut_approx.jl:28-38.
    """
    ms, Vs, Ss, Ks, sizes = [], [], [], [], []
    for q in marginals:
        if len(q) not in (2, 4):
            raise ValueError(
                f"marginal tuples must be (m, V) or (m, V, S, K); got length "
                f"{len(q)} — a 3-tuple would silently drop the skewness"
            )
        m = jnp.asarray(q[0])
        V = jnp.asarray(q[1])
        scalar = m.ndim == 0
        d = 1 if scalar else m.shape[0]
        m1 = m.reshape(1) if scalar else m
        V1 = V.reshape(1, 1) if V.ndim < 2 else V
        if len(q) == 4 and q[2] is not None:
            S1 = jnp.asarray(q[2]).reshape(-1)
            K1 = jnp.asarray(q[3]).reshape(-1)
        else:
            S1 = jnp.zeros((d,), m1.dtype)
            # Gaussian default kurtosis in the CHOLESKY basis (3·diagL⁴),
            # matching genut_points_weights_multi's own K=None default — the
            # joint V is block-diagonal so its chol diagonal is the blockwise
            # chol diagonals. (3·diag(V)² is only equal for diagonal V; for
            # correlated marginals it overspreads the later axes and the
            # joint path's sigma points diverge from the direct path's —
            # measured 0.083 on a 2×2, worse vs an MC oracle.)
            K1 = 3.0 * jnp.diagonal(_cholsqrt(V1)) ** 4
        ms.append(m1)
        Vs.append(V1)
        Ss.append(S1)
        Ks.append(K1)
        sizes.append(0 if scalar else d)
    m = jnp.concatenate(ms)
    V = jax.scipy.linalg.block_diag(*Vs)
    S = jnp.concatenate(Ss)
    K = jnp.concatenate(Ks)
    return m, V, S, K, tuple(sizes)


def _split_point(pt, sizes):
    """Unpack one joint sigma point back into per-marginal args (the
    reference's ``__splitjoin``): 0-size entries become scalars."""
    parts = []
    off = 0
    for s in sizes:
        d = max(s, 1)
        piece = pt[off:off + d]
        parts.append(piece[0] if s == 0 else piece)
        off += d
    return tuple(parts)


def genut_expectation_joint(g, *marginals):
    """E[g(x₁, …, x_k)] for INDEPENDENT marginals via GenUT sigma points of
    the block-diagonal joint (reference: approximate_expectation tuple
    overload, ut_approx.jl:28-38). ``g`` receives one positional argument per
    marginal (scalars for scalar marginals)."""
    m, V, S, K, sizes = _joint_from_marginals(marginals)
    pts, w = genut_points_weights_multi(m, V, S, K)
    vals = jax.vmap(lambda p: g(*_split_point(p, sizes)))(pts)
    return jnp.tensordot(w, vals, axes=1)


def genut_statistics_joint(g, *marginals, compute_cross: bool = True):
    """Mixed-variate GenUT statistics propagation (reference:
    unscented_statistics tuple overload, ut_approx.jl:93-112): propagate the
    block-diagonal joint of the marginals through g and return
    (m̃, Ṽ, S̃, K̃, C̃) of z = g(x₁, …, x_k) plus the joint-input/output
    cross-covariance C̃ (used for statistical linearization)."""
    m, V, S, K, sizes = _joint_from_marginals(marginals)
    pts, w = genut_points_weights_multi(m, V, S, K)
    gs = jax.vmap(lambda p: jnp.atleast_1d(g(*_split_point(p, sizes))))(pts)
    mt = w @ gs
    d = gs - mt
    Vt = jnp.einsum("p,pi,pj->ij", w, d, d)
    St = jnp.einsum("p,pi->i", w, d**3)
    Kt = jnp.einsum("p,pi->i", w, d**4)
    Ct = jnp.einsum("p,pi,pj->ij", w, pts - m, d) if compute_cross else None
    return mt, Vt, St, Kt, Ct
