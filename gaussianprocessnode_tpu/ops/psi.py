"""Ψ-statistics: exact and expected kernel statistics (L3 support).

The reference computes, per datum, with a Julia closure loop over sigma
points (GPnode/UniSGPnode.jl:11-33, MultiSGPnode.jl:11-35):

    Ψ0 = E_q[k(x,x)]
    Ψ1 = E_q[k(Xu,x)]            (M,)
    Ψ2 = E_q[k(Xu,x) k(x,Xu)]    (M,M)

TPU-native design: materialize ALL sigma points of ALL data at once and
evaluate ONE Gram matrix K(Xu, points) — a single MXU matmul — then contract
with the quadrature weights (einsum). No per-point closures, no caches.
"""

import jax
import jax.numpy as jnp

from . import quadrature as quad

__all__ = [
    "psi1_exact",
    "psi_expected_uni",
    "psi_expected_multi",
    "psi1_expected_multi",
    "psi_batch_exact",
    "psi_batch_expected_uni",
    "psi_batch_expected_multi",
]


def psi1_exact(kernel, theta, Xu, x):
    """K(Xu, x) for a single observed input x (D,) → (M,)."""
    return kernel(theta, Xu, x[None, :])[:, 0]


def _psi_from_points(kernel, theta, Xu, pts, w):
    """Common contraction: pts (P,Din), w (P,) → (psi0, psi1 (M,), psi2 (M,M))."""
    K = kernel(theta, Xu, pts)  # (M, P) — one MXU matmul inside
    kdiag = kernel.diag(theta, pts)  # (P,) — σ² for stationary kernels
    psi0 = jnp.dot(w, kdiag)
    psi1 = K @ w
    psi2 = (K * w[None, :]) @ K.T
    return psi0, psi1, psi2


def psi_expected_uni(kernel, theta, Xu, method, m, v):
    """Expected Ψ's under scalar q(x)=N(m,v). Xu is (M,1)."""
    pts, w = quad.points_weights_uni(method, m, v)
    return _psi_from_points(kernel, theta, Xu, pts[:, None], w)


def psi_expected_multi(kernel, theta, Xu, method, m, V):
    """Expected Ψ's under q(x)=N(m,V), m (Din,). Xu is (M,Din)."""
    pts, w = quad.points_weights_multi(method, m, V)
    return _psi_from_points(kernel, theta, Xu, pts, w)


def psi1_expected_multi(kernel, theta, Xu, method, m, V):
    """Ψ1 only (M,) — for consumers of just the forward mean (the MultiSGP
    :out rule / GPSSM filter), which otherwise pay Ψ2's (M,P)×(P,M) GEMM
    for nothing."""
    pts, w = quad.points_weights_multi(method, m, V)
    return kernel(theta, Xu, pts) @ w


def psi_batch_exact(kernel, theta, Xu, X):
    """Observed inputs X (N,Din) → (kxx (N,), Kux (M,N)).

    Per-datum Ψ2ᵢ = Kux[:,i] Kux[:,i]ᵀ is never materialized; downstream
    contractions consume Kux directly (e.g. ΣᵢcᵢΨ2ᵢ = Kux·diag(c)·Kuxᵀ).
    """
    Kux = kernel(theta, Xu, X)
    kxx = kernel.diag(theta, X)
    return kxx, Kux


def psi_batch_expected_uni(kernel, theta, Xu, method, m, v):
    """Batched expected Ψ's for N univariate Gaussians m (N,), v (N,).

    Returns (psi0 (N,), psi1 (M,N), Kp (M,N,P), w (P,)) where per-datum
    Ψ2ᵢ = Σₚ wₚ Kp[:,i,p] Kp[:,i,p]ᵀ. The big Gram over all N·P sigma points
    is one MXU matmul.
    """
    z, w = quad.points_weights_uni(method, 0.0, 1.0)  # standard points
    # affine transform per datum: x_ip = m_i + sqrt(v_i) z_p
    pts = m[:, None] + jnp.sqrt(v)[:, None] * z[None, :]  # (N, P)
    N, P = pts.shape
    K = kernel(theta, Xu, pts.reshape(N * P, 1))  # (M, N*P)
    Kp = K.reshape(-1, N, P)
    kdiag = kernel.diag(theta, pts.reshape(N * P, 1)).reshape(N, P)
    psi0 = kdiag @ w
    psi1 = jnp.einsum("mnp,p->mn", Kp, w)
    return psi0, psi1, Kp, w


def psi_batch_expected_multi(kernel, theta, Xu, method, means, covs):
    """Batched expected Ψ's for N multivariate Gaussians means (N,Din),
    covs (N,Din,Din). Returns (psi0 (N,), psi1 (M,N), Kp (M,N,P), w (P,))."""
    pts, w = jax.vmap(lambda m, V: quad.points_weights_multi(method, m, V))(means, covs)
    w = w[0]  # weights identical across data for SR/UT/GenUT-Gaussian
    N, P, Din = pts.shape
    K = kernel(theta, Xu, pts.reshape(N * P, Din))
    Kp = K.reshape(-1, N, P)
    kdiag = kernel.diag(theta, pts.reshape(N * P, Din)).reshape(N, P)
    psi0 = kdiag @ w
    psi1 = jnp.einsum("mnp,p->mn", Kp, w)
    return psi0, psi1, Kp, w


def sum_weighted_psi2(Kp, w, c):
    """Σᵢ cᵢ Ψ2ᵢ from the point Gram Kp (M,N,P): one reshaped GEMM.

    HIGHEST precision is load-bearing, not a nicety: the TPU backend's
    default matmul precision runs f64 operands through f32 passes, and at
    long reductions (N·P ≈ 8k for the T=2048 GPSSM chain) the ~4e-7
    relative error (~2e-2 absolute at the chain's Λ_v scale) exceeds the
    accumulated precision's true λ_min (the prior's 1/50) — the device
    Λ_v came out INDEFINITE and every downstream Cholesky NaN'd while CPU
    f64 was fine (round-5 device debug; the r4/r5 PIT NaNs' root cause)."""
    M, N, P = Kp.shape
    A = Kp.reshape(M, N * P)
    scale = (c[:, None] * w[None, :]).reshape(N * P)
    return jnp.matmul(A * scale[None, :], A.T,
                      precision=jax.lax.Precision.HIGHEST)


def per_datum_psi2(Kp, w):
    """Ψ2ᵢ for every datum: (N,M,M). Use only for small N (e.g. tests)."""
    return jnp.einsum("mnp,p,qnp->nmq", Kp, w, Kp)
