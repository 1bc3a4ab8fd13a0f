"""State-space (SDE) GP regression: Matérn-5/2 Kalman filtering + RTS
smoothing in one ``lax.scan`` pair.

TPU-native equivalent of the reference's legacy SDE notebook
``.ipynb_checkpoints/GPregress_SDE_M52-checkpoint.ipynb`` (Hartikainen &
Särkkä 2010): the Matérn-5/2 prior is EXACTLY the stationary distribution of
the 3-state linear SDE

    df = F f dt + L dβ,   F = [[0,1,0],[0,0,1],[−λ³,−3λ²,−3λ]],
    λ = √5/ℓ,  Qc = 16/3 σ² λ⁵,  H = [1,0,0]       (notebook cell 2)

so 1-D GP regression becomes an O(T) forward-backward sweep instead of an
O(T³) dense solve — a `lax.scan` chain like the repo's GPSSM smoother
(infer/chain_smoother.py), but with EXACT linear-Gaussian updates (no
cubature). The smoothed marginals and the prediction-error-decomposition
log-likelihood match the dense Matérn-5/2 GP to f64 round-off
(tests/test_sde_gp.py), which also makes the NLML differentiable for θ
learning — beyond the notebook, which smooths at fixed θ.

The stationary covariance has the closed form (verified against the
notebook's 9×9 Lyapunov solve, and by k's derivatives at 0):

    P∞ = σ² [[1, 0, −λ²/3], [0, λ²/3, 0], [−λ²/3, 0, λ⁴]].

Observations live on a subset of the timeline (the notebook observes 38 of
100 grid points): updates are mask-gated with branchless `jnp.where`.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.linalg import solve_psd

__all__ = ["matern52_ssm", "sde_gp_smooth", "sde_gp_nlml", "SDEGPResult"]


class SDEGPResult(NamedTuple):
    mean: jax.Array  # (T,) smoothed posterior mean of f over the timeline
    var: jax.Array  # (T,) smoothed posterior variance of f
    log_lik: jax.Array  # scalar marginal log-likelihood of the observations


def matern52_ssm(theta):
    """(F, P∞, H) of the Matérn-5/2 SDE for θ = [σ² (variance), ℓ].

    Matches the repo's ``Kernel("matern52")`` parameterization
    k(τ) = σ²(1 + λτ + λ²τ²/3)e^{−λτ}."""
    var, ell = theta[0], theta[1]
    lam = jnp.sqrt(5.0) / ell
    z = jnp.zeros((), var.dtype)
    one = jnp.ones((), var.dtype)
    F = jnp.stack([
        jnp.stack([z, one, z]),
        jnp.stack([z, z, one]),
        jnp.stack([-lam**3, -3.0 * lam**2, -3.0 * lam]),
    ])
    k2 = var * lam**2 / 3.0
    Pinf = jnp.stack([
        jnp.stack([var, z, -k2]),
        jnp.stack([z, k2, z]),
        jnp.stack([-k2, z, var * lam**4]),
    ])
    H = jnp.stack([one, z, z])
    return F, Pinf, H


def _discretize(F, Pinf, dts):
    """Per-step transition A_k = expm(F Δt_k) and exact process noise
    Q_k = P∞ − A_k P∞ A_kᵀ (stationarity — no Qc integral needed).

    expm is CLOSED FORM: the Matérn-5/2 companion matrix has the triple
    eigenvalue −λ, so by Cayley–Hamilton (F + λI)³ = 0 and
    expm(FΔ) = e^{−λΔ}(I + NΔ + N²Δ²/2) with nilpotent N = F + λI —
    exact to round-off, pure batched elementwise arithmetic. (The generic
    `jax.scipy.linalg.expm` Padé route needs an LU solve, which XLA:TPU
    implements only in f32 — it fails to compile the f64 batch.)"""
    lam = -F[2, 2] / 3.0  # companion last row is [−λ³, −3λ², −3λ]
    eye = jnp.eye(3, dtype=F.dtype)
    N = F + lam * eye
    N2 = N @ N
    d = dts[:, None, None]
    A = jnp.exp(-lam * d) * (eye + N * d + N2 * (0.5 * d * d))
    Q = Pinf[None] - jnp.einsum("tij,jk,tlk->til", A, Pinf, A)
    return A, Q


@partial(jax.jit, static_argnames=("parallel",))
def sde_gp_smooth(theta, t, y, obs_mask, obs_var,
                  parallel: bool = False) -> SDEGPResult:
    """Exact GP regression on a 1-D timeline by Kalman + RTS smoothing.

    ``t``: (T,) increasing timeline; ``y``: (T,) observations (entries where
    ``obs_mask`` is False are ignored); ``obs_var``: Gaussian noise variance
    — a scalar, or a (T,) array of PER-POINT variances (heteroscedastic
    pseudo-observations, the form the GP-PAD EP loop feeds back).
    Returns smoothed (mean, var) of f at EVERY timeline point and the
    marginal log-likelihood Σ_obs log N(y_k; Hm⁻_k, HP⁻_kHᵀ + R).

    ``parallel=True`` runs the PARALLEL-IN-TIME form (associative scans,
    O(log T) depth — :func:`_smooth_parallel`) instead of the sequential
    `lax.scan` pair: identical results to round-off, but the chain no
    longer serializes the device at audio-scale T (GP-PAD's natural
    regime). Both forms are differentiable.
    """
    t = jnp.asarray(t)
    y = jnp.asarray(y, t.dtype)
    mask = jnp.asarray(obs_mask, t.dtype)
    R = jnp.broadcast_to(jnp.asarray(obs_var, t.dtype), y.shape)
    F, Pinf, H = matern52_ssm(jnp.asarray(theta, t.dtype))
    A, Q = _discretize(F, Pinf, jnp.diff(t))
    if parallel:
        return _smooth_parallel(A, Q, Pinf, y, mask, R)

    def update(m_pred, P_pred, yk, mk, rk):
        s = H @ P_pred @ H + rk
        k_gain = (P_pred @ H) / s
        resid = yk - H @ m_pred
        m_upd = m_pred + k_gain * resid
        P_upd = P_pred - jnp.outer(k_gain, k_gain) * s
        ll = -0.5 * (jnp.log(2.0 * jnp.pi * s) + resid**2 / s)
        m = jnp.where(mk > 0, m_upd, m_pred)
        P = jnp.where(mk > 0, P_upd, P_pred)
        return m, P, mk * ll

    # t[0]: stationary prior N(0, P∞) (propagating from time 0 keeps P∞,
    # notebook cell 4's f_0 ~ MvN(0, P∞))
    m0, P0, ll0 = update(jnp.zeros(3, t.dtype), Pinf, y[0], mask[0], R[0])

    def fwd(carry, inp):
        m, P, ll = carry
        Ak, Qk, yk, mk, rk = inp
        m_pred = Ak @ m
        P_pred = Ak @ P @ Ak.T + Qk
        m_new, P_new, llk = update(m_pred, P_pred, yk, mk, rk)
        return (m_new, P_new, ll + llk), (m_new, P_new, m_pred, P_pred)

    (_, _, log_lik), (ms, Ps, mps, Pps) = jax.lax.scan(
        fwd, (m0, P0, ll0), (A, Q, y[1:], mask[1:], R[1:]))
    # prepend the t[0] filtered state
    ms = jnp.concatenate([m0[None], ms])
    Ps = jnp.concatenate([P0[None], Ps])

    def bwd(carry, inp):
        ms_next, Ps_next = carry
        m, P, Ak, m_pred, P_pred = inp
        G = solve_psd(P_pred, Ak @ P).T  # P Aᵀ P_pred⁻¹
        m_s = m + G @ (ms_next - m_pred)
        P_s = P + G @ (Ps_next - P_pred) @ G.T
        return (m_s, P_s), (m_s, P_s)

    (_, _), (sm, sP) = jax.lax.scan(
        bwd, (ms[-1], Ps[-1]), (ms[:-1], Ps[:-1], A, mps, Pps), reverse=True)
    sm = jnp.concatenate([sm, ms[-1][None]])
    sP = jnp.concatenate([sP, Ps[-1][None]])
    return SDEGPResult(mean=sm[:, 0], var=sP[:, 0, 0], log_lik=log_lik)


def _inv33(m):
    """Batched closed-form 3×3 inverse (adjugate / determinant).

    TPU constraint: `jnp.linalg.solve` lowers to LuDecomposition, which XLA
    implements only for f32/c64 on TPU — the f64 batched solves the
    parallel smoother needs fail to compile. Every matrix inverted here is
    I + (covariance)·(information) or an SPD predictive covariance, both
    well-conditioned at the smoother's scales, so the explicit adjugate is
    accurate in f64 (parallel ≡ sequential to ~1e-9, the same bound as the
    LU version achieved on CPU) and is pure elementwise arithmetic — no
    LAPACK dispatch on CPU, no unsupported decomposition on TPU."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    c00 = e * i - f * h
    c01 = f * g - d * i
    c02 = d * h - e * g
    c10 = c * h - b * i
    c11 = a * i - c * g
    c12 = b * g - a * h
    c20 = b * f - c * e
    c21 = c * d - a * f
    c22 = a * e - b * d
    det = a * c00 + b * c01 + c * c02
    inv = jnp.stack([jnp.stack([c00, c10, c20], -1),
                     jnp.stack([c01, c11, c21], -1),
                     jnp.stack([c02, c12, c22], -1)], -2)
    return inv / det[..., None, None]


def _smooth_parallel(A, Q, Pinf, y, mask, R) -> SDEGPResult:
    """Parallel-in-time Kalman filter + RTS smoother by associative scans
    (Särkkä & García-Fernández 2021, "Temporal parallelization of Bayesian
    smoothers" — a PUBLIC algorithm; the reference has no counterpart).

    TPU rationale: the sequential `lax.scan` chain issues T dependent
    3×3-matrix steps — at audio-scale T (GP-PAD demodulates signals, its
    natural T is 10⁵–10⁶) the device spends the whole smoother at depth T
    with ~nothing on the MXU. `associative_scan` restructures both sweeps
    to O(log T) depth of BATCHED 3×3 ops, which XLA fuses into a handful of
    large kernels. Equal to the sequential pair to f64 round-off, including
    masked points, heteroscedastic R, and gradients
    (tests/test_sde_gp.py::TestParallelSmoother).

    Filter elements per step k — observed: a_k = (I−K_kH)A_k, b_k = K_k y_k,
    C_k = (I−K_kH)Q_k, η_k = A_kᵀHᵀy_k/S_k, J_k = A_kᵀHᵀHA_k/S_k with
    S_k = HQ_kHᵀ + R_k; masked: the pure-prediction element
    (A_k, 0, Q_k, 0, 0). H = [1,0,0] means every HX is a row slice — no
    H-matmuls materialize. The k=0 element folds the stationary prior:
    a_0 = 0, b_0/C_0 the prior updated by y_0 (or the prior itself when
    masked). The combination is the paper's eq. (10); filtered marginals
    are the prefix (b, C)."""
    dt = y.dtype
    T = y.shape[0]
    I3 = jnp.eye(3, dtype=dt)

    # --- element construction (k ≥ 1), batched over the T−1 steps ---
    S = Q[:, 0, 0] + R[1:]                    # HQHᵀ + R, (T−1,)
    K = Q[:, :, 0] / S[:, None]               # QHᵀ/S, (T−1, 3)
    HA = A[:, 0, :]                           # (T−1, 3)
    a_obs = A - K[:, :, None] * HA[:, None, :]
    b_obs = K * y[1:, None]
    C_obs = Q - K[:, :, None] * Q[:, None, 0, :]
    eta_obs = HA * (y[1:] / S)[:, None]
    J_obs = HA[:, :, None] * HA[:, None, :] / S[:, None, None]
    mk = mask[1:]
    a_el = jnp.where(mk[:, None, None] > 0, a_obs, A)
    b_el = jnp.where(mk[:, None] > 0, b_obs, 0.0)
    C_el = jnp.where(mk[:, None, None] > 0, C_obs, Q)
    eta_el = jnp.where(mk[:, None] > 0, eta_obs, 0.0)
    J_el = jnp.where(mk[:, None, None] > 0, J_obs, 0.0)
    # --- k = 0: stationary prior N(0, P∞), optionally updated by y_0 ---
    S0 = Pinf[0, 0] + R[0]
    K0 = Pinf[:, 0] / S0
    b0 = jnp.where(mask[0] > 0, K0 * y[0], jnp.zeros(3, dt))
    C0 = jnp.where(mask[0] > 0,
                   Pinf - jnp.outer(K0, K0) * S0, Pinf)
    a_el = jnp.concatenate([jnp.zeros((1, 3, 3), dt), a_el])
    b_el = jnp.concatenate([b0[None], b_el])
    C_el = jnp.concatenate([C0[None], C_el])
    eta_el = jnp.concatenate([jnp.zeros((1, 3), dt), eta_el])
    J_el = jnp.concatenate([jnp.zeros((1, 3, 3), dt), J_el])

    def fcomb(e1, e2):
        a1, b1, c1, h1, j1 = e1
        a2, b2, c2, h2, j2 = e2
        # a2 (I + c1 j2)⁻¹ and (I + j2 c1)⁻¹ via the closed-form 3×3
        # inverse (_inv33 — TPU has no f64 LU)
        a2d = a2 @ _inv33(I3 + c1 @ j2)
        ninv = _inv33(I3 + j2 @ c1)
        a12 = a2d @ a1
        b12 = (a2d @ (b1 + (c1 @ h2[..., None])[..., 0])[..., None]
               )[..., 0] + b2
        c12 = a2d @ c1 @ jnp.swapaxes(a2, -1, -2) + c2
        rhs = h2 - (j2 @ b1[..., None])[..., 0]
        t1 = (ninv @ rhs[..., None])[..., 0]
        h12 = (jnp.swapaxes(a1, -1, -2) @ t1[..., None])[..., 0] + h1
        j12 = (jnp.swapaxes(a1, -1, -2) @ (ninv @ j2)) @ a1 + j1
        return a12, b12, c12, h12, j12

    _, fm, fP, _, _ = jax.lax.associative_scan(
        fcomb, (a_el, b_el, C_el, eta_el, J_el))

    # --- marginal log-likelihood from the one-step predictives ---
    mp = jnp.concatenate([jnp.zeros((1, 3), dt),
                          (A @ fm[:-1, :, None])[..., 0]])
    Pp = jnp.concatenate([Pinf[None],
                          A @ fP[:-1] @ jnp.swapaxes(A, -1, -2) + Q])
    s_pred = Pp[:, 0, 0] + R
    resid = y - mp[:, 0]
    ll = jnp.sum(mask * (-0.5) * (jnp.log(2.0 * jnp.pi * s_pred)
                                  + resid * resid / s_pred))

    # --- smoother elements (paper eq. (21)): suffix associative scan ---
    G = jnp.swapaxes(_inv33(Pp[1:]) @ (A @ fP[:-1]), -1, -2)
    E = jnp.concatenate([G, jnp.zeros((1, 3, 3), dt)])
    g = jnp.concatenate([fm[:-1] - (G @ mp[1:, :, None])[..., 0],
                         fm[-1][None]])
    L = jnp.concatenate([fP[:-1] - G @ Pp[1:] @ jnp.swapaxes(G, -1, -2),
                         fP[-1][None]])

    def scomb(later, earlier):
        # reverse=True hands the accumulated LATER suffix as the first
        # argument; the smoothing composition is earlier ∘ later
        E1, g1, L1 = later
        E2, g2, L2 = earlier
        return (E2 @ E1, (E2 @ g1[..., None])[..., 0] + g2,
                E2 @ L1 @ jnp.swapaxes(E2, -1, -2) + L2)

    _, sm, sP = jax.lax.associative_scan(scomb, (E, g, L), reverse=True)
    return SDEGPResult(mean=sm[:, 0], var=sP[:, 0, 0], log_lik=ll)


def sde_gp_nlml(theta, t, y, obs_mask, obs_var):
    """Differentiable −log p(y | θ) via the prediction-error decomposition —
    enables O(T) gradient-based θ learning the legacy notebook lacks."""
    return -sde_gp_smooth(theta, t, y, obs_mask, obs_var).log_lik
