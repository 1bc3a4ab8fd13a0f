"""Parallel-in-time GPSSM smoothing: SLR + associative-scan LGSSM sweeps.

The Jacobi engine (infer/chain_smoother.gpssm_vmp) is fully parallel PER
sweep, but information travels ~one chain step per sweep, so long chains
(T ≫ the reference's 300; Pendulum_Wishart_2d.ipynb cells 12-16) need
O(correlation-length) sweeps from a cold start. This engine replaces the
cold-start propagation with GLOBAL smoothing sweeps:

  1. **Statistically linearize** the GP transition at the current marginals:
     the spherical-radial sigma points the Jacobi sweep already uses for its
     out-messages give, per t, the joint Gaussian approximation of
     (x_{t-1}, m(x_{t-1})) with m(x) = E_q[v]ᵀ K(Xu, x) — i.e. a
     time-varying linear model x_t ≈ A_t x_{t-1} + b_t + ε_t,
     ε_t ~ N(0, Ω_t + W̄⁻¹) with Ω_t the SLR residual.
  2. **One parallel LGSSM smooth** (associative scans, O(log T) depth —
     Särkkä & García-Fernández 2021, the same machinery as
     infer/sde_gp._smooth_parallel but for general small D and time-varying
     transitions) replaces the per-sweep q(x) update: information from every
     observation reaches every state in ONE sweep.
  3. q(v) / q(W) update from the smoothed marginals via the shared
     :func:`~.chain_smoother.chain_qv_qw_updates` core.

After ``n_pit`` such sweeps the state is handed to the EXACT Jacobi map
(``gpssm_vmp`` with ``init_state``) for ``n_polish`` sweeps — the
LGSSM sweep is an accelerator, not a new objective: the returned state is a
fixed point of the same mean-field map, so "PIT ≡ Jacobi" holds to the
fixed point's round-off (tests/test_pit_gpssm.py), while the cold-start
sweep count collapses from O(T-ish) to a handful.

Reference semantics: Pendulum_Wishart_2d.ipynb cells 12-16 (the chain
model, its mean-field constraint and VMP iteration); the reference has no
parallel-in-time counterpart (SURVEY §2.9: no parallelism of any kind).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..dists import MvGaussianNat
from ..nodes.multisgp import _split_blocks
from ..ops import quadrature as quad
from ..ops.linalg import cholinv, spd_clamp, sym
from .chain_smoother import (
    GPSSMState,
    _qv_stats,
    chain_qv_qw_updates,
    gpssm_free_energy,
    gpssm_vmp,
)

__all__ = ["gpssm_vmp_pit", "slr_transition", "parallel_lgssm_smooth"]


def _inv_batched(m):
    """Batched closed-form small-D inverse (adjugate / determinant).

    TPU constraint (same as infer/sde_gp._inv33): XLA:TPU implements
    LuDecomposition only for f32/c64, so batched f64 `jnp.linalg.inv`/
    `solve` inside the associative scan do not compile. Every matrix
    inverted here is an SPD predictive/innovation covariance or
    I + (cov)·(information) at the smoother's scales, where the unpivoted
    adjugate is accurate in f64 (verified parallel ≡ sequential to ~1e-9
    incl. short lengthscales, tests/test_sde_gp.py). D ≤ 3 covers every
    reference GPSSM (pendulum D=2); larger D falls back to LU (CPU-only
    in f64)."""
    D = m.shape[-1]
    if D == 1:
        return 1.0 / m
    if D == 2:
        a, b = m[..., 0, 0], m[..., 0, 1]
        c, d = m[..., 1, 0], m[..., 1, 1]
        det = a * d - b * c
        inv = jnp.stack([jnp.stack([d, -b], -1),
                         jnp.stack([-c, a], -1)], -2)
        return inv / det[..., None, None]
    if D == 3:
        from .sde_gp import _inv33

        return _inv33(m)
    return jnp.linalg.inv(m)


def slr_transition(kernel, theta, Xu, method, mu_blocks, means, covs,
                   jitter_frac: float = 1e-9):
    """Statistical linear regression of the GP posterior-mean transition
    m(x) = mu_blocksᵀ-blocked K(Xu, x) under each q(x_{t-1}) = N(m_t, V_t).

    Returns (A, b, Omega): per-t gain (T,D,D), offset (T,D) and the PSD SLR
    residual Var_q[m] − A V Aᵀ (T,D,D) — the moment-matched linear model
    x_t ≈ A_t x_{t-1} + b_t + ε with Var ε ⊇ Omega_t. Uses the same sigma
    points as the Jacobi sweep's out-message (ONE Gram over all T·P points).
    """
    T, D = means.shape
    pts, w = jax.vmap(
        lambda m, V: quad.points_weights_multi(method, m, V)
    )(means, covs)
    w = w[0]  # identical across t for SR/UT
    P = pts.shape[1]
    K = kernel(theta, Xu, pts.reshape(T * P, D))  # (M, T·P): one MXU Gram
    Kp = K.reshape(-1, T, P)
    f = jnp.einsum("dm,mtp->tpd", mu_blocks, Kp)  # transition at each point
    mu_f = jnp.einsum("tpd,p->td", f, w)
    dx = pts - means[:, None, :]
    df = f - mu_f[:, None, :]
    C = jnp.einsum("tpa,tpb,p->tab", dx, df, w)  # Cov[x, m(x)]
    S_f = jnp.einsum("tpa,tpb,p->tab", df, df, w)  # Var[m(x)]
    A = jnp.swapaxes(_inv_batched(sym(covs)) @ C, -1, -2)  # Cᵀ V⁻¹
    b = mu_f - (A @ means[..., None])[..., 0]
    # SLR residual: PSD for exact moments (Schur complement of the joint);
    # cubature can leave tiny negative eigenvalues — floor with a relative
    # jitter so the filter's innovation stays SPD.
    resid = sym(S_f - A @ C)
    tr = jnp.trace(resid, axis1=-2, axis2=-1)[..., None, None]
    eye = jnp.eye(D, dtype=means.dtype)
    omega = resid + jitter_frac * jnp.maximum(tr, 1.0) * eye
    return A, b, omega


def parallel_lgssm_smooth(A, b, Q, m0, V0, ys, R_obs):
    """Parallel-in-time Kalman filter + RTS smoother for a time-varying
    linear-Gaussian chain with H = I observations at every step:

        x_0 ~ N(m0, V0);  x_t = A_t x_{t-1} + b_t + N(0, Q_t);
        y_t = x_t + N(0, R)                                   t = 1..T

    by two `lax.associative_scan`s (Särkkä & García-Fernández 2021, eqs.
    (10)/(21)) — O(log T) depth of batched D×D ops instead of a length-T
    sequential scan. Returns smoothed (means (T+1,D), covs (T+1,D,D))
    including the t=0 prior state. A/b/Q are (T,D,D)/(T,D)/(T,D,D);
    ``R_obs`` is the (D,D) observation covariance.
    """
    T, D = ys.shape
    dt = ys.dtype
    I = jnp.eye(D, dtype=dt)

    # --- filter elements, k = 1..T (observed, H = I) ---
    S = Q + R_obs  # innovation covariance given a PointMass predecessor
    Sinv = _inv_batched(S)
    K = Q @ Sinv
    ImK = I - K
    a_el = ImK @ A
    resid0 = ys - b
    b_el = b + (K @ resid0[..., None])[..., 0]
    C_el = sym(ImK @ Q)
    At = jnp.swapaxes(A, -1, -2)
    eta_el = (At @ (Sinv @ resid0[..., None]))[..., 0]
    J_el = At @ Sinv @ A
    # --- k = 0: the prior N(m0, V0) (x_prev carries no observation) ---
    a_el = jnp.concatenate([jnp.zeros((1, D, D), dt), a_el])
    b_el = jnp.concatenate([m0[None], b_el])
    C_el = jnp.concatenate([V0[None], C_el])
    eta_el = jnp.concatenate([jnp.zeros((1, D), dt), eta_el])
    J_el = jnp.concatenate([jnp.zeros((1, D, D), dt), J_el])

    def fcomb(e1, e2):
        a1, b1, c1, h1, j1 = e1
        a2, b2, c2, h2, j2 = e2
        a2d = a2 @ _inv_batched(jnp.eye(D, dtype=dt) + c1 @ j2)
        ninv = _inv_batched(jnp.eye(D, dtype=dt) + j2 @ c1)
        a12 = a2d @ a1
        b12 = (a2d @ (b1 + (c1 @ h2[..., None])[..., 0])[..., None])[..., 0] + b2
        c12 = a2d @ c1 @ jnp.swapaxes(a2, -1, -2) + c2
        rhs = h2 - (j2 @ b1[..., None])[..., 0]
        t1 = (ninv @ rhs[..., None])[..., 0]
        h12 = (jnp.swapaxes(a1, -1, -2) @ t1[..., None])[..., 0] + h1
        j12 = (jnp.swapaxes(a1, -1, -2) @ (ninv @ j2)) @ a1 + j1
        return a12, b12, c12, h12, j12

    _, fm, fP, _, _ = jax.lax.associative_scan(
        fcomb, (a_el, b_el, C_el, eta_el, J_el))

    # one-step predictives for k = 1..T (from the filtered k-1 state)
    mp = (A @ fm[:-1, :, None])[..., 0] + b
    Pp = A @ fP[:-1] @ At + Q

    # --- smoother elements (paper eq. (21)): suffix associative scan ---
    G = jnp.swapaxes(_inv_batched(sym(Pp)) @ (A @ fP[:-1]), -1, -2)
    E = jnp.concatenate([G, jnp.zeros((1, D, D), dt)])
    g = jnp.concatenate([fm[:-1] - (G @ mp[..., None])[..., 0], fm[-1][None]])
    L = jnp.concatenate(
        [fP[:-1] - G @ Pp @ jnp.swapaxes(G, -1, -2), fP[-1][None]])

    def scomb(later, earlier):
        E1, g1, L1 = later
        E2, g2, L2 = earlier
        return (E2 @ E1, (E2 @ g1[..., None])[..., 0] + g2,
                E2 @ L1 @ jnp.swapaxes(E2, -1, -2) + L2)

    _, sm, sP = jax.lax.associative_scan(scomb, (E, g, L), reverse=True)
    return sm, jax.vmap(sym)(sP)


@partial(jax.jit, static_argnames=("kernel", "n_pit"))
def _pit_sweeps(kernel, theta, Xu, ys, P, prior_x0_mean, prior_x0_cov,
                prior_v, prior_W_df, prior_W_scale, state0, n_pit):
    """``n_pit`` SLR + parallel-smooth sweeps (the accelerator half)."""
    T, D = ys.shape
    M = Xu.shape[0]
    dt = ys.dtype
    sr = quad.SphericalRadial()
    from .chain_smoother import _kuu_inv_f64

    kernel_kuu_inv = _kuu_inv_f64(kernel, theta, Xu, dt)
    S0_inv = cholinv(sym(prior_W_scale))

    def sweep(state, _):
        mu_v, _ = _qv_stats(state.xi_v, state.prec_v)
        W_mean = state.W_df * cholinv(sym(state.W_rate))
        W_inv = cholinv(sym(W_mean))
        mu_blocks = _split_blocks(mu_v, M, D)
        A, b, omega = slr_transition(
            kernel, theta, Xu, sr, mu_blocks,
            state.x_means[:-1], state.x_covs[:-1],
        )
        # transition noise = the VMP out-message's W̄⁻¹ plus the SLR residual
        sm, sP = parallel_lgssm_smooth(
            A, b, omega + W_inv, prior_x0_mean, prior_x0_cov, ys, P)
        # SPD GUARD on the smoothed covariances: the smoother gain's
        # fP − G·Pp·Gᵀ cancellation can leave NEGATIVE eigenvalues at
        # reduced effective precision — on the TPU backend's emulated f64
        # these NaN the next consumer Cholesky (sigma points in the Ψ-stats
        # and the next sweep's SLR) while CPU f64 happens to stay positive;
        # measured at T=2048 (benchmarks/pit_gpssm_r5.json r4 debug). The
        # r4 1e-9-relative diagonal lift was NOT enough on the device (the
        # r5 T=2048 TPU run still NaN'd — deficits beyond the lift, exactly
        # advisor r4 #3's warning), so this is an eigenvalue CLAMP
        # (ops/linalg.spd_clamp): repairs arbitrary indefiniteness, and at
        # λ ≥ 1e-9·max(tr, 1e-6) it is far inside the fixed point's
        # tolerance; the polish sweeps (exact Jacobi) are unaffected.
        trP = jnp.trace(sP, axis1=-2, axis2=-1)[..., None, None]
        sP = spd_clamp(sP, 1e-9 * jnp.maximum(trP[..., 0, 0], 1e-6))
        xi_v, prec_v, W_df, W_rate = chain_qv_qw_updates(
            kernel, theta, Xu, sr, kernel_kuu_inv, prior_v, S0_inv,
            prior_W_df, T, sm[:-1], sP[:-1], sm[1:], sP[1:], W_mean, dt,
        )
        return GPSSMState(sm, sP, xi_v, prec_v, W_df, W_rate), None

    state, _ = jax.lax.scan(sweep, state0, None, length=n_pit)
    return state


def gpssm_vmp_pit(
    kernel,
    theta,
    Xu,
    ys,
    P,
    prior_x0_mean,
    prior_x0_cov,
    prior_v: MvGaussianNat,
    prior_W_df,
    prior_W_scale,
    init_x_cov_scale: float = 50.0,
    n_pit: int = 4,
    n_polish: int = 20,
    compute_fe: bool = True,
    init_state: "GPSSMState | None" = None,
):
    """Parallel-in-time GPSSM inference: ``n_pit`` SLR/parallel-smooth
    sweeps, then ``n_polish`` EXACT Jacobi sweeps of the mean-field map —
    the returned state is a fixed point of the SAME map as
    :func:`~.chain_smoother.gpssm_vmp` (equivalence tested to its round-off
    at T=300-class chains), reached in O(n_pit + n_polish) sweeps instead
    of the cold Jacobi O(correlation length). Two jitted programs (the PIT
    scan and the Jacobi scan), so the compile stays modest."""
    T, D = ys.shape
    dt = ys.dtype
    if init_state is None:
        S0_inv = cholinv(sym(prior_W_scale))
        x_means0 = jnp.concatenate(
            [prior_x0_mean[None, :], jnp.zeros((T, D), dt)], 0)
        x_covs0 = jnp.concatenate(
            [prior_x0_cov[None, :, :],
             jnp.tile(init_x_cov_scale * jnp.eye(D, dtype=dt), (T, 1, 1))], 0)
        init_state = GPSSMState(
            x_means0, x_covs0, prior_v.xi, prior_v.prec,
            jnp.asarray(prior_W_df, dt), S0_inv,
        )
    state = _pit_sweeps(
        kernel, theta, Xu, ys, P, prior_x0_mean, prior_x0_cov, prior_v,
        prior_W_df, prior_W_scale, init_state, n_pit,
    )
    if n_polish > 0:
        return gpssm_vmp(
            kernel, theta, Xu, ys, P, prior_x0_mean, prior_x0_cov, prior_v,
            prior_W_df, prior_W_scale, n_iters=n_polish,
            compute_fe=compute_fe, init_state=state,
        )
    fe = jnp.asarray(0.0, dt)
    if compute_fe:
        fe = gpssm_free_energy(
            kernel, theta, Xu, ys, P, prior_x0_mean, prior_x0_cov, prior_v,
            prior_W_df, prior_W_scale, state,
        )
    return state, fe
