"""UT smoother baseline: VMP with a known nonlinear transition.

Equivalent of the reference's ``VMPsmoothing`` model
(Pendulum_Wishart_2d.ipynb cells 26-27): x_t ~ MvN(g(x_{t-1}), W⁻¹) with the
transition g handled by the unscented transform (ReactiveMP DeltaNode UT
meta), y_t ~ MvN(x_t, P), W ~ Wishart, mean-field q(x)∏q(x_t)q(W).

Messages through g use statistical linearization: propagate q(x_{t-1})
through g with UT sigma points, linearize g(x) ≈ A x + b with
A = C_xyᵀ V_x⁻¹, and run the resulting linear-Gaussian updates. This is the
standard UT smoother the reference compares the SGP node against.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.linalg import cholinv, sym
from ..ops.quadrature import ut_points_weights

__all__ = ["UTSmootherState", "ut_smoother_vmp", "ut_one_step_ahead"]


class UTSmootherState(NamedTuple):
    x_means: jax.Array  # (T+1, D); index 0 = x_prev
    x_covs: jax.Array
    W_df: jax.Array
    W_rate: jax.Array


def _ut_propagate(g, m, V, alpha=1.0, beta=0.0, kappa=1.0):
    """UT statistics of z = g(x), x~N(m,V): returns (m_z, V_z, C_xz)."""
    pts, wm, wc = ut_points_weights(m, V, alpha, beta, kappa)
    zs = jax.vmap(g)(pts)
    mz = wm @ zs
    dz = zs - mz
    dx = pts - m
    Vz = jnp.einsum("p,pi,pj->ij", wc, dz, dz)
    Cxz = jnp.einsum("p,pi,pj->ij", wc, dx, dz)
    return mz, Vz, Cxz


@partial(jax.jit, static_argnames=("g", "n_iters"))
def ut_smoother_vmp(
    g,
    ys,  # (T, D)
    P,
    prior_x0_mean,
    prior_x0_cov,
    prior_W_df,
    prior_W_scale,
    init_x_cov_scale: float = 50.0,
    n_iters: int = 30,
):
    """Mean-field VMP smoothing with known dynamics g (UT-linearized)."""
    T, D = ys.shape
    dt = ys.dtype
    P_inv = cholinv(sym(P))
    obs_xi = ys @ P_inv.T
    S0_inv = cholinv(sym(prior_W_scale))
    prior_x0_prec = cholinv(sym(prior_x0_cov))
    prior_x0_xi = prior_x0_prec @ prior_x0_mean

    x_means0 = jnp.concatenate([prior_x0_mean[None], jnp.zeros((T, D), dt)], 0)
    x_covs0 = jnp.concatenate(
        [prior_x0_cov[None], jnp.tile(init_x_cov_scale * jnp.eye(D, dtype=dt), (T, 1, 1))], 0
    )

    def sweep(state: UTSmootherState, _):
        W_mean = state.W_df * cholinv(sym(state.W_rate))

        # statistical linearization of g about each q(x_{t-1}): g(x) ≈ A x + b
        def linearize(m, V):
            mz, Vz, Cxz = _ut_propagate(g, m, V)
            A = jnp.linalg.solve(sym(V), Cxz).T  # A = C_xzᵀ V⁻¹
            b = mz - A @ m
            # residual covariance of the linearization (added process spread)
            R = sym(Vz - A @ V @ A.T)
            return A, b, R, mz, Vz

        A_all, b_all, R_all, mz_all, Vz_all = jax.vmap(linearize)(
            state.x_means[:-1], state.x_covs[:-1]
        )

        # forward message to x_t: N(g-propagated mean, Vz + W̄⁻¹)
        W_inv = cholinv(sym(W_mean))
        fwd_cov = Vz_all + W_inv[None]
        fwd_prec = jax.vmap(lambda C: cholinv(sym(C)))(fwd_cov)
        fwd_xi = jnp.einsum("tij,tj->ti", fwd_prec, mz_all)

        # backward message to x_{t-1} from node t (linearized):
        # x_t ≈ N(A x + b, W̄⁻¹ + R) ⇒ message prec = Aᵀ S A, xi = Aᵀ S (μ_t − b)
        succ_means = state.x_means[1:]

        def back_msg(A, b, R, mu_succ):
            S = cholinv(sym(W_inv + R))
            prec = A.T @ S @ A
            xi = A.T @ S @ (mu_succ - b)
            return xi, prec

        bwd_xi, bwd_prec = jax.vmap(back_msg)(A_all, b_all, R_all, succ_means)

        # combine: q(x_t) for t=1..T-1 gets fwd(t) + obs(t) + bwd from node t+1
        xi_mid = fwd_xi[:-1] + obs_xi[:-1] + bwd_xi[1:]
        prec_mid = fwd_prec[:-1] + P_inv[None] + bwd_prec[1:]
        # x_T: fwd + obs
        xi_T = fwd_xi[-1] + obs_xi[-1]
        prec_T = fwd_prec[-1] + P_inv
        # x_prev: prior + bwd from node 1
        xi_0 = prior_x0_xi + bwd_xi[0]
        prec_0 = prior_x0_prec + bwd_prec[0]

        xi = jnp.concatenate([xi_0[None], xi_mid, xi_T[None]], 0)
        prec = jnp.concatenate([prec_0[None], prec_mid, prec_T[None]], 0)
        covs = jax.vmap(lambda Pm: sym(cholinv(sym(Pm))))(prec)
        means = jnp.einsum("tij,tj->ti", covs, xi)

        # q(W): Wishart update with E[(x_t − g(x_{t-1}))(·)ᵀ] via linearization
        def resid_term(A, b, R, m_in, V_in, m_out, V_out):
            d = m_out - (A @ m_in + b)
            return jnp.outer(d, d) + V_out + A @ V_in @ A.T + R

        E_rr = jnp.sum(
            jax.vmap(resid_term)(
                A_all, b_all, R_all, means[:-1], covs[:-1], means[1:], covs[1:]
            ),
            axis=0,
        )
        W_df = prior_W_df + T
        W_rate = sym(S0_inv + E_rr)
        return UTSmootherState(means, covs, W_df, W_rate), None

    state0 = UTSmootherState(x_means0, x_covs0, jnp.asarray(prior_W_df, dt), S0_inv)
    state, _ = jax.lax.scan(sweep, state0, None, length=n_iters)
    return state


@partial(jax.jit, static_argnames=("g",))
def ut_one_step_ahead(g, state: UTSmootherState, ys_test, P):
    """Sequential UT predict/update on the test window
    (reference: Pendulum cells 3/36, predict_UT)."""
    W_mean = state.W_df * cholinv(sym(state.W_rate))
    W_inv = cholinv(sym(W_mean))
    P_inv = cholinv(sym(P))

    def step(carry, y):
        m, V = carry
        mz, Vz, _ = _ut_propagate(g, m, V)
        pred_cov = sym(Vz + W_inv)
        prec = cholinv(pred_cov) + P_inv
        cov = cholinv(sym(prec))
        mean = cov @ (cholinv(pred_cov) @ mz + P_inv @ y)
        return (mean, cov), (mz, pred_cov)

    (_, _), (pred_means, pred_covs) = jax.lax.scan(
        step, (state.x_means[-1], state.x_covs[-1]), ys_test
    )
    return pred_means, pred_covs
