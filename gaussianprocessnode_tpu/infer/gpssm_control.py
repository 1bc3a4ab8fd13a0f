"""Controlled GPSSM: chain smoothing + filtering when the GP transition
takes a KNOWN control input — x_t ~ GP([x_{t-1}; u_t]) + noise.

TPU-native equivalent of the reference's legacy ``GPTransitionControl``
node (``.ipynb_checkpoints/GPSSM_realdata-checkpoint.ipynb`` cells 11-21:
a MultiSGP variant whose rules receive a ``q_c::PointMass`` control signal
and evaluate the Ψ-statistics at the state-control concatenation). Here
the control enters as an input-marginal AUGMENTATION: the GP input
marginal for step t is

    mean = [m_{x_{t-1}}; u_t],   cov = blkdiag(V_{x_{t-1}}, ε·I)

with ε far below round-off relevance (1e-30 → σ-point spread 1e-15), so
every existing chain core — ``psi_batch_expected_multi``,
``chain_qv_qw_updates``, ``chain_fe_terms`` — runs UNCHANGED on the
augmented arrays, and the inducing inputs simply live in D+Dc dimensions.
With a CONSTANT control and a stationary shared-lengthscale kernel the
augmented Grams are bit-identical to the uncontrolled ones, giving an
exact equivalence oracle against :func:`~.chain_smoother.gpssm_vmp`
(tests/test_gpssm_control.py).

The x-refinement (backward in-message product) moment-matches over the
STATE dims only, with the successor step's control pinned inside the
log-density — the reference's ``q_c::PointMass`` semantics.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import JITTER_KUU_SSM
from ..dists import MvGaussianNat
from ..nodes.multisgp import _split_blocks
from ..ops import psi as psiops
from ..ops import quadrature as quad
from ..ops.linalg import chol_lower, chol_solve, cholinv, sum_blocks_weighted, sym
from .chain_smoother import (
    GPSSMState,
    _qv_stats,
    augment_control,
    chain_fe_terms,
    chain_qv_qw_updates,
    filter_frozen,
    filter_stream,
)

__all__ = ["gpssm_control_vmp", "gpssm_control_free_energy",
           "one_step_ahead_control"]

def _augment(means, covs, us):
    """[m; u] means and blkdiag(V, ε·I) covariances, batched over t (the
    vmapped :func:`~.chain_smoother.augment_control`)."""
    return jax.vmap(augment_control)(means, covs, us)


@partial(jax.jit, static_argnames=("kernel", "n_iters", "compute_fe"))
def gpssm_control_vmp(
    kernel,
    theta,
    Xu,  # (M, D + Dc) inducing inputs over state ⊕ control
    ys,  # (T, D) observations
    us,  # (T, Dc) control driving each transition x_{t-1} → x_t
    P,
    prior_x0_mean,
    prior_x0_cov,
    prior_v: MvGaussianNat,
    prior_W_df,
    prior_W_scale,
    init_x_cov_scale: float = 50.0,
    n_iters: int = 10,
    compute_fe: bool = True,
    init_state: "GPSSMState | None" = None,
):
    """Jacobi mean-field VMP for the controlled chain — the driver of
    :func:`~.chain_smoother.gpssm_vmp` with control-augmented inputs;
    returns (GPSSMState, free_energy)."""
    T, D = ys.shape
    M = Xu.shape[0]
    dt = ys.dtype
    sr = quad.SphericalRadial()

    Kuu_inv = cholinv(kernel.kuu(theta, Xu), jitter=JITTER_KUU_SSM)
    P_inv = cholinv(sym(P))
    obs_xi = ys @ P_inv.T
    S0_inv = cholinv(sym(prior_W_scale))
    prior_x0_prec = cholinv(sym(prior_x0_cov))
    prior_x0_xi = prior_x0_prec @ prior_x0_mean

    x_means0 = jnp.concatenate([prior_x0_mean[None, :], jnp.zeros((T, D), dt)], 0)
    x_covs0 = jnp.concatenate(
        [prior_x0_cov[None], jnp.tile(init_x_cov_scale * jnp.eye(D, dtype=dt),
                                      (T, 1, 1))], 0)

    def sweep(state: GPSSMState, _):
        mu_v, cov_v = _qv_stats(state.xi_v, state.prec_v)
        Rv = cov_v + jnp.outer(mu_v, mu_v)
        W_mean = state.W_df * cholinv(sym(state.W_rate))
        tr_W = jnp.trace(W_mean)
        sumRv_W = sum_blocks_weighted(Rv, W_mean, D, M)
        A_in = 0.5 * tr_W * Kuu_inv - 0.5 * sumRv_W
        mu_blocks = _split_blocks(mu_v, M, D)

        # ---- 1. q(x_t) (Jacobi), controls pinned per step ---------------
        in_m, in_V = _augment(state.x_means[:-1], state.x_covs[:-1], us)
        _, psi1_in, _, _ = psiops.psi_batch_expected_multi(
            kernel, theta, Xu, sr, in_m, in_V)
        out_means = (mu_blocks @ psi1_in).T

        prec_g = W_mean + P_inv
        xi_g = out_means @ W_mean.T + obs_xi
        Lg = chol_lower(sym(prec_g))
        cov_g = sym(chol_solve(Lg, jnp.eye(D, dtype=dt)))
        mean_g = xi_g @ cov_g.T

        succ_means = state.x_means[1:]
        sumdiagV = succ_means @ W_mean.T @ mu_blocks  # (T, M)

        def refine(mean_f, cov_f, sdV, u_next):
            def logpdf(x):
                xa = jnp.concatenate([x, u_next])
                k = psiops.psi1_exact(kernel, theta, Xu, xa)
                psi0 = kernel.kxx(theta, xa)
                return -0.5 * tr_W * psi0 + k @ A_in @ k + sdV @ k

            return quad.moment_match_multi(logpdf, mean_f, cov_f, method=sr)

        # x_prev: prior × in-msg from node 1 (control u_1 = us[0])
        m0, V0 = refine(
            chol_solve(chol_lower(sym(prior_x0_prec)), prior_x0_xi),
            cholinv(sym(prior_x0_prec)), sumdiagV[0], us[0])
        # x_1..x_{T-1}: Gaussian part × in-msg from node t+1 (control us[t+1])
        m_mid, V_mid = jax.vmap(refine)(
            mean_g[:-1], jnp.tile(cov_g, (T - 1, 1, 1)), sumdiagV[1:], us[1:])
        new_means = jnp.concatenate([m0[None], m_mid, mean_g[-1:]], 0)
        new_covs = jnp.concatenate([V0[None], V_mid, cov_g[None]], 0)

        # ---- 2./3. q(v) + q(W): the SHARED chain core on augmented inputs
        in_m2, in_V2 = _augment(new_means[:-1], new_covs[:-1], us)
        xi_v, prec_v, W_df, W_rate = chain_qv_qw_updates(
            kernel, theta, Xu, sr, Kuu_inv, prior_v, S0_inv, prior_W_df, T,
            in_m2, in_V2, new_means[1:], new_covs[1:], W_mean, dt)
        return GPSSMState(new_means, new_covs, xi_v, prec_v, W_df, W_rate), None

    state0 = init_state if init_state is not None else GPSSMState(
        x_means0, x_covs0, prior_v.xi, prior_v.prec,
        jnp.asarray(prior_W_df, dt), S0_inv)
    state, _ = jax.lax.scan(sweep, state0, None, length=n_iters)

    fe = jnp.asarray(0.0, dt)
    if compute_fe:
        fe = gpssm_control_free_energy(
            kernel, theta, Xu, ys, us, P, prior_x0_mean, prior_x0_cov,
            prior_v, prior_W_df, prior_W_scale, state)
    return state, fe


def gpssm_control_free_energy(kernel, theta, Xu, ys, us, P, prior_x0_mean,
                              prior_x0_cov, prior_v, prior_W_df,
                              prior_W_scale, state: GPSSMState):
    """Bethe FE of the controlled chain — :func:`chain_fe_terms` on the
    control-augmented input marginals (state entropies unchanged: the
    ε-variance control dims belong to no q factor)."""
    sr = quad.SphericalRadial()
    Kuu_inv = cholinv(kernel.kuu(theta, Xu), jitter=JITTER_KUU_SSM)
    in_m, in_V = _augment(state.x_means[:-1], state.x_covs[:-1], us)
    return chain_fe_terms(
        kernel, theta, Xu, Kuu_inv, ys, P, prior_x0_mean, prior_x0_cov,
        prior_v, prior_W_df, prior_W_scale,
        state.x_means[0], state.x_covs[0], state.x_means[1:], state.x_covs[1:],
        in_m, in_V, state.xi_v, state.prec_v, state.W_df, state.W_rate, sr)


@partial(jax.jit, static_argnames=("kernel",))
def one_step_ahead_control(kernel, theta, Xu, state: GPSSMState, ys_test,
                           us_test, P):
    """Predict/update filtering over a test window with KNOWN controls
    (the realdata notebook's validation loop): the MultiSGP :out rule at
    [m_prev; u_t], then the Gaussian observation update — a thin view of
    :func:`~.chain_smoother.filter_stream` with ``us`` (ONE filter
    implementation; chain windows via filter_stream directly)."""
    frozen = filter_frozen(state, P)
    pred_means, pred_covs, _ = filter_stream(
        kernel, theta, Xu, frozen, ys_test,
        (state.x_means[-1], state.x_covs[-1]), us=us_test)
    return pred_means, pred_covs
