"""GPSSM chain smoother: mean-field VMP over a MultiSGP transition chain.

TPU-native replacement for the reference's reactive chain inference
(Pendulum_Wishart_2d.ipynb cells 12-16; SURVEY.md §3.3). Model:

    v ~ MvN(0, 50·I_{MD});  W ~ Wishart(ν₀, S₀);  x₀ ~ MvN(m₀, V₀)
    x_t ~ MultiSGP(x_{t-1}, v, W, θ);  y_t ~ MvN(x_t, P)      t = 1..T

Mean-field q(x₀)∏q(x_t)·q(v)·q(W). One VMP iteration:

  1. all q(x_t) in parallel (Jacobi style — the batched analogue of the
     reactive sweep): q(x_t) ∝ out-msg(q(x_{t-1})) · obs-msg(y_t) ·
     exp(in-msg from node t+1), the log-density product moment-matched with
     spherical-radial cubature (MultiSGPnode.jl:37-44);
  2. q(v): natural sum of all v-messages (shared W ⇒ Λ = W̄ ⊗ ΣΨ2_t);
  3. q(W): Wishart update df = ν₀ + T, rate = S₀⁻¹ + Σ_t (I1_t + I2_t).

All per-t work is batched: ONE Gram over all T·(2D) sigma points per sweep.
"""

from functools import partial
from typing import NamedTuple

import math

import jax
import jax.numpy as jnp

from ..config import JITTER_KUU_SSM
from ..dists import (
    MvGaussian,
    MvGaussianNat,
    WishartFast,
    _mv_gammaln,
    mv_gaussian_entropy,
    mv_gaussian_entropy_from_prec,
    mv_nat_to_meancov,
    wishart_entropy,
    wishart_mean,
    wishart_mean_logdet,
)
from ..nodes.multisgp import MultiSGPArgs, _split_blocks, average_energy
from ..ops import psi as psiops
from ..ops import quadrature as quad
from ..ops.linalg import (
    chol_lower,
    chol_solve,
    cholinv,
    logdet_from_chol,
    sum_blocks_weighted,
    sym,
)
from .batch_vmp import prior_energy_mvn

_LOG2PI = math.log(2.0 * math.pi)  # pure-host constant: a jnp op here
#          would initialize the device backend at IMPORT time (slow and
#          fragile through the device tunnel)


class GPSSMState(NamedTuple):
    x_means: jax.Array  # (T+1, D), index 0 = x_prev
    x_covs: jax.Array  # (T+1, D, D)
    xi_v: jax.Array  # (M·D,)
    prec_v: jax.Array  # (M·D, M·D)
    W_df: jax.Array
    W_rate: jax.Array  # (D, D) rate matrix (inverse scale)


_TPU_F64_MM_RELERR = 1e-7  # safety ×4 over the MEASURED 2.7e-8 (see below)


def _spd_guard_f64(prec):
    """Symmetrize + (device only) lift Λ by the backend's matmul-error
    bound before factorization.

    The TPU backend's f64 matmul carries ~2.7e-8 RELATIVE error — measured
    on-device with a 96×8192 A·Aᵀ against numpy, and INDEPENDENT of the
    precision flag (r5 device debug), i.e. an emulation floor, not a
    downcast to opt out of. The chain's accumulated Λ_v = Λ₀ + W̄⊗ΣΨ2 has
    λmin pinned at the prior's 1/50 while λmax grows ∝ T·W̄, so beyond
    T ≈ 1e3 the mathematically-PD matrix ARRIVES indefinite
    (T=2048: λmin(device Λ_v) = −0.018) and every downstream Cholesky
    NaNs — the root cause of the r4/r5 PIT and long-chain Jacobi device
    NaNs. The lift is ε_mm·(Gershgorin row-sum bound on λmax): directions
    with data precision ≫ the lift are untouched; the near-null directions
    it regularizes are exactly the ones whose device values are 100%
    matmul noise. CPU keeps the untouched factorization (the backend
    branch resolves at trace time)."""
    p64 = sym(prec.astype(jnp.float64))
    if jax.default_backend() == "tpu":
        lam_max_bound = jnp.max(jnp.sum(jnp.abs(p64), axis=-1))
        p64 = p64 + (_TPU_F64_MM_RELERR * lam_max_bound) * jnp.eye(
            p64.shape[-1], dtype=jnp.float64)
    return p64


def _qv_stats(xi, prec):
    """(ξ, Λ) → (μ, Σ) via dists.mv_nat_to_meancov — factored in f64
    REGARDLESS of the state dtype, moments cast back to it.

    This is the chain's one condition-critical op (κ(Λ_v) grows to ~1e6+ as
    ΣΨ2 accumulates over the chain): under the f32-first device mode
    (everything else — cubature, Ψ-statistics, moment matching, θ-grads —
    runs native-f32 on the MXU instead of emulated f64) this (M·D)² solve
    is pinned to f64, the kin40k fast trainer's proven recipe
    (infer/minibatch.py). A no-op for f64 states. On the TPU backend the
    precision additionally gets the :func:`_spd_guard_f64` lift."""
    dt = xi.dtype
    q = mv_nat_to_meancov(MvGaussianNat(
        xi.astype(jnp.float64), _spd_guard_f64(prec)))
    return q.mean.astype(dt), q.cov.astype(dt)


def _identity(x):
    return x


def _kuu_inv_f64(kernel, theta, Xu, dt):
    """Kuu⁻¹ at the SSM jitter, factored in f64 regardless of the model
    dtype and cast back. κ(Kuu) at the pendulum's structured inducing grid
    is ≫ 1/ε_f32, so an f32 Cholesky at jitter 1e-12 NaNs outright
    (measured: the first f32 sweep's W_rate diagonal). An f32-COMPUTED Gram
    also carries ~ε_f32 entrywise noise that leaves the matrix indefinite
    beyond what 1e-12 regularizes even in f64, so the jitter scales with
    the Gram's dtype (effective_jitter: 300·ε ≈ 3.6e-5 for f32 — the same
    rule the f32 kin40k fast path uses). One M×M f64 factorization per
    program — the f32-first mode's bulk work stays f32."""
    from ..ops.linalg import effective_jitter

    K = kernel.kuu(theta, Xu)
    jit = (JITTER_KUU_SSM if K.dtype == jnp.float64
           else effective_jitter(K.dtype, JITTER_KUU_SSM))
    return cholinv(K.astype(jnp.float64), jitter=jit).astype(dt)


def chain_qv_qw_updates(kernel, theta, Xu, sr, Kuu_inv, prior_v, S0_inv,
                        prior_W_df, T_global, in_means, in_covs, out_means,
                        out_covs, W_mean, dt, reduce=_identity):
    """The global q(v) + q(W) updates of one chain sweep — the shared
    numerical core of both dense engines (Jacobi / Gauss–Seidel,
    ``reduce=identity`` on the full T-length arrays) AND the time-sharded
    sequence-parallel engine (``reduce=lax.psum`` on each shard's local
    slice + halo): every global quantity is a pure data-sum over t, exactly
    as in :func:`~.minibatch.qv_grand_update` for the iid trainers, so
    keeping ONE implementation makes "sharded ≡ dense" structural.

    q(v): ξ = ξ₀ + Σ_t (W̄ μ_{x_t}) ⊗ Ψ1_t,  Λ = Λ₀ + W̄ ⊗ ΣΨ2_t
    (MultiSGPnode.jl:290-308); q(W): WishartFast(ν₀+T, S₀⁻¹+ΣI1_t+ΣI2_t)
    (MultiSGPnode.jl:367-405). Returns (xi_v, prec_v, W_df, W_rate)."""
    M = Xu.shape[0]
    D = W_mean.shape[0]
    T_loc = in_means.shape[0]
    # HIGHEST precision on every T-long contraction: the backend's default
    # matmul precision runs f64 through f32 passes, whose error at T·P-long
    # reductions left the device Λ_v indefinite (see sum_weighted_psi2)
    hi = jax.lax.Precision.HIGHEST
    psi0_in, psi1_in, Kp_in, wq = psiops.psi_batch_expected_multi(
        kernel, theta, Xu, sr, in_means, in_covs
    )
    sum_psi2 = reduce(psiops.sum_weighted_psi2(Kp_in, wq, jnp.ones((T_loc,), dt)))
    yW = out_means @ W_mean.T  # (T_loc, D)
    xi_v = prior_v.xi + reduce(jnp.einsum("td,mt->dm", yW, psi1_in,
                                          precision=hi).reshape(-1))
    prec_v = prior_v.prec + jnp.kron(W_mean, sum_psi2)
    mu_v, cov_v = _qv_stats(xi_v, prec_v)
    Rv = cov_v + jnp.outer(mu_v, mu_v)
    mu_blocks = _split_blocks(mu_v, M, D)

    KinvK = jnp.einsum("mq,qtp->mtp", Kuu_inv, Kp_in, precision=hi)
    tr_t = jnp.einsum("mtp,mtp,p->t", Kp_in, KinvK, wq, precision=hi)
    I1_sum = reduce(jnp.sum(psi0_in - tr_t)) * jnp.eye(D, dtype=dt)
    E_t = jnp.matmul(mu_blocks, psi1_in, precision=hi).T  # (T_loc, D)
    Ry_sum = reduce(
        jnp.einsum("td,te->de", out_means, out_means, precision=hi)
        + jnp.sum(out_covs, 0)
    )
    cross = reduce(jnp.einsum("td,te->de", out_means, E_t, precision=hi))
    Rv4 = Rv.reshape(D, M, D, M)
    psi4_sum = reduce(jnp.einsum("imjn,ntp,mtp,p->ij", Rv4, Kp_in, Kp_in, wq,
                                 precision=hi))
    I2_sum = Ry_sum - cross - cross.T + psi4_sum
    W_df = jnp.asarray(prior_W_df + T_global, dt)
    W_rate = sym(S0_inv + I1_sum + I2_sum)
    return xi_v, prec_v, W_df, W_rate


def chain_fe_terms(kernel, theta, Xu, Kuu_inv, ys_loc, Pobs, prior_x0_mean,
                   prior_x0_cov, prior_v, prior_W_df, prior_W_scale,
                   x0_m, x0_V, means_loc, covs_loc, in_means, in_covs,
                   xi_v, prec_v, W_df, W_rate, sr, reduce=_identity):
    """Bethe free energy of the chain — shared between the dense engines
    (full arrays, identity reduce) and the sequence-parallel engine (local
    slices, psum reduce): per-node/per-obs energies and marginal entropies
    are data-sums over t; the prior terms (x0, v, W) are replicated."""
    D = ys_loc.shape[1]
    T_loc = ys_loc.shape[0]
    dt = ys_loc.dtype
    args = MultiSGPArgs(theta, Xu, Kuu_inv)
    mu_v, cov_v = _qv_stats(xi_v, prec_v)
    qW = WishartFast(W_df, W_rate)
    W_mean = wishart_mean(qW)
    E_logdet_W = wishart_mean_logdet(qW)

    def node_energy(m_out, V_out, m_in, V_in):
        return average_energy(
            kernel, sr, args, m_out, V_out, MvGaussian(m_in, V_in),
            mu_v, cov_v, W_mean, E_logdet_W,
        )

    U_nodes = reduce(jnp.sum(
        jax.vmap(node_energy)(means_loc, covs_loc, in_means, in_covs)
    ))
    Lp = chol_lower(sym(Pobs))
    P_inv = cholinv(sym(Pobs))
    d_res = ys_loc - means_loc
    U_obs = reduce(0.5 * (
        T_loc * (D * _LOG2PI + logdet_from_chol(Lp))
        + jnp.einsum("td,de,te->", d_res, P_inv, d_res)
        + jnp.einsum("de,ted->", P_inv, covs_loc)
    ))
    H_x = reduce(jnp.sum(jax.vmap(
        lambda m, V: mv_gaussian_entropy(MvGaussian(m, V))
    )(means_loc, covs_loc))) + mv_gaussian_entropy(MvGaussian(x0_m, x0_V))

    # replicated prior terms
    U_x0 = prior_energy_mvn(x0_m, x0_V, prior_x0_mean, prior_x0_cov)
    mu_p, cov_p = _qv_stats(prior_v.xi, prior_v.prec)
    U_v = prior_energy_mvn(mu_v, cov_v, mu_p, cov_p)
    S0_inv = cholinv(sym(prior_W_scale))
    ld_S0 = logdet_from_chol(chol_lower(sym(prior_W_scale)))
    nu0 = jnp.asarray(prior_W_df, dt)
    U_W = -(
        (nu0 - D - 1.0) / 2.0 * E_logdet_W
        - 0.5 * jnp.sum(S0_inv * W_mean.T)
        - nu0 * D / 2.0 * jnp.log(2.0)
        - nu0 / 2.0 * ld_S0
        - _mv_gammaln(nu0 / 2.0, D)
    )
    # q(v) entropy from the held natural precision — Cholesky of the
    # exactly-SPD Λ_v, not of its approximate inverse (the cov-route NaN'd
    # at κ ~ 1e10 under the TPU backend's emulated f64; DEVIATIONS #30).
    # Factored in f64 with the same device SPD guard as _qv_stats.
    H_v = mv_gaussian_entropy_from_prec(_spd_guard_f64(prec_v)).astype(dt)
    H_W = wishart_entropy(qW)
    return U_nodes + U_obs + U_x0 + U_v + U_W - H_x - H_v - H_W


@partial(jax.jit, static_argnames=("kernel", "n_iters", "compute_fe"))
def gpssm_vmp(
    kernel,
    theta,
    Xu,
    ys,  # (T, D) observations
    P,  # (D, D) observation covariance
    prior_x0_mean,
    prior_x0_cov,
    prior_v: MvGaussianNat,
    prior_W_df,
    prior_W_scale,  # Wishart scale matrix S₀ (reference: Wishart(1e2, I))
    init_x_cov_scale: float = 50.0,
    n_iters: int = 10,
    compute_fe: bool = True,
    init_state: "GPSSMState | None" = None,
):
    """Run n_iters mean-field VMP sweeps; returns (GPSSMState, free_energy).

    ``init_state``: warm-start the mean-field state (e.g. from the previous
    hyperopt epoch) instead of the reference's fresh initialization — an
    incremental E-step that compensates for the slower per-iteration
    propagation of Jacobi sweeps."""
    T, D = ys.shape
    M = Xu.shape[0]
    dt = ys.dtype
    sr = quad.SphericalRadial()

    Kuu_inv = _kuu_inv_f64(kernel, theta, Xu, ys.dtype)

    P_inv = cholinv(sym(P))
    obs_xi = ys @ P_inv.T  # (T, D)
    S0_inv = cholinv(sym(prior_W_scale))

    prior_x0_prec = cholinv(sym(prior_x0_cov))
    prior_x0_xi = prior_x0_prec @ prior_x0_mean

    # init (reference gp_initialization: q(x)=MvN(0, 50I), q(W)=Wishart(1e2,I),
    # q(v) = its prior)
    x_means0 = jnp.concatenate([prior_x0_mean[None, :], jnp.zeros((T, D), dt)], 0)
    x_covs0 = jnp.concatenate(
        [prior_x0_cov[None, :, :], jnp.tile(init_x_cov_scale * jnp.eye(D, dtype=dt), (T, 1, 1))], 0
    )
    def sweep(state: GPSSMState, _):
        mu_v, cov_v = _qv_stats(state.xi_v, state.prec_v)
        Rv = cov_v + jnp.outer(mu_v, mu_v)
        W_mean = state.W_df * cholinv(sym(state.W_rate))
        tr_W = jnp.trace(W_mean)
        sumRv_W = sum_blocks_weighted(Rv, W_mean, D, M)
        A_in = 0.5 * tr_W * Kuu_inv - 0.5 * sumRv_W  # in-msg Ψ2 contraction
        mu_blocks = _split_blocks(mu_v, M, D)  # (D, M)

        # ---- 1. update q(x_t) for all t (Jacobi) -------------------------
        in_means = state.x_means[:-1]  # (T, D): inputs of nodes 1..T
        in_covs = state.x_covs[:-1]
        psi0_in, psi1_in, Kp_in, wq = psiops.psi_batch_expected_multi(
            kernel, theta, Xu, sr, in_means, in_covs
        )
        out_means = (mu_blocks @ psi1_in).T  # (T, D): Ψ1_tᵀ μ_v^(d)

        # Gaussian part of each q(x_t): out-msg N(out_means[t], W̄⁻¹) × obs
        prec_g = W_mean + P_inv  # shared across t
        xi_g = out_means @ W_mean.T + obs_xi  # (T, D)
        Lg = chol_lower(sym(prec_g))
        cov_g = sym(chol_solve(Lg, jnp.eye(D, dtype=dt)))
        mean_g = xi_g @ cov_g.T  # since cov_g symmetric: (prec⁻¹ xi)

        # in-message from node t+1 to x_t exists for t = 0..T-1 (x_prev..x_{T-1});
        # its μ_y is mean of q(x_{t+1}).
        succ_means = state.x_means[1:]  # (T, D)
        sumdiagV = succ_means @ W_mean.T @ mu_blocks  # (T, M)

        def refine(mean_f, cov_f, sdV):
            def logpdf(x):
                k = psiops.psi1_exact(kernel, theta, Xu, x)
                psi0 = kernel.kxx(theta, x)
                return -0.5 * tr_W * psi0 + k @ A_in @ k + sdV @ k

            m, V = quad.moment_match_multi(logpdf, mean_f, cov_f, method=sr)
            return m, V

        # x_prev (index 0): prior × in-msg from node 1
        m0, V0 = refine(
            chol_solve(chol_lower(sym(prior_x0_prec)), prior_x0_xi),
            cholinv(sym(prior_x0_prec)),
            sumdiagV[0],
        )
        # x_1..x_{T-1}: Gaussian part × in-msg from successor node
        m_mid, V_mid = jax.vmap(refine)(mean_g[:-1], jnp.tile(cov_g, (T - 1, 1, 1)), sumdiagV[1:])
        # x_T: Gaussian part only
        new_means = jnp.concatenate([m0[None], m_mid, mean_g[-1:]], 0)
        new_covs = jnp.concatenate([V0[None], V_mid, cov_g[None]], 0)

        # ---- 2./3. q(v) + q(W): the shared global-update core --------------
        xi_v, prec_v, W_df, W_rate = chain_qv_qw_updates(
            kernel, theta, Xu, sr, Kuu_inv, prior_v, S0_inv, prior_W_df, T,
            new_means[:-1], new_covs[:-1], new_means[1:], new_covs[1:],
            W_mean, dt,
        )

        new_state = GPSSMState(new_means, new_covs, xi_v, prec_v, W_df, W_rate)
        return new_state, None

    if init_state is None:
        state0 = GPSSMState(
            x_means0, x_covs0, prior_v.xi, prior_v.prec,
            jnp.asarray(prior_W_df, dt), S0_inv,
        )
    else:
        state0 = init_state
    state, _ = jax.lax.scan(sweep, state0, None, length=n_iters)

    fe = jnp.asarray(0.0, dt)
    if compute_fe:
        fe = gpssm_free_energy(
            kernel, theta, Xu, ys, P, prior_x0_mean, prior_x0_cov, prior_v,
            prior_W_df, prior_W_scale, state,
        )
    return state, fe


def gpssm_free_energy(kernel, theta, Xu, ys, P, prior_x0_mean, prior_x0_cov,
                      prior_v: MvGaussianNat, prior_W_df, prior_W_scale,
                      state: GPSSMState):
    """Bethe free energy of the chain under the mean-field q — the dense
    (full-array, identity-reduce) view of :func:`chain_fe_terms`."""
    sr = quad.SphericalRadial()
    Kuu_inv = _kuu_inv_f64(kernel, theta, Xu, ys.dtype)
    return chain_fe_terms(
        kernel, theta, Xu, Kuu_inv, ys, P, prior_x0_mean, prior_x0_cov,
        prior_v, prior_W_df, prior_W_scale,
        state.x_means[0], state.x_covs[0], state.x_means[1:], state.x_covs[1:],
        state.x_means[:-1], state.x_covs[:-1],
        state.xi_v, state.prec_v, state.W_df, state.W_rate, sr,
    )


# ---------------------------------------------------------------------------
# 1-step-ahead filtering on test data (Pendulum cells 3, 36)
# ---------------------------------------------------------------------------


class GPSSMFilterFrozen(NamedTuple):
    """The 1-step-ahead filter's per-window-constant quantities, recovered
    from a trained GPSSMState exactly ONCE (the q(v) solve is a (M·D)²
    cholinv — per-call recomputation would dominate small windows)."""

    mu_blocks: jax.Array  # (D, M) posterior mean of v, split per output
    pred_cov: jax.Array  # (D, D) = W̄⁻¹, the :out rule's predictive cov
    pred_prec: jax.Array  # (D, D) its inverse (the update's natural form)
    P_inv: jax.Array  # (D, D) observation precision


def filter_frozen(state: GPSSMState, P) -> GPSSMFilterFrozen:
    """Freeze a trained smoother state into the filter's constants."""
    D = P.shape[0]
    mu_v, _ = _qv_stats(state.xi_v, state.prec_v)
    M = mu_v.shape[0] // D
    qW = WishartFast(state.W_df, state.W_rate)
    W_mean = wishart_mean(qW)
    W_mean_inv = cholinv(sym(W_mean))
    return GPSSMFilterFrozen(
        _split_blocks(mu_v, M, D), W_mean_inv,
        cholinv(sym(W_mean_inv)), cholinv(sym(P)),
    )


CTRL_EPS = 1e-30  # ε variance on known-control input dims (gpssm_control)


def augment_control(m, V, u, eps: float = CTRL_EPS):
    """[m; u] mean and blkdiag(V, ε·I) covariance for ONE input marginal —
    the known-control augmentation (see infer/gpssm_control.py): ε far
    below round-off relevance, so σ-point spread on control dims is √ε."""
    D, Dc = m.shape[0], u.shape[0]
    m_a = jnp.concatenate([m, u])
    V_a = jnp.zeros((D + Dc, D + Dc), m.dtype)
    V_a = V_a.at[:D, :D].set(V)
    V_a = V_a.at[D:, D:].set(eps * jnp.eye(Dc, dtype=m.dtype))
    return m_a, V_a


@partial(jax.jit, static_argnames=("kernel",))
def filter_stream(kernel, theta, Xu, frozen: GPSSMFilterFrozen, ys, carry,
                  us=None):
    """One filtering window, CHAINABLE: predict/update each observation from
    ``carry`` = the previous filtered marginal (mean, cov), returning the
    final carry so consecutive windows continue exactly where the last ended
    (filter_stream(ys[:k]) then filter_stream(ys[k:], carry) ≡
    filter_stream(ys)). ``us``: optional (T, Dc) known controls — the
    prediction then evaluates Ψ1 at the control-augmented marginal
    (controlled GPSSM; Xu must live in D+Dc dims).
    Returns (pred_means, pred_covs, carry)."""
    sr = quad.SphericalRadial()

    def step(c, inp):
        m_prev, V_prev = c
        if us is None:
            y, (m_in, V_in) = inp, (m_prev, V_prev)
        else:
            y, u = inp
            m_in, V_in = augment_control(m_prev, V_prev, u)
        # PredictState = MultiSGP :out rule from the previous marginal
        psi1 = psiops.psi1_expected_multi(kernel, theta, Xu, sr, m_in, V_in)
        pred_mean = frozen.mu_blocks @ psi1
        # UpdateState = product with the MvN observation message N(y, P)
        prec = frozen.pred_prec + frozen.P_inv
        cov = cholinv(sym(prec))
        mean = cov @ (frozen.pred_prec @ pred_mean + frozen.P_inv @ y)
        return (mean, cov), (pred_mean, frozen.pred_cov)

    xs = ys if us is None else (ys, us)
    carry, (pred_means, pred_covs) = jax.lax.scan(step, carry, xs)
    return pred_means, pred_covs, carry


@partial(jax.jit, static_argnames=("kernel",))
def one_step_ahead(kernel, theta, Xu, state: GPSSMState, ys_test, P):
    """Sequential predict/update loop over one test window, starting from
    the smoother's last marginal (Pendulum cells 3, 36). Thin view of
    :func:`filter_stream`; use that (or serve.GPSSMFilter) to chain
    windows."""
    frozen = filter_frozen(state, P)
    pred_means, pred_covs, _ = filter_stream(
        kernel, theta, Xu, frozen, ys_test,
        (state.x_means[-1], state.x_covs[-1]),
    )
    return pred_means, pred_covs


@partial(jax.jit, static_argnames=("kernel", "n_iters", "compute_fe"))
def gpssm_vmp_sequential(
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
    n_iters: int = 10,
    compute_fe: bool = True,
    init_state: "GPSSMState | None" = None,
):
    """Gauss–Seidel variant of :func:`gpssm_vmp`: per sweep, q(x_t) updates
    SEQUENTIALLY t = 0..T via ``lax.scan``, each using the freshly-updated
    q(x_{t-1}) — the convergence behavior of the reference's reactive
    schedule (one sweep here ≈ several Jacobi sweeps). Costlier per sweep
    (serial chain) but needs the reference's iteration counts.
    """
    T, D = ys.shape
    M = Xu.shape[0]
    dt = ys.dtype
    sr = quad.SphericalRadial()

    Kuu_inv = _kuu_inv_f64(kernel, theta, Xu, ys.dtype)
    P_inv = cholinv(sym(P))
    S0_inv = cholinv(sym(prior_W_scale))
    prior_x0_prec = cholinv(sym(prior_x0_cov))
    prior_x0_xi = prior_x0_prec @ prior_x0_mean

    x_means0 = jnp.concatenate([prior_x0_mean[None, :], jnp.zeros((T, D), dt)], 0)
    x_covs0 = jnp.concatenate(
        [prior_x0_cov[None, :, :],
         jnp.tile(init_x_cov_scale * jnp.eye(D, dtype=dt), (T, 1, 1))], 0
    )

    def sweep(state: GPSSMState, _):
        mu_v, cov_v = _qv_stats(state.xi_v, state.prec_v)
        Rv = cov_v + jnp.outer(mu_v, mu_v)
        W_mean = state.W_df * cholinv(sym(state.W_rate))
        tr_W = jnp.trace(W_mean)
        sumRv_W = sum_blocks_weighted(Rv, W_mean, D, M)
        A_in = 0.5 * tr_W * Kuu_inv - 0.5 * sumRv_W
        mu_blocks = _split_blocks(mu_v, M, D)

        def logpdf_in(x, sdV):
            k = psiops.psi1_exact(kernel, theta, Xu, x)
            psi0 = kernel.kxx(theta, x)
            return -0.5 * tr_W * psi0 + k @ A_in @ k + sdV @ k

        # x_prev: prior × in-msg from node 1 (μ_y = current q(x_1))
        sdV0 = (W_mean @ state.x_means[1]) @ mu_blocks
        m0, V0 = quad.moment_match_multi(
            lambda x: logpdf_in(x, sdV0),
            chol_solve(chol_lower(sym(prior_x0_prec)), prior_x0_xi),
            cholinv(sym(prior_x0_prec)),
            method=sr,
        )

        succ_means = jnp.concatenate([state.x_means[2:], state.x_means[-1:]], 0)

        def step(carry, inp):
            m_prev, V_prev = carry
            y_t, succ_mean, is_last = inp
            # out-message through the node from the FRESH predecessor marginal
            psi1 = psiops.psi1_expected_multi(kernel, theta, Xu, sr, m_prev, V_prev)
            out_mean = mu_blocks @ psi1
            prec_g = W_mean + P_inv
            xi_g = W_mean @ out_mean + P_inv @ y_t
            cov_g = cholinv(sym(prec_g))
            mean_g = cov_g @ xi_g
            # in-message from the successor node (skipped for t = T)
            sdV = (W_mean @ succ_mean) @ mu_blocks
            m_r, V_r = quad.moment_match_multi(
                lambda x: logpdf_in(x, sdV), mean_g, cov_g, method=sr
            )
            m_t = jnp.where(is_last, mean_g, m_r)
            V_t = jnp.where(is_last, cov_g, V_r)
            return (m_t, V_t), (m_t, V_t)

        is_last = jnp.arange(T) == T - 1
        (_, _), (means_seq, covs_seq) = jax.lax.scan(
            step, (m0, V0), (ys, succ_means, is_last)
        )
        new_means = jnp.concatenate([m0[None], means_seq], 0)
        new_covs = jnp.concatenate([V0[None], covs_seq], 0)

        # q(v) and q(W): the same shared global-update core as the Jacobi
        # engine
        xi_v, prec_v, W_df, W_rate = chain_qv_qw_updates(
            kernel, theta, Xu, sr, Kuu_inv, prior_v, S0_inv, prior_W_df, T,
            new_means[:-1], new_covs[:-1], new_means[1:], new_covs[1:],
            W_mean, dt,
        )

        return GPSSMState(new_means, new_covs, xi_v, prec_v, W_df, W_rate), None

    if init_state is None:
        state0 = GPSSMState(
            x_means0, x_covs0, prior_v.xi, prior_v.prec,
            jnp.asarray(prior_W_df, dt), S0_inv,
        )
    else:
        state0 = init_state
    state, _ = jax.lax.scan(sweep, state0, None, length=n_iters)

    fe = jnp.asarray(0.0, dt)
    if compute_fe:
        fe = gpssm_free_energy(
            kernel, theta, Xu, ys, P, prior_x0_mean, prior_x0_cov, prior_v,
            prior_W_df, prior_W_scale, state,
        )
    return state, fe
