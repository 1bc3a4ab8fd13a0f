"""Sequence-parallel GPSSM smoothing over a device mesh (time-axis sharding).

The reference's only sequence workload is the GPSSM chain (300 steps,
Pendulum_Wishart_2d.ipynb cells 12-16) processed by sequential message
passing; SURVEY.md §5 ("Long-context / sequence parallelism") marks the
sharded design slot. The Jacobi smoother (infer/chain_smoother.gpssm_vmp)
updates every q(x_t) from the PREVIOUS sweep's neighbors, which makes the
time axis shardable the TPU way:

- each device owns a contiguous block of T/ndev time steps (marginals
  q(x_t), observations y_t, and their sigma-point Ψ-statistics — the heavy
  per-t work scales 1/ndev);
- the only cross-t dependencies are NEAREST-NEIGHBOR: node t reads the
  marginal means/covs of x_{t-1} (its input edge) and the mean of x_{t+1}
  (the in-message from its successor node) — one (mean, cov) halo from the
  left neighbor and one mean halo from the right neighbor per sweep, ridden
  over ICI with ``jax.lax.ppermute``;
- the global q(v) and q(W) updates are pure sums over t (natural-parameter
  increments / Wishart rate terms), ``psum``'d and then solved replicated —
  the same reduce-then-replicate pattern as the data-parallel trainers
  (parallel/sharding.py);
- the Bethe free energy is a psum of per-node/per-obs terms plus replicated
  prior/entropy terms.

The whole n_iters-sweep program runs inside ONE ``shard_map`` (no host
round-trips); numerically it matches the single-device Jacobi smoother up to
f64 sum reordering (tests/test_seq_parallel.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import JITTER_KUU_SSM
from ..dists import MvGaussianNat
from ..infer.chain_smoother import (
    GPSSMState,
    _qv_stats,
    chain_fe_terms,
    chain_qv_qw_updates,
)
from ..nodes.multisgp import _split_blocks
from ..ops import psi as psiops
from ..ops import quadrature as quad
from ..ops.linalg import (
    chol_lower,
    chol_solve,
    cholinv,
    sum_blocks_weighted,
    sym,
)

__all__ = ["gpssm_vmp_sp", "shard_chain_data", "gather_sp_state"]


def shard_chain_data(mesh: Mesh, ys, axis: str = "sp"):
    """Place the observation sequence (T, D) with the TIME dimension sharded
    over the mesh. T must be divisible by the axis size (each device owns a
    contiguous block of steps)."""
    ndev = mesh.shape[axis]
    if ys.shape[0] % ndev != 0:
        raise ValueError(
            f"chain length T={ys.shape[0]} is not divisible by the "
            f"{ndev}-device '{axis}' mesh axis; pad or trim the sequence "
            "(e.g. 296 instead of 300 on 8 devices)"
        )
    return jax.device_put(ys, NamedSharding(mesh, P(axis, None)))


def _halo_from_left(mean_last, cov_last, axis, ndev):
    """Each shard sends its LAST (mean, cov) to the right neighbor; shard 0
    receives zeros (replaced by the replicated x0 state at the call site)."""
    perm = [(j, j + 1) for j in range(ndev - 1)]
    return (
        jax.lax.ppermute(mean_last, axis, perm),
        jax.lax.ppermute(cov_last, axis, perm),
    )


def _halo_from_right(mean_first, axis, ndev):
    """Each shard sends its FIRST mean to the left neighbor; the last shard
    receives zeros (its final node's in-message is masked off — x_T has no
    successor)."""
    perm = [(j, j - 1) for j in range(1, ndev)]
    return jax.lax.ppermute(mean_first, axis, perm)


@partial(jax.jit, static_argnames=("kernel", "n_iters", "compute_fe", "mesh",
                                   "axis"))
def gpssm_vmp_sp(
    kernel,
    theta,
    Xu,
    ys,  # (T, D), time-sharded via shard_chain_data
    Pobs,  # (D, D) observation covariance (replicated)
    prior_x0_mean,
    prior_x0_cov,
    prior_v: MvGaussianNat,
    prior_W_df,
    prior_W_scale,
    mesh: Mesh,
    axis: str = "sp",
    init_x_cov_scale: float = 50.0,
    n_iters: int = 10,
    compute_fe: bool = True,
    init_state: "GPSSMState | None" = None,
):
    """Sequence-parallel :func:`~..infer.chain_smoother.gpssm_vmp`.

    Returns ``(GPSSMState, free_energy)`` with ``x_means``/``x_covs`` in the
    single-device layout (T+1 with index 0 = x_prev), gathered replicated —
    the chain state is small (T·D); only the per-sweep WORK is sharded.
    """
    T, D = ys.shape
    M = Xu.shape[0]
    dt = ys.dtype
    ndev = mesh.shape[axis]
    sr = quad.SphericalRadial()

    from ..infer.chain_smoother import _kuu_inv_f64

    Kuu_inv = _kuu_inv_f64(kernel, theta, Xu, dt)
    P_inv = cholinv(sym(Pobs))
    S0_inv = cholinv(sym(prior_W_scale))
    prior_x0_prec = cholinv(sym(prior_x0_cov))
    prior_x0_xi = prior_x0_prec @ prior_x0_mean
    # the same base expressions the single-device sweep uses for x0
    x0_base_mean = chol_solve(chol_lower(sym(prior_x0_prec)), prior_x0_xi)
    x0_base_cov = cholinv(sym(prior_x0_prec))

    def local_program(ys_loc):
        # ys_loc: (T/ndev, D) — this shard's contiguous block of steps
        T_loc = ys_loc.shape[0]
        idx = jax.lax.axis_index(axis)
        is_first = idx == 0
        is_last_shard = idx == ndev - 1
        # mask row of the GLOBAL last marginal x_T (Gaussian part only)
        last_row = (jnp.arange(T_loc) == T_loc - 1) & is_last_shard
        obs_xi_loc = ys_loc @ P_inv.T

        def psum_(v):
            return jax.lax.psum(v, axis)

        def pred_arrays(x0_m, x0_V, means_loc, covs_loc):
            """Marginals of each local node's INPUT edge x_{t-1}: left halo
            (or the replicated x0 on shard 0) + own block shifted by one."""
            hm, hV = _halo_from_left(means_loc[-1], covs_loc[-1], axis, ndev)
            pm = jnp.where(is_first, x0_m, hm)
            pV = jnp.where(is_first, x0_V, hV)
            in_means = jnp.concatenate([pm[None], means_loc[:-1]], 0)
            in_covs = jnp.concatenate([pV[None], covs_loc[:-1]], 0)
            return in_means, in_covs

        def sweep(state, _):
            x0_m, x0_V, means_loc, covs_loc, xi_v, prec_v, W_df, W_rate = state
            mu_v, cov_v = _qv_stats(xi_v, prec_v)
            Rv = cov_v + jnp.outer(mu_v, mu_v)
            W_mean = W_df * cholinv(sym(W_rate))
            tr_W = jnp.trace(W_mean)
            sumRv_W = sum_blocks_weighted(Rv, W_mean, D, M)
            A_in = 0.5 * tr_W * Kuu_inv - 0.5 * sumRv_W
            mu_blocks = _split_blocks(mu_v, M, D)

            # ---- 1. Jacobi update of this shard's q(x_t) ------------------
            in_means, in_covs = pred_arrays(x0_m, x0_V, means_loc, covs_loc)
            _, psi1_in, _, _ = psiops.psi_batch_expected_multi(
                kernel, theta, Xu, sr, in_means, in_covs
            )
            out_means = (mu_blocks @ psi1_in).T  # (T_loc, D)
            prec_g = W_mean + P_inv
            xi_g = out_means @ W_mean.T + obs_xi_loc
            Lg = chol_lower(sym(prec_g))
            cov_g = sym(chol_solve(Lg, jnp.eye(D, dtype=dt)))
            mean_g = xi_g @ cov_g.T

            # successor means for the in-message to x_t: right halo for the
            # block's last row (zeros on the last shard — masked below)
            succ_halo = _halo_from_right(means_loc[0], axis, ndev)
            succ_means = jnp.concatenate([means_loc[1:], succ_halo[None]], 0)
            sumdiagV = succ_means @ W_mean.T @ mu_blocks  # (T_loc, M)

            def refine(mean_f, cov_f, sdV):
                def logpdf(x):
                    k = psiops.psi1_exact(kernel, theta, Xu, x)
                    psi0 = kernel.kxx(theta, x)
                    return -0.5 * tr_W * psi0 + k @ A_in @ k + sdV @ k

                return quad.moment_match_multi(logpdf, mean_f, cov_f, method=sr)

            m_ref, V_ref = jax.vmap(refine)(
                mean_g, jnp.tile(cov_g, (T_loc, 1, 1)), sumdiagV
            )
            new_means = jnp.where(last_row[:, None], mean_g, m_ref)
            new_covs = jnp.where(last_row[:, None, None], cov_g, V_ref)

            # x0 (= x_prev): prior × in-message from node 1, whose μ_y is the
            # OLD mean of x_1 — owned by shard 0, broadcast with one psum of
            # a (D,) vector; the refine itself is replicated O(M·D) work.
            x1_mean = psum_(jnp.where(is_first, means_loc[0], jnp.zeros(D, dt)))
            sdV0 = (W_mean @ x1_mean) @ mu_blocks
            new_x0_m, new_x0_V = refine(x0_base_mean, x0_base_cov, sdV0)

            # ---- 2./3. q(v) + q(W): the shared global-update core, with the
            # data-sums psum'd over the mesh axis ----------------------------
            in_means, in_covs = pred_arrays(new_x0_m, new_x0_V, new_means, new_covs)
            xi_v, prec_v, W_df, W_rate = chain_qv_qw_updates(
                kernel, theta, Xu, sr, Kuu_inv, prior_v, S0_inv, prior_W_df,
                T, in_means, in_covs, new_means, new_covs, W_mean, dt,
                reduce=psum_,
            )

            return (new_x0_m, new_x0_V, new_means, new_covs,
                    xi_v, prec_v, W_df, W_rate), None

        # init: the single-device smoother's fresh state (or a warm
        # ``init_state`` in its replicated T+1 layout), sliced locally.
        # The local marginal blocks must carry the 'varying' vma (their
        # per-sweep updates depend on the shard's own data), so the init is
        # pcast to match the scan body's output type.
        if init_state is None:
            x0_m0, x0_V0 = prior_x0_mean, prior_x0_cov
            means0 = jnp.zeros((T_loc, D), dt)
            covs0 = jnp.tile(init_x_cov_scale * jnp.eye(D, dtype=dt),
                             (T_loc, 1, 1))
            xi_v0, prec_v0 = prior_v.xi, prior_v.prec
            W_df0, W_rate0 = jnp.asarray(prior_W_df, dt), S0_inv
        else:
            x0_m0, x0_V0 = init_state.x_means[0], init_state.x_covs[0]
            start = 1 + idx * T_loc
            means0 = jax.lax.dynamic_slice_in_dim(init_state.x_means, start, T_loc)
            covs0 = jax.lax.dynamic_slice_in_dim(init_state.x_covs, start, T_loc)
            xi_v0, prec_v0 = init_state.xi_v, init_state.prec_v
            W_df0 = jnp.asarray(init_state.W_df, dt)
            W_rate0 = init_state.W_rate
        def varying(x):  # no-op if x already carries the axis vma
            if axis in jax.typeof(x).vma:
                return x
            return jax.lax.pcast(x, (axis,), to="varying")

        state0 = (
            x0_m0,
            x0_V0,
            varying(means0),
            varying(covs0),
            xi_v0,
            prec_v0,
            W_df0,
            W_rate0,
        )
        state, _ = jax.lax.scan(sweep, state0, None, length=n_iters)
        x0_m, x0_V, means_loc, covs_loc, xi_v, prec_v, W_df, W_rate = state

        # ---- free energy: the shared FE core, data-sums psum'd ------------
        fe = jnp.asarray(0.0, dt)
        if compute_fe:
            in_means, in_covs = pred_arrays(x0_m, x0_V, means_loc, covs_loc)
            fe = chain_fe_terms(
                kernel, theta, Xu, Kuu_inv, ys_loc, Pobs, prior_x0_mean,
                prior_x0_cov, prior_v, prior_W_df, prior_W_scale,
                x0_m, x0_V, means_loc, covs_loc, in_means, in_covs,
                xi_v, prec_v, W_df, W_rate, sr, reduce=psum_,
            )

        return x0_m, x0_V, means_loc, covs_loc, xi_v, prec_v, W_df, W_rate, fe

    rep = P()
    out = jax.shard_map(
        local_program,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(rep, rep, P(axis, None), P(axis, None, None),
                   rep, rep, rep, rep, rep),
    )(ys)
    x0_m, x0_V, means_sh, covs_sh, xi_v, prec_v, W_df, W_rate, fe = out
    state = gather_sp_state(x0_m, x0_V, means_sh, covs_sh, xi_v, prec_v,
                            W_df, W_rate)
    return state, fe


def gather_sp_state(x0_m, x0_V, means_sh, covs_sh, xi_v, prec_v, W_df,
                    W_rate) -> GPSSMState:
    """Assemble the single-device GPSSMState layout (T+1 rows, index 0 =
    x_prev) from the sequence-parallel outputs. The concatenation realizes
    the sharded rows replicated — fine for the (T·D)-sized chain state."""
    return GPSSMState(
        jnp.concatenate([x0_m[None], means_sh], 0),
        jnp.concatenate([x0_V[None], covs_sh], 0),
        xi_v, prec_v, W_df, W_rate,
    )
