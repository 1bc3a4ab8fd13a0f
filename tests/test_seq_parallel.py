"""Sequence-parallel GPSSM smoother tests (8-virtual-device CPU mesh).

The time-sharded Jacobi smoother (parallel/seq_parallel.gpssm_vmp_sp) must
equal the single-device Jacobi engine (infer/chain_smoother.gpssm_vmp): the
halos deliver exactly the neighbor marginals the dense sweep reads, and the
q(v)/q(W)/FE reductions are pure sums over t, so the only difference is f64
sum reordering across shards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussianprocessnode_tpu.dists import MvGaussianNat
from gaussianprocessnode_tpu.infer.chain_smoother import gpssm_vmp
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus
from gaussianprocessnode_tpu.parallel.seq_parallel import (
    gpssm_vmp_sp,
    shard_chain_data,
)
from gaussianprocessnode_tpu.parallel.sharding import make_mesh
from gaussianprocessnode_tpu.utils.datasets import pendulum, pendulum_inducing

KERNEL = Kernel("se", transform="softplus")


def _chain_problem(T):
    x_state, y_obs, Q, P, dt = pendulum()
    y_train = jnp.asarray(y_obs[:T])
    Xu = jnp.asarray(pendulum_inducing())
    M, D = Xu.shape[0], 2
    theta = invsoftplus(jnp.asarray([1.0, 2.0, 2.0]))
    prior_v = MvGaussianNat(jnp.zeros(M * D), jnp.eye(M * D) / 50.0)
    args = dict(
        theta=theta, Xu=Xu, Pobs=jnp.asarray(P),
        prior_x0_mean=jnp.asarray([1.6, 0.0]),
        prior_x0_cov=0.1 * jnp.eye(2),
        prior_v=prior_v, prior_W_df=100.0, prior_W_scale=jnp.eye(2),
    )
    return y_train, args, x_state


def _single_device(y_train, a, n_iters):
    return gpssm_vmp(
        KERNEL, a["theta"], a["Xu"], y_train, a["Pobs"], a["prior_x0_mean"],
        a["prior_x0_cov"], a["prior_v"], a["prior_W_df"], a["prior_W_scale"],
        n_iters=n_iters,
    )


def _sp(y_train, a, mesh, n_iters, init_state=None):
    ys = shard_chain_data(mesh, y_train)
    return gpssm_vmp_sp(
        KERNEL, a["theta"], a["Xu"], ys, a["Pobs"], a["prior_x0_mean"],
        a["prior_x0_cov"], a["prior_v"], a["prior_W_df"], a["prior_W_scale"],
        mesh=mesh, n_iters=n_iters, init_state=init_state,
    )


def _assert_states_close(st_sp, st_ref, fe_sp, fe_ref, atol, g_rtol=1e-9):
    """atol bounds the marginals; g_rtol the global reductions (q(v), q(W),
    FE), which inherit the marginals' deviation through the data sums."""
    np.testing.assert_allclose(st_sp.x_means, st_ref.x_means, atol=atol)
    np.testing.assert_allclose(st_sp.x_covs, st_ref.x_covs, atol=atol)
    np.testing.assert_allclose(st_sp.xi_v, st_ref.xi_v, rtol=g_rtol, atol=atol)
    np.testing.assert_allclose(st_sp.prec_v, st_ref.prec_v, rtol=g_rtol,
                               atol=atol)
    np.testing.assert_allclose(st_sp.W_rate, st_ref.W_rate, rtol=g_rtol,
                               atol=atol)
    assert float(st_sp.W_df) == float(st_ref.W_df)
    np.testing.assert_allclose(float(fe_sp), float(fe_ref), rtol=g_rtol,
                               atol=atol)


@pytest.mark.parametrize("ndev", [1, 2, 4, 8])
def test_sp_sweep_matches_single_device(ndev):
    """ONE time-sharded sweep ≡ one dense Jacobi sweep at every mesh size:
    the sweep map is what the halos must reproduce, so single-application
    agreement IS the equivalence proof.

    Two starts, two tolerance regimes, both calibrated by measurement:

    - from an INJECTED mid-trajectory state (the strong claim): identical
      inputs → the sharded sweep reproduces the dense one to round-off
      (measured 0.0 on the marginals at ndev=2; psum reorder only enters
      the global q(v)/q(W) sums at ~1e-13);
    - from the FRESH state: the early sweep map at this untrained θ
      amplifies ulp-level perturbations ~1e10× (measured single-device: a
      1e-13 perturbation of the sweep-1 natural parameters moves sweep-2
      marginals by 6e-4), so the fresh-sweep bound is the amplification
      envelope, not round-off.

    T=32 keeps the per-shard block at T_loc ≥ 4: at T_loc=2 the
    differently-shaped local Ψ Grams round differently at the ulp, which
    can flip a borderline moment-match singularity guard and swap one
    marginal between its refined and fallback values (measured 6e-4 on one
    row, T_loc=4 exact) — a discontinuity of the guard, not of the
    sharding."""
    T = 32
    y_train, a, _ = _chain_problem(T)
    mesh = make_mesh(jax.devices()[:ndev], axis="sp")

    # one sweep from the fresh initialization (chaotic-amplification bound)
    st_ref, fe_ref = _single_device(y_train, a, 1)
    st_sp, fe_sp = _sp(y_train, a, mesh, 1)
    _assert_states_close(st_sp, st_ref, fe_sp, fe_ref, atol=5e-4, g_rtol=1e-4)

    # one sweep from an injected mid-trajectory state: identical inputs on
    # both engines — THE equivalence check, at round-off tolerance
    st_mid, _ = _single_device(y_train, a, 40)
    st_ref2, fe_ref2 = gpssm_vmp(
        KERNEL, a["theta"], a["Xu"], y_train, a["Pobs"], a["prior_x0_mean"],
        a["prior_x0_cov"], a["prior_v"], a["prior_W_df"], a["prior_W_scale"],
        n_iters=1, init_state=st_mid,
    )
    st_sp2, fe_sp2 = _sp(y_train, a, mesh, 1, init_state=st_mid)
    _assert_states_close(st_sp2, st_ref2, fe_sp2, fe_ref2, atol=1e-9)


def test_sp_tracks_the_jacobi_trajectory():
    """40 sharded sweeps track 40 dense sweeps within the round-off
    amplification envelope: measured SP-vs-dense gap at matched sweep
    counts is 3-5e-3 on the marginals, 50× SMALLER than the trajectory's
    own 40→80-sweep movement (0.17) — i.e. both engines ride the same
    trajectory, the gap is ulp-seeded divergence, not a different path.
    (The same bar test_e2e.py holds the Gauss–Seidel engine to, 0.05,
    with a tighter measured-based bound here since the maps are identical.)"""
    T = 16
    y_train, a, _ = _chain_problem(T)
    st_ref, fe_ref = _single_device(y_train, a, 40)
    mesh = make_mesh(jax.devices()[:4], axis="sp")
    st_sp, fe_sp = _sp(y_train, a, mesh, 40)
    np.testing.assert_allclose(st_sp.x_means, st_ref.x_means, atol=0.02)
    np.testing.assert_allclose(st_sp.W_rate, st_ref.W_rate, atol=0.01)
    assert abs(float(fe_sp) - float(fe_ref)) < 1.0


def test_sp_indivisible_chain_rejected():
    mesh = make_mesh(jax.devices()[:8], axis="sp")
    with pytest.raises(ValueError, match="not divisible"):
        shard_chain_data(mesh, jnp.zeros((30, 2)))


def test_sp_smoothing_quality_at_pendulum_scale():
    """The sharded smoother actually smooths at (reduced) pendulum scale:
    T=120 over 8 devices, same quality bar as the single-device e2e test."""
    T = 120
    y_train, a, x_state = _chain_problem(T)
    mesh = make_mesh(jax.devices()[:8], axis="sp")
    ys = shard_chain_data(mesh, y_train)
    state, fe = gpssm_vmp_sp(
        KERNEL, a["theta"], a["Xu"], ys, a["Pobs"], a["prior_x0_mean"],
        a["prior_x0_cov"], a["prior_v"], a["prior_W_df"], a["prior_W_scale"],
        mesh=mesh, n_iters=15,
    )
    assert bool(jnp.all(jnp.isfinite(state.x_means)))
    assert jnp.isfinite(fe)
    from gaussianprocessnode_tpu.utils.metrics import smse

    s1 = float(smse(x_state[:T, 0], np.asarray(state.x_means[1:, 0])))
    assert s1 < 0.05
