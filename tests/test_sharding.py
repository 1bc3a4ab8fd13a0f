"""Data-parallel sharding tests on the 8-virtual-device CPU mesh.

Verifies the psum'd natural-parameter sweep and the psum'd hyperparameter
gradient equal their single-device counterparts (the collective is a pure
sum, so results must match to round-off)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gaussianprocessnode_tpu.dists import MvGaussianNat
from gaussianprocessnode_tpu.objectives import neg_log_backwardmess_gram
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus
from gaussianprocessnode_tpu.ops.linalg import ir_solve, spd_inverse, sym
from gaussianprocessnode_tpu.parallel.sharding import (
    dp_regression_sweep,
    dp_train_step,
    make_mesh,
    shard_data,
)

rng = np.random.default_rng(0)

KER = Kernel("se", transform="softplus")
M, D, N = 12, 2, 64
XU = jnp.asarray(rng.standard_normal((M, D)))
X = jnp.asarray(rng.standard_normal((N, D)))
Y = jnp.asarray(rng.standard_normal(N))
THETA = invsoftplus(jnp.ones(D + 1))
PRIOR = MvGaussianNat(jnp.zeros(M), jnp.eye(M) / 50.0)
W = 100.0


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_dp_sweep_matches_single_device():
    mesh = make_mesh(jax.devices()[:8])
    Xs, ys = shard_data(mesh, X, Y)
    mu_dp, cov_dp, nat_dp = dp_regression_sweep(KER, THETA, XU, Xs, ys, PRIOR, W, mesh)

    Kux = KER(THETA, XU, X)
    xi = PRIOR.xi + W * (Kux @ Y)
    prec = sym(PRIOR.prec + W * (Kux @ Kux.T))
    cov = spd_inverse(prec, iters=40)
    mu = ir_solve(prec, xi, cov, rounds=2)

    np.testing.assert_allclose(nat_dp.xi, xi, rtol=1e-10)
    np.testing.assert_allclose(nat_dp.prec, prec, rtol=1e-10)
    np.testing.assert_allclose(mu_dp, mu, rtol=1e-8)


def test_dp_train_step_matches_single_device():
    mesh = make_mesh(jax.devices()[:8])
    Xs, ys = shard_data(mesh, X, Y)
    optimizer = optax.adamax(0.001)
    opt_state = optimizer.init(THETA)
    theta_dp, _, nat = dp_train_step(
        KER, THETA, opt_state, optimizer, XU, Xs, ys, PRIOR, W, mesh
    )

    # single-device equivalent
    Kux = KER(THETA, XU, X)
    xi = PRIOR.xi + W * (Kux @ Y)
    prec = sym(PRIOR.prec + W * (Kux @ Kux.T))
    cov = spd_inverse(prec, iters=40)
    mu = ir_solve(prec, xi, cov, rounds=2)
    Rv = cov + jnp.outer(mu, mu)

    def loss(th):
        val, _ = neg_log_backwardmess_gram(
            th, kernel=KER, Xu=XU, X=X, y=Y, mu_v=mu, Rv=Rv, w=W, ns_iters=40
        )
        return val

    g = jax.grad(loss)(THETA)
    upd, _ = optimizer.update(g, optimizer.init(THETA), THETA)
    theta_ref = optax.apply_updates(THETA, upd)
    np.testing.assert_allclose(theta_dp, theta_ref, atol=1e-8)


def test_dp_sweep_invariant_to_mesh_size():
    """The psum'd natural parameters must be identical (to round-off) on
    1-, 2-, 4- and 8-device meshes — the collective is a pure data sum, so
    the device partitioning cannot change the result."""
    results = []
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(jax.devices()[:n_dev])
        Xs, ys = shard_data(mesh, X, Y)
        _, _, nat = dp_regression_sweep(KER, THETA, XU, Xs, ys, PRIOR, W, mesh)
        results.append((np.asarray(nat.xi), np.asarray(nat.prec)))
    for xi, prec in results[1:]:
        np.testing.assert_allclose(xi, results[0][0], rtol=1e-10)
        np.testing.assert_allclose(prec, results[0][1], rtol=1e-10)
