"""Tensor-parallel (inducing-dimension) sharding tests on the virtual mesh.

The TP sweep ring-distributes every matmul (ppermute'd right-operand row
blocks, P partial contractions per output element), so results match the
single-device path up to ulp-level reassociation of the contraction —
which the Newton–Schulz inverse amplifies by κ(Λ). The asserted bands
(~1e-8..1e-7 on O(10..100) values) are that amplification envelope; the
natural parameters themselves, whose per-element arithmetic is a single
dot product either way, match to ~1e-12 relative.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus
from gaussianprocessnode_tpu.ops.linalg import (
    gershgorin_lambda_min, ir_solve, spd_inverse, sym,
)
from gaussianprocessnode_tpu.parallel.sharding import make_mesh
from gaussianprocessnode_tpu.parallel.tensor_parallel import (
    shard_inducing, tp_predict, tp_regression_sweep,
)

rng = np.random.default_rng(7)

KER = Kernel("se", transform="softplus")
M, D, N = 64, 3, 96
XU = jnp.asarray(rng.standard_normal((M, D)))
X = jnp.asarray(rng.standard_normal((N, D)))
Y = jnp.asarray(rng.standard_normal(N))
XT = jnp.asarray(rng.standard_normal((17, D)))
THETA = invsoftplus(jnp.asarray([1.0, 0.7, 1.3, 0.9]))
PRIOR_VAR = 50.0
W = 100.0


def _dense_sweep(ns_iters=40, lambda_min=None):
    Kux = KER(THETA, XU, X)
    xi = W * (Kux @ Y)
    prec = sym(jnp.eye(M) / PRIOR_VAR + W * (Kux @ Kux.T))
    cov = spd_inverse(prec, iters=ns_iters, lambda_min=lambda_min)
    mu = ir_solve(prec, xi, cov, rounds=2)
    return mu, cov, xi, prec


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_tp_sweep_matches_dense(n_dev):
    mesh = make_mesh(jax.devices()[:n_dev], axis="tp")
    Xu_s = shard_inducing(mesh, XU)
    mu_tp, cov_tp, xi_tp, prec_tp = tp_regression_sweep(
        KER, THETA, Xu_s, X, Y, PRIOR_VAR, W, mesh
    )
    mu, cov, xi, prec = _dense_sweep()
    np.testing.assert_allclose(np.asarray(xi_tp), xi, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(prec_tp), prec, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cov_tp), cov, rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(mu_tp), mu, rtol=1e-7, atol=1e-7)


def test_tp_sweep_scaled_ns_matches_dense():
    """The spectrum-scaled iteration (rigorous prior λmin bound, DEVIATIONS
    #22) distributes identically: same scalar enclosure tracking, row-blocked
    matmuls."""
    lam = float(gershgorin_lambda_min(np.eye(M) / PRIOR_VAR))
    mesh = make_mesh(jax.devices()[:4], axis="tp")
    Xu_s = shard_inducing(mesh, XU)
    mu_tp, cov_tp, _, _ = tp_regression_sweep(
        KER, THETA, Xu_s, X, Y, PRIOR_VAR, W, mesh,
        ns_iters=28, lambda_min=lam,
    )
    mu, cov, _, _ = _dense_sweep(ns_iters=28, lambda_min=lam)
    np.testing.assert_allclose(np.asarray(cov_tp), cov, rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(mu_tp), mu, rtol=1e-7, atol=1e-7)


def test_tp_predict_matches_dense():
    mesh = make_mesh(jax.devices()[:4], axis="tp")
    Xu_s = shard_inducing(mesh, XU)
    mu_tp, _, _, _ = tp_regression_sweep(
        KER, THETA, Xu_s, X, Y, PRIOR_VAR, W, mesh
    )
    mu_s = shard_inducing(mesh, jnp.asarray(np.asarray(mu_tp)))
    mean_tp, var_tp = tp_predict(KER, THETA, Xu_s, mu_s, W, XT, mesh)

    mu, _, _, _ = _dense_sweep()
    Kst = KER(THETA, XU, XT)
    np.testing.assert_allclose(np.asarray(mean_tp), Kst.T @ mu,
                               rtol=0, atol=1e-10)
    # per-point variance, same shape contract as batch_vmp.predict_out
    assert var_tp.shape == mean_tp.shape
    np.testing.assert_allclose(np.asarray(var_tp), 1.0 / W)


def test_tp_sweep_under_jit():
    """The whole sweep jits as one program (shard_map inside jit)."""
    mesh = make_mesh(jax.devices()[:4], axis="tp")
    Xu_s = shard_inducing(mesh, XU)

    @jax.jit
    def run(th):
        return tp_regression_sweep(KER, th, Xu_s, X, Y, PRIOR_VAR, W, mesh)[0]

    mu, _, _, _ = _dense_sweep()
    # jit changes XLA fusion order on top of the ring reassociation band
    np.testing.assert_allclose(np.asarray(run(THETA)), mu, rtol=1e-7, atol=1e-7)


@pytest.mark.parametrize("pd,pt", [(1, 8), (8, 1), (2, 4), (4, 2), (2, 2)])
def test_dp_tp_sweep_matches_dense(pd, pt):
    """2-D composition: Gram TILES K(Xu_loc, X_loc), ξ/Λ psum'd over dp,
    tp-distributed solve — same result as the dense path at every mesh
    factorization."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gaussianprocessnode_tpu.parallel.tensor_parallel import (
        dp_tp_regression_sweep,
    )

    mesh = Mesh(np.array(jax.devices()[:pd * pt]).reshape(pd, pt),
                ("dp", "tp"))
    Xu_s = jax.device_put(XU, NamedSharding(mesh, P("tp", None)))
    X_s = jax.device_put(X, NamedSharding(mesh, P("dp", None)))
    y_s = jax.device_put(Y, NamedSharding(mesh, P("dp")))
    mu_tp, cov_tp, xi_tp, prec_tp = dp_tp_regression_sweep(
        KER, THETA, Xu_s, X_s, y_s, PRIOR_VAR, W, mesh
    )
    mu, cov, xi, prec = _dense_sweep()
    # the dp-psum reassociates the Λ data sum (ulp-level input differences)
    # and the NS inverse amplifies those by κ — hence the looser cov/mu band
    # vs the tp-only test, where the accumulation order matches the dense path
    np.testing.assert_allclose(np.asarray(xi_tp), xi, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(prec_tp), prec, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(cov_tp), cov, rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(mu_tp), mu, rtol=1e-7, atol=1e-7)


def test_shard_inducing_rejects_uneven():
    mesh = make_mesh(jax.devices()[:8], axis="tp")
    with pytest.raises(ValueError):
        shard_inducing(mesh, jnp.zeros((12, 2)))  # 12 % 8 != 0
