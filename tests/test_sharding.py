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


class TestHeadlineTrainerDP:
    """fit_kin40k_fast_dp ≡ fit_kin40k_fast (VERDICT r2 item 3): the SHIPPED
    headline trainer sharded over the mesh, tested at the real kin40k shapes
    (M=600, N=4000 over 8 batches of 500, 8-D inputs, w=1e4) for multiple
    epochs."""

    def test_dp_headline_trainer_matches_single_device_real_shapes(self):
        from gaussianprocessnode_tpu.infer.minibatch import fit_kin40k_fast
        from gaussianprocessnode_tpu.parallel.sharding import (
            fit_kin40k_fast_dp,
            shard_batched_data,
        )

        r = np.random.default_rng(1)
        # batch 512 (not the reference's 500): the within-batch point dim is
        # the sharded axis and must divide the 8-device mesh
        M, Din, B, batch = 600, 8, 8, 512
        Xu = jnp.asarray(r.standard_normal((M, Din)))
        Xb = jnp.asarray(r.standard_normal((B, batch, Din)))
        yb = jnp.asarray(r.standard_normal((B, batch)))
        theta0 = invsoftplus(jnp.ones(Din + 1))
        prior_v = MvGaussianNat(jnp.zeros(M), jnp.eye(M) / 50.0)
        w_val = 1e4
        epochs = 2

        th1, nat1, cov1, _ = fit_kin40k_fast(
            KER, theta0, Xu, Xb, yb, prior_v, w_val, epochs
        )
        mesh = make_mesh(jax.devices()[:8])
        Xs, ys = shard_batched_data(mesh, Xb, yb)
        th2, nat2, cov2, _ = fit_kin40k_fast_dp(
            KER, theta0, Xu, Xs, ys, prior_v, w_val, epochs, mesh
        )
        # identical up to f64 sum reordering in the psum'd (ξ, Λ) and grads
        np.testing.assert_allclose(np.asarray(th2), np.asarray(th1), atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(nat2.prec), np.asarray(nat1.prec),
            rtol=1e-10, atol=1e-6 * float(jnp.max(jnp.abs(nat1.prec))),
        )
        np.testing.assert_allclose(
            np.asarray(cov2), np.asarray(cov1),
            atol=1e-8 * float(jnp.max(jnp.abs(cov1))),
        )

    def test_dp_headline_trainer_mesh_size_invariance(self):
        """Same trainer, 1/2/4/8 devices → same θ (small shapes; the mesh
        partitioning must not leak into the result)."""
        from gaussianprocessnode_tpu.parallel.sharding import (
            fit_kin40k_fast_dp,
            shard_batched_data,
        )

        r = np.random.default_rng(2)
        M_, Din, B, batch = 32, 3, 4, 64
        Xu = jnp.asarray(r.standard_normal((M_, Din)))
        Xb = jnp.asarray(r.standard_normal((B, batch, Din)))
        yb = jnp.asarray(r.standard_normal((B, batch)))
        theta0 = invsoftplus(jnp.ones(Din + 1))
        prior_v = MvGaussianNat(jnp.zeros(M_), jnp.eye(M_) / 50.0)
        thetas = []
        for n_dev in (1, 2, 4, 8):
            mesh = make_mesh(jax.devices()[:n_dev])
            Xs, ys = shard_batched_data(mesh, Xb, yb)
            th, _, _, _ = fit_kin40k_fast_dp(
                KER, theta0, Xu, Xs, ys, prior_v, 100.0, 2, mesh
            )
            thetas.append(np.asarray(th))
        for th in thetas[1:]:
            np.testing.assert_allclose(th, thetas[0], atol=1e-10)


class TestBananaTrainerDP:
    """fit_banana_fast_dp ≡ fit_banana_fast at the real banana shapes
    (M=500, N=4000 over 20 batches of 200, probit likelihood, carried
    Gamma q(w)) — the non-conjugate headline trainer sharded."""

    def test_dp_banana_trainer_matches_single_device_real_shapes(self):
        from gaussianprocessnode_tpu.dists import GammaShapeRate
        from gaussianprocessnode_tpu.infer.minibatch import fit_banana_fast
        from gaussianprocessnode_tpu.parallel.sharding import (
            fit_banana_fast_dp,
            shard_batched_data,
        )

        r = np.random.default_rng(3)
        M_, Din, B, batch = 500, 2, 20, 200  # 200/8 = 25 points per device
        Xu = jnp.asarray(r.standard_normal((M_, Din)))
        Xb = jnp.asarray(r.standard_normal((B, batch, Din)))
        yb = jnp.asarray((r.uniform(size=(B, batch)) > 0.5).astype(float))
        theta0 = invsoftplus(jnp.ones(Din + 1))
        prior_v = MvGaussianNat(jnp.zeros(M_), jnp.eye(M_) / 50.0)
        prior_w = GammaShapeRate(jnp.asarray(1e-2), jnp.asarray(1e-2))
        epochs = 2

        th1, nat1, qw1, _ = fit_banana_fast(
            KER, theta0, Xu, Xb, yb, prior_v, prior_w, epochs
        )
        mesh = make_mesh(jax.devices()[:8])
        Xs, ys = shard_batched_data(mesh, Xb, yb)
        th2, nat2, qw2, _ = fit_banana_fast_dp(
            KER, theta0, Xu, Xs, ys, prior_v, prior_w, epochs, mesh
        )
        np.testing.assert_allclose(np.asarray(th2), np.asarray(th1), atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(nat2.prec), np.asarray(nat1.prec),
            atol=1e-6 * float(jnp.max(jnp.abs(nat1.prec))),
        )
        np.testing.assert_allclose(float(qw2.rate), float(qw1.rate), rtol=1e-8)
        np.testing.assert_allclose(float(qw2.shape), float(qw1.shape), rtol=1e-12)


class TestPallasGramUnderShardMap:
    """Regression: pallas_call inside a vma-checking shard_map requires an
    EXPLICIT varying-manual-axes declaration on its out_shape — including an
    empty one for fully-replicated Grams like Kuu (found running the DP
    trainer with use_pallas=True on real TPU; ops/pallas_gram.py:_call_gram).
    The interpreter flag runs the true pallas_call path on CPU."""

    def _run_interpret(self, fn):
        from gaussianprocessnode_tpu.ops import pallas_gram as pg

        pg._INTERPRET = True
        jax.clear_caches()  # se_gram_pallas's jit trace depends on the flag
        try:
            return fn()
        finally:
            pg._INTERPRET = False
            jax.clear_caches()

    def test_replicated_gram_under_shard_map(self):
        """The exact crash case: a Kuu Gram whose operands are ALL replicated
        inside the shard_map, so the vma union is empty — the out_shape must
        still declare vma=frozenset(), not None. (The sharded-operand Gram is
        vma-correct too but the Pallas HLO *interpreter* cannot evaluate
        kernel-body literals under vma checking; that case is verified on
        real hardware by the DP-trainer probe and the bench run.)"""
        from gaussianprocessnode_tpu.ops import kernels as kern
        from gaussianprocessnode_tpu.ops import pallas_gram as pg
        from jax.sharding import PartitionSpec as P

        r = np.random.default_rng(7)
        Z = jnp.asarray(r.standard_normal((8, 3)), jnp.float32)
        Xs = jnp.asarray(r.standard_normal((16,)), jnp.float32)
        ls = jnp.asarray([0.7, 1.1, 1.4], jnp.float32)
        mesh = make_mesh(jax.devices()[:2])

        def local(x_loc):
            Kuu = pg.se_gram_auto(Z, Z, 1.3, ls)  # vma = {} (replicated)
            return jnp.sum(Kuu) + jax.lax.psum(jnp.sum(x_loc), "dp")

        def run():
            return jax.shard_map(
                local, mesh=mesh, in_specs=P("dp"), out_specs=P()
            )(Xs)

        got = float(self._run_interpret(run))
        want = float(jnp.sum(kern.se_gram(Z, Z, 1.3, ls)) + jnp.sum(Xs))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_interpret_kernel_matches_reference_outside_shard_map(self):
        from gaussianprocessnode_tpu.ops import kernels as kern
        from gaussianprocessnode_tpu.ops import pallas_gram as pg

        r = np.random.default_rng(8)
        Z = jnp.asarray(r.standard_normal((13, 3)), jnp.float32)
        Xs = jnp.asarray(r.standard_normal((29, 3)), jnp.float32)
        ls = jnp.asarray([0.7, 1.1, 1.4], jnp.float32)
        got = self._run_interpret(lambda: pg.se_gram_pallas(Z, Xs, 1.3, ls))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(kern.se_gram(Z, Xs, 1.3, ls)), atol=1e-6
        )
