"""Serving-layer tests: predictor handles must reproduce the trainers' and
golden artifacts' predictions exactly."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from gaussianprocessnode_tpu.dists import GammaShapeRate, MvGaussianNat
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus
from gaussianprocessnode_tpu.serve import SGPClassifier, SGPRegressor, throughput
from gaussianprocessnode_tpu.utils.metrics import smse

KER = Kernel("se", transform="softplus")
SAVE = "/root/reference/savefiles"


class TestRegressorHandle:
    def test_matches_direct_rule_and_recovers_mu(self):
        rng = np.random.default_rng(0)
        M, D, N = 12, 3, 40
        Xu = jnp.asarray(rng.standard_normal((M, D)))
        theta = invsoftplus(jnp.ones(D + 1))
        mu_true = jnp.asarray(rng.standard_normal(M))
        prec = jnp.eye(M) * 3.0 + 0.1 * jnp.ones((M, M))
        nat = MvGaussianNat(prec @ mu_true, prec)
        pred = SGPRegressor.from_natural(KER, theta, Xu, nat, w_mean=100.0)
        np.testing.assert_allclose(np.asarray(pred.mu_v), np.asarray(mu_true),
                                   rtol=1e-8)
        X = jnp.asarray(rng.standard_normal((N, D)))
        mean, var = pred(X)
        K = KER(theta, Xu, X)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(K.T @ mu_true),
                                   rtol=1e-7)
        np.testing.assert_allclose(np.asarray(var), 0.01, rtol=1e-12)

    def test_fused_scan_matches_per_batch_calls(self):
        """serve_fused (the compute-bound batch-of-batches mode) is a
        drop-in for the per-batch handle: (means, vars) rows EXACTLY equal
        to predictor(X_batches[i]), one dispatch for all rows."""
        from gaussianprocessnode_tpu.serve import serve_fused, throughput_fused

        rng = np.random.default_rng(5)
        M, D, B, R = 12, 3, 17, 4
        Xu = jnp.asarray(rng.standard_normal((M, D)))
        theta = invsoftplus(jnp.ones(D + 1))
        mu = jnp.asarray(rng.standard_normal(M))
        prec = jnp.eye(M) * 2.0
        pred = SGPRegressor.from_natural(
            KER, theta, Xu, MvGaussianNat(prec @ mu, prec), w_mean=100.0)
        Xb = jnp.asarray(rng.standard_normal((R, B, D)))
        means, vars_ = serve_fused(pred, Xb)
        assert means.shape == (R, B) and vars_.shape == (R, B)
        for i in range(R):
            mean_i, var_i = pred(Xb[i])
            np.testing.assert_array_equal(np.asarray(means[i]),
                                          np.asarray(mean_i))
            np.testing.assert_array_equal(np.asarray(vars_[i]),
                                          np.asarray(var_i))
        assert throughput_fused(pred, Xb[0], n_batches=3, iters=2) > 0

    def test_fused_scan_classifier_probabilities(self):
        """serve_fused on an SGPClassifier runs the probit Φ epilogue
        inside the scanned program: rows EXACTLY equal
        predictor.probabilities(X_batches[i])."""
        from gaussianprocessnode_tpu.serve import serve_fused

        rng = np.random.default_rng(7)
        M, D, B, R = 10, 2, 13, 3
        Xu = jnp.asarray(rng.standard_normal((M, D)))
        theta = invsoftplus(jnp.ones(D + 1))
        mu = jnp.asarray(rng.standard_normal(M))
        prec = jnp.eye(M) * 2.0
        qw = GammaShapeRate(jnp.asarray(3.0), jnp.asarray(2.0))
        clf = SGPClassifier.from_natural(
            KER, theta, Xu, MvGaussianNat(prec @ mu, prec), qw)
        Xb = jnp.asarray(rng.standard_normal((R, B, D)))
        probs = serve_fused(clf, Xb)
        assert probs.shape == (R, B)
        assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))
        for i in range(R):
            # the Φ epilogue fuses differently inside the scan body than in
            # the standalone program (measured: 8e-16 max abs on CPU) — the
            # means upstream ARE bit-exact (regressor test above), so the
            # tolerance here is the one-ulp fusion budget, not model error
            np.testing.assert_allclose(
                np.asarray(probs[i]), np.asarray(clf.probabilities(Xb[i])),
                rtol=1e-12, atol=5e-15)

    @pytest.mark.skipif(not os.path.isdir(SAVE), reason="no reference")
    def test_kin40k_golden_through_serving_handle(self):
        """The reference's saved kin40k posterior served through
        SGPRegressor reproduces its recorded SMSE (same anchor as
        test_golden_parity, now via the serving path)."""
        from gaussianprocessnode_tpu.utils.datasets import kin40k
        from gaussianprocessnode_tpu.utils.jld import load_jld

        qv = load_jld(os.path.join(SAVE, "qv_kin40k.jld"))
        mu = jnp.asarray(np.asarray(qv["μ_"]))
        Sig = jnp.asarray(np.asarray(qv["Σ_"]))
        prec = jnp.linalg.inv(0.5 * (Sig + Sig.T))
        nat = MvGaussianNat(prec @ mu, prec)
        theta = jnp.asarray(np.asarray(load_jld(os.path.join(SAVE, "params_optimal_kin40k.jld"))))
        Xu = jnp.asarray(np.asarray(load_jld(os.path.join(SAVE, "Xu_kin40k.jld"))))
        smse_ref = float(load_jld(os.path.join(SAVE, "SMSE_kin40k.jld")))
        data = kin40k()
        pred = SGPRegressor.from_natural(KER, theta, Xu, nat, w_mean=1e4)
        mean, _ = pred(jnp.asarray(data.x_test))
        np.testing.assert_allclose(
            float(smse(data.y_test, np.asarray(mean))), smse_ref, rtol=1e-7
        )
        # throughput helper returns a sane positive rate
        assert throughput(pred, jnp.asarray(data.x_test[:1000]), iters=2) > 0


class TestClassifierHandle:
    def test_probabilities_match_direct_rule(self):
        from gaussianprocessnode_tpu.infer.batch_vmp import predict_probit

        rng = np.random.default_rng(1)
        M, N = 10, 30
        Xu = jnp.asarray(rng.standard_normal((M, 2)))
        theta = invsoftplus(jnp.ones(3))
        mu_true = jnp.asarray(rng.standard_normal(M))
        prec = jnp.eye(M) * 2.0
        nat = MvGaussianNat(prec @ mu_true, prec)
        qw = GammaShapeRate(jnp.asarray(3.0), jnp.asarray(2.0))
        clf = SGPClassifier.from_natural(KER, theta, Xu, nat, qw)
        X = jnp.asarray(rng.standard_normal((N, 2)))
        probs = clf.probabilities(X)
        direct = predict_probit(KER, theta, Xu, X, mu_true, 1.5)
        np.testing.assert_allclose(np.asarray(probs), np.asarray(direct),
                                   rtol=1e-7)
        labels = clf(X)
        np.testing.assert_array_equal(
            np.asarray(labels), (np.asarray(probs) >= 0.5).astype(float)
        )


class TestModelApiIntegration:
    def test_model_front_end_returns_working_handles(self):
        """SGPRegression/SGPClassification .predictor() must serve the same
        predictions as their .predict()/.predict_proba() on the inferred
        posterior."""
        from gaussianprocessnode_tpu.infer.model import (
            SGPClassification,
            SGPRegression,
        )

        rng = np.random.default_rng(5)
        X = jnp.asarray(np.linspace(-3, 3, 40)[:, None])
        y = jnp.asarray(np.sin(np.asarray(X)[:, 0]) + 0.05 * rng.standard_normal(40))
        Xu = X[::4]
        theta = invsoftplus(jnp.asarray([1.0, 1.0]))

        reg = SGPRegression(KER, Xu)
        res = reg.infer(theta, X, y)
        pred = reg.predictor(theta, res)
        m_handle, _ = pred(X)
        m_direct, _ = reg.predict(theta, res, X)
        np.testing.assert_allclose(np.asarray(m_handle), np.asarray(m_direct),
                                   rtol=1e-6, atol=1e-8)

        yc = jnp.asarray((np.asarray(y) > 0).astype(float))
        clf_model = SGPClassification(KER, Xu)
        res_c = clf_model.infer(theta, X, yc)
        clf = clf_model.predictor(theta, res_c)
        p_handle = clf.probabilities(X)
        p_direct = clf_model.predict_proba(theta, res_c, X)
        np.testing.assert_allclose(np.asarray(p_handle), np.asarray(p_direct),
                                   rtol=1e-6, atol=1e-8)


class TestShardedServing:
    def test_sharded_requests_match_single_device(self):
        """Data-parallel serving: the SAME predictor handle fed a mesh-sharded
        request batch must return identical predictions (GSPMD partitions the
        Gram + mat-vec per chip; state replicates, no collectives)."""
        import jax
        from jax.sharding import Mesh

        from gaussianprocessnode_tpu.dists import MvGaussianNat
        from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus
        from gaussianprocessnode_tpu.serve import SGPRegressor, shard_requests

        rng = np.random.default_rng(5)
        M, D, N = 64, 4, 800
        kernel = Kernel("se", transform="softplus")
        Q = jnp.asarray(rng.standard_normal((M, M)))
        reg = SGPRegressor.from_natural(
            kernel, invsoftplus(jnp.ones(D + 1)),
            jnp.asarray(rng.standard_normal((M, D))),
            MvGaussianNat(jnp.asarray(rng.standard_normal(M)),
                          Q @ Q.T / M + jnp.eye(M)),
            1e4,
        )
        X = jnp.asarray(rng.standard_normal((N, D)))
        mean_single, var_single = reg(X)
        mesh = Mesh(jax.devices()[:8], ("dp",))
        Xs = shard_requests(mesh, X)
        mean_dp, var_dp = reg(Xs)
        np.testing.assert_allclose(np.asarray(mean_dp), np.asarray(mean_single),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(var_dp), np.asarray(var_single),
                                   rtol=1e-12)
        # the output keeps the request sharding (per-chip slices, no gather)
        assert not mean_dp.sharding.is_fully_replicated
