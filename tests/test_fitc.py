"""FITC / SoR / DTC baselines (infer/fitc.py) vs dense oracles and the
reference's recorded numbers.

Reference: .ipynb_checkpoints/Regression_FITC_SoR-checkpoint.ipynb —
GaussianProcesses.jl SoR/FITC on the SAME saved toy draw this repo already
replays (savefiles/*_toyregression.jld): recorded toy SMSE 0.008066 (SoR) /
0.008064 (FITC), cell 7.

Oracle levels (SURVEY §4 pattern):
- analytic: NLML/predictive vs dense numpy/scipy computations of the exact
  Σ = Q_ff + D model; Xu=X degeneracy → the exact GP.
- optimizer: training on the reference draw lands in the recorded SMSE
  regime.
"""

import jax.numpy as jnp
import numpy as np
from scipy.stats import multivariate_normal

from gaussianprocessnode_tpu.infer.fitc import (
    SparseGPParams,
    fit_sparse_gp,
    init_sparse_gp,
    sparse_nlml,
    sparse_predict,
)
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus
from gaussianprocessnode_tpu.utils.datasets import toy_sinc_reference
from gaussianprocessnode_tpu.utils.metrics import smse

KERNEL = Kernel("se", transform="softplus")
JIT = 1e-12  # tiny Kuu jitter so the dense oracles match to f64 round-off


def _setup(n=25, m=6, d=2, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.normal(size=(n, d)))
    Xu = jnp.asarray(rng.normal(size=(m, d)))
    y = jnp.asarray(rng.normal(size=n))
    theta = invsoftplus(jnp.asarray([1.3, 0.8, 1.1]))
    params = SparseGPParams(theta=theta, log_noise=jnp.asarray(jnp.log(0.3)))
    return X, Xu, y, params


def _dense_cov(params, Xu, X, method):
    """The exact N×N covariance of the approximate model, densely."""
    Kuu = np.asarray(KERNEL.kuu(params.theta, Xu, jitter=JIT))
    Kux = np.asarray(KERNEL(params.theta, Xu, X))
    Q = Kux.T @ np.linalg.solve(Kuu, Kux)
    noise = float(np.exp(params.log_noise))
    if method == "fitc":
        kxx = np.asarray(KERNEL.diag(params.theta, X))
        D = noise + np.maximum(kxx - np.diag(Q), 0.0)
    else:
        D = np.full(X.shape[0], noise)
    return Q + np.diag(D), Kux, Kuu, D


class TestNlmlOracles:
    def test_nlml_vs_scipy_dense(self):
        """Woodbury NLML == dense multivariate-normal logpdf, all methods."""
        X, Xu, y, params = _setup()
        for method in ("sor", "dtc", "fitc"):
            Sigma, _, _, _ = _dense_cov(params, Xu, X, method)
            want = -multivariate_normal.logpdf(np.asarray(y), cov=Sigma)
            got = float(sparse_nlml(KERNEL, params, Xu, X, y,
                                    method=method, jitter=JIT))
            assert abs(got - want) < 1e-9 * abs(want), (method, got, want)

    def test_sor_equals_dtc_training_criterion(self):
        X, Xu, y, params = _setup()
        a = float(sparse_nlml(KERNEL, params, Xu, X, y, method="sor", jitter=JIT))
        b = float(sparse_nlml(KERNEL, params, Xu, X, y, method="dtc", jitter=JIT))
        assert a == b

    def test_xu_equals_x_recovers_exact_gp(self):
        """With Xu = X, Q_ff = K_ff: FITC's diag correction vanishes and all
        three NLMLs equal the exact GP's −log N(y; 0, K + σ²I)."""
        X, _, y, params = _setup(n=20)
        K = np.asarray(KERNEL.kuu(params.theta, X, jitter=0.0))
        noise = float(np.exp(params.log_noise))
        want = -multivariate_normal.logpdf(
            np.asarray(y), cov=K + noise * np.eye(len(y)))
        for method in ("sor", "fitc"):
            got = float(sparse_nlml(KERNEL, params, X, X, y,
                                    method=method, jitter=JIT))
            assert abs(got - want) < 1e-7 * abs(want), (method, got, want)


class TestPredictOracles:
    def test_predict_vs_dense(self):
        """mean = K*u Λ⁻¹ K_uf D⁻¹ y, var per method — densely with numpy."""
        X, Xu, y, params = _setup()
        rng = np.random.default_rng(1)
        Xt = jnp.asarray(rng.normal(size=(7, X.shape[1])))
        for method in ("sor", "dtc", "fitc"):
            _, Kux, Kuu, D = _dense_cov(params, Xu, X, method)
            Kut = np.asarray(KERNEL(params.theta, Xu, Xt))
            Lam = Kuu + (Kux / D) @ Kux.T
            mean_want = Kut.T @ np.linalg.solve(Lam, (Kux / D) @ np.asarray(y))
            var_deg = np.einsum("mt,mt->t", Kut, np.linalg.solve(Lam, Kut))
            if method == "sor":
                var_want = var_deg
            else:
                ktt = np.asarray(KERNEL.diag(params.theta, Xt))
                qtt = np.einsum("mt,mt->t", Kut, np.linalg.solve(Kuu, Kut))
                var_want = ktt - qtt + var_deg
            mean, var = sparse_predict(KERNEL, params, Xu, Xt, X, y,
                                       method=method, jitter=JIT)
            np.testing.assert_allclose(np.asarray(mean), mean_want,
                                       rtol=1e-8, atol=1e-10)
            np.testing.assert_allclose(np.asarray(var), var_want,
                                       rtol=1e-7, atol=1e-10)

    def test_sor_variance_collapses_far_from_xu(self):
        """The textbook SoR pathology the notebook's models share: the
        degenerate prior has ~zero variance far from the inducing set, while
        FITC restores the full prior marginal there."""
        X, Xu, y, params = _setup()
        far = jnp.full((1, X.shape[1]), 50.0)
        _, v_sor = sparse_predict(KERNEL, params, Xu, far, X, y, method="sor",
                                  jitter=JIT)
        _, v_fitc = sparse_predict(KERNEL, params, Xu, far, X, y,
                                   method="fitc", jitter=JIT)
        prior = float(KERNEL.diag(params.theta, far)[0])
        assert float(v_sor[0]) < 1e-6 * prior
        assert abs(float(v_fitc[0]) - prior) < 1e-6 * prior


class TestToyRegressionReference:
    def test_training_lands_on_recorded_optimum(self):
        """Training on the reference's exact saved draw + saved Xu lands ON
        the recorded SMSE (SoR 0.008066 / FITC 0.008064, notebook cell 7, to
        ~1e-6): the 3-parameter toy NLML has one optimum and both the
        notebook's CG and our AdaMax converge to it."""
        import os
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "experiments"))
        from vsgp_baselines import _saved_xu

        data = toy_sinc_reference()
        X, y = jnp.asarray(data.x_train), jnp.asarray(data.y_train)
        Xu = _saved_xu("Xu_toyregression.jld")  # the notebook's saved grid
        theta0 = invsoftplus(jnp.asarray([1.0, 1.0]))
        for method, want in (("sor", 0.008066), ("fitc", 0.008064)):
            params, trace = fit_sparse_gp(
                KERNEL, init_sparse_gp(theta0, noise=1.0), Xu, X, y,
                method=method, steps=800, learning_rate=0.05, jitter=1e-8)
            assert float(trace[-1]) < float(trace[0])  # NLML decreased
            mean, _ = sparse_predict(KERNEL, params, Xu,
                                     jnp.asarray(data.x_test), X, y,
                                     method=method, jitter=1e-8)
            score = float(smse(data.y_test, np.asarray(mean)))
            # measured: SoR 0.008066 vs recorded 0.008066, FITC 0.008064 vs
            # 0.008064 (experiments/vsgp_baselines.py fitc_sor_toy)
            assert abs(score - want) < 1e-4, (method, score, want)
