"""Exact GP + Student-t process regression (infer/tprocess.py) vs dense
scipy oracles and a numerical-integration conditional oracle.

Reference: .ipynb_checkpoints/tpregression-checkpoint.ipynb — GP vs
GeneralizedTProcess posteriors on a sinc draw with two +2 outliers
(cell 2). The t-process math is Shah, Wilson & Ghahramani 2014 Lemma 3.
"""

import jax.numpy as jnp
import numpy as np
from scipy.stats import multivariate_normal, multivariate_t

from gaussianprocessnode_tpu.infer.tprocess import (
    gp_exact_posterior,
    tp_exact_posterior,
)
from gaussianprocessnode_tpu.ops.kernels import Kernel

KERNEL = Kernel("matern52", transform="identity")
THETA = jnp.asarray([1.0, float(np.log(2.0))])  # the notebook's ℓ = log 2


def _draw(n=20, seed=4, outliers=True):
    """The notebook's workload shape: sinc + precision-100 noise, two
    targets shifted by +2 (cell 2)."""
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(-3.0, 3.0, size=n))
    y = np.sinc(x / np.pi) + rng.normal(size=n) * 0.1
    if outliers:
        y[9:11] += 2.0
    xt = np.linspace(-3.1, 3.1, 60)
    return jnp.asarray(x[:, None]), jnp.asarray(y), jnp.asarray(xt[:, None])


class TestExactGP:
    def test_vs_dense_scipy(self):
        X, y, Xt = _draw()
        obs_var = 0.01
        res = gp_exact_posterior(KERNEL, THETA, X, y, Xt, obs_var)
        K = np.asarray(KERNEL(THETA, X, X)) + obs_var * np.eye(len(y))
        Kto = np.asarray(KERNEL(THETA, Xt, X))
        sol = np.linalg.solve(K, np.asarray(y))
        mean = Kto @ sol
        var = np.asarray(KERNEL.diag(THETA, Xt)) - np.einsum(
            "to,ot->t", Kto, np.linalg.solve(K, Kto.T))
        ll = multivariate_normal.logpdf(np.asarray(y), cov=K)
        np.testing.assert_allclose(np.asarray(res.mean), mean, rtol=1e-9,
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(res.var), var, rtol=1e-7,
                                   atol=1e-11)
        np.testing.assert_allclose(float(res.log_lik), ll, rtol=1e-10)


class TestTProcess:
    def test_nu_to_inf_recovers_gp(self):
        X, y, Xt = _draw()
        gp = gp_exact_posterior(KERNEL, THETA, X, y, Xt, 0.01)
        tp = tp_exact_posterior(KERNEL, THETA, 1e10, X, y, Xt, 0.01)
        np.testing.assert_allclose(np.asarray(tp.mean), np.asarray(gp.mean),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(tp.var), np.asarray(gp.var),
                                   rtol=1e-6, atol=1e-12)

    def test_conditional_vs_numeric_integration(self):
        """Lemma 3 vs direct quadrature of the joint MVT density: for
        (y, f*) ~ MVT₄(ν, 0, S), compute E[f*|y] and Var[f*|y] by 1-D
        numeric integration of the joint pdf over f* and compare."""
        nu, obs_var = 5.0, 0.05
        X, y, _ = _draw(n=3, seed=7, outliers=False)
        xt = jnp.asarray([[0.3]])
        tp = tp_exact_posterior(KERNEL, THETA, nu, X, y, xt, obs_var)

        Koo = np.asarray(KERNEL(THETA, X, X)) + obs_var * np.eye(3)
        Kot = np.asarray(KERNEL(THETA, X, xt))
        ktt = float(KERNEL.diag(THETA, xt)[0])
        S = np.block([[Koo, Kot], [Kot.T, np.array([[ktt]])]])
        grid = np.linspace(-12.0, 12.0, 60001)
        yv = np.asarray(y)
        pts = np.concatenate(
            [np.tile(yv, (len(grid), 1)), grid[:, None]], axis=1)
        pdf = multivariate_t.pdf(pts, loc=np.zeros(4), shape=S, df=nu)
        Z = np.trapezoid(pdf, grid)
        m_num = np.trapezoid(grid * pdf, grid) / Z
        v_num = np.trapezoid((grid - m_num) ** 2 * pdf, grid) / Z
        np.testing.assert_allclose(float(tp.mean[0]), m_num, rtol=1e-6,
                                   atol=1e-9)
        np.testing.assert_allclose(float(tp.var[0]), v_num, rtol=1e-4)

    def test_outliers_widen_tp_but_not_gp(self):
        """The notebook's headline behavior: the +2 outliers inflate β, so
        fit_scale > 1 and the TP ribbon widens everywhere, while the GP's
        posterior variance is data-value-independent."""
        X, y_out, Xt = _draw(outliers=True)
        _, y_cln, _ = _draw(outliers=False)
        obs_var = 0.01
        gp_out = gp_exact_posterior(KERNEL, THETA, X, y_out, Xt, obs_var)
        gp_cln = gp_exact_posterior(KERNEL, THETA, X, y_cln, Xt, obs_var)
        tp_out = tp_exact_posterior(KERNEL, THETA, 100.0, X, y_out, Xt, obs_var)
        tp_cln = tp_exact_posterior(KERNEL, THETA, 100.0, X, y_cln, Xt, obs_var)
        # GP variance identical whatever the targets
        np.testing.assert_allclose(np.asarray(gp_out.var),
                                   np.asarray(gp_cln.var), rtol=1e-12)
        # outliers push β = yᵀK̃⁻¹y above n (fit > 1); the clean draw sits
        # below its prior-expected fit (β ≈ n ⇒ fit ≈ 1)
        assert float(tp_out.fit_scale) > 1.0 > float(tp_cln.fit_scale)
        beta_out = float(tp_out.fit_scale) * 120.0 - 100.0  # ν=100, n=20
        beta_cln = float(tp_cln.fit_scale) * 120.0 - 100.0
        assert beta_out > 2.0 * beta_cln
        assert np.all(np.asarray(tp_out.var) > np.asarray(tp_cln.var))
