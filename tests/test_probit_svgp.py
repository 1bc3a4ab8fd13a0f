"""Oracle tests for the Probit node and the SVGP baseline."""

import numpy as np
from scipy import integrate, stats

import jax.numpy as jnp

from gaussianprocessnode_tpu.dists import Gaussian
from gaussianprocessnode_tpu.infer.svgp import (
    SVGPParams,
    elbo_gaussian,
    init_svgp,
    svgp_predict,
)
from gaussianprocessnode_tpu.nodes import probit
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus

rng = np.random.default_rng(0)


class TestProbit:
    def _numeric_tilted(self, m, v, y):
        s = 2 * y - 1

        def dens(f):
            return stats.norm.pdf(f, m, np.sqrt(v)) * stats.norm.cdf(s * f)

        Z, _ = integrate.quad(dens, m - 12 * np.sqrt(v), m + 12 * np.sqrt(v))
        m1, _ = integrate.quad(lambda f: f * dens(f), m - 12 * np.sqrt(v), m + 12 * np.sqrt(v))
        m2, _ = integrate.quad(lambda f: f * f * dens(f), m - 12 * np.sqrt(v), m + 12 * np.sqrt(v))
        mt = m1 / Z
        return mt, m2 / Z - mt * mt

    def test_tilted_moments_vs_quadrature(self):
        for m, v, y in [(0.3, 1.5, 1.0), (-1.2, 0.4, 0.0), (2.0, 3.0, 0.0)]:
            mt, vt = self._numeric_tilted(m, v, y)
            q = probit.tilted_marginal(Gaussian(jnp.asarray(m), jnp.asarray(v)), y)
            np.testing.assert_allclose(float(q.mean), mt, rtol=1e-8)
            np.testing.assert_allclose(float(q.var), vt, rtol=1e-7)

    def test_gh_underflow_falls_back_to_forward_marginal(self):
        """Review-r3 regression: in f32, all 32 GH probit values underflow
        at |m| ≳ 12 (a mislabeled outlier), making Zsum = 0; the floored Z
        then produced a FINITE but confidently wrong N(0, 1e-12) instead of
        the documented fallback to the forward marginal — the guard must
        also require Zsum > 0."""
        m, v, y = jnp.float32(-20.0), jnp.float32(0.5), jnp.float32(1.0)
        q = probit.tilted_marginal_gh(m, v, y)
        assert q.mean.dtype == jnp.float32  # genuinely the f32 path
        np.testing.assert_allclose(float(q.mean), -20.0)  # fallback = forward
        np.testing.assert_allclose(float(q.var), 0.5)

    def test_out_probability(self):
        # P(y=1) = Φ(m/√(1+v))
        q = Gaussian(jnp.asarray(0.7), jnp.asarray(2.0))
        np.testing.assert_allclose(
            float(probit.out_probability(q)), stats.norm.cdf(0.7 / np.sqrt(3.0)), rtol=1e-10
        )

    def test_average_energy_vs_quadrature(self):
        m, v, y = 0.4, 1.1, 1.0
        val, _ = integrate.quad(
            lambda f: -stats.norm.pdf(f, m, np.sqrt(v)) * stats.norm.logcdf(f),
            m - 12, m + 12,
        )
        U = probit.average_energy(Gaussian(jnp.asarray(m), jnp.asarray(v)), y)
        np.testing.assert_allclose(float(U), val, rtol=1e-6)


class TestSVGP:
    def test_elbo_collapses_to_marginal_likelihood(self):
        """With M=N, Xu=X and the OPTIMAL whitened q(u), the Gaussian ELBO
        equals the exact GP log marginal likelihood (Titsias)."""
        ker = Kernel("se", transform="identity")
        # well-separated inputs: clustered points make K jitter-dominated and
        # break the exact collapse identity
        N = 8
        X = jnp.asarray((np.linspace(-2, 2, N) + 0.05 * rng.standard_normal(N))[:, None])
        theta = jnp.asarray([1.3, 0.4])
        noise = 0.1
        K = np.asarray(ker(theta, X, X)) + 1e-10 * np.eye(N)
        f = np.linalg.cholesky(K) @ rng.standard_normal(N)
        y = jnp.asarray(f + rng.normal(size=N) * np.sqrt(noise))

        # exact log marginal likelihood
        Ky = K + noise * np.eye(N)
        L = np.linalg.cholesky(Ky)
        a = np.linalg.solve(Ky, np.asarray(y))
        lml = -0.5 * (np.asarray(y) @ a + 2 * np.sum(np.log(np.diag(L))) + N * np.log(2 * np.pi))

        # optimal whitened q(u): m̃ = Lᵀ Ky⁻¹... derived via S = (Kuu⁻¹ + Kuu⁻¹K K/σ² Kuu⁻¹)…
        # With Xu = X: q(u) optimal has mean K Ky⁻¹ y, cov K − K Ky⁻¹ K.
        Lk = np.linalg.cholesky(np.asarray(ker.kuu(theta, X, jitter=1e-8)))
        mu_opt = K @ np.linalg.solve(Ky, np.asarray(y))
        S_opt = K - K @ np.linalg.solve(Ky, K)
        m_white = np.linalg.solve(Lk, mu_opt)
        A_white = np.linalg.solve(Lk, np.linalg.cholesky(S_opt + 1e-12 * np.eye(N)))
        # invert the softplus-diagonal storage convention
        A_raw = np.tril(A_white, -1) + np.diag(np.log(np.expm1(np.diag(A_white))))
        params = SVGPParams(
            theta=theta,
            m_white=jnp.asarray(m_white),
            A_raw=jnp.asarray(A_raw),
            log_noise=jnp.log(jnp.asarray(noise)),
        )
        elbo = float(elbo_gaussian(ker, params, X, X, y))
        np.testing.assert_allclose(elbo, lml, rtol=1e-4)

    def test_predict_matches_exact_gp(self):
        """With the optimal q(u) and Xu=X, SVGP predictions equal exact GP."""
        ker = Kernel("se", transform="identity")
        N = 8
        X = jnp.asarray((np.linspace(-2, 2, N) + 0.05 * rng.standard_normal(N))[:, None])
        Xt = jnp.asarray(np.linspace(-1.9, 1.9, 7)[:, None])
        theta = jnp.asarray([1.0, 0.4])
        noise = 0.05
        K = np.asarray(ker(theta, X, X)) + 1e-10 * np.eye(N)
        y = jnp.asarray(np.linalg.cholesky(K) @ rng.standard_normal(N))
        Ky = K + noise * np.eye(N)
        Lk = np.linalg.cholesky(np.asarray(ker.kuu(theta, X, jitter=1e-8)))
        mu_opt = K @ np.linalg.solve(Ky, np.asarray(y))
        S_opt = K - K @ np.linalg.solve(Ky, K)
        m_white = np.linalg.solve(Lk, mu_opt)
        A_white = np.linalg.solve(Lk, np.linalg.cholesky(S_opt + 1e-12 * np.eye(N)))
        A_raw = np.tril(A_white, -1) + np.diag(np.log(np.expm1(np.diag(A_white))))
        params = SVGPParams(theta, jnp.asarray(m_white), jnp.asarray(A_raw),
                            jnp.log(jnp.asarray(noise)))
        mean, var = svgp_predict(ker, params, X, Xt)
        Kt = np.asarray(ker(theta, Xt, X))
        gp_mean = Kt @ np.linalg.solve(Ky, np.asarray(y))
        gp_var = 1.0 - np.sum(Kt * np.linalg.solve(Ky, Kt.T).T, axis=1)
        np.testing.assert_allclose(np.asarray(mean), gp_mean, atol=1e-4)
        np.testing.assert_allclose(np.asarray(var), gp_var, atol=1e-4)
