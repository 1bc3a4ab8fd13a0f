"""Property-based tests (hypothesis) for the numerical core.

Complements the example-based oracles: these assert structural identities
(PSD-ness, round-trips, quadrature exactness, entropy formulas) over
randomly drawn inputs instead of fixed fixtures.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from gaussianprocessnode_tpu.dists import (
    GammaShapeRate,
    MvGaussian,
    MvGaussianNat,
    gamma_entropy,
    gamma_mean,
    gamma_mean_log,
    mv_meancov_to_nat,
    mv_nat_to_meancov,
)
from gaussianprocessnode_tpu.ops import linalg as la
from gaussianprocessnode_tpu.ops.kernels import gram
from gaussianprocessnode_tpu.ops.quadrature import gh_nodes

COMMON = dict(max_examples=25, deadline=None)

finite_f = st.floats(min_value=-3.0, max_value=3.0, allow_nan=False)


def _rng(seed):
    return np.random.default_rng(seed)


class TestGammaProperties:
    @given(a=st.floats(0.2, 50.0), b=st.floats(0.05, 50.0))
    @settings(**COMMON)
    def test_moments_and_entropy_match_scipy(self, a, b):
        from scipy.stats import gamma as sp_gamma

        q = GammaShapeRate(jnp.asarray(a), jnp.asarray(b))
        d = sp_gamma(a, scale=1.0 / b)
        np.testing.assert_allclose(float(gamma_mean(q)), d.mean(), rtol=1e-9)
        np.testing.assert_allclose(
            float(gamma_mean_log(q)), d.expect(np.log), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            float(gamma_entropy(q)), d.entropy(), rtol=1e-8, atol=1e-10
        )


class TestMvGaussianRoundTrip:
    @given(seed=st.integers(0, 10_000), n=st.integers(1, 8))
    @settings(**COMMON)
    def test_nat_meancov_roundtrip(self, seed, n):
        r = _rng(seed)
        A = r.standard_normal((n, n))
        cov = A @ A.T + n * np.eye(n)
        mean = r.standard_normal(n)
        q = MvGaussian(jnp.asarray(mean), jnp.asarray(cov))
        back = mv_nat_to_meancov(mv_meancov_to_nat(q))
        np.testing.assert_allclose(np.asarray(back.mean), mean, rtol=1e-8,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(back.cov), cov, rtol=1e-7,
                                   atol=1e-9)


class TestKernelProperties:
    @given(seed=st.integers(0, 10_000),
           kind=st.sampled_from(["se", "matern12", "matern32", "matern52"]),
           var=st.floats(0.1, 5.0), ls=st.floats(0.3, 3.0))
    @settings(**COMMON)
    def test_gram_is_symmetric_psd_with_variance_diag(self, seed, kind, var, ls):
        r = _rng(seed)
        X = jnp.asarray(r.standard_normal((12, 3)))
        K = np.asarray(gram(kind, X, X, var, jnp.asarray(ls)))
        np.testing.assert_allclose(K, K.T, atol=1e-12)
        # diag via the MXU-friendly |x|²+|z|²−2xz sqdist carries O(√ε)
        # roundoff at d=0 for the |d|-kernels (documented; kernel.diag()
        # returns the exact σ² and is what the rules use)
        np.testing.assert_allclose(np.diag(K), var, rtol=1e-6)
        ev = np.linalg.eigvalsh(0.5 * (K + K.T))
        assert ev.min() > -1e-8 * max(1.0, ev.max())

    @given(seed=st.integers(0, 10_000))
    @settings(**COMMON)
    def test_gram_cross_consistency(self, seed):
        # K(X, Z)ᵀ == K(Z, X)
        r = _rng(seed)
        X = jnp.asarray(r.standard_normal((7, 2)))
        Z = jnp.asarray(r.standard_normal((5, 2)))
        ls = jnp.asarray([0.8, 1.2])
        Kxz = np.asarray(gram("se", X, Z, 1.3, ls))
        Kzx = np.asarray(gram("se", Z, X, 1.3, ls))
        np.testing.assert_allclose(Kxz, Kzx.T, rtol=1e-10)


class TestQuadratureExactness:
    @given(degree=st.integers(0, 9), mu=finite_f, sd=st.floats(0.2, 2.0))
    @settings(**COMMON)
    def test_gh_integrates_polynomials_exactly(self, degree, mu, sd):
        """n-point Gauss–Hermite is exact for polynomials up to degree
        2n−1; with n=21 every moment here is exact (same rule as the
        reference's ghcubature(21))."""
        z, w = gh_nodes(21)
        pts = mu + sd * np.asarray(z)
        est = float(np.asarray(w) @ pts**degree)
        # analytic Gaussian raw moment via the binomial expansion over
        # standard-normal moments (scipy's .moment returns NaN for some
        # loc/order combinations)
        from math import comb

        def std_moment(j):
            if j % 2:
                return 0.0
            out = 1.0
            for i in range(1, j, 2):
                out *= i
            return out

        exact = sum(
            comb(degree, j) * mu ** (degree - j) * sd**j * std_moment(j)
            for j in range(degree + 1)
        )
        np.testing.assert_allclose(est, exact, rtol=1e-8,
                                   atol=1e-8 * max(1.0, abs(mu)) ** degree)


class TestLinalgProperties:
    @given(seed=st.integers(0, 10_000), n=st.integers(2, 20),
           logk=st.floats(0.0, 5.0))
    @settings(**COMMON)
    def test_ns_inverse_for_bounded_condition(self, seed, n, logk):
        r = _rng(seed)
        d = np.geomspace(1.0, 10.0**logk, n)
        Q = np.linalg.qr(r.standard_normal((n, n)))[0]
        A = jnp.asarray(Q @ np.diag(d) @ Q.T)
        X = la.spd_inverse_ns(A, iters=60)
        resid = np.linalg.norm(np.eye(n) - np.asarray(A) @ np.asarray(X))
        assert resid < 1e-7 * 10.0**logk + 1e-9, resid

    @given(seed=st.integers(0, 10_000), n=st.integers(2, 15))
    @settings(**COMMON)
    def test_chol_solve_identity(self, seed, n):
        r = _rng(seed)
        A = r.standard_normal((n, n))
        S = jnp.asarray(A @ A.T + n * np.eye(n))
        b = jnp.asarray(r.standard_normal(n))
        L = la.chol_lower(S)
        x = la.chol_solve(L, b)
        np.testing.assert_allclose(np.asarray(S @ x), np.asarray(b),
                                   rtol=1e-8, atol=1e-9)
