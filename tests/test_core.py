"""L0–L2 unit tests: linalg, kernels, distributions, quadrature.

Oracle strategy mirrors the reference test file GPtest.jl (SURVEY.md §4):
analytic/closed-form checks where available, Monte-Carlo oracles for the
cubature rules.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussianprocessnode_tpu.dists import (
    GammaShapeRate,
    Gaussian,
    MvGaussian,
    Wishart,
    WishartFast,
    gamma_entropy,
    gamma_mean,
    gamma_mean_log,
    gaussian_entropy,
    mv_gaussian_entropy,
    mv_meancov_to_nat,
    mv_nat_to_meancov,
    wishart_entropy,
    wishart_mean,
    wishart_mean_logdet,
)
from gaussianprocessnode_tpu.ops import kernels as kern
from gaussianprocessnode_tpu.ops import linalg as la
from gaussianprocessnode_tpu.ops import quadrature as quad

rng = np.random.default_rng(0)


def random_psd(n, scale=1.0, seed=None):
    r = rng if seed is None else np.random.default_rng(seed)
    A = r.standard_normal((n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n)) * scale


# ---------------------------------------------------------------------------
# linalg
# ---------------------------------------------------------------------------


class TestLinalg:
    def test_chol_solve_roundtrip(self):
        A = random_psd(7)
        B = jnp.asarray(rng.standard_normal((7, 3)))
        L = la.chol_lower(A)
        X = la.chol_solve(L, B)
        np.testing.assert_allclose(A @ X, B, atol=1e-9)

    def test_cholinv(self):
        A = random_psd(5)
        np.testing.assert_allclose(la.cholinv(A) @ A, np.eye(5), atol=1e-9)

    def test_logdet(self):
        A = random_psd(6)
        L = la.chol_lower(A)
        np.testing.assert_allclose(
            la.logdet_from_chol(L), np.linalg.slogdet(np.asarray(A))[1], rtol=1e-10
        )

    def test_tri_solves(self):
        A = random_psd(5)
        L = la.chol_lower(A)
        b = jnp.asarray(rng.standard_normal(5))
        np.testing.assert_allclose(L @ la.tri_solve_lower(L, b), b, atol=1e-10)
        np.testing.assert_allclose(L.T @ la.tri_solve_upper(L.T, b), b, atol=1e-10)

    def test_rv_chol(self):
        mu = jnp.asarray(rng.standard_normal(4))
        S = random_psd(4)
        U = la.rv_chol_upper(mu, S)
        np.testing.assert_allclose(U.T @ U, S + np.outer(mu, mu), atol=1e-9)

    def test_block_helpers(self):
        D, M = 3, 4
        Rv = random_psd(D * M)
        S = jnp.asarray(rng.standard_normal((M, M)))
        W = jnp.asarray(rng.standard_normal((D, D)))
        # naive block loops
        blocks = np.asarray(Rv).reshape(D, M, D, M)
        psi4 = np.array(
            [[np.sum(blocks[i, :, j, :] * np.asarray(S).T) for j in range(D)] for i in range(D)]
        )
        np.testing.assert_allclose(la.block_trace_products(Rv, S.T, D, M), psi4, atol=1e-10)
        acc = sum(
            np.asarray(W)[i, j] * blocks[i, :, j, :] for i in range(D) for j in range(D)
        )
        np.testing.assert_allclose(la.sum_blocks_weighted(Rv, W, D, M), acc, atol=1e-10)

    def test_trace_blocks(self):
        # trace_blkmatrix parity (reference: derivative_helper.jl:125-127):
        # out[i,j] = tr(block[i,j]) of a (DM,DM) matrix viewed as D×D blocks
        import gaussianprocessnode_tpu.ops.linalg as la

        D, M = 3, 4
        rng_ = np.random.default_rng(11)
        R = rng_.standard_normal((D * M, D * M))
        expected = np.empty((D, D))
        for i in range(D):
            for j in range(D):
                expected[i, j] = np.trace(R[i * M:(i + 1) * M, j * M:(j + 1) * M])
        np.testing.assert_allclose(
            la.trace_blocks(jnp.asarray(R), D, M), expected, atol=1e-12
        )

    def test_sum_diagonal_blocks(self):
        # reference: sum_diagonal_M(V, M) (derivative_helper.jl:119-122)
        D, M = 3, 5
        V = rng.standard_normal((D * M, D))
        expected = sum(V[M * i : M * (i + 1), i] for i in range(D))
        np.testing.assert_allclose(la.sum_diagonal_blocks(jnp.asarray(V), M), expected, atol=1e-12)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


class TestKernels:
    def test_se_matches_naive(self):
        X = rng.standard_normal((7, 3))
        Z = rng.standard_normal((5, 3))
        var, ls = 1.7, np.array([0.5, 1.2, 2.0])
        K = kern.se_gram(jnp.asarray(X), jnp.asarray(Z), var, jnp.asarray(ls))
        naive = np.array(
            [[var * np.exp(-0.5 * np.sum(((x - z) / ls) ** 2)) for z in Z] for x in X]
        )
        np.testing.assert_allclose(K, naive, atol=1e-10)

    @pytest.mark.parametrize("kind", ["matern12", "matern32", "matern52"])
    def test_materns_psd_and_diag(self, kind):
        X = jnp.asarray(rng.standard_normal((20, 2)))
        K = kern.gram(kind, X, X, 2.0, jnp.asarray([0.7, 1.3]))
        evals = np.linalg.eigvalsh(np.asarray(K))
        assert evals.min() > -1e-8
        np.testing.assert_allclose(np.diag(np.asarray(K)), 2.0, atol=1e-5)

    def test_kernel_softplus_transform(self):
        k = kern.Kernel("se", transform="softplus")
        theta = kern.invsoftplus(jnp.asarray([1.5, 0.8]))
        X = jnp.asarray(rng.standard_normal((4, 1)))
        K1 = k(theta, X, X)
        K2 = kern.se_gram(X, X, 1.5, jnp.asarray([0.8]))
        np.testing.assert_allclose(K1, K2, atol=1e-9)

    def test_invsoftplus_roundtrip(self):
        x = jnp.asarray([0.1, 1.0, 5.0, 30.0])
        np.testing.assert_allclose(kern.softplus(kern.invsoftplus(x)), x, rtol=1e-9)


# ---------------------------------------------------------------------------
# distributions
# ---------------------------------------------------------------------------


class TestDists:
    def test_gamma_moments(self):
        from scipy import special

        q = GammaShapeRate(jnp.asarray(2.5), jnp.asarray(1.7))
        np.testing.assert_allclose(gamma_mean(q), 2.5 / 1.7)
        np.testing.assert_allclose(gamma_mean_log(q), special.digamma(2.5) - np.log(1.7))

    def test_gamma_entropy_vs_scipy(self):
        from scipy import stats

        q = GammaShapeRate(jnp.asarray(3.0), jnp.asarray(0.5))
        np.testing.assert_allclose(
            gamma_entropy(q), stats.gamma(3.0, scale=2.0).entropy(), rtol=1e-6
        )

    def test_gaussian_entropy_vs_scipy(self):
        from scipy import stats

        np.testing.assert_allclose(
            gaussian_entropy(Gaussian(jnp.asarray(0.3), jnp.asarray(2.2))),
            stats.norm(0.3, np.sqrt(2.2)).entropy(),
            rtol=1e-12,
        )
        S = random_psd(4)
        np.testing.assert_allclose(
            mv_gaussian_entropy(MvGaussian(jnp.zeros(4), S)),
            stats.multivariate_normal(np.zeros(4), np.asarray(S)).entropy(),
            rtol=1e-10,
        )

    def test_nat_meancov_roundtrip(self):
        mu = jnp.asarray(rng.standard_normal(6))
        S = random_psd(6)
        q = MvGaussian(mu, S)
        q2 = mv_nat_to_meancov(mv_meancov_to_nat(q))
        np.testing.assert_allclose(q2.mean, mu, atol=1e-9)
        np.testing.assert_allclose(q2.cov, S, atol=1e-8)

    def test_wishart_moments_vs_scipy(self):
        from scipy import stats

        S = np.asarray(random_psd(3, 0.1))
        df = 7.0
        q = Wishart(jnp.asarray(df), jnp.asarray(S))
        np.testing.assert_allclose(wishart_mean(q), df * S, rtol=1e-10)
        samples = stats.wishart(int(df), S).rvs(50_000, random_state=1)
        mc_logdet = np.mean(np.linalg.slogdet(samples)[1])
        np.testing.assert_allclose(wishart_mean_logdet(q), mc_logdet, rtol=5e-3)
        np.testing.assert_allclose(
            wishart_entropy(q), stats.wishart(int(df), S).entropy(), rtol=1e-8
        )
        qf = WishartFast(jnp.asarray(df), jnp.asarray(np.linalg.inv(S)))
        np.testing.assert_allclose(wishart_mean(qf), df * S, rtol=1e-8)
        np.testing.assert_allclose(wishart_mean_logdet(qf), wishart_mean_logdet(q), rtol=1e-10)


# ---------------------------------------------------------------------------
# quadrature (MC oracles, mirroring GPtest.jl:127-143)
# ---------------------------------------------------------------------------


class TestQuadrature:
    def test_gh_polynomial_exact(self):
        # GH(21) integrates polynomials up to degree 41 exactly
        m, v = 0.7, 2.3
        pts, w = quad.gh_points_weights(21, m, v)
        np.testing.assert_allclose(jnp.sum(w), 1.0, rtol=1e-12)
        np.testing.assert_allclose(jnp.sum(w * pts), m, atol=1e-12)
        np.testing.assert_allclose(jnp.sum(w * (pts - m) ** 2), v, rtol=1e-12)
        np.testing.assert_allclose(jnp.sum(w * (pts - m) ** 4), 3 * v**2, rtol=1e-10)

    def test_gh_expectation_vs_mc(self):
        f = lambda x: jnp.exp(-0.5 * x**2) * jnp.sin(x) + x**2
        m, v = 0.3, 1.7
        val = quad.expect_uni(quad.GaussHermite(21), f, m, v)
        xs = rng.normal(m, np.sqrt(v), 2_000_000)
        mc = np.mean(np.exp(-0.5 * xs**2) * np.sin(xs) + xs**2)
        np.testing.assert_allclose(val, mc, atol=5e-3)

    def test_sr_cubature_moments(self):
        m = jnp.asarray([0.5, -1.0, 2.0])
        V = random_psd(3, 0.3, seed=14)
        pts, w = quad.sr_points_weights(m, V)
        assert pts.shape == (6, 3)
        np.testing.assert_allclose(jnp.sum(w), 1.0)
        np.testing.assert_allclose(pts.T @ w, m, atol=1e-12)
        diff = pts - m
        np.testing.assert_allclose(jnp.einsum("p,pi,pj->ij", w, diff, diff), V, atol=1e-10)

    def test_sr_expectation_vs_mc(self):
        m = jnp.asarray([0.2, -0.4])
        V = random_psd(2, 0.2, seed=11)
        f = lambda x: jnp.exp(-0.1 * jnp.sum(x**2))
        val = quad.expect_multi(quad.SphericalRadial(), f, m, V)
        xs = rng.multivariate_normal(np.asarray(m), np.asarray(V), 1_000_000)
        mc = np.mean(np.exp(-0.1 * np.sum(xs**2, axis=1)))
        np.testing.assert_allclose(val, mc, atol=2e-2)  # 3rd-degree rule

    def test_ut_matches_moments(self):
        m = jnp.asarray([1.0, 2.0])
        V = random_psd(2, 0.5, seed=15)
        pts, wm, wc = quad.ut_points_weights(m, V, alpha=1.0, beta=0.0, kappa=1.0)
        np.testing.assert_allclose(pts.T @ wm, m, atol=1e-10)
        diff = pts - m
        np.testing.assert_allclose(jnp.einsum("p,pi,pj->ij", wc, diff, diff), V, atol=1e-9)

    def test_genut_uni_gaussian_matches_first_four_moments(self):
        m, v = 0.5, 1.8
        pts, w = quad.genut_points_weights_uni(m, v)
        np.testing.assert_allclose(jnp.sum(w), 1.0, rtol=1e-12)
        np.testing.assert_allclose(jnp.sum(w * pts), m, atol=1e-12)
        np.testing.assert_allclose(jnp.sum(w * (pts - m) ** 2), v, rtol=1e-10)
        np.testing.assert_allclose(jnp.sum(w * (pts - m) ** 3), 0.0, atol=1e-10)
        np.testing.assert_allclose(jnp.sum(w * (pts - m) ** 4), 3 * v * v, rtol=1e-10)

    def test_genut_multi_gaussian_matches_moments(self):
        m = jnp.asarray([0.3, -0.7, 1.1])
        V = random_psd(3, 0.4, seed=16)
        pts, w = quad.genut_points_weights_multi(m, V)
        assert pts.shape == (7, 3)
        np.testing.assert_allclose(jnp.sum(w), 1.0, rtol=1e-10)
        np.testing.assert_allclose(pts.T @ w, m, atol=1e-10)
        diff = pts - m
        np.testing.assert_allclose(jnp.einsum("p,pi,pj->ij", w, diff, diff), V, atol=1e-9)

    def test_genut_skewed_moments(self):
        # skew/kurt matching with raw central moments of a Gamma(k=3, θ=2)
        k, th = 3.0, 2.0
        m = k * th
        v = k * th**2
        mu3 = 2 * k * th**3
        mu4 = 3 * k * (k + 2) * th**4
        pts, w = quad.genut_points_weights_uni(m, v, S=mu3, K=mu4)
        np.testing.assert_allclose(jnp.sum(w * pts), m, rtol=1e-10)
        np.testing.assert_allclose(jnp.sum(w * (pts - m) ** 2), v, rtol=1e-10)
        np.testing.assert_allclose(jnp.sum(w * (pts - m) ** 3), mu3, rtol=1e-9)
        np.testing.assert_allclose(jnp.sum(w * (pts - m) ** 4), mu4, rtol=1e-9)

    def test_genut_joint_expectation_mc_oracle(self):
        # tuple-of-marginals overload (reference: ut_approx.jl:28-38):
        # E[g(x, y)] for independent x ~ N (scalar), y ~ MvN(2) against a
        # 200k-sample Monte-Carlo oracle (quadratic g → GenUT is exact)
        mx, vx = 0.4, 0.6
        my = jnp.asarray([0.2, -0.5])
        Vy = random_psd(2, 0.3, seed=21)

        def g(x, y):
            return x * y[0] + x**2 - 0.5 * y[1] ** 2 + y @ y

        val = quad.genut_expectation_joint(g, (mx, vx), (my, Vy))
        rng = np.random.default_rng(5)
        xs = mx + np.sqrt(vx) * rng.standard_normal(200_000)
        ys = rng.multivariate_normal(np.asarray(my), np.asarray(Vy), 200_000)
        mc = np.mean(xs * ys[:, 0] + xs**2 - 0.5 * ys[:, 1] ** 2
                     + np.sum(ys * ys, axis=1))
        np.testing.assert_allclose(float(val), mc, rtol=2e-2)

    def test_genut_statistics_joint_mixed_variate(self):
        # mixed-variate unscented_statistics (reference: ut_approx.jl:93-112):
        # linear g through independent (scalar, 2-vector) marginals has exact
        # closed-form transformed mean/cov and cross-covariance
        mx, vx = -0.3, 0.8
        my = jnp.asarray([1.0, 0.5])
        Vy = random_psd(2, 0.25, seed=22)
        A = jnp.asarray([[1.0, 2.0, -1.0], [0.5, 0.0, 3.0]])
        b = jnp.asarray([0.1, -0.2])

        def g(x, y):
            z = jnp.concatenate([jnp.reshape(x, (1,)), y])
            return A @ z + b

        mt, Vt, St, Kt, Ct = quad.genut_statistics_joint(g, (mx, vx), (my, Vy))
        m_joint = jnp.concatenate([jnp.asarray([mx]), my])
        V_joint = jax.scipy.linalg.block_diag(jnp.asarray([[vx]]), Vy)
        np.testing.assert_allclose(np.asarray(mt), np.asarray(A @ m_joint + b), atol=1e-10)
        np.testing.assert_allclose(np.asarray(Vt), np.asarray(A @ V_joint @ A.T), atol=1e-9)
        np.testing.assert_allclose(np.asarray(Ct), np.asarray(V_joint @ A.T), atol=1e-9)

    def test_genut_joint_gaussian_default_matches_direct_path(self):
        # review-r3 regression: for a CORRELATED Gaussian marginal with no
        # explicit moments, the joint path must build the SAME sigma points
        # as genut_points_weights_multi's own K=None default (the old
        # 3·diag(V)² default overspread the later Cholesky axes by
        # 3·V_ii²/L_ii⁴ > 3 and was measurably worse vs an MC oracle)
        my = jnp.asarray([0.2, -0.5])
        Vy = jnp.asarray([[0.5, 0.3], [0.3, 0.4]])

        def g(y):
            return jnp.sin(y[0]) * y[1] + y @ y

        direct = quad.expect_multi(quad.GenUT(), g, my, Vy)
        joint = quad.genut_expectation_joint(lambda y: g(y), (my, Vy))
        np.testing.assert_allclose(float(joint), float(direct), rtol=1e-12)

    def test_moment_match_uni_conjugate(self):
        # product of two Gaussians has closed form
        m1, v1, m2, v2 = 0.5, 2.0, -0.3, 0.7
        logf = lambda x: -0.5 * (x - m2) ** 2 / v2
        m, v = quad.moment_match_uni(logf, m1, v1)
        prec = 1 / v1 + 1 / v2
        # GH(21) moment matching of a Gaussian product is accurate to ~1e-4
        # (the rule integrates against the LEFT factor, not the product)
        np.testing.assert_allclose(m, (m1 / v1 + m2 / v2) / prec, atol=5e-4)
        np.testing.assert_allclose(v, 1 / prec, atol=5e-4)

    def test_moment_match_uni_nan_fallback(self):
        logf = lambda x: jnp.where(x > -1e30, jnp.nan, 0.0)
        m, v = quad.moment_match_uni(logf, 1.5, 2.5)
        np.testing.assert_allclose(m, 1.5)
        np.testing.assert_allclose(v, 2.5)

    def test_moment_match_multi_conjugate(self):
        # SR cubature is a 4-point 3rd-degree rule: it is only accurate when
        # the product stays close to the left factor (the regime the GPSSM
        # sweeps operate in; the reference's srcubature product behaves the
        # same, hence its NaN fallback). Use a mild right-hand factor.
        m1 = jnp.asarray([0.5, -0.5])
        V1 = random_psd(2, 0.25, seed=12)
        m2 = jnp.asarray([0.7, -0.3])
        V2 = random_psd(2, 3.0, seed=13)
        P2 = jnp.linalg.inv(V2)
        logf = lambda x: -0.5 * (x - m2) @ P2 @ (x - m2)
        m, V = quad.moment_match_multi(logf, m1, V1)
        P1 = np.linalg.inv(V1)
        P = P1 + np.asarray(P2)
        S = np.linalg.inv(P)
        mu = S @ (P1 @ np.asarray(m1) + np.asarray(P2) @ np.asarray(m2))
        # SR cubature is a 3rd-degree rule: product-of-Gaussians is matched
        # approximately, not exactly (same as the reference's srcubature prod)
        np.testing.assert_allclose(m, mu, atol=0.05)
        np.testing.assert_allclose(V, S, atol=0.12)


class TestNewtonSchulz:
    def test_spd_inverse_cold(self):
        A = random_psd(60)
        X = la.spd_inverse_ns(A, iters=60)
        np.testing.assert_allclose(X @ A, np.eye(60), atol=1e-8)

    def test_spd_inverse_warm_and_guard(self):
        A = random_psd(40)
        X = la.spd_inverse_ns(A, iters=60)
        A2 = A + 0.01 * random_psd(40)
        X2 = la.spd_inverse_ns(A2, warm=X, iters=8)
        np.testing.assert_allclose(X2 @ A2, np.eye(40), atol=1e-8)
        # stale warm start must be rejected by the guard, not diverge
        X3 = la.spd_inverse_ns(A2, warm=1e6 * jnp.asarray(np.eye(40)), iters=60)
        np.testing.assert_allclose(X3 @ A2, np.eye(40), atol=1e-7)

    def test_spd_inverse_tol_early_exit_matches_full_budget(self):
        """The residual-tolerance while_loop path (spd_inverse_ns(tol=...))
        must deliver the same inverse as the fixed-length scan in the
        f64-convergent regime (κ ≲ 1e8; beyond that the iteration sits at
        the ε·κ rounding floor and wanders — which is exactly why the
        kin40k pipeline pairs the NS inverse with iterative refinement for
        solves, tested below). Kept for non-TPU backends — on this TPU the
        while_loop's per-iteration dispatch makes it a net loss
        (DEVIATIONS.md #6)."""
        for kappa in (1e2, 1e6):
            d = np.geomspace(1.0, kappa, 50)
            Q = np.linalg.qr(np.random.default_rng(7).standard_normal((50, 50)))[0]
            A = jnp.asarray(Q @ np.diag(d) @ Q.T)
            X_full = la.spd_inverse_ns(A, iters=80)
            X_tol = la.spd_inverse_ns(A, iters=80, tol=1e-9 * kappa)
            np.testing.assert_allclose(
                np.asarray(X_tol), np.asarray(X_full),
                atol=1e-10 * kappa, rtol=1e-5,
            )
            r = np.linalg.norm(np.eye(50) - np.asarray(A) @ np.asarray(X_tol))
            assert r < 1e-8 * kappa, (kappa, r)

    def test_scaled_spd_inverse_halves_cold_budget(self):
        """The optimally scaled iteration (rigorous lambda_min bound →
        enclosure-tracked γ = 2/(a+b)) must converge in ~half the cold
        budget: at κ=1e12, scaled-24 reaches the f64 floor (κ·ε₆₄ ~ 1e-4
        relative) where unscaled-24 has made no progress; and an over-claimed
        bound must still converge, just slower (never diverge)."""
        kappa = 1e12
        d = np.geomspace(1.0, kappa, 80)
        Q = np.linalg.qr(np.random.default_rng(11).standard_normal((80, 80)))[0]
        A = jnp.asarray(Q @ np.diag(d) @ Q.T)
        X_true = np.asarray(Q @ np.diag(1.0 / d) @ Q.T)
        scale = np.max(np.abs(X_true))

        X_sc = la.spd_inverse_ns(A, iters=24, lambda_min=1.0)
        err_sc = np.max(np.abs(np.asarray(X_sc) - X_true)) / scale
        assert err_sc < 1e-4, err_sc
        X_un = la.spd_inverse_ns(A, iters=24)
        err_un = np.max(np.abs(np.asarray(X_un) - X_true)) / scale
        assert err_un > 0.1, err_un  # unscaled is nowhere at this budget
        # over-claimed bound (λmin_true = 1, claim 1e3): monotone, no blow-up,
        # and a doubled budget still converges
        X_over = la.spd_inverse_ns(A, iters=60, lambda_min=1e3)
        err_over = np.max(np.abs(np.asarray(X_over) - X_true)) / scale
        assert np.isfinite(err_over) and err_over < 1e-4, err_over

    def test_scaled_spd_inverse_sentinel_matches_unscaled_bitwise(self):
        """lambda_min ≤ 0 (the spd_inverse None sentinel) must reproduce the
        classic iteration bit-for-bit — γ ≡ 1 multiplies by exact 1.0."""
        A = random_psd(40)
        X_plain = la.spd_inverse_ns(A, iters=20)
        X_sent = la.spd_inverse_ns(A, iters=20, lambda_min=-1.0)
        np.testing.assert_array_equal(np.asarray(X_plain), np.asarray(X_sent))

    def test_scaled_spd_inverse_gradient(self):
        """The analytic VJP holds for the scaled forward too (the fixed
        point, not the path, defines the derivative)."""
        A = random_psd(12)
        lam = la.gershgorin_lambda_min(A)

        def f(a):
            s = 0.5 * (a + a.T)
            return jnp.sum(jnp.sin(la.spd_inverse(s, iters=60, lambda_min=lam)))

        g = jax.grad(f)(A)
        g_ref = jax.grad(lambda a: jnp.sum(jnp.sin(jnp.linalg.inv(0.5 * (a + a.T)))))(A)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-7)

    def test_gershgorin_lambda_min(self):
        A = random_psd(30)
        lb = float(la.gershgorin_lambda_min(A))
        lmin = float(np.linalg.eigvalsh(np.asarray(A)).min())
        assert lb <= lmin + 1e-12
        D = jnp.asarray(np.diag([0.02, 3.0, 7.0]))
        assert float(la.gershgorin_lambda_min(D)) == 0.02  # exact on diagonal

    def test_ir_solve_reaches_f64_accuracy_with_crude_preconditioner(self):
        """ir_solve must recover the f64 solution even when the approximate
        inverse is only ~1e-2 accurate (the early-minibatch regime)."""
        A = random_psd(60, 5.0)
        x_true = jnp.asarray(np.random.default_rng(8).standard_normal(60))
        b = A @ x_true
        M_crude = la.spd_inverse_ns(A, iters=12)  # deliberately unconverged
        x = la.ir_solve(A, b, M_crude.astype(jnp.float64), rounds=8)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), rtol=1e-9)

    def test_ns_plus_ir_solves_at_kin40k_condition(self):
        """At κ=5e8 (the kin40k q(v)-precision scale: λmax ≈ w·λmax(KKᵀ)
        ~1e7, λmin = prior 0.02) the NS inverse converges only to residual
        ~0.1, but NS + iterative refinement still solves A x = b to ~1e-9
        relative — the pipeline the fast trainers rely on
        (infer/minibatch.py). Beyond κ~1e9 with a log-uniform spectrum the
        NS residual exceeds 1 and IR's safeguard freezes: that regime needs
        the guard + full-budget restarts the trainers use."""
        kappa = 5e8
        d = np.geomspace(1.0, kappa, 50)
        Q = np.linalg.qr(np.random.default_rng(9).standard_normal((50, 50)))[0]
        A = jnp.asarray(Q @ np.diag(d) @ Q.T)
        x_true = jnp.asarray(np.random.default_rng(10).standard_normal(50))
        b = A @ x_true
        M_ns = la.spd_inverse_ns(A, iters=60)
        x = la.ir_solve(A, b, M_ns, rounds=6)
        rel = float(jnp.linalg.norm(x - x_true) / jnp.linalg.norm(x_true))
        assert rel < 1e-7, rel

    def test_spd_inverse_vjp(self):
        A = random_psd(10)
        f_ns = lambda a: jnp.sum(jnp.sin(la.spd_inverse(0.5 * (a + a.T), iters=60)))
        f_ref = lambda a: jnp.sum(jnp.sin(jnp.linalg.inv(0.5 * (a + a.T))))
        g_ns = jax.grad(f_ns)(A)
        g_ref = jax.grad(f_ref)(A)
        np.testing.assert_allclose(g_ns, g_ref, atol=1e-7)


class TestPallasGram:
    def test_fallback_matches_reference(self):
        # on CPU se_gram_auto falls back to the jnp path; on TPU (bench env)
        # the Pallas kernel was verified bit-exact against XLA
        from gaussianprocessnode_tpu.ops.pallas_gram import se_gram_auto

        Z = jnp.asarray(rng.standard_normal((13, 3)), jnp.float32)
        X = jnp.asarray(rng.standard_normal((29, 3)), jnp.float32)
        ls = jnp.asarray([0.7, 1.1, 1.4], jnp.float32)
        np.testing.assert_allclose(
            se_gram_auto(Z, X, 1.3, ls), kern.se_gram(Z, X, 1.3, ls), atol=1e-6
        )

    def test_fused_gram_analytic_vjp_matches_autodiff(self):
        """se_gram_fused's hand-derived VJP (σ̄², ℓ̄, Z̄, X̄) must equal
        jax.grad through the jnp sqdist graph — this is what lets the
        Pallas forward live inside the differentiated hyperparameter
        objectives (ops/pallas_gram.py)."""
        from gaussianprocessnode_tpu.ops.pallas_gram import se_gram_fused

        Z = jnp.asarray(rng.standard_normal((7, 3)))
        X = jnp.asarray(rng.standard_normal((11, 3)))
        ls = jnp.asarray([0.7, 1.1, 1.4])
        var = jnp.asarray(1.3)
        G = jnp.asarray(rng.standard_normal((7, 11)))  # cotangent

        def loss_fused(Z, X, v, l):
            return jnp.sum(G * se_gram_fused(Z, X, v, l))

        def loss_ref(Z, X, v, l):
            return jnp.sum(G * kern.se_gram(Z, X, v, l))

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(Z, X, var, ls)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(Z, X, var, ls)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9)

    def test_fused_gram_scalar_lengthscale_vjp(self):
        from gaussianprocessnode_tpu.ops.pallas_gram import se_gram_fused

        Z = jnp.asarray(rng.standard_normal((5, 2)))
        X = jnp.asarray(rng.standard_normal((6, 2)))

        def f(l):
            return jnp.sum(se_gram_fused(Z, X, jnp.asarray(2.0), l) ** 2)

        def f_ref(l):
            return jnp.sum(kern.se_gram(Z, X, jnp.asarray(2.0), l) ** 2)

        l0 = jnp.asarray(0.9)
        np.testing.assert_allclose(
            float(jax.grad(f)(l0)), float(jax.grad(f_ref)(l0)), rtol=1e-9
        )


class TestSpdClamp:
    """ops/linalg.spd_clamp — the PIT engine's smoothed-covariance guard
    (advisor r4 #3: a diagonal lift cannot repair a meaningfully indefinite
    matrix; the clamp must)."""

    def test_d2_closed_form_matches_eigh(self):
        from gaussianprocessnode_tpu.ops.linalg import spd_clamp

        r = np.random.default_rng(3)
        S = r.standard_normal((50, 2, 2))
        S = 0.5 * (S + np.swapaxes(S, -1, -2))
        floor = 1e-3
        got = np.asarray(spd_clamp(jnp.asarray(S), floor))
        for i in range(len(S)):
            w, V = np.linalg.eigh(S[i])
            ref = (V * np.maximum(w, floor)) @ V.T
            np.testing.assert_allclose(got[i], ref, atol=1e-12)
        # every result PD at the floor
        assert np.linalg.eigvalsh(got).min() >= floor * (1 - 1e-9)

    def test_pd_input_is_unchanged(self):
        from gaussianprocessnode_tpu.ops.linalg import spd_clamp

        r = np.random.default_rng(4)
        Q = r.standard_normal((2, 2))
        S = Q @ Q.T + np.eye(2)
        np.testing.assert_allclose(
            np.asarray(spd_clamp(jnp.asarray(S), 1e-9)), S, rtol=1e-12)

    def test_strongly_indefinite_is_repaired(self):
        from gaussianprocessnode_tpu.ops.linalg import spd_clamp

        S = jnp.asarray([[1.0, 2.0], [2.0, 1.0]])  # eigs (3, -1)
        out = np.asarray(spd_clamp(S, 1e-6))
        w = np.linalg.eigvalsh(out)
        assert w.min() >= 1e-6 * (1 - 1e-9) and abs(w.max() - 3.0) < 1e-9

    def test_d3_eigh_path(self):
        from gaussianprocessnode_tpu.ops.linalg import spd_clamp

        r = np.random.default_rng(5)
        S = r.standard_normal((3, 3))
        S = 0.5 * (S + S.T)
        out = np.asarray(spd_clamp(jnp.asarray(S), 1e-4))
        w_in, V = np.linalg.eigh(S)
        ref = (V * np.maximum(w_in, 1e-4)) @ V.T
        np.testing.assert_allclose(out, ref, atol=1e-12)
