"""L3 tests: Ψ-statistics and UniSGP message rules / energies.

Transliteration of the reference test suite GPtest.jl:114-350 — every rule
checked against an independent analytic ground truth, cubature checked
against Monte-Carlo (SURVEY.md §4 oracle levels 1 & 2).

Fixtures mirror GPtest.jl:17-31: a 10-point 1-D inducing grid, SE kernel
k = θ₀·SE(ℓ=θ₁) with θ = [1, 1].
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussianprocessnode_tpu.dists import Gaussian, gamma_mean, gamma_mean_log, GammaShapeRate
from gaussianprocessnode_tpu.nodes import unisgp
from gaussianprocessnode_tpu.nodes.unisgp import UniSGPArgs
from gaussianprocessnode_tpu.ops import psi as psiops
from gaussianprocessnode_tpu.ops import quadrature as quad
from gaussianprocessnode_tpu.ops.kernels import Kernel
from gaussianprocessnode_tpu.ops.linalg import chol_lower, chol_upper, cholinv

rng = np.random.default_rng(42)

KER = Kernel("se", transform="identity")
THETA = jnp.asarray([1.0, 1.0])
M = 10
XU = jnp.arange(1.0, M + 1.0)[:, None]  # GPtest.jl:19
GH = quad.GaussHermite(21)

# marginals (GPtest.jl:115-119)
Q_OUT = Gaussian(jnp.asarray(1.0), jnp.asarray(4.0))  # Normal(1, 2) => var 4
Q_X = Gaussian(jnp.asarray(0.0), jnp.asarray(1.0))
Q_W = GammaShapeRate(jnp.asarray(1.0), jnp.asarray(1.0))
MU_V = jnp.sin(jnp.asarray(rng.random(M)))
SIGMA_V = jnp.eye(M)
RV = jnp.outer(MU_V, MU_V) + SIGMA_V

KUU = KER.kuu(THETA, XU)
KUU_INV = cholinv(KUU)
ARGS = UniSGPArgs(theta=THETA, Xu=XU, KuuL=chol_lower(KUU, jitter=1e-8), Uv=chol_upper(RV))


def k_naive(a, b):
    a, b = np.atleast_1d(a), np.atleast_1d(b)
    return np.exp(-0.5 * (a[:, None] - b[None, :]) ** 2)


def mc_psis(n=400_000, seed=3):
    r = np.random.default_rng(seed)
    xs = r.normal(float(Q_X.mean), np.sqrt(float(Q_X.var)), n)
    Kxu = k_naive(xs, np.asarray(XU)[:, 0])  # (n, M)
    psi0 = 1.0
    psi1 = Kxu.mean(axis=0)
    psi2 = (Kxu[:, :, None] * Kxu[:, None, :]).mean(axis=0)
    return psi0, psi1, psi2


class TestPsi:
    def test_exact_psi1(self):
        p1 = psiops.psi1_exact(KER, THETA, XU, jnp.asarray([1.0]))
        np.testing.assert_allclose(p1, k_naive(np.asarray(XU)[:, 0], 1.0)[:, 0], atol=1e-12)

    def test_expected_vs_mc(self):
        # mirrors GPtest.jl:127-143 (atol 1e-4 / 0.05)
        psi0_gt, psi1_gt, psi2_gt = mc_psis()
        psi0, psi1, psi2 = psiops.psi_expected_uni(
            KER, THETA, XU, GH, Q_X.mean, Q_X.var
        )
        np.testing.assert_allclose(psi0, psi0_gt, atol=1e-6)
        np.testing.assert_allclose(psi1, psi1_gt, atol=0.01)
        np.testing.assert_allclose(psi2, psi2_gt, atol=0.01)

    def test_batch_expected_consistent_with_single(self):
        ms = jnp.asarray([0.0, 0.5, -1.0])
        vs = jnp.asarray([1.0, 2.0, 0.5])
        psi0b, psi1b, Kp, w = psiops.psi_batch_expected_uni(KER, THETA, XU, GH, ms, vs)
        psi2b = psiops.per_datum_psi2(Kp, w)
        for i in range(3):
            p0, p1, p2 = psiops.psi_expected_uni(KER, THETA, XU, GH, ms[i], vs[i])
            np.testing.assert_allclose(psi0b[i], p0, atol=1e-12)
            np.testing.assert_allclose(psi1b[:, i], p1, atol=1e-12)
            np.testing.assert_allclose(psi2b[i], p2, atol=1e-12)

    def test_sum_weighted_psi2(self):
        ms = jnp.asarray([0.0, 0.5])
        vs = jnp.asarray([1.0, 2.0])
        c = jnp.asarray([2.0, 3.0])
        _, _, Kp, w = psiops.psi_batch_expected_uni(KER, THETA, XU, GH, ms, vs)
        total = psiops.sum_weighted_psi2(Kp, w, c)
        per = psiops.per_datum_psi2(Kp, w)
        np.testing.assert_allclose(total, jnp.einsum("n,nmq->mq", c, per), atol=1e-11)


PSI0_A, PSI1_A, PSI2_A = psiops.psi_expected_uni(KER, THETA, XU, GH, Q_X.mean, Q_X.var)


class TestOutRule:
    def test_uncertain(self):
        # GPtest.jl:156-161
        nu = unisgp.out_message_uncertain(KER, GH, ARGS, Q_X, MU_V, gamma_mean(Q_W))
        np.testing.assert_allclose(nu.mean, PSI1_A @ MU_V, atol=1e-7)
        np.testing.assert_allclose(nu.var, 1.0 / gamma_mean(Q_W))

    def test_exact(self):
        # GPtest.jl:163-169
        nu = unisgp.out_message_exact(KER, ARGS, jnp.asarray(1.0), MU_V, gamma_mean(Q_W))
        psi1 = k_naive(1.0, np.asarray(XU)[:, 0])[0]
        np.testing.assert_allclose(nu.mean, psi1 @ np.asarray(MU_V), atol=1e-12)


class TestInRule:
    def test_logpdf_vs_ground_truth(self):
        # GPtest.jl:173-180: gt = -½w̄(A(x) + B RV Bᵀ − 2 μ_y B μ_v)
        w = float(gamma_mean(Q_W))
        logpdf = unisgp.in_log_message(KER, ARGS, Q_OUT, MU_V, w)
        Kinv = np.asarray(cholinv(KER.kuu(THETA, XU, jitter=1e-8)))
        for x in [1.0, np.sqrt(2.0), 4.2]:
            B = k_naive(x, np.asarray(XU)[:, 0])[0]
            A = 1.0 - B @ Kinv @ B
            gt = -0.5 * w * (A + B @ np.asarray(RV) @ B - 2 * float(Q_OUT.mean) * B @ np.asarray(MU_V))
            np.testing.assert_allclose(logpdf(jnp.asarray(x)), gt, atol=1e-8)

    def test_marginal_in_close_to_mode(self):
        # fused product returns a proper Gaussian near the backward mode
        q_fwd = Gaussian(jnp.asarray(2.0), jnp.asarray(1.0))
        q = unisgp.marginal_in(KER, ARGS, Q_OUT, MU_V, gamma_mean(Q_W), q_fwd)
        assert np.isfinite(q.mean) and q.var > 0


class TestVRule:
    def test_uncertain(self):
        # GPtest.jl:184-192: mean = (Ψ2+1e-8 I)⁻¹ Ψ1 μ_y ; cov = (w(Ψ2+1e-8 I))⁻¹
        nu = unisgp.v_message_uncertain(KER, GH, ARGS, Q_OUT.mean, Q_X, gamma_mean(Q_W))
        P2j = np.asarray(PSI2_A) + 1e-8 * np.eye(M)
        gt_mean = np.linalg.solve(P2j, np.asarray(PSI1_A)) * float(Q_OUT.mean)
        gt_cov = np.linalg.inv(float(gamma_mean(Q_W)) * P2j)
        mean = np.linalg.solve(np.asarray(nu.prec), np.asarray(nu.xi))
        np.testing.assert_allclose(mean, gt_mean, atol=1e-8)
        np.testing.assert_allclose(np.linalg.inv(np.asarray(nu.prec)), gt_cov, atol=1e-8)

    def test_exact(self):
        # GPtest.jl:194-216 (regression & classification fast paths)
        w = float(gamma_mean(Q_W))
        nu = unisgp.v_message_exact(KER, ARGS, jnp.asarray(1.0), jnp.asarray(2.0), w)
        psi1 = k_naive(1.0, np.asarray(XU)[:, 0])[0]
        np.testing.assert_allclose(np.asarray(nu.xi), w * 2.0 * psi1, atol=1e-12)
        np.testing.assert_allclose(np.asarray(nu.prec), w * np.outer(psi1, psi1), atol=1e-12)

    def test_batch_exact_equals_sum(self):
        X = jnp.asarray(rng.standard_normal((5, 1)))
        y = jnp.asarray(rng.standard_normal(5))
        w = 2.5
        _, Kux = psiops.psi_batch_exact(KER, THETA, XU, X)
        batch = unisgp.v_message_batch_exact(Kux, y, w)
        xi = np.zeros(M)
        prec = np.zeros((M, M))
        for i in range(5):
            nu = unisgp.v_message_exact(KER, ARGS, X[i], y[i], w)
            xi += np.asarray(nu.xi)
            prec += np.asarray(nu.prec)
        np.testing.assert_allclose(batch.xi, xi, atol=1e-10)
        np.testing.assert_allclose(batch.prec, prec, atol=1e-10)


class TestWRule:
    def test_uncertain(self):
        # GPtest.jl:221-229
        nu = unisgp.w_message_uncertain(
            KER, GH, ARGS, Q_OUT.mean, Q_OUT.var, Q_X, MU_V
        )
        P2j = np.asarray(PSI2_A) + 1e-8 * np.eye(M)
        I1 = float(PSI0_A) - np.trace(np.asarray(KUU_INV) @ P2j)
        I2 = (
            float(Q_OUT.mean) ** 2
            + float(Q_OUT.var)
            - 2 * float(Q_OUT.mean) * np.asarray(PSI1_A) @ np.asarray(MU_V)
            + np.trace(np.asarray(RV) @ P2j)
        )
        assert float(nu.shape) == 1.5
        np.testing.assert_allclose(nu.rate, 0.5 * (I1 + I2), atol=1e-5)

    def test_exact(self):
        # GPtest.jl:231-253
        x, mu_y, v_y = 1.0, 2.0, 0.0
        nu = unisgp.w_message_exact(KER, ARGS, jnp.asarray(x), mu_y, v_y, MU_V)
        psi1 = k_naive(x, np.asarray(XU)[:, 0])[0]
        psi2 = np.outer(psi1, psi1)
        I1 = 1.0 - psi1 @ np.asarray(cholinv(KER.kuu(THETA, XU, jitter=1e-8))) @ psi1
        I2 = mu_y**2 - 2 * mu_y * psi1 @ np.asarray(MU_V) + np.trace(np.asarray(RV) @ psi2)
        np.testing.assert_allclose(nu.rate, 0.5 * (I1 + I2), atol=1e-5)

    def test_batch_matches_per_datum(self):
        X = jnp.asarray(rng.standard_normal((6, 1)))
        y = jnp.asarray(rng.standard_normal(6))
        kxx, Kux = psiops.psi_batch_exact(KER, THETA, XU, X)
        dshape, rates = unisgp.w_message_batch_exact(KER, ARGS, kxx, Kux, y, 0.0, MU_V)
        total = 0.0
        for i in range(6):
            nu = unisgp.w_message_exact(KER, ARGS, X[i], y[i], 0.0, MU_V)
            total += float(nu.rate)
        np.testing.assert_allclose(rates, total, atol=1e-9)
        assert dshape == 3.0


class TestThetaRule:
    def test_exact_logpdf(self):
        # GPtest.jl:281-290
        w = float(gamma_mean(Q_W))
        logpdf = unisgp.theta_log_message_exact(
            KER, XU, jnp.asarray(1.0), 2.0, MU_V, RV, w
        )
        for th in [[1.0, 2.0], [0.5, 1.4]]:
            th = np.asarray(th)
            Kxu = th[0] * np.exp(-0.5 * (np.asarray(XU)[:, 0] - 1.0) ** 2 / th[1] ** 2)
            Kuu = th[0] * np.exp(
                -0.5 * (np.asarray(XU)[:, 0, None] - np.asarray(XU)[None, :, 0]) ** 2 / th[1] ** 2
            )
            # oracle jitters Kuu like the rule (the reference's own +1e-8·I)
            Kinv = np.linalg.inv(Kuu + 1e-8 * np.eye(Kuu.shape[0]))
            psi0 = th[0]
            psi2 = np.outer(Kxu, Kxu)
            gt = w * 2.0 * Kxu @ np.asarray(MU_V) - 0.5 * w * (
                psi0 + np.trace(psi2 @ (np.asarray(RV) - Kinv))
            )
            np.testing.assert_allclose(logpdf(jnp.asarray(th)), gt, atol=1e-8)

    def test_uncertain_logpdf(self):
        # GPtest.jl:259-268
        w = float(gamma_mean(Q_W))
        logpdf = unisgp.theta_log_message_uncertain(
            KER, GH, XU, Q_X, float(Q_OUT.mean), MU_V, RV, w
        )
        for th in [[1.0, 2.0], [0.5, 1.4]]:
            thj = jnp.asarray(th)
            p0, p1, p2 = psiops.psi_expected_uni(KER, thj, XU, GH, Q_X.mean, Q_X.var)
            # oracle jitters Kuu like the rule (the reference's own +1e-8·I)
            Kinv = np.asarray(cholinv(KER.kuu(thj, XU), jitter=1e-8))
            gt = w * float(Q_OUT.mean) * np.asarray(p1) @ np.asarray(MU_V) - 0.5 * w * (
                float(p0) + np.trace(np.asarray(p2) @ (np.asarray(RV) - Kinv))
            )
            np.testing.assert_allclose(logpdf(thj), gt, atol=1e-7)


class TestAverageEnergy:
    E_LOGW = float(gamma_mean_log(Q_W))
    W_MEAN = float(gamma_mean(Q_W))

    def test_exact_pm_out(self):
        # GPtest.jl:295-308 (q_out=PM(2), q_in=PM(1), q_w Gamma)
        x, mu_y = 1.0, 2.0
        U = unisgp.average_energy_exact(
            KER, ARGS, jnp.asarray(x), mu_y, 0.0, MU_V, self.W_MEAN, self.E_LOGW
        )
        psi1 = k_naive(x, np.asarray(XU)[:, 0])[0]
        psi2 = np.outer(psi1, psi1)
        I1 = 1.0 - np.trace(np.asarray(KUU_INV) @ psi2)
        I2 = mu_y**2 - 2 * mu_y * psi1 @ np.asarray(MU_V) + np.trace(np.asarray(RV) @ psi2)
        gt = 0.5 * np.log(2 * np.pi) - 0.5 * self.E_LOGW + 0.5 * self.W_MEAN * (I1 + I2)
        np.testing.assert_allclose(U, gt, atol=1e-5)

    def test_exact_normal_out(self):
        # GPtest.jl:310-323
        U = unisgp.average_energy_exact(
            KER, ARGS, jnp.asarray(1.0), float(Q_OUT.mean), float(Q_OUT.var), MU_V,
            self.W_MEAN, self.E_LOGW,
        )
        psi1 = k_naive(1.0, np.asarray(XU)[:, 0])[0]
        psi2 = np.outer(psi1, psi1)
        I1 = 1.0 - np.trace(np.asarray(KUU_INV) @ psi2)
        I2 = (
            float(Q_OUT.mean) ** 2
            + float(Q_OUT.var)
            - 2 * float(Q_OUT.mean) * psi1 @ np.asarray(MU_V)
            + np.trace(np.asarray(RV) @ psi2)
        )
        gt = 0.5 * np.log(2 * np.pi) - 0.5 * self.E_LOGW + 0.5 * self.W_MEAN * (I1 + I2)
        np.testing.assert_allclose(U, gt, atol=1e-5)

    def test_uncertain(self):
        # GPtest.jl:325-335
        U = unisgp.average_energy_uncertain(
            KER, GH, ARGS, float(Q_OUT.mean), float(Q_OUT.var), Q_X, MU_V,
            self.W_MEAN, self.E_LOGW,
        )
        P2j = np.asarray(PSI2_A) + 1e-8 * np.eye(M)
        I1 = float(PSI0_A) - np.trace(np.asarray(KUU_INV) @ P2j)
        I2 = (
            float(Q_OUT.mean) ** 2
            + float(Q_OUT.var)
            - 2 * float(Q_OUT.mean) * np.asarray(PSI1_A) @ np.asarray(MU_V)
            + np.trace(np.asarray(RV) @ P2j)
        )
        gt = 0.5 * np.log(2 * np.pi) - 0.5 * self.E_LOGW + 0.5 * self.W_MEAN * (I1 + I2)
        np.testing.assert_allclose(U, gt, atol=1e-5)

    def test_pointmass_w(self):
        # GPtest.jl:337-348: q_w = PointMass(5) => E_logw = log 5
        w = 5.0
        U = unisgp.average_energy_uncertain(
            KER, GH, ARGS, float(Q_OUT.mean), float(Q_OUT.var), Q_X, MU_V, w, np.log(w)
        )
        P2j = np.asarray(PSI2_A) + 1e-8 * np.eye(M)
        I1 = float(PSI0_A) - np.trace(np.asarray(KUU_INV) @ P2j)
        I2 = (
            float(Q_OUT.mean) ** 2
            + float(Q_OUT.var)
            - 2 * float(Q_OUT.mean) * np.asarray(PSI1_A) @ np.asarray(MU_V)
            + np.trace(np.asarray(RV) @ P2j)
        )
        gt = 0.5 * np.log(2 * np.pi) - 0.5 * np.log(w) + 0.5 * w * (I1 + I2)
        np.testing.assert_allclose(U, gt, atol=1e-6)

    def test_batch_matches_per_datum(self):
        X = jnp.asarray(rng.standard_normal((4, 1)))
        y = jnp.asarray(rng.standard_normal(4))
        kxx, Kux = psiops.psi_batch_exact(KER, THETA, XU, X)
        total = unisgp.average_energy_exact_batch(
            KER, ARGS, kxx, Kux, y, 0.0, MU_V, self.W_MEAN, self.E_LOGW
        )
        per = sum(
            float(
                unisgp.average_energy_exact(
                    KER, ARGS, X[i], y[i], 0.0, MU_V, self.W_MEAN, self.E_LOGW
                )
            )
            for i in range(4)
        )
        np.testing.assert_allclose(total, per, atol=1e-9)


class TestGramObjective:
    def test_gram_form_equals_uv_form(self):
        from gaussianprocessnode_tpu.objectives import (
            neg_log_backwardmess_fast,
            neg_log_backwardmess_gram,
        )

        X = jnp.asarray(rng.standard_normal((12, 1)))
        y = jnp.asarray(rng.standard_normal(12))
        w = 3.0
        Uv = chol_upper(RV)
        ref = neg_log_backwardmess_fast(
            THETA, kernel=KER, Xu=XU, X=X, y=y, mu_v=MU_V, Uv=Uv, w=w
        )
        val, kinv = neg_log_backwardmess_gram(
            THETA, kernel=KER, Xu=XU, X=X, y=y, mu_v=MU_V, Rv=RV, w=w, ns_iters=60
        )
        np.testing.assert_allclose(val, ref, rtol=1e-9)
        # gradients agree too
        g_ref = jax.grad(
            lambda t: neg_log_backwardmess_fast(
                t, kernel=KER, Xu=XU, X=X, y=y, mu_v=MU_V, Uv=Uv, w=w
            )
        )(THETA)
        g_new = jax.grad(
            lambda t: neg_log_backwardmess_gram(
                t, kernel=KER, Xu=XU, X=X, y=y, mu_v=MU_V, Rv=RV, w=w, ns_iters=60
            )[0]
        )(THETA)
        np.testing.assert_allclose(g_new, g_ref, rtol=1e-7)


class TestMultiObjectiveOracle:
    def test_multi_objective_equals_theta_rule_sum(self):
        from gaussianprocessnode_tpu.dists import MvGaussian
        from gaussianprocessnode_tpu.nodes import multisgp
        from gaussianprocessnode_tpu.objectives import neg_log_backwardmess_multi
        from gaussianprocessnode_tpu.ops.linalg import sum_blocks_weighted
        from gaussianprocessnode_tpu.ops.quadrature import SphericalRadial

        r = np.random.default_rng(3)
        M2, D, Din, N = 7, 2, 2, 5
        Xu2 = jnp.asarray(r.standard_normal((M2, Din)))
        mu_v = jnp.asarray(r.standard_normal(M2 * D))
        Sv = r.standard_normal((M2 * D, M2 * D))
        Rv = jnp.asarray(Sv @ Sv.T + M2 * D * np.eye(M2 * D)) + jnp.outer(mu_v, mu_v)
        W = jnp.asarray(np.diag([3.0, 2.0]) + 0.5)
        y = jnp.asarray(r.standard_normal((N, D)))
        qm = jnp.asarray(r.standard_normal((N, Din)))
        qc = jnp.tile(0.4 * jnp.eye(Din), (N, 1, 1))
        sr = SphericalRadial()
        sumRv_W = sum_blocks_weighted(Rv, W, D, M2)
        theta = jnp.asarray([1.2, 0.9])
        val = neg_log_backwardmess_multi(
            theta, kernel=KER, Xu=Xu2, y_means=y, qx_means=qm, qx_covs=qc,
            sumRv_W=sumRv_W, mu_v=mu_v, W=W, method=sr,
        )
        tot = sum(
            float(
                multisgp.theta_log_message(
                    KER, sr, Xu2, MvGaussian(qm[i], qc[i]), y[i], mu_v, Rv, W,
                    psi2_jitter=0.0,
                )(theta)
            )
            for i in range(N)
        )
        np.testing.assert_allclose(float(val), -tot, atol=1e-8)


class TestThetaRuleRobustness:
    def test_extreme_lengthscale_stays_finite(self):
        """Review-r3 regression: an L-BFGS linesearch excursion to a long
        lengthscale makes Kuu numerically singular; unjittered, both θ-rule
        log-densities (and their gradients) came back NaN — silently wasting
        the epoch's θ update. The default jitter (the reference's own
        +1e-8·I) must keep them finite."""
        w = float(gamma_mean(Q_W))
        th_far = jnp.asarray([1.0, 500.0])
        lp_exact = unisgp.theta_log_message_exact(
            KER, XU, jnp.asarray(1.0), 2.0, MU_V, RV, w
        )
        lp_unc = unisgp.theta_log_message_uncertain(
            KER, GH, XU, Q_X, float(Q_OUT.mean), MU_V, RV, w
        )
        for lp in (lp_exact, lp_unc):
            assert bool(jnp.isfinite(lp(th_far)))
            assert bool(jnp.all(jnp.isfinite(jax.grad(lp)(th_far))))
