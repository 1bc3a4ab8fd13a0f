"""Hyperparameter learning / model selection for the SDE-GP + GP-PAD
families (infer/pad_learn.py).

References: the legacy learning notebooks —
``LearnParamsGPSDE-checkpoint.ipynb`` (Bayesian lengthscale posterior),
``LearnParams_PAD2-checkpoint.ipynb`` (PAD hyperparameter learning),
``GPPAD_mixture-checkpoint.ipynb`` (evidence-weighted model banks).

Oracles, strongest-first:
- EP chain evidence vs the EXACT dense evidence on a small chain
  (tensor-product GH over the full joint prior) — and exactness by
  construction for Gaussian likelihoods with exact sites.
- The mean-field ELBO vs the same dense evidence (a true lower bound).
- The Bayesian-lengthscale posterior vs a dense numeric grid posterior
  (the regression evidence is exact, so only the Gaussian family + GH
  localization is approximate).
- EP-EM / variational-EM trainers: monotone objective, recovery direction,
  and (regression for a measured NaN) finite cold-start gradients through
  the E-step.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprocessnode_tpu.infer.gppad import (
    gppad_colored_infer,
    gppad_infer,
    pad_loglik,
)
from gaussianprocessnode_tpu.infer.pad_learn import (
    colored_pad_elbo,
    ep_chain_evidence,
    fit_gppad_colored_theta,
    fit_gppad_theta,
    gppad_bayes_lengthscale,
    gppad_colored_mixture,
    gppad_mixture,
    pad_elbo,
    pad_evidence,
    sde_gp_bayes_lengthscale,
)
from gaussianprocessnode_tpu.infer.sde_gp import sde_gp_smooth
from gaussianprocessnode_tpu.ops.kernels import Kernel
from gaussianprocessnode_tpu.ops.quadrature import moment_match_uni_logz

KERNEL = Kernel("matern52", transform="identity")


def _gp_draw(t, var, ell, seed):
    """Exact dense Matérn-5/2 draw on the timeline."""
    K = np.asarray(KERNEL(jnp.asarray([var, ell]), t[:, None], t[:, None]))
    L = np.linalg.cholesky(K + 1e-10 * np.eye(t.shape[0]))
    return L @ np.random.default_rng(seed).standard_normal(t.shape[0])


def _pad_draw(T=400, seed=3, var=1.0, ell=0.9, sigma_c=0.3):
    """White-carrier PAD data y = c·exp(f), c ~ N(0, σ_c²)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 4.0, T)
    f_true = _gp_draw(t, var, ell, seed + 1)
    y = sigma_c * rng.standard_normal(T) * np.exp(f_true)
    return jnp.asarray(t), jnp.asarray(y), f_true


class TestLogZOracle:
    def test_gaussian_logf_closed_form(self):
        """moment_match_uni_logz against the Gaussian×Gaussian closed form:
        logf = log N(y; f, r) gives log Z = log N(y; m, v + r) and the
        standard product moments — all three outputs exact."""
        m, v, y, r = 0.4, 0.8, 1.3, 0.25
        mt, vt, lz = moment_match_uni_logz(
            lambda f: -0.5 * (jnp.log(2 * jnp.pi * r) + (y - f) ** 2 / r),
            jnp.asarray(m), jnp.asarray(v), n=61)
        s = v + r
        lz_exact = -0.5 * (np.log(2 * np.pi * s) + (y - m) ** 2 / s)
        v_exact = 1.0 / (1.0 / v + 1.0 / r)
        m_exact = v_exact * (m / v + y / r)
        # GH is not exact for e^{-quadratic} integrands; 61 points resolve
        # this product to ~1e-12
        np.testing.assert_allclose(float(lz), lz_exact, rtol=1e-10)
        np.testing.assert_allclose(float(mt), m_exact, rtol=1e-10)
        np.testing.assert_allclose(float(vt), v_exact, rtol=1e-9)


class TestEvidenceExactness:
    def test_gaussian_sites_recover_exact_chain_evidence(self):
        """With Gaussian likelihoods N(z_k; f_k, R_k) and the EXACT sites
        (λ₂ = 1/R, λ₁ = z/R), every per-site correction in ep_chain_evidence
        vanishes identically and the result IS the Kalman chain evidence
        (pad_learn.py module docstring's construction check)."""
        rng = np.random.default_rng(0)
        T = 40
        t = jnp.asarray(np.linspace(0.0, 3.0, T))
        z = jnp.asarray(rng.standard_normal(T))
        R = jnp.asarray(0.05 + rng.uniform(size=T))
        theta = jnp.asarray([1.1, 0.6])
        lam2 = 1.0 / R
        lam1 = z / R

        def loglik(f, zk, rk):
            return -0.5 * (jnp.log(2 * jnp.pi * rk) + (zk - f) ** 2 / rk)

        ev = ep_chain_evidence(theta, t, lam1, lam2, loglik, (z, R), n_gh=31)
        exact = sde_gp_smooth(theta, t, z, jnp.ones(T, bool), R).log_lik
        np.testing.assert_allclose(float(ev), float(exact),
                                   rtol=1e-8, atol=1e-8)

    def test_pad_evidence_and_elbo_vs_dense_quadrature(self):
        """Small chain (T=3): the exact PAD evidence by tensor-product GH
        over the FULL joint prior N(0, K). The converged EP evidence must
        land within 0.05 nats; the mean-field ELBO must lower-bound it."""
        t_np = np.array([0.0, 0.7, 1.6])
        y_np = np.array([0.35, -0.9, 0.15])
        theta = jnp.asarray([1.0, 0.8])
        cvar = 0.3**2
        K = np.asarray(KERNEL(theta, t_np[:, None], t_np[:, None]))
        L = np.linalg.cholesky(K + 1e-12 * np.eye(3))
        # physicists' GH: ∫e^{-u²}g(u)du = Σ w g(u); f = L·(√2 u)
        u, w = np.polynomial.hermite.hermgauss(50)
        U = np.stack(np.meshgrid(u, u, u, indexing="ij"), -1).reshape(-1, 3)
        W = (np.stack(np.meshgrid(w, w, w, indexing="ij"), -1)
             .reshape(-1, 3).prod(-1))
        F = (np.sqrt(2.0) * U) @ L.T
        ll = np.zeros(F.shape[0])
        for k in range(3):
            vk = cvar * np.exp(2.0 * F[:, k])
            ll += -0.5 * (np.log(2 * np.pi * vk) + y_np[k] ** 2 / vk)
        lmax = ll.max()
        log_z_exact = (np.log(np.sum(W * np.exp(ll - lmax))) + lmax
                       - 1.5 * np.log(np.pi))
        t, y = jnp.asarray(t_np), jnp.asarray(y_np)
        st = gppad_infer(theta, t, y, carrier_var=cvar, iters=60, n_gh=61)
        ev = float(pad_evidence(theta, t, y, st.lam1, st.lam2,
                                carrier_var=cvar, n_gh=61))
        el = float(pad_elbo(theta, t, y, st, carrier_var=cvar))
        assert abs(ev - log_z_exact) < 0.05, (ev, log_z_exact)
        assert el <= log_z_exact + 1e-6, (el, log_z_exact)
        assert el <= ev + 0.05  # ELBO below the (near-exact) EP evidence


class TestBayesLengthscale:
    def test_regression_matches_dense_grid_posterior(self):
        """sde_gp_bayes_lengthscale vs the dense numeric posterior on a
        301-point s-grid — the evidence is EXACT here, so q(s) only carries
        the Gaussian-family + GH-localization error."""
        rng = np.random.default_rng(2)
        T = 80
        t_np = np.linspace(0.0, 4.0, T)
        f = _gp_draw(t_np, 1.0, 0.6, 11)
        y_np = f + 0.1 * rng.standard_normal(T)
        t, y = jnp.asarray(t_np), jnp.asarray(y_np)
        mask = jnp.ones(T, bool)
        res = sde_gp_bayes_lengthscale(t, y, mask, 0.01, m0=0.0, v0=10.0,
                                       sigma2=1.0, iters=8)
        grid = jnp.linspace(-4.0, 3.0, 301)

        def log_ev(s):
            th = jnp.stack([jnp.asarray(1.0), jnp.exp(s)])
            return sde_gp_smooth(th, t, y, mask, 0.01).log_lik

        lp = np.asarray(jax.vmap(log_ev)(grid))
        lp = lp - grid**2 / 20.0  # + log prior N(0, 10)
        lp = np.where(np.isfinite(lp), lp, -np.inf)
        p = np.exp(lp - lp.max())
        p /= p.sum()
        g = np.asarray(grid)
        m_grid = float(p @ g)
        v_grid = float(p @ (g - m_grid) ** 2)
        assert abs(float(res.m_s) - m_grid) < 0.03, (float(res.m_s), m_grid)
        np.testing.assert_allclose(float(res.v_s), v_grid, rtol=0.2)

    def test_pad_lengthscale_posterior_concentrates_near_truth(self):
        """gppad_bayes_lengthscale on a white-PAD draw (ℓ=0.9): the prior
        N(0, 10) must shrink to a posterior whose mean is within one
        posterior-σ-plus-0.5 of log ℓ_true."""
        t, y, _ = _pad_draw(T=300, seed=5, ell=0.9, sigma_c=0.3)
        res = gppad_bayes_lengthscale(t, y, carrier_var=0.09, iters=6,
                                      ep_iters=15, n_gh=61)
        m_s, v_s = float(res.m_s), float(res.v_s)
        assert v_s < 1.0, v_s  # shrunk far below the prior's 10
        assert abs(m_s - np.log(0.9)) < 0.5 + np.sqrt(v_s), (m_s, v_s)


class TestEPEM:
    def test_white_carrier_em_recovers_lengthscale(self):
        """fit_gppad_theta from a mis-set start: the EP-EM evidence trace
        must rise and the learned ℓ must land nearer the truth than the
        start did."""
        t, y, _ = _pad_draw(T=300, seed=7, ell=0.9, sigma_c=0.3)
        res = fit_gppad_theta(t, y, theta0=jnp.asarray([0.5, 0.35]),
                              carrier_var=0.09, epochs=30, ep_iters=10)
        evs = np.asarray(res.evidence)
        assert np.all(np.isfinite(evs))
        assert evs[-1] > evs[0] + 1.0, evs[[0, -1]]
        ell = float(res.theta[1])
        assert abs(np.log(ell) - np.log(0.9)) < abs(np.log(0.35)
                                                    - np.log(0.9)), ell

    def test_colored_cold_start_gradient_finite_and_directional(self):
        """Regression for a measured NaN: the gradient through the E-step
        from all-zero sites NaN'd when a near-delta likelihood collapsed
        pass 1 of two_stage_tilt to v1 ~ 1e-179 (sites 48-53 of this exact
        draw) — the v1/v_t derivative-safe floors keep it finite.
        Direction (measured on this draw at converged 30-sweep E-steps):
        the −ELBO gradient pushes ℓ_f up from 0.3 (toward/through the truth
        0.8 — the converged ELBO rises onto a plateau, see
        fit_gppad_colored_theta's docstring), and pushes ℓ_c toward the
        truth 0.05 from both sides (up from 0.02: −413; down from 0.12:
        +2645)."""
        rng = np.random.default_rng(9)
        T = 400
        t_np = np.linspace(0.0, 5.0, T)
        f_true = _gp_draw(t_np, 0.4, 0.8, 21)
        c_true = _gp_draw(t_np, 1.0, 0.05, 22)
        y_np = c_true * np.exp(f_true) + np.sqrt(1e-3) * rng.standard_normal(T)
        t, y = jnp.asarray(t_np), jnp.asarray(y_np)

        def neg_elbo(log_l, iters):
            th_f = jnp.stack([jnp.asarray(0.4), jnp.exp(log_l[0])])
            th_c = jnp.stack([jnp.asarray(1.0), jnp.exp(log_l[1])])
            st = gppad_colored_infer(th_f, th_c, t, y, obs_var=1e-3,
                                     iters=iters, n_gh=61)
            return -colored_pad_elbo(th_f, th_c, t, y, st.lam1, st.lam2,
                                     obs_var=1e-3)

        # the NaN repro probes (12 cold sweeps, the trainer's shape)
        g_nan1 = np.asarray(jax.grad(neg_elbo)(
            jnp.log(jnp.asarray([0.3, 0.02])), 12))
        g_nan2 = np.asarray(jax.grad(neg_elbo)(
            jnp.log(jnp.asarray([2.5, 0.12])), 12))
        assert np.all(np.isfinite(g_nan1)), g_nan1
        assert np.all(np.isfinite(g_nan2)), g_nan2
        # directional claims need converged E-steps
        grad30 = jax.grad(lambda ll: neg_elbo(ll, 30))
        g_f = np.asarray(grad30(jnp.log(jnp.asarray([0.3, 0.05]))))
        g_lo = np.asarray(grad30(jnp.log(jnp.asarray([0.8, 0.02]))))
        g_hi = np.asarray(grad30(jnp.log(jnp.asarray([0.8, 0.12]))))
        assert g_f[0] < 0.0, g_f  # −ELBO falls as ℓ_f grows from 0.3
        assert g_lo[1] < 0.0, g_lo  # ℓ_c pulled up from 0.02 toward 0.05
        assert g_hi[1] > 0.0, g_hi  # ... and down from 0.12

    def test_colored_em_recovers_both_lengthscales(self):
        """fit_gppad_colored_theta with its deep-E-step defaults: rising
        ELBO, ℓ_f climbing from the mis-set 0.3 toward/through the truth
        0.8 (the regression the implicit gradient + deep E-step fix — the
        shallow-E-step trainer parked at ℓ_f ≈ 0.20), and ℓ_c pulled from
        0.1 toward the truth 0.05. Measured trace at these exact settings:
        ℓ = [0.62, 0.056] at epoch 8 (→ [0.85, 0.050] by epoch 12)."""
        rng = np.random.default_rng(9)
        T = 400
        t_np = np.linspace(0.0, 5.0, T)
        f_true = _gp_draw(t_np, 0.4, 0.8, 21)
        c_true = _gp_draw(t_np, 1.0, 0.05, 22)
        y_np = c_true * np.exp(f_true) + np.sqrt(1e-3) * rng.standard_normal(T)
        res = fit_gppad_colored_theta(jnp.asarray(t_np), jnp.asarray(y_np),
                                      ell0=jnp.asarray([0.3, 0.1]),
                                      var_f=0.4, var_c=1.0, epochs=8)
        evs = np.asarray(res.evidence)
        assert np.all(np.isfinite(evs))
        assert evs[-1] > evs[0], evs[[0, -1]]
        ells = np.asarray(res.theta_trace)
        assert ells[-1, 0] > 0.5, ells[-1]  # ℓ_f well on its way to 0.8
        assert abs(ells[-1, 1] - 0.05) < abs(0.1 - 0.05), ells[-1]


class TestMixture:
    def test_white_mixture_picks_truth_and_scores_agree(self):
        """3-model white-PAD bank with the truth (ℓ=0.9) among decoys: the
        EP-evidence responsibilities select it, and the mean-field ELBO
        agrees on the ranking (the GPPAD_mixture cross-check)."""
        t, y, _ = _pad_draw(T=300, seed=13, ell=0.9, sigma_c=0.3)
        thetas = jnp.asarray([[1.0, 0.9], [1.0, 0.15], [1.0, 4.0]])
        res = gppad_mixture(thetas, t, y,
                            carrier_vars=jnp.asarray([0.09, 0.09, 0.09]),
                            iters=25)
        assert int(np.argmax(np.asarray(res.resp))) == 0, res.resp
        assert int(np.argmax(np.asarray(res.elbo))) == 0, res.elbo
        assert float(res.resp[0]) > 0.9, res.resp
        # the weighted envelope is a convex combination of the bank's
        env = np.asarray(res.envelope)
        envs = np.asarray(res.envelopes)
        assert np.all(env <= envs.max(0) + 1e-9)
        assert np.all(env >= envs.min(0) - 1e-9)

    def test_colored_mixture_picks_truth(self):
        """3-model colored bank (pairs of (θ_f, θ_c)): the ELBO scores put
        (nearly) all responsibility on the generating pair."""
        rng = np.random.default_rng(17)
        T = 400
        t_np = np.linspace(0.0, 5.0, T)
        f_true = _gp_draw(t_np, 0.4, 0.8, 31)
        c_true = _gp_draw(t_np, 1.0, 0.05, 32)
        y_np = c_true * np.exp(f_true) + np.sqrt(1e-3) * rng.standard_normal(T)
        thetas_f = jnp.asarray([[0.4, 0.8], [0.4, 0.1], [0.4, 3.0]])
        thetas_c = jnp.asarray([[1.0, 0.05], [1.0, 0.4], [1.0, 0.012]])
        res = gppad_colored_mixture(thetas_f, thetas_c, jnp.asarray(t_np),
                                    jnp.asarray(y_np), obs_var=1e-3,
                                    iters=30)
        assert int(np.argmax(np.asarray(res.resp))) == 0, res.log_evidence
        assert float(res.resp[0]) > 0.9, res.resp
