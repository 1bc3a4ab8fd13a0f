"""GP amplitude demodulation (infer/gppad.py) and the heteroscedastic
extension of the SDE smoother it rides on.

Reference: .ipynb_checkpoints/GPSSD_PAD-checkpoint.ipynb — Matérn-5/2
state-space log-envelope f, carrier c_t ~ N(0, σ_c²), observed
y_t = c_t·exp(f_t) (its cells 2-4, 8-13; σ_c = 2π/30).

Oracles: the per-point-variance Kalman/RTS path vs the dense
heteroscedastic GP posterior; the EP tilt vs numeric integration of the
exact likelihood; end-to-end envelope recovery on the notebook's workload
shape.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprocessnode_tpu.infer.gppad import gppad_infer, pad_loglik
from gaussianprocessnode_tpu.infer.sde_gp import sde_gp_smooth
from gaussianprocessnode_tpu.ops.kernels import Kernel
from gaussianprocessnode_tpu.ops.quadrature import moment_match_uni

KERNEL = Kernel("matern52", transform="identity")


class TestHeteroscedasticSmoother:
    def test_per_point_variances_match_dense_gp(self):
        """sde_gp_smooth with a (T,) obs_var array == the dense Matérn-5/2
        posterior with diagonal noise D — every grid point observed."""
        rng = np.random.default_rng(0)
        T = 50
        t = np.linspace(0.0, 3.0, T)
        y = np.sin(2 * t) + 0.1 * rng.normal(size=T)
        R = 0.01 + rng.uniform(size=T) * 0.5  # strongly heteroscedastic
        theta = jnp.asarray([1.2, 0.7])
        res = sde_gp_smooth(theta, jnp.asarray(t), jnp.asarray(y),
                            jnp.ones(T, bool), jnp.asarray(R))
        K = np.asarray(KERNEL(theta, t[:, None], t[:, None]))
        Sig = K + np.diag(R)
        sol = np.linalg.solve(Sig, y)
        mean_d = K @ sol
        var_d = np.diag(K) - np.einsum("to,ot->t", K, np.linalg.solve(Sig, K))
        np.testing.assert_allclose(np.asarray(res.mean), mean_d,
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(res.var), var_d,
                                   rtol=1e-6, atol=1e-9)


class TestTiltOracle:
    def test_tilted_moments_vs_numeric_integration(self):
        """GH-61 moments of N(m,v)·N(y; 0, σ_c² e^{2f}) vs a fine trapezoid
        quadrature of the exact integrand."""
        carrier_var = 0.04
        for m, v, y in [(0.0, 1.0, 0.3), (-0.5, 0.25, 0.05), (1.0, 0.5, 2.0)]:
            mt, vt = moment_match_uni(
                lambda f: pad_loglik(y, f, carrier_var),
                jnp.asarray(m), jnp.asarray(v), n=61)
            grid = np.linspace(m - 12 * np.sqrt(v), m + 12 * np.sqrt(v),
                               200001)
            integ = (np.exp(-(grid - m) ** 2 / (2 * v)) / np.sqrt(2 * np.pi * v)
                     * np.exp(np.asarray(jax.vmap(
                         lambda f: pad_loglik(y, f, carrier_var)
                     )(jnp.asarray(grid)))))
            Z = np.trapezoid(integ, grid)
            m_num = np.trapezoid(grid * integ, grid) / Z
            v_num = np.trapezoid((grid - m_num) ** 2 * integ, grid) / Z
            # GH-61 resolves these integrals to ~1e-5 rel (the heavy left
            # tail of the f-likelihood bounds fixed-grid accuracy)
            np.testing.assert_allclose(float(mt), m_num, rtol=1e-4,
                                       atol=1e-6)
            np.testing.assert_allclose(float(vt), v_num, rtol=5e-4,
                                       atol=1e-6)


class TestEnvelopeRecovery:
    def test_recovers_slow_envelope(self):
        """The notebook's workload shape: T=400 on [0,4], σ_c = 2π/30,
        y = c·exp(f_true) with a slow log-envelope. The EP posterior must
        track f_true and converge (site movement decays)."""
        rng = np.random.default_rng(1)
        T = 400
        t = np.linspace(0.0, 4.0, T)
        f_true = 0.8 * np.sin(2.0 * np.pi * t / 4.0)
        sigma_c = 2.0 * np.pi / 30.0
        c = sigma_c * rng.normal(size=T)
        y = c * np.exp(f_true)
        state = gppad_infer(jnp.asarray([1.0, 0.9]), jnp.asarray(t),
                            jnp.asarray(y), carrier_var=sigma_c**2,
                            iters=25)
        m = np.asarray(state.mean)
        assert np.all(np.isfinite(m))
        corr = np.corrcoef(m, f_true)[0, 1]
        assert corr > 0.85, corr
        # sites converged: last movement ≪ peak movement
        deltas = np.asarray(state.site_delta)
        assert deltas[-1] < 0.05 * np.max(deltas), deltas
        # the posterior envelope beats the raw |y|/E|c| estimate
        env_naive = np.abs(y) / (sigma_c * np.sqrt(2.0 / np.pi))
        err_pad = np.sqrt(np.mean((np.asarray(state.envelope)
                                   - np.exp(f_true)) ** 2))
        err_naive = np.sqrt(np.mean((env_naive - np.exp(f_true)) ** 2))
        assert err_pad < 0.5 * err_naive, (err_pad, err_naive)


class TestColoredCarrier:
    """GPSSD_PAD_2: the carrier is itself a (fast) Matérn-5/2 GP."""

    def _draw(self, T=500, seed=5):
        """The PAD_2 notebook's workload shape (cell 3): T=500 on [0,5],
        carrier ℓ=0.05, envelope ℓ=0.8, exact dense GP draws."""
        rng = np.random.default_rng(seed)
        t = np.linspace(0.0, 5.0, T)
        th_f = jnp.asarray([0.4, 0.8])
        th_c = jnp.asarray([1.0, 0.05])
        Kf = np.asarray(KERNEL(th_f, t[:, None], t[:, None])) + 1e-9 * np.eye(T)
        Kc = np.asarray(KERNEL(th_c, t[:, None], t[:, None])) + 1e-9 * np.eye(T)
        f_true = np.linalg.cholesky(Kf) @ rng.normal(size=T)
        c_true = np.linalg.cholesky(Kc) @ rng.normal(size=T)
        y = c_true * np.exp(f_true)
        return t, y, f_true, c_true, th_f, th_c

    def test_two_stage_tilt_vs_numeric_integration(self):
        """two_stage_tilt(colored_pad_loglik) == quadrature of the exact
        E_q(c)-marginalized integrand. A single cavity-scaled GH pass was
        measured 0.04 off in the mean at this sharpness (σ_y² = 1e-2) —
        the re-localized second pass is what resolves it."""
        from gaussianprocessnode_tpu.infer.gppad import (
            colored_pad_loglik, two_stage_tilt)

        m, v, y, mc, vc, ov = 0.2, 0.6, 1.1, 0.7, 0.3, 1e-2
        mt, vt = two_stage_tilt(
            lambda f: colored_pad_loglik(y, f, mc, vc, ov),
            jnp.asarray(m), jnp.asarray(v), n=61)
        grid = np.linspace(m - 12 * np.sqrt(v), m + 12 * np.sqrt(v), 200001)
        g = np.exp(grid)
        ll = (y * mc * g - 0.5 * (mc**2 + vc) * g**2) / ov
        integ = (np.exp(-(grid - m) ** 2 / (2 * v)) * np.exp(ll - ll.max()))
        Z = np.trapezoid(integ, grid)
        m_num = np.trapezoid(grid * integ, grid) / Z
        v_num = np.trapezoid((grid - m_num) ** 2 * integ, grid) / Z
        np.testing.assert_allclose(float(mt), m_num, rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(float(vt), v_num, rtol=5e-3, atol=1e-6)

    def test_recovers_envelope_and_carrier(self):
        """Measured: corr_f 0.86, corr_c 0.87, reconstruction 0.5 % rel —
        the f/c split has an inherent slow-component trade, so correlations
        plateau below the white-carrier case while the product is pinned."""
        from gaussianprocessnode_tpu.infer.gppad import gppad_colored_infer

        t, y, f_true, c_true, th_f, th_c = self._draw()
        state = gppad_colored_infer(th_f, th_c, jnp.asarray(t),
                                    jnp.asarray(y), obs_var=1e-3, iters=40)
        corr_f = np.corrcoef(np.asarray(state.f_mean), f_true)[0, 1]
        corr_c = np.corrcoef(np.asarray(state.c_mean), c_true)[0, 1]
        assert corr_f > 0.8, corr_f
        assert corr_c > 0.8, corr_c
        # reconstruction: E[c]·E[e^f] tracks the clean signal
        recon = np.asarray(state.c_mean) * np.asarray(state.envelope)
        rel = np.sqrt(np.mean((recon - y) ** 2)) / np.sqrt(np.mean(y**2))
        assert rel < 0.05, rel
