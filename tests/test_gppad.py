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
