"""Bayesian-hyperparameter full-covariance GP VMP (infer/fullcov_gp.py).

Reference: .ipynb_checkpoints/regression_fullcov_CVI_UT-checkpoint.ipynb —
mean-field q(x)q(γ)q(θ) over a dense GP with θ ~ N(log 4, 2) and
γ ~ GammaShapeRate(0.01, 0.01), 50 VMP iterations on a sinc draw with
precision-100 noise (cells 3-6).

Oracles: pinning q(θ) and q(γ) with near-delta priors must reproduce the
exact dense GP posterior (infer/tprocess.gp_exact_posterior); free energy
decreases; on the notebook's workload the θ posterior concentrates away
from the (bad) ℓ=4 init and γ recovers the generating precision's scale.
"""

import jax.numpy as jnp
import numpy as np

from gaussianprocessnode_tpu.dists import gamma_mean
from gaussianprocessnode_tpu.infer.fullcov_gp import (
    fullcov_gp_predict,
    fullcov_gp_vmp,
)
from gaussianprocessnode_tpu.infer.tprocess import gp_exact_posterior
from gaussianprocessnode_tpu.ops.kernels import Kernel

KERNEL = Kernel("matern52", transform="identity")


def _sinc_draw(n=100, seed=2, precision=100.0):
    """The notebook's cell-3 workload shape (Julia sinc = sin(πx)/(πx) =
    numpy.sinc — wiggles on a ~unit lengthscale, far from the ℓ=4 init)."""
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(-3.0, 3.0, size=n))
    y = np.sinc(x) + rng.normal(size=n) / np.sqrt(precision)
    xt = np.linspace(-3.1, 3.1, 200)
    return jnp.asarray(x[:, None]), jnp.asarray(y), jnp.asarray(xt[:, None])


class TestPinnedOracle:
    def test_delta_priors_recover_exact_gp(self):
        """v_θ → 0 and a near-delta Gamma prior at γ = 100 turn the VMP
        into plain dense GP regression at (ℓ, σ² = 0.01) — compare against
        the exact posterior at train AND test points."""
        X, y, Xt = _sinc_draw(n=40)
        ell = 0.9
        state = fullcov_gp_vmp(
            KERNEL, X, y, m_th0=float(np.log(ell)), v_th0=1e-14,
            gamma_prior=(1e12, 1e10), iters=5)
        theta = jnp.asarray([1.0, ell])
        exact_tr = gp_exact_posterior(KERNEL, theta, X, y, X, 0.01,
                                      jitter=1e-8)
        # residual deviation ~1e-7: the ±√v_θ GH spread of the near-delta
        # q(θ) perturbs K by O(1e-7)
        np.testing.assert_allclose(np.asarray(state.m_f),
                                   np.asarray(exact_tr.mean),
                                   rtol=1e-4, atol=1e-6)
        mean, var = fullcov_gp_predict(KERNEL, state, X, Xt)
        exact_te = gp_exact_posterior(KERNEL, theta, X, y, Xt, 0.01,
                                      jitter=1e-8)
        np.testing.assert_allclose(np.asarray(mean),
                                   np.asarray(exact_te.mean),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(var),
                                   np.asarray(exact_te.var),
                                   rtol=1e-4, atol=1e-6)


class TestNotebookWorkload:
    def test_fe_decreases_and_posteriors_concentrate(self):
        """The notebook's exact config: θ ~ N(log 4, 2), γ ~ Γ(0.01, 0.01),
        50 sweeps. FE must decrease; q(θ) must concentrate (v_θ ≪ 2) and
        move off the bad ℓ=4 init toward shorter lengthscales; q(γ) must
        land at the generating precision's scale (the posterior trades some
        noise against kernel misspecification, so a broad corridor)."""
        X, y, _ = _sinc_draw()
        state = fullcov_gp_vmp(KERNEL, X, y, m_th0=float(np.log(4.0)),
                               v_th0=2.0, iters=50)
        fe = np.asarray(state.fe)
        assert np.all(np.isfinite(fe))
        assert fe[-1] < fe[0] - 50.0  # substantial descent
        # the re-localized tilted θ update is a fixed-point iteration, not
        # exact coordinate ascent — allow small transient FE upticks
        assert np.max(np.diff(fe)) < 5.0
        ell_post = float(np.exp(state.m_th))
        # measured trajectory: ℓ 4 → 11 (transient smooth mode) → 1.6
        assert ell_post < 2.5, ell_post
        assert float(state.v_th) < 0.1  # concentrated vs prior variance 2
        g = float(gamma_mean(state.gamma))
        assert 50.0 < g < 200.0, g  # generating precision 100 (measured 104)

    def test_predictive_beats_noise_floor(self):
        X, y, Xt = _sinc_draw()
        state = fullcov_gp_vmp(KERNEL, X, y, m_th0=float(np.log(4.0)),
                               v_th0=2.0, iters=50)
        mean, var = fullcov_gp_predict(KERNEL, state, X, Xt)
        f_true = np.sinc(np.asarray(Xt)[:, 0])
        rmse = float(np.sqrt(np.mean((np.asarray(mean) - f_true) ** 2)))
        assert rmse < 0.1  # noise std is 0.1; the posterior mean averages it
        assert np.all(np.asarray(var) > 0.0)
