"""Declarative model front-end — the `@model` / `@constraints` /
`@initialization` ergonomics of the reference (SURVEY.md §7.1 "scheduler
slice": a thin spec that lowers onto the structured inference programs).

The reference's four model shapes (its notebooks never leave these):

    SGPRegression       y_i ~ UniSGP(x_i, v, w, θ)            (+ PointMass w)
    SGPClassification   f_i ~ UniSGP(x_i, v, w, θ); y_i ~ Probit(f_i)
    GPSSM               x_t ~ MultiSGP(x_{t-1}, v, W, θ); y_t ~ MvN(x_t, P)
    GPLVM               y_i ~ MultiSGP(x_i, v, W, θ); x_i latent

Example (mirrors GPT_regression.ipynb cells 6-10):

    model = SGPRegression(kernel=Kernel("se", transform="softplus"),
                          Xu=Xu, prior_v_var=50.0, prior_w=(1e-2, 1e-2))
    result = model.infer(theta, X, y, iterations=7)       # one `infer(...)`
    theta, fe_trace, res = model.fit(theta0, X, y, epochs=300)
    mean, var = model.predict(theta, res, X_test)
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp

from ..dists import GammaShapeRate, MvGaussianNat, gamma_mean
from ..ops.kernels import Kernel
from . import batch_vmp, chain_smoother, gplvm, training

__all__ = ["SGPRegression", "SGPClassification", "GPSSM", "GPLVM"]


def _prior_nat(M, var, dtype):
    return MvGaussianNat(jnp.zeros(M, dtype), jnp.eye(M, dtype=dtype) / var)


@dataclass(frozen=True)
class SGPRegression:
    """v ~ MvN(0, σ_v²·I); w ~ Γ(a,b) or PointMass; y_i ~ UniSGP(x_i, v, w, θ).
    Mean-field q(v)q(w) (reference: GPT_regression.ipynb cell 6)."""

    kernel: Kernel
    Xu: jnp.ndarray
    prior_v_var: float = 50.0
    prior_w: Tuple[float, float] = (1e-2, 1e-2)
    w_fixed: Optional[float] = None

    def _priors(self, dtype):
        M = self.Xu.shape[0]
        return (
            _prior_nat(M, self.prior_v_var, dtype),
            GammaShapeRate(jnp.asarray(self.prior_w[0], dtype),
                           jnp.asarray(self.prior_w[1], dtype)),
        )

    def infer(self, theta, X, y, iterations: int = 7):
        pv, pw = self._priors(X.dtype)
        return batch_vmp.regression_vmp(
            self.kernel, theta, self.Xu, X, y, pv, pw,
            n_iters=iterations, w_fixed=self.w_fixed,
        )

    def fit(self, theta0, X, y, epochs: int = 300, iterations: int = 7):
        pv, pw = self._priors(X.dtype)
        return training.fit_regression(
            self.kernel, theta0, self.Xu, X, y, pv, pw,
            epochs=epochs, n_iters=iterations,
        )

    def predict(self, theta, result, X_test):
        w = self.w_fixed if self.w_fixed is not None else gamma_mean(result.qw)
        return batch_vmp.predict_out(
            self.kernel, theta, self.Xu, X_test, result.qv.mean, w
        )

    def predictor(self, theta, result):
        """Frozen serving handle for the inferred posterior (serve.py)."""
        from ..serve import SGPRegressor

        w = self.w_fixed if self.w_fixed is not None else gamma_mean(result.qw)
        return SGPRegressor.from_natural(
            self.kernel, theta, self.Xu, result.qv_nat, float(w)
        )


@dataclass(frozen=True)
class SGPClassification:
    """f_i ~ UniSGP(x_i, v, w, θ); y_i ~ Probit(f_i); q(f)q(v)q(w)
    (reference: GPT_classification.ipynb cell 7)."""

    kernel: Kernel
    Xu: jnp.ndarray
    prior_v_var: float = 50.0
    prior_w: Tuple[float, float] = (1e-2, 1e-2)
    init_w: Tuple[float, float] = (1e-2, 1e-2)

    def _priors(self, dtype):
        M = self.Xu.shape[0]
        return (
            _prior_nat(M, self.prior_v_var, dtype),
            GammaShapeRate(jnp.asarray(self.prior_w[0], dtype),
                           jnp.asarray(self.prior_w[1], dtype)),
            GammaShapeRate(jnp.asarray(self.init_w[0], dtype),
                           jnp.asarray(self.init_w[1], dtype)),
        )

    def infer(self, theta, X, y, iterations: int = 30):
        pv, pw, iw = self._priors(X.dtype)
        return batch_vmp.classification_vmp(
            self.kernel, theta, self.Xu, X, y, pv, pw, iw, n_iters=iterations
        )

    def fit(self, theta0, X, y, epochs: int = 500, iterations: int = 30):
        pv, pw, iw = self._priors(X.dtype)
        return training.fit_classification(
            self.kernel, theta0, self.Xu, X, y, pv, pw, iw,
            epochs=epochs, n_iters=iterations,
        )

    def predict_proba(self, theta, result, X_test):
        return batch_vmp.predict_probit(
            self.kernel, theta, self.Xu, X_test, result.qv.mean,
            gamma_mean(result.qw),
        )

    def predictor(self, theta, result):
        """Frozen serving handle for the inferred posterior (serve.py)."""
        from ..serve import SGPClassifier

        return SGPClassifier.from_natural(
            self.kernel, theta, self.Xu, result.qv_nat, result.qw
        )


@dataclass(frozen=True)
class GPSSM:
    """x_t ~ MultiSGP(x_{t-1}, v, W, θ); y_t ~ MvN(x_t, P); W ~ Wishart
    (reference: Pendulum_Wishart_2d.ipynb cell 12)."""

    kernel: Kernel
    Xu: jnp.ndarray
    obs_cov: jnp.ndarray
    prior_x0_mean: jnp.ndarray
    prior_x0_cov: jnp.ndarray
    prior_v_var: float = 50.0
    wishart_df: float = 100.0

    def infer(self, theta, ys, iterations: int = 10, compute_fe: bool = True):
        M = self.Xu.shape[0]
        D = ys.shape[1]
        pv = _prior_nat(M * D, self.prior_v_var, ys.dtype)
        return chain_smoother.gpssm_vmp(
            self.kernel, theta, self.Xu, ys, self.obs_cov,
            self.prior_x0_mean, self.prior_x0_cov, pv, self.wishart_df,
            jnp.eye(D, dtype=ys.dtype), n_iters=iterations, compute_fe=compute_fe,
        )

    def predict(self, theta, state, ys_test):
        return chain_smoother.one_step_ahead(
            self.kernel, theta, self.Xu, state, ys_test, self.obs_cov
        )

    def predictor(self, theta, state):
        """Frozen STREAMING serving handle for the smoothed state (serve.py)
        — same family convention as the SGP models' .predictor(). Unlike
        :meth:`predict` (one window from the smoother's end), the handle
        returns its carry so windows chain."""
        from ..serve import GPSSMFilter

        return GPSSMFilter.from_state(
            self.kernel, theta, self.Xu, state, self.obs_cov
        )


@dataclass(frozen=True)
class GPLVM:
    """y_i ~ MultiSGP(x_i, v, W=w·I, θ); x_i ~ MvN(x̄_i, σ_x²·I); whitened
    v-prior (reference: GPLVM.ipynb cell 12)."""

    kernel: Kernel
    Xu: jnp.ndarray
    w_fixed: float = 100.0
    x_prior_var: float = 100.0

    def infer(self, theta, Y, x_init_means, iterations: int = 6):
        return gplvm.gplvm_vmp(
            self.kernel, theta, self.Xu, Y, x_init_means,
            x_prior_cov_scale=self.x_prior_var, W_val=self.w_fixed,
            n_iters=iterations,
        )
