"""Full-covariance exact GP and Student-t process regression.

TPU-native equivalent of the reference's legacy t-process notebook
``.ipynb_checkpoints/tpregression-checkpoint.ipynb``: a dense
(FullCovarianceStrategy) GP regression next to a ``GeneralizedTProcess``
posterior on the same sinc-with-outliers draw (its cell 2 injects +2 into
two targets; cells 3-9 compare the two posteriors' ribbons). The t-process
(Shah, Wilson & Ghahramani 2014) keeps the GP's O(N³) algebra — identical
posterior MEAN — but its predictive covariance is scaled by the data fit
(ν + β − 2)/(ν + n − 2), β = yᵀK̃⁻¹y, so outliers WIDEN the posterior
instead of being silently averaged in: the heavy-tail robustness the
notebook plots.

Model (noise absorbed into the covariance, as in the notebook's
NormalMeanPrecision observation with the process's covariance strategy), in
the STANDARD multivariate-t shape-matrix parameterization (Roth 2013,
"On the multivariate t distribution"; scipy's ``multivariate_t``) — the
kernel matrix is the MVT shape, so ν → ∞ recovers the GP exactly:

    (y, f*) ~ MVT(ν, 0, [[K_oo + σ²I, K_o*], [K_*o, K_**]])

    f* | y ~ MVT(ν + n,
                 K_*o K̃⁻¹ y,                  (= the GP mean)
                 (ν + β) / (ν + n) · Σ_GP),    K̃ = K_oo + σ²I

with Σ_GP = K_** − K_*o K̃⁻¹ K_*o ᵀ the GP's posterior covariance and
β = yᵀK̃⁻¹y, so the posterior COVARIANCE is (ν+β)/(ν+n−2)·Σ_GP — verified
against direct numeric integration of the joint MVT density
(tests/test_tprocess.py). Shah et al. 2014 state the same lemma in a
covariance parameterization (their K = ν/(ν−2) × this shape matrix); the
two agree as distributions over data, differing only in which matrix the
kernel is declared to be. Everything is one Cholesky + two triangular
solves — a single jitted program.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.linalg import chol_lower, tri_solve_lower

__all__ = ["GPPosterior", "TPPosterior", "gp_exact_posterior",
           "tp_exact_posterior"]


class GPPosterior(NamedTuple):
    mean: jax.Array  # (Nt,)
    var: jax.Array  # (Nt,) marginal posterior variances
    log_lik: jax.Array  # scalar log marginal likelihood


class TPPosterior(NamedTuple):
    mean: jax.Array  # (Nt,) — identical to the GP mean
    var: jax.Array  # (Nt,) posterior covariance diag: ν̂/(ν̂−2) · scale
    scale_diag: jax.Array  # (Nt,) the MVT shape-matrix diagonal
    df: jax.Array  # posterior degrees of freedom ν + n
    fit_scale: jax.Array  # (ν + β)/(ν + n) — the data-fit robustness factor


def _shared(kernel, theta, X, y, X_test, obs_var, jitter):
    Koo = kernel.kuu(theta, X, jitter=jitter)
    n = X.shape[0]
    Kt = Koo + obs_var * jnp.eye(n, dtype=Koo.dtype)
    L = chol_lower(Kt)
    alpha = tri_solve_lower(L, y)  # L⁻¹ y
    Kot = kernel(theta, X, X_test)  # (N, Nt)
    V = tri_solve_lower(L, Kot)  # L⁻¹ K_o*
    mean = V.T @ alpha
    ktt = kernel.diag(theta, X_test)
    var_gp = jnp.maximum(ktt - jnp.sum(V * V, axis=0), 0.0)
    beta = alpha @ alpha  # yᵀ K̃⁻¹ y
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return mean, var_gp, beta, logdet, n


def gp_exact_posterior(kernel, theta, X, y, X_test, obs_var,
                       jitter: float = 0.0) -> GPPosterior:
    """Dense full-covariance GP regression — the notebook's ``gprocess``
    model (cell 4) and the repo-wide exactness oracle for the sparse
    families."""
    mean, var, beta, logdet, n = _shared(
        kernel, theta, X, y, X_test, obs_var, jitter)
    ll = -0.5 * (n * jnp.log(2.0 * jnp.pi) + logdet + beta)
    return GPPosterior(mean=mean, var=var, log_lik=ll)


def tp_exact_posterior(kernel, theta, nu, X, y, X_test, obs_var,
                       jitter: float = 0.0) -> TPPosterior:
    """Student-t process regression — the notebook's ``tprocess`` model
    (cell 3, ν = 100); standard-MVT conditional (Roth 2013 §5), equivalent
    to Shah et al. 2014 Lemma 3 up to their kernel-as-covariance scaling."""
    mean, var_gp, beta, _, n = _shared(
        kernel, theta, X, y, X_test, obs_var, jitter)
    nu = jnp.asarray(nu, mean.dtype)
    fit = (nu + beta) / (nu + n)
    scale = fit * var_gp
    df = nu + n
    return TPPosterior(mean=mean, var=df / (df - 2.0) * scale,
                       scale_diag=scale, df=df, fit_scale=fit)
