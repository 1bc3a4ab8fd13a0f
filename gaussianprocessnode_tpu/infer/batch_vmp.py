"""Structured VMP inference programs for iid-data models (L5 layer).

TPU-native replacement for the RxInfer/ReactiveMP reactive scheduler on the
iid workloads (SURVEY.md §7.1): instead of N reactive streams, one sweep is a
handful of batched GEMMs, and the fixed number of VMP iterations is a
``lax.fori_loop``. Semantics follow the reference schedule:

    per sweep: q(v) ← prior × Πᵢ v-messages      (order-free natural sum)
               Uv  ← chol(Σ_v + μ_v μ_vᵀ).U      (refresh once per sweep,
                                                  = BufferUniSGP counter hitting N,
                                                  UniSGPnode.jl:62-73)
               q(w) ← prior × Πᵢ w-messages      (uses the fresh Uv)

Free energy is the Bethe free energy of the mean-field factorization:
FE = Σ node energies + prior energies − Σ entropies.
"""

from functools import partial
from typing import NamedTuple, Optional

import math

import jax
import jax.numpy as jnp

from ..config import JITTER_KUU
from ..dists import (
    GammaShapeRate,
    Gaussian,
    MvGaussian,
    MvGaussianNat,
    gamma_entropy,
    gamma_mean,
    gamma_mean_log,
    gaussian_entropy,
    mv_nat_to_meancov,
)
from ..nodes import probit as probit_node
from ..nodes import unisgp
from ..nodes.unisgp import UniSGPArgs
from ..ops.linalg import chol_lower, chol_solve, chol_upper, logdet_from_chol, sym
from ..ops.psi import psi_batch_exact

_LOG2PI = math.log(2.0 * math.pi)  # pure-host constant: a jnp op here
#          would initialize the device backend at IMPORT time (slow and
#          fragile through the device tunnel)


class VMPResult(NamedTuple):
    qv: MvGaussian
    qv_nat: MvGaussianNat
    qw: GammaShapeRate
    Uv: jax.Array
    free_energy: jax.Array
    qf: Optional[Gaussian] = None


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


def _qv_from_nat(nat: MvGaussianNat):
    # the one natural-to-moments conversion (dists.mv_nat_to_meancov) + the
    # Uv statistic; L is re-derived for callers that reuse the factor
    q = mv_nat_to_meancov(nat)
    L = chol_lower(sym(nat.prec))
    Uv = chol_upper(sym(q.cov + jnp.outer(q.mean, q.mean)))
    return q.mean, q.cov, Uv, L


def prior_energy_mvn(mu_q, cov_q, mu_p, cov_p):
    """−E_q[log N(v; μ_p, Σ_p)] (prior factor contribution to FE)."""
    M = mu_q.shape[0]
    Lp = chol_lower(sym(cov_p))
    d = mu_q - mu_p
    a = chol_solve(Lp, d)
    tr_term = jnp.trace(chol_solve(Lp, cov_q))
    return 0.5 * (M * _LOG2PI + logdet_from_chol(Lp) + tr_term + d @ a)


def prior_energy_gamma(a0, b0, qw: GammaShapeRate):
    """−E_q[log Gamma(w; a0, b0)]."""
    return -(
        a0 * jnp.log(b0)
        - jax.scipy.special.gammaln(a0)
        + (a0 - 1.0) * gamma_mean_log(qw)
        - b0 * gamma_mean(qw)
    )


# ---------------------------------------------------------------------------
# regression: y_i ~ UniSGP(x_i, v, w, θ), all data observed
# (reference model: GPT_regression.ipynb cell 6 / regression_kin40k.ipynb cell 7)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("kernel", "n_iters", "compute_fe"))
def regression_vmp(
    kernel,
    theta,
    Xu,
    X,
    y,
    prior_v: MvGaussianNat,
    prior_w: GammaShapeRate,
    n_iters: int = 7,
    w_fixed=None,
    compute_fe: bool = True,
) -> VMPResult:
    """VMP for the conjugate regression model (q(v)q(w) mean field).

    ``w_fixed``: if given, w is a PointMass (kin40k config, w = 1e4) and the
    q(w) updates are skipped. ``prior_v`` doubles as the warm-start carrier
    for minibatch training (regression_kin40k.ipynb cell 9).
    """
    Kuu = kernel.kuu(theta, Xu, jitter=JITTER_KUU)
    KuuL = chol_lower(Kuu)
    kxx, Kux = psi_batch_exact(kernel, theta, Xu, X)

    a0, b0 = prior_w.shape, prior_w.rate

    def sweep(_, carry):
        a_w, b_w = carry
        w_mean = (a_w / b_w) if w_fixed is None else jnp.asarray(w_fixed)
        vmsg = unisgp.v_message_batch_exact(Kux, y, w_mean)
        nat = MvGaussianNat(prior_v.xi + vmsg.xi, prior_v.prec + vmsg.prec)
        mu_v, cov_v, Uv, _ = _qv_from_nat(nat)
        if w_fixed is None:
            args = UniSGPArgs(theta, Xu, KuuL, Uv)
            dshape, rates = unisgp.w_message_batch_exact(
                kernel, args, kxx, Kux, y, 0.0, mu_v
            )
            a_w = a0 + dshape
            b_w = b0 + rates
        return (a_w, b_w)

    a_w, b_w = jax.lax.fori_loop(
        0, n_iters, sweep, (a0, b0), unroll=False
    )

    # final marginals (recompute once outside the loop to return full state)
    w_mean = (a_w / b_w) if w_fixed is None else jnp.asarray(w_fixed)
    vmsg = unisgp.v_message_batch_exact(Kux, y, w_mean)
    nat = MvGaussianNat(prior_v.xi + vmsg.xi, prior_v.prec + vmsg.prec)
    mu_v, cov_v, Uv, Lprec = _qv_from_nat(nat)
    qw = GammaShapeRate(a_w, b_w)

    fe = jnp.asarray(0.0, dtype=y.dtype)
    if compute_fe:
        E_logw = jnp.log(w_mean) if w_fixed is not None else gamma_mean_log(qw)
        args = UniSGPArgs(theta, Xu, KuuL, Uv)
        node_e = unisgp.average_energy_exact_batch(
            kernel, args, kxx, Kux, y, 0.0, mu_v, w_mean, E_logw
        )
        # prior on v: recover (μ_p, Σ_p) from natural parameterization
        qp = mv_nat_to_meancov(prior_v)
        mu_p, cov_p = qp.mean, qp.cov
        # q(v) entropy from the held natural precision's Cholesky (Lprec) —
        # exactly-SPD work; the cov-route choleskys the approximate inverse
        # (measured NaN at κ ~ 1e10 on the TPU backend, DEVIATIONS #30)
        M_v = mu_v.shape[0]
        fe = node_e + prior_energy_mvn(mu_v, cov_v, mu_p, cov_p) - 0.5 * (
            M_v * (_LOG2PI + 1.0) - logdet_from_chol(Lprec)
        )
        if w_fixed is None:
            fe = fe + prior_energy_gamma(a0, b0, qw) - gamma_entropy(qw)

    return VMPResult(MvGaussian(mu_v, cov_v), nat, qw, Uv, fe)


# ---------------------------------------------------------------------------
# classification: f_i ~ UniSGP(x_i, v, w, θ); y_i ~ Probit(f_i)
# (reference model: classification_banana.ipynb cell 7)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("kernel", "n_iters", "compute_fe", "probit_product"))
def classification_vmp(
    kernel,
    theta,
    Xu,
    X,
    y,
    prior_v: MvGaussianNat,
    prior_w: GammaShapeRate,
    init_w: GammaShapeRate,
    n_iters: int = 30,
    compute_fe: bool = True,
    probit_product: str = "exact",
) -> VMPResult:
    """VMP for probit classification with latent f (q(f)q(v)q(w) mean field).

    Per sweep (mirroring SURVEY.md §3.2):
        forward fᵢ ~ N(Ψ1ᵢᵀμ_v, w̄⁻¹)   → tilted q(fᵢ) with the probit
        v-messages with μ_y = E[fᵢ]      → q(v), refresh Uv
        w-messages with (E[fᵢ], V[fᵢ])   → q(w)

    ``probit_product``: "exact" = closed-form tilted moments (default);
    "gh32" = the reference's ProbitMeta(32) Gauss–Hermite moment matching.
    """
    tilted = (
        probit_node.tilted_marginal_batch
        if probit_product == "exact"
        else partial(probit_node.tilted_marginal_gh_batch, n_gh=32)
    )
    Kuu = kernel.kuu(theta, Xu, jitter=JITTER_KUU)
    KuuL = chol_lower(Kuu)
    kxx, Kux = psi_batch_exact(kernel, theta, Xu, X)
    N = y.shape[0]
    a0, b0 = prior_w.shape, prior_w.rate

    # initialization (reference: q(w) init; q(v) starts at its prior)
    mu_v0, cov_v0, Uv0, _ = _qv_from_nat(prior_v)

    def sweep(_, carry):
        a_w, b_w, mu_v, _fm, _fv = carry
        w_mean = a_w / b_w
        f_fwd_mean = Kux.T @ mu_v
        f_fwd_var = jnp.full((N,), 1.0 / w_mean, dtype=f_fwd_mean.dtype)
        qf = tilted(f_fwd_mean, f_fwd_var, y)
        vmsg = unisgp.v_message_batch_exact(Kux, qf.mean, w_mean)
        nat = MvGaussianNat(prior_v.xi + vmsg.xi, prior_v.prec + vmsg.prec)
        mu_v, cov_v, Uv, _ = _qv_from_nat(nat)
        args = UniSGPArgs(theta, Xu, KuuL, Uv)
        dshape, rates = unisgp.w_message_batch_exact(
            kernel, args, kxx, Kux, qf.mean, qf.var, mu_v
        )
        return (a0 + dshape, b0 + rates, mu_v, qf.mean, qf.var)

    init = (
        init_w.shape,
        init_w.rate,
        mu_v0,
        jnp.zeros((N,), dtype=Xu.dtype),
        jnp.ones((N,), dtype=Xu.dtype),
    )
    a_w, b_w, mu_v, f_mean, f_var = jax.lax.fori_loop(0, n_iters, sweep, init)

    w_mean = a_w / b_w
    vmsg = unisgp.v_message_batch_exact(Kux, f_mean, w_mean)
    nat = MvGaussianNat(prior_v.xi + vmsg.xi, prior_v.prec + vmsg.prec)
    mu_v, cov_v, Uv, Lprec = _qv_from_nat(nat)
    qw = GammaShapeRate(a_w, b_w)
    qf = Gaussian(f_mean, f_var)

    fe = jnp.asarray(0.0, dtype=Xu.dtype)
    if compute_fe:
        E_logw = gamma_mean_log(qw)
        args = UniSGPArgs(theta, Xu, KuuL, Uv)
        node_e = unisgp.average_energy_exact_batch(
            kernel, args, kxx, Kux, f_mean, f_var, mu_v, w_mean, E_logw
        )
        probit_e = probit_node.average_energy_batch(f_mean, f_var, y)
        qp = mv_nat_to_meancov(prior_v)
        mu_p, cov_p = qp.mean, qp.cov
        fe = (
            node_e
            + probit_e
            + prior_energy_mvn(mu_v, cov_v, mu_p, cov_p)
            + prior_energy_gamma(a0, b0, qw)
            # entropy from Lprec (see the regression FE above / DEVIATIONS #30)
            - 0.5 * (mu_v.shape[0] * (_LOG2PI + 1.0) - logdet_from_chol(Lprec))
            - gamma_entropy(qw)
            - jnp.sum(jax.vmap(lambda m, v: gaussian_entropy(Gaussian(m, v)))(f_mean, f_var))
        )

    return VMPResult(MvGaussian(mu_v, cov_v), nat, qw, Uv, fe, qf)


# ---------------------------------------------------------------------------
# prediction (reference: predict_new / @call_rule UniSGP(:out), SURVEY §3.5)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("kernel",))
def predict_out(kernel, theta, Xu, X_test, mu_v, w_mean):
    """Batched UniSGP :out rule at PointMass test inputs:
    N(K(Xu,x*)ᵀ μ_v, w̄⁻¹) (reference: UniSGPnode.jl:96-104)."""
    Kut = kernel(theta, Xu, X_test)
    mean = Kut.T @ mu_v
    var = jnp.full_like(mean, 1.0 / w_mean)
    return mean, var


@partial(jax.jit, static_argnames=("kernel",))
def predict_probit(kernel, theta, Xu, X_test, mu_v, w_mean):
    """Class probability P(y=1|x*) = Φ(m/√(1+v)) through the Probit out rule
    (reference: classification_banana.ipynb cell 13)."""
    mean, var = predict_out(kernel, theta, Xu, X_test, mu_v, w_mean)
    return probit_node.out_probability(Gaussian(mean, var))
