"""Minibatched sparse-GP training with warm-started q(v) (kin40k / banana).

The reference per-batch pipeline (SURVEY.md §3.1, regression_kin40k.ipynb
cell 9): one VMP sweep warm-started from the previous batch's q(v), then an
AdaMax step on the hyperparameter objective. Here the WHOLE epoch — 20
batches of [Gram, natural-parameter update, Cholesky, solves, grad, AdaMax]
— is a single jitted ``lax.scan``; no host round-trips inside an epoch.

Natural-parameter warm start: the reference carries q(v) as (μ, Σ) and feeds
it back as the next batch's prior; accumulating (ξ, Λ) is the same fixed
point without the invert/re-invert churn.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import JITTER_KUU
from ..dists import GammaShapeRate, MvGaussian, MvGaussianNat, gamma_mean
from ..nodes import probit as probit_node
from ..nodes import unisgp
from ..objectives import neg_log_backwardmess_fast
from ..ops.linalg import chol_lower, chol_solve, chol_upper, sym

__all__ = ["MinibatchCarry", "kin40k_epoch", "fit_kin40k", "banana_epoch", "fit_banana"]


class MinibatchCarry(NamedTuple):
    xi_v: jax.Array
    prec_v: jax.Array
    theta: jax.Array
    opt_state: optax.OptState
    # classification extras (unused in regression): q(w) shape/rate
    w_shape: jax.Array
    w_rate: jax.Array


def _qv_stats(xi, prec):
    L = chol_lower(sym(prec))
    eye = jnp.eye(prec.shape[0], dtype=prec.dtype)
    cov = sym(chol_solve(L, eye))
    mu = chol_solve(L, xi)
    Uv = chol_upper(sym(cov + jnp.outer(mu, mu)))
    return mu, cov, Uv


def _regression_batch_step(kernel, Xu, optimizer, w_val, grad_fn):
    def step(carry: MinibatchCarry, batch):
        Xb, yb = batch
        theta = carry.theta
        Kux = kernel(theta, Xu, Xb)
        # one VMP sweep: q(v) ← warm q(v) × batch messages (UniSGPnode.jl:144-158)
        xi = carry.xi_v + w_val * (Kux @ yb)
        prec = carry.prec_v + w_val * (Kux @ Kux.T)
        mu_v, _cov, Uv = _qv_stats(xi, prec)
        # AdaMax step on the batched objective (derivative_helper.jl:23-39)
        g = grad_fn(theta, Xb, yb, mu_v, Uv)
        updates, opt_state = optimizer.update(g, carry.opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return MinibatchCarry(xi, prec, theta, opt_state, carry.w_shape, carry.w_rate), None

    return step


@partial(jax.jit, static_argnames=("kernel", "epochs"), donate_argnums=())
def fit_kin40k(
    kernel,
    theta0,
    Xu,
    X_batched,  # (B, batch, Din)
    y_batched,  # (B, batch)
    prior_v: MvGaussianNat,
    w_val: float,
    epochs: int,
    learning_rate: float = 0.002,
):
    """kin40k trainer (reference: regression_kin40k.ipynb cells 9-10):
    w is a PointMass (1e4); per epoch scan over minibatches. Returns
    (θ, q(v) natural params)."""
    optimizer = optax.adamax(learning_rate)

    def objective(th, Xb, yb, mu_v, Uv):
        return neg_log_backwardmess_fast(
            th, kernel=kernel, Xu=Xu, X=Xb, y=yb, mu_v=mu_v, Uv=Uv, w=w_val,
            kuu_jitter=JITTER_KUU,
        )

    grad_fn = jax.grad(objective)
    step = _regression_batch_step(kernel, Xu, optimizer, w_val, grad_fn)

    def epoch(carry, _):
        carry, _ = jax.lax.scan(step, carry, (X_batched, y_batched))
        return carry, None

    carry0 = MinibatchCarry(
        prior_v.xi, prior_v.prec, theta0, optimizer.init(theta0),
        jnp.asarray(0.0, dtype=theta0.dtype), jnp.asarray(0.0, dtype=theta0.dtype),
    )
    carry, _ = jax.lax.scan(epoch, carry0, None, length=epochs)
    return carry.theta, MvGaussianNat(carry.xi_v, carry.prec_v)


@partial(jax.jit, static_argnames=("kernel", "epochs"))
def fit_banana(
    kernel,
    theta0,
    Xu,
    X_batched,  # (B, batch, 2)
    y_batched,  # (B, batch) in {0,1}
    prior_v: MvGaussianNat,
    prior_w: GammaShapeRate,
    epochs: int,
    learning_rate: float = 0.002,
):
    """Banana classification trainer (classification_banana.ipynb cell 9):
    per batch, 1 VMP sweep (forward f → probit tilted q(f) → q(v) warm-started
    → q(w) carried across batches), then AdaMax on pseudo-targets f̄ with the
    batch q(w) mean. Returns (θ, q(v) nat, q(w))."""
    optimizer = optax.adamax(learning_rate)
    a0, b0 = prior_w.shape, prior_w.rate

    def objective(th, Xb, f, mu_v, Uv, w):
        return neg_log_backwardmess_fast(
            th, kernel=kernel, Xu=Xu, X=Xb, y=f, mu_v=mu_v, Uv=Uv, w=w,
            kuu_jitter=JITTER_KUU,
        )

    grad_fn = jax.grad(objective)

    def step(carry: MinibatchCarry, batch):
        Xb, yb = batch
        theta = carry.theta
        Kuu = kernel.kuu(theta, Xu, jitter=JITTER_KUU)
        KuuL = chol_lower(Kuu)
        Kux = kernel(theta, Xu, Xb)
        kxx = kernel.diag(theta, Xb)
        w_mean = carry.w_shape / carry.w_rate
        mu_v, _cov, Uv = _qv_stats(carry.xi_v, carry.prec_v)
        # forward f messages → probit tilted marginals
        f_fwd = Kux.T @ mu_v
        f_var = jnp.full_like(f_fwd, 1.0 / w_mean)
        qf = probit_node.tilted_marginal_batch(f_fwd, f_var, yb)
        # q(v) update with pseudo-targets E[f]
        xi = carry.xi_v + w_mean * (Kux @ qf.mean)
        prec = carry.prec_v + w_mean * (Kux @ Kux.T)
        mu_v, _cov, Uv = _qv_stats(xi, prec)
        # q(w) update carried across batches (new posterior = prior + this batch)
        args = unisgp.UniSGPArgs(theta, Xu, KuuL, Uv)
        dshape, rates = unisgp.w_message_batch_exact(
            kernel, args, kxx, Kux, qf.mean, qf.var, mu_v
        )
        w_shape = a0 + dshape
        w_rate = b0 + rates
        # AdaMax step
        g = grad_fn(theta, Xb, qf.mean, mu_v, Uv, w_shape / w_rate)
        updates, opt_state = optimizer.update(g, carry.opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return MinibatchCarry(xi, prec, theta, opt_state, w_shape, w_rate), None

    def epoch(carry, _):
        carry, _ = jax.lax.scan(step, carry, (X_batched, y_batched))
        return carry, None

    carry0 = MinibatchCarry(
        prior_v.xi, prior_v.prec, theta0, optimizer.init(theta0),
        jnp.asarray(1e-2, dtype=theta0.dtype), jnp.asarray(1e-2, dtype=theta0.dtype),
    )
    carry, _ = jax.lax.scan(epoch, carry0, None, length=epochs)
    return carry.theta, MvGaussianNat(carry.xi_v, carry.prec_v), GammaShapeRate(carry.w_shape, carry.w_rate)
