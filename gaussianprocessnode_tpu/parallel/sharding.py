"""Data-parallel VMP over a device mesh (ICI collectives).

The reference is single-process Julia with no distributed backend
(SURVEY.md §2.9); minibatching is its only work decomposition. The natural
TPU-native scaling axis is the data dimension: every UniSGP message is a
per-datum natural-parameter contribution, and the q(v)/q(w) updates are SUMS
of those contributions — so a data-parallel sweep is

    per shard:  ξ_loc = w·K_loc y_loc,  Λ_loc = w·K_loc K_locᵀ, ...
    collective: ξ = psum(ξ_loc),  Λ = psum(Λ_loc)      (rides ICI)

with the (small, replicated) q(v) solve done identically on every chip.
Model parallelism is not warranted at M ≤ 600 (SURVEY.md §2.9).
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dists import MvGaussianNat
from ..objectives import neg_log_backwardmess_gram
from ..ops.linalg import effective_jitter, ir_solve, spd_inverse, sym

__all__ = ["make_mesh", "shard_data", "dp_regression_sweep", "dp_train_step"]


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(list(devices), (axis,))


def shard_data(mesh: Mesh, *arrays, axis: str = "dp"):
    """Place arrays with their leading (data) dimension sharded over the mesh."""
    out = []
    for a in arrays:
        spec = P(axis, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def dp_regression_sweep(kernel, theta, Xu, X, y, prior_v: MvGaussianNat, w_val,
                        mesh: Mesh, axis: str = "dp", ns_iters: int = 40):
    """One data-parallel VMP sweep for the regression model: shards compute
    local Gram contributions, psum the natural parameters, then solve q(v)
    replicated. Returns (μ_v, Σ_v-estimate, natural params)."""

    def local_contrib(Xl, yl):
        K = kernel(theta, Xu, Xl).astype(jnp.result_type(prior_v.xi))
        xi_loc = w_val * (K @ yl.astype(K.dtype))
        prec_loc = w_val * (K @ K.T)
        xi = jax.lax.psum(xi_loc, axis)
        prec = jax.lax.psum(prec_loc, axis)
        return xi, prec

    sharded = jax.shard_map(
        local_contrib,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(), P()),
    )
    xi_d, prec_d = sharded(X, y)
    xi = prior_v.xi + xi_d
    prec = sym(prior_v.prec + prec_d)
    cov = spd_inverse(prec, iters=ns_iters)
    mu = ir_solve(prec, xi, cov, rounds=2)
    return mu, cov, MvGaussianNat(xi, prec)


def dp_train_step(kernel, theta, opt_state, optimizer, Xu, X, y,
                  prior_v: MvGaussianNat, w_val, mesh: Mesh, axis: str = "dp",
                  ns_iters: int = 40):
    """One full data-parallel training step: DP VMP sweep for q(v) + a
    gradient step on the hyperparameter objective whose per-shard
    contributions are psum'd (the objective is a sum over data)."""
    mu, cov, nat = dp_regression_sweep(
        kernel, theta, Xu, X, y, prior_v, w_val, mesh, axis, ns_iters
    )
    Rv = (cov + jnp.outer(mu, mu)).astype(X.dtype)
    mu_v = mu.astype(X.dtype)
    kuu_jit = effective_jitter(X.dtype)

    def local_loss(th, Xl, yl):
        loss, _ = neg_log_backwardmess_gram(
            th, kernel=kernel, Xu=Xu, X=Xl, y=yl, mu_v=mu_v, Rv=Rv, w=w_val,
            ns_iters=ns_iters, kuu_jitter=kuu_jit,
        )
        # remove the per-shard Kuu-only terms double count: the objective's
        # data-independent pieces are zero here (all terms are data sums), so
        # a plain psum of shard losses is the full-batch loss
        return jax.lax.psum(loss, axis)

    def sharded_grad(th, Xs, ys):
        return jax.shard_map(
            lambda Xl, yl: jax.grad(local_loss)(th, Xl, yl),
            mesh=mesh,
            in_specs=(P(axis, None), P(axis)),
            out_specs=P(),
        )(Xs, ys)

    g = sharded_grad(theta, X, y)
    updates, opt_state = optimizer.update(g, opt_state, theta)
    import optax

    theta = optax.apply_updates(theta, updates)
    return theta, opt_state, nat
