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

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dists import MvGaussianNat
from ..infer.minibatch import REFRESH_NS_ITERS_SCALED
from ..objectives import neg_log_backwardmess_gram
from ..ops.linalg import (
    effective_jitter, gershgorin_lambda_min, ir_solve, spd_inverse, sym,
)

__all__ = [
    "make_mesh",
    "shard_data",
    "shard_batched_data",
    "dp_regression_sweep",
    "dp_train_step",
    "fit_kin40k_fast_dp",
    "fit_banana_fast_dp",
    "init_kin40k_fast_dp_state",
]


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(list(devices), (axis,))


def shard_data(mesh: Mesh, *arrays, axis: str = "dp"):
    """Place arrays with their leading (data) dimension sharded over the mesh."""
    n = mesh.shape[axis]
    out = []
    for a in arrays:
        if a.shape[0] % n:
            raise ValueError(
                f"leading dim {a.shape[0]} does not shard evenly over {n} "
                f"devices on axis {axis!r} — pick a size that is a multiple "
                "of the device count"
            )
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
    theta = optax.apply_updates(theta, updates)
    return theta, opt_state, nat


def shard_batched_data(mesh: Mesh, X_batched, y_batched, axis: str = "dp"):
    """Place pre-batched arrays (B, batch, ...) with the WITHIN-batch point
    dimension sharded over the mesh (the batch index stays a scan axis)."""
    ndev = mesh.shape[axis]
    if X_batched.shape[1] % ndev != 0:
        raise ValueError(
            f"within-batch size {X_batched.shape[1]} is not divisible by the "
            f"{ndev}-device '{axis}' mesh axis; pick a batch size that is a "
            "multiple of the device count (e.g. 512 on 8 devices instead of "
            "the reference's 500)"
        )
    Xs = jax.device_put(X_batched, NamedSharding(mesh, P(None, axis, None)))
    ys = jax.device_put(y_batched, NamedSharding(mesh, P(None, axis)))
    return Xs, ys


def init_kin40k_fast_dp_state(theta0, prior_v: MvGaussianNat, M: int,
                              learning_rate: float = 1e-3, acc_dt=None):
    """Initial carry for :func:`fit_kin40k_fast_dp` (replicated on every
    device; only the training data is sharded)."""
    from ..infer.minibatch import default_optimizer

    dt = theta0.dtype
    if acc_dt is None:
        acc_dt = jnp.float64 if jax.config.jax_enable_x64 else dt
    optimizer = default_optimizer(learning_rate)
    return (
        prior_v.xi.astype(acc_dt),
        prior_v.prec.astype(acc_dt),
        jnp.zeros((M, M), acc_dt),
        theta0,
        optimizer.init(theta0),
        jnp.zeros((M, M), dt),
    )


@partial(jax.jit, static_argnames=(
    "kernel", "epochs", "learning_rate", "refresh_ns_iters", "obj_ns_iters",
    "mesh", "axis",
))
def fit_kin40k_fast_dp(
    kernel,
    theta0,
    Xu,
    X_batched,  # (B, batch, Din), point dim sharded via shard_batched_data
    y_batched,  # (B, batch)
    prior_v: MvGaussianNat,
    w_val: float,
    epochs: int,
    mesh: Mesh,
    axis: str = "dp",
    learning_rate: float = 0.001,
    resume_state=None,
    refresh_ns_iters: int = REFRESH_NS_ITERS_SCALED,
    obj_ns_iters: int = 12,
):
    """Data-parallel :func:`~..infer.minibatch.fit_kin40k_fast` (the headline
    trainer, ``stats_refreshes=1`` schedule) over a device mesh — VERDICT r2
    item 3.

    The whole multi-epoch program runs inside ONE ``shard_map``: each device
    holds a 1/ndev slice of every minibatch's points and computes

      - its local slice of the grand epoch Gram (M × N/ndev, one MXU matmul)
        and the local natural-parameter increments, which are ``psum``'d into
        the replicated grand (ξ, Λ) update (the q(v) update is a SUM of
        per-datum contributions — SURVEY §2.9's psum design slot);
      - the replicated full-budget f64 Newton–Schulz refresh (M×M work,
        identical on every chip — cheap next to the sharded Grams at scale);
      - per θ-step, the gradient of its local slice of the batch objective
        (a pure data-sum: kxx, Kux·Kuxᵀ and y·Kuxᵀμ_v all sum over points, so
        ``psum`` of shard gradients IS the full-batch gradient), with the
        AdaMax update applied identically on every device.

    Collectives: 2 psums of (M,) + (M,M) per epoch + 1 psum of (dim θ,) per
    θ-step — all riding ICI. Numerically ≡ the single-device trainer up to
    f64 sum-reordering (tested to ~1e-9 relative in tests/test_sharding.py).
    """
    from ..infer.minibatch import (
        default_optimizer, make_theta_step, qv_grand_update,
    )

    optimizer = default_optimizer(learning_rate)
    dt = theta0.dtype
    acc_dt = jnp.float64 if jax.config.jax_enable_x64 else dt
    kuu_jit = effective_jitter(dt)
    B = X_batched.shape[0]
    Din = X_batched.shape[-1]
    lam_v = gershgorin_lambda_min(sym(prior_v.prec)).astype(acc_dt)

    def psum_over(v):
        return jax.lax.psum(v, axis)

    def objective(th, Xb, yb, mu_v, Rv, kuu_warm):
        # LOCAL slice of the batch objective; data-dependent terms sum over
        # points, so shard losses/grads psum to the full-batch ones. The
        # Kuu-only NS inverse is replicated (same on every device).
        return neg_log_backwardmess_gram(
            th, kernel=kernel, Xu=Xu, X=Xb, y=yb, mu_v=mu_v, Rv=Rv, w=w_val,
            kuu_inv_warm=kuu_warm, ns_iters=obj_ns_iters, kuu_jitter=kuu_jit,
        )

    grad_fn = jax.grad(objective, has_aux=True)

    def local_train(carry0, Xb_loc, yb_loc):
        # Xb_loc: (B, batch/ndev, Din); carry replicated
        X_loc = Xb_loc.reshape(-1, Din)
        y_loc = yb_loc.reshape(-1)

        def epoch(carry, _):
            xi0, prec0, cov64, theta, opt_state, kuu_inv = carry
            Kall = kernel(theta, Xu, X_loc).astype(acc_dt)  # local Gram slice
            # grand q(v) update (psum'd) + replicated f64 refresh — the SAME
            # numerical core as the single-device trainer, by construction
            xi, prec, cov64, mu64 = qv_grand_update(
                Kall, y_loc.astype(acc_dt),
                prior_v.xi.astype(acc_dt), prior_v.prec.astype(acc_dt),
                w_val, cov64, refresh_ns_iters, reduce=psum_over,
                lambda_min=lam_v,
            )
            mu_v = mu64.astype(dt)
            Rv = (cov64 + jnp.outer(mu64, mu64)).astype(dt)

            def grad_one(th, kw, batch):
                Xb, yb = batch
                return grad_fn(th, Xb, yb, mu_v, Rv, kw)

            (theta, opt_state, kuu_inv), _ = jax.lax.scan(
                make_theta_step(grad_one, optimizer, reduce=psum_over),
                (theta, opt_state, kuu_inv), (Xb_loc, yb_loc)
            )
            return (xi, prec, cov64, theta, opt_state, kuu_inv), None

        carry, _ = jax.lax.scan(epoch, carry0, None, length=epochs)
        return carry

    carry0 = resume_state
    if carry0 is None:
        carry0 = init_kin40k_fast_dp_state(theta0, prior_v, Xu.shape[0],
                                           learning_rate, acc_dt)
    rep = jax.tree_util.tree_map(lambda _: P(), carry0)
    carry = jax.shard_map(
        local_train,
        mesh=mesh,
        in_specs=(rep, P(None, axis, None), P(None, axis)),
        out_specs=rep,
    )(carry0, X_batched, y_batched)
    xi, prec, cov64, theta, _, _ = carry
    return theta, MvGaussianNat(xi, prec), cov64, carry


@partial(jax.jit, static_argnames=(
    "kernel", "epochs", "learning_rate", "refresh_ns_iters", "obj_ns_iters",
    "mesh", "axis",
))
def fit_banana_fast_dp(
    kernel,
    theta0,
    Xu,
    X_batched,  # (B, batch, 2), point dim sharded via shard_batched_data
    y_batched,  # (B, batch) in {0,1}
    prior_v,
    prior_w,
    epochs: int,
    mesh: Mesh,
    axis: str = "dp",
    learning_rate: float = 0.001,
    resume_state=None,
    refresh_ns_iters: int = REFRESH_NS_ITERS_SCALED,
    obj_ns_iters: int = 8,  # = minibatch.NS_ITERS_STEADY, fit_banana_fast's default
):
    """Data-parallel :func:`~..infer.minibatch.fit_banana_fast` — the probit
    classification headline trainer over a device mesh.

    Everything non-conjugate stays embarrassingly parallel: each device
    probit-tilts ITS slice of the forward f-messages (a per-datum map), and
    the three global reductions are pure data-sums ridden over ICI —
    psum'd (ξ, Λ) increments, a psum'd scalar Σ(I1+I2) for the carried q(w)
    rate, and psum'd per-batch θ-gradients. The f64 NS refresh and the
    AdaMax update are replicated. Numerically ≡ the single-device trainer
    up to f64 sum reordering (tests/test_sharding.py)."""
    from ..dists import GammaShapeRate
    from ..infer.minibatch import (
        MinibatchCarry, banana_epoch_stats, default_optimizer,
        init_banana_state, make_theta_step,
    )

    optimizer = default_optimizer(learning_rate)
    dt = theta0.dtype
    acc_dt = jnp.float64 if jax.config.jax_enable_x64 else dt
    kuu_jit = effective_jitter(dt)
    B, batch = X_batched.shape[0], X_batched.shape[1]
    N = B * batch  # GLOBAL count (the shape seen here is pre-shard)
    Din = X_batched.shape[-1]
    lam_v = gershgorin_lambda_min(sym(prior_v.prec)).astype(acc_dt)

    def psum_over(v):
        return jax.lax.psum(v, axis)

    def objective(th, Xb, f, mu_v, Rv, w, kuu_warm):
        return neg_log_backwardmess_gram(
            th, kernel=kernel, Xu=Xu, X=Xb, y=f, mu_v=mu_v, Rv=Rv, w=w,
            kuu_inv_warm=kuu_warm, ns_iters=obj_ns_iters, kuu_jitter=kuu_jit,
        )

    grad_fn = jax.grad(objective, has_aux=True)

    def local_train(carry0, Xb_loc, yb_loc):
        X_loc = Xb_loc.reshape(-1, Din)
        y_loc = yb_loc.reshape(-1)
        b_loc = Xb_loc.shape[1]

        def epoch(carry: MinibatchCarry, _):
            # the SAME grand statistics pass as the single-device trainer,
            # with the three global reductions psum'd over the mesh axis
            qf, xi, prec, cov, mu_v, Rv, w_shape, w_rate = banana_epoch_stats(
                kernel, Xu, X_loc, y_loc, carry, N, refresh_ns_iters,
                dt, acc_dt, reduce=psum_over, lambda_min=lam_v,
            )
            # θ-steps on frozen epoch stats; psum'd per-batch gradients
            qf_b = qf.mean.reshape(Xb_loc.shape[0], b_loc)

            def grad_one(th, kw, bt):
                Xb, fb = bt
                return grad_fn(
                    th, Xb, fb, mu_v, Rv, (w_shape / w_rate).astype(dt), kw)

            (theta, opt_state, kuu_inv), _ = jax.lax.scan(
                make_theta_step(grad_one, optimizer, reduce=psum_over),
                (carry.theta, carry.opt_state, carry.kuu_inv), (Xb_loc, qf_b)
            )
            return MinibatchCarry(
                xi, prec, cov, kuu_inv, theta, opt_state, w_shape, w_rate
            ), None

        carry, _ = jax.lax.scan(epoch, carry0, None, length=epochs)
        return carry

    carry0 = resume_state
    if carry0 is None:
        carry0 = init_banana_state(kernel, theta0, Xu, prior_v, prior_w,
                                   optimizer=optimizer)
    rep = jax.tree_util.tree_map(lambda _: P(), carry0)
    carry = jax.shard_map(
        local_train,
        mesh=mesh,
        in_specs=(rep, P(None, axis, None), P(None, axis)),
        out_specs=rep,
    )(carry0, X_batched, y_batched)
    return (
        carry.theta,
        MvGaussianNat(carry.xi_v, carry.prec_v),
        GammaShapeRate(carry.w_shape, carry.w_rate),
        carry,
    )
