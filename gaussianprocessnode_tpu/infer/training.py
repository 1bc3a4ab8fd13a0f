"""Fused training loops: alternate VMP inference with hyperparameter steps,
entirely on-device (L5/L6 glue).

The reference alternates RxInfer ``infer`` with host-side Optim/Flux steps
(SURVEY.md §3.1). Here the whole alternation is one jitted ``lax.scan`` —
VMP sweeps, Uv refresh, and optax L-BFGS (with zoom linesearch) or AdaMax
steps on the backward-message objective all fuse into a single XLA program.
"""

from functools import partial
import jax
import jax.numpy as jnp
import optax

from ..dists import GammaShapeRate, MvGaussianNat, gamma_mean
from ..objectives import neg_log_backwardmess_fast
from ..ops.linalg import rv_chol_upper
from .batch_vmp import classification_vmp, regression_vmp


def lbfgs_solve(objective, x0, max_steps: int = 60):
    """Minimize a smooth objective with optax L-BFGS + zoom linesearch,
    fixed iteration budget (jit-friendly). Non-finite iterates are rejected."""
    opt = optax.lbfgs()
    vg = jax.value_and_grad(objective)

    def step(carry, _):
        x, state = carry
        v, g = vg(x)
        updates, state = opt.update(g, state, x, value=v, grad=g, value_fn=objective)
        x_new = optax.apply_updates(x, updates)
        ok = jnp.all(jnp.isfinite(x_new))
        x_new = jnp.where(ok, x_new, x)
        return (x_new, state), v

    (x, _), values = jax.lax.scan(step, (x0, opt.init(x0)), None, length=max_steps)
    return x, values


@partial(jax.jit, static_argnames=("kernel", "n_iters", "lbfgs_steps", "epochs"))
def fit_regression(
    kernel,
    theta0,
    Xu,
    X,
    y,
    prior_v: MvGaussianNat,
    prior_w: GammaShapeRate,
    epochs: int,
    n_iters: int = 7,
    lbfgs_steps: int = 60,
):
    """Toy-regression trainer (reference: GPT_regression.ipynb cells 9-10):
    per epoch, run n_iters VMP sweeps then L-BFGS the θ objective given
    (μ_v, Uv, w̄). Returns (θ, FE trace, final VMP result)."""

    def epoch(theta, _):
        res = regression_vmp(kernel, theta, Xu, X, y, prior_v, prior_w, n_iters=n_iters)
        mu_v = res.qv.mean
        Uv = rv_chol_upper(mu_v, res.qv.cov)
        w = gamma_mean(res.qw)

        def objective(th):
            return neg_log_backwardmess_fast(
                th, kernel=kernel, Xu=Xu, X=X, y=y, mu_v=mu_v, Uv=Uv, w=w
            )

        theta, _vals = lbfgs_solve(objective, theta, max_steps=lbfgs_steps)
        return theta, res.free_energy

    theta, fe_trace = jax.lax.scan(epoch, theta0, None, length=epochs)
    res = regression_vmp(kernel, theta, Xu, X, y, prior_v, prior_w, n_iters=n_iters)
    return theta, fe_trace, res


@partial(jax.jit, static_argnames=("kernel", "n_iters", "lbfgs_steps", "epochs", "probit_product"))
def fit_classification(
    kernel,
    theta0,
    Xu,
    X,
    y,
    prior_v: MvGaussianNat,
    prior_w: GammaShapeRate,
    init_w: GammaShapeRate,
    epochs: int,
    n_iters: int = 30,
    lbfgs_steps: int = 60,
    probit_product: str = "exact",
):
    """Toy-classification trainer (reference: GPT_classification.ipynb cell 9):
    per epoch, 30 VMP sweeps then L-BFGS on pseudo-targets f̄ = E[q(f)].
    ``probit_product="gh32"`` uses the reference's ProbitMeta(32) quadrature
    product instead of the closed-form tilted moments."""

    def epoch(theta, _):
        res = classification_vmp(
            kernel, theta, Xu, X, y, prior_v, prior_w, init_w, n_iters=n_iters,
            probit_product=probit_product,
        )
        mu_v = res.qv.mean
        Uv = rv_chol_upper(mu_v, res.qv.cov)
        w = gamma_mean(res.qw)
        f = res.qf.mean

        def objective(th):
            return neg_log_backwardmess_fast(
                th, kernel=kernel, Xu=Xu, X=X, y=f, mu_v=mu_v, Uv=Uv, w=w
            )

        theta, _vals = lbfgs_solve(objective, theta, max_steps=lbfgs_steps)
        return theta, res.free_energy

    theta, fe_trace = jax.lax.scan(epoch, theta0, None, length=epochs)
    res = classification_vmp(kernel, theta, Xu, X, y, prior_v, prior_w, init_w,
                             n_iters=n_iters, probit_product=probit_product)
    return theta, fe_trace, res
