"""Optimizer wrappers (reference: Flux AdaMax / Optim LBFGS & NelderMead).

- ``adamax``: optax.adamax, used inside jitted training scans (the
  reference's Flux.Optimise.AdaMax with default lr=0.002).
- ``lbfgs_minimize``: host-side scipy L-BFGS-B over a jitted
  value_and_grad — the reference's Optim.LBFGS-to-convergence per epoch.
- ``nelder_mead``: host-side scipy Nelder–Mead over a jitted objective —
  the reference's GPLVM hyperparameter search (GPLVM.ipynb cell 16).
"""

import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["adamax", "lbfgs_minimize", "nelder_mead"]


def adamax(learning_rate: float = 0.002):
    """Flux.AdaMax defaults: η=0.002, β=(0.9, 0.999)."""
    return optax.adamax(learning_rate, b1=0.9, b2=0.999)


def lbfgs_minimize(value_and_grad_fn, x0, args=(), maxiter: int = 200):
    """Minimize with scipy L-BFGS-B given a (pre-jitted) value_and_grad.

    Pass ``jax.jit(jax.value_and_grad(fun))`` built ONCE — building it per
    call would recompile every time.
    """
    from scipy.optimize import minimize

    def f_np(x):
        v, g = value_and_grad_fn(jnp.asarray(x), *args)
        return float(v), np.asarray(g, dtype=np.float64)

    res = minimize(f_np, np.asarray(x0, dtype=np.float64), jac=True, method="L-BFGS-B",
                   options={"maxiter": maxiter})
    return jnp.asarray(res.x), float(res.fun)


def nelder_mead(fun, x0, maxiter: int = 25):
    """Minimize a (possibly non-smooth) scalar objective by Nelder–Mead."""
    from scipy.optimize import minimize

    history = []

    def f_np(x):
        v = float(fun(jnp.asarray(x)))
        history.append(v)
        return v

    res = minimize(f_np, np.asarray(x0, dtype=np.float64), method="Nelder-Mead",
                   options={"maxiter": maxiter, "xatol": 1e-8, "fatol": 1e-10})
    return jnp.asarray(res.x), float(res.fun), history
