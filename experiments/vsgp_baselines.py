"""VSGP (ELBO-trained SVGP) baselines — the reference's comparison notebooks
Regression_VSGP.ipynb / Classification_VSGP.ipynb (ApproximateGPs.jl).

Workloads and reference results (BASELINE.md):
- toy 1-D regression, M=20, 5000 AdaMax steps:      SMSE 0.004615
- kin40k, M=512, batch 500, 2200 epochs (~5 h):     SMSE 0.087478
- toy classification (LBFGS in the reference):      34 err / 8.5 %
- banana, M=500, 1000 epochs AdaMax:                121 err / 9.31 %
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gaussianprocessnode_tpu.infer.svgp import fit_svgp, init_svgp, svgp_predict
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus
from gaussianprocessnode_tpu.utils.datasets import banana, kin40k, toy_classification, toy_sinc
from gaussianprocessnode_tpu.utils.metrics import error_rate, num_error, smse

KERNEL = Kernel("se", transform="softplus")


def run_toy_regression(epochs: int = 8000, verbose: bool = True):
    data = toy_sinc()
    X, y = jnp.asarray(data.x_train), jnp.asarray(data.y_train)
    M = 20
    Xu = jnp.linspace(-4.0, 4.0, M)[:, None]
    params = init_svgp(invsoftplus(jnp.asarray([1.0, 1.0])), M)
    t0 = time.time()
    params = fit_svgp(KERNEL, params, Xu, X[None], y[None], len(y),
                      likelihood="gaussian", epochs=epochs, learning_rate=0.01)
    jax.block_until_ready(params.theta)
    mean, _ = svgp_predict(KERNEL, params, Xu, jnp.asarray(data.x_test))
    score = float(smse(data.y_test, np.asarray(mean)))
    if verbose:
        print(f"[VSGP toy regression] SMSE = {score:.6f} (ref 0.004615) "
              f"wall {time.time()-t0:.1f}s")
    return score


def run_toy_classification(epochs: int = 3000, verbose: bool = True):
    data = toy_classification()
    X, y = jnp.asarray(data.x_train), jnp.asarray(data.y_train)
    M = 15
    Xu = jnp.linspace(-5.0, 5.0, M)[:, None]
    params = init_svgp(invsoftplus(jnp.asarray([1.0, 1.0])), M)
    t0 = time.time()
    params = fit_svgp(KERNEL, params, Xu, X[None], y[None], len(y),
                      likelihood="bernoulli", epochs=epochs)
    jax.block_until_ready(params.theta)
    mean, var = svgp_predict(KERNEL, params, Xu, jnp.asarray(data.x_test))
    probs = jax.scipy.stats.norm.cdf(mean / jnp.sqrt(1.0 + var))
    pred = (np.asarray(probs) >= 0.5).astype(float)
    errs = float(num_error(data.y_test, pred))
    rate = float(error_rate(data.y_test, pred))
    if verbose:
        print(f"[VSGP toy classification] {errs:.0f} err / {rate:.4f} "
              f"(ref 34 / 8.5%) wall {time.time()-t0:.1f}s")
    return errs, rate


def run_kin40k(epochs: int = 2200, m_inducing: int = 512, batch: int = 500,
               verbose: bool = True):
    data = kin40k()
    dtype = jnp.float64
    Xtr = jnp.asarray(data.x_train, dtype)
    ytr = jnp.asarray(data.y_train, dtype)
    rng = np.random.default_rng(1)
    Xu = jnp.asarray(data.x_train[rng.permutation(10_000)[:m_inducing]], dtype)
    B = len(ytr) // batch
    Xb = Xtr[: B * batch].reshape(B, batch, -1)
    yb = ytr[: B * batch].reshape(B, batch)
    params = init_svgp(invsoftplus(jnp.ones(9, dtype)), m_inducing, dtype)
    t0 = time.time()
    params = fit_svgp(KERNEL, params, Xu, Xb, yb, len(ytr),
                      likelihood="gaussian", epochs=epochs)
    jax.block_until_ready(params.theta)
    train_s = time.time() - t0
    mean, _ = svgp_predict(KERNEL, params, Xu, jnp.asarray(data.x_test, dtype))
    score = float(smse(data.y_test, np.asarray(mean)))
    if verbose:
        print(f"[VSGP kin40k] SMSE = {score:.6f} (ref 0.087478) "
              f"wall {train_s:.1f}s for {epochs} epochs (ref ~18000 s for 2200)")
    return score, train_s


def run_banana(epochs: int = 1000, m_inducing: int = 500, batch: int = 200,
               verbose: bool = True):
    data = banana()
    X, y = jnp.asarray(data.x_train), jnp.asarray(data.y_train)
    rng = np.random.default_rng(1)
    Xu = jnp.asarray(data.x_train[rng.permutation(len(y))[:m_inducing]])
    B = len(y) // batch
    Xb = X[: B * batch].reshape(B, batch, -1)
    yb = y[: B * batch].reshape(B, batch)
    params = init_svgp(invsoftplus(jnp.ones(3)), m_inducing)
    t0 = time.time()
    params = fit_svgp(KERNEL, params, Xu, Xb, yb, len(y),
                      likelihood="bernoulli", epochs=epochs)
    jax.block_until_ready(params.theta)
    train_s = time.time() - t0
    mean, var = svgp_predict(KERNEL, params, Xu, jnp.asarray(data.x_test))
    probs = jax.scipy.stats.norm.cdf(mean / jnp.sqrt(1.0 + var))
    pred = (np.asarray(probs) >= 0.5).astype(float)
    errs = float(num_error(data.y_test, pred))
    rate = float(error_rate(data.y_test, pred))
    if verbose:
        print(f"[VSGP banana] {errs:.0f} err / {rate:.4f} (ref 121 / 9.31%) "
              f"wall {train_s:.1f}s (ref ~5900 s for 1000)")
    return errs, rate, train_s


if __name__ == "__main__":
    which = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = which or ["toy_regression", "toy_classification"]
    for w in which:
        {"toy_regression": run_toy_regression,
         "toy_classification": run_toy_classification,
         "kin40k": run_kin40k,
         "banana": run_banana}[w]()
