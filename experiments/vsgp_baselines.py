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
from gaussianprocessnode_tpu.utils.datasets import (
    banana,
    kin40k,
    toy_classification_reference,
    toy_sinc_reference,
)
from gaussianprocessnode_tpu.utils.metrics import error_rate, num_error, smse

KERNEL = Kernel("se", transform="softplus")


def _saved_xu(name):
    """Inducing inputs the reference loads from savefiles (e.g.
    Regression_VSGP.ipynb cell 5 / cell 15: Xu_toyregression / Xu_kin40k).
    The toy files store a Julia StepRangeLen (TwicePrecision ref/step):
    element i (1-based) = (ref.hi+ref.lo) + (i − offset)·(step.hi+step.lo)."""
    import os

    from gaussianprocessnode_tpu.utils.datasets import REFERENCE_ROOT
    from gaussianprocessnode_tpu.utils.jld import load_jld

    raw = load_jld(os.path.join(REFERENCE_ROOT, "savefiles", name))
    if isinstance(raw, dict) and "ref_1" in raw:
        r = raw
        ref = r["ref_1"]["hi_"] + r["ref_1"]["lo_"]
        step = r["step_1"]["hi_"] + r["step_1"]["lo_"]
        i = np.arange(1, int(r["len_"]) + 1)
        xu = ref + (i - int(r["offset_"])) * step
    else:
        xu = np.asarray(raw)
    return jnp.asarray(xu if xu.ndim == 2 else xu[:, None])


def run_toy_regression(epochs: int = 5000, verbose: bool = True):
    """The reference's EXACT config: its saved data draw and inducing
    inputs, FIXED lik_noise = 0.01, jitter 1e-5, 5000 AdaMax(0.002) steps
    (Regression_VSGP.ipynb cells 5-10).

    At this budget the run is NOT ELBO-converged: the SMSE-vs-steps
    trajectory dips to ~0.005 around step 5000 and then rises to the true
    ELBO optimum 0.00883 (verified against the analytic collapsed Titsias
    bound, infer/svgp.collapsed_neg_elbo — parameterization-independent).
    The reference's recorded 0.004615 is the same mid-trajectory dip on its
    optimizer path; this run reproduces the regime (≈0.0054), and any
    longer run converges to the 0.00883 optimum of the reference's own
    model."""
    data = toy_sinc_reference()
    X, y = jnp.asarray(data.x_train), jnp.asarray(data.y_train)
    Xu = _saved_xu("Xu_toyregression.jld")
    M = Xu.shape[0]
    params = init_svgp(invsoftplus(jnp.asarray([1.0, 1.0])), M, noise=0.01)
    t0 = time.time()
    params = fit_svgp(KERNEL, params, Xu, X[None], y[None], len(y),
                      likelihood="gaussian", epochs=epochs, learning_rate=0.002,
                      learn_noise=False, jitter=1e-5)
    jax.block_until_ready(params.theta)
    mean, _ = svgp_predict(KERNEL, params, Xu, jnp.asarray(data.x_test), jitter=1e-5)
    score = float(smse(data.y_test, np.asarray(mean)))
    if verbose:
        print(f"[VSGP toy regression] SMSE = {score:.6f} (ref 0.004615 "
              f"mid-trajectory; true ELBO optimum 0.00883) wall {time.time()-t0:.1f}s")
    return score


def run_toy_classification(epochs: int = 3000, verbose: bool = True):
    # reference draw + saved inducing inputs (Classification_VSGP.ipynb cell 3)
    data = toy_classification_reference()
    X, y = jnp.asarray(data.x_train), jnp.asarray(data.y_train)
    Xu = _saved_xu("Xu_toyclassification.jld")
    M = Xu.shape[0]
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
    # the reference's saved M=512 inducing set + fixed lik_noise = 0.01
    # (Regression_VSGP.ipynb cells 15-19)
    Xu = _saved_xu("Xu_kin40k.jld").astype(dtype)
    m_inducing = Xu.shape[0]
    B = len(ytr) // batch
    Xb = Xtr[: B * batch].reshape(B, batch, -1)
    yb = ytr[: B * batch].reshape(B, batch)
    params = init_svgp(invsoftplus(jnp.ones(9, dtype)), m_inducing, dtype, noise=0.01)
    t0 = time.time()
    params = fit_svgp(KERNEL, params, Xu, Xb, yb, len(ytr),
                      likelihood="gaussian", epochs=epochs, learn_noise=False)
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
    # the reference's saved M=500 inducing set (Classification_VSGP cell 12)
    Xu = _saved_xu("Xu_banana.jld")
    m_inducing = Xu.shape[0]
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
