"""Toy 1-D sinc regression — the reference's GPT_regression.ipynb workload.

Config (reference cells 3-10): N=50, M=20 inducing on a grid over [-4,4],
prior v ~ MvN(0, 50·I), w ~ Γ(1e-2, 1e-2), softplus-SE kernel,
300 epochs of [7 VMP iterations → L-BFGS on the backward-message objective].

The whole 300-epoch alternation runs as ONE jitted lax.scan (optax L-BFGS
with zoom linesearch replaces Optim.LBFGS).

Reference result: SMSE = 0.008132. Run on the reference's EXACT saved data
draw (savefiles/*.jld) this port reproduces SMSE 0.008109 and
θ = [0.036207, 0.539897] vs the recorded [0.0362, 0.5398].
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeat CLI invocations skip XLA compiles
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from gaussianprocessnode_tpu.dists import GammaShapeRate, MvGaussianNat, gamma_mean
from gaussianprocessnode_tpu.infer.batch_vmp import predict_out
from gaussianprocessnode_tpu.infer.training import fit_regression
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus, softplus
from gaussianprocessnode_tpu.utils.datasets import toy_sinc, toy_sinc_reference
from gaussianprocessnode_tpu.utils.profiling import block_via_host
from gaussianprocessnode_tpu.utils.metrics import smse


def run(epochs: int = 300, n_iters: int = 7, m_inducing: int = 20, verbose: bool = True):
    try:  # the reference's EXACT data draw (savefiles/*_toyregression.jld)
        data = toy_sinc_reference()
        on_ref_draw = True
    except Exception:
        data = toy_sinc()
        on_ref_draw = False
    X, y = jnp.asarray(data.x_train), jnp.asarray(data.y_train)
    Xt, ft = jnp.asarray(data.x_test), jnp.asarray(data.y_test)
    M = m_inducing
    Xu = jnp.linspace(-4.0, 4.0, M)[:, None]

    kernel = Kernel("se", transform="softplus")
    theta0 = invsoftplus(jnp.asarray([1.0, 1.0]))
    prior_v = MvGaussianNat(jnp.zeros(M), jnp.eye(M) / 50.0)
    prior_w = GammaShapeRate(jnp.asarray(1e-2), jnp.asarray(1e-2))

    t0 = time.time()
    theta, fe_trace, res = fit_regression(
        kernel, theta0, Xu, X, y, prior_v, prior_w, epochs=epochs, n_iters=n_iters
    )
    block_via_host(theta)
    elapsed = time.time() - t0

    mean, _ = predict_out(kernel, theta, Xu, Xt, res.qv.mean, gamma_mean(res.qw))
    score = float(smse(ft, mean))
    if verbose:
        which = "REFERENCE draw" if on_ref_draw else "local draw"
        print(f"SMSE = {score:.6f} on {which} (reference result: 0.008132)  wall: {elapsed:.1f}s")
        print(f"optimal θ (softplus) = {np.asarray(softplus(theta))}  "
              f"(reference: [0.0362, 0.5398])")
        print(f"FE: {float(fe_trace[0]):.3f} → {float(fe_trace[-1]):.3f}")
    return {
        "smse": score,
        "fe_trace": np.asarray(fe_trace),
        "theta": np.asarray(theta),
        "qw_mean": float(gamma_mean(res.qw)),
        "seconds": elapsed,
    }


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run(epochs=int(args[0]) if args else 300)
