"""GPLVM on the 3PhData oil-flow dataset — the reference's GPLVM.ipynb.

Config (reference cells 4-17): N=200, D_out=12, D_in=2, M=30 inducing from
the PCA projection (seed 86), W = 1e2·I PointMass, srcubature, 6 VMP
iterations per free-energy evaluation, 25 Nelder–Mead iterations over
θ = [σ², ℓ₁, ℓ₂] (softplus), then a final 30-iteration inference for q(x).

Reference outcome: 2-D latents separate the 3 flow regimes (plot);
hyperopt ≈ 15 min Julia. Here we report FE and a 1-NN latent-space
classification accuracy as the quantitative proxy.
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

from gaussianprocessnode_tpu.infer.gplvm import fit_gplvm_grad, gplvm_vmp
from gaussianprocessnode_tpu.ops.kernels import Kernel, softplus
from gaussianprocessnode_tpu.utils.datasets import oil_flow
from gaussianprocessnode_tpu.utils.optim import nelder_mead


def pca_2d(Y):
    Yc = Y - Y.mean(axis=0)
    _, _, Vt = np.linalg.svd(Yc, full_matrices=False)
    return Yc @ Vt[:2].T


def knn_accuracy(Z, labels, k=1):
    d = ((Z[:, None, :] - Z[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    nn = d.argmin(axis=1)
    return float((labels[nn] == labels).mean())


def run(nm_iters: int = 25, n_iters: int = 6, grad: bool = True,
        grad_epochs: int = 25, verbose: bool = True):
    """``grad=True`` (default): gradient hyperopt — a jitted EM alternation
    (warm-started VMP E-step + L-BFGS on the θ-differentiable FE, SURVEY
    §7.1 optimizer row). ``grad=False`` (``--nm``): the reference's
    derivative-free schedule — scipy NelderMead over cold 6-sweep FE
    evaluations (GPLVM.ipynb cells 16-17)."""
    Y_np, labels = oil_flow()
    Y = jnp.asarray(Y_np)
    mean_X = pca_2d(Y_np)
    Xm = jnp.asarray(mean_X)

    rng = np.random.default_rng(86)
    M = 30
    pos = rng.permutation(len(Y_np))[:M]
    Xu = jnp.asarray(mean_X[pos])

    kernel = Kernel("se", transform="softplus")
    theta0 = jnp.asarray([1.0, 0.6, 0.5])  # reference cell 17 (raw, pre-softplus)

    t0 = time.time()
    if grad:
        theta, _, fe_trace = fit_gplvm_grad(
            kernel, theta0, Xu, Y, Xm, epochs=grad_epochs, n_iters=n_iters
        )
        history = [float(f) for f in np.asarray(fe_trace)]
        fe_val = history[-1]
    else:
        def fe_obj(theta):
            _, fe = gplvm_vmp(kernel, theta, Xu, Y, Xm, n_iters=n_iters)
            return fe

        theta, fe_val, history = nelder_mead(fe_obj, theta0, maxiter=nm_iters)
    hyperopt_s = time.time() - t0

    state, fe = gplvm_vmp(kernel, theta, Xu, Y, Xm, n_iters=30)
    Z = np.asarray(state.x_means)
    acc = knn_accuracy(Z, labels)
    acc_pca = knn_accuracy(mean_X, labels)
    if verbose:
        which = "gradient (EM, L-BFGS M-step)" if grad else "NelderMead"
        print(f"final FE = {float(fe):.3f} ({which} best {fe_val:.3f}, "
              f"{len(history)} evals/epochs)")
        print(f"latent 1-NN accuracy = {acc:.4f} (PCA init baseline: {acc_pca:.4f})")
        print(f"hyperopt wall: {hyperopt_s:.1f}s (reference: ~900 s)")
        print(f"optimal θ (softplus) = {np.asarray(softplus(jnp.asarray(theta)))} "
              f"(reference: [1.4136, 0.7675, 1.0215])")
    return {"fe": float(fe), "fe_hyperopt": fe_val, "knn_acc": acc,
            "knn_acc_pca": acc_pca, "theta": np.asarray(theta),
            "seconds": hyperopt_s, "latents": Z, "labels": labels}


if __name__ == "__main__":
    # the positional count drives whichever optimizer is active: gradient
    # epochs by default, NelderMead iterations under --nm
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    grad = "--nm" not in sys.argv
    n = int(args[0]) if args else None
    if grad:
        run(grad_epochs=n if n is not None else 25, grad=True)
    else:
        run(nm_iters=n if n is not None else 25, grad=False)
