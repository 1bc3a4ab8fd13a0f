"""Pendulum GPSSM with Wishart process noise — Pendulum_Wishart_2d.ipynb.

Config (reference cells 4-17): 700 steps (300 train / 400 test), D=2 state,
M=48 structured inducing points, W ~ Wishart(1e2, I), P = 0.1·I observation
noise, 150 epochs × [VMP sweeps + an M-step on θ via the multivariate
backward-message objective], then a final smoothing and a 1-step-ahead
filtering loop on the test window. The M-step is L-BFGS by default (the
reference's 100 AdaMax steps crawl along the shallow FE valley in the second
lengthscale; pass use_lbfgs=False for the AdaMax schedule). The E-step uses
warm-started Jacobi sweeps (25/epoch ≈ the reference's 10 sequential sweeps).

Reference results (BASELINE.md): smoothing SMSE state-1 0.005455 / state-2
0.001077, θ* = [0.5653, 2.2883, 4.7517]; hyperopt wall-clock 1615 s (CPU
Julia). This experiment on the difficulty-matched draw (datasets.pendulum):
0.005474 / 0.001020 (state-2 beats the reference), θ = [0.66, 2.27, 4.85],
hyperopt 158 s on CPU.

Backend economics (all MEASURED): CPU f64 runs the hyperopt in ~158 s.
The r4 f64 device record was 1360 s (emulated f64 on tiny ops — DEVIATIONS
#28); the round-5 ``--f32 --tpu`` record collapses that to **211.5 s
hyperopt + 44.8 s smoothing** with SMSE [0.00528, 0.00104] — 7.6× the
reference's 1615 s ON THE CHIP and 6.4× the f64 device record
(benchmarks/pendulum_f32_tpu_r5.json; the f32-first mode of DEVIATIONS
#32 + the package-wide HIGHEST matmul precision, without which the same
program runs the same speed and diverges on bf16-pass error). CPU remains
the default backend by a now-narrow margin (158 vs 211 s). The round-3
"TPU worker crashed" datum was CONTENTION, not the workload: the axon TPU
plugin ignores JAX_PLATFORMS=cpu, so concurrent "CPU" test processes were
silently initializing the same chip and killed the worker mid-chunk
(tests/conftest.py forces the platform via jax.config instead; DEVIATIONS
#28). The epoch loop is chunked (``--tpu`` chunks at 25 epochs) and the
final smoothing runs as 6×25 warm-started sweeps so every device
execution stays inside the measured-safe dispatch class (DEVIATIONS #33).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# --sp[=N]: run the final smoothing SEQUENCE-PARALLEL over N virtual CPU
# devices (time-axis sharding, parallel/seq_parallel.py). The device count
# must be fixed via XLA_FLAGS before the backend initializes.
_SP = 0
for _a in _sys.argv[1:]:
    if _a == "--sp":
        _SP = 4  # 300 training steps shard evenly over 4 devices
    elif _a.startswith("--sp="):
        _SP = int(_a.split("=", 1)[1])
if _SP > 1:
    if 300 % _SP != 0:  # fail now, not after the ~3-min hyperopt: the
        # smoothing shards the fixed 300-step training chain
        raise SystemExit(
            f"--sp={_SP}: 300 training steps do not shard evenly over "
            f"{_SP} devices (use a divisor of 300, e.g. 2, 4, 6, 10)"
        )
    _os.environ["XLA_FLAGS"] = (
        _os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={_SP}"
    )

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
import optax

from gaussianprocessnode_tpu.dists import MvGaussianNat
from gaussianprocessnode_tpu.infer.chain_smoother import (
    GPSSMState,
    _qv_stats,
    gpssm_vmp,
    one_step_ahead,
)
from gaussianprocessnode_tpu.infer.training import lbfgs_solve
from gaussianprocessnode_tpu.objectives import neg_log_backwardmess_multi
from gaussianprocessnode_tpu.utils.profiling import block_via_host
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus, softplus
from gaussianprocessnode_tpu.ops.linalg import cholinv, sum_blocks_weighted, sym
from gaussianprocessnode_tpu.ops.quadrature import SphericalRadial
from gaussianprocessnode_tpu.utils.datasets import pendulum, pendulum_inducing
from gaussianprocessnode_tpu.utils.metrics import smse


def run(epochs: int = 150, n_iters: int = 25, adamax_steps: int = 100,
        fresh_estep: bool = False, use_lbfgs: bool = True,
        adamax_lr: float = 0.01, adamax_decay: float = 0.2,
        verbose: bool = True, sp_devices: int = 0,
        chunk: int | None = None, checkpoint_path: str | None = None,
        f32: bool = False):
    """``f32=True``: the f32-first device mode — every model input is cast
    to float32 so the whole alternation (cubature Ψ-statistics, moment
    matching, node energies, θ-gradients) runs native-f32 on the MXU
    instead of software-emulated f64 (the measured bound on this workload's
    device throughput, DEVIATIONS #28), while the chain smoother internally
    pins its condition-critical q(v) factorizations and FE logdets to f64
    (infer/chain_smoother._qv_stats). CPU-f64 equivalence is tested in
    tests/test_e2e.py::TestF32FirstMode."""
    x_state, y_obs, Q, P, dt = pendulum()
    n_train = 300
    mdt = jnp.float32 if f32 else jnp.float64
    y_train = jnp.asarray(y_obs[:n_train], mdt)
    y_test = jnp.asarray(y_obs[n_train:], mdt)
    x_true_train = x_state[:n_train]
    x_true_test = x_state[n_train:]

    Xu = jnp.asarray(pendulum_inducing(), mdt)  # (48, 2)
    M, D = Xu.shape[0], 2
    kernel = Kernel("se", transform="softplus")
    theta0 = invsoftplus(jnp.asarray([1.0, 1.0, 1.0], mdt))

    prior_v = MvGaussianNat(jnp.zeros(M * D, mdt), jnp.eye(M * D, dtype=mdt) / 50.0)
    prior_x0_mean = jnp.asarray([1.6, 0.0], mdt)
    prior_x0_cov = 0.1 * jnp.eye(2, dtype=mdt)
    P_j = jnp.asarray(P, mdt)
    sr = SphericalRadial()

    # AdaMax M-step (use_lbfgs=False only — the default L-BFGS path carries
    # no optimizer state). lr 0.01 > the reference's Flux default: the FE
    # valley along the second lengthscale is shallow (FE(θ₃): 481@2.0 →
    # 412@4.75, gradient tiny) and 0.002 crawls; 0.01 reaches the same
    # basin in ~150 epochs. Decay keeps the endpoint stable.
    optimizer = None
    if not use_lbfgs:
        lr = adamax_lr
        if adamax_decay != 1.0:
            lr = optax.exponential_decay(
                adamax_lr, transition_steps=epochs * adamax_steps,
                decay_rate=adamax_decay,
            )
        optimizer = optax.adamax(lr)

    def vmp(theta, init_state=None, compute_fe=True):
        return gpssm_vmp(
            kernel, theta, Xu, y_train, P_j, prior_x0_mean, prior_x0_cov,
            prior_v, 100.0, jnp.eye(2, dtype=mdt), n_iters=n_iters, compute_fe=compute_fe,
            init_state=init_state,
        )

    def hyper_objective(theta, y_means, qx_means, qx_covs, sumRv_W, mu_v, W):
        return neg_log_backwardmess_multi(
            theta, kernel=kernel, Xu=Xu, y_means=y_means, qx_means=qx_means,
            qx_covs=qx_covs, sumRv_W=sumRv_W, mu_v=mu_v, W=W, method=sr,
        )

    grad_fn = jax.grad(hyper_objective)

    def epoch_fn(carry, _):
        theta, opt_state, vmp_state = carry
        # fresh_estep replays the reference's schedule exactly: every epoch's
        # infer restarts from gp_initialization (cell 16); the warm-started
        # default converges the E-step further per epoch
        state, fe = vmp(theta, init_state=None if fresh_estep else vmp_state)
        # extract stats for the objective (reference cell 16) — through the
        # chain smoother's f64-internal q(v) solve, so the --f32 mode keeps
        # this one condition-critical factorization at full precision
        mu_v, cov_v = _qv_stats(state.xi_v, state.prec_v)
        Rv = cov_v + jnp.outer(mu_v, mu_v)
        W_bar = state.W_df * cholinv(sym(state.W_rate))
        sumRv_W = sum_blocks_weighted(Rv, W_bar, D, M)
        y_means = state.x_means[1:]
        qx_means = state.x_means[:-1]
        qx_covs = state.x_covs[:-1]

        if use_lbfgs:
            # L-BFGS M-step: the reference's 100 AdaMax steps crawl along the
            # shallow FE valley in the second lengthscale (FE(θ₃) drops 70
            # nats from 2.0 to 4.75 with a tiny gradient); a curvature-aware
            # step reaches the valley floor in a handful of epochs
            theta, _ = lbfgs_solve(
                lambda th: hyper_objective(
                    th, y_means, qx_means, qx_covs, sumRv_W, mu_v, W_bar
                ),
                theta, max_steps=adamax_steps // 4,
            )
        else:
            def adamax_step(c, _):
                th, os_ = c
                g = grad_fn(th, y_means, qx_means, qx_covs, sumRv_W, mu_v, W_bar)
                upd, os_ = optimizer.update(g, os_, th)
                return (optax.apply_updates(th, upd), os_), None

            (theta, opt_state), _ = jax.lax.scan(
                adamax_step, (theta, opt_state), None, length=adamax_steps
            )
        return (theta, opt_state, state), fe

    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("n",))
    def hyperopt_chunk(carry, n):
        # the alternation is a scanned program with no host round-trips; the
        # FE trace is a scan output (VMP state warm-starts across epochs,
        # seeded with the reference's fresh initialization). Chunked so
        # single on-device executions stay under the device-tunnel RPC
        # deadline (~2-3 min) — CPU runs use one chunk.
        return jax.lax.scan(epoch_fn, carry, None, length=n)

    T = y_train.shape[0]
    ydt = y_train.dtype  # NOT `dt` — that's the pendulum integration step
    state0 = GPSSMState(
        jnp.concatenate([prior_x0_mean[None, :], jnp.zeros((T, D), ydt)], 0),
        jnp.concatenate(
            [prior_x0_cov[None, :, :],
             jnp.tile(50.0 * jnp.eye(D, dtype=ydt), (T, 1, 1))], 0,
        ),
        prior_v.xi, prior_v.prec,
        jnp.asarray(100.0, ydt), jnp.eye(2, dtype=ydt),
    )
    if chunk is None:
        chunk = 25 if "--tpu" in sys.argv else epochs
    t0 = time.time()
    opt_state0 = optimizer.init(theta0) if optimizer is not None else ()
    carry = (theta0, opt_state0, state0)
    fe_all = np.zeros(epochs)
    done = 0
    device_s = 0.0
    # chunk-granular host checkpoint: a crashed/restarted process resumes
    # from the last completed chunk instead of epoch 0 — what turns a
    # transient TPU-worker crash into a retried chunk (VERDICT r3 item 1)
    ck = {"carry": carry, "done": np.zeros((), np.int64),
          "fe": fe_all, "device_seconds": np.zeros(())}
    if checkpoint_path and _os.path.exists(checkpoint_path):
        from gaussianprocessnode_tpu.utils.checkpoint import load_pytree

        ck = load_pytree(checkpoint_path, ck)
        carry = ck["carry"]
        done = int(ck["done"])
        fe_all = np.asarray(ck["fe"]).copy()
        device_s = float(ck["device_seconds"])
        if verbose and done:
            print(f"[resume] {done}/{epochs} epochs from {checkpoint_path}",
                  flush=True)
    while done < epochs:
        n = min(chunk, epochs - done)
        tc = time.time()
        carry, fe_c = hyperopt_chunk(carry, n)
        block_via_host(fe_c)
        device_s += time.time() - tc
        fe_all[done:done + n] = np.asarray(fe_c)
        done += n
        if checkpoint_path:
            from gaussianprocessnode_tpu.utils.checkpoint import save_pytree

            save_pytree(checkpoint_path, {
                "carry": carry, "done": np.asarray(done, np.int64),
                "fe": fe_all, "device_seconds": np.asarray(device_s),
            })
    theta, _, _ = carry
    hyperopt_s = time.time() - t0
    fe_trace = [float(f) for f in fe_all]
    if verbose:
        for ep in range(0, epochs, 25):
            print(f"epoch {ep:4d}  FE={fe_trace[ep]:.2f}", flush=True)
        print(f"epoch {epochs - 1:4d}  FE={fe_trace[-1]:.2f}  "
              f"θ={np.asarray(softplus(theta))}", flush=True)

    # final smoothing: the reference runs 30 sequential (reactive) sweeps
    # (cell 23). At the reference's recorded θ* both engines converge to its
    # recorded SMSE on a difficulty-matched draw (Jacobi needs ~100 sweeps,
    # Gauss–Seidel ~60); Jacobi is batched and faster, so run it to
    # convergence here. With --sp[=N] the same Jacobi sweeps run
    # SEQUENCE-PARALLEL: the 300-step time axis sharded over an N-device
    # mesh with ppermute neighbor halos (parallel/seq_parallel.py).
    if sp_devices > 1:
        from gaussianprocessnode_tpu.parallel.seq_parallel import (
            gpssm_vmp_sp,
            shard_chain_data,
        )
        from gaussianprocessnode_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(jax.devices()[:sp_devices], axis="sp")
        t_sm = time.time()
        state, fe = gpssm_vmp_sp(
            kernel, theta, Xu, shard_chain_data(mesh, y_train), P_j,
            prior_x0_mean, prior_x0_cov, prior_v, 100.0, jnp.eye(2, dtype=mdt),
            mesh=mesh, n_iters=150,
        )
        block_via_host(fe)
        smooth_s = time.time() - t_sm
    elif "--pit" in sys.argv:
        # parallel-in-time final smoothing (infer/pit_gpssm.py): SLR +
        # associative-scan LGSSM sweeps + exact Jacobi polish — same fixed
        # point, a fraction of the sweeps
        from gaussianprocessnode_tpu.infer.pit_gpssm import gpssm_vmp_pit

        t_sm = time.time()
        state, fe = gpssm_vmp_pit(
            kernel, theta, Xu, y_train, P_j, prior_x0_mean, prior_x0_cov,
            prior_v, 100.0, jnp.eye(2, dtype=mdt), n_pit=4, n_polish=30,
        )
        block_via_host(fe)
        smooth_s = time.time() - t_sm
    elif "--tpu" in sys.argv:
        # chunked warm-started smoothing (6 × 25 Jacobi sweeps ≡ one 150-sweep
        # call: the sweep is Markov in GPSSMState) — keeps each device
        # execution the size of one proven-safe hyperopt-chunk E-step instead
        # of one 150-iteration executable; the round-3/4 worker crashes all
        # happened on the largest single executions
        if verbose:
            print("[phase] final smoothing (chunked)", flush=True)
        t_sm = time.time()
        state = None
        for _ in range(6):
            state, fe = vmp(theta, init_state=state)
            block_via_host(fe)
        smooth_s = time.time() - t_sm
    else:
        t_sm = time.time()
        state, fe = gpssm_vmp(
            kernel, theta, Xu, y_train, P_j, prior_x0_mean, prior_x0_cov,
            prior_v, 100.0, jnp.eye(2, dtype=mdt), n_iters=150,
        )
        block_via_host(fe)
        smooth_s = time.time() - t_sm
    sm1 = float(smse(x_true_train[:, 0], np.asarray(state.x_means[1:, 0])))
    sm2 = float(smse(x_true_train[:, 1], np.asarray(state.x_means[1:, 1])))

    # Evaluation extras (1-step-ahead + the UT baseline) are metrics, not the
    # timed workload — under --tpu commit their inputs to the in-process CPU
    # backend (computation placement follows committed inputs) so the device
    # only ever runs the proven-chunked programs
    import contextlib
    if "--tpu" in sys.argv:
        if verbose:
            print("[phase] evaluation extras on host CPU", flush=True)
        _cpu = jax.devices("cpu")[0]

        def _put(t):
            return jax.tree_util.tree_map(
                lambda a: jax.device_put(np.asarray(a), _cpu), t)

        theta, state, y_test, P_j, Xu = map(
            _put, (theta, state, y_test, P_j, Xu))
        eval_ctx = jax.default_device(_cpu)
    else:
        eval_ctx = contextlib.nullcontext()
    with eval_ctx:
        # 1-step-ahead filtering on test window (reference cell 36)
        pred_means, pred_covs = one_step_ahead(
            kernel, theta, Xu, state, y_test, P_j)
        pr1 = float(smse(x_true_test[:, 0], np.asarray(pred_means[:, 0])))
        pr2 = float(smse(x_true_test[:, 1], np.asarray(pred_means[:, 1])))

        # UT smoother baseline with KNOWN dynamics (reference cells 26-27)
        from gaussianprocessnode_tpu.infer.ut_smoother import ut_smoother_vmp

        def transition(x):
            return jnp.stack(
                [x[0] + x[1] * dt, x[1] - 9.81 * jnp.sin(x[0]) * dt])

        # 150 Jacobi sweeps ≈ the converged fixed point of the reference's 30
        # sequential sweeps (Jacobi propagates along the chain more slowly).
        # The baseline always runs f64: it is a host-side evaluation metric,
        # not part of the timed --f32 device workload
        f64 = jnp.float64
        ut_state = ut_smoother_vmp(
            transition, y_train.astype(f64), P_j.astype(f64),
            prior_x0_mean.astype(f64), prior_x0_cov.astype(f64), 100.0,
            jnp.eye(2), n_iters=150,
        )
    ut1 = float(smse(x_true_train[:, 0], np.asarray(ut_state.x_means[1:, 0])))
    ut2 = float(smse(x_true_train[:, 1], np.asarray(ut_state.x_means[1:, 1])))

    if verbose:
        print(f"hyperopt wall: {hyperopt_s:.1f}s (reference: 1615 s)")
        print(f"smoothing SMSE: state1={sm1:.6f} (ref 0.005455), state2={sm2:.6f} (ref 0.001077)")
        print(f"UT baseline (known dynamics): state1={ut1:.6f} (ref 0.006313), "
              f"state2={ut2:.6f} (ref 0.000800)")
        print(f"1-step-ahead SMSE: state1={pr1:.6f}, state2={pr2:.6f}")
        print(f"optimal θ (softplus) = {np.asarray(softplus(theta))} (ref [0.5653, 2.2883, 4.7517])")
    return {
        "smse_smooth": (sm1, sm2),
        "smse_ut_baseline": (ut1, ut2),
        "smse_predict": (pr1, pr2),
        "fe_trace": fe_trace,
        "theta": np.asarray(theta),
        "hyperopt_seconds": hyperopt_s,
        "device_hyperopt_seconds": device_s,
        "smoothing_seconds": smooth_s,
    }


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kw = {}
    for a in sys.argv[1:]:
        if a.startswith("--ckpt="):
            kw["checkpoint_path"] = a.split("=", 1)[1]
        elif a.startswith("--chunk="):
            kw["chunk"] = int(a.split("=", 1)[1])
        elif a == "--f32":
            kw["f32"] = True
    if "--faithful" in sys.argv:
        # The reference's exact M-step schedule (Pendulum_Wishart_2d.ipynb
        # cells 16-17): Flux AdaMax default lr 0.002, constant, 100 steps per
        # epoch, E-step restarted fresh each epoch with 10 sequential sweeps
        # (25 warm Jacobi sweeps ≈ 10 sequential; fresh_estep replays the
        # restart). Bounds the deviation of the fast L-BFGS default by a
        # recorded number (VERDICT r2 item 8).
        res = run(epochs=int(args[0]) if args else 150, n_iters=25,
                  adamax_steps=100, fresh_estep=True, use_lbfgs=False,
                  adamax_lr=0.002, adamax_decay=1.0, sp_devices=_SP, **kw)
    else:
        res = run(epochs=int(args[0]) if args else 150, sp_devices=_SP, **kw)
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            # machine-readable record for the subprocess-isolated TPU
            # recorder (experiments/tpu_record.py)
            import json as _json

            payload = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                       for k, v in res.items()}
            payload["backend"] = jax.default_backend()
            payload["device"] = str(jax.devices()[0])
            with open(a.split("=", 1)[1], "w") as f:
                _json.dump(payload, f, indent=1)
