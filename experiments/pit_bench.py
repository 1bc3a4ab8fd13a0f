"""Long-chain GPSSM smoothing benchmark: parallel-in-time vs Jacobi.

VERDICT r3 item 3 asked for the parallel-in-time MultiSGP chain engine
(infer/pit_gpssm.gpssm_vmp_pit: statistical linearization at the current
marginals + one associative-scan LGSSM smooth per sweep) to carry a TPU
measurement at T ≥ 8192 — the regime the reference's sequential message
passing (Pendulum_Wishart_2d.ipynb cells 12-16, T=300) cannot reach: the
Jacobi mean-field map moves information ~one chain step per sweep, so a cold
start needs O(correlation-length) sweeps while the PIT engine needs a
handful of O(log T)-depth sweeps.

For each T this script generates a pendulum draw at the reference's Δt
(utils/datasets.pendulum with max_time scaled), freezes θ at the learned
pendulum optimum, and measures

  - ``pit``:    gpssm_vmp_pit wall-clock to its fixed point (verified: an
                extra polish block moves FE < ``fp_tol``), FE, SMSE;
  - ``jacobi``: cold-start gpssm_vmp in warm-started 100-sweep chunks until
                its FE reaches the PIT fixed point (+``fe_tol`` nats) or the
                sweep cap, recording wall + sweeps (+ the residual FE gap if
                capped);
  - ``jacobi_sweep_ms``: steady-state per-sweep wall for the per-sweep rate
                comparison (one PIT sweep costs a few Jacobi sweeps; it
                replaces hundreds).

Rows are appended to the artifact after every T so a TPU-worker crash
preserves completed measurements (the pad-scale pattern,
experiments/legacy_gp.py). Run:

  python experiments/pit_bench.py --tpu            # device rows
  python experiments/pit_bench.py                  # CPU comparison rows
  python experiments/pit_bench.py --T=2048,8192 --out=...
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from gaussianprocessnode_tpu.dists import MvGaussianNat
from gaussianprocessnode_tpu.infer.chain_smoother import gpssm_vmp
from gaussianprocessnode_tpu.infer.pit_gpssm import gpssm_vmp_pit
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus
from gaussianprocessnode_tpu.utils.datasets import pendulum, pendulum_inducing
from gaussianprocessnode_tpu.utils.metrics import smse
from gaussianprocessnode_tpu.utils.profiling import block_via_host

OUT_DEFAULT = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "benchmarks", "pit_gpssm_r5.json",
)


def bench_one(T: int, *, n_pit: int = 6, n_polish: int = 30,
              jacobi_chunk: int = 100, sweep_cap: int = 4000,
              fe_tol: float = 1.0, fp_tol: float = 0.05, seed: int = 69,
              verbose: bool = True):
    # the reference pendulum's Δt = 7/699 ≈ 0.01; keep it as T grows
    x_true, y_obs, _, P, _ = pendulum(n=T, max_time=0.01 * (T - 1), seed=seed)
    ys = jnp.asarray(y_obs)
    P_j = jnp.asarray(P)
    Xu = jnp.asarray(pendulum_inducing())
    M, D = Xu.shape[0], 2
    kernel = Kernel("se", transform="softplus")
    # frozen at the learned pendulum optimum (experiments/pendulum.py):
    # the benchmark isolates the E-step engines, not hyperopt
    theta = invsoftplus(jnp.asarray([0.66, 2.27, 4.85]))
    prior_v = MvGaussianNat(jnp.zeros(M * D), jnp.eye(M * D) / 50.0)
    m0 = jnp.asarray(x_true[0])
    V0 = 0.1 * jnp.eye(2)

    def pit(init_state=None):
        return gpssm_vmp_pit(
            kernel, theta, Xu, ys, P_j, m0, V0, prior_v, 100.0, jnp.eye(2),
            n_pit=n_pit, n_polish=n_polish, init_state=init_state,
        )

    def jacobi(init_state=None, n_iters=jacobi_chunk):
        return gpssm_vmp(
            kernel, theta, Xu, ys, P_j, m0, V0, prior_v, 100.0, jnp.eye(2),
            n_iters=n_iters, compute_fe=True, init_state=init_state,
        )

    # --- PIT: compile pass, then the timed run -----------------------------
    state_w, fe_w = pit()
    block_via_host(fe_w)
    t0 = time.time()
    state_p, fe_p = pit()
    block_via_host(fe_p)
    pit_s = time.time() - t0
    fe_pit = float(fe_p)
    # fixed-point check: one more polish block must not move FE materially
    _, fe_pp = jacobi(init_state=state_p, n_iters=10)
    fp_resid = abs(float(fe_pp) - fe_pit)
    sm = [float(smse(x_true[:, d], np.asarray(state_p.x_means[1:, d])))
          for d in range(D)]
    if verbose:
        print(f"[T={T}] pit: {pit_s:.2f}s  FE={fe_pit:.2f}  "
              f"fixed-point resid={fp_resid:.3f}  SMSE={sm}", flush=True)

    # --- Jacobi: warm-started chunks until the PIT fixed point -------------
    # (compile pass on a throwaway cold chunk)
    st_c, fe_c = jacobi()
    block_via_host(fe_c)
    # NaN-robust target: if the PIT FE is non-finite (recorded as such, not
    # crashed — a device-precision failure IS a result), race Jacobi to its
    # own converged FE instead so the row still carries both engines
    target = fe_pit + fe_tol if np.isfinite(fe_pit) else -np.inf
    state_j, sweeps, jac_s = None, 0, 0.0
    fe_j, fe_prev = float("inf"), float("inf")
    # Stall exit: 2 consecutive chunks improving by ≤ fe_tol/10 (finite
    # target) or ≤ fe_tol (NaN-target race). A single float-noise FE uptick
    # near the target must NOT abort the race (advisor r4 finding #1).
    stall_tol = fe_tol / 10 if np.isfinite(fe_pit) else fe_tol
    stalled = 0
    while state_j is None or (sweeps < sweep_cap and fe_j > target
                              and stalled < 2):
        fe_prev = fe_j
        t0 = time.time()
        state_j, fe = jacobi(init_state=state_j)
        block_via_host(fe)
        jac_s += time.time() - t0
        sweeps += jacobi_chunk
        fe_j = float(fe)
        stalled = stalled + 1 if fe_prev - fe_j <= stall_tol else 0
        if verbose:
            print(f"[T={T}] jacobi: {sweeps} sweeps  FE={fe_j:.2f} "
                  f"(target {target:.2f})  {jac_s:.1f}s", flush=True)
    sm_j = [float(smse(x_true[:, d], np.asarray(state_j.x_means[1:, d])))
            for d in range(D)]

    # steady-state per-sweep rate (warm state: timing, not convergence)
    t0 = time.time()
    _, fe = jacobi(init_state=state_j, n_iters=10)
    block_via_host(fe)
    sweep_ms = (time.time() - t0) / 10 * 1e3

    def _f(x, nd):  # non-finite → None: the JSON stays valid and honest
        return round(x, nd) if np.isfinite(x) else None

    row = {
        "T": T,
        "pit_seconds": round(pit_s, 3),
        "pit_fe": _f(fe_pit, 3),
        "pit_fixed_point_resid_nats": _f(fp_resid, 4),
        "pit_smse": [_f(s, 6) for s in sm],
        "pit_sweeps": [n_pit, n_polish],
        "jacobi_seconds_to_pit_fe": round(jac_s, 3),
        "jacobi_sweeps": sweeps,
        "jacobi_fe": _f(fe_j, 3),
        "jacobi_fe_gap": _f(fe_j - fe_pit, 3),
        "jacobi_converged": bool(fe_j <= target),
        "jacobi_smse": [_f(s, 6) for s in sm_j],
        "jacobi_sweep_ms": round(sweep_ms, 2),
        "speedup_to_fixed_point": _f(jac_s / pit_s, 1),
    }
    return row


def child_one(T: int, row_out: str):
    """Run ONE T and write its row — the per-T subprocess body."""
    row = bench_one(T)
    row["backend"] = jax.default_backend()
    with open(row_out, "w") as f:
        json.dump(row, f)


def main():
    """Parent: one subprocess per T (the tpu_record isolation pattern —
    a dead TPU worker takes its process's backend with it, so an in-process
    loop loses every later T; the r5 first attempt lost T=8192/32768 to one
    tunnel-compile failure at T=8192). Crashed Ts get an error row with rc
    and stderr tail; completed rows merge per (backend, T)."""
    import subprocess

    Ts = [2048, 8192]
    out_path = OUT_DEFAULT
    attempts = 2
    for a in sys.argv[1:]:
        if a.startswith("--T="):
            Ts = [int(t) for t in a.split("=", 1)[1].split(",")]
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        elif a.startswith("--attempts="):
            attempts = int(a.split("=", 1)[1])
    on_tpu = "--tpu" in sys.argv
    backend = "tpu" if on_tpu else "cpu"
    artifact = {
        "workload": "pit_gpssm_long_chain",
        "theta_softplus": [0.66, 2.27, 4.85],
        "M": 48,
        "fe_tol_nats": 1.0,
        "rows": [],
    }
    if _os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        # keep rows from other backends / earlier partial runs
        artifact["rows"] = [r for r in prev.get("rows", [])
                            if r.get("backend") != backend
                            or r["T"] not in Ts]
    for T in Ts:
        row_out = f"/tmp/pit_row_{backend}_{T}.json"
        if _os.path.exists(row_out):
            _os.remove(row_out)
        cmd = [sys.executable, _os.path.abspath(__file__), f"--one-T={T}",
               f"--row-out={row_out}"]
        if on_tpu:
            cmd.append("--tpu")
        # budget: compile + PIT + the Jacobi race (the race dominates; it is
        # capped by sweep_cap chunks whose per-sweep cost grows with T)
        budget = 1200 + T // 4
        row = None
        for attempt in range(1, attempts + 1):
            t0 = time.time()
            err = {"T": T, "backend": backend, "attempt": attempt}
            try:
                p = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=budget)
                sys.stdout.write(p.stdout)
                sys.stdout.flush()
                err["returncode"] = p.returncode
                if p.returncode != 0:
                    lines = p.stderr.strip().splitlines() or ["?"]
                    err["stderr_tail"] = "\n".join(lines[-8:])[-900:]
            except subprocess.TimeoutExpired:
                err["returncode"] = None
                err["stderr_tail"] = f"parent timeout {budget}s"
            err["wall_seconds"] = round(time.time() - t0, 1)
            if _os.path.exists(row_out):
                with open(row_out) as f:
                    row = json.load(f)
                break
            print(f"[pit_bench] T={T} attempt {attempt} FAILED "
                  f"rc={err.get('returncode')} ({err['wall_seconds']}s)",
                  flush=True)
            row = {"error": "crashed", **err}
        artifact["rows"].append(row)
        artifact["rows"].sort(key=lambda r: (r.get("backend", ""), r["T"]))
        with open(out_path, "w") as f:  # crash-safe: persist after every T
            json.dump(artifact, f, indent=1)
        print(f"[pit_bench] wrote {out_path} ({len(artifact['rows'])} rows)",
              flush=True)


if __name__ == "__main__":
    _one = next((a for a in sys.argv[1:] if a.startswith("--one-T=")), None)
    if _one is not None:
        child_one(int(_one.split("=", 1)[1]),
                  next(a.split("=", 1)[1] for a in sys.argv
                       if a.startswith("--row-out=")))
    else:
        main()
