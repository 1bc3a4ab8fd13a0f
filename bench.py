"""Headline benchmark: kin40k sparse-GP training, time-to-SMSE vs reference.

Reference numbers (BASELINE.md):
- SGP node (Julia, CPU): SMSE 0.083431 in ~12,600 s (500 epochs).
- VSGP baseline (ApproximateGPs.jl): SMSE 0.087478 in ~18,000 s.

This bench trains the full kin40k workload (N=10k, M=600, minibatch 500,
w=1e4) on one TPU chip with the epoch-granular fast trainer
(f32 MXU Grams — through the Pallas SE kernel — + one f64 Newton–Schulz/
iterative-refinement statistics refresh per epoch) and reports the
on-device training wall-clock (cached executable; compile time excluded
and reported separately — a persistent compilation cache in
/root/repo/.jax_cache makes it ~seconds after the first-ever run).
``vs_baseline`` is the speedup over the reference SGP run at matched epoch
count scaling (reference: 25.2 s/epoch). Round-2 record: 25.7 s / 500
epochs at SMSE 0.0799 = 489×; round-3 record after the spectrum-scaled
Newton–Schulz refresh (28 iterations vs 45): 20.2 s at SMSE 0.0798 = 622×
(reference: 12,600 s, SMSE 0.0834).

Also emits (VERDICT r2 item 4):
- ``tflops`` / ``mfu``: model-FLOP rate of the training run from the
  documented per-epoch arithmetic (:func:`kin40k_fast_flops_per_epoch` —
  the SURVEY §6 "Gram+Chol TFLOP/s" north-star metric, with Newton–Schulz
  playing the chol role), MFU against the chip's 197 TFLOP/s bf16 peak;
- an on-device Pallas-vs-XLA Gram check (f32-exactness ENFORCED via
  ``pallas_ok`` + timings) and the f64 NS-matmul rate at the refresh shape —
  the data that retires SURVEY §7.4's pallas/chol.py plan (see COVERAGE.md):
  the hot op is an f64 matmul chain, and Mosaic has no f64 MXU path to beat
  XLA's with.

Round-4 additions (VERDICT r3 item 4):
- ``f64_peak_tflops_600`` / ``f32_peak_tflops_600``: MEASURED matmul peaks on
  this chip at the program's own 600×600 shape (chained jitted matmuls), so
  ``ns_f64_peak_frac`` states what fraction of the achievable f64 rate the
  Newton–Schulz refresh actually runs at — the roofline behind the MFU prose;
- ``component_ms``: per-epoch device-time split (f32 Gram / f64 nat-param
  matmuls / f64 NS refresh / IR solve / 20 θ-grad steps) measured at the
  headline shapes, with the residual vs the real per-epoch wall;
- workload subcommands re-running the other recorded headlines so every
  number has a harness:  ``python bench.py banana|pendulum|gplvm``.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup, ...}
"""

import json
import os
import subprocess
import sys
import time

EPOCHS = 500
REF_SECONDS_PER_EPOCH = 12600.0 / 500.0  # Julia reference wall-clock rate
REF_SMSE_SGP = 0.083431
REF_SMSE_VSGP = 0.087478
PEAK_BF16_TFLOPS = 197.0  # TPU v5e chip peak (bf16 MXU), the MFU denominator


def kin40k_fast_flops_per_epoch(M=600, N=10_000, B=20, Din=8,
                                refresh_ns_iters=None, obj_ns_iters=12):
    """Model matmul-FLOPs per epoch of fit_kin40k_fast (stats_refreshes=1).

    Counts 2mnk per (m,k)×(k,n) matmul; elementwise work is O(MN) and
    ignored. Newton–Schulz is 2 M×M matmuls per iteration (ops/linalg.py
    ``spd_inverse_ns.step``: R = I − AX, Xn = X + XR) = 4M³/iter, plus one
    warm-start residual check (2M³). The θ-objective's backward pass costs
    ~2 matmuls per forward matmul except the NS inverse, whose custom VJP
    (Ā = −XᵀḡXᵀ) is 2 matmuls total.
    """
    if refresh_ns_iters is None:  # track the trainer's actual default
        from gaussianprocessnode_tpu.infer.minibatch import (
            REFRESH_NS_ITERS_SCALED,
        )
        refresh_ns_iters = REFRESH_NS_ITERS_SCALED
    b = N // B
    m3 = float(M) ** 3
    gram_grand = 2.0 * M * N * Din  # sqdist cross-term of the M×N Gram
    nat_update = 2.0 * M * M * N + 2.0 * M * N  # Λ += w·KKᵀ (f64) and ξ += w·Ky
    refresh = (refresh_ns_iters * 4.0 + 2.0) * m3  # f64 NS + warm residual
    # per θ-step (×B): objective forward
    obj_fwd = (
        (obj_ns_iters * 4.0 + 2.0) * m3     # Kuu⁻¹ by NS + warm residual
        + 2.0 * M * M * Din                 # Kuu
        + 2.0 * M * b * Din                 # Kux
        + 2.0 * M * M * b                   # S = Kux Kuxᵀ
        + 2.0 * M * b                       # Kuxᵀ μ_v
    )
    # backward: ≈2 matmuls per forward matmul for the Gram/S/Kuu chain,
    # 2 matmuls (4M³) for the NS custom VJP
    obj_bwd = 2.0 * (obj_fwd - (obj_ns_iters * 4.0 + 2.0) * m3) + 4.0 * m3
    return gram_grand + nat_update + refresh + B * (obj_fwd + obj_bwd)


CACHE_DIR = "/root/repo/.jax_cache"


def _cache_entries():
    return set(os.listdir(CACHE_DIR)) if os.path.isdir(CACHE_DIR) else set()


def main():
    from experiments.kin40k import run  # seeds .jax_cache from the shipped
    #                                     AOT executables at import

    cache_pre = _cache_entries()
    flops_epoch = kin40k_fast_flops_per_epoch()
    flops_total = flops_epoch * EPOCHS
    # physical lower bound on the device time: the f64 Newton–Schulz refresh
    # alone is (iters·4+2)·600³ FLOP/epoch of f64 matmuls, and this chip's
    # measured f64 emulation ceiling is ~1.05-1.2 TFLOP/s (ns_f64_tflops
    # below; Mosaic has no f64 MXU path). Even at a ~3× generous 3 TFLOP/s
    # the 500-epoch run cannot finish under ~4 s — which catches DEVIATIONS
    # #6a's observed anomaly (2.9 s reported for a 27 s run) that the old
    # `< 1.0 s` guard and an all-FLOPs/bf16-peak floor both missed (ADVICE r2)
    from gaussianprocessnode_tpu.infer.minibatch import REFRESH_NS_ITERS_SCALED

    f64_ns_flops_total = (REFRESH_NS_ITERS_SCALED * 4.0 + 2.0) * 600.0 ** 3 * EPOCHS
    min_plausible_s = f64_ns_flops_total / 3e12

    def timed_run():
        t0 = time.time()
        r = run(epochs=EPOCHS, warm_timing=True, verbose=False)
        r["_total"] = time.time() - t0
        return r

    result = timed_run()
    # AOT-cache staleness self-report (VERDICT r4 item 3): the round-3
    # "fresh-clone compile ~7 s" headline silently died when r4 code edits
    # moved the program keys and every run re-paid 600-1300 s of compile.
    # Any cache entry WRITTEN during the training run means the shipped
    # executables missed — the JSON now says so instead of leaving it to
    # be inferred from compile_seconds.
    train_compiled = sorted(_cache_entries() - cache_pre)
    remeasures = 0
    while result["seconds"] < min_plausible_s and remeasures < 3:
        # timing anomaly (degraded tunnel satisfying blocks early): the warm
        # wall-clock is below the FLOP-derived floor. Re-measure with fresh
        # runs; fail loudly if it never becomes plausible.
        remeasures += 1
        result = timed_run()
    if result["seconds"] < min_plausible_s:
        print(json.dumps({
            "metric": "kin40k_train_wallclock_500epochs",
            "error": "timing_anomaly_unresolved",
            "value": round(result["seconds"], 3),
            "min_plausible_seconds": round(min_plausible_s, 3),
        }))
        raise SystemExit(1)
    # compile/trace/cache-load cost: attributed from the first/warm split of
    # the run that was actually KEPT; on a remeasure that split carries no
    # compile signal (the executables are already compiled), so report null
    # rather than a misattributed near-zero (ADVICE r2). setup is computed
    # from the kept run's own wall-clock, so a discarded anomalous run's
    # cold train never leaks into it.
    compile_s = None if remeasures else result["first_seconds"] - result["seconds"]
    setup_s = result["_total"] - result["first_seconds"] - result["seconds"]

    seconds = result["seconds"]
    speedup = REF_SECONDS_PER_EPOCH * EPOCHS / seconds
    tflops = flops_total / seconds / 1e12
    out = {
        "metric": "kin40k_train_wallclock_500epochs",
        "value": round(seconds, 3),
        "unit": "s",
        "vs_baseline": round(speedup, 1),
        "smse": round(result["smse"], 6),
        "ref_smse_sgp": REF_SMSE_SGP,
        "ref_smse_vsgp": REF_SMSE_VSGP,
        "smse_vs_vsgp_baseline": round(result["smse"] / REF_SMSE_VSGP, 4),
        "compile_seconds": None if compile_s is None else round(compile_s, 1),
        "setup_seconds": round(setup_s, 1),  # data load + posterior recovery + SMSE eval
        "epochs": EPOCHS,
        "remeasures": remeasures,
        # SURVEY §6 north-star metric: model-FLOP rate + MFU
        "model_flops_per_epoch": flops_epoch,
        "tflops": round(tflops, 3),
        "mfu": round(tflops / PEAK_BF16_TFLOPS, 5),
        "mfu_note": "model matmul-FLOPs / 197 TFLOP/s bf16 peak; the run is "
                    "dominated by f64 NS matmuls (no bf16 path) and M=600 "
                    "tiles, so low MFU is the workload, not the schedule",
        "device": _device_name(),
        # DEVIATIONS #20 / VERDICT r3 weak 7: this field is first-run minus
        # warm-run wall, which on this tunneled backend is dominated by
        # backend first-execution finalization (cache loads, program
        # transfer), not XLA compile time proper
        "compile_seconds_semantics": "first_run_minus_warm_run_overhead",
        "aot_cache": {
            # hit=False ⇒ the committed benchmarks/aot_cache set is stale
            # for this code/backend: re-harvest per utils/aot_cache.py
            "hit": len(train_compiled) == 0,
            "training_path_entries_compiled": len(train_compiled),
            "compiled_names": [n.split("-")[0] for n in train_compiled][:8],
        },
    }
    out.update(_pallas_check())
    out.update(_ns_refresh_rate())
    out.update(_roofline(seconds / EPOCHS))
    if "ns_f64_tflops" in out and "f64_peak_tflops_600" in out:
        # the roofline statement: the hot f64 op runs at this fraction of the
        # chip's MEASURED f64 matmul rate at its own shape
        out["ns_f64_peak_frac"] = round(
            out["ns_f64_tflops"] / out["f64_peak_tflops_600"], 3)
        out["roofline_note"] = (
            "ns_f64_tflops is model-FLOPs/wall; frac ≥ 1 means the NS "
            "refresh sustains at least the measured bare chained-matmul "
            "f64 rate at its own 600×600 shape — it runs AT the chip's "
            "f64 ceiling, so the workload's low MFU is the f64 emulation "
            "bound, not the schedule")
    print(json.dumps(out))


def _pallas_check(n_timing: int = 30):
    """On-device Pallas-vs-XLA Gram check at the headline shape (600×10000
    ARD-8): f32-exactness (max |diff|, expected ≤ ~3e-6 = f32 round-off of
    the tile-reduction order; ENFORCED via pallas_ok) and per-call timings.
    Runs on whatever backend bench runs on — on TPU this exercises the real
    Mosaic kernel."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussianprocessnode_tpu.ops.kernels import se_gram
    from gaussianprocessnode_tpu.ops.pallas_gram import se_gram_pallas

    rng = np.random.default_rng(0)
    with jax.enable_x64(False):
        Z = jnp.asarray(rng.standard_normal((600, 8)), jnp.float32)
        X = jnp.asarray(rng.standard_normal((10000, 8)), jnp.float32)
        ls = jnp.asarray(np.abs(rng.standard_normal(8)) + 0.5, jnp.float32)
        var = jnp.asarray(1.3, jnp.float32)
        on_tpu = jax.default_backend() == "tpu"
        pal = jax.jit(lambda: se_gram_pallas(Z, X, var, ls)) if on_tpu else None
        xla = jax.jit(lambda: se_gram(Z, X, var, ls))
        k_ref = xla()
        jax.block_until_ready(k_ref)
        if not on_tpu:
            return {"pallas_checked": False}
        k_pal = pal()
        jax.block_until_ready(k_pal)
        diff = float(jnp.max(jnp.abs(k_pal - k_ref)))
        ok = diff <= 1e-5
        if not ok:
            print(f"WARNING: pallas-vs-XLA Gram diverged: max|diff|={diff:.3e} "
                  "> 1e-5 — the f32-exactness claim does NOT hold on this "
                  "device", file=sys.stderr)

        return {
            "pallas_checked": True,
            "pallas_ok": ok,
            "pallas_max_abs_diff": diff,
            "pallas_gram_ms": round(_clock(pal, n_timing), 3),
            "xla_gram_ms": round(_clock(xla, n_timing), 3),
        }


def _ns_refresh_rate(n_timing: int = 10):
    """Achieved f64 matmul rate of the Newton–Schulz refresh shape (45 iters
    at 600×600) on this device — the measurement behind retiring SURVEY
    §7.4's pallas/chol.py plan: the trainer's hot op is this f64 chain, and
    Pallas/Mosaic has no f64 MXU path, so XLA's rate IS the ceiling."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "tpu":
        return {}
    from gaussianprocessnode_tpu.ops.linalg import spd_inverse_ns

    rng = np.random.default_rng(1)
    M, iters = 600, 45
    Q = jnp.asarray(rng.standard_normal((M, M)))
    A = Q @ Q.T + 600.0 * jnp.eye(M)
    if A.dtype != jnp.float64:
        return {}  # x64 disabled; the refresh measurement needs f64
    fn = jax.jit(lambda: spd_inverse_ns(A, iters=iters))
    ms = _clock(fn, n_timing)
    flops = (iters * 4.0 + 0.0) * float(M) ** 3
    return {
        "ns_f64_refresh_ms": round(ms, 3),
        "ns_f64_tflops": round(flops / (ms / 1e3) / 1e12, 3),
    }


def _roofline(epoch_seconds, n_timing: int = 10):
    """Measured matmul peaks at the program's own shapes + a per-component
    device-time split of one training epoch (VERDICT r3 item 4).

    Peaks are sustained rates of a CHAINED jitted matmul loop (orthogonal
    factor, so values stay bounded) at 600×600 — the NS refresh's shape — in
    f64 and f32 (HIGHEST precision, the trainer's contraction mode). The
    component split re-times exactly the fast trainer's per-epoch ops
    (fit_kin40k_fast, groups=1) at the headline shapes: one f32 Gram
    (600×10000), the f64 natural-parameter matmuls (K y, K Kᵀ), the scaled
    f64 Newton–Schulz refresh, the 2-round IR solve, and the 20 scanned
    AdaMax θ-steps.

    Each component is timed INSIDE one jitted ``fori_loop`` of ``_LOOP_K``
    data-dependent repetitions (a 1e-30-scaled carry feeds every iteration,
    blocking loop-invariant hoisting/CSE), so the per-dispatch latency is
    amortized exactly as the real trainer's 100-epoch device scan amortizes
    it — the r4 split paid a dispatch PER COMPONENT CALL and summed to
    ~140% of the epoch (VERDICT r4 weak #5); this one must sum to ≈ the
    epoch wall, with ``unaccounted_ms`` the genuine residual (scan
    bookkeeping + inter-op gaps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if (jax.default_backend() != "tpu"
            and not os.environ.get("GPN_BENCH_ROOFLINE_ANY")):
        return {}  # env override: smoke-test the measurement code off-TPU
    import optax

    from gaussianprocessnode_tpu.infer.minibatch import REFRESH_NS_ITERS_SCALED
    from gaussianprocessnode_tpu.objectives import neg_log_backwardmess_gram
    from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus
    from gaussianprocessnode_tpu.ops.linalg import (
        gershgorin_lambda_min,
        ir_solve,
        spd_inverse,
        sym,
    )

    hi = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(2)
    M, N, B, Din = 600, 10_000, 20, 8
    w = 1e4

    def peak_tflops(dtype, chain):
        A = jnp.asarray(np.linalg.qr(rng.standard_normal((M, M)))[0], dtype)
        X0 = jnp.asarray(np.linalg.qr(rng.standard_normal((M, M)))[0], dtype)
        fn = jax.jit(lambda: jax.lax.fori_loop(
            0, chain, lambda _, X: jnp.matmul(X, A, precision=hi), X0))
        ms = _clock(fn, n_timing)
        return chain * 2.0 * float(M) ** 3 / (ms / 1e3) / 1e12

    f64_peak = peak_tflops(jnp.float64, 64)
    f32_peak = peak_tflops(jnp.float32, 512)

    # --- component split: the fast trainer's per-epoch ops ----------------
    kernel = Kernel("se", transform="softplus", use_pallas=True)
    th32 = invsoftplus(jnp.ones(Din + 1, jnp.float32))
    Xu = jnp.asarray(rng.standard_normal((M, Din)), jnp.float32)
    Xg = jnp.asarray(rng.standard_normal((N, Din)), jnp.float32)
    y64 = jnp.asarray(rng.standard_normal(N))

    # amortization depth: 30 on the device; 2 in the CPU smoke path (the
    # f64 NS/θ loops are minutes-per-call on the host at K=30)
    LOOP_K = 30 if jax.default_backend() == "tpu" else 2

    def loop_ms(body, init, *args):
        """Per-iteration ms of `body(c, *args)` amortized inside ONE jitted
        fori_loop (the r4 per-call timings paid a dispatch per component
        and summed to 140% of the epoch). Two traps this shape avoids:
        `body` must thread a scalar carry with a REAL data dependence into
        every expensive op (else XLA hoists the loop-invariant work), and
        the big operands must be JIT ARGUMENTS (a closed-over array is a
        jaxpr constant and the whole loop constant-folds at compile time)."""
        jfn = jax.jit(lambda *a: jax.lax.fori_loop(
            0, LOOP_K, lambda i, c: body(c, *a), init))
        return _clock(lambda: jfn(*args), 3, warmup=2) / LOOP_K

    eps = jnp.asarray(1e-30, jnp.float32)

    def gram_body(c, th_, Xu_, Xg_):
        K = kernel(th_ + c * eps, Xu_, Xg_)
        return K[0, 0] * eps

    gram_ms = loop_ms(gram_body, jnp.asarray(0.0, jnp.float32), th32, Xu, Xg)
    K64 = kernel(th32, Xu, Xg).astype(jnp.float64)

    eps64 = jnp.asarray(1e-30)

    def nat_body(c, K_, y_):
        Kc = K_ + c * eps64  # carry-taint: blocks hoisting the K Kᵀ GEMM
        xi_ = jnp.matmul(Kc, y_ + c * eps64, precision=hi)
        prec_ = sym(jnp.matmul(Kc, Kc.T, precision=hi))
        return xi_[0] * eps64 + prec_[0, 0] * eps64

    nat_ms = loop_ms(nat_body, jnp.asarray(0.0), K64, y64)
    xi = w * jnp.matmul(K64, y64, precision=hi)
    prec = sym(jnp.eye(M) / 50.0
               + w * sym(jnp.matmul(K64, K64.T, precision=hi)))

    lam = gershgorin_lambda_min(jnp.eye(M) / 50.0)

    def ns_body(c, prec_):
        cov_ = spd_inverse(prec_ + c * eps64 * jnp.eye(M),
                           iters=REFRESH_NS_ITERS_SCALED, lambda_min=lam)
        return cov_[0, 0] * eps64

    ns_ms = loop_ms(ns_body, jnp.asarray(0.0), prec)
    cov64 = spd_inverse(prec, iters=REFRESH_NS_ITERS_SCALED, lambda_min=lam)

    def ir_body(c, prec_, xi_, cov_):
        mu_ = ir_solve(prec_, xi_ + c * eps64, cov_, rounds=2)
        return mu_[0] * eps64

    ir_ms = loop_ms(ir_body, jnp.asarray(0.0), prec, xi, cov64)
    mu64 = ir_solve(prec, xi, cov64, rounds=2)

    mu_v = mu64.astype(jnp.float32)
    Rv = (cov64 + jnp.outer(mu64, mu64)).astype(jnp.float32)
    Xb = Xg.reshape(B, N // B, Din)
    yb = y64.astype(jnp.float32).reshape(B, N // B)
    opt = optax.adamax(1e-3)

    def objective(th, Xb_, yb_, kw):
        return neg_log_backwardmess_gram(
            th, kernel=kernel, Xu=Xu, X=Xb_, y=yb_, mu_v=mu_v, Rv=Rv, w=w,
            kuu_inv_warm=kw, ns_iters=12)

    grad_fn = jax.grad(objective, has_aux=True)
    _, kw0 = objective(th32, Xb[0], yb[0], None)  # cold warm-start inverse

    def step(c, batch):
        th, st, kw = c
        g, kw = grad_fn(th, batch[0], batch[1], kw)
        up, st = opt.update(g, st, th)
        return (optax.apply_updates(th, up), st, kw), None

    # the θ epoch is ALREADY a 20-step scan with real data dependence —
    # loop it as epochs (carry threads through), same amortization; the
    # batches/carry enter as jit arguments (constant-folding trap above)
    th_jfn = jax.jit(lambda c0, Xb_, yb_: jax.lax.fori_loop(
        0, LOOP_K, lambda i, c: jax.lax.scan(step, c, (Xb_, yb_))[0], c0)[0])
    c0 = (th32, opt.init(th32), kw0)
    th_ms = _clock(lambda: th_jfn(c0, Xb, yb), 3, warmup=2) / LOOP_K

    accounted = gram_ms + nat_ms + ns_ms + ir_ms + th_ms
    epoch_ms = epoch_seconds * 1e3
    return {
        "f64_peak_tflops_600": round(f64_peak, 3),
        "f32_peak_tflops_600": round(f32_peak, 2),
        "component_ms": {
            "gram_f32": round(gram_ms, 3),
            "nat_update_f64": round(nat_ms, 3),
            "ns_refresh_f64": round(ns_ms, 3),
            "ir_solve": round(ir_ms, 3),
            "theta_steps_f32_x20": round(th_ms, 3),
        },
        "component_timing": "fori_loop-amortized (K=30, data-dependent "
                            "carry), dispatch excluded — sums to ≈epoch_ms",
        "epoch_ms": round(epoch_ms, 3),
        "accounted_ms": round(accounted, 3),
        "unaccounted_ms": round(epoch_ms - accounted, 3),
    }


def _clock(fn, n_timing, warmup: int = 40):
    """Per-call milliseconds at steady state; guards against early-returning
    blocks by materializing a scalar to the host after the timed loop.

    ``warmup`` is deliberately large: the first ~30 executions of a Mosaic
    (Pallas) kernel through this tunnel each pay a loading penalty (measured:
    45 ms/call in the first 30-call window decaying to 1.4-2.0 ms steady
    state), so a 2-call warmup publishes the transient, not the kernel."""
    from gaussianprocessnode_tpu.utils.profiling import block_via_host

    for _ in range(warmup):
        out = fn()
    block_via_host(out)
    t0 = time.time()
    for _ in range(n_timing):
        out = fn()
    # host materialization: a device→host copy cannot return early even on a
    # degraded tunnel (DEVIATIONS #6a)
    block_via_host(out)
    return (time.time() - t0) / n_timing * 1000.0


def _device_name():
    import jax

    try:
        return str(jax.devices()[0])
    except Exception:
        return "unknown"


# --- workload subcommands: re-run harness for the other recorded headlines.
# Each runs the experiment CLI in a SUBPROCESS on its headline backend
# (banana: TPU warm like kin40k; pendulum: CPU --sp — the measured backend
# choice, DEVIATIONS #28: the tiny M=48/D=2/T=300 chain is dispatch-bound at
# ~10% of CPU throughput on the tunneled chip; gplvm: CPU gradient-EM — same
# measured choice, benchmarks/gplvm_tpu_r4.json) and prints ONE JSON line in
# the same schema as the kin40k headline.
_WORKLOADS = {
    "banana": {
        "metric": "banana_train_wallclock_500epochs",
        "args": ["experiments/banana.py", "500", "--tpu", "--warm"],
        "ref_seconds": 2965.76,  # classification_banana.ipynb cell 10
        "seconds_key": "seconds",
        "fields": lambda r: {
            "errors": r["errors"],
            "error_rate": round(r["error_rate"], 5),
            "ref_errors": 125, "ref_error_rate": 0.09615,
        },
        "timeout": 2400,
    },
    "pendulum": {
        "metric": "pendulum_hyperopt_wallclock_150epochs",
        "args": ["experiments/pendulum.py", "150", "--sp"],
        "ref_seconds": 1615.25,  # Pendulum_Wishart_2d.ipynb cell 17
        "seconds_key": "hyperopt_seconds",
        "fields": lambda r: {
            "smse_smooth": r["smse_smooth"],
            "ref_smse_smooth": [0.005455, 0.001077],
            "smoothing_seconds": round(r["smoothing_seconds"], 1),
        },
        "timeout": 2400,
    },
    "gplvm": {
        "metric": "gplvm_hyperopt_wallclock_25epochs",
        "args": ["experiments/gplvm.py", "25"],
        "ref_seconds": 900.0,  # GPLVM.ipynb cell 17 comment
        "seconds_key": "seconds",
        "fields": lambda r: {
            "fe": round(r["fe"], 3),
            "knn_acc": round(r["knn_acc"], 4),
        },
        "timeout": 2400,
    },
}


def run_workload(name: str):
    cfg = _WORKLOADS[name]
    res_path = f"/tmp/bench_{name}_result.json"
    if os.path.exists(res_path):
        os.remove(res_path)
    repo = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(repo, cfg["args"][0]),
           *cfg["args"][1:], f"--json={res_path}"]
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=repo,
                       timeout=cfg["timeout"])
    if p.returncode != 0 or not os.path.exists(res_path):
        tail = "\n".join(p.stderr.strip().splitlines()[-8:])[-800:]
        print(json.dumps({"metric": cfg["metric"], "error": "run_failed",
                          "returncode": p.returncode, "stderr_tail": tail}))
        raise SystemExit(1)
    with open(res_path) as f:
        r = json.load(f)
    seconds = r[cfg["seconds_key"]]
    out = {
        "metric": cfg["metric"],
        "value": round(seconds, 3),
        "unit": "s",
        "vs_baseline": round(cfg["ref_seconds"] / seconds, 1),
        "backend": r.get("backend"),
        "device": r.get("device"),
    }
    out.update(cfg["fields"](r))
    print(json.dumps(out))


if __name__ == "__main__":
    _wl = next((a for a in sys.argv[1:] if not a.startswith("-")), None)
    if _wl is not None:
        if _wl not in _WORKLOADS:
            print(f"unknown workload {_wl!r}; choose from "
                  f"{sorted(_WORKLOADS)} (no argument = kin40k headline)",
                  file=sys.stderr)
            raise SystemExit(2)
        run_workload(_wl)
    else:
        sys.argv.append("--tpu")  # run on the real device, not forced CPU
        main()
