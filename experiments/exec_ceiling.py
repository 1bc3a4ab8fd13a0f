"""Pin the tunneled worker's per-execution duration ceiling with a reproducer.

DEVIATIONS #30 inferred a single-dispatch ceiling "somewhere in (227, ~420] s"
from three crashes of ONE workload (GPLVM chunk=5) — folklore that now sets
chunking policy for every long on-device run (VERDICT r4 weak #3). This
harness measures it directly: a dummy jitted `fori_loop` of 600×600 matmuls
(constant memory, one executable — the trip count is a TRACED argument, so
every probe reuses the same compiled program through the persistent cache)
is run in a child process per probe, growing the single-dispatch duration
until the worker dies, then bisecting to ±~10% resolution. A crash repeat
distinguishes a hard ceiling from a flake, and f32 probes at matched
durations (~20× the op count and FLOPs of f64 at this shape) separate a
DURATION ceiling from an op-count/FLOP one.

Run (exclusive chip hold):  python experiments/exec_ceiling.py --tpu
Writes benchmarks/exec_ceiling_r5.json after EVERY probe (crash-safe).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(REPO, "benchmarks", "exec_ceiling_r5.json")

M = 600
# measured chained-matmul rates at 600×600 (BENCH_r04 roofline)
RATE_TFLOPS = {"f64": 1.05, "f32": 20.0}
FLOP_PER_MM = 2.0 * M ** 3


def iters_for_seconds(seconds: float, dtype: str) -> int:
    return max(1, int(seconds * RATE_TFLOPS[dtype] * 1e12 / FLOP_PER_MM))


def child(iters: int, dtype: str):
    """One probe: ONE jitted dispatch of `iters` chained matmuls."""
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from gaussianprocessnode_tpu.utils.profiling import block_via_host

    dt = jnp.float64 if dtype == "f64" else jnp.float32
    hi = jax.lax.Precision.HIGHEST
    A = jnp.asarray(np.linalg.qr(
        np.random.default_rng(0).standard_normal((M, M)))[0], dt)

    @jax.jit
    def run(n, X):
        return jax.lax.fori_loop(
            0, n, lambda _, Y: jnp.matmul(Y, A, precision=hi), X)

    # warm the executable with a tiny trip count (same trace: n is traced)
    block_via_host(run(jnp.int32(2), A))
    t0 = time.time()
    out = run(jnp.int32(iters), A)
    block_via_host(out)
    dt_s = time.time() - t0
    print(json.dumps({"child_seconds": round(dt_s, 1),
                      "finite": bool(np.isfinite(np.asarray(out[0, 0])))}),
          flush=True)


def probe(target_s: float, dtype: str, log: list, timeout_extra: float = 420.0):
    """Run one child probe; append the outcome row to `log`; return it."""
    iters = iters_for_seconds(target_s, dtype)
    cmd = [sys.executable, os.path.abspath(__file__), "--one-probe",
           f"--iters={iters}", f"--dtype={dtype}"]
    if "--cpu" in sys.argv:
        cmd.append("--cpu")
    row = {"dtype": dtype, "target_seconds": round(target_s, 1),
           "iters": iters}
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=target_s + timeout_extra)
        row["returncode"] = p.returncode
        for line in p.stdout.strip().splitlines():
            if line.startswith("{"):
                row.update(json.loads(line))
        if p.returncode != 0:
            lines = (p.stderr.strip().splitlines() or ["?"])
            row["stderr_tail"] = "\n".join(lines[-8:])[-900:]
    except subprocess.TimeoutExpired:
        row["returncode"] = None
        row["stderr_tail"] = f"parent timeout after {target_s + timeout_extra:.0f}s"
    row["wall_seconds"] = round(time.time() - t0, 1)
    row["ok"] = row.get("returncode") == 0 and "child_seconds" in row
    log.append(row)
    _persist(log)
    print(f"[probe] {dtype} target={target_s:.0f}s iters={iters}: "
          f"{'OK ' + str(row.get('child_seconds')) + 's' if row['ok'] else 'CRASH rc=' + str(row.get('returncode'))}",
          flush=True)
    return row


def _persist(log):
    with open(OUT, "w") as f:
        json.dump({
            "description": (
                "Per-execution duration-ceiling reproducer: one jitted "
                "fori_loop of 600x600 chained matmuls per child process "
                "(constant memory; traced trip count, one executable). "
                "Replaces DEVIATIONS #30's '(227, ~420] s' inference from "
                "3 GPLVM crashes. f32 probes at matched DURATION carry "
                "~20x the f64 op count, separating a duration ceiling "
                "from an op-count one."),
            "matmul_shape": M,
            "probes": log,
        }, f, indent=1)


def main():
    log = []
    # --- f64 ladder: grow until crash or the 720 s cap -------------------
    ladder = [120.0, 240.0, 390.0, 540.0, 720.0]
    last_good, first_bad = 0.0, None
    for t in ladder:
        row = probe(t, "f64", log)
        if row["ok"]:
            last_good = max(last_good, row.get("child_seconds", t))
        else:
            first_bad = t
            break
    # --- bisect to ~10% resolution (absolute floor 30 s + probe cap so a
    # systematically-crashing child can never loop forever) ---------------
    bisects = 0
    while (first_bad is not None and bisects < 6
           and first_bad - last_good > max(30.0, 0.15 * first_bad)):
        bisects += 1
        mid = 0.5 * (last_good + first_bad)
        row = probe(mid, "f64", log)
        if row["ok"]:
            last_good = max(last_good, row.get("child_seconds", mid))
        else:
            first_bad = mid
    # --- repeat at the crash point: hard ceiling vs flake ----------------
    if first_bad is not None:
        probe(first_bad, "f64", log)
    # --- f32 cross-checks at matched durations ---------------------------
    # below the f64 threshold (if op-count-limited, ~20x the ops should
    # crash here) and above it (if duration-limited, should crash too)
    if first_bad is not None:
        probe(max(60.0, 0.8 * last_good), "f32", log)
        probe(min(720.0, 1.1 * first_bad), "f32", log)
    else:
        probe(720.0, "f32", log)

    summary = {
        "f64_max_survived_seconds": max(
            (r.get("child_seconds", 0.0) for r in log
             if r["dtype"] == "f64" and r["ok"]), default=None),
        "f64_min_crashed_target_seconds": min(
            (r["target_seconds"] for r in log
             if r["dtype"] == "f64" and not r["ok"]), default=None),
        "f32_outcomes": [
            {"target_seconds": r["target_seconds"], "ok": r["ok"],
             "child_seconds": r.get("child_seconds")}
            for r in log if r["dtype"] == "f32"],
    }
    log.append({"summary": summary, "dtype": "summary", "ok": True})
    _persist(log)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    if "--one-probe" in sys.argv:
        iters = next(int(a.split("=")[1]) for a in sys.argv
                     if a.startswith("--iters="))
        dtype = next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--dtype=")), "f64")
        child(iters, dtype)
    else:
        main()
