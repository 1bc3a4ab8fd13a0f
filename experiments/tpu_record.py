"""Subprocess-isolated on-device records for the long-hyperopt workloads.

Round-3 verdict item 1/2: the pendulum GPSSM and GPLVM headline numbers were
CPU measurements because the one real-TPU pendulum attempt crashed the TPU
worker mid-chunk and was never retried. A dead worker takes the whole
process's in-memory backend with it, so in-process retries can't help — the
unit of isolation must be the PROCESS, with the training state threaded
through a host checkpoint (the same design that turned the pad-scale crash
into a data point, experiments/legacy_gp.py run_padscale_one).

This driver runs each workload's experiment CLI as a child process with
  --ckpt=<npz>   chunk-granular resume state (25-epoch chunks on device)
  --json=<path>  the machine-readable result the child writes when done
and retries a crashed child up to --attempts times; every attempt (return
code, duration, last stderr line) is logged into the artifact, so a
persistent failure yields a ≥N-attempt crash record instead of an anecdote.

  python experiments/tpu_record.py pendulum [--attempts=4] [--cpu]
  python experiments/tpu_record.py gplvm    [--attempts=4] [--cpu]

Writes benchmarks/{pendulum,gplvm}_tpu_r4.json. Reference wall-clocks:
pendulum 1615.25 s (Pendulum_Wishart_2d.ipynb cell 17), GPLVM ≈ 900 s
(GPLVM.ipynb cell 17).
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKLOADS = {
    "pendulum": {
        "script": os.path.join(HERE, "pendulum.py"),
        "args": ["150", "--chunk=25"],
        "out": os.path.join(REPO, "benchmarks", "pendulum_tpu_r4.json"),
        "reference_seconds": 1615.25,
        "timeout": 3000,
    },
    "pendulum_f32": {
        # the f32-first device mode (VERDICT r4 item 6): everything but
        # the condition-critical solves runs native-f32 on the MXU instead
        # of emulated f64 — the measured bound on the r4 record's 1360 s
        "script": os.path.join(HERE, "pendulum.py"),
        "args": ["150", "--chunk=25", "--f32"],
        "out": os.path.join(REPO, "benchmarks", "pendulum_f32_tpu_r5.json"),
        "reference_seconds": 1615.25,
        "timeout": 3000,
    },
    "gplvm": {
        # chunk=1: one epoch per dispatch (~1.5 min device time). The
        # chunk=5 attempts put ~400+ s in a single execution and crashed
        # the worker every time (3/3, benchmarks/gplvm_tpu_r4.json) while
        # the pendulum's ≤227 s chunks all survived — a per-execution
        # duration ceiling, so every dispatch must stay well under it.
        "script": os.path.join(HERE, "gplvm.py"),
        "args": ["25", "--chunk=1"],
        "out": os.path.join(REPO, "benchmarks", "gplvm_tpu_r4.json"),
        "reference_seconds": 900.0,
        "timeout": 4500,
    },
    "gplvm_r5": {
        # re-chunked to the largest dispatch the measured exec ceiling
        # allows (benchmarks/exec_ceiling_r5.json; VERDICT r4 item 4) —
        # claws back the 1-epoch-dispatch overhead of the r4 record
        "script": os.path.join(HERE, "gplvm.py"),
        "args": ["25", "--chunk=2"],
        "out": os.path.join(REPO, "benchmarks", "gplvm_tpu_r5.json"),
        "reference_seconds": 900.0,
        "timeout": 4500,
    },
}


def record(name: str, attempts: int = 4, tpu: bool = True,
           extra_args=(), resume: bool = False):
    """``resume=True`` keeps an existing chunk checkpoint so a fresh
    invocation continues a partially-crashed earlier record instead of
    restarting from epoch 0 (the per-attempt log still starts fresh)."""
    cfg = WORKLOADS[name]
    tag = "tpu" if tpu else "cpu"
    ck = os.path.join("/tmp", f"{name}_{tag}_r4_ck.npz")
    res_path = os.path.join("/tmp", f"{name}_{tag}_r4_result.json")
    for p in ((res_path,) if resume else (ck, res_path)):
        if os.path.exists(p):
            os.remove(p)
    cmd = [sys.executable, cfg["script"], *cfg["args"],
           f"--ckpt={ck}", f"--json={res_path}", *extra_args]
    if tpu:
        cmd.append("--tpu")
    log = []
    result = None
    t_start = time.time()
    for attempt in range(1, attempts + 1):
        t0 = time.time()
        entry = {"attempt": attempt}
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=cfg["timeout"])
            entry["returncode"] = p.returncode
            if p.returncode != 0:
                lines = p.stderr.strip().splitlines() or ["?"]
                # keep the real exception, not just the JAX traceback-filter
                # notice that ends every filtered traceback
                entry["stderr_tail"] = "\n".join(lines[-12:])[-1500:]
                # the experiment prints phase markers to stdout — the tail
                # locates WHERE in the run the crash happened
                out = p.stdout.strip().splitlines()
                if out:
                    entry["stdout_tail"] = "\n".join(out[-6:])[-600:]
        except subprocess.TimeoutExpired:
            entry["returncode"] = None
            entry["stderr_tail"] = f"timeout {cfg['timeout']}s"
        entry["seconds"] = round(time.time() - t0, 1)
        log.append(entry)
        print(f"[{name}] attempt {attempt}: rc={entry['returncode']} "
              f"({entry['seconds']}s)"
              + (f" — {entry.get('stderr_tail', '')}"
                 if entry.get("stderr_tail") else ""),
              flush=True)
        if os.path.exists(res_path):
            with open(res_path) as f:
                result = json.load(f)
            break
    artifact = {
        "workload": name,
        "reference_seconds": cfg["reference_seconds"],
        "attempts": log,
        "total_wall_seconds": round(time.time() - t_start, 1),
        "result": result,
    }
    if result is not None and "device_hyperopt_seconds" in result:
        artifact["vs_reference"] = round(
            cfg["reference_seconds"] / max(result["device_hyperopt_seconds"],
                                           1e-9), 1)
    with open(cfg["out"], "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[{name}] wrote {cfg['out']}"
          + ("" if result else "  (NO RESULT — crash record only)"),
          flush=True)
    return artifact


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "pendulum"
    attempts = 4
    extra = []
    for a in sys.argv[2:]:
        if a.startswith("--attempts="):
            attempts = int(a.split("=", 1)[1])
        elif a not in ("--cpu", "--resume"):
            extra.append(a)
    record(name, attempts=attempts, tpu="--cpu" not in sys.argv,
           extra_args=extra, resume="--resume" in sys.argv)
