"""Chunked, retried on-device training drivers.

Single executions beyond ~1-2 minutes hit this environment's device-tunnel
RPC deadline, and the link occasionally faults transiently — so the long
experiments run their jitted trainers in epoch chunks with host-side resume
state (every chunk shares ONE compiled executable) and a bounded retry on
transient faults. This is the ONE copy of that protocol (it used to live
per-experiment and the copies drifted — e.g. the retried exception set).
"""

import time

import jax

from .profiling import block_via_host

__all__ = ["TRANSIENT_ERRORS", "chunked_run"]

# transient device-tunnel faults (RPC deadline, transfer hiccups) raise
# JaxRuntimeError; anything else (shape/numerics bugs) must propagate
# immediately instead of being retried away
TRANSIENT_ERRORS = (jax.errors.JaxRuntimeError,)


def chunked_run(step_fn, total, chunk, state, attempts: int = 3,
                retry_sleep: float = 5.0):
    """Run ``step_fn(n_epochs, resume_state) -> out`` in chunks until
    ``total`` epochs are done. ``out[-1]`` must be the resume carry and
    ``out[0]`` a device array of the same executable's outputs — it is
    materialized to the host after each chunk (block_until_ready can return
    early on a degraded tunnel, DEVIATIONS #6a; a host copy cannot).
    Transient faults re-run the chunk (the carry is host-side, so a chunk is
    idempotent). Returns the last chunk's ``out``."""
    done = 0
    out = None
    while done < total:
        e = min(chunk, total - done)
        for attempt in range(attempts):
            try:
                out = step_fn(e, state)
                block_via_host(out[0])
                break
            except TRANSIENT_ERRORS:
                if attempt == attempts - 1:
                    raise
                time.sleep(retry_sleep)
        state = out[-1]
        done += e
    return out
