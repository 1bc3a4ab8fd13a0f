"""Profiling helpers (SURVEY.md §5 tracing slot).

The reference relies on `@time` in notebooks; here: a device-trace context
manager (jax.profiler, viewable in TensorBoard/Perfetto) and a
block-until-ready timer for honest wall-clocks under async dispatch."""

import contextlib
import time

import jax
import jax.numpy as jnp

__all__ = ["device_trace", "timed", "block_via_host"]


def block_via_host(tree) -> None:
    """Synchronize with the device by copying ONE element of every array
    leaf of ``tree`` to the host.

    On this tunneled backend ``jax.block_until_ready``'s completion signal
    has been observed firing while buffers are still computing (DEVIATIONS
    #6a: a 27 s run reported done at 2.9 s with every leaf blocked); a
    device→host copy cannot return early. Cost: one-scalar transfer per
    leaf. This is the ONE shared synchronization protocol for every timing
    site (bench._clock, serve.throughput, experiments/kin40k's chunked
    driver) — fix it here, not per call site."""
    for leaf in jax.tree_util.tree_leaves(tree):
        arr = jnp.asarray(leaf)
        if arr.size:
            float(arr.ravel()[0])


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device trace: `with device_trace('/tmp/trace'): run()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "", results: dict | None = None):
    """Wall-clock a block, blocking on async results if given a pytree in
    results['block_on']."""
    t0 = time.time()
    out = {}
    try:
        yield out
    finally:
        if "block_on" in out:
            jax.block_until_ready(out["block_on"])
        dt = time.time() - t0
        if results is not None:
            results[label or "elapsed"] = dt
