"""Test configuration: force an 8-virtual-device CPU platform.

Numerical-parity tests run in float64 on CPU; the multi-chip sharding tests
use the 8 virtual devices (task environment notes). Real-TPU execution is
exercised by bench.py and __graft_entry__.py, not by pytest.

NOTE: the axon TPU plugin on this host ignores the JAX_PLATFORMS environment
variable, so we must force the platform through jax.config BEFORE any
computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
