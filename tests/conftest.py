"""Test config: force CPU backend with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware.

Note: the environment pre-imports jax via sitecustomize (axon), so plain
env-var edits are too late; use jax.config.update before any backend is
initialized. Set FIVT_TEST_TPU=1 to run the suite on the real chip.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("FIVT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    # keep CPU runs out of the persistent executable cache (host
    # feature detection differs between processes here; loading a
    # mismatched XLA:CPU AOT blob can SIGILL)
    try:
        jax.config.update("jax_enable_compilation_cache", False)
    except Exception:
        pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
