"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is tested the TPU-native way without a TPU pod:
``--xla_force_host_platform_device_count=8`` gives JAX eight CPU devices to
build a real ``jax.sharding.Mesh`` over (SURVEY.md §4).

Note: the container's ``sitecustomize`` imports jax at interpreter startup
with ``JAX_PLATFORMS=axon`` (the remote-TPU tunnel), so setting env vars
here is too late for the config default — we must update the live jax
config as well, before any backend is initialized.
"""

import os

if os.environ.get("T48_TPU_TESTS"):
    # Opt-in TPU mode: leave the backend alone (the tunneled TPU) so the
    # tpu-marked tests (tests/test_tpu_device.py) run against real
    # hardware. Everything else still passes — CPU-only assumptions are
    # per-test, not global.
    import jax  # noqa: F401
else:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
