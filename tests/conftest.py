"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is tested the TPU-native way without a TPU pod:
``--xla_force_host_platform_device_count=8`` gives JAX eight CPU devices to
build a real ``jax.sharding.Mesh`` over (SURVEY.md §4). Must run before the
first ``import jax`` anywhere in the test process.
"""

import os

# Hard override: the session environment pins JAX_PLATFORMS to the real
# TPU tunnel; unit tests must run on local CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
