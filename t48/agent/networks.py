"""Q-networks: dense and conv, as Flax modules in TPU-friendly fp32.

Architectures mirror the reference configs exactly:

- Dense  16→512→512→256→4 with ReLU
  (/root/reference/src/configs/double_dqn_dense.py:7-15).
- Conv   1→64 (2×2 valid) → 64 (2×2 valid) → flatten(256) → 64 → 4 with
  ReLU (/root/reference/src/configs/double_dqn_conv.py:19-28).

Deliberate divergences from the reference, documented per SURVEY.md §7.3:

- fp32 instead of the reference's ``.double()`` float64
  (configs/double_dqn_conv.py:28) — float64 runs at a tiny fraction of
  TPU matmul throughput; the Q-learning curve is insensitive at these
  scales (validated by the training integration test).
- NHWC conv layout instead of NCHW (``state_as_4d_tensor`` builds
  (1,1,4,4), board.py:236-237) — NHWC is the native TPU conv layout.

These nets are tiny (≤ ~0.4M params), so the batched forward is one fused
XLA program; no Pallas needed for the model itself — the win is batching
thousands of boards per forward, not hand-tiling a 16→512 matmul.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


class DenseQNet(nn.Module):
    """MLP Q-net over flat log2 boards (configs/double_dqn_dense.py:7-15)."""

    hidden: Tuple[int, ...] = (512, 512, 256)
    num_actions: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: f32[B, K*K]
        x = x.astype(self.dtype)
        for width in self.hidden:
            x = nn.Dense(width, dtype=self.dtype)(x)
            x = nn.relu(x)
        return nn.Dense(self.num_actions, dtype=self.dtype)(x)


class ConvQNet(nn.Module):
    """Conv Q-net over [B, K, K, 1] log2 boards
    (configs/double_dqn_conv.py:19-28)."""

    features: Tuple[int, ...] = (64, 64)
    kernel: Tuple[int, int] = (2, 2)
    fc_width: int = 64
    num_actions: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: f32[B, K, K, 1] (NHWC)
        x = x.astype(self.dtype)
        for feats in self.features:
            x = nn.Conv(feats, self.kernel, padding="VALID", dtype=self.dtype)(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.fc_width, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.num_actions, dtype=self.dtype)(x)


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def dtype_of(name: str) -> jnp.dtype:
    """Config ``compute_dtype`` string → jnp dtype."""
    if name not in _DTYPES:
        raise ValueError(f"unknown compute dtype {name!r}; have {sorted(_DTYPES)}")
    return _DTYPES[name]


def build_network(arch: str, dtype: jnp.dtype = jnp.float32) -> nn.Module:
    """'dense' | 'conv' → module (the reference's two model families).

    ``dtype`` is the COMPUTE dtype (matmuls/activations); parameters stay
    float32 (flax's ``param_dtype`` default) — the bf16-compute/f32-params
    recipe that runs the MXU at full rate without losing optimizer
    precision. The TD loss itself is always accumulated in f32
    (t48/agent/learner.py).
    """
    if arch == "dense":
        return DenseQNet(dtype=dtype)
    if arch == "conv":
        return ConvQNet(dtype=dtype)
    # capability-demo variants (r05, beyond reference parity): same
    # module families, wider layers. The cell-major forwards read layer
    # widths from the param shapes, so these run the identical hot path.
    if arch == "dense_wide":
        return DenseQNet(hidden=(1024, 1024, 512), dtype=dtype)
    if arch == "conv_wide":
        return ConvQNet(features=(128, 128), fc_width=128, dtype=dtype)
    raise ValueError(f"unknown architecture: {arch!r}")
