"""Cell-major (batch-minor) network forwards for the training hot loop.

TPU layout rule: the minor-most dimension maps to the 128-wide vector
lanes. The training loop carries boards cell-major — ``int32[16, B]``,
batch in lanes (t48/train/loop.py, t48/ops/pallas_step.py) — so feeding
the flax modules (which want ``[B, features]`` / NHWC) costs a full
[16,B]→[B,16] relayout per iteration, measured at a large fraction of
the per-iteration overhead (benchmarks/breakdown_r03: the env+policy
stages carry ~120µs/iter of which the Pallas kernel itself is ~5µs).

These functions evaluate the SAME parameter pytrees the flax modules
create (networks.py; checkpoint/eval paths keep using flax), but keep
batch in the minor dimension end-to-end:

- every Dense layer is ``einsum('io,ib->ob', W, x)`` — weights
  stationary, batch in lanes, an MXU-native orientation;
- the 2×2 VALID convs are expressed as im2col matmuls: the tap gather
  is a static re-indexing of the 16 cell rows (free in cell-major), and
  the tap/channel concatenation order matches flax's HWIO kernel
  reshape, so parameters are interpreted identically.

Numerical note: XLA's conv lowering and this explicit im2col matmul can
differ in accumulation order, so outputs match the flax apply to float
tolerance, not bit-exactly (asserted in tests/test_agent.py).

Reference architectures: configs/double_dqn_dense.py:7-15,
configs/double_dqn_conv.py:19-28 (/root/reference).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def _dense(params: dict, x, dtype):
    """[in, *batch] → [out, *batch] for one flax Dense param dict.

    Any number of trailing batch dims (the sampler's [s, B] factored
    batch stays unflattened — flattening would break the 'data' sharding
    of the minor env axis, t48/replay/buffer.py)."""
    w = params["kernel"].astype(dtype)  # [in, out]
    b = params["bias"].astype(dtype)  # [out]
    return (
        jnp.einsum("io,i...->o...", w, x)
        + b.reshape((-1,) + (1,) * (x.ndim - 1))
    )


def dense_q_cm(params, x_cm, dtype=jnp.float32):
    """DenseQNet forward, cell-major: x int/float [16, *batch] →
    q [4, *batch].

    Mirrors networks.DenseQNet (16→512→512→256→4, ReLU).
    """
    p = params["params"]
    x = x_cm.astype(dtype)
    n = len(p)
    for i in range(n):
        x = _dense(p[f"Dense_{i}"], x, dtype)
        if i < n - 1:
            x = jnp.maximum(x, 0)
    return x


# static im2col index tables for the 4x4 board, cell index = r*4 + c
_CONV1_POS = [(r, c) for r in range(3) for c in range(3)]  # 3x3 output
_CONV2_POS = [(r, c) for r in range(2) for c in range(2)]  # 2x2 output
_TAPS = [(0, 0), (0, 1), (1, 0), (1, 1)]  # 2x2 kernel, h-major (HWIO)


def conv_q_cm(params, x_cm, dtype=jnp.float32):
    """ConvQNet forward, cell-major: x int/float [16, *batch] →
    q [4, *batch].

    Mirrors networks.ConvQNet (1→64 2×2 VALID → 64 2×2 VALID → flatten
    → 64 → 4, ReLU, NHWC) with both convs as im2col matmuls (the tap
    gathers are static re-indexings of the 16 cell rows).

    A block-densified conv-as-one-GEMM variant (the 2×2 kernels
    scattered into [16,576]/[576,256] structured weight matrices) was
    measured head-to-head and LOST ~1.4× end-to-end: the per-call
    densify scatter and its gradient outweigh the im2col gather, which
    XLA fuses well at these shapes (benchmarks/learner_flags_r03.md).
    """
    p = params["params"]
    x = x_cm.astype(dtype)  # [16, *batch]
    batch_shape = x.shape[1:]
    nb = len(batch_shape)
    bcast = lambda v: v.reshape((1, -1) + (1,) * nb)  # noqa: E731

    # conv1: taps are single input channel; X1 [9 pos, 4 taps, *batch].
    # Channel widths are read from the param shapes, so the same code
    # serves the reference 64/64/64 net and the wider capability-demo
    # variants (networks.ConvQNet with any `features`/`fc_width`).
    k1 = p["Conv_0"]["kernel"].astype(dtype).reshape(4, -1)  # [h*w*1, C1]
    b1 = p["Conv_0"]["bias"].astype(dtype)
    c1 = k1.shape[-1]
    x1 = jnp.stack(
        [
            jnp.stack([x[(r + dr) * 4 + (c + dc)] for dr, dc in _TAPS])
            for r, c in _CONV1_POS
        ]
    )  # [9, 4, *batch]
    h1 = jnp.einsum("pt...,tf->pf...", x1, k1) + bcast(b1)
    h1 = jnp.maximum(h1, 0)  # [9, C1, *batch]

    # conv2: taps carry C1 channels; order (dh, dw, cin) = HWIO reshape
    k2 = p["Conv_1"]["kernel"].astype(dtype).reshape(4 * c1, -1)  # [4C1, C2]
    b2 = p["Conv_1"]["bias"].astype(dtype)
    c2 = k2.shape[-1]
    x2 = jnp.stack(
        [
            jnp.concatenate(
                [h1[(r + dr) * 3 + (c + dc)] for dr, dc in _TAPS], axis=0
            )
            for r, c in _CONV2_POS
        ]
    )  # [4, 4C1, *batch]
    h2 = jnp.einsum("pt...,tf->pf...", x2, k2) + bcast(b2)
    h2 = jnp.maximum(h2, 0)  # [4, C2, *batch]

    # flatten in flax's (h, w, feature) order = our (pos, feature)
    flat = h2.reshape((4 * c2,) + batch_shape)  # [4C2, *batch]
    h3 = jnp.maximum(_dense(p["Dense_0"], flat, dtype), 0)
    return _dense(p["Dense_1"], h3, dtype)  # [4, *batch]


def build_cm_forward(arch: str, dtype=jnp.float32) -> Callable:
    """(params, x_cm int[16, B]) → q [4, B] for the given architecture.

    Both forwards read layer widths from the param shapes, so every
    'dense*' arch routes through dense_q_cm and every 'conv*' arch
    through conv_q_cm (networks.build_network defines the families)."""
    if arch.startswith("dense"):
        return lambda params, x_cm: dense_q_cm(params, x_cm, dtype)
    if arch.startswith("conv"):
        return lambda params, x_cm: conv_q_cm(params, x_cm, dtype)
    raise ValueError(f"unknown architecture: {arch!r}")
