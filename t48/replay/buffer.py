"""HBM-resident replay buffer: one sub-ring per environment.

The reference keeps a host-side ``collections.deque`` of *Board objects*
and tensorizes every sampled experience on every train step — two
host→device transfers per sampled item (dqn_lib.py:106, 33-64). This
module inverts that: transitions are encoded **once at insert** into
fixed-size device arrays that live in HBM for the whole run.

Storage layout (B = env batch, M = per-env capacity, S = K*K cells):

  state, next_state : int8[B, M, S]  — log2 exponents (native layout)
  action            : int8[B, M]
  reward            : f32[B, M]      — merge-score delta
  done              : bool[B, M]
  ptr, fill         : int32          — per-env write head / live count
                                       (scalar: envs insert in lockstep,
                                       so every row has the same head)

Why a leading env axis instead of the flat [N] ring a host deque
suggests: the leading axis is exactly the ``data`` mesh axis. Every
insert is ``buffer.at[:, ptr]`` — a dynamic-update-slice that is
elementwise in the sharded axis, so each device writes its own envs'
transitions into its own shard with **zero cross-device traffic**. A
flat ring would scatter every step's B transitions into one contiguous
window living on a single shard (all-to-one traffic), and global uniform
sampling from it would all-gather the sampled batch every learner step
(SURVEY.md §7 "Replay at scale").

Sampling is **stratified per env**: each env row contributes
``batch_size // B`` uniform-with-replacement draws from its own ring, so
each device samples only from its own shard and the learner's gradient
psum is the only collective in the train step. All rows always have the
same fill, so stratified sampling has the same marginal distribution as
the reference's global uniform ``np.random.randint`` (dqn_lib.py:67-70)
— it is the variance-reduced (stratified) estimator of the same
expectation, and is *exactly* the reference scheme at env_batch=1.

Documented divergences (both exact at env_batch=1):
- effective capacity rounds up to ``B * ceil(N / B)``;
- effective sample batch rounds to ``B * max(1, round(batch/B))``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class Transition(NamedTuple):
    """A batch of transitions, encoded (exponent boards flattened)."""

    state: jax.Array  # int8[B, S]
    action: jax.Array  # int8/int32[B]
    reward: jax.Array  # f32[B]
    next_state: jax.Array  # int8[B, S]
    done: jax.Array  # bool[B]


@struct.dataclass
class ReplayState:
    state: jax.Array  # int8[B, M, S]
    action: jax.Array  # int8[B, M]
    reward: jax.Array  # f32[B, M]
    next_state: jax.Array  # int8[B, M, S]
    done: jax.Array  # bool[B, M]
    ptr: jax.Array  # int32 scalar: per-env write head
    fill: jax.Array  # int32 scalar: per-env live count

    @property
    def env_batch(self) -> int:
        return self.state.shape[0]

    @property
    def per_env_capacity(self) -> int:
        return self.state.shape[1]

    @property
    def capacity(self) -> int:
        """Total transition capacity across all env rings."""
        return self.state.shape[0] * self.state.shape[1]

    @property
    def total_fill(self):
        """Total live transitions (fill is per-env)."""
        return self.fill * self.state.shape[0]


def per_env_capacity(capacity: int, env_batch: int) -> int:
    """ceil(capacity / env_batch) — the per-env ring length M."""
    return max(1, -(-capacity // env_batch))


def sample_rows(batch_size: int, env_batch: int) -> int:
    """Per-env draws per sample: ``max(1, round(batch_size / env_batch))``.

    The effective learner batch is ``env_batch * sample_rows`` (equal to
    ``batch_size`` whenever it divides evenly — always at env_batch=1).
    """
    return max(1, round(batch_size / env_batch))


def create(capacity: int, cells: int = 16, env_batch: int = 1) -> ReplayState:
    """Allocate an empty buffer of ≥``capacity`` transitions, split into
    ``env_batch`` per-env rings."""
    m = per_env_capacity(capacity, env_batch)
    b = env_batch
    return ReplayState(
        state=jnp.zeros((b, m, cells), jnp.int8),
        action=jnp.zeros((b, m), jnp.int8),
        reward=jnp.zeros((b, m), jnp.float32),
        next_state=jnp.zeros((b, m, cells), jnp.int8),
        done=jnp.zeros((b, m), jnp.bool_),
        ptr=jnp.zeros((), jnp.int32),
        fill=jnp.zeros((), jnp.int32),
    )


def add_step(rs: ReplayState, batch: Transition) -> ReplayState:
    """Append one transition per env (B lockstep ``append`` calls,
    dqn_lib.py:106). A dynamic-update-slice at the shared write head —
    elementwise in the env axis, hence shard-local under a 'data' mesh.
    Evict-oldest falls out of the modular head per ring."""
    m = rs.per_env_capacity
    p = rs.ptr % m
    return rs.replace(
        state=jax.lax.dynamic_update_index_in_dim(
            rs.state, batch.state.astype(rs.state.dtype), p, 1
        ),
        action=jax.lax.dynamic_update_index_in_dim(
            rs.action, batch.action.astype(rs.action.dtype), p, 1
        ),
        reward=jax.lax.dynamic_update_index_in_dim(
            rs.reward, batch.reward.astype(rs.reward.dtype), p, 1
        ),
        next_state=jax.lax.dynamic_update_index_in_dim(
            rs.next_state, batch.next_state.astype(rs.next_state.dtype), p, 1
        ),
        done=jax.lax.dynamic_update_index_in_dim(rs.done, batch.done, p, 1),
        ptr=(p + 1) % m,
        fill=jnp.minimum(rs.fill + 1, m),
    )


def add_many(rs: ReplayState, transitions: Transition) -> ReplayState:
    """Bulk-insert T arbitrary transitions (the A*-seeded warm start,
    reference double_dqn_conv_sss.py:65). Host-side helper: pads T up to a
    multiple of B by cycling from the start (documented divergence — the
    warm start is a heuristic seed, duplicates are harmless under
    with-replacement sampling), then writes ceil(T/B) lockstep steps."""
    t = int(np.shape(transitions.action)[0])
    b = rs.env_batch
    steps = -(-t // b)
    pad = steps * b - t

    def pad_cycle(x):
        x = np.asarray(x)
        if pad:
            reps = -(-pad // t)
            x = np.concatenate([x, np.tile(x, (reps,) + (1,) * (x.ndim - 1))[:pad]])
        return x.reshape((steps, b) + x.shape[1:])

    rows = Transition(*(pad_cycle(x) for x in transitions))
    for i in range(steps):
        rs = add_step(rs, Transition(*(x[i] for x in rows)))
    return rs


def sample(rs: ReplayState, key: jax.Array, batch_size: int) -> Transition:
    """Stratified uniform sampling with replacement: each env ring
    contributes ``sample_rows(batch_size, B)`` draws from its own live
    region (see module docstring for why this matches the reference's
    global uniform scheme, dqn_lib.py:67-70). Per-env gathers are aligned
    with the 'data' shard axis — no cross-device traffic. The caller must
    ensure the buffer is non-empty (the training loop gates the learner on
    a fill threshold); ``max(fill, 1)`` guards the degenerate empty case.
    """
    b = rs.env_batch
    s = sample_rows(batch_size, b)
    idx = jax.random.randint(key, (b, s), 0, jnp.maximum(rs.fill, 1))

    def take(arr):
        # arr: [B, M, ...] → [B, S, ...] → [B*S, ...]
        out = jnp.take_along_axis(
            arr, idx.reshape(idx.shape + (1,) * (arr.ndim - 2)), axis=1
        )
        return out.reshape((b * s,) + arr.shape[2:])

    return Transition(
        state=take(rs.state),
        action=take(rs.action).astype(jnp.int32),
        reward=take(rs.reward),
        next_state=take(rs.next_state),
        done=take(rs.done),
    )
